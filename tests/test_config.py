"""Job-config surface: reference-shaped JSON parses into this engine's
JobConfig (a user of the reference can bring their job spec across).

Shapes follow SURVEY §1/§2 (spark-job/job.json structure), recreated
from the documented key inventory — not copied text.
"""

import json

from s3_sqs_data_ingestion_demo_spark.config import JobConfig


REFERENCE_SHAPED = {
    "spark": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.extensions": "org.example.SomeExtension",
    },
    "input_config": {
        "type": "sqs",
        "queue_url": "https://sqs.region.example/123/queue",
        "poll_interval": 60,
        "batch_size": 10,
        "commit_checkpoint": True,
        "format": "csv",
        "transform_query": "",
        "csv_options": {"sep": "\t", "header": "true", "inferSchema": "true"},
    },
    "output_config": {
        "table": "/tmp/wh/orders",
        "mode": "merge",
        "schema": "/tmp/specs/silver_orders.avsc",
        "merge_query": "/tmp/specs/merge.sql",
        "table_type": "MOR",
        "compression": "zstd",
        "partition": "destinationstate",
        "key_columns": ["invoiceid", "itemid"],
        "order_column": "replicadmstimestamp",
    },
}


def test_reference_shaped_config_parses(tmp_path):
    path = tmp_path / "job.json"
    path.write_text(json.dumps(REFERENCE_SHAPED))
    cfg = JobConfig.load(str(path))
    assert cfg.spark["spark.sql.shuffle.partitions"] == "8"
    inp = cfg.input_config
    assert inp.type == "sqs" and inp.batch_size == 10 and inp.poll_interval == 60
    assert inp.commit_checkpoint is True
    assert inp.options == {"sep": "\t", "header": "true", "inferSchema": "true"}
    out = cfg.output_config
    assert out.table_path == "/tmp/wh/orders"
    assert out.mode == "merge" and out.table_type == "MOR"
    assert out.compression == "zstd"
    assert out.partition == ["destinationstate"]  # scalar -> list
    assert out.key_columns == ["invoiceid", "itemid"]


def test_defaults_and_options_key():
    cfg = JobConfig.from_dict(
        {"input_config": {"options": {"header": "true"}}, "output_config": {}}
    )
    assert cfg.input_config.format == "csv"
    assert cfg.input_config.options == {"header": "true"}
    assert cfg.output_config.mode == "merge"
    assert cfg.output_config.merge_policy == "unconditional"
    # maintenance defaults: fully disabled
    m = cfg.output_config.maintenance
    assert m.compact_every == 0 and m.zorder_by == [] and m.expire_keep_last == 0


def test_maintenance_config_parses():
    cfg = JobConfig.from_dict(
        {
            "output_config": {
                "maintenance": {
                    "compact_every": 2,
                    "zorder_by": "price",  # scalar -> list, like partition
                    "target_partitions": 4,
                    "expire_keep_last": 1,
                }
            }
        }
    )
    m = cfg.output_config.maintenance
    assert m.compact_every == 2
    assert m.zorder_by == ["price"]
    assert m.target_partitions == 4
    assert m.expire_keep_last == 1


def test_ingest_scale_profile_lands_on_builder_conf():
    """job.build_spark applies the ingest-scale profile; the job's own
    spark map still wins (reference conf precedence,
    spark-job/read.py:79-80).  Asserted on the pure conf merge the
    builder receives — no JVM needed."""
    from s3_sqs_data_ingestion_demo_spark.session import (
        INGEST_SCALE_PROFILE,
        merged_conf,
    )

    conf = merged_conf(profile="ingest-scale")
    for k, v in INGEST_SCALE_PROFILE.items():
        assert conf[k] == v
    # AQE base flags from the defaults survive the profile merge
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.adaptive.coalescePartitions.enabled"] == "true"
    assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"

    # job conf overrides the profile
    job_map = {"spark.sql.files.maxPartitionBytes": "64m"}
    conf2 = merged_conf(conf=job_map, profile="ingest-scale")
    assert conf2["spark.sql.files.maxPartitionBytes"] == "64m"
    assert (
        conf2["spark.sql.adaptive.advisoryPartitionSizeInBytes"]
        == INGEST_SCALE_PROFILE["spark.sql.adaptive.advisoryPartitionSizeInBytes"]
    )

    # the default profile adds none of the scale keys
    base = merged_conf()
    assert "spark.sql.adaptive.advisoryPartitionSizeInBytes" not in base

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown session profile"):
        merged_conf(profile="nope")


def test_build_spark_routes_profile_conf(monkeypatch):
    """build_spark passes the ingest-scale profile through to
    build_session (captured, not launched)."""
    from s3_sqs_data_ingestion_demo_spark import job as J
    from s3_sqs_data_ingestion_demo_spark import session as S

    seen = {}

    def fake_build_session(app_name, conf, protocol, profile):
        seen.update(
            app_name=app_name, conf=conf, protocol=protocol, profile=profile
        )
        return "sentinel"

    monkeypatch.setattr(S, "build_session", fake_build_session)
    cfg = JobConfig.from_dict({"spark": {"x": "1"}})
    out = J.build_spark(cfg)
    assert out == "sentinel"
    assert seen["profile"] == "ingest-scale"
    assert seen["conf"] == {"x": "1"}


def test_rollups_on_rewriting_cow_table_refused_at_parse_time():
    """Declaring rollups on a COW table with a rewriting write path
    (merge / MERGE INTO / CDC deletes) silently degrades the change
    feed to a full-table diff EVERY batch — refused at parse time,
    same standard as the audit+COW-merge refusal (config.py)."""
    import pytest as _pytest

    def cfg(**out_extra):
        out = {
            "table_path": "/tmp/wh/t",
            "key_columns": ["id"],
            "order_column": "seq",
            "rollups": [
                {"path": "/tmp/wh/roll", "group_columns": ["g"]}
            ],
        }
        out.update(out_extra)
        return JobConfig.from_dict(
            {"input_config": {}, "output_config": out}
        )

    with _pytest.raises(ValueError, match="rollups.*requires.*MOR"):
        cfg(mode="merge", table_type="COW")
    with _pytest.raises(ValueError, match="rollups.*requires.*MOR"):
        cfg(mode="append", table_type="COW", cdc_delete_values=["D"])
    # MOR merge and append-only COW both stay on the fast path — legal
    cfg(mode="merge", table_type="MOR")
    cfg(mode="append", table_type="COW")
