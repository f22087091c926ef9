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
