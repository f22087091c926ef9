"""The reference's verbatim MERGE INTO statement through the shim.

A reference user points ``output_config.merge_query`` at their
existing ``.sql`` file (the MERGE INTO shape of reference
spark-job/mergeSQL.sql); the shim must translate it onto
``ManagedTable.merge`` and reproduce the golden CDC outcome, and must
fail loudly (naming the V2-catalog requirement) on constructs it
cannot translate.
"""

import json
import os

import pytest

from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.job import process_files
from s3_sqs_data_ingestion_demo_spark.plans.merge_sql import (
    MergeSqlError,
    is_merge_into,
    parse_merge_into,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

from test_golden_cdc import AVSC, BATCH1, BATCH2, HEADER

COLS = (
    "invoiceid, itemid, category, price, quantity, orderdate, "
    "destinationstate, shippingtype, referral"
)

# The reference's statement shape, against this test's table/columns.
MERGE_INTO_SQL = f"""
MERGE INTO warehouse.silver.orders AS target
    USING (
        SELECT {COLS}
        FROM (
                 SELECT *,
                        ROW_NUMBER() OVER (
                   PARTITION BY invoiceid, itemid
                   ORDER BY replicadmstimestamp DESC
               ) AS row_num
                 FROM source_table
             ) AS deduped_source
        WHERE row_num = 1
    ) AS source
    ON target.invoiceid = source.invoiceid AND target.itemid = source.itemid
    WHEN MATCHED THEN
        UPDATE SET
            target.category = source.category,
            target.price = source.price,
            target.quantity = source.quantity,
            target.orderdate = source.orderdate,
            target.destinationstate = source.destinationstate,
            target.shippingtype = source.shippingtype,
            target.referral = source.referral
    WHEN NOT MATCHED THEN
        INSERT({COLS})
            VALUES (
                       source.invoiceid, source.itemid,
                       source.category, source.price,
                       source.quantity, source.orderdate,
                       source.destinationstate, source.shippingtype,
                       source.referral
                   );
"""


@pytest.fixture
def job(tmp_path):
    d = str(tmp_path)
    for name, lines in [("b1.csv", BATCH1), ("b2.csv", BATCH2)]:
        with open(os.path.join(d, name), "w") as fh:
            fh.write(HEADER + "\n" + "\n".join(lines) + "\n")
    with open(os.path.join(d, "silver_orders.avsc"), "w") as fh:
        json.dump(AVSC, fh)
    with open(os.path.join(d, "merge.sql"), "w") as fh:
        fh.write(MERGE_INTO_SQL)
    cfg = JobConfig.from_dict(
        {
            "input_config": {
                "type": "files",
                "format": "csv",
                "options": {"sep": "\t", "header": "true", "inferSchema": "true"},
            },
            "output_config": {
                "table_path": os.path.join(d, "warehouse", "orders"),
                "mode": "merge",
                "schema": os.path.join(d, "silver_orders.avsc"),
                "merge_query": os.path.join(d, "merge.sql"),
                "partition": ["destinationstate"],
                "key_columns": ["invoiceid", "itemid"],
                "order_column": "replicadmstimestamp",
            },
        }
    )
    return d, cfg


def test_parse_reference_shape():
    spec = parse_merge_into(MERGE_INTO_SQL)
    assert spec.target == "warehouse.silver.orders"
    assert spec.keys == ["invoiceid", "itemid"]
    assert spec.matched_guard is None
    assert "ROW_NUMBER() OVER" in spec.using_sql
    assert is_merge_into(MERGE_INTO_SQL)
    assert not is_merge_into("SELECT * FROM source_table")


def test_verbatim_merge_into_golden_cdc(spark, job):
    d, cfg = job
    process_files(spark, cfg, [os.path.join(d, "b1.csv")])
    process_files(spark, cfg, [os.path.join(d, "b2.csv")])
    t = ManagedTable.load(spark, cfg.output_config.table_path)
    rows = {(r.invoiceid, r.itemid): r for r in t.read().collect()}
    assert len(rows) == 5
    assert rows[(40994, 67)].category == "market####"
    assert rows[(83597, 37)].category == "language####"
    assert rows[(24137, 34)].category == "degree"
    assert "Op" not in t.read().columns
    assert "replicadmstimestamp" not in t.read().columns


def test_merge_into_batch_dedup_within_one_poll(spark, job):
    """Both batches in one poll: the statement's own dedup subquery
    must pick the later replicadmstimestamp per key."""
    d, cfg = job
    process_files(spark, cfg, [os.path.join(d, "b1.csv"), os.path.join(d, "b2.csv")])
    t = ManagedTable.load(spark, cfg.output_config.table_path)
    rows = {(r.invoiceid, r.itemid): r for r in t.read().collect()}
    assert len(rows) == 5
    assert rows[(40994, 67)].category == "market####"


def test_key_mismatch_fails_loudly(spark, job):
    d, cfg = job
    bad = MERGE_INTO_SQL.replace(
        "ON target.invoiceid = source.invoiceid AND target.itemid = source.itemid",
        "ON target.invoiceid = source.invoiceid",
    )
    with open(os.path.join(d, "merge.sql"), "w") as fh:
        fh.write(bad)
    with pytest.raises(MergeSqlError, match="do not match the table's"):
        process_files(spark, cfg, [os.path.join(d, "b1.csv")])


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (
            lambda s: s.replace(
                "target.category = source.category",
                "target.category = upper(source.category)",
            ),
            "unsupported UPDATE SET assignment|not an identity",
        ),
        (
            lambda s: s.replace(
                "WHEN MATCHED THEN",
                "WHEN MATCHED AND source.price > target.price THEN",
            ),
            "latest_wins",
        ),
        (
            lambda s: s[: s.index("WHEN NOT MATCHED")],
            "upsert shape",
        ),
    ],
)
def test_unsupported_constructs_fail_loudly(mutate, msg):
    bad = mutate(MERGE_INTO_SQL)
    if "latest_wins" in msg:
        # guard detection happens at execute time against table config;
        # the parser itself must still accept and surface the guard
        spec = parse_merge_into(bad)
        assert spec.matched_guard is not None
    else:
        with pytest.raises(MergeSqlError, match=msg):
            parse_merge_into(bad)


def test_matched_guard_requires_latest_wins_table(spark, job):
    d, cfg = job
    guarded = MERGE_INTO_SQL.replace(
        "WHEN MATCHED THEN",
        "WHEN MATCHED AND source.replicadmstimestamp >= target.replicadmstimestamp THEN",
    )
    with open(os.path.join(d, "merge.sql"), "w") as fh:
        fh.write(guarded)
    # table is merge_policy=unconditional -> must refuse, naming the need
    with pytest.raises(MergeSqlError, match="latest_wins"):
        process_files(spark, cfg, [os.path.join(d, "b1.csv")])


def test_verbatim_merge_with_declared_cdc_export(spark, job, tmp_path):
    """A declared cdc_export works under a verbatim MERGE INTO merge
    query too — the export consumes the TABLE's change feed, so (like
    rollups/MVs) it stays coherent with whatever the statement
    committed.  Replay of the export must equal the table after both
    golden batches."""
    from s3_sqs_data_ingestion_demo_spark.config import CdcExportConfig
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        read_change_export,
        replay_to_state,
    )

    d, cfg = job
    ex = os.path.join(d, "export")
    cfg.output_config.cdc_exports = [CdcExportConfig(path=ex)]
    process_files(spark, cfg, [os.path.join(d, "b1.csv")])
    process_files(spark, cfg, [os.path.join(d, "b2.csv")])
    t = ManagedTable.load(spark, cfg.output_config.table_path)
    replayed = replay_to_state(
        read_change_export(spark, ex), ["invoiceid", "itemid"]
    )
    want = sorted(
        (r.invoiceid, r.itemid, r.category) for r in t.read().collect()
    )
    got = sorted(
        (r.invoiceid, r.itemid, r.category) for r in replayed.collect()
    )
    assert got == want and len(got) == 5
