"""Golden end-to-end CDC scenario (FIXTURES.md §3, SURVEY §5).

Two tab-separated CSV batches in the reference's CDC envelope format —
5 inserts, then 2 updates with later ``replicadmstimestamp`` — ingested
through the merge pipeline must leave exactly 5 rows with the updated
categories and no envelope columns.  Fixture rows are synthesized here
to the documented shape (keys, timestamps, mutated categories).
"""

import json
import os

import pytest

from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.job import ensure_target, process_files
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

HEADER = "Op\treplicadmstimestamp\tinvoiceid\titemid\tcategory\tprice\tquantity\torderdate\tdestinationstate\tshippingtype\treferral"

BATCH1 = [
    "I\t2024-02-16 15:30:41.041474\t24137\t34\tdegree\t53.51\t1\t2023-03-29\tSC\t3-Day\tbook",
    "I\t2024-02-16 15:30:41.041474\t15587\t59\topinion\t21.0\t2\t2023-01-04\tTX\t2-Day\tad",
    "I\t2024-02-16 15:30:41.041474\t42918\t69\tactivity\t88.51\t1\t2023-06-12\tCA\tStandard\tfriend",
    "I\t2024-02-16 15:30:41.041474\t40994\t67\tmarket\t12.2\t3\t2023-09-01\tSC\t3-Day\tbook",
    "I\t2024-02-16 15:30:41.041474\t83597\t37\tlanguage\t7.75\t1\t2023-11-21\tNY\t1-Day\tsearch",
]
BATCH2 = [
    "U\t2024-12-01 08:00:00.000000\t40994\t67\tmarket####\t12.2\t3\t2023-09-01\tSC\t3-Day\tbook",
    "U\t2024-12-01 08:00:00.000000\t83597\t37\tlanguage####\t7.75\t1\t2023-11-21\tNY\t1-Day\tsearch",
]

AVSC = {
    "type": "record",
    "name": "silver_orders",
    "fields": [
        {"name": "invoiceid", "type": "int"},
        {"name": "itemid", "type": "int"},
        {"name": "category", "type": "string"},
        {"name": "price", "type": "float"},
        {"name": "quantity", "type": "int"},
        {"name": "orderdate", "type": "string"},
        {"name": "destinationstate", "type": "string"},
        {"name": "shippingtype", "type": "string"},
        {"name": "referral", "type": "string"},
    ],
}

# DataFrame-equivalent of the reference's mergeSQL.sql dedup projection,
# run through the transform_query hook for full parity with the SQL path.
MERGE_SQL = """
SELECT invoiceid, itemid, category, price, quantity,
       orderdate, destinationstate, shippingtype, referral,
       replicadmstimestamp
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY invoiceid, itemid
      ORDER BY replicadmstimestamp DESC) AS row_num
  FROM source_table
) deduped WHERE row_num = 1
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
        fh.write(MERGE_SQL)
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


def _final_rows(spark, cfg):
    t = ManagedTable.load(spark, cfg.output_config.table_path)
    return {(r.invoiceid, r.itemid): r for r in t.read().collect()}


def test_two_batch_upsert(spark, job):
    d, cfg = job
    process_files(spark, cfg, [os.path.join(d, "b1.csv")])
    process_files(spark, cfg, [os.path.join(d, "b2.csv")])
    rows = _final_rows(spark, cfg)
    assert len(rows) == 5
    assert rows[(40994, 67)].category == "market####"
    assert rows[(83597, 37)].category == "language####"
    assert rows[(24137, 34)].category == "degree"
    # envelope columns dropped by the merge projection
    t = ManagedTable.load(spark, cfg.output_config.table_path)
    assert "Op" not in t.read().columns
    assert "replicadmstimestamp" not in t.read().columns
    # price column honored the float contract
    assert abs(rows[(24137, 34)].price - 53.51) < 1e-4


def test_both_files_one_batch_windowed_dedup(spark, job):
    d, cfg = job
    process_files(spark, cfg, [os.path.join(d, "b1.csv"), os.path.join(d, "b2.csv")])
    rows = _final_rows(spark, cfg)
    assert len(rows) == 5
    assert rows[(40994, 67)].category == "market####"
    assert rows[(83597, 37)].category == "language####"


def test_redelivery_idempotent(spark, job):
    d, cfg = job
    process_files(spark, cfg, [os.path.join(d, "b1.csv")])
    process_files(spark, cfg, [os.path.join(d, "b2.csv")])
    v = ManagedTable.load(spark, cfg.output_config.table_path)._current_version()
    process_files(spark, cfg, [os.path.join(d, "b2.csv")])  # redelivered
    rows = _final_rows(spark, cfg)
    assert len(rows) == 5
    assert rows[(40994, 67)].category == "market####"


def test_target_bootstrap_contract(spark, job):
    d, cfg = job
    t = ensure_target(spark, cfg)
    assert t.meta.partition_cols == ["destinationstate"]
    assert t.meta.key_cols == ["invoiceid", "itemid"]
    names = t.meta.schema.fieldNames()
    assert names[0] == "invoiceid" and len(names) == 9


def test_unknown_format_fails_loudly(spark, job):
    d, cfg = job
    cfg.input_config.format = "pdf"
    with pytest.raises(ValueError, match="unsupported input format"):
        process_files(spark, cfg, [os.path.join(d, "b1.csv")])


def test_misconfigured_format_rejects_corrupt_only_parse(spark, job):
    """A CSV batch read through the xml path must fail loudly up front
    (corrupt-record-only schema), not three operators later with an
    unrelated UNRESOLVED_COLUMN error."""
    d, cfg = job
    cfg.input_config.format = "xml"
    with pytest.raises(ValueError, match="corrupt-record"):
        process_files(spark, cfg, [os.path.join(d, "b1.csv")])


def test_declarative_maintenance_compacts_and_expires(spark, job):
    """output_config.maintenance: after the 2nd committed version the
    ingest self-compacts (Z-ordered on the key columns) and expires
    history — results identical, one data root, one snapshot."""
    from s3_sqs_data_ingestion_demo_spark.config import MaintenanceConfig

    d, cfg = job
    # cadence counts DATA commits since the last compact (the create
    # snapshot and maintenance commits don't count), so compact_every=2
    # fires after the SECOND merge
    cfg.output_config.maintenance = MaintenanceConfig(
        compact_every=2,
        zorder_by=["invoiceid", "itemid"],
        target_partitions=2,
        expire_keep_last=1,
    )
    process_files(spark, cfg, [os.path.join(d, "b1.csv")])  # v2: no maintenance
    t = ManagedTable.load(spark, cfg.output_config.table_path)
    assert len(t.history()) >= 2  # create + first merge, nothing expired
    process_files(spark, cfg, [os.path.join(d, "b2.csv")])  # v3 -> compact v4
    t = ManagedTable.load(spark, cfg.output_config.table_path)
    rows = _final_rows(spark, cfg)
    assert len(rows) == 5
    assert rows[(40994, 67)].category == "market####"
    assert rows[(83597, 37)].category == "language####"
    assert len(t.history()) == 1  # expired down to the compacted snapshot
    assert len(t._read_manifest()) == 1  # one fresh data root


def test_cdc_delete_ops(spark, job):
    """DMS-style delete rows: with cdc_delete_values configured, a
    batch's 'D' rows delete their keys instead of upserting (per key,
    the batch's latest action wins); the reference upserted delete
    rows like data — this is the documented semantic upgrade."""
    d, cfg = job
    cfg.output_config.cdc_delete_values = ["D"]
    cfg.output_config.table_type = "MOR"
    process_files(spark, cfg, [os.path.join(d, "b1.csv")])
    # batch 3: delete one key, update another, and for a third key
    # send an update THEN a delete (later ts) -> delete wins
    b3 = [
        "D\t2024-12-02 09:00:00.000000\t24137\t34\tdegree\t53.51\t1\t2023-03-29\tSC\t3-Day\tbook",
        "U\t2024-12-02 09:00:00.000000\t15587\t59\topinion####\t21.0\t2\t2023-01-04\tTX\t2-Day\tad",
        "U\t2024-12-02 09:00:00.000000\t42918\t69\tactivity####\t88.51\t1\t2023-06-12\tCA\tStandard\tfriend",
        "D\t2024-12-02 10:00:00.000000\t42918\t69\tactivity####\t88.51\t1\t2023-06-12\tCA\tStandard\tfriend",
    ]
    with open(os.path.join(d, "b3.csv"), "w") as fh:
        fh.write(HEADER + "\n" + "\n".join(b3) + "\n")
    process_files(spark, cfg, [os.path.join(d, "b3.csv")])
    rows = _final_rows(spark, cfg)
    assert set(rows) == {(15587, 59), (40994, 67), (83597, 37)}
    assert rows[(15587, 59)].category == "opinion####"
    # a later re-insert of a deleted key revives it
    b4 = ["I\t2024-12-03 09:00:00.000000\t24137\t34\treborn\t1.0\t1\t2023-03-29\tSC\t3-Day\tbook"]
    with open(os.path.join(d, "b4.csv"), "w") as fh:
        fh.write(HEADER + "\n" + "\n".join(b4) + "\n")
    process_files(spark, cfg, [os.path.join(d, "b4.csv")])
    rows = _final_rows(spark, cfg)
    assert rows[(24137, 34)].category == "reborn"
    assert len(rows) == 4
