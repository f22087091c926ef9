#!/usr/bin/env python3
"""A/B the r13 intra-family parallelism: a job declaring TWO rollups
(one with two distinct columns) + TWO join MVs + two top-k MVs runs
its batches with the intra-family pools forced SERIAL vs left POOLED.
Evidence for VERDICT r12 item #4 ("multi-family profile showing
~max() not sum()").

Usage: python plans/r13/profile_intrafam.py [sf_dir]
"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import functions as F
from s3_sqs_data_ingestion_demo_spark.session import build_session
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.queries import t as read_table
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

spark = build_session(app_name="profile-intrafam")


def build_job(base):
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    o = read_table(spark, SF, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.col("o_custkey").cast("long"),
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
        F.concat(F.lit("w"), (F.col("o_orderkey") % 20).cast("string"))
        .alias("note"),
    )
    b1 = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "*", F.lit(1).cast("long").alias("seq"), F.lit("I").alias("Op"))
    b2 = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"),
        (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
        (F.col("price_cents") + 500).alias("price_cents"),
        F.concat(F.lit("w"), ((F.col("o_orderkey") + 1) % 20).cast("string"))
        .alias("note"),
        F.lit(2).cast("long").alias("seq"), F.lit("U").alias("Op"))
    for name, b in [("b1", b1), ("b2", b2)]:
        b.coalesce(1).write.mode("overwrite").parquet(f"{base}/land/{name}")
    c = read_table(spark, SF, "customer").select(
        F.col("c_custkey").cast("long"), "c_mktsegment")
    dim = ManagedTable.create(
        spark, f"{base}/dim", c.schema, key_cols=["c_custkey"],
        table_type="MOR")
    dim.append(c)
    with open(f"{base}/contract.avsc", "w") as fh:
        json.dump({"type": "record", "name": "orders_cdc", "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_orderstatus", "type": "string"},
            {"name": "o_custkey", "type": "long"},
            {"name": "price_cents", "type": "long"},
            {"name": "note", "type": "string"},
            {"name": "seq", "type": "long"}]}, fh)
    return JobConfig.from_dict({
        "input_config": {"format": "parquet"},
        "output_config": {
            "table_path": f"{base}/tbl", "mode": "merge",
            "table_type": "MOR", "schema": f"{base}/contract.avsc",
            "key_columns": ["o_orderkey"], "order_column": "seq",
            "cdc_delete_values": ["D"],
            "rollups": [
                {"path": f"{base}/roll1",
                 "group_columns": ["o_orderstatus"],
                 "sum_columns": ["price_cents"],
                 "distinct_columns": ["note", "o_custkey"]},
                {"path": f"{base}/roll2",
                 "group_columns": ["note"],
                 "sum_columns": ["price_cents"],
                 "min_columns": ["price_cents"],
                 "max_columns": ["price_cents"]},
            ],
            "join_mvs": [
                {"path": f"{base}/jmv1", "right_table": f"{base}/dim",
                 "on": ["o_custkey", "c_custkey"]},
                {"path": f"{base}/jmv2", "right_table": f"{base}/dim",
                 "on": ["o_custkey", "c_custkey"],
                 "right_columns": ["c_custkey", "c_mktsegment"]},
            ],
            "topk_mvs": [
                {"path": f"{base}/topk1",
                 "group_columns": ["o_orderstatus"],
                 "order_column": "price_cents", "k": 3},
                {"path": f"{base}/topk2", "group_columns": ["note"],
                 "order_column": "price_cents", "k": 3},
            ],
        },
    })


def run(tag, serial):
    base = os.path.join(tempfile.gettempdir(), f"sg_intrafam_{tag}")
    cfg = build_job(base)
    orig = J._run_units
    if serial:
        # force every intra-family pool serial; the FAMILY-level pool
        # (derived-family) keeps its r12 behavior in both arms so the
        # A/B isolates the r13 change
        def forced(units, pool_name, parallel):
            return orig(
                units, pool_name,
                parallel and pool_name == "derived-family",
            )
        J._run_units = forced
    walls = []
    try:
        for name in ("b1", "b2"):
            t0 = time.perf_counter()
            J.process_files(
                spark, cfg,
                sorted(glob.glob(f"{base}/land/{name}/part-*.parquet")))
            walls.append(round(time.perf_counter() - t0, 2))
    finally:
        J._run_units = orig
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"tag": tag, "serial": serial,
                      "batch_walls": walls, "total": round(sum(walls), 2)}))
    sys.stdout.flush()


# warm both shapes at the smallest SF first
_sf, SF = SF, "/root/testdata/sf0.001"
run("warm-serial", True)
run("warm-pooled", False)
SF = _sf
for i in range(2):
    run(f"serial-{i}", True)
    run(f"pooled-{i}", False)
