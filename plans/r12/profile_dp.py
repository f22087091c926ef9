#!/usr/bin/env python3
"""Profile declarative_pipeline_orders: per-hook wall times + config A/B.

Usage: python /tmp/profile_dp.py [sf_dir]
"""
import os
import sys
import time
import json
from collections import defaultdict

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from s3_sqs_data_ingestion_demo_spark import extended_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import ingest_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import pipeline_queries  # noqa
from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY
from s3_sqs_data_ingestion_demo_spark.session import build_session
from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from s3_sqs_data_ingestion_demo_spark.operators import rollup as R
from s3_sqs_data_ingestion_demo_spark.operators import join_mv as JM
from s3_sqs_data_ingestion_demo_spark.operators import topk_mv as TK

spark = build_session(app_name="profile")

times = defaultdict(float)
counts = defaultdict(int)

def wrap(mod, name, label):
    orig = getattr(mod, name)
    def inner(*a, **k):
        t0 = time.perf_counter()
        try:
            return orig(*a, **k)
        finally:
            times[label] += time.perf_counter() - t0
            counts[label] += 1
    setattr(mod, name, inner)
    return orig

def wrap_method(cls, name, label):
    orig = getattr(cls, name)
    def inner(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **k)
        finally:
            times[label] += time.perf_counter() - t0
            counts[label] += 1
    setattr(cls, name, inner)
    return orig

origs = []
origs.append((J, "_maintain_rollups", wrap(J, "_maintain_rollups", "hook_rollups")))
origs.append((J, "_maintain_join_mvs", wrap(J, "_maintain_join_mvs", "hook_join_mvs")))
origs.append((J, "_maintain_topk_mvs", wrap(J, "_maintain_topk_mvs", "hook_topk_mvs")))
origs.append((J, "_maintain_indexes", wrap(J, "_maintain_indexes", "hook_indexes")))
origs.append((J, "_maybe_maintain", wrap(J, "_maybe_maintain", "hook_cadence")))
origs.append((J, "read_batch", wrap(J, "read_batch", "read_batch")))

wrap_method(ManagedTable, "merge", "tbl_merge")
wrap_method(ManagedTable, "delete_keys", "tbl_delete_keys")
wrap_method(ManagedTable, "write", "tbl_write")
wrap_method(ManagedTable, "compact", "tbl_compact")
wrap_method(ManagedTable, "set_properties", "tbl_set_properties")
wrap_method(ManagedTable, "_write_data", "tbl__write_data")
wrap_method(ManagedTable, "_commit_snapshot", "tbl__commit_snapshot")

# inner rollup pieces
wrap_method(ManagedTable, "read_changes_cdf", "cdf_read")

fn = REGISTRY["declarative_pipeline_orders"].fn

def run(tag):
    times.clear(); counts.clear()
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t0
    snap = {k: round(v, 2) for k, v in sorted(times.items(), key=lambda kv: -kv[1])}
    cnt = dict(counts)
    print(json.dumps({"tag": tag, "total": round(total, 2), "times": snap, "counts": cnt}))
    sys.stdout.flush()

# warm at sf0.001
fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

run("baseline-1")
run("baseline-2")

# A/B: AQE coalesce to size, not parallelism
spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
run("pf-false-1")
run("pf-false-2")
