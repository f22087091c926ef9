#!/usr/bin/env python3
"""Per-phase wall profile of single-family IVM bench entries.

Usage: python /tmp/profile_ivm.py <entry> [runs]
"""
import os
import sys
import time
import json
from collections import defaultdict

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

ENTRY = sys.argv[1]
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

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
from s3_sqs_data_ingestion_demo_spark.operators import cdc_export as CE

spark = build_session(app_name="profile-ivm")

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

wrap(R, "refresh_rollup", "refresh_rollup")
wrap(R, "window_weighted_changes", "window_weighted_changes")
wrap(R, "change_segments", "change_segments")
wrap(JM, "refresh_join_mv", "refresh_join_mv")
wrap(TK, "refresh_topk_mv", "refresh_topk_mv")
wrap(CE, "export_changes", "export_changes")
wrap(CE, "sync_from_export", "sync_from_export")
wrap(CE, "scrub_export_windows", "scrub_export_windows")
wrap(CE, "create_change_export", "create_change_export")
wrap_method(ManagedTable, "append", "tbl_append")
wrap(J, "_maybe_maintain", "hook_cadence")
wrap(J, "read_batch", "read_batch")

wrap_method(ManagedTable, "merge", "tbl_merge")
wrap_method(ManagedTable, "delete_keys", "tbl_delete_keys")
wrap_method(ManagedTable, "write", "tbl_write")
wrap_method(ManagedTable, "compact", "tbl_compact")
wrap_method(ManagedTable, "_write_data", "tbl__write_data")
wrap_method(ManagedTable, "_commit_snapshot", "tbl__commit_snapshot")
wrap_method(ManagedTable, "_collect_entry_stats", "tbl__entry_stats")
wrap_method(ManagedTable, "read_changes_cdf", "cdf_read")
wrap_method(ManagedTable, "read", "tbl_read")

fn = REGISTRY[ENTRY].fn

# warm at sf0.001
fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

for i in range(RUNS):
    times.clear(); counts.clear()
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t0
    snap = {k: round(v, 2) for k, v in sorted(times.items(), key=lambda kv: -kv[1])}
    print(json.dumps({"entry": ENTRY, "run": i, "total": round(total, 2),
                      "times": snap, "counts": dict(counts)}))
    sys.stdout.flush()
