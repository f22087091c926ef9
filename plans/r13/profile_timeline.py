#!/usr/bin/env python3
"""Event-timeline profile of the kitchen-sink entry: every wrapped call
records (label, thread, t_start, t_end) so the remaining serial critical
path is visible — who runs when, what overlaps, what gates the batch.

Usage: python plans/r13/profile_timeline.py [sf_dir] [entry]
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ENTRY = sys.argv[2] if len(sys.argv) > 2 else "declarative_pipeline_orders"

from s3_sqs_data_ingestion_demo_spark import extended_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import ingest_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import pipeline_queries  # noqa
from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY
from s3_sqs_data_ingestion_demo_spark.session import build_session
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.operators import rollup as R
from s3_sqs_data_ingestion_demo_spark.operators import join_mv as JM
from s3_sqs_data_ingestion_demo_spark.operators import topk_mv as TK
from s3_sqs_data_ingestion_demo_spark.operators import cdc_export as CE
from pyspark.sql.classic.dataframe import DataFrame as CDF

spark = build_session(app_name="profile-timeline")

EVENTS = []
T0 = [0.0]


def _rec(label, detail, t_start, t_end):
    EVENTS.append((
        round(t_start - T0[0], 3), round(t_end - T0[0], 3),
        threading.current_thread().name, label, detail,
    ))


def wrap_method(cls, name, label, detail_fn=None):
    orig = getattr(cls, name)

    def inner(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **k)
        finally:
            d = detail_fn(self, *a, **k) if detail_fn else ""
            _rec(label, d, t0, time.perf_counter())

    setattr(cls, name, inner)


def wrap_fn(mod, name, label):
    orig = getattr(mod, name)

    def inner(*a, **k):
        t0 = time.perf_counter()
        try:
            return orig(*a, **k)
        finally:
            _rec(label, "", t0, time.perf_counter())

    setattr(mod, name, inner)


def tbl_path(self, *a, **k):
    return os.path.basename(self.path.rstrip("/"))


wrap_method(ManagedTable, "_write_data", "write_data", tbl_path)
wrap_method(ManagedTable, "merge", "merge", tbl_path)
wrap_method(ManagedTable, "delete_keys", "delete_keys", tbl_path)
wrap_method(ManagedTable, "compact", "compact", tbl_path)
wrap_method(ManagedTable, "read", "read", tbl_path)
wrap_method(ManagedTable, "set_properties", "set_props", tbl_path)
wrap_method(CDF, "localCheckpoint", "ckpt")
wrap_method(CDF, "isEmpty", "isEmpty")
wrap_method(CDF, "collect", "collect")
wrap_fn(J, "read_batch", "read_batch")
wrap_fn(J, "_maintain_rollups", "FAM:rollups")
wrap_fn(J, "_maintain_join_mvs", "FAM:join_mvs")
wrap_fn(J, "_maintain_topk_mvs", "FAM:topk_mvs")
wrap_fn(J, "_maintain_indexes", "FAM:indexes")
wrap_fn(J, "_maybe_maintain", "cadence")
wrap_fn(R, "refresh_rollup", "refresh_rollup")
wrap_fn(R, "window_weighted_changes", "weighted_changes")
wrap_fn(JM, "refresh_join_mv", "refresh_join_mv")
wrap_fn(TK, "refresh_topk_mv", "refresh_topk_mv")

fn = REGISTRY[ENTRY].fn
fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
    "overwrite"
).save()  # warm

EVENTS.clear()
T0[0] = time.perf_counter()
t0 = time.perf_counter()
fn(spark, SF).write.format("noop").mode("overwrite").save()
total = time.perf_counter() - t0

print(f"TOTAL {total:.2f}s — {ENTRY}")
for s, e, th, label, detail in sorted(EVENTS):
    bar = " " * int(s * 3) + "#" * max(1, int((e - s) * 3))
    print(f"{s:7.2f} {e:7.2f} {e-s:6.2f} {th[-14:]:>14s} "
          f"{label:>18s} {detail:<10s} |{bar[:120]}")
