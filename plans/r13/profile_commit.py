#!/usr/bin/env python3
"""Decompose the ManagedTable per-commit constant (VERDICT r12 item #1).

Wraps the commit machinery at function granularity and runs the
kitchen-sink entry (declarative_pipeline_orders) plus one single-family
IVM entry, printing per-label cumulative wall + call counts, so the
12.2 s of tbl__write_data seen in r12 is attributable to parquet write
vs footer-stats harvest vs manifest CAS vs probe jobs.

Usage: python plans/r13/profile_commit.py [sf_dir] [entry ...]
"""
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ENTRIES = sys.argv[2:] or [
    "declarative_pipeline_orders",
    "incremental_rollup_hist_orders",
]

from s3_sqs_data_ingestion_demo_spark import extended_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import ingest_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import pipeline_queries  # noqa
from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY
from s3_sqs_data_ingestion_demo_spark.session import build_session
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from s3_sqs_data_ingestion_demo_spark.operators import rollup as R
from pyspark.sql.classic.dataframe import DataFrame as CDF
from pyspark.sql.readwriter import DataFrameWriter

spark = build_session(app_name="profile-commit")

times = defaultdict(float)
counts = defaultdict(int)


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


def wrap_fn(mod, name, label):
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


wrap_method(ManagedTable, "_write_data", "w_total")
wrap_method(ManagedTable, "_collect_entry_stats", "w_stats")
wrap_method(ManagedTable, "_list_parts", "w_list_parts")
wrap_method(ManagedTable, "_commit_snapshot", "c_snapshot")
wrap_method(ManagedTable, "_commit_entry_with_retry", "c_entry_retry")
wrap_method(ManagedTable, "_manifest_at", "m_manifest_at")
wrap_method(ManagedTable, "set_properties", "m_set_properties")
wrap_method(ManagedTable, "find_commit_tag", "m_find_tag")
wrap_method(ManagedTable, "data_commits_since_maintenance", "m_cadence_probe")
wrap_method(ManagedTable, "load", "m_load")
wrap_method(ManagedTable, "merge", "op_merge")
wrap_method(ManagedTable, "delete_keys", "op_delete_keys")
wrap_method(ManagedTable, "compact", "op_compact")
wrap_method(ManagedTable, "expire_snapshots", "op_expire")
wrap_method(ManagedTable, "read", "op_read")
wrap_method(CDF, "localCheckpoint", "df_localCheckpoint")
wrap_method(CDF, "isEmpty", "df_isEmpty")
wrap_method(CDF, "collect", "df_collect")
wrap_method(DataFrameWriter, "parquet", "w_parquet")
wrap_fn(R, "_probe_total_and_zero", "r_probe_tz")
wrap_fn(R, "window_weighted_changes", "r_weighted")
wrap_fn(R, "change_segments", "r_segments")


def run(entry, tag):
    times.clear()
    counts.clear()
    t0 = time.perf_counter()
    REGISTRY[entry].fn(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    total = time.perf_counter() - t0
    snap = {
        k: round(v, 2)
        for k, v in sorted(times.items(), key=lambda kv: -kv[1])
    }
    print(json.dumps({
        "entry": entry, "tag": tag, "total": round(total, 2),
        "times": snap, "counts": dict(counts),
    }))
    sys.stdout.flush()


for entry in ENTRIES:
    REGISTRY[entry].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()  # warm
    run(entry, "run-1")
    run(entry, "run-2")
