#!/usr/bin/env python3
"""Profile ingest_cdc_merge_with_indexes internals (minhash path)."""
import os
import sys
import time
import json
from collections import defaultdict

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from s3_sqs_data_ingestion_demo_spark.session import build_session
from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from s3_sqs_data_ingestion_demo_spark.streaming import neardup as ND
from s3_sqs_data_ingestion_demo_spark.operators import search_index as SI

import bench as B

spark = build_session(app_name="profile-ixmerge")

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

wrap(ND, "_batch_signatures", "mh_signatures")
wrap(ND, "_near_dup_pairs", "mh_pairs")
wrap(ND, "process_near_dup_batch_table", "mh_process_total")
wrap(ND, "remove_documents", "mh_remove")
wrap(SI, "append_to_search_index", "bm25_append")
wrap(SI, "remove_documents_bulk", "bm25_remove")
wrap_method(ManagedTable, "merge", "tbl_merge")
wrap_method(ManagedTable, "compact", "tbl_compact")
wrap_method(ManagedTable, "_write_data", "tbl__write_data")

for i in range(2):
    times.clear(); counts.clear()
    phases = {}
    t0 = time.perf_counter()
    B._bench_cdc_merge_with_indexes(spark, "/root/testdata/sf0.1", phases_out=phases)
    total = time.perf_counter() - t0
    print(json.dumps({"run": i, "total": round(total, 2),
                      "phases": {k: round(v, 2) if isinstance(v, float) else v for k, v in phases.items()},
                      "times": {k: round(v, 2) for k, v in sorted(times.items(), key=lambda kv: -kv[1])},
                      "counts": dict(counts)}))
    sys.stdout.flush()
