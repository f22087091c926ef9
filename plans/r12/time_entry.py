#!/usr/bin/env python3
"""Explain + time triangle_census_coordered_parts at sf0.1."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from s3_sqs_data_ingestion_demo_spark import extended_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import ingest_queries  # noqa
from s3_sqs_data_ingestion_demo_spark import pipeline_queries  # noqa
from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY
from s3_sqs_data_ingestion_demo_spark.session import build_session

NAME = sys.argv[1] if len(sys.argv) > 1 else "triangle_census_coordered_parts"
SF = "/root/testdata/sf0.1"
spark = build_session(app_name="explain")
fn = REGISTRY[NAME].fn

from pyspark.sql.classic.dataframe import DataFrame as _DF
_orig_lc = _DF.localCheckpoint
_orig_ps = _DF.persist
_DF.localCheckpoint = lambda self, eager=True: self
_DF.persist = lambda self, *a, **k: self
df = fn(spark, SF)
pass
_DF.localCheckpoint = _orig_lc
_DF.persist = _orig_ps

for i in range(3):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    print("RUN", i, round(time.perf_counter() - t0, 2))
