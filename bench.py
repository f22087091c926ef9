#!/usr/bin/env python3
"""Benchmark harness: run every registered query at the target scale
factor and emit ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Queries execute via the ``noop`` sink so timings measure the full plan
(scan → shuffle → result) without driver-collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from s3_sqs_data_ingestion_demo_spark import extended_queries  # noqa: F401
    from s3_sqs_data_ingestion_demo_spark import pipeline_queries  # noqa: F401
    from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY
    from s3_sqs_data_ingestion_demo_spark.session import build_session

    spark = build_session(app_name="bench")

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once so per-query numbers measure
    # execution, not first-touch setup
    REGISTRY["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name, spec in sorted(REGISTRY.items()):
        start = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
