"""Cold-JVM first-action regression for the sf0.1 minhash anomaly.

Round 1 observed the full minhash plan losing one pair on a COLD
JVM's very first action at sf0.1, with every warm run correct.  Root
cause (found in round 2): the signature seeds were built with a
two-parameter transform() lambda, which PySpark binds as the
(element, index) form — the seed became the stringified index
Column, so the hash family varied with the session's lambda-variable
counter, and a fresh session's counter state differs from every warm
state (see ``_minhash_sig_col`` in operators/dedup.py and
tests/test_dedup_determinism.py).  This test pins the contract where
the bug manifested: fresh subprocess, first action is the full
minhash plan at sf0.1, pair count must equal DuckDB's.
"""

import os
import subprocess
import sys

import duckdb
import pytest

SF01 = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
from s3_sqs_data_ingestion_demo_spark.session import build_session
from s3_sqs_data_ingestion_demo_spark.operators.dedup import minhash_dedup_pairs

spark = build_session(app_name="cold-minhash")
df = spark.read.parquet("%s/documents.parquet")
# the count IS the first action of this JVM
print("PAIRS=", minhash_dedup_pairs(df).count(), sep="")
"""


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 testdata absent")
def test_cold_jvm_first_action_minhash_sf01_matches_duckdb():
    from s3_sqs_data_ingestion_demo_spark import pipeline_queries  # noqa: F401
    from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF01}/documents.parquet')"
    )
    want = len(con.execute(REGISTRY["minhash_lsh_near_dup_documents"].oracle).fetchall())

    out = subprocess.run(
        [sys.executable, "-c", _CHILD % SF01],
        capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = int(out.stdout.split("PAIRS=")[1].split()[0])
    assert got == want > 0
