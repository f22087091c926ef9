"""Property test of the rollup IVM law: after ANY sequence of source
operations (append / upsert / group-moving update / delete / compact /
rollback) each followed by a refresh, the rollup equals a full
re-aggregate of the source — every aggregate family at once (count,
sum, second moment, min/max via rescan, exact COUNT(DISTINCT) via the
companion, fixed-bin histogram), null groups included.

Hypothesis drives the op sequence (derandomized + bounded examples so
the Spark suite stays deterministic and fast); values are small
integers so double arithmetic is exact and the comparison is
bit-for-bit."""

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    create_rollup,
    hist_bin_expr,
    refresh_rollup,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

pytestmark = pytest.mark.slow  # multi-minute law: smoke tier skips (pytest.ini)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("grp", T.StringType(), True),  # nullable group
        T.StructField("v", T.IntegerType(), True),
        T.StructField("d", T.StringType(), True),  # distinct-count col
        T.StructField("seq", T.IntegerType(), True),
    ]
)

GROUPS = ["a", "b", None]
DVALS = ["x", "y", "z"]
HIST = (0.0, 50.0, 5)
KW = {
    "min_cols": ["v"],
    "max_cols": ["v"],
    "distinct_cols": ["d"],
    "sumsq_cols": ["v"],
    "hist_cols": {"v": HIST},
}

# one op = (kind, rng-ish ints the strategy supplies)
_OP = st.tuples(
    st.sampled_from(["append", "upsert", "delete", "compact", "rollback"]),
    st.integers(min_value=0, max_value=10**6),
)


def _expected(src):
    rows = (
        src.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v").cast("double") * F.col("v")).alias("sq"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.countDistinct("d").alias("nd"),
            *[
                F.sum(
                    F.when(
                        hist_bin_expr("v", *HIST) == i, 1
                    ).otherwise(0)
                ).cast("long").alias(f"h{i}")
                for i in range(HIST[2] + 2)
            ],
        )
        .collect()
    )
    return {
        r.grp: (
            r.n, float(r.s), float(r.sq), r.mn, r.mx, r.nd,
            tuple(r[f"h{i}"] for i in range(HIST[2] + 2)),
        )
        for r in rows
    }


def _actual(dst):
    return {
        r.grp: (
            r.n_rows, r.sum_v, r.sumsq_v, r.min_v, r.max_v, r.n_distinct_d,
            tuple(r.hist_v),
        )
        for r in dst.read().collect()
    }


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=st.lists(_OP, min_size=3, max_size=7))
def test_rollup_equals_full_reaggregate_under_random_ops(
    spark, tmp_path_factory, ops
):
    tmp = str(tmp_path_factory.mktemp("prop"))
    src = ManagedTable.create(
        spark, os.path.join(tmp, "src"), SCHEMA,
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    dst = create_rollup(
        src, os.path.join(tmp, "roll"), ["grp"], ["v"],
        consume_from=1, **KW,
    )
    next_id = [0]
    seq = [0]
    live = set()
    checkpoints = []  # (version, live-set snapshot) for rollback

    def rows_of(specs):
        return spark.createDataFrame(
            [Row(id=i, grp=g, v=v, d=d, seq=s) for i, g, v, d, s in specs],
            SCHEMA,
        )

    def fresh_rows(r, n):
        out = []
        for _ in range(n):
            i = next_id[0]
            next_id[0] += 1
            out.append(
                (
                    i,
                    GROUPS[(r + i) % len(GROUPS)],
                    (r * 7 + i * 3) % 50,
                    DVALS[(r + i) % len(DVALS)],
                    seq[0],
                )
            )
            live.add(i)
        return out

    for kind, r in ops:
        seq[0] += 1
        if kind == "append":
            src.append(rows_of(fresh_rows(r, 1 + r % 3)))
        elif kind == "upsert":
            batch = fresh_rows(r, 1)
            # also move up to two existing keys to a new group/value
            moved = sorted(live)[: 2 if live else 0]
            for i in moved[: 1 + r % 2]:
                batch.append(
                    (
                        i,
                        GROUPS[(r + i + 1) % len(GROUPS)],
                        (r * 11 + i) % 50,
                        DVALS[(r + i + 1) % len(DVALS)],
                        seq[0],
                    )
                )
            src.merge(rows_of(batch))
        elif kind == "delete":
            if live:
                victims = sorted(live)[: 1 + r % 2]
                for i in victims:
                    live.discard(i)
                src.delete_keys(
                    spark.createDataFrame([Row(id=i) for i in victims])
                )
            else:
                src.append(rows_of(fresh_rows(r, 1)))
        elif kind == "compact":
            src.compact()
        elif kind == "rollback":
            if checkpoints:
                v, saved = checkpoints[r % len(checkpoints)]
                if v in src.history() and v != src._current_version():
                    src.rollback(v)
                    live.clear()
                    live.update(saved)
            else:
                src.append(rows_of(fresh_rows(r, 1)))
        refresh_rollup(src, dst, ["grp"], ["v"], **KW)
        checkpoints.append((src._current_version(), set(live)))
        assert _actual(dst) == _expected(src), (
            f"divergence after op {kind} (r={r})"
        )
