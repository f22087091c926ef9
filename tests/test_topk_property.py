"""Property test of the top-k IVM law: after ANY sequence of source
operations (append / upsert with group moves / delete / compact /
rollback) each followed by a refresh, the maintained top-k equals a
full re-rank of the source's final state — plus the coarse-routing
law: ``reaggregate_topk`` over a subset of the group columns equals
the top-k computed directly at that granularity (exact for k' <= k by
the subset argument in operators/topk_mv.py).

Hypothesis drives the op sequence (derandomized + bounded examples so
the suite stays deterministic and fast)."""

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.topk_mv import (
    create_topk_mv,
    reaggregate_topk,
    refresh_topk_mv,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

pytestmark = pytest.mark.slow  # multi-minute law: smoke tier skips (pytest.ini)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("grp", T.StringType(), True),  # nullable group
        T.StructField("sub", T.IntegerType(), True),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("seq", T.IntegerType(), True),
    ]
)

GROUPS = ["a", "b", None]
K = 3
KW = dict(
    group_cols=["grp", "sub"], order_col="v", k=K, id_cols=["id"],
)

_OP = st.tuples(
    st.sampled_from(["append", "upsert", "delete", "compact", "rollback"]),
    st.integers(min_value=0, max_value=10**6),
)


def _full_rerank(src, subset, k):
    w = Window.partitionBy(*subset).orderBy(
        F.col("v").desc_nulls_last(), F.col("id").asc_nulls_last()
    )
    return sorted(
        (
            tuple(r[c] for c in subset) + (r.id, r.v)
            for r in src.read()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .collect()
        ),
        key=repr,
    )


@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=st.lists(_OP, min_size=3, max_size=6))
def test_topk_equals_full_rerank_under_random_ops(
    spark, tmp_path_factory, ops
):
    tmp = str(tmp_path_factory.mktemp("topkprop"))
    src = ManagedTable.create(
        spark, os.path.join(tmp, "src"), SCHEMA,
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    dst = create_topk_mv(src, os.path.join(tmp, "mv"), consume_from=1, **KW)
    next_id = [0]
    seq = [0]
    live = set()
    checkpoints = []

    def rows_of(specs):
        return spark.createDataFrame(
            [Row(id=i, grp=g, sub=b, v=v, seq=s) for i, g, b, v, s in specs],
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
                    (r + i) % 2,
                    (r * 7 + i * 3) % 60,
                    seq[0],
                )
            )
            live.add(i)
        return out

    for kind, r in ops:
        seq[0] += 1
        if kind == "append":
            src.append(rows_of(fresh_rows(r, 2 + r % 3)))
        elif kind == "upsert":
            batch = fresh_rows(r, 1)
            moved = sorted(live)[: 2 if live else 0]
            for i in moved[: 1 + r % 2]:
                batch.append(
                    (
                        i,
                        GROUPS[(r + i + 1) % len(GROUPS)],
                        (r + i + 1) % 2,
                        (r * 11 + i) % 60,
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
        refresh_topk_mv(src, dst, **KW)
        checkpoints.append((src._current_version(), set(live)))
        got = sorted(
            ((r2.grp, r2.sub, r2.id, r2.v) for r2 in dst.read().collect()),
            key=repr,
        )
        assert got == _full_rerank(src, ["grp", "sub"], K), (
            f"divergence after op {kind} (r={r})"
        )
        # coarse routing: top-2 per grp from the (grp, sub) MV
        coarse = sorted(
            (
                (r2.grp, r2.id, r2.v)
                for r2 in reaggregate_topk(
                    dst, ["grp"], "v", k=2, id_cols=["id"]
                ).collect()
            ),
            key=repr,
        )
        assert coarse == _full_rerank(src, ["grp"], 2), (
            f"coarse-routing divergence after op {kind} (r={r})"
        )
