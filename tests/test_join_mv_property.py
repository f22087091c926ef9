"""Property test of the join-MV law: after ANY sequence of operations
on EITHER source (insert / join-key-moving update / delete / compact),
each followed by a refresh, the materialization equals the inner
equi-join recomputed from scratch.  Exercises the affected-key
recompute across both change feeds, CDF pre-images dirtying moved
keys' old AND new values, vanished-pair deletes, and maintenance
commits splitting consume windows."""

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.join_mv import (
    create_join_mv,
    refresh_join_mv,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

pytestmark = pytest.mark.slow  # multi-minute law: smoke tier skips (pytest.ini)

L_SCHEMA = T.StructType(
    [
        T.StructField("lid", T.IntegerType(), False),
        T.StructField("jk", T.IntegerType(), True),  # join key (nullable)
        T.StructField("lv", T.IntegerType(), True),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.IntegerType(), False),
        T.StructField("rk", T.IntegerType(), True),
        T.StructField("rv", T.IntegerType(), True),
    ]
)

_OP = st.tuples(
    st.sampled_from(
        ["l_insert", "l_move", "l_delete", "r_insert", "r_move", "r_delete",
         "l_compact"]
    ),
    st.integers(min_value=0, max_value=10**6),
)

N_KEYS = 5  # small domain so moves collide and fan out


def _expected(left, right):
    l = left.read()
    r = right.read()
    j = l.join(r, l["jk"] == r["rk"], "inner")
    return {
        (row.lid, row.rid): (row.jk, row.lv, row.rv) for row in j.collect()
    }


def _actual(mv):
    return {
        (row.lid, row.rid): (row.jk, row.lv, row.rv)
        for row in mv.read().collect()
    }


@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=st.lists(_OP, min_size=3, max_size=6))
def test_join_mv_equals_full_rejoin_under_random_ops(
    spark, tmp_path_factory, ops
):
    tmp = str(tmp_path_factory.mktemp("jmvprop"))
    left = ManagedTable.create(
        spark, os.path.join(tmp, "l"), L_SCHEMA,
        key_cols=["lid"], table_type="MOR",
    )
    right = ManagedTable.create(
        spark, os.path.join(tmp, "r"), R_SCHEMA,
        key_cols=["rid"], table_type="MOR",
    )
    mv = create_join_mv(
        left, right, os.path.join(tmp, "mv"), on=("jk", "rk"),
        consume_from=(1, 1),
    )
    nxt = {"l": 0, "r": 0}
    live = {"l": set(), "r": set()}

    def l_rows(specs):
        return spark.createDataFrame(
            [Row(lid=i, jk=k, lv=v) for i, k, v in specs], L_SCHEMA
        )

    def r_rows(specs):
        return spark.createDataFrame(
            [Row(rid=i, rk=k, rv=v) for i, k, v in specs], R_SCHEMA
        )

    for kind, r in ops:
        side = kind[0]
        if kind.endswith("insert"):
            i = nxt[side]
            nxt[side] += 1
            live[side].add(i)
            # every ~4th insert lands a NULL join key (must never
            # appear in the MV — inner equi-join semantics)
            k = None if (r + i) % 4 == 0 else (r + i) % N_KEYS
            if side == "l":
                left.append(l_rows([(i, k, r % 100)]))
            else:
                right.append(r_rows([(i, k, r % 100)]))
        elif kind.endswith("move"):
            tbl, mk = (left, l_rows) if side == "l" else (right, r_rows)
            if live[side]:
                i = sorted(live[side])[r % len(live[side])]
                tbl.merge(mk([(i, (r + 1) % N_KEYS, (r * 3) % 100)]))
            else:
                live[side].add(nxt[side])
                tbl.merge(mk([(nxt[side], r % N_KEYS, r % 100)]))
                nxt[side] += 1
        elif kind.endswith("delete"):
            tbl = left if side == "l" else right
            if live[side]:
                i = sorted(live[side])[r % len(live[side])]
                live[side].discard(i)
                tbl.delete_keys(
                    spark.createDataFrame(
                        [Row(**{("lid" if side == "l" else "rid"): i})]
                    )
                )
            else:
                continue
        elif kind == "l_compact":
            left.compact()
        refresh_join_mv(left, right, mv, on=("jk", "rk"))
        assert _actual(mv) == _expected(left, right), (
            f"divergence after op {kind} (r={r})"
        )
