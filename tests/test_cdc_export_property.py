"""Property test of the CDC-export law: after ANY sequence of source
operations (append / upsert / group-moving update / delete / compact /
rollback) each followed by an export, BOTH consumption modes
reconstruct the source's live state at every prefix —

- the full-history law: ``replay_to_state(read_change_export(dir))``
  == ``src.read()`` (an export directory whose windows are
  periodically COALESCED but never pruned — window binpack must be
  row-invisible), and
- the incremental-consumer law: a tail reader that applies each
  ``since=cursor`` read to its own state and PRUNES consumed windows
  behind itself converges to the same state (the retention surface
  exercised mid-sequence, not just in isolation).

Hypothesis drives the op sequence (derandomized + bounded examples so
the Spark suite stays deterministic and fast)."""

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
    coalesce_export,
    create_change_export,
    export_changes,
    prune_export,
    read_change_export,
    replay_to_state,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

pytestmark = pytest.mark.slow  # multi-minute law: smoke tier skips (pytest.ini)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("seq", T.IntegerType(), True),
    ]
)

GROUPS = ["a", "b", "c"]

_OP = st.tuples(
    st.sampled_from(
        ["append", "upsert", "delete", "compact", "rollback", "evolve"]
    ),
    st.integers(min_value=0, max_value=10**6),
)


def _state_of(df):
    return sorted((r.id, r.grp, r.v) for r in df.select("id", "grp", "v").collect())


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=st.lists(_OP, min_size=3, max_size=6))
def test_export_roundtrip_and_tail_under_random_ops(
    spark, tmp_path_factory, ops
):
    tmp = str(tmp_path_factory.mktemp("exprop"))
    src = ManagedTable.create(
        spark, os.path.join(tmp, "src"), SCHEMA,
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    ex_full = os.path.join(tmp, "ex_full")   # never pruned: full law
    ex_tail = os.path.join(tmp, "ex_tail")   # pruned behind the consumer
    create_change_export(src, ex_full, consume_from=1)
    create_change_export(src, ex_tail, consume_from=1)

    next_id = [0]
    seq = [0]
    live = set()
    checkpoints = []
    tail_state = {}   # the incremental consumer's own materialization
    cursor = [1]

    def rows_of(specs):
        return spark.createDataFrame(
            [Row(id=i, grp=g, v=v, seq=s) for i, g, v, s in specs], SCHEMA
        )

    def fresh_rows(r, n):
        out = []
        for _ in range(n):
            i = next_id[0]
            next_id[0] += 1
            out.append(
                (i, GROUPS[(r + i) % len(GROUPS)], (r * 7 + i * 3) % 50,
                 seq[0])
            )
            live.add(i)
        return out

    for kind, r in ops:
        seq[0] += 1
        if kind == "append":
            src.append(rows_of(fresh_rows(r, 1 + r % 3)))
        elif kind == "upsert":
            batch = fresh_rows(r, 1)
            moved = sorted(live)[: 2 if live else 0]
            for i in moved[: 1 + r % 2]:
                batch.append(
                    (i, GROUPS[(r + i + 1) % len(GROUPS)],
                     (r * 11 + i) % 50, seq[0])
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
        elif kind == "evolve":
            # schema evolution mid-sequence: add a fresh nullable
            # column (or widen v once), then land a small batch so the
            # evolved shape reaches the export — both laws must hold
            # across the reconciliation boundary (old-SCHEMA batches
            # keep appending; align null-fills the added columns)
            can_widen = not isinstance(
                src.meta.schema["v"].dataType, T.LongType
            )
            if r % 2 == 1 and can_widen:
                src.widen_column("v", T.LongType())
            else:
                src.add_columns(
                    [T.StructField(f"x{seq[0]}", T.IntegerType(), True)]
                )
            src.append(rows_of(fresh_rows(r, 1)))
        elif kind == "rollback":
            if checkpoints:
                v, saved = checkpoints[r % len(checkpoints)]
                if v in src.history() and v != src._current_version():
                    src.rollback(v)
                    live.clear()
                    live.update(saved)
            else:
                src.append(rows_of(fresh_rows(r, 1)))
        checkpoints.append((src._current_version(), set(live)))

        # full-history law (with window binpack folded in: every third
        # step coalesces the full retained history — must be
        # row-invisible to the replay)
        w_full = export_changes(src, ex_full)
        if w_full is not None and seq[0] % 3 == 0:
            coalesce_export(spark, ex_full, w_full[1])
        assert _state_of(
            replay_to_state(read_change_export(spark, ex_full), ["id"])
        ) == _state_of(src.read()), f"full replay diverged after {kind}"

        # incremental-consumer law: apply the since-tail, prune behind
        w = export_changes(src, ex_tail)
        if w is not None:
            tail = read_change_export(spark, ex_tail, since=cursor[0])
            setting = tail.filter(
                "_change_type in ('insert','update_postimage','delete')"
            ).collect()
            for row in sorted(setting, key=lambda x: x._export_hi):
                if row._change_type == "delete":
                    tail_state.pop(row.id, None)
                else:
                    tail_state[row.id] = (row.grp, row.v)
            prune_export(ex_tail, cursor[0])
            cursor[0] = w[1]
        assert sorted(
            (i, g, v) for i, (g, v) in tail_state.items()
        ) == _state_of(src.read()), f"tail consumer diverged after {kind}"
