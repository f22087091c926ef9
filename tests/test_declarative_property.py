"""Property test of the declarative composition: ONE job config
declaring a rollup (sum + exact distinct + histogram) + a join MV +
a top-k MV + a CDC export + table compaction cadence, driven through
``process_files`` over RANDOM bounded CDC op sequences (insert /
group-moving upsert / delete / FORGET batches).  After every batch,
EVERY declared family is value-checked against a recomputation of the
live table — so cadence interleavings (the mid-stream compaction
splitting every family's change window, the export publishing marker
windows, the shared ChangeWindowCache) are exercised in orders the
fixed kitchen-sink driver entry cannot reach.

The ``forget`` op (r12) runs the takedown flow mid-stream
(``job.forget_keys``: table delete + delete-window publish + retained-
window scrub) followed by a fresh batch whose refresh folds the
takedown's delete into every family — replay == live table must hold
THROUGH a scrub, and at the end of each example no forgotten payload
may survive anywhere under the export directory.

Hypothesis is derandomized + bounded so the Spark suite stays
deterministic; runtime is comparable to the join-MV law."""

import pytest

import glob
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
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
        T.StructField("Op", T.StringType(), True),
    ]
)

GROUPS = ["a", "b", "c"]

_OP = st.tuples(
    st.sampled_from(["insert", "upsert", "delete", "forget"]),
    st.integers(min_value=0, max_value=10**6),
)

AVSC = """{"type": "record", "name": "cdc", "fields": [
  {"name": "id", "type": "int"},
  {"name": "grp", "type": ["null", "string"]},
  {"name": "v", "type": ["null", "int"]},
  {"name": "seq", "type": ["null", "int"]}
]}"""


def _cfg(tmp):
    return JobConfig.from_dict(
        {
            "input_config": {"format": "parquet"},
            "output_config": {
                "table_path": f"{tmp}/tbl",
                "mode": "merge",
                "table_type": "MOR",
                "schema": f"{tmp}/contract.avsc",
                "key_columns": ["id"],
                "order_column": "seq",
                "cdc_delete_values": ["D"],
                "maintenance": {"compact_every": 2},
                "rollups": [
                    {
                        "path": f"{tmp}/roll",
                        "group_columns": ["grp"],
                        "sum_columns": ["v"],
                        "distinct_columns": ["v"],
                        "hist_columns": {"v": [0.0, 50.0, 5]},
                        "maintenance_every": 2,
                    }
                ],
                "join_mvs": [
                    {
                        "path": f"{tmp}/jmv",
                        "right_table": f"{tmp}/dim",
                        "on": ["grp", "d_grp"],
                    }
                ],
                "topk_mvs": [
                    {
                        "path": f"{tmp}/topk",
                        "group_columns": ["grp"],
                        "order_column": "v",
                        "k": 2,
                    }
                ],
                "cdc_exports": [{"path": f"{tmp}/export"}],
            },
        }
    )


@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=st.lists(_OP, min_size=3, max_size=5))
def test_declared_families_track_random_cdc_streams(
    spark, tmp_path_factory, ops
):
    tmp = str(tmp_path_factory.mktemp("declprop"))
    with open(f"{tmp}/contract.avsc", "w") as fh:
        fh.write(AVSC)
    dim = ManagedTable.create(
        spark,
        f"{tmp}/dim",
        T.StructType(
            [
                T.StructField("d_grp", T.StringType(), False),
                T.StructField("seg", T.StringType(), True),
            ]
        ),
        key_cols=["d_grp"],
        table_type="MOR",
    )
    # one group deliberately missing from the dimension: its rows must
    # never appear in the join MV
    dim.append(
        spark.createDataFrame(
            [Row(d_grp="a", seg="A"), Row(d_grp="b", seg="B")],
            dim.meta.schema,
        )
    )
    cfg = _cfg(tmp)

    model = {}  # id -> (grp, v)
    next_id = [0]
    seq = [0]
    os.makedirs(f"{tmp}/land")

    def land(rows):
        df = spark.createDataFrame(
            [Row(id=i, grp=g, v=v, seq=s, Op=op) for i, g, v, s, op in rows],
            SCHEMA,
        )
        path = f"{tmp}/land/b{seq[0]}"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        return sorted(glob.glob(f"{path}/part-*.parquet"))

    def fresh(r, n):
        out = []
        for _ in range(n):
            i = next_id[0]
            next_id[0] += 1
            g = GROUPS[(r + i) % len(GROUPS)]
            v = (r * 7 + i * 3) % 50
            out.append((i, g, v, seq[0], "I"))
            model[i] = (g, v)
        return out

    forgotten = set()
    for kind, r in ops:
        seq[0] += 1
        if kind == "insert":
            batch = fresh(r, 1 + r % 3)
        elif kind == "forget":
            # takedown mid-stream: scrub the export, then land a fresh
            # batch — its refresh folds the takedown's delete window
            # into every family before the per-op value checks below
            if model:
                victim = sorted(model)[r % len(model)]
                J.forget_keys(
                    spark, cfg,
                    spark.createDataFrame([(victim,)], "id int"),
                )
                model.pop(victim)
                forgotten.add(victim)
            batch = fresh(r, 1)
        elif kind == "upsert":
            batch = fresh(r, 1)
            for i in sorted(model)[: 1 + r % 2]:
                g = GROUPS[(r + i + 1) % len(GROUPS)]
                v = (r * 11 + i) % 50
                batch = [b for b in batch if b[0] != i]
                batch.append((i, g, v, seq[0], "U"))
                model[i] = (g, v)
        else:  # delete
            if model:
                victims = sorted(model)[: 1 + r % 2]
                batch = [(i, None, None, seq[0], "D") for i in victims]
                for i in victims:
                    model.pop(i)
            else:
                batch = fresh(r, 1)
        J.process_files(spark, cfg, land(batch))

        tbl = ManagedTable.load(spark, f"{tmp}/tbl")
        got_tbl = sorted(
            (x.id, x.grp, x.v)
            for x in tbl.read().select("id", "grp", "v").collect()
        )
        want_tbl = sorted((i, g, v) for i, (g, v) in model.items())
        assert got_tbl == want_tbl, f"table diverged after {kind}"

        # rollup: n / sum / exact distinct / histogram vs recompute
        want_roll = {
            x.grp: (x.n, float(x.s), x.nd)
            for x in tbl.read()
            .groupBy("grp")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("s"),
                F.countDistinct("v").alias("nd"),
            )
            .collect()
        }
        roll = ManagedTable.load(spark, f"{tmp}/roll").read().collect()
        got_roll = {x.grp: (x.n_rows, x.sum_v, x.n_distinct_v) for x in roll}
        assert got_roll == want_roll, f"rollup diverged after {kind}"
        # histogram row-mass per group must equal the group count —
        # derived from frames already collected, no extra job
        got_hist_total = {x.grp: sum(x.hist_v) for x in roll}
        assert got_hist_total == {g: n for g, (n, _, _) in want_roll.items()}

        # join MV vs recompute (group 'c' has no dimension row)
        want_jmv = sorted(
            (x.id, x.grp, x.seg)
            for x in tbl.read()
            .join(dim.read(), F.col("grp") == F.col("d_grp"))
            .select("id", "grp", "seg")
            .collect()
        )
        got_jmv = sorted(
            (x.id, x.grp, x.seg)
            for x in ManagedTable.load(spark, f"{tmp}/jmv")
            .read()
            .select("id", "grp", "seg")
            .collect()
        )
        assert got_jmv == want_jmv, f"join MV diverged after {kind}"

        # top-k vs full re-rank of the live state
        from pyspark.sql import Window

        w = Window.partitionBy("grp").orderBy(
            F.col("v").desc_nulls_last(), F.col("id").asc_nulls_last()
        )
        want_topk = sorted(
            (x.grp, x.id, x.v)
            for x in tbl.read()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 2)
            .collect()
        )
        got_topk = sorted(
            (x.grp, x.id, x.v)
            for x in ManagedTable.load(spark, f"{tmp}/topk").read().collect()
        )
        assert got_topk == want_topk, f"top-k diverged after {kind}"

        # export replay vs the live table
        got_replay = sorted(
            (x.id, x.grp, x.v)
            for x in replay_to_state(
                read_change_export(spark, f"{tmp}/export"), ["id"]
            )
            .select("id", "grp", "v")
            .collect()
        )
        assert got_replay == want_tbl, f"export replay diverged after {kind}"

    # takedown audit at example end: across EVERY window directory,
    # forgotten keys survive only as fully-nulled delete tombstones
    if forgotten:
        ex = f"{tmp}/export"
        for name in sorted(os.listdir(ex)):
            d = os.path.join(ex, name)
            if not name.startswith("w_") or not any(
                f.endswith(".parquet") for f in os.listdir(d)
            ):
                continue
            for x in spark.read.parquet(d).collect():
                if x.id in forgotten:
                    assert x._change_type == "delete", (
                        f"forgotten payload row survived in {name}"
                    )
                    assert (
                        x.grp is None and x.v is None and x.seq is None
                    ), f"forgotten payload values survived in {name}"
