"""Second-moment rollups (sumsq_cols): Σx² maintained next to Σx —
the purely-additive decomposition behind AVG/VARIANCE/STDDEV routing
(rollup_stats).  Retractions subtract exactly like sums (no rescan);
inputs here are bounded integers so double arithmetic is exact and
every comparison is bit-exact against a full re-aggregate."""

import math
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    create_rollup,
    reaggregate_rollup,
    refresh_rollup,
    rollup_stats,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("sub", T.StringType(), True),
        T.StructField("v", T.IntegerType(), True),
    ]
)


def _mk(spark, tmp):
    return ManagedTable.create(
        spark,
        os.path.join(str(tmp), "src"),
        SCHEMA,
        key_cols=["id"],
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, sub=s, v=v) for i, g, s, v in rows], SCHEMA
    )


def _oracle(src):
    return {
        r.grp: (r.n, float(r.s), float(r.sq))
        for r in src.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v").cast("double") * F.col("v")).alias("sq"),
        )
        .collect()
    }


def _state(dst):
    return {
        r.grp: (r.n_rows, r.sum_v, r.sumsq_v) for r in dst.read().collect()
    }


def test_sumsq_folds_through_upsert_and_delete(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.append(
        _rows(spark, [(1, "a", "x", 3), (2, "a", "x", 5), (3, "b", "y", 7)])
    )
    roll = create_rollup(
        src,
        os.path.join(str(tmp_path), "r"),
        ["grp"],
        ["v"],
        consume_from=1,
        sumsq_cols=["v"],
    )
    kw = {"sumsq_cols": ["v"]}
    refresh_rollup(src, roll, ["grp"], ["v"], **kw)
    assert _state(roll) == _oracle(src)
    # update moves a row's value AND group: retraction -3² from a,
    # addition +10² to b
    src.merge(_rows(spark, [(1, "b", "x", 10), (4, "a", "x", 2)]))
    refresh_rollup(src, roll, ["grp"], ["v"], **kw)
    assert _state(roll) == _oracle(src)
    src.delete_keys(spark.createDataFrame([Row(id=2)]))
    refresh_rollup(src, roll, ["grp"], ["v"], **kw)
    assert _state(roll) == _oracle(src)


def test_sumsq_composes_with_minmax_rescan(spark, tmp_path):
    """A retraction that triggers the MIN/MAX rescan recomputes the
    second moment for the rescanned groups too (the rescan replaces
    ALL the group's aggregates)."""
    src = _mk(spark, tmp_path)
    src.append(
        _rows(spark, [(1, "a", "x", 3), (2, "a", "x", 5), (3, "a", "x", 9)])
    )
    kw = {"sumsq_cols": ["v"], "min_cols": ["v"]}
    roll = create_rollup(
        src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"],
        consume_from=1, **kw,
    )
    refresh_rollup(src, roll, ["grp"], ["v"], **kw)
    src.delete_keys(spark.createDataFrame([Row(id=1)]))  # retract the min
    refresh_rollup(src, roll, ["grp"], ["v"], **kw)
    got = {
        r.grp: (r.n_rows, r.sum_v, r.sumsq_v, r.min_v)
        for r in roll.read().collect()
    }
    assert got == {"a": (2, 14.0, 106.0, 5)}


def test_rollup_stats_and_reaggregate_routing(spark, tmp_path):
    """avg/var/std derived from the rollup — and from a COARSER
    reaggregate — match the direct computation over the source."""
    src = _mk(spark, tmp_path)
    src.append(
        _rows(
            spark,
            [
                (1, "a", "x", 2),
                (2, "a", "x", 4),
                (3, "a", "y", 6),
                (4, "b", "x", 10),
            ],
        )
    )
    kw = {"sumsq_cols": ["v"]}
    roll = create_rollup(
        src, os.path.join(str(tmp_path), "r"), ["grp", "sub"], ["v"],
        consume_from=1, **kw,
    )
    refresh_rollup(src, roll, ["grp", "sub"], ["v"], **kw)
    coarse = reaggregate_rollup(
        roll, ["grp"], sum_cols=["v"], sumsq_cols=["v"]
    )
    got = {
        r.grp: (r.avg_v, r.var_v, r.std_v)
        for r in rollup_stats(coarse, ["v"]).collect()
    }
    exp = {
        r.grp: (r.m, r.var, math.sqrt(r.var))
        for r in src.read()
        .groupBy("grp")
        .agg(
            F.avg("v").alias("m"),
            F.var_pop("v").alias("var"),
        )
        .collect()
    }
    for g in exp:
        for a, b in zip(got[g], exp[g]):
            assert abs(a - b) < 1e-9, (g, got[g], exp[g])
    # constant group: var clamps at exactly 0.0, std must not NaN
    single = rollup_stats(
        reaggregate_rollup(roll, ["grp", "sub"], sum_cols=["v"],
                           sumsq_cols=["v"]),
        ["v"],
    )
    row = {(r.grp, r.sub): r for r in single.collect()}[("b", "x")]
    assert row.var_v == 0.0 and row.std_v == 0.0


def test_declarative_job_rollup_with_sumsq(spark, tmp_path):
    """Config-declared sumsq_columns flow through ensure_target's
    create and the per-batch refresh."""
    from s3_sqs_data_ingestion_demo_spark import job as J
    from s3_sqs_data_ingestion_demo_spark.config import JobConfig

    d = str(tmp_path)
    cfg = JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {"header": "true", "sep": "\t",
                            "inferSchema": "true"},
            },
            "output_config": {
                "table_path": f"{d}/tbl",
                "mode": "merge",
                "table_type": "MOR",
                "key_columns": ["id"],
                "order_column": "seq",
                "rollups": [
                    {
                        "path": f"{d}/roll",
                        "group_columns": ["grp"],
                        "sum_columns": ["v"],
                        "sumsq_columns": ["v"],
                    }
                ],
            },
        }
    )
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("grp", T.StringType()),
                T.StructField("v", T.IntegerType()),
                T.StructField("seq", T.IntegerType()),
            ]
        ),
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    for i, rows in enumerate([[(1, "a", 3, 1), (2, "b", 4, 1)],
                              [(1, "a", 7, 2), (3, "a", 5, 2)]]):
        p = f"{d}/b{i}.csv"
        with open(p, "w") as fh:
            fh.write("id\tgrp\tv\tseq\n")
            for r in rows:
                fh.write("\t".join(str(x) for x in r) + "\n")
        J.process_files(spark, cfg, [p])
    roll = ManagedTable.load(spark, f"{d}/roll")
    got = {
        r.grp: (r.n_rows, r.sum_v, r.sumsq_v) for r in roll.read().collect()
    }
    assert got == {"a": (2, 12.0, 74.0), "b": (1, 4.0, 16.0)}
