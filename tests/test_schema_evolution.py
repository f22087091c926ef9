"""Schema evolution: additive columns (``add_columns``), lossless type
widening (``widen_column``), batch-driven reconciliation
(``evolve_schema``), and the ingest-time knob
(``output_config.schema_evolution``).

Design under test (table.py): evolution is METADATA-ONLY — no data
file is ever rewritten.  Old files null-fill added columns and
type-promote widened ones at scan time (the schema-explicit parquet
read, SPARK-40876 widening), which is how Iceberg serves evolution
from old manifests.  Lossy changes (long→int, string↔int,
double→float) are refused loudly: a silent cast would corrupt data.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable, can_widen

INT, LONG, FLT, DBL, STR = (
    T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType(),
    T.StringType(),
)


def _tbl(spark, path, fields, **kw):
    return ManagedTable.create(spark, path, T.StructType(fields), **kw)


# ---------------------------------------------------------- widening


def test_widen_int_to_long_serves_both_generations(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("id", INT, True),
        T.StructField("v", FLT, True),
    ])
    t.append(spark.createDataFrame([(1, 1.5), (2, 2.5)], t.meta.schema))
    t.widen_column("id", LONG)
    t.widen_column("v", DBL)
    big = 2**40  # does not fit in int32: proves the type really widened
    t.append(spark.createDataFrame(
        [(big, 9.5)],
        T.StructType([T.StructField("id", LONG), T.StructField("v", DBL)]),
    ))
    out = t.read()
    assert dict(out.dtypes) == {"id": "bigint", "v": "double"}
    assert sorted(r.id for r in out.collect()) == [1, 2, big]
    # persisted: a fresh load sees the widened contract
    assert dict(ManagedTable.load(spark, t.path).read().dtypes)["id"] == "bigint"


def test_widen_refuses_lossy_changes(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("a", LONG, True),
        T.StructField("s", STR, True),
        T.StructField("d", DBL, True),
    ])
    for col, bad in (("a", INT), ("s", INT), ("d", FLT), ("a", DBL)):
        with pytest.raises(ValueError, match="lossless"):
            t.widen_column(col, bad)
    with pytest.raises(ValueError, match="does not exist"):
        t.widen_column("nope", LONG)


def test_widen_same_type_is_noop(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [T.StructField("a", INT, True)])
    t.widen_column("a", INT)  # no error, no change
    assert t.meta.schema["a"].dataType == INT


def test_widen_refuses_bucket_transform_source(spark, tmp_path):
    t = _tbl(
        spark, f"{tmp_path}/t",
        [T.StructField("id", INT, True), T.StructField("x", STR, True)],
        partition_cols=["id_b"],
        partition_transforms={"id_b": "bucket(4, id)"},
    )
    # hash(int) != hash(long) in Spark — widening would scatter a key's
    # rows across bucket dirs and silently break partition pruning
    with pytest.raises(ValueError, match="bucket"):
        t.widen_column("id", LONG)


def test_widen_keeps_old_manifest_stats_usable(spark, tmp_path):
    """Pruned reads on a widened column still honor entries written
    before the widening (their min/max stats were harvested as the
    narrow type)."""
    t = _tbl(spark, f"{tmp_path}/t", [T.StructField("id", INT, True)])
    t.append(spark.createDataFrame([(i,) for i in range(10)], t.meta.schema))
    t.widen_column("id", LONG)
    t.append(spark.createDataFrame(
        [(x,) for x in (100, 2**40)],
        T.StructType([T.StructField("id", LONG)]),
    ))
    got = sorted(r.id for r in t.read_where("id", 5, 200).collect())
    assert got == [5, 6, 7, 8, 9, 100]


# ----------------------------------------------------- evolve_schema


def test_evolve_adds_and_widens_and_is_idempotent(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("id", INT, True),
        T.StructField("name", STR, True),
    ])
    incoming = T.StructType([
        T.StructField("id", LONG, True),      # widen
        T.StructField("name", STR, True),     # unchanged
        T.StructField("score", DBL, False),   # add (forced nullable)
    ])
    actions = t.evolve_schema(incoming)
    assert sorted(actions) == ["add score double", "evolve id: int -> bigint"]
    f = {x.name: x for x in t.meta.schema.fields}
    assert f["id"].dataType == LONG
    assert f["score"].dataType == DBL and f["score"].nullable
    assert t.evolve_schema(incoming) == []  # replayed batch: no-op


def test_evolve_narrower_batch_is_noop(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [T.StructField("id", LONG, True)])
    assert t.evolve_schema(
        T.StructType([T.StructField("id", INT, True)])
    ) == []  # align_to_schema upcasts the batch on write instead


def test_evolve_incompatible_type_raises(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [T.StructField("id", STR, True)])
    with pytest.raises(ValueError, match="neither side widens"):
        t.evolve_schema(T.StructType([T.StructField("id", INT, True)]))


def test_add_columns_rejects_hidden_partition_collision(spark, tmp_path):
    t = _tbl(
        spark, f"{tmp_path}/t",
        [T.StructField("id", INT, True)],
        partition_cols=["id_b"],
        partition_transforms={"id_b": "bucket(4, id)"},
    )
    with pytest.raises(ValueError, match="partition column"):
        t.add_columns([T.StructField("id_b", STR, True)])


def test_can_widen_matrix():
    assert can_widen(INT, LONG) and can_widen(FLT, DBL)
    assert can_widen(T.ShortType(), LONG)
    assert not can_widen(LONG, INT)
    assert not can_widen(INT, DBL)  # Iceberg's matrix: int→double lossy-ish, refused
    assert not can_widen(STR, LONG)


# -------------------------------------------------- job-level (ingest)


def _job_cfg(tmp, evolution=True, mode="merge"):
    return JobConfig.from_dict({
        "input_config": {"format": "parquet"},
        "output_config": {
            "table_path": f"{tmp}/tbl",
            "mode": mode,
            "key_columns": ["id"],
            "order_column": "seq",
            "schema_evolution": evolution,
        },
    })


def _land(spark, tmp, name, rows, schema):
    p = f"{tmp}/land/{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    import glob
    return sorted(glob.glob(f"{p}/part-*.parquet"))


BASE = T.StructType([
    T.StructField("id", INT, True),
    T.StructField("name", STR, True),
    T.StructField("seq", LONG, True),
])
EVOLVED = T.StructType([
    T.StructField("id", LONG, True),             # widened
    T.StructField("name", STR, True),
    T.StructField("seq", LONG, True),
    T.StructField("score", DBL, True),           # added
])


def test_job_evolution_add_and_widen_through_merge(spark, tmp_path):
    ManagedTable.create(spark, f"{tmp_path}/tbl", BASE,
                        key_cols=["id"], order_column="seq")
    cfg = _job_cfg(tmp_path)
    b1 = _land(spark, tmp_path, "b1",
               [(1, "a", 1), (2, "b", 1)], BASE)
    b2 = _land(spark, tmp_path, "b2",
               [(2, "b2", 2, 0.5), (2**40, "c", 2, 0.9)], EVOLVED)
    J.process_files(spark, cfg, b1)
    J.process_files(spark, cfg, b2)
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    out = {r.id: r for r in t.read().collect()}
    assert dict(t.read().dtypes) == {
        "id": "bigint", "name": "string", "seq": "bigint", "score": "double",
    }
    assert out[1].score is None and out[1].name == "a"   # pre-evolution row
    assert out[2].score == 0.5 and out[2].name == "b2"   # upserted
    assert out[2**40].score == 0.9                        # wide key inserted


def test_job_evolution_replay_is_idempotent(spark, tmp_path):
    ManagedTable.create(spark, f"{tmp_path}/tbl", BASE,
                        key_cols=["id"], order_column="seq")
    cfg = _job_cfg(tmp_path)
    b1 = _land(spark, tmp_path, "b1", [(1, "a", 1)], BASE)
    b2 = _land(spark, tmp_path, "b2", [(1, "a2", 2, 1.5)], EVOLVED)
    J.process_files(spark, cfg, b1)
    J.process_files(spark, cfg, b2)
    J.process_files(spark, cfg, b2)  # redelivered batch: evolves nothing
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0].name == "a2" and rows[0].score == 1.5


def test_job_without_evolution_drops_extra_columns(spark, tmp_path):
    """The default (reference semantics): the contract pins the shape
    and extra batch columns are dropped by the align step."""
    ManagedTable.create(spark, f"{tmp_path}/tbl", BASE,
                        key_cols=["id"], order_column="seq")
    cfg = _job_cfg(tmp_path, evolution=False)
    b2 = _land(spark, tmp_path, "b2", [(1, "a", 1, 0.5)], EVOLVED)
    J.process_files(spark, cfg, b2)
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    assert "score" not in t.read().columns
    assert dict(t.read().dtypes)["id"] == "int"


def test_job_evolution_refused_with_verbatim_merge_into(spark, tmp_path):
    sql = f"{tmp_path}/merge.sql"
    with open(sql, "w") as fh:
        fh.write("MERGE INTO tgt USING src ON tgt.id = src.id "
                 "WHEN MATCHED THEN UPDATE SET *")
    with pytest.raises(ValueError, match="schema_evolution"):
        JobConfig.from_dict({
            "input_config": {"format": "parquet"},
            "output_config": {
                "table_path": f"{tmp_path}/tbl",
                "mode": "merge",
                "merge_query": sql,
                "schema_evolution": True,
            },
        })


def test_job_evolution_excludes_operational_columns(spark, tmp_path):
    """CDC op markers and lineage columns are consumed by the harness,
    not batch data — evolution must not add them to the contract."""
    ManagedTable.create(spark, f"{tmp_path}/tbl", BASE,
                        key_cols=["id"], order_column="seq")
    cfg = JobConfig.from_dict({
        "input_config": {"format": "parquet"},
        "output_config": {
            "table_path": f"{tmp_path}/tbl",
            "mode": "merge",
            "key_columns": ["id"],
            "order_column": "seq",
            "schema_evolution": True,
            "cdc_delete_values": ["D"],
        },
    })
    with_op = T.StructType(list(EVOLVED.fields) + [
        T.StructField("Op", STR, True),
    ])
    files = _land(spark, tmp_path, "b1",
                  [(1, "a", 1, 0.5, "I"), (2, "b", 1, 0.7, "D")], with_op)
    J.process_files(spark, cfg, files, lineage=True)
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    cols = set(t.read().columns)
    assert "Op" not in cols and "_ingest_file" not in cols
    assert "score" in cols  # genuine new column still evolved in
    rows = t.read().collect()  # the 'D' row deleted, not upserted
    assert [r.id for r in rows] == [1]


def test_audit_rejected_batch_rolls_back_evolution(spark, tmp_path):
    """A rejected batch must leave NOTHING behind — including its
    schema evolution: a typo'd junk column from a bad batch must not
    live in the contract forever."""
    ManagedTable.create(spark, f"{tmp_path}/tbl", BASE,
                        key_cols=["id"], order_column="seq")
    cfg = JobConfig.from_dict({
        "input_config": {"format": "parquet"},
        "output_config": {
            "table_path": f"{tmp_path}/tbl",
            "mode": "append",
            "schema_evolution": True,
            "audit": {
                "rules": [{"rule": "not_null", "column": "name"}],
                "on_fail": "skip_batch",
            },
        },
    })
    bad_schema = T.StructType(list(BASE.fields) + [
        T.StructField("n_charss", DBL, True),  # the typo'd column
    ])
    bad = _land(spark, tmp_path, "bad",
                [(1, None, 1, 0.5)], bad_schema)
    J.process_files(spark, cfg, bad)
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    assert "n_charss" not in t.meta.schema.fieldNames()
    assert t.read().count() == 0
    # an ACCEPTED batch's evolution sticks
    good = _land(spark, tmp_path, "good",
                 [(2, "ok", 1, 0.9)],
                 T.StructType(list(BASE.fields) + [
                     T.StructField("score", DBL, True)]))
    J.process_files(spark, cfg, good)
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    assert "score" in t.meta.schema.fieldNames()
    assert t.read().collect()[0].score == 0.9


def test_widen_decimal_precision(spark, tmp_path):
    from decimal import Decimal

    t = _tbl(spark, f"{tmp_path}/t",
             [T.StructField("amt", T.DecimalType(10, 2), True)])
    t.append(spark.createDataFrame([(Decimal("12345678.99"),)],
                                   t.meta.schema))
    t.widen_column("amt", T.DecimalType(20, 2))
    big = Decimal("123456789012345678.50")
    t.append(spark.createDataFrame(
        [(big,)],
        T.StructType([T.StructField("amt", T.DecimalType(20, 2))]),
    ))
    out = t.read()
    assert dict(out.dtypes)["amt"] == "decimal(20,2)"
    assert sorted(r.amt for r in out.collect()) == [
        Decimal("12345678.99"), big,
    ]
    # scale changes alter the rendered value: refused
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("amt", T.DecimalType(30, 4))


STRUCT_V1 = T.StructType([T.StructField("a", INT, True)])
STRUCT_V2 = T.StructType([
    T.StructField("a", LONG, True),       # nested widen
    T.StructField("b", STR, True),        # nested add
])


def test_evolve_struct_adds_fields_and_widens_nested(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("id", LONG, True),
        T.StructField("meta", STRUCT_V1, True),
    ])
    t.append(spark.createDataFrame(
        [(1, (7,)), (2, None)], t.meta.schema  # incl. a NULL struct row
    ))
    actions = t.evolve_schema(T.StructType([
        T.StructField("id", LONG, True),
        T.StructField("meta", STRUCT_V2, True),
    ]))
    assert actions == [
        "evolve meta: struct<a:int> -> struct<a:bigint,b:string>"
    ]
    # new-shape batch lands; OLD-shape batch still writes (struct
    # rebuild in align_to_schema) — and the null struct row stays null
    t.append(spark.createDataFrame(
        [(3, (2**40, "x"))],
        T.StructType([T.StructField("id", LONG),
                      T.StructField("meta", STRUCT_V2)]),
    ))
    t.append(spark.createDataFrame(
        [(4, (5,)), (5, None)],
        T.StructType([T.StructField("id", LONG),
                      T.StructField("meta", STRUCT_V1)]),
    ))
    rows = {r.id: r.meta for r in t.read().collect()}
    assert rows[1] == (7, None)          # old file: nested null-fill + widen
    assert rows[2] is None               # null struct stays null (read)
    assert rows[3] == (2**40, "x")
    assert rows[4] == (5, None)          # old-shape write after evolution
    assert rows[5] is None               # null struct stays null (write)


def test_evolve_array_of_struct(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("id", LONG, True),
        T.StructField("spans", T.ArrayType(STRUCT_V1), True),
    ])
    t.append(spark.createDataFrame([(1, [(3,), (4,)])], t.meta.schema))
    t.evolve_schema(T.StructType([
        T.StructField("id", LONG, True),
        T.StructField("spans", T.ArrayType(STRUCT_V2), True),
    ]))
    t.append(spark.createDataFrame(
        [(2, [(9, "y")])],
        T.StructType([T.StructField("id", LONG),
                      T.StructField("spans", T.ArrayType(STRUCT_V2))]),
    ))
    rows = {r.id: r.spans for r in t.read().collect()}
    assert rows[1] == [(3, None), (4, None)]
    assert rows[2] == [(9, "y")]


def test_evolve_struct_incompatible_nested_raises(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("meta", STRUCT_V1, True),
        T.StructField("id", LONG, True),
    ])
    with pytest.raises(ValueError, match="meta"):
        t.evolve_schema(T.StructType([
            T.StructField(
                "meta",
                T.StructType([T.StructField("a", STR, True)]),  # int vs str
                True,
            ),
        ]))


def test_drop_column_metadata_only(spark, tmp_path):
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("id", LONG, True),
        T.StructField("junk", STR, True),
        T.StructField("v", DBL, True),
    ])
    t.append(spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0)],
                                   t.meta.schema))
    t.drop_column("junk")
    out = t.read()
    assert out.columns == ["id", "v"] and out.count() == 2
    # history serves the CURRENT schema too (Delta behavior)
    assert "junk" not in ManagedTable.load(spark, t.path).read().columns
    # the name can never come back: old files would resurrect values
    with pytest.raises(ValueError, match="previously dropped"):
        t.add_columns([T.StructField("junk", STR, True)])
    # writes after the drop land without the column
    t.append(spark.createDataFrame([(3, 3.0)], t.meta.schema))
    assert t.read().count() == 3


def test_drop_column_refuses_load_bearing(spark, tmp_path):
    t = ManagedTable.create(
        spark, f"{tmp_path}/t",
        T.StructType([
            T.StructField("id", LONG, True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("seq", LONG, True),
            T.StructField("v", DBL, True),
        ]),
        key_cols=["id"], order_column="seq",
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("id")
    with pytest.raises(ValueError, match="order column"):
        t.drop_column("seq")
    with pytest.raises(ValueError, match="partition transform"):
        t.drop_column("ts")
    with pytest.raises(ValueError, match="does not exist"):
        t.drop_column("nope")


def test_evolve_schema_property_roundtrip(spark, tmp_path):
    """Property: for any evolution-compatible schema pair, writing a
    batch of each shape and reading back serves every row under the
    reconciled contract with null-fill/upcast semantics."""
    from hypothesis import given, settings, strategies as st

    types = [INT, LONG, FLT, DBL, STR]

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(types), st.sampled_from(types)),
            min_size=1, max_size=4,
        ),
        st.integers(min_value=0, max_value=2**30),
    )
    def prop(pairs, seed):
        from s3_sqs_data_ingestion_demo_spark.table import can_widen

        base_fields = [
            T.StructField(f"c{i}", a, True) for i, (a, _) in enumerate(pairs)
        ]
        inc_fields = [
            T.StructField(f"c{i}", b, True) for i, (_, b) in enumerate(pairs)
        ]
        compatible = all(
            a == b or can_widen(a, b) or can_widen(b, a)
            for a, b in pairs
        )
        path = f"{tmp_path}/p{seed}_{abs(hash(tuple(str(p) for p in pairs))) % 10**8}"
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        t = ManagedTable.create(spark, path, T.StructType(base_fields))

        def _row(fields):
            out = []
            for f in fields:
                out.append("s" if f.dataType == STR else (
                    1.5 if f.dataType in (FLT, DBL) else 7))
            return tuple(out)

        t.append(spark.createDataFrame([_row(base_fields)],
                                       T.StructType(base_fields)))
        incoming = T.StructType(inc_fields)
        if not compatible:
            with pytest.raises(ValueError):
                t.evolve_schema(incoming)
            return
        t.evolve_schema(incoming)
        t.append(spark.createDataFrame([_row(inc_fields)], incoming))
        out = t.read()
        assert out.count() == 2
        # reconciled type is the wider of each pair
        got = dict(out.dtypes)
        for i, (a, b) in enumerate(pairs):
            want = b if can_widen(a, b) else a
            assert got[f"c{i}"] == want.simpleString()

    prop()


def test_drop_column_refuses_property_references(spark, tmp_path):
    t = _tbl(
        spark, f"{tmp_path}/t",
        [T.StructField("id", LONG, True), T.StructField("v", DBL, True)],
    )
    t.set_properties(**{"write.sort-columns": "v"})
    with pytest.raises(ValueError, match="write.sort-columns"):
        t.drop_column("v")
    t.set_properties(**{"write.sort-columns": ""})
    t.drop_column("v")
    t.append(spark.createDataFrame([(1,)], t.meta.schema))  # writes still work
    assert t.read().columns == ["id"]


def test_evolve_ignores_dropped_names_for_replay(spark, tmp_path):
    """A replayed pre-drop batch (or a lagging producer) still carries
    the dropped column — evolution must not resurrect or fail on it."""
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("id", LONG, True),
        T.StructField("junk", STR, True),
    ])
    t.drop_column("junk")
    actions = t.evolve_schema(T.StructType([
        T.StructField("id", LONG, True),
        T.StructField("junk", STR, True),
    ]))
    assert actions == []
    assert "junk" not in t.meta.schema.fieldNames()


def test_merged_struct_fields_all_nullable(spark, tmp_path):
    """Fields missing from EITHER side of a struct merge become
    nullable: the absent side null-fills them."""
    from s3_sqs_data_ingestion_demo_spark.table import merge_types

    cur = T.StructType([T.StructField("a", INT, False)])
    inc = T.StructType([T.StructField("b", STR, False)])
    merged = merge_types(cur, inc)
    assert all(f.nullable for f in merged.fields)
    assert [f.name for f in merged.fields] == ["a", "b"]


def test_align_rejects_extra_nested_subfields(spark, tmp_path):
    """Without schema_evolution, a batch struct carrying UNKNOWN
    subfields fails loudly (the struct cast it replaced also failed) —
    silent nested data loss would hide the need for evolution."""
    t = _tbl(spark, f"{tmp_path}/t", [
        T.StructField("id", LONG, True),
        T.StructField("meta", STRUCT_V1, True),
    ])
    batch = spark.createDataFrame(
        [(1, (1, "drift"))],
        T.StructType([
            T.StructField("id", LONG),
            T.StructField("meta", T.StructType([
                T.StructField("a", INT), T.StructField("z", STR),
            ])),
        ]),
    )
    with pytest.raises(Exception, match="subfields.*not in the"):
        t.append(batch)


def test_compact_clustering_beats_declared_sort(spark, tmp_path):
    """compact(cluster_by=...) must keep its clustering: the declared
    write-sort would otherwise re-sort within tasks and scatter the
    clustered column across every split file."""
    t = ManagedTable.create(
        spark, f"{tmp_path}/t",
        T.StructType([T.StructField("id", LONG, True),
                      T.StructField("grp", LONG, True)]),
        properties={"write.sort-columns": "id"},
    )
    import pyspark.sql.functions as SF
    t.append(spark.range(400).select(
        SF.col("id"), (SF.col("id") % 7).alias("grp")
    ))
    t.compact(cluster_by=["grp"], target_partitions=4)
    import glob as g, os
    entry = t._read_manifest()[-1]
    root = os.path.join(t.path, entry["root"])
    files = g.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    # clustering held: every file covers a narrow grp range
    for f in files:
        vals = [r.grp for r in spark.read.parquet(f).select("grp").collect()]
        assert vals == sorted(vals), "file not sorted on the cluster key"


def test_job_evolution_composes_with_declared_indexes(spark, tmp_path):
    """Schema evolution and declarative index maintenance in ONE job:
    a batch that grows the schema still folds into the bm25 index, the
    index tracks the table's text across the update, and the evolved
    column lands."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        bm25_index_topk,
    )

    DOCS = T.StructType([
        T.StructField("doc_id", LONG, True),
        T.StructField("text", STR, True),
        T.StructField("seq", LONG, True),
    ])
    ManagedTable.create(spark, f"{tmp_path}/tbl", DOCS,
                        key_cols=["doc_id"], order_column="seq",
                        table_type="MOR")
    cfg = JobConfig.from_dict({
        "input_config": {"format": "parquet"},
        "output_config": {
            "table_path": f"{tmp_path}/tbl",
            "mode": "merge",
            "key_columns": ["doc_id"],
            "order_column": "seq",
            "schema_evolution": True,
            "indexes": [{"type": "bm25", "path": f"{tmp_path}/bm25"}],
        },
    })
    b1 = _land(spark, tmp_path, "b1",
               [(1, "spark shuffles data", 1), (2, "parquet files", 1)],
               DOCS)
    with_lang = T.StructType(list(DOCS.fields) + [
        T.StructField("lang", STR, True),
    ])
    b2 = _land(spark, tmp_path, "b2",
               [(2, "arrow batches stream", 2, "en")], with_lang)
    J.process_files(spark, cfg, b1)
    J.process_files(spark, cfg, b2)
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    rows = {r.doc_id: r for r in t.read().collect()}
    assert rows[2].lang == "en" and rows[1].lang is None
    # the index followed the update: old terms of doc 2 un-indexed,
    # new terms searchable
    hits = bm25_index_topk(spark, f"{tmp_path}/bm25", ("arrow",), k=5)
    assert [r.doc_id for r in hits.collect()] == [2]
    stale = bm25_index_topk(spark, f"{tmp_path}/bm25", ("parquet",), k=5)
    assert stale.count() == 0


def test_cdf_spans_an_evolution(spark, tmp_path):
    """The change feed stays coherent across an add-column boundary:
    pre-evolution images serve the CURRENT schema (null-filled), so a
    post-evolution upsert diffs cleanly against a pre-evolution base."""
    t = _tbl(
        spark, f"{tmp_path}/t",
        [T.StructField("id", INT, True), T.StructField("v", STR, True)],
        key_cols=["id"],
    )
    v_base = t.append(spark.createDataFrame([(1, "a"), (2, "b")], t.meta.schema))
    t.evolve_schema(T.StructType(
        list(t.meta.schema.fields) + [T.StructField("score", DBL, True)]
    ))
    v_after = t.merge(spark.createDataFrame(
        [(1, "a2", 7.0)],
        T.StructType([
            T.StructField("id", INT), T.StructField("v", STR),
            T.StructField("score", DBL),
        ]),
    ))
    ch = {
        r["_change_type"]: r
        for r in t.read_changes_cdf(v_base, v_after).collect()
    }
    assert set(ch) == {"update_preimage", "update_postimage"}
    assert ch["update_preimage"].score is None
    assert ch["update_postimage"].score == 7.0


def test_audit_on_fail_fail_also_rolls_back_evolution(spark, tmp_path):
    """on_fail='fail' re-raises from inside the audited write — the
    rollback must still run (it used to be skipped on this policy,
    leaving the rejected batch's junk column in the contract)."""
    from s3_sqs_data_ingestion_demo_spark.table import AuditFailedError

    ManagedTable.create(spark, f"{tmp_path}/tbl", BASE,
                        key_cols=["id"], order_column="seq")
    cfg = JobConfig.from_dict({
        "input_config": {"format": "parquet"},
        "output_config": {
            "table_path": f"{tmp_path}/tbl",
            "mode": "append",
            "schema_evolution": True,
            "audit": {
                "rules": [{"rule": "not_null", "column": "name"}],
                "on_fail": "fail",
            },
        },
    })
    bad_schema = T.StructType(list(BASE.fields) + [
        T.StructField("n_charss", DBL, True),
    ])
    bad = _land(spark, tmp_path, "bad", [(1, None, 1, 0.5)], bad_schema)
    with pytest.raises(AuditFailedError):
        J.process_files(spark, cfg, bad)
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    assert "n_charss" not in t.meta.schema.fieldNames()
    assert t.read().count() == 0
    assert t.list_staged() == []


def test_quarantine_schema_follows_target_evolution(spark, tmp_path):
    """The quarantine contract is pinned at its first creation; a later
    rejected batch whose evolution added a column must land WITH that
    column (it used to be silently dropped by align-to-stale-schema)."""
    ManagedTable.create(spark, f"{tmp_path}/tbl", BASE,
                        key_cols=["id"], order_column="seq")
    cfg = JobConfig.from_dict({
        "input_config": {"format": "parquet"},
        "output_config": {
            "table_path": f"{tmp_path}/tbl",
            "mode": "append",
            "schema_evolution": True,
            "audit": {
                "rules": [{"rule": "not_null", "column": "name"}],
                "on_fail": "quarantine",
                "quarantine_path": f"{tmp_path}/quarantine",
            },
        },
    })
    # batch 1: base-shaped reject — creates the quarantine table
    b1 = _land(spark, tmp_path, "b1", [(1, None, 1)], BASE)
    J.process_files(spark, cfg, b1)
    # batch 2: reject carrying a NEW column the quarantine never saw
    wide = T.StructType(list(BASE.fields) + [
        T.StructField("score", DBL, True),
    ])
    b2 = _land(spark, tmp_path, "b2", [(2, None, 2, 0.7)], wide)
    J.process_files(spark, cfg, b2)
    q = ManagedTable.load(spark, f"{tmp_path}/quarantine").read()
    rows = {r.id: r for r in q.collect()}
    assert sorted(rows) == [1, 2]
    assert rows[2]["score"] == 0.7      # evolved column preserved
    assert rows[1]["score"] is None     # old row null-fills
    # the rejected batches rolled their evolution back off the TARGET
    t = ManagedTable.load(spark, f"{tmp_path}/tbl")
    assert "score" not in t.meta.schema.fieldNames()
