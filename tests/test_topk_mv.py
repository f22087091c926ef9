"""Incremental top-k-per-group materialization (operators/topk_mv.py).

The invariant every test pins: the maintained MV == the top-k of a
full re-rank of the source's FINAL state under the same strict total
order (order_col desc/asc nulls-last, id ascending tie-break) — across
insert-only folds, retraction rescans (updates, deletes, group moves),
emptied groups, null group keys, and crash replay."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.topk_mv import (
    _STATE_KEY,
    create_topk_mv,
    read_topk,
    refresh_topk_mv,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("note", T.StringType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _mk_src(spark, tmp):
    return ManagedTable.create(
        spark,
        f"{tmp}/src",
        SCHEMA,
        key_cols=["id"],
        order_column="seq",
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v, note=n, seq=s) for i, g, v, n, s in rows],
        SCHEMA,
    )


def _mv(dst):
    return sorted(
        ((r.grp, r.id, r.v, r.note) for r in dst.read().collect()),
        key=repr,
    )


def _oracle(src, k=3):
    """Full re-rank of the final state — the semantics contract."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(
        F.col("v").desc_nulls_last(), F.col("id").asc_nulls_last()
    )
    return sorted(
        (
            (r.grp, r.id, r.v, r.note)
            for r in src.read()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .collect()
        ),
        key=repr,
    )


def _kw():
    return dict(
        group_cols=["grp"], order_col="v", k=3, id_cols=["id"],
        payload_cols=["note"],
    )


def test_insert_only_fold_never_reads_base(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(_rows(spark, [(i, "a", i * 3 % 50, f"n{i}", 1) for i in range(20)]))
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)
    # second insert batch: new winners displace old ones (push-out delete)
    src.append(_rows(spark, [(i, "a", 100 + i, f"n{i}", 1) for i in range(20, 24)]))
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)
    assert dst.read().count() == 3  # exactly k survived


def test_update_and_delete_rescan(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(
        _rows(spark, [(i, "a" if i % 2 else "b", i, f"n{i}", 1) for i in range(20)])
    )
    refresh_topk_mv(src, dst, **_kw())
    # demote the current best of a (id=19, v=19 -> v=0), move one key
    # from b into a, and delete b's best — all retractions
    src.merge(
        _rows(spark, [(19, "a", 0, "demoted", 2), (16, "a", 99, "moved", 2)])
    )
    src.delete_keys(spark.createDataFrame([(18,)], "id int"))
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)


def test_group_emptied_by_deletes(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(_rows(spark, [(1, "a", 5, "x", 1), (2, "b", 7, "y", 1)]))
    refresh_topk_mv(src, dst, **_kw())
    src.delete_keys(spark.createDataFrame([(2,)], "id int"))
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == [("a", 1, 5, "x")]


def test_null_group_and_null_order_values(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(
        _rows(
            spark,
            [
                (1, None, 9, "a", 1),
                (2, None, 4, "b", 1),
                (3, None, None, "null-v ranks last", 1),
                (4, None, 7, "c", 1),
                (5, None, 8, "d", 1),
                (6, "g", 1, "e", 1),
            ],
        )
    )
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)
    # retraction inside the null group takes the rescan path
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)
    got = {
        (r.grp, r.rnk): r.id
        for r in read_topk(dst, ["grp"], "v").collect()
    }
    assert got[(None, 1)] == 5 and got[(None, 2)] == 4


def test_ascending_order(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    kw = dict(_kw(), descending=False, k=2)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **kw)
    src.append(_rows(spark, [(i, "a", 10 - i, f"n{i}", 1) for i in range(6)]))
    refresh_topk_mv(src, dst, **kw)
    assert [r.id for r in read_topk(
        dst, ["grp"], "v", descending=False
    ).orderBy("rnk").collect()] == [5, 4]


def test_crash_between_merge_and_sweep_replays_exact(
    spark, tmp_path, monkeypatch
):
    """Kill the refresh after the tagged merge, before the stale sweep
    and cursor write; the retry must recover the window, skip the
    merge, finish the sweep — bit-exact vs the full re-rank."""
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(_rows(spark, [(i, "a", i, f"n{i}", 1) for i in range(10)]))
    refresh_topk_mv(src, dst, **_kw())
    src.append(_rows(spark, [(i, "a", 50 + i, f"n{i}", 1) for i in range(10, 13)]))

    orig = ManagedTable.delete_keys
    armed = {"on": True}

    def crashing(self, keys_df, tag=None):
        if armed["on"] and self.path.endswith("/mv"):
            armed["on"] = False
            raise RuntimeError("simulated crash before stale sweep")
        return orig(self, keys_df, tag=tag)

    monkeypatch.setattr(ManagedTable, "delete_keys", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_topk_mv(src, dst, **_kw())
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)
    assert dst.read().count() == 3


def test_crash_then_new_commit_before_retry_recovers_window(
    spark, tmp_path, monkeypatch
):
    """Crash between merge and cursor write, then the source gains a
    commit before the retry: the retry must replay the RECOVERED
    window first (tag pins its high bound), then fold the remainder —
    not re-merge the absorbed delta under a different tag."""
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(_rows(spark, [(i, "a", i, f"n{i}", 1) for i in range(8)]))
    refresh_topk_mv(src, dst, **_kw())
    src.append(_rows(spark, [(20, "a", 90, "crash-window", 1)]))

    orig = ManagedTable.set_properties
    armed = {"on": True}

    def crashing(self, **kv):
        if armed["on"] and _STATE_KEY in kv:
            armed["on"] = False
            raise RuntimeError("simulated crash before cursor write")
        return orig(self, **kv)

    monkeypatch.setattr(ManagedTable, "set_properties", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_topk_mv(src, dst, **_kw())
    # a new commit lands before the retry
    src.append(_rows(spark, [(21, "a", 95, "post-crash", 1)]))
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)


def test_multi_column_groups_and_validation(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    kw = dict(
        group_cols=["grp", "seq"], order_col="v", k=1, id_cols=["id"],
    )
    dst = create_topk_mv(src, f"{tmp_path}/mv", **kw)
    src.append(
        _rows(spark, [(i, "a" if i % 2 else "b", i * 7 % 40, "x", i % 2)
                      for i in range(16)])
    )
    src.merge(_rows(spark, [(3, "a", 99, "upd", 1)]))
    refresh_topk_mv(src, dst, **kw)
    from pyspark.sql import Window

    w = Window.partitionBy("grp", "seq").orderBy(
        F.col("v").desc_nulls_last(), F.col("id").asc_nulls_last()
    )
    want = sorted(
        (r.grp, r.seq, r.id, r.v)
        for r in src.read().withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1").collect()
    )
    got = sorted((r.grp, r.seq, r.id, r.v) for r in dst.read().collect())
    assert got == want
    with pytest.raises(ValueError, match="k must be"):
        create_topk_mv(src, f"{tmp_path}/bad", ["grp"], "v", 0, ["id"])
    with pytest.raises(ValueError, match="id_cols"):
        create_topk_mv(src, f"{tmp_path}/bad2", ["grp"], "v", 2, [])
    with pytest.raises(ValueError, match="duplicate group"):
        create_topk_mv(src, f"{tmp_path}/bad3", ["grp"], "v", 2, ["grp"])


def test_random_op_sequence_matches_full_rerank(spark, tmp_path):
    """Deterministic mixed sequence: appends, in-group updates, group
    moves, deletes, interleaved refreshes — MV == full re-rank after
    every refresh."""
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(
        _rows(spark, [(i, ["a", "b", "c"][i % 3], (i * 13) % 60, f"n{i}", 1)
                      for i in range(30)])
    )
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)
    steps = [
        ("merge", [(5, "b", 77, "mv1", 2), (9, "a", 1, "demote", 2)]),
        ("delete", [2, 7, 11]),
        ("append", [(i, "c", (i * 7) % 90, f"n{i}", 1) for i in range(40, 46)]),
        ("merge", [(40, "a", 88, "mv2", 2), (41, "a", 89, "mv3", 2)]),
        ("delete", [40, 13]),
    ]
    for op, payload in steps:
        if op == "append":
            src.append(_rows(spark, payload))
        elif op == "merge":
            src.merge(_rows(spark, payload))
        else:
            src.delete_keys(
                spark.createDataFrame([(i,) for i in payload], "id int")
            )
        refresh_topk_mv(src, dst, **_kw())
        assert _mv(dst) == _oracle(src), f"diverged after {op}"


def test_contract_drift_refused(spark, tmp_path):
    """k / order / direction / group-id split are the MV's identity:
    a refresh under a different contract raises instead of silently
    corrupting the maintained set."""
    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(_rows(spark, [(1, "a", 5, "x", 1)]))
    refresh_topk_mv(src, dst, **_kw())
    for bad in (
        dict(_kw(), k=5),
        dict(_kw(), descending=False),
        dict(_kw(), order_col="seq"),
    ):
        with pytest.raises(ValueError, match="contract drift"):
            # needs an unconsumed window for the refresh to reach the
            # check... the check runs before the cursor comparison
            refresh_topk_mv(src, dst, **bad)


def test_reaggregate_rejects_id_subset(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.operators.topk_mv import (
        reaggregate_topk,
    )

    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(_rows(spark, [(1, "a", 5, "x", 1)]))
    refresh_topk_mv(src, dst, **_kw())
    with pytest.raises(ValueError, match="not MV group columns"):
        reaggregate_topk(dst, ["id"], "v", k=1)
    with pytest.raises(ValueError, match="cannot answer top-"):
        reaggregate_topk(dst, ["grp"], "v", k=99)


def test_missing_contract_properties_refused(spark, tmp_path):
    """ADVICE r9: an MV whose contract properties are absent (not
    created by create_topk_mv, or properties lost) must be refused —
    skipping the comparison would accept ANY contract, the corruption
    class the check exists to prevent."""
    src = _mk_src(spark, tmp_path)
    # a plain table shaped like an MV, but with no persisted contract
    fake = ManagedTable.create(
        spark, f"{tmp_path}/fake", SCHEMA, key_cols=["grp", "id"],
        order_column="v", table_type="MOR",
    )
    src.append(_rows(spark, [(1, "a", 1, "n", 1)]))
    with pytest.raises(ValueError, match="contract missing"):
        refresh_topk_mv(src, fake, **_kw())


def test_rebuild_restamps_contract(spark, tmp_path):
    """ADVICE r10: a rebuild overwrites the MV's entire content, so it
    is the documented remedy for BOTH a deliberate contract change and
    lost contract properties — it re-ranks under the declared contract
    and re-stamps the properties, rather than refusing like refresh.
    Only table STRUCTURE (the (group, id) key, the schema) is
    immutable."""
    from s3_sqs_data_ingestion_demo_spark.operators.topk_mv import (
        rebuild_topk_mv,
    )

    src = _mk_src(spark, tmp_path)
    dst = create_topk_mv(src, f"{tmp_path}/mv", **_kw())
    src.append(_rows(spark, [(i, "a", i, f"n{i}", 1) for i in range(6)]))
    refresh_topk_mv(src, dst, **_kw())
    assert _mv(dst) == _oracle(src)

    # deliberate contract change: k 3 -> 2, ascending — rebuild under
    # the new contract succeeds and re-stamps it
    new = dict(_kw(), k=2, descending=False)
    rebuild_topk_mv(src, dst, **new)
    assert dst.meta.properties["topk.k"] == "2"
    assert dst.meta.properties["topk.descending"] == "false"
    got = {(r.grp, r.id) for r in dst.read().collect()}
    assert got == {("a", 0), ("a", 1)}  # bottom-2 ascending

    # subsequent REFRESH under the re-stamped contract works; the old
    # contract now drifts
    src.append(_rows(spark, [(10, "a", -5, "low", 1)]))
    refresh_topk_mv(src, dst, **new)
    got = {(r.grp, r.id) for r in dst.read().collect()}
    assert got == {("a", 10), ("a", 0)}
    with pytest.raises(ValueError, match="contract drift"):
        src.append(_rows(spark, [(11, "a", 99, "hi", 1)]))
        refresh_topk_mv(src, dst, **_kw())

    # lost-properties remedy: a bare table shaped like an MV rebuilds
    # (refresh refuses it — test_missing_contract_properties_refused)
    fake = ManagedTable.create(
        spark, f"{tmp_path}/fake", SCHEMA, key_cols=["grp", "id"],
        order_column="v", table_type="MOR",
    )
    rebuild_topk_mv(src, fake, **_kw())
    assert fake.meta.properties["topk.k"] == "3"
    assert _mv(fake) == _oracle(src)
    # structure stays immutable: a rebuild declaring a different key
    # split refuses
    with pytest.raises(ValueError, match="keyed by"):
        rebuild_topk_mv(src, fake, group_cols=["note"], order_col="v",
                        k=3, id_cols=["id"])
    with pytest.raises(ValueError, match="schema lacks"):
        rebuild_topk_mv(src, fake, group_cols=["grp"], order_col="seq",
                        k=3, id_cols=["id"], payload_cols=["missing"])
