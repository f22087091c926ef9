"""Post-commit concurrency in the batch path (r12 optimization):
derived families refresh from a thread pool, and index folds overlap
the family block.  These tests pin the contracts the overlap relies
on: errors surface only after every unit settles (so completed units
are left in their idempotent post-fold state for the redelivery that
follows), and the shared ChangeWindowCache derives + pins its window
frame exactly once however many threads race for it."""

import threading

import pytest
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.operators import rollup as R
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("Op", T.StringType()),
    ]
)


def _write_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("id\tgrp\tv\tseq\tOp\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def _cfg(tmp, **out_extra):
    out = {
        "table_path": f"{tmp}/tbl",
        "mode": "merge",
        "table_type": "MOR",
        "key_columns": ["id"],
        "order_column": "seq",
        "rollups": [
            {
                "path": f"{tmp}/roll",
                "group_columns": ["grp"],
                "sum_columns": ["v"],
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
    }
    out.update(out_extra)
    return JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {
                    "header": "true",
                    "sep": "\t",
                    "inferSchema": "true",
                },
            },
            "output_config": out,
        }
    )


def _mk_table(spark, tmp):
    return ManagedTable.create(
        spark, f"{tmp}/tbl", SCHEMA,
        key_cols=["id"], order_column="seq", table_type="MOR",
    )


def _roll(spark, tmp):
    t = ManagedTable.load(spark, f"{tmp}/roll")
    return {r.grp: (r.n_rows, r.sum_v) for r in t.read().collect()}


def test_family_failure_surfaces_after_all_settle(
    spark, tmp_path, monkeypatch
):
    """With >=2 declared families the refreshes run in a thread pool
    (job._maintain_derived): one failing family must not strand the
    others mid-flight — the error surfaces AFTER every family settles,
    the surviving family's refresh has committed, and the batch
    redelivery that follows heals the failed family without
    double-counting the one that succeeded (version-cursor no-op)."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d)
    b1 = f"{d}/b1.csv"
    _write_csv(b1, [(1, "a", 10, 1, "I"), (2, "b", 5, 1, "I")])

    orig = J._maintain_topk_mvs
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("synthetic top-k failure")

    monkeypatch.setattr(J, "_maintain_topk_mvs", boom)
    with pytest.raises(RuntimeError, match="synthetic top-k failure"):
        J.process_files(spark, cfg, [b1])
    assert calls["n"] == 1
    # the rollup family settled (and committed) despite the failure
    assert _roll(spark, d) == {"a": (1, 10.0), "b": (1, 5.0)}
    # redelivery heals: the top-k bootstraps, the rollup's re-fold is
    # a feed no-op (identical rows net to zero / cursor already there)
    monkeypatch.setattr(J, "_maintain_topk_mvs", orig)
    J.process_files(spark, cfg, [b1])
    assert _roll(spark, d) == {"a": (1, 10.0), "b": (1, 5.0)}
    tk = ManagedTable.load(spark, f"{d}/topk")
    got = {(r.grp, r.id) for r in tk.read().collect()}
    assert got == {("a", 1), ("b", 2)}


def test_index_failure_leaves_families_settled(
    spark, tmp_path, monkeypatch
):
    """Index folds overlap the family block in the batch path: an
    index-fold failure surfaces after the families settle, leaving the
    family state committed for the idempotent redelivery."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(
        d,
        indexes=[{
            "type": "bm25",
            "path": f"{d}/ix",
            "id_column": "id",
            "text_column": "grp",
        }],
    )
    b1 = f"{d}/b1.csv"
    _write_csv(b1, [(1, "a", 10, 1, "I"), (2, "b", 5, 1, "I")])

    def boom(*a, **k):
        raise RuntimeError("synthetic index failure")

    monkeypatch.setattr(J, "_maintain_indexes", boom)
    with pytest.raises(RuntimeError, match="synthetic index failure"):
        J.process_files(spark, cfg, [b1])
    # families settled and committed despite the index failure
    assert _roll(spark, d) == {"a": (1, 10.0), "b": (1, 5.0)}


def test_window_cache_pins_once_under_concurrent_callers(spark, tmp_path):
    """ChangeWindowCache population is lock-serialized: N threads
    racing for the same (src, lo, hi) window derive + pin the weighted
    frame exactly once and all read the same pinned rows."""
    d = str(tmp_path)
    src = ManagedTable.create(
        spark, f"{d}/src",
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("v", T.LongType()),
        ]),
        key_cols=["id"], table_type="MOR",
    )
    src.append(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"))
    src.merge(spark.createDataFrame([(2, 25), (3, 30)], "id long, v long"))
    lo, hi = 1, src._current_version()

    cache = R.ChangeWindowCache()
    derivations = []
    orig = R.window_weighted_changes

    def counting(*a, **k):
        derivations.append(threading.get_ident())
        return orig(*a, **k)

    R.window_weighted_changes = counting
    try:
        results = []
        errs = []

        def worker():
            try:
                delta, any_cdf = cache.weighted_changes(src, lo, hi)
                results.append(
                    tuple(sorted(
                        (r.id, r.v, r._w) for r in delta.collect()
                    ))
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        R.window_weighted_changes = orig
    assert not errs
    assert len(derivations) == 1  # derived (and pinned) exactly once
    assert len(set(results)) == 1  # every thread read the same frame
    assert len(results) == 4


def test_window_cache_distinct_cursors_pin_concurrently(spark, tmp_path):
    """Per-key cache locks (r13): two families pinning DIFFERENT
    windows must not serialize on each other's derive+pin job.  The
    window-A derivation BLOCKS until window B's derivation has started
    — under the old cache-wide lock B's caller would wait on the lock
    A holds across its pin and the test would time out; with per-key
    locks both derive exactly once and both callers complete."""
    d = str(tmp_path)
    src = ManagedTable.create(
        spark, f"{d}/src",
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("v", T.LongType()),
        ]),
        key_cols=["id"], table_type="MOR",
    )
    src.append(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"))
    src.merge(spark.createDataFrame([(2, 25), (3, 30)], "id long, v long"))
    hi = src._current_version()
    key_a, key_b = (1, hi), (2, hi)  # distinct lo cursors

    cache = R.ChangeWindowCache()
    b_started = threading.Event()
    derivations = []
    orig = R.window_weighted_changes

    def gated(table, segments, *a, **k):
        lo = segments[0][0]
        derivations.append(lo)
        if lo == key_a[0]:
            # A's derive waits for B's to begin — impossible if B's
            # caller is queued behind a cache-wide lock A holds
            assert b_started.wait(timeout=60), (
                "window B's derivation never started while A held its "
                "pin lock — per-key locking regressed to a global lock"
            )
        else:
            b_started.set()
        return orig(table, segments, *a, **k)

    R.window_weighted_changes = gated
    try:
        results, errs = [], []

        def worker(lo_hi):
            try:
                delta, _ = cache.weighted_changes(src, *lo_hi)
                results.append((lo_hi, len(delta.collect())))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            threading.Thread(target=worker, args=(key_a,)),
            threading.Thread(target=worker, args=(key_b,)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not any(t.is_alive() for t in threads)
    finally:
        R.window_weighted_changes = orig
    assert not errs
    assert sorted(derivations) == [1, 2]  # each window derived once
    assert len(results) == 2


def test_two_rollups_refresh_concurrently_and_land_exact(spark, tmp_path):
    """Intra-family parallelism (r13): N declared rollups refresh from
    a pool inside the rollups family — both land the same state the
    serial order produced, across an insert batch and a delete batch,
    and the pool actually overlaps (observed via thread names in the
    refresh entry points)."""
    import s3_sqs_data_ingestion_demo_spark.operators.rollup as R_

    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(
        d,
        rollups=[
            {"path": f"{d}/roll", "group_columns": ["grp"],
             "sum_columns": ["v"]},
            {"path": f"{d}/roll2", "group_columns": ["grp"],
             "sum_columns": [], "distinct_columns": ["v"]},
        ],
        topk_mvs=[],
        cdc_delete_values=["D"],
    )
    seen_threads = set()
    orig = R_.refresh_rollup

    def spying(*a, **k):
        seen_threads.add(threading.current_thread().name)
        return orig(*a, **k)

    # job.py imports refresh_rollup lazily inside _maintain_rollups,
    # so patching the module attribute is seen at call time
    R_.refresh_rollup = spying
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_csv(b1, [(1, "a", 7, 1, "I"), (2, "a", 7, 1, "I"),
                    (3, "b", 9, 1, "I")])
    _write_csv(b2, [(2, "a", 7, 2, "D")])
    try:
        J.process_files(spark, cfg, [b1])
        J.process_files(spark, cfg, [b2])
    finally:
        R_.refresh_rollup = orig
    r1 = {r.grp: (r.n_rows, r.sum_v)
          for r in ManagedTable.load(spark, f"{d}/roll").read().collect()}
    assert r1 == {"a": (1, 7.0), "b": (1, 9.0)}
    r2 = {r.grp: (r.n_rows, r.n_distinct_v)
          for r in ManagedTable.load(spark, f"{d}/roll2").read().collect()}
    assert r2 == {"a": (1, 1), "b": (1, 1)}
    assert any(t.startswith("rollup-refresh") for t in seen_threads), (
        f"expected pooled rollup refreshes, saw threads {seen_threads}"
    )


def test_rollup_two_distinct_columns_fold_concurrently(spark, tmp_path):
    """Companion-chain overlap (r13): a rollup with TWO distinct
    columns folds both companions from a pool and keeps each
    COUNT(DISTINCT) exact through deletes that empty one value of each
    column."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(
        d,
        rollups=[
            {"path": f"{d}/roll", "group_columns": ["grp"],
             "sum_columns": [], "distinct_columns": ["v", "seq"]},
        ],
        topk_mvs=[],
        cdc_delete_values=["D"],
    )
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    # grp a: v values {7, 9}, seq values {1, 2}; delete id=3 (sole
    # holder of v=9; seq=2's sole holder) → v distinct 2→1, seq 2→1
    _write_csv(b1, [(1, "a", 7, 1, "I"), (2, "a", 7, 1, "I"),
                    (3, "a", 9, 2, "I")])
    _write_csv(b2, [(3, "a", 9, 3, "D")])
    J.process_files(spark, cfg, [b1])
    t = ManagedTable.load(spark, f"{d}/roll")
    st = {r.grp: (r.n_rows, r.n_distinct_v, r.n_distinct_seq)
          for r in t.read().collect()}
    assert st == {"a": (3, 2, 2)}
    J.process_files(spark, cfg, [b2])
    st = {r.grp: (r.n_rows, r.n_distinct_v, r.n_distinct_seq)
          for r in t.read().collect()}
    assert st == {"a": (2, 1, 1)}
