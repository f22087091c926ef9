"""ManagedTable: append / overwrite / merge, partition-aware COW,
snapshot isolation, time travel."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable, align_to_schema

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("part", T.StringType(), False),
        T.StructField("val", T.DoubleType(), True),
        T.StructField("ts", T.LongType(), True),
    ]
)


def rows_of(df):
    return sorted((r.id, r.part, r.val, r.ts) for r in df.collect())


def make(spark, tmp_path, partitioned=True, policy="unconditional"):
    return ManagedTable.create(
        spark,
        os.path.join(tmp_path, "tbl"),
        SCHEMA,
        partition_cols=["part"] if partitioned else [],
        key_cols=["id"],
        order_column="ts",
        merge_policy=policy,
    )


def df_of(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_read_empty(spark, tmp_path):
    t = make(spark, str(tmp_path))
    assert t.read().count() == 0
    assert t.read().schema == SCHEMA
    assert ManagedTable.exists(t.path)


def test_create_twice_fails(spark, tmp_path):
    make(spark, str(tmp_path))
    with pytest.raises(FileExistsError):
        make(spark, str(tmp_path))


def test_append_accumulates(spark, tmp_path):
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    t.append(df_of(spark, [(2, "b", 2.0, 1)]))
    assert rows_of(t.read()) == [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]


def test_overwrite_replaces(spark, tmp_path):
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    t.overwrite(df_of(spark, [(9, "z", 9.0, 1)]))
    assert rows_of(t.read()) == [(9, "z", 9.0, 1)]


def test_merge_upsert_unconditional(spark, tmp_path):
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1), (3, "b", 3.0, 1)]))
    # batch: update id=2 (twice — within-batch dedup picks ts=5), insert id=4
    t.merge(df_of(spark, [(2, "a", 20.0, 5), (2, "a", 21.0, 4), (4, "b", 4.0, 2)]))
    assert rows_of(t.read()) == [
        (1, "a", 1.0, 1), (2, "a", 20.0, 5), (3, "b", 3.0, 1), (4, "b", 4.0, 2),
    ]


def test_merge_partition_pruning_rewrites_only_affected(spark, tmp_path):
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1), (3, "b", 3.0, 1), (5, "c", 5.0, 1)]))
    v_before = t._current_version()
    t.merge(df_of(spark, [(1, "a", 10.0, 2)]))  # touches only part=a
    manifest = t._read_manifest()
    # untouched partitions b,c must be carried over from the old root
    carried = [e for e in manifest if f"v{v_before:08d}-" in e["root"]]
    assert carried and sorted(carried[0]["parts"]) == ["part=b", "part=c"]
    new = [e for e in manifest if f"v{v_before:08d}-" not in e["root"]]
    assert new and new[0]["parts"] == ["part=a"]
    assert rows_of(t.read()) == [(1, "a", 10.0, 2), (3, "b", 3.0, 1), (5, "c", 5.0, 1)]


def test_merge_partition_collect_cap_falls_back_to_full_rewrite(spark, tmp_path):
    """A CDC batch whose partition-value cardinality exceeds
    merge.max-affected-partitions must never collect all values to the
    driver: the merge degrades to a full-table COW rewrite (at that
    breadth pruning saves nothing) and results stay identical."""
    t = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "tbl"),
        SCHEMA,
        partition_cols=["part"],
        key_cols=["id"],
        order_column="ts",
        properties={"merge.max-affected-partitions": "3"},
    )
    base = [(i, f"p{i}", float(i), 1) for i in range(8)]  # 8 partitions
    t.append(df_of(spark, base))
    v_before = t._current_version()
    # batch touches 6 partitions (> cap=3): update evens, insert 100/101
    batch = [(i, f"p{i}", float(i) + 10, 2) for i in (0, 2, 4, 6)] + [
        (100, "p100", 100.0, 2), (101, "p101", 101.0, 2),
    ]
    t.merge(df_of(spark, batch))
    expected = sorted(
        [(i, f"p{i}", float(i), 1) for i in (1, 3, 5, 7)]
        + [(i, f"p{i}", float(i) + 10.0, 2) for i in (0, 2, 4, 6)]
        + [(100, "p100", 100.0, 2), (101, "p101", 101.0, 2)]
    )
    assert rows_of(t.read()) == expected
    # full rewrite: nothing carried over from the pre-merge root
    manifest = t._read_manifest()
    assert len(manifest) == 1
    assert f"v{v_before:08d}-" not in manifest[0]["root"]


def test_concurrent_commit_loses_loudly(spark, tmp_path):
    """Optimistic concurrency: a commit racing an already-written
    next-version snapshot must raise CommitConflictError, never
    silently clobber the winner's manifest; after re-loading, the
    retry succeeds against the new current version."""
    from s3_sqs_data_ingestion_demo_spark.table import CommitConflictError

    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    v = t._current_version()
    # simulate a concurrent winner: the next snapshot already exists
    winner = os.path.join(t.path, "_snapshots", f"v{v + 1:08d}.json")
    with open(winner, "w", encoding="utf-8") as fh:
        fh.write('{"version": %d, "entries": []}' % (v + 1))
    with pytest.raises(CommitConflictError, match="another"):
        t.merge(df_of(spark, [(2, "b", 2.0, 1)]))
    # winner's manifest untouched
    with open(winner, encoding="utf-8") as fh:
        assert '"entries": []' in fh.read()
    # retry path: once the conflict is resolved, committing works
    os.remove(winner)
    t.merge(df_of(spark, [(2, "b", 2.0, 1)]))
    assert rows_of(t.read()) == [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]


def test_merge_latest_wins_rejects_stale(spark, tmp_path):
    t = make(spark, str(tmp_path), policy="latest_wins")
    t.append(df_of(spark, [(1, "a", 1.0, 10)]))
    t.merge(df_of(spark, [(1, "a", 99.0, 5)]))  # stale update: older ts
    assert rows_of(t.read()) == [(1, "a", 1.0, 10)]
    t.merge(df_of(spark, [(1, "a", 2.0, 11)]))  # fresh update wins
    assert rows_of(t.read()) == [(1, "a", 2.0, 11)]


def test_merge_unconditional_is_reference_bug_compatible(spark, tmp_path):
    """SURVEY §2.4 T4: the reference's WHEN MATCHED updates with no
    timestamp guard, so a late stale batch regresses the row."""
    t = make(spark, str(tmp_path), policy="unconditional")
    t.append(df_of(spark, [(1, "a", 1.0, 10)]))
    t.merge(df_of(spark, [(1, "a", 99.0, 5)]))
    assert rows_of(t.read()) == [(1, "a", 99.0, 5)]


def test_merge_idempotent_redelivery(spark, tmp_path):
    t = make(spark, str(tmp_path))
    batch = [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]
    t.merge(df_of(spark, batch))
    t.merge(df_of(spark, batch))  # redelivered
    assert rows_of(t.read()) == sorted(batch)


def test_unpartitioned_merge(spark, tmp_path):
    t = make(spark, str(tmp_path), partitioned=False)
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    t.merge(df_of(spark, [(1, "a", 2.0, 2), (2, "b", 1.0, 1)]))
    assert rows_of(t.read()) == [(1, "a", 2.0, 2), (2, "b", 1.0, 1)]


def test_time_travel_and_history(spark, tmp_path):
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    v2 = t._current_version()
    t.merge(df_of(spark, [(1, "a", 2.0, 2)]))
    assert rows_of(t.read_version(v2)) == [(1, "a", 1.0, 1)]
    assert rows_of(t.read()) == [(1, "a", 2.0, 2)]
    assert t.history() == [1, 2, 3]


def test_align_to_schema_casts_and_fills():
    import pyspark.sql.functions as F  # noqa: F401


def test_write_mode_dispatch_fails_loudly(spark, tmp_path):
    t = make(spark, str(tmp_path))
    with pytest.raises(ValueError, match="unknown write mode"):
        t.write(df_of(spark, [(1, "a", 1.0, 1)]), "upsert")


def test_merge_prunes_partitions_with_special_chars(spark, tmp_path):
    """Partition values needing hive escaping (:, %, #, /) must still
    match their written directories during partition-pruned merge —
    raw str() matching silently rewrites nothing and duplicates rows."""
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a:b", 1.0, 1), (2, "50%", 2.0, 1), (3, "x/y", 3.0, 1)]))
    t.merge(df_of(spark, [(1, "a:b", 10.0, 2), (2, "50%", 20.0, 2)]))
    assert rows_of(t.read()) == [
        (1, "a:b", 10.0, 2), (2, "50%", 20.0, 2), (3, "x/y", 3.0, 1),
    ]
    # untouched partition carried over, affected ones rewritten once
    manifest = t._read_manifest()
    all_parts = sorted(p for e in manifest for p in (e.get("parts") or []))
    assert all_parts == ["part=50%25", "part=a%3Ab", "part=x%2Fy"]


def test_empty_merge_and_append_are_noops(spark, tmp_path):
    """An empty CDC batch must never corrupt the table (ADVICE r01:
    a rowless partitioned commit used to leave a rootless entry that
    made every later read raise UNABLE_TO_INFER_SCHEMA)."""
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    v = t._current_version()
    empty = df_of(spark, []).filter("id < 0")
    assert t.merge(empty) == v
    assert t.append(empty) == v
    # table still fully readable and mergeable afterwards
    assert rows_of(t.read()) == [(1, "a", 1.0, 1)]
    t.merge(df_of(spark, [(1, "a", 2.0, 2)]))
    assert rows_of(t.read()) == [(1, "a", 2.0, 2)]
    assert t.compact() > v


def test_read_entry_tolerates_historical_empty_commit(spark, tmp_path):
    """Snapshots written before the empty-batch guard may carry
    rootless entries; schema-aware reads must resolve them to empty."""
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    # simulate a legacy rowless commit: entry whose root has no files
    root = t._new_root()
    os.makedirs(root, exist_ok=True)
    entry = {"root": os.path.relpath(root, t.path), "parts": None}
    t._commit_snapshot(t._read_manifest() + [entry])
    assert rows_of(t.read()) == [(1, "a", 1.0, 1)]


def test_target_file_rows_splits_output_files(spark, tmp_path):
    """write.target-file-rows caps rows per parquet file so snapshot
    files stay evenly sized (the anti-giant-file / anti-tiny-file
    knob at scale); reads are unaffected."""
    import glob as _glob

    t = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "tbl"),
        SCHEMA,
        key_cols=["id"],
        properties={"write.target-file-rows": "10"},
    )
    rows = [(i, "p", float(i), i) for i in range(100)]
    t.append(df_of(spark, rows).repartition(1))
    files = _glob.glob(os.path.join(t.path, "data", "*", "*.parquet"))
    assert len(files) >= 10  # 100 rows / 10-per-file
    assert rows_of(t.read()) == sorted(rows)


def test_cow_delete_prunes_partitions(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1), (3, "b", 9.0, 1)]))
    v_roots_before = {e["root"] for e in t._read_manifest()}
    t.delete_where(F.col("val") > 5.0)  # only partition b affected
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]
    # partition a's files were never rewritten
    kept = {e["root"] for e in t._read_manifest()}
    assert v_roots_before & kept, "untouched partition should keep its root"
    # SQL null semantics: null predicate keeps the row
    t.append(df_of(spark, [(4, "a", None, 1)]))
    t.delete_where(F.col("val") > 0.0)
    assert sorted(r.id for r in t.read().collect()) == [4]


def test_mor_tombstone_delete_and_reinsert(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id"], order_column="ts", table_type="MOR",
    )
    t.merge(df_of(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)]))
    v_before_delete = t._current_version()
    t.delete_where("id = 1")
    assert [r.id for r in t.read().collect()] == [2]
    # O(matched keys): the delete landed as a tombstone delta, no rewrite
    kinds = [e.get("kind") for e in t._read_manifest()]
    assert "tombstone" in kinds
    # time travel still sees the pre-delete state
    assert sorted(r.id for r in t.read_version(v_before_delete).collect()) == [1, 2]
    # a re-insert AFTER the delete survives
    t.merge(df_of(spark, [(1, "a", 9.0, 2)]))
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    assert {r.id: r.val for r in t.read().collect()}[1] == 9.0
    # compaction folds tombstones away
    t.compact()
    assert len(t._read_manifest()) == 1
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_mor_delete_requires_keys(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, table_type="MOR",
    )
    with pytest.raises(ValueError, match="key columns"):
        t.delete_where("id = 1")


def test_cow_delete_empties_whole_partition(spark, tmp_path):
    """Deleting every row of the affected partitions commits a manifest
    with only the untouched entries (no empty data root is written)."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        partition_cols=["part"], key_cols=["id"],
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    t.delete_where(F.col("part") == "b")
    assert rows_of(t.read()) == [(1, "a", 1.0, 1)]


def test_delete_keys_cow_and_mor(spark, tmp_path):
    for ttype in ("COW", "MOR"):
        t = ManagedTable.create(
            spark, os.path.join(str(tmp_path), ttype), SCHEMA,
            key_cols=["id"], table_type=ttype,
        )
        t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)])) if ttype == "COW" \
            else t.merge(df_of(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)]))
        keys = spark.createDataFrame([(1,)], "id int")
        t.delete_keys(keys)
        assert [r.id for r in t.read().collect()] == [2], ttype
        # empty key set is a no-op
        v = t._current_version()
        t.delete_keys(spark.createDataFrame([], "id int"))
        assert t._current_version() == v, ttype


def test_manifest_stats_prune_point_reads(spark, tmp_path):
    """Iceberg-style manifest pruning: commits record per-entry key
    (min, max); a point/range read skips data roots that cannot
    contain the key — on a long-lived table a lookup opens the few
    entries that ever saw the key, not the whole history."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    for base in (0, 100, 200, 300):  # disjoint key ranges per commit
        t.merge(df_of(spark, [(base + i, "a", 1.0, 1) for i in range(10)]))
    entries = t._read_manifest()
    assert all("stats" in e for e in entries)
    assert entries[0]["stats"]["id"] == [0, 9]
    # stats-level pruning: only one of four entries can hold id 205
    kept = [e for e in entries if t._entry_may_contain(e, "id", 205, 205)]
    assert len(kept) == 1
    got = t.read_where("id", 205, 205).collect()
    assert [(r.id, r.val) for r in got] == [(205, 1.0)]
    # range spanning two entries
    assert sorted(r.id for r in t.read_where("id", 95, 105).collect()) == list(
        range(100, 106)
    )
    # exactness without stats: legacy entries (no stats key) still read
    entries[0].pop("stats")
    assert t._entry_may_contain(entries[0], "id", 205, 205)


def test_manifest_stats_respect_deletes_and_updates(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    t.merge(df_of(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)]))
    t.merge(df_of(spark, [(1, "a", 9.0, 2)]))  # update id 1
    assert [r.val for r in t.read_where("id", 1, 1).collect()] == [9.0]
    t.delete_where("id = 1")
    assert t.read_where("id", 1, 1).count() == 0


def test_stats_harvest_runs_zero_spark_jobs(spark, tmp_path):
    """The per-commit key-stats harvest reads parquet footers on the
    driver — it must NOT launch a Spark job (the old read-back
    aggregate doubled I/O on every commit: VERDICT r4 #2)."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    t.merge(df_of(spark, [(i, "a", 1.0, 1) for i in range(10)]))
    entry = t._read_manifest()[-1]
    root = os.path.join(t.path, entry["root"])
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    stats = t._collect_entry_stats(root)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert stats == {"id": [0, 9], "__rows": 10}
    assert after == before, "stats harvest must be driver-side only"


def test_stats_harvest_partition_column_keys(spark, tmp_path):
    """Key columns that are ALSO partition columns have no parquet
    chunk stats — their bounds come from the hive directory names."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id", "part"], partition_cols=["part"], table_type="MOR",
    )
    t.merge(df_of(spark, [(1, "ny", 1.0, 1), (2, "ca", 2.0, 1)]))
    entry = t._read_manifest()[-1]
    assert entry["stats"]["id"] == [1, 2]
    assert entry["stats"]["part"] == ["ca", "ny"]


def test_commit_retry_recommits_after_lost_race(spark, tmp_path, monkeypatch):
    """A writer landing between a MOR delta's manifest read and its
    commit makes the delta CONFLICT (version-anchored CAS), and the
    retry re-commits the already-written root against the fresh
    manifest — no recompute, no dropped rows from either writer."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id"], order_column="ts", table_type="MOR",
    )
    t.merge(df_of(spark, [(1, "a", 1.0, 1)]))  # v2
    src = align_to_schema(df_of(spark, [(2, "b", 2.0, 1)]), t.meta.schema)
    entry = t._write_data(src, t._new_root())
    entry["kind"] = "delta"
    root_before = entry["root"]

    real = t._commit_snapshot
    state = {"raced": False}

    def racing(entries, **kw):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent writer lands between our manifest read and
            # this commit
            ManagedTable.load(spark, t.path).merge(
                df_of(spark, [(3, "c", 3.0, 1)])
            )
        return real(entries, **kw)

    monkeypatch.setattr(t, "_commit_snapshot", racing)
    ver = t._commit_entry_with_retry(entry, delta_seq=True)
    assert ver == 4  # winner took v3; retry landed v4
    assert entry["root"] == root_before  # re-committed, not rewritten
    assert entry["seq"] == 4  # MOR seq re-stamped to the landed commit
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]


def test_compact_retries_recompute_after_lost_race(spark, tmp_path, monkeypatch):
    """compact() must RECOMPUTE (not rename) after a lost race — a
    stale rewrite would drop the concurrent commit's rows."""
    from s3_sqs_data_ingestion_demo_spark.table import CommitConflictError

    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id"], order_column="ts", table_type="MOR",
    )
    t.merge(df_of(spark, [(1, "a", 1.0, 1)]))
    t.merge(df_of(spark, [(2, "b", 2.0, 1)]))

    real = t._compact_once
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            # a writer lands between the rewrite's read and its commit
            t.merge(df_of(spark, [(3, "c", 3.0, 1)]))
            raise CommitConflictError("simulated lost race")
        return real(*a, **k)

    monkeypatch.setattr(t, "_compact_once", flaky)
    t.compact()
    assert calls["n"] == 2  # recomputed once
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]
    # compaction folded everything into one data entry
    assert len(t._read_manifest()) == 1


def test_concurrent_writers_all_land_with_retries(spark, tmp_path):
    """Four writer threads race 5 MOR merges each against one table;
    with version-anchored CAS + re-commit retries every batch must
    land exactly once — the multi-writer guarantee async maintenance
    and parallel ingest jobs rely on."""
    import threading

    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        key_cols=["id"], order_column="ts", table_type="MOR",
        properties={"commit.retries": "20"},
    )
    errors = []

    def writer(wid: int):
        try:
            tw = ManagedTable.load(spark, t.path)
            for i in range(5):
                rid = wid * 100 + i
                tw.merge(df_of(spark, [(rid, "p", float(rid), 1)]))
        except Exception as e:  # noqa: BLE001
            errors.append((wid, e))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    got = sorted(r.id for r in t.read().collect())
    assert got == sorted(w * 100 + i for w in range(4) for i in range(5))
    # every commit advanced the version exactly once: create + 20 merges
    assert t._current_version() == 21


def test_vacuum_orphans_removes_aged_unreferenced_roots(spark, tmp_path):
    """A crashed writer's uncommitted data root is garbage; vacuum
    removes it once past the age grace, keeps referenced roots and
    fresh (possibly in-flight) ones, and leaves time travel intact."""
    t = make(spark, str(tmp_path), partitioned=False)
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    v2 = t._current_version()
    t.merge(df_of(spark, [(2, "b", 2.0, 1)]))
    # simulate a crashed writer: data written, commit never happened
    orphan = t._new_root()
    t._write_data(
        align_to_schema(df_of(spark, [(9, "z", 9.0, 9)]), t.meta.schema),
        orphan,
    )
    fresh_orphan = t._new_root()
    t._write_data(
        align_to_schema(df_of(spark, [(8, "y", 8.0, 8)]), t.meta.schema),
        fresh_orphan,
    )
    # age only the first orphan past the grace window
    old = 10_000
    os.utime(orphan, (os.path.getmtime(orphan) - old,) * 2)

    removed = t.vacuum_orphans(min_age_seconds=5_000)
    assert removed == [f"data/{os.path.basename(orphan)}"]
    assert not os.path.exists(orphan)
    assert os.path.exists(fresh_orphan)  # inside grace: kept
    # table state and time travel untouched
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    assert rows_of(t.read_version(v2)) == [(1, "a", 1.0, 1)]


def test_read_unresolved_partitioned_union_matches_fast_path_semantics(spark, tmp_path):
    """The partitioned (per-entry union) and unpartitioned (single
    multi-path scan) read_unresolved branches must agree on rows AND
    per-entry commit seqs for equivalent commit histories."""
    rows1, rows2 = [(1, "a", 1.0, 1), (2, "b", 2.0, 1)], [(3, "a", 3.0, 2)]
    tp = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "p"), SCHEMA,
        key_cols=["id"], partition_cols=["part"], table_type="MOR",
    )
    tu = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "u"), SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    for t in (tp, tu):
        t.merge(df_of(spark, rows1))
        t.merge(df_of(spark, rows2))
    got_p = sorted(
        (r.id, r._sg_seq) for r in tp.read_unresolved(with_seq=True).collect()
    )
    got_u = sorted(
        (r.id, r._sg_seq) for r in tu.read_unresolved(with_seq=True).collect()
    )
    assert got_p == got_u == [(1, 2), (2, 2), (3, 3)]


def _plant_orphan_manifest(t, age_seconds=0.0):
    """Simulate a writer crashing between manifest create and pointer
    publish: v{N+1}.json exists, CURRENT still points at N."""
    v = t._current_version()
    orphan = os.path.join(t.path, "_snapshots", f"v{v + 1:08d}.json")
    with open(orphan, "w", encoding="utf-8") as fh:
        fh.write(
            '{"version": %d, "kind": "data", "entries": []}' % (v + 1)
        )
    if age_seconds:
        os.utime(orphan, (os.path.getmtime(orphan) - age_seconds,) * 2)
    return orphan


def test_crashed_commit_orphan_manifest_is_reclaimed(spark, tmp_path):
    """A writer dying between open(snap, 'x') and the CURRENT rename
    must NOT wedge the slot forever: once the orphan manifest is older
    than commit.orphan-grace-seconds, the next committer reclaims the
    slot and its commit succeeds — from a fresh handle, no manual
    intervention."""
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    orphan = _plant_orphan_manifest(t, age_seconds=10_000)

    fresh = ManagedTable.load(spark, t.path)
    fresh.merge(df_of(spark, [(2, "b", 2.0, 1)]))
    assert rows_of(fresh.read()) == [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]
    # the reclaimed slot now holds the NEW commit's manifest
    import json as _json

    with open(orphan, encoding="utf-8") as fh:
        assert _json.load(fh)["entries"]  # not the planted empty orphan


def test_fresh_unpublished_manifest_is_not_reclaimed(spark, tmp_path):
    """A manifest younger than the grace window may belong to a LIVE
    writer mid-publish — it must be left alone and the conflict
    raised (existing behavior, now with the reclaim hint)."""
    from s3_sqs_data_ingestion_demo_spark.table import CommitConflictError

    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    orphan = _plant_orphan_manifest(t, age_seconds=0.0)
    with pytest.raises(CommitConflictError, match="another"):
        t.merge(df_of(spark, [(2, "b", 2.0, 1)]))
    assert os.path.exists(orphan)


def test_published_manifest_is_never_reclaimed(spark, tmp_path):
    """_reclaim_orphan_manifest must refuse when CURRENT already
    points at (or past) the slot — a published commit is a real
    concurrent winner, however old its mtime."""
    t = make(spark, str(tmp_path))
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    v = t._current_version()
    snap = os.path.join(t.path, "_snapshots", f"v{v:08d}.json")
    os.utime(snap, (os.path.getmtime(snap) - 10_000,) * 2)
    assert t._reclaim_orphan_manifest(v) is False
    assert os.path.exists(snap)


def test_orphan_grace_property_is_respected(spark, tmp_path):
    """commit.orphan-grace-seconds tunes the reclaim window."""
    t = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "tbl"),
        SCHEMA,
        key_cols=["id"],
        order_column="ts",
        properties={"commit.orphan-grace-seconds": "2"},
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    _plant_orphan_manifest(t, age_seconds=5)  # older than 2s grace
    t.merge(df_of(spark, [(2, "b", 2.0, 1)]))
    assert rows_of(t.read()) == [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]


def test_read_where_in_prunes_disjoint_entries(spark, tmp_path):
    """Multi-point read fast path: single-key table, key-disjoint
    entries, stats-columns harvested for the scan column — only the
    entries whose stats intersect the value set are opened, and the
    isin predicate reaches the parquet scan."""
    import os as _os

    from pyspark.sql import types as T

    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ])
    t = ManagedTable.create(
        spark, _os.path.join(str(tmp_path), "t"), schema,
        key_cols=["id"], table_type="MOR",
        properties={"write.stats-columns": "grp"},
    )
    for b in range(3):
        t.merge(spark.createDataFrame(
            [(b * 10 + i, b, float(i)) for i in range(10)], schema
        ))
    total_files = len(t.read().inputFiles())
    got = t.read_where_in("grp", [1])
    assert sorted(r.id for r in got.collect()) == list(range(10, 20))
    assert len(got.inputFiles()) < total_files
    tree = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in tree and "grp" in tree.split("PushedFilters", 1)[1][:200]
    # empty value set: no scan at all
    assert t.read_where_in("grp", []).count() == 0


def test_read_where_in_fallback_is_exact_on_duplicate_versions(spark, tmp_path):
    """When a key has two live versions (overlapping entry ranges) the
    fast path must NOT engage: the newest version's scan column decides
    membership, never a stale one from a pruned entry."""
    import os as _os

    from pyspark.sql import types as T

    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.IntegerType()),
    ])
    t = ManagedTable.create(
        spark, _os.path.join(str(tmp_path), "t"), schema,
        key_cols=["id"], table_type="MOR",
        properties={"write.stats-columns": "grp"},
    )
    t.merge(spark.createDataFrame([(1, 1), (2, 1)], schema))
    t.merge(spark.createDataFrame([(1, 2)], schema))  # id 1 moves to grp 2
    assert not t.entries_disjoint_on("id")
    assert [r.id for r in t.read_where_in("grp", [1]).collect()] == [2]
    assert [r.id for r in t.read_where_in("grp", [2]).collect()] == [1]
    # deletes force the fallback too, and stay masked
    t.delete_keys(spark.createDataFrame([(2,)], "id long"))
    assert t.read_where_in("grp", [1]).count() == 0
    # compaction folds duplicates + tombstones → fast path returns
    t.compact(cluster_by=["grp"])
    assert t.entries_disjoint_on("id")
    assert [r.id for r in t.read_where_in("grp", [2]).collect()] == [1]


def test_metadata_tables_snapshots_and_files(spark, tmp_path):
    """Iceberg-style inspection relations: snapshots() rows track the
    commit history (kinds, entry counts, tags); files() lists the
    current snapshot's live data files with their manifest key
    bounds."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "tbl"), SCHEMA,
        key_cols=["id"], order_column="ts", table_type="MOR",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1)]),
             tag="batch-1")
    t.merge(df_of(spark, [(3, "b", 3.0, 2)]))
    t.delete_keys(df_of(spark, [(2, "a", 2.0, 3)]).select("id"))

    snaps = t.snapshots().collect()
    assert [r.version for r in snaps] == t.history()
    by_v = {r.version: r for r in snaps}
    assert by_v[2].tag == "batch-1"
    assert by_v[max(by_v)].n_tombstones == 1
    assert all(r.committed_at for r in snaps)

    files = t.files().collect()
    assert files and all(f.file.endswith(".parquet") for f in files)
    assert all(f.size_bytes > 0 for f in files)
    kinds = {f.entry_kind for f in files}
    assert "delta" in kinds
    # manifest key bounds ride along where harvested
    bounded = [f for f in files if f.key_min is not None]
    assert bounded
    # tombstone entries carry no data files of their own (delete_keys
    # writes the victim keys as a delta-kind tombstone entry root)
    total = sum(1 for _ in files)
    assert total >= 2


def test_count_rows_metadata_only_and_fallback(spark, tmp_path, monkeypatch):
    t = make(spark, str(tmp_path), partitioned=False, policy="latest_wins")
    t.append(df_of(spark, [(i, "p", 1.0, 1) for i in range(10)]))
    t.append(df_of(spark, [(i, "p", 1.0, 1) for i in range(10, 15)]))
    # metadata-only: no scan may happen (reads would go via _read_entry)
    called = []
    monkeypatch.setattr(
        ManagedTable,
        "_read_entry",
        lambda self, e: called.append(e) or (_ for _ in ()).throw(
            AssertionError("count_rows must not open data files")
        ),
    )
    assert t.count_rows() == 15
    monkeypatch.undo()
    # a pending MOR delta makes the count unprovable from metadata:
    # the same call falls back to the exact resolved scan
    t.merge(df_of(spark, [(0, "p", 2.0, 2), (99, "p", 1.0, 1)]))
    assert t.count_rows() == 16  # 1 update (no growth) + 1 insert
    t.compact()
    assert t.count_rows() == 16  # folded: metadata-only again


def test_min_max_metadata_only_and_fallbacks(spark, tmp_path, monkeypatch):
    t = make(spark, str(tmp_path), partitioned=False, policy="latest_wins")
    t.append(df_of(spark, [(i, "p", 1.0, 1) for i in range(10)]))
    t.append(df_of(spark, [(i, "p", 1.0, 1) for i in range(40, 45)]))
    # metadata-only on the key column (stats harvested): no file opens
    monkeypatch.setattr(
        ManagedTable,
        "_read_entry",
        lambda self, e: (_ for _ in ()).throw(
            AssertionError("min_max must not open data files")
        ),
    )
    assert t.min_max("id") == (0, 44)
    monkeypatch.undo()
    # non-stats column (val is not a key / stats column): exact scan
    assert t.min_max("val") == (1.0, 1.0)
    # pending MOR delta: the extreme row may be superseded — fallback
    t.merge(df_of(spark, [(44, "p", 2.0, 2)]))
    assert t.min_max("id") == (0, 44)
    t.compact()
    assert t.min_max("id") == (0, 44)  # provable again
    with pytest.raises(ValueError, match="unknown column"):
        t.min_max("nope")


def test_min_max_string_stats_fall_back_to_scan(spark, tmp_path):
    """String footer min/max may be truncated BOUNDS — exact for
    pruning, not as returned values — so string columns always take
    the exact scan."""
    t = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "s"),
        SCHEMA,
        key_cols=["part"],  # string key: stats harvested but not used
    )
    t.append(df_of(spark, [(1, "aa", 1.0, 1), (2, "zz", 1.0, 1)]))
    assert t.min_max("part") == ("aa", "zz")


def test_count_rows_keyless_table(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "nk"), SCHEMA, key_cols=[]
    )
    t.append(df_of(spark, [(1, "p", 1.0, 1), (1, "p", 1.0, 1)]))
    assert t.count_rows() == 2  # __rows harvested without key columns


def test_named_refs_pin_versions_and_survive_expiration(spark, tmp_path):
    t = make(spark, str(tmp_path), partitioned=False)
    t.append(df_of(spark, [(1, "p", 1.0, 1)]))
    tagged = t.create_ref("train-v1")
    t.append(df_of(spark, [(2, "p", 1.0, 1)]))
    t.append(df_of(spark, [(3, "p", 1.0, 1)]))
    assert t.refs() == {"train-v1": tagged}
    assert sorted(r.id for r in t.read_ref("train-v1").collect()) == [1]
    # expiration keeps the tagged snapshot however old
    expired = t.expire_snapshots(keep_last=1)
    assert tagged not in expired
    assert sorted(r.id for r in t.read_ref("train-v1").collect()) == [1]
    # O_EXCL semantics + replace, drop releases retention
    with pytest.raises(ValueError, match="already exists"):
        t.create_ref("train-v1")
    t.create_ref("train-v1", replace=True)
    assert t.refs()["train-v1"] == t._current_version()
    t.drop_ref("train-v1")
    assert t.refs() == {}
    with pytest.raises(ValueError, match="does not exist"):
        t.read_ref("train-v1")
    with pytest.raises(ValueError, match="does not exist"):
        t.create_ref("x", version=9999)
    with pytest.raises(ValueError, match="invalid ref name"):
        t.create_ref("../escape")


def test_min_max_subset_entry_stats_not_trusted(spark, tmp_path):
    """A partition-pruned delete rewrites SOME of an entry's partitions
    and keeps the rest under the entry's ORIGINAL stats (bounds only —
    _subset_stats drops __rows).  Those bounds may name an extreme row
    that was just deleted; min_max must fall back to the exact scan,
    not return the stale value."""
    t = make(spark, str(tmp_path), partitioned=True)
    # one entry spanning two partitions; global max id=44 lives in "b"
    t.append(
        df_of(
            spark,
            [(i, "a", 1.0, 1) for i in range(10)]
            + [(44, "b", 1.0, 1)],
        )
    )
    assert t.min_max("id") == (0, 44)
    # partition-pruned COW delete: removes id=44, keeps partition "a"
    # as a PARTS-SUBSET of the original entry (stats without __rows)
    t.delete_where("part = 'b'")
    entries = t._read_manifest()
    assert any(
        e.get("stats") and e["stats"].get("__rows") is None for e in entries
    ), "expected a parts-subset entry carrying bounds-only stats"
    assert t.min_max("id") == (0, 9)  # exact, not the stale bound 44
