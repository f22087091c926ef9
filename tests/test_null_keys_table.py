"""Null KEY values through the table layer's remaining key-matching
paths — the round-9 review found the null-key contract (join_nullsafe:
"every key-matching join on a potentially-null column") fixed in MOR
resolution but not carried through COW rewrites, the unresolved
tombstone view, or the change feed's classification and pruning."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), True),  # nullable KEY
        T.StructField("v", T.IntegerType(), True),
        T.StructField("seq", T.IntegerType(), True),
    ]
)


def _mk(spark, tmp, table_type="COW", name="t"):
    return ManagedTable.create(
        spark,
        os.path.join(str(tmp), name),
        SCHEMA,
        key_cols=["k"],
        order_column="seq",
        table_type=table_type,
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, seq=s) for k, v, s in rows], SCHEMA
    )


def _state(t):
    return {r.k: r.v for r in t.read().collect()}


def test_cow_delete_keys_removes_null_key(spark, tmp_path):
    t = _mk(spark, tmp_path, "COW")
    t.append(_rows(spark, [(None, 1, 1), ("a", 2, 1)]))
    t.delete_keys(spark.createDataFrame([Row(k=None)], "k string"))
    assert _state(t) == {"a": 2}


def test_cow_merge_replaces_null_keyed_row(spark, tmp_path):
    t = _mk(spark, tmp_path, "COW")
    t.append(_rows(spark, [(None, 1, 1), ("a", 2, 1)]))
    t.merge(_rows(spark, [(None, 99, 2)]))
    assert _state(t) == {None: 99, "a": 2}  # replaced, not duplicated
    assert t.read().count() == 2


def test_mor_latest_wins_merge_null_key(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "lw"), SCHEMA,
        key_cols=["k"], order_column="seq", table_type="MOR",
        merge_policy="latest_wins",
    )
    t.append(_rows(spark, [(None, 1, 5)]))
    t.merge(_rows(spark, [(None, 99, 2)]))  # STALE: must lose
    assert _state(t) == {None: 1}


def test_read_unresolved_tombstone_masks_null_key(spark, tmp_path):
    t = _mk(spark, tmp_path, "MOR")
    t.append(_rows(spark, [(None, 1, 1), ("a", 2, 1)]))
    t.delete_keys(spark.createDataFrame([Row(k=None)], "k string"))
    masked = t.read_unresolved(apply_tombstones=True)
    assert sorted(r.k for r in masked.collect() if r.k is not None) == ["a"]
    assert all(r.k is not None for r in masked.collect())


def test_cdf_classifies_null_key_update_not_delete_insert(spark, tmp_path):
    t = _mk(spark, tmp_path, "MOR")
    t.append(_rows(spark, [(None, 1, 1), ("a", 2, 1)]))
    v1 = t._current_version()
    t.merge(_rows(spark, [(None, 50, 2)]))
    changes = {
        (r.k, r._change_type): r.v
        for r in t.read_changes_cdf(v1).collect()
    }
    assert changes == {
        (None, "update_preimage"): 1,
        (None, "update_postimage"): 50,
    }


def test_cdf_identical_null_key_upsert_emits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, "MOR")
    t.append(_rows(spark, [(None, 1, 1)]))
    v1 = t._current_version()
    t.merge(_rows(spark, [(None, 1, 1)]))  # byte-identical re-upsert
    assert t.read_changes_cdf(v1).count() == 0


def test_cdf_null_key_delete_survives_entry_pruning(spark, tmp_path):
    """The failure the review reproduced on paper: the base entry's
    key stats exclude nulls, and the window's non-null affected keys
    sit outside the entry's bounds — pruning would drop the null
    row's pre-image and the delete would vanish from the feed."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "p"), T.StructType(
            [
                T.StructField("k", T.IntegerType(), True),
                T.StructField("v", T.IntegerType(), True),
                T.StructField("seq", T.IntegerType(), True),
            ]
        ),
        key_cols=["k"], order_column="seq", table_type="MOR",
    )
    rows = [Row(k=i, v=i, seq=1) for i in range(1, 11)] + [
        Row(k=None, v=7, seq=1)
    ]
    t.append(spark.createDataFrame(rows, t.meta.schema))
    v1 = t._current_version()
    # window touches k=300 (outside the entry's [1,10] stats) AND the
    # null key — the null disables pruning, so the pre-image is read
    t.merge(spark.createDataFrame([Row(k=300, v=1, seq=2)], t.meta.schema))
    t.delete_keys(spark.createDataFrame([Row(k=None)], "k int"))
    changes = {
        (r.k, r._change_type) for r in t.read_changes_cdf(v1).collect()
    }
    assert (None, "delete") in changes
    assert (300, "insert") in changes
    # and the rollup-weight view nets correctly: exactly one -1 for
    # the null key, one +1 for 300
    assert (None, "insert") not in changes


def _pin_commit_time(table, version, ts):
    """Rewrite a manifest's stamped committed_at (the clock
    version_as_of resolves against) — lets a test pin distinct commit
    times without sleeping through real seconds.  Accepts the table
    HANDLE (or a path string) so the handle's per-instance stamp cache
    — warmed during the commits themselves — is dropped along with the
    on-disk rewrite."""
    import json as _json
    import os as _os

    table_path = table if isinstance(table, str) else table.path
    p = _os.path.join(table_path, "_snapshots", f"v{version:08d}.json")
    with open(p, encoding="utf-8") as fh:
        doc = _json.load(fh)
    doc["committed_at"] = ts
    with open(p, "w", encoding="utf-8") as fh:
        _json.dump(doc, fh)
    if not isinstance(table, str):
        table._commit_time_cache = {}
    return p


def test_read_as_of_timestamp(spark, tmp_path):
    """Timestamp time travel resolves to the newest snapshot at or
    before the asked-for instant (the wall-clock stamped into the
    manifest at commit, same clock as snapshots())."""
    import time as _time

    t = _mk(spark, tmp_path, "COW", name="asof")
    t.append(_rows(spark, [("a", 1, 1)]))
    v1 = t._current_version()
    t.append(_rows(spark, [("b", 2, 1)]))
    v2 = t._current_version()
    # pin distinct commit times without sleeping through real seconds
    # (every version: stamps must stay MONOTONE over the ascending
    # version walk — version_as_of's early exit relies on it, and real
    # commits satisfy it by construction)
    base = _time.time() - 100
    for v in t.history():
        if v < v1:
            _pin_commit_time(t, v, base - 60)
    _pin_commit_time(t, v1, base)
    _pin_commit_time(t, v2, base + 10)
    assert t.version_as_of(base + 5) == v1
    assert t.version_as_of(base + 10) == v2
    assert t.version_as_of(base + 999) == v2
    assert {r.k for r in t.read_as_of(base + 5).collect()} == {"a"}
    assert {r.k for r in t.read_as_of(base + 999).collect()} == {"a", "b"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expired or predates"):
        t.version_as_of(base - 70)  # predates even the create commit
    # ISO-string form resolves too
    import datetime as _dt

    iso = _dt.datetime.fromtimestamp(base + 5).isoformat()
    assert t.version_as_of(iso) == v1


def test_version_as_of_ignores_orphan_manifests(spark, tmp_path):
    """A crashed writer's manifest above the PUBLISHED pointer (the
    documented commit crash window) must be invisible to timestamp
    resolution — read() at the same instant serves CURRENT."""
    import json as _json
    import os as _os
    import time as _time

    t = _mk(spark, tmp_path, "COW", name="orph")
    t.append(_rows(spark, [("a", 1, 1)]))
    cur = t._current_version()
    # fabricate an orphan: a manifest one past CURRENT, never published
    orphan = _os.path.join(t.path, "_snapshots", f"v{cur + 1:08d}.json")
    with open(orphan, "w", encoding="utf-8") as fh:
        _json.dump({"entries": [], "kind": "data"}, fh)
    now = _time.time() + 1
    assert t.version_as_of(now) == cur
    assert {r.k for r in t.read_as_of(now).collect()} == {"a"}
    _os.remove(orphan)


def test_version_as_of_survives_copy_restore(spark, tmp_path):
    """A copy/rsync/restore of a table directory rewrites every file
    mtime; timestamp travel must resolve from the wall-clock stamped
    INTO the manifest, not the file clock — the same timestamp maps
    to the same version before and after the move."""
    import os as _os
    import shutil as _shutil
    import time as _time

    t = _mk(spark, tmp_path, "COW", name="orig")
    t.append(_rows(spark, [("a", 1, 1)]))
    v1 = t._current_version()
    t.append(_rows(spark, [("b", 2, 1)]))
    v2 = t._current_version()
    base = _time.time() - 100
    for v in t.history():
        if v < v1:
            _pin_commit_time(t, v, base - 60)
    _pin_commit_time(t, v1, base)
    _pin_commit_time(t, v2, base + 10)
    # "restore": copy the directory, then perturb every mtime the way
    # a backup tool would
    dst = _os.path.join(str(tmp_path), "restored")
    _shutil.copytree(t.path, dst)
    now = _time.time()
    for dirpath, _dirs, names in _os.walk(dst):
        for n in names:
            _os.utime(_os.path.join(dirpath, n), (now, now))
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    r = ManagedTable.load(spark, dst)
    assert r.version_as_of(base + 5) == v1
    assert r.version_as_of(base + 999) == v2
    assert {x.k for x in r.read_as_of(base + 5).collect()} == {"a"}
    # snapshots() reports the stamped clock too
    snaps = {s.version: s.committed_at for s in r.snapshots().collect()}
    import datetime as _dt

    assert snaps[v1] == _dt.datetime.fromtimestamp(
        base, tz=_dt.timezone.utc
    ).isoformat(timespec="seconds")


def test_commit_stamps_strictly_monotone(spark, tmp_path):
    """Commit wall-clock stamps are clamped strictly above the
    previous snapshot's (Delta's rule): rapid same-second commits (and
    NTP steps) still yield a monotone clock — version_as_of's
    ascending early exit and snapshots() ordering rely on it."""
    import json as _json
    import os as _os

    t = _mk(spark, tmp_path, "COW", name="mono")
    for i in range(3):
        t.append(_rows(spark, [(f"k{i}", i, 1)]))
    stamps = []
    for v in t.history():
        p = _os.path.join(t.path, "_snapshots", f"v{v:08d}.json")
        with open(p, encoding="utf-8") as fh:
            stamps.append(_json.load(fh)["committed_at"])
    assert stamps == sorted(stamps)
    assert all(b > a for a, b in zip(stamps, stamps[1:]))


def test_version_as_of_mixed_prestamp_manifests_after_restore(spark, tmp_path):
    """Review finding (r10): pre-stamp manifests fall back to file
    mtime, which a restore rewrites to restore time — the ascending
    early exit must NOT stop on a fallback value, or a later stamped
    version with a genuine earlier commit time is missed."""
    import json as _json
    import os as _os
    import time as _time

    t = _mk(spark, tmp_path, "COW", name="mix")
    t.append(_rows(spark, [("a", 1, 1)]))
    v1 = t._current_version()
    t.append(_rows(spark, [("b", 2, 1)]))
    v2 = t._current_version()
    base = _time.time() - 100
    # v2 keeps a genuine (pinned) stamp; v1 and the create commit
    # become PRE-STAMP manifests whose mtime is "restore time" = now
    for v in t.history():
        if v < v2:
            p = _os.path.join(t.path, "_snapshots", f"v{v:08d}.json")
            with open(p, encoding="utf-8") as fh:
                doc = _json.load(fh)
            doc.pop("committed_at", None)
            with open(p, "w", encoding="utf-8") as fh:
                _json.dump(doc, fh)
            now = _time.time() + 50
            _os.utime(p, (now, now))
    _pin_commit_time(t, v2, base + 10)
    t._commit_time_cache = {}
    # the fallback values (future mtimes) sit ABOVE ts; the stamped v2
    # below it must still resolve
    assert t.version_as_of(base + 20) == v2
    assert v1 not in (t.version_as_of(base + 20),)
