"""Write-Audit-Publish (WAP) staging flow on ManagedTable.

The Iceberg WAP pattern (spark.wap.id + audit + cherrypick) expressed
over the manifest layer: staged snapshots are reader-invisible, the
audit runs over the would-be table state, publish is one atomic tagged
commit, discard leaves the table untouched.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import (
    AuditFailedError,
    ManagedTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("amount", T.LongType(), True),
    ]
)


def _mk(spark, tmp_path, name="t", **kw):
    return ManagedTable.create(
        spark, str(tmp_path / name), SCHEMA, key_cols=["k"], **kw
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_staged_append_invisible_until_publish(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a", 10)]))
    sid = t.stage(_df(spark, [(2, "b", 20)]), mode="append")

    # invisible to readers and to the snapshot history
    assert t.read().count() == 1
    assert t.snapshots().filter("kind = 'data'").count() == 1
    # but the audit view sees the would-be state
    assert t.read_staged(sid).count() == 2
    assert t.read_staged(sid, what="delta").count() == 1
    assert [s["id"] for s in t.list_staged()] == [sid]

    v = t.publish_staged(sid)
    assert t.read().count() == 2
    assert t._current_version() == v
    assert t.list_staged() == []
    # the publish commit carries the wap tag
    assert t.has_commit_tag(f"wap-{sid}")


def test_audit_failure_keeps_table_and_stage(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a", 10)]))
    sid = t.stage(_df(spark, [(2, None, -5)]), mode="append")
    rules = [
        {"rule": "not_null", "column": "v"},
        {"rule": "range", "column": "amount", "min": 0},
    ]
    with pytest.raises(AuditFailedError) as ei:
        t.publish_staged(sid, rules=rules)
    # report covers every rule; both fired on the bad row
    rep = {r["rule_id"]: r["n_violations"] for r in ei.value.report}
    assert rep == {"not_null(v)": 1, "range(amount)": 1}
    # table untouched, stage retained for inspection
    assert t.read().count() == 1
    assert [s["id"] for s in t.list_staged()] == [sid]

    t.discard_staged(sid)
    assert t.list_staged() == []
    assert t.read().count() == 1
    # the staged data root is gone
    assert not any(
        d.startswith("stg-")
        for d in os.listdir(os.path.join(t.path, "data"))
    )


def test_audit_pass_publishes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sid = t.stage(_df(spark, [(1, "a", 10), (2, "b", 20)]), mode="append")
    rules = [
        {"rule": "not_null", "column": "v"},
        {"rule": "unique", "columns": ["k"]},
        {"rule": "range", "column": "amount", "min": 0, "max": 100},
    ]
    t.publish_staged(sid, rules=rules)
    assert t.read().count() == 2


def test_publish_idempotent_after_crash(spark, tmp_path):
    """Crash between the tagged commit and the staged-doc removal:
    the re-publish finds the wap tag and only cleans up the doc."""
    t = _mk(spark, tmp_path)
    sid = t.stage(_df(spark, [(1, "a", 1)]), mode="append")
    doc_path = t._staged_path(sid)
    with open(doc_path, encoding="utf-8") as fh:
        doc_backup = fh.read()
    v = t.publish_staged(sid)
    # simulate the crash leftover: doc resurfaces after the commit
    with open(doc_path, "w", encoding="utf-8") as fh:
        fh.write(doc_backup)
    v2 = t.publish_staged(sid)
    assert v2 == v  # no second commit
    assert t.read().count() == 1
    assert not os.path.exists(doc_path)


def test_staged_merge_mor_survives_concurrent_append(spark, tmp_path):
    t = _mk(
        spark,
        tmp_path,
        table_type="MOR",
        order_column="amount",
        merge_policy="latest_wins",
    )
    t.append(_df(spark, [(1, "old", 1), (2, "keep", 1)]))
    sid = t.stage(
        # intra-batch duplicate key: dedup-by-recency applies at stage
        _df(spark, [(1, "mid", 2), (1, "new", 3)]),
        mode="merge",
    )
    # a concurrent writer lands between stage and publish
    t.append(_df(spark, [(3, "concurrent", 1)]))
    t.publish_staged(sid)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "new", 2: "keep", 3: "concurrent"}


def test_stage_merge_refuses_cow(spark, tmp_path):
    t = _mk(spark, tmp_path)  # COW default
    with pytest.raises(ValueError, match="MOR"):
        t.stage(_df(spark, [(1, "a", 1)]), mode="merge")


def test_staged_overwrite(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a", 1), (2, "b", 2)]))
    sid = t.stage(_df(spark, [(9, "z", 9)]), mode="overwrite")
    assert t.read().count() == 2
    assert t.read_staged(sid).count() == 1  # would-be state IS the stage
    t.publish_staged(sid)
    assert [r["k"] for r in t.read().collect()] == [9]


def test_empty_append_stage_publishes_as_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a", 1)]))
    v0 = t._current_version()
    sid = t.stage(_df(spark, []), mode="append")
    assert t.publish_staged(sid) == v0  # no version churn
    assert t.list_staged() == []


def test_gc_protects_staged_roots(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a", 1)]))
    sid = t.stage(_df(spark, [(2, "b", 2)]), mode="append")
    # vacuum at zero grace: the staged root must survive
    assert t.vacuum_orphans(min_age_seconds=0.0) == []
    # snapshot expiry must not GC it either
    t.append(_df(spark, [(3, "c", 3)]))
    t.expire_snapshots(keep_last=1)
    t.publish_staged(sid)
    got = sorted(r["k"] for r in t.read().collect())
    assert got == [1, 2, 3]


def test_read_staged_unknown_id_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(KeyError, match="no staged snapshot"):
        t.read_staged("deadbeef")


def test_terminal_publish_conflict_preserves_stage(spark, tmp_path):
    """A publish that exhausts its CAS retries (e.g. a wedged slot
    inside the orphan grace window) must leave the stage fully intact
    — doc present, data root present, read_staged working — so a
    later re-publish can succeed.  The generic entry-commit helper's
    terminal cleanup would delete the root (only the staged doc
    references it); publish must not."""
    from s3_sqs_data_ingestion_demo_spark import table as table_mod

    t = _mk(spark, tmp_path, properties={"commit.retries": "1"})
    t.append(_df(spark, [(1, "a", 1)]))
    sid = t.stage(_df(spark, [(2, "b", 2)]), mode="append")

    real = t._commit_snapshot

    def always_conflict(*a, **kw):
        raise table_mod.CommitConflictError("wedged slot (injected)")

    t._commit_snapshot = always_conflict
    with pytest.raises(table_mod.CommitConflictError):
        t.publish_staged(sid)
    t._commit_snapshot = real

    # stage survived the terminal failure
    assert [s["id"] for s in t.list_staged()] == [sid]
    assert t.read_staged(sid, what="delta").count() == 1
    t.publish_staged(sid)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]


def test_crash_replay_publish_with_rules_does_not_spuriously_fail(
    spark, tmp_path
):
    """Replayed publish WITH audit rules: the tag probe must run
    BEFORE the audit — the staged root is already live in the
    manifest, so re-auditing (current + staged) would double every
    staged row and fire a phantom unique violation."""
    t = _mk(spark, tmp_path)
    sid = t.stage(_df(spark, [(1, "a", 1), (2, "b", 2)]), mode="append")
    rules = [{"rule": "unique", "columns": ["k"]}]
    doc_path = t._staged_path(sid)
    with open(doc_path, encoding="utf-8") as fh:
        doc_backup = fh.read()
    v = t.publish_staged(sid, rules=rules)
    # crash leftover: the staged doc resurfaces after the commit
    with open(doc_path, "w", encoding="utf-8") as fh:
        fh.write(doc_backup)
    assert t.publish_staged(sid, rules=rules) == v  # no AuditFailedError
    assert t.read().count() == 2
    assert not os.path.exists(doc_path)


def test_concurrent_publish_of_same_stage_commits_once(spark, tmp_path):
    """Two publishers replaying the SAME staged id: the loser's CAS
    retry must re-probe the wap tag and stop — a second commit of the
    same append root would permanently duplicate every row."""
    from s3_sqs_data_ingestion_demo_spark.table import (
        CommitConflictError,
        ManagedTable,
    )

    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a", 1)]))
    sid = t.stage(_df(spark, [(2, "b", 2)]), mode="append")

    real = t._commit_snapshot
    state = {"raced": False}

    def racing_winner(entries, **kw):
        if not state["raced"]:
            state["raced"] = True
            # the competing publisher lands the SAME stage first...
            other = ManagedTable.load(t.spark, t.path)
            other._commit_snapshot(entries, **kw)
            # ...and this publisher loses the slot
            raise CommitConflictError("lost CAS to twin publisher")
        return real(entries, **kw)

    t._commit_snapshot = racing_winner
    t.publish_staged(sid)
    t._commit_snapshot = real

    # exactly one tagged commit; no duplicated rows
    snaps = t.snapshots()
    assert snaps.filter(f"tag = 'wap-{sid}'").count() == 1
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]


def test_discard_keeps_roots_shared_with_other_stages(spark, tmp_path):
    """GC safety net: discard never removes a root another live staged
    doc references (constructed by hand — stage roots are id-unique)."""
    t = _mk(spark, tmp_path)
    sid = t.stage(_df(spark, [(1, "a", 1)]), mode="append")
    doc = t._staged_doc(sid)
    clone = dict(doc, id="clone0000beef")
    with open(t._staged_path("clone0000beef"), "w", encoding="utf-8") as fh:
        json.dump(clone, fh)
    t.discard_staged(sid)
    root = doc["entries"][0]["root"]
    assert os.path.isdir(os.path.join(t.path, root))
    t.discard_staged("clone0000beef")
    assert not os.path.isdir(os.path.join(t.path, root))
