"""Takedown cascade through published CDC-export windows (VERDICT r11
#2): ``job.forget_keys`` on a source with declared ``cdc_exports`` must
remove the forgotten payloads from RETAINED window directories, not
just from live rows — an unpruned export otherwise serves them forever
and every replica bootstrap re-materializes them.

Pinned: no forgotten payload survives anywhere under the export dir
(insert/pre/post rows dropped, delete rows kept with nulled payloads);
replay == live table after the scrub; untouched windows are not
rewritten; the delete window published by the takedown propagates the
removal to a previously-synced replica; journaled window-swap crash
recovery (roll forward AND roll back) is SCRUB-ROLE-ONLY — readers
refuse loudly with the re-run remedy (they cannot tell a crashed swap
from a live one), and re-running forget_keys/scrub_export_windows
heals it."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
    _FORGET_JOURNAL,
    create_change_export,
    export_changes,
    list_export_windows,
    read_change_export,
    replay_to_state,
    scrub_export_windows,
    sync_from_export,
)
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


def _cfg(tmp):
    return JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {
                    "header": "true", "sep": "\t", "inferSchema": "true",
                },
            },
            "output_config": {
                "table_path": f"{tmp}/tbl",
                "mode": "merge",
                "table_type": "MOR",
                "key_columns": ["id"],
                "order_column": "seq",
                "cdc_delete_values": ["D"],
                "cdc_exports": [{"path": f"{tmp}/export"}],
            },
        }
    )


def _mk_table(spark, tmp):
    return ManagedTable.create(
        spark, f"{tmp}/tbl", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )


def _window_dirs(ex):
    return sorted(
        os.path.join(ex, n) for n in os.listdir(ex) if n.startswith("w_")
    )


def _raw_rows(spark, ex):
    """Every row in every data window, read RAW (per-directory, no
    reconciliation) — the forensic view a compliance audit takes."""
    out = []
    for d in _window_dirs(ex):
        if any(f.endswith(".parquet") for f in os.listdir(d)):
            out += spark.read.parquet(d).collect()
    return out


def _state(tbl):
    return sorted(
        (r.id, r.grp, r.v)
        for r in tbl.read().select("id", "grp", "v").collect()
    )


def test_forget_scrubs_published_windows(spark, tmp_path):
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d)
    batches = [
        [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I"), (3, "b", 7, 1, "I")],
        [(1, "b", 99, 2, "U"), (4, "c", 4, 2, "I")],
        [(3, "b", 8, 3, "U")],
    ]
    for i, rows in enumerate(batches):
        b = f"{d}/b{i}.csv"
        _write_csv(b, rows)
        J.process_files(spark, cfg, [b])
    ex = f"{d}/export"
    # window 3 holds only id=3's update — its directory must survive
    # UNREWRITTEN when we forget id=1 (probe-then-rewrite, not a blind
    # full rewrite)
    untouched = _window_dirs(ex)[-1]
    before_files = sorted(os.listdir(untouched))
    before_mtime = os.path.getmtime(untouched)
    pre_rows = {
        (r.id, r.seq, r._change_type, r._export_hi)
        for r in _raw_rows(spark, ex)
        if r.id != 1
    }

    J.forget_keys(spark, cfg, spark.createDataFrame([(1,)], "id int"))

    tbl = ManagedTable.load(spark, f"{d}/tbl")
    assert _state(tbl) == [(2, "a", 5), (3, "b", 8), (4, "c", 4)]
    # 1) no forgotten payload anywhere under the export dir
    for r in _raw_rows(spark, ex):
        if r.id == 1:
            assert r._change_type == "delete"
            assert r.grp is None and r.v is None and r.seq is None
    # 2) every other row byte-identical (same identity/stamps/types)
    post_rows = {
        (r.id, r.seq, r._change_type, r._export_hi)
        for r in _raw_rows(spark, ex)
        if r.id != 1
    }
    assert post_rows == pre_rows
    # 3) the untouched window was not rewritten
    assert sorted(os.listdir(untouched)) == before_files
    assert os.path.getmtime(untouched) == before_mtime
    # 4) replay over the scrubbed export equals the live table
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert sorted(
        (r.id, r.grp, r.v) for r in replayed.select("id", "grp", "v").collect()
    ) == _state(tbl)
    # 5) the chain is intact: a tail from any retained cursor works
    ws = list_export_windows(ex)
    assert read_change_export(spark, ex, since=ws[0][1]).count() >= 0
    # 6) re-running the forget is a no-op for the export (idempotent)
    J.forget_keys(spark, cfg, spark.createDataFrame([(1,)], "id int"))
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert sorted(
        (r.id, r.grp, r.v) for r in replayed.select("id", "grp", "v").collect()
    ) == _state(ManagedTable.load(spark, f"{d}/tbl"))


def test_forget_delete_window_propagates_to_lagging_replica(
    spark, tmp_path
):
    """A replica synced BEFORE the takedown holds the rows; the delete
    window the takedown publishes removes them on its next sync — and
    the tail it absorbs carries no payload for the forgotten key."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d)
    _write_csv(f"{d}/b0.csv", [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I")])
    J.process_files(spark, cfg, [f"{d}/b0.csv"])
    rep = ManagedTable.create(
        spark, f"{d}/replica", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    ex = f"{d}/export"
    sync_from_export(spark, ex, rep)
    assert (1, "a", 10) in _state(rep)
    J.forget_keys(spark, cfg, spark.createDataFrame([(1,)], "id int"))
    # replica still holds it (documented boundary) until the next sync
    assert (1, "a", 10) in _state(rep)
    sync_from_export(spark, ex, rep)
    assert _state(rep) == [(2, "a", 5)]
    # a FRESH replica bootstrapping post-takedown never sees the key
    rep2 = ManagedTable.create(
        spark, f"{d}/replica2", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    sync_from_export(spark, ex, rep2)
    assert _state(rep2) == [(2, "a", 5)]


def _mk_export(spark, tmp):
    src = ManagedTable.create(
        spark, f"{tmp}/src", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    ex = f"{tmp}/export"
    create_change_export(src, ex)
    src.append(
        spark.createDataFrame(
            [(1, "a", 1, 1, "I"), (2, "b", 2, 1, "I")], SCHEMA
        )
    )
    export_changes(src, ex)
    src.merge(spark.createDataFrame([(1, "c", 3, 2, "U")], SCHEMA))
    export_changes(src, ex)
    return src, ex


def test_scrub_without_hits_rewrites_nothing(spark, tmp_path):
    _, ex = _mk_export(spark, str(tmp_path))
    assert (
        scrub_export_windows(
            spark, ex, spark.createDataFrame([(99,)], "id int"), ["id"]
        )
        == 0
    )


def test_scrub_refuses_null_ids(spark, tmp_path):
    _, ex = _mk_export(spark, str(tmp_path))
    ids = spark.createDataFrame([(None,)], "id int")
    with pytest.raises(ValueError, match="null key"):
        scrub_export_windows(spark, ex, ids, ["id"])


def test_scrub_crash_recovery_roll_forward_and_back(spark, tmp_path):
    """Simulated crashes at both vulnerable points of the window swap:
    (a) between the two renames (target missing, tmp holds the
    rewrite) — a READER must NOT repair it (it cannot tell a crashed
    swap from a live one); it retries briefly, then raises naming the
    re-run remedy, and the next scrub invocation rolls the swap
    forward; (b) after the journal but before the first rename
    (target intact) — recovery rolls back, and a re-run scrub redoes
    the window."""
    d = str(tmp_path)
    _, ex = _mk_export(spark, d)
    ws = list_export_windows(ex)
    lo, hi = ws[0]
    target = os.path.join(ex, f"w_{lo}_{hi}")
    # (a) roll forward: stage a rewrite in tmp, journal, displace the
    # original — crash
    tmp_name, trash_name = f"_tmp_f_{lo}_{hi}_t", f"_trash_f_{lo}_{hi}_t"
    shutil.copytree(target, os.path.join(ex, tmp_name))
    with open(os.path.join(ex, _FORGET_JOURNAL), "w") as fh:
        json.dump(
            {"name": f"w_{lo}_{hi}", "tmp": tmp_name, "trash": trash_name},
            fh,
        )
    os.rename(target, os.path.join(ex, trash_name))
    # the chain is broken: readers refuse LOUDLY (with the remedy),
    # never repair — a live scrubber mid-swap would be racing them
    with pytest.raises(ValueError, match="takedown scrub"):
        read_change_export(spark, ex)
    assert os.path.exists(os.path.join(ex, _FORGET_JOURNAL))
    # the scrub role's next invocation recovers (roll forward), then
    # proceeds with its own work
    scrub_export_windows(
        spark, ex, spark.createDataFrame([(99,)], "id int"), ["id"]
    )
    assert read_change_export(spark, ex).count() > 0
    assert os.path.exists(target)
    assert not os.path.exists(os.path.join(ex, _FORGET_JOURNAL))
    assert not os.path.exists(os.path.join(ex, trash_name))
    # (b) roll back: journal + tmp exist, target intact — crash before
    # the first rename
    shutil.copytree(target, os.path.join(ex, tmp_name))
    with open(os.path.join(ex, _FORGET_JOURNAL), "w") as fh:
        json.dump(
            {"name": f"w_{lo}_{hi}", "tmp": tmp_name, "trash": trash_name},
            fh,
        )
    n = scrub_export_windows(
        spark, ex, spark.createDataFrame([(1,)], "id int"), ["id"]
    )
    assert n >= 1  # recovery rolled back, then the scrub redid it
    assert not os.path.exists(os.path.join(ex, tmp_name))
    assert not os.path.exists(os.path.join(ex, _FORGET_JOURNAL))
    for r in spark.read.parquet(target).collect():
        if r.id == 1:
            assert r._change_type == "delete" and r.v is None


def test_forget_rerun_recovers_crashed_scrub(spark, tmp_path):
    """Review finding (r12 pass 2): forget_keys re-run must recover a
    prior run's crashed window swap BEFORE its export_changes cursor
    probe — which is a reader and would otherwise refuse on the broken
    chain, deadlocking the documented remedy on itself."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d)
    _write_csv(f"{d}/b0.csv", [(1, "a", 10, 1, "I"), (2, "b", 5, 1, "I")])
    J.process_files(spark, cfg, [f"{d}/b0.csv"])
    ex = f"{d}/export"
    ws = list_export_windows(ex)
    lo, hi = ws[0]
    target = os.path.join(ex, f"w_{lo}_{hi}")
    # simulate a scrub crashed between its two renames
    tmp_name, trash_name = f"_tmp_f_{lo}_{hi}_t", f"_trash_f_{lo}_{hi}_t"
    shutil.copytree(target, os.path.join(ex, tmp_name))
    with open(os.path.join(ex, _FORGET_JOURNAL), "w") as fh:
        json.dump(
            {"name": f"w_{lo}_{hi}", "tmp": tmp_name, "trash": trash_name},
            fh,
        )
    os.rename(target, os.path.join(ex, trash_name))
    # the documented remedy: re-run the forget — it must heal the
    # swap, publish its delete window, and scrub
    J.forget_keys(spark, cfg, spark.createDataFrame([(1,)], "id int"))
    assert not os.path.exists(os.path.join(ex, _FORGET_JOURNAL))
    for r in _raw_rows(spark, ex):
        if r.id == 1:
            assert r._change_type == "delete" and r.v is None
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert sorted((r.id, r.v) for r in replayed.collect()) == [(2, 5)]


def test_scrub_drops_whole_window_to_marker(spark, tmp_path):
    """A window whose EVERY row belongs to forgotten keys (all
    inserts) degrades to an empty/marker-like directory the read path
    already handles — and replay still matches."""
    d = str(tmp_path)
    src = ManagedTable.create(
        spark, f"{d}/src", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(spark.createDataFrame([(1, "a", 1, 1, "I")], SCHEMA))
    export_changes(src, ex)
    src.append(spark.createDataFrame([(2, "b", 2, 1, "I")], SCHEMA))
    export_changes(src, ex)
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    export_changes(src, ex)
    scrub_export_windows(
        spark, ex, spark.createDataFrame([(1,)], "id int"), ["id"]
    )
    rows = replay_to_state(read_change_export(spark, ex), ["id"]).collect()
    assert [(r.id, r.grp, r.v) for r in rows] == [(2, "b", 2)]
    # the forgotten key's only trace anywhere is its nulled tombstone
    for dir_ in _window_dirs(ex):
        if not any(f.endswith(".parquet") for f in os.listdir(dir_)):
            continue
        for r in spark.read.parquet(dir_).collect():
            if r.id == 1:
                assert r._change_type == "delete"
                assert r.grp is None and r.v is None and r.seq is None
