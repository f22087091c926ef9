"""Round-12 export-surface hardening: cadence-pairing validation
(retention + binpack never compose — ADVICE r11 medium), the partial-
bootstrap refusal (an export anchored mid-history cannot present a
full table — ADVICE r11 low), the latest_wins pairing enforcement off
the anchor's recorded source policy (ADVICE r11 low), and fan-out
replication — N consumers on one export with producer-side retention
capped at the slowest registered consumer cursor (VERDICT r11 #4)."""

import logging
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
    _APPLY_KEY,
    apply_changes,
    create_change_export,
    drop_consumer,
    export_changes,
    list_export_windows,
    maintain_export_cadences,
    record_consumer_cursor,
    sync_from_export,
    validate_export_cadences,
)
from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    ExpiredCursorError,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _mk(spark, tmp, name, **kw):
    kw.setdefault("key_cols", ["id"])
    kw.setdefault("order_column", "seq")
    kw.setdefault("table_type", "MOR")
    return ManagedTable.create(spark, f"{tmp}/{name}", SCHEMA, **kw)


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, v=v, seq=s) for i, v, s in rows], SCHEMA
    )


def _state(tbl):
    return sorted((r.id, r.v) for r in tbl.read().select("id", "v").collect())


# ---------------------------------------------------- cadence pairing


def test_cadence_pairing_refused_everywhere(spark, tmp_path):
    with pytest.raises(ValueError, match="cannot both be set"):
        validate_export_cadences(3, 5)
    with pytest.raises(ValueError, match="cannot both be set"):
        maintain_export_cadences(
            spark, str(tmp_path), keep_last_windows=5, coalesce_after=2
        )
    with pytest.raises(ValueError, match="cannot both be set"):
        JobConfig.from_dict(
            {
                "input_config": {},
                "output_config": {
                    "table_path": "/x",
                    "cdc_exports": [
                        {
                            "path": "/e",
                            "keep_last_windows": 2,
                            "coalesce_after": 4,
                        }
                    ],
                },
            }
        )


def test_streaming_export_refuses_cadence_pairing(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.streaming import (
        start_streaming_cdc_export,
    )

    src = _mk(spark, str(tmp_path), "src")
    with pytest.raises(ValueError, match="cannot both be set"):
        start_streaming_cdc_export(
            spark, str(tmp_path), SCHEMA, src, f"{tmp_path}/ex",
            keep_last_windows=1, coalesce_after=2,
        )


# ------------------------------------------------- partial bootstrap


def test_fresh_replica_refuses_partial_bootstrap(spark, tmp_path):
    d = str(tmp_path)
    src, rep = _mk(spark, d, "src"), _mk(spark, d, "rep")
    src.append(_rows(spark, [(1, 1, 1), (2, 2, 1)]))  # pre-provision rows
    ex = f"{d}/export"
    create_change_export(src, ex)  # consume_from=None: anchored at v2
    src.merge(_rows(spark, [(3, 3, 2)]))
    export_changes(src, ex)
    with pytest.raises(ExpiredCursorError, match="PARTIAL"):
        sync_from_export(spark, ex, rep)
    # nothing applied, no cursor written
    assert _APPLY_KEY not in rep.meta.properties
    # explicit opt-in: absorbs post-provision changes only
    cur = sync_from_export(spark, ex, rep, allow_partial_bootstrap=True)
    assert _state(rep) == [(3, 3)]
    assert int(rep.meta.properties[_APPLY_KEY]) == cur
    # steady state afterwards needs no flag (the cursor exists)
    src.merge(_rows(spark, [(4, 4, 2)]))
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    assert _state(rep) == [(3, 3), (4, 4)]


# --------------------------------------------- latest_wins pairing


def test_latest_wins_replica_refuses_mispaired_source(spark, tmp_path):
    d = str(tmp_path)
    # unconditional MOR source: a latest_wins replica cannot mirror it
    src = _mk(spark, d, "src")  # default policy: unconditional
    rep = _mk(spark, d, "rep", merge_policy="latest_wins")
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, 1, 1)]))
    export_changes(src, ex)
    with pytest.raises(ValueError, match="latest_wins replica"):
        sync_from_export(spark, ex, rep)
    # an unconditional replica mirrors the same export fine
    rep2 = _mk(spark, d, "rep2")
    sync_from_export(spark, ex, rep2)
    assert _state(rep2) == [(1, 1)]


def test_latest_wins_replica_refuses_cow_source(spark, tmp_path):
    d = str(tmp_path)
    src = ManagedTable.create(
        spark, f"{d}/src", SCHEMA, key_cols=["id"], order_column="seq",
        table_type="COW", merge_policy="latest_wins",
    )
    rep = _mk(spark, d, "rep", merge_policy="latest_wins")
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, 1, 1)]))
    export_changes(src, ex)
    with pytest.raises(ValueError, match="latest_wins MOR"):
        sync_from_export(spark, ex, rep)


def test_bare_apply_warns_on_latest_wins_target(spark, tmp_path, caplog):
    rep = _mk(spark, str(tmp_path), "rep", merge_policy="latest_wins")
    tail = spark.createDataFrame(
        [(1, 1, 1, "insert", 1, 2)],
        T.StructType(
            list(SCHEMA.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_export_lo", T.IntegerType()),
                T.StructField("_export_hi", T.IntegerType()),
            ]
        ),
    )
    with caplog.at_level(
        logging.WARNING,
        logger="s3_sqs_data_ingestion_demo_spark.operators.cdc_export",
    ):
        apply_changes(tail, rep, 2)
    assert any("latest_wins replica" in r.message for r in caplog.records)
    assert _state(rep) == [(1, 1)]


def test_legacy_anchor_without_policy_fields_degrades_to_warning(
    spark, tmp_path, caplog
):
    """A pre-r12 anchor lacks source_merge_policy: sync must not crash
    on it — the pairing degrades to apply_changes's warning."""
    import json

    d = str(tmp_path)
    src = _mk(spark, d, "src")
    rep = _mk(spark, d, "rep", merge_policy="latest_wins")
    ex = f"{d}/export"
    create_change_export(src, ex)
    # strip the r12 fields, simulating a legacy anchor
    ap = os.path.join(ex, "_anchor.json")
    with open(ap) as fh:
        anchor = json.load(fh)
    anchor.pop("source_merge_policy")
    anchor.pop("source_table_type")
    with open(ap, "w") as fh:
        json.dump(anchor, fh)
    src.append(_rows(spark, [(1, 1, 1)]))
    export_changes(src, ex)
    with caplog.at_level(
        logging.WARNING,
        logger="s3_sqs_data_ingestion_demo_spark.operators.cdc_export",
    ):
        sync_from_export(spark, ex, rep)
    assert any("latest_wins replica" in r.message for r in caplog.records)
    assert _state(rep) == [(1, 1)]


# ----------------------------------------------------------- fan-out


def test_two_replicas_with_lagging_consumer(spark, tmp_path):
    """One export, two registered consumers at different speeds:
    retention (keep_last_windows=1) must prune at the SLOWEST
    registered cursor, so the lagging replica's next sync still finds
    every window it needs — never ExpiredCursorError."""
    d = str(tmp_path)
    src = _mk(spark, d, "src")
    fast, slow = _mk(spark, d, "fast"), _mk(spark, d, "slow")
    ex = f"{d}/export"
    create_change_export(src, ex)
    # cycle 1: both consume
    src.append(_rows(spark, [(1, 1, 1)]))
    export_changes(src, ex)
    sync_from_export(spark, ex, fast, consumer_id="fast")
    sync_from_export(spark, ex, slow, consumer_id="slow")
    # cycles 2..4: only the fast replica keeps up; retention runs each
    # cycle and must hold every window above the slow cursor
    for i in range(2, 5):
        src.merge(_rows(spark, [(i, i, i)]))
        export_changes(src, ex)
        sync_from_export(spark, ex, fast, consumer_id="fast")
        maintain_export_cadences(spark, ex, keep_last_windows=1)
    assert len(list_export_windows(ex)) >= 3  # slow's tail retained
    # the lagging replica catches up cleanly, then retention shrinks
    sync_from_export(spark, ex, slow, consumer_id="slow")
    assert _state(slow) == _state(fast) == _state(src)
    maintain_export_cadences(spark, ex, keep_last_windows=1)
    assert len(list_export_windows(ex)) == 1


def test_unregistered_consumers_keep_count_based_retention(
    spark, tmp_path
):
    """Without a registry, keep_last_windows prunes purely by count —
    the documented keep-up-or-expire trade is unchanged."""
    d = str(tmp_path)
    src = _mk(spark, d, "src")
    ex = f"{d}/export"
    create_change_export(src, ex)
    for i in range(1, 5):
        src.append(_rows(spark, [(i, i, 1)]))
        export_changes(src, ex)
        maintain_export_cadences(spark, ex, keep_last_windows=2)
    assert len(list_export_windows(ex)) == 2


def test_drop_consumer_unpins_retention(spark, tmp_path):
    d = str(tmp_path)
    src = _mk(spark, d, "src")
    ex = f"{d}/export"
    create_change_export(src, ex)
    for i in range(1, 5):
        src.append(_rows(spark, [(i, i, 1)]))
        export_changes(src, ex)
    record_consumer_cursor(ex, "dead", 2)  # a decommissioned replica
    maintain_export_cadences(spark, ex, keep_last_windows=1)
    kept = list_export_windows(ex)
    assert kept[0][0] <= 2  # windows above cursor 2 all retained
    assert len(kept) >= 3
    drop_consumer(ex, "dead")
    maintain_export_cadences(spark, ex, keep_last_windows=1)
    assert len(list_export_windows(ex)) == 1
    drop_consumer(ex, "dead")  # idempotent


def test_consumer_id_validation(tmp_path):
    with pytest.raises(ValueError, match="plain name"):
        record_consumer_cursor(str(tmp_path), "a/b", 1)
    with pytest.raises(ValueError, match="plain name"):
        record_consumer_cursor(str(tmp_path), ".hidden", 1)
    with pytest.raises(ValueError, match="plain name"):
        record_consumer_cursor(str(tmp_path), "", 1)
