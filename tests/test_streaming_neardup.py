"""Streaming near-dup: minhash pairs against the growing signature
index, across micro-batches and restarts."""

import json
import os

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.streaming.neardup import (
    _batch_signatures,
    _collision_candidates,
    _index_schema,
    _read_index,
    process_near_dup_batch,
    process_near_dup_batch_table,
    start_streaming_near_dup,
)

LONG_A = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
LONG_A_NEAR = LONG_A.replace("today", "tonight")
LONG_B = "spark engines shuffle partitioned data across executors while catalyst optimizes query plans"

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_process_batch_cross_batch_pairs(spark, tmp_path):
    idx = os.path.join(str(tmp_path), "index")
    b1 = spark.createDataFrame([(1, LONG_A), (4, LONG_B)], SCHEMA)
    p1 = process_near_dup_batch(b1, idx, threshold=0.4)
    assert p1.count() == 0  # nothing similar within batch 1

    # batch 2: near-dup of doc 1 (seen in batch 1) + exact dup within batch
    b2 = spark.createDataFrame([(7, LONG_A_NEAR), (8, LONG_A_NEAR)], SCHEMA)
    p2 = {(r.doc_id_a, r.doc_id_b) for r in process_near_dup_batch(b2, idx, threshold=0.4).collect()}
    assert (1, 7) in p2  # cross-batch: new doc vs indexed doc
    assert (7, 8) in p2  # intra-batch pair still found
    assert all(a < b for a, b in p2)

    # batch 3: unrelated doc adds nothing
    b3 = spark.createDataFrame([(9, "completely different words entirely")], SCHEMA)
    assert process_near_dup_batch(b3, idx, threshold=0.4).count() == 0


def test_process_batch_retry_is_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch_id) must not double the batch's
    signatures in the index: duplicate rows would double the exploded
    shingles of those docs in every later batch, inflating n_common so
    jaccard overshoots (can exceed 1.0) and spurious pairs emit forever."""
    idx = os.path.join(str(tmp_path), "index")
    b1 = spark.createDataFrame([(1, LONG_A), (4, LONG_B)], SCHEMA)
    process_near_dup_batch(b1, idx, threshold=0.4, batch_id=0)
    # retry of the SAME batch: index rows must not duplicate, and the
    # recomputation must not pair the batch's docs against their own
    # previously-appended signatures
    p_retry = process_near_dup_batch(b1, idx, threshold=0.4, batch_id=0)
    assert p_retry.count() == 0
    index = spark.read.option("recursiveFileLookup", "true").parquet(idx)
    assert index.count() == 2  # one signature row per doc, not two

    # a later batch sees correct (non-inflated) jaccard against doc 1
    b2 = spark.createDataFrame([(7, LONG_A_NEAR)], SCHEMA)
    rows = process_near_dup_batch(b2, idx, threshold=0.4, batch_id=1).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in rows} == {(1, 7)}
    assert all(0.0 < r.jaccard <= 1.0 for r in rows)


def test_per_batch_plan_never_rebands_the_index(spark, tmp_path):
    """The scale property that keeps an unbounded stream viable: band
    keys are PERSISTED with the signatures (index layout v2), so the
    per-batch pair plan joins the batch's keys against the stored
    ``bk*`` columns — the index-side file scans read only
    (id, n_sh, bk*) and NEVER the ``h*`` signature columns.  Before
    this, every micro-batch recomputed concat_ws band keys over the
    entire grown index: O(index) compute per batch, forever."""
    idx = os.path.join(str(tmp_path), "index")
    b1 = spark.createDataFrame([(1, LONG_A), (4, LONG_B)], SCHEMA)
    process_near_dup_batch(b1, idx, threshold=0.4, batch_id=0)

    b2 = spark.createDataFrame([(7, LONG_A_NEAR)], SCHEMA)
    new = _batch_signatures(b2, "text", "doc_id", 3, 16)
    old = _read_index(spark, idx, 16).join(new.select("id"), "id", "left_anti")
    plan = _collision_candidates(new, old, 4, 10_000)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = plan._jdf.queryExecution().explainString(mode)
    # every parquet scan of the index prunes to non-signature columns
    read_schemas = [
        line for line in p.splitlines() if "ReadSchema" in line
    ]
    assert read_schemas, "expected parquet scans of the index in the plan"
    for rs in read_schemas:
        assert "h0:" not in rs and "h15:" not in rs, f"index scan reads signatures: {rs}"
    # and the stored key columns ARE what the collision join reads
    assert any("bk0:" in rs for rs in read_schemas)
    # end-to-end result over the same index is still correct
    rows = process_near_dup_batch(b2, idx, threshold=0.4, batch_id=1).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in rows} == {(1, 7)}


def test_streaming_near_dup_with_restart(spark, tmp_path):
    d = str(tmp_path)
    land = os.path.join(d, "landing"); os.makedirs(land)
    idx, pairs, ck = (os.path.join(d, x) for x in ("index", "pairs", "ck"))

    _write_batch(land, "b1.json", [(1, LONG_A), (4, LONG_B)])
    q = start_streaming_near_dup(
        spark, land, SCHEMA, idx, pairs, ck, available_now=True, threshold=0.4
    )
    q.awaitTermination(120)

    # restart with new arrivals: checkpoint replays nothing, index grows
    _write_batch(land, "b2.json", [(7, LONG_A_NEAR)])
    q = start_streaming_near_dup(
        spark, land, SCHEMA, idx, pairs, ck, available_now=True, threshold=0.4
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in spark.read.parquet(pairs).dropDuplicates(["doc_id_a", "doc_id_b"]).collect()
    }
    assert got == {(1, 7)}
    # index holds every doc's signatures exactly once
    index = spark.read.option("recursiveFileLookup", "true").parquet(idx)
    assert index.select("id").distinct().count() == 3
    assert index.count() == 3


def test_table_backed_index_stream_restart_and_compaction(spark, tmp_path):
    """index_mode="table": the signature index is a keyed MOR
    ManagedTable — cross-batch pairs work identically, retried merges
    resolve to one row per doc, and compact_every folds the deltas so
    the index stays one data root."""
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    d = str(tmp_path)
    land = os.path.join(d, "landing"); os.makedirs(land)
    idx, pairs, ck = (os.path.join(d, x) for x in ("index", "pairs", "ck"))

    _write_batch(land, "b1.json", [(1, LONG_A), (4, LONG_B)])
    kw = dict(available_now=True, threshold=0.4, index_mode="table", compact_every=2)
    q = start_streaming_near_dup(spark, land, SCHEMA, idx, pairs, ck, **kw)
    q.awaitTermination(120)

    _write_batch(land, "b2.json", [(7, LONG_A_NEAR)])
    q = start_streaming_near_dup(spark, land, SCHEMA, idx, pairs, ck, **kw)
    q.awaitTermination(120)

    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in spark.read.parquet(pairs).dropDuplicates(["doc_id_a", "doc_id_b"]).collect()
    }
    assert got == {(1, 7)}
    t = ManagedTable.load(spark, idx)
    assert t.read().count() == 3  # resolved: one signature row per doc
    assert len(t._read_manifest()) == 1  # compaction folded the deltas


def test_table_backed_retry_is_idempotent(spark, tmp_path):
    """A replayed batch merges the same ids again; MOR key resolution
    keeps one row per doc and the recomputation pairs nothing against
    the batch's own stale signatures."""
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "idx"), _index_schema(16),
        key_cols=["id"], table_type="MOR",
    )
    b1 = spark.createDataFrame([(1, LONG_A), (4, LONG_B)], SCHEMA)
    process_near_dup_batch_table(b1, t, threshold=0.4)
    assert process_near_dup_batch_table(b1, t, threshold=0.4).count() == 0
    assert t.read().count() == 2  # one resolved row per doc

    b2 = spark.createDataFrame([(7, LONG_A_NEAR)], SCHEMA)
    rows = process_near_dup_batch_table(b2, t, threshold=0.4).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in rows} == {(1, 7)}
    assert all(0.0 < r.jaccard <= 1.0 for r in rows)


def test_table_mode_delta_commits_are_few_files(spark, tmp_path):
    """Each micro-batch's MOR delta commit must land a bounded number
    of parquet files (the merge copy is coalesced), not one near-empty
    file per shuffle partition — the streaming small-files guard."""
    import glob

    d = str(tmp_path)
    land = os.path.join(d, "landing"); os.makedirs(land)
    idx, pairs, ck = (os.path.join(d, x) for x in ("index", "pairs", "ck"))
    _write_batch(land, "b1.json", [(1, LONG_A), (4, LONG_B)])
    q = start_streaming_near_dup(
        spark, land, SCHEMA, idx, pairs, ck,
        available_now=True, threshold=0.4, index_mode="table",
    )
    q.awaitTermination(120)
    for root in glob.glob(os.path.join(idx, "data", "v*")):
        n_files = len(glob.glob(os.path.join(root, "*.parquet")))
        assert 0 < n_files <= 4, (root, n_files)


def test_async_maintenance_compacts_off_critical_path(spark, tmp_path):
    """async_maintenance=True runs compaction in a daemon thread —
    results identical to inline maintenance, no lost rows, and the
    index eventually folds to one data root.  (Safe against the live
    writer: version-anchored CAS commits make the compaction recompute
    on a lost race and the merge re-commit its delta root.)"""
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    d = str(tmp_path)
    land = os.path.join(d, "landing"); os.makedirs(land)
    idx, pairs, ck = (os.path.join(d, x) for x in ("index", "pairs", "ck"))

    _write_batch(land, "b1.json", [(1, LONG_A), (4, LONG_B)])
    _write_batch(land, "b2.json", [(7, LONG_A_NEAR)])
    q = start_streaming_near_dup(
        spark, land, SCHEMA, idx, pairs, ck,
        available_now=True, threshold=0.4, index_mode="table",
        compact_every=1, async_maintenance=True,
        options={"maxFilesPerTrigger": "1"},
    )
    q.awaitTermination(120)
    t = ManagedTable.load(spark, idx)
    # the sink's table instance (which carries _sg_maint_thread) is out
    # of reach here — wait for maintenance by polling the manifest
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if len(t._read_manifest()) == 1:
            break
        time.sleep(0.5)
    assert t.read().count() == 3  # all three docs' signatures intact
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in spark.read.parquet(pairs)
        .dropDuplicates(["doc_id_a", "doc_id_b"]).collect()
    }
    assert got == {(1, 7)}


def test_remove_documents_stops_pairing_until_reingest(spark, tmp_path):
    """A removed doc must stop generating near-dup pairs (its
    signatures would pass exact verification, so skipping tombstones
    would be a correctness bug, not waste) — and a re-ingested doc
    pairs again."""
    from s3_sqs_data_ingestion_demo_spark.streaming.neardup import (
        remove_documents,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
    from s3_sqs_data_ingestion_demo_spark.streaming.neardup import (
        _index_schema,
    )

    idx = os.path.join(str(tmp_path), "index")
    tbl = ManagedTable.create(
        spark, idx, _index_schema(16), key_cols=["id"], table_type="MOR",
        properties={"write.collect-stats": "false"},
    )
    b1 = spark.createDataFrame([(1, LONG_A)], SCHEMA)
    pairs = process_near_dup_batch_table(b1, tbl, threshold=0.4)
    assert pairs.count() == 0

    remove_documents(tbl, spark.createDataFrame([(1,)], "doc_id long"))

    # near-dup of the removed doc arrives: NO pair against doc 1
    b2 = spark.createDataFrame([(7, LONG_A_NEAR)], SCHEMA)
    pairs = process_near_dup_batch_table(b2, tbl, threshold=0.4)
    assert pairs.count() == 0

    # re-ingest doc 1 (newer commit seq revives it) → a later batch
    # with a known-colliding variant pairs against it again
    b3 = spark.createDataFrame([(1, LONG_A)], SCHEMA)
    process_near_dup_batch_table(b3, tbl, threshold=0.4)
    b4 = spark.createDataFrame([(9, LONG_A_NEAR)], SCHEMA)
    pairs = process_near_dup_batch_table(b4, tbl, threshold=0.4)
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    assert (1, 9) in got  # revived doc pairs again
    assert (7, 9) in got  # never-deleted doc still pairs


def test_async_maintenance_pairs_equal_sync_under_contention(spark, tmp_path):
    """The production race: micro-batches keep merging + reading the
    index UNRESOLVED while a daemon-thread compaction commits
    concurrently (compact_every=1 maximizes overlap).  The emitted
    pair set must be IDENTICAL to the fully synchronous run — a
    compaction swapping the manifest mid-stream may change which
    roots a read scans, never which rows exist."""
    docs = [
        (1, LONG_A), (2, LONG_B), (3, LONG_A_NEAR),
        (4, LONG_A + " again"), (5, LONG_B + " extended"),
        (6, LONG_A_NEAR + " more"), (7, "entirely unrelated words here"),
        (8, LONG_A), (9, LONG_B), (10, LONG_A_NEAR),
    ]

    def run(sub, async_flag):
        d = os.path.join(str(tmp_path), sub)
        land = os.path.join(d, "landing"); os.makedirs(land)
        idx, pairs, ck = (os.path.join(d, x) for x in ("index", "pairs", "ck"))
        import time as _t

        now = _t.time()
        for i, row in enumerate(docs):
            _write_batch(land, f"b{i}.json", [row])
            # the file source orders micro-batches by MTIME; identical
            # mtimes make batch order (and thus which cross-batch pairs
            # survive the canonical id_a < id_b filter) nondeterministic
            # — pin strictly increasing mtimes so both runs process the
            # stream in doc-id order, the module's documented contract
            os.utime(
                os.path.join(land, f"b{i}.json"), (now - 100 + i, now - 100 + i)
            )
        q = start_streaming_near_dup(
            spark, land, SCHEMA, idx, pairs, ck,
            available_now=True, threshold=0.4, index_mode="table",
            compact_every=1, async_maintenance=async_flag,
            options={"maxFilesPerTrigger": "1"},
        )
        q.awaitTermination(300)
        tbl = getattr(q, "_sg_index_table", None)
        th = getattr(tbl, "_sg_maint_thread", None) if tbl else None
        if th is not None:
            th.join(timeout=120)
        assert tbl is not None and getattr(tbl, "_sg_maint_error", None) is None
        return {
            (r.doc_id_a, r.doc_id_b)
            for r in spark.read.parquet(pairs)
            .dropDuplicates(["doc_id_a", "doc_id_b"]).collect()
        }

    got_sync = run("sync", False)
    got_async = run("async", True)
    assert got_async == got_sync
    assert got_sync  # non-trivial: the corpus has real near-dups


def test_entries_disjoint_on_id_gates_seq_resolution(spark, tmp_path):
    """Monotone-id merges leave pairwise-disjoint per-entry id stats
    (fast path: no seq resolution); re-merging an existing id overlaps
    ranges and must flip the gate off (conservative fallback)."""
    from s3_sqs_data_ingestion_demo_spark.streaming.neardup import (
        _entries_disjoint_on_id,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    idx = os.path.join(str(tmp_path), "index")
    tbl = ManagedTable.create(
        spark, idx, _index_schema(16), key_cols=["id"], table_type="MOR",
    )
    b1 = spark.createDataFrame([(1, LONG_A), (2, LONG_B)], SCHEMA)
    process_near_dup_batch_table(b1, tbl, threshold=0.4)
    assert _entries_disjoint_on_id(tbl) is True
    b2 = spark.createDataFrame([(3, LONG_A_NEAR)], SCHEMA)
    process_near_dup_batch_table(b2, tbl, threshold=0.4)
    assert _entries_disjoint_on_id(tbl) is True
    # re-ingest id 2: its entry range [2,2] overlaps the first entry
    b3 = spark.createDataFrame([(2, LONG_B)], SCHEMA)
    process_near_dup_batch_table(b3, tbl, threshold=0.4)
    assert _entries_disjoint_on_id(tbl) is False
    # a table with stats disabled can never prove disjointness
    tbl2 = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "i2"), _index_schema(16),
        key_cols=["id"], table_type="MOR",
        properties={"write.collect-stats": "false"},
    )
    process_near_dup_batch_table(b1, tbl2, threshold=0.4)
    assert _entries_disjoint_on_id(tbl2) is False


def test_phase_record_carries_path_provenance(spark, tmp_path):
    """The phase record must say which path each batch took — a bench
    artifact can then attribute a pairs-phase delta to fallback
    contamination (or rule it out) without appealing to NOTES."""
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    idx = os.path.join(str(tmp_path), "index")
    tbl = ManagedTable.create(
        spark, idx, _index_schema(16), key_cols=["id"], table_type="MOR",
    )
    timings: dict = {}
    b1 = spark.createDataFrame([(1, LONG_A), (2, LONG_B)], SCHEMA)
    process_near_dup_batch_table(b1, tbl, threshold=0.4, timings=timings)
    b2 = spark.createDataFrame([(3, LONG_A_NEAR)], SCHEMA)
    process_near_dup_batch_table(b2, tbl, threshold=0.4, timings=timings)
    assert timings.get("batches_fast_path") == 2
    assert "batches_seq_fallback" not in timings
    # re-ingesting an existing id still rides the fast path ITSELF
    # (the gate reads the pre-merge index, and the batch's own ids are
    # anti-joined out) — but its merge overlaps the entry ranges, so
    # the NEXT batch must record the fallback
    b3 = spark.createDataFrame([(2, LONG_B)], SCHEMA)
    process_near_dup_batch_table(b3, tbl, threshold=0.4, timings=timings)
    assert timings.get("batches_fast_path") == 3
    b4 = spark.createDataFrame([(4, LONG_A)], SCHEMA)
    process_near_dup_batch_table(b4, tbl, threshold=0.4, timings=timings)
    assert timings.get("batches_fast_path") == 3
    assert timings.get("batches_seq_fallback") == 1
    for phase in ("signatures", "pairs", "index_write"):
        assert phase in timings
