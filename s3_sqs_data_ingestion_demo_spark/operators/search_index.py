"""Incremental BM25 search index over ManagedTables.

``bm25_topk`` (search.py) tokenizes the corpus per query — right for
one-off audits, wrong when the corpus grows continuously and is
queried often.  This module persists the inverted index the way a
search service does, as two ManagedTables at ``path``:

- ``postings``: (term, doc_id, tf, dl) keyed on (term, doc_id) — MOR
  merge deltas, so absorbing a document batch is O(batch postings)
  regardless of index size, and a foreachBatch RETRY of the same
  batch upserts identical rows instead of duplicating them.
- ``stats``: append-only per-batch (n_docs, total_dl) rows — corpus
  totals are additive, so the query-time stats read sums a
  batches-sized (compactable) relation instead of re-scanning the
  corpus.  Appends carry a commit TAG: a replayed batch whose tag is
  already committed is skipped (`has_commit_tag`), which keeps the
  additive totals exactly-once even under at-least-once delivery —
  the same idempotency recipe as streaming/ingest.py (SURVEY §2.4 T5).

Contract: documents are append-only (each doc_id indexed once) — the
natural corpus-ingest shape.  Re-indexing a CHANGED document requires
removing it first (``remove_document``: tombstones every (term, doc)
posting of the old version — O(doc terms) via one term-pruned read)
or a rebuild; merging new text over old would leave stale postings
for terms the new version dropped.

Query path (``bm25_index_topk``): filter postings to the query terms
(parquet predicate pushdown on ``term``; after
``compact(cluster_by=["term"])`` per-file term ranges are tight and
manifest stats additionally skip whole data roots), sum the stats table, then the EXACT same integer
BM25 arithmetic as the ad-hoc path (search.bm25_score_tf) — scores
are bit-identical between the two, which the tests pin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ManagedTable
from .search import bm25_score_tf
from .text import tokens

_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.LongType()),
    ]
)

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_dl", T.LongType()),
    ]
)


# How many recent stats snapshots the replay-idempotency probe scans:
# a redelivered batch is at most this many commits old (crash recovery
# replays the tail of the stream, never ancient history), and
# compact_search_index expires history beyond it.
_TAG_REPLAY_WINDOW = 64


def _postings_path(path: str) -> str:
    return os.path.join(path, "postings")


def _stats_path(path: str) -> str:
    return os.path.join(path, "stats")


def _doc_postings(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, 1-row batch stats) for a document batch — one
    tokenize pass feeds both."""
    # NULL text must behave like empty text: tokens(NULL) is NULL and
    # size(NULL) is -1/NULL, which would corrupt total_dl and skip the
    # sentinel — coalesce the column before tokenizing
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        toks.alias("tk"),
    )
    real = (
        base.select("doc_id", "dl", F.explode("tk").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )
    # SENTINEL posting (term "", tf 0) for token-less documents: the
    # stats row counts EVERY batch doc (ad-hoc scorer parity), so
    # removal must be able to find empty docs too — without a posting
    # they would be permanently stuck in the additive n_docs.  The
    # whitespace tokenizer never emits "", and the query path filters
    # the sentinel out explicitly.
    empty = base.filter(F.size("tk") == 0).select(
        F.lit("").alias("term"), "doc_id",
        F.lit(0).cast("long").alias("tf"), "dl",
    )
    postings = real.unionByName(empty)
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_dl"),
    )
    return postings, stats


def create_search_index(
    spark: SparkSession, path: str
) -> tuple[ManagedTable, ManagedTable]:
    pt = ManagedTable.create_if_absent(
        spark,
        _postings_path(path),
        _POSTINGS_SCHEMA,
        key_cols=["term", "doc_id"],
        table_type="MOR",
        properties={
            "write.max-delta-files": "8",
            # postings are term-clustered by compaction, so doc_id is
            # scattered across every file: removals/takedowns (point
            # lookups BY doc_id) can't ride min/max stats.  Parquet
            # blooms on doc_id give them row-group skips instead.
            "write.bloom-columns": "doc_id",
            "write.bloom-ndv": "100000",
        },
    )
    st = ManagedTable.create_if_absent(
        spark, _stats_path(path), _STATS_SCHEMA,
        properties={"write.max-delta-files": "1"},
    )
    return pt, st


def load_search_index(
    spark: SparkSession, path: str
) -> tuple[ManagedTable, ManagedTable]:
    return (
        ManagedTable.load(spark, _postings_path(path)),
        ManagedTable.load(spark, _stats_path(path)),
    )


def append_to_search_index(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_tag: str | None = None,
    replace: bool = False,
) -> None:
    """Index a document batch incrementally.  ``batch_tag`` makes the
    ADDITIVE stats append exactly-once under redelivery: a tag already
    present on a committed snapshot skips the whole call (the postings
    merge would have been an idempotent upsert anyway — skipping saves
    the work and keeps totals correct).  The tag probe walks manifests
    newest-first with a bounded window (crash-redelivery only ever
    replays RECENT batches), so the per-batch cost stays O(window),
    not O(total snapshots).

    ``replace=True`` is the MERGE-shaped feed: batch ids already in
    the index are fully un-indexed (old postings tombstoned), so an
    updated document never leaves stale postings for terms its new
    version dropped.  Replay-safe by ORDERING: one NET stats row
    (batch increment minus victim decrement) commits FIRST under
    ``batch_tag``, then the victim tombstone, then the postings merge.
    Whatever step a crash interrupts, the redelivered batch heals to
    the clean-run state: the tag skips the second stats commit, and
    the tombstone + merge are re-run idempotently from the CURRENT
    live victims (a separate per-call removal tag would break on
    redelivery — the postings version advances with the merge, so the
    re-remove would decrement a second time; that was a real
    double-decrement hole).  Between the stats commit and the merge,
    readers see totals ahead of postings — the same transient window
    every stats-first commit in this module has (see
    ``remove_documents_bulk``)."""
    pt, st = create_search_index(spark, path)
    tag_done = batch_tag is not None and st.has_commit_tag(
        batch_tag, max_scan=_TAG_REPLAY_WINDOW
    )
    if not replace and tag_done:
        return
    # ONE tokenize pass per batch: postings materialize eagerly and
    # every stats aggregate below derives from the checkpointed frame
    # (the sentinel rows make it total: each doc has ≥1 posting)
    postings, _ = _doc_postings(docs, text_col, id_col)
    postings = postings.localCheckpoint(eager=True)
    if postings.isEmpty():
        # zero docs (e.g. a pure-delete CDC batch whose upsert side is
        # empty): no postings, no victims, a (0, 0) stats delta — the
        # old path still COMMITTED that zero stats row (one junk row +
        # one commit per delete-only batch).  Nothing to protect with
        # the tag either: a redelivered empty batch changes nothing.
        # (Sentinel rows make postings non-empty for any real doc, so
        # empty postings ⇔ empty batch.)
        return
    stats = _doc_stats(postings)
    if not replace:
        pt.merge(postings)
        st.append(stats, tag=batch_tag)
        return
    # batch ids off the PINNED postings frame, not the source docs:
    # the sentinel rows make postings total over the batch's docs, so
    # the id sets are identical — and the victim scan below then costs
    # two jobs over a checkpoint instead of two re-scans of the raw
    # batch (measured ~2× the whole victim step on a parquet batch)
    keys = postings.select("doc_id").distinct()
    if not pt._manifest_at(pt._current_version()):
        # bootstrap fast path (metadata-only probe): nothing is indexed
        # yet, so there are no victims by construction — skip the
        # victim scan/pin, the net-stats crossJoin, and the tombstone
        # commit entirely.  The crash contract is unchanged: stats
        # commit first (tagged), then the merge.
        victims = None
    else:
        # victims: every live posting of the batch's ids, as of NOW.
        # On a redelivery this can include rows the crashed attempt
        # merged — tombstoning them is safe because the merge below
        # re-lands them with a newer commit seq (re-inserts survive
        # tombstones).
        victims = _victim_postings(pt, keys)
    if not tag_done:
        if victims is None:
            st.append(stats, tag=batch_tag)
        else:
            # tag not committed => no prior attempt reached the merge
            # (the stats row commits before it), so the victims are
            # purely pre-batch rows and their per-doc dl is the dl the
            # stats counted when they were indexed.  The net row is a
            # crossJoin of two 1-row aggregates over
            # already-materialized frames — no driver collect.
            vagg = _doc_stats(victims).select(
                F.col("n_docs").alias("_vn"),
                F.col("total_dl").alias("_vdl"),
            )
            net = stats.crossJoin(vagg).select(
                (F.col("n_docs") - F.col("_vn")).cast("long")
                .alias("n_docs"),
                (F.col("total_dl") - F.col("_vdl")).cast("long")
                .alias("total_dl"),
            )
            st.append(net, tag=batch_tag)
    if victims is not None:
        pt.delete_keys(victims.select("term", "doc_id"))
    pt.merge(postings)


def _doc_stats(postings: DataFrame) -> DataFrame:
    """1-row (n_docs, total_dl) derived from a postings frame — exact
    because the sentinel rows make postings TOTAL over the batch's
    docs (every doc has ≥1 posting carrying its dl)."""
    return (
        postings.groupBy("doc_id").agg(F.max("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_dl"),
        )
    )


def _victim_postings(pt: ManagedTable, keys: DataFrame) -> DataFrame:
    """Live postings of the given doc_ids, MATERIALIZED once — and
    manifest-pruned by the batch's id RANGE before the semi-join:
    ``doc_id`` is part of the postings key, so per-entry (min, max)
    stats skip every data root that cannot hold any batch id.  For the
    dominant shapes this collapses the scan entirely: a monotone-id
    corpus's insert batches carry ids above every indexed entry
    (victims resolve to an empty scan, not an O(index) pass), and
    update batches open only the entries that ever saw those ids.
    The range collect is one 2-value row — O(1) driver-side."""
    lo_hi = keys.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    if lo_hi[0] is None:
        return pt.spark.createDataFrame([], pt.meta.schema)
    return (
        pt.read_where("doc_id", lo=lo_hi[0], hi=lo_hi[1])
        .join(keys, "doc_id", "left_semi")
        .localCheckpoint(eager=True)
    )


def remove_documents_bulk(
    spark: SparkSession, path: str, ids: DataFrame, id_col: str = "doc_id"
) -> int:
    """Un-index a SET of documents: tombstone every stored posting of
    the victim docs (O(victims) MOR delta; the index scan is
    doc_id-prunable after clustering) and append ONE negative stats
    row covering them (totals stay additive — empty/NULL-text docs
    are findable via their sentinel posting).  Returns the victim
    count; removing absent ids is a no-op.

    Crash-safe ORDER: the negative stats row commits FIRST under a
    removal tag derived from (victim ids, postings version), THEN the
    postings tombstone.  A redelivery after a crash in between sees
    the victims still live at the SAME postings version → same tag →
    skips the stats decrement and finishes the delete; a crash after
    the delete leaves no victims, so redelivery is a no-op.  (A
    stats-then-crash replay can never decrement twice, and postings
    tombstoning is idempotent.)  Single-writer per index assumed —
    the job/stream model — since a concurrent postings commit between
    attempts would rotate the version out of the tag."""
    pt, st = load_search_index(spark, path)
    keys = ids.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    # materialized ONCE (the agg, the emptiness decision, and the
    # tombstone write all reuse the frame) and manifest-pruned to the
    # batch's id range — see _victim_postings
    victims = _victim_postings(pt, keys)
    # One bounded 1-row agg feeds BOTH the stats decrement and the
    # removal tag: the victim-set identity is an order-insensitive
    # distributed digest (bit_xor of xxhash64 + count), never a per-id
    # collect — a bulk un-index of millions of docs must not grow
    # driver memory with the size of the delete.
    row = (
        victims.groupBy("doc_id").agg(F.max("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("total_dl"),
            F.coalesce(
                F.bit_xor(F.xxhash64(F.col("doc_id"))), F.lit(0)
            ).alias("digest"),
        )
        .collect()[0]
    )
    if not row.n_docs:
        return 0
    import hashlib  # noqa: PLC0415

    rm_tag = "rm-" + hashlib.md5(
        f"{row.n_docs}-{row.digest}-v{pt._current_version()}".encode()
    ).hexdigest()
    if not st.has_commit_tag(rm_tag, max_scan=_TAG_REPLAY_WINDOW):
        st.append(
            spark.createDataFrame(
                [(-int(row.n_docs), -int(row.total_dl))], _STATS_SCHEMA
            ),
            tag=rm_tag,
        )
    pt.delete_keys(victims.select("term", "doc_id"))
    return int(row.n_docs)


def remove_document(spark: SparkSession, path: str, doc_id: int) -> None:
    """Un-index one document (see ``remove_documents_bulk``); after
    this, re-indexing the doc with new text is safe."""
    remove_documents_bulk(
        spark, path,
        spark.createDataFrame([(int(doc_id),)], "doc_id long"),
    )


def bm25_index_topk(
    spark: SparkSession,
    path: str,
    query_terms: tuple[str, ...],
    k: int = 20,
) -> DataFrame:
    """Top-k over the PERSISTED index: term-pruned postings scan +
    batches-sized stats sum + the shared exact-integer BM25 scorer.
    Identical scores to ``bm25_topk`` over the same corpus."""
    pt, st = load_search_index(spark, path)
    tf = (
        pt.read()
        .filter(F.col("term").isin(*query_terms) & (F.col("term") != ""))
        .select("doc_id", "dl", "term", "tf")
    )
    stats = st.read().agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("total_dl"), F.lit(0)).cast("long").alias("total_dl"),
    )
    return bm25_score_tf(tf, stats, k)


def rebuild_search_index(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Full rebuild (the OVERWRITE sink shape): postings and stats
    are both overwritten from ``docs`` — the index layout stays this
    module's private knowledge."""
    pt, st = create_search_index(spark, path)
    postings, _ = _doc_postings(docs, text_col, id_col)
    postings = postings.localCheckpoint(eager=True)  # one tokenize pass
    pt.overwrite(postings)
    st.overwrite(_doc_stats(postings))


def compact_search_index(spark: SparkSession, path: str) -> None:
    """Periodic maintenance for a long-lived index: fold the
    batches-sized additive stats down to ONE row (an overwrite derived
    from the summed read — CAS-anchored like any snapshot commit) and
    range-cluster the postings by ``term`` (single orderable column →
    linear clustering, not Morton), after which parquet min/max term
    stats are tight per file and a query's term filter skips most of
    the index."""
    pt, st = load_search_index(spark, path)
    folded = st.read().agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("total_dl"), F.lit(0)).cast("long").alias("total_dl"),
    )
    st.overwrite(folded)
    pt.compact(cluster_by=["term"])
    # bound snapshot history (and with it the tag probe's manifest
    # glob): keep the replay window, expire the rest
    st.expire_snapshots(keep_last=_TAG_REPLAY_WINDOW)
    pt.expire_snapshots(keep_last=8)
