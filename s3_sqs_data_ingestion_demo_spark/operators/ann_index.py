"""Persistent IVF index over ManagedTables: build once, append forever.

``ivf_topk`` (similarity.py) re-assigns the whole corpus to cells on
every call — right for ad-hoc queries, wrong for a deployment where
embeddings arrive continuously.  This module persists the index the
way a production ANN service does:

- ``centroids`` table: (cell_id, centroid) — k rows, written once at
  build time (COW overwrite; refitting is an explicit rebuild).
- ``assignments`` table: (vec_id, cell_id, embedding, norm) — keyed
  MOR ManagedTable; INCREMENTAL appends assign new vectors to the
  EXISTING cells in one broadcast pass and land as O(batch) merge
  deltas.  No refit, no corpus re-scan: the cost of absorbing a batch
  is independent of index size, the same property as the streaming
  near-dup index (streaming/neardup.py).

Query path: probe ``nprobe`` nearest cells per query, collect the
(bounded: ≤ n_queries × nprobe) probed cell set driver-side, and read
ONLY those cells via ``ManagedTable.read_where_in`` — manifest
``cell_id`` stats (harvested via ``write.stats-columns``) skip whole
entries, and the pushed ``isin`` predicate skips parquet files /
row-groups after ``compact(cluster_by=["cell_id"])``.  A query batch
therefore scans O(probed cells), not the whole index.  Norms are
PERSISTED with the assignments so queries never recompute a
corpus-side fold.

Drift: centroids fixed at build time drift from the data as the
corpus grows — ``cell_balance`` reports per-cell occupancy so an
operator can trigger a rebuild when the balance degrades (the same
signal FAISS deployments watch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ManagedTable
from .similarity import _dvec, dot, kmeans_fit, norm, unit

_CENTROID_SCHEMA = T.StructType(
    [
        T.StructField("cell_id", T.IntegerType()),
        T.StructField("centroid", T.ArrayType(T.DoubleType())),
    ]
)


def _assign_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell_id", T.IntegerType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("vnorm", T.DoubleType()),
        ]
    )


def _centroids_path(path: str) -> str:
    return os.path.join(path, "centroids")


def _assign_path(path: str) -> str:
    return os.path.join(path, "assignments")


def _assign_to_cells(
    vectors: DataFrame, cent: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """One broadcast pass: each vector's nearest cell by cosine
    against unit centroids (scale-invariant, so raw vectors + a norm
    column — the cosine_topk float-shape, see its docstring)."""
    c = cent.select("cell_id", unit(_dvec("centroid")).alias("_cent"))
    base = vectors.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("embedding")
    ).withColumn("vnorm", norm(F.col("embedding")))
    scored = base.crossJoin(F.broadcast(c)).select(
        "vec_id", "embedding", "vnorm", "cell_id",
        dot(F.col("embedding"), F.col("_cent")).alias("_cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_cs").desc(), F.col("cell_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("vec_id", "cell_id", "embedding", "vnorm")
    )


def build_ivf_index(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[ManagedTable, ManagedTable]:
    """Fit centroids on ``corpus`` and persist (centroids,
    assignments) tables at ``path``.  Rebuild = call again (centroids
    overwrite; assignments overwrite with the fresh full assignment)."""
    cents = kmeans_fit(corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ct = ManagedTable.create_if_absent(
        spark, _centroids_path(path), _CENTROID_SCHEMA
    )
    ct.overwrite(cents.select("cell_id", _dvec("centroid").alias("centroid")))
    at = ManagedTable.create_if_absent(
        spark,
        _assign_path(path),
        _assign_schema(),
        key_cols=["vec_id"],
        table_type="MOR",
        properties={
            "write.max-delta-files": "4",
            # harvest cell_id (min, max) per entry alongside the key
            # stats: funds read_where_in's manifest skip on the query
            # path (cell_id is the scan column, vec_id the key)
            "write.stats-columns": "cell_id",
            # cell_id-clustered compaction scatters vec_id, so
            # takedowns (point lookups by vec_id) get parquet-bloom
            # row-group skips instead of min/max
            "write.bloom-columns": "vec_id",
            "write.bloom-ndv": "100000",
        },
    )
    at.overwrite(_assign_to_cells(corpus, ct.read(), id_col, vec_col))
    return ct, at


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[ManagedTable, ManagedTable]:
    return (
        ManagedTable.load(spark, _centroids_path(path)),
        ManagedTable.load(spark, _assign_path(path)),
    )


def append_to_ivf_index(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Absorb a batch WITHOUT refitting: assign to the existing
    centroids (one broadcast pass over the batch only) and merge into
    the assignments table keyed on vec_id — a re-sent id upserts its
    row instead of duplicating it.  O(batch) cost however large the
    index has grown."""
    ct, at = load_ivf_index(spark, path)
    return at.merge(_assign_to_cells(vectors, ct.read(), id_col, vec_col))


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_filter: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k against the PERSISTED index: probe ``nprobe``
    cells per query, score only their members.  Same output shape as
    ``cosine_topk`` — (query_id, neighbor_id, cosine_sim, rank) — so
    recall is directly measurable against the exact baseline.  The
    corpus-side fold is already paid: assignments carry their norms.

    ``id_filter``: optional FILTERED search — a one-column frame of
    eligible ids (any column name; cast to long) semi-joined against
    the probed members, so metadata predicates ("only English docs",
    "only source X") compose with cell pruning: the scan cost stays
    O(probed cells) and the filter then restricts WITHIN that bounded
    slice.  Distances to ineligible vectors are never computed, and k
    is filled from eligible members only (pre-filter semantics — a
    post-filter of an unfiltered top-k could under-fill k).  Note the
    approximation caveat every IVF deployment documents: a highly
    selective filter thins the probed cells, so recall at fixed
    ``nprobe`` drops — raise ``nprobe`` as selectivity rises."""
    ct, at = load_ivf_index(spark, path)
    cent = ct.read().select("cell_id", unit(_dvec("centroid")).alias("_cent"))
    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(vec_col).alias("_qv")
    ).withColumn("_qn", norm(F.col("_qv")))
    q_scored = q.crossJoin(F.broadcast(cent)).select(
        "query_id", "_qv", "_qn", "cell_id",
        dot(F.col("_qv"), F.col("_cent")).alias("_cs"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col("cell_id")
    )
    probes = (
        q_scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "_qv", "_qn", "cell_id")
        # materialize once: the driver-side cell collect below and the
        # members join both consume this small (queries × nprobe) frame
        .localCheckpoint(eager=True)
    )
    # CELL-PRUNED index scan: the probed cell set is bounded
    # (≤ n_queries × nprobe; queries are broadcast-small by contract),
    # so collect it and push it into the read — a join key alone would
    # never reach the parquet scan, and an unpruned at.read() would
    # scan the ENTIRE index per query batch.
    cells = [r.cell_id for r in probes.select("cell_id").distinct().collect()]
    members = at.read_where_in("cell_id", cells).select(
        F.col("vec_id").alias("neighbor_id"), "cell_id",
        F.col("embedding").alias("_cv"), F.col("vnorm").alias("_cn"),
    )
    if id_filter is not None:
        eligible = id_filter.select(
            F.col(id_filter.columns[0]).cast("long").alias("neighbor_id")
        )
        # semi-join BEFORE scoring: ineligible members never reach the
        # distance fold (the members side is already cell-pruned and
        # bounded, so AQE picks the join side to broadcast)
        members = members.join(eligible, "neighbor_id", "left_semi")
    scored = (
        probes.join(members, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(
                dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                4,
            ).alias("cosine_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
    )


def cell_balance(spark: SparkSession, path: str) -> DataFrame:
    """Per-cell occupancy report — the rebuild trigger: centroids
    fitted at build time drift as the corpus grows, and a cell whose
    share balloons degrades probe pruning.  (cell_id, n_vectors).
    Full index scan BY DESIGN: this is the explicit rebuild audit, run
    at maintenance cadence, never on the query path."""
    _, at = load_ivf_index(spark, path)
    return at.read().groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )


def max_cell_share(spark: SparkSession, path: str) -> float:
    """The drift score a maintenance policy thresholds on: the largest
    cell's share of all indexed vectors (1/k when perfectly balanced,
    → 1.0 as drift concentrates the corpus in one cell).  One k-row
    aggregate; 0.0 for an empty index."""
    rows = cell_balance(spark, path).collect()
    total = sum(r.n_vectors for r in rows)
    return (max(r.n_vectors for r in rows) / total) if total else 0.0


def rebuild_ivf_index(
    spark: SparkSession,
    path: str,
    k: int | None = None,
    iters: int = 5,
) -> tuple[ManagedTable, ManagedTable]:
    """Refit the centroids from the STORED vectors and rewrite the
    assignments — the explicit answer to drift (``cell_balance`` /
    ``max_cell_share``).  ``k`` defaults to the current cell count.
    Reading the old assignments while overwriting them is safe:
    overwrite lands as a new snapshot and the prior snapshot's files
    survive until ``expire_snapshots``."""
    ct, at = load_ivf_index(spark, path)
    if k is None:
        k = ct.read().count()
    corpus = at.read().select("vec_id", "embedding")
    return build_ivf_index(
        spark, path, corpus, k=int(k), iters=iters,
        id_col="vec_id", vec_col="embedding",
    )
