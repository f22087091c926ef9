"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane / SimHash-for-vectors) variant as the scale path.

Everything is built-in ``pyspark.sql.functions`` — the dot product is
``aggregate(zip_with(...))`` over double-cast arrays, JVM-side, no
Python in the loop.  Embedding math is done in float64 on both engines
so oracle comparisons agree to rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dvec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit(a: Column) -> Column:
    """L2-normalize once in the projection so pairwise cosine becomes a
    single dot product — at O(n²) pair volume, recomputing norms per
    pair triples the FLOPs and dominates the runtime."""
    n = norm(a)
    return F.transform(a, lambda x: x / n)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan: broadcast the (small) query set, one pass over the corpus
    computing cosine, then per-query top-k via window.  Cost is
    O(|corpus| × |queries| × dim) FLOPs with NO shuffle of the corpus —
    the only shuffle is the per-query top-k over |q|×|corpus| rows.
    The ranking uses (rounded cosine, neighbor id) so the selected set
    is deterministic across engines.

    Returns (query_id, neighbor_id, cosine_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _dvec(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cell_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the scale path past
    brute force.

    Index side: every corpus vector is assigned to its nearest
    centroid cell (one broadcast pass — centroids are small by
    construction).  Query side: each query probes its ``nprobe``
    nearest cells and scores ONLY vectors in those cells.

    Cost drops from O(|corpus|·|queries|) to
    O(|corpus|·nprobe/|cells| · |queries|) FLOPs; the corpus is
    scanned once for assignment (cacheable/materializable as an index
    table) and the scoring join is an equi-join on cell_id — plain
    hash partitioning, no custom infrastructure.

    Returns (query_id, neighbor_id, cosine_sim, rank) — same shape as
    ``cosine_topk`` so recall is directly measurable against it.
    """
    cent = centroids.select(
        F.col(centroid_id_col).alias("cell_id"), _dvec(centroid_vec_col).alias("_cent")
    )

    def nearest_cells(df: DataFrame, idc: str, vc: str, n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).select(
            F.col(idc),
            F.col(vc),
            "cell_id",
            cosine(F.col(vc), F.col("_cent")).alias("_cs"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("_cs").desc(), F.col("cell_id"))
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("_rk", "_cs")
        )

    c_assigned = nearest_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), _dvec(vec_col).alias("_cv")),
        "neighbor_id", "_cv", 1,
    )
    q_probes = nearest_cells(
        queries.select(F.col(id_col).alias("query_id"), _dvec(vec_col).alias("_qv")),
        "query_id", "_qv", nprobe,
    )
    scored = (
        q_probes.join(c_assigned, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 4).alias("cosine_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))  # dedup multi-probe hits
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_fit(
    df: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means producing IVF coarse-quantizer
    centroids.

    Per iteration: broadcast the k centroids (always tiny — k×dim),
    assign every vector to its nearest centroid in one scan, recompute
    means with a posexplode + (cell, dim) aggregation.  Only the k
    centroids ever reach the driver; the corpus is scanned ``iters``
    times and never shuffled except the (cell, dim) partial-agg
    exchange.  Deterministic: init = first k vectors by id.

    Returns (cell_id, centroid: array<double>).
    """
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("id"), _dvec(vec_col).alias("v"))
    init = [
        [float(x) for x in r.v]
        for r in base.orderBy("id").limit(k).collect()
    ]
    if not init:
        raise ValueError("kmeans_fit requires a non-empty corpus")
    cents = init[:k]
    k = len(cents)  # corpus smaller than k: fit what exists
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell_id int, centroid array<double>"
        )
        assigned = _assign_cells(base, cent_df)
        new = (
            assigned.select("cell_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell_id", F.transform("pm", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        updated = dict((r.cell_id, [float(x) for x in r.centroid]) for r in new)
        cents = [updated.get(i, cents[i]) for i in range(k)]  # keep empty cells
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell_id int, centroid array<double>"
    )


def _assign_cells(base: DataFrame, cent_df: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (cosine) in one broadcast pass."""
    scored = base.crossJoin(F.broadcast(cent_df)).select(
        "id", "v", "cell_id", cosine(F.col("v"), F.col("centroid")).alias("_cs")
    )
    w = Window.partitionBy("id").orderBy(F.col("_cs").desc(), F.col("cell_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("id", "v", "cell_id")
    )


def label_centroids(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-quantizer centroids from a labeled corpus (stand-in for
    a k-means step): per-label mean vector, computed with posexplode +
    two-key aggregate and re-assembled with array_agg ordered by dim."""
    dims = (
        corpus.select(
            F.col(label_col).alias("cell_id"),
            F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias(
                "pos", "v"
            ),
        )
        .groupBy("cell_id", "pos")
        .agg(F.avg("v").alias("m"))
    )
    return (
        dims.groupBy("cell_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "cell_id", F.transform("pm", lambda s: s["m"]).alias("centroid")
        )
    )


def blocked_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_blocks: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked GEMM.

    The expression-level pairwise dot (``aggregate(zip_with(...))``)
    is interpreted per element — O(n²·dim) lambda evaluations.  This
    operator instead tiles the corpus into ``n_blocks`` hash blocks,
    routes every block PAIR to one ``applyInPandas`` group, and
    computes the block-by-block similarity matrix with one BLAS
    ``matmul`` per tile — the standard distributed exact-similarity
    design: each vector is replicated ``n_blocks`` times (not n²), and
    all FLOPs run vectorized in numpy.

    Returns (id_a, id_b, cosine_sim ≥ threshold), id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("id"),
        _dvec(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    # each row joins every block-pair group (bi, bj) that involves its
    # own block; groups are unordered pairs bi <= bj
    pairs = F.array(
        *[
            F.struct(
                F.least(F.col("_blk"), F.lit(j)).alias("bi"),
                F.greatest(F.col("_blk"), F.lit(j)).alias("bj"),
            )
            for j in range(n_blocks)
        ]
    )
    routed = (
        base.select("id", "v", "_blk", F.explode(pairs).alias("g"))
        .select("id", "v", "_blk", F.col("g.bi").alias("bi"), F.col("g.bj").alias("bj"))
        .dropDuplicates(["id", "bi", "bj"])
    )

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        left = pdf[pdf["_blk"] == bi]
        right = pdf[pdf["_blk"] == bj]
        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}
            )
        la = np.stack(left["v"].to_numpy())
        rb = np.stack(right["v"].to_numpy())
        la = la / np.linalg.norm(la, axis=1, keepdims=True)
        rb = rb / np.linalg.norm(rb, axis=1, keepdims=True)
        sims = la @ rb.T  # one BLAS call per tile
        ia, ib = np.nonzero(sims >= threshold)
        id_a = left["id"].to_numpy()[ia]
        id_b = right["id"].to_numpy()[ib]
        vals = sims[ia, ib]
        if bi == bj:
            # diagonal tile: both orientations appear; keep one
            keep = id_a < id_b
            id_a, id_b, vals = id_a[keep], id_b[keep], vals[keep]
        else:
            # off-diagonal tile: each pair appears once; orient it
            lo = np.minimum(id_a, id_b)
            hi = np.maximum(id_a, id_b)
            id_a, id_b = lo, hi
        return pd.DataFrame(
            {"id_a": id_a, "id_b": id_b, "cosine_sim": np.round(vals, 4)}
        )

    return routed.groupBy("bi", "bj").applyInPandas(
        tile, schema="id_a long, id_b long, cosine_sim double"
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure Python LCG so the
    planes are reproducible without numpy's global state)."""
    planes: list[list[float]] = []
    state = seed & 0x7FFFFFFF or 1
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            v.append(state / float(1 << 31) * 2.0 - 1.0)
        planes.append(v)
    return planes


def lsh_bucket(vec_col: str | Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane.

    Vectors in the same bucket are likely neighbors (cosine LSH);
    bucketing before the join turns all-pairs O(n²) into
    sum-over-buckets O(Σ b²).
    """
    v = _dvec(vec_col)
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bits.append(F.when(dot(v, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs via LSH-bucketed self-join.

    Exact within buckets: pairs that land in the same sign-pattern
    bucket are verified with full cosine.  (Single-table variant; for
    recall-critical use, union over several plane seeds.)
    Returns (id_a, id_b, cosine_sim >= threshold), id_a < id_b.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        _dvec(vec_col).alias("v"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    left = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    right = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
