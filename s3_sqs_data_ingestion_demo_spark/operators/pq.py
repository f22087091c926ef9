"""Product quantization (PQ) for embedding columns.

The missing piece between brute force and IVF for 100 TB embedding
search: compress each ``dim``-float vector to ``m`` small integer
codes (one per subspace) against trained per-subspace codebooks, then
answer top-k queries with asymmetric distance computation (ADC) — a
per-query lookup-table scan over the codes, never the raw vectors.
(Public method: Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011.)

Scale shape:
- **Training** runs driver-side on a bounded deterministic sample
  (classic practice — codebooks are trained on ~10⁴-10⁵ vectors and
  reused for the whole corpus); the codebook is m × ksub × dim/m
  floats, kilobytes, shipped to executors in the task closure.
- **Encoding** is one Arrow-batched ``mapInPandas`` scan: each batch
  does m small GEMMs (batch × ksub per subspace) and an argmin; the
  corpus is never shuffled and shrinks ~dim·4/m bytes per vector
  (64-dim float32 → 8 codes = 32× smaller), which is what makes the
  code table cacheable cluster-wide when the raw embeddings are not.
- **Search** broadcasts the (small) query set as a per-query LUT of
  partial inner products; scoring a code row is m table lookups, no
  FLOPs.  The only shuffle is the per-query top-k window, identical
  to ``cosine_topk`` so recall is directly measurable against it.

Vectors are L2-normalized before training/encoding, so the ADC score
approximates cosine similarity.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dvec


def _normalize(mat):
    import numpy as np

    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return mat / n


def _kmeans_1sub(x, ksub: int, iters: int):
    """Deterministic Lloyd's k-means on one subspace sample (numpy,
    driver-side, bounded input).  Init = first ksub distinct rows."""
    import numpy as np

    _, first = np.unique(x.round(9), axis=0, return_index=True)
    cents = x[np.sort(first)[:ksub]].copy()
    if len(cents) < ksub:  # degenerate sample: pad with repeats
        cents = np.vstack([cents, np.repeat(cents[:1], ksub - len(cents), axis=0)])
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(ksub):
            sel = x[assign == j]
            if len(sel):
                cents[j] = sel.mean(axis=0)
    return cents


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    sample: int = 4096,
):
    """Train PQ codebooks on a bounded deterministic sample (lowest
    ``sample`` ids).  Returns a numpy array (m, ksub, dim//m)."""
    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("id"), _dvec(vec_col).alias("v"))
        .orderBy("id")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train requires a non-empty corpus")
    x = _normalize(np.array([r.v for r in rows], dtype=np.float64))
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [_kmeans_1sub(x[:, j * dsub : (j + 1) * dsub], ksub, iters) for j in range(m)]
    )


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its m nearest-subcentroid codes.

    One mapInPandas scan; per Arrow batch and subspace the distance
    matrix is (batch × ksub) — small GEMM + argmin, all vectorized.
    Returns (id, codes: array<int>) — the persistent PQ index table.
    """
    import numpy as np
    import pandas as pd

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _, dsub = cb.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            v = _normalize(np.stack(pdf["v"].to_numpy()).astype(np.float64))
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                sub = v[:, j * dsub : (j + 1) * dsub]
                # ||s - c||² = ||s||² - 2s·c + ||c||²; ||s||² constant per row
                d = -2.0 * (sub @ cb[j].T) + (cb[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "codes": list(codes)})

    return (
        df.select(F.col(id_col).alias("id"), _dvec(vec_col).alias("v"))
        .mapInPandas(encode, "id long, codes array<long>")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: score every (query, code-row) pair with m lookups
    into the query's precomputed subspace inner-product table.

    The query set is collected driver-side (bounded, same contract as
    ``cosine_topk``'s broadcast) into one LUT ndarray (q, m, ksub)
    shipped in the task closure; the code table is scanned once, no
    shuffle before the per-query top-k window.  Returns
    (query_id, neighbor_id, adc_sim, rank) — comparable to
    ``cosine_topk`` for recall measurement.
    """
    import numpy as np
    import pandas as pd

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    qrows = (
        queries.select(F.col(id_col).alias("qid"), _dvec(vec_col).alias("v"))
        .orderBy("qid")
        .collect()
    )
    if not qrows:
        raise ValueError("pq_topk requires a non-empty query set")
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    qv = _normalize(np.array([r.v for r in qrows], dtype=np.float64))
    # LUT[qi, j, c] = <query_sub, centroid_c> — inner products, so the
    # summed score approximates cosine of normalized vectors
    lut = np.stack(
        [qv[:, j * dsub : (j + 1) * dsub] @ cb[j].T for j in range(m)], axis=1
    )  # (q, m, ksub)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            # gather per subspace: (q, n) accumulated over m lookups
            sims = np.zeros((len(qids), len(pdf)))
            for j in range(m):
                sims += lut[:, j, :][:, c[:, j]]
            nid = pdf["id"].to_numpy()
            qi, ni = np.meshgrid(np.arange(len(qids)), np.arange(len(pdf)), indexing="ij")
            yield pd.DataFrame(
                {
                    "query_id": qids[qi.ravel()],
                    "neighbor_id": nid[ni.ravel()],
                    "adc_sim": np.round(sims.ravel(), 4),
                }
            )

    scored = codes.mapInPandas(
        score, "query_id long, neighbor_id long, adc_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ------------------------------------------------------------ IVF-PQ
# Composition of the IVF coarse quantizer (operators/similarity.py)
# with PQ residual codes — the canonical billion-scale index layout:
# probe a few cells, ADC-score only their members, on codes ~32x
# smaller than raw vectors.  With L2-normalized vectors and v = c + r
# (cell centroid + residual), <q, v> = <q, c> + <q, r>: the first term
# is an exact per-(query, cell) constant, the second an ADC lookup sum
# against codebooks trained on residuals (one shared codebook set, as
# in Jégou et al. 2011 §IV).

def _collect_centroids(centroids: DataFrame):
    import numpy as np

    rows = centroids.orderBy("cell_id").collect()
    if not rows:
        raise ValueError("empty centroid set")
    ids = np.array([r.cell_id for r in rows], dtype=np.int64)
    mat = np.array([r.centroid for r in rows], dtype=np.float64)
    return ids, mat


def ivfpq_train(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 16,
    ksub: int = 64,
    iters: int = 8,
    sample: int = 4096,
):
    """Train PQ codebooks on cell RESIDUALS of a bounded sample.
    Returns (m, ksub, dim//m) ndarray; centroids come from
    ``kmeans_fit``/``label_centroids`` and stay tiny by construction."""
    import numpy as np

    cids, cmat = _collect_centroids(centroids)
    rows = (
        df.select(F.col(id_col).alias("id"), _dvec(vec_col).alias("v"))
        .orderBy("id")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("ivfpq_train requires a non-empty corpus")
    x = _normalize(np.array([r.v for r in rows], dtype=np.float64))
    nearest = (x @ cmat.T).argmax(axis=1)  # cosine cell assignment
    resid = x - cmat[nearest]
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [_kmeans_1sub(resid[:, j * dsub : (j + 1) * dsub], ksub, iters) for j in range(m)]
    )


def ivfpq_encode(
    df: DataFrame,
    centroids: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest cell and PQ-encode the
    residual in the same Arrow batch: one scan, no shuffle.
    Returns (id, cell_id, codes) — the persistent IVF-PQ index."""
    import numpy as np
    import pandas as pd

    cids, cmat = _collect_centroids(centroids)
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = cb.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            v = _normalize(np.stack(pdf["v"].to_numpy()).astype(np.float64))
            nearest = (v @ cmat.T).argmax(axis=1)
            resid = v - cmat[nearest]
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                sub = resid[:, j * dsub : (j + 1) * dsub]
                d = -2.0 * (sub @ cb[j].T) + (cb[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"], "cell_id": cids[nearest], "codes": list(codes)}
            )

    return (
        df.select(F.col(id_col).alias("id"), _dvec(vec_col).alias("v"))
        .mapInPandas(encode, "id long, cell_id long, codes array<long>")
    )


def ivfpq_topk(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    codebooks,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe each query's ``nprobe`` nearest cells and ADC-score only
    their members: score = <q, cell centroid> (exact bias, computed
    driver-side on the tiny probe table) + Σ residual-LUT lookups.

    The probe table (queries × nprobe rows) broadcasts onto the index
    equi-join on cell_id — the corpus codes never shuffle; the only
    exchange is the per-query top-k window.  Returns
    (query_id, neighbor_id, adc_sim, rank)."""
    import numpy as np
    import pandas as pd

    cids, cmat = _collect_centroids(centroids)
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    qrows = (
        queries.select(F.col(id_col).alias("qid"), _dvec(vec_col).alias("v"))
        .orderBy("qid")
        .collect()
    )
    if not qrows:
        raise ValueError("ivfpq_topk requires a non-empty query set")
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    qv = _normalize(np.array([r.v for r in qrows], dtype=np.float64))
    lut = np.stack(
        [qv[:, j * dsub : (j + 1) * dsub] @ cb[j].T for j in range(m)], axis=1
    )  # (q, m, ksub)
    qpos = {int(q): i for i, q in enumerate(qids)}

    cell_sims = qv @ cmat.T  # (q, n_cells) exact biases
    order = np.argsort(-cell_sims, axis=1)[:, :nprobe]
    spark = queries.sparkSession
    probes = spark.createDataFrame(
        [
            (int(qids[qi]), int(cids[ci]), float(cell_sims[qi, ci]))
            for qi in range(len(qids))
            for ci in order[qi]
        ],
        "query_id long, cell_id long, bias double",
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            qi = pdf["query_id"].map(qpos).to_numpy()
            sims = pdf["bias"].to_numpy().astype(np.float64).copy()
            for j in range(m):
                sims += lut[qi, j, c[:, j]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["id"],
                    "adc_sim": np.round(sims, 4),
                }
            )

    joined = index.join(F.broadcast(probes), "cell_id")
    scored = joined.mapInPandas(
        score, "query_id long, neighbor_id long, adc_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
