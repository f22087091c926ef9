"""Distributed link-analysis over entity graphs: PageRank.

The reference's relational surface stops at joins/windows; real corpus
pipelines also rank entities by graph centrality (e.g. harvesting a
web crawl: page importance feeds the quality-weighted sampler, and
host-level PageRank is a standard pretraining quality signal — the
Common Crawl pipelines rank hosts exactly this way).  This module
implements power-iteration PageRank DataFrame-first.

Exact cross-engine parity: ranks are integer fixed-point (``scale``
units of probability mass, default 1e12).  Every operation is integer
arithmetic — ``div`` for the per-edge split, ``sum`` of BIGINTs for
the gather, one final ``* damping_num div 100`` — so Spark and a SQL
oracle (unrolled iterations in DuckDB CTEs) agree bit-for-bit; no
float summation-order hazard.  Mass lost to integer truncation is
deterministic and identical on both engines (documented, not hidden).

Scale shape (100 TB crawl graph):
- the edge list is the big side: it is joined ONCE per iteration on
  ``src`` and never re-derived; ``(edges ⋈ outdeg)`` is materialized
  up front and persisted, so each iteration is exactly one
  rank-redistribution join + one ``groupBy(dst)`` sum — the minimal
  two shuffles a distributed power iteration can do.
- ranks are node-sized (orders of magnitude smaller than edges); the
  join shuffles ranks to the edge partitioning, not the reverse.  On
  a real cluster the edge table would be bucket-written by ``src``
  once so every iteration's join is shuffle-free on the edge side.
- per-iteration lineage is truncated (localCheckpoint) so the plan
  does not grow with iteration count.
- no driver-side collect beyond one COUNT (the node count) — ranks
  never leave the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
    damping_num: int = 85,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    ``edges`` must be deduplicated (one row per directed edge).  The
    node universe is the set of SOURCE nodes; on a symmetrized graph
    (the common corpus case — undirected similarity / co-purchase
    edges emitted in both directions) that is every node, and every
    node has outdegree ≥ 1, so there is no dangling-mass term.  For
    genuinely directed graphs symmetrize or handle dangling upstream.

    Returns (node, rank_fp): fixed-point rank in ``scale`` units.
    init = scale div n; each iteration computes for every node
    ``base + (damping_num * Σ_in (rank_src div outdeg_src)) div 100``
    with base = (init * (100 - damping_num)) div 100.  All integer ops
    — reproducible across engines and across cluster topologies (no
    float reduction-order dependence).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edge ⋈ outdeg materialized once; every iteration reuses it.  The
    # node set derives from the SAME cached frame so the count below
    # both returns n and warms the cache for the iteration joins.
    linked = e.join(deg, "src").persist()
    try:
        # node-sized and consumed once for init plus once per
        # iteration (the re-anchor join) — pin it or every use pays
        # the distinct shuffle over the cached edges again
        nodes = (
            linked.select(F.col("src").alias("node")).distinct().persist()
        )
        n = nodes.count()  # the one driver action: a single scalar
        if n == 0:
            raise ValueError("pagerank: empty edge list")
        init = scale // n
        base = (init * (100 - damping_num)) // 100
        ranks = nodes.withColumn("rank_fp", F.lit(init).cast("bigint"))
        for _ in range(iterations):
            contribs = linked.join(
                ranks, linked["src"] == ranks["node"]
            ).select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div outdeg").alias("contrib"),
            )
            agg = contribs.groupBy("node").agg(
                F.sum("contrib").alias("_in_contrib")
            )
            # re-anchor on the node universe: a node with out-edges but
            # no in-edges keeps its defined rank (base, zero incoming)
            # instead of silently vanishing from the rank table after
            # the groupBy(dst) — matches the per-node recurrence exactly
            ranks = nodes.join(agg, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(_in_contrib, 0L)) div 100"
                    )
                ).cast("bigint").alias("rank_fp"),
            )
            # truncate lineage so the plan stays flat across iterations
            ranks = ranks.localCheckpoint(eager=False)
        # materialize the final (node-sized) rank table, then release
        # the cached edge frame — callers read the checkpoint, and the
        # session doesn't leak one persisted frame per invocation
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        linked.unpersist()
        try:
            nodes.unpersist()
        except NameError:
            # only reachable if the nodes select/persist line itself
            # raised before binding the name (the n == 0 path binds
            # nodes normally and unpersists here like any other exit)
            pass
    return ranks


def triangle_stats(
    pairs: DataFrame, a: str = "a", b: str = "b", scale: int = 10**6
) -> DataFrame:
    """Global triangle census of an undirected graph: one row with
    (n_nodes, n_edges, n_wedges, n_triangles, global_cc_ppm).

    ``pairs`` holds each undirected edge once, canonical ``a < b``.

    Algorithm (public; Cohen 2009 MapReduce triangle counting /
    degree-ordered orientation): orient every edge from the endpoint
    with the smaller (degree, id) to the larger.  Every triangle then
    has exactly ONE wedge rooted at its smallest-ordered vertex, so
    counting = wedge self-join + one existence join.  The orientation
    bounds per-vertex out-degree by O(sqrt(m)) on any graph, which is
    what keeps the wedge join from exploding on skewed (power-law)
    degree distributions — the hub vertex's million neighbors become
    IN-edges, never a million-choose-2 wedge fan-out.  This is the
    100 TB-safe formulation; the naive 3-way self-join is not.

    Wedge total (for the clustering coefficient) is Σ_v C(deg_v, 2),
    computed from the degree table without materializing wedges.
    Global CC = 3·triangles / wedges, fixed-point ppm (integer ops
    both engines).
    """
    # The edge list is consumed twice (degree pass + orientation
    # join) and the degree table three times (both orientation sides
    # + the wedge total) — and the upstream ``pairs`` pipeline is
    # typically the expensive part (a basket self-join + distinct).
    # The alias renames below defeat exchange reuse (0 ReusedExchange
    # in the unpinned plan; the pairs subtree re-executed ~4x), so pin
    # both: edges once at O(m), degrees at O(n).
    e = pairs.select(F.col(a).alias("a"), F.col(b).alias("b")).persist()
    oriented = None
    deg = None
    try:
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        deg = (
            sym.groupBy("a")
            .agg(F.count("*").alias("deg"))
            .withColumnRenamed("a", "v")
            .persist()
        )
        # orientation key: (deg, id) — total order, breaks degree ties
        da = deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "deg_a")
        db = deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "deg_b")
        ranked = e.join(da, "a").join(db, "b")
        oriented = ranked.select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst"),
                         F.col("deg_b").alias("deg_dst")),
            )
            .otherwise(
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst"),
                         F.col("deg_a").alias("deg_dst"))
            )
            .alias("o")
        ).select("o.src", "o.dst", "o.deg_dst").persist()
        w1 = oriented.select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col("deg_dst").alias("dv"),
        )
        w2 = oriented.select(
            F.col("src").alias("u"),
            F.col("dst").alias("w"),
            F.col("deg_dst").alias("dw"),
        )
        # wedge (v, w) ordered by the same (deg, id) key as the orientation,
        # so the closing edge — if present — is oriented exactly v -> w
        wedges = w1.join(w2, "u").filter(
            (F.col("dv") < F.col("dw"))
            | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
        )
        closing = oriented.select(
            F.col("src").alias("v"), F.col("dst").alias("w")
        )
        tri = wedges.join(closing, ["v", "w"]).agg(
            F.count("*").alias("n_triangles")
        )
        totals = deg.agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.expr("sum(deg) div 2").cast("bigint").alias("n_edges"),
            F.sum(F.expr("deg * (deg - 1) div 2")).cast("bigint").alias("n_wedges"),
        )
        out = totals.crossJoin(tri).select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("n_triangles").cast("bigint"),
            # zero guard: a wedge-free graph yields cc = 0 identically in
            # both engines (Spark's non-ANSI div would yield NULL while
            # DuckDB's // throws — neither is the defined answer)
            F.expr(
                f"CASE WHEN n_wedges = 0 THEN 0L "
                f"ELSE (3 * n_triangles * {scale}) div n_wedges END"
            )
            .cast("bigint")
            .alias("global_cc_ppm"),
        )
        # materialize the one-row census inside the try, then release
        # every cached frame in the finally — an exception anywhere
        # above must not leak three session-lifetime pins
        out = out.localCheckpoint(eager=True)
    finally:
        for pinned in (oriented, deg, e):
            if pinned is not None:
                pinned.unpersist()
    return out


def cooccurrence_similarity(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Item-item Jaccard similarity from co-occurrence in baskets —
    the bipartite-projection / collaborative-filtering primitive
    ("suppliers similar to X by shared customers").

    Input: distinct (basket, item) membership rows.  Output one row
    per unordered item pair that ever co-occurs: (item_a, item_b,
    n_common, jaccard_ppm) with Jaccard = |A∩B| / (|A|+|B|−|A∩B|)
    in integer ppm.

    Scale shape: the self-join is keyed on the basket, so cost is
    Σ_b C(size_b, 2) — bounded by basket sizes, not item count.  A
    viral basket (one customer buying from every supplier) is the
    skew hazard; real deployments cap basket size upstream (the same
    hot-bucket cap the LSH operators use).  Degrees join in as two
    broadcast-sized aggregates; everything stays integer.

    The distinct membership frame is consumed four times (the degree
    pass and both sides of the basket self-join), and the alias
    renames defeat exchange reuse — the unpinned plan re-ran the
    upstream scan + distinct shuffle 4×.  It is pinned with an eager
    ``localCheckpoint`` rather than persist(): the operator returns a
    LAZY frame (callers rank/filter on top — a full-eager contract was
    measured SLOWER at sf0.1, the pair materialization costs more than
    the saved rescans), so there is no in-operator point to unpersist;
    checkpoint blocks are released by the ContextCleaner when the
    returned frame is collected, not leaked for the session.
    """
    m = (
        baskets.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = m.groupBy("it").agg(F.count("*").alias("n_baskets"))
    a_side = m.select("bk", F.col("it").alias("item_a"))
    b_side = m.select("bk", F.col("it").alias("item_b"))
    co = (
        a_side.join(b_side, "bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_common"))
    )
    da = deg.select(F.col("it").alias("item_a"), F.col("n_baskets").alias("na"))
    db = deg.select(F.col("it").alias("item_b"), F.col("n_baskets").alias("nb"))
    return (
        co.join(da, "item_a")
        .join(db, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_common").cast("bigint"),
            F.expr(f"(n_common * {scale}) div (na + nb - n_common)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
