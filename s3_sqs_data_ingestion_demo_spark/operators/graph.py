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
    nodes = linked.select(F.col("src").alias("node")).distinct()
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
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(base)
                + F.expr(f"({damping_num} * sum(contrib)) div 100")
            ).cast("bigint").alias("rank_fp")
        )
        # truncate lineage so the plan stays flat across iterations
        ranks = ranks.localCheckpoint(eager=False)
    # `linked` stays persisted: the returned plan references it once per
    # iteration, and the cache turns those into one compute + N reads
    return ranks
