"""Deterministic sampling, splitting, and mixing for training-data
pipelines.

Every operator here derives its randomness from a salted md5 of the
row's id, NOT from an RNG: the same (corpus, salt) always selects the
same rows, on any cluster size, any partitioning, any engine.  That
reproducibility is the property training pipelines actually need —
``df.sample()`` changes with partition layout, which silently changes
the training set between runs — and it makes every operator exactly
oracle-checkable in any SQL engine with md5.

Scale shape: ``hash_split`` and ``stratified_sample`` are pure
projections/filters (zero shuffle at any corpus size).  ``domain_mix``
ranks rows within each domain — one shuffle on the domain key, the
minimum possible for exact per-domain quotas; its per-domain counts
aggregate is sketch-sized and broadcast back.

Portable hash (shared with the dedup family, NOTES.md): Spark
``conv(substr(md5(x),1,15),16,10)`` equals DuckDB
``('0x'||substring(md5(x),1,15))::UBIGINT`` — 60 bits, inside BIGINT;
dividing by 2**60 (a power of two) is exact in binary floating point,
so the uniform variate is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_BITS = 60
_HASH_DENOM = float(1 << _HASH_BITS)


def uniform_hash(col: str | Column, salt: str = "sg") -> Column:
    """Deterministic uniform [0, 1) variate from a salted md5 of
    ``col`` — the engine-portable substitute for rand()."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(":" + salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return h / F.lit(_HASH_DENOM)


def uniform_hash_sql(expr: str, salt: str = "sg") -> str:
    """The DuckDB-equivalent SQL fragment of ``uniform_hash`` — oracle
    generators embed this so both sides share one definition."""
    return (
        f"(('0x' || substring(md5(CAST({expr} AS VARCHAR) || ':{salt}'), 1, 15))"
        f"::UBIGINT / {1 << _HASH_BITS}.0)"
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "sg",
) -> DataFrame:
    """Assign each row a split label ('train'/'val'/'test'/...) by
    cumulative weight thresholds over the uniform hash — a pure
    projection: no shuffle, no RNG, stable under any repartitioning,
    and a row's split never changes when OTHER rows are added or
    removed (the property a growing corpus needs).

    ``weights`` must sum to 1 (validated); label order follows the
    dict's insertion order, so the caller controls which labels absorb
    the hash-space boundaries."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = uniform_hash(id_col, salt)
    expr: Column | None = None
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sg",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (the
    reproducible form of ``df.sampleBy``): a row survives iff its
    uniform hash is below its stratum's fraction.  Projection +
    filter — zero shuffle at any scale."""
    u = uniform_hash(id_col, salt)
    frac: Column = F.lit(default_fraction)
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(frac)
    return df.filter(u < frac)


def domain_mix(
    df: DataFrame,
    domain_col: str,
    target_shares: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "sg",
) -> DataFrame:
    """Select the largest corpus achieving EXACT per-domain proportions
    (data mixing for training runs: e.g. 70% web / 20% code / 10%
    academic).  The achievable total is limited by the scarcest domain
    (N = min over domains of available/share); each domain contributes
    its quota floor(share * N), chosen deterministically as the
    lowest-hash rows so the selection is stable and engine-checkable.

    Cost: one small aggregate for per-domain counts (broadcast back)
    and one window rank partitioned by domain — a single shuffle on
    the domain key.  Domains absent from ``target_shares`` are
    dropped; a target domain with NO available rows raises at
    execution time (``raise_error``, kept lazy/distributed) — its
    absence would silently drop it from the capacity bound and the
    output proportions would no longer match ``target_shares``."""
    total_share = sum(target_shares.values())
    if abs(total_share - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1, got {total_share}")
    shares = F.create_map(
        *[x for kv in target_shares.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    in_scope = df.filter(F.col(domain_col).isin(list(target_shares)))
    expected = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in target_shares])).alias(domain_col)
    )
    counts = (
        expected.join(
            in_scope.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n_avail")),
            domain_col,
            "left",
        )
        .withColumn("_share", shares[F.col(domain_col)])
        .withColumn(
            "_capacity",
            F.when(
                F.col("_n_avail").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("domain_mix: no rows available for target domain "),
                        F.col(domain_col),
                    )
                ).cast("double"),
            ).otherwise(F.col("_n_avail") / F.col("_share")),
        )
    )
    # the binding domain caps the total; quotas derive from that total
    quotas = counts.crossJoin(
        F.broadcast(counts.agg(F.floor(F.min("_capacity")).alias("_total")))
    ).select(
        domain_col,
        F.floor(F.col("_share") * F.col("_total")).cast("long").alias("_quota"),
    )
    u = uniform_hash(id_col, salt)
    w = Window.partitionBy(domain_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        in_scope.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(quotas), domain_col)
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_rk", "_quota")
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "sg",
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: documents that belong
    to the same duplicate CLUSTER always land in the same split, so a
    test document can never have a near-copy in train (the leakage
    mode a per-document hash split cannot prevent).

    ``components`` is connected_components() output (doc_id,
    component, ...); documents absent from it are singletons and use
    their own id.  The split hash runs over the GROUP key, so the
    per-group guarantees of ``hash_split`` (deterministic, stable
    under corpus growth) lift to whole clusters.

    Scale shape: one left equi-join on the id (near-dup components
    cover a small fraction of a real corpus, so AQE broadcasts them
    when bounded), then a pure projection — no extra shuffle beyond
    the join.
    """
    comp = components.select(
        F.col("doc_id").alias(id_col), "component"
    )
    grouped = (
        df.join(comp, id_col, "left")
        .withColumn(
            "group_key",
            F.coalesce(F.col("component"), F.col(id_col)).cast("long"),
        )
        .drop("component")
    )
    return hash_split(grouped, weights, id_col="group_key", salt=salt)


def temperature_shares(
    df: DataFrame,
    domain_col: str,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled (alpha = 1/2) domain sampling weights — the
    multilingual-LM mixing rule p_i ∝ n_i^alpha that upweights rare
    domains relative to raw-frequency sampling.

    alpha is fixed at 1/2 so every quantity stays an exact integer:
    the weight is floor(sqrt(n_i)) (IEEE double sqrt is correctly
    rounded and exact under floor for n < 2^52), and shares are
    integer parts-per-million against exact integer totals — no float
    summation order anywhere, so any engine reproduces the bytes.

    Returns one row per domain: (domain, n_docs, raw_share_ppm,
    temp_share_ppm) where raw = n_i/N and temp = w_i/W, both as
    ppm_scale-denominated integer floors.

    Scale shape: one hash aggregate on the domain key (map-side
    partial combine collapses each partition to |domains| rows), then
    a broadcast of the single-row totals — no other shuffle.  At
    100 TB the aggregate output is |domains| rows regardless of corpus
    size.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    weighted = counts.withColumn(
        "_w", F.floor(F.sqrt(F.col("n_docs"))).cast("long")
    )
    totals = weighted.agg(
        F.sum("n_docs").alias("_tot_n"), F.sum("_w").alias("_tot_w")
    )
    # `div` is exact BIGINT division (float division + floor can flip
    # at integer-boundary quotients once numerators exceed 2^53)
    return weighted.crossJoin(F.broadcast(totals)).select(
        "domain",
        "n_docs",
        F.expr(f"(n_docs * {ppm_scale}L) div _tot_n").alias("raw_share_ppm"),
        F.expr(f"(_w * {ppm_scale}L) div _tot_w").alias("temp_share_ppm"),
    )


def pack_sequences_by_offset(
    df: DataFrame,
    budget: int,
    token_col: str,
    id_col: str = "doc_id",
    salt: str = "sg",
    n_shards: int = 32,
) -> DataFrame:
    """Concatenation-order sequence packing for training export: lay
    the corpus out as one deterministic token stream (ordered by the
    salted hash — the same reproducible permutation ``export_order``
    uses) and assign each document to the training sequence its START
    offset falls in (``seq_id = stream_offset // budget``).  A document
    straddling a boundary stays whole in its starting sequence, so
    sequences may overflow by at most one document — the concat-then-
    chunk-at-document-boundaries discipline.  For strict capacity
    packing see ``pack_sequences_strict``.

    Returns df + (stream_offset, seq_id).

    Scale shape — a GLOBAL running sum without a global window: shards
    are VALUE ranges of the hash (``floor(u · n_shards)``), so
    shard-major order IS global order and the result is independent of
    ``n_shards``; within-shard cumulative sums are one window shuffle,
    and the n_shards shard totals (a bounded collect) prefix-sum on
    the driver into per-shard base offsets broadcast back.  All
    arithmetic is exact: integer token counts, and u·n_shards scales a
    binade when n_shards is a power of two.
    """
    spark = df.sparkSession
    u = uniform_hash(id_col, salt)
    d = df.withColumn("_u", u).withColumn(
        "_shard", F.floor(F.col("_u") * n_shards).cast("int")
    )
    w = (
        Window.partitionBy("_shard")
        .orderBy(F.col("_u").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = d.withColumn("_cum", F.sum(F.col(token_col).cast("long")).over(w))
    totals = sorted(
        (r["_shard"], r["_tot"])
        for r in within.groupBy("_shard").agg(F.max("_cum").alias("_tot")).collect()
    )
    bases, acc = [], 0
    for shard, tot in totals:
        bases.append((shard, acc))
        acc += int(tot)
    base_df = spark.createDataFrame(bases, "_shard int, _base long")
    offset = F.col("_base") + F.col("_cum") - F.col(token_col).cast("long")
    return (
        within.join(F.broadcast(base_df), "_shard")
        .withColumn("stream_offset", offset)
        .withColumn("seq_id", F.floor(F.col("stream_offset") / budget).cast("long"))
        .drop("_u", "_shard", "_cum", "_base")
    )


def pack_sequences_strict(
    df: DataFrame,
    budget: int,
    token_col: str,
    id_col: str = "doc_id",
    salt: str = "sg",
    n_shards: int = 32,
) -> DataFrame:
    """Strict greedy packing: documents in deterministic (hash, id)
    order fill a sequence until the NEXT doc would exceed ``budget``,
    then a new sequence opens — no sequence exceeds the budget unless
    a single document alone does.  Greedy fill is inherently
    sequential, so it runs per shard (an Arrow-batched scan of each
    shard's sorted rows); sequences are shard-local and ids encode as
    ``shard * 2^40 + local_seq`` so they never collide across shards.

    Returns df + (seq_id, seq_fill) where ``seq_fill`` is the
    sequence's running token count after the document."""
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    from pyspark.sql import types as T  # noqa: PLC0415

    u = uniform_hash(id_col, salt)
    d = df.withColumn("_u", u).withColumn(
        "_shard", F.floor(F.col("_u") * n_shards).cast("int")
    )
    out_schema = T.StructType(
        list(d.schema.fields)
        + [T.StructField("seq_id", T.LongType()), T.StructField("seq_fill", T.LongType())]
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_u", id_col]).reset_index(drop=True)
        shard = int(key[0])
        seq, fill = 0, 0
        seqs, fills = [], []
        for tok in pdf[token_col].astype("int64"):
            if fill and fill + tok > budget:
                seq, fill = seq + 1, 0
            fill += int(tok)
            seqs.append((shard << 40) + seq)
            fills.append(fill)
        return pdf.assign(seq_id=pd.Series(seqs, dtype="int64"),
                          seq_fill=pd.Series(fills, dtype="int64"))

    return (
        d.repartition(n_shards, "_shard")
        .groupBy("_shard")
        .applyInPandas(pack, out_schema)
        .drop("_u", "_shard")
    )


def export_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "sg",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training export: order rows by
    their salted hash (a reproducible permutation), range-partitioned
    so output files are evenly sized and the order is total across
    files.  One range shuffle — the same cost as any global sort."""
    u = uniform_hash(id_col, salt).alias("_ord")
    keyed = df.withColumn("_ord", u)
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, F.col("_ord"), F.col(id_col))
        .sortWithinPartitions("_ord", id_col)
        .drop("_ord")
    )


def importance_sample(
    df: DataFrame,
    score_col: str | Column,
    id_col: str = "doc_id",
    salt: str = "is",
) -> DataFrame:
    """Deterministic probability-proportional-to-quality thinning:
    keep each row with probability ``score`` (in [0, 1]) by comparing
    the salted-md5 uniform variate of its id against the score —
    the curriculum/quality-weighted downsampling pass of a
    training-data pipeline, with NO rand(): reproducible under
    repartition, retry, and engine swap.

    Scale: a pure filter projection — zero shuffles at any size.
    """
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    return df.filter(uniform_hash(id_col, salt) < s)


def negative_samples(
    df: DataFrame,
    *,
    k: int = 4,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training
    export: each anchor row draws ``k`` pseudo-random negatives from
    the corpus, reproducibly (no rand(), stable under repartition and
    engine swap).

    Design — NO global rank, NO global sort: the corpus hashes into
    ``n_buckets`` buckets (salted-md5, portable), each bucket is
    represented by its min-id member (one aggregate), and anchor × j
    picks bucket ``h(anchor, j) mod n_buckets`` from the broadcast
    pool.  A 100 TB corpus pays one bucket aggregate and a map-side
    join of the (bounded) pool; anchors never shuffle.  Negatives are
    pool representatives, which is exactly what large-batch
    contrastive samplers do (the pool refreshes with the salt).

    Returns (anchor_id, j, negative_id), self-pairs dropped.
    """
    h_pool = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}-pool"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    pool = (
        df.select(F.col(id_col).alias("negative_id"), h_pool.alias("bucket"))
        .groupBy("bucket")
        .agg(F.min("negative_id").alias("negative_id"))
    )
    anchors = df.select(F.col(id_col).alias("anchor_id")).select(
        "anchor_id", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
    )
    h_sel = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("anchor_id").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                        F.lit(f":{salt}-sel"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    return (
        anchors.withColumn("bucket", h_sel)
        .join(F.broadcast(pool), "bucket")
        .filter(F.col("negative_id") != F.col("anchor_id"))
        .select("anchor_id", "j", "negative_id")
    )
