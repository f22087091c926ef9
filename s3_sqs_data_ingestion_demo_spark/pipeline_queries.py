"""Training-data-pipeline operators as driver-checkable queries.

Each entry pairs the Spark operator (operators/text.py, dedup.py,
similarity.py) with a DuckDB oracle.  Where the operator depends on
shared constants (marker-word lists, stopwords, hash seeds), the
oracle SQL is GENERATED from the same Python constants so the two
sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import similarity as S
from .operators import text as X
from .operators.plan_cache import cached_persist, plan_key, session_token
from .queries import QuerySpec, REGISTRY, query, t

# ---------------------------------------------------------------- SQL
# fragments reused by the generated oracles

_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_SHINGLE_CTE = """
WITH tok AS (
  SELECT doc_id, {toks} AS toks FROM documents
), sh0 AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
              ELSE list_transform(generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS shs
  FROM tok
), sh AS (
  SELECT DISTINCT id, shingle
  FROM (SELECT doc_id AS id, unnest(shs) AS shingle FROM sh0)
), sizes AS (
  SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id
)""".format(toks=_TOKS)


# --------------------------------------------------------------------
# Exact dedup + fingerprinting
# --------------------------------------------------------------------

@query(
    "dedup_exact_documents",
    f"""
    SELECT md5({_NORM}) AS text_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def dedup_exact_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Exact (normalized-content-hash) dedup — one hash aggregate;
    the shuffle carries (hash, id), never document payloads."""
    return D.exact_dedup_keys(t(spark, sf, "documents"))


_DATACARD_ORACLE = f"""
    SELECT
      (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
      (SELECT COUNT(DISTINCT lang) FROM documents)::BIGINT AS n_langs,
      (SELECT COUNT(DISTINCT source) FROM documents)::BIGINT AS n_sources,
      (SELECT SUM(len({{_TOKS}})) FROM documents)::BIGINT AS total_tokens,
      (SELECT SUM(length(text)) FROM documents)::BIGINT AS total_chars,
      (SELECT COUNT(DISTINCT md5({{_NORM}})) FROM documents)::BIGINT
        AS n_unique_texts,
      ((SELECT SUM(length(text)) FROM documents)
         // (SELECT COUNT(*) FROM documents))::BIGINT AS mean_chars,
      (((SELECT COUNT(*) FROM documents)
          - (SELECT COUNT(DISTINCT md5({{_NORM}})) FROM documents))
         * 1000000 // (SELECT COUNT(*) FROM documents))::BIGINT
        AS exact_dup_ppm
    """.replace("{_TOKS}", _TOKS).replace("{_NORM}", _NORM)


@query("corpus_datacard_documents", _DATACARD_ORACLE, driver=False)  # r06: rotated IN; r09: out (green r6-r8)
def corpus_datacard_documents(spark: SparkSession, sf: str) -> DataFrame:
    """One-row corpus data card: doc/lang/source counts, token and
    char totals, distinct normalized texts, exact-duplicate fraction
    (ppm) and mean length — the summary a dataset release ships.

    Plan shape: one full-corpus aggregate for the additive stats plus
    three COLUMN-PRUNED single-distinct aggregates crossJoined as
    1-row frames — deliberately NOT one multi-distinct aggregate,
    whose Expand plan replicates every corpus row once per distinct
    column (profile_table's lesson, the 100 TB killer)."""
    d = t(spark, sf, "documents")
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(X.token_count("text")).cast("bigint").alias("total_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )
    langs = d.agg(F.countDistinct("lang").cast("bigint").alias("n_langs"))
    srcs = d.agg(F.countDistinct("source").cast("bigint").alias("n_sources"))
    uniq = d.agg(
        F.countDistinct(F.md5(X.normalize_text("text")))
        .cast("bigint")
        .alias("n_unique_texts")
    )
    return (
        base.crossJoin(langs).crossJoin(srcs).crossJoin(uniq)
        .select(
            "n_docs", "n_langs", "n_sources", "total_tokens", "total_chars",
            "n_unique_texts",
            F.expr("total_chars div n_docs").cast("bigint").alias("mean_chars"),
            F.expr("((n_docs - n_unique_texts) * 1000000) div n_docs")
            .cast("bigint")
            .alias("exact_dup_ppm"),
        )
    )


def fingerprint_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document content fingerprint (normalize → md5); pure
    projection, zero shuffle.  Driver-verified as part of the combined
    ``text_quality_documents`` profile (one slot in the 50-row gate);
    kept standalone for plan-quality tests and bench."""
    d = t(spark, sf, "documents")
    return d.select("doc_id", X.fingerprint("text").alias("fingerprint"))


# --------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------

def _langid_case() -> str:
    """The generated lang-ID CASE expression (shared by the combined
    text-profile oracle)."""
    score = {
        lang: f"len(list_filter({_TOKS}, x -> x IN ({_in_list(words)})))"
        for lang, words in X.LANG_MARKERS.items()
    }
    cases = []
    for lang in X.LANG_ORDER:
        others = ", ".join(score[o] for o in X.LANG_ORDER if o != lang)
        cases.append(
            f"WHEN {score[lang]} > 0 AND {score[lang]} >= greatest({others}) THEN '{lang}'"
        )
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


def _quality_oracle() -> str:
    stop = _in_list(X.STOPWORDS)
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             length(text) AS n_chars_raw,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
             len(list_filter({_TOKS}, x -> x IN ({stop}))) AS stop_hits
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           ROUND((n_chars_raw - (n_tokens - 1)) * 1.0 / greatest(n_tokens, 1), 4) AS avg_token_len,
           ROUND(punct * 1.0 / greatest(n_chars_raw, 1), 4) AS punct_ratio,
           ROUND(digits * 1.0 / greatest(n_chars_raw, 1), 4) AS digit_ratio,
           ROUND(stop_hits * 1.0 / greatest(n_tokens, 1), 4) AS stopword_ratio,
           ROUND(least(n_tokens / 100.0, 1.0)
                 * (1 - least(punct * 4.0 / greatest(n_chars_raw, 1), 1.0))
                 * (1 - least(digits * 4.0 / greatest(n_chars_raw, 1), 1.0)), 4) AS quality_score,
           {_langid_case()} AS lang_pred,
           md5({_NORM}) AS fingerprint
    FROM base
    """


@query("text_quality_documents", _quality_oracle(), driver=False)  # r05: rotated out (long-green)
def text_quality_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Combined per-document text profile: quality-scoring features,
    marker-word language ID (argmax with fixed tie order — the oracle
    CASE is generated from the same marker table), and the content
    fingerprint, all in one codegen'd projection.  One driver-gate slot
    verifies all three text operators (operators/text.py)."""
    d = t(spark, sf, "documents")
    return X.quality_features(d).select(
        "doc_id", "n_tokens", "avg_token_len", "punct_ratio",
        "digit_ratio", "stopword_ratio", "quality_score",
        X.lang_id("text").alias("lang_pred"),
        X.fingerprint("text").alias("fingerprint"),
    )


# --------------------------------------------------------------------
# Near-duplicate detection
# --------------------------------------------------------------------

_JACCARD_PAIRS_CTE = """
, freq_ok AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {max_freq}
), shf AS (
  SELECT sh.id, sh.shingle FROM sh JOIN freq_ok USING (shingle)
), common AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a AS doc_id_a, id_b AS doc_id_b,
         ROUND(n_common * 1.0 / (na.n_sh + nb.n_sh - n_common), 4) AS jaccard
  FROM common
  JOIN sizes na ON na.id = id_a
  JOIN sizes nb ON nb.id = id_b
  WHERE n_common * 1.0 / (na.n_sh + nb.n_sh - n_common) >= {threshold}
)
"""

_JACCARD_TAIL = _JACCARD_PAIRS_CTE + """
SELECT doc_id_a, doc_id_b, jaccard FROM pairs
"""


@query(
    "jaccard_near_dup_documents",
    _SHINGLE_CTE + _JACCARD_TAIL.format(max_freq=100, threshold=0.12),
    driver=False,
)
def jaccard_near_dup_documents(spark: SparkSession, sf: str) -> DataFrame:
    """3-gram-shingle Jaccard near-dup: co-shingle bucket join (LSH-lite
    candidate generation) + exact verification; stop-shingle frequency
    cap bounds hot buckets."""
    return D.jaccard_near_dup_pairs(
        t(spark, sf, "documents"), threshold=0.12, max_shingle_freq=100
    )


@query(
    "near_dup_clusters_documents",
    _SHINGLE_CTE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _JACCARD_PAIRS_CTE.format(max_freq=100, threshold=0.12)
    + """
    , edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION
      SELECT doc_id_b, doc_id_a FROM pairs
    ), reach(id, r) AS (
      SELECT s, s FROM edges
      UNION
      SELECT re.id, e.d FROM reach re JOIN edges e ON e.s = re.r
    )
    SELECT id AS doc_id,
           CAST(MIN(r) AS BIGINT) AS component,
           CAST(MIN(r) = id AS INTEGER) AS is_canonical
    FROM reach GROUP BY id
    """,
    driver=False,  # r07: rotated out (3 green rounds; pytest parity + bench)
    rank=20,
)
def near_dup_clusters_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate CLUSTERS from the jaccard near-dup pairs: connected
    components by min-label propagation, each cluster keeping its
    smallest doc_id as canonical — the transitive-closure step between
    pair emission and corpus filtering.  DuckDB verifies with a
    recursive reachability CTE (exact closure; feasible at oracle
    scale because near-dup components are small)."""
    prs = D.jaccard_near_dup_pairs(
        t(spark, sf, "documents"), threshold=0.12, max_shingle_freq=100
    )
    return D.connected_components(prs)


def _uh_sigs_cte(num_hashes: int, src: str = "sh") -> str:
    """Signature CTE mirroring the engine's universal-hash minhash
    family (operators/dedup.py ``_uh_params``/``_minhash_sig_col``):
    one 40-bit md5-derived integer per shingle, then per-seed
    (a·x + b) mod P minima — identical constants on both engines, all
    values < 2^61 so signed BIGINT arithmetic agrees exactly."""
    seeds = ", ".join(
        f"({s}, {a}, {b})"
        for s, (a, b) in ((s, D._uh_params(s)) for s in range(num_hashes))
    )
    return f"""
, shx AS (
  SELECT id,
         CAST(('0x' || substring(md5(shingle), 1, 10))::UBIGINT AS BIGINT) AS x
  FROM {src}
), seeds(s, a, b) AS (
  VALUES {seeds}
), sigs AS (
  SELECT id, seeds.s AS s, MIN((seeds.a * x + seeds.b) % {D.MINHASH_P}) AS h
  FROM shx, seeds GROUP BY id, seeds.s
)"""


def _minhash_oracle(num_hashes: int = 16, bands: int = 4, threshold: float = 0.12, max_band_freq: int = 10_000) -> str:
    rows = num_hashes // bands
    return _SHINGLE_CTE + _uh_sigs_cte(num_hashes) + f"""
, bands AS (
  SELECT id, s // {rows} AS band,
         string_agg(h::VARCHAR, '|' ORDER BY s) AS key
  FROM sigs GROUP BY id, s // {rows}
), band_ok AS (
  SELECT band, key FROM bands GROUP BY band, key
  HAVING COUNT(*) BETWEEN 2 AND {max_band_freq}
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a
  JOIN band_ok USING (band, key)
  JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id
), common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id_a AS doc_id_a, id_b AS doc_id_b,
       ROUND(n_common * 1.0 / (na.n_sh + nb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes na ON na.id = id_a
JOIN sizes nb ON nb.id = id_b
WHERE n_common * 1.0 / (na.n_sh + nb.n_sh - n_common) >= {threshold}
"""


@query("minhash_lsh_near_dup_documents", _minhash_oracle(), driver=False)  # r05: rotated out (long-green)
def minhash_lsh_near_dup_documents(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) near-dup: constant-size signatures →
    band-key join → exact-Jaccard verification of candidates only.
    md5 is the seeded hash family, so the oracle replicates it."""
    return D.minhash_dedup_pairs(
        t(spark, sf, "documents"), num_hashes=16, bands=4, threshold=0.12
    )


@query(
    "q_array_function_surface",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER)                      AS n_toks,
           CAST(len(list_distinct(toks)) AS INTEGER)       AS n_uniq,
           list_contains(toks, 'spark')                    AS has_spark,
           array_to_string(toks[1:3], ' ')                 AS first3,
           list_sort(list_distinct(toks))[1]               AS first_alpha,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INTEGER) AS n_long,
           array_to_string(list_reverse_sort(list_distinct(toks))[1:2], '|') AS top2_rev
    FROM tok
    """,
    driver=False,  # r03: rotated out (long-green; still in pytest parity + bench)
)
def q_array_function_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Collection-function surface: size, distinct, contains, slice,
    sort, lambda filter, reverse sort — Spark array functions matched
    against DuckDB list functions on the token arrays."""
    d = t(spark, sf, "documents")
    toks = X.tokens("text")
    uniq = F.array_distinct(toks)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(uniq).alias("n_uniq"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("first3"),
        F.element_at(F.array_sort(uniq), 1).alias("first_alpha"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.concat_ws("|", F.slice(F.sort_array(uniq, asc=False), 1, 2)).alias("top2_rev"),
    )


@query(
    "q_top_bigrams",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), bg0 AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                  ELSE list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1]) END AS bgs
      FROM tok
    ), bg AS (
      SELECT doc_id, unnest(bgs) AS bigram FROM bg0
    )
    SELECT bigram,
           CAST(COUNT(*) AS BIGINT)                 AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT)   AS n_docs
    FROM bg
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram
    LIMIT 25
    """,
    driver=False,
)
def q_top_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus bigram frequency profile (top 25): shingle explode →
    count + per-doc distinct count — the n-gram statistics pass every
    corpus-analysis pipeline runs; deterministic tiebreak on the
    bigram string."""
    d = t(spark, sf, "documents")
    bg = d.select(
        "doc_id", F.explode(D.shingles("text", 2)).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram"))
        .limit(25)
    )


def _simhash_oracle(max_hamming: int = 8, max_band_freq: int = 10_000) -> str:
    from .operators.dedup import SIMHASH_BANDS, SIMHASH_BITS

    rows = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << rows) - 1
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    sig_expr = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), tk AS (
      SELECT doc_id AS id, unnest(toks) AS tok FROM tok
    ), th AS (
      SELECT id, ('0x' || substring(md5(tok), 1, 15))::UBIGINT AS h FROM tk
    ), sums AS (
      SELECT id, {bit_sums} FROM th GROUP BY id
    ), sig AS (
      SELECT id, CAST({sig_expr} AS BIGINT) AS simhash FROM sums
    ), bands AS (
      SELECT id, g.b AS band, (simhash >> (g.b * {rows})) & {mask} AS key
      FROM sig, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS b) g
    ), band_ok AS (
      SELECT band, key FROM bands GROUP BY band, key
      HAVING COUNT(*) BETWEEN 2 AND {max_band_freq}
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a
      JOIN band_ok USING (band, key)
      JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    )
    SELECT id_a AS doc_id_a, id_b AS doc_id_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
    FROM cand
    JOIN sig sa ON sa.id = id_a
    JOIN sig sb ON sb.id = id_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
    """


@query("simhash_near_dup_documents", _simhash_oracle(8),
       driver=False)  # r07: rotated out (6 green rounds; pytest parity + bench)
def simhash_near_dup_documents(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup: 60-bit sign-vector signatures (portable
    md5-derived token hashes), 4×15-bit band candidate buckets, exact
    hamming verification — constant-size state per doc, oracle-
    replicable bit-for-bit."""
    return D.simhash_near_dup_pairs(t(spark, sf, "documents"), max_hamming=8)


# --------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------

@query(
    "ann_cosine_topk",
    """
    WITH q AS (  -- norm as a per-row COLUMN, mirroring the engine
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
      FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             ROUND(list_dot_product(qv, cv) / (qn * cn), 4) AS cosine_sim
      FROM q, c WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM s
    ) WHERE rank <= 5
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors: broadcast the
    query set, one corpus pass, per-query window top-k.  The exact
    baseline that the LSH variant is measured against."""
    return _exact_topk5(spark, sf)


def _exact_topk5(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-5 for the vec_id<10 query set — the shared
    ground truth both ``ann_cosine_topk`` and the IVF-PQ recall check
    score against; cached so a session computes it once."""
    e = t(spark, sf, "embeddings")
    return cached_persist(
        S.cosine_topk(e.filter(F.col("vec_id") < 10), e, k=5),
        plan_key(e, "cosine_topk5", "q<10"),
    )


@query(
    "token_budget_documents",
    f"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{X.BPE_ISH_PATTERN}')) AS INTEGER)
               AS bpe_ish_tokens
    FROM documents
    """,
    driver=False,  # r06: rotated out (long-green; pytest parity + bench)
)
def token_budget_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Token budgeting: whitespace tokens vs BPE-ish pre-tokens
    (letter/digit runs + symbols) per document — pure projection."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        X.token_count("text").alias("ws_tokens"),
        X.bpe_ish_token_count("text").alias("bpe_ish_tokens"),
    )


@query(
    "embedding_cosine_near_dup",
    """
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                 4) AS cosine_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.35
    """,
    rank=10,
    driver=False,  # r06: rotated out (long-green; pytest parity + bench)
)
def embedding_cosine_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact embedding near-dup: all pairs with cosine >= threshold,
    computed as blocked GEMM (hash tiles → one BLAS matmul per block
    pair via applyInPandas).  The exact baseline the LSH variant
    approximates — and the one deliberate Arrow/numpy operator in the
    suite: expression-level pairwise dots are interpreted per element
    and ~20× slower at O(n²) pair volume."""
    # n_blocks derives from the corpus count so tile memory stays
    # bounded at any scale (VERDICT r01 #4)
    return _gemm_pairs(spark, sf)


def _gemm_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact blocked-GEMM cosine pairs at the 0.35 threshold — the
    baseline relation shared by ``embedding_cosine_near_dup`` and the
    LSH recall check; cached so a session computes it once."""
    emb = t(spark, sf, "embeddings")
    return cached_persist(
        S.blocked_cosine_pairs(emb, threshold=0.35),
        plan_key(emb, "gemm_pairs", 0.35),
    )


def _lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """LSH near-dup pairs at the shared (4 planes × 8 tables, 0.35)
    setting — one relation for the pairs view and the recall check."""
    emb = t(spark, sf, "embeddings")
    return cached_persist(
        S.lsh_cosine_pairs(emb, n_planes=4, n_tables=8, dim=64, threshold=0.35),
        plan_key(emb, "lsh_pairs", 4, 8, 0.35),
    )


@query("lsh_cosine_near_dup", None, driver=False)  # pairs view: bench + pytest; driver check is the companion below
def lsh_cosine_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH near-dup over embeddings: 8 tables × 4
    sign bits (≈70% recall at cosine 0.35 on random vectors) → capped
    in-bucket blocked-GEMM verify → cross-table pair dedup.  The pair
    SET is bucket-membership-dependent (float-sign boundaries differ
    across engines), so the hard driver check lives in the companion
    ``lsh_cosine_recall_check``; recall vs the exact GEMM baseline is
    also pinned by tests/test_skew_and_ivf.py."""
    return _lsh_pairs(spark, sf)


@query(
    "lsh_cosine_recall_check",
    """
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), exact_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
            >= 0.35
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           CAST(0 AS BIGINT)        AS n_false_positives,
           CAST(1 AS INTEGER)       AS recall_ge_half
    FROM exact_pairs
    """,
    rank=10,
    driver=False,  # r06: rotated out (long-green; pytest parity + bench)
)
def lsh_cosine_recall_check(spark: SparkSession, sf: str) -> DataFrame:
    """Hard driver check for the LSH near-dup operator (VERDICT r02 #2).

    The LSH pair SET itself can't be oracle-compared (bucket membership
    flips on float-sign boundaries across engines), but three integers
    about it are deterministic and DuckDB-checkable:

    - ``n_exact_pairs``: the exact blocked-GEMM baseline pair count —
      DuckDB computes the same all-pairs cosine join, so a mismatch
      catches any regression in the exact side both operators share.
    - ``n_false_positives``: LSH pairs absent from the exact set.  The
      operator verifies every candidate in-bucket with exact cosine at
      float64, so this is structurally 0 — precision is exact by
      construction, and any nonzero value is a real bug.
    - ``recall_ge_half``: LSH is seeded/deterministic within Spark;
      measured recall is ~0.74 at (k=4, L=8, cos≥0.35), so the 0.5
      floor has wide margin against plane-boundary flips.
    """
    exact = _gemm_pairs(spark, sf).select("id_a", "id_b")
    lsh = _lsh_pairs(spark, sf).select("id_a", "id_b")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_tp = (
        lsh.join(exact, ["id_a", "id_b"])
        .agg(F.count(F.lit(1)).alias("n_tp"))
    )
    return (
        n_exact.crossJoin(n_lsh).crossJoin(n_tp)
        .select(
            "n_exact_pairs",
            (F.col("n_lsh") - F.col("n_tp")).alias("n_false_positives"),
            (F.col("n_tp") * 2 >= F.col("n_exact_pairs"))
            .cast("int")
            .alias("recall_ge_half"),
        )
    )


@query("pq_ann_topk", None, driver=False)  # rows-only: float-argmin codes are engine-specific
def pq_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN: train codebooks on a bounded sample,
    encode the corpus to m small codes (one Arrow scan, ~16x smaller
    than the raw embeddings), answer top-k by ADC table lookups —
    the compressed-index path you run at 100 TB when even IVF's raw
    vectors don't fit the cache tier.  Recall vs exact cosine is
    pinned by tests/test_pq.py; bench + pytest coverage (the driver
    view is budget-capped and PQ codes aren't SQL-expressible)."""
    from .operators import pq as PQ  # noqa: PLC0415

    emb = t(spark, sf, "embeddings")
    cb = PQ.pq_train(emb, m=16, ksub=64)
    codes = PQ.pq_encode(emb, cb)
    return PQ.pq_topk(emb.filter(F.col("vec_id") < 10), codes, cb, k=5)


# Session-keyed cache of the built IVF-PQ index: (centroids, trained
# codebooks, persisted encode scan).  The codebook is a driver-side
# ndarray — not a DataFrame — so it lives here rather than in the plan
# cache; the pairs view and the recall check then share one train +
# encode instead of rebuilding the index per query, exactly as a real
# deployment serves many queries from one persistent index.
_IVFPQ_INDEX_CACHE: dict[tuple, tuple] = {}
_IVFPQ_INDEX_CACHE_MAX = 4


def _ivfpq_parts(spark: SparkSession, sf: str):
    """Shared IVF-PQ build: label-centroid coarse cells, residual PQ
    codebooks, one-scan encode.  nprobe=4 of the ~10 label cells keeps
    the probe-vs-recall trade visible (full probe would be exact-IVF)."""
    from pyspark import StorageLevel  # noqa: PLC0415

    from .operators import pq as PQ  # noqa: PLC0415

    key = (session_token(spark), sf)
    hit = _IVFPQ_INDEX_CACHE.get(key)
    if hit is None:
        emb = t(spark, sf, "embeddings")
        cents = S.label_centroids(emb)
        cb = PQ.ivfpq_train(emb, cents, m=16, ksub=64)
        index = PQ.ivfpq_encode(emb, cents, cb).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _IVFPQ_INDEX_CACHE[key] = hit = (emb, cents, cb, index)
        while len(_IVFPQ_INDEX_CACHE) > _IVFPQ_INDEX_CACHE_MAX:
            oldest = next(iter(_IVFPQ_INDEX_CACHE))
            _, _, _, old_index = _IVFPQ_INDEX_CACHE.pop(oldest)
            try:
                old_index.unpersist()
            except Exception:
                pass
    emb, cents, cb, index = hit
    queries = emb.filter(F.col("vec_id") < 10)
    topk = PQ.ivfpq_topk(queries, index, cents, cb, k=5, nprobe=4)
    return emb, queries, topk


@query("ivfpq_ann_topk", None, driver=False)  # rows-only pairs view: bench + pytest; driver check below
def ivfpq_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ ANN top-k (operators/pq.py:222-371): coarse cells prune
    the corpus to nprobe cells per query, residual PQ codes answer by
    ADC lookups + exact cell bias — the composed index you run at
    100 TB (cells bound the scan, codes bound the bytes).  The pair
    SET depends on float-argmin code assignment, so the hard driver
    check is the companion ``ivfpq_recall_check``."""
    return _ivfpq_parts(spark, sf)[2]


@query(
    "ivfpq_recall_check",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(1 AS INTEGER)       AS k_rows_ok,
           CAST(1 AS INTEGER)       AS recall_ge_floor
    FROM embeddings WHERE vec_id < 10
    """,
    rank=30,
    driver=False,  # r06: rotated out (long-green; pytest parity + bench)
)
def ivfpq_recall_check(spark: SparkSession, sf: str) -> DataFrame:
    """Hard driver check for IVF-PQ (VERDICT r02 #5, pattern of #2):

    - ``n_queries``: query-set cardinality — DuckDB-computable.
    - ``k_rows_ok``: the index returned exactly k rows per query
      (probed cells at nprobe=4 of ~10 always hold ≥k members here).
    - ``recall_ge_floor``: overlap with the exact cosine top-k ≥ 25%
      of ideal.  The pipeline is deterministic within Spark (label
      centroids, argmin codes, id tiebreaks); measured recall is
      0.44–0.46 at these settings (saturates ≈0.5–0.6 at full probe —
      PQ quantization error dominates on random embeddings), so the
      0.25 floor has ~1.8× margin."""
    emb, queries, topk = _ivfpq_parts(spark, sf)
    k = 5
    exact = S.cosine_topk(queries, emb, k=k).select("query_id", "neighbor_id")
    ivf = topk.select("query_id", "neighbor_id")
    n_q = queries.agg(F.count(F.lit(1)).alias("n_queries"))
    n_ivf = ivf.agg(F.count(F.lit(1)).alias("n_ivf"))
    n_tp = ivf.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_tp")
    )
    return (
        n_q.crossJoin(n_ivf).crossJoin(n_tp)
        .select(
            "n_queries",
            (F.col("n_ivf") == F.col("n_queries") * k)
            .cast("int")
            .alias("k_rows_ok"),
            (F.col("n_tp") * 4 >= F.col("n_queries") * k)
            .cast("int")
            .alias("recall_ge_floor"),
        )
    )


# --------------------------------------------------------------------
# Deterministic sampling / splitting / mixing + decontamination
# (operators/sampling.py, dedup.benchmark_contamination) — the corpus-
# assembly operators of a training run, all hash-deterministic and
# therefore exactly oracle-checkable.  driver=False: the 50-row driver
# view is full; full-registry parity (tests/test_oracle_parity.py) and
# bench cover them.
# --------------------------------------------------------------------

from .operators import sampling as SA  # noqa: E402


_U_DOC = SA.uniform_hash_sql("doc_id")
_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _split_case_sql(weights: dict[str, float]) -> str:
    """CASE expression with thresholds accumulated in PYTHON floats and
    embedded via repr, so the oracle compares against the bit-identical
    doubles the Spark operator uses (0.9 + 0.05 is 0.9500000000000001
    in IEEE — a literal 0.95 in SQL would be a different double)."""
    items = list(weights.items())
    acc, cases = 0.0, []
    for name, w in items[:-1]:
        acc += w
        cases.append(f"WHEN u < CAST({acc!r} AS DOUBLE) THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{items[-1][0]}' END"


@query(
    "hash_split_documents",
    f"""
    SELECT doc_id, {_split_case_sql(_SPLIT_WEIGHTS)} AS split
    FROM (SELECT doc_id, {_U_DOC} AS u FROM documents)
    """,
    rank=20,
    driver=False,  # r06: rotated out (long-green; pytest parity + bench)
)
def hash_split_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment: salted-hash thresholds,
    pure projection (no RNG, no shuffle; a row's split is stable under
    repartitioning and corpus growth)."""
    d = t(spark, sf, "documents")
    return SA.hash_split(d, _SPLIT_WEIGHTS).select("doc_id", "split")


@query(
    "stratified_sample_documents",
    f"""
    SELECT doc_id, lang
    FROM (SELECT doc_id, lang, {_U_DOC} AS u FROM documents)
    WHERE u < CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                        WHEN 'de' THEN CAST(1.0 AS DOUBLE)
                        WHEN 'zh' THEN CAST(0.25 AS DOUBLE)
                        ELSE CAST(0.125 AS DOUBLE) END
    """,
    rank=20,
    driver=False,  # r06: rotated out (long-green; pytest parity + bench)
)
def stratified_sample_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language downsampling (the reproducible form
    of sampleBy): keep-fractions are exact binary doubles so the
    threshold comparison is bit-identical in any engine."""
    d = t(spark, sf, "documents")
    return SA.stratified_sample(
        d, "lang", {"en": 0.5, "de": 1.0, "zh": 0.25}, default_fraction=0.125
    ).select("doc_id", "lang")


@query(
    "domain_mix_documents",
    f"""
    WITH scoped AS (
      SELECT doc_id, source, {_U_DOC} AS u
      FROM documents WHERE source IN ('src0', 'src1', 'src2')
    ), counts AS (
      SELECT source, COUNT(*) AS n_avail,
             CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
                         WHEN 'src1' THEN CAST(0.25 AS DOUBLE)
                         ELSE CAST(0.25 AS DOUBLE) END AS share
      FROM scoped GROUP BY source
    ), tot AS (
      SELECT FLOOR(MIN(n_avail / share)) AS total FROM counts
    ), quotas AS (
      SELECT source, CAST(FLOOR(share * (SELECT total FROM tot)) AS BIGINT) AS quota
      FROM counts
    ), ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, doc_id) AS rk
      FROM scoped
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quotas q USING (source) WHERE r.rk <= q.quota
    """,
    rank=20,
    driver=False,  # r06: rotated out (long-green; pytest parity + bench)
)
def domain_mix_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-proportion domain mixing (50/25/25 over three sources):
    the scarcest domain caps the total, each domain contributes its
    quota as its lowest-hash rows — deterministic, one shuffle."""
    d = t(spark, sf, "documents")
    return SA.domain_mix(
        d, "source", {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    ).select("doc_id", "source")


@query(
    "pack_sequences_documents",
    f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             {_U_DOC} AS u
      FROM documents
    ), s AS (
      SELECT *, CAST(FLOOR(u * 32) AS INT) AS shard FROM d
    ), cum AS (
      SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY u, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    ), tots AS (
      SELECT shard, MAX(cum) AS tot FROM cum GROUP BY shard
    ), bases AS (
      SELECT shard, CAST(COALESCE(SUM(tot) OVER (ORDER BY shard
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
      FROM tots
    )
    SELECT c.doc_id,
           CAST(c.n_tokens AS INTEGER) AS n_tokens,
           CAST(b.base + c.cum - c.n_tokens AS BIGINT) AS stream_offset,
           CAST(FLOOR((b.base + c.cum - c.n_tokens) / 512.0) AS BIGINT) AS seq_id
    FROM cum c JOIN bases b USING (shard)
    """,
    driver=False,  # r07: rotated out (3 green rounds; pytest parity + bench)
    rank=20,
)
def pack_sequences_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Concatenation-order sequence packing (training export): each
    document's offset in the deterministic global token stream and the
    512-token training sequence its start falls in — the global
    prefix-sum computed shard-wise (value-range shards, so the result
    is shard-count-independent)."""
    d = t(spark, sf, "documents").select(
        "doc_id", X.token_count("text").alias("n_tokens")
    )
    out = SA.pack_sequences_by_offset(d, budget=512, token_col="n_tokens")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "stream_offset",
        "seq_id",
    )


@query(
    "contamination_check_documents",
    f"""
    {_SHINGLE_CTE}
    , bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 50 = 0)
    , hits AS (
      SELECT s.id, COUNT(*) AS n_overlap
      FROM sh s JOIN bench b USING (shingle) GROUP BY s.id
    )
    SELECT z.id AS doc_id,
           CAST(z.n_sh AS INTEGER) AS n_shingles,
           CAST(COALESCE(h.n_overlap, 0) AS INTEGER) AS n_overlap,
           ROUND(COALESCE(h.n_overlap, 0) * 1.0 / z.n_sh, 4) + 0.0 AS overlap_ratio,
           CAST(COALESCE(h.n_overlap, 0) * 1.0 / z.n_sh >= 0.5 AS INTEGER)
               AS contaminated
    FROM sizes z LEFT JOIN hits h ON z.id = h.id
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def contamination_check_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: per-document shingle overlap against
    a benchmark slice (every 50th doc stands in for an eval suite).
    The benchmark docs themselves score overlap 1.0, so the flag's
    positive path is always exercised."""
    d = t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    return D.benchmark_contamination(d, bench, threshold=0.5)


_NLL_VOCAB_K = 500  # non-default cap: real OOV mass at every test SF

_UNIGRAM_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
    ), total AS (
      SELECT SUM(c) AS n_total FROM freq
    ), vocab AS (
      SELECT tok, c FROM freq ORDER BY c DESC, tok LIMIT {_NLL_VOCAB_K}
    ), inv AS (
      SELECT SUM(c) AS n_in_vocab FROM vocab
    ), micro AS (
      SELECT t.doc_id,
             CAST(ROUND(-ln(
               COALESCE(v.c, (SELECT n_total FROM total)
                             - (SELECT n_in_vocab FROM inv))
               * 1.0 / (SELECT n_total FROM total)) * 1000000.0)
             AS BIGINT) AS nll_micro
      FROM tok t LEFT JOIN vocab v USING (tok)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_tokens,
           ROUND(CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
             + 0.0 AS avg_nll,
           CAST(FLOOR(ROUND(CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*)
                            / 1000000.0, 4) + 0.0) AS INTEGER) AS nll_bucket
    FROM micro
    GROUP BY doc_id
    """


@query(
    "unigram_nll_documents",
    _UNIGRAM_ORACLE,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def unigram_nll_documents(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-shaped LM quality filter: per-document pseudo-perplexity
    (mean negative log-likelihood under the corpus unigram model) with
    integer quality buckets — train-with-one-agg, score-by-join, the
    dataflow a real KenLM-backed filter runs at 100 TB.  Runs in the
    PRODUCTION configuration: vocabulary capped to the top
    {_NLL_VOCAB_K} tokens + an OOV residual-mass bucket, the capped
    table explicitly broadcast; per-token NLLs quantized to integer
    micronats so the aggregation is an exact integer sum on both
    engines (no float-summation-order sensitivity)."""
    from .operators import scoring as SC  # noqa: PLC0415

    return SC.unigram_nll_scores(
        t(spark, sf, "documents"), top_k_vocab=_NLL_VOCAB_K
    )


__all__ = ["REGISTRY", "QuerySpec"]


# --------------------------------------------------------------------
# End-to-end curation pipeline as a checked query
# --------------------------------------------------------------------

def _curation_oracle(
    min_quality: float = 0.1,
    min_tokens: int = 5,
    threshold: float = 0.3,
    num_hashes: int = 16,
    bands: int = 4,
    max_band_freq: int = 10_000,
) -> str:
    """Compose the quality / fingerprint-dedup / minhash oracle
    fragments into the full curation chain, re-sourced onto the
    intermediate CTEs (generated from the same constants as the
    operators, like every other oracle here)."""
    rows = num_hashes // bands
    shingle_chain = (
        _SHINGLE_CTE.replace("WITH tok AS (", ", tok AS (")
        .replace("FROM documents", "FROM exact_docs")
    )
    return f"""
    WITH feats AS (
      SELECT doc_id, text,
             length(text) AS n_chars_raw,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits
      FROM documents
    ), scored AS (
      SELECT doc_id, text, CAST(n_tokens AS INTEGER) AS n_tokens,
             ROUND(least(n_tokens / 100.0, 1.0)
                   * (1 - least(punct * 4.0 / greatest(n_chars_raw, 1), 1.0))
                   * (1 - least(digits * 4.0 / greatest(n_chars_raw, 1), 1.0)), 4)
               AS quality_score
      FROM feats
      WHERE ROUND(least(n_tokens / 100.0, 1.0)
                  * (1 - least(punct * 4.0 / greatest(n_chars_raw, 1), 1.0))
                  * (1 - least(digits * 4.0 / greatest(n_chars_raw, 1), 1.0)), 4)
            >= {min_quality}
        AND n_tokens >= {min_tokens}
    ), exact_docs AS (
      SELECT doc_id, text, n_tokens, quality_score FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn
        FROM scored
      ) WHERE rn = 1
    ){shingle_chain}{_uh_sigs_cte(num_hashes)}, bands AS (
      SELECT id, s // {rows} AS band,
             string_agg(h::VARCHAR, '|' ORDER BY s) AS key
      FROM sigs GROUP BY id, s // {rows}
    ), band_ok AS (
      SELECT band, key FROM bands GROUP BY band, key
      HAVING COUNT(*) BETWEEN 2 AND {max_band_freq}
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a
      JOIN band_ok USING (band, key)
      JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ), common AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.id = c.id_a
      JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ), losers AS (
      SELECT DISTINCT id_b
      FROM common
      JOIN sizes na ON na.id = id_a
      JOIN sizes nb ON nb.id = id_b
      WHERE n_common * 1.0 / (na.n_sh + nb.n_sh - n_common) >= {threshold}
    )
    SELECT doc_id, n_tokens, quality_score,
           CAST(len(regexp_extract_all(text, '{X.BPE_ISH_PATTERN}')) AS INTEGER)
             AS bpe_ish_tokens
    FROM exact_docs
    WHERE doc_id NOT IN (SELECT id_b FROM losers)
    """


@query("curated_documents", _curation_oracle(), rank=10,
       driver=False)  # r06: rotated out (long-green; pytest parity + bench)
def curated_documents(spark: SparkSession, sf: str) -> DataFrame:
    """The full curation pipeline as one checked query: quality gate ->
    fingerprint exact dedup -> MinHash-LSH near-dup removal -> token
    budget (operators/curation.py); the oracle composes the same
    fragment chain over intermediate CTEs."""
    from .operators.curation import curate_corpus  # noqa: PLC0415

    kept = curate_corpus(
        t(spark, sf, "documents"), min_quality=0.1, min_tokens=5,
        near_dup_threshold=0.3,
    )
    return kept.select("doc_id", "n_tokens", "quality_score", "bpe_ish_tokens")


# --------------------------------------------------------------------
# Multimodal plumbing as a driver-checkable query
# --------------------------------------------------------------------

_MEDIA_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT)
              WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         encode(substring(text, 1, 16)) AS payload,
         CAST((doc_id * 37) % 5000 AS BIGINT) AS duration_ms
  FROM documents
), stats AS (
  SELECT media_id, modality, duration_ms,
         octet_length(payload) AS payload_bytes,
         sha256(substring(text, 1, 16)) AS payload_sha256
  FROM media JOIN documents ON doc_id = media_id
), dd AS (
  SELECT payload_sha256, COUNT(*) AS n_copies, MIN(media_id) AS keeper_id
  FROM stats GROUP BY 1
)
SELECT CAST((SELECT COUNT(*) FROM stats) AS BIGINT)                    AS n_media,
       CAST((SELECT COUNT(*) FROM stats WHERE modality = 'video') AS BIGINT)
                                                                       AS n_video,
       CAST((SELECT SUM(payload_bytes) FROM stats) AS BIGINT)          AS total_bytes,
       CAST((SELECT COUNT(*) FROM dd) AS BIGINT)                       AS n_uniq_payloads,
       CAST((SELECT SUM(n_copies - 1) FROM dd) AS BIGINT)              AS n_dup_copies,
       CAST((SELECT SUM(keeper_id) FROM dd) AS BIGINT)                 AS keeper_id_sum,
       CAST((SELECT SUM(CAST(FLOOR(GREATEST(duration_ms - 1, 0) / 1000) + 1 AS BIGINT))
             FROM stats WHERE modality = 'video') AS BIGINT)           AS n_video_frames
"""


@query("media_pipeline_documents", _MEDIA_ORACLE, rank=20,
       driver=False)  # r07: rotated out (3 green rounds; pytest parity + bench)
def media_pipeline_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal column plumbing (operators/multimodal.py) under the
    driver gate: synthesize a deterministic media table from
    ``documents`` (payload = UTF-8 bytes of a 16-char text prefix so
    exact-duplicate payloads actually occur, modality round-robin by
    id, metadata struct with a derived duration), then run the REAL
    operators — ``attach_payload_stats`` (JVM-side byte length +
    sha256), ``dedup_media_exact`` (hash-group dedup), and
    ``sample_video_frames`` (metadata-driven frame explode) — and
    fold everything into one integer-stats row the DuckDB oracle
    recomputes from first principles (DuckDB ``sha256(VARCHAR)``
    hashes the same UTF-8 bytes Spark's ``sha2(encode(...))`` does).

    Scale notes: payload bytes never shuffle — stats project scalars,
    dedup shuffles (hash, id), frames explode from metadata only."""
    from .operators import multimodal as M  # noqa: PLC0415

    docs = t(spark, sf, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.substring(F.col("text"), 1, 16), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("doc_id") * 37 % 5000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    stats = M.attach_payload_stats(media)
    per_media = stats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum((F.col("modality") == "video").cast("long")).alias("n_video"),
        F.sum("payload_bytes").alias("total_bytes"),
    )
    dd = M.dedup_media_exact(media).agg(
        F.count(F.lit(1)).alias("n_uniq_payloads"),
        F.sum(F.col("n_copies") - 1).alias("n_dup_copies"),
        F.sum("keeper_id").alias("keeper_id_sum"),
    )
    frames = (
        M.sample_video_frames(media, every_ms=1000)
        .agg(F.count(F.lit(1)).alias("n_video_frames"))
    )
    return per_media.crossJoin(dd).crossJoin(frames)


# --------------------------------------------------------------------
# Chunking + model-scoring export operators
# --------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_OVERLAP = 32, 8
_CHUNK_STEP = _CHUNK_SIZE - _CHUNK_OVERLAP

_CHUNK_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), base AS (
      SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0
    ), c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               CAST((GREATEST(n - {_CHUNK_OVERLAP}, 1) + {_CHUNK_STEP - 1})
                    // {_CHUNK_STEP} AS INT) - 1)) AS chunk_id
      FROM base
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(toks[chunk_id * {_CHUNK_STEP} + 1 :
                         chunk_id * {_CHUNK_STEP} + {_CHUNK_SIZE}]) AS INT)
             AS n_chunk_tokens,
           md5(array_to_string(toks[chunk_id * {_CHUNK_STEP} + 1 :
                                    chunk_id * {_CHUNK_STEP} + {_CHUNK_SIZE}], ' '))
             AS chunk_hash
    FROM c
    """


@query("chunk_documents", _CHUNK_ORACLE, rank=20,
       driver=False)  # r06: rotated out (long-green; pytest parity + bench)
def chunk_documents_q(spark: SparkSession, sf: str) -> DataFrame:
    """Token-window chunking for training/RAG export
    (operators/text.py chunk_documents): overlapping fixed-size token
    windows, emitted as (doc_id, chunk_id, size, md5) so payloads never
    ride the comparison.  Pure projection + generator — ZERO shuffles
    at any corpus size."""
    return X.chunk_documents(
        t(spark, sf, "documents"), chunk_size=_CHUNK_SIZE, overlap=_CHUNK_OVERLAP
    )


from .operators.sampling import uniform_hash_sql as _uh_sql  # noqa: E402

_MODEL_SALT = "quality-v0"

_MODEL_ORACLE = f"""
    SELECT doc_id,
           ROUND({_uh_sql("COALESCE(text, '')", _MODEL_SALT)}, 4) + 0.0 AS model_score,
           CAST(FLOOR({_uh_sql("COALESCE(text, '')", _MODEL_SALT)} * 10) AS INT) AS score_bucket
    FROM documents
    """


@query("model_score_documents", _MODEL_ORACLE, rank=20,
       driver=False)  # r06: rotated out (long-green; pytest parity + bench)
def model_score_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Batch model-inference plumbing (operators/inference.py): Arrow-
    batched ``mapInPandas`` scoring pass with the deterministic hash
    stub standing in for the model forward — the stub is what makes
    this oracle-checkable; the batching/schema/memory contract is what
    a real classifier or reward model would run on at 100 TB."""
    from .operators import inference as I  # noqa: PLC0415

    out = I.model_score(t(spark, sf, "documents"), salt=_MODEL_SALT)
    return out.select(
        "doc_id",
        (F.round("model_score", 4) + F.lit(0.0)).alias("model_score"),
        "score_bucket",
    )


_QUANT_ORACLE = """
    WITH q AS (
      SELECT vec_id,
             len(embedding) AS n_dims,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS amax,
             embedding
      FROM embeddings
    ), codes AS (
      SELECT vec_id, n_dims, amax,
             list_transform(embedding,
               x -> CASE WHEN amax = 0 THEN 0
                         ELSE CAST(ROUND(CAST(x AS DOUBLE) / amax * 127.0)
                                   AS INTEGER) END) AS cs
      FROM q
    )
    SELECT vec_id,
           CAST(n_dims AS INTEGER) AS n_dims,
           ROUND(amax / 127.0, 6) + 0.0 AS scale_r,
           CAST(list_sum(cs) AS BIGINT) AS code_sum,
           CAST(list_min(cs) AS INTEGER) AS code_min,
           CAST(list_max(cs) AS INTEGER) AS code_max
    FROM codes
    """


# r07: rotated out (long-green; pytest parity + bench)
@query("embedding_quantize_int8", _QUANT_ORACLE, driver=False, rank=20)
def embedding_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 embedding quantization
    (operators/similarity.py quantize_int8) under the driver gate:
    per-vector scale + integer code statistics (sum/min/max fold the
    whole code array into exactly-checkable integers).  Zero-shuffle
    JVM projection; double-forced arithmetic makes DuckDB recompute
    identical codes from the same floats."""
    out = S.quantize_int8(t(spark, sf, "embeddings"))
    code_sum = F.aggregate(
        "codes", F.lit(0).cast("long"), lambda acc, c: acc + c.cast("long")
    )
    return out.select(
        F.col("id").alias("vec_id"),
        "n_dims",
        (F.round("scale", 6) + F.lit(0.0)).alias("scale_r"),
        code_sum.alias("code_sum"),
        F.array_min("codes").cast("int").alias("code_min"),
        F.array_max("codes").cast("int").alias("code_max"),
    )


_BIGRAM_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), pos AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 1)) AS i
      FROM tok WHERE len(toks) >= 2
    ), bi AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos
    ), cb AS (
      SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(cb) AS c1 FROM cb GROUP BY w1
    ), uni AS (
      SELECT unnest(toks) AS w2 FROM tok
    ), cu AS (
      SELECT w2, COUNT(*) AS cu FROM uni GROUP BY w2
    ), total AS (
      SELECT SUM(cu) AS n_total FROM cu
    ), micro AS (
      SELECT b.doc_id,
             CAST(ROUND(-ln(
               0.75 * (cb.cb * 1.0 / c1.c1)
               + 0.25 * (cu.cu * 1.0 / (SELECT n_total FROM total))
             ) * 1000000.0) AS BIGINT) AS nll_micro
      FROM bi b
      JOIN cb USING (w1, w2)
      JOIN c1 USING (w1)
      JOIN cu USING (w2)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_bigrams,
           ROUND(CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
             + 0.0 AS avg_nll,
           CAST(FLOOR(ROUND(CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*)
                            / 1000000.0, 4) + 0.0) AS INTEGER) AS nll_bucket
    FROM micro
    GROUP BY doc_id
    """


@query("bigram_nll_documents", _BIGRAM_ORACLE,
       driver=True)  # r07: rotated into the driver gate (final never-gated batch)
def bigram_nll_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated bigram-LM quality scoring
    (operators/scoring.py bigram_nll_scores): one rung up the n-gram
    ladder from the driver-gated unigram scorer — bigrams formed
    JVM-side from the token array, p = 0.75·p_bigram + 0.25·p_unigram,
    micronat-exact aggregation.  Parity-covered (the family's driver
    slot stays with the capped-vocab unigram entry)."""
    from .operators import scoring as SC  # noqa: PLC0415

    return SC.bigram_nll_scores(t(spark, sf, "documents"))


@query(
    "containment_near_dup_documents",
    _SHINGLE_CTE
    + """
    , freq_ok AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100
    ), shf AS (
      SELECT sh.id, sh.shingle FROM sh JOIN freq_ok USING (shingle)
    ), common AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a AS doc_id_a, id_b AS doc_id_b,
           ROUND(n_common * 1.0 / least(na.n_sh, nb.n_sh), 4) AS containment,
           ROUND(n_common * 1.0 / (na.n_sh + nb.n_sh - n_common), 4) AS jaccard
    FROM common
    JOIN sizes na ON na.id = id_a
    JOIN sizes nb ON nb.id = id_b
    WHERE n_common * 1.0 / least(na.n_sh, nb.n_sh) >= 0.35
    """,
    driver=True,  # r07: rotated into the driver gate
)
def containment_near_dup_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Containment (smaller-in-larger) near-dup
    (operators/dedup.py containment_pairs): catches quoted/embedded
    documents that symmetric Jaccard misses; same two-shuffle
    co-shingle plan, shared cached base.  Parity-covered."""
    return D.containment_pairs(
        t(spark, sf, "documents"), threshold=0.35, max_shingle_freq=100
    )


# --------------------------------------------------------------------
# Full-text relevance: BM25 search + TF-IDF terms (operators/search.py)
# --------------------------------------------------------------------

_BM25_TERMS = ("spark", "merge", "window")

_BM25_ORACLE = f"""
    WITH dl0 AS (
      SELECT doc_id, len({_TOKS}) AS dl, {_TOKS} AS tk FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl0
    ), tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(tk) AS term FROM dl0)
      WHERE term IN ({_in_list(_BM25_TERMS)})
      GROUP BY 1, 2, 3
    ), dft AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), idf AS (
      SELECT term,
             CAST(FLOOR(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                        * 1000000 + 0.5) AS BIGINT) AS idf_u
      FROM dft, stats
    ), scored AS (
      SELECT tf.doc_id,
             (idf_u * (36 * tf * total_dl))
               // (16 * tf * total_dl + 5 * total_dl + 15 * dl * n_docs)
               AS term_score_u
      FROM tf JOIN idf USING (term), stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
           CAST(SUM(term_score_u) AS BIGINT) AS score_u
    FROM scored GROUP BY doc_id
    ORDER BY score_u DESC, doc_id
    LIMIT 20
    """


@query("bm25_search_documents", _BM25_ORACLE, rank=20,
       driver=False)  # r06: rotated out — bm25_index_search_documents runs the same exact scorer through the persisted index
def bm25_search_documents(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 keyword retrieval (operators/search.py bm25_topk): top-20
    documents for a fixed 3-term query, scored in EXACT integer
    micro-nats (k1/b as binary fractions make the tf saturation a
    BIGINT rational; only the idf's ln is quantized, once per term).
    Term filter prunes before the shuffle; corpus stats and the
    per-term idf table broadcast; top-k is a TakeOrderedAndProject."""
    from .operators import search as SRCH  # noqa: PLC0415

    return SRCH.bm25_topk(t(spark, sf, "documents"), _BM25_TERMS, k=20)


_TFIDF_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM base GROUP BY 1, 2
    ), nd AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), dft AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), idf AS (
      SELECT term,
             CAST(FLOOR(ln(CAST(n_docs AS DOUBLE) / df) * 1000000 + 0.5)
                  AS BIGINT) AS idf_u
      FROM dft, nd
    ), scored AS (
      SELECT doc_id, term, tf * idf_u AS tfidf_u
      FROM tf JOIN idf USING (term)
    ), ranked AS (
      SELECT doc_id, term, tfidf_u,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf_u DESC, term ASC) AS term_rank
      FROM scored
    )
    SELECT doc_id, CAST(term_rank AS INTEGER) AS term_rank, term, tfidf_u
    FROM ranked WHERE term_rank <= 3
    """


@query("tfidf_top_terms_documents", _TFIDF_ORACLE, rank=20,
       driver=False)  # r07: rotated out (3 green rounds; pytest parity + bench)
def tfidf_top_terms_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 characteristic terms by exact-integer TF-IDF
    (operators/search.py tfidf_top_terms): one (doc, term) explode
    shuffle, a vocabulary-sized document-frequency aggregate re-joined
    on term (AQE-planned — a web-scale vocabulary does not broadcast),
    bounded per-document window for the top-n.  Idf micronat-quantized
    per term; tf * idf_u is BIGINT-exact on both engines."""
    from .operators import search as SRCH  # noqa: PLC0415

    df = SRCH.tfidf_top_terms(t(spark, sf, "documents"), top_n=3)
    return df.withColumn("term_rank", F.col("term_rank").cast("int"))


# --------------------------------------------------------------------
# Corpus boilerplate removal: segment-level dedup (CCNet/C4-style)
# --------------------------------------------------------------------

_SEG_W, _SEG_MAXDF = 8, 1

_SEGDEDUP_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), base AS (
      SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0
    ), c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, CAST((n + {_SEG_W - 1}) // {_SEG_W}
                                            AS INT) - 1)) AS chunk_id
      FROM base
    ), seg AS (
      SELECT doc_id, chunk_id,
             md5(array_to_string(toks[chunk_id * {_SEG_W} + 1 :
                                      chunk_id * {_SEG_W} + {_SEG_W}], ' ')) AS h,
             len(toks[chunk_id * {_SEG_W} + 1 :
                      chunk_id * {_SEG_W} + {_SEG_W}]) AS ntk
      FROM c
    ), freq AS (
      SELECT h, COUNT(DISTINCT doc_id) AS nd FROM seg GROUP BY h
    ), boiler AS (
      SELECT h FROM freq WHERE nd > {_SEG_MAXDF}
    ), kept AS (
      SELECT seg.doc_id, seg.chunk_id, seg.h, seg.ntk
      FROM seg ANTI JOIN boiler USING (h)
    ), per_kept AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             CAST(SUM(ntk) AS BIGINT) AS kept_tokens,
             md5(string_agg(h, '' ORDER BY chunk_id)) AS clean_fp
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_segs FROM seg GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_segs AS INTEGER) AS n_segs,
           CAST(t.n_segs - COALESCE(k.n_kept, 0) AS INTEGER) AS n_dropped,
           CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           COALESCE(k.clean_fp, md5('')) AS clean_fp
    FROM tot t LEFT JOIN per_kept k USING (doc_id)
    """


_SPAN_W, _SPAN_OCC = 8, 2

_SPANDEDUP_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents
    ), base AS (
      SELECT doc_id, tk, len(tk) AS n FROM tok
    ), wins AS (
      SELECT doc_id, g.i AS start,
             md5(array_to_string(tk[g.i : g.i + {_SPAN_W} - 1], ' ')) AS h
      FROM base, UNNEST(generate_series(1, n - {_SPAN_W} + 1)) AS g(i)
      WHERE n >= {_SPAN_W}
    ), dup AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= {_SPAN_OCC}
    ), ds AS (
      SELECT doc_id, list_sort(list(start)) AS starts
      FROM wins SEMI JOIN dup USING (h) GROUP BY doc_id
    ), j AS (
      SELECT b.doc_id, b.tk, b.n,
             COALESCE(d.starts, []::BIGINT[]) AS starts
      FROM base b LEFT JOIN ds d USING (doc_id)
    ), m AS (
      SELECT doc_id, n,
             len(list_filter(tk, (x, i) ->
               len(list_filter(starts,
                   s -> i >= s AND i < s + {_SPAN_W})) > 0)) AS ndup,
             md5(COALESCE(array_to_string(list_filter(tk, (x, i) ->
               len(list_filter(starts,
                   s -> i >= s AND i < s + {_SPAN_W})) = 0), ' '), '')) AS clean_fp
      FROM j
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(ndup AS BIGINT) AS n_dup_tokens,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE (ndup * 1000000) // n END AS BIGINT) AS dup_ppm,
           clean_fp
    FROM m
    """


@query("span_dedup_documents", _SPANDEDUP_ORACLE, driver=False, rank=25)  # r09: rotated out (green r5-r8; pytest parity + bench)
def span_dedup_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Exact duplicated-span masking (operators/dedup.py
    span_dedup_stats; Lee et al. 2021 ExactSubstr at token-window
    granularity): rolling 8-token windows occurring 2+ times in the
    corpus mark their positions duplicated; per-doc duplicated-token
    counts in exact ppm plus a fingerprint of the masked document.
    Window hashes are a zero-shuffle scan projection; only 32-byte
    hashes ever shuffle."""
    from .operators.dedup import span_dedup_stats  # noqa: PLC0415

    return span_dedup_stats(t(spark, sf, "documents"))


@query("segment_dedup_documents", _SEGDEDUP_ORACLE, rank=20,
       driver=False)  # r07: rotated out (3 green rounds; pytest parity + bench)
def segment_dedup_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus boilerplate removal (operators/dedup.py
    segment_dedup_stats): CCNet/C4-style cross-document repeated-
    segment dropping over non-overlapping 8-token windows — any
    segment present in more than one document is boilerplate.
    Zero-shuffle segmentation, hash-keyed doc-frequency aggregate,
    LEFT ANTI join back, per-document reassembly fingerprint."""
    return D.segment_dedup_stats(
        t(spark, sf, "documents"), window=_SEG_W, max_doc_freq=_SEG_MAXDF
    )


# --------------------------------------------------------------------
# Repetition quality signals (Gopher rules)
# --------------------------------------------------------------------

_REPSIG_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM tok)
      GROUP BY 1, 2
    ), tok_stats AS (
      SELECT doc_id,
             CAST(SUM(c) AS INTEGER) AS n_tokens,
             COUNT(*) AS n_distinct,
             MAX(c) AS max_c
      FROM tf GROUP BY doc_id
    ), top_tok AS (
      SELECT doc_id, tok AS top_token
      FROM (SELECT doc_id, tok,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, tok DESC) AS rn
            FROM tf)
      WHERE rn = 1
    ), bg0 AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                  ELSE list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1]) END AS bgs
      FROM tok
    ), bf AS (
      SELECT doc_id, bg, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(bgs) AS bg FROM bg0)
      GROUP BY 1, 2
    ), bg_stats AS (
      SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS max_bg
      FROM bf GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_tokens,
           CAST((s.n_tokens - s.n_distinct) * 10000 // s.n_tokens AS BIGINT)
             AS dup_token_fp4,
           tt.top_token,
           CAST(s.max_c * 10000 // s.n_tokens AS BIGINT) AS top_token_fp4,
           CAST(COALESCE(b.max_bg * 10000 // b.n_bigrams, 0) AS BIGINT)
             AS top_bigram_fp4
    FROM tok_stats s
    JOIN top_tok tt USING (doc_id)
    LEFT JOIN bg_stats b USING (doc_id)
    """


@query("repetition_signals_documents", _REPSIG_ORACLE, rank=20,
       driver=False)  # r07: rotated out (3 green rounds; pytest parity + bench)
def repetition_signals_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals (operators/text.py
    repetition_signals): duplicate-token fraction, most-common-token
    and most-common-bigram mass per document, all as exact
    fixed-point integers — the repetition leg of quality filtering
    that the length/punct/stopword profile (text_quality_documents)
    doesn't cover."""
    return X.repetition_signals(t(spark, sf, "documents"))


# --------------------------------------------------------------------
# Semantic dedup (SemDeDup): cluster-blocked exact cosine + recall check
# --------------------------------------------------------------------

def _semantic_pairs(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    return cached_persist(
        S.semantic_dedup_pairs(emb, k=16, iters=3, nprobe=3, threshold=0.35),
        plan_key(emb, "semantic_pairs", 16, 3, 3, 0.35),
    )


@query(
    "semantic_dedup_check",
    """
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), exact_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
            >= 0.35
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           CAST(0 AS BIGINT)        AS n_false_positives,
           CAST(1 AS INTEGER)       AS recall_ge_06
    FROM exact_pairs
    """,
    rank=30,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
)
def semantic_dedup_check(spark: SparkSession, sf: str) -> DataFrame:
    """Hard check for SemDeDup-style semantic dedup
    (operators/similarity.py semantic_dedup_pairs): k-means
    cluster-blocked exact cosine with nprobe=3 multi-probe.  Same
    contract as ``lsh_cosine_recall_check``: the exact-pair count is
    DuckDB-verified, false positives are structurally zero (every
    emitted pair carries its true float64 cosine), and measured recall
    (~0.87 at k=16/nprobe=3 on this corpus) is asserted against a
    wide-margin 0.6 floor."""
    exact = _gemm_pairs(spark, sf).select("id_a", "id_b")
    sem = _semantic_pairs(spark, sf).select("id_a", "id_b")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_sem = sem.agg(F.count(F.lit(1)).alias("n_sem"))
    n_tp = sem.join(exact, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_tp"))
    return (
        n_exact.crossJoin(n_sem)
        .crossJoin(n_tp)
        .select(
            "n_exact_pairs",
            (F.col("n_sem") - F.col("n_tp")).alias("n_false_positives"),
            (F.col("n_tp") * 10 >= F.col("n_exact_pairs") * 6)
            .cast("int")
            .alias("recall_ge_06"),
        )
    )


# --------------------------------------------------------------------
# Approximate string join (FastSS deletion-neighborhood blocking)
# --------------------------------------------------------------------

@query(
    "fuzzy_name_pairs_customers",
    """
    WITH c AS (SELECT DISTINCT c_name FROM customer)
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM c a JOIN c b ON a.c_name < b.c_name
    WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
      AND levenshtein(a.c_name, b.c_name) <= 1
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def fuzzy_name_pairs_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Typo-tolerant entity matching (operators/fuzzy.py
    fuzzy_self_pairs): all customer-name pairs within edit distance 1
    via FastSS deletion-neighborhood blocking + exact levenshtein
    verify.  The oracle runs the quadratic definition; the engine
    never does — candidates come only from shared deletion blocks."""
    from .operators import fuzzy as FZ  # noqa: PLC0415

    return FZ.fuzzy_self_pairs(t(spark, sf, "customer"), "c_name").withColumn(
        "dist", F.col("dist").cast("int")
    )


# --------------------------------------------------------------------
# Corpus drift monitoring: token-distribution shift between cohorts
# --------------------------------------------------------------------

_DRIFT_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id % 2 AS cohort, unnest({_TOKS}) AS tok FROM documents
    ), tf AS (
      SELECT cohort, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), tot AS (
      SELECT cohort, SUM(c) AS n FROM tf GROUP BY cohort
    ), freq AS (
      SELECT tok,
             CAST(SUM(CASE WHEN cohort = 0 THEN c ELSE 0 END) AS BIGINT) AS count_a,
             CAST(SUM(CASE WHEN cohort = 1 THEN c ELSE 0 END) AS BIGINT) AS count_b,
             SUM(CASE WHEN cohort = 0 THEN c ELSE 0 END) * 1000000
               // (SELECT n FROM tot WHERE cohort = 0) AS fa,
             SUM(CASE WHEN cohort = 1 THEN c ELSE 0 END) * 1000000
               // (SELECT n FROM tot WHERE cohort = 1) AS fb
      FROM tf GROUP BY tok
    )
    SELECT tok, count_a, count_b,
           CAST(abs(fa - fb) AS BIGINT) AS drift_fp6
    FROM freq
    ORDER BY drift_fp6 DESC, tok
    LIMIT 20
    """


@query("token_drift_documents", _DRIFT_ORACLE, driver=False, rank=20)  # r07: rotated out (long-green)
def token_drift_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus drift monitoring: the top-20 tokens whose relative
    frequency shifted most between two document cohorts (here doc_id
    parity stands in for yesterday's vs today's crawl) — the
    distribution-shift alarm a production training-data pipeline runs
    on every ingest.  Frequencies are exact fixed-point parts-per-
    million (integer ``div``), so the drift ranking is BIGINT-exact on
    both engines; top-k carries the token tiebreak.

    Scale shape: one (cohort, token) explode aggregate with map-side
    partial counts; cohort totals are a 2-row broadcast; top-20 is a
    TakeOrderedAndProject."""
    d = t(spark, sf, "documents")
    tf = (
        d.select(
            (F.col("doc_id") % 2).alias("cohort"),
            F.explode(X.tokens("text")).alias("tok"),
        )
        .groupBy("cohort", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tf.groupBy("cohort").agg(F.sum("c").alias("n"))
    na = tot.filter(F.col("cohort") == 0).select(F.col("n").alias("na"))
    nb = tot.filter(F.col("cohort") == 1).select(F.col("n").alias("nb"))
    freq = (
        tf.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("cohort") == 0, F.col("c")).otherwise(0)).alias(
                "count_a"
            ),
            F.sum(F.when(F.col("cohort") == 1, F.col("c")).otherwise(0)).alias(
                "count_b"
            ),
        )
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    return (
        freq.select(
            "tok",
            "count_a",
            "count_b",
            F.abs(
                F.expr("count_a * 1000000 DIV na") - F.expr("count_b * 1000000 DIV nb")
            ).alias("drift_fp6"),
        )
        .orderBy(F.col("drift_fp6").desc(), "tok")
        .limit(20)
    )


# --------------------------------------------------------------------
# Quality-weighted (importance) sampling
# --------------------------------------------------------------------

_IS_SALT = "is"

_IMPORTANCE_ORACLE = f"""
    SELECT doc_id,
           ROUND({_uh_sql("COALESCE(text, '')", _MODEL_SALT)}, 4) + 0.0
             AS model_score
    FROM documents
    WHERE {_uh_sql("doc_id", _IS_SALT)}
        < {_uh_sql("COALESCE(text, '')", _MODEL_SALT)}
    """


# r07: rotated into the driver gate
@query("importance_sample_documents", _IMPORTANCE_ORACLE, driver=True)
def importance_sample_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-weighted corpus thinning (operators/sampling.py
    importance_sample): keep each document with probability equal to
    its model score — both the score and the keep-variate are exact
    dyadic salted-md5 fractions, so the kept SET is deterministic and
    engine-exact.  Zero-shuffle filter projection."""
    from .operators.inference import model_score  # noqa: PLC0415
    from .operators.sampling import importance_sample  # noqa: PLC0415

    scored = model_score(t(spark, sf, "documents"), salt=_MODEL_SALT)
    return importance_sample(scored, "model_score", salt=_IS_SALT).select(
        "doc_id",
        (F.round("model_score", 4) + F.lit(0.0)).alias("model_score"),
    )


# --------------------------------------------------------------------
# Contrastive negative sampling
# --------------------------------------------------------------------

_NEG_SALT, _NEG_K, _NEG_B = "neg", 4, 64

_NEG_ORACLE = f"""
    WITH pool AS (
      SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{_NEG_SALT}-pool'), 1, 15))::UBIGINT
               % {_NEG_B} AS bucket,
             MIN(doc_id) AS negative_id
      FROM documents GROUP BY 1
    ), anchors AS (
      SELECT doc_id AS anchor_id, CAST(j AS INTEGER) AS j,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)
                                    || ':{_NEG_SALT}-sel'), 1, 15))::UBIGINT
               % {_NEG_B} AS bucket
      FROM documents, unnest(generate_series(1, {_NEG_K})) AS u(j)
    )
    SELECT anchor_id, j, negative_id
    FROM anchors JOIN pool USING (bucket)
    WHERE negative_id <> anchor_id
    """


@query("contrastive_negatives_documents", _NEG_ORACLE,
       driver=True)  # r07: rotated into the driver gate
def contrastive_negatives_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Contrastive-training negative sampling (operators/sampling.py
    negative_samples): k=4 deterministic negatives per anchor from a
    bucket-representative pool — no rand(), no global rank/sort, the
    pool broadcast so anchors never shuffle."""
    from .operators.sampling import negative_samples  # noqa: PLC0415

    return negative_samples(
        t(spark, sf, "documents"), k=_NEG_K, n_buckets=_NEG_B, salt=_NEG_SALT
    )


# --------------------------------------------------------------------
# N-gram novelty (unique-content fraction)
# --------------------------------------------------------------------

_NOVELTY_ORACLE = (
    _SHINGLE_CTE
    + """
    , counts AS (
      SELECT shingle, COUNT(*) AS dcount FROM sh GROUP BY shingle
    ), novel AS (
      SELECT sh.id, COUNT(*) AS n_novel
      FROM sh JOIN counts USING (shingle)
      WHERE counts.dcount = 1
      GROUP BY sh.id
    )
    SELECT s.id AS doc_id,
           CAST(s.n_sh AS INTEGER) AS n_sh,
           CAST(COALESCE(n.n_novel, 0) AS INTEGER) AS n_novel,
           CAST(COALESCE(n.n_novel * 10000 // s.n_sh, 0) AS BIGINT)
             AS novelty_fp4
    FROM sizes s LEFT JOIN novel n USING (id)
    """
)


@query("ngram_novelty_documents", _NOVELTY_ORACLE, driver=False, rank=20)  # r07: rotated out
def ngram_novelty_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Unique-content fraction per document (operators/dedup.py
    ngram_novelty): the share of a doc's distinct 3-gram shingles
    found nowhere else in the corpus, exact fixed-point — the
    contribution signal pairwise near-dup misses.  Shares the cached
    shingle base with the whole dedup family."""
    return D.ngram_novelty(t(spark, sf, "documents"))


# --------------------------------------------------------------------
# Hybrid retrieval: BM25 candidates re-ranked by embedding cosine
# --------------------------------------------------------------------

_HYBRID_QVEC = 0  # query vector = embedding of doc 0
_HYBRID_CANDS, _HYBRID_K = 50, 10

_HYBRID_ORACLE = f"""
    WITH dl0 AS (
      SELECT doc_id, len({_TOKS}) AS dl, {_TOKS} AS tk FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl0
    ), tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(tk) AS term FROM dl0)
      WHERE term IN ({_in_list(_BM25_TERMS)})
      GROUP BY 1, 2, 3
    ), dft AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), idf AS (
      SELECT term,
             CAST(FLOOR(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                        * 1000000 + 0.5) AS BIGINT) AS idf_u
      FROM dft, stats
    ), scored AS (
      SELECT tf.doc_id,
             (idf_u * (36 * tf * total_dl))
               // (16 * tf * total_dl + 5 * total_dl + 15 * dl * n_docs)
               AS term_score_u
      FROM tf JOIN idf USING (term), stats
    ), cands AS (
      SELECT doc_id, CAST(SUM(term_score_u) AS BIGINT) AS score_u
      FROM scored GROUP BY doc_id
      ORDER BY score_u DESC, doc_id
      LIMIT {_HYBRID_CANDS}
    ), vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), qv AS (
      SELECT e AS qe, nrm AS qn FROM vecs WHERE vec_id = {_HYBRID_QVEC}
    ), rer AS (
      SELECT c.doc_id, c.score_u,
             ROUND(list_dot_product(v.e, qv.qe) / (v.nrm * qv.qn), 4) + 0.0
               AS cosine_sim
      FROM cands c JOIN vecs v ON v.vec_id = c.doc_id, qv
    )
    SELECT doc_id, score_u, cosine_sim,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, doc_id)
                AS INTEGER) AS rank
    FROM rer
    ORDER BY rank
    LIMIT {_HYBRID_K}
    """


@query(
    "hybrid_search_documents",
    _HYBRID_ORACLE,
    rank=25,
    driver=False,  # r09: rotated out (green r5-r8; pytest parity + bench)
)
def hybrid_search_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval, the RAG-serving shape: BM25 keyword
    candidates (exact-integer scores, operators/search.py) re-ranked
    by embedding cosine against a query vector.  The candidate set is
    bounded (50), so the re-rank joins a TINY relation against the
    embedding table on its key and the query vector broadcasts; norms
    ride as separate columns so the float operation order matches the
    oracle exactly (the cosine_topk convention)."""
    from pyspark.sql import Window  # noqa: PLC0415

    from .operators import search as SRCH  # noqa: PLC0415
    from .operators.similarity import _dvec, dot, norm  # noqa: PLC0415

    cands = SRCH.bm25_topk(
        t(spark, sf, "documents"), _BM25_TERMS, k=_HYBRID_CANDS
    ).select("doc_id", "score_u")
    emb = t(spark, sf, "embeddings").select(
        F.col("vec_id"), _dvec("embedding").alias("_e")
    ).withColumn("_n", norm(F.col("_e")))
    qv = (
        emb.filter(F.col("vec_id") == _HYBRID_QVEC)
        .select(F.col("_e").alias("_qe"), F.col("_n").alias("_qn"))
    )
    rer = (
        cands.join(emb, cands["doc_id"] == emb["vec_id"])
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "score_u",
            (
                F.round(dot(F.col("_e"), F.col("_qe")) / (F.col("_n") * F.col("_qn")), 4)
                + F.lit(0.0)
            ).alias("cosine_sim"),
        )
    )
    w = Window.orderBy(F.col("cosine_sim").desc(), F.col("doc_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HYBRID_K)
        .select("doc_id", "score_u", "cosine_sim", "rank")
    )


# --------------------------------------------------------------------
# Language-ID confusion matrix (label-agreement audit)
# --------------------------------------------------------------------

_LANGCONF_ORACLE = f"""
    SELECT lang, {_langid_case()} AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1, 2
    """


# r08: rotated out (long-green r5-r7; pytest parity + bench keep it)
@query("q_langid_confusion", _LANGCONF_ORACLE, driver=False, rank=25)
def q_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Label-agreement audit: confusion matrix between the declared
    ``lang`` column and the marker-based language-ID prediction
    (operators/text.py lang_id) — the systematic-mislabel detector a
    multilingual pipeline runs before trusting source metadata.
    One projection + one (lang, pred) aggregate."""
    d = t(spark, sf, "documents")
    return (
        d.select("lang", X.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------
# Retrieval-quality evaluation: MRR of the IVF index vs exact top-1
# --------------------------------------------------------------------

@query(
    "ivf_mrr_check",
    # The IVF ranking itself is engine-specific (cell assignment flips
    # on float boundaries), so the CHECKED columns follow the recall-
    # check contract: the query-set cardinality is oracle-exact and the
    # MRR floor flag must be TRUE — a broken index drops the flag.
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           TRUE AS mrr_ge_half
    FROM embeddings WHERE vec_id < 10
    """,
    driver=False,  # r09: rotated out (green r5-r8; pytest parity + bench)
    rank=25,
)
def ivf_mrr_check(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieval-quality evaluation harness: mean reciprocal rank of
    the exact top-1 neighbor within the IVF index's top-5 — the
    eval loop a production ANN deployment runs after each index
    rebuild.  Reciprocal ranks are exact integers (10000 div rank)
    averaged with integer division; the session-memoized k-means
    centroids and the cached exact ground truth are shared with the
    other similarity queries, so this adds one bounded join."""
    e = t(spark, sf, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 10)
    cents = S.kmeans_fit_cached(e, k=16, iters=3)
    ivf = S.ivf_topk(queries_df, e, cents, k=5, nprobe=2)
    gt1 = (
        _exact_topk5(spark, sf)
        .filter(F.col("rank") == 1)
        .select("query_id", F.col("neighbor_id").alias("true_nb"))
    )
    rr = (
        gt1.join(
            ivf.select("query_id", "neighbor_id", F.col("rank").alias("ivf_rank")),
            (gt1["query_id"] == ivf["query_id"])
            & (gt1["true_nb"] == ivf["neighbor_id"]),
            "left",
        )
        .select(
            gt1["query_id"],
            F.coalesce(F.expr("10000 DIV ivf_rank"), F.lit(0)).alias("rr_fp4"),
        )
    )
    return rr.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.expr("SUM(rr_fp4) DIV COUNT(*)") >= 5000).alias("mrr_ge_half"),
    )


# --------------------------------------------------------------------
# Corpus assembly audits: temperature mixing, length-filter sweep,
# cross-dataset overlap
# --------------------------------------------------------------------

_TEMPMIX_ORACLE = """
WITH c AS (
  SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), w AS (
  SELECT domain, n_docs, CAST(FLOOR(SQRT(n_docs)) AS BIGINT) AS w FROM c
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS tn, CAST(SUM(w) AS BIGINT) AS tw FROM w
)
SELECT domain, n_docs,
       CAST((n_docs * 1000000) // (SELECT tn FROM tot) AS BIGINT) AS raw_share_ppm,
       CAST((w * 1000000) // (SELECT tw FROM tot) AS BIGINT) AS temp_share_ppm
FROM w
"""


# r07: rotated into the driver gate
@query("temperature_mix_sources", _TEMPMIX_ORACLE, driver=True)
def temperature_mix_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled (alpha=1/2) per-source sampling weights — the
    multilingual-LM mixing rule p_i ∝ sqrt(n_i) that upweights rare
    domains.  Integer-exact end to end: weights are floor(sqrt(n)),
    shares are BIGINT-div ppm — no float summation anywhere, so DuckDB
    reproduces the bytes.  One domain-key aggregate + a broadcast of
    the single-row totals."""
    return SA.temperature_shares(t(spark, sf, "documents"), "source")


_RETENTION_GRID = (0, 10, 20, 40, 60, 80, 120, 160, 240, 320)

_RETENTION_ORACLE = f"""
WITH n AS (
  SELECT CAST(len(regexp_extract_all(text, '{X.BPE_ISH_PATTERN}')) AS BIGINT) AS n
  FROM documents
), hist AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS c FROM n GROUP BY n
), grid(min_tokens) AS (
  VALUES {", ".join(f"({g})" for g in _RETENTION_GRID)}
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS td, CAST(SUM(n * c) AS BIGINT) AS tt FROM hist
)
SELECT CAST(g.min_tokens AS INTEGER) AS min_tokens,
       CAST(COALESCE(SUM(h.c), 0) AS BIGINT) AS docs_retained,
       CAST(COALESCE(SUM(h.n * h.c), 0) AS BIGINT) AS tokens_retained,
       CAST((CAST(COALESCE(SUM(h.c), 0) AS BIGINT) * 1000000)
            // (SELECT td FROM tot) AS BIGINT) AS docs_retained_ppm,
       CAST((CAST(COALESCE(SUM(h.n * h.c), 0) AS BIGINT) * 1000000)
            // (SELECT tt FROM tot) AS BIGINT) AS tokens_retained_ppm
FROM grid g LEFT JOIN hist h ON h.n >= g.min_tokens
GROUP BY 1
"""


# r08: rotated out (long-green r5-r7; pytest parity + bench keep it)
@query("retention_sweep_documents", _RETENTION_ORACLE, driver=False, rank=25)
def retention_sweep_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Minimum-length filter sweep: docs/tokens retained at each
    candidate min-token threshold.  The corpus collapses to a
    token-count histogram (one aggregate) before the broadcast grid
    theta-join, so no document row is replicated per threshold; all
    outputs are exact integers."""
    return X.retention_sweep(
        t(spark, sf, "documents"), thresholds=_RETENTION_GRID
    )


_SRC_OVERLAP_ORACLE = f"""
WITH tok AS (
  SELECT source, {_TOKS} AS toks FROM documents
), sh0 AS (
  SELECT source,
         CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
              ELSE list_transform(generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS shs
  FROM tok
), gsh AS (
  SELECT DISTINCT source AS grp, shingle
  FROM (SELECT source, unnest(shs) AS shingle FROM sh0)
), sizes AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_sh FROM gsh GROUP BY grp
), common AS (
  SELECT a.grp AS src_a, b.grp AS src_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM gsh a JOIN gsh b ON a.shingle = b.shingle AND a.grp < b.grp
  GROUP BY 1, 2
)
SELECT src_a, src_b, sa.n_sh AS n_sh_a, sb.n_sh AS n_sh_b, n_common,
       CAST((n_common * 1000000) // (sa.n_sh + sb.n_sh - n_common) AS BIGINT)
           AS jaccard_ppm,
       CAST((n_common * 1000000) // LEAST(sa.n_sh, sb.n_sh) AS BIGINT)
           AS containment_ppm
FROM common
JOIN sizes sa ON sa.grp = src_a
JOIN sizes sb ON sb.grp = src_b
"""


@query("source_overlap_documents", _SRC_OVERLAP_ORACLE, driver=False)  # r06: rotated IN; r09: out (green r6-r8)
def source_overlap_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-dataset overlap matrix: exact pairwise Jaccard +
    containment of per-source distinct shingle sets — the audit run
    before mixing corpora.  Per-shingle join fan-out is bounded by the
    number of SOURCES holding the shingle, never its corpus
    frequency."""
    return D.source_overlap(t(spark, sf, "documents"), "source")


_LEAK_SPLIT_ORACLE = (
    _SHINGLE_CTE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _JACCARD_PAIRS_CTE.format(max_freq=100, threshold=0.12)
    + f"""
    , edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION
      SELECT doc_id_b, doc_id_a FROM pairs
    ), reach(id, r) AS (
      SELECT s, s FROM edges
      UNION
      SELECT re.id, e.d FROM reach re JOIN edges e ON e.s = re.r
    ), comp AS (
      SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS component
      FROM reach GROUP BY id
    ), assigned AS (
      SELECT d.doc_id,
             CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS group_key
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, group_key, {{split_case}} AS split
    FROM (SELECT doc_id, group_key, {SA.uniform_hash_sql("group_key")} AS u
          FROM assigned)
    """
).format(split_case=_split_case_sql(_SPLIT_WEIGHTS))


# r07: rotated into the driver gate
@query("leakage_safe_split_documents", _LEAK_SPLIT_ORACLE, driver=True)
def leakage_safe_split_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup-aware train/val/test split: the split hash runs over
    the duplicate-CLUSTER key (connected components of the jaccard
    near-dup pairs), so no test document has a near-copy in train.
    Shares the session-memoized component labeling and cached shingle
    base with the rest of the dedup family."""
    d = t(spark, sf, "documents")
    prs = D.jaccard_near_dup_pairs(d, threshold=0.12, max_shingle_freq=100)
    comp = D.connected_components(prs)
    return SA.leakage_safe_split(d, comp, _SPLIT_WEIGHTS).select(
        "doc_id", "group_key", "split"
    )


_VOCAB_KS = (100, 200, 400, 800, 1600, 3200)

_VOCAB_ORACLE = f"""
WITH tk AS (
  SELECT unnest({_TOKS}) AS term FROM documents
), counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY term
), ranked AS (
  SELECT term, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank
  FROM counts
), grid(vocab_k) AS (
  VALUES {", ".join(f"({k})" for k in _VOCAB_KS)}
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS tt FROM counts
)
SELECT CAST(g.vocab_k AS INTEGER) AS vocab_k,
       CAST(COALESCE(SUM(r.cnt), 0) AS BIGINT) AS covered_tokens,
       CAST((CAST(COALESCE(SUM(r.cnt), 0) AS BIGINT) * 1000000)
            // (SELECT tt FROM tot) AS BIGINT) AS coverage_ppm
FROM grid g LEFT JOIN ranked r ON r.rank <= g.vocab_k
GROUP BY 1
"""


# r08: rotated out (long-green r5-r7; pytest parity + bench keep it)
@query("vocab_coverage_documents", _VOCAB_ORACLE, driver=False, rank=25)
def vocab_coverage_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary coverage curve: corpus-token share covered by the k
    most frequent token types, per k — tokenizer-vocab sizing.  The
    vocabulary collapses to (term, count) in one aggregate; top-max(k)
    is a TakeOrdered, and everything downstream is bounded by the k
    grid, not the corpus."""
    return X.vocab_coverage(t(spark, sf, "documents"), ks=_VOCAB_KS)


# --------------------------------------------------------------------
# Tokenizer training: distributed BPE merges
# --------------------------------------------------------------------

def _bpe_oracle(num_merges: int = 8) -> str:
    """Unrolled DuckDB replay of ``num_merges`` BPE training rounds.

    The greedy left-to-right merge rewrite folds each word's symbol
    list through ``list_reduce`` with a string-encoded accumulator
    (symbols joined on chr(1)): merge when the accumulator's LAST
    symbol is exactly `left` and the next element is `right`, else
    append — the same scan order as the engine's fold, so the learned
    merge list matches integer-for-integer.  Each round is one
    adjacent-pair count + a (count DESC, left, right) argmax + the
    fold; the word-frequency table keeps every round corpus-size-
    independent, exactly like the engine."""
    pat = X.BPE_ISH_PATTERN  # shared with the engine; excludes control chars (chr(1) delimiter safety)
    rounds = []
    for i in range(1, num_merges + 1):
        prev = f"w{i - 1}"
        rounds.append(f"""
p{i} AS (
  SELECT pr[1] AS l, pr[2] AS r, SUM(freq)::BIGINT AS cnt
  FROM {prev}, UNNEST(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS u(pr)
  GROUP BY pr[1], pr[2]
),
m{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
w{i} AS (
  SELECT freq,
         string_split(
           list_reduce(syms, (acc, x) -> CASE
             WHEN (acc = m{i}.l OR ends_with(acc, chr(1) || m{i}.l)) AND x = m{i}.r
             THEN acc || x ELSE acc || chr(1) || x END),
           chr(1)) AS syms
  FROM {prev} CROSS JOIN m{i}
)""")
    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS left, r AS right, cnt AS pair_count"
        f" FROM m{i}"
        for i in range(1, num_merges + 1)
    )
    return f"""
    WITH words AS (
      SELECT word, COUNT(*)::BIGINT AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(text), '{pat}')) AS word
        FROM documents
      ) GROUP BY word
    ),
    w0 AS (
      SELECT freq, string_split_regex(word, '') AS syms
      FROM words WHERE length(word) >= 2
    ),{','.join(rounds)}
    SELECT * FROM ({selects}) ORDER BY merge_rank
    """


@query(
    "bpe_merges_documents",
    _bpe_oracle(8),
    rank=25,
    driver=False,  # r09: rotated out (green r5-r8; pytest parity + bench)
)
def bpe_merges_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed BPE merge-training over `documents` (operators/
    bpe.py): 8 merge rounds, each one weighted pair-count aggregate
    over the WORD-FREQUENCY table (corpus-size-independent after the
    first shuffle) + a 1-row argmax collect + a JVM fold rewrite.

    The DuckDB oracle replays the same 8 rounds unrolled as CTEs with
    a list_reduce greedy fold — pure integer counts, so agreement is
    exact merge-for-merge; tests/test_bpe.py additionally pins the
    operator against a pure-Python reference of the public algorithm
    (Sennrich et al. 2016)."""
    from .operators.bpe import bpe_train_cached  # noqa: PLC0415

    merges = bpe_train_cached(t(spark, sf, "documents"), num_merges=8)
    rows = [
        (i + 1, left, right, int(cnt))
        for i, (left, right, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, left string, right string, pair_count bigint"
    )


def _fertility_oracle(num_merges: int = 8) -> str:
    """Tokenizer-fertility oracle: the BPE training CTEs (m1..mK) plus
    a vocabulary-level replay of the learned folds — each fold is the
    same list_reduce greedy rewrite, nested K deep over the distinct
    words, then joined back occurrence-weighted per language."""
    pat = X.BPE_ISH_PATTERN  # shared with the engine; excludes control chars (chr(1) delimiter safety)
    train = _bpe_oracle(num_merges)
    # reuse the training CTE chain: strip its final SELECT, keep WITH…
    ctes = train[: train.rindex("SELECT * FROM (")]
    folded = "string_split_regex(word, '')"
    for i in range(1, num_merges + 1):
        folded = (
            f"string_split(list_reduce({folded}, (acc, x) -> CASE "
            f"WHEN (acc = m{i}.l OR ends_with(acc, chr(1) || m{i}.l)) "
            f"AND x = m{i}.r "
            f"THEN acc || x ELSE acc || chr(1) || x END), chr(1))"
        )
    joins = " ".join(f"CROSS JOIN m{i}" for i in range(1, num_merges + 1))
    return f"""{ctes.rstrip()},
    wl AS (
      SELECT lang, word, COUNT(*)::BIGINT AS n_occ FROM (
        SELECT lang, unnest(regexp_extract_all(lower(text), '{pat}')) AS word
        FROM documents
      ) GROUP BY lang, word
    ),
    vocab AS (SELECT DISTINCT word FROM wl),
    seg AS (
      SELECT word, len({folded})::BIGINT AS n_bpe,
             length(word)::BIGINT AS n_chars
      FROM vocab {joins}
    )
    SELECT lang,
           SUM(n_occ)::BIGINT AS n_words,
           SUM(n_occ * n_bpe)::BIGINT AS n_bpe_tokens,
           ((SUM(n_occ * n_bpe) * 1000000) // SUM(n_occ))::BIGINT
             AS fertility_ppm,
           ((SUM(n_occ * n_chars) * 1000000) // SUM(n_occ * n_bpe))::BIGINT
             AS chars_per_token_ppm
    FROM wl JOIN seg USING (word)
    GROUP BY lang ORDER BY lang
    """


def _pii_oracle() -> str:
    from .operators.text import PII_PATTERNS  # noqa: PLC0415

    counts = ",\n           ".join(
        f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    scrub = "text"
    for name, pat in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
    SELECT doc_id AS id,
           {counts},
           md5({scrub}) AS scrubbed_hash
    FROM documents ORDER BY doc_id
    """


@query("pii_scrub_documents", _pii_oracle(),
       driver=False,  # r07: rotated out for wap_audited_ingest_orders
       rank=25)       # (long-green r5-r6; pytest parity + bench cover it)
def pii_scrub_documents(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over `documents` (operators/text.py pii_scrub):
    per-doc email/SSN/phone/IPv4 match counts + md5 of the scrubbed
    text, zero-shuffle projection.  The synthetic corpus contains no
    digits, so every count is 0 and the scrub is an md5-verified
    no-op here — the cross-engine parity still pins that both regex
    engines agree on all ~N docs, and tests/test_text_ops.py checks
    real redaction on injected PII against DuckDB."""
    from .operators.text import pii_scrub  # noqa: PLC0415

    return pii_scrub(t(spark, sf, "documents"))


@query("tokenizer_fertility_documents", _fertility_oracle(8),
       driver=False,  # r07: rotated out for hidden_partition_week_events
       rank=25)       # (long-green r5-r6; pytest parity + bench cover it)
def tokenizer_fertility_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language tokenizer fertility (tokens/word, chars/token in
    exact ppm) after replaying the corpus-trained 8-merge BPE list —
    the per-script tokenizer-equity report an LLM team runs before
    committing a vocab.  Training is session-memoized (shared with
    `bpe_merges_documents`); segmentation folds run over the DISTINCT
    vocabulary only, never per occurrence (operators/bpe.py
    tokenizer_fertility)."""
    from .operators.bpe import bpe_train_cached, tokenizer_fertility  # noqa: PLC0415

    docs = t(spark, sf, "documents")
    merges = bpe_train_cached(docs, num_merges=8)
    return tokenizer_fertility(docs, merges)


# --------------------------------------------------------------------
# Dedup retention, hard-negative mining, temperature mixing (r06)
# --------------------------------------------------------------------

_CLUSTER_REP_ORACLE = (
    _SHINGLE_CTE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _JACCARD_PAIRS_CTE.format(max_freq=100, threshold=0.12)
    + """
    , edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION
      SELECT doc_id_b, doc_id_a FROM pairs
    ), reach(id, r) AS (
      SELECT s, s FROM edges
      UNION
      SELECT re.id, e.d FROM reach re JOIN edges e ON e.s = re.r
    ), comp AS (
      SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS component
      FROM reach GROUP BY id
    ), corpus AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             length(d.text) AS q
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, component,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY component ORDER BY q DESC, doc_id) = 1 AS INTEGER)
             AS kept
    FROM corpus
    """
)


@query("cluster_representatives_documents", _CLUSTER_REP_ORACLE, rank=25)
def cluster_representatives_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup retention policy end-to-end (operators/dedup.py
    cluster_representatives): jaccard pairs → connected components →
    keep-the-longest per cluster (ties to smallest id), singletons
    kept as their own cluster — the decision layer that turns pair
    emission into an actual filtered corpus.  100 TB shape: components
    are cluster-sized, the corpus pays one join against the component
    map and ONE window shuffle keyed on component."""
    docs = t(spark, sf, "documents")
    prs = D.jaccard_near_dup_pairs(
        docs, threshold=0.12, max_shingle_freq=100
    )
    return D.cluster_representatives(docs, prs)


@query(
    "hard_negatives_embeddings",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id % 20 = 0
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
      FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             ROUND(list_dot_product(qv, cv) / (qn * cn), 4) AS cosine_sim
      FROM q, c WHERE neighbor_id <> query_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id AS negative_id,
           CAST(rank - 1 AS INTEGER) AS neg_rank, cosine_sim
    FROM ranked WHERE rank BETWEEN 2 AND 6
    """,
    rank=25,
)
def hard_negatives_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training: for
    each query vector (every 20th id), the 5 nearest non-identical
    neighbors AFTER the top-1 (which a training pipeline treats as the
    positive) — near-but-not-nearest vectors are exactly the negatives
    that teach an embedding model its decision boundary.  Rides
    cosine_topk's shape: queries broadcast, ONE corpus pass, per-query
    window top-k; no corpus shuffle."""
    e = t(spark, sf, "embeddings")
    tk = S.cosine_topk(e.filter(F.col("vec_id") % 20 == 0), e, k=6)
    return tk.filter(F.col("rank") >= 2).select(
        "query_id",
        F.col("neighbor_id").alias("negative_id"),
        (F.col("rank") - 1).cast("int").alias("neg_rank"),
        "cosine_sim",
    )


@query(
    "temperature_mix_documents",
    """
    WITH by_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ), m AS (SELECT MAX(n_docs) AS n_max FROM by_src)
    SELECT source, n_docs,
           CAST(ROUND(1000000 * sqrt(n_docs * 1.0 / n_max)) AS BIGINT)
             AS w_rel_ppm,
           CAST(ROUND(1000000 * sqrt(n_max * 1.0 / n_docs)) AS BIGINT)
             AS boost_ppm
    FROM by_src, m
    """,
    rank=25,
    driver=False,  # r08: rotated out (long-green since r4; sibling
    # temperature_mix_sources stays gated; pytest parity + bench)
)
def temperature_mix_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled source mixing (T=2, i.e. alpha=0.5): each
    source's sampling weight relative to the largest source is
    sqrt(n_src / n_max), and boost_ppm = 1/sqrt(p_rel) is the
    up-sampling factor low-resource sources receive — the standard
    mitigation for head-domain dominance when composing a pretraining
    mix.  alpha = 0.5 deliberately: IEEE sqrt and division are
    correctly rounded, so the ppm values are bit-identical across
    engines (a general pow() is not).  Plan: one partial-aggregated
    groupBy + a 1-row max crossJoined back — no second shuffle."""
    docs = t(spark, sf, "documents")
    by_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    m = by_src.agg(F.max("n_docs").alias("n_max"))
    ratio = F.col("n_docs") * F.lit(1.0) / F.col("n_max")
    inv = F.col("n_max") * F.lit(1.0) / F.col("n_docs")
    return by_src.crossJoin(F.broadcast(m)).select(
        "source",
        "n_docs",
        F.round(F.sqrt(ratio) * 1_000_000).cast("long").alias("w_rel_ppm"),
        F.round(F.sqrt(inv) * 1_000_000).cast("long").alias("boost_ppm"),
    )


@query(
    "ivf_index_incremental_check",
    """
    SELECT CAST(COUNT(*) AS BIGINT)      AS n_queries,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_indexed,
           CAST(1 AS INTEGER)            AS coverage_ok,
           CAST(1 AS INTEGER)            AS recall_ge_floor
    FROM embeddings WHERE vec_id < 10
    """,
    rank=30,
)
def ivf_index_incremental_check(spark: SparkSession, sf: str) -> DataFrame:
    """Persistent IVF index end-to-end (operators/ann_index.py): build
    centroids + assignments tables on HALF the corpus, absorb the
    other half via the no-refit incremental append (O(batch) merge
    deltas keyed on vec_id), then query the persisted index and check
    it against brute force:

    - ``n_indexed`` / ``coverage_ok``: every corpus vector assigned
      exactly once after the append (distinct ids == corpus).
    - ``recall_ge_floor``: recall@5 at nprobe=3 of 8 cells >= 50% of
      ideal (measured ~0.7-0.9; centroids were fitted on half the
      data, so this also checks the append didn't need a refit).
    The deployment shape: embeddings arrive continuously, the index
    absorbs them at O(batch) cost, recall holds without refitting."""
    import tempfile  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import os as _os  # noqa: PLC0415

    from .operators.ann_index import (  # noqa: PLC0415
        append_to_ivf_index,
        build_ivf_index,
        ivf_index_topk,
        load_ivf_index,
    )

    app_id = spark.sparkContext.applicationId
    path = _os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_ivfidx_{app_id}_{_os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    e = t(spark, sf, "embeddings")
    build_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 0), k=8)
    append_to_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 1))
    _, at = load_ivf_index(spark, path)

    k = 5
    qs = e.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(qs, e, k=k).select("query_id", "neighbor_id")
    approx = ivf_index_topk(spark, path, qs, k=k, nprobe=3).select(
        "query_id", "neighbor_id"
    )
    n_q = qs.agg(F.count(F.lit(1)).alias("n_queries"))
    n_corpus = e.agg(F.count(F.lit(1)).alias("n_corpus"))
    n_idx = at.read().select("vec_id").distinct().agg(
        F.count(F.lit(1)).alias("n_indexed")
    )
    n_tp = approx.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_tp")
    )
    return (
        n_q.crossJoin(n_corpus).crossJoin(n_idx).crossJoin(n_tp)
        .select(
            "n_queries",
            "n_indexed",
            (F.col("n_indexed") == F.col("n_corpus"))
            .cast("int")
            .alias("coverage_ok"),
            (F.col("n_tp") * 2 >= F.col("n_queries") * k)
            .cast("int")
            .alias("recall_ge_floor"),
        )
    )


@query("bm25_index_search_documents", _BM25_ORACLE, rank=30)
def bm25_index_search_documents(spark: SparkSession, sf: str) -> DataFrame:
    """The PERSISTED inverted index end-to-end (operators/
    search_index.py): postings + additive corpus stats as keyed
    ManagedTables, built INCREMENTALLY in three batches (O(batch)
    merge deltas; a replayed tagged batch is skipped exactly-once),
    then queried term-pruned.  The oracle is the SAME exact-integer
    BM25 as the ad-hoc path — identical output is the proof that the
    incremental build composes to the single-pass result."""
    import tempfile  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import os as _os  # noqa: PLC0415

    from .operators.search_index import (  # noqa: PLC0415
        append_to_search_index,
        bm25_index_topk,
    )

    app_id = spark.sparkContext.applicationId
    path = _os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_bm25idx_{app_id}_{_os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    docs = t(spark, sf, "documents")
    for i in range(3):
        append_to_search_index(
            spark, path, docs.filter(F.col("doc_id") % 3 == i),
            batch_tag=f"b{i}",
        )
    return bm25_index_topk(spark, path, _BM25_TERMS, k=20)


@query(
    "vocab_growth_documents",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), mx AS (
      SELECT MAX(doc_id) + 1 AS n_ids FROM documents
    ), doc_toks AS (
      SELECT doc_id, len(toks)::BIGINT AS n_tok FROM tk
    ), firsts AS (
      SELECT term, MIN(doc_id) AS first_doc
      FROM (SELECT doc_id, unnest(toks) AS term FROM tk)
      GROUP BY term
    ), cps AS (SELECT unnest(generate_series(1, 8)) AS cp)
    SELECT cp * 125 AS prefix_permille,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM doc_toks, mx
             WHERE doc_id * 8 < n_ids * cp)            AS n_docs,
           (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM doc_toks, mx
             WHERE doc_id * 8 < n_ids * cp)            AS n_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts, mx
             WHERE first_doc * 8 < n_ids * cp)         AS n_distinct_terms
    FROM cps
    """,
    driver=True,  # r07: rotated into the driver gate
)
def vocab_growth_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct terms vs tokens
    seen over 8 corpus-prefix checkpoints (the scaling report that
    tells a tokenizer team how vocabulary demand grows with corpus
    size).  First-occurrence semantics make it ONE pass: term →
    MIN(doc_id), then every checkpoint is a conditional count over
    that (vocabulary-sized) table — never a per-checkpoint distinct
    over the corpus.  Checkpoint membership is pure integer
    arithmetic (doc_id * 8 < n_ids * cp), exact on any engine."""
    docs = t(spark, sf, "documents")
    toks = X.tokens("text")
    mx = docs.agg((F.max("doc_id") + 1).alias("n_ids"))
    doc_toks = docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_tok")
    )
    firsts = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    cps = spark.range(1, 9).select(F.col("id").cast("int").alias("cp"))
    d = (
        doc_toks.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(cps))
        .filter(F.col("doc_id") * 8 < F.col("n_ids") * F.col("cp"))
        .groupBy("cp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        )
    )
    v = (
        firsts.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(cps))
        .filter(F.col("first_doc") * 8 < F.col("n_ids") * F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_terms"))
    )
    return (
        cps.join(d, "cp", "left").join(v, "cp", "left")
        .select(
            (F.col("cp") * 125).cast("long").alias("prefix_permille"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_distinct_terms", F.lit(0)).alias("n_distinct_terms"),
        )
    )


@query(
    "embedding_health_embeddings",
    """
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ), comp AS (
      SELECT t.i AS dim,
             CAST(ROUND(e[t.i] / nrm * 1000000) AS BIGINT) AS q
      FROM v, UNNEST(generate_series(1, len(e))) AS t(i)
    ), means AS (
      -- integer micro-units of the mean unit vector: the per-dim sum
      -- stays < 1e6 * n (no overflow), and s/n is a correctly-rounded
      -- double of exact integer operands, so ROUND agrees everywhere
      SELECT dim, CAST(ROUND(SUM(q) * 1.0 / (SELECT COUNT(*) FROM v))
                       AS BIGINT) AS m
      FROM comp GROUP BY dim
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM v)
    SELECT n_vecs,
           CAST((SELECT SUM(CAST(ROUND(nrm * 1000000) AS BIGINT)) FROM v)
                // n_vecs AS BIGINT) AS mean_norm_u,
           (SELECT CAST(SUM(m * m) // 1000000 AS BIGINT) FROM means)
             AS anisotropy_ppm
    FROM n
    """,
    driver=True,  # r07: rotated into the driver gate
)
def embedding_health_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space health report: corpus size, mean L2 norm
    (micro units), and anisotropy — the squared norm of the MEAN unit
    vector in ppm (0 = perfectly isotropic, 1e6 = collapsed to one
    direction; Ethayarajh 2019's degeneration signal).  The mean-
    vector trick makes it one pass with NO pairwise work: E[cos] over
    random pairs equals ||mean(u)||².  Cross-engine exactness: unit
    components are quantized to integer nano-units per row (sqrt and
    division are IEEE-correctly-rounded, so the quantized values are
    bit-identical), then only ORDER-FREE integer sums cross rows —
    never a float sum whose grouping could differ between engines."""
    e = t(spark, sf, "embeddings")
    v = e.select(
        "vec_id", S._dvec("embedding").alias("e")
    ).withColumn("nrm", S.norm(F.col("e")))
    comp = v.select(
        F.posexplode(
            F.transform(
                "e",
                lambda x: F.round(x / F.col("nrm") * 1_000_000).cast("long"),
            )
        ).alias("dim", "q")
    )
    n = v.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    # integer micro-units of the mean unit vector per dim: the sum
    # stays < 1e6 * n (no int64 overflow at any corpus size once
    # squared), and sum/n is a correctly-rounded double of exact
    # integer operands — deterministic on any engine
    means = (
        comp.groupBy("dim")
        .agg(F.sum("q").alias("s"))
        .crossJoin(F.broadcast(n))
        .select(
            F.round(F.col("s") * F.lit(1.0) / F.col("n_vecs"))
            .cast("long")
            .alias("m")
        )
    )
    norm_sum = v.agg(
        F.sum(F.round(F.col("nrm") * 1_000_000).cast("long")).alias("ns")
    )
    aniso = means.agg(F.sum(F.col("m") * F.col("m")).alias("mm"))
    return (
        n.crossJoin(F.broadcast(norm_sum)).crossJoin(F.broadcast(aniso))
        .select(
            "n_vecs",
            F.expr("CAST(ns DIV n_vecs AS BIGINT)").alias("mean_norm_u"),
            F.expr("CAST(mm DIV 1000000 AS BIGINT)").alias("anisotropy_ppm"),
        )
    )


@query(
    "soft_dedup_documents",
    f"""
    WITH h AS (
      SELECT doc_id, md5({_NORM}) AS text_hash FROM documents
    ), grp AS (
      SELECT text_hash, CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM h GROUP BY text_hash
    )
    SELECT doc_id, n_copies,
           CAST({_uh_sql("doc_id")} * n_copies < 1.0 AS INTEGER) AS kept
    FROM h JOIN grp USING (text_hash)
    """,
    driver=True,  # r07: rotated into the driver gate
)
def soft_dedup_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Probabilistic exact-dup DOWNWEIGHTING (soft dedup): instead of
    hard-keeping one canonical copy, each member of an n-way duplicate
    group survives with probability 1/n via a deterministic salted-
    hash variate — in expectation one copy per group survives, but the
    surviving copy is UNIFORM over the group rather than always the
    smallest id, removing the systematic bias hard dedup introduces
    when copy order correlates with provenance.  (The standard
    repetition-aware sampling trade, e.g. discussed in Lee et al.
    2021 §4.)  Plan: one hash-group aggregate + a broadcast-backed
    equi-join back — no window, no shuffle of text payloads (the md5
    rides the shuffle, not the document)."""
    docs = t(spark, sf, "documents")
    h = docs.select(
        "doc_id", F.md5(X.normalize_text("text")).alias("text_hash")
    )
    grp = h.groupBy("text_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies")
    )
    u = SA.uniform_hash("doc_id")
    return h.join(grp, "text_hash").select(
        "doc_id",
        "n_copies",
        (u * F.col("n_copies") < 1.0).cast("int").alias("kept"),
    )


# --------------------------------------------------------------------
# Filtered vector search + reciprocal-rank fusion
# --------------------------------------------------------------------

@query(
    "filtered_ann_topk",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
      FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id AND d.lang = 'en'
    ), s AS (
      SELECT query_id, neighbor_id,
             ROUND(list_dot_product(qv, cv) / (qn * cn), 4) AS cosine_sim
      FROM q, c WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM s
    ) WHERE rank <= 5
    """,
    driver=True,  # r07: new
)
def filtered_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """FILTERED vector search: top-5 cosine neighbors restricted to a
    metadata predicate (here: the joined document's lang = 'en') — the
    retrieval shape every production vector store serves ("nearest
    English docs", "nearest docs from source X").

    PRE-filter, not post-filter: the predicate restricts the corpus
    BEFORE the distance pass, so (a) the FLOP cost is
    O(|filtered| × |queries| × dim), not O(|corpus| ...), and (b) the
    result never under-fills k the way post-filtering an unfiltered
    top-k does (filtering 5 neighbors down to the English ones can
    leave 1).  Plan: the lang predicate pushes into the documents
    parquet scan, the key-projected doc_id side broadcasts into a
    semi-join against the embeddings corpus, and the filtered corpus
    flows into the same broadcast-queries / one-pass / window top-k
    shape as ann_cosine_topk.  At 100 TB the semi-join side stays a
    key projection (never the text payload), and an IVF variant would
    apply the same semi-join to the assignments table — cell pruning
    and metadata pruning compose."""
    e = t(spark, sf, "embeddings")
    d = t(spark, sf, "documents")
    en_ids = d.filter(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = e.join(F.broadcast(en_ids), "vec_id", "left_semi")
    return S.cosine_topk(e.filter(F.col("vec_id") < 10), corpus, k=5)


_RRF_K = 60
_RRF_TOPN = 20  # depth of each input ranking


_RRF_ORACLE = f"""
    WITH dl0 AS (
      SELECT doc_id, len({_TOKS}) AS dl, {_TOKS} AS tk FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl0
    ), tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(tk) AS term FROM dl0)
      WHERE term IN ({{terms}})
      GROUP BY 1, 2, 3
    ), dft AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), idf AS (
      SELECT term,
             CAST(FLOOR(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                        * 1000000 + 0.5) AS BIGINT) AS idf_u
      FROM dft, stats
    ), bm25_scored AS (
      SELECT tf.doc_id,
             CAST(SUM((idf_u * (36 * tf * total_dl))
               // (16 * tf * total_dl + 5 * total_dl + 15 * dl * n_docs))
               AS BIGINT) AS score_u
      FROM tf JOIN idf USING (term), stats
      GROUP BY tf.doc_id
    ), bm25_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id)
               AS brank
      FROM bm25_scored
      ORDER BY score_u DESC, doc_id LIMIT {_RRF_TOPN}
    ), qv AS (
      SELECT embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS vn
      FROM embeddings WHERE vec_id = 0
    ), cos AS (
      SELECT vec_id AS doc_id,
             ROUND(list_dot_product(qv.v, embedding::DOUBLE[])
                   / (qv.vn * sqrt(list_dot_product(embedding::DOUBLE[],
                                                    embedding::DOUBLE[]))), 4)
               AS cosine_sim
      FROM embeddings, qv WHERE vec_id <> 0
    ), vec_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, doc_id)
               AS vrank
      FROM cos
      ORDER BY cosine_sim DESC, doc_id LIMIT {_RRF_TOPN}
    ), fused AS (
      SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
             COALESCE(1000000 // ({_RRF_K} + b.brank), 0)
               + COALESCE(1000000 // ({_RRF_K} + v.vrank), 0) AS rrf_u,
             b.brank AS bm25_rank, v.vrank AS vec_rank
      FROM bm25_ranked b FULL OUTER JOIN vec_ranked v USING (doc_id)
    )
    SELECT doc_id, CAST(rrf_u AS BIGINT) AS rrf_u,
           CAST(bm25_rank AS INTEGER) AS bm25_rank,
           CAST(vec_rank AS INTEGER) AS vec_rank
    FROM fused
    ORDER BY rrf_u DESC, doc_id LIMIT 10
    """.replace("{terms}", _in_list(_BM25_TERMS))


@query("rrf_fusion_documents", _RRF_ORACLE, driver=True)  # r07: new
def rrf_fusion_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion — the OTHER standard hybrid-retrieval
    combiner (hybrid_search_documents is the rerank shape; RRF is the
    rank-level fusion shape used when scores aren't comparable):
    top-20 BM25 ranking for a keyword query fused with the top-20
    cosine ranking against a query embedding, each doc scoring
    Σ 1_000_000 // (60 + rank) in exact integer micro-units over the
    lists it appears in (Cormack et al. 2009's 1/(k+r) with k=60,
    integer-quantized so the fusion is bit-identical cross-engine).

    Plan: the two input rankings are each a bounded top-N
    (TakeOrderedAndProject over the scored relation — BM25's term
    filter prunes its scan; the cosine side is one broadcast-query
    corpus pass), so the fusion's FULL OUTER join runs over ≤ 2N rows
    — driver-scale frames, broadcast both ways, no corpus shuffle.
    At 100 TB the inputs stay bounded (N=20) however large the corpus;
    only the two scored passes scale."""
    from .operators import search as SRCH  # noqa: PLC0415

    docs = t(spark, sf, "documents")
    e = t(spark, sf, "embeddings")
    w_b = F.row_number().over(
        Window.orderBy(F.col("score_u").desc(), F.col("doc_id"))
    )
    bm25 = (
        SRCH.bm25_topk(docs, _BM25_TERMS, k=_RRF_TOPN)
        .select("doc_id", "score_u")
        .withColumn("brank", w_b)
    )
    cos = S.cosine_topk(
        e.filter(F.col("vec_id") == 0), e, k=_RRF_TOPN
    ).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("vrank")
    )
    # `div` = exact INTEGER division (matching the oracle's `//`) —
    # floor(1e6 / x) in doubles could land one ulp under the true
    # quotient and floor to n-1 on one engine only
    fused = (
        bm25.select("doc_id", "brank")
        .join(cos, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + brank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + vrank)"), F.lit(0)
                )
            ).cast("long").alias("rrf_u"),
            F.col("brank").cast("int").alias("bm25_rank"),
            F.col("vrank").cast("int").alias("vec_rank"),
        )
    )
    return fused.orderBy(F.col("rrf_u").desc(), "doc_id").limit(10)
