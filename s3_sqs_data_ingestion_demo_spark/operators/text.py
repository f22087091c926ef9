"""Text-analysis operators for large-scale training-data pipelines.

All column builders are pure ``pyspark.sql.functions`` expressions —
JVM-side, whole-stage-codegen'd, no Python in the row loop — so they
cost one narrow projection over the scan at any scale.

Operators: tokenization / token stats, quality scoring
(length / punctuation / stopword ratios), marker-word language ID,
and content fingerprinting (normalized-text hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker-word sets for the language-ID heuristic.  Deliberately tiny
# and deterministic: the operator contract is "argmax of marker-word
# hits with a fixed tie order", which an oracle can replicate exactly.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}
LANG_ORDER = tuple(LANG_MARKERS)  # tie-break preference order

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be",
)


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization; empty text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# non-space symbols — the shape GPT-style byte-pair pretokenization
# produces before merges; a cheap, portable token-budget estimator.
# Control characters (C0 + DEL) are excluded from the symbol class:
# the BPE DuckDB oracle folds symbol lists through a chr(1)-joined
# string accumulator, so a corpus token containing U+0001 would make
# that delimiter ambiguous and break engine/oracle merge parity.
# Syntax is restricted to the Java∩RE2 subset (both engines see the
# same pattern verbatim).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s\x00-\x1f\x7f]"


def bpe_ish_token_count(col: str | Column) -> Column:
    """Count BPE-ish pre-tokens (letter runs / digit runs / symbols) —
    a deterministic stand-in for tokenizer-based token budgeting,
    computed JVM-side with ``regexp_count``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    # counts WITH multiplicity (filter, not intersect) so the score is
    # a real frequency signal
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-scoring feature columns.

    - ``n_tokens``, ``avg_token_len``
    - ``punct_ratio``  — non-alphanumeric-non-space chars / chars
    - ``digit_ratio``  — digit chars / chars
    - ``stopword_ratio`` — stopword tokens / tokens
    - ``quality_score`` — a simple monotone combination in [0, 1]
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    nz_chars = F.greatest(n_chars, F.lit(1))
    nz_tokens = F.greatest(n_tokens, F.lit(1))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    stop = _count_in(toks, STOPWORDS)
    avg_tok = (n_chars - (n_tokens - 1)) / nz_tokens
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", F.round(avg_tok, 4))
        .withColumn("punct_ratio", F.round(punct / nz_chars, 4))
        .withColumn("digit_ratio", F.round(digits / nz_chars, 4))
        .withColumn("stopword_ratio", F.round(stop / nz_tokens, 4))
        .withColumn(
            "quality_score",
            F.round(
                length_score
                * (1 - F.least(punct / nz_chars * 4, F.lit(1.0)))
                * (1 - F.least(digits / nz_chars * 4, F.lit(1.0))),
                4,
            ),
        )
    )


def retention_sweep(
    df: DataFrame,
    text_col: str = "text",
    thresholds: tuple[int, ...] = (0, 10, 20, 40, 60, 80, 120, 160, 240, 320),
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Minimum-length filter sweep: for each candidate ``min_tokens``
    threshold, how many documents (and how many BPE-ish tokens) would
    the corpus retain?  The curve a pipeline owner reads before
    committing to a length cutoff.

    Scale shape: the corpus collapses to a token-count HISTOGRAM first
    (one hash aggregate; output rows = distinct token counts, which is
    bounded by max document length, not corpus size), and only the
    histogram meets the broadcast threshold grid in a
    nested-loop theta join — per-threshold sums then run over
    |histogram| × |grid| rows.  No per-document row is ever
    replicated per threshold.  All outputs are exact integers
    (counts, token sums, and ppm ratios via BIGINT ``div``).
    """
    hist = (
        df.select(bpe_ish_token_count(text_col).cast("long").alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        df.sparkSession.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(int(g)) for g in thresholds])
            ).alias("min_tokens")
        )
        .select(F.col("min_tokens").cast("int").alias("min_tokens"))
    )
    totals = hist.agg(
        F.sum("c").alias("_td"),
        F.sum(F.col("n") * F.col("c")).alias("_tt"),
    )
    per_g = (
        F.broadcast(grid)
        .join(hist, hist.n >= F.col("min_tokens"), "left")
        .groupBy("min_tokens")
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("docs_retained"),
            F.coalesce(F.sum(F.col("n") * F.col("c")), F.lit(0))
            .cast("long")
            .alias("tokens_retained"),
        )
    )
    return per_g.crossJoin(F.broadcast(totals)).select(
        "min_tokens",
        "docs_retained",
        "tokens_retained",
        F.expr(f"(docs_retained * {ppm_scale}L) div _td").alias(
            "docs_retained_ppm"
        ),
        F.expr(f"(tokens_retained * {ppm_scale}L) div _tt").alias(
            "tokens_retained_ppm"
        ),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (100, 200, 400, 800, 1600, 3200),
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus token
    OCCURRENCES do the k most frequent token TYPES cover, for each k
    in ``ks`` — the curve read before sizing a tokenizer vocabulary.

    Ties rank deterministically (count desc, then term asc), so the
    selected top-k SET — and therefore every output value — is
    engine-exact; coverage is integer ppm over exact BIGINT sums.

    Scale shape: the corpus collapses to (term, count) in one hash
    aggregate; global top-max(k) selection is a TakeOrdered (per-
    partition top-k, then a bounded merge — never a full sort of the
    vocabulary); ranking + the grid theta-join then run over at most
    max(k) rows, which is bounded by the CALLER's constant, not the
    corpus.  The single-partition window below is safe for the same
    reason.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    kmax = max(ks)
    counts = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(kmax)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = top.withColumn("rank", F.row_number().over(w))
    grid = (
        df.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("vocab_k"))
        .select(F.col("vocab_k").cast("int").alias("vocab_k"))
    )
    totals = counts.agg(F.sum("cnt").alias("_tt"))
    per_k = (
        F.broadcast(grid)
        .join(ranked, F.col("rank") <= F.col("vocab_k"), "left")
        .groupBy("vocab_k")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0))
            .cast("long")
            .alias("covered_tokens")
        )
    )
    return per_k.crossJoin(F.broadcast(totals)).select(
        "vocab_k",
        "covered_tokens",
        F.expr(f"(covered_tokens * {ppm_scale}L) div _tt").alias(
            "coverage_ppm"
        ),
    )


def lang_scores(col: str | Column) -> dict[str, Column]:
    toks = tokens(col)
    return {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}


def lang_id(col: str | Column) -> Column:
    """Marker-word language ID: argmax of per-language marker hits,
    ties broken by ``LANG_ORDER``; zero hits everywhere → ``und``.

    Expressed as a chained CASE so the plan is pure codegen and an SQL
    oracle can replicate it verbatim.
    """
    scores = lang_scores(col)
    expr = F.lit("und")
    # build the CASE back-to-front so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        others = [scores[o] for o in LANG_ORDER if o != lang]
        cond = (scores[lang] > 0) & (scores[lang] >= F.greatest(*others))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def normalize_text(col: str | Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """Content fingerprint: md5 of the normalized text.  Identical
    logical content (modulo case/punct/whitespace) → identical
    fingerprint; the exact-dedup key for noisy corpora."""
    return F.md5(normalize_text(col))


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window chunking for training/RAG export: split each
    document into chunks of ``chunk_size`` tokens, consecutive chunks
    overlapping by ``overlap`` tokens (stride = chunk_size − overlap).
    A document shorter than one chunk emits a single (shorter) chunk;
    token-free documents emit nothing.

    Returns (doc_id, chunk_id, n_chunk_tokens, chunk_hash) — the hash
    (md5 of the space-joined chunk) stands in for the chunk text so
    downstream joins/dedup/driver checks never carry payloads.

    Scale shape: pure projection + generator — tokens are split,
    chunk starts enumerated with ``sequence``, windows taken with
    ``slice``, all JVM-side within the scan's partition.  ZERO
    shuffles at any corpus size; output rows ≈ corpus tokens / stride.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    step = chunk_size - overlap
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    ).filter(F.col("_n") > 0)
    # number of chunks: ceil(max(n - overlap, 1) / step), exact in
    # integer arithmetic (floor((x + step - 1) / step) on longs)
    n_eff = F.greatest(F.col("_n") - F.lit(overlap), F.lit(1))
    n_chunks = F.floor((n_eff + F.lit(step - 1)) / F.lit(step)).cast("int")
    chunk = F.slice("_toks", F.col("chunk_id") * step + 1, chunk_size)
    return (
        base.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
            "_toks",
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size(chunk).cast("int").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition quality signals — the Gopher-rule
    family ("repetitious documents are low quality"): what fraction of
    a document is its most common token / bigram, and how much of it
    is repeated tokens at all.

    Returns (doc_id, n_tokens, dup_token_fp4, top_token,
    top_token_fp4, top_bigram_fp4): the ``_fp4`` columns are EXACT
    fixed-point fractions ``(count * 10000) div total`` so
    cross-engine comparison never touches float rounding.  The top
    token ties break to the lexicographically-last token (struct-max
    semantics, mirrored in the oracle's window tiebreak).

    Scale shape (100 TB): two explode aggregates, each shuffling
    (doc, gram) pairs with map-side partial counts; the per-document
    roll-ups ride the same (doc) key; the token and bigram profiles
    join 1:1 on doc_id.  No payload strings survive the first
    aggregate — only grams and counts.
    """
    from .dedup import shingles  # noqa: PLC0415 (cycle guard)

    toks = tokens(text_col)
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok_stats = tf.groupBy("doc_id").agg(
        F.sum("c").cast("int").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max(F.struct("c", "tok")).alias("top"),
    )
    bf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles(text_col, 2)).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg_stats = bf.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("max_bg")
    )
    return (
        tok_stats.join(bg_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                "CAST((CAST(n_tokens AS BIGINT) - n_distinct) * 10000 "
                "DIV n_tokens AS BIGINT)"
            ).alias("dup_token_fp4"),
            F.col("top.tok").alias("top_token"),
            F.expr("CAST(top.c * 10000 DIV n_tokens AS BIGINT)").alias(
                "top_token_fp4"
            ),
            F.coalesce(
                F.expr("CAST(max_bg * 10000 DIV n_bigrams AS BIGINT)"), F.lit(0)
            ).alias("top_bigram_fp4"),
        )
    )


# PII patterns deliberately restricted to syntax valid in BOTH Java
# regex (Spark) and RE2 (DuckDB oracle, Go/Rust tooling): ASCII
# classes, \b word boundaries, bounded repetition — no lookaround, no
# backreferences.  Scrub order is fixed (SSN before phone: both match
# digit-dash shapes and the more specific pattern must win).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction — the compliance pass every training-data
    pipeline runs before export: replace email / SSN-shaped / phone /
    IPv4 literals with ``<TYPE>`` placeholders and report per-doc
    match counts.

    Returns (id, n_email, n_ssn, n_phone, n_ipv4, scrubbed_hash) —
    the scrubbed text itself is summarized as an md5 so the relation
    stays payload-free (the rewrite is a zero-shuffle projection; a
    real export pipeline would write the scrubbed column instead).
    Counts are computed BEFORE any replacement so overlapping types
    report what they matched in the original text.
    """
    c = F.col(text_col)
    out = df.select(
        F.col(id_col).alias("id"),
        c.alias("_t"),
        *[
            F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat in PII_PATTERNS
        ],
    )
    scrubbed = F.col("_t")
    for name, pat in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return out.select(
        "id",
        *[f"n_{name}" for name, _ in PII_PATTERNS],
        F.md5(scrubbed).alias("scrubbed_hash"),
    )
