"""Deterministic sampling / splitting / mixing (operators/sampling.py)
and benchmark decontamination (dedup.benchmark_contamination).

The contract under test everywhere: selection is a pure function of
(row id, salt) — identical across runs, partitionings, and engines —
and proportions land where the parameters say.
"""

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators import sampling as SA
from s3_sqs_data_ingestion_demo_spark.operators.dedup import (
    benchmark_contamination,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_split_is_deterministic_and_partition_invariant(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in SA.hash_split(docs, w).collect()}
    b = {
        r.doc_id: r.split
        for r in SA.hash_split(docs.repartition(13), w).collect()
    }
    assert a == b  # layout-independent
    n = len(a)
    counts = {s: sum(1 for v in a.values() if v == s) for s in w}
    assert sum(counts.values()) == n  # total function: every row labeled
    # 500 docs: binomial(500, 0.8) is within ±5pp of 0.8 at ~6 sigma
    assert abs(counts["train"] / n - 0.8) < 0.05
    assert counts["val"] > 0 and counts["test"] > 0


def test_hash_split_stable_under_corpus_growth(spark, docs):
    """A row's split must not change when other rows appear — the
    property per-row hashing has and any rank/RNG scheme lacks."""
    w = {"train": 0.9, "val": 0.1}
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full = {r.doc_id: r.split for r in SA.hash_split(docs, w).collect()}
    part = {r.doc_id: r.split for r in SA.hash_split(half, w).collect()}
    assert part == {k: v for k, v in full.items() if k % 2 == 0}


def test_hash_split_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        SA.hash_split(docs, {"a": 0.5, "b": 0.2})


def test_stratified_sample_respects_fractions(spark, docs):
    out = SA.stratified_sample(
        docs, "lang", {"en": 0.5, "de": 1.0}, default_fraction=0.0
    )
    got = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in got}
    n_de = docs.filter(F.col("lang") == "de").count()
    n_en = docs.filter(F.col("lang") == "en").count()
    assert set(by_lang) == {"en", "de"}  # default 0 drops other strata
    assert by_lang["de"] == n_de  # fraction 1.0 keeps everything
    assert abs(by_lang["en"] / n_en - 0.5) < 0.15
    # deterministic: same call, same rows
    again = SA.stratified_sample(
        docs, "lang", {"en": 0.5, "de": 1.0}, default_fraction=0.0
    )
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_domain_mix_exact_quotas(spark, docs):
    shares = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    out = SA.domain_mix(docs, "source", shares)
    by_src = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    # 25 docs per source at sf0.01: binding domain src0 → total 50
    assert by_src == {"src0": 25, "src1": 12, "src2": 12}
    # achieved mix is exact to the floor: every share within 1/total
    total = sum(by_src.values())
    for s, p in shares.items():
        assert abs(by_src[s] / total - p) <= 1.0 / total + 1e-9
    # deterministic
    again = SA.domain_mix(docs, "source", shares)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_domain_mix_raises_on_empty_target_domain(spark, docs):
    """A target domain with zero available rows must fail loudly: it
    would otherwise contribute no capacity bound and no quota, and the
    output proportions would silently stop matching target_shares."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    out = SA.domain_mix(
        docs, "source", {"src0": 0.5, "no_such_domain": 0.5}
    )
    with pytest.raises(SparkRuntimeException, match="no rows available"):
        out.count()


def test_export_order_is_a_stable_permutation(spark, docs):
    a = [r.doc_id for r in SA.export_order(docs, n_partitions=4).select("doc_id").collect()]
    b = [r.doc_id for r in SA.export_order(docs.repartition(7), n_partitions=4).select("doc_id").collect()]
    assert a == b  # same total order regardless of input layout
    assert sorted(a) == [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").collect()]
    assert a != sorted(a)  # actually permuted, not id order


def test_hash_split_matches_independent_python_model(spark):
    """Cross-implementation property (hypothesis): for arbitrary weight
    vectors, every row's label equals an independent Python
    re-derivation of the salted-md5 threshold walk — pinning the exact
    hash construction (md5 hex → first 15 digits → /2^60) and the
    accumulation order the oracle SQL also mirrors."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    @given(ws=st.lists(st.floats(0.05, 1.0), min_size=2, max_size=4))
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def run(ws):
        total = sum(ws)
        weights = {f"s{i}": w / total for i, w in enumerate(ws)}
        got = {r.doc_id: r.split for r in SA.hash_split(docs, weights).collect()}

        items = list(weights.items())

        def label(doc_id: int) -> str:
            u = int(
                hashlib.md5(f"{doc_id}:sg".encode()).hexdigest()[:15], 16
            ) / float(1 << 60)
            acc = 0.0
            for name, w in items[:-1]:
                acc += w
                if u < acc:
                    return name
            return items[-1][0]

        assert got == {i: label(i) for i in got}

    run()


def test_pack_offset_is_shard_count_invariant(spark, docs):
    """Value-range shards make shard-major order equal global hash
    order, so the packing must be byte-identical for any n_shards."""
    from pyspark.sql import functions as F2

    from s3_sqs_data_ingestion_demo_spark.operators.text import token_count

    d = docs.select("doc_id", token_count("text").alias("n_tokens"))
    a = {
        r.doc_id: (r.stream_offset, r.seq_id)
        for r in SA.pack_sequences_by_offset(d, 512, "n_tokens", n_shards=4).collect()
    }
    b = {
        r.doc_id: (r.stream_offset, r.seq_id)
        for r in SA.pack_sequences_by_offset(d, 512, "n_tokens", n_shards=32).collect()
    }
    assert a == b
    # offsets form a contiguous stream: max offset + its tokens == total
    total = d.agg(F2.sum("n_tokens")).first()[0]
    last = max(a.items(), key=lambda kv: kv[1][0])
    last_tokens = {r.doc_id: r.n_tokens for r in d.collect()}[last[0]]
    assert last[1][0] + last_tokens == total
    assert min(v[0] for v in a.values()) == 0


def test_pack_strict_respects_budget(spark, docs):
    """Strict greedy packing: no sequence exceeds the budget unless a
    single oversize document occupies it alone; packing is stable
    under input repartitioning."""
    from collections import defaultdict

    from s3_sqs_data_ingestion_demo_spark.operators.text import token_count

    budget = 512
    d = docs.select("doc_id", token_count("text").alias("n_tokens"))
    out = SA.pack_sequences_strict(d, budget, "n_tokens").collect()
    seqs = defaultdict(list)
    for r in out:
        seqs[r.seq_id].append(r)
    for seq_rows in seqs.values():
        total = sum(r.n_tokens for r in seq_rows)
        if total > budget:
            assert len(seq_rows) == 1 and seq_rows[0].n_tokens > budget
        assert max(r.seq_fill for r in seq_rows) == total
    # stable under any input partitioning
    again = SA.pack_sequences_strict(d.repartition(11), budget, "n_tokens").collect()
    assert sorted((r.doc_id, r.seq_id) for r in out) == sorted(
        (r.doc_id, r.seq_id) for r in again
    )


def test_contamination_flags_benchmark_members(spark, docs):
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = benchmark_contamination(docs, bench, threshold=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    bench_ids = [r.doc_id for r in bench.select("doc_id").collect()]
    flagged = [i for i in bench_ids if i in rows]
    assert flagged, "benchmark docs with shingles must appear"
    # a benchmark member overlaps itself completely
    for i in flagged:
        assert rows[i].overlap_ratio == 1.0
        assert rows[i].contaminated == 1
    # every doc with shingles is scored, ratios in [0, 1]
    assert all(0.0 <= r.overlap_ratio <= 1.0 for r in rows.values())
    assert any(r.contaminated == 0 for r in rows.values())


def test_importance_sample_is_deterministic_and_monotone(spark):
    from pyspark.sql import functions as F

    from s3_sqs_data_ingestion_demo_spark.operators.sampling import (
        importance_sample,
    )

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100 / 100.0).alias("s")
    )
    kept = importance_sample(df, "s").select("doc_id")
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in importance_sample(df.repartition(13), "s").collect()}
    assert a == b  # stable under repartition
    # rows with score 0 can never survive; expected keep-rate ~ mean(s)
    zero = {r.doc_id for r in df.filter("s = 0.0").collect()}
    assert not (a & zero)
    assert 0.3 < len(a) / 2000 < 0.7  # mean score 0.495


def test_negative_samples_shape_and_determinism(spark):
    from pyspark.sql import functions as F

    from s3_sqs_data_ingestion_demo_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    out = negative_samples(df, k=3, n_buckets=16)
    rows = out.collect()
    # every row is a valid (anchor, j, negative) with negative != anchor
    assert all(1 <= r.j <= 3 and r.negative_id != r.anchor_id for r in rows)
    # near-complete coverage: an anchor loses a draw only when it IS the
    # bucket representative it drew
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault(r.anchor_id, set()).add(r.j)
    assert len(per_anchor) == 300
    assert sum(len(v) for v in per_anchor.values()) >= 300 * 3 * 0.9
    again = negative_samples(df.repartition(7), k=3, n_buckets=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
