"""Python UDTF surface (Spark 4 user-defined table functions).

Completes the UDF/UDAF/UDTF coverage (SURVEY §2.5): a UDTF is the
extension point for row→rows expansions whose logic genuinely needs
Python (external parsers, tokenizers with library dependencies).
Everything expressible with built-in generators (``explode``,
``sequence``, ``posexplode``) should stay JVM-side — the repo's
chunking/frame-sampling operators are the proof — so the UDTFs here
are deliberately small reference implementations of the pattern, not
hot-path operators.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string, n_chars int")
class TokenSpans:
    """(text) → one row per whitespace token with its position and
    length — the canonical row-expansion shape."""

    def eval(self, text: str):  # noqa: D102
        for i, w in enumerate((text or "").split()):
            yield (i, w, len(w))


@udtf(returnType="sent_id int, sentence string, n_tokens int")
class SplitSentences:
    """(text) → naive sentence rows (period/question/exclamation
    split) with token counts — the shape an external NLP segmenter
    would plug into."""

    def eval(self, text: str):  # noqa: D102
        import re  # noqa: PLC0415

        parts = [p.strip() for p in re.split(r"[.!?]+", text or "") if p.strip()]
        for i, p in enumerate(parts):
            yield (i, p, len(p.split()))


def register_udtfs(spark) -> None:
    """Expose the UDTFs to SQL (``LATERAL token_spans(text)`` /
    ``split_sentences(text)``) — the form the reference's
    ``transform_query`` hook would call them through."""
    spark.udtf.register("token_spans", TokenSpans)
    spark.udtf.register("split_sentences", SplitSentences)
