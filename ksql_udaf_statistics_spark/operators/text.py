"""Text-analysis operators for training-data pipelines (engine scope).

All hot paths are JVM-side Column expressions (split/transform/aggregate/
regexp) — no Python in the row path — so they scale to 100 TB document
tables and their plans stay inside whole-stage codegen. Every function is
deterministic and ANSI-SQL-expressible so the DuckDB oracle harness can
verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small fixed stopword list (shared with the oracle SQL in
# __spark_entry__.py — keep in sync).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: BPE-ish token pattern: runs of word chars, or single non-space symbols.
BPE_REGEX = r"\w+|[^\w\s]"


def words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count_whitespace(text: Column | str) -> Column:
    return F.size(words(text))


def token_count_bpe(text: Column | str) -> Column:
    """Count of BPE-ish tokens via regexp — a cheap upper-bound proxy for
    a real tokenizer's sequence length."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0)))


def avg_word_len(text: Column | str) -> Column:
    w = words(text)
    total = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return total.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def stopword_ratio(text: Column | str) -> Column:
    w = words(text)
    stop = F.size(F.filter(w, lambda x: F.lower(x).isin(STOPWORDS)))
    return stop.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long-enough docs with a healthy
    stopword ratio and low punctuation noise score high. Deterministic,
    closed-form, SQL-matchable."""
    c = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.length(c).cast("double") / 500.0, F.lit(1.0))
    stop = stopword_ratio(c)
    stop_score = F.least(stop * 5.0, F.lit(1.0))  # saturates at 20% stopwords
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 5.0)
    return (0.4 * len_score + 0.4 * stop_score + 0.2 * punct_penalty).alias("quality")


def lang_id(text: Column | str, threshold: float = 0.05) -> Column:
    """N-gram/stopword language heuristic: flag 'en' when the English
    stopword ratio clears ``threshold``, else 'unknown'. (The testdata's
    ``lang`` column is synthetic and uncorrelated with the text — this is
    a content-based signal, not a label predictor.)"""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Fraction of repeated n-gram occurrences within one document:
    ``1 - distinct_ngrams / total_ngrams``. The standard boilerplate /
    looping-text quality rule for LLM corpora (high ratio = templated or
    degenerate text). One pass over the word array, JVM-side.

    Cost shape: counts DISTINCT ROLLING HASHES via the zip_with/slice
    idiom shared with ``dedup.word_shingle_hashes`` — every reference to
    the word array stays in row position, so the plan is O(len * n) per
    document. (The naive alternative — ``F.slice(w, i + 1, n)`` inside a
    per-element ``F.transform`` lambda — re-evaluates the whole split per
    element: O(len^2)/row, the measured-10x HOF trap documented at
    dedup.py::word_shingle_hashes.) The distinct-hash count equals the
    distinct-string count up to 64-bit collisions within one document
    (~shingles^2/2^64 — negligible), so the DuckDB string-shingle oracle
    still matches value-for-value."""
    from .dedup import word_shingle_hashes

    c = F.col(text) if isinstance(text, str) else text
    w = F.split(c, " ")
    distinct = F.size(word_shingle_hashes(c, n))
    total = F.greatest(F.size(w) - (n - 1), F.lit(1)).cast("double")
    return F.lit(1.0) - distinct.cast("double") / total


def positional_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of n-word shingle strings IN POSITION ORDER (one per start
    offset, no distinct) — the form boilerplate STRIPPING needs, where
    :func:`~..operators.dedup.word_shingles` (distinct set) is the form
    boilerplate DETECTION needs.

    Cost shape: built by zipping the word array against its own shifted
    slices (the same rolling idiom as ``dedup.word_shingle_hashes``), so
    every reference to the split stays in row position — O(len * n) per
    document. Never ``F.slice(w, i + 1, n)`` inside a per-element
    ``transform`` lambda: that re-evaluates the whole split per element,
    the measured-10x O(len^2) HOF trap."""
    c = F.col(text) if isinstance(text, str) else text
    w = F.split(c, " ")
    size = F.size(w)
    sh = w
    for k in range(1, n):
        shifted = F.slice(w, k + 1, F.greatest(size - k, F.lit(0)))
        # zip_with pads the shorter side with NULL; concat_ws skips
        # NULLs, so tail entries are short partial shingles — trimmed by
        # the final slice to exactly the size-(n-1) full shingles
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(sh, 1, F.greatest(size - (n - 1), F.lit(0)))


def boilerplate_covered_count(
    text: Column | str, boilerplate: list[str], n: int = 3
) -> Column:
    """Number of word positions covered by at least one occurrence of a
    boilerplate n-gram — the token-level removal cost of stripping every
    match of the ``boilerplate`` set (e.g. ``boilerplate_ngrams_topk``'s
    output) from the document.

    A word at position j is covered when ANY shingle starting in
    ``[j-n+1, j]`` is in the set. Computed without per-element indexing:
    the per-start membership flags are OR-folded against their own
    0..n-1 shifted paddings via ``zip_with`` — O(len * n) per document,
    all JVM codegen. The boilerplate set (top-k rows, KBs) rides into
    the plan as a foldable literal array — the broadcast-lite pattern
    for driver-known small sets. Documents with fewer than ``n`` words
    have no full shingle and count 0."""
    bset = F.array(*[F.lit(s) for s in boilerplate])
    fl = F.transform(
        positional_shingles(text, n), lambda s: F.array_contains(bset, s)
    )
    false_pad = lambda k: F.array_repeat(F.lit(False), k)  # noqa: E731
    covered = None
    for k in range(n):
        shifted = (
            fl if n == 1
            else F.concat(false_pad(k), fl, false_pad(n - 1 - k))
        )
        covered = shifted if covered is None else F.zip_with(
            covered, shifted, lambda a, b: a | b
        )
    return F.aggregate(
        covered, F.lit(0), lambda acc, x: acc + F.when(x, 1).otherwise(0)
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint: first 15 hex digits of
    md5 as a bigint (rolling-hash stand-in that DuckDB reproduces exactly
    via the same md5)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def text_profile(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the full feature set — the batch building
    block for filtering/weighting a 100 TB corpus (single scan, codegen)."""
    c = F.col(text_col)
    return documents.select(
        "doc_id",
        "source",
        token_count_whitespace(c).alias("n_words"),
        token_count_bpe(c).alias("n_bpe_tokens"),
        avg_word_len(c).alias("avg_word_len"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
