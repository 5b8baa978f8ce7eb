"""Text column functions shared by the dedup / text-analysis operators.

All pure Catalyst expressions. Where an operator must hash-match the
DuckDB oracle, the expression is restricted to constructs with
identical semantics in both engines (``replace``-based occurrence
counts, simple character-class regexes, ``split`` on single spaces).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(c: Column) -> Column:
    """Lowercase, collapse whitespace runs, strip — the canonical form
    used by fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def token_count_col(c: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def occurrence_count(c: Column, needle: str) -> Column:
    """Number of occurrences of a literal substring, via the
    replace-length trick — semantics identical in Spark and DuckDB
    (used for oracle-checkable language-ID scoring)."""
    return (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit("")))) / len(needle)


def bind_once(expr: Column, fn) -> Column:
    """Bind ``expr`` to a lambda VARIABLE so ``fn`` can reference it
    per-element for free. A free (outer) expression referenced inside a
    higher-order-function lambda is RE-EVALUATED per array element —
    ``transform(starts, i -> slice(split(text), i, n))`` re-runs the
    split for every shingle, turning an O(L) projection into O(L^2)
    per row. Wrapping the expression in a single-element array and
    ``transform``-ing over it evaluates it exactly once per row."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a single-space-separated text column.
    Catalyst-only: split -> sequence of start offsets -> transform with
    slice+join. Empty array when the text has fewer than ``n`` words.
    The split word array is bound once per row (see :func:`bind_once`)."""

    def _shingle(words):
        # Guard short docs: sequence(1, 0) DESCENDS in Spark ([1, 0]),
        # and slice(words, 0, n) then throws — so a doc with fewer
        # than n words must short-circuit to an empty array.
        starts = F.when(
            F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(starts, lambda i: F.array_join(F.slice(words, i, n), " "))
        )

    return bind_once(F.split(F.trim(c), r"\s+"), _shingle)


# BPE-style pre-tokenization classes: letter runs, digit runs, single
# non-alphanumeric marks. Same regex semantics in Java (Spark) and RE2
# (DuckDB) — no lookarounds, no unicode classes.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(c: Column) -> Column:
    """Token count under a BPE-ish pre-tokenizer (letter runs / digit
    runs / individual punctuation marks) — the standard cheap proxy for
    LLM token accounting over a corpus. One regexp scan per document,
    fully JVM-side."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def char_ngrams(c: Column, n: int = 5) -> Column:
    """Distinct character n-grams (for SimHash / fingerprint features).
    The text expression is bound once per row (see :func:`bind_once`)."""

    def _grams(t):
        starts = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
        return F.array_distinct(F.transform(starts, lambda i: F.substring(t, i, n)))

    return bind_once(c, _grams)


def unicode_normalized_text(c: Column) -> Column:
    """NFC-normalize, lowercase, collapse whitespace runs, strip.

    The Unicode-aware sibling of :func:`normalized_text` for corpora
    where the same document arrives in NFC and NFD encodings (common
    when mixing crawl sources / OCR output). Spark SQL has no built-in
    Unicode normalization, so this is an Arrow-batched pandas UDF over
    ``Series.str.normalize`` — map-only, no shuffle, the documented
    slow-path exception (everything downstream stays Catalyst).

    Oracle equivalence (DuckDB):
    ``trim(regexp_replace(lower(nfc_normalize(x)), '\\s+', ' ', 'g'))``.
    """

    @F.pandas_udf("string")
    def _norm(s):  # pandas Series[str] -> Series[str]
        return (
            s.str.normalize("NFC")
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )

    return _norm(c)
