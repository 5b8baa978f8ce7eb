"""Text-analysis operators for training-data pipelines (extension
layer — the reference has no scalar function surface at all,
SURVEY §2.6).

Every operator is a pure Catalyst projection (one scan, no UDF, no
shuffle) so it composes with filters/dedup in a single stage. Where a
DuckDB oracle must hash-match, expressions stick to engine-identical
constructs (replace-count trick, simple character classes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, occurrence_count, token_count_col
from ._util import spread

# Tiny per-language marker lexicons for the n-gram/stopword heuristic
# language ID. Counts of ' word ' occurrences are engine-portable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}
LANG_ORDER = ["en", "de", "fr", "es"]


def lang_score(text: Column, lang: str) -> Column:
    """Marker-word hits per language (padded so boundary words count)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    s = F.lit(0.0)
    for w in LANG_MARKERS[lang]:
        s = s + occurrence_count(padded, f" {w} ")
    return s


def lang_id(df: DataFrame, text_col: str, out_col: str = "lang_guess") -> DataFrame:
    """Heuristic language ID: argmax of marker-word counts, 'und'
    (undetermined) when all scores are zero. Ties resolve in
    LANG_ORDER — fully deterministic and SQL-replicable."""
    t = F.lower(F.col(text_col))
    scores = {lg: lang_score(t, lg) for lg in LANG_ORDER}
    best = F.greatest(*[scores[lg] for lg in LANG_ORDER])
    expr = F.lit("und")
    for lg in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (scores[lg] == best), F.lit(lg)).otherwise(expr)
    return df.withColumn(out_col, expr)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats: chars, tokens, avg token length, digit /
    space / non-alphanumeric character counts."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_digits = n_chars - F.length(F.regexp_replace(t, "[0-9]", ""))
    n_spaces = n_chars - F.length(F.replace(t, F.lit(" "), F.lit("")))
    n_other = n_chars - F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("chars_per_token"),
        n_digits.alias("n_digits"),
        n_spaces.alias("n_spaces"),
        n_other.alias("n_punct"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite [0,1] quality score: length band + reasonable token
    length + low digit/symbol noise + stopword presence. The exact
    formula is arbitrary but deterministic; its value is that every
    term is a portable SQL expression, so the score is oracle-checkable
    and cheap enough to run over 100 TB in one projection."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    n_tokens = token_count_col(t).cast("double")
    avg_tok = n_chars / F.greatest(n_tokens, F.lit(1.0))
    digit_ratio = (n_chars - F.length(F.regexp_replace(t, "[0-9]", ""))) / F.greatest(
        n_chars, F.lit(1.0)
    )
    symbol_ratio = (
        n_chars - F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", ""))
    ) / F.greatest(n_chars, F.lit(1.0))
    stop_hits = lang_score(F.lower(t), "en")
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.5)
    tok_ok = F.when((avg_tok >= 3.0) & (avg_tok <= 12.0), 1.0).otherwise(0.5)
    clean = 1.0 - F.least(digit_ratio * 2 + symbol_ratio * 2, F.lit(1.0))
    stopw = F.when(stop_hits / F.greatest(n_tokens, F.lit(1.0)) >= 0.01, 1.0).otherwise(
        0.5
    )
    score = F.round((len_ok + tok_ok + clean + stopw) / 4.0, 4)
    return df.select(F.col(id_col), score.alias("quality"))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical document fingerprint: md5 of the normalized text
    (exact-dup key, portable to any engine) plus a 64-bit xxhash for
    cheap joins."""
    norm = normalized_text(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


def winnowing_fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 7, window: int = 4
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD '03): k-gram rolling hashes,
    keep the min hash of every sliding window -> a sparse, alignment-
    robust fingerprint set. Catalyst-only: char k-grams -> xxhash64 ->
    per-window array_min -> distinct. Intermediate arrays are bound to
    lambda variables via :func:`functions.text.bind_once` — naively
    nesting ``transform(wins, i -> slice(grams, i))`` re-evaluates the
    gram array (and the regex normalization under it) per window,
    O(L^2 x regex) per row (102s for 500 docs)."""
    from ..functions.text import bind_once as _once

    df = spread(df)

    def _fingerprints(t):
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
            lambda i: F.xxhash64(F.substring(t, i, k)),
        )
        return _once(
            grams,
            lambda g: F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(g) - (window - 1), F.lit(1))
                    ),
                    lambda i: F.array_min(F.slice(g, i, window)),
                )
            ),
        )

    mins = _once(normalized_text(F.col(text_col)), _fingerprints)
    return df.select(F.col(id_col), F.sort_array(mins).alias("fingerprints"))
