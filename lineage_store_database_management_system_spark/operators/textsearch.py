"""Exact substring search at corpus scale via a trigram inverted
index — grep over 100 TB without scanning 100 TB.

The reference has no text search at all (its select is a
single-column key lookup, reference query.py:34); this extends the
engine along the LLM-data-pipeline axis: "which documents contain
this exact string" is the workhorse query behind contamination
forensics, PII incident response, and template/boilerplate hunting,
and a naive ``WHERE contains(text, p)`` reads every byte of the
corpus every time.

Index shape (the PostgreSQL pg_trgm / Google Code Search design,
re-expressed as DataFrames):

- :func:`trigram_postings` — one row per DISTINCT (trigram, doc).
  Built with ``sequence + transform + explode`` (pure Catalyst, no
  Python in the row path); distinct-within-doc bounds postings at
  O(doc_len) and makes counts doc-frequencies. Persist it once,
  bucketed/partitioned by gram, and maintenance is per-commit
  incremental (new docs only — trigram sets of existing docs never
  change).
- :func:`trigram_stats` — (gram, doc-frequency): the tiny statistics
  table that drives query planning.

Query (:func:`substring_search`): every document containing the
pattern contains ALL of the pattern's trigrams, so the posting-list
intersection of ANY subset of them is a superset of the answer —
false positives possible, false negatives impossible. The planner
picks the ``n_probe_grams`` RAREST trigrams (smallest doc-frequency,
looked up from the stats table with an IN-list — one tiny job),
AND-intersects just those posting lists (groupBy(doc) HAVING
count = n, map-side combinable), and verifies ``contains`` only on
the candidates after a semi-join back to the corpus. Work scales
with the rarest posting list, not the corpus; the verify scan reads
only candidate documents' text.

Patterns shorter than a trigram can't use the index; the fallback is
the honest full verify scan (flagged in the returned plan info).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "trigram_postings",
    "trigram_stats",
    "pattern_grams",
    "substring_search",
]


def _grams_col(text_col: str):
    """array<string> of all trigrams of ``text_col`` (JVM-side). The
    length guard matters: ``sequence(1, 0)`` is a DESCENDING [1, 0]
    in Spark, so short/empty docs would otherwise emit partial
    grams."""
    return F.expr(
        f"CASE WHEN length({text_col}) < 3 THEN array()"
        f" ELSE transform(sequence(1, length({text_col}) - 2),"
        f" i -> substr({text_col}, i, 3)) END"
    )


def trigram_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, id) posting rows, one per DISTINCT trigram per document.
    ``array_distinct`` runs BEFORE the explode so the shuffle-free
    per-doc dedup bounds output at O(unique grams per doc)."""
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_grams_col(text_col))).alias("gram"),
    )


def trigram_stats(postings: DataFrame) -> DataFrame:
    """(gram, df) doc-frequency table — the planner's statistics.
    Output cardinality is the trigram vocabulary (bounded by charset^3
    in the worst case, tiny in practice), so it broadcasts."""
    return postings.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))


def pattern_grams(pattern: str) -> list[str]:
    """Distinct trigrams of the query pattern (driver-side; patterns
    are short)."""
    seen: list[str] = []
    for i in range(max(len(pattern) - 2, 0)):
        g = pattern[i : i + 3]
        if g not in seen:
            seen.append(g)
    return seen


def substring_search(
    docs: DataFrame,
    pattern: str,
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
    n_probe_grams: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact ``contains(text, pattern)`` via the trigram index.

    Returns ``(result_df, info)``: ``result_df`` is the matching
    documents (all original columns, exact — candidates are verified),
    ``info`` records the plan (``strategy`` 'index' or 'scan',
    ``probe_grams``). With no index supplied, one is built on the fly
    (still the right plan shape — the build is one pass; callers at
    scale persist it once and pass it in)."""
    if len(pattern) < 3:
        return (
            docs.where(F.contains(F.col(text_col), F.lit(pattern))),
            {"strategy": "scan", "probe_grams": []},
        )
    if postings is None:
        postings = trigram_postings(docs, id_col, text_col)
    grams = pattern_grams(pattern)
    if stats is not None and len(grams) > n_probe_grams:
        df_rows = stats.where(F.col("gram").isin(grams)).collect()
        known = {r["gram"]: r["df"] for r in df_rows}
        # a pattern gram absent from the stats table has df 0: no
        # document can match — short-circuit without touching data
        if len(known) < len(grams):
            empty = docs.where(F.lit(False))
            return empty, {
                "strategy": "index",
                "probe_grams": [g for g in grams if g not in known][:n_probe_grams],
            }
        grams = sorted(grams, key=lambda g: (known[g], g))[:n_probe_grams]
    else:
        grams = grams[:n_probe_grams]
    hits = (
        postings.where(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("_ng"))
        .where(F.col("_ng") == len(grams))
        .select(id_col)
    )
    verified = docs.join(hits, on=id_col, how="left_semi").where(
        F.contains(F.col(text_col), F.lit(pattern))
    )
    return verified, {"strategy": "index", "probe_grams": grams}
