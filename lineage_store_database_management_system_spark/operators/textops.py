"""Text-analysis operators for training-data pipelines (extension
layer — the reference has no scalar function surface at all,
SURVEY §2.6).

Every operator is a pure Catalyst projection (one scan, no UDF, no
shuffle) so it composes with filters/dedup in a single stage. Where a
DuckDB oracle must hash-match, expressions stick to engine-identical
constructs (replace-count trick, simple character classes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, occurrence_count, token_count_col
from ._util import plan_scoped_persist, spread

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


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1):
    duplicate-word fraction, top-word share, duplicate-bigram
    fraction. Heavily repetitive documents are low-quality training
    data; pipelines prune on thresholds over exactly these columns.

    One Catalyst projection per row (no explode, no shuffle): list
    lambdas over the split word array. The per-row cost of the
    top-share term is O(distinct x words); for pathological documents
    (100k+ words) use the explode+groupBy formulation instead — at
    corpus scale the projection wins because it keeps the whole
    operator inside one whole-stage-codegen'd scan."""
    from ..functions.text import bind_once

    def _stats(words):
        n = F.size(words)
        distinct = F.array_distinct(words)
        n_distinct = F.size(distinct)
        dup_frac = F.when(n == 0, 0.0).otherwise(1.0 - n_distinct / n)
        top_count = F.array_max(
            F.transform(distinct, lambda w: F.size(F.filter(words, lambda x: x == w)))
        )
        top_share = F.when(n == 0, 0.0).otherwise(
            F.coalesce(top_count, F.lit(0)) / n
        )
        return F.struct(
            n.alias("n"),
            F.round(dup_frac, 4).alias("dup"),
            F.round(top_share, 4).alias("top"),
        )

    def _bigram_dup(words):
        n = F.size(words)
        grams = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return bind_once(
            grams,
            lambda g: F.when(F.size(g) == 0, 0.0).otherwise(
                F.round(1.0 - F.size(F.array_distinct(g)) / F.size(g), 4)
            ),
        )

    words_col = F.split(F.trim(F.col(text_col)), r"\s+")
    s = bind_once(words_col, _stats)
    b = bind_once(words_col, _bigram_dup)
    return df.select(
        F.col(id_col),
        s["n"].alias("n_words"),
        s["dup"].alias("dup_word_frac"),
        s["top"].alias("top_word_share"),
        b.alias("dup_bigram_frac"),
    )


# PII patterns restricted to syntax RE2 (DuckDB) and java.util.regex
# (Spark) interpret identically: no lookarounds, no backrefs, explicit
# character classes. Order matters: scrub emails before phones so the
# digits inside an email aren't double-counted.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_scrub(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "text_scrubbed"
) -> DataFrame:
    """Redact PII spans (emails, SSNs, phone numbers, IPv4) with typed
    placeholder tokens, counting each class. Pure Catalyst regex
    chain — one projection, scales as a scan; the pattern list is the
    extension point for locale-specific rules."""
    out = F.col(text_col)
    counts = []
    total = F.lit(0)
    for name, pat, repl in PII_PATTERNS:
        # count on the PROGRESSIVELY scrubbed text, exactly what this
        # step's replace sees — digits inside an already-redacted
        # email can't double-count as a phone number
        c = F.regexp_count(out, F.lit(pat))
        counts.append(c.alias(f"n_{name}"))
        total = total + c
        out = F.regexp_replace(out, pat, repl)
    return df.select(
        F.col(id_col),
        *counts,
        total.alias("n_redactions"),
        out.alias(out_col),
    )


# Query parameters stripped by URL canonicalization: click/campaign
# trackers that never change the fetched content. Extension point for
# site-specific rules; keep the alternation RE2-safe (no lookaround)
# so a DuckDB/Trino oracle can replicate it verbatim.
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&#]*"
_SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def canonicalize_urls(
    df: DataFrame, url_col: str, out_col: str = "canonical_url"
) -> DataFrame:
    """Crawl-pipeline URL canonicalization: two fetches of the same
    resource must map to one key before dedup, or every tracking
    decoration defeats the exact-dup pass. Normalizes in a fixed,
    documented order: drop fragment, strip tracking params
    (TRACKING_PARAM_RE), collapse the leftover ``&&``/``?&`` debris,
    trim dangling ``?``/``&`` and trailing slashes, lowercase ONLY the
    scheme+authority (paths are case-sensitive per RFC 3986), and drop
    a leading ``www.``. Pure Catalyst regexp chain — one map-only
    projection, no shuffle; at 100 TB this fuses into the scan that
    feeds the digest groupBy (dedup_exact on the canonical key)."""
    u = F.col(url_col)
    u = F.regexp_replace(u, "#.*", "")
    u = F.regexp_replace(u, TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, "&{2,}", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, "/+$", "")
    head = F.regexp_extract(u, _SCHEME_HOST_RE, 0)
    rest = F.regexp_replace(u, _SCHEME_HOST_RE, "")
    u = F.concat(F.lower(head), rest)
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")
    return df.withColumn(out_col, u)


def chunk_fixed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 500,
    stride: int = 400,
) -> DataFrame:
    """Split documents into fixed-width character windows with overlap
    (``size - stride`` chars shared between neighbors) — the standard
    pre-tokenization step for embedding / training pipelines.

    One narrow projection + generator: chunk starts come from
    ``sequence(0, floor((len-1)/stride))`` and each window is a
    ``substring`` — no shuffle, no UDF, output rows stream out of the
    scan, so at 100 TB this is a map-only stage whose cost is the
    bytes read + written. Empty documents produce no chunks."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    starts = F.sequence(
        F.lit(0),
        F.floor((F.length(F.col(text_col)) - F.lit(1)) / F.lit(stride)).cast("int"),
    )
    chunks = F.transform(
        starts, lambda i: F.substring(F.col(text_col), i * stride + 1, size)
    )
    return (
        df.where(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("chunk"),
            F.length("chunk").alias("chunk_len"),
        )
    )


def chunk_content_defined(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    boundary_prefix: str = "0",
    include_text: bool = False,
) -> DataFrame:
    """Content-defined chunking (the CDC/Rabin idea at word
    granularity): a chunk boundary opens at token position s whenever
    the md5 of the k-token window starting at s begins with
    ``boundary_prefix`` (expected chunk length 16^len(prefix)
    tokens). Because boundaries depend only on LOCAL content, an
    insertion early in a document shifts at most one chunk — every
    later chunk re-aligns and deduplicates against the unedited copy,
    which fixed-width chunking (:func:`chunk_fixed`) structurally
    cannot do. This is the chunk-granularity dedup primitive for
    partially-overlapping documents (backup dedup's FastCDC, applied
    to corpus text).

    Scale shape: map-only — boundaries, chunk assembly, and
    fingerprints all happen inside per-row array expressions (hash
    computed INSIDE the transform over the bound token array, the
    O(T·k) discipline from :func:`remove_repeated_spans`); one
    posexplode streams chunks out of the scan. No shuffle, no UDF.
    md5 (not xxhash64) so the boundary decision is engine-portable.

    Returns (id, chunk_id 1-based, chunk_md5, n_tokens); with
    ``include_text`` also the ``chunk`` text itself (for the dedup
    transform — off by default so the fingerprint table never
    carries corpus bytes)."""
    toks = F.col("_toks")
    t_len = F.size(toks)
    bounds = F.filter(
        F.when(t_len >= k + 1, F.sequence(F.lit(2), t_len - (k - 1)))
        .otherwise(F.array().cast("array<int>")),
        lambda s: F.substring(
            F.md5(F.concat_ws(" ", F.slice(toks, s, k))),
            1,
            len(boundary_prefix),
        )
        == boundary_prefix,
    )
    starts = F.concat(F.array(F.lit(1)), F.col("_bounds"))
    ends = F.concat(F.col("_bounds"), F.array(t_len + 1))
    chunks = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            F.concat_ws(" ", F.slice(toks, s, e - s)).alias("c"),
            (e - s).cast("long").alias("n"),
        ),
    )
    return (
        df.select(
            F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("_toks")
        )
        .select(F.col(id_col), toks.alias("_toks"), bounds.alias("_bounds"))
        .select(F.col(id_col), F.posexplode(chunks).alias("_i", "_ch"))
        .select(
            F.col(id_col),
            (F.col("_i") + 1).cast("long").alias("chunk_id"),
            F.md5(F.col("_ch.c")).alias("chunk_md5"),
            F.col("_ch.n").alias("n_tokens"),
            *([F.col("_ch.c").alias("chunk")] if include_text else []),
        )
    )


def chunk_dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    boundary_prefix: str = "0",
) -> DataFrame:
    """Chunk-granularity corpus dedup (Lee et al.'s "deduplicating
    training data", at CDC-aligned chunks): every chunk whose exact
    text already occurred earlier in the corpus — FIRST occurrence in
    (doc, chunk position) order wins — is removed, and each document
    is reassembled from its surviving chunks. Because the chunks are
    content-defined (:func:`chunk_content_defined`), a license block
    pasted mid-document deduplicates even when every copy has
    different surroundings — boundaries re-align on content, so the
    copies chunk identically.

    Scale shape: chunking is map-only; the winner election is one
    digest-keyed aggregate (min (doc, pos) struct — partial map-side,
    the dedup_keep_best shape); survivors join back on the digest and
    reassembly is a per-doc sorted fold. The digest shuffle carries
    (md5, doc, pos), never chunk text; only the survivor join moves
    text, once.

    Returns (id, n_kept, text) — text '' when every chunk was a
    repeat."""
    ch = chunk_content_defined(
        df, id_col, text_col, k=k, boundary_prefix=boundary_prefix,
        include_text=True,
    )
    winners = ch.groupBy("chunk_md5").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("chunk_id").alias("p"))).alias(
            "_w"
        )
    )
    kept = ch.join(winners, on="chunk_md5").where(
        (F.col(id_col) == F.col("_w.i")) & (F.col("chunk_id") == F.col("_w.p"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("chunk_id"), F.col("chunk")))
                ),
                lambda s: s["chunk"],
            ),
        ).alias("_text"),
    )
    return (
        df.select(F.col(id_col))
        .join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("_text", F.lit("")).alias(text_col),
        )
    )


def remove_boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 3
) -> DataFrame:
    """C4/RefinedWeb-style line-level boilerplate removal: any line
    appearing in >= ``min_docs`` DISTINCT documents (nav bars, ToS
    footers, cookie banners) is stripped from every document.

    Scale shape: lines explode once; the corpus-wide frequency count
    groups on the line's 64-bit xxhash (8-byte shuffle keys, never
    raw text — collision odds are ~n^2/2^64); the boilerplate set
    anti-joins back on the same hash; documents reassemble with an
    order-preserving in-group sort (array_sort over (pos, line)
    structs — no global sort). Documents whose every line is
    boilerplate come back as empty strings, not dropped rows."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_h", F.xxhash64("_line"))
    boiler = (
        lines.groupBy("_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h")
    )
    kept = lines.join(boiler, on="_h", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("_cleaned")
    )
    return (
        df.select(id_col)
        .join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col), F.coalesce(F.col("_cleaned"), F.lit("")).alias(text_col)
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level (cross-document) dedup: remove every token
    covered by a ``k``-token window whose exact text appears in
    >= ``min_docs`` DISTINCT documents — the hash-bucketed flavor of
    suffix-array training-data dedup (the "deduplicating training
    data" pipeline shape: repeated ~50-token spans are memorization
    fuel; here ``k`` is a knob). Finer-grained than
    :func:`remove_boilerplate_lines` (line-level) and
    :mod:`..operators.dedup` (document-level): it catches a licence
    paragraph pasted mid-document with different surroundings.

    Scale shape — never all-pairs:

    1. every document emits its overlapping k-token windows ONCE
       (``sequence`` + ``slice``, one projection);
    2. the corpus-wide frequency count groups on the window's 64-bit
       ``xxhash64`` — 8-byte shuffle keys, never window text
       (collision odds ~n_windows^2/2^64);
    3. duplicated window hashes join back (hash equi-join, work
       proportional to duplicated windows, not documents^2);
    4. each document drops tokens covered by any duplicated window
       and reassembles order-preserving, entirely in Catalyst
       (``filter`` + ``exists`` over the per-doc duplicated-start
       list — O(tokens x dup-spans) per doc, dup-spans is small on
       real corpora). Overlapping duplicated windows merge naturally:
       coverage is by token membership, so span boundaries need no
       interval arithmetic.

    Tokens are single-space-split; documents with fewer than ``k``
    tokens emit no windows and pass through unchanged."""
    # Hash the windows INSIDE the array, before exploding: exploding
    # (start, full-token-array) rows and slicing afterwards would
    # physically replicate the whole T-element array into each of the
    # T-k+1 window rows — O(T^2) bytes per document through the
    # Generate stage (invisible at test sizes because it pipelines,
    # ruinous for a 100k-token document). transform+slice keeps it
    # O(T·k): one (start, hash64) struct per window.
    #
    # The token array MUST be bound to a column in its own projection
    # first: embedding split() directly in the lambda re-evaluates the
    # whole split per array element (measured 40.5s -> 0.9s for 8x25k
    # tokens) — the same O(T^2), as CPU instead of bytes.
    toks = F.col("_toks")
    starts_arr = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    win_structs = F.transform(
        starts_arr,
        lambda s: F.struct(
            s.alias("s"),
            F.xxhash64(F.concat_ws(" ", F.slice(toks, s, k))).alias("wh"),
        ),
    )
    wins = (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
        .select(F.col(id_col), F.explode(win_structs).alias("_w"))
        .select(
            F.col(id_col),
            F.col("_w.s").alias("_s"),
            F.col("_w.wh").alias("_wh"),
        )
    )
    dup = (
        wins.groupBy("_wh")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_wh")
    )
    dup_starts = (
        wins.join(dup, on="_wh")
        .groupBy(id_col)
        .agg(F.collect_list("_s").alias("_dup_starts"))
    )
    idx_toks = F.transform(
        F.split(F.col(text_col), " "),
        lambda t, i: F.struct(t.alias("t"), (i + 1).alias("i")),
    )
    covered = lambda st: F.exists(  # noqa: E731 - local plan fragment
        F.col("_dup_starts"),
        lambda s: (s <= st["i"]) & (st["i"] < s + k),
    )
    return (
        df.join(dup_starts, on=id_col, how="left")
        .withColumn(
            "_dup_starts",
            F.coalesce(F.col("_dup_starts"), F.array().cast("array<int>")),
        )
        .select(
            F.col(id_col),
            F.concat_ws(
                " ",
                F.transform(F.filter(idx_toks, lambda st: ~covered(st)), lambda st: st["t"]),
            ).alias(text_col),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 5,
    min_token_len: int = 4,
) -> DataFrame:
    """Top-k terms per group (e.g. per source) by TF-IDF: term
    frequency within the group x ln(N_docs / doc_frequency). Scores
    round to 4 decimals BEFORE ranking so the ordering is stable
    across engines (ln differs in the last ulp between libm
    implementations).

    Shape: one explode -> two hash aggregates (tf by (group, term),
    df by term) -> broadcast-able join (distinct-term table is small
    relative to the corpus) -> per-group WindowGroupLimit top-k. Every
    shuffle key is the term or the group — no all-pairs stage."""
    from pyspark.sql import Window

    toks = (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
        )
        .where(F.length("term") >= min_token_len)
    )
    # Tokenize ONCE (r14 optimization): tf and df both derive from the
    # per-(doc, term) counts, so fold to that narrow frame first and
    # persist it — BOUNDED plan-scoped (r15): one cached frame per
    # operator slot, the previous invocation's evicted, so repeated
    # ad-hoc calls no longer accumulate cache entries for the session
    # lifetime (see _util.plan_scoped_persist).
    per_doc = plan_scoped_persist(
        toks.groupBy(id_col, group_col, "term").agg(
            F.count(F.lit(1)).alias("_c")
        ),
        "textops.tfidf.per_doc",
    )
    tf = per_doc.groupBy(group_col, "term").agg(F.sum("_c").alias("tf"))
    dfreq = (
        per_doc.select(F.col(id_col), F.col("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(group_col),
            F.col("term"),
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= k)
        .select(group_col, "term", "tfidf")
    )


def gopher_quality_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The published Gopher / MassiveText repetition-free quality
    rules (Rae et al. 2021, appendix A) as per-document flags — the
    standard pre-training filter set, distinct from the composite
    ``quality_score``: each rule is a named boolean so pipelines can
    relax/tighten individual thresholds and audit WHY a document was
    dropped. Every term is a portable SQL expression (one projection,
    no shuffle, runs over 100 TB map-only):

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - >= 80% of words contain an alphabetic character
    - '#' symbol-to-word ratio < 0.1
    - >= 2 distinct English stop words present
    """
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(words))
    chars_no_space = F.length(F.replace(t, F.lit(" "), F.lit("")))
    mean_wl = chars_no_space / F.greatest(n_words, F.lit(1)).cast("double")
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_ratio = alpha_words / F.greatest(n_words, F.lit(1)).cast("double")
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    symbol_ratio = hashes / F.greatest(n_words, F.lit(1)).cast("double")
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(
        F.when(padded.contains(f" {w} "), 1).otherwise(0)
        for w in ["the", "be", "to", "of", "and", "that", "have", "with"]
    )
    ok_words = (n_words >= 50) & (n_words <= 100_000)
    ok_mean = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    ok_alpha = alpha_ratio >= 0.8
    ok_symbol = symbol_ratio < 0.1
    ok_stop = stop_hits >= 2
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 3).alias("mean_word_len"),
        F.round(alpha_ratio, 3).alias("alpha_word_ratio"),
        stop_hits.cast("long").alias("stop_word_hits"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_words"),
        ok_symbol.alias("ok_symbol_ratio"),
        ok_stop.alias("ok_stop_words"),
        (ok_words & ok_mean & ok_alpha & ok_symbol & ok_stop).alias("passes_gopher"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a bag-of-words query
    (Robertson & Zaragoza 2009; the reference has no text-retrieval
    surface at all — extension per SURVEY §2.6). Scores round BEFORE
    ranking (see tfidf_top_terms: ln differs in the last ulp between
    libm builds), tie-break on id.

    Scale shape: ONE tokenize/explode pass feeds both the per-doc
    length (all tokens) and the per-(doc, term) tf (filtered to the
    query terms — a tiny IN-list that prunes the aggregate input
    map-side). df/N/avgdl are scalar-or-tiny frames broadcast onto the
    scored docs; the only wide shuffle keys are doc_id and the query
    terms themselves. No all-pairs stage, no UDF; final top-k is a
    single TakeOrdered, not a full sort."""
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        # Empty query: no term can match, so the result is the empty
        # (id, bm25) frame. Guarded here because the _tf_* aggregate
        # below would otherwise build explode(array()) of array<null>
        # whose field access fails analysis (ADVICE r14).
        return df.select(
            F.col(id_col), F.lit(None).cast("double").alias("bm25")
        ).limit(0)
    toks = spread(df).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.length("term") > 0)
    # ONE tokenize pass for real (r14 optimization): the previous tree
    # had doclen, tf, dfreq and avgdl as separate branches over
    # ``toks`` — Spark shares no subtrees across branches, so the
    # corpus tokenized 4x. Fold dl + per-query-term tf into a single
    # hash aggregate (one row per doc, |terms| tf columns — the query
    # term list is tiny by contract), persist that NARROW frame, and
    # derive tf rows / df / avgdl from it. Same values to the bit:
    # dl counts all tokens, tf_t counts term occurrences, df counts
    # docs with tf_t > 0, avgdl averages over tokenized docs.
    docagg = plan_scoped_persist(
        toks.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(F.when(F.col("term") == t, 1)).alias(f"_tf_{i}")
                for i, t in enumerate(terms)
            ],
        ),
        # Bounded plan-scoped persist (r15, replacing the bare
        # session-lifetime .persist()): the avgdl, tf and dfreq
        # branches below all read this one narrow frame instead of
        # re-tokenizing; each new invocation evicts the previous
        # one's cache. At true corpus scale prefer the durable index
        # (textsearch.bm25_topk_from_index); this scan path is the
        # index-less fallback and its cache is one slim row per
        # tokenized doc, spilling to disk under pressure.
        "textops.bm25.docagg",
    )
    corpus = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
    )
    avgdl = docagg.agg(F.avg("dl").alias("avgdl"))
    tf = (
        docagg.select(
            F.col(id_col),
            F.col("dl"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"_tf_{i}").alias("tf"),
                        )
                        for i, t in enumerate(terms)
                    ]
                )
            ).alias("_qt"),
        )
        .select(id_col, "dl", "_qt.term", "_qt.tf")
        .where(F.col("tf") > 0)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        dfreq.crossJoin(F.broadcast(corpus))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), on="term")
        .crossJoin(F.broadcast(avgdl))
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), round_to).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    checkpoint_every: int = 8,
):
    """Train a byte-pair-encoding merge list on a corpus (Sennrich et
    al., ACL 2016) — the iterated form of the single gated round
    (`ds_bpe_merge_round`). Returns ``(merges, vocab)``: the ordered
    list of learned ``(left, right)`` merges and the final vocabulary
    DataFrame ``(syms array<string>, freq)``.

    The 100 TB loop shape: ONE corpus scan folds to the distinct
    vocabulary with frequencies (work past this point is ∝ |vocab|,
    independent of corpus size); each round is one map-side-combinable
    pair count, a bounded argmax collect (one row), and a vectorized
    merge kernel over the vocab (Arrow-batched pandas_udf — adjacent-
    pair folding is genuinely non-relational). Vocab localCheckpoints
    every ``checkpoint_every`` rounds to truncate plan lineage, the
    same discipline as the CC loops. Ties break (count desc, left asc,
    right asc) so training is deterministic."""
    vocab = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
        )
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.expr("split(w, '')").alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for rnd in range(n_merges):
        pairs = (
            # single-symbol words contribute no pairs (and sequence()
            # runs BACKWARDS when size-1 < 1 — must not reach transform)
            vocab.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS l, syms[i] AS r))"
                    )
                ).alias("lr"),
                "freq",
            )
            .groupBy("lr.l", "lr.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        left, right = pairs[0]["l"], pairs[0]["r"]
        merges.append((left, right))

        @F.pandas_udf("array<string>")
        def _merge(syms: pd.Series) -> pd.Series:
            out = []
            for s in syms:
                s = list(s)
                res, i, n = [], 0, len(s)
                while i < n:
                    if i + 1 < n and s[i] == left and s[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            return pd.Series(out)

        vocab = vocab.select(_merge(F.col("syms")).alias("syms"), "freq")
        if (rnd + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """APPLY a learned BPE merge list to a corpus — the distributed
    other half of :func:`bpe_train` (a tokenizer you can train but not
    run is half a tokenizer). Output: (id, n_tokens) — the statistic a
    pretraining pipeline budgets by.

    One Arrow-batched map-only pass, no shuffle: the merge list (tiny)
    ships in the closure; each batch folds its words to a per-batch
    memo dict first (the same vocab-folding trick that makes training
    ∝ |vocab| — a natural-language batch re-uses words heavily), then
    applies the merges in LEARNED ORDER with the greedy left-to-right
    non-overlapping scan that IS BPE apply semantics (equivalently:
    one string replace() per merge in placeholder space — how the
    DuckDB oracle twin states it). Word normalization matches
    training: lower/trim, whitespace split, empties dropped."""
    import re as _re

    ms = [(str(l), str(r)) for l, r in merges]

    def _word_ntok(w: str, cache: dict) -> int:
        n = cache.get(w)
        if n is not None:
            return n
        s = list(w)
        for left, right in ms:
            res, i, ln = [], 0, len(s)
            while i < ln:
                if i + 1 < ln and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            s = res
        cache[w] = len(s)
        return cache[w]

    @F.pandas_udf("long")
    def _ntok(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            ws = [w for w in _re.split(r"\s+", (t or "").lower().strip()) if w]
            out.append(sum(_word_ntok(w, cache) for w in ws))
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), _ntok(F.col(text_col)).alias("n_tokens"))


def charlm_xent(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Language-model quality scoring, CCNet shape (Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data", LREC 2020): score every document by its
    cross-entropy under a model trained on the corpus itself —
    gibberish / boilerplate / non-language documents surface as high
    xent outliers. The production filter uses a KenLM n-gram model;
    with no LM runtime in this container the model here is a
    char-BIGRAM LM with add-one smoothing — the same statistic family
    (mean -log2 P(c_i | c_{i-1})), fully self-contained and exactly
    SQL-replicable.

    Shapes for 100 TB: training is ONE map-side-combinable bigram
    count over the corpus; the model (bigram + context count tables,
    ~|charset|^2 rows) broadcasts onto the scoring scan, so scoring
    is map-only — no shuffle of document data at all. Returns
    (id, n_bigrams, xent); unseen bigrams back off to the smoothed
    floor 1/(ctx_count + V)."""
    s = F.lower(F.trim(F.col(text_col)))
    bg = (
        df.select(F.col(id_col), s.alias("_s"))
        .where(F.length("_s") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, length(_s) - 1), "
                    "i -> substring(_s, i, 2))"
                )
            ).alias("b"),
        )
    )
    cb = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    cx = cb.groupBy(F.substring("b", 1, 1).alias("a")).agg(
        F.sum("c").alias("cc")
    )
    v = cb.select(
        F.countDistinct(F.substring("b", 2, 1)).alias("v")
    )
    logp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
        / (F.coalesce(F.col("cc"), F.lit(0)) + F.col("v"))
    ) / F.log(F.lit(2.0))
    return (
        bg.join(F.broadcast(cb), on="b", how="left")
        .join(
            F.broadcast(cx),
            F.substring("b", 1, 1) == F.col("a"),
            "left",
        )
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg(logp), round_to).alias("xent"),
        )
    )


def source_drift_tv(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Pairwise total-variation distance between the unigram
    distributions of each group (source/shard/snapshot) — the corpus
    drift monitor: TV = 0.5 * sum_t |p_a(t) - p_b(t)| in [0, 1],
    0 = identical mix, 1 = disjoint vocabularies. Chosen over
    KL/Jensen-Shannon deliberately: TV needs no logarithms, so with
    integer counts the numerator sum_t |c_a(t)*N_b - c_b(t)*N_a| is
    EXACT int64 arithmetic — order-independent, engine-independent,
    no libm ulp drift, no smoothing constant.

    One |tokens| shuffle builds (group, term, count); the pair stage
    needs only the INNER join on term (terms private to one side
    contribute their whole count, recovered as N - sum(shared) in
    closed form), so the heavy full-outer-per-pair is never built.
    Per-pair work is O(shared vocabulary); skewed common terms skew
    the join like any hot key — salt via operators/skew at extreme
    group counts.

    Returns (group_a, group_b, tv_e6 bigint) — integer millionths
    via the boundary-proof floor(x*1e6 + 0.5) comparator.

    Bounds: each |c_a*N_b| term needs c_max * N < 2^63 — holds to
    ~1e9 occurrences of one term against ~1e9-token groups; beyond
    that ANSI mode fails loudly (overflow error, never silent
    wraparound). Shard by month/source first at that scale."""
    tok = df.select(
        F.col(group_col).alias("_g"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("_t"),
    )
    tc = tok.groupBy("_g", "_t").agg(F.count(F.lit(1)).alias("_c"))
    tot = tc.groupBy("_g").agg(F.sum("_c").alias("_n"))
    a = tc.select(
        F.col("_g").alias("_ga"), F.col("_t").alias("_t"), F.col("_c").alias("_ca")
    )
    b = tc.select(
        F.col("_g").alias("_gb"), F.col("_t").alias("_t"), F.col("_c").alias("_cb")
    )
    ta = tot.select(F.col("_g").alias("_ga"), F.col("_n").alias("_na"))
    tb = tot.select(F.col("_g").alias("_gb"), F.col("_n").alias("_nb"))
    joined = (
        a.join(b, on="_t")
        .where(F.col("_ga") < F.col("_gb"))
        .join(F.broadcast(ta), on="_ga")
        .join(F.broadcast(tb), on="_gb")
        .groupBy("_ga", "_gb")
        .agg(
            F.sum(
                F.abs(F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na"))
            ).alias("_i1"),
            F.sum("_ca").alias("_sa"),
            F.sum("_cb").alias("_sb"),
        )
    )
    pairs = (
        ta.join(F.broadcast(tb), F.col("_ga") < F.col("_gb"))
        .join(joined, on=["_ga", "_gb"], how="left")
        .select(
            "_ga",
            "_gb",
            "_na",
            "_nb",
            F.coalesce("_i1", F.lit(0)).alias("_i1"),
            F.coalesce("_sa", F.lit(0)).alias("_sa"),
            F.coalesce("_sb", F.lit(0)).alias("_sb"),
        )
    )
    s = (
        F.col("_i1")
        + (F.col("_na") - F.col("_sa")) * F.col("_nb")
        + (F.col("_nb") - F.col("_sb")) * F.col("_na")
    )
    tv = s / (F.lit(2.0) * F.col("_na") * F.col("_nb"))
    return pairs.select(
        F.col("_ga").alias("group_a"),
        F.col("_gb").alias("group_b"),
        F.floor(tv * 1000000 + F.lit(0.5)).cast("long").alias("tv_e6"),
    )


def dsir_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-shaped importance weights over hashed unigram features
    (the public "Data Selection for Language Models via Importance
    Resampling" method, Xie et al. 2023): score every RAW document by
    how target-like its hashed-token distribution is —
    ``weight = Σ_b count_b · ln(p̂_target(b) / p̂_raw(b))`` with
    add-one smoothing over ``n_buckets`` hashed buckets. ``target``
    is a boolean Column marking the in-domain documents that define
    the target distribution; raw (non-target) documents get scored.

    Plan shape (100 TB honest): one token explode (map-only), ONE
    (bucket) aggregate for the model — model state is O(n_buckets)
    rows regardless of corpus size — then the tiny log-ratio table
    broadcast onto a per-(doc, bucket) count aggregate. Work ∝ corpus
    tokens; no per-doc Python, no driver collect (totals ride a
    broadcast 1-row cross join). Hashing is engine-portable
    (md5-prefix → bucket), so the whole statistic has an exact SQL
    twin. Returns (id_col, n_tokens, weight) for raw docs, weight
    rounded to 4 decimals (absorbs summation-order noise).

    The reference has no corpus operators at all; this is part of the
    training-data-pipeline extension layer (SURVEY §2.6)."""
    B = float(n_buckets)
    tok = docs.select(
        F.col(id_col),
        target.alias("_t"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_w"),
    ).where(F.col("_w") != "")
    bkt = tok.select(
        id_col,
        "_t",
        (
            F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10).cast("long")
            % F.lit(n_buckets)
        ).alias("_b"),
    )
    model = bkt.groupBy("_b").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_ct"),
        F.sum(F.when(~F.col("_t"), 1).otherwise(0)).alias("_cr"),
    )
    tot = model.agg(F.sum("_ct").alias("_tt"), F.sum("_cr").alias("_tr"))
    lw = model.crossJoin(F.broadcast(tot)).select(
        "_b",
        F.log(
            ((F.col("_ct") + F.lit(1.0)) * (F.col("_tr") + F.lit(B)))
            / ((F.col("_tt") + F.lit(B)) * (F.col("_cr") + F.lit(1.0)))
        ).alias("_lw"),
    )
    docb = (
        bkt.where(~F.col("_t"))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        docb.join(F.broadcast(lw), on="_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("_c") * F.col("_lw")), 4).alias("weight"),
        )
    )


def dsir_select(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    k: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Top-k raw documents by DSIR importance weight (deterministic
    rank variant of the paper's Gumbel resampling — reproducible and
    oracle-checkable; plug in Gumbel noise keyed on a seed column for
    the sampled variant). Ordering is on the ROUNDED weight with id
    tiebreak, so the selected set is engine-stable."""
    w = dsir_weights(docs, id_col, text_col, target, n_buckets)
    return w.orderBy(F.col("weight").desc(), F.col(id_col)).limit(k)
