"""Data-quality expectations with quarantine — validation that
doesn't abort the pipeline.

The table-level CHECK/UNIQUE constraints (lineage.py) are the ACID
guardrail: a violating write aborts before publishing. That is the
wrong tool for a 100 TB ingest where 0.001% of rows are malformed —
nobody re-runs a day of compute because three rows had a negative
price. The expectations layer (the Delta Live Tables shape) splits
instead: rows that pass every rule flow on, violating rows are
tagged with WHICH rules they broke and land in a quarantine area for
forensics, and per-rule violation counts come back as metrics.

Semantics match the CHECK layer exactly (ANSI: a row passes when the
rule evaluates TRUE **or UNKNOWN/NULL**; only an explicit FALSE
violates), so promoting a battle-tested expectation into a hard
constraint never changes which rows it admits.

Scale shape: the `_violations` array is ONE Catalyst projection
(filter + array building, no Python, no shuffle); the good/bad split
is two pushed-down filters over it; metrics are ONE aggregate. With
deterministic rules the split is consistent across the re-evaluations
(the same caveat as every nondeterministic-predicate DML — see
catalog.py's persist() note — applies if a rule calls rand())."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ExpectationViolation",
    "tag_violations",
    "apply_expectations",
    "expectation_metrics",
    "ingest_with_expectations",
]

VIOLATIONS_COL = "_violations"


class ExpectationViolation(ValueError):
    """Raised in mode='fail' when any row violates any rule."""


def _rule_cols(rules: dict) -> list:
    out = []
    for name, expr in rules.items():
        cond = F.expr(expr) if isinstance(expr, str) else expr
        # ANSI pass = TRUE or UNKNOWN; violation = explicit FALSE
        out.append((name, ~F.coalesce(cond, F.lit(True))))
    return out


def tag_violations(df: DataFrame, rules: dict) -> DataFrame:
    """Add ``_violations: array<string>`` — the names of the rules
    each row violates (empty array = clean row). One projection."""
    viols = [
        F.when(bad, F.lit(name)) for name, bad in _rule_cols(rules)
    ]
    arr = F.array_compact(F.array(*viols)) if viols else F.array().cast("array<string>")
    return df.withColumn(VIOLATIONS_COL, arr)


def expectation_metrics(df: DataFrame, rules: dict) -> dict:
    """Per-rule violation counts + total rows, in ONE aggregate job.
    Returns ``{"rows": n, "violations": {rule: n_bad, ...}}``."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    any_bad = F.lit(False)
    for name, bad in _rule_cols(rules):
        aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"_v_{name}"))
        any_bad = any_bad | bad
    aggs.append(F.sum(F.when(any_bad, 1).otherwise(0)).alias("_rows_bad"))
    row = df.agg(*aggs).collect()[0].asDict()
    return {
        "rows": int(row["_rows"]),
        "rows_bad": int(row["_rows_bad"] or 0),
        "violations": {name: int(row[f"_v_{name}"]) for name in rules},
    }


def apply_expectations(
    df: DataFrame,
    rules: dict,
    mode: str = "quarantine",
) -> tuple[DataFrame, DataFrame, dict]:
    """Split ``df`` by the rules. Returns ``(good, bad, metrics)``:
    ``good`` has the original columns, ``bad`` carries
    ``_violations``, ``metrics`` is :func:`expectation_metrics`.

    Modes: ``'quarantine'`` (split, never raise), ``'fail'`` (raise
    :class:`ExpectationViolation` if ANY row violates — the
    constraint-like gate for pipelines that must stop), ``'drop'``
    (good rows only; ``bad`` still returned for inspection but
    callers ignore it)."""
    if mode not in ("quarantine", "fail", "drop"):
        raise ValueError(f"unknown mode: {mode!r}")
    metrics = expectation_metrics(df, rules)
    n_bad = metrics["rows_bad"]
    if mode == "fail" and n_bad:
        raise ExpectationViolation(
            f"{n_bad} rule violations across "
            f"{[n for n, v in metrics['violations'].items() if v]}"
        )
    tagged = tag_violations(df, rules)
    good = tagged.where(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = tagged.where(F.size(VIOLATIONS_COL) > 0)
    return good, bad, metrics


def ingest_with_expectations(
    table,
    df: DataFrame,
    rules: dict,
    quarantine_dir: str | None = None,
    batch_id: str | None = None,
) -> dict:
    """Validated bulk ingest: good rows take the normal
    :meth:`LineageTable.ingest_dataframe` write path (rid assignment,
    CHECK/UNIQUE constraints, staged publish); violating rows append
    to the table's quarantine area (plain parquet, original columns +
    ``_violations``) instead of poisoning the table or aborting the
    batch. Returns the metrics dict, extended with
    ``quarantine_dir``.

    Retry-idempotency (the streaming twin's per-batch-overwrite
    discipline): quarantine is written AFTER the ingest succeeds, so
    an aborted ingest (CheckViolation etc.) leaves no quarantine rows
    behind to duplicate on retry. Callers that may re-run a
    *successful* batch (at-least-once drivers) pass ``batch_id``:
    quarantine then overwrites the deterministic subdirectory
    ``<qdir>/batch=<batch_id>``, so a replay's QUARANTINE converges
    rather than accumulates — table-side idempotency is NOT covered
    (a replayed successful batch re-appends its good rows through
    ``ingest_dataframe``; dedup upstream or key the replay decision
    on the batch id before calling). When no ``batch_id`` is given, a
    unique one is generated so the quarantine area is uniformly
    ``batch=...``-partitioned — mixing keyed and unkeyed calls on the
    same table previously left files at BOTH the qdir root and under
    subdirectories, which ``spark.read.parquet(qdir)`` refuses to
    read (ADVICE r12). A PRE-EXISTING quarantine area with root-level
    parquet from releases before the keyed layout is migrated on the
    first keyed write: its root files move under ``batch=legacy`` —
    one directory rename per file, no data read — so old and new rows
    read together (ADVICE r13: without the migration, the exact
    mixed-layout failure the keyed layout claims to fix reproduced on
    any area created before it).

    The default quarantine area ``<table>/_quarantine`` sits next to
    ``_dropped/`` — outside the base/tail data dirs, invisible to
    scans, repair, and vacuum."""
    import uuid

    good, bad, metrics = apply_expectations(df, rules, mode="quarantine")
    n_bad = metrics["rows_bad"]
    qdir = quarantine_dir or os.path.join(table.path, "_quarantine")
    table.ingest_dataframe(good)
    if n_bad:
        _migrate_legacy_quarantine(qdir)
        bid = batch_id if batch_id is not None else f"adhoc-{uuid.uuid4().hex[:12]}"
        bad.write.mode("overwrite").parquet(os.path.join(qdir, f"batch={bid}"))
    metrics["quarantine_dir"] = qdir if n_bad else None
    return metrics


def _migrate_legacy_quarantine(qdir: str) -> None:
    """Move root-level parquet files (the pre-r13 unkeyed layout)
    under ``batch=legacy-...`` so the area is uniformly partitioned
    and one ``spark.read.parquet(qdir)`` reads everything. Metadata-
    plane: a LIST plus one rename per stray file; no-op on absent or
    already-uniform areas. Each migration run gets its own unique
    legacy batch so a half-moved state just re-migrates."""
    import uuid

    if not os.path.isdir(qdir):
        return
    stray = [
        fn
        for fn in os.listdir(qdir)
        if fn.endswith(".parquet") and os.path.isfile(os.path.join(qdir, fn))
    ]
    if not stray:
        return
    dest = os.path.join(qdir, f"batch=legacy-{uuid.uuid4().hex[:12]}")
    os.makedirs(dest, exist_ok=True)
    for fn in stray:
        os.rename(os.path.join(qdir, fn), os.path.join(dest, fn))
    # Spark success markers / checksums at the root stop mattering
    # once the files move; sweep them so the reader sees a clean
    # partitioned layout
    for fn in os.listdir(qdir):
        p = os.path.join(qdir, fn)
        if os.path.isfile(p) and (fn.startswith("_") or fn.endswith(".crc")):
            os.remove(p)
