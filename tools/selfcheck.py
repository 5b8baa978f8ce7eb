"""Self-check harness mimicking the driver's correctness gate:
run every __spark_entry__.queries() entry at sf0.01 and compare with
the DuckDB oracle — row count, sorted-column schema, and an
order-insensitive value hash.

With no name filters this IS the full-registry sweep (every workload,
not a 50-slot sample) — run once per round so no workload's local
proof is ever older than one round even though the driver gate is 50
wide (VERDICT r5 item 1). ``tools/sf1_rotate.py`` reuses ``check()``
for the rotating sf1 slice.

Usage: python tools/selfcheck.py [sf_dir] [name_filter...]

PROCESS RULE (VERDICT r6 item 3): the committed full-registry log
(selfcheck_r{N}_full.log) must be the round's LAST substantive act —
run it after the final workload lands, and assert its N/N count
equals the registry count at HEAD (r6 committed a 179/179 log while
the registry closed at 182).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and render with fixed precision
        if v == 0:
            v = 0.0
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def result_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted(cols)), h


def check(spark, sf_dir: str, names=None, filters=None, log=print):
    """Run workloads against the DuckDB oracle at ``sf_dir``.

    ``names``: exact workload list (ordered); ``filters``: substring
    filters over the full registry (legacy CLI behavior). Returns
    {name: "pass"|"fail"|"rows"}."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if names is not None:
        qs = {n: qs[n] for n in names}
    results: dict[str, str] = {}
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            cols = df.columns
            got = result_hash(cols, [tuple(r) for r in rows])
        except Exception as e:
            log(f"FAIL  {name}: spark error: {str(e)[:300]}")
            results[name] = "fail"
            continue
        dt = time.time() - t0
        if name not in oracles:
            log(f"rows  {name}: {got[0]} rows ({dt:.1f}s) [no oracle]")
            results[name] = "rows"
            continue
        try:
            rel = con.sql(oracles[name])
            # The driver's comparator is type-sensitive (Arrow-level):
            # DuckDB HUGEINT/DECIMAL results hash differently from
            # Spark BIGINT/DOUBLE even when values agree. Treat them
            # as failures here so they can't pass locally and fail the
            # driver gate.
            huge = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")
            ]
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            exp = result_hash(ocols, orows)
        except Exception as e:
            log(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            results[name] = "fail"
            continue
        if huge:
            log(f"FAIL  {name}: oracle emits driver-hash-unsafe types {huge} — CAST in the oracle SQL")
            results[name] = "fail"
            continue
        ok = got == exp
        results[name] = "pass" if ok else "fail"
        log(f"{'PASS ' if ok else 'FAIL '} {name}: rows {got[0]}/{exp[0]} hash {got[2]}/{exp[2]} ({dt:.1f}s)")
        if not ok and got[1] != exp[1]:
            log(f"      schema spark={got[1]}")
            log(f"      schema duckdb={exp[1]}")
    return results


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    from lineage_store_database_management_system_spark import get_spark

    spark = get_spark(app_name="selfcheck", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    results = check(spark, sf_dir, filters=filters or None)
    n_pass = sum(1 for v in results.values() if v == "pass")
    n_fail = sum(1 for v in results.values() if v == "fail")
    n_rowsonly = sum(1 for v in results.values() if v == "rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
