"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual registry lives in
``lineage_store_database_management_system_spark.workloads`` — one
entry per operator from SURVEY.md §2 plus the extension layer
(joins/group-by/windows/set-ops), the LLM-data-pipeline operators
(dedup / similarity / text / multimodal), and streaming.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: bulk-ingest orders
    into a lineage table, run update + delete rounds through the tail,
    and read the current view — the end-to-end lineage pipeline."""
    from lineage_store_database_management_system_spark import workloads

    return workloads.QUERIES["pq_insert_bulk_current_view"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered for the correctness gate's 50-workload budget.

    The driver gates the FIRST 50 registry entries per round
    (CORRECTNESS_r01/r02/r03 each cover exactly the first 50 keys of
    the then-current registry). With 100+ workloads, proving
    everything needs rotation: workloads WITHOUT a hash-green driver
    row yet sort first — oracle-backed before rows-only. Remaining
    slots RE-ENTER previously-proven workloads STALEST PROOF ROUND
    FIRST (write-path `pq_*` ahead of read-only ones WITHIN a round)
    so no workload's latest proof ages unboundedly — worst-case
    staleness is bounded at ~registry_size/50 rounds. A write-path
    regression between driver gates is caught by the full-registry
    local sweep (`tools/selfcheck.py`, run every round; SCALING.md
    records the log). Rows-only runs never count as proven. Union the
    per-round correctness files for total driver-proven coverage."""
    from lineage_store_database_management_system_spark import workloads

    last_green = _last_green_round()
    names = list(workloads.QUERIES)
    ordered = sorted(
        names,
        key=lambda n: (
            n in last_green,  # unproven first
            n not in workloads.ORACLE,  # oracle-backed before rows-only
            -names.index(n) if n not in last_green else 0,  # newest unproven first
            # among proven: stalest proof round first (bounds the
            # worst-case gate staleness), pq_* write-path workloads
            # ahead of read-only ones within the same round
            last_green.get(n, 0),
            not n.startswith("pq_"),
            names.index(n),
        ),
    )
    return {n: workloads.QUERIES[n] for n in ordered}


def _last_green_round() -> dict[str, int]:
    """name -> latest round number with a hash-green row in
    CORRECTNESS_r*.json. Rows-only (err == 'no_oracle') runs do NOT
    count as proven (ADVICE r3)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def oracle_sql() -> dict[str, str]:
    from lineage_store_database_management_system_spark import workloads

    return dict(workloads.ORACLE)
