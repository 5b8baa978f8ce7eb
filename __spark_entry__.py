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
    from lineage_store_database_management_system_spark import workloads

    return dict(workloads.QUERIES)


def oracle_sql() -> dict[str, str]:
    from lineage_store_database_management_system_spark import workloads

    return dict(workloads.ORACLE)
