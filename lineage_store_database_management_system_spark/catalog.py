"""Database catalog: create/drop/get tables, open/close lifecycle.

Reference surface: /root/reference/lstore/db.py — ``Database.open``
(db.py:34-36), ``close`` (db.py:38-56), ``create_table``
(db.py:149-171, default path './ECS165' + table_info.txt),
``drop_table`` (db.py:176-180, which raises unconditionally — we
implement the intent, SURVEY Appendix A.7), ``get_table``
(db.py:186-220). The reference's struct/pickle per-column persistence
(db.py:58-313) is replaced wholesale by Parquet + a JSON manifest;
its bufferpool (db.py:315-352) by the Spark block manager
(``DataFrame.persist``), so no pin/unpin/evict code exists here.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .lineage import LineageTable, _atomic_write_json


def int_schema(num_columns: int) -> T.StructType:
    """The reference's fixed all-integer schema (table.py:30,
    db.py:146): columns named col0..col{n-1}, 64-bit."""
    return T.StructType(
        [T.StructField(f"col{i}", T.LongType(), True) for i in range(num_columns)]
    )


class Database:
    """A named collection of lineage tables rooted at one path."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark
        self.path: str | None = None
        self.tables: dict[str, LineageTable] = {}

    # -- lifecycle (D1) -------------------------------------------------
    def open(self, path: str, spark: SparkSession | None = None) -> "Database":
        if spark is not None:
            self.spark = spark
        if self.spark is None:
            from .session import get_spark

            self.spark = get_spark()
        self.path = path
        os.makedirs(path, exist_ok=True)
        return self

    def close(self) -> None:
        """Flush every table's pending buffers and persist the catalog
        listing. All data is already durable Parquet + manifests, so
        close is cheap (the reference reserializes everything,
        db.py:38-56)."""
        for t in self.tables.values():
            t.close()
        if self.path:
            _atomic_write_json(
                os.path.join(self.path, "_catalog.json"),
                {"tables": sorted(self._on_disk_tables() | set(self.tables))},
            )

    def _on_disk_tables(self) -> set[str]:
        if not self.path or not os.path.isdir(self.path):
            return set()
        out = set()
        for name in os.listdir(self.path):
            if os.path.isfile(os.path.join(self.path, name, "_manifest.json")):
                out.add(name)
        return out

    def list_tables(self) -> list[str]:
        return sorted(self._on_disk_tables() | set(self.tables))

    # -- create/drop/get (D2-D4) ---------------------------------------
    def create_table(self, name: str, num_columns: int, key_index: int) -> LineageTable:
        """Reference-parity signature (db.py:149): all-integer columns,
        key by positional index."""
        schema = int_schema(num_columns)
        return self.create_table_typed(name, schema, schema.fields[key_index].name)

    def create_table_typed(
        self,
        name: str,
        schema: T.StructType,
        key: str,
        partition_by: list[str] | None = None,
    ) -> LineageTable:
        """Extension: arbitrary Spark schema (the lineage format's
        NULL=unchanged tail encoding works for any nullable type).
        ``partition_by`` Hive-partitions the base/compacted layout so
        filtered views prune partitions (the 100 TB layout knob)."""
        self._require_open()
        if name in self.tables or name in self._on_disk_tables():
            raise ValueError(f"table {name!r} already exists")
        table = LineageTable.create(
            self.spark, os.path.join(self.path, name), name, schema, key,
            partition_by=partition_by,
        )
        self.tables[name] = table
        return table

    def drop_table(self, name: str) -> bool:
        self._require_open()
        existed = name in self.tables or name in self._on_disk_tables()
        self.tables.pop(name, None)
        tdir = os.path.join(self.path, name)
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)
        return existed

    def get_table(self, name: str) -> LineageTable:
        self._require_open()
        if name in self.tables:
            return self.tables[name]
        tdir = os.path.join(self.path, name)
        if not os.path.isfile(os.path.join(tdir, "_manifest.json")):
            raise KeyError(f"table {name!r} does not exist under {self.path}")
        table = LineageTable.load(self.spark, tdir)
        self.tables[name] = table
        return table

    # -- Spark SQL integration (extension layer, SURVEY §7.2 M4) --------
    def register_views(self, versions: bool = False) -> None:
        """Expose every table's current view as a session temp view so
        the full Spark SQL surface (joins, group-by, windows, set ops,
        function library) works over lineage tables."""
        for name in self.list_tables():
            t = self.get_table(name)
            t.current_view().createOrReplaceTempView(name)
            if versions:
                t.base_df().createOrReplaceTempView(f"{name}__base")
                t.tail_df().createOrReplaceTempView(f"{name}__tail")

    def _require_open(self) -> None:
        if not self.path or self.spark is None:
            raise RuntimeError("Database.open(path) must be called first")
