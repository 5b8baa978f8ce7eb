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

    # -- materialized views (extension; lineage watermarks make
    # -- staleness tracking exact) --------------------------------------
    def _mv_dir(self, name: str) -> str:
        return os.path.join(self.path, "_mv", name)

    def create_materialized_view(
        self, name: str, sql: str, deps: list[str]
    ) -> None:
        """Materialize ``sql`` (which references the listed dependency
        tables' CURRENT VIEWS by table name) as a Parquet table with
        recorded per-dependency commit watermarks. The lineage format
        makes staleness exact and free to check: a dependency changed
        iff its watermark moved. Refresh is a full recompute
        (atomically swapped in); the CDC feed (``changes_between``)
        is the building block for an incremental maintainer, left to
        the caller. At scale an MV is the pay-once answer to a
        repeated star-join/aggregate — reading it is a plain
        partition-prunable Parquet scan with zero fold cost."""
        self._require_open()
        if os.path.isdir(self._mv_dir(name)):
            raise ValueError(f"materialized view {name!r} already exists")
        for d in deps:
            self.get_table(d)  # raises on unknown dependency
        self._mv_build(name, sql, deps)

    def _mv_build(self, name: str, sql: str, deps: list[str]) -> None:
        import uuid

        for d in deps:
            self.get_table(d).current_view().createOrReplaceTempView(d)
        out = self.spark.sql(sql)
        mv_dir = self._mv_dir(name)
        staging = os.path.join(
            os.path.dirname(mv_dir), f"_staging_{name}_{uuid.uuid4().hex[:8]}"
        )
        out.write.mode("overwrite").parquet(os.path.join(staging, "data"))
        _atomic_write_json(
            os.path.join(staging, "_mv_meta.json"),
            {
                "name": name,
                "sql": sql,
                "deps": deps,
                "dep_watermarks": {d: self.get_table(d).watermark() for d in deps},
            },
        )
        old = mv_dir + ".old"
        if os.path.isdir(mv_dir):
            os.rename(mv_dir, old)
        os.makedirs(os.path.dirname(mv_dir), exist_ok=True)
        os.rename(staging, mv_dir)
        shutil.rmtree(old, ignore_errors=True)

    def _mv_meta(self, name: str) -> dict:
        meta_path = os.path.join(self._mv_dir(name), "_mv_meta.json")
        if not os.path.isfile(meta_path):
            raise KeyError(f"materialized view {name!r} does not exist")
        with open(meta_path) as f:
            return json.load(f)

    def materialized_view(self, name: str):
        """The MV's stored answer (possibly stale — see
        :meth:`mv_is_fresh`)."""
        self._mv_meta(name)
        return self.spark.read.parquet(os.path.join(self._mv_dir(name), "data"))

    def mv_is_fresh(self, name: str) -> bool:
        """Exact staleness check, no data read: fresh iff every
        dependency's commit watermark equals the recorded one."""
        meta = self._mv_meta(name)
        return all(
            self.get_table(d).watermark() == wm
            for d, wm in meta["dep_watermarks"].items()
        )

    def refresh_materialized_view(self, name: str, force: bool = False) -> bool:
        """Recompute and atomically swap the MV if any dependency
        moved (or ``force``). Returns True if a rebuild happened."""
        meta = self._mv_meta(name)
        if not force and self.mv_is_fresh(name):
            return False
        self._mv_build(name, meta["sql"], meta["deps"])
        return True

    def drop_materialized_view(self, name: str) -> bool:
        existed = os.path.isdir(self._mv_dir(name))
        shutil.rmtree(self._mv_dir(name), ignore_errors=True)
        return existed

    def list_materialized_views(self) -> list[str]:
        root = os.path.join(self.path, "_mv")
        if not os.path.isdir(root):
            return []
        return sorted(
            n
            for n in os.listdir(root)
            if os.path.isfile(os.path.join(root, n, "_mv_meta.json"))
        )

    def _require_open(self) -> None:
        if not self.path or self.spark is None:
            raise RuntimeError("Database.open(path) must be called first")
