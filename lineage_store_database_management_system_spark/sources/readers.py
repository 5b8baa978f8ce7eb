"""Sources: typed readers for the engine's supported formats.

The reference's only 'formats' are its own struct/pickle/CSV
persistence files (db.py:58-313 — SURVEY §2.4), all obsoleted by
Parquet. This module is the engine's ingestion surface: Parquet
(primary), CSV and JSON (with explicit schemas — schema inference is
a full extra scan at 100 TB), plus the test star schema loader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

STAR_TABLES = [
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


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Format-dispatched read. fmt inferred from the extension when
    omitted. For csv/json, pass an explicit schema in production —
    inference is allowed here only for small files."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet"}.get(ext, ext or "parquet")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "csv":
        opts = {"header": "true", **{k: str(v) for k, v in options.items()}}
        if schema is None:
            opts.setdefault("inferSchema", "true")
        return reader.options(**opts).csv(path)
    if fmt in ("json", "jsonl", "ndjson"):
        return reader.options(**{k: str(v) for k, v in options.items()}).json(path)
    if fmt == "orc":
        return reader.orc(path)
    raise ValueError(f"unsupported format: {fmt!r}")


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """JDBC source with MANDATORY parallelism plumbing: at warehouse
    scale an unpartitioned JDBC read funnels the whole table through
    one task, so when ``partition_column`` is given all four
    partitioning options are required together (Spark's contract) and
    we validate them eagerly instead of failing at runtime. Requires
    the vendor's JDBC driver jar on the Spark classpath
    (``spark.jars``); without it Spark raises the usual
    ``ClassNotFoundException`` at load time — there is nothing to
    stub, the wiring here is complete."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    parts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in parts):
        if any(p is None for p in parts):
            raise ValueError(
                "partitioned JDBC read needs ALL of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    value_schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Kafka streaming source: ``readStream`` with the value parsed
    from JSON into ``value_schema`` columns when given (else raw
    key/value bytes + metadata). Needs the spark-sql-kafka package on
    the classpath (``spark.jars.packages`` =
    ``org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>``);
    absent that, ``load()`` raises Spark's standard missing-source
    error. Offsets/watermarks are the caller's contract — this wrapper
    only standardizes parsing and option plumbing."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    df = reader.load()
    if value_schema is not None:
        from pyspark.sql import functions as F

        return df.select(
            F.col("key").cast("string").alias("key"),
            F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
            "topic",
            "partition",
            "offset",
            "timestamp",
        ).select("key", "v.*", "topic", "partition", "offset", "timestamp")
    return df


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Nanosecond parquet timestamps arrive as LongType (via the
    nanosAsLong legacy conf); convert to TIMESTAMP_NTZ by pure epoch
    arithmetic — truncation to micros matches what DuckDB does when it
    reads the same file, and NTZ keeps the value timezone-independent."""
    from pyspark.sql import functions as F

    out = df
    for f in df.schema.fields:
        if f.name in ("ts",) and isinstance(f.dataType, T.LongType):
            out = out.withColumn(
                f.name,
                F.expr(
                    f"timestampadd(MICROSECOND, {f.name} div 1000, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    return out


_STAR_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver's TPC-H-ish star schema (TESTDATA.md). Sets the
    nanosAsLong conf (events.ts is TIMESTAMP(NANOS), which Spark
    otherwise refuses) and normalizes it back to TIMESTAMP_NTZ.

    DataFrames are cached per (session, dir): re-creating them costs a
    file listing + parquet footer read per table on the driver, which
    dominates short queries when every workload re-loads the star."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _STAR_CACHE:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _STAR_CACHE[key] = {
            t: _normalize_nanos(spark.read.parquet(f"{sf_dir}/{t}.parquet"))
            for t in STAR_TABLES
        }
    return _STAR_CACHE[key]


def register_star_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_star(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_binary_assets(
    spark: SparkSession, path: str, pattern: str | None = None
) -> DataFrame:
    """Ingest raw asset files (images/audio/video blobs) through
    Spark's built-in ``binaryFile`` source: one row per file with
    ``payload binary`` plus typed metadata — the on-ramp from an
    object store of media files into the multimodal operators
    (``operators.multimodal``). ``pattern`` is a glob over file names
    (pushed to the file listing, e.g. ``'*.png'``). The asset id is
    the xxhash64 of the file path: stable across re-reads,
    partition-count independent."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64("path").alias("asset_id"),
        F.col("path"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("modified"),
            F.element_at(F.split(F.col("path"), "\\."), -1).alias("ext"),
        ).alias("asset_meta"),
    )
