"""Source readers — SURVEY.md §2.1 (S1–S3).

Every reader takes an explicit schema where the format can't carry
one (CSV): the reference infers dtypes from pandas (`pd.read_csv`,
dags/etl_grammy_spotify.py:43), which at scale means a full extra
pass and nondeterministic types. Inference stays available as a dev
fallback only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """S1 — CSV scan (reference: dags/etl_grammy_spotify.py:43,85-86).

    With a declared schema the scan is single-pass and column-prunable;
    ``mode=PERMISSIVE`` keeps malformed rows as NULLs (the engine's
    null-first policy) instead of failing the job.
    """
    require_exists(path)
    reader = spark.read.option("header", str(header).lower()).option("mode", "PERMISSIVE")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the engine's native interchange format. Schema
    travels in the footer; predicate pushdown and column pruning reach
    the row groups via Catalyst."""
    require_exists(path)
    return spark.read.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines scan (beyond the reference's CSV/JDBC surface —
    the interchange format every LLM-corpus pipeline actually ships).

    Same schema policy as CSV: declare it and the scan is single-pass;
    without one Spark runs a full inference pass first (dev only).
    ``multiline=False`` is the scalable layout — one JSON doc per
    line splits cleanly across executors; a multiline array cannot.
    """
    require_exists(path)
    reader = spark.read.option("mode", "PERMISSIVE")
    if multiline:
        reader = reader.option("multiLine", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        return reader.schema(schema).json(path)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """S2 — JDBC scan (reference: dags/etl_grammy_spotify.py:56-58,
    full-table `pd.read_sql` over MySQL — single connection, single
    pass, whole table in driver memory).

    Spark-first version: pass ``partition_column``/bounds so the scan
    fans out over ``num_partitions`` parallel connections — the only
    way a JDBC source scales past one executor. Exactly one of
    ``table``/``query`` must be given.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    reader = spark.read.format("jdbc").option("url", url)
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        if table is None:
            raise ValueError("partitioned JDBC reads require dbtable (not query)")
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Raw-file ingestion for multimodal corpora — Spark's
    ``binaryFile`` source: one row per file with columns
    (path, modificationTime, length, content: binary).

    This is the step BEFORE the m1–m4 multimodal operators: image /
    audio / video shards on disk or object store become the opaque
    binary column those stages decode. ``glob`` filters by filename
    pattern at listing time (``*.jpg``) so non-matching files are
    never opened.

    Scale: Spark packs many small files into each task up to
    ``spark.sql.files.maxPartitionBytes``, but at 100 TB the listing
    itself is the bottleneck for millions of loose files — ingest once
    via this reader, then persist as parquet (payload + metadata
    columns) so every later pass gets footers, pruning, and sane
    partition sizes. Metadata-only queries should select
    (path, length) WITHOUT ``content`` — the column is only read when
    projected.
    """
    require_exists(path)
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def require_exists(path: str) -> None:
    """S3 — explicit pre-check with a clean error (reference:
    dags/etl_grammy_spotify.py:40-41) instead of a deep
    AnalysisException. Only checks local paths; object-store URIs are
    left to Spark."""
    if "://" not in path and not os.path.exists(path):
        raise FileNotFoundError(f"source path does not exist: {path}")
