"""Named query suite — the correctness surface of the engine.

Every operator from SURVEY.md §2 (and every north-star extension) is
exposed here as a named query ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent DuckDB oracle SQL string. The
driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash (``__spark_entry__.py`` contract).

Oracle SQL runs in DuckDB only, so it may use DuckDB-native idioms
(list_* functions, time_bucket, ``g`` regexp flags) as long as the
*result values and column names* match the Spark side exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def io_dir(name: str) -> str:
    """Per-process round-trip sink path for the s* format queries:
    keyed by pid so two concurrent sessions (e.g. verify_local while
    bench runs) never overwrite each other's files mid-scan; re-runs
    within one session reuse and overwrite their own directory."""
    import os
    import tempfile

    return os.path.join(tempfile.gettempdir(), f"workhop2_io_{os.getpid()}", name)


def load_all() -> None:
    """Import every suite module so registrations run."""
    from workhop2_etl_spark.suite import (  # noqa: F401
        aggs,
        core,
        corpus,
        dedup,
        events,
        joins,
        maintenance,
        multimodal,
        pipeline2,
        retrieval,
        similarity,
        star,
        star2,
        streaming,
        text,
    )
