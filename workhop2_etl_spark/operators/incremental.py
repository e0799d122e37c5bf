"""Incremental aggregate maintenance — refresh a materialized rollup
from an append-only delta without rescanning the fact table.

At 100 TB the fact table cannot be re-aggregated per refresh; the
maintained table stores COMBINABLE partials (count, sum, min, max —
avg is carried as sum+count) so a refresh is:

    delta partials  ∪  affected base partitions  →  re-combine  →
    dynamic-partition overwrite of ONLY the touched partitions.

Shuffle volume is |delta| + |affected rollup rows|; untouched
partitions are neither read (partition pruning on the day filter)
nor rewritten (dynamic overwrite mode). The one driver-side action
collects the delta's DISTINCT partition keys — bounded by the number
of partitions a batch touches (hours/days), not by row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: rollup grain: (day, event_type) with combinable measures
_KEYS = ["day", "event_type"]


def rollup_events_daily(events: DataFrame) -> DataFrame:
    """Partial-aggregate shape of the maintained table. Measures are
    raw (unrounded) so re-combination stays exact for counts and
    associative for sums."""
    return events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def combine_rollups(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two partial rollups: counts/sums add, min/min, max/max."""
    return (
        a.unionByName(b)
        .groupBy(*_KEYS)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def refresh_daily_rollup(
    spark: SparkSession, table_dir: str, delta: DataFrame
) -> list:
    """Fold an event delta into the day-partitioned rollup at
    ``table_dir``. Returns the list of affected days (for logging /
    test assertions). First call bootstraps the table."""
    import os

    d = rollup_events_daily(delta)
    days = [r["day"] for r in d.select("day").distinct().collect()]

    exists = os.path.isdir(table_dir) and any(
        not f.startswith(("_", ".")) for f in os.listdir(table_dir)
    )
    if exists:
        base = spark.read.parquet(table_dir).filter(F.col("day").isin(days))
        merged = combine_rollups(base, d)
    else:
        merged = d

    # dynamic mode: only partitions present in `merged` are replaced.
    # Restored afterwards — leaving it set would silently change
    # overwrite semantics for every other partitioned write in the
    # session.
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("day").parquet(table_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return days


def compact_rollup_epochs(spark: SparkSession, table_dir: str) -> int:
    """Fold all per-epoch rollup partials (streaming/windows.py::
    stream_rollup_to_parquet layout) into a single combined epoch so
    reader-side combine cost stays bounded as epochs accumulate.
    Readers see identical totals before and after (combinable
    measures only). The combined partial is written to a NEW epoch
    directory named after the highest epoch folded (so a concurrent
    late retry of an older epoch cannot resurrect folded data under a
    distinct name), then the old epoch dirs are removed. Returns the
    number of epochs folded."""
    import os
    import shutil

    epochs = sorted(
        (d for d in os.listdir(table_dir) if d.startswith("epoch=")),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    if len(epochs) <= 1:
        return len(epochs)
    parts = spark.read.parquet(*[os.path.join(table_dir, d) for d in epochs])
    combined = (
        parts.groupBy(*_KEYS)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .localCheckpoint(eager=True)  # materialize before deleting inputs
    )
    top = epochs[-1]
    tmp = os.path.join(table_dir, "_compact_tmp")
    combined.write.mode("overwrite").parquet(tmp)
    for d in epochs:
        shutil.rmtree(os.path.join(table_dir, d))
    os.rename(tmp, os.path.join(table_dir, top))
    return len(epochs)
