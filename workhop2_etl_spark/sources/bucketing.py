"""Bucketed tables — shuffle-free co-located joins.

THE cluster-scale join strategy the parquet-directory layout can't
give you: both fact tables are written pre-hashed into the same
number of buckets on the join key, so a later join reads matching
buckets task-for-task — no Exchange on either side, no 100 TB
shuffle. The write pays the shuffle once; every downstream join,
aggregation, or dedup on the bucket key rides it for free.

Local runs store bucketed tables in the session warehouse
(``spark.sql.warehouse.dir``); on a cluster the same API writes to
the metastore-backed location. Sorting within buckets additionally
lets sort-merge joins skip their sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    managed table. ``num_buckets`` should divide the cluster's
    parallelism target; both sides of a co-located join must use the
    same bucket count and key."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table; the scan reports its hash distribution
    to Catalyst, which is what removes the join-side Exchange."""
    return spark.table(table)
