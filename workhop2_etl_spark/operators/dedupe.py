"""Dedup / argmax operators — SURVEY.md §2.4 J4/J5, §2.5 A6/A7.

The reference implements "keep the most popular version per key" as a
global sort followed by drop_duplicates (dags/etl_grammy_spotify.py:
216-219) and argmax-in-match-set as sort + iloc[0] (:244). Both are
window-argmax here: shuffle on the group key only, no global sort,
and a total-order tiebreak so results are deterministic under any
partitioning (pandas kept first-encounter order — nondeterministic
under re-sorts; SURVEY §7.4 item 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROW_NUM = "__w2e_rn"


def argmax_dedupe(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """J4 — top-1 row per ``keys`` under ``order_by`` (must be a total
    order for determinism; callers append a unique key as tiebreak).

    Window row_number, not global sort + drop-duplicates: the shuffle
    moves each group to one partition once, and at 100 TB the skewed
    group (the reference's `Unknown` artist) is handled by AQE skew
    splitting on the window shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_ROW_NUM, F.row_number().over(w))
        .filter(F.col(_ROW_NUM) == 1)
        .drop(_ROW_NUM)
    )


def dedupe_full_rows(df: DataFrame) -> DataFrame:
    """A6 — exact full-row dedup (`drop_duplicates()`, eda.ipynb cell 12).
    Spark's dropDuplicates is a hash aggregate over all columns —
    partial+final, no sort."""
    return df.dropDuplicates()


def key_duplicate_rows(df: DataFrame, keys: list[str], count_col: str = "n_per_key") -> DataFrame:
    """A7 — rows whose key appears more than once (`duplicated(keep=False)`,
    eda.ipynb cell 13), with the per-key count attached."""
    w = Window.partitionBy(*keys)
    return df.withColumn(count_col, F.count(F.lit(1)).over(w)).filter(F.col(count_col) > 1)


def duplicate_count(df: DataFrame) -> DataFrame:
    """A4 — scalar full-row duplicate count (`duplicated().sum()`).
    count(*) - count(distinct *) without collecting anything."""
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    distinct = df.dropDuplicates().agg(F.count(F.lit(1)).alias("n_distinct"))
    return total.crossJoin(distinct).select(
        "n_rows", (F.col("n_rows") - F.col("n_distinct")).alias("n_full_dups")
    )
