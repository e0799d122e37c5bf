"""KPI analytics over the merged grammy×spotify output — the
reference's EDA/Power BI queries as named DataFrame pipelines
(README.md:99-124; eda.ipynb cells 14-17).

Each returns a small top-k/aggregate frame meant to be collected by a
reporting layer; plots are out of engine scope (SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def awards_per_artist(merged: DataFrame, k: int = 20) -> DataFrame:
    """A8 — 'Artista más premiado' (README.md:103): winners per artist."""
    return (
        merged.filter(F.col("winner"))
        .groupBy("artist")
        .agg(F.count(F.lit(1)).alias("n_awards"))
        .orderBy(F.desc("n_awards"), "artist")
        .limit(k)
    )


def top_categories(merged: DataFrame, k: int = 10) -> DataFrame:
    """A1 — top categories by nominations (eda.ipynb cell 15)."""
    return (
        merged.groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "category")
        .limit(k)
    )


def awards_per_genre(merged: DataFrame, k: int = 10) -> DataFrame:
    """A1 — awards reaching each spotify genre (eda.ipynb cell 17);
    unmatched rows carry the 'N/A' genre sentinel and are excluded."""
    return (
        merged.filter(F.col("track_genre") != "N/A")
        .groupBy("track_genre")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "track_genre")
        .limit(k)
    )


def popularity_histogram(merged: DataFrame, bin_width: int = 10) -> DataFrame:
    """A5 — popularity distribution of all MATCHED rows (popularity
    non-null; winners and losers alike — eda.ipynb cell 16 bins the
    whole merged frame), fixed-width bins as a hash aggregate. Filter
    ``winner`` upstream for a winners-only histogram."""
    return (
        merged.filter(F.col("popularity").isNotNull())
        .groupBy((F.floor(F.col("popularity") / bin_width) * bin_width).alias("bin_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin_start")
    )


def explicit_influence(merged: DataFrame) -> DataFrame:
    """A9 — does explicitness correlate with winning a song award
    (README.md:107): counts and average popularity by explicit flag."""
    return (
        merged.filter(F.col("explicit").isNotNull())
        .groupBy("explicit")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("popularity"), 4).alias("avg_popularity"),
        )
        .orderBy("explicit")
    )
