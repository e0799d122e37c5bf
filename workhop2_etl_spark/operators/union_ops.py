"""Set operations — SURVEY.md §2.7 (U1/U2).

The reference's one set op is a schema-divergent concat
(`pd.concat([merged_song, grammy_other])`, dags/etl_grammy_spotify.py:253)
where pandas NaN-fills the missing columns. unionByName with
allowMissingColumns reproduces that exactly — by name, not position,
with NULLs for absent columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame) -> DataFrame:
    """U1 — UNION ALL by column name, NULL-filling missing columns."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
