"""Join operators — SURVEY.md §2.4 (J1–J3).

The reference's joins are pandas merges plus a Python nested loop
(its core fuzzy match, dags/etl_grammy_spotify.py:222-250: for each
grammy row, filtered scans over 114k spotify rows). Here they are:

* ``impute_left_join`` — J1/J2: keyed left join + deterministic 1-row
  pick + coalesce write-back (replaces the pandas integer-index
  scatter write `grammy.at[row['original_index'], …]`, :135).
* ``fuzzy_enrich`` — J3: the loop decomposed into two declarative
  passes: an equi-join arm (hash join on the exact key + containment
  post-filter) and a containment-only theta arm on the misses
  (BroadcastNestedLoopJoin over the broadcast right side). Catalyst
  will not invent this decomposition — it is the engine's one logical
  rewrite, done at the API level (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from workhop2_etl_spark.operators.dedupe import argmax_dedupe


def impute_left_join(
    base: DataFrame,
    source: DataFrame,
    on: Column,
    fill: dict[str, Column],
    pick_order: list[Column],
    source_key: list[str],
) -> DataFrame:
    """J1/J2 — enrich ``base`` from ``source`` where ``on`` matches.

    ``fill`` maps base-column → source-side expression; a NULL source
    value leaves the base value (coalesce semantics). The reference's
    1:N fan-out write-back was last-match-wins by iteration order
    (:135-136); here the source is argmax-deduped on ``source_key``
    under ``pick_order`` first, so the pick is explicit and
    deterministic.
    """
    picked = argmax_dedupe(source, source_key, pick_order)
    joined = base.join(F.broadcast(picked), on, "left")
    out = joined
    for col_name, src_expr in fill.items():
        out = out.withColumn(col_name, F.coalesce(src_expr, F.col(col_name)))
    return out.select(*base.columns)


def fuzzy_enrich(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    exact_cond: Column,
    fallback_cond: Column,
    pick_order: list[Column],
    right_cols: list[str],
) -> DataFrame:
    """J3 — two-pass fuzzy left enrichment with argmax tie-resolution.

    Pass 1 joins on ``exact_cond`` (callers put the equality arm here
    so Catalyst plans a hash join; any containment term rides along as
    a join filter). Rows with no pass-1 match retry with
    ``fallback_cond`` (pure containment → BroadcastNestedLoopJoin; the
    right side must be bounded, like the reference's ≤114k-row
    spotify_top). Each pass keeps the single best match per
    ``left_key`` under ``pick_order`` (reference: max popularity,
    :244); unmatched rows survive with NULL enrichment — row count of
    the output equals row count of ``left`` exactly.

    Both passes see the same ``right`` DataFrame; callers should
    .cache() it when it is itself expensive.
    """
    r = F.broadcast(right.select(*right_cols))

    pass1 = argmax_dedupe(
        left.join(r, exact_cond, "left"),
        [left_key],
        pick_order,
    )
    hit1 = pass1.filter(F.col(right_cols[0]).isNotNull())
    miss1 = pass1.filter(F.col(right_cols[0]).isNull()).select(*left.columns)

    pass2 = argmax_dedupe(
        miss1.join(r, fallback_cond, "left"),
        [left_key],
        pick_order,
    )
    return hit1.unionByName(pass2)
