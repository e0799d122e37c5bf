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
    pick_min: list[Column],
    right_cols: list[str],
    payload_cols: list[str] | None = None,
    probe_keys: list[str] | None = None,
) -> DataFrame:
    """J3 — two-pass fuzzy left enrichment with argmax tie-resolution.

    Pass 1 joins on ``exact_cond`` (callers put the equality arm here
    so Catalyst plans a hash join; any containment term rides along as
    a join filter). Rows with no pass-1 match retry with
    ``fallback_cond`` (pure containment → BroadcastNestedLoopJoin; the
    right side must be bounded, like the reference's ≤114k-row
    spotify_top). Unmatched rows survive with NULL enrichment — output
    row count equals ``left`` row count exactly.

    ``pick_min``: the best match per left row MINIMIZES this column
    tuple lexicographically (negate numeric columns for "max"; e.g.
    the reference's max-popularity pick (:244) is ``[-popularity,
    track_id]``). Columns must be non-null on matches (coalesce at
    the call site if the right side is nullable).

    Scale note — why aggregate-argmax, not window-argmax: a
    containment arm can fan one left row out to thousands of right
    matches. ``min(struct(pick, payload))`` collapses that fan-out in
    the map-side partial aggregate, so the shuffle carries one row
    per left key; a row_number window would shuffle the entire join
    product (measured: the window variant did not finish at 20k×5k
    rows where this runs in seconds). The enrichment payload rides
    inside the struct, so the heavy right-side columns (document
    text) never cross the shuffle either.

    ``right_cols`` is the broadcast projection (must include every
    column the join conditions read); ``payload_cols`` (default: all
    of right_cols) is what the output keeps. Keep heavy condition-only
    columns (full document text) OUT of payload_cols — the payload is
    what flows through the 1-row-per-match aggregate.

    ``probe_keys``: when the join conditions and pick read ONLY these
    left columns (plus right columns), pass them and the theta join
    probes DISTINCT key tuples instead of every left row — the match
    for a key is computed once and joined back by hash join. Probe
    cost drops from O(|left|·|right|) to O(|distinct keys|·|right|)
    (measured 300× fewer predicate evaluations on a 20k-row probe
    with 64 distinct patterns). Key columns must be non-null.
    """
    payload_cols = payload_cols or right_cols
    r = F.broadcast(right.select(*right_cols))
    payload = F.struct(*[F.col(c) for c in payload_cols])

    # A broadcast NLJ does O(|probe| × |right|) predicate evaluations
    # *per probe partition* — and a small probe table scans as 1-3
    # input partitions, serializing the whole theta join onto a few
    # cores. Spread the probe side across the cluster first; the
    # broadcast side is already everywhere, so this repartition only
    # moves the (small) probe rows.
    parallelism = left.sparkSession.sparkContext.defaultParallelism

    def run(probe: DataFrame, keys: list[str]) -> DataFrame:
        def best_matches(p_side: DataFrame, cond: Column) -> DataFrame:
            joined = p_side.repartition(parallelism).join(r, cond, "inner")
            ranked = F.struct(*pick_min, payload.alias("__payload"))
            return joined.groupBy(*keys).agg(F.min(ranked).alias("__best"))

        # raw1 feeds three consumers (hit branch, miss branch, and the
        # pass-2 probe); without a materialization barrier Spark
        # re-runs the whole pass-1 NLJ+aggregate subtree for each. It
        # is one slim row per probe row — cheap to materialize,
        # expensive to recompute. localCheckpoint instead of cache():
        # blocks are released when the DataFrame is GC'd (cache()
        # pinned them for the session lifetime — every call leaked
        # executor storage), and the lineage cut guarantees pass 1
        # runs once. Trade-off: on a real cluster a lost executor
        # can't recompute checkpoint blocks; acceptable for a slim
        # intermediate inside one job.
        raw1 = probe.join(
            best_matches(probe, exact_cond), keys, "left"
        ).localCheckpoint(eager=False)
        hit1 = raw1.filter(F.col("__best").isNotNull())
        miss1 = raw1.filter(F.col("__best").isNull()).select(*probe.columns)
        raw2 = miss1.join(best_matches(miss1, fallback_cond), keys, "left")
        return hit1.unionByName(raw2)

    if probe_keys:
        probe = left.select(*probe_keys).dropDuplicates(probe_keys)
        enriched = run(probe, probe_keys).select(*probe_keys, "__best")
        out = left.join(enriched, probe_keys, "left")
    else:
        out = run(left, [left_key])
    return out.select(
        *left.columns, *[F.col(f"__best.__payload.{c}").alias(c) for c in payload_cols]
    )
