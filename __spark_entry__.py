"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``workhop2_etl_spark`` package; this file
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from workhop2_etl_spark import suite  # noqa: E402

suite.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's correctness pass covers exactly the first 50 registry
# entries in insertion order, so ordering decides which queries get an
# oracle verdict. This comment is the maintained spec for the window —
# keep it exact. The window composes from tools/staleness_report.py
# (latest green per CORRECTNESS_r*.json + last kernel-touching commit
# round from git), ordered never-verified > kernel-changed > oldest
# green; the r07 window below follows the r07-head report output and
# the r06 verdict's ask #3 verbatim.
# Round-7 window composition:
# (a) the 8 never-driver-verified queries, r06-fail fixes first:
#     dq4/x13/r3 (the three r06 hash-fails, now environment-proofed —
#     scaled-integer report columns on BOTH engine and oracle sides,
#     plus BIGINT casts on the DuckDB integer-sums whose HUGEINT type
#     coerces to float64 on pandas/arrow fetch paths; all three green
#     under the tightened full-repr local gate), then m9 (multimodal
#     pipeline end-to-end), x18 (leakage-safe cluster-keyed split),
#     e12 (event gap stats), sql3 (corpus quality SQL), st12
#     (windowed top-k leaderboard) — the r06 below-window-by-choice
#     set, all judge-re-verified green locally last round;
# (b) 6 queries whose kernel changed THIS round, so their old greens
#     pre-date the code under them: f6 (parse_timestamp_coerce now
#     returns session-tz-proof TIMESTAMP_NTZ), m6 (oracle DECIMAL →
#     DOUBLE cast), m8 (decode_tier column added to
#     extract_image_features), j13 (as-of tolerance now exact
#     microseconds via _interval_micros), r1/r2 (incremental.py
#     generation-dir parsing hardened + newest-base as_of guard +
#     all-NULL-cell row-presence fix);
# (c) ALL 34 r03-latest greens — the entire staleness tail, report
#     order: a1, a2, a5, a6, a8, a10, d4, d5, d7, f1, g2, g3, g4,
#     j2, j4, s2, v3, w1, w2, w3, x1, x3, then the q-star family
#     q4, q6, q8, q10, q11, q12, q14, q15, q16, q17, q19, q20.
#     After this round no latest green is older than r04 anywhere
#     (the verdict's stated done-condition);
# (d) 2 spare slots → a11_approx_sketches (oldest r04 entry, kernel
#     changed this round: exact_p50 now tie-free half-cents) and
#     v8_topk_cosine_lsh_multitable (NEW this round — the banding
#     construction for hyperplane LSH; never-verified, so it must
#     land in-window per the window spec). a3_quality_counts (the
#     other oldest-r04 candidate) defers one round: its aggs.py
#     conditional-aggregate kernel is held in-window by a1/a2/a5/a6/
#     a8/a11 and the full strict local sweep.
# Displaced (every r06-window entry that held green there): m5, j12,
# w7, e10, st11, x14, d9, m7, g8, e11, x15, dq5, x16, x17, w8, g7,
# m1, m3, j8, g6, st8, q13, f7, t3, m2, m4, u3, x5, v6, q2, q5, q7,
# q18, q21, q22, j1, j3, d3, d6, q1, a4, g1, s5, v7 — all hold fresh
# r06 driver greens, full local pytest + the 180-query strict
# (full-repr float) verify_local sweep re-ran green this round.
# Deferred to a same-kernel in-window sibling: j7→j13 (same asof.py
# file; j7's INTERVAL-expr tolerance path unchanged), plus the r04/
# r05/r06 cohorts whose greens are ≤3 rounds old.
_PRIORITY = [
    # (a) never driver-verified — r06-fail fixes first
    "dq4_profile_drift",
    "x13_weighted_sample",
    "r3_hist_quantiles",
    "m9_multimodal_pipeline",
    "x18_leakage_safe_split",
    "e12_event_gap_stats",
    "sql3_corpus_quality_sql",
    "st12_windowed_topk",
    # (b) kernel changed this round
    "f6_timestamp_coerce",
    "m6_real_audio_meta",
    "m8_real_image_features",
    "j13_asof_nearest",
    "r1_daily_rollup",
    "r2_combine_partials",
    # (c) the full r03-latest tail, staleness-report order
    "a1_topk_group_count",
    "a2_count_distinct",
    "a5_histogram",
    "a6_full_dedupe",
    "a8_top_entities",
    "a10_percentiles",
    "d4_simhash_groups",
    "d5_ngram_jaccard_sample",
    "d7_canonical_docs",
    "f1_normalize_text",
    "g2_cube",
    "g3_rollup",
    "g4_unpivot",
    "j2_fanout_argmax_join",
    "j4_argmax_dedupe",
    "s2_json_roundtrip",
    "v3_embedding_norms",
    "w1_running_and_lag",
    "w2_rank_per_group",
    "w3_range_frame",
    "x1_word_count",
    "x3_hash_sample",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q11_revenue_concentration",
    "q12_late_shipping",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    # (d) spare slots → oldest-r04 + the round's one new query
    "a11_approx_sketches",
    "v8_topk_cosine_lsh_multitable",
]


def _ordered(names: dict) -> list[str]:
    missing = [n for n in _PRIORITY if n not in names]
    if missing:
        raise KeyError(f"priority list references unknown queries: {missing}")
    rest = [n for n in names if n not in set(_PRIORITY)]
    return list(_PRIORITY) + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return suite.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: suite.QUERIES[n] for n in _ordered(suite.QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {n: suite.ORACLES[n] for n in _ordered(suite.QUERIES) if n in suite.ORACLES}
