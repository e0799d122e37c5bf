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
# keep it exact. Round-5 window, final composition:
# (a) 27 queries NEW this round (never driver-verified — always
#     first);
# (b) 7 queries whose query code or oracle changed this round, so
#     their old verdicts pre-date the code under them: e3 (cohort
#     period validation + month path), d1 (NULL-fingerprint exclusion
#     in exact dedup), j8 (range_join collision-suffix projection),
#     d2 (the word_shingles→all_ngrams kernel factoring — the
#     signature/band path; t5/t10, the other all_ngrams consumers,
#     are in-window under (c)/(a)), j7 (tie-collapse of equal-instant
#     clicks on both Spark and oracle sides; j10 covers the forward
#     direction of the same change), and — counted under (a) since
#     they are also new — w6 (oracle weights now generated from
#     _EWMA_W) and s6 (per-process io_dir sinks, shared with
#     in-window s1);
# (c) 17 of the 31 queries whose latest green is r02 — the stalest
#     verdicts, including the t-family tokenization kernels that
#     moved in round 4 and the m-family Arrow kernels (m1 meta, m3
#     resize — INDEPENDENT mapInPandas kernels, both in-window);
# (d) x6_sequence_pack, whose (lang, shard) fix landed in round 4 so
#     its r03 green pre-dates the code under it.
# Deferred to a same-kernel in-window sibling (each keeps its local
# pytest + verify_local gate, and ALL 154 queries were re-verified
# green locally this round): t3→t1/t2/t4/t6 (per-row text kernel,
# unchanged since r02), u3→u2 (set-op family), m2→m1 (m1's meta
# extraction + a filter), m4→m1/m3 (same Arrow batch plumbing),
# x5→x4 (md5-keyspace split), v6→v2 (LSH signature kernel; v6's
# recall gate runs in pytest), q2/q5/q7/q13/q18/q21/q22→q3/q9 (the
# star family shares suite/star*.py load/broadcast helpers; q13's
# outer-join shape noted as the weakest deferral), d6/d3/d5/d7→d2
# (the changed all_ngrams/shingle kernel is upstream of all of them;
# d6's clusters path adds only graph.py CC, unchanged since r03),
# s2/s3→s1/s6 (io_dir path helper shared by all four round-trips).
# NOT re-verified on purpose: j1–j4 (joins.py unchanged since r03).
_PRIORITY = [
    # (a) never driver-verified (new this round)
    "g7_triangle_count",
    "k2_salted_skew_join",
    "d8_chunk_dup_ratio",
    "e9_attribution",
    "w6_ewma",
    "dq2_rolling_outliers",
    "e7_cohort_month",
    "r1_daily_rollup",
    "r2_combine_partials",
    "z1_zorder_key",
    "k1_salted_agg",
    "t10_bigram_topk",
    "u5_apply_changes",
    "s6_schema_evolution",
    "j10_asof_forward_tolerance",
    "w4_ohlc_resample",
    "g6_pagerank",
    "e8_scd2_lookup",
    "j11_nullsafe_join",
    "a12_weighted_median",
    "a13_profile_stats",
    "w5_gapfill_days",
    "a14_equidepth_deciles",
    "st10_windowed_distinct_users",
    "x10_group_sample",
    "x11_cdc_chunks",
    "dq3_mad_outliers",
    # (b) query code or oracle changed this round (see head comment)
    "e3_cohort_retention",
    "d1_exact_dup_groups",
    "j8_range_join",
    "d2_minhash_lsh_pairs",
    "j7_asof_join",
    # (c) r02-latest greens (stalest; shared kernels moved in r4).
    # f7_cast_sentinel defers: clean.py's cast kernel holds r04
    # greens via f3-f9 and f7 keeps its pytest gate — displaced by
    # never-verified dq3_mad_outliers
    "dq1_constraints",
    "t1_token_counts",
    "t2_quality_profile",
    # t3_lang_id defers: operators/text.py's per-row expression
    # kernel is unchanged since r02 and t1/t2/t4/t6 re-verify the
    # family — displaced by never-verified x11_cdc_chunks
    "t4_fingerprint",
    "t5_repetition_ratio",
    "t6_pii_scrub",
    "t7_contamination",
    "x4_stratified_split",
    "u2_intersect",
    # u3_except shares union_ops/set-op kernels with u2 — one fresh
    # verdict covers the family; u3 keeps the local pytest gate
    "m1_image_meta",
    "m3_resize_plumbing",
    "v1_topk_cosine_bruteforce",
    "v2_topk_cosine_lsh",
    "v4_embedding_near_dup",
    "v5_topk_cosine_ivf",
    "q3_shipping_priority",
    "q9_product_profit",
    # (d) r03 green on round-4-touched code: the (lang, shard) fix
    # landed in round 4, so x6's r03 green pre-dates the code under it
    "x6_sequence_pack",
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
