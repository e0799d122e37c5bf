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
# oracle verdict. Round-3 window: (a) the 16 queries that have never
# been in any round's window (VERDICT r02 "Next round" #1) — after
# this round the r01+r02+r03 union covers every registered query;
# (b) queries whose operator or oracle changed this round and need a
# fresh verdict (x6 pack window now sharded, st7 emits raw sums,
# q11 rounds before its threshold — q11 is also in group (a));
# (c) the queries NEW this round (IVF nprobe, stream-stream left
# outer interval join, JDBC round-trip); (d) the flagship; (e) the
# remaining slots re-confirm the highest-value r01-only greens
# (joins, dedup, aggregates, grouping sets, window functions).
# Everything outside the window holds a hash-green r01/r02 verdict
# and still runs in pytest + tools/verify_local.py.
_PRIORITY = [
    # (a) never driver-checked before this round
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
    "x1_word_count",
    "x2_array_agg",
    "x3_hash_sample",
    "v3_embedding_norms",
    # (b) operator/oracle changed this round
    "x6_sequence_pack",
    "st7_stateful_running_totals",
    # (c) new this round
    "v7_topk_cosine_ivf_nprobe",
    "st8_left_outer_interval_join",
    "s5_jdbc_roundtrip",
    # (d) flagship
    "q1_pricing_summary",
    # (e) re-confirm high-value r01-only greens
    "j1_impute_left_join",
    "j2_fanout_argmax_join",
    "j3_fuzzy_two_pass",
    "j4_argmax_dedupe",
    "d1_exact_dup_groups",
    "d2_minhash_lsh_pairs",
    "d3_near_dup_pairs",
    "d4_simhash_groups",
    "d5_ngram_jaccard_sample",
    "d6_dup_clusters",
    "d7_canonical_docs",
    "a1_topk_group_count",
    "a2_count_distinct",
    "a4_dup_counts",
    "a5_histogram",
    "a6_full_dedupe",
    "a8_top_entities",
    "a9_flag_influence",
    "a10_percentiles",
    "f1_normalize_text",
    "g1_pivot",
    "g2_cube",
    "g3_rollup",
    "g4_unpivot",
    "w1_running_and_lag",
    "w2_rank_per_group",
    "w3_range_frame",
    "s2_json_roundtrip",
    "sql1_text_query",
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
