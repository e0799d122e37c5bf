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
# oracle verdict. Round-4 window: (a) never-verified queries — the 8
# NEW this round (event analytics e1–e5, corpus stats t8/t9, chunking
# x7) plus x2_array_agg (r03's one red row: the driver canonicalizer
# can't hash list cells; x2 now emits a joined string); (b) every
# query that reads `events` — the loader changed this round (testdata
# regenerated with a timestamp-typed ts column) and each needs a
# fresh verdict on the new code path; (c) the 16 queries whose only
# green is r01 (oldest verdicts); (d) 14 of the oldest r02 greens.
# Everything outside the window holds a hash-green r02/r03 verdict
# and still runs in pytest + tools/verify_local.py.
_PRIORITY = [
    # (a) never driver-verified
    "x2_array_agg",
    "e1_sessionize",
    "e2_funnel",
    "e3_cohort_retention",
    "e4_event_transitions",
    "e5_scd2_runs",
    "t8_tfidf_top_terms",
    "t9_unigram_logprob",
    "x7_doc_chunks",
    "x8_quality_gate",
    "x9_deterministic_shuffle",
    # (b) events-loader code path changed this round
    "st1_tumbling_counts",
    "st2_sliding_counts",
    "st3_session_windows",
    "st4_json_props",
    "st5_stream_dedup",
    "st6_interval_join",
    "st7_stateful_running_totals",
    "st8_left_outer_interval_join",
    "st9_stream_static_enrich",
    "j7_asof_join",
    "j8_range_join",
    "a9_flag_influence",
    # (c) r01-only greens (stalest verdicts)
    "a7_key_dup_rows",
    "a7_operator_key_dups",
    "f10_date_functions",
    "f3_separator_variants",
    "f4_sentinel_roundtrip",
    "f5_str_to_bool",
    "f6_timestamp_coerce",
    "f8_prefix_extract",
    "f9_conditional_impute",
    "o2_sort_limit",
    "p1_conj_filter",
    "p4_keyword_filter",
    "p6_isin_filter",
    "p7_split_branches",
    "sql1_text_query",
    "u1_union_by_name",
    # (d) oldest r02 greens
    "a11_approx_sketches",
    "a3_quality_counts",
    "g5_grouping_sets",
    "e6_funnel_latency",
    "j5_semi_join",
    "j6_anti_join",
    "j9_full_outer_reconcile",
    "s1_csv_roundtrip",
    "s3_orc_roundtrip",
    "u4_upsert",
    "sql2_sessions_sql",
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
