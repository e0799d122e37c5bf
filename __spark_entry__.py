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
# green; the r08 window below follows the r08-head report output and
# the r07 verdict's ask #1 verbatim (rotate the entire 44-query
# r04-latest cohort — the whole remaining staleness tail).
# Round-8 window composition (exactly 50):
# (a) 1 never-driver-verified query: m10_real_jpeg_features (NEW this
#     round — genuine baseline-JFIF payloads through the new stdlib
#     JPEG decode tier; r07 verdict ask #4);
# (b) 5 queries whose kernel changed THIS round, so their old greens
#     pre-date the code under them: f6 (parse_timestamp_coerce now
#     parses offset-less formats directly to NTZ — DST-gap-proof —
#     and strips quoted literals before offset detection; ADVICE #1/
#     #2), dq4 (profile_drift zero-mean drift guard on both engine
#     and oracle sides; ADVICE #4), m8/m9 (decode_array_tiered grew
#     the stdlib-jpeg tier under their feature kernel), v1 (the
#     similarity.py brute-force pair: BLAS twin gained id-type/|Q|
#     contract guards and schema-derived output types; ADVICE #3 +
#     verdict ask #5 — v1 is also the oldest r05-green of that file);
# (c) ALL 44 r04-latest greens — the entire staleness tail, report
#     order: a3, a7_key_dup_rows, a7_operator_key_dups, a9, e1, e2,
#     e4, e5, e6, f10, f3, f4, f5, f8, f9, g5, j5, j6, o2, p1, p4,
#     p6, p7, s1, s3, sql1, sql2, st1, st2, st3, st4, st5, st6, st7,
#     st9, t8, t9, u1, u4, x2, x7, x8, x9, j9. The f3/f4/f5/f8/f9/
#     f10 rows double as clean.py kernel-changed re-verification.
#     After this round no latest green is older than r05 anywhere
#     (the r07 verdict's stated done-condition).
# Displaced (every r07-window entry not re-listed above): the r07
# cohort dq4-window siblings x13, r3, m9*, x18, e12, sql3, st12, m6,
# j13, r1, r2, the full (c) r03-tail a1…q20, a11, v8 — all hold
# fresh r07 driver greens (50/50 sweep), and the full strict local
# verify_local sweep re-ran green this round after the kernel
# changes (*m9 is re-listed: imagecodec.py is under it).
# Deferred to a same-kernel in-window sibling: v2/v4–v8 → v1 (same
# similarity.py file; only the BLAS function changed, which no
# registry query routes through — v1 is its expression twin and the
# contract-guard pytest covers the BLAS path), f7 → f3–f10 (same
# clean.py; its cast path unchanged), plus the r05/r06/r07 cohorts
# whose greens are ≤3 rounds old.
_PRIORITY = [
    # (a) never driver-verified
    "m10_real_jpeg_features",
    # (b) kernel changed this round
    "f6_timestamp_coerce",
    "dq4_profile_drift",
    "m8_real_image_features",
    "m9_multimodal_pipeline",
    "v1_topk_cosine_bruteforce",
    # (c) the full r04-latest tail, staleness-report order
    "a3_quality_counts",
    "a7_key_dup_rows",
    "a7_operator_key_dups",
    "a9_flag_influence",
    "e1_sessionize",
    "e2_funnel",
    "e4_event_transitions",
    "e5_scd2_runs",
    "e6_funnel_latency",
    "f10_date_functions",
    "f3_separator_variants",
    "f4_sentinel_roundtrip",
    "f5_str_to_bool",
    "f8_prefix_extract",
    "f9_conditional_impute",
    "g5_grouping_sets",
    "j5_semi_join",
    "j6_anti_join",
    "o2_sort_limit",
    "p1_conj_filter",
    "p4_keyword_filter",
    "p6_isin_filter",
    "p7_split_branches",
    "s1_csv_roundtrip",
    "s3_orc_roundtrip",
    "sql1_text_query",
    "sql2_sessions_sql",
    "st1_tumbling_counts",
    "st2_sliding_counts",
    "st3_session_windows",
    "st4_json_props",
    "st5_stream_dedup",
    "st6_interval_join",
    "st7_stateful_running_totals",
    "st9_stream_static_enrich",
    "t8_tfidf_top_terms",
    "t9_unigram_logprob",
    "u1_union_by_name",
    "u4_upsert",
    "x2_array_agg",
    "x7_doc_chunks",
    "x8_quality_gate",
    "x9_deterministic_shuffle",
    "j9_full_outer_reconcile",
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
