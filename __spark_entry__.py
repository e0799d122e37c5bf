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
# oracle verdict. Round-2 window: (a) the flagship, (b) every query
# whose oracle changed since r01 and needs a fresh verdict, (c) every
# family with NO verdict yet — incl. the round-2 training-pipeline ops
# (PII scrub, contamination, repetition, split/mix/pack), ORC source,
# multi-probe LSH, and the st7 custom stateful operator — then (d) the
# most distinctive star-join plan shapes. Queries left outside the
# window either hold a hash-green r01 verdict or are near-duplicates
# of an in-window plan shape (x1-x3, q4/q6/q10/q14/q19, v3); they
# still run in pytest + tools/verify_local.py and rotate into the r03
# window.
_PRIORITY = [
    # (a) flagship
    "q1_pricing_summary",
    # (b) oracle fixed this round (CAST AS BIGINT / new a11 bound oracle)
    "a3_quality_counts",
    "s1_csv_roundtrip",
    "f7_cast_sentinel",
    "dq1_constraints",
    "a11_approx_sketches",
    "u4_upsert",
    "m2_meta_filter",
    "st4_json_props",
    # (c) families without a verdict yet
    "j5_semi_join",
    "j6_anti_join",
    "j7_asof_join",
    "j8_range_join",
    "j9_full_outer_reconcile",
    "u2_intersect",
    "u3_except",
    "m1_image_meta",
    "m3_resize_plumbing",
    "m4_frame_sample",
    "v1_topk_cosine_bruteforce",
    "v2_topk_cosine_lsh",
    "v4_embedding_near_dup",
    "v5_topk_cosine_ivf",
    "v6_topk_cosine_lsh_multiprobe",
    "q3_shipping_priority",
    "q5_local_volume",
    "q13_order_count_dist",
    "q18_large_orders",
    "q22_idle_rich_customers",
    "st1_tumbling_counts",
    "st2_sliding_counts",
    "st3_session_windows",
    "st5_stream_dedup",
    "st6_interval_join",
    "st7_stateful_running_totals",
    "t1_token_counts",
    "t2_quality_profile",
    "t3_lang_id",
    "t4_fingerprint",
    # (c') round-2 training-data-pipeline ops — first-class per brief
    "t5_repetition_ratio",
    "t6_pii_scrub",
    "t7_contamination",
    "x4_stratified_split",
    "x5_domain_mix",
    "x6_sequence_pack",
    "s3_orc_roundtrip",
    # (d) round-2 star-join additions — most distinctive plan shapes
    "q2_best_value_supplier",
    "q7_nation_volume",
    "q9_product_profit",
    "q21_waiting_supplier",
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
