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
# green.
# ROUND-11 WINDOW (exactly 50; composed per tools/staleness_report.py,
# never-verified > kernel-changed > oldest-green):
# (a) 1 never-driver-verified: t13_bm25_pruned_probe (NEW r11 — the
#     max_df impact-ordered probe of the persisted BIGRAM lexical
#     index; the oracle recomputes the candidate-pruned semantics, so
#     green proves the WAND-family bounded serving path exactly).
# (b) 6 r11-kernel-changed with r10 greens older than their kernels:
#     k1_salted_agg + k2_salted_skew_join (operators/skew.py salt_on
#     deterministic salt; both suite queries now pass salt_on=
#     event_id), t12_bm25_persisted_index (probe_lexical_index grew
#     the max_df branch and _bm25_rank split into _bm25_score+window;
#     save_lexical_index records tok_col), st14_streaming_lexical_
#     ingest (index_stream tok_col-from-metadata + canonical
#     checkpoint binding + _META_SCHEMA tok_col field),
#     v16_hybrid_persisted_rrf (rrf_fuse now collapses each arm to
#     best rank; covers BOTH artifact meta roundtrips after the
#     schema change), u5_apply_changes (merge_* grew on_null_key;
#     default path re-verified).
# (c) the 7-query r05 cohort, all in: dq2_rolling_outliers,
#     e7_cohort_month, q3_shipping_priority, q9_product_profit,
#     w5_gapfill_days, w6_ewma, x10_group_sample.
# (d) 36 of the 44-query r06 cohort, staleness-report order (every
#     STALE-flagged r06 query is in; see deferrals below).
# Deferred, each with the displacing rationale:
# - q2/q5/q7/q13/q18/q21/q22 (r06 star-join family): greens POSTDATE
#   their kernels by 3+ rounds (kernels r01-r03, untouched since),
#   q5/q18 run in every round's bench HEADLINE next to the in-window
#   q3/q9 siblings, and all seven hold VERIFYLOCAL_r11 greens at this
#   head. These seven are the kernel-touch displacements for (a)+(b).
# - s5_jdbc_roundtrip (r06): kernel round == green round (nothing
#   changed since the verdict) and the embedded-Derby value-compare
#   pytest twin runs every round — the one allowed plain deferral.
# - t11_bm25_topk / v15_hybrid_rrf (kernel r11, greens r10): the
#   changed kernels (_bm25_score split, rrf_fuse arm collapse) are
#   exercised in-window by t12/t13 (same scoring core through the
#   persisted probe) and v16 (same fusion through both artifacts);
#   pinned by the new tests/test_retrieval.py adversarial battery;
#   VERIFYLOCAL_r11 green at this head.
# - v9-v13/st13 (kernel r11 via the additive _META_SCHEMA tok_col
#   field, greens r10 — only one round old): the meta roundtrip is
#   exercised in-window by t12/st14 (lexical kind, which actually
#   sets the new field) and v16 (IVF kind through save/load/probe);
#   pinned by the full test_index_store/test_index_stream batteries;
#   VERIFYLOCAL_r11 green at this head.
# QUEUED FOR THE R12 WINDOW (added late in r11, after the rotation
# was composed — this round's 50 slots deliberately went to the
# 51-query staleness tail per the r10 verdict's ask #1):
# t14_bm25_index_delete and v18_topk_ivf_index_delete (the r11
# deletion lifecycle: tombstones + signed lexical partials;
# test_index_store.py::test_delete_*), t15_bm25_prf (Rocchio
# pseudo-relevance-feedback expansion — both passes oracle-replayed)
# and v19_hybrid_weighted (CombSUM min-max convex fusion). All four
# hold VERIFYLOCAL_r11 greens and operator pytest batteries; they
# take never-verified priority at the head of the r12 window.
_PRIORITY = [
    "t13_bm25_pruned_probe",
    "k1_salted_agg",
    "k2_salted_skew_join",
    "t12_bm25_persisted_index",
    "st14_streaming_lexical_ingest",
    "v16_hybrid_persisted_rrf",
    "u5_apply_changes",
    "dq2_rolling_outliers",
    "e7_cohort_month",
    "q3_shipping_priority",
    "q9_product_profit",
    "w5_gapfill_days",
    "w6_ewma",
    "x10_group_sample",
    "a4_dup_counts",
    "d9_semantic_dedup",
    "dq5_referential_integrity",
    "f7_cast_sentinel",
    "g1_pivot",
    "g6_pagerank",
    "g7_triangle_count",
    "g8_label_propagation",
    "j12_interval_overlap",
    "j1_impute_left_join",
    "j3_fuzzy_two_pass",
    "j8_range_join",
    "m1_image_meta",
    "m2_meta_filter",
    "m3_resize_plumbing",
    "m4_frame_sample",
    "m5_real_image_dims",
    "m7_real_gif_frames",
    "q1_pricing_summary",
    "st11_full_outer_interval_join",
    "st8_left_outer_interval_join",
    "t3_lang_id",
    "u3_except",
    "v6_topk_cosine_lsh_multiprobe",
    "v7_topk_cosine_ivf_nprobe",
    "w7_rolling_corr",
    "w8_rolling_slope",
    "d3_near_dup_pairs",
    "d6_dup_clusters",
    "e10_rfm_segments",
    "e11_top_paths",
    "x14_temperature_mix",
    "x15_pack_manifest",
    "x16_corpus_datasheet",
    "x17_corpus_pipeline",
    "x5_domain_mix",
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
