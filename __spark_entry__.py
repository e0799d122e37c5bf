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
# ROUND-10 NOTE: no CORRECTNESS_r09.json was recorded (the driver's
# round-9 correctness pass never landed in the repo), so the r09
# window's rotation did not produce driver greens — the entire
# 42-query r05 cohort is STILL the staleness tail, and the r09
# additions remain never-driver-verified. Every registry query holds
# committed local sweep greens (VERIFYLOCAL_r09.jsonl at the r09 head,
# VERIFYLOCAL_r10.jsonl at this round's head) in the interim.
# Round-10 window composition (exactly 50):
# (a) 13 never-driver-verified: the seven NEW round-10 queries —
#     t11_bm25_topk (Okapi BM25 lexical retrieval, deterministic
#     per-term fold), t12_bm25_persisted_index (the persisted lexical
#     index lifecycle: build on even doc_ids → append odds → load →
#     IN-list-pruned probe; the oracle recomputes single-shot BM25,
#     so green proves the additive df/n_docs/Σdl partials reconcile
#     exactly), v14_topk_ivf_pq_refine (PQ candidates + exact rescore
#     — FAISS IVFPQR), v15_hybrid_rrf (BM25 arm + cosine arm fused by
#     reciprocal-rank, k_rrf=60) — plus the six r09 additions that
#     never got a driver verdict: v9/v10/v11/v12/v13/st13 (persisted
#     ANN index lifecycles and their streaming ingest) — plus
#     st14_streaming_lexical_ingest (NEW, landed after the first
#     window composition: the BM25 face of st13 — three tokenized
#     micro-batches ingested exactly-once across the artifact's
#     three dirs, additive df/stats partials; the oracle recomputes
#     single-shot BM25, so green proves stream ≡ batch) and
#     v16_hybrid_persisted_rrf (NEW — the capstone: BOTH index
#     artifacts built, saved, loaded, probed top-20 and RRF-fused;
#     the oracle recomputes both arms single-shot, so one verdict
#     covers the two round trips and the fusion) and
#     v17_topk_truncated_refine (NEW — Matryoshka-style 16-of-64
#     prefix prefilter + exact full-dimension refine; both stages
#     rank on rounded scores with id tiebreaks). 13 total.
# (b) 2 kernel-changed with greens older than their kernels:
#     v8_topk_cosine_lsh_multitable (green r08; _multitable_probe
#     extracted r09, cosine guard r10) and f6_timestamp_coerce
#     (green r08; NTZ domain guard r09).
# (c) 35 of the 42-query r05-latest cohort, staleness-report order:
#     a12, a13, a14, d1, d2, d8, dq1, dq3, e3, e8, e9, j10, j11,
#     j7, k1, k2, s6, st10, t10, t1, t2, t4, t5, t6, t7, u2, u5, v2,
#     v4, v5, w4, x11, x4, x6, z1. The v2/v4/v5 rows double
#     as re-verification of the round-10 cosine-guard kernel change
#     (non-finite vectors now excluded from rankings).
# Deferred, each with the displacing rationale:
# - q3_shipping_priority / q9_product_profit (r05 cohort): greens
#   POSTDATE their kernels (r01/r03 — untouched for 7+ rounds), both
#   run in every round's bench HEADLINE, and both hold archived local
#   sweep greens (VERIFYLOCAL_r09/r10).
# - w5_gapfill_days / w6_ewma (r05 cohort): same windows kernel
#   family as the in-window w4 sibling; archived sweep greens (w6
#   yielded its slot to the never-verified st14).
# - e7_cohort_month (r05 cohort): same cohort-derivation kernel as
#   the in-window e3 sibling; archived sweep greens.
# - dq2_rolling_outliers (r05 cohort): same quality.py rolling
#   outlier-monitor kernel family as the in-window dq3 sibling;
#   archived sweep greens (yielded its slot to the never-verified
#   v17).
# - x10_group_sample (r05 cohort): same md5-keyspace deterministic
#   hash-sampling kernel family as the in-window x4 sibling; archived
#   sweep greens (yielded its slot to the never-verified v16).
# - m10_real_jpeg_features (kernel r09, green r08): its r09 codec
#   changes are pinned by the decode fuzz battery + the PIL-branch
#   pytest twins (the m8 precedent from the r09 spec), and it holds
#   archived sweep greens at both the r09 and r10 heads.
# - v1/v6/v7/d9 (cosine-guard kernel change r10, greens r06-r08):
#   the changed kernel is exercised in-window by v2/v4/v5 (expression
#   cosine through LSH/near-dup/IVF shapes) and by v9-v15/st13 (every
#   probe shape from loaded artifacts); the change itself is pinned
#   by the tests/test_retrieval.py non-finite battery (dirty corpora
#   through brute/IVF/LSH/int8 paths); archived sweep greens at this
#   head.
_PRIORITY = [
    "t11_bm25_topk",
    "t12_bm25_persisted_index",
    "v14_topk_ivf_pq_refine",
    "v15_hybrid_rrf",
    "v9_topk_lsh_persisted_index",
    "v10_topk_ivf_persisted_index",
    "v11_ivf_index_health",
    "v12_topk_ivf_int8_index",
    "v13_topk_ivf_pq",
    "st13_streaming_index_ingest",
    "st14_streaming_lexical_ingest",
    "v16_hybrid_persisted_rrf",
    "v17_topk_truncated_refine",
    "v8_topk_cosine_lsh_multitable",
    "f6_timestamp_coerce",
    "a12_weighted_median",
    "a13_profile_stats",
    "a14_equidepth_deciles",
    "d1_exact_dup_groups",
    "d2_minhash_lsh_pairs",
    "d8_chunk_dup_ratio",
    "dq1_constraints",
    "dq3_mad_outliers",
    "e3_cohort_retention",
    "e8_scd2_lookup",
    "e9_attribution",
    "j10_asof_forward_tolerance",
    "j11_nullsafe_join",
    "j7_asof_join",
    "k1_salted_agg",
    "k2_salted_skew_join",
    "s6_schema_evolution",
    "st10_windowed_distinct_users",
    "t10_bigram_topk",
    "t1_token_counts",
    "t2_quality_profile",
    "t4_fingerprint",
    "t5_repetition_ratio",
    "t6_pii_scrub",
    "t7_contamination",
    "u2_intersect",
    "u5_apply_changes",
    "v2_topk_cosine_lsh",
    "v4_embedding_near_dup",
    "v5_topk_cosine_ivf",
    "w4_ohlc_resample",
    "x11_cdc_chunks",
    "x4_stratified_split",
    "x6_sequence_pack",
    "z1_zorder_key",
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
