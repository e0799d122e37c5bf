"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints JSONL — one SHORT line per query as it completes:
  {"q": "<name>", "sec": N}
then three calibration-normalized canary lines:
  {"canary": "<name>", "raw_sec": N, "norm_sec": N, "cal_ratio": R}
and LAST a compact summary line:
  {"metric": "headline_suite_total", "value": N, "unit": "sec",
   "queries": {"name": sec, ...}, "sf": ..., "n_queries": N,
   "load_context": {...}}

The summary line carries the FULL per-query map (r13): the driver's
per-query/scaling comparisons read the captured stdout tail, and the
short per-query lines scroll out of a tail-limited capture — the
summary line, printed last, always survives.

The r10 driver artifact proved why: a single giant JSON line was
tail-truncated in capture, losing the headline total and the first
~13 per-query entries. Short lines with the summary LAST mean a
tail-limited capture always keeps the total + the most recent
entries, and every number is additionally recoverable from the
committed BENCHLOCAL_r{N}.jsonl artifact.

Per-query time = full action latency (plan + execute + collect) after
a warm-up action that absorbs one-time session/JVM costs. The metric
value is the sum over headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from workhop2_etl_spark import suite
from workhop2_etl_spark.session import get_spark, load_table

suite.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries — one per operator family (kept in sync as the
#: suite grows; bench-critical, not the full correctness matrix).
HEADLINE = [
    # aggregation / sort / dedup probes
    "q1_pricing_summary",
    "a1_topk_group_count",
    "a2_count_distinct",
    "a4_dup_counts",
    "a7_key_dup_rows",
    "a8_top_entities",
    "o2_sort_limit",
    # scalar kernel + filters
    "f1_normalize_text",
    "p1_conj_filter",
    # joins (equi, fan-out argmax, fuzzy two-pass)
    "j1_impute_left_join",
    "j2_fanout_argmax_join",
    "j3_fuzzy_two_pass",
    "j4_argmax_dedupe",
    "u1_union_by_name",
    # multi-way star joins + subquery shapes
    "q3_shipping_priority",
    "q5_local_volume",
    "q18_large_orders",
    "q4_order_priority",
    "q9_product_profit",
    "q19_disjunctive_revenue",
    # LLM-pipeline extensions
    "d2_minhash_lsh_pairs",
    "d4_simhash_groups",
    # ANN: the bucketed scale paths (v2 LSH / v5 IVF) are the
    # production defaults; v1 brute force is the exact baseline; the
    # recall knobs (v6 multi-probe, v7 nprobe — recall gates in
    # tests/test_scale_ops.py) are benched so their extra cost vs the
    # non-probe siblings has round-over-round signal.
    "v1_topk_cosine_bruteforce",
    "v2_topk_cosine_lsh",
    "v5_topk_cosine_ivf",
    "v6_topk_cosine_lsh_multiprobe",
    "v7_topk_cosine_ivf_nprobe",
    "t2_quality_profile",
    "m1_image_meta",
    # event-time windows
    "st1_tumbling_counts",
    "st3_session_windows",
    "st6_interval_join",
    # event-log analytics + corpus stats (round 4)
    "e1_sessionize",
    "e3_cohort_retention",
    "t8_tfidf_top_terms",
    "x7_doc_chunks",
    # round-5 additions: iterative graph, point-in-time lookup,
    # OHLC resample, weighted median (window-heavy shapes)
    "g6_pagerank",
    "e8_scd2_lookup",
    "w4_ohlc_resample",
    "a12_weighted_median",
    # round-5b: chunk-level dup ratio (explode + digest join) and
    # last-touch attribution (per-user carry-forward window)
    "d8_chunk_dup_ratio",
    "e9_attribution",
    # round-5c: content-defined chunking (posexplode + doc window) and
    # exact MAD outliers (two order-statistic passes)
    "x11_cdc_chunks",
    "dq3_mad_outliers",
    # round-6: triangle counting — the one round-5 plan regression
    # (133 shuffles from re-executed lineage); benched so the
    # localCheckpoint + explode fix keeps wall-clock signal
    "g7_triangle_count",
    # round-6b: semantic dedup (the per-cell quadratic shape — bench
    # guards the cell-bucketing), the nearest as-of join (one sort,
    # two window frames), and the five-stage corpus pipeline (one
    # fused DAG — the number that regresses if a stage materializes)
    "d9_semantic_dedup",
    "j13_asof_nearest",
    "x17_corpus_pipeline",
    # round-8: multi-table hyperplane LSH (the banding construction —
    # recall 0.97 vs 0.069 single-table at cosine-0.8 distances;
    # benched alongside its v2/v6 siblings so the L-way signature
    # explode keeps round-over-round wall-clock signal), and the new
    # stdlib baseline-JPEG decode tier through the feature kernel
    "v8_topk_cosine_lsh_multitable",
    "m10_real_jpeg_features",
    # round-9: the persisted-index lifecycle (build → save → load →
    # probe in one entry — regresses if the save loses its single
    # (table_id, sig) repartition or the probe stops broadcasting)
    "v9_topk_lsh_persisted_index",
    "v10_topk_ivf_persisted_index",
    "v11_ivf_index_health",
    "v12_topk_ivf_int8_index",
    "v13_topk_ivf_pq",
    "st13_streaming_index_ingest",
    # round-10: lexical + hybrid retrieval. t11 prices the corpus tf/df
    # build + broadcast scoring; t12 the persisted-lexical lifecycle
    # (build → append → load → IN-list-pruned probe); v14 the PQ
    # candidate stage + exact rescore; v15 the two-arm fusion (regresses
    # if either arm stops broadcasting its query side)
    "t11_bm25_topk",
    "t12_bm25_persisted_index",
    # round-11: the max_df-pruned probe (bigram index build + WAND-
    # style candidate-bounded scoring — regresses if the candidate
    # semi-join stops broadcasting or the rare-slice IN-list stops
    # pruning the posting scan), and the deletion lifecycles (signed
    # lexical partials / postings tombstones — regress if the
    # tombstone anti-join stops broadcasting)
    "t13_bm25_pruned_probe",
    "t14_bm25_index_delete",
    "v18_topk_ivf_index_delete",
    # round-11 late: two-pass PRF (prices the second corpus scoring
    # pass) and the CombSUM weighted fusion (the RRF sibling)
    "t15_bm25_prf",
    "v19_hybrid_weighted",
    "st14_streaming_lexical_ingest",
    "v14_topk_ivf_pq_refine",
    "v15_hybrid_rrf",
    "v16_hybrid_persisted_rrf",
    "v17_topk_truncated_refine",
    # round-12: PRF against the persisted artifact (t15's 100 TB
    # shape — regresses if pass 2 stops reusing the IN-list-pruned
    # artifact scans) and the full stream-ingest ∘ delete lifecycle
    # (regresses if the marker-gated loader stops falling back to the
    # plain directory scan when nothing is hidden)
    "t16_bm25_prf_persisted",
    "st15_streaming_ingest_delete",
    # round-12 late: snapshot read at a recorded commit sequence
    # (regresses if the marker-seq gate stops short-circuiting to
    # plain directory reads on the current-state path)
    "st16_snapshot_as_of",
    # round-12 second pass: snapshot restore (one clustered rewrite of
    # the visible rows — regresses if the restore write loses its
    # single term-keyed repartition), the CDC changelog (reads ONLY
    # the tailed batches' files — regresses if it ever scans the
    # corpus dirs), and the mergeable sketches (map-side top-k /
    # grid-sized shuffles — regress if the partial aggregation stops
    # combining map-side)
    "st17_index_restore",
    "t17_index_changelog",
    "r4_kmv_distinct",
    "r5_cm_heavy_hitters",
    # round-12 second pass: linear-classifier inference over hashed
    # features (regresses if the weight join stops broadcasting or
    # the fold leaves whole-stage codegen), and the model-gated
    # corpus stage (score → gate → dedup → stats in one plan)
    "t18_hashed_linear_quality",
    "x19_model_gated_corpus",
    # grouped KMV (the per-group WindowGroupLimit top-k — regresses
    # if the beyond-k rows stop pruning map-side)
    "r6_kmv_by_group",
]


def bench_reference_pipeline(spark) -> dict[str, float]:
    """End-to-end grammy×spotify pipeline (the reference's actual
    workload) at the reference's own scale: 4,810 award rows ×
    ~114,000 track rows (SURVEY.md §1.4). Fixture generation is
    driver-side and excluded from the timing; the measured span is
    the full lazy plan — clean → impute join → fuzzy two-pass match →
    finalize — through collect.

    Each mode is collected THREE times and the BEST time is recorded:
    a single cold collect after 35+ other queries mixes JVM churn (GC
    pressure, code-cache state) into the number — r04 measured the
    same plan at 16.4s cold vs ~5.5s warm, a 3× self-disagreement
    that hid regression signal, and even warm runs show 2× spread
    across sessions (lazy localCheckpoint materialization races GC).
    Best-of-3 is the stable series; both §3.2 modes ('spec' and the
    reference-strict replay) are reported."""
    import tempfile

    import pandas as pd

    from tests.fixtures_grammy import make_grammy, make_spotify
    from workhop2_etl_spark.plans import grammy_spotify as P
    from workhop2_etl_spark.plans.schemas import GRAMMY_SCHEMA, SPOTIFY_SCHEMA

    gp = make_grammy(n=4810)
    sp = make_spotify(n_tracks=91200)  # ~1.25 rows/track → ~114k rows
    out: dict[str, float] = {}
    with tempfile.TemporaryDirectory() as tmp:
        # Stage inputs as parquet (untimed): a pandas-backed
        # LocalRelation would be inlined at every one of the plan's
        # self-references, blowing up analysis + re-conversion — and a
        # real deployment reads from storage anyway.
        g0 = spark.createDataFrame(gp.where(pd.notnull(gp), None), schema=GRAMMY_SCHEMA)
        s0 = spark.createDataFrame(sp.where(pd.notnull(sp), None), schema=SPOTIFY_SCHEMA)
        g0.write.mode("overwrite").parquet(f"{tmp}/grammy")
        s0.write.mode("overwrite").parquet(f"{tmp}/spotify")
        g = spark.read.parquet(f"{tmp}/grammy")
        s = spark.read.parquet(f"{tmp}/spotify")
        for label, mode in (
            ("pipeline_grammy_spotify", "spec"),
            ("pipeline_strict_mode", "strict"),
        ):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                rows = P.run_pipeline(g, s, mode=mode).collect()
                best = min(best, round(time.time() - t0, 3))
                assert rows
            out[label] = best
    return out


#: Pinned reference wall-clock for the CPU calibration probe (r08
#: verdict ask #5), measured WARM at idle on this box 2026-08-15
#: (round 9): best of 5 warm runs 0.217s at loadavg 0.5 (cold first
#: run is ~3.5s — pure codegen compile, which is why run() absorbs
#: one untimed probe before timing; an earlier pin of 1.87s had
#: captured part of that compile and read ~0.14 at idle — useless).
#: The probe is CONSTANT work — bit_xor of xxhash64 over 256M
#: in-memory range rows across 32 partitions, no I/O, no Python, one
#: 32-partial final agg — so its ratio vs this constant measures host
#: conditions (co-tenant load ate rounds 6-8's bench attribution),
#: not repo changes. PERF.md round notes divide per-query ratios by
#: the recorded ratio before calling anything a regression.
CALIBRATION_REF_SEC = 0.217
_CALIBRATION_EXPECT = -3314760874634033115


def bench_calibration(spark) -> float:
    """One timed run of the constant CPU probe; the checksum assert
    proves the constant workload really ran (a changed row count or
    hash seed would silently change the 'constant')."""
    def probe():
        return spark.range(0, 256_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS h"
        ).collect()

    t0 = time.time()
    rows = probe()
    dt = round(time.time() - t0, 3)
    assert rows[0].h == _CALIBRATION_EXPECT
    return dt


def _load_context() -> dict:
    """Environment attribution recorded WITH the numbers (r06 verdict
    ask #5): /proc/loadavg at start and the number of other live JVMs
    — so a uniformly-inflated bench (co-tenant load was observed
    going 0.2→43 mid-session, scaling every query ~1.5×) is
    self-attributing instead of forensically reconstructed."""
    ctx: dict = {}
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
        ctx["loadavg_1m"] = float(parts[0])
        ctx["loadavg_5m"] = float(parts[1])
        ctx["loadavg_15m"] = float(parts[2])
    except (OSError, ValueError, IndexError):
        pass
    try:
        import subprocess

        out = subprocess.run(
            ["ps", "-eo", "comm="], capture_output=True, text=True, timeout=10
        ).stdout
        # other JVMs beyond the one this bench is about to start
        ctx["concurrent_jvms"] = sum(1 for ln in out.splitlines() if ln.strip() == "java")
    except Exception:  # noqa: BLE001
        pass
    # cpu-count attribution does not depend on ps succeeding
    ctx["ncpu"] = os.cpu_count()
    return ctx


def bench_scale_guards(spark) -> dict[str, float]:
    """Two entries on the seeded 100k/8k scale fixtures (generated
    once, untimed) — per-round wall-clock signal for the kernels the
    full crossover study (tools/scale_crossover.py, PERF.md "ANN /
    dedup scale crossover (round 8)" table) proved out at 400k/128k:

    - ``xscale_brute_blas_100k``: exact top-k over 100k×64q via the
      Arrow/BLAS kernel (9.0s at 400k vs 265s for the interpreted
      expression fold — this entry regresses if the matmul path
      de-vectorizes);
    - ``xscale_neardup_lsh_8k``: banded MinHash near-dup pairs over
      8k documents (the naive all-pairs baseline already needs ~100
      minutes at this size — this entry regresses if candidate
      generation stops being a band equi-join);
    - ``xscale_ivf_assign_blas_100k``: IVF cell assignment of 100k
      vectors under 64 centroids via the Arrow/BLAS kernel (the
      interpreted expression argmin ran 290s for just 20k rows,
      PERF.md round-9 — this entry regresses if the matmul
      assignment de-vectorizes).
    """
    from pyspark.sql import functions as F

    from tools import scale_fixture as FX
    from workhop2_etl_spark.operators.dedup_text import near_dup_pairs
    from workhop2_etl_spark.operators.similarity import (
        ivf_assign_blas,
        topk_cosine_bruteforce_blas,
    )

    out: dict[str, float] = {}
    emb = spark.read.parquet(FX.ensure_embeddings(100_000, 64))
    queries = emb.filter(F.col("vec_id") < 64)
    t0 = time.time()
    rows = topk_cosine_bruteforce_blas(emb, queries, k=5).collect()
    out["xscale_brute_blas_100k"] = round(time.time() - t0, 3)
    assert rows

    docs = spark.read.parquet(FX.ensure_documents(8_000))
    t0 = time.time()
    rows = near_dup_pairs(docs, threshold=0.7).select("id_a", "id_b").collect()
    out["xscale_neardup_lsh_8k"] = round(time.time() - t0, 3)
    assert rows

    cents = [
        (i, [float((i * 31 + d * 7) % 13) - 6.0 for d in range(64)])
        for i in range(64)
    ]
    t0 = time.time()
    n = ivf_assign_blas(emb, cents).groupBy("centroid_id").count().count()
    out["xscale_ivf_assign_blas_100k"] = round(time.time() - t0, 3)
    assert n >= 1
    return out


def main() -> None:
    load_ctx = _load_context()
    spark = get_spark("bench")
    # Warm-up: one trivial action absorbs JVM startup / first-stage
    # costs, and one pass over the largest fact absorbs first-touch
    # I/O (footer reads, page cache) — so the first measured query
    # reports query cost, not session cost.
    load_table(spark, SF_DIR, "region").count()
    load_table(spark, SF_DIR, "lineitem").count()
    bench_calibration(spark)  # untimed: absorbs the probe's codegen compile
    cal_start = bench_calibration(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}

    def emit(obj: dict) -> None:
        # one short line per record, flushed immediately: a
        # tail-limited capture keeps the most recent lines and the
        # summary (printed last) instead of truncating one giant line
        print(json.dumps(obj), flush=True)

    missing = [n for n in HEADLINE if n not in suite.QUERIES]
    if missing:
        # a silently skipped entry deflates the total and reads as a
        # phantom round-over-round speedup
        raise KeyError(f"HEADLINE names not in the registry: {missing}")
    for name in HEADLINE:
        fn = suite.QUERIES[name]
        t0 = time.time()
        rows = fn(spark, SF_DIR).collect()
        times[name] = round(time.time() - t0, 3)
        assert rows is not None
        emit({"q": name, "sec": times[name]})
    for name, sec in bench_reference_pipeline(spark).items():
        times[name] = sec
        emit({"q": name, "sec": sec})
    canaries = bench_scale_guards(spark)
    for name, sec in canaries.items():
        times[name] = sec
        emit({"q": name, "sec": sec})
    # calibration entry: timed at the START of the measured section
    # (right after warm-up) and again here at the END; the bench
    # entry is the start sample, the end sample and the mean ratio
    # land in the summary's load_context for PERF.md's normalization
    cal_end = bench_calibration(spark)
    times["xcal_cpu_probe"] = cal_start
    emit({"q": "xcal_cpu_probe", "sec": cal_start})
    total = round(sum(times.values()), 3)
    load_ctx["loadavg_1m_end"] = _load_context().get("loadavg_1m")
    load_ctx["calibration_sec_start"] = cal_start
    load_ctx["calibration_sec_end"] = cal_end
    load_ctx["calibration_ref_sec"] = CALIBRATION_REF_SEC
    cal_ratio = round((cal_start + cal_end) / 2 / CALIBRATION_REF_SEC, 3)
    load_ctx["calibration_ratio"] = cal_ratio
    # canary attribution rows (r10 verdict ask #6): raw + ratio-
    # normalized, so a loaded run's canary moves are self-attributing
    for name, sec in canaries.items():
        emit({
            "canary": name,
            "raw_sec": sec,
            "norm_sec": round(sec / cal_ratio, 3) if cal_ratio > 0 else sec,
            "cal_ratio": cal_ratio,
        })
    emit(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            # full per-query map ON the summary line (r13, additions
            # only — nothing removed or renamed): the r12 driver
            # could not build its PERF per_query/scaling tables
            # because only the stdout tail survived capture and the
            # per-query lines scrolled off; the summary line is
            # printed LAST, so a tail-limited capture keeps it — and
            # with it every per-query number. ~4 KB at 84 entries,
            # far under the r10 truncation sizes.
            "queries": times,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(times),
            "load_context": load_ctx,
        }
    )


if __name__ == "__main__":
    main()
