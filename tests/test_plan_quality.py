"""Physical-plan regression guards.

Correctness tests prove the values; these prove the *plan shape* the
engine is designed around — the properties that decide whether a
query survives a 100× scale-up: filters reaching the parquet scan,
column pruning in ReadSchema, broadcast where a side is bounded,
top-k planned as TakeOrderedAndProject (not a global sort), and no
Python (BatchEvalPython) in expression-only pipelines.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from workhop2_etl_spark import suite
from workhop2_etl_spark.session import load_table

from tests.conftest import SF_DIR

suite.load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = suite.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan[:2000]


def test_column_pruning_in_read_schema(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan_of(df))
    assert m, "no ReadSchema in plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_topk_plans_take_ordered(spark):
    df = suite.QUERIES["o2_sort_limit"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_impute_join_broadcasts_dim(spark):
    df = suite.QUERIES["j1_impute_left_join"](spark, SF_DIR)
    assert "BroadcastHashJoin" in plan_of(df)


def test_fuzzy_join_broadcasts_theta_arm(spark):
    df = suite.QUERIES["j3_fuzzy_two_pass"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan
    # the argmax is an aggregate (partial+final), never a window over
    # the join product
    assert "partial_min" in plan
    assert "Window" not in plan


def test_no_python_in_expression_pipelines(spark):
    for name in ("f1_normalize_text", "t2_quality_profile", "d2_minhash_lsh_pairs",
                 "v1_topk_cosine_bruteforce", "st1_tumbling_counts"):
        plan = plan_of(suite.QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF unnecessarily"


def test_multimodal_uses_arrow_batches(spark):
    # the one place Python IS expected: the media decode stage, which
    # must be Arrow-batched mapInPandas, not row-at-a-time.
    plan = plan_of(suite.QUERIES["m1_image_meta"](spark, SF_DIR))
    assert "MapInPandas" in plan


def test_whole_stage_codegen_covers_agg(spark):
    df = suite.QUERIES["a1_topk_group_count"](spark, SF_DIR)
    df.collect()  # AQE shows codegen spans only in the final (executed) plan
    plan = plan_of(df)
    # codegen stages appear as "*(n)" markers in the executed plan —
    # both the partial and final hash aggregates must be inside one.
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:1500]


def test_star_q3_takeordered_and_pushdown(spark):
    plan = plan_of(suite.QUERIES["q3_shipping_priority"](spark, SF_DIR))
    # top-10 over the join must not global-sort the join product
    assert "TakeOrderedAndProject" in plan
    # each date filter reaches its own scan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_star_q5_broadcasts_nation_region(spark):
    plan = plan_of(suite.QUERIES["q5_local_volume"](spark, SF_DIR))
    # the 5-nation dim must broadcast — the fact side never shuffles
    # by nationkey
    assert "BroadcastHashJoin" in plan


def test_q18_having_aggregates_before_join(spark):
    plan = plan_of(suite.QUERIES["q18_large_orders"](spark, SF_DIR))
    # the quantity rollup + HAVING must run below the joins so the
    # join sees one row per surviving order, not raw lineitem
    agg = plan.index("HashAggregate")
    join = plan.index("Join")
    assert "functions=[sum(l_quantity" in plan and agg > join, (
        "expected the lineitem aggregate deeper in the tree than the joins"
    )


def test_star2_broadcasts_and_pushdown(spark):
    # q7: both nation-tagged sides broadcast; the shipdate range
    # reaches the lineitem scan.
    plan = plan_of(suite.QUERIES["q7_nation_volume"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    # q19: the disjunction evaluates after a broadcast part join —
    # the fact table must not shuffle at all before the final 1-row agg.
    plan19 = plan_of(suite.QUERIES["q19_disjunctive_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan19
    assert "SortMergeJoin" not in plan19


def test_star2_topk_and_aggregate_argmin(spark):
    # q2: limit-20 over the argmin result plans as TakeOrdered, and
    # the per-part argmin is an aggregate, not a window over offers.
    plan = plan_of(suite.QUERIES["q2_best_value_supplier"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # q21: unique-latest is aggregates + re-join, never a window over
    # the raw lineitem join product.
    plan21 = plan_of(suite.QUERIES["q21_waiting_supplier"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan21
    assert "Window" not in plan21


def test_q17_correlated_avg_is_aggregate_join(spark):
    # the correlated scalar subquery must become aggregate + equi-join
    # (one pass over lineitem for the averages), not a per-row
    # subquery execution.
    plan = plan_of(suite.QUERIES["q17_small_qty_revenue"](spark, SF_DIR))
    assert "partial_avg" in plan
    assert "Window" not in plan


def test_lsh_signature_join_is_hash_join(spark):
    # the multi-probe LSH search must stay a signature equi-join:
    # Catalyst extracts csig == qsig into a BroadcastHashJoin. The two
    # BroadcastNestedLoopJoins in the plan are the 1-row hyperplane
    # relations (bounded build side by construction) — the assertion
    # is that no unbounded cartesian/NLJ appears for the search join.
    plan = plan_of(suite.QUERIES["v6_topk_cosine_lsh_multiprobe"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ivf_nprobe_search_is_hash_join(spark):
    # v7 (nprobe=2): probe-cell explosion happens on the broadcast
    # query side; the search must remain a centroid equi-join
    # (BroadcastHashJoin), never a cartesian — same guard as LSH
    # multi-probe. The BroadcastNestedLoopJoins in the plan are the
    # 1-row centroid relations (bounded build side by construction).
    plan = plan_of(suite.QUERIES["v7_topk_cosine_ivf_nprobe"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sequence_pack_window_sharded(spark):
    # x6: the running-sum window must partition by (lang, shard), not
    # lang alone — `lang` has a handful of values, so a lang-only
    # window serializes the dominant language into ONE task at scale.
    # The exchange feeding the Window must hash-partition on BOTH keys.
    plan = plan_of(suite.QUERIES["x6_sequence_pack"](spark, SF_DIR))
    assert re.search(r"hashpartitioning\(lang#\d+[^)]*shard#\d+", plan), (
        "pack window exchange is not keyed by (lang, shard):\n" + plan[:2000]
    )


def test_event_analytics_window_keys_and_no_python(spark):
    # e1/e5: the per-user windows must hash-partition on user_id (the
    # high-cardinality entity key — parallelism scales with users);
    # everything stays JVM-side (no BatchEvalPython).
    for name in ("e1_sessionize", "e5_scd2_runs"):
        plan = plan_of(suite.QUERIES[name](spark, SF_DIR))
        assert re.search(r"hashpartitioning\(user_id#\d+", plan), name
        assert "BatchEvalPython" not in plan, name


def test_funnel_is_agg_join_chain(spark):
    # e2: filter→min-agg→equi-join per step — no windows, no
    # cartesian; each stage's cardinality is bounded by distinct
    # users.
    plan = plan_of(suite.QUERIES["e2_funnel"](spark, SF_DIR))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_tfidf_corpus_stats_join_shape(spark):
    # t8: the document-frequency relation joins back on the term key
    # as an equi-join; the only nested-loop join is the 1-row
    # n_docs scalar (bounded build side by construction).
    plan = plan_of(suite.QUERIES["t8_tfidf_top_terms"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin) \[term", plan)


def test_doc_chunking_is_shuffle_free(spark):
    # x7: explode(sequence) fans out inside the stage — the only
    # exchange allowed is the final deterministic output sort.
    plan = plan_of(suite.QUERIES["x7_doc_chunks"](spark, SF_DIR))
    exchanges = re.findall(r"Exchange \w+", plan)
    assert len(exchanges) <= 1, exchanges
    assert all("rangepartitioning" in e for e in exchanges), exchanges
    assert "BatchEvalPython" not in plan


def test_round5_maintenance_query_plans(spark):
    """Plan shapes of the round-5 additions: the Morton-key query's
    only non-equi join is the 1-row broadcast stats relation (never a
    CartesianProduct); bigram counting is narrow until the count agg
    and plans its top-k as TakeOrdered; CDC apply-changes keeps the
    anti join broadcast; salted aggregation is two hash-agg phases
    with no extra exchange beyond the salt shuffle."""
    z1 = plan_of(suite.QUERIES["z1_zorder_key"](spark, SF_DIR))
    assert "CartesianProduct" not in z1
    assert "BroadcastNestedLoopJoin" in z1  # the 1-row stats join
    assert "BatchEvalPython" not in z1

    t10 = plan_of(suite.QUERIES["t10_bigram_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in t10
    assert "BatchEvalPython" not in t10
    # one exchange for the bigram count — generate→explode is narrow
    assert t10.count("Exchange") == 1, t10[:2000]

    u5 = plan_of(suite.QUERIES["u5_apply_changes"](spark, SF_DIR))
    assert "BroadcastHashJoin" in u5 and "LeftAnti" in u5

    k1 = plan_of(suite.QUERIES["k1_salted_agg"](spark, SF_DIR))
    assert "BatchEvalPython" not in k1
    # phase-1 agg on (keys, salt), phase-2 on keys: two hash-agg
    # pairs, and the final agg's grouping no longer carries the salt
    assert k1.count("HashAggregate") >= 4
    # executedPlan prints top-down: the first HashAggregate line is
    # the FINAL merge phase — its grouping keys must not carry salt
    final_agg = next(l for l in k1.splitlines() if "HashAggregate" in l)
    assert "__w2e_salt" not in final_agg, final_agg


def test_rollup_refresh_reads_only_affected_partitions(spark, tmp_path):
    """The incremental-refresh read path must partition-prune to the
    delta's days: the base-side scan plan carries a day IN-filter —
    at 100 TB this is the difference between rescanning the rollup
    and touching |delta days| directories."""
    from workhop2_etl_spark.operators.incremental import rollup_events_daily
    from workhop2_etl_spark.session import load_table as _lt

    ev = _lt(spark, SF_DIR, "events")
    table = str(tmp_path / "daily")
    rollup_events_daily(ev).write.partitionBy("day").parquet(table)

    base = spark.read.parquet(table).filter(
        F.col("day").isin(["2024-01-14", "2024-01-15"])
    )
    plan = plan_of(base)
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "day" in m.group(1), plan[:1500]


def test_round5_analytics_query_plans(spark):
    """e8's point-in-time lookup must be an equi-join with the
    interval as residual (never a nested-loop over user histories);
    w4/j10 are single-window/agg shapes with no join at all; g6's
    iterative joins must stay equi-joins (no cartesian) and fully
    JVM-side."""
    e8 = plan_of(suite.QUERIES["e8_scd2_lookup"](spark, SF_DIR))
    assert "BroadcastHashJoin" in e8 or "SortMergeJoin" in e8
    assert "BroadcastNestedLoopJoin" not in e8 and "CartesianProduct" not in e8

    for name in ("w4_ohlc_resample", "j10_asof_forward_tolerance"):
        p = plan_of(suite.QUERIES[name](spark, SF_DIR))
        assert "Join" not in p, name  # pure window/agg shapes
        assert "BatchEvalPython" not in p, name

    g6 = plan_of(suite.QUERIES["g6_pagerank"](spark, SF_DIR))
    assert "CartesianProduct" not in g6 and "BroadcastNestedLoopJoin" not in g6
    assert "BatchEvalPython" not in g6


def test_group_sample_two_level_topk_sharded(spark):
    """x10: the heavy rank must run on (lang, shard) — the first
    Window's exchange hash-partitions on BOTH keys; only the tiny
    shard-winner re-rank partitions on lang alone."""
    plan = plan_of(suite.QUERIES["x10_group_sample"](spark, SF_DIR))
    m = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("lang" in g and "shard" in g for g in m), m


def test_salted_join_shuffles_on_salt_key(spark):
    """k2 with broadcast disabled: the whole point of the salt is the
    shuffle key — both exchanges must hash-partition on
    (event_type, salt), never event_type alone."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(suite.QUERIES["k2_salted_skew_join"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    groups = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    join_keys = [g for g in groups if "event_type" in g and "__w2e_salt" in g]
    assert len(join_keys) >= 2, groups


def test_triangle_count_plan_all_equi_joins(spark):
    """g7: wedge generation and closure are equi-joins on node/edge
    keys — no cartesian, no nested loop, fully JVM-side."""
    plan = plan_of(suite.QUERIES["g7_triangle_count"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_chunk_dup_plan_is_digest_join(spark):
    """d8: chunking is the narrow explode(sequence) kernel; the only
    joins are equi-joins on the chunk key (freq back-join) — never
    doc × doc."""
    plan = plan_of(suite.QUERIES["d8_chunk_dup_ratio"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_rolling_window_queries_are_single_window_chains(spark):
    """w6/dq2/e9: one per-key window + hash aggs, no joins, no
    Python; e9's carry-forward window must key on user_id (high
    cardinality), w6/dq2's on event_type."""
    for name, key in (
        ("w6_ewma", "event_type"),
        ("dq2_rolling_outliers", "event_type"),
        ("e9_attribution", "user_id"),
    ):
        plan = plan_of(suite.QUERIES[name](spark, SF_DIR))
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "Window" in plan, name
        groups = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any(key in g for g in groups), (name, groups)


def test_registry_wide_no_row_python_no_cartesian(spark):
    """Global plan invariant over EVERY registered query: no
    BatchEvalPython (row-at-a-time Python — the 10-100x slow path;
    Arrow mapInPandas is the sanctioned escape hatch and shows as
    ArrowEvalPython/MapInPandas), and no CartesianProduct (an
    unbounded |L|x|R| fan-out; every 1-row broadcast scalar join
    plans as BroadcastNestedLoopJoin with a bounded build side
    instead). Catches a regression in ANY query the per-query guards
    don't cover — analysis only, nothing executes."""
    offenders = {}
    for name, fn in suite.QUERIES.items():
        plan = plan_of(fn(spark, SF_DIR))
        flags = [
            f
            for f in ("BatchEvalPython", "CartesianProduct")
            if f in plan
        ]
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def test_cdc_chunking_plan_single_doc_shuffle(spark):
    """x11: posexplode is narrow; the running boundary count is ONE
    window keyed on doc_id, and the per-(doc, chunk) hash agg rides
    the same key prefix. No Python, no joins."""
    plan = plan_of(suite.QUERIES["x11_cdc_chunks"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "Window" in plan
    groups = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("doc_id" in g for g in groups), groups


def test_parquet_aggregate_pushdown_answers_from_footers(spark):
    """MIN/MAX/COUNT over a bare parquet scan can be answered from
    row-group footer statistics without decoding a single row — the
    DSv2 reader's aggregate pushdown (spark.sql.parquet.
    aggregatePushdown; note the lowercase 'd'). At 100 TB this turns
    a full-table stats probe into a footer sweep. Values must equal
    the row-decoding path exactly."""
    import re

    from workhop2_etl_spark.session import load_table

    from tests.conftest import SF_DIR

    want = load_table(spark, SF_DIR, "orders").agg(
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]

    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        agg = df.agg(
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PushedAggregation: \[([^\]]+)\]", plan)
        assert m and "MIN" in m.group(1) and "COUNT" in m.group(1), plan[:1500]
        got = agg.collect()[0]
        assert (got.lo, got.hi, got.n) == (want.lo, want.hi, want.n)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
        spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)


def test_persisted_index_probe_plan_shape(spark):
    """The loaded-index probe must be a BroadcastHashJoin on
    (table_id, sig) with the |Q|-sized query side broadcast — never a
    shuffle of the corpus-sized index relation, never a cartesian —
    and the index scan must read only the probe's five columns."""
    from workhop2_etl_spark.operators import index_store as IDX

    emb = load_table(spark, SF_DIR, "embeddings")
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(), f"workhop2_idx_{os.getpid()}", "planshape"
    )
    IDX.save_lsh_index(emb, path, dim=64, num_planes=6, num_tables=4,
                       mode="overwrite")
    index, meta = IDX.load_lsh_index(spark, path)
    probe = IDX.probe_lsh_index(
        index, meta, emb.filter(F.col("vec_id") % 100 == 0), k=3
    )
    plan = plan_of(probe)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the nested array<double> defeats the scalar-schema regex used
    # above; line-wise capture across every scan in the plan instead
    schemas = " ".join(re.findall(r"ReadSchema: (.*)", plan))
    assert schemas, "no ReadSchema in plan"
    for col in ("id:", "vec:", "norm:", "table_id:", "sig:"):
        assert col in schemas, (col, schemas)


def test_persisted_ivf_probe_plan_shape(spark):
    """The loaded-IVF probe must be a BroadcastHashJoin on
    centroid_id with the |Q|-sized assigned-query side broadcast —
    the corpus-sized postings relation never shuffles, never crosses
    — and the postings scan reads only the probe's four columns."""
    import os
    import tempfile

    from workhop2_etl_spark.operators import index_store as IDX
    from workhop2_etl_spark.operators import similarity as SIM

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = SIM.fit_centroids(emb, n_centroids=4, seed=7, max_iter=3)
    path = os.path.join(
        tempfile.gettempdir(), f"workhop2_idx_{os.getpid()}", "ivf_planshape"
    )
    IDX.save_ivf_index(emb, path, cents, dim=64, mode="overwrite")
    postings, cs, meta = IDX.load_ivf_index(spark, path)
    probe = IDX.probe_ivf_index(
        postings, cs, meta, emb.filter(F.col("vec_id") % 100 == 0), k=3, nprobe=2
    )
    plan = plan_of(probe)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    schemas = " ".join(re.findall(r"ReadSchema: (.*)", plan))
    assert schemas, "no ReadSchema in plan"
    for col in ("id:", "vec:", "norm:", "centroid_id:"):
        assert col in schemas, (col, schemas)


def test_persisted_lexical_probe_plan_shape(spark):
    """The loaded-BM25 probe must push the query vocabulary as an
    In(term, ...) filter into the term-clustered tf scan (the probe
    reads a vocabulary-sized slice of a corpus-sized artifact), and
    every scoring join must broadcast the query-sized side — never a
    shuffle of the posting relation. On the max_df-PRUNED path the df
    slice and the one-row stats are driver-materialized since r13
    (both bounded by the probe's own max_terms contract; the pruned
    plan referenced them 3×/2×), so there they appear as ExistingRDD
    scans — the eager collect pushes the same In-list, pinned below
    on the loader's relation directly."""
    import os
    import tempfile

    from workhop2_etl_spark.operators import retrieval as RET

    docs = load_table(spark, SF_DIR, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    corpus_tokens = docs.select("doc_id", toks.alias("toks"))
    qt = (
        corpus_tokens.filter(F.col("doc_id") % 89 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("toks", 1, 8)).alias("term"),
        )
        .distinct()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"workhop2_idx_{os.getpid()}", "lex_planshape"
    )
    RET.save_lexical_index(corpus_tokens, path, mode="overwrite")
    tf, df, stats, meta = RET.load_lexical_index(spark, path)
    probe = RET.probe_lexical_index(tf, df, stats, meta, qt, k=10)
    plan = plan_of(probe)
    assert len(re.findall(r"PushedFilters: \[In\(term", plan)) >= 2, plan[:2000]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the pruned path's eager df-slice collect pushes the same
    # vocabulary IN-list — pinned on the loader's relation directly
    vocab = [r.term for r in qt.select("term").distinct().collect()]
    dplan = plan_of(df.filter(F.col("term").isin(vocab)))
    assert len(re.findall(r"PushedFilters: \[In\(term", dplan)) >= 1, dplan[:2000]

    # the max_df-PRUNED probe (r11): same contract, plus the
    # candidate restriction must arrive as broadcasts — the posting
    # relation never shuffles on its own keys, and the term IN-list
    # reaches BOTH tf slices (the candidate-generation slice and the
    # scored slice; the rare/head split reads the driver-materialized
    # df, so df scans no longer appear in the final plan at all)
    pruned = RET.probe_lexical_index(
        tf, df, stats, meta, qt, k=10, max_df=100
    )
    pplan = plan_of(pruned)
    assert len(re.findall(r"PushedFilters: \[In\(term", pplan)) >= 2, pplan[:2000]
    assert "ExistingRDD" in pplan  # driver-materialized df/stats (r13)
    assert "BroadcastHashJoin" in pplan
    assert "SortMergeJoin" not in pplan
    assert "CartesianProduct" not in pplan
    assert "BatchEvalPython" not in pplan


def test_deleted_index_loader_plan_shape(spark):
    """An index with pending deletes must anti-join its tombstones as
    a BROADCAST (the tombstone set between compactions is small by
    contract) — never a sort-merge shuffle of the corpus-sized
    postings — and the probe's pruning must survive the anti-join
    (the lexical term IN-list still reaches the tf scan)."""
    import os
    import tempfile

    from workhop2_etl_spark.operators import index_store as IDX
    from workhop2_etl_spark.operators import retrieval as RET

    docs = load_table(spark, SF_DIR, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    corpus_tokens = docs.select("doc_id", toks.alias("toks"))
    qt = (
        corpus_tokens.filter((F.col("doc_id") % 89 == 0) & (F.col("doc_id") % 5 != 0))
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("toks", 1, 8)).alias("term"),
        )
        .distinct()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"workhop2_idx_{os.getpid()}", "lex_delplan"
    )
    RET.save_lexical_index(corpus_tokens, path, mode="overwrite",
                           num_partitions=4)
    IDX.delete_from_index(
        spark, path, docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    )
    tf, df, stats, meta = RET.load_lexical_index(spark, path)
    plan = plan_of(RET.probe_lexical_index(tf, df, stats, meta, qt, k=10))
    assert "BroadcastHashJoin" in plan
    assert re.search(r"Broadcast.*LeftAnti|LeftAnti.*Broadcast", plan), plan[:2000]
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"PushedFilters: \[In\(term", plan)) >= 2


@pytest.mark.parametrize(
    "qname", ["v15_hybrid_rrf", "v16_hybrid_persisted_rrf", "v19_hybrid_weighted"]
)
def test_fusion_queries_have_no_sortmergejoin(spark, qname, tmp_path):
    """r12 (verdict ask #4): the fusion operators align their two
    arms with a union + hash aggregate (not an unbroadcastable
    full-outer join) and broadcast the per-query extrema relation, so
    NO fusion query plans a SortMergeJoin — the arms are |Q|·k, and
    every join in the fused plan must be broadcast-hash or gone."""
    plan = plan_of(suite.QUERIES[qname](spark, SF_DIR))
    assert "SortMergeJoin" not in plan, qname
    assert "CartesianProduct" not in plan, qname


def test_bm25_score_agg_shape_split(spark):
    """r13 optimization: the BM25 scoring core has two bit-identical
    physical shapes, chosen per input layout (interleaved A/B in
    _bm25_score's docstring): the IN-SESSION paths (bm25_topk, PRF)
    use the window aggregate over term-sorted rows — no collect_list
    ObjectHashAggregate, one query_id exchange serving scoring AND
    ranking — while ARTIFACT PROBES keep the fold, whose per-group
    tiny sorts beat a global term sort on scan-partitioned
    vocab-bounded slices. Both must plan the top-k rank filter as a
    WindowGroupLimit pushdown."""
    import os
    import tempfile

    from workhop2_etl_spark.operators import retrieval as RET

    docs = load_table(spark, SF_DIR, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    corpus_tokens = docs.select("doc_id", toks.alias("toks"))
    qt = (
        corpus_tokens.filter(F.col("doc_id") % 89 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("toks", 1, 8)).alias("term"),
        )
        .distinct()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"workhop2_idx_{os.getpid()}", "lex_winshape"
    )
    RET.save_lexical_index(corpus_tokens, path, mode="overwrite")
    tf, df, stats, meta = RET.load_lexical_index(spark, path)
    plan = plan_of(RET.probe_lexical_index(tf, df, stats, meta, qt, k=10))
    assert "ObjectHashAggregate" in plan, plan[:2000]  # fold, by design
    assert "WindowGroupLimit" in plan
    # in-session ranking: the window shape — no object aggregate
    lex = RET.bm25_topk(corpus_tokens, qt, k=10)
    lplan = plan_of(lex)
    assert "ObjectHashAggregate" not in lplan, lplan[:2000]
    assert "WindowGroupLimit" in lplan


def test_ranked_topk_operators_push_window_group_limit(spark):
    """r12 verdict ask #6 (audited r13): every ranked top-k path —
    the fusers, the IVF probe, the exact-rescore refine — filters on
    a row_number over (score desc, id), which Spark must plan with a
    WindowGroupLimit pushdown (rows beyond k prune map-side before
    the final per-group sort). A shape change that breaks the
    pushdown (e.g. an expression wrapped around the rank column)
    silently turns top-k into a full per-group sort at every scale."""
    from workhop2_etl_spark.operators import retrieval as RET
    from workhop2_etl_spark.operators import similarity as SIM

    arm = spark.createDataFrame(
        [(1, d, r + 1, float(30 - r)) for d in (10, 20) for r in range(3)],
        "query_id int, doc_id int, rank int, score double",
    )
    assert "WindowGroupLimit" in plan_of(RET.rrf_fuse(arm, arm, k=2))
    assert "WindowGroupLimit" in plan_of(RET.weighted_fuse(arm, arm, k=2))

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0], 0) for i in range(6)],
        "vec_id int, embedding array<double>, centroid_id int",
    )
    c = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cvec"),
        "centroid_id",
    ).withColumn("__cn", SIM.l2_norm(F.col("__cvec")))
    q = vecs.limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qvec"),
        "centroid_id",
    ).withColumn("__qn", SIM.l2_norm(F.col("__qvec")))
    assert "WindowGroupLimit" in plan_of(
        SIM._ivf_probe(c, q, k=2, round_digits=6)
    )
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3)], "query_id int, neighbor_id int"
    )
    assert "WindowGroupLimit" in plan_of(
        SIM._exact_rescore_candidates(
            vecs.select("vec_id", "embedding"),
            vecs.limit(2).select("vec_id", "embedding"),
            cand, 2, "vec_id", "embedding", 6,
        )
    )


def test_prf_persisted_second_pass_pushes_vocab(spark):
    """r12 (verdict ask #3): probe_lexical_index_prf's SECOND pass is
    a probe of the persisted artifact with the EXPANDED vocabulary —
    its plan must show the term IN-list pushed to the tf/df scans
    (the corpus tf aggregation is never re-run), stay broadcast-hash
    everywhere, and keep Python out. The harvest's feedback-doc join
    must also be a broadcast."""
    import os
    import tempfile

    from workhop2_etl_spark.operators import retrieval as RET

    docs = load_table(spark, SF_DIR, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    corpus_tokens = docs.select("doc_id", toks.alias("toks"))
    qt = (
        corpus_tokens.filter(F.col("doc_id") % 89 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("toks", 1, 8)).alias("term"),
        )
        .distinct()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"workhop2_idx_{os.getpid()}", "lex_prfplan"
    )
    RET.save_lexical_index(corpus_tokens, path, mode="overwrite")
    tf, df, stats, meta = RET.load_lexical_index(spark, path)
    out = RET.probe_lexical_index_prf(
        tf, df, stats, meta, qt, k=10, n_feedback=3, m_expand=2
    )
    plan = plan_of(out)
    # pass-2 probe: expanded vocab IN-list reaches both artifact scans
    assert len(re.findall(r"PushedFilters: \[In\(term", plan)) >= 2, plan[:2000]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # no full-corpus tf re-aggregation: every Exchange in the final
    # plan is either broadcast or keyed on the query-bounded
    # (query_id[, doc_id]) relations — the artifact's (doc_id, term)
    # tf relation is scanned, never re-shuffled on its own keys
    assert "HashAggregate(keys=[doc_id" not in plan


def test_sketch_query_plans(spark):
    """r4/r5 sketch plan shapes: the KMV top-k must be a
    TakeOrderedAndProject (map-side per-partition k smallest — never
    a global sort of the hash space), and the count-min grid must
    partial-aggregate map-side (the shuffle carries depth×width
    cells, not the token stream). The CM estimate joins a BROADCAST
    grid."""
    plan4 = plan_of(suite.QUERIES["r4_kmv_distinct"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan4
    assert "CartesianProduct" not in plan4

    plan5 = plan_of(suite.QUERIES["r5_cm_heavy_hitters"](spark, SF_DIR))
    assert "partial_sum" in plan5 or "partial_count" in plan5, plan5[:1500]
    assert "BroadcastHashJoin" in plan5
    assert "SortMergeJoin" not in plan5


def test_index_changes_plan_reads_only_batch_files(spark, tmp_path):
    """The changelog must never scan the corpus-sized base files: its
    plan's parquet scans list ONLY the tailed batches' own files
    (stream-/delete- prefixed), and there are no joins at all."""
    from workhop2_etl_spark.operators import index_store as IDX
    from workhop2_etl_spark.operators import retrieval as RET
    from workhop2_etl_spark.streaming import index_stream as IS

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 200)
    corpus = docs.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
        ).alias("toks"),
    )
    path = str(tmp_path / "lex")
    RET.save_lexical_index(
        corpus.filter(F.col("doc_id") % 2 == 0), path,
        mode="overwrite", num_partitions=2,
    )
    IS.ingest_epoch(spark, corpus.filter(F.col("doc_id") % 2 == 1), 0, path,
                    vec_col="toks")
    IDX.delete_from_index(
        spark, path, corpus.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    )
    plan = plan_of(IDX.index_changes(spark, path))
    assert "Join" not in plan
    # every file path the scans enumerate is a batch-owned file
    locations = re.findall(r"Location: InMemoryFileIndex[^\]]*\[([^\]]*)", plan)
    assert locations, plan[:1500]
    for loc in locations:
        for piece in loc.split(","):
            name = piece.strip().rstrip("/").rsplit("/", 1)[-1]
            if name:
                assert name.startswith(("stream-", "delete-")), piece


def test_classifier_query_plans(spark):
    """t18/x19: the weight relation must broadcast into the scoring
    join (4096 rows — a SortMergeJoin here would shuffle the feature
    stream), and no row-Python anywhere."""
    for name in ("t18_hashed_linear_quality", "x19_model_gated_corpus"):
        plan = plan_of(suite.QUERIES[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "BatchEvalPython" not in plan, name
