"""Join / dedup / union queries — SURVEY.md §2.4, §2.7.

Same operator shapes as the reference's merges and its nested-loop
fuzzy match, over the driver testdata. NULLS LAST is spelled
explicitly in every oracle ORDER BY inside windows — Spark's
desc() is nulls-last, DuckDB's DESC defaults nulls-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.functions import clean
from workhop2_etl_spark.operators.dedupe import argmax_dedupe, key_duplicate_rows
from workhop2_etl_spark.operators.joins import fuzzy_enrich, impute_left_join
from workhop2_etl_spark.operators.union_ops import union_by_name
from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.suite import query


# ---------------------------------------------------------------------------
# J1: keyed left join + coalesce write-back (album-imputation shape,
# reference :128-136). Customers with a blanked-out segment get it imputed
# from their nation's region name; untouched rows keep their value.
# ---------------------------------------------------------------------------
@query(
    "j1_impute_left_join",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS segment
      FROM customer
    ),
    src AS (
      SELECT n_nationkey, r_name,
             row_number() OVER (PARTITION BY n_nationkey
                                ORDER BY r_name NULLS LAST, n_name) AS rn
      FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT b.c_custkey, b.c_nationkey,
           coalesce(s.r_name, b.segment) AS segment
    FROM base b LEFT JOIN (SELECT * FROM src WHERE rn = 1) s
      ON b.c_nationkey = s.n_nationkey
    ORDER BY b.c_custkey
    """,
)
def j1_impute_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = cust.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    src = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "r_name", "n_name"
    )
    out = impute_left_join(
        base,
        src,
        on=base.c_nationkey == src.n_nationkey,
        fill={"segment": F.col("r_name")},
        pick_order=[F.asc_nulls_last("r_name"), F.asc("n_name")],
        source_key=["n_nationkey"],
    )
    return out.orderBy("c_custkey")


# ---------------------------------------------------------------------------
# J2 shape: 1:N fan-out left join resolved by explicit argmax (the
# song-imputation write-back, reference :156-168 — there last-match-wins by
# iteration order; here argmax by quantity with full tiebreak).
# ---------------------------------------------------------------------------
@query(
    "j2_fanout_argmax_join",
    oracle="""
    WITH picked AS (
      SELECT l_partkey, l_extendedprice, l_orderkey,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY l_extendedprice DESC NULLS LAST,
                                         l_orderkey, l_linenumber) AS rn
      FROM lineitem
    )
    SELECT p.p_partkey, p.p_name,
           s.l_orderkey AS best_orderkey,
           round(coalesce(s.l_extendedprice, 0.0), 2) AS best_price
    FROM part p LEFT JOIN (SELECT * FROM picked WHERE rn = 1) s
      ON p.p_partkey = s.l_partkey
    ORDER BY p.p_partkey
    """,
)
def j2_fanout_argmax_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    picked = argmax_dedupe(
        li.select("l_partkey", "l_extendedprice", "l_orderkey", "l_linenumber"),
        ["l_partkey"],
        [F.desc_nulls_last("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
    )
    return (
        part.join(picked, part.p_partkey == picked.l_partkey, "left")
        .select(
            "p_partkey",
            "p_name",
            F.col("l_orderkey").alias("best_orderkey"),
            F.round(F.coalesce(F.col("l_extendedprice"), F.lit(0.0)), 2).alias("best_price"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# J3: the two-pass fuzzy theta join — the reference's core operator
# (nested Python loop :222-250) as hash-join arm + broadcast-NLJ arm.
# Parts look for documents that contain their full name (exact arm);
# misses retry with just the name's first word (prefix fallback F8);
# best match = longest document, doc_id tiebreak; no match → NULLs.
# Output row count == part row count, exactly like the reference.
# ---------------------------------------------------------------------------
@query(
    "j3_fuzzy_two_pass",
    oracle="""
    WITH g AS (
      SELECT p_partkey, p_name, trim(split_part(p_name, ' ', 1)) AS w
      FROM part
    ),
    d AS (SELECT doc_id, text, n_chars FROM documents),
    p1 AS (
      SELECT g.p_partkey, g.p_name, g.w, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY g.p_partkey
                                ORDER BY d.n_chars DESC NULLS LAST, d.doc_id) AS rn
      FROM g LEFT JOIN d ON contains(d.text, g.p_name)
    ),
    p1best AS (SELECT * FROM p1 WHERE rn = 1),
    hit1 AS (SELECT p_partkey, p_name, doc_id, n_chars FROM p1best WHERE doc_id IS NOT NULL),
    miss1 AS (SELECT p_partkey, p_name, w FROM p1best WHERE doc_id IS NULL),
    p2 AS (
      SELECT m.p_partkey, m.p_name, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY m.p_partkey
                                ORDER BY d.n_chars DESC NULLS LAST, d.doc_id) AS rn
      FROM miss1 m LEFT JOIN d ON contains(d.text, m.w)
    ),
    hit2 AS (SELECT p_partkey, p_name, doc_id, n_chars FROM p2 WHERE rn = 1)
    SELECT * FROM hit1 UNION ALL SELECT * FROM hit2 ORDER BY p_partkey
    """,
)
def j3_fuzzy_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    docs = load_table(spark, sf_dir, "documents")
    left = part.select(
        "p_partkey",
        "p_name",
        clean.prefix_before(F.col("p_name"), " ").alias("w"),
    )
    right = docs.select("doc_id", "text", "n_chars")
    out = fuzzy_enrich(
        left,
        right,
        left_key="p_partkey",
        exact_cond=F.col("text").contains(F.col("p_name")),
        fallback_cond=F.col("text").contains(F.col("w")),
        pick_min=[-F.col("n_chars"), F.col("doc_id")],
        right_cols=["doc_id", "n_chars", "text"],
        payload_cols=["doc_id", "n_chars"],
        # conditions read only (p_name, w): probe distinct patterns
        # (64 of them), not all 20k parts.
        probe_keys=["p_name", "w"],
    )
    return out.select("p_partkey", "p_name", "doc_id", "n_chars").orderBy("p_partkey")


# ---------------------------------------------------------------------------
# J4: argmax dedup — most popular version per key with deterministic
# tiebreak (reference :216-219).
# ---------------------------------------------------------------------------
@query(
    "j4_argmax_dedupe",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC NULLS LAST,
                                         l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    ORDER BY l_orderkey
    """,
)
def j4_argmax_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = argmax_dedupe(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_orderkey"],
        [F.desc_nulls_last("l_extendedprice"), F.asc("l_linenumber")],
    )
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    ).orderBy("l_orderkey")


# ---------------------------------------------------------------------------
# A7 (as reusable operator): key-duplicate detection via count window.
# ---------------------------------------------------------------------------
@query(
    "a7_operator_key_dups",
    oracle="""
    SELECT o_custkey, n_per_key FROM (
      SELECT o_custkey, count(*) OVER (PARTITION BY o_custkey) AS n_per_key
      FROM orders
    ) WHERE n_per_key > 1
    ORDER BY o_custkey, n_per_key
    LIMIT 500
    """,
)
def a7_operator_key_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        key_duplicate_rows(orders.select("o_custkey"), ["o_custkey"])
        .orderBy("o_custkey", "n_per_key")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# U1: schema-divergent UNION ALL by name (reference :253) — the two sides
# share some columns; missing ones NULL-fill.
# ---------------------------------------------------------------------------
@query(
    "u1_union_by_name",
    oracle="""
    SELECT o_orderkey AS okey, o_orderpriority AS priority,
           round(o_totalprice, 2) AS price, NULL::VARCHAR AS status
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey AS okey, NULL AS priority, NULL::DOUBLE AS price,
           o_orderstatus AS status
    FROM orders WHERE o_orderkey % 10 = 5
    ORDER BY okey
    """,
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("priority"),
        F.round("o_totalprice", 2).alias("price"),
    )
    b = orders.filter(F.col("o_orderkey") % 10 == 5).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
    )
    return union_by_name(a, b).select("okey", "priority", "price", "status").orderBy("okey")


# ---------------------------------------------------------------------------
# J-semi/anti: EXISTS / NOT EXISTS as first-class joins (the reference
# approximates these with mask splits — P7; SURVEY §2.4 "not present").
# ---------------------------------------------------------------------------
@query(
    "j5_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "j6_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def j6_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# U2/U3: INTERSECT / EXCEPT (distinct set semantics — SURVEY §2.7
# "not present" in the reference; part of the engine surface).
# ---------------------------------------------------------------------------
@query(
    "u2_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@query(
    "u3_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract = EXCEPT DISTINCT (exceptAll is multiset difference —
    # a key present in b at all must not survive).
    return a.subtract(b).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# J7: as-of (point-in-time) join — each purchase event matched to the
# user's most recent click at-or-before it. Implemented union-and-
# carry (operators/asof.py): one shuffle, zero fan-out. DuckDB has a
# native ASOF JOIN for the oracle.
# ---------------------------------------------------------------------------
@query(
    "j7_asof_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type
      FROM events
    ),
    p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
    c AS (SELECT min(event_id) AS click_id, user_id, ts
         FROM ev WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts, c.click_id
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    # one click per (user, instant), min event_id: asof_join resolves
    # equal-timestamp right rows by union-sort order, so tied rows
    # must be collapsed upstream for a deterministic oracle compare
    # (operators/asof.py docstring contract).
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        payload=["click_id"],
    )
    return out.select("event_id", "user_id", "ts", "click_id").orderBy("event_id")


# ---------------------------------------------------------------------------
# J8: range (interval) join — click/purchase pairs of the same user
# within ±1 hour, via time-bucketing (bucket equality + residual
# filter) instead of a raw inequality join.
# ---------------------------------------------------------------------------
@query(
    "j8_range_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type
      FROM events
    ),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS pts FROM ev WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM ev WHERE event_type = 'click')
    SELECT p.purchase_id, c.click_id, p.user_id
    FROM p JOIN c ON p.user_id = c.user_id
     AND c.cts >= p.pts - INTERVAL '1 hour'
     AND c.cts <= p.pts + INTERVAL '1 hour'
    ORDER BY p.purchase_id, c.click_id
    """,
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.asof import range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("cts"),
    )
    out = range_join(
        purchases,
        clicks,
        on_key=("user_id", "c_user_id"),
        left_time="pts",
        right_time="cts",
        lower="1 hour",
        upper="1 hour",
        bucket="1 hour",
    )
    return out.select("purchase_id", "click_id", "user_id").orderBy("purchase_id", "click_id")


# ---------------------------------------------------------------------------
# U4: merge/upsert — incremental refresh as DataFrame algebra
# (operators/upsert.py). The update batch: every BUILDING-segment
# customer gets a flagged name and +1000 balance; merged result =
# untouched rows + updated rows, checked via per-nation rollup.
# ---------------------------------------------------------------------------
@query(
    "u4_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, 'upd:' || c_name AS c_name, c_nationkey,
             round(c_acctbal + 1000, 2) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    merged AS (
      SELECT * FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
      UNION ALL
      SELECT * FROM updates
    )
    SELECT c_nationkey, count(*) AS n,
           round(sum(c_acctbal), 2) AS total_bal,
           CAST(sum(CASE WHEN c_name LIKE 'upd:%' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
    FROM merged GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def u4_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.upsert import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        F.concat(F.lit("upd:"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.round(F.col("c_acctbal") + 1000, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    merged = merge_upsert(cust, updates, ["c_custkey"])
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.sum(F.when(F.col("c_name").startswith("upd:"), 1).otherwise(0)).alias("n_updated"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# u5: CDC apply-changes — MERGE with upserts AND deletes
# (operators/upsert.py::merge_apply_changes). BUILDING customers are
# updated, MACHINERY customers deleted; the result must show updated
# balances and no MACHINERY segment at all.
# ---------------------------------------------------------------------------
@query(
    "u5_apply_changes",
    oracle="""
    WITH changes AS (
      SELECT c_custkey, 'u' AS op, 'upd:' || c_name AS c_name, c_nationkey,
             round(c_acctbal + 1000, 2) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey, 'd', c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_mktsegment = 'MACHINERY'
    ), merged AS (
      SELECT * FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM changes u WHERE u.c_custkey = c.c_custkey)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM changes WHERE op = 'u'
    )
    SELECT c_mktsegment, count(*) AS n,
           round(sum(c_acctbal), 2) AS total_bal,
           CAST(sum(CASE WHEN c_name LIKE 'upd:%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated
    FROM merged GROUP BY 1 ORDER BY 1
    """,
)
def u5_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.upsert import merge_apply_changes

    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        F.lit("u").alias("op"),
        F.concat(F.lit("upd:"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.round(F.col("c_acctbal") + 1000, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    deletes = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey",
        F.lit("d").alias("op"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    merged = merge_apply_changes(cust, updates.unionByName(deletes), ["c_custkey"])
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.sum(
                F.when(F.col("c_name").startswith("upd:"), 1).otherwise(0)
            ).alias("n_updated"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# j10: FORWARD as-of join with a tolerance bound — for each click,
# the next purchase of the same user within 2 hours (NULL if none).
# Same union-and-carry plan as j7 (one shuffle, zero fan-out); the
# tolerance is applied to the carried match time, not via a join.
# ---------------------------------------------------------------------------
@query(
    "j10_asof_forward_tolerance",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
             event_type
      FROM events
    ),
    c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
    p AS (SELECT min(event_id) AS purchase_id, user_id, ts AS pts
          FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts),
    cand AS (
      SELECT c.event_id, c.user_id, c.ts, p.purchase_id,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY p.pts ASC) AS rn
      FROM c LEFT JOIN p
        ON c.user_id = p.user_id
       AND p.pts >= c.ts AND p.pts <= c.ts + INTERVAL 2 HOUR
    )
    SELECT event_id, user_id, ts, purchase_id
    FROM cand WHERE rn = 1
    ORDER BY event_id
    """,
)
def j10_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # collapse tied (user, instant) purchases to min event_id — same
    # determinism contract as j7 (and the oracle's rn would otherwise
    # be untied on p.pts alone).
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        payload=["purchase_id"],
        direction="forward",
        tolerance="2 hours",
    )
    return out.select("event_id", "user_id", "ts", "purchase_id").orderBy("event_id")


# ---------------------------------------------------------------------------
# j11: NULL-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL
# keys match each other instead of silently dropping, the semantics a
# dimension with an "unknown" member needs. eqNullSafe stays a
# hashable equi-join condition (plans as BroadcastHashJoin), unlike
# the OR-of-IS-NULL rewrite which degrades to a nested loop.
# ---------------------------------------------------------------------------
@query(
    "j11_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT c_custkey, c_acctbal,
             nullif(c_mktsegment, 'MACHINERY') AS seg
      FROM customer
    ), d AS (
      SELECT DISTINCT seg, coalesce(seg, '<none>') AS seg_label FROM a
    )
    SELECT d.seg_label, count(*) AS n, round(sum(a.c_acctbal), 2) AS total_bal
    FROM a JOIN d ON a.seg IS NOT DISTINCT FROM d.seg
    GROUP BY 1 ORDER BY 1
    """,
)
def j11_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        "c_custkey",
        "c_acctbal",
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg"),
    )
    dim = (
        a.select("seg")
        .distinct()
        .select(
            F.col("seg").alias("d_seg"),
            F.coalesce(F.col("seg"), F.lit("<none>")).alias("seg_label"),
        )
    )
    return (
        a.join(dim, a["seg"].eqNullSafe(dim["d_seg"]))
        .groupBy("seg_label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("seg_label")
    )


# ---------------------------------------------------------------------------
# J12: interval OVERLAP join (operators/asof.py::interval_overlap_join)
# — the validity-window/reservation shape: which order pairs of the
# same customer have overlapping 20-day fulfillment windows. Both
# sides bucket-replicate so the overlap predicate is a (key, bucket)
# equi-join + residual filter, with exactly-once emission via the
# greatest-start bucket; the oracle is the direct quadratic SQL
# restatement (safe at oracle scale, not at 100 TB — which is the
# point of the bucketed plan).
# ---------------------------------------------------------------------------
@query(
    "j12_interval_overlap",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey, o_orderkey AS okey,
             CAST(o_orderdate AS TIMESTAMP) AS s,
             CAST(o_orderdate AS TIMESTAMP) + INTERVAL 20 DAY AS e
      FROM orders WHERE year(o_orderdate) = 1995
    )
    SELECT a.custkey AS custkey, count(*) AS n_pairs
    FROM o a JOIN o b ON a.custkey = b.custkey
     AND a.s <= b.e AND b.s <= a.e AND a.okey < b.okey
    GROUP BY 1 ORDER BY 1
    """,
)
def j12_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.asof import interval_overlap_join

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").cast("timestamp").alias("s"),
        )
        .withColumn("e", F.col("s") + F.expr("INTERVAL 20 DAYS"))
    )
    pairs = interval_overlap_join(
        o, o, on="custkey", left_start="s", left_end="e",
        right_start="s", right_end="e", bucket="20 days",
    )
    return (
        pairs.filter(F.col("okey") < F.col("okey_r"))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# j13: NEAREST as-of join — each click matched to the closest-in-time
# purchase of the same user within ±45 minutes, ties to the earlier
# (backward) candidate. Completes the as-of family (j7 backward, j10
# forward+tolerance): one union-and-carry sort serves BOTH direction
# frames (last over preceding, first over following) — still a single
# shuffle of |L|+|R| rows, zero join fan-out. Distances compare in
# exact integer microseconds (operators/asof.py::asof_nearest_join).
# ---------------------------------------------------------------------------
@query(
    "j13_asof_nearest",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
             event_type
      FROM events
    ),
    c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
    p AS (SELECT min(event_id) AS purchase_id, user_id, ts AS pts
          FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts),
    cand AS (
      SELECT c.event_id, c.user_id, c.ts, p.purchase_id,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY abs(epoch_us(p.pts) - epoch_us(c.ts)) ASC,
                                         p.pts ASC) AS rn
      FROM c LEFT JOIN p
        ON c.user_id = p.user_id
       AND p.pts >= c.ts - INTERVAL 45 MINUTE
       AND p.pts <= c.ts + INTERVAL 45 MINUTE
    )
    SELECT event_id, user_id, ts, purchase_id
    FROM cand WHERE rn = 1
    ORDER BY event_id
    """,
)
def j13_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.asof import asof_nearest_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # collapse tied (user, instant) purchases — same determinism
    # contract as j7/j10.
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
    )
    out = asof_nearest_join(
        clicks,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        payload=["purchase_id"],
        tolerance="45 minutes",
    )
    return out.select("event_id", "user_id", "ts", "purchase_id").orderBy("event_id")
