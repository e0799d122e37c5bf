"""Aggregation queries — SURVEY.md §2.5 (A1–A9), §2.6 (O1/O2).

The reference's aggregations are group-counts, top-k, count-distinct,
per-column quality probes, and histograms (``eda.ipynb`` cells 8–17,
README.md:99-124 KPIs). Re-expressed over the driver testdata tables
so the DuckDB oracle can check them value-for-value; each maps to a
single shuffle with map-side partial aggregation (Spark plans
partial+final hash aggregate automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.suite import query


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — the canonical "does the whole
# engine work" aggregation: scan → filter (pushed to parquet) → hash agg
# (partial+final) → small sort. Generalizes the reference's group-count KPIs
# (A1/A8, eda.ipynb cells 14-17) to measure aggregates.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                       AS sum_qty,
      round(sum(l_extendedprice), 2)                                  AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      round(avg(l_quantity), 4)                                       AS avg_qty,
      round(avg(l_extendedprice), 4)                                  AS avg_price,
      round(avg(l_discount), 4)                                       AS avg_disc,
      count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A1 + O2: group-by count → top-k. Reference: top-10 categories / genres
# (eda.ipynb cells 15,17 — `value_counts().head(10)`). Spark plans
# TakeOrderedAndProject — a true top-k, no global sort.
# ---------------------------------------------------------------------------
@query(
    "a1_topk_group_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY n DESC, o_orderpriority
    LIMIT 10
    """,
)
def a1_topk_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "o_orderpriority")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A2: per-column count-distinct (eda.ipynb cell 8 `df.nunique()`). Exact here;
# at 100 TB the same query ships as approx_count_distinct (HLL) — one pass,
# no per-column shuffle explosion.
# ---------------------------------------------------------------------------
@query(
    "a2_count_distinct",
    oracle="""
    SELECT
      count(DISTINCT o_custkey)       AS n_custkey,
      count(DISTINCT o_orderstatus)   AS n_orderstatus,
      count(DISTINCT o_orderpriority) AS n_orderpriority,
      count(DISTINCT o_orderdate)     AS n_orderdate
    FROM orders
    """,
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderstatus").alias("n_orderstatus"),
        F.countDistinct("o_orderpriority").alias("n_orderpriority"),
        F.countDistinct("o_orderdate").alias("n_orderdate"),
    )


# ---------------------------------------------------------------------------
# A3: per-column conditional counts — the reference's empty-string probe
# (eda.ipynb cells 9-10, `(df=='').sum()`), generalized to a null/blank
# data-quality scan. Single pass, one row out.
# ---------------------------------------------------------------------------
@query(
    "a3_quality_counts",
    oracle="""
    SELECT
      CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT)     AS empty_text,
      CAST(sum(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) AS BIGINT)     AS empty_lang,
      CAST(sum(CASE WHEN source IS NULL OR source = '' THEN 1 ELSE 0 END) AS BIGINT) AS empty_source,
      count(*)                                                       AS n_rows
    FROM documents
    """,
)
def a3_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def blank(c: str):
        return F.sum(F.when(F.col(c).isNull() | (F.col(c) == ""), 1).otherwise(0))

    return docs.agg(
        blank("text").alias("empty_text"),
        blank("lang").alias("empty_lang"),
        blank("source").alias("empty_source"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# A4: scalar counts — row count and full-row duplicate count
# (eda.ipynb cell 12 `duplicated().sum()`). dup count computed as
# count - distinct-count: two aggregations, no driver loop.
# ---------------------------------------------------------------------------
@query(
    "a4_dup_counts",
    oracle="""
    SELECT
      count(*) AS n_rows,
      count(*) - (SELECT count(*) FROM (SELECT DISTINCT * FROM lineitem)) AS n_full_dups
    FROM lineitem
    """,
)
def a4_dup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    total = li.agg(F.count(F.lit(1)).alias("n_rows"))
    distinct = li.distinct().agg(F.count(F.lit(1)).alias("n_distinct"))
    return total.crossJoin(distinct).select(
        "n_rows", (F.col("n_rows") - F.col("n_distinct")).alias("n_full_dups")
    )


# ---------------------------------------------------------------------------
# A5: histogram — fixed-width binning (eda.ipynb cell 16, popularity hist).
# floor(x/width) keeps it a plain hash aggregate; no rdd.histogram.
# ---------------------------------------------------------------------------
@query(
    "a5_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bin, count(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def a5_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.floor(F.col("o_totalprice") / F.lit(20000.0)).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# A7: key-duplicate detection (eda.ipynb cell 13: rows whose track_id appears
# >1 time). count-over-partition window; shuffle on the key only.
# ---------------------------------------------------------------------------
@query(
    "a7_key_dup_rows",
    oracle="""
    SELECT l_orderkey, n_per_key FROM (
      SELECT l_orderkey, count(*) OVER (PARTITION BY l_orderkey) AS n_per_key
      FROM lineitem
    ) WHERE n_per_key > 1
    ORDER BY l_orderkey
    LIMIT 100
    """,
)
def a7_key_dup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey")
    return (
        li.withColumn("n_per_key", F.count(F.lit(1)).over(w))
        .filter(F.col("n_per_key") > 1)
        .select("l_orderkey", "n_per_key")
        .orderBy("l_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# A8/A9 KPI shape: "most awarded artist" → busiest customer by order count
# and spend (README.md:103 KPI over the testdata schema).
# ---------------------------------------------------------------------------
@query(
    "a8_top_entities",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    ORDER BY n_orders DESC, total_spend DESC, o_custkey
    LIMIT 20
    """,
)
def a8_top_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .orderBy(F.desc("n_orders"), F.desc("total_spend"), "o_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# O2: global sort + limit → TakeOrderedAndProject (real top-k).
# ---------------------------------------------------------------------------
@query(
    "o2_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def o2_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A6: full-row dedup as a row-level operator (dropDuplicates) — the
# count-level probe is a4; this checks the surviving rows themselves.
# ---------------------------------------------------------------------------
@query(
    "a6_full_dedupe",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_quantity
    """,
)
def a6_full_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus", "l_quantity")
    )


# ---------------------------------------------------------------------------
# A9 shape: measure distributions per boolean/category flag (the
# explicit-influence KPI, README.md:107) over the events table.
# ---------------------------------------------------------------------------
@query(
    "a9_flag_influence",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(value), 4) AS avg_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def a9_flag_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# W1: frame-spec window functions (running sum, lead/lag) — beyond the
# reference's window-shaped argmax (SURVEY §2.8: "no frame specs,
# no lead/lag anywhere"); first-class here.
# ---------------------------------------------------------------------------
@query(
    "w1_running_and_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_order,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    ORDER BY o_custkey, order_seq
    LIMIT 5000
    """,
)
def w1_running_and_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
            ).alias("running_spend"),
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
        .limit(5000)
    )


# ---------------------------------------------------------------------------
# G1/G2: pivot and cube — beyond the reference's aggregations (SURVEY
# §2.5 "not present: grouping sets / cube / rollup"); first-class in a
# general engine. Pivot uses explicit value lists (no extra distinct
# pass); cube emits all grouping sets in one shuffle.
# ---------------------------------------------------------------------------
@query(
    "g1_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def g1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    return piv.select(
        "l_returnflag",
        F.round(F.col("O"), 2).alias("O"),
        F.round(F.col("F"), 2).alias("F"),
    ).orderBy("l_returnflag")


@query(
    "g2_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


# ---------------------------------------------------------------------------
# W2: ranking windows — row_number / rank / dense_rank over a
# deterministic ordering, filtered to the top 3 per group ("top-N per
# key", the other classic window shape besides running totals). Spark
# plans one shuffle by o_orderpriority; the rank filter cuts the
# output before the final sort.
# ---------------------------------------------------------------------------
@query(
    "w2_rank_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey,
             round(o_totalprice, 2) AS totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
)
def w2_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


# ---------------------------------------------------------------------------
# A11: sketch aggregates — approx_count_distinct (HyperLogLog++) and
# approx_percentile. THE scale path for cardinality/quantiles at
# 100 TB: fixed-size sketch state, one pass, mergeable across
# partitions (exact distinct shuffles every distinct value; a10's
# exact percentile materializes per-group sorted arrays). Sketch
# estimates are implementation-defined so the raw estimates can't be
# hash-compared cross-engine; instead the query emits the EXACT
# answers plus within-bound booleans (|est-exact|/exact <= 5%), and
# the oracle asserts the exact values and `true` for both bounds —
# a real hash row, not a rows-only check.
# ---------------------------------------------------------------------------
@query(
    "a11_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           CAST(round(quantile_cont(l_extendedprice, 0.5) * 200) AS BIGINT)
             AS exact_p50_x200,
           true AS parts_within_bound,
           true AS p50_within_bound
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a11_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # approx and exact ride ONE aggregate — one scan, one shuffle
    # (the exact pair exists only to certify the sketches; in a pure
    # production query you would keep just the sketch columns).
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10_000)).alias(
            "approx_p50"
        ),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50_raw"),
    )
    bound = F.lit(0.05)
    return (
        both
        .select(
            "l_returnflag",
            "exact_parts",
            # half-cents, not round(x, 2): an even-count median of
            # cent-quantized prices is EXACTLY .xx5 — a rounding tie
            # that engines break by last-ulp representation (flipped
            # the full-repr gate at sf0.001). ×200 makes the true
            # value an integer, so the round is tie-free.
            F.round(F.col("exact_p50_raw") * 200).cast("long").alias("exact_p50_x200"),
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= bound
            ).alias("parts_within_bound"),
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50_raw"))
                / F.col("exact_p50_raw")
                <= bound
            ).alias("p50_within_bound"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# G3: rollup — hierarchical grouping sets (flag → flag+status → grand
# total) in one shuffle, completing the pivot/cube/rollup trio.
# grouping_id disambiguates real NULL keys from subtotal rows.
# ---------------------------------------------------------------------------
@query(
    "g3_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def g3_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag").cast("long")
                + 2 * F.grouping("l_linestatus").cast("long")
            ).alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# G4: unpivot/melt — wide measure columns → long (key, measure, value)
# rows, the inverse of g1's pivot. Spark's native unpivot is a
# zero-shuffle projection (each input row emits k output rows
# in place); the oracle spells the same reshape as UNION ALL.
# ---------------------------------------------------------------------------
@query(
    "g4_unpivot",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2)      AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(avg(l_discount), 4)      AS avg_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value FROM (
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
    )
    ORDER BY l_returnflag, measure
    """,
)
def g4_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("l_returnflag", "measure")


# ---------------------------------------------------------------------------
# W3: RANGE frames — value-based window bounds (all orders within the
# preceding 30 days per customer), plus first/last_value over the
# partition. Completes the frame-spec surface: w1 = ROWS frames,
# w2 = ranking, w3 = RANGE + edge values.
# ---------------------------------------------------------------------------
@query(
    "w3_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
                         ) AS n_last_30d,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    LIMIT 5000
    """,
)
def w3_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    # RANGE over intervals needs a numeric order key in Spark's
    # DataFrame API — seconds since epoch gives day-granularity math
    ts = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w_range = W.partitionBy("o_custkey").orderBy(ts.cast("long")).rangeBetween(
        -30 * 86400, 0
    )
    w_edge = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.count(F.lit(1)).over(w_range).alias("n_last_30d"),
            F.first("o_orderkey").over(w_edge).alias("first_order"),
            F.last("o_orderkey")
            .over(w_edge.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .alias("last_order"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .limit(5000)
        .drop("o_orderdate")
    )


# ---------------------------------------------------------------------------
# g5: explicit GROUPING SETS with grouping_id — the generalized form
# underlying cube/rollup (g2/g3): only the requested combinations are
# aggregated (one expand + one hash agg; at scale you pay exactly for
# the sets you ask for, not the full 2^k cube).
# ---------------------------------------------------------------------------
@query(
    "g5_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CASE WHEN o_orderstatus IS NULL AND o_orderpriority IS NULL THEN 3
                WHEN o_orderpriority IS NULL THEN 1
                WHEN o_orderstatus IS NULL THEN 2
                ELSE 0 END AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)
def g5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB has no grouping_id(); both engines derive gid from the
    NULL pattern instead. Testdata has no NULL status/priority, so
    the pattern is unambiguous (the standard caveat: with nullable
    group keys you'd need grouping_id proper)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CASE WHEN o_orderstatus IS NULL AND o_orderpriority IS NULL THEN 3
                    WHEN o_orderpriority IS NULL THEN 1
                    WHEN o_orderstatus IS NULL THEN 2
                    ELSE 0 END AS gid,
               count(*) AS n, round(sum(o_totalprice), 2) AS spend
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# w4: OHLC resample — per (user, hourly bucket) open/high/low/close
# over `value`, the standard timeseries downsample. Open/close are
# min/max over a (ts, event_id, value) struct — the lexicographic
# struct ordering gives an exact integer tiebreak, so first/last are
# cross-engine deterministic without a window pass: ONE hash
# aggregation, no row_number, partial-agg friendly at 100 TB.
# ---------------------------------------------------------------------------
@query(
    "w4_ohlc_resample",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, value,
             make_timestamp(epoch_ns(ts) // 1000) AS ts
      FROM events
    ), b AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             ts, event_id, value
      FROM ev
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT user_id, bucket,
           round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           count(*) AS n
    FROM r GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def w4_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.groupBy(
            "user_id", F.window("ts", "1 hour").start.alias("bucket")
        )
        .agg(
            F.round(first_s.getItem("value"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(last_s.getItem("value"), 4).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id", "bucket")
    )


# ---------------------------------------------------------------------------
# a12: exact weighted median per group — smallest value whose
# cumulative weight reaches half the group total. Pure window
# algebra (cumulative sum ordered by value + one argmin), no UDAF —
# the expression-first answer to a statistic Spark has no builtin
# for. Deterministic by construction (min value at the crossing
# point), so it hash-matches cross-engine, unlike mode()/median()
# whose tie behavior is engine-specific.
# ---------------------------------------------------------------------------
@query(
    "a12_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice
                                   ROWS UNBOUNDED PRECEDING) AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           round(min(v), 2) AS weighted_median,
           round(max(tw), 4) AS total_weight
    FROM w WHERE cw >= tw / 2
    GROUP BY 1 ORDER BY 1
    """,
)
def a12_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    cum = Window.partitionBy("l_returnflag").orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("l_returnflag")
    return (
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").alias("v"),
            F.sum("l_quantity").over(cum).alias("cw"),
            F.sum("l_quantity").over(tot).alias("tw"),
        )
        .filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("v"), 2).alias("weighted_median"),
            F.round(F.max("tw"), 4).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# a13: column profile — the reference's notebook-side `describe()`
# (eda.ipynb EDA cells) as an engine operator: count / nulls / mean /
# sample-stddev / min / max per numeric column in ONE aggregate pass
# (describe() at 100 TB must not rescan per column). Long form —
# one row per column — so adding columns never changes the schema.
# ---------------------------------------------------------------------------
@query(
    "a13_profile_stats",
    oracle="""
    SELECT 'l_quantity' AS col, count(l_quantity) AS n,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_null,
           round(avg(l_quantity), 4) AS mean,
           round(stddev_samp(l_quantity), 4) AS std,
           round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(l_extendedprice),
           CAST(count(*) - count(l_extendedprice) AS BIGINT),
           round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4),
           round(min(l_extendedprice), 4), round(max(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(l_discount),
           CAST(count(*) - count(l_discount) AS BIGINT),
           round(avg(l_discount), 4), round(stddev_samp(l_discount), 4),
           round(min(l_discount), 4), round(max(l_discount), 4)
    FROM lineitem
    ORDER BY col
    """,
)
def a13_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_discount", "l_extendedprice", "l_quantity"]
    total = F.count(F.lit(1))
    # one aggregate pass over the scan; per-column stats as parallel
    # aggregate expressions, then unpivoted to long form driver-side
    # (3×6 scalar cells — bounded by column count, not rows)
    profiled = li.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.count(c).alias(f"n__{c}"),
                (total - F.count(c)).alias(f"nn__{c}"),
                F.round(F.avg(c), 4).alias(f"mean__{c}"),
                F.round(F.stddev_samp(c), 4).alias(f"std__{c}"),
                F.round(F.min(c), 4).alias(f"min__{c}"),
                F.round(F.max(c), 4).alias(f"max__{c}"),
            )
        ]
    )
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"n__{c}").alias("n"),
            F.col(f"nn__{c}").alias("n_null"),
            F.col(f"mean__{c}").alias("mean"),
            F.col(f"std__{c}").alias("std"),
            F.col(f"min__{c}").alias("min_v"),
            F.col(f"max__{c}").alias("max_v"),
        )
        for c in cols
    ]
    return (
        profiled.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# w5: gap-filled daily counts — a dense (day × event_type) spine via
# sequence()/explode over the observed date range, left-joined to the
# sparse counts with zero-fill. The spine is |days| × |types| rows —
# dimension-sized, broadcast into the join — so densification never
# shuffles the fact table a second time. The standard sparse→dense
# resample every downstream time-series consumer (charting, models)
# needs.
# ---------------------------------------------------------------------------
@query(
    "w5_gapfill_days",
    oracle="""
    WITH counts AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_raw
      FROM events WHERE event_id % 97 = 0
      GROUP BY 1, 2
    ), bounds AS (
      SELECT CAST(min(ts) AS DATE) AS mn, CAST(max(ts) AS DATE) AS mx
      FROM events
    ), spine AS (
      SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    )
    SELECT s.day, t.event_type,
           CAST(coalesce(c.n_raw, 0) AS BIGINT) AS n
    FROM spine s CROSS JOIN types t
    LEFT JOIN counts c ON c.day = s.day AND c.event_type = t.event_type
    ORDER BY s.day, t.event_type
    """,
)
def w5_gapfill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # sparse subset (≈1%) so the zero-fill path is genuinely
    # exercised; the spine bounds come from the FULL table
    counts = (
        ev.filter(F.col("event_id") % 97 == 0)
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_raw"))
    )
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("mn"), F.to_date(F.max("ts")).alias("mx")
    )
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("day")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(F.broadcast(counts), ["day", "event_type"], "left")
        .select(
            "day", "event_type", F.coalesce("n_raw", F.lit(0)).alias("n")
        )
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# a14: equi-DEPTH histogram (decile buckets) — ntile over a total
# order (value + unique keys as tiebreak, so bucket edges are
# cross-engine deterministic), then per-bucket count/min/max. The
# complement of a5's equi-width binning; the pair is what a query
# planner needs for selectivity and what data profiling reports.
#
# Scale caveat (same pattern as a2's exact-vs-HLL note): a global
# ntile is a single-task sort — exact and fine at oracle scale, NOT
# the 100 TB plan. At scale this query ships as approx_percentile
# boundaries (one distributed pass) + a bucket-assignment broadcast
# join; bucket populations are then approximate within the sketch's
# rank error, which is what profiling needs. The exact form stays
# here because the oracle gate demands bit-equality.
# ---------------------------------------------------------------------------
@query(
    "a14_equidepth_deciles",
    oracle="""
    WITH t AS (
      SELECT l_extendedprice AS v,
             ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n,
           round(min(v), 2) AS lo, round(max(v), 2) AS hi
    FROM t GROUP BY 1 ORDER BY 1
    """,
)
def a14_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.select(F.col("l_extendedprice").alias("v"), F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# w6: bounded-memory EWMA over the per-type daily series. True EWMA is
# a scan (recursive over all history) — not expressible as one window
# aggregate and numerically explosive via the (1-a)^-k trick; the
# production form at scale is the K-term truncated EWMA: weights
# (1-a)^i over the last K observations, renormalized over the lags
# that exist near the series head. K fixed => a single per-key window
# whose frame is K rows — state bounded, one shuffle on event_type
# (or (key, shard) for hot keys, as x6). Weight literals are
# generated once in Python and shared verbatim with the oracle so
# both engines fold the identical IEEE-754 constants.
# ---------------------------------------------------------------------------

_EWMA_K = 16
_EWMA_W = [(1 - 0.3) ** i for i in range(_EWMA_K)]


#: oracle numerator/denominator assembled FROM _EWMA_W (repr() emits
#: the exact shortest-roundtrip double literals), so changing _EWMA_K
#: or alpha can never desync the two sides — same generated-constant
#: pattern as dedup.py's _SIG_COMPONENTS.
_EWMA_NUM = " + ".join(
    f"{wt!r} * coalesce(lag(x, {i}) OVER w, 0)" for i, wt in enumerate(_EWMA_W)
)
_EWMA_DEN = " + ".join(
    f"{wt!r} * (CASE WHEN lag(x, {i}) OVER w IS NOT NULL THEN 1 ELSE 0 END)"
    for i, wt in enumerate(_EWMA_W)
)


@query(
    "w6_ewma",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             round(sum(value), 4) AS x
      FROM events GROUP BY 1, 2)
    SELECT day, event_type, x AS daily_value,
           round(({_EWMA_NUM})
                 / ({_EWMA_DEN}), 4) AS ewma
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ORDER BY event_type, day
    """,
)
def w6_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 4).alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    num = sum(
        (F.lit(wt) * F.coalesce(F.lag("x", i).over(w), F.lit(0.0)) for i, wt in enumerate(_EWMA_W)),
        start=F.lit(0.0),
    )
    den = sum(
        (F.lit(wt) * F.lag("x", i).over(w).isNotNull().cast("int") for i, wt in enumerate(_EWMA_W)),
        start=F.lit(0.0),
    )
    return daily.select(
        "day",
        "event_type",
        F.col("x").alias("daily_value"),
        F.round(num / den, 4).alias("ewma"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# dq2: rolling z-score anomaly flag over the per-type daily series —
# the monitoring sibling of dq1's static constraints. Each day's
# total is scored against the mean/stddev of its own trailing 7-day
# window (current day EXCLUDED, so an anomalous day can't mask
# itself); days with fewer than 4 prior observations abstain (z
# NULL). Same bounded-frame per-key window shape as w6: state is 7
# rows per key, one shuffle on event_type.
# ---------------------------------------------------------------------------


@query(
    "dq2_rolling_outliers",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             round(sum(value), 4) AS x
      FROM events GROUP BY 1, 2)
    SELECT day, event_type, x AS daily_value,
           round(z, 3) AS z,
           coalesce(abs(z) > 2.0, FALSE) AS is_outlier
    FROM (
      SELECT day, event_type, x,
             CASE WHEN count(x) OVER w >= 4
                  THEN (x - avg(x) OVER w) / nullif(stddev_samp(x) OVER w, 0)
             END AS z
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    ORDER BY event_type, day
    """,
)
def dq2_rolling_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 4).alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    z = F.when(
        F.count("x").over(w) >= 4,
        (F.col("x") - F.avg("x").over(w))
        / F.nullif(F.stddev_samp("x").over(w), F.lit(0.0)),
    )
    return daily.select(
        "day",
        "event_type",
        F.col("x").alias("daily_value"),
        F.round(z, 3).alias("z"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_outlier"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# dq3: robust outliers via exact median absolute deviation. dq2's
# rolling z-score uses mean/stddev, which heavy-tailed values drag
# around (one large outlier inflates the very stddev meant to catch
# it); MAD is the standard robust scale estimate (x is an outlier
# when |x − median| > 3·1.4826·MAD). Exact MAD is inherently two
# order-statistic passes over the data (median, then median of
# absolute deviations); both medians are exact interpolated
# percentiles so the oracle matches bit-for-bit after rounding. The
# per-type medians are a 5-row broadcast back into the scan. At
# 100 TB the single-pass twin is approx_percentile for both levels —
# same plan shape, sketch-bounded error.
# ---------------------------------------------------------------------------

_MAD_K = 1.4826  # consistency constant: MAD→σ for normal data


@query(
    "dq3_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, any_value(med) AS med,
             quantile_cont(abs(e.value - med), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           round(any_value(m.med), 6) AS med,
           round(any_value(m.mad), 6) AS mad,
           count(*) AS n,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * {_MAD_K} * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def dq3_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > 3 * _MAD_K * F.col("mad"))
                .cast("int")
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# w7: rolling correlation between two daily series per key — does
# volume track value? (trend/drift detection over metric pairs, the
# monitoring sibling of dq2's rolling z-score). Pearson r over the
# trailing 7-row frame, assembled from COMPONENT SUMS (n, Σx, Σy,
# Σx², Σy², Σxy) with the identical formula on both engines — never
# the engines' own corr() aggregates, whose accumulation orders
# differ. Inputs are rounded before the window so both engines fold
# the same doubles; frames with <3 points or zero variance abstain
# (NULL). Same bounded per-key window shape as w6/dq2: 7 rows of
# state per key, one shuffle on event_type.
# ---------------------------------------------------------------------------
@query(
    "w7_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS DOUBLE) AS x,
             round(sum(value), 4) AS y
      FROM events GROUP BY 1, 2)
    SELECT day, event_type,
           CAST(x AS BIGINT) AS n_events,
           y AS daily_value,
           CASE WHEN n >= 3 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                THEN round((n*sxy - sx*sy)
                           / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 3)
           END AS corr_7d
    FROM (
      SELECT day, event_type, x, y,
             CAST(count(*) OVER w AS DOUBLE) AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x*x) OVER w AS sxx, sum(y*y) OVER w AS syy,
             sum(x*y) OVER w AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    ORDER BY event_type, day
    """,
)
def w7_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        F.round(F.sum("value"), 4).alias("y"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = F.sum("x").over(w), F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    var_x, var_y = n * sxx - sx * sx, n * syy - sy * sy
    corr = F.when(
        (n >= 3) & (var_x > 0) & (var_y > 0),
        F.round((n * sxy - sx * sy) / F.sqrt(var_x * var_y), 3),
    )
    return (
        daily.select(
            "day",
            "event_type",
            F.col("x").cast("bigint").alias("n_events"),
            F.col("y").alias("daily_value"),
            corr.alias("corr_7d"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# dq4: snapshot profile drift (operators/quality.py::profile_drift) —
# the between-generations monitor: split the event log into two
# interleaved snapshots (odd/even day-of-year — a deterministic stand-
# in for yesterday-vs-today) and compare per-type row counts, NULL
# rates, and value means in ONE conditional-aggregate pass. The split
# rule is a parameter of the operator; the comparison algebra is
# what's under test.
# ---------------------------------------------------------------------------
@query(
    "dq4_profile_drift",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CASE WHEN dayofyear(CAST(ts AS DATE)) % 2 = 1
                  THEN 1 ELSE 0 END AS b
      FROM events),
    agg AS (
      SELECT event_type,
             CAST(sum(1 - b) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
             sum(CASE WHEN value IS NULL THEN 1 - b ELSE 0 END) AS null_a,
             sum(CASE WHEN value IS NULL THEN b ELSE 0 END) AS null_b,
             sum(CASE WHEN b = 0 THEN value ELSE 0.0 END) AS sum_a,
             sum(CASE WHEN b = 1 THEN value ELSE 0.0 END) AS sum_b
      FROM e GROUP BY event_type),
    bp AS (
      SELECT event_type, n_a, n_b,
             CAST(round(null_a * 10000.0 / n_a) AS BIGINT) AS null_rate_a_bp,
             CAST(round(null_b * 10000.0 / n_b) AS BIGINT) AS null_rate_b_bp,
             CAST(round(sum_a / (n_a - null_a) * 10000) AS BIGINT) AS mean_a_bp,
             CAST(round(sum_b / (n_b - null_b) * 10000) AS BIGINT) AS mean_b_bp
      FROM agg)
    SELECT event_type, n_a, n_b, null_rate_a_bp, null_rate_b_bp,
           mean_a_bp, mean_b_bp,
           CASE WHEN mean_a_bp <> 0
                THEN CAST(round(abs(mean_b_bp - mean_a_bp) * 10000.0
                                / abs(mean_a_bp)) AS BIGINT)
           END AS mean_drift_bp,
           (CASE WHEN mean_a_bp <> 0
                 THEN CAST(round(abs(mean_b_bp - mean_a_bp) * 10000.0
                                 / abs(mean_a_bp)) AS BIGINT)
            END > 1000) AS drifted
    FROM bp ORDER BY event_type
    """,
)
def dq4_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.quality import profile_drift

    ev = load_table(spark, sf_dir, "events")
    is_b = F.dayofyear(F.to_date("ts")) % 2 == 1
    return profile_drift(ev, is_b, ["event_type"], "value").orderBy("event_type")


# ---------------------------------------------------------------------------
# w8: rolling TREND — trailing-7-day OLS slope of daily value per
# event_type, from the same component-sum idiom as w7 (x = exact
# integer day number, y = rounded daily sum, five running sums over
# one frame): slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²). The window
# analytics pair: w7 answers "do these series move together", w8
# answers "which way is this one moving" — both in one shuffle per
# key with O(1) state.
# ---------------------------------------------------------------------------
@query(
    "w8_rolling_slope",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE)
               AS x,
             round(sum(value), 4) AS y
      FROM events GROUP BY 1, 2, 3)
    SELECT day, event_type, y AS daily_value,
           CASE WHEN n >= 3 AND n*sxx - sx*sx > 0
                THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4)
           END AS slope_7d
    FROM (
      SELECT day, event_type, y,
             CAST(count(*) OVER w AS DOUBLE) AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x*x) OVER w AS sxx, sum(x*y) OVER w AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    ORDER BY event_type, day
    """,
)
def w8_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("x"),
    ).agg(F.round(F.sum("value"), 4).alias("y"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = F.sum("x").over(w), F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    var_x = n * sxx - sx * sx
    slope = F.when(
        (n >= 3) & (var_x > 0), F.round((n * sxy - sx * sy) / var_x, 4)
    )
    return (
        daily.select(
            "day", "event_type", F.col("y").alias("daily_value"),
            slope.alias("slope_7d"),
        )
        .orderBy("event_type", "day")
    )
