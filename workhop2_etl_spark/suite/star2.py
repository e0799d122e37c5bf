"""Star-join suite II — the remaining TPC-H plan shapes (Q2, Q7-Q9,
Q11, Q12, Q15-Q17, Q19-Q21), adapted to the slim testdata schema
(TESTDATA.md: no partsupp / l_shipmode / l_commitdate / p_mfgr, so
each query keeps its reference PLAN SHAPE — correlated aggregates,
disjunctive pushdown, conditional ratios, semi-join chains, unique-
latest windows — over the columns that exist).

Scale notes apply throughout: every dim side (region 5, nation 25,
supplier 100, part 2k) broadcasts explicitly; fact-side predicates
sit directly on the scan so Catalyst pushes them into parquet;
aggregates are partial-agg friendly (no windows over raw joins
unless the shape demands one); floats are rounded on BOTH engines
before any equality-sensitive step (argmin/argmax picks) so
cross-engine summation-order noise cannot flip a pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.suite import query


def _rev() -> "F.Column":
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q7-shaped: volume shipping between two nations, both directions,
# revenue per (supp_nation, cust_nation, year). The pair filter is a
# disjunction over the two broadcast nation dims.
# ---------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8-shaped: market share — NATION_5 suppliers' slice of the ASIA
# market for PROMO parts per order year. Conditional-sum ratio over a
# 7-way star; the share numerator rides the same aggregate as the
# denominator (one shuffle).
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_keys = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("asia_nationkey")
        )
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(asia_keys, F.col("c_nationkey") == F.col("asia_nationkey"))
        .select("c_custkey")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = _rev()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9-shaped: product profit by (nation, year) for 'widget' parts.
# No partsupp in the schema, so supply cost is proxied as
# 0.6 * p_retailprice * l_quantity — the shape (LIKE-filtered part
# dim joined into the fact, profit expression, two-level rollup key)
# is what the plan exercises.
# ---------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    profit = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11-shaped: revenue concentration — parts whose revenue from
# NATION_3 suppliers exceeds 3x the mean per-part revenue
# (scale-invariant: the mean grows with lines-per-part, so the query
# stays non-vacuous at every SF).
# The HAVING threshold is a scalar subquery: Spark computes the total
# once and broadcasts it as a 1-row cross join (no second scan of the
# aggregate — same dataframe, Catalyst reuses the exchange).
# ---------------------------------------------------------------------------
@query(
    "q11_revenue_concentration",
    oracle="""
    WITH nat AS (
      SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    SELECT l_partkey AS p_key, round(sum(v), 2) AS part_value
    FROM nat
    GROUP BY l_partkey
    HAVING round(sum(v), 2)
           > round(3 * (SELECT avg(pv) FROM (SELECT sum(v) AS pv FROM nat GROUP BY l_partkey)), 2)
    ORDER BY part_value DESC, p_key
    """,
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp_keys = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nat = li.join(supp_keys, li.l_suppkey == supp_keys.s_suppkey).select(
        F.col("l_partkey").alias("p_key"), _rev().alias("v")
    )
    per_part = nat.groupBy("p_key").agg(F.sum("v").alias("raw_value"))
    total = per_part.agg((F.avg("raw_value") * 3).alias("threshold"))
    # Round BOTH sides to 2dp before the threshold compare — the sums
    # are double accumulations whose last ulps depend on engine
    # summation order, so an unrounded `>` could flip near the cut
    # (module rule: round before any equality-sensitive step).
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.round("raw_value", 2) > F.round("threshold", 2))
        .select("p_key", F.round("raw_value", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "p_key")
    )


# ---------------------------------------------------------------------------
# Q12-shaped: late-shipping priority counts. No l_shipmode, so lines
# bucket by tax band; a line is late when it ships >90 days after the
# order date. Two conditional counts per bucket in one aggregate.
# ---------------------------------------------------------------------------
@query(
    "q12_late_shipping",
    oracle="""
    SELECT CASE WHEN l_tax > 0.04 THEN 'HIGH-TAX' ELSE 'LOW-TAX' END AS tax_band,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_tax", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(
            F.when(F.col("l_tax") > 0.04, "HIGH-TAX")
            .otherwise("LOW-TAX")
            .alias("tax_band")
        )
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("tax_band")
    )


# ---------------------------------------------------------------------------
# Q15-shaped: top supplier — revenue per supplier over one quarter,
# return the supplier(s) hitting the maximum. The max is a 1-row
# broadcast join against the same aggregate (Q15's "view" inlined);
# revenue rounds to 2dp on both engines BEFORE the max-equality so
# summation-order noise can't break the tie set.
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    best = revenue0.agg(F.max("total_revenue").alias("best_revenue"))
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        revenue0.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16-shaped: supplier diversity per part profile — distinct suppliers
# per (brand, type, size) over the lineitem-derived part-supplier
# pairs, excluding one brand and complaint-proxy suppliers (negative
# balance) via an anti-join (Q16's NOT IN).
# ---------------------------------------------------------------------------
@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17-shaped: small-quantity revenue — lines of one brand whose
# quantity is below half the part's average quantity. The correlated
# per-part average becomes a broadcast aggregate joined back on
# partkey (no window over the fact table).
# ---------------------------------------------------------------------------
@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # correlated scalar subquery -> per-part aggregate + equi-join.
    # The avg is over ALL lines of the part (matching the oracle's
    # uncorrelated-by-brand inner query), computed once.
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19-shaped: disjunctive predicate revenue — OR of three
# (brand, size-range, quantity-range) conjunctions. One row out; the
# point is that the whole disjunction evaluates inside the scan stage
# after the broadcast part join (no fact-side shuffle at all).
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    def arm(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm(
        "Brand#34", 35, 20, 30
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20-shaped: excess-volume suppliers — suppliers in NATION_7 who
# shipped >3x the mean pair volume of any 'small *' part
# (scale-invariant threshold). Semi-join chain: part
# names -> (supplier, part) volumes -> supplier list; each hop is a
# semi-join so no fan-out survives past its stage.
# ---------------------------------------------------------------------------
@query(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_name FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_suppkey, l_partkey, sum(l_quantity) AS q FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          GROUP BY l_suppkey, l_partkey
        ) WHERE q > 3 * (
          SELECT avg(q) FROM (
            SELECT sum(l_quantity) AS q FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
            GROUP BY l_suppkey, l_partkey
          )
        )
      )
    ORDER BY s_name
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    pairs = (
        li.join(small_parts, li.l_partkey == small_parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = pairs.agg((F.avg("qty") * 3).alias("thr"))
    heavy = (
        pairs.crossJoin(F.broadcast(thr))
        .filter(F.col("qty") > F.col("thr"))
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_7"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21-shaped: the waiting-supplier pattern — for finalized multi-
# supplier orders, the supplier whose line was the UNIQUE latest to
# ship (Q21's exists/not-exists pair becomes: order has >=2 suppliers
# AND exactly one supplier at the max shipdate). Aggregates carry
# (max, argmax, distinct-count) in one pass over (order, supplier)
# partials — no window over the raw join product.
# ---------------------------------------------------------------------------
@query(
    "q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ),
    scored AS (
      SELECT l_orderkey, l_suppkey, supp_last,
             max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supps
      FROM per_supp
    ),
    waiters AS (
      SELECT l_orderkey, l_suppkey FROM scored
      WHERE n_supps >= 2 AND supp_last = order_last
        AND 1 = (SELECT count(*) FROM scored s2
                 WHERE s2.l_orderkey = scored.l_orderkey
                   AND s2.supp_last = s2.order_last)
    )
    SELECT s_name, count(*) AS numwait
    FROM waiters JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    # one more aggregate by order gives the latest shipdate and the
    # supplier count; re-joining per_supp then isolates orders where
    # exactly one supplier sits at that max (the "unique latest").
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.max("supp_last").alias("order_last"),
        F.count(F.lit(1)).alias("n_supps"),
    )
    at_max = (
        per_supp.join(
            per_order.select("l_orderkey", "order_last", "n_supps"),
            "l_orderkey",
        )
        .filter(
            (F.col("supp_last") == F.col("order_last")) & (F.col("n_supps") >= 2)
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_at_max"),
            F.max("l_suppkey").alias("the_suppkey"),
        )
        .filter(F.col("n_at_max") == 1)
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        at_max.join(supp, F.col("the_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q2-shaped: best-value supplier — for each STANDARD part of size
# >= 40, the EUROPE supplier offering the lowest observed unit price
# (lineitem-derived; no partsupp). Correlated-min + re-join becomes an
# argmin struct per part — one aggregate, deterministic ties. The
# price is an exact integer (millicents per unit, floored) because
# float round() disagrees between engines on half-way doubles and an
# argmin amplifies a single flipped ulp into a different row.
# ---------------------------------------------------------------------------
@query(
    "q2_best_value_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(floor(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                            * 1000.0
                            / CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT))
               AS unit_price_mc
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, l_suppkey, unit_price_mc,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY unit_price_mc, l_suppkey) AS rn
      FROM offers
    )
    SELECT p_partkey, p_name, s_name, s_acctbal, unit_price_mc
    FROM best
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE rn = 1 AND p_type = 'STANDARD' AND p_size >= 40
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 20
    """,
)
def q2_best_value_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # exact integer unit price: cents are exact after round-to-nearest
    # (the true value IS an integer of cents), quantity is a whole
    # number, and floor(int*1000/int) is deterministic in any engine —
    # no float round anywhere near the argmin, so the pick can never
    # flip on a last-ulp disagreement.
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    unit_mc = F.floor(cents * 1000 / qty).cast("long")
    offers = (
        li.join(eu_supp, li.l_suppkey == eu_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_mc).alias("unit_price_mc"))
    )
    # argmin per part: min(struct(price, suppkey)) — integer price,
    # suppkey breaks ties.
    best = offers.groupBy("l_partkey").agg(
        F.min(F.struct("unit_price_mc", "l_suppkey")).alias("b")
    ).select(
        "l_partkey",
        F.col("b.unit_price_mc").alias("unit_price_mc"),
        F.col("b.l_suppkey").alias("best_suppkey"),
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") >= 40))
        .select("p_partkey", "p_name")
    )
    return (
        best.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(eu_supp, F.col("best_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "unit_price_mc")
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(20)
    )
