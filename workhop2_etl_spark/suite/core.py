"""Core scans / filters / scalar functions — SURVEY.md §2.1-2.3.

Each query exercises one S/P/F operator from the inventory over the
driver testdata, using the engine's composable functions
(``workhop2_etl_spark.functions.clean``) so the suite checks the same
code paths the pipelines use. Oracles use DuckDB-native spellings
(regexp flags, split_part, try_strptime) — only the *values* must
match.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from workhop2_etl_spark.functions import clean
from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.sources import readers, writers
from workhop2_etl_spark.suite import io_dir as suite_io_dir, query

# ---------------------------------------------------------------------------
# S1 + S4: CSV sink → CSV scan with declared schema, checked by aggregating
# the round-tripped table against the original parquet. Exercises the real
# writer/reader code paths (header, overwrite, PERMISSIVE parse).
# ---------------------------------------------------------------------------
_PART_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)


@query(
    "s1_csv_roundtrip",
    oracle="""
    SELECT p_brand, count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size,
           round(sum(p_retailprice), 2) AS sum_price
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def s1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    out = suite_io_dir("part_csv")
    writers.write_csv(part, out, mode="overwrite", header=True)
    back = readers.read_csv(spark, out, schema=_PART_SCHEMA, header=True)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p_size").alias("sum_size"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# P1: conjunctive filter with negation — the reference's row drop
# `~((nominee=='') & (artist==''))` (dags/etl_grammy_spotify.py:91).
# ---------------------------------------------------------------------------
@query(
    "p1_conj_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_size
    FROM part
    WHERE NOT (p_type = 'ECONOMY' AND p_size < 10)
    ORDER BY p_partkey
    """,
)
def p1_conj_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(~((F.col("p_type") == "ECONOMY") & (F.col("p_size") < 10)))
        .select("p_partkey", "p_name", "p_type", "p_size")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# P3 + P4: substring containment and ANY-keyword match (reference :124,:143).
# The keyword list routes rows exactly like the reference's song/other split.
# ---------------------------------------------------------------------------
_KEYWORDS = ["ring", "bolt", "gear", "widget"]


@query(
    "p4_keyword_filter",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE regexp_matches(p_name, 'ring|bolt|gear|widget')
      AND contains(p_name, 'r')
    ORDER BY p_partkey
    """,
)
def p4_keyword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(clean.keyword_match(F.col("p_name"), _KEYWORDS))
        .filter(F.col("p_name").contains("r"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# P6 + P8: IN-list predicate and equality filters (reference :173-175,
# eda.ipynb cells 14-15).
# ---------------------------------------------------------------------------
@query(
    "p6_isin_filter",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def p6_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
            & (F.col("o_orderstatus") == "O")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# P7: partition-by-predicate — one cached scan split into two branches by a
# mask (reference :145-146). Surfaced as branch counts in a single result.
# ---------------------------------------------------------------------------
@query(
    "p7_split_branches",
    oracle="""
    SELECT CASE WHEN regexp_matches(p_name, 'ring|bolt|gear|widget')
                THEN 'match' ELSE 'other' END AS branch,
           count(*) AS n
    FROM part GROUP BY 1 ORDER BY 1
    """,
)
def p7_split_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    mask = clean.keyword_match(F.col("p_name"), _KEYWORDS)
    return (
        part.withColumn("branch", F.when(mask, "match").otherwise("other"))
        .groupBy("branch")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("branch")
    )


# ---------------------------------------------------------------------------
# F1: normalize_text — the reference's core normalizer compiled to pure
# expressions. Inputs are constructed to hit every branch: NULLs, mixed
# case, padding, every separator token, internal whitespace runs.
# ---------------------------------------------------------------------------
@query(
    "f1_normalize_text",
    oracle="""
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(
               trim(lower(coalesce(
                 CASE WHEN c_custkey % 13 = 0 THEN NULL
                      ELSE concat('  ', c_name, ' feat. ', c_mktsegment,
                                  ' & The   Band and Friends ft. X  ')
                 END, ''))),
               '\\s*(?:feat\\.|featuring|ft\\.|&|and)\\s*', ';', 'g'),
             '\\s+', ' ', 'g') AS normalized
    FROM customer ORDER BY c_custkey
    """,
)
def f1_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 13 == 0, F.lit(None)).otherwise(
        F.concat(
            F.lit("  "),
            F.col("c_name"),
            F.lit(" feat. "),
            F.col("c_mktsegment"),
            F.lit(" & The   Band and Friends ft. X  "),
        )
    )
    return cust.select(
        "c_custkey", clean.normalize_text(raw).alias("normalized")
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# F2 + F3: the two *other* normalizers — simple lower/trim, and the
# separator-only variant that deliberately disagrees with F1 (SURVEY §3.2).
# ---------------------------------------------------------------------------
@query(
    "f3_separator_variants",
    oracle="""
    SELECT c_custkey,
           trim(lower(coalesce(c_name, ''))) AS simple_norm,
           translate(lower(concat(c_name, ' & Co, Inc')), '&,', ';;') AS sep_norm
    FROM customer ORDER BY c_custkey
    """,
)
def f3_separator_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        clean.normalize_simple(F.col("c_name")).alias("simple_norm"),
        clean.normalize_separators_only(
            F.concat(F.col("c_name"), F.lit(" & Co, Inc"))
        ).alias("sep_norm"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# F4: the null-sentinel triangle ('' ↔ NULL ↔ 'N/A') — blanks normalized to
# NULL at ingest, sentinel re-materialized only at the export boundary
# (reference :114,:272; SURVEY §7.4 item 4).
# ---------------------------------------------------------------------------
@query(
    "f4_sentinel_roundtrip",
    oracle="""
    WITH staged AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN ''
                  WHEN doc_id % 11 = 0 THEN NULL
                  ELSE source END AS raw
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN trim(raw) = '' THEN NULL ELSE raw END IS NULL AS was_missing,
           coalesce(CASE WHEN trim(raw) = '' THEN NULL ELSE raw END, 'N/A') AS export_value
    FROM staged ORDER BY doc_id
    """,
)
def f4_sentinel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 7 == 0, F.lit(""))
        .when(F.col("doc_id") % 11 == 0, F.lit(None))
        .otherwise(F.col("source"))
    )
    as_null = clean.blank_to_null(raw)
    return docs.select(
        "doc_id",
        as_null.isNull().alias("was_missing"),
        clean.null_to_sentinel(as_null).alias("export_value"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# F5: string→bool with NULL for unmapped (reference :275-276 — minus the
# pandas astype(bool) NaN→True footgun, deliberately not reproduced).
# ---------------------------------------------------------------------------
@query(
    "f5_str_to_bool",
    oracle="""
    SELECT winner_bool, count(*) AS n FROM (
      SELECT CASE lower(trim(CASE WHEN o_orderstatus = 'O' THEN 'True'
                                  WHEN o_orderstatus = 'F' THEN ' FALSE '
                                  ELSE 'pending' END))
             WHEN 'true' THEN true WHEN 'false' THEN false END AS winner_bool
      FROM orders
    ) GROUP BY winner_bool ORDER BY winner_bool NULLS FIRST
    """,
)
def f5_str_to_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    raw = (
        F.when(F.col("o_orderstatus") == "O", "True")
        .when(F.col("o_orderstatus") == "F", " FALSE ")
        .otherwise("pending")
    )
    return (
        orders.select(clean.str_to_bool(raw).alias("winner_bool"))
        .groupBy("winner_bool")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("winner_bool").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# F6: timestamp parse with NULL-on-error (`errors='coerce'`,
# dags/cargar_grammy.py:9-10) — valid ISO strings parse, garbage → NULL.
# ---------------------------------------------------------------------------
@query(
    "f6_timestamp_coerce",
    oracle="""
    SELECT o_orderkey,
           try_strptime(CASE WHEN o_orderkey % 97 = 0 THEN 'not-a-date'
                             ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') END,
                        '%Y-%m-%dT%H:%M:%S') AS parsed
    FROM orders ORDER BY o_orderkey
    """,
)
def f6_timestamp_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    iso = F.when(F.col("o_orderkey") % 97 == 0, F.lit("not-a-date")).otherwise(
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss")
    )
    return orders.select(
        "o_orderkey",
        clean.parse_timestamp_coerce(iso, "yyyy-MM-dd'T'HH:mm:ss").alias("parsed"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# F7: numeric cast with 'N/A' sentinel → NULL (reference :279-293).
# ---------------------------------------------------------------------------
@query(
    "f7_cast_sentinel",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           round(sum(price), 2) AS sum_price
    FROM (
      SELECT try_cast(nullif(CASE WHEN p_size < 5 THEN 'N/A'
                                  ELSE CAST(round(p_retailprice, 2) AS VARCHAR) END,
                             'N/A') AS DOUBLE) AS price
      FROM part
    )
    """,
)
def f7_cast_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    raw = F.when(F.col("p_size") < 5, F.lit("N/A")).otherwise(
        F.round(F.col("p_retailprice"), 2).cast("string")
    )
    price = clean.cast_numeric_sentinel(raw, "double")
    return part.select(price.alias("price")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("price").isNull(), 1).otherwise(0)).alias("n_null"),
        F.round(F.sum("price"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# F8: prefix-before-delimiter — the fuzzy-join fallback key (reference :236).
# ---------------------------------------------------------------------------
@query(
    "f8_prefix_extract",
    oracle="""
    SELECT p_partkey,
           trim(split_part(concat(p_name, ' (', p_brand, ')'), '(', 1)) AS prefix
    FROM part ORDER BY p_partkey
    """,
)
def f8_prefix_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    titled = F.concat(F.col("p_name"), F.lit(" ("), F.col("p_brand"), F.lit(")"))
    return part.select(
        "p_partkey", clean.prefix_before(titled).alias("prefix")
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# F9: conditional write-back (`artist := nominee WHERE …`, reference
# :173-180) as a pure expression — no row mutation, no index.
# ---------------------------------------------------------------------------
@query(
    "f9_conditional_impute",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0
                THEN 'REVIEW' ELSE c_mktsegment END AS segment
    FROM customer ORDER BY c_custkey
    """,
)
def f9_conditional_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cond = (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") < 0)
    return cust.select(
        "c_custkey",
        clean.impute_when(F.col("c_mktsegment"), cond, F.lit("REVIEW")).alias("segment"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# F10: date/time functions — extraction, truncation, arithmetic,
# day-of-week (beyond the reference's single timestamp parse F6).
# ---------------------------------------------------------------------------
@query(
    "f10_date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           count(*) AS n,
           min(CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)) AS first_day,
           max(o_orderdate + INTERVAL 30 DAY) AS max_due
    FROM orders
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def f10_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.date_trunc("day", F.col("o_orderdate"))).alias("first_day"),
            F.max(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("max_due"),
        )
        .orderBy("yr", "mo")
    )


# ---------------------------------------------------------------------------
# A10: exact percentiles/median — distribution statistics beyond counts
# (Spark `percentile` ≡ DuckDB `quantile_cont`, both linear-interp).
# At 100 TB this ships as approx_percentile (t-digest) — same query
# shape, bounded memory.
# ---------------------------------------------------------------------------
@query(
    "a10_percentiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(round(quantile_cont(o_totalprice, 0.5) * 10000) AS BIGINT) AS p50_x10000,
           CAST(round(quantile_cont(o_totalprice, 0.9) * 10000) AS BIGINT) AS p90_x10000,
           CAST(round(quantile_cont(o_totalprice, 0.99) * 10000) AS BIGINT) AS p99_x10000
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def a10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    # Scaled integers, not round(x, 4) doubles: linear-interpolated
    # percentiles of cent-quantized prices have ≤4 decimals, so ×10000
    # is integer-exact (tie-free round) where a rounded double's
    # nearest-representation choice is an engine implementation detail.
    def pct_i(q: float, name: str):
        return F.round(F.percentile("o_totalprice", F.lit(q)) * 10000).cast(
            "long"
        ).alias(name)

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            pct_i(0.5, "p50_x10000"),
            pct_i(0.9, "p90_x10000"),
            pct_i(0.99, "p99_x10000"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# S-ext: JSON-lines sink → scan with declared schema, checked like the
# CSV round trip. JSON-lines is the interchange format corpus
# pipelines actually ship; one doc per line splits across executors.
# ---------------------------------------------------------------------------
_SUPP_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)


@query(
    "s2_json_roundtrip",
    oracle="""
    SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def s2_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    out = suite_io_dir("supplier_json")
    writers.write_json(supp, out, mode="overwrite")
    back = readers.read_json(spark, out, schema=_SUPP_SCHEMA)
    return (
        back.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("s_acctbal"), 2).alias("sum_bal"))
        .orderBy("s_nationkey")
    )


# ---------------------------------------------------------------------------
# SQL front end: the same engine surface through spark.sql(...) text —
# views registered over the testdata, ANSI SQL in, DataFrame out.
# Proves a reference user can keep writing plain SQL; Catalyst plans
# text and DataFrame calls identically.
# ---------------------------------------------------------------------------
@query(
    "sql1_text_query",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend,
           round(avg(o_totalprice), 4) AS avg_spend
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql1_text_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.session import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spend,
               round(avg(o_totalprice), 4) AS avg_spend
        FROM orders
        WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# DQ1: declarative constraint checks — all rules evaluated in ONE
# aggregate over one scan (operators/quality.py). The reference
# eyeballs these counts in a notebook; here they are a queryable
# pass/fail table.
# ---------------------------------------------------------------------------
@query(
    "dq1_constraints",
    oracle="""
    WITH agg AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS v_custkey_not_null,
             sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS v_price_positive,
             sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS v_status_domain,
             sum(CASE WHEN o_orderpriority SIMILAR TO '[1-5]-[A-Z ]+' THEN 0 ELSE 1 END)
               AS v_priority_format
      FROM orders
    )
    SELECT rule, n AS n_rows, CAST(v AS BIGINT) AS n_violations, v = 0 AS pass FROM (
      SELECT n, 'custkey_not_null' AS rule, v_custkey_not_null AS v FROM agg
      UNION ALL SELECT n, 'price_positive', v_price_positive FROM agg
      UNION ALL SELECT n, 'status_domain', v_status_domain FROM agg
      UNION ALL SELECT n, 'priority_format', v_priority_format FROM agg
    )
    ORDER BY rule
    """,
)
def dq1_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators import quality as Q

    orders = load_table(spark, sf_dir, "orders")
    rules = {
        "custkey_not_null": Q.not_null("o_custkey"),
        "price_positive": F.col("o_totalprice") > 0,
        "status_domain": Q.one_of("o_orderstatus", ["O", "F", "P"]),
        "priority_format": Q.matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
    }
    return Q.check_constraints(orders, rules).orderBy("rule")


# ---------------------------------------------------------------------------
# s6: schema-evolution round-trip — an older parquet batch lacks a
# column that a newer batch carries; a mergeSchema read must widen
# the old rows with NULLs (the lakehouse append-only evolution
# contract). Previously pytest-only
# (test_scale_ops::test_parquet_schema_evolution_merge); the oracle
# replays the widened union in SQL.
# ---------------------------------------------------------------------------
@query(
    "s6_schema_evolution",
    oracle="""
    WITH widened AS (
      SELECT s_suppkey, s_name, s_nationkey, CAST(NULL AS DOUBLE) AS s_acctbal
      FROM supplier WHERE s_suppkey % 2 = 0
      UNION ALL
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      FROM supplier WHERE s_suppkey % 2 = 1
    )
    SELECT s_nationkey, count(*) AS n,
           count(s_acctbal) AS n_with_bal,
           round(sum(coalesce(s_acctbal, 0)), 2) AS total_bal
    FROM widened GROUP BY 1 ORDER BY 1
    """,
)
def s6_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    out = suite_io_dir("sup_evolve")
    old_batch = sup.filter(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    new_batch = sup.filter(F.col("s_suppkey") % 2 == 1).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    old_batch.write.mode("overwrite").parquet(out)
    new_batch.write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("s_acctbal").alias("n_with_bal"),
            F.round(F.sum(F.coalesce("s_acctbal", F.lit(0.0))), 2).alias("total_bal"),
        )
        .orderBy("s_nationkey")
    )


# ---------------------------------------------------------------------------
# dq5: referential integrity across the star schema — orphan counts
# for every FK edge, each an ANTI join (dimension side broadcast;
# the one fact-fact edge shuffles on its key). The operator a
# pipeline runs before trusting any join result: an orphan count
# that is nonzero means inner joins silently drop rows.
# ---------------------------------------------------------------------------
@query(
    "dq5_referential_integrity",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem.l_orderkey->orders' AS relationship,
             (SELECT count(*) FROM lineitem) AS n_child,
             count(*) AS n_orphans
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
             (SELECT count(*) FROM lineitem), count(*)
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             (SELECT count(*) FROM orders), count(*)
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             (SELECT count(*) FROM customer), count(*)
      FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    ) ORDER BY relationship
    """,
)
def dq5_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def edge(name, child, child_key, parent, parent_key, broadcast_parent):
        p = parent.select(parent_key).distinct()
        if broadcast_parent:
            p = F.broadcast(p)
        orphans = (
            child.join(p, child[child_key] == p[parent_key], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        n_child = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        # two 1-row frames — the crossJoin is a broadcast of scalars,
        # and the whole check stays one lazy plan (no driver actions)
        return orphans.crossJoin(n_child).select(
            F.lit(name).alias("relationship"), "n_child", "n_orphans"
        )
    out = (
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey", False)
        .unionByName(edge("lineitem.l_suppkey->supplier", li, "l_suppkey", sup, "s_suppkey", True))
        .unionByName(edge("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey", True))
        .unionByName(edge("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey", True))
    )
    return out.orderBy("relationship")
