"""Scale-mechanics tests: salted aggregation equivalence, partitioned
writes with partition pruning, bucketed-layout round trip.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import functions as F

from workhop2_etl_spark.operators.skew import salted_aggregate
from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.sources.writers import write_parquet

from tests.conftest import SF_DIR


def test_salted_aggregate_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    plain = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
            F.max("o_orderkey").alias("max_key"),
        )
    )
    salted = salted_aggregate(
        orders,
        ["o_orderstatus"],
        {
            "n": ("sum", F.count(F.lit(1))),
            "spend": ("sum", F.sum("o_totalprice")),
            "max_key": ("max", F.max("o_orderkey")),
        },
    ).select("o_orderstatus", "n", F.round("spend", 2).alias("spend"), "max_key")
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_partitioned_write_prunes(spark):
    orders = load_table(spark, SF_DIR, "orders")
    out = os.path.join(tempfile.mkdtemp(prefix="w2e_part_"), "orders_by_status")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    # hive-style layout on disk
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = back._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:1500]
    # pruned read returns exactly the partition's rows
    expected = orders.filter(F.col("o_orderstatus") == "O").count()
    assert back.count() == expected
