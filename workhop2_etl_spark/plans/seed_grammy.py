"""Seed loader — the reference's `dags/cargar_grammy.py` as a plan.

CSV → typed casts (winner→bool-as-int, published/updated→timestamp
with null-on-error) → JDBC overwrite. The reference reads with pandas
and funnels through one SQLAlchemy connection; here the read is a
schema-declared scan and the write fans out per-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.functions import clean
from workhop2_etl_spark.plans.schemas import GRAMMY_SCHEMA
from workhop2_etl_spark.sources import readers, writers


def prepare_seed(grammy_raw: DataFrame) -> DataFrame:
    """The loader's transform (dags/cargar_grammy.py:8-10):
    winner 'True'/'False' → 1/0 (MySQL tinyint convention there);
    published_at/updated_at parsed with errors='coerce' semantics."""
    return (
        grammy_raw.withColumn("winner", clean.str_to_bool(F.col("winner")).cast("int"))
        .withColumn("published_at", clean.parse_timestamp_coerce(F.col("published_at")))
        .withColumn("updated_at", clean.parse_timestamp_coerce(F.col("updated_at")))
    )


def seed_grammy(
    spark: SparkSession,
    csv_path: str,
    jdbc_url: str | None = None,
    table: str = "grammy",
) -> DataFrame:
    """Full seed pipeline. Returns the prepared frame; writes via JDBC
    only when a URL is supplied (none exists in the test container —
    the writer code path is exercised against real databases only)."""
    raw = readers.read_csv(spark, csv_path, schema=GRAMMY_SCHEMA)
    prepared = prepare_seed(raw)
    if jdbc_url:
        writers.write_jdbc(prepared, jdbc_url, table, mode="overwrite")
    return prepared
