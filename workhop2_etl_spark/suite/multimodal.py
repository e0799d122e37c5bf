"""Multimodal-column queries — binary payload plumbing over documents.

The payload is the UTF-8 bytes of `text` (in production: real media
bytes from parquet/webdataset). The decode stage is a genuine
Arrow-batched mapInPandas pass — the *stub* is only the codec call
inside it, which derives deterministic metadata from the bytes, so
the whole path (binary column → pandas batches → typed metadata
frame) is exercised and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.operators import multimodal as MM
from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.suite import query


# ---------------------------------------------------------------------------
# m1: binary ingest + mapInPandas metadata extraction (fake decode)
# ---------------------------------------------------------------------------
@query(
    "m1_image_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           (octet_length(encode(text)) % 640 + 1)::INTEGER AS width,
           (octet_length(encode(text)) % 480 + 1)::INTEGER AS height,
           3::INTEGER AS channels
    FROM documents ORDER BY doc_id
    """,
)
def m1_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = MM.attach_binary_payload(docs)
    return MM.extract_image_meta(with_payload).orderBy("doc_id")


# ---------------------------------------------------------------------------
# m2: metadata-only filter — pushdown-friendly predicate that never
# touches the payload bytes (the scale-critical property: filters on
# typed metadata columns prune before decode)
# ---------------------------------------------------------------------------
@query(
    "m2_meta_filter",
    oracle="""
    SELECT source, count(*) AS n, sum(n_chars) AS total_chars
    FROM documents
    WHERE n_chars BETWEEN 100 AND 400
    GROUP BY source ORDER BY source
    """,
)
def m2_meta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars").between(100, 400))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source")
    )
