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
    SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
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


# ---------------------------------------------------------------------------
# m3: resize stage — mapInPandas payload→payload. The oracle checks
# the plumbing invariants (output payload sized by TARGET dims, one
# row per input); the kernel bytes themselves are the swappable fake.
# ---------------------------------------------------------------------------
@query(
    "m3_resize_plumbing",
    oracle="""
    SELECT doc_id, (64 * 48 * 3)::BIGINT AS n_bytes, 64::INTEGER AS width,
           48::INTEGER AS height
    FROM documents ORDER BY doc_id
    """,
)
def m3_resize_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    resized = MM.resize_images(MM.attach_binary_payload(docs), width=64, height=48)
    return resized.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        "width",
        "height",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# m4: video frame sampling — 1→N fan-out through mapInPandas; frame
# count, timestamps AND per-frame fingerprints all oracle-checked
# (the fake probe/fingerprint are engine-portable by construction).
# ---------------------------------------------------------------------------
@query(
    "m4_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id, text,
             octet_length(encode(text)) % 30 + 1 AS dur
      FROM documents
    )
    SELECT doc_id, k::INTEGER AS frame_idx, (k * 2.0)::DOUBLE AS ts_seconds,
           sha256(text || k::VARCHAR) AS frame_sha
    FROM v, LATERAL (SELECT unnest(range(0, CAST(ceil(dur / 2.0) AS BIGINT))) AS k)
    ORDER BY doc_id, frame_idx
    """,
)
def m4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = MM.sample_video_frames(MM.attach_binary_payload(docs), every_n_seconds=2.0)
    return frames.orderBy("doc_id", "frame_idx")
