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


# ---------------------------------------------------------------------------
# m5: REAL image decode in the oracle gate — payloads are genuine PNG
# bytes (unbase64 of three fixed files generated once with
# operators/imagecodec.png_encode), and the metadata stage must
# recover each file's TRUE header dimensions through the same
# mapInPandas kernel the stub fixtures use. The oracle states the
# known dims/sizes per variant (constants verifiable offline with any
# PNG tool), so a regression anywhere in unbase64 → Arrow batch →
# header parse breaks the hash.
# ---------------------------------------------------------------------------
#: 20x10 RGB / 7x5 gray / 4x9 RGBA PNGs (deterministic gradients).
_PNG_B64 = {
    0: "iVBORw0KGgoAAAANSUhEUgAAABQAAAAKCAIAAAA7N+mxAAACVUlEQVR4nGNgkLViV3Hk0/YQNfKXsQxTdojVck8x9Mu2CC2yj6l0S27wzWoPKeyLrpiaVD8ns21xQe+q8ikb62bvaF20n4FXy13E0E/aIlTJPkbTLdnAN8s8pNAuusI1qd4nsy24oDeqfEpi3eyM1kX5PSvLJm+onbW9ZeG+7hVHJ60/wyBlHqJoF63hmqTvk2kWXGAbVe6SWOed0RqU3xNZNjmhdlZ6y8K87hWlk9bXzNzWvGBv1/IjE9ednrH10vw9NxnUXRL1vDNMg/JtIsucE2q90lsC87ojSifF18xMa16Q27W8ZOK66hlbm+bv6Vx2eMLaU9O3XJy3+8bSQ/fXnHzGYBKYZx1R6hRf45nWHJDbFV4yMa56RmrT/JzOZcUT1lZN39I4b3fH0kP9a05O23xh7q7rSw7eW33i6abzb3Ze+8zgGFftkdrkn9MZVjwhtmp6SuO87I6lRf1rKqdtbpi7q33Jwb7VJ6ZuOj9n57XFB+6uOv5k47nXO65+2n/n57HHDAx+2R2hRf0xldOSG+ZmtS8p7FtdMXVT/ZydbYsP9K46PmXjudk7ri7af2flsccbzr7afuXjvts/jj76f+Yl2+UPvAxY46Bn5bHJG87O2n5l4b7bK44+Wn/m5bbLH/be+n7k4b/TL1gvvee5+U34wV8pBqxxMHPb5QV7by0/8nDd6RdbL73fc/Pb4Qd/Tz1nufiO+8ZXoft/JJ8xK7zlUmfAGgfLDj9Ye+r5lovvdt/4euj+n5PPmC+85br+RfDeb4mnTPJvONU+C+j+EjcBAKfyTgDlllnwAAAAAElFTkSuQmCC",
    1: "iVBORw0KGgoAAAANSUhEUgAAAAcAAAAFCAAAAACs8akEAAAAMElEQVR4nGNgYOcTlVHWYuAVkVbSNDBnkFLU0DezdWFQ1zO1cfYKZDCxdvIMCI8DAGBoBm5YNXnyAAAAAElFTkSuQmCC",
    2: "iVBORw0KGgoAAAANSUhEUgAAAAQAAAAJCAYAAAAVb42gAAAApElEQVR4nAGZAGb/AAAdOlcHJEFeDitIZRUyT2wADSpHZBQxTmsbOFVyIj9ceQAaN1RxIT5beChFYn8vTGmGACdEYX4uS2iFNVJvjDxZdpMANFFuiztYdZJCX3yZSWaDoABBXnuYSGWCn09siaZWc5CtAE5riKVVco+sXHmWs2OAnboAW3iVsmJ/nLlphqPAcI2qxwBohaK/b4ypxnaTsM19mrfUbec7odfc+nMAAAAASUVORK5CYII=",
}


@query(
    "m5_real_image_dims",
    oracle="""
    WITH v AS (
      SELECT CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 20 WHEN 1 THEN 7 ELSE 4 END AS width,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 10 WHEN 1 THEN 5 ELSE 9 END AS height,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 4 END AS channels,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 654 WHEN 1 THEN 105 ELSE 221 END AS n_bytes
      FROM documents
    )
    SELECT width::INTEGER AS width, height::INTEGER AS height,
           channels::INTEGER AS channels, n_bytes::BIGINT AS n_bytes,
           count(*) AS n_docs
    FROM v GROUP BY 1, 2, 3, 4 ORDER BY width
    """,
)
def m5_real_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    variant = (F.col("doc_id") % 3).cast("int")
    b64 = (
        F.when(variant == 0, F.lit(_PNG_B64[0]))
        .when(variant == 1, F.lit(_PNG_B64[1]))
        .otherwise(F.lit(_PNG_B64[2]))
    )
    staged = docs.select("doc_id", F.unbase64(b64).alias("payload"))
    meta = MM.extract_image_meta(staged)
    return (
        meta.groupBy("width", "height", "channels", "n_bytes")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("width")
    )
