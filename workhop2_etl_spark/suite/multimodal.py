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


# ---------------------------------------------------------------------------
# m6: REAL audio metadata in the oracle gate — same pattern as m5:
# payloads are genuine RIFF/WAVE bytes (unbase64 of three fixed
# silence files generated with operators/audiocodec.wav_encode), and
# the metadata stage must recover each file's TRUE header fields
# through the mapInPandas kernel. The oracle states the known values
# per variant (verifiable offline with any WAV tool).
# ---------------------------------------------------------------------------
_WAV_B64 = {
    0: "UklGRmQGAABXQVZFZm10IBAAAAABAAEAgD4AAAB9AAACABAAZGF0YUAGAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
    1: "UklGRuQSAABXQVZFZm10IBAAAAABAAIAQB8AAAB9AAAEABAAZGF0YcASAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=",
    2: "UklGRt0BAABXQVZFZm10IBAAAAABAAEARKwAAESsAAABAAgAZGF0YbkBAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=",
}


@query(
    "m6_real_audio_meta",
    oracle="""
    WITH v AS (
      SELECT CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 1 END AS channels,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 16000 WHEN 1 THEN 8000 ELSE 44100 END AS sample_rate,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 16 WHEN 1 THEN 16 ELSE 8 END AS bits,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 800 WHEN 1 THEN 1200 ELSE 441 END AS n_frames,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 0.05 WHEN 1 THEN 0.15 ELSE 0.01 END AS duration_s
      FROM documents
    )
    SELECT channels::INTEGER AS channels, sample_rate::INTEGER AS sample_rate,
           bits::INTEGER AS bits, n_frames::BIGINT AS n_frames,
           duration_s::DOUBLE AS duration_s, count(*) AS n_docs,
           CAST(round(sum(duration_s), 2) AS DOUBLE) AS total_seconds
    FROM v GROUP BY 1, 2, 3, 4, 5 ORDER BY sample_rate
    """,
)
def m6_real_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    variant = (F.col("doc_id") % 3).cast("int")
    b64 = (
        F.when(variant == 0, F.lit(_WAV_B64[0]))
        .when(variant == 1, F.lit(_WAV_B64[1]))
        .otherwise(F.lit(_WAV_B64[2]))
    )
    staged = docs.select("doc_id", F.unbase64(b64).alias("payload"))
    meta = MM.extract_audio_meta(staged)
    return (
        meta.groupBy("channels", "sample_rate", "bits", "n_frames", "duration_s")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("duration_s"), 2).alias("total_seconds"),
        )
        .orderBy("sample_rate")
    )


# ---------------------------------------------------------------------------
# m7: REAL frame sampling in the oracle gate — payloads are genuine
# animated GIFs (unbase64 of three fixed files written by
# operators/imagecodec.gif_encode: real LZW bitstreams, any viewer
# renders them). The sampling stage must walk each container's TRUE
# frame descriptors and per-frame delays: variant 0 = 2×10cs frames,
# variant 1 = 5/10/15cs (uneven timeline → ticks land on different
# frames), variant 2 = single zero-delay frame (clamped to the
# conventional 10cs). Tick spacing 0.04s deliberately avoids every
# frame-start instant, so no comparison sits on a float boundary.
# ---------------------------------------------------------------------------
_GIF_B64 = {
    0: "R0lGODlhFAAKAIEAAAAAAP8AAAD/AAAA/yH5BAAKAAAALAAAAAAUAAoAAAKuBAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAFAAACH5BAAKAAAALAAAAAAUAAoAAAKuTBIRERERQgghhBBCCCGEEARBEARBEARBEARBEARBEARBEARBEARBEAgEAoFAIBAIBAKBQCAQCAQCgUAgEAgEAoFAIBAIBAKBQCAQCAQCgUAgEAgEAoFAIBAIBAKBQCAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEFAAADs=",
    1: "R0lGODlhCQAGAIEAAAAAAP8AAAD/AAAA/yH5BAAFAAAALAAAAAAHAAUAAAIXBAAAAAAAAAAAAAAAAAAAAAAAAAAAUAAAIfkEAAoAAAAsAgABAAcABQAAAhdMEhERERFCCCGEEEIIIYQQBEEQBEFQAAAh+QQADwAAACwAAAAABwAFAAACF5QkIiIiIoQQQgghhBBCCCEIgiAIglAAADs=",
    2: "R0lGODlhBAAJAIEAAAAAAP8AAAD/AAAA/yH5BAAAAAAALAAAAAAEAAkAAAIXBAAAAAAAAAAAAAAAAAAAAAAAAAAAABQAOw==",
}


@query(
    "m7_real_gif_frames",
    oracle="""
    WITH v AS (
      SELECT CAST(doc_id % 3 AS INTEGER) AS variant,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 5 WHEN 1 THEN 8 ELSE 3 END AS ticks,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 0 END AS max_idx,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 1 END AS n_sha,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 0.40 WHEN 1 THEN 1.12 ELSE 0.12 END AS per_doc_ts
      FROM documents
    )
    SELECT variant, count(*) AS n_docs,
           CAST(sum(ticks) AS BIGINT) AS n_frame_rows,
           CAST(max(max_idx) AS INTEGER) AS max_frame_idx,
           CAST(max(n_sha) AS BIGINT) AS n_frame_shas,
           CAST(round(sum(per_doc_ts), 2) AS DOUBLE) AS total_ts
    FROM v GROUP BY 1 ORDER BY 1
    """,
)
def m7_real_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    variant = (F.col("doc_id") % 3).cast("int")
    b64 = (
        F.when(variant == 0, F.lit(_GIF_B64[0]))
        .when(variant == 1, F.lit(_GIF_B64[1]))
        .otherwise(F.lit(_GIF_B64[2]))
    )
    staged = docs.select("doc_id", F.unbase64(b64).alias("payload"))
    frames = MM.sample_video_frames(staged, every_n_seconds=0.04)
    return (
        frames.withColumn("variant", (F.col("doc_id") % 3).cast("int"))
        .groupBy("variant")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_frame_rows"),
            F.max("frame_idx").alias("max_frame_idx"),
            F.countDistinct("frame_sha").alias("n_frame_shas"),
            F.round(F.sum("ts_seconds"), 2).alias("total_ts"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# m8: REAL feature extraction in the oracle gate — the same three
# genuine PNGs as m5, but now the kernel DECODES THE PIXELS
# (imagecodec.decode_array → stdlib PNG codec here, PIL when
# installed) and computes per-channel means + Rec.601 luma standard
# deviation. The oracle states each file's true statistics
# (verifiable offline with any image tool); matching them proves the
# full unfilter→reconstruct path, not just header parsing. This
# closes the m-family tier ladder: metadata (m1/m5), filter-before-
# decode (m2), resize (m3), frame sampling (m4/m7), audio (m6),
# features (m8).
# ---------------------------------------------------------------------------
@query(
    "m8_real_image_features",
    oracle="""
    WITH v AS (
      SELECT CAST(doc_id % 3 AS INTEGER) AS variant,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 20 WHEN 1 THEN 7 ELSE 4 END AS width,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 10 WHEN 1 THEN 5 ELSE 9 END AS height,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 125.0 WHEN 1 THEN 47.0 ELSE 62.5 END AS mean_r,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 146.32 WHEN 1 THEN 47.0 ELSE 91.5 END AS mean_g,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 156.12 WHEN 1 THEN 47.0 ELSE 120.5 END AS mean_b,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 49.0811 WHEN 1 THEN 23.1084 ELSE 34.4662 END AS luma_std
      FROM documents
    )
    SELECT variant, width::INTEGER AS width, height::INTEGER AS height,
           mean_r::DOUBLE AS mean_r, mean_g::DOUBLE AS mean_g,
           mean_b::DOUBLE AS mean_b, luma_std::DOUBLE AS luma_std,
           count(*) AS n_docs
    FROM v GROUP BY 1, 2, 3, 4, 5, 6, 7 ORDER BY variant
    """,
)
def m8_real_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    variant = (F.col("doc_id") % 3).cast("int")
    b64 = (
        F.when(variant == 0, F.lit(_PNG_B64[0]))
        .when(variant == 1, F.lit(_PNG_B64[1]))
        .otherwise(F.lit(_PNG_B64[2]))
    )
    staged = docs.select("doc_id", F.unbase64(b64).alias("payload"))
    feats = MM.extract_image_features(staged)
    return (
        feats.select(
            (F.col("doc_id") % 3).cast("int").alias("variant"),
            "width",
            "height",
            F.round("mean_r", 4).alias("mean_r"),
            F.round("mean_g", 4).alias("mean_g"),
            F.round("mean_b", 4).alias("mean_b"),
            F.round("luma_std", 4).alias("luma_std"),
        )
        .groupBy(
            "variant", "width", "height", "mean_r", "mean_g", "mean_b", "luma_std"
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# m9: the multimodal pipeline END TO END — raw files on disk through
# the binaryFile source (glob filters decoys at listing time, so the
# .txt files are never opened) → Arrow-batched pixel decode → feature
# stats → summary, in one plan. The staged directory holds 30 real
# PNGs (10 per m5/m8 fixture variant) plus 5 text decoys; the oracle
# states each variant's known dimensions and pixel statistics with
# exact file counts — so ingestion, globbing, decoding, and the
# feature math are all on the hook at once.
# ---------------------------------------------------------------------------
@query(
    "m9_multimodal_pipeline",
    oracle="""
    SELECT CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(mean_r AS DOUBLE) AS mean_r,
           CAST(mean_g AS DOUBLE) AS mean_g,
           CAST(mean_b AS DOUBLE) AS mean_b,
           CAST(luma_std AS DOUBLE) AS luma_std,
           CAST(n_files AS BIGINT) AS n_files
    FROM (VALUES
      (4, 9, 62.5, 91.5, 120.5, 34.4662, 10),
      (7, 5, 47.0, 47.0, 47.0, 23.1084, 10),
      (20, 10, 125.0, 146.32, 156.12, 49.0811, 10)
    ) AS t(width, height, mean_r, mean_g, mean_b, luma_std, n_files)
    ORDER BY width
    """,
)
def m9_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import base64
    import os

    from workhop2_etl_spark.sources.readers import read_binary_files
    from workhop2_etl_spark.suite import io_dir

    d = io_dir("m9_files")
    os.makedirs(d, exist_ok=True)
    for i in range(30):
        with open(os.path.join(d, f"img_{i:02d}.png"), "wb") as f:
            f.write(base64.b64decode(_PNG_B64[i % 3]))
    for i in range(5):
        with open(os.path.join(d, f"note_{i}.txt"), "w") as f:
            f.write("not an image, never opened")

    files = read_binary_files(spark, d, glob="*.png")
    staged = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.png", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = MM.extract_image_features(staged)
    return (
        feats.groupBy(
            "width",
            "height",
            F.round("mean_r", 4).alias("mean_r"),
            F.round("mean_g", 4).alias("mean_g"),
            F.round("mean_b", 4).alias("mean_b"),
            F.round("luma_std", 4).alias("luma_std"),
        )
        .agg(F.count(F.lit(1)).alias("n_files"))
        .orderBy("width")
    )


# ---------------------------------------------------------------------------
# m10: REAL JPEG decode in the oracle gate (r07 verdict ask #4) —
# payloads are genuine baseline-sequential JFIF bytes (generated once
# with operators/imagecodec.jpeg_encode; verifiable offline with any
# JPEG tool), one per decoder path: 4:4:4 RGB, grayscale, and
# 4:2:0-subsampled with restart markers. The feature stage must
# Huffman-decode, dequantize, IDCT, upsample, and color-convert real
# entropy-coded pixels through the same Arrow-batched kernel the PNG
# fixtures use, with decode_tier naming the stdlib JPEG tier — the
# modality that previously fell to decode_tier='none' NULL features.
# Oracle constants are the exact decoded-pixel statistics of the
# stdlib tier, and the query PINS that tier (allow_pil=False) so the
# gate is green in every environment — with PIL installed the tier
# would otherwise flip to 'pil', whose IDCT/upsample rounding differs
# at the 4th decimal (r08 ADVICE #2; the pytest twin covers the PIL
# branch when available).
# ---------------------------------------------------------------------------
#: 20x10 RGB 4:4:4 / 7x5 gray / 12x9 RGB 4:2:0+DRI baseline JFIFs.
_JPEG_B64 = {
    0: "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAT/wAARCAAKABQDAREAAhEAAxEA/8QAHwAAAAAMAAAAAAAAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAAAAAAAAogAAAAAAAAAAAPABAgMEBQYHCAkKERITFBUWFxgZGiEiIyQlJicoKSoxMjM0NTY3ODk6QUJDREVGR0hJSlFSU1RVVldYWVphYmNkZWZnaGlqcXJzdHV2d3h5eoGCg4SFhoeIiYqRkpOUlZaXmJmaoaKjpKWmp6ipqrGys7S1tre4ubrBwsPExcbHyMnK0dLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oADAMBAAIAAwAAPwB3QO+DiEIME0FaANOAM6APwB3wcQhBgmgrQAAAAB5oIAdgFUEQIgNAwOQHglDAEAgFAoHAiA0DAOAwWgQCCwNgKB4GgQCgUCAQMBkNQyBAIGQwGQ2AgFAgEdmDYCLAOmDIBdA4FIDQPBcBqgUDARgjA8DwWQY4GApgtgpAaBwJAIBQOAgIQNBZBIC6CuBgJgSAaBgaAcCQCggDqCIDAKB4EBEBQSh3BGCYEQIk0EYKIJwSAaGwYA0DBaBQIGoJA2A0DhYVQwBANAoYAhoDIYAosDIYDAFAgFArHA74IgRi4MMDCoVgGwgAeYAIQA9UEIGgaBANBUA0CAaBAIBoHh0DcDQIBAIBANA4NQKCICgaGwEAgsA4NQKLQIGQyGAKLQIAOHCOALYLQIQQA74KoIQWQWARAqguCFQ+wVgRgmBIBgIAWg9wPBkgkBXD5BCBoHAQEYJw4AkAoFBICEOoGgcHIDwKBQOAwNQOAoZAFoDNA0DQKBQSgcBQNAgFA4DQ0DUCgUCAQCgUDQyHQCAUMAUggQMgQWAUMEEqgEDYEBZBYBogUCguA0ATgmBeBbBMGgdgWgXASgeCyCyCUOYIwMBECMOgJwTgcB4JQPDQEQGAYCMDA2A4ChqCMDANAwDQwBoGgQCAReAgBACAFYEQGggBWBCCIFcEIGBsGgIQQAjAwEQIgMDYDgKB4HBqCMEYEA0DANDYDwOA4DgODAEAgZA4DgKBwFFoFAoFAI5gVgVgVgUwQgYCsCoCuCAFUFcEYbBzBACsCIEYIAQgjDcDwOBIB4aAiBEBoGgYBobAeBwHAeBwagaBA2A8DgOA4ChkCgUCgUA//9k=",
    1: "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAT/wAALCAAFAAcBAREA/8QAHwAAAAAMAAAAAAAAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAAAAAAAAogAAAAAAAAAAAPABAgMEBQYHCAkKERITFBUWFxgZGiEiIyQlJicoKSoxMjM0NTY3ODk6QUJDREVGR0hJSlFSU1RVVldYWVphYmNkZWZnaGlqcXJzdHV2d3h5eoGCg4SFhoeIiYqRkpOUlZaXmJmaoaKjpKWmp6ipqrGys7S1tre4ubrBwsPExcbHyMnK0dLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/AIdgYQO4CiGoEFhWmqBDQkQD/9k=",
    2: "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAT/wAARCAAJAAwDASIAAhEAAxEA/8QAHwAAAAAMAAAAAAAAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAAAAAAAAogAAAAAAAAAAAPABAgMEBQYHCAkKERITFBUWFxgZGiEiIyQlJicoKSoxMjM0NTY3ODk6QUJDREVGR0hJSlFSU1RVVldYWVphYmNkZWZnaGlqcXJzdHV2d3h5eoGCg4SFhoeIiYqRkpOUlZaXmJmaoaKjpKWmp6ipqrGys7S1tre4ubrBwsPExcbHyMnK0dLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/90ABAAB/9oADAMBAAIAAwAAPwBhwdkIRkTGWNBWRwAfkDPCEYywGDKs4fAIfAB4oOyWNSAD8gZ5GwGAJUAgAYBlg0wWQ5kEqAQqgUAU4Q0CJIPAIOAoxSxAaWQDjSBp8AP/2Q==",
}


@query(
    "m10_real_jpeg_features",
    oracle="""
    WITH v AS (
      SELECT CAST(doc_id % 3 AS INTEGER) AS variant,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 20 WHEN 1 THEN 7 ELSE 12 END AS width,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 10 WHEN 1 THEN 5 ELSE 9 END AS height,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 124.765 WHEN 1 THEN 47.2857 ELSE 127.5648
             END AS mean_r,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 146.26 WHEN 1 THEN 47.2857 ELSE 126.6019
             END AS mean_g,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 156.175 WHEN 1 THEN 47.2857 ELSE 125.9722
             END AS mean_b,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 49.037 WHEN 1 THEN 22.5649 ELSE 59.4492
             END AS luma_std
      FROM documents
    )
    SELECT variant, width::INTEGER AS width, height::INTEGER AS height,
           mean_r::DOUBLE AS mean_r, mean_g::DOUBLE AS mean_g,
           mean_b::DOUBLE AS mean_b, luma_std::DOUBLE AS luma_std,
           'stdlib-jpeg' AS decode_tier, count(*) AS n_docs
    FROM v GROUP BY 1, 2, 3, 4, 5, 6, 7 ORDER BY variant
    """,
)
def m10_real_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    variant = (F.col("doc_id") % 3).cast("int")
    b64 = (
        F.when(variant == 0, F.lit(_JPEG_B64[0]))
        .when(variant == 1, F.lit(_JPEG_B64[1]))
        .otherwise(F.lit(_JPEG_B64[2]))
    )
    staged = docs.select("doc_id", F.unbase64(b64).alias("payload"))
    # allow_pil=False: the oracle's constants are the stdlib tier's
    # exact pixel statistics — pinning the tier keeps this gate green
    # whether or not PIL is installed (r08 ADVICE #2)
    feats = MM.extract_image_features(staged, allow_pil=False)
    return (
        feats.select(
            (F.col("doc_id") % 3).cast("int").alias("variant"),
            "width",
            "height",
            F.round("mean_r", 4).alias("mean_r"),
            F.round("mean_g", 4).alias("mean_g"),
            F.round("mean_b", 4).alias("mean_b"),
            F.round("luma_std", 4).alias("luma_std"),
            "decode_tier",
        )
        .groupBy(
            "variant", "width", "height", "mean_r", "mean_g", "mean_b",
            "luma_std", "decode_tier",
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("variant")
    )
