"""Raw-file multimodal ingestion: binaryFile source → decode stage.

Proves the missing first step of the m1–m4 story: image shards as
loose files become the opaque binary column the Arrow decode stage
consumes — glob filtering at listing time, metadata projection
without touching payload bytes, and the full glue into
extract_image_meta.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from workhop2_etl_spark.operators.multimodal import extract_image_meta
from workhop2_etl_spark.sources.readers import read_binary_files


def _write_files(tmp_path):
    (tmp_path / "shard0").mkdir()
    payloads = {}
    for i in range(5):
        name = f"shard0/img_{i}.jpg"
        data = bytes([i]) * (100 + 37 * i)
        (tmp_path / name).write_bytes(data)
        payloads[str(tmp_path / name)] = data
    # a non-matching file the glob must exclude
    (tmp_path / "shard0" / "notes.txt").write_bytes(b"not an image")
    return payloads


def test_binary_file_glob_and_content(spark, tmp_path):
    payloads = _write_files(tmp_path)
    df = read_binary_files(spark, str(tmp_path), glob="*.jpg")
    rows = {r.path.replace("file:", ""): r for r in df.collect()}
    assert set(rows) == set(payloads)
    for p, r in rows.items():
        assert bytes(r.content) == payloads[p]
        assert r.length == len(payloads[p])


def test_binary_file_metadata_only_projection(spark, tmp_path):
    _write_files(tmp_path)
    df = read_binary_files(spark, str(tmp_path), glob="*.jpg").select("path", "length")
    # content never projected — the scan schema must not include it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
    assert df.count() == 5


def test_binary_file_feeds_decode_stage(spark, tmp_path):
    payloads = _write_files(tmp_path)
    files = read_binary_files(spark, str(tmp_path), glob="*.jpg")
    staged = files.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    meta = extract_image_meta(staged).collect()
    assert len(meta) == 5
    by_sha = {m.sha256: m for m in meta}
    for data in payloads.values():
        sha = hashlib.sha256(data).hexdigest()
        assert sha in by_sha
        m = by_sha[sha]
        assert m.n_bytes == len(data)
        assert m.width == len(data) % 640 + 1
        assert m.channels == 3
