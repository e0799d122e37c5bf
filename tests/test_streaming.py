"""Streaming ≡ batch: each window transform, run as a genuine
Structured-Streaming query (readStream → availableNow → memory sink),
must produce exactly the batch result of the same function.
"""

from __future__ import annotations

import os

import pytest

from workhop2_etl_spark.streaming import windows as SW

from tests.conftest import SF_DIR

EVENTS = os.path.join(SF_DIR, "events.parquet")


def _rows(df):
    return sorted(tuple(str(c) for c in r) for r in df.collect())


@pytest.mark.parametrize(
    "name,transform",
    [
        ("tumbling", lambda df, wm: SW.tumbling_counts(df, "1 hour", watermark=wm)),
        ("sliding", lambda df, wm: SW.sliding_counts(df, "1 hour", "15 minutes", watermark=wm)),
        ("session", lambda df, wm: SW.session_windows(df, "10 minutes", watermark=wm)),
    ],
)
def test_stream_equals_batch(spark, name, transform):
    batch = transform(spark.read.parquet(EVENTS), None)
    streamed = SW.run_stream_to_memory(
        spark, EVENTS, transform, f"stream_{name}", watermark=SW.DEFAULT_WATERMARK
    )
    assert _rows(streamed) == _rows(batch)
