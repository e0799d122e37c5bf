"""Session-conf sensitivity: the driver runs our queries with ITS
SparkSession, whose confs (timezone, ANSI mode) are not ours. Every
query must therefore be a pure function of the input data — a result
that shifts when ``spark.sql.session.timeZone`` changes would flip
the driver's value hash even though the logic is right (the r06
verdict flagged exactly this exposure for the date-bucketing
queries).

The tests re-run a conf-exposed query subset under a non-UTC session
timezone (and with ANSI mode flipped) and assert bit-identical
results. Subset choice:

- date buckets from events.ts: dq4 (dayofyear parity), r3 (to_date),
  e1 (sessionization timestamps), w7 (per-day windows)
- float report columns: x13 (scaled ints now — must stay identical)
- timestamp coercion output: f6
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from workhop2_etl_spark import suite

suite.load_all()

QUERIES = [
    "dq4_profile_drift",
    "r3_hist_quantiles",
    "e1_sessionize",
    "w7_rolling_corr",
    "x13_weighted_sample",
    "f6_timestamp_coerce",
]


def _rows(spark, name):
    df = suite.QUERIES[name](spark, SF_DIR)
    return sorted(repr(tuple(r)) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_results_independent_of_session_timezone(spark, name):
    base = _rows(spark, name)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        shifted = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert shifted == base


@pytest.mark.parametrize("name", QUERIES)
def test_results_independent_of_ansi_mode(spark, name):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    flipped = "false" if prev == "true" else "true"
    base = _rows(spark, name)
    spark.conf.set("spark.sql.ansi.enabled", flipped)
    try:
        other = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert other == base


def test_results_independent_of_ntz_inference(spark):
    """With parquet NTZ inference off, events.ts reads as an instant;
    load_table must rebuild the same UTC wall-clock (via unix_micros
    arithmetic), not a session-tz rendering — the date buckets of a
    representative query must not move, even under a non-UTC tz."""
    name = "r3_hist_quantiles"
    base = _rows(spark, name)
    tz_prev = spark.conf.get("spark.sql.session.timeZone")
    infer_prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        shifted = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_prev)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", infer_prev)
    assert shifted == base
