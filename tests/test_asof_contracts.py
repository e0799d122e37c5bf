"""Contract tests for asof_join / range_join edge cases.

Covers the two round-1 advisor findings: (1) right rows with NULL
time used to sort nulls-first and leak their payload into early left
rows; (2) range_join used a hardcoded ±1-bucket replication, silently
dropping matches whenever bucket < max(lower, upper). Both now have
explicit contracts.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from workhop2_etl_spark.operators.asof import asof_join, range_join


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_null_right_time_never_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(5))], "id long, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, "leak"), (1, _ts(4), "real")],
        "rid long, t timestamp, tag string",
    )
    out = asof_join(
        left.withColumnRenamed("id", "k"),
        right.withColumnRenamed("rid", "k"),
        left_key="k",
        right_key="k",
        left_time="t",
        right_time="t",
        payload=["tag"],
    )
    rows = {r.k: r.tag for r in out.collect()}
    # id=1 at 01:00 precedes every real right row -> NULL, not "leak";
    # id=2 at 05:00 matches the 04:00 row (but key differs -> NULL).
    assert rows[1] is None
    assert rows[2] is None


def test_asof_null_left_time_survives_with_null_payload(spark):
    left = spark.createDataFrame([(1, None)], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts(2), "x")], "k long, t timestamp, tag string"
    )
    out = asof_join(
        left, right, left_key="k", right_key="k",
        left_time="t", right_time="t", payload=["tag"],
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].tag is None


def test_asof_forward_null_left_time_gets_null_payload(spark):
    """Regression: forward direction sorted plain desc (nulls LAST),
    so a NULL-time left row landed after every right row and carried
    the earliest right payload — a fabricated match. Must be NULL,
    and real forward matches must be unaffected."""
    left = spark.createDataFrame(
        [(1, _ts(6)), (2, None)], "id long, t timestamp"
    ).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(1, _ts(7), "seven"), (1, _ts(9), "nine")], "k long, t timestamp, tag string"
    )
    out = asof_join(
        left.select("id", "k", "t"), right, left_key="k", right_key="k",
        left_time="t", right_time="t", payload=["tag"], direction="forward",
    )
    rows = {r.id: r.tag for r in out.collect()}
    assert rows[1] == "seven"  # earliest right row >= 06:00
    assert rows[2] is None  # NULL left time: no match, not 'nine'


def test_range_join_small_bucket_matches_naive_join(spark):
    """bucket < span used to silently drop matches; the replication
    count is now derived from the spans, so any bucket is correct."""
    left = spark.createDataFrame(
        [(i, 1, _ts(i)) for i in range(1, 12)], "lid long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(100 + i, 1, _ts(i, 30)) for i in range(0, 12)],
        "rid long, rk long, rt timestamp",
    )
    got = range_join(
        left, right, on_key=("k", "rk"), left_time="lt", right_time="rt",
        lower="3 hours", upper="2 hours", bucket="1 hour",
    )
    naive = left.join(
        right,
        (F.col("k") == F.col("rk"))
        & (F.col("rt") >= F.col("lt") - F.expr("INTERVAL 3 hours"))
        & (F.col("rt") <= F.col("lt") + F.expr("INTERVAL 2 hours")),
        "inner",
    )
    got_pairs = sorted((r.lid, r.rid) for r in got.collect())
    naive_pairs = sorted((r.lid, r.rid) for r in naive.collect())
    assert got_pairs == naive_pairs
    assert got_pairs  # non-vacuous


def test_range_join_big_bucket_matches_naive_join(spark):
    left = spark.createDataFrame(
        [(i, 1, _ts(i)) for i in range(1, 12)], "lid long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(100 + i, 1, _ts(i, 30)) for i in range(0, 12)],
        "rid long, rk long, rt timestamp",
    )
    got = range_join(
        left, right, on_key=("k", "rk"), left_time="lt", right_time="rt",
        lower="90 minutes", upper="30 minutes", bucket="4 hours",
    )
    naive = left.join(
        right,
        (F.col("k") == F.col("rk"))
        & (F.col("rt") >= F.col("lt") - F.expr("INTERVAL 90 minutes"))
        & (F.col("rt") <= F.col("lt") + F.expr("INTERVAL 30 minutes")),
        "inner",
    )
    assert sorted((r.lid, r.rid) for r in got.collect()) == sorted(
        (r.lid, r.rid) for r in naive.collect()
    )


def test_asof_tolerance_bounds_match_distance(spark):
    """Backward and forward matches farther than the tolerance yield
    NULL payload; matches at exactly the tolerance still match."""
    left = spark.createDataFrame(
        [(1, 1, _ts(6)), (2, 1, _ts(12))], "lid long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [(101, 1, _ts(5)), (102, 1, _ts(4))], "rid long, k long, t timestamp"
    )
    # backward: lid=1 at h6 → rid=101 at h5 (1h back, inside 1h tol);
    # lid=2 at h12 → nearest is h5 (7h back) → NULL under tol
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "k", "t", "t", ["rid"],
            direction="backward", tolerance="1 hour",
        ).collect()
    }
    assert got == {1: 101, 2: None}

    # forward: lid=1 at h6 has no later right row → NULL; with right
    # at h7 it matches under a 1h tolerance, not under 30 minutes
    right2 = spark.createDataFrame(
        [(201, 1, _ts(7))], "rid long, k long, t timestamp"
    )
    fwd = lambda tol: {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right2, "k", "k", "t", "t", ["rid"],
            direction="forward", tolerance=tol,
        ).collect()
    }
    assert fwd("1 hour") == {1: 201, 2: None}
    assert fwd("30 minutes") == {1: None, 2: None}


def test_interval_overlap_join_contracts(spark):
    """Exactly-once emission across bucket boundaries, inclusive
    endpoint semantics, NULL endpoints never match, and collision
    suffixing — the contracts the SQL restatement in the j12 oracle
    relies on."""
    from workhop2_etl_spark.operators.asof import interval_overlap_join

    m = lambda mins: _ts(0, 0) + dt.timedelta(minutes=mins)
    left = spark.createDataFrame(
        [
            (1, 1, m(0), m(50)),    # spans many 10-minute buckets
            (2, 1, m(60), m(61)),   # disjoint from everything on key 1
            (3, 2, m(0), m(1)),     # other key
            (4, 1, None, m(5)),     # NULL start never matches
        ],
        "lid long, k long, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 1, m(10), m(20)),  # inside lid=1's interval
            (102, 1, m(50), m(55)),  # touches lid=1 exactly at the end
            (103, 1, m(51), m(52)),  # just past lid=1 (closed-interval miss)
            (104, 2, m(1), m(2)),    # touches lid=3 at its end point
        ],
        "rid long, k long, s timestamp, e timestamp",
    )
    out = interval_overlap_join(
        left, right, on="k", left_start="s", left_end="e",
        right_start="s", right_end="e", bucket="10 minutes",
    )
    pairs = [(r["lid"], r["rid"]) for r in out.collect()]
    # exactly once despite lid=1 and rid=101 sharing ~10 buckets
    assert sorted(pairs) == [(1, 101), (1, 102), (3, 104)]
    # collision suffixing: right's k/s/e renamed, all columns unambiguous
    assert out.columns == ["lid", "k", "s", "e", "rid", "k_r", "s_r", "e_r"]


def test_asof_nearest_tie_prefers_backward(spark):
    from workhop2_etl_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame([(1, _ts(3))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts(2), "before"), (1, _ts(4), "after")],
        "k long, t timestamp, tag string",
    )
    out = asof_nearest_join(
        left, right, left_key="k", right_key="k",
        left_time="t", right_time="t", payload=["tag"],
    )
    assert out.collect()[0].tag == "before"


def test_asof_nearest_picks_closer_side_and_exact_match(spark):
    from workhop2_etl_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame(
        [(1, _ts(3)), (2, _ts(3)), (3, _ts(3))], "k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts(1), "far-b"), (1, _ts(3, 30), "near-f"),
            (2, _ts(2, 45), "near-b"), (2, _ts(5), "far-f"),
            (3, _ts(3), "exact"), (3, _ts(3, 1), "later"),
        ],
        "k long, t timestamp, tag string",
    )
    out = asof_nearest_join(
        left, right, left_key="k", right_key="k",
        left_time="t", right_time="t", payload=["tag"],
    )
    rows = {r.k: r.tag for r in out.collect()}
    assert rows == {1: "near-f", 2: "near-b", 3: "exact"}


def test_asof_nearest_tolerance_and_null_times(spark):
    from workhop2_etl_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame(
        [(1, _ts(3)), (2, None), (3, _ts(12))], "k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), "out-of-tol"),      # 2h away, tol 1h
            (2, _ts(1), "null-left"),        # left time NULL -> no match
            (3, None, "null-right"),         # NULL right never matches
            (3, _ts(11, 30), "in-tol"),
        ],
        "k long, t timestamp, tag string",
    )
    out = asof_nearest_join(
        left, right, left_key="k", right_key="k",
        left_time="t", right_time="t", payload=["tag"],
        tolerance="1 hour",
    )
    rows = {r.k: r.tag for r in out.collect()}
    assert rows == {1: None, 2: None, 3: "in-tol"}
