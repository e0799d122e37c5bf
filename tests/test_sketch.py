"""Mergeable-sketch contracts (operators/sketch.py): KMV distinct
counting and count-min frequency estimation. The r4/r5 oracles prove
the partial-combine algebra cross-engine; these tests pin the
properties an oracle replay cannot state — estimation error bounds,
the never-undercount guarantee, weighted counting, NULL handling,
and exactness below the sketch capacity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workhop2_etl_spark.operators.sketch import (
    cm_estimate,
    cm_partial,
    combine_cm,
    combine_kmv,
    kmv_estimate,
    kmv_partial,
)


def _ids(spark, lo, hi, col="v"):
    return spark.range(lo, hi).select(F.col("id").alias(col))


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_estimate_within_bound(spark):
    # 5000 distinct values, k=256: standard error ≈ 1/sqrt(k-2) ≈ 6.3%;
    # assert a generous 4-sigma envelope — deterministic hash, so this
    # is a fixed number, not a flaky draw
    part = kmv_partial(_ids(spark, 0, 5000), "v", 256)
    row = kmv_estimate(part, 256).collect()[0]
    assert row.n_kept == 256
    assert 5000 * 0.75 <= row.est_distinct <= 5000 * 1.25


def test_kmv_exact_below_capacity(spark):
    # fewer distinct values than k: the sketch saw everything — exact
    part = kmv_partial(_ids(spark, 0, 100), "v", 256)
    row = kmv_estimate(part, 256).collect()[0]
    assert row.n_kept == 100
    assert row.est_distinct == 100.0


def test_kmv_combine_equals_single_shot(spark):
    # combine(kmv(A), kmv(B)) must be ROW-IDENTICAL to kmv(A ∪ B),
    # including overlapping values (same value → same hash → dedup)
    a, b = _ids(spark, 0, 3000), _ids(spark, 2000, 6000)
    merged = combine_kmv(
        [kmv_partial(a, "v", 128), kmv_partial(b, "v", 128)], 128
    )
    single = kmv_partial(a.unionByName(b), "v", 128)
    assert sorted(r.hv for r in merged.collect()) == sorted(
        r.hv for r in single.collect()
    )


def test_kmv_duplicates_and_nulls_ignored(spark):
    dup = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "v long"
    )
    row = kmv_estimate(kmv_partial(dup, "v", 64), 64).collect()[0]
    assert row.n_kept == 2 and row.est_distinct == 2.0


def test_kmv_rejects_bad_k(spark):
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_partial(_ids(spark, 0, 10), "v", 1)


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def _zipf_tokens(spark):
    # token i appears (20 - i) * 10 times, i in 0..19 — a known
    # frequency table with heavy and light items
    rows = [(f"tok{i:02d}",) for i in range(20) for _ in range((20 - i) * 10)]
    return spark.createDataFrame(rows, "tok string")


def test_cm_never_undercounts_and_is_tight_when_wide(spark):
    toks = _zipf_tokens(spark)
    sketch = cm_partial(toks, "tok", depth=3, width=1024)
    items = toks.select("tok").distinct()
    true = {r.tok: (20 - int(r.tok[3:])) * 10 for r in items.collect()}
    est = {
        r.tok: r.n_est
        for r in cm_estimate(sketch, items, "tok", depth=3, width=1024).collect()
    }
    # the CM guarantee: never an undercount…
    assert all(est[t] >= n for t, n in true.items())
    # …and with 20 items in 1024 buckets × 3 rows, collisions are
    # essentially impossible: the min-fold recovers exact counts
    assert est == true


def test_cm_combine_equals_single_shot(spark):
    toks = _zipf_tokens(spark).withColumn(
        "half", (F.length("tok") + F.ascii(F.substring("tok", 6, 1))) % 2
    )
    parts = [
        cm_partial(toks.filter(F.col("half") == i), "tok", depth=2, width=32)
        for i in (0, 1)
    ]
    merged = combine_cm(parts)
    single = cm_partial(toks, "tok", depth=2, width=32)
    key = lambda rows: sorted((r.j, r.bucket, r.n) for r in rows)  # noqa: E731
    assert key(merged.collect()) == key(single.collect())


def test_cm_weighted_counts(spark):
    w = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "tok string, w int"
    )
    sketch = cm_partial(w, "tok", depth=2, width=64, weight_col="w")
    est = {
        r.tok: r.n_est
        for r in cm_estimate(
            sketch, w.select("tok").distinct(), "tok", depth=2, width=64
        ).collect()
    }
    assert est == {"a": 12, "b": 1}


def test_cm_unseen_item_estimates_from_grid(spark):
    # an item never inserted still hashes into counters — its
    # estimate is whatever collides there (possibly 0), never NULL
    toks = spark.createDataFrame([("a",)], "tok string")
    sketch = cm_partial(toks, "tok", depth=3, width=512)
    items = spark.createDataFrame([("zzz-unseen",)], "tok string")
    [row] = cm_estimate(sketch, items, "tok", depth=3, width=512).collect()
    assert row.n_est is not None and row.n_est >= 0


def test_cm_rejects_bad_grid(spark):
    toks = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError, match="depth must be >= 1"):
        cm_partial(toks, "tok", depth=0, width=8)
