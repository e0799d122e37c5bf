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


# ---------------------------------------------------------------------------
# hashed-linear classifier (operators/text.py) — the t18 oracle pins
# the cross-engine arithmetic; these pin the operator contracts
# ---------------------------------------------------------------------------


def _toy_docs(spark):
    return spark.createDataFrame(
        [
            (1, ["good", "clean", "prose"]),
            (2, ["spam", "spam", "buy"]),
            (3, ["good", "spam"]),
        ],
        "doc_id long, toks array<string>",
    )


def test_hashed_features_l1_normalized(spark):
    from workhop2_etl_spark.operators.text import hashed_features

    feats = hashed_features(_toy_docs(spark), dim=4096)
    sums = {
        r.doc_id: r.s
        for r in feats.groupBy("doc_id")
        .agg(F.round(F.sum("x"), 9).alias("s"))
        .collect()
    }
    # Σ tf/dl = 1 per doc (collisions merge features but x values add)
    assert sums == {1: 1.0, 2: 1.0, 3: 1.0}


def test_hashed_features_empty_and_bad_dim(spark):
    from workhop2_etl_spark.operators.text import hashed_features

    empty = spark.createDataFrame([(9, [])], "doc_id long, toks array<string>")
    assert hashed_features(empty).count() == 0
    with pytest.raises(ValueError, match="dim must be >= 2"):
        hashed_features(empty, dim=1)


def test_linear_score_responds_to_weights(spark):
    from workhop2_etl_spark.operators.text import (
        hashed_features,
        linear_score,
    )

    docs = _toy_docs(spark)
    feats = hashed_features(docs, dim=4096)
    # weights: +2 on 'good'/'clean'/'prose' features, −2 on 'spam'/'buy'
    pos = hashed_features(
        spark.createDataFrame(
            [(0, ["good", "clean", "prose"])], "doc_id long, toks array<string>"
        ),
        dim=4096,
    ).select("feature_id", F.lit(2.0).alias("w"))
    neg = hashed_features(
        spark.createDataFrame(
            [(0, ["spam", "buy"])], "doc_id long, toks array<string>"
        ),
        dim=4096,
    ).select("feature_id", F.lit(-2.0).alias("w"))
    weights = pos.unionByName(neg).groupBy("feature_id").agg(
        F.sum("w").alias("w")
    )
    out = {r.doc_id: (r.score, r.label)
           for r in linear_score(feats, weights).collect()}
    assert out[1][1] == 1 and out[1][0] > 0.8      # all-positive doc
    assert out[2][1] == 0 and out[2][0] < 0.2      # all-negative doc
    assert out[1][0] > out[3][0] > out[2][0]        # mixed in between
    # bias shifts every margin
    out_b = {r.doc_id: r.score
             for r in linear_score(feats, weights, bias=5.0).collect()}
    assert all(out_b[d] >= out[d][0] for d in out_b)


def test_linear_score_invariant_under_repartition(spark):
    from workhop2_etl_spark.operators.text import (
        hashed_features,
        linear_score,
    )

    docs = _toy_docs(spark)
    weights = hashed_features(docs, dim=64).select(
        "feature_id", (F.col("feature_id") % 7 - 3.0).alias("w")
    ).distinct()
    a = linear_score(hashed_features(docs, dim=64), weights).collect()
    b = linear_score(
        hashed_features(docs.repartition(13), dim=64).repartition(7), weights
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# KMV through the streaming epoch protocol — sketch partials are
# combinable partials like any rollup measure, so they ride the
# existing stream_rollup_to_parquet / read_rollup machinery unchanged
# ---------------------------------------------------------------------------


def test_kmv_rides_stream_rollup_epochs(spark, tmp_path_factory):
    """Per-epoch KMV partials streamed through the rollup sink must
    combine to EXACTLY the single-shot grouped sketch (hv sets per
    group identical, hence identical estimates) — the streaming face
    of the r6 merge algebra, plus checkpointed exactly-once."""
    from workhop2_etl_spark.operators.sketch import (
        combine_kmv_by,
        kmv_estimate_by,
        kmv_partial_by,
    )
    from workhop2_etl_spark.session import load_table
    from workhop2_etl_spark.streaming import windows as SW

    from tests.conftest import SF_DIR

    K = 32
    root = tmp_path_factory.mktemp("stream_kmv")
    src = str(root / "events.parquet")
    table = str(root / "kmv")
    ckpt = str(root / "ckpt")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    SW.stream_rollup_to_parquet(
        spark, src, table, ckpt, max_files_per_trigger=1,
        rollup_fn=lambda b: kmv_partial_by(b, ["event_type"], "user_id", K),
    )
    combined = SW.read_rollup(
        spark, table,
        combine_fn=lambda df: combine_kmv_by([df], ["event_type"], K),
    )
    single = kmv_partial_by(
        spark.read.parquet(src), ["event_type"], "user_id", K
    )
    canon = lambda d: sorted((r.event_type, r.hv) for r in d.collect())  # noqa: E731
    assert canon(combined) == canon(single)

    est = lambda d: sorted(map(tuple, kmv_estimate_by(  # noqa: E731
        d, ["event_type"], K).collect()))
    assert est(combined) == est(single)

    # exactly-once: a committed re-run adds nothing
    SW.stream_rollup_to_parquet(
        spark, src, table, ckpt, max_files_per_trigger=1,
        rollup_fn=lambda b: kmv_partial_by(b, ["event_type"], "user_id", K),
    )
    assert canon(SW.read_rollup(
        spark, table,
        combine_fn=lambda df: combine_kmv_by([df], ["event_type"], K),
    )) == canon(single)


def test_kmv_by_group_algebra_and_capacity(spark):
    from workhop2_etl_spark.operators.sketch import (
        combine_kmv_by,
        kmv_estimate_by,
        kmv_partial_by,
    )

    # group 'big' has 2000 distinct values (over capacity), 'small' 10
    rows = [("big", i) for i in range(2000)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v long")
    parts = [
        kmv_partial_by(df.filter(F.col("v") % 2 == i), ["g"], "v", 64)
        for i in (0, 1)
    ]
    merged = combine_kmv_by(parts, ["g"], 64)
    single = kmv_partial_by(df, ["g"], "v", 64)
    assert sorted((r.g, r.hv) for r in merged.collect()) == sorted(
        (r.g, r.hv) for r in single.collect()
    )
    est = {r.g: r for r in kmv_estimate_by(merged, ["g"], 64).collect()}
    assert est["small"].n_kept == 10 and est["small"].est_distinct == 10.0
    assert est["big"].n_kept == 64
    assert 2000 * 0.6 <= est["big"].est_distinct <= 2000 * 1.5  # k=64 is coarse
