"""Tests for the analytics KPI module and the seed loader plan."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.fixtures_grammy import make_grammy, make_spotify

from workhop2_etl_spark.plans import analytics as A
from workhop2_etl_spark.plans import grammy_spotify as P
from workhop2_etl_spark.plans import seed_grammy
from workhop2_etl_spark.plans.schemas import GRAMMY_SCHEMA, SPOTIFY_SCHEMA


@pytest.fixture(scope="module")
def merged(spark):
    gp, sp = make_grammy(), make_spotify()
    g = spark.createDataFrame(gp.where(pd.notnull(gp), None), schema=GRAMMY_SCHEMA)
    s = spark.createDataFrame(sp.where(pd.notnull(sp), None), schema=SPOTIFY_SCHEMA)
    return P.run_pipeline(g, s, mode="spec").cache()


def test_awards_per_artist(merged):
    rows = A.awards_per_artist(merged, k=5).collect()
    assert rows and all(r.n_awards >= 1 for r in rows)
    counts = [r.n_awards for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_top_categories(merged):
    rows = A.top_categories(merged, k=3).collect()
    assert len(rows) == 3 and rows[0].n >= rows[-1].n


def test_awards_per_genre_excludes_sentinel(merged):
    rows = A.awards_per_genre(merged).collect()
    assert all(r.track_genre != "N/A" for r in rows)


def test_popularity_histogram_bins(merged):
    rows = A.popularity_histogram(merged).collect()
    assert rows and all(r.bin_start % 10 == 0 for r in rows)


def test_explicit_influence_shape(merged):
    rows = A.explicit_influence(merged).collect()
    assert {r.explicit for r in rows} <= {True, False}


def test_seed_loader_roundtrip(spark):
    gp = make_grammy(n=60)
    path = os.path.join(tempfile.mkdtemp(prefix="w2e_seed_"), "grammy.csv")
    gp.to_csv(path, index=False)
    out = seed_grammy.seed_grammy(spark, path)
    rows = out.collect()
    assert len(rows) == 60
    # winner 'True' strings → 1; timestamps parsed (not strings)
    assert all(r.winner == 1 for r in rows)
    assert all(r.published_at is not None for r in rows)
    assert str(out.schema["published_at"].dataType).startswith("Timestamp")


def test_seed_loader_coerces_garbage_timestamps(spark):
    gp = make_grammy(n=10)
    gp.loc[0, "published_at"] = "not-a-timestamp"
    path = os.path.join(tempfile.mkdtemp(prefix="w2e_seed_"), "grammy.csv")
    gp.to_csv(path, index=False)
    out = seed_grammy.seed_grammy(spark, path)
    bad = out.filter(F.col("id") == 1).collect()[0]
    assert bad.published_at is None  # errors='coerce' semantics
