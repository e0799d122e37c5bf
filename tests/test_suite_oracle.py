"""Every registered query matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01) — row count,
column-name set, and an order-insensitive value hash. Fast enough to
run on every change; tools/verify_local.py runs the same compare at
sf0.01.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.verify_local import value_hash  # noqa: E402

from workhop2_etl_spark import suite  # noqa: E402

suite.load_all()

from tests.conftest import SF_DIR  # noqa: E402

CASES = sorted(suite.QUERIES)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, duck):
    sdf = suite.QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in suite.ORACLES:
        pytest.skip(f"{name}: rows-only (no oracle)")
    res = duck.execute(suite.ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"rowcount {len(srows)} != {len(orows)}"
    assert sorted(scols) == sorted(ocols)
    assert value_hash(scols, srows) == value_hash(ocols, orows)


def test_a11_sketches_bound_error(spark, duck):
    """Sketch estimates are engine-specific, so a11 has no DuckDB
    oracle; instead bound the relative error against exact answers.
    HLL++ at rsd=0.01 and a 10k-bucket percentile sketch should land
    well inside 5% on this data."""
    sdf = suite.QUERIES["a11_approx_sketches"](spark, SF_DIR)
    approx = {r.l_returnflag: (r.approx_parts, r.approx_p50) for r in sdf.collect()}
    exact = dict(
        (f, (n, p))
        for f, n, p in duck.execute(
            """
            SELECT l_returnflag, count(DISTINCT l_partkey),
                   quantile_cont(l_extendedprice, 0.5)
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for flag, (n_est, p_est) in approx.items():
        n_true, p_true = exact[flag]
        assert abs(n_est - n_true) / n_true < 0.05, (flag, n_est, n_true)
        assert abs(p_est - p_true) / p_true < 0.05, (flag, p_est, p_true)
