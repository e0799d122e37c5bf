"""Every registered query matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01) — row count,
column-name set, and an order-insensitive value hash. Fast enough to
run on every change; tools/verify_local.py runs the same compare at
sf0.01.
"""

from __future__ import annotations

import pytest

# conftest.py puts the repo root (derived from its own location) on
# sys.path, which is what makes the `tools` import work anywhere
from tools.verify_local import value_hash  # noqa: E402

from workhop2_etl_spark import suite  # noqa: E402

suite.load_all()

from tests.conftest import SF_DIR  # noqa: E402

CASES = sorted(suite.QUERIES)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, duck):
    sdf = suite.QUERIES[name](spark, SF_DIR)
    # The driver's canonicalizer sorts every column through pandas
    # (Categorical factorize), which raises on unhashable cells —
    # nested result columns must be serialized to scalars (x2 learned
    # this the hard way in round 3's driver run).
    from pyspark.sql import types as T

    nested = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not nested, f"driver-unfriendly nested result columns: {nested}"
    # skip BEFORE collecting: the schema check above needs no
    # execution, and running a rows-only query end-to-end just to
    # skip wastes executor time on every suite run
    if name not in suite.ORACLES:
        pytest.skip(f"{name}: rows-only (no oracle)")
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = duck.execute(suite.ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"rowcount {len(srows)} != {len(orows)}"
    assert sorted(scols) == sorted(ocols)
    assert value_hash(scols, srows) == value_hash(ocols, orows)


def test_a11_sketches_bound_error(spark):
    """a11 now emits exact values + within-bound booleans so the
    driver hash-checks it; this test asserts the booleans themselves
    came out true (HLL++ at rsd=0.01 and a 10k-bucket percentile
    sketch land well inside the 5% bound on this data)."""
    sdf = suite.QUERIES["a11_approx_sketches"](spark, SF_DIR)
    rows = sdf.collect()
    assert rows
    for r in rows:
        assert r.parts_within_bound, (r.l_returnflag, r.exact_parts)
        assert r.p50_within_bound, (r.l_returnflag, r.exact_p50_x200)
