"""Skew-mitigation operators.

AQE's skew-join splitting (on in the session factory) handles most
skew at runtime; these helpers cover the two shapes AQE can't fix:

* ``salted_aggregate`` — a single hot group key (the reference's
  'Unknown' artist, a null-ish user id) overwhelms one reducer in a
  groupBy. Two-phase aggregation over a salted key spreads the hot
  group across ``num_salts`` reducers, then merges partials. Only
  algebraic aggregates (sum/count/min/max) decompose this way.
* ``salted_broadcast_join_fallback`` is intentionally absent: with a
  broadcastable side there is no shuffle to skew — broadcast IS the
  skew fix, and the engine's joins already broadcast bounded sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__w2e_salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (merge_fn, partial_expr), where
    merge_fn ∈ {"sum", "min", "max"} re-combines the per-salt
    partials (counts merge with "sum"). E.g.::

        salted_aggregate(df, ["artist"], {
            "n":       ("sum", F.count(F.lit(1))),
            "max_pop": ("max", F.max("popularity")),
        })

    Phase 1 groups by (keys, salt) — the hot key's rows spread over
    ``num_salts`` reducers; phase 2 groups by keys alone over
    ``num_salts`` rows per key. The salt is a deterministic-per-row
    spread (pmod of a row hash), so results are reproducible.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    phase1 = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()])
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*keys).agg(
        *[merge[how](f"__p_{name}").alias(name) for name, (how, _) in aggs.items()]
    )
