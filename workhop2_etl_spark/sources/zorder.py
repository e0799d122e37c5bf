"""Z-order (Morton-curve) clustering — multi-column data skipping.

Single-key range clustering (sources/compaction.py) makes footer
min/max stats selective for ONE column; queries filtering the other
dimension still scan every file. Interleaving the bits of several key
columns into one Morton key and range-partitioning on THAT gives each
output file a tight bounding box in every clustered dimension at
once — the standard lakehouse layout trick (Delta/Iceberg `ZORDER
BY`) — so a filtered scan on ANY of the keys prunes most files via
row-group statistics.

Everything is pure JVM expressions (shift/mask/or) riding whole-stage
codegen, and the expression count is bits×cols — flat in the data and
small in the parameters (no per-bucket literals; the ANN hyperplane
de-literalization lesson applies here too). The only shuffle is the
repartitionByRange a clustered rewrite needs anyway.

Keys are min/max-normalized into ``bits``-bit buckets before
interleaving: Morton order is only meaningful when inputs share a
scale (a raw orderkey in the millions would otherwise dominate a
1-50 quantity). Equi-width bucketing keeps the plan flat; heavily
skewed keys cluster less tightly than an equi-depth scheme would —
the documented tradeoff (use compaction.py's single-key range
clustering when one skewed column dominates the workload).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each already-bucketized
    column into one Morton key: bit b of column j lands at position
    b*len(cols)+j. Requires bits*len(cols) ≤ 63: the JVM masks shift
    counts to 6 bits, so a wider key would silently wrap high bits
    onto low positions (and position 63 flips the sign, breaking
    range order) — scrambling the clustering instead of failing."""
    k = len(bucket_cols)
    if bits * k > 63:
        raise ValueError(
            f"zorder key needs bits*len(cols) <= 63, got {bits}*{k}="
            f"{bits * k}; lower bits (bits={63 // k} fits {k} columns)"
        )
    terms = []
    for b in range(bits):
        for j, c in enumerate(bucket_cols):
            terms.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + j)
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files Z-ordered on
    ``cols``: min/max-normalize each key into 2^bits equi-width
    buckets, interleave into a Morton key, range-partition on it, and
    sort within partitions so row groups inside each file stay tight
    too. The helper column is dropped before write.

    One bounded driver action computes the 2×len(cols) normalization
    stats (same class of bounded collect as the IVF centroid seed —
    documented, O(cols), independent of row count).
    """
    from pyspark.sql.types import NumericType

    for c in cols:
        if not isinstance(df.schema[c].dataType, NumericType):
            raise TypeError(
                f"Z-order clustering column {c!r} must be numeric, got "
                f"{df.schema[c].dataType.simpleString()}; map dates/strings "
                "to a numeric key first"
            )
    n = 1 << bits
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    ).first()
    buckets = []
    for c in cols:
        mn, mx = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        # Bucket in DOUBLE: long arithmetic overflows once
        # span × 2^bits exceeds 2^63 (any key spanning ≳2^55), and a
        # rounding-loss of a few ULPs only blurs a bucket boundary —
        # harmless for clustering, unlike a wrapped Morton key.
        span = float(mx - mn) or 1.0
        b = F.floor(
            (F.col(c).cast("double") - float(mn)) * n / (span + 1.0)
        ).cast("long")
        buckets.append(F.least(b, F.lit(n - 1)))
    z = df.withColumn("__z", zorder_key(buckets, bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
