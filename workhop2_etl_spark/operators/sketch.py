"""Cross-engine-deterministic mergeable sketches: KMV distinct
counting and count-min frequency estimation.

The engine already ships two combinable approximate measures —
Apache DataSketches HLL (operators/incremental.py, Spark's
hll_sketch_agg) and equi-width histogram quantiles — but the HLL
binary is Spark-specific, so its partial-combine algebra can only be
pytest-asserted, never oracle-verified against DuckDB. These two
sketches close that gap: both hash with md5 (identical bytes in any
engine), both estimates are plain integer/double arithmetic, so a
DuckDB oracle can replay the ENTIRE sketch — build, merge, estimate —
bit-for-bit. That earns the mergeable-sketch algebra the same
oracle-green verdict the exact rollups have (suite/maintenance r4/r5
vs r2's sum/min/max and r3's histograms).

Why these two at 100 TB:

* KMV ("K minimum values", Bar-Yossef et al. 2002) — distinct count
  from the k smallest distinct hash values. A partial is a k-row
  relation; merging is union → k smallest again; the estimate is
  (k-1) / max-of-k normalized. Per-partition top-k is map-side
  (Spark's TakeOrderedAndProject), so a 100 TB scan reduces to k rows
  per partition before any shuffle, and per-epoch partials persist
  next to the data they summarize (the df/stats-partial pattern of
  the lexical index).
* Count-min (Cormode & Muthukrishnan 2005) — a depth×width counter
  grid; point estimate = min over depth rows. Partials are (j,
  bucket, n) relations that merge by SUM — the same additive algebra
  as every rollup here — and the grid is depth·width rows regardless
  of corpus size. Estimates never undercount (each counter is a
  superset sum), which makes it the standard heavy-hitter screen
  over token/URL/entity streams.

Determinism contract: hashes are md5 of the value's canonical string
(prefixed with the sketch's salt), truncated to 15 hex chars — 60
bits, positive in any signed 64-bit engine. Duplicate values hash
identically, so distinct-before-top-k dedups exactly; no RNG, no
session state. NULL values are excluded (SQL COUNT DISTINCT
semantics).

Reference parity: no counterpart in the reference (its profiling
cells count exactly at pandas scale — eda.ipynb); this is north-star
scale infrastructure, shaped after the public DataSketches/Algebird
sketch APIs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash domain: 15 hex chars = 60 bits, so values fit a signed int64
#: in every engine (16 chars could set the sign bit).
KMV_HASH_BITS = 60
_M = float(1 << KMV_HASH_BITS)


def _hash60(col: Column, salt: str) -> Column:
    """First 60 bits of md5(salt || value) as a non-negative long —
    the one hash convention both engines replay (suite oracles build
    the identical integer from DuckDB's md5/strpos arithmetic)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


# ---------------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------------


def kmv_partial(df: DataFrame, col: str, k: int, salt: str = "kmv:") -> DataFrame:
    """The KMV partial over ``df[col]``: the ``k`` smallest DISTINCT
    hash values, as a one-column relation ``hv`` (≤ k rows — fewer
    when the input has fewer distinct values). Top-k runs map-side
    per partition (TakeOrderedAndProject), so the partial's cost is
    one scan regardless of input size."""
    if k < 2:
        raise ValueError(f"kmv k must be >= 2, got {k}")
    return (
        df.filter(F.col(col).isNotNull())
        .select(_hash60(F.col(col), salt).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def combine_kmv(parts: list[DataFrame], k: int) -> DataFrame:
    """Merge KMV partials: union → distinct → k smallest. Exactly the
    partial over the concatenated inputs (duplicate values collide on
    their hash, so the union's distinct set equals the single-shot
    distinct set) — the algebra r4 oracle-verifies."""
    if not parts:
        raise ValueError("combine_kmv needs at least one partial")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.distinct().orderBy("hv").limit(k)


def kmv_estimate(partial: DataFrame, k: int) -> DataFrame:
    """One-row report from a KMV partial: ``n_kept`` (rows in the
    partial), ``kth_hash`` (its max), and ``est_distinct``. With
    fewer than k distinct values the sketch has seen EVERYTHING and
    the estimate is exact (= n_kept); otherwise the classic
    (k-1) · M / kth — the k-th smallest of n uniform hashes sits near
    k·M/n. Double arithmetic only (IEEE-identical cross-engine);
    round at the call site if reporting."""
    return partial.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.coalesce(F.max("hv"), F.lit(0)).alias("kth_hash"),
    ).select(
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_M) / F.col("kth_hash").cast("double"))
        .alias("est_distinct"),
    )


def kmv_partial_by(
    df: DataFrame, keys: list[str], col: str, k: int, salt: str = "kmv:"
) -> DataFrame:
    """Per-group KMV partials: for every ``keys`` group, the k
    smallest distinct hash values of ``df[col]`` — the production
    distinct-count shape (distinct users per day/event_type over a
    100 TB event log, one bounded relation per group instead of a
    full count-distinct shuffle). One distinct + one window
    (WindowGroupLimit prunes beyond-k rows map-side). Columns:
    keys..., hv."""
    if k < 2:
        raise ValueError(f"kmv k must be >= 2, got {k}")
    from pyspark.sql import Window

    hv = (
        df.filter(F.col(col).isNotNull())
        .select(*keys, _hash60(F.col(col), salt).alias("hv"))
        .distinct()
    )
    rk = F.row_number().over(Window.partitionBy(*keys).orderBy("hv"))
    return hv.withColumn("__rk", rk).filter(F.col("__rk") <= k).drop("__rk")


def combine_kmv_by(parts: list[DataFrame], keys: list[str], k: int) -> DataFrame:
    """Merge per-group KMV partials: union → distinct → per-group k
    smallest again. Exactly ``kmv_partial_by`` over the concatenated
    inputs — r6 oracle-verifies the algebra per group."""
    if not parts:
        raise ValueError("combine_kmv_by needs at least one partial")
    from pyspark.sql import Window

    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    rk = F.row_number().over(Window.partitionBy(*keys).orderBy("hv"))
    return (
        u.distinct().withColumn("__rk", rk).filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_estimate_by(partial: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Per-group (keys..., n_kept, kth_hash, est_distinct) — the
    grouped twin of ``kmv_estimate`` (exact below capacity, else
    (k−1)·M/kth)."""
    return partial.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.coalesce(F.max("hv"), F.lit(0)).alias("kth_hash"),
    ).select(
        *keys,
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_M) / F.col("kth_hash").cast("double"))
        .alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------------


def cm_partial(
    df: DataFrame, col: str, depth: int = 3, width: int = 64,
    salt: str = "cm", weight_col: str | None = None,
) -> DataFrame:
    """The count-min partial over ``df[col]``: a (j, bucket, n)
    relation, j < depth, bucket < width — each input row increments
    one bucket per row j (hash salted by j). depth·width rows
    regardless of input size; the groupBy's map-side combine means
    one scan and a grid-sized shuffle. ``weight_col`` (optional)
    counts each row with a weight instead of 1."""
    if depth < 1 or width < 2:
        raise ValueError(f"cm depth must be >= 1 and width >= 2, got {depth}x{width}")
    rows = df.filter(F.col(col).isNotNull()).select(
        F.col(col).alias("__v"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("__w"),
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    return (
        rows.select("__v", "__w", j)
        .select(
            "j",
            _cm_bucket(F.col("__v"), F.col("j"), width, salt).alias("bucket"),
            "__w",
        )
        .groupBy("j", "bucket")
        .agg(F.sum("__w").alias("n"))
    )


def _cm_bucket(col: Column, j: Column, width: int, salt: str) -> Column:
    """Row-``j`` bucket of a value: 32 hash bits of md5('<salt><j>:'
    || value) mod width — replayed by the r5 oracle in DuckDB integer
    arithmetic."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), j.cast("string"), F.lit(":"), col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(width)


def combine_cm(parts: list[DataFrame]) -> DataFrame:
    """Merge count-min partials: counters ADD per (j, bucket) — the
    same additive partial algebra as the rollup sums and the lexical
    df/stats partials, so sketches ride the identical epoch /
    compaction / signed-delete protocol."""
    if not parts:
        raise ValueError("combine_cm needs at least one partial")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("j", "bucket").agg(F.sum("n").alias("n"))


def cm_estimate(
    sketch: DataFrame, items: DataFrame, col: str,
    depth: int = 3, width: int = 64, salt: str = "cm",
) -> DataFrame:
    """Point estimates for ``items[col]`` from a count-min sketch:
    each item hashes to one bucket per row, the estimate is the MIN
    over its depth counters (``0`` when a bucket was never touched).
    Never undercounts — every counter sums a superset of the item's
    occurrences. ``items`` is the caller's bounded candidate relation
    (heavy-hitter screening joins the grid, never the corpus), so the
    join is |items|·depth against a broadcast grid."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    probes = items.select(F.col(col), j).select(
        col, "j", _cm_bucket(F.col(col), F.col("j"), width, salt).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("n_est"))
    )


__all__ = [
    "KMV_HASH_BITS",
    "kmv_partial",
    "combine_kmv",
    "kmv_estimate",
    "kmv_partial_by",
    "combine_kmv_by",
    "kmv_estimate_by",
    "cm_partial",
    "combine_cm",
    "cm_estimate",
]
