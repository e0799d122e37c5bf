"""As-of (point-in-time) and range joins — operators Spark's API lacks
as primitives, composed from existing DataFrame ops (SURVEY.md §2.4
"not present" in the reference; first-class engine surface).

``asof_join`` uses the union-and-carry formulation — the scalable
shape: tag both sides, union, one window ordered by (key, time), and
carry the latest right-side payload forward with last(ignorenulls).
Cost is ONE shuffle of |L|+|R| rows; there is no join fan-out at all,
so a hot key degrades to a big sort, never to a cross product. (The
naive formulation — inequality join then argmax — fans out
quadratically on dense keys.)

``range_join`` buckets the time axis so the non-equi condition
becomes bucket-equality + residual filter: each right row replicates
into the buckets its window can reach, each left row probes exactly
one bucket. Shuffle ∝ |R|·(window/bucket) + |L| — never |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: the right row with the latest ``right_time``
    ≤ ``left_time`` on the same key (direction='backward'; 'forward'
    mirrors it). No match → NULL payload. Output rows == left rows.

    ``tolerance`` (interval string, e.g. '2 hours') bounds the match
    distance — a nearest row farther than the tolerance yields NULL
    payload instead (pandas ``merge_asof`` semantics). Requires
    timestamp-typed time columns; the bound is applied to the carried
    match time, so it adds zero shuffles.

    Ties: a right row at exactly left_time matches; multiple right
    rows at the same instant resolve to the one that sorts last in
    the union order (make right_time unique upstream for full
    determinism).

    NULL times: right rows with NULL ``right_time`` are dropped — a
    NULL instant can never be "the latest ≤ t" (they would otherwise
    sort nulls-first and leak their payload into every early left
    row). Left rows with NULL ``left_time`` survive with NULL payload.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    right = right.filter(F.col(right_time).isNotNull())

    l_tag = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("s")).schema["s"].dataType
        ).alias("__payload"),
    )
    r_tag = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before a left row at the same timestamp
        # (__is_left ascending) so an exact-time match is visible.
        w = (
            Window.partitionBy("__k")
            .orderBy(F.asc("__t"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        # desc_nulls_first, NOT desc: plain desc puts NULLs last, so a
        # left row with NULL time would sort after every right row and
        # carry the earliest right payload — a fabricated match. With
        # nulls first it precedes all right rows and carries NULL,
        # mirroring the backward direction (asc = nulls first).
        w = (
            Window.partitionBy("__k")
            .orderBy(F.desc_nulls_first("__t"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    if tolerance is not None:
        # carry the matched right row's own time through the same
        # window, then null the match when it falls out of bounds
        carried = carried.withColumn(
            "__mt",
            F.last(
                F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
            ).over(w),
        )
        tol = F.expr(f"INTERVAL {tolerance}")
        in_bounds = (
            F.col("__mt") >= F.col("__t") - tol
            if direction == "backward"
            else F.col("__mt") <= F.col("__t") + tol
        )
        carried = carried.withColumn("__match", F.when(in_bounds, F.col("__match")))
    out = carried.filter(F.col("__is_left") == 1)
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in payload],
    )


def _interval_micros(spark, interval: str) -> int:
    """Total microseconds of an interval string ('7 days',
    '500 milliseconds'), via one constant-folded 1-row evaluation
    (no data read) — exact at Spark's native timestamp resolution."""
    row = (
        spark.range(1)
        .select(
            F.expr(
                "unix_micros(timestamp'2000-01-01 00:00:00' + "
                f"INTERVAL {interval}) - "
                "unix_micros(timestamp'2000-01-01 00:00:00')"
            ).alias("us")
        )
        .first()
    )
    return int(row["us"])


def _interval_seconds(spark, interval: str) -> int:
    """Total WHOLE seconds of an interval string ('7 days'). Raises
    on sub-second components instead of silently truncating — the
    callers use this for bucket widths and second-resolution bounds,
    where a '500 milliseconds' that became 0 would be a wrong answer,
    not a coarser one. Sub-second tolerances go through
    ``_interval_micros``."""
    us = _interval_micros(spark, interval)
    if us % 1_000_000:
        raise ValueError(
            f"interval '{interval}' has sub-second precision; this "
            "parameter is second-resolution (use a whole number of "
            "seconds)"
        )
    return us // 1_000_000


def range_join(
    left: DataFrame,
    right: DataFrame,
    on_key: tuple[str, str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    bucket: str,
    right_suffix: str = "_r",
) -> DataFrame:
    """Inner join of left×right where ``right_time`` ∈
    [left_time - lower, left_time + upper] and the keys match.

    Output carries every column of both sides; right columns whose
    name collides with a left column get ``right_suffix`` appended
    (pandas-merge convention), so the result is always selectable by
    name — same-named keys and time columns are the common case.

    ``lower``/``upper``/``bucket`` are interval strings ('7 days').
    The replication count is computed from the actual spans —
    ceil(upper/bucket) buckets back and ceil(lower/bucket) forward —
    so any bucket size is correct; callers pick bucket ≈ span so the
    replication factor stays ~3. Shuffle ∝ |R|·(1 + ceil(lower/b) +
    ceil(upper/b)) + |L|.
    """
    lk, rk = on_key
    spark = left.sparkSession
    lower_s = _interval_seconds(spark, lower)
    upper_s = _interval_seconds(spark, upper)
    bucket_s = _interval_seconds(spark, bucket)
    if bucket_s <= 0 or lower_s < 0 or upper_s < 0:
        raise ValueError(
            f"range_join needs bucket > 0 and lower/upper >= 0; got "
            f"lower={lower!r} upper={upper!r} bucket={bucket!r}"
        )
    # a right row at rt matches left rows with lt ∈ [rt - upper, rt + lower],
    # whose buckets span floor((rt-upper)/b) .. floor((rt+lower)/b).
    n_back = -(-upper_s // bucket_s)  # ceil
    n_fwd = -(-lower_s // bucket_s)
    lb = F.window(F.col(left_time), bucket)["start"]
    l_side = left.withColumn("__bucket", lb)
    rb = F.window(F.col(right_time), bucket)["start"]
    iv = F.expr(f"INTERVAL {bucket}")
    replicas = [
        F.col("__rb") + iv * F.lit(k) for k in range(-n_back, n_fwd + 1)
    ]
    r_side = (
        right.withColumn("__rb", rb)
        .withColumn("__bucket", F.explode(F.array(*replicas)))
        .drop("__rb")
    )
    cond = (
        (F.col(f"__l.{lk}") == F.col(f"__r.{rk}"))
        & (F.col("__l.__bucket") == F.col("__r.__bucket"))
        & (
            F.col(f"__r.{right_time}")
            >= F.col(f"__l.{left_time}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"__r.{right_time}")
            <= F.col(f"__l.{left_time}") + F.expr(f"INTERVAL {upper}")
        )
    )
    # each left row carries exactly one bucket, so a (left, right)
    # pair can match on at most one replica — no dedup needed.
    joined = l_side.alias("__l").join(r_side.alias("__r"), cond, "inner")
    return joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__r.{c}").alias(out)
            for c, out in zip(
                right.columns,
                _collision_free_names(left.columns, right.columns, right_suffix),
            )
        ],
    )


def _collision_free_names(
    left_cols: list[str], right_cols: list[str], suffix: str
) -> list[str]:
    """Output names for the right side of a two-sided projection —
    suffixed against a LIVE set: suffixing into a name the left side
    also holds (left has both `x` and `x_r`, right has `x`) would
    re-introduce the ambiguity the suffix exists to remove, so each
    assigned name is claimed before the next is chosen and the suffix
    repeats until the name is free."""
    taken = set(left_cols)
    out_names: list[str] = []
    for c in right_cols:
        out = c
        while out in taken:
            out = out + suffix
        taken.add(out)
        out_names.append(out)
    return out_names


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: str = "7 days",
    right_suffix: str = "_r",
) -> DataFrame:
    """Join interval relations on a key where the intervals OVERLAP:
    ``l.start <= r.end AND r.start <= l.end`` (closed intervals) —
    the reservation/session/validity-window join Spark has no
    primitive for.

    Scale shape: the time axis is bucketed and BOTH sides replicate
    one row per bucket their interval spans, so the non-equi overlap
    condition becomes a (key, bucket) equi-join + residual filter.
    Shuffle ∝ Σ interval_length/bucket over both inputs — never
    |L|×|R|; size ``bucket`` near the typical interval length to keep
    the replication factor ~2. A matching pair would meet in every
    shared bucket, so each pair is emitted EXACTLY ONCE by keeping
    only the bucket that contains ``greatest(l.start, r.start)`` —
    which both intervals contain whenever they overlap.

    Output: all left columns, then all right columns with collision
    suffixing. Rows with NULL interval endpoints never match (SQL
    comparison semantics), mirroring the SQL restatement.
    """
    # bucket floor via epoch arithmetic, not F.window: a projection may
    # hold only ONE time-window expression (Spark restriction), and the
    # replication needs both interval endpoints bucketed at once
    secs = _interval_seconds(left.sparkSession, bucket)
    iv = F.expr(f"INTERVAL {bucket}")

    def bucket_of(c) -> F.Column:
        return F.timestamp_seconds(
            F.floor(c.cast("double") / secs).cast("long") * secs
        )

    def replicate(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(
            F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(s) <= F.col(e))
        ).withColumn(
            "__bucket",
            F.explode(F.sequence(bucket_of(F.col(s)), bucket_of(F.col(e)), iv)),
        )

    l_side = replicate(left, left_start, left_end)
    r_side = replicate(right, right_start, right_end)
    canon_bucket = bucket_of(
        F.greatest(F.col(f"__l.{left_start}"), F.col(f"__r.{right_start}"))
    )
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.{on}"))
        & (F.col("__l.__bucket") == F.col("__r.__bucket"))
        & (F.col(f"__l.{left_start}") <= F.col(f"__r.{right_end}"))
        & (F.col(f"__r.{right_start}") <= F.col(f"__l.{left_end}"))
        & (F.col("__l.__bucket") == canon_bucket)
    )
    joined = l_side.alias("__l").join(r_side.alias("__r"), cond, "inner")
    return joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__r.{c}").alias(out)
            for c, out in zip(
                right.columns,
                _collision_free_names(left.columns, right.columns, right_suffix),
            )
        ],
    )


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Nearest-in-time as-of join: for each left row, the right row on
    the same key minimizing |right_time - left_time|, ties resolved
    BACKWARD (the at-or-before candidate wins over an equally distant
    at-or-after one). ``tolerance`` bounds the distance both ways; a
    left row with no candidate in bounds (or a NULL time) survives
    with NULL payload. Output rows == left rows.

    Single-sort plan: the same union-and-carry as ``asof_join`` but
    BOTH directions ride one (key, time)-ordered window — the
    backward candidate via last(ignorenulls) over the preceding
    frame, the forward candidate via first(ignorenulls) over the
    following frame. One shuffle of |L|+|R| rows, no join fan-out;
    Spark evaluates both frames over the one sort.

    Exact-time matches land in the backward frame (right rows order
    before left rows at the same instant), so the forward frame's
    blindness to them is immaterial: distance 0 always wins backward.
    Right rows with NULL time are dropped, as in ``asof_join``; tied
    right rows at one (key, instant) must be collapsed upstream for
    determinism (same contract as ``asof_join``).

    TIMESTAMP_NTZ inputs: distances convert through the session
    timezone (UTC in this engine — session.py); under a non-UTC
    session zone, candidate pairs straddling a DST transition would
    compare with the wall-clock gap, not the physical one.
    """
    right = right.filter(F.col(right_time).isNotNull())
    payload_t = right.select(
        F.struct(*[F.col(c) for c in payload]).alias("s")
    ).schema["s"].dataType
    lrow_t = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("s")
    ).schema["s"].dataType

    l_tag = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    r_tag = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
    )
    unioned = l_tag.unionByName(r_tag)

    # asc nulls-first: NULL-time left rows sort before every right
    # row; their backward frame is empty and their forward carry is
    # discarded by the explicit NULL guard below.
    order = [F.asc("__t"), F.asc("__is_left")]
    wb = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    r_time = F.when(F.col("__is_left") == 0, F.col("__t"))
    carried = (
        unioned.withColumn("__bm", F.last("__payload", ignorenulls=True).over(wb))
        .withColumn("__bt", F.last(r_time, ignorenulls=True).over(wb))
        .withColumn("__fm", F.first("__payload", ignorenulls=True).over(wf))
        .withColumn("__ft", F.first(r_time, ignorenulls=True).over(wf))
    )

    # distances in exact integer MICROSECONDS — double seconds would
    # carry ~0.5µs rounding, enough to flip a 1µs-margin tiebreak.
    # The session timezone is UTC (session.py), so the ntz→timestamp
    # cast inside unix_micros is offset-free.
    def micros(c: str) -> F.Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    d_b = micros("__t") - micros("__bt")
    d_f = micros("__ft") - micros("__t")
    b_ok = F.col("__bt").isNotNull()
    f_ok = F.col("__ft").isNotNull()
    if tolerance is not None:
        # exact microseconds — '500 milliseconds' is honored, not
        # silently truncated to a 0-second tolerance
        tol = F.lit(
            _interval_micros(left.sparkSession, tolerance)
        ).cast("long")
        b_ok = b_ok & (d_b <= tol)
        f_ok = f_ok & (d_f <= tol)
    pick_b = b_ok & (~f_ok | (d_b <= d_f))
    match = F.when(
        F.col("__t").isNotNull(),
        F.when(pick_b, F.col("__bm")).when(f_ok, F.col("__fm")),
    )
    out = carried.filter(F.col("__is_left") == 1).withColumn("__match", match)
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in payload],
    )
