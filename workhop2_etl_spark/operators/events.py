"""Batch event-analytics operators over an event log.

The reference has no event analytics (its workload is the
grammy×spotify merge), but an analytics engine aimed at large-scale
pipelines needs the classic event-log shapes: sessionization,
funnels, cohort retention, transition matrices, and SCD2 run
compaction. All five are expressed with hash aggregations,
equi-joins, and per-key windows only:

- ``sessionize`` / ``scd2_runs`` / ``transition_counts`` window over
  the *high-cardinality* entity key (user_id), so parallelism scales
  with the number of users — never a global sort.
- ``funnel_counts`` and ``cohort_retention`` are pure
  filter→hash-agg→equi-join pipelines: map-side partial aggregation
  applies, nothing is all-pairs, and at 100 TB every shuffle is keyed
  by user_id (high cardinality, no skew hot-spot by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the
    time since the previous event of the same user exceeds ``gap``.

    Returns the input plus a ``session_seq`` column (1-based, per
    user, in time order). Window partitions by the entity key, so the
    per-partition state is one user's history — bounded and parallel.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}"))
    ).cast("int")
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: for each step i, count users whose
    earliest step-i event follows their earliest qualifying step-(i-1)
    event (strictly increasing timestamps through the funnel).

    One filter→min-agg per step plus an equi-join on the user key —
    no windows, no collect; each stage's cardinality is ≤ distinct
    users, so the join inputs only shrink down the funnel.
    """
    if not steps:
        raise ValueError("funnel_counts requires at least one step")
    reached: DataFrame | None = None
    rows: list[DataFrame] = []
    for i, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == step)
        if reached is not None:
            stage = stage.join(reached, user_col).filter(
                F.col(ts_col) > F.col("_prev_ts")
            )
        reached = stage.groupBy(user_col).agg(F.min(ts_col).alias("_prev_ts"))
        rows.append(
            reached.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort = period of a user's first event; retention cell
    (cohort, offset) = distinct users of that cohort active ``offset``
    periods later. Two hash aggregations and one broadcast-size join
    keyed by user — the classic scale-safe retention plan.

    ``period`` ∈ {'day', 'week', 'month'}. Day/week offsets come from
    datediff (fixed-length periods); month offsets use months_between
    — a day-count division would silently mis-bucket variable-length
    months."""
    if period not in ("day", "week", "month"):
        raise ValueError(
            f"period must be 'day', 'week' or 'month', got {period!r}"
        )
    cohorts = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_start")
    )
    activity = (
        events.select(
            user_col, F.date_trunc(period, F.col(ts_col)).alias("active_period")
        )
        .distinct()
    )
    if period == "month":
        # both sides are month-start timestamps → whole month counts
        offset = F.round(
            F.months_between(F.to_date("active_period"), F.to_date("cohort_start"))
        ).cast("int")
    else:
        days = F.datediff(F.to_date("active_period"), F.to_date("cohort_start"))
        per_period = 7 if period == "week" else 1
        offset = (days / per_period).cast("int")
    return (
        activity.join(cohorts, user_col)
        .withColumn("offset", offset)
        .groupBy("cohort_start", "offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Markov-style bigram counts of consecutive event types per user
    (the "what do users do next" matrix). Per-user lag window + one
    hash aggregation over a tiny (|types|²) key space."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    return (
        events.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("from_type"), F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def scd2_runs(
    events: DataFrame,
    state_col: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Compact an event log into SCD2-style state intervals: one row
    per run of equal ``state_col`` per user, with ``valid_from`` /
    ``valid_to`` (NULL = current) and an ``is_current`` flag.

    Run detection is the lag≠current trick + running sum — the same
    per-key window shape as sessionize, so the same scale story.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    changed = (
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col))
    ).cast("int")
    run = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        events.withColumn("_run", run)
        .groupBy(user_col, "_run", state_col)
        .agg(F.min(ts_col).alias("valid_from"), F.count(F.lit(1)).alias("n_events"))
    )
    # tiebreak by run id: two adjacent runs CAN share a valid_from
    # (same-timestamp events tiebroken into separate runs by
    # event_id), and lead() over a tied orderBy is nondeterministic
    w2 = Window.partitionBy(user_col).orderBy("valid_from", "_run")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_run")
    )


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Wide per-user funnel timeline: one row per user who reached
    step 1, with ``ts_i`` = earliest qualifying step-i event (NULL
    once the funnel is abandoned). Same shrinking agg→join chain as
    funnel_counts, keyed on the user id throughout."""
    if not steps:
        raise ValueError("funnel_stage_times requires at least one step")
    out: DataFrame | None = None
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == step)
        if prev is not None:
            stage = stage.join(prev, user_col).filter(F.col(ts_col) > F.col("_prev_ts"))
        cur = stage.groupBy(user_col).agg(F.min(ts_col).alias(f"ts_{i + 1}"))
        out = cur if out is None else out.join(cur, user_col, "left")
        prev = cur.select(user_col, F.col(f"ts_{i + 1}").alias("_prev_ts"))
    return out
