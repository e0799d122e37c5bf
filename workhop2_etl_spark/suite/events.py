"""Batch event-log analytics over `events` — sessionization, funnel,
cohort retention, transition matrix, SCD2 run compaction.

The reference pipeline has no event analytics; these are the standard
shapes a production analytics engine must cover (SURVEY.md north-star
extensions). Every query is oracle-checked: the Spark side uses
per-user windows / hash aggs only, and the DuckDB side replays the
identical logic in ANSI-ish SQL.

Scale notes (100 TB): all window partitions key on ``user_id`` (high
cardinality — parallelism scales with users, state per partition is
one user's history); funnel/cohort are filter→agg→equi-join chains
with map-side partial aggregation and monotonically shrinking
cardinality down the funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workhop2_etl_spark.operators import events as EV
from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.suite import query

# ---------------------------------------------------------------------------
# e1: gap-based sessionization (batch twin of streaming st3, but
# with per-session ids surfaced, not just aggregates).
# ---------------------------------------------------------------------------


@query(
    "e1_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL '30 minutes' THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM numbered
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def e1_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        EV.sessionize(ev, gap="30 minutes")
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


# ---------------------------------------------------------------------------
# e2: ordered funnel — signup → click → purchase, strictly increasing
# timestamps through the funnel (earliest qualifying event per step).
# ---------------------------------------------------------------------------


@query(
    "e2_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
    )
    SELECT 1 AS step, 'signup' AS event_type, (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    ORDER BY step
    """,
)
def e2_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return EV.funnel_counts(ev, ["signup", "click", "purchase"]).orderBy("step")


# ---------------------------------------------------------------------------
# e3: weekly cohort retention (long form — one row per
# (cohort_week, week_offset) cell; long beats pivot for hashing and
# for unbounded observation windows).
# ---------------------------------------------------------------------------


@query(
    "e3_cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_start
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_period
      FROM events
    )
    SELECT CAST(c.cohort_start AS DATE) AS cohort_start,
           CAST(date_diff('day', c.cohort_start, a.active_period) // 7 AS INTEGER)
             AS offset,
           count(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def e3_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # DATE on both engines: DuckDB's date_trunc('week', ts) is a DATE,
    # Spark's a timestamp — the week identity is the date either way.
    return (
        EV.cohort_retention(ev, period="week")
        .withColumn("cohort_start", F.col("cohort_start").cast("date"))
        .orderBy("cohort_start", "offset")
    )


# ---------------------------------------------------------------------------
# e4: event-type transition matrix (consecutive-event bigrams per
# user) — the "what happens next" Markov counts.
# ---------------------------------------------------------------------------


@query(
    "e4_event_transitions",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
    FROM lagged WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def e4_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return EV.transition_counts(ev).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# e5: SCD2 run compaction — event_type as the tracked "state": one
# row per run of equal state per user with valid_from/valid_to
# (NULL = current) and is_current.
# ---------------------------------------------------------------------------


@query(
    "e5_scd2_runs",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type THEN 1
                  ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, event_type,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      , ts FROM marked
    ), grouped AS (
      SELECT user_id, event_type, run_id,
             min(ts) AS valid_from, count(*) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run_id)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run_id)
             IS NULL AS is_current,
           n_events
    FROM grouped
    ORDER BY user_id, valid_from
    """,
)
def e5_scd2_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return EV.scd2_runs(ev, state_col="event_type").select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current", "n_events"
    ).orderBy("user_id", "valid_from")


# ---------------------------------------------------------------------------
# sql2: SQL over a DERIVED view — the engine's sessionization exposed
# through the SQL front end. register_derived_views publishes
# extension relations as temp views, so a SQL-only user composes
# them like tables; Catalyst plans the view body and the outer text
# query as one tree (the session window fuses with the aggregation).
# ---------------------------------------------------------------------------


def register_derived_views(spark: SparkSession, sf_dir: str) -> None:
    """Publish the engine's derived relations as temp views:
    `sessions` (gap sessionization), `doc_quality` (x8 gate),
    `dup_clusters` would follow the same pattern."""
    ev = load_table(spark, sf_dir, "events")
    (
        EV.sessionize(ev, gap="30 minutes")
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .createOrReplaceTempView("sessions")
    )


@query(
    "sql2_sessions_sql",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL '30 minutes' THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    ), sessions AS (
      SELECT user_id, session_seq, count(*) AS n_events
      FROM numbered GROUP BY user_id, session_seq
    )
    SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
    FROM sessions GROUP BY user_id ORDER BY user_id
    """,
)
def sql2_sessions_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_derived_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT user_id, count(*) AS n_sessions,
               max(n_events) AS max_session_events
        FROM sessions GROUP BY user_id ORDER BY user_id
        """
    )


# ---------------------------------------------------------------------------
# e6: funnel latency — exact p50/p90 + mean of the microsecond gap
# between consecutive funnel stages, over users who completed the
# transition. Latencies are exact integer micros on both engines, so
# the percentile interpolation sees identical inputs.
# ---------------------------------------------------------------------------


@query(
    "e6_funnel_latency",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
    ), l1 AS (
      SELECT epoch_us(s2.t) - epoch_us(s1.t) AS us
      FROM s1 JOIN s2 USING (user_id)
    ), l2 AS (
      SELECT epoch_us(s3.t) - epoch_us(s2.t) AS us
      FROM s2 JOIN s3 USING (user_id)
    )
    SELECT 'signup->click' AS transition, count(*) AS n_users,
           round(quantile_cont(us, 0.5), 4) AS p50_us,
           round(quantile_cont(us, 0.9), 4) AS p90_us,
           round(avg(us), 4) AS avg_us
    FROM l1
    UNION ALL
    SELECT 'click->purchase', count(*),
           round(quantile_cont(us, 0.5), 4),
           round(quantile_cont(us, 0.9), 4),
           round(avg(us), 4)
    FROM l2
    ORDER BY transition
    """,
)
def e6_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    times = EV.funnel_stage_times(ev, ["signup", "click", "purchase"])
    # TIMESTAMP_NTZ → exact epoch micros (session tz pinned UTC)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))

    def stats(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("transition"),
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.percentile("us", F.lit(0.5)), 4).alias("p50_us"),
            F.round(F.percentile("us", F.lit(0.9)), 4).alias("p90_us"),
            F.round(F.avg("us"), 4).alias("avg_us"),
        )

    l1 = times.filter(F.col("ts_2").isNotNull()).select(
        (us("ts_2") - us("ts_1")).alias("us")
    )
    l2 = times.filter(F.col("ts_3").isNotNull()).select(
        (us("ts_3") - us("ts_2")).alias("us")
    )
    return (
        stats(l1, "signup->click")
        .unionByName(stats(l2, "click->purchase"))
        .orderBy("transition")
    )


# ---------------------------------------------------------------------------
# e7: monthly cohort retention — variable-length periods, so offsets
# come from months_between (Spark) / date_diff('month', …) (DuckDB),
# not a day-count division (which mis-buckets 28-vs-31-day months).
# Exercises the cohort_retention(period='month') path.
# ---------------------------------------------------------------------------


@query(
    "e7_cohort_month",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, date_trunc('month', min(ts)) AS cohort_start
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('month', ts) AS active_period
      FROM events
    )
    SELECT CAST(c.cohort_start AS DATE) AS cohort_start,
           CAST(date_diff('month', c.cohort_start, a.active_period) AS INTEGER)
             AS offset,
           count(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def e7_cohort_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        EV.cohort_retention(ev, period="month")
        .withColumn("cohort_start", F.col("cohort_start").cast("date"))
        .orderBy("cohort_start", "offset")
    )


# ---------------------------------------------------------------------------
# e8: point-in-time SCD2 dimension lookup — each purchase event finds
# the state interval (built by scd2_runs over the NON-purchase
# events) containing its timestamp: user equi-join + half-open
# residual predicate valid_from <= ts < valid_to. Half-open intervals
# make same-timestamp tied runs self-resolving (the earlier tied run
# has an EMPTY interval), so the match is unique without any
# engine-specific tiebreak. Purchases before a user's first status
# event keep NULL state (left join).
# ---------------------------------------------------------------------------


@query(
    "e8_scd2_lookup",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             make_timestamp(epoch_ns(ts) // 1000) AS ts
      FROM events
    ), marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type THEN 1
                  ELSE 0 END AS chg
      FROM ev WHERE event_type <> 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ), grouped AS (
      SELECT user_id, event_type, run_id, min(ts) AS valid_from
      FROM runs GROUP BY user_id, event_type, run_id
    ), dim AS (
      SELECT user_id, event_type AS state, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, run_id) AS valid_to
      FROM grouped
    ), probes AS (
      SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, d.state, d.valid_from
    FROM probes p LEFT JOIN dim d
      ON p.user_id = d.user_id
     AND d.valid_from <= p.ts
     AND p.ts < coalesce(d.valid_to, TIMESTAMP '9999-12-31 00:00:00')
    ORDER BY p.event_id
    """,
)
def e8_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim = EV.scd2_runs(
        ev.filter(F.col("event_type") != "purchase"), state_col="event_type"
    ).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    far_future = F.lit("9999-12-31 00:00:00").cast(dim.schema["valid_from"].dataType)
    return (
        probes.join(
            dim,
            (probes["user_id"] == dim["d_user"])
            & (dim["valid_from"] <= probes["ts"])
            & (probes["ts"] < F.coalesce(dim["valid_to"], far_future)),
            "left",
        )
        .select("event_id", "user_id", "ts", "state", "valid_from")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# e9: last-touch attribution — every purchase is credited to the
# user's most recent preceding non-purchase event (its "channel");
# purchases with no prior touchpoint credit 'direct'. One per-user
# window (carry-forward via last(..., ignorenulls) over a preceding
# frame) + one hash agg — the same scale shape as sessionize: window
# state is one user's history, parallelism scales with users.
# ---------------------------------------------------------------------------


@query(
    "e9_attribution",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
      FROM events)
    SELECT coalesce(ch, 'direct') AS channel,
           count(*) AS n_purchases,
           round(sum(value), 4) AS attributed_value
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def e9_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("ch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("ch", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# e10: RFM segmentation — per-user recency/frequency/monetary scores
# (terciles) over purchase events, rolled up to segment sizes. Each
# ntile orders by (metric, user_id): the explicit total order makes
# bucket boundaries reproducible cross-engine (ties broken the same
# way everywhere). The global ntile windows are single-partition —
# fine for a user-cardinality frame; the 100 TB variant computes
# tercile BOUNDARIES (approx_percentile over the per-user frame,
# itself already shuffled once) and buckets row-locally instead.
# ---------------------------------------------------------------------------
@query(
    "e10_rfm_segments",
    oracle="""
    WITH pu AS (
      SELECT user_id, max(CAST(ts AS DATE)) AS last_day, count(*) AS freq,
             coalesce(round(sum(value), 4), 0.0) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    sc AS (
      SELECT CAST(ntile(3) OVER (ORDER BY last_day, user_id) AS INTEGER) AS r_score,
             CAST(ntile(3) OVER (ORDER BY freq, user_id) AS INTEGER) AS f_score,
             CAST(ntile(3) OVER (ORDER BY monetary, user_id) AS INTEGER) AS m_score,
             monetary
      FROM pu)
    SELECT r_score, f_score, m_score, count(*) AS n_users,
           round(sum(monetary), 2) AS total_monetary
    FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def e10_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.coalesce(F.round(F.sum("value"), 4), F.lit(0.0)).alias("monetary"),
        )
    )
    scored = per_user.select(
        F.ntile(3).over(Window.orderBy("last_day", "user_id")).alias("r_score"),
        F.ntile(3).over(Window.orderBy("freq", "user_id")).alias("f_score"),
        F.ntile(3).over(Window.orderBy("monetary", "user_id")).alias("m_score"),
        "monetary",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# e11: path mining — the top-10 3-event sequences users actually
# follow, the funnel-DISCOVERY query (e2/e6 measure a funnel you
# already know; this finds the candidates). One window per user
# (lead×2 over (ts, event_id) order), then a plain count — no joins,
# no self-join over the event log. At 100 TB: one shuffle by user_id
# + one hash aggregate over (path) — path cardinality is |event
# types|^3, tiny.
# ---------------------------------------------------------------------------
@query(
    "e11_top_paths",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, ts, event_id FROM events
    ),
    seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           count(*) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10
    """,
)
def e11_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# e12: inter-arrival gap profile — per event_type, the stream's
# cadence: count of gaps, mean / max gap seconds between consecutive
# events (global order per type by (ts, event_id)). The operational
# monitor for "did this source stall": one lag window per type, one
# aggregate; gap math in exact integer microseconds before the mean.
# ---------------------------------------------------------------------------
@query(
    "e12_event_gap_stats",
    oracle="""
    WITH ev AS (
      SELECT event_type, epoch_us(make_timestamp(epoch_ns(ts) // 1000)) AS us,
             event_id
      FROM events
    ),
    gaps AS (
      SELECT event_type,
             us - lag(us) OVER (PARTITION BY event_type
                                ORDER BY us, event_id) AS gap_us
      FROM ev
    )
    SELECT event_type,
           count(gap_us) AS n_gaps,
           round(avg(gap_us) / 1e6, 3) AS mean_gap_s,
           round(max(gap_us) / 1e6, 3) AS max_gap_s
    FROM gaps GROUP BY event_type ORDER BY event_type
    """,
)
def e12_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("event_type").orderBy(us.asc(), F.col("event_id").asc())
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1e6, 3).alias("mean_gap_s"),
            F.round(F.max("gap_us") / 1e6, 3).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# sql3: the LLM-pipeline surface through pure spark.sql — x8's
# quality rules as a SQL text query over a registered documents view
# (sql1/sql2 prove the relational surface; this proves the corpus
# ops are equally reachable without the DataFrame API). Per-language
# pass accounting, integer-ratio rules identical to x8.
# ---------------------------------------------------------------------------
@query(
    "sql3_corpus_quality_sql",
    oracle="""
    WITH m AS (
      SELECT lang, n_chars,
             CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
                  THEN 0
                  ELSE len(string_split(
                    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
             END AS n_tok,
             CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
                  THEN 0
                  ELSE len(list_distinct(string_split(
                    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')))
             END AS n_dtok,
             length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS n_sym,
             length(text) AS n_raw
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_chars >= 50 AND n_chars <= 20000
                          AND n_tok >= 10 AND n_dtok * 10 >= n_tok * 3
                          AND n_sym * 10 <= n_raw * 3
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_passed
    FROM m GROUP BY lang ORDER BY lang
    """,
)
def sql3_corpus_quality_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        r"""
        WITH m AS (
          SELECT lang, n_chars,
                 CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ')) = ''
                      THEN 0
                      ELSE size(split(
                        trim(regexp_replace(lower(text), '\\s+', ' ')), ' '))
                 END AS n_tok,
                 CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ')) = ''
                      THEN 0
                      ELSE size(array_distinct(split(
                        trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')))
                 END AS n_dtok,
                 length(regexp_replace(text, '[A-Za-z0-9 ]', '')) AS n_sym,
                 length(text) AS n_raw
          FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN n_chars >= 50 AND n_chars <= 20000
                              AND n_tok >= 10 AND n_dtok * 10 >= n_tok * 3
                              AND n_sym * 10 <= n_raw * 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_passed
        FROM m GROUP BY lang ORDER BY lang
        """
    )
