"""Streaming ≡ batch: each window transform, run as a genuine
Structured-Streaming query (readStream → availableNow → memory sink),
must produce exactly the batch result of the same function.
"""

from __future__ import annotations

import os

import pytest

from workhop2_etl_spark.streaming import windows as SW

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_path(spark):
    """The driver's events.parquet stores TIMESTAMP(NANOS), which the
    Spark parquet reader rejects; re-materialize at µs precision (the
    engine's load_table conversion) for the stream source."""
    import tempfile

    from workhop2_etl_spark.session import load_table

    out = os.path.join(tempfile.mkdtemp(prefix="w2e_events_"), "events_us.parquet")
    load_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(out)
    return out


def _rows(df):
    return sorted(tuple(str(c) for c in r) for r in df.collect())


def _parts_in_batch_order(src):
    """Part files ordered by the data they contain (min event_id),
    not by mtime: back-to-back writes can tie on filesystems with
    coarse mtime resolution (overlays, network mounts), which would
    re-stamp micro-batches in the wrong order. Fixtures write each
    batch with a strictly higher min event_id."""
    import os

    import pyarrow.parquet as pq

    parts = [os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")]
    parts.sort(
        key=lambda p: min(pq.read_table(p, columns=["event_id"])["event_id"].to_pylist())
    )
    return parts


@pytest.mark.parametrize(
    "name,transform",
    [
        ("tumbling", lambda df, wm: SW.tumbling_counts(df, "1 hour", watermark=wm)),
        ("sliding", lambda df, wm: SW.sliding_counts(df, "1 hour", "15 minutes", watermark=wm)),
        ("session", lambda df, wm: SW.session_windows(df, "10 minutes", watermark=wm)),
    ],
)
def test_stream_equals_batch(spark, name, transform, events_path):
    batch = transform(spark.read.parquet(events_path), None)
    streamed = SW.run_stream_to_memory(
        spark, events_path, transform, f"stream_{name}", watermark=SW.DEFAULT_WATERMARK
    )
    assert _rows(streamed) == _rows(batch)


def test_stateful_running_totals(spark, events_path):
    """applyInPandasWithState: final per-user state after an
    availableNow replay equals the batch aggregate. (Update mode may
    emit a row per micro-batch per key — keep the last per user.)"""
    from pyspark.sql import functions as F

    streamed = SW.run_stream_to_memory(
        spark,
        events_path,
        lambda df, wm: SW.running_user_totals(df),
        "stream_stateful",
        watermark=None,
        output_mode="update",
    )
    # last emission per user = max n_events (counts only grow)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        streamed.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    # the operator emits RAW sums (rounding is the consumer's job) —
    # compare raw against raw, rounded only for the set compare
    batch = (
        spark.read.parquet(events_path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    a = {(r.user_id, r.n_events, round(r.sum_value, 3)) for r in final.collect()}
    b = {(r.user_id, r.n_events, round(r.sum_value, 3)) for r in batch.collect()}
    assert a == b


def test_stream_dedup_within_watermark(spark, events_path):
    """dropDuplicatesWithinWatermark on a doubled stream: since both
    copies of each event carry the same event time, every duplicate
    falls inside the watermark window and the deduped counts equal
    the single-copy batch counts."""
    import tempfile

    from pyspark.sql import functions as F

    # double the source on disk so the STREAM sees duplicates
    doubled_dir = os.path.join(tempfile.mkdtemp(prefix="w2e_dup_"), "doubled.parquet")
    src = spark.read.parquet(events_path)
    src.unionAll(src).write.mode("overwrite").parquet(doubled_dir)

    streamed = SW.run_stream_to_memory(
        spark,
        doubled_dir,
        lambda df, wm: SW.deduped_counts(df, watermark=wm),
        "stream_dedup",
        watermark=SW.DEFAULT_WATERMARK,
    )
    batch = src.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert _rows(streamed) == _rows(batch)


def test_stream_interval_join_equals_batch(spark, events_path):
    """Stream-stream interval join under availableNow: the emitted
    pair set equals the batch join. Inner joins emit matches as both
    sides arrive; the watermark + range condition only bound state."""
    ev_batch = spark.read.parquet(events_path)

    def split(df):
        import pyspark.sql.functions as F

        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "click"),
        )

    bv, bc = split(ev_batch)
    batch = SW.interval_join_pairs(bv, bc, within="30 minutes")

    import tempfile

    schema = ev_batch.schema
    sv, sc = split(spark.readStream.schema(schema).parquet(events_path))
    streamed_q = (
        SW.interval_join_pairs(
            sv, sc, within="30 minutes", watermark=SW.DEFAULT_WATERMARK
        )
        .writeStream.format("memory")
        .queryName("stream_ij")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="w2e_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    streamed_q.awaitTermination()
    assert _rows(spark.table("stream_ij")) == _rows(batch)


def test_stream_left_outer_interval_join_emits_nulls_after_watermark(spark):
    """LEFT OUTER stream-stream interval join: matched pairs emit as
    both sides arrive; an unmatched left row emits exactly once with a
    NULL right side, but only AFTER the watermark passes
    left.ts + within (state expiry proves no future match). Three
    single-file micro-batches: batch 0 holds the views + one matching
    click; batches 1-2 advance the watermark far past every view's
    horizon so the unmatched view's NULL row flushes (the one-batch
    watermark-propagation lag needs the second advance). The global
    watermark is the MIN across both join inputs
    (multipleWatermarkPolicy=min — required for outer-join
    correctness), so the advancing events must flow through BOTH
    sides: each advance batch carries a view AND a click that match
    each other, leaving no pending state of their own. The final
    emission set must equal the batch left join."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    def ev(eid, uid, minute, etype):
        return (eid, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute),
                uid, etype, 1.0, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = tempfile.mkdtemp(prefix="w2e_loj_")
    batches = [
        # v1 gets a click 10 min later; v2 never matches
        [ev(1, 7, 0, "view"), ev(2, 8, 5, "view"), ev(3, 7, 10, "click")],
        # far-future matched view+click pairs on BOTH sides: advance
        # each input's watermark (global wm is the min of the two)
        # without leaving pending unmatched state of their own
        [ev(100, 999, 1300, "view"), ev(101, 999, 1305, "click")],
        [ev(102, 998, 3000, "view"), ev(103, 998, 3005, "click")],
    ]
    for b in batches:
        spark.createDataFrame(b, schema).repartition(1).write.mode("append").parquet(src)
    parts = _parts_in_batch_order(src)
    assert len(parts) == 3
    for i, p in enumerate(parts):
        os.utime(p, (1_700_000_000 + i * 1000,) * 2)

    def split(df):
        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "click"),
        )

    bv, bc = split(spark.read.parquet(src))
    batch = SW.interval_join_pairs(bv, bc, within="30 minutes", how="leftOuter")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sv, sc = split(stream)
    q = (
        SW.interval_join_pairs(
            sv, sc, within="30 minutes", watermark="10 minutes", how="leftOuter"
        )
        .writeStream.format("memory")
        .queryName("stream_loj")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="w2e_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(spark.table("stream_loj")) == _rows(batch)


def test_foreach_batch_upsert_and_checkpoint_exactly_once(spark, events_path):
    """foreachBatch streaming upsert: after an availableNow run the
    parquet table equals the batch dedup of the source; re-running
    with the SAME checkpoint adds nothing (the committed epochs are
    not reprocessed — the streaming exactly-once contract)."""
    import tempfile

    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="w2e_upsert_")
    table_dir = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")

    for _ in range(2):  # second run must be a no-op
        SW.stream_upsert_to_parquet(
            spark, events_path, table_dir, keys=["event_id"], checkpoint_dir=ckpt
        )

    got = spark.read.parquet(table_dir)
    src = spark.read.parquet(events_path).dropDuplicates(["event_id"])
    assert got.count() == src.count()
    a = {(r.event_id, r.event_type) for r in got.select("event_id", "event_type").collect()}
    b = {(r.event_id, r.event_type) for r in src.select("event_id", "event_type").collect()}
    assert a == b


def test_late_rows_dropped_by_watermark_accounting(spark):
    """Out-of-order data BEYOND the watermark: rows must be dropped,
    with exact accounting. Three single-file micro-batches
    (maxFilesPerTrigger=1): batch 0 carries the event times that set
    the watermark, batch 1 advances it, batch 2 plants one event older
    than the committed watermark plus an on-time event. (The planted
    row sits two batches after the data that outdates it because the
    aggregation's late filter uses the watermark committed from
    batches ≤ N-2 — the documented one-batch propagation lag.)
    Asserts (a) the state operator reports exactly the planted late
    row via numRowsDroppedByWatermark, and (b) the finalized windows
    emitted in append mode equal the batch aggregate over on-time
    rows for every window at-or-below the final watermark."""
    import datetime as dt
    import json
    import os
    import tempfile

    from pyspark.sql import functions as F

    def ev(eid, minute, etype="click", value=1.0):
        return (eid, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute),
                7, etype, value, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = tempfile.mkdtemp(prefix="w2e_late_")
    batches = [
        # b0: max ts 01:55 -> watermark 01:25 once committed
        [ev(1, 5), ev(2, 10), ev(3, 40), ev(4, 75), ev(5, 115)],
        # b1: on-time, advances the watermark further (02:20 -> 01:50)
        [ev(50, 125), ev(51, 140)],
        # b2: 00:12 is beyond the in-effect watermark 01:25 (late ->
        # dropped); 02:30 is on time and closes out [01:00, 02:00)
        [ev(100, 12), ev(101, 150)],
    ]
    for b in batches:
        spark.createDataFrame(b, schema).repartition(1).write.mode("append").parquet(src)
    parts = _parts_in_batch_order(src)
    assert len(parts) == 3
    # deterministic micro-batch order: file mtimes far apart
    for i, p in enumerate(parts):
        os.utime(p, (1_700_000_000 + i * 1000,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = SW.tumbling_counts(stream, "1 hour", watermark="30 minutes")
    ckpt = tempfile.mkdtemp(prefix="w2e_late_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName("late_acct")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = 0
    final_wm = None
    for p in q.recentProgress:
        prog = json.loads(p.json)
        for op in prog.get("stateOperators", []):
            dropped += op.get("numRowsDroppedByWatermark", 0)
        final_wm = prog.get("eventTime", {}).get("watermark", final_wm)
    assert dropped == 1, f"expected exactly the planted late row dropped, got {dropped}"

    # append mode emits only windows finalized at-or-below the final
    # watermark (02:00): [00:00, 01:00) and [01:00, 02:00). They must
    # equal the batch aggregate over on-time rows — late row excluded.
    emitted = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in spark.table("late_acct").collect()
    }
    wm_ts = dt.datetime.fromisoformat(final_wm.replace("Z", ""))
    on_time = [r for b in batches for r in b if r[0] != 100]
    batch_ref = SW.tumbling_counts(
        spark.createDataFrame(on_time, schema), "1 hour", watermark=None
    ).filter(F.col("window_end") <= F.lit(wm_ts))
    ref = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in batch_ref.collect()
    }
    assert emitted == ref, (emitted, ref)


def test_stream_windowed_distinct_users_chain(spark, events_path):
    """st10's dedup → windowed-agg chain runs as a genuine streaming
    query (two stateful operators — append mode + watermark). Append
    emits exactly the windows the final watermark closed; those must
    equal the batch answer for the same windows, and the tail must be
    the only difference."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = spark.read.parquet(events_path)
    batch = SW.windowed_distinct_users(src, "1 hour")

    streamed = SW.run_stream_to_memory(
        spark,
        events_path,
        lambda df, wm: SW.windowed_distinct_users(df, "1 hour", watermark=wm),
        "stream_distinct_users",
        watermark=SW.DEFAULT_WATERMARK,
        output_mode="append",
    )

    max_ts = src.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    horizon = max_ts - dt.timedelta(minutes=30)  # DEFAULT_WATERMARK
    closed = batch.filter(F.col("window_end").cast("timestamp") <= F.lit(horizon))

    srows = sorted(tuple(str(c) for c in r) for r in streamed.collect())
    brows = sorted(tuple(str(c) for c in r) for r in closed.collect())
    assert srows == brows
    assert len(srows) > 0  # non-vacuous: most windows did close


def test_foreach_batch_upsert_on_file_uri(spark, events_path, tmp_path):
    """stream_upsert_to_parquet's existence probe and tmp cleanup go
    through the Hadoop FS API — prove it on an explicit file: URI."""
    from pyspark.sql import functions as F

    table = "file://" + str(tmp_path / "upsert_table")
    SW.stream_upsert_to_parquet(
        spark,
        events_path,
        table,
        keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    src = spark.read.parquet(events_path)
    got = spark.read.parquet(table)
    assert got.count() == src.select("event_id").distinct().count()
    # no stray tmp version dirs left behind
    import os as _os

    stray = [d for d in _os.listdir(str(tmp_path)) if ".epoch" in d]
    assert stray == []


def test_stream_upsert_recovers_interrupted_publish(spark, events_path, tmp_path):
    """Crash-window recovery for the rename-swap publish: if a prior
    run died between swap-out (table→__old) and swap-in (tmp→table),
    the next batch must restore the __old copy BEFORE reading its
    base — no rows lost, leftovers cleaned. Also: a stale __tmp from
    a pre-publish crash is discarded, never merged."""
    import shutil

    from pyspark.sql import functions as F

    table_dir = str(tmp_path / "table")
    SW.stream_upsert_to_parquet(
        spark, events_path, table_dir, keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    baseline = spark.read.parquet(table_dir).count()
    assert baseline > 0

    # simulate the mid-swap crash: the only live copy is __old
    shutil.move(table_dir, table_dir + "__old")
    # plus a stale pre-publish tmp with poison rows that must NOT
    # survive recovery
    poison = str(tmp_path / "poison")
    spark.read.parquet(events_path).limit(1).withColumn(
        "event_type", F.lit("POISON")
    ).write.parquet(poison)
    shutil.copytree(poison, table_dir + "__tmp")

    # a fresh checkpoint replays all input; recovery must restore the
    # old table first, then merge idempotently on event_id
    SW.stream_upsert_to_parquet(
        spark, events_path, table_dir, keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    got = spark.read.parquet(table_dir)
    assert got.count() == baseline
    assert got.filter(F.col("event_type") == "POISON").count() == 0
    assert not os.path.exists(table_dir + "__old")
    assert not os.path.exists(table_dir + "__tmp")


def test_stream_full_outer_interval_join_emits_both_null_sides(spark):
    """FULL OUTER stream-stream interval join: unmatched LEFT rows
    flush with NULL right after the watermark passes left.ts+within
    (as in the left-outer test), and unmatched RIGHT rows flush with
    NULL left after the watermark passes their own ts. Batch 0 plants
    one matched pair, one never-matched view, and one never-matched
    click (a click 40min after the view — outside the 30min window in
    BOTH directions); batches 1-2 advance both inputs' watermarks with
    self-matching far-future pairs. Final emissions must equal the
    batch full join, including the key on right-only rows."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    def ev(eid, uid, minute, etype):
        return (eid, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute),
                uid, etype, 1.0, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = tempfile.mkdtemp(prefix="w2e_foj_")
    batches = [
        # v1+c1 match; v2 never matched; c2 (40min after v2) matches
        # nothing in either direction
        [ev(1, 7, 0, "view"), ev(3, 7, 10, "click"),
         ev(2, 8, 5, "view"), ev(4, 8, 45, "click")],
        [ev(100, 999, 1300, "view"), ev(101, 999, 1305, "click")],
        [ev(102, 998, 3000, "view"), ev(103, 998, 3005, "click")],
    ]
    for b in batches:
        spark.createDataFrame(b, schema).repartition(1).write.mode("append").parquet(src)
    parts = _parts_in_batch_order(src)
    assert len(parts) == 3
    for i, p in enumerate(parts):
        os.utime(p, (1_700_000_000 + i * 1000,) * 2)

    def split(df):
        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "click"),
        )

    bv, bc = split(spark.read.parquet(src))
    batch = SW.interval_join_pairs(bv, bc, within="30 minutes", how="fullOuter")
    # non-vacuous: the batch face has a NULL-left row carrying the
    # right side's key (the coalesce contract)
    rows = batch.collect()
    assert any(r.l_event_id is None and r.user_id == 8 for r in rows)
    assert any(r.r_event_id is None and r.user_id == 8 for r in rows)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sv, sc = split(stream)
    q = (
        SW.interval_join_pairs(
            sv, sc, within="30 minutes", watermark="10 minutes", how="fullOuter"
        )
        .writeStream.format("memory")
        .queryName("stream_foj")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="w2e_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(spark.table("stream_foj")) == _rows(batch)
