"""Incremental near-dup ingestion (streaming/dedup_stream.py) and
stream-static enrichment: the streaming machinery must reproduce the
documented deterministic dedup rule across micro-batch boundaries,
and re-running with the same checkpoint must add nothing.
"""

from __future__ import annotations

import os
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from workhop2_etl_spark.streaming import dedup_stream as DS
from workhop2_etl_spark.streaming import windows as SW

from tests.conftest import SF_DIR

NUM_HASHES = 16
NUM_BANDS = 4
THRESHOLD = 0.5


def _doc(i: int, words: list[str]) -> dict:
    return {"doc_id": i, "text": " ".join(words)}


def _corpus() -> tuple[list[dict], list[dict]]:
    """Two arrival batches with engineered near-dups:
    - doc 5 ≈ doc 2 (within batch 1 → 5 dropped)
    - doc 13 ≈ doc 2 (cross-batch → 13 dropped via the index)
    - doc 15 ≈ doc 14 (within batch 2 → 15 dropped)
    - doc 17 is empty (NULL signature → always unique)

    Greedy first-wins and transitive closure agree on every pair in
    this corpus (each dup family has one kept canonical and its
    satellites are all within threshold of it), so the test pins the
    documented greedy rule via the Python replay in
    _expected_survivors rather than via a distinguishing fixture —
    building an A~B~C chain with A≁C that is STABLE under a
    16-hash MinHash estimate proved too fragile at 40-token docs.
    """
    base = [f"w{k}" for k in range(40)]

    def variant(*edits: tuple[int, str]) -> list[str]:
        w = list(base)
        for pos, tok in edits:
            w[pos] = tok
        return w

    uniq = lambda i: [f"u{i}_{k}" for k in range(40)]
    batch1 = [
        _doc(0, uniq(0)),
        _doc(1, uniq(1)),
        _doc(2, variant()),                       # canonical of the family
        _doc(3, uniq(3)),
        _doc(4, uniq(4)),
        _doc(5, variant((7, "x5"))),              # ≈ doc 2
    ]
    batch2 = [
        _doc(12, uniq(12)),
        _doc(13, variant((11, "y13"))),           # ≈ doc 2 (cross-batch)
        _doc(14, uniq(14)),
        _doc(15, [w if k != 20 else "z20" for k, w in enumerate(uniq(14))]),  # ≈ doc 14
        _doc(16, uniq(16)),
        _doc(17, [""]),                           # empty-ish doc: always unique
    ]
    return batch1, batch2


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("neardup")
    stream_dir = str(root / "in")
    os.makedirs(stream_dir)
    batch1, batch2 = _corpus()
    for i, batch in enumerate([batch1, batch2]):
        path = os.path.join(stream_dir, f"batch{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d["doc_id"] for d in batch], pa.int64()),
                    "text": pa.array([d["text"] for d in batch], pa.string()),
                }
            ),
            path,
        )
        # distinct mtimes: FileStreamSource processes oldest-first
        os.utime(path, (time.time() + i, time.time() + i))
    return root, stream_dir, batch1, batch2



_ROLLUP_COLS = ["day", "event_type", "n", "sum_value", "min_value", "max_value"]


def _canon_rollup(rows):
    """Canonical comparable set for rollup rows: sum_value is a float
    accumulated in different orders by the partial-combine and
    single-pass paths, so it is compared rounded. ONE definition of
    rollup equality for every test in this file."""
    return {
        tuple(round(r[c], 4) if c == "sum_value" else r[c] for c in _ROLLUP_COLS)
        for r in rows
    }


def _expected_survivors(spark, batches) -> set[int]:
    """Independent replay of the documented FIRST-ID-WINS rule
    (drop a doc similar to the index or to ANY lower-id batch member,
    survivor or not — the operator's one-join-pass semantics, coarser
    than survivors-only greedy): exact signature similarities from
    the engine's batch banded_signatures, rule simulated in plain
    Python over the collected (tiny) corpus."""
    all_rows = [d for b in batches for d in b]
    df = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in all_rows], "doc_id long, text string"
    )
    rows = DS.banded_signatures(df, num_hashes=NUM_HASHES, num_bands=NUM_BANDS).collect()
    sig = {}
    buckets: dict[tuple, set[int]] = {}
    for r in rows:
        sig[r["doc_id"]] = r["sig"]
        buckets.setdefault((r["band_id"], r["band_key"]), set()).add(r["doc_id"])

    def est(a: int, b: int) -> float:
        sa, sb = sig.get(a), sig.get(b)
        if sa is None or sb is None:
            return 0.0
        return sum(1 for x, y in zip(sa, sb) if x is not None and x == y) / NUM_HASHES

    def candidates(d: int) -> set[int]:
        out = set()
        for members in buckets.values():
            if d in members:
                out |= members
        out.discard(d)
        return out

    index: set[int] = set()
    survivors: set[int] = set()
    for batch in batches:
        ids = sorted(d["doc_id"] for d in batch)
        for d in ids:
            cands = candidates(d)
            dropped = any(est(d, o) >= THRESHOLD for o in cands if o in index) or any(
                est(d, o) >= THRESHOLD for o in cands if o < d and o in set(ids)
            )
            if not dropped:
                survivors.add(d)
        index |= {d for d in survivors if d in set(ids)}
    return survivors


def test_stream_neardup_ingest_matches_greedy_oracle(spark, staged):
    root, stream_dir, batch1, batch2 = staged
    out_dir = str(root / "out")
    index_dir = str(root / "index")
    ckpt = str(root / "ckpt")
    schema = "doc_id long, text string"
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    DS.stream_neardup_ingest(
        spark,
        stream_dir,
        schema,
        out_dir,
        index_dir,
        ckpt,
        num_hashes=NUM_HASHES,
        num_bands=NUM_BANDS,
        threshold=THRESHOLD,
    )
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    expected = _expected_survivors(spark, [batch1, batch2])
    assert got == expected
    # sanity on the engineered families (greedy, not closure):
    assert 2 in got and 5 not in got and 13 not in got
    assert 14 in got and 15 not in got
    assert 17 in got  # empty doc never matches anything

    # exactly-once: re-run with the same checkpoint adds nothing
    DS.stream_neardup_ingest(
        spark,
        stream_dir,
        schema,
        out_dir,
        index_dir,
        ckpt,
        num_hashes=NUM_HASHES,
        num_bands=NUM_BANDS,
        threshold=THRESHOLD,
    )
    again = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert again == got
    n_rows = spark.read.parquet(out_dir).count()
    assert n_rows == len(got)


def test_stream_static_enrich_equals_batch(spark):
    """st9: the stream-static join, run as a genuine streaming query
    (append mode — joins hold no state), equals the batch join."""
    import tempfile

    from workhop2_etl_spark.session import load_table

    events_path = os.path.join(tempfile.mkdtemp(prefix="w2e_enrich_"), "events.parquet")
    load_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(events_path)
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "cust_key")

    transform = lambda df, wm: SW.enrich_with_dim(df, cust, key="user_id", dim_key="cust_key")
    batch = transform(spark.read.parquet(events_path), None)
    streamed = SW.run_stream_to_memory(
        spark,
        events_path,
        transform,
        "stream_enrich",
        watermark=None,
        output_mode="append",
    )
    srows = sorted(tuple(str(c) for c in r) for r in streamed.collect())
    brows = sorted(tuple(str(c) for c in r) for r in batch.collect())
    assert srows == brows


def test_stream_rollup_equals_batch_and_exactly_once(spark, tmp_path_factory):
    """Streaming incremental rollup: events replayed as a bounded
    stream must materialize exactly the batch rollup, and a re-run
    with the same checkpoint must not double-count."""
    from workhop2_etl_spark.operators.incremental import rollup_events_daily
    from workhop2_etl_spark.session import load_table

    root = tmp_path_factory.mktemp("stream_rollup")
    src = str(root / "events.parquet")
    table = str(root / "daily")
    ckpt = str(root / "ckpt")
    ev = load_table(spark, SF_DIR, "events")
    # several files so availableNow replays multiple micro-batches
    ev.repartition(4).write.mode("overwrite").parquet(src)

    SW.stream_rollup_to_parquet(spark, src, table, ckpt, max_files_per_trigger=1)

    canon = _canon_rollup

    got = canon(SW.read_rollup(spark, table).collect())
    want = canon(rollup_events_daily(spark.read.parquet(src)).collect())
    assert got == want

    # committed re-run adds no batches
    SW.stream_rollup_to_parquet(spark, src, table, ckpt, max_files_per_trigger=1)
    again = canon(SW.read_rollup(spark, table).collect())
    assert again == got

    # retry idempotence: replaying one epoch's write (the at-least-
    # once failure mode) must not change what readers combine
    import os as _os

    epochs = sorted(d for d in _os.listdir(table) if d.startswith("epoch="))
    assert len(epochs) > 1  # several micro-batches actually ran
    one = spark.read.parquet(_os.path.join(table, epochs[0]))
    one.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        _os.path.join(table, epochs[0])
    )
    retried = canon(SW.read_rollup(spark, table).collect())
    assert retried == got


def test_rollup_epoch_compaction_preserves_totals(spark, tmp_path_factory):
    """Folding per-epoch partials into one must not change what
    read_rollup returns, and must leave exactly one epoch dir."""
    from workhop2_etl_spark.operators.incremental import compact_rollup_epochs
    from workhop2_etl_spark.session import load_table

    root = tmp_path_factory.mktemp("rollup_compact")
    src = str(root / "events.parquet")
    table = str(root / "daily")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    SW.stream_rollup_to_parquet(
        spark, src, table, str(root / "ckpt"), max_files_per_trigger=1
    )

    canon = _canon_rollup

    before = canon(SW.read_rollup(spark, table).collect())
    n = compact_rollup_epochs(spark, table)
    assert n >= 2
    after = canon(SW.read_rollup(spark, table).collect())
    assert after == before
    # layout: one base generation + the live top epoch only
    assert sum(1 for d in os.listdir(table) if d.startswith("base=")) == 1
    assert sum(1 for d in os.listdir(table) if d.startswith("epoch=")) == 1

    # a second compaction with nothing below the top is a no-op
    assert compact_rollup_epochs(spark, table) == 0
    assert canon(SW.read_rollup(spark, table).collect()) == before


def test_folded_epoch_replay_after_compaction(spark, tmp_path_factory):
    """The at-least-once failure mode the compaction protocol must
    survive: after epochs are folded into base=<k>, a late retry
    re-creates a folded ``epoch=e`` (e <= k). Readers must ignore it
    — totals unchanged — and the next compaction must clean it up."""
    from workhop2_etl_spark.operators.incremental import (
        compact_rollup_epochs,
        rollup_events_daily,
    )
    from workhop2_etl_spark.session import load_table

    root = tmp_path_factory.mktemp("rollup_replay")
    src = str(root / "events.parquet")
    table = str(root / "daily")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    SW.stream_rollup_to_parquet(
        spark, src, table, str(root / "ckpt"), max_files_per_trigger=1
    )

    canon = _canon_rollup

    epochs = sorted(
        (d for d in os.listdir(table) if d.startswith("epoch=")),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    assert len(epochs) >= 3
    folded = epochs[0]
    # keep a copy of a to-be-folded epoch's partial (what a replayed
    # foreachBatch of that epoch would rewrite)
    replay_partial = spark.read.parquet(
        os.path.join(table, folded)
    ).localCheckpoint(eager=True)

    before = canon(SW.read_rollup(spark, table).collect())
    assert compact_rollup_epochs(spark, table) >= 2

    # late retry resurrects the folded epoch dir
    replay_partial.write.mode("overwrite").parquet(os.path.join(table, folded))
    assert canon(SW.read_rollup(spark, table).collect()) == before

    # worst case: the replayed partial differs (e.g. a bigger batch) —
    # still ignored, because the reader rule excludes e <= k entirely
    rollup_events_daily(spark.read.parquet(src)).write.mode("overwrite").parquet(
        os.path.join(table, folded)
    )
    assert canon(SW.read_rollup(spark, table).collect()) == before

    # next compaction sweeps the stale dir without changing totals
    compact_rollup_epochs(spark, table)
    assert not os.path.isdir(os.path.join(table, folded))
    assert canon(SW.read_rollup(spark, table).collect()) == before


def test_rollup_and_compaction_on_file_uri(spark, tmp_path_factory):
    """The epoch sinks' directory protocol runs through the Hadoop
    FileSystem API (sources/fs.py): exercising an explicit ``file:``
    URI — a path os.listdir cannot handle — proves the scheme-resolved
    code path end to end (refresh, streaming sink, reader, compaction)."""
    from workhop2_etl_spark.operators.incremental import (
        compact_rollup_epochs,
        refresh_daily_rollup,
        rollup_events_daily,
    )
    from workhop2_etl_spark.session import load_table
    from workhop2_etl_spark.sources import fs

    root = tmp_path_factory.mktemp("rollup_uri")
    src = str(root / "events.parquet")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    # refresh path on a file: URI (bootstrap + incremental fold)
    table_uri = "file://" + str(root / "daily_refresh")
    lt_cut = F.to_date("ts") < F.lit("2024-01-15").cast("date")
    refresh_daily_rollup(spark, table_uri, ev.filter(lt_cut))
    refresh_daily_rollup(spark, table_uri, ev.filter(~lt_cut))
    got = {
        tuple(str(r[c]) for c in ["day", "event_type", "n"])
        for r in spark.read.parquet(table_uri).collect()
    }
    want = {
        tuple(str(r[c]) for c in ["day", "event_type", "n"])
        for r in rollup_events_daily(ev).collect()
    }
    assert got == want

    # streaming epoch sink + compaction on a file: URI
    stream_uri = "file://" + str(root / "daily_stream")
    SW.stream_rollup_to_parquet(
        spark, src, stream_uri, str(root / "ckpt"), max_files_per_trigger=1
    )
    canon = _canon_rollup
    before = canon(SW.read_rollup(spark, stream_uri).collect())
    assert compact_rollup_epochs(spark, stream_uri) >= 2
    assert canon(SW.read_rollup(spark, stream_uri).collect()) == before
    names = fs.list_child_dirs(spark, stream_uri)
    assert sum(1 for d in names if d.startswith("base=")) == 1
    assert sum(1 for d in names if d.startswith("epoch=")) == 1


def test_stream_neardup_ingest_on_file_uri(spark, staged):
    """Dedup ingest with out/index dirs as file: URIs — the index
    discovery inside foreachBatch must list via the Hadoop FS API."""
    root, stream_dir, batch1, batch2 = staged
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    out_uri = "file://" + str(root / "out_uri")
    index_uri = "file://" + str(root / "index_uri")
    DS.stream_neardup_ingest(
        spark,
        stream_dir,
        schema,
        out_uri,
        index_uri,
        str(root / "ckpt_uri"),
        num_hashes=NUM_HASHES,
        num_bands=NUM_BANDS,
        threshold=THRESHOLD,
    )
    got = {r["doc_id"] for r in spark.read.parquet(out_uri).collect()}
    assert got == _expected_survivors(spark, [batch1, batch2])


def test_index_compaction_then_continued_ingest(spark, tmp_path_factory):
    """Compacting the dedup index between runs must not change
    decisions: batches 1-2 ingest, the index epochs fold into a
    base=<k> generation, then a NEW batch arrives and must still be
    checked against everything accepted so far (via the base) —
    survivors equal the greedy oracle over all three batches."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    root = tmp_path_factory.mktemp("neardup_compact")
    stream_dir = str(root / "in")
    os.makedirs(stream_dir)
    batch1, batch2 = _corpus()
    # batch3: doc 23 ≈ doc 2 (batch-1 canonical — must be caught via
    # the COMPACTED index), doc 24 unique
    base = [f"w{k}" for k in range(40)]
    v23 = list(base)
    v23[3] = "q23"
    batch3 = [_doc(23, v23), _doc(24, [f"u24_{k}" for k in range(40)])]

    def write_batch(i, batch):
        path = os.path.join(stream_dir, f"batch{i}.parquet")
        _pq.write_table(
            _pa.table(
                {
                    "doc_id": _pa.array([d["doc_id"] for d in batch], _pa.int64()),
                    "text": _pa.array([d["text"] for d in batch], _pa.string()),
                }
            ),
            path,
        )
        os.utime(path, (time.time() + i, time.time() + i))

    write_batch(0, batch1)
    write_batch(1, batch2)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    out_dir, index_dir, ckpt = str(root / "out"), str(root / "index"), str(root / "ckpt")
    run = lambda: DS.stream_neardup_ingest(
        spark, stream_dir, schema, out_dir, index_dir, ckpt,
        num_hashes=NUM_HASHES, num_bands=NUM_BANDS, threshold=THRESHOLD,
    )
    run()

    n = DS.compact_index_epochs(spark, index_dir)
    assert n == 1  # epoch 0 folded; live top epoch 1 stays
    names = os.listdir(index_dir)
    assert sum(1 for d in names if d.startswith("base=")) == 1
    assert sum(1 for d in names if d.startswith("epoch=")) == 1
    # idempotent when nothing below the top
    assert DS.compact_index_epochs(spark, index_dir) == 0

    write_batch(2, batch3)
    run()  # same checkpoint: only batch3 processes, as epoch 2

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    expected = _expected_survivors(spark, [batch1, batch2, batch3])
    assert got == expected
    assert 23 not in got and 24 in got  # dup caught THROUGH the base


def test_stream_distinct_sketch_rollup_matches_batch(spark, tmp_path_factory):
    """The generalized epoch sink carries the HLL distinct-count
    measure: streamed per-epoch sketch partials, combined by the
    reader, must estimate EXACTLY what the single-pass batch sketch
    estimates (union of partials is bit-identical), and epoch
    compaction must not change the estimates."""
    from workhop2_etl_spark.operators.incremental import (
        combine_distinct_rollups,
        compact_rollup_epochs,
        distinct_users_estimate,
        rollup_events_daily_distinct,
    )
    from workhop2_etl_spark.session import load_table

    root = tmp_path_factory.mktemp("distinct_stream")
    src = str(root / "events.parquet")
    table = str(root / "daily_distinct")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    SW.stream_rollup_to_parquet(
        spark,
        src,
        table,
        str(root / "ckpt"),
        max_files_per_trigger=1,
        rollup_fn=rollup_events_daily_distinct,
    )

    def estimates(df):
        return {
            (r.day, r.event_type): r.n_users_est
            for r in distinct_users_estimate(df).collect()
        }

    got = estimates(SW.read_rollup(spark, table, combine_fn=combine_distinct_rollups))
    want = estimates(rollup_events_daily_distinct(spark.read.parquet(src)))
    assert got == want  # exact, not approximate: same sketch algorithm

    # folding epochs into base=<k> must preserve every estimate
    assert compact_rollup_epochs(
        spark, table, combine_fn=combine_distinct_rollups
    ) >= 2
    after = estimates(SW.read_rollup(spark, table, combine_fn=combine_distinct_rollups))
    assert after == want


def test_stream_hist_rollup_and_epoch_time_travel(spark, tmp_path_factory):
    """The epoch sink carries the histogram-quantile measure, and the
    reader time-travels: as_of=N combines exactly the first N+1
    epochs' partials; compaction preserves the present but makes
    pre-fold snapshots raise instead of answering wrong."""
    import pytest as _pytest

    from workhop2_etl_spark.operators.incremental import (
        combine_hist_rollups,
        compact_rollup_epochs,
        rollup_events_daily_hist,
    )
    from workhop2_etl_spark.session import load_table

    root = tmp_path_factory.mktemp("hist_stream")
    src = str(root / "events.parquet")
    table = str(root / "daily_hist")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    SW.stream_rollup_to_parquet(
        spark,
        src,
        table,
        str(root / "ckpt"),
        max_files_per_trigger=1,
        rollup_fn=rollup_events_daily_hist,
    )

    def cells(df):
        return {(r.day, r.event_type): (r.n, list(r.hist)) for r in df.collect()}

    full = cells(SW.read_rollup(spark, table, combine_fn=combine_hist_rollups))
    want = cells(rollup_events_daily_hist(spark.read.parquet(src)))
    assert full == want  # bit-identical bin vectors, however split

    # snapshot as of epoch 1: exactly epochs {0, 1}'s partials (the
    # stream assigns files to epochs in its own order, so the
    # expectation reads the epoch dirs it actually wrote)
    snap1_want = cells(
        combine_hist_rollups(
            spark.read.parquet(f"{table}/epoch=0", f"{table}/epoch=1")
        )
    )
    snap = cells(
        SW.read_rollup(spark, table, combine_fn=combine_hist_rollups, as_of=1)
    )
    assert snap == snap1_want
    assert sum(n for n, _ in snap.values()) < sum(n for n, _ in full.values())
    snap2_want = cells(
        combine_hist_rollups(
            spark.read.parquet(*[f"{table}/epoch={e}" for e in (0, 1, 2)])
        )
    )

    # compaction folds epochs 0-2 into base=2; present unchanged,
    # pre-fold history now refuses rather than lying
    assert compact_rollup_epochs(spark, table, combine_fn=combine_hist_rollups) == 3
    after = cells(SW.read_rollup(spark, table, combine_fn=combine_hist_rollups))
    assert after == want
    assert cells(
        SW.read_rollup(spark, table, combine_fn=combine_hist_rollups, as_of=2)
    ) == snap2_want
    with _pytest.raises(ValueError, match="compacted away"):
        SW.read_rollup(spark, table, combine_fn=combine_hist_rollups, as_of=1)


def test_stream_join_view_matches_batch_join(spark, tmp_path_factory):
    """Checkpointed streaming join-view maintenance: fact appends
    arrive in micro-batches, the dim seeds once, the maintained view
    equals the batch inner join; a second availableNow run with the
    same checkpoint adds nothing (exactly-once through replay-
    idempotent epoch overwrites)."""
    from workhop2_etl_spark.operators.incremental import read_join_view
    from workhop2_etl_spark.session import load_table

    root = tmp_path_factory.mktemp("join_view_stream")
    src = str(root / "orders.parquet")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"
    )
    orders.repartition(3).write.mode("overwrite").parquet(src)

    kw = dict(
        fact_path=src,
        dim=cust,
        a_dir=str(root / "a"),
        b_dir=str(root / "b"),
        view_dir=str(root / "view"),
        on="o_custkey",
        checkpoint_dir=str(root / "ckpt"),
        max_files_per_trigger=1,
    )
    SW.stream_join_view_to_parquet(spark, **kw)

    got = read_join_view(spark, str(root / "view"))
    want = orders.join(cust, "o_custkey", "inner")
    key = lambda r: (r.o_custkey, r.o_orderkey)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    n = got.count()
    assert n > 0

    # same checkpoint, no new files: nothing re-processed, view flat
    SW.stream_join_view_to_parquet(spark, **kw)
    assert read_join_view(spark, str(root / "view")).count() == n


def test_stream_two_sided_join_view(spark, tmp_path_factory):
    """Both join sides interleaved on ONE stream (CDC-feed shape):
    the maintained view equals the batch join — including pairs whose
    two sides arrived in the same micro-batch (the dA⋈dB term) — and
    a same-checkpoint re-run adds nothing."""
    from workhop2_etl_spark.operators.incremental import read_join_view
    from workhop2_etl_spark.session import load_table

    root = tmp_path_factory.mktemp("two_sided_view")
    src = str(root / "feed.parquet")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"
    )
    feed = (
        orders.select(
            F.lit("a").alias("side"), "o_custkey", "o_orderkey",
            "o_totalprice", F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("double").alias("c_acctbal"),
        )
        .unionByName(
            cust.select(
                F.lit("b").alias("side"), "o_custkey",
                F.lit(None).cast("long").alias("o_orderkey"),
                F.lit(None).cast("double").alias("o_totalprice"),
                "c_name", "c_acctbal",
            )
        )
    )
    feed.repartition(3).write.mode("overwrite").parquet(src)

    kw = dict(
        src_path=src,
        split_a=lambda b: b.filter(F.col("side") == "a").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        split_b=lambda b: b.filter(F.col("side") == "b").select(
            "o_custkey", "c_name", "c_acctbal"
        ),
        a_dir=str(root / "a"),
        b_dir=str(root / "b"),
        view_dir=str(root / "view"),
        on="o_custkey",
        checkpoint_dir=str(root / "ckpt"),
        max_files_per_trigger=1,
    )
    SW.stream_join_view_two_sided(spark, **kw)

    got = read_join_view(spark, str(root / "view"))
    want = orders.join(cust, "o_custkey", "inner")
    key = lambda r: (r.o_custkey, r.o_orderkey)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    n = got.count()
    assert n > 0

    SW.stream_join_view_two_sided(spark, **kw)
    assert read_join_view(spark, str(root / "view")).count() == n
