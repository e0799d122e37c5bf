"""Retrieval operators — BM25 lexical scoring and reciprocal-rank
fusion for hybrid (lexical + vector) search over a document corpus.

North-star extension beyond the reference's surface: a training-data
curation pipeline needs lexical retrieval (contamination probes,
quality-by-example search, eval-set leakage audits) next to the
v-family's vector ANN, and hybrid fusion is how production search
combines the two (Cormack et al., SIGIR 2009 — reciprocal rank
fusion; Robertson & Zaragoza 2009 — the BM25 probabilistic model).

Scale shape (the part that matters at 100 TB):

* The query side is a SMALL relation by contract (a bounded set of
  probe queries), so every join that touches the corpus-sized side
  broadcasts the query side — the corpus's term-frequency relation is
  shuffled exactly once (the ``(doc_id, term)`` aggregation) and
  never again.
* Corpus-level statistics (N, avgdl) are one partial-aggregated scan
  reduced to a single row and broadcast; document frequencies are
  computed corpus-wide but immediately semi-joined down to the query
  vocabulary (a broadcast), so the big ``df`` relation never shuffles
  against ``tf``.
* Every floating-point score folds in a DETERMINISTIC order (per-term
  contributions added sequentially in ascending-term order; since r13
  two bit-identical physical shapes exist — a window aggregate over
  term-sorted rows for the in-session paths, the collect_list +
  sort_array + ``F.aggregate`` fold for artifact probes — see
  ``_bm25_score``), so scores are bit-reproducible against a SQL
  oracle rather than merely close — the same discipline as the
  v-family cosine folds in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


def _seq_sum(contribs_by_key: Column) -> Column:
    """Sequential double fold over an array of (key, value) structs
    sorted by key — the deterministic alternative to SUM(), whose
    hash-aggregate addition order is engine- and partitioning-
    dependent. DuckDB twin: list_reduce(list(v ORDER BY key), +).

    Duplicate keys (r11 adversarial note): ``sort_array`` orders by
    the WHOLE struct — (key, then v) — so the fold stays
    deterministic even when keys repeat. The BM25 pipeline never
    feeds duplicates (tf is unique per (doc_id, term) and the query
    relation is distinct-ed defensively in ``_bm25_rank``), but a
    direct caller with repeated keys must mirror that tiebreak on the
    oracle side: ``list(v ORDER BY key, v)``, because DuckDB's
    ``ORDER BY key`` alone leaves the order of equal keys unspecified
    (tests/test_retrieval.py pins the Spark-side determinism)."""
    return F.aggregate(
        F.transform(F.sort_array(contribs_by_key), lambda s: s["v"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def bm25_topk(
    corpus_tokens: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_digits: int = 6,
    exclude_self: bool = True,
    id_col: str = "doc_id",
    tok_col: str = "toks",
) -> DataFrame:
    """Okapi BM25 top-k retrieval.

    ``corpus_tokens``: (id_col, tok_col: array<string>) — pre-
    tokenized documents; rows with empty token arrays are excluded
    from the index (they can't match and would skew avgdl).
    ``query_terms``: (query_id, term) — the DISTINCT query vocabulary
    per query, small by contract (broadcast throughout).

    Scoring: score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln(1 + (N − df + ½)/(df
    + ½)) — the non-negative "plus one" idf variant (Robertson &
    Zaragoza 2009 §3.3), so rare-term matches never score below
    frequent-term ones.

    Returns (query_id, rank, doc_id, score, n_hit) with rank ≤ k per
    query, ordered by (rounded score desc, doc_id asc) — integer and
    id tiebreaks keep the ranking cross-engine deterministic.

    Evaluation note (r12): constructing the returned frame runs ONE
    bounded eager action — the query relation (query-bounded by
    contract) materializes at the driver so its lineage executes once
    instead of once per broadcast build; relations beyond the 2^20-row
    guard keep the fully lazy plan.

    Plan shape: ONE corpus shuffle (the tf aggregation on (doc_id,
    term), dl carried through it as min(dl) so no re-join on doc_id);
    df semi-joined to the query vocabulary then broadcast; stats
    reduced to one row and broadcast; the scoring join is
    tf ⋈bc query_terms — map-side only. Final top-k is a window on
    query_id (row_number + filter → TakeOrdered-shaped per group).
    """
    tf = _tf_relation(corpus_tokens, id_col, tok_col)
    stats = _stats_from_counts(
        _stats_partial(corpus_tokens, tok_col)
    )
    df_all = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return _bm25_rank(
        tf, df_all, stats, query_terms,
        k=k, k1=k1, b=b, round_digits=round_digits,
        exclude_self=exclude_self,
    )


def _tf_relation(corpus_tokens: DataFrame, id_col: str, tok_col: str) -> DataFrame:
    """(doc_id, term, tf, dl) — the BM25 posting relation; empty-token
    docs are excluded from the index (they can't match and would skew
    avgdl). dl rides through the tf aggregation (min of a per-doc
    constant) so scoring never re-joins on doc_id."""
    return (
        corpus_tokens.filter(F.size(tok_col) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.size(tok_col).alias("__dl"),
            F.explode(tok_col).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("__dl").alias("dl"))
    )


def _stats_partial(corpus_tokens: DataFrame, tok_col: str) -> DataFrame:
    """One-row (n_docs, sum_dl) partial over indexed docs — exact
    integer sums, ADDITIVE across disjoint document sets (the property
    the persisted index's append path relies on)."""
    return corpus_tokens.filter(F.size(tok_col) > 0).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(tok_col)), F.lit(0)).alias("sum_dl"),
    )


def _stats_from_counts(counts: DataFrame) -> DataFrame:
    """(n_docs, avgdl) from a (n_docs, sum_dl) relation. avgdl is the
    ONE division both engines (and the save/load round trip) perform
    on the same exact integers — never avg(), whose accumulation
    order could differ. An EMPTY corpus (n_docs = 0 — e.g. a freshly
    seeded artifact health-checked before its first ingest) yields
    NULL avgdl instead of an ANSI divide-by-zero error; scoring never
    reaches avgdl then (no tf rows exist)."""
    return counts.select(
        "n_docs",
        F.when(
            F.col("n_docs") > 0,
            F.col("sum_dl").cast("double") / F.col("n_docs"),
        ).alias("avgdl"),
    )


def _bm25_rank(
    tf: DataFrame,
    df_all: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    k: int,
    k1: float,
    b: float,
    round_digits: int,
    exclude_self: bool,
    agg_shape: str = "window",
) -> DataFrame:
    """The BM25 scoring + ranking core over prepared relations —
    shared verbatim by ``bm25_topk`` (in-session) and
    ``probe_lexical_index`` (loaded artifact), so a persisted index
    probes row-identically to an in-session ranking (``agg_shape``
    picks the physical aggregation; both produce bit-identical
    scores — see ``_bm25_score``)."""
    agg = _bm25_score(
        tf, df_all, stats, query_terms,
        k1=k1, b=b, round_digits=round_digits, exclude_self=exclude_self,
        agg_shape=agg_shape,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "n_hit")
    )


def _bm25_score(
    tf: DataFrame,
    df_all: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    k1: float,
    b: float,
    round_digits: int,
    exclude_self: bool,
    candidates: DataFrame | None = None,
    agg_shape: str = "window",
) -> DataFrame:
    """(query_id, doc_id, score, n_hit) — the un-ranked scoring half
    of ``_bm25_rank``, split out (r11) so the ``max_df``-pruned path
    can apply its per-query candidate restriction BEFORE the top-k
    window (reusing the ranked core would let the interim top-k cut
    candidates that belong in the final k). ``candidates`` (optional,
    the pruned path's (query_id, doc_id) relation — bounded by
    contract, broadcast) restricts scoring per (query, doc) BEFORE
    the contribution aggregation, so the collect_list/fold volume is
    candidate-sized even when the posting slice is head-term-heavy.

    ``agg_shape`` picks the PHYSICAL aggregation only — both shapes
    add the per-term contributions sequentially in ascending-term
    order from +0.0, so scores are bit-identical (pinned on the full
    fixture corpus by test_bm25_window_sum_bit_identical_to_fold):

    - ``'window'`` (r13): a window aggregate over term-sorted rows —
      whole-stage-codegen-friendly, and its one query_id exchange also
      serves the downstream ranking window. Interleaved min-of-4 A/B
      at sf0.1: 4.8s → 3.2s on the in-session shape, where the
      contribution relation arrives on the corpus aggregation's many
      partitions and the saved exchange + codegen dominate.
    - ``'fold'`` (the pre-r13 shape): collect_list + sort_array + a
      sequential fold — an ObjectHashAggregate, but its per-group
      sorts are over ≤|query-vocab| elements. On ARTIFACT PROBES the
      contribution relation comes off a few scan partitions and is
      vocab-bounded; there the global term-string sort the window
      needs measured SLOWER (2.5s → 3.9s, same interleaved protocol),
      so the probe paths keep the fold deliberately."""
    # defensive distinct: a duplicate (query_id, term) input row would
    # double-count that term's contribution — the query relation is
    # tiny by contract, so the dedup is free
    qt = query_terms.select("query_id", "term").distinct()
    # r12 optimization: materialize the query relation at the driver.
    # Left lazy, the caller's query-side lineage (typically a corpus
    # scan + tokenize + explode + distinct) executes once per
    # broadcast build — query_terms and qvocab are SEPARATE broadcast
    # exchanges, so the same scan ran 2-4 times per action (t11's
    # plan held 10 parquet scans of one table). The relation is
    # query-bounded by contract; if it exceeds the 2^20-row ceiling,
    # fall back to the lazy form unchanged.
    cap = 1 << 20
    rows = qt.limit(cap + 1).collect()
    if len(rows) <= cap:
        spark = tf.sparkSession
        query_terms = spark.createDataFrame(rows, schema=qt.schema)
        # None-filter (r12 advice fix): a NULL term never joins, and
        # sorted() raises on None-vs-str — same semantics, no crash
        vocab = sorted({r.term for r in rows if r.term is not None})
        qvocab = spark.createDataFrame(
            [(t,) for t in vocab], schema=qt.select("term").schema
        )
    else:
        query_terms = qt
        qvocab = qt.select("term").distinct()
    df_q = df_all.join(F.broadcast(qvocab), "term")
    scored = (
        tf.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(df_q), "term")
        .crossJoin(F.broadcast(stats))
    )
    if candidates is not None:
        scored = scored.join(
            F.broadcast(candidates), ["query_id", "doc_id"], "left_semi"
        )
    if exclude_self:
        scored = scored.filter(F.col("doc_id") != F.col("query_id"))
    # Constants are folded in PYTHON and injected as double literals
    # (k1+1 evaluated as a double literal-sum on one engine and a
    # decimal literal-sum on another differ in the last ulp); the
    # expression tree below is mirrored term-for-term by
    # bm25_contrib_sql so scores are bit-identical, not just close.
    k1 = float(k1)
    b = float(b)
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1p1)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(one_minus_b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    if agg_shape not in ("window", "fold"):
        raise ValueError(
            f"agg_shape must be 'window' or 'fold', got {agg_shape!r}"
        )
    if agg_shape == "fold":
        contrib = scored.select(
            "query_id",
            "doc_id",
            F.struct(
                F.col("term").alias("key"), (idf * tf_part).alias("v")
            ).alias("__c"),
        )
        return contrib.groupBy("query_id", "doc_id").agg(
            F.round(_seq_sum(F.collect_list("__c")), round_digits).alias(
                "score"
            ),
            F.count(F.lit(1)).alias("n_hit"),
        )
    contrib = scored.select(
        "query_id",
        "doc_id",
        "term",
        (idf * tf_part).alias("__v"),
    )
    # The 'window' shape (r13): the same deterministic sum —
    # contributions added sequentially in ascending-term order,
    # starting from +0.0 — computed by a window aggregate over
    # term-sorted rows (a window frame's processor accumulates rows in
    # the window's sort order, so the addition order and every last
    # ulp of the score are unchanged vs the fold). The explicit
    # repartition on query_id alone (hash on a prefix of the window
    # keys still co-locates each (query, doc) group) serves BOTH this
    # window and the downstream ranking window — one exchange where
    # the fold shape pays two.
    wseq = Window.partitionBy("query_id", "doc_id").orderBy("term")
    wall = wseq.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        contrib.repartition("query_id")
        .select(
            "query_id",
            "doc_id",
            F.row_number().over(wseq).alias("__rn"),
            F.sum("__v").over(wall).alias("__score"),
            F.count(F.lit(1)).over(wall).alias("__n"),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "query_id",
            "doc_id",
            F.round("__score", round_digits).alias("score"),
            F.col("__n").alias("n_hit"),
        )
    )


# ---------------------------------------------------------------------------
# Persisted lexical (BM25) index — the lexical twin of the ANN index
# lifecycle in operators/index_store.py. At 100 TB the expensive half
# of lexical retrieval is the INDEX BUILD (the corpus-wide (doc,
# term) tf aggregation); the production posture (Lucene segments) is
# an on-disk artifact probed across sessions. BM25's corpus state is
# exactly additive over DISJOINT document sets — df, n_docs and Σdl
# are sums — so appends write per-epoch PARTIALS and the loader
# re-aggregates: build ∪ append ≡ single-shot, bit-exactly (the same
# integers reach the same divisions).
# ---------------------------------------------------------------------------

_LEXICAL_KIND = "bm25-lexical"


def save_lexical_index(
    corpus_tokens: DataFrame,
    path: str,
    id_col: str = "doc_id",
    tok_col: str = "toks",
    tokenizer: str = "ws-lower",
    mode: str = "error",
    num_partitions: int | None = None,
) -> dict:
    """Build the BM25 posting relation and persist the index at
    ``path``: ``tf`` (doc_id, term, tf, dl — repartitioned and sorted
    by term, so a point-probe's term IN-list prunes whole files via
    parquet min/max stats), ``df`` (per-epoch (term, df) partials),
    ``stats`` (per-epoch (n_docs, sum_dl) partials), and the metadata
    record. ``tokenizer`` is a free-form contract string recorded so
    a probe pipeline can refuse an index tokenized under another
    convention (the guard is load-time, by label — the tokens
    themselves were the caller's input). Returns the metadata."""
    from workhop2_etl_spark.operators.index_store import (
        FORMAT_VERSION,
        _reset_lifecycle_state,
        _write_meta,
    )

    _reset_lifecycle_state(corpus_tokens.sparkSession, path, mode)
    _write_lexical_epoch(
        corpus_tokens, path, id_col, tok_col, mode,
        num_partitions=num_partitions,
    )
    meta = {
        "kind": _LEXICAL_KIND,
        "version": FORMAT_VERSION,
        "id_col": id_col,
        # recorded so stream ingest reads the artifact's OWN token
        # column instead of inferring one from caller arguments
        # (streaming/index_stream.py, r11)
        "tok_col": tok_col,
        "tokenizer": tokenizer,
        "epoch": 0,
    }
    _write_meta(corpus_tokens.sparkSession, path, meta, mode)
    return meta


def _write_lexical_epoch(
    corpus_tokens: DataFrame,
    path: str,
    id_col: str,
    tok_col: str,
    mode: str,
    num_partitions: int | None = None,
) -> None:
    # ONE corpus pass (r12): the tf relation persists across the
    # three writes so the corpus is tokenized+aggregated once — df
    # AND stats both derive from it (stats via min(dl) per doc, the
    # same per-doc-exact trick the delete path uses), where the old
    # shape re-ran the regex tokenization for each of tf/df/stats
    # (3× the dominant cost; measured 8.9s → ~4s on the sf0.1 save,
    # and at 100 TB the difference between one corpus scan and
    # three). tf is the aggregation OUTPUT (distinct (doc, term)
    # pairs), far smaller than the raw corpus; MEMORY_AND_DISK spills
    # rather than recomputing.
    from pyspark import StorageLevel

    tf = _tf_relation(corpus_tokens, id_col, tok_col)
    # r13 optimization: SEED saves (``save_lexical_index(
    # corpus.limit(0), ...)`` — every streaming lifecycle seeds an
    # empty artifact this way) previously launched three Spark write
    # jobs for zero rows. When Catalyst itself proves the input
    # statically empty (the optimized plan folds to an empty
    # LocalRelation — a real source scan never does), the three files
    # are written driver-side with the identical layout: empty tf/df
    # parts, the one (0, 0) stats partial a global aggregate over
    # empty input produces, schemas taken from the same lazy frames
    # the Spark writer would have used (guide §1.2 — zero records
    # should never launch a distributed job). Non-local paths, a
    # missing pyarrow, or append-into-existing fall through to the
    # Spark writer unchanged.
    from workhop2_etl_spark.operators.index_store import (
        _driver_write_tiny_parquet,
        _plan_is_empty_local,
    )

    if _plan_is_empty_local(tf):
        df_schema = tf.groupBy("term").agg(
            F.count(F.lit(1)).alias("df")
        ).schema
        stats_schema = (
            tf.groupBy("doc_id")
            .agg(F.min("dl").alias("__dl"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("__dl"), F.lit(0)).alias("sum_dl"),
            )
            .schema
        )
        spark = corpus_tokens.sparkSession
        if (
            _driver_write_tiny_parquet(spark, tf.schema, [], f"{path}/tf", mode)
            and _driver_write_tiny_parquet(
                spark, df_schema, [], f"{path}/df", mode
            )
            and _driver_write_tiny_parquet(
                spark,
                stats_schema,
                [{"n_docs": 0, "sum_dl": 0}],
                f"{path}/stats",
                mode,
            )
        ):
            return

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        reparted = (
            tf.repartition(num_partitions, "term") if num_partitions
            else tf.repartition("term")
        )
        (
            reparted.sortWithinPartitions("term")
            .write.mode(mode)
            .parquet(f"{path}/tf")
        )
        # df/stats are PARTIALS over THIS epoch's documents only
        # (never a re-read of the accumulated tf dir, which in append
        # mode already holds earlier epochs); the loader sums
        # partials, which equals the single-shot aggregate because
        # epochs index disjoint documents (id discipline is the
        # caller's, as with ANN appends). Deriving stats from tf is
        # exact: tf and _stats_partial exclude the same empty-token
        # docs, dl is a per-doc constant carried on every tf row, and
        # the counts/sums are integers.
        df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        stats = (
            tf.groupBy("doc_id")
            .agg(F.min("dl").alias("__dl"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("__dl"), F.lit(0)).alias("sum_dl"),
            )
        )
        # coalesce(1), not repartition(1): the aggregations above
        # already shuffle, so coalesce folds the post-shuffle read
        # into the single per-epoch partial file without a SECOND
        # exchange (r12; one less Exchange + stage per write). The
        # two partial writes are independent reads of the cached tf,
        # so they run CONCURRENTLY (guide §2.6 — the second job's
        # tasks back-fill the first's tail; actions are only
        # sequential when driver code calls them sequentially).
        from concurrent.futures import ThreadPoolExecutor

        def _w(pair):
            rel, sub = pair
            rel.coalesce(1).write.mode(mode).parquet(f"{path}/{sub}")

        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(_w, [(df, "df"), (stats, "stats")]))
    finally:
        tf.unpersist()


def append_lexical_index(
    corpus_tokens: DataFrame,
    path: str,
    id_col: str | None = None,
    tok_col: str = "toks",
    num_partitions: int | None = None,
) -> dict:
    """Grow the lexical index with newly-arrived documents. The new
    docs' tf rows append to the posting relation and their df/stats
    PARTIALS append alongside; nothing already on disk is rewritten
    (df for an existing term is reconciled at load by summing
    partials). Re-appending an already-indexed doc_id double-counts
    it — same id discipline as the ANN index appends; single-writer
    by contract."""
    from workhop2_etl_spark.operators.index_store import _read_meta
    from workhop2_etl_spark.operators.index_store import _write_meta

    spark = corpus_tokens.sparkSession
    meta = _read_meta(spark, path, _LEXICAL_KIND)
    _write_lexical_epoch(
        corpus_tokens, path, id_col or meta["id_col"], tok_col, "append",
        num_partitions=num_partitions,
    )
    meta = dict(meta, epoch=int(meta.get("epoch") or 0) + 1)
    _write_meta(spark, path, meta, "overwrite")
    return meta


def load_lexical_index(
    spark, path: str, tokenizer: str | None = None, as_of: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """(tf, df, stats, metadata) from ``path``. ``df`` and ``stats``
    come back as LAZY re-aggregations over the persisted partials
    (sum over epochs — appends write positive partials, deletes write
    NEGATIVE ones, so the sums are exactly the single-shot aggregates
    over the surviving documents regardless of lifecycle history;
    terms whose net df reaches 0 are dropped, as a rebuild would).
    ``tf`` anti-joins any pending delete tombstones. Any LEDGERED
    batch — a delete's tombstones + negative partials, a stream
    epoch's tf rows + positive partials — appears TOGETHER or not at
    all: all three reads hide files whose ledger marker is absent, so
    the marker is each batch's atomic commit point even under a
    reader racing the writer's renames or after a mid-rename crash
    (index_store._ledger_gated_parquet, r12). ``as_of`` reconstructs
    the SNAPSHOT after that commit sequence: ledgered batches (stream
    epochs, deletes) committed later are hidden across all three
    relations at once, so the snapshot's scores are the bit-exact
    single-shot BM25 over exactly the documents visible then; history
    reaches back to the last compaction. Raises on kind/tokenizer
    drift."""
    from workhop2_etl_spark.operators.index_store import (
        _check_drift,
        _gated_or_raise,
        _read_meta,
        _read_tombstones,
    )

    meta = _read_meta(spark, path, _LEXICAL_KIND)
    _check_drift(path, meta, {"tokenizer": tokenizer})
    tf = _gated_or_raise(spark, path, "tf", as_of=as_of)
    tomb = _read_tombstones(spark, path, as_of=as_of)
    if tomb is not None:  # pending deletes: logical until compaction
        tf = tf.join(F.broadcast(tomb), "doc_id", "left_anti")
    df = (
        _gated_or_raise(spark, path, "df", as_of=as_of)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
    )
    stats = _stats_from_counts(
        _gated_or_raise(spark, path, "stats", as_of=as_of).agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
        )
    )
    return tf, df, stats, meta


def lexical_index_stats(
    tf: DataFrame, df: DataFrame, stats: DataFrame
) -> DataFrame:
    """One-row health report over a loaded lexical index — the
    observability face (the ivf/lsh_index_stats twin). ``max_df`` /
    ``stopword_share`` rising across epochs flags a vocabulary
    skewing toward stopwords (probe candidate volume is Σ df over the
    query vocabulary, so head-heavy df distributions price probes);
    ``postings_per_doc`` drifting signals tokenization changes in the
    ingest. Aggregates are dimension-sized; one shuffle each.

    Columns: n_docs, avgdl (2dp), vocab_size, n_postings, max_df,
    stopword_share (share of postings owned by the 10 most frequent
    terms, 4dp), postings_per_doc (2dp)."""
    top10 = (
        df.orderBy(F.desc("df"), F.asc("term"))
        .limit(10)
        .agg(F.coalesce(F.sum("df"), F.lit(0)).alias("__top"))
    )
    dfa = df.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("n_postings"),
        F.coalesce(F.max("df"), F.lit(0)).cast("long").alias("max_df"),
    )
    base = stats.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("avgdl", 2).alias("avgdl"),
    )
    return (
        base.crossJoin(F.broadcast(dfa))
        .crossJoin(F.broadcast(top10))
        .select(
            "n_docs",
            "avgdl",
            "vocab_size",
            "n_postings",
            "max_df",
            # explicit double casts: ANSI resolves long/long '/' as a
            # decimal division that raises on zero divisors even when
            # the zero branch is unreachable at runtime
            F.round(
                F.when(
                    F.col("n_postings") > 0,
                    F.col("__top").cast("double") / F.col("n_postings"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("stopword_share"),
            F.round(
                F.when(
                    F.col("n_docs") > 0,
                    F.col("n_postings").cast("double") / F.col("n_docs"),
                ).otherwise(F.lit(0.0)),
                2,
            ).alias("postings_per_doc"),
        )
    )


def _lexical_compact_specs(tombstones: DataFrame | None = None):
    """Per-dir compaction specs for ``index_store.compact_index``:
    (subdir, cluster keys, optional transform, fold-to-one flag). tf
    re-clusters by term (so IN-list min/max pruning skips whole files
    again) and, when deletes are pending, PURGES tombstoned docs; df
    and stats FOLD their per-epoch signed partials into one net
    record (append partials positive, delete partials negative — the
    loader aggregates either way, so the fold is load-equivalent
    while collapsing thousands of epoch files; terms fully deleted
    net to df ≤ 0 and are dropped, as a rebuild would)."""
    def purge_tf(d: DataFrame) -> DataFrame:
        return d.join(F.broadcast(tombstones), "doc_id", "left_anti")

    def fold_df(d: DataFrame) -> DataFrame:
        return (
            d.groupBy("term")
            .agg(F.sum("df").alias("df"))
            .filter(F.col("df") > 0)
        )

    def fold_stats(d: DataFrame) -> DataFrame:
        return d.agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
        )

    return [
        ("tf", ["term"], purge_tf if tombstones is not None else None, False),
        ("df", ["term"], fold_df, True),
        ("stats", [], fold_stats, True),
    ]


def probe_lexical_index(
    tf: DataFrame,
    df: DataFrame,
    stats: DataFrame,
    meta: dict,
    query_terms: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_digits: int = 6,
    exclude_self: bool = True,
    max_terms: int = 4096,
    max_df: int | None = None,
) -> DataFrame:
    """BM25 top-k from a LOADED lexical index — row-identical to
    ``bm25_topk`` over the original corpus (the scoring core is
    shared verbatim and the artifact round-trips exact integers).

    The query vocabulary collects to the driver (bounded loudly at
    ``max_terms`` — query terms are dimension-sized by contract) and
    becomes an IN-list filter on the posting scan: the tf relation is
    term-clustered on disk, so parquet min/max stats skip every file
    holding no query term — the probe reads a vocabulary-sized slice
    of a corpus-sized artifact.

    ``max_df`` (r11, OFF by default — the default path stays
    oracle-exact and unpruned) bounds the probe's candidate volume
    for head-term-heavy queries, the 100 TB serving posture: an
    unpruned probe pays Σ df candidate rows, which for a stopword-ish
    term is corpus-sized. With ``max_df`` set, terms are split into
    RARE (df ≤ max_df) and HEAD (df > max_df); candidate documents
    are those matching ≥ 1 rare query term, and only candidates are
    scored — over ALL the query's terms, so candidate scores are
    exact BM25. The candidate volume is bounded by Σ_rare df ≤
    |vocab|·max_df regardless of corpus size (the WAND / impact-
    ordered pruning family: Broder et al. CIKM'03, Anh & Moffat).

    Pruned-path guarantee (WAND-style, reported per query in the
    extra boolean ``exact`` column): every non-candidate document
    matches only head terms, and one term's contribution is < idf(t)
    · (k1+1) (the tf saturation bound), so a non-candidate's score is
    < HB(q) = Σ_{t ∈ head(q)} idf(t)·(k1+1). ``exact = true`` —
    the returned rows ARE the unpruned top-k — whenever the query has
    no head terms, or k candidates exist and the k-th candidate score
    clears HB(q) (checked with a half-ulp rounding margin PLUS an FP
    slack sized by the head-term count, and HB itself folds in
    term-sorted deterministic order — the flag never over-claims and
    never flips between runs; r12 advice fix). The tf-saturation
    bound is strict only for k1 > 0, so the pruned path rejects
    k1 <= 0 (use the exhaustive default for k1 = 0). ``exact =
    false`` means head-only
    documents could outrank the tail of the returned list — rerun
    unpruned or raise max_df for those queries. A query whose EVERY
    term is head-frequency has no candidates and returns no rows
    (the same contract as a query matching nothing); raise max_df
    for such stopword-only probes."""
    # r12 optimization: materialize the whole (query_id, term)
    # relation at the driver in ONE action. The lazy form executed
    # the caller's query-side plan three times — once for this vocab
    # collect and once per broadcast build inside the scoring core
    # (query_terms and qvocab are separate broadcast exchanges) — and
    # each execution re-ran the caller's corpus-scan/tokenize/explode
    # lineage. The pair relation is the same bounded class as the
    # vocabulary itself (|Q|·terms); if it somehow exceeds the
    # generous 64·max_terms ceiling, fall back to the previous
    # vocab-only collect instead of failing — behavior for
    # pathological inputs is unchanged, only the fast path is new.
    pair_cap = max_terms * 64
    pair_rows = (
        query_terms.select("query_id", "term")
        .distinct()
        .limit(pair_cap + 1)
        .collect()
    )
    if len(pair_rows) <= pair_cap:
        # NULL terms never match a join/IN-list (the lazy path dropped
        # them silently); drop them before sorting — a None alongside
        # strings would raise from sorted() (r12 advice fix)
        vocab = sorted({r.term for r in pair_rows if r.term is not None})
        if len(vocab) > max_terms:
            raise ValueError(
                f"probe_lexical_index collected more than max_terms="
                f"{max_terms} distinct query terms; the query side must "
                "be the bounded relation — raise max_terms explicitly "
                "if this is intentional"
            )
        query_terms = tf.sparkSession.createDataFrame(
            pair_rows, schema=query_terms.select("query_id", "term").schema
        )
    else:
        vocab_rows = (
            query_terms.select("term").distinct().limit(max_terms + 1).collect()
        )
        if len(vocab_rows) > max_terms:
            raise ValueError(
                f"probe_lexical_index collected more than max_terms="
                f"{max_terms} distinct query terms; the query side must "
                "be the bounded relation — raise max_terms explicitly "
                "if this is intentional"
            )
        vocab = [r.term for r in vocab_rows]
    tf_v = tf.filter(F.col("term").isin(vocab))
    df_v = df.filter(F.col("term").isin(vocab))
    if max_df is None:
        # the unpruned path references df/stats ONCE each — their lazy
        # broadcast builds overlap the final action's other stages
        # under AQE, so eager driver collects here would serialize two
        # extra actions for nothing (measured +~1s per probe at sf0.1
        # when r13 tried it; reverted to lazy for this path).
        # agg_shape='fold': probe contributions come off a few scan
        # partitions and are vocab-bounded — the fold's per-group tiny
        # sorts beat the window shape's global term sort here
        # (interleaved A/B recorded in _bm25_score's docstring).
        return _bm25_rank(
            tf_v, df_v, stats, query_terms,
            k=k, k1=k1, b=b, round_digits=round_digits,
            exclude_self=exclude_self, agg_shape="fold",
        )
    # r13 optimization (max_df-PRUNED path only): materialize the
    # vocabulary-sized df slice and the one-row stats at the driver.
    # Both are lazy RE-AGGREGATIONS over the artifact's per-epoch
    # partial files (load_lexical_index) and the pruned plan
    # references them repeatedly — df three times (rare/head split +
    # the scoring core's df join), stats twice (scoring + the HB
    # certificate) — so every broadcast build re-ran the partial scan
    # + sum. The df slice is ≤ max_terms rows by the vocabulary bound
    # just enforced and stats is ONE row: the same bounded-collect
    # class as the vocabulary IN-list itself, at any corpus size.
    spark = tf.sparkSession
    df_v = spark.createDataFrame(
        df_v.select("term", "df").collect(),
        schema=df_v.select("term", "df").schema,
    )
    stats = spark.createDataFrame(
        stats.select("n_docs", "avgdl").collect(),
        schema=stats.select("n_docs", "avgdl").schema,
    )
    return _bm25_rank_pruned(
        tf_v, df_v, stats, query_terms,
        k=k, k1=k1, b=b, round_digits=round_digits,
        exclude_self=exclude_self, max_df=int(max_df),
    )


def _bm25_rank_pruned(
    tf: DataFrame,
    df_all: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    k: int,
    k1: float,
    b: float,
    round_digits: int,
    exclude_self: bool,
    max_df: int,
) -> DataFrame:
    """The ``max_df`` candidate-pruned ranking (see
    ``probe_lexical_index``). Deterministic semantics, independent of
    whether the exactness condition holds: candidates = documents
    matching ≥ 1 rare (df ≤ max_df) query term, scored exactly over
    all query terms, ranked per query with the usual (rounded score
    desc, doc_id) order; the ``exact`` column reports the per-query
    WAND-style guarantee. Plan shape: the rare-term posting slice is
    vocabulary-pruned like the probe itself; the candidate doc-id set
    (≤ Σ_rare df ≤ |vocab|·max_df rows by construction) broadcasts
    into a semi-join on the scored slice, so the corpus-sized side
    still never shuffles."""
    query_terms = query_terms.select("query_id", "term").distinct()
    rare_q = query_terms.join(
        F.broadcast(df_all.filter(F.col("df") <= max_df).select("term")),
        "term",
    )
    head_q = query_terms.join(
        F.broadcast(df_all.filter(F.col("df") > max_df)), "term"
    )
    # candidate (query_id, doc_id): matches ≥1 rare term of the query
    cand = (
        tf.join(F.broadcast(rare_q), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    # exact scoring restricted to candidate docs: the tf slice keeps
    # every vocabulary term for those docs, so scores are full BM25.
    # The per-(query, doc) candidate semi-join lands INSIDE the
    # scoring core, before the contribution aggregation — a doc that
    # matches only head terms of query q (candidate via another
    # query) never reaches q's fold, and the collect_list volume is
    # candidate-sized even for stopword-heavy posting slices.
    cand_docs = cand.select("doc_id").distinct()
    scored = _bm25_score(
        tf.join(F.broadcast(cand_docs), "doc_id"),
        df_all,
        stats,
        query_terms,
        k1=k1,
        b=b,
        round_digits=round_digits,
        exclude_self=exclude_self,
        candidates=cand,
        # probe-slice input: the fold shape wins here (see _bm25_score)
        agg_shape="fold",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    # per-query head-term score upper bound HB(q) = Σ idf·(k1+1).
    # The per-term bound idf·(k1+1) is STRICT only for k1 > 0: at
    # k1 = 0 the tf saturation collapses to exactly 1 and a
    # head-only doc can REACH the bound, so the kth-vs-HB test no
    # longer certifies that no such doc displaces the k-th result
    # (ties break on doc_id, which the bound knows nothing about).
    # The pruned path therefore rejects k1 <= 0 up front; callers who
    # want k1 = 0 get the exhaustive path (max_df=None), which is
    # always exact.
    k1 = float(k1)
    if k1 <= 0.0:
        raise ValueError(
            f"max_df-pruned BM25 needs k1 > 0 (got {k1!r}): at k1=0 "
            "the exactness certificate's per-term bound idf*(k1+1) "
            "is attainable, not strict — use max_df=None for k1=0"
        )
    k1p1 = k1 + 1.0
    idf_ub = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    ) * F.lit(k1p1)
    # HB folds in deterministic (term-sorted) order — same _seq_sum
    # discipline as the scores themselves — so the certificate can't
    # flip between runs on hash-aggregate addition order; __n_head
    # sizes the FP slack below.
    hb = (
        head_q.crossJoin(F.broadcast(stats))
        .select("query_id", F.struct(F.col("term").alias("key"), idf_ub.alias("v")).alias("__c"))
        .groupBy("query_id")
        .agg(
            _seq_sum(F.collect_list("__c")).alias("__hb"),
            F.count("*").alias("__n_head"),
        )
    )
    per_q = ranked.groupBy("query_id").agg(
        F.max("rank").alias("__n_ret"), F.min("score").alias("__kth")
    )
    # margin = rounding half-ulp (score is rounded to round_digits,
    # so the raw k-th sits within 0.5·10^-d of it) + accumulation
    # slack for HB's own fold: n_head double additions each carry
    # relative error ≤ 2^-53, bounded here by n_head·|HB|·2^-50
    # (a ×8 safety factor). Exactness is claimed only when the
    # rounded k-th clears HB by the WHOLE margin — an over-wide
    # margin can only under-claim (exact=false on a truly exact
    # query), never over-claim.
    margin = 0.5 * (10.0 ** -round_digits)
    fp_slack = (
        F.col("__n_head").cast("double")
        * F.abs(F.col("__hb"))
        * F.lit(2.0 ** -50)
    )
    # explicit broadcast: hb derives from the driver-materialized
    # query relation (LogicalRDD — no size stats), so the planner
    # can't prove it small; it is |Q| rows by construction (r12)
    flags = per_q.join(F.broadcast(hb), "query_id", "left").select(
        "query_id",
        (
            F.col("__hb").isNull()  # no head terms → candidates cover all
            | (
                (F.col("__n_ret") >= k)
                & (
                    F.col("__kth") - F.lit(margin)
                    >= F.col("__hb") + fp_slack
                )
            )
        ).alias("exact"),
    )
    return (
        ranked.join(F.broadcast(flags), "query_id")
        .select("query_id", "rank", "doc_id", "score", "n_hit", "exact")
    )


def bm25_prf_expand(
    corpus_tokens: DataFrame,
    query_terms: DataFrame,
    n_feedback: int = 3,
    m_expand: int = 2,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_digits: int = 6,
    id_col: str = "doc_id",
    tok_col: str = "toks",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-style; the
    classic two-pass IR loop, e.g. Robertson/Sparck-Jones relevance
    weighting): run BM25, treat each query's top ``n_feedback``
    documents as relevant, harvest their ``m_expand`` strongest terms
    (by summed tf across the feedback docs — integer weights, term
    tiebreak, so the choice is cross-engine deterministic), and
    return the EXPANDED (query_id, term) relation — the original
    terms plus the expansion terms — ready for a second ``bm25_topk``
    pass. Terms already in the query are never re-added.

    Scale shape: pass 1 is bm25_topk's plan (one corpus tf shuffle);
    the harvest joins the |Q|·n_feedback doc list (broadcast) against
    the tf relation — map-side — and every later relation is
    query-bounded. A second scoring pass re-uses the same tf
    aggregation; at 100 TB run both passes against the persisted
    lexical index instead (load once, probe twice).

    Execution (r12 optimization): the expanded relation materializes
    HERE, at the driver — it is query-bounded by contract (|Q|·(terms
    + m_expand) rows, guarded loudly at 2^20), the same bounded-
    collect class as ``probe_lexical_index_prf``'s expansion. Lazy
    nesting cost pass 1 twice (the returned relation sat in pass 2's
    lineage and was broadcast-built once per reference), and the tf
    relation — identical in pass 1, the harvest, and the caller's
    pass 2 — was re-tokenized and re-aggregated each time; now tf is
    persisted across pass 1 + harvest (spilling, never recomputing)
    and unpersisted before return, and df/stats derive from it (the
    ``_write_lexical_epoch`` per-doc-exact trick — same integers, so
    scores are unchanged bit-for-bit). Measured: the t15 plan's 31
    shuffles → 13, 27 AQE stage-jobs → ~14 on the pass-2 action."""
    if n_feedback < 1 or m_expand < 1:
        raise ValueError(
            f"bm25_prf_expand needs n_feedback >= 1 and m_expand >= 1, "
            f"got {n_feedback}/{m_expand} — with nothing to harvest or "
            "add, call bm25_topk directly"
        )
    from pyspark import StorageLevel

    tf = _tf_relation(corpus_tokens, id_col, tok_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        query_terms = query_terms.select("query_id", "term").distinct()
        df_all = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        stats = _stats_from_counts(
            tf.groupBy("doc_id")
            .agg(F.min("dl").alias("__dl"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("__dl"), F.lit(0)).alias("sum_dl"),
            )
        )
        fb = _bm25_rank(
            tf, df_all, stats, query_terms,
            k=n_feedback, k1=k1, b=b, round_digits=round_digits,
            exclude_self=True,
        ).select("query_id", "doc_id")
        expanded = query_terms.unionByName(
            _prf_harvest(tf, fb, query_terms, m_expand)
        )
        cap = 1 << 20
        rows = expanded.limit(cap + 1).collect()
        if len(rows) > cap:
            # out-of-contract input: fall back to the LAZY expanded
            # relation — the pre-r12 behavior (slow: pass 1 + the
            # harvest sit in the caller's pass-2 lineage), never an
            # error where the old code worked (r12 advice fix). The
            # unpersist in the finally below still runs; the lazy plan
            # recomputes tf, which is exactly the old cost model.
            return expanded
        return corpus_tokens.sparkSession.createDataFrame(
            rows, schema=expanded.schema
        )
    finally:
        tf.unpersist()


def _prf_harvest(
    tf: DataFrame, fb: DataFrame, query_terms: DataFrame, m_expand: int
) -> DataFrame:
    """The PRF term harvest shared by ``bm25_prf_expand`` (in-session
    corpus) and ``probe_lexical_index_prf`` (persisted artifact):
    each query's ``m_expand`` strongest unseen terms across its
    feedback docs, weighted by summed tf (exact integers, term
    tiebreak — cross-engine deterministic). ``fb`` broadcasts
    (|Q|·n_feedback rows); the tf-side join is map-side."""
    harvested = (
        tf.join(F.broadcast(fb), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").alias("__w"))
        # broadcast hint: query_terms may be driver-materialized
        # (LogicalRDD, no size stats) and is query-bounded (r12)
        .join(F.broadcast(query_terms), ["query_id", "term"], "left_anti")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__w"), F.asc("term"))
    return (
        harvested.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= m_expand)
        .select("query_id", "term")
    )


def probe_lexical_index_prf(
    tf: DataFrame,
    df: DataFrame,
    stats: DataFrame,
    meta: dict,
    query_terms: DataFrame,
    k: int = 10,
    n_feedback: int = 3,
    m_expand: int = 2,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_digits: int = 6,
    exclude_self: bool = True,
    max_terms: int = 4096,
    max_df: int | None = None,
) -> DataFrame:
    """PRF retrieval against a LOADED lexical index — the persisted
    twin of ``bm25_prf_expand`` + second ``bm25_topk`` pass, and the
    100 TB answer to the two-pass cost: the corpus-sized tf
    aggregation is paid ONCE at build time; pass 1 and pass 2 are
    both ``probe_lexical_index`` probes of the artifact, each reading
    only the vocabulary-pruned (IN-list pushed-down, term-clustered)
    posting slice for its query terms, and the harvest between them
    joins the broadcast |Q|·n_feedback feedback-doc list against the
    SAME artifact tf relation (map-side — the feedback docs' postings
    only). No relation in the whole loop is corpus-shuffled.

    Row-identical to the in-session two-pass loop over the original
    corpus (the probe core is shared verbatim; the harvest weights
    are exact integers). ``max_df`` applies to both probe passes (the
    bounded serving posture; the result then carries the pruned
    path's per-query ``exact`` certificate from pass 2)."""
    query_terms = query_terms.select("query_id", "term").distinct()
    fb = probe_lexical_index(
        tf, df, stats, meta, query_terms, k=n_feedback,
        k1=k1, b=b, round_digits=round_digits, exclude_self=exclude_self,
        max_terms=max_terms, max_df=max_df,
    ).select("query_id", "doc_id")
    # materialize the expanded query relation ONCE, at the driver —
    # it is query-bounded by contract (|Q|·(terms + m_expand) rows,
    # the same bounded-collect class as the probe's own vocabulary
    # IN-list, guarded by the same max_terms ceiling). Without this,
    # pass 1 + the harvest sit in pass 2's lineage and execute twice
    # (once for pass 2's vocabulary collect, again in its final
    # action); a local relation also makes that vocabulary collect
    # free and broadcasts without lineage.
    exp_rows = (
        query_terms.unionByName(_prf_harvest(tf, fb, query_terms, m_expand))
        .limit(max_terms * 16 + 1)
        .collect()
    )
    if len(exp_rows) > 16 * max_terms:
        raise ValueError(
            f"probe_lexical_index_prf's expanded (query_id, term) "
            f"relation exceeds 16*max_terms={16 * max_terms} rows; the "
            "query side must be the bounded relation — raise max_terms "
            "if intentional"
        )
    expanded = tf.sparkSession.createDataFrame(
        exp_rows, schema=query_terms.schema
    )
    return probe_lexical_index(
        tf, df, stats, meta, expanded, k=k,
        k1=k1, b=b, round_digits=round_digits, exclude_self=exclude_self,
        max_terms=max_terms, max_df=max_df,
    )


def bm25_contrib_sql(
    tf: str = "tf",
    df: str = "df",
    dl: str = "dl",
    n_docs: str = "n_docs",
    avgdl: str = "avgdl",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """The DuckDB twin of one BM25 term contribution — the SAME
    expression tree as ``bm25_topk`` (constants folded in Python,
    injected by repr, so both engines parse identical doubles;
    explicit DOUBLE casts keep DuckDB out of decimal arithmetic).
    The suite oracle imports this instead of restating the formula,
    so a scoring change moves both engines together."""
    k1 = float(k1)
    b = float(b)
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    idf = (
        f"ln(CAST(1.0 AS DOUBLE) + (CAST({n_docs} - {df} AS DOUBLE) + 0.5)"
        f" / (CAST({df} AS DOUBLE) + 0.5))"
    )
    tf_part = (
        f"({tf} * CAST({k1p1!r} AS DOUBLE)) / ({tf} + CAST({k1!r} AS DOUBLE)"
        f" * (CAST({one_minus_b!r} AS DOUBLE)"
        f" + CAST({b!r} AS DOUBLE) * {dl} / {avgdl}))"
    )
    return f"({idf} * {tf_part})"


def rrf_fuse(
    arm_a: DataFrame,
    arm_b: DataFrame,
    k: int = 10,
    k_rrf: int = RRF_K,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists
    (Cormack, Clarke & Buettcher, SIGIR 2009): rrf(d) = Σ_arms
    1/(k_rrf + rank_arm(d)), with absent-in-arm contributing 0.

    Both arms: (query_id, doc_id, rank). Returns (query_id, rank,
    doc_id, rrf_score, rank_a, rank_b); rank_a/rank_b are NULL where
    the document appeared in only one arm.

    Determinism: input ranks are integers, the two reciprocal terms
    add in fixed expression order, and the fused ranking breaks ties
    on doc_id — bit-reproducible on any engine. Scale: both arms are
    top-k-per-query relations (|Q|·k rows, query-bounded by
    contract), so the full-outer join and the final window are over
    tiny, query-keyed data regardless of corpus size.

    Malformed arms (r11 adversarial hardening): a duplicate
    (query_id, doc_id) within one arm — a caller fusing a relation
    that did not come from a row_number window — would fan out the
    full-outer join and surface the SAME document at several fused
    ranks. Each arm is therefore collapsed to its BEST (minimum) rank
    per (query_id, doc_id) first — the standard RRF treatment of
    duplicate candidates, and a no-op (identity aggregation) for
    well-formed window-ranked arms.

    Plan shape (r12): the cross-arm alignment is a UNION + one hash
    aggregate, not a full-outer join — full-outer can't broadcast, so
    the join form cost a SortMergeJoin (sorts on both |Q|·k arms);
    union-aggregate has the same semantics (min ignores the other
    arm's NULL padding), folds the per-arm duplicate collapse into
    the SAME aggregate, and leaves exactly one shuffle and zero
    joins. tests/test_plan_quality.py asserts no SMJ in any fusion
    query.
    """
    a = arm_a.select(
        "query_id", "doc_id",
        F.col("rank").cast("int").alias("rank_a"),
        F.lit(None).cast("int").alias("rank_b"),
    )
    bdf = arm_b.select(
        "query_id", "doc_id",
        F.lit(None).cast("int").alias("rank_a"),
        F.col("rank").cast("int").alias("rank_b"),
    )
    fused = (
        a.unionByName(bdf)
        .groupBy("query_id", "doc_id")
        .agg(F.min("rank_a").alias("rank_a"), F.min("rank_b").alias("rank_b"))
    )
    rscore = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_a")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_b")), F.lit(0.0)),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rrf_score", rscore)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_score", "rank_a", "rank_b")
    )


def weighted_fuse(
    arm_a: DataFrame,
    arm_b: DataFrame,
    k: int = 10,
    alpha: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Convex score fusion of two ranked candidate lists — the
    score-based alternative to ``rrf_fuse`` (CombSUM/CombMNZ family,
    Fox & Shaw 1994): each arm's scores min-max normalize to [0, 1]
    PER QUERY, absent-in-arm contributes 0, and the fused score is
    ``alpha·norm_a + (1-alpha)·norm_b``.

    Both arms: (query_id, doc_id, score) with scores ALREADY rounded
    by their producers (every engine top-k here rounds) — the
    normalization is then differences and one division over identical
    doubles on any engine, and the fused ranking breaks exact ties on
    doc_id, so results stay bit-reproducible. An arm whose scores tie
    for a query (max = min) normalizes to 1.0 for every present doc —
    presence still outranks absence. Duplicate (query_id, doc_id)
    within one arm collapses to its BEST (max) score first, the same
    malformed-arm hardening as rrf_fuse. Scale: all relations are
    |Q|·k, query-bounded by contract.

    Plan shape (r12): the per-query extrema relation (|Q| rows)
    broadcasts into its normalization join, and the cross-arm
    alignment is a UNION + one hash aggregate instead of a full-outer
    join (which can't broadcast and forced a SortMergeJoin) — same
    semantics (max ignores the other arm's NULL padding; each
    (query, doc) is unique per arm after normalization), no sorts
    (tests/test_plan_quality.py asserts no SMJ in fusion queries)."""
    alpha = float(alpha)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(
            f"weighted_fuse alpha must be in [0, 1] (a convex "
            f"combination), got {alpha!r}"
        )
    beta = 1.0 - alpha

    def _norm(arm: DataFrame, tag: str) -> DataFrame:
        # non-finite guard (the r10 NaN-ranks-first class): Spark
        # orders NaN above every number, so one NaN score would win
        # its arm's max, poison the normalization denominator, and
        # rank first in the fusion. The engine's own top-k arms never
        # emit non-finite scores (cosine/BM25 guard tiers), but this
        # is a public operator — drop such rows like the rankers do.
        s = (
            arm.select("query_id", "doc_id", F.col("score").cast("double"))
            .filter(
                F.col("score").isNotNull()
                & ~F.isnan("score")
                & (F.abs("score") != float("inf"))
            )
            .groupBy("query_id", "doc_id")
            .agg(F.max("score").alias("score"))
        )
        ext = s.groupBy("query_id").agg(
            F.min("score").alias("__mn"), F.max("score").alias("__mx")
        )
        return s.join(F.broadcast(ext), "query_id").select(
            "query_id",
            "doc_id",
            F.when(F.col("__mx") == F.col("__mn"), F.lit(1.0))
            .otherwise(
                (F.col("score") - F.col("__mn"))
                / (F.col("__mx") - F.col("__mn"))
            )
            .alias(f"norm_{tag}"),
        )
    a = _norm(arm_a, "a").select(
        "query_id", "doc_id", "norm_a",
        F.lit(None).cast("double").alias("norm_b"),
    )
    bdf = _norm(arm_b, "b").select(
        "query_id", "doc_id",
        F.lit(None).cast("double").alias("norm_a"), "norm_b",
    )
    fused = (
        a.unionByName(bdf)
        .groupBy("query_id", "doc_id")
        .agg(F.max("norm_a").alias("norm_a"), F.max("norm_b").alias("norm_b"))
    )
    score = F.round(
        F.lit(alpha) * F.coalesce(F.col("norm_a"), F.lit(0.0))
        + F.lit(beta) * F.coalesce(F.col("norm_b"), F.lit(0.0)),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("fused_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id", "fused_score",
            F.round("norm_a", round_digits).alias("norm_a"),
            F.round("norm_b", round_digits).alias("norm_b"),
        )
    )
