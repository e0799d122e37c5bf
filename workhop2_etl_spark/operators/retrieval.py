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
  contributions sorted by term, then a sequential ``F.aggregate``
  fold), so scores are bit-reproducible against a SQL oracle rather
  than merely close — the same discipline as the v-family cosine
  folds in operators/similarity.py.
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
    dependent. DuckDB twin: list_reduce(list(v ORDER BY key), +)."""
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

    Plan shape: ONE corpus shuffle (the tf aggregation on (doc_id,
    term), dl carried through it as min(dl) so no re-join on doc_id);
    df semi-joined to the query vocabulary then broadcast; stats
    reduced to one row and broadcast; the scoring join is
    tf ⋈bc query_terms — map-side only. Final top-k is a window on
    query_id (row_number + filter → TakeOrdered-shaped per group).
    """
    indexed = corpus_tokens.filter(F.size(tok_col) > 0)
    terms = indexed.select(
        F.col(id_col).alias("doc_id"),
        F.size(tok_col).alias("__dl"),
        F.explode(tok_col).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.min("__dl").alias("dl")
    )
    # corpus stats: exact-integer sums → identical avgdl double on
    # any engine (never avg(), whose internal order could differ)
    stats = indexed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tok_col)).alias("__sum_dl"),
    ).select(
        "n_docs",
        (F.col("__sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    qvocab = query_terms.select("term").distinct()
    df_q = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).join(
        F.broadcast(qvocab), "term"
    )
    scored = (
        tf.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(df_q), "term")
        .crossJoin(F.broadcast(stats))
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
    contrib = scored.select(
        "query_id",
        "doc_id",
        F.struct(F.col("term").alias("key"), (idf * tf_part).alias("v")).alias(
            "__c"
        ),
    )
    agg = contrib.groupBy("query_id", "doc_id").agg(
        F.round(_seq_sum(F.collect_list("__c")), round_digits).alias("score"),
        F.count(F.lit(1)).alias("n_hit"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "n_hit")
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
    """
    a = arm_a.select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("rank_a")
    )
    bdf = arm_b.select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("rank_b")
    )
    fused = a.join(bdf, ["query_id", "doc_id"], "full_outer")
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
