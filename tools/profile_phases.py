"""Phase-level wall-clock profile of the index-lifecycle queries.

Round-12 optimization instrumentation (guide §1: measure first).
Re-implements the heavy suite queries' bodies with a timer around
each lifecycle verb (save / append / ingest / delete / load / probe)
so the per-phase cost — not just the per-query total — is visible.
Also counts Spark jobs per phase via the status tracker.

Usage:  python tools/profile_phases.py [t12 st14 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from workhop2_etl_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Prof:
    def __init__(self, spark):
        self.spark = spark
        self.rows = []

    def phase(self, name):
        return _Span(self, name)

    def report(self, label):
        total = sum(r[1] for r in self.rows)
        print(f"\n== {label}: total {total:.2f}s ==")
        for name, sec, jobs in self.rows:
            print(f"  {sec:7.3f}s  {jobs:3d} jobs  {name}")
        self.rows = []


class _Span:
    def __init__(self, prof, name):
        self.prof = prof
        self.name = name

    def __enter__(self):
        st = self.prof.spark.sparkContext.statusTracker()
        self.jobs0 = len(st.getJobIdsForGroup(None) or [])
        self.t0 = time.time()
        self.prof.spark.sparkContext.setJobDescription(self.name)
        return self

    def __exit__(self, *a):
        dt = time.time() - self.t0
        st = self.prof.spark.sparkContext.statusTracker()
        jobs1 = len(st.getJobIdsForGroup(None) or [])
        self.prof.rows.append((self.name, dt, jobs1 - self.jobs0))
        self.prof.spark.sparkContext.setJobDescription(None)


def prof_t12(spark, p: Prof):
    import tempfile

    from workhop2_etl_spark.operators import retrieval as RET
    from workhop2_etl_spark.suite.pipeline2 import _toks
    from workhop2_etl_spark.suite.retrieval import _BM25_K, _LEX_Q_MOD, _query_terms

    docs = load_table(spark, SF_DIR, "documents")
    corpus_tokens = docs.select("doc_id", _toks().alias("toks"))
    path = os.path.join(tempfile.mkdtemp(prefix="prof_t12_"), "lexidx")
    with p.phase("save(evens)"):
        RET.save_lexical_index(
            corpus_tokens.filter(F.col("doc_id") % 2 == 0), path,
            mode="overwrite", num_partitions=8,
        )
    with p.phase("append(odds)"):
        RET.append_lexical_index(
            corpus_tokens.filter(F.col("doc_id") % 2 == 1), path,
            num_partitions=8,
        )
    with p.phase("load"):
        tf, df, stats, meta = RET.load_lexical_index(spark, path)
    with p.phase("probe+collect"):
        RET.probe_lexical_index(
            tf, df, stats, meta, _query_terms(docs, _LEX_Q_MOD), k=_BM25_K
        ).orderBy("query_id", "rank").collect()
    p.report("t12_bm25_persisted_index")


def prof_st14(spark, p: Prof):
    import tempfile

    from workhop2_etl_spark.operators import retrieval as RET
    from workhop2_etl_spark.streaming import index_stream as IS
    from workhop2_etl_spark.suite.pipeline2 import _toks
    from workhop2_etl_spark.suite.retrieval import _BM25_K, _ST14_Q_MOD, _query_terms

    docs = load_table(spark, SF_DIR, "documents")
    base = tempfile.mkdtemp(prefix="prof_st14_")
    src, path, ckpt = (os.path.join(base, d) for d in ("src", "idx", "ckpt"))
    with p.phase("src writes x3"):
        for i in range(3):
            docs.filter(F.col("doc_id") % 3 == i).repartition(1).write.mode(
                "append"
            ).parquet(src)
    tokenize = lambda df: df.select("doc_id", _toks().alias("toks"))  # noqa: E731
    with p.phase("seed save(limit 0)"):
        RET.save_lexical_index(
            tokenize(docs).limit(0), path, mode="overwrite", num_partitions=2
        )
    with p.phase("stream ingest x3"):
        IS.stream_index_ingest(
            spark, src, docs.schema, path, ckpt,
            vec_col="toks", partitions_per_epoch=2, prepare=tokenize,
        )
    with p.phase("load"):
        tf, df, stats, meta = RET.load_lexical_index(spark, path)
    with p.phase("probe+collect"):
        RET.probe_lexical_index(
            tf, df, stats, meta, _query_terms(docs, _ST14_Q_MOD), k=_BM25_K
        ).orderBy("query_id", "rank").collect()
    p.report("st14_streaming_lexical_ingest")


def prof_t15(spark, p: Prof):
    from workhop2_etl_spark.operators import retrieval as RET
    from workhop2_etl_spark.suite.pipeline2 import _toks
    from workhop2_etl_spark.suite.retrieval import (
        _BM25_K,
        _T15_M_EXP,
        _T15_N_FB,
        _T15_Q_MOD,
        _query_terms,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus_tokens = docs.select("doc_id", _toks().alias("toks"))
    qt = _query_terms(docs, _T15_Q_MOD)
    with p.phase("prf_expand (pass1+harvest)"):
        expanded = RET.bm25_prf_expand(
            corpus_tokens, qt, n_feedback=_T15_N_FB, m_expand=_T15_M_EXP
        )
    with p.phase("pass2+collect"):
        RET.bm25_topk(corpus_tokens, expanded, k=_BM25_K).orderBy(
            "query_id", "rank"
        ).collect()
    p.report("t15_bm25_prf")


def prof_st15(spark, p: Prof):
    import tempfile

    from workhop2_etl_spark.operators import index_store as IDX
    from workhop2_etl_spark.operators import retrieval as RET
    from workhop2_etl_spark.streaming import index_stream as IS
    from workhop2_etl_spark.suite.pipeline2 import _toks
    from workhop2_etl_spark.suite.retrieval import (
        _BM25_K,
        _ST15_DEL_MOD,
        _ST15_Q_MOD,
        _query_terms,
    )

    docs = load_table(spark, SF_DIR, "documents")
    base = tempfile.mkdtemp(prefix="prof_st15_")
    src, path, ckpt = (os.path.join(base, d) for d in ("src", "idx", "ckpt"))
    with p.phase("src write"):
        docs.repartition(3).write.mode("overwrite").parquet(src)
    tokenize = lambda df: df.select("doc_id", _toks().alias("toks"))  # noqa: E731
    with p.phase("seed save"):
        RET.save_lexical_index(
            tokenize(docs).limit(0), path, mode="overwrite", num_partitions=2
        )
    with p.phase("stream ingest x3"):
        IS.stream_index_ingest(
            spark, src, docs.schema, path, ckpt,
            vec_col="toks", partitions_per_epoch=2, prepare=tokenize,
        )
    with p.phase("delete"):
        IDX.delete_from_index(
            spark, path,
            docs.filter(F.col("doc_id") % _ST15_DEL_MOD == 0).select("doc_id"),
        )
    with p.phase("load"):
        tf, df, stats, meta = RET.load_lexical_index(spark, path)
    with p.phase("probe+collect"):
        qt = _query_terms(
            docs.filter(F.col("doc_id") % _ST15_DEL_MOD != 0), _ST15_Q_MOD
        )
        RET.probe_lexical_index(
            tf, df, stats, meta, qt, k=_BM25_K
        ).orderBy("query_id", "rank").collect()
    p.report("st15_streaming_ingest_delete")


def prof_v16(spark, p: Prof):
    import tempfile

    from workhop2_etl_spark.operators import index_store as IDX
    from workhop2_etl_spark.operators import retrieval as RET
    from workhop2_etl_spark.suite.pipeline2 import _toks
    from workhop2_etl_spark.suite.retrieval import (
        _ARM_K,
        _RRF_FINAL_K,
        _V16_Q_MOD,
        _query_terms,
    )
    from workhop2_etl_spark.suite.similarity import N_CENTROIDS, NPROBE

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    base = tempfile.mkdtemp(prefix="prof_v16_")
    lex_path = os.path.join(base, "lex")
    ivf_path = os.path.join(base, "ivf")
    corpus_tokens = docs.select("doc_id", _toks().alias("toks"))
    with p.phase("save lex"):
        RET.save_lexical_index(
            corpus_tokens, lex_path, mode="overwrite", num_partitions=8
        )
    with p.phase("centroid collect"):
        rows = (
            emb.filter(F.col("vec_id") % 37 == 0)
            .orderBy("vec_id")
            .limit(N_CENTROIDS)
            .select("embedding")
            .collect()
        )
        centroids = [(i, list(r.embedding)) for i, r in enumerate(rows)]
    with p.phase("save ivf"):
        IDX.save_ivf_index(emb, ivf_path, centroids, dim=64, mode="overwrite")
    with p.phase("load lex"):
        tf, df, stats, lmeta = RET.load_lexical_index(spark, lex_path)
    with p.phase("load ivf"):
        postings, cents, imeta = IDX.load_ivf_index(spark, ivf_path)
    with p.phase("probe+fuse+collect"):
        lex = RET.probe_lexical_index(
            tf, df, stats, lmeta, _query_terms(docs, _V16_Q_MOD), k=_ARM_K
        )
        vec = IDX.probe_ivf_index(
            postings, cents, imeta,
            emb.filter(F.col("vec_id") % _V16_Q_MOD == 0),
            k=_ARM_K, nprobe=NPROBE,
        )
        RET.rrf_fuse(
            lex.select("query_id", "doc_id", "rank"),
            vec.select("query_id", F.col("neighbor_id").alias("doc_id"), "rank"),
            k=_RRF_FINAL_K,
        ).collect()
    p.report("v16_hybrid_persisted_rrf")


PROFILES = {
    "t12": prof_t12,
    "st14": prof_st14,
    "t15": prof_t15,
    "st15": prof_st15,
    "v16": prof_v16,
}


def main():
    names = sys.argv[1:] or list(PROFILES)
    spark = get_spark("profile_phases")
    # warm-up
    load_table(spark, SF_DIR, "region").count()
    load_table(spark, SF_DIR, "documents").count()
    for n in names:
        PROFILES[n](spark, Prof(spark))


if __name__ == "__main__":
    main()
