"""Text-analysis queries over `documents` — north-star extension ops.

Every query is oracle-checked: the heuristics are built from
engine-portable primitives (md5, regexp, array ops) precisely so
DuckDB can reproduce them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.operators import text as TX
from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.suite import query

# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------


@query(
    "t1_token_counts",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish,
           n_chars
    FROM documents ORDER BY doc_id
    """,
)
def t1_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(c).alias("n_tokens"),
        TX.bpeish_token_count(c).alias("n_bpeish"),
        "n_chars",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Quality profile (length/punct/stopword ratios + composite score)
# ---------------------------------------------------------------------------


@query(
    "t2_quality_profile",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, text, n_chars,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      FROM documents
    ), m AS (
      SELECT doc_id, n_chars,
             CASE WHEN length(text) > 0
                  THEN length(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g'))::DOUBLE
                       / length(text)
                  ELSE 0.0 END AS praw,
             CASE WHEN len(tk) > 0
                  THEN len(list_filter(tk, t -> list_contains(
                         ['the','a','of','and','to','in','is','for','on','with'], t)))::DOUBLE
                       / len(tk)
                  ELSE 0.0 END AS sraw
      FROM toks
    )
    SELECT doc_id,
           round(praw, 6) AS punct_ratio,
           round(sraw, 6) AS stopword_ratio,
           round(CAST((CASE WHEN n_chars BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.3 END) * 0.4
               + (CASE WHEN praw <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.3
               + (CASE WHEN sraw >= 0.05 THEN 1.0 ELSE 0.6 END) * 0.3 AS DOUBLE), 4) AS quality
    FROM m ORDER BY doc_id
    """,
)
def t2_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        F.round(TX.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio(c), 6).alias("stopword_ratio"),
        TX.quality_score(c).alias("quality"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Language ID (stopword-profile argmax) vs the table's labeled lang
# ---------------------------------------------------------------------------

def _duck_lang_score(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in TX.LANG_PROFILES[lang])
    return (
        f"CASE WHEN len(tk) > 0 THEN "
        f"round(len(list_filter(tk, t -> list_contains([{words}], t)))::DOUBLE / len(tk), 6) "
        f"ELSE 0.0 END AS score_{lang}"
    )


@query(
    "t3_lang_id",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
             {_duck_lang_score('en')}, {_duck_lang_score('es')},
             {_duck_lang_score('fr')}, {_duck_lang_score('de')},
             {_duck_lang_score('zh')}
      FROM toks
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(score_en, score_es, score_fr, score_de, score_zh) = 0 THEN 'und'
                ELSE list_sort([
                       {{'neg': -score_en, 'l': 'en'}},
                       {{'neg': -score_es, 'l': 'es'}},
                       {{'neg': -score_fr, 'l': 'fr'}},
                       {{'neg': -score_de, 'l': 'de'}},
                       {{'neg': -score_zh, 'l': 'zh'}}])[1].l
           END AS lang_pred
    FROM scores ORDER BY doc_id
    """,
)
def t3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", TX.lang_id(F.col("text")).alias("lang_pred")).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


@query(
    "t4_fingerprint",
    oracle=r"""
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint")).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Lateral/explode + array aggregation + portable sampling — the
# remaining corpus primitives: flatten (doc → token rows), nest
# (rows → per-group array), and deterministic subsetting.
# ---------------------------------------------------------------------------


@query(
    "x1_word_count",
    oracle=r"""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
)
def x1_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic: explode(split()) → count. At corpus scale the
    explode multiplies rows ~n_tokens×, but partial aggregation
    combines map-side before the one shuffle of (word, count)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@query(
    "x2_array_agg",
    oracle="""
    SELECT source, lang, count(*) AS n_docs,
           coalesce(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                      FILTER (doc_id % 100 = 0),
                    '') AS sample_ids
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
    """,
)
def x2_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nest rows into per-group arrays (collect_list + sort for a
    deterministic value). The FILTER keeps the arrays bounded — the
    pattern for 'carry a sample of members per group' at scale.

    The nested array is serialized to a comma-joined string for the
    result: the driver's canonicalizer hashes scalar cells (a raw
    list column is unhashable in its pandas sort), and a delimited
    string carries the identical information.
    """
    docs = load_table(spark, sf_dir, "documents")
    sample = F.sort_array(
        F.collect_list(F.when(F.col("doc_id") % 100 == 0, F.col("doc_id")))
    )
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(sample.cast("array<string>"), ",").alias("sample_ids"),
        )
        .orderBy("source", "lang")
    )


@query(
    "x3_hash_sample",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                     CAST(l_linenumber AS VARCHAR)), 1, 2) <= '0c'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def x3_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample (13/256 of the md5 keyspace) by
    hashing the row key — reproducible across engines and runs, unlike
    TABLESAMPLE/rand(). THE primitive for corpus eval splits: the
    predicate pushes to the scan's data filters and needs no shuffle,
    and the same row lands in the same split on every engine."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    return (
        li.filter(F.substring(F.md5(key), 1, 2) <= "0c")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
        .orderBy("l_returnflag")
    )


def _x13_hex8() -> str:
    # hex→int SQL shared with the dedup oracles, applied to the same
    # md5(doc_id) key the Spark side uses (F.conv(..., 16, 10))
    from workhop2_etl_spark.suite.dedup import _hex_int_sql

    return _hex_int_sql("md5(CAST(doc_id AS VARCHAR))", 8)


@query(
    "x13_weighted_sample",
    oracle=f"""
    WITH d AS (
      SELECT source, n_chars,
             {_x13_hex8()} / 4294967296.0 AS frac,
             least(1.0, n_chars / 1000.0) AS w
      FROM documents)
    SELECT source, count(*) AS n_total,
           CAST(sum(CASE WHEN frac < w THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(round(avg(n_chars) * 100) AS BIGINT) AS avg_chars_all_x100,
           CAST(round(sum(CASE WHEN frac < w THEN n_chars ELSE 0 END) * 100.0
                      / sum(CASE WHEN frac < w THEN 1 ELSE 0 END)) AS BIGINT)
             AS avg_chars_sampled_x100
    FROM d GROUP BY source ORDER BY source
    """,
)
def x13_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling — include a document
    with probability proportional to its quality weight (here:
    length-derived, capped at 1), decided by comparing the md5
    keyspace fraction of its KEY against the weight. The upsampling
    primitive for training mixtures: longer/higher-quality docs keep
    higher inclusion odds, yet the decision is a pure row-local
    function of (key, weight) — reproducible across engines, runs,
    and partitionings, no rand() anywhere, pushes to the scan. The
    report shows the induced length bias (sampled mean length >
    population mean) per source; mean lengths are emitted as ×100
    scaled BIGINTs (centichars) — integer report columns are
    bit-identical across engines where rounded doubles are not.
    """
    docs = load_table(spark, sf_dir, "documents")
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / float(1 << 32)
    )
    w = F.least(F.lit(1.0), F.col("n_chars") / 1000.0)
    picked = (frac < w).cast("int")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(picked).alias("n_sampled"),
            F.round(F.avg("n_chars") * 100).cast("long").alias("avg_chars_all_x100"),
            F.round(
                F.sum(F.when(frac < w, F.col("n_chars")).otherwise(0)).cast("double")
                * 100
                / F.sum(picked)
            ).cast("long").alias("avg_chars_sampled_x100"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t18: hashed-linear quality classification — model-based filtering
# (the fastText-style production gate) as pure JVM expressions:
# hashing-trick features (md5 % dim, tf/dl), a broadcast weight
# relation, and a DETERMINISTIC per-document fold (the BM25 _seq_sum
# discipline) into a sigmoid. Weights here are pseudo-trained
# (md5-uniform in [-1, 1) per feature id) so the ENTIRE inference —
# featurization, join, fold, sigmoid, threshold — replays in DuckDB
# bit-for-bit; swapping in trained weights changes one relation.
# Sample filter runs FIRST (per-doc scores are corpus-independent).
# ---------------------------------------------------------------------------

_T18_DIM = 4096
_T18_Q_MOD = 17
_T18_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _t18_oracle() -> str:
    from workhop2_etl_spark.suite.dedup import _hex_int_sql

    fid = _hex_int_sql("md5('feat:' || tok)", 8)
    wid = _hex_int_sql("md5('w:' || CAST(f AS VARCHAR))", 8)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split({_T18_NORM}, ' ') AS t
      FROM documents
      WHERE doc_id % {_T18_Q_MOD} = 0 AND {_T18_NORM} <> ''
    ),
    feat AS (
      SELECT doc_id, {fid} % {_T18_DIM} AS feature_id,
             CAST(count(*) AS DOUBLE) / CAST(min(dl) AS DOUBLE) AS x
      FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, feature_id
    ),
    w AS (
      SELECT f AS feature_id,
             ({wid} / 4294967296.0 - 0.5) * 2.0 AS w
      FROM range({_T18_DIM}) t(f)
    ),
    scored AS (
      SELECT doc_id,
             round(1.0 / (1.0 + exp(-(0.0 + list_reduce(
               list(x * w ORDER BY feature_id), (a, b) -> a + b)))), 6)
               AS score
      FROM feat JOIN w USING (feature_id)
      GROUP BY doc_id
    )
    SELECT doc_id, score, CAST(score >= 0.5 AS INT) AS label
    FROM scored ORDER BY doc_id
    """


@query("t18_hashed_linear_quality", oracle=_t18_oracle())
def t18_hashed_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.suite.pipeline2 import _toks

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _T18_Q_MOD == 0
    )
    corpus = docs.select("doc_id", _toks().alias("toks")).filter(
        F.size("toks") > 0
    )
    feats = TX.hashed_features(corpus, dim=_T18_DIM)
    wid = F.conv(
        F.substring(F.md5(F.concat(F.lit("w:"), F.col("id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    weights = spark.range(_T18_DIM).select(
        F.col("id").alias("feature_id"),
        (
            (wid.cast("double") / F.lit(4294967296.0) - F.lit(0.5))
            * F.lit(2.0)
        ).alias("w"),
    )
    return TX.linear_score(feats, weights).orderBy("doc_id")
