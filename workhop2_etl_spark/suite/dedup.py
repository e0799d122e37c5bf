"""Deduplication queries over `documents` — north-star extension ops.

The corpus under test is documents ∪ synthesized near-duplicates
(first token dropped) ∪ exact duplicates, built identically on both
engines, so every dedup path has real positives to find.

Everything — including MinHash signatures and LSH band keys — is
oracle-checked in DuckDB: the hash family is md5 and the min is
taken lexicographically over hex digests, which every engine
computes identically (operators/dedup_text.py design note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.operators import dedup_text as DD
from workhop2_etl_spark.session import load_table
from workhop2_etl_spark.suite import query

NUM_HASHES = 16
NUM_BANDS = 4
SHINGLE_N = 3

# ---------------------------------------------------------------------------
# Shared corpus construction (identical on both engines)
# ---------------------------------------------------------------------------


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"^\S+\s+", "").alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(near).unionByName(exact)


_CORPUS_SQL = r"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, regexp_replace(text, '^\S+\s+', '') AS text
  FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 97 = 0
)
"""

_SHINGLES_SQL = r"""
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt FROM corpus
),
toks AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN []::VARCHAR[] ELSE string_split(nt, ' ') END AS tk
  FROM norm
),
sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
                WHEN len(tk) >= 3 THEN
                  [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)]
                ELSE [array_to_string(tk, ' ')] END) AS sh
  FROM toks
)
"""

def _hex_int_sql(expr: str, nchars: int) -> str:
    """Portable hex→int for the first ``nchars`` chars of a hex string."""
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ]
    return "(" + " + ".join(terms) + ")"


_P = DD.MINHASH_P
_BASE_HASH_SQL = f"({_hex_int_sql('md5(s)', 8)} % {_P})"
_XS_SQL = f"hx AS (SELECT doc_id, [{_BASE_HASH_SQL} FOR s IN sh] AS xs FROM sh)"
_SIG_COMPONENTS = ",\n           ".join(
    "CAST(list_min([({a} * x + {b}) % {p} FOR x IN xs]) AS VARCHAR)".format(
        a=DD.minhash_coeffs(i)[0], b=DD.minhash_coeffs(i)[1], p=_P
    )
    for i in range(NUM_HASHES)
)
_SIG_SQL = f"{_XS_SQL},\n    sig AS (SELECT doc_id, [{_SIG_COMPONENTS}] AS sg FROM hx)"

#: band stride derived from the SAME constants the Spark side uses
#: (operators/dedup_text.py::lsh_bands slices NUM_HASHES//NUM_BANDS
#: components per band) — a hardcoded stride would desync the d2-d7
#: oracles the moment either constant changes.
_BAND_SIZE = NUM_HASHES // NUM_BANDS
_BAND_SELECTS = "\n  UNION ALL\n".join(
    f"""  SELECT doc_id, {b} AS band_id,
         CASE WHEN sg[{b * _BAND_SIZE + 1}] IS NOT NULL
              THEN md5(array_to_string(sg[{b * _BAND_SIZE + 1}:{b * _BAND_SIZE + _BAND_SIZE}], '|')) END AS band_key
  FROM sig"""
    for b in range(NUM_BANDS)
)
_BANDS_SQL = f"bands AS (\n{_BAND_SELECTS}\n)"


# ---------------------------------------------------------------------------
# d1: exact dedup — identical-content groups via fingerprint
# ---------------------------------------------------------------------------
@query(
    "d1_exact_dup_groups",
    oracle=rf"""
    WITH {_CORPUS_SQL.strip()},
    fp AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
      FROM corpus
    )
    SELECT fingerprint, count(*) AS n_docs,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM fp WHERE fingerprint IS NOT NULL
    GROUP BY fingerprint HAVING count(*) > 1
    ORDER BY fingerprint
    """,
)
def d1_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return (
        DD.exact_dup_groups(corpus)
        .select(
            "fingerprint",
            "n_docs",
            F.array_join(F.col("doc_ids"), ",").alias("doc_ids"),
        )
        .orderBy("fingerprint")
    )


# ---------------------------------------------------------------------------
# d2: MinHash LSH candidate pairs
# ---------------------------------------------------------------------------
@query(
    "d2_minhash_lsh_pairs",
    oracle=rf"""
    WITH {_CORPUS_SQL.strip()},
    {_SHINGLES_SQL.strip()},
    {_SIG_SQL},
    {_BANDS_SQL}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
    FROM bands a
    JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
    WHERE a.band_key IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def d2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return DD.minhash_candidates(
        corpus, num_hashes=NUM_HASHES, num_bands=NUM_BANDS, shingle_n=SHINGLE_N
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# d3: near-dup pairs = LSH candidates + exact Jaccard ≥ 0.5
# ---------------------------------------------------------------------------
@query(
    "d3_near_dup_pairs",
    oracle=rf"""
    WITH {_CORPUS_SQL.strip()},
    {_SHINGLES_SQL.strip()},
    {_SIG_SQL},
    {_BANDS_SQL},
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
      WHERE a.band_key IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared_bands,
           round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
                 THEN len(list_intersect(sa.sh, sb.sh))::DOUBLE
                      / len(list_distinct(list_concat(sa.sh, sb.sh)))
                 ELSE 0.0 END, 6) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.id_a
    JOIN sh sb ON sb.doc_id = cand.id_b
    WHERE CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
           THEN len(list_intersect(sa.sh, sb.sh))::DOUBLE
                / len(list_distinct(list_concat(sa.sh, sb.sh)))
           ELSE 0.0 END >= 0.5
    ORDER BY id_a, id_b
    """,
)
def d3_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return DD.near_dup_pairs(
        corpus,
        threshold=0.5,
        num_hashes=NUM_HASHES,
        num_bands=NUM_BANDS,
        shingle_n=SHINGLE_N,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# d4: SimHash duplicate groups
# ---------------------------------------------------------------------------
def _hex4_sql(expr: str) -> str:
    """16-bit int from the first 4 hex chars of md5(expr), spelled in
    portable SQL arithmetic."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


_SIMHASH_BITS = " + ".join(
    f"CASE WHEN 2 * len(list_filter(hs, h -> (h // {1 << b}) % 2 = 1)) - len(hs) > 0 "
    f"THEN {1 << b} ELSE 0 END"
    for b in range(16)
)


@query(
    "d4_simhash_groups",
    oracle=rf"""
    WITH {_CORPUS_SQL.strip()},
    {_SHINGLES_SQL.strip()},
    hv AS (
      SELECT doc_id, [{_hex4_sql('t')} FOR t IN list_distinct(tk)] AS hs
      FROM toks
    ),
    sim AS (SELECT doc_id, ({_SIMHASH_BITS}) AS simhash FROM hv)
    SELECT simhash, count(*) AS n_docs,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM sim GROUP BY simhash HAVING count(*) > 1
    ORDER BY simhash
    """,
)
def d4_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return (
        DD.simhash_dup_groups(corpus)
        .select("simhash", "n_docs", F.array_join(F.col("doc_ids"), ",").alias("doc_ids"))
        .orderBy("simhash")
    )


# ---------------------------------------------------------------------------
# d5: direct n-gram Jaccard similarity on a deterministic pair sample
# (validates the Jaccard kernel independently of LSH recall)
# ---------------------------------------------------------------------------
@query(
    "d5_ngram_jaccard_sample",
    oracle=rf"""
    WITH {_CORPUS_SQL.strip()},
    {_SHINGLES_SQL.strip()}
    SELECT sa.doc_id AS id_a, sb.doc_id AS id_b,
           round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
                 THEN len(list_intersect(sa.sh, sb.sh))::DOUBLE
                      / len(list_distinct(list_concat(sa.sh, sb.sh)))
                 ELSE 0.0 END, 6) AS jaccard
    FROM sh sa JOIN sh sb ON sb.doc_id = sa.doc_id + 1000000
    WHERE sa.doc_id % 50 = 0
    ORDER BY id_a
    """,
)
def d5_ngram_jaccard_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    sh = corpus.select(
        "doc_id", DD.word_shingles(F.col("text"), SHINGLE_N).alias("sh")
    )
    a = sh.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = sh.select((F.col("doc_id") - 1_000_000).alias("id_a"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, "id_a")
        .select("id_a", (F.col("id_a") + 1_000_000).alias("id_b"),
                F.round(DD.jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .orderBy("id_a")
    )


# ---------------------------------------------------------------------------
# d6: duplicate clusters — connected components over the LSH candidate
# graph (operators/graph.py). Pairs say A~B and B~C; clustering must
# put {A,B,C} in ONE group with a canonical id (the min doc_id). The
# oracle rebuilds the same closure with a recursive CTE — feasible in
# DuckDB because dup clusters are tiny; the Spark side is the
# formulation that scales.
# ---------------------------------------------------------------------------
@query(
    "d6_dup_clusters",
    oracle=rf"""
    WITH RECURSIVE {_CORPUS_SQL.strip()},
    {_SHINGLES_SQL.strip()},
    {_SIG_SQL},
    {_BANDS_SQL},
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
      WHERE a.band_key IS NOT NULL
      GROUP BY 1, 2
    ),
    und AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM und)
      UNION
      SELECT e.b, r.comp FROM reach r JOIN und e ON e.a = r.node
    )
    SELECT node AS doc_id, min(comp) AS component
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def d6_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.graph import connected_components

    corpus = _corpus(spark, sf_dir)
    pairs = DD.minhash_candidates(
        corpus, num_hashes=NUM_HASHES, num_bands=NUM_BANDS, shingle_n=SHINGLE_N
    )
    return (
        connected_components(pairs, src="id_a", dst="id_b")
        .select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# d7: canonical-doc selection — the end-use of clustering: drop every
# cluster member except the min-id survivor, report the corpus
# before/after. At scale this is the "dedup the training set" job:
# CC output is a tiny (node, component) table broadcast-anti-joined
# against the full corpus.
# ---------------------------------------------------------------------------
@query(
    "d7_canonical_docs",
    oracle=rf"""
    WITH RECURSIVE {_CORPUS_SQL.strip()},
    {_SHINGLES_SQL.strip()},
    {_SIG_SQL},
    {_BANDS_SQL},
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
      WHERE a.band_key IS NOT NULL
      GROUP BY 1, 2
    ),
    und AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM und)
      UNION
      SELECT e.b, r.comp FROM reach r JOIN und e ON e.a = r.node
    ),
    cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
    dropped AS (SELECT node FROM cc WHERE node <> component)
    SELECT (SELECT count(*) FROM corpus) AS n_before,
           (SELECT count(*) FROM corpus) - (SELECT count(*) FROM dropped) AS n_after,
           (SELECT count(DISTINCT component) FROM cc) AS n_clusters,
           (SELECT count(*) FROM dropped) AS n_dropped
    """,
)
def d7_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from workhop2_etl_spark.operators.graph import connected_components

    corpus = _corpus(spark, sf_dir)
    pairs = DD.minhash_candidates(
        corpus, num_hashes=NUM_HASHES, num_bands=NUM_BANDS, shingle_n=SHINGLE_N
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    dropped = cc.filter(F.col("node") != F.col("comp")).select(F.col("node").alias("doc_id"))
    survivors = corpus.join(F.broadcast(dropped), "doc_id", "left_anti")
    return (
        survivors.agg(F.count(F.lit(1)).alias("n_after"))
        .crossJoin(corpus.agg(F.count(F.lit(1)).alias("n_before")))
        .crossJoin(cc.agg(F.countDistinct("comp").alias("n_clusters")))
        .crossJoin(dropped.agg(F.count(F.lit(1)).alias("n_dropped")))
        .select("n_before", "n_after", "n_clusters", "n_dropped")
    )


# ---------------------------------------------------------------------------
# x18: LEAKAGE-SAFE train/val split — the subtle bug x4-style per-doc
# splits have on deduplicated-but-not-fully corpora: two near-dup
# docs straddling the split leak eval content into training. Fix:
# split by DUP CLUSTER, not by doc — every near-dup component (d6's
# connected components over LSH candidate pairs; singletons are their
# own group) takes the split decision from ONE md5 draw on its group
# key, so clusters co-travel by construction (spanning clusters = 0
# structurally, not probabilistically). Output: per-split doc/group
# counts and the dup-doc mass, proving the planted dup families land
# whole. At 100 TB: the CC output is a tiny (node, comp) relation
# broadcast back onto the corpus — the split adds one map stage to
# the dedup pipeline it rides.
# ---------------------------------------------------------------------------
@query(
    "x18_leakage_safe_split",
    oracle=rf"""
    WITH RECURSIVE {_CORPUS_SQL.strip()},
    {_SHINGLES_SQL.strip()},
    {_SIG_SQL},
    {_BANDS_SQL},
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
      WHERE a.band_key IS NOT NULL
      GROUP BY 1, 2
    ),
    und AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM und)
      UNION
      SELECT e.b, r.comp FROM reach r JOIN und e ON e.a = r.node
    ),
    comps AS (SELECT node AS doc_id, min(comp) AS component
              FROM reach GROUP BY node),
    grouped AS (
      SELECT c.doc_id, coalesce(p.component, c.doc_id) AS gk
      FROM corpus c LEFT JOIN comps p USING (doc_id)
    ),
    sized AS (
      SELECT doc_id, gk,
             count(*) OVER (PARTITION BY gk) AS gsz,
             CASE WHEN substring(md5('gsplit:' || CAST(gk AS VARCHAR)), 1, 2)
                       <= '19'
                  THEN 'val' ELSE 'train' END AS split
      FROM grouped
    )
    SELECT split, count(*) AS n_docs,
           count(DISTINCT gk) AS n_groups,
           CAST(sum(CASE WHEN gsz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clustered_docs
    FROM sized GROUP BY split ORDER BY split
    """,
)
def x18_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from workhop2_etl_spark.operators.graph import connected_components

    corpus = _corpus(spark, sf_dir)
    pairs = DD.minhash_candidates(
        corpus, num_hashes=NUM_HASHES, num_bands=NUM_BANDS, shingle_n=SHINGLE_N
    )
    comps = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    grouped = corpus.join(F.broadcast(comps), "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("gk")
    )
    sized = grouped.withColumn(
        "gsz", F.count(F.lit(1)).over(Window.partitionBy("gk"))
    ).withColumn(
        "split",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("gsplit:"), F.col("gk").cast("string"))), 1, 2
            )
            <= "19",
            "val",
        ).otherwise("train"),
    )
    return (
        sized.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("gk").alias("n_groups"),
            F.sum(F.when(F.col("gsz") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_clustered_docs"),
        )
        .orderBy("split")
    )
