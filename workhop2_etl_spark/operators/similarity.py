"""Similarity search over embedding columns (`array<float>`).

Two paths, per the standard ANN playbook:

* ``topk_cosine_bruteforce`` — exact: query set × corpus cross join
  (broadcast the queries — the small side), cosine in pure column
  expressions, per-query top-k via window. O(|Q|·n) work but fully
  distributed and shuffle-light: the only shuffle is the final
  per-query top-k, and the corpus is never moved.
* ``topk_cosine_lsh`` — approximate: random-hyperplane LSH (signed
  projections → bit signature → bucket equi-join), cosine only
  within matching buckets. Shuffle ∝ bucket collisions, not n·|Q| —
  the 100 TB path. Hyperplanes are derived deterministically from
  md5 of (plane index, dimension index), so signatures are
  reproducible across engines and runs without a random state.

All arithmetic is double precision with sequential array folds, so
results are bit-reproducible for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with each element widened to double *before* multiply
    (float32 multiply would round differently than an oracle engine
    widening first)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0 for zero-norm vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def topk_cosine_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Queries are broadcast (they are the bounded side); the corpus
    stays partitioned in place. Self-matches (same id) are excluded.
    Scores are rounded and ties broken by neighbor id so the result
    is a total order.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    )
    scored = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")).join(
        q, F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qvec"), F.col("__cvec")), round_digits).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "score", F.col("__rn").alias("rank"))
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes, deterministic seed)
# ---------------------------------------------------------------------------


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1): derived from the
    first 8 hex chars of md5(f'{plane}:{dim}'). Pure function of the
    indices — any engine can rebuild the identical hyperplanes."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8]
    return int(h, 16) / float(1 << 31) - 1.0


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Bit signature: bit p = sign(vec · plane_p). Computed as pure
    expressions over the array column; the planes are literal arrays
    (constant-folded by Catalyst, broadcast with the plan)."""
    sig = F.lit(0)
    for p in range(num_planes):
        plane = F.array(*[F.lit(_plane_weight(p, d)) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig.cast("int")


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (max cosine, centroid-id tiebreak), as a pure expression
    over literal centroid arrays.

    ``centroids`` are (centroid_id, vector) pairs the caller obtained
    from a bounded driver-side step (a sampled k-means, or — as in the
    suite — a deterministic data subset). The centroid table is tiny
    and rides into the plan as literals; assignment is a per-row
    argmax, no shuffle. Search then probes only the query's cell —
    the inverted-file structure that keeps ANN linear at corpus scale.
    """
    entries = []
    for cid, vec in centroids:
        cvec = F.array(*[F.lit(float(x)) for x in vec])
        score = cosine(F.col(vec_col), cvec)
        # min over (-score, cid): highest cosine, then smallest id.
        entries.append(F.struct((-score).alias("neg"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*entries))
    return df.select(
        F.col(id_col), F.col(vec_col), best["cid"].alias("centroid_id")
    )


def topk_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF ANN: exact cosine within the query's cell only (nprobe=1).

    Both sides quantize with the same centroids; the search is an
    equi-join on centroid_id — shuffle ∝ cell populations, never the
    n×|Q| cross product. Raising recall = probing more cells (union
    over the next-nearest centroids), same plan shape.
    """
    c = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.col("centroid_id"),
    )
    q = F.broadcast(
        ivf_assign(queries, centroids, id_col, vec_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.col("centroid_id"),
        )
    )
    scored = c.join(q, ["centroid_id"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qvec"), F.col("__cvec")), round_digits).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "score", F.col("__rn").alias("rank"))
    )


def topk_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: exact cosine *within* the query's LSH bucket.

    Equi-join on the signature replaces the cross join — at corpus
    scale each query touches ~n/2^planes candidates. Recall can be
    raised with multi-probe (flip one bit) or more tables; this is
    the single-table baseline. Queries broadcast as in brute force.
    """
    sig = hyperplane_signature(F.col(vec_col), dim, num_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"), sig.alias("__csig")
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"), sig.alias("__qsig")
        )
    )
    scored = c.join(
        q, (F.col("__csig") == F.col("__qsig")) & (F.col("query_id") != F.col("neighbor_id"))
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qvec"), F.col("__cvec")), round_digits).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "score", F.col("__rn").alias("rank"))
    )
