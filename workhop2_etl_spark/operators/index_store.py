"""Persisted ANN index artifacts: build once, probe many sessions.

At 100 TB the expensive half of approximate similarity search is the
INDEX BUILD — signing every corpus vector (multi-table hyperplane
LSH) or training the coarse quantizer (IVF KMeans). Rebuilding per
session, as the in-session operators do, repays that cost on every
run; the production posture (FAISS on disk, Lucene HNSW segments) is
an on-disk artifact that any later session loads and probes. This
module gives both index families that lifecycle on any
Hadoop-compatible filesystem, via plain Spark parquet/JSON I/O — no
driver-side file APIs, so the same code addresses local disk, HDFS,
or object stores:

* ``save_lsh_index`` / ``append_lsh_index`` / ``load_lsh_index`` /
  ``probe_lsh_index`` — the multi-table hyperplane signature index
  (operators/similarity.py::with_multitable_signatures*). The saved
  relation is one row per (vector, table): id, vector, its L2 norm,
  table_id, sig — everything the probe needs, so probing never
  touches the original corpus table.
* ``save_centroids`` / ``load_centroids`` — the trained IVF coarse
  quantizer (operators/similarity.py::fit_centroids), k rows of
  (centroid_id, vector).
* ``compact_index`` — maintenance for either postings kind: rewrite
  the append-accumulated small files back into the clustered layout
  (the FAISS segment-merge / Delta OPTIMIZE role), row-identical
  probes before and after.
* ``save_ivf_index`` / ``append_ivf_index`` / ``load_ivf_index`` /
  ``probe_ivf_index`` — the full IVF index: posting lists (one row
  per vector: id, vector, norm, centroid_id, clustered by cell) plus
  the quantizer that assigned them, as one self-contained artifact —
  postings are only meaningful under their own centroids, so the two
  travel together and a probe can never mix them with a drifted
  quantizer. Three storage tiers (``store_dtype``): exact float64,
  int8 scalar quantization (FAISS SQ8), and pq8 product quantization
  (FAISS IVFPQ — codebooks persisted inside the artifact).
* ``ivf_index_stats`` / ``lsh_index_stats`` — one-row skew/health
  reports (the retrain signal); ``retrain_ivf_index`` — blue/green
  rebuild under a freshly-trained coarse quantizer. Streaming
  ingest lives in streaming/index_stream.py (exactly-once epochs).
* ``restore_index`` — materialize a ``load(as_of=N)`` snapshot as a
  fresh artifact at a new path (the rollback/clone verb);
  ``index_changes`` — the CDC changelog of ledgered mutations
  between two commit sequences, reading only the tailed batches'
  own files.

Every artifact carries a metadata record (kind, dim, planes, tables,
sig_kernel / seed, format version) written as a one-row JSON dataset
next to the data. ``load_*`` validates it against what the caller
expects and raises a descriptive error on drift — probing an index
built at dim=64 with dim=128 queries, or mixing centroids trained
under a different seed into an oracle-pinned pipeline, must fail
loudly at load time, not produce silently-wrong neighbors.

Reference parity: the reference ETL has no ANN indexes; this extends
the engine for the training-data pipeline per the build brief, shaped
after the public FAISS index_factory / write_index lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workhop2_etl_spark.operators.similarity import (
    _ivf_probe,
    _multitable_probe,
    _pq_codebook_relation,
    ivf_assign,
    ivf_assign_blas,
    l2_norm,
    pq_decode,
    pq_encode,
    pq_encode_blas,
    with_multitable_signatures,
    with_multitable_signatures_blas,
)

FORMAT_VERSION = 1

_LSH_KIND = "multitable-hyperplane-lsh"
_IVF_KIND = "ivf-centroids"
_IVF_POSTINGS_KIND = "ivf-postings"

_META_SCHEMA = (
    "kind string, version int, dim int, num_planes int, num_tables int,"
    " sig_kernel string, assign_kernel string, id_col string, seed long,"
    " n_centroids int, plane_scheme string, epoch int, store_dtype string,"
    " pq_m int, pq_k int, tokenizer string, tok_col string"
)


def _write_meta(spark: SparkSession, path: str, meta: dict, mode: str) -> None:
    """Persist the one-record metadata JSON DRIVER-SIDE through the
    Hadoop FileSystem API (the same surface the ledger markers use, so
    local disk / HDFS / object stores all work). Metadata is a single
    record by contract; the previous Spark-job write (createDataFrame
    → repartition(1) → .write.json) paid a full job submission + task
    + commit protocol (~0.5s measured locally) per call for one row —
    pure scheduling overhead at ANY scale (r12 optimization round).
    Layout is unchanged (``<path>/meta/part-00000.json``, one JSON
    line, null fields omitted) and stays readable by spark.read.json."""
    import json

    # metadata is exactly-one-record by contract: only 'overwrite' and
    # 'error'/'errorifexists' are meaningful. 'append' used to fall
    # through and silently CLOBBER part-00000.json (where the old
    # Spark writer appended a second file that _read_meta rejected
    # loudly) — reject out-of-contract modes instead (r12 advice fix)
    if mode not in ("overwrite", "error", "errorifexists"):
        raise ValueError(
            f"index metadata write mode must be 'overwrite' or "
            f"'error'/'errorifexists' (one record by contract), got "
            f"{mode!r}"
        )
    fields = [f.split()[0] for f in _META_SCHEMA.split(",")]
    # only schema fields persist — load-time conveniences like the
    # in-memory ``_codebooks`` must never leak into the JSON record;
    # nulls are omitted, matching the Spark JSON writer's default
    row = {k: meta[k] for k in fields if meta.get(k) is not None}
    fs, d = _hadoop_fs(spark, f"{path}/meta")
    if fs.exists(d):
        if mode == "overwrite":
            fs.delete(d, True)
        else:
            raise ValueError(
                f"index metadata already exists at {path}/meta "
                f"(write mode {mode!r})"
            )
    fs.mkdirs(d)
    _, part = _hadoop_fs(spark, f"{path}/meta/part-00000.json")
    out = fs.create(part, True)
    try:
        out.write(bytearray((json.dumps(row) + "\n").encode("utf-8")))
    finally:
        out.close()


def _read_meta(spark: SparkSession, path: str, expect_kind: str) -> dict:
    """Read the metadata record DRIVER-SIDE (see ``_write_meta`` —
    one record, so a Spark read job is overhead; ~0.3s saved per
    call). Reads every non-hidden ``*.json`` file under ``meta/`` so
    artifacts written by the previous Spark JSON writer (or by an
    external producer) stay loadable."""
    import json

    fields = [f.split()[0] for f in _META_SCHEMA.split(",")]
    try:
        fs, d = _hadoop_fs(spark, f"{path}/meta")
        if not fs.exists(d):
            raise ValueError("metadata directory does not exist")
        records = []
        jvm = spark._jvm
        for st in sorted(
            fs.listStatus(d), key=lambda s: s.getPath().getName()
        ):
            name = st.getPath().getName()
            if not st.isFile() or name.startswith((".", "_")):
                continue
            if not name.endswith(".json"):
                continue
            stream = fs.open(st.getPath())
            try:
                buf = jvm.java.io.ByteArrayOutputStream()
                jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                    stream, buf, 65536, False
                )
                text = bytes(buf.toByteArray()).decode("utf-8")
            finally:
                stream.close()
            for line in text.splitlines():
                if line.strip():
                    records.append(json.loads(line))
    except ValueError as ex:
        raise ValueError(
            f"no readable index metadata at {path}/meta: {ex}"
        ) from ex
    except Exception as ex:  # noqa: BLE001 — name the artifact in the error
        raise ValueError(f"no readable index metadata at {path}/meta: {ex}") from ex
    if len(records) != 1:
        raise ValueError(
            f"index metadata at {path}/meta must be exactly one record, "
            f"found {len(records)}"
        )
    # drop fields outside the schema (foreign keys in a hand-edited
    # record) and null fields the other artifact kind doesn't set, so
    # load_*'s meta equals what save_* returned
    meta = {k: records[0][k] for k in fields if records[0].get(k) is not None}
    if expect_kind != "*" and meta["kind"] != expect_kind:
        raise ValueError(
            f"artifact at {path} is kind={meta['kind']!r}, expected "
            f"{expect_kind!r} — wrong index type for this loader"
        )
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(
            f"artifact at {path} has format version {meta['version']}, "
            f"this build reads version {FORMAT_VERSION}"
        )
    return meta


def _check_drift(path: str, meta: dict, expected: dict) -> None:
    drift = {
        key: (want, meta.get(key))
        for key, want in expected.items()
        if want is not None and meta.get(key) != want
    }
    if drift:
        detail = ", ".join(
            f"{k}: expected {want!r}, index has {got!r}"
            for k, (want, got) in sorted(drift.items())
        )
        raise ValueError(f"index at {path} does not match this probe — {detail}")


# ---------------------------------------------------------------------------
# Multi-table LSH signature index
# ---------------------------------------------------------------------------


def _reset_lifecycle_state(spark: SparkSession, path: str, mode: str) -> None:
    """On an ``overwrite`` save, clear the artifact's LIFECYCLE state
    (``ledger/`` markers and pending ``tombstones/``) along with the
    data the Spark writers overwrite. Without this a rebuild over an
    existing artifact path inherited the old tombstones — the new
    corpus's rows anti-joined against stale victim ids — and old
    ledger markers silently 'skipped' the first stream epochs /
    delete batches of the new life (r12 fix, found by a test-harness
    double-run)."""
    if mode != "overwrite":
        return
    for sub in ("ledger", "tombstones"):
        fs, d = _hadoop_fs(spark, f"{path}/{sub}")
        if fs.exists(d):
            fs.delete(d, True)


def save_lsh_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    num_planes: int = 6,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig_kernel: str = "blas",
    store_dtype: str = "float64",
    mode: str = "error",
) -> dict:
    """Sign the corpus and persist the index relation at ``path``.

    ``store_dtype='int8'`` stores symmetric per-vector-quantized
    vectors (see ``save_ivf_index``) — here the win compounds,
    because the relation materializes the vector once per TABLE row
    (``num_tables``-way duplication); signing always runs on floats,
    probe rescoring dequantizes (approximate within quantization
    error, buckets exact).

    One shuffle total: the signed rows repartition+sort by
    (table_id, sig) before the parquet write, so each file's row
    groups cluster whole buckets — parquet (table_id, sig) min/max
    stats then let a future point-probe prune at the scan, and the
    probe join's input is already bucket-contiguous. ``sig_kernel``
    defaults to the BLAS matmul build (the at-scale path; PERF.md r08
    sigbuild table — 13× the expression fold at 400k vectors).

    Returns the metadata dict it wrote. ``mode`` follows Spark write
    semantics ('error' | 'overwrite').
    """
    _reset_lifecycle_state(corpus.sparkSession, path, mode)
    _write_signed(
        corpus, path, dim, num_planes, num_tables, id_col, vec_col,
        sig_kernel, mode, store_dtype=store_dtype,
    )
    meta = {
        "kind": _LSH_KIND,
        "version": FORMAT_VERSION,
        "dim": dim,
        "num_planes": num_planes,
        "num_tables": num_tables,
        "sig_kernel": sig_kernel,
        "store_dtype": store_dtype,
        "id_col": id_col,
        "plane_scheme": "md5(plane:dim)[:8]/2^31 - 1",
        "epoch": 0,
    }
    _write_meta(corpus.sparkSession, path, meta, mode)
    return meta


def _write_signed(
    corpus: DataFrame,
    path: str,
    dim: int,
    num_planes: int,
    num_tables: int,
    id_col: str,
    vec_col: str,
    sig_kernel: str,
    mode: str,
    data_dir: str | None = None,
    num_partitions: int | None = None,
    store_dtype: str = "float64",
) -> None:
    if sig_kernel not in ("expr", "blas"):
        raise ValueError(f"sig_kernel must be 'expr' or 'blas', got {sig_kernel!r}")
    if store_dtype not in ("float64", "int8"):
        raise ValueError(
            f"store_dtype must be 'float64' or 'int8', got {store_dtype!r}"
        )
    signatures = (
        with_multitable_signatures if sig_kernel == "expr"
        else with_multitable_signatures_blas
    )
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if store_dtype == "int8":
        # the LSH relation stores the vector once per TABLE row (×L
        # redundancy), so quantized storage compounds: ~8× smaller
        # elements × the L-way duplication. Signing always runs on
        # the float vector (bucket choice is never quantized); the
        # quantization is the shared _int8_quantize (dirty-vector
        # guard and HALF_UP convention documented there).
        base = _int8_quantize(base)
    else:
        base = base.withColumn("norm", l2_norm(F.col("vec")))
    signed = signatures(
        base,
        "vec",
        dim,
        num_planes,
        num_tables,
        table_col="table_id",
        sig_col="sig",
    )
    if store_dtype == "int8":
        signed = signed.drop("vec")
    target = data_dir or f"{path}/index"
    # r13: seed saves (save_lsh_index(corpus.limit(0), ...) — the
    # streaming lifecycles' starting state) previously launched a
    # Spark write job for zero rows; when Catalyst proves the input
    # statically empty, write the one empty part driver-side with the
    # identical read-back schema (guide §1.2)
    if _plan_is_empty_local(corpus) and _driver_write_tiny_parquet(
        corpus.sparkSession, signed.schema, [], target, mode
    ):
        return
    keys = ["table_id", "sig"]
    reparted = (
        signed.repartition(num_partitions, *keys) if num_partitions
        else signed.repartition(*keys)
    )
    (
        reparted.sortWithinPartitions(*keys)
        .write.mode(mode)
        .parquet(target)
    )


def append_lsh_index(
    corpus_delta: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
    sig_kernel: str | None = None,
) -> dict:
    """Incrementally GROW an existing index with newly-arrived corpus
    rows — the other half of the 100 TB lifecycle (an index is built
    once, then extended per ingestion batch; full rebuilds are the
    exception). The delta is signed under the artifact's OWN stored
    parameters (dim / planes / tables from metadata — the caller
    cannot accidentally sign a batch under drifted geometry) and
    appended as new parquet files; the metadata epoch increments so
    readers and staleness checks can see the index advanced.

    Id discipline is the caller's (same as any append-only store):
    re-appending rows already indexed yields duplicate (id, table)
    entries, which the probe's max-aggregate dedups per (query,
    neighbor) — correct scores, wasted candidate volume. Writes are
    parquet-append + metadata overwrite, single-writer by contract;
    wrap the path in a transactional table format if concurrent
    writers are possible."""
    spark = corpus_delta.sparkSession
    meta = _read_meta(spark, path, _LSH_KIND)
    _write_signed(
        corpus_delta,
        path,
        int(meta["dim"]),
        int(meta["num_planes"]),
        int(meta["num_tables"]),
        id_col or meta["id_col"],
        vec_col,
        sig_kernel or meta["sig_kernel"],
        "append",
        store_dtype=meta.get("store_dtype", "float64"),
    )
    meta = dict(meta, epoch=int(meta.get("epoch") or 0) + 1)
    _write_meta(spark, path, meta, "overwrite")
    return meta


def load_lsh_index(
    spark: SparkSession,
    path: str,
    dim: int | None = None,
    num_planes: int | None = None,
    num_tables: int | None = None,
    as_of: int | None = None,
) -> tuple[DataFrame, dict]:
    """(index relation, metadata) from ``path``; raises a descriptive
    ``ValueError`` when the artifact's dim / planes / tables disagree
    with what the caller expects (pass None to accept the stored
    value — the metadata is the source of truth for the probe).
    ``as_of`` reconstructs the SNAPSHOT after that commit sequence
    (ledgered stream epochs and deletes only; see
    ``_ledger_gated_parquet`` — history reaches the last
    compaction)."""
    meta = _read_meta(spark, path, _LSH_KIND)
    _check_drift(
        path,
        meta,
        {"dim": dim, "num_planes": num_planes, "num_tables": num_tables},
    )
    index = _gated_or_raise(spark, path, "index", as_of=as_of)
    tomb = _read_tombstones(spark, path, as_of=as_of)
    if tomb is not None:  # pending deletes: logical until compaction
        index = index.join(F.broadcast(tomb), "id", "left_anti")
    return index, meta


def probe_lsh_index(
    index: DataFrame,
    meta: dict,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors from a LOADED index — identical results
    to ``topk_cosine_lsh_multitable`` over the original corpus with
    the index's parameters (the persisted vec/norm round-trip parquet
    doubles exactly; the pytest twin asserts row equality).

    The corpus side is the index relation as loaded (never re-signed,
    never re-normed); only the |Q| query vectors are signed here, with
    the expression kernel — signatures are kernel-independent by the
    documented sign-identity, and |Q| is small by contract. An
    ``int8`` artifact rescans with dequantized vectors — scores are
    approximate within quantization error, buckets are exact."""
    q = with_multitable_signatures(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        ).withColumn("__qn", l2_norm(F.col("__qvec"))),
        "__qvec",
        int(meta["dim"]),
        int(meta["num_planes"]),
        int(meta["num_tables"]),
        table_col="__qt",
        sig_col="__qsig",
    )
    if meta.get("store_dtype", "float64") == "int8":
        cvec = _dequant_int8(F.col("qvec"), F.col("scale"))
    else:
        cvec = F.col("vec")
    c = index.select(
        F.col("id").alias("neighbor_id"),
        cvec.alias("__cvec"),
        F.col("norm").alias("__cn"),
        F.col("table_id").alias("__ct"),
        F.col("sig").alias("__csig"),
    )
    return _multitable_probe(c, q, k=k, round_digits=round_digits)


# ---------------------------------------------------------------------------
# IVF coarse-quantizer centroids
# ---------------------------------------------------------------------------


def save_centroids(
    spark: SparkSession,
    centroids: list[tuple[int, list[float]]],
    path: str,
    dim: int,
    seed: int | None = None,
    mode: str = "error",
) -> dict:
    """Persist a trained IVF coarse quantizer (k rows — dimension
    table sized, one parquet file). ``seed`` records the training
    seed so a probe pipeline pinned to a seed can refuse a quantizer
    trained under another one."""
    _write_centroid_rows(spark, centroids, dim, f"{path}/index", mode)
    meta = {
        "kind": _IVF_KIND,
        "version": FORMAT_VERSION,
        "dim": dim,
        "n_centroids": len(centroids),
    }
    if seed is not None:
        meta["seed"] = seed
    _write_meta(spark, path, meta, mode)
    return meta


def load_centroids(
    spark: SparkSession,
    path: str,
    dim: int | None = None,
    seed: int | None = None,
) -> tuple[list[tuple[int, list[float]]], dict]:
    """(centroids in ``ivf_assign``'s shape, metadata); raises on
    dim/seed drift or a corrupt artifact (row count != n_centroids,
    ragged vectors)."""
    meta = _read_meta(spark, path, _IVF_KIND)
    _check_drift(path, meta, {"dim": dim, "seed": seed})
    return _read_centroid_rows(spark, f"{path}/index", meta), meta


def _write_centroid_rows(
    spark: SparkSession,
    centroids: list[tuple[int, list[float]]],
    dim: int,
    data_path: str,
    mode: str,
) -> None:
    bad = [cid for cid, vec in centroids if len(vec) != dim]
    if bad:
        raise ValueError(
            f"centroids {bad} have vectors of the wrong length for dim={dim}"
        )
    # r13: the quantizer is a dimension-sized DRIVER-LOCAL list — write
    # it driver-side (the write twin of _read_centroid_rows' pyarrow
    # fast path); one Spark job less per save/restore/retrain. Types
    # are normalized to Python int/float first so the Arrow file holds
    # the exact doubles the Spark writer would have.
    rows = [
        {"centroid_id": int(cid), "centroid": [float(x) for x in vec]}
        for cid, vec in centroids
    ]
    schema = spark.createDataFrame(
        [], "centroid_id int, centroid array<double>"
    ).schema
    if _driver_write_tiny_parquet(spark, schema, rows, data_path, mode):
        return
    spark.createDataFrame(
        centroids, "centroid_id int, centroid array<double>"
    ).repartition(1).write.mode(mode).parquet(data_path)
    # repartition(1), NOT coalesce(1): a local-list DataFrame
    # parallelizes into defaultParallelism pickled slices, and
    # coalesce makes ONE task evaluate all of them serially through
    # Python workers (~5s measured for this one-row write);
    # repartition computes the slices in parallel first (~0.5s)


def _read_centroid_rows(
    spark: SparkSession, data_path: str, meta: dict
) -> list[tuple[int, list[float]]]:
    rows = _driver_parquet_records(data_path, spark)  # r12: no job for a
    if rows is None:  # driver-collected dimension-sized sidecar
        rows = [r.asDict() for r in spark.read.parquet(data_path).collect()]
    if len(rows) != meta["n_centroids"]:
        raise ValueError(
            f"centroid artifact at {data_path} has {len(rows)} rows, metadata "
            f"says {meta['n_centroids']} — partial or corrupt write"
        )
    out = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        for r in rows
    )
    ragged = [cid for cid, vec in out if len(vec) != meta["dim"]]
    if ragged:
        raise ValueError(
            f"centroid artifact at {data_path}: centroids {ragged} have vectors "
            f"shorter/longer than dim={meta['dim']}"
        )
    return out


# ---------------------------------------------------------------------------
# IVF postings index (coarse quantizer + assigned corpus, one artifact)
# ---------------------------------------------------------------------------


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int | None = None,
    assign_kernel: str = "blas",
    store_dtype: str = "float64",
    codebooks: list[tuple[int, int, list[float]]] | None = None,
    mode: str = "error",
) -> dict:
    """Assign the corpus under ``centroids`` and persist the full IVF
    index — posting lists AND the quantizer — as ONE artifact.

    ``store_dtype`` picks the storage tier, recorded in metadata so
    probes, appends, stream ingest, and retrain are self-describing:

    * ``'float64'`` — exact vectors (the oracle-reproducible tier);
    * ``'int8'`` — symmetric per-vector scalar quantization
      (array<tinyint> + one double scale), ~8× less vector storage
      (FAISS SQ8);
    * ``'pq8'`` — product quantization (requires ``codebooks`` from
      ``sample_pq_codebooks``/``fit_pq_codebooks``): m small ints +
      one reconstruction norm per vector — the FAISS-IVFPQ model,
      the tier that makes a 100 TB embedding corpus's index fit a
      disk budget. The codebooks are persisted INSIDE the artifact
      (codes are only meaningful under the codebooks that produced
      them — same rationale as the riding coarse quantizer).

    Cell assignment always runs on the float vectors; only storage
    and probe-time scoring see quantization, so quantized probes are
    approximate within (de)quantization error — recall bounds
    pytest-asserted, and the quantization arithmetic itself is
    oracle-proven cross-engine (v12/v13).

    ``save_centroids`` persists only the trained quantizer; every
    later session still re-assigns the whole corpus per run (a full
    scan plus a k-way argmin per row). At 100 TB the assignment IS
    the expensive half, so the production posture (FAISS IVF on disk)
    stores the posting lists: one row per vector — id, vector, its
    L2 norm, centroid_id — clustered by centroid_id so a probe scans
    only the probed cells (parquet min/max stats prune at the scan).
    The quantizer rides inside the artifact because postings are only
    meaningful under the centroids that assigned them; a probe can
    never pair them with a drifted quantizer.

    ``assign_kernel`` defaults to the BLAS matmul assignment (the
    at-scale build path — ivf_assign_blas docstring; the measured
    expression assignment at 20k×64d×64c ran 290s); pass 'expr' for
    the oracle-reproducible expression twin. Recorded in metadata so
    appends default to the geometry the artifact was built with.

    Returns the metadata dict it wrote."""
    spark = corpus.sparkSession
    _reset_lifecycle_state(spark, path, mode)
    _write_ivf_postings(
        corpus, path, centroids, id_col, vec_col, assign_kernel, mode,
        store_dtype=store_dtype, codebooks=codebooks, dim=dim,
    )
    _write_centroid_rows(spark, centroids, dim, f"{path}/centroids", mode)
    meta = {
        "kind": _IVF_POSTINGS_KIND,
        "version": FORMAT_VERSION,
        "dim": dim,
        "n_centroids": len(centroids),
        "id_col": id_col,
        "assign_kernel": assign_kernel,
        "store_dtype": store_dtype,
        "epoch": 0,
    }
    if store_dtype == "pq8":
        ms = {m for m, _, _ in codebooks}
        js = {j for _, j, _ in codebooks}
        meta["pq_m"], meta["pq_k"] = len(ms), len(js)
        _write_codebook_rows(spark, codebooks, dim, f"{path}/codebooks", mode)
    if seed is not None:
        meta["seed"] = seed
    _write_meta(spark, path, meta, mode)
    return meta


def _dequant_int8(qvec, scale):
    """Dequantized float64 vector from an int8-quantized posting —
    the probe-side inverse of the quantization in
    ``_int8_quantize`` (pure expressions, JVM-side)."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def _int8_quantize(df: DataFrame, vec: str = "vec") -> DataFrame:
    """Symmetric per-vector int8 scalar quantization (FAISS SQ8):
    appends ``scale`` (max|x|/127 — the full int8 range per vector),
    ``qvec`` (array<tinyint>), and ``norm`` (of the DEQUANTIZED
    vector, so probe cosines are internally consistent). Shared by
    the LSH and IVF int8 tiers — ONE quantization convention.

    Quantization uses Spark SQL round (HALF_UP) — reproducible in
    ANSI SQL, so an oracle can recompute the identical stored values.

    Dirty-vector guard: a NaN element drives ``scale`` to NaN
    (greatest's NaN-largest ordering) and an ±inf element drives it
    to +inf, where inf/inf = NaN — either way the ANSI NaN→tinyint
    cast would fail the WHOLE build job on one corrupt row. Such
    rows store zeros under their honest non-finite scale; the
    dequantized vector is then all-NaN, its norm NaN, and the
    scoring guard (similarity._cosine_from_denom) NULLs them out of
    every ranking — the same exclusion the float tier applies to
    non-finite vectors."""
    scale = F.aggregate(
        F.transform(F.col(vec), F.abs),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    ) / F.lit(127.0)
    q_ok = (
        (F.col("scale") > 0)
        & ~F.isnan(F.col("scale"))
        & (F.col("scale") != float("inf"))
    )
    qvec = F.when(
        q_ok,
        F.transform(
            F.col(vec),
            lambda x: F.round(x / F.col("scale")).cast("tinyint"),
        ),
    ).otherwise(
        F.transform(F.col(vec), lambda x: F.lit(0).cast("tinyint"))
    )
    return (
        df.withColumn("scale", scale)
        .withColumn("qvec", qvec)
        .withColumn("norm", l2_norm(_dequant_int8(F.col("qvec"), F.col("scale"))))
    )


def _write_ivf_postings(
    corpus: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    assign_kernel: str,
    mode: str,
    data_dir: str | None = None,
    num_partitions: int | None = None,
    store_dtype: str = "float64",
    codebooks: list[tuple[int, int, list[float]]] | None = None,
    dim: int | None = None,
) -> None:
    if assign_kernel not in ("expr", "blas"):
        raise ValueError(
            f"assign_kernel must be 'expr' or 'blas', got {assign_kernel!r}"
        )
    if store_dtype not in ("float64", "int8", "pq8"):
        raise ValueError(
            f"store_dtype must be 'float64', 'int8' or 'pq8', got {store_dtype!r}"
        )
    if store_dtype == "pq8" and (codebooks is None or dim is None):
        raise ValueError("store_dtype='pq8' requires codebooks and dim")
    assign = ivf_assign if assign_kernel == "expr" else ivf_assign_blas
    assigned = assign(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        centroids,
        id_col="id",
        vec_col="vec",
    )
    if store_dtype == "pq8":
        # PQ tier: m small ints + one reconstruction norm per vector
        # (see similarity.pq_encode) — the FAISS-IVFPQ disk model.
        # assign_kernel doubles as the build kernel: 'blas' takes the
        # matmul encoder (the expression encoder's m·k interpreted
        # folds per row dominate a corpus-scale build)
        encode = pq_encode if assign_kernel == "expr" else pq_encode_blas
        assigned = encode(
            assigned, codebooks, dim, id_col="id", vec_col="vec",
            norm_col="norm", keep_cols=("centroid_id",),
        )
    elif store_dtype == "int8":
        # assignment above ran on the FLOAT vector (cell choice is
        # never quantized); storage quantizes via the shared
        # _int8_quantize (dirty-vector guard documented there)
        assigned = _int8_quantize(assigned).drop("vec")
    else:
        assigned = assigned.withColumn("norm", l2_norm(F.col("vec")))
    target = data_dir or f"{path}/index"
    # r13: seed saves (save_ivf_index(corpus.limit(0), ...) — the
    # streaming lifecycles' starting state) previously launched a
    # Spark write job for zero rows; when Catalyst proves the input
    # statically empty, write the one empty part driver-side with the
    # identical read-back schema (guide §1.2)
    if _plan_is_empty_local(corpus) and _driver_write_tiny_parquet(
        corpus.sparkSession, assigned.schema, [], target, mode
    ):
        return
    reparted = (
        assigned.repartition(num_partitions, "centroid_id") if num_partitions
        else assigned.repartition("centroid_id")
    )
    (
        reparted.sortWithinPartitions("centroid_id")
        .write.mode(mode)
        .parquet(target)
    )


def _write_codebook_rows(
    spark: SparkSession,
    codebooks: list[tuple[int, int, list[float]]],
    dim: int,
    data_path: str,
    mode: str,
) -> None:
    # grid validation happens in similarity._pq_codebook_relation at
    # encode time; persist exactly what encoded the postings.
    # r13: dimension-sized driver-local list — driver-side write, one
    # Spark job less per pq8 save/restore (see _write_centroid_rows)
    rows = [
        {"m": int(m), "j": int(j), "c": [float(x) for x in c]}
        for m, j, c in codebooks
    ]
    schema = spark.createDataFrame([], "m int, j int, c array<double>").schema
    if _driver_write_tiny_parquet(spark, schema, rows, data_path, mode):
        return
    spark.createDataFrame(
        [(int(m), int(j), [float(x) for x in c]) for m, j, c in codebooks],
        "m int, j int, c array<double>",
    ).repartition(1).write.mode(mode).parquet(data_path)


def _driver_parquet_records(
    data_path: str, spark: SparkSession | None = None
) -> list[dict] | None:
    """Dimension-sized sidecar read (centroids / codebooks) as a
    DRIVER-SIDE pyarrow scan when the path is a local directory —
    these artifacts are collected to the driver regardless, so a
    Spark job per read is a fixed ~0.2-0.3s of scheduling for a few
    KB (r12 optimization; the streaming IVF ingest pays one such read
    PER EPOCH). Returns None for remote schemes, missing pyarrow, or
    unreadable files — callers then take the Spark read, which is
    also the error-reporting path for genuinely corrupt artifacts.

    Scheme-less paths resolve against Hadoop's ``fs.defaultFS``: on a
    cluster whose default filesystem is HDFS, a bare path means HDFS,
    and a coincidentally same-named LOCAL directory on the driver must
    never be read in its place (r12 advice fix) — the fast path is
    taken only when the default FS is the local one (or the caller
    spelled an explicit ``file:`` scheme)."""
    scheme, sep, rest = data_path.partition("://")
    if sep:
        if scheme != "file":
            return None
        data_path = rest if rest.startswith("/") else "/" + rest
    elif data_path.startswith("file:"):
        data_path = data_path[len("file:"):]
    elif not _default_fs_is_local(spark):
        return None
    import os

    if not os.path.isdir(data_path):
        return None
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    parts = sorted(
        f for f in os.listdir(data_path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not parts:
        return None
    try:
        out: list[dict] = []
        for f in parts:
            out.extend(
                pq.read_table(os.path.join(data_path, f)).to_pylist()
            )
        return out
    except Exception:  # noqa: BLE001 — corrupt file: report via Spark path
        return None


def _default_fs_is_local(spark: SparkSession | None) -> bool:
    """True when Hadoop's ``fs.defaultFS`` names the local filesystem
    (the shipped local-mode default) — the gate for resolving
    SCHEME-LESS paths driver-side. With no session to consult, be
    conservative: scheme-less paths take the Spark read."""
    if spark is None:
        return False
    try:
        default_fs = (
            spark.sparkContext._jsc.hadoopConfiguration().get(
                "fs.defaultFS", "file:///"
            )
        )
    except Exception:  # noqa: BLE001 — any doubt → the Spark path
        return False
    return str(default_fs).startswith("file:")


def _driver_local_path(path: str, spark: SparkSession | None) -> str | None:
    """OS path for ``path`` when it is driver-local (explicit
    ``file:`` scheme, or scheme-less with a local default FS — the
    same resolution rule as ``_driver_parquet_records``), else None."""
    scheme, sep, rest = path.partition("://")
    if sep:
        if scheme != "file":
            return None
        return rest if rest.startswith("/") else "/" + rest
    if path.startswith("file:"):
        return path[len("file:"):]
    return path if _default_fs_is_local(spark) else None


def _plan_is_empty_local(df: DataFrame) -> bool:
    """True when the frame's OPTIMIZED plan is an empty LocalRelation
    — i.e. Catalyst itself proved the input statically empty (a
    ``.limit(0)`` seed, an empty literal frame). Analysis-only: no
    job. A real source scan never folds to this, so the check can
    only ever route provably-empty inputs to a fast path."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return (
            plan.getClass().getSimpleName() == "LocalRelation"
            and plan.data().isEmpty()
        )
    except Exception:  # noqa: BLE001 — any doubt → the normal path
        return False


def _driver_write_tiny_parquet(
    spark: SparkSession, schema, rows: list[dict], target_dir: str, mode: str
) -> bool:
    """Write a dimension-sized (usually empty) relation as ONE parquet
    part file driver-side — the write-side twin of
    ``_driver_parquet_records`` (guide §1.2: zero rows should never
    launch a distributed job). Layout matches the Spark writer: one
    ``part-00000-<uuid>-c000.snappy.parquet`` + ``_SUCCESS``; column
    types/nullability come from the Spark schema via Arrow, so readers
    infer the identical schema. Returns False (caller takes the Spark
    writer) for non-local paths, missing pyarrow, or any mode except
    'overwrite' against an existing dir — the Spark path keeps the
    exact exists/append error semantics."""
    local = _driver_local_path(target_dir, spark)
    if local is None:
        return False
    import os

    if os.path.exists(local) and mode != "overwrite":
        return False
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        aschema = to_arrow_schema(schema)
        table = pa.Table.from_pylist(rows, schema=aschema)
    except Exception:  # noqa: BLE001 — unsupported type etc. → Spark path
        return False
    import shutil
    import uuid

    if os.path.exists(local):
        shutil.rmtree(local)
    os.makedirs(local)
    pq.write_table(
        table,
        os.path.join(local, f"part-00000-{uuid.uuid4()}-c000.snappy.parquet"),
        compression="snappy",
    )
    with open(os.path.join(local, "_SUCCESS"), "w"):
        pass
    return True


def _read_codebook_rows(
    spark: SparkSession, data_path: str, meta: dict
) -> list[tuple[int, int, list[float]]]:
    rows = _driver_parquet_records(data_path, spark)
    if rows is None:
        rows = [r.asDict() for r in spark.read.parquet(data_path).collect()]
    want = int(meta["pq_m"]) * int(meta["pq_k"])
    if len(rows) != want:
        raise ValueError(
            f"PQ codebook artifact at {data_path} has {len(rows)} rows, "
            f"metadata says m×k = {want} — partial or corrupt write"
        )
    return sorted(
        (int(r["m"]), int(r["j"]), [float(x) for x in r["c"]]) for r in rows
    )


def append_ivf_index(
    corpus_delta: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
    assign_kernel: str | None = None,
) -> dict:
    """Grow an existing IVF index with newly-arrived corpus rows,
    assigned under the artifact's OWN stored quantizer (the caller
    cannot accidentally mix assignments from drifted centroids) with
    its stored assignment kernel unless overridden.
    Parquet-append + metadata epoch bump; id discipline and the
    single-writer contract are as ``append_lsh_index``."""
    spark = corpus_delta.sparkSession
    meta = _read_meta(spark, path, _IVF_POSTINGS_KIND)
    centroids = _read_centroid_rows(spark, f"{path}/centroids", meta)
    store_dtype = meta.get("store_dtype", "float64")
    codebooks = (
        _read_codebook_rows(spark, f"{path}/codebooks", meta)
        if store_dtype == "pq8"
        else None
    )
    _write_ivf_postings(
        corpus_delta,
        path,
        centroids,
        id_col or meta["id_col"],
        vec_col,
        assign_kernel or meta.get("assign_kernel", "expr"),
        "append",
        store_dtype=store_dtype,
        codebooks=codebooks,
        dim=int(meta["dim"]),
    )
    meta = dict(meta, epoch=int(meta.get("epoch") or 0) + 1)
    _write_meta(spark, path, meta, "overwrite")
    return meta


def load_ivf_index(
    spark: SparkSession,
    path: str,
    dim: int | None = None,
    n_centroids: int | None = None,
    seed: int | None = None,
    as_of: int | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]], dict]:
    """(postings relation, centroids, metadata) from ``path``; raises
    a descriptive ``ValueError`` on dim / n_centroids / seed drift or
    a corrupt quantizer (row count != n_centroids, ragged vectors).
    For a ``pq8`` artifact the persisted codebooks ride back inside
    the metadata dict (key ``_codebooks``) so ``probe_ivf_index``
    can reconstruct without extra plumbing. ``as_of`` reconstructs
    the snapshot after that commit sequence (ledgered batches only;
    ``_ledger_gated_parquet``)."""
    meta = _read_meta(spark, path, _IVF_POSTINGS_KIND)
    _check_drift(
        path, meta, {"dim": dim, "n_centroids": n_centroids, "seed": seed}
    )
    centroids = _read_centroid_rows(spark, f"{path}/centroids", meta)
    if meta.get("store_dtype") == "pq8":
        meta = dict(
            meta,
            _codebooks=_read_codebook_rows(spark, f"{path}/codebooks", meta),
        )
    postings = _gated_or_raise(spark, path, "index", as_of=as_of)
    tomb = _read_tombstones(spark, path, as_of=as_of)
    if tomb is not None:  # pending deletes: logical until compaction
        postings = postings.join(F.broadcast(tomb), "id", "left_anti")
    return postings, centroids, meta


def retrain_ivf_index(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    n_centroids: int | None = None,
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
    assign_kernel: str = "blas",
    mode: str = "error",
) -> dict:
    """Rebuild the IVF index at ``src_path`` under a FRESHLY-TRAINED
    quantizer, into ``dst_path`` — the action ``ivf_index_stats``'
    report calls for when append drift has skewed the cells (rising
    imbalance / empty_cells across epochs). Fits seeded Spark ML
    KMeans on the index's own postings (``sample_fraction`` bounds
    the training scan at corpus scale), re-assigns every posting
    under the new centroids, and writes a complete new artifact;
    the source is read-only throughout, so probes can keep serving
    from it until the caller swaps paths — the blue/green cutover a
    100 TB index needs (FAISS retrains the same way: new quantizer,
    full re-add). ``n_centroids`` defaults to the source's. Returns
    the new artifact's metadata. Retraining a quantized artifact
    trains and re-assigns on the DE-quantized vectors (the float
    originals are gone by design) and keeps the dtype; a ``pq8``
    artifact keeps its codebooks too — retrain refits the COARSE
    quantizer, not the product codebooks (rebuild from the float
    corpus to refit those)."""
    from workhop2_etl_spark.operators.similarity import fit_centroids

    postings, _, meta = load_ivf_index(spark, src_path)
    store_dtype = meta.get("store_dtype", "float64")
    if store_dtype == "pq8":
        one, _, kk, _ = _pq_codebook_relation(
            spark, meta["_codebooks"], int(meta["dim"])
        )
        postings = postings.crossJoin(F.broadcast(one))
        vec = pq_decode(F.col("codes"), "__cb", kk)
    elif store_dtype == "int8":
        vec = _dequant_int8(F.col("qvec"), F.col("scale"))
    else:
        vec = F.col("vec")
    corpus = postings.select(
        F.col("id").alias(meta["id_col"]), vec.alias("embedding")
    )
    cents = fit_centroids(
        corpus,
        int(n_centroids or meta["n_centroids"]),
        seed=seed,
        max_iter=max_iter,
        sample_fraction=sample_fraction,
    )
    return save_ivf_index(
        corpus,
        dst_path,
        cents,
        dim=int(meta["dim"]),
        id_col=meta["id_col"],
        seed=seed,
        assign_kernel=assign_kernel,
        store_dtype=store_dtype,
        codebooks=meta.get("_codebooks"),
        mode=mode,
    )


def ivf_index_stats(postings: DataFrame, meta: dict) -> DataFrame:
    """One-row health report over an IVF postings relation — the
    observability half of the append lifecycle. Appends assign under
    the FROZEN quantizer, so as the data distribution drifts the cell
    populations skew; ``imbalance`` (largest cell ÷ uniform share)
    and ``empty_cells`` rising across epochs is the retrain-and-
    rebuild signal, and ``max_cell`` bounds the worst probe's scan.
    One shuffle (cell counts), dimension-sized aggregate — safe at
    any corpus scale.

    Columns: n_vectors, cells_total (from metadata — counts cells
    the quantizer could assign, so empty cells are visible),
    cells_used, empty_cells, max_cell, mean_cell (over USED cells,
    2dp), imbalance (max_cell ÷ n_vectors/cells_total, 2dp)."""
    total = int(meta["n_centroids"])
    cells = postings.groupBy("centroid_id").agg(F.count("*").alias("__n"))
    return (
        cells.agg(
            # coalesce: a just-created EMPTY artifact (health-checked
            # before its first ingest) reports zeros, not NULLs
            F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_vectors"),
            F.count("*").cast("long").alias("cells_used"),
            F.coalesce(F.max("__n"), F.lit(0)).cast("long").alias("max_cell"),
            F.round(F.coalesce(F.avg("__n"), F.lit(0.0)), 2).alias("mean_cell"),
        )
        .withColumn("cells_total", F.lit(total).cast("long"))
        .withColumn("empty_cells", (F.col("cells_total") - F.col("cells_used")))
        .withColumn(
            "imbalance",
            F.when(
                F.col("n_vectors") > 0,
                F.round(
                    F.col("max_cell") / (F.col("n_vectors") / F.col("cells_total")),
                    2,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "n_vectors", "cells_total", "cells_used", "empty_cells",
            "max_cell", "mean_cell", "imbalance",
        )
    )


def lsh_index_stats(index: DataFrame, meta: dict) -> DataFrame:
    """One-row health report over a multi-table LSH index relation.
    ``expected_candidates`` is the expected per-query candidate
    volume for a query distributed like the corpus — Σ bucket² ÷
    corpus size, summed over tables (a query lands in bucket b with
    probability n_b/n and then scans n_b rows) — the number that
    actually prices a probe; ``max_bucket`` bounds the worst one.
    One shuffle (bucket counts), bucket-sized aggregate."""
    n_tables = int(meta["num_tables"])
    buckets = index.groupBy("table_id", "sig").agg(F.count("*").alias("__n"))
    return (
        buckets.agg(
            # coalesce: empty artifacts report zeros, not NULLs
            F.coalesce(F.sum("__n") / n_tables, F.lit(0.0))
            .cast("long")
            .alias("n_vectors"),
            F.count("*").cast("long").alias("buckets_used"),
            F.coalesce(F.max("__n"), F.lit(0)).cast("long").alias("max_bucket"),
            F.round(F.coalesce(F.avg("__n"), F.lit(0.0)), 2).alias("mean_bucket"),
            F.round(
                F.coalesce(
                    F.sum(F.col("__n") * F.col("__n"))
                    / (F.sum("__n") / n_tables),
                    F.lit(0.0),
                ),
                2,
            ).alias("expected_candidates"),
        )
        .withColumn("tables", F.lit(n_tables).cast("long"))
        .select(
            "n_vectors", "tables", "buckets_used", "max_bucket",
            "mean_bucket", "expected_candidates",
        )
    )


def _gated_or_raise(
    spark: SparkSession, path: str, sub: str, as_of: int | None = None
) -> DataFrame:
    """``_ledger_gated_parquet`` for reads that need rows to exist:
    raises a descriptive error instead of returning None when the
    directory is missing, fileless, or every file belongs to an
    uncommitted ledgered batch (e.g. a seeded-empty artifact whose
    only ingest epoch crashed mid-rename — resume the stream)."""
    rel = _ledger_gated_parquet(spark, path, sub, as_of=as_of)
    if rel is None:
        hint = (
            f" at snapshot as_of={as_of} (every data file belongs to a "
            "later or uncommitted batch — an artifact seeded empty has "
            "no base files, so its earliest readable snapshot is its "
            "first commit)" if as_of is not None else ""
        )
        raise ValueError(
            f"index at {path} has no COMMITTED data under {sub}/{hint} — "
            "either nothing was ever written, or every file belongs "
            "to an uncommitted (crashed / in-flight) ledgered batch; "
            "resume or replay the writer before reading"
        )
    return rel


def _commit_marker(fs, marker, seq: int) -> None:
    """Create a ledger marker carrying its COMMIT SEQUENCE (the
    metadata epoch the committing batch is about to write) as file
    content — the total order that makes ``as_of`` snapshot reads
    possible. Marker EXISTENCE is still the atomic commit signal
    (create-then-write; a crash between them leaves an existing,
    empty marker = committed with unknown seq, which snapshot reads
    treat as always-visible — the pre-r12 marker format)."""
    out = fs.create(marker, True)
    try:
        out.write(bytearray(str(int(seq)).encode("ascii")))
    finally:
        out.close()


def _marker_seq(fs, marker) -> int | None:
    """The commit sequence recorded in a ledger marker, or None for
    legacy/empty markers (always-visible under ``as_of``)."""
    try:
        stream = fs.open(marker)
    except Exception:  # noqa: BLE001 — racing delete; treat as legacy
        return None
    try:
        data = bytearray()
        b = stream.read()
        while b != -1 and len(data) < 32:
            data.append(b)
            b = stream.read()
    finally:
        stream.close()
    try:
        return int(bytes(data)) if data else None
    except ValueError:
        return None


def _ledger_gated_parquet(
    spark: SparkSession, path: str, sub: str, as_of: int | None = None
):
    """Parquet relation at ``<path>/<sub>`` with UNCOMMITTED ledgered
    batches hidden — the artifact's reader-side MVCC. Two mutators
    rename multi-file batches into live dirs and only then create a
    ledger marker (one atomic ``createNewFile``), so the marker is
    each batch's reader-visible commit point:

    - ``delete_from_index``: ``delete-<batch>-NNNNN.parquet`` across
      up to three dirs, marker ``ledger/delete-<batch>``;
    - ``ingest_epoch`` (streaming): ``stream-<epoch:012d>-NNNNN
      .parquet`` across the kind's dirs, marker
      ``ledger/epoch-<epoch:012d>``.

    Files whose marker is absent (a crashed or, under a racing
    reader, still-in-flight batch) are excluded, which makes the
    rename sequence invisible to readers REGARDLESS of rename order:
    a reader never sees decremented stats with the victims' tf rows
    still visible (delete), nor an epoch's tf rows without its
    df/stats partials (stream ingest) — r12, generalizing the r11
    delete-window advice to every ledgered batch. Batch appends
    (``append_*``) are NOT ledgered and keep their documented
    single-writer/stop-the-world contract. When no batch is hidden
    the plain directory read is used (identical scan, partition
    discovery and parquet pushdown). Returns None when the directory
    is missing or nothing is visible.

    ``as_of`` (r12 — SNAPSHOT READS): additionally hide committed
    batches whose marker records a commit sequence GREATER than
    ``as_of`` — the load then reconstructs the artifact exactly as it
    stood after commit ``as_of`` (each marker carries the metadata
    epoch its batch wrote, a total order under the single-writer
    contract; see ``_commit_marker``). Legacy/empty markers carry no
    sequence and stay visible under any ``as_of``. History reaches
    back to the last ``compact_index`` (compaction folds batches into
    base files, physically — the Delta-VACUUM analog) and does not
    cover un-ledgered batch appends."""
    fs, p = _hadoop_fs(spark, f"{path}/{sub}")
    if not fs.exists(p):
        return None
    files = [
        st.getPath()
        for st in fs.listStatus(p)
        if st.isFile() and not st.getPath().getName().startswith((".", "_"))
    ]
    if not files:  # e.g. a replay swept a crashed batch's files
        return None
    markers = set()  # required ledger marker names
    for f in files:
        name = f.getName()
        if not name.endswith(".parquet"):
            continue
        if name.startswith("delete-"):
            batch = name[len("delete-"):-len(".parquet")].rsplit("-", 1)[0]
            markers.add(f"delete-{batch}")
        elif name.startswith("stream-"):
            epoch = name[len("stream-"):-len(".parquet")].rsplit("-", 1)[0]
            markers.add(f"epoch-{epoch}")
    hidden = set()
    for m in markers:
        _, marker = _hadoop_fs(spark, f"{path}/ledger/{m}")
        kind, _, tag = m.partition("-")
        prefix = ("delete-" if kind == "delete" else "stream-") + tag + "-"
        if not fs.exists(marker):
            hidden.add(prefix)
        elif as_of is not None:
            seq = _marker_seq(fs, marker)
            if seq is not None and seq > as_of:
                hidden.add(prefix)
    if not hidden:
        return spark.read.parquet(f"{path}/{sub}")
    visible = [
        str(f) for f in files
        if not any(f.getName().startswith(h) for h in hidden)
    ]
    if not visible:
        return None
    return spark.read.parquet(*visible)


def _sweep_uncommitted_delete_batches(spark: SparkSession, path: str) -> int:
    """Physically remove every uncommitted delete batch's files
    (ledger marker absent — see ``_ledger_gated_parquet``; such a
    batch was never reader-visible and its ``delete_from_index`` call
    never returned 'committed'). ``compact_index`` runs this before
    reading any data dir so a crashed batch's negative partials can
    never fold into the compacted layout; the batch's replay (same
    label) restages from post-compaction live state. Single-writer by
    contract, like every mutator here. Returns files removed."""
    fs, _ = _hadoop_fs(spark, path)
    removed = 0
    for sub in ("tombstones", "df", "stats"):
        _, d = _hadoop_fs(spark, f"{path}/{sub}")
        if not fs.exists(d):
            continue
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if not (
                st.isFile()
                and name.startswith("delete-")
                and name.endswith(".parquet")
            ):
                continue
            batch = name[len("delete-"):-len(".parquet")].rsplit("-", 1)[0]
            _, marker = _hadoop_fs(spark, f"{path}/ledger/delete-{batch}")
            if not fs.exists(marker):
                fs.delete(st.getPath(), False)
                removed += 1
        if sub == "tombstones" and not any(
            st.isFile() and not st.getPath().getName().startswith((".", "_"))
            for st in fs.listStatus(d)
        ):  # only delete batches ever populate it — drop the husk
            fs.delete(d, True)
    return removed


def _assert_no_uncommitted_stream_files(spark: SparkSession, path: str) -> None:
    """Refuse to compact over unmarked ``stream-<epoch>-*`` files.
    ``compact_index`` reads data dirs DIRECTLY (not through the
    marker-gated loader — it must rewrite whole dirs), so an epoch
    that crashed mid-rename AND lost its staging dir (the normal
    crash leaves staging behind and is caught by the existing
    ingest.epoch-* guard) would otherwise fold reader-invisible rows
    into the compacted files, where the epoch's replay would then
    duplicate them. Unlike a delete batch — whose replay restages
    from live state, so compact sweeps it — a stream epoch's replay
    assumes its own renamed files are the only copies; sweeping could
    race a concurrent resume, so the stream must converge first."""
    for sub in ("tf", "df", "stats", "index"):
        fs, d = _hadoop_fs(spark, f"{path}/{sub}")
        if not fs.exists(d):
            continue
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if not (
                st.isFile()
                and name.startswith("stream-")
                and name.endswith(".parquet")
            ):
                continue
            epoch = name[len("stream-"):-len(".parquet")].rsplit("-", 1)[0]
            _, marker = _hadoop_fs(spark, f"{path}/ledger/epoch-{epoch}")
            if not fs.exists(marker):
                raise ValueError(
                    f"index at {path} has files from an UNCOMMITTED stream "
                    f"epoch ({sub}/{name}; marker ledger/epoch-{epoch} "
                    "absent) — resume the stream to convergence (or remove "
                    "the epoch's stream-* files if the stream is abandoned) "
                    "before compacting, else the epoch's replay would "
                    "duplicate rows"
                )


def _read_tombstones(spark: SparkSession, path: str, as_of: int | None = None):
    """Tombstoned row ids at ``path`` (one column, named after the
    relation's own id column: 'id' for the postings kinds, 'doc_id'
    for the lexical kind) or None when no COMMITTED deletes are
    pending (uncommitted batches are marker-gated invisible — see
    ``_ledger_gated_parquet``). Every loader anti-joins this
    relation; ``compact_index`` purges the rows physically and clears
    the directory. ``as_of`` restricts to deletes committed at or
    before that sequence (snapshot reads)."""
    return _ledger_gated_parquet(spark, path, "tombstones", as_of=as_of)


def delete_from_index(
    spark: SparkSession,
    path: str,
    ids,
    batch: str | None = None,
) -> str:
    """Delete rows by id from a persisted index — crash-safe,
    idempotent, and (for the lexical kind) bit-exactly equivalent to
    rebuilding on the surviving documents.

    ``ids``: a one-column DataFrame or a Python list of ids (the type
    must match the indexed id column). Deletion is logical until the
    next ``compact_index``: a TOMBSTONE batch lands under
    ``<path>/tombstones/`` and every loader anti-joins it (broadcast
    — the tombstone set between compactions is a small fraction of
    the corpus by contract; compact when it is not). For the lexical
    kind the batch additionally appends NEGATIVE df / stats partials
    derived from the victims' own live tf rows, so the loader's
    sum-of-partials stays exactly the single-shot aggregate over the
    survivors — the same additivity that powers appends, run in
    reverse (deletion needs no re-read of the corpus).

    Protocol (the ingest_epoch discipline, module docstring of
    streaming/index_stream.py): a ledger marker
    (``ledger/delete-<batch>``) short-circuits committed replays; the
    batch's files stage under ``<path>/delete.<batch>`` and rename in
    with batch-owned names, and a replay of a half-renamed batch
    deletes its own files first and restages from live state. The
    MARKER is the commit point for readers too: every loader hides
    ``delete-<batch>-*`` files whose marker is absent
    (``_ledger_gated_parquet``), so the negative partials and the
    tombstones become visible together — atomically, at marker
    creation — or not at all, even to a reader racing the writer or
    loading after a mid-rename crash. ``batch`` defaults to the next
    ``auto-NNNNNN`` label (max existing auto sequence + 1 — explicit
    labels live in their own namespace and can never collide with or
    be replayed by an auto-labelled call); pass an explicit one to
    make retries of a caller-level job idempotent.

    Semantics (SQL DELETE over the rows present now): ids not
    present — or already deleted — contribute nothing, because
    victims are derived from the LIVE relation; double-deletes are
    no-ops, and deleting an id that only arrives LATER does not
    reserve a tombstone against it. One id-discipline rule carries
    over from appends: do NOT re-ingest a deleted id until a
    compaction has purged its tombstone — the tombstone cannot
    distinguish the new row from the deleted one (it would be
    suppressed), and for the lexical kind the re-ingest's positive
    partials would desynchronize df from the visible tf rows. The
    same FAISS rule: remove_ids, merge/compact, then re-add.

    Returns ``'committed'`` or ``'skipped'`` (batch already in the
    ledger). Single-writer by contract, like append and compact."""
    from workhop2_etl_spark.operators.retrieval import _LEXICAL_KIND

    meta = _read_meta_any_kind(
        spark, path,
        kinds=(_LSH_KIND, _IVF_POSTINGS_KIND, _LEXICAL_KIND),
        verb="delete from",
    )
    fs, ledger_p = _hadoop_fs(spark, f"{path}/ledger")
    if batch is None:
        import re

        existing = (
            [st.getPath().getName() for st in fs.listStatus(ledger_p)]
            if fs.exists(ledger_p) else []
        )
        # auto labels are namespaced ('auto-') and derived from the
        # MAX existing auto sequence, not a count — a caller's
        # explicit label of the same shape can neither collide with
        # a later auto label (count-after-gaps) nor be silently
        # 'skipped' against its marker
        seqs = [
            int(m.group(1))
            for e in existing
            if (m := re.fullmatch(r"delete-auto-(\d{6})", e))
        ]
        batch = f"auto-{(max(seqs) + 1 if seqs else 0):06d}"
        if f"delete-{batch}" in existing:  # unreachable by max+1; guards
            raise ValueError(  # a hand-minted marker shadowing the scheme
                f"auto-generated delete batch label {batch!r} already has "
                f"a ledger marker at {path} — pass an explicit batch label"
            )
    _, marker = _hadoop_fs(spark, f"{path}/ledger/delete-{batch}")
    staging = f"{path}/delete.{batch}"
    _, staging_p = _hadoop_fs(spark, staging)
    if fs.exists(marker):
        if fs.exists(staging_p):
            fs.delete(staging_p, True)
        return "skipped"

    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(i,) for i in ids], ["id"])
    id_name = "doc_id" if meta["kind"] == _LEXICAL_KIND else "id"
    ids = ids.toDF(id_name).distinct()

    # replay cleanup FIRST: the staging below derives from LIVE state
    # (victims = live ∩ ids), so any files a crashed attempt of THIS
    # batch already renamed in must leave before the live relations
    # are read — otherwise partial tombstones would shrink the victim
    # set and the restaged negative partials would understate
    prefix = f"delete-{batch}-"
    dst_subs = (
        ("df", "stats", "tombstones")
        if meta["kind"] == _LEXICAL_KIND else ("tombstones",)
    )
    for sub in dst_subs:
        _, dst_dir_p = _hadoop_fs(spark, f"{path}/{sub}")
        if fs.exists(dst_dir_p):
            for st in fs.listStatus(dst_dir_p):
                if st.getPath().getName().startswith(prefix):
                    fs.delete(st.getPath(), False)

    tomb = _read_tombstones(spark, path)
    if meta["kind"] == _LEXICAL_KIND:
        from pyspark import StorageLevel

        tf = _gated_or_raise(spark, path, "tf")
        live = tf.join(F.broadcast(tomb), id_name, "left_anti") if tomb is not None else tf
        # persist the victim rows across the THREE partial writes
        # below (r12): each write is its own action, so the lazy form
        # re-ran the gated tf scan + tombstone anti-join + id
        # semi-join once per file — 14 jobs per delete, of which 2
        # whole re-executions of the victim scan. Victim rows are a
        # small fraction of the corpus by the same contract that lets
        # tombstones broadcast; MEMORY_AND_DISK spills, never
        # recomputes.
        victims = live.join(F.broadcast(ids), id_name, "left_semi").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            # negative partials over the victims' OWN rows: df loses
            # one per (term, victim doc); stats lose the victim count
            # and their Σ dl (dl rides every tf row — min() is
            # per-doc exact)
            neg_df = victims.groupBy("term").agg(
                (-F.count(F.lit(1))).alias("df")
            )
            neg_stats = victims.groupBy(id_name).agg(
                F.min("dl").alias("__dl")
            ).agg(
                (-F.count(F.lit(1))).alias("n_docs"),
                (-F.coalesce(F.sum("__dl"), F.lit(0))).alias("sum_dl"),
            )
            present = victims.select(id_name).distinct()
            # coalesce(1), not repartition(1): these are real
            # aggregation outputs (the shuffle boundary already exists
            # upstream), so coalesce folds the post-shuffle read into
            # the single writer task without paying a SECOND exchange
            # per file (r12; the repartition-vs-coalesce note in
            # _write_centroid_rows is about pickled local-list frames,
            # which these are not). The three staged writes are
            # independent reads of the persisted victims, so they run
            # concurrently (guide §2.6); all three land in STAGING —
            # nothing is reader-visible until the renames + marker.
            from concurrent.futures import ThreadPoolExecutor

            def _w(pair):
                rel, sub = pair
                rel.coalesce(1).write.mode("overwrite").parquet(
                    f"{staging}/{sub}"
                )

            with ThreadPoolExecutor(max_workers=3) as pool:
                list(pool.map(_w, [
                    (neg_df, "df"),
                    (neg_stats, "stats"),
                    (present, "tombstones"),
                ]))
        finally:
            victims.unpersist()
        moves = [
            (f"{staging}/{sub}", f"{path}/{sub}")
            for sub in ("df", "stats", "tombstones")
        ]
    else:
        postings = _gated_or_raise(spark, path, "index")
        live = postings.join(F.broadcast(tomb), id_name, "left_anti") if tomb is not None else postings
        present = (
            live.join(F.broadcast(ids), id_name, "left_semi")
            .select(id_name)
            .distinct()
        )
        present.coalesce(1).write.mode("overwrite").parquet(
            f"{staging}/tombstones"
        )  # coalesce, not repartition — see the lexical branch above
        moves = [(f"{staging}/tombstones", f"{path}/tombstones")]

    for src_dir, dst_dir in moves:
        _, src_dir_p = _hadoop_fs(spark, src_dir)
        staged = sorted(
            (
                st.getPath()
                for st in fs.listStatus(src_dir_p)
                if st.isFile()
                and not st.getPath().getName().startswith((".", "_"))
            ),
            key=lambda p: p.getName(),
        )
        _, dst_dir_p = _hadoop_fs(spark, dst_dir)
        fs.mkdirs(dst_dir_p)
        for i, src in enumerate(staged):
            _, dst = _hadoop_fs(spark, f"{dst_dir}/{prefix}{i:05d}.parquet")
            if not fs.rename(src, dst):
                raise IOError(
                    f"rename {src} -> {dst} failed during delete batch "
                    f"{batch}"
                )

    fs.mkdirs(marker.getParent())
    seq = int(meta.get("epoch") or 0) + 1
    _commit_marker(fs, marker, seq)
    fs.delete(staging_p, True)
    _write_meta(spark, path, dict(meta, epoch=seq), "overwrite")
    return "committed"


def compact_index(
    spark: SparkSession,
    path: str,
    num_partitions: int | None = None,
) -> dict:
    """Rewrite an appended index back into its clustered layout —
    the maintenance half of the append lifecycle (FAISS merges
    segments; Delta/Iceberg call this OPTIMIZE/rewriteDataFiles).

    Every ``append_*_index`` batch lands as its OWN parquet files,
    clustered only within the batch: after many ingest epochs the
    artifact is (a) a small-file pile — at 100 TB, thousands of
    sub-row-group files per append schedule — and (b) no longer
    bucket-contiguous ACROSS files, so a probe's (table_id, sig) /
    centroid_id min-max pruning stops skipping whole files (each
    small file spans fewer rows but EVERY file still holds every
    bucket's epoch slice). Compaction re-shuffles the postings on
    the artifact's own cluster keys (from metadata — works for both
    index kinds) and rewrites them as ``num_partitions`` files
    (default: current shuffle-partition setting), restoring the
    freshly-built layout without touching row content: a probe
    before and after compaction is row-identical (pytest-asserted).

    Single-writer, stop-the-world by contract (same as append), and
    crash-safe by construction: the rewrite stages into
    ``<path>/index.compacting`` (one full write — the postings are
    never written twice), then swaps in with filesystem
    metadata-only operations (delete old dir, rename staging). A
    crash before the staged ``_SUCCESS`` marker leaves the live
    ``<path>/index`` untouched and the dead staging dir is discarded
    on the next run; a crash inside the swap window is detected on
    the next run (staging committed) and the swap completes WITHOUT
    re-reading the data dir — the one sequence that must never
    happen is recompacting a half-replaced data dir. Readers must
    not hold the path open across a compaction outside a
    transactional table format. Bumps the metadata epoch; returns
    the metadata plus ``files_before`` / ``files_after`` so callers
    and tests can see the layout actually collapsed.
    """
    from workhop2_etl_spark.operators.retrieval import (
        _LEXICAL_KIND,
        _lexical_compact_specs,
    )

    meta = _read_meta_any_kind(
        spark,
        path,
        kinds=(_LSH_KIND, _IVF_POSTINGS_KIND, _LEXICAL_KIND),
        verb="compact",
    )
    # an UNCOMMITTED (crashed) delete batch's files sweep first: they
    # were never reader-visible (marker-gated) and must not fold into
    # the compacted layout — the batch's replay restages from the
    # post-compaction live state. Then the pending COMMITTED delete
    # tombstones purge PHYSICALLY here (every loader anti-joined them
    # logically until now); the tombstone dir clears after every data
    # dir has swapped — a crash in between leaves tombstones pointing
    # at already-purged rows, whose anti-join is a no-op, so any
    # intermediate state stays load-correct
    _sweep_uncommitted_delete_batches(spark, path)
    _assert_no_uncommitted_stream_files(spark, path)
    tomb = _read_tombstones(spark, path)

    def _purge_ids(d: DataFrame) -> DataFrame:
        return d.join(F.broadcast(tomb), "id", "left_anti")

    if meta["kind"] == _LSH_KIND:
        specs = [
            ("index", ["table_id", "sig"],
             _purge_ids if tomb is not None else None, False)
        ]
    elif meta["kind"] == _IVF_POSTINGS_KIND:
        specs = [
            ("index", ["centroid_id"],
             _purge_ids if tomb is not None else None, False)
        ]
    else:  # lexical: tf re-clusters (+ purges); df/stats signed
        # partials FOLD to one net record (load-equivalent)
        specs = _lexical_compact_specs(tomb)

    fs, root_p = _hadoop_fs(spark, path)

    # an UNCOMMITTED stream epoch (streaming/index_stream.py) always
    # leaves its ingest.epoch-* staging dir behind; compacting now
    # would fold its already-renamed rows into part-* files and the
    # epoch's replay would re-add them — duplicates. A COMMITTED
    # epoch's leftover staging (crash between marker and sweep) is
    # just swept.
    for st in fs.listStatus(root_p):
        name = st.getPath().getName()
        if name.startswith("ingest.epoch-"):
            _, marker = _hadoop_fs(
                spark, f"{path}/ledger/epoch-{name.removeprefix('ingest.epoch-')}"
            )
            if fs.exists(marker):
                fs.delete(st.getPath(), True)
            else:
                raise ValueError(
                    f"index at {path} has an uncommitted stream ingest epoch "
                    f"({name}) — resume the stream to convergence (or remove "
                    "the staging dir if the stream is abandoned) before "
                    "compacting, else the epoch's replay would duplicate rows"
                )

    # each data dir stages and swaps independently; every dir's
    # content is load-equivalent before and after its own swap, so a
    # crash between dirs leaves a correct (part-compacted) artifact
    # and the next run completes the rest
    before_total: int | None = 0
    after_total = 0
    for sub, keys, transform, fold_one in specs:
        fb, fa = _compact_dir(
            spark, f"{path}/{sub}", keys, num_partitions, transform,
            fold_one,
        )
        before_total = (
            None if (fb is None or before_total is None) else before_total + fb
        )
        after_total += fa

    if tomb is not None:  # every dir swapped: the purge is physical
        _, tomb_p = _hadoop_fs(spark, f"{path}/tombstones")
        fs.delete(tomb_p, True)

    meta = dict(meta, epoch=int(meta.get("epoch") or 0) + 1)
    _write_meta(spark, path, meta, "overwrite")
    return dict(meta, files_before=before_total, files_after=after_total)


def _compact_dir(
    spark: SparkSession,
    data: str,
    keys: list[str],
    num_partitions: int | None,
    transform=None,
    fold_one: bool = True,
) -> tuple[int | None, int]:
    """Stage-and-swap one data dir (the crash-safe core of
    ``compact_index``): stage into ``<dir>.compacting`` (one full
    write), then swap in with metadata-only delete+rename. A crash
    before the staged ``_SUCCESS`` leaves the live dir untouched
    (dead staging discarded next run); a crash inside the swap window
    is detected (staging committed) and the swap completes WITHOUT
    re-reading the possibly half-deleted data dir. ``transform``
    (optional) rewrites the relation during the stage — the lexical
    kind folds its signed partials (``fold_one=True`` → one
    dimension-sized output file) and the tombstone purge filters a
    corpus-sized relation in place (``fold_one=False`` → the normal
    key-clustered layout); either way it must be load-equivalent.
    Returns (files_before | None on crash-recovery, files_after)."""
    staging = f"{data}.compacting"
    fs, data_p = _hadoop_fs(spark, data)
    _, staging_p = _hadoop_fs(spark, staging)
    _, staged_ok = _hadoop_fs(spark, f"{staging}/_SUCCESS")

    if fs.exists(staging_p) and not fs.exists(staged_ok):
        # uncommitted leftover from a crash mid-stage: the live data
        # dir is intact — discard and compact normally
        fs.delete(staging_p, True)
    if not fs.exists(staged_ok):
        files_before = _count_part_files(spark, data)
        df = spark.read.parquet(data)
        if transform is not None:
            df = transform(df)
        if transform is not None and fold_one:
            # folded partials are dimension-sized — one file; coalesce
            # (not repartition) because the fold's own aggregation
            # already provides the shuffle boundary (r12)
            reparted = (
                df.coalesce(1).sortWithinPartitions(*keys)
                if keys
                else df.coalesce(1)
            )
        else:
            reparted = (
                df.repartition(num_partitions, *keys) if num_partitions
                else df.repartition(*keys)
            ).sortWithinPartitions(*keys)
        reparted.write.mode("overwrite").parquet(staging)
    else:
        files_before = None  # crash recovery: old layout already gone

    # the staged copy is complete and durable; swap it in with
    # metadata-only filesystem ops (both re-runnable after a crash)
    if fs.exists(data_p):
        fs.delete(data_p, True)
    if not fs.rename(staging_p, data_p):
        raise IOError(f"rename {staging} -> {data} failed during compaction")
    return files_before, _count_part_files(spark, data)


def restore_index(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    as_of: int | None = None,
    mode: str = "error",
    num_partitions: int | None = None,
) -> dict:
    """Materialize a SNAPSHOT of the index at ``src_path`` as a fresh
    artifact at ``dst_path`` — the rollback/clone verb completing the
    ``as_of`` time-travel story (Delta's RESTORE, made blue/green:
    the source stays read-only and keeps serving, like
    ``retrain_ivf_index``). ``as_of=None`` clones the CURRENT state —
    a physical copy with pending tombstones purged and partials
    folded, i.e. a compacted clone.

    The restored artifact is a NEW LIFE: base files only, in the
    kind's freshly-built clustered layout, with an empty ledger and
    no tombstones — its loads and probes are bit-exactly those of
    ``load_*(src_path, as_of=N)`` (parquet round-trips doubles
    exactly; the lexical df/stats folds are integer sums), and every
    lifecycle verb (append / ingest / delete / compact / snapshot)
    starts from scratch on it. History semantics are the loader's:
    ``as_of`` orders LEDGERED batches (stream epochs, deletes) by
    their recorded commit sequence and reaches back to the last
    compaction; un-ledgered batch appends fold into whatever state
    they were part of.

    At scale this is one clustered write of the snapshot's surviving
    rows (the same shuffle ``compact_index`` pays) plus
    dimension-sized sidecar writes — no driver-side row movement.
    Refuses ``dst_path == src_path``: an in-place restore would
    destroy the history it is reading (restore next to, then swap at
    the catalog level). ``mode`` follows Spark write semantics
    ('error' | 'overwrite'). Returns the metadata written."""
    from workhop2_etl_spark.operators.retrieval import _LEXICAL_KIND

    if src_path.rstrip("/") == dst_path.rstrip("/"):
        raise ValueError(
            f"restore_index target equals the source ({src_path}) — an "
            "in-place restore would destroy the history it reads; "
            "restore to a new path and swap at the catalog level"
        )
    meta = _read_meta_any_kind(
        spark, src_path,
        kinds=(_LSH_KIND, _IVF_POSTINGS_KIND, _LEXICAL_KIND),
        verb="restore",
    )
    _reset_lifecycle_state(spark, dst_path, mode)
    tomb = _read_tombstones(spark, src_path, as_of=as_of)

    if meta["kind"] == _LEXICAL_KIND:
        tf = _gated_or_raise(spark, src_path, "tf", as_of=as_of)
        if tomb is not None:
            tf = tf.join(F.broadcast(tomb), "doc_id", "left_anti")
        reparted = (
            tf.repartition(num_partitions, "term") if num_partitions
            else tf.repartition("term")
        )
        # signed per-epoch partials FOLD to one net record each — the
        # loader aggregates either way, so the fold is load-equivalent
        # (and exactly what compact_index writes). The three writes
        # read DIFFERENT source dirs (tf / df / stats) and write
        # different target dirs, so they submit from a thread pool
        # (guide §2.6, the r12 epoch/delete-write pattern): the
        # dimension-sized fold jobs back-fill the clustered tf
        # rewrite's straggler tail instead of queuing behind it.
        df_fold = (
            _gated_or_raise(spark, src_path, "df", as_of=as_of)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .filter(F.col("df") > 0)
            .coalesce(1)  # agg already shuffled — no second exchange
            .sortWithinPartitions("term")
        )
        stats_fold = (
            _gated_or_raise(spark, src_path, "stats", as_of=as_of)
            .agg(
                F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
                F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
            )
            .coalesce(1)  # one-row global aggregate
        )
        from concurrent.futures import ThreadPoolExecutor

        def _w(pair):
            rel, sub = pair
            rel.write.mode(mode).parquet(f"{dst_path}/{sub}")

        with ThreadPoolExecutor(max_workers=3) as pool:
            list(pool.map(_w, [
                (reparted.sortWithinPartitions("term"), "tf"),
                (df_fold, "df"),
                (stats_fold, "stats"),
            ]))
    else:
        rows = _gated_or_raise(spark, src_path, "index", as_of=as_of)
        if tomb is not None:
            rows = rows.join(F.broadcast(tomb), "id", "left_anti")
        keys = (
            ["table_id", "sig"] if meta["kind"] == _LSH_KIND
            else ["centroid_id"]
        )
        reparted = (
            rows.repartition(num_partitions, *keys) if num_partitions
            else rows.repartition(*keys)
        )
        reparted.sortWithinPartitions(*keys).write.mode(mode).parquet(
            f"{dst_path}/index"
        )
        if meta["kind"] == _IVF_POSTINGS_KIND:
            # the quantizer (and pq8 codebooks) ride the artifact —
            # the snapshot's postings are only meaningful under them
            centroids = _read_centroid_rows(
                spark, f"{src_path}/centroids", meta
            )
            _write_centroid_rows(
                spark, centroids, int(meta["dim"]), f"{dst_path}/centroids",
                mode,
            )
            if meta.get("store_dtype") == "pq8":
                codebooks = _read_codebook_rows(
                    spark, f"{src_path}/codebooks", meta
                )
                _write_codebook_rows(
                    spark, codebooks, int(meta["dim"]),
                    f"{dst_path}/codebooks", mode,
                )

    out = {k: v for k, v in meta.items() if k != "_codebooks"}
    out["epoch"] = 0
    _write_meta(spark, dst_path, out, mode)
    return out


def index_changes(
    spark: SparkSession,
    path: str,
    from_seq: int = 0,
    to_seq: int | None = None,
) -> DataFrame:
    """The CHANGELOG of ledgered mutations between two commit
    sequences — the CDC feed a downstream consumer (cache invalidator,
    replica, audit) tails instead of diffing snapshots: one row per
    (commit_seq, op, id) with ``op`` ∈ {'insert', 'delete'}, covering
    committed batches with ``from_seq < seq <= to_seq`` (``to_seq``
    defaults to the current metadata epoch). Events, not a net diff —
    a document inserted at seq 2 and deleted at seq 5 appears twice,
    exactly as it happened.

    Reads ONLY the selected batches' own files (each ledgered batch
    renames in under its batch-owned names), so the changelog costs
    the CHANGE volume, never a corpus scan — at 100 TB, tailing a day
    of epochs reads a day of epoch files. The id column carries the
    artifact's own id name ('doc_id' for the lexical kind, 'id' for
    the postings kinds); for the lexical kind an insert means the
    document contributed ≥1 posting (empty-token docs never enter the
    index, matching the loader's n_docs).

    Scope is the ledger's: stream-ingest epochs and delete batches.
    The base save and un-ledgered batch appends are the artifact's
    INITIAL state, not changes (start tailing from the seq you
    snapshotted); compaction folds batch files into base files, so —
    as with ``as_of`` — history reaches back to the last compaction,
    and asking past it raises rather than under-reporting. Legacy
    (pre-sequence, empty) markers carry no order and raise too:
    compact once to adopt the sequenced format going forward."""
    from workhop2_etl_spark.operators.retrieval import _LEXICAL_KIND

    meta = _read_meta_any_kind(
        spark, path,
        kinds=(_LSH_KIND, _IVF_POSTINGS_KIND, _LEXICAL_KIND),
        verb="read changes from",
    )
    lexical = meta["kind"] == _LEXICAL_KIND
    id_name = "doc_id" if lexical else "id"
    data_sub = "tf" if lexical else "index"
    if to_seq is None:
        to_seq = int(meta.get("epoch") or 0)
    if from_seq > to_seq:
        raise ValueError(
            f"index_changes needs from_seq <= to_seq, got "
            f"({from_seq}, {to_seq})"
        )

    fs, ledger_p = _hadoop_fs(spark, f"{path}/ledger")
    batches: list[tuple[int, str, str, str]] = []  # (seq, op, sub, prefix)
    if fs.exists(ledger_p):
        for st in fs.listStatus(ledger_p):
            name = st.getPath().getName()
            if name.startswith("epoch-"):
                op, sub = "insert", data_sub
                prefix = f"stream-{name[len('epoch-'):]}-"
            elif name.startswith("delete-"):
                op, sub = "delete", "tombstones"
                prefix = f"delete-{name[len('delete-'):]}-"
            else:  # e.g. the _stream-<digest> checkpoint binding
                continue
            seq = _marker_seq(fs, st.getPath())
            if seq is None:
                raise ValueError(
                    f"ledger marker {name} at {path} carries no commit "
                    "sequence (legacy pre-snapshot format or a crash "
                    "while writing the marker) — the changelog needs a "
                    "total order; compact the index and tail from there"
                )
            if from_seq < seq <= to_seq:
                batches.append((seq, op, sub, prefix))

    parts: list[DataFrame] = []
    for seq, op, sub, prefix in sorted(batches):
        _, d = _hadoop_fs(spark, f"{path}/{sub}")
        files = (
            [
                str(st.getPath())
                for st in fs.listStatus(d)
                if st.isFile() and st.getPath().getName().startswith(prefix)
            ]
            if fs.exists(d)
            else []
        )
        if not files:
            raise ValueError(
                f"commit seq {seq} at {path} has a ledger marker but no "
                f"{sub}/{prefix}* files — a compaction folded this batch "
                "into base files, so the changelog cannot reach it; tail "
                "from a sequence after the compaction"
            )
        ids = spark.read.parquet(*files).select(id_name).distinct()
        parts.append(
            ids.select(
                F.lit(seq).cast("long").alias("commit_seq"),
                F.lit(op).alias("op"),
                id_name,
            )
        )
    if not parts:
        rel = _gated_or_raise(spark, path, data_sub)
        return (
            rel.select(
                F.lit(0).cast("long").alias("commit_seq"),
                F.lit("").alias("op"),
                id_name,
            ).limit(0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_index(spark: SparkSession, path: str) -> DataFrame:
    """Consistency check (fsck) over a persisted index artifact — the
    invariants every lifecycle verb maintains, re-verified from the
    bytes on disk. One row:

    - ``kind`` / ``epoch`` — identity;
    - ``n_live`` — reader-visible rows (marker-gated, tombstones
      anti-joined): tf rows for the lexical kind, postings otherwise;
    - ``n_tombstones`` — pending logical deletes (compact when large);
    - ``n_uncommitted_batches`` — ledgered batches with renamed files
      but no marker (crashed or in-flight writers; readers don't see
      them — resume/replay to converge);
    - ``n_orphan_staging`` — leftover staging dirs (``delete.<b>``,
      ``ingest.epoch-*``, ``*.compacting``) from crashed writers:
      harmless to readers, swept or completed by their verb's replay;
    - ``consistent`` + ``problems`` — kind-specific invariants:
      lexical: the loader's folded df/stats partials must equal a
      recount over the visible tf rows (the additivity every append/
      delete/stream epoch preserves); IVF: every posting's cell must
      exist in the riding quantizer; LSH: every table_id within the
      recorded geometry.

    Cost is one corpus-relation aggregate plus dimension-sized reads —
    the honest fsck price; run it on the maintenance cadence, not per
    probe. Read-only, safe against a live artifact (it sees the last
    committed state, like any reader)."""
    from workhop2_etl_spark.operators.retrieval import _LEXICAL_KIND

    meta = _read_meta_any_kind(
        spark, path,
        kinds=(_LSH_KIND, _IVF_POSTINGS_KIND, _LEXICAL_KIND),
        verb="check",
    )
    lexical = meta["kind"] == _LEXICAL_KIND
    id_name = "doc_id" if lexical else "id"
    data_sub = "tf" if lexical else "index"
    problems: list[str] = []

    fs, root_p = _hadoop_fs(spark, path)
    # orphan staging dirs at the artifact root
    n_orphans = sum(
        1
        for st in fs.listStatus(root_p)
        if st.isDirectory()
        and (
            st.getPath().getName().startswith(("delete.", "ingest.epoch-"))
            or st.getPath().getName().endswith(".compacting")
        )
    )
    # ledgered batch files whose marker is absent
    uncommitted: set[str] = set()
    for sub in ("tf", "df", "stats", "index", "tombstones"):
        _, d = _hadoop_fs(spark, f"{path}/{sub}")
        if not fs.exists(d):
            continue
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if not (st.isFile() and name.endswith(".parquet")):
                continue
            for pfx, mk in (("delete-", "delete-"), ("stream-", "epoch-")):
                if name.startswith(pfx):
                    tag = name[len(pfx):-len(".parquet")].rsplit("-", 1)[0]
                    _, marker = _hadoop_fs(spark, f"{path}/ledger/{mk}{tag}")
                    if not fs.exists(marker):
                        uncommitted.add(f"{mk}{tag}")

    rel = _ledger_gated_parquet(spark, path, data_sub)
    tomb = _read_tombstones(spark, path)
    n_tomb = int(tomb.count()) if tomb is not None else 0
    if rel is None:
        n_live = 0
        problems.append(f"no committed data under {data_sub}/")
    else:
        live = (
            rel.join(F.broadcast(tomb), id_name, "left_anti")
            if tomb is not None else rel
        )
        n_live = int(live.count())
        if lexical:
            # the loader's folded partials vs a recount over visible tf
            got_df_rel = _ledger_gated_parquet(spark, path, "df")
            if got_df_rel is None:  # tampered: the loader would raise
                problems.append("df/ missing or every partial uncommitted")
            else:
                got_df = (
                    got_df_rel.groupBy("term")
                    .agg(F.sum("df").alias("df"))
                    .filter(F.col("df") > 0)
                )
                want_df = live.groupBy("term").agg(
                    F.count(F.lit(1)).alias("df")
                )
                bad_terms = int(
                    got_df.join(want_df, "term", "full_outer")
                    .filter(~got_df["df"].eqNullSafe(want_df["df"]))
                    .count()
                )
                if bad_terms:
                    problems.append(
                        f"df partials disagree with visible tf on "
                        f"{bad_terms} term(s)"
                    )
            got_stats_rel = _ledger_gated_parquet(spark, path, "stats")
            if got_stats_rel is None:
                problems.append("stats/ missing or every partial uncommitted")
            else:
                got_stats = got_stats_rel.agg(
                    F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
                    F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
                ).collect()[0]
                want_stats = (
                    live.groupBy(id_name)
                    .agg(F.min("dl").alias("__dl"))
                    .agg(
                        F.count(F.lit(1)).alias("n_docs"),
                        F.coalesce(F.sum("__dl"), F.lit(0)).alias("sum_dl"),
                    )
                    .collect()[0]
                )
                if (int(got_stats.n_docs), int(got_stats.sum_dl)) != (
                    int(want_stats.n_docs), int(want_stats.sum_dl)
                ):
                    problems.append(
                        f"stats partials sum to (n_docs={got_stats.n_docs}, "
                        f"sum_dl={got_stats.sum_dl}) but visible tf recounts "
                        f"to (n_docs={want_stats.n_docs}, "
                        f"sum_dl={want_stats.sum_dl})"
                    )
        elif meta["kind"] == _IVF_POSTINGS_KIND:
            try:
                cents = _read_centroid_rows(spark, f"{path}/centroids", meta)
            except Exception as ex:  # noqa: BLE001 — fsck reports, not raises
                problems.append(f"quantizer unreadable: {ex}")
                cents = []
            if meta.get("store_dtype") == "pq8":
                try:
                    _read_codebook_rows(spark, f"{path}/codebooks", meta)
                except Exception as ex:  # noqa: BLE001
                    problems.append(f"pq codebooks unreadable: {ex}")
            known = {cid for cid, _ in cents}
            orphan_cells = (
                [
                    r.centroid_id
                    for r in live.select("centroid_id").distinct().collect()
                    if r.centroid_id not in known
                ]
                if cents
                else []  # unreadable quantizer is already the headline
            )
            if orphan_cells:
                problems.append(
                    f"postings reference {len(orphan_cells)} cell(s) "
                    "absent from the riding quantizer "
                    f"(e.g. {sorted(orphan_cells)[:3]})"
                )
        else:  # LSH geometry
            nt = int(meta["num_tables"])
            bad = int(
                live.filter(
                    (F.col("table_id") < 0) | (F.col("table_id") >= nt)
                ).count()
            )
            if bad:
                problems.append(
                    f"{bad} signed row(s) outside the recorded "
                    f"num_tables={nt} geometry"
                )

    row = (
        str(meta["kind"]),
        int(meta.get("epoch") or 0),
        n_live,
        n_tomb,
        len(uncommitted),
        n_orphans,
        not problems,
        "; ".join(problems),
    )
    return spark.createDataFrame(
        [row],
        "kind string, epoch long, n_live long, n_tombstones long,"
        " n_uncommitted_batches long, n_orphan_staging long,"
        " consistent boolean, problems string",
    )


def _read_meta_any_kind(
    spark: SparkSession,
    path: str,
    kinds: tuple[str, ...] = (_LSH_KIND, _IVF_POSTINGS_KIND),
    verb: str = "compact",
) -> dict:
    """Metadata of whichever index kind lives at ``path``, restricted
    to ``kinds`` (compaction serves the two postings kinds; streaming
    ingest additionally accepts the lexical kind); refuses others —
    e.g. a centroids-only artifact is one file and has nothing to
    compact."""
    meta = _read_meta(spark, path, expect_kind="*")
    if meta["kind"] not in kinds:
        allowed = " and ".join(repr(k) for k in kinds)
        raise ValueError(
            f"artifact at {path} is kind={meta['kind']!r} — only "
            f"{allowed} indexes {verb}"
        )
    return meta


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _count_part_files(spark: SparkSession, path: str) -> int:
    """Data files in a parquet dir: everything except commit markers
    (_SUCCESS/_temporary) and checksum sidecars — stream-ingested
    files (streaming/index_stream.py) carry epoch-derived names, not
    the part- prefix, and must count too."""
    fs, hpath = _hadoop_fs(spark, path)
    return sum(
        1
        for st in fs.listStatus(hpath)
        if st.isFile()
        and not st.getPath().getName().startswith((".", "_"))
    )


def _delete_dir(spark: SparkSession, path: str) -> None:
    fs, hpath = _hadoop_fs(spark, path)
    fs.delete(hpath, True)


def probe_ivf_index(
    postings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    meta: dict,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors from a LOADED IVF index — identical
    results to ``topk_cosine_ivf`` over the original corpus with the
    same centroids (parquet round-trips doubles exactly; the pytest
    twin asserts row equality). Only the |Q| query vectors are
    assigned here (``nprobe`` is the recall knob, as in-session); the
    corpus side is the postings relation as loaded — never
    re-assigned, never re-normed. An ``int8`` artifact (metadata
    ``store_dtype``) rescans with dequantized vectors — scores are
    approximate within quantization error, cells are exact."""
    if int(meta["dim"]) and centroids and len(centroids[0][1]) != int(meta["dim"]):
        raise ValueError(
            f"centroids disagree with index metadata dim={meta['dim']}"
        )
    store_dtype = meta.get("store_dtype", "float64")
    if store_dtype == "pq8":
        one, _, kk, _ = _pq_codebook_relation(
            postings.sparkSession, meta["_codebooks"], int(meta["dim"])
        )
        postings = postings.crossJoin(F.broadcast(one))
        cvec = pq_decode(F.col("codes"), "__cb", kk)
    elif store_dtype == "int8":
        cvec = _dequant_int8(F.col("qvec"), F.col("scale"))
    else:
        cvec = F.col("vec")
    c = postings.select(
        F.col("id").alias("neighbor_id"),
        cvec.alias("__cvec"),
        F.col("centroid_id"),
        F.col("norm").alias("__cn"),
    )
    q = ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        ),
        centroids,
        id_col="query_id",
        vec_col="__qvec",
        nprobe=nprobe,
    ).withColumn("__qn", l2_norm(F.col("__qvec")))
    return _ivf_probe(c, q, k=k, round_digits=round_digits)


__all__ = [
    "FORMAT_VERSION",
    "save_lsh_index",
    "append_lsh_index",
    "load_lsh_index",
    "probe_lsh_index",
    "save_centroids",
    "load_centroids",
    "save_ivf_index",
    "append_ivf_index",
    "load_ivf_index",
    "probe_ivf_index",
    "compact_index",
    "delete_from_index",
    "restore_index",
    "index_changes",
    "check_index",
    "retrain_ivf_index",
    "ivf_index_stats",
    "lsh_index_stats",
]
