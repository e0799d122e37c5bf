"""Streaming maintenance of a persisted ANN index — exactly-once.

The persisted index artifacts (operators/index_store.py) cover the
batch lifecycle: build once, append per ingest batch, probe many
sessions. At 100 TB the ingest side is usually a STREAM — embeddings
arrive continuously, and the index must stay current without a
rebuild and without double-indexing a replayed micro-batch. This
module runs ``append``-equivalent index work inside ``foreachBatch``
with an idempotence protocol that makes at-least-once delivery
EXACTLY-ONCE in effect:

1. **Ledger short-circuit** — each committed epoch leaves a marker
   file under ``<path>/ledger/``; a replayed epoch that already
   committed returns immediately (after sweeping any staging
   leftovers).
2. **Staged write** — the batch's postings/signature rows are
   assigned/signed under the artifact's OWN stored parameters (same
   guarantee as ``append_*_index``) and written to a per-epoch
   staging dir with ``mode=overwrite``, so a replay of a half-staged
   epoch starts clean.
3. **Epoch-owned renames** — any live files a previous attempt of
   THIS epoch already moved in are deleted first (each epoch's files
   carry its id in their names, so an epoch only ever touches its
   own), then the staged files rename into the live ``<path>/index``
   dir. A crash at any point between deletes or renames converges on
   replay — the epoch's live file set is rebuilt from the fresh
   staging whole-or-not-at-all, with no reliance on the replay
   reproducing the same partitioning. (This is why duplicates never
   reach ``_ivf_probe``, whose top-k window would count a
   double-indexed neighbor twice.)
4. **Marker, then sweep** — the ledger marker is created only after
   every staged file is in place; staging is deleted after the
   marker, so the worst crash leaves a swept-on-replay leftover.

Contracts: single writer (don't run two streams or a concurrent
``append_*_index``/``compact_index`` against one artifact — stop the
stream before maintenance, as with any non-transactional table
format); the source must replay an epoch with the same data (file
sources with a checkpoint do — the contract Structured Streaming
itself requires for end-to-end exactly-once sinks). All I/O is
Spark parquet + Hadoop FileSystem calls, so the artifact can live on
local disk, HDFS, or an object store with a rename-capable
committer.

Reference parity: the reference ETL has no streaming; this extends
the engine per the build brief, shaped after the public pattern of
idempotent foreachBatch sinks (batch-id ledger, as in the Spark docs
and this repo's streaming/jdbc_sink.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from workhop2_etl_spark.operators.index_store import (
    _IVF_POSTINGS_KIND,
    _LSH_KIND,
    _commit_marker,
    _hadoop_fs,
    _read_centroid_rows,
    _read_meta_any_kind,
    _write_ivf_postings,
    _write_meta,
    _write_signed,
)
from workhop2_etl_spark.operators.retrieval import _LEXICAL_KIND

_INGEST_KINDS = (_LSH_KIND, _IVF_POSTINGS_KIND, _LEXICAL_KIND)


def ingest_epoch(
    spark: SparkSession,
    batch: DataFrame,
    epoch_id: int,
    index_path: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
    partitions_per_epoch: int = 4,
) -> str:
    """Index one micro-batch into the artifact at ``index_path``
    under the exactly-once protocol (module docstring). Returns
    ``'committed'`` or ``'skipped'`` (epoch already in the ledger).
    Exposed separately from the stream driver so tests (and manual
    backfills) can drive replay semantics directly.

    Artifact kinds: the ANN kinds stage into one flat dir that
    renames into ``index/``; the lexical (BM25) kind stages the
    epoch's tf rows PLUS its df/stats partials and renames each into
    its own dir (``tf/`` / ``df/`` / ``stats/``) — the partials are
    additive over disjoint epochs, so the loader's sum-of-partials
    stays the single-shot aggregate (operators/retrieval.py). For a
    lexical artifact the batch must already carry the tokenized
    column (``vec_col`` names it; default contract 'toks').

    Reader atomicity (r12): the epoch's renamed files are hidden from
    every loader until the ledger marker lands
    (index_store._ledger_gated_parquet) — a reader racing these
    renames, or loading after a mid-rename crash, sees the whole
    epoch or none of it (never tf rows without their df/stats
    partials), and a delete derives its victims from COMMITTED rows
    only."""
    fs, marker = _hadoop_fs(spark, f"{index_path}/ledger/epoch-{epoch_id:012d}")
    staging = f"{index_path}/ingest.epoch-{epoch_id:012d}"
    _, staging_p = _hadoop_fs(spark, staging)
    if fs.exists(marker):
        if fs.exists(staging_p):  # crash between marker and sweep
            fs.delete(staging_p, True)
        return "skipped"

    meta = _read_meta_any_kind(
        spark, index_path, kinds=_INGEST_KINDS, verb="stream-ingest"
    )
    # (staging subpath, live dir) pairs to rename after the stage
    if meta["kind"] == _LSH_KIND:
        _write_signed(
            batch,
            index_path,
            int(meta["dim"]),
            int(meta["num_planes"]),
            int(meta["num_tables"]),
            id_col or meta["id_col"],
            vec_col,
            meta.get("sig_kernel", "expr"),
            "overwrite",
            data_dir=staging,
            num_partitions=partitions_per_epoch,
            store_dtype=meta.get("store_dtype", "float64"),
        )
        moves = [(staging, f"{index_path}/index")]
    elif meta["kind"] == _LEXICAL_KIND:
        from workhop2_etl_spark.operators.retrieval import (
            _write_lexical_epoch,
        )

        # the artifact's own metadata names its token column (recorded
        # at save time, r11) — caller arguments can confirm but never
        # silently remap it; pre-r11 artifacts without the field fall
        # back to the old convention (vec_col unless it still holds
        # the ANN default, then 'toks')
        tok_col = meta.get("tok_col")
        if tok_col is None:
            tok_col = vec_col if vec_col != "embedding" else "toks"
        elif vec_col not in ("embedding", tok_col):
            raise ValueError(
                f"lexical index at {index_path} records "
                f"tok_col={tok_col!r} in its metadata, but the stream "
                f"was started with vec_col={vec_col!r} — the artifact's "
                "recorded token column wins; drop the vec_col override "
                "or rebuild the artifact under the new column name"
            )
        if tok_col not in batch.columns:
            raise ValueError(
                f"lexical ingest into {index_path} expects token column "
                f"{tok_col!r} (recorded in the artifact metadata at save "
                f"time), but the prepared micro-batch has columns "
                f"{list(batch.columns)} — fix the stream's prepare hook "
                "to produce that column"
            )
        _write_lexical_epoch(
            batch, staging, id_col or meta["id_col"], tok_col, "overwrite",
            num_partitions=partitions_per_epoch,
        )
        moves = [
            (f"{staging}/{sub}", f"{index_path}/{sub}")
            for sub in ("tf", "df", "stats")
        ]
    else:  # _IVF_POSTINGS_KIND (guaranteed by _read_meta_any_kind)
        from workhop2_etl_spark.operators.index_store import _read_codebook_rows

        centroids = _read_centroid_rows(spark, f"{index_path}/centroids", meta)
        store_dtype = meta.get("store_dtype", "float64")
        _write_ivf_postings(
            batch,
            index_path,
            centroids,
            id_col or meta["id_col"],
            vec_col,
            meta.get("assign_kernel", "expr"),
            "overwrite",
            data_dir=staging,
            num_partitions=partitions_per_epoch,
            store_dtype=store_dtype,
            codebooks=(
                _read_codebook_rows(spark, f"{index_path}/codebooks", meta)
                if store_dtype == "pq8"
                else None
            ),
            dim=int(meta["dim"]),
        )
        moves = [(staging, f"{index_path}/index")]

    # a previous attempt of this epoch may have moved files in before
    # crashing; remove them so the live set is rebuilt whole from the
    # fresh staging (epoch id in the name scopes the delete to this
    # epoch's own files)
    prefix = f"stream-{epoch_id:012d}-"
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
        for st in fs.listStatus(dst_dir_p):
            if st.getPath().getName().startswith(prefix):
                fs.delete(st.getPath(), False)
        for i, src in enumerate(staged):
            _, dst = _hadoop_fs(
                spark, f"{dst_dir}/{prefix}{i:05d}.parquet"
            )
            if not fs.rename(src, dst):
                raise IOError(
                    f"rename {src} -> {dst} failed during epoch "
                    f"{epoch_id} index ingest"
                )

    # commit point: marker first (replays now short-circuit; the
    # marker records the commit sequence for as_of snapshot reads),
    # then sweep staging and bump the epoch counter to that sequence
    fs.mkdirs(marker.getParent())
    seq = int(meta.get("epoch") or 0) + 1
    _commit_marker(fs, marker, seq)
    fs.delete(staging_p, True)
    _write_meta(spark, index_path, dict(meta, epoch=seq), "overwrite")
    return "committed"


def _canon_checkpoint(checkpoint_dir: str) -> str:
    """Canonical identity of a checkpoint path for the ledger binding
    digest. The binding guards against a DIFFERENT checkpoint (whose
    batch ids restart at 0 and collide with committed ledger epochs);
    the SAME checkpoint referenced through an equivalent-but-unequal
    string (trailing slash, relative vs absolute, a symlinked parent)
    must therefore digest identically, or the resume raises a false
    'bound to a different checkpoint' error that pushes users toward
    adopt_ledger=True and weakens the guard. Remote URIs (hdfs://,
    s3a://) only lose trailing slashes — resolving them needs the
    remote filesystem; local paths — bare or spelled as file: URIs,
    which Spark treats identically — resolve symlinks and relativity
    via realpath."""
    import os

    if checkpoint_dir.startswith("file:"):
        # file:///p, file:/p (and the rare file://host-less //p) all
        # name the local path /p to Hadoop's local filesystem
        return os.path.realpath("/" + checkpoint_dir[5:].lstrip("/"))
    if "://" in checkpoint_dir:
        return checkpoint_dir.rstrip("/") or checkpoint_dir
    return os.path.realpath(checkpoint_dir)


def stream_index_ingest(
    spark: SparkSession,
    stream_dir: str,
    schema,
    index_path: str,
    checkpoint_dir: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
    partitions_per_epoch: int = 4,
    max_files_per_trigger: int = 1,
    adopt_ledger: bool = False,
    prepare=None,
) -> None:
    """Drain every file currently in ``stream_dir`` (availableNow)
    into the index artifact at ``index_path``, one exactly-once
    ``ingest_epoch`` per micro-batch. The artifact must already exist
    (created by ``save_lsh_index`` / ``save_ivf_index``, possibly on
    a seed corpus) — its stored metadata, not caller arguments,
    decides the index kind and geometry, so a stream can never sign
    or assign a batch under drifted parameters.

    The ledger is only meaningful together with the stream's
    CHECKPOINT: epoch ids are the checkpoint's batch ids, so a fresh
    checkpoint restarts them at 0 and every new batch would collide
    with an already-committed ledger entry — silently SKIPPED, data
    lost. The artifact therefore records which checkpoint feeds it
    (``ledger/_stream-<digest>``); resuming with the same checkpoint
    is the supported path, while a DIFFERENT checkpoint against a
    non-empty ledger raises before any batch runs. Pass
    ``adopt_ledger=True`` only for deliberate migrations (new
    checkpoint whose sources are known not to replay indexed data) —
    it re-binds the ledger to the new checkpoint.

    ``prepare`` (optional ``DataFrame -> DataFrame``) transforms each
    micro-batch before indexing — e.g. tokenizing raw document text
    into the ``toks`` column a lexical artifact ingests. It must be
    deterministic (a replayed epoch re-prepares the same rows)."""
    _read_meta_any_kind(  # fail fast before starting
        spark, index_path, kinds=_INGEST_KINDS, verb="stream-ingest"
    )

    import hashlib

    digest = hashlib.md5(_canon_checkpoint(checkpoint_dir).encode()).hexdigest()[:12]
    # pre-canonicalization ledgers (bound before r11) carry
    # md5(raw path) markers; a resume that spells the SAME checkpoint
    # non-canonically (relative prefix, trailing slash, file: URI,
    # symlinked parent) must not trip the different-checkpoint error.
    # Accept the raw-spelling legacy marker and migrate: the
    # canonical marker is written alongside below, so the window is
    # one resume. (A legacy binding made with an already-canonical
    # string has raw == canon and matches the current digest anyway.)
    legacy_names = {
        f"_stream-{hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]}"
    }
    fs, ledger_p = _hadoop_fs(spark, f"{index_path}/ledger")
    _, bind_p = _hadoop_fs(spark, f"{index_path}/ledger/_stream-{digest}")
    if fs.exists(ledger_p):
        entries = [
            st.getPath().getName() for st in fs.listStatus(ledger_p)
        ]
        has_epochs = any(e.startswith("epoch-") for e in entries)
        legacy_bound = any(e in legacy_names for e in entries)
        bound_elsewhere = any(
            e.startswith("_stream-")
            and e != f"_stream-{digest}"
            and e not in legacy_names
            for e in entries
        )
        if has_epochs and legacy_bound and not fs.exists(bind_p):
            # one-time migration: same checkpoint under its pre-r11
            # raw-string digest — adopt it as the canonical binding
            # (the canonical marker is created below; the legacy
            # marker stays, harmless, so older code can still resume)
            pass
        elif has_epochs and not fs.exists(bind_p):
            if not adopt_ledger:
                raise ValueError(
                    f"index at {index_path} has a committed ingest ledger "
                    f"bound to a different checkpoint ({'; '.join(sorted(e for e in entries if e.startswith('_stream-'))) or 'an untracked one'}). "
                    f"A new checkpoint restarts batch ids at 0, so its "
                    f"batches would collide with committed ledger epochs "
                    f"and be silently skipped. Resume with the original "
                    f"checkpoint (path identity is canonicalized — "
                    f"trailing slashes, relative prefixes and symlinks "
                    f"are already ignored, so this really is a different "
                    f"checkpoint), or pass adopt_ledger=True to re-bind "
                    f"after verifying the new source does not replay "
                    f"already-indexed data"
                )
            for e in entries:  # deliberate migration: re-bind
                if e.startswith("_stream-"):
                    _, old = _hadoop_fs(spark, f"{index_path}/ledger/{e}")
                    fs.delete(old, False)
        elif bound_elsewhere and not has_epochs:
            # stale binding with no epochs: nothing committed, safe to
            # re-bind silently
            for e in entries:
                if e.startswith("_stream-"):
                    _, old = _hadoop_fs(spark, f"{index_path}/ledger/{e}")
                    fs.delete(old, False)
    fs.mkdirs(ledger_p)
    fs.createNewFile(bind_p)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if prepare is not None:
            batch_df = prepare(batch_df)
        ingest_epoch(
            batch_df.sparkSession,
            batch_df,
            epoch_id,
            index_path,
            id_col=id_col,
            vec_col=vec_col,
            partitions_per_epoch=partitions_per_epoch,
        )

    (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


__all__ = ["ingest_epoch", "stream_index_ingest"]
