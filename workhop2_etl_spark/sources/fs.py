"""Storage-abstracted directory operations via the Hadoop FileSystem
API (``spark._jvm.org.apache.hadoop.fs``).

The epoch-partitioned sinks (operators/incremental.py,
streaming/dedup_stream.py) need list / exists / rename / delete on the
table directory. Driver-local ``os.*`` only works when the table lives
on the driver's local disk; at 100 TB the table is on HDFS / S3 /
ABFS, where the same operations must go through the Hadoop FileSystem
for the path's scheme. These helpers resolve the filesystem from the
path URI and the session's Hadoop configuration, so a plain local
path, a ``file:/`` URI, and an ``hdfs://`` / ``s3a://`` URI all take
the same code path.

Semantics note for object stores: ``rename`` is atomic on HDFS and
local file systems but is copy+delete on S3A. The commit protocols in
incremental.py are therefore designed so that *readers never depend on
rename atomicity* — every intermediate state (tmp dir present, old
dirs not yet deleted) still reads correctly, because readers ignore
underscore-prefixed dirs and superseded epoch/base generations.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names of a directory ([] if it does not exist)."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def list_child_dirs(spark: SparkSession, path: str) -> list[str]:
    """Names of child DIRECTORIES of ``path`` ([] if absent)."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory()
    ]


def has_data(spark: SparkSession, path: str) -> bool:
    """True when the directory exists and has any non-hidden child
    (Spark convention: names starting with ``_`` or ``.`` are
    metadata, not data)."""
    return any(
        not n.startswith(("_", ".")) for n in list_names(spark, path)
    )


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, s = _fs_and_path(spark, src)
    _, d = _fs_and_path(spark, dst)
    return bool(fs.rename(s, d))


def rename_or_raise(spark: SparkSession, src: str, dst: str) -> None:
    """Publish-by-rename that FAILS LOUDLY: Hadoop's
    ``FileSystem.rename`` signals most failures (dst exists, src
    missing, object-store copy error) by returning false, not by
    throwing. A publish step that ignores that false and proceeds to
    delete its inputs destroys the only copy of the data — so
    commit-path renames must go through this wrapper."""
    if not rename(spark, src, dst):
        raise IOError(f"rename failed (publish aborted): {src} -> {dst}")


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path`` (recursive), via the
    FileSystem's content summary — works on local, HDFS, and
    object-store paths alike (an ``os.walk`` would silently report 0
    for any non-local URI)."""
    fs, p = _fs_and_path(spark, path)
    return int(fs.getContentSummary(p).getLength())


def join(base: str, *parts: str) -> str:
    """URI-safe path join (os.path.join breaks ``scheme://`` paths on
    some platforms; Hadoop paths always use '/')."""
    out = base.rstrip("/")
    for part in parts:
        out = out + "/" + part.strip("/")
    return out
