"""SparkSession factory + testdata loaders.

Local runs use ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
same builder settings are what we would ship on a real cluster:
AQE on (runtime coalescing, skew-join splitting, dynamic broadcast),
shuffle partitions sized to the parallelism rather than the 200
default, Arrow enabled for any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates under /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def get_spark(app_name: str = "workhop2_etl_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the local parallelism — at
    cluster scale this would instead be sized to total cores (AQE
    coalesces small post-shuffle partitions either way, so erring
    high is safe).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # Shuffle/spill scratch space: the root disk on CI-class boxes has
    # very slow fsync (a trivial 600k-row shuffle measured 14.7s vs
    # 0.6s on tmpfs). A real cluster puts local.dir on NVMe; tmpfs is
    # the local-mode equivalent. Falls back to the default if absent.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(cpus) if cpus.isdigit() else n
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Let AQE size post-shuffle partitions purely by bytes. The
        # default parallelismFirst=true refuses to coalesce below the
        # cluster parallelism, which at small scale leaves dozens of
        # near-empty tasks per shuffle (measured 11.6s → 2.5s on a
        # 600k-row distinct). At 100 TB the advisory size, not the
        # partition count, is the thing to tune.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # spark.sql.files.maxPartitionBytes stays at the 128 MB
        # default: a controlled best-of-3 A/B at sf0.1 (single ~11 MB
        # files) showed no measurable win from 16 MB splits — the
        # scans here are row-group-bound, not split-bound — and at
        # production scale 128-256 MB splits are the right answer.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # bounded-collect guards (`.limit(cap+1).collect()` on small
        # relations) otherwise run CollectLimit's incremental probe —
        # one job at 1 partition, then 4×, 16×... — costing 2-3 extra
        # job launches per guard. Sized to the parallelism (like
        # shuffle.partitions above), one job scans all partitions at
        # once; r12 optimization, scale-adaptive by construction.
        .config("spark.sql.limit.initialNumPartitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffled-hash-vs-sort-merge was A/B'd both ways in r12 and
        # REJECTED: the static knob (preferSortMergeJoin=false) never
        # fired (the surviving SMJs sit on subplans with no usable
        # size estimates), and AQE's runtime conversion
        # (maxShuffledHashJoinLocalMapThreshold=64m) measurably HURT
        # (j3 1.1s → 2.3s, g6 2.7s → 6.7s min-of-4 back-to-back) —
        # the sort-merge sorts are cheaper here than per-partition
        # hash-map builds. Defaults kept deliberately.
        .config("spark.sql.session.timeZone", "UTC")
        # managed-table home for bucketed layouts (sources/bucketing.py);
        # a cluster deployment points this at the metastore warehouse
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/w2e_warehouse"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (lazy scan; column
    pruning + predicate pushdown reach the footer via Catalyst).

    `events.ts` has shipped in two physical spellings across driver
    testdata generations: TIMESTAMP(NANOS) — which the Spark parquet
    reader rejects, so it is read as raw nanos (legacy conf,
    runtime-settable) and floored to microseconds, the same
    `epoch_ns // 1000` convention the oracles use — and plain
    TIMESTAMP(MICROS), which Spark reads natively. Both normalize to
    TIMESTAMP_NTZ here so downstream code sees one type.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    if _events_ts_is_nanos(spark, path):
        # The legacy conf is consulted at EXECUTION time (per-file
        # footer conversion), not just at analysis, so it cannot be
        # restored while an events frame is alive; setting it only
        # when the footer actually spells TIMESTAMP(NANOS) keeps the
        # common micros generation from silently changing how every
        # other parquet read in the session decodes nanos columns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        # integer `div`, not `/`: ns epochs (~1.7e18) overflow double's
        # 53-bit mantissa, so float division would corrupt microseconds.
        ts = _ntz_of_epoch_micros("ts div 1000")
    else:
        raw = spark.read.parquet(path)
        if isinstance(raw.schema["ts"].dataType, TimestampNTZType):
            # parquet isAdjustedToUTC=false read natively as NTZ
            # (inferTimestampNTZ) — already session-tz-independent
            ts = F.col("ts")
        else:
            # Read as an instant (a session with inferTimestampNTZ
            # off, or an adjusted-to-UTC generation). A plain
            # CAST(... AS TIMESTAMP_NTZ) renders the instant in the
            # SESSION timezone — under a non-UTC session every date
            # bucket downstream would shift. unix_micros is
            # tz-independent, so rebuild the UTC wall-clock exactly.
            ts = _ntz_of_epoch_micros("unix_micros(ts)")
    return raw.withColumn("ts", ts)


def _ntz_of_epoch_micros(us_expr: str):
    """TIMESTAMP_NTZ carrying the UTC wall-clock of an epoch-micros
    BIGINT expression, independent of ``spark.sql.session.timeZone``:
    pure interval arithmetic from the NTZ epoch, never an
    instant→wall cast (which renders in the session timezone). The
    sub-day remainder is < 8.64e10 µs, so the double seconds argument
    of make_dt_interval is exact to well under half a microsecond."""
    from pyspark.sql import functions as F

    return F.expr(
        "make_timestamp_ntz(1970, 1, 1, 0, 0, 0) + make_dt_interval("
        f"CAST(({us_expr}) DIV 86400000000 AS INT), 0, 0, "
        f"CAST(({us_expr}) % 86400000000 AS DOUBLE) / 1000000.0)"
    )


def _local_parquet_part(path: str) -> str | None:
    """Resolve ``path`` to a driver-local parquet part file, or None
    when the path is remote (``hdfs:``/``s3a:``/...) or a partitioned
    directory with no top-level part files — those take the
    Spark-native fallback probe instead."""
    scheme, sep, rest = path.partition("://")
    if sep:
        if scheme != "file":
            return None
        path = rest if rest.startswith("/") else "/" + rest
    elif path.startswith("file:"):
        path = path[len("file:"):]
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if parts:
            return os.path.join(path, parts[0])
    return None


def _events_ts_is_nanos(spark: SparkSession, path: str) -> bool:
    """True when this testdata generation ships events.ts as
    TIMESTAMP(NANOS) — which Spark's reader rejects without the
    legacy nanos-as-long conf.

    Fast path: a driver-side pyarrow footer probe on a local part
    file (pyarrow is a driver-only dependency of this fast path).
    Fallback — remote schemes, partitioned layouts, or pyarrow
    absent — probes through Spark itself: with the legacy conf set,
    schema ANALYSIS (footer-only, no job) reports a nanos column as
    LongType and a real timestamp as TimestampType; the conf is
    restored before returning, so alive frames from earlier loads
    keep decoding the way they were planned."""
    probe = _local_parquet_part(path)
    if probe is not None:
        try:
            import pyarrow.parquet as pq

            return str(pq.read_schema(probe).field("ts").type) == "timestamp[ns]"
        except ImportError:
            pass  # fall through to the Spark-native probe
        except (KeyError, OSError):
            return False
    from pyspark.sql.types import LongType

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        schema = spark.read.parquet(path).schema
        if "ts" not in schema.names:
            return False
        return isinstance(schema["ts"].dataType, LongType)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All testdata tables as a dict of lazy DataFrames."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
