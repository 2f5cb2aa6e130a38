"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM with N threads (tests use ``local[32]``); the
configs below are chosen so the *same* logical plans survive a 1000-executor
cluster at 100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast conversion from runtime stats),
- shuffle partitions sized for the local box but overridable via
  ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` (on a real cluster you'd set this to
  2-3x total cores or rely on AQE coalescing from a high initial value),
- Arrow enabled for the Pandas-UDF slow paths,
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _default_driver_mem() -> str:
    """Half of MemAvailable, clamped to [4g, 24g] (falls back to 8g when
    /proc/meminfo is unreadable, e.g. non-Linux)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(4, min(24, avail_gb // 2))}g"
    except OSError:
        pass
    return "8g"


def get_spark(app_name: str = "modware_loader_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Any config already set by an outer harness (e.g. the driver passing its
    own session) wins — ``getOrCreate`` does not override a live session.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # One JVM hosts driver + 32 executor threads locally; checkpoint
        # blocks from iterative/self-join queries accumulate across a long
        # session, so size the heap for the whole bench run, not one query
        # (late-run GC thrash showed up as 2-4x per-query inflation at 8g).
        # Sized from the host's available RAM (half, clamped to [4g, 24g])
        # so small hosts don't get OOM-killed; SPARK_GRAFT_DRIVER_MEM wins.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem(),
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TABLES = (
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


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver's synthetic star schema as DataFrames + temp views.

    Column pruning / predicate pushdown reach the parquet scan because these
    are plain ``spark.read.parquet`` relations (check ``PushedFilters`` /
    ``ReadSchema`` in ``.explain("formatted")``).
    """
    # Plans are reusable: cache per (session, dir) so back-to-back queries
    # skip 10 parquet footer reads + view registrations each.
    cache_key = (id(spark), sf_dir)
    cached = _TABLE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    # events.ts has shipped as either parquet TIMESTAMP(NANOS) (older testdata
    # generations) or TIMESTAMP(MICROS). Spark's reader rejects nanos unless
    # nanosAsLong is set, in which case ts arrives as BIGINT nanos and we
    # rebuild a micros timestamp (DuckDB truncates nanos→micros the same way,
    # so the oracle sees identical values). Micros parquet arrives directly as
    # a timestamp type — normalize to TIMESTAMP_NTZ and leave values alone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events":
                ts_type = dict(df.dtypes).get("ts")
                if ts_type in ("bigint", "long"):
                    df = df.withColumn(
                        "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
                    )
                elif ts_type == "timestamp":
                    df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
                # timestamp_ntz already: leave as-is.
            df.createOrReplaceTempView(name)
            out[name] = df
    _TABLE_CACHE[cache_key] = out
    return out


_TABLE_CACHE: dict = {}


def table_fingerprint(sf_dir: str, table: str) -> tuple:
    """Data-identity key for in-process training/index memos: (path,
    mtime_ns, size) of every parquet part under ``<sf_dir>/<table>.
    parquet`` (plain file or Spark-written directory). Deterministic
    artifacts derived from the table (classifier weights, k-means
    centroids, PQ codebooks) may be reused within one process ONLY
    while this fingerprint is unchanged — keying on the path alone
    serves stale artifacts after in-process dataset regeneration
    (the r10 ADVICE on ``_TRAINED_LOGREG``)."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(p):
        parts = sorted(
            os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
        )
    else:
        parts = [p]
    fp: list = [sf_dir, table]
    for part in parts:
        try:
            st = os.stat(part)
            fp.append((part, st.st_mtime_ns, st.st_size))
        except OSError:
            fp.append((part, None, None))
    return tuple(fp)
