"""SparkSession factory with scale-appropriate defaults.

Single place where execution-relevant configuration lives, so tests,
bench.py and the driver entry all run the same engine profile.

Design notes (100 TB posture, tested on local[32]):

- UTC session timezone: the reference truncates timestamps in the
  JVM system zone (querying/QueryingController.java:240-249); we
  standardize on UTC (documented deviation, SURVEY.md §2.7 F3).
- AQE on: runtime coalescing of small shuffle partitions and skew
  join splitting — the knobs that let one plan survive sf0.001 → 100 TB.
- shuffle.partitions: 32 locally (matches core count); on a real
  cluster this is overridden (or left to AQE's initialPartitionNum).
- Arrow enabled: any pandas interchange (mapInPandas stubs,
  toPandas in tests) is batched, not per-row pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "kafka-streams-pipeline-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or
    ``*``. Configs that require a fresh JVM (driver memory) only take
    effect when no session exists yet; in long-lived test sessions the
    existing one is reused.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # driver fixtures use parquet TIMESTAMP(NANOS) (events.ts);
        # Spark 4 rejects it unless read as long (normalized in
        # sources/tables.py back to TimestampType at µs precision,
        # matching DuckDB's µs truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


# Rows-per-slice for driver-built frames: small enough that genuinely
# large label lists still pickle in parallel, large enough that a
# metadata frame is ONE task instead of defaultParallelism near-empty
# tasks (local[32] today; thousands on a real cluster).
_LOCAL_ROWS_PER_SLICE = 65_536


def local_rows_df(spark: SparkSession, rows, schema):
    """``createDataFrame`` for DRIVER-BUILT row lists with slice count
    derived from the data instead of ``defaultParallelism``.

    ``spark.createDataFrame(list)`` parallelizes into
    ``defaultParallelism`` slices regardless of size, so every tiny
    metadata/summary frame (store history, quantile literals, collected
    terminal rows) schedules 32 local tasks — or thousands of cluster
    tasks — to move a handful of rows. Every action on such a frame
    pays that scheduling tax again. Slices here scale with ``len(rows)``
    (1 per 64Ki rows), so metadata frames are one task while bounded-
    but-large lists (e.g. union-find label maps up to ~2M rows) keep
    parallel pickling."""
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    slices = max(1, min(
        spark.sparkContext.defaultParallelism,
        len(rows) // _LOCAL_ROWS_PER_SLICE + 1,
    ))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )
