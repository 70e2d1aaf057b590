"""Sinks: Kafka record encode (S3), materialized view persistence (S4).

Reference: JsonPOJOSerializer (POJO→bytes,
ingestion/util/serdes/JsonPOJOSerializer.java:40-49) and the
materialized WindowStore (ingestion/KafkaStreamsAggregator.java:103-105).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_kafka_records(
    readings: DataFrame, key_col: str = "sensorId"
) -> DataFrame:
    """Encode reading rows to the Kafka wire shape (key, value) —
    value is the reference's JSON record format (README.md:11-17).
    Feed to ``df.write.format('kafka')`` / ``writeStream`` when a
    broker is configured."""
    return readings.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(
            F.struct("timestamp", "sensorId", "geohash", "tempVal", "tempUnit")
        ).alias("value"),
    )


def write_view(view: DataFrame, view_dir: str, mode: str = "overwrite") -> None:
    """Materialize the hourly view as parquet partitioned by window
    date — the batch twin of the streaming foreachBatch upsert (S4).

    Partitioning by ws_date gives history/snapshot queries partition
    pruning on their time predicates; within a partition, parquet
    min/max stats skip on gh (rows arrive sorted by the groupBy's
    hash — sortWithinPartitions makes the skipping reliable)."""
    (
        view.withColumn("ws_date", F.to_date("window_start"))
        .repartition("ws_date")
        .sortWithinPartitions("gh", "window_start")
        .write.mode(mode)
        .partitionBy("ws_date")
        .parquet(view_dir)
    )


def compact_view(spark: SparkSession, view_dir: str) -> int:
    """Rewrite the view store with one sorted file per ws_date
    partition and return the file count removed.

    Streaming upserts (streaming/pipeline.upsert_view_batch) leave one
    file set per touched micro-batch — the classic small-files problem:
    at a 10 s trigger that's ~8.6k file sets/day/partition, and scan
    cost becomes file-open bound. Periodic compaction (this, or
    OPTIMIZE on Delta/Iceberg) restores the one-sorted-file layout
    that gives parquet min/max skipping on gh its power. Writes to a
    sibling directory then swaps, so a crash never leaves a partial
    store."""
    import shutil

    view = spark.read.parquet(view_dir)
    before = sum(
        1
        for root, _, files in os.walk(view_dir)
        for f in files
        if f.endswith(".parquet")
    )
    tmp_dir = view_dir.rstrip("/") + ".compacting"
    (
        view.repartition("ws_date")
        .sortWithinPartitions("gh", "window_start")
        .write.mode("overwrite")
        .partitionBy("ws_date")
        .parquet(tmp_dir)
    )
    old_dir = view_dir.rstrip("/") + ".old"
    os.rename(view_dir, old_dir)
    os.rename(tmp_dir, view_dir)
    shutil.rmtree(old_dir)
    after = sum(
        1
        for root, _, files in os.walk(view_dir)
        for f in files
        if f.endswith(".parquet")
    )
    return before - after


def read_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """Load a materialized view for the query family. The ws_date
    partition column is KEPT: Spark does not infer ws_date bounds
    from window_start predicates, so operators/queries adds the
    derived partition predicate itself whenever the column is present
    (that's what turns a time-range query into a pruned scan)."""
    return spark.read.parquet(view_dir).select(
        "gh", "window_start", "count", "sum", "avg", "ws_date"
    )
