"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in
``kafka_streams_pipeline_spark/inventory/`` (and the operator
modules it imports); this file is the thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_pipeline_spark import inventory  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's materialized hourly view
    (geohash-cell × 1-hour window → count/sum/avg) over sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return inventory.QUERIES["q_hourly_view"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§7.3."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # driver-owned sessions may lack our session defaults;
            # these are all runtime-settable (session.py holds the
            # JVM-start-only ones)
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
            return fn(spark, sf_dir)

        return run

    # Dict order is the driver's check order and its correctness
    # window covers a prefix; rotate so never-yet-checked queries
    # come first (see inventory.driver_order).
    return {name: wrap(inventory.QUERIES[name]) for name in inventory.driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins of ``queries()`` (identical column aliases)."""
    return {
        name: inventory.ORACLES[name]
        for name in inventory.driver_order()
        if name in inventory.ORACLES
    }
