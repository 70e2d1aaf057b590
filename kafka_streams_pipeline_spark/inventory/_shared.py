"""Helpers shared by every inventory domain module: fixture table
loading, the exact-integer money sum convention, and the standing
materialized view (built once per (process, fixture dir) and served
from a ws_date-partitioned parquet store) with its DuckDB CTE twin.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_pipeline_spark.operators.view import build_view
from kafka_streams_pipeline_spark.sources.readings import (
    readings_from_events,
    readings_from_events_sql,
)
from kafka_streams_pipeline_spark.sources.sinks import read_view, write_view
from kafka_streams_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents_sum(expr: Column, alias: str) -> Column:
    """Order-independent money sum: round each term to cents, sum as
    exact integers, divide once. Double summation is non-associative
    and Spark's partial-agg order is nondeterministic, so raw
    sum(double) can drift past round(·, 6) between engines (and
    between runs) on large groups; integer summation cannot. The
    DuckDB twin is sum(CAST(round(expr * 100) AS BIGINT)) / 100.0."""
    return (F.sum(F.round(expr * 100).cast("long")) / F.lit(100.0)).alias(alias)


# The standing materialized view — the reference serves every
# history/snapshot query from a continuously-maintained WindowStore
# (ingestion/KafkaStreamsAggregator.java:103-105), never from raw
# records. Mirror that: build + persist the view once per (process,
# fixture dir), then all serving queries read the ws_date-partitioned
# parquet store (partition-pruned time predicates, min/max skipping on
# gh). At 100 TB this is THE load-bearing design choice: query cost is
# O(cells × hours in range), independent of raw-event volume.
_VIEW_STORE: dict[str, str] = {}


def _served_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = os.path.abspath(sf_dir)
    path = _VIEW_STORE.get(key)
    if path is None or not os.path.isdir(path):
        path = os.path.join(
            tempfile.mkdtemp(prefix="kspipeline-view-"), "view"
        )
        write_view(
            build_view(readings_from_events(_t(spark, sf_dir, "events"))), path
        )
        _VIEW_STORE[key] = path
    return read_view(spark, path)


# SQL CTE for the materialized view over the sensor-shaped readings
# derived from `events` (FIXTURES.md §2.4) — the oracle twin of
# build_view(readings_from_events(events)).
VIEW_CTE = f"""
WITH readings AS ({readings_from_events_sql()}),
v AS (
    SELECT substring(geohash, 1, 6)  AS gh,
           date_trunc('hour', ts)    AS window_start,
           count(*)                  AS cnt,
           sum(CAST(round(tempVal * 1000000) AS BIGINT)) / 1000000.0
                                     AS s
    FROM readings
    GROUP BY 1, 2
)
"""
