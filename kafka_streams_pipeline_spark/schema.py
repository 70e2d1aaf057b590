"""Explicit StructType schemas (no inference anywhere).

The reference's schema is the Jackson POJO ``TemperatureReading``
(model/TemperatureReading.java:6-23) with unknown fields ignored and
missing fields null — the Spark equivalent is an explicit StructType
used with ``from_json`` in PERMISSIVE mode (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input stream record — model/TemperatureReading.java:6-23, README.md:11-17.
READING_SCHEMA = StructType(
    [
        StructField("timestamp", LongType()),  # event time, epoch millis
        StructField("sensorId", StringType()),
        StructField("geohash", StringType()),  # 12-char geohash
        StructField("tempVal", DoubleType()),
        StructField("tempUnit", StringType()),  # carried, never used (no conversion)
    ]
)

# Materialized view row — the engine's core state
# (ingestion/KafkaStreamsAggregator.java:98-105 + model/Aggregate.java:4-6).
VIEW_SCHEMA = StructType(
    [
        StructField("gh", StringType()),  # geohash prefix, len = precision
        StructField("window_start", TimestampType()),
        StructField("count", LongType()),
        StructField("sum", DoubleType()),
        StructField("avg", DoubleType()),
    ]
)

# Driver fixture: events table (FIXTURES.md §2.1) — stream-shaped fact.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),  # JSON object string
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

# Multimodal asset row (SURVEY.md §2.9 / north-star extension): opaque
# binary payload + typed metadata; decode runs behind mapInPandas.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

# Fixture table names the driver pre-registers for the DuckDB oracle.
FIXTURE_TABLES = (
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
