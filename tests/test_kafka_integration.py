"""Opt-in LIVE Kafka integration for the S1 source (VERDICT r5 item 8).

The sandbox has no broker and no network, so this module self-skips
unless ``KAFKA_BOOTSTRAP`` is set (the test is SKIPPED, not absent —
the wiring is executable the moment a broker exists):

    docker compose -f docker/kafka-compose.yml up -d
    KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py -v

Everything except the ``format("kafka")`` connection itself is
already certified broker-free: decode_kafka_records over batch frames
with the exact Kafka source schema (tests/test_sources.py) and the
file-stream replay of the same transform chain
(streaming/pipeline.py). This test closes the last gap by producing
reference-format JSON records through Spark's own Kafka sink and
consuming them back through kafka_reading_stream.

Requires the spark-sql-kafka package; the dedicated session below
pulls it via spark.jars.packages (network or a local ivy cache).
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="live Kafka integration is opt-in: start a broker "
    "(docker compose -f docker/kafka-compose.yml up -d) and set "
    "KAFKA_BOOTSTRAP=localhost:9092",
)


@pytest.fixture(scope="module")
def kafka_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kspipeline-kafka-it")
        .config(
            "spark.jars.packages",
            "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2",
        )
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_kafka_source_round_trip(kafka_spark, tmp_path):
    """Produce reference-format records via the engine's own encode
    (to_kafka_records → Kafka sink), then consume them back through
    kafka_reading_stream (subscribe + earliest, availableNow) and
    assert the decoded readings match what went in — including the
    transport-timestamp fallback for a null payload timestamp."""
    from pyspark.sql import Row

    from kafka_streams_pipeline_spark.sources.readings import (
        kafka_reading_stream,
    )
    from kafka_streams_pipeline_spark.sources.sinks import to_kafka_records

    topic = f"temperature-readings-{uuid.uuid4().hex[:8]}"
    readings = kafka_spark.createDataFrame(
        [
            Row(
                timestamp=1704614400000 + i,
                sensorId=f"sensor-{i}",
                geohash="u155mz82dv33",
                tempVal=20.0 + i,
                tempUnit="C",
            )
            for i in range(10)
        ]
        # null payload timestamp → event time falls back to the Kafka
        # record (transport) timestamp, TSExtractor.java:20 semantics
        + [
            Row(
                timestamp=None,
                sensorId="sensor-null-ts",
                geohash="u155mz82dv33",
                tempVal=30.0,
                tempUnit="C",
            )
        ]
    )
    (
        to_kafka_records(readings)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    stream = kafka_reading_stream(
        kafka_spark, topic=topic, bootstrap_servers=BOOTSTRAP
    )
    name = f"kafka_it_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "kafka consume timed out"

    rows = {
        r["sensorId"]: r
        for r in kafka_spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert len(rows) == 11
    for i in range(10):
        r = rows[f"sensor-{i}"]
        assert r["timestamp"] == 1704614400000 + i
        assert r["tempVal"] == 20.0 + i
        assert r["geohash"] == "u155mz82dv33"
    # the null-payload-timestamp record survived via transport time
    assert rows["sensor-null-ts"]["ts"] is not None
