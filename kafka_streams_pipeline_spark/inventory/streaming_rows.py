"""Streaming driver rows (real availableNow replays of the reference's
continuous topology + stateful twins), BM25, kNN join, skew report,
CSV/ORC source breadth, Q9/Q15/Q19, grouped HLL, trailing RANGE
windows, and the geohash-ring snapshot.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_streams_pipeline_spark import geo
from kafka_streams_pipeline_spark.functions.hashing import md5_long
from kafka_streams_pipeline_spark.inventory._registry import ORACLES, register
from kafka_streams_pipeline_spark.inventory._shared import (
    VIEW_CTE,
    _cents_sum,
    _served_view,
    _t,
)
from kafka_streams_pipeline_spark.operators import dedup as _dedup
from kafka_streams_pipeline_spark.operators import similarity as _sim
from kafka_streams_pipeline_spark.operators import sketches as _sk
from kafka_streams_pipeline_spark.operators import skew as _skew
from kafka_streams_pipeline_spark.operators import text as _text
from kafka_streams_pipeline_spark.operators import timeseries as _ts_ops
from kafka_streams_pipeline_spark.operators.view import build_view
from kafka_streams_pipeline_spark.sources.readings import (
    EVENT_TYPE_GEOHASH,
    readings_from_events,
    readings_from_events_sql,
)
from kafka_streams_pipeline_spark.sources.sinks import read_view, write_view


def _hour_chunk_split(rows: list) -> list:
    """Split (event_type, h_ms, c) hourly rows into 3 hour-contiguous
    replay chunks: hourly sums never straddle a micro-batch (the
    q_streaming_acf convention every hourly-series replay shares)."""
    if not rows:
        raise ValueError(
            "no hourly rows to replay — the events slice produced "
            "an empty hourly series"
        )
    hours = sorted({h for _, h, _ in rows})
    cut1, cut2 = hours[len(hours) // 3], hours[2 * len(hours) // 3]
    return [
        [r for r in rows if r[1] < cut1],
        [r for r in rows if cut1 <= r[1] < cut2],
        [r for r in rows if cut2 <= r[1]],
    ]


def _write_hour_chunks(rows: list, src: str) -> None:
    """Write the 3 hour-contiguous chunks as JSONL replay files with
    ASCENDING mtimes — file-stream replay order is mtime order, and
    back-to-back writes tie (the round-6 lesson: an arbitrary
    tie-break advances the watermark and silently late-drops earlier
    chunks). ONE shared writer so a fix to the replay discipline
    cannot miss a copy (review finding, round 16)."""
    import json as _json
    import time as _time

    mtime0 = _time.time() - 86_400
    for i, chunk in enumerate(_hour_chunk_split(rows)):
        path = os.path.join(src, f"hours{i}.json")
        with open(path, "w") as f:
            for et, h, c in chunk:
                f.write(_json.dumps(
                    {"event_type": et, "h_ms": h, "c": c}) + "\n")
        os.utime(path, (mtime0 + i, mtime0 + i))


# --- Streaming driver rows (VERDICT r4 item 8) -----------------------------
# The two extension rows certified only by pytest bit-exact
# differentials (X2g streaming dedup, X7d streaming HLL state) gain
# DuckDB-oracle driver rows here: each query replays the readings
# stream through a REAL availableNow structured-streaming job (file
# source, one file per micro-batch, checkpointed) and returns the
# collected emissions as a batch frame the oracle can hash-compare.


def _sorted_replay_rows(spark: SparkSession, sf_dir: str) -> list:
    return sorted(
        readings_from_events(_t(spark, sf_dir, "events")).collect(),
        key=lambda r: (r["timestamp"], r["sensorId"]),
    )


def _write_replay_chunks(
    rows: list, src: str, n_chunks: int = 3, inject_dups: bool = True
) -> None:
    """Write time-ordered JSON chunks (one file = one micro-batch
    under maxFilesPerTrigger=1). Time order keeps every row inside
    the 24 h watermark grace — the same replay discipline as
    tests/test_streaming.py. With ``inject_dups``, deterministic
    duplicates repeat every 7th row within the SAME chunk and every
    7th row of the previous chunk's tail in the NEXT one (cross-batch
    state hit; a repeat beyond the watermark is dropped as late —
    either path preserves DISTINCT semantics, and duplicates are
    idempotent for the HLL register max). Replays that must count
    every physical row (the windowed view) pass inject_dups=False."""
    import json as _json
    import time as _time

    os.makedirs(src, exist_ok=True)
    per = (len(rows) + n_chunks - 1) // n_chunks
    mtime0 = _time.time() - 86_400
    for c in range(n_chunks):
        chunk = rows[c * per : (c + 1) * per]
        dups: list = []
        if inject_dups:
            dups = chunk[::7]
            if c > 0:
                # ADVICE r5: clamp the start — a negative start would
                # resolve from the list END at small scale factors,
                # silently injecting no cross-batch duplicates.
                dups = dups + rows[max(0, c * per - 200) : c * per : 7]
        path = os.path.join(src, f"chunk{c}.json")
        with open(path, "w") as f:
            for r in chunk + dups:
                f.write(_json.dumps(r.asDict()) + "\n")
        # The file source orders micro-batches by MODIFICATION TIME,
        # and files written back-to-back tie — an arbitrary tie-break
        # can process a later-timestamped chunk first, advancing the
        # watermark past the earlier chunks and silently dropping
        # their rows as late (caught when a 21-chunk session replay
        # lost 40% of its sessions nondeterministically). Explicit
        # ascending mtimes make the replay order deterministic.
        os.utime(path, (mtime0 + c, mtime0 + c))


def _replay_readings_stream(
    spark: SparkSession,
    sf_dir: str,
    op,
    output_mode: str,
    inject_dups: bool = True,
) -> list:
    """Run ``op`` over an availableNow file stream of the replay
    chunks (one file per micro-batch so state genuinely crosses batch
    boundaries) and return the per-batch collected emissions.
    ``inject_dups=False`` for ops that count physical rows."""
    import shutil

    from kafka_streams_pipeline_spark.schema import READING_SCHEMA

    base = tempfile.mkdtemp(prefix="kspipeline-replay-")
    src = os.path.join(base, "src")
    _write_replay_chunks(
        _sorted_replay_rows(spark, sf_dir), src, inject_dups=inject_dups
    )
    batches: list = []

    def sink(batch_df: DataFrame, _epoch_id: int) -> None:
        batches.append(batch_df.collect())

    stream = (
        spark.readStream.schema(READING_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("timestamp")))
    )
    q = (
        op(stream)
        .writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # ADVICE r5: surface a timeout as a clear error instead of
    # collecting partial emissions and deleting the source/checkpoint
    # out from under a still-running query.
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("availableNow replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)
    return batches


@register(
    "q_streaming_dedup",
    oracle=f"""
        WITH readings AS ({readings_from_events_sql('events')})
        SELECT DISTINCT sensorId AS sensor_id,
               CAST(timestamp AS BIGINT) AS ts_ms
        FROM readings
    """,
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2g (streaming exact dedup): watermark-bounded dropDuplicates
    over an availableNow replay — each (sensorId, timestamp) key
    emitted exactly once in append mode even when its duplicates
    arrive in different micro-batches. Output projected to the dedup
    key alone, so first-arrival nondeterminism cannot leak into the
    hash compare; with time-ordered chunks nothing crosses the 24 h
    grace, so the streaming result IS batch DISTINCT — which is
    exactly what the oracle runs. See streaming/pipeline.py
    streaming_dedup."""
    from kafka_streams_pipeline_spark.streaming.pipeline import (
        streaming_dedup,
    )

    batches = _replay_readings_stream(
        spark,
        sf_dir,
        lambda s: streaming_dedup(
            s, keys=("sensorId", "timestamp"), grace="24 hours"
        ).select(
            F.col("sensorId").alias("sensor_id"),
            F.col("timestamp").alias("ts_ms"),
        ),
        "append",
    )
    rows = [(r["sensor_id"], r["ts_ms"]) for b in batches for r in b]
    return spark.createDataFrame(rows, "sensor_id string, ts_ms bigint")


def _streaming_hll_oracle() -> str:
    from kafka_streams_pipeline_spark.operators.sketches import _duck_rho
    from kafka_streams_pipeline_spark.streaming.stateful import (
        HLL_W_STREAM,
    )

    w = HLL_W_STREAM
    # ADVICE r5: pure-integer bit-length rho (no float log2 — a libm
    # result a hair under an integer would flip rho cross-platform).
    _duck_rho_stream = _duck_rho("payload", width=w)
    return f"""
        WITH readings AS ({readings_from_events_sql('events')}),
        h AS (
            SELECT substr(geohash, 1, 6) AS gh,
                   ('0x' || substr(md5(sensorId), 1, 8))::BIGINT AS h32
            FROM readings WHERE sensorId IS NOT NULL
        ),
        br AS (
            SELECT gh, h32 >> {w} AS bucket, h32 % {1 << w} AS payload
            FROM h
        ),
        rho AS (
            SELECT gh, bucket, {_duck_rho_stream} AS rho
            FROM br
        ),
        regs AS (
            SELECT gh, bucket, max(rho) AS r FROM rho GROUP BY 1, 2
        )
        SELECT gh,
               CAST(count(*) AS BIGINT) AS n_registers_used,
               CAST(sum((bucket + 1) * r) AS BIGINT) AS register_checksum
        FROM regs
        GROUP BY gh
    """


@register("q_streaming_hll", oracle=_streaming_hll_oracle())
def q_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7d (streaming HLL state): per-geohash-cell HyperLogLog
    registers maintained across micro-batches via
    applyInPandasWithState, replayed with availableNow. Update mode
    emits one row per touched key per batch; the LAST emission per
    key is the final register state. Registers merge by max, so batch
    boundaries cannot change the result — the oracle recomputes the
    identical md5 bucket/rho register construction (bit-for-bit the
    batch twin from operators/sketches.py) in pure SQL. See
    streaming/stateful.py hll_sensor_distinct."""
    from kafka_streams_pipeline_spark.streaming.stateful import (
        hll_sensor_distinct,
    )

    batches = _replay_readings_stream(
        spark, sf_dir, hll_sensor_distinct, "update"
    )
    final: dict = {}
    for b in batches:
        for r in b:
            final[r["gh"]] = (
                r["n_registers_used"],
                r["register_checksum"],
            )
    return spark.createDataFrame(
        [(k, n, c) for k, (n, c) in final.items()],
        "gh string, n_registers_used bigint, register_checksum bigint",
    )


@register("q_bm25", oracle=_text.bm25_topk_oracle())
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (retrieval scoring): Okapi BM25 top-25 for a fixed query
    term set with rational k1/b, pure-integer bit-length IDF, and a
    single fixed-order per-row float sum — the retrieval primitive
    for domain-targeted corpus selection, made engine-exact. Rank is
    bound into the output (TakeOrderedAndProject + 25-row window).
    See operators/text.py bm25_topk."""
    return _text.bm25_topk(_t(spark, sf_dir, "documents"))


@register("q_knn_join", oracle=_sim.knn_join_oracle())
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (batch kNN join): exact k nearest neighbors for every query
    in a bounded block (vec_id < 8, k = 5) — topk_cosine generalized
    from one query to the per-document neighbor-list primitive.
    Query block broadcasts; corpus never self-joins; per-query top-k
    is a window keyed by query id with rounded-similarity ordering
    and id tiebreaks, rank bound into the hash. See
    operators/similarity.py knn_join."""
    return _sim.knn_join(_t(spark, sf_dir, "embeddings"))




@register(
    "q_skew_report",
    oracle=_skew.skew_report_oracle("lineitem", "l_suppkey"),
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-ops diagnostic: per-join-key skew report over the
    lineitem supplier key — top-5 hot keys with row share plus the
    global max/avg skew ratio, the measurement that decides salting
    (operators/skew.salted_aggregate) or an AQE skew split before a
    100 TB shuffle runs. One count aggregate on the would-be join
    key, a broadcast 1-row stats frame, a bounded top-N with rank
    bound into the hash. See operators/skew.py skew_report."""
    return _skew.skew_report(_t(spark, sf_dir, "lineitem"), "l_suppkey")


@register("q_streaming_view", oracle=ORACLES["q_hourly_view"])
def q_streaming_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T6 as ONE driver row: the reference's full continuous
    topology — file-source replay → PERMISSIVE decode shape →
    event-time + 24 h watermark → 1-hour windowed count/sum/avg in
    update mode → foreachBatch partition-upsert into the parquet view
    store — executed as a REAL availableNow streaming job (one file
    per micro-batch, checkpointed), then the standing view is read
    back and hash-compared against q_hourly_view's BATCH oracle. The
    streaming aggregate uses the identical micros-integer sum
    expression as operators/view.build_view, so stream-replay equals
    batch rebuild EXACTLY, not approximately (the pytest twin is
    tests/test_streaming.py::test_stream_matches_batch_view; this row
    makes the driver certify it). Duplicate injection is OFF — the
    view counts every physical reading. Round 9: the row runs the
    PRODUCTION micro-batch configuration — state partitions sized to
    the standing key cardinality (8; every batch commits every state
    partition, so this is the per-batch fixed-cost lever measured in
    STREAM_THROUGHPUT_r09) and the RocksDB provider with changelog
    checkpointing — so the driver oracle certifies the exact
    deployed path. See streaming/pipeline.py
    start_file_stream_pipeline."""
    import shutil

    from kafka_streams_pipeline_spark.streaming.pipeline import (
        read_view as _stream_read_view,
        start_file_stream_pipeline,
    )

    base = tempfile.mkdtemp(prefix="kspipeline-sview-")
    src = os.path.join(base, "src")
    view_dir = os.path.join(base, "view")
    ckpt = os.path.join(base, "ckpt")
    _write_replay_chunks(
        _sorted_replay_rows(spark, sf_dir), src, inject_dups=False
    )
    q = start_file_stream_pipeline(
        spark, src, view_dir, ckpt,
        available_now=True, max_files_per_trigger=1,
        state_partitions=8, rocksdb_state=True,
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("streaming-view replay timed out after 300 s")
    out = _stream_read_view(spark, view_dir).select(
        "gh",
        F.unix_millis("window_start").alias("ws_ms"),
        F.col("count").alias("cnt"),
        F.round("sum", 6).alias("sum_val"),
        F.round("avg", 6).alias("avg_val"),
    )
    rows = out.collect()
    schema = out.schema
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "q_streaming_totals",
    oracle=f"""
        WITH readings AS ({readings_from_events_sql('events')})
        SELECT sensorId,
               CAST(count(tempVal) AS BIGINT) AS n_readings,
               round(CAST(sum(CAST(round(tempVal * 1000000) AS BIGINT))
                          AS DOUBLE) / 1000000.0, 6) AS sum_val,
               round(CAST(sum(CAST(round(tempVal * 1000000) AS BIGINT))
                          AS DOUBLE) / 1000000.0
                     / count(tempVal), 6) AS avg_val
        FROM readings WHERE tempVal IS NOT NULL
        GROUP BY sensorId
    """,
)
def q_streaming_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-adjacent driver row: per-sensor running {count, sum, avg}
    via applyInPandasWithState across micro-batches. The state holds
    the EXACT micros-integer sum (rounded once, JVM-side HALF_UP —
    the build_view discipline carried into streaming state), so the
    final emission per sensor is bit-identical to the batch
    aggregate regardless of batch boundaries — which is exactly what
    the oracle computes. Duplicate injection OFF (counts physical
    rows). See streaming/stateful.py running_sensor_totals."""
    from kafka_streams_pipeline_spark.streaming.stateful import (
        running_sensor_totals,
    )

    batches = _replay_readings_stream(
        spark, sf_dir, running_sensor_totals, "update", inject_dups=False
    )
    final: dict = {}
    for b in batches:
        for r in b:
            final[r["sensorId"]] = (r["count"], r["sum"], r["avg"])
    out = spark.createDataFrame(
        [(k, c, s, a) for k, (c, s, a) in final.items()],
        "sensorId string, n_readings long, sum_raw double, avg_raw double",
    )
    return out.select(
        "sensorId",
        "n_readings",
        F.round("sum_raw", 6).alias("sum_val"),
        F.round("avg_raw", 6).alias("avg_val"),
    )


@register(
    "q_streaming_alerts",
    oracle=f"""
        WITH readings AS ({readings_from_events_sql('events')})
        SELECT sensorId,
               CAST(sum(CASE WHEN tempVal > 150.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alerts,
               CAST(CASE WHEN sum(CASE WHEN tempVal > 150.0
                                       THEN 1 ELSE 0 END) > 0
                         THEN 1 ELSE 0 END AS BIGINT) AS latched
        FROM readings WHERE tempVal IS NOT NULL
        GROUP BY sensorId
    """,
)
def q_streaming_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-adjacent driver row: the latching alert detector — counts
    threshold crossings per sensor and latches once any reading
    exceeds the threshold, state carried across micro-batches. The
    final latch state equals the batch predicate aggregate (the
    latch is order-dependent HISTORY, but its terminal value is
    order-free — that equivalence is what the oracle certifies).
    last_value is projected away: it depends on arrival order within
    equal timestamps, which no batch oracle can reproduce. Duplicate
    injection OFF. See streaming/stateful.py threshold_alert_latch."""
    from kafka_streams_pipeline_spark.streaming.stateful import (
        threshold_alert_latch,
    )

    batches = _replay_readings_stream(
        spark,
        sf_dir,
        lambda s: threshold_alert_latch(s, threshold=150.0),
        "update",
        inject_dups=False,
    )
    final: dict = {}
    for b in batches:
        for r in b:
            final[r["sensorId"]] = (r["n_alerts"], r["latched"])
    return spark.createDataFrame(
        [(k, n, 1 if l else 0) for k, (n, l) in final.items()],
        "sensorId string, n_alerts long, latched long",
    )


_SOURCE_AGG_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
               AS sum_val,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
                 / count(*), 6) AS avg_val
    FROM events
    GROUP BY event_type
"""


def _source_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 1000000).cast("long")) / 1000000.0
        ).alias("sum_val"),
        F.round(
            F.sum(F.round(F.col("value") * 1000000).cast("long"))
            / 1000000.0
            / F.count(F.lit(1)),
            6,
        ).alias("avg_val"),
    )


@register("q_csv_source", oracle=_SOURCE_AGG_ORACLE)
def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 source-format breadth: the events table round-tripped
    through CSV with the engine's lenient-decode contract — explicit
    schema (never inference), PERMISSIVE mode, and a
    columnNameOfCorruptRecord column that captures the two malformed
    lines injected into the file so they are DROPPED (the
    decode_kafka_records policy applied to a file format). A green
    row proves: CSV write/read fidelity for long/double/string
    columns AND that corrupt rows cannot leak into an aggregate —
    the oracle aggregates the clean parquet directly."""
    import shutil

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    base = tempfile.mkdtemp(prefix="kspipeline-csv-")
    path = os.path.join(base, "events_csv")
    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.write.mode("overwrite").csv(path)
    # inject malformed lines the PERMISSIVE parse must reject
    with open(os.path.join(path, "zz_corrupt.csv"), "w") as f:
        f.write("not_a_long,alpha\n")
        f.write('12,34,"unterminated,NaNff\n')
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("_corrupt", StringType()),
        ]
    )
    decoded = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .where(
            F.col("_corrupt").isNull()
            # required-field validity guard (the with_event_time
            # policy): a row that parsed but lost a required field —
            # e.g. an unterminated quote swallowing the tail of the
            # line — is as invalid as a corrupt one. The fixture has
            # zero legitimate nulls in these columns (asserted by the
            # oracle matching count(*)).
            & F.col("event_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
        )
        .drop("_corrupt")
    )
    out = _source_agg(decoded)
    rows = out.collect()
    schema_out = out.schema
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema_out)


@register("q_orc_source", oracle=_SOURCE_AGG_ORACLE)
def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 source-format breadth: the same aggregate through an ORC
    round-trip — Spark's second columnar format, exercised with
    predicate-capable typed columns. Proves the engine's source layer
    is format-agnostic: parquet (everywhere), CSV (q_csv_source),
    JSON (streaming replays + q_json_extract), ORC (here)."""
    import shutil

    base = tempfile.mkdtemp(prefix="kspipeline-orc-")
    path = os.path.join(base, "events_orc")
    _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    ).write.mode("overwrite").orc(path)
    out = _source_agg(spark.read.orc(path))
    rows = out.collect()
    schema_out = out.schema
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema_out)


@register(
    "q_disjunctive_revenue",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) / 100.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    bands across the lineitem⋈part join — the classic test of
    OR-predicate handling (Catalyst splits the join-key equality out
    of the disjunction so the join stays a hash join, and pushes the
    per-side residuals down to each scan). Broadcast part side;
    cents-exact revenue."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(band)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            _cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
    )


@register(
    "q_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey AS suppkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                            AS BIGINT)) AS rev_c
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2000-01-01'
              AND l_shipdate < TIMESTAMP '2000-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               rev_c / 100.0 AS total_revenue
        FROM rev JOIN supplier ON suppkey = s_suppkey
        WHERE rev_c = (SELECT max(rev_c) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view over a ship-date quarter, then
    the supplier(s) achieving the maximum — the scalar-subquery-on-an
    -aggregate pattern. The max compares CENTS INTEGERS, so the
    equality (and therefore the selected rowset) is exact on both
    engines; division to dollars happens after selection. Ship-date
    filter pushed to the scan, supplier dimension broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("rev_c")
        )
    )
    mx = rev.agg(F.max("rev_c").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_c") == F.col("mx"))
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c") / F.lit(100.0)).alias("total_revenue"),
        )
    )


@register(
    "q_profit_by_nation",
    oracle="""
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS BIGINT) AS o_year,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) / 100.0 AS amount
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, year(l_shipdate)
    """,
)
def q_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by nation and year; the fixture has no
    partsupp table, so amount is the revenue term — the JOIN TOPOLOGY
    is the point): fact → part (LIKE-filtered, broadcast) → supplier
    (broadcast) → nation (broadcast), grouped by (nation, year).
    Three dimension broadcasts, one fact-side aggregate shuffle —
    the multi-way star plan a 100 TB profit rollup wants."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(
            _cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "amount",
            )
        )
    )


@register(
    "q_component_sizes",
    oracle=f"""
        WITH comps AS ({_dedup.components_oracle(0.8)})
        SELECT CAST(n_members AS BIGINT) AS n_members,
               CAST(count(*) AS BIGINT) AS n_components
        FROM (
            SELECT component, count(*) AS n_members
            FROM comps GROUP BY component
        )
        GROUP BY n_members
    """,
)
def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 dedup telemetry: the near-dup component size histogram —
    how many singletons, pairs, triples… the corpus contains. The
    first report a dedup run produces (it sizes the removal rate and
    flags pathological mega-components before any deletion). One
    extra two-level aggregate over the components output."""
    comps = _dedup.dedup_components(
        _t(spark, sf_dir, "documents"), threshold=0.8
    )
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .groupBy("n_members")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
    )


@register(
    "q_hll_by_group",
    oracle=_sk.hll_distinct_by_oracle("events", "event_type", "user_id"),
)
def q_hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 grouped form: per-event-type HyperLogLog register state —
    the mergeable approximate-distinct-per-dimension shape production
    rollups actually use. All-integer output (register count,
    harmonic denominator, position-weighted checksum, exact
    reference); the float estimate formula is certified by the global
    q_hll_distinct row. See operators/sketches.py hll_distinct_by."""
    return _sk.hll_distinct_by(
        _t(spark, sf_dir, "events"), "event_type", "user_id"
    )


@register(
    "q_trailing_window",
    oracle="""
        WITH o AS (
            SELECT o_custkey,
                   CAST(epoch(o_orderdate) AS BIGINT) AS od_s,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
            FROM orders
        )
        SELECT o_custkey,
               od_s * 1000 AS od_ms,
               CAST(count(*) OVER w AS BIGINT) AS n_trailing,
               sum(price_c) OVER w / 100.0 AS trailing_total
        FROM o
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY od_s
            RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW
        )
    """,
)
def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frames — the moving-interval aggregate
    (trailing 7 days of orders per customer AT each order date) that
    row-count frames cannot express when events are irregularly
    spaced. The frame bound is defined on the ORDER BY VALUE
    (epoch seconds), so ties and gaps behave identically across
    engines; the money sum is cents-integer inside the frame with one
    division outside. Scale shape: one shuffle on the partition key,
    per-partition sort, single-pass frame evaluation — Spark's
    WindowExec sliding frame."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_timestamp("o_orderdate").alias("od_s"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("od_s")
        .rangeBetween(-604799, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        (F.col("od_s") * 1000).alias("od_ms"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
        (F.sum("price_c").over(w) / F.lit(100.0)).alias("trailing_total"),
    )


# The ring query's fixture cell and its EXPECTED 8 geohash neighbors,
# FROZEN as literals so the oracle is independent of geo.neighbors
# (VERDICT r5 "What's wrong" #1: interpolating the driver-computed
# ring into the oracle certified only the aggregation — a wrong
# neighbor table would have produced a matching hash). The Spark side
# computes its ring from geo.neighbors at CALL time, so a broken
# neighbors() now diverges from this frozen oracle list and turns the
# driver row red (mutation-tested in tests/test_geo.py). The literals
# are verified independently of neighbors()/encode() by decoding each
# cell's bbox and asserting it tiles the exact 3x3 grid around the
# center (tests/test_geo.py::test_frozen_ring_tiles_3x3_grid).
_RING_CENTER = EVENT_TYPE_GEOHASH["click"][:5]  # 'u155m'
_RING_CELLS_EXPECTED = [
    "u155h", "u155j", "u155k", "u155m", "u155n",
    "u155q", "u155s", "u155t", "u155w",
]


@register(
    "q_snapshot_ring",
    oracle=VIEW_CTE
    + f"""
    SELECT gh,
           round(s / cnt, 6) AS avg
    FROM v
    WHERE substr(gh, 1, 5) IN
          ({', '.join(f"'{c}'" for c in _RING_CELLS_EXPECTED)})
      AND window_start = TIMESTAMP '2024-01-07 10:00:00'
    """,
)
def q_snapshot_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/A6 variant: per-cell snapshot over a geohash RING — the
    query cell plus its 8 neighbors from geo.neighbors (the
    proximity shape 'what is around this cell' that bbox cover
    approximates from the outside), as a PREFIX membership over the
    stored precision-6 cells (the reference's coarser-than-store
    query pattern, QueryingController.java gh_precision). The ring is
    computed driver-side at CALL time (pure-Python geohash
    arithmetic, known-vector tested), so the executor plan is a
    native prefix-IN filter — no UDF, no geo math in the plan. The
    oracle's IN-list is a FROZEN independently-verified literal
    (tests/test_geo.py tiling + mutation tests), so this row
    certifies the neighbor math too, not just the aggregation: the
    fixture window holds rows in BOTH the center prefix (u155m…) and
    a neighbor prefix (u155q…), so a broken neighbors() flips the
    hash."""
    import datetime as dt

    from kafka_streams_pipeline_spark.operators.queries import _utc_lit

    ring = sorted({_RING_CENTER} | set(geo.neighbors(_RING_CENTER)))
    v = _served_view(spark, sf_dir)
    return (
        v.where(
            F.substring("gh", 1, 5).isin(ring)
            # _utc_lit, NEVER F.lit(naive datetime): PySpark converts
            # naive datetimes through the OS timezone (caught by the
            # TZ=America/New_York driver-sim gate)
            & (F.col("window_start") == _utc_lit(dt.datetime(2024, 1, 7, 10)))
        )
        .select("gh", F.round(F.col("sum") / F.col("count"), 6).alias("avg"))
    )


def _streaming_cms_oracle() -> str:
    from kafka_streams_pipeline_spark.streaming.stateful import (
        CMS_DEPTH,
        CMS_WIDTH,
    )

    return f"""
        WITH readings AS ({readings_from_events_sql('events')}),
        h AS (
            SELECT substr(geohash, 1, 6) AS gh, sensorId
            FROM readings WHERE sensorId IS NOT NULL
        ),
        counts AS (
            SELECT gh, sensorId, count(*) AS n FROM h GROUP BY 1, 2
        ),
        pos AS (
            SELECT gh, sensorId, n, d,
                   ('0x' || substr(md5(d::VARCHAR || ':' || sensorId), 1, 8))
                       ::BIGINT % {CMS_WIDTH} AS r
            FROM counts,
                 unnest(generate_series(0, {CMS_DEPTH - 1})) AS t(d)
        ),
        cells AS (
            SELECT gh, d, r, sum(n) AS c FROM pos GROUP BY 1, 2, 3
        )
        SELECT p.gh, p.sensorId AS sensor_id,
               CAST(min(c.c) AS BIGINT) AS est_count
        FROM pos p
        JOIN cells c ON c.gh = p.gh AND c.d = p.d AND c.r = p.r
        GROUP BY 1, 2
    """


@register("q_streaming_cms", oracle=_streaming_cms_oracle())
def q_streaming_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7-family streaming CMS, driver-certified (VERDICT r5 item 9):
    per-geohash-cell Count-Min cell matrices maintained across
    micro-batches via applyInPandasWithState, replayed with
    availableNow. The staleness problem that kept CMS pytest-only —
    per-batch point estimates depend on how arrivals split across
    batches — is solved by emitting the FULL cell state per touched
    key (streaming/stateful.py cms_cell_state): counters are pure
    additive state, so the LAST emission per key is
    batch-boundary-independent. Point estimates for every (cell,
    sensor) are then derived from that final state with the same
    seeded-md5 row family the oracle recomputes in pure SQL.
    Duplicate injection is OFF — CMS counts every physical row."""
    from kafka_streams_pipeline_spark.streaming.stateful import (
        CMS_WIDTH,
        _cms_rows,
        cms_cell_state,
    )

    batches = _replay_readings_stream(
        spark, sf_dir, cms_cell_state, "update", inject_dups=False
    )
    final: dict = {}
    for b in batches:
        for r in b:
            final[r["gh"]] = r["cells"]
    sensors = (
        readings_from_events(_t(spark, sf_dir, "events"))
        .where(F.col("sensorId").isNotNull())
        .select(F.substring("geohash", 1, 6).alias("gh"), "sensorId")
        .distinct()
        .collect()
    )
    rows = []
    for s in sensors:
        cells = final[s["gh"]]
        est = min(
            cells[d * CMS_WIDTH + r]
            for d, r in enumerate(_cms_rows(s["sensorId"]))
        )
        rows.append((s["gh"], s["sensorId"], int(est)))
    return spark.createDataFrame(
        rows, "gh string, sensor_id string, est_count bigint"
    )


def _write_event_chunks(
    rows: list, src: str, cuts: list[int], max_chunks: int = 24
) -> None:
    """Write time-ordered event JSON chunks (one file = one
    micro-batch under maxFilesPerTrigger=1), split at the given
    sorted row indexes — the events-shaped twin of
    _write_replay_chunks. Time order keeps every row inside the 24 h
    watermark grace; the caller picks ``cuts`` so the property under
    test (e.g. a join match spanning two micro-batches) actually
    occurs instead of depending on where an even split lands."""
    import json as _json
    import time as _time

    os.makedirs(src, exist_ok=True)
    bounds = [0] + sorted(set(cuts))[: max_chunks - 1] + [len(rows)]
    mtime0 = _time.time() - 86_400
    seq = 0
    for c in range(len(bounds) - 1):
        lo, hi = bounds[c], bounds[c + 1]
        if lo >= hi:
            continue
        path = os.path.join(src, f"chunk{c:03d}.json")
        with open(path, "w") as f:
            for r in rows[lo:hi]:
                f.write(_json.dumps(r) + "\n")
        # ascending mtimes: the file source orders micro-batches by
        # modification time and same-instant writes tie arbitrarily —
        # an out-of-order chunk advances the watermark and late-drops
        # every earlier chunk's rows (see _write_replay_chunks).
        os.utime(path, (mtime0 + seq, mtime0 + seq))
        seq += 1


@register(
    "q_streaming_join",
    oracle="""
        SELECT p.event_id AS p_id, p.user_id,
               epoch_ms(p.ts) AS p_ts_ms,
               epoch_ms(c.ts) AS c_ts_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
    """,
)
def q_streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join as a driver row (the
    streaming twin of q_interval_join): purchases joined to the same
    user's clicks in the preceding 10 minutes, both sides replayed
    through ONE availableNow file stream (self-join, one file per
    micro-batch) with 24 h watermarks. The replay cuts a micro-batch
    boundary right BEFORE each matched purchase (computed by a tiny
    batch pre-join), so every match's click arrives in an earlier
    micro-batch than its purchase and must be served from the join
    STATE STORE — the cross-batch buffering this row certifies (an
    even time split leaves zero cross-batch matches: a 10-minute
    window almost never straddles an arbitrary boundary). With
    time-ordered chunks nothing crosses the grace, so the emitted
    match set equals the batch interval join, which is exactly what
    the oracle runs. The pytest twin
    (tests/test_streaming.py::test_streaming_join_crosses_batches)
    asserts the cross-batch property itself."""
    import shutil

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
        )
        .where(F.col("event_type").isin("purchase", "click"))
        .collect()
    )
    rows = sorted(
        (r.asDict() for r in ev), key=lambda r: (r["ts_ms"], r["event_id"])
    )
    # Batch pre-join (tiny: ids only) to find matched purchases, so
    # chunk boundaries can be cut right before each one.
    ev_df = spark.createDataFrame(
        rows, "event_id long, ts_ms long, user_id long, event_type string"
    )
    pp = ev_df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ms").alias("p_ms"),
    )
    cc = ev_df.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_ms").alias("c_ms")
    )
    matched = (
        pp.join(
            cc,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ms") >= F.col("p_ms") - 600_000)
            & (F.col("c_ms") < F.col("p_ms")),
        )
        .select("p_id")
        .distinct()
        .collect()
    )
    matched_ids = {r["p_id"] for r in matched}
    idx = {r["event_id"]: i for i, r in enumerate(rows)}
    cuts = [idx[p] for p in matched_ids]
    base = tempfile.mkdtemp(prefix="kspipeline-sjoin-")
    src = os.path.join(base, "src")
    _write_event_chunks(rows, src, cuts)

    schema = "event_id long, ts_ms long, user_id long, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    p = (
        stream.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        )
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select(
        "p_id",
        "user_id",
        F.unix_millis("p_ts").alias("p_ts_ms"),
        F.unix_millis("c_ts").alias("c_ts_ms"),
    )

    batches: list = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _e: batches.append(df.collect()))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("stream-stream join replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)
    out = [(r["p_id"], r["user_id"], r["p_ts_ms"], r["c_ts_ms"])
           for b in batches for r in b]
    return spark.createDataFrame(
        out, "p_id long, user_id long, p_ts_ms long, c_ts_ms long"
    )


@register(
    "q_streaming_sessions",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
            FROM events
        ),
        m AS (
            SELECT *, CASE WHEN prev IS NULL
                            OR ts - prev >= INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_sess
            FROM o
        ),
        s AS (
            SELECT *, sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM m
        )
        SELECT user_id,
               epoch_ms(min(ts))     AS session_start_ms,
               count(*)              AS n_events,
               round(sum(value), 6)  AS sum_value
        FROM s GROUP BY user_id, sid
    """,
)
def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows as a driver row (the streaming twin
    of q_session_window): per-user 30-minute-gap sessions aggregated
    with session_window + watermark in APPEND mode over an
    availableNow replay. Two replay constructions make the row
    meaningful:

    - micro-batch boundaries are cut at session-CONTINUATION rows
      (a row whose same-user predecessor is < 30 min earlier), so
      sessions genuinely straddle batches and must merge in the
      session state store;
    - append mode only emits a session once the watermark passes its
      close, and the watermark stops ``grace`` behind the last event
      — so a SENTINEL chunk (one far-future event for a reserved
      user id) is appended to flush every real session, then
      filtered from the result. Without it the tail sessions are
      silently missing — the classic append-mode pitfall.

    The emitted set then equals the batch gaps-and-islands rewrite,
    which is what the oracle runs."""
    import shutil

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            F.col("value").cast("double").alias("value"),
        )
        .collect()
    )
    rows = sorted(
        (r.asDict() for r in ev), key=lambda r: (r["ts_ms"], r["event_id"])
    )
    # cut before session-continuation rows (same user, gap < 30 min)
    last_ts: dict = {}
    cuts = []
    for i, r in enumerate(rows):
        prev = last_ts.get(r["user_id"])
        if prev is not None and r["ts_ms"] - prev < 1_800_000:
            cuts.append(i)
        last_ts[r["user_id"]] = r["ts_ms"]
    # spread up to 20 cuts across the stream (every len/20-th)
    step = max(1, len(cuts) // 20)
    cuts = cuts[::step][:20]
    SENTINEL_USER = -1
    sentinel_ts = rows[-1]["ts_ms"] + 48 * 3600 * 1000  # > gap + grace
    rows_s = rows + [
        {
            "event_id": -1,
            "ts_ms": sentinel_ts,
            "user_id": SENTINEL_USER,
            "value": 0.0,
        }
    ]
    base = tempfile.mkdtemp(prefix="kspipeline-ssess-")
    src = os.path.join(base, "src")
    # sentinel goes in its own final chunk: cut right before it
    _write_event_chunks(rows_s, src, cuts + [len(rows)], max_chunks=24)

    schema = "event_id long, ts_ms long, user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
            "sum_value",
        )
    )
    batches: list = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, _e: batches.append(df.collect()))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("session replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)
    out = [
        (r["user_id"], r["session_start_ms"], r["n_events"], r["sum_value"])
        for b in batches
        for r in b
        if r["user_id"] != SENTINEL_USER
    ]
    return spark.createDataFrame(
        out,
        "user_id long, session_start_ms long, n_events long, sum_value double",
    )


@register("q_streaming_restart", oracle=ORACLES["q_streaming_totals"])
def q_streaming_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 (fault tolerance) as a driver row: the running-totals
    pipeline processes the FIRST THIRD of the stream, STOPS (query
    terminated, session state gone — only the checkpoint survives),
    then a SECOND incarnation starts from the same checkpoint and
    processes the remaining chunks. The final per-sensor state must
    be bit-identical to the batch aggregate over everything — state
    restored, nothing reprocessed, nothing lost. Same oracle as
    q_streaming_totals: the restart must be INVISIBLE in the result.
    See streaming/stateful.py running_sensor_totals and the pytest
    twin tests/test_stateful.py::test_running_totals_survive_restart."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.schema import READING_SCHEMA
    from kafka_streams_pipeline_spark.streaming.stateful import (
        running_sensor_totals,
    )

    rows = _sorted_replay_rows(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="kspipeline-restart-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    third = max(1, len(rows) // 3)
    mtime0 = _time.time() - 86_400

    def write_chunk(idx: int, chunk_rows: list) -> None:
        path = os.path.join(src, f"chunk{idx}.json")
        with open(path, "w") as f:
            for r in chunk_rows:
                f.write(_json.dumps(r.asDict()) + "\n")
        os.utime(path, (mtime0 + idx, mtime0 + idx))

    batches: list = []

    def run_once() -> None:
        q = (
            running_sensor_totals(
                spark.readStream.schema(READING_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .json(src)
                .withColumn("ts", F.timestamp_millis(F.col("timestamp")))
            )
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _e: batches.append(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            shutil.rmtree(base, ignore_errors=True)
            raise RuntimeError("restart replay timed out after 300 s")

    write_chunk(0, rows[:third])
    run_once()  # incarnation 1: first third only
    write_chunk(1, rows[third : 2 * third])
    write_chunk(2, rows[2 * third :])
    run_once()  # incarnation 2: resumes from checkpoint

    shutil.rmtree(base, ignore_errors=True)
    final: dict = {}
    for b in batches:
        for r in b:
            final[r["sensorId"]] = (r["count"], r["sum"], r["avg"])
    out = spark.createDataFrame(
        [(k, c, s, a) for k, (c, s, a) in final.items()],
        "sensorId string, n_readings long, sum_raw double, avg_raw double",
    )
    return out.select(
        "sensorId",
        "n_readings",
        F.round("sum_raw", 6).alias("sum_val"),
        F.round("avg_raw", 6).alias("avg_val"),
    )


@register("q_view_compaction", oracle=ORACLES["q_hourly_view"])
def q_view_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 maintenance as a driver row: the fragmented-store →
    compaction lifecycle of the standing view. The full hourly view
    is written as two KEY-DISJOINT slices (overwrite + append — the
    fragmentation pattern of append-mode writers and
    high-parallelism backfills; the foreachBatch upsert itself
    rewrites whole partitions, so its fragmentation is appends too),
    leaving multiple files per ws_date partition; then
    sinks.compact_view rewrites one sorted file per partition (the
    layout that gives parquet min/max skipping on gh its power). The
    row FAILS LOUDLY if compaction removed no files, and the
    compacted store read back must hash-match the batch hourly-view
    oracle — maintenance must be invisible in the data."""
    import shutil

    from kafka_streams_pipeline_spark.functions.hashing import md5_long
    from kafka_streams_pipeline_spark.sources.sinks import compact_view

    base = tempfile.mkdtemp(prefix="kspipeline-compact-")
    view_dir = os.path.join(base, "view")
    full = build_view(
        readings_from_events(_t(spark, sf_dir, "events"))
    ).withColumn("_slice", md5_long(F.col("gh")) % 2)
    write_view(full.where(F.col("_slice") == 0).drop("_slice"), view_dir)
    write_view(
        full.where(F.col("_slice") != 0).drop("_slice"),
        view_dir,
        mode="append",
    )
    removed = compact_view(spark, view_dir)
    if removed < 1:
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError(
            "compaction removed no files — the sliced writes did not "
            "produce the fragmented state this row certifies"
        )
    out = read_view(spark, view_dir).select(
        "gh",
        F.unix_millis("window_start").alias("ws_ms"),
        F.col("count").alias("cnt"),
        F.round("sum", 6).alias("sum_val"),
        F.round("avg", 6).alias("avg_val"),
    )
    rows = out.collect()
    schema = out.schema
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register("q_streaming_late_update", oracle=ORACLES["q_hourly_view"])
def q_streaming_late_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (late data within the watermark grace) as a driver row: the
    hourly windowed aggregate replayed with DELIBERATE local disorder
    — each 50-row block is reversed, and every second row from each
    chunk's final 12 hours is HELD BACK to the next chunk. When a
    held row arrives, the watermark sits a full grace (24 h) behind
    the previous chunk's maximum, so the row is late by up to 12 h
    but INSIDE the grace — Spark must merge it into the
    already-emitted window, never drop it (rows held across a
    boundary by more than the grace would be legitimately dropped,
    which is why the hold-back is bounded to grace/2). Update mode
    re-emits a (gh, window) row every time a late arrival changes
    it; the LAST emission per key must equal the batch hourly view
    exactly. Same oracle as q_hourly_view: in-grace lateness must be
    invisible in the result."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.schema import READING_SCHEMA

    rows = _sorted_replay_rows(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="kspipeline-late-")
    src = os.path.join(base, "src")
    os.makedirs(src)
    n_chunks = 3
    per = (len(rows) + n_chunks - 1) // n_chunks
    half_grace_ms = 12 * 3600 * 1000
    held: list = []
    mtime0 = _time.time() - 86_400
    for c in range(n_chunks):
        chunk = rows[c * per : (c + 1) * per]
        # local disorder: reverse 50-row blocks (bounded, ≪ grace)
        jumbled: list = []
        for i in range(0, len(chunk), 50):
            jumbled.extend(reversed(chunk[i : i + 50]))
        # hold back every second row from the chunk's final grace/2 —
        # genuinely late arrivals (up to 12 h behind the watermark
        # base) that are still INSIDE the 24 h grace when they land
        # in the next chunk, so Spark must merge, not drop
        cutoff = max(r["timestamp"] for r in chunk) - half_grace_ms
        tail_idx = [
            i for i, r in enumerate(jumbled) if r["timestamp"] >= cutoff
        ]
        hold = set(tail_idx[::2])
        arriving = held + [
            r for i, r in enumerate(jumbled) if i not in hold
        ]
        held = [r for i, r in enumerate(jumbled) if i in hold]
        path = os.path.join(src, f"chunk{c}.json")
        with open(path, "w") as f:
            for r in arriving:
                f.write(_json.dumps(r.asDict()) + "\n")
        os.utime(path, (mtime0 + c, mtime0 + c))
    # final chunk: the tail of held-back rows
    path = os.path.join(src, f"chunk{n_chunks}.json")
    with open(path, "w") as f:
        for r in held:
            f.write(_json.dumps(r.asDict()) + "\n")
    os.utime(path, (mtime0 + n_chunks, mtime0 + n_chunks))

    from kafka_streams_pipeline_spark.streaming.pipeline import (
        streaming_view_aggregate,
    )

    batches: list = []
    stream = (
        spark.readStream.schema(READING_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("timestamp")))
    )
    q = (
        streaming_view_aggregate(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _e: batches.append(df.collect()))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("late-update replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)
    final: dict = {}
    for b in batches:
        for r in b:
            final[(r["gh"], r["window_start"])] = (
                r["count"], r["sum"], r["avg"],
            )
    out = spark.createDataFrame(
        [(gh, ws, c, s, a) for (gh, ws), (c, s, a) in final.items()],
        "gh string, window_start timestamp, cnt long, sum_raw double, avg_raw double",
    )
    return out.select(
        "gh",
        F.unix_millis("window_start").alias("ws_ms"),
        "cnt",
        F.round("sum_raw", 6).alias("sum_val"),
        F.round("avg_raw", 6).alias("avg_val"),
    )


@register(
    "q_streaming_late_drop",
    oracle="""
        WITH readings AS ("""
    + readings_from_events_sql("events")
    + """),
        cutoff AS (
            SELECT min(ts) + INTERVAL 2 HOUR AS c FROM readings
        ),
        v AS (
            SELECT substring(geohash, 1, 6)  AS gh,
                   date_trunc('hour', ts)    AS window_start,
                   count(*)                  AS cnt,
                   sum(CAST(round(tempVal * 1000000) AS BIGINT)) / 1000000.0
                                             AS s
            FROM readings, cutoff
            WHERE ts >= cutoff.c
            GROUP BY 1, 2
        )
        SELECT gh,
               epoch_ms(window_start)  AS ws_ms,
               cnt,
               round(s, 6)             AS sum_val,
               round(s / cnt, 6)       AS avg_val
        FROM v
    """,
)
def q_streaming_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3's DROP side, deterministic: rows from the stream's FIRST
    TWO HOURS are withheld and delivered in a final chunk, by which
    point the watermark (max event time − 24 h grace) sits far past
    their windows' close — their state is evicted and the arrivals
    are guaranteed-late, so Spark must DROP every one of them. The
    final state therefore equals the batch view over exactly the
    on-time rows, which is what the oracle computes (readings with
    ts ≥ min + 2 h). Dropping is deterministic here because the
    windows have CLOSED behind the watermark before delivery — a
    beyond-watermark row whose window is still open would legally
    merge, which is why the construction evicts first (the
    mirror-image discipline of q_streaming_late_update's
    grace/2 bound)."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.schema import READING_SCHEMA
    from kafka_streams_pipeline_spark.streaming.pipeline import (
        streaming_view_aggregate,
    )

    rows = _sorted_replay_rows(spark, sf_dir)
    cutoff_ms = rows[0]["timestamp"] + 2 * 3600 * 1000
    withheld = [r for r in rows if r["timestamp"] < cutoff_ms]
    on_time = [r for r in rows if r["timestamp"] >= cutoff_ms]
    if not withheld:
        raise RuntimeError("fixture has no rows in its first two hours")
    base = tempfile.mkdtemp(prefix="kspipeline-latedrop-")
    src = os.path.join(base, "src")
    os.makedirs(src)
    n_chunks = 3
    per = (len(on_time) + n_chunks - 1) // n_chunks
    mtime0 = _time.time() - 86_400
    chunks = [on_time[c * per : (c + 1) * per] for c in range(n_chunks)]
    chunks.append(withheld)  # beyond-grace arrivals, delivered last
    for c, chunk in enumerate(chunks):
        path = os.path.join(src, f"chunk{c}.json")
        with open(path, "w") as f:
            for r in chunk:
                f.write(_json.dumps(r.asDict()) + "\n")
        os.utime(path, (mtime0 + c, mtime0 + c))

    batches: list = []
    stream = (
        spark.readStream.schema(READING_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("timestamp")))
    )
    q = (
        streaming_view_aggregate(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _e: batches.append(df.collect()))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("late-drop replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)
    final: dict = {}
    for b in batches:
        for r in b:
            final[(r["gh"], r["window_start"])] = (
                r["count"], r["sum"], r["avg"],
            )
    out = spark.createDataFrame(
        [(gh, ws, c, s, a) for (gh, ws), (c, s, a) in final.items()],
        "gh string, window_start timestamp, cnt long, sum_raw double, avg_raw double",
    )
    return out.select(
        "gh",
        F.unix_millis("window_start").alias("ws_ms"),
        "cnt",
        F.round("sum_raw", 6).alias("sum_val"),
        F.round("avg_raw", 6).alias("avg_val"),
    )


@register(
    "q_corpus_versioning",
    oracle="""
        SELECT 1 AS version,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT 2 AS version,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM documents
    """,
)
def q_corpus_versioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset reproducibility: the versioned corpus store
    (sources/versioned.py — append-only batches + manifest-pinned
    time travel, a transaction-log-lite on plain parquet). Commit the
    even-doc_id half as v1, the odd half as v2, then read BOTH
    versions back: v1 must be exactly the first batch (time travel —
    later commits invisible), v2 the union. Summarized per version
    as count + id checksum + char total, which is what the oracle
    computes over the corresponding doc_id slices. A training run
    pinning v1 gets byte-identical inputs after any number of later
    commits — the property this row certifies."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="kspipeline-versions-")
    store = os.path.join(base, "corpus")
    v1 = commit_corpus(docs.where(F.col("doc_id") % 2 == 0), store, "even half")
    v2 = commit_corpus(docs.where(F.col("doc_id") % 2 != 0), store, "odd half")
    out_rows = []
    for v in (v1, v2):
        snap = read_corpus(spark, store, v).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        ).collect()[0]
        out_rows.append((v, snap["n_docs"], snap["id_checksum"], snap["chars_total"]))
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out_rows,
        "version int, n_docs long, id_checksum long, chars_total long",
    )


@register(
    "q_corpus_checkpoint",
    oracle="""
        SELECT 1 AS version, CAST(1 AS BIGINT) AS n_batches,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT 2 AS version, CAST(2 AS BIGINT) AS n_batches,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents WHERE doc_id % 3 IN (0, 1)
        UNION ALL
        SELECT 3 AS version, CAST(1 AS BIGINT) AS n_batches,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents WHERE doc_id % 3 IN (0, 1)
        UNION ALL
        SELECT 4 AS version, CAST(2 AS BIGINT) AS n_batches,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents
    """,
)
def q_corpus_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest checkpointing (round 8): after two append commits
    (v1, v2 — manifest grows to 2 batches), checkpoint_corpus
    consolidates the corpus into ONE batch (v3, manifest length 1 —
    the Delta-checkpoint move that keeps read planning O(1) under
    many small commits), and a post-checkpoint commit chains from
    the short manifest (v4, length 2). Every version's row carries
    its manifest batch COUNT plus count + id checksum, and v2 is
    read back AFTER the checkpoint — so the oracle hash certifies
    both the consolidation (same data, fewer batches) and that
    checkpointing never disturbs a pinned old version.
    See sources/versioned.checkpoint_corpus."""
    import json as _json
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        _manifest_path,
        checkpoint_corpus,
        commit_corpus,
        read_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="kspipeline-ckpt-")
    store = os.path.join(base, "corpus")
    commit_corpus(docs.where(F.col("doc_id") % 3 == 0), store, "third 0")
    commit_corpus(docs.where(F.col("doc_id") % 3 == 1), store, "third 1")
    checkpoint_corpus(spark, store)
    commit_corpus(docs.where(F.col("doc_id") % 3 == 2), store, "third 2")
    out_rows = []
    for v in (1, 2, 3, 4):
        with open(_manifest_path(store, v)) as f:
            n_batches = len(_json.load(f)["batches"])
        snap = read_corpus(spark, store, v).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        ).collect()[0]
        out_rows.append(
            (v, n_batches, snap["n_docs"], snap["id_checksum"])
        )
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out_rows,
        "version int, n_batches long, n_docs long, id_checksum long",
    )


@register(
    "q_corpus_vacuum",
    oracle="""
        SELECT CAST(2 AS BIGINT) AS batches_removed,
               CAST(2 AS BIGINT) AS manifests_removed,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents
    """,
)
def q_corpus_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention (round 8): the full store lifecycle ending in
    VACUUM — two append commits, a manifest checkpoint, then
    vacuum(keep_from=checkpoint) reclaims exactly the two
    pre-checkpoint batches + manifests, and the retained version
    reads back bit-identical (count + id checksum against the
    oracle). Manifests are removed before batches, so a crash
    mid-vacuum can orphan files but never leave a manifest pointing
    at deleted data. See sources/versioned.vacuum_corpus."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        checkpoint_corpus,
        commit_corpus,
        read_corpus,
        vacuum_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="kspipeline-vacuum-")
    store = os.path.join(base, "corpus")
    commit_corpus(docs.where(F.col("doc_id") % 2 == 0), store, "even")
    commit_corpus(docs.where(F.col("doc_id") % 2 != 0), store, "odd")
    v3 = checkpoint_corpus(spark, store)
    stats = vacuum_corpus(store, v3)
    snap = read_corpus(spark, store, v3).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    ).collect()[0]
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [(
            stats["batches_removed"],
            stats["manifests_removed"],
            snap["n_docs"],
            snap["id_checksum"],
        )],
        "batches_removed long, manifests_removed long, "
        "n_docs long, id_checksum long",
    )


@register(
    "q_corpus_schema_evolution",
    oracle="""
        SELECT 1 AS version,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(2 AS BIGINT)        AS n_cols,
               CAST(0 AS BIGINT)        AS n_q_present,
               CAST(0 AS BIGINT)        AS sum_q
        FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT 2 AS version,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(3 AS BIGINT)        AS n_cols,
               CAST(sum(CASE WHEN doc_id >= 300 THEN 1 ELSE 0 END)
                    AS BIGINT)          AS n_q_present,
               CAST(sum(CASE WHEN doc_id >= 300
                             THEN n_chars % 100 ELSE 0 END)
                    AS BIGINT)          AS sum_q
        FROM documents
    """,
)
def q_corpus_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution UNDER time travel (round 8): batch 1
    commits (doc_id, n_chars); batch 2 adds a third column (qscore =
    n_chars % 100). Reading as-of v2 with ``merge_schema=True``
    unions the footer schemas — batch-1 rows surface NULL qscore —
    while reading as-of v1 AFTER the evolved commit still sees
    exactly the original two columns (manifest-pinned batches make
    evolution time-travel-consistent). Per version: row count,
    column count, non-null qscore count, and the qscore sum — the
    oracle recomputes all four from the documents slices, so a
    mis-merged schema, a null-padding error, or a leaked column into
    v1 all flip the hash. See sources/versioned.read_corpus."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="kspipeline-schevo-")
    store = os.path.join(base, "corpus")
    v1 = commit_corpus(
        docs.where(F.col("doc_id") < 300).select("doc_id", "n_chars"),
        store,
        "original schema",
    )
    v2 = commit_corpus(
        docs.where(F.col("doc_id") >= 300).select(
            "doc_id",
            "n_chars",
            (F.col("n_chars") % 100).cast("long").alias("qscore"),
        ),
        store,
        "adds qscore",
    )
    out_rows = []
    for v in (v1, v2):
        snap = read_corpus(spark, store, v, merge_schema=True)
        n_cols = len(snap.columns)
        agg = snap.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.count("qscore") if "qscore" in snap.columns else F.lit(0)
            )
            .cast("long")
            .alias("n_q_present"),
            (
                F.sum(F.coalesce(F.col("qscore"), F.lit(0)))
                if "qscore" in snap.columns
                else F.lit(0)
            )
            .cast("long")
            .alias("sum_q"),
        ).collect()[0]
        out_rows.append(
            (v, agg["n_docs"], n_cols, agg["n_q_present"], agg["sum_q"])
        )
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out_rows,
        "version int, n_docs long, n_cols long, n_q_present long, sum_q long",
    )


@register(
    "q_store_history",
    oracle="""
        WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n_all
                   FROM documents),
             e AS (SELECT CAST(count(*) AS BIGINT) AS n_even
                   FROM documents WHERE doc_id % 2 = 0),
             s AS (SELECT CAST(count(*) AS BIGINT) AS n_sev
                   FROM documents WHERE doc_id % 7 = 0)
        SELECT 'pre' AS phase, 1 AS version,
               CAST(1 AS BIGINT) AS n_batches,
               CAST(1 AS BIGINT) AS batches_added,
               'even half' AS note, n_even AS n_docs
        FROM e
        UNION ALL
        SELECT 'pre', 2, 2, 1, 'odd half', n_all FROM c
        UNION ALL
        SELECT 'pre', 3, 1, 1, 'checkpoint', n_all FROM c
        UNION ALL
        SELECT 'pre', 4, 2, 1, 'sevens', n_all + n_sev FROM c, s
        UNION ALL
        SELECT 'post', 3, 1, 1, 'checkpoint', n_all FROM c
        UNION ALL
        SELECT 'post', 4, 2, 1, 'sevens', n_all + n_sev FROM c, s
    """,
)
def q_store_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-log introspection (round 9): ``store_history`` — the
    DESCRIBE HISTORY analogue for the versioned corpus store — over
    the full lifecycle: two appends, a checkpoint (the row whose
    ``n_batches`` RESETS to 1 while still adding exactly one batch),
    a post-checkpoint append, then a vacuum. History is captured
    BEFORE the vacuum (all four versions visible with their notes
    and lineage lengths) and AFTER it (only the retained versions
    remain, exactly as their manifests do), and every listed version
    is read back for its row count — so the oracle hash ties the
    metadata log to the data it describes. O(versions) manifest
    reads, never a data scan, for the history itself.
    See sources/versioned.store_history."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        checkpoint_corpus,
        commit_corpus,
        read_corpus,
        store_history,
        vacuum_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="kspipeline-history-")
    store = os.path.join(base, "corpus")
    commit_corpus(docs.where(F.col("doc_id") % 2 == 0), store, "even half")
    commit_corpus(docs.where(F.col("doc_id") % 2 != 0), store, "odd half")
    v3 = checkpoint_corpus(spark, store)
    commit_corpus(docs.where(F.col("doc_id") % 7 == 0), store, "sevens")

    out_rows = []

    def _snapshot(phase: str) -> None:
        for h in store_history(spark, store).collect():
            n_docs = read_corpus(spark, store, h["version"]).count()
            out_rows.append((
                phase, h["version"], h["n_batches"],
                h["batches_added"], h["note"], n_docs,
            ))

    _snapshot("pre")
    vacuum_corpus(store, v3)
    _snapshot("post")
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out_rows,
        "phase string, version int, n_batches long, "
        "batches_added long, note string, n_docs long",
    )


@register(
    "q_streaming_outer_join",
    oracle="""
        SELECT p.event_id AS p_id, p.user_id,
               epoch_ms(p.ts) AS p_ts_ms,
               epoch_ms(c.ts) AS c_ts_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
    """,
)
def q_streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM LEFT OUTER join (round 9): the
    missing outer leg of q_streaming_join — purchases joined to the
    same user's clicks in the preceding 10 minutes, with purchases
    that never match emitting a NULL-padded row once the watermark
    passes their eligibility window (no future click can satisfy
    c_ts < p_ts after that). The replay appends a far-future
    SENTINEL row per side (filtered from the result): the outer
    results only flush when the watermark moves past every real
    purchase, and an availableNow stream's watermark otherwise stops
    one grace behind the last event — the same tail-flush hazard the
    session-window replay solved (round-6 lesson). Cross-batch cuts
    before each matched purchase force matched pairs through the
    join state store, so BOTH emission paths (state-served matches,
    watermark-evicted NULL rows) are certified against the one batch
    LEFT JOIN oracle."""
    import shutil

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
        )
        .where(F.col("event_type").isin("purchase", "click"))
        .collect()
    )
    rows = sorted(
        (r.asDict() for r in ev), key=lambda r: (r["ts_ms"], r["event_id"])
    )
    ev_df = spark.createDataFrame(
        rows, "event_id long, ts_ms long, user_id long, event_type string"
    )
    pp = ev_df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ms").alias("p_ms"),
    )
    cc = ev_df.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_ms").alias("c_ms")
    )
    matched = (
        pp.join(
            cc,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ms") >= F.col("p_ms") - 600_000)
            & (F.col("c_ms") < F.col("p_ms")),
        )
        .select("p_id")
        .distinct()
        .collect()
    )
    matched_ids = {r["p_id"] for r in matched}
    idx = {r["event_id"]: i for i, r in enumerate(rows)}
    cuts = [idx[p] for p in matched_ids]
    # Sentinels: one per side, 48 h past the last event (24 h grace
    # → final watermark lands 24 h past every real row). user_id -1
    # matches nothing; both are filtered from the emitted result.
    sentinel_ms = rows[-1]["ts_ms"] + 48 * 3_600_000
    rows.append({"event_id": -1, "ts_ms": sentinel_ms,
                 "user_id": -1, "event_type": "click"})
    rows.append({"event_id": -2, "ts_ms": sentinel_ms,
                 "user_id": -1, "event_type": "purchase"})
    base = tempfile.mkdtemp(prefix="kspipeline-sojoin-")
    src = os.path.join(base, "src")
    _write_event_chunks(rows, src, cuts)

    schema = "event_id long, ts_ms long, user_id long, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    p = (
        stream.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        )
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left_outer",
    ).select(
        "p_id",
        "user_id",
        F.unix_millis("p_ts").alias("p_ts_ms"),
        F.unix_millis("c_ts").alias("c_ts_ms"),
    )

    batches: list = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _e: batches.append(df.collect()))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError(
            "stream-stream outer join replay timed out after 300 s"
        )
    shutil.rmtree(base, ignore_errors=True)
    out = [
        (r["p_id"], r["user_id"], r["p_ts_ms"], r["c_ts_ms"])
        for b in batches
        for r in b
        if r["p_id"] >= 0  # sentinels are harness plumbing
    ]
    return spark.createDataFrame(
        out, "p_id long, user_id long, p_ts_ms long, c_ts_ms long"
    )


@register(
    "q_corpus_upsert",
    bench=True,
    oracle="""
        WITH fin AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN 7777
                        WHEN doc_id % 5 = 0 THEN n_chars + 1000
                        ELSE n_chars END AS n_chars
            FROM documents WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT doc_id + 1000000, n_chars * 2
            FROM documents WHERE doc_id % 9 = 0
        ),
        v2 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
                        ELSE n_chars END AS n_chars
            FROM documents
            UNION ALL
            SELECT doc_id + 1000000, n_chars * 2
            FROM documents WHERE doc_id % 9 = 0
        ),
        chg AS (
            SELECT doc_id, n_chars + 1000 AS n_chars
            FROM documents WHERE doc_id % 5 = 0
            UNION ALL
            SELECT doc_id + 1000000, n_chars * 2
            FROM documents WHERE doc_id % 9 = 0
            UNION ALL
            SELECT doc_id, 7777
            FROM documents WHERE doc_id % 7 = 0 AND doc_id % 10 <> 0
            UNION ALL
            SELECT doc_id, 0 FROM documents WHERE doc_id % 10 = 0
        )
        SELECT 'final' AS phase, CAST(doc_id % 3 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM fin GROUP BY doc_id % 3
        UNION ALL
        SELECT 'asof_v2', CAST(-1 AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT),
               CAST(sum(doc_id) AS BIGINT)
        FROM v2
        UNION ALL
        SELECT 'changes_v1_v3', CAST(-1 AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT),
               CAST(sum(doc_id) AS BIGINT)
        FROM chg
        UNION ALL
        SELECT 'compacted', CAST(doc_id % 3 AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT),
               CAST(sum(doc_id) AS BIGINT)
        FROM fin GROUP BY doc_id % 3
    """,
)
def q_corpus_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO, merge-on-read (round 9): the store's missing
    MERGE leg. v1 commits the base corpus; v2 upserts (doc_id%5
    re-scored to n_chars+1000) and inserts (doc_id%9 cloned to key
    +1e6 at n_chars*2); v3 re-scores doc_id%7 to 7777 and TOMBSTONES
    doc_id%10 — writes are O(delta), one appended batch each, no
    base rewrite. Certified against one oracle, four phases:
    the latest-wins MERGED read at head (per doc_id%3 bucket, so
    update-vs-insert-vs-delete resolution is row-level-bound into
    the hash — the CASE precedence in the oracle IS the batch
    precedence), the merged read AS OF v2 (time travel under
    upserts: the v3 correction invisible), the CDC changes read
    v1→v3 (raw deltas incl. tombstone rows — the retraction feed),
    and the post-``compact_corpus`` merged read (the MoR→CoW fold:
    bit-identical to pre-compact, now served from one base batch —
    asserted structurally via store_history n_batches==1).
    See sources/versioned.py upsert_corpus/read_corpus_latest/
    read_corpus_changes/compact_corpus."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        TOMBSTONE,
        commit_corpus,
        compact_corpus,
        read_corpus_latest,
        upsert_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = tempfile.mkdtemp(prefix="kspipeline-upsert-")
    store = os.path.join(base, "corpus")
    commit_corpus(docs, store, "base corpus")
    upsert_corpus(
        docs.where(F.col("doc_id") % 5 == 0)
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .unionByName(
            docs.where(F.col("doc_id") % 9 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                (F.col("n_chars") * 2).alias("n_chars"),
            )
        ),
        store,
        "doc_id",
        "rescore fives, insert nines",
    )
    upsert_corpus(
        docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 10 != 0))
        .withColumn("n_chars", F.lit(7777).cast("long"))
        .withColumn(TOMBSTONE, F.lit(False))
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 0).select(
                "doc_id",
                F.lit(0).cast("long").alias("n_chars"),
                F.lit(True).alias(TOMBSTONE),
            )
        ),
        store,
        "doc_id",
        "rescore sevens, retract tens",
    )

    def _bucketed(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy(
            (F.col("doc_id") % 3).cast("long").alias("bucket")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        ).select(F.lit(phase).alias("phase"), "*")

    # The three pre-compaction reads (merged head, merged AS OF v2,
    # CDC v1→v3) all resolve over the SAME v3 batch log, so compute
    # them in ONE pass: one log scan, one key-hash window shuffle
    # annotating each row with the newest _seq per key (overall and
    # within the v2 prefix), then each row emits the (phase, bucket)
    # groups it belongs to and a single aggregation produces all
    # phase rows. A union of the three per-read API calls costs
    # three scans and two key shuffles for the same answer (Catalyst
    # re-plans each branch separately — measured, not assumed).
    # Equal to the per-read API calls because (a) keys are unique
    # within every batch here, so "_seq == max(_seq) over key" IS
    # the window top-1, and (b) v2's batch list is a prefix of v3's,
    # so the as-of merge is the same max over the _seq <= 1 sub-log
    # and the CDC feed is _seq >= 1.
    from pyspark.sql import Window

    from kafka_streams_pipeline_spark.sources.versioned import (
        _SEQ,
        read_corpus_log,
    )

    log = read_corpus_log(spark, store)
    kw = Window.partitionBy("doc_id")
    live = ~F.coalesce(F.col(TOMBSTONE), F.lit(False))
    ann = log.withColumn("m_all", F.max(_SEQ).over(kw)).withColumn(
        "m_v2",
        F.max(F.when(F.col(_SEQ) <= 1, F.col(_SEQ))).over(kw),
    )
    phase_groups = F.array_compact(
        F.array(
            F.when(
                (F.col(_SEQ) == F.col("m_all")) & live,
                F.struct(
                    F.lit("final").alias("phase"),
                    (F.col("doc_id") % 3).cast("long").alias("bucket"),
                ),
            ),
            F.when(
                # & live: the read API's tombstone filter applies to
                # the as-of merge too (a no-op on this fixture — the
                # v2 prefix holds no true tombstones — but the fused
                # form must not silently assume that)
                (F.col(_SEQ) == F.col("m_v2")) & live,
                F.struct(
                    F.lit("asof_v2").alias("phase"),
                    F.lit(-1).cast("long").alias("bucket"),
                ),
            ),
            F.when(
                F.col(_SEQ) >= 1,
                F.struct(
                    F.lit("changes_v1_v3").alias("phase"),
                    F.lit(-1).cast("long").alias("bucket"),
                ),
            ),
        )
    )
    rows = (
        ann.select(
            "doc_id", "n_chars", F.explode(phase_groups).alias("pb")
        )
        .groupBy(F.col("pb.phase").alias("phase"), F.col("pb.bucket").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .collect()
    )

    compact_corpus(spark, store, "doc_id")
    # the lineage-length assertion is a manifest fact — read it on
    # the driver instead of collecting a one-row Spark frame
    from kafka_streams_pipeline_spark.sources.versioned import (
        store_history_rows,
    )

    head = max(store_history_rows(store), key=lambda r: r[0])
    if head[1] != 1:
        shutil.rmtree(base, ignore_errors=True)
        raise AssertionError(
            f"compact_corpus left {head[1]} batches in lineage"
        )
    rows += _bucketed(
        read_corpus_latest(spark, store, "doc_id"), "compacted"
    ).collect()
    shutil.rmtree(base, ignore_errors=True)
    from kafka_streams_pipeline_spark.session import local_rows_df

    return local_rows_df(
        spark,
        [tuple(r) for r in rows],
        "phase string, bucket long, n_docs long, chars_sum long, id_sum long",
    )


def _zorder_oracle() -> str:
    from kafka_streams_pipeline_spark.operators.layout import morton_key_sql

    return f"""
        WITH z AS (
            SELECT doc_id, n_chars,
                   {morton_key_sql("doc_id", "n_chars")} AS zkey
            FROM documents
        )
        SELECT 'readback' AS phase, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(zkey) AS BIGINT) AS z_sum
        FROM z
        UNION ALL
        SELECT 'disjoint_files', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    """


@register("q_zorder_layout", oracle=_zorder_oracle())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering (round 9): OPTIMIZE ZORDER BY for the
    training-data lake. documents(doc_id, n_chars) is rewritten as 8
    parquet files range-partitioned on the Morton interleave of both
    columns — every file gets a tight bounding box in BOTH
    dimensions, so min/max skipping serves predicates on either (the
    one-column-sorted layout serves only its sort column; the scan-
    metric proof lives in tests/test_plan_contracts.py). Certified:
    content preservation (count + per-column checksums), the curve
    key itself (sum of the 32-term bit interleave, recomputed on
    readback against the oracle's identical SQL unroll — bit order
    and mask are hash-bound), and the structural invariant that file
    z-ranges never interleave (range partitioning ⇒ 0 overlapping
    pairs, from per-file stats, regardless of sampled boundaries).
    One range shuffle; the key never persists.
    See operators/layout.py."""
    import shutil

    from kafka_streams_pipeline_spark.operators.layout import (
        morton_key,
        overlapping_file_pairs,
        zorder_file_stats,
        zorder_write,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = tempfile.mkdtemp(prefix="kspipeline-zorder-")
    out = os.path.join(base, "layout")
    zorder_write(docs, out, "doc_id", "n_chars", n_files=8)
    back = spark.read.parquet(out)
    content = back.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum("n_chars").cast("long").alias("chars_sum"),
        F.sum(morton_key(F.col("doc_id"), F.col("n_chars")))
        .cast("long")
        .alias("z_sum"),
    ).collect()[0]
    overlaps = overlapping_file_pairs(
        zorder_file_stats(spark, out, "doc_id", "n_chars")
    )
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                "readback",
                content["n_docs"],
                content["id_sum"],
                content["chars_sum"],
                content["z_sum"],
            ),
            ("disjoint_files", overlaps, 0, 0, 0),
        ],
        "phase string, n_docs long, id_sum long, chars_sum long, z_sum long",
    )


@register(
    "q_hll_incremental",
    oracle=_sk.hll_distinct_oracle("events", "user_id"),
)
def q_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sketch maintenance (round 9): distinct-user stats
    kept current across store versions WITHOUT rescanning the base —
    the composition the 100 TB posture is built from. The base
    events land as store v1 and their HLL REGISTER STATE (≤256
    (bucket,m) rows) is checkpointed to parquet; a delta commit makes
    v2; the maintenance job reads ONLY the CDC feed
    (read_corpus_changes v1→v2), sketches it, and merges with the
    persisted registers. Certified against the SAME oracle as
    q_hll_distinct over the full events table: the hash passes only
    if merge(state(base), state(delta)) ≡ state(base ∪ delta)
    register-for-register (the checksum binds every register), i.e.
    the persisted-merge path is bit-equal to the full rescan it
    replaces. n_exact comes from the merged store read — also the
    union. See operators/sketches.py hll_registers/
    hll_merge_registers and sources/versioned.read_corpus_changes."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus,
        read_corpus_changes,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    base_dir = tempfile.mkdtemp(prefix="kspipeline-hllinc-")
    store = os.path.join(base_dir, "events")
    sketch_dir = os.path.join(base_dir, "sketch-v1")
    commit_corpus(ev.where(F.col("event_id") % 10 < 7), store, "base")
    _sk.hll_registers(read_corpus(spark, store, 1), "user_id").write.parquet(
        sketch_dir
    )
    commit_corpus(ev.where(F.col("event_id") % 10 >= 7), store, "delta")
    merged = _sk.hll_merge_registers(
        spark.read.parquet(sketch_dir),
        _sk.hll_registers(
            read_corpus_changes(spark, store, 1, 2), "user_id"
        ),
    )
    out = _sk.hll_estimate_from_registers(merged).crossJoin(
        F.broadcast(
            read_corpus(spark, store, 2).agg(
                F.countDistinct("user_id").cast("long").alias("n_exact")
            )
        )
    )
    rows = out.collect()
    shutil.rmtree(base_dir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "hll_estimate double, n_registers_used long, "
        "register_checksum long, n_exact long",
    )


def _bloom_index_oracle() -> str:
    from kafka_streams_pipeline_spark.operators.sketches import (
        _bloom_pos_duck,
    )
    from kafka_streams_pipeline_spark.sources.bloom_index import INDEX_MBITS

    def pos(expr: str, i: int) -> str:
        return _bloom_pos_duck(expr, i, INDEX_MBITS)

    probes = "(VALUES (1),(2),(3),(12),(9999991),(9999993))"
    return f"""
        WITH probes AS (SELECT v FROM {probes} t(v)),
        bt AS (SELECT DISTINCT doc_id % 8 AS b FROM documents),
        kb AS (
            SELECT DISTINCT doc_id % 8 AS b, {pos("doc_id", 0)} AS p
            FROM documents
            UNION
            SELECT DISTINCT doc_id % 8, {pos("doc_id", 1)} FROM documents
            UNION
            SELECT DISTINCT doc_id % 8, {pos("doc_id", 2)} FROM documents
        ),
        cand AS (
            SELECT b FROM bt WHERE EXISTS (
                SELECT 1 FROM probes pr
                WHERE EXISTS (SELECT 1 FROM kb
                              WHERE kb.b = bt.b AND kb.p = {pos("pr.v", 0)})
                  AND EXISTS (SELECT 1 FROM kb
                              WHERE kb.b = bt.b AND kb.p = {pos("pr.v", 1)})
                  AND EXISTS (SELECT 1 FROM kb
                              WHERE kb.b = bt.b AND kb.p = {pos("pr.v", 2)})
            )
        )
        SELECT 'row' AS phase, CAST(doc_id AS BIGINT) AS a,
               CAST(n_chars AS BIGINT) AS b
        FROM documents WHERE doc_id IN (1, 2, 3, 12, 9999991, 9999993)
        UNION ALL
        SELECT 'prune', CAST(count(*) AS BIGINT),
               CAST((SELECT count(*) FROM bt) AS BIGINT)
        FROM cand
    """


@register("q_store_bloom_index", oracle=_bloom_index_oracle())
def q_store_bloom_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary index (round 9): per-batch Bloom pruning for point
    lookups on the versioned store — the file-skipping move for keys
    with no partition column. documents land as 8 batches (doc_id%8
    residues); the index stores each batch's md5-affine bit
    positions as kilobyte JSON next to the manifests; a 6-probe
    lookup (4 present, 2 absent) scans only candidate batches.
    Certified BOTH ways: the looked-up rows equal the direct IN-list
    (no false negatives — row-level hash-bound), and the PRUNING
    DECISION itself is recomputed by the oracle (candidate count
    from the same bloom membership in SQL) — so a hashing drift
    between the driver-side probe, the Spark index build, and the
    DuckDB recompute flips the hash. Incremental by construction:
    immutable batches mean an index file is forever valid and each
    maintenance call scans new batches only.
    See sources/bloom_index.py."""
    import shutil

    from kafka_streams_pipeline_spark.sources.bloom_index import (
        build_bloom_index,
        lookup_corpus,
    )
    from kafka_streams_pipeline_spark.sources.versioned import commit_corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = tempfile.mkdtemp(prefix="kspipeline-bloomidx-")
    store = os.path.join(base, "corpus")
    for i in range(8):
        commit_corpus(
            docs.where(F.col("doc_id") % 8 == i), store, f"residue {i}"
        )
    n_built = build_bloom_index(spark, store, "doc_id")
    if n_built != 8 or build_bloom_index(spark, store, "doc_id") != 0:
        shutil.rmtree(base, ignore_errors=True)
        raise AssertionError("index build not incremental as claimed")
    probes = [1, 2, 3, 12, 9999991, 9999993]
    found, stats = lookup_corpus(spark, store, "doc_id", probes)
    rows = [
        ("row", r["doc_id"], r["n_chars"])
        for r in found.select("doc_id", "n_chars").collect()
    ]
    rows.append(
        ("prune", stats["batches_scanned"], stats["batches_total"])
    )
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "phase string, a long, b long")


@register(
    "q_streaming_store_ingest",
    oracle=f"""
        WITH readings AS ({readings_from_events_sql('events')})
        SELECT 'sensor' AS phase, sensorId AS k,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(tempVal * 1000000) AS BIGINT))
                    AS BIGINT) AS sum_micros
        FROM readings WHERE tempVal IS NOT NULL
        GROUP BY sensorId
        UNION ALL
        SELECT 'meta', 'versions', CAST(6 AS BIGINT), CAST(0 AS BIGINT)
    """,
)
def q_streaming_store_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest into the versioned store (round
    9): the readings stream lands micro-batch-per-commit through the
    idempotent foreachBatch sink, WITH a simulated crash in the
    worst window — after incarnation 1, the newest checkpoint commit
    marker is deleted, so incarnation 2 REPLAYS that micro-batch;
    the sink recognizes the replay by its manifest note and skips
    it. Certified: the final store content equals the batch
    aggregate over all events exactly once (per-sensor counts +
    micros-integer sums — a duplicated or lost batch flips the
    hash), and the version count equals the 6 data chunks exactly
    (a double-commit would mint a 7th version and fail both the
    meta row and the sums). The harness additionally asserts the
    skip path actually fired (stats['skipped'] >= 1) — the replay
    is constructed, not hoped for.
    See streaming/store_sink.py."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.schema import READING_SCHEMA
    from kafka_streams_pipeline_spark.sources.versioned import (
        latest_version,
        read_corpus,
    )
    from kafka_streams_pipeline_spark.streaming.store_sink import (
        make_store_commit_sink,
    )

    rows = _sorted_replay_rows(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="kspipeline-ingest-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    store = os.path.join(base, "store")
    os.makedirs(src)
    n_chunks = 6
    per = (len(rows) + n_chunks - 1) // n_chunks
    mtime0 = _time.time() - 86_400
    for i in range(n_chunks):
        path = os.path.join(src, f"chunk{i}.json")
        with open(path, "w") as f:
            for r in rows[i * per : (i + 1) * per]:
                f.write(_json.dumps(r.asDict()) + "\n")
        os.utime(path, (mtime0 + i, mtime0 + i))

    stats: dict = {}
    sink = make_store_commit_sink(store, "ingest", stats)

    def run_once() -> None:
        q = (
            spark.readStream.schema(READING_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .where(F.col("tempVal").isNotNull())
            .select("sensorId", "timestamp", "tempVal")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            shutil.rmtree(base, ignore_errors=True)
            raise RuntimeError("store-ingest replay timed out after 300 s")
        # termination and the active-queries map update are not
        # atomic: a back-to-back restart on the same checkpoint can
        # race the cleanup and die with "multiple streaming queries
        # are concurrently using <ckpt>" — drain before returning
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

    # incarnation 1 — then crash in the worst window: the last
    # micro-batch's store commit landed but its checkpoint commit
    # marker did not
    run_once()
    commits = os.path.join(ckpt, "commits")
    newest = max(
        (f for f in os.listdir(commits) if f.isdigit()), key=int
    )
    os.unlink(os.path.join(commits, newest))
    # the local ChecksumFs keeps a .N.crc sidecar; leaving it makes
    # the replay's rename-based rewrite die with FileAlreadyExists
    # (surfaced as a bogus "multiple streaming queries" error)
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    run_once()  # incarnation 2: replays that batch + any new chunks

    if stats["skipped"] < 1:
        shutil.rmtree(base, ignore_errors=True)
        raise AssertionError(
            f"replay path not exercised: {stats} — crash simulation broken"
        )
    n_versions = latest_version(store)
    agg = (
        read_corpus(spark, store)
        .groupBy("sensorId")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("tempVal") * 1000000).cast("long"))
            .cast("long")
            .alias("sum_micros"),
        )
        .collect()
    )
    shutil.rmtree(base, ignore_errors=True)
    out = [("sensor", r["sensorId"], r["n"], r["sum_micros"]) for r in agg]
    out.append(("meta", "versions", n_versions, 0))
    return spark.createDataFrame(
        out, "phase string, k string, n long, sum_micros long"
    )


@register(
    "q_store_minmax_index",
    oracle="""
        WITH w AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS width
                   FROM documents),
        b AS (SELECT doc_id, n_chars, (doc_id * 6) // width AS bkt
              FROM documents, w),
        mm AS (SELECT bkt, min(doc_id) AS lo, max(doc_id) AS hi
               FROM b GROUP BY bkt),
        p AS (SELECT width // 3 AS plo, width // 2 AS phi FROM w)
        SELECT 'row' AS phase, CAST(doc_id AS BIGINT) AS a,
               CAST(n_chars AS BIGINT) AS b
        FROM b, p WHERE doc_id BETWEEN plo AND phi
        UNION ALL
        SELECT 'prune', CAST(count(*) AS BIGINT),
               CAST((SELECT count(*) FROM mm) AS BIGINT)
        FROM mm, p WHERE mm.lo <= phi AND plo <= mm.hi
    """,
)
def q_store_minmax_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range index (round 9): per-batch min/max column stats — the
    RANGE-pruning complement to the Bloom point index, i.e. Iceberg
    manifest column stats at batch-directory granularity. documents
    land as 6 doc_id-range batches; a doc_id BETWEEN width/3 AND
    width/2 scan touches only the batches whose recorded interval
    intersects the predicate. Certified BOTH ways, like the Bloom
    row: the returned rows equal the direct BETWEEN (row-level
    hash-bound) and the PRUNING DECISION is recomputed by the oracle
    from per-bucket min/max in SQL — index stats that drifted from
    the data would flip either the scanned count or the row set.
    See sources/bloom_index.py build_minmax_index/range_scan_corpus."""
    import shutil

    from kafka_streams_pipeline_spark.sources.bloom_index import (
        build_minmax_index,
        range_scan_corpus,
    )
    from kafka_streams_pipeline_spark.sources.versioned import commit_corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    width = docs.agg(F.max("doc_id") + 1).collect()[0][0]
    base = tempfile.mkdtemp(prefix="kspipeline-minmax-")
    store = os.path.join(base, "corpus")
    for i in range(6):
        commit_corpus(
            docs.where(F.expr(f"(doc_id * 6) div {width}") == i),
            store,
            f"range {i}",
        )
    n_built = build_minmax_index(spark, store, "doc_id")
    if n_built != 6 or build_minmax_index(spark, store, "doc_id") != 0:
        shutil.rmtree(base, ignore_errors=True)
        raise AssertionError("minmax index build not incremental")
    found, stats = range_scan_corpus(
        spark, store, "doc_id", width // 3, width // 2
    )
    rows = [
        ("row", r["doc_id"], r["n_chars"])
        for r in found.select("doc_id", "n_chars").collect()
    ]
    rows.append(("prune", stats["batches_scanned"], stats["batches_total"]))
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "phase string, a long, b long")


@register(
    "q_cms_incremental",
    oracle=_sk.cms_heavy_hitters_oracle("events", "event_type"),
)
def q_cms_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental frequency maintenance (round 9): the CMS twin of
    q_hll_incremental — base events land as store v1 and their
    counter matrix (≤ d·w rows) is checkpointed to parquet; a delta
    commit makes v2; the maintenance job sketches ONLY the CDC feed
    and merges by elementwise counter sum (CMS is a linear sketch).
    Certified against the SAME oracle as the full-rescan
    q_cms_heavy_hitters: the hash passes only if
    merge(sketch(base), sketch(delta)) ≡ sketch(base ∪ delta)
    counter-for-counter — every per-key estimate, exact count, and
    overcount must come out identical to the rescan it replaces.
    See operators/sketches.py cms_sketch/cms_merge/cms_probe_keys
    and sources/versioned.read_corpus_changes."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus,
        read_corpus_changes,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    base_dir = tempfile.mkdtemp(prefix="kspipeline-cmsinc-")
    store = os.path.join(base_dir, "events")
    sketch_dir = os.path.join(base_dir, "sketch-v1")
    commit_corpus(ev.where(F.col("event_id") % 10 < 7), store, "base")
    _sk.cms_sketch(
        read_corpus(spark, store, 1), "event_type"
    ).write.parquet(sketch_dir)
    commit_corpus(ev.where(F.col("event_id") % 10 >= 7), store, "delta")
    merged = _sk.cms_merge(
        spark.read.parquet(sketch_dir),
        _sk.cms_sketch(
            read_corpus_changes(spark, store, 1, 2), "event_type"
        ),
    )
    keys = (
        read_corpus(spark, store, 2)
        .where(F.col("event_type").isNotNull())
        .groupBy(F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    rows = _sk.cms_probe_keys(merged, keys).collect()
    shutil.rmtree(base_dir, ignore_errors=True)
    return spark.createDataFrame(
        rows, "key string, cms_estimate long, n_exact long, overcount long"
    )


@register(
    "q_gated_ingest",
    oracle="""
        SELECT 'commit1' AS phase, CAST(1 AS BIGINT) AS a,
               CAST(0 AS BIGINT) AS b
        UNION ALL
        SELECT 'commit2', CAST(0 AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM documents WHERE doc_id % 2 = 1 AND doc_id % 5 = 0
        UNION ALL
        SELECT 'commit3', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'store_versions', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'store_content', CAST(count(*) AS BIGINT),
               CAST(sum(n_chars) AS BIGINT)
        FROM documents
    """,
)
def q_gated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed ingest (round 9): commit-time quality gating on the
    versioned store. Batch 1 (even doc_ids) passes the gate
    (n_chars >= 1, doc_id not null) and commits; batch 2 (odd
    doc_ids with every fifth poisoned to n_chars = -5) is REJECTED
    with per-check violation counts and leaves the store untouched
    (no version minted — the oracle pins store_versions at 2, so a
    half-committed reject flips the hash); batch 3 (the clean odd
    rows) commits. Final store content equals the full documents
    table. The violation COUNT itself is oracle-recomputed, so the
    gate's arithmetic — not just its verdict — is hash-bound.
    See sources/versioned.commit_corpus_checked."""
    import shutil

    from kafka_streams_pipeline_spark.operators.quality import Check
    from kafka_streams_pipeline_spark.sources.versioned import (
        CommitRejectedError,
        commit_corpus_checked,
        latest_version,
        read_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    checks = [
        Check("chars_positive", "in_range", "n_chars", lo=1),
        Check("doc_id_not_null", "not_null", "doc_id"),
    ]
    base = tempfile.mkdtemp(prefix="kspipeline-gated-")
    store = os.path.join(base, "corpus")
    rows: list = []

    commit_corpus_checked(
        docs.where(F.col("doc_id") % 2 == 0), store, checks, "evens"
    )
    rows.append(("commit1", 1, 0))

    poisoned = docs.where(F.col("doc_id") % 2 != 0).withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 5 == 0, F.lit(-5).cast("long")).otherwise(
            F.col("n_chars")
        ),
    )
    try:
        commit_corpus_checked(poisoned, store, checks, "odds poisoned")
        shutil.rmtree(base, ignore_errors=True)
        raise AssertionError("poisoned batch passed the gate")
    except CommitRejectedError as exc:
        rows.append(("commit2", 0, exc.violations.get("chars_positive", -1)))

    commit_corpus_checked(
        docs.where(F.col("doc_id") % 2 != 0), store, checks, "odds clean"
    )
    rows.append(("commit3", 1, 0))
    rows.append(("store_versions", latest_version(store), 0))
    content = read_corpus(spark, store).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
    ).collect()[0]
    rows.append(("store_content", content["n"], content["s"]))
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "phase string, a long, b long")


@register("q_gzip_source", oracle=_SOURCE_AGG_ORACLE)
def q_gzip_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1b source breadth (round 9): gzip-compressed JSON-lines —
    the wire format most web-scale text corpora actually arrive in
    (.jsonl.gz shards). Events are serialized to JSONL, compressed
    with stdlib gzip at two different levels across shards (codec
    headers differ, content must not), and read back through
    Spark's native transparent-decompression path with an explicit
    schema + the PERMISSIVE corrupt-record guard (one malformed
    line injected INSIDE a valid gzip stream proves corruption
    detection operates on the DECOMPRESSED bytes). Same oracle as
    the CSV/ORC rows: the per-type aggregate over clean parquet —
    decode drift or a leaked corrupt row flips the hash."""
    import gzip
    import json as _json
    import shutil

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    base = tempfile.mkdtemp(prefix="kspipeline-gz-")
    events = (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    )
    rows = sorted(events, key=lambda r: r["event_id"])
    half = len(rows) // 2
    for i, (chunk, level) in enumerate(
        [(rows[:half], 1), (rows[half:], 9)]
    ):
        with gzip.open(
            os.path.join(base, f"part{i}.jsonl.gz"),
            "wt",
            compresslevel=level,
        ) as f:
            for r in chunk:
                f.write(_json.dumps(r.asDict()) + "\n")
            if i == 0:
                f.write('{"event_id": "oops", not json\n')
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("_corrupt", StringType()),
        ]
    )
    decoded = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(base + "/*.jsonl.gz")
        .where(
            F.col("_corrupt").isNull()
            & F.col("event_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
        )
    )
    out = _source_agg(decoded)
    result = out.collect()
    schema_out = out.schema
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(result, schema_out)


def _hist_inc_oracle() -> str:
    from kafka_streams_pipeline_spark.operators.sketches import (
        histogram_sketch_sql,
    )

    return f"""
        WITH h AS ({histogram_sketch_sql('documents', 'n_chars', 0, 1024, 32)}),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
        cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin
                    ROWS UNBOUNDED PRECEDING) AS cum FROM h)
        SELECT 'bin' AS phase, bin AS a, cnt AS b FROM h
        UNION ALL
        SELECT 'quantile', q, CAST(min(bin) AS BIGINT)
        FROM (VALUES (25), (50), (75), (95)) t(q), cum, tot
        WHERE cum * 100 >= q * n
        GROUP BY q
    """


@register("q_histogram_incremental", oracle=_hist_inc_oracle())
def q_histogram_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rank maintenance (round 9): the third leg of the
    mergeable-state trio (HLL distincts, CMS frequencies, histogram
    RANKS). Base documents land as store v1 and their n_chars
    histogram state (≤34 bin rows over the declared [0,1024)/32
    domain, explicit overflow bins) is checkpointed to parquet; a
    delta commit makes v2; the maintenance job sketches ONLY the CDC
    feed and merges by per-bin sum. Certified against the oracle's
    full-table histogram bin-for-bin PLUS the percentile-disc bin
    for p25/50/75/95 computed from the merged state with float-free
    integer rank arithmetic (cum·100 ≥ q·n) — so the incremental
    path must reproduce both the distribution and its quantile reads
    exactly. See operators/sketches.py histogram_sketch/
    histogram_merge/histogram_quantile_bins."""
    import shutil

    from kafka_streams_pipeline_spark.operators.sketches import (
        histogram_merge,
        histogram_quantile_bins,
        histogram_sketch,
    )
    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus,
        read_corpus_changes,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base_dir = tempfile.mkdtemp(prefix="kspipeline-histinc-")
    store = os.path.join(base_dir, "docs")
    sketch_dir = os.path.join(base_dir, "sketch-v1")
    commit_corpus(docs.where(F.col("doc_id") % 10 < 7), store, "base")
    histogram_sketch(
        read_corpus(spark, store, 1), "n_chars", 0, 1024, 32
    ).write.parquet(sketch_dir)
    commit_corpus(docs.where(F.col("doc_id") % 10 >= 7), store, "delta")
    merged = histogram_merge(
        spark.read.parquet(sketch_dir),
        histogram_sketch(
            read_corpus_changes(spark, store, 1, 2), "n_chars", 0, 1024, 32
        ),
    )
    bins = [("bin", r["bin"], r["cnt"]) for r in merged.collect()]
    qs = [
        ("quantile", r["q"], r["bin"])
        for r in histogram_quantile_bins(merged, [25, 50, 75, 95]).collect()
    ]
    shutil.rmtree(base_dir, ignore_errors=True)
    return spark.createDataFrame(
        bins + qs, "phase string, a long, b long"
    )


def _streaming_hist_oracle() -> str:
    from kafka_streams_pipeline_spark.streaming.stateful import (
        HIST_HI,
        HIST_LO,
        HIST_NBINS,
        HIST_W,
    )

    return f"""
        WITH readings AS ({readings_from_events_sql('events')}),
        b AS (
            SELECT substring(geohash, 1, 6) AS gh,
                   CASE WHEN m < {HIST_LO} THEN -1
                        WHEN m >= {HIST_HI} THEN {HIST_NBINS}
                        ELSE (m - {HIST_LO}) // {HIST_W} END AS bin
            FROM (SELECT geohash,
                         CAST(round(tempVal * 1000000) AS BIGINT) AS m
                  FROM readings WHERE tempVal IS NOT NULL)
        )
        SELECT gh, CAST(count(*) AS BIGINT) AS n_values,
               CAST(sum(bin + 2) AS BIGINT) AS chk1,
               CAST(sum((bin + 2) * (bin + 2)) AS BIGINT) AS chk2
        FROM b GROUP BY gh
    """


@register("q_streaming_histogram", oracle=_streaming_hist_oracle())
def q_streaming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming histogram state (round 9): per-cell value histogram
    via applyInPandasWithState, replayed with availableNow — the
    streaming twin of the batch histogram_sketch, completing the
    batch/stream symmetry of all three mergeable sketch families.
    Values round to micros IN THE JVM PLAN (HALF_UP — the SQL rule;
    numpy/python round is HALF_EVEN and diverges on exact ties,
    round-5 lesson) before the state function, so binning is pure
    integer arithmetic and batch boundaries cannot move a value
    across a bin edge. Duplicate injection OFF (counts physical
    rows). The LAST emission per cell is the final state; the oracle
    recomputes count + both weighted bin checksums per cell in SQL.
    See streaming/stateful.py histogram_cell_state."""
    from kafka_streams_pipeline_spark.streaming.stateful import (
        histogram_cell_state,
    )

    batches = _replay_readings_stream(
        spark, sf_dir, histogram_cell_state, "update", inject_dups=False
    )
    final: dict = {}
    for b in batches:
        for r in b:
            final[r["gh"]] = (r["n_values"], r["chk1"], r["chk2"])
    return spark.createDataFrame(
        [(k, n, c1, c2) for k, (n, c1, c2) in final.items()],
        "gh string, n_values long, chk1 long, chk2 long",
    )


@register("q_avro_source", oracle=_SOURCE_AGG_ORACLE)
def q_avro_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1b source breadth (round 9): Avro Object Container Files —
    the leg previously environment-blocked (no spark-avro DataSource
    jar; re-probed every round), now served Spark-first the way
    every binary format here is: binaryFile ingestion + a
    partition-local stdlib OCF codec behind the sanctioned
    mapInPandas boundary. The writer emits byte-deterministic
    null-codec containers (fixed sync marker, 3 shard files, small
    blocks so the block walk is real); the reader validates magic,
    metadata codec, per-block byte accounting, AND every block's
    trailing sync marker (truncation/splice fails loudly). Zigzag
    varints are pinned to the spec's own example vectors in pytest.
    Same clean-parquet aggregate oracle as the CSV/ORC/gzip rows."""
    import shutil

    from kafka_streams_pipeline_spark.operators.multimodal import (
        avro_ocf_bytes,
        decode_avro_events,
    )

    schema_json = (
        '{"type":"record","name":"Event","fields":['
        '{"name":"event_id","type":"long"},'
        '{"name":"user_id","type":"long"},'
        '{"name":"event_type","type":"string"},'
        '{"name":"value","type":"double"}]}'
    )
    rows = sorted(
        (
            (r["event_id"], r["user_id"], r["event_type"], r["value"])
            for r in _t(spark, sf_dir, "events")
            .select("event_id", "user_id", "event_type", "value")
            .collect()
        ),
    )
    base = tempfile.mkdtemp(prefix="kspipeline-avro-")
    third = (len(rows) + 2) // 3
    for i in range(3):
        shard = rows[i * third : (i + 1) * third]
        with open(os.path.join(base, f"events{i}.avro"), "wb") as f:
            f.write(
                avro_ocf_bytes(
                    schema_json,
                    shard,
                    sync=bytes([i] * 16),
                    rows_per_block=200,
                )
            )
    decoded = decode_avro_events(
        spark.read.format("binaryFile")
        .load(base + "/*.avro")
        .select(F.col("content").alias("payload"))
    )
    out = _source_agg(decoded)
    result = out.collect()
    schema_out = out.schema
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(result, schema_out)


def _hist_by_oracle() -> str:
    from kafka_streams_pipeline_spark.operators.sketches import (
        histogram_sketch_by_sql,
    )

    return histogram_sketch_by_sql(
        "documents", "lang", "n_chars", 0, 1024, 32
    )


@register("q_histogram_by_group", oracle=_hist_by_oracle())
def q_histogram_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped histogram ranks (round 9): per-language n_chars
    distribution state — the per-dimension production shape of the
    ranks family, mirroring q_hll_by_group for distincts. Every
    (group, bin, count) row is hash-bound; ≤ groups·34 output rows
    from one aggregate pass, map-side partials doing the work.
    See operators/sketches.histogram_sketch_by."""
    from kafka_streams_pipeline_spark.operators.sketches import (
        histogram_sketch_by,
    )

    return histogram_sketch_by(
        _t(spark, sf_dir, "documents"), "lang", "n_chars", 0, 1024, 32
    )


def _decon_bench_pred_sql() -> str:
    from kafka_streams_pipeline_spark.functions.hashing import md5_long_sql

    return (
        f"{md5_long_sql(chr(39) + 'bench:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')}"
        " % 61 = 0"
    )


@register(
    "q_streaming_decontaminate",
    oracle=None,  # set right below (needs the operator's oracle builder)
)
def q_streaming_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest decontamination — the STREAM-STATIC broadcast
    join leg of Structured Streaming (the one join mode the registry
    didn't yet certify; stateless, append-safe, no watermark): live
    documents explode to hashed 8-gram shingles inside the streaming
    plan and join the STATIC benchmark n-gram frame, so contaminated
    ingest is flagged at arrival time without any state store. The
    replay writes the corpus as 4 time-ordered JSON chunks (one
    micro-batch each); emissions are the matched (doc_id, n-gram,
    eval_id) rows, re-aggregated batch-side to the same grain —
    and the same oracle — as batch q_decontaminate. See
    operators/text.decontaminate for the batch twin and scale
    notes."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.operators.dedup import (
        _spark_hash,
        spark_shingles_expr,
    )
    from kafka_streams_pipeline_spark.operators.text import DECON_N

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(
        md5_long(F.concat(F.lit("bench:"), F.col("doc_id").cast("string")))
        % 61
        == 0
    )
    # string shingles + post-explode codegen'd hash — same
    # restructure as batch decontaminate (round 10)
    sh = spark_shingles_expr("toks", DECON_N)
    h = _spark_hash("ng_str")
    target = spark.sparkContext.defaultParallelism
    if bench.rdd.getNumPartitions() < target:
        bench = bench.repartition(target)
    bench_ngrams = (
        bench.withColumn("toks", F.split("text", " "))
        .select(
            F.col("doc_id").alias("eval_id"),
            F.explode_outer(F.expr(sh)).alias("ng_str"),
        )
        .where(F.col("ng_str").isNotNull())
        .select("eval_id", F.expr(h).alias("ng"))
        .distinct()
    )

    base = tempfile.mkdtemp(prefix="kspipeline-decon-")
    src = os.path.join(base, "src")
    os.makedirs(src)
    rows = docs.collect()
    n_chunks, m0 = 4, _time.time() - 86_400
    per = (len(rows) + n_chunks - 1) // n_chunks
    for c in range(n_chunks):
        p = os.path.join(src, f"chunk{c}.json")
        with open(p, "w") as f:
            for r in rows[c * per : (c + 1) * per]:
                f.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(p, (m0 + c, m0 + c))  # ascending mtimes (round-6 lesson)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    corpus_ngrams = (
        stream.withColumn("toks", F.split("text", " "))
        .withColumn("ngs", F.expr(sh))
        .select(
            "doc_id",
            F.expr("size(ngs)").cast("long").alias("total_ngrams"),
            F.explode_outer("ngs").alias("ng_str"),
        )
        .where(F.col("ng_str").isNotNull())
        .select("doc_id", "total_ngrams", F.expr(h).alias("ng"))
    )
    hits = corpus_ngrams.join(F.broadcast(bench_ngrams), "ng")

    emissions: list = []

    def sink(batch_df: DataFrame, _epoch_id: int) -> None:
        emissions.extend(batch_df.collect())

    q = (
        hits.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("availableNow replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)

    out = spark.createDataFrame(
        emissions, "ng long, doc_id long, total_ngrams long, eval_id long"
    )
    return (
        out.groupBy("doc_id")
        .agg(
            F.countDistinct("ng").cast("long").alias("matched_ngrams"),
            F.countDistinct("eval_id").cast("long").alias("eval_docs_hit"),
            F.max("total_ngrams").cast("long").alias("total_ngrams"),
        )
        .select(
            "doc_id",
            "matched_ngrams",
            "eval_docs_hit",
            "total_ngrams",
            F.expr("(matched_ngrams * 1000000) div total_ngrams")
            .cast("long")
            .alias("contamination_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLES["q_streaming_decontaminate"] = _text.decontaminate_oracle(
    _decon_bench_pred_sql()
)


@register(
    "q_store_tags",
    oracle="""
        SELECT 'baseline' AS tag, 1 AS version,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT 'prod' AS tag, 2 AS version,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM documents
    """,
)
def q_store_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named refs (round 10): Iceberg/Delta-style TAGS over the
    versioned store — immutable named pointers a training run pins
    instead of raw version numbers, with RETENTION SAFETY: vacuum
    refuses to drop a version a tag still references. Lifecycle
    certified here: commit the even half (v1, tagged 'baseline'),
    commit the rest (v2, tagged 'prod'), prove a vacuum below
    'baseline' fails LOUDLY and leaves both tag reads bit-identical,
    then read both tags back and bind (tag, version, count,
    id-checksum) into the oracle. Retag without force must refuse;
    the whole probe-and-write runs under the commit lock, so tags
    can never race a vacuum. See sources/versioned.tag_corpus."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus_tag,
        tag_corpus,
        vacuum_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="kspipeline-tags-")
    store = os.path.join(base, "corpus")
    commit_corpus(docs.where(F.col("doc_id") % 2 == 0), store, "even half")
    tag_corpus(store, "baseline")
    commit_corpus(docs.where(F.col("doc_id") % 2 != 0), store, "odd half")
    tag_corpus(store, "prod")
    # retention safety: dropping v1 while 'baseline' pins it must fail
    try:
        vacuum_corpus(store, keep_from_version=2)
        raise AssertionError("vacuum ignored a tag pin")
    except ValueError:
        pass
    # immutability: silent retag must refuse
    try:
        tag_corpus(store, "baseline", version=2)
        raise AssertionError("retag without force succeeded")
    except ValueError:
        pass
    out_rows = []
    for tag, version in (("baseline", 1), ("prod", 2)):
        snap = read_corpus_tag(spark, store, tag).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        ).collect()[0]
        out_rows.append((tag, version, snap["n_docs"], snap["id_checksum"]))
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out_rows, "tag string, version int, n_docs long, id_checksum long"
    )


def _drift_slice_profile_sql(mod: int, cols: list[str]) -> str:
    """Per-column exact profile of the documents slice
    ``doc_id % 4 = mod`` (the deterministic micro-batch split the
    streaming drift row replays)."""
    parts = []
    for c in cols:
        parts.append(f"""
        SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count({c}) AS BIGINT) AS n_nonnull,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM documents WHERE doc_id % 4 = {mod}""")
    return " UNION ALL ".join(parts)


_DRIFT_STREAM_COLS = ["lang", "source", "n_chars"]


def _streaming_drift_oracle() -> str:
    legs = []
    for seq in (1, 2, 3):
        legs.append(f"""
        SELECT {seq} AS batch_seq, po.col_name,
               po.n_rows AS rows_old, pn.n_rows AS rows_new,
               CAST(abs((pn.n_nonnull * 1000000) // pn.n_rows
                      - (po.n_nonnull * 1000000) // po.n_rows) AS BIGINT)
                   AS nonnull_drift_ppm,
               CAST((abs(pn.n_distinct - po.n_distinct) * 1000000)
                    // po.n_distinct AS BIGINT) AS distinct_drift_ppm,
               (po.min_value != pn.min_value
                OR po.max_value != pn.max_value) AS minmax_changed
        FROM ({_drift_slice_profile_sql(seq - 1, _DRIFT_STREAM_COLS)}) po
        JOIN ({_drift_slice_profile_sql(seq, _DRIFT_STREAM_COLS)}) pn
          ON po.col_name = pn.col_name""")
    return " UNION ALL ".join(legs)


@register("q_streaming_drift", oracle=_streaming_drift_oracle())
def q_streaming_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DRIFT MONITOR (round 10): per-micro-batch column
    profiles computed inside foreachBatch (each batch is one
    O(columns) profile — the whylogs deployment shape), then
    consecutive-batch drift via the same ppm arithmetic as
    q_profile_drift. The replay splits documents into 4
    deterministic micro-batches (doc_id mod 4, one file each,
    ascending mtimes), so the oracle recomputes every batch's
    profile and every drift row from the slices alone. Emits
    (batch_seq, col_name, rows, non-null/distinct drift ppm,
    min/max movement) for each consecutive pair. See
    operators/quality.table_profile / profile_drift."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.operators.quality import (
        profile_drift,
        table_profile,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    base = tempfile.mkdtemp(prefix="kspipeline-sdrift-")
    src = os.path.join(base, "src")
    os.makedirs(src)
    rows = docs.collect()
    m0 = _time.time() - 86_400
    for c in range(4):
        p = os.path.join(src, f"chunk{c}.json")
        with open(p, "w") as f:
            for r in rows:
                if r["doc_id"] % 4 == c:
                    f.write(
                        _json.dumps(
                            {
                                "doc_id": r["doc_id"],
                                "lang": r["lang"],
                                "source": r["source"],
                                "n_chars": r["n_chars"],
                            }
                        )
                        + "\n"
                    )
        os.utime(p, (m0 + c, m0 + c))

    profiles: list = []  # (batch_id, profile rows)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        prof = table_profile(
            batch_df.select("lang", "source", "n_chars")
        ).collect()
        profiles.append((batch_id, prof))

    q = (
        spark.readStream.schema(
            "doc_id long, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("availableNow replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)

    profiles.sort(key=lambda t: t[0])
    schema = (
        "col_name string, n_rows long, n_nonnull long, n_distinct long,"
        " min_value string, max_value string"
    )
    out = None
    for seq in range(1, len(profiles)):
        old = spark.createDataFrame(
            [tuple(r) for r in profiles[seq - 1][1]], schema
        )
        new = spark.createDataFrame(
            [tuple(r) for r in profiles[seq][1]], schema
        )
        leg = profile_drift(old, new).select(
            F.lit(seq).cast("long").alias("batch_seq"),
            "col_name",
            "rows_old",
            "rows_new",
            "nonnull_drift_ppm",
            "distinct_drift_ppm",
            "minmax_changed",
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("batch_seq", "col_name")


@register(
    "q_store_text_index",
    oracle="""
        WITH aug AS (
            SELECT doc_id, n_chars,
                   CASE WHEN doc_id % 8 = 3
                        THEN lower(text) || ' takedownmark'
                        ELSE lower(text) END AS ltext
            FROM documents
        ),
        m AS (
            SELECT doc_id, n_chars FROM aug
            WHERE list_contains(string_split(ltext, ' '), 'takedownmark')
              AND list_contains(string_split(ltext, ' '), 'window')
        ),
        cand AS (
            SELECT CAST(count(*) AS BIGINT) AS scanned FROM (
                SELECT doc_id % 8 AS b,
                       max(CASE WHEN list_contains(
                               string_split(ltext, ' '), 'takedownmark')
                           THEN 1 ELSE 0 END) AS h1,
                       max(CASE WHEN list_contains(
                               string_split(ltext, ' '), 'window')
                           THEN 1 ELSE 0 END) AS h2
                FROM aug GROUP BY 1
            ) WHERE h1 = 1 AND h2 = 1
        )
        SELECT 'row' AS phase, doc_id AS a, n_chars AS b FROM m
        UNION ALL
        SELECT 'prune', scanned, CAST(8 AS BIGINT) FROM cand
    """,
)
def q_store_text_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted text index over the versioned store (round 10): the
    posting-list complement of the Bloom index — conjunctive term
    search that never rescans text. documents land as 8 residue
    batches with batch 3's text carrying a 'takedownmark' appendix
    (the takedown-audit shape); the per-batch (token, doc_id)
    postings are built once, incrementally, sorted by token. The
    search AND('takedownmark', 'window') must (1) prune to exactly
    the 1 batch whose index contains both terms — the decision is
    recomputed by the oracle from the same tokenization, so scanning
    8 batches OR the wrong 1 flips the hash — (2) resolve matching
    doc_ids from postings alone, and (3) fetch payloads from the
    candidate batch only. Incremental build asserted (second call
    indexes 0 batches). See sources/text_index.py."""
    import shutil

    from kafka_streams_pipeline_spark.sources.text_index import (
        build_text_index,
        search_text_index,
    )
    from kafka_streams_pipeline_spark.sources.versioned import commit_corpus

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(
            F.col("doc_id") % 8 == 3,
            F.concat(F.lower(F.col("text")), F.lit(" takedownmark")),
        )
        .otherwise(F.lower(F.col("text")))
        .alias("text"),
    )
    base = tempfile.mkdtemp(prefix="kspipeline-textidx-")
    store = os.path.join(base, "corpus")
    try:
        for i in range(8):
            commit_corpus(
                docs.where(F.col("doc_id") % 8 == i), store, f"residue {i}"
            )
        n_built = build_text_index(spark, store, "text")
        if n_built != 8 or build_text_index(spark, store, "text") != 0:
            raise AssertionError("index build not incremental as claimed")
        found, stats = search_text_index(
            spark, store, ["takedownmark", "window"], "text"
        )
        rows = [
            ("row", r["doc_id"], r["n_chars"])
            for r in found.select("doc_id", "n_chars").collect()
        ]
        rows.append(
            ("prune", stats["batches_scanned"], stats["batches_total"])
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "phase string, a long, b long")


@register(
    "q_streaming_semi_join",
    oracle="""
        SELECT p.event_id AS p_id, p.user_id, epoch_ms(p.ts) AS p_ts_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        WHERE EXISTS (
            SELECT 1 FROM events c
            WHERE c.event_type = 'click'
              AND c.user_id = p.user_id
              AND c.ts >= p.ts - INTERVAL 10 MINUTE
              AND c.ts <  p.ts
        )
    """,
)
def q_streaming_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI join (round 10), completing the
    streaming join family (inner = q_streaming_join, left outer =
    q_streaming_outer_join): purchases that HAD a click from the
    same user in the preceding 10 minutes, emitted ONCE with no
    click payload — the streaming EXISTS. Same constructed
    cross-batch property as the inner row: a micro-batch boundary is
    cut right before each matched purchase, so every emission is
    served from the buffered click STATE, and semi-join
    at-most-once emission is certified by the oracle's DISTINCT
    (EXISTS) shape — a double emission would flip the row count.
    With time-ordered chunks nothing crosses the 24 h grace, so the
    emitted set equals the batch semi join exactly."""
    import shutil

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
        )
        .where(F.col("event_type").isin("purchase", "click"))
        .collect()
    )
    rows = sorted(
        (r.asDict() for r in ev), key=lambda r: (r["ts_ms"], r["event_id"])
    )
    ev_df = spark.createDataFrame(
        rows, "event_id long, ts_ms long, user_id long, event_type string"
    )
    pp = ev_df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ms").alias("p_ms"),
    )
    cc = ev_df.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_ms").alias("c_ms")
    )
    matched = (
        pp.join(
            cc,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ms") >= F.col("p_ms") - 600_000)
            & (F.col("c_ms") < F.col("p_ms")),
        )
        .select("p_id")
        .distinct()
        .collect()
    )
    matched_ids = {r["p_id"] for r in matched}
    idx = {r["event_id"]: i for i, r in enumerate(rows)}
    cuts = [idx[p] for p in matched_ids]
    base = tempfile.mkdtemp(prefix="kspipeline-ssemi-")
    src = os.path.join(base, "src")
    _write_event_chunks(rows, src, cuts)

    schema = "event_id long, ts_ms long, user_id long, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    p = (
        stream.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        )
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left_semi",
    ).select(
        "p_id",
        "user_id",
        F.unix_millis("p_ts").alias("p_ts_ms"),
    )

    batches: list = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _e: batches.append(df.collect()))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("stream-stream semi join replay timed out")
    shutil.rmtree(base, ignore_errors=True)
    out = [
        (r["p_id"], r["user_id"], r["p_ts_ms"])
        for b in batches
        for r in b
    ]
    return spark.createDataFrame(out, "p_id long, user_id long, p_ts_ms long")


@register(
    "q_store_version_diff",
    oracle="""
        WITH cls AS (
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 3 != 0 AND doc_id % 7 = 0
                       THEN 'removed'
                     WHEN doc_id % 3 = 0 AND doc_id % 5 = 0
                          AND doc_id % 7 != 0
                       THEN 'added'
                     WHEN doc_id % 3 != 0 AND doc_id % 5 = 0
                          AND doc_id % 7 != 0
                       THEN 'changed'
                     WHEN doc_id % 3 != 0 AND doc_id % 5 != 0
                          AND doc_id % 7 != 0
                       THEN 'unchanged'
                   END AS change_type
            FROM documents
        )
        SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(doc_id) AS BIGINT) AS key_checksum
        FROM cls WHERE change_type IS NOT NULL
        GROUP BY change_type ORDER BY change_type
    """,
)
def q_store_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5ah store version diff (round 11): semantic added / removed /
    changed / unchanged summary between two MoR store versions — v1
    is the doc_id%3!=0 slice, v2 upserts every doc_id%5==0 doc with
    lang rewritten to 'xx' (changing survivors, adding the %3==0
    ones), v3 tombstones doc_id%7==0. Diff(v1, v3) resolves both
    snapshots latest-wins and classifies via a full-outer join of
    (key, partition-local md5 of non-key columns) — text never
    crosses the wire; key_checksum pins per-class membership. The
    oracle derives the same classes arithmetically from the modulus
    construction. See sources/versioned.version_diff."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        TOMBSTONE,
        upsert_corpus,
        version_diff,
    )

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="kspipeline-vdiff-")
    store = os.path.join(base, "corpus")
    upsert_corpus(
        docs.where(F.col("doc_id") % 3 != 0), store, "doc_id", "base slice"
    )
    upsert_corpus(
        docs.where(F.col("doc_id") % 5 == 0).withColumn("lang", F.lit("xx")),
        store,
        "doc_id",
        "rescore fives",
    )
    upsert_corpus(
        docs.where(F.col("doc_id") % 7 == 0)
        .select("doc_id")
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("lang", F.lit(None).cast("string"))
        .withColumn("source", F.lit(None).cast("string"))
        .withColumn("n_chars", F.lit(None).cast("long"))
        .withColumn(TOMBSTONE, F.lit(True)),
        store,
        "doc_id",
        "takedown sevens",
    )
    out = version_diff(spark, store, "doc_id", 1, 3)
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(base, ignore_errors=True)
    return out


def _neardup_oracle_sql() -> str:
    """Batch twin of the stream-static near-dup flagging: cross-split
    band-collision candidates (stream = odd doc_ids, reference = even)
    verified with the exact integer Jaccard predicate 5·∩ ≥ 4·∪."""
    from kafka_streams_pipeline_spark.operators.dedup import (
        SHINGLE_N,
        duck_band_keys_expr,
        duck_hashed_shingles_expr,
        duck_minhash_exprs,
    )

    mh_list = "[" + ", ".join(duck_minhash_exprs("shh")) + "]"
    return f"""
        WITH sig AS (
            SELECT doc_id, shh, {mh_list} AS mhs FROM (
                SELECT doc_id, {duck_hashed_shingles_expr('toks')} AS shh
                FROM (SELECT doc_id, string_split(text, ' ') AS toks
                      FROM documents)
                WHERE len(toks) >= {SHINGLE_N}
            )
        ),
        bands AS (
            SELECT doc_id, unnest({duck_band_keys_expr('mhs')}) AS bk
            FROM sig
        ),
        cand AS (
            SELECT DISTINCT s.doc_id AS doc_id, r.doc_id AS ref_id
            FROM bands s JOIN bands r ON s.bk = r.bk
            WHERE s.doc_id % 2 = 1 AND r.doc_id % 2 = 0
        ),
        verified AS (
            SELECT cand.doc_id, cand.ref_id,
                   len(list_intersect(a.shh, b.shh)) AS n_common,
                   len(a.shh) + len(b.shh)
                       - len(list_intersect(a.shh, b.shh)) AS n_union
            FROM cand
            JOIN sig a ON cand.doc_id = a.doc_id
            JOIN sig b ON cand.ref_id = b.doc_id
        ),
        dups AS (
            SELECT doc_id, ref_id,
                   round(n_common * 1.0 / n_union, 6) AS jaccard,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY round(n_common * 1.0 / n_union, 6) DESC,
                                ref_id ASC) AS rn
            FROM verified WHERE 5 * n_common >= 4 * n_union
        )
        SELECT c.doc_id,
               CAST(c.n_candidates AS BIGINT) AS n_candidates,
               CAST(d.n_dups AS BIGINT) AS n_dups,
               b.ref_id AS best_ref,
               b.jaccard AS best_jaccard
        FROM (SELECT doc_id, count(*) AS n_candidates
              FROM cand GROUP BY doc_id) c
        JOIN (SELECT doc_id, count(*) AS n_dups
              FROM dups GROUP BY doc_id) d USING (doc_id)
        JOIN (SELECT doc_id, ref_id, jaccard FROM dups WHERE rn = 1) b
            USING (doc_id)
        ORDER BY doc_id
    """


@register("q_streaming_neardup", oracle=None)  # set below
def q_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7j streaming ingest near-dup flagging (round 11): incoming
    documents (odd doc_ids, 4 time-ordered micro-batches) compute
    MinHash band keys INSIDE the streaming plan and stream-static
    join the reference corpus's band index (even doc_ids) — a
    stateless, append-safe candidate generator (no watermark, no
    state store; the in-stream plan is pure per-row expressions +
    the static join, so arrival-time flagging never blocks). The
    exact Jaccard verify runs batch-side on the emitted candidate
    pairs (integer predicate 5·∩ ≥ 4·∪ — the LSH recall contract is
    candidates ⊇ true pairs, certified by the batch oracle running
    the identical band scheme). Output per flagged incoming doc:
    candidate count, dup count, best reference and its Jaccard.

    Scale: the reference band index is the store-maintained artifact
    (sources/text_index analogue); each micro-batch shuffles only
    (band-key, doc_id) pairs against it."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.operators.dedup import (
        SHINGLE_N,
        minhash_signatures,
        spark_band_keys_expr,
        spark_hashed_shingles_expr,
        spark_minhash_exprs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ref_bands = (
        minhash_signatures(docs.where(F.col("doc_id") % 2 == 0))
        .select(
            F.col("doc_id").alias("ref_id"),
            F.explode(F.expr(spark_band_keys_expr("mhs"))).alias("bk"),
        )
        .distinct()
    )

    base = tempfile.mkdtemp(prefix="kspipeline-neardup-")
    src = os.path.join(base, "src")
    os.makedirs(src)
    rows = docs.where(F.col("doc_id") % 2 == 1).collect()
    n_chunks, m0 = 4, _time.time() - 86_400
    per = (len(rows) + n_chunks - 1) // n_chunks
    for c in range(n_chunks):
        p = os.path.join(src, f"chunk{c}.json")
        with open(p, "w") as f:
            for r in rows[c * per : (c + 1) * per]:
                f.write(
                    _json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                    + "\n"
                )
        os.utime(p, (m0 + c, m0 + c))  # ascending mtimes (round-6 lesson)

    mh_array = "array(" + ", ".join(spark_minhash_exprs("shh")) + ")"
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    stream_bands = (
        stream.withColumn("toks", F.split("text", " "))
        .where(F.expr("size(toks)") >= SHINGLE_N)
        .withColumn("shh", F.expr(spark_hashed_shingles_expr("toks")))
        .withColumn("mhs", F.expr(mh_array))
        .select(
            "doc_id",
            F.explode(F.expr(spark_band_keys_expr("mhs"))).alias("bk"),
        )
    )
    hits = stream_bands.join(ref_bands, "bk").select("doc_id", "ref_id")

    emissions: list = []

    def sink(batch_df: DataFrame, _epoch_id: int) -> None:
        emissions.extend(batch_df.collect())

    q = (
        hits.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError("availableNow replay timed out after 300 s")
    shutil.rmtree(base, ignore_errors=True)

    cand = spark.createDataFrame(
        emissions, "doc_id long, ref_id long"
    ).distinct()
    sig = minhash_signatures(docs).select("doc_id", "shh")
    verified = (
        cand.join(
            sig.select(F.col("doc_id"), F.col("shh").alias("shh_a")),
            "doc_id",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("ref_id"), F.col("shh").alias("shh_b")
            ),
            "ref_id",
        )
        .select(
            "doc_id",
            "ref_id",
            F.expr("size(array_intersect(shh_a, shh_b))").alias("n_common"),
            F.expr(
                "size(shh_a) + size(shh_b) - size(array_intersect(shh_a, shh_b))"
            ).alias("n_union"),
        )
    )
    dups = verified.where(
        F.col("n_common") * 5 >= F.col("n_union") * 4
    ).select(
        "doc_id",
        "ref_id",
        F.expr("round(n_common / n_union, 6)").alias("jaccard"),
    )
    from pyspark.sql.window import Window as _W

    best = (
        dups.withColumn(
            "rn",
            F.row_number().over(
                _W.partitionBy("doc_id").orderBy(
                    F.col("jaccard").desc(), F.col("ref_id").asc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("ref_id").alias("best_ref"),
                F.col("jaccard").alias("best_jaccard"))
    )
    n_cand = cand.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    n_dups = dups.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dups")
    )
    return (
        n_cand.join(n_dups, "doc_id")
        .join(best, "doc_id")
        .select("doc_id", "n_candidates", "n_dups", "best_ref", "best_jaccard")
        .orderBy("doc_id")
    )


ORACLES["q_streaming_neardup"] = _neardup_oracle_sql()


@register(
    "q_ivm_join",
    oracle="""
        WITH a AS (
            SELECT doc_id, source, n_chars FROM documents
        ),
        b AS (SELECT vec_id, label FROM embeddings),
        j AS (
            SELECT a.source, a.doc_id, a.n_chars, b.label
            FROM a JOIN b ON a.doc_id = b.vec_id
        ),
        counters AS (
            SELECT CAST(sum(CASE WHEN doc_id % 10 >= 7
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_delta_a,
                   (SELECT CAST(sum(CASE WHEN vec_id % 10 >= 5
                                         THEN 1 ELSE 0 END) AS BIGINT)
                    FROM b) AS n_delta_b,
                   (SELECT CAST(sum(CASE WHEN j.doc_id % 10 >= 7
                                          OR j.doc_id % 10 >= 5
                                         THEN 1 ELSE 0 END) AS BIGINT)
                    FROM j) AS n_delta_view
            FROM a
        )
        SELECT j.source,
               CAST(count(*) AS BIGINT)        AS n_rows,
               CAST(sum(j.n_chars) AS BIGINT)  AS chars_checksum,
               CAST(sum(j.doc_id) AS BIGINT)   AS id_checksum,
               CAST(sum(j.label) AS BIGINT)    AS label_checksum,
               counters.n_delta_a,
               counters.n_delta_b,
               counters.n_delta_view
        FROM j, counters
        GROUP BY j.source, counters.n_delta_a, counters.n_delta_b,
                 counters.n_delta_view
    """,
)
def q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9a Incremental view maintenance for a JOIN (round 12 —
    deferred cert → r13 window): the Materialize/DBSP delta-join rule
    over the versioned store's CDC feed. Two base stores (documents
    slice keyed doc_id; embeddings keyed vec_id = the FK) each take a
    base commit and a delta commit; the JOIN view materializes once
    from the bases, then the maintenance job computes the insert-only
    delta rule  ΔJ = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB  (a disjoint
    decomposition of A_new⋈B_new − A_old⋈B_old) reading the deltas
    via read_corpus_changes — O(Δ) input on the changed side, never a
    base re-read — and appends it as the view's v2. The certified
    output aggregates the MAINTAINED view; the oracle recomputes the
    FULL join from source tables, so maintained ≡ recomputed is the
    hash match itself (no invariant bits), and the Δ-row counters
    (n_delta_a/b/view) bind "the job only touched deltas" into the
    hash via the modulus construction. See
    sources/versioned.read_corpus_changes; same lifecycle discipline
    as q_cms_incremental (sketch IVM) — this row extends IVM from
    linear sketches to joins."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus,
        read_corpus_changes,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    embs = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    base = tempfile.mkdtemp(prefix="kspipeline-ivm-")
    a_store = os.path.join(base, "a")
    b_store = os.path.join(base, "b")
    v_store = os.path.join(base, "view")
    try:
        commit_corpus(docs.where(F.col("doc_id") % 10 < 7), a_store, "A1")
        commit_corpus(embs.where(F.col("vec_id") % 10 < 5), b_store, "B1")
        a1 = read_corpus(spark, a_store, 1)
        b1 = read_corpus(spark, b_store, 1)
        j1 = a1.join(b1, a1["doc_id"] == b1["vec_id"]).select(
            "source", "doc_id", "n_chars", "label"
        )
        commit_corpus(j1, v_store, "J1 = A1 join B1")
        # deltas land
        commit_corpus(docs.where(F.col("doc_id") % 10 >= 7), a_store, "dA")
        commit_corpus(embs.where(F.col("vec_id") % 10 >= 5), b_store, "dB")
        da = read_corpus_changes(spark, a_store, 1, 2).drop("_seq")
        db = read_corpus_changes(spark, b_store, 1, 2).drop("_seq")
        n_delta_a, n_delta_b = da.count(), db.count()
        a2 = read_corpus(spark, a_store, 2)
        # ΔJ = ΔA ⋈ B_new ∪ A_old ⋈ ΔB (insert-only delta-join rule)
        dj = (
            da.join(
                read_corpus(spark, b_store, 2),
                da["doc_id"] == F.col("vec_id"),
            ).select("source", "doc_id", "n_chars", "label")
        ).unionByName(
            a1.join(db, a1["doc_id"] == db["vec_id"]).select(
                "source", "doc_id", "n_chars", "label"
            )
        )
        dj = dj.localCheckpoint(eager=True)
        n_delta_view = dj.count()
        commit_corpus(dj, v_store, "dJ maintenance")
        out = (
            read_corpus(spark, v_store, 2)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("chars_checksum"),
                F.sum("doc_id").cast("long").alias("id_checksum"),
                F.sum("label").cast("long").alias("label_checksum"),
            )
            .select(
                "source",
                "n_rows",
                "chars_checksum",
                "id_checksum",
                "label_checksum",
                F.lit(n_delta_a).cast("long").alias("n_delta_a"),
                F.lit(n_delta_b).cast("long").alias("n_delta_b"),
                F.lit(n_delta_view).cast("long").alias("n_delta_view"),
            )
        )
        rows, schema = out.collect(), out.schema
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "q_ivm_join_retract",
    oracle="""
        WITH a AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 10 IN (3, 4)
                        THEN n_chars % 100 + 1000
                        ELSE n_chars % 100 END AS score
            FROM documents WHERE doc_id % 10 != 9
        ),
        b AS (SELECT vec_id, label FROM embeddings),
        j AS (
            SELECT a.source, a.doc_id, a.score, b.label
            FROM a JOIN b ON a.doc_id = b.vec_id
        ),
        counters AS (
            SELECT (SELECT CAST(sum(CASE WHEN doc_id % 10 IN (3, 4)
                                         THEN 1 ELSE 0 END) AS BIGINT)
                    FROM documents) AS n_rescored,
                   (SELECT CAST(sum(CASE WHEN doc_id % 10 = 9
                                         THEN 1 ELSE 0 END) AS BIGINT)
                    FROM documents) AS n_takedowns,
                   (SELECT CAST(count(*) AS BIGINT) FROM j
                    WHERE doc_id % 10 IN (3, 4)) AS n_view_upserts
        )
        SELECT j.source,
               CAST(count(*) AS BIGINT)       AS n_rows,
               CAST(sum(j.score) AS BIGINT)   AS score_checksum,
               CAST(sum(j.doc_id) AS BIGINT)  AS id_checksum,
               CAST(sum(j.label) AS BIGINT)   AS label_checksum,
               counters.n_rescored,
               counters.n_takedowns,
               counters.n_view_upserts
        FROM j, counters
        GROUP BY j.source, counters.n_rescored, counters.n_takedowns,
                 counters.n_view_upserts
    """,
)
def q_ivm_join_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9b Retraction-aware join IVM (round 12 — deferred cert → r13
    window): q_ivm_join handles insert-only streams; real curation
    UPDATES and RETRACTS (re-scores, takedowns) — the Z-set/DBSP
    weighted-delta case. Here the JOIN VIEW is itself a MoR store
    keyed by the join key: base A (all docs, derived score) joins
    static B into view v1; then A takes one upsert batch (re-scored
    rows for doc_id%10∈{3,4}, tombstones for %10=9) and the
    maintenance job turns the CDC feed into view upserts — changed
    live keys re-join B (O(Δ)⋈B, base never re-read), tombstoned
    keys become view tombstones (retraction = keyed delete, no old
    row values needed because latest-wins resolution IS the
    retraction semantics). Certified: the RESOLVED view
    (read_corpus_latest) aggregates against the oracle's arithmetic
    reconstruction of the post-update join, with the Δ counters
    (rescored/takedowns/view-upserts) bound into the hash. See
    sources/versioned.upsert_corpus/read_corpus_changes/
    read_corpus_latest."""
    import shutil

    from kafka_streams_pipeline_spark.sources.versioned import (
        TOMBSTONE,
        commit_corpus,
        read_corpus,
        read_corpus_changes,
        read_corpus_latest,
        upsert_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", (F.col("n_chars") % 100).cast("long").alias("score")
    )
    embs = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    base = tempfile.mkdtemp(prefix="kspipeline-ivmret-")
    a_store = os.path.join(base, "a")
    v_store = os.path.join(base, "view")
    try:
        commit_corpus(docs, a_store, "A base")
        a1 = read_corpus(spark, a_store, 1)
        j1 = a1.join(embs, a1["doc_id"] == embs["vec_id"]).select(
            "doc_id", "source", "score", "label"
        )
        commit_corpus(j1, v_store, "view base")
        # the curation pass: re-score %10∈{3,4}, take down %10=9
        upsert_corpus(
            docs.where(F.col("doc_id") % 10 == 9)
            .select(
                "doc_id",
                F.lit(None).cast("string").alias("source"),
                F.lit(None).cast("long").alias("score"),
            )
            .withColumn(TOMBSTONE, F.lit(True))
            .unionByName(
                docs.where((F.col("doc_id") % 10).isin(3, 4))
                .withColumn("score", F.col("score") + 1000)
                .withColumn(TOMBSTONE, F.lit(False))
            ),
            a_store,
            "doc_id",
            "curation pass",
        )
        da = read_corpus_changes(spark, a_store, 1, 2).drop("_seq")
        n_rescored = da.where(~F.col(TOMBSTONE)).count()
        n_takedowns = da.where(F.col(TOMBSTONE)).count()
        # maintenance: changed live keys re-join B; tombstones pass
        # through as view tombstones (latest-wins resolution is the
        # retraction)
        live = da.where(~F.col(TOMBSTONE))
        dv_live = live.join(embs, live["doc_id"] == embs["vec_id"]).select(
            "doc_id", "source", "score", "label"
        ).withColumn(TOMBSTONE, F.lit(False))
        dv_tomb = da.where(F.col(TOMBSTONE)).select(
            "doc_id",
            F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("long").alias("score"),
            F.lit(None).cast("int").alias("label"),
            F.lit(True).alias(TOMBSTONE),
        )
        dv = dv_live.unionByName(dv_tomb).localCheckpoint(eager=True)
        n_view_upserts = dv.where(~F.col(TOMBSTONE)).count()
        upsert_corpus(dv, v_store, "doc_id", "view maintenance")
        out = (
            read_corpus_latest(spark, v_store, "doc_id")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("score").cast("long").alias("score_checksum"),
                F.sum("doc_id").cast("long").alias("id_checksum"),
                F.sum("label").cast("long").alias("label_checksum"),
            )
            .select(
                "source",
                "n_rows",
                "score_checksum",
                "id_checksum",
                "label_checksum",
                F.lit(n_rescored).cast("long").alias("n_rescored"),
                F.lit(n_takedowns).cast("long").alias("n_takedowns"),
                F.lit(n_view_upserts).cast("long").alias("n_view_upserts"),
            )
        )
        rows, schema = out.collect(), out.schema
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "q_streaming_ivm_join",
    oracle="""
        WITH a AS (SELECT doc_id, source, n_chars FROM documents),
        b AS (SELECT vec_id, label FROM embeddings),
        j AS (
            SELECT a.source, a.doc_id, a.n_chars, b.label
            FROM a JOIN b ON a.doc_id = b.vec_id
        ),
        counters AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM a
                    WHERE doc_id % 10 >= 5) AS n_delta_a,
                   (SELECT CAST(count(*) AS BIGINT) FROM b
                    WHERE vec_id % 10 >= 3) AS n_delta_b,
                   (SELECT CAST(count(*) AS BIGINT) FROM j
                    WHERE doc_id % 10 >= 3) AS n_delta_view
        )
        SELECT j.source,
               CAST(count(*) AS BIGINT)       AS n_rows,
               CAST(sum(j.n_chars) AS BIGINT) AS chars_checksum,
               CAST(sum(j.doc_id) AS BIGINT)  AS id_checksum,
               CAST(sum(j.label) AS BIGINT)   AS label_checksum,
               counters.n_delta_a,
               counters.n_delta_b,
               counters.n_delta_view
        FROM j, counters
        GROUP BY j.source, counters.n_delta_a, counters.n_delta_b,
                 counters.n_delta_view
    """,
)
def q_streaming_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9c Streaming join-IVM twin (VERDICT r12 item 4): the SAME
    delta-join rule q_ivm_join runs as batch maintenance calls, now
    executed inside ``foreachBatch`` over a REAL availableNow CDC
    replay — the deployment shape (the reference's entire ingest
    topology IS a continuously-maintained view,
    ingestion/KafkaStreamsAggregator.java:98-105), matching how every
    sketch got its streaming twin.

    Construction: stores A (documents slice, key doc_id) and B
    (embeddings, key vec_id = the FK) take base commits; the view
    materializes once as A1 ⋈ B1. Four CDC chunks then stream through
    one file stream (side-tagged union rows, one file per micro-batch,
    ascending mtimes): dA1 (%10 ∈ 5..6), dB1 (%10 ∈ 3..5), dA2
    (%10 ≥ 7), dB2 (%10 ≥ 6). Each micro-batch applies the bilinear
    delta rule  ΔJ = ΔA ⋈ B_old ∪ A_old ⋈ ΔB ∪ ΔA ⋈ ΔB  against the
    stores' state BEFORE the batch, appends ΔJ to the view store, and
    only then folds its own rows into the base stores — O(Δ) reads on
    the changed side, never a base rescan. Cross-batch matching is
    CONSTRUCTED, not hoped for (round-6 lesson): dB1's keys %10 = 5
    only exist A-side via dA1 (the PREVIOUS micro-batch), and the
    harness asserts that batch genuinely produced them.

    Certified: the maintained view (all versions) aggregated per
    source hash-matches the oracle's FULL recompute of the join, and
    the Δ counters (n_delta_a/b/view = rows streamed per side / ΔJ
    rows the maintenance emitted) bind "only deltas were touched"
    into the hash via the modulus construction. Crash/replay
    idempotence is q_streaming_store_ingest's row, not re-simulated
    here."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.sources.versioned import (
        commit_corpus,
        read_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    base = tempfile.mkdtemp(prefix="kspipeline-sivm-")
    a_store = os.path.join(base, "a")
    b_store = os.path.join(base, "b")
    v_store = os.path.join(base, "view")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        commit_corpus(docs.where(F.col("doc_id") % 10 < 5), a_store, "A1")
        commit_corpus(embs.where(F.col("vec_id") % 10 < 3), b_store, "B1")
        a1 = read_corpus(spark, a_store, 1)
        b1 = read_corpus(spark, b_store, 1)
        commit_corpus(
            a1.join(b1, a1["doc_id"] == b1["vec_id"]).select(
                "source", "doc_id", "n_chars", "label"
            ),
            v_store,
            "J1 = A1 join B1",
        )
        chunks = [
            ("A", docs.where((F.col("doc_id") % 10 >= 5)
                             & (F.col("doc_id") % 10 < 7))),
            ("B", embs.where((F.col("vec_id") % 10 >= 3)
                             & (F.col("vec_id") % 10 < 6))),
            ("A", docs.where(F.col("doc_id") % 10 >= 7)),
            ("B", embs.where(F.col("vec_id") % 10 >= 6)),
        ]
        mtime0 = _time.time() - 86_400
        for i, (side, df) in enumerate(chunks):
            path = os.path.join(src, f"cdc{i}.json")
            with open(path, "w") as f:
                for r in df.collect():
                    d = {"side": side}
                    d.update(r.asDict())
                    f.write(_json.dumps(d) + "\n")
            # back-to-back writes tie on mtime and the file-stream
            # replay order is MTIME order (round-6 lesson)
            os.utime(path, (mtime0 + i, mtime0 + i))

        stats: dict = {"batches": [], "n_delta_a": 0, "n_delta_b": 0,
                       "n_delta_view": 0}

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            batch_df = batch_df.localCheckpoint(eager=True)
            da = batch_df.where(F.col("side") == "A").select(
                "doc_id", "source", "n_chars"
            )
            db = batch_df.where(F.col("side") == "B").select(
                "vec_id", "label"
            )
            a_old = read_corpus(spark, a_store)
            b_old = read_corpus(spark, b_store)
            dj = (
                da.join(b_old, da["doc_id"] == b_old["vec_id"])
                .select("source", "doc_id", "n_chars", "label")
                .unionByName(
                    a_old.join(db, a_old["doc_id"] == db["vec_id"]).select(
                        "source", "doc_id", "n_chars", "label"
                    )
                )
                .unionByName(
                    da.join(db, da["doc_id"] == db["vec_id"]).select(
                        "source", "doc_id", "n_chars", "label"
                    )
                )
                .localCheckpoint(eager=True)
            )
            n_da, n_db, n_dj = da.count(), db.count(), dj.count()
            n_dj_key5 = dj.where(F.col("doc_id") % 10 == 5).count()
            if n_dj:
                commit_corpus(dj, v_store, "dJ maintenance")
            if n_da:
                commit_corpus(da, a_store, "dA fold-in")
            if n_db:
                commit_corpus(db, b_store, "dB fold-in")
            stats["batches"].append((n_da, n_db, n_dj, n_dj_key5))
            stats["n_delta_a"] += n_da
            stats["n_delta_b"] += n_db
            stats["n_delta_view"] += n_dj

        q = (
            spark.readStream.schema(
                "side string, doc_id long, source string, n_chars long, "
                "vec_id long, label long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("CDC IVM replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if len(stats["batches"]) != 4:
            raise AssertionError(
                f"CDC replay did not micro-batch per chunk: {stats}"
            )
        # constructed cross-batch property: dB1 (batch index 1) must
        # have matched keys %10 = 5 that exist A-side only via dA1
        # (batch index 0) — state genuinely crossed the batch boundary
        if stats["batches"][1][3] < 1:
            raise AssertionError(
                f"no cross-batch delta match in dB1's micro-batch: {stats}"
            )
        out = (
            read_corpus(spark, v_store)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("chars_checksum"),
                F.sum("doc_id").cast("long").alias("id_checksum"),
                F.sum("label").cast("long").alias("label_checksum"),
            )
            .select(
                "source",
                "n_rows",
                "chars_checksum",
                "id_checksum",
                "label_checksum",
                F.lit(stats["n_delta_a"]).cast("long").alias("n_delta_a"),
                F.lit(stats["n_delta_b"]).cast("long").alias("n_delta_b"),
                F.lit(stats["n_delta_view"]).cast("long")
                .alias("n_delta_view"),
            )
        )
        rows, schema = out.collect(), out.schema
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


_IVM_AGG_ORACLE_COUNTERS = """
        counters AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents
                    WHERE doc_id % 10 >= 8) AS n_inserts,
                   (SELECT CAST(count(*) AS BIGINT) FROM documents
                    WHERE doc_id % 10 = 3) AS n_retracts
        )
"""


@register(
    "q_ivm_agg",
    oracle=f"""
        WITH live AS (
            SELECT source, doc_id, n_chars FROM documents
            WHERE doc_id % 10 != 3
        ),
        {_IVM_AGG_ORACLE_COUNTERS}
        SELECT live.source,
               CAST(count(*) AS BIGINT)          AS n_rows,
               CAST(sum(live.n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(live.doc_id) AS BIGINT)  AS id_sum,
               counters.n_inserts, counters.n_retracts
        FROM live, counters
        GROUP BY live.source, counters.n_inserts, counters.n_retracts
    """,
)
def q_ivm_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9d Aggregate view maintenance with retractions (round 13):
    the LINEAR Z-set rule beside the join rows' bilinear one. A
    per-source count/sum view materializes from the base corpus; one
    CDC commit then lands inserts (doc_id %10 ≥ 8) AND retractions
    (%10 = 3, as Debezium-style before-image tombstones — a linear
    aggregate cannot be decremented from a key-only delete); the
    maintenance job folds the delta into the view via
    operators/ivm.agg_view_apply — O(Δ) on the feed, O(touched
    groups) on the view, base never rescanned. Certified: the
    MAINTAINED view hash-matches the oracle's full recompute of the
    final live set, with the insert/retract counts bound in.
    Reference anchor: ingestion/KafkaStreamsAggregator.java:98-105
    (the per-record-maintained count/sum/avg view), generalized with
    retractions."""
    import shutil

    from kafka_streams_pipeline_spark.operators.ivm import agg_view_apply
    from kafka_streams_pipeline_spark.sources.versioned import (
        TOMBSTONE,
        read_corpus_changes,
        read_corpus_latest,
        upsert_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = tempfile.mkdtemp(prefix="kspipeline-ivmagg-")
    a_store = os.path.join(base, "a")
    v_store = os.path.join(base, "view")
    try:
        a1 = docs.where(F.col("doc_id") % 10 <= 7)
        upsert_corpus(a1, a_store, "doc_id", "A1")
        v1 = a1.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        upsert_corpus(v1, v_store, "source", "V1 = agg(A1)")
        inserts = docs.where(F.col("doc_id") % 10 >= 8)
        retracts = docs.where(F.col("doc_id") % 10 == 3).withColumn(
            TOMBSTONE, F.lit(True)
        )
        upsert_corpus(
            inserts.withColumn(TOMBSTONE, F.lit(False)).unionByName(retracts),
            a_store,
            "doc_id",
            "dA: inserts + takedowns",
        )
        cdc = read_corpus_changes(spark, a_store, 1, 2).drop("_seq")
        n_inserts = cdc.where(~F.col(TOMBSTONE)).count()
        n_retracts = cdc.where(F.col(TOMBSTONE)).count()
        touched = agg_view_apply(
            read_corpus_latest(spark, v_store, "source"),
            cdc,
            "source",
            {"chars_sum": "n_chars", "id_sum": "doc_id"},
        ).localCheckpoint(eager=True)
        upsert_corpus(touched, v_store, "source", "dV maintenance")
        out = read_corpus_latest(spark, v_store, "source").select(
            "source",
            "n_rows",
            "chars_sum",
            "id_sum",
            F.lit(n_inserts).cast("long").alias("n_inserts"),
            F.lit(n_retracts).cast("long").alias("n_retracts"),
        )
        rows, schema = out.collect(), out.schema
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "q_streaming_ivm_agg",
    oracle=f"""
        WITH live AS (
            SELECT source, doc_id, n_chars FROM documents
            WHERE (doc_id % 10 != 3 AND doc_id % 10 != 8)
               OR doc_id % 20 = 18
        ),
        counters AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents
                    WHERE doc_id % 10 >= 8) AS n_inserts,
                   (SELECT CAST(count(*) AS BIGINT) FROM documents
                    WHERE doc_id % 10 = 3 OR doc_id % 20 = 8)
                       AS n_retracts
        )
        SELECT live.source,
               CAST(count(*) AS BIGINT)          AS n_rows,
               CAST(sum(live.n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(live.doc_id) AS BIGINT)  AS id_sum,
               counters.n_inserts, counters.n_retracts
        FROM live, counters
        GROUP BY live.source, counters.n_inserts, counters.n_retracts
    """,
)
def q_streaming_ivm_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9e Streaming twin of q_ivm_agg: the linear Z-set maintenance
    rule inside ``foreachBatch`` over a REAL availableNow CDC replay —
    three micro-batches (one file each, ascending mtimes): pure
    inserts (%10 = 8), pure retractions (%10 = 3 before-images from
    the base), then a MIXED batch (inserts %10 = 9 + retractions of
    the %20 = 8 HALF of micro-batch 0's own inserts — the cross-batch
    property is constructed: those keys never existed in the base, so
    decrementing them correctly requires state carried across the
    batch boundary, which the harness asserts). Each batch is one
    O(Δ) aggregate + one O(touched-groups) view upsert via
    operators/ivm.agg_view_apply. Certified against the same
    full-recompute oracle shape as the batch row."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.operators.ivm import agg_view_apply
    from kafka_streams_pipeline_spark.sources.versioned import (
        TOMBSTONE,
        read_corpus_latest,
        upsert_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = tempfile.mkdtemp(prefix="kspipeline-sivmagg-")
    v_store = os.path.join(base, "view")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        # base = %10 <= 7 (includes the %10=3 rows batch 1 retracts)
        a1 = docs.where(F.col("doc_id") % 10 <= 7)
        v1 = a1.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        upsert_corpus(v1, v_store, "source", "V1 = agg(base)")
        chunks = [
            docs.where(F.col("doc_id") % 10 == 8).withColumn(
                TOMBSTONE, F.lit(False)
            ),
            docs.where(F.col("doc_id") % 10 == 3).withColumn(
                TOMBSTONE, F.lit(True)
            ),
            docs.where(F.col("doc_id") % 10 == 9)
            .withColumn(TOMBSTONE, F.lit(False))
            .unionByName(
                docs.where(F.col("doc_id") % 20 == 8).withColumn(
                    TOMBSTONE, F.lit(True)
                )
            ),
        ]
        mtime0 = _time.time() - 86_400
        for i, df in enumerate(chunks):
            path = os.path.join(src, f"cdc{i}.json")
            with open(path, "w") as f:
                for r in df.collect():
                    f.write(_json.dumps(r.asDict()) + "\n")
            os.utime(path, (mtime0 + i, mtime0 + i))

        stats: dict = {"batches": [], "n_inserts": 0, "n_retracts": 0}

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            batch_df = batch_df.localCheckpoint(eager=True)
            n_ins = batch_df.where(~F.col(TOMBSTONE)).count()
            n_ret = batch_df.where(F.col(TOMBSTONE)).count()
            touched = agg_view_apply(
                read_corpus_latest(spark, v_store, "source"),
                batch_df,
                "source",
                {"chars_sum": "n_chars", "id_sum": "doc_id"},
            ).localCheckpoint(eager=True)
            upsert_corpus(touched, v_store, "source", "dV maintenance")
            stats["batches"].append((n_ins, n_ret))
            stats["n_inserts"] += n_ins
            stats["n_retracts"] += n_ret

        q = (
            spark.readStream.schema(
                "doc_id long, source string, n_chars long, _deleted boolean"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("CDC agg-IVM replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if len(stats["batches"]) != 3:
            raise AssertionError(
                f"CDC replay did not micro-batch per chunk: {stats}"
            )
        # constructed cross-batch property: micro-batch 2 retracted
        # rows that only ever existed via micro-batch 0's inserts
        if stats["batches"][2][1] < 1:
            raise AssertionError(
                f"no cross-batch retraction in the mixed batch: {stats}"
            )
        out = read_corpus_latest(spark, v_store, "source").select(
            "source",
            "n_rows",
            "chars_sum",
            "id_sum",
            F.lit(stats["n_inserts"]).cast("long").alias("n_inserts"),
            F.lit(stats["n_retracts"]).cast("long").alias("n_retracts"),
        )
        rows, schema = out.collect(), out.schema
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "q_streaming_table_join",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER () AS n
            FROM events
        ),
        chunked AS (
            SELECT user_id, event_id, cents, (rn * 4) // n AS chunk
            FROM ordered
        ),
        eff AS (
            SELECT *, CASE
                WHEN chunk >= 3 AND user_id % 4 = 0 THEN 4
                WHEN chunk >= 2 AND user_id % 3 = 0 THEN 3
                WHEN chunk >= 1 AND user_id % 2 = 0 THEN 2
                ELSE 1 END AS v_eff
            FROM chunked
        )
        SELECT CAST(chunk AS BIGINT) AS chunk,
               CAST((user_id * 7 + v_eff * 13) % 100 AS BIGINT) AS tier,
               CAST(count(*) AS BIGINT)       AS n_events,
               CAST(sum(cents) AS BIGINT)     AS cents_sum,
               CAST(sum(event_id) AS BIGINT)  AS id_checksum
        FROM eff
        GROUP BY 1, 2
    """,
)
def q_streaming_table_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-TABLE temporal join (round 13) — the Kafka Streams
    KStream ⋈ KTable enrichment the stream-stream rows don't cover:
    each micro-batch of the event stream joins the dimension state
    CURRENT AT PROCESSING TIME, while the dimension itself advances
    between batches via MoR upserts (the changelog-backed KTable).
    The broadcast on the dimension side is the GlobalKTable shape —
    the dim ships to every task, the event stream never re-shuffles
    for the join.

    Temporal visibility is CONSTRUCTED and oracle-deterministic: the
    stream replays in 4 time-ordered chunks (one micro-batch each);
    after batch c the dimension takes version c+2 updating users with
    user_id % (c+2) = 0, so an event in chunk c must see tier(u,
    v_eff) where v_eff = max{v ≤ c+1 : v = 1 or u % v = 0} — a wrong
    snapshot (too early, too late, or a full-table rather than
    latest-wins read) flips the tier and the hash. Per-batch output
    is aggregated per tier and tagged with the batch index, binding
    WHICH batch saw WHICH dimension version into the certified rows.
    Reference anchor: the reference's serving join of live aggregates
    against rolling state (ingestion/KafkaStreamsAggregator.java:
    98-105); semantics follow the Kafka Streams KTable join
    (processing-time enrichment), re-expressed as foreachBatch +
    broadcast over the versioned store."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.sources.versioned import (
        latest_version,
        read_corpus_latest,
        upsert_corpus,
    )

    tier = (F.col("user_id") * 7 + F.col("v") * 13) % 100
    events = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            F.expr("cast(round(value * 100) as long)").alias("cents"),
        )
        .orderBy("us", "event_id")
    )
    base = tempfile.mkdtemp(prefix="kspipeline-stj-")
    dim_store = os.path.join(base, "dim")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        users = (
            _t(spark, sf_dir, "events").select("user_id").distinct()
        ).localCheckpoint(eager=True)
        upsert_corpus(
            users.withColumn("v", F.lit(1)).select("user_id", tier.alias("tier")),
            dim_store,
            "user_id",
            "dim v1",
        )
        rows = events.collect()
        n = len(rows)
        mtime0 = _time.time() - 86_400
        for c in range(4):
            lo, hi = (n * c + 3) // 4, (n * (c + 1) + 3) // 4
            # chunk boundaries mirror the oracle's (rn*4)//n split:
            # row i belongs to chunk (i*4)//n, i.e. chunk c holds
            # i in [ceil(n*c/4), ceil(n*(c+1)/4))
            path = os.path.join(src, f"chunk{c}.json")
            with open(path, "w") as f:
                for r in rows[lo:hi]:
                    f.write(_json.dumps(r.asDict()) + "\n")
            os.utime(path, (mtime0 + c, mtime0 + c))

        agg_rows: list = []

        def enrich(batch_df: DataFrame, _epoch_id: int) -> None:
            c = len(agg_rows)
            dim = read_corpus_latest(spark, dim_store, "user_id")
            got = (
                batch_df.join(F.broadcast(dim), "user_id")
                .groupBy("tier")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_events"),
                    F.sum("cents").cast("long").alias("cents_sum"),
                    F.sum("event_id").cast("long").alias("id_checksum"),
                )
                .collect()
            )
            agg_rows.append(got)
            v = c + 2  # dimension advances AFTER this batch
            if v <= 4:
                upsert_corpus(
                    users.where(F.col("user_id") % v == 0)
                    .withColumn("v", F.lit(v))
                    .select("user_id", tier.alias("tier")),
                    dim_store,
                    "user_id",
                    f"dim v{v}",
                )

        q = (
            spark.readStream.schema(
                "user_id long, event_id long, us long, cents long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(enrich)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("stream-table replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if len(agg_rows) != 4:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {len(agg_rows)}"
            )
        if latest_version(dim_store) != 4:
            raise AssertionError("dimension did not advance to v4")
        out_rows = [
            (c, r["tier"], r["n_events"], r["cents_sum"], r["id_checksum"])
            for c, batch in enumerate(agg_rows)
            for r in batch
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out_rows,
        "chunk long, tier long, n_events long, cents_sum long, "
        "id_checksum long",
    )


@register(
    "q_streaming_full_join",
    oracle="""
        SELECT p.event_id AS p_id, c.event_id AS c_id,
               p.user_id AS p_user, c.user_id AS c_user,
               epoch_ms(p.ts) AS p_ts_ms, epoch_ms(c.ts) AS c_ts_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
    """,
)
def q_streaming_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM FULL OUTER join (round 13):
    completes the streaming join family (inner r8, left outer r9,
    semi r10) — BOTH unmatched legs now emit: purchases with no
    preceding click once the watermark passes their window, and
    clicks no future purchase can ever match once the watermark
    passes c_ts + 10 min. Same constructed replay as the outer row:
    cross-batch cuts before each matched purchase force matches
    through the join state store, far-future sentinels on both sides
    (filtered from the result) flush the tail evictions, and the one
    batch FULL JOIN oracle certifies all three emission paths
    (state-served matches, purchase-side NULLs, click-side NULLs)."""
    import shutil

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
        )
        .where(F.col("event_type").isin("purchase", "click"))
        .collect()
    )
    rows = sorted(
        (r.asDict() for r in ev), key=lambda r: (r["ts_ms"], r["event_id"])
    )
    ev_df = spark.createDataFrame(
        rows, "event_id long, ts_ms long, user_id long, event_type string"
    )
    pp = ev_df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ms").alias("p_ms"),
    )
    cc = ev_df.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_ms").alias("c_ms")
    )
    matched = (
        pp.join(
            cc,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ms") >= F.col("p_ms") - 600_000)
            & (F.col("c_ms") < F.col("p_ms")),
        )
        .select("p_id")
        .distinct()
        .collect()
    )
    matched_ids = {r["p_id"] for r in matched}
    idx = {r["event_id"]: i for i, r in enumerate(rows)}
    cuts = [idx[p] for p in matched_ids]
    sentinel_ms = rows[-1]["ts_ms"] + 48 * 3_600_000
    rows.append({"event_id": -1, "ts_ms": sentinel_ms,
                 "user_id": -1, "event_type": "click"})
    rows.append({"event_id": -2, "ts_ms": sentinel_ms,
                 "user_id": -1, "event_type": "purchase"})
    base = tempfile.mkdtemp(prefix="kspipeline-sfjoin-")
    src = os.path.join(base, "src")
    _write_event_chunks(rows, src, cuts)

    schema = "event_id long, ts_ms long, user_id long, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    p = (
        stream.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", "24 hours")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "full_outer",
    ).select(
        "p_id",
        "c_id",
        "p_user",
        "c_user",
        F.unix_millis("p_ts").alias("p_ts_ms"),
        F.unix_millis("c_ts").alias("c_ts_ms"),
    )

    batches: list = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _e: batches.append(df.collect()))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        shutil.rmtree(base, ignore_errors=True)
        raise RuntimeError(
            "stream-stream full join replay timed out after 300 s"
        )
    shutil.rmtree(base, ignore_errors=True)
    out = [
        (r["p_id"], r["c_id"], r["p_user"], r["c_user"],
         r["p_ts_ms"], r["c_ts_ms"])
        for b in batches
        for r in b
        if (r["p_id"] is None or r["p_id"] >= 0)
        and (r["c_id"] is None or r["c_id"] >= 0)
    ]
    return spark.createDataFrame(
        out,
        "p_id long, c_id long, p_user long, c_user long, "
        "p_ts_ms long, c_ts_ms long",
    )


@register(
    "q_streaming_skyline",
    oracle="""
        WITH pts AS (
            SELECT CAST(p_partkey AS BIGINT) AS key,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS x,
                   CAST(p_size AS BIGINT) AS y
            FROM part
        )
        SELECT key, x, y FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.x <= p.x AND q.y >= p.y
              AND (q.x < p.x OR q.y > p.y)
        )
    """,
)
def q_streaming_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_skyline (round 13): incremental Pareto-
    frontier maintenance over an insert-only part stream — the
    skyline is closed under the IVM fold skyline(F ∪ ΔB) because a
    point dominated once can never re-enter (its dominator either
    survives or is itself dominated; dominance is transitive), so
    the maintained state is exactly the frontier: the OUTPUT-sized
    invariant that makes streaming skyline cheap at 100 TB (state
    never holds the corpus, only the current best tradeoffs). Four
    availableNow micro-batches in DESCENDING price quartiles, so
    later (cheaper) arrivals must EVICT earlier frontier members —
    the cross-batch property is constructed batch-side before the
    replay and asserted from the harness counters after it. Each
    micro-batch folds via the same bucketed operators/pareto
    .skyline_2d plan the batch row certifies; the final frontier
    hash-matches the quadratic dominance oracle over ALL rows,
    proving no eviction was wrong and no dominated point survived."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.operators.pareto import skyline_2d

    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("key"),
        F.expr("cast(round(p_retailprice * 100) as long)").alias("x"),
        F.col("p_size").cast("long").alias("y"),
    )
    pts = [(r["key"], r["x"], r["y"]) for r in part.collect()]
    # descending-price chunks: batch 0 is the most expensive quartile,
    # every later point is strictly cheaper than (or ties inside) it
    pts.sort(key=lambda p: (-p[1], p[0]))
    k = 4
    n = len(pts)
    chunks = [pts[i * n // k : (i + 1) * n // k] for i in range(k)]

    def _dom(a, b):
        return a[1] <= b[1] and a[2] >= b[2] and (a[1] < b[1] or a[2] > b[2])

    sky0 = [
        p for p in chunks[0] if not any(_dom(q, p) for q in chunks[0])
    ]
    later = [p for c in chunks[1:] for p in c]
    if not any(_dom(q, p) for p in sky0 for q in later):
        raise AssertionError(
            "constructed eviction property does not hold: no later-batch "
            "point dominates a batch-0 frontier member"
        )

    base = tempfile.mkdtemp(prefix="kspipeline-sskyline-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i, chunk in enumerate(chunks):
            path = os.path.join(src, f"pts{i}.json")
            with open(path, "w") as f:
                for key, x, y in chunk:
                    f.write(_json.dumps({"key": key, "x": x, "y": y}) + "\n")
            os.utime(path, (mtime0 + i, mtime0 + i))

        state: dict = {"frontier": [], "evictions": 0, "batches": 0}

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            batch_pts = [
                (r["key"], r["x"], r["y"])
                for r in batch_df.select("key", "x", "y").collect()
            ]
            uni = spark.createDataFrame(
                state["frontier"] + batch_pts, "key long, x long, y long"
            )
            new_frontier = [
                (r["key"], r["x"], r["y"])
                for r in skyline_2d(uni, "x", "y", "key", n_buckets=32)
                .collect()
            ]
            kept = {p[0] for p in new_frontier}
            state["evictions"] += sum(
                1 for p in state["frontier"] if p[0] not in kept
            )
            state["frontier"] = new_frontier
            state["batches"] += 1

        q = (
            spark.readStream.schema("key long, x long, y long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("skyline replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if state["batches"] != k:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {state['batches']}"
            )
        if state["evictions"] < 1:
            raise AssertionError(
                "no cross-batch eviction despite the constructed property"
            )
        return spark.createDataFrame(
            state["frontier"], "key long, x long, y long"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_record_linkage",
    oracle=_dedup.record_linkage_oracle(),
)
def q_streaming_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_record_linkage (round 13): ONLINE entity
    resolution over a customer CDC feed — each micro-batch emits
    pairs(S ∪ Δ) − pairs(S) = (pairs within Δ) ∪ (Δ × S cross
    pairs), the standard incremental-blocking delta rule, with S the
    accumulated seen-record store (grown append-only after each
    fold, so a pair is emitted exactly once, in the batch where its
    LATER record arrives). Three availableNow micro-batches split by
    custkey mod 3 — near-equal names land in different batches by
    construction, so cross-batch pairs MUST flow through the Δ×S
    leg (constructed batch-side, asserted from the harness counter).
    Both legs reuse operators/dedup.record_linkage_pairs (the cross
    leg via other=, disjoint id sets). The union of emissions
    hash-matches the one-shot batch oracle over ALL customers:
    incremental ≡ recomputed IS the certificate, matching the join-
    IVM rows' method. At 100 TB the state side is a blocked store:
    only Δ's blocks are ever read (block-key partition pruning)."""
    import json as _json
    import shutil
    import time as _time

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    rows = [r.asDict() for r in cust.collect()]
    chunks = [[r for r in rows if r["c_custkey"] % 3 == i] for i in range(3)]

    # constructed cross-batch property: at least one matched pair
    # must straddle chunks (computed with the same block+edit rule)
    import itertools

    def _lev1(x: str, y: str) -> bool:
        if x == y:
            return True
        if len(x) == len(y):
            return sum(a != b for a, b in zip(x, y)) <= 1
        return False  # equal-length names in this corpus

    def _match(a: dict, b: dict) -> bool:
        return (
            a["c_nationkey"] == b["c_nationkey"]
            and a["c_name"][:16] == b["c_name"][:16]
            and _lev1(a["c_name"], b["c_name"])
        )

    straddle = any(
        _match(a, b)
        for i, j in itertools.combinations(range(3), 2)
        for a in chunks[i]
        for b in chunks[j]
    )
    if not straddle:
        raise AssertionError(
            "constructed property does not hold: no matched pair "
            "straddles the custkey%3 batches"
        )

    base = tempfile.mkdtemp(prefix="kspipeline-slinkage-")
    src = os.path.join(base, "src")
    state_dir = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i, chunk in enumerate(chunks):
            path = os.path.join(src, f"cust{i}.json")
            with open(path, "w") as f:
                for r in chunk:
                    f.write(_json.dumps(r) + "\n")
            os.utime(path, (mtime0 + i, mtime0 + i))

        sink: dict = {"pairs": [], "cross": 0, "batches": 0}
        schema = (
            "c_custkey long, c_name string, c_nationkey int, "
            "c_mktsegment string"
        )

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.localCheckpoint(eager=True)
            within = _dedup.record_linkage_pairs(delta)
            emitted = [tuple(r) for r in within.collect()]
            if sink["batches"] > 0:
                state = spark.read.schema(schema).parquet(state_dir)
                cross = _dedup.record_linkage_pairs(delta, other=state)
                cross_rows = [tuple(r) for r in cross.collect()]
                sink["cross"] += len(cross_rows)
                emitted.extend(cross_rows)
            sink["pairs"].extend(emitted)
            delta.write.mode("append").parquet(state_dir)
            sink["batches"] += 1

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("linkage replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if sink["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {sink['batches']}"
            )
        if sink["cross"] < 1:
            raise AssertionError(
                "no pair flowed through the Δ×state leg despite the "
                "constructed straddle"
            )
        return spark.createDataFrame(
            sink["pairs"],
            "id_a long, id_b long, name_dist long, fields_agree long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_span_dedup",
    oracle=_dedup.duplicated_spans_oracle(),
)
def q_streaming_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_span_dedup (round 13): incremental
    substring dedup over a GROWING corpus — the re-crawl shape,
    where the interesting case is RETROACTIVE duplication: a gram
    unique in micro-batch 0 becomes duplicated when a later batch
    repeats it, so an already-ingested document's span set must
    update after the fact (an insert-only corpus still produces an
    UPSERT view — duplication is monotone per position, but spans
    merge and grow). Delta rule per batch: only the grams PRESENT in
    Δ are re-counted (old occurrences of affected grams + Δ
    occurrences — at 100 TB the occurrence store is gram-bucketed so
    this read is partition-pruned to Δ's buckets); newly-duplicated
    positions mark affected docs; ONLY affected docs re-run the
    island merge over their full duplicated-position set, and their
    span rows are REPLACED in a MoR view keyed by doc_id. Three
    availableNow micro-batches split by doc_id mod 3 (near-dup
    cliques straddle batches by construction); the retroactive
    1→≥2 crossing counter is asserted ≥1 in batches after the
    first. Final maintained view hash-matches the one-shot batch
    oracle over ALL documents: incremental ≡ recomputed."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.operators.dedup import (
        positional_grams,
        positions_to_spans,
    )
    from kafka_streams_pipeline_spark.sources.versioned import (
        read_corpus_latest,
        upsert_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="kspipeline-sspan-")
    src = os.path.join(base, "src")
    occ_dir = os.path.join(base, "occ")
    dup_dir = os.path.join(base, "dup")
    spans_store = os.path.join(base, "spans")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i in range(3):
            chunk = docs.where(F.col("doc_id") % 3 == i)
            path = os.path.join(src, f"docs{i}.json")
            with open(path, "w") as f:
                for r in chunk.collect():
                    f.write(
                        _json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                        + "\n"
                    )
            os.utime(path, (mtime0 + i, mtime0 + i))

        stats: dict = {"batches": 0, "retro_crossings": 0}
        occ_schema = "doc_id long, pos long, gram string"

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta_occ = positional_grams(batch_df).localCheckpoint(
                eager=True
            )
            if stats["batches"] > 0:
                old = spark.read.schema(occ_schema).parquet(occ_dir)
                aff = delta_occ.select("gram").distinct()
                # at scale: gram-bucketed store → this read prunes to
                # Δ's buckets instead of scanning the corpus
                old_aff = old.join(aff, "gram").localCheckpoint(eager=True)
            else:
                old_aff = spark.createDataFrame([], occ_schema)
            comb = old_aff.unionByName(
                delta_occ.select("doc_id", "pos", "gram")
            ).localCheckpoint(eager=True)
            # count window over gram, matching the batch operator's
            # default (one shuffle of the checkpointed comb stream;
            # comb is already restricted to Δ's grams)
            new_dups = (
                comb.withColumn(
                    "cnt",
                    F.count(F.lit(1)).over(Window.partitionBy("gram")),
                )
                .where(F.col("cnt") > 1)
                .select("doc_id", "pos")
                .localCheckpoint(eager=True)
            )
            # retroactive crossings: grams with exactly ONE occurrence
            # before this batch and ≥2 after it
            if stats["batches"] > 0:
                crossings = (
                    old_aff.groupBy("gram")
                    .agg(F.count(F.lit(1)).alias("c_old"))
                    .join(
                        comb.groupBy("gram").agg(
                            F.count(F.lit(1)).alias("c_tot")
                        ),
                        "gram",
                    )
                    .where((F.col("c_old") == 1) & (F.col("c_tot") >= 2))
                    .count()
                )
                stats["retro_crossings"] += crossings
            if new_dups.take(1):
                new_dups.write.mode("append").parquet(dup_dir)
                affected = new_dups.select("doc_id").distinct()
                all_dups = (
                    spark.read.schema("doc_id long, pos long")
                    .parquet(dup_dir)
                    .join(F.broadcast(affected), "doc_id")
                    .distinct()
                )
                spans = positions_to_spans(all_dups)
                spans_arr = spans.groupBy("doc_id").agg(
                    F.sort_array(
                        F.collect_list(
                            F.struct("span_start", "span_len")
                        )
                    ).alias("spans")
                )
                upsert_corpus(
                    spans_arr,
                    spans_store,
                    "doc_id",
                    f"span maintenance batch {stats['batches']}",
                )
            delta_occ.write.mode("append").parquet(occ_dir)
            stats["batches"] += 1

        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("span-dedup replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if stats["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {stats['batches']}"
            )
        if stats["retro_crossings"] < 1:
            raise AssertionError(
                "no retroactive 1→≥2 gram crossing despite the mod-3 "
                "clique split"
            )
        out = (
            read_corpus_latest(spark, spans_store, "doc_id")
            .select("doc_id", F.explode("spans").alias("s"))
            .select(
                "doc_id",
                F.col("s.span_start").alias("span_start"),
                F.col("s.span_len").alias("span_len"),
            )
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_heavy_hitters",
    oracle=_sk.heavy_hitters_twopass_oracle(),
)
def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_heavy_hitters_exact (round 13, deferred
    cert → r14 window): EXACT frequent items over a document stream —
    per micro-batch the executors reduce the token stream to
    Misra-Gries candidate summaries (k bounded counters each, raw
    tokens never leave the batch), the harness merges them into ONE
    running MG state by the Agarwal et al. 2013 summed-counters +
    k-th-largest-decrement rule (any item with TRUE global frequency
    > n/k provably survives the merged summary), and a final exact
    verify pass over the replayed corpus restricted to the surviving
    candidates makes the answer exact and replay-order-independent.
    Certified against the same GROUP BY/HAVING oracle as the batch
    row: incremental candidates + exact verify ≡ one-shot recompute.
    Invariant asserted: any merge whose combined candidate set
    overflowed k-1 counters must have decremented (at small SFs the
    vocabulary fits the summary and counts stay exact — also
    legitimate)."""
    import json as _json
    import shutil
    import time as _time

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = _sk.HH_K
    base = tempfile.mkdtemp(prefix="kspipeline-shh-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i in range(3):
            chunk = docs.where(F.col("doc_id") % 3 == i)
            path = os.path.join(src, f"docs{i}.json")
            with open(path, "w") as f:
                for r in chunk.collect():
                    f.write(
                        _json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                        + "\n"
                    )
            os.utime(path, (mtime0 + i, mtime0 + i))

        state: dict = {}
        stats: dict = {
            "batches": 0,
            "n_total": 0,
            "decrement_rounds": 0,
            "overflows": 0,
        }

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            toks = batch_df.select(
                F.explode(F.split("text", " ")).alias("tok")
            )
            rows = _sk.mg_summary_rows(toks, "tok", k)
            pre = len(
                set(state) | {r["tok"] for r in rows if r["tok"] is not None}
            )
            before = dict(state)
            merged, n_batch = _sk.mg_merge(state, rows, k)
            if pre > k - 1:
                stats["overflows"] += 1
            if any(
                merged.get(t, 0) < c for t, c in before.items()
            ) or any(t not in merged for t in before):
                stats["decrement_rounds"] += 1
            stats["n_total"] += n_batch
            stats["batches"] += 1

        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("heavy-hitter replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if stats["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {stats['batches']}"
            )
        # invariant, not vocabulary assumption: a merge whose combined
        # candidate set exceeded k-1 counters MUST have decremented;
        # a corpus whose vocabulary never overflows the summary keeps
        # exact counts and legitimately never decrements (sf0.001)
        if stats["overflows"] >= 1 and stats["decrement_rounds"] < 1:
            raise AssertionError(
                "MG summary overflowed k-1 counters without decrementing"
            )
        cands = spark.createDataFrame(
            [(t,) for t in state], "tok string"
        )
        replayed = (
            spark.read.schema("doc_id long, text string")
            .json(src)
            .select(F.explode(F.split("text", " ")).alias("tok"))
        )
        out = (
            replayed.join(F.broadcast(cands), "tok")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
            .where(F.col("freq") * k > F.lit(stats["n_total"]))
        )
        rows, schema = out.collect(), out.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_entity_golden",
    oracle=_dedup.entity_golden_oracle(),
)
def q_streaming_entity_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_entity_golden (round 13, deferred cert →
    r14 window): ONLINE entity clustering over a customer CDC feed —
    the hard IVM case is the RETROACTIVE MERGE: a new record bridges
    two entities that were distinct in every earlier batch, so
    entity_id is NOT monotone per record and the maintained state
    must support component fusion (union-find does, natively; a
    keyed label store would need cascading rewrites). Per batch:
    linkage pairs within Δ plus Δ×state (both legs via
    operators/dedup.record_linkage_pairs), folded into a union-find
    whose min-id fixpoint matches the batch operator and the
    recursive-CTE oracle. Bridge merges — a fusion of two components
    that EACH already contained a pre-batch record — are counted and
    asserted ≥1 (38 occur at the gate SF under the custkey mod 3
    split, measured before wiring). Final total assignment
    (singletons included) hash-matches the one-shot batch oracle:
    incremental ≡ recomputed. At 100 TB the union-find state is one
    entry per MATCHED record (matched sets are sparse), not per
    record; the blocked store bounds each Δ×S probe."""
    import json as _json
    import shutil
    import time as _time

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    rows = [r.asDict() for r in cust.collect()]
    chunks = [[r for r in rows if r["c_custkey"] % 3 == i] for i in range(3)]

    base = tempfile.mkdtemp(prefix="kspipeline-segolden-")
    src = os.path.join(base, "src")
    state_dir = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i, chunk in enumerate(chunks):
            path = os.path.join(src, f"cust{i}.json")
            with open(path, "w") as f:
                for r in chunk:
                    f.write(_json.dumps(r) + "\n")
            os.utime(path, (mtime0 + i, mtime0 + i))

        parent: dict = {}
        members: dict = {}
        stats: dict = {"batches": 0, "bridges": 0}
        seen: set = set()
        schema = (
            "c_custkey long, c_name string, c_nationkey int, "
            "c_mktsegment string"
        )

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.localCheckpoint(eager=True)
            legs = [_dedup.record_linkage_pairs(delta)]
            if stats["batches"] > 0:
                state = spark.read.schema(schema).parquet(state_dir)
                legs.append(_dedup.record_linkage_pairs(delta, other=state))
            for leg in legs:
                for r in leg.select("id_a", "id_b").collect():
                    u, v = r["id_a"], r["id_b"]
                    ru, rv = find(u), find(v)
                    if ru == rv:
                        continue
                    cu = members.get(ru, {ru})
                    cv = members.get(rv, {rv})
                    if (cu & seen) and (cv & seen):
                        stats["bridges"] += 1
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
                    members[lo] = cu | cv
                    members.pop(hi, None)
            delta.write.mode("append").parquet(state_dir)
            seen.update(
                r["c_custkey"] for r in delta.select("c_custkey").collect()
            )
            stats["batches"] += 1

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("entity replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if stats["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {stats['batches']}"
            )
        if stats["bridges"] < 1:
            raise AssertionError(
                "no retroactive entity merge despite the mod-3 split"
            )
        assigned = [
            (r["c_custkey"], find(r["c_custkey"])) for r in rows
        ]
        return spark.createDataFrame(
            [(k, e, 1 if k == e else 0) for k, e in assigned],
            "id long, entity_id long, is_survivor long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_sliding_distinct",
    oracle="""
        WITH e AS (
            SELECT epoch_ms(date_trunc('hour', ts)) AS h_ms, user_id
            FROM events
        ),
        x AS (
            SELECT h_ms - i * 3600000 AS window_ms, user_id
            FROM e, UNNEST([0, 1, 2]) AS t(i)
        )
        SELECT window_ms,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM x GROUP BY window_ms
    """,
)
def q_streaming_sliding_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of q_sliding_distinct (round 13, deferred cert
    → r14 window), certifying Spark 4's CHAINED STATEFUL AGGREGATION
    surface (SPARK-40925 multiple stateful operators): a native
    3-hour/1-hour sliding window groupBy(window, user) aggregate
    feeding a SECOND stateful aggregate over the window column —
    exact distinct users per sliding window with no sketch and no
    manual window explosion. Append mode means a window emits
    exactly once, when the watermark passes its close, so the replay
    carries a far-future sentinel row (filtered from the result, its
    windows excluded by time bound) to flush the tail — the same
    pattern the session-window row pinned in round 11. Three
    time-ordered micro-batches; every row is inside the 24 h grace.
    Hash-matched against the SAME exact oracle as the batch row:
    the two-level streaming state (per-(window,user) counts → per-
    window distinct totals) reproduces the one-shot recompute."""
    import json as _json
    import shutil
    import time as _time

    ev = _t(spark, sf_dir, "events").select(
        F.unix_millis("ts").alias("t_ms"), "user_id"
    )
    rows = sorted(
        ((r["t_ms"], r["user_id"]) for r in ev.collect()), key=lambda x: x[0]
    )
    max_ms = rows[-1][0]
    sentinel_ms = max_ms + 40 * 86_400_000  # far past every real window
    base = tempfile.mkdtemp(prefix="kspipeline-ssdist-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        n = len(rows)
        chunks = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
        chunks[2] = chunks[2] + [(sentinel_ms, -1)]
        mtime0 = _time.time() - 86_400
        for i, chunk in enumerate(chunks):
            path = os.path.join(src, f"ev{i}.json")
            with open(path, "w") as f:
                for t_ms, uid in chunk:
                    f.write(
                        _json.dumps({"t_ms": t_ms, "user_id": uid}) + "\n"
                    )
            os.utime(path, (mtime0 + i, mtime0 + i))

        emitted: list = []

        def sink(batch_df: DataFrame, _epoch_id: int) -> None:
            emitted.extend(batch_df.collect())

        stream = (
            spark.readStream.schema("t_ms long, user_id long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("ts", F.timestamp_millis(F.col("t_ms")))
            .withWatermark("ts", "24 hours")
        )
        per_user = stream.groupBy(
            F.window("ts", "3 hours", "1 hour").alias("w"), "user_id"
        ).agg(F.count(F.lit(1)).alias("cnt"))
        per_window = per_user.groupBy("w").agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("cnt").cast("long").alias("n_events"),
        )
        q = (
            per_window.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("sliding-distinct replay timed out")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        out = [
            (
                int(r["w"]["start"].timestamp() * 1000),
                r["n_events"],
                r["n_users"],
            )
            for r in emitted
            if int(r["w"]["start"].timestamp() * 1000) <= max_ms
        ]
        if len(out) < 3:
            raise AssertionError(f"too few emitted windows: {len(out)}")
        return spark.createDataFrame(
            out, "window_ms long, n_events long, n_users long"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_cosine_pairs",
    oracle=_sim.tf_cosine_pairs_oracle(),
)
def q_streaming_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the all-pairs similarity family (round 14):
    incremental INVERTED-INDEX cosine over a growing corpus. Per
    micro-batch, pairs(S ∪ Δ) − pairs(S) = (within Δ) ∪ (Δ × S) —
    both legs reuse operators/similarity.tf_cosine_pairs, the cross
    leg via other= over disjoint id sets — and the state store grows
    append-only AFTER the fold, so each pair is emitted exactly
    once, in the batch where its LATER document arrives. The
    weighting is deliberately PURE TF (df-free): TF-IDF's global df
    re-weights every existing pair whenever the corpus grows (the
    retroactive-update problem X1g's span store solves with a
    gram-bucketed view), while tf-cosine pair scores are static once
    both docs exist — which is what makes append-only emission ≡
    one-shot recompute an EXACT certificate; the batch row
    q_cosine_pairs certifies the TF-IDF weighting. Three availableNow
    micro-batches split by doc_id mod 3; the Δ×S counter is asserted
    ≥ 1 so the cross-batch leg provably executed. At 100 TB the
    state side is shingle-keyed postings: only Δ's shingles are ever
    joined (inverted-index partition pruning)."""
    import json as _json
    import shutil
    import time as _time

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [r.asDict() for r in docs.collect()]
    chunks = [[r for r in rows if r["doc_id"] % 3 == i] for i in range(3)]

    base = tempfile.mkdtemp(prefix="kspipeline-scospairs-")
    src = os.path.join(base, "src")
    state_dir = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i, chunk in enumerate(chunks):
            path = os.path.join(src, f"docs{i}.json")
            with open(path, "w") as f:
                for r in chunk:
                    f.write(_json.dumps(r) + "\n")
            os.utime(path, (mtime0 + i, mtime0 + i))

        sink: dict = {"pairs": [], "cross": 0, "batches": 0}
        schema = "doc_id long, text string"

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.localCheckpoint(eager=True)
            within = _sim.tf_cosine_pairs(delta)
            emitted = [tuple(r) for r in within.collect()]
            if sink["batches"] > 0:
                state = spark.read.schema(schema).parquet(state_dir)
                cross = _sim.tf_cosine_pairs(delta, other=state)
                cross_rows = [tuple(r) for r in cross.collect()]
                sink["cross"] += len(cross_rows)
                emitted.extend(cross_rows)
            sink["pairs"].extend(emitted)
            delta.write.mode("append").parquet(state_dir)
            sink["batches"] += 1

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("cosine replay timed out after 300 s")
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if sink["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {sink['batches']}"
            )
        if sink["cross"] < 1:
            raise AssertionError(
                "no cross-batch pair despite mod-3 split — the Δ×S "
                "leg never executed"
            )
        return spark.createDataFrame(
            sink["pairs"], "doc_a long, doc_b long, dot long"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_cosine_refresh",
    oracle=_sim.cosine_pairs_oracle(),
)
def q_streaming_cosine_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-boundary TF-IDF refresh for the streaming all-pairs
    family (round 15, VERDICT r14 item 7): the live path keeps
    PURE-TF pairs append-only (q_streaming_cosine_pairs — df-free
    deltas commute), and at each epoch boundary the TF-IDF pair set
    is re-emitted from the ACCUMULATED POSTINGS STATE in O(postings)
    — re-deriving df is one aggregate; per-document tokenization +
    shingling ran exactly once, in each doc's arrival micro-batch.
    Three availableNow micro-batches split by doc_id mod 3 append
    their shingle postings to the state store; the final epoch's
    refresh (operators/similarity.tfidf_pairs_from_postings —
    identical weights, overlong guard, and integer gate to
    cosine_pairs) hash-matches the SAME DuckDB oracle as the batch
    TF-IDF row. The replay asserts every batch appended postings,
    and the source chunks are DELETED before the refresh runs — so
    consuming the store (never the source) is enforced by
    construction. At 100 TB the postings state is shingle-keyed
    parquet and the refresh is a scan + one aggregate + the same
    bounded inverted-index join the batch row runs."""
    import json as _json
    import shutil
    import time as _time

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [r.asDict() for r in docs.collect()]
    chunks = [[r for r in rows if r["doc_id"] % 3 == i] for i in range(3)]

    base = tempfile.mkdtemp(prefix="kspipeline-scosrefresh-")
    src = os.path.join(base, "src")
    postings_dir = os.path.join(base, "postings")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i, chunk in enumerate(chunks):
            path = os.path.join(src, f"docs{i}.json")
            with open(path, "w") as f:
                for r in chunk:
                    f.write(_json.dumps(r) + "\n")
            os.utime(path, (mtime0 + i, mtime0 + i))

        sink: dict = {"batches": 0, "appended": []}
        schema = "doc_id long, text string"

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            # per-batch work is the EXPENSIVE per-doc part only:
            # shingle the delta once and append its postings.
            # localCheckpoint so the shingle transform runs ONCE for
            # both the counter and the store append (ADVICE r15:
            # count + write re-evaluated it, unlike the theil-sen
            # cross leg which already had this fix).
            delta = batch_df.localCheckpoint(eager=True)
            postings = _sim._shingle_tf(
                delta, "text", "doc_id"
            ).localCheckpoint(eager=True)
            n = postings.count()
            postings.write.mode("append").parquet(postings_dir)
            sink["appended"].append(n)
            sink["batches"] += 1

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "cosine refresh replay timed out after 300 s"
            )
        for _ in range(100):
            if all(aq.id != q.id for aq in spark.streams.active):
                break
            _time.sleep(0.1)

        if sink["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {sink['batches']}"
            )
        if min(sink["appended"]) < 1:
            raise AssertionError(
                f"a micro-batch appended no postings: {sink['appended']}"
            )
        # epoch boundary: df refresh + pair regeneration from the
        # postings STATE. The source chunks are DELETED first, so
        # "the refresh consumed the store, never the source" is
        # enforced by construction, not just documented (r15 review:
        # the docstring claimed a check that didn't exist)
        shutil.rmtree(src)
        state = spark.read.schema(
            "doc_id long, term string, tf long"
        ).parquet(postings_dir)
        out = [
            tuple(r)
            for r in _sim.tfidf_pairs_from_postings(state).collect()
        ]
        _sim.release()
        return spark.createDataFrame(
            out, "doc_a long, doc_b long, dot long"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_theil_sen",
    oracle=_ts_ops.theil_sen_trend_oracle(),
)
def q_streaming_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_theil_sen (round 15): robust trend
    maintained via APPEND-ONLY PAIR DELTAS — the X3q lens applied to
    the TSDB family. Pairwise slopes are static once both hour
    buckets exist (like tf-cosine pair scores), so per micro-batch
    the new pairs are exactly (within Δ) ∪ (Δ × state) — the
    expensive O(n²) pair generation is incremental, each pair
    computed once in the batch where its LATER hour arrives — while
    the median itself is rank-selected over the accumulated slope
    store at read time (medians don't merge; the store is the
    sufficient state). Hour-contiguous availableNow chunks (hourly
    buckets never straddle a batch — the q_streaming_acf replay
    convention), all state hours precede all delta hours by
    construction; the Δ×state counter is asserted ≥ 1 and the final
    median hash-matches the SAME oracle as the batch row via the
    shared theil_sen_median. At 100 TB the slope store is
    series-partitioned parquet and each batch's work is bounded by
    Δ-hours × state-hours, never recomputed from scratch."""
    import shutil

    hourly = _ts_ops.hourly_cents_series(
        _t(spark, sf_dir, "events")
    ).orderBy("h_ms", "event_type")
    rows = [
        (r["event_type"], int(r["h_ms"]), int(r["c"]))
        for r in hourly.collect()
    ]

    base = tempfile.mkdtemp(prefix="kspipeline-stheilsen-")
    src = os.path.join(base, "src")
    buckets_dir = os.path.join(base, "buckets")
    slopes_dir = os.path.join(base, "slopes")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        _write_hour_chunks(rows, src)

        sink = {"batches": 0, "cross_pairs": 0}
        bucket_schema = "event_type string, h_ms long, c long"
        slope_expr = (
            "CAST(c_b - c_a AS DOUBLE) /"
            " CAST((h_b - h_a) div 3600000 AS DOUBLE)"
        )

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.localCheckpoint(eager=True)
            da = delta.select(
                "event_type",
                F.col("h_ms").alias("h_a"),
                F.col("c").alias("c_a"),
            )
            db = delta.select(
                "event_type",
                F.col("h_ms").alias("h_b"),
                F.col("c").alias("c_b"),
            )
            within = (
                da.join(db, "event_type")
                .where(F.col("h_a") < F.col("h_b"))
                .selectExpr(
                    "event_type", "h_a", "h_b", f"{slope_expr} AS slope"
                )
            )
            new_pairs = within
            if sink["batches"] > 0:
                state = spark.read.schema(bucket_schema).parquet(
                    buckets_dir
                )
                # hour-contiguous chunks: every state hour precedes
                # every delta hour, so the cross leg is state×Δ with
                # (h_a, h_b) = (state.h, delta.h) — no normalization
                sa = state.select(
                    "event_type",
                    F.col("h_ms").alias("h_a"),
                    F.col("c").alias("c_a"),
                )
                # localCheckpoint so the state×Δ join (the dominant
                # per-batch cost) runs ONCE for both the assertion
                # counter and the store append (r15 review: count +
                # write re-evaluated the join and re-scanned state).
                # The h_a < h_b guard backs the hour-contiguity
                # invariant (ADVICE r15): if chunking ever produced
                # an equal/reversed hour pair, the row drops and the
                # oracle row-count mismatches loudly instead of a
                # silent ±Inf slope skewing the median.
                cross = (
                    sa.join(db, "event_type")
                    .where(F.col("h_a") < F.col("h_b"))
                    .selectExpr(
                        "event_type", "h_a", "h_b",
                        f"{slope_expr} AS slope",
                    )
                    .localCheckpoint(eager=True)
                )
                sink["cross_pairs"] += cross.count()
                new_pairs = within.unionByName(cross)
            new_pairs.write.mode("append").parquet(slopes_dir)
            delta.write.mode("append").parquet(buckets_dir)
            sink["batches"] += 1

        q = (
            spark.readStream.schema(bucket_schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("theil-sen replay timed out after 300 s")

        if sink["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {sink['batches']}"
            )
        if sink["cross_pairs"] < 1:
            raise AssertionError(
                "no Δ×state pair despite hour-contiguous chunking — "
                "the cross-batch leg never executed"
            )
        pairs = spark.read.schema(
            "event_type string, h_a long, h_b long, slope double"
        ).parquet(slopes_dir)
        out = [tuple(r) for r in _ts_ops.theil_sen_median(pairs).collect()]
        return spark.createDataFrame(
            out,
            "event_type string, n_pairs bigint,"
            " slope_cents_per_hour double",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_ccf",
    oracle=_ts_ops.ccf_by_series_oracle(),
)
def q_streaming_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_ccf (round 15): cross-correlation
    maintained from BOUNDED-WINDOW JOIN STATE + additive moments —
    a fourth IVM shape beside append-only pair deltas (X3q/Theil-
    Sen), O(1) sufficient statistics (ACF), and retroactive stores
    (X1g). At lag k the matched pair (x_h, y_{h−k}) completes when
    the LATER of the two hour buckets arrives, and |k| ≤ 3 bounds
    how far back the earlier one can live — so per-series state is
    only the last max_lag hours of buckets (a sliding join window),
    while the per-(pair, lag) moments (n, Σx, Σy, Σxy, Σx², Σy²)
    accumulate additively and never revisit history. Hour-contiguous
    availableNow chunks (the q_streaming_acf convention); matched
    pairs whose earlier bucket was folded in a PREVIOUS batch are
    counted and asserted ≥ 1; the final table computed from the
    folded moments alone hash-matches the SAME oracle as the batch
    q_ccf (maintained ≡ recomputed). At 100 TB the window state is
    max_lag hours × series — independent of stream length."""
    import shutil

    max_lag = _ts_ops.CCF_MAX_LAG
    hour_ms = _ts_ops.HOUR_MS
    hourly = _ts_ops.hourly_cents_series(
        _t(spark, sf_dir, "events")
    ).orderBy("h_ms", "event_type")
    rows = [
        (r["event_type"], int(r["h_ms"]), int(r["c"]))
        for r in hourly.collect()
    ]

    base = tempfile.mkdtemp(prefix="kspipeline-sccf-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        _write_hour_chunks(rows, src)

        # recent[(et, h_ms)] = (c, batch_folded_in); pruned below
        # current_hour − max_lag once per fold step
        recent: dict = {}
        moments: dict = {}
        sink = {"batches": 0, "cross_pairs": 0}

        def fold(batch_df: DataFrame, _epoch_id: int) -> None:
            batch = sorted(
                ((r["event_type"], r["h_ms"], r["c"])
                 for r in batch_df.collect()),
                key=lambda t: (t[1], t[0]),
            )
            for et, h, c in batch:
                for (et2, h2), (c2, b2) in list(recent.items()):
                    if et2 == et or abs(h2 - h) > max_lag * hour_ms:
                        continue
                    # pair key is (lexicographic min, max); lag k
                    # pairs x_t with y_{t−k}: k = (x hour − y hour)
                    # in whole hours, where x is the name-min series
                    if et < et2:
                        ka = (h - h2) // hour_ms
                        cx, cy = c, c2
                    else:
                        ka = (h2 - h) // hour_ms
                        cx, cy = c2, c
                    key = (min(et, et2), max(et, et2), ka)
                    m = moments.setdefault(
                        key, [0, 0, 0, 0, 0, 0]
                    )  # n, sx, sy, sxy, sxx, syy
                    m[0] += 1
                    m[1] += cx
                    m[2] += cy
                    m[3] += cx * cy
                    m[4] += cx * cx
                    m[5] += cy * cy
                    if b2 < sink["batches"]:
                        sink["cross_pairs"] += 1
                recent[(et, h)] = (c, sink["batches"])
                # prune the sliding join window: anything older than
                # max_lag hours can never match a future arrival
                # (arrivals are hour-ordered)
                for (et2, h2) in [
                    k for k in recent if k[1] < h - max_lag * hour_ms
                ]:
                    del recent[(et2, h2)]
            sink["batches"] += 1

        q = (
            spark.readStream.schema("event_type string, h_ms long, c long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("ccf replay timed out after 300 s")

        if sink["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {sink['batches']}"
            )
        if sink["cross_pairs"] < 1:
            raise AssertionError(
                "no matched pair crossed a batch boundary — the "
                "sliding join window never carried state across"
            )

        # the final table is computed IN SPARK with the identical
        # expression to the batch operator/oracle (Python's pow/round
        # conventions differ — pow(x,.5) is not IEEE sqrt and round()
        # is half-even where both engines are HALF_UP): exact integer
        # moments travel as strings -> DECIMAL(38,0), one double
        # division, NULL on zero variance
        mrows = [
            (ex, ey, int(k), n, str(sx), str(sy), str(sxy),
             str(sxx), str(syy))
            for (ex, ey, k), (n, sx, sy, sxy, sxx, syy)
            in moments.items()
        ]
        mdf = spark.createDataFrame(
            mrows,
            "et_x string, et_y string, lag bigint, n_pairs bigint,"
            " sx string, sy string, sxy string, sxx string, syy string",
        )
        return mdf.selectExpr(
            "et_x",
            "et_y",
            "lag",
            "n_pairs",
            """CASE WHEN n_pairs * CAST(sxx AS DECIMAL(38,0))
                      - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) = 0
                     OR n_pairs * CAST(syy AS DECIMAL(38,0))
                      - CAST(sy AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) = 0
                    THEN NULL
               ELSE round(
                 CAST(n_pairs * CAST(sxy AS DECIMAL(38,0))
                      - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                      AS DOUBLE) /
                 (sqrt(CAST(n_pairs * CAST(sxx AS DECIMAL(38,0))
                       - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
                       AS DOUBLE)) *
                  sqrt(CAST(n_pairs * CAST(syy AS DECIMAL(38,0))
                       - CAST(sy AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                       AS DOUBLE))), 6)
               END AS ccf_r""",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_acf",
    oracle=_ts_ops.acf_by_series_oracle(),
)
def q_streaming_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_acf (round 14): autocorrelation maintained
    from O(1) SUFFICIENT STATISTICS per series — the third IVM lens
    beside append-only deltas (X3q) and retroactive stores (X1g).
    ACF's mean-centering makes naive emission retroactive (the global
    mean moves with every batch), but the centered sums decompose
    algebraically over raw mergeable stats:

        n²·num_k = n²·P_k − n·S·(2S − head_k − tail_k) + (n−k)·S²
        n²·den   = n²·SS − n·S²

    where P_k = Σ c_i·c_{i−k}, SS = Σ c², S = Σ c, and head_k/tail_k
    are the first/last k values — so per-series state is
    (n, S, SS, P_1..P_3, first-3, last-3): constant size however
    long the series grows, updated per appended hour in O(max_lag).
    The replay feeds 3 hour-contiguous availableNow chunks (hourly
    sums never straddle a batch); the final table is computed from
    the folded stats alone and hash-matches the SAME batch-window
    oracle as q_acf: maintained ≡ recomputed. Cross-batch lag
    products (P_k touching two chunks) asserted ≥ 1."""
    import shutil

    max_lag = _ts_ops.ACF_MAX_LAG
    hourly = _ts_ops.hourly_cents_series(
        _t(spark, sf_dir, "events")
    ).orderBy("h_ms", "event_type")
    rows = [
        (r["event_type"], int(r["h_ms"]), int(r["c"]))
        for r in hourly.collect()
    ]

    base = tempfile.mkdtemp(prefix="kspipeline-sacf-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        _write_hour_chunks(rows, src)

        state: dict = {}
        sink = {"batches": 0, "cross_products": 0}

        def fold(batch_df: DataFrame, _epoch_id: int) -> None:
            batch = sorted(
                ((r["event_type"], r["h_ms"], r["c"])
                 for r in batch_df.collect()),
                key=lambda t: (t[1], t[0]),
            )
            for et, _h, c in batch:
                st = state.setdefault(
                    et,
                    {"n": 0, "S": 0, "SS": 0,
                     "P": [0] * (max_lag + 1),
                     "head": [], "tail": []},
                )
                for k in range(1, max_lag + 1):
                    if len(st["tail"]) >= k:
                        prev = st["tail"][-k]
                        st["P"][k] += c * prev
                        # the value k back was folded in an earlier
                        # batch -> this product crosses batches
                        if st["n"] - k < sink["start_n"].get(et, 0):
                            sink["cross_products"] += 1
                st["n"] += 1
                st["S"] += c
                st["SS"] += c * c
                if len(st["head"]) < max_lag:
                    st["head"].append(c)
                st["tail"] = (st["tail"] + [c])[-max_lag:]
            sink["batches"] += 1
            sink["start_n"] = {et: st["n"] for et, st in state.items()}

        sink["start_n"] = {}
        q = (
            spark.readStream.schema("event_type string, h_ms long, c long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("acf replay timed out after 300 s")

        if sink["batches"] != 3:
            raise AssertionError(
                f"replay did not micro-batch per chunk: {sink['batches']}"
            )
        if sink["cross_products"] < 1:
            raise AssertionError(
                "no lag product crossed a batch boundary — the "
                "sufficient-stat fold never exercised cross-batch state"
            )

        out = []
        for et, st in state.items():
            n, S, SS = st["n"], st["S"], st["SS"]
            den = n * n * SS - n * S * S
            for k in range(1, max_lag + 1):
                if n <= k:
                    # the batch form's stack still emits the group
                    # for short series: (n_pairs=0, acf NULL) —
                    # dropping it would hash-mismatch the shared
                    # oracle on any <= max_lag-hour series (r14
                    # review finding)
                    out.append((et, k, 0, None))
                    continue
                head_k = sum(st["head"][:k])
                tail_k = sum(st["tail"][-k:])
                num = (
                    n * n * st["P"][k]
                    - n * S * (2 * S - head_k - tail_k)
                    + (n - k) * S * S
                )
                if den == 0:
                    acf = None
                else:
                    mag = (abs(num) * 1_000_000) // den
                    acf = mag if num >= 0 else -mag
                out.append((et, k, n - k, acf))
        return spark.createDataFrame(
            out, "event_type string, lag long, n_pairs long, acf_micro long"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_kll",
    oracle=_sk.kll_quantiles_oracle(),
)
def q_streaming_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_kll_quantiles (round 16 — VERDICT r15
    item 4): the KLL level lists maintained ACROSS micro-batches as
    a mergeable-summary fold — each batch inserts its events at
    level 0 into the persisted (event_type, level, v) state and
    re-compacts to capacity (merge IS level-list union + the shared
    kll_compact, which is exactly what makes the sketch mergeable),
    while the compaction log (m_l per series/level) accumulates so
    the exact error bound B = Σ m_l·2^l covers the WHOLE history,
    batches included. Four time-ordered availableNow chunks (one
    file per micro-batch, checkpointed, ascending mtimes); the final
    census — computed from the folded state alone via the shared
    kll_quantile_census — hash-matches the SAME oracle as the batch
    row: exact n and med2 value-matched, rank-window/weight/theorem
    bits pinned TRUE. Streaming B is larger than the batch build's
    (each batch triggers its own cascade) but remains covered by the
    same tracked accounting, which is the point: guaranteed error
    under incremental maintenance. At 100 TB the state is
    O(k·levels) per series — independent of stream length — and the
    per-batch work is one level-partitioned compaction cascade over
    Δ ∪ state. See operators/sketches.kll_compact."""
    import json as _json
    import shutil
    import time as _time

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as long)").alias("c"),
            "ts",
            "event_id",
        )
        .orderBy("ts", "event_id")
    )
    rows = [(r["event_type"], int(r["c"])) for r in ev.collect()]
    n_total = len(rows)
    n_chunks = 4
    chunks = [
        rows[(i * n_total) // n_chunks : ((i + 1) * n_total) // n_chunks]
        for i in range(n_chunks)
    ]

    base = tempfile.mkdtemp(prefix="kspipeline-skll-")
    src = os.path.join(base, "src")
    state_dir = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        mtime0 = _time.time() - 86_400
        for i, chunk in enumerate(chunks):
            path = os.path.join(src, f"vals{i}.json")
            with open(path, "w") as f:
                for et, c in chunk:
                    f.write(_json.dumps({"event_type": et, "c": c}) + "\n")
            os.utime(path, (mtime0 + i, mtime0 + i))

        counts: dict = {}
        sink: dict = {"batches": 0, "state_rows": []}
        item_schema = "event_type string, level int, v long"

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.select(
                "event_type",
                F.lit(0).cast("int").alias("level"),
                F.col("c").cast("long").alias("v"),
            )
            if sink["batches"] > 0:
                prior = spark.read.schema(item_schema).parquet(state_dir)
                merged = prior.unionByName(delta)
            else:
                merged = delta
            # kll_compact localCheckpoints every pass, so the
            # returned frame is materialized and safe to overwrite
            # the state dir it may have been read from
            state = _sk.kll_compact(merged, counts)
            state.write.mode("overwrite").parquet(state_dir)
            sink["state_rows"].append(state.count())
            sink["batches"] += 1

        q = (
            spark.readStream.schema("event_type string, c long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise AssertionError("streaming KLL replay timed out")
        assert sink["batches"] == n_chunks, sink
        # the fold genuinely crossed batches: once any compaction
        # fired, the state is strictly smaller than the input (at
        # tiny SFs where no cell ever exceeds k the sketch is
        # legitimately exact and keeps everything — B = 0)
        if counts:
            assert sink["state_rows"][-1] < n_total, sink
        else:
            assert sink["state_rows"][-1] == n_total, sink

        shutil.rmtree(src)
        state = spark.read.schema(item_schema).parquet(state_dir)
        values = _t(spark, sf_dir, "events").select(
            "event_type",
            F.expr("cast(round(value * 100) as long)").alias("c"),
        )
        out = [
            tuple(r)
            for r in _sk.kll_quantile_census(
                spark, values, state, counts
            ).collect()
        ]
        return spark.createDataFrame(
            out,
            "event_type string, n bigint, med2 bigint,"
            " weight_ok boolean, bound_ok boolean, q10_ok boolean,"
            " q50_ok boolean, q90_ok boolean, q99_ok boolean",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _streaming_privacy_oracle() -> str:
    legs = []
    for seq in range(4):
        legs.append(f"""
        SELECT CAST({seq} AS BIGINT) AS batch_seq,
               c_mktsegment,
               CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS class_size,
               CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                    AS BIGINT) AS n_distinct_sensitive,
               (count(*) < 10) AS k_at_risk,
               (count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 5)
                   AS l_at_risk
        FROM customer WHERE c_custkey % 4 <= {seq}
        GROUP BY c_mktsegment, c_nationkey""")
    return " UNION ALL ".join(legs)


@register("q_streaming_privacy", oracle=_streaming_privacy_oracle())
def q_streaming_privacy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PRIVACY MONITOR (round 16 — VERDICT r15 item 8):
    per-micro-batch k-anonymity + distinct-l-diversity audit over
    the same (market segment, nation) quasi-identifiers and
    balance-thousand sensitive bucket as the batch q_k_anonymity /
    q_l_diversity rows, maintained in the foreachBatch drift
    pattern. The sufficient state is (class, sensitive-bucket,
    count) — DOMAIN-bounded, never row-bounded — so each batch's
    work is one Δ-upsert plus an audit recomputed from state alone;
    raw history is never rescanned. Emits the full audit per batch
    (4 deterministic custkey-mod slices, cumulative by
    construction); the oracle recomputes every batch's audit from
    the cumulative slices. Driver-asserted monotonicity: in an
    append-only stream a class's at-risk flags can only CLEAR as
    diversity accrues, never re-arm — the property that makes the
    monitor's alerts actionable (an at-risk alert is definitive for
    the data seen so far). At 100 TB the state is classes ×
    sensitive domain and the audit is O(state). See
    operators/quality.l_diversity / k_anonymity."""
    import json as _json
    import shutil
    import time as _time

    K_T, L_T = 10, 5
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("bal_k"),
    )
    rows = cust.collect()
    base = tempfile.mkdtemp(prefix="kspipeline-sprivacy-")
    src = os.path.join(base, "src")
    state_dir = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        m0 = _time.time() - 86_400
        for c in range(4):
            p = os.path.join(src, f"chunk{c}.json")
            with open(p, "w") as f:
                for r in rows:
                    if r["c_custkey"] % 4 == c:
                        f.write(
                            _json.dumps(
                                {
                                    "seg": r["c_mktsegment"],
                                    "nat": r["c_nationkey"],
                                    "bal_k": r["bal_k"],
                                }
                            )
                            + "\n"
                        )
            os.utime(p, (m0 + c, m0 + c))

        sink: dict = {"batches": 0, "audits": []}
        state_schema = "seg string, nat long, bal_k long, cnt long"

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.groupBy("seg", "nat", "bal_k").agg(
                F.count(F.lit(1)).cast("long").alias("cnt")
            )
            if sink["batches"] > 0:
                prior = spark.read.schema(state_schema).parquet(state_dir)
                merged = (
                    prior.unionByName(delta)
                    .groupBy("seg", "nat", "bal_k")
                    .agg(F.sum("cnt").alias("cnt"))
                )
            else:
                merged = delta
            merged = merged.localCheckpoint(eager=True)
            merged.write.mode("overwrite").parquet(state_dir)
            # audit from STATE alone: class_size = Σcnt, diversity =
            # state rows per class (one row per distinct bucket)
            # diversity = state rows per class with a NON-NULL
            # bucket (count(DISTINCT) semantics — the NULL-sensitive
            # pin the batch q_l_diversity certifies; an all-NULL
            # class must read 0, not 1)
            audit = (
                merged.groupBy("seg", "nat")
                .agg(
                    F.sum("cnt").alias("class_size"),
                    F.count("bal_k")
                    .cast("long")
                    .alias("n_distinct_sensitive"),
                )
                .collect()
            )
            sink["audits"].append(audit)
            sink["batches"] += 1

        q = (
            spark.readStream.schema("seg string, nat long, bal_k long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise AssertionError("streaming privacy replay timed out")
        assert sink["batches"] == 4, sink

        out = []
        prev_risk: dict = {}
        for seq, audit in enumerate(sink["audits"]):
            for r in audit:
                k_risk = r["class_size"] < K_T
                l_risk = r["n_distinct_sensitive"] < L_T
                key = (r["seg"], r["nat"])
                if key in prev_risk:
                    pk, pl = prev_risk[key]
                    # append-only monotonicity: cleared flags never
                    # re-arm (class_size and diversity only grow)
                    assert not (k_risk and not pk), (seq, key)
                    assert not (l_risk and not pl), (seq, key)
                prev_risk[key] = (k_risk, l_risk)
                out.append(
                    (
                        seq,
                        r["seg"],
                        r["nat"],
                        r["class_size"],
                        r["n_distinct_sensitive"],
                        k_risk,
                        l_risk,
                    )
                )
        return spark.createDataFrame(
            out,
            "batch_seq bigint, c_mktsegment string, c_nationkey bigint,"
            " class_size bigint, n_distinct_sensitive bigint,"
            " k_at_risk boolean, l_at_risk boolean",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_theil_sen_windowed",
    oracle=_ts_ops.theil_sen_trend_windowed_oracle(),
)
def q_streaming_theil_sen_windowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of q_theil_sen_windowed (round 16): the
    long-horizon valve under incremental maintenance. Where the full
    streaming Theil-Sen (q_streaming_theil_sen) must keep EVERY seen
    hour bucket as join state (pair partners reach arbitrarily far
    back), the W-hour pair restriction makes the state a BOUNDED
    SLIDING WINDOW — only buckets within W hours of the stream head
    can ever pair with a future arrival, so state is ≤ (W+1) hours ×
    series regardless of stream length (asserted per batch after
    pruning; the q_streaming_ccf shape at TSDB-trend semantics).
    Each batch emits exactly the pairs whose LATER hour just
    arrived: (state ∪ Δ) buckets explode their ≤ W candidate partner
    hours map-side and one equi-join against Δ keeps real arrivals
    — the batch operator's lag-enumeration, so no pair is ever
    computed twice and the h_a < h_b ordering is built into the
    enumeration (k ≥ 1), not guarded after. Slopes append to the
    store; the final rank-selected median via the shared
    theil_sen_median hash-matches the SAME oracle as the batch
    windowed row."""
    import shutil

    W = _ts_ops.TS_WINDOW_HOURS
    HOUR = _ts_ops.HOUR_MS
    hourly = _ts_ops.hourly_cents_series(
        _t(spark, sf_dir, "events")
    ).orderBy("h_ms", "event_type")
    rows = [
        (r["event_type"], int(r["h_ms"]), int(r["c"]))
        for r in hourly.collect()
    ]
    n_series = len({et for et, _, _ in rows})

    base = tempfile.mkdtemp(prefix="kspipeline-stheilsenw-")
    src = os.path.join(base, "src")
    state_dir = os.path.join(base, "state")
    slopes_dir = os.path.join(base, "slopes")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        _write_hour_chunks(rows, src)

        sink = {"batches": 0, "cross_pairs": 0, "max_state": 0}
        bucket_schema = "event_type string, h_ms long, c long"
        slope_expr = (
            "CAST(c_b - c_a AS DOUBLE) /"
            " CAST((h_b - h_a) div 3600000 AS DOUBLE)"
        )

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.localCheckpoint(eager=True)
            if sink["batches"] > 0:
                state = spark.read.schema(bucket_schema).parquet(
                    state_dir
                )
                all_b = state.withColumn(
                    "from_state", F.lit(True)
                ).unionByName(
                    delta.withColumn("from_state", F.lit(False))
                )
            else:
                all_b = delta.withColumn("from_state", F.lit(False))
            x = all_b.select(
                "event_type",
                F.col("h_ms").alias("h_a"),
                F.col("c").alias("c_a"),
                "from_state",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, {W}),"
                        f" k -> h_ms + CAST(k AS BIGINT) * {HOUR})"
                    )
                ).alias("h_b"),
            )
            db = delta.select(
                "event_type",
                F.col("h_ms").alias("h_b"),
                F.col("c").alias("c_b"),
            )
            pairs = (
                x.join(db, ["event_type", "h_b"])
                .selectExpr(
                    "event_type", "h_a", "h_b",
                    f"{slope_expr} AS slope", "from_state",
                )
                .localCheckpoint(eager=True)
            )
            sink["cross_pairs"] += pairs.where("from_state").count()
            pairs.drop("from_state").write.mode("append").parquet(
                slopes_dir
            )
            # prune to the sliding window: only buckets within W
            # hours of the head can pair with a future arrival
            head = all_b.agg(F.max("h_ms")).collect()[0][0]
            new_state = (
                all_b.where(F.col("h_ms") >= head - W * HOUR)
                .select("event_type", "h_ms", "c")
                .localCheckpoint(eager=True)
            )
            n_state = new_state.count()
            sink["max_state"] = max(sink["max_state"], n_state)
            assert n_state <= (W + 1) * n_series, (n_state, W, n_series)
            new_state.write.mode("overwrite").parquet(state_dir)
            sink["batches"] += 1

        q = (
            spark.readStream.schema(bucket_schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise AssertionError(
                "streaming windowed theil-sen replay timed out"
            )
        assert sink["batches"] == 3, sink
        assert sink["cross_pairs"] >= 1, sink

        pairs = spark.read.schema(
            "event_type string, h_a long, h_b long, slope double"
        ).parquet(slopes_dir)
        out = [
            tuple(r) for r in _ts_ops.theil_sen_median(pairs).collect()
        ]
        return spark.createDataFrame(
            out,
            "event_type string, n_pairs bigint,"
            " slope_cents_per_hour double",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_seasonal",
    oracle=_ts_ops.seasonal_decompose_oracle(),
)
def q_streaming_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12ag (round 16): streaming twin of q_seasonal_decompose —
    classical additive decomposition maintained incrementally. The
    centered 2x24 MA makes naive emission look retroactive (a row's
    trend needs 12 FUTURE hours), but the window is BOUNDED: state
    per series is (a) the tail buffer of the last <= 25 hourly rows
    and (b) the per-hour-of-day additive moments (n, s1 = sum dt,
    s2 = sum dt^2) — each appended hour completes exactly the window
    centered 12 rows back, folds one dt into its hod's moments, and
    retires the oldest buffer row. Constant state per series however
    long the stream runs; the remainder leg needs NO raw history
    because n^2*sum((dt - mean)^2) = n^2*s2 - n*s1^2 (the moment
    identity documented on the batch operator). Replay: 3
    hour-contiguous availableNow chunks of the shared
    hourly_cents_series (hourly sums never straddle a batch — the
    q_streaming_acf convention, ascending mtimes); the final table
    is computed from the folded moments alone and hash-matches the
    SAME oracle as the batch row: maintained == recomputed.
    Completions whose 25-row window spans rows folded in an EARLIER
    batch are counted and asserted >= 1, so the cross-batch buffer
    hand-off is genuinely exercised. See
    operators/timeseries.seasonal_decompose."""
    import shutil

    period = _ts_ops.SEASONAL_PERIOD
    half = period // 2
    full = period + 1
    scale = 2 * period
    hourly = _ts_ops.hourly_cents_series(
        _t(spark, sf_dir, "events")
    ).orderBy("h_ms", "event_type")
    rows = [
        (r["event_type"], int(r["h_ms"]), int(r["c"]))
        for r in hourly.collect()
    ]

    base = tempfile.mkdtemp(prefix="kspipeline-sseas-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        _write_hour_chunks(rows, src)

        state: dict = {}
        sink = {"batches": 0, "cross_windows": 0, "start_n": {}}

        def fold(batch_df: DataFrame, _epoch_id: int) -> None:
            batch = sorted(
                ((r["event_type"], r["h_ms"], r["c"])
                 for r in batch_df.collect()),
                key=lambda t: (t[1], t[0]),
            )
            for et, h, c in batch:
                st = state.setdefault(
                    et, {"n": 0, "buf": [], "hod": {}}
                )
                st["n"] += 1
                st["buf"].append((h, c))
                if len(st["buf"]) == full:
                    # window centered at the row 12 back completes
                    ch, cc = st["buf"][half]
                    trend = (
                        st["buf"][0][1]
                        + st["buf"][-1][1]
                        + 2 * sum(v for _, v in st["buf"][1:-1])
                    )
                    dtv = scale * cc - trend
                    hod = (ch // 3_600_000) % 24
                    m = st["hod"].setdefault(hod, [0, 0, 0])
                    m[0] += 1
                    m[1] += dtv
                    m[2] += dtv * dtv
                    # oldest window row's 1-based position is
                    # n - 24; folded in an earlier batch iff it
                    # precedes this batch's starting count
                    if st["n"] - period <= sink["start_n"].get(et, 0):
                        sink["cross_windows"] += 1
                    st["buf"] = st["buf"][1:]
            sink["batches"] += 1
            sink["start_n"] = {
                et: st["n"] for et, st in state.items()
            }

        q = (
            spark.readStream.schema(
                "event_type string, h_ms long, c long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "seasonal replay timed out after 300 s"
            )

        assert sink["batches"] == 3, sink
        assert sink["cross_windows"] >= 1, (
            "no completed window spanned a batch boundary — the "
            "tail-buffer hand-off was never exercised"
        )

        out = []
        for et, st in state.items():
            for hod, (n, s1, s2) in st["hod"].items():
                mag = (abs(s1) * 1000) // (n * scale)
                seasonal = mag if s1 >= 0 else -mag
                msr = (n * s2 - s1 * s1) // (
                    scale * scale * n * n
                )
                out.append((et, hod, n, seasonal, msr))
        return spark.createDataFrame(
            out,
            "event_type string, hod long, n_obs long,"
            " seasonal_milli long, msr_cents2 long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _streaming_t_closeness_oracle() -> str:
    legs = []
    for seq in range(4):
        legs.append(f"""
        SELECT CAST({seq} AS BIGINT) AS batch_seq, *
        FROM (
            WITH base AS (
                SELECT c_mktsegment AS seg,
                       CAST(c_nationkey AS BIGINT) AS nat,
                       CAST(floor(c_acctbal / 1000) AS BIGINT) AS s
                FROM customer
                WHERE c_acctbal IS NOT NULL AND c_custkey % 4 <= {seq}
            ),
            gdist AS (SELECT s, count(*) AS gq FROM base GROUP BY s),
            tot AS (SELECT count(*) AS N, count(DISTINCT s) AS m
                    FROM base),
            cls AS (
                SELECT seg, nat, count(*) AS n_c FROM base
                GROUP BY seg, nat
            ),
            cell AS (
                SELECT seg, nat, s, count(*) AS cp
                FROM base GROUP BY seg, nat, s
            ),
            grid AS (
                SELECT c.seg, c.nat, c.n_c, g.s, g.gq,
                       COALESCE(cell.cp, 0) AS cp
                FROM cls c CROSS JOIN gdist g
                LEFT JOIN cell ON cell.seg = c.seg AND cell.nat = c.nat
                              AND cell.s = g.s
            ),
            cum AS (
                SELECT seg, nat, n_c, s,
                       sum(cp) OVER (PARTITION BY seg, nat
                                     ORDER BY s) AS cpc,
                       sum(gq) OVER (PARTITION BY seg, nat
                                     ORDER BY s) AS gqc
                FROM grid
            )
            SELECT seg AS c_mktsegment, nat AS c_nationkey,
                   CAST(max(n_c) AS BIGINT) AS class_size,
                   CAST((SELECT m FROM tot) AS BIGINT) AS domain_size,
                   CAST(sum(abs(CAST(cpc AS HUGEINT)
                              * (SELECT N FROM tot)
                              - CAST(gqc AS HUGEINT) * n_c))
                        AS BIGINT) AS emd_num,
                   (sum(abs(CAST(cpc AS HUGEINT) * (SELECT N FROM tot)
                          - CAST(gqc AS HUGEINT) * n_c)) * 12
                    > 1 * ((SELECT m FROM tot) - 1)
                        * CAST(max(n_c) AS HUGEINT)
                        * (SELECT N FROM tot)) AS at_risk
            FROM cum GROUP BY seg, nat
        )""")
    return " UNION ALL ".join(legs)


@register(
    "q_streaming_t_closeness", oracle=_streaming_t_closeness_oracle()
)
def q_streaming_t_closeness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X10i (round 16): streaming t-closeness monitor — the third
    rung of the governance ladder (after q_streaming_privacy's
    k-anonymity + l-diversity) under incremental maintenance. The
    sufficient state is the JOINT distribution (class, sensitive
    bucket, count) — domain-bounded, exactly the q_streaming_privacy
    state — because the ordered-domain EMD is a pure function of the
    joint: the global distribution, class sizes and totals all
    derive from it by aggregation. Each batch is one Δ-upsert plus
    an audit recomputed from state alone via the SHARED
    quality.t_closeness_from_cells (the batch row reduces its rows
    to the same cells and calls the same function, so the distance
    convention cannot fork). Unlike k/l flags, t-closeness is NOT
    monotone under appends — a class can drift toward or away from
    the global distribution as data accrues — so the monitor's
    per-batch re-audit is the exact semantics, and the replay
    asserts the EMD genuinely MOVED for at least one class between
    batches (state is live, not replayed from scratch). Oracle
    recomputes every batch's audit from cumulative custkey-mod
    slices — exact hash match on all 4 batches. At 100 TB the state
    is classes × sensitive domain; per-batch work is O(state), raw
    history never rescanned."""
    import json as _json
    import shutil
    import time as _time

    from kafka_streams_pipeline_spark.operators.quality import (
        t_closeness_from_cells,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.expr(
            "CAST(floor(c_acctbal / 1000) AS BIGINT)"
        ).alias("bal_k"),
    ).where(F.col("bal_k").isNotNull())
    rows = cust.collect()
    base = tempfile.mkdtemp(prefix="kspipeline-stclose-")
    src = os.path.join(base, "src")
    state_dir = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        m0 = _time.time() - 86_400
        for c in range(4):
            p = os.path.join(src, f"chunk{c}.json")
            with open(p, "w") as f:
                for r in rows:
                    if r["c_custkey"] % 4 == c:
                        f.write(
                            _json.dumps(
                                {
                                    "seg": r["c_mktsegment"],
                                    "nat": r["c_nationkey"],
                                    "bal_k": r["bal_k"],
                                }
                            )
                            + "\n"
                        )
            os.utime(p, (m0 + c, m0 + c))

        sink: dict = {"batches": 0, "audits": []}
        state_schema = "seg string, nat long, bal_k long, cnt long"

        def maintain(batch_df: DataFrame, _epoch_id: int) -> None:
            delta = batch_df.groupBy("seg", "nat", "bal_k").agg(
                F.count(F.lit(1)).cast("long").alias("cnt")
            )
            if sink["batches"] > 0:
                prior = spark.read.schema(state_schema).parquet(
                    state_dir
                )
                merged = (
                    prior.unionByName(delta)
                    .groupBy("seg", "nat", "bal_k")
                    .agg(F.sum("cnt").alias("cnt"))
                )
            else:
                merged = delta
            merged = merged.localCheckpoint(eager=True)
            merged.write.mode("overwrite").parquet(state_dir)
            audit = t_closeness_from_cells(
                merged.select(
                    "seg",
                    "nat",
                    F.col("bal_k").alias("s"),
                    F.col("cnt").alias("cp"),
                ),
                ["seg", "nat"],
            ).collect()
            sink["audits"].append(audit)
            sink["batches"] += 1

        q = (
            spark.readStream.schema(
                "seg string, nat long, bal_k long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "streaming t-closeness replay timed out"
            )
        assert sink["batches"] == 4, sink

        # the audit must be maintained, not constant: some class's
        # EMD moved between consecutive batches (new rows shift the
        # class AND global distributions)
        moved = False
        for a, b in zip(sink["audits"], sink["audits"][1:]):
            pa = {(r["seg"], r["nat"]): r["emd_num"] for r in a}
            for r in b:
                k = (r["seg"], r["nat"])
                if k in pa and pa[k] != r["emd_num"]:
                    moved = True
        assert moved, "EMD never moved across batches"

        out = []
        for seq, audit in enumerate(sink["audits"]):
            for r in audit:
                out.append(
                    (
                        seq,
                        r["seg"],
                        r["nat"],
                        r["class_size"],
                        r["domain_size"],
                        r["emd_num"],
                        r["at_risk"],
                    )
                )
        return spark.createDataFrame(
            out,
            "batch_seq bigint, c_mktsegment string,"
            " c_nationkey bigint, class_size bigint,"
            " domain_size bigint, emd_num bigint, at_risk boolean",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register("q_streaming_ewma", oracle=_ts_ops.ewma_by_series_oracle())
def q_streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12aj (round 16): streaming twin of q_ewma — the truncated
    dyadic smoother is DESIGNED for incremental maintenance: each
    arriving hourly row's output depends on exactly the last
    W = 16 values, so per-series state is a bounded (W−1)-deep
    buffer and the emission is APPEND-ONLY (a row's ewma never
    revises — the truncation that buys integer exactness also buys
    emission finality; the untruncated recurrence would need no
    buffer but could never be exact). Replay: 3 hour-contiguous
    availableNow chunks of the shared hourly_cents_series; each
    batch emits one (series, h_ms, ewma_milli) row per appended
    hour computed from buffer + new value via the SAME
    renormalized-dyadic formula; emissions whose window spans rows
    buffered in an EARLIER batch are counted and asserted ≥ 1. The
    union of all emissions hash-matches the batch oracle: maintained
    ≡ recomputed. At 100 TB: O(W) state per series, O(W) work per
    event. See operators/timeseries.ewma_by_series."""
    import shutil

    w = _ts_ops.EWMA_W
    hourly = _ts_ops.hourly_cents_series(
        _t(spark, sf_dir, "events")
    ).orderBy("h_ms", "event_type")
    rows = [
        (r["event_type"], int(r["h_ms"]), int(r["c"]))
        for r in hourly.collect()
    ]

    base = tempfile.mkdtemp(prefix="kspipeline-sewma-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        _write_hour_chunks(rows, src)

        state: dict = {}
        sink: dict = {"batches": 0, "emit": [], "cross": 0,
                      "start_n": {}}

        def fold(batch_df: DataFrame, _epoch_id: int) -> None:
            batch = sorted(
                ((r["event_type"], r["h_ms"], r["c"])
                 for r in batch_df.collect()),
                key=lambda t: (t[1], t[0]),
            )
            for et, h, c in batch:
                st = state.setdefault(et, {"n": 0, "buf": []})
                st["n"] += 1
                vals = (st["buf"] + [c])[-w:]
                m = len(vals)
                num = sum(
                    vals[m - 1 - k] * (1 << (w - 1 - k))
                    for k in range(m)
                )
                den = (1 << w) - (1 << (w - m))
                mag = (abs(num) * 1000) // den
                sink["emit"].append(
                    (et, h, mag if num >= 0 else -mag)
                )
                # the emission used a value buffered in an earlier
                # batch iff the window reaches past this batch's
                # starting count
                if st["n"] - m < sink["start_n"].get(et, 0):
                    sink["cross"] += 1
                st["buf"] = vals[-(w - 1):]
            sink["batches"] += 1
            sink["start_n"] = {
                et: st["n"] for et, st in state.items()
            }

        q = (
            spark.readStream.schema(
                "event_type string, h_ms long, c long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("ewma replay timed out after 300 s")

        assert sink["batches"] == 3, sink
        assert sink["cross"] >= 1, (
            "no emission's window spanned a batch boundary — the "
            "buffer hand-off was never exercised"
        )
        return spark.createDataFrame(
            sink["emit"],
            "event_type string, h_ms long, ewma_milli long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_streaming_backtest",
    oracle=_ts_ops.seasonal_naive_backtest_oracle(),
)
def q_streaming_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12ak-s (round 16): streaming twin of the seasonal-naive
    forecast backtest — the rolling-origin evaluation every
    production forecaster actually runs: as each hour arrives, score
    yesterday's same-hour value (seasonal-naive) and the previous
    hour's value (naive baseline) against it, and fold the absolute
    errors. Per-series state is a bounded 24-deep value buffer plus
    the three additive moments (n_eval, Σ|err_seasonal|, Σ|err_naive|)
    — constant size at any stream length, O(1) work per hour. The
    final per-series table computed from the folded moments alone
    hash-matches the SAME oracle as the batch row (maintained ≡
    recomputed); evaluations whose 24-back value was buffered in an
    EARLIER batch are counted and asserted ≥ 1. See
    operators/timeseries.seasonal_naive_backtest."""
    import shutil

    period = _ts_ops.SEASONAL_PERIOD
    hourly = _ts_ops.hourly_cents_series(
        _t(spark, sf_dir, "events")
    ).orderBy("h_ms", "event_type")
    rows = [
        (r["event_type"], int(r["h_ms"]), int(r["c"]))
        for r in hourly.collect()
    ]

    base = tempfile.mkdtemp(prefix="kspipeline-sbacktest-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    try:
        _write_hour_chunks(rows, src)

        state: dict = {}
        sink: dict = {"batches": 0, "cross_evals": 0, "start_n": {}}

        def fold(batch_df: DataFrame, _epoch_id: int) -> None:
            batch = sorted(
                ((r["event_type"], r["h_ms"], r["c"])
                 for r in batch_df.collect()),
                key=lambda t: (t[1], t[0]),
            )
            for et, _h, c in batch:
                st = state.setdefault(
                    et,
                    {"n": 0, "buf": [], "n_eval": 0,
                     "mae_s": 0, "mae_n": 0},
                )
                st["n"] += 1
                if len(st["buf"]) == period:
                    # both lags exist: buf[0] is 24 back, buf[-1]
                    # is the previous hour
                    st["n_eval"] += 1
                    st["mae_s"] += abs(c - st["buf"][0])
                    st["mae_n"] += abs(c - st["buf"][-1])
                    # the 24-back value's 1-based position is
                    # n - 24; folded in an earlier batch iff it
                    # precedes this batch's starting count
                    if st["n"] - period <= sink["start_n"].get(et, 0):
                        sink["cross_evals"] += 1
                st["buf"] = (st["buf"] + [c])[-period:]
            sink["batches"] += 1
            sink["start_n"] = {
                et: st["n"] for et, st in state.items()
            }

        q = (
            spark.readStream.schema(
                "event_type string, h_ms long, c long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "backtest replay timed out after 300 s"
            )
        assert sink["batches"] == 3, sink
        assert sink["cross_evals"] >= 1, (
            "no evaluation's 24-back value crossed a batch "
            "boundary — the buffer hand-off was never exercised"
        )

        out = []
        for et, st in state.items():
            if st["n_eval"] == 0:
                continue
            mase = (
                None
                if st["mae_n"] == 0
                else (st["mae_s"] * 1000) // st["mae_n"]
            )
            out.append(
                (et, st["n_eval"], st["mae_s"], st["mae_n"], mase)
            )
        return spark.createDataFrame(
            out,
            "event_type string, n_eval long, mae_seasonal_num long,"
            " mae_naive_num long, mase_milli long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
