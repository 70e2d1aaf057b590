"""Declared query inventory — the driver-facing contract.

Each entry pairs a Spark DataFrame program (``(spark, sf_dir) →
DataFrame``) with an ANSI-SQL oracle DuckDB runs over the same
parquet fixtures; the driver hash-compares the two at sf0.01
(SURVEY.md §5.1). Names are stable contract keys from SURVEY.md §7.3.

Conventions that keep the value-hash stable (SURVEY.md §4 note,
FIXTURES.md §3):

- every computed float is ``round(x, 6)`` on BOTH sides;
- no timestamp-typed output columns — epoch millis BIGINT instead
  (avoids tz / sub-ms representation drift between engines);
- aggregates/computed columns carry identical aliases on both sides;
- any top-k is tie-broken by id so the selected rowset is unique.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_streams_pipeline_spark import geo
from kafka_streams_pipeline_spark.functions.hashing import md5_long, md5_long_sql
from kafka_streams_pipeline_spark.operators.queries import (
    history,
    history_interval,
    merge_views,
    reaggregate_precision,
    snapshot,
)
from kafka_streams_pipeline_spark.operators.view import build_view
from kafka_streams_pipeline_spark.sources.readings import (
    EVENT_TYPE_GEOHASH,
    readings_from_events,
    readings_from_events_sql,
)
from kafka_streams_pipeline_spark.sources.sinks import read_view, write_view
from kafka_streams_pipeline_spark.sources.tables import load_table, pushed_ts_range

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Names of queries bench.py treats as the headline set.
BENCH_QUERIES: list[str] = []
# Queries that EXECUTE heavyweight work at build time rather than
# returning a lazy plan: streaming replays (full checkpointed
# availableNow jobs), file-format round-trips that write/delete temp
# dirs server-side, and iterative collect-and-rebuild trainers. The
# REST registry route excludes these by default (ADVICE r5: an
# unauthenticated GET must not be able to pin the Spark session for
# minutes); serve(..., allow_materializing=...) opts back in.
MATERIALIZING: frozenset[str] = frozenset({
    "q_streaming_dedup",
    "q_streaming_hll",
    "q_streaming_view",
    "q_streaming_totals",
    "q_streaming_alerts",
    "q_csv_source",
    "q_orc_source",
    "q_ivf_train",
})

# Queries with a GREEN driver correctness row, ordered
# oldest-evidence-first so the spare window slots re-certify the
# stalest rows as a regression guard. The driver's per-round gate
# only covers the first 50 entries of ``__spark_entry__.queries()``,
# so rotation is required for every operator to accumulate a driver
# row: certified names go to the back of the returned dict,
# never-checked names to the front (VERDICT r2 "Next round" item 3,
# VERDICT r3 items 1-2, VERDICT r4 items 1-2).
# Round-3 evidence (CORRECTNESS_r03.json — names still stalest-r3
# after round 5 re-certified 14 of the original 50 into R5):
_CERTIFIED_R3: list[str] = [
    "q_text_tokens",
    "q_text_wordcount", "q_lang_id", "q_lang_stats", "q_pii_scrub",
    "q_doc_length_hist", "q_quality_score", "q_fingerprint",
    "q_multimodal_meta",
    "q_sliding_window", "q_session_window",
    "q_text_bigrams", "q_term_stats", "q_dedup_edit",
    "q_repetition_stats",
    "q_heuristic_filter", "q_hash_split", "q_ivf_train",
    "q_embed_quantize", "q_corpus_stats", "q_pack_sequences",
    "q_mixture_sample", "q_corpus_pipeline", "q_dedup_incremental",
    "q_range_band_join", "q_interval_join", "q_window_ntile",
    "q_grouping_sets", "q_minmax_by", "q_sessionize",
    "q_order_priority", "q_priority_shipmode", "q_chunk_dedup",
    "q_contamination", "q_stratified_sample", "q_daily_rollup",
]
# Round-4 evidence (CORRECTNESS_r04.json — all 50 window rows green;
# 8 of them were re-certified by round 5 and moved to R5):
_CERTIFIED_R4: list[str] = [
    "q_precision_reagg", "q_unpivot",
    "q_history_ordered", "q_semantic_dedup",
    "q_vocab_build", "q_unigram_surprisal",
    "q_small_qty_revenue", "q_large_orders",
    "q_customer_distribution", "q_hll_distinct",
    "q_radius_search", "q_decayed_engagement",
    "q_kmv_distinct",
    "q_source_cap", "q_revenue_forecast", "q_volume_shipping",
    "q_market_share", "q_returned_items", "q_waiting_suppliers",
    "q_sales_opportunity", "q_pq_encode", "q_pq_adc_topk",
    "q_window_cume",
    "q_scan_project", "q_filter_time_range", "q_json_extract",
    "q_event_time_valid", "q_hourly_view", "q_history",
    "q_history_interval", "q_snapshot", "q_reagg_merge", "q_gapfill",
    "q_date_trunc_funcs", "q_string_funcs", "q_math_funcs",
    "q_join_inner", "q_join_broadcast", "q_join_left", "q_join_semi",
    "q_join_anti", "q_group_distinct",
]
# Round-5 evidence (CORRECTNESS_r05.json — all 50 window rows green,
# listed in window order: the 15 _RECHECK re-certifications, then the
# 35 stalest rounds-2/3 rows the spare slots re-certified; derived by
# tools/rotate.py from the recorded evidence):
_CERTIFIED_R5: list[str] = [
    "q_dedup_components",
    "q_dedup_components_alt",
    "q_dedup_best_keeper",
    "q_dedup_prefix_join",
    "q_media_decode",
    "q_media_audio_energy",
    "q_media_image_decode",
    "q_media_image_resize",
    "q_media_video_frames",
    "q_media_jpeg_decode",
    "q_media_mjpeg_frames",
    "q_media_png_decode",
    "q_media_mp4_frames",
    "q_bloom_prefilter",
    "q_cms_heavy_hitters",
    "q_rollup",
    "q_cube",
    "q_salted_agg",
    "q_asof_attribution",
    "q_window_rank",
    "q_window_lag",
    "q_retention",
    "q_funnel",
    "q_latest_by_key",
    "q_scd2_intervals",
    "q_rolling_zscore",
    "q_set_ops",
    "q_union",
    "q_topk_limit",
    "q_tpch_pricing",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_promo_share",
    "q_supplier_volume",
    "q_quantiles",
    "q_pivot",
    "q_corr_stats",
    "q_group_mode",
    "q_hash_sample",
    "q_dedup_exact",
    "q_dedup_normalized",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_simhash",
    "q_dedup_embed",
    "q_dedup_embed_lsh",
    "q_sim_topk",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_array_stats",
]
DRIVER_CERTIFIED: list[str] = _CERTIFIED_R3 + _CERTIFIED_R4 + _CERTIFIED_R5
# Queries awaiting their first green driver row. Empty as of round 5:
# all 128 declared queries carry at least one green CORRECTNESS row
# (r1-r4 union), so the window is pure stalest-first re-certification.
_UNCERTIFIED_RED: list[str] = []
_PENDING: list[str] = []
# Queries added after the last driver window: they queue behind the
# uncertified backlog so they never displace an older query's slot.
# Round 6: the 17 round-5 additions move here from _DEFERRED
# (VERDICT r5 item 1) so the round-6 window certifies them first —
# taking driver-certified coverage to 145/145.
_ON_DECK: list[str] = [
    "q_streaming_dedup",
    "q_streaming_hll",
    "q_bm25",
    "q_knn_join",
    "q_skew_report",
    "q_streaming_view",
    "q_streaming_totals",
    "q_streaming_alerts",
    "q_csv_source",
    "q_orc_source",
    "q_disjunctive_revenue",
    "q_top_supplier",
    "q_profit_by_nation",
    "q_component_sizes",
    "q_hll_by_group",
    "q_trailing_window",
    "q_snapshot_ring",
]
# Certified queries whose backing operator code changed materially
# since their last green driver row (ADVICE r4): list them here to
# pull them to the window front for re-certification without losing
# their certified status bookkeeping. Populated during round 6 as
# code changes land.
_RECHECK: list[str] = []
# New queries deliberately parked at the BACK of the rotation for one
# round so the current window's composition is preserved; moved to
# _ON_DECK next round.
_DEFERRED: list[str] = [
    "q_media_features",
]


def driver_order() -> list[str]:
    """Registration names reordered for the driver's 50-query
    correctness window: every query lacking a green driver row first
    (unlisted new registrations, then red/pending/on-deck backlogs),
    then certified queries whose code changed since certification
    (_RECHECK), then the certified backlog oldest-evidence-first so
    spare slots re-certify the stalest green rows."""
    back = (
        set(DRIVER_CERTIFIED)
        | set(_UNCERTIFIED_RED)
        | set(_PENDING)
        | set(_ON_DECK)
        | set(_DEFERRED)
    )
    head = [n for n in QUERIES if n not in back]
    recheck = [n for n in _RECHECK if n not in head]
    certified_tail = [n for n in DRIVER_CERTIFIED if n not in recheck]
    return (
        head + _UNCERTIFIED_RED + _PENDING + _ON_DECK
        + recheck + certified_tail + _DEFERRED
    )


def register(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if bench:
            BENCH_QUERIES.append(name)
        return fn

    return deco


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


# ---------------------------------------------------------------------------
# Reference-derived queries (SURVEY.md §2.1–§2.8)
# ---------------------------------------------------------------------------


@register(
    "q_scan_project",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P2: scan + column projection (pruned parquet read)."""
    return _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "q_filter_time_range",
    oracle="""
        SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts <  TIMESTAMP '2024-01-12 00:00:00'
          AND event_type IN ('click', 'purchase')
    """,
)
def q_filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: time-range + key-membership predicates, both reaching
    the parquet scan. The time range goes through pushed_ts_range:
    the fixture's nanos-as-long storage means a predicate on the
    derived timestamp column cannot push through the conversion, so
    the equivalent raw-nanos range is what hits row-group stats."""
    import datetime as dt

    e = _t(spark, sf_dir, "events")
    return (
        pushed_ts_range(e, dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 12))
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "event_type",
            "value",
        )
    )


@register(
    "q_json_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/X6: JSON field extraction from the `props` payload column —
    the declarative stand-in for the reference's whole-record Jackson
    serde (JsonPOJODeserializer.java:43-56)."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "q_event_time_valid",
    oracle=f"""
        WITH r AS (
            SELECT CASE WHEN event_id % 97 = 0
                        THEN -CAST(epoch_ms(ts) AS BIGINT)
                        ELSE CAST(epoch_ms(ts) AS BIGINT) END AS timestamp
            FROM events
        )
        SELECT count(*) AS kept,
               min(timestamp) AS min_ts_ms,
               max(timestamp) AS max_ts_ms
        FROM r WHERE timestamp IS NOT NULL AND timestamp >= 0
    """,
)
def q_event_time_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: event-time validity guard (TSExtractor.java:15-17 rejects
    negative embedded timestamps; engine policy filters instead of
    crashing). Synthesizes invalid rows (every 97th) then filters."""
    e = _t(spark, sf_dir, "events")
    r = e.select(
        F.when(F.col("event_id") % 97 == 0, -F.unix_millis("ts"))
        .otherwise(F.unix_millis("ts"))
        .alias("timestamp")
    )
    kept = r.where(F.col("timestamp").isNotNull() & (F.col("timestamp") >= 0))
    return kept.agg(
        F.count(F.lit(1)).alias("kept"),
        F.min("timestamp").alias("min_ts_ms"),
        F.max("timestamp").alias("max_ts_ms"),
    )


@register(
    "q_hourly_view",
    oracle=VIEW_CTE
    + """
    SELECT gh,
           epoch_ms(window_start)  AS ws_ms,
           cnt                     AS cnt,
           round(s, 6)             AS sum_val,
           round(s / cnt, 6)       AS avg_val
    FROM v
    """,
    bench=True,
)
def q_hourly_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: the materialized windowed view itself — per (geohash-6
    cell, 1-hour epoch-aligned tumbling window) {count, sum, avg}
    (ingestion/KafkaStreamsAggregator.java:98-105)."""
    v = build_view(readings_from_events(_t(spark, sf_dir, "events")))
    return v.select(
        "gh",
        F.unix_millis("window_start").alias("ws_ms"),
        F.col("count").alias("cnt"),
        F.round("sum", 6).alias("sum_val"),
        F.round("avg", 6).alias("avg_val"),
    )


_HIST_CELLS = [EVENT_TYPE_GEOHASH["click"][:6], EVENT_TYPE_GEOHASH["purchase"][:6]]


@register(
    "q_history",
    oracle=VIEW_CTE
    + f"""
    SELECT epoch_ms(window_start)        AS "timestamp",
           round(sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0
                 / sum(cnt), 6)          AS avg
    FROM v
    WHERE gh IN ('{_HIST_CELLS[0]}', '{_HIST_CELLS[1]}')
      AND window_start >= TIMESTAMP '2024-01-05 00:00:00'
      AND window_start <= TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY window_start
    """,
    bench=True,
)
def q_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O1: history roll-up — time-series of `avg` over two cells
    in a time range (querying/QueryingController.java:45-60), served
    from the standing materialized store like the reference's
    interactive queries."""
    import datetime as dt

    v = _served_view(spark, sf_dir)
    out = history(
        v, "avg", _HIST_CELLS, dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20)
    )
    return out.withColumn("avg", F.round("avg", 6))


@register(
    "q_history_ordered",
    oracle=VIEW_CTE
    + f"""
    , h AS (
        SELECT epoch_ms(window_start)        AS "timestamp",
               round(sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0
                     / sum(cnt), 6)          AS avg
        FROM v
        WHERE gh IN ('{_HIST_CELLS[0]}', '{_HIST_CELLS[1]}')
          AND window_start >= TIMESTAMP '2024-01-05 00:00:00'
          AND window_start <= TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY window_start
    )
    SELECT CAST(row_number() OVER (ORDER BY "timestamp") AS BIGINT) AS seq,
           "timestamp", avg
    FROM h
    """,
)
def q_history_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 ordering certification: q_history plus an explicit
    ``seq`` column — row_number over the same window_start ordering
    the reference guarantees via its TreeMap result
    (querying/util/Aggregator.java:10,
    querying/QueryingController.java:45-60). The driver's value hash
    is order-insensitive, so a bare ORDER BY is invisible to it;
    binding each row to its rank makes any ordering error flip the
    hash. The rank rides the single already-sorted time axis (one
    tiny window over the serving result, not the raw data)."""
    import datetime as dt

    v = _served_view(spark, sf_dir)
    out = history(
        v, "avg", _HIST_CELLS, dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20)
    ).withColumn("avg", F.round("avg", 6))
    return out.select(
        F.row_number()
        .over(Window.orderBy("timestamp"))
        .cast("long")
        .alias("seq"),
        "timestamp",
        "avg",
    )


@register(
    "q_history_interval",
    oracle=VIEW_CTE
    + """
    , mx AS (SELECT max(window_start) AS m FROM v)
    SELECT epoch_ms(window_start) AS "timestamp",
           round(sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0, 6)
                                  AS sum
    FROM v, mx
    WHERE gh LIKE 'u155%'
      AND window_start >= m - INTERVAL 7 DAY
      AND window_start <= m
    GROUP BY window_start
    """,
)
def q_history_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: spatio-temporal history, range = [to − 1week, to], `to`
    defaulting to the max event time (deterministic stand-in for the
    reference's wall-clock now, QueryingController.java:65)."""
    v = _served_view(spark, sf_dir)
    out = history_interval(v, "sum", ["u155"], "1week")
    return out.withColumn("sum", F.round("sum", 6))


# Snapshot: bbox of the 'u155' precision-4 cell; its adaptive cover is
# the single prefix 'u155' → startswith predicate.
_SNAP_BBOX_S, _SNAP_BBOX_W, _SNAP_BBOX_N, _SNAP_BBOX_E = geo.decode_bbox("u155")


@register(
    "q_snapshot",
    oracle=VIEW_CTE
    + """
    SELECT gh                         AS geohash,
           round(sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0
                 / sum(cnt), 6)       AS avg
    FROM v
    WHERE window_start = TIMESTAMP '2024-01-07 10:00:00'
      AND gh LIKE 'u155%'
    GROUP BY gh
    """,
    bench=True,
)
def q_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/P5/P6/O2: snapshot — per-cell `avg` at the hour window
    containing ts, cells covering a lat/lon bbox
    (querying/QueryingController.java:81-96). ts is mid-hour to
    exercise the hour truncation (:82), served from the standing
    materialized store."""
    import datetime as dt

    v = _served_view(spark, sf_dir)
    out = snapshot(
        v,
        "avg",
        dt.datetime(2024, 1, 7, 10, 30),
        (_SNAP_BBOX_N, _SNAP_BBOX_W, _SNAP_BBOX_S, _SNAP_BBOX_E),
        precision=6,
    )
    return out.withColumn("avg", F.round("avg", 6))


@register(
    "q_reagg_merge",
    oracle=VIEW_CTE
    + """
    SELECT gh,
           epoch_ms(window_start) AS ws_ms,
           cnt                    AS cnt,
           round(s, 6)            AS sum_val,
           round(s / cnt, 6)      AS avg_val
    FROM v
    """,
)
def q_reagg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A7: algebraic partial-aggregate merge — the view rebuilt by
    merging two disjoint partial views must equal the direct
    aggregate (Aggregator.java:17-30; the oracle IS the direct
    aggregate, so a hash match proves the identity)."""
    readings = readings_from_events(_t(spark, sf_dir, "events"))
    p1 = readings.where(F.col("timestamp") % 2 == 0)
    p2 = readings.where(F.col("timestamp") % 2 == 1)
    merged = merge_views(build_view(p1), build_view(p2))
    return merged.select(
        "gh",
        F.unix_millis("window_start").alias("ws_ms"),
        F.col("count").alias("cnt"),
        F.round("sum", 6).alias("sum_val"),
        F.round("avg", 6).alias("avg_val"),
    )


@register(
    "q_daily_rollup",
    oracle=VIEW_CTE
    + """
    SELECT gh,
           epoch_ms(date_trunc('day', window_start)) AS day_ms,
           CAST(sum(cnt) AS BIGINT)                  AS cnt,
           sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0
                                                     AS sum_val,
           round(sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0
                 / sum(cnt), 6)                      AS avg_val
    FROM v
    GROUP BY gh, date_trunc('day', window_start)
    """,
)
def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup cascade: the daily view derived from the HOURLY
    materialized view by the A3 algebraic merge (sum counts, sum
    sums, recompute avg) — never from raw readings. At 100 TB the
    input is cells × hours rows (~1/10^6 of raw), the classic TSDB
    continuous-aggregate downsample; the oracle aggregates the hourly
    CTE the same way, so the hash match certifies the cascade."""
    v = _served_view(spark, sf_dir)
    # hourly sums are exact micros multiples (build_view accumulates
    # micros-integers), so recovering the integer and re-summing as
    # longs keeps the cascade order-independent end-to-end
    sum_u = F.sum(F.round(F.col("sum") * 1000000).cast("long"))
    return (
        v.groupBy("gh", F.date_trunc("day", "window_start").alias("day"))
        .agg(
            F.sum("count").alias("cnt"),
            (sum_u / 1000000.0).alias("sum_val"),
            F.round(sum_u / 1000000.0 / F.sum("count"), 6).alias("avg_val"),
        )
        .select(
            "gh",
            F.unix_millis("day").alias("day_ms"),
            "cnt",
            "sum_val",
            "avg_val",
        )
    )


@register(
    "q_gapfill",
    oracle=VIEW_CTE
    + """
    , spine AS (
        SELECT unnest(generate_series(
            TIMESTAMP '2024-01-05 00:00:00',
            TIMESTAMP '2024-01-07 23:00:00',
            INTERVAL 1 HOUR)) AS hour_ts
    )
    SELECT epoch_ms(spine.hour_ts)        AS ts_ms,
           coalesce(v.cnt, 0)             AS cnt,
           round(coalesce(v.s, 0.0), 6)   AS sum_val
    FROM spine
    LEFT JOIN (SELECT * FROM v WHERE gh = 'u155mz') v
           ON v.window_start = spine.hour_ts
    """,
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: dense hourly spine (sequence+explode,
    generated — no data scan) left-joined to the sparse view, missing
    hours as zero rows. The reference returns sparse TreeMaps
    (querying/QueryingController.java:45-60); densification is the
    standard TSDB resample step layered on top. The spine (preserved
    side) streams; the single-cell view slice — bounded by hour count
    at any scale — is the build side and is broadcast (a left join
    can only build right, so hinting the spine would be ignored)."""
    v = _served_view(spark, sf_dir).where(F.col("gh") == "u155mz")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-05 00:00:00").cast("timestamp"),
                F.lit("2024-01-07 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_ts")
    )
    return (
        spine
        .join(F.broadcast(v), v.window_start == spine.hour_ts, "left")
        .select(
            F.unix_millis("hour_ts").alias("ts_ms"),
            F.coalesce(F.col("count"), F.lit(0)).alias("cnt"),
            F.round(F.coalesce(F.col("sum"), F.lit(0.0)), 6).alias("sum_val"),
        )
    )


@register(
    "q_precision_reagg",
    oracle=VIEW_CTE
    + """
    SELECT substring(gh, 1, 4)    AS gh,
           epoch_ms(window_start) AS ws_ms,
           CAST(sum(cnt) AS BIGINT) AS cnt,
           round(sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0, 6)
                                  AS sum_val,
           round(sum(CAST(round(s * 1000000) AS BIGINT)) / 1000000.0
                 / sum(cnt), 6)   AS avg_val
    FROM v
    GROUP BY 1, 2
    """,
)
def q_precision_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time gh_precision re-aggregation: the precision-6 store
    re-keyed to the precision-4 grid via prefix truncation + A3 merge
    (querying/QueryingService.java:58-60 exposes gh_precision; the
    reference keeps one store per precision at
    ingestion/KafkaStreamsAggregator.java:39 — prefix nesting lets one
    fine store serve every coarser grid instead)."""
    v = reaggregate_precision(_served_view(spark, sf_dir), 4)
    return v.select(
        "gh",
        F.unix_millis("window_start").alias("ws_ms"),
        F.col("count").alias("cnt"),
        F.round("sum", 6).alias("sum_val"),
        F.round("avg", 6).alias("avg_val"),
    )


@register(
    "q_date_trunc_funcs",
    oracle="""
        SELECT event_id,
               epoch_ms(ts)                              AS ts_ms,
               epoch_ms(date_trunc('hour', ts))          AS hour_ms,
               epoch_ms(date_trunc('day', ts))           AS day_ms,
               epoch_ms(ts - INTERVAL 1 DAY)             AS minus_1d_ms,
               epoch_ms(ts - INTERVAL 7 DAY)             AS minus_7d_ms,
               epoch_ms(ts - INTERVAL 1 MONTH)           AS minus_1mo_ms
        FROM events
    """,
)
def q_date_trunc_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4/F5: hour/day truncation (UTC), calendar interval
    arithmetic (QueryingController.java:220-249), epoch-ms conversion."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms"),
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
        F.unix_millis(F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("minus_1d_ms"),
        F.unix_millis(F.col("ts") - F.expr("INTERVAL 7 DAY")).alias("minus_7d_ms"),
        F.unix_millis(F.col("ts") - F.expr("INTERVAL 1 MONTH")).alias("minus_1mo_ms"),
    )


@register(
    "q_string_funcs",
    oracle="""
        SELECT doc_id,
               substring(text, 1, 12)                   AS prefix12,
               upper(lang)                              AS lang_u,
               lower(source)                            AS source_l,
               CAST(length(text) AS BIGINT)             AS text_len,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               concat(lang, '/', source)                AS lang_source,
               lpad(CAST(doc_id AS VARCHAR), 8, '0')    AS id_padded
        FROM documents
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: substring/lower/upper/split/concat/lpad — the scalar
    string toolkit (KafkaStreamsAggregator.java:94,
    QueryingService.java:46,106)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 12).alias("prefix12"),
        F.upper("lang").alias("lang_u"),
        F.lower("source").alias("source_l"),
        F.length("text").cast("long").alias("text_len"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.concat_ws("/", "lang", "source").alias("lang_source"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_padded"),
    )


@register(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_quantity), 6)            AS qty_sqrt,
               round(ln(l_extendedprice), 6)         AS price_ln,
               round(abs(l_discount - 0.05), 6)      AS disc_dev,
               CAST(ceil(l_tax * 100) AS BIGINT)     AS tax_pct_ceil,
               CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
               round(power(1.0 + l_discount, 2), 6)  AS disc_sq
        FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 + capability rounding: arithmetic/math scalar functions."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil(F.col("l_tax") * 100).cast("long").alias("tax_pct_ceil"),
        F.floor(F.col("l_quantity") / 7).cast("long").alias("qty_div7"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2), 6).alias("disc_sq"),
    )


# ---------------------------------------------------------------------------
# Capability-rounding queries on the TPC-H-ish star schema (§2.4–§2.6)
# ---------------------------------------------------------------------------


@register(
    "q_join_inner",
    oracle="""
        SELECT c_mktsegment,
               count(*)                    AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    bench=True,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer, aggregated per segment. The
    customer side is broadcast (dimension ≪ fact) so the fact table
    never shuffles. Revenue uses cents-integer summation (_cents_sum)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _cents_sum(F.col("o_totalprice"), "revenue"),
        )
    )


@register(
    "q_join_broadcast",
    oracle="""
        SELECT r_name, n_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join of two dimensions (explicit broadcast hint)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "r_name", "n_name"
    )


@register(
    "q_join_left",
    oracle="""
        SELECT c_custkey,
               count(o_orderkey)                      AS n_orders,
               coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
                   / 100.0                            AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers; cents-integer
    money summation (_cents_sum)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                    F.lit(0),
                )
                / F.lit(100.0)
            ).alias("total_spent"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one open order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 250000
        )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order above 250k (filter
    pushed below the join so the build side shrinks first)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_group_distinct",
    oracle="""
        SELECT event_type,
               count(*)               AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
    """,
)
def q_group_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent in the reference; free in Spark —
    SURVEY.md §2.3 note)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*)                      AS n_items,
               round(sum(l_quantity), 6)     AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SQL kind — §2.3 note)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
    )


@register(
    "q_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*)                      AS n_items,
               round(sum(l_quantity), 6)     AS sum_qty
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 2^k key subsets in one pass (§2.3
    note: absent in the reference, free in Spark)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
    )


@register(
    "q_salted_agg",
    oracle="""
        SELECT event_type,
               count(*)                         AS count,
               sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS sum,
               round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
                     / count(*), 6)             AS avg
        FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted two-phase aggregation; the oracle is the
    DIRECT single-phase aggregate, so the hash match certifies the A3
    algebraic identity the salting relies on (operators/skew.py).
    Values are micros-integers so both phases sum exactly
    (order-independent — see _cents_sum)."""
    from kafka_streams_pipeline_spark.operators.skew import salted_aggregate

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("v_u"),
        "value",
    )
    out = salted_aggregate(e, ["event_type"], "v_u", spread_col="value")
    return out.select(
        "event_type",
        "count",
        (F.col("sum") / F.lit(1000000.0)).alias("sum"),
        F.round(F.col("sum") / F.lit(1000000.0) / F.col("count"), 6).alias("avg"),
    )


@register(
    "q_asof_attribution",
    bench=True,
    oracle="""
        SELECT event_id, user_id, ts_ms, last_click_ms,
               ts_ms - last_click_ms AS lag_ms
        FROM (
            SELECT event_id, user_id, event_type,
                   CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
                   last_value(CASE WHEN event_type = 'click'
                                   THEN CAST(epoch_ms(ts) AS BIGINT) END
                              IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS last_click_ms
            FROM events
        )
        WHERE event_type = 'purchase'
    """,
)
def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (attribution) join: for every purchase, the most recent
    strictly-preceding click by the same user. Expressed as a
    partition-local window (last over rows-preceding frame) — the
    scalable formulation when both sides share the partition key: one
    shuffle on user_id, no non-equi join explosion (SURVEY.md §2.4)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.unix_millis("ts")),
        ignorenulls=True,
    ).over(w)
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_millis("ts").alias("ts_ms"),
            last_click.alias("last_click_ms"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            "last_click_ms",
            (F.col("ts_ms") - F.col("last_click_ms")).alias("lag_ms"),
        )
    )


@register(
    "q_window_rank",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS INT) AS rk
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rk <= 3
    """,
    bench=True,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window function: top-3 orders per market segment
    (§2.5 — absent in reference, certified here). Tie-broken by
    o_orderkey for a unique rowset."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "q_window_lag",
    oracle="""
        SELECT event_id, user_id,
               CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
               CAST(epoch_ms(ts) AS BIGINT)
                 - lag(CAST(epoch_ms(ts) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_ms,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
               sum(CAST(round(value * 1000000) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) / 1000000.0 AS running_value
        FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: lag/lead + running sum over per-user event sequences —
    one shuffle on user_id serves all three analytics (same window
    spec). Running sum accumulates micros-integers (deterministic
    prefix sums — frame order is total via the event_id tiebreak)."""
    e = _t(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, 0)
    ts_ms = F.unix_millis("ts")
    return e.select(
        "event_id",
        "user_id",
        ts_ms.alias("ts_ms"),
        (ts_ms - F.lag(ts_ms).over(order)).alias("gap_ms"),
        F.lead("event_type").over(order).alias("next_type"),
        (
            F.sum(F.round(F.col("value") * 1000000).cast("long")).over(running)
            / 1000000.0
        ).alias("running_value"),
    )


@register(
    "q_retention",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort
            FROM events GROUP BY user_id
        ),
        active AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
        )
        SELECT CAST(epoch_ms(f.cohort) AS BIGINT) AS cohort_ms,
               CAST((epoch_ms(a.wk) - epoch_ms(f.cohort)) // 604800000
                    AS BIGINT)                    AS week_offset,
               count(*)                           AS n_active
        FROM active a JOIN first_seen f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen ISO week; for
    each (cohort, week offset), how many are active. Two keyed
    aggregates and one user_id join — the cohort table is small
    (one row per user) so at scale it broadcasts; week arithmetic is
    exact epoch-ms integer division."""
    e = _t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = e.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .select(
            F.unix_millis("cohort").alias("cohort_ms"),
            (
                (F.unix_millis("wk") - F.unix_millis("cohort"))
                / F.lit(604_800_000)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_ms", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q_funnel",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS v_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS c_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click'
              AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 30 MINUTE
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 30 MINUTE
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_viewed,
               (SELECT count(*) FROM c) AS n_clicked_30m,
               (SELECT count(*) FROM p) AS n_purchased_30m
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics funnel: users whose first view is followed by
    a click within 30 min, then a purchase within 30 min of that
    click. Each stage is a keyed min-aggregate joined to the previous
    stage on user_id — the same key throughout, so at scale every
    stage reuses one hash partitioning (no re-shuffle between stages
    under AQE exchange reuse)."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_30m")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_30m")))
    )


@register(
    "q_latest_by_key",
    oracle="""
        SELECT user_id,
               event_id AS last_event,
               CAST(epoch_ms(ts) AS BIGINT) AS last_ts_ms,
               event_type AS last_type,
               round(value, 6) AS last_value
        FROM (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def q_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/upsert primitive: latest event per key (row_number over a
    DESC event-time order, event_id tiebreak for totality) — the
    batch form of the changelog-compaction every materialized view
    relies on. One shuffle on the key; at scale this is the
    dropDuplicates-by-ordering pattern Spark plans as a single
    partial/final window."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event"),
            F.unix_millis("ts").alias("last_ts_ms"),
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
        )
    )


@register(
    "q_scd2_intervals",
    oracle="""
        SELECT user_id, event_id,
               round(value, 6) AS value,
               CAST(epoch_ms(ts) AS BIGINT) AS valid_from_ms,
               CAST(epoch_ms(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)) AS BIGINT)
                   AS valid_to_ms,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) IS NULL AS is_current
        FROM events
        WHERE event_type = 'purchase'
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) snapshot: turn each key's
    event log into [valid_from, valid_to) validity intervals via
    lead() — the standard event-sourcing → dimension-table transform.
    NULL valid_to marks the current row. One shuffle on the key; the
    event-type filter reaches the scan."""
    e = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(nxt).alias("valid_to_ms"),
        nxt.isNull().alias("is_current"),
    )


# Rolling z-score: milli-unit quantization keeps every windowed sum
# exact; n*Σx² stays far inside BIGINT at any frame length.
ZSCORE_FP = 1_000
ZSCORE_FRAME = 10  # trailing window length (rows)


@register(
    "q_rolling_zscore",
    oracle=f"""
        WITH q AS (
            SELECT event_id, user_id, ts, value,
                   CAST(round(value * {ZSCORE_FP}) AS BIGINT) AS xf
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, ts, xf,
                   count(*) OVER fr AS n,
                   sum(xf)  OVER fr AS s,
                   sum(xf * xf) OVER fr AS ss
            FROM q
            WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {ZSCORE_FRAME} PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id,
               CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
               CASE WHEN n >= 5 AND n * ss - s * s > 0
                    THEN round((n * xf - s) / sqrt(CAST(n * ss - s * s AS DOUBLE)), 6)
                    ELSE NULL END AS zscore
        FROM w
    """,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly score: z-score of each event's value
    against its trailing {frame}-row window per user — the standard
    streaming-monitoring analytic, here in its batch window-function
    form. Fixed-point milli-unit sums keep n, Σx, Σx² exact integers,
    so z = (n·x − Σx)/√(n·Σx² − (Σx)²) is one deterministic double
    expression — engine-portable despite being 'floating point'.
    One shuffle on user_id; the frame is evaluated streamingly within
    each partition (no per-row rescan)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "xf", F.round(F.col("value") * ZSCORE_FP).cast("long")
    )
    fr = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        -ZSCORE_FRAME, -1
    )
    n = F.count(F.lit(1)).over(fr)
    s = F.sum("xf").over(fr)
    ss = F.sum(F.col("xf") * F.col("xf")).over(fr)
    b = n * ss - s * s
    return e.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.when(
            (n >= 5) & (b > 0),
            F.round((n * F.col("xf") - s) / F.sqrt(b.cast("double")), 6),
        ).alias("zscore"),
    )


@register(
    "q_set_ops",
    oracle="""
        SELECT user_id, 'both' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
        UNION ALL
        SELECT user_id, 'click_only' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: INTERSECT + EXCEPT (set semantics) — buyers∩clickers and
    clickers∖buyers, tagged and unioned."""
    e = _t(spark, sf_dir, "events")
    clickers = e.where(F.col("event_type") == "click").select("user_id")
    buyers = e.where(F.col("event_type") == "purchase").select("user_id")
    both = clickers.intersect(buyers).withColumn("tag", F.lit("both"))
    only = clickers.subtract(buyers).withColumn("tag", F.lit("click_only"))
    return both.unionByName(only)


@register(
    "q_union",
    oracle="""
        SELECT user_id, 'clicker' AS cohort FROM events
        WHERE event_type = 'click' GROUP BY user_id
        UNION ALL
        SELECT user_id, 'buyer' AS cohort FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: unionByName of two derived cohorts (§2.6)."""
    e = _t(spark, sf_dir, "events")
    clickers = (
        e.where(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .withColumn("cohort", F.lit("clicker"))
    )
    buyers = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("cohort", F.lit("buyer"))
    )
    return clickers.unionByName(buyers)


@register(
    "q_topk_limit",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
)
def q_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k (Spark plans TakeOrderedAndProject — no
    global sort). Tie-broken by (orderkey, linenumber)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(10)
    )


@register(
    "q_tpch_pricing",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
                   AS sum_qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                   AS sum_base_price,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                   / 100.0 AS sum_disc_price,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                        AS BIGINT)) / 100.0 AS sum_charge,
               round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
                     / count(*), 6) AS avg_qty,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                     / count(*), 6) AS avg_price,
               round(sum(CAST(round(l_discount * 1000000) AS BIGINT)) / 1000000.0
                     / count(*), 6) AS avg_disc,
               count(*)                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship wide
    aggregation (single scan, map-side partial agg, tiny shuffle).
    All money/quantity sums are fixed-point integer sums
    (order-independent — see _cents_sum); averages derive from those
    exact sums, never avg() over raw doubles."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # pre-project the fixed-point terms so codegen evaluates each
    # rounding once per row, shared by the sum and the derived avg
    fixed = li.where(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(disc * 100).cast("long").alias("disc_price_c"),
        F.round(disc * (1 + F.col("l_tax")) * 100).cast("long").alias("charge_c"),
        F.round(F.col("l_discount") * 1000000).cast("long").alias("disc_u"),
    )
    qty_c, price_c = F.sum("qty_c"), F.sum("price_c")
    cnt = F.count(F.lit(1))
    return fixed.groupBy("l_returnflag", "l_linestatus").agg(
        (qty_c / 100.0).alias("sum_qty"),
        (price_c / 100.0).alias("sum_base_price"),
        (F.sum("disc_price_c") / 100.0).alias("sum_disc_price"),
        (F.sum("charge_c") / 100.0).alias("sum_charge"),
        F.round(qty_c / 100.0 / cnt, 6).alias("avg_qty"),
        F.round(price_c / 100.0 / cnt, 6).alias("avg_price"),
        F.round(F.sum("disc_u") / 1000000.0 / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "q_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) / 100.0 AS revenue,
               epoch_ms(o_orderdate) AS o_orderdate_ms,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '2000-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        HAVING sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) > 2000000
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: 3-table join with both date
    predicates pushed to their scans, the filtered customer dimension
    broadcast, and a fixed-point revenue HAVING instead of a LIMIT
    (LIMIT over revenue ties is engine-nondeterministic; a threshold
    is exact). At scale: lineitem⋈orders shuffles on orderkey once,
    customers never shuffle."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("2000-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("2000-03-15 00:00:00").cast("timestamp")
    )
    rev_c = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
            "long"
        )
    )
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_c.alias("rev_cents"))
        .where(F.col("rev_cents") > 2_000_000)
        .select(
            "l_orderkey",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            # o_orderdate is midnight-valued TIMESTAMP_NTZ; unix_date on
            # the DATE cast is timezone-free (unix_millis needs LTZ)
            (F.unix_date(F.to_date("o_orderdate")).cast("long") * 86_400_000)
            .alias("o_orderdate_ms"),
            "o_orderpriority",
        )
    )


@register(
    "q_local_supplier_volume",
    oracle="""
        SELECT n_name,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) / 100.0 AS revenue,
               count(*) AS n_lines
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
        GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local supplier volume: the 6-table join with
    the c_nationkey = s_nationkey 'local' condition. Declarative form
    lets Catalyst order the joins; supplier/nation/region (tiny) are
    broadcast, so the only shuffles are the two fact-side equi-joins
    (orders⋈customer on custkey, lineitem⋈orders on orderkey). The
    local condition rides the supplier broadcast join as an extra
    predicate — no additional shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_promo_share",
    oracle="""
        SELECT round(100.0 * (sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
                                 AS BIGINT) ELSE 0 END) / 100.0)
                     / (sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                                 AS BIGINT)) / 100.0), 6)
                   AS promo_share_pct,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2000-09-01 00:00:00'
    """,
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo revenue share: fact⋈dimension with a
    broadcast part side and the ship-date filter pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-09-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * (
                    F.sum(
                        F.when(
                            F.col("p_type") == "PROMO",
                            F.round(rev * 100).cast("long"),
                        ).otherwise(F.lit(0))
                    )
                    / F.lit(100.0)
                )
                / (F.sum(F.round(rev * 100).cast("long")) / F.lit(100.0)),
                6,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_supplier_volume",
    bench=True,
    oracle="""
        SELECT n_name,
               count(DISTINCT s_suppkey)                         AS n_suppliers,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                   / 100.0                                       AS volume
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
)
def q_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier volume: star join with both dimension sides
    broadcast — the fact table never shuffles for the join, only for
    the final small groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            _cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"
            ),
        )
    )


@register(
    "q_quantiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
               round(quantile_cont(l_quantity, 0.5), 6)      AS qty_p50
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the
    same continuous-quantile definition: sort + linear interpolation —
    deterministic, unlike approx sketches). percentile_approx remains
    the documented 100 TB path; this certifies the exact semantics."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("qty_p50"),
    )


@register(
    "q_pivot",
    oracle="""
        SELECT dow,
               count(*) FILTER (event_type = 'click')    AS click,
               count(*) FILTER (event_type = 'view')     AS view,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup')   AS signup,
               count(*) FILTER (event_type = 'error')    AS error
        FROM (SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, event_type
              FROM events)
        GROUP BY dow
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per day-of-week × event type. Explicit
    pivot values keep the plan single-pass (no distinct-values
    pre-query); the oracle is the conditional-aggregation rewrite.
    DuckDB dayofweek is 0=Sunday; Spark dayofweek is 1=Sunday, so the
    Spark side aligns with -1."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        e.select(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"), "event_type"
        )
        .groupBy("dow")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


@register(
    "q_corr_stats",
    oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT)      AS x,
                   CAST(round(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        ),
        m AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
            FROM q GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                     (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                      sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                     6) AS pearson_r
        FROM m
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate with the fixed-point discipline: Pearson
    correlation of quantity vs price per return flag. All five
    moments are exact integer sums over whole-unit-quantized values
    (one partial+final agg, order-independent — whole units keep
    sum(y^2) inside int64 through sf100); r is a single deterministic
    double expression over double-cast moments at the end —
    engine-portable where a naive corr() would flake on summation
    order. (Beyond that scale the moments move to DECIMAL(38); same
    plan shape.)"""
    li = _t(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    den = F.sqrt(nd * F.col("sxx") - sxd * F.col("sx")) * F.sqrt(
        nd * F.col("syy") - syd * F.col("sy")
    )
    return m.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        F.round(num / den, 6).alias("pearson_r"),
    )


@register(
    "q_group_mode",
    oracle="""
        WITH c AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS qty,
                   count(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        ),
        r AS (
            SELECT l_returnflag, qty, cnt,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY cnt DESC, qty) AS rn
            FROM c
        )
        SELECT l_returnflag, qty AS mode_qty, cnt AS mode_count
        FROM r WHERE rn = 1
    """,
)
def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tiebreak (highest count,
    then smallest value) as an AGGREGATE, not a window: max of a
    (cnt, -qty) struct after the count groupBy — two partial/final
    aggregations, no single-partition window sort at any group
    cardinality."""
    li = _t(spark, sf_dir, "lineitem")
    counts = (
        li.select("l_returnflag", F.col("l_quantity").cast("long").alias("qty"))
        .groupBy("l_returnflag", "qty")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy("l_returnflag")
        .agg(
            F.max(F.struct(F.col("cnt"), (-F.col("qty")).alias("nq"))).alias("m")
        )
        .select(
            "l_returnflag",
            (-F.col("m.nq")).alias("mode_qty"),
            F.col("m.cnt").alias("mode_count"),
        )
    )


@register(
    "q_unpivot",
    oracle="""
        WITH agg AS (
            SELECT l_returnflag,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS BIGINT)                                   AS qty_c,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT)                                   AS price_c,
                   count(*)                                          AS n
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty_c'   AS metric, qty_c   AS value FROM agg
        UNION ALL
        SELECT l_returnflag, 'price_c' AS metric, price_c AS value FROM agg
        UNION ALL
        SELECT l_returnflag, 'n'       AS metric, n       AS value FROM agg
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (pivot's inverse): wide per-flag aggregates →
    long (flag, metric, value) rows via DataFrame.unpivot — the
    Expand operator, one pass, no join. Values are fixed-point cents
    so the long format stays hash-exact."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_c"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["qty_c", "price_c", "n"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q_hash_sample",
    oracle=f"""
        SELECT lang,
               count(*) AS n_sampled,
               min(doc_id) AS first_id
        FROM documents
        WHERE {md5_long_sql("CAST(doc_id AS VARCHAR)")} % 20 = 0
        GROUP BY lang
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (~5%): the reproducible way to
    sample training data at 100 TB — membership depends only on the
    id, so re-runs, retries and different partitionings select the
    SAME sample (unlike rand()-based TABLESAMPLE). Per-language counts
    certify the stratification is stable."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(md5_long(F.col("doc_id").cast("string")) % 20 == 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_id"),
        )
    )


# ---------------------------------------------------------------------------
# Extension operators (SURVEY.md §2.9): dedup / similarity / text /
# multimodal — the LLM-data-pipeline family.
# ---------------------------------------------------------------------------

from kafka_streams_pipeline_spark.operators import dedup as _dedup  # noqa: E402
from kafka_streams_pipeline_spark.operators import multimodal as _mm  # noqa: E402
from kafka_streams_pipeline_spark.operators import similarity as _sim  # noqa: E402
from kafka_streams_pipeline_spark.operators import text as _text  # noqa: E402


@register(
    "q_dedup_exact",
    oracle="""
        SELECT md5(text) AS text_md5, min(doc_id) AS keeper,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact dedup (hash-groupBy, keeper = lowest id)."""
    return _dedup.exact_dedup(_t(spark, sf_dir, "documents"))


@register(
    "q_dedup_normalized",
    oracle=f"""
        SELECT md5({_dedup.DUCK_NORMALIZE.format(c='text')}) AS norm_md5,
               min(doc_id) AS keeper, count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: normalized-text dedup (lower/strip-punct/collapse-ws)."""
    return _dedup.normalized_dedup(_t(spark, sf_dir, "documents"))


@register("q_dedup_minhash", oracle=_dedup.minhash_pairs_oracle(0.8), bench=True)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: MinHash+LSH near-dup pairs (shingle→minhash→band→bucket
    join→exact-Jaccard verify, threshold 0.8)."""
    return _dedup.minhash_near_dup_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@register("q_dedup_ngram", oracle=_dedup.ngram_pairs_oracle(0.8))
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: exact n-gram Jaccard pairs via inverted shingle index —
    the exact baseline certifying the MinHash path."""
    return _dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@register("q_dedup_components", oracle=_dedup.components_oracle(0.8), bench=True)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: duplicate-group clustering — connected components over the
    MinHash pair graph by iterative min-label propagation; the oracle
    is a recursive-CTE transitive closure, certifying the fixpoint."""
    return _dedup.dedup_components(_t(spark, sf_dir, "documents"), threshold=0.8)


@register(
    "q_dedup_best_keeper",
    oracle=f"""
        WITH comp AS ({{COMPONENTS}}),
        q AS ({{QUALITY}}),
        j AS (
            SELECT comp.component, comp.doc_id, q.quality
            FROM comp JOIN q USING (doc_id)
        ),
        ranked AS (
            SELECT component, doc_id, quality,
                   row_number() OVER (
                       PARTITION BY component
                       ORDER BY quality DESC, doc_id DESC) AS rn,
                   count(*) OVER (PARTITION BY component) AS n_members
            FROM j
        )
        SELECT component,
               CAST(n_members AS BIGINT) AS n_members,
               doc_id AS keeper,
               quality AS keeper_quality
        FROM ranked WHERE rn = 1
    """,
)
def q_dedup_best_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 quality-aware dedup keeper selection: within each near-dup
    component (MinHash → connected components), keep the HIGHEST-
    quality member instead of the arbitrary lowest id — the policy a
    real corpus dedup actually wants (drop the worse copies). The
    arg-max is a partial/final max over a (quality, doc_id) struct —
    no window over the corpus; quality is the single-division
    integer-numerator score, so the keeper choice is deterministic
    and engine-identical (doc_id tiebreak on equal quality)."""
    docs = _t(spark, sf_dir, "documents")
    comps = _dedup.dedup_components(docs, threshold=0.8)
    q = _text.quality_score(docs)
    return (
        comps.join(q, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.struct(F.col("quality"), F.col("doc_id"))).alias("m"),
        )
        .select(
            "component",
            "n_members",
            F.col("m.doc_id").alias("keeper"),
            F.col("m.quality").alias("keeper_quality"),
        )
    )


# splice the sub-oracles in (both are self-contained SELECTs; the
# components one carries its own WITH RECURSIVE, legal as a nested
# CTE body)
ORACLES["q_dedup_best_keeper"] = (
    ORACLES["q_dedup_best_keeper"]
    .replace("{COMPONENTS}", _dedup.components_oracle(0.8))
    .replace("{QUALITY}", _text.quality_score_oracle())
)


@register("q_dedup_simhash", oracle=_dedup.simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: 32-bit SimHash signatures (bitwise majority of token
    hashes); near-dups land within small Hamming distance."""
    return _dedup.simhash_signatures(_t(spark, sf_dir, "documents"))


@register("q_dedup_embed", oracle=_sim.nearest_pairs_oracle(20))
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: embedding-cosine near-dup — top-20 closest vector pairs."""
    return _sim.nearest_pairs(_t(spark, sf_dir, "embeddings"), top_n=20)


@register("q_dedup_embed_lsh", oracle=_sim.nearest_pairs_lsh_oracle(20), bench=True)
def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 scale path: the same top-20 closest-pair query as
    q_dedup_embed, with the pair space pruned by banded hyperplane
    LSH (4 tables × 8 deterministic md5 planes) instead of the
    all-pairs join — single groupBy(bucket) shuffle + in-group pair
    generation, exact cosine on candidates only. ~7× faster than the
    exact baseline at sf0.1 and sub-quadratic at corpus scale."""
    return _sim.nearest_pairs_lsh(_t(spark, sf_dir, "embeddings"), top_n=20)


@register("q_sim_topk", oracle=_sim.topk_cosine_oracle(0, 10), bench=True)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: exact brute-force cosine top-10 for a stored query vector."""
    return _sim.topk_cosine(_t(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register("q_sim_ann_lsh", oracle=_sim.topk_cosine_lsh_oracle(0, 10))
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: hyperplane-LSH ANN top-10 (bucket-restricted; approximate
    by construction, deterministic planes → exact oracle)."""
    return _sim.topk_cosine_lsh(_t(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register("q_sim_ann_ivf", oracle=_sim.topk_cosine_ivf_oracle(0, 10))
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: IVF-style ANN top-10 — deterministic coarse quantizer,
    nprobe=2 cell probing, exact re-rank inside probed cells (the
    second scale path beside hyperplane LSH)."""
    return _sim.topk_cosine_ivf(_t(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register("q_array_stats", oracle=_sim.array_stats_oracle())
def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-vector array stats (dim, L2 norm, min/max/mean)."""
    return _sim.array_stats(_t(spark, sf_dir, "embeddings"))


@register("q_text_tokens", oracle=_text.token_stats_oracle())
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: per-document token statistics."""
    return _text.token_stats(_t(spark, sf_dir, "documents"))


@register("q_text_wordcount", oracle=_text.wordpiece_counts_oracle(), bench=True)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: BPE-ish regex tokenization → global term frequencies."""
    return _text.wordpiece_counts(_t(spark, sf_dir, "documents"))


@register("q_lang_id", oracle=_text.lang_id_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: stopword-vote language-ID heuristic."""
    return _text.lang_id(_t(spark, sf_dir, "documents"))


@register("q_lang_stats", oracle=_text.lang_table_stats_oracle())
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: per-language corpus statistics."""
    return _text.lang_table_stats(_t(spark, sf_dir, "documents"))


@register("q_pii_scrub", oracle=_text.pii_scrub_oracle())
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 / hygiene: PII redaction (emails, URLs, phones, long digit
    runs) — per-doc counts by type + scrubbed-text md5."""
    return _text.pii_scrub(_t(spark, sf_dir, "documents"))


@register("q_doc_length_hist", oracle=_text.doc_length_hist_oracle())
def q_doc_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 / profiling: document-length histogram (100-char buckets)."""
    return _text.doc_length_hist(_t(spark, sf_dir, "documents"))


@register("q_quality_score", oracle=_text.quality_score_oracle())
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: heuristic document quality score (length/diversity/shape)."""
    return _text.quality_score(_t(spark, sf_dir, "documents"))


@register("q_fingerprint", oracle=_text.fingerprints_oracle())
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: document fingerprints (md5 prefix + order-sensitive
    polynomial rolling hash)."""
    return _text.fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "q_multimodal_meta",
    oracle="""
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payloads + typed metadata;
    pure-JVM byte-length/md5 — the cheap pre-decode pass (decode
    itself is the real per-codec mapInPandas path certified by the
    q_media_* rows and q_media_features)."""
    media = _mm.media_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.binary_meta(media)


_MEDIA_FEATURES_ORACLE = """
    WITH aud AS (
        SELECT doc_id, doc_id % 50 + 10 AS n FROM documents
        WHERE doc_id % 3 = 1
    ),
    aud_s AS (
        SELECT doc_id, n,
               (doc_id * 31 + i * 7) % 65536 - 32768 AS s
        FROM aud, unnest(generate_series(0, n - 1)) AS t(i)
    ),
    aud_f AS (
        SELECT doc_id AS asset_id, 'audio' AS media_type,
               CAST(1 AS DOUBLE) AS f0, CAST(8000 AS DOUBLE) AS f1,
               CAST(16 AS DOUBLE) AS f2, CAST(n AS DOUBLE) AS f3,
               CAST(n * 1000 // 8000 AS DOUBLE) AS f4,
               CAST(max(abs(s)) AS DOUBLE) AS f5,
               CAST(sum(s) AS DOUBLE) AS f6,
               CAST(sum(s * s) AS DOUBLE) AS f7
        FROM aud_s GROUP BY doc_id, n
    ),
    img AS (
        SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 7 + 2 AS h
        FROM documents WHERE doc_id % 3 = 0
    ),
    img_px AS (
        SELECT doc_id, w, h, k,
               (doc_id * 17 + k * 29) % 256 AS v
        FROM img, unnest(generate_series(0, h * w * 3 - 1)) AS t(k)
    ),
    img_f AS (
        SELECT doc_id AS asset_id, 'image' AS media_type,
               CAST(w AS DOUBLE) AS f0, CAST(h AS DOUBLE) AS f1,
               CAST(24 AS DOUBLE) AS f2, CAST(w * h AS DOUBLE) AS f3,
               CAST(sum(CASE WHEN k % 3 = 0 THEN v ELSE 0 END) AS DOUBLE) AS f4,
               CAST(sum(CASE WHEN k % 3 = 1 THEN v ELSE 0 END) AS DOUBLE) AS f5,
               CAST(sum(CASE WHEN k % 3 = 2 THEN v ELSE 0 END) AS DOUBLE) AS f6,
               CAST(max(v) AS DOUBLE) AS f7
        FROM img_px GROUP BY doc_id, w, h
    ),
    vid AS (
        SELECT doc_id, doc_id % 4 + 2 AS nf, doc_id % 3 + 2 AS w,
               doc_id % 5 + 2 AS h
        FROM documents WHERE doc_id % 3 = 2
    ),
    vid_px AS (
        SELECT doc_id, nf, w, h, f,
               (doc_id * 23 + f * 101 + k * 29) % 256 AS v
        FROM vid,
             unnest(generate_series(0, nf - 1)) AS tf(f),
             unnest(generate_series(0, h * w * 3 - 1)) AS tk(k)
    ),
    vid_f AS (
        SELECT doc_id AS asset_id, 'video' AS media_type,
               CAST(w AS DOUBLE) AS f0, CAST(h AS DOUBLE) AS f1,
               CAST(40000 AS DOUBLE) AS f2, CAST(nf AS DOUBLE) AS f3,
               CAST(sum(v) AS DOUBLE) AS f4,
               CAST(max(v) AS DOUBLE) AS f5,
               CAST(sum(CASE WHEN f = 0 THEN v ELSE 0 END) AS DOUBLE) AS f6,
               CAST(sum(CASE WHEN f = nf - 1 THEN v ELSE 0 END) AS DOUBLE) AS f7
        FROM vid_px GROUP BY doc_id, nf, w, h
    )
    SELECT * FROM aud_f
    UNION ALL SELECT * FROM img_f
    UNION ALL SELECT * FROM vid_f
"""


@register("q_media_features", oracle=_MEDIA_FEATURES_ORACLE)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction, certified end-to-end: the
    mixed-modality fixture (REAL BMP/WAV/AVI payloads per doc_id % 3)
    through extract_features' per-media_type dispatch to the stdlib
    parsers, flattened to one row of 8 feature columns per asset. The
    oracle recomputes every decoded feature from the fixture's
    integer recurrences in pure SQL — so a parser that mis-walks any
    of the three containers flips the hash. See
    operators/multimodal.py extract_features/_real_features."""
    media = _mm.typed_media_from_documents(_t(spark, sf_dir, "documents"))
    feats = _mm.extract_features(media)
    return feats.select(
        "asset_id",
        "media_type",
        *[F.col("features")[i].alias(f"f{i}") for i in range(_mm.FEAT_DIM)],
    )


@register(
    "q_media_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 50 + 10 AS n FROM documents
        ),
        samples AS (
            SELECT doc_id, n,
                   (doc_id * 31 + i * 7) % 65536 - 32768 AS s
            FROM base, unnest(generate_series(0, n - 1)) AS t(i)
        )
        SELECT doc_id                          AS asset_id,
               CAST(1 AS BIGINT)               AS n_channels,
               CAST(8000 AS BIGINT)            AS sample_rate,
               CAST(16 AS BIGINT)              AS bits_per_sample,
               n                               AS n_samples,
               n * 1000 // 8000                AS duration_ms,
               max(abs(s))                     AS peak_abs,
               CAST(sum(s) AS BIGINT)          AS sum_samples,
               round(CAST(sum(s) AS BIGINT) / n, 6) AS mean_val
        FROM samples
        GROUP BY doc_id, n
    """,
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real decode kernel: genuine PCM16 RIFF/WAVE payloads
    synthesized per document, decoded by the stdlib chunk-walking WAV
    parser (operators/multimodal.parse_wav) inside mapInPandas —
    header fields + exact integer PCM stats. The oracle recomputes the
    decoded stats from the sample recurrence in pure SQL, so the hash
    match certifies the decode end-to-end. Payloads are built and
    decoded partition-locally: nothing but small typed columns ever
    shuffles."""
    wav = _mm.wav_from_documents(_t(spark, sf_dir, "documents"))
    dec = _mm.decode_wav(wav)
    return dec.select(
        "asset_id",
        "n_channels",
        "sample_rate",
        "bits_per_sample",
        "n_samples",
        "duration_ms",
        "peak_abs",
        "sum_samples",
        F.round(F.col("sum_samples") / F.col("n_samples"), 6).alias("mean_val"),
    )


@register(
    "q_media_audio_energy",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, doc_id % 50 + 10 AS n FROM documents
        ),
        samples AS (
            SELECT doc_id, i // {_mm.ENERGY_FRAME} AS frame_idx,
                   (doc_id * 31 + i * 7) % 65536 - 32768 AS s
            FROM base, unnest(generate_series(0, n - 1)) AS t(i)
        )
        SELECT doc_id            AS asset_id,
               frame_idx,
               count(*)          AS n_samples,
               CAST(sum(s * s) AS BIGINT) AS energy,
               max(abs(s))       AS peak_abs
        FROM samples
        GROUP BY doc_id, frame_idx
    """,
)
def q_media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 windowed audio analysis: WAV decode → fixed 20-sample
    framing → exact integer energy (Σs²) and peak per frame — the
    decode/window/feature chain before VAD or audio embedding,
    expanding 1 asset row → ceil(n/20) frame rows in the same Arrow
    pass as the decode."""
    wav = _mm.wav_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.audio_frame_energy(wav)


@register(
    "q_media_image_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 7 + 2 AS h
            FROM documents
        ),
        comps AS (
            SELECT doc_id, w, h, k,
                   (doc_id * 17 + k * 29) % 256 AS v
            FROM base, unnest(generate_series(0, w * h * 3 - 1)) AS t(k)
        )
        SELECT doc_id                 AS asset_id,
               w                      AS width,
               h                      AS height,
               CAST(24 AS BIGINT)     AS bits_per_pixel,
               CAST(w * h AS BIGINT)  AS n_pixels,
               CAST(sum(CASE WHEN k % 3 = 0 THEN v END) AS BIGINT) AS sum_c0,
               CAST(sum(CASE WHEN k % 3 = 1 THEN v END) AS BIGINT) AS sum_c1,
               CAST(sum(CASE WHEN k % 3 = 2 THEN v END) AS BIGINT) AS sum_c2,
               CAST(sum(k * v) AS BIGINT) AS weighted_sum,
               max(v)                 AS peak
        FROM comps
        GROUP BY doc_id, w, h
    """,
)
def q_media_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real image decode kernel: genuine 24-bit Windows BMP
    payloads (bottom-up rows, 4-byte padding) synthesized per
    document, decoded by the stdlib BMP parser
    (operators/multimodal.parse_bmp) inside mapInPandas — header
    fields + exact integer pixel stats. ``weighted_sum`` weights each
    component by its logical linear index, so a parser that
    mishandles the row flip or padding cannot hash-match. The oracle
    recomputes everything from the pixel recurrence in pure SQL."""
    bmp = _mm.bmp_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.decode_bmp(bmp)


@register(
    "q_media_video_frames",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   doc_id % 4 + 2 AS nf,
                   doc_id % 3 + 2 AS w,
                   doc_id % 5 + 2 AS h
            FROM documents
        ),
        sampled AS (
            SELECT doc_id, nf, w, h, f
            FROM base, unnest(generate_series(0, nf - 1)) AS tf(f)
            WHERE f % 2 = 0
        ),
        comps AS (
            SELECT doc_id, w, h, f, k,
                   (doc_id * 23 + f * 101 + k * 29) % 256 AS v
            FROM sampled, unnest(generate_series(0, w * h * 3 - 1)) AS t(k)
        )
        SELECT doc_id            AS asset_id,
               f                 AS frame_idx,
               f * 40            AS frame_ts_ms,
               w                 AS width,
               h                 AS height,
               CAST(sum(v) AS BIGINT)     AS sum_px,
               CAST(sum(k * v) AS BIGINT) AS weighted_sum,
               max(v)            AS peak
        FROM comps
        GROUP BY doc_id, f, w, h
    """,
)
def q_media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real video frame-sampling kernel: genuine uncompressed AVI
    containers (RIFF nested-LIST structure, '00db' DIB frames)
    synthesized per document, parsed by the stdlib AVI reader
    (operators/multimodal.parse_avi) inside mapInPandas; every 2nd
    frame sampled with exact integer pixel stats. frame_ts_ms derives
    from the container's own dwMicroSecPerFrame (25 fps → 40 ms/
    frame), so the oracle's f*40 certifies the header was actually
    read. 1 video row → ceil(nf/2) frame rows — the row-expanding
    Arrow batch shape."""
    avi = _mm.avi_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.sample_avi_frames(avi, stride=2)


@register(
    "q_media_image_resize",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 7 + 2 AS h
            FROM documents
        ),
        grid AS (
            SELECT doc_id,
                   (Y * 3 + X) * 3 + c AS k,
                   (doc_id * 17 +
                    ((Y * h // 3 * w + X * w // 3) * 3 + c) * 29) % 256 AS v
            FROM base,
                 unnest(generate_series(0, 2)) AS tx(X),
                 unnest(generate_series(0, 2)) AS ty(Y),
                 unnest(generate_series(0, 2)) AS tc(c)
        )
        SELECT doc_id                AS asset_id,
               CAST(3 AS BIGINT)     AS width,
               CAST(3 AS BIGINT)     AS height,
               CAST(9 AS BIGINT)     AS n_pixels,
               CAST(sum(CASE WHEN k % 3 = 0 THEN v END) AS BIGINT) AS sum_c0,
               CAST(sum(CASE WHEN k % 3 = 1 THEN v END) AS BIGINT) AS sum_c1,
               CAST(sum(CASE WHEN k % 3 = 2 THEN v END) AS BIGINT) AS sum_c2,
               CAST(sum(k * v) AS BIGINT) AS weighted_sum,
               max(v)                AS peak
        FROM grid
        GROUP BY doc_id
    """,
)
def q_media_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real image resize: BMP decode → nearest-neighbor 3×3
    downsample (out (X, Y) ← in (X*w // 3, Y*h // 3)) → BMP re-encode
    → decode again for stats. Certifies the full decode/transform/
    re-encode loop: the oracle replicates the floor-index sampling
    over the pixel recurrence, so a hash match proves both parse and
    encode are byte-correct. Two chained mapInPandas stages, zero
    shuffles — payloads never leave their partition."""
    bmp = _mm.bmp_from_documents(_t(spark, sf_dir, "documents"))
    small = _mm.resize_bmp(bmp, width=3, height=3)
    return _mm.decode_bmp(small, payload_col="resized").select(
        "asset_id",
        "width",
        "height",
        "n_pixels",
        "sum_c0",
        "sum_c1",
        "sum_c2",
        "weighted_sum",
        "peak",
    )


@register(
    "q_media_jpeg_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   8 * (doc_id % 3 + 1) AS w,
                   8 * (doc_id % 2 + 1) AS h
            FROM documents
        ),
        dims AS (
            SELECT doc_id, w, h,
                   w // 8                  AS nbx,
                   (w // 8) * (h // 8)     AS nb
            FROM base
        ),
        blocks AS (
            SELECT doc_id, w, h, nb, c, b,
                   (doc_id * 31 + (c * nb + b) * 17) % 256 AS v,
                   b // nbx AS brow, b % nbx AS bcol
            FROM dims,
                 unnest(generate_series(0, 2)) AS tc(c),
                 unnest(generate_series(0, nb - 1)) AS tb(b)
        )
        SELECT doc_id                AS asset_id,
               w                     AS width,
               h                     AS height,
               CAST(3 AS BIGINT)     AS n_components,
               CAST(w * h AS BIGINT) AS n_pixels,
               CAST(sum(CASE WHEN c = 0 THEN 64 * v END) AS BIGINT) AS sum_c0,
               CAST(sum(CASE WHEN c = 1 THEN 64 * v END) AS BIGINT) AS sum_c1,
               CAST(sum(CASE WHEN c = 2 THEN 64 * v END) AS BIGINT) AS sum_c2,
               CAST(sum(v * (c * w * h * 64 + 512 * w * brow + 224 * w
                             + 512 * bcol + 224)) AS BIGINT) AS spatial_sum,
               max(v)                AS peak
        FROM blocks
        GROUP BY doc_id, w, h
    """,
)
def q_media_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real COMPRESSED-image decode: genuine baseline sequential
    JPEG payloads (T.81 entropy coding — canonical Huffman, DC
    prediction, zigzag, quantization, DCT) synthesized per document
    and decoded by the stdlib codec (operators/multimodal.parse_jpeg)
    inside mapInPandas. The fixture's blocks are constant-valued, for
    which the flat q=8 table makes the lossy codec bit-exact (DC-only
    blocks; see the codec section header), so the oracle recomputes
    the DECODED pixel stats from the generating recurrence in pure
    SQL. ``spatial_sum`` weights every pixel by (c·h·w + y·w + x):
    a decoder that misplaces blocks, swaps planes, or mis-walks the
    zigzag cannot hash-match. A constant-block sum over an 8×8 tile
    collapses to v·(64·c·h·w + 512·w·brow + 224·w + 512·bcol + 224)."""
    jpg = _mm.jpeg_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.decode_jpeg(jpg)


@register(
    "q_media_mjpeg_frames",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   doc_id % 3 + 1       AS nf,
                   8 * (doc_id % 2 + 1) AS w,
                   8                    AS h,
                   doc_id % 2 + 1       AS nb
            FROM documents
        ),
        cells AS (
            SELECT doc_id, nf, w, h, nb, f, c, b,
                   (doc_id * 37 + f * 113 + (c * nb + b) * 17) % 256 AS v
            FROM base,
                 unnest(generate_series(0, nf - 1)) AS tf(f),
                 unnest(generate_series(0, 2)) AS tc(c),
                 unnest(generate_series(0, nb - 1)) AS tb(b)
        )
        SELECT doc_id                 AS asset_id,
               f                      AS frame_idx,
               CAST(f * 40 AS BIGINT) AS frame_ts_ms,
               w                      AS width,
               CAST(h AS BIGINT)      AS height,
               CAST(sum(64 * v) AS BIGINT) AS sum_px,
               CAST(sum(v * (64 * c * h * w + 224 * w + 512 * b + 224))
                    AS BIGINT)        AS spatial_sum,
               max(v)                 AS peak
        FROM cells
        GROUP BY doc_id, f, w, h
    """,
)
def q_media_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real COMPRESSED-video decode: Motion-JPEG AVIs (fourcc
    'MJPG', one complete baseline JPEG per '00dc' chunk) synthesized
    per document, decoded by composing the two real kernels — the
    RIFF LIST walker and the T.81 JPEG entropy decoder — inside
    mapInPandas (operators/multimodal.parse_mjpeg_avi). Frames are
    block-constant so the JPEG layer is exact at flat q=8 and the
    oracle recomputes per-frame decoded stats from the recurrence;
    frame_ts_ms comes from the container's own dwMicroSecPerFrame.
    Single-block-row frames collapse the spatial weight to
    v·(64·c·h·w + 224·w + 512·b + 224)."""
    avi = _mm.mjpeg_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.decode_mjpeg_frames(avi)


@register(
    "q_media_mp4_frames",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   doc_id % 3 + 1       AS nf,
                   8 * (doc_id % 2 + 1) AS w,
                   8                    AS h,
                   doc_id % 2 + 1       AS nb
            FROM documents
        ),
        cells AS (
            SELECT doc_id, nf, w, h, nb, f, c, b,
                   (doc_id * 41 + f * 131 + (c * nb + b) * 19) % 256 AS v
            FROM base,
                 unnest(generate_series(0, nf - 1)) AS tf(f),
                 unnest(generate_series(0, 2)) AS tc(c),
                 unnest(generate_series(0, nb - 1)) AS tb(b)
        )
        SELECT doc_id                 AS asset_id,
               f                      AS frame_idx,
               CAST(f * 40 AS BIGINT) AS frame_ts_ms,
               w                      AS width,
               CAST(h AS BIGINT)      AS height,
               CAST(sum(64 * v) AS BIGINT) AS sum_px,
               CAST(sum(v * (64 * c * h * w + 224 * w + 512 * b + 224))
                    AS BIGINT)        AS spatial_sum,
               max(v)                 AS peak
        FROM cells
        GROUP BY doc_id, f, w, h
    """,
)
def q_media_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real MP4 video decode: MJPEG-in-MP4 (ISO/IEC 14496-12
    box tree, Photo-JPEG samples located via the stsd/stts/stsc/
    stsz/stco sample tables — samples packed two per chunk so the
    sample→chunk map is non-trivial) synthesized per document and
    decoded by composing the ISO-BMFF walker with the T.81 JPEG
    entropy decoder inside mapInPandas
    (operators/multimodal.parse_mp4). Same block-constant exactness
    construction as q_media_mjpeg_frames (different constants);
    frame_ts_ms comes from the container's own stts deltas over the
    mdhd timescale. The reference has no media path at all
    (SURVEY.md §2.9 X4) — this closes the last container format in
    the extension surface; H.264 entropy decode remains explicitly
    rejected (no ffmpeg in this container)."""
    mp4 = _mm.mp4_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.decode_mp4_frames(mp4)


@register(
    "q_media_png_decode",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h
            FROM documents
        ),
        comps AS (
            SELECT doc_id, w, h, k,
                   (doc_id * 19 + k * 41) % 256 AS v
            FROM base, unnest(generate_series(0, w * h * 3 - 1)) AS t(k)
        )
        SELECT doc_id                 AS asset_id,
               w                      AS width,
               h                      AS height,
               CAST(24 AS BIGINT)     AS bits_per_pixel,
               CAST(w * h AS BIGINT)  AS n_pixels,
               CAST(sum(CASE WHEN k % 3 = 0 THEN v END) AS BIGINT) AS sum_c0,
               CAST(sum(CASE WHEN k % 3 = 1 THEN v END) AS BIGINT) AS sum_c1,
               CAST(sum(CASE WHEN k % 3 = 2 THEN v END) AS BIGINT) AS sum_c2,
               CAST(sum(k * v) AS BIGINT) AS weighted_sum,
               max(v)                 AS peak
        FROM comps
        GROUP BY doc_id, w, h
    """,
)
def q_media_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 real PNG decode: genuine truecolor PNGs (zlib-inflated
    scanlines, per-chunk CRC-32, row filters CYCLING through all five
    predictors None/Sub/Up/Average/Paeth) synthesized per document
    and decoded by the stdlib parser
    (operators/multimodal.parse_png) inside mapInPandas. PNG is
    lossless, so the oracle recomputes every decoded stat from the
    arbitrary pixel recurrence; a decoder that botches any filter
    inverse, the CRC frame, or row order cannot hash-match."""
    png = _mm.png_from_documents(_t(spark, sf_dir, "documents"))
    return _mm.decode_png(png)


# ---------------------------------------------------------------------------
# Window-kind capabilities beyond the reference's tumbling-only T2
# (SURVEY.md §2.8: "Spark also has sliding + session_window for free")
# ---------------------------------------------------------------------------


@register(
    "q_sliding_window",
    oracle="""
        SELECT epoch_ms(date_trunc('hour', ts) - o * INTERVAL 1 HOUR) AS ws_ms,
               event_type,
               count(*)            AS cnt,
               round(sum(value), 6) AS sum_val
        FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o)
        GROUP BY 1, 2
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window: 2-hour windows every 1 hour — each
    event lands in exactly two windows. Oracle formulation: the
    offset cross-join identity (window starts = hour(ts) − {0,1}h)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 6).alias("sum_val"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("ws_ms"),
            "event_type",
            "cnt",
            "sum_val",
        )
    )


@register(
    "q_session_window",
    bench=True,
    oracle="""
        WITH o AS (
            SELECT user_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
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
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window: per-user activity sessions with a 30-minute
    inactivity gap. Spark plans session_window natively; the oracle is
    the classic gaps-and-islands rewrite (lag → new-session flag →
    running sum → group), proving the semantics equivalence."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Round-out additions: n-gram generation, TF-DF term scoring,
# incremental corpus dedup, non-equi range/band join.
# ---------------------------------------------------------------------------


@register("q_text_bigrams", oracle=_text.word_bigrams_oracle(100))
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 / n-gram generation: top-100 word bigrams corpus-wide
    (higher-order array build, map-side partial counts, TakeOrdered
    top-N — no global sort)."""
    return _text.word_bigrams(_t(spark, sf_dir, "documents"), top_n=100)


@register("q_term_stats", oracle=_text.term_stats_oracle())
def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 / TF-IDF core: per-term total frequency, document frequency,
    fixed-point tf/df score (integer div keeps the hash engine-stable)."""
    return _text.term_stats(_t(spark, sf_dir, "documents"))


@register("q_dedup_edit", oracle=_dedup.edit_distance_pairs_oracle(20))
def q_dedup_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: edit-distance near-dup — MinHash band candidates verified
    with levenshtein (≤20% of the longer text, integer predicate).
    The character-level complement to jaccard verification; only
    candidate-pair texts ever cross the verify join."""
    return _dedup.edit_distance_pairs(_t(spark, sf_dir, "documents"))


@register("q_dedup_components_alt", oracle=_dedup.components_oracle(0.8))
def q_dedup_components_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: the same duplicate-group clustering as q_dedup_components,
    computed by the alternating large-star/small-star algorithm
    (O(log n) rounds, diameter-independent — the 100 TB path for deep
    near-dup chains). Certified by the identical recursive-CTE
    oracle, so the driver proves both component strategies agree."""
    return _dedup.dedup_components(
        _t(spark, sf_dir, "documents"), algorithm="alternating"
    )


@register("q_repetition_stats", oracle=_text.repetition_stats_oracle())
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (Gopher-style repetition signals): top-token mass fraction
    + duplicated-bigram fraction per document — the public
    MassiveText boilerplate indicators, as per-row JVM higher-order
    expressions (no shuffle, no Python)."""
    return _text.repetition_stats(_t(spark, sf_dir, "documents"))


@register("q_heuristic_filter", oracle=_text.heuristic_filter_oracle())
def q_heuristic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (C4/Gopher-style quality gate): word-count bounds, mean
    token length bounds, symbol ratio → keep flag + first failed rule.
    The debuggable corpus-filter form: one per-row pass, no shuffle."""
    return _text.heuristic_filter(_t(spark, sf_dir, "documents"))


@register(
    "q_hash_split",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, lang,
                   {md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
                       AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               count(*)    AS n_docs,
               min(doc_id) AS first_id,
               max(doc_id) AS last_id
        FROM assigned
        GROUP BY 1, 2
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by salted id
    hash — the reproducible way to partition a 100 TB corpus:
    membership depends only on the id, so re-runs, retries, and
    different partitionings assign every document identically, and
    adding documents never reshuffles existing assignments (unlike
    rand() or row_number splits). Per-(split, lang) counts certify
    the stratification."""
    d = _t(spark, sf_dir, "documents")
    bucket = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return (
        d.withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
    )


@register("q_ivf_train", oracle=_sim.ivf_train_oracle(2), bench=True)
def q_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (index training): two k-means Lloyd iterations for the IVF
    coarse quantizer in exact micro-unit integer arithmetic —
    assignment minimizes the integer surrogate |c|²−2x·c, centroid
    updates are one deterministic division on exact integer sums, so
    the iterative 'ML' workload is still hash-certifiable against a
    fully-unrolled SQL twin. Broadcast argmin + (cell,dim) mean
    aggregate per iteration: the canonical distributed Lloyd step."""
    return _sim.ivf_train(_t(spark, sf_dir, "embeddings"), iters=2)


@register("q_embed_quantize", oracle=_sim.quantize_embeddings_oracle())
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X4: symmetric int8 scalar quantization of the embedding
    column (scale = 127/max|v|, floor(x·scale + 0.5)) with
    integer-only summary stats so the oracle match is exact. The
    compression step before any large-scale ANN index build."""
    return _sim.quantize_embeddings(_t(spark, sf_dir, "embeddings"))


@register("q_semantic_dedup", oracle=_sim.semantic_dedup_oracle(), bench=True)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 SemDeDup-shaped semantic dedup: coarse-quantizer cells
    (broadcast-centroid assignment), then an in-cell cosine self-join
    drops every vector with a lower-id neighbor ≥ threshold — one
    representative per semantic near-dup chain, candidate work
    Σ|cell|² not N². See operators/similarity.semantic_dedup."""
    return _sim.semantic_dedup(_t(spark, sf_dir, "embeddings"))


@register(
    "q_corpus_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS wc,
                   list_sum([length(x) FOR x IN string_split(text, ' ')])
                       * 1.0 / len(string_split(text, ' ')) AS mean_len,
                   length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                       * 1.0 / length(text) AS sym_ratio
            FROM documents
        ),
        g AS (
            SELECT doc_id, lang, wc,
                   wc BETWEEN {_text.FILTER_MIN_TOKENS}
                          AND {_text.FILTER_MAX_TOKENS}
                   AND mean_len BETWEEN {_text.FILTER_MIN_MEAN_LEN}
                                    AND {_text.FILTER_MAX_MEAN_LEN}
                   AND sym_ratio <= {_text.FILTER_MAX_SYMBOL_RATIO} AS keep,
                   CAST(round(round(
                       (wc * least(wc, 100)
                        + 60 * len(list_distinct(toks))
                        + 4 * least(list_sum([length(x) FOR x IN toks]),
                                    10 * wc))
                       / (200.0::DOUBLE * wc), 6) * 1000000)
                        AS BIGINT) AS q_micro
            FROM t
        )
        SELECT lang,
               count(*)                        AS n_docs,
               CAST(sum(wc) AS BIGINT)         AS total_tokens,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               round(sum(q_micro) / 1000000.0 / count(*), 6)
                   AS mean_quality
        FROM g GROUP BY lang
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health report per language: doc/token counts, heuristic
    keep counts, mean quality. The mean aggregates micro-integer
    quality scores (each per-row score quantized before summation) so
    the language-level average is order-independent — the fixed-point
    discipline applied to a derived metric, not just money."""
    docs = _t(spark, sf_dir, "documents")
    hf = _text.heuristic_filter(docs).select("doc_id", "n_tokens", "keep")
    q = _text.quality_score(docs).select(
        "doc_id", F.round(F.col("quality") * 1_000_000).cast("long").alias("q_micro")
    )
    return (
        docs.select("doc_id", "lang")
        .join(hf, "doc_id")
        .join(q, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.sum("q_micro") / 1_000_000.0 / F.count(F.lit(1)), 6).alias(
                "mean_quality"
            ),
        )
    )


@register("q_pack_sequences", oracle=_text.pack_sequences_oracle())
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: GPT-style concat-then-chunk sequence packing —
    documents assigned to fixed-token-budget bins by prefix-sum
    offset, windowed PER LANGUAGE so packing parallelizes across
    streams instead of funneling through one global sort. Per-bin
    doc counts and token mass are the packing-efficiency stats a
    training-data pipeline reports."""
    return _text.pack_sequences(_t(spark, sf_dir, "documents"))


@register("q_mixture_sample", oracle=_text.mixture_sample_oracle())
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: deterministic mixture weighting — per-source
    salted-hash admission at two rates (80%/30%). Membership is a
    pure function of the id, so the sample is identical under
    re-runs, retries, and any partitioning; counts + kept-token mass
    certify the realized rates."""
    return _text.mixture_sample(_t(spark, sf_dir, "documents"))


@register("q_vocab_build", oracle=_text.vocab_build_oracle())
def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 tokenizer-vocabulary construction: corpus token counts,
    min-count floor, dense frequency-ranked ids with a deterministic
    (count DESC, token) tie-break — two runs assign identical ids.
    The ranking window rides the min-count-pruned VOCAB, not the
    token stream. See operators/text.vocab_build."""
    return _text.vocab_build(_t(spark, sf_dir, "documents"))


@register("q_unigram_surprisal", oracle=_text.unigram_surprisal_oracle())
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 CCNet-shaped LM quality scoring, integer-exact: mean
    unigram surprisal of each eval-split document under the
    train-split unigram model, with a pure-integer floor-log2 (no
    float log — engine-portable to the bit). OOV gets the max
    penalty. See operators/text.unigram_surprisal."""
    return _text.unigram_surprisal(_t(spark, sf_dir, "documents"))


@register(
    "q_corpus_pipeline",
    bench=True,
    oracle=f"""
        WITH f AS (
            SELECT doc_id, text, lang,
                   string_split(text, ' ') AS toks
            FROM documents
        ),
        kept AS (
            SELECT doc_id, text, lang, len(toks) AS n_tokens
            FROM f
            WHERE len(toks) BETWEEN {_text.FILTER_MIN_TOKENS}
                                AND {_text.FILTER_MAX_TOKENS}
              AND list_sum([length(x) FOR x IN toks]) * 1.0 / len(toks)
                    BETWEEN {_text.FILTER_MIN_MEAN_LEN}
                        AND {_text.FILTER_MAX_MEAN_LEN}
              AND length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                    * 1.0 / length(text) <= {_text.FILTER_MAX_SYMBOL_RATIO}
        ),
        dedup AS (
            SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
        ),
        train AS (
            SELECT k.doc_id, k.lang, k.n_tokens
            FROM kept k JOIN dedup d ON k.doc_id = d.doc_id
            WHERE {md5_long_sql("'split:' || CAST(k.doc_id AS VARCHAR)")}
                    % 100 < 80
        ),
        packed AS (
            SELECT lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM train
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               count(DISTINCT CAST(floor((cum - n_tokens)
                                         / {_text.PACK_CAPACITY}) AS BIGINT))
                   AS n_bins
        FROM packed
        GROUP BY lang
    """,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star flagship: the full training-corpus pipeline as ONE
    declarative plan — heuristic quality gate → exact dedup (keep
    lowest id per text hash) → deterministic 80% train split →
    per-language sequence packing — reported as per-language doc/
    token/bin counts. Catalyst fuses the per-row stages into the
    scan-side map; the only shuffles are the dedup groupBy, the pack
    window, and the final aggregate. Every stage is the registered
    operator's own builder, so this certifies the COMPOSITION, not a
    re-implementation."""
    docs = _t(spark, sf_dir, "documents")
    kept_ids = (
        _text.heuristic_filter(docs).where(F.col("keep")).select("doc_id")
    )
    kept = docs.join(kept_ids, "doc_id")
    keepers = _dedup.exact_dedup(kept).select(F.col("keeper").alias("doc_id"))
    survivors = kept.join(keepers, "doc_id")
    bucket = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    train = survivors.where(bucket < 80)
    packed = _text.pack_sequences(train)
    return packed.groupBy("lang").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_bins"),
    )


@register("q_dedup_incremental", oracle=_dedup.incremental_dedup_oracle("src0"))
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 / ingest loop: anti-join a new batch (source src0) against
    the admitted corpus's normalized fingerprints, then dedup within
    the batch. Fingerprints (not text) cross the join; small sets
    broadcast, large ones fall back to a hash anti-join via AQE."""
    return _dedup.incremental_dedup(_t(spark, sf_dir, "documents"), batch_source="src0")


#: Price bands for the non-equi range join — a dimension of
#: [lo, hi) intervals; any row set works, bands just bucket it.
PRICE_BANDS: list[tuple[str, float, float]] = [
    ("b0_low", 0.0, 925.0),
    ("b1_mid", 925.0, 950.0),
    ("b2_high", 950.0, 975.0),
    ("b3_top", 975.0, 100000.0),
]


@register(
    "q_range_band_join",
    bench=True,
    oracle=f"""
        WITH bands(band, lo, hi) AS (VALUES {", ".join(
            f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
        SELECT band,
               count(*) AS n_parts,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_price_cents,
               min(p_partkey) AS first_part
        FROM part JOIN bands
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
    """,
)
def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range (band) join: bucket parts into [lo, hi) price
    intervals from an inline dimension. The tiny band table is
    broadcast, so the non-equi condition runs as a
    BroadcastNestedLoopJoin — the right physical plan for an
    interval dimension at any fact-side scale. Money summed in
    integer cents (order-independent)."""
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(PRICE_BANDS, ["band", "lo", "hi"])
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.round(F.col("p_retailprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_price_cents"),
            F.min("p_partkey").alias("first_part"),
        )
    )


@register(
    "q_interval_join",
    oracle="""
        SELECT p.event_id AS p_id, p.user_id,
               epoch_ms(p.ts) AS p_ts_ms,
               count(c.ts)    AS n_clicks_10m
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
        GROUP BY 1, 2, 3
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (the batch shape of a stream-stream time-bounded
    join): for each purchase, clicks by the same user in the
    preceding 10 minutes. The user_id equi-key carries the shuffle
    (hash join); the time bounds are post-join range predicates, so
    the plan stays a key-partitioned join — the same layout a
    watermarked stream-stream join uses — not a cross product."""
    return interval_click_attribution(_t(spark, sf_dir, "events"))


def interval_click_attribution(events: DataFrame) -> DataFrame:
    """The q_interval_join body over any events-shaped frame — shared
    with the boundary test so the REGISTERED bounds (inclusive lower,
    strict upper) are what gets asserted."""
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") < F.col("p_ts")),
            "left",
        )
        .groupBy("p_id", "user_id", F.unix_millis("p_ts").alias("p_ts_ms"))
        .agg(F.count("c_ts").alias("n_clicks_10m"))
    )


@register(
    "q_window_ntile",
    oracle="""
        SELECT user_id, spend_cents,
               ntile(4) OVER (ORDER BY spend_cents DESC, user_id) AS quartile
        FROM (
            SELECT user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS spend_cents
            FROM events GROUP BY user_id
        )
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic ntile: users bucketed into spend quartiles. Sums in
    integer cents (order-independent); the ORDER BY carries a user_id
    tiebreak so bucket assignment is unique. Single-partition window
    by construction — fine here because the frame is one row per
    user after aggregation, bounded, not raw-event-sized."""
    e = _t(spark, sf_dir, "events")
    spend = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("spend_cents")
    )
    w = Window.orderBy(F.desc("spend_cents"), F.asc("user_id"))
    return spend.select(
        "user_id", "spend_cents", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "q_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus)   AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                   AS total_price
        FROM orders
        GROUP BY GROUPING SETS
            ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general Expand-operator form that
    rollup/cube (q_rollup/q_cube) specialize. Spark's Expand node
    replicates each input row once per grouping set ahead of a single
    hash aggregate, so the table is scanned once no matter how many
    sets are requested; partial aggregation still applies per set.
    grouping() markers disambiguate aggregation NULLs from data NULLs
    (statuses are non-null here, but the contract must not rely on
    that). Money summed in integer cents (order-independent)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count("*").alias("n_orders"),
        _cents_sum(F.col("o_totalprice"), "total_price"),
    )


@register(
    "q_minmax_by",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_orderkey, cents * 1000000000 + o_orderkey)
                   AS top_orderkey,
               max(cents) / 100.0 AS top_price,
               arg_min(o_orderkey, cents * 1000000000 + o_orderkey)
                   AS bottom_orderkey,
               min(cents) / 100.0 AS bottom_price
        FROM (
            SELECT o_orderstatus, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        )
        GROUP BY o_orderstatus
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max/arg-min aggregates (max_by/min_by): the priciest and
    cheapest order per status in ONE aggregation pass — no self-join,
    no window sort; partial max_by states merge associatively like any
    algebraic aggregate. Prices tie across orders, so the ordering key
    is a composite BIGINT (cents * 1e9 + orderkey) that is unique and
    overflow-safe while cents < 9.2e9 (a $92M order) and orderkey <
    1e9 — both hold at every TPC-H scale factor in range."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    key = F.col("cents") * F.lit(1_000_000_000) + F.col("o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", key).alias("top_orderkey"),
        (F.max("cents") / F.lit(100.0)).alias("top_price"),
        F.min_by("o_orderkey", key).alias("bottom_orderkey"),
        (F.min("cents") / F.lit(100.0)).alias("bottom_price"),
    )


@register(
    "q_sessionize",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                   CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                        THEN 1 ELSE 0 END AS is_start
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        marked AS (
            SELECT user_id, ts_ms,
                   CAST(sum(is_start) OVER (
                       PARTITION BY user_id ORDER BY ts_ms, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM ordered
        )
        SELECT user_id, session_idx, count(*) AS n_events,
               min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
               max(ts_ms) - min(ts_ms) AS duration_ms
        FROM marked
        GROUP BY user_id, session_idx
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gaps-and-islands sessionization: a session breaks after a
    30-min silence. The streaming twin is q_session_window
    (session_window(ts, '30 minutes')); this is the batch idiom —
    lag() marks session starts, a running sum numbers them, one
    groupBy collapses them. All three windows partition by user_id, so
    the whole plan rides a single hash partitioning of 150..N-million
    users with no global sort; exact epoch-ms integer arithmetic and
    an event_id tiebreak keep the numbering engine-identical."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = e.withColumn(
        "is_start",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > 1_800_000),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


@register(
    "q_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS rendered as a
    LEFT SEMI join with a non-equi residual (l_shipdate > o_orderdate
    — the fixture has no commit/receipt dates, so late shipment stands
    in). Semi join means lineitem matches short-circuit per order and
    the probe side never duplicates rows; the quarter predicate on
    orders is pushed to its scan before the shuffle."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q_priority_shipmode",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
)
def q_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional aggregation over a fact join): the
    year predicate prunes lineitem at the scan, the join shuffles both
    sides on orderkey once, and the CASE pivot happens inside the
    partial aggregate — 3 output rows, so the final shuffle is
    trivial. The fixture lacks l_shipmode; l_returnflag plays the
    grouping role with identical plan shape."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_decayed_engagement",
    oracle="""
        WITH mx AS (SELECT max(epoch_ms(ts)) AS mx_ms FROM events),
        w AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT)
                   * (1::BIGINT << (30 - least(
                         (mx_ms - epoch_ms(ts)) // 86400000, 30)))
                       AS w_scaled
            FROM events, mx
        )
        SELECT user_id,
               count(*) AS n_events,
               round(CAST(sum(w_scaled) AS BIGINT)
                     / (CAST(1073741824 AS DOUBLE) * 100.0), 6)
                   AS decayed_spend
        FROM w
        GROUP BY user_id
        ORDER BY decayed_spend DESC, user_id
        LIMIT 20
    """,
)
def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement (feature-engineering shape): each
    event's spend decays by 2^-age_days (capped at 30 days), top-20
    users by the decayed total. The half-life weight is a POWER OF
    TWO, so every term value_cents·2^(30−age) is an exact integer —
    the whole aggregate is integer arithmetic and only the final
    single division is float (deterministic on both engines). The
    usual exp(-λ·age) weighting cannot be differentially certified
    (transcendental per-row + order-dependent float sum); the dyadic
    form keeps the operator shape with exact parity. One shuffle on
    user_id with map-side partials; the max-ts anchor is a one-row
    broadcast."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    mx = e.agg(F.max("ts_ms").alias("mx_ms"))
    w = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr(
            "cents * shiftleft(1L, 30 - "
            "least((mx_ms - ts_ms) div 86400000, 30))"
        ).alias("w_scaled"),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum("w_scaled")
                / (F.lit(1073741824).cast("double") * F.lit(100.0)),
                6,
            ).alias("decayed_spend"),
        )
        .orderBy(F.col("decayed_spend").desc(), "user_id")
        .limit(20)
    )


def _radius_search_parts() -> tuple[str, str, float, float]:
    """Driver-side spatial prep shared by q_radius_search and its
    oracle: the distinct reading cells decoded to centers (pure-Python
    geohash toolkit — F6/F7), the center point, the equirectangular
    longitude scale, and the radius² in squared degrees. Every float
    is embedded via repr() into BOTH engines' SQL, so the refine
    arithmetic is bit-identical."""
    import math

    from kafka_streams_pipeline_spark.sources.readings import (
        EVENT_TYPE_GEOHASH,
    )

    lat0, lon0 = geo.decode("u155mz")
    k = math.cos(math.radians(lat0))
    r2 = (20.0 / 111.32) ** 2  # 20 km in squared degrees
    cells = sorted({gh[:6] for gh in EVENT_TYPE_GEOHASH.values()})
    rows = [(c, *geo.decode(c)) for c in cells]
    spark_dim = "VALUES " + ", ".join(
        f"('{c}', {la!r}D, {lo!r}D)" for c, la, lo in rows
    )
    duck_dim = "VALUES " + ", ".join(
        f"('{c}', CAST({la!r} AS DOUBLE), CAST({lo!r} AS DOUBLE))"
        for c, la, lo in rows
    )
    # CAST(… AS DOUBLE) on every literal: both engines parse bare
    # float literals as DECIMAL (DuckDB even overflows its max scale
    # multiplying them); the cast form is portable and IEEE-exact.
    la0 = f"CAST({lat0!r} AS DOUBLE)"
    lo0 = f"CAST({lon0!r} AS DOUBLE)"
    kk = f"CAST({k!r} AS DOUBLE)"
    d2 = (
        f"((clat - {la0}) * (clat - {la0}) + "
        f"((clon - {lo0}) * {kk}) * ((clon - {lo0}) * {kk}))"
    )
    return spark_dim, duck_dim, r2, d2


_RS_SPARK_DIM, _RS_DUCK_DIM, _RS_R2, _RS_D2 = (
    lambda p: (p[0], p[1], p[2], p[3])
)(_radius_search_parts())


@register(
    "q_radius_search",
    oracle=f"""
        WITH readings AS ({readings_from_events_sql()}),
        dim(gh6, clat, clon) AS ({_RS_DUCK_DIM}),
        hits AS (
            SELECT substring(r.geohash, 1, 6) AS gh6, r.tempVal,
                   d.clat, d.clon
            FROM readings r
            JOIN dim d ON substring(r.geohash, 1, 6) = d.gh6
            WHERE {_RS_D2} <= CAST({_RS_R2!r} AS DOUBLE)
        )
        SELECT gh6,
               count(*) AS n_readings,
               round(sum(CAST(round(tempVal * 100) AS BIGINT)) / 100.0
                     / count(*), 6) AS avg_val,
               round(sqrt({_RS_D2.replace('clat', 'any_value(clat)')
                                 .replace('clon', 'any_value(clon)')})
                     * 111.32, 6) AS dist_km
        FROM hits
        GROUP BY gh6
    """,
)
def q_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius search — the natural companion to the bbox
    snapshot (querying/QueryingService.java:124-203): readings within
    20 km of a center point, aggregated per cell. The geohash toolkit
    runs DRIVER-side (the repo's core spatial design): distinct cells
    decode to a literal dimension, the equirectangular refine
    ((Δlat)² + (Δlon·cos lat₀)² ≤ r²) is plain arithmetic over
    literals identical in both engines — no trig, no Python, no UDF
    in the plan. At scale the dim is the maintained distinct-cell
    table (≪ data, broadcast), the coarse cover prefilter is the
    same IN/prefix predicate the snapshot uses, and the refine is a
    scan-local expression."""
    r = readings_from_events(_t(spark, sf_dir, "events")).select(
        F.expr("substring(geohash, 1, 6)").alias("gh6"), "tempVal"
    )
    dim = spark.sql(
        f"SELECT col1 AS gh6, col2 AS clat, col3 AS clon FROM ({_RS_SPARK_DIM})"
    )
    hits = r.join(F.broadcast(dim), "gh6").where(
        F.expr(_RS_D2) <= F.lit(_RS_R2)
    )
    return hits.groupBy("gh6").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.round(
            F.sum(F.round(F.col("tempVal") * 100).cast("long"))
            / F.lit(100.0)
            / F.count(F.lit(1)),
            6,
        ).alias("avg_val"),
        F.round(
            F.expr(
                "sqrt("
                + _RS_D2.replace("clat", "any_value(clat)").replace(
                    "clon", "any_value(clon)"
                )
                + ") * 111.32"
            ),
            6,
        ).alias("dist_km"),
    )


@register(
    "q_small_qty_revenue",
    oracle="""
        WITH li AS (
            SELECT l_partkey,
                   CAST(round(l_quantity * 100) AS BIGINT)      AS qty_c,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
            FROM lineitem
        )
        SELECT count(*) AS n_lines,
               CAST(sum(l.price_c) AS BIGINT) AS rev_cents
        FROM li l
        WHERE l.qty_c * 5 * (SELECT count(*) FROM li i
                             WHERE i.l_partkey = l.l_partkey)
              < (SELECT sum(i.qty_c) FROM li i
                 WHERE i.l_partkey = l.l_partkey)
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): keep lines whose
    quantity is below 20% of their part's average — the canonical
    CORRELATED SCALAR SUBQUERY, which Catalyst decorrelates into an
    aggregate + join (run .explain: no per-row subplan execution
    survives). Expressed through the SQL surface so the rewrite
    itself is what's certified. The avg comparison is cross-
    multiplied (qty·5·cnt < sum) so the predicate is pure-integer —
    no float avg to drift between engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q17_raw")
    return spark.sql(
        """
        WITH li AS (
            SELECT l_partkey,
                   CAST(round(l_quantity * 100) AS BIGINT)      AS qty_c,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
            FROM li_q17_raw
        )
        SELECT count(*) AS n_lines,
               CAST(sum(l.price_c) AS BIGINT) AS rev_cents
        FROM li l
        WHERE l.qty_c * 5 * (SELECT count(*) FROM li i
                             WHERE i.l_partkey = l.l_partkey)
              < (SELECT sum(i.qty_c) FROM li i
                 WHERE i.l_partkey = l.l_partkey)
        """
    )


@register(
    "q_large_orders",
    bench=True,
    oracle="""
        WITH totals AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS total_qty_c,
                   count(*)        AS n_items
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 17500
        )
        SELECT o.o_orderkey,
               epoch_ms(o.o_orderdate) AS order_ms,
               t.total_qty_c,
               t.n_items
        FROM orders o JOIN totals t ON o.o_orderkey = t.l_orderkey
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): a HAVING-filtered
    aggregate over the fact table drives a join back to the orders
    dimension — the aggregate-derived join pattern. The heavy side
    aggregates BEFORE joining (map-side partials, one shuffle on
    orderkey); the surviving total is tiny, so AQE turns the join
    broadcast at runtime. Quantities in integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    totals = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
            .cast("long")
            .alias("total_qty_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .where(F.col("total_qty_c") > 17500)
    )
    o = _t(spark, sf_dir, "orders")
    return o.join(totals, o.o_orderkey == totals.l_orderkey).select(
        "o_orderkey",
        # o_orderdate arrives TIMESTAMP_NTZ; session tz is UTC, so the
        # naive values ARE UTC instants (same rule as load_table)
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
            "order_ms"
        ),
        "total_qty_c",
        "n_items",
    )


@register(
    "q_customer_distribution",
    oracle="""
        WITH c_orders AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM c_orders
        GROUP BY c_count
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): count orders
    per customer INCLUDING zero-order customers, then histogram the
    counts. The priority predicate lives INSIDE the left-join
    condition — pushing it to a WHERE would silently delete the
    zero-order rows, so this certifies join-condition-vs-filter
    semantics. Two-level aggregation: per-customer count (shuffle on
    custkey), then a histogram over the tiny count domain."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


from kafka_streams_pipeline_spark.operators import corpus as _corpus  # noqa: E402
from kafka_streams_pipeline_spark.operators import sketches as _sk  # noqa: E402


@register(
    "q_hll_distinct",
    oracle=_sk.hll_distinct_oracle("events", "user_id"),
    bench=True,
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 approximate aggregation: portable HyperLogLog distinct-user
    estimate whose registers are bit-identical on Spark and DuckDB
    (md5-derived buckets, pure-integer rho, exact-BIGINT harmonic
    denominator) — the sketch VALUE is oracle-certified, not just its
    plumbing. One pass + a 256-key shuffle + a one-row final agg;
    registers merge associatively, so map-side partials do the work.
    See operators/sketches.py."""
    return _sk.hll_distinct(_t(spark, sf_dir, "events"), "user_id")


@register(
    "q_bloom_prefilter",
    oracle=_sk.bloom_semijoin_oracle(
        "SELECT DISTINCT o_custkey AS k FROM orders "
        "WHERE o_orderpriority = '1-URGENT' "
        "AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'",
        "customer",
        "c_custkey",
    ),
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 runtime-filter certification: Bloom semi-join reduction —
    bit positions of the filtered build-side key set (urgent 1998
    orders' custkeys) broadcast against the customer probe side;
    output counts the probe population, bloom passes, exact matches,
    and false positives, so the no-false-negative invariant and the
    false-positive rate are both inside the oracle hash. The probe
    side never shuffles before the reduction — the mechanism behind
    Spark's runtimeFilter.bloomFilter, differentially tested.
    See operators/sketches.bloom_semijoin_reduction."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (
            F.col("o_orderdate")
            >= F.lit("1998-01-01 00:00:00").cast("timestamp")
        )
    )
    return _sk.bloom_semijoin_reduction(
        o, _t(spark, sf_dir, "customer"), "o_custkey", "c_custkey"
    )


@register("q_chunk_dedup", oracle=_corpus.chunk_dedup_oracle())
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/corpus-hygiene: CCNet-style boilerplate removal by
    corpus-wide chunk-hash dedup — per-document total/boilerplate
    chunk counts and surviving word count. Text never shuffles; both
    exchanges carry (doc_id, md5) pairs. See operators/corpus.py."""
    return _corpus.chunk_dedup(_t(spark, sf_dir, "documents"))


@register("q_contamination", oracle=_corpus.contamination_oracle())
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene: train/eval 12-gram contamination check over
    q_hash_split's deterministic splits — per held-out doc, distinct
    shingles, shingles also present anywhere in train, and the ratio.
    Both sides reduce to hash sets before the only join."""
    return _corpus.contamination(_t(spark, sf_dir, "documents"))


@register("q_stratified_sample", oracle=_corpus.stratified_sample_oracle())
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene: reproducible per-language top-20 sample keyed
    by salted doc_id md5 — identical membership across runs, engines,
    and partitionings (rand()/TABLESAMPLE cannot promise this)."""
    return _corpus.stratified_sample(_t(spark, sf_dir, "documents"))


# --- Round-4 additions: sketch family growth, corpus source caps, and the
# --- remaining partsupp-free TPC-H query shapes.

from kafka_streams_pipeline_spark.operators import sketches as _sk  # noqa: E402


@register("q_kmv_distinct", oracle=_sk.kmv_distinct_oracle("events", "user_id"))
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 sketch family: KMV (k-minimum-values) distinct estimate
    over events.user_id — the set-operation-friendly complement to
    HLL (q_hll_distinct). Sketch STATE (h_k, kept-hash checksum) is
    part of the certified row, so both engines provably keep the
    same k hashes; estimate is one exact-integer-backed division.
    Plan: distinct 32-bit hashes (map-side combine), global top-k
    via TakeOrderedAndProject — no full sort at any scale."""
    return _sk.kmv_distinct(_t(spark, sf_dir, "events"), "user_id")


@register(
    "q_cms_heavy_hitters",
    oracle=_sk.cms_heavy_hitters_oracle("events", "event_type"),
    bench=True,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 sketch family: batch Count-Min Sketch point queries over
    events.event_type — the BATCH twin of the streaming CMS state in
    streaming/stateful.py (same d×w geometry, same portable Bloom
    double-hashing family), tying T5 to X7. The one-sided error
    invariant (overcount ≥ 0 for every key) is inside the certified
    output. One scan → ≤ d·w-key aggregate; the sketch never grows
    with data."""
    return _sk.cms_heavy_hitters(_t(spark, sf_dir, "events"), "event_type")


@register(
    "q_source_cap",
    oracle="""
        WITH ranked AS (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                                doc_id
                   ) AS rk
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT)                          AS n_total,
               CAST(sum(CASE WHEN rk <= 5 THEN 1 ELSE 0 END) AS BIGINT)
                                                                 AS n_kept,
               CAST(sum(CASE WHEN rk <= 5 THEN doc_id ELSE 0 END) AS BIGINT)
                                                                 AS kept_checksum
        FROM ranked
        GROUP BY source
    """,
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene: per-source document cap — the CommonCrawl-
    pipeline move that stops one domain from dominating a training
    mix. Keeps ≤ 5 docs per source, selected by salted-md5 rank
    (reproducible across runs/engines/partitionings, unlike rand()),
    and certifies membership via the kept-doc-id checksum. Plan: one
    window over the source-keyed shuffle, no global sort. (Because
    this certified form also reports n_total per source, every row
    passes through the window; a production keep-only variant would
    filter rk <= 5 directly and get Spark's WindowGroupLimit
    rank-pushdown for free.)"""
    w = Window.partitionBy("source").orderBy(
        md5_long(F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(F.col("rk") <= 5, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("rk") <= 5, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("kept_checksum"),
        )
    )


@register(
    "q_revenue_forecast",
    oracle="""
        SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
                   / 100.0 AS forecast_revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
          AND l_discount >= CAST(0.05 AS DOUBLE)
          AND l_discount <= CAST(0.07 AS DOUBLE)
          AND l_quantity < CAST(24 AS DOUBLE)
    """,
)
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue change: pure scan-aggregate
    whose every predicate (date range, discount band, quantity cap)
    reaches the parquet scan — the query that certifies pushdown is
    working, because the plan is NOTHING BUT pushdown + one partial/
    final agg. Money discipline: per-row cents rounding, exact
    integer sum."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _cents_sum(
            F.col("l_extendedprice") * F.col("l_discount"),
            "forecast_revenue",
        ),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "q_volume_shipping",
    oracle="""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) / 100.0 AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
        GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped volume shipping: revenue flowing between two
    nations by shipping year, in both directions. The nation
    dimension joins twice under different roles (supplier-side /
    customer-side) — both broadcast; the only shuffles are the two
    fact-side equi-joins. The OR-of-pairs predicate is evaluated
    post-broadcast-join where both nation names are in hand."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _cents_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q_market_share",
    oracle="""
        WITH hits AS (
            SELECT year(o_orderdate) AS o_year,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS rev_cents,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region   ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = 'EUROPE'
              AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
        )
        SELECT CAST(o_year AS BIGINT) AS o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                                   THEN rev_cents ELSE 0 END) AS DOUBLE)
                     / CAST(sum(rev_cents) AS DOUBLE), 6) AS mkt_share,
               sum(rev_cents) / 100.0 AS total_revenue
        FROM hits
        GROUP BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_1 suppliers' share of
    revenue into EUROPE customers, by order year. The share is one
    deterministic division of two exact cents-integer sums — no
    float summation crosses rows. Nation joins twice (customer-side
    feeds the region filter, supplier-side feeds the share
    predicate); all dimensions broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev_cents.alias("rev_cents"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_1", F.col("rev_cents")
                    ).otherwise(0)
                ).cast("double")
                / F.sum("rev_cents").cast("double"),
                6,
            ).alias("mkt_share"),
            (F.sum("rev_cents") / F.lit(100.0)).alias("total_revenue"),
        )
    )


@register(
    "q_returned_items",
    bench=True,
    oracle="""
        SELECT c_custkey, c_name, n_name,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) / 100.0 AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '2000-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) DESC, c_custkey
        LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: top-20 customers by
    revenue lost to returns in a half-year window. Ordering is on
    the EXACT cents integer (then custkey), so the selected rowset
    is unique — the float `revenue` column is derived, never the
    sort key. Top-k via TakeOrderedAndProject, no global sort."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cents = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
            "long"
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            cents.alias("rev_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy(F.col("rev_cents").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
            "n_lines",
        )
    )


@register(
    "q_waiting_suppliers",
    oracle="""
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        per_order AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
                       AS n_late,
                   max(CASE WHEN late = 1 THEN l_suppkey END) AS lone_supp
            FROM lo
            GROUP BY l_orderkey
        )
        SELECT s_name, n_name,
               CAST(count(*) AS BIGINT) AS n_waiting_orders
        FROM per_order
        JOIN supplier ON lone_supp = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_supp > 1 AND n_late = 1
        GROUP BY s_name, n_name
        ORDER BY count(*) DESC, s_name
        LIMIT 10
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting: in
    finished multi-supplier orders, find the supplier who was the
    SOLE late shipper (shipdate > orderdate + 60 days — the fixture
    has no commit/receipt dates, so lateness is anchored to the
    order date; documented deviation). The reference formulation is
    EXISTS/NOT EXISTS self-joins over lineitem; here the same
    semantics collapse into ONE aggregate per order (distinct-
    supplier count, distinct-late count, and max-of-late as the
    witness — valid because the n_late = 1 filter makes the max the
    unique late supplier). One fact-side shuffle replaces two
    self-joins — the at-scale win."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        1,
    ).otherwise(0)
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("late") == 1, F.col("l_suppkey"))
            ).alias("n_late"),
            F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
                "lone_supp"
            ),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(F.broadcast(s), per_order.lone_supp == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_waiting_orders"))
        .orderBy(F.col("n_waiting_orders").desc(), "s_name")
        .limit(10)
    )


@register(
    "q_sales_opportunity",
    oracle="""
        WITH threshold AS (
            SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 / count(*) AS avg_bal
            FROM customer
            WHERE c_acctbal > CAST(0 AS DOUBLE)
        )
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0
                   AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg_bal FROM threshold)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >=
                                TIMESTAMP '2001-01-01 00:00:00')
        GROUP BY n_name
    """,
)
def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped sales opportunity: per nation, customers
    with above-average positive balance and no RECENT orders —
    none in 2001 (the fixture has no phone column, so the country-
    code grouping becomes the nation dimension, and every fixture
    customer has ordered at least once, so recency replaces
    never-ordered; documented deviations). The scalar threshold is
    one exact-cents division broadcast to the scan; the no-orders
    predicate is a LEFT ANTI join against the distinct buyer set —
    Spark's native form of NOT EXISTS, shuffling only custkeys."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    thr = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.where(
                F.col("o_orderdate")
                >= F.lit("2001-01-01 00:00:00").cast("timestamp")
            ).select("o_custkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            _cents_sum(F.col("c_acctbal"), "total_acctbal"),
        )
    )


@register("q_pq_encode", oracle=_sim.pq_encode_oracle())
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 compressed-ANN storage: product-quantize every embedding
    (M=8 subspaces × K=16 sample-init centroids, exact micro-unit
    integers) into a packed 32-bit code + certified quantization
    error — the ~64× store shrink that makes billion-vector ANN
    serving fit in memory. One explode + one broadcast codebook join
    + one argmin aggregate; the full vectors never shuffle. See
    operators/similarity.py pq_encode."""
    return _sim.pq_encode(_t(spark, sf_dir, "embeddings"))


@register("q_pq_adc_topk", oracle=_sim.pq_adc_topk_oracle(0, 10), bench=True)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 compressed-ANN search: asymmetric distance computation —
    query at full precision against PQ codes via a broadcast
    M·K-entry lookup table; Σ of per-subspace table entries ranks
    the corpus without touching the embeddings. Exact integers
    end-to-end, so the APPROXIMATION ITSELF is oracle-certified,
    not just the plumbing. Top-k is TakeOrderedAndProject with id
    tiebreak."""
    return _sim.pq_adc_topk(_t(spark, sf_dir, "embeddings"), 0, 10)


@register(
    "q_window_cume",
    oracle="""
        WITH ranked AS (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value, event_id) AS pr,
                   cume_dist() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS cd,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
            WHERE value IS NOT NULL
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n,
               round(max(CASE WHEN rn = (n + 1) // 2 THEN pr END), 6)
                   AS median_pr,
               round(max(CASE WHEN rn = (n + 1) // 2 THEN cd END), 6)
                   AS median_cd,
               CAST(sum(CASE WHEN 4 * rn <= n THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bottom_quartile
        FROM ranked
        GROUP BY event_type
    """,
)
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function family completion: percent_rank + cume_dist
    per event_type over (value, event_id) — the id tiebreak makes
    both distribution functions deterministic even on duplicate
    values. Certification avoids cross-row float summation entirely
    (the round-3 flake class): the median row's pr/cd are single
    engine-identical doubles picked by integer rank, and the
    bottom-quartile count is the pure-integer predicate 4·rn ≤ n
    (≡ cume_dist ≤ 0.25 for all-distinct ranks). One window over the
    type-keyed shuffle, no global sort."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    mid = F.col("rn") == F.expr("(n + 1) div 2")
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.max(F.when(mid, F.col("pr"))), 6).alias("median_pr"),
        F.round(F.max(F.when(mid, F.col("cd"))), 6).alias("median_cd"),
        F.sum(F.when(4 * F.col("rn") <= F.col("n"), 1).otherwise(0))
        .cast("long")
        .alias("n_bottom_quartile"),
    )

@register(
    "q_dedup_prefix_join",
    oracle=_dedup.prefix_jaccard_join_oracle(),
    bench=True,
)
def q_dedup_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 EXACT similarity join at scale: prefix-filtered Jaccard
    join (SSJoin/PPJoin family) — candidates only from each doc's
    globally-rarest prefix shingles, then exact verify; output
    bit-identical to the brute-force quadratic join the oracle runs.
    The exact counterpart to q_dedup_minhash at the same 0.8
    threshold: no banding recall loss, and frequent-shingle skew
    self-prunes (hot shingles sort last, out of every prefix). Pure
    integer threshold arithmetic (4/5) until the reported jaccard.
    See operators/dedup.py prefix_jaccard_join."""
    return _dedup.prefix_jaccard_join(_t(spark, sf_dir, "documents"))


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

    os.makedirs(src, exist_ok=True)
    per = (len(rows) + n_chunks - 1) // n_chunks
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
        with open(os.path.join(src, f"chunk{c}.json"), "w") as f:
            for r in chunk + dups:
                f.write(_json.dumps(r.asDict()) + "\n")


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


from kafka_streams_pipeline_spark.operators import skew as _skew  # noqa: E402


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
    view counts every physical reading. See streaming/pipeline.py
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
