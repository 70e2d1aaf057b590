"""Round-11 time-series serving + hybrid-retrieval registrations.

The reference's single materialized shape is an hourly sensor rollup
(ingestion/KafkaStreamsAggregator.java:103-105); these rows add the
TSDB serving family one layer above it (counter rates, time-weighted
averages, OHLC bars, robust outlier censuses) and the
retrieval-fusion / keyword layer over the curation corpus. All
engine-exact (integer cents / µs / ppm lattices — module docstrings
carry the proofs and the 100 TB plan shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_pipeline_spark.inventory._registry import register
from kafka_streams_pipeline_spark.inventory._shared import _t
from kafka_streams_pipeline_spark.operators import similarity as _sim
from kafka_streams_pipeline_spark.operators import text as _text
from kafka_streams_pipeline_spark.operators import timeseries as _ts


@register("q_counter_rate", oracle=_ts.counter_rate_oracle())
def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (TSDB serving): PromQL-style reset-corrected counter
    increase per user series — running-sum counter with synthetic
    wrap resets, per-step delta fold that credits the post-reset
    value, integer cents end-to-end. One shuffle: the user_id window
    sort feeds both window passes and the same-key groupBy. See
    operators/timeseries.py counter_rate."""
    return _ts.counter_rate(_t(spark, sf_dir, "events"))


@register("q_time_weighted_avg", oracle=_ts.time_weighted_avg_oracle())
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (TSDB serving): LOCF time-weighted average per user series
    (irregular sampling — each value holds until the next sample, so
    its weight is the inter-sample duration in integer µs). BIGINT
    cents×µs weighted sums; the only floats are two final divisions
    in identical textual order. One shuffle on user_id. See
    operators/timeseries.py time_weighted_avg."""
    return _ts.time_weighted_avg(_t(spark, sf_dir, "events"))


@register("q_ohlc_bars", oracle=_ts.ohlc_bars_oracle())
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (TSDB serving): per (event_type × hour) OHLC candle —
    open/high/low/close/volume in integer cents, first/last picked by
    (ts, event_id) order with a single ascending sort (close = the
    rn = partition-count row). One hash partition on the bucket key;
    the groupBy reuses the window's Exchange. See
    operators/timeseries.py ohlc_bars."""
    return _ts.ohlc_bars(_t(spark, sf_dir, "events"))


@register("q_anomaly_mad", oracle=_ts.mad_outliers_oracle())
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (TSDB quality): robust median/MAD outlier census per
    event_type — medians computed on an even-integer lattice so the
    0.5-interpolation is exact in both engines, and the
    |x−med| > 3·1.4826·MAD gate is the pure-integer cross-multiply
    20000·dev2 > 44478·mad4. Exact percentile is the certification
    twin of the documented approx_percentile 100 TB path. See
    operators/timeseries.py mad_outliers."""
    return _ts.mad_outliers(_t(spark, sf_dir, "events"))


@register("q_rrf_fusion", oracle=_sim.rrf_fusion_oracle())
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (hybrid retrieval): reciprocal-rank fusion of the certified
    BM25 lexical top-50 and cosine dense top-50 (doc_id ≡ vec_id),
    RRF score as integer fixed-point 1000000 div (60+rank) sums —
    no float ordering. Fusion is constant-size (two ≤50-row lists);
    corpus work stays inside the two certified retrieval plans. See
    operators/similarity.py rrf_fusion."""
    return _sim.rrf_fusion(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


@register("q_keyword_extract", oracle=_text.keyword_extract_oracle())
def q_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (curation tagging): per-document top-3 keywords by the
    integer rarity weight tf·1000000 div df (no float log — monotone
    tf-idf surrogate), ties broken by term so the rowset is unique.
    One explode + two aggregates; the df side is vocab-sized (AQE
    broadcast); per-doc top-k is a doc-partitioned window. See
    operators/text.py keyword_extract."""
    return _text.keyword_extract(_t(spark, sf_dir, "documents"))
