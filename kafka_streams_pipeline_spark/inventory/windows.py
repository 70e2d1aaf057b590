"""Window-kind capabilities beyond the reference's tumbling-only T2:
sliding and session windows with exact SQL oracles.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_pipeline_spark.inventory._registry import register
from kafka_streams_pipeline_spark.inventory._shared import _t

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


