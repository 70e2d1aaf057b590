"""Incremental view maintenance (IVM) operators.

X9d: exact aggregate view maintenance under inserts AND retractions —
the Z-set/DBSP rule (public literature: Budiu et al., DBSP; the
Materialize delta-join family) applied to grouped count/sum views over
the versioned store's Debezium-style CDC feed. The join IVM rows
(inventory/streaming_rows.q_ivm_join*) cover the bilinear operator;
this module covers the LINEAR one, where a retraction is just weight
−1: ΔV(g) = Σ_rows w·x, V_new(g) = V_old(g) + ΔV(g), O(Δ) on the feed
plus O(touched groups) on the view — never a base rescan.

Retraction rows carry their full BEFORE-IMAGE (the Debezium DELETE
event shape): a linear aggregate cannot be decremented from a key-only
tombstone, so the feed contract is values-carrying deletes. Count/sum
(and anything algebraic over them: avg, ratios) maintain exactly;
MIN/MAX do NOT maintain under retraction without auxiliary state (the
retracted value may be the current extreme) — callers needing extremes
keep the full multiset or a heap sketch, which is why this operator
deliberately exposes only the linear aggregates.

Reference anchor: the reference's entire ingest topology is a
continuously-maintained aggregate view
(ingestion/KafkaStreamsAggregator.java:98-105 — count/sum/avg per
window updated per record); this generalizes it with retractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_pipeline_spark.sources.versioned import TOMBSTONE


def agg_view_apply(
    v_old: DataFrame,
    delta: DataFrame,
    group_col: str,
    sums: dict[str, str],
) -> DataFrame:
    """Apply one CDC delta to a maintained grouped-aggregate view.

    ``v_old``: current view state, columns [group_col, "n_rows",
    *sums]. ``delta``: the change feed slice — value rows, with
    ``TOMBSTONE`` true marking retractions that carry their
    before-image values. ``sums`` maps view sum-column name → source
    value column in the delta.

    Returns ONE row per TOUCHED group (untouched groups never appear,
    so the caller's upsert stays O(touched)): the new counters, with
    ``TOMBSTONE`` true when the group's row count reached zero — a
    dead group is retracted from the view, not left as a zero husk.

    Scale shape: one aggregate over the delta (map-side combined on
    the group key), one equi-join against the view keyed by group —
    both O(Δ)/O(groups); the base corpus is never read.
    """
    w = F.when(
        F.coalesce(F.col(TOMBSTONE), F.lit(False)), F.lit(-1)
    ).otherwise(F.lit(1))
    aggs = [F.sum(w).cast("long").alias("_dn")] + [
        F.sum(w * F.col(src)).cast("long").alias(f"_d_{dst}")
        for dst, src in sums.items()
    ]
    dv = delta.groupBy(group_col).agg(*aggs)
    old = v_old.select(
        group_col,
        F.col("n_rows").alias("_old_n"),
        *[F.col(dst).alias(f"_old_{dst}") for dst in sums],
    )
    joined = dv.join(old, group_col, "left")
    n_new = F.coalesce(F.col("_old_n"), F.lit(0)) + F.col("_dn")
    out_cols = [
        F.col(group_col),
        n_new.cast("long").alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"_old_{dst}"), F.lit(0))
                + F.col(f"_d_{dst}")
            )
            .cast("long")
            .alias(dst)
            for dst in sums
        ],
        (n_new == 0).alias(TOMBSTONE),
    ]
    return joined.select(*out_cols)
