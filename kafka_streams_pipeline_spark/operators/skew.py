"""Skew-resistant aggregation: explicit two-phase salted groupBy.

The geo grid is inherently skewed (a city cell can carry orders of
magnitude more readings than an ocean cell). AQE's skew handling
covers joins and post-shuffle partition sizing; for a pathological
hot GROUP BY key this operator spreads one key over ``salt`` shuffle
partitions and merges with the A3 algebraic identity
(querying/util/Aggregator.java:17-30: counts and sums add, avg is
recomputed from merged sums — so ANY finer split merges correctly).

Cost model at 100 TB: phase 1 shuffles on (key, salt) — hot keys fan
out over `salt` reducers; phase 2 shuffles `salt` rows per key. Both
phases keep map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    val_col: str,
    salt: int = DEFAULT_SALT,
    spread_col: str | None = None,
) -> DataFrame:
    """groupBy(keys) → (count, sum, avg) via a salted two-phase plan.

    ``spread_col`` picks the deterministic salting input (defaults to
    the value column; any high-cardinality column works — it only
    decides which reducer a row visits, never the result).
    Result is identical to the direct aggregate by A3.
    """
    spread = F.col(spread_col if spread_col is not None else val_col)
    salted = df.withColumn("_salt", F.pmod(F.hash(spread), F.lit(salt)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum(val_col).alias("_sum")
    )
    merged: list[Column] = [
        F.sum("_cnt").alias("count"),
        F.sum("_sum").alias("sum"),
        (F.sum("_sum") / F.sum("_cnt")).alias("avg"),
    ]
    return partial.groupBy(*keys).agg(*merged)
