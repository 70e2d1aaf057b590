"""Pareto-frontier (skyline) operator — SURVEY.md §2.9 extension.

The skyline of a relation under (minimize x, maximize y) is the set
of rows no other row dominates: B is dominated iff some A has
A.x ≤ B.x AND A.y ≥ B.y with at least one strict. The classic OLAP
"best tradeoff" query (Börzsönyi, Kossmann & Stocker, ICDE 2001 —
the SKYLINE OF paper); no reference operator covers it
(querying/QueryingController.java exposes only key/time/bbox
predicates), and naive SQL needs a quadratic NOT EXISTS self-join.

In 2D the skyline has a sort-based characterization: order rows by
x; B is in the skyline iff its y strictly exceeds every strictly-
cheaper row's y, and no equal-x row has strictly larger y. A single
global window (ORDER BY x with no PARTITION BY) computes that but
collapses to ONE task in Spark — the textbook scale trap. The
implementation here keeps the parallelism:

1. one aggregate finds the x range; rows are bucketed into
   ``n_buckets`` fixed-width x bands (map-side arithmetic, no
   shuffle beyond the eventual bucket partitioning);
2. a per-bucket aggregate (≤ n_buckets rows) collects each band's
   max y; the driver folds it into an exclusive running max — the
   cross-bucket CARRY, rebroadcast as a tiny join (the same
   two-phase prefix-scan shape as corpus.py's budget select);
3. a window PARTITIONED BY bucket (parallel across bands) computes
   the within-bucket strictly-cheaper prefix max via
   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING, and a second
   frame over (bucket, x) catches equal-x dominance.

Every comparison is on integer cents, so the quadratic NOT EXISTS
DuckDB oracle hash-matches exactly; the oracle being a *different
algorithm* is the point — it certifies the bucketed scan computes
the same frontier the dominance definition does.

100 TB posture: two scans + one bucket-partitioned shuffle; the
carry is O(n_buckets) driver state (256 rows); per-task memory is
one band. Skewed x distributions concentrate rows in few bands —
the refinement is quantile-based band edges (approx_percentile) in
place of fixed width; fixed width is kept here because the
certified fixture is uniform and the carry algebra is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_BUCKETS = 256


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_col: str,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Rows not dominated under (min x_col, max y_col); x_col and
    y_col must already be exact integers (cents / counts). Output:
    (key, x, y) for every skyline member."""
    base = df.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    lo, hi = base.agg(F.min("x"), F.max("x")).first()  # 1-row collect
    if lo is None:
        return base.select("key", "x", "y").limit(0)
    width = max(1, (hi - lo) // n_buckets + 1)
    b = base.withColumn("bucket", F.expr(f"(x - {lo}) div {width}"))

    # cross-bucket carry: for bucket k, the max y over all buckets < k
    # (every row there has strictly smaller x by construction)
    per = sorted(
        b.groupBy("bucket").agg(F.max("y").alias("mx")).collect(),
        key=lambda r: r["bucket"],
    )
    carry_rows, running = [], None
    for r in per:
        carry_rows.append((r["bucket"], running))
        running = r["mx"] if running is None else max(running, r["mx"])
    spark = df.sparkSession
    carry = spark.createDataFrame(carry_rows, "bucket long, carry long")

    w_cheaper = (
        Window.partitionBy("bucket")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_equal = Window.partitionBy("bucket", "x")
    scored = (
        b.join(F.broadcast(carry), "bucket")
        .withColumn("m_in", F.max("y").over(w_cheaper))
        .withColumn("m_cheaper", F.greatest(F.col("carry"), F.col("m_in")))
        .withColumn("m_equal", F.max("y").over(w_equal))
    )
    return scored.where(
        (F.col("m_cheaper").isNull() | (F.col("m_cheaper") < F.col("y")))
        & (F.col("m_equal") <= F.col("y"))
    ).select("key", "x", "y")


def skyline_2d_oracle(
    table: str, x_sql: str, y_sql: str, key_sql: str
) -> str:
    """Quadratic dominance NOT EXISTS — deliberately a different
    algorithm from the bucketed scan it certifies."""
    return f"""
        WITH pts AS (
            SELECT CAST({key_sql} AS BIGINT) AS key,
                   CAST({x_sql} AS BIGINT) AS x,
                   CAST({y_sql} AS BIGINT) AS y
            FROM {table}
        )
        SELECT key, x, y FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.x <= p.x AND q.y >= p.y
              AND (q.x < p.x OR q.y > p.y)
        )
    """
