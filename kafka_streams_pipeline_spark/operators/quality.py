"""Data-quality operators: single-pass column profiling and a
declarative constraint-check suite (the Deequ/Great-Expectations
family, re-expressed as plain Catalyst aggregates).

Why an engine for training data needs this: before a 100 TB corpus
feeds a tokenizer or a dedup pass, the pipeline needs per-column
health numbers (null rates, cardinalities, ranges) and hard
contracts (keys unique, foreign keys resolve, enums closed, values
in range) — and it needs them as ONE scan each, not a job per
metric. Both operators here compile the whole metric/check set into
a single ``agg`` so Catalyst evaluates every measure in the same
pass over the data (plus one anti-join per referential check, the
only kind that genuinely needs a second input).

Scale posture:
- ``table_profile``: all per-column measures are algebraic partial
  aggregates except distinct counts. Exact distincts make Catalyst
  plan an Expand (one duplicated stream per distinct column) — fine
  at certification scale and chosen as the ORACLE form; at 100 TB
  pass ``approx=True`` and the distincts become
  ``approx_count_distinct`` (HyperLogLog++ register state, single
  pass, no Expand), the same partial-merge shape as the sums.
- ``run_checks``: every single-table check is an algebraic
  aggregate merged into one pass; referential checks add one
  LEFT ANTI join each, with the referenced key side deduplicated
  and broadcast when small (dimension tables) — the 100 TB fact
  side never shuffles for broadcastable dims.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile in ONE aggregate pass: row count, non-null
    count, distinct count (exact, or HLL++ when ``approx=True``),
    and min/max rendered as strings (binary/UTF8 ordering — identical
    across engines on ASCII data, which the fixtures assert).

    Output: one row per profiled column —
    ``(col_name, n_rows, n_nonnull, n_distinct, min_value,
    max_value)``. The wide→long pivot is a ``stack`` expression, so
    the whole operator stays inside whole-stage codegen: one scan,
    one (Expand-widened when exact) aggregate, a constant-width
    projection. Row order is not part of the contract.
    """
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct(c).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nonnull, n_distinct, min_value, max_value)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct",
        "min_value", "max_value",
    )


@dataclass(frozen=True)
class Check:
    """One declarative constraint. ``kind`` picks the semantics:

    - ``not_null``:   violations = rows where ``col`` IS NULL
    - ``unique``:     violations = rows beyond the first per value
      of ``col`` (nulls excluded, SQL-UNIQUE style)
    - ``in_set``:     violations = non-null rows whose ``col`` is
      outside ``values``
    - ``in_range``:   violations = non-null rows with ``col`` <
      ``lo`` or > ``hi`` (either bound optional)
    - ``matches``:    violations = non-null rows not rlike ``pattern``
    - ``references``: violations = rows whose ``col`` has no match
      in ``ref_df[ref_col]`` (nulls excluded, FK style)
    """

    name: str
    kind: str
    col: str
    values: tuple = ()
    lo: object = None
    hi: object = None
    pattern: str = ""
    ref_df: DataFrame | None = field(default=None, compare=False)
    ref_col: str = ""


def _violation_expr(c: Check) -> Column:
    col = F.col(c.col)
    if c.kind == "not_null":
        cond = col.isNull()
    elif c.kind == "in_set":
        cond = col.isNotNull() & ~col.isin(list(c.values))
    elif c.kind == "in_range":
        cond = F.lit(False)
        if c.lo is not None:
            cond = cond | (col < F.lit(c.lo))
        if c.hi is not None:
            cond = cond | (col > F.lit(c.hi))
        cond = col.isNotNull() & cond
    elif c.kind == "matches":
        cond = col.isNotNull() & ~col.rlike(c.pattern)
    else:
        raise ValueError(f"unknown single-pass check kind {c.kind!r}")
    return F.sum(cond.cast("long")).alias(c.name)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check and return one row per check:
    ``(check_name, violations, passed)``.

    All ``not_null`` / ``in_set`` / ``in_range`` / ``matches``
    checks compile to conditional sums in ONE aggregate over ``df``;
    each ``unique`` check is a count-minus-distinct pair in the same
    aggregate (violations = count(col) − count(distinct col) — rows
    beyond the first per duplicated value); each ``references``
    check is a LEFT ANTI join against the deduplicated, broadcast
    reference keys counted in its own small job. Results are unioned
    into one frame; row order is not part of the contract.
    """
    single = [c for c in checks if c.kind not in ("references", "unique")]
    uniques = [c for c in checks if c.kind == "unique"]
    refs = [c for c in checks if c.kind == "references"]

    parts: list[DataFrame] = []
    aggs = [_violation_expr(c) for c in single]
    aggs += [
        (F.count(F.col(c.col)) - F.count_distinct(F.col(c.col)))
        .cast("long")
        .alias(c.name)
        for c in uniques
    ]
    if aggs:
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c.name}', {c.name}" for c in single + uniques
        )
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(single) + len(uniques)}, {stack_args}) "
                    "AS (check_name, violations)"
                )
            )
        )
    for c in refs:
        if c.ref_df is None:
            raise ValueError(f"references check {c.name!r} needs ref_df")
        keys = F.broadcast(
            c.ref_df.select(F.col(c.ref_col).alias(c.col)).distinct()
        )
        parts.append(
            df.where(F.col(c.col).isNotNull())
            .join(keys, on=c.col, how="left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(F.lit(c.name).alias("check_name"), "violations")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )
