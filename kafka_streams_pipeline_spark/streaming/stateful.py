"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stateful operator is the windowed aggregate
store (SURVEY.md §2.8 T5) — expressible declaratively. This module is
the extension point for stateful logic Spark's built-ins CANNOT
express: per-key running state with arbitrary transition functions
(alert latching, monotonic counters, custom sketches).

Pattern notes:
- state is per GROUP KEY, held in the streaming state store
  (RocksDB-backed per session.py) and restored from the checkpoint on
  restart;
- the user function sees Arrow-batched pandas frames per key — Python
  cost is amortized per batch, not per row;
- output mode "update": one row per touched key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "sensorId string, count bigint, sum double, avg double"
# sum accumulates as micros-scaled BIGINT (exact, order-independent —
# the operators/view.build_view discipline carried into streaming
# state), divided back to double only at emission.
RUNNING_TOTALS_STATE = "count bigint, sum_u bigint"

ALERT_OUTPUT = (
    "sensorId string, n_alerts bigint, last_value double, latched boolean"
)
ALERT_STATE = "n_alerts bigint, latched boolean"


def running_sensor_totals(readings: DataFrame) -> DataFrame:
    """Per-sensor running {count, sum, avg} over the whole stream —
    the unwindowed cousin of the reference's aggregate
    (ingestion/KafkaStreamsAggregator.java:42-51), as a custom
    stateful op. Emits the updated aggregate for each sensor touched
    by a micro-batch.

    Exactness: each value is rounded to micros ONCE, in the JVM plan
    (F.round — HALF_UP, identical to the SQL oracle's round), and the
    state accumulates the exact BIGINT sum — so the final aggregate
    is bit-identical to a batch aggregate regardless of batch
    boundaries, arrival order, or restarts. Emission divides back to
    double with the same (sum/1e6)/count sequence the oracle uses."""
    readings = readings.withColumn(
        "v_u", F.round(F.col("tempVal") * 1000000).cast("long")
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cnt, sum_u = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            vals = pdf["v_u"].dropna()
            cnt += len(vals)
            sum_u += int(vals.sum())
        state.update((cnt, sum_u))
        total = sum_u / 1000000.0
        yield pd.DataFrame(
            {
                "sensorId": [key[0]],
                "count": [cnt],
                "sum": [total],
                "avg": [total / cnt if cnt else None],
            }
        )

    return readings.groupBy("sensorId").applyInPandasWithState(
        fn,
        RUNNING_TOTALS_OUTPUT,
        RUNNING_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


CMS_DEPTH = 4
CMS_WIDTH = 128
CMS_OUTPUT = "gh string, sensorId string, est_count bigint"
CMS_STATE = "cells array<bigint>"


def _cms_rows(item: str) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{d}:{item}".encode()).hexdigest()[:8], 16) % CMS_WIDTH
        for d in range(CMS_DEPTH)
    ]


def cms_sensor_counts(readings: DataFrame, gh_col: str = "geohash") -> DataFrame:
    """Count-Min Sketch per geohash cell: approximate per-sensor
    reading counts in O(depth × width) memory per cell, regardless of
    sensor cardinality — the custom-sketch case Spark's built-ins
    can't express (state is a matrix updated row-wise, queried
    point-wise; CMS estimates only ever overestimate).

    Emits (gh, sensorId, est_count) for each sensor touched by the
    micro-batch. At 100 TB: state per key is constant-size, so total
    state is cells × (depth×width×8 B) — ~4 KB/cell here — while
    exact per-sensor counting would grow with sensor count."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (cells,) = state.get if state.exists else ([0] * (CMS_DEPTH * CMS_WIDTH),)
        cells = list(cells)
        touched: set[str] = set()
        for pdf in pdfs:
            for sensor in pdf["sensorId"].dropna():
                touched.add(sensor)
                for d, r in enumerate(_cms_rows(sensor)):
                    cells[d * CMS_WIDTH + r] += 1
        state.update((cells,))
        est = [
            min(cells[d * CMS_WIDTH + r] for d, r in enumerate(_cms_rows(s)))
            for s in sorted(touched)
        ]
        yield pd.DataFrame(
            {
                "gh": [key[0]] * len(touched),
                "sensorId": sorted(touched),
                "est_count": est,
            }
        )

    keyed = readings.withColumn("gh6", F.substring(F.col(gh_col), 1, 6))
    return keyed.groupBy("gh6").applyInPandasWithState(
        fn,
        CMS_OUTPUT,
        CMS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


CMS_CELLS_OUTPUT = "gh string, cells array<bigint>"


def cms_cell_state(readings: DataFrame, gh_col: str = "geohash") -> DataFrame:
    """Deterministic-emission variant of :func:`cms_sensor_counts`
    (VERDICT r5 item 9): emits the FULL d×w cell matrix per touched
    key per micro-batch, so the LAST emission per key IS the final
    sketch state.

    Why the variant exists: ``cms_sensor_counts`` emits per-sensor
    point estimates computed against the state *at the batch that
    touched the sensor* — a later batch can bump shared cells without
    re-emitting that sensor, so per-batch emissions depend on how
    arrivals split across batches (staleness) and can never be
    hash-compared against a batch oracle. Cell counters, by contrast,
    are pure additive state: the final matrix is
    batch-boundary-independent, which is exactly what the driver row
    (inventory q_streaming_cms) certifies against a pure-SQL
    recomputation of the same md5 row construction."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (cells,) = state.get if state.exists else ([0] * (CMS_DEPTH * CMS_WIDTH),)
        cells = list(cells)
        for pdf in pdfs:
            for sensor in pdf["sensorId"].dropna():
                for d, r in enumerate(_cms_rows(sensor)):
                    cells[d * CMS_WIDTH + r] += 1
        state.update((cells,))
        yield pd.DataFrame({"gh": [key[0]], "cells": [cells]})

    keyed = readings.withColumn("gh6", F.substring(F.col(gh_col), 1, 6))
    return keyed.groupBy("gh6").applyInPandasWithState(
        fn,
        CMS_CELLS_OUTPUT,
        CMS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def threshold_alert_latch(readings: DataFrame, threshold: float) -> DataFrame:
    """Latching alert detector: counts threshold crossings per sensor
    and latches once any reading exceeds the threshold — state logic
    with no declarative equivalent (the latch is order-dependent
    history, not an algebraic aggregate)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n_alerts, latched = state.get if state.exists else (0, False)
        last = None
        for pdf in pdfs:
            vals = pdf["tempVal"].dropna()
            if len(vals):
                n_alerts += int((vals > threshold).sum())
                latched = bool(latched or (vals > threshold).any())
                last = float(vals.iloc[-1])
        state.update((n_alerts, latched))
        yield pd.DataFrame(
            {
                "sensorId": [key[0]],
                "n_alerts": [n_alerts],
                "last_value": [last],
                "latched": [latched],
            }
        )

    return readings.groupBy("sensorId").applyInPandasWithState(
        fn,
        ALERT_OUTPUT,
        ALERT_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


HLL_B_STREAM = 8
HLL_M_STREAM = 1 << HLL_B_STREAM
HLL_W_STREAM = 32 - HLL_B_STREAM
HLL_OUTPUT = (
    "gh string, n_registers_used bigint, register_checksum bigint"
)
HLL_STATE = "regs array<bigint>"


def _hll_bucket_rho(item: str) -> tuple[int, int]:
    """EXACTLY the batch hll_distinct hash (operators/sketches.py):
    h32 = first 8 md5 hex chars of str(item); bucket = top B bits;
    rho = first-1-bit position of the W-bit payload (W+1 if zero)."""
    import hashlib

    h32 = int(hashlib.md5(str(item).encode()).hexdigest()[:8], 16)
    bucket = h32 >> HLL_W_STREAM
    payload = h32 % (1 << HLL_W_STREAM)
    rho = (
        HLL_W_STREAM + 1
        if payload == 0
        else HLL_W_STREAM + 1 - payload.bit_length()
    )
    return bucket, rho


def hll_sensor_distinct(readings: DataFrame, gh_col: str = "geohash") -> DataFrame:
    """HyperLogLog register state per geohash cell, maintained across
    micro-batches — the STREAMING twin of the batch
    ``operators/sketches.hll_distinct``, sharing its md5 register
    construction bit-for-bit so the two are differentially testable
    (tests/test_stateful.py). State per key is a constant 256-long
    array regardless of sensor cardinality; registers merge by max,
    so restarts and batch boundaries cannot change the result."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (regs,) = state.get if state.exists else ([0] * HLL_M_STREAM,)
        regs = list(regs)
        for pdf in pdfs:
            for sensor in pdf["sensorId"].dropna():
                bucket, rho = _hll_bucket_rho(sensor)
                if rho > regs[bucket]:
                    regs[bucket] = rho
        state.update((regs,))
        yield pd.DataFrame(
            {
                "gh": [key[0]],
                "n_registers_used": [sum(1 for r in regs if r > 0)],
                "register_checksum": [
                    sum((b + 1) * r for b, r in enumerate(regs))
                ],
            }
        )

    keyed = readings.withColumn("gh6", F.substring(F.col(gh_col), 1, 6))
    return keyed.groupBy("gh6").applyInPandasWithState(
        fn,
        HLL_OUTPUT,
        HLL_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# Streaming histogram: declared micro-int domain [-50, 50) value
# units at 6-dp fixed point, 40 bins of exactly 2.5e6 micros each,
# plus explicit under/overflow bins (indexes 0 and NB+1).
HIST_LO = -50_000_000
HIST_HI = 50_000_000
HIST_NBINS = 40
HIST_W = (HIST_HI - HIST_LO) // HIST_NBINS
HIST_OUTPUT = "gh string, n_values bigint, chk1 bigint, chk2 bigint"
HIST_STATE = "bins array<bigint>"


def histogram_cell_state(
    readings: DataFrame, gh_col: str = "geohash"
) -> DataFrame:
    """Per-cell value histogram maintained across micro-batches — the
    STREAMING twin of ``operators/sketches.histogram_sketch``,
    completing the batch/stream symmetry of the mergeable-state trio
    (HLL distincts, CMS frequencies, histogram ranks). Values are
    rounded to micros IN THE JVM PLAN (F.round → HALF_UP, the SQL
    rule) before the pandas state function, so binning is pure
    integer arithmetic and batch boundaries cannot move a value
    across a bin edge. State per key is a constant 42-long array;
    emission carries the count plus two weighted checksums
    (Σ(bin+2), Σ(bin+2)²) that pin the bin multiset into the
    differential oracle."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (bins,) = state.get if state.exists else (
            [0] * (HIST_NBINS + 2),
        )
        bins = list(bins)
        for pdf in pdfs:
            for m in pdf["m"].dropna():
                m = int(m)
                if m < HIST_LO:
                    b = -1
                elif m >= HIST_HI:
                    b = HIST_NBINS
                else:
                    b = (m - HIST_LO) // HIST_W
                bins[b + 1] += 1
        state.update((bins,))
        n = sum(bins)
        chk1 = sum((i - 1 + 2) * c for i, c in enumerate(bins))
        chk2 = sum((i - 1 + 2) ** 2 * c for i, c in enumerate(bins))
        yield pd.DataFrame(
            {
                "gh": [key[0]],
                "n_values": [n],
                "chk1": [chk1],
                "chk2": [chk2],
            }
        )

    keyed = readings.where(F.col("tempVal").isNotNull()).select(
        F.substring(F.col(gh_col), 1, 6).alias("gh6"),
        F.round(F.col("tempVal") * 1000000).cast("long").alias("m"),
    )
    return keyed.groupBy("gh6").applyInPandasWithState(
        fn,
        HIST_OUTPUT,
        HIST_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- Streaming OHLC cell state (round 11) -----------------------------------

OHLC_OUTPUT = (
    "gh string, hour_ms bigint, volume bigint, open_fp bigint, "
    "high_fp bigint, low_fp bigint, close_fp bigint"
)
OHLC_STATE = (
    "volume bigint, open_t bigint, open_sid string, open_fp bigint, "
    "close_t bigint, close_sid string, close_fp bigint, "
    "high_fp bigint, low_fp bigint"
)


def ohlc_cell_state(readings: DataFrame) -> DataFrame:
    """Per (geohash-6 cell × hour) streaming OHLC candle — the
    stateful streaming twin of operators/timeseries.ohlc_bars, keyed
    like the reference's hourly WindowStore
    (ingestion/KafkaStreamsAggregator.java:103-105).

    Order-independence by construction: the state is a lattice fold —
    volume adds; high/low are value max/min; open/close carry the
    full ordering key (t_ms, sensorId, v_fp) and fold by
    lexicographic min/max — so the final state is identical for ANY
    partition of the stream into micro-batches and any arrival order,
    including ties on (t_ms, sensorId) (the value completes the total
    order). That makes the last update-mode emission per key
    batch-boundary-independent and exactly recomputable by a batch
    window oracle ordered the same way.

    Exactness: tempVal is rounded to micro-units in the JVM plan
    (F.round — HALF_UP, matching SQL round; numpy would round
    HALF_EVEN) before reaching pandas; everything in state is BIGINT
    or string."""
    b = readings.select(
        F.substring("geohash", 1, 6).alias("gh"),
        F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("hour_ms"),
        F.col("timestamp").alias("t_ms"),
        F.col("sensorId").alias("sid"),
        F.round(F.col("tempVal") * 1000000).cast("long").alias("v_fp"),
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (vol, ot, osid, ofp, ct, csid, cfp, hi, lo) = state.get
        else:
            vol = 0
            ot = osid = ofp = ct = csid = cfp = hi = lo = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            srt = pdf.sort_values(["t_ms", "sid", "v_fp"])
            first = srt.iloc[0]
            last = srt.iloc[-1]
            fkey = (int(first["t_ms"]), str(first["sid"]), int(first["v_fp"]))
            lkey = (int(last["t_ms"]), str(last["sid"]), int(last["v_fp"]))
            vol += len(pdf)
            if ot is None or fkey < (ot, osid, ofp):
                ot, osid, ofp = fkey
            if ct is None or lkey > (ct, csid, cfp):
                ct, csid, cfp = lkey
            bhi = int(pdf["v_fp"].max())
            blo = int(pdf["v_fp"].min())
            hi = bhi if hi is None else max(hi, bhi)
            lo = blo if lo is None else min(lo, blo)
        state.update((vol, ot, osid, ofp, ct, csid, cfp, hi, lo))
        yield pd.DataFrame(
            {
                "gh": [key[0]],
                "hour_ms": [key[1]],
                "volume": [vol],
                "open_fp": [ofp],
                "high_fp": [hi],
                "low_fp": [lo],
                "close_fp": [cfp],
            }
        )

    return b.groupBy("gh", "hour_ms").applyInPandasWithState(
        fn,
        OHLC_OUTPUT,
        OHLC_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- Streaming time-weighted average state (round 11) -----------------------

TWA_OUTPUT = (
    "sensorId string, n_samples bigint, span_ms bigint, wsum bigint"
)
TWA_STATE = (
    "n bigint, last_t bigint, last_v bigint, wsum bigint, span_ms bigint"
)


def twa_sensor_state(readings: DataFrame) -> DataFrame:
    """Per-sensor LOCF time-weighted-average accumulators maintained
    across micro-batches — the streaming twin of
    operators/timeseries.time_weighted_avg, as SEQUENTIAL state: the
    held value's weight is the duration to the NEXT sample, so the
    state carries the last (t, v) seen and each new sample settles
    the previous one's weight (including across batch boundaries).

    Determinism contract: micro-batches arrive in event-time order
    (the replay writes time-sorted chunks with ascending mtimes) and
    (sensorId, timestamp) is a total order per sensor in the fixture
    (asserted — zero per-sensor ms collisions at every SF), so the
    sequential fold equals the batch lead()-window computation
    exactly. Emissions are INTEGER-only (micro-units × ms sums); the
    final twa division happens JVM-side in the registered row so no
    Python HALF_EVEN rounding can leak in."""
    b = readings.select(
        "sensorId",
        F.col("timestamp").alias("t_ms"),
        F.round(F.col("tempVal") * 1000000).cast("long").alias("v_fp"),
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (n, last_t, last_v, wsum, span) = state.get
        else:
            n, last_t, last_v, wsum, span = 0, None, None, 0, 0
        for pdf in pdfs:
            srt = pdf.sort_values(["t_ms", "v_fp"])
            for t, v in zip(srt["t_ms"], srt["v_fp"]):
                t, v = int(t), int(v)
                if last_t is not None:
                    dur = t - last_t
                    wsum += last_v * dur
                    span += dur
                last_t, last_v = t, v
                n += 1
        state.update((n, last_t, last_v, wsum, span))
        yield pd.DataFrame(
            {
                "sensorId": [key[0]],
                "n_samples": [n],
                "span_ms": [span],
                "wsum": [wsum],
            }
        )

    return b.groupBy("sensorId").applyInPandasWithState(
        fn,
        TWA_OUTPUT,
        TWA_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- Streaming CUSUM state (round 11) ---------------------------------------

# µ-unit twins of operators/timeseries CUSUM_K/H (tempVal ≡ the
# events value column, so the same "k above the series mean" rationale
# holds: normal traffic decays the statistic, bursts accumulate).
CUSUM_K_FP = 70_000_000
CUSUM_H_FP = 200_000_000

CUSUM_OUTPUT = (
    "sensorId string, n_samples bigint, n_alarms bigint, "
    "max_cusum bigint, in_alarm bigint"
)
CUSUM_STATE = "s bigint, n bigint, n_alarms bigint, max_s bigint"


def cusum_sensor_state(readings: DataFrame) -> DataFrame:
    """Per-sensor one-sided CUSUM (Page's test) maintained across
    micro-batches: s ← max(0, s + (v − k)), alarm while s > h — the
    STREAMING deployment shape of operators/timeseries.cusum_alarms
    (where the batch form is the prefix-sum/running-min window
    identity; here the recurrence runs natively in state).

    Determinism contract: identical to twa_sensor_state — time-ordered
    replay + the fixture's per-sensor (sensorId, timestamp) total
    order make the sequential fold equal the batch window identity
    exactly. Values are µ-unit BIGINTs rounded in the JVM plan."""
    b = readings.select(
        "sensorId",
        F.col("timestamp").alias("t_ms"),
        F.round(F.col("tempVal") * 1000000).cast("long").alias("v_fp"),
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (s, n, n_alarms, max_s) = state.get
        else:
            s, n, n_alarms, max_s = 0, 0, 0, 0
        for pdf in pdfs:
            srt = pdf.sort_values(["t_ms", "v_fp"])
            for v in srt["v_fp"]:
                s = max(0, s + int(v) - CUSUM_K_FP)
                max_s = max(max_s, s)
                if s > CUSUM_H_FP:
                    n_alarms += 1
                n += 1
        state.update((s, n, n_alarms, max_s))
        yield pd.DataFrame(
            {
                "sensorId": [key[0]],
                "n_samples": [n],
                "n_alarms": [n_alarms],
                "max_cusum": [max_s],
                "in_alarm": [1 if s > CUSUM_H_FP else 0],
            }
        )

    return b.groupBy("sensorId").applyInPandasWithState(
        fn,
        CUSUM_OUTPUT,
        CUSUM_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- Streaming counter-rate state (round 11) --------------------------------

# µ-unit wrap modulus for the synthetic per-sensor counter (the
# readings twin of operators/timeseries.RESET_MOD_CENTS).
COUNTER_MOD_FP = 500_000_000

COUNTER_OUTPUT = (
    "sensorId string, n_samples bigint, n_resets bigint, "
    "increase_fp bigint"
)
COUNTER_STATE = "run bigint, prev bigint, n bigint, resets bigint, inc bigint"


def counter_sensor_state(readings: DataFrame) -> DataFrame:
    """Per-sensor PromQL ``increase()`` maintained across
    micro-batches — the streaming twin of
    operators/timeseries.counter_rate: the running µ-unit sum wraps
    at the modulus to synthesize resets, and each step credits the
    delta (or the post-reset value) sequentially in state. Same
    determinism contract as twa_sensor_state (time-ordered replay +
    per-sensor (sensorId, timestamp) total order). Integer-only
    state and emissions."""
    b = readings.select(
        "sensorId",
        F.col("timestamp").alias("t_ms"),
        F.round(F.col("tempVal") * 1000000).cast("long").alias("v_fp"),
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (run, prev, n, resets, inc) = state.get
        else:
            run, prev, n, resets, inc = 0, None, 0, 0, 0
        for pdf in pdfs:
            srt = pdf.sort_values(["t_ms", "v_fp"])
            for v in srt["v_fp"]:
                run += int(v)
                counter = run % COUNTER_MOD_FP
                if prev is not None:
                    if counter >= prev:
                        inc += counter - prev
                    else:
                        inc += counter
                        resets += 1
                prev = counter
                n += 1
        state.update((run, prev, n, resets, inc))
        yield pd.DataFrame(
            {
                "sensorId": [key[0]],
                "n_samples": [n],
                "n_resets": [resets],
                "increase_fp": [inc],
            }
        )

    return b.groupBy("sensorId").applyInPandasWithState(
        fn,
        COUNTER_OUTPUT,
        COUNTER_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- Streaming skip-gap CEP (round 12) ---------------------------------------

FUNNEL_OUTPUT = (
    "user_id bigint, n_matches bigint, first_match_event_id bigint"
)
# pending chains per progress level (level j = steps 0..j matched,
# waiting for step j+1), as nested (start_us, start_event_id) arrays
# — one inner array per level, so ANY pattern length fits the same
# schema. Variable-length but WATERMARK-BOUNDED: a start older than
# (current event time − budget) can never complete within the budget
# (the greedy completion is minimal), so it is evicted on every
# event. State size is therefore O(events inside one budget window
# per user), not O(stream).
FUNNEL_STATE = (
    "pus array<array<bigint>>, pid array<array<bigint>>, "
    "n bigint, first bigint"
)


def funnel_user_state(
    events: DataFrame,
    pattern: tuple[str, ...] = ("click", "click", "purchase"),
    within_minutes: int = 14_400,
) -> DataFrame:
    """Streaming skip-gap CEP — the stateful twin of
    operators/timeseries.event_pattern_funnel, as a per-user NFA run
    NATIVELY in applyInPandasWithState (the deployment shape: match
    funnels as events arrive, state crossing micro-batches). Any
    pattern length ≥ 2 (pending levels are a nested-array state).

    Semantics are bit-tied to the batch reverse-window identity: a
    start event matches iff the GREEDY earliest-next-step chain
    completes within the budget, and the NFA advance IS that greedy
    chain — on each event of type t, every pending chain at level
    j−1 with pattern[j] == t advances (levels processed in
    DESCENDING order so one event never serves two steps of the same
    chain), completions are counted iff their span fits, and expired
    starts are evicted (greedy completion is minimal, so an
    over-budget completion proves no chain fits — same reason
    eviction by event-time is lossless). Emissions per batch carry
    the running census; the LAST batch's row per user equals the
    batch operator's output."""
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs at least 2 steps")
    budget_us = within_minutes * 60_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pus, pid, n, first = state.get
            pend = [
                [(int(u), int(i)) for u, i in zip(us_l, id_l)]
                for us_l, id_l in zip(pus, pid)
            ]
            n, first = int(n), int(first)
        else:
            pend = [[] for _ in range(m - 1)]
            n, first = 0, -1
        for pdf in pdfs:
            srt = pdf.sort_values(["us", "event_id"])
            for us, eid, et in zip(
                srt["us"], srt["event_id"], srt["event_type"]
            ):
                us, eid = int(us), int(eid)
                horizon = us - budget_us
                pend = [
                    [s for s in lvl if s[0] >= horizon] for lvl in pend
                ]
                # NFA advance, descending level order: level j holds
                # chains waiting for pattern[j+1]
                if et == pattern[m - 1] and pend[m - 2]:
                    for s_us, s_id in pend[m - 2]:
                        if us - s_us <= budget_us:
                            n += 1
                            if first < 0 or s_id < first:
                                first = s_id
                    pend[m - 2] = []
                for j in range(m - 2, 0, -1):
                    if et == pattern[j] and pend[j - 1]:
                        pend[j] = pend[j] + pend[j - 1]
                        pend[j - 1] = []
                if et == pattern[0]:
                    pend[0] = pend[0] + [(us, eid)]
        state.update((
            [[s[0] for s in lvl] for lvl in pend],
            [[s[1] for s in lvl] for lvl in pend],
            n,
            first,
        ))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_matches": [n],
                "first_match_event_id": [first],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        FUNNEL_OUTPUT,
        FUNNEL_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- Streaming gap census (round 12) ------------------------------------------

GAPS_OUTPUT = (
    "user_id bigint, n_samples bigint, n_gaps bigint, max_gap_us bigint, "
    "gap_us_total bigint, longest_gap_opens_id bigint"
)
GAPS_STATE = (
    "last_us bigint, last_id bigint, n bigint, n_gaps bigint, "
    "max_gap bigint, gap_total bigint, opens_id bigint"
)


def gap_user_state(
    events: DataFrame, threshold_us: int = 36 * 3_600_000_000
) -> DataFrame:
    """Streaming dead-man/heartbeat detection — the stateful twin of
    operators/timeseries.sensor_gaps (gap detection is inherently a
    streaming deployment: the alert fires when the NEXT sample
    finally arrives, or a timeout would fire it; this certified form
    covers the arrival path). State per user is O(1): last sample
    (us, id) + the running census. Tie-break mirrors the batch
    lexicographic struct-min exactly: among equal max gaps, the
    SMALLEST opening event id wins (not the first-processed one).
    Emissions per batch carry the running census; the last batch's
    row equals the batch operator's output."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, last_id, n, n_gaps, max_gap, gap_total, opens = (
                int(v) if v is not None else None for v in state.get
            )
        else:
            last_us = last_id = opens = None
            n = n_gaps = max_gap = gap_total = 0
        for pdf in pdfs:
            srt = pdf.sort_values(["us", "event_id"])
            for us, eid in zip(srt["us"], srt["event_id"]):
                us, eid = int(us), int(eid)
                if last_us is not None:
                    gap = us - last_us
                    if gap > threshold_us:
                        n_gaps += 1
                        gap_total += gap
                        if gap > max_gap:
                            max_gap, opens = gap, last_id
                        elif gap == max_gap and last_id < opens:
                            opens = last_id
                last_us, last_id = us, eid
                n += 1
        state.update(
            (last_us, last_id, n, n_gaps, max_gap, gap_total, opens)
        )
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_samples": [n],
                "n_gaps": [n_gaps],
                "max_gap_us": [max_gap if n_gaps else None],
                "gap_us_total": [gap_total],
                "longest_gap_opens_id": [opens],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        GAPS_OUTPUT,
        GAPS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- transformWithState port of the gap census (round 15) ---------------
#
# Spark 4's transformWithStateInPandas (SPARK-49564) is the successor
# API to applyInPandasWithState: named state variables on a
# StatefulProcessorHandle instead of one opaque tuple, timers, and a
# RocksDB-only state store. VERDICT r14 item 6 asks for one certified
# row on it; this box's Python environment lacks the `protobuf`
# package the TWS Python driver worker requires (probe recorded in
# NOTES_r15: TransformWithStateInPySpark init dies with
# "ImportError: cannot import name 'descriptor' from
# 'google.protobuf'", installs prohibited), so the port ships
# environment-gated exactly like the S1 live-broker leg: the
# processor and wiring are complete, `tws_available()` probes the
# missing dependency, and tests/test_tws_parity.py asserts bit-exact
# parity with gap_user_state whenever the environment can run it.


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run here:
    its driver worker imports google.protobuf before any user code
    (pyspark/sql/streaming/transform_with_state_driver_worker.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def gap_user_state_tws(
    events: DataFrame, threshold_us: int = 36 * 3_600_000_000
) -> DataFrame:
    """The gap census of gap_user_state, ported to
    transformWithStateInPandas — identical fold, identical
    emissions, so the two APIs are interchangeable row-for-row (the
    opt-in parity test pins it). Requires the RocksDB state-store
    provider (a hard transformWithState requirement, cf.
    streaming/pipeline.ROCKSDB_PROVIDER) and a protobuf-capable
    Python environment (tws_available)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    threshold = int(threshold_us)

    class GapCensusProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # one named ValueState holding the same 7-field census
            # tuple applyInPandasWithState kept as its opaque state
            self._census = handle.getValueState("census", GAPS_STATE)

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator[pd.DataFrame]:
            st = self._census.get() if self._census.exists() else None
            if st is not None:
                last_us, last_id, n, n_gaps, max_gap, gap_total, opens = (
                    int(v) if v is not None else None for v in st
                )
            else:
                last_us = last_id = opens = None
                n = n_gaps = max_gap = gap_total = 0
            for pdf in rows:
                srt = pdf.sort_values(["us", "event_id"])
                for us, eid in zip(srt["us"], srt["event_id"]):
                    us, eid = int(us), int(eid)
                    if last_us is not None:
                        gap = us - last_us
                        if gap > threshold:
                            n_gaps += 1
                            gap_total += gap
                            if gap > max_gap:
                                max_gap, opens = gap, last_id
                            elif gap == max_gap and last_id < opens:
                                opens = last_id
                    last_us, last_id = us, eid
                    n += 1
            self._census.update(
                (last_us, last_id, n, n_gaps, max_gap, gap_total, opens)
            )
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_samples": [n],
                    "n_gaps": [n_gaps],
                    "max_gap_us": [max_gap if n_gaps else None],
                    "gap_us_total": [gap_total],
                    "longest_gap_opens_id": [opens],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        GapCensusProcessor(),
        GAPS_OUTPUT,
        "update",
        "none",
    )
