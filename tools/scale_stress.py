"""Scale-stress sweep for the dedup / ANN / components and
text/corpus families (VERDICT r5 item 6; r7 items 3+7 added the
text ops and the recurring LSH-recall certification).

The driver fixtures stop at sf0.1 (5k documents / 2k embeddings), so
the sub-quadratic-growth claims of the LSH/prefix/components
operators were argued from plan shape, not measured. This tool
manufactures sf1-equivalent inputs locally — replicating the sf0.1
fixtures with deterministic perturbations so near-duplicate CLIQUES
grow with the multiplier (each original document gains identical
replicas plus mutated non-duplicate variants) — and records wall
time + result size per multiplier, then separately certifies the
distributed components path on a graph ABOVE the driver-side
union-find cap (SMALL_COMPONENTS_MAX_EDGES), where the alternating
large-star/small-star solver must run.

Usage:
    python tools/scale_stress.py [--mults 1,2,5,10] [--out SCALE_SWEEP_r06.json]

Writes one JSON file with the sweep table; nothing in /root/testdata
is touched (generated parquet goes to a temp dir).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from kafka_streams_pipeline_spark.session import get_spark  # noqa: E402

SF_BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# replica id stride keeps replicated doc_ids disjoint per copy
STRIDE = 1_000_000


def generate(base_dir: str, out_dir: str, mult: int) -> None:
    """Replicate documents/embeddings ``mult``× with deterministic
    perturbations: replica 0 is the original; replica k>0 keeps the
    text IDENTICAL when (doc_id + k) % 3 != 0 (growing each doc's
    near-dup clique with the multiplier — the load the LSH buckets,
    prefix join, and components solver must absorb) and otherwise
    rewrites every 7th word to a replica-unique token (non-duplicate
    filler, so the corpus also grows in distinct content).
    Embeddings get a ±2e-3 deterministic jitter per replica —
    semantically near, never bit-equal."""
    con = duckdb.connect()
    docs = f"read_parquet('{base_dir}/documents.parquet')"
    embs = f"read_parquet('{base_dir}/embeddings.parquet')"
    os.makedirs(out_dir, exist_ok=True)
    con.execute(
        f"""
        COPY (
            WITH src AS (
                SELECT doc_id, string_split(text, ' ') AS toks,
                       lang, source, n_chars, k
                FROM {docs},
                     unnest(generate_series(0, {mult - 1})) AS t(k)
            )
            SELECT doc_id + {STRIDE} * k AS doc_id,
                   CASE
                     WHEN k = 0 OR (doc_id + k) % 3 != 0
                       THEN list_aggregate(toks, 'string_agg', ' ')
                     ELSE list_aggregate(
                       list_transform(
                         generate_series(1, len(toks)),
                         i -> CASE WHEN (i - 1) % 7 = 0
                              THEN 'mut' || doc_id || 'k' || k || 'w' || i
                              ELSE toks[i] END),
                       'string_agg', ' ')
                   END AS text,
                   lang, source, n_chars
            FROM src
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT vec_id + {STRIDE} * k AS vec_id,
                   list_transform(
                     generate_series(1, len(embedding)),
                     i -> CAST(embedding[i]
                          + ((vec_id * 13 + k * 7 + i) % 5 - 2) * 0.001
                          AS FLOAT)) AS embedding,
                   label
            FROM {embs},
                 unnest(generate_series(0, {mult - 1})) AS t(k)
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


def run_sweep(spark, mults: list[int]) -> dict:
    from kafka_streams_pipeline_spark.operators import dedup as dd
    from kafka_streams_pipeline_spark.operators import similarity as sim
    from kafka_streams_pipeline_spark.operators import text as tx

    # Warm-up pass at the smallest multiplier (JVM/codegen warm
    # paths): without it the first sweep row absorbs one-time JIT
    # cost and every growth ratio reads artificially sub-linear.
    warm_dir = tempfile.mkdtemp(prefix="kspipeline-scale-warm-")
    generate(SF_BASE, warm_dir, mults[0])
    wdocs = spark.read.parquet(os.path.join(warm_dir, "documents.parquet"))
    wembs = spark.read.parquet(os.path.join(warm_dir, "embeddings.parquet"))
    for fn in (
        lambda: dd.minhash_near_dup_pairs(wdocs).count(),
        lambda: dd.prefix_jaccard_join(wdocs).count(),
        lambda: dd.containment_pairs(wdocs).count(),
        lambda: dd.dedup_components(wdocs).count(),
        lambda: sim.cosine_pairs(wdocs).count(),
        lambda: sim.semantic_dedup(wembs).count(),
        lambda: sim.topk_cosine_lsh(wembs).count(),
        lambda: sim.topk_cosine_ivf(wembs).count(),
        lambda: tx.vocab_build(wdocs).count(),
        lambda: tx.bigram_surprisal(wdocs, hash_keys=True).count(),
        lambda: tx.pack_sequences(wdocs).count(),
        lambda: tx.repeated_window_stats(wdocs).count(),
        lambda: tx.encode_documents(wdocs).count(),
        lambda: tx.decontaminate(wdocs, wdocs.limit(5)).count(),
    ):
        fn()
    spark.catalog.clearCache()
    shutil.rmtree(warm_dir, ignore_errors=True)

    results: dict = {}
    for mult in mults:
        out_dir = tempfile.mkdtemp(prefix=f"kspipeline-scale-{mult}x-")
        generate(SF_BASE, out_dir, mult)
        docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
        embs = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
        n_docs, n_vecs = docs.count(), embs.count()
        row: dict = {"n_docs": n_docs, "n_vecs": n_vecs, "ops": {}}

        def timed(name: str, fn) -> None:
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn()
            row["ops"][name] = {
                "sec": round(time.time() - t0, 3),
                "rows": n,
            }
            print(
                f"  {mult}x {name}: {row['ops'][name]['sec']}s"
                f" ({n} rows)",
                flush=True,
            )

        timed(
            "minhash_pairs",
            lambda: dd.minhash_near_dup_pairs(docs).count(),
        )
        timed(
            "prefix_join",
            lambda: dd.prefix_jaccard_join(docs).count(),
        )
        timed(
            "components_auto",
            lambda: dd.dedup_components(docs).count(),
        )
        timed(
            # round 14: inverted-index all-pairs cosine — candidates
            # bounded by shingle df (the replicated cliques grow the
            # TRUE output, so growth here is output-bound like
            # prefix_join/hamming, never corpus-quadratic)
            "cosine_pairs",
            lambda: sim.cosine_pairs(docs).count(),
        )
        timed(
            "semantic_dedup",
            # the production configuration (VERDICT r6 item 4):
            # n_clusters auto-derived from corpus size (the SemDeDup
            # contract: per-cell size stays bounded — the fixed
            # default measured super-linear at 20x) and the
            # Arrow-vectorized matmul assignment instead of the
            # exact-oracle interpreted-lambda fold
            lambda: sim.semantic_dedup(
                embs, n_clusters=None, vectorized_assign=True
            ).count(),
        )
        # candidate-vs-true-pair counts (VERDICT r6 item 6): proves a
        # super-linear time point is output-bound (true pairs grew),
        # not prefix/band filter decay
        row["ops"]["prefix_join"]["filter_stats"] = (
            dd.prefix_join_scaling_stats(docs)
        )
        row["ops"]["minhash_pairs"]["filter_stats"] = (
            dd.minhash_scaling_stats(docs)
        )
        # containment (round 11): the size-ordered prefix filter is
        # now the default path; record its distinct-candidate count
        # next to the brute-force self-join's candidate ROW count so
        # the hot-shingle m² → ~0·m claim is measured, not asserted.
        timed(
            "containment",
            lambda: dd.containment_pairs(docs).count(),
        )
        row["ops"]["containment"]["filter_stats"] = (
            dd.containment_scaling_stats(docs)
        )
        # cosine_pairs (VERDICT r14 item 4 — no silent caps): record
        # the candidate posting-pair count the term equi-join pays,
        # the terms the df cap drops, the identical-text collapse's
        # group stats, and overlong-doc exclusions per step
        row["ops"]["cosine_pairs"]["filter_stats"] = (
            sim.cosine_pairs_scaling_stats(docs)
        )
        # round-11 additions: the two-phase-rank family (VERDICT r10
        # item 2's fix must hold at 20×, not just pass the gate) and
        # the pigeonhole Hamming join (output-bound by design — the
        # replica cliques make its result set grow quadratically in
        # clique size, so time should track OUTPUT, not input²).
        from kafka_streams_pipeline_spark.operators import corpus as cp

        timed(
            "negative_samples",
            lambda: cp.negative_samples(docs).count(),
        )
        timed(
            "budget_select",
            lambda: cp.budget_select(docs).count(),
        )
        timed(
            "hamming_join",
            lambda: dd.simhash_hamming_pairs(docs).count(),
        )
        # round-13: span-level substring dedup — the replica cliques
        # make every gram's occurrence group grow with the
        # multiplier, but the op aggregates counts instead of
        # emitting pairs, so time should stay ~linear in input where
        # hamming_join is output-quadratic in clique size
        timed(
            "span_dedup",
            lambda: dd.duplicated_spans(docs).count(),
        )
        timed(
            "ann_lsh",
            lambda: sim.topk_cosine_lsh(embs).count(),
        )
        timed(
            "ann_ivf",
            lambda: sim.topk_cosine_ivf(embs).count(),
        )
        # text/corpus family (VERDICT r7 item 3): the round-7/8
        # rewrites — vocab_build's two-phase range-repartition rank,
        # bigram_surprisal's three token joins (text vs hashed keys,
        # so the 8-byte-shuffle win is RECORDED, not asserted),
        # prefix-sum sequence packing, and the sortless hashed
        # repeated-window profile. The mutated replica tokens grow
        # the vocabulary with the multiplier, so vocab_build's rank
        # stage is genuinely stressed.
        timed("vocab_build", lambda: tx.vocab_build(docs).count())
        timed(
            "bigram_surprisal_text",
            lambda: tx.bigram_surprisal(docs).count(),
        )
        timed(
            "bigram_surprisal_hashed",
            lambda: tx.bigram_surprisal(docs, hash_keys=True).count(),
        )
        timed("pack_sequences", lambda: tx.pack_sequences(docs).count())
        timed(
            "repeated_window_stats",
            lambda: tx.repeated_window_stats(docs).count(),
        )
        # window-multiset cardinality (VERDICT r8 item 4): attributes
        # a super-linear time point to multiset growth vs plan decay
        row["ops"]["repeated_window_stats"]["filter_stats"] = (
            tx.repeated_window_scaling_stats(docs)
        )
        timed(
            "encode_documents",
            lambda: tx.encode_documents(docs).count(),
        )
        # decontamination (round 10): benchmark side is a FIXED
        # ~1/61 salted slice of the BASE corpus (its n-gram set does
        # not grow with the multiplier — matching real eval suites),
        # so sweep time should track the corpus-side n-gram explode
        # + broadcast probe linearly while output grows with the
        # replicated benchmark docs' self-matches.
        from pyspark.sql import functions as F

        from kafka_streams_pipeline_spark.functions.hashing import (
            md5_long,
        )

        bench = docs.where(
            (F.col("doc_id") < STRIDE)
            & (
                md5_long(
                    F.concat(
                        F.lit("bench:"), F.col("doc_id").cast("string")
                    )
                )
                % 61
                == 0
            )
        )
        timed(
            "decontaminate",
            lambda: tx.decontaminate(docs, bench).count(),
        )
        # LSH recall vs the exact inverted-index baseline (VERDICT r7
        # item 7: keep the recall certification recurring so banding
        # changes can't silently regress it at scale — the driver's
        # q_dedup_recall row only measures sf0.01)
        t0 = time.time()
        lsh = dd.minhash_near_dup_pairs(docs).select("id_a", "id_b")
        exact = dd.ngram_jaccard_pairs(docs).select("id_a", "id_b")
        n_exact = exact.count()
        n_both = lsh.join(exact, ["id_a", "id_b"]).count()
        row["lsh_recall"] = {
            "n_exact": n_exact,
            "n_both": n_both,
            "recall": round(n_both / n_exact, 6) if n_exact else None,
            "sec": round(time.time() - t0, 3),
        }
        print(
            f"  {mult}x lsh_recall: {row['lsh_recall']['recall']}"
            f" ({n_both}/{n_exact}, {row['lsh_recall']['sec']}s)",
            flush=True,
        )
        results[str(mult)] = row
        shutil.rmtree(out_dir, ignore_errors=True)
    return results


def view_family_check(spark, mults: list[int]) -> dict:
    """Measure the CORE reference family's load-bearing claim
    (README: "query cost is O(cells × hours in range), independent of
    raw-event volume"): replicate the sf0.1 events ``m``× with
    30-day timestamp shifts (dates — and so ws_date partitions —
    grow linearly; the cell grid stays fixed), rebuild + write the
    partitioned view store, then run the SAME fixed 2-day history
    and single-hour snapshot against each store. Expected shape:
    ingest ~linear in events, history/snapshot ~FLAT (partition
    pruning holds the scanned file count constant while the store
    grows 20×)."""
    import datetime as dt
    from functools import reduce

    import pyspark.sql.functions as F

    from kafka_streams_pipeline_spark import geo
    from kafka_streams_pipeline_spark.operators import queries as Q
    from kafka_streams_pipeline_spark.operators.view import build_view
    from kafka_streams_pipeline_spark.sources.readings import (
        readings_from_events,
    )
    from kafka_streams_pipeline_spark.sources.sinks import (
        read_view,
        write_view,
    )
    from kafka_streams_pipeline_spark.sources.tables import load_table

    base = readings_from_events(load_table(spark, SF_BASE, "events"))
    n_base = base.count()
    shift_ms = 30 * 86_400_000  # one replica = one 30-day epoch
    from_ts = dt.datetime(2024, 1, 15)
    to_ts = dt.datetime(2024, 1, 17)
    snap_hour = dt.datetime(2024, 1, 10, 7, 0)
    out: dict = {"n_base_events": n_base}
    for m in mults:
        readings = reduce(
            lambda a, b: a.unionByName(b),
            [
                base.withColumn(
                    "timestamp", F.col("timestamp") + F.lit(k * shift_ms)
                )
                for k in range(m)
            ],
        )
        vdir = os.path.join(
            tempfile.mkdtemp(prefix=f"kspipeline-viewfam-{m}x-"), "view"
        )
        t0 = time.time()
        write_view(build_view(readings), vdir)
        t_ingest = round(time.time() - t0, 3)
        view = read_view(spark, vdir)
        n_view = view.count()
        ghs = [
            r["gh"]
            for r in view.select("gh").distinct().orderBy("gh").limit(2).collect()
        ]
        t0 = time.time()
        n_hist = len(
            Q.history(view, "count", ghs, from_ts, to_ts).collect()
        )
        t_hist = round(time.time() - t0, 3)
        south, west, north, east = geo.decode_bbox(ghs[0])
        t0 = time.time()
        n_snap = len(
            Q.snapshot(view, "avg", snap_hour, (north, west, south, east)).collect()
        )
        t_snap = round(time.time() - t0, 3)
        out[str(m)] = {
            "events": n_base * m,
            "view_rows": n_view,
            "ingest_sec": t_ingest,
            "history_sec": t_hist,
            "history_rows": n_hist,
            "snapshot_sec": t_snap,
            "snapshot_rows": n_snap,
        }
        print(
            f"  viewfam {m}x: ingest {t_ingest}s ({n_base * m} events → "
            f"{n_view} view rows), history {t_hist}s ({n_hist}), "
            f"snapshot {t_snap}s ({n_snap})",
            flush=True,
        )
        shutil.rmtree(os.path.dirname(vdir), ignore_errors=True)
    return out


def big_graph_check(spark) -> dict:
    """Certify the distributed components path on a graph ABOVE the
    driver-side cap: 2M nodes in blocks of 5 connected by chain edges
    (1.6M edges > SMALL_COMPONENTS_MAX_EDGES = 1M), so
    connected_components_alternating actually iterates. Ground truth
    per node is the block head — checked IN SPARK (no collect of the
    label set)."""
    import pyspark.sql.functions as F

    from kafka_streams_pipeline_spark.operators.dedup import (
        SMALL_COMPONENTS_MAX_EDGES,
        connected_components_alternating,
    )

    n_nodes, block = 2_000_000, 5
    edges = (
        spark.range(n_nodes)
        .where(F.col("id") % block != block - 1)
        .select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
    )
    n_edges = edges.count()
    assert n_edges > SMALL_COMPONENTS_MAX_EDGES, n_edges
    t0 = time.time()
    labels = connected_components_alternating(edges, max_iter=25)
    mismatches = (
        labels.where(
            F.col("comp") != F.col("node") - (F.col("node") % block)
        ).count()
    )
    labeled = labels.count()
    sec = round(time.time() - t0, 3)
    print(
        f"  big graph: {n_edges} edges, {labeled} labeled nodes, "
        f"{mismatches} mismatches, {sec}s",
        flush=True,
    )
    return {
        "n_edges": n_edges,
        "labeled_nodes": labeled,
        "label_mismatches": mismatches,
        "sec": sec,
        "cap": SMALL_COMPONENTS_MAX_EDGES,
    }


def _asof_tol(events):
    """q_asof_tolerance's plan over an in-memory events frame (the
    registered row loads from an sf_dir; the sweep feeds replicated
    frames directly, so the window logic is inlined here — kept in
    sync with inventory/relational.q_asof_tolerance)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    wb = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    wf = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing))
    is_click = F.col("event_type") == "click"
    base = events.select(
        "event_id", "user_id", "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        F.last(F.when(is_click, F.unix_millis("ts")),
               ignorenulls=True).over(wb).alias("back_ms"),
        F.first(F.when(is_click, F.unix_millis("ts")),
                ignorenulls=True).over(wf).alias("fwd_ms"),
    ).where(F.col("event_type") == "purchase")
    return base.where(
        (F.col("ts_ms") - F.col("back_ms") <= 1_800_000)
        | (F.col("fwd_ms") - F.col("ts_ms") <= 600_000)
    )


def timeseries_check(spark, mults: list[int]) -> dict:
    """Round 11: the window-identity TSDB family (counter_rate,
    cusum_alarms, ohlc_bars) at scaled EVENTS — series count grows
    with the multiplier (user_id stride keeps replicas as new
    series), so the single-shuffle/per-series-window claim predicts
    near-linear time growth on a fixed 32-core box. Replicated
    events get a deterministic per-replica µs jitter so timestamps
    stay distinct within a series."""
    from kafka_streams_pipeline_spark.operators import timeseries as ts

    con = duckdb.connect()
    ev = f"read_parquet('{SF_BASE}/events.parquet')"
    out: dict = {}
    warm = True
    for mult in mults:
        d = tempfile.mkdtemp(prefix=f"kspipeline-ts-{mult}x-")
        path = os.path.join(d, "events.parquet")
        con.execute(
            f"""
            COPY (
                SELECT event_id + k * {STRIDE}      AS event_id,
                       ts + to_microseconds(k * 37) AS ts,
                       user_id + k * {STRIDE}       AS user_id,
                       event_type, value, props
                FROM {ev}, range({mult}) r(k)
            ) TO '{path}' (FORMAT parquet)
            """
        )
        events = spark.read.parquet(path).withColumn(
            "ts", F_ts_cast(spark, "ts")
        )
        n = events.count()
        row: dict = {"n_events": n, "ops": {}}
        for name, fn in (
            ("counter_rate", lambda: ts.counter_rate(events).count()),
            ("cusum_alarms", lambda: ts.cusum_alarms(events).count()),
            ("ohlc_bars", lambda: ts.ohlc_bars(events).count()),
            # round 16 (VERDICT r15 item 5): the r15 additions under
            # scaled EVENT VOLUME — both ride the hourly pre-agg, so
            # time should grow ~linearly with the scan while their
            # join sizes stay FLAT (bounded by hour counts)
            ("ccf", lambda: ts.ccf_by_series(events).count()),
            ("theil_sen", lambda: ts.theil_sen_trend(events).count()),
            # round 16 additions: all three ride the hourly pre-agg
            # — work above the scan is bounded by hour counts, so
            # time should track the scan while output stays flat
            ("seasonal", lambda: ts.seasonal_decompose(events).count()),
            ("changepoint", lambda: ts.changepoint_amoc(events).count()),
            ("ewma", lambda: ts.ewma_by_series(events).count()),
            # round-16 late additions: backtest rides the hourly
            # pre-agg (flat above the scan); the tolerance as-of is
            # ONE user-partitioned window sort over raw events —
            # linear in volume, parallel across the user replicas
            ("backtest",
             lambda: ts.seasonal_naive_backtest(events).count()),
            ("asof_tolerance", lambda: _asof_tol(events).count()),
        ):
            if warm:
                fn()  # absorb one-time codegen cost at the smallest mult
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn()
            row["ops"][name] = {
                "sec": round(time.time() - t0, 3), "rows": rows
            }
            print(f"  ts {mult}x {name}: {row['ops'][name]['sec']}s"
                  f" ({rows} rows)", flush=True)
        warm = False
        out[str(mult)] = row
        shutil.rmtree(d, ignore_errors=True)
    return out


def theil_sen_range_check(spark, mults: list[int]) -> dict:
    """Round 16 (VERDICT r15 item 3's sweep evidence): scale the TIME
    RANGE, not the volume — replica k's events shift k × the base
    span, so the hourly series gets m× the buckets. The full
    Theil-Sen's pair count must grow ~quadratically with the range
    while the windowed form stays ~linear (bounded by hours × W) —
    measured via theil_sen_windowed_scaling_stats, not asserted."""
    from kafka_streams_pipeline_spark.operators import timeseries as ts

    con = duckdb.connect()
    ev = f"read_parquet('{SF_BASE}/events.parquet')"
    span_us = con.execute(
        f"SELECT CAST(ceil(date_part('epoch', max(ts) - min(ts))"
        f" / 3600 + 1) AS BIGINT) * 3600 * 1000000 FROM {ev}"
    ).fetchone()[0]
    out: dict = {}
    warm = True
    for mult in mults:
        d = tempfile.mkdtemp(prefix=f"kspipeline-tsrange-{mult}x-")
        path = os.path.join(d, "events.parquet")
        con.execute(
            f"""
            COPY (
                SELECT event_id + k * {STRIDE}            AS event_id,
                       ts + to_microseconds(k * {span_us}) AS ts,
                       user_id, event_type, value, props
                FROM {ev}, range({mult}) r(k)
            ) TO '{path}' (FORMAT parquet)
            """
        )
        events = spark.read.parquet(path).withColumn(
            "ts", F_ts_cast(spark, "ts")
        )
        if warm:
            ts.theil_sen_trend_windowed(events).count()
            warm = False
        spark.catalog.clearCache()
        stats = ts.theil_sen_windowed_scaling_stats(events)
        t0 = time.time()
        rows = ts.theil_sen_trend_windowed(events).count()
        sec_w = round(time.time() - t0, 3)
        row = dict(stats)
        row["windowed_sec"] = sec_w
        row["windowed_rows"] = rows
        # the full estimator for contrast — skip past 10× (its pair
        # count is the thing growing quadratically; the point is the
        # recorded counts, not waiting on the join)
        if mult <= 10:
            spark.catalog.clearCache()
            t0 = time.time()
            ts.theil_sen_trend(events).count()
            row["full_sec"] = round(time.time() - t0, 3)
        print(
            f"  tsrange {mult}x: buckets {row['n_hour_buckets']}"
            f" full_pairs {row['full_pairs']}"
            f" windowed_pairs {row['windowed_pairs']}"
            f" ({sec_w}s)",
            flush=True,
        )
        out[str(mult)] = row
        shutil.rmtree(d, ignore_errors=True)
    return out


def cosine_ceiling_check(spark, mult: int = 50) -> dict:
    """Round 16 (VERDICT r15 item 5): one cosine_pairs run above the
    standard sweep ceiling, with filter_stats, to substantiate the
    SURVEY X3p shingle-vocabulary-growth claim at 50×."""
    from kafka_streams_pipeline_spark.operators import similarity as sim

    d = tempfile.mkdtemp(prefix=f"kspipeline-cos-{mult}x-")
    try:
        generate(SF_BASE, d, mult)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n_docs = docs.count()
        spark.catalog.clearCache()
        t0 = time.time()
        n = sim.cosine_pairs(docs).count()
        sec = round(time.time() - t0, 3)
        stats = sim.cosine_pairs_scaling_stats(docs)
        print(f"  cosine {mult}x: {sec}s ({n} rows)", flush=True)
        return {
            "mult": mult,
            "n_docs": n_docs,
            "sec": sec,
            "rows": n,
            "filter_stats": stats,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def F_ts_cast(spark, col):
    """DuckDB COPY writes µs TIMESTAMP (read back as NTZ under the
    nanosAsLong session conf) — normalize to TimestampType; session
    tz is UTC so naive values are UTC instants (same convention as
    sources/tables.load_table)."""
    import pyspark.sql.functions as F

    return F.col(col).cast("timestamp")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,2,5,10")
    ap.add_argument("--out", default="SCALE_SWEEP_r08.json")
    ap.add_argument(
        "--ts-only", action="store_true",
        help="run only the timeseries events sweep and merge the "
        "result into an EXISTING --out payload",
    )
    ap.add_argument(
        "--extras-only", action="store_true",
        help="run only the round-16 additions (timeseries family, "
        "theil-sen range sweep, cosine 50x ceiling) and merge into "
        "an EXISTING --out payload",
    )
    ap.add_argument("--cosine-mult", type=int, default=50)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    spark = get_spark(app_name="kspipeline-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    if args.ts_only:
        tsfam = timeseries_check(spark, mults)
        with open(args.out) as f:
            payload = json.load(f)
        payload["timeseries_family"] = tsfam
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(json.dumps({"wrote": args.out, "ts_mults": list(tsfam)}))
        return
    if args.extras_only:
        tsfam = timeseries_check(spark, mults)
        tsrange = theil_sen_range_check(spark, mults)
        cos = cosine_ceiling_check(spark, args.cosine_mult)
        with open(args.out) as f:
            payload = json.load(f)
        payload["timeseries_family"] = tsfam
        payload["theil_sen_range"] = tsrange
        payload["cosine_ceiling"] = cos
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(json.dumps({"wrote": args.out, "extras": True}))
        return
    sweep = run_sweep(spark, mults)
    viewfam = view_family_check(spark, mults)
    big = big_graph_check(spark)
    tsfam = timeseries_check(spark, mults)
    tsrange = theil_sen_range_check(spark, mults)
    cos = cosine_ceiling_check(spark, args.cosine_mult)

    # growth factors vs the smallest multiplier (sub-quadratic = the
    # time ratio stays well under the square of the size ratio)
    base = sweep[str(mults[0])]
    growth = {}
    for m in mults[1:]:
        row = sweep[str(m)]
        size_ratio = row["n_docs"] / base["n_docs"]
        growth[str(m)] = {
            op: {
                "time_ratio": round(
                    row["ops"][op]["sec"]
                    / max(base["ops"][op]["sec"], 1e-9),
                    2,
                ),
                "size_ratio": round(size_ratio, 2),
                "quadratic_would_be": round(size_ratio**2, 2),
            }
            for op in row["ops"]
        }

    payload = {
        "base_dir": SF_BASE,
        "sweep": sweep,
        "growth_vs_smallest": growth,
        "view_family": viewfam,
        "big_graph_alternating": big,
        "timeseries_family": tsfam,
        "theil_sen_range": tsrange,
        "cosine_ceiling": cos,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"wrote": args.out, "big_graph_ok": big["label_mismatches"] == 0}))


if __name__ == "__main__":
    main()
