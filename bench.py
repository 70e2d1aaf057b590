"""Benchmark harness (driver contract).

Runs the headline declared queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a result-materializing action (collect on
the final, already-aggregated frame — the driver does the same). A
warmup pass on sf0.001 triggers JVM/codegen warm paths so steady-state
throughput is measured, not JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_pipeline_spark.inventory import BENCH_QUERIES, QUERIES
from kafka_streams_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="kspipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def release_blocks() -> None:
        """Drop cached/checkpointed blocks left by the previous query.

        Iterative operators persist/localCheckpoint intermediates
        whose lifetime is the query; in a 17-query single-JVM session
        the leftovers accumulate, evict each other, and force
        recomputes — round 2 measured a uniform ~1.5× drift across
        even unchanged queries from exactly this. One JVM GC cycle
        lets the ContextCleaner reap the unreferenced blocks so every
        timed query starts from the same storage state."""
        import gc

        spark.catalog.clearCache()
        gc.collect()  # release py4j refs pinning JVM-side RDDs
        spark.sparkContext._jvm.System.gc()

    warm_dir = "/root/testdata/sf0.001"
    for name in BENCH_QUERIES:
        if os.path.isdir(warm_dir):
            QUERIES[name](spark, warm_dir).collect()
    release_blocks()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # min of 2 runs: sub-second queries are noise-dominated on a
        # shared box; min approximates steady-state cost
        runs = []
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        release_blocks()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
