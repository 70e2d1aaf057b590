"""Interactive A/B timing REPL for the optimization round.

Usage: python -i tools/ab_repl.py  (inside tmux). Gives:
  t('q_name', n=3, sf='/root/testdata/sf0.1')  -> prints runs + median
  rb()                                         -> release cached blocks
  ex('q_name')                                 -> explain('formatted')
Timing is bench-identical: QUERIES[name](spark, sf_dir).collect(),
release_blocks between timed runs.
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_pipeline_spark.inventory import QUERIES  # noqa: E402
from kafka_streams_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab-repl", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def rb():
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def t(name, n=3, sf=SF):
    runs = []
    for _ in range(n):
        t0 = time.time()
        QUERIES[name](spark, sf).collect()
        runs.append(round(time.time() - t0, 3))
        rb()
    med = sorted(runs)[len(runs) // 2]
    print(f"{name}: runs={runs} median={med}")
    return med


def ex(name, sf=SF):
    QUERIES[name](spark, sf).explain("formatted")


def warm():
    for nm in list(QUERIES):
        try:
            QUERIES[nm](spark, "/root/testdata/sf0.001").collect()
        except Exception as e:  # noqa: BLE001
            print("warm fail", nm, e)
    rb()


print("ab_repl ready: t(name), rb(), ex(name), warm()")
