"""Local stand-in for the driver's correctness gate.

Runs every declared query on Spark and its oracle on DuckDB over the
same fixtures, compares row count, column names/order, and an
order-insensitive value hash (floats canonicalized via repr of
round-trip float; NaN/None normalized). Usage:

    python tools/check_oracle.py [--window [N]] [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from kafka_streams_pipeline_spark.schema import FIXTURE_TABLES
from kafka_streams_pipeline_spark.session import get_spark

import __spark_entry__ as entrymod


def canon(v) -> str:
    if hasattr(v, "item"):  # numpy scalar from the pandas fetch path
        v = v.item()
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # -0.0 → 0.0
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows) -> str:
    digests = sorted(
        hashlib.md5("|".join(canon(v) for v in row).encode()).hexdigest()
        for row in rows
    )
    return hashlib.md5("\n".join(digests).encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    window_n = 0
    if "--window" in args:
        # --window [N]: check exactly the first N (default 50) of
        # driver_order() — a local simulation of the driver's
        # per-round correctness gate (round-7 QoL; previously
        # scripted by hand each round)
        i = args.index("--window")
        nxt = args[i + 1 : i + 2]
        if nxt and nxt[0].isdigit():
            window_n = int(nxt[0])
            del args[i : i + 2]
        else:
            window_n = 50
            del args[i]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if window_n:
        from kafka_streams_pipeline_spark import inventory

        only = set(inventory.driver_order()[:window_n]) | only

    con = duckdb.connect()
    import os

    for t in FIXTURE_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    spark = get_spark(app_name="oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # Fetch the Spark side via pandas as well: round-2 driver
            # evidence (q_asof_attribution et al. GREEN with nullable
            # BIGINT columns) shows the driver degrades BOTH sides the
            # same way — an int column containing nulls becomes
            # float64 on both, so only asymmetric degradations (DuckDB
            # HUGEINT) can mismatch. collect() would make the Spark
            # side int where the oracle side is float and flag passes
            # as failures.
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = [
                tuple(row) for row in spdf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            # Fetch via pandas (.df()), NOT fetchall(): the driver's
            # compare goes through pandas, where DuckDB HUGEINT (the
            # type of sum(BIGINT)) degrades to float64. fetchall()
            # returns Python ints and silently masks that mismatch —
            # the exact failure mode of rounds 1-2 (VERDICT r2 §wrong).
            res = con.execute(oracles[name])
            odf = res.df()
            ocols = list(odf.columns)
            orows = [
                tuple(row) for row in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            problems.append(f"columns spark={scols} oracle={ocols}")
        # driver sorts columns by name before hashing; emulate
        sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
        sh = value_hash([[r[i] for i in sidx] for r in srows])
        oh = value_hash([[r[i] for i in oidx] for r in orows])
        if sh != oh:
            problems.append("value-hash mismatch")
            sset = {tuple(canon(r[i]) for i in sidx) for r in srows}
            oset = {tuple(canon(r[i]) for i in oidx) for r in orows}
            diff_s = list(sset - oset)[:3]
            diff_o = list(oset - sset)[:3]
            if diff_s:
                problems.append(f"  spark-only: {diff_s}")
            if diff_o:
                problems.append(f"  oracle-only: {diff_o}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
