"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the exchange from the join plan entirely — the 100 TB answer
for repeated fact⋈fact joins too big to broadcast (README §Design).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from kafka_streams_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(wh / "orders_bucketed"))
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(wh / "customer_bucketed"))
        .mode("overwrite")
        .saveAsTable("customer_bucketed")
    )
    yield spark.table("orders_bucketed"), spark.table("customer_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    ob, cb = bucketed
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.count(F.lit(1)).alias("n"))
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # bucket layout satisfies the join's distribution on BOTH
        # sides: in the plan TREE, nothing below the join is an
        # exchange (the aggregate above it may still shuffle)
        tree = plan.split("\n\n")[0]
        below_join = tree[tree.index("SortMergeJoin") :]
        assert "Exchange" not in below_join, plan
        assert plan.count("Bucketed: true") == 2
        # and the result matches the plain join
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        want = {
            r["c_mktsegment"]: r["n"]
            for r in o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {r["c_mktsegment"]: r["n"] for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
