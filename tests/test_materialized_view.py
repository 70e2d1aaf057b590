"""Materialized-view persistence + the pruning contract: the same
query family over a written view must (a) return identical results
and (b) actually partition-prune on the time predicates.
"""

from __future__ import annotations

import datetime as dt
import io
import os

import pytest
from contextlib import redirect_stdout

from kafka_streams_pipeline_spark.operators import build_view, history, snapshot
from kafka_streams_pipeline_spark.sources.readings import readings_from_events
from kafka_streams_pipeline_spark.sources.sinks import (
    read_view,
    to_kafka_records,
    write_view,
)
from kafka_streams_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def mat_view(spark, sf_dir, tmp_path_factory):
    events = load_table(spark, sf_dir, "events")
    view = build_view(readings_from_events(events))
    view_dir = str(tmp_path_factory.mktemp("mat") / "view")
    write_view(view, view_dir)
    return view, read_view(spark, view_dir), view_dir


def test_materialized_equals_inmemory(mat_view):
    view, mat, _ = mat_view
    args = ("avg", ["u155"], dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 12))
    a = history(view, *args).collect()
    b = history(mat, *args).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_history_partition_prunes(mat_view, spark):
    _, mat, view_dir = mat_view
    n_parts = len([d for d in os.listdir(view_dir) if d.startswith("ws_date=")])
    assert n_parts > 20  # one per day of January
    df = history(
        mat, "count", ["u155"], dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 7)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the scan must carry ws_date partition filters...
    assert "ws_date" in plan and "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    assert "ws_date" in plan[start : plan.index("]", start)]
    # ...and the result is still correct (3 calendar days)
    rows = df.collect()
    days = {
        (dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=r["timestamp"])).day
        for r in rows
    }
    assert days <= {5, 6, 7}


def test_snapshot_on_materialized(mat_view):
    view, mat, _ = mat_view
    from kafka_streams_pipeline_spark import geo

    s, w, n, e = geo.decode_bbox("u155")
    args = ("count", dt.datetime(2024, 1, 7, 10, 30), (n, w, s, e))
    a = snapshot(view, *args).collect()
    b = snapshot(mat, *args).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(b) > 0


def test_kafka_record_encode(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    readings = readings_from_events(events)
    rec = to_kafka_records(readings).limit(5).collect()
    import json

    for r in rec:
        assert r["key"].startswith("s")
        payload = json.loads(r["value"])
        assert set(payload) == {"timestamp", "sensorId", "geohash", "tempVal", "tempUnit"}
        assert payload["sensorId"] == r["key"]
        assert payload["tempUnit"] == "c"
