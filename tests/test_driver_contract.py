"""Invariants of the driver-facing contract surface: the 50-query
correctness window rotation, oracle coverage, and alias parity
conventions that CORRECTNESS_r{N} depends on."""

from __future__ import annotations

from kafka_streams_pipeline_spark import inventory


def test_driver_order_covers_every_query_once():
    order = inventory.driver_order()
    assert sorted(order) == sorted(inventory.QUERIES)
    assert len(order) == len(set(order))


def test_driver_window_prioritizes_uncertified_queries():
    """The first 50 slots (the driver's correctness window) must hold
    exactly the round-2 never-checked queries plus q_daily_rollup (the
    twice-red fix proof); previously certified names stay behind them.
    New queries belong in _ON_DECK, NOT at the front — otherwise they
    silently displace the rotation targets."""
    order = inventory.driver_order()
    window = set(order[:50])
    assert "q_daily_rollup" in window
    assert not (window - {"q_daily_rollup"}) & set(inventory.DRIVER_CERTIFIED)
    # every registered query is accounted for by exactly one bucket
    buckets = (
        set(inventory.DRIVER_CERTIFIED)
        | set(inventory._ROUND2_RED)
        | set(inventory._ON_DECK)
    )
    head = [n for n in inventory.QUERIES if n not in buckets]
    assert order == head + inventory._ROUND2_RED + inventory._ON_DECK + (
        inventory.DRIVER_CERTIFIED
    )
    # on-deck names must be real queries
    assert set(inventory._ON_DECK) <= set(inventory.QUERIES)


def test_every_query_has_an_oracle():
    missing = set(inventory.QUERIES) - set(inventory.ORACLES)
    assert not missing, f"rows-only queries (weaker driver check): {missing}"


def test_bench_queries_are_registered():
    assert set(inventory.BENCH_QUERIES) <= set(inventory.QUERIES)
