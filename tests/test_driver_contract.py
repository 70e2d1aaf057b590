"""Invariants of the driver-facing contract surface: the 50-query
correctness window rotation, oracle coverage, and alias parity
conventions that CORRECTNESS_r{N} depends on."""

from __future__ import annotations

from kafka_streams_pipeline_spark import inventory

WINDOW = 50


def test_driver_order_covers_every_query_once():
    order = inventory.driver_order()
    assert sorted(order) == sorted(inventory.QUERIES)
    assert len(order) == len(set(order))


def test_driver_window_prioritizes_uncertified_queries():
    """Generalized invariant (VERDICT r3 item 1): the window prefix
    must contain EVERY query lacking a green driver row — unlisted
    new registrations, the red backlog, the pending round-3 batch,
    and on-deck additions — before any already-certified name. If
    the uncertified population ever exceeds the window, the overflow
    must be exactly the newest on-deck tail (never an older query)."""
    order = inventory.driver_order()
    buckets = (
        set(inventory.DRIVER_CERTIFIED)
        | set(inventory._UNCERTIFIED_RED)
        | set(inventory._PENDING)
        | set(inventory._ON_DECK)
    )
    head = [n for n in inventory.QUERIES if n not in buckets]
    uncertified = (
        head
        + inventory._UNCERTIFIED_RED
        + inventory._PENDING
        + inventory._ON_DECK
    )
    assert order[: len(uncertified)] == uncertified
    window = set(order[:WINDOW])
    if len(uncertified) <= WINDOW:
        assert set(uncertified) <= window
        # spare slots re-certify the OLDEST certified evidence first
        spare = WINDOW - len(uncertified)
        assert order[len(uncertified) : WINDOW] == (
            inventory.DRIVER_CERTIFIED[:spare]
        )
    else:
        overflow = set(uncertified) - window
        assert overflow <= set(inventory._ON_DECK)


def test_certified_lists_are_registered_and_disjoint():
    reg = set(inventory.QUERIES)
    for bucket in (
        inventory.DRIVER_CERTIFIED,
        inventory._UNCERTIFIED_RED,
        inventory._PENDING,
        inventory._ON_DECK,
    ):
        assert set(bucket) <= reg
        assert len(bucket) == len(set(bucket))
    assert not set(inventory.DRIVER_CERTIFIED) & (
        set(inventory._UNCERTIFIED_RED)
        | set(inventory._PENDING)
        | set(inventory._ON_DECK)
    )


def test_every_query_has_an_oracle():
    missing = set(inventory.QUERIES) - set(inventory.ORACLES)
    assert not missing, f"rows-only queries (weaker driver check): {missing}"


def test_bench_queries_are_registered():
    assert set(inventory.BENCH_QUERIES) <= set(inventory.QUERIES)
