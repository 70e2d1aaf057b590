"""Rotation bookkeeping assistant for the driver-certification window.

Every round, the driver checks the FIRST 50 entries of
``inventory.driver_order()`` and records green/red rows in
``CORRECTNESS_r{N}.json``. Keeping the rotation lists
(`DRIVER_CERTIFIED` tiers, `_RECHECK`, `_DEFERRED`, backlogs) in sync
with that evidence has been the top bookkeeping failure mode across
rounds (VERDICT r2-r4 each flagged a variant). This tool derives the
ground truth from the recorded evidence and prints:

  1. per-query latest green round (and any reds),
  2. queries whose bucket disagrees with the evidence
     (certified-but-never-green, uncertified-but-green),
  3. the exact promotion edit for the next round: which names the
     just-recorded round certified (in window order), which deferred
     names should move to _ON_DECK, and the resulting stalest-first
     window preview.

Read-only: it prints lists to paste, never edits the inventory package (rotation lists live in kafka_streams_pipeline_spark/inventory/rotation.py).

Usage:
    python tools/rotate.py            # report against latest round
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_pipeline_spark import inventory  # noqa: E402

WINDOW = 50


def load_rounds(repo: str) -> dict[int, dict]:
    out: dict[int, dict] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(rec, dict):
            out[int(m.group(1))] = rec
    return out


def row_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = load_rounds(repo)
    if not rounds:
        print("no CORRECTNESS_r*.json found")
        return
    latest = max(rounds)
    evidence: dict[str, int] = {}  # name -> latest green round
    reds: dict[str, int] = {}  # name -> latest red round
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            if row_green(row):
                evidence[name] = rnd
            else:
                reds[name] = rnd
    latest_reds = sorted(
        n for n, r in reds.items() if r == latest and evidence.get(n, -1) < latest
    )

    certified = set(inventory.DRIVER_CERTIFIED)
    registered = set(inventory.QUERIES)

    print(f"rounds on disk: {sorted(rounds)}   latest: r{latest}")
    print(f"registered queries: {len(registered)}")
    print(f"queries with any green evidence: {len(evidence)}")
    if latest_reds:
        print(f"\n!! RED in r{latest} (fix before promoting): {latest_reds}")

    never_green_certified = sorted(certified - set(evidence))
    if never_green_certified:
        print(f"\n!! certified but NO green row on disk: {never_green_certified}")
    green_uncertified = sorted(
        set(evidence)
        - certified
        - set(inventory._UNCERTIFIED_RED)
        - set(inventory._PENDING)
        - set(inventory._ON_DECK)
        - set(inventory._RECHECK)
        - set(inventory._DEFERRED)
    )
    if green_uncertified:
        print(f"\n!! green evidence but in no bucket: {green_uncertified}")

    window_now = inventory.driver_order()[:WINDOW]
    newly = [n for n in window_now if evidence.get(n) == latest]
    print(f"\n-- r{latest} window results --")
    print(f"window head ({len(window_now)}): first 5 {window_now[:5]}")
    print(f"green in r{latest} from window: {len(newly)}")
    if newly:
        print("promotion list (window order) — append to the newest certified")
        print("tier and remove from _RECHECK/backlogs:")
        for n in newly:
            print(f'    "{n}",')
    deferred = list(inventory._DEFERRED)
    if deferred:
        print("\n_DEFERRED -> _ON_DECK for the next round:")
        for n in deferred:
            print(f'    "{n}",')

    stale = sorted(
        ((evidence.get(n, -1), n) for n in certified),
        key=lambda t: (t[0], inventory.DRIVER_CERTIFIED.index(t[1])),
    )
    print("\nstalest certified evidence (next window's re-cert tail):")
    for rnd, n in stale[:10]:
        print(f"    r{rnd}  {n}")

    # VERDICT r15 item 2: the certified column must never lag a
    # round's landed artifact — regenerate REGISTRY.md (evidence-
    # derived since r16) whenever the rotation report runs.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gen_registry  # noqa: E402

    out = os.path.join(repo, "REGISTRY.md")
    with open(out, "w") as f:
        f.write(gen_registry.render())
    print(f"\nregenerated {out} from evidence artifacts")


if __name__ == "__main__":
    main()
