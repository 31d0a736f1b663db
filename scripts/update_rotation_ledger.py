#!/usr/bin/env python
"""Maintain ROTATION_LEDGER.json — query → when it was last verified
under the driver harness (VERDICT r9 task 3: a committed coverage
ledger so no query silently goes rounds without re-verification).

Two freshness lanes per query:
- "any": the last round the query was green in ANY drive_contract
  artifact — the driver's own CORRECTNESS_r{N}.json, the committed
  full-registry runs (CORRECTNESS_local_full.json, sf0.01), or the
  rotation sample. The close asserts any-age <= MAX_AGE_ANY.
- "sampled": the rounds the query appeared green in a SAMPLED lane
  (driver head or seeded rotation) — the lanes that re-verify under
  externally-chosen subsets rather than the builder's own full sweep.
  `rotation_sample` picks the 50 least-recently-sampled queries
  (oldest-first), so the whole registry provably cycles every
  ceil(N/50) rounds; the close asserts sampled-age <= MAX_AGE_SAMPLED
  (with a first_seen grace for queries newer than one cycle).

Run AFTER the round's artifacts are regenerated (drive_rotation.py
calls it automatically). Idempotent: folding the same artifacts twice
is a no-op.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LEDGER = os.path.join(REPO, "ROTATION_LEDGER.json")
MAX_AGE_ANY = 2  # every query re-verified at least every other round
MAX_AGE_SAMPLED = 7  # full sampled-lane cycle: ceil(~330/50) + slack


def load_ledger() -> dict:
    if os.path.exists(LEDGER):
        with open(LEDGER, encoding="utf-8") as fh:
            return json.load(fh)
    return {"round": 0, "entries": {}}


def _driver_green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
    )


def fold(ledger: dict, names: set[str]) -> dict:
    """Fold every committed artifact into the ledger entries."""
    entries = ledger.setdefault("entries", {})

    def touch(q: str, rnd: int, sampled: bool) -> None:
        e = entries.setdefault(q, {"any": 0, "sampled": [], "first_seen": rnd})
        e["first_seen"] = min(e.get("first_seen", rnd), rnd)
        e["any"] = max(e.get("any", 0), rnd)
        if sampled and rnd not in e["sampled"]:
            e["sampled"] = sorted(e["sampled"] + [rnd])

    # driver's own per-round artifacts (sampled lane: alphabetical head)
    for f in os.listdir(REPO):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, f), encoding="utf-8") as fh:
            data = json.load(fh)
        for q, rec in data.items():
            if _driver_green(rec):
                touch(q, rnd, sampled=True)

    # committed rotation artifact (sampled lane)
    rot = os.path.join(REPO, "CORRECTNESS_local_rot.json")
    if os.path.exists(rot):
        with open(rot, encoding="utf-8") as fh:
            data = json.load(fh)
        rnd = data.get("round")
        if isinstance(rnd, int):
            for q, rec in data.get("results", {}).items():
                if rec.get("ok"):
                    touch(q, rnd, sampled=True)

    # committed full-registry run at the CURRENT round ("any" lane only)
    from round_close_check import current_round

    full = os.path.join(REPO, "CORRECTNESS_local_full.json")
    if os.path.exists(full):
        with open(full, encoding="utf-8") as fh:
            data = json.load(fh)
        for q, rec in data.get("results", data).items():
            if rec.get("ok"):
                touch(q, current_round(), sampled=False)

    # prune queries that left the registry
    for q in sorted(set(entries) - names):
        del entries[q]
    ledger["round"] = current_round()
    return ledger


def main() -> int:
    import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    ledger = fold(load_ledger(), set(REGISTRY))
    with open(LEDGER, "w", encoding="utf-8") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
    ages = {
        q: ledger["round"] - e.get("any", 0) for q, e in ledger["entries"].items()
    }
    print(
        json.dumps(
            {
                "written": "ROTATION_LEDGER.json",
                "round": ledger["round"],
                "queries": len(ledger["entries"]),
                "max_any_age": max(ages.values(), default=0),
                "never_sampled": sum(
                    1 for e in ledger["entries"].values() if not e["sampled"]
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
