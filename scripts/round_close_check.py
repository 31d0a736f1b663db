#!/usr/bin/env python
"""Round-close guard: the end-of-round snapshot commit must be
EVIDENCE-ONLY — no operator may land after the last full suite run and
artifact regeneration. This script re-runs, without Spark, the exact
invariants that can silently drift when code lands late:

  1. every registry query appears in COVERAGE.md (the judge-facing
     inventory cannot trail the code);
  2. the committed correctness artifacts (CORRECTNESS_local_full.json at
     sf0.01 and CORRECTNESS_local_sf01.json at sf0.1) cover exactly the
     registry — same names, no missing, no stale extras — and every
     entry passed;
  3. COVERAGE.md's stated query count equals len(REGISTRY).

Run it as the FINAL command before the snapshot commit (and it is wired
into pytest via tests/test_round_close.py so a red state also fails the
suite). Exit code 0 = safe to commit.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def check() -> list[str]:
    import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401  (populates REGISTRY)
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    problems: list[str] = []
    names = set(REGISTRY)

    with open(os.path.join(REPO, "COVERAGE.md"), encoding="utf-8") as f:
        cov = f.read()
    missing_cov = sorted(n for n in names if n not in cov)
    if missing_cov:
        problems.append(f"COVERAGE.md missing queries: {missing_cov}")
    m = re.search(r"(\d+) as\s+of round", cov)
    if m and int(m.group(1)) != len(names):
        problems.append(
            f"COVERAGE.md states {m.group(1)} queries; registry has {len(names)}"
        )

    for art in ("CORRECTNESS_local_full.json", "CORRECTNESS_local_sf01.json"):
        path = os.path.join(REPO, art)
        if not os.path.exists(path):
            problems.append(f"{art}: artifact missing")
            continue
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        data = data.get("results", data)
        got = set(data)
        if got != names:
            missing = sorted(names - got)
            stale = sorted(got - names)
            if missing:
                problems.append(f"{art}: registry queries absent: {missing}")
            if stale:
                problems.append(f"{art}: stale entries not in registry: {stale}")
        bad = sorted(n for n, r in data.items() if not r.get("ok"))
        if bad:
            problems.append(f"{art}: failing entries: {bad}")
    return problems


def main() -> int:
    problems = check()
    if problems:
        for p in problems:
            print(f"FAIL  {p}")
        return 1
    print("round-close check: OK (registry, COVERAGE.md, artifacts all agree)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
