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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def current_round() -> int:
    """The in-progress round = highest driver-recorded CORRECTNESS_r{N}
    artifact + 1 (the driver writes r{N} AFTER round N closes)."""
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    return max(rounds, default=0) + 1


def rotation_sample(names, round_no: int, k: int = 50) -> list[str]:
    """This round's 50-query rotation: the LEAST-RECENTLY-SAMPLED
    queries first (VERDICT r9 task 3 — the r9 seeded-random sample gave
    no coverage bound; oldest-first provably cycles the whole registry
    every ceil(N/50) rounds). Recency comes from ROTATION_LEDGER.json's
    sampled-lane history restricted to rounds BEFORE `round_no` (so the
    expected sample is reconstructable after the ledger has been
    updated with this round's results); ties break by name. Queries
    with no ledger entry (brand-new) sort first."""
    from update_rotation_ledger import MAX_AGE_SAMPLED, load_ledger

    entries = load_ledger().get("entries", {})

    def last_sampled(q: str) -> int:
        prior = [
            r for r in entries.get(q, {}).get("sampled", []) if r < round_no
        ]
        return max(prior, default=0)

    def at_risk(q: str) -> bool:
        # would violate the sampled-age bound at THIS round's close
        e = entries.get(q, {})
        return (
            last_sampled(q) < round_no - MAX_AGE_SAMPLED
            and e.get("first_seen", round_no) < round_no - MAX_AGE_SAMPLED
        )

    ranked = sorted(names, key=lambda q: (not at_risk(q), last_sampled(q), q))
    n = max(min(k, len(names)), sum(1 for q in names if at_risk(q)))
    return sorted(ranked[:n])


def check_rotation() -> list[str]:
    """CORRECTNESS_local_rot.json must exist, cover EXACTLY this round's
    seeded sample, and be all-green. Produce it with
    `python scripts/drive_rotation.py`."""
    import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    problems: list[str] = []
    path = os.path.join(REPO, "CORRECTNESS_local_rot.json")
    if not os.path.exists(path):
        return ["CORRECTNESS_local_rot.json missing — run scripts/drive_rotation.py"]
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    rnd = data.get("round")
    expected = set(rotation_sample(set(REGISTRY), current_round()))
    if rnd != current_round():
        problems.append(
            f"rotation artifact is for round {rnd}, current round is "
            f"{current_round()} — re-run scripts/drive_rotation.py"
        )
    results = data.get("results", {})
    got = set(results)
    if got != expected:
        missing = sorted(expected - got)
        extra = sorted(got - expected)
        problems.append(
            f"rotation artifact sample mismatch (missing {missing[:5]}..., "
            f"extra {extra[:5]}...)"
            if missing or extra
            else ""
        )
    bad = sorted(n for n, r in results.items() if not r.get("ok"))
    if bad:
        problems.append(f"CORRECTNESS_local_rot.json: failing entries: {bad}")
    return [p for p in problems if p]


def check_ledger() -> list[str]:
    """ROTATION_LEDGER.json (VERDICT r9 task 3) must be current and
    prove coverage: every registry query verified green within
    MAX_AGE_ANY rounds in ANY drive_contract artifact, and within
    MAX_AGE_SAMPLED rounds in a SAMPLED lane (driver head / rotation),
    with a first_seen grace shorter than one sampled cycle."""
    import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
    from update_rotation_ledger import (
        MAX_AGE_ANY,
        MAX_AGE_SAMPLED,
        load_ledger,
    )

    problems: list[str] = []
    ledger = load_ledger()
    rnd = current_round()
    if ledger.get("round") != rnd:
        return [
            f"ROTATION_LEDGER.json is for round {ledger.get('round')}, "
            f"current is {rnd} — run scripts/update_rotation_ledger.py"
        ]
    entries = ledger.get("entries", {})
    names = set(REGISTRY)
    missing = sorted(names - set(entries))
    if missing:
        problems.append(f"ledger missing registry queries: {missing[:5]}...")
    stale_any = sorted(
        q
        for q in names & set(entries)
        if rnd - entries[q].get("any", 0) > MAX_AGE_ANY
    )
    if stale_any:
        problems.append(
            f"queries unverified for >{MAX_AGE_ANY} rounds (any lane): "
            f"{stale_any[:10]}..."
        )
    stale_sampled = sorted(
        q
        for q in names & set(entries)
        if max(entries[q].get("sampled", []), default=0)
        < rnd - MAX_AGE_SAMPLED
        and entries[q].get("first_seen", rnd) < rnd - MAX_AGE_SAMPLED
    )
    if stale_sampled:
        problems.append(
            f"queries not sampled (driver head/rotation) for "
            f">{MAX_AGE_SAMPLED} rounds: {stale_sampled[:10]}..."
        )
    return problems


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


# Heavy-family tag selection (VERDICT r10 task 6): the dedup / ANN /
# media / textstats operators whose semantics can be scale-dependent
# (tie handling under bigger groups, overflow paths, approx-op bands) —
# these additionally get an exact-oracle drive at SF=1
# (scaledata/sf1), recorded as CORRECTNESS_local_sf1_heavy.json.
_HEAVY_TAG_PREFIXES = (
    "dedup", "similarity", "text", "corpus", "quality-gate",
    "training-prep", "sketch",
)
_HEAVY_TAGS = {
    "multimodal", "image", "audio", "video", "perceptual", "codec",
    "incremental",
}


def heavy_names() -> set[str]:
    import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    return {
        n
        for n, s in REGISTRY.items()
        if any(
            t in _HEAVY_TAGS or t.startswith(_HEAVY_TAG_PREFIXES)
            for t in s.tags
        )
    }


def check_sf1_heavy() -> list[str]:
    """CORRECTNESS_local_sf1_heavy.json must exist, cover exactly the
    heavy-family tag selection, and be all-green. Produce it with:
    SF=1 SF_DIR=<repo>/scaledata/sf1 OUT=CORRECTNESS_local_sf1_heavy.json
    ONLY=<heavy names> python scripts/drive_contract.py"""
    problems: list[str] = []
    path = os.path.join(REPO, "CORRECTNESS_local_sf1_heavy.json")
    if not os.path.exists(path):
        return [
            "CORRECTNESS_local_sf1_heavy.json missing — drive the heavy "
            "families at SF=1 (see check_sf1_heavy docstring)"
        ]
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    data = data.get("results", data)
    expected = heavy_names()
    got = set(data)
    missing = sorted(expected - got)
    stale = sorted(got - expected)
    if missing:
        problems.append(
            f"CORRECTNESS_local_sf1_heavy.json: heavy queries absent: "
            f"{missing[:10]}..."
        )
    if stale:
        problems.append(
            f"CORRECTNESS_local_sf1_heavy.json: entries not in the heavy "
            f"selection: {stale[:10]}..."
        )
    bad = sorted(n for n, r in data.items() if not r.get("ok"))
    if bad:
        problems.append(
            f"CORRECTNESS_local_sf1_heavy.json: failing entries: {bad}"
        )
    return problems


# Paths whose commits invalidate a recorded suite run. tests/ is the
# point of the r7 amendment (VERDICT r7 'What's wrong' #2: test-only
# commits landed after the last suite run); engine code and the driver
# surface were always in scope.
_SUITE_SCOPE = (
    "tests",
    "financial_arbitrage_data_pipeline_spark",
    "scripts",
    "__spark_entry__.py",
    "bench.py",
    "conftest.py",
)


def check_suite_freshness() -> list[str]:
    """The recorded full-suite run (SUITE_RUN.json, written by
    scripts/run_suite.py) must be green and must POSTDATE the last
    commit touching ANY suite-scoped path — including tests/ — and
    those paths must be clean in the working tree. Standalone-only
    (not wired into pytest): the suite run being recorded is by
    definition in flight while pytest executes this module's sibling
    checks."""
    import subprocess

    problems: list[str] = []
    path = os.path.join(REPO, "SUITE_RUN.json")
    if not os.path.exists(path):
        return ["SUITE_RUN.json missing — run scripts/run_suite.py"]
    with open(path, encoding="utf-8") as f:
        run = json.load(f)
    if run.get("exit_code") != 0:
        problems.append(
            f"recorded suite run is RED (exit {run.get('exit_code')}: "
            f"{run.get('summary')})"
        )
    last_commit_ts = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", *_SUITE_SCOPE],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    if last_commit_ts and float(last_commit_ts) > float(run.get("ts", 0)):
        problems.append(
            "a commit touching suite-scoped paths (tests/engine/scripts) "
            "postdates the recorded suite run — re-run scripts/run_suite.py"
        )
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", *_SUITE_SCOPE],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    if dirty:
        problems.append(
            "suite-scoped paths have uncommitted changes not covered by "
            f"the recorded run:\n{dirty}"
        )
    return problems


def main() -> int:
    problems = (
        check()
        + check_rotation()
        + check_ledger()
        + check_sf1_heavy()
        + check_suite_freshness()
    )
    if problems:
        for p in problems:
            print(f"FAIL  {p}")
        return 1
    print(
        "round-close check: OK (registry, COVERAGE.md, artifacts, and "
        "recorded suite run all agree)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
