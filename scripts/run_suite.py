#!/usr/bin/env python
"""Run the full pytest suite and RECORD the run (VERDICT r7 task 8).

Writes SUITE_RUN.json {ts, git_head, exit_code, summary} so
`round_close_check.py` can assert that no commit touching tests/ or
engine code landed AFTER the last recorded green suite run — closing the
r7 process nit where evidence/test-only commits could land post-close
without the suite ever executing them.

Usage: python scripts/run_suite.py [extra pytest args]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:] or ["-q"]
    # Record ts = the run's START and capture HEAD BEFORE launching
    # pytest (ADVICE r8): a commit landing while the ~20-min suite runs
    # must read as NEWER than this run — the committed code was never in
    # the tested tree — and the snapshot must name the tree that was
    # actually tested.
    t0 = time.time()
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-2000:])
    summary = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    with open(os.path.join(REPO, "SUITE_RUN.json"), "w", encoding="utf-8") as f:
        json.dump(
            {
                "ts": t0,
                "wall_s": round(time.time() - t0, 1),
                "git_head": head,
                "exit_code": proc.returncode,
                "summary": summary,
            },
            f,
            indent=1,
        )
    print(f"\nsuite recorded: exit={proc.returncode} [{summary}]")
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
