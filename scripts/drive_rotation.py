#!/usr/bin/env python
"""Drive THIS round's rotating seeded 50-query sample under the exact
driver harness (scripts/drive_contract.py) and record
CORRECTNESS_local_rot.json (VERDICT r9 task 8).

The grading driver only ever re-verifies the alphabetical head of the
registry (a-d, 50 of ~320); this rotation re-runs a different seeded
sample each round (seed = round number), so over rounds every query is
periodically re-verified under the unmodified driver harness, not only
pytest parity. `round_close_check.py` asserts the artifact exists, is
for the current round, covers exactly the seeded sample, and is green.

Usage: python scripts/drive_rotation.py   (SF env honored, default 0.01)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from round_close_check import current_round, rotation_sample  # noqa: E402


def main() -> int:
    import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    rnd = current_round()
    sample = rotation_sample(set(REGISTRY), rnd)
    print(f"round {rnd}: driving {len(sample)} rotation queries")
    out = os.path.join(REPO, "CORRECTNESS_local_rot.json")
    env = dict(os.environ, ONLY=",".join(sample), OUT=out)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "drive_contract.py")],
        env=env,
        cwd=REPO,
    ).returncode
    if os.path.exists(out):
        with open(out, encoding="utf-8") as f:
            data = json.load(f)
        data["round"] = rnd
        data["sample"] = sample
        with open(out, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=1, sort_keys=True)
    if rc == 0:
        # fold this round's artifacts into the coverage ledger
        # (VERDICT r9 task 3); sampling recency only counts rounds
        # < current, so the expected sample stays reconstructable
        from update_rotation_ledger import main as update_ledger

        update_ledger()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
