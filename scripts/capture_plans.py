#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file becomes plans/<round>/<query>_<suffix>.txt)
  with no query names, captures the headline set.
  Round dir defaults to r13; override with $SPARK_GRAFT_PLANS_ROUND.

Every capture is stamped with the git SHA of HEAD at capture time
(VERDICT r12 item 8: before/after provenance must be self-evident —
r12 shipped a "before" plan that was actually captured post-change).

Planning only — no job execution — so it is safe to run while other
Spark work is in flight.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or sorted(
        n for n, s in REGISTRY.items() if s.headline
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    out_dir = os.path.join(repo, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    sha = subprocess.run(
        ["git", "-C", repo, "rev-parse", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    spark = get_spark(app_name=f"capture_plans_{suffix}")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- captured at git SHA {sha} ({suffix})\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
