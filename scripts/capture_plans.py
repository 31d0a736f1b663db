#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file becomes plans/r12/<query>_<suffix>.txt)
  with no query names, captures the headline set.

Planning only — no job execution — so it is safe to run while other
Spark work is in flight.
"""

from __future__ import annotations

import os
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
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{suffix}")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
