#!/usr/bin/env python
"""Profile headline queries (guide §1): per-query wall + process-tree CPU
under (a) the bench's toPandas methodology and (b) the noop sink, so
driver-transfer cost and compute cost are separated. Planning/derived
costs (first-build vs warm) are also split out.

Usage: python scripts/profile_headline.py [query ...]  (default: headline set)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPEAT (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark

from bench import _proc_tree_cpu_sec  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or sorted(
        n for n, s in REGISTRY.items() if s.headline
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("REPEAT", "3"))
    spark = get_spark(app_name="profile_headline")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        rec: dict[str, float] = {}
        # build time (logical plan construction, python-side)
        t0 = time.perf_counter()
        df = REGISTRY[name].builder(spark, sf_dir)
        rec["build_sec"] = round(time.perf_counter() - t0, 4)

        for mode in ("noop", "topandas"):
            walls, cpus = [], []
            for _ in range(repeat):
                df = REGISTRY[name].builder(spark, sf_dir)
                spark.sparkContext.setJobDescription(f"{name}:{mode}")
                c0 = _proc_tree_cpu_sec()
                t0 = time.perf_counter()
                if mode == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.toPandas()
                walls.append(time.perf_counter() - t0)
                cpus.append(_proc_tree_cpu_sec() - c0)
                spark.sparkContext.setJobDescription(None)
            rec[f"{mode}_wall_min"] = round(min(walls), 4)
            rec[f"{mode}_wall_med"] = round(sorted(walls)[len(walls) // 2], 4)
            rec[f"{mode}_cpu_med"] = round(sorted(cpus)[len(cpus) // 2], 4)
        out[name] = rec
        print(name, json.dumps(rec), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
