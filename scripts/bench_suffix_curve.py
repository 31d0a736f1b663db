#!/usr/bin/env python
"""Scale curve for the suffix-array substring-dedup family (round 8:
extends the one-off §18 measurement to a committed harness + the sf10
point): time `suffix_array_fingerprint` and `longest_repeated_substring`
per scale dir, median of REPEATS runs, fresh in-session cache state per
run (the operators manage their own DISK_ONLY round-state — SCALE.md
§18).

Usage: python scripts/bench_suffix_curve.py [--repeat N] [dir ...]
Output: BENCH_suffix_curve.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark

CURVE_QUERIES = ["suffix_array_fingerprint", "longest_repeated_substring"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "dirs",
        nargs="*",
        default=[
            "/root/testdata/sf0.1",
            "/root/repo/scaledata/sf1",
            "/root/repo/scaledata/sf3",
            "/root/repo/scaledata/sf10",
        ],
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-suffix-curve")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    runs: dict[str, dict] = {}
    for sf_dir in args.dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip absent {sf_dir}", flush=True)
            continue
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        timings: dict[str, dict] = {}
        for name in CURVE_QUERIES:
            spec = REGISTRY[name]
            walls = []
            for _ in range(max(1, args.repeat)):
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            med = statistics.median(walls)
            timings[name] = {
                "best": round(min(walls), 2),
                "median": round(med, 2),
                "n": len(walls),
            }
            print(f"  {label:6s} {name}: {timings[name]}", flush=True)
        runs[label] = timings

    labels = list(runs)
    ratios = {}
    if len(labels) >= 2:
        lo, hi = runs[labels[0]], runs[labels[-1]]
        ratios = {
            q: round(hi[q]["median"] / max(lo[q]["median"], 1e-9), 2)
            for q in CURVE_QUERIES
        }
    out = {
        "metric": "suffix_family_wall_by_sf",
        "unit": "sec",
        "harness": (
            f"median of {args.repeat} runs per query (Arrow toPandas, "
            "cache cleared between runs; DISK_ONLY round-state "
            "discipline inside the operator — SCALE.md §18)"
        ),
        "runs": runs,
        f"ratios_{labels[-1]}_over_{labels[0]}" if labels else "ratios": ratios,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_suffix_curve.json",
    )
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
