#!/usr/bin/env python
"""Regenerate BENCH_scale_curve.json: run bench.py at sf0.1 (driver
testdata) plus the key-shifted sf0.3 / sf1 replicas in scaledata/, and
assemble the per-query scaling ratios. Each SF runs in a FRESH process
so no JVM/page-cache state leaks between scale points.

Usage: python scripts/bench_scale_curve.py [--repeat N] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf0.3": os.path.join(ROOT, "scaledata", "sf0.3"),
    "sf1.0": os.path.join(ROOT, "scaledata", "sf1"),
    "sf3.0": os.path.join(ROOT, "scaledata", "sf3"),
    # round 8 (VERDICT r7 task 2): the literal 100x point — 100
    # key-shifted copies of the bench SF, ~2 GB parquet / 60M lineitem
    "sf10": os.path.join(ROOT, "scaledata", "sf10"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--out", default=os.path.join(ROOT, "BENCH_scale_curve.json")
    )
    args = ap.parse_args()

    runs = {}
    for label, sf_dir in SF_DIRS.items():
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} absent", file=sys.stderr)
            continue
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py"),
             "--repeat", str(args.repeat)],
            env=env, capture_output=True, text=True, check=True,
        )
        runs[label] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"{label}: {runs[label]['value']} s "
              f"(normalized {runs[label]['value_normalized']} s, "
              f"machine_factor {runs[label]['machine_factor']})",
              file=sys.stderr)

    lo, hi = runs.get("sf0.1"), runs.get("sf1.0")
    hi3 = runs.get("sf3.0")
    hi10 = runs.get("sf10")
    ratios = {}
    ratios3 = {}
    ratios10 = {}
    if lo and hi:
        ratios = {
            q: round(hi["queries"][q] / max(lo["queries"][q], 1e-9), 2)
            for q in lo["queries"]
        }
    if lo and hi3:
        ratios3 = {
            q: round(hi3["queries"][q] / max(lo["queries"][q], 1e-9), 2)
            for q in lo["queries"]
        }
    if lo and hi10:
        ratios10 = {
            q: round(hi10["queries"][q] / max(lo["queries"][q], 1e-9), 2)
            for q in lo["queries"]
        }
    doc = {
        "generated_by": (
            "scripts/bench_scale_curve.py (sf0.3/sf1/sf3/sf10 = "
            "3/10/30/100 key-shifted copies of the driver's sf0.1, via "
            "scripts/gen_scale_data.py)"
        ),
        "harness": (
            f"python bench.py --repeat {args.repeat} (best-of-N with "
            "adaptive extra runs while MAD > 20% of median, "
            "median+MAD in query_spreads; Arrow toPandas result "
            "materialization, fresh process per SF; calib_* fields "
            "measure the machine)"
        ),
        "runs": runs,
        "ratios_sf1_over_sf0.1": ratios,
        "ratios_sf3_over_sf0.1": ratios3,
        "ratios_sf10_over_sf0.1": ratios10,
        "total_wall_ratio_sf1_over_sf0.1": (
            round(hi["value"] / lo["value"], 2) if lo and hi else None
        ),
        "total_wall_ratio_sf3_over_sf0.1": (
            round(hi3["value"] / lo["value"], 2) if lo and hi3 else None
        ),
        "total_wall_ratio_sf10_over_sf0.1": (
            round(hi10["value"] / lo["value"], 2) if lo and hi10 else None
        ),
        "ingest_rows_per_sec": {
            k: v.get("ingest_rows_per_sec") for k, v in runs.items()
        },
        "scan_rows_per_sec": {
            k: v.get("scan_rows_per_sec") for k, v in runs.items()
        },
    }
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
