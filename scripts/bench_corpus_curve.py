#!/usr/bin/env python
"""Scaling curve for the corpus-preparation family: time the decision
operators (quality gate, dedup accounting, duplicate spans, global
shuffle + manifest, BPE training, semantic contamination) at sf0.1 and
the key-shifted sf0.3 / sf1 upscales (scripts/gen_scale_data.py), and
write BENCH_corpus_curve.json. Companion to BENCH_scale_curve.json
(headline queries); same harness discipline: best-of-N wall per query,
cold inputs, one JVM warmup action.

Usage: python scripts/bench_corpus_curve.py [--repeat N] [dir ...]
  default dirs: /root/testdata/sf0.1 /root/repo/scaledata/sf0.3
                /root/repo/scaledata/sf1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark

CURVE_QUERIES = [
    "corpus_quality_gate",
    "dedup_keep_canonical",
    "ngram_duplicate_spans",
    "global_shuffle_order",
    "shard_manifest",
    "bpe_train_merges",
    "semantic_contamination",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "dirs",
        nargs="*",
        default=[
            "/root/testdata/sf0.1",
            "/root/repo/scaledata/sf0.3",
            "/root/repo/scaledata/sf1",
        ],
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-corpus-curve")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    runs: dict[str, dict] = {}
    for sf_dir in args.dirs:
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        timings: dict[str, float] = {}
        for name in CURVE_QUERIES:
            spec = REGISTRY[name]
            best = None
            for _ in range(max(1, args.repeat)):
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 4)
            print(f"  {label:6s} {name}: {timings[name]}s", flush=True)
        runs[label] = {
            "total_wall": round(sum(timings.values()), 4),
            "queries": timings,
        }

    out = {
        "metric": "corpus_prep_family_wall_by_sf",
        "unit": "sec",
        "harness": f"best-of-{args.repeat} per query, cold inputs",
        "runs": runs,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_corpus_curve.json",
    )
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
