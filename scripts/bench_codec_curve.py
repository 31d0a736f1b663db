#!/usr/bin/env python
"""Scaling curve for the round-5 codec/ranking/graph additions:
time each query at sf0.1 (testdata) and sf1 (scaledata, 10x docs/rows)
and emit one JSON artifact. Mirrors scripts/bench_corpus_curve.py.

Usage: python scripts/bench_codec_curve.py [out.json]
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

QUERIES = [
    "jpeg_coeff_stats",
    "audio_ulaw_stats",
    "video_delta_stats",
    "bm25_topdocs",
    "bigram_kn_lm",
    "fuzzy_name_match",
    "kmv_buyers_overlap",
    "dup_graph_pagerank",
]

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/scaledata/sf1",
}

REPEAT = 2


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_codec_curve.json"
    spark = get_spark(app_name="bench-codec-curve")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    result: dict[str, dict[str, float]] = {}
    for tier, sf_dir in TIERS.items():
        if not os.path.isdir(sf_dir):
            print(f"skip {tier}: {sf_dir} absent")
            continue
        tier_times: dict[str, float] = {}
        for name in QUERIES:
            best = None
            for _ in range(REPEAT):
                t0 = time.perf_counter()
                REGISTRY[name].builder(spark, sf_dir).collect()
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
            tier_times[name] = round(best, 3)
            print(f"{tier} {name}: {tier_times[name]} s")
        result[tier] = tier_times

    with open(out_path, "w") as fh:
        json.dump(
            {
                "metric": "codec_ranking_graph_scale_curve",
                "unit": "sec",
                "repeat_best_of": REPEAT,
                "tiers": result,
            },
            fh,
            indent=1,
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
