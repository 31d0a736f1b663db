#!/usr/bin/env python
"""Scaling curve for the per-tape time-series family added in round 7
(lead-lag, Kyle's lambda, CUSUM, VPIN, linear interpolation, plus
tick_rule_flow as the family's round-6 baseline): time each at sf0.1 →
sf3. The scaledata replicas keep the PAIR universe fixed (1500) and
grow each tape 30× — the harsher axis for this family, since per-pair
window stacks sort longer tapes rather than fanning out over more
shuffle keys; per-pair/per-bucket parallelism would hide a superlinear
term that this shape exposes.

All six compile to the one-exchange tape shape (SCALE.md §19); the
curve pins that the measured walls track the data factor ~linearly —
there is no superlinear term hiding in the window stacks.

Usage: python scripts/bench_tape_curve.py [--repeat N] [dir ...]
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
from financial_arbitrage_data_pipeline_spark.sources.tables import load_table

CURVE_QUERIES = [
    "tick_rule_flow",
    "venue_lead_lag",
    "kyle_lambda_per_pair",
    "cusum_changepoint",
    "vpin_toxicity",
    "linear_interp_resample",
    # round-7 continuation additions (same one-exchange tape shape):
    "effective_spread_metrics",
    "spread_mean_reversion",
    "quote_stuffing_bursts",
    "event_study_car",
    # deliberately QUADRATIC per pair (median of pairwise slopes): the
    # curve exists to show the n² term saturating as hourly closes cap
    # at 720/pair — capped repeats, it dominates the family wall at sf3
    "theil_sen_trend",
    # round-7 session-4 additions — the position/risk family shares the
    # same one-exchange tape shape; fifo and wash add the bucketed
    # equi-joins whose candidate volume the curve pins as ~linear
    "fifo_realized_pnl",
    "position_exposure_timeline",
    "var_cvar_per_pair",
    "spearman_rank_corr",
    "wash_trade_detection",
    "implied_overround_book",
    "book_depth_rebuild",
]
SLOW_QUERIES = {"theil_sen_trend"}  # max 2 repeats: quadratic by design


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument(
        "dirs",
        nargs="*",
        default=[
            "/root/testdata/sf0.1",
            "/root/repo/scaledata/sf0.3",
            "/root/repo/scaledata/sf1",
            "/root/repo/scaledata/sf3",
        ],
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-tape-curve")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    runs: dict[str, dict] = {}
    for sf_dir in args.dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip absent {sf_dir}", flush=True)
            continue
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        ev = load_table(spark, sf_dir, "events")
        n_events = ev.count()
        n_pairs = ev.select("user_id").distinct().count()
        timings: dict[str, float] = {}
        spreads: dict[str, dict] = {}
        for name in CURVE_QUERIES:
            spec = REGISTRY[name]
            repeat = min(2, args.repeat) if name in SLOW_QUERIES else args.repeat
            walls: list[float] = []
            for _ in range(max(1, repeat)):
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
            med = statistics.median(walls)
            mad = statistics.median(abs(w - med) for w in walls)
            while len(walls) < repeat + (0 if name in SLOW_QUERIES else 4) and mad > 0.2 * med:
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
                med = statistics.median(walls)
                mad = statistics.median(abs(w - med) for w in walls)
            timings[name] = round(med, 4)
            spreads[name] = {
                "best": round(min(walls), 4),
                "median": round(med, 4),
                "mad": round(mad, 4),
                "n": len(walls),
            }
            print(f"  {label:6s} {name}: {spreads[name]}", flush=True)
        runs[label] = {
            "events": n_events,
            "pairs": n_pairs,
            "total_wall": round(sum(timings.values()), 4),
            "queries": timings,
            "query_spreads": spreads,
        }

    labels = list(runs)
    ratios = {}
    if len(labels) >= 2:
        lo, hi = runs[labels[0]], runs[labels[-1]]
        scale = hi["events"] / max(lo["events"], 1)
        ratios = {
            "data_scale": round(scale, 2),
            "wall": {
                q: round(hi["queries"][q] / max(lo["queries"][q], 1e-9), 2)
                for q in CURVE_QUERIES
            },
        }
    out = {
        "metric": "tape_family_wall_by_sf",
        "unit": "sec",
        "runs": runs,
        "ratios_last_over_first": ratios,
    }
    with open("/root/repo/BENCH_tape_curve.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
