#!/usr/bin/env python
"""Scaling curve for the dedup/ANN operators that carry the 100 TB
claims (VERDICT r5 task 4): time minhash/simhash/incremental-gate/LSH
top-k at sf0.1 → sf3 (key-shifted replicas, scripts/gen_scale_data.py)
AND characterize the minhash CANDIDATE-PAIR space — the quantity that
decides whether banded LSH stays linear as the corpus grows. Per SF we
record docs, band-bucket rows, distinct candidate pairs, and verified
pairs; linear candidate growth in docs = the banding is doing its job
(pairs come from same-bucket collisions, not the quadratic pair space).

Usage: python scripts/bench_dedup_curve.py [--repeat N] [dir ...]
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
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators.dedup import (
    band_signatures,
    crawl_union,
    with_minhash,
    with_shingles,
)
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark

CURVE_QUERIES = [
    "minhash_lsh_dedup",
    "simhash_dedup",
    # r11: the O(docs)-output representative form — the scale path when
    # downstream needs dedup DECISIONS, not the replica-quadratic pair
    # set simhash_dedup emits by contract (44.7M pairs at sf10)
    "simhash_dedup_canonical",
    # r12: the minhash family's canonical-scale form alongside its
    # pair form, so the artifact carries both walls + the ratio
    "dedup_keep_canonical",
    "incremental_neardup_gate",
    "ann_lsh_topk",
]

# audit-tier pair form -> its canonical-scale counterpart (VERDICT r11
# task 5): per SF the artifact records canonical_wall / pair_wall, the
# number a 100 TB user reads before picking a default
CANONICAL_OF = {
    "simhash_dedup": "simhash_dedup_canonical",
    "minhash_lsh_dedup": "dedup_keep_canonical",
}


def candidate_profile(spark, sf_dir: str) -> dict:
    """The minhash candidate-space accounting at one SF: how many docs,
    how many band rows, how many DISTINCT candidate pairs the band
    equi-join emits, and how many survive exact-Jaccard verification."""
    corpus = with_minhash(with_shingles(crawl_union(spark, sf_dir)))
    bands = band_signatures(corpus).persist()
    n_docs = crawl_union(spark, sf_dir).count()
    n_band_rows = bands.count()
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    n_cand = cand.count()
    n_verified = REGISTRY["minhash_lsh_dedup"].builder(spark, sf_dir).count()
    bands.unpersist()
    return {
        "docs": n_docs,
        "band_rows": n_band_rows,
        "candidate_pairs": n_cand,
        "verified_pairs": n_verified,
        "cand_per_doc": round(n_cand / max(n_docs, 1), 4),
    }


def gate_profile(spark, sf_dir: str) -> dict:
    """Candidate accounting for the INCREMENTAL text gate (VERDICT r9
    task 8 — the perceptual gate showed saturation only once this ratio
    was measured; the text gate must not be able to hide the same):
    raw asymmetric band-join volume, distinct (incoming, base)
    candidate pairs, and verified matches, all per incoming doc."""
    from financial_arbitrage_data_pipeline_spark.operators.dedup import (
        _INC_BASE_MAX,
        _incremental_corpus,
    )

    corpus = with_minhash(with_shingles(_incremental_corpus(spark, sf_dir)))
    bands = band_signatures(corpus).persist()
    base_b = bands.filter(F.col("doc_id") < _INC_BASE_MAX)
    inc_b = bands.filter(F.col("doc_id") >= _INC_BASE_MAX)
    n_incoming = (
        _incremental_corpus(spark, sf_dir)
        .filter(F.col("doc_id") >= _INC_BASE_MAX)
        .count()
    )
    j = inc_b.alias("i").join(
        base_b.alias("b"),
        (F.col("i.band_id") == F.col("b.band_id"))
        & (F.col("i.band_sig") == F.col("b.band_sig")),
    )
    row = j.agg(
        F.count(F.lit(1)).alias("raw"),
        F.countDistinct(F.col("i.doc_id"), F.col("b.doc_id")).alias("pairs"),
    ).collect()[0]
    n_dropped = (
        REGISTRY["incremental_neardup_gate"]
        .builder(spark, sf_dir)
        .filter(F.col("is_duplicate"))
        .count()
    )
    bands.unpersist()
    return {
        "incoming_docs": int(n_incoming),
        "band_join_rows": int(row["raw"]),
        "candidate_pairs": int(row["pairs"]),
        "dropped": int(n_dropped),
        "band_rows_per_incoming": round(row["raw"] / max(n_incoming, 1), 4),
        "cand_pairs_per_incoming": round(row["pairs"] / max(n_incoming, 1), 4),
    }


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
            "/root/repo/scaledata/sf10",
        ],
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-dedup-curve")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    runs: dict[str, dict] = {}
    for sf_dir in args.dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip absent {sf_dir}", flush=True)
            continue
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        timings: dict[str, float] = {}
        spreads: dict[str, dict] = {}
        for name in CURVE_QUERIES:
            spec = REGISTRY[name]
            walls: list[float] = []
            for _ in range(max(1, args.repeat)):
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
            med = statistics.median(walls)
            mad = statistics.median(abs(w - med) for w in walls)
            # high-variance queries get extra runs until the median is
            # interpretable (VERDICT r6 task 3: n=2 stddevs up to 3.8 s
            # produced non-monotone curve segments)
            while len(walls) < args.repeat + 4 and mad > 0.2 * med:
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).toPandas()
                walls.append(time.perf_counter() - t0)
                med = statistics.median(walls)
                mad = statistics.median(abs(w - med) for w in walls)
            # curve segments compare MEDIANS (robust); best kept for
            # continuity with earlier rounds' artifacts
            timings[name] = round(med, 4)
            spreads[name] = {
                "best": round(min(walls), 4),
                "median": round(med, 4),
                "mad": round(mad, 4),
                "n": len(walls),
            }
            print(f"  {label:6s} {name}: {spreads[name]}", flush=True)
        prof = candidate_profile(spark, sf_dir)
        print(f"  {label:6s} candidates: {prof}", flush=True)
        gprof = gate_profile(spark, sf_dir)
        print(f"  {label:6s} gate: {gprof}", flush=True)
        runs[label] = {
            "total_wall": round(sum(timings.values()), 4),
            "queries": timings,
            "query_spreads": spreads,
            # canonical-scale wall / pair-form wall, per family
            "canonical_wall_ratio": {
                pair: round(timings[canon] / max(timings[pair], 1e-9), 3)
                for pair, canon in CANONICAL_OF.items()
            },
            "minhash_candidates": prof,
            "incremental_gate": gprof,
        }

    labels = list(runs)
    ratios = {}
    if len(labels) >= 2:
        lo, hi = runs[labels[0]], runs[labels[-1]]
        scale = (
            hi["minhash_candidates"]["docs"]
            / max(lo["minhash_candidates"]["docs"], 1)
        )
        ratios = {
            "data_scale": round(scale, 2),
            "wall": {
                q: round(hi["queries"][q] / max(lo["queries"][q], 1e-9), 2)
                for q in CURVE_QUERIES
            },
            "candidate_pairs": round(
                hi["minhash_candidates"]["candidate_pairs"]
                / max(lo["minhash_candidates"]["candidate_pairs"], 1),
                2,
            ),
        }
    out = {
        "metric": "dedup_ann_family_wall_by_sf",
        "unit": "sec",
        "harness": (
            f"median of >= {args.repeat} runs per query (adaptive extra "
            "runs while MAD > 20% of median; Arrow toPandas, cold "
            "inputs), plus minhash candidate-space accounting per SF"
        ),
        "runs": runs,
        f"ratios_{labels[-1]}_over_{labels[0]}" if labels else "ratios": ratios,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_dedup_curve.json",
    )
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
