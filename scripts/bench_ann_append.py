#!/usr/bin/env python
"""Append-path ANN maintenance cost curve (VERDICT r11 task 4): a FIXED
append batch (200 reversed vectors) joins an IVF index whose corpus
grows 500 -> 10k -> 100k vectors. The claim: append cost is O(batch) —
one centroid broadcast + a narrow argmin projection over the batch —
independent of corpus size, while a RETRAIN (two Lloyd rounds over the
full corpus) grows linearly; the drift audit (`ivf_drift_audit`) is
what decides when to pay the second number.

Output: BENCH_ann_append.json rows
  {label, n_vectors, n_batch, train_sec, append_wall_best_sec,
   append_cpu_min_sec, retrain_wall_sec}

Env: REPEATS (default 3), SPARK_GRAFT_SFS (default sf0.01,sf0.1,sf1).
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
from financial_arbitrage_data_pipeline_spark.operators.similarity import (
    _assign,
    _update,
    quantized,
    trained_model,
)
from financial_arbitrage_data_pipeline_spark.session import get_spark
from financial_arbitrage_data_pipeline_spark.sources.tables import load_table

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(ROOT, "scaledata", "sf1"),
    "sf3": os.path.join(ROOT, "scaledata", "sf3"),
    "sf10": os.path.join(ROOT, "scaledata", "sf10"),
}
BATCH_N = 200


def _cpu_fn():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__file__"] = os.path.join(ROOT, "bench.py")
    spec.loader.exec_module(mod)
    return mod._proc_tree_cpu_sec


def main() -> None:
    repeats = int(os.environ.get("REPEATS", "3"))
    labels = [
        s
        for s in os.environ.get("SPARK_GRAFT_SFS", "sf0.01,sf0.1,sf1").split(",")
        if s and os.path.isdir(SF_DIRS.get(s, ""))
    ]
    spark = get_spark(app_name="bench_ann_append")
    cpu = _cpu_fn()
    rows = []
    for label in labels:
        sf_dir = SF_DIRS[label]
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", quantized("embedding").alias("q")
        )
        n_vectors = emb.count()
        batch = (
            emb.filter(F.col("vec_id") < BATCH_N)
            .select(
                (F.col("vec_id") + 1_000_000).alias("vec_id"),
                F.reverse("q").alias("q"),
            )
            .localCheckpoint()
        )

        t0 = time.perf_counter()
        _, centroids = trained_model(spark, sf_dir)
        cent_rows = [(r.cid, r.c) for r in centroids.collect()]
        train_sec = time.perf_counter() - t0

        walls, cpus = [], []
        for _ in range(repeats):
            c0 = cpu()
            t0 = time.perf_counter()
            _assign(batch, cent_rows).count()
            walls.append(time.perf_counter() - t0)
            cpus.append(cpu() - c0)

        # the counterfactual: a full retrain over base + batch
        full = emb.unionByName(batch)
        t0 = time.perf_counter()
        init_rows = [
            (r.cid, r.c)
            for r in full.filter(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("cid"), F.col("q").alias("c"))
            .collect()
        ]
        re_cents = _update(_assign(full, init_rows))
        _assign(full, [(r.cid, r.c) for r in re_cents.collect()]).count()
        retrain_sec = time.perf_counter() - t0

        row = {
            "label": label,
            "n_vectors": n_vectors,
            "n_batch": BATCH_N,
            "train_sec": round(train_sec, 3),
            "append_wall_best_sec": round(min(walls), 3),
            "append_wall_median_sec": round(statistics.median(walls), 3),
            "append_cpu_min_sec": round(min(cpus), 3),
            "retrain_wall_sec": round(retrain_sec, 3),
        }
        rows.append(row)
        print(json.dumps(row))
    with open(os.path.join(ROOT, "BENCH_ann_append.json"), "w") as fh:
        json.dump({"rows": rows, "repeats": repeats}, fh, indent=1)
    print("wrote BENCH_ann_append.json")


if __name__ == "__main__":
    main()
