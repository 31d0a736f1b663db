#!/usr/bin/env python
"""Per-batch cost curve for the PERSISTED dedup index (VERDICT r11
task 3): a FIXED incoming batch gates against a base corpus grown
500 -> 5,000 -> 50,000 docs (100x). The claim under test: with the
band/shingle index persisted as bucketed tables, per-batch cost is the
batch's own signature work + a co-bucketed probe — it must NOT track
corpus-text size (the unpersisted gate re-shingles and re-minhashes the
whole corpus every batch; its wall is the contrast column).

Output: BENCH_persist_gate_curve.json rows
  {label, n_docs, n_incoming, index_build_sec, index_rows,
   batch_wall_best_sec, batch_wall_median_sec, batch_cpu_min_sec,
   unpersisted_wall_sec, batch_ms_per_incoming}

Env: REPEATS (default 3), SPARK_GRAFT_SFS (default sf0.01,sf0.1,sf1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators.dedup import (
    N_MINHASH,
    _neardup_gate_verdicts,
    band_signatures,
    with_minhash,
    with_shingles,
)
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark
from financial_arbitrage_data_pipeline_spark.sources.tables import load_table
import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401  (populate REGISTRY)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(ROOT, "scaledata", "sf1"),
    "sf3": os.path.join(ROOT, "scaledata", "sf3"),
    "sf10": os.path.join(ROOT, "scaledata", "sf10"),
}
BATCH_DOC_CAP = 500  # incoming batch drawn from doc_id < CAP: FIXED size


def _proc_cpu() -> float:
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "benchmod", os.path.join(ROOT, "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        mod.__dict__["__file__"] = os.path.join(ROOT, "bench.py")
        spec.loader.exec_module(mod)
        return mod._proc_tree_cpu_sec
    except Exception:  # pragma: no cover
        return lambda: -1.0


def _incoming_batch(docs):
    head = docs.filter(F.col("doc_id") < BATCH_DOC_CAP)
    copies = head.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang"
    )
    rewrites = head.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
        "lang",
    )
    return copies.unionByName(rewrites)


def main() -> None:
    repeats = int(os.environ.get("REPEATS", "3"))
    labels = [
        s
        for s in os.environ.get("SPARK_GRAFT_SFS", "sf0.01,sf0.1,sf1").split(",")
        if s and os.path.isdir(SF_DIRS.get(s, ""))
    ]
    spark = get_spark(app_name="bench_persist_gate_curve")
    cpu = _proc_cpu()
    band_key = F.concat_ws(
        ":", F.col("band_id").cast("string"), F.col("band_sig")
    ).alias("band_key")
    rows = []
    for label in labels:
        sf_dir = SF_DIRS[label]
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        n_docs = docs.count()
        suffix = uuid.uuid4().hex[:8]
        band_tbl, sh_tbl = f"sg_pgc_band_{suffix}", f"sg_pgc_sh_{suffix}"
        import tempfile

        root = tempfile.mkdtemp(prefix="sgpgc_")
        try:
            t0 = time.perf_counter()
            base = with_minhash(with_shingles(docs))
            (
                band_signatures(base)
                .select(band_key, "doc_id")
                .write.format("parquet")
                .bucketBy(16, "band_key")
                .sortBy("band_key")
                .option("path", os.path.join(root, "band_index"))
                .saveAsTable(band_tbl)
            )
            (
                base.select("doc_id", "shingles")
                .write.format("parquet")
                .bucketBy(16, "doc_id")
                .sortBy("doc_id")
                .option("path", os.path.join(root, "shingle_store"))
                .saveAsTable(sh_tbl)
            )
            build_sec = time.perf_counter() - t0
            index_rows = spark.table(band_tbl).count()

            def run_batch() -> tuple[float, float, int]:
                c0 = cpu()
                t0 = time.perf_counter()
                inc = (
                    with_minhash(with_shingles(_incoming_batch(docs)))
                    .select(
                        "doc_id",
                        "shingles",
                        *[f"mh{i}" for i in range(N_MINHASH)],
                    )
                    .localCheckpoint()
                )
                inc_bands = band_signatures(inc).select(
                    band_key, F.col("doc_id").alias("incoming_id")
                )
                cand = (
                    inc_bands.join(spark.table(band_tbl), "band_key")
                    .select(F.col("doc_id").alias("base_id"), "incoming_id")
                    .distinct()
                )
                sa = spark.table(sh_tbl).select(
                    F.col("doc_id").alias("base_id"),
                    F.col("shingles").alias("sh_a"),
                )
                sb = inc.select(
                    F.col("doc_id").alias("incoming_id"),
                    F.col("shingles").alias("sh_b"),
                )
                incoming = inc.select(F.col("doc_id").alias("incoming_id"))
                out = _neardup_gate_verdicts(cand, sa, sb, incoming)
                n = out.count()
                return time.perf_counter() - t0, cpu() - c0, n

            walls, cpus, n_inc = [], [], 0
            for _ in range(repeats):
                w, c, n_inc = run_batch()
                walls.append(w)
                cpus.append(c)

            # contrast: the UNpersisted gate re-derives the whole corpus
            t0 = time.perf_counter()
            REGISTRY["incremental_neardup_gate"].builder(spark, sf_dir).count()
            unpersisted_sec = time.perf_counter() - t0

            row = {
                "label": label,
                "n_docs": n_docs,
                "n_incoming": n_inc,
                "index_rows": index_rows,
                "index_build_sec": round(build_sec, 3),
                "batch_wall_best_sec": round(min(walls), 3),
                "batch_wall_median_sec": round(statistics.median(walls), 3),
                "batch_cpu_min_sec": round(min(cpus), 3),
                "unpersisted_wall_sec": round(unpersisted_sec, 3),
                "batch_ms_per_incoming": round(min(walls) / max(n_inc, 1) * 1000, 3),
            }
            rows.append(row)
            print(json.dumps(row))
        finally:
            for t in (band_tbl, sh_tbl):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            import shutil

            shutil.rmtree(root, ignore_errors=True)
    out = {"rows": rows, "repeats": repeats, "batch_doc_cap": BATCH_DOC_CAP}
    with open(os.path.join(ROOT, "BENCH_persist_gate_curve.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote BENCH_persist_gate_curve.json")


if __name__ == "__main__":
    main()
