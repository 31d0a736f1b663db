#!/usr/bin/env python
"""The ANN recall-vs-cost FRONTIER with wall clock (VERDICT r6 task 4):
sweep LSH plane count x multiprobe breadth on one embedding table,
emitting per config

  (n_planes, n_probes, recall@K vs exact, candidate pairs, wall)

— the table a 100 TB user reads to pick the cheapest bucketing that
clears their recall target. Multiprobe breadth b probes the query's own
bucket plus every bucket at Hamming distance <= b from it (bit flips of
the sign signature) — the standard recall dial that costs extra
candidates instead of extra index copies.

Timing discipline (VERDICT r6 task 3): REPEATS runs per config, report
median + MAD alongside best — the n=2 best-of harness had stddevs larger
than the walls it measured.

Round 8 (VERDICT r7 task 4): the sweep runs at MULTIPLE scale points —
sf0.1 (driver testdata) plus the key-shifted sf1/sf3 replicas — so the
artifact shows whether the trained tier's recall-per-candidate
advantage HOLDS as the corpus grows 30x, and records the training-cost
axis (k-means wall) next to recall for each scale point.

Env: SPARK_GRAFT_SFS (comma labels among sf0.1,sf1,sf3,sf1org,sf3org;
     default all
present), REPEATS (5). Output: BENCH_ann_recall_curve.json
"""

from __future__ import annotations

import itertools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators.similarity import (
    _DIST_EXPR,
    N_QUERIES,
    TOPK,
    ann_cosine_topk,
    lsh_bucket,
    plane_weights,
    quantized,
    sq_norm,
    topk_per_query,
    trained_model,
)
from financial_arbitrage_data_pipeline_spark.session import get_spark
from financial_arbitrage_data_pipeline_spark.sources.tables import load_table

PLANES = (2, 3, 4, 5, 6, 8)
PROBE_BREADTHS = (0, 1)
DIM = 64


def probe_set_expr(p: int, breadth: int):
    """array of bucket ids within Hamming distance <= breadth of
    q_bucket (breadth 0 -> just the query's own bucket; 1 -> + p
    single-bit flips)."""
    cols = [F.col("q_bucket")]
    if breadth >= 1:
        cols += [F.col("q_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(p)]
    if breadth >= 2:
        cols += [
            F.col("q_bucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(p)
            for j in range(i + 1, p)
        ]
    return F.array(*cols)


def sweep(spark, sf_dir: str, repeats: int) -> dict:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", quantized("embedding").alias("q"))
        .withColumn("nsq", sq_norm(F.col("q")))
    )
    n_vectors = emb.count()
    exact = (
        ann_cosine_topk(spark, sf_dir).select("query_id", "cand_id").toPandas()
    )
    exact_pairs = {(r.query_id, r.cand_id) for r in exact.itertuples()}
    k_total = N_QUERIES * TOPK

    def timed_config(queries_df, cands, cond, label: dict) -> dict:
        """Shared scoring tail: candidate count, recall@K vs exact, and
        median+MAD wall over `repeats` runs for one configuration."""
        n_pairs = (
            cands.join(F.broadcast(queries_df), cond)
            .agg(F.count(F.lit(1)).alias("n"))
            .toPandas()["n"][0]
        )
        walls = []
        got = None
        for _ in range(repeats):
            t0 = time.time()
            got = topk_per_query(queries_df, cands, cond).toPandas()
            walls.append(time.time() - t0)
        hits = sum(
            1 for r in got.itertuples() if (r.query_id, r.cand_id) in exact_pairs
        )
        med = statistics.median(walls)
        mad = statistics.median(abs(w - med) for w in walls)
        return {
            **label,
            "recall_at_k": round(hits / k_total, 4),
            "n_cand_pairs": int(n_pairs),
            "cand_pairs_per_query": round(n_pairs / N_QUERIES, 1),
            "scan_fraction": round(n_pairs / (N_QUERIES * (n_vectors - 1)), 4),
            "wall_best_sec": round(min(walls), 3),
            "wall_median_sec": round(med, 3),
            "wall_mad_sec": round(mad, 3),
        }

    rows = []
    for p, breadth in itertools.product(PLANES, PROBE_BREADTHS):
        weights = plane_weights(p, DIM)
        b = emb.withColumn("bucket", lsh_bucket("q", weights))
        queries_df = b.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("nsq").alias("q_nsq"),
            F.col("bucket").alias("q_bucket"),
        ).withColumn("probes", probe_set_expr(p, breadth))
        cands = b.select(
            F.col("vec_id").alias("cand_id"),
            F.col("q").alias("cq"),
            F.col("nsq").alias("c_nsq"),
            F.col("bucket").alias("c_bucket"),
        )
        cond = F.array_contains(F.col("probes"), F.col("c_bucket")) & (
            F.col("cand_id") != F.col("query_id")
        )
        rows.append(
            timed_config(
                queries_df,
                cands,
                cond,
                {
                    "method": "lsh",
                    "n_planes": p,
                    "probe_breadth": breadth,
                    "n_probe_buckets": 1 + (p if breadth >= 1 else 0),
                },
            )
        )
        print(json.dumps(rows[-1]))

    # --- IVF nprobe sweep (the trained-quantizer recall dial) ---------
    # Training cost is part of the trade (VERDICT r7 task 4): time the
    # k-means train+assign to materialization, best-of-2 so a cold
    # first run doesn't overstate it.
    train_walls = []
    for _ in range(2):
        t0 = time.time()
        a0, _c0 = trained_model(spark, sf_dir)
        a0.agg(F.count(F.lit(1))).collect()
        train_walls.append(time.time() - t0)
    kmeans_train_sec = round(min(train_walls), 3)
    assigned, centroids = trained_model(spark, sf_dir)
    assigned = assigned.localCheckpoint()
    emb_ivf = assigned.withColumn("nsq", sq_norm(F.col("q")))
    cands_ivf = emb_ivf.select(
        F.col("vec_id").alias("cand_id"),
        F.col("q").alias("cq"),
        F.col("nsq").alias("c_nsq"),
        F.col("cid").alias("c_cid"),
    )
    qd = (
        emb_ivf.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "q", "nsq")
        .join(F.broadcast(centroids))
        .select(
            F.col("vec_id").alias("query_id"),
            "q",
            "nsq",
            F.col("cid").alias("probe_cid"),
            F.expr(_DIST_EXPR).alias("cdist"),
        )
    )
    wprobe = Window.partitionBy("query_id").orderBy("cdist", "probe_cid")
    ranked = qd.withColumn("rn", F.row_number().over(wprobe)).localCheckpoint()
    for nprobe in (1, 2, 4):
        probes = ranked.filter(F.col("rn") <= nprobe).select(
            "query_id",
            F.col("q").alias("qq"),
            F.col("nsq").alias("q_nsq"),
            "probe_cid",
        )
        cond = (F.col("c_cid") == F.col("probe_cid")) & (
            F.col("cand_id") != F.col("query_id")
        )
        rows.append(
            timed_config(
                probes, cands_ivf, cond, {"method": "ivf", "nprobe": nprobe}
            )
        )
        print(json.dumps(rows[-1]))

    # --- IVF+PQ: ADC-scored candidates inside the nprobe=1 cell -------
    # (round 9) The compression tier: candidates still come from the
    # trained coarse quantizer, but ranking uses the 8x8-codebook
    # asymmetric distance (sum over 8 subspaces of the query-to-centroid
    # table entry for the candidate's code) — the memory-bound regime a
    # 100 TB index actually runs, measured for the recall it costs.
    from financial_arbitrage_data_pipeline_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        pq_trained,
    )

    pq_assigned, codebook_rows = pq_trained(spark, sf_dir)
    cand_codes = pq_assigned.select("vec_id", "m", "code").localCheckpoint()
    codebook = spark.createDataFrame(
        [(m, cid, c) for (m, cid, c) in codebook_rows],
        "m int, cid int, c array<bigint>",
    )
    # per-query subvectors -> per-(query, m, cid) distance table
    q_subs = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
            "q",
        )
        .select(
            "query_id",
            "m",
            F.expr(f"slice(q, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("sq"),
        )
    )
    adc_table = (
        q_subs.join(F.broadcast(codebook), "m")
        .select(
            "query_id",
            "m",
            F.col("cid").alias("code"),
            F.expr(
                "aggregate(zip_with(sq, c, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("d"),
        )
        .localCheckpoint()
    )
    probes1 = ranked.filter(F.col("rn") <= 1).select("query_id", "probe_cid")
    cell_cands = probes1.join(
        cands_ivf.select("cand_id", "c_cid"),
        F.col("c_cid") == F.col("probe_cid"),
    ).select("query_id", "cand_id").filter(
        F.col("cand_id") != F.col("query_id")
    )
    n_pairs_pq = cell_cands.count()

    def adc_topk() -> object:
        scored = (
            cell_cands.join(cand_codes, F.col("cand_id") == F.col("vec_id"))
            .join(F.broadcast(adc_table), ["query_id", "m", "code"])
            .groupBy("query_id", "cand_id")
            .agg(F.sum("d").alias("adc"))
        )
        w = Window.partitionBy("query_id").orderBy("adc", "cand_id")
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOPK)
            .select("query_id", "cand_id")
            .toPandas()
        )

    walls = []
    got = None
    for _ in range(repeats):
        t0 = time.time()
        got = adc_topk()
        walls.append(time.time() - t0)
    hits = sum(
        1 for r in got.itertuples() if (r.query_id, r.cand_id) in exact_pairs
    )
    med = statistics.median(walls)
    rows.append(
        {
            "method": "ivfpq",
            "nprobe": 1,
            "pq_m": PQ_M,
            "recall_at_k": round(hits / k_total, 4),
            "n_cand_pairs": int(n_pairs_pq),
            "cand_pairs_per_query": round(n_pairs_pq / N_QUERIES, 1),
            "scan_fraction": round(
                n_pairs_pq / (N_QUERIES * (n_vectors - 1)), 4
            ),
            "wall_best_sec": round(min(walls), 3),
            "wall_median_sec": round(med, 3),
            "wall_mad_sec": round(
                statistics.median(abs(w - med) for w in walls), 3
            ),
        }
    )
    print(json.dumps(rows[-1]))

    # --- IVF + PQ-rank (K=256) + exact re-rank: the production stack --
    # (round 10, VERDICT r9 task 2) Same nprobe=1 candidate budget as
    # the ivfpq row above, but ADC uses the 256-entry ranking codebooks
    # and the top-C shortlist gets an exact integer-cosine re-rank —
    # the tier a 100 TB user actually serves queries from.
    from financial_arbitrage_data_pipeline_spark.operators.similarity import (
        PQ_RERANK_C,
        cosine_from_ints,
        dot_ll,
        pq_rank_trained,
    )

    rank_train_walls = []
    for _ in range(2):
        t0 = time.time()
        ra, _rc = pq_rank_trained(spark, sf_dir)
        ra.agg(F.count(F.lit(1))).collect()
        rank_train_walls.append(time.time() - t0)
    pq_rank_train_sec = round(min(rank_train_walls), 3)
    rank_assigned, rank_codebook = pq_rank_trained(spark, sf_dir)
    rank_codes = rank_assigned.select("vec_id", "m", "code").localCheckpoint()
    # cosine-surrogate ADC (the shipped ivfpq_rerank_topk design):
    # dot(q, recon)/sqrt(|recon|^2 + 1) from two broadcast LUTs
    rank_adc_table = (
        rank_assigned.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "m", "sq")
        .join(F.broadcast(rank_codebook), "m")
        .select(
            "query_id",
            "m",
            F.col("cid").alias("code"),
            F.expr(
                "aggregate(zip_with(sq, c, (a, b) -> a * b),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("pdot"),
        )
        .localCheckpoint()
    )
    rank_cnn = rank_codebook.select(
        "m",
        F.col("cid").alias("code"),
        F.expr(
            "aggregate(zip_with(c, c, (a, b) -> a * b),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("pnn"),
    ).localCheckpoint()

    def rerank_topk(pair_cands) -> object:
        scored = (
            pair_cands.join(rank_codes, F.col("cand_id") == F.col("vec_id"))
            .join(F.broadcast(rank_adc_table), ["query_id", "m", "code"])
            .join(F.broadcast(rank_cnn), ["m", "code"])
            .groupBy("query_id", "cand_id")
            .agg(F.sum("pdot").alias("adot"), F.sum("pnn").alias("ann"))
        )
        s = F.col("adot").cast("double") / F.sqrt(
            (F.col("ann") + 1).cast("double")
        )
        wa = Window.partitionBy("query_id").orderBy(s.desc(), "cand_id")
        shortlist = (
            scored.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") <= PQ_RERANK_C)
            .select("query_id", "cand_id")
        )
        q_side = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("nsq").alias("q_nsq"),
        )
        c_side = emb.select(
            F.col("vec_id").alias("cand_id"),
            F.col("q").alias("cq"),
            F.col("nsq").alias("c_nsq"),
        )
        rescored = (
            c_side.join(F.broadcast(shortlist), "cand_id")
            .join(F.broadcast(q_side), "query_id")
            .select(
                "query_id",
                "cand_id",
                cosine_from_ints(
                    dot_ll(F.col("qq"), F.col("cq")),
                    F.col("q_nsq"),
                    F.col("c_nsq"),
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("cand_id")
        )
        return (
            rescored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOPK)
            .select("query_id", "cand_id")
            .toPandas()
        )

    walls = []
    got = None
    for _ in range(repeats):
        t0 = time.time()
        got = rerank_topk(cell_cands)
        walls.append(time.time() - t0)
    hits = sum(
        1 for r in got.itertuples() if (r.query_id, r.cand_id) in exact_pairs
    )
    med = statistics.median(walls)
    rows.append(
        {
            "method": "ivfpq_rank_rerank",
            "nprobe": 1,
            "pq_k": 256,
            "pq_m": 16,
            "rerank_c": PQ_RERANK_C,
            "pq_rank_train_sec": pq_rank_train_sec,
            "recall_at_k": round(hits / k_total, 4),
            "n_cand_pairs": int(n_pairs_pq),
            "cand_pairs_per_query": round(n_pairs_pq / N_QUERIES, 1),
            "scan_fraction": round(
                n_pairs_pq / (N_QUERIES * (n_vectors - 1)), 4
            ),
            "wall_best_sec": round(min(walls), 3),
            "wall_median_sec": round(med, 3),
            "wall_mad_sec": round(
                statistics.median(abs(w - med) for w in walls), 3
            ),
        }
    )
    print(json.dumps(rows[-1]))

    # --- COMPOSED tier (r11, VERDICT r10 task 4): multiprobe coarse ----
    # blocking (K=16 cells, nprobe=2 -> ~12.5% scan fraction) feeding
    # the SAME K=256 ADC + exact re-rank — the shipped
    # ivfpq_multiprobe_rerank_topk shape, timed search-only with the
    # train costs recorded separately like every other trained row.
    from financial_arbitrage_data_pipeline_spark.operators.similarity import (
        IVFPQ_MP_K,
        NPROBE,
    )

    mp_assigned, mp_centroids = trained_model(spark, sf_dir, k=IVFPQ_MP_K)
    mp_coarse = mp_assigned.select("vec_id", "cid").localCheckpoint()
    mp_centroids = mp_centroids.localCheckpoint()
    mp_qd = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "q")
        .join(F.broadcast(mp_centroids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cid").alias("probe_cid"),
            F.expr(_DIST_EXPR).alias("cdist"),
        )
    )
    mp_ranked = mp_qd.withColumn(
        "rn", F.row_number().over(wprobe)
    ).localCheckpoint()
    mp_cell_cands = (
        mp_ranked.filter(F.col("rn") <= NPROBE)
        .select("query_id", "probe_cid")
        .join(
            mp_coarse.select(
                F.col("vec_id").alias("cand_id"), F.col("cid").alias("c_cid")
            ),
            F.col("c_cid") == F.col("probe_cid"),
        )
        .select("query_id", "cand_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .localCheckpoint()
    )
    n_pairs_mp = mp_cell_cands.count()
    walls = []
    got = None
    for _ in range(repeats):
        t0 = time.time()
        got = rerank_topk(mp_cell_cands)
        walls.append(time.time() - t0)
    hits = sum(
        1 for r in got.itertuples() if (r.query_id, r.cand_id) in exact_pairs
    )
    med = statistics.median(walls)
    rows.append(
        {
            "method": "ivfpq_mp_rerank",
            "coarse_k": IVFPQ_MP_K,
            "nprobe": NPROBE,
            "pq_k": 256,
            "pq_m": 16,
            "rerank_c": PQ_RERANK_C,
            "pq_rank_train_sec": pq_rank_train_sec,
            "recall_at_k": round(hits / k_total, 4),
            "n_cand_pairs": int(n_pairs_mp),
            "cand_pairs_per_query": round(n_pairs_mp / N_QUERIES, 1),
            "scan_fraction": round(
                n_pairs_mp / (N_QUERIES * (n_vectors - 1)), 4
            ),
            "wall_best_sec": round(min(walls), 3),
            "wall_median_sec": round(med, 3),
            "wall_mad_sec": round(
                statistics.median(abs(w - med) for w in walls), 3
            ),
        }
    )
    print(json.dumps(rows[-1]))

    # free the per-SF persisted state so multi-SF sweeps don't stack
    # corpus-sized cached rounds (the SCALE.md §18 lesson)
    spark.catalog.clearCache()
    return {
        "sf_dir": sf_dir,
        "n_vectors": int(n_vectors),
        "kmeans_train_sec": kmeans_train_sec,
        "rows": rows,
    }


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(ROOT, "scaledata", "sf1"),
    "sf3": os.path.join(ROOT, "scaledata", "sf3"),
    # ORGANIC scale points (VERDICT r9 task 2, gen_organic_embeddings.py):
    # the replica corpora saturate recall >= 0.9 for every index family
    # (jittered copies are each query's true top-k), so the IVF-vs-LSH
    # frontier above sf0.1 is only measurable on these.
    "sf1org": os.path.join(ROOT, "scaledata", "sf1_organic"),
    "sf3org": os.path.join(ROOT, "scaledata", "sf3_organic"),
    "sf10org": os.path.join(ROOT, "scaledata", "sf10_organic"),
}


def main() -> int:
    repeats = int(os.environ.get("REPEATS", "5"))
    labels = [
        s
        for s in os.environ.get(
            "SPARK_GRAFT_SFS", "sf0.1,sf1,sf3,sf1org,sf3org,sf10org"
        ).split(",")
        if s and os.path.isdir(SF_DIRS.get(s, ""))
    ]
    spark = get_spark(app_name="ann-recall-curve")
    spark.sparkContext.setLogLevel("ERROR")
    runs = {}
    for label in labels:
        print(f"=== {label} ===")
        runs[label] = sweep(spark, SF_DIRS[label], repeats)
    out = {
        "metric": "ann_recall_curve",
        "n_queries": N_QUERIES,
        "k": TOPK,
        "repeats": repeats,
        "runs": runs,
    }
    with open(os.path.join(ROOT, "BENCH_ann_recall_curve.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        json.dumps(
            {
                "written": "BENCH_ann_recall_curve.json",
                "sfs": labels,
                "configs": sum(len(r["rows"]) for r in runs.values()),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
