"""The ANN tuning FRONTIER as a first-class query (VERDICT r6 task 4):
`ann_recall_at_k` measures recall for ONE bucketing config; a real 100 TB
deployment sweeps the knob and picks the cheapest config that clears its
recall target. `ann_plane_sweep` runs that sweep declaratively — for each
LSH plane count it reports the candidate-pair volume (the COST an
index pays: scored pairs ∝ shuffle + compute) next to recall@K against
the exact brute-force top-k (the QUALITY) — the recall-vs-cost frontier
in one oracle-checked result. The wall-clock dimension of the same sweep
(plus multiprobe breadth) lives in `scripts/bench_ann_recall_curve.py` →
`BENCH_ann_recall_curve.json`.

Reference anchor: the dedup family's `lsh_band_sensitivity`
(`dedup.py`) does exactly this for MinHash band/row splits; this module
is its embedding-space sibling.

Exactness: hit counts are integers; the one recall divide is a single
IEEE double division of two exact integers — bit-identical across
engines. Candidate counts come from the same bucket join the scorer
uses, so cost numbers are the real scored-pair counts, not estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .similarity import (
    N_QUERIES,
    TOPK,
    _QUANT_SQL,
    _weights_values_sql,
    ann_cosine_topk,
    lsh_bucket,
    plane_weights,
    quantized,
    sq_norm,
    topk_per_query,
)

SWEEP_PLANES = (2, 4, 6)
_DIM = 64
_K_TOTAL = N_QUERIES * TOPK


def _plane_sweep_oracle(planes: tuple[int, ...], dim: int) -> str:
    """DuckDB mirror: one exact-top-k CTE shared by every config, then
    per-plane-count bucket CTEs (same literal hyperplanes as the Spark
    side), candidate-pair counts, and bucketed top-k hit counts, one
    UNION ALL row per config."""
    cosine = (
        "CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) *"
        " sqrt(CAST(nb.nsq AS DOUBLE)))"
    )
    ctes = [
        _QUANT_SQL,
        f"""
exact_dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM qe a JOIN qe b ON a.i = b.i AND a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
  GROUP BY a.vec_id, b.vec_id
),
exact_topk AS (
  SELECT query_id, cand_id FROM (
    SELECT d.query_id, d.cand_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY {cosine} DESC, d.cand_id) AS rn
    FROM exact_dots d
    JOIN norms na ON na.vec_id = d.query_id
    JOIN norms nb ON nb.vec_id = d.cand_id
  ) WHERE rn <= {TOPK}
)""",
    ]
    selects = []
    for p in planes:
        weights = plane_weights(p, dim)
        ctes.append(
            f"""
pdots_{p} AS (
  SELECT qe.vec_id, pw.p, CAST(SUM(qe.q * pw.w) AS BIGINT) AS d
  FROM qe JOIN {_weights_values_sql(weights)} ON pw.i = qe.i - 1
  GROUP BY qe.vec_id, pw.p
),
buckets_{p} AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
  FROM pdots_{p} GROUP BY vec_id
),
npairs_{p} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM buckets_{p} ba
  JOIN buckets_{p} bb ON bb.bucket = ba.bucket AND bb.vec_id <> ba.vec_id
  WHERE ba.vec_id < {N_QUERIES}
),
lsh_dots_{p} AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM qe a
  JOIN buckets_{p} ba ON ba.vec_id = a.vec_id AND a.vec_id < {N_QUERIES}
  JOIN buckets_{p} bb ON bb.bucket = ba.bucket AND bb.vec_id <> a.vec_id
  JOIN qe b ON b.vec_id = bb.vec_id AND b.i = a.i
  GROUP BY a.vec_id, b.vec_id
),
lsh_topk_{p} AS (
  SELECT query_id, cand_id FROM (
    SELECT d.query_id, d.cand_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY {cosine} DESC, d.cand_id) AS rn
    FROM lsh_dots_{p} d
    JOIN norms na ON na.vec_id = d.query_id
    JOIN norms nb ON nb.vec_id = d.cand_id
  ) WHERE rn <= {TOPK}
),
nhits_{p} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM exact_topk e JOIN lsh_topk_{p} l
    ON l.query_id = e.query_id AND l.cand_id = e.cand_id
)"""
        )
        selects.append(
            f"""
SELECT CAST({p} AS BIGINT) AS n_planes,
       (SELECT n FROM npairs_{p}) AS n_cand_pairs,
       (SELECT n FROM nhits_{p}) AS n_hits,
       CAST({_K_TOTAL} AS BIGINT) AS k_total,
       CAST((SELECT n FROM nhits_{p}) AS DOUBLE) / {_K_TOTAL}.0 AS recall"""
        )
    return "WITH " + ",".join(ctes) + "\nUNION ALL".join(selects)


@query(
    "ann_plane_sweep",
    oracle=_plane_sweep_oracle(SWEEP_PLANES, _DIM),
    tags=("similarity-ann-sweep",),
)
def ann_plane_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-cost frontier: for each LSH plane count, the scored
    candidate-pair volume next to recall@K vs the exact baseline — one
    row per knob value, the table a 100 TB user reads before committing
    a bucketing. Runs on the query SAMPLE by design (like
    `ann_recall_at_k`, whose 10-query broadcast BNLJ this composes)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", quantized("embedding").alias("q"))
        .withColumn("nsq", sq_norm(F.col("q")))
    )
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    per_config = []
    for p in SWEEP_PLANES:
        weights = plane_weights(p, _DIM)
        b = emb.withColumn("bucket", lsh_bucket("q", weights))
        queries_df = b.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("nsq").alias("q_nsq"),
            F.col("bucket").alias("q_bucket"),
        )
        cands = b.select(
            F.col("vec_id").alias("cand_id"),
            F.col("q").alias("cq"),
            F.col("nsq").alias("c_nsq"),
            F.col("bucket").alias("c_bucket"),
        )
        cond = (F.col("c_bucket") == F.col("q_bucket")) & (
            F.col("cand_id") != F.col("query_id")
        )
        n_pairs = (
            cands.join(F.broadcast(queries_df), cond)
            .agg(F.count(F.lit(1)).cast("long").alias("n_cand_pairs"))
        )
        hits = (
            exact.join(
                topk_per_query(queries_df, cands, cond).select(
                    "query_id", "cand_id"
                ),
                ["query_id", "cand_id"],
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        per_config.append(
            n_pairs.crossJoin(hits).select(  # 1-row x 1-row scalar bound
                F.lit(p).cast("long").alias("n_planes"),
                "n_cand_pairs",
                "n_hits",
                F.lit(_K_TOTAL).cast("long").alias("k_total"),
                (F.col("n_hits").cast("double") / F.lit(float(_K_TOTAL))).alias(
                    "recall"
                ),
            )
        )
    out = per_config[0]
    for c in per_config[1:]:
        out = out.unionByName(c)
    return out
