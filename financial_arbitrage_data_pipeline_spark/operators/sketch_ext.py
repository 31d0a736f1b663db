"""b-bit MinHash (Li & König, CACM 2011) — the storage-side answer to
"16 × int64 signature per document is too big at 100 TB": keep only the
LOWEST BIT of each minhash permutation (16 bits total instead of 1 KB)
and recover Jaccard from the bit-agreement rate via the b=1 unbiasing
J = 2·a − 1 (a random un-equal pair still agrees with probability ½, so
agreement a = J + (1−J)/2).

This operator is the AUDIT for that trade, run on the same LSH candidate
pairs the dedup path already pays for: per pair, the 1-bit estimate, the
full-signature estimate, and the exact shingle Jaccard side by side with
both absolute errors — the measurement that tells a 100 TB pipeline
whether 64× signature compression costs it any dedup recall at its
threshold. Sibling of minhash_estimate_quality (full-width audit) and
lsh_band_sensitivity (banding audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from .dedup import (
    _CRAWL_UNION_SQL,
    _minhash_sql,
    N_MINHASH,
    band_signatures,
    crawl_union,
    with_minhash,
    with_shingles,
)

_BIT_MATCH_SQL = " + ".join(
    f"CASE WHEN a.mh{i} % 2 = b.mh{i} % 2 THEN 1 ELSE 0 END"
    for i in range(N_MINHASH)
)
_FULL_MATCH_SQL = " + ".join(
    f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
)

_BBIT_ORACLE = f"""
WITH {_minhash_sql(_CRAWL_UNION_SQL)}
SELECT c.doc_a, c.doc_b,
       CAST(({_BIT_MATCH_SQL}) AS BIGINT) AS n_bits_equal,
       (2 * CAST(({_BIT_MATCH_SQL}) AS DOUBLE) / {N_MINHASH}) - 1 AS est_1bit,
       CAST(({_FULL_MATCH_SQL}) AS DOUBLE) / {N_MINHASH} AS est_full,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)) AS jaccard,
       ABS((2 * CAST(({_BIT_MATCH_SQL}) AS DOUBLE) / {N_MINHASH}) - 1
           - CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0))) AS abs_err_1bit,
       ABS(CAST(({_FULL_MATCH_SQL}) AS DOUBLE) / {N_MINHASH}
           - CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0))) AS abs_err_full
FROM cand c
JOIN mh a ON a.doc_id = c.doc_a
JOIN mh b ON b.doc_id = c.doc_b
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sh_sizes za ON za.doc_id = c.doc_a
JOIN sh_sizes zb ON zb.doc_id = c.doc_b
"""


@query("bbit_minhash_estimate", oracle=_BBIT_ORACLE, tags=("dedup-minhash-estimator", "sketch"))
def bbit_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit MinHash audit per LSH candidate pair: n_bits_equal of 16,
    the unbiased 1-bit estimate J = 2·(a/16) − 1, the full-signature
    estimate, the exact shingle Jaccard, and both absolute errors.
    Storage math this certifies: 16 bits vs 16×64 bits per doc — 64×
    smaller signatures shipped through every shuffle and held in every
    executor — at the variance cost Li-König quantify (1-bit needs ~3×
    the permutations for equal variance at J≈0.5; the error columns
    measure it on YOUR corpus instead of trusting the asymptotics).

    Exactness: bit agreement and intersection counts are integers; the
    estimates divide by the power-of-two 16 (exact in binary), and the
    Jaccard divide is the same single IEEE op on both engines. Plan:
    identical shape to minhash_estimate_quality — signature table
    persisted once, band-bucket candidate join, shingle verification
    join only on candidates; the 1-bit columns add zero new shuffles."""
    corpus = with_minhash(with_shingles(crawl_union(spark, sf_dir)))
    # No persist (r13): the r12 persist was never dropped, so repeat
    # executions hit Spark's CacheManager (warm-biased bench, leaked
    # blocks across the suite); cold it buys nothing — the signature
    # pipeline is a narrow projection whose consumers share their
    # shuffles via ReusedExchange (same A/B as minhash_lsh_dedup:
    # persist 6.10 s vs none 6.04 s cold at sf0.1).
    sigs = corpus.select(
        "doc_id", "shingles", *[f"mh{i}" for i in range(N_MINHASH)]
    )
    bands = band_signatures(corpus)

    # Band self-join build side pinned SHUFFLE_HASH like every other
    # O(docs) join side (SCALE.md §39) — this site missed the r12 pin:
    # the bands relation is 4 rows/doc and Catalyst's size estimate can
    # elect to broadcast it, the 100 TB driver-OOM class.
    a, b = bands.alias("a"), bands.alias("b").hint("shuffle_hash")
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
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(N_MINHASH)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(N_MINHASH)],
    )
    n_bits = sum(
        F.when(F.col(f"a_mh{i}") % 2 == F.col(f"b_mh{i}") % 2, 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    n_full = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    est1 = (2 * n_bits.cast("double") / N_MINHASH) - 1
    estf = n_full.cast("double") / F.lit(N_MINHASH)
    jac = inter.cast("double") / union
    return (
        # signature sides are O(docs): shuffle-hash, never broadcast
        # (SCALE.md §39)
        cand.join(sa.hint("shuffle_hash"), "doc_a")
        .join(sb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_bits.cast("long").alias("n_bits_equal"),
            est1.alias("est_1bit"),
            estf.alias("est_full"),
            jac.alias("jaccard"),
            F.abs(est1 - jac).alias("abs_err_1bit"),
            F.abs(estf - jac).alias("abs_err_full"),
        )
    )
