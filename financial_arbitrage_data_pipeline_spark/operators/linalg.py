"""Distributed linear algebra: the top principal direction of the
embedding cloud by POWER ITERATION, in exact integer arithmetic.

Why an engine needs this: PCA whitening / dominant-direction removal is
standard preprocessing before ANN indexing (it decorrelates the axes the
IVF/PQ coarse quantizers cut along), and the top eigenvector of XᵀX is
the whole job for rank-1 whitening. At 100 TB you cannot ship X to a
solver — but power iteration is just two matrix-free passes per round
(s = Xv, w = Xᵀs), each a join + aggregate, with only the d-vector on
the driver. That is exactly Spark's shape.

Why integer: float partial aggregation order is nondeterministic across
partitionings, so a float power iteration can't be value-hash-audited.
Quantizing X to integer thousandths and keeping v in a fixed-point scale
makes every round EXACT — same result on any cluster layout — and the
DuckDB oracle unrolls the identical integer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

_EIG_ROUNDS = 3
_EIG_SCALE = 1 << 16  # fixed-point scale of the iterated vector
_EIG_QUANT = 1000     # embedding quantization: thousandths


def _eig_oracle() -> str:
    rounds = []
    prev = "v0"
    for r in range(1, _EIG_ROUNDS + 1):
        rounds.append(f"""
s{r} AS (
  SELECT t.vec_id, SUM(t.q * v.v) AS s
  FROM t JOIN {prev} v USING (j) GROUP BY t.vec_id
),
w{r} AS (
  SELECT t.j, SUM(t.q * s.s) AS w
  FROM t JOIN s{r} s USING (vec_id) GROUP BY t.j
),
m{r} AS (SELECT MAX(ABS(w)) AS m FROM w{r}),
v{r} AS (
  SELECT j, w // (m // {_EIG_SCALE} + 1) AS v FROM w{r}, m{r}
)""")
        prev = f"v{r}"
    body = ",".join(rounds)
    return f"""
WITH t AS (
  SELECT vec_id, i AS j,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {_EIG_QUANT}) AS BIGINT) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
v0 AS (SELECT i AS j, {_EIG_SCALE} AS v FROM unnest(range(1, 65)) AS u0(i)),
{body}
SELECT j AS dim, CAST(v AS BIGINT) AS v
FROM {prev}
"""


@query("embedding_top_eigvec", oracle=_eig_oracle(), tags=("linalg", "iterative", "ann"))
def embedding_top_eigvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top eigenvector of the embedding second-moment matrix XᵀX by
    THREE rounds of matrix-free power iteration, exact in int64: X is
    quantized to integer thousandths (widened to double BEFORE the
    multiply — float32 arithmetic rounds 319.49999928f to 319.5 and
    flips the tie; measured at sf0.1), v starts as the all-ones
    fixed-point vector, and each round computes s = Xv (row dot
    products: join on dim, aggregate per vector) then w = Xᵀs (column
    combination: join on vec_id, aggregate per dim), then rescales
    w back into the 2^16 fixed-point box with a truncating divide —
    both engines truncate BIGINT division identically, so every round
    is bit-reproducible under ANY partitioning (a float power iteration
    would hash-flap on aggregation order). The direction this recovers
    is what rank-1 whitening removes before IVF/PQ indexing — see the
    similarity family.

    Plan per round: one broadcast join of the 64-row v against the
    (vec, dim, q) triples + map-combined per-vector aggregate, then one
    shuffle join of per-vector s back to triples + per-dim aggregate
    (64 rows out); only the 64-vector and one scalar ever reach the
    driver. The triples table is built once from posexplode and cached;
    rounds are O(nnz) each — the matrix-free cost model that scales to
    X too large to materialize anywhere. Overflow audit: |q| ≤ ~4·10³,
    |v| ≤ 2^16 ⇒ |s| ≤ 64·4·10³·2^16 < 2^35; |w| ≤ N·4·10³·2^35 — safe
    in int64 to N ≈ 10⁷ rows per partition-free sum; beyond that, bump
    the rescale to every half-round."""
    emb = load_table(spark, sf_dir, "embeddings")
    t = (
        emb.select(
            "vec_id", F.posexplode("embedding").alias("pos", "x")
        )
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("j"),
            F.expr(f"cast(round(cast(x as double) * {_EIG_QUANT}) as bigint)").alias("q"),
        )
        .persist()
    )
    dims = 64
    v = {j: _EIG_SCALE for j in range(1, dims + 1)}
    try:
        for _ in range(_EIG_ROUNDS):
            vdf = spark.createDataFrame(
                [(j, vj) for j, vj in v.items()], "j int, v bigint"
            )
            s = (
                t.join(F.broadcast(vdf), "j")
                .groupBy("vec_id")
                .agg(F.sum(F.col("q") * F.col("v")).alias("s"))
            )
            w_rows = (
                t.join(s, "vec_id")
                .groupBy("j")
                .agg(F.sum(F.col("q") * F.col("s")).alias("w"))
                .collect()
            )
            w = {r["j"]: r["w"] for r in w_rows}
            m = max(abs(x) for x in w.values())
            step = m // _EIG_SCALE + 1
            # truncating divide toward zero — identical to BIGINT // in
            # DuckDB and `div` in Spark
            v = {
                j: (abs(x) // step if x >= 0 else -(abs(x) // step))
                for j, x in w.items()
            }
    finally:
        t.unpersist()
    return spark.createDataFrame(
        sorted(v.items()), "dim bigint, v bigint"
    )
