"""Distribution-level diagnostics: KMV distinct sketch, total-variation
drift, and Heaps-law vocabulary growth.

Three operators a 100 TB pipeline runs before trusting its own tables:

- ``kmv_distinct_sketch`` — the K-Minimum-Values cardinality estimator
  (Bar-Yossef et al. 2002): keep the k smallest hash values ever seen;
  the k-th smallest alone estimates distinct count as (k-1)·M/h_(k).
  Mergeable (union = k smallest of the union), O(k) state — the
  bounded-memory answer where exact COUNT(DISTINCT) needs a full
  shuffle. Run here per language with the estimate NEXT TO the exact
  count, so the error column is the audit.
- ``distribution_drift_tvd`` — total-variation distance between the
  early and late halves of the tape, per event type: the drift gate a
  training pipeline runs before mixing time slices. TVD's numerator
  Σ|n_i·M − m_i·N| stays in int64; ONE IEEE divide at the end.
- ``heaps_vocab_growth`` — the type-token curve (Heaps' law): vocabulary
  size at 10 corpus-prefix checkpoints — the measurement that sizes a
  tokenizer's vocab budget before a BPE train run.

All integer/fixed-point until the declared final divides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# KMV distinct sketch per language
# ---------------------------------------------------------------------------
_KMV_K = 64
_HASH_MOD = 1_000_000_007  # hash domain [0, M) — shared with doc_fingerprints

# polynomial rolling hash of a token's characters, identical fold on both
# engines (the doc_fingerprints scheme, applied per token)
_TOK_HASH_SQL = f"""
list_reduce(
  list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(token, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
  (acc, x) -> (acc * 131 + x) % {_HASH_MOD}
)
"""

_KMV_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
),
h AS (
  SELECT DISTINCT lang, {_TOK_HASH_SQL} AS h FROM tok
),
r AS (
  SELECT lang, h,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM h
)
SELECT lang,
       CAST(n AS BIGINT) AS n_distinct,
       CAST(h AS BIGINT) AS kth_min_hash,
       CASE WHEN n >= {_KMV_K}
            -- product folded in Python: DuckDB types both literals
            -- INT32 and the runtime multiply overflows (first caught
            -- by the sf1 heavy gate)
            THEN CAST({(_KMV_K - 1) * _HASH_MOD} AS DOUBLE) / h
            ELSE CAST(n AS DOUBLE) END AS est_distinct
FROM r WHERE rn = CASE WHEN n < {_KMV_K} THEN n ELSE {_KMV_K} END
"""


@query("kmv_distinct_sketch", oracle=_KMV_ORACLE, tags=("sketch", "A4"))
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (K-Minimum-Values) distinct-count sketch per language over
    the token vocabulary, audited against the exact count in the same
    row: hash every distinct token into [0, M), keep the k = 64
    smallest, and estimate distinct = (k−1)·M / h_(k). The sketch is
    mergeable (k smallest of a union = k smallest of each side's k
    smallest), so at 100 TB each partition ships O(k) values to one
    combiner where exact COUNT(DISTINCT) ships every value through a
    full shuffle — this query IS the accuracy audit you run on a sample
    before trusting the sketch fleet-wide (sibling of
    minhash_estimate_quality for the Jaccard sketch).

    Exactness: the token hash is the engine's integer rolling hash
    (doc_fingerprints fold, per token); ranks/counts int64; the single
    IEEE divide is the estimator itself. Plan: distinct (lang, hash)
    (one shuffle), then one lang-keyed window pass picks h_(k) and the
    exact count together; unsaturated sketches (n < k) fall back to the
    exact count, estimator error exactly 0."""
    docs = load_table(spark, sf_dir, "documents")
    tok_hash = F.aggregate(
        F.transform(F.split(F.col("token"), ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 131 + x) % _HASH_MOD,
    )
    h = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .select("lang", tok_hash.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("lang")
    r = h.select(
        "lang",
        "h",
        F.row_number().over(w.orderBy("h")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    kth = r.filter(
        F.col("rn") == F.when(F.col("n") < _KMV_K, F.col("n")).otherwise(_KMV_K)
    )
    est = F.when(
        F.col("n") >= _KMV_K,
        F.lit(float((_KMV_K - 1) * _HASH_MOD)) / F.col("h"),
    ).otherwise(F.col("n").cast("double"))
    return kth.select(
        "lang",
        F.col("n").cast("long").alias("n_distinct"),
        F.col("h").cast("long").alias("kth_min_hash"),
        est.alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Total-variation drift between tape halves, per event type
# ---------------------------------------------------------------------------
_TVD_BIN_CENTS = 2_500

_TVD_ORACLE = f"""
WITH bounds AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut FROM events
),
b AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) // {_TVD_BIN_CENTS} AS bin,
         CAST(SUM(CASE WHEN epoch_us(ts) <= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_i,
         CAST(SUM(CASE WHEN epoch_us(ts) > cut THEN 1 ELSE 0 END) AS BIGINT) AS m_i
  FROM events, bounds
  GROUP BY 1, 2
),
t AS (
  SELECT event_type, bin, n_i, m_i,
         SUM(n_i) OVER (PARTITION BY event_type) AS n,
         SUM(m_i) OVER (PARTITION BY event_type) AS m
  FROM b
),
s AS (
  SELECT event_type, bin, n, m,
         ABS(n_i * m - m_i * n) AS diff,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(n_i * m - m_i * n) DESC, bin) AS rk
  FROM t
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_early,
       CAST(MAX(m) AS BIGINT) AS n_late,
       CAST(SUM(diff) AS BIGINT) AS tvd_numer,
       CAST(SUM(diff) AS DOUBLE) / (2 * MAX(n) * MAX(m)) AS tvd,
       CAST(MAX(CASE WHEN rk = 1 THEN bin END) AS BIGINT) AS top_drift_bin
FROM s GROUP BY event_type
"""


@query("distribution_drift_tvd", oracle=_TVD_ORACLE, tags=("data-quality", "drift"))
def distribution_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION DRIFT gate: total-variation distance between the
    price histograms of the tape's early and late halves, per event
    type — the train/serve skew check a pipeline runs before mixing
    time slices into one training set (PSI's log-free, metric-true
    sibling: TVD = ½·Σ|p_i − q_i| = largest probability difference any
    event can have between the halves). The numerator Σ|n_i·M − m_i·N|
    is exact int64 and emitted alongside; the ONE IEEE divide by 2NM
    happens per type at the end. top_drift_bin names the histogram bin
    contributing most drift (ties → lowest bin), so the gate's verdict
    is actionable, not just a score.

    Plan: the time cut is a 1-row scalar bound broadcast by cross join
    (the engine's standard allowlisted shape); counts map-combine into
    a (type, bin) hash aggregate (one exchange over ~types×bins rows);
    the per-type totals + argmax + final rollup all share ONE
    type-keyed exchange (window partitioning satisfies the later
    groupBy's clustering). Nothing downstream of the first aggregate
    sees more than histogram-sized data — at 100 TB the tape is read
    once and reduced map-side."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    # non-negative epochs: floor-div == trunc-div, identical to DuckDB //
    bounds = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("cut"))
    binned = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "event_type",
            F.expr(f"cast(round(value * 100) as bigint) div {_TVD_BIN_CENTS}").alias(
                "bin"
            ),
        )
        .agg(
            F.sum(F.when(F.col("ts_us") <= F.col("cut"), 1).otherwise(0)).alias("n_i"),
            F.sum(F.when(F.col("ts_us") > F.col("cut"), 1).otherwise(0)).alias("m_i"),
        )
    )
    w = Window.partitionBy("event_type")
    diff = F.abs(F.col("n_i") * F.col("m") - F.col("m_i") * F.col("n"))
    t = binned.select(
        "event_type",
        "bin",
        "n_i",
        "m_i",
        F.sum("n_i").over(w).alias("n"),
        F.sum("m_i").over(w).alias("m"),
    ).select(
        "event_type",
        "bin",
        "n",
        "m",
        diff.alias("diff"),
        F.row_number()
        .over(w.orderBy(diff.desc(), F.col("bin")))
        .alias("rk"),
    )
    return t.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_early"),
        F.max("m").cast("long").alias("n_late"),
        F.sum("diff").cast("long").alias("tvd_numer"),
        (
            F.sum("diff").cast("double")
            / (2 * F.max("n") * F.max("m")).cast("double")
        ).alias("tvd"),
        F.max(F.when(F.col("rk") == 1, F.col("bin"))).cast("long").alias(
            "top_drift_bin"
        ),
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth at 10 corpus-prefix checkpoints
# ---------------------------------------------------------------------------
_N_CHECKPOINTS = 10


def _heaps_oracle() -> str:
    ks = range(1, _N_CHECKPOINTS + 1)
    thr = {
        k: f"(SELECT lo + ((hi - lo) * {k}) // {_N_CHECKPOINTS} FROM bounds)"
        for k in ks
    }
    vocab_terms = ",\n       ".join(
        f"SUM(CASE WHEN first_doc <= {thr[k]} THEN 1 ELSE 0 END) AS v{k}" for k in ks
    )
    tok_terms = ",\n       ".join(
        f"SUM(CASE WHEN doc_id <= {thr[k]} THEN n_tok ELSE 0 END) AS t{k},"
        f" SUM(CASE WHEN doc_id <= {thr[k]} THEN 1 ELSE 0 END) AS d{k}"
        for k in ks
    )
    rows = " UNION ALL ".join(
        f"SELECT {k} AS checkpoint, "
        f"(SELECT CAST(d{k} AS BIGINT) FROM toks) AS n_docs, "
        f"(SELECT CAST(t{k} AS BIGINT) FROM toks) AS n_tokens, "
        f"(SELECT CAST(v{k} AS BIGINT) FROM vocab) AS vocab_size"
        for k in ks
    )
    return f"""
WITH bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
ft AS (
  SELECT MIN(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
vocab AS (SELECT {vocab_terms} FROM ft),
toks AS (
  SELECT {tok_terms}
  FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents)
)
{rows}
"""


@query("heaps_vocab_growth", oracle=_heaps_oracle(), tags=("corpus", "A4", "text"))
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS-LAW vocabulary growth: distinct token types seen after each
    tenth of the corpus (by doc_id order) next to cumulative token
    count — the type-token curve that sizes a BPE vocab budget and
    detects template-heavy corpora (vocab that plateaus early = heavy
    boilerplate; cf. the dedup family) before a tokenizer train run.

    The distributed trick: the curve needs "distinct types in every
    prefix", but each token type enters the vocabulary exactly once —
    at its FIRST document. So one groupBy(token)→min(doc_id) (the only
    data-sized shuffle) converts prefix-distinct into plain conditional
    counting: vocab at checkpoint k = count of types with first_doc ≤
    t_k, computed as 10 conditional sums in ONE aggregate. Checkpoints
    are fixed integer fractions of the doc-id RANGE (scalar bounds via
    the allowlisted 1-row broadcast cross join), so no sort and no
    per-row decile window anywhere. Token totals reduce map-side off
    per-doc counts. All counts int64; no floats at all."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    ks = list(range(1, _N_CHECKPOINTS + 1))

    first = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(bounds))
    )
    # integer floor division: (hi-lo)*k and N are non-negative, so SQL div
    thr = {
        k: F.col("lo")
        + F.expr(f"((hi - lo) * {k}) div {_N_CHECKPOINTS}")
        for k in ks
    }
    vocab = first.agg(
        *[
            F.sum(F.when(F.col("first_doc") <= thr[k], 1).otherwise(0)).alias(f"v{k}")
            for k in ks
        ]
    )
    toks = (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
        .crossJoin(F.broadcast(bounds))
        .agg(
            *[
                expr
                for k in ks
                for expr in (
                    F.sum(
                        F.when(F.col("doc_id") <= thr[k], F.col("n_tok")).otherwise(0)
                    ).alias(f"t{k}"),
                    F.sum(F.when(F.col("doc_id") <= thr[k], 1).otherwise(0)).alias(
                        f"d{k}"
                    ),
                )
            ]
        )
    )
    one = vocab.crossJoin(toks)
    stack_args = ", ".join(
        f"{k}, d{k}, t{k}, v{k}" for k in ks
    )
    return one.select(
        F.expr(
            f"stack({_N_CHECKPOINTS}, {stack_args}) "
            "as (checkpoint, n_docs, n_tokens, vocab_size)"
        )
    ).select(
        F.col("checkpoint").cast("long").alias("checkpoint"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab_size").cast("long").alias("vocab_size"),
    )
