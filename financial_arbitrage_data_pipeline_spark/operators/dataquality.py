"""Data-quality operators: robust outlier detection, one-pass table
profiling, and referential-integrity auditing — the checks a pipeline
runs on every ingest before trusting a table (the reference leans on
Postgres constraints and hand confirms counts in its __main__ smoke
blocks, e.g. `database/models/postgres.py:548-633`; here they are
declarative, oracle-checked operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# Robust (median/MAD) anomaly sweep — the heavy-tail-safe sibling of
# price_anomaly_zscore's mean/sigma gate.
# ---------------------------------------------------------------------------
_MAD_K = 3.0


@query(
    "value_anomaly_mad",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT r.event_type, r.event_id, r.value, m.med,
         ABS(r.value - m.med) AS adev
  FROM ranked r JOIN med m ON m.event_type = r.event_type
),
dranked AS (
  SELECT event_type, event_id, value, med, adev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad
  FROM dranked GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.value, d.med, m.mad,
       d.adev > {_MAD_K} * m.mad AS is_outlier
FROM dev d JOIN mad m ON m.event_type = d.event_type
WHERE d.adev > {_MAD_K} * m.mad
""",
    tags=("data-quality", "anomaly", "robust"),
)
def value_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier sweep: flag event values more than {_MAD_K}x the
    median absolute deviation from their type's median — the
    heavy-tail-safe alternative to `price_anomaly_zscore` (one wild
    value inflates a mean/sigma gate into silence; medians don't move).
    Both medians are exact lower-medians by the shared nearest-rank
    formula (`(n+1) div 2`, deterministic id tie-break), so the oracle
    hash-matches without float tolerance: order statistics involve no
    accumulation. Plan: two keyed sort-windows + a broadcast of the
    K-row median/MAD tables back onto the deviations — two shuffles on
    event_type total, the floor for exact rank statistics; at 100 TB
    the documented swap is approx_percentile for both medians (same
    shape, sketch-mergeable)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )

    def lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val, "event_id")
        wn = Window.partitionBy("event_type")
        ranked = df.select(
            "event_type",
            val,
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        half = (((F.col("n") + 1) - (F.col("n") + 1) % 2) / 2).cast("long")
        return ranked.groupBy("event_type").agg(
            F.max(F.when(F.col("rn") == half, F.col(val))).alias(out)
        )

    med = lower_median(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = lower_median(
        dev.select("event_type", "event_id", "adev"), "adev", "mad"
    )
    flagged = dev.join(F.broadcast(mad), "event_type").filter(
        F.col("adev") > _MAD_K * F.col("mad")
    )
    return flagged.select(
        "event_type",
        "event_id",
        "value",
        "med",
        "mad",
        F.lit(True).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# One-pass table profile (the ANALYZE-style null/cardinality report)
# ---------------------------------------------------------------------------
_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query(
    "orders_profile",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,"
        f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"
        for c in _PROFILE_COLS
    ),
    tags=("data-quality", "profiling"),
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style PROFILE of the orders table: per column, row count,
    null count, and exact distinct cardinality — the statistics a data
    platform records on every ingest (and what a cost-based optimizer
    eats). Computed in ONE scan: all six per-column aggregates in a
    single agg (Spark plans multi-distinct via EXPAND — one shuffle
    carrying (column-tag, value) pairs), then unpivoted to one row per
    column with `stack`. At 100 TB the documented swap for the distinct
    counts is approx_count_distinct (HLL, no EXPAND multiplication);
    the nulls/counts stay exact either way."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
        ).alias("col_name", "nn", "nd"),
        "n_rows",
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("nn")).cast("long").alias("n_nulls"),
        F.col("nd").cast("long").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (FK orphan report across the schema)
# ---------------------------------------------------------------------------
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


@query(
    "referential_integrity_audit",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{ct}.{ck}' AS fk, '{pt}.{pk}' AS pk,"
        f" CAST(COUNT(*) AS BIGINT) AS n_child_rows,"
        f" CAST(COUNT(DISTINCT {ck}) AS BIGINT) AS n_distinct_fk,"
        f" CAST(COUNT(*) FILTER (WHERE {ck} NOT IN"
        f" (SELECT {pk} FROM {pt})) AS BIGINT) AS n_orphans"
        f" FROM {ct}"
        for ct, ck, pt, pk in _FK_EDGES
    ),
    tags=("data-quality", "integrity", "J-anti"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity AUDIT over the whole schema: for every
    foreign-key edge, the child row count, distinct key count, and the
    number of ORPHANS (child keys with no parent) — what the reference
    delegates to Postgres FK constraints
    (`database/models/postgres.py:449-544`) and a lakehouse must check
    itself. Each edge is a LEFT ANTI join counted — Spark broadcasts
    the parent key set when it is small (every dim here) so most edges
    add no shuffle; the fact-fact edge (lineitem→orders) is one keyed
    anti join, the unavoidable cost. An all-zero orphan column is the
    PASSING state of the audit — the query exists to prove it stays
    zero as tables evolve."""
    results = None
    for ct, ck, pt, pk in _FK_EDGES:
        child = load_table(spark, sf_dir, ct)
        parent = load_table(spark, sf_dir, pt).select(pk).distinct()
        orphans = (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        stats = child.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            F.countDistinct(ck).alias("n_distinct_fk"),
        )
        row = (
            stats.crossJoin(orphans)
            .select(
                F.lit(f"{ct}.{ck}").alias("fk"),
                F.lit(f"{pt}.{pk}").alias("pk"),
                F.col("n_child_rows").cast("long"),
                F.col("n_distinct_fk").cast("long"),
                F.col("n_orphans").cast("long"),
            )
        )
        results = row if results is None else results.unionByName(row)
    return results


# ---------------------------------------------------------------------------
# k-anonymity audit: re-identification risk over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_K = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS class_size
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, class_size,
       (class_size < {_KANON_K}) AS violates_k,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN class_size ELSE 0 END)
            OVER () AS BIGINT) AS rows_at_risk,
       CAST(SUM(class_size) OVER () AS BIGINT) AS rows_total
FROM classes
""",
    tags=("data-governance", "k-anonymity"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit: equivalence-class sizes over the
    quasi-identifier pair (nation, market segment) with a k={_KANON_K}
    anonymity verdict per class, plus the dataset-level exposure
    (rows living in sub-k classes — the rows a release would have to
    suppress or generalize). One keyed aggregation; the unpartitioned
    totals window runs over the CLASS table (bounded by the
    quasi-identifier domain, ~|nations| x |segments|), never the row
    table, so the global window is not a single-partition funnel at
    scale. The governance sibling of `orders_profile` and
    `referential_integrity_audit`."""
    classes = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    w = Window.partitionBy()
    return classes.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        (F.col("class_size") < _KANON_K).alias("violates_k"),
        F.sum(
            F.when(F.col("class_size") < _KANON_K, F.col("class_size")).otherwise(
                0
            )
        )
        .over(w)
        .cast("long")
        .alias("rows_at_risk"),
        F.sum("class_size").over(w).cast("long").alias("rows_total"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit: the classic fabricated-numbers screen
# ---------------------------------------------------------------------------
_BENFORD_CHI2_95 = 15.507  # chi-square 95th percentile, 8 dof


@query(
    "benford_first_digit_audit",
    oracle="""
WITH c AS (
  SELECT o_orderpriority AS priority,
         CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders WHERE round(o_totalprice * 100) > 0
),
g AS (
  SELECT priority,
         CAST(SUM(CASE WHEN digit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS obs_1,
         CAST(SUM(CASE WHEN digit = 2 THEN 1 ELSE 0 END) AS BIGINT) AS obs_2,
         CAST(SUM(CASE WHEN digit = 3 THEN 1 ELSE 0 END) AS BIGINT) AS obs_3,
         CAST(SUM(CASE WHEN digit = 4 THEN 1 ELSE 0 END) AS BIGINT) AS obs_4,
         CAST(SUM(CASE WHEN digit = 5 THEN 1 ELSE 0 END) AS BIGINT) AS obs_5,
         CAST(SUM(CASE WHEN digit = 6 THEN 1 ELSE 0 END) AS BIGINT) AS obs_6,
         CAST(SUM(CASE WHEN digit = 7 THEN 1 ELSE 0 END) AS BIGINT) AS obs_7,
         CAST(SUM(CASE WHEN digit = 8 THEN 1 ELSE 0 END) AS BIGINT) AS obs_8,
         CAST(SUM(CASE WHEN digit = 9 THEN 1 ELSE 0 END) AS BIGINT) AS obs_9,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY priority
)
SELECT priority, n,
       obs_1, obs_2, obs_3, obs_4, obs_5, obs_6, obs_7, obs_8, obs_9,
       ((CAST(obs_1 AS DOUBLE) - CAST(n AS DOUBLE) * 0.3010299956639812) * (CAST(obs_1 AS DOUBLE) - CAST(n AS DOUBLE) * 0.3010299956639812)) / (CAST(n AS DOUBLE) * 0.3010299956639812)
       + ((CAST(obs_2 AS DOUBLE) - CAST(n AS DOUBLE) * 0.17609125905568124) * (CAST(obs_2 AS DOUBLE) - CAST(n AS DOUBLE) * 0.17609125905568124)) / (CAST(n AS DOUBLE) * 0.17609125905568124)
       + ((CAST(obs_3 AS DOUBLE) - CAST(n AS DOUBLE) * 0.12493873660829992) * (CAST(obs_3 AS DOUBLE) - CAST(n AS DOUBLE) * 0.12493873660829992)) / (CAST(n AS DOUBLE) * 0.12493873660829992)
       + ((CAST(obs_4 AS DOUBLE) - CAST(n AS DOUBLE) * 0.09691001300805642) * (CAST(obs_4 AS DOUBLE) - CAST(n AS DOUBLE) * 0.09691001300805642)) / (CAST(n AS DOUBLE) * 0.09691001300805642)
       + ((CAST(obs_5 AS DOUBLE) - CAST(n AS DOUBLE) * 0.07918124604762482) * (CAST(obs_5 AS DOUBLE) - CAST(n AS DOUBLE) * 0.07918124604762482)) / (CAST(n AS DOUBLE) * 0.07918124604762482)
       + ((CAST(obs_6 AS DOUBLE) - CAST(n AS DOUBLE) * 0.06694678963061322) * (CAST(obs_6 AS DOUBLE) - CAST(n AS DOUBLE) * 0.06694678963061322)) / (CAST(n AS DOUBLE) * 0.06694678963061322)
       + ((CAST(obs_7 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05799194697768673) * (CAST(obs_7 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05799194697768673)) / (CAST(n AS DOUBLE) * 0.05799194697768673)
       + ((CAST(obs_8 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05115252244738129) * (CAST(obs_8 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05115252244738129)) / (CAST(n AS DOUBLE) * 0.05115252244738129)
       + ((CAST(obs_9 AS DOUBLE) - CAST(n AS DOUBLE) * 0.04575749056067514) * (CAST(obs_9 AS DOUBLE) - CAST(n AS DOUBLE) * 0.04575749056067514)) / (CAST(n AS DOUBLE) * 0.04575749056067514) AS chi2,
       (((CAST(obs_1 AS DOUBLE) - CAST(n AS DOUBLE) * 0.3010299956639812) * (CAST(obs_1 AS DOUBLE) - CAST(n AS DOUBLE) * 0.3010299956639812)) / (CAST(n AS DOUBLE) * 0.3010299956639812)
       + ((CAST(obs_2 AS DOUBLE) - CAST(n AS DOUBLE) * 0.17609125905568124) * (CAST(obs_2 AS DOUBLE) - CAST(n AS DOUBLE) * 0.17609125905568124)) / (CAST(n AS DOUBLE) * 0.17609125905568124)
       + ((CAST(obs_3 AS DOUBLE) - CAST(n AS DOUBLE) * 0.12493873660829992) * (CAST(obs_3 AS DOUBLE) - CAST(n AS DOUBLE) * 0.12493873660829992)) / (CAST(n AS DOUBLE) * 0.12493873660829992)
       + ((CAST(obs_4 AS DOUBLE) - CAST(n AS DOUBLE) * 0.09691001300805642) * (CAST(obs_4 AS DOUBLE) - CAST(n AS DOUBLE) * 0.09691001300805642)) / (CAST(n AS DOUBLE) * 0.09691001300805642)
       + ((CAST(obs_5 AS DOUBLE) - CAST(n AS DOUBLE) * 0.07918124604762482) * (CAST(obs_5 AS DOUBLE) - CAST(n AS DOUBLE) * 0.07918124604762482)) / (CAST(n AS DOUBLE) * 0.07918124604762482)
       + ((CAST(obs_6 AS DOUBLE) - CAST(n AS DOUBLE) * 0.06694678963061322) * (CAST(obs_6 AS DOUBLE) - CAST(n AS DOUBLE) * 0.06694678963061322)) / (CAST(n AS DOUBLE) * 0.06694678963061322)
       + ((CAST(obs_7 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05799194697768673) * (CAST(obs_7 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05799194697768673)) / (CAST(n AS DOUBLE) * 0.05799194697768673)
       + ((CAST(obs_8 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05115252244738129) * (CAST(obs_8 AS DOUBLE) - CAST(n AS DOUBLE) * 0.05115252244738129)) / (CAST(n AS DOUBLE) * 0.05115252244738129)
       + ((CAST(obs_9 AS DOUBLE) - CAST(n AS DOUBLE) * 0.04575749056067514) * (CAST(obs_9 AS DOUBLE) - CAST(n AS DOUBLE) * 0.04575749056067514)) / (CAST(n AS DOUBLE) * 0.04575749056067514)) > {thr} AS benford_reject
FROM g
""".replace("{thr}", repr(_BENFORD_CHI2_95)),
    tags=("data-quality", "A9", "audit"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit per order priority class: observed
    leading-digit counts of the order totals (integer cents) against the
    log-distribution, with a chi-square goodness-of-fit statistic and a
    95%-level reject flag — the standard screen for fabricated or
    truncated monetary populations, run before trusting a partner feed.

    Exactness: the first digit is taken from the DECIMAL STRING of the
    exact integer cents (no log10/pow on data, so no libm rounding);
    the nine expected probabilities are fixed double literals shared
    verbatim with the oracle; the chi-square is an explicit nine-term
    expression in digit order — a deterministic IEEE tree, never an
    order-dependent window sum of doubles. Counts pivot to columns so
    each group is ONE row and the statistic never crosses rows.

    Plan: one map-combined groupBy(priority) over a two-column scan —
    a single small shuffle at any scale (the pivot is 9 conditional
    counters inside the same aggregate)."""
    cents = F.expr("cast(round(o_totalprice * 100) as bigint)")
    c = (
        load_table(spark, sf_dir, "orders")
        .filter(cents > 0)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit"),
        )
    )
    obs = [
        F.sum(F.when(F.col("digit") == d, 1).otherwise(0))
        .cast("long")
        .alias(f"obs_{d}".format(d=d))
        for d in range(1, 10)
    ]
    g = c.groupBy("priority").agg(*obs, F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    probs = {1: '0.3010299956639812', 2: '0.17609125905568124', 3: '0.12493873660829992', 4: '0.09691001300805642', 5: '0.07918124604762482', 6: '0.06694678963061322', 7: '0.05799194697768673', 8: '0.05115252244738129', 9: '0.04575749056067514'}
    chi2 = None
    for d in range(1, 10):
        p = float(probs[d])
        dev = F.col(f"obs_{d}".format(d=d)).cast("double") - nd * p
        term = (dev * dev) / (nd * p)
        chi2 = term if chi2 is None else chi2 + term
    return g.select(
        "priority",
        "n",
        *[f"obs_{d}".format(d=d) for d in range(1, 10)],
        chi2.alias("chi2"),
        (chi2 > _BENFORD_CHI2_95).alias("benford_reject"),
    )
