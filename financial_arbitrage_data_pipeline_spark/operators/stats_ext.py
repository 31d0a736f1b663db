"""Distribution-free experiment gates: Hoeffding mean test and Q-Q
decile drift.

- ``ab_test_hoeffding_gate`` — the assumption-free A/B significance
  gate: two-sample Hoeffding bound. No normality, no variance estimate,
  no ranks — just the observed value range and sample sizes. The
  companion to ab_test_mannwhitney: Mann-Whitney detects distribution
  shift, Hoeffding certifies a MEAN difference with a finite-sample
  guarantee (the gate you want before shipping a config change whose
  cost function is the mean).
- ``qq_drift_deciles`` — the quantile-quantile readout for
  distribution_drift_tvd's verdict: WHERE in the distribution the early
  and late halves disagree, as nine exact decile order statistics per
  side plus the worst decile gap. TVD says "how much", KS says "max CDF
  gap", Q-Q says "which quantiles moved" — the actionable form.

Both exact-integer until the declared fixed IEEE sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

# ln(2/0.05) for the two-sided delta = 0.05 Hoeffding bound — a shared
# literal on both engines so no platform log touches the hash. In SQL it
# MUST be cast from a string: DuckDB parses a bare 17-digit literal as
# DECIMAL(17,16), whose multiply rounds differently from IEEE double by
# 1 ULP (measured).
_HOEFF_LN_2_OVER_DELTA = 3.6888794541139363
_HOEFF_C_SQL = f"CAST('{_HOEFF_LN_2_OVER_DELTA!r}' AS DOUBLE)"

_HOEFF_ORACLE = f"""
WITH v AS (
  SELECT event_type, user_id % 2 AS arm,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
         MIN(cents) AS lo, MAX(cents) AS hi
  FROM v GROUP BY event_type
)
SELECT event_type, n0, n1, s0, s1,
       CAST(hi - lo AS BIGINT) AS range_cents,
       ABS(CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1) AS mean_gap,
       (hi - lo) * sqrt({_HOEFF_C_SQL}
                        * (1.0 / n0 + 1.0 / n1) / 2) AS epsilon,
       ABS(CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1)
         > (hi - lo) * sqrt({_HOEFF_C_SQL}
                            * (1.0 / n0 + 1.0 / n1) / 2) AS significant
FROM g
"""


@query("ab_test_hoeffding_gate", oracle=_HOEFF_ORACLE, tags=("stats", "ab-test"))
def ab_test_hoeffding_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample HOEFFDING gate per event type: arms split by user
    parity; the mean value difference is significant at two-sided
    δ = 0.05 iff |mean₀ − mean₁| > (hi−lo)·sqrt(ln(2/δ)·(1/n₀+1/n₁)/2).
    Distribution-free and finite-sample — no normality, no variance
    estimate, no asymptotics — so a pass is a GUARANTEE, not a p-value
    folklore. Conservative by design (the range factor); use it as the
    ship gate and Mann-Whitney as the sensitive detector.

    Exactness: counts, integer-cent sums, and the observed range are
    exact int64 columns in the output; the declared IEEE sequence is the
    two mean divides, the fixed ln(2/δ) literal (shared on both
    engines — no platform log), one sqrt, one multiply, one compare.
    Plan: ONE map-combined aggregate over the tape per event type —
    conditional sums, no window, no join, nothing but a scan and a
    5-row hash aggregate at any scale."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    g = v.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    )
    mean_gap = F.abs(
        F.col("s0").cast("double") / F.col("n0")
        - F.col("s1").cast("double") / F.col("n1")
    )
    eps = (F.col("hi") - F.col("lo")) * F.sqrt(
        F.lit(_HOEFF_LN_2_OVER_DELTA)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
        / 2
    )
    return g.select(
        "event_type",
        "n0",
        "n1",
        "s0",
        "s1",
        (F.col("hi") - F.col("lo")).cast("long").alias("range_cents"),
        mean_gap.alias("mean_gap"),
        eps.alias("epsilon"),
        (mean_gap > eps).alias("significant"),
    )


_QQ_ORACLE = """
WITH bounds AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut FROM events
),
v AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) <= cut THEN 0 ELSE 1 END AS half,
         CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS ts_us, event_id
  FROM events, bounds
),
r AS (
  SELECT event_type, half, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type, half
                            ORDER BY cents, ts_us, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, half) AS n
  FROM v
),
d AS (
  SELECT event_type, half, k, cents
  FROM r JOIN (SELECT unnest(range(1, 10)) AS k) ks
    ON rn = (k * n + 9) // 10
)
SELECT e.event_type, e.k,
       e.cents AS q_early, l.cents AS q_late,
       ABS(e.cents - l.cents) AS decile_gap
FROM d e JOIN d l
  ON e.event_type = l.event_type AND e.k = l.k
WHERE e.half = 0 AND l.half = 1
"""


@query("qq_drift_deciles", oracle=_QQ_ORACLE, tags=("stats", "drift"))
def qq_drift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q DECILE drift per event type: the nine exact decile order
    statistics (rank ceil(k·n/10), ties broken by (ts, event_id)) of
    the tape's early half NEXT TO the late half's, with the absolute
    per-decile gap — the readout that turns distribution_drift_tvd's
    scalar verdict into "the 9th decile moved 40 cents, the median
    didn't": location-resolved drift, the actionable form.

    Exactness: deciles are attained values (order statistics, never
    interpolation), gaps exact int64. Plan: the time cut is the
    allowlisted 1-row scalar broadcast; ONE sort-shuffle on
    (event_type, half) serves the rank and count windows; the decile
    filter reduces each (type, half) to 9 rows BEFORE the early×late
    self-join, so the join moves 9·strata rows regardless of tape
    size."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    bounds = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("cut"))
    v = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.col("ts_us") <= F.col("cut"), 0).otherwise(1).alias("half"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        "ts_us",
        "event_id",
    )
    wp = Window.partitionBy("event_type", "half")
    r = v.select(
        "event_type",
        "half",
        "cents",
        F.row_number().over(wp.orderBy("cents", "ts_us", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    ks = F.array(*[F.lit(k) for k in range(1, 10)])
    d = (
        r.withColumn("k", F.explode(ks))
        .filter(F.col("rn") == F.expr("(k * n + 9) div 10"))
        .select("event_type", "half", "k", "cents")
    )
    e = d.filter(F.col("half") == 0).select(
        "event_type", "k", F.col("cents").alias("q_early")
    )
    l = d.filter(F.col("half") == 1).select(
        "event_type", "k", F.col("cents").alias("q_late")
    )
    return e.join(l, ["event_type", "k"]).select(
        "event_type",
        "k",
        "q_early",
        "q_late",
        F.abs(F.col("q_early") - F.col("q_late")).alias("decile_gap"),
    )


_WMEDIAN_ORACLE = """
WITH v AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         event_id % 5 + 1 AS wt
  FROM events
),
c AS (
  SELECT event_type, cents, wt,
         SUM(wt) OVER (PARTITION BY event_type
                       ORDER BY cents, ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(wt) OVER (PARTITION BY event_type) AS total
  FROM v
)
SELECT event_type,
       CAST(MAX(total) AS BIGINT) AS total_weight,
       MIN(CASE WHEN cum >= (total + 1) // 2 THEN cents END)
         AS weighted_median_cents
FROM c GROUP BY event_type
"""


@query("weighted_median_per_type", oracle=_WMEDIAN_ORACLE, tags=("stats", "A8"))
def weighted_median_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED lower median per event type: the smallest price whose
    cumulative fill weight (qty = event_id%5+1) reaches half the total —
    the volume-weighted center a size-aware desk quotes around, where
    the unweighted median treats a 1-lot and a 5-lot tick identically.
    Deterministic tie rule: cumulative order is (cents, ts, event_id),
    threshold the integer ceil(total/2) — always an attained value.

    Plan: ONE sort-shuffle on event_type serves the running-weight
    window, the total window, and the final rollup (same-key
    clustering). The per-group sibling of exact_median_bisect's global
    no-sort loop — here strata are few and small enough that the one
    sort-shuffle IS the cheap plan."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        (F.col("event_id") % 5 + 1).alias("wt"),
    )
    wt = Window.partitionBy("event_type")
    c = v.select(
        "event_type",
        "cents",
        F.sum("wt")
        .over(
            wt.orderBy("cents", "ts_us", "event_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
        F.sum("wt").over(wt).alias("total"),
    )
    return c.groupBy("event_type").agg(
        F.max("total").cast("long").alias("total_weight"),
        F.min(
            F.when(F.col("cum") >= F.expr("(total + 1) div 2"), F.col("cents"))
        ).alias("weighted_median_cents"),
    )


_LIFT_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS score,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
r AS (
  SELECT score, converted,
         ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS rn,
         COUNT(*) OVER () AS n,
         SUM(converted) OVER () AS conv_total
  FROM u
),
d AS (
  SELECT (10 * rn + n - 1) // n AS decile, converted, n, conv_total FROM r
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conv_rate,
       (CAST(SUM(converted) AS DOUBLE) / COUNT(*))
         / (CAST(MAX(conv_total) AS DOUBLE) / MAX(n)) AS lift
FROM d GROUP BY decile
"""


@query("score_decile_lift", oracle=_LIFT_ORACLE, tags=("stats", "ml-eval"))
def score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECILE LIFT table — the model-evaluation readout for a ranking
    score (here: engagement = summed view cents per account, predicting
    purchase conversion): users sorted by score, cut into 10 equal-count
    deciles (decile = ceil(10·rank/n), ties broken by user_id), and per
    decile the conversion rate and its LIFT over the global rate. A
    score that ranks well shows lift >> 1 in decile 1 decaying toward
    1 — the curve a targeting/quality model ships or dies on, and the
    aggregate companion to feature_split_gini's training view.

    Exactness: counts int64; the declared IEEE sequence per decile is
    rate = converted/n_users, global = conv_total/n, lift = rate/global
    (three divides, fixed order, identical on both engines). Plan: the
    tape reduces to ONE row per account first (map-combined aggregate —
    the only data-sized exchange); the global rank window then sorts
    only the account-sized score table (single-partition by design —
    acceptable precisely because accounts ≪ events; at larger account
    cardinality swap in the count-threshold decile assignment the
    engine's percentile ops use); the decile rollup is 10 rows."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "view",
                F.expr("cast(round(value * 100) as bigint)"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
    )
    wall = Window.orderBy(F.col("score").desc(), F.col("user_id"))
    wp = Window.partitionBy()
    r = u.select(
        "converted",
        F.row_number().over(wall).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("converted").over(wp).alias("conv_total"),
    )
    d = r.select(
        F.expr("(10 * rn + n - 1) div n").alias("decile"),
        "converted",
        "n",
        "conv_total",
    )
    rate = F.sum("converted").cast("double") / F.count(F.lit(1))
    glob = F.max("conv_total").cast("double") / F.max("n")
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        rate.alias("conv_rate"),
        (rate / glob).alias("lift"),
    )


_LATENESS_ORACLE = """
WITH v AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
m AS (
  SELECT event_type, ts_us, event_id,
         MAX(ts_us) OVER (PARTITION BY event_type
                          ORDER BY event_id
                          ROWS UNBOUNDED PRECEDING) AS seen_max
  FROM v
),
l AS (
  SELECT event_type, event_id,
         seen_max - ts_us AS lateness_us
  FROM m
),
r AS (
  SELECT event_type, lateness_us,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY lateness_us, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM l
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN lateness_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out_of_order,
       CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us,
       MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN lateness_us END)
         AS p99_lateness_us,
       CAST(SUM(CASE WHEN lateness_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late_over_1m
FROM r GROUP BY event_type
"""


@query("event_lateness_profile", oracle=_LATENESS_ORACLE, tags=("streaming", "T2", "stats"))
def event_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-ORDERNESS profile — the measurement that SETS a watermark:
    treating arrival order as event_id order (the feed's append
    sequence), each event's lateness is how far the already-seen
    event-time high-water mark is ahead of its own timestamp. Per event
    type: how many events arrive out of order, the worst lateness, the
    exact p99 lateness (the order statistic at rank ceil(0.99·n) — the
    number you'd pass to withWatermark plus margin), and how many
    exceed the streaming lanes' 1-minute default. Running this batch
    profile on a day of history is how the engine's watermark defaults
    (streaming/ingest.py) stop being guesses.

    Exactness: latenesses are integer µs; p99 is an attained value with
    (lateness, event_id) tie order. Plan: ONE sort-shuffle on event_type
    serves the running-max window (arrival order), the lateness-rank
    window (same key, intra-partition re-sort), and the rollup."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    wt = Window.partitionBy("event_type")
    m = v.select(
        "event_type",
        "event_id",
        (
            F.max("ts_us")
            .over(wt.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0))
            - F.col("ts_us")
        ).alias("lateness_us"),
    )
    r = m.select(
        "event_type",
        "lateness_us",
        F.row_number().over(wt.orderBy("lateness_us", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        F.sum(F.when(F.col("lateness_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_out_of_order"),
        F.max("lateness_us").cast("long").alias("max_lateness_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(99 * n + 99) div 100"), F.col("lateness_us"))
        ).alias("p99_lateness_us"),
        F.sum(F.when(F.col("lateness_us") > 60_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_late_over_1m"),
    )
