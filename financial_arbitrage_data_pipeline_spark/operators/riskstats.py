"""Risk and rank statistics: historical VaR/CVaR, Spearman rank
correlation, and the exact-median bisection loop.

- ``var_cvar_per_pair`` — the tail-risk pair: historical Value-at-Risk
  (the 95th-percentile loss, exact order statistic) and Conditional VaR
  (expected shortfall — the mean of the tail at and beyond VaR, the
  coherent-risk-measure fix for VaR's blindness past the quantile).
- ``spearman_rank_corr`` — monotonic-trend detection per tape: Pearson
  correlation of RANKS (tie groups at their average rank) between time
  order and price, exact in int64 via the 2×-rank trick the engine's
  Mann-Whitney already pins.
- ``exact_median_bisect`` — the EXACT global median without any sort or
  shuffle of the data: ~log2(range) rounds of `count(x <= mid)`, each a
  map-combined aggregate. The 100 TB answer to "exact percentile,
  please" when a terabyte-scale global sort is off the table.

All exact integer arithmetic until declared, fixed-sequence IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Historical VaR / CVaR per pair
# ---------------------------------------------------------------------------
_VAR_PCT = 95

_VAR_ORACLE = f"""
WITH q AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
mv AS (
  SELECT user_id, ts_us, event_id,
         LAG(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           - cents AS loss
  FROM q
),
l AS (SELECT user_id, ts_us, event_id, loss FROM mv WHERE loss IS NOT NULL),
r AS (
  SELECT user_id, loss,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY loss, ts_us, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM l
)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_moves,
       MAX(CASE WHEN rn = ({_VAR_PCT} * n + 99) // 100 THEN loss END)
         AS var95_cents,
       CAST(SUM(CASE WHEN rn >= ({_VAR_PCT} * n + 99) // 100 THEN loss
                     ELSE 0 END) AS BIGINT) AS cvar95_numer,
       CAST(SUM(CASE WHEN rn >= ({_VAR_PCT} * n + 99) // 100 THEN loss
                     ELSE 0 END) AS DOUBLE)
         / (MAX(n) - ({_VAR_PCT} * MAX(n) + 99) // 100 + 1) AS cvar95_cents
FROM r GROUP BY user_id
"""


@query("var_cvar_per_pair", oracle=_VAR_ORACLE, tags=("A8", "risk"))
def var_cvar_per_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical VaR(95) and CVaR(95) per pair off the tick tape:
    losses are backward quote moves in exact cents; VaR is the loss at
    rank ceil(0.95·n) of the per-pair loss order (an ORDER STATISTIC,
    not an interpolated quantile — it is a value that actually
    occurred), and CVaR/expected shortfall is the mean of every loss at
    or beyond that rank — the coherent tail measure Basel moved to
    precisely because VaR ignores everything past the quantile. Ties
    broken by (ts, event_id) so the rank is total; the integer tail sum
    is emitted next to the ONE IEEE divide that forms the mean.

    Plan: ONE sort-shuffle on the pair key serves everything — the LAG
    window, the loss-rank window (same partition key, new intra-
    partition sort only), the per-pair count, and the final rollup
    (clustering satisfied). At 100 TB this is the standard
    one-exchange tape shape every timeseries operator here uses; the
    loss re-sort is per-pair in memory, never a second exchange."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    wt = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    mv = q.select(
        "user_id",
        "ts_us",
        "event_id",
        (F.lag("cents").over(wt) - F.col("cents")).alias("loss"),
    ).filter(F.col("loss").isNotNull())
    wl = Window.partitionBy("user_id").orderBy("loss", "ts_us", "event_id")
    wp = Window.partitionBy("user_id")
    r = mv.select(
        "user_id",
        "loss",
        F.row_number().over(wl).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    rank = (F.lit(_VAR_PCT) * F.col("n") + 99) / 100  # used via expr below
    cut = F.expr(f"({_VAR_PCT} * n + 99) div 100")
    tail = F.when(F.col("rn") >= cut, F.col("loss")).otherwise(0)
    return r.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_moves"),
        F.max(F.when(F.col("rn") == cut, F.col("loss"))).alias("var95_cents"),
        F.sum(tail).cast("long").alias("cvar95_numer"),
        (
            F.sum(tail).cast("double")
            / (
                F.max("n")
                - F.expr(f"({_VAR_PCT} * max(n) + 99) div 100")
                + 1
            )
        ).alias("cvar95_cents"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (price vs time) per pair
# ---------------------------------------------------------------------------
_SPEARMAN_ORACLE = """
WITH q AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
rk AS (
  SELECT user_id,
         2 * ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS x2,
         2 * RANK() OVER (PARTITION BY user_id ORDER BY cents)
           + COUNT(*) OVER (PARTITION BY user_id, cents) - 1 AS y2
  FROM q
),
m AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x2) AS BIGINT) AS sx, CAST(SUM(y2) AS BIGINT) AS sy,
         CAST(SUM(x2 * x2) AS BIGINT) AS sxx,
         CAST(SUM(y2 * y2) AS BIGINT) AS syy,
         CAST(SUM(x2 * y2) AS BIGINT) AS sxy
  FROM rk GROUP BY user_id
)
SELECT user_id, n,
       n * sxy - sx * sy AS rho_numer,
       n * sxx - sx * sx AS varx4,
       n * syy - sy * sy AS vary4,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
            END AS spearman_rho
FROM m
"""


@query("spearman_rank_corr", oracle=_SPEARMAN_ORACLE, tags=("A8", "stats"))
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation between time order and price per pair —
    the distribution-free monotonic-trend detector (a tape can trend
    hard with near-zero Pearson on levels; Spearman sees any monotone
    drift): Pearson correlation of ranks with tie groups at their
    AVERAGE rank. Exactness: average ranks live in halves, so
    everything is computed in 2×-rank integers (the engine's
    Mann-Whitney tie algebra) — y2 = 2·rank + tiecount − 1 is always
    int64 — and the moment sums stay exact; the declared IEEE sequence
    is num / (sqrt(varx)·sqrt(vary)) with the integer numerator and
    both variance terms emitted for the audit. Constant tapes (zero
    rank variance) yield NULL, not a fake 0.

    Plan: ONE exchange on the pair key — the time row_number, the
    price RANK, and the (pair, cents) tie COUNT windows are all
    satisfied by pair clustering (hash(user_id) ⊆ any (user_id, …)
    requirement), and the moment rollup groups on the same key."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    wu = Window.partitionBy("user_id")
    rk = q.select(
        "user_id",
        (2 * F.row_number().over(wu.orderBy("ts_us", "event_id"))).alias("x2"),
        (
            2 * F.rank().over(wu.orderBy("cents"))
            + F.count(F.lit(1)).over(Window.partitionBy("user_id", "cents"))
            - 1
        ).alias("y2"),
    )
    m = rk.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x2").cast("long").alias("sx"),
        F.sum("y2").cast("long").alias("sy"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("sxx"),
        F.sum(F.col("y2") * F.col("y2")).cast("long").alias("syy"),
        F.sum(F.col("x2") * F.col("y2")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.when(
        (varx > 0) & (vary > 0),
        num.cast("double")
        / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
    )
    return m.select(
        "user_id",
        "n",
        num.alias("rho_numer"),
        varx.alias("varx4"),
        vary.alias("vary4"),
        rho.alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Exact global median by bisection (no sort, no shuffle of data)
# ---------------------------------------------------------------------------
_MEDIAN_ORACLE = """
WITH t AS (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
n AS (SELECT COUNT(*) AS cnt FROM t),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM t)
SELECT CAST(n.cnt AS BIGINT) AS n, r.c AS median_cents
FROM r, n WHERE r.rn = (n.cnt + 1) // 2
"""


_MEDIAN_HIST_BUCKETS = 65536
_median_passes_last: int = -1  # observability hook for the pass-count pin


@query("exact_median_bisect", oracle=_MEDIAN_ORACLE, tags=("A8", "iterative"))
def exact_median_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT global median (lower median, rank ⌈n/2⌉) computed by
    HISTOGRAM PARTITION (VERDICT r9 task 4 — replacing the r9 O(log₂
    range) bisection): one count/min/max pass, then each round buckets
    the live interval into {_MEDIAN_HIST_BUCKETS} ranges with one
    map-combined groupBy-count (≤{_MEDIAN_HIST_BUCKETS} rows to the
    driver), walks the cumulative counts to the bucket holding rank
    ⌈n/2⌉, and recurses into it. Each round divides the value range by
    {_MEDIAN_HIST_BUCKETS}, so any 32-bit domain is EXACT within two
    histogram passes (65536² > 2³²; vs ~16 bisection scans) —
    at 100 TB that's 3 scans total where a global sort would shuffle
    the entire table. The tie convention is unchanged: the answer is
    the smallest attained v with count(≤v) ≥ ⌈n/2⌉ (the cumulative
    walk can only cross the target at a nonzero bucket). The oracle
    recomputes the same order statistic by brute-force ranking."""
    global _median_passes_last
    ev = load_table(spark, sf_dir, "events")
    proj = ev.select(
        F.expr("cast(round(value * 100) as bigint)").alias("c")
    ).persist()
    b = _MEDIAN_HIST_BUCKETS
    try:
        row = proj.agg(
            F.count("c").alias("n"), F.min("c").alias("lo"), F.max("c").alias("hi")
        ).collect()[0]
        n, lo, hi = row["n"], row["lo"], row["hi"]
        target = (n + 1) // 2
        below = 0  # rows with c < lo (outside the live interval)
        passes = 0
        while lo < hi:
            width = (hi - lo) // b + 1
            hist = dict(
                proj.filter((F.col("c") >= lo) & (F.col("c") <= hi))
                .groupBy(F.expr(f"(c - {lo}) div {width}").alias("bk"))
                .count()
                .collect()
            )
            passes += 1
            cum = below
            for bk in sorted(hist):
                if cum + hist[bk] >= target:
                    lo, hi = lo + bk * width, min(hi, lo + (bk + 1) * width - 1)
                    below = cum
                    break
                cum += hist[bk]
        _median_passes_last = passes
    finally:
        proj.unpersist()
    return spark.createDataFrame([(int(n), int(lo))], "n bigint, median_cents bigint")


# ---------------------------------------------------------------------------
# Max adverse / favorable excursion after each fill
# ---------------------------------------------------------------------------
_MAE_HORIZON_US = 3_600_000_000  # 1 hour

_MAE_ORACLE = f"""
WITH tape AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS px
  FROM events WHERE event_type IN ('view', 'purchase')
),
w AS (
  SELECT user_id, event_type, ts_us, event_id, px,
         MIN(CASE WHEN event_type = 'view' THEN px END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN CURRENT ROW AND {_MAE_HORIZON_US} FOLLOWING)
           AS min_quote,
         MAX(CASE WHEN event_type = 'view' THEN px END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN CURRENT ROW AND {_MAE_HORIZON_US} FOLLOWING)
           AS max_quote
  FROM tape
)
SELECT user_id, event_id, px AS fill_px,
       CAST(px - min_quote AS BIGINT) AS mae_cents,
       CAST(max_quote - px AS BIGINT) AS mfe_cents
FROM w
WHERE event_type = 'purchase' AND min_quote IS NOT NULL
"""


@query("fill_excursion_mae_mfe", oracle=_MAE_ORACLE, tags=("risk", "W2"))
def fill_excursion_mae_mfe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX ADVERSE / FAVORABLE EXCURSION per fill (Sweeney's MAE/MFE —
    the trade-management statistic stop-loss placement is tuned on):
    for every buy fill, the lowest and highest quote on the same pair
    within the following hour, as exact integer excursions from the
    fill price (mae = fill − worst quote; mfe = best quote − fill).
    A strategy whose winners show small MAE tolerates tight stops; one
    whose MAE routinely exceeds its MFE is picking tops.

    Plan: fills and quotes ride ONE union tape and ONE pair-keyed
    sort-shuffle; both excursions are conditional MIN/MAX over a
    forward RANGE frame (event-time µs bounds), so there is no
    fill×quote join at all — the same forward-frame shape as
    effective_spread_metrics' t+5m mid. Fills with no forward quote in
    the horizon are excluded, not extrapolated."""
    ev = load_table(spark, sf_dir, "events")
    tape = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("px"),
    )
    quote_px = F.when(F.col("event_type") == "view", F.col("px"))
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(0, _MAE_HORIZON_US)
    )
    w = tape.select(
        "user_id",
        "event_type",
        "event_id",
        "px",
        F.min(quote_px).over(wf).alias("min_quote"),
        F.max(quote_px).over(wf).alias("max_quote"),
    )
    return w.filter(
        (F.col("event_type") == "purchase") & F.col("min_quote").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.col("px").alias("fill_px"),
        (F.col("px") - F.col("min_quote")).cast("long").alias("mae_cents"),
        (F.col("max_quote") - F.col("px")).cast("long").alias("mfe_cents"),
    )
