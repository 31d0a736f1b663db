"""Time-series join operators: as-of join and bucketed range join.

The reference never declares these relationally, but they are the two
joins its ETL users reach for next: "what was the quote when this trade
printed?" (as-of) and "what happened around this event?" (range). The
reference approximates the first imperatively — the scanner keeps only
the latest value per key and reads it at decision time
(`virginia/logic/opportunity_scanner.py:190-191,296-297`), i.e. an
as-of lookup frozen at "now". Declared as a batch operator it becomes a
point-in-time join over the whole history, which Spark lacks as a
builtin; both operators here are compositions of shuffle-friendly
primitives chosen for 100 TB behavior:

- **As-of join** = union both sides with a side marker, one shuffle on
  the pair key, and a per-key `last(value, ignorenulls)` running window
  ordered by (event-time, side). No per-row probe, no range explosion;
  cost is exactly one sort-shuffle of quotes+trades — the same merge
  strategy kdb/QuestDB use, expressed declaratively so Catalyst keeps
  the sort inside the window exchange. Skewed keys salt like any other
  keyed window (functions/salting.py).
- **Range join** = equi-join on a time bucket of the window radius,
  with the left side exploded into the 3 candidate buckets and the
  residual |dt| <= radius filter applied post-join. This turns an
  O(n·m) interval predicate (which Spark would execute as
  BroadcastNestedLoopJoin or a cross product) into a hash join whose
  fan-out is bounded by 3x, then a single aggregation — the standard
  distributed interval-join decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

# 5-minute attribution radius, in µs (events.ts is ns in Spark — always
# compare at µs so the DuckDB oracle, which reads the same column at µs,
# agrees; see ns_to_us discipline in functions/core.py).
_RADIUS_US = 300_000_000


def asof_merge(quotes: DataFrame, trades: DataFrame) -> DataFrame:
    """The as-of core, shared by asof_quote_join and its edge tests:
    quotes(user_id, ts_us, quote_cents) x trades(event_id, user_id,
    ts_us) → each trade's latest quote at-or-before its ts (inclusive:
    quotes sort before trades at the same µs). One union + one keyed
    running window — a single sort-shuffle on the pair key."""
    merged = quotes.select(
        "user_id",
        "ts_us",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        "quote_cents",
    ).unionByName(
        trades.select(
            "user_id",
            "ts_us",
            F.lit(1).alias("side"),
            "event_id",
            F.lit(None).cast("long").alias("quote_cents"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("asof_q", F.last("quote_cents", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("trade_ts_us"),
            F.col("asof_q").alias("quote_cents"),
        )
    )


def count_within_radius(
    points: DataFrame, probes: DataFrame, radius_us: int = _RADIUS_US
) -> DataFrame:
    """The bucketed range-join core, shared by purchase_click_attribution
    and its edge tests: probes(event_id, p_ts) x points(c_ts) → per
    probe, the count of points within ±radius (inclusive). Equi-join on
    a radius-wide time bucket (probe exploded to its 3 candidate
    buckets) + exact residual filter — a hash join instead of the
    nested-loop plan a raw interval predicate gets."""
    b = F.expr(f"p_ts div {radius_us}")
    pb = probes.withColumn("bucket", F.explode(F.array(b - 1, b, b + 1)))
    cb = points.withColumn("bucket", F.expr(f"c_ts div {radius_us}"))
    hit = F.abs(F.col("c_ts") - F.col("p_ts")) <= F.lit(radius_us)
    return (
        pb.join(cb, "bucket", "left")
        .groupBy("event_id", "p_ts")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("nearby_clicks"))
    )


@query(
    "asof_quote_join",
    oracle="""
WITH q AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         MAX(CAST(round(value*100) AS BIGINT)) AS quote_cents
  FROM events
  WHERE event_type = 'view' AND value IS NOT NULL
  GROUP BY 1, 2
),
t AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT t.event_id, t.user_id, t.ts_us AS trade_ts_us, q.quote_cents
FROM t ASOF LEFT JOIN q
  ON t.user_id = q.user_id AND t.ts_us >= q.ts_us
""",
    tags=("asof-join", "J1", "W3"),
)
def asof_quote_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase gets the latest view-quote at or
    before its timestamp for the same pair key (user_id, the market.py
    convention) — the batch generalization of the scanner's latest-value
    lookup. Quotes are first reduced to one deterministic value per
    (key, µs) so ties are engine-independent; then one union + one
    keyed running window implements the as-of merge. The oracle states
    the same semantics with DuckDB's native ASOF LEFT JOIN (inclusive
    >=, matching quotes-sort-first in the window ordering)."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.expr("ts div 1000")
    quotes = (
        ev.filter((F.col("event_type") == "view") & F.col("value").isNotNull())
        .groupBy("user_id", ts_us.alias("ts_us"))
        .agg(F.max(F.round(F.col("value") * 100).cast("long")).alias("quote_cents"))
    )
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", ts_us.alias("ts_us")
    )
    return asof_merge(quotes, trades)


@query(
    "purchase_click_attribution",
    oracle=f"""
WITH c AS (
  SELECT epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id, epoch_us(ts) AS p_ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.p_ts AS purchase_ts_us,
       CAST(COUNT(c.c_ts) AS BIGINT) AS nearby_clicks
FROM p LEFT JOIN c
  ON c.c_ts BETWEEN p.p_ts - {_RADIUS_US} AND p.p_ts + {_RADIUS_US}
GROUP BY 1, 2
""",
    tags=("range-join", "F4"),
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join without an equi key: count clicks (any user) within
    +/-5 minutes of each purchase. Naively this is an interval predicate
    Spark can only run as a nested-loop/cross join; the bucketed
    decomposition makes it a plain hash join: clicks land in one
    radius-wide bucket, each purchase probes its 3 candidate buckets
    (explode), and the exact |dt| <= radius residual filters post-join.
    The grouped count collapses the 3x fan-out, and an unmatched
    purchase keeps its row via the left join (counting only matched
    rows). The oracle is the direct inequality join (DuckDB IEJoin)."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.expr("ts div 1000")
    clicks = ev.filter(F.col("event_type") == "click").select(ts_us.alias("c_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", ts_us.alias("p_ts")
    )
    return count_within_radius(clicks, purchases).select(
        "event_id",
        F.col("p_ts").alias("purchase_ts_us"),
        "nearby_clicks",
    )


@query(
    "quote_price_change",
    oracle="""
WITH q AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS quote_cents
  FROM events WHERE event_type = 'view' AND value IS NOT NULL
)
SELECT event_id, user_id, ts_us, quote_cents,
       quote_cents - LAG(quote_cents) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id) AS delta_cents
FROM q
""",
    tags=("W3", "P9"),
)
def quote_price_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key tick-to-tick quote change (LAG): integer-cent deltas so the
    series is exact under any partitioning; first quote per key keeps a
    NULL delta. One shuffle on the pair key with an in-partition sort —
    the same layout every other per-key window here reuses."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.filter((F.col("event_type") == "view") & F.col("value").isNotNull()).select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("quote_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return q.withColumn(
        "delta_cents", F.col("quote_cents") - F.lag("quote_cents").over(w)
    )


# ---------------------------------------------------------------------------
# Staleness gap detection (the reference's 300 s staleness alarm, batch form)
# ---------------------------------------------------------------------------
STALE_GAP_US = 24 * 3600 * 1_000_000  # 24 h against the 30-day fixture span


@query(
    "stale_ticker_alerts",
    oracle=f"""
WITH g AS (
  SELECT user_id AS ticker_id,
         epoch_us(ts) AS ts_us,
         event_id,
         LAG(epoch_us(ts)) OVER w AS prev_ts_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT ticker_id, prev_ts_us, ts_us AS resumed_ts_us,
       ts_us - prev_ts_us AS gap_us
FROM g
WHERE prev_ts_us IS NOT NULL AND ts_us - prev_ts_us > {STALE_GAP_US}
""",
    tags=("T2", "A8", "monitoring"),
)
def stale_ticker_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-staleness audit: every silence longer than 24 h per ticker,
    with when it started and when data resumed — the batch form of the
    reference's staleness alarm (fires at 300 s of silence,
    `database/coordinator.py:563-569`; threshold scaled to the 30-day
    fixture cadence). One LAG over (ticker, time): a single sort-shuffle
    partitioned by ticker, embarrassingly parallel across tickers at any
    scale. The streaming twin is the event-time-timeout eviction in
    streaming_subscriber_liveness — this query is how you backfill the
    same alarm over history."""
    ev = load_table(spark, sf_dir, "events")
    # order at µs precision (ts div 1000), not raw ns: DuckDB reads the
    # same column truncated to µs, so a sub-µs ts difference would give
    # the engines different LAG neighbors while the event_id tie-break
    # keeps them identical at µs
    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    g = ev.select(
        F.col("user_id").alias("ticker_id"),
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.lag(F.expr("ts div 1000")).over(w).alias("prev_ts_us"),
    )
    return (
        g.filter(
            F.col("prev_ts_us").isNotNull()
            & ((F.col("ts_us") - F.col("prev_ts_us")) > STALE_GAP_US)
        )
        .select(
            "ticker_id",
            "prev_ts_us",
            F.col("ts_us").alias("resumed_ts_us"),
            (F.col("ts_us") - F.col("prev_ts_us")).alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# Per-key z-score anomaly detection (two-pass, integer-exact moments)
# ---------------------------------------------------------------------------
ZSCORE_THRESHOLD = 3.0


@query(
    "price_anomaly_zscore",
    oracle=f"""
WITH c AS (
  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
stats AS (
  SELECT user_id,
         COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(cents * cents) AS BIGINT) AS ss
  FROM c GROUP BY user_id
)
SELECT c.event_id, c.user_id, c.cents,
       (CAST(c.cents AS DOUBLE) - CAST(s.s AS DOUBLE) / s.n)
         / sqrt(CAST(s.n * s.ss - s.s * s.s AS DOUBLE) / CAST(s.n AS DOUBLE) / CAST(s.n AS DOUBLE))
         AS zscore
FROM c JOIN stats s ON s.user_id = c.user_id
WHERE ABS((CAST(c.cents AS DOUBLE) - CAST(s.s AS DOUBLE) / s.n)
          / sqrt(CAST(s.n * s.ss - s.s * s.s AS DOUBLE) / CAST(s.n AS DOUBLE) / CAST(s.n AS DOUBLE)))
      > {ZSCORE_THRESHOLD}
""",
    tags=("A8", "monitoring", "anomaly"),
)
def price_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ticker price anomalies: events more than 3 population standard
    deviations from their own key's mean. The moments are integer-exact
    (cents and cents² sum in int64 — order-independent under any
    partitioning), and the float tail is a fixed op sequence
    (divide, subtract, sqrt, divide) that is bit-identical across
    engines — the discipline that makes a distributed anomaly sweep
    reproducible. Plan: one aggregation + one equi-join back on the
    grouping key (same shape as above_average_orders); both sides
    co-partitioned, no third shuffle. At 100 TB the stats side is tiny
    (one row per ticker) and broadcasts."""
    c = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("cast(round(value * 100) as bigint)").alias("cents")
    )
    stats = c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        / F.col("n").cast("double")
        / F.col("n").cast("double")
    )
    z = (F.col("cents").cast("double") - mean) / F.sqrt(var)
    return (
        c.join(stats, "user_id")
        .select("event_id", "user_id", "cents", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > ZSCORE_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# Time-based RANGE window (trailing interval, not trailing row count)
# ---------------------------------------------------------------------------
_HOUR_US = 3600 * 1_000_000


@query(
    "rolling_1h_volume",
    oracle=f"""
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id, ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
       CAST(SUM(cents) OVER w AS BIGINT) AS cents_trailing
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
""",
    tags=("A8", "W-range-frame"),
)
def rolling_1h_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing ONE HOUR of purchase volume per ticker at every purchase —
    a RANGE window frame (interval of event time), which rows-based
    frames (rolling_avg_per_user's trailing-50) cannot express: the row
    count inside an hour varies. RANGE frames treat equal-ts rows as
    peers (all enter the frame together), which is engine-identical —
    whereas a rows-frame over tied timestamps would be partition-order
    dependent. Integer cents keep the windowed sum exact. One
    sort-shuffle on the key, same as any keyed window."""
    c = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_HOUR_US, 0)
    )
    return c.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum("cents").over(w).alias("cents_trailing"),
    )


# ---------------------------------------------------------------------------
# Dense-grid downsample with forward fill (Flux createEmpty + usePrevious)
# ---------------------------------------------------------------------------
_DAY_US = 86400 * 1_000_000


@query(
    "downsample_gap_fill",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
b AS (
  SELECT user_id, ts_us // {_DAY_US} AS day, cents
  FROM c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts_us // {_DAY_US}
                             ORDER BY ts_us DESC, event_id DESC) = 1
),
bounds AS (
  SELECT MIN(ts_us // {_DAY_US}) AS d0, MAX(ts_us // {_DAY_US}) AS d1 FROM c
),
grid AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM c) u
  CROSS JOIN (SELECT unnest(generate_series(d0, d1)) AS day FROM bounds) g
)
SELECT g.user_id, g.day,
       b.cents AS last_cents,
       (b.day IS NULL OR b.day <> g.day) AS is_filled
FROM grid g
ASOF LEFT JOIN b ON g.user_id = b.user_id AND g.day >= b.day
""",
    tags=("A6", "gap-fill", "W3"),
)
def downsample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily last-value downsample on a DENSE grid with forward fill —
    the reference's Flux `aggregateWindow(createEmpty: true)` +
    `fill(usePrevious: true)` combination (`etl/query.py:146-157`
    implements createEmpty: false; this is the other half its users
    reach for). Empty (ticker, day) cells take the most recent earlier
    value; days before a ticker's first observation stay NULL.

    Plan: per-(key, day) last value by (ts, event_id); the day span
    derives from ONE global min/max aggregate (broadcast single row —
    no collect); the dense grid is keys × sequence(d0, d1) exploded
    map-side; the fill is a running last(ignorenulls) window per key —
    one sort-shuffle over grid+data, no per-gap probing. The oracle
    states the same semantics as an ASOF LEFT JOIN onto the grid."""
    c = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    day = F.expr(f"ts_us div {_DAY_US}")
    b = c.groupBy("user_id", day.alias("day")).agg(
        F.max_by("cents", F.struct("ts_us", "event_id")).alias("cents")
    )
    bounds = c.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    grid = (
        c.select("user_id")
        .distinct()
        .join(F.broadcast(bounds))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(b.withColumnRenamed("cents", "obs_cents"), ["user_id", "day"], "left")
    return joined.select(
        "user_id",
        "day",
        F.last("obs_cents", ignorenulls=True).over(w).alias("last_cents"),
        F.col("obs_cents").isNull().alias("is_filled"),
    )


# ---------------------------------------------------------------------------
# Running-peak drawdown (chained window aggregates)
# ---------------------------------------------------------------------------
@query(
    "max_drawdown_per_ticker",
    oracle="""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
r AS (
  SELECT user_id, cents,
         MAX(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM c
)
SELECT user_id,
       CAST(MAX(peak - cents) AS BIGINT) AS max_drawdown_cents,
       CAST(MAX(peak) AS BIGINT) AS peak_cents,
       CAST(COUNT(*) AS BIGINT) AS n_quotes
FROM r
GROUP BY user_id
""",
    tags=("A8", "W3", "finance"),
)
def max_drawdown_per_ticker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per ticker — the canonical risk metric: running
    peak (a cumulative-max window over event time) minus current quote,
    maximized. Two chained aggregates — one running window + one group
    — with NO self-join or per-row lookback scan (the naive O(n²)
    formulation); both run in the same keyed sort-shuffle. Integer cents
    make every intermediate exact; ordering ties break on event_id at µs
    precision, same as every window in this engine."""
    c = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = c.select("user_id", "cents", F.max("cents").over(w).alias("peak"))
    return r.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("cents")).alias("max_drawdown_cents"),
        F.max("peak").alias("peak_cents"),
        F.count(F.lit(1)).alias("n_quotes"),
    )


# ---------------------------------------------------------------------------
# Hour-of-day seasonality profile (the intraday baseline a monitoring
# system compares against before alerting)
# ---------------------------------------------------------------------------


@query(
    "seasonal_hour_profile",
    oracle="""
WITH c AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 24 AS hour_utc,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
cell AS (
  SELECT event_type, hour_utc,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM c GROUP BY event_type, hour_utc
),
tot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM c GROUP BY event_type
)
SELECT cell.event_type, cell.hour_utc, cell.n_events, cell.sum_cents,
       CAST(cell.sum_cents * tot.n_total AS DOUBLE)
         / CAST(cell.n_events * tot.total_cents AS DOUBLE) AS seasonality
FROM cell JOIN tot ON tot.event_type = cell.event_type
""",
    tags=("A6", "seasonality", "monitoring"),
)
def seasonal_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday seasonality index per (event_type, UTC hour): the cell's
    mean value over its type's overall mean — the baseline an alerting
    system divides by before calling something an anomaly (a quiet hour
    is not an incident). Both means come from integer-exact
    (count, cent-sum) moments; the index is ONE IEEE divide of two
    exact int64 products, so it is bit-identical across engines and
    aggregation orders. Plan: two aggregations over the same
    event_type-keyed shuffle (cell = finer key) + a broadcast join of
    the per-type totals (|event types| rows). Hour bucketing is pure
    integer arithmetic on the canonical ns timestamps — no timezone
    library in the hot path."""
    c = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(ts div 1000 div 3600000000) % 24").alias("hour_utc"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    cell = c.groupBy("event_type", "hour_utc").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    tot = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    return cell.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour_utc",
        "n_events",
        "sum_cents",
        (
            (F.col("sum_cents") * F.col("n_total")).cast("double")
            / (F.col("n_events") * F.col("total_cents")).cast("double")
        ).alias("seasonality"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average price (interval-weighted, integer-exact)
# ---------------------------------------------------------------------------
@query(
    "twap_per_ticker",
    oracle="""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id, cents,
         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           - ts_us AS dur_us
  FROM c
),
s AS (
  SELECT user_id,
         SUM(CAST(cents AS HUGEINT) * dur_us) AS num,
         SUM(CAST(dur_us AS HUGEINT)) AS den,
         CAST(COUNT(*) AS BIGINT) AS n_intervals
  FROM d WHERE dur_us IS NOT NULL AND dur_us > 0
  GROUP BY user_id
)
SELECT user_id,
       CAST(num // den AS BIGINT) AS twap_cents,
       CAST(den AS BIGINT) AS total_dur_us,
       n_intervals
FROM s
""",
    tags=("A2", "finance", "W3"),
)
def twap_per_ticker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per ticker — the execution benchmark
    next to VWAP (`book_vwap_fill`): each quote weighted by how long it
    was the standing price (lead(ts) - ts), not by traded size. The
    reference keeps only the latest quote per key
    (`virginia/logic/opportunity_scanner.py:190-191`) so its users
    compute TWAP downstream; here it is one declared pass. Zero-duration
    intervals (same-µs requotes) carry no weight and are excluded, as is
    the final standing quote (no close-out timestamp exists in the
    data — a real TWAP would extend it to the window end).

    Exactness: cents×µs products summed in decimal(38,0) (int64 would
    overflow at ~10^18: 10^5 cents × 10^12 µs × 10 rows) and one
    integral divide — DuckDB `//` floors, Spark `div` truncates,
    identical on these non-negative sums. Plan: one keyed sort-shuffle
    for the lead window, then a partial-aggregated groupBy on the SAME
    key — Catalyst reuses the window exchange, so the whole query is a
    single shuffle."""
    c = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = c.select(
        "user_id",
        "cents",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    s = d.groupBy("user_id").agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dur_us")).alias("num"),
        F.sum(F.col("dur_us").cast("decimal(38,0)")).alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )
    return s.select(
        "user_id",
        F.expr("cast(num div den as bigint)").alias("twap_cents"),
        F.col("den").cast("long").alias("total_dur_us"),
        "n_intervals",
    )


# ---------------------------------------------------------------------------
# Realized variance (sum of squared successive moves, integer-exact)
# ---------------------------------------------------------------------------
@query(
    "realized_variance",
    oracle="""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS move
  FROM c
)
SELECT user_id,
       CAST(SUM(move * move) AS BIGINT) AS rv_cents2,
       CAST(MAX(ABS(move)) AS BIGINT) AS max_abs_move_cents,
       CAST(COUNT(*) AS BIGINT) AS n_moves
FROM d WHERE move IS NOT NULL
GROUP BY user_id
""",
    tags=("A2", "finance", "W3"),
)
def realized_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized variance per ticker: the sum of squared successive quote
    moves — the standard high-frequency volatility estimator (sum of
    squared returns, here in absolute cents so every term is integer)
    plus the largest single move as the jump flag. Pairs with
    max_drawdown_per_ticker: drawdown is the path risk, realized
    variance the local one. Squared cent moves are ≤ (2×10^5)² = 4×10^10
    per term — int64-safe to ~2×10^8 moves per key, far past any
    per-ticker quote count. Plan: same single keyed sort-shuffle shape
    as twap_per_ticker — lag window then groupBy on the window key."""
    c = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = c.select(
        "user_id",
        (F.col("cents") - F.lag("cents").over(w)).alias("move"),
    ).filter(F.col("move").isNotNull())
    return d.groupBy("user_id").agg(
        F.sum(F.col("move") * F.col("move")).alias("rv_cents2"),
        F.max(F.abs("move")).alias("max_abs_move_cents"),
        F.count(F.lit(1)).cast("long").alias("n_moves"),
    )


# ---------------------------------------------------------------------------
# OHLC candlestick bars (the market-data downsample every charting and
# backtest consumer asks of a tick store)
# ---------------------------------------------------------------------------
_BAR_US = 300_000_000  # 5-minute bars


@query(
    "ohlc_bars_5m",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
b AS (SELECT *, ts_us // {_BAR_US} AS bucket FROM c),
w AS (
  SELECT user_id, bucket, cents,
         FIRST_VALUE(cents) OVER win AS open_c,
         LAST_VALUE(cents)  OVER win AS close_c
  FROM b
  WINDOW win AS (PARTITION BY user_id, bucket ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       CAST(bucket * {_BAR_US} AS BIGINT) AS bar_start_us,
       MIN(open_c) AS open_cents,
       MAX(cents) AS high_cents,
       MIN(cents) AS low_cents,
       MIN(close_c) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM w GROUP BY user_id, bucket
""",
    tags=("A6", "finance", "W1"),
)
def ohlc_bars_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per ticker per 5-minute bucket — the
    market-data downsample a tick store serves to every charting and
    backtest consumer (the reference's Flux users aggregate the same
    `market_snapshot` measurement downstream; cf.
    `database/influx/client.py` query helpers). Open/close are the
    FIRST/LAST tick by (ts, event_id) — deterministic ties — high/low
    plain MIN/MAX in integer cents.

    Plan: one sort-shuffle for the (ticker, bar) window; the groupBy on
    the same keys reuses that exchange (partitioning by a subset of the
    group keys satisfies the clustered distribution), so the whole bar
    build is a single shuffle — at 100 TB the same shape as the
    rollup_multi_resolution family."""
    c = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    ).withColumn("bucket", F.expr(f"ts_us div {_BAR_US}"))
    win = (
        Window.partitionBy("user_id", "bucket")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = c.select(
        "user_id",
        "bucket",
        "cents",
        F.first("cents").over(win).alias("open_c"),
        F.last("cents").over(win).alias("close_c"),
    )
    return w.groupBy("user_id", "bucket").agg(
        F.min("open_c").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.min("close_c").alias("close_cents"),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
    ).select(
        "user_id",
        (F.col("bucket") * _BAR_US).cast("long").alias("bar_start_us"),
        "open_cents",
        "high_cents",
        "low_cents",
        "close_cents",
        "n_ticks",
    )


# ---------------------------------------------------------------------------
# Fixed-point EWMA smoothing (16-lag, alpha = 1/2) — integer-exact
# ---------------------------------------------------------------------------
_EWMA_LAGS = 16


def _ewma_terms() -> tuple[str, str]:
    """num/den SQL fragments shared verbatim by Spark and DuckDB: lag j
    (0 = current tick) carries weight 2^(15-j); absent lags (sequence
    head) drop out of BOTH numerator and denominator, so the average is
    always over the ticks that exist. 16 LAG columns over one window =
    one sort-shuffle; every term is int64 (cents * 2^15 * 16 terms
    << 2^63)."""
    nums, dens = [], []
    for j in range(_EWMA_LAGS):
        w = 1 << (_EWMA_LAGS - 1 - j)
        col = "cents" if j == 0 else f"lag(cents, {j}) OVER win"
        nums.append(f"COALESCE({col} * {w}, 0)")
        dens.append(f"CASE WHEN {col} IS NULL THEN 0 ELSE {w} END")
    return " + ".join(nums), " + ".join(dens)


@query(
    "ewma_quote_smoothing",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
t AS (
  SELECT user_id, ts_us, event_id, cents,
         CAST({_ewma_terms()[0]} AS BIGINT) AS num,
         CAST({_ewma_terms()[1]} AS BIGINT) AS den
  FROM c
  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, ts_us, event_id, cents,
       CAST(num // den AS BIGINT) AS ewma_cents
FROM t
""",
    tags=("A8", "finance"),
)
def ewma_quote_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each ticker's quote in
    FIXED-POINT integer arithmetic: alpha = 1/2 truncated at 16 lags, so
    ewma_t = floor(sum_j c_(t-j)*2^(15-j) / sum_j 2^(15-j)) — the
    smoothing a market-maker runs before quoting against microstructure
    noise. Float EWMA is order-fragile (recursive state, no associative
    regrouping); the truncated fixed-point form is exact under ANY
    partitioning/merge order, which is what makes it 100 TB-safe. Tail
    weights below 2^-16 are sub-cent — truncation is lossless for the
    output's integer precision.

    Plan: 16 LAGs over ONE (ticker)-keyed window = a single sort-shuffle;
    everything else is per-row integer arithmetic in whole-stage
    codegen."""
    num_sql, den_sql = _ewma_terms()
    c = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    # the same window expression text as the oracle, via expr-with-window
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lag_cols = {
        f"l{j}": F.lag("cents", j).over(w) for j in range(1, _EWMA_LAGS)
    }
    t = c.select("user_id", "ts_us", "event_id", "cents", *[
        col.alias(name) for name, col in lag_cols.items()
    ])
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(_EWMA_LAGS):
        wgt = 1 << (_EWMA_LAGS - 1 - j)
        col = F.col("cents") if j == 0 else F.col(f"l{j}")
        num = num + F.coalesce(col * wgt, F.lit(0))
        den = den + F.when(col.isNull(), 0).otherwise(wgt)
    return t.select(
        "user_id",
        "ts_us",
        "event_id",
        "cents",
        num.cast("long").alias("__num"),
        den.cast("long").alias("__den"),
    ).select(
        "user_id",
        "ts_us",
        "event_id",
        "cents",
        F.expr("cast(__num div __den as bigint)").alias("ewma_cents"),
    )


# ---------------------------------------------------------------------------
# Tick-rule order-flow imbalance (Lee-Ready tick test over the tape)
# ---------------------------------------------------------------------------
_FLOW_BUCKET_US = 3_600_000_000  # hourly


@query(
    "tick_rule_flow",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id, ts_us,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS move
  FROM c
)
SELECT user_id,
       CAST((ts_us // {_FLOW_BUCKET_US}) * {_FLOW_BUCKET_US} AS BIGINT)
         AS bucket_start_us,
       CAST(SUM(CASE WHEN move > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(SUM(CASE WHEN move < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       CAST(SUM(CASE WHEN move = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
       CAST(SUM(CASE WHEN move > 0 THEN 1 WHEN move < 0 THEN -1 ELSE 0 END)
            AS BIGINT) AS flow
FROM d WHERE move IS NOT NULL
GROUP BY user_id, ts_us // {_FLOW_BUCKET_US}
""",
    tags=("A2", "finance"),
)
def tick_rule_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-flow imbalance by the TICK RULE (the Lee-Ready tick test):
    classify each quote move as an up-tick (+1), down-tick (-1) or flat,
    and sum per ticker-hour — the flow-toxicity signal a market-maker
    watches next to realized_variance. All counts are integers.

    Plan: LAG over the ticker-keyed window (one sort-shuffle), then the
    hourly groupBy's (ticker, bucket) clustered distribution is already
    satisfied by the window's ticker hash-partitioning — no second
    exchange."""
    c = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = c.select(
        "user_id",
        "ts_us",
        (F.col("cents") - F.lag("cents").over(w)).alias("move"),
    ).filter(F.col("move").isNotNull())
    return d.groupBy(
        "user_id", F.expr(f"ts_us div {_FLOW_BUCKET_US}").alias("__b")
    ).agg(
        F.sum(F.when(F.col("move") > 0, 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("move") < 0, 1).otherwise(0)).cast("long").alias("n_down"),
        F.sum(F.when(F.col("move") == 0, 1).otherwise(0)).cast("long").alias("n_flat"),
        F.sum(
            F.when(F.col("move") > 0, 1).when(F.col("move") < 0, -1).otherwise(0)
        ).cast("long").alias("flow"),
    ).select(
        "user_id",
        (F.col("__b") * _FLOW_BUCKET_US).cast("long").alias("bucket_start_us"),
        "n_up",
        "n_down",
        "n_flat",
        "flow",
    )


# ---------------------------------------------------------------------------
# Kyle's lambda: price impact per unit of signed order flow
# ---------------------------------------------------------------------------
_KYLE_SIZE_MOD = 50


@query(
    "kyle_lambda_per_pair",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         event_id % 50 + 1 AS size
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id, ts_us, event_id, size,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS move
  FROM c
),
sgn AS (
  SELECT user_id, move,
         size * LAST_VALUE(CASE WHEN move > 0 THEN 1
                                WHEN move < 0 THEN -1 END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS UNBOUNDED PRECEDING) AS q
  FROM d WHERE move IS NOT NULL
),
m AS (
  SELECT user_id AS pair_key, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(move) AS BIGINT) AS sd,
         CAST(SUM(q * move) AS BIGINT) AS sqd,
         CAST(SUM(q * q) AS BIGINT) AS sq2
  FROM sgn WHERE q IS NOT NULL GROUP BY user_id
)
SELECT pair_key, n, sq, sd, sqd, sq2,
       (CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE)
        - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE)
          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) AS kyle_lambda
FROM m WHERE n * sq2 > sq * sq
""",
    tags=("A2", "finance", "microstructure"),
)
def kyle_lambda_per_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kyle's lambda per pair: the OLS slope of price move on SIGNED
    order flow (dP = lambda*q + eps) — the canonical price-impact /
    market-depth estimator, completing the microstructure family next
    to tick_rule_flow and realized_variance. Flow sign follows the
    Lee-Ready tick test with the standard zero-tick carry-forward
    (last non-zero move's sign, via LAST_VALUE IGNORE NULLS over the
    same tape window); synthetic trade size is the deterministic
    event_id % 50 + 1.

    Exactness: all five regression moments are exact int64 sums; the
    slope is one fixed IEEE expression over doubles of those integers;
    zero-variance pairs are excluded by the integer predicate
    n*Sq2 > Sq*Sq. Plan: ONE sort-shuffle — both window passes (LAG,
    carry-forward) and the per-pair rollup share the pair-keyed
    exchange."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
            (F.col("event_id") % _KYLE_SIZE_MOD + 1).alias("size"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = c.select(
        "user_id",
        "ts_us",
        "event_id",
        "size",
        (F.col("cents") - F.lag("cents").over(w)).alias("move"),
    ).filter(F.col("move").isNotNull())
    sgn = d.select(
        "user_id",
        "move",
        (
            F.col("size")
            * F.last(
                F.when(F.col("move") > 0, 1).when(F.col("move") < 0, -1), True
            ).over(wc)
        ).alias("q"),
    ).filter(F.col("q").isNotNull())
    m = sgn.groupBy(F.col("user_id").alias("pair_key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("move").alias("sd"),
        F.sum(F.col("q") * F.col("move")).alias("sqd"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
    )
    dd = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return m.filter(F.col("n") * F.col("sq2") > F.col("sq") * F.col("sq")).select(
        "pair_key",
        "n",
        "sq",
        "sd",
        "sqd",
        "sq2",
        (
            (dd("n") * dd("sqd") - dd("sq") * dd("sd"))
            / (dd("n") * dd("sq2") - dd("sq") * dd("sq"))
        ).alias("kyle_lambda"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection: the single most likely mean-shift per tape
# ---------------------------------------------------------------------------
@query(
    "cusum_changepoint",
    oracle="""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
w AS (
  SELECT user_id, ts_us, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS BIGINT) AS k,
         CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sk,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(SUM(cents) OVER (PARTITION BY user_id) AS BIGINT) AS t
  FROM c
),
d AS (
  SELECT user_id AS pair_key, ts_us, k, n, sk, t,
         abs(n * sk - k * t) AS dk
  FROM w WHERE k < n
)
SELECT pair_key, n,
       k AS change_k, ts_us AS change_ts_us, dk AS d_max,
       CAST(sk AS DOUBLE) / CAST(k AS DOUBLE)
         - CAST(t - sk AS DOUBLE) / CAST(n - k AS DOUBLE) AS mean_shift
FROM d
QUALIFY ROW_NUMBER() OVER (PARTITION BY pair_key
                           ORDER BY dk DESC, k) = 1
""",
    tags=("A2", "finance", "changepoint"),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per tape: the split position k that
    maximizes |n·S_k − k·T| — the scale-free form of the cumulative-sum
    statistic (it equals n·k·(n−k)·|mean_left − mean_right| up to that
    integer factor), i.e. the single most likely MEAN-SHIFT point in
    each pair's quote history. This is the regime-change detector next
    to the POINT-anomaly sweeps (value_anomaly_mad, price_anomaly_zscore):
    those flag one bad tick, this finds where the level moved.

    Exactness: prefix sums, totals, and the statistic are exact int64
    (prices are cents; n·S_k at 1e5 ticks x 100 cents is ~1e12); the
    argmax ties break on earliest k; only the reported mean-shift is a
    final fixed pair of IEEE divides. Plan: ONE sort-shuffle — the
    running prefix window, the full-partition integer totals, and the
    argmax rank all share the pair-keyed exchange. At 100 TB this is
    one shuffle of the tick table, same shape as ewma/tick-rule."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("user_id")
    w = c.select(
        "user_id",
        "ts_us",
        F.row_number().over(wo).cast("long").alias("k"),
        F.sum("cents").over(wr).alias("sk"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cents").over(wall).alias("t"),
    )
    d = w.filter(F.col("k") < F.col("n")).withColumn(
        "dk", F.abs(F.col("n") * F.col("sk") - F.col("k") * F.col("t"))
    )
    # rank on the SAME user_id partitioning (renaming before the window
    # would insert a second exchange on the aliased key)
    pick = Window.partitionBy("user_id").orderBy(F.col("dk").desc(), "k")
    return (
        d.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("pair_key"),
            "n",
            F.col("k").alias("change_k"),
            F.col("ts_us").alias("change_ts_us"),
            F.col("dk").alias("d_max"),
            (
                F.col("sk").cast("double") / F.col("k").cast("double")
                - (F.col("t") - F.col("sk")).cast("double")
                / (F.col("n") - F.col("k")).cast("double")
            ).alias("mean_shift"),
        )
    )


# ---------------------------------------------------------------------------
# Linear-interpolation resample onto a fixed grid (Flux interpolate.linear)
# ---------------------------------------------------------------------------
_INTERP_GRID_US = 3_600_000_000  # hourly grid


@query(
    "linear_interp_resample",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
seg AS (
  SELECT user_id, ts_us AS t0, cents AS v0,
         LEAD(ts_us) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) AS t1,
         LEAD(cents) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) AS v1
  FROM c
),
live AS (
  SELECT * FROM seg
  WHERE t1 IS NOT NULL
    AND t1 // {_INTERP_GRID_US} >= t0 // {_INTERP_GRID_US} + 1
),
g AS (
  SELECT user_id AS pair_key,
         CAST(gi * {_INTERP_GRID_US} AS BIGINT) AS grid_ts_us,
         CAST((v0 * (t1 - gi * {_INTERP_GRID_US})
               + v1 * (gi * {_INTERP_GRID_US} - t0)) // (t1 - t0)
              AS BIGINT) AS interp_cents
  FROM live,
       unnest(range(t0 // {_INTERP_GRID_US} + 1,
                    t1 // {_INTERP_GRID_US} + 1)) AS u(gi)
)
SELECT pair_key, grid_ts_us, interp_cents FROM g
""",
    tags=("A6", "finance", "resample"),
)
def linear_interp_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling onto the hourly grid: for every
    grid instant g strictly inside a quote segment (t0, t1], the
    time-weighted blend (v0·(t1−g) + v1·(g−t0)) div (t1−t0) — Flux's
    `interpolate.linear` / pandas `resample().interpolate()`, the
    smooth counterpart of downsample_gap_fill's step-wise forward fill.

    Exactness: the blend numerator keeps both terms NON-NEGATIVE by
    construction (prices ≥ 0, g ∈ (t0, t1]), so Spark's truncating
    `div` and DuckDB's flooring `//` agree — the declared fixed-point
    rule for every floor divide in this repo. All outputs are integer
    cents on integer µs grid points; int64 headroom is ~5e3 cents ×
    3e13 µs ≈ 1.5e17.

    Plan: one sort-shuffle (the per-pair LEAD window), then a purely
    map-side explode of each segment to the grid points it spans — the
    explode factor is segment-length/grid-width, the only cost knob,
    and empty segments are filtered BEFORE the explode (`sequence`
    would otherwise descend for t1 quoted in the same grid cell). At
    100 TB: identical shape to the other tape operators — the tick
    table shuffles once."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seg = c.select(
        F.col("user_id").alias("pair_key"),
        F.col("ts_us").alias("t0"),
        F.col("cents").alias("v0"),
        F.lead("ts_us").over(w).alias("t1"),
        F.lead("cents").over(w).alias("v1"),
    )
    W_ = _INTERP_GRID_US
    live = seg.filter(
        F.col("t1").isNotNull()
        & (F.expr(f"t1 div {W_}") >= F.expr(f"t0 div {W_} + 1"))
    )
    g = live.select(
        "pair_key",
        "t0",
        "v0",
        "t1",
        "v1",
        F.explode(
            F.sequence(F.expr(f"t0 div {W_} + 1"), F.expr(f"t1 div {W_}"))
        ).alias("gi"),
    )
    gts = F.col("gi") * W_
    return g.select(
        "pair_key",
        gts.cast("long").alias("grid_ts_us"),
        F.expr(
            f"cast((v0 * (t1 - gi * {W_}) + v1 * (gi * {W_} - t0))"
            f" div (t1 - t0) as bigint)"
        ).alias("interp_cents"),
    )


# ---------------------------------------------------------------------------
# VPIN: volume-synchronized probability of informed trading
# (Easley, Lopez de Prado, O'Hara 2012)
# ---------------------------------------------------------------------------
_VPIN_BUCKET_VOL = 2_000  # volume per bucket
_VPIN_WINDOW = 10  # trailing buckets in the VPIN average


@query(
    "vpin_toxicity",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(event_id % 50 + 1 AS BIGINT) AS vol
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id, ts_us, event_id, vol,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS move
  FROM c
),
sgn AS (
  SELECT user_id, ts_us, event_id, vol, move,
         LAST_VALUE(CASE WHEN move > 0 THEN 1
                         WHEN move < 0 THEN -1 END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS s
  FROM d WHERE move IS NOT NULL
),
bk AS (
  SELECT user_id,
         (SUM(vol) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS UNBOUNDED PRECEDING) - vol)
           // {_VPIN_BUCKET_VOL} AS bucket,
         vol, s
  FROM sgn WHERE s IS NOT NULL
),
b AS (
  SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
         CAST(SUM(CASE WHEN s = 1 THEN vol ELSE 0 END) AS BIGINT) AS buy_vol,
         CAST(SUM(CASE WHEN s = -1 THEN vol ELSE 0 END) AS BIGINT) AS sell_vol,
         CAST(SUM(vol) AS BIGINT) AS tot_vol
  FROM bk GROUP BY user_id, bucket
),
v AS (
  SELECT user_id AS pair_key, bucket, buy_vol, sell_vol,
         CAST(SUM(abs(buy_vol - sell_vol))
              OVER (PARTITION BY user_id ORDER BY bucket
                    ROWS {_VPIN_WINDOW - 1} PRECEDING) AS BIGINT) AS imb_sum,
         CAST(SUM(tot_vol)
              OVER (PARTITION BY user_id ORDER BY bucket
                    ROWS {_VPIN_WINDOW - 1} PRECEDING) AS BIGINT) AS vol_sum,
         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY bucket
                             ROWS {_VPIN_WINDOW - 1} PRECEDING) AS BIGINT)
           AS n_buckets
  FROM b
)
SELECT pair_key, bucket, buy_vol, sell_vol, n_buckets,
       CAST(imb_sum AS DOUBLE) / CAST(vol_sum AS DOUBLE) AS vpin
FROM v WHERE n_buckets = {_VPIN_WINDOW}
""",
    tags=("A2", "finance", "microstructure"),
)
def vpin_toxicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VPIN flow-toxicity (Easley, Lopez de Prado, O'Hara 2012): chop
    each tape into equal-VOLUME buckets (the volume clock — bucket id is
    the exclusive-prefix volume div 2000), classify volume
    buy/sell by the tick rule with zero-tick carry, and report the
    trailing-10-bucket ratio Σ|buy−sell| / Σvolume — the
    metric that flagged the 2010 flash crash hours early and the reason
    market-makers watch flow imbalance on a volume clock, not a wall
    clock. Completes the toxicity stack: tick_rule_flow (signs),
    kyle_lambda_per_pair (impact), vpin_toxicity (imbalance persistence).

    Exactness: volumes, prefix sums, bucket ids, and both rolling sums
    are exact int64 (the rolling frame is a fixed ROWS window, so the
    sums are order-defined); the one divide per row is IEEE-fixed;
    partial windows are excluded by an integer count predicate.

    Plan: ONE sort-shuffle — the move LAG, the sign carry-forward, and
    the volume-clock prefix sum are three passes over the SAME
    pair-keyed window exchange; the bucket groupBy and the trailing
    window reuse the same pair partitioning. At 100 TB the tape
    shuffles once, identical to the rest of the tape family."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
            F.expr("cast(event_id % 50 + 1 as bigint)").alias("vol"),
        )
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = c.select(
        "user_id",
        "ts_us",
        "event_id",
        "vol",
        (F.col("cents") - F.lag("cents").over(wo)).alias("move"),
    ).filter(F.col("move").isNotNull())
    sgn = d.select(
        "user_id",
        "ts_us",
        "event_id",
        "vol",
        F.last(
            F.when(F.col("move") > 0, 1).when(F.col("move") < 0, -1), True
        ).over(wr).alias("s"),
    ).filter(F.col("s").isNotNull())
    bk = sgn.select(
        "user_id",
        "vol",
        "s",
        F.expr(
            f"(sum(vol) over (partition by user_id order by ts_us, event_id"
            f" rows between unbounded preceding and current row) - vol)"
            f" div {_VPIN_BUCKET_VOL}"
        ).alias("bucket"),
    )
    b = bk.groupBy("user_id", "bucket").agg(
        F.sum(F.when(F.col("s") == 1, F.col("vol")).otherwise(0)).alias("buy_vol"),
        F.sum(F.when(F.col("s") == -1, F.col("vol")).otherwise(0)).alias("sell_vol"),
        F.sum("vol").alias("tot_vol"),
    )
    wv = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(-(_VPIN_WINDOW - 1), Window.currentRow)
    )
    v = b.select(
        F.col("user_id").alias("pair_key"),
        "bucket",
        "buy_vol",
        "sell_vol",
        F.sum(F.abs(F.col("buy_vol") - F.col("sell_vol"))).over(wv).alias("imb_sum"),
        F.sum("tot_vol").over(wv).alias("vol_sum"),
        F.count(F.lit(1)).over(wv).alias("n_buckets"),
    )
    return v.filter(F.col("n_buckets") == _VPIN_WINDOW).select(
        "pair_key",
        "bucket",
        "buy_vol",
        "sell_vol",
        "n_buckets",
        (F.col("imb_sum").cast("double") / F.col("vol_sum").cast("double")).alias(
            "vpin"
        ),
    )


# ---------------------------------------------------------------------------
# Autocorrelation profile of absolute moves: the volatility-clustering
# measurement (ACF of |returns| stays positive; ACF of returns does not)
# ---------------------------------------------------------------------------
_ACF_MAX_LAG = 5


def _acf_lag_sql(k: int) -> str:
    return f"""
  SELECT {k} AS lag, a AS x,
         LAG(a, {k}) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS y
  FROM am"""


@query(
    "move_acf_profile",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
am AS (
  SELECT user_id, ts_us, event_id,
         abs(cents - LAG(cents) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id)) AS a
  FROM c QUALIFY a IS NOT NULL
),
stacked AS ({" UNION ALL ".join(_acf_lag_sql(k) for k in range(1, _ACF_MAX_LAG + 1))}
),
m AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sx2,
         CAST(SUM(y * y) AS BIGINT) AS sy2
  FROM stacked WHERE y IS NOT NULL GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n, sxy,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
FROM m
WHERE n * sx2 > sx * sx AND n * sy2 > sy * sy
""",
    tags=("A2", "finance", "volatility"),
)
def move_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile of ABSOLUTE quote moves at tick lags
    1..5, pooled across pairs — the volatility-clustering measurement
    (Cont 2001 stylized facts: returns are uncorrelated but |returns|
    correlate for many lags; this profile is that evidence, and the
    justification for the EWMA/GARCH-style smoothers next to it).

    Join-free: all five lagged series come from stacked LAG columns
    over the SAME pair-keyed window (no self-join, no explode-align —
    the within-series specialization of venue_lead_lag's alignment);
    the per-lag Pearson moments are exact int64 sums with the usual
    one-IEEE-expression correlation and integer zero-variance guards.
    Plan: ONE sort-shuffle then a 5-group rollup. Magnitude: |move| ≤
    ~100 cents, so Σxy fits int64 through ~1e14 ticks."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    am = c.select(
        "user_id",
        "ts_us",
        "event_id",
        F.abs(F.col("cents") - F.lag("cents").over(w)).alias("a"),
    ).filter(F.col("a").isNotNull())
    lagged = am.select(
        "a", *[F.lag("a", k).over(w).alias(f"y{k}") for k in range(1, _ACF_MAX_LAG + 1)]
    )
    stacked = lagged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col("a").alias("x"),
                        F.col(f"y{k}").alias("y"),
                    )
                    for k in range(1, _ACF_MAX_LAG + 1)
                ]
            )
        ).alias("s")
    ).select("s.lag", "s.x", "s.y").filter(F.col("y").isNotNull())
    m = stacked.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return m.filter(
        (F.col("n") * F.col("sx2") > F.col("sx") * F.col("sx"))
        & (F.col("n") * F.col("sy2") > F.col("sy") * F.col("sy"))
    ).select(
        "lag",
        "n",
        "sxy",
        (
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / (
                F.sqrt(d("n") * d("sx2") - d("sx") * d("sx"))
                * F.sqrt(d("n") * d("sy2") - d("sy") * d("sy"))
            )
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Underwater (drawdown-duration) analysis: how LONG below the peak,
# not just how far — all-integer
# ---------------------------------------------------------------------------
@query(
    "underwater_duration",
    oracle="""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
p0 AS (
  SELECT user_id, ts_us, event_id, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS BIGINT) AS rn,
         CAST(MAX(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
  FROM c
),
p AS (
  SELECT user_id, rn, cents, peak,
         CAST(SUM(CASE WHEN cents < peak THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_uw
  FROM p0
),
marked AS (
  SELECT user_id, peak - cents AS depth, cents < peak AS uw,
         CASE WHEN cents < peak THEN rn - cum_uw END AS run_id
  FROM p
),
runs AS (
  SELECT user_id, run_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN uw THEN 1 ELSE 0 END) AS BIGINT) AS streak,
         MAX(CASE WHEN uw THEN depth END) AS run_depth
  FROM marked GROUP BY user_id, run_id
)
SELECT user_id AS pair_key,
       CAST(SUM(n_rows) AS BIGINT) AS n_ticks,
       CAST(SUM(streak) AS BIGINT) AS n_underwater,
       CAST(MAX(streak) AS BIGINT) AS longest_streak,
       CAST(COALESCE(MAX(run_depth), 0) AS BIGINT) AS max_depth_cents
FROM runs GROUP BY user_id
""",
    tags=("A2", "finance", "risk"),
)
def underwater_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Underwater analysis per tape: the DURATION dimension of drawdown
    that `max_drawdown_per_ticker` (depth only) cannot see — how many
    consecutive ticks each pair spends below its running peak, the
    longest such spell, and the deepest point reached inside any spell.
    Depth tells you how bad; duration tells you how long capital (or a
    price level) stayed impaired — risk desks track both.

    All-integer end to end (no divide anywhere): running peak by
    cumulative MAX, spells grouped by the gap trick restated for ONE
    subtree — run_id = rn − cumulative-count-of-underwater-rows (the
    conditional-cumsum equivalent of the filtered row_number, so dry
    rows stay in the frame under a NULL run id and the tape is never
    consumed twice; SCALE.md §19 lesson 1 applied at write time).
    Plan: both windows and both rollups share ONE pair-keyed exchange;
    no join at all. Zero-underwater pairs survive via the NULL-run
    group."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    peak = F.max("cents").over(wr)
    uw = F.col("cents") < F.col("peak")
    p = c.select(
        "user_id",
        F.row_number().over(wo).cast("long").alias("rn"),
        "cents",
        peak.alias("peak"),
        F.sum(F.when(F.col("cents") < peak, 1).otherwise(0)).over(wr).alias(
            "cum_uw"
        ),
    )
    marked = p.select(
        "user_id",
        (F.col("peak") - F.col("cents")).alias("depth"),
        uw.alias("uw"),
        F.when(uw, F.col("rn") - F.col("cum_uw")).alias("run_id"),
    )
    runs = marked.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("uw"), 1).otherwise(0)).alias("streak"),
        F.max(F.when(F.col("uw"), F.col("depth"))).alias("run_depth"),
    )
    return runs.groupBy("user_id").agg(
        F.sum("n_rows").alias("n_ticks"),
        F.sum("streak").alias("n_underwater"),
        F.max("streak").alias("longest_streak"),
        F.coalesce(F.max("run_depth"), F.lit(0)).alias("max_depth_cents"),
    ).select(
        F.col("user_id").alias("pair_key"),
        "n_ticks",
        "n_underwater",
        "longest_streak",
        "max_depth_cents",
    )


# ---------------------------------------------------------------------------
# Roll (1984) implied spread: 2*sqrt(-cov(move_t, move_{t-1})) per pair
# ---------------------------------------------------------------------------
@query(
    "roll_spread_estimator",
    oracle="""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id, ts_us, event_id,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS x
  FROM c QUALIFY x IS NOT NULL
),
e AS (
  SELECT user_id, x,
         LAG(x) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS y
  FROM d QUALIFY y IS NOT NULL
),
m AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM e GROUP BY user_id
)
SELECT user_id, n, n * sxy - sx * sy AS cov_num,
       CASE WHEN n * sxy - sx * sy < 0
            THEN 2.0 * sqrt(CAST(-(n * sxy - sx * sy) AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
            ELSE 0.0 END AS roll_spread_cents
FROM m WHERE n > 0
""",
    tags=("A2", "finance", "microstructure"),
)
def roll_spread_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll (1984) implied effective spread per pair: bid-ask bounce
    makes consecutive trade-price moves negatively autocovariant, and
    the spread is 2*sqrt(-cov(move_t, move_{t-1})) — the estimator that
    recovers a spread from a TRADE tape with no quote data at all (the
    Kalshi poll feed is exactly such a tape). Joins the toxicity stack
    (tick_rule_flow, kyle_lambda_per_pair, vpin_toxicity) as the cost
    leg. Exactness: the autocovariance numerator n*Sxy - Sx*Sy stays
    int64 (moves <= ~1e4 cents, so Sxy fits through ~1e14 ticks); the
    only IEEE math is the final sqrt of one exact integer over n^2 —
    a fixed two-op sequence identical to the oracle. Convention: cov
    >= 0 (no bounce detectable) reports spread 0, the standard Roll
    treatment. Plan: ONE pair-keyed sort-shuffle serves both LAG
    windows and the rollup."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = c.select(
        "user_id",
        "ts_us",
        "event_id",
        (F.col("cents") - F.lag("cents").over(w)).alias("x"),
    ).filter(F.col("x").isNotNull())
    e = d.select(
        "user_id", "x", F.lag("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    cov_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    nd = F.col("n").cast("double")
    return m.filter(F.col("n") > 0).select(
        "user_id",
        "n",
        cov_num.alias("cov_num"),
        F.when(
            cov_num < 0,
            F.lit(2.0) * F.sqrt((-cov_num).cast("double") / (nd * nd)),
        )
        .otherwise(F.lit(0.0))
        .alias("roll_spread_cents"),
    )


# ---------------------------------------------------------------------------
# Amihud (2002) illiquidity: price impact per unit of traded value
# ---------------------------------------------------------------------------
_AMIHUD_DAY_US = 86_400_000_000


@query(
    "amihud_illiquidity",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
b AS (SELECT *, ts_us // {_AMIHUD_DAY_US} AS day FROM c),
w AS (
  SELECT user_id, day, cents,
         FIRST_VALUE(cents) OVER win AS open_c,
         LAST_VALUE(cents)  OVER win AS close_c
  FROM b
  WINDOW win AS (PARTITION BY user_id, day ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
daily AS (
  SELECT user_id, CAST(day AS BIGINT) AS day,
         abs(MIN(close_c) - MIN(open_c)) AS abs_move,
         CAST(SUM(cents) AS BIGINT) AS vol_cents
  FROM w
  GROUP BY user_id, day
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(abs_move) AS BIGINT) AS sum_abs_move,
       CAST(SUM(vol_cents) AS BIGINT) AS sum_vol_cents,
       1000000.0 * (CAST(SUM(abs_move) AS DOUBLE)
                    / CAST(SUM(vol_cents) AS DOUBLE)) AS illiq_ppm
FROM daily
WHERE vol_cents > 0
GROUP BY user_id
HAVING SUM(vol_cents) > 0
""",
    tags=("A2", "finance", "microstructure"),
)
def amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud (2002) illiquidity per pair: how many price-impact cents
    per cent of traded value — |daily open-to-close move| over daily
    traded value, aggregated as the RATIO OF SUMS across days (the
    order-independent restatement: a mean of per-day IEEE ratios would
    hash-flap with partial-aggregation order, and the ratio-of-sums
    variant is the exact value-weighted Amihud). The open/close pair is
    deterministic via (ts, event_id)-argmin/argmax, matching the OHLC
    bars' convention. Everything is int64 until ONE terminal divide
    (scaled to parts-per-million). Plan: one (pair, day) aggregation
    shuffle, then the pair rollup — the day keys of one pair co-locate,
    so AQE coalesces the second exchange to near-nothing; no window
    needed at all."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    daily = (
        c.groupBy(
            "user_id",
            F.expr(f"ts_us div {_AMIHUD_DAY_US}").cast("long").alias("day"),
        )
        .agg(
            F.abs(
                F.expr("max_by(cents, struct(ts_us, event_id))")
                - F.expr("min_by(cents, struct(ts_us, event_id))")
            ).alias("abs_move"),
            F.sum("cents").alias("vol_cents"),
        )
        .filter(F.col("vol_cents") > 0)
    )
    return (
        daily.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("abs_move").alias("sum_abs_move"),
            F.sum("vol_cents").alias("sum_vol_cents"),
        )
        .filter(F.col("sum_vol_cents") > 0)
        .select(
            "user_id",
            "n_days",
            "sum_abs_move",
            "sum_vol_cents",
            (
                F.lit(1000000.0)
                * (
                    F.col("sum_abs_move").cast("double")
                    / F.col("sum_vol_cents").cast("double")
                )
            ).alias("illiq_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Lo-MacKinlay variance ratio VR(4): random-walk test on the tape
# ---------------------------------------------------------------------------
@query(
    "variance_ratio_q4",
    oracle="""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS x,
         cents - LAG(cents, 4) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id) AS y
  FROM c
),
m AS (
  SELECT user_id,
         CAST(COUNT(x) AS BIGINT) AS n1,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sx2,
         CAST(COUNT(y) AS BIGINT) AS n4,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y * y) AS BIGINT) AS sy2
  FROM d GROUP BY user_id
)
SELECT user_id, n1, n4,
       n1 * sx2 - sx * sx AS var1_num,
       n4 * sy2 - sy * sy AS var4_num,
       (CAST(n4 * sy2 - sy * sy AS DOUBLE)
        / (CAST(n4 AS DOUBLE) * CAST(n4 AS DOUBLE)))
       / (4.0 * (CAST(n1 * sx2 - sx * sx AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)))) AS vr4
FROM m
WHERE n1 * sx2 > sx * sx AND n4 > 0
""",
    tags=("A2", "finance", "microstructure"),
)
def variance_ratio_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance ratio VR(4) per pair — the random-walk
    test: under a random walk the variance of 4-tick returns is exactly
    4x the variance of 1-tick returns, so VR(4) deviating below 1 is
    mean reversion (bid-ask bounce) and above 1 is momentum — the
    regime diagnostic next to move_acf_profile (which measures the
    |move| clustering instead). Both horizons difference the SAME tape:
    LAG(1) and LAG(4) over one pair-keyed window (overlapping 4-tick
    windows, the standard overlap estimator), so the whole query is ONE
    sort-shuffle. Exactness: both variance numerators n*S2 - S*S stay
    int64; the ratio is a fixed three-divide IEEE sequence written
    identically in both engines; degenerate tapes are excluded by
    integer predicates (zero 1-tick variance or no 4-tick pairs)."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = c.select(
        "user_id",
        (F.col("cents") - F.lag("cents").over(w)).alias("x"),
        (F.col("cents") - F.lag("cents", 4).over(w)).alias("y"),
    )
    m = d.groupBy("user_id").agg(
        F.count("x").alias("n1"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.count("y").alias("n4"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    var1_num = F.col("n1") * F.col("sx2") - F.col("sx") * F.col("sx")
    var4_num = F.col("n4") * F.col("sy2") - F.col("sy") * F.col("sy")
    n1d, n4d = F.col("n1").cast("double"), F.col("n4").cast("double")
    return (
        m.filter(
            (F.col("n1") * F.col("sx2") > F.col("sx") * F.col("sx"))
            & (F.col("n4") > 0)
        )
        .select(
            "user_id",
            "n1",
            "n4",
            var1_num.alias("var1_num"),
            var4_num.alias("var4_num"),
            (
                (var4_num.cast("double") / (n4d * n4d))
                / (F.lit(4.0) * (var1_num.cast("double") / (n1d * n1d)))
            ).alias("vr4"),
        )
    )


# ---------------------------------------------------------------------------
# CAPM-style market beta per pair: regression on the cross-sectional index
# ---------------------------------------------------------------------------
_BETA_BUCKET_US = 3_600_000_000  # hourly buckets


@query(
    "market_beta_per_pair",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
b AS (SELECT *, ts_us // {_BETA_BUCKET_US} AS bucket FROM c),
w AS (
  SELECT user_id, bucket, cents,
         FIRST_VALUE(cents) OVER win AS open_c,
         LAST_VALUE(cents)  OVER win AS close_c
  FROM b
  WINDOW win AS (PARTITION BY user_id, bucket ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
r AS (
  SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
         (MIN(close_c) - MIN(open_c)) * 100 AS y_c100
  FROM w GROUP BY user_id, bucket
),
mkt AS (
  SELECT bucket,
         CAST(SUM(y_c100) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS x_c100,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM r GROUP BY bucket
),
m AS (
  SELECT r.user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mkt.x_c100) AS BIGINT) AS sx,
         CAST(SUM(r.y_c100) AS BIGINT) AS sy,
         CAST(SUM(mkt.x_c100 * r.y_c100) AS BIGINT) AS sxy,
         CAST(SUM(mkt.x_c100 * mkt.x_c100) AS BIGINT) AS sx2
  FROM r JOIN mkt ON mkt.bucket = r.bucket
  GROUP BY r.user_id
)
SELECT user_id, n, n * sxy - sx * sy AS cov_num, n * sx2 - sx * sx AS var_num,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sx2 - sx * sx AS DOUBLE)
         AS beta
FROM m
WHERE n * sx2 > sx * sx
""",
    tags=("A2", "finance", "cross-sectional"),
)
def market_beta_per_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM-style market beta per pair: each pair's hourly open-to-close
    move regressed on the EQUAL-WEIGHT CROSS-SECTIONAL INDEX of all
    pairs' moves that hour — the systematic-vs-idiosyncratic
    decomposition a risk engine runs nightly, and a shape none of the
    per-tape operators have: a per-key series regressed on a GLOBAL
    series derived from all keys. Exactness: bucket moves scale to
    x100 fixed point; the index is a truncating integer divide of the
    bucket sum by the bucket count (deterministic — never an IEEE mean;
    bucket sums DO go negative, and both engines truncate toward zero
    on BIGINT operands — DuckDB's // floors only for floating inputs,
    verified against 65 negative non-divisible bucket sums at sf0.1);
    all five regression moments are int64 (|move*100| <= 1e6,
    so Sxy fits through ~1e6 buckets); the one IEEE divide is the final
    beta, guarded by an integer zero-variance predicate. Scale plan:
    the raw tape shuffles ONCE into the (pair, bucket) aggregation
    (map-side partial); the bucket index is a tiny second aggregate
    that BROADCASTS back onto the bucket table; the per-pair moment
    rollup runs over pairs-x-buckets rows, already thousands of times
    smaller than the tape."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    r = (
        c.groupBy(
            "user_id",
            F.expr(f"ts_us div {_BETA_BUCKET_US}").cast("long").alias("bucket"),
        )
        .agg(
            (
                (
                    F.expr("max_by(cents, struct(ts_us, event_id))")
                    - F.expr("min_by(cents, struct(ts_us, event_id))")
                )
                * 100
            ).alias("y_c100")
        )
        # two consumers (the bucket index and the regression join) read
        # the bucket table: checkpoint it once so the tape scan + its
        # (pair, bucket) shuffle run once instead of once per branch
        .localCheckpoint()
    )
    mkt = r.groupBy("bucket").agg(
        F.expr("sum(y_c100) div count(*)").alias("x_c100"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    joined = r.join(F.broadcast(mkt.select("bucket", "x_c100")), "bucket")
    m = joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_c100").alias("sx"),
        F.sum("y_c100").alias("sy"),
        F.sum(F.col("x_c100") * F.col("y_c100")).alias("sxy"),
        F.sum(F.col("x_c100") * F.col("x_c100")).alias("sx2"),
    )
    cov_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_num = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    return (
        m.filter(F.col("n") * F.col("sx2") > F.col("sx") * F.col("sx"))
        .select(
            "user_id",
            "n",
            cov_num.alias("cov_num"),
            var_num.alias("var_num"),
            (cov_num.cast("double") / var_num.cast("double")).alias("beta"),
        )
    )


# ---------------------------------------------------------------------------
# TAQ-style execution-cost decomposition: effective / realized spread, impact
# ---------------------------------------------------------------------------
_SPREAD_HORIZON_US = 300_000_000  # 5-minute post-trade mid horizon


@query(
    "effective_spread_metrics",
    oracle=f"""
WITH q AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS quote_c
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, epoch_us(ts)
),
t AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS trade_c
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id, ts_us, 0 AS side, quote_c,
         CAST(NULL AS BIGINT) AS trade_c FROM q
  UNION ALL
  SELECT user_id, ts_us, 1 AS side, CAST(NULL AS BIGINT) AS quote_c,
         trade_c FROM t
),
w AS (
  SELECT user_id, ts_us, side, trade_c,
         LAST_VALUE(quote_c IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, side
                 ROWS UNBOUNDED PRECEDING) AS mid_c,
         FIRST_VALUE(quote_c IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN {_SPREAD_HORIZON_US} FOLLOWING
                       AND UNBOUNDED FOLLOWING) AS fwd_c
  FROM u
),
x AS (
  SELECT user_id,
         CASE WHEN trade_c > mid_c THEN 1
              WHEN trade_c < mid_c THEN -1 ELSE 0 END AS sgn,
         trade_c, mid_c, fwd_c
  FROM w
  WHERE side = 1 AND mid_c IS NOT NULL AND fwd_c IS NOT NULL
)
SELECT user_id AS pair_key,
       CAST(COUNT(*) AS BIGINT) AS n_trades,
       CAST(SUM(2 * abs(trade_c - mid_c)) AS BIGINT) AS s_eff,
       CAST(SUM(2 * sgn * (trade_c - fwd_c)) AS BIGINT) AS s_real,
       CAST(SUM(2 * sgn * (fwd_c - mid_c)) AS BIGINT) AS s_impact,
       CAST(SUM(2 * abs(trade_c - mid_c)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_eff_spread_c,
       CAST(SUM(2 * sgn * (trade_c - fwd_c)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_realized_spread_c,
       CAST(SUM(2 * sgn * (fwd_c - mid_c)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_price_impact_c
FROM x GROUP BY user_id
""",
    tags=("A2", "finance", "microstructure"),
)
def effective_spread_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TAQ execution-cost decomposition per pair — effective spread
    2|P−m|, 5-minute price impact 2q(m₊−m), and realized spread
    2q(P−m₊) — the liquidity-cost triple (Huang-Stoll) that SEC Rule 605
    reports are built from, and the REALIZED companion the Roll/Amihud
    estimators can only proxy: it needs the actual quote at the trade
    AND the quote five minutes later. Identity s_eff ≡ s_real + s_impact
    holds exactly in integers (q·(P−m) = |P−m|).

    Both as-ofs ride one union: the at-trade mid is the backward
    running LAST_VALUE(quote IGNORE NULLS) (quotes sort before trades at
    the same µs — the inclusive as-of idiom of `asof_merge` above); the
    post-trade mid is a forward RANGE frame (first quote at-or-after
    t+Δ) on the same pair-keyed exchange — no self-join, no range
    explosion. Quotes are first collapsed to one row per (pair, µs)
    (arg_max by event_id) so both window reads are deterministic.
    Trade sign is quote-test q = sign(P−m); midpoint trades carry q=0
    (their costs cancel identically in both engines). End-of-tape
    trades with no quote past t+Δ are excluded by the NULL guard —
    truncation, not extrapolation.

    Exactness: every spread component is an int64 cents sum; the three
    averages are one IEEE divide each. Plan: the quote collapse is one
    map-combined (pair, µs) aggregation; the union shuffles ONCE on the
    pair key, both window passes (rows-frame backward, range-frame
    forward) and the final per-pair rollup share that exchange. At
    100 TB this is the one-sort-shuffle tape shape of the family
    (SCALE.md §19). Reference anchor: the scanner prices opportunities
    off the latest book mid (`virginia/logic/opportunity_scanner.py:
    190-191`) but never measures its own execution cost against the
    post-trade mid — this is that missing report."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("cast(round(value * 100) as bigint)")
    q = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.expr("ts div 1000").alias("ts_us"),
                cents.alias("c"), "event_id")
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("c", "event_id").alias("quote_c"))
    )
    t = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        cents.alias("trade_c"),
    )
    u = q.select(
        "user_id",
        "ts_us",
        F.lit(0).alias("side"),
        "quote_c",
        F.lit(None).cast("long").alias("trade_c"),
    ).unionByName(
        t.select(
            "user_id",
            "ts_us",
            F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("quote_c"),
            "trade_c",
        )
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(_SPREAD_HORIZON_US, Window.unboundedFollowing)
    )
    w = u.select(
        "user_id",
        "side",
        "trade_c",
        F.last("quote_c", ignorenulls=True).over(w_back).alias("mid_c"),
        F.first("quote_c", ignorenulls=True).over(w_fwd).alias("fwd_c"),
    )
    x = w.filter(
        (F.col("side") == 1)
        & F.col("mid_c").isNotNull()
        & F.col("fwd_c").isNotNull()
    ).select(
        "user_id",
        F.when(F.col("trade_c") > F.col("mid_c"), 1)
        .when(F.col("trade_c") < F.col("mid_c"), -1)
        .otherwise(0)
        .alias("sgn"),
        "trade_c",
        "mid_c",
        "fwd_c",
    )
    agg = x.groupBy(F.col("user_id").alias("pair_key")).agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(2 * F.abs(F.col("trade_c") - F.col("mid_c"))).alias("s_eff"),
        F.sum(2 * F.col("sgn") * (F.col("trade_c") - F.col("fwd_c"))).alias(
            "s_real"
        ),
        F.sum(2 * F.col("sgn") * (F.col("fwd_c") - F.col("mid_c"))).alias(
            "s_impact"
        ),
    )
    nd = F.col("n_trades").cast("double")
    return agg.select(
        "pair_key",
        "n_trades",
        "s_eff",
        "s_real",
        "s_impact",
        (F.col("s_eff").cast("double") / nd).alias("avg_eff_spread_c"),
        (F.col("s_real").cast("double") / nd).alias("avg_realized_spread_c"),
        (F.col("s_impact").cast("double") / nd).alias("avg_price_impact_c"),
    )
# ---------------------------------------------------------------------------
# Pairs-trading signal: AR(1) mean reversion of the cross-venue spread
# ---------------------------------------------------------------------------
_MR_BUCKET_US = 86_400_000_000  # daily buckets
_MR_MIN_STEPS = 4

_MR_ORACLE = f"""
WITH k AS (
  SELECT user_id AS pair_key, epoch_us(ts) // {_MR_BUCKET_US} AS b,
         CAST(round(value * 100) AS BIGINT) % 97 + 1 AS px
  FROM events WHERE event_type IN ('click', 'view')
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id, epoch_us(ts) // {_MR_BUCKET_US}
    ORDER BY ts DESC, event_id DESC) = 1
),
p AS (
  SELECT user_id AS pair_key, epoch_us(ts) // {_MR_BUCKET_US} AS b,
         CAST(round(value * 100) AS BIGINT) % 99 + 1 AS px
  FROM events WHERE event_type IN ('purchase', 'signup', 'error')
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id, epoch_us(ts) // {_MR_BUCKET_US}
    ORDER BY ts DESC, event_id DESC) = 1
),
s AS (
  SELECT k.pair_key, k.b, k.px - p.px AS sp
  FROM k JOIN p ON p.pair_key = k.pair_key AND p.b = k.b
),
steps AS (
  SELECT pair_key, b, sp, LAG(sp) OVER w AS s0, LAG(b) OVER w AS b0
  FROM s WINDOW w AS (PARTITION BY pair_key ORDER BY b)
),
xy AS (
  SELECT pair_key, s0 AS x, sp - s0 AS y FROM steps WHERE b0 = b - 1
),
m AS (
  SELECT pair_key, CAST(COUNT(*) AS BIGINT) AS n_steps,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM xy GROUP BY pair_key
)
SELECT pair_key, n_steps, sx, sy, sxx, sxy,
       (CAST(n_steps AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n_steps AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS ar_beta
FROM m
WHERE n_steps >= {_MR_MIN_STEPS} AND n_steps * sxx > sx * sx
"""


@query("spread_mean_reversion", oracle=_MR_ORACLE, tags=("J1", "A2", "finance"))
def spread_mean_reversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reversion speed of the cross-venue spread — the pairs-trading
    signal that decides whether an arbitrage position should be HELD
    (Engle-Granger step 2 / discrete Ornstein-Uhlenbeck): regress the
    daily spread change Δs_b on the lagged spread s_{b-1} per pair;
    ar_beta < 0 means the spread pulls back toward its mean and
    phi = 1 + ar_beta is the AR(1) root (half-life = -ln2/ln(phi)).
    The scanner prices the INSTANT margin
    (`virginia/logic/opportunity_scanner.py:431-500`); this measures
    whether a margin that persists is a drifting regime or a reverting
    spread — the difference between closing the position and holding it.

    Semantics: each venue's daily close is the last quote of the bucket
    ((ts, event_id)-deterministic max_by); the spread exists only on
    days BOTH venues quoted; regression steps use CONTIGUOUS days only
    (b = prev_b + 1) so gaps never fabricate a multi-day move; pairs
    need >= 4 steps and integer-positive variance.
    Exactness: all five regression moments are int64; ar_beta is the
    one IEEE divide.

    Plan (one scan + tiny exchanges): the per-(pair, day) venue closes
    come from ONE pass with venue-conditional max_by — map-side partial
    combine means raw ticks never shuffle, only (pair, day) partials do.
    The LAG window and final per-pair rollup then re-exchange the
    day-series, which is <= 30 rows/pair — at 100 TB the shuffled bytes
    are the series, not the tape (same shape as venue_lead_lag)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is_kalshi = F.col("event_type").isin("click", "view")
    order_key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    closes = (
        ev.groupBy(
            F.col("user_id").alias("pair_key"),
            F.expr(f"(ts div 1000) div {_MR_BUCKET_US}").alias("b"),
        )
        .agg(
            F.max_by(cents % 97 + 1, F.when(is_kalshi, order_key)).alias("k_px"),
            F.max_by(cents % 99 + 1, F.when(~is_kalshi, order_key)).alias("p_px"),
        )
        .filter(F.col("k_px").isNotNull() & F.col("p_px").isNotNull())
        .select("pair_key", "b", (F.col("k_px") - F.col("p_px")).alias("sp"))
    )
    w = Window.partitionBy("pair_key").orderBy("b")
    steps = closes.select(
        "pair_key",
        "b",
        "sp",
        F.lag("sp").over(w).alias("s0"),
        F.lag("b").over(w).alias("b0"),
    ).filter(F.col("b0") == F.col("b") - 1)
    xy = steps.select(
        "pair_key", F.col("s0").alias("x"), (F.col("sp") - F.col("s0")).alias("y")
    )
    m = xy.groupBy("pair_key").agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return m.filter(
        (F.col("n_steps") >= _MR_MIN_STEPS)
        & (F.col("n_steps") * F.col("sxx") > F.col("sx") * F.col("sx"))
    ).select(
        "pair_key",
        "n_steps",
        "sx",
        "sy",
        "sxx",
        "sxy",
        (
            (d("n_steps") * d("sxy") - d("sx") * d("sy"))
            / (d("n_steps") * d("sxx") - d("sx") * d("sx"))
        ).alias("ar_beta"),
    )


# ---------------------------------------------------------------------------
# Quote-stuffing surveillance: trailing message bursts + Fano overdispersion
# ---------------------------------------------------------------------------
_QS_WINDOW_US = 14_400_000_000  # trailing 4h burst window
_QS_BUCKET_US = 3_600_000_000  # hourly rate buckets for the Fano factor
_QS_BURST_MIN = 4

_QS_ORACLE = f"""
WITH msg AS (
  SELECT user_id AS pair_key, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('click', 'view')
),
wcnt AS (
  SELECT pair_key, ts_us,
         COUNT(*) OVER (PARTITION BY pair_key ORDER BY ts_us
                        RANGE BETWEEN {_QS_WINDOW_US - 1} PRECEDING
                              AND CURRENT ROW) AS cw
  FROM msg
),
hour AS (
  SELECT pair_key, ts_us // {_QS_BUCKET_US} AS hb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM msg GROUP BY pair_key, ts_us // {_QS_BUCKET_US}
),
fano AS (
  SELECT pair_key, CAST(COUNT(*) AS BIGINT) AS n_active_hours,
         CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS sc2
  FROM hour GROUP BY pair_key
),
burst AS (
  SELECT pair_key, CAST(COUNT(*) AS BIGINT) AS n_msgs,
         CAST(MAX(cw) AS BIGINT) AS max_burst,
         CAST(SUM(CASE WHEN cw >= {_QS_BURST_MIN} THEN 1 ELSE 0 END)
              AS BIGINT) AS burst_ticks
  FROM wcnt GROUP BY pair_key
)
SELECT b.pair_key, b.n_msgs, b.max_burst, b.burst_ticks,
       f.n_active_hours,
       f.n_active_hours * f.sc2 - f.sc * f.sc AS fano_num,
       f.n_active_hours * f.sc AS fano_den,
       CAST(f.n_active_hours * f.sc2 - f.sc * f.sc AS DOUBLE)
         / CAST(f.n_active_hours * f.sc AS DOUBLE) AS fano
FROM burst b JOIN fano f ON f.pair_key = b.pair_key
"""


@query("quote_stuffing_bursts", oracle=_QS_ORACLE, tags=("F6", "A8", "surveillance"))
def quote_stuffing_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote-stuffing surveillance per pair: trailing-4h message-count
    bursts (max burst, ticks at/over the threshold) plus the FANO
    FACTOR of hourly message counts — variance over mean of the arrival
    rate, 1 for a Poisson feed, >1 for the clumped bursts stuffing
    produces. This is the market-integrity readout next to the
    liveness monitor (`streaming_subscriber_liveness` asks "is the feed
    alive"; this asks "is it TOO alive"). Reference anchor: the
    subscriber managers count messages per pair
    (`virginia/api/data_feed.py`) but never test the arrival process.

    Semantics: messages are Kalshi quote updates; the burst count is a
    closed trailing RANGE frame (peers at the same µs count together,
    so ties need no ordering tie-break); the Fano factor uses non-empty
    hourly buckets (documented: an idle-hour-inclusive rate needs the
    dense grid of downsample_gap_fill). fano_num/fano_den are exact
    int64; fano is the one IEEE divide.

    Plan — ONE exchange, NO join-back (the SCALE.md §19 lesson applied
    at write time): the hourly-bucket moments come from the same
    pair-keyed exchange as the burst window — per-row hour counts c via
    a (pair, hour) window satisfy Σ_hours c² = Σ_rows c, and
    n_active_hours = Σ_rows [row_number within hour = 1] — so the
    oracle's burst-join-fano is computed join-free and the raw message
    stream shuffles exactly once."""
    ev = load_table(spark, sf_dir, "events")
    msg = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("pair_key"),
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
    )
    hb = F.expr(f"ts_us div {_QS_BUCKET_US}")
    w_burst = (
        Window.partitionBy("pair_key")
        .orderBy("ts_us")
        .rangeBetween(-(_QS_WINDOW_US - 1), 0)
    )
    w_hour = Window.partitionBy("pair_key", hb)
    w_hour_rn = Window.partitionBy("pair_key", hb).orderBy("ts_us", "event_id")
    tagged = msg.select(
        "pair_key",
        F.count(F.lit(1)).over(w_burst).alias("cw"),
        F.count(F.lit(1)).over(w_hour).alias("c_hb"),
        F.row_number().over(w_hour_rn).alias("rn_hb"),
    )
    agg = tagged.groupBy("pair_key").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.max("cw").alias("max_burst"),
        F.sum(F.when(F.col("cw") >= _QS_BURST_MIN, 1).otherwise(0)).alias(
            "burst_ticks"
        ),
        F.sum(F.when(F.col("rn_hb") == 1, 1).otherwise(0)).alias("n_active_hours"),
        F.sum("c_hb").alias("sc2"),
    )
    num = F.col("n_active_hours") * F.col("sc2") - F.col("n_msgs") * F.col("n_msgs")
    den = F.col("n_active_hours") * F.col("n_msgs")
    return agg.select(
        "pair_key",
        "n_msgs",
        "max_burst",
        "burst_ticks",
        "n_active_hours",
        num.alias("fano_num"),
        den.alias("fano_den"),
        (num.cast("double") / den.cast("double")).alias("fano"),
    )
# ---------------------------------------------------------------------------
# Robust trend: Theil-Sen median slope per pair (vs the OLS slope it guards)
# ---------------------------------------------------------------------------
_TS_BUCKET_US = 3_600_000_000  # hourly closes
_TS_MIN_POINTS = 5

_TS_ORACLE = f"""
WITH pts AS (
  SELECT user_id AS pair_key, epoch_us(ts) // {_TS_BUCKET_US} AS h,
         CAST(round(value * 100) AS BIGINT) % 97 + 1 AS px
  FROM events WHERE event_type IN ('click', 'view')
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id, epoch_us(ts) // {_TS_BUCKET_US}
    ORDER BY ts DESC, event_id DESC) = 1
),
base AS (
  SELECT pair_key, CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(SUM(h) AS BIGINT) AS sh, CAST(SUM(px) AS BIGINT) AS sp,
         CAST(SUM(h * px) AS BIGINT) AS shp,
         CAST(SUM(h * h) AS BIGINT) AS shh
  FROM pts GROUP BY pair_key
  HAVING COUNT(*) >= {_TS_MIN_POINTS}
     AND COUNT(*) * SUM(h * h) > SUM(h) * SUM(h)
),
slopes AS (
  SELECT a.pair_key,
         CAST(b.px - a.px AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS m
  FROM pts a JOIN pts b ON b.pair_key = a.pair_key AND b.h > a.h
),
ranked AS (
  SELECT pair_key, m,
         ROW_NUMBER() OVER (PARTITION BY pair_key ORDER BY m) AS rn,
         COUNT(*) OVER (PARTITION BY pair_key) AS n_slopes
  FROM slopes
)
SELECT r.pair_key, b.n_points, CAST(r.n_slopes AS BIGINT) AS n_slopes,
       r.m AS theil_slope,
       (CAST(b.n_points AS DOUBLE) * CAST(b.shp AS DOUBLE)
        - CAST(b.sh AS DOUBLE) * CAST(b.sp AS DOUBLE))
       / (CAST(b.n_points AS DOUBLE) * CAST(b.shh AS DOUBLE)
          - CAST(b.sh AS DOUBLE) * CAST(b.sh AS DOUBLE)) AS ols_slope
FROM ranked r JOIN base b ON b.pair_key = r.pair_key
WHERE r.rn = (r.n_slopes + 1) // 2
"""


@query("theil_sen_trend", oracle=_TS_ORACLE, tags=("A2", "robust", "finance"))
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per pair — the median of all pairwise
    slopes (px_j - px_i)/(h_j - h_i) over the hourly close series, next
    to the OLS slope it guards: OLS moves with a single fat-finger
    quote, the median slope needs HALF the tape corrupted (29.3%
    breakdown point). The gap between the two columns IS the
    contamination alarm, the same reading trimmed_mean_by_type gives
    for levels, now for TRENDS.

    Exactness: slope doubles are one IEEE divide of small-integer
    dy/dx — distinct rationals with |dy| <= 96, dx <= 720 differ by
    >= 1/518400, far above double epsilon at this magnitude, so double
    order IS exact rational order; the median is the value at fixed
    rank (m+1)//2 (lower median — never the average of two), which is
    tie-safe because equal doubles are equal values. The OLS side is
    exact int64 moments and one IEEE divide.

    Plan: hourly closes are one (pair, hour) max_by aggregation (raw
    ticks never shuffle); the pairwise slopes are an EQUI-join on the
    pair key (never a cartesian — the h_j > h_i refinement rides the
    hash join), the rank window shares the join's pair partitioning,
    and the closes table is checkpointed once for its two consumers
    (moments + slopes). Per-pair work is quadratic in per-pair POINTS
    (bounded: <= 720 hourly closes/month -> <= 259k slopes), the
    documented cost of the exact estimator; the 100 TB scale path is
    Siegel's repeated median on sampled offsets, same plan shape.
    Reference anchor: trend estimates in the reference come from raw
    OLS over polled quotes (`virginia/logic/opportunity_scanner.py`);
    this is the version one bad snapshot cannot steer."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    order_key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    pts = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(
            F.col("user_id").alias("pair_key"),
            F.expr(f"(ts div 1000) div {_TS_BUCKET_US}").alias("h"),
        )
        .agg(F.max_by(cents % 97 + 1, order_key).alias("px"))
        # closes table: checkpoint once for its two consumers
        # (the OLS moment rollup and the pairwise slope join)
        .localCheckpoint()
    )
    base = (
        pts.groupBy("pair_key")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("h").alias("sh"),
            F.sum("px").alias("sp"),
            F.sum(F.col("h") * F.col("px")).alias("shp"),
            F.sum(F.col("h") * F.col("h")).alias("shh"),
        )
        .filter(
            (F.col("n_points") >= _TS_MIN_POINTS)
            & (F.col("n_points") * F.col("shh") > F.col("sh") * F.col("sh"))
        )
    )
    a = pts.select("pair_key", F.col("h").alias("h1"), F.col("px").alias("px1"))
    b = pts.select("pair_key", F.col("h").alias("h2"), F.col("px").alias("px2"))
    slopes = (
        a.join(b, "pair_key")
        .filter(F.col("h2") > F.col("h1"))
        .select(
            "pair_key",
            (
                (F.col("px2") - F.col("px1")).cast("double")
                / (F.col("h2") - F.col("h1")).cast("double")
            ).alias("m"),
        )
    )
    w_rank = Window.partitionBy("pair_key").orderBy("m")
    w_all = Window.partitionBy("pair_key")
    ranked = slopes.select(
        "pair_key",
        "m",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_slopes"),
    ).filter(F.col("rn") == F.expr("(n_slopes + 1) div 2"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return ranked.join(base, "pair_key").select(
        "pair_key",
        "n_points",
        F.col("n_slopes").cast("long").alias("n_slopes"),
        F.col("m").alias("theil_slope"),
        (
            (d("n_points") * d("shp") - d("sh") * d("sp"))
            / (d("n_points") * d("shh") - d("sh") * d("sh"))
        ).alias("ols_slope"),
    )


# ---------------------------------------------------------------------------
# Event study: cumulative abnormal return around system 'error' events
# ---------------------------------------------------------------------------
_ES_DAY_US = 86_400_000_000
_ES_EPOCH_DAY0 = 19723  # 2024-01-01 in epoch days: fixed relabeling constant
_ES_EST_DAYS = 15  # estimation window: days [0, 15); events scored in [15, ..)
_ES_WIN = 2  # event window: relative days 0..1
_ES_MIN_EST = 6

_ES_ORACLE = f"""
WITH pts AS (
  SELECT user_id AS pair_key,
         epoch_us(ts) // {_ES_DAY_US} - {_ES_EPOCH_DAY0} AS h,
         CAST(round(value * 100) AS BIGINT) % 97 + 1 AS px
  FROM events WHERE event_type IN ('click', 'view')
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id, epoch_us(ts) // {_ES_DAY_US}
    ORDER BY ts DESC, event_id DESC) = 1
),
mv AS (
  SELECT pair_key, h, px - LAG(px) OVER w AS dk, h - LAG(h) OVER w AS gap
  FROM pts WINDOW w AS (PARTITION BY pair_key ORDER BY h)
  QUALIFY gap = 1
),
idx AS (SELECT h, (SUM(dk) * 100) // COUNT(*) AS di FROM mv GROUP BY h),
joined AS (
  SELECT m.pair_key, m.h, m.dk, i.di FROM mv m JOIN idx i ON i.h = m.h
),
est AS (
  SELECT pair_key, COUNT(*) AS n, SUM(di) AS sx, SUM(dk) AS sy,
         SUM(di * di) AS sxx, SUM(di * dk) AS sxy
  FROM joined WHERE h < {_ES_EST_DAYS} GROUP BY pair_key
  HAVING COUNT(*) >= {_ES_MIN_EST}
     AND COUNT(*) * SUM(di * di) - SUM(di) * SUM(di) >= COUNT(*)
),
beta AS (
  SELECT pair_key,
         (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS beta_ppm
  FROM est
),
ev AS (
  SELECT user_id AS pair_key,
         epoch_us(ts) // {_ES_DAY_US} - {_ES_EPOCH_DAY0} AS h0, event_id
  FROM events
  WHERE event_type = 'error'
    AND epoch_us(ts) // {_ES_DAY_US} - {_ES_EPOCH_DAY0} >= {_ES_EST_DAYS}
),
win AS (
  SELECT e.pair_key, e.event_id, e.h0 + t.tau AS h
  FROM ev e, unnest(range(0, {_ES_WIN})) t(tau)
),
ar AS (
  SELECT w.pair_key, w.event_id,
         j.dk * 1000000 - b.beta_ppm * j.di AS ar_x1e6
  FROM win w
  JOIN joined j ON j.pair_key = w.pair_key AND j.h = w.h
  JOIN beta b ON b.pair_key = w.pair_key
)
SELECT pair_key,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(SUM(ar_x1e6) AS BIGINT) AS car_x1e6,
       CAST(SUM(ar_x1e6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_ar_x1e6
FROM ar GROUP BY pair_key
"""


@query("event_study_car", oracle=_ES_ORACLE, tags=("A2", "J2", "econometrics"))
def event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study (MacKinlay 1997) around the pipeline's own failures:
    cumulative abnormal return of each pair in the two days after every
    'error' event, under the market model dk = beta * di estimated on
    the first 15 days — the econometric answer to "do our outages MOVE
    the prices we trade?" that the reference's error counters
    (`virginia/api/data_feed.py`) cannot give. Abnormal move is exact
    integer fixed point: ar_x1e6 = dk*10^6 - beta_ppm*di with beta_ppm
    the truncating integer divide of int64 regression moments (both
    engines truncate BIGINT division identically) and di the x100
    equal-weight cross-sectional index move — no float enters until the
    one IEEE divide for the per-pair average.

    Alignment semantics: daily last-quote closes ((ts, event_id)
    max_by); moves on contiguous days only; event windows may overlap
    (each event scores its own window rows); windows reaching days with
    no move are truncated, not extrapolated; pairs need >= 6 estimation
    moves and an integer-positive variance (>= n keeps beta_ppm
    magnitudes int64-safe by construction).

    Plan: closes aggregate map-side ((pair, day) partials — raw ticks
    never shuffle); the move table is checkpointed ONCE for its three
    consumers (index build, estimation moments, event scoring); the
    30-row index and the per-pair beta table join back as broadcasts;
    event windows are a 2x map-side explode equi-joined on (pair, day).
    At 100 TB the only corpus-sized exchanges are the closes partials
    and the one (pair, day) join of window probes to moves."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    order_key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    day = F.expr(f"(ts div 1000) div {_ES_DAY_US} - {_ES_EPOCH_DAY0}")
    pts = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.col("user_id").alias("pair_key"), day.alias("h"))
        .agg(F.max_by(cents % 97 + 1, order_key).alias("px"))
    )
    w = Window.partitionBy("pair_key").orderBy("h")
    mv = (
        pts.select(
            "pair_key",
            "h",
            (F.col("px") - F.lag("px").over(w)).alias("dk"),
            (F.col("h") - F.lag("h").over(w)).alias("gap"),
        )
        .filter(F.col("gap") == 1)
        .select("pair_key", "h", "dk")
        # move table: checkpoint once for its three consumers
        # (index build, estimation moments, event-window scoring)
        .localCheckpoint()
    )
    idx = mv.groupBy("h").agg(
        F.expr("(sum(dk) * 100) div count(*)").alias("di")
    )
    joined = mv.join(F.broadcast(idx), "h").select("pair_key", "h", "dk", "di")
    est = (
        joined.filter(F.col("h") < _ES_EST_DAYS)
        .groupBy("pair_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("di").alias("sx"),
            F.sum("dk").alias("sy"),
            F.sum(F.col("di") * F.col("di")).alias("sxx"),
            F.sum(F.col("di") * F.col("dk")).alias("sxy"),
        )
        .filter(
            (F.col("n") >= _ES_MIN_EST)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") >= F.col("n"))
        )
    )
    beta = est.select(
        "pair_key",
        F.expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)").alias(
            "beta_ppm"
        ),
    )
    events = ev.filter((F.col("event_type") == "error") & (day >= _ES_EST_DAYS)).select(
        F.col("user_id").alias("pair_key"), day.alias("h0"), "event_id"
    )
    win_probe = events.select(
        "pair_key",
        "event_id",
        "h0",
        F.explode(F.sequence(F.lit(0), F.lit(_ES_WIN - 1))).alias("tau"),
    ).select("pair_key", "event_id", (F.col("h0") + F.col("tau")).alias("h"))
    ar = (
        win_probe.join(joined, ["pair_key", "h"])
        .join(F.broadcast(beta), "pair_key")
        .select(
            "pair_key",
            "event_id",
            (F.col("dk") * F.lit(1000000) - F.col("beta_ppm") * F.col("di")).alias(
                "ar_x1e6"
            ),
        )
    )
    return ar.groupBy("pair_key").agg(
        F.countDistinct("event_id").alias("n_events"),
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("ar_x1e6").alias("car_x1e6"),
        (
            F.sum("ar_x1e6").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_ar_x1e6"),
    )


# ---------------------------------------------------------------------------
# Realized-volatility signature plot: RV vs sampling interval
# ---------------------------------------------------------------------------
_RV_SCALES_S = (60, 300, 900, 3600)

_RV_ORACLE = f"""
WITH base AS (
  SELECT user_id AS pair_key, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) % 97 + 1 AS px
  FROM events WHERE event_type IN ('click', 'view')
),
sc AS (
  SELECT * FROM (VALUES {", ".join(f"({s})" for s in _RV_SCALES_S)}) t(scale_s0)
  -- widen before the µs multiply: INT32 * 1000000 overflows at 3600s
), scw AS (SELECT CAST(scale_s0 AS BIGINT) AS scale_s FROM sc),
closes AS (
  SELECT b.pair_key, s.scale_s,
         b.ts_us // (s.scale_s * 1000000) AS bkt, b.px
  FROM base b CROSS JOIN scw s
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY b.pair_key, s.scale_s, b.ts_us // (s.scale_s * 1000000)
    ORDER BY b.ts_us DESC, b.event_id DESC) = 1
),
mv AS (
  SELECT pair_key, scale_s, px - LAG(px) OVER w AS dk
  FROM closes WINDOW w AS (PARTITION BY pair_key, scale_s ORDER BY bkt)
  QUALIFY dk IS NOT NULL
)
SELECT pair_key, CAST(scale_s AS BIGINT) AS scale_s,
       CAST(COUNT(*) AS BIGINT) AS n_moves,
       CAST(SUM(dk * dk) AS BIGINT) AS rv,
       CAST(SUM(dk * dk) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rv_per_move
FROM mv GROUP BY pair_key, scale_s
"""


@query("rv_signature_plot", oracle=_RV_ORACLE, tags=("A2", "A6", "finance"))
def rv_signature_plot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The volatility SIGNATURE PLOT (Andersen-Bollerslev-Diebold-Labys):
    realized variance of each pair re-measured at 1m/5m/15m/1h sampling —
    the diagnostic that chooses the RV sampling frequency. Microstructure
    noise inflates RV as the interval shrinks while true diffusion keeps
    it flat; reading rv_per_move across scale_s locates the bias knee.
    This is the missing calibration step in front of realized_variance
    (which fixes one scale) — a 100 TB user runs the signature once per
    regime, then commits the knee scale to the standing job.

    Sampling semantics: previous-tick (last-quote-per-bucket) closes per
    (pair, scale); close-to-close increments across empty buckets equal
    the previous-tick path's increments, since interior grid points
    contribute zero. All RV sums are exact int64 squares of cent moves;
    rv_per_move is the one IEEE divide.

    Plan: the four scales are a map-side explode (x4, never a join);
    closes aggregate with venue-conditional-free max_by partials on
    (pair, scale, bucket) — raw ticks shuffle once as partials — then
    the LAG window and the (pair, scale) rollup share the second,
    series-sized exchange. Same two-tier shape as spread_mean_reversion."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    order_key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    base = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("pair_key"),
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        "ts",
        (cents % 97 + 1).alias("px"),
    )
    fanned = base.select(
        "pair_key",
        "ts_us",
        "ts",
        "event_id",
        "px",
        F.explode(F.array(*[F.lit(s).cast("long") for s in _RV_SCALES_S])).alias("scale_s"),
    )
    closes = fanned.groupBy(
        "pair_key",
        "scale_s",
        F.expr("ts_us div (scale_s * 1000000)").alias("bkt"),
    ).agg(F.max_by("px", order_key).alias("px"))
    w = Window.partitionBy("pair_key", "scale_s").orderBy("bkt")
    mv = closes.select(
        "pair_key",
        "scale_s",
        (F.col("px") - F.lag("px").over(w)).alias("dk"),
    ).filter(F.col("dk").isNotNull())
    return mv.groupBy("pair_key", F.col("scale_s").cast("long").alias("scale_s")).agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.sum(F.col("dk") * F.col("dk")).alias("rv"),
        (
            F.sum(F.col("dk") * F.col("dk")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("rv_per_move"),
    )


# ---------------------------------------------------------------------------
# Granger lead-lag: does yesterday's Kalshi move predict today's Poly move?
# ---------------------------------------------------------------------------
_GR_DAY_US = 86_400_000_000

_GR_ORACLE = f"""
WITH closes AS (
  SELECT user_id AS pair_key, epoch_us(ts) // {_GR_DAY_US} AS b,
         arg_max(CASE WHEN event_type IN ('click', 'view')
                      THEN CAST(round(value * 100) AS BIGINT) % 97 + 1 END,
                 epoch_us(ts) * 4096 + event_id % 4096)
           FILTER (event_type IN ('click', 'view')) AS k,
         arg_max(CASE WHEN event_type IN ('purchase', 'signup', 'error')
                      THEN CAST(round(value * 100) AS BIGINT) % 99 + 1 END,
                 epoch_us(ts) * 4096 + event_id % 4096)
           FILTER (event_type IN ('purchase', 'signup', 'error')) AS p
  FROM events GROUP BY 1, 2
),
both_sides AS (
  SELECT pair_key, b, k, p FROM closes WHERE k IS NOT NULL AND p IS NOT NULL
),
lagged AS (
  SELECT pair_key, b, k, p,
         LAG(k, 1) OVER w AS k1, LAG(k, 2) OVER w AS k2,
         LAG(p, 1) OVER w AS p1, LAG(p, 2) OVER w AS p2,
         LAG(b, 1) OVER w AS b1, LAG(b, 2) OVER w AS b2
  FROM both_sides WINDOW w AS (PARTITION BY pair_key ORDER BY b)
),
obs AS (
  SELECT k - k1 AS dk, p - p1 AS dp, k1 - k2 AS dk1, p1 - p2 AS dp1
  FROM lagged WHERE b1 = b - 1 AND b2 = b - 2
),
directed AS (
  SELECT 'k_to_p' AS direction, dp AS y, dp1 AS x1, dk1 AS x2 FROM obs
  UNION ALL
  SELECT 'p_to_k' AS direction, dk AS y, dk1 AS x1, dp1 AS x2 FROM obs
),
m AS (
  SELECT direction, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(x1 * x1) AS BIGINT) AS sx11,
         CAST(SUM(x2 * x2) AS BIGINT) AS sx22,
         CAST(SUM(x1 * x2) AS BIGINT) AS sx12,
         CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
         CAST(SUM(x2 * y) AS BIGINT) AS sx2y
  FROM directed GROUP BY direction
),
cen AS (
  SELECT direction, n,
         n * sx11 - sx1 * sx1 AS c11,
         n * sx22 - sx2 * sx2 AS c22,
         n * sx12 - sx1 * sx2 AS c12,
         n * sx1y - sx1 * sy AS c1y,
         n * sx2y - sx2 * sy AS c2y
  FROM m
)
SELECT direction, n, c11, c22, c12, c1y, c2y,
       (CAST(c1y AS DOUBLE) * CAST(c22 AS DOUBLE)
        - CAST(c2y AS DOUBLE) * CAST(c12 AS DOUBLE))
       / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
          - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)) AS beta_own_lag,
       (CAST(c2y AS DOUBLE) * CAST(c11 AS DOUBLE)
        - CAST(c1y AS DOUBLE) * CAST(c12 AS DOUBLE))
       / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
          - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)) AS beta_cross_lag
FROM cen
WHERE CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      > CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)
"""


@query("granger_lead_lag", oracle=_GR_ORACLE, tags=("J1", "A2", "econometrics"))
def granger_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger lead-lag — the CAUSAL capstone of the venue_lead_lag
    correlogram: pooled two-regressor OLS of each venue's daily move on
    its OWN lag and the OTHER venue's lag, both directions at once. A
    cross-lag coefficient that survives the own-lag control is the
    actionable version of lead-lag correlation (trade the follower on
    the leader's move); correlation alone can't distinguish leading
    from shared autocorrelation — that's precisely the own-lag term.

    Exactness: observations need three consecutive both-venue days
    (moves AND their lags exist); the nine pooled moments are exact
    int64; the centered normal-equation terms c_ij = n*S_ij - S_i*S_j
    stay int64 (n <= 10^4, |moves| < 100); each coefficient is the
    SAME fixed five-operation IEEE tree in both engines (exact int64
    operands < 2^53 convert losslessly). Degenerate design matrices
    are excluded by the positive-definiteness gate evaluated on the
    same lossless double tree in both engines (the int64 product
    c11*c22 would overflow at sf >= 0.1).

    Plan: venue-conditional max_by closes in ONE scan (raw ticks never
    shuffle), one pair-keyed window for all six stacked LAGs
    (move_acf_profile's idiom), a 2x map-side direction explode, and a
    2-group rollup. Two tiny exchanges past the closes partials."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is_kalshi = F.col("event_type").isin("click", "view")
    okey = F.expr("(ts div 1000) * 4096 + event_id % 4096")
    closes = (
        ev.groupBy(
            F.col("user_id").alias("pair_key"),
            F.expr(f"(ts div 1000) div {_GR_DAY_US}").alias("b"),
        )
        .agg(
            F.max_by(cents % 97 + 1, F.when(is_kalshi, okey)).alias("k"),
            F.max_by(cents % 99 + 1, F.when(~is_kalshi, okey)).alias("p"),
        )
        .filter(F.col("k").isNotNull() & F.col("p").isNotNull())
    )
    w = Window.partitionBy("pair_key").orderBy("b")
    lagged = closes.select(
        "pair_key",
        "b",
        "k",
        "p",
        F.lag("k", 1).over(w).alias("k1"),
        F.lag("k", 2).over(w).alias("k2"),
        F.lag("p", 1).over(w).alias("p1"),
        F.lag("p", 2).over(w).alias("p2"),
        F.lag("b", 1).over(w).alias("b1"),
        F.lag("b", 2).over(w).alias("b2"),
    )
    obs = lagged.filter(
        (F.col("b1") == F.col("b") - 1) & (F.col("b2") == F.col("b") - 2)
    ).select(
        (F.col("k") - F.col("k1")).alias("dk"),
        (F.col("p") - F.col("p1")).alias("dp"),
        (F.col("k1") - F.col("k2")).alias("dk1"),
        (F.col("p1") - F.col("p2")).alias("dp1"),
        # observation table: checkpoint once so the 2x direction union
        # reads the materialized triples instead of recomputing the
        # whole scan+window subtree per branch (SCALE.md §19)
    ).localCheckpoint()
    directed = obs.select(
        F.lit("k_to_p").alias("direction"),
        F.col("dp").alias("y"),
        F.col("dp1").alias("x1"),
        F.col("dk1").alias("x2"),
    ).unionByName(
        obs.select(
            F.lit("p_to_k").alias("direction"),
            F.col("dk").alias("y"),
            F.col("dk1").alias("x1"),
            F.col("dp1").alias("x2"),
        )
    )
    m = directed.groupBy("direction").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    cen = m.select(
        "direction",
        "n",
        (F.col("n") * F.col("sx11") - F.col("sx1") * F.col("sx1")).alias("c11"),
        (F.col("n") * F.col("sx22") - F.col("sx2") * F.col("sx2")).alias("c22"),
        (F.col("n") * F.col("sx12") - F.col("sx1") * F.col("sx2")).alias("c12"),
        (F.col("n") * F.col("sx1y") - F.col("sx1") * F.col("sy")).alias("c1y"),
        (F.col("n") * F.col("sx2y") - F.col("sx2") * F.col("sy")).alias("c2y"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    det = d("c11") * d("c22") - d("c12") * d("c12")
    return cen.filter(
        # positive-definiteness gate on the SAME double tree both engines
        # evaluate (c terms are < 2^53 so int64 -> double is lossless;
        # the int64 product would overflow at sf >= 0.1)
        d("c11") * d("c22") > d("c12") * d("c12")
    ).select(
        "direction",
        "n",
        "c11",
        "c22",
        "c12",
        "c1y",
        "c2y",
        ((d("c1y") * d("c22") - d("c2y") * d("c12")) / det).alias("beta_own_lag"),
        ((d("c2y") * d("c11") - d("c1y") * d("c12")) / det).alias("beta_cross_lag"),
    )


# ---------------------------------------------------------------------------
# Haar wavelet energy decomposition: variance by TIMESCALE, exact integers
# ---------------------------------------------------------------------------
_HAAR_N = 16  # dyadic window: first 16 quotes per pair
_HAAR_J = 4  # levels: block sizes 1, 2, 4, 8 per half

_HAAR_ORACLE = f"""
WITH ticks AS (
  SELECT user_id AS pair_key,
         CAST(round(value * 100) AS BIGINT) % 97 + 1 AS px,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('click', 'view')
  QUALIFY rn <= {_HAAR_N}
),
eligible AS (
  SELECT pair_key FROM ticks GROUP BY pair_key HAVING COUNT(*) = {_HAAR_N}
),
lv AS (SELECT unnest(range(1, {_HAAR_J} + 1)) AS j),
fan AS (
  SELECT t.pair_key, lv.j, t.px,
         (t.rn - 1) // (1 << lv.j) AS blk,
         ((t.rn - 1) // (1 << (lv.j - 1))) % 2 AS half
  FROM ticks t JOIN eligible e ON e.pair_key = t.pair_key
  CROSS JOIN lv
),
coeff AS (
  SELECT pair_key, j, blk,
         CAST(SUM(CASE WHEN half = 1 THEN px ELSE -px END) AS BIGINT) AS d
  FROM fan GROUP BY pair_key, j, blk
)
SELECT pair_key, CAST(j AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_coeffs,
       CAST(SUM(d * d) AS BIGINT) AS energy
FROM coeff GROUP BY pair_key, j
"""


@query("haar_energy_decomposition", oracle=_HAAR_ORACLE, tags=("A2", "dsp", "finance"))
def haar_energy_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of each pair's quote tape —
    WHERE does the volatility live in timescale? Level j's unnormalized
    detail coefficient is (sum of the right 2^(j-1) ticks) minus (sum of
    the left 2^(j-1) ticks) within each 2^j block of the first 16
    quotes; energy_j = Σ d² splits total tape variation by scale
    (tick-to-tick chop at level 1, slow drifts at level 4). The
    multiresolution companion to rv_signature_plot: the signature plot
    re-SAMPLES the path per scale, the wavelet decomposition PARTITIONS
    one fixed window's energy across scales — microstructure noise
    loads the fine levels, regime drift the coarse ones (Gencay-
    Selcuk-Whitcher). Everything is exact int64 (unnormalized Haar
    needs no sqrt(2): energies are integer multiples of the orthonormal
    ones per level, documented); no float anywhere.

    Plan — ONE exchange end to end: the rank window partitions by pair;
    the x4 level fan-out is a map-side explode; and both the
    (pair, level, block) coefficient aggregation and the (pair, level)
    energy rollup are satisfied by the pair clustering (grouping keys
    are supersets of the partitioning key), so neither adds a shuffle.
    Dyadic truncation to the first 16 ticks is the documented
    window rule (pairs with fewer quotes are excluded, not padded)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w_rank = Window.partitionBy("pair_key").orderBy("ts", "event_id")
    w_all = Window.partitionBy("pair_key")
    ticks = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("user_id").alias("pair_key"),
            (cents % 97 + 1).alias("px"),
            "ts",
            "event_id",
        )
        .select(
            "pair_key",
            "px",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("n_total"),
        )
        .filter((F.col("rn") <= _HAAR_N) & (F.col("n_total") >= _HAAR_N))
    )
    fan = ticks.select(
        "pair_key",
        "px",
        "rn",
        F.explode(F.sequence(F.lit(1), F.lit(_HAAR_J))).alias("j"),
    ).select(
        "pair_key",
        F.col("j").cast("long").alias("j"),
        "px",
        F.expr("(rn - 1) div shiftleft(1, j)").alias("blk"),
        F.expr("((rn - 1) div shiftleft(1, j - 1)) % 2").alias("half"),
    )
    coeff = fan.groupBy("pair_key", "j", "blk").agg(
        F.sum(
            F.when(F.col("half") == 1, F.col("px")).otherwise(-F.col("px"))
        ).alias("d")
    )
    return coeff.groupBy("pair_key", F.col("j").alias("level")).agg(
        F.count(F.lit(1)).alias("n_coeffs"),
        F.sum(F.col("d") * F.col("d")).alias("energy"),
    )


# ---------------------------------------------------------------------------
# Cross-sectional signal evaluation: hourly rank IC of flow vs forward move
# ---------------------------------------------------------------------------
_IC_BUCKET_US = 86_400_000_000  # daily cross-sections: the synthetic tape is too sparse for hourly


@query(
    "signal_ic_daily",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
m AS (
  SELECT user_id, ts_us, event_id, cents,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS mv,
         ts_us // {_IC_BUCKET_US} AS h
  FROM c
),
hb AS (
  SELECT user_id, h,
         CAST(SUM(CASE WHEN mv > 0 THEN 1
                       WHEN mv < 0 THEN -1 ELSE 0 END) AS BIGINT) AS flow,
         arg_max(cents, ts_us * 4096 + event_id % 4096) AS close_c
  FROM m GROUP BY user_id, h
),
fwd AS (
  SELECT user_id, h, flow,
         LEAD(close_c) OVER w - close_c AS fwd_mv,
         LEAD(h) OVER w AS h_next
  FROM hb WINDOW w AS (PARTITION BY user_id ORDER BY h)
),
obs AS (
  SELECT h, flow, fwd_mv FROM fwd WHERE h_next = h + 1
),
rk AS (
  SELECT h,
         2 * RANK() OVER (PARTITION BY h ORDER BY flow)
           + COUNT(*) OVER (PARTITION BY h, flow) - 1 AS rs,
         2 * RANK() OVER (PARTITION BY h ORDER BY fwd_mv)
           + COUNT(*) OVER (PARTITION BY h, fwd_mv) - 1 AS rf
  FROM obs
),
mom AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rs) AS BIGINT) AS ss, CAST(SUM(rf) AS BIGINT) AS sf,
         CAST(SUM(rs * rs) AS BIGINT) AS ss2,
         CAST(SUM(rf * rf) AS BIGINT) AS sf2,
         CAST(SUM(rs * rf) AS BIGINT) AS ssf
  FROM rk GROUP BY h
)
SELECT h AS day_bucket, n, ss, sf, ssf,
       (CAST(n AS DOUBLE) * CAST(ssf AS DOUBLE)
        - CAST(ss AS DOUBLE) * CAST(sf AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(ss2 AS DOUBLE)
               - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(sf2 AS DOUBLE)
                 - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))) AS rank_ic
FROM mom
WHERE n * ss2 > ss * ss AND n * sf2 > sf * sf
""",
    tags=("A2", "econometrics", "finance", "signal-eval"),
)
def signal_ic_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ALPHA-EVALUATION loop: daily cross-sectional rank
    INFORMATION COEFFICIENT of intra-day order-flow imbalance against
    the NEXT day's price move — for each day, rank all pairs by their
    tick-rule flow, rank them by their forward close-to-close move, and
    take the tie-exact Spearman across pairs. A signal with predictive
    power shows a persistently positive IC column; this is how a quant
    desk decides whether the scanner's flow signal is tradeable before
    sizing it (the evaluation the reference never runs on its own
    signal). Forward moves require consecutive-day closes (the LEAD
    guard), so no gap ever fakes a return.

    Exactness: ranks use the 2×-average-rank integer trick
    (2·RANK + tiecount − 1 — spearman_rank_corr's tie algebra, here
    cross-sectional); the five moments are exact int64; each IC is the
    same fixed two-sqrt IEEE tree in both engines; degenerate days
    (all-tied ranks) are excluded by the integer variance gates. Rows
    are per-day (no cross-day float averaging — summing per-day
    doubles would be merge-order-dependent; the consumer averages the
    column at whatever precision they need).

    Plan: one pair-keyed window pass for tick moves, a map-combined
    (pair, day) close/flow aggregate riding it, one pair window for
    LEAD, then the day-keyed rank windows and the per-day moment
    rollup share a final day exchange — three exchanges, the last two
    over the tiny daily panel."""
    c = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    m = c.select(
        "user_id",
        "ts_us",
        "event_id",
        "cents",
        (F.col("cents") - F.lag("cents").over(w)).alias("mv"),
        F.expr(f"ts_us div {_IC_BUCKET_US}").alias("h"),
    )
    hb = m.groupBy("user_id", "h").agg(
        F.sum(
            F.when(F.col("mv") > 0, 1).when(F.col("mv") < 0, -1).otherwise(0)
        )
        .cast("long")
        .alias("flow"),
        F.max_by(
            "cents", F.expr("ts_us * 4096 + event_id % 4096")
        ).alias("close_c"),
    )
    wh = Window.partitionBy("user_id").orderBy("h")
    fwd = hb.select(
        "h",
        "flow",
        (F.lead("close_c").over(wh) - F.col("close_c")).alias("fwd_mv"),
        F.lead("h").over(wh).alias("h_next"),
    )
    obs = fwd.filter(F.col("h_next") == F.col("h") + 1).select(
        "h", "flow", "fwd_mv"
    )
    rk = obs.select(
        "h",
        (
            2 * F.rank().over(Window.partitionBy("h").orderBy("flow"))
            + F.count(F.lit(1)).over(Window.partitionBy("h", "flow"))
            - 1
        ).alias("rs"),
        (
            2 * F.rank().over(Window.partitionBy("h").orderBy("fwd_mv"))
            + F.count(F.lit(1)).over(Window.partitionBy("h", "fwd_mv"))
            - 1
        ).alias("rf"),
    )
    mom = rk.groupBy(F.col("h").alias("day_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rs").alias("ss"),
        F.sum("rf").alias("sf"),
        F.sum(F.col("rs") * F.col("rs")).alias("ss2"),
        F.sum(F.col("rf") * F.col("rf")).alias("sf2"),
        F.sum(F.col("rs") * F.col("rf")).alias("ssf"),
    )
    d = lambda x: F.col(x).cast("double")  # noqa: E731
    return mom.filter(
        (F.col("n") * F.col("ss2") > F.col("ss") * F.col("ss"))
        & (F.col("n") * F.col("sf2") > F.col("sf") * F.col("sf"))
    ).select(
        "day_bucket",
        "n",
        "ss",
        "sf",
        "ssf",
        (
            (d("n") * d("ssf") - d("ss") * d("sf"))
            / (
                F.sqrt(d("n") * d("ss2") - d("ss") * d("ss"))
                * F.sqrt(d("n") * d("sf2") - d("sf") * d("sf"))
            )
        ).alias("rank_ic"),
    )


# ---------------------------------------------------------------------------
# Kelly position sizing from empirical trade outcomes
# ---------------------------------------------------------------------------
@query(
    "kelly_position_sizing",
    oracle=f"""
WITH q AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS quote_c
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, epoch_us(ts)
),
t AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS trade_c
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id, ts_us, 0 AS side, quote_c,
         CAST(NULL AS BIGINT) AS trade_c FROM q
  UNION ALL
  SELECT user_id, ts_us, 1 AS side, CAST(NULL AS BIGINT) AS quote_c,
         trade_c FROM t
),
w AS (
  SELECT user_id, side, trade_c,
         FIRST_VALUE(quote_c IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN {_SPREAD_HORIZON_US} FOLLOWING
                       AND UNBOUNDED FOLLOWING) AS fwd_c
  FROM u
),
pnl AS (
  SELECT user_id, fwd_c - trade_c AS p
  FROM w WHERE side = 1 AND fwd_c IS NOT NULL AND fwd_c <> trade_c
),
m AS (
  SELECT user_id AS pair_key,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nw,
         CAST(SUM(CASE WHEN p > 0 THEN p ELSE 0 END) AS BIGINT) AS sw,
         CAST(SUM(CASE WHEN p < 0 THEN -p ELSE 0 END) AS BIGINT) AS sl
  FROM pnl GROUP BY user_id
)
SELECT pair_key, n, nw, sw, sl,
       nw * (sw - sl) AS kelly_num,
       n * sw AS kelly_den,
       CAST(nw * (sw - sl) AS DOUBLE) / CAST(n * sw AS DOUBLE)
         AS kelly_fraction
FROM m WHERE nw > 0 AND sl > 0
""",
    tags=("A2", "finance", "position-sizing"),
)
def kelly_position_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KELLY POSITION SIZING per pair from empirical trade outcomes:
    f* = p − q/b with win probability p = nw/n and win/loss ratio
    b = (sw/nw)/(sl/nl) reduces algebraically to the single rational
    nw·(sw − sl) / (n·sw) — so the optimal fraction is an exact
    integer numerator/denominator pair plus ONE IEEE divide. Trade
    outcome = the pair quote 5 minutes after each fill minus the fill
    price (the effective_spread_metrics forward-frame as-of, so
    'outcome' here is the same post-trade mark that prices execution
    quality); flat outcomes are excluded on both engines, pairs with
    no wins or no losses are gated out (Kelly is undefined without
    both tails). This is the sizing step between the scanner's signal
    and the order — the reference sizes trades by fixed config
    (`virginia/logic/opportunity_scanner.py:69-77`); this derives the
    growth-optimal size from the pair's own history.

    Plan: quotes collapse map-combined per (pair, µs); ONE pair-keyed
    union exchange carries the forward RANGE window and the per-pair
    outcome rollup — the effective-spread one-sort-shuffle shape with
    a divide at the end."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.expr("cast(round(value * 100) as bigint)")
    q = (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            cents.alias("c"),
            "event_id",
        )
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("c", "event_id").alias("quote_c"))
    )
    t = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        cents.alias("trade_c"),
    )
    u = q.select(
        "user_id",
        "ts_us",
        F.lit(0).alias("side"),
        "quote_c",
        F.lit(None).cast("long").alias("trade_c"),
    ).unionByName(
        t.select(
            "user_id",
            "ts_us",
            F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("quote_c"),
            "trade_c",
        )
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(_SPREAD_HORIZON_US, Window.unboundedFollowing)
    )
    w = u.select(
        "user_id",
        "side",
        "trade_c",
        F.first("quote_c", ignorenulls=True).over(w_fwd).alias("fwd_c"),
    )
    pnl = w.filter(
        (F.col("side") == 1)
        & F.col("fwd_c").isNotNull()
        & (F.col("fwd_c") != F.col("trade_c"))
    ).select("user_id", (F.col("fwd_c") - F.col("trade_c")).alias("p"))
    m = pnl.groupBy(F.col("user_id").alias("pair_key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("p") > 0, 1).otherwise(0)).cast("long").alias("nw"),
        F.sum(F.when(F.col("p") > 0, F.col("p")).otherwise(0))
        .cast("long")
        .alias("sw"),
        F.sum(F.when(F.col("p") < 0, -F.col("p")).otherwise(0))
        .cast("long")
        .alias("sl"),
    )
    return m.filter((F.col("nw") > 0) & (F.col("sl") > 0)).select(
        "pair_key",
        "n",
        "nw",
        "sw",
        "sl",
        (F.col("nw") * (F.col("sw") - F.col("sl"))).alias("kelly_num"),
        (F.col("n") * F.col("sw")).alias("kelly_den"),
        (
            (F.col("nw") * (F.col("sw") - F.col("sl"))).cast("double")
            / (F.col("n") * F.col("sw")).cast("double")
        ).alias("kelly_fraction"),
    )
