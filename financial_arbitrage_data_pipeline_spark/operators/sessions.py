"""Sessionization + exact percentile analytics over the events stream.

Two operators the reference's ops layer implies but never got to declare
relationally:

- `user_sessions` — gap-based sessionization (the batch twin of the
  subscriber-liveness session state in `streaming/liveness.py`, reference
  `virginia/broker/publisher.py:224-320`: a subscriber "session" ends
  after a quiet TTL). Expressed with Spark's native `session_window`
  aggregation — one shuffle on the session key, mergeable across
  partitions, and the exact same operator Structured Streaming would run
  with a watermark at 100 TB.
- `latency_percentiles` — rank-based (nearest-rank) latency percentiles
  per event type (the reference tracks rolling latency means at
  `database/influx/writer.py:591-599`; percentiles are what you actually
  alert on). Exact semantics here so the DuckDB oracle can hash-match;
  the 100 TB path swaps the windowed rank for `approx_percentile`
  (KLL/GK sketch, one pass, mergeable) — same query shape, documented
  trade-off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

SESSION_GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000


@query(
    "user_sessions",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > {_GAP_US}
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts_us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_last_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s
GROUP BY user_id, sid
""",
    tags=("sessionization", "A6", "T7"),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user: events closer than 30 minutes chain
    into one session; a gap >= 30 min starts a new one. Spark's
    `session_window` is the native operator — sessions are merged
    map-side per partition and across the single shuffle on
    (user_id, overlapping-window), so the plan scales like any other
    keyed aggregation (no windowed sort over the whole stream). The
    oracle states the same semantics as the classic gaps-and-islands
    SQL (LAG → boundary flags → running-sum session ids).

    Boundary parity (verified by test_session_window_exact_gap_splits):
    Spark merges TOUCHING windows — an event exactly `gap` after the
    previous one still chains; only a strictly larger gap splits. The
    oracle's boundary flag is therefore `diff > gap`, not `>=`.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", F.expr("ts div 1000").alias("ts_us"))
    return (
        e.groupBy(
            "user_id",
            F.session_window(F.timestamp_micros(F.col("ts_us")), SESSION_GAP).alias("w"),
        )
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_last_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_last_us", "n_events")
    )


@query(
    "latency_percentiles",
    oracle="""
WITH v AS (
  SELECT event_type,
         (event_id % 500 + 1) * 1000 + user_id AS v,
         event_id
  FROM events
),
r AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
)
SELECT event_type,
       MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN v END) AS p50_us,
       MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN v END) AS p95_us,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN v END) AS p99_us,
       CAST(MAX(n) AS BIGINT) AS n
FROM r
GROUP BY event_type
""",
    tags=("A8", "percentiles"),
)
def latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-rank p50/p95/p99 of the per-event API latency (derived
    from events exactly as `timing_chain_stats` derives its chain) per
    event type. Exact semantics — rank = ceil(q*n) over a (value,
    event_id)-ordered per-group sort — so the oracle hash-matches; both
    engines evaluate the identical `ceil(q * n)` double expression, so
    the boundary rank agrees bit-for-bit.

    Scale note: the exact form pays one sort per group (fine when groups
    are few and fit a partition's spill budget). At 100 TB the same
    query swaps the window for `approx_percentile(v, [.5,.95,.99])` —
    a one-pass mergeable sketch with no sort; the exact variant stays as
    the correctness anchor at test SF.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (F.col("event_id") % 500 + 1) * 1000 + F.col("user_id")
    base = ev.select("event_type", v.alias("v"), "event_id")
    wo = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "v",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(q: float) -> Column:
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"), F.col("v"))
        )

    return ranked.groupBy("event_type").agg(
        at(0.50).alias("p50_us"),
        at(0.95).alias("p95_us"),
        at(0.99).alias("p99_us"),
        F.max("n").alias("n"),
    )


_APPROX_ACC = 1000  # percentile_approx accuracy → rank error ≤ n/_APPROX_ACC


@query(
    "latency_percentiles_approx",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       true AS p50_ok, true AS p95_ok, true AS p99_ok
FROM events GROUP BY event_type
""",
    tags=("A8", "percentiles", "approx"),
)
def latency_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path under a tolerance-banded oracle:
    `percentile_approx` (GK sketch — one pass, mergeable, NO per-group
    sort) with its rank guarantee VERIFIED inside the query. For each
    quantile q the sketch guarantees the returned value v has some rank
    within n/accuracy of q·n, for every partial-merge order — so the
    banded booleans are deterministic even though the approx value
    itself may wobble between plans. The check computes v's true rank
    interval [count(<v)+1, count(<=v)] with a second aggregate and tests
    intersection with [q·n − eps, q·n + eps], eps = n/accuracy + 1.
    The oracle states the contract: every group passes every band.

    (The validation pass re-scans the input; production runs only the
    sketch pass — the validation IS the correctness harness, kept here
    so the driver hash-gates the approx tier instead of trusting it.)"""
    ev = load_table(spark, sf_dir, "events")
    v = (F.col("event_id") % 500 + 1) * 1000 + F.col("user_id")
    base = ev.select("event_type", v.alias("v"))
    sk = base.groupBy("event_type").agg(
        F.percentile_approx("v", [0.5, 0.95, 0.99], _APPROX_ACC).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    j = base.join(F.broadcast(sk), "event_type")

    def ok(i: int, q: float) -> Column:
        lo = F.sum(F.when(F.col("v") < F.element_at(F.col("ap"), i + 1), 1).otherwise(0))
        hi = F.sum(F.when(F.col("v") <= F.element_at(F.col("ap"), i + 1), 1).otherwise(0))
        n = F.first("n")
        eps = n / F.lit(_APPROX_ACC) + 1
        target = F.lit(q) * n
        return ((hi >= target - eps) & (lo + 1 <= target + eps)).alias(f"p{int(q*100)}_ok")

    return j.groupBy("event_type").agg(
        F.first("n").alias("n"),
        ok(0, 0.50),
        ok(1, 0.95),
        ok(2, 0.99),
    )


# ---------------------------------------------------------------------------
# Conversion funnel within sessions (ordered-sequence detection)
# ---------------------------------------------------------------------------
@query(
    "session_funnel",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > {_GAP_US}
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, event_type, ts_us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
),
f AS (
  SELECT user_id, sid,
         MIN(ts_us) AS session_start_us,
         MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS view_ts_us,
         MIN(CASE WHEN event_type = 'click' THEN ts_us END) AS click_ts_us,
         MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) AS purchase_ts_us
  FROM s GROUP BY user_id, sid
)
SELECT user_id, session_start_us, view_ts_us, click_ts_us, purchase_ts_us,
       (view_ts_us IS NOT NULL AND click_ts_us IS NOT NULL
        AND purchase_ts_us IS NOT NULL
        AND view_ts_us <= click_ts_us AND click_ts_us <= purchase_ts_us)
         AS converted
FROM f
""",
    tags=("sessionization", "funnel"),
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View → click → purchase conversion detection per session: the
    first timestamp of each funnel stage inside the session, and whether
    the stages occurred in order — the product-analytics query behind
    every conversion dashboard, and a distinct pattern from plain
    sessionization (ordered-sequence detection folds into conditional
    MINs, no per-session sort or UDF). Same single session_window
    shuffle as user_sessions; the oracle replays gaps-and-islands with
    the identical touching-windows boundary rule (`> gap` splits)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type", F.expr("ts div 1000").alias("ts_us"))

    def stage(t: str) -> Column:
        return F.min(F.when(F.col("event_type") == t, F.col("ts_us")))

    f = (
        e.groupBy(
            "user_id",
            F.session_window(F.timestamp_micros(F.col("ts_us")), SESSION_GAP).alias("w"),
        )
        .agg(
            F.min("ts_us").alias("session_start_us"),
            stage("view").alias("view_ts_us"),
            stage("click").alias("click_ts_us"),
            stage("purchase").alias("purchase_ts_us"),
        )
    )
    converted = (
        F.col("view_ts_us").isNotNull()
        & F.col("click_ts_us").isNotNull()
        & F.col("purchase_ts_us").isNotNull()
        & (F.col("view_ts_us") <= F.col("click_ts_us"))
        & (F.col("click_ts_us") <= F.col("purchase_ts_us"))
    )
    return f.select(
        "user_id",
        "session_start_us",
        "view_ts_us",
        "click_ts_us",
        "purchase_ts_us",
        converted.alias("converted"),
    )


# ---------------------------------------------------------------------------
# Sequence-pattern matching (MATCH_RECOGNIZE shape): purchase preceded by
# a fresh click with NO error in between
# ---------------------------------------------------------------------------
_PATTERN_WINDOW_US = 30 * 60 * 1_000_000  # click must be <= 30 min old


@query(
    "purchase_pattern_match",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
w AS (
  SELECT event_id, user_id, event_type, ts_us,
         MAX(CASE WHEN event_type = 'click' THEN ts_us END)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_click_us,
         MAX(CASE WHEN event_type = 'error' THEN ts_us END)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_error_us
  FROM e
)
SELECT event_id, user_id, ts_us AS purchase_ts_us, prev_click_us,
       prev_click_us IS NOT NULL
         AND ts_us - prev_click_us <= {_PATTERN_WINDOW_US}
         AND (prev_error_us IS NULL OR prev_error_us < prev_click_us)
         AS matched
FROM w WHERE event_type = 'purchase'
""",
    tags=("pattern-match", "W3", "sessionization"),
)
def purchase_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-PATTERN detection (the MATCH_RECOGNIZE shape no Spark
    builtin provides): for every purchase, did a click happen within 30
    minutes before it with NO error event in between? The stricter
    sibling of `session_funnel`'s ordered-MIN detection — "A then B
    with no C between" needs the LAST preceding A and the LAST
    preceding C, which two running conditional-MAX windows over one
    (user, time, id)-ordered frame provide; the id tie-break makes peer
    order total, so the ROWS frame is deterministic in both engines.
    Plan: ONE sort-shuffle on user_id serves both windows and the
    purchase filter — at 100 TB this is the minimum for any per-user
    sequence semantics, and the state is two longs per user, not an
    automaton."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts_us"))
    ).over(w)
    prev_error = F.max(
        F.when(F.col("event_type") == "error", F.col("ts_us"))
    ).over(w)
    matched = (
        prev_click.isNotNull()
        & (F.col("ts_us") - prev_click <= _PATTERN_WINDOW_US)
        & (prev_error.isNull() | (prev_error < prev_click))
    )
    return (
        e.withColumn("prev_click_us", prev_click)
        .withColumn("matched_raw", matched)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            "prev_click_us",
            F.coalesce(F.col("matched_raw"), F.lit(False)).alias("matched"),
        )
    )


# ---------------------------------------------------------------------------
# Session-gap survival analysis: the life table BEHIND the 30-min timeout
# ---------------------------------------------------------------------------
_LT_BIN_MIN = 5  # 5-minute hazard bins
_LT_CENSOR_BIN = 48  # gaps >= 240 min are right-censored


@query(
    "session_gap_life_table",
    oracle=f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
),
g AS (
  SELECT (ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id))
           // 60000000 AS gap_min
  FROM c
),
b AS (
  SELECT CASE WHEN gap_min // {_LT_BIN_MIN} >= {_LT_CENSOR_BIN}
              THEN {_LT_CENSOR_BIN}
              ELSE gap_min // {_LT_BIN_MIN} END AS bin,
         (gap_min // {_LT_BIN_MIN} >= {_LT_CENSOR_BIN}) AS censored
  FROM g WHERE gap_min IS NOT NULL
),
lt AS (
  SELECT bin,
         CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM b GROUP BY bin
),
risk AS (
  SELECT bin, d, c,
         CAST(SUM(d + c) OVER (ORDER BY bin DESC) AS BIGINT) AS n_at_risk
  FROM lt
)
SELECT bin * {_LT_BIN_MIN} AS t_minutes, n_at_risk, d AS n_resumed,
       c AS n_censored,
       CAST(d * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
FROM risk
""",
    tags=("A2", "sessions", "survival"),
)
def session_gap_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVAL ANALYSIS of user inactivity: the life table of
    inter-event gaps in {_LT_BIN_MIN}-minute hazard bins — n_at_risk
    (gaps that reached t), n_resumed (activity resumed in [t, t+bin)),
    and the discrete hazard d/n. Gaps past {_LT_BIN_MIN * _LT_CENSOR_BIN}
    minutes are right-censored (they count in every earlier risk set
    but are never events — the Kaplan-Meier censoring rule). This is
    the measurement that JUSTIFIES `user_sessions`' 30-minute timeout:
    the right timeout is where the hazard has decayed — below it you
    split live sessions, above it you merge distinct ones. The
    reference hardcodes its liveness TTL
    (`virginia/broker/publisher.py:224-320`); this derives it from
    data.

    Exactness: gaps, bins, and counts are exact int64; hazard_ppm is a
    non-negative integer floor divide. Plan: ONE user-keyed
    sort-shuffle for the LAG pass, a map-combined bin rollup, and the
    suffix-sum risk window on the ≤{_LT_CENSOR_BIN + 1}-row life table
    (bounded — a single-partition window over 49 rows, not data)."""
    c = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = c.select(
        (
            (F.col("ts_us") - F.lag("ts_us").over(w)) / F.lit(1)
        ).cast("long").alias("gap_us"),
    ).select(F.expr("gap_us div 60000000").alias("gap_min")).filter(
        F.col("gap_min").isNotNull()
    )
    raw_bin = F.expr(f"gap_min div {_LT_BIN_MIN}")
    b = g.select(
        F.when(raw_bin >= _LT_CENSOR_BIN, F.lit(_LT_CENSOR_BIN))
        .otherwise(raw_bin)
        .alias("bin"),
        (raw_bin >= _LT_CENSOR_BIN).alias("censored"),
    )
    lt = b.groupBy("bin").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1))
        .cast("long")
        .alias("d"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    w_risk = (
        Window.partitionBy()
        .orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = lt.select(
        "bin",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(w_risk).alias("n_at_risk"),
    )
    return risk.select(
        (F.col("bin") * _LT_BIN_MIN).alias("t_minutes"),
        "n_at_risk",
        F.col("d").alias("n_resumed"),
        F.col("c").alias("n_censored"),
        F.expr("d * 1000000 div n_at_risk").alias("hazard_ppm"),
    )
