"""Position accounting and multi-outcome book economics.

Two operators the reference's trading stack implies but never computes in
SQL-shaped form:

- ``fifo_realized_pnl`` — FIFO lot matching (the cost-basis engine every
  fills ledger needs): the j-th unit sold consumes the j-th unit bought,
  so matching two fills is an INTERVAL INTERSECTION on each side's
  cumulative-quantity axis. That restatement turns an inherently
  sequential queue walk into pure relational algebra — distributable,
  and exact in int64 cents.
- ``implied_overround_book`` — the bookmaker margin per multi-outcome
  market (sum of latest best asks vs the fixed payout): the Dutch-book
  detector that generalizes the reference's two-venue YES/NO margin scan
  (`virginia/core/opportunity_scanner.py:431-500`) to whole outcome sets.

Both run off the events tape with the engine's standard reinterpretation
(user_id = account/market key, value cents = price).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

# FIFO bucketing: cumulative-quantity axis is binned so overlapping lot
# intervals meet in an equi-join (BroadcastHashJoin/SMJ territory) instead
# of the BNLJ a raw inequality join would plan. Lots here are <= 5 units,
# so a 32-unit bin keeps the explode factor ~1.1 rows per lot.
_FIFO_BIN = 32

_FIFO_ORACLE = """
WITH f AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 'B' ELSE 'S' END AS side,
         CAST(round(value * 100) AS BIGINT) AS px,
         event_id % 5 + 1 AS qty,
         SUM(event_id % 5 + 1) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id
           ROWS UNBOUNDED PRECEDING) AS hi
  FROM events WHERE event_type IN ('purchase', 'click')
),
iv AS (SELECT user_id, side, px, qty, hi - qty AS lo, hi FROM f),
m AS (
  SELECT b.user_id,
         SUM(LEAST(b.hi, s.hi) - GREATEST(b.lo, s.lo)) AS matched_qty,
         SUM((LEAST(b.hi, s.hi) - GREATEST(b.lo, s.lo)) * (s.px - b.px)) AS pnl
  FROM iv b JOIN iv s
    ON b.user_id = s.user_id AND b.side = 'B' AND s.side = 'S'
   AND b.lo < s.hi AND s.lo < b.hi
  GROUP BY b.user_id
),
t AS (
  SELECT user_id,
         SUM(CASE WHEN side = 'B' THEN qty ELSE 0 END) AS bought,
         SUM(CASE WHEN side = 'S' THEN qty ELSE 0 END) AS sold
  FROM iv GROUP BY user_id
)
SELECT t.user_id,
       CAST(t.bought AS BIGINT) AS bought_qty,
       CAST(t.sold AS BIGINT) AS sold_qty,
       CAST(COALESCE(m.matched_qty, 0) AS BIGINT) AS matched_qty,
       CAST(COALESCE(m.pnl, 0) AS BIGINT) AS realized_pnl_cents,
       CAST(t.bought - COALESCE(m.matched_qty, 0) AS BIGINT) AS open_long_qty,
       CAST(t.sold - COALESCE(m.matched_qty, 0) AS BIGINT) AS unmatched_sold_qty
FROM t LEFT JOIN m ON m.user_id = t.user_id
"""


@query("fifo_realized_pnl", oracle=_FIFO_ORACLE, tags=("J4", "range-join", "pnl"))
def fifo_realized_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO realized PnL per account — the cost-basis engine: purchases
    are buy fills, clicks are sell fills (qty = event_id%5+1, price =
    exact cents), and FIFO says the j-th unit sold consumes the j-th
    unit bought. Restated relationally: each fill owns the interval
    [lo, hi) on its side's CUMULATIVE-QUANTITY axis, and a (buy, sell)
    pair matches exactly `overlap = min(hi) - max(lo)` units, paying
    `overlap * (sell_px - buy_px)` cents. The sequential queue walk
    becomes an interval-intersection join — order-independent, exact
    int64, and distributable.

    Declared semantics: DIRECTION-NEUTRAL ordinal FIFO — the j-th unit
    sold matches the j-th unit bought regardless of which side arrived
    first. This equals the classic time-ordered long-FIFO queue walk
    whenever inventory never goes negative (the no-short precondition
    every long-only ledger satisfies; pinned by
    tests/test_session4_props.py), and degrades gracefully to FIFO
    short-covering otherwise — unmatched_sold_qty reports the residual
    short leg either way.

    Plan: ONE window pass builds both sides' prefix sums (one
    sort-shuffle on (account, side)); the lot table is localCheckpointed
    once for its three consumers (buy explode, sell explode, totals);
    lots meet in a BUCKETED equi-join on (account, cum-qty bin) — the
    engine's standard range-join restatement (rangejoin.py) — with the
    owner-bucket rule (pair counted only in the bin holding
    greatest(lo_b, lo_s)) deduplicating multi-bin pairs without a
    distinct. At 100 TB: overlap pairs per account are O(fills) not
    O(fills²) because FIFO intervals are disjoint within a side — each
    buy lot overlaps at most (its span / min lot) sell lots — and the
    bin join never materializes non-overlapping candidates beyond bin
    co-residents. Oracle states the identical semantics as a plain
    inequality join (DuckDB IEJoin).

    Reference parity: fills ledger semantics per
    `/root/reference/database/postgres/schema.sql` ticket fills;
    the reference updates positions imperatively, never computes basis.
    """
    ev = load_table(spark, sf_dir, "events")
    fills = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        F.when(F.col("event_type") == "purchase", F.lit("B"))
        .otherwise(F.lit("S"))
        .alias("side"),
        F.expr("cast(round(value * 100) as bigint)").alias("px"),
        (F.col("event_id") % 5 + 1).alias("qty"),
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id", "side")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lots = (
        fills.select(
            "user_id",
            "side",
            "px",
            "qty",
            F.sum("qty").over(w).alias("hi"),
        )
        .withColumn("lo", F.col("hi") - F.col("qty"))
        .localCheckpoint()
    )

    def binned(side: str, prefix: str) -> DataFrame:
        return (
            lots.filter(F.col("side") == side)
            .select(
                "user_id",
                F.col("px").alias(f"{prefix}_px"),
                F.col("lo").alias(f"{prefix}_lo"),
                F.col("hi").alias(f"{prefix}_hi"),
            )
            .withColumn(
                "bin",
                F.explode(
                    F.sequence(
                        F.expr(f"{prefix}_lo div {_FIFO_BIN}"),
                        F.expr(f"({prefix}_hi - 1) div {_FIFO_BIN}"),
                    )
                ),
            )
        )

    buys, sells = binned("B", "b"), binned("S", "s")
    ov = F.least("b_hi", "s_hi") - F.greatest("b_lo", "s_lo")
    matched = (
        buys.join(sells, ["user_id", "bin"])
        .filter(
            (F.col("b_lo") < F.col("s_hi"))
            & (F.col("s_lo") < F.col("b_hi"))
            # owner-bucket rule: each overlapping pair is counted once, in
            # the bin containing the overlap's first unit
            & (F.col("bin") == F.floor(F.greatest("b_lo", "s_lo") / _FIFO_BIN))
        )
        .groupBy("user_id")
        .agg(
            F.sum(ov).alias("matched_qty"),
            F.sum(ov * (F.col("s_px") - F.col("b_px"))).alias("pnl"),
        )
    )
    totals = lots.groupBy("user_id").agg(
        F.sum(F.when(F.col("side") == "B", F.col("qty")).otherwise(0)).alias("bought"),
        F.sum(F.when(F.col("side") == "S", F.col("qty")).otherwise(0)).alias("sold"),
    )
    j = totals.join(matched, "user_id", "left")
    mq = F.coalesce("matched_qty", F.lit(0))
    return j.select(
        "user_id",
        F.col("bought").cast("long").alias("bought_qty"),
        F.col("sold").cast("long").alias("sold_qty"),
        mq.cast("long").alias("matched_qty"),
        F.coalesce("pnl", F.lit(0)).cast("long").alias("realized_pnl_cents"),
        (F.col("bought") - mq).cast("long").alias("open_long_qty"),
        (F.col("sold") - mq).cast("long").alias("unmatched_sold_qty"),
    )


# Fixed winner payout for the synthetic outcome markets: one outcome pays
# 50000 cents; a complete book whose asks sum below that is a Dutch book.
_PAYOUT_CENTS = 50_000
_N_OUTCOMES = 5
_OUTCOMES = ("click", "error", "purchase", "signup", "view")

_OVERROUND_ORACLE = f"""
WITH q AS (
  SELECT user_id AS market_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS ask,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
),
latest AS (SELECT market_id, event_type, ask FROM q WHERE rn = 1)
SELECT market_id,
       CAST(COUNT(*) AS BIGINT) AS n_outcomes,
       CAST(SUM(ask) AS BIGINT) AS sum_ask_cents,
       MIN(ask) AS min_ask_cents,
       MAX(ask) AS max_ask_cents,
       COUNT(*) = {_N_OUTCOMES} AS is_complete,
       (COUNT(*) = {_N_OUTCOMES} AND SUM(ask) < {_PAYOUT_CENTS}) AS is_dutch_book,
       CAST(CASE WHEN COUNT(*) = {_N_OUTCOMES} AND SUM(ask) < {_PAYOUT_CENTS}
                 THEN {_PAYOUT_CENTS} - SUM(ask) ELSE 0 END AS BIGINT)
         AS guaranteed_profit_cents
FROM latest GROUP BY market_id
"""


@query(
    "implied_overround_book",
    oracle=_OVERROUND_ORACLE,
    tags=("J1", "A7", "arbitrage"),
)
def implied_overround_book(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implied OVERROUND per multi-outcome market — the bookmaker-margin
    scan: each market (user_id) quotes one ask per outcome (event_type);
    buying every outcome at its LATEST ask costs sum_ask_cents and pays
    exactly one winner payout, so a complete book summing under the
    payout is a DUTCH BOOK with risk-free profit payout − sum. This
    generalizes the reference's two-venue YES/NO margin check
    (`virginia/core/opportunity_scanner.py:431-500`) to whole outcome
    sets — the scan a prediction-market arb desk runs across every
    categorical market, not just binary pairs.

    Plan: ONE scan, ONE shuffle — all five outcomes' latest asks come
    from outcome-conditional max_by in a single per-market aggregation
    (the arbitrage_scan trick: the ordering key is null for other
    outcomes' rows, which max_by ignores), so no per-outcome window
    pass and no (market, outcome)→(market) second exchange. Map-side
    partial aggregation applies; at 100 TB this is a single
    hash-aggregate over the tape. Ties broken by (ts, event_id) —
    event_id unique. All cents int64.
    """
    ev = load_table(spark, sf_dir, "events")
    ask = F.expr("cast(round(value * 100) as bigint)")
    order_key = F.struct(
        F.expr("ts div 1000").alias("ts_us"), F.col("event_id").alias("event_id")
    )
    aggs = [
        F.max_by(
            F.when(F.col("event_type") == t, ask),
            F.when(F.col("event_type") == t, order_key),
        ).alias(f"ask_{t}")
        for t in _OUTCOMES
    ]
    latest = ev.groupBy(F.col("user_id").alias("market_id")).agg(*aggs)
    asks = F.array(*[F.col(f"ask_{t}") for t in _OUTCOMES])
    present = F.filter(asks, lambda a: a.isNotNull())
    n = F.size(present).cast("long")
    total = F.aggregate(
        present, F.lit(0).cast("long"), lambda acc, a: acc + a
    )
    complete = n == _N_OUTCOMES
    dutch = complete & (total < _PAYOUT_CENTS)
    return latest.select(
        "market_id",
        n.alias("n_outcomes"),
        total.alias("sum_ask_cents"),
        F.array_min(present).alias("min_ask_cents"),
        F.array_max(present).alias("max_ask_cents"),
        complete.alias("is_complete"),
        dutch.alias("is_dutch_book"),
        F.when(dutch, F.lit(_PAYOUT_CENTS) - total)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("guaranteed_profit_cents"),
    )


# ---------------------------------------------------------------------------
# Event-sourced order-book depth rebuild
# ---------------------------------------------------------------------------
_TICK_CENTS = 1_000

_DEPTH_ORACLE = f"""
WITH d AS (
  SELECT user_id AS market_id,
         CASE WHEN event_id % 2 = 0 THEN 'bid' ELSE 'ask' END AS side,
         CAST(round(value * 100) AS BIGINT) // {_TICK_CENTS} AS level,
         CASE WHEN event_type IN ('view', 'click', 'signup')
              THEN event_id % 7 + 1 ELSE -(event_id % 7 + 1) END AS delta
  FROM events
),
lvl AS (
  SELECT market_id, side, level, CAST(SUM(delta) AS BIGINT) AS net
  FROM d GROUP BY 1, 2, 3
)
SELECT market_id,
       MAX(CASE WHEN side = 'bid' AND net > 0 THEN level END) AS best_bid_level,
       MIN(CASE WHEN side = 'ask' AND net > 0 THEN level END) AS best_ask_level,
       MIN(CASE WHEN side = 'ask' AND net > 0 THEN level END)
         - MAX(CASE WHEN side = 'bid' AND net > 0 THEN level END)
         AS spread_levels,
       CAST(SUM(CASE WHEN side = 'bid' AND net > 0 THEN net ELSE 0 END)
            AS BIGINT) AS bid_depth,
       CAST(SUM(CASE WHEN side = 'ask' AND net > 0 THEN net ELSE 0 END)
            AS BIGINT) AS ask_depth,
       CAST(SUM(CASE WHEN net < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overcancelled_levels
FROM lvl GROUP BY market_id
"""


@query("book_depth_rebuild", oracle=_DEPTH_ORACLE, tags=("P3", "P4", "event-sourcing"))
def book_depth_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-SOURCED order-book reconstruction — the book builder that
    turns a delta feed (adds and cancels per price level) back into
    resting state, the job the reference's websocket consumers do
    imperatively per message (`virginia/api/data_feed.py:352-398`
    maintains live books from deltas). Tape reinterpretation: market =
    user_id, side = event_id parity, price level = cents div 1000;
    view/click/signup add liquidity (+qty), error/purchase cancel
    (−qty), qty = event_id%7+1. Rebuilt per market: best bid (highest
    positive-depth bid level), best ask (lowest positive-depth ask
    level), spread in levels, total resting depth per side, and the
    over-cancelled-level count (net < 0 — the feed-integrity signal a
    real book builder alerts on).

    Plan: deltas NEVER sort — one map-combined hash aggregate to
    (market, side, level) nets (the only tape-sized exchange), then a
    market rollup over the book-sized level table (second, tiny
    exchange). Because sum is commutative the rebuild is
    order-independent, so no per-message sequencing state is needed —
    the whole point of restating the imperative book walk as
    aggregation. At 100 TB: replace the final-state groupBy with the
    same nets keyed by (market, side, level, hour) and the identical
    rollup gives you the book AT EVERY HOUR for the cost of one more
    grouping column."""
    ev = load_table(spark, sf_dir, "events")
    qty = F.col("event_id") % 7 + 1
    lvl = (
        ev.select(
            F.col("user_id").alias("market_id"),
            F.when(F.col("event_id") % 2 == 0, F.lit("bid"))
            .otherwise(F.lit("ask"))
            .alias("side"),
            F.expr(f"cast(round(value * 100) as bigint) div {_TICK_CENTS}").alias(
                "level"
            ),
            F.when(
                F.col("event_type").isin("view", "click", "signup"), qty
            )
            .otherwise(-qty)
            .alias("delta"),
        )
        .groupBy("market_id", "side", "level")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    bid_live = (F.col("side") == "bid") & (F.col("net") > 0)
    ask_live = (F.col("side") == "ask") & (F.col("net") > 0)
    best_bid = F.max(F.when(bid_live, F.col("level")))
    best_ask = F.min(F.when(ask_live, F.col("level")))
    return lvl.groupBy("market_id").agg(
        best_bid.alias("best_bid_level"),
        best_ask.alias("best_ask_level"),
        (best_ask - best_bid).alias("spread_levels"),
        F.sum(F.when(bid_live, F.col("net")).otherwise(0))
        .cast("long")
        .alias("bid_depth"),
        F.sum(F.when(ask_live, F.col("net")).otherwise(0))
        .cast("long")
        .alias("ask_depth"),
        F.sum(F.when(F.col("net") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_overcancelled_levels"),
    )


# ---------------------------------------------------------------------------
# Implementation shortfall (Perold) per account-hour
# ---------------------------------------------------------------------------
_SHORTFALL_ORACLE = """
WITH q AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS px,
         event_id % 5 + 1 AS qty,
         epoch_us(ts) // 3600000000 AS hr
  FROM events WHERE event_type IN ('view', 'purchase')
),
a AS (
  SELECT user_id, hr,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN qty ELSE 0 END)
              AS BIGINT) AS fill_qty,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN px * qty ELSE 0 END)
              AS BIGINT) AS fill_cost,
         MIN(CASE WHEN event_type = 'view'
                  THEN {'ts_us': ts_us, 'event_id': event_id, 'px': px}
             END).px AS arrival_px
  FROM q GROUP BY user_id, hr
)
SELECT user_id,
       CAST(hr AS BIGINT) AS hr,
       fill_qty, fill_cost,
       CAST(arrival_px AS BIGINT) AS arrival_px,
       CAST(fill_cost - arrival_px * fill_qty AS BIGINT) AS shortfall_cents,
       (CAST(fill_cost AS DOUBLE) / fill_qty - arrival_px)
         / arrival_px * 10000 AS shortfall_bp
FROM a
WHERE fill_qty > 0 AND arrival_px IS NOT NULL AND arrival_px > 0
"""


@query("execution_shortfall_hourly", oracle=_SHORTFALL_ORACLE, tags=("pnl", "A2"))
def execution_shortfall_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMPLEMENTATION SHORTFALL (Perold 1988) per account-hour: the
    execution cost nobody sees on a PnL line — fill VWAP versus the
    ARRIVAL price (the first quote of the hour, the decision-time
    benchmark). shortfall_cents = fill cost − arrival×qty is exact
    int64 (positive = paid up); shortfall_bp is the declared two-divide
    IEEE sequence on top. This is the execution-quality twin of
    twap_per_ticker/book_vwap_fill: TWAP benchmarks the MARKET, arrival
    price benchmarks the DECISION.

    Plan: ONE map-combined hash aggregate — fills and the arrival
    argmin reduce in the same (account, hour) pass (the arrival quote
    is a conditional MIN over a (ts, event_id, px) struct, so no window
    and no second scan). Tape-sized exchange only; at 100 TB this is a
    single combine-heavy aggregation."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("px"),
        (F.col("event_id") % 5 + 1).alias("qty"),
        F.expr("(ts div 1000) div 3600000000").alias("hr"),
    )
    is_fill = F.col("event_type") == "purchase"
    is_quote = F.col("event_type") == "view"
    a = q.groupBy("user_id", "hr").agg(
        F.sum(F.when(is_fill, F.col("qty")).otherwise(0))
        .cast("long")
        .alias("fill_qty"),
        F.sum(F.when(is_fill, F.col("px") * F.col("qty")).otherwise(0))
        .cast("long")
        .alias("fill_cost"),
        F.min(
            F.when(
                is_quote,
                F.struct(
                    F.col("ts_us").alias("ts_us"),
                    F.col("event_id").alias("event_id"),
                    F.col("px").alias("px"),
                ),
            )
        )["px"].alias("arrival_px"),
    )
    return a.filter(
        (F.col("fill_qty") > 0)
        & F.col("arrival_px").isNotNull()
        & (F.col("arrival_px") > 0)
    ).select(
        "user_id",
        F.col("hr").cast("long").alias("hr"),
        "fill_qty",
        "fill_cost",
        F.col("arrival_px").cast("long").alias("arrival_px"),
        (F.col("fill_cost") - F.col("arrival_px") * F.col("fill_qty"))
        .cast("long")
        .alias("shortfall_cents"),
        (
            (
                F.col("fill_cost").cast("double") / F.col("fill_qty")
                - F.col("arrival_px")
            )
            / F.col("arrival_px")
            * 10000
        ).alias("shortfall_bp"),
    )
