"""Market-integrity surveillance: wash-trade detection.

Sibling of quote_stuffing_bursts (message-rate abuse) — this one finds
PRICE-LEVEL self-dealing: the same account on both sides of the market
at the same price within a short window, the classic volume-faking
pattern every venue's surveillance desk screens for (and the reference's
single-account arbitrage loop is structurally one `if` away from
committing: `virginia/core/opportunity_scanner.py:431-500` buys both
sides of correlated books).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

_WASH_WINDOW_US = 3_600_000_000  # 1 hour

_WASH_ORACLE = f"""
WITH f AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) // 500 AS px,
         event_id % 5 + 1 AS qty
  FROM events WHERE event_type IN ('purchase', 'click')
),
b AS (SELECT user_id, ts_us, px, qty FROM f WHERE event_type = 'purchase'),
s AS (SELECT user_id, ts_us, px, qty FROM f WHERE event_type = 'click'),
m AS (
  SELECT b.user_id, b.px,
         CASE WHEN b.qty < s.qty THEN b.qty ELSE s.qty END AS wq
  FROM b JOIN s
    ON b.user_id = s.user_id AND b.px = s.px
   AND ABS(b.ts_us - s.ts_us) <= {_WASH_WINDOW_US}
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_wash_pairs,
       CAST(SUM(wq) AS BIGINT) AS washed_qty,
       CAST(COUNT(DISTINCT px) AS BIGINT) AS n_wash_levels
FROM m GROUP BY user_id
"""


@query("wash_trade_detection", oracle=_WASH_ORACLE, tags=("surveillance", "range-join"))
def wash_trade_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WASH-TRADE screen: (buy, sell) fill pairs by the SAME account at
    the SAME PRICE LEVEL (5-dollar tick, cents div 500) within one hour — per account, the pair count, the
    washed quantity (min of the two legs per pair), and how many
    distinct price levels were involved (few levels + symmetric legs = the
    wash signature). A genuine market maker shows
    many prices and skewed leg sizes; a wash account shows few prices
    and symmetric legs — the columns expose exactly that distinction.

    Plan: the |Δt| ≤ 1h predicate is restated as the engine's standard
    binned equi-join — buys explode to their hour bin ±1 (3 rows),
    sells keep their single bin, so the join key (account, price, bin)
    is pure equality (BroadcastHashJoin/SMJ territory) and each
    qualifying pair matches in EXACTLY ONE bin (the sell's own), no
    dedup pass. At 100 TB candidates are bounded by same-account×
    same-price×same-hour co-residency — the surveillance selectivity
    itself — never an account-wide pair product. The oracle states the
    identical semantics as a plain inequality join (IEJoin)."""
    ev = load_table(spark, sf_dir, "events")
    fills = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        F.expr("cast(round(value * 100) as bigint) div 500").alias("px"),
        (F.col("event_id") % 5 + 1).alias("qty"),
    )
    b = fills.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "px",
        F.col("ts_us").alias("b_ts"),
        F.col("qty").alias("b_qty"),
        F.explode(
            F.sequence(
                F.expr(f"ts_us div {_WASH_WINDOW_US} - 1"),
                F.expr(f"ts_us div {_WASH_WINDOW_US} + 1"),
            )
        ).alias("bin"),
    )
    s = fills.filter(F.col("event_type") == "click").select(
        "user_id",
        "px",
        F.col("ts_us").alias("s_ts"),
        F.col("qty").alias("s_qty"),
        F.expr(f"ts_us div {_WASH_WINDOW_US}").alias("bin"),
    )
    return (
        b.join(s, ["user_id", "px", "bin"])
        .filter(F.abs(F.col("b_ts") - F.col("s_ts")) <= _WASH_WINDOW_US)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_wash_pairs"),
            F.sum(F.least("b_qty", "s_qty")).cast("long").alias("washed_qty"),
            F.countDistinct("px").cast("long").alias("n_wash_levels"),
        )
    )


# ---------------------------------------------------------------------------
# Order-to-trade ratio (MiFID II RTS 9-style message-abuse metric)
# ---------------------------------------------------------------------------
_OTR_ORACLE = """
WITH m AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_trade
  FROM events
)
SELECT user_id,
       CAST(day AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_messages,
       CAST(SUM(is_trade) AS BIGINT) AS n_trades,
       CASE WHEN SUM(is_trade) > 0
            THEN CAST(COUNT(*) AS DOUBLE) / SUM(is_trade) END AS otr,
       (SUM(is_trade) = 0 OR COUNT(*) > 50 * SUM(is_trade)) AS flagged
FROM m GROUP BY user_id, day
"""


@query("order_to_trade_ratio", oracle=_OTR_ORACLE, tags=("surveillance", "A3"))
def order_to_trade_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-TO-TRADE ratio per account-day — the MiFID II RTS 9
    message-abuse metric venues enforce: total messages (every event is
    an order action on this tape) over executed trades (purchases). An
    account sending hundreds of messages per fill is quoting noise, not
    liquidity — flagged when OTR > 50 or the account traded nothing at
    all while messaging. Completes the surveillance triptych:
    quote_stuffing_bursts (rate abuse), wash_trade_detection
    (self-dealing), order_to_trade_ratio (message economics).

    Exactness: counts int64; otr is one declared IEEE divide, NULL
    (not ∞) for zero-trade days. Plan: ONE map-combined hash aggregate
    over the tape — no window, no join, account-day-sized output."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "user_id",
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_trade"),
    )
    g = m.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_messages"),
        F.sum("is_trade").cast("long").alias("n_trades"),
    )
    return g.select(
        "user_id",
        F.col("day").cast("long").alias("day"),
        "n_messages",
        "n_trades",
        F.when(
            F.col("n_trades") > 0,
            F.col("n_messages").cast("double") / F.col("n_trades"),
        ).alias("otr"),
        (
            (F.col("n_trades") == 0)
            | (F.col("n_messages") > 50 * F.col("n_trades"))
        ).alias("flagged"),
    )
