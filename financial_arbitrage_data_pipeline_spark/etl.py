"""The user-facing analytical ETL API — SURVEY §3.4, the reference's
`etl/query.py` surface re-expressed as DataFrame pipelines.

Reference signatures being reproduced:

- `get_available_tickers(source)` (`etl/query.py:22-75`): distinct
  (ticker, source) pairs in the snapshot store.
- `get_ticker_data(ticker, exchange, start_date, end_date, start_hours,
  end_hours, period)` (`etl/query.py:78-263`): time-range scan of one
  ticker's snapshots → JSON book parse → venue-specific yes/no price
  normalization (Kalshi: best yes level /100, no = 1-yes,
  `etl/query.py:186-202`; Polymarket: bid/ask midpoints with the
  direction swap at yes_mid > 0.5, `etl/query.py:204-238`) → optional
  tumbling-window last-value downsample (`aggregateWindow`,
  `etl/query.py:146-157`) → time sort → pandas result indexed by
  timestamp tz-converted to America/Chicago (`etl/query.py:107,178`).

The engine form: `ticker_data()` returns the DataFrame (composable,
collect-free); `get_ticker_data()` is the thin pandas-presentation
wrapper matching the reference's return type. Filters land on the
snapshot scan (partition pruning on source/ticker when the table is
partitioned as ingest.start_storage_lane writes it).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import orderbook as ob
from .sources.tables import load_table

CHICAGO = "America/Chicago"


# ---------------------------------------------------------------------------
# Deterministic market_snapshot fixture (testdata carries no book blobs)
# ---------------------------------------------------------------------------


def build_snapshot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → market_snapshot rows with venue-native JSON book blobs:
    Kalshi rows carry `{"yes": [[cents,qty],...], "no": [...]}`
    (`database/models/influx.py:330`), Polymarket rows carry
    `{"orderbook": {"bids": [{"price","size"},...], "asks": [...]}}`
    (`ireland/api/data_feed.py:29-56`). Book levels are pure functions of
    (value, event_id) so the DuckDB oracle can state the expected output
    without JSON."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    q1 = (F.col("event_id") % 50 + 1).cast("long")
    q2 = (F.col("event_id") % 31 + 1).cast("long")
    y1, y2 = cents % 97 + 1, cents % 89 + 1
    n1, n2 = cents % 83 + 1, cents % 79 + 1

    kalshi_book = F.to_json(
        F.struct(
            F.array(F.array(y1, q1), F.array(y2, q2)).alias("yes"),
            F.array(F.array(n1, q1), F.array(n2, q2)).alias("no"),
        )
    )
    level = lambda p, s: F.struct(  # noqa: E731
        (p.cast("double") / 100.0).alias("price"), s.cast("double").alias("size")
    )
    # the venue API delivers books best-first (`ireland/api/data_feed.py:81`
    # — the `bids[0]` contract): bids price-desc, asks price-asc
    poly_book = F.to_json(
        F.struct(
            F.struct(
                F.reverse(F.sort_array(F.array(level(y1, q1), level(y2, q2)))).alias("bids"),
                F.sort_array(F.array(level(n1 + 1, q1), level(n2 + 3, q2))).alias("asks"),
            ).alias("orderbook")
        )
    )
    is_kalshi = F.col("user_id") % 2 == 0
    return ev.select(
        F.when(is_kalshi, F.lit("kalshi")).otherwise(F.lit("polymarket")).alias("source"),
        F.col("user_id").cast("string").alias("ticker"),
        F.when(is_kalshi, kalshi_book).otherwise(poly_book).alias("full_orderbook"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
    )


# ---------------------------------------------------------------------------
# get_available_tickers (A4)
# ---------------------------------------------------------------------------


def available_tickers(snapshots: DataFrame, source: str | None = None) -> DataFrame:
    """Distinct tickers per source (`etl/query.py:22-75`, Flux
    `unique(column:"ticker")`). On the partitioned snapshot table this is
    metadata-cheap: distinct over the two partition columns."""
    df = snapshots.select("ticker", "source")
    if source is not None:
        df = df.filter(F.col("source") == source)
    return df.distinct()


# ---------------------------------------------------------------------------
# get_ticker_data (§3.4)
# ---------------------------------------------------------------------------


def _normalized_prices(source: str) -> list[Column]:
    """Venue-specific yes/no normalization from the parsed book."""
    if source == "kalshi":
        book = ob.parse_kalshi_book("full_orderbook")
        yes = ob.cents_to_dollars(ob.best_bid_cents(book.getField("yes")))
        return [yes.alias("yes_price"), ob.yes_to_no(yes).alias("no_price")]
    book = ob.parse_polymarket_book("full_orderbook").getField("orderbook")
    bids, asks = book.getField("bids"), book.getField("asks")
    # yes_mid = midpoint of best bid / best ask (P4), no = 1 - yes (P6,
    # `etl/query.py:220`), orientation swap at yes_mid > 0.5 (P7)
    yes_mid = ob.poly_midpoint(bids, asks)
    no_mid = ob.yes_to_no(yes_mid)
    swapped = ob.direction_swap(yes_mid, no_mid)
    return [
        swapped.getField("yes_price").alias("yes_price"),
        swapped.getField("no_price").alias("no_price"),
    ]


def ticker_data(
    snapshots: DataFrame,
    ticker: str,
    exchange: str,
    start_date: datetime | str | None = None,
    end_date: datetime | str | None = None,
    start_hours: int = 0,
    end_hours: int = 0,
    period: str | None = None,
) -> DataFrame:
    """The composable core of get_ticker_data: filter (F3/F4, pushed to
    the scan) → parse+normalize (P3-P7/P11) → optional tumbling-window
    last-value downsample (A6) → time sort (W1). Returns
    (ts, yes_price, no_price)."""
    df = snapshots.filter(
        (F.col("ticker") == ticker) & (F.col("source") == exchange)
    )
    if start_date is not None:
        start = F.lit(start_date).cast("timestamp") + F.expr(
            f"INTERVAL {int(start_hours)} HOURS"
        )
        df = df.filter(F.col("ts") >= start)
    if end_date is not None:
        end = F.lit(end_date).cast("timestamp") + F.expr(f"INTERVAL {int(end_hours)} HOURS")
        df = df.filter(F.col("ts") <= end)

    norm = df.select("ts", *_normalized_prices(exchange))
    if period is not None:
        # aggregateWindow(every: period, fn: last, createEmpty: false)
        ordkey = F.struct(F.col("ts").alias("ts"))
        norm = (
            norm.groupBy(F.window("ts", period).alias("win"))
            .agg(
                F.max_by("yes_price", ordkey).alias("yes_price"),
                F.max_by("no_price", ordkey).alias("no_price"),
            )
            .select(F.col("win.start").alias("ts"), "yes_price", "no_price")
        )
    return norm.orderBy("ts")


def get_ticker_data(
    snapshots: DataFrame,
    ticker: str,
    exchange: str,
    **kwargs,
) -> pd.DataFrame:
    """Reference-shaped result: pandas DataFrame indexed by timestamp in
    America/Chicago (`etl/query.py:178,254-258`). Presentation only —
    analytical composition should use ticker_data()."""
    pdf = ticker_data(snapshots, ticker, exchange, **kwargs).toPandas()
    pdf["timestamp"] = (
        pdf["ts"].dt.tz_localize("UTC").dt.tz_convert(CHICAGO)
    )
    return pdf.drop(columns=["ts"]).set_index("timestamp")


# ---------------------------------------------------------------------------
# get_pair_history — the cross-venue composition users build by hand
# ---------------------------------------------------------------------------


def pair_history(
    spark: SparkSession,
    sf_dir: str,
    pair_key: int,
    period_s: int = 3600,
    start_us: int | None = None,
    end_us: int | None = None,
) -> DataFrame:
    """Cross-venue margin series for ONE pair: per `period_s` bucket, the
    last Kalshi yes-bid and last Polymarket yes within the bucket, and
    margin = (k - p)/p — the series the reference's users assemble from
    two separate `get_ticker_data` pulls plus pandas (`etl/query.py`
    gives them one venue at a time). Same venue-conditional max_by core
    as the `pair_margin_timeline` query, parameterized and pre-filtered
    so the pair predicate and time range push to the scan."""
    from .operators.market import margin_buckets

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") == pair_key)
    ts_us = F.expr("ts div 1000")
    if start_us is not None:
        ev = ev.filter(ts_us >= start_us)
    if end_us is not None:
        ev = ev.filter(ts_us <= end_us)
    return (
        margin_buckets(ev, period_us=period_s * 1_000_000)
        .select("bucket_us", "kalshi_yes_bid", "poly_yes", "margin_yes")
        .orderBy("bucket_us")
    )


def get_pair_history(
    spark: SparkSession, sf_dir: str, pair_key: int, **kwargs
) -> pd.DataFrame:
    """Reference-shaped presentation of pair_history: pandas indexed by
    the bucket timestamp in America/Chicago, like get_ticker_data."""
    pdf = pair_history(spark, sf_dir, pair_key, **kwargs).toPandas()
    ts = pd.to_datetime(pdf["bucket_us"], unit="us", utc=True)
    pdf["timestamp"] = ts.dt.tz_convert(CHICAGO)
    return pdf.drop(columns=["bucket_us"]).set_index("timestamp")
