"""Oracle-checked entry points for the user-facing ETL API (§3.4).

Each builds the deterministic market_snapshot fixture (etl.
build_snapshot_table — venue-native JSON book blobs), then runs the real
API path: scan-pushed filters → from_json → venue normalization →
optional windowed downsample → sort. The oracles restate the expected
numbers directly from events, bypassing JSON — so the whole
serialize/parse/extract pipeline is what's under test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import etl
from ..plans.registry import query

_K_TICKER = "100"  # even user_id → kalshi
_P_TICKER = "101"  # odd user_id → polymarket


@query(
    "etl_available_tickers",
    oracle="""
SELECT DISTINCT CAST(user_id AS VARCHAR) AS ticker,
       CASE WHEN user_id % 2 = 0 THEN 'kalshi' ELSE 'polymarket' END AS source
FROM events
""",
    tags=("A4", "S6"),
)
def etl_available_tickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`get_available_tickers` (`etl/query.py:22-75`): distinct
    (ticker, source) over the snapshot store."""
    return etl.available_tickers(etl.build_snapshot_table(spark, sf_dir))


@query(
    "etl_ticker_data_kalshi",
    oracle="""
WITH snap AS (
  SELECT ts,
         GREATEST(CAST(round(value*100) AS BIGINT) % 97 + 1,
                  CAST(round(value*100) AS BIGINT) % 89 + 1) / 100.0 AS yes_price
  FROM events
  WHERE user_id = 100
    AND ts >= TIMESTAMP '2024-01-05 00:00:00' + INTERVAL 6 HOUR
    AND ts <= TIMESTAMP '2024-01-25 00:00:00' - INTERVAL 6 HOUR
),
bucketed AS (
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win, ts, yes_price,
         ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL 5 MINUTE, ts)
                            ORDER BY ts DESC) AS rn
  FROM snap
)
SELECT win AS ts, yes_price, 1.0 - yes_price AS no_price
FROM bucketed WHERE rn = 1
""",
    tags=("S6", "F3", "F4", "P3", "P5", "P6", "P11", "A6", "W1"),
)
def etl_ticker_data_kalshi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`get_ticker_data(ticker, 'kalshi', start, end, start_hours,
    end_hours, period='5 minutes')` (`etl/query.py:78-263`): time-range +
    hour offsets (F4), ticker/source filters (F3, scan-pushed), JSON book
    parse (P11), best-yes-level/100 with complement (P3/P5/P6),
    5-minute last-value downsample (A6), time sort (W1)."""
    snap = etl.build_snapshot_table(spark, sf_dir)
    return etl.ticker_data(
        snap,
        ticker=_K_TICKER,
        exchange="kalshi",
        start_date="2024-01-05",
        end_date="2024-01-25",
        start_hours=6,
        end_hours=-6,
        period="5 minutes",
    )


@query(
    "etl_ticker_data_poly",
    oracle="""
WITH snap AS (
  SELECT ts,
         (GREATEST((CAST(round(value*100) AS BIGINT) % 97 + 1) / 100.0,
                   (CAST(round(value*100) AS BIGINT) % 89 + 1) / 100.0)
          + LEAST((CAST(round(value*100) AS BIGINT) % 83 + 2) / 100.0,
                  (CAST(round(value*100) AS BIGINT) % 79 + 4) / 100.0)) / 2.0
           AS yes_mid
  FROM events
  WHERE user_id = 101
    AND ts >= TIMESTAMP '2024-01-03 00:00:00'
)
SELECT ts,
       CASE WHEN yes_mid > 0.5 THEN 1.0 - yes_mid ELSE yes_mid END AS yes_price,
       CASE WHEN yes_mid > 0.5 THEN yes_mid ELSE 1.0 - yes_mid END AS no_price
FROM snap
""",
    tags=("S6", "F3", "F4", "P4", "P6", "P7", "P11", "W1"),
)
def etl_ticker_data_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`get_ticker_data(ticker, 'polymarket', start)`: Polymarket branch —
    best-bid/best-ask midpoint (P4), complement (P6), and the strict
    yes_mid > 0.5 orientation swap (P7, the data-dependent branch SURVEY
    risk #5 demands bit-for-bit)."""
    snap = etl.build_snapshot_table(spark, sf_dir)
    return etl.ticker_data(
        snap, ticker=_P_TICKER, exchange="polymarket", start_date="2024-01-03"
    )
