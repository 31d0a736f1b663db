"""Tests for the user-facing ETL API surface (§3.4) — the pandas
presentation layer and argument handling the oracle queries don't cover."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark import etl


def _kalshi_ticker(snap):
    return snap.filter(F.col("source") == "kalshi").select("ticker").first().ticker


def test_get_ticker_data_pandas_shape(spark, sf_dir):
    snap = etl.build_snapshot_table(spark, sf_dir)
    pdf = etl.get_ticker_data(snap, ticker=_kalshi_ticker(snap), exchange="kalshi")
    assert isinstance(pdf, pd.DataFrame)
    assert pdf.index.name == "timestamp"
    assert str(pdf.index.tz) == "America/Chicago"
    assert list(pdf.columns) == ["yes_price", "no_price"]
    assert len(pdf) > 0
    assert pdf.index.is_monotonic_increasing
    # yes/no complement holds on the kalshi branch
    assert ((pdf.yes_price + pdf.no_price - 1.0).abs() < 1e-12).all()


def test_available_tickers_source_filter(spark, sf_dir):
    snap = etl.build_snapshot_table(spark, sf_dir)
    all_t = etl.available_tickers(snap).collect()
    kalshi_t = etl.available_tickers(snap, source="kalshi").collect()
    assert 0 < len(kalshi_t) < len(all_t)
    assert all(r.source == "kalshi" for r in kalshi_t)
    # every kalshi ticker is an even user id (fixture derivation)
    assert all(int(r.ticker) % 2 == 0 for r in kalshi_t)


def test_period_downsample_reduces_rows(spark, sf_dir):
    snap = etl.build_snapshot_table(spark, sf_dir)
    t = _kalshi_ticker(snap)
    raw = etl.ticker_data(snap, t, "kalshi").count()
    down = etl.ticker_data(snap, t, "kalshi", period="1 day").count()
    assert 0 < down < raw


def test_pair_history_matches_timeline_query(spark, sf_dir):
    """pair_history(key) must equal the pair_margin_timeline rows for
    that key (same derivation, parameterized + pre-filtered)."""
    from financial_arbitrage_data_pipeline_spark import etl
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    full = REGISTRY["pair_margin_timeline"].builder(spark, sf_dir)
    keys = [r.pair_key for r in full.select("pair_key").distinct().limit(3).collect()]
    assert keys
    for key in keys:
        want = {
            (r.bucket_us, r.kalshi_yes_bid, r.poly_yes, r.margin_yes)
            for r in full.filter(F.col("pair_key") == key).collect()
        }
        got = {
            (r.bucket_us, r.kalshi_yes_bid, r.poly_yes, r.margin_yes)
            for r in etl.pair_history(spark, sf_dir, key).collect()
        }
        assert got == want


def test_get_pair_history_is_tz_indexed(spark, sf_dir):
    from financial_arbitrage_data_pipeline_spark import etl
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    full = REGISTRY["pair_margin_timeline"].builder(spark, sf_dir)
    key = full.select("pair_key").first().pair_key
    pdf = etl.get_pair_history(spark, sf_dir, key, period_s=86400)
    assert pdf.index.name == "timestamp"
    assert str(pdf.index.tz) == "America/Chicago"
    assert set(pdf.columns) == {"kalshi_yes_bid", "poly_yes", "margin_yes"}
