"""Unit tests for the orderbook operators (SURVEY §2.2) on hand-built
snapshot rows, including golden test #1: the reference's scanner demo
scenario (`opportunity_scanner.py:659-724`) — Kalshi yes_bid 45¢ / no_bid
55¢ vs Polymarket yes $0.40 / no $0.60 ⇒ YES-side margin
(0.45-0.40)/0.40 = 12.5% > the 2% threshold."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators import orderbook as ob

KALSHI_DEMO_BOOK = {
    "yes": [[45, 30000], [44, 500], [43, 337]],
    "no": [[55, 162212], [54, 10700], [53, 9000]],
    "ticker": "KXPRESIRELAND-25-MM",
    "title": "Market",
    "status": "active",
    "volume": 0.0,
}

POLY_DEMO_BOOK = {
    "orderbook": {
        "bids": [{"price": 0.40, "size": 1000.0}, {"price": 0.39, "size": 500.0}],
        "asks": [{"price": 0.42, "size": 800.0}, {"price": 0.43, "size": 300.0}],
    }
}


@pytest.fixture(scope="module")
def kalshi_df(spark):
    return spark.createDataFrame(
        [("kalshi", "KXPRESIRELAND-25-MM", json.dumps(KALSHI_DEMO_BOOK))],
        "source string, ticker string, full_orderbook string",
    ).select("source", "ticker", ob.parse_kalshi_book("full_orderbook").alias("book"))


@pytest.fixture(scope="module")
def poly_df(spark):
    return spark.createDataFrame(
        [("polymarket", "0x26d06d9c", json.dumps(POLY_DEMO_BOOK))],
        "source string, ticker string, full_orderbook string",
    ).select("source", "ticker", ob.parse_polymarket_book("full_orderbook").alias("book"))


def test_kalshi_best_of_book(kalshi_df):
    row = kalshi_df.select(
        ob.best_bid_cents(F.col("book.yes")).alias("yes_bid"),
        ob.best_ask_cents(F.col("book.yes")).alias("yes_ask"),
        ob.best_bid_cents(F.col("book.no")).alias("no_bid"),
        ob.side_depth(F.col("book.yes")).alias("depth"),
        ob.side_quantity(F.col("book.yes")).alias("qty"),
    ).first()
    assert row.yes_bid == 45 and row.yes_ask == 43
    assert row.no_bid == 55
    assert row.depth == 3 and row.qty == 30837


def test_polymarket_best_of_book(poly_df):
    row = poly_df.select(
        ob.poly_best_bid(F.col("book.orderbook.bids")).alias("bid"),
        ob.poly_best_ask(F.col("book.orderbook.asks")).alias("ask"),
        ob.poly_midpoint(F.col("book.orderbook.bids"), F.col("book.orderbook.asks")).alias("mid"),
        ob.poly_spread(F.col("book.orderbook.bids"), F.col("book.orderbook.asks")).alias("spread"),
    ).first()
    assert row.bid == 0.40 and row.ask == 0.42
    assert abs(row.mid - 0.41) < 1e-12
    assert abs(row.spread - 0.02) < 1e-12


def test_golden_arbitrage_margin(kalshi_df):
    """The demo scenario margin: Kalshi yes_bid 45¢, Polymarket yes $0.40
    ⇒ (0.45-0.40)/0.40 = 12.5%."""
    row = kalshi_df.select(
        ob.cents_to_dollars(ob.best_bid_cents(F.col("book.yes"))).alias("k_yes")
    ).first()
    poly_yes = 0.40
    margin = (row.k_yes - poly_yes) / poly_yes
    assert abs(margin - 0.125) < 1e-12
    assert margin > 0.02  # clears min_profit_threshold


def test_vwap_fill_walks_levels(spark):
    # 100@45 then partial 50 of 500@44 → (100*45 + 50*44)/150
    df = spark.createDataFrame(
        [([[45, 100], [44, 500], [43, 10]],)], "levels array<array<int>>"
    )
    row = df.select(
        ob.vwap_fill_cents(ob.sort_levels_best_first("levels"), 150).alias("v")
    ).first()
    assert abs(row.v - (100 * 45 + 50 * 44) / 150.0) < 1e-12


def test_vwap_too_thin_returns_zero(spark):
    df = spark.createDataFrame([([[45, 10]],)], "levels array<array<int>>")
    row = df.select(ob.vwap_fill_cents(F.col("levels"), 100).alias("v")).first()
    assert row.v == 0.0


def test_direction_swap_boundary(spark):
    # strict > 0.5: exactly 0.5 must NOT swap (`etl/query.py:223-231`)
    df = spark.createDataFrame([(0.5, 0.5), (0.51, 0.49)], "yes double, no double")
    rows = (
        df.select(ob.direction_swap(F.col("yes"), F.col("no")).alias("s"))
        .select("s.yes_price", "s.no_price")
        .collect()
    )
    assert rows[0].yes_price == 0.5  # unchanged
    assert rows[1].yes_price == 0.49 and rows[1].no_price == 0.51  # swapped


def test_yes_no_complement(spark):
    df = spark.createDataFrame([(0.40,)], "yes double")
    assert df.select(ob.yes_to_no(F.col("yes")).alias("no")).first().no == 0.60


def test_latency_us(spark):
    df = spark.createDataFrame([(1_000_000_000, 1_012_300_000)], "t1 long, t2 long")
    assert df.select(ob.latency_us("t1", "t2").alias("l")).first().l == 12300.0


def test_line_protocol_format(spark):
    df = spark.createDataFrame(
        [("kalshi", "TICK", '{"yes":[]}', 1753400000000000000)],
        "source string, ticker string, book string, ts_ns long",
    )
    line = df.select(
        ob.line_protocol(
            "market_snapshot",
            F.col("source"),
            F.col("ticker"),
            "full_orderbook",
            F.col("book"),
            F.col("ts_ns"),
        ).alias("lp")
    ).first().lp
    assert line.startswith("market_snapshot,source=kalshi,ticker=TICK ")
    assert line.endswith(" 1753400000000000000")


def test_vwap_walk_matches_python_reference_on_random_books(spark):
    """Randomized cross-check of the aggregate()-HOF book walk (P8)
    against a literal Python transcription of the reference's walk
    (`virginia/api/data_feed.py:99-126`)."""
    import random

    rng = random.Random(42)
    books = []
    for i in range(200):
        n = rng.randint(0, 8)
        books.append((i, [[rng.randint(1, 99), rng.randint(0, 60)] for _ in range(n)]))

    def py_walk(levels, target=100):
        levels = sorted(levels, key=lambda x: (-x[0], -x[1]))
        remaining, cost = target, 0
        for price, qty in levels:
            fill = min(qty, remaining)
            remaining -= fill
            cost += fill * price
        return 0.0 if remaining > 0 else cost / target

    df = spark.createDataFrame(books, "book_id long, levels array<array<int>>")
    got = {
        r.book_id: r.vwap
        for r in df.select(
            "book_id",
            ob.vwap_fill_cents(ob.sort_levels_best_first(F.col("levels")), 100).alias("vwap"),
        ).collect()
    }
    for book_id, levels in books:
        assert got[book_id] == py_walk(levels), (book_id, levels)
