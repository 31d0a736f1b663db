"""Property + plan pins for auction_clearing_price: the uncross must
equal a brute-force scan over every candidate price on a crafted book
(including tie cases), and keep the two-exchange no-join plan."""

from __future__ import annotations

import pandas as pd

from financial_arbitrage_data_pipeline_spark.operators.market import (
    auction_clearing_price,
)

TS0 = 1_700_000_000_000_000  # µs


def _write_orders(spark, tmp_path, rows):
    """rows: (event_id, market, side, px, qty). Encodes side via
    event_type (B -> 'view', S -> 'purchase'), px via cents%97+1
    (cents = px-1), qty via event_id%50+1 (event_id chosen so
    event_id % 50 == qty - 1)."""
    recs = []
    for eid, mkt, side, px, qty in rows:
        assert eid % 50 == qty - 1, "craft event_id to carry qty"
        recs.append(
            (
                eid,
                (TS0 + eid) * 1000,
                mkt,
                "view" if side == "B" else "purchase",
                (px - 1) / 100.0,
            )
        )
    pdf = pd.DataFrame(
        recs, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).selectExpr(
        "event_id",
        "timestamp_micros(cast(ts div 1000 as long)) as ts",
        "user_id",
        "event_type",
        "value",
    ).write.parquet(f"{sf_dir}/events.parquet")
    return sf_dir


def _brute_uncross(orders):
    """orders: (side, px, qty) for one market. Returns
    (clearing_px, matched, imbalance, crossed)."""
    prices = sorted({px for _, px, _ in orders})
    best = None
    for p in prices:
        cb = sum(q for s, px, q in orders if s == "B" and px >= p)
        cs = sum(q for s, px, q in orders if s == "S" and px <= p)
        ex = min(cb, cs)
        key = (-ex, abs(cb - cs), p)
        if best is None or key < best[0]:
            best = (key, p, ex, cb - cs)
    return best[1], best[2], best[3], best[2] > 0


def test_matches_brute_force_uncross(spark, tmp_path):
    # market 1: a classic crossed book; market 2: never crosses;
    # market 3: an executable tie broken by imbalance then price
    books = {
        1: [("B", 60, 10), ("B", 55, 5), ("B", 50, 8),
            ("S", 45, 6), ("S", 52, 7), ("S", 58, 9)],
        2: [("B", 20, 5), ("B", 22, 3), ("S", 40, 6), ("S", 45, 2)],
        3: [("B", 50, 4), ("B", 40, 4), ("S", 40, 4), ("S", 50, 4)],
    }
    rows = []
    eid_base = 0
    for mkt, orders in books.items():
        for side, px, qty in orders:
            # pick event_id == qty-1 (mod 50), unique across rows
            eid = eid_base * 50 + (qty - 1)
            rows.append((eid, mkt, side, px, qty))
            eid_base += 1
    sf_dir = _write_orders(spark, tmp_path, rows)
    got = {
        r["market"]: r for r in auction_clearing_price(spark, sf_dir).collect()
    }
    for mkt, orders in books.items():
        px, matched, imb, crossed = _brute_uncross(orders)
        row = got[mkt]
        assert (
            row["clearing_px"],
            row["matched_qty"],
            row["imbalance"],
            row["crossed"],
        ) == (px, matched, imb, crossed), (mkt, dict(row.asDict()))


def test_two_exchange_plan(spark, sf_dir):
    df = auction_clearing_price(spark, sf_dir)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # one (market, px) level-agg exchange + one market-keyed exchange
    # shared by both cumulative windows and the argmax rollup
    assert plan.count("Exchange") == 4, plan
    assert "Join" not in plan  # two-sided book is one conditional agg
    assert "CartesianProduct" not in plan
