"""Orderbook operators — the engine's core domain math (SURVEY §2.2).

All pure column expressions / higher-order functions; no Python UDFs.
These are the Spark-first re-expressions of:

- P3 best-of-book (Kalshi level arrays): `array_max(transform(...))`
  — reference walks lists in Python (`opportunity_scanner.py:159-177`,
  `virginia/api/data_feed.py:62-77`).
- P4 best-of-book + derived metrics (Polymarket bids/asks structs):
  `element_at(...,1)` + arithmetic (`ireland/api/data_feed.py:70-93`).
- P5 cents→dollars (`opportunity_scanner.py:222-225`, `etl/query.py:191`).
- P6 YES→NO complement (`etl/query.py:193-195,220`).
- P7 contract-direction swap at yes_mid>0.5 (`etl/query.py:223-231`).
- P8 fill-price book walk / VWAP-for-size: `aggregate()` HOF with a
  (remaining, cost) struct accumulator (`virginia/api/data_feed.py:99-126`).
- P9 latency derivations over the ns timing chain
  (`ireland/api/data_feed.py:95-114`, `database/models/influx.py:160-169`).
- P10 line-protocol encoding, kept as an optional export formatter
  (`database/models/influx.py:105-146`).
- P11 JSON parse of stored books via `from_json` (`etl/query.py:182-238`).

Kalshi books are `{"yes": [[price_cents, qty], ...], "no": [...]}` with
int cents 1..99; Polymarket books are `{"orderbook": {"bids":
[{"price","size"}...], "asks": [...]}}` with float dollars. See
schemas.KALSHI_BOOK / schemas.POLYMARKET_BOOK.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import KALSHI_BOOK, POLYMARKET_BOOK

# ---------------------------------------------------------------------------
# P11 — parse stored JSON books
# ---------------------------------------------------------------------------


def parse_kalshi_book(json_col: Column | str) -> Column:
    """`json.loads(full_orderbook)` for Kalshi rows (`etl/query.py:184-191`)."""
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.from_json(c, KALSHI_BOOK)


def parse_polymarket_book(json_col: Column | str) -> Column:
    """`json.loads(full_orderbook)` for Polymarket rows (`etl/query.py:205-213`)."""
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.from_json(c, POLYMARKET_BOOK)


# ---------------------------------------------------------------------------
# P3 — Kalshi best-of-book over [[price, qty], ...] level arrays
# ---------------------------------------------------------------------------


def level_prices(levels: Column) -> Column:
    """Project the price component of [[price, qty], ...]."""
    return F.transform(levels, lambda x: x.getItem(0))


def best_bid_cents(levels: Column) -> Column:
    """Best bid = max price on the side (`opportunity_scanner.py:161`)."""
    return F.array_max(level_prices(levels))


def best_ask_cents(levels: Column) -> Column:
    """Best ask = min price on the side (`opportunity_scanner.py:164`)."""
    return F.array_min(level_prices(levels))


def side_depth(levels: Column) -> Column:
    return F.size(levels)


def side_quantity(levels: Column) -> Column:
    """Total resting quantity on a side (int-exact)."""
    return F.aggregate(
        levels,
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.getItem(1).cast("long"),
    )


# ---------------------------------------------------------------------------
# P4 — Polymarket best-of-book + derived metrics
# ---------------------------------------------------------------------------


def poly_best_bid(bids: Column) -> Column:
    """bids[0].price — books arrive best-first (`ireland/api/data_feed.py:81`)."""
    return F.element_at(bids, 1).getField("price")


def poly_best_ask(asks: Column) -> Column:
    return F.element_at(asks, 1).getField("price")


def poly_midpoint(bids: Column, asks: Column) -> Column:
    return (poly_best_bid(bids) + poly_best_ask(asks)) / F.lit(2.0)


def poly_spread(bids: Column, asks: Column) -> Column:
    return poly_best_ask(asks) - poly_best_bid(bids)


# ---------------------------------------------------------------------------
# P5 / P6 / P7 — price normalization
# ---------------------------------------------------------------------------


def cents_to_dollars(cents: Column) -> Column:
    """price/100 (`opportunity_scanner.py:222-225`). Integer cents divided
    by the double literal — bit-identical across engines."""
    return cents.cast("double") / F.lit(100.0)


def yes_to_no(yes_price: Column) -> Column:
    """no = 1.0 - yes (`etl/query.py:193-195`)."""
    return F.lit(1.0) - yes_price


def direction_swap(yes_mid: Column, no_mid: Column) -> Column:
    """If Polymarket yes_mid > 0.5, swap orientation to match Kalshi
    (`etl/query.py:223-231`; the >0.5 boundary is strict). Returns a
    struct (yes_price, no_price)."""
    return F.when(
        yes_mid > F.lit(0.5),
        F.struct(no_mid.alias("yes_price"), yes_mid.alias("no_price")),
    ).otherwise(F.struct(yes_mid.alias("yes_price"), no_mid.alias("no_price")))


# ---------------------------------------------------------------------------
# P8 — fill-price book walk (VWAP for a target size)
# ---------------------------------------------------------------------------


def vwap_fill_cents(levels_desc: Column, target_qty: int) -> Column:
    """Walk levels best-first, filling min(remaining, level.qty) per level;
    return the average fill price in cents, or 0.0 if the book can't fill
    `target_qty` (`virginia/api/data_feed.py:99-126` returns 0.0 for a
    too-thin book).

    `levels_desc` must already be sorted best-first (price desc for bids).
    Pure `aggregate()` HOF with a (remaining, cost) struct accumulator —
    runs inside codegen, no UDF. Exact: cents and quantities are ints.
    """
    init = F.struct(
        F.lit(target_qty).cast("long").alias("remaining"),
        F.lit(0).cast("long").alias("cost"),
    )

    def step(acc: Column, x: Column) -> Column:
        fill = F.least(x.getItem(1).cast("long"), acc.getField("remaining"))
        return F.struct(
            (acc.getField("remaining") - fill).alias("remaining"),
            (acc.getField("cost") + fill * x.getItem(0).cast("long")).alias("cost"),
        )

    def finish(acc: Column) -> Column:
        return (
            F.when(acc.getField("remaining") > 0, F.lit(0.0))
            .otherwise(acc.getField("cost").cast("double") / F.lit(float(target_qty)))
        )

    return F.aggregate(levels_desc, init, step, finish)


def sort_levels_best_first(levels: Column) -> Column:
    """Sort [[price, qty], ...] price-descending (bid side best-first).
    Cost of a fill is invariant to ordering among equal prices."""
    return F.reverse(F.array_sort(levels))


# ---------------------------------------------------------------------------
# P9 — latency derivations over the ns timing chain
# ---------------------------------------------------------------------------


def latency_us(start_ns: Column | str, end_ns: Column | str) -> Column:
    """(t2-t1)/1000 µs (`ireland/api/data_feed.py:95-114`). Integer-exact."""
    s = F.col(start_ns) if isinstance(start_ns, str) else start_ns
    e = F.col(end_ns) if isinstance(end_ns, str) else end_ns
    return (e - s) / F.lit(1000)


def pipeline_latency_us(first_ns: Column | str, last_ns: Column | str) -> Column:
    """End-to-end chain latency (`database/models/influx.py:160-169`)."""
    return latency_us(first_ns, last_ns)


# ---------------------------------------------------------------------------
# P10 — line-protocol export formatter (optional; columnar sinks replace it)
# ---------------------------------------------------------------------------


def line_protocol(
    measurement: str,
    source: Column,
    ticker: Column,
    field_name: str,
    field_value: Column,
    ts_ns: Column,
) -> Column:
    """`measurement,source=s,ticker=t field="v" ns` — kept only as an
    export formatter for Influx-compatible consumers
    (`database/models/influx.py:105-146`); the engine's native sink is
    partitioned parquet."""
    escaped = F.regexp_replace(field_value, '"', '\\\\"')
    return F.format_string(
        f'{measurement},source=%s,ticker=%s {field_name}="%s" %s',
        source,
        ticker,
        escaped,
        ts_ns.cast("string"),
    )
