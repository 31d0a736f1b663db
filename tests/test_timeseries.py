"""Edge semantics for the time-series joins (operators/timeseries.py):
as-of inclusivity/tie-breaks and range-join boundary behavior, exercised
through the SAME shared cores the registered queries call (asof_merge /
count_within_radius), on tiny hand-built frames. The parity suite covers
the full-table oracle match."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
    _RADIUS_US,
    asof_merge,
    count_within_radius,
)


def test_asof_inclusive_and_latest_wins(spark):
    quotes = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 20), (1, 300, 30), (2, 150, 99)],
        "user_id long, ts_us long, quote_cents long",
    )
    trades = spark.createDataFrame(
        [(101, 1, 200), (102, 1, 250), (103, 1, 50), (104, 2, 150)],
        "event_id long, user_id long, ts_us long",
    )
    got = {r.event_id: r.quote_cents for r in asof_merge(quotes, trades).collect()}
    assert got[101] == 20  # tie at ts=200 is INCLUSIVE: quote at same µs matches
    assert got[102] == 20  # latest prior, not first
    assert got[103] is None  # no quote yet -> left-join null
    assert got[104] == 99  # per-key isolation


def test_asof_no_cross_key_leakage(spark):
    quotes = spark.createDataFrame(
        [(1, 100, 10)], "user_id long, ts_us long, quote_cents long"
    )
    trades = spark.createDataFrame(
        [(201, 2, 500)], "event_id long, user_id long, ts_us long"
    )
    [row] = asof_merge(quotes, trades).collect()
    assert row.quote_cents is None


def test_range_join_boundary_exactly_radius(spark):
    """A click exactly RADIUS away counts (inclusive), one µs beyond
    does not."""
    R = _RADIUS_US
    purchases = spark.createDataFrame([(1, 10 * R)], "event_id long, p_ts long")
    clicks = spark.createDataFrame(
        [(10 * R - R,), (10 * R + R,), (10 * R + R + 1,), (10 * R - R - 1,)],
        "c_ts long",
    )
    [row] = count_within_radius(clicks, purchases).collect()
    assert row.nearby_clicks == 2  # the two at exactly +/-R; +/-(R+1) excluded


def test_range_join_bucket_coverage_is_tight(spark):
    """Every in-range click lands in one of the 3 probed buckets: sweep
    offsets across the whole window plus just-outside sentinels."""
    R = _RADIUS_US
    p_ts = 7 * R + 12345
    offsets = list(range(-R, R + 1, R // 4)) + [-R - 1, R + 1]
    purchases = spark.createDataFrame([(1, p_ts)], "event_id long, p_ts long")
    clicks = spark.createDataFrame([(p_ts + o,) for o in offsets], "c_ts long")
    [row] = (
        count_within_radius(clicks, purchases)
        .groupBy("event_id")
        .agg(F.sum("nearby_clicks").alias("n"))
        .collect()
    )
    expected = sum(1 for o in offsets if abs(o) <= R)
    assert row.n == expected


def test_ewma_and_ohlc_match_python_bruteforce(spark, tmp_path):
    """Property check for the fixed-point EWMA and the OHLC bars on a
    crafted tick tape (same-microsecond requotes, single-tick buckets,
    16+ tick history so the lag ladder saturates): both operators must
    equal a direct Python recomputation of their declared formulas."""
    import pandas as pd

    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        _BAR_US,
        _EWMA_LAGS,
        ewma_quote_smoothing,
        ohlc_bars_5m,
    )

    # one ticker, 40 ticks: bursts inside one bar, ties on ts, gaps
    ticks = []
    ts0 = 1_700_000_000_000_000  # µs
    prices = [100 + ((7 * i * i) % 60) - 30 for i in range(40)]
    for i, p in enumerate(prices):
        ts_us = ts0 + (i // 3) * 97_000_000 + (i % 3) * 0  # 3-way ts ties
        ticks.append((i, ts_us * 1000, 7, "view", p / 100.0))
    pdf = pd.DataFrame(
        ticks, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).selectExpr(
        "event_id", "timestamp_micros(cast(ts div 1000 as long)) as ts",
        "user_id", "event_type", "value"
    ).write.parquet(f"{sf_dir}/events.parquet")

    # brute-force EWMA: ordered by (ts_us, event_id)
    order = sorted(range(40), key=lambda i: ((ts0 + (i // 3) * 97_000_000), i))
    cents = [prices[i] for i in order]
    expected_ewma = {}
    for n, i in enumerate(order):
        num = den = 0
        for j in range(min(_EWMA_LAGS, n + 1)):
            w = 1 << (_EWMA_LAGS - 1 - j)
            num += cents[n - j] * w
            den += w
        expected_ewma[i] = num // den
    got = {
        r.event_id: r.ewma_cents
        for r in ewma_quote_smoothing(spark, sf_dir).collect()
    }
    assert got == expected_ewma

    # brute-force OHLC per 5-minute bucket
    import collections

    buckets = collections.defaultdict(list)
    for n, i in enumerate(order):
        ts_us = ts0 + (i // 3) * 97_000_000
        buckets[ts_us // _BAR_US].append((ts_us, i, cents[n]))
    bars = {}
    for b, rows in buckets.items():
        rows.sort()
        cs = [c for _, _, c in rows]
        bars[b * _BAR_US] = (cs[0], max(cs), min(cs), cs[-1], len(cs))
    got_bars = {
        r.bar_start_us: (
            r.open_cents, r.high_cents, r.low_cents, r.close_cents, r.n_ticks
        )
        for r in ohlc_bars_5m(spark, sf_dir).collect()
    }
    assert got_bars == bars
