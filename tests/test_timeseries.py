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
