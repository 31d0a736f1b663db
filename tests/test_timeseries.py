"""Edge semantics for the time-series joins (operators/timeseries.py):
as-of inclusivity/tie-breaks and range-join boundary behavior, on tiny
hand-built frames (the parity suite covers the full-table oracle match)."""

from __future__ import annotations

import financial_arbitrage_data_pipeline_spark.operators.timeseries as tsops
from pyspark.sql import functions as F


def _asof(spark, quotes, trades):
    """The as-of merge core (same union + keyed running-window plan as
    asof_quote_join, which only adds the events-table derivation on top),
    runnable on hand-built quote/trade frames."""
    from pyspark.sql import Window

    merged = quotes.select(
        "user_id",
        "ts_us",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        "quote_cents",
    ).unionByName(
        trades.select(
            "user_id",
            "ts_us",
            F.lit(1).alias("side"),
            "event_id",
            F.lit(None).cast("long").alias("quote_cents"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("asof_q", F.last("quote_cents", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", F.col("asof_q").alias("quote_cents"))
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
    got = {r.event_id: r.quote_cents for r in _asof(spark, quotes, trades).collect()}
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
    [row] = _asof(spark, quotes, trades).collect()
    assert row.quote_cents is None


def test_range_join_boundary_exactly_radius(spark, sf_dir):
    """A click exactly RADIUS away counts (BETWEEN is inclusive), one µs
    beyond does not — checked against the full-query oracle domain by
    reproducing the bucketed plan on a crafted frame."""
    R = tsops._RADIUS_US
    purchases = spark.createDataFrame([(1, 10 * R)], "event_id long, p_ts long")
    clicks = spark.createDataFrame(
        [(10 * R - R,), (10 * R + R,), (10 * R + R + 1,), (10 * R - R - 1,)],
        "c_ts long",
    )
    b = F.expr(f"p_ts div {R}")
    pb = purchases.withColumn("bucket", F.explode(F.array(b - 1, b, b + 1)))
    cb = clicks.withColumn("bucket", F.expr(f"c_ts div {R}"))
    hit = F.abs(F.col("c_ts") - F.col("p_ts")) <= F.lit(R)
    [row] = (
        pb.join(cb, "bucket", "left")
        .groupBy("event_id", "p_ts")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("nearby_clicks"))
        .collect()
    )
    assert row.nearby_clicks == 2  # the two at exactly +/-R; the +/-(R+1) pair excluded


def test_range_join_bucket_coverage_is_tight(spark):
    """Every in-range click lands in one of the 3 probed buckets: sweep
    offsets across the whole window plus just-outside sentinels."""
    R = tsops._RADIUS_US
    p_ts = 7 * R + 12345
    offsets = list(range(-R, R + 1, R // 4)) + [-R - 1, R + 1]
    purchases = spark.createDataFrame([(1, p_ts)], "event_id long, p_ts long")
    clicks = spark.createDataFrame([(p_ts + o,) for o in offsets], "c_ts long")
    b = F.expr(f"p_ts div {R}")
    pb = purchases.withColumn("bucket", F.explode(F.array(b - 1, b, b + 1)))
    cb = clicks.withColumn("bucket", F.expr(f"c_ts div {R}"))
    hit = F.abs(F.col("c_ts") - F.col("p_ts")) <= F.lit(R)
    [row] = (
        pb.join(cb, "bucket", "left")
        .groupBy("event_id")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("n"))
        .collect()
    )
    expected = sum(1 for o in offsets if abs(o) <= R)
    assert row.n == expected
