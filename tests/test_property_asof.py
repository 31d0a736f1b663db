"""Property-based check of the as-of join core: for ANY generated quote/
trade history, asof_merge must agree with an obviously-correct Python
brute force. Hypothesis drives the input space (duplicate timestamps,
quote-less keys, trades before any quote, single-row edge cases) further
than the fixture replay can."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from financial_arbitrage_data_pipeline_spark.operators.timeseries import asof_merge

_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=50)

_quotes = st.lists(
    st.tuples(_key, _ts, st.integers(min_value=1, max_value=99)), max_size=25
)
_trades = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)


def _brute(quotes, trades):
    out = {}
    for tid, (k, t) in enumerate(trades):
        best = None
        for qk, qt, qc in quotes:
            if qk == k and qt <= t and (best is None or qt > best[0]):
                best = (qt, qc)
        # tie on qt: the LAST (qt, qc) seen wins in this loop only if
        # strictly greater — collapse ties deterministically to max qc,
        # matching the operator's one-quote-per-(key, ts) reduction
        if best is not None:
            cands = [qc for qk, qt, qc in quotes if qk == k and qt == best[0]]
            best = (best[0], max(cands))
        out[tid] = None if best is None else best[1]
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(quotes=_quotes, trades=_trades)
def test_asof_merge_matches_brute_force(spark, quotes, trades):
    qdf = spark.createDataFrame(
        [(k, t, c) for k, t, c in quotes] or [(99, 0, 1)],
        "user_id long, ts_us long, quote_cents long",
    )
    if not quotes:
        qdf = qdf.filter("user_id < 0")
    # collapse to one deterministic quote per (key, ts) exactly as
    # asof_quote_join does before merging
    from pyspark.sql import functions as F

    qdf = qdf.groupBy("user_id", "ts_us").agg(F.max("quote_cents").alias("quote_cents"))
    tdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(trades)],
        "user_id long, ts_us long, event_id long",
    )
    got = {
        r.event_id: r.quote_cents
        for r in asof_merge(qdf, tdf.select("event_id", "user_id", "ts_us")).collect()
    }
    assert got == _brute(quotes, trades)


_pts = st.lists(st.integers(min_value=0, max_value=100), max_size=30)
_probes = st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(points=_pts, probes=_probes)
def test_count_within_radius_matches_brute_force(spark, points, probes):
    """The bucketed range-join decomposition (3-bucket explode + residual
    filter) must count exactly what the direct |dt| <= radius predicate
    counts, for any point/probe placement — including points exactly on
    the bucket and radius boundaries, which is where the decomposition
    could silently drop or double-count."""
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        count_within_radius,
    )

    radius = 10
    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(probes)], "event_id long, p_ts long"
    )
    cdf = spark.createDataFrame([(t,) for t in points] or [(0,)], "c_ts long")
    if not points:
        cdf = cdf.filter("c_ts < 0")
    got = {
        r.event_id: r.nearby_clicks
        for r in count_within_radius(cdf, pdf, radius_us=radius).collect()
    }
    want = {
        i: sum(1 for c in points if abs(c - t) <= radius)
        for i, t in enumerate(probes)
    }
    assert got == want


_vals = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-100, 100), st.integers(0, 999)),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_vals)
def test_grouped_lower_median_matches_brute_force(spark, rows):
    """The shipped nearest-rank `(n+1) div 2` window formula must pick
    exactly sorted(vals)[(n-1)//2] for every group — including ties,
    negatives, and single-row groups."""
    from collections import defaultdict

    from financial_arbitrage_data_pipeline_spark.operators.analytics import (
        grouped_lower_median,
    )

    df = spark.createDataFrame(
        [(k, v, t) for k, v, t in rows], "k long, v long, tie long"
    )
    got = {r.k: (r.n, r.median) for r in grouped_lower_median(df, "k", "v", "tie").collect()}
    groups = defaultdict(list)
    for k, v, _t in rows:
        groups[k].append(v)
    want = {k: (len(vs), sorted(vs)[(len(vs) - 1) // 2]) for k, vs in groups.items()}
    assert got == want
