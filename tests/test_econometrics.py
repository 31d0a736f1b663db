"""Property + plan pins for pair_cointegration_test: the operator must
equal a direct Python float64 recomputation of the Engle-Granger /
Dickey-Fuller formulas on a crafted two-venue tape (the guard against
'Spark and DuckDB wrong the same way'), detect a textbook cointegrated
pair vs a divergent one, and keep the two-exchange plan shape."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from financial_arbitrage_data_pipeline_spark.operators.econometrics import (
    pair_cointegration_test,
)

TS0 = 1_700_000_000_000_000  # µs
DAY_US = 86_400_000_000


def _write_tape(spark, tmp_path, rows):
    """rows: (event_id, day, user_id, event_type, cents)."""
    pdf = pd.DataFrame(
        [
            (e, (TS0 + d * DAY_US + e) * 1000, u, ty, c / 100.0)
            for e, d, u, ty, c in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value"],
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


def _python_engle_granger(kp_series):
    """Direct float64 recomputation, mirroring the module's fixed IEEE
    tree operation-for-operation (same order, same int64 moments)."""
    obs = [
        (kp_series[i - 1], kp_series[i])
        for i in range(1, len(kp_series))
    ]
    m = len(obs)
    spc = sum(c[1][1] for c in obs)
    skc = sum(c[1][0] for c in obs)
    spp = sum(c[0][1] for c in obs)
    skp = sum(c[0][0] for c in obs)
    sp2c = sum(c[1][1] ** 2 for c in obs)
    sk2c = sum(c[1][0] ** 2 for c in obs)
    sp2p = sum(c[0][1] ** 2 for c in obs)
    sk2p = sum(c[0][0] ** 2 for c in obs)
    spkc = sum(c[1][1] * c[1][0] for c in obs)
    spkp = sum(c[0][1] * c[0][0] for c in obs)
    xpp = sum(c[0][1] * c[1][1] for c in obs)
    xkk = sum(c[0][0] * c[1][0] for c in obs)
    xpk = sum(c[0][1] * c[1][0] for c in obs)
    xkp = sum(c[0][0] * c[1][1] for c in obs)
    dd = m * sk2c - skc * skc
    na = spc * sk2c - skc * spkc
    nb = m * spkc - skc * spc
    if m < 8 or dd <= 0:
        return None
    a = float(na) / float(dd)
    b = float(nb) / float(dd)
    sprev2 = (
        float(sp2p) - 2 * a * float(spp) - 2 * b * float(spkp)
        + float(m) * a * a + 2 * a * b * float(skp) + b * b * float(sk2p)
    )
    scur2 = (
        float(sp2c) - 2 * a * float(spc) - 2 * b * float(spkc)
        + float(m) * a * a + 2 * a * b * float(skc) + b * b * float(sk2c)
    )
    scross = (
        float(xpp) - a * float(spp) - b * float(xpk) - a * float(spc)
        + float(m) * a * a + a * b * float(skc) - b * float(xkp)
        + a * b * float(skp) + b * b * float(xkk)
    )
    if not sprev2 > 0:
        return None
    snum = scross - sprev2
    sdd2 = scur2 - 2 * scross + sprev2
    rho = snum / sprev2
    ssr = sdd2 - (snum * snum) / sprev2
    if not ssr > 0:
        return None
    t = rho * math.sqrt((sprev2 * float(m - 1)) / ssr)
    return {"m": m, "alpha": a, "beta": b, "adf_rho": rho, "adf_t": t}


def _tape_rows(series_by_user):
    """series_by_user: {user: [(day, k_cents_mod97_target, p_target)]}
    — encode so cents%97+1 == k and cents%99+1 == p. Use raw cents
    values < 97 and < 99 directly (cents = target-1)."""
    rows = []
    eid = 0
    for u, series in series_by_user.items():
        for day, k, p in series:
            rows.append((eid, day, u, "view", k - 1))  # kalshi leg
            eid += 1
            rows.append((eid, day, u, "purchase", p - 1))  # poly leg
            eid += 1
    return rows


# a mean-reverting spread: p tracks 2k + noise that reverts
_COINT = [
    (d, k, 2 * k + e)
    for d, (k, e) in enumerate(
        zip(
            [10, 12, 11, 13, 14, 12, 11, 13, 15, 14, 12, 13],
            [1, -1, 2, -2, 1, -1, 1, -2, 2, -1, 1, -1],
        )
    )
]
# a divergent pair: the spread itself is a trend (unit root / drift)
_DIVERGENT = [
    (d, k, 2 * k + 3 * d)
    for d, k in enumerate([10, 12, 11, 13, 14, 12, 11, 13, 15, 14, 12, 13])
]


def test_matches_python_float64_recomputation(spark, tmp_path):
    sf_dir = _write_tape(
        spark, tmp_path, _tape_rows({1: _COINT, 2: _DIVERGENT})
    )
    got = {
        r["pair_key"]: r
        for r in pair_cointegration_test(spark, sf_dir).collect()
    }
    for user, series in ((1, _COINT), (2, _DIVERGENT)):
        kp = [(k, p) for _, k, p in series]
        want = _python_engle_granger(kp)
        row = got[user]
        assert row["m"] == want["m"]
        # bit-exact: the Spark tree and this recomputation share the
        # same operation order over the same exact int64 moments
        assert row["alpha"] == want["alpha"]
        assert row["beta"] == want["beta"]
        assert row["adf_rho"] == want["adf_rho"]
        assert row["adf_t"] == want["adf_t"]


def test_detects_cointegration_vs_divergence(spark, tmp_path):
    sf_dir = _write_tape(
        spark, tmp_path, _tape_rows({1: _COINT, 2: _DIVERGENT})
    )
    got = {
        r["pair_key"]: r
        for r in pair_cointegration_test(spark, sf_dir).collect()
    }
    # the reverting spread rejects the unit root decisively...
    assert got[1]["cointegrated"] and got[1]["adf_t"] < -1.95
    # ...and is a better mean-reverter than the trending spread
    assert got[1]["adf_t"] < got[2]["adf_t"]
    # hedge ratio recovers the construction p ~ 2k
    assert got[1]["beta"] == pytest.approx(2.0, abs=0.5)


def test_two_exchange_plan(spark, sf_dir):
    df = pair_cointegration_test(spark, sf_dir)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # one (pair, day) hash exchange for the closes aggregate + one
    # pair-keyed exchange shared by the window AND the moment rollup
    # (subset rule); formatted mode prints each node twice
    assert plan.count("Exchange") == 4, plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
