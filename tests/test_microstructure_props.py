"""Python brute-force property pins for the round-7 quantitative
operators (CUSUM, Kyle's lambda, VPIN, venue lead-lag, Mann-Whitney,
linear interpolation): each operator must equal a direct recomputation
of its declared formula on a crafted adversarial tape (same-microsecond
requotes, flat ticks exercising the zero-tick carry, gaps spanning
grid cells). The DuckDB parity suite proves Spark == oracle; these
prove both == the formula — the guard against "both engines wrong the
same way"."""

from __future__ import annotations

import collections

import pandas as pd

TS0 = 1_700_000_000_000_000  # µs


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, cents)."""
    pdf = pd.DataFrame(
        [(e, t * 1000, u, ty, c / 100.0) for e, t, u, ty, c in rows],
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


def _tape(n=60, user=7, flat_runs=True):
    """One 'view' tape with ts ties, flat stretches, and a level shift."""
    rows = []
    for i in range(n):
        cents = 100 + ((7 * i * i) % 40) - 20
        if flat_runs and 10 <= i < 15:
            cents = 111  # flat run: zero moves exercise the sign carry
        if i >= n // 2:
            cents += 35  # mean shift for CUSUM
        ts_us = TS0 + (i // 3) * 97_000_000  # 3-way microsecond ties
        rows.append((i, ts_us, user, "view", cents))
    return rows


def _ordered_cents(rows):
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    return srt


def test_cusum_matches_bruteforce(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        cusum_changepoint,
    )

    rows = _tape()
    sf_dir = _write_events(spark, tmp_path, rows)
    srt = _ordered_cents(rows)
    cents = [r[4] for r in srt]
    n, t = len(cents), sum(cents)
    best = None
    s = 0
    for k in range(1, n):
        s += cents[k - 1]
        dk = abs(n * s - k * t)
        if best is None or dk > best[0]:
            best = (dk, k, s)
    [row] = cusum_changepoint(spark, sf_dir).collect()
    assert row.pair_key == 7 and row.n == n
    assert (row.d_max, row.change_k) == (best[0], best[1])
    k, sk = best[1], best[2]
    assert abs(row.mean_shift - (sk / k - (t - sk) / (n - k))) < 1e-9


def _signed_flow(srt):
    """(move, q) pairs with the Lee-Ready zero-tick carry; q is None
    until the first non-zero move."""
    out = []
    carry = None
    for i in range(1, len(srt)):
        move = srt[i][4] - srt[i - 1][4]
        if move > 0:
            carry = 1
        elif move < 0:
            carry = -1
        size = srt[i][0] % 50 + 1
        out.append((move, None if carry is None else carry * size))
    return out


def test_kyle_lambda_matches_bruteforce(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        kyle_lambda_per_pair,
    )

    rows = _tape()
    sf_dir = _write_events(spark, tmp_path, rows)
    flow = [(m, q) for m, q in _signed_flow(_ordered_cents(rows)) if q is not None]
    n = len(flow)
    sq = sum(q for _, q in flow)
    sd = sum(m for m, _ in flow)
    sqd = sum(m * q for m, q in flow)
    sq2 = sum(q * q for _, q in flow)
    [row] = kyle_lambda_per_pair(spark, sf_dir).collect()
    assert (row.n, row.sq, row.sd, row.sqd, row.sq2) == (n, sq, sd, sqd, sq2)
    lam = (n * sqd - sq * sd) / (n * sq2 - sq * sq)
    assert abs(row.kyle_lambda - lam) < 1e-12


def test_vpin_matches_bruteforce(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        _VPIN_BUCKET_VOL,
        _VPIN_WINDOW,
        vpin_toxicity,
    )

    # 480 max-size ticks (event_id ≡ 49 mod 50 → size 50) → 12 buckets
    rows = []
    for i in range(480):
        cents = 100 + ((11 * i) % 30) - 15
        rows.append((49 + 50 * i, TS0 + i * 1_000_000, 3, "view", cents))
    sf_dir = _write_events(spark, tmp_path, rows)

    srt = _ordered_cents(rows)
    flow = _signed_flow(srt)
    buckets = collections.defaultdict(lambda: [0, 0, 0])  # buy, sell, tot
    cum = 0
    for i, (_, q) in enumerate(flow, start=1):
        vol = srt[i][0] % 50 + 1
        if q is not None:
            b = cum // _VPIN_BUCKET_VOL
            if q > 0:
                buckets[b][0] += vol
            else:
                buckets[b][1] += vol
            buckets[b][2] += vol
            cum += vol  # volume clock advances only over classified rows
    bids = sorted(buckets)
    expected = {}
    for j, b in enumerate(bids):
        if j + 1 >= _VPIN_WINDOW:
            win = bids[j + 1 - _VPIN_WINDOW : j + 1]
            imb = sum(abs(buckets[x][0] - buckets[x][1]) for x in win)
            vol = sum(buckets[x][2] for x in win)
            expected[b] = (buckets[b][0], buckets[b][1], imb / vol)
    got = {
        r.bucket: (r.buy_vol, r.sell_vol, r.vpin)
        for r in vpin_toxicity(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for b in expected:
        assert got[b][:2] == expected[b][:2]
        assert abs(got[b][2] - expected[b][2]) < 1e-12


def test_venue_lead_lag_matches_bruteforce(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.market import (
        _LL_BUCKET_US,
        _LL_MAX_LAG,
        venue_lead_lag,
    )

    kal = ("click", "view")
    pol = ("purchase", "signup", "error")
    rows = []
    eid = 0
    for u in (1, 2):
        for i in range(40):
            ts = TS0 + i * 200_000_000 + u * 7_000  # ~2 quotes per 5-min bucket
            ty = kal[i % 2] if (i + u) % 3 else pol[i % 3]
            rows.append((eid, ts, u, ty, 90 + ((13 * i + u) % 55)))
            eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)

    def series(fams, mod):
        last = {}
        for e, t, u, ty, c in sorted(rows, key=lambda r: (r[1], r[0])):
            if ty in fams:
                last[(u, t // _LL_BUCKET_US)] = c % mod + 1
        return last

    def moves(ser):
        out = {}
        by_pair = collections.defaultdict(list)
        for (u, b), v in ser.items():
            by_pair[u].append((b, v))
        for u, lst in by_pair.items():
            lst.sort()
            for (b0, v0), (b1, v1) in zip(lst, lst[1:]):
                out[(u, b1)] = v1 - v0
        return out

    km, pm = moves(series(kal, 97)), moves(series(pol, 99))
    expected = {}
    for lag in range(-_LL_MAX_LAG, _LL_MAX_LAG + 1):
        pairs = [
            (km[(u, b - lag)], dp)
            for (u, b), dp in pm.items()
            if (u, b - lag) in km
        ]
        if not pairs:
            continue
        n = len(pairs)
        sdk = sum(x for x, _ in pairs)
        sdp = sum(y for _, y in pairs)
        sdk2 = sum(x * x for x, _ in pairs)
        sdp2 = sum(y * y for _, y in pairs)
        sdkdp = sum(x * y for x, y in pairs)
        if n * sdk2 > sdk * sdk and n * sdp2 > sdp * sdp:
            num = n * sdkdp - sdk * sdp
            den = ((n * sdk2 - sdk * sdk) ** 0.5) * ((n * sdp2 - sdp * sdp) ** 0.5)
            expected[lag] = (n, sdk, sdp, sdkdp, num / den)
    got = {
        r.lag: (r.n, r.sdk, r.sdp, r.sdkdp, r.xcorr)
        for r in venue_lead_lag(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for lag in expected:
        assert got[lag][:4] == expected[lag][:4]
        assert abs(got[lag][4] - expected[lag][4]) < 1e-9


def test_mannwhitney_matches_bruteforce(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.analytics import (
        _MW_SEGMENTS,
        ab_test_mannwhitney,
    )

    rows = []
    eid = 0
    for u in range(25):  # segments 0..9 with ties across arms
        for i in range(8):
            ty = "click" if (i + u) % 2 else "purchase"
            rows.append((eid, TS0 + eid * 1_000_000, u, ty, 100 + (i * u) % 7))
            eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)

    seg = collections.defaultdict(list)
    for e, t, u, ty, c in rows:
        seg[u % _MW_SEGMENTS].append((c, ty == "click"))
    expected = {}
    for s, vals in seg.items():
        na = sum(1 for _, a in vals if a)
        nb = len(vals) - na
        by_v = collections.Counter(v for v, _ in vals)
        r2a = 0
        prior = 0
        ties = 0
        for v in sorted(by_v):
            c = by_v[v]
            ca = sum(1 for x, a in vals if a and x == v)
            r2a += ca * (2 * prior + c + 1)
            ties += c * c * c - c
            prior += c
        u2 = r2a - na * (na + 1)
        n = na + nb
        if na > 0 and nb > 0 and n > ties + 1:
            z = (u2 / 2.0 - na * nb / 2.0) / (
                (na * nb / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))) ** 0.5
            )
            expected[s] = (na, nb, u2, ties, z)
    got = {
        r.segment: (r.na, r.nb, r.u2, r.ties, r.z_score)
        for r in ab_test_mannwhitney(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for s in expected:
        assert got[s][:4] == expected[s][:4]
        assert abs(got[s][4] - expected[s][4]) < 1e-9


def test_linear_interp_matches_bruteforce(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        _INTERP_GRID_US,
        linear_interp_resample,
    )

    W = _INTERP_GRID_US
    base = (TS0 // W) * W
    # segments: within one cell (no output), spanning 1 cell, spanning 3
    quotes = [
        (0, base + 100, 200),
        (1, base + 200, 300),  # same cell: no grid point
        (2, base + W + 50, 250),  # spans 1 boundary
        (3, base + 4 * W + 10, 130),  # spans 3 boundaries
        (4, base + 4 * W + 10, 170),  # same-µs requote (tie on event_id)
    ]
    rows = [(e, t, 5, "view", c) for e, t, c in quotes]
    sf_dir = _write_events(spark, tmp_path, rows)

    srt = _ordered_cents(rows)
    expected = {}
    for (e0, t0, _, _, v0), (e1, t1, _, _, v1) in zip(srt, srt[1:]):
        t0, t1 = t0, t1
        for g in range(t0 // W + 1, t1 // W + 1):
            gt = g * W
            expected[gt] = (v0 * (t1 - gt) + v1 * (gt - t0)) // (t1 - t0)
    got = {
        r.grid_ts_us: r.interp_cents
        for r in linear_interp_resample(spark, sf_dir).collect()
    }
    assert got == expected


def test_streaming_tick_rule_flow_bit_identical_to_batch(spark, tmp_path):
    """The streaming twin's whole claim: after the replayed stream
    drains, the landed hourly flow table equals batch tick_rule_flow on
    the same events BIT-FOR-BIT — the cross-batch LAG state must make
    chunk boundaries invisible. The tape spans multiple replay chunks
    (4) and multiple hourly buckets, with ties and flat runs."""
    from financial_arbitrage_data_pipeline_spark.operators.streaming_queries import (
        streaming_tick_rule_flow,
    )
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        tick_rule_flow,
    )

    rows = []
    eid = 0
    for u in (3, 9):
        for i in range(50):
            cents = 100 + ((5 * i * i + u) % 24) - 12
            if 20 <= i < 24:
                cents = 107  # flat run
            ts = TS0 + i * 200_000_000 + (u % 2) * 0  # crosses hour buckets
            rows.append((eid, ts, u, "view", cents))
            eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)

    batch = {
        (r.user_id, r.bucket_start_us): (r.n_up, r.n_down, r.n_flat, r.flow)
        for r in tick_rule_flow(spark, sf_dir).collect()
    }
    streamed = {
        (r.user_id, r.bucket_start_us): (r.n_up, r.n_down, r.n_flat, r.flow)
        for r in streaming_tick_rule_flow(spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(batch) > 2  # multiple buckets actually exercised
