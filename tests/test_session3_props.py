"""Python brute-force property pins for the round-7 session-3 operators
(effective spread decomposition, spread mean reversion, Theil-Sen trend,
quote-stuffing bursts, IMA-ADPCM): each must equal a direct recomputation
of its declared formula on crafted adversarial tapes (same-microsecond
quote/trade ties, midpoint trades, fat-finger outliers, burst clumps).
The DuckDB parity suite proves Spark == oracle; these prove both == the
formula — the guard against 'both engines wrong the same way'."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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


def test_effective_spread_matches_bruteforce(spark, tmp_path):
    """Quote/trade ties at the same µs (quote must win), a midpoint
    trade (sgn 0 — costs cancel), and an end-of-tape trade with no
    forward quote (excluded, not extrapolated)."""
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        _SPREAD_HORIZON_US,
        effective_spread_metrics,
    )

    u = 3
    rows = [
        (0, TS0, u, "view", 100),                       # quote 100
        (1, TS0 + 1_000_000, u, "purchase", 104),       # trade above mid
        (2, TS0 + 1_000_000, u, "view", 102),           # same-µs... quote at trade µs
        (3, TS0 + 2_000_000, u, "purchase", 102),       # midpoint trade (mid=102)
        (4, TS0 + 400_000_000, u, "view", 95),          # fwd quote past 5m
        (5, TS0 + 401_000_000, u, "purchase", 90),      # below-mid trade
        (6, TS0 + 900_000_000, u, "view", 97),          # its fwd quote
        (7, TS0 + 950_000_000, u, "purchase", 98),      # no fwd quote -> excluded
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["pair_key"]: r
        for r in effective_spread_metrics(spark, sf_dir).toPandas().to_dict("records")
    }

    # brute force: replay the union semantics directly
    quotes = sorted((t, e, c) for e, t, uu, ty, c in rows if ty == "view")
    trades = sorted((t, e, c) for e, t, uu, ty, c in rows if ty == "purchase")
    s_eff = s_real = s_imp = n = 0
    for t, _, px in trades:
        past = [c for (qt, qe, c) in quotes if qt <= t]  # quotes sort before trades at ties
        fwd = [c for (qt, qe, c) in sorted(quotes) if qt >= t + _SPREAD_HORIZON_US]
        if not past or not fwd:
            continue
        mid, f = past[-1], fwd[0]
        sgn = 1 if px > mid else (-1 if px < mid else 0)
        n += 1
        s_eff += 2 * abs(px - mid)
        s_real += 2 * sgn * (px - f)
        s_imp += 2 * sgn * (f - mid)
    assert got[u]["n_trades"] == n == 3
    assert got[u]["s_eff"] == s_eff
    assert got[u]["s_real"] == s_real
    assert got[u]["s_impact"] == s_imp
    assert s_eff == s_real + s_imp  # the Huang-Stoll identity, exactly


def test_theil_sen_robust_where_ols_is_not(spark, tmp_path):
    """A clean +2c/hour trend with ONE fat-finger quote: the median
    slope must equal the true trend exactly while OLS is dragged."""
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        theil_sen_trend,
    )

    u = 5
    rows = []
    for i in range(12):
        cents = 10 + 2 * i  # px = cents % 97 + 1 = 11 + 2i for cents < 97
        if i == 6:
            cents = 90  # fat finger: one wild quote
        rows.append((i, TS0 + i * 3_600_000_000, u, "view", cents))
    sf_dir = _write_events(spark, tmp_path, rows)
    out = theil_sen_trend(spark, sf_dir).toPandas()
    row = out[out.pair_key == u].iloc[0]
    # brute force
    pts = [(i, (10 + 2 * i if i != 6 else 90) % 97 + 1) for i in range(12)]
    slopes = sorted(
        (p2 - p1) / (h2 - h1) for (h1, p1) in pts for (h2, p2) in pts if h2 > h1
    )
    med = slopes[(len(slopes) + 1) // 2 - 1]
    assert row["theil_slope"] == med == 2.0  # immune to the outlier
    assert abs(row["ols_slope"] - 2.0) > 0.05  # OLS is not


def test_spread_mean_reversion_matches_ar1_formula(spark, tmp_path):
    """A crafted both-venue daily spread with known reversion: the
    regression moments and ar_beta must equal the direct formula."""
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        _MR_BUCKET_US,
        spread_mean_reversion,
    )

    u = 9
    spreads = [10, 4, 8, 2, 9, 3, 7]  # oscillating -> strong reversion
    rows = []
    for d, sp in enumerate(spreads):
        k_cents = 40 + sp  # k px = cents%97+1 = 41+sp
        p_cents = 40       # p px = cents%99+1 = 41
        rows.append((2 * d, TS0 + d * _MR_BUCKET_US, u, "view", k_cents))
        rows.append((2 * d + 1, TS0 + d * _MR_BUCKET_US + 1_000_000, u, "purchase", p_cents))
    sf_dir = _write_events(spark, tmp_path, rows)
    out = spread_mean_reversion(spark, sf_dir).toPandas()
    row = out[out.pair_key == u].iloc[0]
    xs = spreads[:-1]
    ys = [b - a for a, b in zip(spreads, spreads[1:])]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    assert (row["n_steps"], row["sx"], row["sy"], row["sxx"], row["sxy"]) == (
        n, sx, sy, sxx, sxy,
    )
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["ar_beta"] == beta
    assert beta < -1.0  # oscillation: over-reverting spread


def test_quote_stuffing_counts_match_bruteforce(spark, tmp_path):
    """A clumped tape: 5 messages inside one 4h window then silence —
    max burst, burst ticks, and the Fano numerator must match a direct
    recount (non-empty hourly buckets only, as documented)."""
    from financial_arbitrage_data_pipeline_spark.operators.timeseries import (
        _QS_BUCKET_US,
        _QS_BURST_MIN,
        _QS_WINDOW_US,
        quote_stuffing_bursts,
    )

    u = 4
    ts_list = [0, 600, 1200, 1800, 2400, 90_000, 180_000]  # seconds
    rows = [
        (i, TS0 + s * 1_000_000, u, "click", 50) for i, s in enumerate(ts_list)
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = quote_stuffing_bursts(spark, sf_dir).toPandas()
    row = out[out.pair_key == u].iloc[0]
    us = [TS0 + s * 1_000_000 for s in ts_list]
    wins = [sum(1 for t2 in us if t - _QS_WINDOW_US + 1 <= t2 <= t) for t in us]
    hours = {}
    for t in us:
        hours[t // _QS_BUCKET_US] = hours.get(t // _QS_BUCKET_US, 0) + 1
    n_h = len(hours)
    sc = sum(hours.values())
    sc2 = sum(c * c for c in hours.values())
    assert row["n_msgs"] == len(us)
    assert row["max_burst"] == max(wins) == 5
    assert row["burst_ticks"] == sum(1 for w in wins if w >= _QS_BURST_MIN) == 2
    assert row["n_active_hours"] == n_h
    assert row["fano_num"] == n_h * sc2 - sc * sc
    assert row["fano_den"] == n_h * sc


# ---------------------------------------------------------------------------
# IMA-ADPCM: the decoder against an independent scalar reference
# ---------------------------------------------------------------------------
_STEPS = None
_IDX8 = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ref_tables():
    global _STEPS
    if _STEPS is None:
        from financial_arbitrage_data_pipeline_spark.operators.transcode import (
            _ADPCM_STEPS,
        )
        _STEPS = list(_ADPCM_STEPS)
    return _STEPS


def _ref_encode(samples):
    """Independent scalar IMA encoder (per the IMA ADPCM reference
    algorithm): returns (nibbles, reconstruction)."""
    steps = _ref_tables()
    pred, idx = int(samples[0]), 0
    recon = [pred]
    nibs = []
    for s in samples[1:]:
        step = steps[idx]
        diff = int(s) - pred
        sign = 8 if diff < 0 else 0
        diff = abs(diff)
        code = 0
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        code |= sign
        dq = step >> 3
        if code & 4:
            dq += step
        if code & 2:
            dq += step >> 1
        if code & 1:
            dq += step >> 2
        pred = pred - dq if sign else pred + dq
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IDX8[code & 7]))
        nibs.append(code)
        recon.append(pred)
    return nibs, recon


def _container(first, nibs, n):
    """Minimal fmt(0x11)+fact+data WAV around externally encoded nibbles."""
    pad = nibs + ([0] if len(nibs) % 2 else [])
    packed = bytes(pad[i] | (pad[i + 1] << 4) for i in range(0, len(pad), 2))
    block = (first & 0xFFFF).to_bytes(2, "little") + bytes([0, 0]) + packed
    fmt = (
        (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (4055).to_bytes(4, "little")
        + len(block).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + (n & 0xFFFF).to_bytes(2, "little")
    )

    def chunk(cid, body):
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) % 2 else b"")

    payload = (
        b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"fact", n.to_bytes(4, "little"))
        + chunk(b"data", block)
    )
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 200),
)
def test_adpcm_decoder_matches_reference_on_random_signals(seed, n):
    """decode_adpcm_wav must reproduce the reference reconstruction for
    ARBITRARY signals (not just the formula assets): encode with the
    test's independent scalar encoder, wrap in a container, decode."""
    import random

    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        decode_adpcm_wav,
    )

    rng = random.Random(seed)
    samples = [rng.randint(-32768, 32767) for _ in range(n)]
    nibs, recon = _ref_encode(samples)
    stats = decode_adpcm_wav(_container(samples[0], nibs, n))
    r = np.array(recon, dtype=np.int64)
    assert stats["n_samples"] == n
    assert stats["peak_abs"] == int(np.abs(r).max())
    assert stats["sum_sq"] == int((r * r).sum())
    assert stats["sum_val"] == int(r.sum())


def test_adpcm_synthesizer_roundtrips_through_decoder():
    """The formula assets: synthesize -> decode must equal the reference
    encode-decode reconstruction sample-statistics exactly."""
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        _adpcm_src,
        decode_adpcm_wav,
        synthesize_adpcm_wav,
    )

    for aid in (2, 5, 17, 62, 4999):
        src = [int(x) for x in _adpcm_src(aid)]
        _, recon = _ref_encode(src)
        r = np.array(recon, dtype=np.int64)
        stats = decode_adpcm_wav(synthesize_adpcm_wav(aid))
        assert stats["n_samples"] == len(src)
        assert stats["peak_abs"] == int(np.abs(r).max())
        assert stats["sum_sq"] == int((r * r).sum())
        assert stats["sum_val"] == int(r.sum())


def test_adpcm_malformed_container_raises():
    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        decode_adpcm_wav,
    )

    with pytest.raises(ValueError):
        decode_adpcm_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")
    with pytest.raises(ValueError):
        decode_adpcm_wav(b"not a riff at all")


# ---------------------------------------------------------------------------
# Adam7 interlaced PNG: layout is pure permutation — pixels must be exact
# ---------------------------------------------------------------------------
@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    seed=st.integers(0, 2**31 - 1),
)
def test_adam7_roundtrip_exact_any_geometry(w, h, seed):
    """Sequential and Adam7 encodings of the same image must decode to
    identical pixels for ANY geometry — including sizes where entire
    Adam7 passes are empty (w or h below the pass stride)."""
    import random

    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators import multimodal as mm

    rng = random.Random(seed)
    img = np.array(
        [[[rng.randint(0, 255) for _ in range(3)] for _ in range(w)] for _ in range(h)],
        dtype=np.uint8,
    )
    filters = [rng.randint(0, 4) for _ in range(h)]
    _, _, seq = mm._parse_png(mm.encode_png(img, filters=filters))
    _, _, il = mm._parse_png(mm.encode_png_adam7(img, filters=filters))
    assert (seq == img).all()
    assert (il == img).all()


def test_adam7_truncated_pass_stream_raises():
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators import multimodal as mm

    img = np.arange(9 * 9 * 3, dtype=np.uint8).reshape(9, 9, 3)
    payload = bytearray(mm.encode_png_adam7(img))
    # corrupt the IDAT length by rebuilding with a truncated stream:
    # decode of a truncated inflate output must fail loudly, not wrap
    import struct
    import zlib as _z

    sig = payload[:8]
    pos = 8
    chunks = []
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        chunks.append((bytes(tag), bytes(body)))
        pos += 12 + ln
    out = bytes(sig)
    for tag, body in chunks:
        if tag == b"IDAT":
            body = _z.compress(_z.decompress(body)[:-7], 6)
        out += mm._png_chunk(tag, body)
    with pytest.raises(ValueError):
        mm._parse_png(out)
