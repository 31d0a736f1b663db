"""Hypothesis property tests for the pure Python kernels and the
engine-independent hash constructions (fast: no Spark involved)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from financial_arbitrage_data_pipeline_spark.operators.dedup import MINHASH_MOD
from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    fake_decode_features,
    fake_resize,
)
from financial_arbitrage_data_pipeline_spark.operators.similarity import plane_weights
from financial_arbitrage_data_pipeline_spark.streaming.scan import _decide


@given(st.binary(max_size=2048), st.integers(1, 64), st.integers(1, 64))
def test_fake_resize_size_is_pure_function_of_dims(payload, w, h):
    out = fake_resize(payload, w, h)
    assert len(out) == w * h
    assert out == fake_resize(payload, w, h)


@given(st.binary(max_size=2048))
def test_fake_decode_features_bounds(payload):
    f = fake_decode_features(payload)
    assert f["n_bytes"] == len(payload)
    assert 0 <= f["crc32"] <= 0xFFFFFFFF
    assert 0.0 <= f["brightness"] <= 1.0


@given(st.binary(min_size=1, max_size=4096))
def test_frame_arithmetic_matches_kernel_oracle(payload):
    """The octet_length arithmetic used in the video_frame_sample oracle
    must equal actual chunk/stride behavior for every payload length."""
    frames = [payload[i : i + FRAME_BYTES] for i in range(0, len(payload), FRAME_BYTES)]
    sampled = frames[::FRAME_STRIDE]
    n = len(payload)
    nf = (n + FRAME_BYTES - 1) // FRAME_BYTES
    ns = (nf + FRAME_STRIDE - 1) // FRAME_STRIDE
    last_len = n - FRAME_BYTES * (nf - 1)
    sb = ns * FRAME_BYTES - ((FRAME_BYTES - last_len) if (nf - 1) % FRAME_STRIDE == 0 else 0)
    assert (len(frames), len(sampled), sum(len(f) for f in sampled)) == (nf, ns, sb)


@settings(max_examples=25)
@given(st.text(min_size=1, max_size=40), st.integers(0, 15))
def test_minhash_double_hash_fits_int64(shingle, i):
    """(h1%M + i*(h2%M)) % M never overflows and is deterministic."""
    d = hashlib.md5(shingle.encode()).hexdigest()
    h1 = int(d[:15], 16) % MINHASH_MOD
    h2 = int(d[15:30], 16) % MINHASH_MOD
    v = h1 + i * h2
    assert v < 2**63
    assert 0 <= v % MINHASH_MOD < MINHASH_MOD


def test_plane_weights_stable():
    w1, w2 = plane_weights(4, 8), plane_weights(4, 8)
    assert w1 == w2
    assert all(-(2**31) <= x < 2**31 for row in w1 for x in row)


@given(
    st.floats(0.01, 0.99),
    st.floats(0.01, 0.99),
    st.floats(0.01, 0.99),
    st.floats(0.01, 0.99),
)
def test_scan_decision_margin_invariants(k_yes, k_no, p_yes, p_no):
    """_decide either declines or returns a margin above threshold with a
    consistent side selection."""
    state = (k_yes, k_no, 1000, 1, p_yes, p_no, 2000, 2)
    has, typ, kp, pp, margin = _decide(state, freshness_us=10_000, threshold=0.02)
    if has:
        assert margin > 0.02
        assert (kp - pp) / pp == margin
        if typ == "kalshi_yes_polymarket_no":
            assert (kp, pp) == (k_yes, p_yes)
        else:
            assert (kp, pp) == (k_no, p_no)
    else:
        my = (k_yes - p_yes) / p_yes if p_yes < k_yes else None
        mn = (k_no - p_no) / p_no if p_no < k_no else None
        best = max([m for m in (my, mn) if m is not None], default=None)
        assert best is None or best <= 0.02


def test_ngram_span_column_matches_python_reference(spark):
    """Property: the in-row gram builder equals the obvious Python
    n-gram reference for arbitrary token sequences (including docs
    shorter than n, repeated tokens, single-char tokens)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from financial_arbitrage_data_pipeline_spark.operators.corpusprep import (
        ngram_span_column,
    )

    token = st.text(alphabet="abcxyz", min_size=1, max_size=3)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(token, min_size=0, max_size=14), st.integers(2, 5))
    def check(tokens, n):
        text = " ".join(tokens)
        expected = [
            " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
        ]
        row = (
            spark.createDataFrame([(text,)], "text string")
            .select(ngram_span_column(n).alias("grams"))
            .first()
        )
        assert row.grams == expected

    check()
