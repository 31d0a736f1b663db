"""Unit + property tests for the transform-/entropy-coded codecs
(`operators/transcode.py`): baseline JPEG (T.81), G.711 mu-law, and the
YDLT temporal-delta video codec. These exercise the codec layer directly
(no Spark needed); the Spark lanes are covered by the registry-wide
oracle parity gate."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from financial_arbitrage_data_pipeline_spark.operators.transcode import (
    _AC_BITS,
    _AC_HUFFVAL,
    _DC_BITS,
    _DC_HUFFVAL,
    ZIGZAG,
    _canonical_codes,
    _jpeg_dims,
    _ydelta_frames,
    decode_jpeg,
    decode_ulaw_wav,
    decode_ydelta,
    dct_quantize,
    encode_jpeg_from_coeffs,
    encode_jpeg_gray,
    encode_ydelta,
    quant_table,
    synthesize_jpeg,
    synthesize_ulaw_wav,
    ulaw_decode,
    ulaw_encode,
)

# ---------------------------------------------------------------------------
# JPEG: coding-table invariants
# ---------------------------------------------------------------------------


def test_zigzag_is_the_standard_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    # first anti-diagonals of T.81 Figure 5
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]


@pytest.mark.parametrize(
    "bits,huffval,nsyms",
    [(_DC_BITS, _DC_HUFFVAL, 12), (_AC_BITS, _AC_HUFFVAL, 162)],
    ids=["dc", "ac"],
)
def test_huffman_tables_are_valid_canonical_codes(bits, huffval, nsyms):
    assert len(huffval) == nsyms == sum(bits)
    assert len(bits) == 16  # DHT BITS array, lengths 1..16
    kraft = sum(n * 2 ** -(i + 1) for i, n in enumerate(bits))
    assert kraft < 1.0  # strictly incomplete: reserved code point dropped
    codes = _canonical_codes(bits, huffval)
    # prefix-free: expand every code to a disjoint 16-bit interval
    spans = sorted((c << (16 - l), (c + 1) << (16 - l)) for c, l in codes.values())
    for (_, hi), (lo2, _) in zip(spans, spans[1:]):
        assert hi <= lo2
    # genuinely variable-length (not a fixed-width table in disguise)
    lengths = {l for _, l in codes.values()}
    assert len(lengths) >= 4
    assert max(lengths) <= 16


# ---------------------------------------------------------------------------
# JPEG: entropy-layer exactness + pixel-path bound
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(1, 3),
    bh=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
    density=st.floats(0.0, 0.9),
)
def test_jpeg_coefficients_roundtrip_exactly(bw, bh, seed, density):
    rng = np.random.RandomState(seed)
    nb = bw * bh
    coeffs = np.zeros((nb, 64), dtype=np.int64)
    coeffs[:, 0] = rng.randint(-900, 900, nb)
    mask = rng.rand(nb, 63) < density
    coeffs[:, 1:] = np.where(mask, rng.randint(-1023, 1024, (nb, 63)), 0)
    payload = encode_jpeg_from_coeffs(coeffs, bw * 8, bh * 8, quant_table(85))
    d = decode_jpeg(payload)
    assert (d["width"], d["height"], d["n_blocks"]) == (bw * 8, bh * 8, nb)
    assert d["quant"] == [quant_table(85)[z] for z in ZIGZAG]
    assert np.array_equal(d["coeffs"], coeffs)


@settings(max_examples=20, deadline=None)
@given(bw=st.integers(1, 3), bh=st.integers(1, 2), seed=st.integers(0, 2**31 - 1))
def test_jpeg_quality100_pixel_error_bounded(bw, bh, seed):
    """With an all-ones quant table the only loss is DCT coefficient
    rounding; the L-inf reconstruction error is provably <= 9
    (64 coeffs x 0.5 rounding x 0.25 basis amplitude + output rounding).
    Empirically it is ~1-2."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (bh * 8, bw * 8)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg_gray(img, quality=100))
    err = np.abs(d["pixels"].astype(int) - img.astype(int)).max()
    assert err <= 9


def test_jpeg_dct_quantize_shape_and_dc():
    img = np.full((8, 16), 200, dtype=np.uint8)
    zz = dct_quantize(img, quant_table(100))
    assert zz.shape == (2, 64)
    # flat block: all energy in DC = 8 * (200 - 128) = 576, zero AC
    assert list(zz[0, 1:]) == [0] * 63
    assert zz[0, 0] == 576


def test_jpeg_byte_stuffing_occurs_and_decodes():
    """At least one synthesized asset's scan must contain a stuffed
    0xFF 0x00 pair, and every one of them still decodes exactly."""
    stuffed = 0
    for aid in range(0, 300, 3):
        payload = synthesize_jpeg(aid)
        body = payload[2:-2]
        stuffed += body.count(b"\xff\x00")
        d = decode_jpeg(payload)
        w, h = _jpeg_dims(aid)
        assert (d["width"], d["height"]) == (w, h)
    assert stuffed > 0


def test_jpeg_decoder_diagnostics():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    good = synthesize_jpeg(3)
    with pytest.raises(ValueError, match="EOI|truncated|stream"):
        decode_jpeg(good[:-4])
    # progressive SOF2 must be rejected, not mis-decoded
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(bad))


# ---------------------------------------------------------------------------
# G.711 mu-law
# ---------------------------------------------------------------------------


def test_ulaw_codec_idempotent_on_code_lattice():
    """encode(decode(u)) == u for every code word except negative zero
    (0x7F), which decodes to 0 and re-encodes as positive zero 0xFF —
    the classic mu-law two-zeros property."""
    codes = np.arange(256, dtype=np.uint8)
    re = ulaw_encode(ulaw_decode(codes))
    mismatch = np.where(re != codes)[0]
    assert list(mismatch) == [0x7F]
    assert re[0x7F] == 0xFF


def test_ulaw_matches_scalar_reference():
    def ref_encode(s: int) -> int:
        sign = 0x80 if s < 0 else 0
        s = min(abs(s), 32635) + 0x84
        exp = s.bit_length() - 8
        mant = (s >> (exp + 3)) & 0x0F
        return ~(sign | (exp << 4) | mant) & 0xFF

    samples = np.arange(-32768, 32768, 257)
    got = ulaw_encode(samples)
    assert [ref_encode(int(s)) for s in samples] == list(got)


@settings(max_examples=50, deadline=None)
@given(s=st.integers(-32768, 32767))
def test_ulaw_error_bounded_by_segment_step(s):
    dec = int(ulaw_decode(ulaw_encode([s]))[0])
    mag = min(abs(s), 32635)
    exp = max(0, (mag + 0x84).bit_length() - 8)
    assert abs(dec - s) <= max(8 << exp, abs(s) - 32635 + 1024)
    assert (dec >= 0) == (s >= 0) or dec == 0


def test_ulaw_wav_container_roundtrip_and_diagnostics():
    stats = decode_ulaw_wav(synthesize_ulaw_wav(11))
    assert stats["sample_rate"] == 8000
    assert stats["n_samples"] == 256 + 11 % 64
    with pytest.raises(ValueError, match="RIFF"):
        decode_ulaw_wav(b"nope")
    # a PCM (fmt 1) wav must be rejected by the mu-law lane
    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        synthesize_wav,
    )

    with pytest.raises(ValueError, match="8 bits|fmt"):
        decode_ulaw_wav(synthesize_wav(7))


# ---------------------------------------------------------------------------
# YDLT temporal-delta video
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    nf=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_ydelta_roundtrip_exact(w, h, nf, seed):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, (nf, h, w)).astype(np.uint8)
    d = decode_ydelta(encode_ydelta(frames))
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, nf)
    assert np.array_equal(d["frames"], frames)


def test_ydelta_compresses_the_formula_stream():
    """The generator's constant temporal gradient must actually compress
    (that is the point of delta prediction + DEFLATE)."""
    frames = _ydelta_frames(21)
    payload = encode_ydelta(frames)
    assert len(payload) < frames.size
    d = decode_ydelta(payload)
    assert d["compressed_ratio_x1000"] > 1000


def test_ydelta_diagnostics():
    with pytest.raises(ValueError, match="magic"):
        decode_ydelta(b"XXXX rest")
    good = encode_ydelta(_ydelta_frames(4))
    bad = good[:10] + __import__("zlib").compress(b"\x00" * 3)
    with pytest.raises(ValueError, match="size mismatch"):
        decode_ydelta(bad)


# ---------------------------------------------------------------------------
# Decoder robustness: arbitrary garbage must fail with the parser's own
# ValueError (or decode successfully) — never hang, never leak another
# exception type out of the kernel
# ---------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(junk=st.binary(min_size=0, max_size=400))
def test_decoders_fail_closed_on_garbage(junk):
    for dec in (decode_jpeg, decode_ulaw_wav, decode_ydelta):
        try:
            dec(junk)
        except (ValueError, IndexError):
            pass  # a diagnostic rejection is the contract


@settings(max_examples=40, deadline=None)
@given(flip=st.integers(2, 200), junk=st.binary(min_size=1, max_size=8))
# pinned: this junk lands in the DHT and maps a Huffman code to a 64-bit
# DC size; pre-guard it overflowed the int64 coefficient store
@example(flip=126, junk=b"\x00@")
# pinned (r9): this junk lands in the SOF0 width field (0x0010 -> 0x0001);
# pre-guard the decoder returned an incoherent width-1 "frame" (0 blocks)
# instead of rejecting a header that violates the encoder's own %8 rule
@example(flip=95, junk=b"\x01")
def test_jpeg_decoder_survives_mid_stream_corruption(flip, junk):
    good = synthesize_jpeg(9)
    pos = flip % (len(good) - 4) + 2
    bad = good[:pos] + junk + good[pos + len(junk):]
    try:
        d = decode_jpeg(bad)
        assert d["width"] % 8 == 0  # if it decodes, the frame is coherent
    except (ValueError, IndexError):
        pass


def test_jpeg_encoder_rejects_out_of_range_magnitudes():
    big_dc = np.zeros((1, 64), dtype=np.int64)
    big_dc[0, 0] = 5000  # DC diff category 13 > the table's 11
    with pytest.raises(ValueError, match="DC difference"):
        encode_jpeg_from_coeffs(big_dc, 8, 8)
    big_ac = np.zeros((1, 64), dtype=np.int64)
    big_ac[0, 3] = 2000  # AC category 11 > the run/size tables' 10
    with pytest.raises(ValueError, match="AC coefficient"):
        encode_jpeg_from_coeffs(big_ac, 8, 8)


def test_gif_lzw_roundtrip_and_generic_dispatch():
    """The GIF87a/LZW codec: full-file round trip (variable-width codes,
    sub-block framing, palette indirection), KwKwK + dict-reset paths,
    and the generic feature lane routing GIF payloads to the real
    decoder — with a mis-sniffed 'GIF87a'-prefixed text payload taking
    the documented fallback."""
    import random

    from financial_arbitrage_data_pipeline_spark.operators import multimodal as M
    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        synthesize_gif,
    )

    rnd = random.Random(11)
    for _ in range(50):
        data = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 4000)))
        assert _lzw_decode(_lzw_encode(data)) == data
    # dict growth past every width boundary + the reset path
    big = bytes((i * i) % 256 for i in range(40000))
    assert _lzw_decode(_lzw_encode(big)) == big

    payload = synthesize_gif(9)
    d = decode_gif(payload)
    w, h = 16 + 9 % 8, 8 + 9 % 5
    exp = [(9 * 31 + k * 17) % 256 for k in range(w * h)]
    assert list(d["indices"]) == exp
    assert d["r_sum"] == sum(exp)
    assert d["g_sum"] == sum((x * 7) % 256 for x in exp)

    f = M.decode_features(payload)
    assert f["format"] == "gif"
    assert f["n_units"] == 3 * w * h
    assert f["sum_values"] == d["r_sum"] + d["g_sum"] + d["b_sum"]
    assert f["peak"] == d["peak_channel"]

    g = M.decode_features(b"GIF87a but actually just prose")
    assert g["format"] == "unknown" and g["sum_values"] is None


# ---------------------------------------------------------------------------
# r9 header-coherence audit: every decoder must reject a corrupted header
# that would otherwise yield an incoherent frame (zero/negative dims, a
# sample count overrunning the data chunk) — the JPEG SOF0 class, audited
# across the sibling codecs.
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(flip=st.integers(0, 4000), junk=st.binary(min_size=1, max_size=8))
def test_sibling_decoders_reject_incoherent_headers(flip, junk):
    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        decode_adpcm_wav,
        decode_gif,
        synthesize_adpcm_wav,
        synthesize_gif,
    )

    cases = [
        (encode_ydelta(_ydelta_frames(7)), decode_ydelta,
         lambda d: d["width"] > 0 and d["height"] > 0 and d["n_frames"] > 0),
        (synthesize_gif(7), decode_gif,
         lambda d: d["width"] > 0 and d["height"] > 0),
        (synthesize_adpcm_wav(7), decode_adpcm_wav,
         lambda d: d["n_samples"] > 0),
    ]
    for good, dec, coherent in cases:
        pos = flip % (len(good) - 4) + 2
        bad = good[:pos] + junk + good[pos + len(junk):]
        try:
            d = dec(bad)
            assert coherent(d)  # if it decodes, the frame is coherent
        except (ValueError, IndexError, KeyError, __import__("zlib").error):
            pass  # a diagnostic rejection is the contract


def test_header_coherence_guards_fire_directly():
    """Pin each r9 guard with a handcrafted incoherent header."""
    import zlib as _z

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _parse_y4m,
        sample_frames_y4m,
    )
    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        decode_adpcm_wav,
        decode_gif,
        synthesize_adpcm_wav,
        synthesize_gif,
    )

    # JPEG: zero a SOF0 dim in a real stream
    good = synthesize_jpeg(3)
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    bad = bytearray(good)
    bad[sof + 7 : sof + 9] = b"\x00\x01"  # width 16 -> 1
    with pytest.raises(ValueError, match="SOF0 dimensions"):
        decode_jpeg(bytes(bad))

    # YDLT: zero-width header over an empty (consistent!) stream
    with pytest.raises(ValueError, match="incoherent dimensions"):
        decode_ydelta(b"YDLT" + (0).to_bytes(2, "big") + (4).to_bytes(2, "big")
                      + (2).to_bytes(2, "big") + _z.compress(b""))

    # GIF: zero-dim image descriptor (handcrafted minimal container —
    # scanning a synthesized payload for 0x2C can hit a palette byte)
    g = (
        b"GIF87a" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + bytes([0x80, 0, 0])        # global palette, 2 entries
        + bytes(6)                   # the palette
        + b"\x2c" + bytes(4)         # image descriptor at (0, 0)
        + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")  # w=h=0
        + bytes([0])                 # local flags
    )
    with pytest.raises(ValueError, match="incoherent image descriptor"):
        decode_gif(g)

    # ADPCM: fact chunk declaring more samples than the data chunk holds
    a = bytearray(synthesize_adpcm_wav(3))
    fact = a.find(b"fact")
    a[fact + 8 : fact + 12] = (10**6).to_bytes(4, "little")
    with pytest.raises(ValueError, match="nibble bytes"):
        decode_adpcm_wav(bytes(a))

    # y4m: negative W tag is truthy — must still be rejected (both parsers)
    hdr = b"YUV4MPEG2 W-4 H4 C444\n"
    with pytest.raises(ValueError, match="bad dimensions"):
        _parse_y4m(hdr + b"FRAME\n")
    with pytest.raises(ValueError, match="bad dimensions"):
        sample_frames_y4m(hdr + b"FRAME\n")
