"""Unit tests for the training-data operators (dedup / similarity /
multimodal libraries) beyond what the oracle-parity suite covers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators import multimodal, similarity
from financial_arbitrage_data_pipeline_spark.operators.dedup import (
    band_signatures,
    with_minhash,
    with_shingles,
)


def test_shingles_are_word_trigrams(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    row = with_shingles(df).first()
    assert sorted(row.shingles) == ["a b c", "b c d"]


def test_identical_docs_share_all_band_signatures(spark):
    df = spark.createDataFrame(
        [(1, "x y z w v u t s r q"), (2, "x y z w v u t s r q")],
        "doc_id long, text string",
    )
    bands = band_signatures(with_minhash(with_shingles(df)))
    # each band signature appears for both docs
    counts = bands.groupBy("band_id", "band_sig").count().collect()
    assert all(r["count"] == 2 for r in counts)


def test_different_docs_differ_somewhere(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg"), (2, "zz yy xx ww vv uu tt")],
        "doc_id long, text string",
    )
    bands = band_signatures(with_minhash(with_shingles(df)))
    counts = bands.groupBy("band_id", "band_sig").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_quantized_dot_matches_numpy(spark):
    a = [0.5, -0.25, 0.125]
    b = [1.0, 0.5, -0.5]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        similarity.dot_ll(
            similarity.quantized("a"), similarity.quantized("b")
        ).alias("dot")
    ).first()
    assert row.dot == 500 * 1000 + (-250) * 500 + 125 * (-500)


def test_cosine_identity(spark):
    v = [0.1, 0.2, 0.3, 0.4]
    df = spark.createDataFrame([(v,)], "v array<float>")
    q = similarity.quantized("v")
    row = df.select(
        similarity.cosine_from_ints(
            similarity.dot_ll(q, q), similarity.sq_norm(q), similarity.sq_norm(q)
        ).alias("c")
    ).first()
    assert math.isclose(row.c, 1.0, rel_tol=1e-12)


def test_rh_lsh_bucket_deterministic_and_groups_identical_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.5, 0.25, 0.1]), (2, [0.5, -0.5, 0.25, 0.1]), (3, [-0.9, 0.8, -0.7, 0.6])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.rh_lsh_signatures(df, n_planes=8).collect()
    buckets = {r.vec_id: r.lsh_bucket for r in out}
    assert buckets[1] == buckets[2]
    # deterministic across runs
    again = {r.vec_id: r.lsh_bucket for r in similarity.rh_lsh_signatures(df, n_planes=8).collect()}
    assert buckets == again


def test_decoders_reject_garbage(spark):
    # all three modality decoders are real parsers now — garbage gets a
    # descriptive ValueError, not a NotImplementedError stub
    with pytest.raises(ValueError):
        multimodal.decode_audio(b"xx")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"xx")
    with pytest.raises(ValueError):
        multimodal.decode_video(b"xx")
    # the transform kernels sit on the same parsers: same rejection
    with pytest.raises(ValueError):
        multimodal.resample_audio(b"xx", 16000)
    with pytest.raises(ValueError):
        multimodal.resize_image(b"xx", 4, 4)


def test_fake_decode_features_deterministic():
    f1 = multimodal.fake_decode_features(b"hello")
    f2 = multimodal.fake_decode_features(b"hello")
    assert f1 == f2
    assert f1["n_bytes"] == 5


def test_extract_features_batch_shape(spark):
    df = spark.createDataFrame(
        [(1, "image", b"abc"), (2, "audio", b"defg")],
        "asset_id long, media_type string, payload binary",
    )
    rows = {r.asset_id: r for r in multimodal.extract_features(df).collect()}
    assert rows[1].n_bytes == 3 and rows[2].n_bytes == 4
    # unrecognized payloads take the fallback: size-only features
    assert rows[1].format == "unknown" and rows[1].sum_values is None


def test_extract_features_dispatches_real_decoders(spark):
    """Magic-byte routing: each real container decodes with its own
    codec and the features equal a direct decoder call; an unknown
    payload falls back to size-only features."""
    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        synthesize_jpeg, synthesize_ulaw_wav,
    )

    payloads = {
        1: multimodal.synthesize_bmp(7),
        2: multimodal.synthesize_png(11),
        3: synthesize_jpeg(5),
        4: multimodal.synthesize_wav(9),
        5: multimodal.synthesize_y4m(3),
        6: synthesize_ulaw_wav(4),  # RIFF but fmt tag 7: mu-law branch
        7: b"not a media file",
    }
    df = spark.createDataFrame(
        [(k, "x", v) for k, v in payloads.items()],
        "asset_id long, media_type string, payload binary",
    )
    rows = {r.asset_id: r for r in multimodal.extract_features(df).collect()}
    assert {rows[k].format for k in (1, 2, 3)} == {"bmp", "png", "jpeg"}
    assert rows[4].format == "wav" and rows[6].format == "wav"
    assert rows[5].format == "y4m" and rows[7].format == "unknown"
    for aid, payload in payloads.items():
        expect = multimodal.decode_features(payload)
        got = rows[aid]
        assert got.n_units == expect["n_units"], aid
        assert got.sum_values == expect["sum_values"], aid
        assert got.peak == expect["peak"], aid
    # cross-check two formats against the raw decoders
    d = multimodal.decode_bmp(payloads[1])
    assert rows[1].sum_values == d["sum_b"] + d["sum_g"] + d["sum_r"]
    w = multimodal.decode_wav_pcm(payloads[4])
    assert (rows[4].n_units, rows[4].peak) == (w["n_samples"], w["peak_abs"])


def test_fake_resize_output_size_contract():
    assert len(multimodal.fake_resize(b"abc", 8, 4)) == 32
    assert len(multimodal.fake_resize(b"", 8, 4)) == 32
    assert multimodal.fake_resize(b"ab", 2, 2) == b"abab"


def test_resize_assets_batch(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"defgh")], "asset_id long, payload binary"
    )
    rows = {r.asset_id: r for r in multimodal.resize_assets(df, 4, 4).collect()}
    assert rows[1].n_bytes == 16 and rows[2].n_bytes == 16
    assert bytes(rows[1].payload) == (b"abc" * 6)[:16]


def test_resize_assets_dispatches_real_kernels(spark):
    """resize_any routes BMP/PNG to the real nearest-neighbor kernels
    (output stays a valid file of the same format); unknown payloads
    take the byte-tiling fake."""
    bmp, png = multimodal.synthesize_bmp(4), multimodal.synthesize_png(8)
    df = spark.createDataFrame(
        [(1, bmp), (2, png), (3, b"zz")], "asset_id long, payload binary"
    )
    rows = {
        r.asset_id: bytes(r.payload)
        for r in multimodal.resize_assets(df, 5, 3).collect()
    }
    assert rows[1] == multimodal.resize_image(bmp, 5, 3)
    assert rows[2] == multimodal.resize_png(png, 5, 3)
    d1, d2 = multimodal.decode_bmp(rows[1]), multimodal.decode_png(rows[2])
    assert (d1["width"], d1["height"]) == (5, 3)
    assert (d2["width"], d2["height"]) == (5, 3)
    # PNG resize picks pixels via src = (dst*in) div out on the formula
    w_in, h_in = multimodal._png_dims(8)
    expect = sum(
        multimodal._png_pixel(8, (x * w_in) // 5, (y * h_in) // 3, c)
        for x in range(5) for y in range(3) for c in range(3)
    )
    assert d2["sum_r"] + d2["sum_g"] + d2["sum_b"] == expect
    assert rows[3] == multimodal.fake_resize(b"zz", 5, 3)


def test_sample_frames_y4m_cuts_at_real_frame_boundaries():
    """Real y4m sampling: output is a valid y4m stream holding exactly
    frames 0, stride, 2*stride... of the input, bit-identical planes."""
    src = multimodal.synthesize_y4m(9)  # 4+2*(9%5)=12 wide... nf=2+9%4=3
    out = multimodal.sample_frames_y4m(src, stride=2)
    d_in, d_out = multimodal.decode_y4m(src), multimodal.decode_y4m(out)
    assert (d_out["width"], d_out["height"]) == (d_in["width"], d_in["height"])
    assert d_out["n_frames"] == (d_in["n_frames"] + 1) // 2
    # content check: sampled sums equal the formula over frames {0, 2}
    w, h, nf = multimodal._y4m_dims(9)
    expect_y = sum(
        int(multimodal._y4m_pixel(9, t, x, y, 0))
        for t in range(0, nf, 2) for y in range(h) for x in range(w)
    )
    assert d_out["sum_y"] == expect_y
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.sample_frames_y4m(b"not a stream", 2)


def test_sample_assets_dispatch_and_fallback(spark):
    y4m = multimodal.synthesize_y4m(5)
    blob = bytes(range(200))
    df = spark.createDataFrame(
        [(1, y4m), (2, blob)], "asset_id long, payload binary"
    )
    rows = {
        r.asset_id: bytes(r.payload)
        for r in multimodal.sample_assets(df, stride=2).collect()
    }
    assert rows[1] == multimodal.sample_frames_y4m(y4m, 2)
    # fallback: every 2nd 64-byte window, concatenated
    assert rows[2] == blob[0:64] + blob[128:192]


def test_sample_frames_stride_arithmetic(spark):
    payload = bytes(range(200))  # 4 frames of 64 (last=8 bytes)
    df = spark.createDataFrame([(1, payload)], "asset_id long, payload binary")
    r = multimodal.sample_frames(df).first()
    assert r.n_frames == 4       # 64+64+64+8
    assert r.n_sampled == 1      # frames[::4] -> frame 0
    assert r.sampled_bytes == 64


def test_ivf_kmeans_assignment_invariants(spark, sf_dir):
    """Every vector assigned exactly once, to one of <=K live clusters,
    with a nonnegative distance; and the assignment really is the argmin
    over the final centroids, spot-checked in plain Python for a sample
    of vectors (distance to EVERY centroid recomputed driver-side)."""
    from financial_arbitrage_data_pipeline_spark.operators.similarity import (
        KMEANS_K,
        trained_model,
    )
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    out = REGISTRY["ivf_kmeans_clusters"].builder(spark, sf_dir)
    rows = out.collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    assert all(r.dist >= 0 for r in rows)
    assert len({r.cluster_id for r in rows}) <= KMEANS_K

    assigned, centroids = trained_model(spark, sf_dir)
    cents = {r.cid: list(r.c) for r in centroids.collect()}
    sample = assigned.filter(F.col("vec_id") % 97 == 0).collect()
    assert sample
    for row in sample:
        dists = {
            cid: sum((a - b) ** 2 for a, b in zip(row.q, c))
            for cid, c in cents.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        assert (row.cid, row.dist) == best, row.vec_id


# ---------------------------------------------------------------------------
# Real WAV codec kernels (multimodal audio lane)
# ---------------------------------------------------------------------------
def test_wav_roundtrip_exact():
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _wav_params,
        decode_wav_pcm,
        synthesize_wav,
    )

    for aid in (1, 7, 100, 9999):
        n, rate = _wav_params(aid)
        stats = decode_wav_pcm(synthesize_wav(aid))
        assert stats["n_samples"] == n
        assert stats["sample_rate"] == rate
        i = np.arange(n, dtype=np.int64)
        x = (aid * 31 + i * 7) % 65536 - 32768
        assert stats["peak_abs"] == int(np.abs(x).max())
        assert stats["sum_sq"] == int((x * x).sum())


def test_wav_decoder_walks_unknown_chunks():
    """A LIST/INFO chunk before data (common in real WAV files) must be
    skipped by the chunk walker, including the odd-size pad byte."""
    import struct

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm,
        synthesize_wav,
    )

    wav = synthesize_wav(5)
    # splice an odd-sized junk chunk right after "WAVE"
    junk = b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"  # pad to even
    spliced = wav[:12] + junk + wav[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav_pcm(spliced) == decode_wav_pcm(wav)


def test_wav_decoder_rejects_garbage():
    import pytest as _pytest

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm,
    )

    with _pytest.raises(ValueError):
        decode_wav_pcm(b"not a wav file at all")


def test_wav_decoder_fuzz_roundtrip():
    """Property: ANY 16-bit mono PCM payload round-trips exactly through
    synthesize-shaped bytes → decode_wav_pcm (not just the generator
    formula's outputs)."""
    import struct

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm,
    )

    def build_wav(samples, rate):
        data = np.asarray(samples, dtype="<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        chunks = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
        st.sampled_from([8000, 16000, 22050, 44100]),
    )
    def check(samples, rate):
        stats = decode_wav_pcm(build_wav(samples, rate))
        arr = np.asarray(samples, dtype=np.int64)
        assert stats["sample_rate"] == rate
        assert stats["n_samples"] == len(samples)
        assert stats["peak_abs"] == (int(np.abs(arr).max()) if len(samples) else 0)
        assert stats["sum_sq"] == int((arr * arr).sum())

    check()


def test_wav_decoder_diagnoses_truncated_and_odd_data():
    """Round-5 hardening: the data-chunk size field is untrusted — a
    truncated body or an odd byte count must raise the parser's own
    descriptive ValueError, not a raw numpy frombuffer error."""
    import struct

    import pytest as _pytest

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm,
        synthesize_wav,
    )

    wav = synthesize_wav(3)
    # truncate: chop the last 10 payload bytes without touching the
    # declared data-chunk size
    with _pytest.raises(ValueError, match="truncated data chunk"):
        decode_wav_pcm(wav[:-10])

    # odd declared size: rewrite the data chunk header to an odd length
    data_at = wav.index(b"data")
    (declared,) = struct.unpack("<I", wav[data_at + 4 : data_at + 8])
    odd = wav[: data_at + 4] + struct.pack("<I", declared - 1) + wav[data_at + 8 :]
    with _pytest.raises(ValueError, match="not a multiple of 2"):
        decode_wav_pcm(odd)


# ---------------------------------------------------------------------------
# ADVICE r4 fixes: BPE short-doc guard, CMS band as in-suite (not gated)
# assertion, connected-components overflow guard
# ---------------------------------------------------------------------------
def test_adjacent_pairs_short_docs_yield_zero_pairs(spark):
    """Docs with 0 or 1 tokens must produce no pairs (and no runtime
    error from sequence(1, 0)'s descending-array trap)."""
    from financial_arbitrage_data_pipeline_spark.operators.textstats import (
        adjacent_token_pairs,
    )

    docs = spark.createDataFrame(
        [("",), ("one",), ("two words",), ("a b c",), (" ",)],
        "text string",
    )
    got = sorted(
        (r.a, r.b) for r in adjacent_token_pairs(docs).collect()
    )
    # "" → [""] (no pairs); "one" → 1 token; " " → ["", ""] pair filtered
    assert got == [("a", "b"), ("b", "c"), ("two", "words")]


def test_cms_band_holds_on_fixture(spark, sf_dir):
    """The probabilistic CMS epsilon band (overcount <= ceil(e/width*N))
    asserted on the FIXED fixture — deliberately in-suite rather than
    hash-gated, because the guarantee is w.p. >= 1 - e^-d per item, not
    deterministic (ADVICE r4)."""
    from financial_arbitrage_data_pipeline_spark.operators.textstats import (
        token_heavyhitters_cms,
    )

    df = token_heavyhitters_cms(spark, sf_dir)
    assert all(r.overestimates for r in df.collect())
    checks = token_heavyhitters_cms.last_band_check
    assert checks, "band-check telemetry missing"
    for token, freq, est, band in checks:
        assert est >= freq, (token, freq, est)
        assert est - freq <= band, (token, freq, est, band)


def test_connected_components_empty_graph_ok(spark):
    """Empty pair graph: NULL label sum with zero rows is the empty
    fixpoint, not an overflow — must return empty labels, not raise."""
    from financial_arbitrage_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


# ---------------------------------------------------------------------------
# Real BMP codec kernels (multimodal image lane)
# ---------------------------------------------------------------------------
def test_bmp_roundtrip_exact():
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _bmp_dims,
        _bmp_pixel,
        decode_bmp,
        synthesize_bmp,
    )

    for aid in (0, 3, 42, 9999):
        w, h = _bmp_dims(aid)
        stats = decode_bmp(synthesize_bmp(aid))
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        img = _bmp_pixel(aid, x, y, c).astype(np.int64)
        assert stats["width"] == w and stats["height"] == h
        assert stats["n_pixels"] == w * h
        assert stats["sum_b"] == int(img[:, :, 0].sum())
        assert stats["sum_g"] == int(img[:, :, 1].sum())
        assert stats["sum_r"] == int(img[:, :, 2].sum())
        assert stats["peak"] == int(img.max())


def test_bmp_decoder_handles_top_down_rows():
    """Negative height means top-down row order — stats must match the
    bottom-up encoding of the same image."""
    import struct

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
        synthesize_bmp,
    )

    bottom_up = synthesize_bmp(17)
    (w,) = struct.unpack("<i", bottom_up[18:22])
    (h,) = struct.unpack("<i", bottom_up[22:26])
    stride = (w * 3 + 3) & ~3
    body = bottom_up[54:]
    rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
    top_down = (
        bottom_up[:22] + struct.pack("<i", -h) + bottom_up[26:54]
        + b"".join(reversed(rows))
    )
    assert decode_bmp(top_down) == decode_bmp(bottom_up)


def test_bmp_decoder_rejects_garbage_and_truncation():
    import pytest as _pytest

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
        synthesize_bmp,
    )

    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"definitely not a bitmap")
    with _pytest.raises(ValueError, match="truncated pixel data"):
        decode_bmp(synthesize_bmp(5)[:-7])


def test_bmp_decoder_fuzz_roundtrip():
    """Property: ANY uncompressed 24-bit pixel grid round-trips exactly
    through synthesize-shaped bytes → decode_bmp (not just the generator
    formula's outputs)."""
    import struct

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
    )

    def build_bmp(img):
        h, w, _ = img.shape
        row_bytes = w * 3
        pad = (-row_bytes) % 4
        pixel_data = b"".join(
            img[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
        )
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0
        )
        header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
        return header + dib + pixel_data

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 17),
        st.integers(1, 11),
        st.integers(0, 2**32 - 1),
    )
    def check(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        stats = decode_bmp(build_bmp(img))
        arr = img.astype(np.int64)
        assert stats["width"] == w and stats["height"] == h
        assert stats["sum_b"] == int(arr[:, :, 0].sum())
        assert stats["sum_g"] == int(arr[:, :, 1].sum())
        assert stats["sum_r"] == int(arr[:, :, 2].sum())
        assert stats["peak"] == int(arr.max())

    check()


# ---------------------------------------------------------------------------
# Real y4m codec kernels (multimodal video lane)
# ---------------------------------------------------------------------------
def test_y4m_roundtrip_exact():
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _y4m_dims,
        _y4m_pixel,
        decode_y4m,
        synthesize_y4m,
    )

    for aid in (0, 2, 41, 9999):
        w, h, nf = _y4m_dims(aid)
        stats = decode_y4m(synthesize_y4m(aid))
        t, y, x = np.meshgrid(
            np.arange(nf), np.arange(h), np.arange(w), indexing="ij"
        )
        py = _y4m_pixel(aid, t, x, y, 0).astype(np.int64)
        pu = _y4m_pixel(aid, t, x, y, 101).astype(np.int64)
        pv = _y4m_pixel(aid, t, x, y, 202).astype(np.int64)
        assert (stats["width"], stats["height"], stats["n_frames"]) == (w, h, nf)
        assert stats["sum_y"] == int(py.sum())
        assert stats["sum_u"] == int(pu.sum())
        assert stats["sum_v"] == int(pv.sum())
        assert stats["peak_luma"] == int(py.max())


def test_y4m_decoder_rejects_garbage_truncation_and_chroma():
    import pytest as _pytest

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_y4m,
        synthesize_y4m,
    )

    with _pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF not a y4m stream")
    with _pytest.raises(ValueError, match="truncated frame"):
        decode_y4m(synthesize_y4m(3)[:-5])
    with _pytest.raises(ValueError, match="only C444"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\nFRAME\n" + b"\x00" * 24)
    with _pytest.raises(ValueError, match="expected FRAME"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\nBOGUS\n" + b"\x00" * 12)


def test_y4m_decoder_fuzz_roundtrip():
    """Property: ANY C444 frame stack round-trips exactly through
    synthesize-shaped bytes → decode_y4m."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_y4m,
    )

    def build_y4m(frames):  # frames: (nf, 3, h, w) uint8
        nf, _, h, w = frames.shape
        out = f"YUV4MPEG2 W{w} H{h} F30:1 C444\n".encode()
        for fi in range(nf):
            out += b"FRAME\n"
            for pi in range(3):
                out += frames[fi, pi].tobytes()
        return out

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 9), st.integers(1, 7), st.integers(1, 5),
        st.integers(0, 2**32 - 1),
    )
    def check(w, h, nf, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, size=(nf, 3, h, w), dtype=np.uint8)
        stats = decode_y4m(build_y4m(frames))
        arr = frames.astype(np.int64)
        assert (stats["width"], stats["height"], stats["n_frames"]) == (w, h, nf)
        assert stats["sum_y"] == int(arr[:, 0].sum())
        assert stats["sum_u"] == int(arr[:, 1].sum())
        assert stats["sum_v"] == int(arr[:, 2].sum())
        assert stats["peak_luma"] == int(arr[:, 0].max())

    check()


# ---------------------------------------------------------------------------
# Real transform kernels: nearest-neighbor resize, linear resample
# ---------------------------------------------------------------------------
def test_resize_image_nearest_neighbor_exact():
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _parse_bmp,
        decode_bmp,
        resize_image,
        synthesize_bmp,
    )

    src = synthesize_bmp(12)
    w_in, h_in, img = _parse_bmp(src)
    for w_out, h_out in ((3, 2), (7, 5), (w_in, h_in), (2 * w_in, 3 * h_in)):
        out = resize_image(src, w_out, h_out)
        _, _, got = _parse_bmp(out)
        xs = (np.arange(w_out) * w_in) // w_out
        ys = (np.arange(h_out) * h_in) // h_out
        assert (got == img[ys][:, xs]).all()
        assert decode_bmp(out)["n_pixels"] == w_out * h_out


def test_resample_audio_identity_and_linearity():
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _parse_wav,
        resample_audio,
        synthesize_wav,
    )

    wav = synthesize_wav(9)
    src_rate, x = _parse_wav(wav)
    # identity: resampling to the same rate returns the same samples
    same_rate, same = _parse_wav(resample_audio(wav, src_rate))
    assert same_rate == src_rate and (same == x).all()
    # exact 2x upsample: even outputs = inputs, odd outputs = floor-midpoints
    up_rate, up = _parse_wav(resample_audio(wav, src_rate * 2))
    assert up_rate == src_rate * 2
    assert up.size == 2 * x.size - 1
    assert (up[0::2] == x).all()
    mid = x[:-1] + (x[1:] - x[:-1]) // 2
    assert (up[1::2] == mid).all()


def test_resample_audio_fuzz_matches_python_reference():
    """Property: the vectorized integer resampler equals a scalar
    Python reimplementation of the stated formula for arbitrary PCM."""
    import struct

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _parse_wav,
        resample_audio,
    )

    def build_wav(samples, rate):
        data = np.asarray(samples, dtype="<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
        st.sampled_from([8000, 12000, 16000]),
        st.sampled_from([8000, 16000, 44100]),
    )
    def check(samples, src, dst):
        _, got = _parse_wav(resample_audio(build_wav(samples, src), dst))
        n_in = len(samples)
        n_out = 1 + ((n_in - 1) * dst) // src
        assert got.size == n_out
        for i in range(n_out):
            k, f = (i * src) // dst, (i * src) % dst
            s1 = samples[k]
            s2 = samples[min(k + 1, n_in - 1)]
            assert got[i] == s1 + ((s2 - s1) * f) // dst, (i, src, dst)

    check()


# ---------------------------------------------------------------------------
# Training-sequence prep: chunking coverage + packing consistency
# ---------------------------------------------------------------------------
def test_sliding_chunks_cover_every_token_with_exact_overlap(spark, sf_dir):
    """Properties the oracle's row-hash can't state directly: chunk
    starts advance by exactly the stride, every token index is covered
    by at least one chunk, and only the final chunk may be ragged."""
    from financial_arbitrage_data_pipeline_spark.operators.textstats import (
        _CHUNK_S,
        _CHUNK_W,
        doc_sliding_chunks,
    )

    chunks = doc_sliding_chunks(spark, sf_dir).collect()
    docs = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        n = docs[doc_id]
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        covered = 0
        for r in rows:
            start = r.chunk_id * _CHUNK_S
            assert start <= covered  # no gap before this chunk
            if r.chunk_id < len(rows) - 1:
                assert r.n_tokens == _CHUNK_W  # only the tail is ragged
            covered = max(covered, start + r.n_tokens)
        assert covered == n  # full coverage, no overrun


def test_packed_boundaries_consistent_with_totals(spark, sf_dir):
    """Per language: the highest last_seq equals ceil(total_tokens/C)-1
    (no empty trailing sequence), spans are monotone in doc order, and
    each doc's span width matches its token count."""
    from financial_arbitrage_data_pipeline_spark.operators.textstats import (
        _PACK_C,
        packed_sequence_boundaries,
    )

    rows = packed_sequence_boundaries(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        total = sum(r.n_tokens for r in rs)
        assert max(r.last_seq for r in rs) == (total - 1) // _PACK_C
        before = 0
        for r in rs:
            assert r.first_seq == before // _PACK_C
            assert r.last_seq == (before + r.n_tokens - 1) // _PACK_C
            assert r.straddles_boundary == (r.first_seq != r.last_seq)
            before += r.n_tokens


# ---------------------------------------------------------------------------
# Real PNG codec kernels (compressed image lane)
# ---------------------------------------------------------------------------
def test_png_roundtrip_exact_all_filters():
    import numpy as np

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        _parse_png,
        encode_png,
    )

    img = np.arange(7 * 5 * 3, dtype=np.uint8).reshape(5, 7, 3) * 3 % 256
    for f in range(5):
        w, h, out = _parse_png(encode_png(img, filters=[f] * 5))
        assert (w, h) == (7, 5)
        assert (out == img).all(), f"filter {f} did not round-trip"


def test_png_decoder_rejects_garbage_crc_and_truncation():
    import pytest as _pytest

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_png,
        synthesize_png,
    )

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a nope")
    good = synthesize_png(8)
    with _pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])
    # flip one byte inside the IDAT body → CRC must catch it
    idat_at = good.index(b"IDAT")
    corrupted = bytearray(good)
    corrupted[idat_at + 5] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupted))


def test_png_decoder_fuzz_roundtrip():
    """Property: ANY 8-bit RGB grid under ANY per-row filter choice
    round-trips exactly through encode_png → decode_png — compression,
    filtering, and chunk framing are all in the loop."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 13),
        st.integers(1, 9),
        st.integers(0, 2**32 - 1),
    )
    def check(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        filters = rng.integers(0, 5, size=h)
        stats = decode_png(encode_png(img, filters=filters))
        arr = img.astype(np.int64)
        assert stats["width"] == w and stats["height"] == h
        assert stats["sum_r"] == int(arr[:, :, 0].sum())
        assert stats["sum_g"] == int(arr[:, :, 1].sum())
        assert stats["sum_b"] == int(arr[:, :, 2].sum())
        assert stats["peak"] == int(arr.max())

    check()


def test_png_is_actually_compressed():
    """The wire bytes must be smaller than the raw scanlines for a
    predictable gradient — i.e. DEFLATE is really in the path."""
    from financial_arbitrage_data_pipeline_spark.operators.multimodal import (
        synthesize_png,
        _png_dims,
    )

    for aid in (2, 20, 41):
        w, h = _png_dims(aid)
        assert len(synthesize_png(aid)) < 8 + 12 * 3 + 25 + h * (1 + 3 * w)


def test_missniffed_payloads_fall_back_instead_of_failing_batch(spark):
    """ADVICE r6: a payload whose MAGIC bytes match a real decoder but
    whose body does not parse (utf-8 text starting with 'BM', a
    RIFF/WAVE header over garbage, a non-C444 y4m) must take the
    documented fake fallback — one mis-sniffed payload may never fail
    the whole mapInPandas batch."""
    from financial_arbitrage_data_pipeline_spark.operators import multimodal as M

    bm_text = b"BMark this: plain utf-8 that sniffs as bmp"
    riff_garbage = b"RIFF\x10\x00\x00\x00WAVEgarbage-not-a-fmt-chunk"
    png_garbage = b"\x89PNG\r\n\x1a\n" + b"corrupt" * 3
    jpeg_garbage = b"\xff\xd8\xff" + b"\x00" * 16
    y4m_non444 = b"YUV4MPEG2 W2 H2 C420\nFRAME\n" + bytes(6)

    for p in (bm_text, riff_garbage, png_garbage, jpeg_garbage, y4m_non444):
        f = M.decode_features(p)
        assert f["format"] == "unknown", p[:12]
        assert f["n_units"] == len(p) and f["sum_values"] is None

    # resize / frame-sample dispatch take the same fallback
    assert M.resize_any(bm_text, 4, 4) == M.fake_resize(bm_text, 4, 4)
    assert M.resize_any(png_garbage, 4, 4) == M.fake_resize(png_garbage, 4, 4)

    # whole Arrow batch with one poisoned payload still succeeds
    df = spark.createDataFrame(
        [(1, "image", bytearray(bm_text)), (2, "audio", bytearray(riff_garbage))],
        "asset_id long, media_type string, payload binary",
    )
    rows = {r.asset_id: r.format for r in M.extract_features(df).collect()}
    assert rows == {1: "unknown", 2: "unknown"}

    sampled = M.sample_assets(
        spark.createDataFrame(
            [(9, bytearray(y4m_non444))], "asset_id long, payload binary"
        )
    ).collect()
    assert sampled[0].payload == M.fake_sample_frames(y4m_non444)


def test_persisted_gate_probe_cobucketed_and_corpus_free(spark, tmp_path):
    """The persisted-index gate's 100 TB contract (VERDICT r11 task 3):
    the per-batch probe joins the incoming batch's bands against the
    BUCKETED band-index table with (a) NO exchange on the index side
    (the shuffle moved into the one-time index write) and (b) no scan
    of the corpus text anywhere in the gate plan — the lineage is cut
    at the incoming batch, so base-corpus cost cannot leak into the
    per-batch path."""
    import os
    import uuid

    from financial_arbitrage_data_pipeline_spark.operators.dedup import (
        _incremental_incoming,
    )
    from financial_arbitrage_data_pipeline_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    band_key = F.concat_ws(
        ":", F.col("band_id").cast("string"), F.col("band_sig")
    ).alias("band_key")
    tbl = f"sg_test_band_index_{uuid.uuid4().hex[:8]}"
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        (
            band_signatures(with_minhash(with_shingles(docs)))
            .select(band_key, "doc_id")
            .write.format("parquet")
            .bucketBy(16, "band_key")
            .sortBy("band_key")
            .option("path", os.path.join(str(tmp_path), "band_index"))
            .saveAsTable(tbl)
        )
        inc = with_minhash(with_shingles(_incremental_incoming(docs))).localCheckpoint()
        inc_bands = band_signatures(inc).select(
            band_key, F.col("doc_id").alias("incoming_id")
        )
        # force the scale-shape join (at 100 TB the index never
        # broadcasts; at test SF Catalyst would) to pin the co-bucket
        # property the layout buys
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = inc_bands.join(spark.table(tbl), "band_key")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan  # incoming side only
        assert "documents" not in plan, "gate plan reaches the corpus text"
        assert tbl in plan
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_persisted_gate_matches_unpersisted_gate(spark):
    """Same verdicts whether the index is persisted or rebuilt —
    byte-identical rows (the persisted path changes where bytes live,
    never the math)."""
    from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    a = sorted(
        map(tuple, REGISTRY["incremental_neardup_gate"].builder(spark, sf_dir).collect())
    )
    b = sorted(
        map(
            tuple,
            REGISTRY["incremental_neardup_gate_persisted"].builder(spark, sf_dir).collect(),
        )
    )
    assert a == b
