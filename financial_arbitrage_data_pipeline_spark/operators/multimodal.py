"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (schemas.MEDIA_ASSETS), processed with Arrow-batched
Pandas functions over mapInPandas — the only operators in the engine that
legitimately leave the JVM, because codec work is Python-library territory.

All three modalities have REAL decode codecs, each NumPy-only, each
driving an oracle-checked lane end-to-end on real bytes:

- audio: PCM RIFF/WAVE (`synthesize_wav`/`decode_wav_pcm`) →
  `audio_pcm_stats`
- image, uncompressed: 24-bit BMP (`synthesize_bmp`/`decode_bmp`) →
  `image_pixel_stats`
- image, COMPRESSED: PNG — zlib DEFLATE + all five predictive row
  filters + CRC-validated chunk framing (`encode_png`/`decode_png`) →
  `png_pixel_stats`
- video: YUV4MPEG2 (`synthesize_y4m`/`decode_y4m`) →
  `video_plane_stats`
- text-as-binary: zlib-compressed document payloads decompressed at the
  edge → `compressed_text_stats`

The TRANSFORM kernels are real too, built on those codecs with exact
integer arithmetic so their SQL oracles verify every output sample:
`resize_image` (nearest-neighbor over decoded BMP pixels →
`image_resize_stats`) and `resample_audio` (linear interpolation over
decoded PCM → `audio_resample_stats`). Transform-coded formats (jpeg/
mp3/h264 — DCT + entropy coding, motion compensation) would need
Pillow/librosa/pyav, not in this container; `fake_decode_features`/
`fake_resize` remain as the format-agnostic stand-ins that keep that
plumbing (binary schema, batch iteration, UDF signatures, partition
sizing) tested for arbitrary payloads.

Scale notes (100 TB): payloads ride as parquet binary; mapInPandas
processes Arrow batches so Python crossings are per-batch, not per-row.
Partition sizing must target payload bytes, not row counts — set
spark.sql.files.maxPartitionBytes so a partition of payloads fits
executor memory (see docs in bench notes).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import query
from ..sources.tables import load_table

MEDIA_TYPES = ["image", "audio", "video"]


# ---------------------------------------------------------------------------
# Decode kernels
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> dict:
    """Real image decode for uncompressed 24-bit BMP payloads (NumPy-only
    parser, see `decode_bmp` below). Compressed formats (png/jpeg) would
    need Pillow — not in this container."""
    return decode_bmp(payload)


def decode_audio(payload: bytes) -> dict:
    """Real audio decode for PCM RIFF/WAVE payloads (NumPy-only parser,
    see `decode_wav_pcm` below). Compressed formats (mp3/ogg/flac) would
    need librosa/soundfile — not in this container."""
    return decode_wav_pcm(payload)


def decode_video(payload: bytes) -> dict:
    """Real video decode for uncompressed YUV4MPEG2 payloads (NumPy-only
    parser, see `decode_y4m` below). Compressed codecs (h264/vp9) would
    need pyav/ffmpeg — not in this container."""
    return decode_y4m(payload)


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic stand-in for a decode+feature-extract kernel:
    byte length, crc32, and a fake 'brightness' from the byte sum.
    Since r6 this is only the documented FALLBACK for payloads whose
    magic bytes match no real decoder (see `decode_features`)."""
    return {
        "n_bytes": len(payload),
        "crc32": zlib.crc32(payload) & 0xFFFFFFFF,
        "brightness": (sum(payload) % 256) / 255.0 if payload else 0.0,
    }


def sniff_media_format(payload: bytes) -> str:
    """Magic-byte container sniff — the dispatch key for the generic
    asset lane. Recognizes exactly the formats the engine has REAL
    decoders for; everything else is 'unknown' (fake-kernel fallback)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


def decode_features(payload: bytes) -> dict:
    """REAL decode+feature-extract with magic-byte dispatch (r5 verdict
    task 3): BMP/PNG/JPEG → image decoders, RIFF/WAVE → PCM or G.711
    mu-law audio, YUV4MPEG2 → video. Features are unified integer-exact
    stats so SQL oracles can restate them per format:

    - n_units: decoded sample count (channel samples / PCM samples /
      plane samples / JPEG coefficients)
    - sum_values: the decoder's content checksum (channel sum / energy
      sum-of-squares / plane sum / |coefficient| sum)
    - peak: max channel value / peak |sample| / peak luma / max |coeff|

    Unrecognized payloads take the documented fake fallback with
    n_units = n_bytes and NULL content stats — size-only features, never
    fabricated decode output. A payload whose magic bytes MATCH a real
    decoder but whose body does not parse (an utf-8 doc starting with
    'BM', a y4m colorspace the decoder doesn't speak) takes the SAME
    fallback instead of failing the whole Arrow batch (ADVICE r6): the
    sniff is a routing hint, not a validity proof."""
    n_bytes = len(payload)
    try:
        return _decode_features_strict(payload, n_bytes)
    except (ValueError, IndexError, zlib.error):
        return {
            "format": "unknown",
            "n_bytes": n_bytes,
            "n_units": n_bytes,
            "sum_values": None,
            "peak": None,
        }


def _decode_features_strict(payload: bytes, n_bytes: int) -> dict:
    fmt = sniff_media_format(payload)
    if fmt in ("bmp", "png"):
        d = decode_bmp(payload) if fmt == "bmp" else decode_png(payload)
        return {
            "format": fmt,
            "n_bytes": n_bytes,
            "n_units": 3 * d["n_pixels"],
            "sum_values": d["sum_b"] + d["sum_g"] + d["sum_r"],
            "peak": d["peak"],
        }
    if fmt == "gif":
        from .transcode import decode_gif

        d = decode_gif(payload)
        return {
            "format": fmt,
            "n_bytes": n_bytes,
            "n_units": 3 * d["n_pixels"],
            "sum_values": d["r_sum"] + d["g_sum"] + d["b_sum"],
            "peak": d["peak_channel"],
        }
    if fmt == "jpeg":
        from .transcode import decode_jpeg

        d = decode_jpeg(payload)
        c = d["coeffs"]
        return {
            "format": fmt,
            "n_bytes": n_bytes,
            "n_units": d["n_blocks"] * 64,
            "sum_values": int(abs(c).sum()),
            "peak": int(abs(c).max()),
        }
    if fmt == "wav":
        try:
            d = decode_wav_pcm(payload)
        except ValueError:
            from .transcode import decode_ulaw_wav

            d = decode_ulaw_wav(payload)
        return {
            "format": fmt,
            "n_bytes": n_bytes,
            "n_units": d["n_samples"],
            "sum_values": d["sum_sq"],
            "peak": d["peak_abs"],
        }
    if fmt == "y4m":
        d = decode_y4m(payload)
        return {
            "format": fmt,
            "n_bytes": n_bytes,
            "n_units": 3 * d["width"] * d["height"] * d["n_frames"],
            "sum_values": d["sum_y"] + d["sum_u"] + d["sum_v"],
            "peak": d["peak_luma"],
        }
    return {
        "format": "unknown",
        "n_bytes": n_bytes,
        "n_units": n_bytes,
        "sum_values": None,
        "peak": None,
    }


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("n_units", T.LongType(), True),
        T.StructField("sum_values", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    multimodal hot path shape: Arrow batches in, Arrow batches out, one
    Python crossing per batch. The kernel dispatches on magic bytes to
    the REAL codec per payload (`decode_features`); the fake kernel is
    only reached for unrecognized formats."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "media_type": pdf["media_type"].values,
                    "format": [f["format"] for f in feats],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "n_units": [f["n_units"] for f in feats],
                    "sum_values": pd.array(
                        [f["sum_values"] for f in feats], dtype="Int64"
                    ),
                    "peak": pd.array(
                        [f["peak"] for f in feats], dtype="Int64"
                    ),
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media_assets table from documents: payload =
    utf-8 bytes of the text, media_type = doc_id mod 3. (No media in the
    driver testdata; the binary column and batch shapes are what's under
    test.)"""
    docs = load_table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


# ---------------------------------------------------------------------------
# Resize / frame-sample kernels (stubbed codecs, real batch plumbing)
# ---------------------------------------------------------------------------

FRAME_BYTES = 64  # fake "frame" = fixed byte window of the payload
FRAME_STRIDE = 4  # sample every 4th frame


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize for uncompressed 24-bit BMP payloads:
    nearest-neighbor resampling on the decoded pixel grid with the exact
    integer index map src = (dst * in_size) // out_size (the map an SQL
    oracle can restate), re-encoded as a valid BMP. Smooth kernels
    (bilinear/Lanczos via Pillow) are a kernel-body swap."""
    w_in, h_in, img = _parse_bmp(payload)
    xs = (_np.arange(width) * w_in) // width
    ys = (_np.arange(height) * h_in) // height
    return _encode_bmp(img[ys][:, xs])


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: truncate/tile the payload to width*height
    bytes — preserves the contract that output size is a pure function of
    the target dims, which is what partition sizing depends on. Since r6
    only the FALLBACK for unrecognized formats (see `resize_any`)."""
    target = width * height
    if not payload:
        return bytes(target)
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """REAL compressed-image resize: PNG decode (inflate + unfilter) →
    the same exact integer nearest-neighbor index map as `resize_image`
    (src = (dst * in_size) // out_size) → PNG re-encode (filter +
    DEFLATE). Output stays a valid, CRC-correct PNG."""
    w_in, h_in, img = _parse_png(payload)
    xs = (_np.arange(width) * w_in) // width
    ys = (_np.arange(height) * h_in) // height
    return encode_png(img[ys][:, xs])


def resize_any(payload: bytes, width: int, height: int) -> bytes:
    """Magic-byte dispatch for the generic resize lane: BMP and PNG run
    the real nearest-neighbor kernels (and stay valid files of their own
    format); unrecognized payloads take the documented fake fallback —
    as does a payload whose sniffed body fails to parse (ADVICE r6: one
    mis-sniffed payload must not fail the Arrow batch)."""
    fmt = sniff_media_format(payload)
    try:
        if fmt == "bmp":
            return resize_image(payload, width, height)
        if fmt == "png":
            return resize_png(payload, width, height)
    except ValueError:
        pass
    return fake_resize(payload, width, height)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def resize_assets(assets: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: binary in → binary out, one Python crossing per
    Arrow batch. The output column is again an opaque payload — resize
    composes with decode/feature kernels in the same pipeline."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_any(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "payload": out,
                    "n_bytes": [len(p) for p in out],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_sampled", T.LongType(), True),
        T.StructField("sampled_bytes", T.LongType(), True),
    ]
)


def sample_frames(assets: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling plumbing: the payload is treated as a sequence of
    fixed-size frames (a real kernel would demux with pyav); every
    `stride`-th frame is kept. Emits per-asset frame accounting — the
    shape a downstream per-frame feature extractor consumes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames, n_sampled, s_bytes = [], [], []
            for p in pdf["payload"]:
                frames = [p[i : i + frame_bytes] for i in range(0, len(p), frame_bytes)]
                sampled = frames[::stride]
                n_frames.append(len(frames))
                n_sampled.append(len(sampled))
                s_bytes.append(sum(len(f) for f in sampled))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "n_frames": n_frames,
                    "n_sampled": n_sampled,
                    "sampled_bytes": s_bytes,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(kernel, FRAME_SCHEMA)


def sample_frames_y4m(payload: bytes, stride: int = 2) -> bytes:
    """REAL video frame sampling: demux the YUV4MPEG2 stream at its
    actual FRAME boundaries, keep every `stride`-th frame, and re-emit a
    VALID y4m stream with the original header — the kernel a training
    pipeline runs before per-frame feature extraction. C444 only (the
    synthesis format); plane size comes from the header's W/H tags."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for tag in payload[:nl].decode("ascii", "replace").split()[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C") and tag[1:] != "444":
            raise ValueError("only C444 supported by this kernel")
    if not w or not h:
        raise ValueError("missing W/H header tags")
    if w <= 0 or h <= 0:
        # "W-1" parses to a truthy negative; a negative frame_size would
        # pass the truncation check below and emit incoherent empty
        # frames (r9 header-coherence audit)
        raise ValueError(f"bad dimensions {w}x{h}")
    frame_size = 3 * w * h
    out = bytearray(payload[: nl + 1])
    pos = nl + 1
    idx = 0
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        body = payload[fnl + 1 : fnl + 1 + frame_size]
        if len(body) < frame_size:
            raise ValueError("truncated frame")
        if idx % stride == 0:
            out += b"FRAME\n" + body
        pos = fnl + 1 + frame_size
        idx += 1
    return bytes(out)


def fake_sample_frames(
    payload: bytes, stride: int = 2, frame_bytes: int = FRAME_BYTES
) -> bytes:
    """Fallback frame sampling for unrecognized formats: the payload's
    fixed-size byte windows stand in for frames; every `stride`-th
    window is kept (concatenated). Output size is a pure function of
    input size — the contract partition sizing depends on."""
    return b"".join(
        payload[i : i + frame_bytes]
        for i in range(0, len(payload), frame_bytes * stride)
    )


def sample_assets(assets: DataFrame, stride: int = 2) -> DataFrame:
    """mapInPandas frame sampling with magic-byte dispatch: y4m payloads
    take the REAL demux-and-keep-every-Nth kernel (output stays a valid
    y4m stream that re-enters any decode lane); unrecognized payloads
    take the byte-window fallback — as does a sniffed-y4m payload whose
    body fails to demux (non-C444, truncated: ADVICE r6). Binary in →
    binary out, composable with `extract_features` exactly like
    `resize_assets`."""

    def sample_one(p: bytes) -> bytes:
        if sniff_media_format(p) == "y4m":
            try:
                return sample_frames_y4m(p, stride)
            except ValueError:
                pass
        return fake_sample_frames(p, stride)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [sample_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "payload": out,
                    "n_bytes": [len(p) for p in out],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Oracle-checked queries: the GENERIC asset lane with real-decoder
# dispatch (r5 verdict task 3) — one mixed-format corpus, one kernel,
# magic-byte routing to every real codec, fake fallback pinned too.
# ---------------------------------------------------------------------------

MIXED_FORMATS = ["bmp", "wav", "y4m", "png", "jpeg", "unknown"]


def mixed_assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A mixed-format media corpus derived from documents: doc_id % 6
    selects the container (bmp/wav/y4m/png/jpeg, and an 'unknown' stripe
    whose payload is the raw utf-8 text — no recognizable magic bytes).
    Every real payload is synthesized by the engine's own encoders from
    id-derived formulas, so decode results are SQL-restatable."""
    from .transcode import synthesize_jpeg

    docs = load_table(spark, sf_dir, "documents")

    asset_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    media_types = ["image", "audio", "video", "image", "image", "binary"]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        makers = [
            synthesize_bmp,
            synthesize_wav,
            synthesize_y4m,
            synthesize_png,
            synthesize_jpeg,
            None,
        ]
        for pdf in batches:
            ids, mts, payloads = [], [], []
            for aid, text in zip(pdf["doc_id"], pdf["text"]):
                stripe = int(aid) % 6
                make = makers[stripe]
                ids.append(int(aid))
                mts.append(media_types[stripe])
                payloads.append(
                    make(int(aid)) if make else str(text).encode("utf-8")
                )
            yield pd.DataFrame(
                {"asset_id": ids, "media_type": mts, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(synth, asset_schema)


@query(
    "media_asset_stats",
    oracle="""
WITH bmp AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 6 = 0
),
bmp_px AS (
  SELECT doc_id, w, h, x.x, y.y,
         (doc_id * 13 + x.x * 3 + y.y * 7) % 256 AS b,
         (doc_id * 13 + x.x * 3 + y.y * 7 + 101) % 256 AS g,
         (doc_id * 13 + x.x * 3 + y.y * 7 + 202) % 256 AS r
  FROM bmp,
       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x,
       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y
),
bmp_agg AS (
  SELECT 'bmp' AS format, 'image' AS media_type,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(COUNT(*) * 3 AS BIGINT) AS total_units,
         CAST(SUM(b + g + r) AS BIGINT) AS total_values,
         CAST(MAX(GREATEST(b, g, r)) AS BIGINT) AS max_peak
  FROM bmp_px
),
wav AS (
  SELECT doc_id, 256 + doc_id % 64 AS n
  FROM documents WHERE doc_id % 6 = 1
),
wav_s AS (
  SELECT doc_id, (doc_id * 31 + i.i * 7) % 65536 - 32768 AS x
  FROM wav, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) i
),
wav_agg AS (
  SELECT 'wav' AS format, 'audio' AS media_type,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(COUNT(*) AS BIGINT) AS total_units,
         CAST(SUM(x * x) AS BIGINT) AS total_values,
         CAST(MAX(ABS(x)) AS BIGINT) AS max_peak
  FROM wav_s
),
y4m AS (
  SELECT doc_id, 4 + 2 * (doc_id % 5) AS w, 4 + 2 * (doc_id % 3) AS h,
         2 + doc_id % 4 AS nf
  FROM documents WHERE doc_id % 6 = 2
),
y4m_px AS (
  SELECT doc_id,
         (doc_id * 7 + t.t * 13 + y.y * 5 + x.x * 3) % 256 AS py,
         (doc_id * 7 + t.t * 13 + y.y * 5 + x.x * 3 + 101) % 256 AS pu,
         (doc_id * 7 + t.t * 13 + y.y * 5 + x.x * 3 + 202) % 256 AS pv
  FROM y4m,
       LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS t) t,
       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y,
       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x
),
y4m_agg AS (
  SELECT 'y4m' AS format, 'video' AS media_type,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(COUNT(*) * 3 AS BIGINT) AS total_units,
         CAST(SUM(py + pu + pv) AS BIGINT) AS total_values,
         CAST(MAX(py) AS BIGINT) AS max_peak
  FROM y4m_px
),
png AS (
  SELECT doc_id, 6 + doc_id % 7 AS w, 3 + doc_id % 5 AS h
  FROM documents WHERE doc_id % 6 = 3
),
png_px AS (
  SELECT doc_id,
         (doc_id * 17 + x.x * 5 + y.y * 11) % 256 AS r,
         (doc_id * 17 + x.x * 5 + y.y * 11 + 29) % 256 AS g,
         (doc_id * 17 + x.x * 5 + y.y * 11 + 58) % 256 AS b
  FROM png,
       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x,
       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y
),
png_agg AS (
  SELECT 'png' AS format, 'image' AS media_type,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(COUNT(*) * 3 AS BIGINT) AS total_units,
         CAST(SUM(r + g + b) AS BIGINT) AS total_values,
         CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS max_peak
  FROM png_px
),
jp AS (
  SELECT doc_id, (1 + doc_id % 3) * (1 + doc_id % 2) AS nb
  FROM documents WHERE doc_id % 6 = 4
),
jp_c AS (
  SELECT doc_id, nb, b.b AS blk,
         (doc_id * 7 + b.b * 13) % 201 - 100 AS dc
  FROM jp, LATERAL (SELECT unnest(generate_series(0, nb - 1)) AS b) b
),
jp_ac AS (
  SELECT doc_id, blk,
         CASE WHEN z.z <= 1 + (doc_id + blk) % 6
              THEN (doc_id * 3 + blk * 5 + z.z * 17) % 21 - 10
              ELSE 0 END AS v
  FROM jp_c, LATERAL (SELECT unnest(generate_series(1, 63)) AS z) z
),
jp_agg AS (
  SELECT 'jpeg' AS format, 'image' AS media_type,
         (SELECT COUNT(*) FROM jp) AS n_assets,
         CAST((SELECT SUM(nb) * 64 FROM jp) AS BIGINT) AS total_units,
         CAST((SELECT SUM(ABS(dc)) FROM jp_c)
              + (SELECT SUM(ABS(v)) FROM jp_ac) AS BIGINT) AS total_values,
         CAST(GREATEST((SELECT MAX(ABS(dc)) FROM jp_c),
                       (SELECT MAX(ABS(v)) FROM jp_ac)) AS BIGINT) AS max_peak
),
unk_agg AS (
  SELECT 'unknown' AS format, 'binary' AS media_type,
         COUNT(*) AS n_assets,
         CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_units,
         CAST(NULL AS BIGINT) AS total_values,
         CAST(NULL AS BIGINT) AS max_peak
  FROM documents WHERE doc_id % 6 = 5
)
SELECT * FROM bmp_agg UNION ALL SELECT * FROM wav_agg
UNION ALL SELECT * FROM y4m_agg UNION ALL SELECT * FROM png_agg
UNION ALL SELECT * FROM jp_agg UNION ALL SELECT * FROM unk_agg
""",
    tags=("multimodal", "dispatch"),
)
def media_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENERIC asset lane end-to-end with REAL decoders: a
    mixed-format corpus (real BMP/WAV/y4m/PNG/JPEG bytes plus an
    unrecognizable utf-8 stripe) goes through ONE `extract_features`
    kernel that routes each payload by magic bytes to the matching real
    codec; per-format aggregate stats come back out. The oracle knows
    nothing about any container — it recomputes every decoded unit from
    the generator formulas in pure SQL — so a hash match proves the
    dispatcher picked the right decoder for every payload and each
    decoder bit-exactly recovered the encoded content. The 'unknown'
    stripe pins the fallback: size-only features, NULL content stats."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the codec kernels")
    feats = extract_features(mixed_assets_from_documents(spark, sf_dir))
    return feats.groupBy("format", "media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_units").alias("total_units"),
        F.sum("sum_values").alias("total_values"),
        F.max("peak").alias("max_peak"),
    )


@query(
    "video_frame_sample_stats",
    oracle="""
WITH y4m AS (
  SELECT doc_id, 4 + 2 * (doc_id % 5) AS w, 4 + 2 * (doc_id % 3) AS h,
         2 + doc_id % 4 AS nf
  FROM documents WHERE doc_id % 6 = 2
),
samp AS (
  SELECT doc_id, w, h, t.t AS t
  FROM y4m, LATERAL (SELECT unnest(generate_series(0, nf - 1, 2)) AS t) t
),
px AS (
  SELECT doc_id,
         (doc_id * 7 + t * 13 + y.y * 5 + x.x * 3) % 256 AS py,
         (doc_id * 7 + t * 13 + y.y * 5 + x.x * 3 + 101) % 256 AS pu,
         (doc_id * 7 + t * 13 + y.y * 5 + x.x * 3 + 202) % 256 AS pv
  FROM samp,
       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y,
       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x
),
y4m_agg AS (
  SELECT 'y4m' AS format,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(COUNT(*) * 3 AS BIGINT) AS total_units,
         CAST(SUM(py + pu + pv) AS BIGINT) AS total_values,
         CAST(MAX(py) AS BIGINT) AS max_peak
  FROM px
),
unk AS (
  SELECT doc_id, octet_length(encode(text)) AS len
  FROM documents WHERE doc_id % 6 = 5
),
wins AS (
  SELECT doc_id, LEAST(64, len - 64 * w.w) AS kept
  FROM unk,
       LATERAL (SELECT unnest(
         generate_series(0, (len + 63) // 64 - 1, 2)) AS w) w
),
unk_agg AS (
  SELECT 'unknown' AS format,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(SUM(kept) AS BIGINT) AS total_units,
         CAST(NULL AS BIGINT) AS total_values,
         CAST(NULL AS BIGINT) AS max_peak
  FROM wins
)
SELECT * FROM y4m_agg UNION ALL SELECT * FROM unk_agg
""",
    tags=("multimodal", "dispatch", "frames"),
)
def video_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic FRAME-SAMPLING lane with real-kernel dispatch: y4m
    payloads are demuxed at their actual FRAME boundaries, every 2nd
    frame kept, and re-emitted as VALID y4m; unknown payloads take the
    byte-window fallback. The sampled payloads then re-enter the
    dispatching feature kernel, and the oracle restates the sampled
    frames' plane sums straight from the generator formula (frames
    t = 0, 2, ... only) — a hash match proves the sampler cut at the
    right frame boundaries, kept exactly the right frames, and
    re-encoded a stream the decoder bit-exactly recovers."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the codec kernels")
    assets = mixed_assets_from_documents(spark, sf_dir).filter(
        (F.col("asset_id") % 6).isin(2, 5)
    )
    sampled = sample_assets(assets, stride=2)
    feats = extract_features(
        sampled.select(
            "asset_id", F.lit("binary").alias("media_type"), "payload"
        )
    )
    return feats.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_units").alias("total_units"),
        F.sum("sum_values").alias("total_values"),
        F.max("peak").alias("max_peak"),
    )


@query(
    "generic_resize_stats",
    oracle="""
WITH bmp AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 6 = 0
),
bmp_px AS (
  SELECT doc_id,
         (doc_id * 13 + ((x.x * w) // 7) * 3 + ((y.y * h) // 5) * 7) % 256 AS b,
         (doc_id * 13 + ((x.x * w) // 7) * 3 + ((y.y * h) // 5) * 7 + 101) % 256 AS g,
         (doc_id * 13 + ((x.x * w) // 7) * 3 + ((y.y * h) // 5) * 7 + 202) % 256 AS r
  FROM bmp,
       LATERAL (SELECT unnest(generate_series(0, 6)) AS x) x,
       LATERAL (SELECT unnest(generate_series(0, 4)) AS y) y
),
bmp_agg AS (
  SELECT 'bmp' AS format,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(COUNT(*) * 3 AS BIGINT) AS total_units,
         CAST(SUM(b + g + r) AS BIGINT) AS total_values,
         CAST(MAX(GREATEST(b, g, r)) AS BIGINT) AS max_peak
  FROM bmp_px
),
png AS (
  SELECT doc_id, 6 + doc_id % 7 AS w, 3 + doc_id % 5 AS h
  FROM documents WHERE doc_id % 6 = 3
),
png_px AS (
  SELECT doc_id,
         (doc_id * 17 + ((x.x * w) // 7) * 5 + ((y.y * h) // 5) * 11) % 256 AS r,
         (doc_id * 17 + ((x.x * w) // 7) * 5 + ((y.y * h) // 5) * 11 + 29) % 256 AS g,
         (doc_id * 17 + ((x.x * w) // 7) * 5 + ((y.y * h) // 5) * 11 + 58) % 256 AS b
  FROM png,
       LATERAL (SELECT unnest(generate_series(0, 6)) AS x) x,
       LATERAL (SELECT unnest(generate_series(0, 4)) AS y) y
),
png_agg AS (
  SELECT 'png' AS format,
         COUNT(DISTINCT doc_id) AS n_assets,
         CAST(COUNT(*) * 3 AS BIGINT) AS total_units,
         CAST(SUM(r + g + b) AS BIGINT) AS total_values,
         CAST(MAX(GREATEST(r, g, b)) AS BIGINT) AS max_peak
  FROM png_px
),
unk_agg AS (
  SELECT 'unknown' AS format,
         COUNT(*) AS n_assets,
         CAST(COUNT(*) * 35 AS BIGINT) AS total_units,
         CAST(NULL AS BIGINT) AS total_values,
         CAST(NULL AS BIGINT) AS max_peak
  FROM documents WHERE doc_id % 6 = 5
)
SELECT * FROM bmp_agg UNION ALL SELECT * FROM png_agg
UNION ALL SELECT * FROM unk_agg
""",
    tags=("multimodal", "dispatch", "resize"),
)
def generic_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic RESIZE lane with real-kernel dispatch: mixed
    BMP + PNG + unknown payloads go through ONE `resize_assets(7, 5)`
    pass — BMP and PNG take their real nearest-neighbor kernels and
    come out as valid (re-encoded) files of their own format; the
    unknown stripe takes the fake byte-tiling fallback (7*5 = 35
    bytes). The resized payloads are then re-decoded by the dispatching
    feature kernel, and the oracle restates the nearest-neighbor index
    map src = (dst*in) div out over both pixel formulas — a hash match
    proves resize picked exactly the right source pixels AND the
    re-encoded container round-tripped, per format."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the codec kernels")
    assets = mixed_assets_from_documents(spark, sf_dir).filter(
        (F.col("asset_id") % 6).isin(0, 3, 5)
    )
    resized = resize_assets(assets, 7, 5)
    feats = extract_features(
        resized.select(
            "asset_id", F.lit("binary").alias("media_type"), "payload"
        )
    )
    return feats.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_units").alias("total_units"),
        F.sum("sum_values").alias("total_values"),
        F.max("peak").alias("max_peak"),
    )


@query(
    "video_frame_sample",
    oracle=f"""
WITH assets AS (
  SELECT doc_id AS asset_id, octet_length(encode(text)) AS len
  FROM documents WHERE doc_id % 3 = 2
),
fr AS (
  SELECT asset_id, len,
         (len + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS n_frames
  FROM assets
)
SELECT asset_id,
       n_frames,
       (n_frames + {FRAME_STRIDE - 1}) // {FRAME_STRIDE} AS n_sampled,
       (n_frames + {FRAME_STRIDE - 1}) // {FRAME_STRIDE} * {FRAME_BYTES}
         - CASE WHEN (n_frames - 1) % {FRAME_STRIDE} = 0
                THEN {FRAME_BYTES} - (len - {FRAME_BYTES} * (n_frames - 1))
                ELSE 0 END AS sampled_bytes
FROM fr
""",
    tags=("multimodal-frames",),
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over the video assets: payloads chunk into
    {FRAME_BYTES}-byte frames inside the mapInPandas kernel, every
    {FRAME_STRIDE}th frame is kept, and the per-asset accounting comes
    back out. The oracle restates the arithmetic from octet_length alone,
    so what's verified is that the batched binary path really chunks and
    strides the payload bytes it was handed."""
    assets = assets_from_documents(spark, sf_dir).filter(F.col("media_type") == "video")
    return sample_frames(assets)


# ---------------------------------------------------------------------------
# Audio chunking kernel (fixed-window framing + energy accounting)
# ---------------------------------------------------------------------------

AUDIO_CHUNK_BYTES = 256  # fake "50 ms window" of the payload


def resample_audio(payload: bytes, target_hz: int) -> bytes:
    """REAL audio resample for PCM RIFF/WAVE payloads: linear
    interpolation on the decoded int16 samples with EXACT integer
    arithmetic — output index i maps to source position i·src/dst as the
    rational (k = i·src div dst, frac = i·src mod dst), and
    y = s[k] + floor((s[k+1] − s[k])·frac / dst), so an SQL oracle can
    restate the resampler bit-for-bit (floats only enter via FLOOR on
    products < 2^53, which IEEE doubles hold exactly). Re-encoded as a
    valid WAV at target_hz. Band-limited kernels (soxr/librosa) are a
    kernel-body swap."""
    import struct

    src, x = _parse_wav(payload)
    n_in = int(x.size)
    if n_in == 0:
        y = x[:0]
    else:
        n_out = 1 + ((n_in - 1) * target_hz) // src
        i = _np.arange(n_out, dtype=_np.int64)
        num = i * src
        k = num // target_hz
        frac = num % target_hz
        k2 = _np.minimum(k + 1, n_in - 1)
        s1, s2 = x[k], x[k2]
        y = s1 + ((s2 - s1) * frac) // target_hz  # numpy // floors, like SQL FLOOR
    data = y.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, target_hz, target_hz * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_chunks", T.LongType(), True),
        T.StructField("last_chunk_bytes", T.LongType(), True),
        T.StructField("total_energy", T.LongType(), True),
    ]
)


def chunk_audio(assets: DataFrame, chunk_bytes: int = AUDIO_CHUNK_BYTES) -> DataFrame:
    """Fixed-window audio framing over binary payloads (a real kernel
    would decode PCM first — stubbed here, the batch plumbing is what's
    real): per asset, the chunk count, the ragged tail size, and an
    integer 'energy' (byte sum) a VAD/loudness gate would consume.
    Arrow-batched mapInPandas: one Python crossing per batch, outputs
    are small fixed-width rows regardless of payload size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_chunks, last_bytes, energy = [], [], []
            for p in pdf["payload"]:
                n = (len(p) + chunk_bytes - 1) // chunk_bytes
                n_chunks.append(n)
                last_bytes.append(len(p) - (n - 1) * chunk_bytes if n else 0)
                energy.append(sum(p))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "n_chunks": n_chunks,
                    "last_chunk_bytes": last_bytes,
                    "total_energy": energy,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(kernel, AUDIO_SCHEMA)


@query(
    "audio_chunk_stats",
    oracle=f"""
WITH assets AS (
  SELECT doc_id AS asset_id, encode(text) AS payload
  FROM documents WHERE doc_id % 3 = 1
)
SELECT asset_id,
       (octet_length(payload) + {AUDIO_CHUNK_BYTES - 1}) // {AUDIO_CHUNK_BYTES} AS n_chunks,
       octet_length(payload)
         - ((octet_length(payload) + {AUDIO_CHUNK_BYTES - 1}) // {AUDIO_CHUNK_BYTES} - 1)
           * {AUDIO_CHUNK_BYTES} AS last_chunk_bytes,
       CAST(list_sum(list_transform(string_split_regex(CAST(payload AS VARCHAR), ''),
                                    c -> ascii(c))) AS BIGINT) AS total_energy
FROM assets
""",
    tags=("multimodal-audio",),
)
def audio_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing through the binary mapInPandas path: every audio
    asset chunked into {AUDIO_CHUNK_BYTES}-byte windows with a byte-sum
    energy — the accounting a voice-activity gate consumes before
    feature extraction. The oracle restates chunk arithmetic from
    octet_length and the energy as an ascii fold (payloads are utf-8
    text in the fixtures, so byte sum == codepoint sum), verifying the
    kernel really saw the exact bytes it was handed."""
    assets = assets_from_documents(spark, sf_dir).filter(F.col("media_type") == "audio")
    return chunk_audio(assets)


# ---------------------------------------------------------------------------
# Real codec path: PCM WAV (RIFF) synth + decode, NumPy only.
# Closes the "codec stubs only" gap for one modality: these kernels parse
# and produce REAL byte-level WAV files — swapping in librosa/pyav for
# compressed formats changes only the kernel body, exactly like the
# stubbed image/video kernels above.
# ---------------------------------------------------------------------------

try:  # numpy is baked into the runtime; guarded anyway per stub discipline
    import numpy as _np

    _HAS_NUMPY = True
except Exception:  # pragma: no cover
    _HAS_NUMPY = False

_WAV_BASE_SAMPLES = 256


def _wav_params(asset_id: int) -> tuple[int, int]:
    """(n_samples, sample_rate) as pure functions of the asset id, so the
    DuckDB oracle can restate them in SQL."""
    return _WAV_BASE_SAMPLES + asset_id % 64, 8000 + (asset_id % 4) * 4000


def synthesize_wav(asset_id: int) -> bytes:
    """A real, valid 16-bit mono PCM RIFF/WAVE file with deterministic
    sample values x[i] = ((asset_id*31 + i*7) % 65536) - 32768 — byte-
    exact reproducible, so decode results are oracle-checkable."""
    import struct

    n, rate = _wav_params(asset_id)
    i = _np.arange(n, dtype=_np.int64)
    x = ((asset_id * 31 + i * 7) % 65536 - 32768).astype("<i2")
    data = x.tobytes()
    byte_rate = rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, rate, byte_rate, 2, 16)  # PCM, mono, 16-bit
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _parse_wav(payload: bytes):
    """Walk the RIFF chunk list, validate the fmt chunk (PCM, 16-bit
    mono) and return (sample_rate, samples) with samples an int64
    array — the NumPy equivalent of `wave` + `frombuffer`,
    dependency-free."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, samples = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1:
                raise ValueError(f"not PCM (fmt tag {fmt_tag})")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise ValueError("only 16-bit mono supported by this kernel")
            # The declared chunk size is untrusted input: a truncated
            # payload would otherwise surface as a raw numpy frombuffer
            # error. Diagnose both truncation and odd byte counts here.
            if len(body) < size:
                raise ValueError(
                    f"truncated data chunk: header declares {size} bytes, "
                    f"payload carries {len(body)}"
                )
            if size % 2:
                raise ValueError(
                    f"data chunk size {size} is not a multiple of 2 bytes "
                    "(16-bit samples)"
                )
            samples = _np.frombuffer(body[:size], dtype="<i2").astype(_np.int64)
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return int(rate), samples


def decode_wav_pcm(payload: bytes) -> dict:
    """REAL audio decode (see `_parse_wav`). Emits integer-exact stats
    (peak |x| and sum of squares) so the oracle hash-matches without
    float tolerance games."""
    rate, samples = _parse_wav(payload)
    return {
        "sample_rate": rate,
        "n_samples": int(samples.size),
        "peak_abs": int(_np.abs(samples).max()) if samples.size else 0,
        "sum_sq": int((samples * samples).sum()),
    }


# ---------------------------------------------------------------------------
# Real video codec: NumPy-only YUV4MPEG2 (y4m) encoder + decoder — the
# uncompressed interchange format ffmpeg/mjpegtools speak: one text
# header line, then FRAME-delimited raw planar YUV. C444 layout (three
# full-resolution planes) keeps the plane math explicit.
# ---------------------------------------------------------------------------
def _y4m_dims(asset_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) as pure functions of the asset id, so
    the DuckDB oracle can restate them in SQL."""
    return 4 + 2 * (asset_id % 5), 4 + 2 * (asset_id % 3), 2 + asset_id % 4


def _y4m_pixel(asset_id: int, t, x, y, plane_off):
    """Plane sample at (x, y) of frame t — integer formula the oracle
    recomputes in SQL (plane_off: 0=Y, 101=U, 202=V). Elementwise on
    NumPy arrays as well as scalars."""
    return (asset_id * 7 + t * 13 + y * 5 + x * 3 + plane_off) % 256


def synthesize_y4m(asset_id: int) -> bytes:
    """A real, valid YUV4MPEG2 stream (header tags W/H/F/I/A/C, C444
    planar frames each introduced by a FRAME marker line) with
    deterministic sample values from `_y4m_pixel`."""
    w, h, n_frames = _y4m_dims(asset_id)
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode("ascii")
    t, y, x = _np.meshgrid(
        _np.arange(n_frames), _np.arange(h), _np.arange(w), indexing="ij"
    )
    frames = []
    for off in (0, 101, 202):  # Y, U, V planes
        frames.append(_y4m_pixel(asset_id, t, x, y, off).astype(_np.uint8))
    body = b""
    for fi in range(n_frames):
        body += b"FRAME\n"
        for plane in frames:
            body += plane[fi].tobytes()
    return header + body


def _parse_y4m(payload: bytes):
    """Demux a YUV4MPEG2 stream: validate header tags and walk the
    FRAME-delimited raw C444 planes. Returns (w, h, [y, u, v]) with each
    plane an int64 (frames, h, w) array — the NumPy equivalent of
    ffmpeg's y4m demuxer, dependency-free. Diagnoses truncated frames
    and unsupported chroma layouts with its own errors."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    chroma = "420jpeg"  # the spec's default when no C tag is present
    for tag in payload[:nl].decode("ascii", "replace").split()[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C"):
            chroma = tag[1:]
    if not w or not h:
        raise ValueError("missing W/H header tags")
    if w <= 0 or h <= 0:
        # "W-1" parses to a truthy negative; left unchecked, a negative
        # width reaches numpy reshape(h, -1) which silently INFERS the
        # dim instead of failing (r9 header-coherence audit)
        raise ValueError(f"bad dimensions {w}x{h}")
    if chroma != "444":
        raise ValueError(f"only C444 supported by this kernel (got C{chroma})")
    plane_bytes = w * h
    pos = nl + 1
    planes: list[list] = [[], [], []]
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = fnl + 1
        need = 3 * plane_bytes
        if len(payload) - pos < need:
            raise ValueError(
                f"truncated frame: need {need} plane bytes at byte {pos}, "
                f"payload carries {len(payload) - pos}"
            )
        for pi in range(3):
            planes[pi].append(
                _np.frombuffer(
                    payload[pos : pos + plane_bytes], dtype=_np.uint8
                ).reshape(h, w)
            )
            pos += plane_bytes
    n_frames = len(planes[0])
    if n_frames == 0:
        raise ValueError("no frames in stream")
    return int(w), int(h), [_np.stack(p).astype(_np.int64) for p in planes]


def decode_y4m(payload: bytes) -> dict:
    """REAL video decode (see `_parse_y4m`). Emits integer-exact
    per-plane stats so the oracle hash-matches without float tolerance
    games."""
    w, h, yuv = _parse_y4m(payload)
    return {
        "width": w,
        "height": h,
        "n_frames": int(yuv[0].shape[0]),
        "sum_y": int(yuv[0].sum()),
        "sum_u": int(yuv[1].sum()),
        "sum_v": int(yuv[2].sum()),
        "peak_luma": int(yuv[0].max()),
    }


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sum_y", T.LongType(), True),
        T.StructField("sum_u", T.LongType(), True),
        T.StructField("sum_v", T.LongType(), True),
        T.StructField("peak_luma", T.LongType(), True),
    ]
)


def decode_video_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas over binary y4m payloads → per-asset plane stats.
    Same Arrow-batched shape as the audio/image lanes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_y4m(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    **{
                        k: [s[k] for s in stats]
                        for k in (
                            "width", "height", "n_frames",
                            "sum_y", "sum_u", "sum_v", "peak_luma",
                        )
                    },
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, VIDEO_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real image codec: NumPy-only uncompressed 24-bit BMP encoder + decoder
# (same recipe as the WAV lane — real bytes, byte-exact reproducible, so
# decode results are oracle-checkable without any codec library).
# ---------------------------------------------------------------------------
def _bmp_dims(asset_id: int) -> tuple[int, int]:
    """(width, height) as pure functions of the asset id, so the DuckDB
    oracle can restate them in SQL."""
    return 8 + asset_id % 9, 4 + asset_id % 7


def _bmp_pixel(asset_id: int, x, y, c):
    """Channel value at (x, y) for channel c (0=B, 1=G, 2=R) — integer
    formula the oracle recomputes in SQL. Works elementwise on NumPy
    arrays as well as scalars."""
    return (asset_id * 13 + x * 3 + y * 7 + c * 101) % 256


def _encode_bmp(img) -> bytes:
    """Encode an (h, w, 3) uint8 BGR array in image (top-down) order as
    a valid uncompressed 24-bit BMP: BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding."""
    import struct

    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = []
    for yy in range(h - 1, -1, -1):  # bottom-up storage order
        rows.append(img[yy].tobytes() + b"\x00" * pad)
    pixel_data = b"".join(rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    return header + dib + pixel_data


def synthesize_bmp(asset_id: int) -> bytes:
    """A real, valid uncompressed 24-bit BMP with deterministic pixel
    values from `_bmp_pixel`, via `_encode_bmp`."""
    w, h = _bmp_dims(asset_id)
    y, x, c = _np.meshgrid(
        _np.arange(h), _np.arange(w), _np.arange(3), indexing="ij"
    )
    return _encode_bmp(_bmp_pixel(asset_id, x, y, c).astype(_np.uint8))


def _parse_bmp(payload: bytes):
    """Validate the BMP file header + BITMAPINFOHEADER (24-bit,
    uncompressed) and return (w, h, img) with img an (h, w, 3) BGR
    uint8 array in image (top-down) order. Handles top-down (negative
    height) storage; diagnoses truncated pixel data with its own error,
    not a raw numpy reshape failure."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack("<I", payload[10:14])
    dib_size, w, h_raw, planes, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported by this kernel")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h_raw}")
    stride = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    need = stride * h
    body = payload[offset : offset + need]
    if len(body) < need:
        raise ValueError(
            f"truncated pixel data: need {need} bytes from offset {offset}, "
            f"payload carries {len(body)}"
        )
    rows = _np.frombuffer(body, dtype=_np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)
    if not top_down:
        img = img[::-1]  # stored bottom-up → flip to image order
    return int(w), int(h), img


def decode_bmp(payload: bytes) -> dict:
    """REAL image decode (see `_parse_bmp` — the NumPy equivalent of
    Pillow's BMP plugin, dependency-free). Emits integer-exact
    per-channel stats so the oracle hash-matches without float
    tolerance games."""
    w, h, raw = _parse_bmp(payload)
    img = raw.astype(_np.int64)
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_b": int(img[:, :, 0].sum()),
        "sum_g": int(img[:, :, 1].sum()),
        "sum_r": int(img[:, :, 2].sum()),
        "peak": int(img.max()),
    }


IMAGE_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def decode_image_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas over binary BMP payloads → per-asset pixel stats.
    Same Arrow-batched shape as the audio lane; the kernel body does
    real byte-level codec work."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_bmp(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    **{
                        k: [s[k] for s in stats]
                        for k in (
                            "width", "height", "n_pixels",
                            "sum_b", "sum_g", "sum_r", "peak",
                        )
                    },
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, IMAGE_PIXEL_SCHEMA
    )


AUDIO_PCM_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("peak_abs", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
    ]
)


def decode_audio_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas over binary WAV payloads → per-asset PCM stats. Same
    Arrow-batched shape as the stub kernels, but the kernel body does
    real byte-level codec work."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_wav_pcm(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "sample_rate": [s["sample_rate"] for s in stats],
                    "n_samples": [s["n_samples"] for s in stats],
                    "peak_abs": [s["peak_abs"] for s in stats],
                    "sum_sq": [s["sum_sq"] for s in stats],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(kernel, AUDIO_PCM_SCHEMA)


@query(
    "audio_pcm_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 256 + doc_id % 64 AS n, 8000 + (doc_id % 4) * 4000 AS sr
  FROM documents WHERE doc_id % 3 = 1
),
s AS (SELECT doc_id, n, sr, unnest(generate_series(0, n - 1)) AS i FROM d),
v AS (SELECT doc_id, n, sr, (doc_id * 31 + i * 7) % 65536 - 32768 AS x FROM s)
SELECT doc_id AS asset_id,
       CAST(MAX(sr) AS BIGINT) AS sample_rate,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(MAX(ABS(x)) AS BIGINT) AS peak_abs,
       CAST(SUM(x * x) AS BIGINT) AS sum_sq
FROM v GROUP BY doc_id
""",
    tags=("multimodal", "audio", "codec"),
)
def audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL audio codec lane: synthesize a valid PCM WAV per
    audio asset (mapInPandas, binary out), then DECODE the bytes back
    through the RIFF parser (mapInPandas, stats out). The oracle knows
    nothing about WAV — it recomputes the expected sample values from
    the generator formula in pure SQL — so a hash match proves the
    bytes written by the encoder were bit-exactly recovered by the
    decoder through the whole Spark binary-column path. Integer stats
    (peak, sum of squares) keep the comparison exact."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the WAV codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)

    wav_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [synthesize_wav(int(a)) for a in pdf["doc_id"]],
                }
            )

    assets = docs.select("doc_id").mapInPandas(synth, wav_schema)
    return decode_audio_assets(assets)


_RESAMPLE_HZ = 16_000


@query(
    "audio_resample_stats",
    oracle=f"""
WITH d AS (
  SELECT doc_id, 256 + doc_id % 64 AS n_in, 8000 + (doc_id % 4) * 4000 AS src
  FROM documents WHERE doc_id % 3 = 1
),
o AS (
  SELECT doc_id, n_in, src,
         1 + ((n_in - 1) * {_RESAMPLE_HZ}) // src AS n_out
  FROM d
),
ix AS (
  SELECT doc_id, n_in, src, n_out,
         unnest(generate_series(0, n_out - 1)) AS i
  FROM o
),
m AS (
  SELECT doc_id, n_in, n_out,
         (i * src) // {_RESAMPLE_HZ} AS k,
         (i * src) % {_RESAMPLE_HZ} AS f
  FROM ix
),
s AS (
  SELECT doc_id, n_out, f,
         (doc_id * 31 + k * 7) % 65536 - 32768 AS s1,
         (doc_id * 31 + LEAST(k + 1, n_in - 1) * 7) % 65536 - 32768 AS s2
  FROM m
),
y AS (
  SELECT doc_id, n_out,
         s1 + CAST(FLOOR((s2 - s1) * f / {_RESAMPLE_HZ}.0) AS BIGINT) AS y
  FROM s
)
SELECT doc_id AS asset_id,
       CAST({_RESAMPLE_HZ} AS BIGINT) AS sample_rate,
       CAST(MAX(n_out) AS BIGINT) AS n_samples,
       CAST(MAX(ABS(y)) AS BIGINT) AS peak_abs,
       CAST(SUM(y * y) AS BIGINT) AS sum_sq
FROM y GROUP BY doc_id
""",
    tags=("multimodal", "audio", "codec", "resample"),
)
def audio_resample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resample lane: synthesize a WAV per audio asset at its
    id-derived rate (8/12/16/20 kHz — both up- and down-sampling paths
    exercised), linear-resample it to {_RESAMPLE_HZ} Hz with the exact
    integer-arithmetic kernel, then decode the RESAMPLED bytes back.
    The oracle restates the interpolation — k = i·src div dst,
    y = s[k] + floor((s[k+1]−s[k])·frac/dst) — in SQL over the
    generator formula, so a hash match proves the resampler's every
    output sample bit-for-bit."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the WAV codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)

    wav_schema2 = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth_resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [
                        resample_audio(synthesize_wav(int(a)), _RESAMPLE_HZ)
                        for a in pdf["doc_id"]
                    ],
                }
            )

    assets = docs.select("doc_id").mapInPandas(synth_resample, wav_schema2)
    return decode_audio_assets(assets)


@query(
    "video_plane_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 4 + 2 * (doc_id % 5) AS w, 4 + 2 * (doc_id % 3) AS h,
         2 + doc_id % 4 AS nf
  FROM documents WHERE doc_id % 3 = 2
),
ts AS (SELECT doc_id, w, h, nf, unnest(generate_series(0, nf - 1)) AS t FROM d),
ys AS (SELECT doc_id, w, h, nf, t, unnest(generate_series(0, h - 1)) AS y FROM ts),
xs AS (SELECT doc_id, w, h, nf, t, y, unnest(generate_series(0, w - 1)) AS x FROM ys),
v AS (
  SELECT doc_id, w, h, nf,
         (doc_id * 7 + t * 13 + y * 5 + x * 3) % 256 AS py,
         (doc_id * 7 + t * 13 + y * 5 + x * 3 + 101) % 256 AS pu,
         (doc_id * 7 + t * 13 + y * 5 + x * 3 + 202) % 256 AS pv
  FROM xs
)
SELECT doc_id AS asset_id,
       CAST(MAX(w) AS BIGINT) AS width,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(MAX(nf) AS BIGINT) AS n_frames,
       CAST(SUM(py) AS BIGINT) AS sum_y,
       CAST(SUM(pu) AS BIGINT) AS sum_u,
       CAST(SUM(pv) AS BIGINT) AS sum_v,
       CAST(MAX(py) AS BIGINT) AS peak_luma
FROM v GROUP BY doc_id
""",
    tags=("multimodal", "video", "codec"),
)
def video_plane_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL video codec lane (completing the WAV/BMP trio):
    synthesize a valid YUV4MPEG2 stream per video asset (mapInPandas,
    binary out), then DECODE the bytes back through the y4m demuxer
    (mapInPandas, stats out). The oracle knows nothing about y4m — it
    recomputes the expected plane samples from the generator formula in
    pure SQL — so a hash match proves the FRAME-delimited planar bytes
    written by the encoder were bit-exactly recovered by the decoder
    through the whole Spark binary-column path."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the y4m codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)

    y4m_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [synthesize_y4m(int(a)) for a in pdf["doc_id"]],
                }
            )

    assets = docs.select("doc_id").mapInPandas(synth, y4m_schema)
    return decode_video_assets(assets)


@query(
    "image_pixel_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 3 = 0
),
xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
v AS (
  SELECT doc_id, w, h,
         (doc_id * 13 + x * 3 + y * 7) % 256 AS b,
         (doc_id * 13 + x * 3 + y * 7 + 101) % 256 AS g,
         (doc_id * 13 + x * 3 + y * 7 + 202) % 256 AS r
  FROM ys
)
SELECT doc_id AS asset_id,
       CAST(MAX(w) AS BIGINT) AS width,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(MAX(w) * MAX(h) AS BIGINT) AS n_pixels,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(MAX(GREATEST(b, g, r)) AS BIGINT) AS peak
FROM v GROUP BY doc_id
""",
    tags=("multimodal", "image", "codec"),
)
def image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image codec lane (the WAV lane's twin): synthesize
    a valid uncompressed 24-bit BMP per image asset (mapInPandas, binary
    out), then DECODE the bytes back through the BMP parser
    (mapInPandas, stats out). The oracle knows nothing about BMP — it
    recomputes the expected pixel values from the generator formula in
    pure SQL — so a hash match proves the bytes written by the encoder
    (bottom-up rows, 4-byte padding, BGR order) were bit-exactly
    recovered by the decoder through the whole Spark binary-column
    path. Integer per-channel sums keep the comparison exact."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the BMP codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)

    bmp_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [synthesize_bmp(int(a)) for a in pdf["doc_id"]],
                }
            )

    assets = docs.select("doc_id").mapInPandas(synth, bmp_schema)
    return decode_image_assets(assets)


@query(
    "image_resize_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 3 = 0
),
xs AS (SELECT doc_id, w, h, unnest(generate_series(0, 6)) AS x FROM d),
ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, 4)) AS y FROM xs),
v AS (
  SELECT doc_id,
         (doc_id * 13 + ((x * w) // 7) * 3 + ((y * h) // 5) * 7) % 256 AS b,
         (doc_id * 13 + ((x * w) // 7) * 3 + ((y * h) // 5) * 7 + 101) % 256 AS g,
         (doc_id * 13 + ((x * w) // 7) * 3 + ((y * h) // 5) * 7 + 202) % 256 AS r
  FROM ys
)
SELECT doc_id AS asset_id,
       CAST(7 AS BIGINT) AS width,
       CAST(5 AS BIGINT) AS height,
       CAST(35 AS BIGINT) AS n_pixels,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(MAX(GREATEST(b, g, r)) AS BIGINT) AS peak
FROM v GROUP BY doc_id
""",
    tags=("multimodal", "image", "codec", "resize"),
)
def image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize lane: synthesize a BMP per image asset, resize it to
    7×5 through the nearest-neighbor kernel (decode → integer index map
    src = (dst·in) div out → re-encode), then decode the RESIZED bytes
    back. The oracle restates the index map in SQL over the generator
    formula, so a hash match proves the resampler picked exactly the
    right source pixels and the re-encoded BMP round-tripped."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the BMP codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)

    bmp_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [
                        resize_image(synthesize_bmp(int(a)), 7, 5)
                        for a in pdf["doc_id"]
                    ],
                }
            )

    assets = docs.select("doc_id").mapInPandas(synth_resize, bmp_schema)
    return decode_image_assets(assets)


# ---------------------------------------------------------------------------
# REAL COMPRESSED image codec: PNG (zlib DEFLATE + per-row predictive
# filters). Unlike BMP, the bytes on the wire are genuinely compressed:
# the encoder runs the five PNG filter predictors (None/Sub/Up/Average/
# Paeth) and DEFLATEs the filtered stream; the decoder walks the chunk
# structure (CRC-validated), inflates, and UNFILTERS every row. This is
# the path a 100 TB image corpus actually takes — web images arrive
# compressed — implemented against the public PNG spec (RFC 2083) with
# stdlib zlib + NumPy only. jpeg/h264 (DCT/motion-compensation codecs)
# remain out of scope without Pillow/pyav.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG filter type 4): pick the neighbor
    (left/up/upper-left) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanlines(raw, filters=None) -> bytearray:
    """Apply the per-row PNG filters to an (h, w, 3) int64 array and
    return the filtered scanline stream (filter byte + w*3 bytes per
    row). Shared by the sequential and the Adam7 pass encoders — each
    Adam7 pass filters its reduced image independently (prev row resets
    per pass, per the spec)."""
    h, w, _ = raw.shape
    out = bytearray()
    prev = _np.zeros((w, 3), dtype=_np.int64)
    for y in range(h):
        f = int(filters[y]) if filters is not None else y % 5
        row = raw[y]
        if f == 0:
            filt = row.copy()
        elif f == 1:  # Sub: predict from the pixel to the left
            filt = row.copy()
            filt[1:] = (row[1:] - row[:-1]) % 256
        elif f == 2:  # Up: predict from the pixel above
            filt = (row - prev) % 256
        elif f == 3:  # Average of left and up (floor division per spec)
            filt = _np.empty_like(row)
            for x in range(w):
                left = row[x - 1] if x > 0 else _np.zeros(3, dtype=_np.int64)
                filt[x] = (row[x] - (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth
            filt = _np.empty_like(row)
            for x in range(w):
                for c in range(3):
                    left = int(row[x - 1, c]) if x > 0 else 0
                    upleft = int(prev[x - 1, c]) if x > 0 else 0
                    filt[x, c] = (
                        int(row[x, c]) - _paeth(left, int(prev[x, c]), upleft)
                    ) % 256
        else:
            raise ValueError(f"bad filter type {f}")
        out.append(f)
        out.extend(filt.astype(_np.uint8).tobytes())
        prev = row
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec clause 8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def encode_png(img, filters=None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a real 8-bit truecolor PNG.
    `filters` optionally fixes the filter type per row (default y % 5 so
    every predictor is exercised); the filtered scanline stream is
    DEFLATEd into a single IDAT."""
    import struct

    h, w, _ = img.shape
    out = _filter_scanlines(img.astype(_np.int64), filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_adam7(img, filters=None) -> bytes:
    """Encode as an INTERLACED (Adam7) truecolor PNG: the image splits
    into seven reduced images on the Adam7 grid, each filtered as an
    independent scanline run (empty passes contribute no bytes, per
    spec), all passes DEFLATEd into one IDAT. `filters` indexes by the
    pass row's ORIGINAL y so the same rotation covers every pass."""
    import struct

    h, w, _ = img.shape
    raw = img.astype(_np.int64)
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = raw[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        sub_filters = (
            [int(filters[y0 + i * dy]) for i in range(sub.shape[0])]
            if filters is not None
            else None
        )
        out.extend(_filter_scanlines(sub, sub_filters))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace = 1 (Adam7)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def _parse_png(payload: bytes):
    """Walk the chunk stream (validating every CRC), require 8-bit
    truecolor non-interlaced, inflate the IDAT stream, and UNFILTER each
    scanline (all five predictors). Returns (w, h, img) with img an
    (h, w, 3) RGB uint8 array. Every malformation gets the parser's own
    diagnostic, not a raw zlib/NumPy error."""
    import struct

    if len(payload) < len(_PNG_SIG) or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if (depth, color, comp, filt_method) != (8, 2, 0, 0) or interlace not in (0, 1):
        raise ValueError(
            "only 8-bit truecolor PNG (sequential or Adam7) supported by this kernel"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    if interlace == 1:
        # Adam7: unfilter each non-empty reduced image independently and
        # scatter it back onto the pass grid
        img = _np.zeros((h, w, 3), dtype=_np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            ph = len(range(y0, h, dy))
            pw = len(range(x0, w, dx))
            if ph == 0 or pw == 0:
                continue
            nbytes = ph * (1 + 3 * pw)
            if off + nbytes > len(data):
                raise ValueError("truncated Adam7 pass stream")
            img[y0::dy, x0::dx] = _unfilter_scanlines(
                data[off : off + nbytes], pw, ph
            )
            off += nbytes
        if off != len(data):
            raise ValueError("trailing bytes after the last Adam7 pass")
        return int(w), int(h), img
    stride = 3 * w
    if len(data) != h * (1 + stride):
        raise ValueError(
            f"inflated scanline stream is {len(data)} bytes, "
            f"expected {h * (1 + stride)}"
        )
    return int(w), int(h), _unfilter_scanlines(data, w, h)


def _unfilter_scanlines(data: bytes, w: int, h: int):
    """Undo the per-row PNG filters on one scanline run (filter byte +
    3w bytes per row) — all five predictors; prev row starts at zero,
    exactly the reduced-image rule each Adam7 pass needs."""
    stride = 3 * w
    img = _np.zeros((h, w, 3), dtype=_np.int64)
    prev = _np.zeros((w, 3), dtype=_np.int64)
    for y in range(h):
        off = y * (1 + stride)
        f = data[off]
        row = _np.frombuffer(
            data[off + 1 : off + 1 + stride], dtype=_np.uint8
        ).astype(_np.int64).reshape(w, 3)
        if f == 0:
            recon = row
        elif f == 1:
            recon = row.copy()
            for x in range(1, w):
                recon[x] = (row[x] + recon[x - 1]) % 256
        elif f == 2:
            recon = (row + prev) % 256
        elif f == 3:
            recon = _np.empty_like(row)
            for x in range(w):
                left = recon[x - 1] if x > 0 else _np.zeros(3, dtype=_np.int64)
                recon[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif f == 4:
            recon = _np.empty_like(row)
            for x in range(w):
                for c in range(3):
                    left = int(recon[x - 1, c]) if x > 0 else 0
                    upleft = int(prev[x - 1, c]) if x > 0 else 0
                    recon[x, c] = (
                        int(row[x, c]) + _paeth(left, int(prev[x, c]), upleft)
                    ) % 256
        else:
            raise ValueError(f"unknown filter type {f} on row {y}")
        img[y] = recon
        prev = recon
    return img.astype(_np.uint8)


def _png_dims(asset_id: int) -> tuple[int, int]:
    """(width, height) as pure functions of the asset id, restatable by
    the DuckDB oracle."""
    return 6 + asset_id % 7, 3 + asset_id % 5


def _png_pixel(asset_id: int, x, y, c):
    """Channel value at (x, y) for channel c (0=R, 1=G, 2=B) — the
    integer formula the oracle recomputes in SQL."""
    return (asset_id * 17 + x * 5 + y * 11 + c * 29) % 256


def synthesize_png(asset_id: int) -> bytes:
    """A real, compressed, CRC-valid truecolor PNG with deterministic
    pixel values from `_png_pixel`; filter type rotates per row
    ((asset_id + y) % 5) so every predictor appears in the corpus."""
    w, h = _png_dims(asset_id)
    y, x, c = _np.meshgrid(
        _np.arange(h), _np.arange(w), _np.arange(3), indexing="ij"
    )
    img = _png_pixel(asset_id, x, y, c).astype(_np.uint8)
    filters = [(asset_id + yy) % 5 for yy in range(h)]
    return encode_png(img, filters=filters)


def synthesize_png_adam7(asset_id: int) -> bytes:
    """The png_pixel_stats generator image, encoded INTERLACED (Adam7):
    same pixel formula, seven-pass layout, per-row filter rotation keyed
    by the original y so every predictor appears across passes."""
    w, h = _png_dims(asset_id)
    y, x, c = _np.meshgrid(
        _np.arange(h), _np.arange(w), _np.arange(3), indexing="ij"
    )
    img = _png_pixel(asset_id, x, y, c).astype(_np.uint8)
    filters = [(asset_id + yy) % 5 for yy in range(h)]
    return encode_png_adam7(img, filters=filters)


def decode_png(payload: bytes) -> dict:
    """REAL compressed-image decode: chunk walk → inflate → unfilter.
    Integer-exact per-channel stats (RGB order)."""
    w, h, raw = _parse_png(payload)
    img = raw.astype(_np.int64)
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": int(img[:, :, 0].sum()),
        "sum_g": int(img[:, :, 1].sum()),
        "sum_b": int(img[:, :, 2].sum()),
        "peak": int(img.max()),
    }


def decode_png_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas over binary PNG payloads → per-asset pixel stats
    (same Arrow-batched lane shape as the BMP/WAV/y4m kernels)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_png(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    **{
                        k: [s[k] for s in stats]
                        for k in (
                            "width", "height", "n_pixels",
                            "sum_b", "sum_g", "sum_r", "peak",
                        )
                    },
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, IMAGE_PIXEL_SCHEMA
    )


@query(
    "png_pixel_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 6 + doc_id % 7 AS w, 3 + doc_id % 5 AS h
  FROM documents WHERE doc_id % 3 = 2
),
xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
v AS (
  SELECT doc_id, w, h,
         (doc_id * 17 + x * 5 + y * 11) % 256 AS r,
         (doc_id * 17 + x * 5 + y * 11 + 29) % 256 AS g,
         (doc_id * 17 + x * 5 + y * 11 + 58) % 256 AS b
  FROM ys
)
SELECT doc_id AS asset_id,
       CAST(MAX(w) AS BIGINT) AS width,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(MAX(w) * MAX(h) AS BIGINT) AS n_pixels,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(MAX(GREATEST(b, g, r)) AS BIGINT) AS peak
FROM v GROUP BY doc_id
""",
    tags=("multimodal", "image", "codec", "compressed"),
)
def png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end COMPRESSED image codec lane: synthesize a real
    DEFLATE-compressed, filter-predicted, CRC-chunked PNG per image
    asset (mapInPandas, binary out), then decode the bytes back through
    the chunk-walk → inflate → unfilter parser. The oracle knows nothing
    about PNG — it recomputes expected pixel values from the generator
    formula in pure SQL — so a hash match proves compression, all five
    row predictors, and the chunk framing round-tripped bit-exactly
    through the Spark binary-column path."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the PNG codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)

    png_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [synthesize_png(int(a)) for a in pdf["doc_id"]],
                }
            )

    assets = docs.select("doc_id").mapInPandas(synth, png_schema)
    return decode_png_assets(assets)


# ---------------------------------------------------------------------------
# Compressed TEXT ingestion: documents arriving as zlib-compressed binary
# payloads (the .gz shard shape a web corpus actually lands in).
# ---------------------------------------------------------------------------

_TEXT_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_chars_out", T.LongType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("text_md5", T.StringType(), True),
    ]
)


@query(
    "compressed_text_stats",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_out,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
            AS BIGINT) AS n_tokens,
       md5(text) AS text_md5
FROM documents
""",
    tags=("multimodal", "compressed-text"),
)
def compressed_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-text ingestion lane: every document is DEFLATEd into a
    binary payload (first mapInPandas — the corpus as it would land from
    a crawl, one compressed blob per doc), then a second Arrow-batched
    kernel decompresses and emits length/token/md5 stats. The oracle
    recomputes the same stats from the PLAIN text, so a hash match
    proves the bytes survived compress → binary column → shuffle-free
    pipeline → decompress exactly. At 100 TB this is the standard
    decode-at-the-edge pattern: payloads stay compressed across storage
    and the scan, and inflate only inside the per-executor kernel."""
    docs = load_table(spark, sf_dir, "documents")

    blob_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def compress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        zlib.compress(t.encode("utf-8"), 6) for t in pdf["text"]
                    ],
                }
            )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            texts = [zlib.decompress(p).decode("utf-8") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_chars_out": [len(t) for t in texts],
                    "n_tokens": [
                        sum(1 for x in t.split(" ") if x) for t in texts
                    ],
                    "text_md5": [
                        hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts
                    ],
                }
            )

    blobs = docs.select("doc_id", "text").mapInPandas(compress, blob_schema)
    return blobs.mapInPandas(stats, _TEXT_STATS_SCHEMA)


@query(
    "png_adam7_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 6 + doc_id % 7 AS w, 3 + doc_id % 5 AS h
  FROM documents WHERE doc_id % 3 = 0
),
xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
v AS (
  SELECT doc_id, w, h,
         (doc_id * 17 + x * 5 + y * 11) % 256 AS r,
         (doc_id * 17 + x * 5 + y * 11 + 29) % 256 AS g,
         (doc_id * 17 + x * 5 + y * 11 + 58) % 256 AS b
  FROM ys
)
SELECT doc_id AS asset_id,
       CAST(MAX(w) AS BIGINT) AS width,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(MAX(w) * MAX(h) AS BIGINT) AS n_pixels,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(MAX(GREATEST(b, g, r)) AS BIGINT) AS peak
FROM v GROUP BY doc_id
""",
    tags=("multimodal", "image", "codec", "compressed", "interlaced"),
)
def png_adam7_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERLACED (Adam7) PNG end to end: the same deterministic pixel
    formula as png_pixel_stats, but encoded through the SEVEN-PASS
    Adam7 grid (PNG spec clause 8.2) — each pass an independent reduced
    image with its own filter runs, empty passes contributing no bytes —
    and decoded back by the pass-aware parser that unfilters every
    reduced image and scatters it onto the grid. The oracle is the SAME
    pixel-formula SQL as the sequential lane: interlacing is pure
    LAYOUT, so a value-hash match proves the seven-pass reconstruction
    is pixel-exact (and that the progressive layout a web asset ships
    in costs nothing in fidelity). Uses the doc_id % 3 = 0 stripe so
    the corpus carries sequential and interlaced PNGs side by side.
    Plan: identical to every multimodal lane — two chained Arrow
    mapInPandas passes over a binary column, zero shuffles."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the PNG codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)

    png_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [
                        synthesize_png_adam7(int(a)) for a in pdf["doc_id"]
                    ],
                }
            )

    assets = docs.select("doc_id").mapInPandas(synth, png_schema)
    return decode_png_assets(assets)


# ---------------------------------------------------------------------------
# MDCT subband analysis over the PCM lane — the TRANSFORM stage of every
# perceptual audio codec (mp3/AAC/Vorbis): a 50%-overlapped modified DCT
# in exact fixed-point, so the engine now holds all of mp3's building
# blocks except the patented bitstream (MDCT here, scalar quantization
# in the JPEG lane, Huffman in the JPEG/DEFLATE lanes).
# ---------------------------------------------------------------------------
_MDCT_N = 8  # subbands; window = 2N with 50% overlap, hop = N

# Integer fixed-point analysis table: T[j][k] = round(w[j] * c[j][k] *
# 128) with the sine window w[j] = sin(pi*(j+1/2)/2N) and the MDCT basis
# c[j][k] = cos(pi/N * (j + 1/2 + N/2) * (k + 1/2)). Computed ONCE here
# and inlined verbatim into the oracle SQL, so both engines use the
# IDENTICAL integer table — no cross-engine trig at query time.
import math as _math  # noqa: E402

_MDCT_TABLE = [
    [
        round(
            _math.sin(_math.pi * (j + 0.5) / (2 * _MDCT_N))
            * _math.cos(
                _math.pi / _MDCT_N * (j + 0.5 + _MDCT_N / 2) * (k + 0.5)
            )
            * 128
        )
        for k in range(_MDCT_N)
    ]
    for j in range(2 * _MDCT_N)
]

_MDCT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("band", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("l1_mag", T.LongType(), True),
        T.StructField("peak_mag", T.LongType(), True),
    ]
)

_MDCT_TBL_SQL = ", ".join(
    f"({j}, {k}, {_MDCT_TABLE[j][k]})"
    for j in range(2 * _MDCT_N)
    for k in range(_MDCT_N)
)


@query(
    "audio_mdct_subband_stats",
    oracle=f"""
WITH tbl(j, k, t) AS (VALUES {_MDCT_TBL_SQL}),
d AS (
  SELECT doc_id, 256 + doc_id % 64 AS n
  FROM documents WHERE doc_id % 3 = 1
),
fr AS (
  SELECT doc_id, n,
         unnest(generate_series(0, (n - {2 * _MDCT_N}) // {_MDCT_N})) AS f
  FROM d
),
x AS (
  SELECT fr.doc_id, fr.f, tbl.k,
         CAST(SUM(tbl.t * ((fr.doc_id * 31 + (fr.f * {_MDCT_N} + tbl.j) * 7)
                           % 65536 - 32768)) AS BIGINT) AS coeff
  FROM fr JOIN tbl ON TRUE
  GROUP BY fr.doc_id, fr.f, tbl.k
)
SELECT doc_id AS asset_id, k AS band,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(ABS(coeff)) AS BIGINT) AS l1_mag,
       CAST(MAX(ABS(coeff)) AS BIGINT) AS peak_mag
FROM x GROUP BY doc_id, k
""",
    tags=("multimodal", "audio", "codec", "transform"),
)
def audio_mdct_subband_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDCT SUBBAND DECOMPOSITION of the PCM lane: {_MDCT_N}-band
    modified DCT with the sine window and 50% overlap (hop {_MDCT_N},
    window {2 * _MDCT_N}) — the analysis filterbank at the front of
    mp3/AAC/Vorbis, in exact fixed-point: the window×basis product is a
    precomputed integer table (×128, inlined into the oracle SQL
    verbatim), every coefficient is an int64 dot product of int16
    samples with that table, and the per-band statistics (L1 magnitude,
    peak) are exact integer sums — no float leaves the kernel, so the
    value hash is trig-free on both engines.

    The decode path is the REAL wav parser (`_parse_wav`): synthesize a
    valid PCM WAV per asset, ride the binary column, reconstruct the
    samples, frame, and transform — the oracle recomputes every
    coefficient from the generator formula and the same table, proving
    the whole chain sample-exact. Plan: per-asset CPU inside the Arrow
    kernel (samples never shuffle); output is assets × {_MDCT_N} tiny
    rows."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the MDCT kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)

    wav_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [synthesize_wav(int(a)) for a in pdf["doc_id"]],
                }
            )

    tbl = _np.array(_MDCT_TABLE, dtype=_np.int64)  # (2N, N)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win, hop = 2 * _MDCT_N, _MDCT_N
        for pdf in batches:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                _rate, s = _parse_wav(p)
                s = s.astype(_np.int64)
                nf = (s.size - win) // hop + 1
                # (nf, 2N) strided frame matrix @ (2N, N) table
                frames = _np.stack([s[f * hop : f * hop + win] for f in range(nf)])
                coeffs = frames @ tbl  # (nf, N) exact int64
                mags = _np.abs(coeffs)
                for k in range(_MDCT_N):
                    rows.append(
                        (
                            int(a),
                            k,
                            nf,
                            int(mags[:, k].sum()),
                            int(mags[:, k].max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "band", "n_frames", "l1_mag", "peak_mag"],
            )

    assets = docs.select("doc_id").mapInPandas(synth, wav_schema)
    return assets.mapInPandas(kernel, _MDCT_SCHEMA)


# ---------------------------------------------------------------------------
# 2D Haar wavelet decomposition over the BMP lane — the JPEG2000 DWT
# building block, completing the engine's transform matrix: 1D DCT
# (JPEG), MDCT (audio), 1D Haar (tape), and now the 2D separable DWT.
# Unnormalized (no /2 anywhere) so every coefficient is an exact int64
# signed pixel sum.
# ---------------------------------------------------------------------------
_HAAR2D_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("level", T.LongType(), False),
        T.StructField("band", T.StringType(), False),
        T.StructField("n_blocks", T.LongType(), True),
        T.StructField("l1_mag", T.LongType(), True),
        T.StructField("peak_mag", T.LongType(), True),
    ]
)

# (band, x-filter-is-high, y-filter-is-high); LL emitted only at the
# coarsest level, per the standard DWT pyramid
_HAAR2D_BANDS = [("LH", 0, 1), ("HL", 1, 0), ("HH", 1, 1)]
_HAAR2D_LEVELS = 2


@query(
    "image_haar2d_energy",
    oracle="""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 3 = 0
),
lv(lvl) AS (VALUES (1), (2)),
bands(band, hx, hy, blvl) AS (
  VALUES ('LH', 0, 1, 1), ('HL', 1, 0, 1), ('HH', 1, 1, 1),
         ('LH', 0, 1, 2), ('HL', 1, 0, 2), ('HH', 1, 1, 2),
         ('LL', 0, 0, 2)
),
xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y
       FROM xs),
px AS (
  SELECT doc_id, w, h, x, y,
         (doc_id * 13 + x * 3 + y * 7) % 256 AS p
  FROM ys
),
terms AS (
  SELECT px.doc_id, b.blvl AS lvl, b.band,
         px.x // (1 << b.blvl) AS bx, px.y // (1 << b.blvl) AS by,
         (CASE WHEN b.hx = 1
               AND (px.x // (1 << (b.blvl - 1))) % 2 = 1
               THEN -1 ELSE 1 END
          * CASE WHEN b.hy = 1
                 AND (px.y // (1 << (b.blvl - 1))) % 2 = 1
                 THEN -1 ELSE 1 END) * px.p AS s
  FROM px JOIN bands b ON TRUE
  WHERE px.x < (px.w // (1 << b.blvl)) * (1 << b.blvl)
    AND px.y < (px.h // (1 << b.blvl)) * (1 << b.blvl)
),
coeff AS (
  SELECT doc_id, lvl, band, bx, by, CAST(SUM(s) AS BIGINT) AS c
  FROM terms GROUP BY doc_id, lvl, band, bx, by
)
SELECT doc_id AS asset_id, CAST(lvl AS BIGINT) AS level, band,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(ABS(c)) AS BIGINT) AS l1_mag,
       CAST(MAX(ABS(c)) AS BIGINT) AS peak_mag
FROM coeff GROUP BY doc_id, lvl, band
""",
    tags=("multimodal", "image", "codec", "transform"),
)
def image_haar2d_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level 2D HAAR WAVELET decomposition of the decoded image
    (blue plane): detail subbands LH/HL/HH per level plus the final LL
    approximation — the separable DWT pyramid at the heart of JPEG2000,
    in the unnormalized integer form (every coefficient is a ±1-signed
    pixel sum over its dyadic block, no division), so the whole
    transform is exact int64 and the value hash needs no tolerance.
    Per-(level, band) L1 magnitude and peak quantify where the image's
    variation lives by SCALE and ORIENTATION — the texture/edge
    statistics an image-curation pipeline filters on (flat renders,
    noise-dominated scans), the 2D sibling of the tape family's
    haar_energy_decomposition.

    The decode path is the REAL BMP parser; partial edge blocks are
    truncated (only complete 2^l x 2^l blocks transform, both engines
    by the same floor arithmetic). Plan: per-asset CPU inside the
    Arrow codec kernel — pixels never shuffle; output is 7 small rows
    per asset. Oracle recomputes every coefficient from the pixel
    generator formula with the identical sign algebra."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the Haar kernels")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)

    bmp_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [synthesize_bmp(int(a)) for a in pdf["doc_id"]],
                }
            )

    def _subband_rows(a: int, plane) -> list[tuple]:
        h, w = plane.shape
        out = []
        for lvl in range(1, _HAAR2D_LEVELS + 1):
            blk = 1 << lvl
            half = 1 << (lvl - 1)
            wb, hb = w // blk, h // blk
            if wb == 0 or hb == 0:
                continue
            crop = plane[: hb * blk, : wb * blk]
            xs = _np.arange(wb * blk)
            ys = _np.arange(hb * blk)
            sx_hi = 1 - 2 * ((xs // half) % 2)
            sy_hi = 1 - 2 * ((ys // half) % 2)
            bands = list(_HAAR2D_BANDS) + (
                [("LL", 0, 0)] if lvl == _HAAR2D_LEVELS else []
            )
            for band, hx, hy in bands:
                sx = sx_hi if hx else _np.ones_like(xs)
                sy = sy_hi if hy else _np.ones_like(ys)
                signed = crop * sx[None, :] * sy[:, None]
                c = signed.reshape(hb, blk, wb, blk).sum(axis=(1, 3))
                mags = _np.abs(c)
                out.append(
                    (a, lvl, band, int(c.size), int(mags.sum()),
                     int(mags.max()))
                )
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                w, h, raw = _parse_bmp(p)
                rows.extend(
                    _subband_rows(int(a), raw[:, :, 0].astype(_np.int64))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "level", "band",
                    "n_blocks", "l1_mag", "peak_mag",
                ],
            )

    assets = docs.select("doc_id").mapInPandas(synth, bmp_schema)
    return assets.mapInPandas(kernel, _HAAR2D_SCHEMA)
