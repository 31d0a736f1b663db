"""Perceptual near-duplicate detection for MEDIA content — the modality
dedup lane the text family already has (exact/MinHash/SimHash/substring):

- `image_phash_neardup` — difference-hash (dHash) fingerprints computed
  from REAL decoded pixels (the BMP codec lane in `multimodal.py`), with
  near-dup pairs found by the same banded Hamming-distance equi-join the
  SimHash text tier uses (`dedup.py:SIMHASH_BANDS`) — so re-encoded,
  resized, or brightness-shifted copies of an image dedup the way
  near-dup text does.
- `audio_fingerprint_neardup` — frame-energy contour fingerprints over
  REAL decoded PCM (the WAV codec lane), same banded Hamming join — so
  resampled/regained copies of a clip dedup too.

Reference parity: the reference has no multimodal dedup at all (its
media handling stops at byte transport, `database/broker/receiver.py`);
this lane is part of the §2.11 training-data-pipeline extension family
(VERDICT r7 task 3/7). The architecture is the standard pHash pipeline
(Krawetz's dHash; Haitsma–Kalker energy-contour audio prints) expressed
Spark-first.

Scale shape (100 TB): pixels/samples NEVER shuffle — payload bytes live
only inside the Arrow-batched mapInPandas kernels, which emit one 64-bit
integer per asset. The only exchanges are over (asset_id, fingerprint)
and the band buckets; candidate volume is Σ bucket², never N², and the
pigeonhole banding (4 bands, Hamming ≤ 3) is EXACT — every qualifying
pair shares at least one full band, so the banded join provably loses
nothing vs the quadratic definition (the oracle states the quadratic
form, proving exactly that).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import query
from ..sources.tables import load_table
from .multimodal import (
    _HAS_NUMPY,
    _encode_bmp,
    _parse_bmp,
    _parse_wav,
    _parse_y4m,
    resample_audio,
)
from .multimodal import resize_image

if _HAS_NUMPY:
    import numpy as _np

# ---------------------------------------------------------------------------
# Image dHash: 8x8 sample grid -> 8 rows x 7 column-gradient bits = 56-bit
# fingerprint. Brightness-shift invariant by construction (comparisons,
# not values); resize-invariant because the nearest-neighbor index map
# src = (dst*in) div out COMPOSES with the grid sampling ((a//m)//n ==
# a//(m*n)), so an integer-upscaled copy has the IDENTICAL hash.
# ---------------------------------------------------------------------------

DHASH_GRID = 8
DHASH_BITS = DHASH_GRID * (DHASH_GRID - 1)  # 56
DHASH_MAX_HAMMING = 3
DHASH_BANDS = 4  # 4 bands x 14 bits: <=3 flipped bits touch <=3 bands,
#                  so every qualifying pair shares >=1 exact band
_DHASH_BAND_BITS = DHASH_BITS // DHASH_BANDS


def dhash56(payload: bytes) -> int:
    """dHash of a decoded BMP payload: grayscale (b+g+r)//3, 8x8
    nearest-neighbor sample grid (sx = x*w div 8), bit y*7+x set iff
    gray[y][x+1] > gray[y][x]. All-integer, so the DuckDB oracle can
    restate it over the pixel generator formula."""
    w, h, img = _parse_bmp(payload)
    gray = (
        img[:, :, 0].astype(_np.int64)
        + img[:, :, 1].astype(_np.int64)
        + img[:, :, 2].astype(_np.int64)
    ) // 3
    sx = (_np.arange(DHASH_GRID) * w) // DHASH_GRID
    sy = (_np.arange(DHASH_GRID) * h) // DHASH_GRID
    sub = gray[_np.ix_(sy, sx)]
    bits = sub[:, 1:] > sub[:, :-1]  # (8, 7) row-major
    j = _np.arange(DHASH_GRID - 1)  # x component of bit index
    out = 0
    for y in range(DHASH_GRID):
        row = bits[y]
        out += int(((1 << (y * (DHASH_GRID - 1) + j)) * row).sum())
    return out


# Per-doc image corpus for the near-dup query. Its OWN pixel generator
# (not `_bmp_pixel`): that formula is linear in (x, y), so distinct docs
# produce gradient fields that differ only by a constant — dHash is
# deliberately invariant to exactly that, and every doc would near-dup
# every doc. The quadratic + doc-multiplied terms decorrelate docs while
# staying a pure-SQL integer formula for the oracle.


def _phash_dims(doc_id: int) -> tuple[int, int]:
    return 16 + doc_id % 5, 12 + doc_id % 5


def _phash_pixel(doc_id: int, x, y, c):
    """Channel value at (x, y), c in (0=B, 1=G, 2=R); elementwise on
    NumPy arrays as well as scalars."""
    return (
        doc_id * 13 + 3 * x * x + 7 * y * y + (doc_id % 31) * x * y + c * 101
    ) % 256


def synthesize_phash_bmp(doc_id: int) -> bytes:
    w, h = _phash_dims(doc_id)
    y, x, c = _np.meshgrid(
        _np.arange(h), _np.arange(w), _np.arange(3), indexing="ij"
    )
    return _encode_bmp(_phash_pixel(doc_id, x, y, c).astype(_np.uint8))


def brightness_variant(payload: bytes, delta: int = 4) -> bytes:
    """Saturating per-channel brightness shift on the DECODED pixels,
    re-encoded as a valid BMP — the 're-encoded copy' a perceptual hash
    must keep in the same bucket."""
    _, _, img = _parse_bmp(payload)
    shifted = _np.minimum(img.astype(_np.int16) + delta, 255).astype(_np.uint8)
    return _encode_bmp(shifted)


_PHASH_KINDS = 3  # 0 = original, 1 = 2x nearest-neighbor resize, 2 = +4 brightness


_SIG_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), False),
    ]
)

_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _subband_keys(
    sig: DataFrame,
    col: str,
    id_alias: str,
    h_alias: str,
    n_bands: int,
    band_bits: int,
    max_hamming: int,
) -> DataFrame:
    """Two-level pigeonhole bucketing (VERDICT r9 task 1 — the
    multi-index-hashing refinement): for each clean-band hypothesis b,
    the pair's remaining <= max_hamming errors live in the OTHER bands'
    (n_bands-1)*band_bits concatenated bits; splitting that complement
    into max_hamming+1 sub-blocks guarantees one clean sub-block. Bucket
    key = (b, s, band_val_b, sub_val_{b,s}) — band_bits + ~comp/n_sub
    key bits instead of band_bits, so bucket populations shrink by
    ~2^sub_bits exactly where single-level banding saturates (the r9
    gate curve: candidates/incoming 0.50 -> 7.70 over sf0.01 -> sf3).
    Cost: n_bands*(max_hamming+1) narrow rows per asset instead of
    n_bands — the classic multi-index memory trade. Exactness: every
    pair within max_hamming shares >= 1 (b, s) bucket (double
    pigeonhole); no false negatives, and false positives are removed by
    the exact bit_count verify downstream."""
    n_sub = max_hamming + 1
    comp_bits = (n_bands - 1) * band_bits
    band_of = [
        F.shiftright(F.col(col), b * band_bits).bitwiseAND((1 << band_bits) - 1)
        for b in range(n_bands)
    ]
    keys = []
    for b in range(n_bands):
        # the complement: the other bands' values concatenated, low-first
        comp = F.lit(0).cast("long")
        pos = 0
        for j in range(n_bands):
            if j == b:
                continue
            comp = comp + F.shiftleft(band_of[j].cast("long"), pos)
            pos += band_bits
        # partition comp_bits into n_sub contiguous blocks (widths differ
        # by at most 1); a block may be empty only if comp_bits < n_sub
        base_w, rem = divmod(comp_bits, n_sub)
        off = 0
        for s in range(n_sub):
            w = base_w + (1 if s < rem else 0)
            sub_val = (
                F.shiftright(comp, off).bitwiseAND((1 << max(w, 1)) - 1)
                if w > 0
                else F.lit(0).cast("long")
            )
            keys.append(
                F.struct(
                    F.lit(b * n_sub + s).alias("bucket_id"),
                    band_of[b].cast("long").alias("band_val"),
                    sub_val.cast("long").alias("sub_val"),
                )
            )
            off += w
    return sig.select(
        F.col("asset_id").alias(id_alias),
        F.col(col).alias(h_alias),
        F.explode(F.array(*keys)).alias("k"),
    ).select(id_alias, h_alias, "k.bucket_id", "k.band_val", "k.sub_val")


def _hamming_band_pairs(
    sig: DataFrame, col: str, n_bands: int, band_bits: int, max_hamming: int
) -> DataFrame:
    """Banded Hamming-distance self-join (the SimHash machinery,
    `dedup.py:530`, generalized) with the two-level sub-band bucketing
    of `_subband_keys`: equi-join on (bucket_id, band_val, sub_val),
    verify with exact bit_count, THEN distinct — only qualifying pairs
    ever reach the dedup exchange, so the shuffled volume is O(true
    matches), not O(band candidates). Exact (double pigeonhole) when
    max_hamming < n_bands."""
    keyed = _subband_keys(
        sig, col, "asset_id", "h", n_bands, band_bits, max_hamming
    )
    a = keyed.select(
        F.col("asset_id").alias("id_a"), F.col("h").alias("h_a"),
        "bucket_id", "band_val", "sub_val",
    ).alias("a")
    b = keyed.select(
        F.col("asset_id").alias("id_b"), F.col("h").alias("h_b"),
        "bucket_id", "band_val", "sub_val",
    ).alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket_id") == F.col("b.bucket_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.sub_val") == F.col("b.sub_val"))
            & (F.col("a.id_a") < F.col("b.id_b")),
        )
        .select(
            F.col("a.id_a").alias("asset_a"),
            F.col("b.id_b").alias("asset_b"),
            F.bit_count(F.col("a.h_a").bitwiseXOR(F.col("b.h_b")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


_PHASH_ORACLE = f"""
WITH d AS (
  SELECT doc_id, 16 + doc_id % 5 AS w, 12 + doc_id % 5 AS h
  FROM documents WHERE doc_id % 4 = 0
),
k AS (SELECT doc_id, w, h, unnest([0, 1, 2]) AS kind FROM d),
gx AS (SELECT doc_id, w, h, kind, unnest(generate_series(0, {DHASH_GRID - 1})) AS x FROM k),
grid AS (
  SELECT doc_id, w, h, kind, x,
         unnest(generate_series(0, {DHASH_GRID - 1})) AS y
  FROM gx
),
pv AS (
  SELECT doc_id, kind, x, y,
         (doc_id * 13 + 3 * ((x * w) // {DHASH_GRID}) * ((x * w) // {DHASH_GRID})
            + 7 * ((y * h) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
            + (doc_id % 31) * ((x * w) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
         ) % 256 AS v
  FROM grid
),
gray AS (
  SELECT doc_id, kind, x, y,
         CASE WHEN kind <= 1
              THEN (v + (v + 101) % 256 + (v + 202) % 256) // 3
              ELSE (LEAST(v + 4, 255) + LEAST((v + 101) % 256 + 4, 255)
                    + LEAST((v + 202) % 256 + 4, 255)) // 3 END AS g
  FROM pv
),
bits AS (
  SELECT l.doc_id, l.kind, l.y * {DHASH_GRID - 1} + l.x AS j
  FROM gray l JOIN gray r
    ON r.doc_id = l.doc_id AND r.kind = l.kind AND r.y = l.y AND r.x = l.x + 1
  WHERE l.x <= {DHASH_GRID - 2} AND r.g > l.g
),
sig AS (
  SELECT k.doc_id * {_PHASH_KINDS} + k.kind AS asset_id,
         COALESCE(SUM(CAST(1 AS BIGINT) << j), 0) AS dhash
  FROM k LEFT JOIN bits ON bits.doc_id = k.doc_id AND bits.kind = k.kind
  GROUP BY 1
)
SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {DHASH_MAX_HAMMING}
"""


@query(
    "image_phash_neardup",
    oracle=_PHASH_ORACLE,
    tags=("multimodal", "image", "dedup", "perceptual"),
)
def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image perceptual near-dup dedup over the REAL codec lane: per
    selected document, synthesize THREE image assets — the original BMP,
    a 2x nearest-neighbor-resized re-encode (`resize_image`), and a
    saturating +4 brightness re-encode — as binary payloads; decode each
    through the real BMP parser and dHash the decoded pixels; find all
    near-dup pairs (Hamming <= 3 over the 56-bit hash) with the banded
    Hamming equi-join.

    What the oracle proves: it recomputes both hashes from the pixel
    GENERATOR formula in pure SQL — for the resized copy it uses the
    SAME gray expression as the original, because the integer index map
    src = (dst*in) div out composes with the 8-point sampling grid
    ((a//m)//n == a//(mn)) — so a hash match proves the engine's
    decode -> resize -> re-encode -> decode -> hash chain preserved the
    fingerprint EXACTLY (resized pairs surface at hamming = 0), and that
    the banded join loses no qualifying pair vs the quadratic
    definition. Brightness copies surface at small hamming (comparisons
    shift together except at channel-saturation pixels).

    Scale shape: pixels never shuffle — payloads exist only inside the
    two chained mapInPandas kernels (synthesize, then decode+hash; one
    narrow pipeline, no exchange between them); the band join shuffles
    56-bit integers and joins buckets of bounded size. At 100 TB the
    same plan holds with payloads read from parquet binary columns.
    Reference anchor: no equivalent exists (`database/broker/receiver.py`
    moves media bytes, never inspects them); north-star family per
    BASELINE.json.
    """
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the BMP codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 0
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for a in pdf["doc_id"]:
                doc = int(a)
                orig = synthesize_phash_bmp(doc)
                w, h = _phash_dims(doc)
                for kind, p in (
                    (0, orig),
                    (1, resize_image(orig, 2 * w, 2 * h)),
                    (2, brightness_variant(orig)),
                ):
                    ids.append(doc * _PHASH_KINDS + kind)
                    payloads.append(p)
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = docs.select("doc_id").mapInPandas(synth, _ASSET_SCHEMA)

    def hash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "dhash": [dhash56(p) for p in pdf["payload"]],
                }
            )

    sig = assets.mapInPandas(hash_kernel, _SIG_SCHEMA).persist()
    return _hamming_band_pairs(
        sig, "dhash", DHASH_BANDS, _DHASH_BAND_BITS, DHASH_MAX_HAMMING
    )


# ---------------------------------------------------------------------------
# Audio energy-contour fingerprint: 34 time frames over the decoded PCM,
# 32 SECOND-DIFFERENCE bits (E[f+2]-E[f+1] > E[f+1]-E[f]) — first
# differences are biased by any energy drift; second differences are the
# drift-free contour-shape signal (the Haitsma–Kalker trick). Gain
# changes scale every frame energy together, so strict comparisons are
# preserved; a linear-interpolation resample roughly doubles every frame
# energy (midpoints of a piecewise-smooth signal carry the same local
# power), so the contour survives that too.
# ---------------------------------------------------------------------------

AUDIO_FP_FRAMES = 34
AUDIO_FP_BITS = AUDIO_FP_FRAMES - 2  # 32
AUDIO_FP_MAX_HAMMING = 3
AUDIO_FP_BANDS = 4  # 4 bands x 8 bits; pigeonhole-exact at distance <= 3
_AUDIO_FP_BAND_BITS = AUDIO_FP_BITS // AUDIO_FP_BANDS
_AUDIO_SEG = 32  # envelope segment length (samples) in the synthetic corpus
_AUDIO_RATE = 16_000


def audio_fingerprint32(payload: bytes) -> int:
    """Energy-contour fingerprint of a decoded WAV payload — all-integer
    (frame energies are int64 sums of squares; frame of sample i is
    (i * 34) div n), so the DuckDB oracle can restate it exactly."""
    _, x = _parse_wav(payload)
    n = int(x.size)
    f = (_np.arange(n) * AUDIO_FP_FRAMES) // n
    e = _np.zeros(AUDIO_FP_FRAMES, dtype=_np.int64)
    _np.add.at(e, f, x * x)
    bits = (e[2:] - e[1:-1]) > (e[1:-1] - e[:-2])
    return int(((1 << _np.arange(AUDIO_FP_BITS)) * bits).sum())


def _audio_fp_n(doc_id: int) -> int:
    return 2048 + doc_id % 256


def _audio_fp_samples(doc_id: int):
    """Two-scale clip: an md5-hashed amplitude per 32-sample segment,
    held constant within the segment. The piecewise-constant envelope is
    what makes the construction honest BOTH ways: segment amplitudes are
    hash-random (cross-doc fingerprints decorrelate — a congruential
    generator makes every doc a time-shift of one universal walk and
    everything near-dups everything, measured), while within a segment
    linear interpolation is exact (resampled copies keep the contour)."""
    import hashlib

    n = _audio_fp_n(doc_id)
    segs = [
        (int(hashlib.md5(f"{doc_id}_{g}".encode()).hexdigest()[:8], 16) % 1024)
        - 512
        for g in range((n + _AUDIO_SEG - 1) // _AUDIO_SEG)
    ]
    return _np.repeat(_np.array(segs, dtype=_np.int64), _AUDIO_SEG)[:n]


def _encode_wav(samples, rate: int) -> bytes:
    """16-bit mono PCM RIFF/WAVE container around an int array (the
    encoder half of the `multimodal._parse_wav` codec lane)."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def synthesize_fp_wav(doc_id: int) -> bytes:
    return _encode_wav(_audio_fp_samples(doc_id), _AUDIO_RATE)


def gain_variant(payload: bytes) -> bytes:
    """Truncating half-gain re-encode (sign * (|x| div 2) — the SQL
    `//`-on-each-sign-branch form, so the oracle restates it exactly):
    the 'same clip, quieter' copy a perceptual audio hash must keep in
    the same bucket."""
    rate, x = _parse_wav(payload)
    y = _np.sign(x) * (_np.abs(x) // 2)
    return _encode_wav(y, rate)


_AUDIO_KINDS = 3  # 0 = original, 1 = 2x-rate linear resample, 2 = half gain


_AUDIO_SIG_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("afp", T.LongType(), False),
    ]
)


_AUDIO_FP_ORACLE = f"""
WITH d AS (
  SELECT doc_id, 2048 + doc_id % 256 AS n
  FROM documents WHERE doc_id % 4 = 1
),
seg AS (
  SELECT doc_id, n, unnest(generate_series(0, (n - 1) // {_AUDIO_SEG})) AS g
  FROM d
),
amp AS (
  SELECT doc_id, n, g,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_'
                                    || CAST(g AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1024) - 512 AS a
  FROM seg
),
x AS (
  SELECT doc_id, n, g * {_AUDIO_SEG} + o AS i, a AS v
  FROM (SELECT *, unnest(generate_series(0, {_AUDIO_SEG - 1})) AS o FROM amp)
  WHERE g * {_AUDIO_SEG} + o < n
),
s0 AS (SELECT doc_id, 0 AS kind, n AS sn, i, v FROM x),
s2 AS (
  SELECT doc_id, 2 AS kind, n AS sn, i,
         CASE WHEN v >= 0 THEN v // 2 ELSE -((-v) // 2) END AS v
  FROM x
),
uj AS (
  SELECT doc_id, n, 2 * n - 1 AS sn,
         unnest(generate_series(0, 2 * n - 2)) AS j
  FROM d
),
s1 AS (
  SELECT uj.doc_id, 1 AS kind, uj.sn, uj.j AS i,
         CASE WHEN uj.j % 2 = 0 THEN xa.v
              ELSE xa.v + CAST(FLOOR((xb.v - xa.v) / 2.0) AS BIGINT) END AS v
  FROM uj
  JOIN x xa ON xa.doc_id = uj.doc_id AND xa.i = uj.j // 2
  JOIN x xb ON xb.doc_id = uj.doc_id
           AND xb.i = LEAST(uj.j // 2 + 1, uj.n - 1)
),
alls AS (
  SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
),
fe AS (
  SELECT doc_id, kind, (i * {AUDIO_FP_FRAMES}) // sn AS f, SUM(v * v) AS e
  FROM alls GROUP BY 1, 2, 3
),
bits AS (
  SELECT a.doc_id, a.kind, a.f AS j
  FROM fe a
  JOIN fe b ON b.doc_id = a.doc_id AND b.kind = a.kind AND b.f = a.f + 1
  JOIN fe c ON c.doc_id = a.doc_id AND c.kind = a.kind AND c.f = a.f + 2
  WHERE (c.e - b.e) > (b.e - a.e)
),
k AS (SELECT doc_id, unnest([0, 1, 2]) AS kind FROM d),
sig AS (
  SELECT k.doc_id * {_AUDIO_KINDS} + k.kind AS asset_id,
         COALESCE(SUM(CAST(1 AS BIGINT) << j), 0) AS afp
  FROM k LEFT JOIN bits ON bits.doc_id = k.doc_id AND bits.kind = k.kind
  GROUP BY 1
)
SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.afp, b.afp)) <= {AUDIO_FP_MAX_HAMMING}
"""


@query(
    "audio_fingerprint_neardup",
    oracle=_AUDIO_FP_ORACLE,
    tags=("multimodal", "audio", "dedup", "perceptual"),
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio perceptual near-dup dedup over the REAL PCM codec lane
    (VERDICT r7 task 7 — completing the modality dedup story: text has
    four tiers, images have `image_phash_neardup`, this adds audio): per
    selected document synthesize THREE WAV assets — the original clip, a
    2x-rate re-encode through the real linear-interpolation resampler
    (`multimodal.resample_audio`), and a truncating half-gain re-encode —
    decode each through the real RIFF/WAVE parser, fingerprint the
    decoded samples with the 32-bit second-difference energy contour,
    and find all pairs within Hamming <= 3 via the banded Hamming
    equi-join (4 x 8-bit bands, pigeonhole-exact).

    The oracle restates the WHOLE chain in SQL — the md5 segment
    envelope, the resampler's exact integer interpolation
    (y = s1 + floor((s2-s1)*frac/dst), stated with FLOOR over an exact
    float-by-2 division because SQL `//` truncates while the kernel
    floors), the sign-split truncating gain, frame energies, and the
    quadratic pair definition — so a hash match proves the engine's
    synth -> encode -> resample/gain -> re-encode -> decode ->
    fingerprint chain end-to-end AND that the banding loses no
    qualifying pair.

    Scale shape: samples never shuffle — payloads exist only inside the
    chained mapInPandas kernels; the exchanges carry (asset_id, 32-bit
    fingerprint) and band buckets. Reference anchor: none exists (the
    reference never inspects media bytes); north-star family per
    BASELINE.json."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the WAV codec kernels")
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 1
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for a in pdf["doc_id"]:
                doc = int(a)
                orig = synthesize_fp_wav(doc)
                for kind, p in (
                    (0, orig),
                    (1, resample_audio(orig, 2 * _AUDIO_RATE)),
                    (2, gain_variant(orig)),
                ):
                    ids.append(doc * _AUDIO_KINDS + kind)
                    payloads.append(p)
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = docs.select("doc_id").mapInPandas(synth, _ASSET_SCHEMA)

    def hash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "afp": [audio_fingerprint32(p) for p in pdf["payload"]],
                }
            )

    sig = assets.mapInPandas(hash_kernel, _AUDIO_SIG_SCHEMA).persist()
    return _hamming_band_pairs(
        sig, "afp", AUDIO_FP_BANDS, _AUDIO_FP_BAND_BITS, AUDIO_FP_MAX_HAMMING
    )


# ---------------------------------------------------------------------------
# Video temporal-majority dHash: per-frame 56-bit luma dHash, combined by
# MAJORITY VOTE per bit across frames — the scene fingerprint survives
# frame dropping (a stride-2 copy votes over a subset of near-identical
# per-frame hashes) and global luma shifts (dHash compares, not values).
# ---------------------------------------------------------------------------

VDHASH_BITS = DHASH_BITS  # 56, same per-frame geometry as the image tier
VDHASH_MAX_HAMMING = 6
VDHASH_BANDS = 7  # 7 bands x 8 bits: pigeonhole-exact at distance <= 6
_VDHASH_BAND_BITS = VDHASH_BITS // VDHASH_BANDS


def _frame_dhash_bits(gray, w: int, h: int):
    sx = (_np.arange(DHASH_GRID) * w) // DHASH_GRID
    sy = (_np.arange(DHASH_GRID) * h) // DHASH_GRID
    sub = gray[_np.ix_(sy, sx)]
    return (sub[:, 1:] > sub[:, :-1]).reshape(-1)  # 56 bits row-major


def video_dhash56(payload: bytes) -> int:
    """Temporal-majority dHash of a decoded y4m payload: per-frame luma
    dHash bits, majority-voted per bit position (strict — a 50/50 tie
    votes 0). All-integer, oracle-restatable."""
    w, h, yuv = _parse_y4m(payload)
    luma = yuv[0]
    nf = int(luma.shape[0])
    votes = _np.zeros(VDHASH_BITS, dtype=_np.int64)
    for t in range(nf):
        votes += _frame_dhash_bits(luma[t], w, h)
    bits = votes * 2 > nf
    return int(((1 << _np.arange(VDHASH_BITS)) * bits).sum())


def _vhash_dims(doc_id: int) -> tuple[int, int, int]:
    return 16 + doc_id % 5, 12 + doc_id % 5, 8 + doc_id % 5


def _vhash_luma(doc_id: int, t, x, y):
    """Luma at (x, y) of frame t. Spatial coefficients are doc-MODULATED
    ((3 + doc%11)x² etc.), not just doc-shifted: a constant-shift family
    is exactly what dHash is invariant to, and with the plain `_y4m_pixel`
    formula every doc near-dups every doc (measured). The +3t term is a
    slow global brightness drift, so frames genuinely differ while
    per-frame hashes stay majority-stable. Elementwise on arrays."""
    return (
        doc_id * 13
        + (3 + doc_id % 11) * x * x
        + (7 + doc_id % 17) * y * y
        + (doc_id % 31) * x * y
        + 3 * t
    ) % 256


def _encode_y4m(y, u, v) -> bytes:
    """YUV4MPEG2 C444 container around (frames, h, w) uint8 planes (the
    encoder half of the `multimodal._parse_y4m` codec lane)."""
    nf, h, w = y.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode("ascii"))
    for t in range(nf):
        out += b"FRAME\n"
        for plane in (y, u, v):
            out += plane[t].astype(_np.uint8).tobytes()
    return bytes(out)


def synthesize_vhash_y4m(doc_id: int) -> bytes:
    w, h, nf = _vhash_dims(doc_id)
    t, yy, xx = _np.meshgrid(
        _np.arange(nf), _np.arange(h), _np.arange(w), indexing="ij"
    )
    base = _vhash_luma(doc_id, t, xx, yy)
    return _encode_y4m(
        base.astype(_np.uint8),
        ((base + 101) % 256).astype(_np.uint8),
        ((base + 202) % 256).astype(_np.uint8),
    )


def luma_brightness_variant(payload: bytes, delta: int = 4) -> bytes:
    """Saturating luma-shift re-encode (U/V untouched) — the 'same clip,
    brighter' copy a video fingerprint must keep in the same bucket."""
    _, _, yuv = _parse_y4m(payload)
    y = _np.minimum(yuv[0] + delta, 255)
    return _encode_y4m(y, yuv[1], yuv[2])


_VDHASH_KINDS = 3  # 0 = original, 1 = stride-2 frame sample, 2 = +4 luma


_VSIG_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("vh", T.LongType(), False),
    ]
)


_VDHASH_ORACLE = f"""
WITH d AS (
  SELECT doc_id, 16 + doc_id % 5 AS w, 12 + doc_id % 5 AS h,
         8 + doc_id % 5 AS nf
  FROM documents WHERE doc_id % 4 = 2
),
k AS (SELECT doc_id, w, h, nf, unnest([0, 1, 2]) AS kind FROM d),
fr AS (
  SELECT doc_id, w, h, nf, kind, unnest(generate_series(0, nf - 1)) AS t
  FROM k
),
fr2 AS (SELECT * FROM fr WHERE kind <> 1 OR t % 2 = 0),
gx AS (SELECT *, unnest(generate_series(0, {DHASH_GRID - 1})) AS x FROM fr2),
grid AS (SELECT *, unnest(generate_series(0, {DHASH_GRID - 1})) AS y FROM gx),
pv AS (
  SELECT doc_id, kind, t, x, y,
         (doc_id * 13
            + (3 + doc_id % 11) * ((x * w) // {DHASH_GRID}) * ((x * w) // {DHASH_GRID})
            + (7 + doc_id % 17) * ((y * h) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
            + (doc_id % 31) * ((x * w) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
            + 3 * t) % 256 AS v
  FROM grid
),
lum AS (
  SELECT doc_id, kind, t, x, y,
         CASE WHEN kind = 2 THEN LEAST(v + 4, 255) ELSE v END AS g
  FROM pv
),
fbits AS (
  SELECT l.doc_id, l.kind, l.t, l.y * {DHASH_GRID - 1} + l.x AS j,
         CASE WHEN r.g > l.g THEN 1 ELSE 0 END AS bit
  FROM lum l JOIN lum r
    ON r.doc_id = l.doc_id AND r.kind = l.kind AND r.t = l.t
   AND r.y = l.y AND r.x = l.x + 1
  WHERE l.x <= {DHASH_GRID - 2}
),
maj AS (
  SELECT doc_id, kind, j,
         CASE WHEN SUM(bit) * 2 > COUNT(*) THEN 1 ELSE 0 END AS mbit
  FROM fbits GROUP BY 1, 2, 3
),
sig AS (
  SELECT doc_id * {_VDHASH_KINDS} + kind AS asset_id,
         SUM(CASE WHEN mbit = 1 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS vh
  FROM maj GROUP BY 1
)
SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
       CAST(bit_count(xor(a.vh, b.vh)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.vh, b.vh)) <= {VDHASH_MAX_HAMMING}
"""


@query(
    "video_vhash_neardup",
    oracle=_VDHASH_ORACLE,
    tags=("multimodal", "video", "dedup", "perceptual"),
)
def video_vhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video perceptual near-dup dedup over the REAL y4m codec lane —
    completing the modality dedup matrix (text: 4 tiers; image:
    `image_phash_neardup`; audio: `audio_fingerprint_neardup`; video:
    this): per selected document synthesize THREE y4m assets — the
    original clip, a stride-2 frame-sampled re-encode through the real
    frame-sampling lane (`multimodal.sample_frames_y4m` — the
    'different frame rate' copy), and a saturating +4 luma re-encode —
    decode each through the real y4m demuxer, fingerprint with the
    56-bit temporal-majority dHash, and find all pairs within
    Hamming <= 6 via the banded Hamming equi-join (7 x 8-bit bands,
    pigeonhole-exact at distance <= 6).

    The oracle recomputes per-frame dHash bits and the majority vote
    from the luma generator formula in pure SQL (for the frame-sampled
    copy it votes over exactly the even frames), so a hash match proves
    the synth -> demux -> sample/shift -> re-encode -> demux ->
    majority-hash chain end-to-end and that the banding loses no
    qualifying pair. Measured over the full sf0.1 doc range: luma-shift
    copies hash identically, frame-dropped copies stay within Hamming 5,
    cross-doc pairs never fall inside the threshold.

    Scale shape: frames never shuffle — payloads exist only inside the
    chained mapInPandas kernels; exchanges carry (asset_id, 56-bit
    fingerprint) and band buckets. Reference anchor: none (the reference
    never inspects media bytes); north-star family per BASELINE.json."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the y4m codec kernels")
    from .multimodal import sample_frames_y4m

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 2
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for a in pdf["doc_id"]:
                doc = int(a)
                orig = synthesize_vhash_y4m(doc)
                for kind, p in (
                    (0, orig),
                    (1, sample_frames_y4m(orig, stride=2)),
                    (2, luma_brightness_variant(orig)),
                ):
                    ids.append(doc * _VDHASH_KINDS + kind)
                    payloads.append(p)
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = docs.select("doc_id").mapInPandas(synth, _ASSET_SCHEMA)

    def hash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "vh": [video_dhash56(p) for p in pdf["payload"]],
                }
            )

    sig = assets.mapInPandas(hash_kernel, _VSIG_SCHEMA).persist()
    return _hamming_band_pairs(
        sig, "vh", VDHASH_BANDS, _VDHASH_BAND_BITS, VDHASH_MAX_HAMMING
    )


# ---------------------------------------------------------------------------
# Incremental perceptual dedup gate (VERDICT r9 task 5): an incoming
# media batch probes the EXISTING corpus's banded dHash table
# asymmetrically — delta-vs-base, the corpus never self-paired — so
# re-encoded copies of already-held assets drop and genuinely-new assets
# keep. The perceptual twin of `incremental_neardup_gate` (dedup.py).
# ---------------------------------------------------------------------------


def _hamming_band_probe(
    delta_sig: DataFrame,
    base_sig: DataFrame,
    col: str,
    n_bands: int,
    band_bits: int,
    max_hamming: int,
) -> DataFrame:
    """Asymmetric banded Hamming probe: explode BOTH fingerprint tables
    into (band_id, band_val), equi-join delta bands against base bands
    only (never base-base, never delta-delta), keep (delta, base) pairs
    within `max_hamming`. Exact by the same double-pigeonhole argument
    as `_hamming_band_pairs` when max_hamming < n_bands. The delta side
    is batch-sized, the base side corpus-sized — the probe cost scales
    with the BATCH, exactly what an ingest gate at 100 TB needs.

    VERDICT r9 task 1 hardening: buckets are the two-level sub-band keys
    of `_subband_keys` (band_bits + ~comp/(max_hamming+1) key bits), so
    bucket populations — and with them band-join candidate volume — stay
    ~O(1) per incoming asset where the r9 single-level 14-bit bands were
    collision-saturating; and the exact-Hamming verify runs BEFORE the
    pair-dedup distinct, so non-qualifying candidates are eliminated
    inside the pipelined join stage and never reach an exchange."""
    d = _band_probe_candidates(
        delta_sig, base_sig, col, n_bands, band_bits, max_hamming
    )
    return d.filter(F.col("hamming") <= max_hamming).distinct()


def _band_probe_candidates(
    delta_sig: DataFrame,
    base_sig: DataFrame,
    col: str,
    n_bands: int,
    band_bits: int,
    max_hamming: int,
) -> DataFrame:
    """The raw (delta, base, hamming) candidate stream from the sub-band
    bucket join, BEFORE the Hamming filter and pair dedup — the quantity
    the index controls. Split out so the gate-curve bench can account
    candidates/incoming separately from true matches/incoming."""
    d = _subband_keys(
        delta_sig, col, "delta_id", "delta_h", n_bands, band_bits, max_hamming
    )
    b = _subband_keys(
        base_sig, col, "base_id", "base_h", n_bands, band_bits, max_hamming
    )
    return d.join(b, ["bucket_id", "band_val", "sub_val"]).select(
        "delta_id",
        "base_id",
        F.bit_count(F.col("delta_h").bitwiseXOR(F.col("base_h")))
        .cast("long")
        .alias("hamming"),
    )


_PHASH_GATE_CTES = f"""
WITH srcs AS (
  SELECT DISTINCT CASE WHEN doc_id % 8 = 2 THEN doc_id - 2 ELSE doc_id END
           AS doc_id
  FROM documents WHERE doc_id % 4 IN (0, 2)
),
d AS (SELECT doc_id, 16 + doc_id % 5 AS w, 12 + doc_id % 5 AS h FROM srcs),
gx AS (SELECT doc_id, w, h, unnest(generate_series(0, {DHASH_GRID - 1})) AS x FROM d),
grid AS (
  SELECT doc_id, w, h, x,
         unnest(generate_series(0, {DHASH_GRID - 1})) AS y
  FROM gx
),
pv AS (
  SELECT doc_id, x, y,
         (doc_id * 13 + 3 * ((x * w) // {DHASH_GRID}) * ((x * w) // {DHASH_GRID})
            + 7 * ((y * h) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
            + (doc_id % 31) * ((x * w) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
         ) % 256 AS v
  FROM grid
),
gray AS (
  SELECT doc_id, x, y, (v + (v + 101) % 256 + (v + 202) % 256) // 3 AS g
  FROM pv
),
bits AS (
  SELECT l.doc_id, l.y * {DHASH_GRID - 1} + l.x AS j
  FROM gray l JOIN gray r
    ON r.doc_id = l.doc_id AND r.y = l.y AND r.x = l.x + 1
  WHERE l.x <= {DHASH_GRID - 2} AND r.g > l.g
),
sig AS (
  SELECT s.doc_id, COALESCE(SUM(CAST(1 AS BIGINT) << j), 0) AS dhash
  FROM srcs s LEFT JOIN bits ON bits.doc_id = s.doc_id
  GROUP BY 1
),
base AS (
  SELECT dd.doc_id AS asset_id, s.dhash
  FROM documents dd JOIN sig s ON s.doc_id = dd.doc_id
  WHERE dd.doc_id % 4 = 0
),
incoming AS (
  SELECT dd.doc_id AS asset_id, s.dhash
  FROM documents dd
  JOIN sig s ON s.doc_id
       = CASE WHEN dd.doc_id % 8 = 2 THEN dd.doc_id - 2 ELSE dd.doc_id END
  WHERE dd.doc_id % 4 = 2
)
"""

_PHASH_GATE_ORACLE = (
    _PHASH_GATE_CTES
    + f""",
matches AS (
  SELECT i.asset_id,
         CAST(COUNT(*) AS BIGINT) AS n_base_matches,
         CAST(MIN(bit_count(xor(i.dhash, b.dhash))) AS BIGINT) AS min_hamming
  FROM incoming i
  JOIN base b ON bit_count(xor(i.dhash, b.dhash)) <= {DHASH_MAX_HAMMING}
  GROUP BY 1
)
SELECT i.asset_id,
       CASE WHEN m.asset_id IS NOT NULL THEN 'drop' ELSE 'keep' END AS verdict,
       CAST(COALESCE(m.n_base_matches, 0) AS BIGINT) AS n_base_matches,
       m.min_hamming
FROM incoming i LEFT JOIN matches m ON m.asset_id = i.asset_id
"""
)

# Canonical-representative form (VERDICT r10 task 1): the verdict
# carries the ONE base asset each duplicate collapses onto — argmin by
# (hamming, base_id), packed into a single BIGINT so MIN() computes the
# lexicographic minimum exactly (hamming <= 56 < 2^6; asset ids < 2^40).
_PHASH_GATE_CANONICAL_ORACLE = (
    _PHASH_GATE_CTES
    + f""",
matches AS (
  -- the BIGINT cast is load-bearing: DuckDB's << infers the narrow
  -- bit_count type and errors on any nonzero hamming shifted by 40
  -- (caught by the sf1 heavy gate, where hamming 1-3 first appears)
  SELECT i.asset_id,
         MIN((CAST(bit_count(xor(i.dhash, b.dhash)) AS BIGINT) << 40)
             + b.asset_id) AS comp
  FROM incoming i
  JOIN base b ON bit_count(xor(i.dhash, b.dhash)) <= {DHASH_MAX_HAMMING}
  GROUP BY 1
)
SELECT i.asset_id,
       CASE WHEN m.asset_id IS NOT NULL THEN 'drop' ELSE 'keep' END AS verdict,
       CAST(m.comp >> 40 AS BIGINT) AS min_hamming,
       CAST(m.comp & ((CAST(1 AS BIGINT) << 40) - 1) AS BIGINT) AS canonical_id
FROM incoming i LEFT JOIN matches m ON m.asset_id = i.asset_id
"""
)


@query(
    "incremental_phash_gate",
    oracle=_PHASH_GATE_ORACLE,
    tags=("multimodal", "image", "dedup", "perceptual", "incremental", "pairs-audit-tier"),
)
def incremental_phash_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental perceptual dedup GATE over the real codec lane: the
    corpus already holds one BMP per doc_id % 4 == 0 (the base); an
    incoming batch (doc_id % 4 == 2) carries a MIX of re-encoded copies
    (doc_id % 8 == 2: a 2x nearest-neighbor resize of base doc
    doc_id - 2 — hash-identical by the dHash grid-composition property)
    and genuinely new images (doc_id % 8 == 6: their own pixel field).
    Every incoming asset probes the base's banded dHash table
    ASYMMETRICALLY (delta-vs-base; the corpus is never self-paired) and
    gets a verdict: 'drop' if any base asset is within Hamming <=
    {DHASH_MAX_HAMMING}, else 'keep'.

    What the oracle proves: it recomputes both sides' 56-bit hashes from
    the pixel generator formula in pure SQL (the resized copy's hash IS
    the source doc's hash — (a div m) div n == a div (m*n)) and states
    the probe QUADRATICALLY, so a value-hash match proves (a) the
    decode -> resize -> re-encode -> decode -> hash chain preserved the
    fingerprint exactly, and (b) the banded probe loses no qualifying
    (delta, base) pair vs the quadratic definition.

    Scale shape: pixels never shuffle (payloads live only inside the
    mapInPandas synth+hash kernels); the probe's exchanges carry 64-bit
    integers; the base side is corpus-sized but the join output is
    batch-bounded — at 100 TB the base band table is a materialized
    index and each ingest batch pays only its own probe. Reference
    anchor: none (media bytes are transport-only in the reference,
    `database/broker/receiver.py`); §2.11 extension family."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the BMP codec kernels")
    docs = load_table(spark, sf_dir, "documents")
    return _phash_gate_verdicts(
        _phash_gate_incoming_sig(docs), _phash_gate_base_sig(docs)
    )


def _phash_gate_incoming_sig(docs: DataFrame) -> DataFrame:
    """The incoming batch's (asset_id, dhash) signatures — the ONE
    synth+hash pipeline the plain and canonical gates share (their
    oracles share the corresponding CTE, so a tweak here must stay in
    lockstep with exactly one SQL block)."""
    return (
        docs.filter(F.col("doc_id") % 4 == 2)
        .select("doc_id")
        .mapInPandas(_phash_gate_synth_incoming, _ASSET_SCHEMA)
        .mapInPandas(_phash_gate_hash_kernel, _SIG_SCHEMA)
        .persist()
    )


# Shared kernels: the batch gate above and the streaming twin below run
# EXACTLY these (semantics cannot diverge between the lanes).


def _phash_gate_synth_base(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "asset_id": pdf["doc_id"].values,
                "payload": [
                    synthesize_phash_bmp(int(d)) for d in pdf["doc_id"]
                ],
            }
        )


def _phash_gate_synth_incoming(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = []
        for a in pdf["doc_id"]:
            doc = int(a)
            if doc % 8 == 2:  # re-encoded copy of a held asset
                src = synthesize_phash_bmp(doc - 2)
                w, h = _phash_dims(doc - 2)
                payloads.append(resize_image(src, 2 * w, 2 * h))
            else:  # genuinely new image
                payloads.append(synthesize_phash_bmp(doc))
        yield pd.DataFrame(
            {"asset_id": pdf["doc_id"].values, "payload": payloads}
        )


def _phash_gate_hash_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"].values,
                "dhash": [dhash56(p) for p in pdf["payload"]],
            }
        )


def _phash_gate_base_sig(docs: DataFrame) -> DataFrame:
    return (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id")
        .mapInPandas(_phash_gate_synth_base, _ASSET_SCHEMA)
        .mapInPandas(_phash_gate_hash_kernel, _SIG_SCHEMA)
    )


def _phash_gate_verdicts(inc_sig: DataFrame, base_sig: DataFrame) -> DataFrame:
    hits = _hamming_band_probe(
        inc_sig, base_sig, "dhash", DHASH_BANDS, _DHASH_BAND_BITS,
        DHASH_MAX_HAMMING,
    )
    agg = hits.groupBy(F.col("delta_id").alias("asset_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_base_matches"),
        F.min("hamming").cast("long").alias("min_hamming"),
    )
    return inc_sig.select("asset_id").join(agg, "asset_id", "left_outer").select(
        "asset_id",
        F.when(F.col("n_base_matches").isNotNull(), F.lit("drop"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
        F.coalesce(F.col("n_base_matches"), F.lit(0))
        .cast("long")
        .alias("n_base_matches"),
        F.col("min_hamming"),
    )


def _phash_gate_canonical_verdicts(
    inc_sig: DataFrame, base_sig: DataFrame
) -> DataFrame:
    """The O(incoming)-exchange verdict form: each incoming asset maps
    to ONE canonical base representative (argmin by (hamming, base_id)),
    so no stage ever materializes the full true-pair set. The band join
    still surfaces duplicate (delta, base) hits via multiple buckets,
    but MIN over the packed (hamming << 40 | base_id) key is duplicate-
    blind and fully map-side combinable — the exchange after the join
    carries at most one partial row per (map partition, incoming asset),
    vs the pair-count form's distinct() over EVERY qualifying pair
    (25.6 true pairs/incoming at sf10, BENCH_gate_curve.json). The pack
    is exact: hamming <= 56 < 2^6 and asset ids < 2^40."""
    cand = _band_probe_candidates(
        inc_sig, base_sig, "dhash", DHASH_BANDS, _DHASH_BAND_BITS,
        DHASH_MAX_HAMMING,
    )
    agg = (
        cand.filter(F.col("hamming") <= DHASH_MAX_HAMMING)
        .groupBy(F.col("delta_id").alias("asset_id"))
        .agg(
            F.min(
                F.shiftleft(F.col("hamming"), 40) + F.col("base_id")
            ).alias("comp")
        )
    )
    mask = (1 << 40) - 1
    return inc_sig.select("asset_id").join(agg, "asset_id", "left_outer").select(
        "asset_id",
        F.when(F.col("comp").isNotNull(), F.lit("drop"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
        F.shiftright(F.col("comp"), 40).cast("long").alias("min_hamming"),
        F.col("comp").bitwiseAND(F.lit(mask)).cast("long").alias("canonical_id"),
    )


@query(
    "incremental_phash_gate_canonical",
    oracle=_PHASH_GATE_CANONICAL_ORACLE,
    tags=("multimodal", "image", "dedup", "perceptual", "incremental", "canonical-scale"),
)
def incremental_phash_gate_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`incremental_phash_gate` with CLUSTER-REPRESENTATIVE output
    (VERDICT r10 task 1): instead of counting every qualifying base
    match — which forces a distinct() exchange over ALL true pairs, an
    O(duplicate-density) cost that hit 25.6 pairs/incoming at sf10 —
    each incoming asset resolves to its single canonical base
    representative (lowest Hamming, ties to the lowest base id: the
    keep-canonical policy the connected-components dedup family uses,
    `operators/dedup.py`). Every exchange and the sink write are
    O(incoming) REGARDLESS of how replica-dense the corpus is. The
    oracle states the argmin quadratically via the same packed-BIGINT
    minimum, so a hash match proves both the banded probe's
    completeness and the tie-break determinism. Same synth/hash kernels
    and base/incoming split as `incremental_phash_gate` — only the
    verdict aggregation differs."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the BMP codec kernels")
    docs = load_table(spark, sf_dir, "documents")
    return _phash_gate_canonical_verdicts(
        _phash_gate_incoming_sig(docs), _phash_gate_base_sig(docs)
    )


@query(
    "streaming_media_gate",
    oracle=_PHASH_GATE_ORACLE,
    tags=("multimodal", "image", "dedup", "perceptual", "incremental",
          "streaming", "T4"),
)
def streaming_media_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental perceptual gate as a STREAMING lane (the
    optional twin VERDICT r9 task 5 named): incoming media assets
    arrive in micro-batches (file replay, one chunk per trigger); each
    batch runs the SAME synth + decode-hash kernels and the SAME banded
    asymmetric probe as `incremental_phash_gate` (shared module-level
    kernels — semantics cannot diverge) against a base signature table
    materialized ONCE before the stream starts; per-batch verdicts land
    in an append sink. The oracle is the batch gate's oracle verbatim:
    equality proves no asset was lost, duplicated, or re-scored across
    micro-batch boundaries — the probe is batch-local against a static
    base, so verdict composition over batches IS the batch semantics.
    At 100 TB this is the ingest shape: the base band table is a
    materialized index, each arriving batch pays only its own probe."""
    import shutil

    from .streaming_queries import _workdir

    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the BMP codec kernels")
    root = _workdir()
    try:
        docs = load_table(spark, sf_dir, "documents")
        base_sig = _phash_gate_base_sig(docs).localCheckpoint()

        inc = docs.filter(F.col("doc_id") % 4 == 2).select("doc_id")
        chunk_dir = os.path.join(root, "chunks")
        inc.repartition(4).write.parquet(chunk_dir)
        stream = (
            spark.readStream.schema(inc.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        out_dir = os.path.join(root, "verdicts")

        def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
            sig = batch_df.mapInPandas(
                _phash_gate_synth_incoming, _ASSET_SCHEMA
            ).mapInPandas(_phash_gate_hash_kernel, _SIG_SCHEMA)
            # per-batch overwrite path = idempotent under foreachBatch's
            # at-least-once redelivery: a replayed batch rewrites its own
            # directory instead of double-appending verdicts
            _phash_gate_verdicts(sig, base_sig).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"batch={batch_id}"))

        q = (
            stream.writeStream.foreachBatch(gate_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(out_dir).drop("batch").localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_AUDIO_GATE_ORACLE = f"""
WITH srcs AS (
  SELECT DISTINCT CASE WHEN doc_id % 8 = 3 THEN doc_id - 2 ELSE doc_id END
           AS doc_id,
         CASE WHEN doc_id % 8 = 3 THEN 2 ELSE 0 END AS kind
  FROM documents WHERE doc_id % 4 IN (1, 3)
),
d AS (SELECT DISTINCT doc_id, 2048 + doc_id % 256 AS n FROM srcs),
seg AS (
  SELECT doc_id, n, unnest(generate_series(0, (n - 1) // {_AUDIO_SEG})) AS g
  FROM d
),
amp AS (
  SELECT doc_id, n, g,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_'
                                    || CAST(g AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1024) - 512 AS a
  FROM seg
),
x AS (
  SELECT doc_id, n, g * {_AUDIO_SEG} + o AS i, a AS v
  FROM (SELECT *, unnest(generate_series(0, {_AUDIO_SEG - 1})) AS o FROM amp)
  WHERE g * {_AUDIO_SEG} + o < n
),
s0 AS (SELECT doc_id, 0 AS kind, n AS sn, i, v FROM x),
s2 AS (
  SELECT doc_id, 2 AS kind, n AS sn, i,
         CASE WHEN v >= 0 THEN v // 2 ELSE -((-v) // 2) END AS v
  FROM x
),
alls AS (SELECT * FROM s0 UNION ALL SELECT * FROM s2),
fe AS (
  SELECT doc_id, kind, (i * {AUDIO_FP_FRAMES}) // sn AS f, SUM(v * v) AS e
  FROM alls GROUP BY 1, 2, 3
),
bits AS (
  SELECT a.doc_id, a.kind, a.f AS j
  FROM fe a
  JOIN fe b ON b.doc_id = a.doc_id AND b.kind = a.kind AND b.f = a.f + 1
  JOIN fe c ON c.doc_id = a.doc_id AND c.kind = a.kind AND c.f = a.f + 2
  WHERE (c.e - b.e) > (b.e - a.e)
),
sig AS (
  SELECT s.doc_id, s.kind, COALESCE(SUM(CAST(1 AS BIGINT) << j), 0) AS afp
  FROM (SELECT DISTINCT doc_id, kind FROM srcs) s
  LEFT JOIN bits ON bits.doc_id = s.doc_id AND bits.kind = s.kind
  GROUP BY 1, 2
),
base AS (
  SELECT dd.doc_id AS asset_id, s.afp
  FROM documents dd
  JOIN sig s ON s.doc_id = dd.doc_id AND s.kind = 0
  WHERE dd.doc_id % 4 = 1
),
incoming AS (
  SELECT dd.doc_id AS asset_id, s.afp
  FROM documents dd
  JOIN sig s
    ON s.doc_id = CASE WHEN dd.doc_id % 8 = 3 THEN dd.doc_id - 2
                       ELSE dd.doc_id END
   AND s.kind = CASE WHEN dd.doc_id % 8 = 3 THEN 2 ELSE 0 END
  WHERE dd.doc_id % 4 = 3
),
matches AS (
  SELECT i.asset_id,
         CAST(COUNT(*) AS BIGINT) AS n_base_matches,
         CAST(MIN(bit_count(xor(i.afp, b.afp))) AS BIGINT) AS min_hamming
  FROM incoming i
  JOIN base b ON bit_count(xor(i.afp, b.afp)) <= {AUDIO_FP_MAX_HAMMING}
  GROUP BY 1
)
SELECT i.asset_id,
       CASE WHEN m.asset_id IS NOT NULL THEN 'drop' ELSE 'keep' END AS verdict,
       CAST(COALESCE(m.n_base_matches, 0) AS BIGINT) AS n_base_matches,
       m.min_hamming
FROM incoming i LEFT JOIN matches m ON m.asset_id = i.asset_id
"""


@query(
    "incremental_audio_gate",
    oracle=_AUDIO_GATE_ORACLE,
    tags=("multimodal", "audio", "dedup", "perceptual", "incremental"),
)
def incremental_audio_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIO twin of `incremental_phash_gate`: the corpus holds one
    WAV clip per doc_id % 4 == 1; an incoming batch (doc_id % 4 == 3)
    mixes half-gain re-encodes of held clips (doc_id % 8 == 3: the
    truncating sign-split gain of base doc doc_id - 2 — the
    energy-contour fingerprint is gain-invariant up to saturation ties)
    with genuinely new clips (doc_id % 8 == 7). Each incoming clip
    probes the base's banded fingerprint table asymmetrically
    (delta-vs-base, corpus never self-paired); re-encoded copies drop,
    new clips keep.

    The oracle restates the md5 segment envelope, the exact sign-split
    gain, the frame energies, and the QUADRATIC probe in pure SQL — the
    hash match proves the decode -> gain -> re-encode -> decode ->
    fingerprint chain and the lossless-ness of the banded probe at
    once. Samples never shuffle (plan-pinned); probe cost scales with
    the batch. §2.11 extension family; no reference equivalent."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the WAV codec kernels")
    docs = load_table(spark, sf_dir, "documents")

    def synth_base(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [
                        synthesize_fp_wav(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    def synth_incoming(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["doc_id"]:
                doc = int(a)
                if doc % 8 == 3:  # quieter re-encode of a held clip
                    payloads.append(gain_variant(synthesize_fp_wav(doc - 2)))
                else:  # genuinely new clip
                    payloads.append(synthesize_fp_wav(doc))
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].values, "payload": payloads}
            )

    def fp_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "afp": [audio_fingerprint32(p) for p in pdf["payload"]],
                }
            )

    base_sig = (
        docs.filter(F.col("doc_id") % 4 == 1)
        .select("doc_id")
        .mapInPandas(synth_base, _ASSET_SCHEMA)
        .mapInPandas(fp_kernel, _AUDIO_SIG_SCHEMA)
    )
    inc_sig = (
        docs.filter(F.col("doc_id") % 4 == 3)
        .select("doc_id")
        .mapInPandas(synth_incoming, _ASSET_SCHEMA)
        .mapInPandas(fp_kernel, _AUDIO_SIG_SCHEMA)
        .persist()
    )
    hits = _hamming_band_probe(
        inc_sig, base_sig, "afp", AUDIO_FP_BANDS, _AUDIO_FP_BAND_BITS,
        AUDIO_FP_MAX_HAMMING,
    )
    agg = hits.groupBy(F.col("delta_id").alias("asset_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_base_matches"),
        F.min("hamming").cast("long").alias("min_hamming"),
    )
    return inc_sig.select("asset_id").join(agg, "asset_id", "left_outer").select(
        "asset_id",
        F.when(F.col("n_base_matches").isNotNull(), F.lit("drop"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
        F.coalesce(F.col("n_base_matches"), F.lit(0))
        .cast("long")
        .alias("n_base_matches"),
        F.col("min_hamming"),
    )


_VIDEO_GATE_ORACLE = f"""
WITH srcs AS (
  SELECT DISTINCT CASE WHEN doc_id % 8 = 0 THEN doc_id + 2 ELSE doc_id END
           AS doc_id,
         CASE WHEN doc_id % 8 = 0 THEN 2 ELSE 0 END AS kind
  FROM documents WHERE doc_id % 4 = 0
  UNION
  SELECT doc_id, 0 AS kind FROM documents WHERE doc_id % 4 = 2
),
d AS (
  SELECT doc_id, kind, 16 + doc_id % 5 AS w, 12 + doc_id % 5 AS h,
         8 + doc_id % 5 AS nf
  FROM srcs
),
fr AS (
  SELECT doc_id, kind, w, h, nf, unnest(generate_series(0, nf - 1)) AS t
  FROM d
),
gx AS (SELECT *, unnest(generate_series(0, {DHASH_GRID - 1})) AS x FROM fr),
grid AS (SELECT *, unnest(generate_series(0, {DHASH_GRID - 1})) AS y FROM gx),
pv AS (
  SELECT doc_id, kind, t, x, y,
         (doc_id * 13
            + (3 + doc_id % 11) * ((x * w) // {DHASH_GRID}) * ((x * w) // {DHASH_GRID})
            + (7 + doc_id % 17) * ((y * h) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
            + (doc_id % 31) * ((x * w) // {DHASH_GRID}) * ((y * h) // {DHASH_GRID})
            + 3 * t) % 256 AS v
  FROM grid
),
lum AS (
  SELECT doc_id, kind, t, x, y,
         CASE WHEN kind = 2 THEN LEAST(v + 4, 255) ELSE v END AS g
  FROM pv
),
fbits AS (
  SELECT l.doc_id, l.kind, l.t, l.y * {DHASH_GRID - 1} + l.x AS j,
         CASE WHEN r.g > l.g THEN 1 ELSE 0 END AS bit
  FROM lum l JOIN lum r
    ON r.doc_id = l.doc_id AND r.kind = l.kind AND r.t = l.t
   AND r.y = l.y AND r.x = l.x + 1
  WHERE l.x <= {DHASH_GRID - 2}
),
maj AS (
  SELECT doc_id, kind, j,
         CASE WHEN SUM(bit) * 2 > COUNT(*) THEN 1 ELSE 0 END AS mbit
  FROM fbits GROUP BY 1, 2, 3
),
sig AS (
  SELECT doc_id, kind,
         SUM(CASE WHEN mbit = 1 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS vh
  FROM maj GROUP BY 1, 2
),
base AS (
  SELECT dd.doc_id AS asset_id, s.vh
  FROM documents dd
  JOIN sig s ON s.doc_id = dd.doc_id AND s.kind = 0
  WHERE dd.doc_id % 4 = 2
),
incoming AS (
  SELECT dd.doc_id AS asset_id, s.vh
  FROM documents dd
  JOIN sig s
    ON s.doc_id = CASE WHEN dd.doc_id % 8 = 0 THEN dd.doc_id + 2
                       ELSE dd.doc_id END
   AND s.kind = CASE WHEN dd.doc_id % 8 = 0 THEN 2 ELSE 0 END
  WHERE dd.doc_id % 4 = 0
),
matches AS (
  SELECT i.asset_id,
         CAST(COUNT(*) AS BIGINT) AS n_base_matches,
         CAST(MIN(bit_count(xor(i.vh, b.vh))) AS BIGINT) AS min_hamming
  FROM incoming i
  JOIN base b ON bit_count(xor(i.vh, b.vh)) <= {VDHASH_MAX_HAMMING}
  GROUP BY 1
)
SELECT i.asset_id,
       CASE WHEN m.asset_id IS NOT NULL THEN 'drop' ELSE 'keep' END AS verdict,
       CAST(COALESCE(m.n_base_matches, 0) AS BIGINT) AS n_base_matches,
       m.min_hamming
FROM incoming i LEFT JOIN matches m ON m.asset_id = i.asset_id
"""


@query(
    "incremental_video_gate",
    oracle=_VIDEO_GATE_ORACLE,
    tags=("multimodal", "video", "dedup", "perceptual", "incremental"),
)
def incremental_video_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VIDEO twin completing the incremental-gate modality matrix
    (image/audio/video): the corpus holds one y4m clip per
    doc_id % 4 == 2 (the video_vhash_neardup corpus); an incoming batch
    (doc_id % 4 == 0) mixes luma-shifted re-encodes of held clips
    (doc_id % 8 == 0: the saturating +4 luma variant of base doc
    doc_id + 2 — temporal-majority dHash is brightness-invariant, so
    copies land at Hamming ~0) with genuinely new clips
    (doc_id % 8 == 4). Asymmetric banded probe, verdicts, same contract
    as the image/audio gates; a copy whose source clip is not in the
    corpus (doc_id + 2 past the last doc) correctly keeps. Frames never
    shuffle (plan-pinned); the oracle restates the luma generator, the
    saturating shift, per-frame bits, the majority vote, and the
    quadratic probe in pure SQL."""
    if not _HAS_NUMPY:  # pragma: no cover
        raise NotImplementedError("numpy required for the y4m codec kernels")
    docs = load_table(spark, sf_dir, "documents")

    def synth_base(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].values,
                    "payload": [
                        synthesize_vhash_y4m(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    def synth_incoming(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["doc_id"]:
                doc = int(a)
                if doc % 8 == 0:  # brighter re-encode of a held clip
                    payloads.append(
                        luma_brightness_variant(synthesize_vhash_y4m(doc + 2))
                    )
                else:  # genuinely new clip
                    payloads.append(synthesize_vhash_y4m(doc))
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].values, "payload": payloads}
            )

    def vh_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "vh": [video_dhash56(p) for p in pdf["payload"]],
                }
            )

    base_sig = (
        docs.filter(F.col("doc_id") % 4 == 2)
        .select("doc_id")
        .mapInPandas(synth_base, _ASSET_SCHEMA)
        .mapInPandas(vh_kernel, _VSIG_SCHEMA)
    )
    inc_sig = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id")
        .mapInPandas(synth_incoming, _ASSET_SCHEMA)
        .mapInPandas(vh_kernel, _VSIG_SCHEMA)
        .persist()
    )
    hits = _hamming_band_probe(
        inc_sig, base_sig, "vh", VDHASH_BANDS, _VDHASH_BAND_BITS,
        VDHASH_MAX_HAMMING,
    )
    agg = hits.groupBy(F.col("delta_id").alias("asset_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_base_matches"),
        F.min("hamming").cast("long").alias("min_hamming"),
    )
    return inc_sig.select("asset_id").join(agg, "asset_id", "left_outer").select(
        "asset_id",
        F.when(F.col("n_base_matches").isNotNull(), F.lit("drop"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
        F.coalesce(F.col("n_base_matches"), F.lit(0))
        .cast("long")
        .alias("n_base_matches"),
        F.col("min_hamming"),
    )
