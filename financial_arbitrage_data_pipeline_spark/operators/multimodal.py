"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (schemas.MEDIA_ASSETS), processed with Arrow-batched
Pandas functions over mapInPandas — the only operators in the engine that
legitimately leave the JVM, because codec work is Python-library territory.

The container has no image/audio codec libraries, so the decode kernels
are STUBS: `decode_image`/`decode_audio`/`decode_video` raise
NotImplementedError, and `fake_decode_features` is the deterministic
stand-in used to keep the Spark-side plumbing (binary schema, batch
iteration, UDF signatures, partition sizing) real and tested. Swapping in
Pillow/librosa/pyav later only changes the kernel body.

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
    """Real image decode (Pillow). Not available in this container."""
    raise NotImplementedError("image codecs not installed; use fake_decode_features")


def decode_audio(payload: bytes) -> dict:
    raise NotImplementedError("audio codecs not installed; use fake_decode_features")


def decode_video(payload: bytes) -> dict:
    raise NotImplementedError("video codecs not installed; use fake_decode_features")


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic stand-in for a decode+feature-extract kernel:
    byte length, crc32, and a fake 'brightness' from the byte sum."""
    return {
        "n_bytes": len(payload),
        "crc32": zlib.crc32(payload) & 0xFFFFFFFF,
        "brightness": (sum(payload) % 256) / 255.0 if payload else 0.0,
    }


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("crc32", T.LongType(), True),
        T.StructField("brightness", T.DoubleType(), True),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    multimodal hot path shape: Arrow batches in, Arrow batches out, one
    Python crossing per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "crc32": [f["crc32"] for f in feats],
                    "brightness": [f["brightness"] for f in feats],
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
# Oracle-checked query: metadata stats through the binary+mapInPandas path
# ---------------------------------------------------------------------------
@query(
    "media_asset_stats",
    oracle="""
WITH assets AS (
  SELECT doc_id AS asset_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         encode(text) AS payload
  FROM documents
)
SELECT media_type,
       COUNT(*) AS n_assets,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(SUM(octet_length(payload)) AS DOUBLE) / COUNT(*) AS avg_bytes,
       MAX(octet_length(payload)) AS max_bytes
FROM assets
GROUP BY media_type
""",
    tags=("multimodal",),
)
def media_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type size stats computed *through the binary decode
    path*: payloads go binary → mapInPandas kernel (Arrow batches) →
    aggregate. Verifies the multimodal plumbing end-to-end; the kernel is
    the deterministic decode stub."""
    feats = extract_features(assets_from_documents(spark, sf_dir))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        (F.sum("n_bytes").cast("double") / F.count(F.lit(1))).alias("avg_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
