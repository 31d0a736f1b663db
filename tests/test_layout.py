"""Storage-layout maintenance: compaction and z-order clustering."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators import layout


def _zref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    pts = [(x, y) for x in range(0, 40, 7) for y in range(0, 40, 11)] + [
        (0, 0),
        (1, 0),
        (0, 1),
        (3, 5),
        (65535, 65535),
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", layout.zorder_key("x", "y").alias("z")).collect()
    for r in rows:
        assert r.z == _zref(r.x, r.y), (r.x, r.y)


def test_zorder_preserves_box_locality(spark):
    """Points inside an aligned 2^k x 2^k box form a CONTIGUOUS z-range —
    the property that makes min/max row-group pruning selective on both
    dimensions. Checked directly: the box's z-values are exactly the
    rank-contiguous span of the global z-order."""
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    z = df.select("x", "y", layout.zorder_key("x", "y", bits=6).alias("z")).collect()
    in_box = sorted(r.z for r in z if 16 <= r.x < 32 and 16 <= r.y < 32)
    assert in_box == list(range(min(in_box), min(in_box) + len(in_box)))


def test_compact_small_files_reduces_count_and_preserves_rows(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.rand(42).alias("v")
    )
    df.repartition(64).write.parquet(table)
    assert layout.parquet_file_count(table) == 64
    before = sorted((r.id, r.k) for r in spark.read.parquet(table).collect())

    n = layout.compact_small_files(spark, table, target_file_bytes=1 << 30)
    assert n < 8  # ~200 KB of data → a handful of files at most
    after = sorted((r.id, r.k) for r in spark.read.parquet(table).collect())
    assert after == before


def test_compact_with_sort_cols_clusters_ranges(spark, tmp_path):
    """Range-clustered compaction: each output file covers a disjoint id
    range (footer min/max become selective)."""
    table = str(tmp_path / "t")
    spark.range(10_000).select("id", (F.col("id") % 7).alias("k")).repartition(
        32
    ).write.parquet(table)
    layout.compact_small_files(spark, table, target_file_bytes=40_000, sort_cols=["id"])
    files = [
        p
        for p in os.listdir(table)
        if p.endswith(".parquet")
    ]
    assert len(files) >= 2
    spans = []
    for p in files:
        part = spark.read.parquet(os.path.join(table, p)).agg(
            F.min("id"), F.max("id")
        ).first()
        spans.append((part[0], part[1]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint, ordered ranges


def test_zorder_rewrite_tightens_both_dimensions(spark, tmp_path):
    """After z-order clustering, per-file min/max spans shrink on BOTH
    columns versus the random layout (the pruning win, measured)."""
    table = str(tmp_path / "t")
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    # random-ish layout: hash-partitioned on neither column's order
    pts.repartition(16).write.parquet(table)

    def span_sum(col):
        total = 0
        for p in os.listdir(table):
            if not p.endswith(".parquet"):
                continue
            mm = spark.read.parquet(os.path.join(table, p)).agg(
                F.min(col), F.max(col)
            ).first()
            total += mm[1] - mm[0]
        return total

    sx_before, sy_before = span_sum("x"), span_sum("y")
    layout.zorder_rewrite(spark, table, "x", "y", bits=6, target_file_bytes=12_000)
    sx_after, sy_after = span_sum("x"), span_sum("y")
    assert sx_after < sx_before
    assert sy_after < sy_before


def test_quantile_buckets_feed_zorder(spark):
    """Arbitrary doubles → rank buckets in [0, 2^bits) → valid z-keys:
    the pre-scaling step that makes z-ordering applicable to real
    columns (prices, timestamps)."""
    df = spark.range(1000).select(
        (F.col("id") * 37 % 1000 / 7.0).alias("price"),
        (F.col("id") * 13 % 997).cast("double").alias("latency"),
    )
    b = layout.with_quantile_buckets(df, {"price": "bx", "latency": "by"}, bits=4)
    stats = b.agg(
        F.min("bx"), F.max("bx"), F.min("by"), F.max("by"),
        F.countDistinct("bx"), F.countDistinct("by"),
    ).first()
    assert stats[0] == 0 and stats[1] == 15
    assert stats[2] == 0 and stats[3] == 15
    assert stats[4] == 16 and stats[5] == 16
    z = b.select(layout.zorder_key("bx", "by", bits=4).alias("z")).agg(
        F.min("z"), F.max("z")
    ).first()
    assert 0 <= z[0] and z[1] < 256
