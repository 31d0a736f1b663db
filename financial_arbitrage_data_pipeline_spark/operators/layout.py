"""Storage-layout maintenance: small-file compaction, z-order clustering,
and range layout — the table-maintenance operators a 100 TB deployment
runs continuously even though no query names them.

Why they exist here: the streaming storage lane (K1) writes one file per
shuffle partition per trigger (`streaming/ingest.py` scale note), so a
day of 1 s micro-batches leaves ~86k tiny files per partition — scan
throughput then dies on file-open overhead and the NameNode/S3 listing,
not on bytes. The reference never hits this because InfluxDB compacts
internally (TSM compaction); a parquet/Delta lake needs it as an explicit
job. OPTIMIZE / bin-packing in Delta and Iceberg's rewrite_data_files are
this exact operator; plain parquet gets the same effect with a
read → repartition-to-target-size → atomic-swap rewrite.

Z-ordering: multi-column range queries (ticker × time) can't both be
partition keys; interleaving their bits into one sort key keeps rows
close in BOTH dimensions, so min/max row-group pruning stays selective
for either predicate. This is the documented mechanism behind Delta's
ZORDER BY — implemented here as a pure integer column expression.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def table_bytes(table_dir: str) -> int:
    """Total parquet payload bytes on disk (drives the target file count;
    at warehouse scale this comes from table metadata, not a listing)."""
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(table_dir, "**", "*.parquet"), recursive=True)
    )


def parquet_file_count(table_dir: str) -> int:
    return len(glob.glob(os.path.join(table_dir, "**", "*.parquet"), recursive=True))


def compact_small_files(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~target_file_bytes files,
    optionally range-clustered on `sort_cols` (repartitionByRange +
    sortWithinPartitions: globally range-partitioned, locally sorted —
    the layout that makes min/max pruning on the sort key exact). The
    rewrite lands in a tmp dir and swaps in via rename, same recovery
    contract as operators/upsert.merge_into_parquet. Returns the new
    file count.

    Scale notes: the rewrite is one shuffle of the table — schedule it
    per partition (source=...) so each run touches one partition's
    worth; Delta/Iceberg OPTIMIZE does the bin-packing incrementally
    with transaction-log atomicity instead of the rename swap."""
    n_files = max(1, (table_bytes(table_dir) + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(table_dir)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)

    tmp = table_dir.rstrip("/") + ".__compact_tmp__"
    old = table_dir.rstrip("/") + ".__compact_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.exists(old):
        if os.path.exists(table_dir):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, table_dir)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)
    return parquet_file_count(table_dir)


ZORDER_BITS = 16


def zorder_key(x: str, y: str, bits: int = ZORDER_BITS) -> Column:
    """Morton (z-curve) key of two non-negative int columns: bit i of x
    lands at position 2i, bit i of y at 2i+1. Rows sorted by this key
    are clustered in both dimensions at once, so row-group min/max
    pruning works for predicates on EITHER column — the clustering
    trade-off a single-column sort can't make. Pure integer expression
    (shift/and/or), codegen'd; 2*bits ≤ 62 keeps the key in a signed
    long. Columns must be pre-scaled to [0, 2^bits) — at scale, rank- or
    quantile-bucket them first (ties are fine; the curve only needs
    approximate locality)."""
    assert 2 * bits <= 62, "z-key must fit a signed long"
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return F.expr(" + ".join(terms))


def zorder_rewrite(
    spark: SparkSession,
    table_dir: str,
    x: str,
    y: str,
    bits: int = ZORDER_BITS,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Cluster a table on the z-curve of (x, y): compute the Morton key,
    range-partition + sort on it, drop the key, swap in. The parquet
    footer then carries tight min/max for BOTH x and y per row group."""
    n_files = max(1, (table_bytes(table_dir) + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(table_dir).withColumn("__z", zorder_key(x, y, bits))
    out = (
        df.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    tmp = table_dir.rstrip("/") + ".__compact_tmp__"
    old = table_dir.rstrip("/") + ".__compact_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)
    return parquet_file_count(table_dir)


def with_quantile_buckets(
    df: DataFrame, cols: dict[str, str], bits: int = ZORDER_BITS
) -> DataFrame:
    """Pre-scale arbitrary orderable columns into [0, 2^bits) rank
    buckets so they can feed `zorder_key`: `cols` maps source column →
    bucket column name. Uses ntile over a global order (exact, single
    sort) — correct at test scale and for the final within-rewrite sort.
    At 100 TB swap the window for approx_percentile boundaries (one
    mergeable sketch pass, then a when-chain bucket lookup): the z-curve
    only needs approximate locality, so sketch error costs nothing."""
    out = df
    for src, dst in cols.items():
        w = Window.orderBy(src)
        out = out.withColumn(dst, (F.ntile(1 << bits).over(w) - 1).cast("long"))
    return out
