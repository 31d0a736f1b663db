#!/usr/bin/env python
"""Upscale the driver's sf0.1 testdata to larger scale factors for the
scaling-curve benchmark (SCALE.md): K key-shifted copies of every table,
preserving join integrity (each copy's orders point at that copy's
customers, lineitems at that copy's orders/parts/suppliers) and
per-copy value distributions, so per-row work is identical and only
VOLUME changes — exactly what a scaling curve must isolate.

Copy-specific mutations keep data properties scale-invariant instead of
manufacturing pathologies:
- documents: every token gets a per-copy suffix, so copies are NOT
  near-duplicates of each other — the dup-pair count scales linearly
  (x K), not quadratically (x K^2 pairs among K identical copies).
- embeddings: per-copy, per-dimension additive jitter, so copies are
  not mutually-identical vectors (which would make every cosine tie).
- events: event_id shifts; user_id/ts distributions unchanged (10x data
  = 10x quotes per pair over the same window, a denser feed).
- nation/region: fixed dims, copied once (as in TPC-H, they don't
  scale with SF).

Usage: python scripts/gen_scale_data.py <out_root> <k> [src_dir]
  e.g.  python scripts/gen_scale_data.py /root/repo/scaledata/sf1 10

Output is written OUTSIDE git's view (scaledata/ is gitignored); only
the bench artifacts derived from it are committed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _stride(spark, src, table, key):
    return (
        spark.read.parquet(f"{src}/{table}.parquet")
        .agg(F.max(key)).first()[0] + 1
    )


def upscale(spark, src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    strides = {
        "cust": _stride(spark, src, "customer", "c_custkey"),
        "supp": _stride(spark, src, "supplier", "s_suppkey"),
        "part": _stride(spark, src, "part", "p_partkey"),
        "order": _stride(spark, src, "orders", "o_orderkey"),
        "event": _stride(spark, src, "events", "event_id"),
        "doc": _stride(spark, src, "documents", "doc_id"),
        "vec": _stride(spark, src, "embeddings", "vec_id"),
    }
    copies = F.broadcast(
        spark.range(k).select(F.col("id").alias("__copy__"))
    )

    def shifted(table: str, shifts: dict[str, str], extra=None):
        df = spark.read.parquet(f"{src}/{table}.parquet")
        cols = []
        for c in df.columns:
            if c in shifts:
                cols.append(
                    (F.col(c) + F.col("__copy__") * F.lit(strides[shifts[c]]))
                    .alias(c)
                )
            elif extra and c in extra:
                cols.append(extra[c].alias(c))
            else:
                cols.append(F.col(c))
        n_files = max(1, min(32, k * 2))
        (
            df.crossJoin(copies)
            .select(*cols)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(f"{out}/{table}.parquet")
        )
        print(f"  {table}: x{k}")

    # fixed dims: straight copy
    for t in ("region", "nation"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"  {t}: copied")

    shifted("customer", {"c_custkey": "cust"})
    shifted("supplier", {"s_suppkey": "supp"})
    shifted("part", {"p_partkey": "part"})
    shifted("orders", {"o_orderkey": "order", "o_custkey": "cust"})
    shifted(
        "lineitem",
        {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    )
    shifted("events", {"event_id": "event"})
    shifted(
        "documents",
        {"doc_id": "doc"},
        extra={
            # per-copy token suffix: copy i of a doc shares no shingles
            # with copy j != i, so near-dup structure is per-copy
            "text": F.when(F.col("__copy__") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.expr(
                        "transform(split(text, ' '), "
                        "x -> concat(x, 'c', cast(__copy__ as string)))"
                    ),
                    " ",
                )
            ),
            "n_chars": F.when(
                F.col("__copy__") == 0, F.col("n_chars")
            ).otherwise(
                F.col("n_chars")
                + F.size(F.split(F.col("text"), " "))
                * (F.lit(2) + F.length(F.col("__copy__").cast("string")) - 1)
            ),
        },
    )
    shifted(
        "embeddings",
        {"vec_id": "vec"},
        extra={
            # deterministic per-copy, per-dim jitter: copies are near but
            # not identical, so cosine ranks don't degenerate into ties
            "embedding": F.expr(
                "transform(embedding, (x, j) -> cast("
                "x + ((__copy__ * 31 + j) % 17 - 8) * 0.0005 as float))"
            ),
        },
    )


def main() -> None:
    out, k = sys.argv[1], int(sys.argv[2])
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"upscaling {src} x{k} -> {out}")
    upscale(spark, src, out, k)
    print("done")


if __name__ == "__main__":
    main()
