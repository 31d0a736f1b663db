#!/usr/bin/env python
"""Data-skipping curve (SCALE.md §38): for each SF, write the orders
table key-clustered as a Delta-bridge table (64 files), then time the
same quarter-keyspace aggregate twice — a stats_filter read (files
pruned from the log before any footer opens) vs the full scan with the
identical row predicate. Records kept/total files and both walls."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.session import get_spark
from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
    create_delta_table,
    read_delta_table,
    stats_selected_files,
)
from financial_arbitrage_data_pipeline_spark.sources.tables import load_table

SFS = [
    ("0.1", "/root/testdata/sf0.1"),
    ("1", "/root/repo/scaledata/sf1"),
]

def agg_wall(df):
    t0 = time.time()
    df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)), F.sum("o_orderkey")
    ).collect()
    return round(time.time() - t0, 3)

def main():
    spark = get_spark()
    rows = []
    for sf, sf_dir in SFS:
        if not os.path.exists(f"{sf_dir}/orders.parquet"):
            continue
        root = tempfile.mkdtemp(prefix="sgskipcurve_")
        tdir = os.path.join(root, "t")
        try:
            orders = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus"
            )
            create_delta_table(
                spark, tdir, orders.repartitionByRange(64, "o_orderkey")
            )
            mx = orders.agg(F.max("o_orderkey")).first()[0]
            box = {"o_orderkey": (mx // 4, mx // 2)}
            kept, total = stats_selected_files(spark, tdir, box)
            # warm both paths once (JIT/page cache), then measure
            for _ in range(2):
                w_skip = agg_wall(read_delta_table(spark, tdir, stats_filter=box))
                w_full = agg_wall(
                    read_delta_table(spark, tdir).filter(
                        F.col("o_orderkey").between(*box["o_orderkey"])
                    )
                )
            rows.append(
                {
                    "sf": sf,
                    "files_kept": kept,
                    "files_total": total,
                    "wall_skip_sec": w_skip,
                    "wall_fullscan_sec": w_full,
                    "speedup": round(w_full / w_skip, 2) if w_skip else None,
                }
            )
            print(rows[-1])
        finally:
            shutil.rmtree(root, ignore_errors=True)
    with open("/root/repo/BENCH_skip_curve.json", "w") as fh:
        json.dump({"metric": "delta_stats_skipping", "rows": rows}, fh, indent=1)

if __name__ == "__main__":
    main()
