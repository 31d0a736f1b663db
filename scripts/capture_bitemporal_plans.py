#!/usr/bin/env python
"""Capture the INTERNAL plans of bitemporal_ticket_state (guide §1/§7.2).

The builder executes merges (side effects) and returns a localCheckpoint,
so the registry-level plan capture shows only an RDD scan. This script
replays the builder's phases at $SPARK_GRAFT_SF_DIR and explains the two
plans that carry the cost: the merge-1 rewrite (updates join + bucketed
write input) and the as-of probe aggregation, writing them to
plans/r13/bitemporal_ticket_state_<suffix>.txt stamped with the git SHA.

Usage: python scripts/capture_bitemporal_plans.py <suffix>
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import financial_arbitrage_data_pipeline_spark.operators.upsert as U
from financial_arbitrage_data_pipeline_spark.session import get_spark
from financial_arbitrage_data_pipeline_spark.sources.tables import load_table


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sha = subprocess.run(
        ["git", "-C", repo, "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    out_dir = os.path.join(repo, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture_bitemporal_{suffix}")

    root = tempfile.mkdtemp(prefix="sgbtplan_")
    tickets_dir = os.path.join(root, "trade_tickets")
    try:
        orders = load_table(spark, sf_dir, "orders")
        U.create_bucketed_table(
            spark,
            tickets_dir,
            orders.select(
                (F.col("o_orderkey") * 4).alias("skey"),
                F.col("o_orderkey").alias("ticket_id"),
                (F.col("o_orderkey") % 50 + 1).cast("long").alias("qty"),
                F.lit("pending").alias("status"),
                F.lit(0).cast("long").alias("valid_from"),
                F.lit(U._BT_OPEN_END).cast("long").alias("valid_to"),
            ),
            key="skey",
            keep_history=True,
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("ticket_id"),
            F.col("l_quantity").cast("long").alias("fill_qty"),
            "l_linenumber",
        )
        tickets = orders.select(
            F.col("o_orderkey").alias("ticket_id"),
            (F.col("o_orderkey") % 50 + 1).cast("long").alias("qty"),
        )
        b1 = (
            li.filter(F.col("l_linenumber") <= 3)
            .groupBy("ticket_id")
            .agg(F.sum("fill_qty").alias("fq"))
            .join(tickets, "ticket_id")
        )
        status1 = F.when(F.col("fq") >= F.col("qty"), "filled").otherwise(
            "partially_filled"
        )
        # mirrors the r13 builder: one pass over b1, explode of the two
        # SCD2 rows (the r12 closes/inserts union re-ran b1 per branch)
        updates = b1.select(
            F.explode(
                F.array(
                    F.struct(
                        (F.col("ticket_id") * 4).alias("skey"),
                        F.lit(None).cast("long").alias("ticket_id"),
                        F.lit(None).cast("long").alias("qty"),
                        F.lit(None).cast("string").alias("status"),
                        F.lit(None).cast("long").alias("valid_from"),
                        F.lit(U._BT_CLOSE_DAY).cast("long").alias("valid_to"),
                    ),
                    F.struct(
                        (F.col("ticket_id") * 4 + 1).alias("skey"),
                        F.col("ticket_id").alias("ticket_id"),
                        F.col("qty").alias("qty"),
                        status1.alias("status"),
                        F.lit(U._BT_CLOSE_DAY).cast("long").alias("valid_from"),
                        F.lit(U._BT_OPEN_END).cast("long").alias("valid_to"),
                    ),
                )
            ).alias("r")
        ).select("r.*")
        keep_or_set = {
            c: F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}"))
            for c in ("ticket_id", "qty", "status", "valid_from", "valid_to")
        }

        # plan 1: the merge-1 rewrite input (what _merge_bucketed writes)
        full = U._read_parquet(spark, tickets_dir, evolved=False)
        data_cols = [c for c in full.columns if c != "__bucket__"]
        target = full.filter(F.col("__bucket__").isin(list(range(16)))).drop(
            "__bucket__"
        )
        merged = U._merged_output(
            target, updates, "skey", keep_or_set, True, data_cols
        ).withColumn("__bucket__", U._bucket_of(F.col("skey"), 16))
        merge_plan = explain(merged)

        # run the real merges so the probe read sees the final table
        U.merge_into_parquet(
            spark, tickets_dir, updates, key="skey",
            set_exprs=keep_or_set, insert_missing=True,
        )
        ball = (
            li.groupBy("ticket_id")
            .agg(F.sum("fill_qty").alias("fq"))
            .join(tickets, "ticket_id")
        )
        b2_tickets = (
            li.filter(F.col("l_linenumber") > 3).select("ticket_id").distinct()
        )
        corrections = ball.join(b2_tickets, "ticket_id").select(
            (F.col("ticket_id") * 4 + 1).alias("skey"),
            F.lit(None).cast("long").alias("ticket_id"),
            F.lit(None).cast("long").alias("qty"),
            F.when(F.col("fq") >= F.col("qty"), "filled")
            .otherwise("partially_filled")
            .alias("status"),
            F.lit(None).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
        U.merge_into_parquet(
            spark, tickets_dir, corrections, key="skey",
            set_exprs=keep_or_set, insert_missing=False,
        )

        # plan 2: the as-of probe aggregation exactly as the r13 builder
        # builds it — ONE exploded-day aggregation per tx version
        lo, hi = min(U._BT_PROBE_DAYS), max(U._BT_PROBE_DAYS)
        state = U.read_merge_table_asof(spark, tickets_dir, 1)
        probe_plan = explain(
            state.filter((F.col("valid_from") <= hi) & (F.col("valid_to") > lo))
            .select(
                F.explode(
                    F.array(*[F.lit(d).cast("long") for d in U._BT_PROBE_DAYS])
                ).alias("valid_day"),
                "status",
                "qty",
                "valid_from",
                "valid_to",
            )
            .filter(
                (F.col("valid_from") <= F.col("valid_day"))
                & (F.col("valid_day") < F.col("valid_to"))
            )
            .groupBy("valid_day", "status")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tickets"),
                F.sum("qty").cast("long").alias("total_qty"),
            )
            .select(
                F.lit(1).cast("int").alias("tx_version"),
                "valid_day",
                "status",
                "n_tickets",
                "total_qty",
            )
        )

        path = os.path.join(out_dir, f"bitemporal_ticket_state_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- captured at git SHA {sha} ({suffix})\n")
            fh.write("-- plan 1: merge-1 bucketed rewrite input\n")
            fh.write(merge_plan)
            fh.write("\n-- plan 2: as-of probe aggregation (tx_version=1)\n")
            fh.write(probe_plan)
        print(f"wrote {path}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _legacy_probe(spark, tickets_dir):
    """The pre-r13 probe shape: one filter+groupBy per (version, day)."""
    out = None
    for d in U._BT_PROBE_DAYS:
        state = U.read_merge_table_asof(spark, tickets_dir, 1)
        p = (
            state.filter(
                (F.col("valid_from") <= d) & (F.lit(d) < F.col("valid_to"))
            )
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tickets"),
                F.sum("qty").cast("long").alias("total_qty"),
            )
            .select(
                F.lit(1).cast("int").alias("tx_version"),
                F.lit(d).cast("long").alias("valid_day"),
                "status",
                "n_tickets",
                "total_qty",
            )
        )
        out = p if out is None else out.unionByName(p)
    return out


if __name__ == "__main__":
    main()
