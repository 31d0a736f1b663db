#!/usr/bin/env python
"""Plan audit across every registered query (guide §1.1/§7.2): count the
structural cost markers in each optimized plan — Exchange nodes, join
strategies, Python boundaries, cartesian products, scan pushdown — and
emit one JSON line per query plus a sorted summary of outliers.

Planning only (no job execution) — safe to run under load; plan shape is
load-independent.

Usage: python scripts/plan_audit.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark

# Builders that EXECUTE work (write tables / run streams) rather than just
# building a plan; auditing them here would run real jobs. Their lanes are
# covered by dedicated tests/benches — plus, for the merge-table family,
# by the --exec-lanes mode below (VERDICT r12: bitemporal sat in this SKIP
# set with its read path never audited).
SKIP_PREFIXES = ("streaming_",)
SKIP = {
    "ticket_fill_merge",
    "ticket_fill_history_asof",
    "ticket_fill_changes_feed",
    "ticket_fill_schema_evolution",
    "bitemporal_ticket_state",
}


def audit_merge_lanes(spark) -> list[dict]:
    """Audit the INTERNAL plans of the merge-table family that the
    registry-level loop must skip (their builders execute work): build a
    tiny history-enabled merge table at sf0.001, run one merge, and
    explain (a) the bucketed-merge rewrite input and (b) the as-of
    overlay read — the two plans bitemporal_ticket_state /
    ticket_fill_* pay per phase. Runs real (tiny) jobs; opt in with
    --exec-lanes."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import financial_arbitrage_data_pipeline_spark.operators.upsert as U
    from financial_arbitrage_data_pipeline_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")
    root = tempfile.mkdtemp(prefix="sgauditmerge_")
    tdir = os.path.join(root, "t")
    out = []
    try:
        orders = load_table(spark, sf_dir, "orders")
        U.create_bucketed_table(
            spark,
            tdir,
            orders.select(
                F.col("o_orderkey").alias("k"),
                (F.col("o_orderkey") % 7).cast("long").alias("v"),
            ),
            key="k",
            keep_history=True,
        )
        updates = orders.select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderkey") % 3).cast("long").alias("v"),
        )
        # (a) the rewrite input _merge_bucketed writes
        full = U._read_parquet(spark, tdir, evolved=False)
        data_cols = [c for c in full.columns if c != "__bucket__"]
        target = full.filter(
            F.col("__bucket__").isin(list(range(16)))
        ).drop("__bucket__")
        merged = U._merged_output(
            target,
            updates,
            "k",
            {"v": F.coalesce(F.col("u.v"), F.col("t.v"))},
            False,
            data_cols,
        ).withColumn("__bucket__", U._bucket_of(F.col("k"), 16))
        out.append(("merge_rewrite_input", merged))
        # (b) the as-of overlay read after a committed merge
        U.merge_into_parquet(
            spark,
            tdir,
            updates,
            key="k",
            set_exprs={"v": F.coalesce(F.col("u.v"), F.col("t.v"))},
        )
        out.append(("asof_overlay_read", U.read_merge_table_asof(spark, tdir, 0)))
        rows = []
        for name, df in out:
            p = spark._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            rows.append(_audit_row(f"__lane__{name}", p))
        return rows
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _audit_row(name: str, p: str) -> dict:
    import re
    from collections import Counter

    nodes = re.findall(r"^\(\d+\) ([A-Za-z]+)", p, re.M)
    c = Counter(nodes)
    return {
        "name": name,
        "exchanges": c.get("Exchange", 0) + c.get("BroadcastExchange", 0),
        "shuffles": c.get("Exchange", 0),
        "broadcasts": c.get("BroadcastExchange", 0),
        "smj": c.get("SortMergeJoin", 0),
        "shj": c.get("ShuffledHashJoin", 0),
        "bhj": c.get("BroadcastHashJoin", 0),
        "bnlj": c.get("BroadcastNestedLoopJoin", 0),
        "cartesian": c.get("CartesianProduct", 0),
        "python": c.get("BatchEvalPython", 0)
        + c.get("ArrowEvalPython", 0)
        + c.get("MapInPandas", 0)
        + c.get("MapInArrow", 0)
        + c.get("FlatMapGroupsInPandas", 0),
        "sorts": c.get("Sort", 0),
        "windows": c.get("Window", 0),
        "scans": c.get("Scan", 0),
        "generates": c.get("Generate", 0),
        "aggs": c.get("HashAggregate", 0)
        + c.get("ObjectHashAggregate", 0)
        + c.get("SortAggregate", 0),
        "sort_aggs": c.get("SortAggregate", 0),
        "pushed_none": p.count("PushedFilters: []"),
        "n_nodes": len(nodes),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--exec-lanes"]
    exec_lanes = "--exec-lanes" in sys.argv[1:]
    out_path = args[0] if args else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan_audit")
    rows = []
    for name in sorted(REGISTRY):
        if name.startswith(SKIP_PREFIXES) or name in SKIP:
            continue
        try:
            df = REGISTRY[name].builder(spark, sf_dir)
            p = spark._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            rows.append({"name": name, "error": str(e)[:200]})
            continue
        # formatted mode prints each node once in the tree and once in the
        # detail section -> divide tree-marker counts by using the detail
        # headers "(n) NodeName" which appear exactly once per node
        rows.append(_audit_row(name, p))
    if exec_lanes:
        rows.extend(audit_merge_lanes(spark))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(rows, fh, indent=1)
    ok = [r for r in rows if "error" not in r]
    errs = [r for r in rows if "error" in r]
    print(f"audited {len(ok)} plans, {len(errs)} errors")
    for r in errs:
        print("ERROR", r["name"], r["error"][:120])
    print("\n== most shuffles ==")
    for r in sorted(ok, key=lambda r: -r["shuffles"])[:15]:
        print(f"  {r['shuffles']:3d} shuffles {r['smj']}smj {r['shj']}shj {r['bhj']}bhj  {r['name']}")
    print("\n== sort-merge joins (sorts ride along) ==")
    for r in sorted(ok, key=lambda r: -r["smj"])[:10]:
        if r["smj"]:
            print(f"  {r['smj']:2d} smj  {r['name']}")
    print("\n== cartesian / nested-loop ==")
    for r in ok:
        if r["cartesian"] or r["bnlj"]:
            print(f"  cart={r['cartesian']} bnlj={r['bnlj']}  {r['name']}")
    print("\n== python boundaries ==")
    for r in ok:
        if r["python"]:
            print(f"  {r['python']:2d} py  {r['name']}")
    print("\n== sort aggregates (hash agg fell back) ==")
    for r in ok:
        if r["sort_aggs"]:
            print(f"  {r['sort_aggs']:2d} sortagg  {r['name']}")
    print("\n== largest plans ==")
    for r in sorted(ok, key=lambda r: -r["n_nodes"])[:10]:
        print(f"  {r['n_nodes']:4d} nodes  {r['name']}")


if __name__ == "__main__":
    main()
