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
# covered by dedicated tests/benches.
SKIP_PREFIXES = ("streaming_",)
SKIP = {
    "ticket_fill_merge",
    "ticket_fill_history_asof",
    "ticket_fill_changes_feed",
    "ticket_fill_schema_evolution",
    "bitemporal_ticket_state",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
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
        import re

        nodes = re.findall(r"^\(\d+\) ([A-Za-z]+)", p, re.M)
        from collections import Counter

        c = Counter(nodes)
        rows.append(
            {
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
        )
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
