#!/usr/bin/env python
"""Drive the driver contract end-to-end, exactly as the grading driver
does: vanilla SparkSession → entry() smoke → every queries()[name] vs
oracle_sql()[name] via DuckDB, strict order-insensitive equality.

Env: SF=0.01 (default) | 0.001 | 0.1;  ONLY=comma,separated,names
     OUT=path.json — also write per-query results as a JSON artifact
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E
from financial_arbitrage_data_pipeline_spark.sources.tables import TESTDATA_TABLES


def main() -> int:
    sf = os.environ.get("SF", "0.01")
    sf_dir = os.environ.get("SF_DIR", f"/root/testdata/sf{sf}")
    only = {s for s in os.environ.get("ONLY", "").split(",") if s}

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = E.entry(spark)
    n = len(df.collect())
    assert n > 0, "entry() returned no rows"
    print(f"entry() -> {n} rows")

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs), "oracle_sql keys must be a subset of queries"
    con = duckdb.connect()
    # Cap the oracle side: a quadratic oracle at SF>=1 (e.g. the
    # within-cluster all-pairs CTEs) can otherwise eat the whole box —
    # observed 105 GB RSS at sf1 before the cap. With a limit DuckDB
    # spills to disk instead of racing the OOM killer.
    con.execute(
        f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'"
    )
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TESTDATA_TABLES:
        # driver testdata ships one file per table; the scale-curve dirs
        # (scripts/gen_scale_data.py) are parquet DIRECTORIES — glob them
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = []
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            if name in osql:
                opdf = con.execute(osql[name]).df()
                cols = sorted(spdf.columns)
                assert sorted(opdf.columns) == cols, f"cols {list(spdf.columns)} vs {list(opdf.columns)}"
                assert len(spdf) == len(opdf), f"rows {len(spdf)} vs {len(opdf)}"
                s = sorted([tuple(r) for r in spdf[cols].itertuples(index=False)], key=repr)
                o = sorted([tuple(r) for r in opdf[cols].itertuples(index=False)], key=repr)
                assert repr(s) == repr(o), "VALUE MISMATCH"
                status = "oracle match"
            else:
                assert len(spdf) > 0, "rows-only check: empty result"
                status = "rows-only"
            print(f"  ok   {name}: {len(spdf)} rows ({status}) [{time.time()-t0:.1f}s]")
            results[name] = {
                "ok": True,
                "rows": len(spdf),
                "check": status,
                "sec": round(time.time() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  FAIL {name}: {exc}")
            results[name] = {"ok": False, "err": str(exc)[:500]}
            # A task-level OOM can kill the whole SparkContext; without a
            # rebuild every later query fails with 'stopped SparkContext'
            # (the r11 sf1 heavy drive lost 49 green queries to one
            # casualty this way). Rebuild and keep driving.
            try:
                dead = spark.sparkContext._jsc.sc().isStopped()
            except Exception:  # noqa: BLE001
                dead = True
            if dead:
                print("  !! SparkContext died — rebuilding the session")
                try:
                    spark.stop()
                except Exception:  # noqa: BLE001
                    pass
                # A task-level OutOfMemoryError can take the whole JVM
                # with it; clearing the gateway handles both cases by
                # letting getOrCreate launch a fresh JVM when needed.
                from pyspark import SparkContext

                SparkSession._instantiatedSession = None
                SparkSession._activeSession = None
                SparkContext._active_spark_context = None
                SparkContext._gateway = None
                SparkContext._jvm = None
                spark = (
                    SparkSession.builder.master("local[8]")
                    .config("spark.ui.enabled", "false")
                    .getOrCreate()
                )
                spark.sparkContext.setLogLevel("ERROR")
    out = os.environ.get("OUT")
    if out:
        import json

        with open(out, "w") as fh:
            json.dump({"sf": sf, "results": results}, fh, indent=1, sort_keys=True)
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print(f"ALL {len(only) if only else len(qs)} QUERIES OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
