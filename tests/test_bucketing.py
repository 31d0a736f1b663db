"""Co-located joins via bucketing and partition-pruned scans — the two
storage-side levers that delete shuffles and I/O at 100 TB. Verified on
the physical plan and the file listing, not just on results."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.sources.tables import load_table


@pytest.fixture()
def warehouse_tables(spark, sf_dir):
    """Two tables bucketed by the join key into the session warehouse;
    dropped (and their files removed) afterwards."""
    names = ["bt_orders", "bt_lineitem"]
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable(names[0])
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable(names[1])
    yield names
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(os.path.join(warehouse, n), ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse_tables):
    """Both sides bucketed by the join key into the same bucket count →
    the sort-merge join consumes bucket files directly: NO Exchange in
    the plan. This is the co-located join this engine prescribes for the
    repeated fact-fact joins at scale (bucket once, join forever);
    against the unbucketed parquet the same join shuffles both sides."""
    bo, bl = warehouse_tables
    # hint the merge join: at fixture scale the planner would broadcast
    # the small side (which also bypasses bucketed reads); at the scales
    # bucketing targets, sort-merge is what the planner picks unaided
    j = spark.table(bo).hint("merge").join(
        spark.table(bl), F.col("o_orderkey") == F.col("l_orderkey")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and it is a real join producing the full result
    n = j.count()
    li = spark.table(bl).count()
    assert n == li  # every lineitem has its order


def test_bucketed_groupby_on_bucket_key_skips_shuffle(spark, warehouse_tables):
    _, bl = warehouse_tables
    agg = spark.table(bl).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_partitioned_snapshot_scan_prunes_files(spark, sf_dir, tmp_path):
    """The market_snapshot table partitions by source (the reference's
    2-tag InfluxDB cardinality design); a source-filtered read must list
    only that partition's files — the I/O contract partition pruning is
    supposed to deliver."""
    from financial_arbitrage_data_pipeline_spark.streaming import ingest

    table = str(tmp_path / "market_snapshot")
    src = spark.createDataFrame(
        [(i, i * 1_000_000, i % 4, "view", 1.0) for i in range(1, 401)],
        ingest.REPLAY_SCHEMA,
    )
    ingest.enrich_snapshots(src).write.partitionBy("source").parquet(table)

    pruned = spark.read.parquet(table).filter(F.col("source") == "kalshi")
    # the physical plan carries the partition filter (pruning happens at
    # planning time — inputFiles() reflects the pre-pruning listing)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "(source" in plan and "kalshi)" in plan
    # and the pruned read returns exactly the partition directory's rows
    direct = spark.read.parquet(os.path.join(table, "source=kalshi"))
    assert pruned.count() == direct.count() > 0
