"""Bucketed-layout tests: co-bucketed joins must plan with no shuffle on
the bucket key, and results must equal the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.sources.bucketing import (
    cobucket_join,
    write_bucketed,
)


def test_cobucketed_join_has_no_exchange_and_matches(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", 8)
    try:
        joined = cobucket_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = spark._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:600]

        got = joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
        ).first()
        want = orders.join(lineitem, "o_orderkey").agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
        ).first()
        assert (got.n, got.q) == (want.n, want.q)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
