"""The engine's SQL surface: register_views exposes every testdata table
so users can write plain spark.sql — and it agrees with the DataFrame
API (Catalyst plans both identically)."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.sources.tables import (
    TESTDATA_TABLES,
    load_table,
    register_views,
)


def test_register_views_exposes_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for name in TESTDATA_TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {name}").first().n == (
            load_table(spark, sf_dir, name).count()
        )


def test_sql_equals_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT o_orderstatus AS status, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus
        """
    )
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
        )
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))
