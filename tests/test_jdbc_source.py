"""JDBC connector (S5/K2 over embedded Derby): round-trip fidelity,
predicate pushdown into the database, and parallel range reads."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.sources.jdbc import (
    derby_url,
    load_table_jdbc,
    write_table_jdbc,
)


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "db")
    df = spark.range(1000).select(
        F.col("id").alias("pair_id"),
        (F.col("id") % 37).alias("token_id"),
        (F.col("id").cast("double") * 1.5).alias("notional"),
        F.when(F.col("id") % 3 == 0, "open").otherwise("closed").alias("status"),
    )
    write_table_jdbc(
        df,
        derby_url(db, create=True),
        "pairs",
        column_types="status VARCHAR(8)",
    )
    return db


def test_jdbc_roundtrip_lossless(spark, derby_db):
    back = load_table_jdbc(spark, derby_url(derby_db), "pairs")
    assert back.count() == 1000
    row = back.filter(F.col("pair_id") == 6).first()
    assert (row.token_id, row.notional, row.status) == (6, 9.0, "open")


def test_jdbc_filter_pushed_into_database(spark, derby_db):
    """The status predicate must appear as a PushedFilters entry on the
    JDBC scan node — i.e. the DATABASE evaluates it, Spark never sees
    the non-matching rows (the reference's WHERE-in-SQL discipline,
    read_from.py:129-141, for free from Catalyst)."""
    q = load_table_jdbc(spark, derby_url(derby_db), "pairs").filter(
        F.col("status") == "open"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "status" in plan.split("PushedFilters")[1][:200]
    assert q.count() == 334


def test_jdbc_partitioned_read_is_parallel_and_complete(spark, derby_db):
    back = load_table_jdbc(
        spark,
        derby_url(derby_db),
        "pairs",
        partition_on=("pair_id", 0, 1000, 4),
    )
    assert back.rdd.getNumPartitions() == 4
    # no rows lost or duplicated across the range splits
    assert back.count() == 1000
    assert back.select("pair_id").distinct().count() == 1000
