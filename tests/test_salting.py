"""Salted-join equivalence: output must equal the plain join exactly,
with the hot key spread over n_salts shuffle buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.functions.salting import salted_join, with_salt


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_linenumber"
    )
    # skew it: collapse most keys onto one hot key
    big = li.withColumn(
        "k", F.when(F.col("l_orderkey") % 3 == 0, F.lit(1)).otherwise(F.col("l_orderkey"))
    )
    small = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("k"), "o_totalprice")
    )
    plain = big.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    salted = salted_join(big, small, "k", n_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    assert (plain.n, plain.q) == (salted.n, salted.q)


def test_salt_is_deterministic_and_spread(spark):
    df = spark.createDataFrame([(1, i) for i in range(1000)], "k long, payload long")
    s1 = with_salt(df, ["payload"], 8).groupBy("_salt").count().collect()
    s2 = with_salt(df, ["payload"], 8).groupBy("_salt").count().collect()
    assert sorted((r._salt, r["count"]) for r in s1) == sorted(
        (r._salt, r["count"]) for r in s2
    )
    assert len(s1) == 8  # the single hot key scattered over all buckets


def test_positional_salt_spreads_identical_rows(spark):
    """Fully duplicate rows hash to one bucket under column-derived salt
    (the documented limitation); salt_from=None switches to positional
    salt and spreads them anyway."""
    dupes = spark.createDataFrame([(1, 7)] * 1000, "k long, payload long").repartition(4)
    collapsed = with_salt(dupes, ["payload"], 8).select("_salt").distinct().count()
    assert collapsed == 1  # the failure mode the fallback exists for
    spread = with_salt(dupes, None, 8).select("_salt").distinct().count()
    assert spread == 8


def test_salted_join_positional_fallback_equals_plain_join(spark):
    big = spark.createDataFrame([(1, 7)] * 500 + [(2, 9)] * 5, "k long, v long")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k long, tag string")
    plain = big.join(small, "k").groupBy("tag").count().collect()
    salted = salted_join(big, small, "k", n_salts=4, big_salt_from=[]).groupBy(
        "tag"
    ).count().collect()
    assert sorted((r.tag, r["count"]) for r in plain) == sorted(
        (r.tag, r["count"]) for r in salted
    )
