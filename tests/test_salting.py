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


def test_aqe_skew_split_triggers_on_skewed_join(spark, sf_dir):
    """The OTHER remediation `key_skew_report` recommends (next to
    manual salting): on the same hot-key fixture shape as
    skew_salted_supplier_rollup, AQE's skew-join optimization must
    actually split the straggler partition — pinned by the skew marker
    in the FINAL adaptive plan after execution — while producing the
    same totals as the salted join. Thresholds are scaled down to
    fixture size — Catalyst prunes every unused column before the join
    exchange, so the shuffled rows are a few bytes each and the hot
    partition lands in the single-digit-KB range (at 100 TB the
    defaults, 256 MB / factor 5, play the same role). Broadcast is
    disabled because skew splitting only applies to shuffle joins —
    with a broadcastable dim you'd broadcast instead and skew would be
    moot."""
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_suppkey", "l_quantity", "l_linenumber"
        )
        big = (
            li.withColumn(
                "supp_k",
                F.when(F.col("l_suppkey") % 2 == 0, F.lit(1).cast("long"))
                .otherwise(F.col("l_suppkey")),
            )
            # multiple mappers: AQE splits a skewed reduce partition at
            # mapper granularity, so a single-mapper shuffle can't split
            .repartition(16)
        )
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            F.col("s_suppkey").alias("supp_k"), "s_nationkey"
        )
        agg = (
            big.join(supp, "supp_k")
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        )
        got = {r.s_nationkey: (r.n, float(r.q)) for r in agg.collect()}
        final_plan = agg._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan[:2000]

    # same answer as the manual-salting remediation
    salted = (
        salted_join(
            big.drop("pad"), supp, "supp_k", n_salts=8,
            big_salt_from=["l_orderkey", "l_linenumber"],
        )
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    want = {r.s_nationkey: (r.n, float(r.q)) for r in salted.collect()}
    assert got == want
