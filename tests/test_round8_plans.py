"""Plan pins for round-8 operators that carry specific scale shapes."""

from __future__ import annotations


def _plan(spark, df, mode="formatted"):
    return spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_zipf_top_cut_is_partial_topk_not_global_sort(spark, sf_dir):
    from financial_arbitrage_data_pipeline_spark.operators.textstats import (
        zipf_doubling_profile,
    )

    p = _plan(spark, zipf_doubling_profile(spark, sf_dir))
    # the vocab cut must be TakeOrderedAndProject (distributed partial
    # top-K); a rangepartitioning exchange would mean a global vocab sort
    assert "TakeOrderedAndProject" in p, p
    assert "rangepartitioning" not in p, p


def test_novelty_decay_has_no_gram_join_back(spark, sf_dir):
    from financial_arbitrage_data_pipeline_spark.operators.corpusprep import (
        ngram_novelty_decay,
    )

    df = ngram_novelty_decay(spark, sf_dir)
    p = _plan(spark, df, "simple")
    # novel-per-doc comes from per_gram.groupBy(first_doc), never from
    # joining the gram table back to itself: the only joins are the two
    # doc-level ones (totals x novels, x broadcast bounds)
    assert p.count("Join") <= 3, p
    assert "rangepartitioning" not in p


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (VERDICT r7 task 5's sibling
    knob): with a selective filter on the build side of a shuffle join,
    Spark injects a `might_contain` semi-filter on the PROBE side scan —
    rows that cannot join are dropped before the exchange. At 100 TB
    this is the difference between shuffling the full fact table and
    shuffling only the ~matching fraction, with zero query changes."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        # the fixture tables are tiny; drop the size floors so the
        # optimizer treats them like warehouse-scale relations
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderstatus = 'F'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        p = _plan(spark, j, "simple")
        assert "might_contain" in p, p
        assert "bloom_filter_agg" in p, p
        with_bloom = {(r["o_orderstatus"], r["count"]) for r in j.collect()}
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        j2 = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        p2 = _plan(spark, j2, "simple")
        assert "might_contain" not in p2
        without = {(r["o_orderstatus"], r["count"]) for r in j2.collect()}
        assert with_bloom == without and with_bloom
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
