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
