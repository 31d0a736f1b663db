"""The local correctness gate: every REGISTRY query with an oracle runs
on Spark and on DuckDB over the same parquet tables, and the results must
match (row count + columns + order-insensitive values). This mirrors the
driver's CORRECTNESS check, so a green run here predicts a green round."""

from __future__ import annotations

import pytest

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY

from .parity import assert_frames_match

CASES = sorted(REGISTRY)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    assert len(spark_pdf) >= 0  # materializes
    if spec.oracle is None:
        assert len(spark_pdf) > 0, f"{name}: rows-only check — empty result"
        return
    oracle_pdf = oracle.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
