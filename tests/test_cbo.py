"""Stats-driven join reordering through Spark's cost-based optimizer
(VERDICT r7 task 5): prove that with ANALYZE-computed table/column
statistics and `spark.sql.cbo.enabled`, Catalyst reorders a
join-order-sensitive TPC-H shape (the Q9 family) to apply the SELECTIVE
dimension first — without any broadcast/join hints in the query text.

Why this matters at 100 TB: the engine's handwritten queries pin their
join orders with `broadcast()` hints, which is correct but manual. A
catalog with statistics makes the same decision automatic for ad-hoc
SQL users. SCALE.md §24 records when hints remain necessary.
"""

from __future__ import annotations

import re

import pytest


def _relation_order(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return re.findall(r"Relation spark_catalog\.cbo_demo_test\.(\w+)", plan)


_Q9ISH = """
SELECT n.n_name, sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE 'cold%'
GROUP BY n.n_name
"""


@pytest.fixture(scope="module")
def cbo_catalog(spark, sf_dir):
    """Fixture tables as MANAGED catalog tables with full column stats —
    the ANALYZE TABLE-equivalent a production deployment runs after
    ingest so the CBO has cardinalities to cost with."""
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_demo_test")
    spark.sql("USE cbo_demo_test")
    for t in ("lineitem", "orders", "part", "supplier", "nation"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(t)
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield spark
    spark.sql("USE default")
    spark.sql("DROP DATABASE cbo_demo_test CASCADE")


def _with_cbo(spark, enabled: bool):
    spark.conf.set("spark.sql.cbo.enabled", str(enabled).lower())
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(enabled).lower())


def test_analyze_gives_exact_rowcount_stats(cbo_catalog):
    # rowCount propagates into plan stats only when CBO costing is on;
    # without it the planner carries sizeInBytes alone.
    spark = cbo_catalog
    try:
        _with_cbo(spark, True)
        stats = (
            spark.table("part")._jdf.queryExecution().optimizedPlan().stats()
        )
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == spark.table("part").count()
    finally:
        _with_cbo(spark, False)


def test_cbo_reorders_selective_dim_first(cbo_catalog):
    """The pin: syntactically the query joins lineitem->orders (the
    largest join) FIRST and the selective filtered `part` LAST. Without
    CBO the optimized plan keeps that order; with CBO + stats the
    planner joins part into lineitem BEFORE orders, shrinking the
    intermediate the way the handwritten queries do with explicit
    broadcast hints."""
    spark = cbo_catalog
    try:
        _with_cbo(spark, False)
        base = _relation_order(spark.sql(_Q9ISH))
        _with_cbo(spark, True)
        cbo = _relation_order(spark.sql(_Q9ISH))
    finally:
        _with_cbo(spark, False)

    # rule-based plan keeps the written order: part joins last
    assert base.index("part") > base.index("orders"), base
    # stats-driven plan pulls the selective dim ahead of the big join
    assert cbo.index("part") < cbo.index("orders"), cbo
    assert cbo[0] == "lineitem" and cbo[1] == "part", cbo


def test_cbo_and_hinted_plan_agree_on_results(cbo_catalog, sf_dir):
    """Reordering must be semantics-preserving: the CBO plan's result
    matches the rule-based plan's result exactly."""
    spark = cbo_catalog
    try:
        _with_cbo(spark, True)
        got = {
            (r.n_name, str(r.rev)) for r in spark.sql(_Q9ISH).collect()
        }
        _with_cbo(spark, False)
        want = {
            (r.n_name, str(r.rev)) for r in spark.sql(_Q9ISH).collect()
        }
    finally:
        _with_cbo(spark, False)
    assert got == want and got
