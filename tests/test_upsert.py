"""Unit tests for the parquet MERGE primitive (K4/J4) beyond the
oracle-checked lifecycle query."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators.upsert import merge_into_parquet


def _seed(spark, path):
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "id long, v long, tag string"
    ).write.mode("overwrite").parquet(path)


def test_merge_updates_matched_rows_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame([(2, 5)], "id long, dv long")
    merge_into_parquet(
        spark, path, updates, key="id", set_exprs={"v": F.col("t.v") + F.col("u.dv")}
    )
    rows = {r.id: (r.v, r.tag) for r in spark.read.parquet(path).collect()}
    assert rows == {1: (10, "a"), 2: (25, "b")}


def test_merge_insert_missing(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame([(3, 7)], "id long, dv long")
    merge_into_parquet(
        spark,
        path,
        updates,
        key="id",
        set_exprs={"v": F.coalesce(F.col("t.v"), F.lit(0)) + F.col("u.dv")},
        insert_missing=True,
    )
    rows = {r.id: (r.v, r.tag) for r in spark.read.parquet(path).collect()}
    assert rows == {1: (10, "a"), 2: (20, "b"), 3: (7, None)}


def test_merge_is_idempotent_on_empty_updates(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame([], "id long, dv long")
    merge_into_parquet(
        spark, path, updates, key="id", set_exprs={"v": F.col("t.v") + F.col("u.dv")}
    )
    assert spark.read.parquet(path).count() == 2


def test_merge_extra_files_installed_with_swap(spark, tmp_path):
    """extra_files land inside the swapped directory in the same rename
    as the data (the applied-batch idempotence anchor), and Spark's
    reader ignores the underscore-prefixed marker."""
    import os

    from financial_arbitrage_data_pipeline_spark.operators.upsert import (
        merge_into_parquet,
    )

    target = str(tmp_path / "t")
    spark.createDataFrame([(1, 10)], "k long, v long").write.parquet(target)
    ups = spark.createDataFrame([(1, 5)], "k long, d long")
    merge_into_parquet(
        spark,
        target,
        ups,
        key="k",
        set_exprs={"v": F.col("t.v") + F.col("u.d")},
        extra_files={"_last_applied_batch": "7"},
    )
    with open(os.path.join(target, "_last_applied_batch")) as fh:
        assert fh.read() == "7"
    [row] = spark.read.parquet(target).collect()
    assert (row.k, row.v) == (1, 15)


def test_merge_recovers_from_crashed_prior_run(spark, tmp_path):
    """Crash-residue handling: a leftover .__merge_old__ alongside a live
    target (crash after the tmp→target rename but before cleanup) is
    swept; a .__merge_old__ with NO target (crash between the two
    renames) is restored as the target. Either way the next merge runs
    and lands the update."""
    import os
    import shutil

    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame([(1, 1)], "id long, dv long")
    upd = {"v": F.col("t.v") + F.col("u.dv")}

    # residue case 1: stale old + stale tmp beside a live target
    shutil.copytree(path, path + ".__merge_old__")
    os.makedirs(path + ".__merge_tmp__", exist_ok=True)
    merge_into_parquet(spark, path, updates, key="id", set_exprs=upd)
    assert not os.path.exists(path + ".__merge_old__")
    assert not os.path.exists(path + ".__merge_tmp__")
    rows = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert rows == {1: 11, 2: 20}

    # residue case 2: crash window — old exists, target is gone
    os.rename(path, path + ".__merge_old__")
    merge_into_parquet(spark, path, updates, key="id", set_exprs=upd)
    rows = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert rows == {1: 12, 2: 20}
