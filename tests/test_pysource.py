"""Tests for the custom Python DataSource plugin (`sources/pysource.py`):
batch partitioned read, filter pushdown into the generator, residual
filter correctness, streaming offsets with exactly-once restart, and the
line-protocol sink's commit protocol."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.sources import pysource


@pytest.fixture()
def feed(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pysource.register(spark)
    return (
        spark.read.format("market_feed")
        .option("n_rows", "1000")
        .option("n_partitions", "4")
        .load()
    )


def test_batch_read_matches_formula(feed):
    rows = {r.ts_us: r for r in feed.collect()}
    assert len(rows) == 1000
    for i in (0, 1, 499, 999):
        r = rows[1_700_000_000_000_000 + i * 1000]
        assert (r.ticker, r.source, r.yes_cents, r.no_cents, r.volume) == (
            f"T{i % 500}",
            "kalshi" if i % 2 == 0 else "polymarket",
            (i * 17) % 100,
            100 - (i * 17) % 100,
            (i * 31) % 1000,
        )


def test_source_equality_pushed_into_generator(feed):
    f = feed.filter(F.col("source") == "kalshi")
    assert f.count() == 500
    plan = f._jdf.queryExecution().executedPlan().toString()
    # the equality predicate is absorbed by pushFilters: no 'kalshi'
    # literal survives into the post-scan Filter (only isnotnull remains)
    assert "kalshi" not in plan, plan


def test_ts_range_pushed_as_index_arithmetic(feed):
    lo, hi = 1_700_000_000_100_000, 1_700_000_000_200_000
    f = feed.filter((F.col("ts_us") >= lo) & (F.col("ts_us") < hi))
    assert f.count() == 100
    assert f.agg(F.min("ts_us"), F.max("ts_us")).first() == (lo, hi - 1000)


def test_unsupported_filter_stays_residual_and_correct(feed):
    f = feed.filter(F.col("volume") > 900)
    expect = sum(1 for i in range(1000) if (i * 31) % 1000 > 900)
    assert f.count() == expect
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "900" in plan  # Spark still evaluates the residual post-scan


def test_duplicate_range_predicates_intersect_not_overwrite(feed):
    """ADVICE r5: two pushed predicates on the same column must BOTH be
    honored. Spark drops its post-scan Filter for every absorbed
    predicate, so an overwrite would silently return rows violating the
    earlier one. ts_us >= a AND ts_us >= b → max(a,b); < a AND < b →
    min(a,b)."""
    lo1, lo2 = 1_700_000_000_100_000, 1_700_000_000_150_000
    hi1, hi2 = 1_700_000_000_400_000, 1_700_000_000_200_000
    f = feed.filter(
        (F.col("ts_us") >= lo1)
        & (F.col("ts_us") >= lo2)
        & (F.col("ts_us") < hi1)
        & (F.col("ts_us") < hi2)
    )
    # surviving window is [max(lo1,lo2), min(hi1,hi2)) = [150ms, 200ms)
    assert f.agg(F.min("ts_us"), F.max("ts_us"), F.count("*")).first() == (
        lo2,
        hi2 - 1000,
        50,
    )


def test_conflicting_source_equalities_yield_empty(spark):
    """s = 'kalshi' AND s = 'polymarket' is unsatisfiable; both
    predicates are consumed by pushdown, so the reader itself must
    produce zero rows rather than applying only the last one."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pysource.register(spark)
    df = (
        spark.read.format("market_feed")
        .option("n_rows", "1000")
        .load()
        .filter(F.col("source") == "kalshi")
        .filter(F.col("source") == "polymarket")
    )
    assert df.count() == 0


def test_stream_reader_is_exactly_once_across_restart(spark, tmp_path):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pysource.register(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run():
        sdf = (
            spark.readStream.format("market_feed")
            .option("n_rows", "1000")
            .option("rows_per_batch", "250")
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = spark.read.parquet(out)
    assert first.count() == 1000
    assert first.agg(F.sum("volume")).first()[0] == sum(
        (i * 31) % 1000 for i in range(1000)
    )
    # restart on the same checkpoint: every offset range is committed,
    # so the second run must emit ZERO new rows (no replay duplication)
    run()
    assert spark.read.parquet(out).count() == 1000


def test_line_protocol_sink_commit_protocol(spark, tmp_path, feed):
    out = str(tmp_path / "lp")
    feed.limit(10).write.format("line_protocol").option("path", out).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 10
    shards = [f for f in os.listdir(out) if f.endswith(".lp")]
    assert set(manifest["files"]) <= set(shards)
    # only manifest-listed shards are trusted: an orphan (failed-task
    # leftover) does not change the committed row count
    with open(os.path.join(out, "part-orphan.lp"), "w") as fh:
        fh.write("quotes,ticker=TX,source=kalshi yes=1i,no=99i,volume=0i 0\n")
    assert json.load(open(os.path.join(out, "_MANIFEST.json")))["rows"] == 10
    # line-protocol shape: measurement,tags fields timestamp(ns)
    line = open(os.path.join(out, manifest["files"][0])).readline().strip()
    head, fields, ts = line.split(" ")
    assert head.startswith("quotes,ticker=T") and ",source=" in head
    assert fields.count("=") == 3 and fields.endswith("i")
    assert int(ts) % 1000 == 0  # µs feed stamps exported as ns


def test_line_protocol_overwrite_clears_prior_shards(spark, tmp_path, feed):
    """ADVICE r5: mode('overwrite') must not accumulate orphaned .lp
    shards across repeated saves — after the second save only the new
    manifest's shards remain, so even a (wrong) *.lp glob consumer
    cannot double-count."""
    out = str(tmp_path / "lp")
    for _ in range(2):
        feed.limit(10).write.format("line_protocol").option(
            "path", out
        ).mode("overwrite").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    shards = sorted(f for f in os.listdir(out) if f.endswith(".lp"))
    assert shards == sorted(manifest["files"])
    total = sum(
        sum(1 for _ in open(os.path.join(out, s))) for s in shards
    )
    assert total == manifest["rows"] == 10


def test_line_protocol_append_merges_manifest_and_sweeps_orphans(
    spark, tmp_path, feed
):
    """ADVICE r6: a second mode('append') save must MERGE the prior
    manifest's shards (not silently drop them from manifest-trusting
    readers) and the orphan sweep runs unconditionally — a .lp never
    listed in any manifest is an aborted-task leftover, gone after the
    next commit."""
    out = str(tmp_path / "lp")
    feed.limit(10).write.format("line_protocol").option("path", out).mode(
        "append"
    ).save()
    first = json.load(open(os.path.join(out, "_MANIFEST.json")))
    # plant an orphan between commits
    with open(os.path.join(out, "part-orphan.lp"), "w") as fh:
        fh.write("quotes,ticker=TX,source=kalshi yes=1i,no=99i,volume=0i 0\n")

    feed.limit(5).write.format("line_protocol").option("path", out).mode(
        "append"
    ).save()
    merged = json.load(open(os.path.join(out, "_MANIFEST.json")))
    # prior shards still listed, row count accumulates
    assert set(first["files"]) <= set(merged["files"])
    assert merged["rows"] == 15
    # disk agrees with the manifest exactly; the orphan was swept
    shards = sorted(f for f in os.listdir(out) if f.endswith(".lp"))
    assert shards == sorted(merged["files"])
    assert "part-orphan.lp" not in shards
    total = sum(sum(1 for _ in open(os.path.join(out, s))) for s in shards)
    assert total == 15
