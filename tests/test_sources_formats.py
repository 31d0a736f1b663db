"""Source-format breadth: the same declared schema reads the same rows
from parquet, JSON-lines (landed REST payloads), and CSV (bulk exports),
batch and streaming."""

from __future__ import annotations


from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.sources.tables import (
    load_csv,
    load_json,
    load_table,
)
from financial_arbitrage_data_pipeline_spark.streaming import ingest


def _sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.expr("ts div 1000").alias("ts_us"), "user_id", "event_type", "value")
        .filter(F.col("event_id") % 11 == 0)
    )


def _rows(df):
    return sorted(
        (r.event_id, r.ts_us, r.user_id, r.event_type, r.value)
        for r in df.collect()
    )


def test_json_and_csv_roundtrip_with_declared_schema(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    src.write.json(jdir)
    src.write.option("header", "true").csv(cdir)
    want = _rows(src)
    assert want
    assert _rows(load_json(spark, jdir, ingest.REPLAY_SCHEMA)) == want
    assert _rows(load_csv(spark, cdir, ingest.REPLAY_SCHEMA)) == want


def test_json_replay_stream_delivers_all_rows(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    jdir = str(tmp_path / "jchunks")
    src.repartition(3).write.json(jdir)
    sink = str(tmp_path / "sink")
    q = (
        ingest.replay_stream_json(spark, jdir)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(spark.read.parquet(sink)) == _rows(src)


def test_split_malformed_bifurcates_and_preserves_payload(spark):
    """T6 dead-letter lane: malformed JSON payloads split off with the
    raw blob intact (replayable); well-formed rows continue typed. A NULL
    payload also routes to the DLQ — PERMISSIVE from_json would otherwise
    let it slip through as an all-null struct, silently bypassing the
    lane this function exists to provide."""
    from financial_arbitrage_data_pipeline_spark.schemas import KALSHI_BOOK

    rows = [
        (1, '{"yes": [[45, 10]], "no": [[55, 5]]}'),
        (2, "{corrupt"),
        (3, None),
        (4, '{"yes": [], "no": []}'),
        (5, "also not json"),
    ]
    df = spark.createDataFrame(rows, "id long, full_orderbook string")
    good, bad = ingest.split_malformed(df, "full_orderbook", KALSHI_BOOK)
    assert sorted(r.id for r in good.select("id").collect()) == [1, 4]
    bad_rows = {r.id: r.full_orderbook for r in bad.collect()}
    assert bad_rows == {2: "{corrupt", 3: None, 5: "also not json"}
    # the good lane's column is the typed struct now
    [r1] = good.filter(F.col("id") == 1).collect()
    assert r1.full_orderbook.yes == [[45, 10]]


def test_approx_distinct_is_the_scale_path_for_a4(spark, sf_dir):
    """A4 distinct tickers: the exact form is oracle-checked
    (distinct_doc_sources); at 100 TB the one-pass mergeable sketch
    (approx_count_distinct / HLL) replaces the distinct shuffle. Pin that
    the sketch answer stays within its documented error (default rsd 5%)
    of truth on real data, so the documented swap is load-bearing."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    [row] = ev.agg(F.approx_count_distinct("user_id").alias("a")).collect()
    assert abs(row.a - exact) <= max(1, 0.05 * exact) * 3  # 3 sigma head-room


def test_orc_roundtrip_with_predicate_pushdown(spark, sf_dir, tmp_path):
    """ORC is the other columnar landing format Spark ships natively;
    the same rows must round-trip, and filters must reach the ORC
    reader (searchArgument pushdown) just like parquet."""
    src = _sample(spark, sf_dir)
    odir = str(tmp_path / "o")
    src.write.orc(odir)
    want = _rows(src)
    back = spark.read.orc(odir)
    assert _rows(back) == want
    plan = back.filter(F.col("user_id") == 7)._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)" in plan


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """A table written in two schema versions (v2 adds a column) must
    read back as one evolved frame under mergeSchema, with v1 rows
    null-filled — the add-a-column migration every long-lived 100 TB
    table goes through."""
    from pyspark.sql import functions as F

    from financial_arbitrage_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.length("text").alias("n_chars_v2")
    )
    path = str(tmp_path / "evolved")
    v1.write.parquet(path)
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "lang", "n_chars_v2"}
    assert merged.count() == docs.count()
    # v1 rows surface the new column as NULL; v2 rows carry real values
    nulls = merged.filter(F.col("n_chars_v2").isNull()).count()
    assert nulls == docs.filter(F.col("doc_id") % 2 == 0).count()
    total_v2 = (
        merged.filter(F.col("n_chars_v2").isNotNull())
        .agg(F.sum("n_chars_v2"))
        .first()[0]
    )
    expected = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .agg(F.sum(F.length("text")))
        .first()[0]
    )
    assert total_v2 == expected
