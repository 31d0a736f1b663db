"""Source-format breadth: the same declared schema reads the same rows
from parquet, JSON-lines (landed REST payloads), and CSV (bulk exports),
batch and streaming."""

from __future__ import annotations

import os

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
