"""Source-agnosticism proof (S1/S3, r2 backlog): the ingest and scan
lanes run unchanged over a NON-FILE streaming source. `replay_stream`
(file source) and `synthetic_feed_stream` (rate-micro-batch source) emit
the same replay-schema rows; everything downstream — P1/P2 enrichment,
K1 storage lane, the stateful J1 opportunity scan — consumes the schema
contract and never sees the format. In production the same lanes sit on
`readStream.format("kafka")`."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.streaming import ingest, scan


def test_storage_lane_over_rate_source(spark, tmp_path):
    src = ingest.synthetic_feed_stream(spark, rows_per_batch=500, num_partitions=2)
    table = str(tmp_path / "snap")
    q = ingest.start_storage_lane(
        ingest.enrich_snapshots(src),
        table,
        str(tmp_path / "ckpt"),
        available_now=False,
    )
    ingest.run_until_batches(q, 3)

    snap = spark.read.parquet(table)
    # identical landed schema to the file-based lane
    assert {
        "source",
        "ticker",
        "full_orderbook",
        "api_call_start_ns",
        "virginia_received_ns",
        "virginia_enriched_ns",
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts_us",
    } <= set(snap.columns)
    assert snap.count() >= 1000  # >= 2 full batches landed
    # both venue partitions present (partitionBy("source") layout)
    assert {r.source for r in snap.select("source").distinct().collect()} == {
        "kalshi",
        "polymarket",
    }
    # deterministic synthesis: event ids are the rate values from 0
    assert snap.agg(F.min("event_id")).first()[0] == 0
    # ns timing chain arithmetic held across the source swap
    bad = snap.filter(
        F.col("virginia_received_ns") - F.col("api_call_start_ns") != 1_000_000
    ).count()
    assert bad == 0


def test_arbitrage_scan_over_rate_source(spark, tmp_path, sf_dir):
    src = ingest.synthetic_feed_stream(spark, rows_per_batch=1000, num_partitions=2)
    quotes = scan.quotes_from_snapshots(ingest.enrich_snapshots(src))
    sink = str(tmp_path / "opps")
    q = scan.start_scan_lane(
        scan.opportunity_stream(quotes, scan.pair_universe(spark, sf_dir)),
        sink,
        str(tmp_path / "ckpt"),
        available_now=False,
    )
    ingest.run_until_batches(q, 3)

    emissions = spark.read.parquet(sink)
    assert emissions.count() > 0
    assert {"pair_id", "batch_id"} <= set(emissions.columns)
    # scan state only ever emits pairs from the broadcast universe
    universe = {
        r.pair_id for r in scan.pair_universe(spark, sf_dir).collect()
    }
    emitted = {r.pair_id for r in emissions.select("pair_id").distinct().collect()}
    assert emitted <= universe
