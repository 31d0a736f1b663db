"""Streaming ingest: replay source, snapshot enrichment, bifurcation.

Reference semantics being re-expressed (SURVEY §2.9, §3.1):

- T1 micro-batch pacing: the venue fetch loops hold a 1-2 s cycle
  (`virginia/api/data_feed.py:352-398`, `ireland/api/data_feed.py:418-487`)
  → `trigger(processingTime=...)` in production, `availableNow` in replay.
- T5 buffered sink flush (1000 rows / 5 s, `database/influx/writer.py:70-86`)
  → micro-batch boundaries; nothing to hand-code.
- T8 backpressure (ZMQ HWM, rate limiter) → `maxFilesPerTrigger` /
  source rate options.
- P1/P2 enrichment (`virginia/coordinator.py:433-537`): add source/ticker,
  serialize the book, stamp the receive/enrich points of the ns timing
  chain.
- T4 bifurcation (`virginia/coordinator.py:539-616`): one input feeding a
  storage lane and a trading lane → two writeStream queries on one source.
- K1 buffered time-series sink → append parquet partitioned by `source`
  (the 2-tag minimal-cardinality design of `database/models/influx.py:5-11`
  as a partitioning scheme).

At 100 TB the source is Kafka (`readStream.format("kafka")`) with the
same downstream plan; the file-replay source here exists so tests and the
driver can run the identical pipeline on deterministic fixtures without a
broker. Partition counts: the storage lane writes one file per shuffle
partition per trigger — at production rates coalesce to keep file sizes
~128 MB and compact small files offline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..sources.tables import load_table

# Replay rows: the driver's events table reduced to the fields the
# snapshot pipeline consumes, with event time in µs (ns precision beyond
# µs carries no information in the fixtures and µs is what DuckDB's
# TIMESTAMP holds, keeping oracles exact).
REPLAY_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def write_replay_chunks(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4
) -> int:
    """Materialize the events table as `n_chunks` parquet files so the
    file source replays it across that many micro-batches
    (`maxFilesPerTrigger=1`). Chunking is by EVENT-TIME range — a replay
    of a log is time-ordered, exactly like the live feed it stands in
    for, so watermarks advance monotonically and nothing is spuriously
    late. (The stateful operators themselves don't need this: their fold
    is by (event time, event_id), and dedicated tests replay disordered
    chunks. The watermark-dropping policy for genuinely late rows is
    tested with crafted late data.)

    Returns the row count. The write is fully distributed
    (`repartitionByRange` → one file per range, no driver collect); at
    production scale this function does not exist — Kafka does.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    n = ev.count()
    ev.repartitionByRange(n_chunks, "ts_us", "event_id").write.mode("overwrite").parquet(
        out_dir
    )
    # The file source picks micro-batches oldest-modification-time-first;
    # concurrently written part files don't guarantee that order matches
    # the time ranges. Rename to chunk-#### and stamp strictly increasing
    # mtimes so batch order == time order deterministically.
    import glob
    import time as _time

    parts = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    base = _time.time() - len(parts)
    for i, p in enumerate(parts):
        dst = os.path.join(out_dir, f"chunk-{i:04d}.parquet")
        os.rename(p, dst)
        os.utime(dst, (base + i, base + i))
    return n


def replay_stream(
    spark: SparkSession,
    replay_dir: str,
    files_per_trigger: int = 1,
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream over the replay chunks — one chunk per
    micro-batch (T1 pacing; `maxFilesPerTrigger` is the backpressure knob,
    T8). `fmt` picks the landed form: parquet chunks, or "json" for
    REST-payload JSON lines; the schema is always declared (a streaming
    source cannot re-infer per batch)."""
    reader = spark.readStream.schema(REPLAY_SCHEMA).option(
        "maxFilesPerTrigger", files_per_trigger
    )
    return reader.format(fmt).load(replay_dir)


def synthetic_feed_stream(
    spark: SparkSession,
    rows_per_batch: int = 2000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Non-file streaming source emitting the SAME replay-schema rows as
    `replay_stream` — proof that the downstream lanes (enrichment,
    storage, scan) are source-agnostic: they consume a schema contract,
    not a format. Uses Spark's `rate-micro-batch` source (deterministic
    rows-per-batch, deterministic timestamps from a fixed start), the
    engine-native stand-in for the reference's live REST poll loops
    (`virginia/api/data_feed.py:210-342`); in production the same lanes
    sit on `readStream.format("kafka")`.

    Field synthesis is a pure projection of (value, timestamp) — JVM-side,
    deterministic, so two runs of the same batch produce identical rows
    (a replayed batch after failure writes the same data)."""
    reader = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", "0")
    )
    if num_partitions:
        reader = reader.option("numPartitions", num_partitions)
    src = reader.load()  # columns: timestamp TIMESTAMP, value LONG
    event_types = F.array(
        *[F.lit(t) for t in ("click", "view", "purchase", "signup", "error")]
    )
    return src.select(
        F.col("value").alias("event_id"),
        F.unix_micros(F.col("timestamp")).alias("ts_us"),
        (F.col("value") % 500).alias("user_id"),
        F.element_at(event_types, (F.col("value") % 5 + 1).cast("int")).alias(
            "event_type"
        ),
        ((F.col("value") % 97 + 1).cast("double") / F.lit(100.0)).alias("value"),
    )


def decode_feed_lines(lines: DataFrame, schema: T.StructType = REPLAY_SCHEMA) -> DataFrame:
    """Decode a stream of JSON lines (the wire form a live feed ships —
    Kafka record values, socket lines) into typed rows under `schema`.
    One shared `from_json`, so every network source feeds the SAME
    downstream lanes as the file replay: the lanes consume a schema
    contract, not a transport. Unparseable/null lines are dropped here
    (the DLQ-aware ingest path routes them via `split_malformed`
    instead when a dead-letter lane is wanted)."""
    parsed = lines.select(F.from_json(F.col("line"), schema).alias("r"))
    return parsed.filter(
        F.col("r").isNotNull() & F.col(f"r.{schema.fields[0].name}").isNotNull()
    ).select("r.*")


def kafka_available(spark: SparkSession) -> bool:
    """True iff the spark-sql-kafka connector is on the JVM classpath.
    The connector ships separately from Spark core; this container has
    neither the jar nor a broker, so callers gate on this and fall back
    to `socket_feed_stream` (built-in, jar-free) to prove the
    network-source path."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_feed_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The production ingest source: `readStream.format("kafka")` with
    JSON record values decoded to the replay schema — the reference's
    live venue feed (`virginia/api/data_feed.py:352-398`, ZMQ transport
    `database/broker/receiver.py:485-545`) re-expressed as the standard
    Spark source. Everything downstream (enrich_snapshots,
    start_storage_lane, the scan lane) is byte-identical to the
    file-replay path — swap the source, keep the pipeline.

    Raises a clear RuntimeError when the connector jar is absent, so
    the failure mode is a documented gate, not a ClassNotFound from
    deep inside query planning."""
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; add the "
            "org.apache.spark:spark-sql-kafka-0-10 package or use "
            "socket_feed_stream/replay_stream"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_feed_lines(
        raw.select(F.col("value").cast("string").alias("line"))
    )


def kafka_standin_feed_stream(
    spark: SparkSession,
    log_dir: str,
    topic: str = "standin",
) -> DataFrame:
    """The Kafka-SHAPED ingest source runnable in-container (VERDICT r5
    task 8): the `kafka_standin` Python DataSource (partitioned
    append-only topic logs, per-partition line-index offsets,
    checkpointable exactly-once restart — `sources/kafka_standin.py`)
    with record values decoded through the SAME `decode_feed_lines` as
    `kafka_feed_stream` and `socket_feed_stream`. Everything downstream
    (enrich_snapshots, start_storage_lane, the scan lane) is
    byte-identical to the Kafka path — on a cluster with a broker, swap
    this call for `kafka_feed_stream` and nothing else changes."""
    from ..sources import kafka_standin

    kafka_standin.register(spark)
    raw = (
        spark.readStream.format("kafka_standin")
        .option("path", log_dir)
        .option("topic", topic)
        .load()
    )
    return decode_feed_lines(raw.select(F.col("value").alias("line")))


def socket_feed_stream(
    spark: SparkSession,
    host: str,
    port: int,
    schema: T.StructType = REPLAY_SCHEMA,
) -> DataFrame:
    """A real NETWORK streaming source with no extra jars: Spark's
    built-in socket source reading JSON lines from a live TCP feed,
    decoded by the same `decode_feed_lines` as the Kafka path. This is
    the in-container proof of source-agnosticism for the ingest and
    scan lanes (the Kafka jar/broker aren't shippable here); it is a
    test/dev transport — no replay on failure — exactly like Spark
    documents it."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return decode_feed_lines(raw.select(F.col("value").alias("line")), schema)


def run_until_batches(q: StreamingQuery, n_batches: int, timeout_sec: float = 120.0) -> None:
    """Let an unbounded-source query (rate/Kafka) process at least
    `n_batches` micro-batches, then stop it gracefully. The bounded-file
    replay uses availableNow and terminates by itself; an unbounded
    source needs an explicit stop condition."""
    import time as _time

    deadline = _time.time() + timeout_sec
    while _time.time() < deadline:
        lp = q.lastProgress
        if lp is not None and lp["batchId"] + 1 >= n_batches:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)


def enrich_snapshots(df: DataFrame) -> DataFrame:
    """P1/P2 snapshot enrichment (`virginia/coordinator.py:433-537`): tag
    the venue (source), name the key (ticker), serialize the quote payload
    to the stored-JSON shape, and stamp the receive/enrich points of the
    ns timing chain. Stamps are derived deterministically from event time
    (the reference stamps wall clock; wall clock in a replay breaks
    reproducibility, so the replay models the chain as fixed per-hop
    offsets — the *columns and their arithmetic* are what downstream
    consumers depend on)."""
    recv_ns = F.col("ts_us") * 1000 + F.lit(1_000_000)  # +1ms transport
    enr_ns = recv_ns + F.lit(250_000)  # +0.25ms enrichment
    return df.select(
        F.when(F.col("user_id") % 2 == 0, F.lit("kalshi"))
        .otherwise(F.lit("polymarket"))
        .alias("source"),
        F.col("user_id").cast("string").alias("ticker"),
        F.to_json(
            F.struct(
                F.col("event_id").alias("event_id"),
                F.col("value").alias("value"),
                F.col("event_type").alias("event_type"),
            )
        ).alias("full_orderbook"),
        (F.col("ts_us") * 1000).alias("api_call_start_ns"),
        recv_ns.alias("virginia_received_ns"),
        enr_ns.alias("virginia_enriched_ns"),
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts_us",
    )


def with_pipeline_counters(
    df: DataFrame, name: str = "ingest_counters"
) -> DataFrame:
    """The reference's pipeline health counters (messages processed,
    latency totals — `README.md:111-115`, the interval logger) as
    engine-native OBSERVED METRICS: aggregates computed inside the
    already-running plan (no second scan, no side channel), surfaced
    per micro-batch in StreamingQueryProgress.observedMetrics and in
    batch via pyspark.sql.Observation. At 100 TB this is the only
    affordable way to count a pipeline — a monitoring count(*) query
    would re-read the table."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("virginia_received_ns") - F.col("api_call_start_ns")).alias(
            "total_transport_ns"
        ),
        F.max("ts_us").alias("max_ts_us"),
    )


def start_storage_lane(
    snapshots: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """K1: append the enriched snapshot stream to the `market_snapshot`
    table, partitioned by `source` — the Influx 2-tag cardinality design
    (`database/models/influx.py:5-11,65-74`) realized as partition
    pruning. Retry/DLQ (T6) is checkpoint + task retries: a failed batch
    replays from the checkpoint with exactly-once file-sink semantics.
    Every batch reports its observed counters (with_pipeline_counters)
    through the streaming progress API. `available_now=False` runs the
    lane continuously for unbounded sources (rate/Kafka); pair it with
    `run_until_batches` in tests."""
    writer = (
        with_pipeline_counters(snapshots)
        .writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("source")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_bifurcated_ingest(
    spark: SparkSession,
    replay_dir: str,
    storage_dir: str,
    checkpoint_root: str,
    trading_lane: "callable[[DataFrame], StreamingQuery]",
) -> tuple[StreamingQuery, StreamingQuery]:
    """T4 bifurcation (`virginia/coordinator.py:539-616`): ONE source,
    two independent streaming queries — the storage lane appending the
    snapshot table and the trading lane (built by `trading_lane` from the
    same enriched stream). Each query has its own checkpoint; the file
    source serves both without re-reading cost worth caring about at
    fixture scale (Kafka serves both consumer groups in production)."""
    enriched = enrich_snapshots(replay_stream(spark, replay_dir))
    storage_q = start_storage_lane(
        enriched, storage_dir, os.path.join(checkpoint_root, "storage")
    )
    trading_q = trading_lane(enriched)
    return storage_q, trading_q


def replay_stream_json(
    spark: SparkSession, replay_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """`replay_stream` over the landed REST-payload form (poll responses
    appended as JSON lines)."""
    return replay_stream(spark, replay_dir, files_per_trigger, fmt="json")


def split_malformed(df: DataFrame, json_col: str, schema) -> tuple[DataFrame, DataFrame]:
    """The dead-letter lane (T6): the reference queues failed writes for
    replay instead of dropping them (`database/influx/writer.py:422-470`);
    the columnar analog is payload-level — a snapshot whose JSON blob
    doesn't parse must neither kill the stream (ANSI error) nor silently
    null out downstream. One `from_json` splits the flow: rows whose
    payload parses go on with the typed column; the rest keep the raw
    blob for a DLQ table, replayable after a parser fix. Both branches
    share the single parse (no double scan); works identically on batch
    and streaming DataFrames (foreachBatch writes the DLQ side)."""
    # PERMISSIVE from_json yields an all-null struct (not NULL) for a
    # corrupt payload, so corruption is detected via the dedicated
    # corrupt-record field, which is non-null exactly for unparseable
    # non-null input.
    with_corrupt = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
    )
    parsed = df.withColumn(
        "__parsed",
        F.from_json(
            F.col(json_col),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    # A NULL payload parses to a null corrupt-record field too, so it
    # would otherwise ride the good lane as an all-null struct — route it
    # to the DLQ explicitly: a snapshot with no book blob is malformed.
    bad_if = F.col("__parsed._corrupt_record").isNotNull() | F.col(json_col).isNull()
    good = (
        parsed.filter(~bad_if)
        .drop(json_col)
        .withColumn(json_col, F.col("__parsed").dropFields("_corrupt_record"))
        .drop("__parsed")
    )
    bad = parsed.filter(bad_if).drop("__parsed")
    return good, bad
