"""Oracle-checked entry points for the streaming layer.

Each builder runs a real Structured Streaming query (availableNow
trigger) over a deterministic replay of the events fixture, then returns
the materialized result as a batch DataFrame. The streaming semantics
under test — micro-batched source (T1), enrichment (P1/P2), bifurcated
storage lane (T4/K1), stateful latest-per-key scan with freshness gate
(T3/T2/F5 + J1/J2/F6/A7), watermarked windowed downsample (A6/T2) — are
the reference's continuous pipeline (SURVEY §3.1-3.3); because the fold
is by event time, the final results are deterministic functions of the
input and therefore exactly SQL-expressible, giving these streaming
operators full value-hash oracles instead of rows-only checks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..streaming import ingest, liveness, scan


def _workdir() -> str:
    return tempfile.mkdtemp(prefix="sgstream_")


def _replay(spark: SparkSession, sf_dir: str, root: str, n_chunks: int = 4) -> str:
    replay_dir = os.path.join(root, "replay")
    ingest.write_replay_chunks(spark, sf_dir, replay_dir, n_chunks=n_chunks)
    return replay_dir


# ---------------------------------------------------------------------------
# Storage lane: replay → enrich → partitioned append (T1/P1/P2/T4/K1)
# ---------------------------------------------------------------------------
@query(
    "streaming_ingest_storage",
    oracle="""
SELECT CASE WHEN user_id % 2 = 0 THEN 'kalshi' ELSE 'polymarket' END AS source,
       COUNT(*) AS n_snapshots,
       COUNT(DISTINCT user_id) AS n_tickers,
       MIN(epoch_us(ts)) AS min_ts_us,
       MAX(epoch_us(ts)) AS max_ts_us,
       CAST(SUM(epoch_us(ts) * 1000 + 1000000 - epoch_us(ts) * 1000) AS BIGINT)
         AS total_transport_ns
FROM events
GROUP BY 1
""",
    tags=("T1", "T4", "T5", "K1", "P1", "P2", "streaming"),
)
def streaming_ingest_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the ingest storage lane end-to-end — micro-batched replay
    source → P1/P2 enrichment (venue tag, JSON payload, ns timing stamps)
    → append parquet partitioned by source (the market_snapshot table) —
    then aggregate the landed table per venue. The oracle recomputes the
    same stats straight from events: equality proves no rows were lost,
    duplicated, or mis-stamped across micro-batch boundaries
    (exactly-once file sink, K1/T6)."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        table_dir = os.path.join(root, "market_snapshot")
        q = ingest.start_storage_lane(
            ingest.enrich_snapshots(ingest.replay_stream(spark, replay_dir)),
            table_dir,
            os.path.join(root, "ckpt"),
        )
        q.awaitTermination()
        snap = spark.read.parquet(table_dir)
        return (
            snap.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_snapshots"),
                F.countDistinct("ticker").alias("n_tickers"),
                F.min("ts_us").alias("min_ts_us"),
                F.max("ts_us").alias("max_ts_us"),
                F.sum(F.col("virginia_received_ns") - F.col("api_call_start_ns")).alias(
                    "total_transport_ns"
                ),
            )
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# The same storage lane over the in-process Kafka STAND-IN (r5 task 8)
# ---------------------------------------------------------------------------
@query(
    "streaming_kafka_standin_ingest",
    oracle="""
SELECT CASE WHEN user_id % 2 = 0 THEN 'kalshi' ELSE 'polymarket' END AS source,
       COUNT(*) AS n_snapshots,
       COUNT(DISTINCT user_id) AS n_tickers,
       MIN(epoch_us(ts)) AS min_ts_us,
       MAX(epoch_us(ts)) AS max_ts_us,
       CAST(SUM(epoch_us(ts) * 1000 + 1000000 - epoch_us(ts) * 1000) AS BIGINT)
         AS total_transport_ns
FROM events
GROUP BY 1
""",
    tags=("S1", "T1", "T4", "K1", "streaming", "kafka-standin"),
)
def streaming_kafka_standin_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`streaming_ingest_storage`-shape over the Kafka STAND-IN source
    (`sources/kafka_standin.py`): the events fixture is PUBLISHED as
    keyed JSON records into a partitioned append-only topic (same-key →
    same-partition, like Kafka's default partitioner), the lane consumes
    it through `kafka_standin_feed_stream` → `decode_feed_lines` →
    enrich → partitioned sink, and the oracle recomputes the stats from
    events directly. A hash match proves the full Kafka-shaped path —
    per-partition offsets, JSON value decode, micro-batch boundaries —
    lands every published record exactly once. Publishing is
    EXECUTOR-SIDE (`publish_df`, VERDICT r10 task 5): records are routed
    to topic partitions by the same fnv-1a partitioner inside the plan
    and each partition log is appended by exactly one task — the fixture
    is never collected to the driver, so the broker-setup step scales
    with executors, not driver memory."""
    from ..sources import kafka_standin

    root = _workdir()
    try:
        ev = ingest.load_table(spark, sf_dir, "events").select(
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        records_df = ev.select(
            F.col("user_id").cast("string").alias("key"),
            F.to_json(
                F.struct("event_id", "ts_us", "user_id", "event_type", "value")
            ).alias("value"),
        )
        topic_dir = os.path.join(root, "topic")
        kafka_standin.publish_df(records_df, topic_dir, n_partitions=4)
        table_dir = os.path.join(root, "market_snapshot")
        q = ingest.start_storage_lane(
            ingest.enrich_snapshots(
                ingest.kafka_standin_feed_stream(spark, topic_dir)
            ),
            table_dir,
            os.path.join(root, "ckpt"),
        )
        q.awaitTermination()
        snap = spark.read.parquet(table_dir)
        return (
            snap.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_snapshots"),
                F.countDistinct("ticker").alias("n_tickers"),
                F.min("ts_us").alias("min_ts_us"),
                F.max("ts_us").alias("max_ts_us"),
                F.sum(
                    F.col("virginia_received_ns") - F.col("api_call_start_ns")
                ).alias("total_transport_ns"),
            )
        ).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Trading lane: the continuous opportunity scan (T2/T3/F5 + J1/J2/F6/A7)
# ---------------------------------------------------------------------------
_STREAM_SCAN_ORACLE = f"""
WITH kalshi AS (
  SELECT user_id,
         (CAST(round(value * 100) AS BIGINT) % 97 + 1) / 100.0 AS yes_bid,
         (CAST(round(value * 100) AS BIGINT) % 89 + 1) / 100.0 AS no_bid,
         epoch_us(ts) AS ts_us
  FROM events
  WHERE event_type IN ('click', 'view')
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
poly AS (
  SELECT user_id,
         (CAST(round(value * 100) AS BIGINT) % 99 + 1) / 100.0 AS yes_price,
         1.0 - (CAST(round(value * 100) AS BIGINT) % 99 + 1) / 100.0 AS no_price,
         epoch_us(ts) AS ts_us
  FROM events
  WHERE event_type IN ('purchase', 'signup', 'error')
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
pairs AS (
  SELECT c_custkey AS pair_id FROM customer
  WHERE c_custkey < 200 AND c_custkey % 10 <> 0
),
joined AS (
  SELECT p.pair_id,
         k.yes_bid AS kalshi_yes_bid, k.no_bid AS kalshi_no_bid,
         m.yes_price AS poly_yes, m.no_price AS poly_no
  FROM pairs p
  JOIN kalshi k ON k.user_id = p.pair_id
  JOIN poly m ON m.user_id = p.pair_id
  WHERE abs(k.ts_us - m.ts_us) <= {scan.FRESHNESS_US_DEFAULT}
),
scored AS (
  SELECT *,
         (kalshi_yes_bid - poly_yes) / poly_yes AS margin_yes,
         (kalshi_no_bid - poly_no) / poly_no AS margin_no,
         (poly_yes < kalshi_yes_bid) AS yes_ok,
         (poly_no < kalshi_no_bid) AS no_ok
  FROM joined
)
SELECT pair_id,
       CASE WHEN yes_ok AND (NOT no_ok OR margin_yes >= margin_no)
            THEN 'kalshi_yes_polymarket_no' ELSE 'kalshi_no_polymarket_yes' END
         AS arbitrage_type,
       CASE WHEN yes_ok AND (NOT no_ok OR margin_yes >= margin_no)
            THEN kalshi_yes_bid ELSE kalshi_no_bid END AS kalshi_price,
       CASE WHEN yes_ok AND (NOT no_ok OR margin_yes >= margin_no)
            THEN poly_yes ELSE poly_no END AS poly_price,
       CASE WHEN yes_ok AND (NOT no_ok OR margin_yes >= margin_no)
            THEN margin_yes ELSE margin_no END AS profit_margin
FROM scored
WHERE (yes_ok OR no_ok)
  AND (CASE WHEN yes_ok AND (NOT no_ok OR margin_yes >= margin_no)
            THEN margin_yes ELSE margin_no END) > {scan.THRESHOLD_DEFAULT}
"""


@query(
    "streaming_arbitrage_scan",
    oracle=_STREAM_SCAN_ORACLE,
    tags=("J1", "T2", "T3", "F5", "F6", "A7", "streaming"),
)
def streaming_arbitrage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous scan run as a real stream: replay → enrich → quotes
    → broadcast pair join → applyInPandasWithState latest-per-key fold
    with the freshness gate → per-batch decision emissions → last
    emission per pair. Because the fold is by (event_time, event_id), the
    final per-pair state — and therefore this result — is independent of
    how the replay is chunked into micro-batches; the oracle is the
    equivalent one-shot SQL over the same input."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "opportunities")
        quotes = scan.quotes_from_snapshots(
            ingest.enrich_snapshots(ingest.replay_stream(spark, replay_dir))
        )
        q = scan.start_scan_lane(
            scan.opportunity_stream(quotes, scan.pair_universe(spark, sf_dir)),
            sink_dir,
            os.path.join(root, "ckpt"),
        )
        q.awaitTermination()
        return scan.final_opportunities(spark, sink_dir).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Watermarked downsample (A6/T2 streaming form)
# ---------------------------------------------------------------------------
_DOWNSAMPLE_ORACLE = """
WITH wm AS (
  SELECT MAX(ts) - INTERVAL 10 MINUTE AS watermark FROM events
),
bucketed AS (
  SELECT time_bucket(INTERVAL 1 MINUTE, ts) AS window_start,
         event_type, value, ts, event_id
  FROM events
),
ranked AS (
  SELECT b.window_start, b.event_type, b.value,
         ROW_NUMBER() OVER (PARTITION BY b.window_start, b.event_type
                            ORDER BY b.ts DESC, b.event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY b.window_start, b.event_type) AS n_events
  FROM bucketed b CROSS JOIN wm
  WHERE b.window_start + INTERVAL 1 MINUTE <= wm.watermark
)
SELECT window_start, event_type, value AS last_value, n_events
FROM ranked WHERE rn = 1
"""


@query(
    "streaming_downsample_1m",
    oracle=_DOWNSAMPLE_ORACLE,
    tags=("A6", "T2", "W1", "streaming"),
)
def streaming_downsample_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming aggregateWindow(every: 1m, fn: last) with a 10-minute
    watermark, append mode: a window emits exactly once when the
    watermark passes its end, so the materialized table contains exactly
    the windows whose end ≤ final watermark (max event time − 10 min) —
    which is what the oracle states. Late rows inside the watermark are
    folded correctly; the deterministic 'last' is max_by((ts, event_id))."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "downsampled")
        down = scan.downsample_stream(
            ingest.enrich_snapshots(ingest.replay_stream(spark, replay_dir))
        )
        q = (
            down.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink_dir).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# T7: session liveness with event-time timeout eviction
# ---------------------------------------------------------------------------
_LIVENESS_TTL_S = 3 * 86400  # 3 days against the 30-day fixture span

_LIVENESS_ORACLE = f"""
WITH wm AS (SELECT MAX(epoch_us(ts)) AS wm_us FROM events),
per_sub AS (
  SELECT user_id AS subscriber_id,
         MAX(epoch_us(ts)) AS last_seen_us,
         COUNT(*) AS n_heartbeats
  FROM events GROUP BY user_id
)
SELECT p.subscriber_id,
       CASE WHEN p.last_seen_us + {_LIVENESS_TTL_S * 1_000_000} < w.wm_us
            THEN 'evicted' ELSE 'active' END AS status,
       p.last_seen_us,
       p.n_heartbeats
FROM per_sub p CROSS JOIN wm w
"""


@query(
    "streaming_subscriber_liveness",
    oracle=_LIVENESS_ORACLE,
    tags=("T7", "T2", "streaming"),
)
def streaming_subscriber_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 session liveness (`virginia/broker/publisher.py:224-320`) over
    the events replay: every event is a heartbeat for its user; a user
    silent for >3 days of event time is evicted by the stateful
    operator's event-time timeout. The oracle states the resulting
    invariant: final status is 'evicted' iff last_seen + ttl < final
    watermark (max event time; 0s watermark delay)."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "liveness")
        hb = (
            ingest.replay_stream(spark, replay_dir)
            .select(
                F.col("user_id").alias("subscriber_id"),
                F.timestamp_micros(F.col("ts_us")).alias("ts"),
            )
        )
        out = liveness.liveness_stream(hb, ttl_seconds=_LIVENESS_TTL_S)

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(sink_dir)
            )

        q = (
            out.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return liveness.final_liveness(spark, sink_dir).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming ingest dedup of an at-least-once source (T6 + training-data
# dedup family): the exactly-once gate every LLM-ingest pipeline needs
# in front of a redelivering upstream (Kafka producer retries, here a
# replay that re-delivers a subset of each chunk in the next one)
# ---------------------------------------------------------------------------
def _write_redelivered_chunks(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4
) -> None:
    """Replay chunks with simulated at-least-once delivery: chunk i also
    re-delivers chunk i-1's `event_id % 7 == 0` rows, so ~14% of events
    arrive twice and always in a LATER micro-batch than the original —
    cross-batch duplicates that only stateful dedup can catch."""
    import glob
    import time as _time

    base_dir = os.path.join(out_dir + "_base")
    ingest.write_replay_chunks(spark, sf_dir, base_dir, n_chunks=n_chunks)
    chunks = sorted(glob.glob(os.path.join(base_dir, "chunk-*.parquet")))
    os.makedirs(out_dir, exist_ok=True)
    base = _time.time() - n_chunks
    prev = None
    for i, c in enumerate(chunks):
        df = spark.read.schema(ingest.REPLAY_SCHEMA).parquet(c)
        if prev is not None:
            dup = (
                spark.read.schema(ingest.REPLAY_SCHEMA)
                .parquet(prev)
                .filter(F.col("event_id") % 7 == 0)
            )
            df = df.unionByName(dup)
        tmp = os.path.join(out_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"chunk-{i:04d}.parquet")
        os.replace(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i, base + i))
        prev = c


@query(
    "streaming_dedup_ingest",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redelivered_class
FROM events
GROUP BY event_type
""",
    tags=("T6", "dedup-streaming", "streaming"),
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest over an at-least-once source: the replay
    re-delivers ~14% of each chunk one micro-batch later;
    `dropDuplicatesWithinWatermark` on the event key drops the replays
    while bounding state — keys are evicted once the event-time
    watermark (8 days > the widest chunk span) passes, so state holds
    ~one chunk of keys, not the whole history. The oracle aggregates the
    ORIGINAL events: equality proves every duplicate was dropped and no
    original was lost across batch boundaries. The landed
    `n_redelivered_class` column counts the twice-delivered id class —
    if any replay slipped through, both columns inflate and the
    value-hash breaks."""
    root = _workdir()
    try:
        replay_dir = os.path.join(root, "replay")
        _write_redelivered_chunks(spark, sf_dir, replay_dir)
        table_dir = os.path.join(root, "deduped")
        deduped = (
            ingest.replay_stream(spark, replay_dir)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            .withWatermark("ts", "8 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", table_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        landed = spark.read.parquet(table_dir)
        return (
            landed.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_unique"),
                F.sum(F.when(F.col("event_id") % 7 == 0, 1).otherwise(0)).alias(
                    "n_redelivered_class"
                ),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-stream interval join (the streaming twin of the batch bucketed
# range join): click attribution computed WHILE both sides flow
# ---------------------------------------------------------------------------
_ATTR_RADIUS_US = 300_000_000  # +/- 5 minutes, matching purchase_click_attribution


@query(
    "streaming_click_attribution",
    oracle=f"""
WITH c AS (
  SELECT epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id, epoch_us(ts) AS p_ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.p_ts AS purchase_ts_us,
       CAST(COUNT(*) AS BIGINT) AS nearby_clicks
FROM p JOIN c
  ON c.c_ts BETWEEN p.p_ts - {_ATTR_RADIUS_US} AND p.p_ts + {_ATTR_RADIUS_US}
GROUP BY 1, 2
""",
    tags=("T2", "range-join", "streaming"),
)
def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real stream-stream inner join: purchases and clicks are two
    streams off the same replay; each purchase joins clicks within
    +/-5 min of event time. Spark's symmetric hash join needs an equi
    key — the SAME radius-bucket decomposition as the batch operator
    provides it (purchase exploded to 3 candidate buckets, click in its
    one bucket), with the exact interval condition as the event-time
    range predicate BOTH for correctness and for state cleanup: each
    side's buffer is evicted once the other side's watermark passes the
    interval bound, so state is ~(watermark + radius) of stream, not
    the whole history. Joined pairs land exactly-once in a file sink;
    the per-purchase count is batch assembly over the landed pairs
    (a windowless streaming aggregation can't emit in append mode).
    The oracle is the batch inequality join — equality proves no pair
    was dropped at chunk boundaries or double-emitted on restart paths."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink = os.path.join(root, "pairs")
        R = _ATTR_RADIUS_US

        purchases = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                "event_id",
                F.col("ts_us").alias("p_ts_us"),
                F.timestamp_micros(F.col("ts_us")).alias("p_ts"),
            )
            .withColumn(
                "bucket",
                F.explode(
                    F.array(
                        F.expr(f"p_ts_us div {R}") - 1,
                        F.expr(f"p_ts_us div {R}"),
                        F.expr(f"p_ts_us div {R}") + 1,
                    )
                ),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        clicks = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("ts_us").alias("c_ts_us"),
                F.timestamp_micros(F.col("ts_us")).alias("c_ts"),
            )
            .withColumn("bucket", F.expr(f"c_ts_us div {R}"))
            .withWatermark("c_ts", "10 minutes")
        )
        joined = purchases.join(
            clicks,
            (purchases.bucket == clicks.bucket)
            & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 5 MINUTES"))
            & (clicks.c_ts <= purchases.p_ts + F.expr("INTERVAL 5 MINUTES")),
        ).select("event_id", "p_ts_us", "c_ts_us")
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(sink)
            .groupBy("event_id", F.col("p_ts_us").alias("purchase_ts_us"))
            .agg(F.count(F.lit(1)).alias("nearby_clicks"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER interval join: the watermark-expiry emission
# semantics (NULL rows for never-matched state, held back until the global
# watermark proves no future match is possible)
# ---------------------------------------------------------------------------
_ATTR_DELAY_US = 600_000_000  # the 10-minute watermark on both streams


@query(
    "streaming_click_attribution_outer",
    oracle=f"""
WITH c AS (
  SELECT epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id, epoch_us(ts) AS p_ts FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT LEAST((SELECT MAX(c_ts) FROM c), (SELECT MAX(p_ts) FROM p))
         - {_ATTR_DELAY_US} AS wm
),
m AS (
  SELECT p.event_id, p.p_ts, COUNT(c.c_ts) AS nearby
  FROM p LEFT JOIN c
    ON c.c_ts BETWEEN p.p_ts - {_ATTR_RADIUS_US} AND p.p_ts + {_ATTR_RADIUS_US}
  GROUP BY 1, 2
)
SELECT m.event_id, m.p_ts AS purchase_ts_us,
       CAST(m.nearby AS BIGINT) AS nearby_clicks
FROM m, wm
WHERE m.nearby > 0 OR m.p_ts + {_ATTR_RADIUS_US} < wm.wm
""",
    tags=("T2", "range-join", "streaming", "outer-join"),
)
def streaming_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the semantics the inner
    variant can't show: a purchase with NO click within +/-5 min must
    still emit (with NULL click columns), but only once the global
    watermark proves no future click can match. Spark holds the
    unmatched left row in state and emits the NULL-padded row when
    `p_ts + radius` falls behind min(both sides' watermarks); purchases
    younger than that at end-of-stream are WITHHELD — and the oracle
    states exactly that emission rule declaratively: matched purchases
    always appear, unmatched ones appear iff their join bound expired
    before the final watermark min(max_click, max_purchase) - 10 min.
    A hash match therefore pins Spark's outer-emission timing, not just
    the join pairs. The exploded radius-bucket copies mean a matched
    purchase can also emit NULL rows for its never-matched bucket
    copies — the assembly counts only non-null clicks, so those
    expiries are harmless (and themselves deterministic).
    Scale shape: same symmetric hash join + bucket equi-key as the
    inner variant; state is bounded by watermark + radius per side."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink = os.path.join(root, "pairs")
        R = _ATTR_RADIUS_US

        purchases = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                "event_id",
                F.col("ts_us").alias("p_ts_us"),
                F.timestamp_micros(F.col("ts_us")).alias("p_ts"),
            )
            .withColumn(
                "bucket",
                F.explode(
                    F.array(
                        F.expr(f"p_ts_us div {R}") - 1,
                        F.expr(f"p_ts_us div {R}"),
                        F.expr(f"p_ts_us div {R}") + 1,
                    )
                ),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        clicks = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("ts_us").alias("c_ts_us"),
                F.timestamp_micros(F.col("ts_us")).alias("c_ts"),
            )
            .withColumn("bucket", F.expr(f"c_ts_us div {R}"))
            .withWatermark("c_ts", "10 minutes")
        )
        joined = purchases.join(
            clicks,
            (purchases.bucket == clicks.bucket)
            & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 5 MINUTES"))
            & (clicks.c_ts <= purchases.p_ts + F.expr("INTERVAL 5 MINUTES")),
            "leftOuter",
        ).select("event_id", "p_ts_us", "c_ts_us")
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(sink)
            .groupBy("event_id", F.col("p_ts_us").alias("purchase_ts_us"))
            .agg(F.count(F.col("c_ts_us")).alias("nearby_clicks"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Continuous aggregate maintained by MERGE (A2 + K4 in streaming form):
# the reference's running pair-performance counters
# (`database/postgres/writer.py:409-468`) as a foreachBatch upsert
# ---------------------------------------------------------------------------
def make_pair_perf_upserter(spark: SparkSession, table: str):
    """Build the foreachBatch upserter for the running pair-performance
    table at `table` (created empty if absent). Exposed module-level so
    the redelivery test exercises EXACTLY the shipped batch handler."""
    from .upsert import create_bucketed_table, merge_into_parquet

    if not os.path.exists(table):
        create_bucketed_table(
            spark,
            table,
            spark.createDataFrame(
                [],
                "pair_id long, total_trades long, total_volume long,"
                " total_cost_cents long",
            ),
            key="pair_id",
        )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        from .upsert import recover_merge_table

        # Resolve any crashed prior merge BEFORE trusting the marker: a
        # committed-but-uncleaned merge rolls forward (reinstalling its
        # marker so this batch skips), an uncommitted one rolls back (so
        # re-applying is safe) — either way at-least-once redelivery is
        # exactly-once into the table. break_lock: this upserter IS the
        # table's single writer, so a lock found at batch start can only
        # be a crashed predecessor's.
        recover_merge_table(table, break_lock=True)
        marker = os.path.join(table, "_last_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # redelivered batch: already merged
        qty = F.col("event_id") % 10 + 1
        cents = F.round(F.col("value") * 100).cast("long")
        b = (
            batch_df.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("pair_id"),
                qty.alias("qty"),
                (qty * cents).alias("cost"),
            )
            .groupBy("pair_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("qty").alias("v"),
                F.sum("cost").alias("c"),
            )
        )
        merge_into_parquet(
            spark,
            table,
            b,
            key="pair_id",
            set_exprs={
                "total_trades": F.coalesce(F.col("t.total_trades"), F.lit(0))
                + F.col("u.n"),
                "total_volume": F.coalesce(F.col("t.total_volume"), F.lit(0))
                + F.col("u.v"),
                "total_cost_cents": F.coalesce(F.col("t.total_cost_cents"), F.lit(0))
                + F.col("u.c"),
            },
            insert_missing=True,
            extra_files={"_last_applied_batch": str(batch_id)},
            applied_batch_id=batch_id,
        )

    return upsert_batch


@query(
    "streaming_pair_performance",
    oracle="""
SELECT user_id AS pair_id,
       CAST(COUNT(*) AS BIGINT) AS total_trades,
       CAST(SUM(event_id % 10 + 1) AS BIGINT) AS total_volume,
       CAST(SUM((event_id % 10 + 1) * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cost_cents
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
""",
    tags=("A2", "K4", "T4", "streaming"),
)
def streaming_pair_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-pair trade counters maintained INCREMENTALLY: each
    micro-batch pre-aggregates its fills map-side (pairs x batch, tiny)
    and MERGEs the deltas into the running table — the reference's
    `total_trades += 1` counters (`writer.py:409-468`). foreachBatch is
    at-least-once, so the additive merge records the applied batch id
    in the commit manifest that lands with the bucket swaps in one
    atomic rename (see `upsert.recover_merge_table`): a redelivered
    batch is skipped, never double-added, even across a crash between
    bucket swaps. The oracle
    recomputes the same totals from scratch: equality proves the
    incremental path equals the batch recompute — the defining property
    of a continuous aggregate."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        table = os.path.join(root, "pair_perf")
        upsert_batch = make_pair_perf_upserter(spark, table)
        q = (
            ingest.replay_stream(spark, replay_dir)
            .writeStream.foreachBatch(upsert_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from .upsert import read_merge_table

        return read_merge_table(spark, table).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Sliding-window rate monitoring (overlapping windows, append mode)
# ---------------------------------------------------------------------------
_SLIDING_RATE_ORACLE = """
WITH wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS watermark FROM events),
ev AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'kalshi' ELSE 'polymarket' END AS source,
         ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
wins AS (
  SELECT source, time_bucket(INTERVAL 5 MINUTE, ts) AS ws, cents FROM ev
  UNION ALL
  SELECT source, time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE AS ws, cents
  FROM ev
)
SELECT w.ws AS window_start,
       w.ws + INTERVAL 10 MINUTE AS window_end,
       w.source,
       COUNT(*) AS n_events,
       CAST(SUM(w.cents) AS BIGINT) AS value_cents
FROM wins w CROSS JOIN wm
WHERE w.ws + INTERVAL 10 MINUTE <= wm.watermark
GROUP BY w.ws, w.source
"""


@query(
    "streaming_sliding_rate",
    oracle=_SLIDING_RATE_ORACLE,
    tags=("A8", "T2", "streaming", "sliding-window"),
)
def streaming_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-venue rate/volume over 10-minute windows sliding every 5 —
    overlapping windows, the streaming shape tumbling downsample can't
    express (every event is counted in two windows). The oracle expands
    each event into its two window assignments explicitly and applies the
    same append-mode emission rule (window_end ≤ final watermark), so
    overlap handling, watermark policy, and the integer-exact volume all
    hash-match."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "rates")
        rates = scan.sliding_rate_stream(
            ingest.enrich_snapshots(ingest.replay_stream(spark, replay_dir))
        )
        q = (
            rates.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink_dir).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-static dimension enrichment (broadcast join inside a stream)
# ---------------------------------------------------------------------------
_STATIC_ENRICH_ORACLE = """
SELECT CASE WHEN e.user_id % 2 = 0 THEN 'kalshi' ELSE 'polymarket' END AS source,
       c.c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
"""


@query(
    "streaming_static_enrich",
    oracle=_STATIC_ENRICH_ORACLE,
    tags=("J2", "S4", "streaming", "stream-static"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the micro-batched snapshot stream enriched
    against the static customer dimension (broadcast per micro-batch —
    the streaming form of the S4/J2 token-discovery lookup). The join is
    stateless, so the lane stays append-only with no watermark; the
    landed table is then rolled up per (venue, segment). Equality with
    the batch SQL proves the per-batch broadcast join neither drops nor
    duplicates rows across micro-batch boundaries."""
    from ..sources.tables import load_table

    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "enriched")
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        joined = ingest.enrich_snapshots(
            ingest.replay_stream(spark, replay_dir)
        ).join(F.broadcast(dim), "user_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        landed = spark.read.parquet(sink_dir)
        return (
            landed.groupBy("source", "c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("value_cents"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Dead-letter bifurcation through the stream (T6 as a verified lane split)
# ---------------------------------------------------------------------------
_DLQ_ORACLE = """
SELECT CASE WHEN event_id % 37 = 0 OR event_id % 41 = 0 THEN 'dlq' ELSE 'good' END
         AS lane,
       COUNT(*) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS event_id_sum
FROM events
GROUP BY 1
"""


@query(
    "streaming_dlq_ingest",
    oracle=_DLQ_ORACLE,
    tags=("T6", "T4", "streaming", "dlq"),
)
def streaming_dlq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retry/DLQ contract (T6, `database/influx/writer.py:422-470`)
    as a verified streaming lane split: landed REST payloads replay as a
    JSON-blob stream in which some payloads are corrupt (unparseable
    prefix) and some are NULL (absent book); split_malformed bifurcates
    one from_json pass into a typed good lane and a raw-payload DLQ,
    each appended by its own streaming query (T4). The good-lane
    checksum sums event ids FROM THE PARSED STRUCT — proving typed
    parsing, not just row routing — and totals across lanes must
    reconstruct the input exactly: nothing lost, nothing double-routed,
    across all micro-batch boundaries."""
    from pyspark.sql import types as T

    payload_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("event_type", T.StringType(), True),
        ]
    )
    root = _workdir()
    try:
        from ..sources.tables import load_table

        chunks_dir = os.path.join(root, "chunks")
        clean = F.to_json(F.struct("event_id", "user_id", "value", "event_type"))
        payload = (
            F.when(F.col("event_id") % 41 == 0, F.lit(None).cast("string"))
            .when(F.col("event_id") % 37 == 0, F.concat(F.lit("corrupt:"), clean))
            .otherwise(clean)
        )
        load_table(spark, sf_dir, "events").select(
            "event_id", payload.alias("payload")
        ).repartition(4).write.parquet(chunks_dir)

        stream = (
            spark.readStream.schema("event_id long, payload string")
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks_dir)
        )
        good, bad = ingest.split_malformed(stream, "payload", payload_schema)
        good_dir, bad_dir = os.path.join(root, "good"), os.path.join(root, "dlq")
        queries = []
        for df, path, ck in ((good, good_dir, "ck_good"), (bad, bad_dir, "ck_bad")):
            queries.append(
                df.writeStream.format("parquet")
                .option("path", path)
                .option("checkpointLocation", os.path.join(root, ck))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
        for q in queries:
            q.awaitTermination()

        good_sum = (
            spark.read.parquet(good_dir)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                # from the PARSED struct, not the passthrough column
                F.sum(F.col("payload.event_id")).alias("event_id_sum"),
            )
            .select(F.lit("good").alias("lane"), "n_rows", "event_id_sum")
        )
        bad_sum = (
            spark.read.parquet(bad_dir)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("event_id").alias("event_id_sum"),
            )
            .select(F.lit("dlq").alias("lane"), "n_rows", "event_id_sum")
        )
        return good_sum.unionByName(bad_sum).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Native streaming sessionization: session_window + watermark (T7/A6/T2)
# ---------------------------------------------------------------------------
_SESS_GAP_US = 30 * 60 * 1_000_000
_SESS_DELAY_US = 86_400 * 1_000_000  # 1-day watermark vs the 30-day fixture

_STREAM_SESSIONS_ORACLE = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
wm AS (SELECT MAX(us) - {_SESS_DELAY_US} AS wm_us FROM e),
marks AS (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {_SESS_GAP_US}
              OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
),
agg AS (
  SELECT user_id,
         MIN(us) AS session_start_us,
         MAX(us) AS session_last_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sid
)
SELECT a.user_id, a.session_start_us, a.session_last_us, a.n_events
FROM agg a, wm w
WHERE a.session_last_us + {_SESS_GAP_US} <= w.wm_us
"""


@query(
    "streaming_user_sessions",
    oracle=_STREAM_SESSIONS_ORACLE,
    tags=("sessionization", "T2", "T7", "streaming"),
)
def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` sessionization ON THE STREAM — the
    streaming twin of the batch `user_sessions` gaps-and-islands query.
    Sessions merge across micro-batches in the state store (a session
    open at a batch boundary keeps absorbing events until the 30-min gap
    closes it); append mode emits a session exactly once, when the
    watermark (max event time − 1 day) passes its end (last event +
    gap) — the emission rule the oracle's WHERE clause states. Scale
    notes: state is one open session per active user, hash-partitioned
    on user_id; emitted sessions leave the store, so state size tracks
    ACTIVE users, not history — the property that makes sessionization
    streamable at 100 TB where the batch window-sort is a full-history
    shuffle."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "sessions")
        snap = ingest.enrich_snapshots(ingest.replay_stream(spark, replay_dir))
        sess = (
            snap.withWatermark("ts", "1 day")
            .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
            .agg(
                F.min("ts_us").alias("session_start_us"),
                F.max("ts_us").alias("session_last_us"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select("user_id", "session_start_us", "session_last_us", "n_events")
        )
        q = (
            sess.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink_dir).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Complete-mode continuous ranking: the live leaderboard pattern — the
# one aggregation output mode the rest of the streaming family doesn't
# exercise (append: downsample/sessions; update: scan/pair-performance).
# ---------------------------------------------------------------------------
@query(
    "streaming_volume_leaderboard",
    oracle="""
SELECT user_id AS pair_id,
       CAST(COUNT(*) AS BIGINT) AS n_trades,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS volume_cents
FROM events
GROUP BY user_id
ORDER BY volume_cents DESC, pair_id
LIMIT 10
""",
    tags=("A7", "W2", "streaming", "complete-mode"),
)
def streaming_volume_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 pairs by traded volume maintained CONTINUOUSLY: a
    complete-mode aggregation re-emits the full per-pair totals each
    micro-batch, and foreachBatch overwrites the published leaderboard —
    the standard live-dashboard shape (state is bounded by #pairs, the
    emitted table by K). After the bounded replay drains, the published
    table must equal the one-shot batch ranking — which is exactly what
    the oracle states. Deterministic tie-break on pair_id; integer-cents
    volume so partial-aggregation order cannot flap the hash."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        board_dir = os.path.join(root, "leaderboard")
        cents = F.round(F.col("value") * 100).cast("long")
        totals = (
            ingest.replay_stream(spark, replay_dir)
            .select(F.col("user_id").alias("pair_id"), cents.alias("cents"))
            .groupBy("pair_id")
            .agg(
                F.count(F.lit(1)).alias("n_trades"),
                F.sum("cents").alias("volume_cents"),
            )
        )

        def publish(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.orderBy(F.col("volume_cents").desc(), "pair_id")
                .limit(10)
                .write.mode("overwrite")
                .parquet(board_dir)
            )

        q = (
            totals.writeStream.foreachBatch(publish)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(board_dir).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming embedding ingest → in-flight IVF cluster assignment (the
# similarity family's streaming lane: new vectors are routed to their
# coarse cell as they arrive, the indexing path of a live ANN service)
# ---------------------------------------------------------------------------
@query(
    "streaming_embedding_assign",
    oracle="""
WITH {KMEANS}
SELECT cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(dist) AS BIGINT) AS sum_dist,
       MIN(vec_id) AS min_vec_id,
       MAX(vec_id) AS max_vec_id
FROM a2 GROUP BY cid
""",
    tags=("similarity-ivf-stream", "streaming", "T1"),
)
def streaming_embedding_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF INDEXING: embeddings arrive in micro-batches and
    each is routed to its nearest trained coarse centroid IN-FLIGHT —
    the `_assign` kernel is a pure projection (centroids inlined as
    K x dim literals, argmin via array_min — no join, no shuffle, no
    state), so the exact batch assignment logic runs unchanged on the
    stream. Centroids come from the same two-round Lloyd training as
    every IVF query (`trained_model`); assignments land exactly-once
    through a checkpointed availableNow file sink partitioned by
    cluster — physically materializing the IVF inverted lists, which is
    precisely how a vector index ingests at scale (route at the edge,
    append to the cell's partition). The oracle replays training +
    assignment declaratively (the shared `_kmeans_ctes` chain), so a
    hash match proves no vector was mis-routed, lost, or double-landed
    across micro-batch boundaries."""
    from ..sources.tables import load_table
    from .similarity import quantized, trained_model

    root = _workdir()
    try:
        _, centroids = trained_model(spark, sf_dir)
        cent_rows = [(r.cid, r.c) for r in centroids.collect()]

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        chunk_dir = os.path.join(root, "chunks")
        emb.repartition(4).write.parquet(chunk_dir)
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        from .similarity import _assign

        assigned = _assign(
            stream.select("vec_id", quantized("embedding").alias("q")),
            cent_rows,
        ).select("vec_id", "cid", "dist")
        out_dir = os.path.join(root, "cells")
        q = (
            assigned.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .partitionBy("cid")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        landed = spark.read.parquet(out_dir).withColumn(
            "cid", F.col("cid").cast("long")  # partition-value inference → string
        )
        return (
            landed.groupBy(F.col("cid").alias("cluster_id"))
            .agg(
                F.count(F.lit(1)).alias("n_vectors"),
                F.sum("dist").cast("long").alias("sum_dist"),
                F.min("vec_id").alias("min_vec_id"),
                F.max("vec_id").alias("max_vec_id"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# patch the oracle template with the shared k-means CTE chain at import
# time (the oracle string must be self-contained SQL for the driver)
def _patch_streaming_embedding_assign_oracle() -> None:
    from ..plans.registry import REGISTRY as _REG
    from .similarity import KMEANS_K, _kmeans_ctes

    spec = _REG["streaming_embedding_assign"]
    if spec.oracle and "{KMEANS}" in spec.oracle:
        object.__setattr__(
            spec, "oracle", spec.oracle.replace("{KMEANS}", _kmeans_ctes(KMEANS_K))
        )


_patch_streaming_embedding_assign_oracle()


# ---------------------------------------------------------------------------
# Batch-trained thresholds scored ON the stream: the anomaly twin of
# streaming_embedding_assign's train-batch/score-stream pattern
# ---------------------------------------------------------------------------
@query(
    "streaming_value_anomaly",
    oracle="""
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT r.event_type, r.event_id, ABS(r.value - m.med) AS adev
  FROM ranked r JOIN med m USING (event_type)
),
dranked AS (
  SELECT event_type, event_id, adev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad
  FROM dranked GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE d.adev > 3.0 * m.mad) AS BIGINT)
         AS n_flagged
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
""",
    tags=("data-quality", "anomaly", "streaming", "T1"),
)
def streaming_value_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-train, stream-score ANOMALY DETECTION: the per-type
    median/MAD thresholds are fitted in batch (the exact nearest-rank
    statistics of `value_anomaly_mad`), broadcast onto a live event
    stream, and every micro-batch flags its arrivals in-flight — the
    deployment shape of every monitoring model (fit offline, score
    online, no per-record state). Flagged/total counts land through a
    checkpointed exactly-once sink; the oracle recomputes the entire
    fit+score in SQL over the original table, so equality proves the
    stream scored every event exactly once with the batch-identical
    thresholds. The stream side is a stateless projection + broadcast
    join: nothing accumulates, any throughput scales."""
    from .dataquality import value_anomaly_mad  # noqa: F401 (family link)
    from ..sources.tables import load_table
    from .dataquality import _MAD_K

    root = _workdir()
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_type", "event_id", "value"
        )

        from pyspark.sql import Window

        def lower_median(df, val, out):
            w = Window.partitionBy("event_type").orderBy(val, "event_id")
            wn = Window.partitionBy("event_type")
            ranked = df.select(
                "event_type",
                val,
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wn).alias("n"),
            )
            half = (((F.col("n") + 1) - (F.col("n") + 1) % 2) / 2).cast("long")
            return ranked.groupBy("event_type").agg(
                F.max(F.when(F.col("rn") == half, F.col(val))).alias(out)
            )

        med = lower_median(ev, "value", "med")
        dev = ev.join(F.broadcast(med), "event_type").withColumn(
            "adev", F.abs(F.col("value") - F.col("med"))
        )
        mad = lower_median(
            dev.select("event_type", "event_id", "adev"), "adev", "mad"
        )
        thresholds = (
            med.join(mad, "event_type").localCheckpoint()
        )  # the fitted "model": K rows

        chunk_dir = os.path.join(root, "chunks")
        ev.repartition(4).write.parquet(chunk_dir)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        scored = stream.join(F.broadcast(thresholds), "event_type").select(
            "event_type",
            "event_id",
            (
                F.abs(F.col("value") - F.col("med")) > _MAD_K * F.col("mad")
            ).alias("flagged"),
        )
        out_dir = os.path.join(root, "scored")
        q = (
            scored.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        landed = spark.read.parquet(out_dir)
        return (
            landed.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.count(F.when(F.col("flagged"), 1)).alias("n_flagged"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-stream UNION: two live feeds merged into one exactly-once lane
# ---------------------------------------------------------------------------
@query(
    "streaming_union_ingest",
    oracle="""
SELECT CASE WHEN user_id % 2 = 0 THEN 'venue_a' ELSE 'venue_b' END AS lane,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
FROM events
GROUP BY 1
""",
    tags=("T1", "T4", "streaming", "union"),
)
def streaming_union_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent live feeds (the two venues, modeled as two
    readStream instances over the same replay with disjoint parity
    filters) MERGED into one lane with a streaming unionByName, landed
    through one checkpointed sink — the inverse of the T4 bifurcation:
    N sources → one exactly-once table. Spark plans the union as two
    concurrently-pulled source legs feeding one micro-batch; offsets
    for BOTH legs live in the one checkpoint, so a restart resumes each
    source at its own position with no cross-leg duplication. The
    oracle recomputes per-lane totals from the events table — id
    checksums catch any dropped or doubled row from either leg."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        table_dir = os.path.join(root, "merged")
        a = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("user_id") % 2 == 0)
            .withColumn("lane", F.lit("venue_a"))
        )
        b = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("user_id") % 2 == 1)
            .withColumn("lane", F.lit("venue_b"))
        )
        merged = a.unionByName(b).select("lane", "event_id", "ts_us")
        q = (
            merged.writeStream.format("parquet")
            .option("path", table_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(table_dir)
            .groupBy("lane")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("event_id").cast("long").alias("id_checksum"),
                F.max("ts_us").cast("long").alias("max_ts_us"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-static SCD2 enrichment: point-in-time dimension versions joined
# onto a live stream (equality key + validity-range residual)
# ---------------------------------------------------------------------------
@query(
    "streaming_scd2_enrich",
    oracle="""
WITH dim AS (
  SELECT o_custkey, o_orderstatus,
         o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM orders WHERE o_custkey < 200
),
e AS (
  SELECT event_id, user_id,
         DATE '1995-01-01' + CAST(event_id % 2000 AS INT) AS asof_date
  FROM events
)
SELECT d.o_orderstatus AS status_at_time,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(e.event_id) AS BIGINT) AS id_checksum
FROM e
JOIN dim d
  ON d.o_custkey = e.user_id
 AND e.asof_date >= d.valid_from
 AND (d.valid_to IS NULL OR e.asof_date < d.valid_to)
GROUP BY d.o_orderstatus
""",
    tags=("T2", "scd2", "streaming", "stream-static"),
)
def streaming_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension enrichment ON THE STREAM: each live event
    carries an as-of date and joins the SCD2 customer-status history —
    equality on the business key plus the validity-range residual
    (valid_from <= asof < valid_to) — so every event is stamped with the
    dimension version THAT WAS TRUE at its time, not today's row. This
    is the streaming consumer of the customer_status_scd2 build: Spark
    plans the static side as a broadcast hash join on the key with the
    range predicate as residual filter, re-evaluated per micro-batch.
    Exactly-once landing via the checkpointed file sink; the oracle is
    the equivalent one-shot batch join, so a hash match proves no
    version was mis-assigned across batch boundaries."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        table_dir = os.path.join(root, "enriched")
        from pyspark.sql import Window  # noqa: PLC0415

        from ..sources.tables import load_table  # noqa: PLC0415

        orders = load_table(spark, sf_dir, "orders")
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        dim = (
            orders.filter(F.col("o_custkey") < 200)
            .select(
                "o_custkey",
                "o_orderstatus",
                F.col("o_orderdate").alias("valid_from"),
                F.lead("o_orderdate").over(w).alias("valid_to"),
            )
        )
        stream = (
            ingest.replay_stream(spark, replay_dir)
            .withColumn(
                "asof_date",
                F.date_add(
                    F.lit("1995-01-01").cast("date"),
                    (F.col("event_id") % 2000).cast("int"),
                ),
            )
            .select("event_id", "user_id", "asof_date")
        )
        enriched = stream.join(
            dim,
            (dim.o_custkey == stream.user_id)
            & (stream.asof_date >= dim.valid_from)
            & (dim.valid_to.isNull() | (stream.asof_date < dim.valid_to)),
        ).select("event_id", "user_id", "o_orderstatus")
        q = (
            enriched.writeStream.format("parquet")
            .option("path", table_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(table_dir)
            .groupBy(F.col("o_orderstatus").alias("status_at_time"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
                F.sum("event_id").cast("long").alias("id_checksum"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming OHLC bars (the candlestick build running ON the feed)
# ---------------------------------------------------------------------------
_OHLC_BAR_S = 300  # 5-minute bars, matching batch ohlc_bars_5m

_STREAM_OHLC_ORACLE = f"""
WITH wm AS (
  SELECT MAX(ts) - INTERVAL 10 MINUTE AS watermark
  FROM events WHERE event_type = 'view'
),
c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
b AS (SELECT *, ts_us // {_OHLC_BAR_S * 1_000_000} AS bucket FROM c),
w AS (
  SELECT user_id, bucket, cents,
         FIRST_VALUE(cents) OVER win AS open_c,
         LAST_VALUE(cents)  OVER win AS close_c
  FROM b
  WINDOW win AS (PARTITION BY user_id, bucket ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
agg AS (
  SELECT user_id, bucket,
         MIN(open_c) AS open_cents, MAX(cents) AS high_cents,
         MIN(cents) AS low_cents, MIN(close_c) AS close_cents,
         CAST(COUNT(*) AS BIGINT) AS n_ticks
  FROM w GROUP BY user_id, bucket
)
SELECT a.user_id,
       CAST(a.bucket * {_OHLC_BAR_S * 1_000_000} AS BIGINT) AS bar_start_us,
       a.open_cents, a.high_cents, a.low_cents, a.close_cents, a.n_ticks
FROM agg a CROSS JOIN wm
WHERE (a.bucket + 1) * {_OHLC_BAR_S * 1_000_000} <= epoch_us(wm.watermark)
"""


@query(
    "streaming_ohlc_bars",
    oracle=_STREAM_OHLC_ORACLE,
    tags=("A6", "T2", "W1", "finance", "streaming"),
)
def streaming_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OHLC candlestick build running ON the live feed — batch
    `ohlc_bars_5m`'s streaming twin: 5-minute tumbling event-time
    windows with a 10-minute watermark in append mode, so each bar is
    emitted exactly once when the watermark passes its end (the oracle
    states that rule: bars with window-end ≤ final watermark). Open and
    close are min_by/max_by over the deterministic (ts_us, event_id)
    struct order — the same tie rule as the batch bars, so a bar closed
    by the stream is bit-identical to the bar a backfill would compute.
    Late ticks inside the watermark fold into the still-open bar; the
    result is independent of how the replay is chunked into
    micro-batches. State per key x window is one bar row — bounded by
    (#tickers x watermark/bar) regardless of throughput."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "bars")
        ticks = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("event_type") == "view")
            .select(
                "user_id",
                "ts_us",
                "event_id",
                F.expr("cast(round(value * 100) as bigint)").alias("cents"),
                F.timestamp_micros(F.col("ts_us")).alias("ts"),
            )
            .withWatermark("ts", "10 minutes")
        )
        ordkey = F.struct(F.col("ts_us"), F.col("event_id"))
        bars = (
            ticks.groupBy(
                F.window("ts", f"{_OHLC_BAR_S} seconds").alias("win"),
                "user_id",
            )
            .agg(
                F.expr("min_by(cents, struct(ts_us, event_id))").alias(
                    "open_cents"
                ),
                F.max("cents").alias("high_cents"),
                F.min("cents").alias("low_cents"),
                F.expr("max_by(cents, struct(ts_us, event_id))").alias(
                    "close_cents"
                ),
                F.count(F.lit(1)).cast("long").alias("n_ticks"),
            )
            .select(
                "user_id",
                (F.unix_micros(F.col("win.start"))).alias("bar_start_us"),
                "open_cents",
                "high_cents",
                "low_cents",
                "close_cents",
                "n_ticks",
            )
        )
        q = (
            bars.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink_dir).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming tick-rule flow: the stateful cross-batch LAG (differencing)
# primitive — batch tick_rule_flow's streaming twin
# ---------------------------------------------------------------------------
_SFLOW_BUCKET_US = 3_600_000_000  # hourly, matching batch tick_rule_flow

_STREAM_FLOW_ORACLE = f"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
d AS (
  SELECT user_id, ts_us,
         cents - LAG(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS move
  FROM c
)
SELECT user_id,
       CAST((ts_us // {_SFLOW_BUCKET_US}) * {_SFLOW_BUCKET_US} AS BIGINT)
         AS bucket_start_us,
       CAST(SUM(CASE WHEN move > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(SUM(CASE WHEN move < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       CAST(SUM(CASE WHEN move = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
       CAST(SUM(CASE WHEN move > 0 THEN 1 WHEN move < 0 THEN -1 ELSE 0 END)
            AS BIGINT) AS flow
FROM d WHERE move IS NOT NULL
GROUP BY user_id, ts_us // {_SFLOW_BUCKET_US}
"""


@query(
    "streaming_tick_rule_flow",
    oracle=_STREAM_FLOW_ORACLE,
    tags=("A2", "T3", "finance", "streaming"),
)
def streaming_tick_rule_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-rule order-flow imbalance ON the live feed — and the
    stateful primitive windowed aggregation cannot express: a LAG that
    crosses micro-batch boundaries. Each pair's state carries its last
    tick (ts, event_id, cents); a batch's moves difference against that
    carried tick, so the move at a chunk boundary is computed exactly —
    the final table is BIT-IDENTICAL to batch `tick_rule_flow` (the
    oracle is that batch semantics verbatim), independent of how the
    replay is chunked. Emissions are per-batch PARTIAL hourly counters
    (vectorized pandas groupby, no per-row Python); the landed partials
    sum to the final hourly flow in one alphabet×hours-sized rollup.
    The replay source guarantees time-ordered chunks
    (`ingest.write_replay_chunks`); a newer-keyed state guard makes a
    disordered batch fail safe (skipped, never mis-differenced). State
    per pair is ONE row — bounded by the pair universe, the same 100 TB
    state-size argument as the scan lane."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        sink_dir = os.path.join(root, "flow")
        ticks = (
            ingest.replay_stream(spark, replay_dir)
            .filter(F.col("event_type") == "view")
            .select(
                "user_id",
                "ts_us",
                "event_id",
                F.expr("cast(round(value * 100) as bigint)").alias("cents"),
            )
        )

        def flow_fn(key, pdfs, state: GroupState):
            frames = [p for p in pdfs if len(p)]
            if not frames:
                return
            pdf = pd.concat(frames).sort_values(["ts_us", "event_id"])
            prev = state.get if state.exists else None
            first = pdf.iloc[0]
            if prev is not None and (int(first.ts_us), int(first.event_id)) <= (
                prev[0],
                prev[1],
            ):
                return  # disordered batch: fail safe, never mis-difference
            cents = pdf["cents"].to_numpy()
            ts = pdf["ts_us"].to_numpy()
            if prev is None:
                moves, mts = cents[1:] - cents[:-1], ts[1:]
            else:
                import numpy as np

                moves = cents - np.concatenate(([prev[2]], cents[:-1]))
                mts = ts
            last = pdf.iloc[-1]
            state.update((int(last.ts_us), int(last.event_id), int(last.cents)))
            if len(moves) == 0:
                return
            part = pd.DataFrame(
                {
                    "user_id": key[0],
                    "bucket_start_us": (mts // _SFLOW_BUCKET_US)
                    * _SFLOW_BUCKET_US,
                    "n_up": (moves > 0).astype("int64"),
                    "n_down": (moves < 0).astype("int64"),
                    "n_flat": (moves == 0).astype("int64"),
                }
            )
            agg = part.groupby(["user_id", "bucket_start_us"], as_index=False).sum()
            agg["flow"] = agg["n_up"] - agg["n_down"]
            yield agg

        partials = ticks.groupBy("user_id").applyInPandasWithState(
            flow_fn,
            outputStructType=(
                "user_id long, bucket_start_us long, n_up long, n_down long,"
                " n_flat long, flow long"
            ),
            stateStructType="ts_us long, event_id long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(sink_dir)

        q = (
            partials.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(sink_dir)
            .groupBy("user_id", "bucket_start_us")
            .agg(
                F.sum("n_up").alias("n_up"),
                F.sum("n_down").alias("n_down"),
                F.sum("n_flat").alias("n_flat"),
                F.sum("flow").alias("flow"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming event-sourced book depth (continuous aggregate, merge lane)
# ---------------------------------------------------------------------------
def make_book_depth_upserter(spark: SparkSession, table: str):
    """foreachBatch upserter maintaining per-(market, side, level) net
    resting depth across micro-batches — the streaming form of
    book_depth_rebuild's first aggregation stage, riding the same
    exactly-once merge protocol as make_pair_perf_upserter (applied
    batch id recorded atomically with the bucket swaps; redelivered
    batches skipped)."""
    from .upsert import create_bucketed_table, merge_into_parquet, recover_merge_table

    if not os.path.exists(table):
        create_bucketed_table(
            spark,
            table,
            spark.createDataFrame(
                [],
                "book_key string, market_id long, side string,"
                " level long, net long",
            ),
            key="book_key",
        )

    def upsert_batch(batch_df, batch_id: int) -> None:
        recover_merge_table(table, break_lock=True)
        marker = os.path.join(table, "_last_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # redelivered batch: already merged
        qty = F.col("event_id") % 7 + 1
        b = (
            batch_df.select(
                F.col("user_id").alias("market_id"),
                F.when(F.col("event_id") % 2 == 0, F.lit("bid"))
                .otherwise(F.lit("ask"))
                .alias("side"),
                F.expr("cast(round(value * 100) as bigint) div 1000").alias("level"),
                F.when(
                    F.col("event_type").isin("view", "click", "signup"), qty
                )
                .otherwise(-qty)
                .alias("delta"),
            )
            .groupBy("market_id", "side", "level")
            .agg(F.sum("delta").cast("long").alias("d"))
            .withColumn(
                "book_key",
                F.concat_ws("|", "market_id", "side", F.col("level").cast("string")),
            )
        )
        merge_into_parquet(
            spark,
            table,
            b,
            key="book_key",
            set_exprs={
                "market_id": F.coalesce(F.col("t.market_id"), F.col("u.market_id")),
                "side": F.coalesce(F.col("t.side"), F.col("u.side")),
                "level": F.coalesce(F.col("t.level"), F.col("u.level")),
                "net": F.coalesce(F.col("t.net"), F.lit(0)) + F.col("u.d"),
            },
            insert_missing=True,
            extra_files={"_last_applied_batch": str(batch_id)},
            applied_batch_id=batch_id,
        )

    return upsert_batch


@query(
    "streaming_book_depth",
    oracle="""
WITH d AS (
  SELECT user_id AS market_id,
         CASE WHEN event_id % 2 = 0 THEN 'bid' ELSE 'ask' END AS side,
         CAST(round(value * 100) AS BIGINT) // 1000 AS level,
         CASE WHEN event_type IN ('view', 'click', 'signup')
              THEN event_id % 7 + 1 ELSE -(event_id % 7 + 1) END AS delta
  FROM events
),
lvl AS (
  SELECT market_id, side, level, CAST(SUM(delta) AS BIGINT) AS net
  FROM d GROUP BY 1, 2, 3
)
SELECT market_id,
       MAX(CASE WHEN side = 'bid' AND net > 0 THEN level END) AS best_bid_level,
       MIN(CASE WHEN side = 'ask' AND net > 0 THEN level END) AS best_ask_level,
       MIN(CASE WHEN side = 'ask' AND net > 0 THEN level END)
         - MAX(CASE WHEN side = 'bid' AND net > 0 THEN level END)
         AS spread_levels,
       CAST(SUM(CASE WHEN side = 'bid' AND net > 0 THEN net ELSE 0 END)
            AS BIGINT) AS bid_depth,
       CAST(SUM(CASE WHEN side = 'ask' AND net > 0 THEN net ELSE 0 END)
            AS BIGINT) AS ask_depth,
       CAST(SUM(CASE WHEN net < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overcancelled_levels
FROM lvl GROUP BY market_id
""",
    tags=("P3", "K4", "T4", "streaming", "event-sourcing"),
)
def streaming_book_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIVE order book: book_depth_rebuild's delta aggregation
    maintained INCREMENTALLY across micro-batches — each batch
    pre-aggregates its add/cancel deltas map-side ((market, side,
    level) × batch, tiny) and additively MERGEs them into the running
    book table through the exactly-once merge protocol (applied-batch
    marker atomic with the bucket swaps; at-least-once redelivery never
    double-counts a delta). Because net depth is a SUM, chunk boundaries
    are invisible by algebra — the final book rollup (best bid/ask,
    spread, per-side depth, over-cancelled levels) is computed off the
    merged table and hash-matches the batch recompute from the raw tape:
    the defining continuous-aggregate property, proven on the actual
    book-state operator the reference's websocket consumers run
    imperatively (`virginia/api/data_feed.py:352-398`).

    Scale: state is book-sized (markets × sides × ~50 levels), deltas
    reduce map-side before ever touching the merge, and each merge
    rewrites only the buckets holding levels the batch touched."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        table = os.path.join(root, "book_depth")
        upsert_batch = make_book_depth_upserter(spark, table)
        q = (
            ingest.replay_stream(spark, replay_dir)
            .writeStream.foreachBatch(upsert_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from .upsert import read_merge_table

        lvl = read_merge_table(spark, table)
        bid_live = (F.col("side") == "bid") & (F.col("net") > 0)
        ask_live = (F.col("side") == "ask") & (F.col("net") > 0)
        best_bid = F.max(F.when(bid_live, F.col("level")))
        best_ask = F.min(F.when(ask_live, F.col("level")))
        return (
            lvl.groupBy("market_id")
            .agg(
                best_bid.alias("best_bid_level"),
                best_ask.alias("best_ask_level"),
                (best_ask - best_bid).alias("spread_levels"),
                F.sum(F.when(bid_live, F.col("net")).otherwise(0))
                .cast("long")
                .alias("bid_depth"),
                F.sum(F.when(ask_live, F.col("net")).otherwise(0))
                .cast("long")
                .alias("ask_depth"),
                F.sum(F.when(F.col("net") < 0, 1).otherwise(0))
                .cast("long")
                .alias("n_overcancelled_levels"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming call-auction: the uncross maintained as a continuous aggregate
# ---------------------------------------------------------------------------
def make_auction_upserter(spark: SparkSession, table: str):
    """foreachBatch upserter maintaining per-(market, px) two-sided
    resting volume across micro-batches — auction_clearing_price's
    level aggregation as an additive continuous aggregate on the
    exactly-once merge protocol (redelivered batches skipped via the
    applied-batch marker, atomic with the bucket swaps)."""
    from .upsert import create_bucketed_table, merge_into_parquet, recover_merge_table

    if not os.path.exists(table):
        create_bucketed_table(
            spark,
            table,
            spark.createDataFrame(
                [],
                "lvl_key string, market long, px long,"
                " bid_qty long, ask_qty long",
            ),
            key="lvl_key",
        )

    def upsert_batch(batch_df, batch_id: int) -> None:
        recover_merge_table(table, break_lock=True)
        marker = os.path.join(table, "_last_applied_batch")
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # redelivered batch: already merged
        is_bid = F.col("event_type").isin("click", "view")
        b = (
            batch_df.select(
                F.col("user_id").alias("market"),
                (F.expr("cast(round(value * 100) as bigint)") % 97 + 1)
                .alias("px"),
                F.when(is_bid, F.col("event_id") % 50 + 1)
                .otherwise(0)
                .alias("bq"),
                F.when(~is_bid, F.col("event_id") % 50 + 1)
                .otherwise(0)
                .alias("aq"),
            )
            .groupBy("market", "px")
            .agg(
                F.sum("bq").cast("long").alias("bq"),
                F.sum("aq").cast("long").alias("aq"),
            )
            .withColumn(
                "lvl_key",
                F.concat_ws("|", "market", F.col("px").cast("string")),
            )
        )
        merge_into_parquet(
            spark,
            table,
            b,
            key="lvl_key",
            set_exprs={
                "market": F.coalesce(F.col("t.market"), F.col("u.market")),
                "px": F.coalesce(F.col("t.px"), F.col("u.px")),
                "bid_qty": F.coalesce(F.col("t.bid_qty"), F.lit(0))
                + F.col("u.bq"),
                "ask_qty": F.coalesce(F.col("t.ask_qty"), F.lit(0))
                + F.col("u.aq"),
            },
            insert_missing=True,
            extra_files={"_last_applied_batch": str(batch_id)},
            applied_batch_id=batch_id,
        )

    return upsert_batch


@query(
    "streaming_auction_clearing",
    oracle="""
WITH o AS (
  SELECT user_id AS market,
         CASE WHEN event_type IN ('click', 'view') THEN 'B' ELSE 'S' END
           AS side,
         CAST(round(value * 100) AS BIGINT) % 97 + 1 AS px,
         event_id % 50 + 1 AS qty
  FROM events
),
lvl AS (
  SELECT market, px,
         CAST(SUM(CASE WHEN side = 'B' THEN qty ELSE 0 END) AS BIGINT)
           AS bid_qty,
         CAST(SUM(CASE WHEN side = 'S' THEN qty ELSE 0 END) AS BIGINT)
           AS ask_qty
  FROM o GROUP BY market, px
),
cum AS (
  SELECT market, px, bid_qty, ask_qty,
         CAST(SUM(bid_qty) OVER (PARTITION BY market ORDER BY px DESC)
              AS BIGINT) AS cum_buy,
         CAST(SUM(ask_qty) OVER (PARTITION BY market ORDER BY px ASC)
              AS BIGINT) AS cum_sell
  FROM lvl
),
ex AS (
  SELECT market, px, cum_buy, cum_sell,
         CASE WHEN cum_buy < cum_sell THEN cum_buy ELSE cum_sell END
           AS executable,
         abs(cum_buy - cum_sell) AS abs_imb
  FROM cum
)
SELECT market, px AS clearing_px, executable AS matched_qty,
       cum_buy - cum_sell AS imbalance, executable > 0 AS crossed
FROM ex
QUALIFY ROW_NUMBER() OVER (PARTITION BY market
                           ORDER BY executable DESC, abs_imb ASC, px ASC) = 1
""",
    tags=("A7", "K4", "T4", "streaming", "auction", "finance"),
)
def streaming_auction_clearing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIVE call auction: the two-sided level book accumulates
    ACROSS micro-batches as an additive continuous aggregate (per-batch
    map-side (market, px) pre-aggregation, exactly-once additive merge
    keyed by level — the streaming_book_depth machinery), and the
    UNCROSS runs over the merged level table: clearing price maximizing
    min(cumBuy, cumSell) with the identical tie rules as the batch
    operator. Because both per-level volumes are SUMS, chunk boundaries
    and at-least-once redelivery are invisible by algebra — the landed
    clearing table hash-matches auction_clearing_price's batch
    recompute from the raw tape (the oracle is the batch semantics
    verbatim). This is how an exchange actually runs its open: orders
    stream in, the indicative uncross is recomputed from book STATE,
    not from a replay of every order.

    Scale: merge state is level-book-sized (markets × ≤97 prices);
    each merge rewrites only buckets holding levels the batch touched;
    the uncross is two cumulative windows + an argmax on one
    market-keyed exchange over that small state."""
    root = _workdir()
    try:
        replay_dir = _replay(spark, sf_dir, root)
        table = os.path.join(root, "auction_book")
        upsert_batch = make_auction_upserter(spark, table)
        q = (
            ingest.replay_stream(spark, replay_dir)
            .writeStream.foreachBatch(upsert_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from .upsert import read_merge_table

        lvl = read_merge_table(spark, table)
        w_buy = (
            Window.partitionBy("market")
            .orderBy(F.col("px").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_sell = (
            Window.partitionBy("market")
            .orderBy(F.col("px").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ex = lvl.select(
            "market",
            "px",
            F.sum("bid_qty").over(w_buy).alias("cum_buy"),
            F.sum("ask_qty").over(w_sell).alias("cum_sell"),
        ).select(
            "market",
            "px",
            "cum_buy",
            "cum_sell",
            F.least("cum_buy", "cum_sell").alias("executable"),
            F.abs(F.col("cum_buy") - F.col("cum_sell")).alias("abs_imb"),
        )
        return (
            ex.groupBy("market")
            .agg(
                F.max_by(
                    F.struct("px", "executable", "cum_buy", "cum_sell"),
                    F.struct(
                        F.col("executable"),
                        (-F.col("abs_imb")).alias("neg_imb"),
                        (-F.col("px")).alias("neg_px"),
                    ),
                ).alias("w")
            )
            .select(
                "market",
                F.col("w.px").alias("clearing_px"),
                F.col("w.executable").alias("matched_qty"),
                (F.col("w.cum_buy") - F.col("w.cum_sell")).alias("imbalance"),
                (F.col("w.executable") > 0).alias("crossed"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming schema drift: a feed UPGRADE (new column) continuing into the
# same merge table — the composition of the r9 evolution primitive with
# the foreachBatch upsert lane.
# ---------------------------------------------------------------------------
@query(
    "streaming_schema_drift",
    oracle="""
WITH o AS (
  SELECT user_id AS pair_id,
         event_id % 2 AS phase,
         event_id % 10 + 1 AS qty
  FROM events
),
agg AS (
  SELECT pair_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qty) AS BIGINT) AS v
  FROM o GROUP BY 1
),
v2p AS (SELECT DISTINCT pair_id FROM o WHERE phase = 1)
SELECT CASE WHEN v2p.pair_id IS NULL THEN NULL
            WHEN agg.pair_id % 3 = 0 THEN 'kalshi'
            WHEN agg.pair_id % 3 = 1 THEN 'poly'
            ELSE 'iex' END AS venue,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(agg.n) AS BIGINT) AS total_trades,
       CAST(SUM(agg.v) AS BIGINT) AS total_volume
FROM agg LEFT JOIN v2p ON v2p.pair_id = agg.pair_id
GROUP BY 1
""",
    tags=("K4", "schema-evolution", "streaming", "T4"),
)
def streaming_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A FEED UPGRADE mid-pipeline (VERDICT r9 task 6's streaming
    composition): feed v1 (no venue column) runs to completion as a
    foreachBatch upsert into a bucketed pair-stats table; then feed v2 —
    the upgraded producer, now tagging each event with its venue —
    RESUMES into the SAME table with `evolve_schema=True`. The first v2
    batch widens the table in place (pairs only ever seen by v1 read
    venue as null); totals keep accumulating additively across the
    boundary. The oracle recomputes the end state declaratively from
    the raw events with the same v1/v2 split — equality proves the
    upgrade lost no counts, double-applied nothing, and null-backfilled
    exactly the never-reobserved pairs. This is the schema lifecycle a
    long-lived 100 TB feed actually has: producers upgrade, tables
    evolve in place, history stays readable (reference anchor: the
    ALTER-free fixed DDL at `database/models/postgres.py:377-544`)."""
    import shutil

    from ..sources.tables import load_table
    from .upsert import create_bucketed_table, merge_into_parquet, read_merge_table

    root = _workdir()
    table = os.path.join(root, "pair_stats")
    try:
        events = load_table(spark, sf_dir, "events")
        create_bucketed_table(
            spark,
            table,
            spark.createDataFrame(
                [], "pair_id long, total_trades long, total_volume long"
            ),
            key="pair_id",
        )
        qty = F.col("event_id") % 10 + 1

        def run_feed(phase: int) -> None:
            feed = events.filter(F.col("event_id") % 2 == phase).select(
                F.col("user_id").alias("pair_id"),
                qty.alias("qty"),
            )
            chunk_dir = os.path.join(root, f"chunks_v{phase}")
            feed.repartition(3).write.parquet(chunk_dir)
            stream = (
                spark.readStream.schema(feed.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(chunk_dir)
            )

            def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
                b = batch_df.groupBy("pair_id").agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("qty").cast("long").alias("v"),
                )
                set_exprs = {
                    "total_trades": F.coalesce(
                        F.col("t.total_trades"), F.lit(0)
                    )
                    + F.col("u.n"),
                    "total_volume": F.coalesce(
                        F.col("t.total_volume"), F.lit(0)
                    )
                    + F.col("u.v"),
                }
                if phase == 1:  # the upgraded producer tags the venue
                    b = b.withColumn(
                        "venue",
                        F.element_at(
                            F.array(
                                F.lit("kalshi"), F.lit("poly"), F.lit("iex")
                            ),
                            (F.col("pair_id") % 3 + 1).cast("int"),
                        ),
                    )
                    # ADVICE r9: EVERY v2 batch must apply the venue, not
                    # just the widening one — a pair whose v2 rows all
                    # arrive after batch 0 would otherwise keep NULL
                    # (the target pads t.venue with a typed null while
                    # the column is new, so this resolves in batch 0 too)
                    set_exprs["venue"] = F.coalesce(
                        F.col("u.venue"), F.col("t.venue")
                    )
                merge_into_parquet(
                    spark,
                    table,
                    b,
                    key="pair_id",
                    set_exprs=set_exprs,
                    insert_missing=True,
                    evolve_schema=(phase == 1),
                    evolve_cols=["venue"] if phase == 1 else None,
                )

            q = (
                stream.writeStream.foreachBatch(upsert_batch)
                .option(
                    "checkpointLocation", os.path.join(root, f"ckpt_v{phase}")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_feed(0)  # the original producer, no venue column
        run_feed(1)  # the upgraded producer evolves the table in place

        final = read_merge_table(spark, table)
        return (
            final.groupBy("venue")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum("total_trades").cast("long").alias("total_trades"),
                F.sum("total_volume").cast("long").alias("total_volume"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
