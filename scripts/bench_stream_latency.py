#!/usr/bin/env python
"""Streaming end-to-end latency evidence (VERDICT r6 task 5): the
reference claims sub-100 ms publish→store latency for its asyncio
pipeline (`/root/reference/README.md:14`). This engine is micro-batch
Structured Streaming — per-RECORD latency is bounded below by the
trigger interval — so the honest comparison is:

  - end-to-end publish→sink-commit latency per record (p50/p95/p99) at
    trigger = 1 s, measured against the broker's stored LogAppendTime
    (`kafka_standin` stamps it immutably at publish, ADVICE r6), and
  - the PROCESSING component alone (batch read→commit wall time), which
    is what a lower trigger (or continuous mode on a real cluster) would
    leave.

A publisher thread appends keyed records to the stand-in topic every
`PUB_INTERVAL_MS`; the consumer is the REAL Kafka-shaped lane
(kafka_standin source → decode_feed_lines → enrich_snapshots) landed by
a foreachBatch parquet sink that records the batch's commit wall-clock.
Latency per record = batch commit wall time − record LogAppendTime.

Output: one JSON line + BENCH_stream_latency.json with
{p50_ms, p95_ms, p99_ms, proc_p50_ms, proc_p95_ms, n_records,
 trigger_sec, batches}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_arbitrage_data_pipeline_spark.session import get_spark
from financial_arbitrage_data_pipeline_spark.sources import kafka_standin
from financial_arbitrage_data_pipeline_spark.streaming import ingest

US = 1_000_000
PUB_INTERVAL_MS = 100
RECORDS_PER_PUB = 20
RUN_SECONDS = 25
TRIGGER_SEC = 1
# the trigger SWEEP: end-to-end latency ≈ trigger/2 + processing, so
# shrinking the trigger converges on the processing floor — the
# micro-batch answer to the reference's per-message latency claim
SWEEP_TRIGGERS = (1.0, 0.5, 0.2)


def _records(start: int, n: int) -> list[tuple[str, str]]:
    out = []
    for i in range(start, start + n):
        rec = {
            "event_id": i,
            "ts_us": 1_700_000_000 * US + i * US,
            "user_id": i % 7,
            "event_type": ["click", "view", "purchase"][i % 3],
            "value": (i % 97 + 1) / 100.0,
        }
        out.append((str(rec["user_id"]), json.dumps(rec)))
    return out


def percentile(sorted_vals: list[float], q: float) -> float:
    """Exact nearest-rank percentile (the engine's own discipline)."""
    if not sorted_vals:
        return float("nan")
    k = max(1, int(round(q * len(sorted_vals) + 0.5)))
    return sorted_vals[min(k, len(sorted_vals)) - 1]


def run_one(spark, trigger_sec: float) -> dict:
    workdir = tempfile.mkdtemp(prefix="latbench_")
    log_dir = os.path.join(workdir, "topic")
    out_dir = os.path.join(workdir, "out")
    ck_dir = os.path.join(workdir, "ckpt")
    os.makedirs(out_dir)

    stop_flag = threading.Event()
    published = {"n": 0}
    # event_id -> publish wall-clock ms; foreachBatch runs driver-side so
    # the sink reads this directly (no data-plane plumbing needed — the
    # lane under test stays byte-identical to the production one)
    pub_ms: dict[int, float] = {}

    def publisher() -> None:
        while not stop_flag.is_set():
            now_ms = time.time() * 1000
            recs = _records(published["n"], RECORDS_PER_PUB)
            for i in range(published["n"], published["n"] + RECORDS_PER_PUB):
                pub_ms[i] = now_ms
            kafka_standin.publish(
                log_dir, recs, n_partitions=3, ts_ms=int(now_ms)
            )
            published["n"] += RECORDS_PER_PUB
            time.sleep(PUB_INTERVAL_MS / 1000.0)

    # per-record end-to-end latencies and per-batch processing walls,
    # recorded at the sink's commit point; batch-tagged so the stream
    # STARTUP transient (the first triggers fire seconds after .start()
    # while the publisher is already appending) can be separated from
    # steady state
    batch_lat: list[list[float]] = []
    proc_ms: list[float] = []
    batches = {"n": 0}

    collect_ms: list[float] = []
    write_ms: list[float] = []

    def sink(df, batch_id: int) -> None:
        t0 = time.time()
        pdf = df.toPandas()
        t1 = time.time()
        if len(pdf) == 0:
            return
        pdf.to_parquet(os.path.join(out_dir, f"b{batch_id}.parquet"))
        commit_ms = time.time() * 1000
        batch_lat.append(
            [commit_ms - pub_ms[e] for e in pdf["event_id"] if e in pub_ms]
        )
        collect_ms.append((t1 - t0) * 1000)
        write_ms.append((time.time() - t1) * 1000)
        proc_ms.append((time.time() - t0) * 1000)
        batches["n"] += 1

    # the REAL Kafka-shaped lane, byte-identical to production:
    # stand-in source -> decode_feed_lines -> enrich_snapshots
    lane = ingest.enrich_snapshots(
        ingest.kafka_standin_feed_stream(spark, log_dir)
    )

    q = (
        lane.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck_dir)
        .trigger(processingTime=f"{int(trigger_sec * 1000)} milliseconds")
        .start()
    )

    pub = threading.Thread(target=publisher, daemon=True)
    t_start = time.time()
    pub.start()
    time.sleep(RUN_SECONDS)
    stop_flag.set()
    pub.join()
    time.sleep(2 * trigger_sec + 1)  # drain the tail
    # Spark's own per-stage accounting for each micro-batch (r7 task 6:
    # "where does the 200 ms go") — captured BEFORE stop() drops the
    # progress buffer. durationMs stages: latestOffset (source offset
    # discovery), queryPlanning (incremental plan), addBatch (execute +
    # sink, the foreachBatch body included), walCommit/commitOffsets
    # (checkpoint bookkeeping), triggerExecution (whole trigger).
    stage_ms: dict[str, list[float]] = {}
    for p in q.recentProgress:
        if p.get("numInputRows", 0) == 0:
            continue
        for stage, ms in (p.get("durationMs") or {}).items():
            stage_ms.setdefault(stage, []).append(float(ms))
    q.stop()
    q.awaitTermination()

    lat = sorted(x for b in batch_lat for x in b)
    # steady state: drop the first 3 committed batches — they drain the
    # backlog that accumulated while the query was still starting up
    steady = sorted(x for b in batch_lat[3:] for x in b)
    pm = sorted(proc_ms)
    pm_steady = sorted(proc_ms[3:])
    result = {
        "trigger_sec": trigger_sec,
        "run_sec": round(time.time() - t_start, 1),
        "n_published": published["n"],
        "n_measured": len(lat),
        "batches": batches["n"],
        "p50_ms": round(percentile(lat, 0.50), 1),
        "p95_ms": round(percentile(lat, 0.95), 1),
        "p99_ms": round(percentile(lat, 0.99), 1),
        "max_ms": round(lat[-1], 1) if lat else None,
        "steady_n": len(steady),
        "steady_p50_ms": round(percentile(steady, 0.50), 1),
        "steady_p95_ms": round(percentile(steady, 0.95), 1),
        "steady_p99_ms": round(percentile(steady, 0.99), 1),
        "proc_p50_ms": round(percentile(pm, 0.50), 1),
        "proc_p95_ms": round(percentile(pm, 0.95), 1),
        "steady_proc_p50_ms": round(percentile(pm_steady, 0.50), 1),
        "stage_p50_ms": {
            stage: round(percentile(sorted(v), 0.50), 1)
            for stage, v in sorted(stage_ms.items())
        },
        "sink_collect_p50_ms": round(percentile(sorted(collect_ms), 0.50), 1),
        "sink_write_p50_ms": round(percentile(sorted(write_ms), 0.50), 1),
    }
    print(json.dumps(result))
    return result


def main() -> int:
    spark = get_spark(app_name="stream-latency-bench")
    spark.sparkContext.setLogLevel("ERROR")
    kafka_standin.register(spark)

    rows = [run_one(spark, t) for t in SWEEP_TRIGGERS]
    out = {
        "metric": "stream_latency",
        "unit": "ms",
        "pub_interval_ms": PUB_INTERVAL_MS,
        "records_per_pub": RECORDS_PER_PUB,
        "reference_claim_ms": 100,
        "rows": rows,
        "note": (
            "end-to-end = queueing (≤ trigger) + processing; steady_* "
            "drops the 3 startup-backlog batches; the trigger sweep "
            "shows end-to-end converging on the processing floor as "
            "the trigger shrinks"
        ),
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH_stream_latency.json"),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": "BENCH_stream_latency.json", "rows": len(rows)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
