"""T7 — session-like liveness state with timeout eviction.

Reference: the Virginia publisher tracks subscriber heartbeats and evicts
subscribers silent for >120 s (`virginia/broker/publisher.py:224-320`);
the database coordinator raises staleness alarms at 300 s
(`database/coordinator.py:563-569`).

Spark realization: `applyInPandasWithState` with an EVENT-TIME timeout —
the deadline is `last_seen + ttl`, and eviction fires when the watermark
passes it. Event time (not the reference's wall clock) makes liveness a
deterministic function of the input stream, so replays reproduce exactly
and the final state is even SQL-expressible (a subscriber ends evicted
iff its last heartbeat is more than ttl behind the final watermark).

Scale: state is O(#subscribers); timeouts are managed by the state store
per partition — no scan of live state per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HEARTBEAT_SCHEMA = T.StructType(
    [
        T.StructField("subscriber_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

LIVENESS_STATE = T.StructType(
    [
        T.StructField("last_seen_us", T.LongType(), True),
        T.StructField("n_heartbeats", T.LongType(), True),
    ]
)

LIVENESS_SCHEMA = T.StructType(
    [
        T.StructField("subscriber_id", T.LongType(), False),
        T.StructField("status", T.StringType(), False),  # active | evicted
        T.StructField("last_seen_us", T.LongType(), True),
        T.StructField("n_heartbeats", T.LongType(), True),
    ]
)


def make_liveness_fn(ttl_seconds: int) -> Callable[..., Iterator[pd.DataFrame]]:
    def fn(
        key: tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            last_seen, n = state.get if state.exists else (None, None)
            state.remove()
            yield pd.DataFrame(
                {
                    "subscriber_id": [key[0]],
                    "status": ["evicted"],
                    "last_seen_us": [last_seen],
                    "n_heartbeats": [n],
                }
            )
            return
        last_seen, n = state.get if state.exists else (-1, 0)
        for pdf in pdfs:
            if len(pdf):
                batch_max = int(pdf["ts"].astype("int64").max()) // 1000
                last_seen = max(last_seen, batch_max)
                n += len(pdf)
        state.update((last_seen, n))
        # deadline in event time: watermark passing it triggers eviction.
        # If the heartbeat was already older than (watermark - ttl) — e.g.
        # a disordered replay — the deadline is in the past; Spark rejects
        # timeouts <= watermark, so clamp to watermark+1ms, which evicts
        # at the next batch (the semantics the deadline implies anyway).
        deadline_ms = last_seen // 1000 + ttl_seconds * 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
        yield pd.DataFrame(
            {
                "subscriber_id": [key[0]],
                "status": ["active"],
                "last_seen_us": [last_seen],
                "n_heartbeats": [n],
            }
        )

    return fn


def liveness_stream(
    heartbeats: DataFrame, ttl_seconds: int, watermark: str = "0 seconds"
) -> DataFrame:
    """heartbeats(subscriber_id, ts) → per-batch liveness emissions.
    The last emission per subscriber is its final status."""
    return (
        heartbeats.withWatermark("ts", watermark)
        .groupBy("subscriber_id")
        .applyInPandasWithState(
            make_liveness_fn(ttl_seconds),
            outputStructType=LIVENESS_SCHEMA,
            stateStructType=LIVENESS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def final_liveness(spark, sink_dir: str) -> DataFrame:
    """Last emission per subscriber (same reconstruction as the scan's
    final_opportunities)."""
    from pyspark.sql import Window

    emissions = spark.read.parquet(sink_dir)
    # A key emits at most once per batch (a timeout only fires in a batch
    # where the key received no data), so batch_id alone orders emissions.
    w = Window.partitionBy("subscriber_id").orderBy(F.col("batch_id").desc())
    return (
        emissions.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("subscriber_id", "status", "last_seen_us", "n_heartbeats")
    )
