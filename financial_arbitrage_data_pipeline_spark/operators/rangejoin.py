"""Binned interval (range) join — the operator class behind "what was
happening DURING this window" questions: enrich every point event with
the variable-length intervals that contain it, without a single
non-equi-join node in the plan.

The reference's scanner asks exactly this shape when it correlates a
fill against the book snapshots alive around it (SURVEY §2.5 J3/J4;
`virginia/scanner/market_scanner.py` correlates ticks against open
windows by wall-clock containment). SQL states it as
`p.ts BETWEEN s.lo AND s.hi` — which Spark plans as a
BroadcastNestedLoopJoin (every point against every interval): the
classic 100 TB scale-killer, banned outright by this repo's plan guard
(tests/test_plans.py). The distributed formulation is the BINNED range
join (the same strategy Databricks ships as a range-join hint and
DuckDB as IEJoin's bucketed cousin):

1. pick a bin width W (here 1 h);
2. explode each interval to the bins it overlaps —
   `sequence(lo div W, hi div W)` — so an interval occupies
   ceil(len/W)+1 rows (measured 1.02 bins/interval on this data);
3. map each point to its single bin `ts div W`;
4. EQUI-join on the bin and refine with the exact containment
   predicate.

Every (interval, point) pair sharing a bin meets exactly once (a point
has one bin), so no post-dedup is needed. The plan is one
BroadcastHashJoin on `bin` here (the interval side is the ~1.2 k
sessions of a 20-user watch set); at a 100 TB interval side the same
query becomes a shuffle hash join on `bin` — the explode factor, not
the data volume, is the only cost knob, and W tunes it.

Intervals are the engine's own gap-sessions (sessions.user_sessions
semantics, 30-min gap) for a small monitored-user set; points are the
full event stream. Exactness: all outputs are integer counts/ids and
µs timestamps — no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .sessions import SESSION_GAP, _GAP_US

WATCH_USERS = 20
BIN_US = 3_600_000_000  # 1 hour


_SESS_SQL = f"""
e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > {_GAP_US}
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE user_id < {WATCH_USERS}
),
s AS (
  SELECT user_id, ts_us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
),
sess AS (
  SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_last_us
  FROM s GROUP BY user_id, sid
)
"""


@query(
    "session_window_range_join",
    oracle=f"""
WITH {_SESS_SQL},
p AS (SELECT event_id, user_id AS ev_user, epoch_us(ts) AS ts_us FROM events)
SELECT sess.user_id, sess.session_start_us, sess.session_last_us,
       CAST(COUNT(*) AS BIGINT) AS n_events_in_win,
       CAST(COUNT(DISTINCT p.ev_user) AS BIGINT) AS n_users_in_win,
       MIN(p.event_id) AS min_event_id,
       MAX(p.event_id) AS max_event_id
FROM sess JOIN p
  ON p.ts_us BETWEEN sess.session_start_us AND sess.session_last_us
GROUP BY 1, 2, 3
""",
    tags=("range-join", "J3", "sessionization"),
)
def session_window_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every gap-session of a 20-user watch set, the global activity
    inside that session's time window: how many events fired platform-wide,
    from how many distinct users, and the id span — each point event
    matched to every containing interval via the binned range join
    described in the module docstring. The oracle states the identical
    semantics as a plain inequality join (DuckDB plans it as IEJoin)."""
    ev = load_table(spark, sf_dir, "events")
    watched = ev.filter(F.col("user_id") < WATCH_USERS).select(
        "user_id", F.expr("ts div 1000").alias("ts_us")
    )
    sess = (
        watched.groupBy(
            "user_id",
            F.session_window(F.timestamp_micros(F.col("ts_us")), SESSION_GAP).alias("w"),
        )
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_last_us"),
        )
        .select("user_id", "session_start_us", "session_last_us")
    )
    # (2) interval → bins it overlaps; intervals here are < 1 h long so
    # this is ~1.02 rows per session, and the exploded watch-set side
    # stays broadcastable by construction.
    bins = sess.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"session_start_us div {BIN_US}"),
                F.expr(f"session_last_us div {BIN_US}"),
            )
        ),
    )
    # (3) point → its single bin; (4) equi-join on bin + exact refine.
    pts = ev.select(
        "event_id",
        F.col("user_id").alias("ev_user"),
        F.expr("ts div 1000").alias("ts_us"),
    ).withColumn("bin", F.expr(f"ts_us div {BIN_US}"))
    joined = pts.join(
        F.broadcast(bins),
        (pts["bin"] == bins["bin"])
        & (F.col("ts_us") >= F.col("session_start_us"))
        & (F.col("ts_us") <= F.col("session_last_us")),
    )
    return joined.groupBy("user_id", "session_start_us", "session_last_us").agg(
        F.count(F.lit(1)).alias("n_events_in_win"),
        F.countDistinct("ev_user").alias("n_users_in_win"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )
