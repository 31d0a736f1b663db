"""Position exposure timeline — the risk-limit view of the fills ledger.

fifo_realized_pnl answers "what did round trips earn"; this answers the
risk desk's questions about the PATH: how long was the book, how short,
how often did it flip, and where is it now — the numbers position-limit
monitoring alerts on. Same tape reinterpretation as the portfolio
module (purchases buy, clicks sell, qty = event_id%5+1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

_POS_ORACLE = """
WITH f AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN event_type = 'purchase' THEN event_id % 5 + 1
              ELSE -(event_id % 5 + 1) END AS dq
  FROM events WHERE event_type IN ('purchase', 'click')
),
p AS (
  SELECT user_id, ts_us, event_id, dq,
         SUM(dq) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS pos
  FROM f
),
x AS (
  SELECT user_id, pos, dq,
         LAG(pos, 1, 0) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev_pos,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC, event_id DESC) AS rn_desc
  FROM p
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_fills,
       CAST(SUM(CASE WHEN dq > 0 THEN dq ELSE 0 END) AS BIGINT) AS bought_qty,
       CAST(SUM(CASE WHEN dq < 0 THEN -dq ELSE 0 END) AS BIGINT) AS sold_qty,
       CAST(MAX(pos) AS BIGINT) AS max_long,
       CAST(MIN(pos) AS BIGINT) AS max_short,
       CAST(SUM(CASE WHEN (prev_pos > 0 AND pos < 0)
                       OR (prev_pos < 0 AND pos > 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flips,
       CAST(SUM(CASE WHEN pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat_touches,
       CAST(MAX(CASE WHEN rn_desc = 1 THEN pos END) AS BIGINT) AS ending_position
FROM x GROUP BY user_id
"""


@query("position_exposure_timeline", oracle=_POS_ORACLE, tags=("A2", "risk", "pnl"))
def position_exposure_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-position EXPOSURE profile per account: peak long, peak
    short, direction flips (long↔short sign crossings), flat touches,
    and the ending position — the path statistics a position-limit
    monitor alerts on, where fifo_realized_pnl only scores completed
    round trips. All integers; flips counted strictly (a flip must
    cross through, not onto, zero — prev·pos < 0), so a close-to-flat
    then re-open the same way is NOT a flip.

    Plan: ONE sort-shuffle on the account key serves the running-sum
    window, the LAG window (same key, same order), and the rollup —
    including the MAX_BY ending position (the aggregation's argmax
    needs no second sort). The canonical one-exchange tape shape."""
    ev = load_table(spark, sf_dir, "events")
    qty = F.col("event_id") % 5 + 1
    f = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "purchase", qty).otherwise(-qty).alias("dq"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    p = f.select(
        "user_id",
        "ts_us",
        "event_id",
        "dq",
        F.sum("dq").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("pos"),
    ).select(
        "*",
        F.lag("pos", 1, 0).over(w).alias("prev_pos"),
    )
    flip = (
        ((F.col("prev_pos") > 0) & (F.col("pos") < 0))
        | ((F.col("prev_pos") < 0) & (F.col("pos") > 0))
    )
    return p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fills"),
        F.sum(F.when(F.col("dq") > 0, F.col("dq")).otherwise(0))
        .cast("long")
        .alias("bought_qty"),
        F.sum(F.when(F.col("dq") < 0, -F.col("dq")).otherwise(0))
        .cast("long")
        .alias("sold_qty"),
        F.max("pos").cast("long").alias("max_long"),
        F.min("pos").cast("long").alias("max_short"),
        F.sum(F.when(flip, 1).otherwise(0)).cast("long").alias("n_flips"),
        F.sum(F.when(F.col("pos") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flat_touches"),
        F.max_by("pos", F.struct("ts_us", "event_id"))
        .cast("long")
        .alias("ending_position"),
    )
