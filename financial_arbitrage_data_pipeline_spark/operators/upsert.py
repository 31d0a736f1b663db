"""Upsert / MERGE primitives (K4, J4, A2/A3 — SURVEY §2.1, §2.4).

The reference's relational writer does dynamic `UPDATE ... SET` point
writes (`database/postgres/client.py:409-458`), select-then-insert-or-
update pair writes (`database/postgres/writer.py:351-407`), and the fill
update that recomputes executed quantity / weighted-average fill price /
status per trade (`database/postgres/writer.py:215-294`,
`database/models/postgres.py:184-211`).

Spark-first realization: the one sink primitive plain parquet lacks is
`MERGE INTO`; with Delta/Iceberg present, `merge_into_parquet` is spelled
`target.merge(updates, ...)` and everything else here is unchanged. On
plain parquet the equivalent is a read → full-outer-join → rewrite cycle
— acceptable because the reference's upsert targets are the *small*
relational tables (tickets/pairs), not the 100 TB snapshot stream. At
scale, partition the target by a key prefix and rewrite only partitions
containing updated keys (dynamic partition overwrite), keeping the
rewrite proportional to touched data.

Exactness divergence (deliberate, SURVEY risk-note style): the reference
stores the running `average_fill_price` and updates it incrementally with
float math (`postgres.py:193-197`); we store the running integer sums
(`executed_quantity`, `executed_cost_cents`) and derive the average at
read time — the same information, but associative and therefore exact
under any batch split or partial-aggregation order.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


def merge_into_parquet(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key: str,
    set_exprs: dict[str, Column],
    insert_missing: bool = False,
    extra_files: dict[str, str] | None = None,
) -> None:
    """K4: MERGE INTO target USING updates ON target.key = updates.key
    WHEN MATCHED THEN UPDATE SET <set_exprs> [WHEN NOT MATCHED INSERT].

    `set_exprs` sees the joined row with target columns as `t.<c>` and
    update columns as `u.<c>`. Unmatched target rows pass through; with
    `insert_missing`, unmatched update rows are inserted (columns not
    covered by set_exprs default to null). The rewrite goes through a tmp
    dir then swaps via two renames, so a failed *job* (the expensive part)
    never corrupts the target. The swap itself is not atomic: a crash
    between the renames leaves the data in `<target>.__merge_old__` with
    no `<target>` dir — recovery is `mv <target>.__merge_old__ <target>`
    and re-run. Stale tmp/old dirs from a previous crashed run are cleared
    at entry so the next merge cannot trip over them. (Delta/Iceberg
    `MERGE` gives true atomicity; this is the plain-parquet fallback.)
    """
    # clear leftovers from a crashed prior run: a stale __merge_old__
    # would make our os.rename(target, old) raise; a stale tmp is dead
    # weight. If only __merge_old__ survives (crash between renames),
    # restore it as the target before proceeding.
    tmp_path = target_dir.rstrip("/") + ".__merge_tmp__"
    old_path = target_dir.rstrip("/") + ".__merge_old__"
    shutil.rmtree(tmp_path, ignore_errors=True)
    if os.path.exists(old_path):
        if os.path.exists(target_dir):
            shutil.rmtree(old_path, ignore_errors=True)
        else:
            os.rename(old_path, target_dir)

    target = spark.read.parquet(target_dir).alias("t")
    u = updates.alias("u")
    join_type = "full_outer" if insert_missing else "left_outer"
    joined = target.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), join_type)

    matched = F.col(f"u.{key}").isNotNull()
    out_cols = []
    for c in spark.read.parquet(target_dir).columns:
        base = F.coalesce(F.col(f"t.{c}"), F.lit(None)) if c != key else F.coalesce(
            F.col(f"t.{key}"), F.col(f"u.{key}")
        )
        if c in set_exprs:
            out_cols.append(F.when(matched, set_exprs[c]).otherwise(F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(base.alias(c))
    merged = joined.select(*out_cols)

    tmp = tmp_path
    merged.write.mode("overwrite").parquet(tmp)
    # extra_files install atomically WITH the data swap (written into tmp
    # before the rename), so e.g. an applied-batch marker can never be
    # observed without the data it describes — the idempotence anchor for
    # at-least-once callers (streaming foreachBatch)
    for name, content in (extra_files or {}).items():
        with open(os.path.join(tmp, name), "w") as f:
            f.write(content)
    old = old_path
    os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)


def apply_fills(
    spark: SparkSession, tickets_dir: str, fills: DataFrame
) -> None:
    """J4: the fill update — aggregate the batch's fills per ticket
    (map-side partial sums), then merge: executed_quantity and
    executed_cost_cents accumulate; status derives from quantity ordered
    (`database/postgres/writer.py:260-266`)."""
    batch = fills.groupBy("ticket_id").agg(
        F.sum("fill_qty").alias("batch_qty"),
        F.sum(F.col("fill_qty") * F.col("fill_price_cents")).alias("batch_cost"),
    )
    new_exec = F.col("t.executed_quantity") + F.col("u.batch_qty")
    new_cost = F.col("t.executed_cost_cents") + F.col("u.batch_cost")
    merge_into_parquet(
        spark,
        tickets_dir,
        batch,
        key="ticket_id",
        set_exprs={
            "executed_quantity": new_exec,
            "executed_cost_cents": new_cost,
            "status": F.when(new_exec >= F.col("t.quantity"), F.lit("filled"))
            .when(new_exec > 0, F.lit("partially_filled"))
            .otherwise(F.lit("pending")),
        },
    )


@query(
    "ticket_fill_merge",
    oracle="""
WITH tickets AS (
  SELECT o_orderkey AS ticket_id, o_orderkey % 50 + 1 AS quantity FROM orders
),
fills AS (
  SELECT l_orderkey AS ticket_id,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(l_partkey % 97 + 1 AS BIGINT) AS p
  FROM lineitem
),
agg AS (
  SELECT ticket_id,
         CAST(SUM(q) AS BIGINT) AS fq,
         CAST(SUM(q * p) AS BIGINT) AS cost
  FROM fills GROUP BY ticket_id
)
SELECT t.ticket_id,
       t.quantity,
       COALESCE(a.fq, 0) AS executed_quantity,
       COALESCE(a.cost, 0) AS executed_cost_cents,
       CASE WHEN COALESCE(a.fq, 0) >= t.quantity THEN 'filled'
            WHEN COALESCE(a.fq, 0) > 0 THEN 'partially_filled'
            ELSE 'pending' END AS status,
       CASE WHEN COALESCE(a.fq, 0) > 0
            THEN CAST(a.cost AS DOUBLE) / CAST(a.fq AS DOUBLE) / 100.0
            ELSE 0.0 END AS avg_fill_price
FROM tickets t LEFT JOIN agg a ON a.ticket_id = t.ticket_id
""",
    tags=("K4", "J4", "A3", "K2", "K3"),
)
def ticket_fill_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full trade-ticket lifecycle through the merge primitive: seed
    pending tickets from orders (K2/K3 insert), apply fills derived from
    lineitem in TWO sequential merge batches (J4 point updates — the
    split proves the running-sum update is batch-invariant), read back
    final state with the derived weighted-average fill price (A3). The
    oracle computes the same end state in one shot — equality shows the
    incremental path converges to the set-based truth."""
    import tempfile

    root = tempfile.mkdtemp(prefix="sgmerge_")
    tickets_dir = os.path.join(root, "trade_tickets")
    try:
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("ticket_id"),
            (F.col("o_orderkey") % 50 + 1).alias("quantity"),
            F.lit(0).cast("long").alias("executed_quantity"),
            F.lit(0).cast("long").alias("executed_cost_cents"),
            F.lit("pending").alias("status"),
        ).write.mode("overwrite").parquet(tickets_dir)

        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("ticket_id"),
            F.col("l_quantity").cast("long").alias("fill_qty"),
            (F.col("l_partkey") % 97 + 1).cast("long").alias("fill_price_cents"),
            "l_linenumber",
        )
        apply_fills(spark, tickets_dir, li.filter(F.col("l_linenumber") <= 3))
        apply_fills(spark, tickets_dir, li.filter(F.col("l_linenumber") > 3))

        final = spark.read.parquet(tickets_dir).select(
            "ticket_id",
            "quantity",
            "executed_quantity",
            "executed_cost_cents",
            "status",
            F.when(
                F.col("executed_quantity") > 0,
                F.col("executed_cost_cents").cast("double")
                / F.col("executed_quantity").cast("double")
                / F.lit(100.0),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_fill_price"),
        )
        return final.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
