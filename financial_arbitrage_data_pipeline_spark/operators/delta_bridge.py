"""Delta-protocol bridge queries (K4 — lakehouse interop surface).

The reference's durable state lives behind a private Postgres schema
(`/root/reference/database/postgres/writer.py:351-407`); nothing else
can read it without the reference's own code. These queries prove the
Spark engine's durable MERGE state round-trips through the OPEN Delta
Lake transaction-log format (`sources/delta_log.py`, built from the
public PROTOCOL.md): any Delta client — delta-spark, delta-rs, Trino,
DuckDB delta — can consume the exported table, and our own log-replay
reader consumes it with no directory listing at all.

Both queries are full-cycle: build state -> commit log -> REPLAY the
log -> aggregate; the oracle recomputes the expected end state
declaratively from the raw tables, so a hash match proves the entire
write-log-replay path preserves the data exactly.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators.upsert import (
    apply_fills,
    create_bucketed_table,
)
from financial_arbitrage_data_pipeline_spark.plans.registry import query
from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
    _latest_checkpoint_at_or_below,
    commit_append,
    create_delta_table,
    delta_versions,
    export_delta_log,
    last_txn_version,
    read_delta_table,
)
from financial_arbitrage_data_pipeline_spark.sources.tables import load_table


@query(
    "delta_log_time_travel",
    oracle="""
WITH tickets AS (
  SELECT o_orderkey AS ticket_id, o_orderkey % 50 + 1 AS quantity FROM orders
),
fills AS (
  SELECT l_orderkey AS ticket_id, l_linenumber,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(l_partkey % 97 + 1 AS BIGINT) AS p
  FROM lineitem
),
state AS (
  SELECT v.version, t.ticket_id, t.quantity,
         COALESCE(a.fq, 0) AS eq, COALESCE(a.cost, 0) AS cost
  FROM (VALUES (0), (1), (2)) v(version)
  CROSS JOIN tickets t
  LEFT JOIN (
    SELECT 1 AS version, ticket_id,
           CAST(SUM(q) AS BIGINT) AS fq, CAST(SUM(q * p) AS BIGINT) AS cost
    FROM fills WHERE l_linenumber <= 3 GROUP BY ticket_id
    UNION ALL
    SELECT 2, ticket_id, CAST(SUM(q) AS BIGINT), CAST(SUM(q * p) AS BIGINT)
    FROM fills GROUP BY ticket_id
  ) a ON a.ticket_id = t.ticket_id AND a.version = v.version
)
SELECT CAST(version AS BIGINT) AS version,
       CASE WHEN eq >= quantity THEN 'filled'
            WHEN eq > 0 THEN 'partially_filled'
            ELSE 'pending' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_tickets,
       CAST(SUM(eq) AS BIGINT) AS total_executed_qty,
       CAST(SUM(cost) AS BIGINT) AS total_cost_cents
FROM state
GROUP BY 1, 2
""",
    tags=("K4", "lakehouse", "delta-protocol", "time-travel"),
)
def delta_log_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL through the EXPORTED Delta log: seed the trade-ticket
    table with history enabled, apply the same two fill batches as
    `ticket_fill_merge`, mirror the merge history into a `_delta_log`
    (`export_delta_log` — one Delta version per merge commit, deltas
    sized by touched buckets), then read versions 0/1/2 back through
    PURE LOG REPLAY (`read_delta_table` never lists a data directory)
    and roll each snapshot up by fill status. Matching the oracle for
    all three versions proves the exported add/remove actions select
    exactly the right file set at every version — the same guarantee a
    real Delta reader gets from `VERSION AS OF`."""
    root = tempfile.mkdtemp(prefix="sgdelta_")
    tickets_dir = os.path.join(root, "trade_tickets")
    try:
        create_bucketed_table(
            spark,
            tickets_dir,
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("ticket_id"),
                (F.col("o_orderkey") % 50 + 1).alias("quantity"),
                F.lit(0).cast("long").alias("executed_quantity"),
                F.lit(0).cast("long").alias("executed_cost_cents"),
                F.lit("pending").alias("status"),
            ),
            key="ticket_id",
            keep_history=True,
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("ticket_id"),
            F.col("l_quantity").cast("long").alias("fill_qty"),
            (F.col("l_partkey") % 97 + 1).cast("long").alias("fill_price_cents"),
            "l_linenumber",
        )
        apply_fills(spark, tickets_dir, li.filter(F.col("l_linenumber") <= 3))
        apply_fills(spark, tickets_dir, li.filter(F.col("l_linenumber") > 3))

        last = export_delta_log(spark, tickets_dir)
        assert last == 2 and delta_versions(tickets_dir) == [0, 1, 2]

        snaps = [
            read_delta_table(spark, tickets_dir, version=v).withColumn(
                "version", F.lit(v).cast("long")
            )
            for v in (0, 1, 2)
        ]
        union = snaps[0].unionByName(snaps[1]).unionByName(snaps[2])
        out = union.groupBy("version", "status").agg(
            F.count(F.lit(1)).alias("n_tickets"),
            F.sum("executed_quantity").alias("total_executed_qty"),
            F.sum("executed_cost_cents").alias("total_cost_cents"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_checkpoint_replay_read",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderstatus
""",
    tags=("K4", "lakehouse", "delta-protocol", "checkpoint"),
)
def delta_checkpoint_replay_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE Delta write path under a checkpointed log: CREATE a
    Delta table from one twelfth of `orders`, APPEND the other eleven
    slices as blind-append commits (v1..v11), which crosses the
    checkpoint interval so `v10.checkpoint.parquet` + `_last_checkpoint`
    are written; then DELETE every pre-checkpoint JSON commit and read
    the table via log replay. The read can only succeed through the
    checkpoint (the JSON history is gone) — exactly how a 100 TB Delta
    table with millions of commits stays readable in O(interval) log
    work. The aggregate matching a plain scan of `orders` proves no
    slice was lost or duplicated across create/append/checkpoint/replay.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="sgdeltacp_")
    tdir = os.path.join(root, "orders_delta")
    try:
        create_delta_table(
            spark, tdir, orders.filter(F.col("o_orderkey") % 12 == 0)
        )
        for i in range(1, 12):
            v = commit_append(
                spark, tdir, orders.filter(F.col("o_orderkey") % 12 == i)
            )
        assert v == 11
        cp = _latest_checkpoint_at_or_below(tdir, 11)
        assert cp == 10, f"expected checkpoint at v10, got {cp}"
        # drop the pre-checkpoint JSON history: replay must go through
        # the checkpoint or fail loudly
        for ver in range(0, cp):
            os.remove(os.path.join(tdir, "_delta_log", f"{ver:020d}.json"))

        df = read_delta_table(spark, tdir)
        out = df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
            .cast("double")
            .alias("total_price"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "streaming_delta_txn_sink",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events
GROUP BY event_type
""",
    tags=("T1", "T6", "K1", "lakehouse", "delta-protocol", "streaming"),
)
def streaming_delta_txn_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING lane lands in a Delta table with the protocol's
    own exactly-once mechanism: `foreachBatch` stamps every append
    commit with a `txn` action (appId = a stable query id, version =
    batchId) and consults `last_txn_version` first — the idempotent-
    writer handshake real Delta streaming sinks use. After the replay
    completes, the LAST micro-batch is redelivered verbatim (the crash-
    restart case: the sink's commit raced the checkpoint), and the txn
    guard turns it into a no-op instead of duplicate rows. The landed
    table is then read back through pure log replay and aggregated; the
    oracle over the ORIGINAL events proves nothing was lost at batch
    boundaries and the redelivered batch landed exactly once.

    Scale: each micro-batch is one blind-append commit (O(batch files)
    metadata, no reconciliation); the txn lookup is a log replay —
    O(checkpoint interval) JSONs at any commit count."""
    from financial_arbitrage_data_pipeline_spark.operators.streaming_queries import (
        _replay,
        _workdir,
    )
    from financial_arbitrage_data_pipeline_spark.streaming import ingest

    root = _workdir()
    app_id = "streaming_delta_txn_sink"
    try:
        replay_dir = _replay(spark, sf_dir, root)
        tdir = os.path.join(root, "events_delta")
        seen: list[tuple[int, "DataFrame"]] = []

        def land(batch_df: DataFrame, batch_id: int) -> None:
            batch = batch_df.select(
                "event_id", "ts_us", "user_id", "event_type", "value"
            )
            if not delta_versions(tdir):
                create_delta_table(spark, tdir, batch.limit(0))
            if (last_txn_version(spark, tdir, app_id) or -1) >= batch_id:
                return  # already committed: redelivery is a no-op
            commit_append(
                spark, tdir, batch, txn_app_id=app_id, txn_version=batch_id
            )
            seen.append((batch_id, batch_df))

        q = (
            ingest.replay_stream(spark, replay_dir)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # crash-restart simulation: redeliver the last micro-batch with
        # its original batch_id — the txn guard must no-op it
        assert seen, "replay produced no batches"
        last_id, last_df = seen[-1]
        n_versions = len(delta_versions(tdir))
        land(last_df, last_id)
        assert len(delta_versions(tdir)) == n_versions, "redelivery re-committed"

        landed = read_delta_table(spark, tdir)
        return (
            landed.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("event_id").alias("sum_event_id"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_optimize_vacuum_read",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("K4", "lakehouse", "delta-protocol", "compaction"),
)
def delta_optimize_vacuum_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-file LIFECYCLE a streaming-append Delta table needs:
    eight append commits accrete small files (one per micro-batch — at
    100 TB the scan dies by open-file overhead long before bytes), then
    OPTIMIZE bin-packs the active set in one dataChange=false commit,
    VACUUM(retention=0) physically deletes the tombstoned small files,
    and the table is read back through log replay. In-query assertions
    pin the contract: compaction shrinks the active file count, vacuum
    removes bytes from disk without touching the active set, the
    post-vacuum read still succeeds, and time travel to a pre-OPTIMIZE
    version now fails LOUDLY (history was traded for storage — the
    protocol's documented vacuum semantics, same loud-or-exact
    discipline as the merge table's vacuum). The aggregate matching a
    plain `orders` scan proves compaction+vacuum changed bytes' layout,
    never the data."""
    from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
        optimize_compact,
        replay_state,
        vacuum_delta,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="sgdeltaopt_")
    tdir = os.path.join(root, "orders_delta")
    try:
        create_delta_table(spark, tdir, orders.filter(F.col("o_orderkey") % 8 == 0))
        for i in range(1, 8):
            commit_append(spark, tdir, orders.filter(F.col("o_orderkey") % 8 == i))
        n_before = len(replay_state(spark, tdir).files)
        opt_v = optimize_compact(spark, tdir, target_files=1)
        n_after = len(replay_state(spark, tdir).files)
        assert n_after < n_before and n_after >= 1

        deleted = vacuum_delta(spark, tdir, retention_ms=0)
        assert len(deleted) == n_before, "vacuum must delete exactly the tombstoned files"
        for rel in deleted:
            assert not os.path.exists(os.path.join(tdir, rel))
        try:
            read_delta_table(spark, tdir, version=opt_v - 1).count()
            raise AssertionError("pre-OPTIMIZE version readable after vacuum")
        except Exception as exc:
            assert not isinstance(exc, AssertionError), exc

        df = read_delta_table(spark, tdir)
        out = df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
            .cast("double")
            .alias("total_price"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_partition_pruned_read",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
    tags=("K4", "lakehouse", "delta-protocol", "partition-pruning"),
)
def delta_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED Delta table + log-metadata pruning: `orders` lands
    partitioned by o_orderstatus (Hive-style dirs; the partition column
    lives ONLY in add.partitionValues and the path, never in the data
    files — the protocol's storage rule), then a selective read passes
    `partition_filter={'o_orderstatus': ['F']}` and the reader prunes
    the file set from the LOG alone, before any parquet footer is
    opened. In-query assertions pin that the pruned set is a strict
    non-empty subset, and THE OTHER PARTITIONS' FILES ARE DELETED FROM
    DISK before the read — the read can only succeed if pruning never
    touches them. That is the access pattern that makes a one-status
    scan of a 100 TB table cost O(matching partition): the decision is
    driver-side metadata, not a distributed directory walk."""
    from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
        _decode_path,
        replay_state,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="sgdeltapp_")
    tdir = os.path.join(root, "orders_delta")
    try:
        create_delta_table(
            spark,
            tdir,
            orders.filter(F.col("o_orderkey") % 2 == 0),
            partition_by=["o_orderstatus"],
        )
        commit_append(spark, tdir, orders.filter(F.col("o_orderkey") % 2 == 1))

        state = replay_state(spark, tdir)
        matching = [
            p for p, a in state.files.items()
            if a["partitionValues"]["o_orderstatus"] == "F"
        ]
        assert 0 < len(matching) < len(state.files)
        # destroy every non-matching partition file: pruning must make
        # the filtered read blind to them
        for p in set(state.files) - set(matching):
            os.remove(os.path.join(tdir, _decode_path(p)))

        df = read_delta_table(
            spark, tdir, partition_filter={"o_orderstatus": ["F"]}
        )
        out = df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
            .cast("double")
            .alias("total_price"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_merge_lifecycle",
    oracle="""
WITH tickets AS (
  SELECT o_orderkey AS ticket_id, o_orderkey % 50 + 1 AS quantity FROM orders
),
fills AS (
  SELECT l_orderkey AS ticket_id, l_linenumber,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(l_partkey % 97 + 1 AS BIGINT) AS p
  FROM lineitem
),
agg AS (
  SELECT ticket_id,
         CAST(SUM(q) AS BIGINT) AS fq,
         CAST(SUM(q * p) AS BIGINT) AS cost
  FROM fills GROUP BY ticket_id
),
b2 AS (
  SELECT ticket_id, CAST(SUM(q) AS BIGINT) AS fq2
  FROM fills WHERE l_linenumber > 3 GROUP BY ticket_id
)
SELECT t.ticket_id,
       t.quantity,
       COALESCE(a.fq, 0) AS executed_quantity,
       COALESCE(a.cost, 0) AS executed_cost_cents,
       CASE WHEN COALESCE(a.fq, 0) >= t.quantity THEN 'filled'
            WHEN COALESCE(a.fq, 0) > 0 THEN 'partially_filled'
            ELSE 'pending' END AS status,
       b2.fq2 AS last_fill_qty
FROM tickets t
LEFT JOIN agg a ON a.ticket_id = t.ticket_id
LEFT JOIN b2 ON b2.ticket_id = t.ticket_id
""",
    tags=("K4", "J4", "lakehouse", "delta-protocol", "exactly-once"),
)
def delta_merge_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full trade-ticket lifecycle as NATIVE-DELTA keyed MERGE
    (VERDICT r10 task 2): seed pending tickets straight into a Delta
    table (`create_delta_table`), apply the same two fill batches as
    `ticket_fill_merge` via `merge_delta_table` — copy-on-write
    rewrite of only the key-stats-matching files, remove+add in one
    commit — with the protocol's `txn` action carrying exactly-once:
    batch 1 is REDELIVERED verbatim after it commits and must no-op.
    Batch 2 additionally WIDENS the schema through the merge
    (`evolve_cols=['last_fill_qty']` re-emits metaData in the same
    commit), so the final log-replay read surfaces the new column with
    nulls for tickets batch 2 never touched. The oracle recomputes the
    end state set-based from the raw tables; a hash match proves the
    incremental copy-on-write path converges to the set-based truth —
    the same guarantee the reference buys from Postgres transactions
    (`/root/reference/database/postgres/writer.py:351-407`)."""
    from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
        merge_delta_table,
    )

    root = tempfile.mkdtemp(prefix="sgdmerge_")
    tdir = os.path.join(root, "tickets_delta")
    app = "delta_merge_lifecycle"
    try:
        create_delta_table(
            spark,
            tdir,
            load_table(spark, sf_dir, "orders")
            .select(
                F.col("o_orderkey").alias("ticket_id"),
                (F.col("o_orderkey") % 50 + 1).alias("quantity"),
                F.lit(0).cast("long").alias("executed_quantity"),
                F.lit(0).cast("long").alias("executed_cost_cents"),
                F.lit("pending").alias("status"),
            )
            .repartitionByRange(8, "ticket_id"),
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("ticket_id"),
            F.col("l_quantity").cast("long").alias("fill_qty"),
            (F.col("l_partkey") % 97 + 1).cast("long").alias("fill_price_cents"),
            "l_linenumber",
        )

        def batch(df: DataFrame) -> DataFrame:
            return df.groupBy("ticket_id").agg(
                F.sum("fill_qty").alias("batch_qty"),
                F.sum(F.col("fill_qty") * F.col("fill_price_cents")).alias(
                    "batch_cost"
                ),
            )

        new_exec = F.col("t.executed_quantity") + F.col("u.batch_qty")
        new_cost = F.col("t.executed_cost_cents") + F.col("u.batch_cost")
        set_exprs = {
            "executed_quantity": new_exec,
            "executed_cost_cents": new_cost,
            "status": F.when(new_exec >= F.col("t.quantity"), F.lit("filled"))
            .when(new_exec > 0, F.lit("partially_filled"))
            .otherwise(F.lit("pending")),
        }
        # Plain calls with explicit checks — NOT asserts: the merges are
        # side-effecting, and `python -O` strips assert statements, which
        # would silently skip the merges instead of failing loudly.

        # Prune self-enforcement (VERDICT r11 task 6, the MERGE twin of
        # delta_stats_skipping_read's): a NARROW identity merge (lowest
        # key octile, values set to themselves — content provably
        # unchanged) must rewrite a strict subset of the key-clustered
        # files, with the degraded flag OFF. A silent fall-back to
        # rewriting every stats-bearing file fails here instead of
        # passing as a slow success; the counters also ride the commit's
        # operationMetrics for the artifact trail.
        from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
            LAST_MERGE_PRUNE,
        )

        narrow = (
            load_table(spark, sf_dir, "orders")
            .select(F.col("o_orderkey").alias("ticket_id"))
            .orderBy("ticket_id")
            .limit(8)
        )
        v0 = merge_delta_table(
            spark, tdir, narrow, "ticket_id",
            {"executed_quantity": F.col("t.executed_quantity")},
        )
        if v0 != 1:
            raise RuntimeError(f"probe merge committed version {v0}, expected 1")
        if LAST_MERGE_PRUNE.get("degraded") or not (
            LAST_MERGE_PRUNE.get("files_candidates", 9) * 2
            <= LAST_MERGE_PRUNE.get("files_total", 0)
        ):
            raise RuntimeError(
                f"MERGE stats pruning degraded to a near-full rewrite: "
                f"{LAST_MERGE_PRUNE}"
            )

        b1 = batch(li.filter(F.col("l_linenumber") <= 3))
        v1 = merge_delta_table(
            spark, tdir, b1, "ticket_id", set_exprs,
            txn_app_id=app, txn_version=1,
        )
        if v1 != 2:
            raise RuntimeError(f"batch-1 merge committed version {v1}, expected 2")
        # crash-redelivery of batch 1: the txn guard must no-op it
        redel = merge_delta_table(
            spark, tdir, b1, "ticket_id", set_exprs,
            txn_app_id=app, txn_version=1,
        )
        if redel is not None:
            raise RuntimeError(f"redelivered batch 1 committed {redel}, expected no-op")
        b2 = batch(li.filter(F.col("l_linenumber") > 3)).withColumn(
            "last_fill_qty", F.col("batch_qty")
        )
        v2 = merge_delta_table(
            spark, tdir, b2, "ticket_id", set_exprs,
            txn_app_id=app, txn_version=2,
            evolve_schema=True, evolve_cols=["last_fill_qty"],
        )
        if v2 != 3:
            raise RuntimeError(f"batch-2 merge committed version {v2}, expected 3")

        final = read_delta_table(spark, tdir).select(
            "ticket_id",
            "quantity",
            "executed_quantity",
            "executed_cost_cents",
            "status",
            "last_fill_qty",
        )
        return final.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_stats_skipping_read",
    oracle="""
WITH b AS (
  SELECT MAX(o_orderkey) // 4 AS lo, MAX(o_orderkey) // 2 AS hi FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(MIN(o_custkey) AS BIGINT) AS min_cust,
       CAST(MAX(o_custkey) AS BIGINT) AS max_cust
FROM orders, b
WHERE o_orderkey BETWEEN b.lo AND b.hi
GROUP BY o_orderstatus
""",
    tags=("K4", "lakehouse", "delta-protocol", "data-skipping"),
)
def delta_stats_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DATA SKIPPING end-to-end (r11): the writer stamps per-file
    minValues/maxValues from parquet footers into add.stats; a read
    with `stats_filter` prunes files by those logged ranges BEFORE any
    footer is opened — the metadata tier that makes a selective key-
    range read of a 100 TB table cost O(matching files), not O(table).
    The table is written key-clustered (repartitionByRange on the key,
    so each file covers a tight key range — the layout any
    streaming-by-key or MERGE-bucketed table already has); the query
    then reads a quarter of the keyspace and SELF-ENFORCES that the
    log-level pruning actually skipped files (a silent full-scan
    degrade raises instead of passing). The oracle states the same
    range read declaratively over the raw table; the hash match proves
    skipping lost no qualifying row and admitted no extra one.
    Reference anchor: the reference's range scans lean on Postgres
    btree indexes (`/root/reference/database/postgres/writer.py`);
    Delta's stats tier is the lakehouse equivalent."""
    from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
        stats_selected_files,
    )

    root = tempfile.mkdtemp(prefix="sgdskip_")
    tdir = os.path.join(root, "orders_delta")
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        )
        create_delta_table(
            spark, tdir, orders.repartitionByRange(8, "o_orderkey")
        )
        mx = orders.agg(F.max("o_orderkey")).first()[0]
        lo, hi = mx // 4, mx // 2
        kept, total = stats_selected_files(
            spark, tdir, {"o_orderkey": (lo, hi)}
        )
        if not kept < total:
            raise RuntimeError(
                f"stats skipping degraded to a full scan ({kept}/{total} "
                "files kept for a quarter-keyspace read)"
            )
        df = read_delta_table(spark, tdir, stats_filter={"o_orderkey": (lo, hi)})
        out = df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("sum_key"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_zorder_skipping_read",
    oracle="""
SELECT l_partkey % 256 AS px,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(l_orderkey % 256) AS BIGINT) AS sum_sy
FROM lineitem
WHERE l_partkey % 256 BETWEEN 32 AND 63
  AND l_orderkey % 256 BETWEEN 96 AND 127
GROUP BY 1
""",
    tags=("K4", "lakehouse", "delta-protocol", "data-skipping", "zorder"),
)
def delta_zorder_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY + two-dimensional data skipping (r11): a
    table queried by box predicates on TWO columns can't be served by a
    single-column sort — clustering on the Morton z-curve keeps each
    rewritten file tight in BOTH dimensions, so `stats_filter` skips
    files for either (or both) bounds. The query seeds an UNCLUSTERED
    table (hash-scrambled files whose per-file [min,max] spans nearly
    the whole space — version 0 keeps ~every file), runs the layout-only
    z-order OPTIMIZE, and SELF-ENFORCES that the identical box read now
    skips at least half the files at HEAD (and strictly beats the
    unclustered layout) while version-0 time travel shows the
    counterfactual — at bench SFs the observed skip is far higher; the
    floor only needs to survive the 750-row-per-file smallest tier. The box [32,63]x[96,127] is a 32x32 cell aligned
    on the curve, i.e. one contiguous z-interval — the geometry that
    makes aligned-box reads O(cell) after clustering. The oracle states
    the box read flat over the raw table: the hash match proves the
    rewrite moved bytes without changing content AND that skipping was
    exact."""
    from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
        optimize_compact,
        stats_selected_files,
    )

    root = tempfile.mkdtemp(prefix="sgdzord_")
    tdir = os.path.join(root, "cells_delta")
    box = {"px": (32, 63), "sy": (96, 127)}
    try:
        cells = load_table(spark, sf_dir, "lineitem").select(
            (F.col("l_partkey") % 256).alias("px"),
            (F.col("l_orderkey") % 256).alias("sy"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        create_delta_table(spark, tdir, cells.repartition(8))
        kept0, total0 = stats_selected_files(spark, tdir, box, version=0)
        optimize_compact(spark, tdir, target_files=8, zorder_by=("px", "sy"))
        kept, total = stats_selected_files(spark, tdir, box)
        if not (kept * 2 <= total and kept < kept0):
            raise RuntimeError(
                f"z-order bought no skipping: box read keeps {kept}/{total} "
                f"files after OPTIMIZE vs {kept0}/{total0} unclustered"
            )
        df = read_delta_table(spark, tdir, stats_filter=box)
        out = df.groupBy("px").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").alias("sum_qty"),
            F.sum("sy").alias("sum_sy"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "delta_dv_read",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM orders
WHERE o_orderkey % 10 >= 3 AND o_orderstatus <> 'F'
GROUP BY o_orderstatus
""",
    tags=("K4", "lakehouse", "delta-protocol", "deletion-vectors"),
)
def delta_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector reads end-to-end (r12): the merge-on-read half
    of the Delta protocol — DELETE marks row positions in per-file
    roaring bitmaps (protocol v3 readerFeatures=[deletionVectors])
    instead of rewriting data files, and every subsequent read must
    anti-join the deleted positions away. Two stacked deletes exercise
    the union path (a file's second DV must carry old ∪ new): first by
    key residue, then by order status; the read after both must return
    EXACTLY the complement — the oracle states that complement
    declaratively over the raw table, so the hash match proves no
    deleted row resurfaces and no surviving row is lost. Self-enforced:
    the commit must have upgraded the protocol and attached at least
    one DV (a silent fall-back to copy-on-write would fail loudly), and
    version-0 time travel still reads the full table. Scale shape: DV
    bitmaps are packed per-file on executors, only serialized blobs
    reach the driver, and the read-side anti-join picks broadcast vs
    shuffle from the descriptors' summed cardinality — log metadata,
    not a Catalyst estimate.

    Reference anchor: the reference applies row-level corrections to
    its Postgres trade tables in place (`/root/reference/database/
    postgres/writer.py:351-407`); DVs are the lakehouse-native form of
    that workload, and reading them is what modern external Delta
    writers require (merge-on-read is their default)."""
    from financial_arbitrage_data_pipeline_spark.sources.delta_log import (
        delete_from_delta_table,
        replay_state,
    )

    root = tempfile.mkdtemp(prefix="sgdvread_")
    tdir = os.path.join(root, "orders_delta")
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        )
        create_delta_table(
            spark, tdir, orders.repartitionByRange(8, "o_orderkey")
        )
        v1 = delete_from_delta_table(spark, tdir, "o_orderkey % 10 < 3")
        v2 = delete_from_delta_table(spark, tdir, "o_orderstatus = 'F'")
        if v1 is None or v2 is None:
            raise RuntimeError("DV deletes matched no rows — fixture broken")
        state = replay_state(spark, tdir)
        n_dv = sum(1 for a in state.files.values() if a.get("deletionVector"))
        if n_dv == 0 or state.protocol.get("minReaderVersion") != 3:
            raise RuntimeError(
                f"merge-on-read DELETE degraded: {n_dv} DV'd files, "
                f"protocol {state.protocol}"
            )
        df = read_delta_table(spark, tdir)
        out = df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("sum_key"),
            F.sum("o_custkey").alias("sum_cust"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
