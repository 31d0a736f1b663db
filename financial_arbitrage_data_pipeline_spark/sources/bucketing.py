"""Bucketed table layout — the co-located-join storage strategy.

At 100 TB the dominant repeated cost is shuffling the fact tables on
their join keys (orders ⋈ lineitem on orderkey; snapshots ⋈ fills on
ticket). Writing both sides bucketed (and sorted) by that key once moves
the exchange from every query into the write path: Spark's scan reports
the bucketing as an output partitioning, and equi-joins/groupBys on the
bucket key plan with NO Exchange (sort-merge over pre-sorted buckets).

This is the batch analog of the streaming state layout (hash-partitioned
by pair_id) and of the reference's "2-tag cardinality" storage design:
layout chosen once, every query prunes/co-locates for free.

Bucket-count sizing: target ~128-256 MB per bucket file at the final
table size; bucket count must match across co-joined tables (or be an
integer multiple on one side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
) -> None:
    """Write `df` as a bucketed+sorted managed parquet table. Queries that
    join or aggregate on `bucket_col` across tables bucketed with the
    same count skip their shuffles entirely."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def cobucket_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans without an
    Exchange on either side (assert via .explain: no
    `Exchange hashpartitioning(<on>...)` below the SortMergeJoin)."""
    return spark.table(left_table).join(spark.table(right_table), on)
