"""JDBC relational source/sink (S5 / K2 — SURVEY §2.1).

The reference reads its pair/ticket tables from live Postgres
(`virginia/database/read_from.py:129-167`, `ireland/database/
write_to.py`) with hand-written SQL. Spark-first: `spark.read.jdbc`
declares the same scan and Catalyst pushes filters into the remote
database (the `PushedFilters` you see in the JDBC scan node become a
WHERE clause in the generated SQL), so the database does the
selection and only matching rows cross the wire.

The container ships Apache Derby (embedded JDBC engine in the Spark
JVM), which stands in for Postgres: SAME `format("jdbc")` code path,
SAME pushdown machinery — only the URL/driver differ in production:

    url="jdbc:postgresql://host/db", driver="org.postgresql.Driver"

Scale notes (100 TB cluster, real Postgres):
- Parallel reads need `partitionColumn/lowerBound/upperBound/
  numPartitions` (each executor reads one key range) — exposed here via
  `partition_on`. Without it a JDBC read is ONE task; fine for dimension
  tables, wrong for facts.
- Writes batch via `batchsize` (the reference's writer batches inserts
  the same way, `database/postgres/writer.py:94-120`).
- Embedded Derby lives in the driver/executor JVM, so this fixture form
  is single-JVM-only (exactly local mode); a served database has no such
  limit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _quiet_derby(spark: SparkSession) -> None:
    """Point Derby's boot log at the null device (it defaults to
    ./derby.log in the working directory). Takes effect if set before
    the engine first boots in this JVM; harmless afterwards."""
    try:
        spark._jvm.System.setProperty("derby.stream.error.file", os.devnull)
    except Exception:  # pragma: no cover - py4j access is best-effort
        pass


def derby_url(db_dir: str, create: bool = False) -> str:
    return f"jdbc:derby:{db_dir}" + (";create=true" if create else "")


def write_table_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    mode: str = "overwrite",
    batchsize: int = 1000,
    column_types: str | None = None,
) -> None:
    """K2/K3: relational insert sink — batched INSERTs through the JDBC
    writer, one connection per partition. Pass `column_types` (DDL
    fragment, e.g. "status VARCHAR(8)") for string columns: Spark's
    default StringType mapping is CLOB on Derby (TEXT on Postgres), and
    CLOB is not comparable, which would break predicate pushdown on
    those columns."""
    _quiet_derby(df.sparkSession)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
    )
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.mode(mode).save()


def load_table_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_on: tuple[str, int, int, int] | None = None,
) -> DataFrame:
    """S5: relational scan. Filters/projections applied to the returned
    DataFrame are pushed into the database query by Catalyst.
    `partition_on=(column, lower, upper, num_partitions)` splits the scan
    into parallel range reads for large tables."""
    _quiet_derby(spark)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_on is not None:
        col, lo, hi, n = partition_on
        reader = (
            reader.option("partitionColumn", col)
            .option("lowerBound", str(lo))
            .option("upperBound", str(hi))
            .option("numPartitions", str(n))
        )
    return reader.load()
