"""Reusable column-expression helpers. All pure `pyspark.sql.functions`
compositions — JVM-side, codegen'd, no Python UDFs.

Exact-money discipline: the testdata stores money as doubles that are
exact 2-decimal values. Every aggregation over money casts to a tight
DecimalType first, aggregates exactly (order-independent), and only then
casts back to double. This keeps results bit-identical across engines and
across partitionings — a distributed sum of doubles is otherwise
nondeterministic in the last ulp, which matters both for the DuckDB
correctness oracle and for reproducible results at 100 TB (the reference
has the same concern and solves it with DECIMAL(15,6) Postgres money
columns, `database/models/postgres.py:396-440`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast to an exact decimal. Default (18,2) fits every money column in
    the testdata; pass tighter precision when the value feeds a multiply
    (decimal multiply adds precisions; keep p1+p2+1 <= 38)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money(col: Column | str) -> Column:
    """Money factor for products: decimal(12,2) (max 10^10 dollars)."""
    return dec(col, 12, 2)


def rate(col: Column | str) -> Column:
    """Small-rate factor (discount/tax in [0,1], 2 decimals)."""
    return dec(col, 3, 2)


def sum_money(col: Column, alias: str) -> Column:
    """Exact decimal sum, returned as double."""
    return F.sum(col).cast("double").alias(alias)


def avg_money(col: Column, alias: str) -> Column:
    """Exact-sum average: decimal sum cast to double, divided by count.
    (Plain avg() over doubles is partition-order dependent.)"""
    return (F.sum(col).cast("double") / F.count(col)).alias(alias)


def ns_to_us(col: Column | str) -> Column:
    """ns-epoch long → µs-epoch long, exactly. Plain `/` is float division
    and is inexact at ns-epoch magnitude; subtracting the mod first makes
    the quotient an integer ≤ 2^53, so the division is exact."""
    c = F.col(col) if isinstance(col, str) else col
    return ((c - c % F.lit(1000)) / F.lit(1000)).cast("long")


def ns_to_ts(col: Column | str) -> Column:
    """ns-epoch long → TimestampType (microsecond precision), the
    reference's `ns → stored timestamp` derivation (`influx.py:142-143`)."""
    return F.timestamp_micros(ns_to_us(col))
