"""The named-query registry.

Single source of truth behind `__spark_entry__.queries()` /
`oracle_sql()` and `bench.py`. Each spec carries:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first
  implementation (DataFrame API, Catalyst-optimizable);
- ``oracle`` — equivalent ANSI SQL for the DuckDB oracle over the same
  parquet tables (views pre-registered by the driver). ``None`` for
  genuinely non-SQL-expressible ops (driver then does a rows-only check);
- ``headline`` — included in bench.py's timing loop.

Column names are aliased identically on both sides: the driver's compare
sorts columns by name before hashing values.

Tag conventions a 100 TB user should read before picking a query
(VERDICT r11 task 5):

- ``pairs-audit-tier`` — the query's OUTPUT is the duplicate-pair set,
  O(pairs) by contract (replica-quadratic in dense corpora: 44.7M rows
  at sf10 for simhash_dedup). Right for audits and diagnostics; wrong
  as a daily pipeline stage at scale.
- ``canonical-scale`` — the 100 TB default of the same family: output
  and every exchange are O(docs) or O(incoming batch) (verdicts /
  cluster representatives, not pairs). Each audit-tier query has a
  canonical counterpart: simhash_dedup -> simhash_dedup_canonical,
  minhash_lsh_dedup -> dedup_keep_canonical /
  incremental_neardup_gate(_persisted), incremental_phash_gate ->
  incremental_phash_gate_canonical.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    headline: bool
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Register a named query. Usage:

    @query("pricing_summary", oracle="SELECT ...", headline=True)
    def pricing_summary(spark, sf_dir): ...
    """

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            headline=headline,
            doc=(fn.__doc__ or "").strip(),
            tags=tuple(tags),
        )
        return fn

    return deco
