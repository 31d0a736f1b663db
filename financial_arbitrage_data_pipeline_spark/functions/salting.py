"""Skew mitigation helpers.

First line of defense at scale is AQE (`spark.sql.adaptive.skewJoin`,
enabled by session.get_spark), which splits oversized sort-merge
partitions at runtime. Salting is the explicit fallback for the cases
AQE can't fix: a shuffle join where a handful of keys dominate and the
other side is too big to broadcast, or a streaming stateful operator
(AQE is disabled for stateful workloads).

`salted_join` spreads each hot key over `n_salts` shuffle partitions by
appending a deterministic salt to the big side and replicating the small
side once per salt value. Deterministic (hash of the row's own columns,
not rand()) so retries and replays produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, salt_from: list[str] | None, n_salts: int, col_name: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, n_salts): xxhash64 of the given columns —
    rows of one hot key scatter uniformly, reruns scatter identically.

    `salt_from` must include at least one high-cardinality column: fully
    identical rows hash identically, so a hot key whose rows are exact
    duplicates would all land in ONE salt bucket and the skew survives.
    Pass `salt_from=None` for such data — the salt then comes from the
    row's physical position (partition id + per-partition counter), which
    spreads even byte-identical rows. Positional salt is deterministic for
    a fixed input layout (same files, same split) but NOT content-stable
    across a repartition, so prefer a column-derived salt whenever one
    distinguishing column exists."""
    if salt_from is None:
        # monotonically_increasing_id = (partition id << 33) | row index —
        # exactly the per-partition counter that distinguishes duplicates.
        return df.withColumn(
            col_name, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
        )
    return df.withColumn(col_name, F.pmod(F.xxhash64(*salt_from), F.lit(n_salts)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int,
    big_salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small on `on`, with the shuffle key widened to (on, salt):
    the big side computes its salt from its own columns; the small side is
    exploded ×n_salts so every (key, salt) bucket finds its match. Output
    equals the plain join exactly; the hot key's rows now land on
    n_salts partitions instead of one.

    The default salt source (all non-key columns) assumes rows of a hot
    key differ somewhere; pass `big_salt_from` naming a high-cardinality
    column when they might not, or `big_salt_from=[]` to salt by physical
    row position (handles fully duplicate rows — see `with_salt`)."""
    if big_salt_from is not None and len(big_salt_from) == 0:
        salt_cols = None  # positional salt
    else:
        salt_cols = big_salt_from or [c for c in big.columns if c != on]
    b = with_salt(big, salt_cols, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")
