"""Operator modules. Importing this package registers every named query
into `plans.REGISTRY` (each module's @query decorators run at import)."""

from . import (  # noqa: F401
    dedup,
    market,
    multimodal,
    relational,
    similarity,
    streaming_queries,
    textstats,
    universe,
    upsert,
)

__all__ = [
    "dedup",
    "market",
    "multimodal",
    "relational",
    "similarity",
    "streaming_queries",
    "textstats",
    "universe",
    "upsert",
]
