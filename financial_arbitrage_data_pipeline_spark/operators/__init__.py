"""Operator modules. Importing this package registers every named query
into `plans.REGISTRY` (each module's @query decorators run at import)."""

from . import (  # noqa: F401
    analytics,
    corpusprep,
    dataquality,
    dedup,
    etl_queries,
    layout,
    market,
    multimodal,
    relational,
    sessions,
    similarity,
    streaming_queries,
    subqueries,
    textstats,
    timeseries,
    transcode,
    universe,
    upsert,
)

__all__ = [
    "analytics",
    "corpusprep",
    "dataquality",
    "dedup",
    "etl_queries",
    "layout",
    "market",
    "multimodal",
    "relational",
    "sessions",
    "similarity",
    "streaming_queries",
    "subqueries",
    "textstats",
    "timeseries",
    "transcode",
    "universe",
    "upsert",
]
