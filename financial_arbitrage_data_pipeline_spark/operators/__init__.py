"""Operator modules. Importing this package registers every named query
into `plans.REGISTRY` (each module's @query decorators run at import)."""

from . import dedup, market, multimodal, relational, similarity, textstats  # noqa: F401

__all__ = ["dedup", "market", "multimodal", "relational", "similarity", "textstats"]
