"""Operator modules. Importing this package registers every named query
into `plans.REGISTRY` (each module's @query decorators run at import)."""

from . import market, relational  # noqa: F401

__all__ = ["market", "relational"]
