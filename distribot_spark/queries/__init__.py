"""Declared query inventory. Importing this package populates the registry."""

from distribot_spark.queries.registry import QUERIES, oracle_sql, queries, register

# Registration side effects: each module adds its declared queries.
# Imports are UNCONDITIONAL on purpose: a swallowed ImportError would
# silently shrink the driver's CORRECTNESS contract (whole query families
# vanishing from queries()/oracle_sql() with no failing test). If a module
# can't import, the whole registry must fail loudly.
from distribot_spark.queries import (  # noqa: E402,F401
    analytics_extra,
    flow,
    llm,
    relational,
    sources,
    streaming,
    temporal,
)

__all__ = ["QUERIES", "queries", "oracle_sql", "register"]
