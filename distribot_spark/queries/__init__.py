"""Declared query inventory. Importing this package populates the registry."""

from distribot_spark.queries.registry import QUERIES, oracle_sql, queries, register

# Registration side effects: each module adds its declared queries.
# Imports are UNCONDITIONAL on purpose: a swallowed ImportError would
# silently shrink the driver's CORRECTNESS contract (whole query families
# vanishing from queries()/oracle_sql() with no failing test). If a module
# can't import, the whole registry must fail loudly.
# Import order == registration order == SURVEY §2 inventory order
# (relational Q, streaming S, llm L, flow R, then the extras). This order is
# fixed; it does not change round-to-round.
from distribot_spark.queries import relational  # noqa: E402,F401  isort: skip
from distribot_spark.queries import streaming  # noqa: E402,F401  isort: skip
from distribot_spark.queries import llm  # noqa: E402,F401  isort: skip
from distribot_spark.queries import flow  # noqa: E402,F401  isort: skip
from distribot_spark.queries import analytics_extra  # noqa: E402,F401  isort: skip
from distribot_spark.queries import sources  # noqa: E402,F401  isort: skip
from distribot_spark.queries import temporal  # noqa: E402,F401  isort: skip
from distribot_spark.queries import advanced  # noqa: E402,F401  isort: skip
from distribot_spark.queries import quality  # noqa: E402,F401  isort: skip
from distribot_spark.queries import spatial  # noqa: E402,F401  isort: skip

__all__ = ["QUERIES", "queries", "oracle_sql", "register"]
