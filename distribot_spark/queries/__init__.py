"""Declared query inventory. Importing this package populates the registry."""

from distribot_spark.queries.registry import QUERIES, oracle_sql, queries, register

# Registration side effects: each module adds its declared queries.
from distribot_spark.queries import relational  # noqa: E402,F401

try:  # LLM-pipeline operators (dedup, similarity, text analysis)
    from distribot_spark.queries import llm  # noqa: E402,F401
except ImportError:
    pass

try:  # bounded-replay streaming queries S1–S10
    from distribot_spark.queries import streaming  # noqa: E402,F401
except ImportError:
    pass

try:  # extra analytics (percentiles, resample, skew, text extras)
    from distribot_spark.queries import analytics_extra  # noqa: E402,F401
except ImportError:
    pass

try:  # temporal operators (as-of join, time rollup)
    from distribot_spark.queries import temporal  # noqa: E402,F401
except ImportError:
    pass

try:  # source/sink round-trip queries
    from distribot_spark.queries import sources  # noqa: E402,F401
except ImportError:
    pass

try:  # flow-engine e2e queries
    from distribot_spark.queries import flow  # noqa: E402,F401
except ImportError:
    pass

__all__ = ["QUERIES", "queries", "oracle_sql", "register"]
