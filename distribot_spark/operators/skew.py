"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting handles most cases at runtime; these are the
explicit techniques for the cases AQE can't fix:

- `salted_aggregate`: a hot-key groupBy where one key holds a large share
  of all rows — pre-aggregate on (key, salt) so the hot key's rows spread
  over `salt_buckets` reducers, then combine. Works for any algebraic
  aggregate (sum/count/min/max); the caller supplies both phases.
- `salted_join`: skewed fact ⋈ small-ish dim where the dim is too big to
  broadcast — explode the dim `salt_buckets`× and salt the fact side, so
  the hot key's rows land on different reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, salt_buckets): hash of all columns
    — stable across retries (no rand(), which breaks task re-execution)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) with `partial_aggs`,
    then groupBy(keys) with `final_aggs` over the partials.

    Example (average):
        partial: [sum(x).alias('s'), count(x).alias('c')]
        final:   [(sum('s')/sum('c')).alias('avg_x')]
    """
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where `skewed` has hot values of `on`: salt the fact side,
    explode the dim side salt_buckets×, join on (key, salt). The dim's
    shuffle volume grows by the factor — use only when it's far smaller
    than the fact table and broadcast is impossible."""
    fact = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*skewed.columns), F.lit(salt_buckets)).cast("int"),
    )
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return fact.join(replicated, [on, "__salt"]).drop("__salt")
