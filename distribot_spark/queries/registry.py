"""Declared-query registry — the correctness contract with the driver.

Every operator from SURVEY.md §2 registers here with:
  - a builder: ``(spark, sf_dir) -> DataFrame`` (idiomatic DataFrame API), and
  - optionally an oracle: the equivalent DuckDB SQL over the same parquet
    views. Queries without an oracle get a weaker rows-only check.

Determinism rules (SURVEY §2B): total ORDER BY on every oracle query; money
sums go through exact DECIMAL arithmetic; inherently-float aggregates are
ROUND()ed; result columns are aliased identically on both sides; no raw
timestamp columns in results (cast to DATE or extract integers).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a declared query to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def queries() -> dict[str, Builder]:
    """Registration order — fixed and round-independent.

    Modules register in SURVEY §2 inventory order (relational Q, streaming S,
    llm L, flow R, then extras); within a module, source order. No per-round
    reordering: if the driver bounds how many queries it certifies per round,
    that is the driver's policy, not something to order around.
    """
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
