"""Cross-engine determinism helpers.

The driver hash-compares Spark results against DuckDB. Three rules make
float/decimal results representation-stable across the two engines:

1. money sums: exact DECIMAL(12,2) arithmetic inside, ROUND(…, 2) (both
   engines round decimals half-away-from-zero), then CAST to DOUBLE
   (DuckDB's client fetch renders decimals as float64 anyway).
2. inherently-float aggregates: ROUND(x * 10^n) / 10^n with the multiply
   spelled out — both engines then round the *same* IEEE double
   half-away, instead of each applying a different ROUND(x, n) algorithm.
3. never emit raw timestamps — date_format/strftime to strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D12 = "decimal(12,2)"


def stable_round(col: Column, nd: int = 2) -> Column:
    """ROUND(x * 10^nd) / 10^nd — mirror the same spelled-out form in the
    oracle SQL and both engines round an identical double.

    NEGATIVE-ZERO TRAP: when x is in (-0.5/10^nd, 0), DuckDB's ROUND
    keeps IEEE -0.0 (prints '-0.0') while Spark's F.round goes through
    BigDecimal, which has no signed zero, and emits +0.0 — a hash
    mismatch invisible until the data contains a tiny negative (hit q33/
    q35 only at sf0.1). Whenever the rounded quantity can be negative,
    append `+ 0.0` on BOTH sides (IEEE: -0.0 + 0.0 = +0.0) — see
    q18_corr / q33 / q35."""
    m = F.lit(float(10**nd))
    return F.round(col * m, 0) / m


def money(col: str | Column) -> Column:
    """Exact decimal view of a 2-dp double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(D12)


def money_sum(expr: Column, alias: str) -> Column:
    """Exact decimal SUM → ROUND 2 → DOUBLE (see module docstring)."""
    return F.round(F.sum(expr), 2).cast("double").alias(alias)
