"""Deterministic weighted priority sampling (per-group, without replacement).

The 100 TB problem: "give me k representative documents per language,
favoring long ones" must not depend on RNG state, partition layout, or
engine hash functions — otherwise the sample silently changes on every
re-run/re-partition and train/val contamination checks break. (The
reference has no sampling at all; this is part of the training-pipeline
mandate surface.)

Scheme (A-Res-flavored, engine-agnostic): each row gets a uniform 32-bit
integer from the md5 hex prefix of its id — identical in Spark
(`conv(substr(md5(id),1,8),16,10)`) and DuckDB
(`('0x'||substr(md5(id),1,8))::BIGINT`) — and a priority

    priority = u32 / weight            (one IEEE division, exact-rounded,
                                        so bit-identical across engines)

The k smallest priorities per group win: doubling a row's weight halves
its priority, making selection odds grow ~linearly with weight (an
explicit approximation of Efraimidis–Spirakis u^(1/w), chosen because
pow/log go through libm and are NOT guaranteed bit-identical across
engines — a priority-order flip would flip the sample).

Properties: stable under corpus growth (a row's priority never changes
when other rows arrive), layout-independent, oracle-checkable. Scale
shape: one scan + one per-group top-k window — the same plan as q22.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def priority_col(id_col: str, weight_col: str) -> F.Column:
    """u32(md5(id)) / weight — mirror with
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT / w``
    in DuckDB oracle SQL."""
    u32 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return u32.cast("double") / F.col(weight_col)


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """k rows per group, weighted-without-replacement by `weight_col`
    (> 0), deterministic. Adds `priority` (double) and `rnk` (int).

    Plan: single shuffle on `group_cols` for the ranking window; at scale
    the window is a per-partition top-k (rank ≤ k prunes before sort
    spill matters). Ties broken by id for total determinism.
    """
    w = Window.partitionBy(*group_cols).orderBy("priority", id_col)
    return (
        df.withColumn("priority", priority_col(id_col, weight_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
