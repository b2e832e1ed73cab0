"""Spatial neighbor join via uniform grid bucketing.

Radius search between two point sets without a cartesian product: snap
every point to a square grid cell of side = search radius R, replicate
the SMALLER side into its 3x3 neighboring cells (9 rows per point, a
constant), and equi-join on the cell id — any pair within R is guaranteed
to land in one of the 9 cells, so the exact distance predicate only runs
on co-cell candidates. The geohash/S2-cell pattern, reduced to integer
arithmetic.

Coordinates are INTEGER micro-degrees end-to-end: cell snapping is exact
integer division and the distance test is exact int64 arithmetic
(|coord| < 2^31 so squared sums stay < 2^63) — results hash identically
across engines with no float rounding discipline needed.

Scale: the replicated side grows 9x BEFORE its shuffle — always explode
the smaller input. Both sides shuffle (or the 9x side broadcasts, when it
fits) on the cell key; a pair can only meet ONCE because the probe point
sits in exactly one cell and the 9 replicas are distinct cells — no
post-join dedup. Dense-cell skew is data skew on the join key; the
standard salting/AQE remedies apply (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_join(
    probe: DataFrame,
    build: DataFrame,
    radius: int,
    broadcast_build: bool = True,
) -> DataFrame:
    """All (build, probe) pairs within `radius` (squared Euclidean in the
    coordinate units). Inputs need columns (id, x, y) with integer x/y;
    `build` is the smaller side that gets 9x-replicated. Returns
    build_id, probe_id, dist_sq."""
    cell = lambda c: (c / F.lit(radius)).cast("long")  # noqa: E731
    p = probe.select(
        F.col("id").alias("probe_id"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        cell(F.col("x")).alias("cx"),
        cell(F.col("y")).alias("cy"),
    )
    offsets = F.array([F.lit(d) for d in (-1, 0, 1)])
    b = (
        build.select(
            F.col("id").alias("build_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            cell(F.col("x")).alias("bcx"),
            cell(F.col("y")).alias("bcy"),
        )
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "build_id",
            "bx",
            "by",
            (F.col("bcx") + F.col("dx")).alias("cx"),
            (F.col("bcy") + F.col("dy")).alias("cy"),
        )
    )
    if broadcast_build:
        b = F.broadcast(b)
    dist_sq = (F.col("bx") - F.col("px")) * (F.col("bx") - F.col("px")) + (
        F.col("by") - F.col("py")
    ) * (F.col("by") - F.col("py"))
    return (
        p.join(b, ["cx", "cy"])
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= F.lit(int(radius) * int(radius)).cast("long"))
        .select("build_id", "probe_id", "dist_sq")
    )
