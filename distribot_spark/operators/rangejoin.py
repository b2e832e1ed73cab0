"""Scale-safe range join: points matched into intervals via bin bucketing.

The naive plan for `p.point BETWEEN i.start AND i.end` is a broadcast
nested-loop (fine only while intervals fit in one broadcast) or, worse, a
cartesian product — both die at 100 TB. The bucketed rewrite turns the
theta join into an EQUI-join Spark can shuffle/hash out-of-core at any
cardinality:

1. each interval is exploded to every fixed-width bin it overlaps
   (`sequence(floor(start/w), floor(end/w))` — pure Catalyst, no UDF);
2. each point lands in exactly ONE bin (`floor(point/w)`);
3. equi-join on the bin id, then the exact `start <= point < end` filter
   refines the per-bin candidates.

No duplicate results by construction: a (point, interval) pair can only
meet in the point's single bin. Cost model: interval replication is
`len/w + 1` rows per interval and per-bin candidate volume is
`points_per_bin × intervals_overlapping_bin`, so pick `w` near the median
interval length — long-tail intervals replicate more but remain
equi-join work, and AQE's skew split handles a hot bin. This is the same
rewrite Databricks exposes as range-join bin hints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int | float,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    `start <= point < end` (half-open), via the binned equi-join rewrite.

    `point_col` / `start_col` / `end_col` must be numeric (cast
    timestamps to epoch or day numbers first) and the two inputs must not
    share column names. Returns points+intervals columns, `_bin` dropped.
    """
    def nbin(c):
        return F.floor(F.col(c) / F.lit(bin_width)).cast("long")

    i = intervals.withColumn(
        "_bin", F.explode(F.sequence(nbin(start_col), nbin(end_col)))
    )
    p = points.withColumn("_bin", nbin(point_col))
    return (
        p.join(i, "_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )
