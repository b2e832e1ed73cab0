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

    PRECONDITION: intervals must satisfy start <= end. An inverted
    interval still returns no matches (the refine filter is
    unsatisfiable) but explodes a DESCENDING bin sequence in Spark where
    a SQL oracle's generate_series would be empty — wasted candidates
    and a cross-engine row-shape difference if an oracle ever counts the
    candidate stage. See CLAUDE.md's sequence/generate_series note.
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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join interval relation `a` to interval relation `b` on
    CLOSED-interval overlap (`a_start <= b_end AND b_start <= a_end`),
    via the same binned equi-join rewrite as `point_in_interval_join` —
    the plan stays a shuffled hash join at any cardinality instead of a
    broadcast-nested-loop/cartesian theta join.

    Columns must be integral (epoch microseconds recommended: exact in
    int64, `DIV` bin math has no float rounding). Each side explodes to
    the bins its interval touches; candidates meet on the bin id; the
    exact overlap predicate refines. De-duplication is positional, not a
    DISTINCT: a surviving pair is kept only in the bin containing
    `greatest(a_start, b_start)` — for an overlapping pair that bin lies
    in BOTH sides' bin ranges (max(starts) <= min(ends)), and it is
    unique, so every overlapping pair appears exactly once. Replication
    factor is `len/bin_width + 1` per interval; choose bin_width near
    the median interval length and let AQE skew-split any hot bin.
    """
    def bins(s, e):
        return F.explode(
            F.sequence(
                F.expr(f"{s} DIV {bin_width}"), F.expr(f"{e} DIV {bin_width}")
            )
        )

    ae = a.withColumn("_bin", bins(a_start, a_end))
    be = b.withColumn("_bin", bins(b_start, b_end))
    return (
        ae.join(be, "_bin")
        .filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (
                F.col("_bin")
                == F.expr(f"greatest({a_start}, {b_start}) DIV {bin_width}")
            )
        )
        .drop("_bin")
    )
