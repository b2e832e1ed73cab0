"""Ordered-funnel analysis over an event stream.

`funnel_stages` computes, per user, the earliest timestamp at which each
funnel step was reached IN ORDER (step i counts only at/after the user's
step i-1 time — an out-of-order purchase before any click does not
advance the funnel). This is the conversion-funnel primitive the
reference's analytics mandate implies for the `events` table; engines
with MATCH_RECOGNIZE express it as a row-pattern, Spark as chained
conditional window minimums.

Scale shape: ONE shuffle on the user key; the chained per-step minimums
are consecutive Window operators over the same partitioning (no
re-exchange between steps), and the final per-user collapse reuses the
hash partitioning, so step count adds window passes, not shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Per-user ordered funnel: for each step name in `steps`, the column
    `<step>_ts` holds the earliest event time of that type at/after the
    previous step's time (NULL once the chain breaks), and `depth` is the
    number of consecutive steps reached (0..len(steps)).

    Equal timestamps count as progression (ts >= prev), matching the
    common analytics convention for same-instant batched events; the
    oracle spells the identical >= semantics. With `within` (an SQL
    interval string like "1 hour"), each step must also land AT OR
    BEFORE prev + within — the conversion-window variant.
    """
    w = Window.partitionBy(user_col)
    out = df
    stage_cols: list[str] = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if stage_cols:
            cond = cond & (F.col(ts_col) >= F.col(stage_cols[-1]))
            if within is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= F.col(stage_cols[-1]) + F.expr(f"INTERVAL {within}")
                )
        col = f"__stage_{i}"
        out = out.withColumn(
            col, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        stage_cols.append(col)

    # ascending wrap order leaves the DEEPEST stage's when() outermost
    depth = F.lit(0)
    for i, c in enumerate(stage_cols):
        depth = F.when(F.col(c).isNotNull(), F.lit(i + 1)).otherwise(depth)

    aggs = [
        F.min(c).alias(f"{steps[i]}_ts") for i, c in enumerate(stage_cols)
    ] + [F.min(depth.cast("int")).alias("depth")]
    return out.groupBy(user_col).agg(*aggs)
