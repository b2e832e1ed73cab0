"""As-of (point-in-time) join — an operator Spark's API lacks natively.

Semantics: for each left row, attach the single right row with the
greatest right.ts ≤ left.ts within the same key (optionally within a
tolerance window).

Implementation is the scalable union-merge composition, NOT a range
cross-join: tag both sides, union, and take a running `last(right value,
ignorenulls)` over (key ORDER BY ts, side) — one shuffle + one sort,
O(n log n) per key regardless of how many right rows precede each left
row. A range-condition join would explode to O(left × right-per-key).

At 100 TB both inputs shuffle once on the key; skewed keys are handled by
AQE, and the sort is the same sort a SMJ would do anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before its timestamp (per key). `tolerance` (e.g. '1 hour') bounds how
    stale the match may be; matches older than that become nulls.

    ``tie_breaker`` names a right column appended to the window ordering so
    two right rows with identical (key, ts) resolve deterministically (the
    greatest tie_breaker value wins). Without it, F.last() over the tied
    frame is partition-order-dependent — pass one whenever right.ts is not
    unique per key. Callers' oracles must mirror the same tie-break
    (ORDER BY ts DESC, tie_breaker DESC with ROW_NUMBER = 1).
    """
    lcols = left.columns
    tb_type = right.schema[tie_breaker].dataType if tie_breaker else None
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *([F.lit(None).cast(tb_type).alias("__tb")] if tie_breaker else []),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            tagged_left.schema["__left"].dataType
        ).alias("__left"),
        *[F.col(c) for c in right_cols],
        F.col(right_ts).alias("__rts"),
        *([F.col(tie_breaker).alias("__tb")] if tie_breaker else []),
    )
    merged = tagged_left.unionByName(tagged_right)

    # right rows (side=0) sort before left rows (side=1) at equal ts, so a
    # left row can match a right row with the exact same timestamp; __tb
    # (ascending → greatest wins under F.last) makes equal-ts right rows
    # deterministic
    order_cols = ["__ts", "__side", "__rts"] + (["__tb"] if tie_breaker else [])
    w = (
        Window.partitionBy("__k")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "__side",
        "__left",
        "__ts",
        F.last("__rts", ignorenulls=True).over(w).alias("__matched_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    ).filter(F.col("__side") == 1)

    if tolerance is not None:
        within = F.col("__matched_ts") >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        carried = carried.select(
            "__left",
            *[F.when(within, F.col(c)).alias(c) for c in right_cols],
        )
    else:
        carried = carried.select("__left", *right_cols)

    return carried.select(*[F.col(f"__left.{c}").alias(c) for c in lcols],
                          *right_cols)
