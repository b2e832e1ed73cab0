"""Single-pass table profiling (data-quality audit, deequ-style).

`profile_table` computes per-column row/null/distinct counts plus typed
min/max in ONE aggregation over the table, then unpivots the wide row to
long format driver-side-free (the stack runs on the 1-row agg result).

Scale: the multi-countDistinct aggregate plans as Spark's Expand (one
input row fans to one row per distinct-aggregate), so cost is
n_profiled_columns × scan — the standard exact-profile shape. At 100 TB
swap `exact_distinct=False` to plan HLL sketches
(`approx_count_distinct`) instead: no Expand, one pass, ±2%.

Determinism: counts are exact integers; numeric min/max are picked
values (no arithmetic — exact doubles); string min/max use binary
collation in both engines; date/timestamp min/max are formatted to the
repo's microsecond pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str). Numeric columns fill the *_num slots (exact doubles),
    strings fill *_str, temporals format into *_str; the unused pair is
    NULL."""
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs: list = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        dt = schema[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(dt, T.NumericType):
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
        elif isinstance(
            dt, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            aggs.append(F.date_format(F.min(c), _TS_FMT).alias(f"__ms_{c}"))
            aggs.append(F.date_format(F.max(c), _TS_FMT).alias(f"__xs_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__ms_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__xs_{c}"))
    wide = df.agg(*aggs)

    def _field(prefix: str, c: str, numeric: bool):
        name = f"__{prefix}_{c}"
        if name in wide.columns:
            return F.col(name)
        return F.lit(None).cast("double" if numeric else "string")

    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            _field("mn", c, True).alias("min_num"),
            _field("mx", c, True).alias("max_num"),
            _field("ms", c, False).alias("min_str"),
            _field("xs", c, False).alias("max_str"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*stacked)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )
