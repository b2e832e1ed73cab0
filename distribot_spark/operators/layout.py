"""Z-order (Morton) data layout — multi-dimensional clustering for
file skipping.

The 100 TB problem: parquet row-group/file skipping works off per-file
min/max stats, and a single-column sort only clusters ONE predicate
column — a query filtering on (customer, date) still touches every file.
Interleaving the bits of both dimensions into one sort key (the Morton
curve) makes files cover small RECTANGLES of the 2-D key space, so a box
predicate touches O(perimeter) files instead of all of them. This is the
same layout primitive Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY`.

Everything here is exact integer arithmetic (quantize by integer
division, interleave via DIV/%/multiply-add) so the z-value is
oracle-checkable: `interleave_expr` emits the SAME formula for Spark
(`DIV`) and DuckDB (`//`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleave_expr(a: str, b: str, bits: int, div_op: str) -> str:
    """SQL for the Morton interleave of two already-quantized nonneg
    ints in [0, 2^bits): bit i of `a` lands at position 2i, bit i of
    `b` at 2i+1. Pure DIV/%/multiply-add — exact in int64 for
    bits <= 16 (z < 2^32), identical across engines."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a}) {div_op} {1 << i}) % 2) * {4 ** i}")
        terms.append(f"((({b}) {div_op} {1 << i}) % 2) * {2 * (4 ** i)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def quantize_expr(x: str, xmin: str, xmax: str, bits: int, div_op: str) -> str:
    """Map x in [xmin, xmax] to [0, 2^bits): ((x-min) * (2^bits - 1))
    {div} (max - min + 1). Integer end to end — no float rounding to
    disagree on."""
    top = (1 << bits) - 1
    return f"((({x}) - ({xmin})) * {top}) {div_op} (({xmax}) - ({xmin}) + 1)"


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, out: str = "zval"
) -> DataFrame:
    """Add the z-value of (col_a, col_b) (integral columns). Min/max
    bounds come from one tiny agg broadcast to every row — at scale this
    is a metadata-priced pre-pass (or use static domain bounds)."""
    bounds = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )
    qa = quantize_expr(col_a, "_amin", "_amax", bits, "DIV")
    qb = quantize_expr(col_b, "_bmin", "_bmax", bits, "DIV")
    return (
        df.join(F.broadcast(bounds))
        # stage the quantized dims as their own columns so the 2*bits
        # interleave terms reference a cheap attribute, not an inlined
        # re-computation per term
        .withColumn("_qa", F.expr(qa))
        .withColumn("_qb", F.expr(qb))
        .withColumn(out, F.expr(interleave_expr("_qa", "_qb", bits, "DIV")))
        .drop("_amin", "_amax", "_bmin", "_bmax", "_qa", "_qb")
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int
) -> None:
    """OPTIMIZE-style rewrite: range-partition on the z-value and write
    `n_files` parquet files whose (col_a, col_b) bounding boxes tile the
    key space — per-file footer stats then let any engine skip files for
    2-D box predicates. Range partitioning keeps files balanced; the
    in-file sort keeps row groups skippable too."""
    (
        with_zvalue(df, col_a, col_b)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
