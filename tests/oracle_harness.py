"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and compares
(row count, column names, order-insensitive canonical values) so parity
failures surface before the driver's CORRECTNESS gate runs.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pandas as pd

from distribot_spark.catalog import TABLES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _canon(v):
    """Canonicalize a cell so Spark and DuckDB values hash identically."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int, bool, str)):
        return v
    return str(v)


def canon_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, canonicalize cells, sort rows."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, out


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    scols, srows = canon_rows(spdf)
    ocols, orows = canon_rows(oracle_pdf)
    if scols != ocols:
        problems.append(f"columns differ: spark={scols} oracle={ocols}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    n_diff = 0
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            n_diff += 1
            if n_diff <= 3:
                problems.append(f"row {i}: spark={a} oracle={b}")
    if n_diff > 3:
        problems.append(f"... {n_diff} differing rows total")
    return problems
