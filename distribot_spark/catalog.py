"""Table catalog: parquet directories → DataFrames / temp views.

The driver testdata layout is ``{sf_dir}/{table}.parquet`` (TESTDATA.md).
All reads go through here so pushdown-friendly scans and any future
format/bucketing decisions live in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables: always broadcast-joinable. At any scale factor,
# region/nation are tiny and supplier/customer/part grow slowly relative to
# the fact tables — callers use `broadcast()` on these explicitly where the
# stats may not be visible to Catalyst.
SMALL_DIMS = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown happen at the
    parquet reader as long as callers stay declarative (no early .cache)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
    runtime it surfaces two ways, both handled here so every query sees
    one stable microsecond TimestampType:

    - runtimes whose vectorized reader rejects nanos: the legacy conf
      reads ts as raw int64 nanoseconds, converted with ``DIV 1000`` —
      truncating exactly like DuckDB/Arrow do, so the oracle sees
      identical values;
    - runtimes with native nanos support (pyspark ≥ 4.1.2 in this
      container): ts arrives as TIMESTAMP_NTZ already truncated to
      micros; cast to TimestampType (session TZ is UTC, so the cast is
      value-identity) for parity with the legacy path."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register temp views so ``spark.sql`` can reference tables by name."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
