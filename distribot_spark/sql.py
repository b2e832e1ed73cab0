"""SQL entry point: run ad-hoc SQL over the catalog tables.

The thin `spark.sql` facade (SURVEY §7 M0): registers the testdata tables
as temp views and executes the statement — Catalyst does the rest. This is
the "switch from the reference" API for users who want plain SQL instead
of the declared-query registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distribot_spark.catalog import DEFAULT_SF_DIR, TABLES, register_views


def run_sql(
    spark: SparkSession, sql: str, sf_dir: str = DEFAULT_SF_DIR, tables=TABLES
) -> DataFrame:
    """Register `tables` from `sf_dir` as temp views and run `sql`."""
    register_views(spark, sf_dir, tables)
    return spark.sql(sql)
