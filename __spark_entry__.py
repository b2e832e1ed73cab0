"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``distribot_spark.queries`` (one registered
entry per operator from SURVEY.md §2); this module just re-exports it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_session_confs(spark: SparkSession) -> None:
    """The driver builds its own SparkSession; pin the runtime-settable
    confs our determinism contract depends on (UTC so date/timestamp
    strings match the tz-naive parquet + DuckDB oracle; AQE on)."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # a driver session left at the 200 default shuffles tiny sf0.01
        # inputs 200 ways and pays 200 state-store commits per streaming
        # micro-batch; 32 matches bench.py / local[32]
        ("spark.sql.shuffle.partitions", "32"),
        # runtime-settable half of the r9 streaming-checkpoint fix
        # (session.py sets it at build time; the driver builds its own
        # session, so pin it here too): the FileContext-based default
        # forks a shell per metadata op without the hadoop native lib
        ("spark.sql.streaming.checkpointFileManagerClass",
         "org.apache.spark.sql.execution.streaming.checkpointing."
         "FileSystemBasedCheckpointFileManager"),
        # task-commit renames instead of a serial job-commit rename
        # pass (r10; see session.py rationale — table writes publish
        # through the table layer's own atomic version links, so
        # Spark's job-level output atomicity is never relied on)
        ("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
         "2"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from distribot_spark.queries import QUERIES

    _ensure_session_confs(spark)
    return QUERIES["q13"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from distribot_spark.queries import queries as _queries

    def wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_session_confs(spark)
            return builder(spark, sf_dir)

        return run

    return {name: wrap(b) for name, b in _queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    from distribot_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
