"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the config is chosen so the same code is
correct and fast on a 1000-executor cluster against ~100 TB:

- AQE on (runtime join re-planning, skew-join splitting, partition coalesce).
- Arrow enabled for every pandas interchange (pandas UDFs are the only
  Python-side hot path we allow).
- Session timezone pinned to UTC so timestamp semantics match the
  tz-naive parquet testdata and the DuckDB oracle.
- shuffle.partitions is a *starting point*; AQE coalesces small shuffles and
  splits skewed ones, so the same setting scales with input size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "distribot_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit provide it.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- streaming checkpoint manager: the FileContext-based
        #     default resolves every metadata op through Hadoop's
        #     shell-backed local AbstractFileSystem when the native lib
        #     is absent (fork per op); the FileSystem-based manager has
        #     identical rename-based atomicity on local fs and HDFS
        #     (r9 optimization — measured 17 s -> 9 s on the
        #     100-micro-batch engine floor before the fastfs classes
        #     below take it to ~3 s) ---
        .config(
            "spark.sql.streaming.checkpointFileManagerClass",
            "org.apache.spark.sql.execution.streaming.checkpointing."
            "FileSystemBasedCheckpointFileManager",
        )
        # --- correctness / determinism ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: the 100 TB safety net ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(DEFAULT_CPUS)),
        )
        # --- output commit: FileOutputCommitter algorithm 2 commits
        #     task output by rename at TASK commit instead of a serial
        #     driver-side rename pass at JOB commit — the standard
        #     at-scale setting (job commit is O(1), not O(tasks)).
        #     The v1-vs-v2 durability tradeoff (partial task output
        #     visible after a mid-job failure) is moot here: every
        #     table-layer write stages into a private tmp dir and
        #     publishes through the table's own atomic version-link
        #     commit, and streaming offsets ride the checkpoint
        #     manager — Spark's job-level output atomicity is never
        #     what the system relies on. Measured locally: ~0.07 s
        #     saved per dynamic-partition write (0.27 -> 0.17 s), and
        #     the staged MERGE/CDF-replay paths do hundreds per bench ---
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        # --- Python interchange is always Arrow-batched ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scans: vectorized parquet reader + pushdown are default-on;
        #     cap partition bytes so a 100 TB scan yields sane task counts ---
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # keep the UI off in tests (faster startup, no port contention)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    # --- fork-free local filesystem (see distribot_spark/jvm): only
    #     wired when the compiled classes are actually present, and
    #     never overriding an explicit caller conf ---
    extra_conf = dict(extra_conf or {})
    if ("spark.hadoop.fs.file.impl" not in extra_conf
            and "spark.driver.extraClassPath" not in extra_conf):
        from distribot_spark import jvm as _jvm

        cp = _jvm.ensure_fastfs_classpath()
        if cp:
            builder = (
                builder.config("spark.driver.extraClassPath", cp)
                .config("spark.hadoop.fs.file.impl", _jvm.FASTFS_IMPL)
            )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_rows_df(spark: SparkSession, rows, schema):
    """`createDataFrame` for SMALL driver-side row lists, parallelized
    as ONE slice. The default list path spreads even a 2-row list over
    `defaultParallelism` pickled slices, and every downstream action
    then pays a Python-runner roundtrip PER SLICE (~130 ms each in this
    sandbox even with warm reused workers — measured; a `coalesce(1)`
    downstream serializes all of them into one multi-second task).
    One slice = one roundtrip, and driver-side lists are by definition
    small enough for one task. Same verification/conversion semantics
    as the list path (schema must be explicit — RDD-path inference
    would run a sampling job)."""
    rows = rows if isinstance(rows, list) else list(rows)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def cluster_conf(
    executors: int = 1000,
    executor_cores: int = 8,
    target_partition_mb: int = 192,
    input_tb: float = 100.0,
) -> dict[str, str]:
    """Recommended spark-submit conf for the target deployment (N
    executors against ~`input_tb` TB of parquet). Not applied by
    get_spark — pass as `extra_conf` or `--conf` lines; local runs keep
    the small defaults.

    Rationale per key:
    - shuffle.partitions ≈ input / target_partition_mb, floored at 2
      tasks per core so every core has work even post-AQE-coalesce; AQE
      then owns the runtime splits/merges, so this is a ceiling not a
      tuning knob.
    - advisoryPartitionSizeInBytes matches the target so AQE coalesces
      toward uniform ~target-size partitions.
    - autoBroadcastJoinThreshold raised to 256m: on 100 TB facts, every
      dim that fits an executor comfortably SHOULD broadcast (region/
      nation/part-scale dims), and explicit broadcast() hints in the
      operators stay authoritative for the rest.
    - shuffle.service + decommission: executor loss is routine at this
      scale; shuffle data must outlive executors.
    - maxResultSize guards the no-driver-collect discipline (operators
      here never collect data rows; anything hitting this limit is a
      bug, and 2g fails fast instead of OOMing the driver).
    """
    shuffle_parts = max(
        int(input_tb * 1024 * 1024 / target_partition_mb),
        2 * executors * executor_cores,
    )
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": (
            f"{target_partition_mb}m"
        ),
        "spark.sql.autoBroadcastJoinThreshold": "256m",
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.shuffle.service.enabled": "true",
        "spark.decommission.enabled": "true",
        "spark.storage.decommission.shuffleBlocks.enabled": "true",
        "spark.driver.maxResultSize": "2g",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    }
