"""Format readers/writers + layout-aware sinks.

The reference has no file formats at all (state lives in Redis, data in
AMQP messages — SURVEY.md §2C); an analytics engine needs them, and at
100 TB the *layout* decisions are the performance decisions:

- `write_partitioned`: hive-style directory partitioning → partition
  pruning at read (PartitionFilters in the scan, zero I/O for pruned
  partitions).
- `write_bucketed_table`: pre-shuffled bucket layout on the join/agg key →
  repeated joins/aggs on that key skip their Exchange entirely
  (tests/test_plans.py asserts the no-Exchange plan).
- csv/json readers take explicit schemas — schema inference is a full
  extra pass over 100 TB and type-unstable; never rely on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {},
    "orc": {},
}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read `path` in `fmt`. For text formats a schema is required: type
    inference costs a full extra scan and infers unstable types."""
    if fmt not in _READ_DEFAULTS:
        raise ValueError(f"unsupported format {fmt!r}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema")
    opts = {**_READ_DEFAULTS[fmt], **options}
    reader = spark.read.format(fmt).options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_any(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite",
    **options: str,
) -> None:
    df.write.format(fmt).mode(mode).options(**options).save(path)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout; filters on partition columns prune
    directories at planning time (no file I/O for pruned values). Keep
    partition-key cardinality moderate (≤ ~10k) — tiny partitions turn
    into a small-files problem at scale."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_by).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    Both sides of a join bucketed on the join key with equal bucket counts
    read co-located: the SortMergeJoin plans with NO Exchange — the
    shuffle was paid once at write time and amortizes over every
    subsequent join/agg on that key."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_blob_files(
    df: DataFrame, id_col: str, payload_col: str, out_dir: str,
    suffix: str = ".bin",
) -> None:
    """Executor-side blob sink: one file per row, named ``<id><suffix>``,
    payload written raw (str payloads as UTF-8). The inverse of the
    `binaryFile` source — how opaque media/documents leave a DataFrame
    for systems that want plain files. foreachPartition so every task
    writes ITS rows in parallel and nothing rides through the driver; on
    a cluster `out_dir` is shared/object storage. Caller owns dir
    cleanup (rewrites are not atomic per-file)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = df.select(id_col, payload_col)

    def _write(part):
        for r in part:
            payload = r[1]
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            tmp = os.path.join(out_dir, f".{r[0]}{suffix}.tmp")
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, os.path.join(out_dir, f"{r[0]}{suffix}"))

    rows.foreachPartition(_write)


def compact_small_files(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction (the OPTIMIZE half lakes run nightly):
    rewrite `path` into ceil(total_bytes / target_bytes) files and
    return the new file count. Reads the current footprint from the
    file listing (metadata only), rewrites via repartition — one
    shuffle whose width IS the output layout — then swaps directories.

    Crash-safety contract: the swap is TWO renames, not one atomic op —
    a crash between them leaves `path` absent with the data intact in
    `<path>.old` (manual: rename it back). Leftover `.old`/`.compacting`
    dirs from a crashed run make this function FAIL FAST rather than
    rename onto them; on a real lake, use the manifest-commit protocol
    (flow/engine.StateStore.commit_wave_manifest) or a table format
    whose commits are atomic. Small files are a 100 TB killer twice
    over: open/seek overhead per file at read time, and task-scheduling
    overhead at planning time (one split per tiny file)."""
    import math
    import os
    import shutil

    leftovers = [
        p
        for p in (path.rstrip("/") + ".old", path.rstrip("/") + ".compacting")
        if os.path.exists(p)
    ]
    if leftovers:
        raise RuntimeError(
            f"compact_small_files: leftover dirs from a crashed run: "
            f"{leftovers}; recover or remove them first"
        )
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + ".compacting"
    read_any(spark, path, fmt=fmt).repartition(n_out).write.format(fmt).mode(
        "overwrite"
    ).save(tmp)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_out


def write_audited(
    df: DataFrame, path: str, metrics: dict[str, "object"],
    fmt: str = "parquet", mode: str = "overwrite",
) -> dict[str, object]:
    """Write `df` while collecting audit metrics FROM THE SAME PASS via
    `DataFrame.observe` — row counts, null counts, sums come out of the
    write job itself, so the "how many rows did we just land" audit
    costs zero extra scans (at 100 TB a post-write COUNT(*) re-reads
    everything). Returns {metric_name: value}.

    `metrics` maps names to aggregate Columns (e.g. F.count(F.lit(1)),
    F.sum("x")). Uses a QueryExecutionListener under the hood via the
    Observation helper, which is executor-safe and deterministic for
    accumulator-style aggregates on a successful job."""
    from pyspark.sql import Observation

    obs = Observation()
    names = list(metrics)
    observed = df.observe(obs, *[metrics[n].alias(n) for n in names])
    observed.write.format(fmt).mode(mode).save(path)
    got = obs.get
    return {n: got[n] for n in names}
