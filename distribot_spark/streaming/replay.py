"""Deterministic bounded replay of the events table as a file stream.

Chunks the events parquet into k files in event-time order (so watermarks
advance monotonically, like a well-behaved source), with optional
variants:

- ``late_split_ts``: all rows ≥ split go into chunk 0, all rows < split
  into chunk 1 — a deterministic late-data scenario (the second file is
  entirely behind the watermark).
- ``duplicate_last_chunk``: re-appends a copy of the last chunk —
  simulates an at-least-once source redelivering a window of data.

Files are written with µs/UTC timestamps (Spark's watermark machinery
requires TIMESTAMP, and µs matches what the catalog reader produces).
Replay dirs are content-keyed and cached under <repo>/.tmp/replay.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TMP_ROOT = os.path.join(_REPO_ROOT, ".tmp")


def _events_table_us(sf_dir: str) -> pa.Table:
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts = (
        pc.floor_temporal(t["ts"], unit="microsecond")
        .cast(pa.timestamp("us"), safe=False)
        .cast(pa.timestamp("us", tz="UTC"))
    )
    t = t.set_column(t.schema.get_field_index("ts"), "ts", ts)
    return t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))


def replay_dir(
    sf_dir: str,
    n_chunks: int = 8,
    late_split_ts: str | None = None,
    duplicate_last_chunk: bool = False,
    flush_sentinel: bool = False,
) -> str:
    """Build (or reuse) a chunked replay directory; returns its path.

    `flush_sentinel` appends one final chunk holding a single synthetic
    `__flush__` event 3 hours past the stream's max ts: a consumer that
    applies its watermark BEFORE filtering event types gets its watermark
    pushed beyond every real window/join range, so outer-join NULLs and
    final windows emit during the availableNow no-data tail batches —
    the bounded-replay stand-in for a production stream's continuing
    traffic."""
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}-c{n_chunks}"
    if late_split_ts:
        tag += "-late" + late_split_ts.replace(" ", "T").replace(":", "")
    if duplicate_last_chunk:
        tag += "-dup"
    if flush_sentinel:
        tag += "-flush"
    out = os.path.join(TMP_ROOT, "replay", tag)
    if os.path.isdir(out) and os.listdir(out):
        _stamp_replay_order(out)
        return out
    os.makedirs(out, exist_ok=True)

    t = _events_table_us(sf_dir)
    if late_split_ts is not None:
        split = (
            pa.scalar(late_split_ts)
            .cast(pa.timestamp("us"))
            .cast(pa.timestamp("us", tz="UTC"))
        )
        on_time = t.filter(pc.greater_equal(t["ts"], split))
        late = t.filter(pc.less(t["ts"], split))
        chunks = [on_time, late]
    else:
        n = t.num_rows
        chunks = [
            t.slice(i * n // n_chunks, (i + 1) * n // n_chunks - i * n // n_chunks)
            for i in range(n_chunks)
        ]
        if duplicate_last_chunk:
            chunks.append(chunks[-1])
        if flush_sentinel:
            max_ts = pc.max(t["ts"]).cast(pa.int64()).as_py()
            # TWO sentinel chunks: the watermark computed from batch k is
            # APPLIED in batch k+1, so state whose eviction depends on the
            # last watermark advance needs one more (non-empty) batch to
            # actually emit — availableNow does not reliably run a no-data
            # tail batch for it.
            for i, hours in enumerate((3, 4)):
                sentinel_ts = pa.scalar(
                    max_ts + hours * 3600 * 1_000_000, type=pa.int64()
                ).cast(pa.timestamp("us", tz="UTC"))
                chunks.append(
                    pa.table(
                        {
                            "event_id": pa.array([-1 - i], pa.int64()),
                            "ts": pa.array([sentinel_ts.as_py()],
                                           pa.timestamp("us", tz="UTC")),
                            "user_id": pa.array([-1], pa.int64()),
                            "event_type": pa.array(["__flush__"], pa.string()),
                            "value": pa.array([0.0], pa.float64()),
                            "props": pa.array([None], pa.string()),
                        },
                        schema=t.schema,
                    )
                )

    for i, chunk in enumerate(chunks):
        pq.write_table(chunk, os.path.join(out, f"chunk_{i:04d}.parquet"))
    _stamp_replay_order(out)
    return out


_counter = [0]


class _few_state_partitions:
    """Temporarily pin a small shuffle-partition count for a bounded replay.

    A stateful streaming query creates + commits one state store per
    shuffle partition per micro-batch; at the driver's default of 200
    partitions an 8-chunk replay does 1,600 state-store commits to cover a
    few thousand rows. The partition count is baked into the checkpoint at
    query start, so pinning it low here only affects the bounded test
    replay — a production deployment sizes it to its key cardinality.
    """

    def __init__(self, spark: SparkSession, n: int = 8) -> None:
        self.spark = spark
        self.n = str(n)

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class rocksdb_state_store:
    """Run stateful streaming under Spark's bundled RocksDB state store.

    The default HDFS-backed provider keeps every key's state ON-HEAP in
    each executor — fine for bounded replays, a hard ceiling for
    100 TB-scale keyed state (dedup sets, session maps, running stats
    over billions of keys). RocksDB spills state to local SSD with an
    off-heap block cache, which is the provider a production deployment
    of S6/S12/S17-class queries runs on. The provider class is read from
    the session conf at QUERY START and baked into the checkpoint, so
    this context only affects queries started inside it."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def __enter__(self):
        try:
            self.prev = self.spark.conf.get(
                "spark.sql.streaming.stateStore.providerClass"
            )
        except Exception:
            self.prev = None
        self.spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
        return self

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            self.spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", self.prev
            )


def run_bounded(
    spark: SparkSession,
    transform,
    source_dir,
    output_mode: str,
    max_files_per_trigger: int = 1,
    n_sources: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run `transform(stream, ...)` over a bounded replay to completion and
    return the memory-sink result as a batch DataFrame.

    `source_dir` is a chunked-replay directory path or any bounded
    `sources.StreamSource`; `transform` receives `n_sources` independent
    readStream handles over the same source (stream-stream joins need two).
    `checkpoint_dir` pins the checkpoint location AND keeps it after the
    run (callers that inspect state-store artifacts, e.g. the RocksDB
    provider proof); by default a temp checkpoint is used and removed.
    """
    from distribot_spark.streaming.sources import FileReplaySource, StreamSource

    if isinstance(source_dir, StreamSource):
        source = source_dir
        if not source.bounded:
            raise ValueError("run_bounded needs a bounded source; use run_live")
    else:
        source = FileReplaySource(source_dir, max_files_per_trigger)
    streams = [source.load(spark) for _ in range(n_sources)]

    _counter[0] += 1
    name = f"sink_{_counter[0]}_{uuid.uuid4().hex[:8]}"
    os.makedirs(TMP_ROOT, exist_ok=True)
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_", dir=TMP_ROOT)
    with _few_state_partitions(spark):
        out = transform(*streams)
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        q.awaitTermination()
    result = spark.table(name)
    if checkpoint_dir is None:
        shutil.rmtree(checkpoint, ignore_errors=True)
    return result


def run_live(
    spark: SparkSession,
    transform,
    source,
    output_mode: str,
    until,
    timeout_sec: float = 120.0,
    trigger_interval: str = "0.25 seconds",
    poll_sec: float = 0.25,
) -> DataFrame:
    """Drive `transform(stream)` over an UNBOUNDED source until the memory
    sink satisfies `until(result_df) -> bool`, then stop the query and
    return the sink as a batch DataFrame.

    This is the live twin of `run_bounded`: same transform, same sink,
    but the caller decides when "enough of the stream" has been observed
    (an unbounded source has no availableNow completion point). Raises
    TimeoutError if the predicate never holds — with the query stopped, so
    a failing test doesn't leak a running stream.
    """
    import time as _time

    _counter[0] += 1
    name = f"live_{_counter[0]}_{uuid.uuid4().hex[:8]}"
    os.makedirs(TMP_ROOT, exist_ok=True)
    checkpoint = tempfile.mkdtemp(prefix="ckpt_", dir=TMP_ROOT)
    with _few_state_partitions(spark):
        out = transform(source.load(spark))
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(processingTime=trigger_interval)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        try:
            deadline = _time.time() + timeout_sec
            while True:
                if q.exception() is not None:
                    raise q.exception()  # dead query: fail fast, not at timeout
                if until(spark.table(name)):
                    break
                if _time.time() > deadline:
                    raise TimeoutError(
                        f"run_live: predicate not satisfied in {timeout_sec}s"
                    )
                _time.sleep(poll_sec)
        finally:
            q.stop()
            q.awaitTermination()
    result = spark.table(name)
    shutil.rmtree(checkpoint, ignore_errors=True)
    return result


def run_foreach_batch(
    spark: SparkSession,
    transform,
    source_dir: str,
    sink_fn,
    output_mode: str = "complete",
) -> None:
    """Run a bounded stream through a foreachBatch sink (idempotent-MERGE
    pattern: sink_fn(batch_df, batch_id) owns the write)."""
    source_dir = ordered_source_dir(source_dir)  # storage seam
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        source_dir
    )
    checkpoint = tempfile.mkdtemp(prefix="ckpt_", dir=TMP_ROOT)
    with _few_state_partitions(spark):
        out = transform(stream)
        q = (
            out.writeStream.foreachBatch(sink_fn)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(checkpoint, ignore_errors=True)


def table_replay_dir(
    sf_dir: str, table: str, sort_col: str, n_chunks: int = 8
) -> str:
    """Chunked replay dir for ANY catalog table (the generic sibling of
    `replay_dir`'s events-specific path): rows sorted by `sort_col` and
    split into `n_chunks` parquet files — a deterministic stand-in for
    incremental arrival of a batch table (e.g. documents landing in the
    lake). Content-keyed and cached like the events replay."""
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}-{table}-{sort_col}-c{n_chunks}"
    out = os.path.join(TMP_ROOT, "replay", tag)
    if os.path.isdir(out) and os.listdir(out):
        _stamp_replay_order(out)
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))
    t = t.take(pc.sort_indices(t, sort_keys=[(sort_col, "ascending")]))
    n = t.num_rows
    chunks = [
        t.slice(i * n // n_chunks, (i + 1) * n // n_chunks - i * n // n_chunks)
        for i in range(n_chunks)
    ]
    for i, chunk in enumerate(chunks):
        pq.write_table(chunk, os.path.join(out, f"chunk_{i:04d}.parquet"))
    _stamp_replay_order(out)
    return out


def cdf_replay_dir(
    spark,
    table,
    key: str,
    out: str,
    versions_per_trigger: int = 1,
    from_version: int = 0,
    to_version: int | None = None,
    changes_fn=None,
) -> str:
    """Materialize an ACID table's change feed as a chunked replay dir
    — the bounded deterministic stand-in for Delta's ``readChangeFeed``
    streaming source (offset = commit version). Each chunk file (= one
    micro-batch at maxFilesPerTrigger=1) folds ``versions_per_trigger``
    CONSECUTIVE commit versions — Delta's catch-up batching
    (``maxFilesPerTrigger``/``maxBytesPerTrigger`` over the change
    feed): a consumer resuming 10k commits behind reads
    ceil(10k / N) micro-batches instead of 10k. Commit order is
    preserved ACROSS chunks by the stamped strictly-increasing mtimes
    (`_stamp_replay_order`) and INSIDE a chunk by the
    ``_commit_version`` column `table_changes_spark` emits — and the
    per-version change computation (incl. the carried-DV rule) is the
    SAME code whatever the batching factor, which is why
    s30_stream_cdf_catchup can share s24's oracle verbatim. Consumers
    whose fold is order/batching-independent (the signed integer-cents
    discipline, `cdf_shared.cdf_view_deltas`) land on identical state
    at ANY factor; order-sensitive consumers sort on _commit_version
    inside the batch.

    ``changes_fn(spark, table, key, from_version, to_version)``
    overrides the per-range feed builder — e.g. the POLICY-governed
    feed (`acid.table_changes_policy_spark` via a closure binding the
    role), so a governed consumer streams exactly what its role may
    see (s34)."""
    from distribot_spark.sources.acid import table_changes_spark

    if changes_fn is None:
        def changes_fn(spark, table, key, from_version, to_version):
            return table_changes_spark(
                spark, table, key,
                from_version=from_version, to_version=to_version)

    from pyspark.sql import functions as F

    head = table.version()
    hi = head if to_version is None else to_version
    n = max(int(versions_per_trigger), 1)
    os.makedirs(out, exist_ok=True)
    scratch = tempfile.mkdtemp(prefix="cdfchunk_", dir=TMP_ROOT)
    # ONE feed plan + ONE Spark write job for every chunk (r9
    # optimization — guide §1.2). History: the original shape ran one
    # repartition(1)-write job PER commit version; the first r9 pass
    # cut that to one WRITE but still built one changes_fn PLAN per
    # version range (~0.25 s of driver plan construction each, and a
    # union of R subplans for the write to execute). Since
    # `table_changes_spark(lo, hi)` is BY CONSTRUCTION the union of
    # the per-version frames (it loops versions internally, tagging
    # each row with its `_commit_version`), one call over the whole
    # range is row-identical — and the chunk id is pure arithmetic on
    # `_commit_version` (non-negative operands, so DIV is exact floor
    # division in both engines — the s20 discipline). partitionBy
    # lands each chunk id's rows in exactly one parquet file, renamed
    # to the contractual chunk_{j}.parquet names. A version range
    # whose feed is EMPTY (an OPTIMIZE commit: carried rows
    # suppressed) writes no dir under partitionBy — those chunks get a
    # zero-row file of the SAME union schema (what every consumer
    # reads the dir with), one extra limit(0) write for all of them.
    chunk_ids = list(range(len(range(from_version, hi + 1, n))))
    if chunk_ids:
        feed = changes_fn(spark, table, key, from_version, hi)
        tagged = feed.withColumn(
            "_chunk",
            F.expr(f"CAST((_commit_version - {int(from_version)}) "
                   f"DIV {int(n)} AS INT)"),
        )
        tmp = os.path.join(scratch, "all")
        (
            tagged.repartition(len(chunk_ids), "_chunk")
            .write.mode("overwrite").partitionBy("_chunk").parquet(tmp)
        )
        for d in os.listdir(tmp):
            if not d.startswith("_chunk="):
                continue
            j = int(d.split("=")[1])
            part = next(
                p for p in sorted(os.listdir(os.path.join(tmp, d)))
                if p.endswith(".parquet")
            )
            os.rename(os.path.join(tmp, d, part),
                      os.path.join(out, f"chunk_{j:04d}.parquet"))
        missing = [j for j in chunk_ids if not os.path.exists(
            os.path.join(out, f"chunk_{j:04d}.parquet"))]
        if missing:
            tmp0 = os.path.join(scratch, "empty")
            feed.limit(0).repartition(1).write.mode(
                "overwrite").parquet(tmp0)
            part = next(p for p in sorted(os.listdir(tmp0))
                        if p.endswith(".parquet"))
            src = os.path.join(tmp0, part)
            for j in missing:
                # copy, never hardlink: _stamp_replay_order stamps
                # strictly increasing mtimes per FILE, and hardlinks
                # share one inode
                shutil.copyfile(
                    src, os.path.join(out, f"chunk_{j:04d}.parquet"))
    shutil.rmtree(scratch, ignore_errors=True)
    _stamp_replay_order(out)
    return out


def stamp_tree_replay_order(root: str) -> None:
    """`_stamp_replay_order` for a NESTED layout (e.g. the ACID
    dead-letter area: ``quarantine/<batch>/<part>.parquet``): batch
    directories ordered by their existing (mtime, name) — divert
    order — and every data file stamped with strictly increasing
    mtimes, batch-major. Any new replay source must stamp (the s29
    lesson: Spark's file stream orders ties by (mtime, path), and
    files written inside one mtime tick permute silently)."""
    from distribot_spark.sources.storage import get_backend

    dirs = sorted(
        (d for d in os.listdir(root)
         if os.path.isdir(os.path.join(root, d))),
        key=lambda d: (os.stat(os.path.join(root, d)).st_mtime, d),
    )
    ordered = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(os.path.join(root, d)))
        if f.endswith(".parquet")
    ]
    get_backend().stamp_arrival_order(root, ordered)


def ordered_source_dir(src: str) -> str:
    """Resolve a replay directory to one whose LISTING order equals its
    recorded ARRIVAL order (the `_arrival.json` manifest).

    On a backend that controls mtimes (POSIX) the directory is already
    correctly ordered — returned as-is, zero cost. On an object-store
    backend, listing mtimes are upload times the pipeline does not
    control, so the consumer restores order from the manifest into
    NODE-LOCAL staging: files hardlink (or copy) into a scratch dir
    named ``<seq>_<name>`` with locally-stamped increasing mtimes, and
    Spark's built-in file source streams the scratch. This is the
    ingest-coordinator staging step of an AutoLoader-style ledger
    design (the ledger — the manifest — is the contract; local disk is
    where a consumer may lawfully use POSIX again). The scratch is
    content-keyed on the manifest, so repeat runs reuse it; the
    zero-copy hardlinks mean staging moves metadata, not data. The
    true streaming-scale consumer that needs no staging at all is
    `streaming.manifest_source.ManifestReplaySource`."""
    import hashlib
    import time

    from distribot_spark.sources.storage import get_backend

    be = get_backend()
    if be.trusts_mtime:
        return src
    order = be.arrival_order(src)
    tag = hashlib.md5(("\n".join(order) + src).encode()).hexdigest()[:10]
    out = os.path.join(TMP_ROOT, "staged",
                       f"{os.path.basename(src.rstrip('/'))}-{tag}")
    os.makedirs(out, exist_ok=True)
    t0 = time.time() - 86400
    for i, name in enumerate(order):
        dst = os.path.join(out, f"{i:06d}_{os.path.basename(name)}")
        if not os.path.exists(dst):
            try:
                os.link(os.path.join(src, name), dst)
            except OSError:
                shutil.copy2(os.path.join(src, name), dst)
        os.utime(dst, (t0 + i, t0 + i))
    return out


def _stamp_replay_order(out: str) -> None:
    """Make micro-batch ARRIVAL ORDER contractual: Spark's file stream
    orders files by (modification time, path), and sequential writes
    can land inside one timestamp tick — two chunks then tie and sort
    non-path-wise, which silently permutes batch order (caught by the
    s29 identity oracle: the id SET stayed exact while per-row ids
    moved). The storage seam records the order EXPLICITLY in an
    ``_arrival.json`` manifest (the object-store-portable contract —
    listing mtimes are upload times a pipeline does not control) and,
    on POSIX, additionally stamps strictly increasing mtimes in path
    order so Spark's built-in file source observes the same order."""
    from distribot_spark.sources.storage import get_backend

    names = [f for f in sorted(os.listdir(out)) if f.endswith(".parquet")]
    get_backend().stamp_arrival_order(out, names)


def orders_cdc_replay_dir(sf_dir: str, n_chunks: int = 8) -> str:
    """Chunked replay of a deterministic CDC append-log over `orders`:
    every row arrives once as version 1 (key order), then keys whose
    md5(o_orderkey) hex prefix is 'f' (~1/16) get a version-2 update
    with doubled o_totalprice — updates land in later chunks than their
    originals by construction (log sorted by version, then key).
    Content-keyed and cached like the other replay dirs."""
    import hashlib

    tag = f"{os.path.basename(sf_dir.rstrip('/'))}-orders-cdc-c{n_chunks}"
    out = os.path.join(TMP_ROOT, "replay", tag)
    if os.path.isdir(out) and os.listdir(out):
        _stamp_replay_order(out)
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("o_orderkey", "ascending")]))
    keys = t["o_orderkey"].to_pylist()
    prices = t["o_totalprice"].to_pylist()
    log_keys, log_prices, log_vers = list(keys), list(prices), [1] * len(keys)
    for k, p in zip(keys, prices):
        if hashlib.md5(str(k).encode()).hexdigest()[0] == "f":
            log_keys.append(k)
            log_prices.append(p * 2.0)
            log_vers.append(2)
    log = pa.table(
        {
            "o_orderkey": pa.array(log_keys, pa.int64()),
            "o_totalprice": pa.array(log_prices, pa.float64()),
            "version": pa.array(log_vers, pa.int32()),
        }
    )
    n = log.num_rows
    chunks = [
        log.slice(i * n // n_chunks, (i + 1) * n // n_chunks - i * n // n_chunks)
        for i in range(n_chunks)
    ]
    for i, chunk in enumerate(chunks):
        pq.write_table(chunk, os.path.join(out, f"chunk_{i:04d}.parquet"))
    _stamp_replay_order(out)
    return out
