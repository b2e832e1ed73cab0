"""Manifest-ordered streaming source (the object-store replay path).

Spark's built-in file stream orders micro-batches by ``(modification
time, path)`` — a contract an object store cannot honor (listing
mtimes are upload-completion times: multipart retries and parallel
uploads finish out of order). The storage seam therefore records
arrival order EXPLICITLY in an ``_arrival.json`` manifest
(`sources.storage.StorageBackend.stamp_arrival_order`), and this
module is the consumer that trusts ONLY the manifest: a PySpark
Python Data Source whose offsets are indices into the manifest — the
AutoLoader/file-ledger design (files are discovered through a ledger,
never through listing order).

Scale shape: offsets advance one file per micro-batch (replay pacing
≡ ``maxFilesPerTrigger=1``); each file is read executor-side via
pyarrow in its own input partition, so the driver moves only file
NAMES. Bounded replay drives the query with a fast processing-time
trigger and stops at the manifest end (`run_manifest_bounded`) —
Spark's availableNow falls back to single-batch execution for Python
sources, which would collapse the per-chunk batch structure watermark
tests rely on.

No reference analog (the reference replays queues through AMQP
redelivery); this is the Spark-native equivalent of its
connector-seam replay (lib/distribot/connector.rb:56-138).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from distribot_spark.sources.storage import ARRIVAL_MANIFEST
from distribot_spark.streaming.sources import StreamSource

FORMAT_NAME = "manifest_replay"


def _load_manifest(path: str) -> list[str]:
    with open(os.path.join(path, ARRIVAL_MANIFEST)) as fh:
        return list(json.load(fh)["order"])


def _make_datasource_class():
    """Build the DataSource class lazily (pyspark.sql.datasource import
    kept out of module import time — the registry imports this module
    on every session)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _FilePartition(InputPartition):
        def __init__(self, path: str) -> None:
            self.path = path

    class _ManifestStreamReader(DataSourceStreamReader):
        def __init__(self, options) -> None:
            self.root = options["path"]
            self.files = _load_manifest(self.root)
            # pacing cursor and the RESTART FLOOR: the cursor is
            # in-memory (a restarted query builds a fresh reader), so
            # after a checkpoint restore the engine's offsets can be
            # AHEAD of the cursor. The floor — the highest offset ever
            # seen in partitions()/commit(), i.e. learned from the
            # engine's own restored state — clamps both sides: the
            # cursor jumps past it (no stall), and the batch slice
            # never re-emits files below it (no replay duplicates),
            # even through the one odd engine batch whose restored
            # start exceeds this instance's first latest.
            self._cur = 0
            self._floor = 0

        def initialOffset(self):
            return {"i": 0}

        def latestOffset(self):
            # one manifest entry per micro-batch: bounded replay keeps
            # the per-chunk batch structure (watermarks advance chunk
            # by chunk, as the mtime-ordered file source did)
            self._cur = min(max(self._cur, self._floor) + 1,
                            len(self.files))
            return {"i": self._cur}

        def partitions(self, start, end):
            s, e = int(start["i"]), int(end["i"])
            lo = max(s, self._floor)  # never re-emit restored progress
            # advance the floor only past START here: the batch's own
            # END is learned in commit(). Raising it to `end` now would
            # return an EMPTY slice if the engine re-plans the same
            # uncommitted range on this reader instance — silently
            # dropping those files instead of replaying them.
            self._floor = max(self._floor, s)
            return [
                _FilePartition(os.path.join(self.root, f))
                for f in self.files[lo:e]
            ] or [_FilePartition("")]

        def read(self, partition):
            if not partition.path:
                return
            import pyarrow.parquet as pq

            # executor-side columnar read; rows stream out as arrow
            # batches (PySpark accepts RecordBatch yields — the
            # vectorized path)
            for batch in pq.read_table(partition.path).to_batches():
                yield batch

        def commit(self, end) -> None:
            self._floor = max(self._floor, int(end["i"]))

    class ManifestReplayDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return FORMAT_NAME

        def schema(self):
            raise NotImplementedError(
                "pass an explicit schema (read one parquet footer)")

        def streamReader(self, schema):
            return _ManifestStreamReader(self.options)

    return ManifestReplayDataSource


def _ensure_registered(spark: SparkSession) -> None:
    if getattr(spark, "_manifest_replay_registered", False):
        return
    spark.dataSource.register(_make_datasource_class())
    spark._manifest_replay_registered = True


class ManifestReplaySource(StreamSource):
    """Bounded replay whose batch order comes from ``_arrival.json``
    alone — correct on any backend, adversarial mtimes included."""

    bounded = True

    def __init__(self, source_dir: str, schema=None) -> None:
        self.source_dir = source_dir
        self.schema = schema

    def load(self, spark: SparkSession) -> DataFrame:
        _ensure_registered(spark)
        schema = self.schema
        if schema is None:
            first = _load_manifest(self.source_dir)[0]
            schema = spark.read.parquet(
                os.path.join(self.source_dir, first)).schema
        return (
            spark.readStream.format(FORMAT_NAME)
            .schema(schema)
            .option("path", self.source_dir)
            .load()
        )


def run_manifest_bounded(
    spark: SparkSession,
    transform,
    source_dir: str,
    output_mode: str,
    n_sources: int = 1,
    timeout_sec: float = 300.0,
) -> DataFrame:
    """`replay.run_bounded` twin for the manifest source: drive with a
    fast processing-time trigger and stop once every source's end
    offset reaches the manifest end and a no-new-data batch has run
    (the stand-in for availableNow, which Python sources execute as
    one collapsed batch)."""
    import shutil
    import tempfile

    from distribot_spark.streaming.replay import (
        TMP_ROOT,
        _few_state_partitions,
    )

    n_files = len(_load_manifest(source_dir))
    streams = [
        ManifestReplaySource(source_dir).load(spark)
        for _ in range(n_sources)
    ]
    name = f"msink_{uuid.uuid4().hex[:8]}"
    os.makedirs(TMP_ROOT, exist_ok=True)
    checkpoint = tempfile.mkdtemp(prefix="mckpt_", dir=TMP_ROOT)
    with _few_state_partitions(spark):
        out = transform(*streams)
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(processingTime="50 milliseconds")
            .option("checkpointLocation", checkpoint)
            .start()
        )
        try:
            deadline = time.time() + timeout_sec
            done_at = None
            done_batch = None
            while True:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"manifest replay did not drain in {timeout_sec}s")
                p = q.lastProgress
                if p and p.get("sources"):
                    ends = []
                    for s in p["sources"]:
                        e = s.get("endOffset")
                        if isinstance(e, str):
                            # the engine may store the offset dict as
                            # JSON or as its Python repr
                            try:
                                e = json.loads(e)
                            except json.JSONDecodeError:
                                import ast

                                e = ast.literal_eval(e)
                        ends.append(int((e or {}).get("i", 0)))
                    bid = int(p.get("batchId", -1))
                    if min(ends) >= n_files:
                        if done_at is None:
                            done_at = time.time()
                            done_batch = bid
                        # drain once a FURTHER batch ran past the last
                        # data batch (no-data batches apply the final
                        # watermark) or, for stateless queries that
                        # run none, after a short grace
                        if bid > done_batch + 1 or (
                                time.time() - done_at > 3.0):
                            break
                time.sleep(0.1)
        finally:
            q.stop()
    result = spark.table(name)
    shutil.rmtree(checkpoint, ignore_errors=True)
    return result
