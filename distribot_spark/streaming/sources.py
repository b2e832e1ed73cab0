"""Pluggable streaming source adapters (reference R30/R31 pub/sub mapping).

The reference consumes task/event queues through one Connector abstraction
(lib/distribot/connector.rb:56-138): a consumer neither knows nor cares
whether the bytes arrive from RabbitMQ or a replayed fixture. This module
is that seam for the Spark engine: every streaming query takes a
``StreamSource`` and calls ``load(spark)``; swapping file-replay for a
live source is a constructor change, not a query change.

Implementations:

- ``FileReplaySource`` — bounded, deterministic chunked-parquet replay
  (the oracle-checkable path; see streaming/replay.py). At scale this is
  also the "backfill from the lake" source.
- ``RateEventsSource`` — unbounded synthetic stream mapped onto the
  events-table schema. Built on Spark's ``rate-micro-batch`` source, so
  row content is a pure function of the row counter: event attributes are
  deterministic even though arrival timing is not. This is the
  "soak-test / demo" source and the unbounded input for continuous
  flows.
- Anything else (Kafka, socket) plugs in by implementing ``load`` — the
  query code stays identical.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamSource(abc.ABC):
    """A factory for streaming DataFrames with a declared boundedness.

    ``bounded`` tells runners whether ``availableNow`` replay-to-completion
    semantics apply (file replay) or the query must be driven live and
    stopped explicitly (rate, Kafka, ...).
    """

    bounded: bool = False

    @abc.abstractmethod
    def load(self, spark: SparkSession) -> DataFrame:
        """Return a fresh streaming DataFrame for this source."""


class FileReplaySource(StreamSource):
    """Bounded chunked-file replay — the deterministic/oracle path.

    ``schema`` defaults to the directory's parquet schema (one driver-side
    footer read; streaming file sources require an explicit schema).
    """

    bounded = True

    def __init__(self, source_dir: str, max_files_per_trigger: int = 1,
                 schema=None) -> None:
        self.source_dir = source_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.schema = schema

    def load(self, spark: SparkSession) -> DataFrame:
        from distribot_spark.streaming.replay import ordered_source_dir

        # storage seam: under an object-store backend, listing order is
        # not arrival order — restore it from the _arrival.json
        # manifest into node-local staging (no-op on POSIX)
        src = ordered_source_dir(self.source_dir)
        schema = self.schema or spark.read.parquet(src).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(src)
        )


class DlqFileSource(StreamSource):
    """File-stream over an ACID table's DEAD-LETTER area
    (``quarantine/<batch>/<part>.parquet`` — nested, so the source
    reads recursively): the tail an expectations pipeline runs for
    alerting and auto-reprocess, instead of polling `read_quarantine`
    batch reads. New quarantine batches appear as new files and flow
    as micro-batches; the DLQ's at-least-once contract carries over
    unchanged (consumers dedup by key, the s28 discipline). Bounded
    when used with availableNow (run_bounded); the same source tails
    LIVE under a processing-time trigger (run_live) — arrival order
    across pre-existing batches must be stamped first
    (`replay.stamp_tree_replay_order`, the s29 mtime-tie lesson).
    ``schema`` may be passed explicitly for an EMPTY-so-far DLQ."""

    bounded = True

    def __init__(self, qroot: str, max_files_per_trigger: int = 1,
                 schema=None) -> None:
        self.qroot = qroot
        self.max_files_per_trigger = max_files_per_trigger
        self.schema = schema

    def load(self, spark: SparkSession) -> DataFrame:
        schema = self.schema or (
            spark.read.option("mergeSchema", "true")
            .option("recursiveFileLookup", "true")
            .parquet(self.qroot).schema
        )
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .option("recursiveFileLookup", "true")
            .parquet(self.qroot)
        )


#: event_type cycle for RateEventsSource; mirrors the testdata generator's
#: categories so rate-fed queries exercise the same group-by cardinality.
_EVENT_TYPES = ("click", "view", "purchase")


class RateEventsSource(StreamSource):
    """Unbounded events-shaped stream from the ``rate-micro-batch`` source.

    Every emitted column is a pure function of the monotone row counter
    ``value`` (0, 1, 2, ...): the k-th row is identical across runs, only
    how many rows have arrived varies. That property lets a test (or an
    audit job) recompute the exact expected aggregate for "the first K
    rows" after stopping the query — determinism-by-construction rather
    than determinism-by-replay.

    Event time advances ``step_seconds`` per row from ``start_ts``,
    decoupled from wall-clock, so watermark/window logic behaves the same
    at any ingest rate.
    """

    bounded = False

    def __init__(
        self,
        rows_per_batch: int = 100,
        num_partitions: int = 4,
        start_ts: str = "2024-01-01 00:00:00",
        step_seconds: int = 60,
        n_users: int = 50,
    ) -> None:
        self.rows_per_batch = rows_per_batch
        self.num_partitions = num_partitions
        self.start_ts = start_ts
        self.step_seconds = step_seconds
        self.n_users = n_users

    def row_expr(self):
        """The counter→event mapping, as Catalyst columns over ``value``.

        Shared by ``load`` (streaming) and ``batch_expected`` (batch
        recompute) so the two can never drift.
        """
        v = F.col("value")
        return [
            (
                F.to_timestamp(F.lit(self.start_ts))
                + F.make_interval(secs=v.cast("int") * self.step_seconds)
            ).alias("ts"),
            v.alias("event_id"),
            F.pmod(v * 7, F.lit(self.n_users)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in _EVENT_TYPES]),
                (F.pmod(v, F.lit(len(_EVENT_TYPES))) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(v * 13, F.lit(1000)).cast("double") / 10.0).alias("value"),
        ]

    def load(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", self.rows_per_batch)
            .option("numPartitions", self.num_partitions)
            .load()
        )
        return raw.select(*self.row_expr())

    def batch_expected(self, spark: SparkSession, n_rows: int) -> DataFrame:
        """Batch DataFrame equal to the stream's first ``n_rows`` rows —
        the ground truth a test compares a stopped query's sink against."""
        return spark.range(n_rows).select(F.col("id").alias("value")).select(
            *self.row_expr()
        )


class SocketJsonSource(StreamSource):
    """Unbounded JSON-lines over TCP — a true NETWORK transport behind the
    same seam (the closest local analogue of the reference's AMQP
    connection, connector.rb:9-54). Each line is parsed against an
    explicit schema; malformed lines become all-null rows rather than
    failing the query (from_json's PERMISSIVE default), matching the
    reference's drop-bad-messages behavior. Spark's socket source is a
    test/dev transport (no replay on reconnect — at-most-once); a
    production deployment swaps in a Kafka source here, changing ONE
    constructor and zero query code.
    """

    bounded = False

    def __init__(self, host: str, port: int, schema: str) -> None:
        self.host = host
        self.port = port
        self.schema = schema

    def load(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("socket")
            .option("host", self.host)
            .option("port", self.port)
            .load()
        )
        return raw.select(
            F.from_json(F.col("value"), self.schema).alias("r")
        ).select("r.*")
