"""Kafka-API-shaped broker source: partitioned offset log, consumer-group
offset commits, and crash-induced REDELIVERY — replay-backed, because the
sandbox has no live broker.

The reference's transport backbone is durable AMQP queues with manual
ack: a consumer that dies after processing but before ack gets its
messages redelivered (lib/distribot/connector.rb:56-73,126-138). Kafka
spells the identical contract with (partition, offset) plus committed
consumer-group offsets; this module implements that spelling so the
R30–R31 at-least-once → effectively-once story is demonstrated against a
source that actually redelivers, with real offset bookkeeping:

- ``BrokerLog`` — the broker side: an append-only offset log, one
  sequence per partition, records shaped exactly like Kafka's
  (topic, partition, offset, key, value, ts). Keyed partitioning
  (partition = key mod N) preserves per-key order, as Kafka does.
- ``BrokerReplaySource`` — the consumer side: polls the log in batches,
  commits offsets AFTER processing every ``commit_every`` polls
  (at-least-once), and simulates a consumer crash after poll
  ``crash_after_poll`` — the session's uncommitted tail is REDELIVERED
  when the restarted consumer resumes from the last committed offsets.
  The full delivery sequence (duplicates included) materializes as
  chunked files replayed through Spark's file stream; the commit ledger
  is inspectable (``ledger()``) and contract-tested.

Effectively-once is the CONSUMER's job, exactly as with real Kafka:
dedup on (partition, offset) — the record's physical identity, never its
payload — turns at-least-once delivery into exactly-once results
(queries/streaming.py s19 does this through
``dropDuplicatesWithinWatermark``, the s5 pattern moved down to the
source layer).

100 TB shape: on a cluster this class is swapped for
``spark.readStream.format("kafka")`` — the record schema here is
Kafka's own, so queries written against this adapter run unchanged on
the real source; the commit ledger maps to ``__consumer_offsets`` and
the crash windows to consumer-group rebalances.
"""

from __future__ import annotations

import json
import math
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from distribot_spark.streaming.sources import StreamSource

RECORD_SCHEMA = pa.schema(
    [
        ("topic", pa.string()),
        ("partition", pa.int32()),
        ("offset", pa.int64()),
        ("key", pa.string()),
        ("value", pa.string()),
        ("ts", pa.timestamp("us", tz="UTC")),
    ]
)

#: Spark-side DDL for the JSON payload this module writes for events
EVENT_VALUE_DDL = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"


class BrokerLog:
    """Append-only partitioned offset log (the broker side).

    Layout: ``root/partition=K.parquet`` (sorted by offset) plus
    ``root/meta.json``. Offsets are dense per partition, starting at 0 —
    a record's (partition, offset) is its immutable physical identity,
    which is what downstream dedup keys on.
    """

    def __init__(self, root: str, topic: str = "events", n_partitions: int = 4):
        self.root = root
        self.topic = topic
        self.n_partitions = n_partitions
        os.makedirs(root, exist_ok=True)
        meta = os.path.join(root, "meta.json")
        if not os.path.exists(meta):
            with open(meta, "w") as fh:
                json.dump({"topic": topic, "n_partitions": n_partitions}, fh)

    def _part_path(self, p: int) -> str:
        return os.path.join(self.root, f"partition={p}.parquet")

    def append(self, records: list[dict]) -> None:
        """Append (key, value, ts) records; the broker assigns partition
        (key mod N — keyed partitioning, per-key order preserved) and the
        next dense offset of that partition."""
        by_part: dict[int, list[dict]] = {}
        for r in records:
            p = int(r["key"]) % self.n_partitions
            by_part.setdefault(p, []).append(r)
        # one end_offsets() scan per append, not one per partition (each
        # call reads every partition file — per-partition calls made a
        # P-partition append O(P^2) file reads)
        ends = self.end_offsets()
        for p, rows in by_part.items():
            start = ends.get(p, 0)
            tbl = pa.table(
                {
                    "topic": pa.array([self.topic] * len(rows)),
                    "partition": pa.array([p] * len(rows), pa.int32()),
                    "offset": pa.array(range(start, start + len(rows)), pa.int64()),
                    "key": pa.array([str(r["key"]) for r in rows]),
                    "value": pa.array([r["value"] for r in rows]),
                    "ts": pa.array([r["ts"] for r in rows],
                                   pa.timestamp("us", tz="UTC")),
                },
                schema=RECORD_SCHEMA,
            )
            if os.path.exists(self._part_path(p)):
                old = pq.read_table(self._part_path(p))
                tbl = pa.concat_tables([old, tbl])
            # Atomic replace (the repo's tmp-then-rename discipline,
            # flow/state.py): a crash mid-write leaves the old partition
            # file intact instead of a torn parquet. NOTE: each append
            # rewrites the full partition file — O(n) per append — which
            # is fine for the bounded test broker; a production log would
            # append per-chunk segment files instead.
            tmp = self._part_path(p) + f".tmp.{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, self._part_path(p))

    def records(self) -> pa.Table:
        """Every record, globally ordered by (ts, partition, offset) — the
        deterministic delivery order the replay consumer polls in."""
        parts = [
            pq.read_table(self._part_path(p))
            for p in range(self.n_partitions)
            if os.path.exists(self._part_path(p))
        ]
        if not parts:
            return RECORD_SCHEMA.empty_table()
        t = pa.concat_tables(parts)
        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[("ts", "ascending"), ("partition", "ascending"),
                           ("offset", "ascending")],
            )
        )

    def end_offsets(self) -> dict[int, int]:
        """Next offset to be assigned, per partition (Kafka endOffsets)."""
        out = {}
        for p in range(self.n_partitions):
            if os.path.exists(self._part_path(p)):
                out[p] = pq.read_table(self._part_path(p)).num_rows
        return out


def events_broker_log(sf_dir: str, root: str, n_partitions: int = 4) -> BrokerLog:
    """Deterministic broker log from the events table: key = user_id
    (per-user order preserved by keyed partitioning), value = the event
    as a JSON payload, record ts = event time. Built once and cached."""
    log = BrokerLog(root, topic="events", n_partitions=n_partitions)
    if log.end_offsets():
        return log
    from distribot_spark.streaming.replay import _events_table_us

    t = _events_table_us(sf_dir)
    cols = t.to_pydict()
    records = []
    for i in range(t.num_rows):
        payload = {
            "event_id": cols["event_id"][i],
            "user_id": cols["user_id"][i],
            "event_type": cols["event_type"][i],
            "value": cols["value"][i],
        }
        records.append(
            {
                "key": cols["user_id"][i],
                "value": json.dumps(payload, sort_keys=True),
                "ts": cols["ts"][i],
            }
        )
    # global (ts, event_id) order in; per-partition offsets follow it
    records.sort(key=lambda r: (r["ts"], json.loads(r["value"])["event_id"]))
    log.append(records)
    return log


class BrokerReplaySource(StreamSource):
    """Consumer-group delivery from a ``BrokerLog`` with Kafka semantics
    and an injected crash between processing and offset commit.

    Delivery simulation (all deterministic, materialized once):

    - session 1 polls batches of ``ceil(n / n_polls)`` records in global
      (ts, partition, offset) order, committing offsets after every
      ``commit_every`` polls; it CRASHES after delivering poll
      ``crash_after_poll`` (0-based) without committing it.
    - session 2 resumes from the last committed offsets — every record
      delivered after that commit is delivered AGAIN (the at-least-once
      redelivery window) — then continues to the end of the log,
      committing each poll.

    ``load`` replays the delivered chunks as a bounded file stream of
    Kafka-shaped records. ``ledger()`` exposes the offset commits;
    ``redelivered()`` the (partition, offset) pairs delivered twice.
    """

    bounded = True

    def __init__(
        self,
        log: BrokerLog,
        group: str = "g1",
        n_polls: int = 10,
        commit_every: int = 2,
        crash_after_poll: int = 4,
        max_files_per_trigger: int = 1,
    ) -> None:
        if crash_after_poll >= n_polls:
            raise ValueError("crash_after_poll must fall inside session 1")
        self.log = log
        self.group = group
        self.n_polls = n_polls
        self.commit_every = commit_every
        self.crash_after_poll = crash_after_poll
        self.max_files_per_trigger = max_files_per_trigger
        # v2: the crash poll itself never commits (a commit_every multiple
        # landing on crash_after_poll used to commit the crash poll and
        # empty the redelivery window); versioned tag invalidates cached
        # deliveries materialized under the old semantics
        tag = f"group={group}-p{n_polls}-c{commit_every}-x{crash_after_poll}-v2"
        self.delivery_root = os.path.join(log.root, "delivery", tag)
        self._materialize()

    # -- delivery materialization ------------------------------------------------

    def _polls(self, table: pa.Table) -> list[pa.Table]:
        n = table.num_rows
        size = max(1, math.ceil(n / self.n_polls))
        return [table.slice(i, min(size, n - i)) for i in range(0, n, size)]

    def _materialize(self) -> None:
        done = os.path.join(self.delivery_root, "_done")
        if os.path.exists(done):
            return
        os.makedirs(self.delivery_root, exist_ok=True)
        all_records = self.log.records()
        polls = self._polls(all_records)
        ledger: list[dict] = []
        committed: dict[int, int] = {}
        chunk_idx = 0

        def write_chunk(tbl: pa.Table) -> None:
            nonlocal chunk_idx
            pq.write_table(
                tbl, os.path.join(self.delivery_root, f"chunk_{chunk_idx:04d}.parquet")
            )
            chunk_idx += 1

        def advance(committed: dict, tbl: pa.Table) -> dict:
            out = dict(committed)
            for p, o in zip(tbl["partition"].to_pylist(), tbl["offset"].to_pylist()):
                out[p] = max(out.get(p, 0), o + 1)  # commit = last processed + 1
            return out

        # session 1: delivered polls 0..crash_after_poll; the consumer's
        # POSITION advances every poll but the COMMIT lags (commit_every).
        # The crash lands BETWEEN processing the crash poll and any commit
        # it would have made (i == crash_after_poll never commits), so the
        # crash poll is always inside the redelivery window — otherwise a
        # (crash_after_poll+1) that is a multiple of commit_every would
        # commit the crash poll and the redelivery window would silently
        # be empty, contradicting the class contract.
        position: dict[int, int] = {}
        for i, tbl in enumerate(polls[: self.crash_after_poll + 1]):
            write_chunk(tbl)
            position = advance(position, tbl)
            if (i + 1) % self.commit_every == 0 and i != self.crash_after_poll:
                committed = dict(position)
                ledger.append(
                    {"session": 1, "poll": i,
                     "offsets": {str(k): v for k, v in committed.items()}}
                )
        # CRASH here: polls after the last commit are processed-but-unacked.

        # session 2: restart from the committed offsets — the broker
        # redelivers everything at-or-past them (connector.rb:68 requeue)
        mask = [
            o >= committed.get(p, 0)
            for p, o in zip(all_records["partition"].to_pylist(),
                            all_records["offset"].to_pylist())
        ]
        rest = all_records.filter(pa.array(mask))
        for i, tbl in enumerate(self._polls(rest)):
            write_chunk(tbl)
            committed = advance(committed, tbl)
            ledger.append(
                {"session": 2, "poll": i,
                 "offsets": {str(k): v for k, v in committed.items()}}
            )

        with open(os.path.join(self.delivery_root, "ledger.jsonl"), "w") as fh:
            for entry in ledger:
                fh.write(json.dumps(entry) + "\n")
        with open(done, "w") as fh:
            fh.write("ok")

    # -- consumer-facing API -------------------------------------------------------

    def load(self, spark: SparkSession) -> DataFrame:
        schema = spark.read.parquet(
            os.path.join(self.delivery_root, "chunk_0000.parquet")
        ).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .option("pathGlobFilter", "chunk_*.parquet")
            .parquet(self.delivery_root)
        )

    def ledger(self) -> list[dict]:
        with open(os.path.join(self.delivery_root, "ledger.jsonl")) as fh:
            return [json.loads(line) for line in fh]

    def delivered(self) -> pa.Table:
        """Every delivered record, duplicates included (the chunk union)."""
        files = sorted(
            os.path.join(self.delivery_root, f)
            for f in os.listdir(self.delivery_root)
            if f.startswith("chunk_") and f.endswith(".parquet")
        )
        return pa.concat_tables([pq.read_table(f) for f in files])

    def redelivered(self) -> set[tuple[int, int]]:
        """(partition, offset) pairs delivered more than once — session
        1's processed-but-uncommitted tail, exactly."""
        seen: dict[tuple[int, int], int] = {}
        d = self.delivered()
        for p, o in zip(d["partition"].to_pylist(), d["offset"].to_pylist()):
            seen[(p, o)] = seen.get((p, o), 0) + 1
        return {k for k, v in seen.items() if v > 1}
