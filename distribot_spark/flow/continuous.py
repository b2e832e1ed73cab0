"""Continuous-flow mode: a flow spec as a long-lived streaming query.

The reference's flows are open-ended daemon-driven processes — workers
subscribe to their task queues forever (lib/distribot/worker.rb:45-49;
six daemons in Procfile:1-6) and a flow only "ends" when an operator
cancels it. The batch engine (engine.py) maps flows onto a driver-side
wave loop, which is right for bounded enumerate-then-drain phases but
not for that daemon model. This module is the daemon model, Spark-first:

- The task queue is ANY unbounded streaming source (`StreamSource` or a
  raw streaming DataFrame with a ``task_id`` column — same convention as
  DataFrame-enumerate).
- The worker pool is ``applyInPandasWithState`` over shard keys: state
  lives per (flow, shard), so parallelism scales with ``n_shards`` (size
  it to the cluster; state volume per shard is O(paused backlog), not
  O(stream)).
- Phases become PIPELINE STAGES: an unbounded stream has no "phase
  drained" barrier, so each task flows through every handler-bearing
  phase in declared order within one state invocation (handlers of one
  phase all see the same input carry; their outputs merge in declared
  order). This is the semantic translation of "the flow's phase chain"
  to unbounded input — the reference itself never drains a phase under
  an infinite queue either, it just keeps consuming (worker.rb:55-70).
- Live control goes through the SAME control table as the batch engine:
  ``engine.pause/resume/cancel`` write it, and every state invocation
  re-reads it (StateStore.read_control is executor-safe), so control
  lands within one micro-batch without restarting the query:
    pause   → incoming tasks are buffered in shard state (recorded as
              status='buffered' under the `_pending` pseudo-stage) and
              nothing is processed. NOTE the backpressure contract: the
              source keeps feeding while paused, so state grows with the
              backlog — a production pause of long duration should also
              pause the upstream source; this mirrors the reference,
              where paused flows leave tasks accumulating in RabbitMQ.
    resume  → buffered backlog flushes (processing-time timeouts fire
              no-data batches, so the flush does not wait for new input)
              and processing continues.
    cancel  → backlog and new arrivals are dropped with status='canceled'
              rows (the drain the batch engine's cancel does, R11).
- Results never touch the driver: each micro-batch commits its result
  rows to the flow's task log through the same atomic wave-manifest
  protocol as the batch engine, so ``task_results`` accounting is shared
  and foreachBatch's at-least-once replay is absorbed by the
  last-attempt-wins read (state.py task_results).

`transformWithStateInPandas` would be the newer primitive but crashes in
this container (broken protobuf); `applyInPandasWithState` is the
supported path (see CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import threading
import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distribot_spark.flow.engine import CANCELED, FlowEngine, HandlerContext
from distribot_spark.flow.spec import FlowSpec
from distribot_spark.flow.state import StateStore

#: pseudo-stage names used in the task log for non-processing outcomes
PENDING_PHASE = "_pending"
BUFFER_HANDLER = "_buffer"
DROP_HANDLER = "_drop"

_OUT_SCHEMA = ("phase string, handler string, task_id string, attempt int, "
               "status string, result string")
_STATE_SCHEMA = "pending array<string>"
_EMPTY = pd.DataFrame(
    {c: (pd.Series(dtype="int32") if c == "attempt"
         else pd.Series(dtype=object))
     for c in ("phase", "handler", "task_id", "attempt", "status", "result")}
)


class GracefulStop(Exception):
    """Raised inside the foreachBatch sink when ``stop()`` has been
    requested. Deliberately carries a SHORT message and suppresses the
    chained py4j traceback: Spark classifies a foreachBatch failure by
    regex-scanning the proxy error text (StreamExecution.PROXY_ERROR,
    streaming/runtime/StreamExecution.scala:774), and a stop() that
    interrupts an in-flight collect otherwise propagates a message
    embedding the full JVM stack trace — long enough that the
    backtracking regex StackOverflowErrors the stream execution thread.
    Failing the batch (rather than returning normally) is REQUIRED for
    correctness: a normal return would commit the epoch and drop the
    batch's un-appended results; failing it leaves the offsets
    uncommitted so the batch replays on the next start()."""


def _make_state_fn(state_root: str, flow_id: str, stages, timeout_ms: int,
                   max_retries: int):
    """Build the per-shard state function. Everything captured here ships
    to executors by pickle: stage handler instances must live in an
    importable module (CLAUDE.md / flow.examples docstring)."""

    def fn(key, pdfs, state):
        ctl = StateStore.read_control(state_root, flow_id)
        pending = list(state.get[0]) if state.exists else []
        incoming = []
        for pdf in pdfs:
            for tid, payload in zip(pdf["task_id"], pdf["payload"]):
                incoming.append(json.dumps({"task_id": tid, "payload": payload}))

        if ctl == CANCELED:
            # cancel drains: drop backlog + arrivals, visibly (R11 intent)
            rows = [
                (PENDING_PHASE, DROP_HANDLER,
                 json.loads(env)["task_id"], 1, "canceled", "")
                for env in pending + incoming
            ]
            if state.exists:
                state.remove()
            yield pd.DataFrame(rows, columns=_EMPTY.columns) if rows else _EMPTY
            return

        if ctl == "pause":
            state.update((pending + incoming,))
            state.setTimeoutDuration(timeout_ms)
            rows = [
                (PENDING_PHASE, BUFFER_HANDLER,
                 json.loads(env)["task_id"], 1, "buffered", "")
                for env in incoming
            ]
            yield pd.DataFrame(rows, columns=_EMPTY.columns) if rows else _EMPTY
            return

        tasks = pending + incoming
        retry = []  # envelopes going back into state for the next batch
        rows = []
        for env in tasks:
            d = json.loads(env)
            task_id = d["task_id"]
            attempt = d.get("attempt", 1)
            carry = json.loads(d["payload"])
            carry["_attempt"] = attempt
            for phase_name, handlers in stages:
                stage_out = {}
                failed = None
                for label, ctx, impl in handlers:
                    try:
                        out = impl.process(ctx, dict(carry))
                        stage_out.update(out)
                        rows.append((phase_name, label, task_id, attempt, "ok",
                                     json.dumps(out, sort_keys=True, default=str)))
                    except Exception as ex:  # noqa: BLE001 — task isolation
                        failed = f"{type(ex).__name__}: {ex}"
                        # terminal only once retries are exhausted; a
                        # retryable failure is recorded as 'retrying' and
                        # superseded by the next attempt's row
                        status = ("failed" if attempt > max_retries
                                  else "retrying")
                        rows.append((phase_name, label, task_id, attempt,
                                     status, failed))
                if failed is not None:
                    # retry the WHOLE task pipeline (stubbornly, R13):
                    # succeeded stages re-run — processors must be
                    # idempotent, same contract as batch waves
                    if attempt <= max_retries:
                        retry.append(json.dumps({
                            "task_id": task_id, "payload": d["payload"],
                            "attempt": attempt + 1,
                        }))
                    break
                carry.update(stage_out)
        state.update((retry,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(rows, columns=_EMPTY.columns) if rows else _EMPTY

    return fn


class ContinuousFlowRunner:
    """Run one flow spec as a continuous streaming pipeline.

    ``source`` is a ``StreamSource`` or a streaming DataFrame whose rows
    are tasks (must include ``task_id``; remaining columns become the
    task payload). Control and accounting go through ``engine``'s state
    store, so ``engine.pause/resume/cancel(flow_id)`` and
    ``engine.status(flow_id)`` work unchanged on a continuous flow.
    """

    def __init__(
        self,
        engine: FlowEngine,
        spec,
        source,
        n_shards: int = 8,
        trigger_interval: str = "0.3 seconds",
        state_timeout_ms: int = 400,
        worker_index: int = 0,
        n_workers: int = 1,
    ) -> None:
        if not 0 <= worker_index < n_workers:
            raise ValueError("worker_index must be in [0, n_workers)")
        self.engine = engine
        self.spec = spec if isinstance(spec, FlowSpec) else FlowSpec.parse(spec)
        self.source = source
        self.n_shards = n_shards
        self.trigger_interval = trigger_interval
        self.state_timeout_ms = state_timeout_ms
        # -- sharded replicas (the streaming twin of the batch engine's
        # competing workers, reference worker.rb:72-85): N runners on ONE
        # flow each own the task-id shard pmod(xxhash64(task_id), N) ==
        # worker_index — disjoint by construction, so each task is
        # processed by exactly one replica. Each replica runs its own
        # streaming query (own checkpoint, own batch-id sequence, own
        # per-worker progress rows suffixed '#wK'); accounting stays
        # flow-level through the shared task log (counts()).
        self.worker_index = worker_index
        self.n_workers = n_workers
        self.worker_tag = (
            f"w{worker_index}of{n_workers}" if n_workers > 1 else None
        )
        self.flow_id: str | None = None
        self.checkpoint: str | None = None
        self.query = None
        self._progress: dict[tuple[str, str], dict[str, int]] = {}
        # highest batch_id whose wave AND counters are durably recorded;
        # replayed batches at/below it are skipped entirely (exactly-once
        # counters across restart — see _persist_progress)
        self._counted_batch: int = -1
        self._stopping = threading.Event()
        # held for the duration of each sink invocation; stop() uses it as
        # a drain barrier so it never interrupts a sink between the wave
        # commit and the counter upsert (which would leave status() behind
        # the committed log until the next restart re-seeds it)
        self._sink_lock = threading.Lock()

    # -- lifecycle --------------------------------------------------------------

    def start(self, flow_id: str | None = None) -> str:
        """Start (or RESTART) the flow's streaming query.

        Pass an existing ``flow_id`` to resume after a stop/crash: the
        query restarts from its checkpoint (named deterministically per
        flow under the state root), which replays the last uncommitted
        micro-batch — including the shard state holding any paused
        backlog and retry queue. Replayed results re-commit to the task
        log, where the last-attempt-wins read dedups them, so restart is
        effectively exactly-once end to end.
        """
        engine, spec = self.engine, self.spec
        if flow_id is None:
            fid = engine.create_flow(spec)
        else:
            if engine.state.find_flow(flow_id) is None:
                raise ValueError(f"unknown flow {flow_id}")
            fid = flow_id
        self.flow_id = fid

        # Sharded-replica config pin (the streaming twin of the batch
        # engine's n_slices .cfg claim, engine.py): the first replica into
        # a flow pins n_workers in the shared claim table; a replica
        # started with a DIFFERENT n_workers is rejected outright —
        # mismatched shard moduli (pmod(h, 2) vs pmod(h, 3)) would leave
        # some task-id shards owned by nobody (silent loss) and others by
        # two replicas (double-processing). Unlike the batch engine the
        # value can't be adopted: worker_index is only meaningful under
        # the modulus this replica was deployed with.
        if not engine.state.try_claim(
            fid, "continuous.shardcfg", f"w{self.worker_index}",
            meta={"n_workers": self.n_workers},
        ):
            info = engine.state.claim_info(fid, "continuous.shardcfg") or {}
            pinned = int(info.get("n_workers", self.n_workers))
            if pinned != self.n_workers:
                raise ValueError(
                    f"flow {fid} is pinned to n_workers={pinned}; this "
                    f"replica was started with n_workers={self.n_workers}"
                    " — mismatched shard moduli would drop or "
                    "double-process tasks. Drain and create a new flow "
                    "to change the replica count."
                )

        # Restart bookkeeping, exact in every crash window:
        #   watermark  — highest micro-batch id among committed wave
        #                manifests (the batch id rides the SAME atomic
        #                write as the wave commit, so it can't disagree
        #                with the data);
        #   counters   — derived from the committed deduped log, which by
        #                construction contains exactly the batches at or
        #                below the watermark.
        # A replayed batch is either ≤ watermark (its wave committed →
        # seed already counted it → the sink skips it whole) or above it
        # (its wave never committed → the sink appends and counts it
        # once). There is no third state.
        self._progress = {}
        self._counted_batch = engine.state.max_committed_batch(
            fid, worker=self.worker_tag
        )
        self._stopping.clear()
        prior = engine.state.task_results(fid)
        if not prior.empty:
            prior = prior[~prior.phase.str.startswith("_")]
            if self.worker_tag is not None:
                # seed only THIS replica's progress rows ('#wK' labels);
                # peers own their own counters
                prior = prior[prior.handler.str.endswith(f"#{self.worker_tag}")]
            for (phase, handler), grp in prior.groupby(["phase", "handler"]):
                final = grp.drop_duplicates("task_id", keep="last")
                self._progress[(phase, handler)] = {
                    "total": int(final.task_id.nunique()),
                    "done": int((final.status == "ok").sum()),
                    "failed": int((final.status == "failed").sum()),
                    "debt": int((final.status == "retrying").sum()),
                }
        # status() parity immediately after restart (before the first batch)
        for (phase, handler), st in self._progress.items():
            engine.state.upsert_progress(
                fid, phase, handler,
                total=st["total"], remaining=max(0, st["debt"]),
            )

        stages = []
        for phase in spec.phases:
            handlers = []
            for ph in phase.handlers:
                # Resolve over local-registry UNION live capabilities so a
                # version deployed mid-flow via FlowEngine.deploy is visible
                # to continuous flows too (same path batch phases use).
                version, impl = engine._resolve(ph.name, ph.version)
                label = f"{ph.name}@{version}"
                if self.worker_tag is not None:
                    label += f"#{self.worker_tag}"
                ctx = HandlerContext(flow_id=fid, phase=phase.name,
                                     handler=label, data=spec.data)
                handlers.append((label, ctx, impl))
            if handlers:
                stages.append((phase.name, tuple(handlers)))
        if not stages:
            raise ValueError("continuous flow needs at least one handler phase")

        stream = self.source.load(engine.spark) if hasattr(self.source, "load") \
            else self.source
        if "task_id" not in stream.columns:
            raise ValueError("task stream must include a task_id column")
        payload_cols = [c for c in stream.columns if c != "task_id"]
        tasks = stream.select(
            F.col("task_id").cast("string").alias("task_id"),
            F.to_json(F.struct(*payload_cols)).alias("payload"),
            F.pmod(F.xxhash64("task_id"), F.lit(self.n_shards)).alias("shard"),
        )
        if self.n_workers > 1:
            # this replica's shard of the stream — disjoint across workers
            tasks = tasks.filter(
                F.pmod(F.xxhash64("task_id"), F.lit(self.n_workers))
                == self.worker_index
            )

        from pyspark.sql.streaming.state import GroupStateTimeout

        fn = _make_state_fn(engine.state.root, fid, tuple(stages),
                            self.state_timeout_ms, engine.max_retries)
        results = tasks.groupBy("shard").applyInPandasWithState(
            fn, _OUT_SCHEMA, _STATE_SCHEMA, "update",
            GroupStateTimeout.ProcessingTimeTimeout,
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            with self._sink_lock:
                if self._stopping.is_set():
                    # refuse the batch BEFORE any JVM call: failing it
                    # keeps the epoch uncommitted so it replays on restart
                    raise GracefulStop(f"stop() requested; batch {batch_id} "
                                       "deferred to restart")
                if batch_id <= self._counted_batch:
                    # Crash-replay of a batch whose wave manifest committed:
                    # the restart seed already counted it, so neither the
                    # wave append nor the counter deltas may run again. The
                    # batch must still EXECUTE, though — Spark validates
                    # that every state-store partition committed this epoch
                    # — so drive it through the no-op sink: full
                    # computation (and shard-state commit), zero output.
                    batch_df.write.format("noop").mode("overwrite").save()
                    return
                try:
                    sink_batch(batch_df, batch_id)
                except Exception:
                    if self._stopping.is_set():
                        # a stop() racing the drain barrier interrupted an
                        # in-flight job; swallow the py4j error (its
                        # message embeds the full JVM stack, which
                        # overflows Spark's PROXY_ERROR regex) and fail
                        # the batch with a short marker instead
                        raise GracefulStop(
                            f"stop() interrupted batch {batch_id}; it will "
                            "replay on restart") from None
                    raise

        def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
            # the batch feeds TWO jobs (wave write + progress counts);
            # persist so the stateful operator computes exactly once per
            # micro-batch — re-executing it mid-batch corrupts the run
            batch_df.persist()
            try:
                if batch_df.isEmpty():
                    # no-data batches fire every state-timeout interval
                    # (~3/s on an idle flow): committing empty waves
                    # would grow dirs/manifests without bound and slow
                    # every later task_results read
                    return
                # same atomic wave-manifest commit as the batch engine;
                # the batch never materializes on the driver
                wave = batch_df.select(
                    "phase", "handler", "task_id",
                    F.col("attempt").cast("int").alias("attempt"),
                    "status", "result",
                    F.lit(time.time()).alias("ts"),
                )
                if self.worker_tag is None:
                    engine._append_wave(wave, fid, batch_id=batch_id)
                else:
                    engine._append_wave(wave, fid, batch_id=batch_id,
                                        worker=self.worker_tag)
                # progress counters for engine.status() parity with batch
                # flows: per-stage COUNTS cross to the driver (a few
                # rows), never task rows. Exact accounting per batch:
                #   new tasks      = rows with attempt == 1
                #   done           = ok rows (a retried task's earlier
                #                    'retrying' rows are closed by its
                #                    terminal row's attempt-1)
                # so total is monotone tasks-seen and remaining is the
                # open retry debt, returning to 0 once retries land.
                # Replay-exactness comes from the snapshot watermark
                # below: a batch is either skipped whole or counted once.
                deltas = (
                    batch_df.filter(~F.col("phase").startswith("_"))
                    .groupBy("phase", "handler")
                    .agg(
                        F.count(F.when(F.col("attempt") == 1, 1))
                        .alias("new_tasks"),
                        F.count(F.when(F.col("status") == "ok", 1))
                        .alias("ok"),
                        F.count(F.when(F.col("status") == "failed", 1))
                        .alias("failed"),
                        F.sum(
                            F.when(
                                F.col("status").isin("ok", "failed"),
                                F.col("attempt") - 1,
                            ).otherwise(0)
                        ).alias("retries_closed"),
                        F.count(F.when(F.col("status") == "retrying", 1))
                        .alias("retrying"),
                    )
                    .collect()
                )
            finally:
                batch_df.unpersist()
            for row in deltas:
                st = self._progress.setdefault(
                    (row["phase"], row["handler"]),
                    {"total": 0, "done": 0, "failed": 0, "debt": 0},
                )
                st["total"] += row["new_tasks"]
                st["done"] += row["ok"]
                st["failed"] += row["failed"]
                st["debt"] += row["retrying"] - int(row["retries_closed"])
            self._counted_batch = batch_id
            for (phase, handler), st in self._progress.items():
                engine.state.upsert_progress(
                    fid, phase, handler,
                    total=st["total"],
                    remaining=max(0, st["debt"]),
                )

        # deterministic per-flow checkpoint: a restart with the same
        # flow_id resumes source offsets AND shard state from here
        checkpoint = os.path.join(
            engine.state.root, "cont_ckpt",
            fid if self.worker_tag is None else f"{fid}-{self.worker_tag}",
        )
        os.makedirs(checkpoint, exist_ok=True)
        self.checkpoint = checkpoint
        self.query = (
            results.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(processingTime=self.trigger_interval)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        return fid

    def stop(self) -> None:
        """Stop the streaming query without poisoning it.

        Sets the stopping flag FIRST so the next sink invocation fails
        fast with a short GracefulStop marker instead of letting
        ``query.stop()``'s thread interrupt surface as a megabyte py4j
        error (see GracefulStop), then DRAINS the in-flight sink through
        the lock barrier before interrupting the query: a sink that has
        already committed its wave manifest must also land its counter
        deltas, or ``engine.status()`` would trail the committed log
        until the next restart re-seeds it. A batch that has not yet
        entered the sink when stop lands is left uncommitted and replays
        on the next ``start()``."""
        if self.query is not None:
            self._stopping.set()
            # drain barrier: wait for an in-flight sink to finish (it
            # holds the lock for the whole wave-commit + counter-upsert
            # sequence), release immediately — holding it across
            # query.stop() could deadlock with a sink entering the lock
            with self._sink_lock:
                pass
            try:
                self.query.stop()
                try:
                    self.query.awaitTermination()
                except Exception as ex:  # noqa: BLE001
                    if "GracefulStop" not in str(ex):
                        raise
            finally:
                self.query = None
                self._stopping.clear()

    # -- introspection ----------------------------------------------------------

    def counts(self) -> dict[tuple[str, str], int]:
        """Distinct tasks per (phase, status) from the committed task log —
        the continuous twin of the batch engine's progress counters."""
        df = self.engine.state.task_results(self.flow_id)
        if df.empty:
            return {}
        g = df.groupby(["phase", "status"]).task_id.nunique()
        return {k: int(v) for k, v in g.items()}

    def wait_for(self, predicate, timeout_sec: float = 60.0,
                 poll_sec: float = 0.25) -> None:
        """Poll ``predicate(counts_dict)`` until true; raise on timeout
        (with the query stopped so a failing caller doesn't leak it)."""
        deadline = time.time() + timeout_sec
        while True:
            if self.query is not None and self.query.exception() is not None:
                exc = self.query.exception()
                try:
                    self.stop()
                except Exception:  # noqa: BLE001 — don't mask the root cause
                    pass
                raise exc  # dead query: surface the real error, don't wait
            if predicate(self.counts()):
                return
            if time.time() > deadline:
                self.stop()
                raise TimeoutError(f"continuous flow: predicate not met in "
                                   f"{timeout_sec}s; counts={self.counts()}")
            time.sleep(poll_sec)


def write_task_chunk(directory: str, rows: list[dict]) -> str:
    """Append one parquet chunk of tasks to a stream directory (atomic
    tmp+rename so the file source never lists a half-written file).
    The tmp name is dot-prefixed: Spark's file-stream listing hides
    dot/underscore-prefixed files, so the in-progress write is invisible
    — a plain `<name>.tmp` WOULD be listed and read torn, and the
    post-rename file would then double-deliver under its new name.
    Test/demo helper for feeding an unbounded file-stream task queue."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(directory, exist_ok=True)
    name = f"chunk_{time.time_ns()}.parquet"
    tmp = os.path.join(directory, "." + name + ".tmp")
    path = os.path.join(directory, name)
    pq.write_table(pa.Table.from_pylist(rows), tmp)
    os.replace(tmp, path)
    return path
