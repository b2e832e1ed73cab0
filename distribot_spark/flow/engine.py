"""Flow orchestrator: the six reference daemons collapsed into one
driver-side state machine, with Spark executing the data plane.

Reference lifecycle (SURVEY.md §3.1): flow.created → phase.started →
enumerate → tasks fanned out → task.finished × N → handler.finished →
phase.finished → next phase … → flow.finished. Every hop is a RabbitMQ
message between daemons (bin/distribot.*, Procfile:1-6). Here the hops
are function calls in `run()`; the fan-out/process step is a Spark job
(`mapInPandas` over the task DataFrame), which is where the actual
parallelism lives — the reference's 500 consumer threads
(worker.rb:75) become Spark partitions.

Semantics intentionally fixed vs the reference (see package docstring):
ALL-handlers barrier, transactional counters, on_error_transition_to
routing, cancel-drains. Pause granularity is a documented deviation:
the reference requeues in-flight tasks on pause (worker.rb:133-137,
connector.rb:68); Spark can't suspend running tasks, so pause takes
effect at wave boundaries.
"""

from __future__ import annotations

import inspect
import json
import math
import os
import time
import uuid
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distribot_spark.flow.registry import DEFAULT_REGISTRY, HandlerRegistry
from distribot_spark.flow.spec import FlowSpec
from distribot_spark.flow.state import StateStore

PAUSED = "paused"  # pseudo-phases, as in the reference (flow.rb:70-105)
CANCELED = "canceled"


class FlowError(Exception):
    pass


class FlowCanceled(FlowError):
    pass


class FlowPaused(FlowError):
    pass


class PhaseFailed(FlowError):
    def __init__(self, phase: str, handler: str, failures: list[str]):
        super().__init__(f"phase {phase!r} handler {handler!r}: {failures[:3]}")
        self.phase = phase
        self.handler = handler
        self.failures = failures


@dataclass(frozen=True)
class HandlerContext:
    """What a handler sees; picklable (ships to executors)."""

    flow_id: str
    phase: str
    handler: str
    data: str  # flow's opaque JSON payload

    def data_dict(self) -> dict:
        return json.loads(self.data)


class FlowEngine:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        registry: HandlerRegistry | None = None,
        max_retries: int = 2,
        tasks_per_partition: int = 100,
    ) -> None:
        self.spark = spark
        self.state = StateStore(state_root)
        self.registry = registry or DEFAULT_REGISTRY
        self.max_retries = max_retries
        self.tasks_per_partition = tasks_per_partition

    # -- lifecycle API (R1–R3) -------------------------------------------------

    def create_flow(self, spec) -> str:
        """Persist + transition into the initial phase (Flow#save!,
        flow.rb:31-52). Returns the flow id."""
        spec = spec if isinstance(spec, FlowSpec) else FlowSpec.parse(spec)
        flow_id = uuid.uuid4().hex
        self.state.save_flow(flow_id, spec.name, spec.to_json(), spec.data)
        self.state.add_transition(flow_id, None, spec.initial_phase.name)
        return flow_id

    def find(self, flow_id: str) -> dict | None:
        row = self.state.find_flow(flow_id)
        if row is None:
            return None
        row["current_phase"] = self.current_phase(flow_id)
        row["control"] = self.state.control_state(flow_id)
        return row

    def active(self) -> list[str]:
        """Flows not finished/canceled (the Redis active set,
        flow.rb:20-24,44)."""
        flows = self.state.all_flows()
        if flows.empty:
            return []
        out = []
        for fid in flows.flow_id.unique():
            if self.state.control_state(fid) not in ("finished", CANCELED):
                out.append(fid)
        return sorted(out)

    # -- phase inspection (R7, R12) ----------------------------------------------

    def current_phase(self, flow_id: str) -> str | None:
        return self.state.current_phase(flow_id)

    def finished(self, flow_id: str) -> bool:
        return self.state.control_state(flow_id) == "finished"

    def canceled(self, flow_id: str) -> bool:
        return self.state.control_state(flow_id) == CANCELED

    def paused(self, flow_id: str) -> bool:
        # the control flag is authoritative: a concurrently-running phase
        # may append its completion transition after the PAUSED marker
        return self.state.control_state(flow_id) == "pause"

    # -- control (R9–R11) ----------------------------------------------------------

    def pause(self, flow_id: str) -> None:
        """Guarded transition to the pseudo-phase (flow.rb:70-77)."""
        if self.paused(flow_id):
            raise FlowError("already paused")
        if self.state.control_state(flow_id) in ("finished", CANCELED):
            raise FlowError("not running")
        self.state.set_control(flow_id, "pause")
        self.state.add_transition(flow_id, self.current_phase(flow_id), PAUSED)

    def resume(self, flow_id: str) -> None:
        """Transition back to the last real phase (flow.rb:79-88)."""
        if not self.paused(flow_id):
            raise FlowError("not paused")
        self.state.set_control(flow_id, "resume")
        if self.current_phase(flow_id) == PAUSED:
            transitions = self.state.transitions(flow_id)
            last_real = next(
                t["to"] for t in reversed(transitions) if t["to"] != PAUSED
            )
            self.state.add_transition(flow_id, PAUSED, last_real)

    def cancel(self, flow_id: str) -> None:
        """Transition to canceled + deregister (flow.rb:94-105). Unlike the
        reference — which leaves canceled tasks requeueing forever — the
        run loop drains: it stops scheduling waves and exits."""
        if self.state.control_state(flow_id) in ("finished", CANCELED):
            raise FlowError("not running")
        self.state.set_control(flow_id, CANCELED)
        self.state.add_transition(flow_id, self.current_phase(flow_id), CANCELED)

    # -- status (R38) -----------------------------------------------------------------

    def status(self, flow_id: str) -> pd.DataFrame:
        """Per (phase, handler) progress, like examples/status:26-38."""
        df = self.state.progress(flow_id)
        if df.empty:
            return df
        df = df.copy()
        df["done"] = df.total - df.remaining
        df["pct"] = (100 * df.done / df.total.where(df.total > 0, 1)).round(1)
        return df[["phase", "handler", "total", "remaining", "done", "pct"]]

    # -- execution ------------------------------------------------------------------------

    def run(self, flow_id: str, on_complete=None) -> str:
        """Drive the flow until finished / paused / canceled; returns the
        terminal state. Re-entrant: drained phases are skipped and
        succeeded tasks are never re-processed (effectively-once), so
        `resume(); run()` continues where pause stopped."""
        flow = self.state.find_flow(flow_id)
        if flow is None:
            raise FlowError(f"unknown flow {flow_id}")
        spec = FlowSpec.parse(flow["spec"])

        while True:
            ctl = self.state.control_state(flow_id)
            if ctl == CANCELED:
                return CANCELED
            if ctl == "pause":
                return PAUSED
            cur = self.current_phase(flow_id)
            if cur in (PAUSED, CANCELED):
                return cur

            phase = spec.phase(cur)
            try:
                self._run_phase(flow_id, flow, phase)
            except FlowCanceled:
                return CANCELED
            except FlowPaused:
                return PAUSED
            except PhaseFailed:
                if phase.on_error_transition_to:
                    # the declared-but-dead reference config (phase.rb:9),
                    # implemented: route to the error phase and keep going
                    self.state.add_transition(
                        flow_id, cur, phase.on_error_transition_to
                    )
                    continue
                raise

            # a pause/cancel may have landed while the phase ran: yield
            # BEFORE advancing, so the PAUSED/CANCELED marker stays the
            # latest transition (phase completion is preserved in progress,
            # so resume skips the drained phase)
            ctl = self.state.control_state(flow_id)
            if ctl == CANCELED:
                return CANCELED
            if ctl == "pause":
                return PAUSED

            nxt = spec.next_phase(cur)
            if nxt is None:
                # flow.finished: deregister active (flow_finished_handler.rb:7-11)
                self.state.set_control(flow_id, "finished")
                if on_complete is not None:
                    on_complete(flow_id)
                return "finished"
            # phase.finished → transition_to! next (phase_finished_handler.rb:7-17)
            self.state.add_transition(flow_id, cur, nxt)

    def run_new(self, spec, on_complete=None) -> tuple[str, str]:
        fid = self.create_flow(spec)
        return fid, self.run(fid, on_complete=on_complete)

    # -- phase internals ------------------------------------------------------------

    def _run_phase(self, flow_id: str, flow: dict, phase) -> None:
        if not phase.handlers:
            return  # empty-phase short-circuit (phase_started_handler.rb:11-16)
        if self.state.phase_drained(flow_id, phase.name):
            return  # already completed (re-entry after pause/resume)
        for ph in phase.handlers:
            version, impl = self.registry.resolve(ph.name, ph.version)
            ctx = HandlerContext(
                flow_id=flow_id,
                phase=phase.name,
                handler=f"{ph.name}@{version}",
                data=flow["data"],
            )
            self._run_handler(flow_id, phase.name, ctx, impl)
        # the intended ALL-handlers barrier (vs handler_finished_handler.rb:22)
        assert self.state.phase_drained(flow_id, phase.name)

    def _run_handler(self, flow_id: str, phase: str, ctx: HandlerContext, impl) -> None:
        # enumerate (worker.rb:55-70,112-119). Handlers may enumerate either
        # a driver-side iterable of dicts (reference-faithful) or — the
        # 100 TB path — a DataFrame with a task_id column, which never
        # materializes on the driver.
        sig = inspect.signature(impl.enumerate)
        enumerated = (
            impl.enumerate(ctx, self.spark)
            if len(sig.parameters) >= 2
            else impl.enumerate(ctx)
        )
        if isinstance(enumerated, DataFrame):
            self._run_handler_distributed(flow_id, phase, ctx, impl, enumerated)
            return
        tasks = []
        for t in enumerated:
            t = dict(t)
            task_id = str(t.pop("task_id", uuid.uuid4().hex))
            tasks.append({"task_id": task_id, "payload": json.dumps(t)})

        # announce (worker.rb:123-131): one atomic counter upsert
        done_ids = set()
        prior = self.state.task_results(flow_id, phase)
        if not prior.empty:
            prior = prior[(prior.handler == ctx.handler) & (prior.status == "ok")]
            done_ids = set(prior.task_id)
        remaining = [t for t in tasks if t["task_id"] not in done_ids]
        self.state.upsert_progress(
            flow_id, phase, ctx.handler, len(tasks), len(remaining)
        )

        attempt = 0
        while remaining:
            self._check_control(flow_id)
            attempt += 1
            results = self._process_wave(ctx, impl, remaining, attempt)
            self.state.log_tasks(
                [
                    {
                        "flow_id": flow_id,
                        "phase": phase,
                        "handler": ctx.handler,
                        "task_id": r["task_id"],
                        "attempt": attempt,
                        "status": r["status"],
                        "result": r["result"],
                    }
                    for r in results
                ]
            )
            failed = {r["task_id"] for r in results if r["status"] != "ok"}
            remaining = [t for t in remaining if t["task_id"] in failed]
            self.state.upsert_progress(
                flow_id, phase, ctx.handler, len(tasks), len(remaining)
            )
            if remaining and attempt > self.max_retries:
                raise PhaseFailed(
                    phase,
                    ctx.handler,
                    [r["result"] for r in results if r["status"] != "ok"],
                )

    def _process_wave(
        self, ctx: HandlerContext, impl, tasks: list[dict], attempt: int = 1
    ) -> list[dict]:
        """One distributed processing wave: task rows → mapInPandas →
        (task_id, status, result). The handler's `process` runs on the
        executors — the reference's 500-thread competing-consumer pool
        (worker.rb:72-110) as a Spark job. Per-task exceptions become
        'failed' rows (trycatch, worker.rb:139-146); the caller retries
        only the failed task ids."""
        n_parts = max(1, math.ceil(len(tasks) / self.tasks_per_partition))
        df = self.spark.createDataFrame(
            pd.DataFrame(tasks, columns=["task_id", "payload"])
        ).repartition(n_parts)

        def fn(batches):
            for pdf in batches:
                out = []
                for task_id, payload in zip(pdf["task_id"], pdf["payload"]):
                    task = json.loads(payload)
                    task["_attempt"] = attempt  # retry metadata for handlers
                    try:
                        res = impl.process(ctx, task)
                        out.append(
                            (task_id, "ok", json.dumps(res, sort_keys=True, default=str))
                        )
                    except Exception as ex:  # noqa: BLE001 — task isolation
                        out.append((task_id, "failed", f"{type(ex).__name__}: {ex}"))
                yield pd.DataFrame(out, columns=["task_id", "status", "result"])

        rows = df.mapInPandas(fn, "task_id string, status string, result string").collect()
        return [r.asDict() for r in rows]

    def _run_handler_distributed(
        self, flow_id: str, phase: str, ctx: HandlerContext, impl, task_df: DataFrame
    ) -> None:
        """Distributed-enumerate execution: the task set stays a DataFrame
        end to end. Results are written straight to the task_log parquet
        dir (write-once, then derive retry sets from storage — re-running
        the lazy plan would re-execute side-effecting processors), and the
        driver only ever sees counts."""
        if "task_id" not in task_df.columns:
            raise FlowError("DataFrame enumerate must include a task_id column")
        payload_cols = [c for c in task_df.columns if c != "task_id"]
        tasks = task_df.select(
            F.col("task_id").cast("string").alias("task_id"),
            F.to_json(F.struct(*payload_cols)).alias("payload"),
        )
        total = tasks.count()

        prior = self.state.task_results(flow_id, phase)
        if not prior.empty:
            done = prior[(prior.handler == ctx.handler) & (prior.status == "ok")]
            if not done.empty:
                done_df = self.spark.createDataFrame(done[["task_id"]])
                tasks = tasks.join(done_df, "task_id", "left_anti")
        remaining_cnt = tasks.count()
        self.state.upsert_progress(flow_id, phase, ctx.handler, total, remaining_cnt)

        log_dir = os.path.join(self.state.root, "task_log")
        attempt = 0
        while remaining_cnt:
            self._check_control(flow_id)
            attempt += 1
            results = self._wave_df(ctx, impl, tasks, attempt).select(
                F.lit(flow_id).alias("flow_id"),
                F.lit(phase).alias("phase"),
                F.lit(ctx.handler).alias("handler"),
                "task_id",
                F.lit(attempt).cast("int").alias("attempt"),
                "status",
                "result",
                F.lit(time.time()).alias("ts"),
            )
            results.write.mode("append").parquet(log_dir)
            logged = self.spark.read.parquet(log_dir).filter(
                (F.col("flow_id") == flow_id)
                & (F.col("phase") == phase)
                & (F.col("handler") == ctx.handler)
                & (F.col("attempt") == attempt)
            )
            failed = logged.filter(F.col("status") != "ok").select("task_id")
            remaining_cnt = failed.count()
            tasks = tasks.join(failed, "task_id", "left_semi")
            self.state.upsert_progress(
                flow_id, phase, ctx.handler, total, remaining_cnt
            )
            if remaining_cnt and attempt > self.max_retries:
                sample = [
                    r.result
                    for r in logged.filter(F.col("status") != "ok").limit(3).collect()
                ]
                raise PhaseFailed(phase, ctx.handler, sample)

    def _wave_df(
        self, ctx: HandlerContext, impl, tasks: DataFrame, attempt: int
    ) -> DataFrame:
        def fn(batches):
            for pdf in batches:
                out = []
                for task_id, payload in zip(pdf["task_id"], pdf["payload"]):
                    task = json.loads(payload)
                    task["_attempt"] = attempt
                    try:
                        res = impl.process(ctx, task)
                        out.append(
                            (task_id, "ok", json.dumps(res, sort_keys=True, default=str))
                        )
                    except Exception as ex:  # noqa: BLE001 — task isolation
                        out.append((task_id, "failed", f"{type(ex).__name__}: {ex}"))
                yield pd.DataFrame(out, columns=["task_id", "status", "result"])

        return tasks.mapInPandas(fn, "task_id string, status string, result string")

    def _check_control(self, flow_id: str) -> None:
        ctl = self.state.control_state(flow_id)
        if ctl == CANCELED:
            raise FlowCanceled(flow_id)
        if ctl == "pause":
            raise FlowPaused(flow_id)
