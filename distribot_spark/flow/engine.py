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
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        wave_slices: int = 1,
        claim_lease_sec: float = 60.0,
        poll_interval: float = 0.05,
    ) -> None:
        self.spark = spark
        self.state = StateStore(state_root)
        self.registry = registry or DEFAULT_REGISTRY
        self.max_retries = max_retries
        self.tasks_per_partition = tasks_per_partition
        # -- competing-consumer knobs (reference worker.rb:72-85: N worker
        # replicas share one queue). Engines pointed at the SAME state root
        # split each attempt's tasks into `wave_slices` hash slices and
        # claim them exclusively (StateStore.try_claim), so a phase drains
        # across processes with each task processed by one engine.
        # Cooperating engines must agree on wave_slices, and handler
        # enumerate() must be deterministic (same tasks in every engine).
        self.wave_slices = max(1, wave_slices)
        self.claim_lease_sec = claim_lease_sec
        self.poll_interval = poll_interval
        self.worker_id = uuid.uuid4().hex[:12]
        # liveness announcement (reference consumer listing): one row at
        # start, refreshed at every phase entry — `state.workers()` is
        # the ops view of which engine replicas are alive
        self.state.worker_heartbeat(self.worker_id)
        # R32 fanout: (event-pattern, flow-pattern, callback) triples
        self._subscribers: list[tuple[str, str, object]] = []

    # -- event fanout (R32) -----------------------------------------------------

    def subscribe(self, callback, event: str = "*", flow_id: str = "*") -> None:
        """Register a broadcast subscriber (reference `Connector.subscribe_multi`
        / fanout exchanges, connector.rb:75-89,134-138: ANY number of
        subscribers observe `flow.finished` etc.). ``event`` is one of
        flow.created / phase.started / phase.finished / flow.finished /
        flow.paused / flow.resumed / flow.canceled, or '*'; ``flow_id``
        narrows to one flow. Callbacks run driver-side as
        ``callback(event, flow_id, payload_dict)``.

        Durable twin: every emitted event is also derivable from the
        persisted transitions/control tables (`events()` below), so an
        out-of-process subscriber can tail state instead of registering."""
        self._subscribers.append((event, flow_id, callback))

    def _emit(self, event: str, flow_id: str, **payload) -> None:
        for ev, fid, cb in list(self._subscribers):
            if ev in ("*", event) and fid in ("*", flow_id):
                try:
                    cb(event, flow_id, payload)
                except Exception:  # noqa: BLE001 — subscriber isolation:
                    pass  # a failing subscriber must not kill the flow

    def events(self, flow_id: str) -> list[dict]:
        """The persisted event stream a detached subscriber would tail:
        transitions as lifecycle events plus terminal control records.
        Event names mirror the live `_emit` fanout exactly: transitions
        into the PAUSED/CANCELED pseudo-phases surface as flow.paused /
        flow.canceled and a PAUSED→phase transition as flow.resumed —
        never as phase.started with a pseudo-phase name."""
        out = []
        for t in self.state.transitions(flow_id):
            if t["from"] is None:
                event, phase = "flow.created", t["to"]
            elif t["to"] == PAUSED:
                event, phase = "flow.paused", None
            elif t["to"] == CANCELED:
                event, phase = "flow.canceled", None
            elif t["from"] == PAUSED:
                event, phase = "flow.resumed", t["to"]
            else:
                event, phase = "phase.started", t["to"]
            out.append({"event": event, "flow_id": flow_id, "phase": phase,
                        "ts": t["ts"]})
        ctl = self.state.control_state(flow_id)
        if ctl == "finished":
            out.append({"event": "flow.finished", "flow_id": flow_id, "phase": None,
                        "ts": None})
        elif ctl == CANCELED and not any(e["event"] == "flow.canceled" for e in out):
            out.append({"event": "flow.canceled", "flow_id": flow_id, "phase": None,
                        "ts": None})
        return out

    # -- lifecycle API (R1–R3) -------------------------------------------------

    def create_flow(self, spec) -> str:
        """Persist + transition into the initial phase (Flow#save!,
        flow.rb:31-52). Returns the flow id."""
        spec = spec if isinstance(spec, FlowSpec) else FlowSpec.parse(spec)
        flow_id = uuid.uuid4().hex
        self.state.save_flow(flow_id, spec.name, spec.to_json(), spec.data)
        self.state.add_transition(flow_id, None, spec.initial_phase.name)
        self._emit("flow.created", flow_id, name=spec.name)
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
        self._emit("flow.paused", flow_id)

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
        self._emit("flow.resumed", flow_id)

    def cancel(self, flow_id: str) -> None:
        """Transition to canceled + deregister (flow.rb:94-105). Unlike the
        reference — which leaves canceled tasks requeueing forever — the
        run loop drains: it stops scheduling waves and exits."""
        if self.state.control_state(flow_id) in ("finished", CANCELED):
            raise FlowError("not running")
        self.state.set_control(flow_id, CANCELED)
        self.state.add_transition(flow_id, self.current_phase(flow_id), CANCELED)
        self._emit("flow.canceled", flow_id)

    # -- status (R38) -----------------------------------------------------------------

    def status(self, flow_id: str) -> pd.DataFrame:
        """Per (phase, handler) progress, like examples/status:26-38, plus
        `phase_age_sec` — seconds since each phase was (last) entered, the
        reference's flow-age column (examples/status:33) at phase grain."""
        df = self.state.progress(flow_id)
        if df.empty:
            return df
        df = df.copy()
        df["done"] = df.total - df.remaining
        df["pct"] = (100 * df.done / df.total.where(df.total > 0, 1)).round(1)
        entered: dict[str, float] = {}
        for t in self.state.transitions(flow_id):
            entered[t["to"]] = t["ts"]  # latest entry into the phase wins
        now = time.time()
        df["phase_age_sec"] = df.phase.map(
            lambda p: round(now - entered[p], 3) if p in entered else None
        )
        return df[["phase", "handler", "total", "remaining", "done", "pct",
                   "phase_age_sec"]]

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
                    # implemented: route to the error phase and keep going.
                    # Fenced like any phase exit: competing engines both
                    # hit PhaseFailed, one appends the routing transition.
                    self._advance(flow_id, cur, phase.on_error_transition_to)
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
                # and broadcast to every subscriber (flow_finished_handler.rb:11).
                # The STATE write is fenced (one engine records it); the
                # fanout + callback run in every engine — each process has
                # its own subscribers, like every reference daemon getting
                # its own copy of the broadcast.
                gate = self._gate_key(flow_id, cur)
                if self.state.try_claim(flow_id, gate, self.worker_id):
                    self.state.set_control(flow_id, "finished")
                else:
                    # A cancel/pause can land between the winner's claim and
                    # its control write: exit the wait on ANY terminal or
                    # pause state, and make the lease-age recovery a no-op
                    # when the control is already terminal (never overwrite
                    # "canceled" with "finished").
                    self._await(
                        lambda: self.state.control_state(flow_id)
                        in ("finished", CANCELED, "pause"),
                        recover=lambda: (
                            self.state.control_state(flow_id)
                            in ("finished", CANCELED, "pause")
                            or self.state.set_control(flow_id, "finished")
                        ),
                    )
                ctl = self.state.control_state(flow_id)
                if ctl == CANCELED:
                    return CANCELED
                if ctl == "pause":
                    return PAUSED
                self._emit("flow.finished", flow_id)
                if on_complete is not None:
                    on_complete(flow_id)
                return "finished"
            # phase.finished → transition_to! next (phase_finished_handler.rb:7-17)
            self._advance(flow_id, cur, nxt)

    def _gate_key(self, flow_id: str, phase: str) -> str:
        return f"_adv.{phase}.e{self._phase_epoch(flow_id, phase)}"

    def _phase_epoch(self, flow_id: str, phase: str) -> int:
        """How many times the flow has ENTERED `phase` (1 on first entry;
        bumps on resume-after-pause and error-loop re-entry). Epochs
        namespace work claims, so a re-entered phase claims fresh slots
        instead of finding its previous visit's claims occupied."""
        return sum(1 for t in self.state.transitions(flow_id) if t["to"] == phase)

    def _advance(self, flow_id: str, cur: str, nxt: str) -> None:
        """Append the cur→nxt transition exactly once across competing
        engines: the gate claim picks one writer; losers wait for the
        transition to appear (with a lease-length recovery append in case
        the winner died between winning and writing — idempotent, since a
        duplicate cur→nxt leaves current_phase unchanged)."""
        if self.state.try_claim(flow_id, self._gate_key(flow_id, cur), self.worker_id):
            self.state.add_transition(flow_id, cur, nxt)
            return
        self._await(
            lambda: self.current_phase(flow_id) != cur
            or self.state.control_state(flow_id) in (CANCELED, "pause"),
            recover=lambda: self.state.add_transition(flow_id, cur, nxt),
        )

    def _await(self, done, recover) -> None:
        """Poll until `done()`; after claim_lease_sec, run `recover()` —
        the idempotent repair for a gate winner that died mid-write."""
        deadline = time.time() + self.claim_lease_sec
        while not done():
            if time.time() > deadline:
                recover()
                return
            time.sleep(self.poll_interval)

    def run_new(self, spec, on_complete=None) -> tuple[str, str]:
        fid = self.create_flow(spec)
        return fid, self.run(fid, on_complete=on_complete)

    # -- capability deployment (deploy-is-register) ---------------------------------

    def deploy(self, name: str, version: str, impl) -> None:
        """Deploy a handler version LIVE: register it in this engine's
        registry AND in the shared capabilities table, so every engine on
        this state root resolves it from the next phase start onward —
        the reference's deployment-is-registration
        (phase_started_handler.rb:59-67: versions are discovered by
        listing live queues, so starting a worker IS registering it).
        The impl's class must be importable by module path (the same
        constraint executors already impose on handlers)."""
        self.registry.register(name, version, impl)
        cls = type(impl)
        self.state.register_capability(
            name, version, cls.__module__, cls.__qualname__, self.worker_id
        )

    def _resolve(self, name: str, requirement: str | None):
        """Best semver match over local-registry ∪ LIVE capability-table
        versions, evaluated at phase start. A table-only winner is
        imported by class path, instantiated, and cached locally."""
        from distribot_spark.flow.registry import best_match

        local = set(self.registry.versions(name))
        live: dict[str, tuple[str, str]] = {}
        caps = self.state.capabilities()
        if not caps.empty:
            for _, r in caps[caps.name == name].iterrows():
                live[r.version] = (r.module, r.qualname)
        version = best_match(sorted(local | set(live)), requirement, name)
        if version in local:
            return self.registry.resolve(name, version)
        import importlib

        obj = importlib.import_module(live[version][0])
        for part in live[version][1].split("."):
            obj = getattr(obj, part)
        impl = obj()
        self.registry.register(name, version, impl)
        return version, impl

    # -- phase internals ------------------------------------------------------------

    def _run_phase(self, flow_id: str, flow: dict, phase) -> None:
        if not phase.handlers:
            return  # empty-phase short-circuit (phase_started_handler.rb:11-16)
        resolved = []
        for ph in phase.handlers:
            version, impl = self._resolve(ph.name, ph.version)
            resolved.append((
                HandlerContext(
                    flow_id=flow_id,
                    phase=phase.name,
                    handler=f"{ph.name}@{version}",
                    data=flow["data"],
                ),
                impl,
            ))
        handler_ids = [ctx.handler for ctx, _ in resolved]
        if self.state.phase_drained(flow_id, phase.name, handler_ids):
            return  # already completed (re-entry after pause/resume)
        epoch = self._phase_epoch(flow_id, phase.name)
        self.state.worker_heartbeat(self.worker_id)
        self._emit("phase.started", flow_id, phase=phase.name)

        # All handlers of a phase run CONCURRENTLY, as in the reference
        # (phase_started_handler.rb:27-30 publishes every handler's start
        # message before any finishes): each thread submits independent
        # Spark jobs, so one slow handler no longer serializes the phase.
        if len(resolved) == 1:
            ctx, impl = resolved[0]
            self._run_handler(flow_id, phase.name, ctx, impl, epoch)
        else:
            with ThreadPoolExecutor(max_workers=len(resolved)) as pool:
                futures = [
                    pool.submit(
                        self._run_handler, flow_id, phase.name, ctx, impl, epoch
                    )
                    for ctx, impl in resolved
                ]
                errors = []
                for fut in futures:
                    try:
                        fut.result()
                    except Exception as ex:  # noqa: BLE001 — collect, rank below
                        errors.append(ex)
            if errors:
                # control-flow exceptions outrank task failure
                for kind in (FlowCanceled, FlowPaused):
                    for e in errors:
                        if isinstance(e, kind):
                            raise e
                raise errors[0]
        # the intended ALL-handlers barrier (vs handler_finished_handler.rb:22)
        assert self.state.phase_drained(flow_id, phase.name, handler_ids)
        self._emit("phase.finished", flow_id, phase=phase.name)

    def _run_handler(
        self, flow_id: str, phase: str, ctx: HandlerContext, impl, epoch: int = 1
    ) -> None:
        """enumerate (worker.rb:55-70,112-119) then process. Handlers may
        enumerate either a driver-side iterable of dicts
        (reference-faithful) or — the 100 TB path — a DataFrame with a
        task_id column. Both routes converge on the same distributed wave
        loop: task results NEVER materialize on the driver (they are
        written straight to the task_log parquet; the driver sees counts)."""
        sig = inspect.signature(impl.enumerate)
        enumerated = (
            impl.enumerate(ctx, self.spark)
            if len(sig.parameters) >= 2
            else impl.enumerate(ctx)
        )
        if isinstance(enumerated, DataFrame):
            if "task_id" not in enumerated.columns:
                raise FlowError("DataFrame enumerate must include a task_id column")
            payload_cols = [c for c in enumerated.columns if c != "task_id"]
            tasks = enumerated.select(
                F.col("task_id").cast("string").alias("task_id"),
                F.to_json(F.struct(*payload_cols)).alias("payload"),
            )
        else:
            rows = []
            for t in enumerated:
                t = dict(t)
                task_id = str(t.pop("task_id", uuid.uuid4().hex))
                rows.append({"task_id": task_id, "payload": json.dumps(t)})
            if not rows:
                self.state.upsert_progress(flow_id, phase, ctx.handler, 0, 0)
                return
            n_parts = max(1, math.ceil(len(rows) / self.tasks_per_partition))
            tasks = self.spark.createDataFrame(
                pd.DataFrame(rows, columns=["task_id", "payload"])
            ).repartition(n_parts)
        self._run_waves(flow_id, phase, ctx, impl, tasks, epoch)

    # explicit read schema for committed task-log files (flow identity is
    # established by WHICH files the manifest/partition listing yields, not
    # by a column); pinning the schema keeps types stable across waves
    _TASK_LOG_SCHEMA = T.StructType(
        [
            T.StructField("phase", T.StringType()),
            T.StructField("handler", T.StringType()),
            T.StructField("task_id", T.StringType()),
            T.StructField("attempt", T.IntegerType()),
            T.StructField("status", T.StringType()),
            T.StructField("result", T.StringType()),
            T.StructField("ts", T.DoubleType()),
        ]
    )

    def _run_waves(
        self,
        flow_id: str,
        phase: str,
        ctx: HandlerContext,
        impl,
        tasks: DataFrame,
        epoch: int = 1,
    ) -> None:
        """The distributed wave loop shared by both enumerate routes.
        Results are written once to the task_log parquet (re-running the
        lazy plan would re-execute side-effecting processors) under the
        flow's hive partition, so every retry read prunes to one
        directory instead of scanning the ever-growing log.

        COMPETING CONSUMERS (reference worker.rb:72-85): each attempt's
        remaining tasks are split into `wave_slices` hash slices; every
        slice is processed by exactly one engine (exclusive file claim,
        StateStore.try_claim), and an attempt completes when every
        slice's wave has COMMITTED — by this engine or a peer sharing the
        state root. With the default wave_slices=1 this degenerates to
        the single-engine loop (one claim per attempt, zero contention).
        A peer that dies between claiming and committing is aged out by
        claim_lease_sec and its slice is re-run — the at-least-once
        redelivery window, same as the reference's unacked-message
        requeue (connector.rb:56-73); accounting stays effectively-once
        because task_results keeps the last attempt per task."""
        total = tasks.count()
        remaining = self._remaining_tasks(flow_id, phase, ctx.handler, tasks)
        remaining_cnt = remaining.count()
        self.state.upsert_progress(flow_id, phase, ctx.handler, total, remaining_cnt)
        # the slice count must be IDENTICAL across cooperating engines
        # (the slot namespace and the hash-slice predicate both derive
        # from it): the first engine into the phase PINS it via a config
        # claim; later engines adopt the pinned value, so replicas with
        # different wave_slices settings still split disjointly
        n_slices = max(1, min(self.wave_slices, total))
        cfg_key = f"{phase}.{ctx.handler}.e{epoch}.cfg"
        if not self.state.try_claim(
            flow_id, cfg_key, self.worker_id, meta={"n_slices": n_slices}
        ):
            info = self.state.claim_info(flow_id, cfg_key) or {}
            n_slices = int(info.get("n_slices", n_slices))

        attempt = 0
        while remaining_cnt:
            self._check_control(flow_id)
            attempt += 1
            if attempt > self.max_retries + 1:
                res = self.state.task_results(flow_id, phase)
                bad = res[(res.handler == ctx.handler) & (res.status != "ok")]
                raise PhaseFailed(phase, ctx.handler, list(bad.result.head(3)))
            self._cooperative_attempt(
                flow_id, phase, ctx, impl, remaining, epoch, attempt, n_slices
            )
            remaining = self._remaining_tasks(flow_id, phase, ctx.handler, tasks)
            remaining_cnt = remaining.count()
            self.state.upsert_progress(
                flow_id, phase, ctx.handler, total, remaining_cnt
            )

    def _remaining_tasks(
        self, flow_id: str, phase: str, handler: str, tasks: DataFrame
    ) -> DataFrame:
        """Tasks with no committed ok result — the anti-join stays a Spark
        plan over the committed log files (never a driver-side id list),
        so a million-task phase resumes without materializing anything."""
        files = self.state.committed_task_files(flow_id)
        if not files:
            return tasks
        ok = (
            self.spark.read.schema(self._TASK_LOG_SCHEMA)
            .parquet(*files)
            .filter(
                (F.col("phase") == phase)
                & (F.col("handler") == handler)
                & (F.col("status") == "ok")
            )
            .select("task_id")
        )
        return tasks.join(ok, "task_id", "left_anti")

    def _cooperative_attempt(
        self,
        flow_id: str,
        phase: str,
        ctx: HandlerContext,
        impl,
        remaining: DataFrame,
        epoch: int,
        attempt: int,
        n_slices: int,
    ) -> None:
        """Run attempt N as `n_slices` exclusively-claimed waves; return
        when every slice has committed (locally or by a peer engine)."""
        prefix = f"{phase}.{ctx.handler}.e{epoch}.a{attempt}"
        pending = set(range(n_slices))
        # engines start their scan at different slices, so two workers
        # arriving together immediately diverge instead of racing slot 0
        start = int(self.worker_id[:6], 16) % n_slices
        while pending:
            progressed = False
            for sl in sorted(pending, key=lambda s: (s - start) % n_slices):
                # control granularity = slice boundaries: pause/cancel
                # landing mid-attempt takes effect before the NEXT claim
                # (never between a claim and its commit), so an operator
                # action interrupts a many-slice attempt promptly and the
                # resumed epoch re-runs only unprocessed slices
                self._check_control(flow_id)
                key = f"{prefix}.s{sl}"
                if self.state.claim_done(flow_id, key):
                    pending.discard(sl)
                    progressed = True
                    continue
                won, stolen = self._claim_slice(flow_id, key)
                if not won:
                    continue
                slice_tasks = (
                    remaining
                    if n_slices == 1
                    else remaining.filter(
                        F.pmod(F.xxhash64("task_id"), F.lit(n_slices)) == sl
                    )
                )
                if stolen:
                    # the dead claimant may have committed before dying:
                    # re-exclude its results so the redelivery window only
                    # re-runs genuinely unlogged tasks
                    slice_tasks = self._remaining_tasks(
                        flow_id, phase, ctx.handler, slice_tasks
                    )
                with self._lease_heartbeat(flow_id, key):
                    self._process_wave(
                        flow_id, phase, ctx, impl, slice_tasks, attempt
                    )
                    self.state.mark_claim_done(flow_id, key, self.worker_id)
                pending.discard(sl)
                progressed = True
            if pending and not progressed:
                self._check_control(flow_id)
                time.sleep(self.poll_interval)

    def _steal_key(self, key: str, gen: int) -> str:
        return key + (".steal" if gen == 1 else f".steal{gen}")

    def _steal_chain(self, flow_id: str, key: str):
        """Walk key, key.steal, key.steal2, ... and return
        (newest_info, next_gen): the NEWEST claimant in the chain (the
        one whose liveness matters) and the generation a further steal
        would open."""
        info, g = self.state.claim_info(flow_id, key), 1
        while True:
            ni = self.state.claim_info(flow_id, self._steal_key(key, g))
            if ni is None:
                return info, g
            info, g = ni, g + 1

    def _claim_slice(self, flow_id: str, key: str) -> tuple[bool, bool]:
        """(won, stolen): claim the slice; repossess a chain claim THIS
        engine left uncommitted (its own crash-recovery re-run — within an
        engine a (phase, handler) slot never has two live claimants); or —
        if the NEWEST claimant in the steal chain has held it past the
        lease without committing — open the next steal generation. Steal
        claims are themselves lease-aged (a stealer that dies uncommitted
        is aged out by the next engine — no livelock on a single slot),
        while a live owner renews its lease from the wave heartbeat, so a
        slow wave is never stolen from a living worker.
        Repossessed/stolen slices re-exclude committed results before
        re-running (stolen=True)."""
        if self.state.try_claim(flow_id, key, self.worker_id):
            return True, False
        if self.state.claim_done(flow_id, key):
            return False, False
        info, next_gen = self._steal_chain(flow_id, key)
        if info is None:
            return False, False
        if info.get("owner") == self.worker_id:
            return True, True
        if time.time() - info["ts"] > self.claim_lease_sec and self.state.try_claim(
            flow_id, self._steal_key(key, next_gen), self.worker_id
        ):
            return True, True
        return False, False

    def _renew_claim_chain(self, flow_id: str, key: str) -> None:
        """Refresh the lease ts on every chain claim THIS engine owns
        (renew_claim no-ops on peers' claims)."""
        self.state.renew_claim(flow_id, key, self.worker_id)
        g = 1
        while True:
            sk = self._steal_key(key, g)
            if self.state.claim_info(flow_id, sk) is None:
                return
            self.state.renew_claim(flow_id, sk, self.worker_id)
            g += 1

    @contextmanager
    def _lease_heartbeat(self, flow_id: str, key: str):
        """Background lease renewal while a claimed wave runs: a
        live-but-slow owner keeps its claim fresh, so peers only age out
        claimants that actually died (reference: the broker's connection
        heartbeat keeps unacked deliveries owned; connector.rb:56-73)."""
        stop = threading.Event()
        period = max(0.05, self.claim_lease_sec / 3.0)
        # synchronous first renewal: a REPOSSESSED claim enters the wave
        # with a ts already past the lease — waiting period for the first
        # beat would leave it steal-eligible (a peer could open the next
        # steal generation against a live worker) for up to lease/3
        self._renew_claim_chain(flow_id, key)

        def beat() -> None:
            while not stop.wait(period):
                self._renew_claim_chain(flow_id, key)

        t = threading.Thread(target=beat, daemon=True)
        t.start()
        try:
            yield
        finally:
            stop.set()
            t.join(timeout=2.0)

    def _process_wave(
        self,
        flow_id: str,
        phase: str,
        ctx: HandlerContext,
        impl,
        tasks: DataFrame,
        attempt: int,
    ) -> None:
        results = self._wave_df(ctx, impl, tasks, attempt).select(
            F.lit(phase).alias("phase"),
            F.lit(ctx.handler).alias("handler"),
            "task_id",
            F.lit(attempt).cast("int").alias("attempt"),
            "status",
            "result",
            F.lit(time.time()).alias("ts"),
        )
        self._append_wave(results, flow_id)

    def _append_wave(self, results: DataFrame, flow_id: str,
                     batch_id: int | None = None,
                     worker: str | None = None) -> None:
        """Transactionally append a wave's results to the flow's task log.

        The Spark job writes to its own wave directory (concurrent handler
        threads never share a `_temporary` committer dir), and the wave
        becomes visible via `StateStore.commit_wave_manifest` — ONE atomic
        manifest write naming the wave's files, which stay in place. A
        crash at ANY point before the manifest leaves zero rows visible to
        readers (crash-injection-tested); there is no window where part of
        a wave can be seen, unlike a rename-files-into-partition loop.
        Same protocol shape as table-format commit logs (Delta/Iceberg):
        data files immutable where written, commits are single-object
        metadata writes — which is exactly what an object-store deployment
        needs (rename-free)."""
        wave_dir = os.path.join(self.state.root, "task_wave", uuid.uuid4().hex)
        results.write.mode("overwrite").parquet(wave_dir)
        files = sorted(
            os.path.join(wave_dir, f)
            for f in os.listdir(wave_dir)
            if f.endswith(".parquet")
        )
        self.state.commit_wave_manifest(flow_id, files, batch_id=batch_id,
                                        worker=worker)

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
