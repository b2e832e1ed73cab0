"""Flow-engine state tables (replacing the reference's Redis keys).

Four append-only/upserted parquet tables under a state root
(FIXTURES.md §B3–B5 schemas):

- flows:       flow_id, name, spec(json), data(json), created_at
               (Redis `…:definition` key, flow.rb:34-38)
- transitions: flow_id, from, to, ts
               (Redis transition set, flow.rb:118,126-134)
- progress:    flow_id, phase, handler, total, remaining
               (Redis `….finished[.total]` counters, worker.rb:102,124-126;
               here upserted transactionally per wave, fixing the
               get-then-act race of task_finished_handler.rb:9-11)
- task_log:    phase, handler, task_id, attempt, status, result, hive-
               partitioned by flow_id (effectively-once accounting keyed
               on (handler, task_id); reads prune to one flow's directory)

The orchestrator is the single writer, so plain parquet + last-writer-wins
reads give the MERGE semantics a multi-writer deployment would get from
Delta/Iceberg; every read API is also expressible as a Spark query over
the same files (status() below does exactly that).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _now() -> float:
    # epoch-seconds float, as the reference stores (flow.rb:35)
    return time.time()


def stubbornly(fn, *args, attempts: int = 5, base_delay: float = 0.05, **kwargs):
    """Bounded-backoff retry for transient infrastructure failures — the
    reference's `stubbornly` (flow.rb:154-163, connector.rb:147-160) wraps
    every Redis/AMQP call in *infinite* retry; here the state store is
    filesystem parquet, and we bound attempts so a genuinely broken root
    fails loudly instead of hanging the orchestrator forever."""
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception:  # noqa: BLE001 — transient IO is exactly the target
            if i == attempts - 1:
                raise
            time.sleep(base_delay * (2 ** i))


class StateStore:
    def __init__(self, root: str) -> None:
        self.root = root
        for sub in ("flows", "transitions", "progress", "task_log", "control"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)

    @property
    def storage(self):
        """Coordination primitives (work claims, done markers) go
        through the storage seam so competing engines coordinate
        correctly on a conditional-put-only object store. Resolved
        lazily per operation, like TableLog.storage, so a test-wide
        `set_default_backend` override applies to live stores."""
        from distribot_spark.sources.storage import get_backend

        return get_backend()

    # -- generic append/read (parquet fragments per write) ------------------

    def _append(self, table: str, rows: list[dict], schema: pa.Schema) -> None:
        if not rows:
            return
        d = os.path.join(self.root, table)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{time.time_ns()}_{uuid.uuid4().hex[:8]}.parquet")

        def _atomic_write() -> None:
            # tmp + rename: a crash mid-write leaves a .tmp readers skip,
            # never a torn .parquet that poisons every later read
            pq.write_table(pa.Table.from_pylist(rows, schema=schema), path + ".tmp")
            os.replace(path + ".tmp", path)

        stubbornly(_atomic_write)

    def _read(self, table: str) -> pd.DataFrame:
        d = os.path.join(self.root, table)
        if not os.path.isdir(d):
            return pd.DataFrame()
        frames = [stubbornly(pq.read_table, os.path.join(d, f)).to_pandas()
                  for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    # -- flows ---------------------------------------------------------------

    _FLOWS = pa.schema(
        [("flow_id", pa.string()), ("name", pa.string()), ("spec", pa.string()),
         ("data", pa.string()), ("created_at", pa.float64())]
    )

    def save_flow(self, flow_id: str, name: str, spec_json: str, data_json: str) -> None:
        self._append(
            "flows",
            [{"flow_id": flow_id, "name": name, "spec": spec_json,
              "data": data_json, "created_at": _now()}],
            self._FLOWS,
        )

    def find_flow(self, flow_id: str) -> dict | None:
        df = self._read("flows")
        if df.empty:
            return None
        hit = df[df.flow_id == flow_id]
        return None if hit.empty else hit.iloc[-1].to_dict()

    def all_flows(self) -> pd.DataFrame:
        return self._read("flows")

    # -- transitions ----------------------------------------------------------

    _TRANSITIONS = pa.schema(
        [("flow_id", pa.string()), ("from", pa.string()), ("to", pa.string()),
         ("ts", pa.float64())]
    )

    def add_transition(self, flow_id: str, from_phase: str | None, to_phase: str) -> None:
        self._append(
            "transitions",
            [{"flow_id": flow_id, "from": from_phase, "to": to_phase, "ts": _now()}],
            self._TRANSITIONS,
        )

    def transitions(self, flow_id: str) -> list[dict]:
        """Sorted by ts, like the reference's client-side sort_by
        (flow.rb:133)."""
        df = self._read("transitions")
        if df.empty:
            return []
        df = df[df.flow_id == flow_id].sort_values("ts", kind="stable")
        return df.to_dict("records")

    def current_phase(self, flow_id: str) -> str | None:
        """Latest transition's `to` (flow.rb:136-143); the Spark-side
        equivalent is row_number() over (partition by flow_id
        order by ts desc) = 1."""
        ts = self.transitions(flow_id)
        return ts[-1]["to"] if ts else None

    # -- progress counters ------------------------------------------------------

    _PROGRESS = pa.schema(
        [("flow_id", pa.string()), ("phase", pa.string()), ("handler", pa.string()),
         ("total", pa.int64()), ("remaining", pa.int64()), ("ts", pa.float64())]
    )

    def upsert_progress(
        self, flow_id: str, phase: str, handler: str, total: int, remaining: int
    ) -> None:
        """One atomic append per wave; the current value of a counter is the
        latest row for the key (MERGE-as-append + last-wins read)."""
        self._append(
            "progress",
            [{"flow_id": flow_id, "phase": phase, "handler": handler,
              "total": int(total), "remaining": int(remaining), "ts": _now()}],
            self._PROGRESS,
        )

    def progress(self, flow_id: str, phase: str | None = None) -> pd.DataFrame:
        """Latest counter row per (phase, handler)."""
        df = self._read("progress")
        if df.empty:
            return df
        df = df[df.flow_id == flow_id]
        if phase is not None:
            df = df[df.phase == phase]
        if df.empty:
            return df
        df = df.sort_values("ts", kind="stable")
        return df.groupby(["phase", "handler"], as_index=False).last()

    def phase_drained(
        self, flow_id: str, phase: str, handlers: list[str] | None = None
    ) -> bool:
        """The *intended* barrier of the reference: every handler of the
        phase has remaining == 0 (fixes the key bug at
        handler_finished_handler.rb:22 that ends a phase when the first
        handler drains).

        ``handlers`` is the phase's full declared handler list; when given,
        a remaining==0 row must exist for EVERY one of them — rows merely
        *present* are not enough (a crash between handler A draining and
        handler B's first progress row must not mark the phase drained)."""
        df = self.progress(flow_id, phase)
        if df.empty:
            return False
        drained = set(df[df.remaining == 0].handler)
        pending = set(df[df.remaining != 0].handler)
        if pending:
            return False
        if handlers is not None:
            return set(handlers) <= drained
        return True

    # -- task log (effectively-once) ----------------------------------------------
    # Laid out hive-partitioned by flow_id (task_log/flow_id=<id>/...): the
    # log only grows across flows, and both this store's reads and the
    # engine's Spark-side retry reads prune to one directory instead of
    # filtering an ever-growing scan. Data files do NOT contain the flow_id
    # column (it lives in the path), matching Spark's partitionBy layout so
    # the engine's distributed waves append to the same structure.

    _TASK_LOG_FILE = pa.schema(
        [("phase", pa.string()), ("handler", pa.string()),
         ("task_id", pa.string()), ("attempt", pa.int32()), ("status", pa.string()),
         ("result", pa.string()), ("ts", pa.float64())]
    )

    def commit_wave_manifest(self, flow_id: str, files: list[str],
                             batch_id: int | None = None,
                             worker: str | None = None) -> None:
        """Atomically commit a distributed wave: ONE manifest file names
        the wave's data files (which stay where the Spark job wrote them,
        outside any reader's directory listing). The commit is a single
        tmp-write + rename — on an object store, a single PUT — so readers
        observe either the whole wave or none of it; a crash before the
        manifest leaves only invisible staging garbage. This replaces the
        earlier rename-files-into-the-partition loop, whose mid-loop crash
        exposed a partial wave.

        ``batch_id`` (continuous flows only) tags the manifest with the
        streaming micro-batch that produced the wave; because it rides the
        SAME atomic write as the data commit, ``max_committed_batch`` is an
        exact replay watermark — there is no crash window in which a batch
        is committed but unidentifiable, or identified but uncommitted."""
        part_dir = os.path.join(self.root, "task_log", f"flow_id={flow_id}")
        os.makedirs(part_dir, exist_ok=True)
        name = f"wave-{time.time_ns()}-{uuid.uuid4().hex[:8]}.manifest.json"
        tmp = os.path.join(part_dir, name + ".tmp")
        payload = {"files": sorted(files)}
        if batch_id is not None:
            payload["batch_id"] = batch_id
        if worker is not None:
            # sharded continuous mode: batch ids are per-WORKER sequences
            # (each worker replica runs its own streaming query), so the
            # replay watermark must be scoped to the committing worker
            payload["worker"] = worker
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, os.path.join(part_dir, name))

    def max_committed_batch(self, flow_id: str,
                            worker: str | None = None) -> int:
        """Highest streaming micro-batch id among committed wave manifests
        (-1 if none): the restart watermark for continuous flows. With
        ``worker`` given, only that worker replica's manifests count —
        sharded runners have independent batch-id sequences."""
        part_dir = os.path.join(self.root, "task_log", f"flow_id={flow_id}")
        if not os.path.isdir(part_dir):
            return -1
        best = -1
        for f in os.listdir(part_dir):
            if f.endswith(".manifest.json"):
                with open(os.path.join(part_dir, f)) as fh:
                    payload = json.load(fh)
                if payload.get("worker") == worker:
                    best = max(best, payload.get("batch_id", -1))
        return best

    def committed_task_files(self, flow_id: str) -> list[str]:
        """Every committed task-log data file for one flow: the atomically
        written single-file appends in the partition dir, plus each wave
        manifest's file list. Anything else (staging dirs, .tmp files) is
        invisible by construction."""
        part_dir = os.path.join(self.root, "task_log", f"flow_id={flow_id}")
        if not os.path.isdir(part_dir):
            return []
        out: list[str] = []
        for f in sorted(os.listdir(part_dir)):
            p = os.path.join(part_dir, f)
            if f.endswith(".parquet"):
                out.append(p)
            elif f.endswith(".manifest.json"):
                with open(p) as fh:
                    out.extend(json.load(fh)["files"])
        return out

    def log_tasks(self, rows: list[dict]) -> None:
        by_flow: dict[str, list[dict]] = {}
        for r in rows:
            r = dict(r)
            r.setdefault("ts", _now())
            fid = r.pop("flow_id")
            by_flow.setdefault(fid, []).append(r)
        for fid, frows in by_flow.items():
            self._append(
                os.path.join("task_log", f"flow_id={fid}"), frows,
                self._TASK_LOG_FILE,
            )

    def task_results(self, flow_id: str, phase: str | None = None) -> pd.DataFrame:
        """Last attempt per (handler, task_id) wins — retries of an
        already-succeeded task can't double-count (the reference visibly
        double-processes under redelivery; README.md caveats it), and two
        handlers emitting the same task_id in one phase can't mask each
        other's results."""
        files = self.committed_task_files(flow_id)
        if not files:
            return pd.DataFrame()
        frames = [stubbornly(pq.read_table, p).to_pandas() for p in files]
        df = pd.concat(frames, ignore_index=True)
        df = df.assign(flow_id=flow_id)
        if phase is not None:
            df = df[df.phase == phase]
        if df.empty:
            return df
        df = df.sort_values(["handler", "task_id", "attempt"], kind="stable")
        return df.groupby(["handler", "task_id"], as_index=False).last()

    # -- capabilities (deploy-is-register, phase_started_handler.rb:59-67) ------
    # The reference discovers handler versions by listing LIVE RabbitMQ
    # queues at phase start — deploying a worker IS registering it. Here
    # the live medium is a shared `capabilities` table: FlowEngine.deploy
    # appends (name, version, module, qualname), and every engine on the
    # state root resolves phase handlers against local ∪ table versions
    # at PHASE START, so a version deployed mid-flow is picked up by the
    # next phase with no engine restart.

    _CAPABILITIES = pa.schema(
        [("name", pa.string()), ("version", pa.string()),
         ("module", pa.string()), ("qualname", pa.string()),
         ("worker", pa.string()), ("ts", pa.float64())]
    )

    def register_capability(
        self, name: str, version: str, module: str, qualname: str, worker: str
    ) -> None:
        self._append(
            "capabilities",
            [{"name": name, "version": version, "module": module,
              "qualname": qualname, "worker": worker, "ts": _now()}],
            self._CAPABILITIES,
        )

    def capabilities(self) -> pd.DataFrame:
        """Latest row per (name, version) — re-deploying a version points
        it at the newest class path."""
        df = self._read("capabilities")
        if df.empty:
            return df
        df = df.sort_values("ts", kind="stable")
        return df.groupby(["name", "version"], as_index=False).last()

    # -- work claims (competing engines, reference worker.rb:72-85) -------------
    # The reference deploys N worker replicas against one shared queue; the
    # broker gives each task to exactly one consumer. Here the shared medium
    # is the state root, and exclusivity comes from the storage seam's
    # conditional create (`StorageBackend.put_if_absent`: tmp-then-link(2)
    # on POSIX, an If-None-Match PUT on an object store). A claim key names
    # a unit of work (one wave slice, one phase transition); exactly one
    # engine process wins each key. Leases live in claim BODIES (renewed by
    # rewriting the object), never in mtimes.

    def _claim_path(self, flow_id: str, key: str) -> str:
        import hashlib
        import re

        safe = re.sub(r"[^A-Za-z0-9._@=-]", "_", key)
        suffix = hashlib.md5(key.encode()).hexdigest()[:8]
        return os.path.join(
            self.root, "claims", f"flow_id={flow_id}", f"{safe}-{suffix}"
        )

    def try_claim(self, flow_id: str, key: str, owner: str,
                  meta: dict | None = None) -> bool:
        """Atomically claim `key`; True iff THIS caller created the claim.
        Exactly-one-winner across threads and processes sharing the root.
        ``meta`` rides in the claim body — the winner can pin shared
        configuration (e.g. an attempt's slice count) that losers adopt
        via claim_info."""
        path = self._claim_path(flow_id, key) + ".claim"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # The storage seam's conditional create: atomic one-winner AND
        # full-body-or-nothing, so a loser can never read a
        # half-written meta (e.g. the n_slices config pin) and
        # silently fall back to its own value. On POSIX this is the
        # old tmp-then-link(2); on an object store it is the
        # If-None-Match PUT — the claim table works on either.
        body = json.dumps(
            {"owner": owner, "ts": _now(), "key": key, **(meta or {})}
        ).encode()
        return self.storage.put_if_absent(path, body)

    def claim_info(self, flow_id: str, key: str) -> dict | None:
        """Owner/ts of an existing claim (None if unclaimed). A claim whose
        body was never written (crash between create and write) reports its
        file mtime as ts, so lease-based stealing still ages it out."""
        path = self._claim_path(flow_id, key) + ".claim"
        if not os.path.exists(path):
            return None
        try:
            with open(path) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, OSError):
            return {"owner": None, "ts": os.path.getmtime(path), "key": key}

    def renew_claim(self, flow_id: str, key: str, owner: str) -> None:
        """Refresh the lease timestamp of a claim this owner holds. Called
        periodically while the claimed work unit is still running, so a
        live-but-slow owner is not aged out by lease-based stealing.
        Atomic (tmp + rename); no-op if the claim is not this owner's."""
        path = self._claim_path(flow_id, key) + ".claim"
        info = self.claim_info(flow_id, key)
        if not info or info.get("owner") != owner:
            return
        info["ts"] = _now()
        # unconditional whole-object PUT: the lease lives in the BODY
        # (an object store's listing mtime is the upload time — a
        # holder cannot refresh it), so renewal rewrites the object
        self.storage.put(path, json.dumps(info).encode())

    def mark_claim_done(self, flow_id: str, key: str, owner: str) -> None:
        """Record that the claimed work unit COMMITTED (its wave manifest /
        transition is durable). tmp+rename, so `.done` is all-or-nothing."""
        path = self._claim_path(flow_id, key) + ".done"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.storage.put(
            path,
            json.dumps({"owner": owner, "ts": _now(), "key": key}).encode())

    def claim_done(self, flow_id: str, key: str) -> bool:
        return os.path.exists(self._claim_path(flow_id, key) + ".done")

    def claims(self, flow_id: str) -> pd.DataFrame:
        """All claims + done markers for a flow (test/ops introspection):
        columns key, owner, ts, done, done_owner."""
        d = os.path.join(self.root, "claims", f"flow_id={flow_id}")
        if not os.path.isdir(d):
            return pd.DataFrame(
                columns=["key", "owner", "ts", "done", "done_owner"]
            )
        rows = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".claim"):
                continue
            with open(os.path.join(d, f)) as fh:
                try:
                    info = json.load(fh)
                except json.JSONDecodeError:
                    info = {"owner": None, "ts": None, "key": f[:-6]}
            done_path = os.path.join(d, f[:-6] + ".done")
            done_owner = None
            if os.path.exists(done_path):
                with open(done_path) as fh:
                    done_owner = json.load(fh).get("owner")
            rows.append(
                {"key": info.get("key"), "owner": info.get("owner"),
                 "ts": info.get("ts"), "done": done_owner is not None,
                 "done_owner": done_owner}
            )
        return pd.DataFrame(rows)

    # -- worker liveness (reference queue/consumer introspection) ----------------
    # The reference can list live consumers by inspecting RabbitMQ queues
    # (Distribot.debug / rabbitmq management API); here engines announce
    # themselves in a `workers` table — one row per start/heartbeat — and
    # liveness is last-heartbeat recency. Ops introspection only: claims,
    # not heartbeats, fence the actual work.

    _WORKERS = pa.schema(
        [("worker", pa.string()), ("host", pa.string()), ("pid", pa.int64()),
         ("ts", pa.float64())]
    )

    def worker_heartbeat(self, worker: str) -> None:
        import socket

        self._append(
            "workers",
            [{"worker": worker, "host": socket.gethostname(),
              "pid": int(os.getpid()), "ts": _now()}],
            self._WORKERS,
        )

    def workers(self, ttl_sec: float = 60.0) -> pd.DataFrame:
        """Engines whose last heartbeat is within ``ttl_sec``: columns
        worker, host, pid, last_seen (epoch), age_sec."""
        df = self._read("workers")
        if df.empty:
            return pd.DataFrame(
                columns=["worker", "host", "pid", "last_seen", "age_sec"]
            )
        df = df.sort_values("ts", kind="stable")
        last = df.groupby("worker", as_index=False).last()
        now = _now()
        last = last.rename(columns={"ts": "last_seen"})
        last["age_sec"] = (now - last.last_seen).round(3)
        return last[last.age_sec <= ttl_sec][
            ["worker", "host", "pid", "last_seen", "age_sec"]
        ].reset_index(drop=True)

    # -- control flags (pause/cancel) ------------------------------------------------

    _CONTROL = pa.schema(
        [("flow_id", pa.string()), ("action", pa.string()), ("ts", pa.float64())]
    )

    def set_control(self, flow_id: str, action: str) -> None:
        self._append("control", [{"flow_id": flow_id, "action": action, "ts": _now()}],
                     self._CONTROL)

    def control_state(self, flow_id: str) -> str | None:
        return self.read_control(self.root, flow_id)

    @staticmethod
    def read_control(root: str, flow_id: str) -> str | None:
        """Side-effect-free control read (no directory creation): safe to
        call from EXECUTORS — continuous-flow state functions poll this
        each micro-batch to honor live pause/cancel. The control table is
        tiny (one row per operator action), so a per-batch re-read costs a
        few file stats, not a scan."""
        d = os.path.join(root, "control")
        if not os.path.isdir(d):
            return None
        frames = [stubbornly(pq.read_table, os.path.join(d, f)).to_pandas()
                  for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not frames:
            return None
        df = pd.concat(frames, ignore_index=True)
        df = df[df.flow_id == flow_id].sort_values("ts", kind="stable")
        return None if df.empty else df.iloc[-1]["action"]
