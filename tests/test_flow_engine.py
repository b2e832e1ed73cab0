"""Flow-engine e2e tests, modeled on the reference's fixture flow
(spec/fixtures/simple_flow.json) and the news-pipeline example
(examples/controller:19-50, examples/worker:70-118)."""

import json
import os
import tempfile

import pytest

from distribot_spark.flow import FlowEngine, FlowSpec
from distribot_spark.flow.engine import PhaseFailed
from distribot_spark.flow.examples import NEWS_FLOW, example_registry

@pytest.fixture()
def engine(spark):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return FlowEngine(
        spark, tempfile.mkdtemp(prefix="flow_", dir="/root/repo/.tmp"),
        registry=example_registry(), tasks_per_partition=5,
    )


def test_news_flow_end_to_end(engine):
    fid, result = engine.run_new(NEWS_FLOW)
    assert result == "finished"
    assert engine.finished(fid)
    # transition history: pending → listing → downloading → finished
    tos = [t["to"] for t in engine.state.transitions(fid)]
    assert tos == ["pending", "listing", "downloading", "finished"]
    # version resolution: ~> 1.0 must pick 1.2.0, not 2.0.0
    prog = engine.status(fid)
    handlers = set(prog.handler)
    assert "Lister@1.2.0" in handlers
    # multi-handler barrier: both handlers drained
    down = prog[prog.phase == "downloading"]
    assert set(down.handler) == {"Downloader@1.0.0", "Auditor@1.0.0"}
    assert (down.remaining == 0).all()
    # task results recorded once per task
    res = engine.state.task_results(fid, "listing")
    assert len(res) == 20
    assert (res.status == "ok").all()
    assert json.loads(res[res.task_id == "item-3"].iloc[0].result)["squared"] == 9
    assert engine.active() == []


def test_empty_phase_short_circuit(engine):
    spec = {
        "name": "empty",
        "phases": [
            {"name": "a", "is_initial": True, "transitions_to": "b"},
            {"name": "b", "transitions_to": "c"},
            {"name": "c", "is_final": True},
        ],
    }
    fid, result = engine.run_new(spec)
    assert result == "finished"
    assert [t["to"] for t in engine.state.transitions(fid)] == ["a", "b", "c"]


def test_error_routing_to_error_phase(engine):
    spec = {
        "name": "failing",
        "phases": [
            {"name": "start", "is_initial": True, "transitions_to": "work"},
            {
                "name": "work",
                "transitions_to": "finished",
                "on_error_transition_to": "error",
                "handlers": ["AlwaysFails"],
            },
            {"name": "error", "is_final": True, "handlers": ["ErrorEmailer"]},
            {"name": "finished", "is_final": True},
        ],
    }
    fid, result = engine.run_new(spec)
    assert result == "finished"
    tos = [t["to"] for t in engine.state.transitions(fid)]
    assert tos == ["start", "work", "error"]
    emailed = engine.state.task_results(fid, "error")
    assert (emailed.status == "ok").all()


def test_unrouted_failure_raises(engine):
    spec = {
        "name": "failing-hard",
        "phases": [
            {"name": "work", "is_initial": True, "handlers": ["AlwaysFails"]},
        ],
    }
    fid = engine.create_flow(spec)
    with pytest.raises(PhaseFailed):
        engine.run(fid)


def test_pause_resume(engine):
    fid = engine.create_flow(NEWS_FLOW)
    engine.pause(fid)
    assert engine.paused(fid)
    assert engine.run(fid) == "paused"
    with pytest.raises(Exception):
        engine.pause(fid)  # guard: already paused (flow.rb:72)
    engine.resume(fid)
    assert not engine.paused(fid)
    assert engine.run(fid) == "finished"
    with pytest.raises(Exception):
        engine.resume(fid)  # guard: not paused (flow.rb:80-82)


def test_cancel_drains(engine):
    fid = engine.create_flow(NEWS_FLOW)
    engine.cancel(fid)
    assert engine.run(fid) == "canceled"
    assert engine.canceled(fid)
    assert engine.current_phase(fid) == "canceled"
    assert fid not in engine.active()
    with pytest.raises(Exception):
        engine.cancel(fid)  # guard: not running


def test_spec_validation():
    with pytest.raises(ValueError, match="is_initial"):
        FlowSpec.parse({"name": "x", "phases": [{"name": "a"}]})
    with pytest.raises(ValueError, match="unknown phase"):
        FlowSpec.parse(
            {"name": "x", "phases": [{"name": "a", "is_initial": True,
                                      "transitions_to": "nope"}]}
        )
    with pytest.raises(ValueError, match="cycle"):
        FlowSpec.parse(
            {"name": "x", "phases": [
                {"name": "a", "is_initial": True, "transitions_to": "b"},
                {"name": "b", "transitions_to": "a"},
            ]}
        )


def test_version_resolution():
    reg = example_registry()
    assert reg.best_version("Lister", "~> 1.0") == "1.2.0"
    assert reg.best_version("Lister", None) == "2.0.0"
    assert reg.best_version("Lister", ">=2.0") == "2.0.0"
    with pytest.raises(LookupError):
        reg.best_version("Lister", ">=3.0")
    with pytest.raises(LookupError):
        reg.best_version("Nope", None)


def test_retry_effectively_once(engine):
    """Failed tasks retry; succeeded tasks never re-run (the reference is
    at-least-once with visible double-processing — we get effectively-once
    via the task_id-keyed log)."""
    spec = {
        "name": "flaky",
        "phases": [
            {"name": "work", "is_initial": True, "handlers": ["FlakyWorker"]},
        ],
    }
    fid, result = engine.run_new(spec)
    assert result == "finished"
    res = engine.state.task_results(fid, "work")
    assert len(res) == 9
    assert (res.status == "ok").all()
    # tasks i%3==0 needed a second attempt; the rest succeeded on the first
    retried = res[res.task_id.isin([f"flaky-{i}" for i in (0, 3, 6)])]
    assert (retried.attempt == 2).all()
    clean = res[~res.task_id.isin([f"flaky-{i}" for i in (0, 3, 6)])]
    assert (clean.attempt == 1).all()


def test_ten_concurrent_flows(engine):
    """BASELINE.md target: ≥10 flows in flight concurrently. The state
    store is append-only with unique fragment names, so concurrent flows
    share one engine safely; Spark schedules their jobs concurrently."""
    from concurrent.futures import ThreadPoolExecutor

    flow = dict(NEWS_FLOW, data={"n_tasks": 5})
    fids = [engine.create_flow(flow) for _ in range(10)]
    with ThreadPoolExecutor(max_workers=10) as pool:
        results = list(pool.map(engine.run, fids))
    assert results == ["finished"] * 10
    assert all(engine.finished(f) for f in fids)
    assert engine.active() == []


def test_live_pause_mid_run(engine):
    """Control arriving WHILE the flow runs: pause lands at the next
    control checkpoint (wave/phase boundary — the documented deviation
    from the reference's per-task requeue), and resume+run completes
    without re-processing finished phases."""
    import threading
    import time

    from distribot_spark.flow.examples import SLOW_FLOW

    fid = engine.create_flow(SLOW_FLOW)
    result_box = {}

    def drive():
        result_box["r"] = engine.run(fid)

    t = threading.Thread(target=drive)
    t.start()
    time.sleep(1.0)  # mid-phase-1-ish
    engine.pause(fid)
    t.join(timeout=60)
    assert result_box["r"] == "paused"
    done_phases = {p for p in engine.status(fid).phase}
    assert "p3" not in done_phases, "pause must land before the last phase"
    engine.resume(fid)
    assert engine.run(fid) == "finished"
    tos = [x["to"] for x in engine.state.transitions(fid)]
    assert tos[-1] == "done" and "paused" in tos


def test_fanout_subscribers(engine):
    """R32: ANY number of subscribers observe one flow's events
    (reference fanout exchanges, connector.rb:75-89,134-138)."""
    seen_a, seen_b = [], []
    engine.subscribe(lambda ev, fid, p: seen_a.append((ev, fid)))
    engine.subscribe(
        lambda ev, fid, p: seen_b.append((ev, fid)), event="flow.finished"
    )
    fid, result = engine.run_new(NEWS_FLOW)
    assert result == "finished"
    # both subscribers saw the completion of the same flow
    assert ("flow.finished", fid) in seen_a
    assert seen_b == [("flow.finished", fid)]
    # the wildcard subscriber saw the whole lifecycle
    events = [ev for ev, f in seen_a if f == fid]
    assert events[0] == "flow.created"
    assert "phase.started" in events and "phase.finished" in events
    # persisted twin: a detached subscriber tailing state sees the same
    evs = [e["event"] for e in engine.events(fid)]
    assert evs[0] == "flow.created" and evs[-1] == "flow.finished"


def test_events_label_pause_resume_cancel(engine):
    """The persisted events() twin must mirror the live _emit stream:
    PAUSED/CANCELED pseudo-phase transitions surface as flow.paused /
    flow.resumed / flow.canceled — never as phase.started('paused')."""
    from distribot_spark.flow.examples import NEWS_FLOW

    fid = engine.create_flow(NEWS_FLOW)
    engine.pause(fid)
    engine.resume(fid)
    engine.pause(fid)
    engine.resume(fid)
    engine.cancel(fid)
    evs = engine.events(fid)
    names = [e["event"] for e in evs]
    assert names == [
        "flow.created", "flow.paused", "flow.resumed",
        "flow.paused", "flow.resumed", "flow.canceled",
    ]
    # pseudo-phase names never leak into the phase field
    assert all(e["phase"] not in ("paused", "canceled") for e in evs)
    # resumed events carry the phase being re-entered
    assert [e["phase"] for e in evs if e["event"] == "flow.resumed"] == [
        NEWS_FLOW_INITIAL := evs[0]["phase"], NEWS_FLOW_INITIAL]
    # exactly one canceled event (transition + control state don't double)
    assert names.count("flow.canceled") == 1


def test_subscriber_isolation(engine):
    """A raising subscriber must not break the flow (trycatch semantics)."""
    def boom(ev, fid, p):
        raise RuntimeError("bad subscriber")

    engine.subscribe(boom)
    fid, result = engine.run_new(NEWS_FLOW)
    assert result == "finished"


def test_parallel_handlers_within_phase(engine):
    """Handlers of one phase run concurrently: two handlers sleeping 2.5 s
    each must finish in well under the 5 s a sequential loop needs."""
    import time

    from distribot_spark.flow.examples import PARALLEL_FLOW

    t0 = time.time()
    fid, result = engine.run_new(PARALLEL_FLOW)
    elapsed = time.time() - t0
    assert result == "finished"
    assert elapsed < 5.0, f"phase took {elapsed:.1f}s — handlers ran sequentially"
    res = engine.state.task_results(fid, "naps")
    assert len(res) == 2 and (res.status == "ok").all()


def test_barrier_requires_all_declared_handlers(engine):
    """Crash-recovery barrier: handler A drained + driver died before
    handler B announced ⇒ re-entrant run() must still execute B (the
    phase is NOT drained just because every *present* row is)."""
    spec = {
        "name": "crashy",
        "phases": [
            {"name": "work", "is_initial": True, "transitions_to": "end",
             "handlers": ["Downloader", "Auditor"]},
            {"name": "end", "is_final": True},
        ],
    }
    fid = engine.create_flow(spec)
    # simulate the pre-crash state: only Downloader has progress rows
    engine.state.upsert_progress(fid, "work", "Downloader@1.0.0", 5, 0)
    assert not engine.state.phase_drained(
        fid, "work", ["Downloader@1.0.0", "Auditor@1.0.0"]
    )
    assert engine.run(fid) == "finished"
    res = engine.state.task_results(fid, "work")
    audited = res[res.handler == "Auditor@1.0.0"]
    assert len(audited) == 3 and (audited.status == "ok").all()


def test_task_results_keyed_per_handler(engine):
    """Two handlers emitting the SAME task_id in one phase must not mask
    each other's rows (effectively-once is per (handler, task_id))."""
    engine.state.log_tasks([
        {"flow_id": "f1", "phase": "p", "handler": "A@1.0.0", "task_id": "t0",
         "attempt": 1, "status": "ok", "result": "{}"},
        {"flow_id": "f1", "phase": "p", "handler": "B@1.0.0", "task_id": "t0",
         "attempt": 1, "status": "failed", "result": "boom"},
    ])
    res = engine.state.task_results("f1", "p")
    assert len(res) == 2
    assert set(res.status) == {"ok", "failed"}


def test_status_phase_age(engine):
    fid, _ = engine.run_new(NEWS_FLOW)
    st = engine.status(fid)
    ages = st.phase_age_sec.dropna()
    assert not ages.empty and (ages >= 0).all()


def test_stubbornly_infra_retry(engine, monkeypatch):
    """R13 infra-level retry: transient state-store IO failures are
    retried with backoff instead of failing the flow (reference
    `stubbornly`, flow.rb:154-163)."""
    import pyarrow.parquet as pq

    real_write = pq.write_table
    calls = {"n": 0}

    def flaky_write(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("transient fs error")
        return real_write(*args, **kwargs)

    monkeypatch.setattr(
        "distribot_spark.flow.state.pq.write_table", flaky_write
    )
    engine.state.save_flow("sf1", "n", "{}", "{}")
    assert calls["n"] == 3  # two transient failures absorbed
    assert engine.state.find_flow("sf1") is not None

    def always_fails(*args, **kwargs):
        raise OSError("permanent fs error")

    monkeypatch.setattr(
        "distribot_spark.flow.state.pq.write_table", always_fails
    )
    with pytest.raises(OSError):  # bounded: a broken root still fails loudly
        engine.state.save_flow("sf2", "n", "{}", "{}")


def test_task_log_read_prunes_partitions(engine):
    """The retry-wave read of the task_log must prune to the flow's hive
    partition (PartitionFilters), not filter a full scan."""
    import os

    from pyspark.sql import functions as F

    from distribot_spark.flow.engine import FlowEngine
    from distribot_spark.plans import explain_string

    spec = {
        "name": "tiny",
        "data": {"n_tasks": 4},
        "phases": [
            {"name": "fanout", "is_initial": True, "handlers": ["BigLister"]},
        ],
    }
    fid, result = engine.run_new(spec)
    assert result == "finished"
    log_dir = os.path.join(engine.state.root, "task_log")
    df = (
        engine.spark.read.schema(FlowEngine._TASK_LOG_SCHEMA)
        .parquet(log_dir)
        .filter(F.col("flow_id") == fid)
    )
    plan = explain_string(df)
    assert "PartitionFilters" in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "flow_id" in m.group(1), plan


def test_dataframe_enumerate(engine):
    """The 100 TB enumerate path: handler returns a DataFrame; tasks never
    hit the driver, results land in the task_log parquet directly."""
    spec = {
        "name": "big",
        "data": {"n_tasks": 500},
        "phases": [
            {"name": "fanout", "is_initial": True, "handlers": ["BigLister"]},
        ],
    }
    fid, result = engine.run_new(spec)
    assert result == "finished"
    res = engine.state.task_results(fid, "fanout")
    assert len(res) == 500
    assert (res.status == "ok").all()
    row = res[res.task_id == "42"].iloc[0]
    assert json.loads(row.result)["double"] == 84
    prog = engine.status(fid)
    assert prog.iloc[0].total == 500 and prog.iloc[0].remaining == 0


def test_wave_commit_is_atomic_under_crash(engine, monkeypatch):
    """Crash injection for the manifest commit protocol: kill the
    orchestrator between the wave's distributed parquet write and the
    manifest commit. Readers must see ZERO rows of the half-written wave
    (no partial-wave window), and a re-run must complete the flow with
    exactly-once task accounting."""
    import glob
    import os

    from distribot_spark.flow.state import StateStore

    real_commit = StateStore.commit_wave_manifest

    def crash_before_commit(self, flow_id, files, **kwargs):
        raise RuntimeError("injected crash between staging write and commit")

    monkeypatch.setattr(StateStore, "commit_wave_manifest", crash_before_commit)
    fid = engine.create_flow(NEWS_FLOW)
    with pytest.raises(RuntimeError, match="injected crash"):
        engine.run(fid)

    # the wave's data files exist on disk...
    staged = glob.glob(os.path.join(engine.state.root, "task_wave", "*", "*.parquet"))
    assert staged, "crash happened after the staging write"
    # ...but NO reader sees any of it: not the pandas-side API
    assert engine.state.task_results(fid).empty
    # not the committed-file listing the Spark-side retry read uses
    assert engine.state.committed_task_files(fid) == []

    # recovery: a fresh orchestrator process (same state root) re-runs the
    # flow to completion with exactly-once accounting
    monkeypatch.setattr(StateStore, "commit_wave_manifest", real_commit)
    assert engine.run(fid) == "finished"
    res = engine.state.task_results(fid, "listing")
    assert len(res) == 20
    assert (res.status == "ok").all()
    assert res.attempt.le(2).all(), "recovered run must not re-burn attempts"


# ---------------------------------------------------------------------------
# Live capability registration (deploy-is-register,
# phase_started_handler.rb:59-67: versions discovered at PHASE START)


def test_deploy_mid_flow_picked_up_by_next_phase(engine):
    """Registering a newer handler version mid-flow is picked up by the
    next phase's resolution — the reference's list-live-queues-at-phase-
    start behavior, against the shared capabilities table."""
    from distribot_spark.flow.examples import ListerV15

    spec = {
        "name": "rolling_deploy",
        "data": {"n_tasks": 4},
        "phases": [
            {"name": "first", "is_initial": True, "transitions_to": "second",
             "handlers": [{"name": "Lister", "version": "~> 1.0"}]},
            {"name": "second", "transitions_to": "done",
             "handlers": [{"name": "Lister", "version": "~> 1.0"}]},
            {"name": "done", "is_final": True},
        ],
    }

    def on_phase_finished(event, flow_id, payload):
        if payload.get("phase") == "first":
            engine.deploy("Lister", "1.5.0", ListerV15())

    engine.subscribe(on_phase_finished, event="phase.finished")
    fid, result = engine.run_new(spec)
    assert result == "finished"
    handlers = set(engine.status(fid).handler)
    # phase 1 resolved before the deploy, phase 2 after — same requirement
    assert "Lister@1.2.0" in handlers and "Lister@1.5.0" in handlers
    res = engine.state.task_results(fid, "second")
    assert all(
        json.loads(r)["lister_version"] == "1.5.0" for r in res.result
    )


def test_capability_resolution_across_engines(spark, engine):
    """A handler deployed by ONE engine is resolvable by a DIFFERENT
    engine (empty local registry) sharing the state root: the capability
    row carries the class path, the resolver imports and instantiates."""
    from distribot_spark.flow import FlowEngine
    from distribot_spark.flow.examples import SoloHandler
    from distribot_spark.flow.registry import HandlerRegistry

    engine.deploy("SoloWorker", "1.0.0", SoloHandler())

    other = FlowEngine(spark, engine.state.root, registry=HandlerRegistry(),
                       tasks_per_partition=5)
    version, impl = other._resolve("SoloWorker", None)
    assert version == "1.0.0" and isinstance(impl, SoloHandler)

    spec = {
        "name": "solo",
        "phases": [
            {"name": "work", "is_initial": True, "handlers": ["SoloWorker"]},
        ],
    }
    fid, result = other.run_new(spec)
    assert result == "finished"
    res = other.state.task_results(fid, "work")
    assert len(res) == 3 and (res.status == "ok").all()


def test_capability_semver_still_governs(engine):
    """Live versions join the candidate set but the phase requirement
    still filters: a deployed 9.x does not hijack a ~> 1.0 phase."""
    from distribot_spark.flow.examples import ListerV15

    engine.deploy("Lister", "9.9.9", ListerV15())
    v_any, _ = engine._resolve("Lister", None)
    v_pinned, _ = engine._resolve("Lister", "~> 1.0")
    assert v_any == "9.9.9"
    assert v_pinned == "1.2.0"
