"""Flow-engine e2e tests, modeled on the reference's fixture flow
(spec/fixtures/simple_flow.json) and the news-pipeline example
(examples/controller:19-50, examples/worker:70-118)."""

import json
import tempfile

import pytest

from distribot_spark.flow import FlowEngine, FlowSpec
from distribot_spark.flow.engine import PhaseFailed
from distribot_spark.flow.examples import NEWS_FLOW, example_registry

@pytest.fixture()
def engine(spark):
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
