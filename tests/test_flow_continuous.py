"""Continuous-flow mode: a flow spec consuming an UNBOUNDED task stream
(the reference's daemon model, lib/distribot/worker.rb:45-49) with live
pause / resume / cancel honored through the shared control table — no
query restart. See distribot_spark/flow/continuous.py.
"""

import os
import tempfile

import pandas as pd
import pytest

from distribot_spark.flow import ContinuousFlowRunner, FlowEngine
from distribot_spark.flow.continuous import write_task_chunk
from distribot_spark.flow.examples import (
    CONT_FLOW,
    FLAKY_CONT_FLOW,
    example_registry,
)
from distribot_spark.streaming.sources import FileReplaySource


@pytest.fixture()
def engine(spark):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return FlowEngine(
        spark, tempfile.mkdtemp(prefix="contflow_", dir="/root/repo/.tmp"),
        registry=example_registry(),
    )


def _chunk(start: int, n: int = 20) -> list[dict]:
    return [{"task_id": f"t-{i}", "item": i} for i in range(start, start + n)]


def test_continuous_flow_live_pause_resume_cancel(spark, engine):
    """One long-lived query; operator actions land mid-stream:

    chunk0 → processed; pause; chunk1 → buffered only; resume → backlog
    flushes with no new input (timeout-driven no-data batches); cancel;
    chunk2 → dropped as 'canceled'. Counts come from the committed task
    log (atomic wave manifests), the same accounting as batch flows."""
    src_dir = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    write_task_chunk(src_dir, _chunk(0))

    runner = ContinuousFlowRunner(
        engine, CONT_FLOW,
        FileReplaySource(src_dir, max_files_per_trigger=4),
        n_shards=4,
    )
    fid = runner.start()
    try:
        # both pipeline stages process chunk0
        runner.wait_for(lambda c: c.get(("label", "ok"), 0) == 20)
        assert runner.counts()[("square", "ok")] == 20

        # pause lands via the control table BEFORE chunk1 exists, so the
        # micro-batch that reads chunk1 must observe it and buffer
        engine.pause(fid)
        assert engine.paused(fid)
        write_task_chunk(src_dir, _chunk(20))
        runner.wait_for(lambda c: c.get(("_pending", "buffered"), 0) == 20)
        assert runner.counts()[("label", "ok")] == 20, "paused flow processed tasks"

        # resume flushes the buffered backlog without any new input file
        engine.resume(fid)
        runner.wait_for(lambda c: c.get(("label", "ok"), 0) == 40)
        assert runner.counts()[("square", "ok")] == 40

        # cancel drains: post-cancel arrivals are dropped, visibly
        engine.cancel(fid)
        assert engine.canceled(fid)
        write_task_chunk(src_dir, _chunk(40))
        runner.wait_for(lambda c: c.get(("_pending", "canceled"), 0) >= 20)
        assert runner.counts()[("label", "ok")] == 40
        assert runner.counts()[("square", "ok")] == 40
    finally:
        runner.stop()

    # stage chaining: stage 2 saw stage 1's output through the carry
    df = engine.state.task_results(fid)
    labels = df[(df.phase == "label") & (df.status == "ok")]
    assert '{"label": "item-3=9"}' in set(labels.result)
    # engine-level introspection works unchanged on a continuous flow
    assert engine.find(fid)["control"] == "canceled"
    events = [e["event"] for e in engine.events(fid)]
    assert events[0] == "flow.created"
    assert "flow.paused" in events and "flow.resumed" in events
    assert "flow.canceled" in events


def test_continuous_flow_retries_transient_failures(spark, engine):
    """Failed tasks re-enter shard state with attempt+1 (the reference's
    `stubbornly`, R13): every third item fails its first attempt, so the
    log must show 'retrying' attempt-1 rows superseded by ok attempt-2
    rows, with last-attempt-wins accounting ending all-ok."""
    src_dir = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    write_task_chunk(src_dir, _chunk(0, 12))

    runner = ContinuousFlowRunner(
        engine, FLAKY_CONT_FLOW,
        FileReplaySource(src_dir, max_files_per_trigger=4),
        n_shards=4,
    )
    fid = runner.start()
    try:
        runner.wait_for(lambda c: c.get(("work", "ok"), 0) == 12)
    finally:
        runner.stop()

    df = engine.state.task_results(fid)
    work = df[df.phase == "work"]
    # final state: every task ok, flaky ones on attempt 2
    assert set(work.status) == {"ok"}
    retried = work[work.attempt == 2]
    assert sorted(int(t.split("-")[1]) for t in retried.task_id) == [0, 3, 6, 9]
    assert (work[work.attempt == 1].status == "ok").all()


def test_continuous_flow_restart_from_checkpoint(spark, engine):
    """Kill the query mid-stream, add more input while it's down, restart
    with the same flow_id: the checkpoint resumes source offsets + shard
    state, the downtime backlog processes, and accounting shows each task
    exactly once (replayed micro-batches dedup via last-attempt-wins)."""
    src_dir = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    write_task_chunk(src_dir, _chunk(0))

    source = FileReplaySource(src_dir, max_files_per_trigger=4)
    runner = ContinuousFlowRunner(engine, CONT_FLOW, source, n_shards=4)
    fid = runner.start()
    try:
        runner.wait_for(lambda c: c.get(("label", "ok"), 0) == 20)
    finally:
        runner.stop()

    # while the query is DOWN: more tasks arrive
    write_task_chunk(src_dir, _chunk(20))

    runner2 = ContinuousFlowRunner(engine, CONT_FLOW, source, n_shards=4)
    assert runner2.start(flow_id=fid) == fid
    try:
        runner2.wait_for(lambda c: c.get(("label", "ok"), 0) == 40)
    finally:
        runner2.stop()

    df = engine.state.task_results(fid)
    ok = df[(df.phase == "label") & (df.status == "ok")]
    assert len(ok) == 40 and ok.task_id.nunique() == 40, (
        "each task must be accounted exactly once across the restart"
    )
    # engine.status() works for continuous flows and survives the restart
    # (counters seed from the committed log, so totals continue at 40)
    status = engine.status(fid)
    label_row = status[status.phase == "label"].iloc[0]
    assert label_row.total == 40 and label_row.remaining == 0
    assert label_row.pct == 100.0


def test_counters_exact_when_crash_lands_after_wave_commit(spark, engine,
                                                           monkeypatch):
    """The nastiest replay window: the micro-batch's wave manifest commits
    and THEN the sink dies, so Spark's epoch never commits and the batch
    replays on restart. The batch id rides the manifest's atomic write, so
    the restarted runner sees the wave as already counted and skips the
    replay — totals must be exact (20, not 40), and the task log must hold
    each task exactly once."""
    src_dir = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    write_task_chunk(src_dir, _chunk(0))

    real_append = FlowEngine._append_wave
    tripped = {"done": False}

    def commit_then_crash(self, results, flow_id, batch_id=None):
        real_append(self, results, flow_id, batch_id=batch_id)
        if batch_id is not None and not tripped["done"]:
            tripped["done"] = True
            raise RuntimeError("injected crash after wave commit")

    monkeypatch.setattr(FlowEngine, "_append_wave", commit_then_crash)

    source = FileReplaySource(src_dir, max_files_per_trigger=4)
    runner = ContinuousFlowRunner(engine, CONT_FLOW, source, n_shards=4)
    fid = runner.start()
    with pytest.raises(Exception, match="injected crash"):
        runner.wait_for(lambda c: False, timeout_sec=60)
    assert tripped["done"], "the crash must have fired after the commit"

    monkeypatch.setattr(FlowEngine, "_append_wave", real_append)
    runner2 = ContinuousFlowRunner(engine, CONT_FLOW, source, n_shards=4)
    assert runner2.start(flow_id=fid) == fid
    try:
        runner2.wait_for(lambda c: c.get(("label", "ok"), 0) == 20)
    finally:
        runner2.stop()

    df = engine.state.task_results(fid)
    ok = df[(df.phase == "label") & (df.status == "ok")]
    assert len(ok) == 20 and ok.task_id.nunique() == 20
    status = engine.status(fid)
    label_row = status[status.phase == "label"].iloc[0]
    assert label_row.total == 20 and label_row.remaining == 0


def test_two_continuous_flows_control_isolation(spark, engine):
    """Two flows share one engine/state store and run as independent
    queries (the reference's daemons serve many flows concurrently);
    pausing one must not affect the other, and accounting stays
    per-flow."""
    dir_a = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    dir_b = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    write_task_chunk(dir_a, _chunk(0, 10))
    write_task_chunk(dir_b, _chunk(100, 10))

    ra = ContinuousFlowRunner(
        engine, CONT_FLOW, FileReplaySource(dir_a, max_files_per_trigger=4),
        n_shards=2)
    rb = ContinuousFlowRunner(
        engine, CONT_FLOW, FileReplaySource(dir_b, max_files_per_trigger=4),
        n_shards=2)
    fa, fb = ra.start(), rb.start()
    assert fa != fb
    try:
        ra.wait_for(lambda c: c.get(("label", "ok"), 0) == 10)
        rb.wait_for(lambda c: c.get(("label", "ok"), 0) == 10)

        engine.pause(fa)  # pause A only
        write_task_chunk(dir_a, _chunk(10, 10))
        write_task_chunk(dir_b, _chunk(110, 10))
        # B processes its new chunk while A buffers its own
        rb.wait_for(lambda c: c.get(("label", "ok"), 0) == 20)
        ra.wait_for(lambda c: c.get(("_pending", "buffered"), 0) == 10)
        assert ra.counts()[("label", "ok")] == 10
        assert not engine.paused(fb)

        engine.resume(fa)
        ra.wait_for(lambda c: c.get(("label", "ok"), 0) == 20)
    finally:
        ra.stop()
        rb.stop()
    # accounting never bleeds between flows
    assert ra.counts()[("label", "ok")] == 20
    assert rb.counts()[("label", "ok")] == 20


def test_continuous_flow_over_rate_source(spark, engine):
    """Composition across the source seam: a continuous flow consuming
    the UNBOUNDED synthetic rate source (no files at all) — tasks are a
    pure function of the row counter, processed through the same
    pipeline stages, stopped by cancel."""
    from distribot_spark.streaming.sources import RateEventsSource

    class _RateTasks:
        bounded = False

        def load(self, sp):
            ev = RateEventsSource(rows_per_batch=20, num_partitions=2).load(sp)
            return ev.select(
                ev.event_id.cast("string").alias("task_id"),
                ev.event_id.alias("item"),
            )

    runner = ContinuousFlowRunner(engine, CONT_FLOW, _RateTasks(), n_shards=2)
    fid = runner.start()
    try:
        runner.wait_for(lambda c: c.get(("label", "ok"), 0) >= 40)
        engine.cancel(fid)
    finally:
        runner.stop()
    df = engine.state.task_results(fid)
    ok = df[(df.phase == "square") & (df.status == "ok")]
    # spot-check determinism: task k computed k^2
    import json
    results = {r.task_id: json.loads(r.result) for r in ok.itertuples()}
    assert results["7"] == {"squared": 49}
    assert engine.canceled(fid)


def test_continuous_multi_flow_soak(spark, engine):
    """Soak: THREE continuous flows over unbounded rate sources, one
    engine/state store, with interleaved control ops landing while all
    are live (the reference daemons' serve-many-flows mode). Exact task
    accounting at the end: per flow, every task appears in BOTH pipeline
    stages exactly once (raw committed rows, not just last-wins),
    buffered backlogs flush losslessly on resume, and a canceled flow's
    counts freeze."""
    import time as _time

    from distribot_spark.streaming.sources import RateEventsSource

    class _RateTasks:
        bounded = False

        def load(self, sp):
            ev = RateEventsSource(rows_per_batch=20, num_partitions=2).load(sp)
            return ev.select(
                ev.event_id.cast("string").alias("task_id"),
                ev.event_id.alias("item"),
            )

    runners = [
        ContinuousFlowRunner(engine, CONT_FLOW, _RateTasks(), n_shards=2)
        for _ in range(3)
    ]
    fids = [r.start() for r in runners]
    assert len(set(fids)) == 3
    try:
        for r in runners:
            r.wait_for(lambda c: c.get(("label", "ok"), 0) >= 20,
                       timeout_sec=90)

        # interleaved control: pause flows 0 and 2, leave 1 running
        engine.pause(fids[0])
        engine.pause(fids[2])
        runners[0].wait_for(lambda c: c.get(("_pending", "buffered"), 0) >= 10,
                            timeout_sec=90)
        runners[2].wait_for(lambda c: c.get(("_pending", "buffered"), 0) >= 10,
                            timeout_sec=90)
        frozen0 = runners[0].counts().get(("label", "ok"), 0)
        # flow 1 keeps processing while its siblings are paused
        runners[1].wait_for(lambda c: c.get(("label", "ok"), 0) >= 60,
                            timeout_sec=90)
        assert runners[0].counts().get(("label", "ok"), 0) == frozen0

        # resume 0: its backlog flushes and processing continues past it
        buffered0 = runners[0].counts().get(("_pending", "buffered"), 0)
        engine.resume(fids[0])
        runners[0].wait_for(
            lambda c: c.get(("label", "ok"), 0) >= frozen0 + buffered0,
            timeout_sec=90,
        )

        # cancel 2 while paused-with-backlog: backlog drops, counts freeze
        engine.cancel(fids[2])
        runners[2].wait_for(lambda c: c.get(("_pending", "canceled"), 0) >= 1,
                            timeout_sec=90)
        frozen2 = runners[2].counts().get(("label", "ok"), 0)
        _time.sleep(1.5)  # several more micro-batches
        assert runners[2].counts().get(("label", "ok"), 0) == frozen2
    finally:
        for r in runners:
            r.stop()

    # exact accounting from the committed log, per flow
    import pyarrow.parquet as pq

    for i, fid in enumerate(fids):
        res = engine.state.task_results(fid)
        work = res[~res.phase.str.startswith("_")]
        sq = work[(work.phase == "square") & (work.status == "ok")]
        lb = work[(work.phase == "label") & (work.status == "ok")]
        # a task that cleared stage 1 in a committed batch also cleared
        # stage 2 in that same batch (stages run in one state invocation)
        assert set(sq.task_id) == set(lb.task_id), f"flow {i} stage mismatch"
        assert sq.task_id.nunique() == len(sq), f"flow {i} double-counted"
        # RAW committed rows: each (phase, task) logged exactly once —
        # no restart happened, so even pre-dedup the log must be clean
        files = engine.state.committed_task_files(fid)
        raw = pd.concat([pq.read_table(p).to_pandas() for p in files])
        raw_ok = raw[(raw.status == "ok") & (raw.phase == "square")]
        assert len(raw_ok) == raw_ok.task_id.nunique(), (
            f"flow {i} raw log shows double-processing"
        )
        # status() parity on a continuous flow
        status = engine.status(fid)
        row = status[(status.phase == "label")].iloc[0]
        assert row.total == lb.task_id.nunique()


def test_sharded_runner_rejects_mismatched_n_workers(spark, engine):
    """The n_workers modulus is pinned per flow (first replica wins, via
    the shared claim table); a replica deployed with a different modulus
    is rejected at start() — pmod(h,2) vs pmod(h,3) shard filters would
    leave some task-id shards unowned (silent loss) and others doubly
    owned. The batch engine ADOPTS its pinned n_slices; here adoption is
    impossible (worker_index is meaningless under another modulus), so
    the replica fails fast instead."""
    fid = engine.create_flow(CONT_FLOW)
    # first replica's pin (what its start() records before launching)
    assert engine.state.try_claim(fid, "continuous.shardcfg", "w0",
                                  meta={"n_workers": 2})
    src_dir = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    write_task_chunk(src_dir, _chunk(0, 4))
    bad = ContinuousFlowRunner(
        engine, CONT_FLOW, FileReplaySource(src_dir),
        n_shards=2, worker_index=1, n_workers=3)
    with pytest.raises(ValueError, match="pinned to n_workers=2"):
        bad.start(flow_id=fid)
    # a replica with the MATCHING modulus is accepted (pin check passes
    # before the query launches; stop immediately)
    ok_r = ContinuousFlowRunner(
        engine, CONT_FLOW, FileReplaySource(src_dir),
        n_shards=2, worker_index=1, n_workers=2)
    assert ok_r.start(flow_id=fid) == fid
    ok_r.stop()


def test_sharded_continuous_runners_split_stream(spark, engine):
    """The streaming twin of the batch engine's competing workers: TWO
    runner replicas on ONE flow, each owning a disjoint task-id shard of
    the same unbounded source — every task processed by exactly one
    replica, independent checkpoints/batch-id sequences, per-worker
    progress rows, flow-level accounting through the shared task log."""
    import pyarrow.parquet as pq

    src_dir = tempfile.mkdtemp(prefix="taskq_", dir="/root/repo/.tmp")
    write_task_chunk(src_dir, _chunk(0, 30))

    r0 = ContinuousFlowRunner(
        engine, CONT_FLOW, FileReplaySource(src_dir, max_files_per_trigger=4),
        n_shards=2, worker_index=0, n_workers=2)
    r1 = ContinuousFlowRunner(
        engine, CONT_FLOW, FileReplaySource(src_dir, max_files_per_trigger=4),
        n_shards=2, worker_index=1, n_workers=2)
    fid = r0.start()
    assert r1.start(flow_id=fid) == fid
    try:
        r0.wait_for(lambda c: c.get(("label", "ok"), 0) == 30, timeout_sec=90)
        # second chunk arrives live; both replicas take their halves
        write_task_chunk(src_dir, _chunk(30, 30))
        r0.wait_for(lambda c: c.get(("label", "ok"), 0) == 60, timeout_sec=90)
    finally:
        r0.stop()
        r1.stop()

    res = engine.state.task_results(fid)
    ok = res[(res.phase == "label") & (res.status == "ok")]
    assert len(ok) == 60 and ok.task_id.nunique() == 60

    # both replicas actually worked, on DISJOINT task sets
    by_worker = {
        w: set(ok[ok.handler.str.endswith(w)].task_id)
        for w in ("#w0of2", "#w1of2")
    }
    assert all(len(s) > 0 for s in by_worker.values()), by_worker
    assert not (by_worker["#w0of2"] & by_worker["#w1of2"])
    assert by_worker["#w0of2"] | by_worker["#w1of2"] == set(ok.task_id)

    # RAW committed rows: exactly one ok row per (stage, task) — the
    # shard split means no replica ever touched the other's tasks
    files = engine.state.committed_task_files(fid)
    raw = pd.concat([pq.read_table(p).to_pandas() for p in files])
    raw_ok = raw[(raw.status == "ok") & (raw.phase == "label")]
    assert len(raw_ok) == raw_ok.task_id.nunique() == 60

    # independent batch watermarks per replica
    assert engine.state.max_committed_batch(fid, worker="w0of2") >= 0
    assert engine.state.max_committed_batch(fid, worker="w1of2") >= 0
    # per-worker progress rows both present and consistent
    status = engine.status(fid)
    lab = status[status.phase == "label"]
    assert set(lab.handler.str[-6:]) == {"#w0of2", "#w1of2"}
    assert int(lab.total.sum()) == 60


def test_sharded_runners_absorb_broker_redelivery(spark, engine):
    """CAPSTONE: the reference's full production topology in one test —
    N competing consumer replicas against one durable redelivering queue
    (worker.rb:72-85 × connector.rb:56-73). TWO sharded runner replicas
    consume ONE Kafka-shaped broker source whose consumer CRASHES before
    committing its tail; the redelivered records are genuinely delivered
    twice (at-least-once, visible in the raw task log), each replica
    owns a disjoint task-id shard, and the (partition, offset) task
    identity restores exactly-once flow accounting end to end."""
    import json as _json

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from distribot_spark.streaming import broker as B

    root = tempfile.mkdtemp(prefix="brkmp_", dir="/root/repo/.tmp")
    log = B.events_broker_log("/root/testdata/sf0.001", root)
    BOUND = 120  # offsets < BOUND per partition: constant task volume

    def mksrc():
        return B.BrokerReplaySource(log, group="mp_ingest",
                                    max_files_per_trigger=3)

    class _TaskSource:
        bounded = True

        def __init__(self):
            self.src = mksrc()

        def load(self, sp):
            rec = self.src.load(sp).filter(F.col("offset") < BOUND)
            return rec.select(
                F.concat_ws("-", "partition", "offset").alias("task_id"),
                F.col("value"),
            )

    recs = log.records()
    per_part: dict[int, int] = {}
    for p in recs["partition"].to_pylist():
        per_part[p] = per_part.get(p, 0) + 1
    n_expected = sum(min(BOUND, c) for c in per_part.values())

    probe = mksrc()  # same group/tag → same materialized delivery files
    redeliv = {(p, o) for (p, o) in probe.redelivered() if o < BOUND}
    assert redeliv, "fixture must actually redeliver inside the bound"

    spec = {
        "name": "broker_mp",
        "phases": [
            {"name": "ingest", "is_initial": True, "transitions_to": "done",
             "handlers": ["BrokerEventWorker"]},
            {"name": "done", "is_final": True},
        ],
    }
    r0 = ContinuousFlowRunner(engine, spec, _TaskSource(),
                              n_shards=4, worker_index=0, n_workers=2)
    r1 = ContinuousFlowRunner(engine, spec, _TaskSource(),
                              n_shards=4, worker_index=1, n_workers=2)
    fid = r0.start()
    assert r1.start(flow_id=fid) == fid
    try:
        r0.wait_for(lambda c: c.get(("ingest", "ok"), 0) >= n_expected,
                    timeout_sec=180)
    finally:
        r0.stop()
        r1.stop()

    res = engine.state.task_results(fid, "ingest")
    ok = res[res.status == "ok"]
    # exactly-once accounting: every bounded record processed, once
    assert ok.task_id.nunique() == n_expected

    # both replicas worked, on DISJOINT shards
    by_worker = {
        w: set(ok[ok.handler.str.endswith(w)].task_id)
        for w in ("#w0of2", "#w1of2")
    }
    assert all(len(s) > 0 for s in by_worker.values())
    assert not (by_worker["#w0of2"] & by_worker["#w1of2"])

    # at-least-once really happened: a redelivered record's task shows
    # ≥2 raw committed attempts (both deliveries land in the SAME shard
    # — identity-keyed — so one replica processed it twice)
    files = engine.state.committed_task_files(fid)
    raw = pd.concat([pq.read_table(p).to_pandas() for p in files])
    raw_ok = raw[(raw.status == "ok") & (raw.phase == "ingest")]
    attempts = raw_ok.task_id.value_counts()
    redeliv_ids = [f"{p}-{o}" for (p, o) in sorted(redeliv)]
    assert max(attempts.get(t, 0) for t in redeliv_ids) >= 2, (
        "redelivered records must be visibly processed more than once")

    # content parity with a batch recompute off the broker log
    tbl = recs.to_pandas()
    tbl = tbl[tbl.offset < BOUND]
    want: dict[str, int] = {}
    for v in tbl.value:
        et = _json.loads(v)["event_type"]
        want[et] = want.get(et, 0) + 1
    got: dict[str, int] = {}
    for r in ok.result:
        et = _json.loads(r)["event_type"]
        got[et] = got.get(et, 0) + 1
    assert got == want
