"""Flow-engine declared queries: end-to-end runs of the example flows,
hash-checked against constant-table oracles (the news pipeline is fully
deterministic, so even the orchestrator is DuckDB-checkable)."""

from __future__ import annotations

import json
import tempfile

from distribot_spark.flow import FlowEngine
from distribot_spark.session import local_rows_df
from distribot_spark.flow.examples import NEWS_FLOW, example_registry
from distribot_spark.queries.registry import register
from distribot_spark.streaming.replay import TMP_ROOT


def _run_news(spark):
    engine = FlowEngine(
        spark,
        tempfile.mkdtemp(prefix="flowq_", dir=TMP_ROOT),
        registry=example_registry(),
        tasks_per_partition=5,
    )
    fid, result = engine.run_new(NEWS_FLOW)
    assert result == "finished"
    return engine, fid


@register(
    "flow_news_results",
    oracle="""
    SELECT 'item-' || CAST(i AS VARCHAR) AS task_id,
           CAST(i AS BIGINT) AS item, CAST(i * i AS BIGINT) AS squared
    FROM range(20) t(i) ORDER BY item
    """,
    tags=("flow",),
)
def flow_news_results(spark, sf_dir):
    """Run the news flow end-to-end (4 phases, versioned handler resolution,
    multi-handler barrier); return the listing phase's task results."""
    engine, fid = _run_news(spark)
    res = engine.state.task_results(fid, "listing")
    rows = [
        (r.task_id, int(json.loads(r.result)["item"]), int(json.loads(r.result)["squared"]))
        for r in res.itertuples()
    ]
    return local_rows_df(spark, 
        sorted(rows, key=lambda r: r[1]), "task_id string, item long, squared long"
    )


@register(
    "flow_news_transitions",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'pending'), (2, 'listing'), (3, 'downloading'), (4, 'finished'))
      t(seq, phase)
    ORDER BY seq
    """,
    tags=("flow",),
)
def flow_news_transitions(spark, sf_dir):
    """Transition history of the news flow (phase state machine parity
    with the reference trace, SURVEY.md §3.1)."""
    engine, fid = _run_news(spark)
    rows = [
        (i + 1, t["to"]) for i, t in enumerate(engine.state.transitions(fid))
    ]
    return local_rows_df(spark, rows, "seq int, phase string")


@register(
    "flow_competing_workers",
    oracle="""
    SELECT 's-' || CAST(i AS VARCHAR) AS task_id, CAST(i AS BIGINT) AS i
    FROM range(24) t(i) ORDER BY i
    """,
    tags=("flow",),
)
def flow_competing_workers(spark, sf_dir):
    """TWO engine instances (separate claim identities, one shared state
    root) compete to drain one phase — the reference's N-replica worker
    deployment (worker.rb:72-85) as a declared query: the claim table
    splits the waves, the task log holds each task exactly once, and the
    results hash-check against the constant oracle. The two-OS-process
    variant of the same protocol is proven in
    tests/test_flow_multiprocess.py (second JVM, SIGKILL steal)."""
    import json as _json
    from concurrent.futures import ThreadPoolExecutor

    from distribot_spark.flow.examples import COMPETE_FLOW

    root = tempfile.mkdtemp(prefix="flowq_mp_", dir=TMP_ROOT)
    mk = lambda: FlowEngine(  # noqa: E731
        spark, root, registry=example_registry(), tasks_per_partition=5,
        wave_slices=4, claim_lease_sec=120.0,
    )
    ea, eb = mk(), mk()
    fid = ea.create_flow(dict(COMPETE_FLOW,
                              data={"n_tasks": 24, "task_sec": 0.05}))
    with ThreadPoolExecutor(2) as pool:
        fa = pool.submit(ea.run, fid)
        fb = pool.submit(eb.run, fid)
        assert {fa.result(180), fb.result(180)} == {"finished"}
    res = ea.state.task_results(fid, "work")
    rows = sorted(
        (r.task_id, int(_json.loads(r.result)["i"])) for r in res.itertuples()
    )
    assert len(rows) == 24
    return local_rows_df(spark, 
        sorted(rows, key=lambda r: r[1]), "task_id string, i long"
    )


@register(
    "flow_sharded_continuous",
    oracle="""
    SELECT 't-' || CAST(i AS VARCHAR) AS task_id,
           'item-' || CAST(i AS VARCHAR) || '=' || CAST(i * i AS VARCHAR)
             AS label
    FROM range(20) t(i) ORDER BY task_id
    """,
    tags=("flow", "streaming"),
)
def flow_sharded_continuous(spark, sf_dir):
    """TWO sharded continuous runner replicas on ONE flow, each owning a
    disjoint task-id shard of the same stream (worker_index/n_workers) —
    the daemon-model twin of competing batch workers, as a declared
    query: both replicas' outputs land in the shared task log and the
    combined label-stage results hash-check against the constant
    oracle."""
    import json as _json

    from distribot_spark.flow import ContinuousFlowRunner
    from distribot_spark.flow.continuous import write_task_chunk
    from distribot_spark.flow.examples import CONT_FLOW
    from distribot_spark.streaming.sources import FileReplaySource

    engine = FlowEngine(
        spark, tempfile.mkdtemp(prefix="flowq_sh_", dir=TMP_ROOT),
        registry=example_registry(),
    )
    src_dir = tempfile.mkdtemp(prefix="flowq_shq_", dir=TMP_ROOT)
    write_task_chunk(
        src_dir, [{"task_id": f"t-{i}", "item": i} for i in range(20)]
    )
    runners = [
        ContinuousFlowRunner(
            engine, CONT_FLOW,
            FileReplaySource(src_dir, max_files_per_trigger=4),
            n_shards=2, worker_index=i, n_workers=2,
        )
        for i in range(2)
    ]
    fid = runners[0].start()
    runners[1].start(flow_id=fid)
    try:
        runners[0].wait_for(lambda c: c.get(("label", "ok"), 0) == 20,
                            timeout_sec=120)
    finally:
        for r in runners:
            r.stop()
    res = engine.state.task_results(fid)
    ok = res[(res.phase == "label") & (res.status == "ok")]
    rows = sorted(
        (r.task_id, _json.loads(r.result)["label"]) for r in ok.itertuples()
    )
    assert len(rows) == 20
    return local_rows_df(spark, rows, "task_id string, label string")


@register(
    "flow_broker_ingest",
    oracle="""
    WITH rec AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id % 4
                                ORDER BY ts, event_id) - 1 AS o
      FROM events)
    SELECT event_type, COUNT(*) AS n
    FROM rec WHERE o < 500
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("flow", "streaming"),
)
def flow_broker_ingest(spark, sf_dir):
    """THE R30–R31 integration, end to end: a continuous flow consumes
    the Kafka-shaped broker source (streaming/broker.py) whose consumer
    CRASHES between processing and offset commit — the uncommitted tail
    is REDELIVERED, those tasks are genuinely processed twice (visible
    in the raw log, exactly the reference's at-least-once
    double-processing), and the flow's task_id-keyed last-attempt-wins
    accounting absorbs the duplicates: per-event-type counts
    hash-match the batch oracle exactly. task_id = the record's
    (partition, offset) physical identity — the same dedup key s19 uses,
    here applied by the ORCHESTRATOR's log instead of a stream operator.
    Bounded prefix (offset < 500 per partition) keeps the demo's task
    volume constant at every SF; offsets are reproducible in SQL because
    the broker assigns them in (ts, event_id) order per partition."""
    import os as _os

    from pyspark.sql import functions as F

    from distribot_spark.flow import ContinuousFlowRunner
    from distribot_spark.flow.examples import example_registry as _reg
    from distribot_spark.streaming import broker as B

    root = _os.path.join(TMP_ROOT, "broker",
                         _os.path.basename(sf_dir.rstrip("/")))
    log = B.events_broker_log(sf_dir, root)
    src = B.BrokerReplaySource(log, group="flow_ingest",
                               max_files_per_trigger=3)
    # expected distinct tasks in the bounded prefix
    recs = log.records()
    per_part: dict[int, int] = {}
    for p in recs["partition"].to_pylist():
        per_part[p] = per_part.get(p, 0) + 1
    n_expected = sum(min(500, c) for c in per_part.values())

    class _TaskSource:
        bounded = True

        def load(self, sp):
            rec = src.load(sp).filter(F.col("offset") < 500)
            return rec.select(
                F.concat_ws("-", "partition", "offset").alias("task_id"),
                F.col("value"),
            )

    engine = FlowEngine(
        spark, tempfile.mkdtemp(prefix="flowq_bk_", dir=TMP_ROOT),
        registry=_reg(),
    )
    spec = {
        "name": "broker_ingest",
        "phases": [
            {"name": "ingest", "is_initial": True, "transitions_to": "done",
             "handlers": ["BrokerEventWorker"]},
            {"name": "done", "is_final": True},
        ],
    }
    runner = ContinuousFlowRunner(engine, spec, _TaskSource(), n_shards=4)
    fid = runner.start()
    try:
        runner.wait_for(lambda c: c.get(("ingest", "ok"), 0) >= n_expected,
                        timeout_sec=180)
    finally:
        runner.stop()

    import json as _json

    res = engine.state.task_results(fid, "ingest")
    ok = res[res.status == "ok"]
    assert ok.task_id.nunique() == n_expected
    counts: dict[str, int] = {}
    for r in ok.result:
        et = _json.loads(r)["event_type"]
        counts[et] = counts.get(et, 0) + 1
    return local_rows_df(spark, 
        sorted(counts.items()), "event_type string, n long"
    )
