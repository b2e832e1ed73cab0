"""Flow-engine declared queries: end-to-end runs of the example flows,
hash-checked against constant-table oracles (the news pipeline is fully
deterministic, so even the orchestrator is DuckDB-checkable)."""

from __future__ import annotations

import json
import tempfile

from distribot_spark.flow import FlowEngine
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
    return spark.createDataFrame(
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
    return spark.createDataFrame(rows, "seq int, phase string")
