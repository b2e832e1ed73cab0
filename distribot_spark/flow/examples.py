"""Example flows + handlers, modeled on the reference's examples:
the news pipeline (examples/controller:19-50: ArticleLister →
ArticleDownloader) and its SimpleWorker with simulated failures
(examples/worker:23-36). Handlers live in the package so they are
importable on executors (mapInPandas ships them by reference).
"""

from __future__ import annotations

from distribot_spark.flow.registry import HandlerRegistry


class Lister:
    """ArticleLister-shape: enumerate N tasks (examples/worker:76-82)."""

    def enumerate(self, ctx):
        n = ctx.data_dict().get("n_tasks", 20)
        return [{"task_id": f"item-{i}", "item": i} for i in range(n)]

    def process(self, ctx, task):
        return {"item": task["item"], "squared": task["item"] ** 2}


class Downloader:
    """ArticleDownloader-shape second phase (examples/worker:84-118)."""

    def enumerate(self, ctx):
        return [{"task_id": f"dl-{i}", "story_id": i} for i in range(5)]

    def process(self, ctx, task):
        return {"story_id": task["story_id"], "ok": True}


class Auditor:
    """Second handler in one phase — exercises the ALL-handlers barrier."""

    def enumerate(self, ctx):
        return [{"task_id": f"audit-{i}", "i": i} for i in range(3)]

    def process(self, ctx, task):
        return {"audited": task["i"]}


class FlakyWorker:
    """Deterministic version of `raise "Test Error!" if rand >= 0.9`
    (examples/worker:33): every third task fails on its first attempt,
    succeeds on retry — exercises effectively-once accounting."""

    def enumerate(self, ctx):
        return [{"task_id": f"flaky-{i}", "i": i} for i in range(9)]

    def process(self, ctx, task):
        if task["i"] % 3 == 0 and task["_attempt"] == 1:
            raise ValueError(f"transient failure on {task['i']}")
        return {"i": task["i"]}


class AlwaysFails:
    def enumerate(self, ctx):
        return [{"task_id": "t0", "i": 0}]

    def process(self, ctx, task):
        raise RuntimeError("permanent failure")


class ErrorEmailer:
    """The fixture's error-phase handler (spec/fixtures/simple_flow.json:29)."""

    def enumerate(self, ctx):
        return [{"task_id": "email-0"}]

    def process(self, ctx, task):
        return {"emailed": True}


def example_registry() -> HandlerRegistry:
    reg = HandlerRegistry()
    reg.register("Lister", "1.0.0", Lister())
    reg.register("Lister", "1.2.0", Lister())
    reg.register("Lister", "2.0.0", Lister())
    reg.register("Downloader", "1.0.0", Downloader())
    reg.register("Auditor", "1.0.0", Auditor())
    reg.register("FlakyWorker", "1.0.0", FlakyWorker())
    reg.register("AlwaysFails", "1.0.0", AlwaysFails())
    reg.register("ErrorEmailer", "1.0.0", ErrorEmailer())
    reg.register("SlowWorker", "1.0.0", SlowWorker())
    reg.register("SleepyLister", "1.0.0", SleepyLister())
    reg.register("BrokerEventWorker", "1.0.0", BrokerEventWorker())
    reg.register("BigLister", "1.0.0", BigLister())
    reg.register("Napper", "1.0.0", Napper())
    reg.register("Napper2", "1.0.0", Napper2())
    reg.register("StreamSquarer", "1.0.0", StreamSquarer())
    reg.register("StreamLabeler", "1.0.0", StreamLabeler())
    reg.register("FlakyStreamWorker", "1.0.0", FlakyStreamWorker())
    return reg


NEWS_FLOW = {
    "name": "news",
    "data": {"n_tasks": 20},
    "phases": [
        {"name": "pending", "is_initial": True, "transitions_to": "listing"},
        {
            "name": "listing",
            "transitions_to": "downloading",
            "handlers": [{"name": "Lister", "version": "~> 1.0"}],
        },
        {
            "name": "downloading",
            "transitions_to": "finished",
            "handlers": ["Downloader", "Auditor"],
        },
        {"name": "finished", "is_final": True},
    ],
}


class SlowWorker:
    """Sleeps per task — used to exercise live control (pause/cancel
    arriving from another thread while a phase is running)."""

    def enumerate(self, ctx):
        return [{"task_id": f"slow-{i}", "i": i} for i in range(4)]

    def process(self, ctx, task):
        import time

        time.sleep(0.5)
        return {"i": task["i"]}


SLOW_FLOW = {
    "name": "slow",
    "phases": [
        {"name": "p1", "is_initial": True, "transitions_to": "p2",
         "handlers": ["SlowWorker"]},
        {"name": "p2", "transitions_to": "p3", "handlers": ["SlowWorker"]},
        {"name": "p3", "transitions_to": "done", "handlers": ["SlowWorker"]},
        {"name": "done", "is_final": True},
    ],
}


class Napper:
    """One task that sleeps a fixed interval — two of these in one phase
    exercise inter-handler parallelism (the reference starts every handler
    of a phase before any finishes, phase_started_handler.rb:27-30)."""

    def enumerate(self, ctx):
        return [{"task_id": "nap-0", "sec": ctx.data_dict().get("nap_sec", 2.5)}]

    def process(self, ctx, task):
        import time

        time.sleep(task["sec"])
        return {"slept": task["sec"]}


class Napper2(Napper):
    pass


PARALLEL_FLOW = {
    "name": "parallel",
    "data": {"nap_sec": 2.5},
    "phases": [
        {"name": "naps", "is_initial": True, "transitions_to": "done",
         "handlers": ["Napper", "Napper2"]},
        {"name": "done", "is_final": True},
    ],
}


class StreamSquarer:
    """Continuous-mode stage 1: process-only handler (continuous flows
    take tasks from the stream, so `enumerate` is never called)."""

    def process(self, ctx, task):
        return {"squared": task["item"] ** 2}


class StreamLabeler:
    """Continuous-mode stage 2: consumes stage 1's output via the carry."""

    def process(self, ctx, task):
        return {"label": f"item-{task['item']}={task['squared']}"}


class FlakyStreamWorker:
    """Continuous-mode twin of FlakyWorker: every third item fails its
    first attempt, succeeds on retry — exercises the in-state retry
    queue of ContinuousFlowRunner."""

    def process(self, ctx, task):
        if task["item"] % 3 == 0 and task["_attempt"] == 1:
            raise ValueError(f"transient failure on {task['item']}")
        return {"item_out": task["item"]}


FLAKY_CONT_FLOW = {
    "name": "flaky_cont",
    "phases": [
        {"name": "work", "is_initial": True, "transitions_to": "done",
         "handlers": ["FlakyStreamWorker"]},
        {"name": "done", "is_final": True},
    ],
}


CONT_FLOW = {
    "name": "cont",
    "phases": [
        {"name": "square", "is_initial": True, "transitions_to": "label",
         "handlers": ["StreamSquarer"]},
        {"name": "label", "transitions_to": "done",
         "handlers": ["StreamLabeler"]},
        {"name": "done", "is_final": True},
    ],
}


class ListerV15(Lister):
    """A NEWER Lister deployed mid-flow in the live-capability tests —
    never in example_registry(); it reaches engines only through
    FlowEngine.deploy → capabilities table."""

    def process(self, ctx, task):
        out = super().process(ctx, task)
        out["lister_version"] = "1.5.0"
        return out


class SoloHandler:
    """Registered in NO local registry — resolvable only via the shared
    capabilities table (deploy-is-register across engines)."""

    def enumerate(self, ctx):
        return [{"task_id": f"solo-{i}", "i": i} for i in range(3)]

    def process(self, ctx, task):
        return {"solo": task["i"]}


class SleepyLister:
    """Configurable fan-out with per-task sleep — the competing-consumer
    tests' workload: enough slices of slow-enough work that two engines
    racing the claim table both win some (reference worker.rb:72-85, N
    replicas splitting one queue)."""

    def enumerate(self, ctx):
        d = ctx.data_dict()
        n = d.get("n_tasks", 24)
        sec = d.get("task_sec", 0.2)
        return [{"task_id": f"s-{i}", "i": i, "sec": sec} for i in range(n)]

    def process(self, ctx, task):
        import time

        time.sleep(task["sec"])
        return {"i": task["i"]}


COMPETE_FLOW = {
    "name": "compete",
    "data": {"n_tasks": 30, "task_sec": 0.15},
    "phases": [
        {"name": "work", "is_initial": True, "transitions_to": "done",
         "handlers": ["SleepyLister"]},
        {"name": "done", "is_final": True},
    ],
}


class BrokerEventWorker:
    """Continuous-mode handler for Kafka-shaped broker records: the task
    payload carries the record's JSON value; processing extracts the
    event type (stand-in for real per-event work)."""

    def process(self, ctx, task):
        import json as _json

        event = _json.loads(task["value"])
        return {"event_type": event["event_type"], "event_id": event["event_id"]}


class BigLister:
    """Distributed-enumerate handler: the task set is a DataFrame (here
    spark.range, in production a table scan) — tasks never materialize on
    the driver, so a phase can fan out millions of tasks."""

    def enumerate(self, ctx, spark):
        n = ctx.data_dict().get("n_tasks", 1000)
        return spark.range(n).selectExpr(
            "CAST(id AS STRING) AS task_id", "id AS item"
        )

    def process(self, ctx, task):
        return {"item": task["item"], "double": task["item"] * 2}
