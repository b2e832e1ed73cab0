"""Flow engine: the distribot-equivalent workflow orchestrator on Spark.

The reference (distribot, Ruby) is a distributed flow engine: a Flow is a
linear state machine of Phases; each phase's handlers enumerate tasks that
are fanned out over a work queue and processed by competing consumers,
with Redis counters detecting completion (SURVEY.md §0, §3.1).

This package re-expresses that on Spark:
- RabbitMQ queues      → task DataFrames processed by `mapInPandas`
- Redis state/counters → parquet state tables (flows/transitions/progress)
- six lifecycle daemons→ one driver-side orchestrator state machine
- 500-thread consumers → Spark partitions

Deliberate semantic fixes over the reference (documented deviations):
- the multi-handler phase barrier actually waits for ALL handlers
  (reference bug: handler_finished_handler.rb:22 checks the wrong key)
- completion accounting is transactional per phase (reference has a
  get-then-act race, task_finished_handler.rb:9-11)
- `on_error_transition_to` is implemented (declared but dead in the
  reference: phase.rb:9 is never read by engine code)
- cancel drains tasks (reference requeues canceled tasks forever,
  README.md:91-93)
"""

from distribot_spark.flow.continuous import ContinuousFlowRunner
from distribot_spark.flow.engine import FlowEngine
from distribot_spark.flow.registry import HandlerRegistry, handler
from distribot_spark.flow.spec import FlowSpec, Phase, PhaseHandler

__all__ = [
    "ContinuousFlowRunner",
    "FlowEngine",
    "FlowSpec",
    "Phase",
    "PhaseHandler",
    "HandlerRegistry",
    "handler",
]
