"""Structured Streaming surface: bounded-replay harness + S1–S10 operators.

The reference's data plane is a message-at-a-time worker pool over RabbitMQ
(reference worker: lib/distribot/worker.rb:45-131); the Spark-native
equivalent is Structured Streaming micro-batches with watermarked state.
Bounded replay (events table → ordered file chunks → file-stream source)
makes every streaming operator's output deterministic and batch-comparable,
which is how the driver's DuckDB oracle checks them.

Sources are pluggable (`sources.StreamSource`): file replay is the
deterministic/oracle path; `RateEventsSource` is the unbounded live path
(see sources.py).
"""

from distribot_spark.streaming.sources import (  # noqa: F401
    FileReplaySource,
    RateEventsSource,
    StreamSource,
)
