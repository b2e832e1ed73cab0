"""Competing-engine worker process for tests/test_flow_multiprocess.py.

Usage: python tests/flow_worker_proc.py <state_root> <flow_id> <ready_file>

Builds its OWN SparkSession (a second JVM — a genuinely separate engine
process), attaches a FlowEngine to the shared state root, announces
readiness (worker_id into ready_file), then competes to drain the flow —
the reference's worker-replica deployment (worker.rb:72-85) where N
processes split one queue.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(state_root: str, flow_id: str, ready_file: str,
         wave_slices: int = 8, claim_lease_sec: float = 120.0) -> int:
    from distribot_spark.flow.engine import FlowEngine
    from distribot_spark.flow.examples import example_registry
    from distribot_spark.session import get_spark

    spark = get_spark(app_name="flow-worker-b", master="local[8]",
                      shuffle_partitions=8)
    eng = FlowEngine(
        spark,
        state_root,
        registry=example_registry(),
        tasks_per_partition=5,
        wave_slices=wave_slices,
        claim_lease_sec=claim_lease_sec,
    )
    with open(ready_file, "w") as fh:
        fh.write(eng.worker_id)
    result = eng.run(flow_id)
    print(f"RESULT:{result}", flush=True)
    return 0 if result == "finished" else 2


if __name__ == "__main__":
    extra = {}
    if len(sys.argv) > 4:
        extra["wave_slices"] = int(sys.argv[4])
    if len(sys.argv) > 5:
        extra["claim_lease_sec"] = float(sys.argv[5])
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], **extra))
