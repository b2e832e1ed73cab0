"""Concurrent MERGE writer process for tests/test_table_acid.py.

Usage: python tests/acid_worker_proc.py <table_path> <writer> <parity>
           <n_batches> <n_buckets> <start_file> [rendezvous_dir]

A genuinely separate OS process upserting its key slice (keys ≡ parity
mod 2) into a shared TableLog table in `n_batches` batches through the
optimistic-commit protocol. With `rendezvous_dir` set, batch 0 computes
its rewrite, announces, and WAITS for the other writer's announcement
before attempting to commit — so both first commits race the same
parent version and exactly one must rebase (deterministic conflict,
no timing luck).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_KEYS = 200


def main(table_path, writer, parity, n_batches, n_buckets,
         start_file, rendezvous_dir=None):
    import pandas as pd

    from distribot_spark.sources.acid import TableLog, merge_upsert_pandas

    table = TableLog(table_path)
    deadline = time.time() + 30
    while not os.path.exists(start_file):
        if time.time() > deadline:
            raise TimeoutError("start barrier never opened")
        time.sleep(0.01)

    tag = 1_000_000 if parity == 0 else 2_000_000
    totals = {"attempts": 0, "recomputes": 0, "commits": 0}
    for i in range(n_batches):
        keys = [k for k in range(N_KEYS) if k % 2 == parity]
        up = pd.DataFrame({"k": keys, "val": [tag + i] * len(keys)})

        hook = None
        if rendezvous_dir is not None and i == 0:
            def hook(parent, _w=writer):
                mine = os.path.join(rendezvous_dir, f"{_w}.computed")
                open(mine, "w").write(str(parent))
                stop = time.time() + 20
                while time.time() < stop:
                    others = [f for f in os.listdir(rendezvous_dir)
                              if f.endswith(".computed") and f != f"{_w}.computed"]
                    if others:
                        return
                    time.sleep(0.01)

        st = merge_upsert_pandas(table, up, "k", n_buckets, writer,
                                 pre_commit_hook=hook)
        totals["attempts"] += st["attempts"]
        totals["recomputes"] += st["recomputes"]
        totals["commits"] += 1
    print("STATS:" + json.dumps({"writer": writer, **totals}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
        int(sys.argv[5]), sys.argv[6],
        sys.argv[7] if len(sys.argv) > 7 else None,
    ))
