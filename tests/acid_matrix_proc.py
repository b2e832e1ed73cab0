"""Role-playing writer process for the OPTIMIZE × MERGE × DELETE
concurrency matrix (tests/test_table_acid.py).

Usage: python tests/acid_matrix_proc.py <table_path> <role> <n_buckets>
           <start_file> <rendezvous_dir>

Roles (all JVM-free lightweight clients, genuine OS processes):
  merge     — upsert keys {1, 5, 9} -> val 7000+k through
              merge_upsert_pandas
  delete_dv — deletion-vector delete of keys {2, 6} through
              delete_keys_pandas

Discipline: wait for the start file, COMPUTE against the current
snapshot, announce `<role>.computed` in the rendezvous dir, then WAIT
for `commit_go` before attempting the first commit — so every racer's
first commit targets the SAME parent version the coordinating OPTIMIZE
snapshotted, and the interleaving is deterministic, not timing luck.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wait_for(path, timeout=60):
    deadline = time.time() + timeout
    while not os.path.exists(path):
        if time.time() > deadline:
            raise TimeoutError(f"{path} never appeared")
        time.sleep(0.01)


def main(table_path, role, n_buckets, start_file, rendezvous_dir):
    import pandas as pd

    from distribot_spark.sources.acid import (
        TableLog,
        delete_keys_pandas,
        merge_upsert_pandas,
    )

    table = TableLog(table_path)
    _wait_for(start_file)

    fired = []

    def hook(parent):
        if fired:
            return  # only gate the FIRST commit attempt
        fired.append(parent)
        open(os.path.join(rendezvous_dir, f"{role}.computed"), "w").write(
            str(parent)
        )
        _wait_for(os.path.join(rendezvous_dir, "commit_go"))

    if role == "merge":
        up = pd.DataFrame({"k": [1, 5, 9], "val": [7001, 7005, 7009]})
        st = merge_upsert_pandas(
            table, up, "k", n_buckets, "merge-proc", pre_commit_hook=hook
        )
    elif role == "delete_dv":
        st = delete_keys_pandas(
            table, [2, 6], "k", n_buckets, "delete-proc",
            pre_commit_hook=hook,
        )
    else:
        raise ValueError(role)
    print("STATS:" + json.dumps({"role": role, **st}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
                  sys.argv[4], sys.argv[5]))
