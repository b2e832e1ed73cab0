"""Scaling-curve evidence for the scheduling-bound headline queries.

The claim under test (VERDICT r4): graph_pagerank / dedup_clusters /
l2_minhash_pairs are SCHEDULING-bound at sf0.1 — their wall time is a
flat per-job constant plus a data term that grows ~linearly, so the
constant amortizes at scale instead of compounding. This script measures
each at sf0.001/0.01/0.1 and fits

    t(sf) = c + a * (sf / 0.1)        (least squares over the 3 points)

reporting the scheduling constant c, the data slope a, the fit residual,
and the marginal decade exponent log10(t_i/t_{i-1}). A flat c with
marginal exponents well below 1 is the amortizes-at-scale signature;
an exponent near or above 1 at the top decade would mean the data term
already dominates and grows no worse than linearly.

Usage: python scaling.py [query ...]   (defaults to the three headliners)
Prints one JSON line per query; paste the table into BASELINE.md.
Do not run while the pytest suite runs (timings would be garbage).
"""

import json
import sys
import time

SFS = [("sf0.001", 0.001), ("sf0.01", 0.01), ("sf0.1", 0.1)]
DEFAULT = ["graph_pagerank", "dedup_clusters", "l2_minhash_pairs"]
RUNS = 3  # per (query, sf); best-of to shed warm-up noise


def table_log_curve():
    """ACID-log scaling at streaming ingest rates: snapshot and commit
    latency at 10 / 100 / 1000 committed versions. Both must be FLAT —
    snapshot folds from the newest checkpoint (O(CHECKPOINT_EVERY) log
    reads) and each checkpoint folds from the previous one, so neither
    grows with history. The counterfactual column replays the full log
    with checkpoints ignored (what an uncheckpointed manifest costs) to
    show the checkpoint is what buys the flatness. IO shape itself is
    pinned deterministically by
    tests/test_table_acid.py::test_snapshot_and_commit_cost_bounded_by_checkpoint_interval;
    this is the wall-clock evidence. Usage: python scaling.py --table-log
    """
    import tempfile

    from distribot_spark.sources.acid import TableLog

    root = tempfile.mkdtemp(prefix="acid_scale_")
    t = TableLog(root)
    t.init()
    assert t.try_commit(-1, [{"file": "f0", "pb": 0}], [], "w")
    out = []
    head = 0
    for target in (10, 100, 1000):
        commit_times = []
        while head < target:
            head += 1
            t0 = time.monotonic()
            assert t.try_commit(
                head - 1, [{"file": f"f{head}", "pb": 0}],
                [f"f{head-1}"], "w",
            )
            commit_times.append(time.monotonic() - t0)
        snap_best = min(
            _timed(t.snapshot) for _ in range(20)
        )
        replay_best = min(
            _timed(lambda: t._replay_to(head)) for _ in range(5)
        )
        out.append({
            "versions": head,
            "snapshot_ms": round(snap_best * 1000, 3),
            "uncheckpointed_replay_ms": round(replay_best * 1000, 3),
            "commit_ms_mean": round(
                1000 * sum(commit_times) / len(commit_times), 3
            ),
            "commit_ms_max": round(1000 * max(commit_times), 3),
        })
        print(json.dumps(out[-1]), flush=True)
    flat = out[-1]["snapshot_ms"] / max(out[0]["snapshot_ms"], 1e-6)
    print(json.dumps({"snapshot_1000_over_10": round(flat, 2)}), flush=True)
    return out


def _timed(fn):
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main(names):
    from distribot_spark.queries import QUERIES
    from distribot_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    out = []
    for name in names:
        spec = QUERIES[name]
        times = {}
        for sf_name, _ in SFS:
            sf_dir = f"/root/testdata/{sf_name}"
            best = None
            for _ in range(RUNS):
                t0 = time.monotonic()
                spec.builder(spark, sf_dir).collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[sf_name] = round(best, 3)
        # least squares t = c + a*x with x = sf/0.1
        xs = [sf / 0.1 for _, sf in SFS]
        ts = [times[n] for n, _ in SFS]
        n = len(xs)
        sx, st = sum(xs), sum(ts)
        sxx = sum(x * x for x in xs)
        sxt = sum(x * t for x, t in zip(xs, ts))
        a = (n * sxt - sx * st) / (n * sxx - sx * sx)
        c = (st - a * sx) / n
        resid = max(abs(c + a * x - t) for x, t in zip(xs, ts))
        import math
        margins = [
            round(math.log10(ts[i] / ts[i - 1]), 3) for i in range(1, n)
        ]
        row = {
            "query": name,
            "times_sec": times,
            "fit": {"c_sched_sec": round(c, 3), "a_data_sec": round(a, 3),
                    "max_resid_sec": round(resid, 3)},
            "marginal_decade_exponents": margins,
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    return out


if __name__ == "__main__":
    if "--table-log" in sys.argv:
        table_log_curve()
    else:
        main(sys.argv[1:] or DEFAULT)
