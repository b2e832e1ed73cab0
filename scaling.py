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
    main(sys.argv[1:] or DEFAULT)
