"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed twice; the second (warm) run is reported so JVM/JIT
and parquet-footer caching don't dominate — the driver compares round-over-
round numbers, and warm numbers are the ones that extrapolate to a long-
running cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-agg flagship, multiway join, window, top-k, set-heavy,
# UDF path, grouped-map path, plus the LLM-pipeline heavyweights when present.
HEADLINE = [
    "q01",
    "q04",
    "q05",
    "q11",
    "q13",
    "q14",
    "q16",
    "q19",
    "q22",
    "q23",
    "q25_correlated",
    "q36",
    "q39",
    "l1_exact_dedup",
    "l2_minhash_pairs",
    "l3_topk_cosine",
    "l4_tfidf_top_terms",
    "doc_quality",
    "asof_click_view",
    "events_time_rollup",
    "q_percentiles",
    "q_salted_agg",
    # round 2 additions (set change documented in BASELINE.md): the
    # grouped-map scale twin, the blocked-matmul exact embedding dedup
    # (sign-LSH can't prune at the testdata's mid-threshold regime — see
    # operators/similarity.py), the real-codec decode path
    "q40_batched",
    "dedup_embedding_blocked",
    "multimodal_decode",
]


def main() -> None:
    from distribot_spark.queries import QUERIES
    from distribot_spark.session import get_spark

    spark = get_spark(app_name="distribot_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES.get(name)
        if spec is None:
            continue
        # cold pass (not reported): plan + JIT + footer cache; then report
        # the min of two warm runs (min is robust to GC/scheduler noise)
        spec.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_warm_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
