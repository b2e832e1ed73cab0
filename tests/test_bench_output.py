"""The driver records only the last 2000 chars of bench stdout — round 3's
bench line overflowed that window and was recorded unparsed
(BENCH_r03.json: parsed=null, totals lost). These tests pin the compact
single-line contract so the recorded BENCH_r{N}.json stays parseable no
matter how large the headline set grows.
"""

import json

import bench


def _detail(timings, noisy=()):
    return {
        "metric": "headline_queries_warm_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "spread": {k: 0.123 for k in timings},
        "spread_total": round(0.123 * len(timings), 3),
        "probe_sec": [0.116, 0.288],
        "noisy": sorted(noisy),
        "value_stable": round(sum(v for k, v in timings.items()
                                  if k not in set(noisy)), 3),
    }


def test_noise_flag_rides_the_compact_line():
    """VERDICT r8 task 7: flagged entries are named in the compact line
    and excluded from value_stable, so the judge compares stable
    subtotals instead of re-adjudicating VM steal."""
    small = {name: 2.0 for name in bench.HEADLINE[:20]}
    noisy = sorted(bench.HEADLINE[:2])
    parsed = json.loads(bench.compact_line(_detail(small, noisy)))
    assert parsed["noisy"] == sorted(noisy)
    assert parsed["value_stable"] == round(2.0 * 18, 3)
    assert parsed["value"] == round(2.0 * 20, 3)
    # at the FULL current set size the line may shrink past the name
    # tier — but the flag survives as a count and value_stable always
    # rides (the actual round-over-round comparand)
    full = {name: 2.0 for name in bench.HEADLINE}
    parsed = json.loads(bench.compact_line(_detail(full, noisy)))
    assert parsed["value"] == round(2.0 * len(bench.HEADLINE), 3)
    assert (parsed.get("noisy") == sorted(noisy)
            or parsed.get("noisy_count") == 2)
    assert parsed["value_stable"] == round(
        2.0 * (len(bench.HEADLINE) - 2), 3)
    # under extreme shrink pressure the names give way to a count but
    # value_stable survives every tier
    big = {f"q_some_very_long_operator_name_{i:03d}": 1.0
           for i in range(400)}
    parsed = json.loads(bench.compact_line(
        _detail(big, list(big)[:5])))
    assert parsed.get("noisy_count", len(parsed.get("noisy", []))) == 5
    assert parsed["value_stable"] == 395.0


def test_current_headline_set_fits_driver_window():
    # realistic magnitudes (the measured distribution: a handful of
    # multi-commit builders in the tens of seconds, the rest ~1 s).
    # The r7-session-4 additions pushed the set past the window's
    # full-precision capacity, so the CONTRACT here is: parseable line,
    # totals intact, kept + omitted == the whole set, and every SLOW
    # entry (the ones a reader compares round-over-round) present —
    # the full-precision map lives in BENCH_DETAIL.json.
    slow = {"l2_minhash_serve", "s32_stream_auto_compact_ingest",
            "s31_stream_dlq_source", "s28_stream_expectations_quarantine",
            "graph_pagerank", "dedup_clusters", "l2_minhash_pairs",
            "source_acid_manifest_prune", "l3_ivf_append_serve"}
    timings = {name: (19.05 if name in slow else 1.87)
               for name in bench.HEADLINE}
    line = bench.compact_line(_detail(timings))
    assert len(line) + 1 <= 2000, len(line)  # +1 for the trailing newline
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_warm_total"
    assert parsed["unit"] == "sec"
    assert parsed["value"] == _detail(timings)["value"]
    kept = set(parsed["queries"])
    assert len(kept) + parsed.get("queries_omitted", 0) == \
        len(bench.HEADLINE)
    assert slow <= kept  # the slowest entries always make the line


def test_worst_case_magnitudes_degrade_gracefully_not_unparseably():
    # EVERY query at 3 digits would overflow the window with the r7
    # headline count — the contract is graceful degradation (slowest
    # kept, omissions counted, totals intact), never an unparseable or
    # overflowing line (the r3 failure mode)
    timings = {name: 123.456 for name in bench.HEADLINE}
    line = bench.compact_line(_detail(timings))
    assert len(line) + 1 <= 2000, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == _detail(timings)["value"]
    assert len(parsed["queries"]) + parsed.get("queries_omitted", 0) == \
        len(bench.HEADLINE)


def test_oversized_headline_set_degrades_but_stays_parseable():
    # 400 queries with long names would blow any window — the fallback
    # keeps the 40 slowest and counts the omissions
    timings = {f"q_some_very_long_operator_name_{i:03d}": float(i) for i in range(400)}
    line = bench.compact_line(_detail(timings))
    assert len(line) + 1 <= 2000, len(line)
    parsed = json.loads(line)
    assert parsed["queries_omitted"] + len(parsed["queries"]) == 400
    assert 0 < len(parsed["queries"]) <= 40
    # the kept entries are the slowest ones
    assert "q_some_very_long_operator_name_399" in parsed["queries"]
    assert "q_some_very_long_operator_name_000" not in parsed["queries"]


def test_pathological_names_still_fit():
    # even 40 kept entries can overflow when names are huge — the
    # fallback must keep shrinking until the line fits
    timings = {f"q_{'x' * 120}_{i:03d}": float(i) for i in range(200)}
    line = bench.compact_line(_detail(timings))
    assert len(line) + 1 <= 2000, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == _detail(timings)["value"]
    assert parsed["queries_omitted"] + len(parsed["queries"]) == 200


def test_totals_survive_compaction():
    timings = {name: 1.0 for name in bench.HEADLINE}
    parsed = json.loads(bench.compact_line(_detail(timings)))
    assert parsed["value"] == round(float(len(bench.HEADLINE)), 3)
    assert parsed["detail"] == "BENCH_DETAIL.json"


def test_last_stdout_line_is_the_metric_line():
    """End-to-end teardown hygiene (the r6 near-miss: a py4j teardown
    stack fragment printed into the recorded tail): bench.py run as a
    real subprocess — restricted to two queries via
    SPARK_GRAFT_BENCH_QUERIES, one of them a STREAMING query so the
    stop-active-streams path actually executes — must exit 0 with the
    compact metric line as the LAST stdout line, nothing after it."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_BENCH_QUERIES"] = "q01,s24_stream_cdf_source"
    env["SPARK_GRAFT_CPUS"] = "8"
    r = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    lines = r.stdout.rstrip("\n").splitlines()
    assert lines, "no stdout at all"
    last = lines[-1]
    parsed = json.loads(last)  # the LAST line parses — nothing trailed it
    assert parsed["metric"] == "headline_queries_warm_total"
    assert set(parsed["queries"]) == {"q01", "s24_stream_cdf_source"}
    # and the whole recorded window (last 2000 chars) ends with the line
    assert r.stdout.rstrip("\n")[-len(last):] == last
