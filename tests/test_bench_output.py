"""The driver records only the last 2000 chars of bench stdout — round 3's
bench line overflowed that window and was recorded unparsed
(BENCH_r03.json: parsed=null, totals lost). These tests pin the compact
single-line contract so the recorded BENCH_r{N}.json stays parseable no
matter how large the headline set grows.
"""

import json

import bench


def _detail(timings):
    return {
        "metric": "headline_queries_warm_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "spread": {k: 0.123 for k in timings},
        "spread_total": round(0.123 * len(timings), 3),
        "probe_sec": [0.116, 0.288],
    }


def test_current_headline_set_fits_driver_window():
    # worst-case-ish timings: every query 3 digits before the decimal
    timings = {name: 123.456 for name in bench.HEADLINE}
    line = bench.compact_line(_detail(timings))
    assert len(line) + 1 <= 2000, len(line)  # +1 for the trailing newline
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_warm_total"
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.HEADLINE)


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
