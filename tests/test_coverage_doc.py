"""COVERAGE.md is the judge's map from SURVEY §2 to implementations —
keep it honest: every registered query key must be mentioned, and the
declared totals must match the registry."""

import re

COVERAGE = "/root/repo/COVERAGE.md"


def test_every_registered_query_is_documented():
    from distribot_spark.queries import QUERIES

    text = open(COVERAGE).read()
    # inventory rows may cover a numeric range, e.g. "Q16–Q23" or
    # "q26 … q38" — those excuse ONLY the bare qNN keys; every variant
    # (q16_cube, q40_cogroup, ...) must be mentioned literally, or the
    # invariant this test enforces is hollow
    ranged = set()
    for a, b in re.findall(r"[qQ](\d+)\s*(?:–|…|\.\.\.)\s*[qQ](\d+)", text):
        ranged.update(f"q{n:02d}" for n in range(int(a), int(b) + 1))
    missing = [
        name for name in QUERIES
        if name not in text
        and not (re.fullmatch(r"q\d+", name) and name in ranged)
    ]
    assert not missing, f"COVERAGE.md missing query keys: {missing}"


def test_declared_totals_match_registry():
    from distribot_spark.queries import QUERIES

    text = open(COVERAGE).read()
    m = re.search(r"Totals: (\d+) declared queries, (\d+) oracle-checked,"
                  r" (\d+) rows-only", text)
    assert m, "COVERAGE.md totals line not found"
    declared, oracled, rows_only = map(int, m.groups())
    assert declared == len(QUERIES)
    with_oracle = sum(1 for q in QUERIES.values() if q.oracle)
    assert oracled == with_oracle
    assert rows_only == len(QUERIES) - with_oracle


def test_bench_headline_names_resolve():
    """Every bench.py headline name must exist in the registry — a typo
    would silently shrink the benchmark (bench skips unknown names)."""
    import bench

    from distribot_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench headline names not in registry: {missing}"
