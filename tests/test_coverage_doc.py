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


# The driver certifies only the FIRST 50 entries of __spark_entry__.queries()
# (every CORRECTNESS_r*.json has exactly 50 rows). Pin that window so no
# future module-import reshuffle silently swaps a driver-green query out of
# the certified set (VERDICT r3, next-round task 4).
_DRIVER_CERTIFIED_50 = [
    "q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09", "q10",
    "q11", "q12", "q13", "q14", "q14_distinct", "q15_exact", "q15", "q16",
    "q16_cube", "q16_gsets", "q17", "q18", "q19", "q20", "q21", "q22", "q23",
    "q24_union", "q24_union_all", "q24_intersect", "q24_except", "q25_scalar",
    "q25_correlated", "q26", "q27", "q28", "q29", "q29_datediff", "q30",
    "q31", "q32", "q33", "q33_agg", "q34", "q35", "q36_typed", "q36", "q37",
    "q38", "q39",
]


def test_first_50_registry_entries_stay_driver_certified():
    import __spark_entry__ as entry

    first50 = list(entry.queries())[:50]
    assert first50 == _DRIVER_CERTIFIED_50, (
        "registry import order changed inside the driver's 50-entry "
        "certification window — restore it (registration order is "
        "SURVEY-inventory order, distribot_spark/queries/registry.py)"
    )
