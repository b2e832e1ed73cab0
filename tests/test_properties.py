"""Property-based checks (hypothesis) for the operators whose semantics
are easy to get subtly wrong: each is compared against an independent
brute-force reference on small random inputs. Examples are capped low —
every example costs Spark jobs — but shrinking still yields minimal
counterexamples on failure.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distribot_spark.operators.asof import asof_join
from distribot_spark.operators.components import connected_components
from distribot_spark.operators.rangejoin import point_in_interval_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# -- binned range join: equals brute force, for ANY bin width ----------------

intervals_st = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 20)),  # (start, length)
    min_size=0, max_size=15,
)
points_st = st.lists(st.integers(-5, 90), min_size=0, max_size=30)


@settings(**_SETTINGS)
@given(intervals=intervals_st, points=points_st,
       bin_width=st.integers(1, 40))
def test_range_join_matches_bruteforce_any_bin_width(
    spark, intervals, points, bin_width
):
    """The binned rewrite must be invisible: identical (point, interval)
    matches as the naive nested loop for every bin width ≥ 1 (bin width
    is a pure performance knob)."""
    idf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(intervals)] or [(-1, 0, 0)],
        "iid long, st long, en long",
    )
    pdf = spark.createDataFrame(
        [(j, p) for j, p in enumerate(points)] or [(-1, -99)],
        "pid long, p long",
    )
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(pdf, idf, "p", "st", "en", bin_width)
        .select("pid", "iid").collect()
    }
    want = {
        (j, i)
        for i, (s, ln) in enumerate(intervals)
        for j, p in enumerate(points)
        if s <= p < s + ln
    }
    assert got == want


# -- connected components: equals union-find ---------------------------------

edges_st = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=1, max_size=40,
)


@settings(**_SETTINGS)
@given(edges=edges_st)
def test_connected_components_matches_union_find(spark, edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    want = {}
    for n in parent:
        want.setdefault(find(n), []).append(n)
    expected = {n: min(group) for group in want.values() for n in group}

    df = spark.createDataFrame(edges, "da long, db long")
    got = {r.id: r.comp for r in connected_components(df).collect()}
    assert got == expected


# -- as-of join: equals brute force, with and without tolerance --------------

right_rows_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, ts)
    min_size=0, max_size=20, unique=True,
)
left_rows_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),
    min_size=1, max_size=20,
)


@settings(**_SETTINGS)
@given(left=left_rows_st, right=right_rows_st,
       tol=st.one_of(st.none(), st.integers(1, 20)))
def test_asof_join_matches_bruteforce(spark, left, right, tol):
    """For every left row: the matched value is the greatest right ts ≤
    left ts on the same key (ties on ts broken by max rid), nulled when
    staler than the tolerance (INTERVAL arithmetic → timestamps)."""
    from datetime import datetime, timedelta

    def ts(t):
        return datetime(2024, 1, 1) + timedelta(seconds=t)

    ldf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(left)],
        "k long, lts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(right)]
        or [(-1, ts(0), -1)],
        "k long, rts timestamp, rid long",
    )
    joined = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        right_cols=["rid"],
        tolerance=f"{tol} seconds" if tol else None,
        tie_breaker="rid",
    )
    got = {r.lid: r.rid for r in joined.collect()}

    for i, (k, t) in enumerate(left):
        cands = [
            (rt, j) for j, (rk, rt) in enumerate(right)
            if rk == k and rt <= t and (tol is None or rt >= t - tol)
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, f"left row {i} (k={k}, ts={t})"


# -- token chunking: exact tiling for ANY (chunk_size, stride) ---------------

words_st = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=3), min_size=1, max_size=40
)


@settings(**_SETTINGS)
@given(words=words_st, chunk_size=st.integers(2, 12), stride=st.integers(1, 12))
def test_chunk_tokens_matches_python_reference(spark, words, chunk_size, stride):
    """Chunks must equal the plain-Python sliding window for any sizes:
    starts at 0, stride apart, until the remaining tail is covered; a doc
    shorter than one chunk yields exactly one partial chunk."""
    from distribot_spark.operators.text import chunk_tokens

    stride = min(stride, chunk_size)  # overlap contract: stride <= chunk
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    got = {
        (r.chunk_id, r.chunk, r.n_tokens)
        for r in chunk_tokens(df, chunk_size=chunk_size, stride=stride).collect()
    }
    n = len(words)
    import math
    last = max(0, math.ceil((n - chunk_size) / stride))
    expect = set()
    for k in range(last + 1):
        piece = words[k * stride: k * stride + chunk_size]
        expect.add((k, " ".join(piece), len(piece)))
    assert got == expect


# -- repetition stats: equals the plain-Python counts ------------------------


@settings(**_SETTINGS)
@given(words=st.lists(st.sampled_from("a b c aa".split()), min_size=2,
                      max_size=30))
def test_repetition_stats_matches_python_reference(spark, words):
    """dup/top fractions must match collections.Counter arithmetic (same
    HALF_UP rounding) on arbitrary small token streams."""
    from collections import Counter

    from distribot_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    row = repetition_stats(df).collect()[0]

    def r4(x):
        import math
        return math.floor(x * 10000 + 0.5) / 10000

    grams = [" ".join(words[i:i + 2]) for i in range(len(words) - 1)] or [words[0]]
    gc = Counter(grams)
    gtotal = max(len(words) - 1, 1)
    assert row.dup_word_frac == r4(1.0 - len(set(words)) / len(words))
    assert row.dup_2gram_frac == r4(1.0 - len(gc) / gtotal)
    assert row.top_2gram_frac == r4(max(gc.values()) / gtotal)


# -- clamped balance: the (A, B) summary composition law ---------------------


@settings(**_SETTINGS)
@given(
    deltas=st.lists(st.integers(-50, 50), min_size=0, max_size=40),
    split=st.integers(0, 40),
)
def test_clamped_fold_summary_composition(deltas, split):
    """The scale claim in q_clamped_balance's docstring, checked as a
    law: folding x → max(x+δ, 0) over a whole sequence equals composing
    the two chunks' (A, B) summaries (f(x) = max(x + A, B)), for every
    split point. This is what makes the non-associative-looking
    recurrence partial-aggregatable at 100 TB."""
    split = min(split, len(deltas))

    def fold(x, ds):
        for d in ds:
            x = max(x + d, 0)
        return x

    def summary(ds):
        a, b = 0, None  # identity: f(x) = x
        for d in ds:
            # compose with g(x) = max(x + d, 0)
            a2 = a + d
            b2 = max((b + d) if b is not None else float("-inf"), 0)
            a, b = a2, b2
        return a, b

    def apply(s, x):
        a, b = s
        return max(x + a, b) if b is not None else x + a

    whole = fold(0, deltas)
    left, right = deltas[:split], deltas[split:]
    composed = apply(summary(right), apply(summary(left), 0))
    assert composed == whole


# -- duplicated spans: equals brute force on random corpora ------------------

from distribot_spark.operators.dedup import dup_spans

docs_st = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=18),
    min_size=2, max_size=5,
)


@settings(**_SETTINGS)
@given(docs=docs_st)
def test_dup_spans_matches_bruteforce(spark, docs):
    """Seed detection (cross-doc n-gram sharing) + island merging must
    equal the obvious quadratic reference for any random corpus over a
    tiny vocabulary (small alphabet forces real gram collisions)."""
    n = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.fp, r.lp)
        for r in dup_spans(df, "text", "doc_id", n=n).collect()
    }

    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, toks in enumerate(docs):
        for i in range(len(toks) - n + 1):
            gram_docs[tuple(toks[i:i + n])].add(d)
    want = set()
    for d, toks in enumerate(docs):
        seeds = [
            i + 1
            for i in range(len(toks) - n + 1)
            if len(gram_docs[tuple(toks[i:i + n])]) >= 2
        ]
        spans = []
        for p in seeds:
            if spans and p - spans[-1][1] <= n:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        want.update((d, fp, lp) for fp, lp in spans)
    assert got == want


# -- star components ≡ propagation on random graphs --------------------------

from distribot_spark.operators.components import connected_components_star

edges_st = st.lists(
    st.tuples(st.integers(1, 25), st.integers(1, 25)),
    min_size=1, max_size=35,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=edges_st)
def test_star_equals_propagation_random(spark, edges):
    """The two-phase star algorithm and min-label propagation must agree
    on arbitrary random multigraphs (duplicates, both orientations,
    arbitrary topology)."""
    edges = [(a, b) for a, b in edges if a != b] or [(1, 2)]
    df = spark.createDataFrame(edges, "da long, db long")
    a = {(r.id, r.comp) for r in connected_components(df).collect()}
    b = {(r.id, r.comp) for r in connected_components_star(df).collect()}
    assert a == b


# -- positional fingerprint: equals the pure-python model on any ASCII text --

_fp_texts_st = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0, max_size=40),
    min_size=1, max_size=8,
)


def _fp_model(text: str) -> int:
    """Pure-python twin of _fp_term_sql: (c+1)·mixer(i) mod P summed."""
    P_BIG = 1_000_000_007  # bloom.P, the mixer modulus
    FP_P = 1_000_000_007
    out = 0
    for i, ch in enumerate(text, 1):
        x0 = abs(i) % P_BIG
        x1 = (x0 * x0 + 314159257) % P_BIG
        w = (x1 * x1 + 271828171) % P_BIG
        out += ((ord(ch) + 1) * w) % FP_P
    return out % FP_P


@settings(**_SETTINGS)
@given(texts=_fp_texts_st)
def test_positional_fingerprint_matches_python_model(spark, texts):
    """The Spark expression tree computes EXACTLY the python model for
    arbitrary printable-ASCII strings — including the empty-string rule
    (no output row, mirroring the oracle's generate_series(1,0))."""
    from pyspark.sql import functions as F

    from distribot_spark.queries.analytics_extra import _FP_P, _fp_term_sql

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chars = df.filter(F.length("text") > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i0"),
        "text",
    ).select(
        "doc_id",
        F.col("i0").cast("long").alias("i"),
        F.expr("ascii(substring(text, i0, 1))").cast("long").alias("c"),
    )
    got = {
        r.doc_id: r.fp
        for r in chars.groupBy("doc_id")
        .agg(F.expr(f"SUM({_fp_term_sql()}) % {_FP_P}").alias("fp"))
        .collect()
    }
    want = {i: _fp_model(t) for i, t in rows if len(t) > 0}
    assert got == want


# -- sketches on SIGNED key domains: the abs() guard is load-bearing --------

_signed_keys_st = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40),
    min_size=1, max_size=60,
)


@settings(**_SETTINGS)
@given(keys=_signed_keys_st)
def test_bloom_no_false_negatives_on_signed_keys(spark, keys):
    """build_bloom/probe_bloom on keys spanning the full signed range:
    every inserted key must probe as a candidate (the one-sided Bloom
    guarantee), and the abs() in _position must keep bit positions and
    shift counts non-negative — a negative shift is where Spark (Java
    mod-64 wrap) and DuckDB diverge silently."""
    from distribot_spark.operators.bloom import build_bloom, probe_bloom

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = build_bloom(df, "k", m=1024, k=3)
    probed = probe_bloom(df, "k", bloom, m=1024, k=3).collect()
    misses = [r.k for r in probed if not r.bloom_candidate]
    assert not misses, f"false negatives on signed keys: {misses[:5]}"


@settings(**_SETTINGS)
@given(keys=_signed_keys_st)
def test_cms_never_underestimates_on_signed_keys(spark, keys):
    """CMS one-sided guarantee on a signed key domain: the estimate for
    every key is >= its true count."""
    from collections import Counter

    from distribot_spark.operators.cms import build_cms, probe_cms

    truth = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    cms = build_cms(df, "k", d=3, w=64)
    distinct = spark.createDataFrame([(k,) for k in truth], "k long")
    est = {r.k: r.cms_estimate
           for r in probe_cms(distinct, "k", cms, d=3, w=64).collect()}
    under = {k: (est[k], truth[k]) for k in truth if est[k] < truth[k]}
    assert not under, f"CMS underestimated: {dict(list(under.items())[:5])}"
