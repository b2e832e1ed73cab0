"""Additional analytics operators: exact/approx percentiles, time-series
resampling with gap fill, BPE-ish token counting, rolling-hash
fingerprints, salted (skew-safe) aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.functions import stable_round
from distribot_spark.operators.skew import salted_aggregate, salted_join
from distribot_spark.queries.registry import register


@register(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`, verified bit-identical)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
            F.percentile("o_totalprice", 0.99).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


@register("q_percentiles_approx", oracle=None, tags=("agg", "approx"))
def q_percentiles_approx(spark, sf_dir):
    """approx_percentile sketch (KLL-style); ≈ operator, rows-only — the
    tolerance vs q_percentiles is asserted in tests/test_operators.py."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.approx_percentile("o_totalprice", 0.5, 10000).alias("p50_approx"),
            F.approx_percentile("o_totalprice", 0.9, 10000).alias("p90_approx"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "events_resample_gapfill",
    oracle="""
    WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                           date_trunc('hour', MAX(ts)) AS hi FROM events),
    grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
             FROM bounds),
    agg AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS cnt,
                   ROUND(SUM(value) * 100) / 100 AS sum_value
            FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(agg.cnt, 0) AS cnt,
           COALESCE(agg.sum_value, 0.0) AS sum_value
    FROM grid LEFT JOIN agg ON grid.h = agg.h
    ORDER BY hour
    """,
    tags=("temporal", "resample"),
)
def events_resample_gapfill(spark, sf_dir):
    """Resample to an hourly grid with zero-filled gaps: generate the full
    hour spine (sequence + explode — one row per hour, distributed) and
    left-join the aggregates onto it. The training-pipeline shape for
    regularizing irregular event streams."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count("*").alias("cnt"),
            stable_round(F.sum("value")).alias("sum_value"),
        )
    )
    return (
        grid.join(agg, "h", "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("hour")
    )


@register(
    "doc_tokens_bpe",
    oracle="""
    SELECT doc_id,
      CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
           AS BIGINT) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def doc_tokens_bpe(spark, sf_dir):
    """BPE-ish regex token counting (word/number/punctuation pieces) — the
    pre-tokenizer split GPT-style BPE applies before merges."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@register("doc_rolling_hash", oracle=None, tags=("llm", "text"))
def doc_rolling_hash(spark, sf_dir):
    """Polynomial rolling-hash fingerprint over the token stream,
    computed JVM-side with F.aggregate (h = (h*31 + hash(token)) mod 2^31
    — pmod keeps everything in range under ANSI arithmetic). Order-
    sensitive, unlike the md5 set fingerprints. Rows-only: Spark's
    murmur3 token hash has no DuckDB equivalent; determinism is asserted
    in tests/test_operators.py."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.lit(2147483647)
    rolling = F.aggregate(
        F.split(F.col("text"), " "),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(acc * 31 + F.pmod(F.hash(tok).cast("long"), m), m),
    )
    return docs.select("doc_id", rolling.alias("rhash")).orderBy("doc_id")


_FP_P = 1_000_000_007


def _fp_term_sql() -> str:
    """One character's fingerprint contribution: (c+1) · W(i) mod P,
    W(i) = the validated two-round quadratic mixer from operators/hll.py
    (affine weights would make anagram-with-compensating-positions
    collisions trivial). c ≤ 0x10FFFF and W < P ≈ 2^30, so each term
    < 2^51 — int64-safe, identical text in both engines."""
    from distribot_spark.operators.hll import hash_sql

    return f"(((c + 1) * {hash_sql('i')}) % {_FP_P})"


@register(
    "doc_fingerprint_positional",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text,
             UNNEST(generate_series(1, length(text))) AS i0
      FROM documents WHERE length(text) > 0
    ), chars AS (
      SELECT doc_id, CAST(i0 AS BIGINT) AS i,
             CAST(ord(substr(text, CAST(i0 AS INT), 1)) AS BIGINT) AS c
      FROM pos
    )
    SELECT doc_id, CAST(SUM({_fp_term_sql()}) % {_FP_P} AS BIGINT) AS fp
    FROM chars GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def doc_fingerprint_positional(spark, sf_dir):
    """Order-sensitive document fingerprint that hash-oracles — the
    portable answer to doc_rolling_hash's murmur3 limitation:
    fp = Σ_i (c_i + 1)·W(i) mod P, with W(i) the spelled-out two-round
    quadratic mixer (operators/hll.py) on the 1-based char position.
    Position weighting keeps it order-sensitive (transpositions change
    the sum — pinned by test_positional_fingerprint_order_sensitive)
    while the SUM of independent per-char terms is exact in ANY
    accumulation order over int64 (term < 2^51; docs up to 2^12 chars
    keep the sum < 2^63).

    100 TB shape: unlike a sequential rolling fold (interpreted HOF,
    one lambda step per char), this is posexplode → whole-stage-codegen
    arithmetic → map-side partial SUM per doc — embarrassingly parallel,
    and two halves of a split document combine by modular addition
    (shift the second half's positions), so shard fingerprints merge
    without re-reading text."""
    # length > 0 on BOTH sides: Spark sequence(1, 0) steps DOWN to [1, 0]
    # while DuckDB generate_series(1, 0) is empty — an empty doc would
    # fingerprint in one engine and vanish in the other.
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chars = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i0"),
        "text",
    ).select(
        "doc_id",
        F.col("i0").cast("long").alias("i"),
        F.expr("ascii(substring(text, i0, 1))").cast("long").alias("c"),
    )
    return (
        chars.groupBy("doc_id")
        .agg(F.expr(f"SUM({_fp_term_sql()}) % {_FP_P}").alias("fp"))
        .orderBy("doc_id")
    )


@register(
    "q_salted_agg",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS cnt,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)::DOUBLE AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "skew"),
)
def q_salted_agg(spark, sf_dir):
    """Skew-safe two-stage aggregation: groupBy(key, salt) partials →
    groupBy(key) combine. o_orderstatus has only 3 values — exactly the
    hot-key shape where a plain groupBy funnels everything through 3
    reducers; salting spreads each key over 16. Results must equal the
    plain aggregate (the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    return salted_aggregate(
        orders.select("o_orderstatus", "o_totalprice"),
        keys=["o_orderstatus"],
        partial_aggs=[
            F.count("*").alias("pc"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("ps"),
        ],
        final_aggs=[
            F.sum("pc").alias("cnt"),
            F.round(F.sum("ps"), 2).cast("double").alias("total"),
        ],
        salt_buckets=16,
    ).orderBy("o_orderstatus")


@register(
    "q_salted_join",
    oracle="""
    WITH dim AS (SELECT o_orderstatus, COUNT(*) AS status_cnt
                 FROM orders GROUP BY o_orderstatus)
    SELECT o.o_orderstatus, COUNT(*) AS cnt, MIN(d.status_cnt) AS status_cnt,
           ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2)::DOUBLE AS total
    FROM orders o JOIN dim d USING (o_orderstatus)
    GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
    tags=("join", "skew"),
)
def q_salted_join(spark, sf_dir):
    """Skew-safe salted join: orders (fact; o_orderstatus has 3 values —
    the maximal hot-key shape, every row is one of 3 join keys) ⋈ a
    per-status dim too 'hot' for a plain shuffle join at scale. The dim is
    exploded 16× on a salt column and the fact side salted with a
    deterministic row hash, so each hot key's rows spread over 16 reducers
    instead of funneling through one. Results must equal the unsalted
    join (the oracle); MIN(status_cnt) proves the dim row was delivered.
    At 100 TB this is the pattern for dims that exceed the broadcast
    threshold but are far smaller than the fact (see operators/skew.py);
    AQE skew-split handles the cases where the dim IS broadcastable."""
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    dim = orders.groupBy("o_orderstatus").agg(F.count("*").alias("status_cnt"))
    joined = salted_join(fact, dim, "o_orderstatus", salt_buckets=16)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.min("status_cnt").alias("status_cnt"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def _profile_num(col):
    return f"""
    SELECT '{col}' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           CAST(MIN({col}) AS DOUBLE) AS min_num,
           CAST(MAX({col}) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders"""


def _profile_str(col):
    return f"""
    SELECT '{col}' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           MIN({col}) AS min_str, MAX({col}) AS max_str
    FROM orders"""


def _profile_ts(col):
    return f"""
    SELECT '{col}' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           strftime(MIN({col}), '%Y-%m-%d %H:%M:%S.%f') AS min_str,
           strftime(MAX({col}), '%Y-%m-%d %H:%M:%S.%f') AS max_str
    FROM orders"""


@register(
    "q_profile_orders",
    oracle=" UNION ALL ".join(
        [
            _profile_num("o_orderkey"),
            _profile_num("o_custkey"),
            _profile_str("o_orderstatus"),
            _profile_num("o_totalprice"),
            _profile_ts("o_orderdate"),
            _profile_str("o_orderpriority"),
        ]
    )
    + ' ORDER BY "column"',
    tags=("analytics", "profile"),
)
def q_profile_orders(spark, sf_dir):
    """Single-pass data-quality profile of `orders`: per column row/null/
    exact-distinct counts and typed min/max (operators/profile.py). The
    multi-distinct aggregate plans as one Expand over the scan; the
    long-format output explodes from the 1-row agg result."""
    from distribot_spark.operators.profile import profile_table

    orders = load_table(spark, sf_dir, "orders")
    return profile_table(orders)


@register(
    "q_regr_ols",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity) * 1000) / 1000 + 0.0
             AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity) * 1000) / 1000
             + 0.0 AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity) * 100000) / 100000 + 0.0
             AS r2
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "stats", "regression"),
)
def q_regr_ols(spark, sf_dir):
    """Per-group ordinary-least-squares fit (price ~ quantity): slope,
    intercept, and R² via the SQL-standard REGR_* aggregates — the
    closed-form single-pass linear model every profiler/drift-monitor
    needs. One partial-agg'd groupBy over the scan (each REGR_* reduces
    to the same sum/count/co-moment partials, so the map side combines
    everything in one pass); no iteration, no driver math. 3-dp /
    5-dp stable rounding absorbs the co-moment summation-order
    difference between engines; `+ 0.0` because slope/intercept can be
    negative (see functions/determinism.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).alias("n"),
            (stable_round(F.regr_slope(y, x), 3) + 0.0).alias("slope"),
            (stable_round(F.regr_intercept(y, x), 3) + 0.0).alias("intercept"),
            (stable_round(F.regr_r2(y, x), 5) + 0.0).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_equidepth_hist",
    oracle="""
    WITH cuts AS (SELECT quantile_cont(o_totalprice,
                    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
                  FROM orders),
    b AS (SELECT o_totalprice AS v,
                 CAST(1 + len(list_filter(cs, c -> v > c)) AS BIGINT)
                   AS bucket
          FROM orders, cuts)
    SELECT bucket, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def q_equidepth_hist(spark, sf_dir):
    """Equi-depth (quantile-bucketed) histogram: exact interpolated
    decile cut points (bit-identical across engines, see q_percentiles)
    broadcast back onto the scan; each row's bucket = 1 + #cuts below
    its value via an array fold over the 9-element literal — a pure
    projection, no per-bucket join. This is how range-partition
    boundaries (q_global_rownum) and equi-depth optimizer statistics
    are actually built: one percentile pass + one map-only bucketing
    pass. lo/hi are exact value selections (no float arithmetic)."""
    o = load_table(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr(
            "percentile(o_totalprice,"
            " array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D))"
        ).alias("cs")
    )
    return (
        o.select("o_totalprice")
        .crossJoin(F.broadcast(cuts))
        .select(
            F.col("o_totalprice").alias("v"),
            (
                F.lit(1)
                + F.expr(
                    "aggregate(cs, 0,"
                    " (a, c) -> a + IF(o_totalprice > c, 1, 0))"
                )
            )
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q_aqp_estimate",
    oracle="""
    WITH s AS (
      SELECT o_totalprice,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 3))
                  AS BIGINT) < 41 AS in_sample
      FROM orders),
    agg AS (
      SELECT COUNT(*) AS n_total,
             COUNT(*) FILTER (in_sample) AS n_sample,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                  AS DOUBLE) AS exact_sum,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                        FILTER (in_sample), 2) AS DOUBLE) AS sample_sum
      FROM s)
    SELECT n_total, n_sample, exact_sum,
           ROUND(sample_sum * (4096.0 / 41.0) * 100) / 100 AS estimated_sum,
           ROUND(ABS(sample_sum * (4096.0 / 41.0) - exact_sum)
                 / exact_sum * 1000000) / 1000000 AS rel_err
    FROM agg
    """,
    tags=("agg", "approx", "sampling"),
)
def q_aqp_estimate(spark, sf_dir):
    """Approximate query processing from a DETERMINISTIC ~1% sample:
    rows whose md5(id) 12-bit prefix < 41 (p = 41/4096), Horvitz-
    Thompson scale-up by 1/p — the dashboard trick that answers a
    100 TB SUM from a 1 TB scan. The sample predicate is engine- and
    layout-stable (same md5 arithmetic as doc_split), so estimate AND
    realized relative error hash-oracle exactly; the exact sum rides
    along here as the verification column (at scale you would not
    compute it — that is the point)."""
    o = load_table(spark, sf_dir, "orders")
    in_sample = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 3), 16, 10)
        .cast("long")
        < 41
    )
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    agg = o.select(dec.alias("p"), in_sample.alias("in_sample")).agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).alias("n_sample"),
        F.round(F.sum("p"), 2).cast("double").alias("exact_sum"),
        F.round(F.sum(F.when(F.col("in_sample"), F.col("p"))), 2)
        .cast("double")
        .alias("sample_sum"),
    )
    scale = F.lit(4096.0) / F.lit(41.0)
    return agg.select(
        "n_total",
        "n_sample",
        "exact_sum",
        (F.round(F.col("sample_sum") * scale * F.lit(100.0), 0) / F.lit(100.0))
        .alias("estimated_sum"),
        (
            F.round(
                F.abs(F.col("sample_sum") * scale - F.col("exact_sum"))
                / F.col("exact_sum")
                * F.lit(1000000.0),
                0,
            )
            / F.lit(1000000.0)
        ).alias("rel_err"),
    )


@register(
    "q_event_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS n1,
             LEAD(event_type, 2) OVER w AS n2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_type || '>' || n1 || '>' || n2 AS path, COUNT(*) AS n
    FROM s WHERE n1 IS NOT NULL AND n2 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
    tags=("temporal", "paths"),
)
def q_event_paths(spark, sf_dir):
    """Top event paths (3-step behavioral n-grams per user) — the
    product-analytics "what do users do next" query and the sequence-
    mining primitive behind session modeling. ONE shuffle on user_id
    (the window), then a map-side-combined count over a bounded path
    domain (|event_types|³); ordering inside the window is pinned by
    the unique (ts, event_id) pair."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
        )
        .select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("n1"),
            F.lead("event_type", 2).over(w).alias("n2"),
        )
    )
    return (
        s.filter(F.col("n1").isNotNull() & F.col("n2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "n1", "n2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "q_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    c AS (SELECT src, dst, COUNT(*) AS n FROM s
          WHERE dst IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT src, SUM(n) AS tot FROM c GROUP BY 1)
    SELECT c.src, c.dst, c.n,
           ROUND(c.n * 1.0 / t.tot * 1000000) / 1000000 AS p
    FROM c JOIN t ON c.src = t.src
    ORDER BY c.src, c.dst
    """,
    tags=("temporal", "paths"),
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences — P(next event | current event), the model behind
    q_event_paths' raw n-grams. One user_id window shuffle, then two
    tiny aggregates over the bounded |event_types|² domain; the
    probabilities divide exact integers, so the matrix hash-oracles."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    c = s.groupBy("src", "dst").agg(F.count("*").alias("n"))
    t = c.groupBy("src").agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(t), "src")
        .select(
            "src",
            "dst",
            "n",
            (
                F.round(F.col("n") * F.lit(1.0) / F.col("tot") * F.lit(1000000.0), 0)
                / F.lit(1000000.0)
            ).alias("p"),
        )
        .orderBy("src", "dst")
    )


@register(
    "q_mom_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                  AS DOUBLE) AS revenue
      FROM orders GROUP BY 1)
    SELECT month, revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month) * 1000000) / 1000000
             + 0.0 AS mom_growth
    FROM m ORDER BY month
    """,
    tags=("temporal", "kpi"),
)
def q_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth — the period-over-period KPI
    window. Monthly sums go through exact decimal; the growth ratio
    divides two such doubles (identical in both engines) with the
    signed-round `+ 0.0` guard. The unpartitioned LAG runs over ~tens
    of month rows AFTER aggregation — spine-sized, never fact-sized."""
    from pyspark.sql import Window as W

    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
                 .alias("month"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    w = W.orderBy("month")
    growth = (F.col("revenue") - F.lag("revenue").over(w)) / F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        (
            F.round(growth * F.lit(1000000.0), 0) / F.lit(1000000.0) + F.lit(0.0)
        ).alias("mom_growth"),
    ).orderBy("month")


@register(
    "q_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency,
             COUNT(*) AS frequency,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                  AS DOUBLE) AS monetary
      FROM orders GROUP BY 1),
    cuts AS (SELECT quantile_cont(recency * 1.0, [0.25, 0.5, 0.75]) AS rc,
                    quantile_cont(frequency * 1.0, [0.25, 0.5, 0.75]) AS fc,
                    quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mc
             FROM cust),
    scored AS (
      SELECT monetary,
             CAST(4 - len(list_filter(rc, c -> recency * 1.0 > c))
                  AS BIGINT) AS r_score,
             CAST(1 + len(list_filter(fc, c -> frequency * 1.0 > c))
                  AS BIGINT) AS f_score,
             CAST(1 + len(list_filter(mc, c -> monetary > c))
                  AS BIGINT) AS m_score
      FROM cust, cuts)
    SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(monetary AS DECIMAL(14,2))), 2) AS DOUBLE)
             AS segment_revenue
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("analytics", "segmentation"),
)
def q_rfm_segments(spark, sf_dir):
    """RFM customer segmentation (recency / frequency / monetary
    quartile scores, 1–4 each; recent = HIGH r_score): per-customer
    aggregates → exact interpolated quartile cut-points (bit-identical
    across engines, the q_percentiles guarantee) → score via the
    9-literal array fold (the q_equidepth_hist bucketing move, so no
    global NTILE window) → segment rollup. Two bounded shuffles
    (customer grain, segment grain); the cuts and the corpus-max date
    broadcast. Money exact-decimal end to end."""
    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    cust = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("maxd"), F.max("o_orderdate")).alias("recency"),
            F.count("*").alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("monetary"),
        )
    )
    cuts = cust.agg(
        F.expr("percentile(recency * 1.0, array(0.25D, 0.5D, 0.75D))").alias("rc"),
        F.expr("percentile(frequency * 1.0, array(0.25D, 0.5D, 0.75D))").alias(
            "fc"
        ),
        F.expr("percentile(monetary, array(0.25D, 0.5D, 0.75D))").alias("mc"),
    )
    scored = cust.crossJoin(F.broadcast(cuts)).select(
        "monetary",
        (
            F.lit(4)
            - F.expr(
                "aggregate(rc, 0, (a, c) -> a + IF(recency * 1.0 > c, 1, 0))"
            )
        )
        .cast("long")
        .alias("r_score"),
        (
            F.lit(1)
            + F.expr(
                "aggregate(fc, 0, (a, c) -> a + IF(frequency * 1.0 > c, 1, 0))"
            )
        )
        .cast("long")
        .alias("f_score"),
        (
            F.lit(1)
            + F.expr("aggregate(mc, 0, (a, c) -> a + IF(monetary > c, 1, 0))")
        )
        .cast("long")
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("monetary").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("segment_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "q_percentiles_disc",
    oracle="""
    SELECT o_orderstatus,
           quantile_disc(o_totalprice, 0.5) AS p50_disc,
           quantile_disc(o_totalprice, 0.9) AS p90_disc
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def q_percentiles_disc(spark, sf_dir):
    """PERCENTILE_DISC semantics (smallest value whose cume_dist ≥ p —
    always an ACTUAL data value, unlike q_percentiles' interpolation).
    Spark has no disc aggregate, so the SQL-standard definition is
    spelled directly: cume_dist window + conditional min — which also
    documents exactly which element the oracle's quantile_disc picks.
    One window pass per status partition, one aggregate."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice")
    cd = F.cume_dist().over(w)
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_totalprice", cd.alias("cd"))
        .groupBy("o_orderstatus")
        .agg(
            F.min(F.when(F.col("cd") >= 0.5, F.col("o_totalprice"))).alias(
                "p50_disc"
            ),
            F.min(F.when(F.col("cd") >= 0.9, F.col("o_totalprice"))).alias(
                "p90_disc"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_sequence_gaps",
    oracle="""
    WITH s AS (
      SELECT o_orderkey AS k,
             LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
      FROM orders)
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           nxt - k - 1 AS gap_len
    FROM s WHERE nxt > k + 1
    ORDER BY gap_len DESC, gap_start LIMIT 20
    """,
    tags=("quality", "sequence"),
)
def q_sequence_gaps(spark, sf_dir):
    """Sequence-gap detection over the order-key space (the "did ingest
    drop a range" audit): sorted LEAD diff surfaces every missing run as
    (gap_start, gap_end, len); top-20 by size. The unpartitioned window
    is over the KEY COLUMN ONLY after column pruning; at 100 TB,
    range-partition the keys and seam-check partition boundaries with
    the q_global_rownum offset pattern — the per-partition LEADs stay
    parallel and only the 16 boundary rows need a second look."""
    from pyspark.sql import Window as W

    w = W.orderBy("k")
    s = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .withColumn("nxt", F.lead("k").over(w))
    )
    return (
        s.filter(F.col("nxt") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
            (F.col("nxt") - F.col("k") - 1).alias("gap_len"),
        )
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(20)
    )


@register(
    "q_ratio_to_report",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
             CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2)
                  AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2)
    SELECT region, nation, revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY region)
                 * 1000000) / 1000000 AS share_of_region,
           ROUND(revenue / SUM(revenue) OVER () * 1000000) / 1000000
             AS share_of_total
    FROM rev ORDER BY region, nation
    """,
    tags=("window", "olap"),
)
def q_ratio_to_report(spark, sf_dir):
    """Ratio-to-report (percent-of-total window) — per-nation revenue
    share within its region and overall, the classic OLAP contribution
    query. Shares divide the SAME exact-decimal-rounded doubles both
    engines computed, and the window sums ride on the tiny aggregated
    grain (nations), so the unpartitioned total window is spine-sized.
    Dims broadcast onto the fact scan; one fact shuffle."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("region"),
            F.col("c_nationkey").alias("nation"),
        )
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    def r6(c_):  # stable_round at 6 dp — the shared determinism helper
        return stable_round(c_, 6)
    return rev.select(
        "region",
        "nation",
        "revenue",
        r6(F.col("revenue") / F.sum("revenue").over(W.partitionBy("region")))
        .alias("share_of_region"),
        r6(
            F.col("revenue")
            / F.sum("revenue").over(W.partitionBy())
        ).alias("share_of_total"),
    ).orderBy("region", "nation")


@register(
    "q_key_skew_audit",
    oracle="""
    WITH c AS (SELECT l_orderkey AS k, COUNT(*) AS cnt FROM lineitem
               GROUP BY 1),
    r AS (SELECT cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt, k) AS i
          FROM c),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cnt) AS BIGINT) AS tot,
                 CAST(MAX(cnt) AS BIGINT) AS max_cnt,
                 CAST(SUM(i * cnt) AS BIGINT) AS iw
          FROM r)
    SELECT n AS n_keys, tot AS n_rows, max_cnt,
           ROUND((max_cnt * n * 1.0 / tot) * 1000000) / 1000000
             AS max_over_mean,
           ROUND((2.0 * iw / (n * 1.0 * tot) - (n + 1.0) / n) * 1000000)
             / 1000000 + 0.0 AS gini
    FROM s
    """,
    tags=("quality", "skew"),
)
def q_key_skew_audit(spark, sf_dir):
    """Partition-key skew audit — the numbers that decide whether a join
    or agg on this key needs salting (operators/skew.py) BEFORE you pay
    for a failed shuffle: per-key counts, max/mean hot-key ratio, and
    the exact Gini coefficient of the key distribution (sorted-rank
    formula G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n over integer counts — all
    exact inputs, hash-stable). The rank window runs over the KEY-COUNT
    relation, and the q_global_rownum range-partition form removes even
    that single-partition window at extreme key cardinality."""
    from pyspark.sql import Window as W

    c = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count("*").alias("cnt"))
    )
    r = c.withColumn(
        "i", F.row_number().over(W.orderBy("cnt", "k"))
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("tot"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("i") * F.col("cnt")).alias("iw"),
    )
    def r6(c_):  # stable_round at 6 dp — the shared determinism helper
        return stable_round(c_, 6)
    return s.select(
        F.col("n").alias("n_keys"),
        F.col("tot").alias("n_rows"),
        "max_cnt",
        r6(F.col("max_cnt") * F.col("n") * F.lit(1.0) / F.col("tot")).alias(
            "max_over_mean"
        ),
        (
            r6(
                F.lit(2.0) * F.col("iw")
                / (F.col("n") * F.lit(1.0) * F.col("tot"))
                - (F.col("n") + F.lit(1.0)) / F.col("n")
            )
            + F.lit(0.0)  # -0.0 guard: gini can round up to zero from below
        ).alias("gini"),
    )


@register(
    "q_trend_forecast",
    oracle="""
    WITH m AS (
      SELECT CAST(date_diff('month', DATE '1995-01-01',
                            date_trunc('month', o_orderdate)) AS BIGINT) AS x,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100)
                  AS BIGINT) AS y
      FROM orders GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(MAX(x) AS BIGINT) AS last_x
          FROM m),
    fit AS (SELECT n, last_x,
                   (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) AS slope,
                   (sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx)
                     / n AS icept
            FROM s),
    f AS (SELECT last_x + CAST(k AS BIGINT) + 1 AS x, slope, icept
          FROM fit, (SELECT unnest(range(3)) AS k))
    SELECT x AS month_idx,
           ROUND((icept + slope * x) / 100.0 * 100) / 100 + 0.0
             AS forecast_revenue
    FROM f ORDER BY month_idx
    """,
    tags=("temporal", "forecast"),
)
def q_trend_forecast(spark, sf_dir):
    """Linear-trend forecasting: OLS fit of monthly revenue (exact
    int64 cents, month index from a fixed epoch) via integer sufficient
    statistics — the q_regr_ols closed form re-derived by hand so the
    fit AND the 3-month extrapolation hash-oracle exactly (identical
    integer inputs → identical doubles). The monthly aggregate is the
    only corpus-sized work; the fit and forecast are spine-sized. The
    honest caveat is in the name: it's a TREND line, the baseline any
    real forecaster must beat."""
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.lit("1995-01-01").cast("date")
            )
            .cast("long")
            .alias("x")
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100, 0
            )
            .cast("long")
            .alias("y")
        )
    )
    s = m.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("x").alias("last_x"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * F.lit(
        1.0
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    icept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    fit = s.select("last_x", slope.alias("slope"), icept.alias("icept"))
    f = fit.select(
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("k"),
        "last_x",
        "slope",
        "icept",
    ).select(
        (F.col("last_x") + F.col("k")).alias("month_idx"), "slope", "icept"
    )
    return f.select(
        "month_idx",
        (
            F.round(
                (F.col("icept") + F.col("slope") * F.col("month_idx"))
                / F.lit(100.0)
                * F.lit(100.0),
                0,
            )
            / F.lit(100.0)
            + F.lit(0.0)  # signed-round guard: a declining fit can go < 0
        ).alias("forecast_revenue"),
    ).orderBy("month_idx")


@register(
    "q_dow_hour_heatmap",
    oracle="""
    SELECT (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 3) % 7 + 1
             AS dow_iso,
           CAST(hour(ts) AS INT) AS hour,
           COUNT(*) AS n_events,
           ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY dow_iso, hour
    """,
    tags=("temporal", "serving"),
)
def q_dow_hour_heatmap(spark, sf_dir):
    """Calendar activity heatmap (ISO day-of-week × hour) — the
    dashboard serving aggregate. Day-of-week is computed as portable
    integer arithmetic ((days-since-epoch + 3) % 7 + 1, Monday = 1)
    rather than either engine's dayofweek(), whose week-start
    conventions differ (Spark: Sunday=1; DuckDB %w: Sunday=0) — the
    same class of trap as the -0.0 rounding. One map-side-combined
    shuffle into a fixed 7×24 grid."""
    ev = load_table(spark, sf_dir, "events")
    dow = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        + 3
    ) % 7 + 1
    return (
        ev.groupBy(
            dow.cast("long").alias("dow_iso"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            stable_round(F.sum("value")).alias("sum_value"),
        )
        .orderBy("dow_iso", "hour")
    )


@register(
    "q_user_entropy",
    oracle="""
    WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
    t AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
    e AS (SELECT c.user_id,
                 CAST(ROUND(SUM(-(c.n * 1.0 / t.tot)
                                * log2(c.n * 1.0 / t.tot)) * 1000000)
                      AS BIGINT) AS h_micro
          FROM c JOIN t USING (user_id) GROUP BY c.user_id)
    SELECT COUNT(*) AS n_users,
           ROUND(SUM(h_micro) * 1.0 / COUNT(*) / 1000000.0 * 10000) / 10000
             AS mean_entropy_bits,
           ROUND(MAX(h_micro) / 1000000.0 * 10000) / 10000
             AS max_entropy_bits
    FROM e
    """,
    tags=("analytics", "entropy"),
)
def q_user_entropy(spark, sf_dir):
    """Behavioral diversity: Shannon entropy (bits) of each user's
    event-type mix, summarized over the user base — the bot/monoculture
    screen (H = 0 means a user does exactly one thing). Per-user
    entropy derives from exact integer ratios, then QUANTIZES to int64
    micro-bits before the cross-user average — the only cross-row float
    reduction is an exact integer sum (the recurring exactness move).
    The per-user Σ p·log p sums ≤ |event_types| terms inside one group
    from identical doubles; the 6-dp round absorbs any ±1-ulp order
    difference before the integer quantize pins everything after."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") * F.lit(1.0) / F.col("tot")
    e = (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.sum(-p * F.log2(p)) * F.lit(1000000.0), 0)
            .cast("long")
            .alias("h_micro")
        )
    )
    return e.agg(
        F.count("*").alias("n_users"),
        (
            F.round(
                F.sum("h_micro") * F.lit(1.0) / F.count("*") / F.lit(1000000.0)
                * F.lit(10000.0),
                0,
            )
            / F.lit(10000.0)
        ).alias("mean_entropy_bits"),
        (
            F.round(F.max("h_micro") / F.lit(1000000.0) * F.lit(10000.0), 0)
            / F.lit(10000.0)
        ).alias("max_entropy_bits"),
    )


_KM_ORACLE = """
WITH su AS (SELECT user_id, MIN(ts) AS s FROM events
            WHERE event_type = 'signup' GROUP BY 1),
fp AS (SELECT e.user_id, MIN(e.ts) AS p
       FROM events e JOIN su USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= su.s
       GROUP BY e.user_id),
mx AS (SELECT MAX(ts) AS m FROM events),
obs AS (SELECT su.user_id,
          CASE WHEN fp.p IS NOT NULL
               THEN CAST(date_diff('day', su.s, fp.p) AS BIGINT)
               ELSE CAST(date_diff('day', su.s, mx.m) AS BIGINT) END AS dur,
          fp.p IS NOT NULL AS observed
        FROM su LEFT JOIN fp USING (user_id), mx),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
per AS (SELECT dur, COUNT(*) AS c_all,
               CAST(COUNT(*) FILTER (observed) AS BIGINT) AS d
        FROM obs GROUP BY 1),
r AS (SELECT per.dur, per.d,
             tot.n - COALESCE(SUM(per.c_all) OVER
               (ORDER BY per.dur ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS n_risk
      FROM per, tot),
m AS (SELECT dur, d, CAST(n_risk AS BIGINT) AS n_risk,
        CASE WHEN d >= n_risk THEN CAST(-100000000 AS BIGINT)
             WHEN d = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(ROUND(ln(1.0 - d * 1.0 / n_risk) * 1000000)
                       AS BIGINT) END AS lg
      FROM r),
k AS (SELECT dur, d, n_risk,
        CAST(SUM(lg) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cum
      FROM m)
SELECT dur AS t_days, n_risk, d AS n_events,
       ROUND(exp(cum / 1000000.0) * 10000) / 10000 AS survival
FROM k WHERE d > 0 ORDER BY t_days
"""


@register("q_survival_km", oracle=_KM_ORACLE, tags=("analytics", "survival"))
def q_survival_km(spark, sf_dir):
    """Kaplan–Meier survival curve for signup → first purchase (with
    right-censoring at the corpus horizon for users who never convert)
    — time-to-event analysis, the product-limit estimator: S(t) =
    Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ). The cumulative PRODUCT becomes a
    cumulative SUM of per-step log terms quantized to int64 micro-nats
    (the q_user_entropy move), so the curve hash-oracles despite its
    multiplicative definition; the d = n_risk terminal step maps to a
    −100 log sentinel (S rounds to exactly 0 in both engines). Risk
    sets come from one cumulative count over the DISTINCT-duration
    spine (bounded by the time range, not users)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    mx = ev.agg(F.max("ts").alias("m"))
    obs = (
        su.join(fp, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("p").isNotNull(),
                F.datediff(F.col("p").cast("date"), F.col("s").cast("date")),
            )
            .otherwise(
                F.datediff(F.col("m").cast("date"), F.col("s").cast("date"))
            )
            .cast("long")
            .alias("dur"),
            F.col("p").isNotNull().alias("observed"),
        )
    )
    tot = obs.agg(F.count("*").alias("n"))
    per = obs.groupBy("dur").agg(
        F.count("*").alias("c_all"),
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).alias("d"),
    )
    wprev = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    r = per.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d",
        (F.col("n") - F.coalesce(F.sum("c_all").over(wprev), F.lit(0)))
        .cast("long")
        .alias("n_risk"),
    )
    lg = (
        F.when(F.col("d") >= F.col("n_risk"), F.lit(-100000000).cast("long"))
        .when(F.col("d") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.round(
                F.log(F.lit(1.0) - F.col("d") * F.lit(1.0) / F.col("n_risk"))
                * F.lit(1000000.0),
                0,
            ).cast("long")
        )
    )
    wcum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    k = r.withColumn("lg", lg).withColumn("cum", F.sum("lg").over(wcum))
    return (
        k.filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("t_days"),
            "n_risk",
            F.col("d").alias("n_events"),
            (
                F.round(
                    F.exp(F.col("cum") / F.lit(1000000.0)) * F.lit(10000.0), 0
                )
                / F.lit(10000.0)
            ).alias("survival"),
        )
        .orderBy("t_days")
    )


#: q_quantile_histogram bin width, cents per bin ($1000) — interpolated
#: into BOTH engines' expressions so the width lives in exactly one place
_QH_W = 100_000


@register(
    "q_quantile_histogram",
    oracle=f"""
    WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
    hist AS (SELECT c // {_QH_W} AS bin, COUNT(*) AS n FROM c GROUP BY 1),
    h2 AS (SELECT bin, n, SUM(n) OVER (ORDER BY bin) AS cum,
                  SUM(n) OVER (ORDER BY bin) - n AS cum_prev FROM hist),
    tot AS (SELECT COUNT(*) AS total FROM c),
    q AS (SELECT unnest([2500, 5000, 7500, 9000, 9900]) AS qnum),
    spec AS (SELECT qnum, (total * qnum + 9999) // 10000 AS t FROM q, tot),
    pick AS (SELECT s.qnum, s.t, h.bin, h.n, h.cum_prev
             FROM spec s JOIN h2 h ON h.cum >= s.t AND h.cum_prev < s.t),
    ranked AS (SELECT p.qnum, p.t, p.cum_prev, p.bin, p.n, c.c,
                      ROW_NUMBER() OVER (PARTITION BY p.qnum ORDER BY c.c)
                        AS rn
               FROM pick p JOIN c ON c.c // {_QH_W} = p.bin)
    SELECT qnum,
           CAST(bin * {_QH_W} + ({_QH_W} * (t - cum_prev)) // n AS BIGINT)
             AS est_cents,
           c AS exact_cents,
           CAST(bin * {_QH_W} + ({_QH_W} * (t - cum_prev)) // n - c AS BIGINT)
             AS err_cents
    FROM ranked WHERE rn = t - cum_prev
    ORDER BY qnum
    """,
    tags=("agg", "sketch", "percentile"),
)
def q_quantile_histogram(spark, sf_dir):
    """Mergeable QUANTILE sketch — the missing member of the sketch
    family (HLL distincts, CMS frequencies, Bloom membership, bitmap
    rollups, freqItems heavy hitters): a fixed-width histogram of
    o_totalprice in $1000 bins. The histogram is (bin, n) integer counts
    — shards/days merge by ``groupBy(bin).sum(n)`` exactly like the
    other sketches — and any percentile is served from the ~550-row
    summary with error ≤ one bin width, no re-scan. Both halves of the
    answer ship: the histogram ESTIMATE (within-bin linear
    interpolation, integer DIV arithmetic so both engines agree) and the
    EXACT value via the scalable two-pass quantile: cumulative bin
    counts locate (bin, k), then only that bin's members are ranked —
    never a global sort or a corpus-wide window. The cumulative window
    runs over the bounded bin relation (domain/width rows, the
    sketch-sized exception test_q_global_rownum's gate allows), so at
    100 TB the only corpus-wide work is one map-side-combined groupBy.
    A pytest pins |err| ≤ bin width for every percentile."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    )
    hist = c.groupBy(F.expr(f"c DIV {_QH_W}").alias("bin")).agg(
        F.count("*").alias("n")
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    h2 = hist.withColumn("cum", F.sum("n").over(wcum)).withColumn(
        "cum_prev", F.col("cum") - F.col("n")
    )
    tot = c.agg(F.count("*").alias("total"))
    q = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in (2500, 5000, 7500, 9000, 9900)]))
        .alias("qnum")
    )
    spec = q.crossJoin(F.broadcast(tot)).select(
        "qnum", F.expr("(total * qnum + 9999) DIV 10000").alias("t")
    )
    pick = spec.join(
        h2, (F.col("cum") >= F.col("t")) & (F.col("cum_prev") < F.col("t"))
    ).select("qnum", "t", "bin", "n", "cum_prev")
    members = c.withColumn("bin", F.expr(f"c DIV {_QH_W}")).join(
        F.broadcast(pick), "bin"
    )
    ranked = members.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("qnum").orderBy("c")
        ),
    ).filter(F.col("rn") == F.col("t") - F.col("cum_prev"))
    return ranked.select(
        "qnum",
        F.expr(f"bin * {_QH_W} + ({_QH_W} * (t - cum_prev)) DIV n")
        .cast("long")
        .alias("est_cents"),
        F.col("c").alias("exact_cents"),
        F.expr(f"bin * {_QH_W} + ({_QH_W} * (t - cum_prev)) DIV n - c")
        .cast("long")
        .alias("err_cents"),
    ).orderBy("qnum")
