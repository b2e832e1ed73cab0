"""Data-quality constraint suite (Deequ-style) and corpus statistics.

The audit-before-train step of a 100 TB pipeline: declare constraints
(completeness, uniqueness, value ranges, accepted domains, referential
integrity), evaluate them in as few passes as the metrics allow, and emit
one row per constraint with its measured metric and pass/fail verdict.
All metrics are exact integer counts divided once at the end, so the
result hashes identically across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.functions import stable_round
from distribot_spark.queries.registry import register

_CONSTRAINTS_ORACLE = """
WITH o AS (
  SELECT COUNT(*) AS total,
         COUNT(o_custkey) AS custkey_nonnull,
         COUNT(DISTINCT o_orderkey) AS orderkey_distinct,
         COUNT(DISTINCT o_custkey) AS custkey_distinct,
         COUNT(*) FILTER (o_totalprice >= 0) AS price_nonneg,
         COUNT(*) FILTER (o_orderstatus IN ('O', 'F', 'P')) AS status_ok
  FROM orders),
ri AS (
  SELECT COUNT(*) AS li_total,
         COUNT(*) FILTER (o_orderkey IS NOT NULL) AS li_matched
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) k
    ON l.l_orderkey = k.o_orderkey),
m AS (
  SELECT 'accepted_values_o_orderstatus' AS constraint,
         ROUND((status_ok * 1.0 / total) * 1000000) / 1000000 AS metric,
         status_ok = total AS passed FROM o
  UNION ALL
  SELECT 'completeness_o_custkey',
         ROUND((custkey_nonnull * 1.0 / total) * 1000000) / 1000000,
         custkey_nonnull = total FROM o
  UNION ALL
  SELECT 'range_o_totalprice_nonneg',
         ROUND((price_nonneg * 1.0 / total) * 1000000) / 1000000,
         price_nonneg = total FROM o
  UNION ALL
  SELECT 'ref_integrity_lineitem_orderkey',
         ROUND((li_matched * 1.0 / li_total) * 1000000) / 1000000,
         li_matched = li_total FROM ri
  UNION ALL
  SELECT 'row_count_positive', CAST(total AS DOUBLE), total > 0 FROM o
  UNION ALL
  SELECT 'uniqueness_o_custkey',
         ROUND((custkey_distinct * 1.0 / total) * 1000000) / 1000000,
         custkey_distinct = total FROM o
  UNION ALL
  SELECT 'uniqueness_o_orderkey',
         ROUND((orderkey_distinct * 1.0 / total) * 1000000) / 1000000,
         orderkey_distinct = total FROM o)
SELECT * FROM m ORDER BY "constraint"
"""


@register("q_constraints", oracle=_CONSTRAINTS_ORACLE, tags=("audit", "quality"))
def q_constraints(spark, sf_dir):
    """Declarative data-quality audit: 7 constraints over orders (+ one
    referential-integrity check against lineitem), one result row each
    with the measured metric and verdict.

    Scale shape: all single-table metrics come from ONE aggregate over
    the orders scan (the two exact count-distincts plan as a shared
    Expand with partial aggregation — no extra scan per constraint;
    swap in approx_count_distinct for unbounded domains, see
    q_profile_orders). Referential integrity is a LEFT SEMI count on
    lineitem — the only shuffle whose width scales with the fact table.
    The verdict table is 7 rows regardless of input size; nothing else
    is collected. `uniqueness_o_custkey` fails by construction
    (customers repeat across orders), exercising the FAIL branch."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count("*").alias("total"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.count_distinct("o_orderkey").alias("orderkey_distinct"),
        F.count_distinct("o_custkey").alias("custkey_distinct"),
        F.count(F.when(F.col("o_totalprice") >= 0, 1)).alias("price_nonneg"),
        F.count(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("status_ok"),
    )
    matched = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    ri = li.agg(F.count("*").alias("li_total")).crossJoin(
        matched.agg(F.count("*").alias("li_matched"))
    )

    def frac(num, den):
        # ROUND((num/den) * 1e6)/1e6 — same spelled-out form as the oracle
        ratio = F.col(num) * F.lit(1.0) / F.col(den)
        return F.round(ratio * F.lit(1000000.0), 0) / F.lit(1000000.0)

    def row(name, metric, passed):
        return F.struct(
            F.lit(name).alias("constraint"),
            metric.alias("metric"),
            passed.alias("passed"),
        )

    o_rows = o.select(
        F.inline(
            F.array(
                row(
                    "accepted_values_o_orderstatus",
                    frac("status_ok", "total"),
                    F.col("status_ok") == F.col("total"),
                ),
                row(
                    "completeness_o_custkey",
                    frac("custkey_nonnull", "total"),
                    F.col("custkey_nonnull") == F.col("total"),
                ),
                row(
                    "range_o_totalprice_nonneg",
                    frac("price_nonneg", "total"),
                    F.col("price_nonneg") == F.col("total"),
                ),
                row(
                    "row_count_positive",
                    F.col("total").cast("double"),
                    F.col("total") > 0,
                ),
                row(
                    "uniqueness_o_custkey",
                    frac("custkey_distinct", "total"),
                    F.col("custkey_distinct") == F.col("total"),
                ),
                row(
                    "uniqueness_o_orderkey",
                    frac("orderkey_distinct", "total"),
                    F.col("orderkey_distinct") == F.col("total"),
                ),
            )
        )
    )
    ri_rows = ri.select(
        F.inline(
            F.array(
                row(
                    "ref_integrity_lineitem_orderkey",
                    frac("li_matched", "li_total"),
                    F.col("li_matched") == F.col("li_total"),
                )
            )
        )
    )
    return o_rows.unionByName(ri_rows).orderBy("constraint")


@register(
    "doc_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents),
    model AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT COUNT(*) AS t FROM toks),
    lp AS (SELECT tok,
                  CAST(ROUND(LN(cnt * 1.0 / t) * 1000000) AS BIGINT) AS lp_micro
           FROM model, total),
    scored AS (
      SELECT toks.doc_id, COUNT(*) AS n_tokens, SUM(lp.lp_micro) AS s
      FROM toks JOIN lp ON toks.tok = lp.tok GROUP BY toks.doc_id)
    SELECT doc_id, n_tokens,
           ROUND((-(s / 1000000.0) / n_tokens) * 10000) / 10000 + 0.0
             AS avg_surprisal
    FROM scored ORDER BY doc_id
    """,
    tags=("llm", "text", "perplexity"),
)
def doc_perplexity(spark, sf_dir):
    """Unigram language-model scoring (the CCNet/Gopher perplexity-filter
    shape): train token frequencies on the corpus itself, then score each
    document by mean surprisal -1/n * sum(ln p(tok)) in nats — high =
    unusual vocabulary, low = boilerplate. Two shuffles (vocab count,
    per-doc score) plus a broadcast of the model; both aggregates combine
    map-side, and the corpus streams through the score join once. For an
    open web-scale vocabulary the model broadcast becomes a shuffle join
    and the model itself would be min-count-pruned.

    Determinism: each token's log-prob is quantized ONCE to integer
    micro-nats (ROUND(ln(p)*1e6), one rounding per vocab entry — the
    only cross-engine float op), so per-doc sums are exact integer
    arithmetic in any order; no ordered fold needed. Docs with zero
    [a-z]+ tokens drop out in both engines (inner join after explode)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("tok"),
    )
    model = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("t"))
    lp = model.join(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("cnt") * F.lit(1.0) / F.col("t")) * F.lit(1000000.0), 0)
        .cast("long")
        .alias("lp_micro"),
    )
    scored = (
        toks.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("lp_micro").alias("s"))
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        (
            stable_round(
                -(F.col("s") / F.lit(1000000.0)) / F.col("n_tokens"), 4
            )
            + 0.0
        ).alias("avg_surprisal"),
    ).orderBy("doc_id")


@register(
    "q_ks_drift",
    oracle="""
    WITH s AS (
      SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS bin,
             COUNT(*) FILTER (year(o_orderdate) = 1995) AS ca,
             COUNT(*) FILTER (year(o_orderdate) = 1996) AS cb
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)
      GROUP BY 1),
    t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM s),
    c AS (SELECT bin,
                 CAST(SUM(ca) OVER (ORDER BY bin) AS BIGINT) AS cuma,
                 CAST(SUM(cb) OVER (ORDER BY bin) AS BIGINT) AS cumb
          FROM s)
    SELECT na AS n_a, nb AS n_b,
           ROUND(ABS(cuma * 1.0 / na - cumb * 1.0 / nb) * 1000000) / 1000000
             AS ks_stat,
           bin AS at_bin
    FROM c, t
    ORDER BY ABS(cuma * 1.0 / na - cumb * 1.0 / nb) DESC, bin
    LIMIT 1
    """,
    tags=("quality", "drift"),
)
def q_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov drift statistic between the 1995 and
    1996 order-price distributions — the distribution-shift monitor a
    training pipeline runs between data snapshots before retraining.

    Discrete KS over integer dollar bins: per-bin conditional counts
    (ONE map-side-combined shuffle over the fact table), cumulative
    integer counts over the bin spine, D = max |F_a - F_b| with the
    arg-max bin reported (ties broken toward the smallest bin). All
    inputs to the doubles are exact int64 (cum counts / totals), so both
    engines divide identical integers — hash-stable with no rounding
    slack needed. SCALE NOTE: the windowed spine is bounded by the VALUE
    RANGE (distinct integer bins), not row count — at 100 TB the spine
    after partial aggregation is still ~1e5-1e6 rows; a single-partition
    cumulative over it is deliberate and cheap relative to the scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    s = o.groupBy(
        F.floor("o_totalprice").cast("long").alias("bin")
    ).agg(
        F.sum(F.when(F.year("o_orderdate") == 1995, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.year("o_orderdate") == 1996, 1).otherwise(0)).alias("cb"),
    )
    from pyspark.sql import Window

    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = s.select(
        "bin",
        F.sum("ca").over(wcum).alias("cuma"),
        F.sum("cb").over(wcum).alias("cumb"),
    )
    t = s.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    diff = F.abs(
        F.col("cuma") * F.lit(1.0) / F.col("na")
        - F.col("cumb") * F.lit(1.0) / F.col("nb")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            (F.round(diff * F.lit(1000000.0), 0) / F.lit(1000000.0)).alias(
                "ks_stat"
            ),
            F.col("bin").alias("at_bin"),
            diff.alias("_d"),
        )
        .orderBy(F.col("_d").desc(), "at_bin")
        .drop("_d")
        .limit(1)
    )


_ZSCORE_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS rev_cents
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1, 2),
w AS (
  SELECT event_type, day, rev_cents,
    CAST(SUM(rev_cents) OVER f AS BIGINT) AS s1,
    CAST(SUM(rev_cents * rev_cents) OVER f AS BIGINT) AS s2,
    COUNT(*) OVER f AS n
  FROM d
  WINDOW f AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       ROUND(rev_cents / 100.0 * 100) / 100 AS rev,
       ROUND((rev_cents - s1 * 1.0 / n)
             / sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1))) * 1000) / 1000
         + 0.0 AS z,
       ABS(ROUND((rev_cents - s1 * 1.0 / n)
             / sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1))) * 1000) / 1000)
         > 2.5 AS is_anomaly
FROM w
WHERE n >= 7 AND n * s2 > s1 * s1
ORDER BY event_type, day
"""


@register("q_anomaly_zscore", oracle=_ZSCORE_ORACLE, tags=("quality", "anomaly"))
def q_anomaly_zscore(spark, sf_dir):
    """Trailing-window z-score anomaly detection on daily revenue per
    event type — the metric-monitoring shape (is today's value > 2.5σ
    from its own trailing-two-week baseline?).

    Determinism by construction: daily revenue is folded to exact int64
    CENTS, and the baseline mean/std are derived from integer window
    sums (Σx, Σx², n over a ROWS frame — order-insensitive in integer
    arithmetic), so both engines evaluate identical doubles; no reliance
    on cross-engine AVG/STDDEV summation order. One shuffle to the daily
    grain, one window pass per event_type partition."""
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.round(F.sum("value") * F.lit(100.0), 0)
            .cast("long")
            .alias("rev_cents")
        )
    )
    f = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-14, -1)
    )
    w = d.select(
        "event_type",
        "day",
        "rev_cents",
        F.sum("rev_cents").over(f).alias("s1"),
        F.sum(F.col("rev_cents") * F.col("rev_cents")).over(f).alias("s2"),
        F.count("*").over(f).alias("n"),
    )
    mean = F.col("s1") * F.lit(1.0) / F.col("n")
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) * F.lit(1.0) / (
        F.col("n") * (F.col("n") - 1)
    )
    z = (F.col("rev_cents") - mean) / F.sqrt(var)
    zr = F.round(z * F.lit(1000.0), 0) / F.lit(1000.0)
    return (
        w.filter(
            (F.col("n") >= 7)
            & (F.col("n") * F.col("s2") > F.col("s1") * F.col("s1"))
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (
                F.round(F.col("rev_cents") / F.lit(100.0) * F.lit(100.0), 0)
                / F.lit(100.0)
            ).alias("rev"),
            (zr + F.lit(0.0)).alias("z"),
            (F.abs(zr) > 2.5).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_table_checksum",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST(('0x' || substr(md5(
                 concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
                           strftime(o_orderdate, '%Y-%m-%d'))), 1, 15))
               AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS checksum
    FROM orders
    """,
    tags=("quality", "reconciliation"),
)
def q_table_checksum(spark, sf_dir):
    """Order-insensitive table content checksum: each row canonicalizes
    to a delimited string (decimals and dates formatted, never raw
    doubles/timestamps), hashes to a 60-bit md5-prefix integer, and
    the EXACT decimal(38) sum of those integers fingerprints the
    table. Commutative addition ⇒ partition- and layout-independent;
    portable hashing ⇒ the same table in ANY engine produces the same
    checksum — the O(1)-output cross-system reconciliation primitive
    (cheaper than q_table_diff when you only need equal/not-equal).
    Map-only scan + a 1-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    h = (
        F.conv(F.substring(F.md5(canon), 1, 15), 16, 10)
        .cast("long")
        .cast("decimal(38,0)")
    )
    return o.agg(
        F.count("*").alias("n_rows"),
        F.sum(h).cast("string").alias("checksum"),
    )


@register(
    "q_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           ROUND(c.n * 1.0 / t.total * 1000000) / 1000000 AS observed,
           ROUND(log10(1.0 + 1.0 / c.digit) * 1000000) / 1000000
             AS benford_expected
    FROM c, t ORDER BY c.digit
    """,
    tags=("quality", "forensics"),
)
def q_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit — the numeric-forensics screen
    for fabricated or truncated monetary data (natural multi-scale
    amounts follow P(d) = log10(1 + 1/d); synthetic uniform data, like
    this testdata's prices, visibly does NOT — the deviation itself is
    the signal the audit reports). First digit via integer/string
    arithmetic identical in both engines; observed frequencies divide
    exact counts; the expectation column is a pure log10 literal
    expression. One map-side-combined shuffle into 9 rows."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    def r6(c_):  # stable_round at 6 dp — the shared determinism helper
        return stable_round(c_, 6)
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            r6(F.col("n") * F.lit(1.0) / F.col("total")).alias("observed"),
            r6(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))).alias(
                "benford_expected"
            ),
        )
        .orderBy("digit")
    )
