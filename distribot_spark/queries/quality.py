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
