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
