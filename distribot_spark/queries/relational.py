"""Declared relational queries Q01–Q40 (SURVEY.md §2B).

Each query has an idiomatic DataFrame-API builder plus a DuckDB oracle SQL.
The builders stay fully declarative so Catalyst gets predicate pushdown,
column pruning, join selection (broadcast for dims), and whole-stage codegen;
nothing here collects to the driver.

Determinism conventions (see registry docstring): DECIMAL for money sums,
ROUND for float aggregates, date_format for date outputs, total ORDER BY,
identical aliases both sides.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distribot_spark.catalog import load_table, register_views
from distribot_spark.queries.registry import register

D12 = "decimal(12,2)"
D18 = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _money(col: str):
    """Exact decimal view of a 2-dp double column (parity with oracle CAST)."""
    return F.col(col).cast(D12)


def _dsum(expr, alias: str):
    """Exact decimal SUM → ROUND(…, 2) (half-away in both engines) → DOUBLE.

    Output is DOUBLE, not DECIMAL: DuckDB's client fetch renders decimals as
    float64, so emitting the identical float64 from Spark is the only
    representation-stable choice. The decimal arithmetic *inside* stays
    exact, so both engines round the same exact value."""
    return F.round(F.sum(expr), 2).cast("double").alias(alias)


def _round(col, nd: int = 2):
    """Cross-engine-stable double rounding: ROUND(x * 10^nd) / 10^nd with the
    multiply done in IEEE double on BOTH engines (oracle uses the same
    spelled-out form), so each rounds the same exact double half-away."""
    m = F.lit(float(10**nd))
    return F.round(col * m, 0) / m


# ---------------------------------------------------------------------------
# Q01–Q12: scans, filters, joins
# ---------------------------------------------------------------------------


@register(
    "q01",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scan", "projection"),
)
def q01(spark, sf_dir):
    """Scan + projection; ReadSchema prunes to 3 columns at the parquet scan."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q02",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
    ORDER BY o_orderkey
    """,
    tags=("filter",),
)
def q02(spark, sf_dir):
    """Conjunctive filter; both predicates reach PushedFilters."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_totalprice") > 150000) & (F.col("o_orderstatus") == "O"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@register(
    "q03",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate BETWEEN TIMESTAMP '1995-06-01' AND TIMESTAMP '1996-12-31'
      AND o_orderpriority LIKE '%-%'
      AND o_custkey IS NOT NULL
    ORDER BY o_orderkey
    """,
    tags=("filter", "in", "between", "like", "null"),
)
def q03(spark, sf_dir):
    """IN / BETWEEN / LIKE / IS NULL predicate surface."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderdate").between(
                F.lit("1995-06-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
            & F.col("o_orderpriority").like("%-%")
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "q04",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """,
    tags=("join", "inner"),
)
def q04(spark, sf_dir):
    """Inner equi-join; Catalyst/AQE picks broadcast vs SMJ from stats."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q05",
    oracle="""
    SELECT n_name,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
      COUNT(*) AS cnt
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("join", "multiway", "agg"),
)
def q05(spark, sf_dir):
    """TPC-H Q5 shape: 5-way join, filter one region. The tiny dims are
    broadcast explicitly — at 100 TB the fact tables shuffle once on the
    join keys and nation/region never shuffle at all."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(revenue, "revenue"), F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


@register(
    "q06",
    oracle="""
    SELECT c_custkey FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    WHERE o_orderkey IS NULL ORDER BY c_custkey
    """,
    tags=("join", "outer"),
)
def q06(spark, sf_dir):
    """Left outer join null-extension: customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q07",
    oracle="""
    SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
           COUNT(s_suppkey) AS n_supp, COUNT(c_custkey) AS n_cust
    FROM supplier FULL JOIN customer ON s_nationkey = c_nationkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "full_outer"),
)
def q07(spark, sf_dir):
    """Full outer join aggregated by the coalesced key."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    return (
        s.join(c, s.s_nationkey == c.c_nationkey, "full")
        .groupBy(F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"))
        .agg(
            F.count("s_suppkey").alias("n_supp"),
            F.count("c_custkey").alias("n_cust"),
        )
        .orderBy("nationkey")
    )


@register(
    "q08",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def q08(spark, sf_dir):
    """Left semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q09",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def q09(spark, sf_dir):
    """Left anti join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q10",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
    """,
    tags=("join", "cross"),
)
def q10(spark, sf_dir):
    """Bounded cross join (both sides tiny dims)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "q11",
    oracle="""
    SELECT p_brand, COUNT(*) AS cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("join", "theta"),
)
def q11(spark, sf_dir):
    """Equi + range (theta) join: hash join on the equi key with the range
    predicate applied post-match — never a nested-loop at scale."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
        .orderBy("p_brand")
    )


@register(
    "q12",
    oracle="""
    SELECT COUNT(*) AS pair_cnt
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
    """,
    tags=("join", "self"),
)
def q12(spark, sf_dir):
    """Self join with aliasing: intra-order line pairs."""
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .agg(F.count("*").alias("pair_cnt"))
    )


# ---------------------------------------------------------------------------
# Q13–Q18: aggregation
# ---------------------------------------------------------------------------


@register(
    "q13",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))
               * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
      ROUND(AVG(l_quantity) * 100) / 100 AS avg_qty,
      ROUND(AVG(l_extendedprice) * 100) / 100 AS avg_price,
      ROUND(AVG(l_discount) * 100) / 100 AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q13(spark, sf_dir):
    """TPC-H Q1 shape — the flagship: one wide scan, partial+final hash agg.
    At 100 TB this is scan-bound; the shipdate filter is pushed to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    ep, disc, tax = _money("l_extendedprice"), _money("l_discount"), _money("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_money("l_quantity"), "sum_qty"),
            _dsum(ep, "sum_base_price"),
            _dsum(ep * (F.lit(1) - disc), "sum_disc_price"),
            _dsum(ep * (F.lit(1) - disc) * (F.lit(1) + tax), "sum_charge"),
            _round(F.avg("l_quantity")).alias("avg_qty"),
            _round(F.avg("l_extendedprice")).alias("avg_price"),
            _round(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q14",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "distinct"),
)
def q14(spark, sf_dir):
    """Grouped count-distinct (expand + two-phase agg under the hood)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q14_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    tags=("distinct",),
)
def q14_distinct(spark, sf_dir):
    """Global DISTINCT via dropDuplicates."""
    return (
        _t(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .dropDuplicates()
        .orderBy("c_mktsegment")
    )


@register(
    "q15_exact",
    oracle="SELECT COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem",
    tags=("distinct",),
)
def q15_exact(spark, sf_dir):
    """Exact count-distinct companion for q15 (the approx variant)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )


def _q15_oracle():
    from distribot_spark.operators import hll as _hll

    return f"""
    WITH hashed AS (SELECT {_hll.hash_sql('l_partkey')} AS h FROM lineitem),
    regs AS (SELECT 'ALL' AS grp, {_hll.bucket_sql('h')} AS b,
                    MAX({_hll.rho_sql('h', '//')}) AS m_rho
             FROM hashed GROUP BY 1, 2),
    est AS ({_hll.estimate_from_registers_sql('regs', 'grp')})
    SELECT ROUND(est * 10000) / 10000 AS n_parts_approx FROM est
    """


@register("q15", oracle=_q15_oracle(), tags=("approx", "sketch"))
def q15(spark, sf_dir):
    """Approx count-distinct of l_partkey via the PORTABLE HyperLogLog
    (operators/hll.py) — registers from the spelled-out hash family,
    integer harmonic sufficient statistics, one terminal double — so
    the estimate HASH-MATCHES the DuckDB oracle bit-for-bit. Spark's
    engine-private approx_count_distinct stays covered by the ±2 %
    tolerance test (tests/test_operators.py) and the exact twin is
    q15_exact; the full rollup/error-reporting variant is q15_hll
    (queries/advanced.py). 100 TB shape: one corpus scan folding into
    ≤256 registers via map-side partial MAX — no exact-distinct
    shuffle of the key universe."""
    from distribot_spark.operators import hll as _hll

    li = _t(spark, sf_dir, "lineitem").select(
        F.lit("ALL").alias("grp"), F.col("l_partkey").alias("k")
    )
    est = _hll.estimate_hll(_hll.build_hll(li, "k", ["grp"]), ["grp"])
    return est.select(
        (F.round(F.col("est") * 10000, 0) / 10000).alias("n_parts_approx")
    )


@register(
    "q16",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      COUNT(*) AS cnt,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    tags=("agg", "rollup"),
)
def q16(spark, sf_dir):
    """ROLLUP with GROUPING() disambiguation."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("cnt"),
            _dsum(_money("o_totalprice"), "total"),
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@register(
    "q16_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      COUNT(*) AS cnt,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    tags=("agg", "cube"),
)
def q16_cube(spark, sf_dir):
    """CUBE: all 2^k grouping combinations (vs ROLLUP's k+1 prefixes)."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("cnt"),
            _dsum(_money("o_totalprice"), "total"),
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@register(
    "q16_gsets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      COUNT(*) AS cnt,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    tags=("agg", "grouping-sets"),
)
def q16_gsets(spark, sf_dir):
    """Explicit GROUPING SETS — an asymmetric set neither ROLLUP nor CUBE
    expresses: per-status, per-priority, and grand total (no (status,
    priority) cell). Uses the Spark 4 `DataFrame.groupingSets` API; one
    Expand + single hash-agg, same physical shape as rollup/cube."""
    return (
        _t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("cnt"),
            _dsum(_money("o_totalprice"), "total"),
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@register(
    "q17",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS cnt FROM customer
    GROUP BY c_nationkey HAVING COUNT(*) > 10 ORDER BY c_nationkey
    """,
    tags=("agg", "having"),
)
def q17(spark, sf_dir):
    """HAVING = post-aggregation filter."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 10)
        .orderBy("c_nationkey")
    )


@register(
    "q18",
    oracle="""
    SELECT l_returnflag,
      ROUND(STDDEV_SAMP(l_quantity) * 100) / 100 AS std_qty,
      ROUND(VAR_SAMP(l_quantity) * 100) / 100 AS var_qty,
      MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      ROUND(AVG(l_quantity) * 100) / 100 AS avg_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q18(spark, sf_dir):
    """Statistical aggregates."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            _round(F.stddev_samp("l_quantity")).alias("std_qty"),
            _round(F.var_samp("l_quantity")).alias("var_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            _round(F.avg("l_quantity")).alias("avg_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q19–Q23: window functions, top-k
# ---------------------------------------------------------------------------

def _w_price():
    return Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )


def _w_date():
    return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


@register(
    "q19",
    oracle="""
    SELECT o_custkey, o_orderkey,
      ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
      DENSE_RANK() OVER w AS drk, NTILE(4) OVER w AS nt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "ranking"),
)
def q19(spark, sf_dir):
    """Ranking window functions over a fully tie-broken ordering."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(_w_price()).alias("rn"),
            F.rank().over(_w_price()).alias("rk"),
            F.dense_rank().over(_w_price()).alias("drk"),
            F.ntile(4).over(_w_price()).alias("nt"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q20",
    oracle="""
    SELECT o_custkey, o_orderkey,
      LAG(o_totalprice) OVER w AS prev_price,
      LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "analytic"),
)
def q20(spark, sf_dir):
    """LAG/LEAD analytic windows (pass-through values: no rounding needed)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(_w_date()).alias("prev_price"),
            F.lead("o_totalprice").over(_w_date()).alias("next_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q21",
    oracle="""
    SELECT o_custkey, o_orderkey,
      ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100) / 100 AS running_total,
      ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100) / 100 AS moving_avg
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "frame"),
)
def q21(spark, sf_dir):
    """Explicit frame specs: running total + moving average."""
    run = _w_date().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = _w_date().rowsBetween(-2, Window.currentRow)
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            _round(F.sum("o_totalprice").over(run)).alias("running_total"),
            _round(F.avg("o_totalprice").over(mov)).alias("moving_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q22",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    tags=("window", "topk_per_group"),
)
def q22(spark, sf_dir):
    """Top-3 orders per customer: window rank + filter (no global sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(_w_price()).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "q23",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("sort", "topk"),
)
def q23(spark, sf_dir):
    """Global top-k: compiles to TakeOrderedAndProject (per-partition heap +
    driver merge of k rows — no full global sort even at 100 TB)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q24–Q26: set ops, subqueries, CTE
# ---------------------------------------------------------------------------


def _nation_sides(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c, s


@register(
    "q24_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    tags=("setop",),
)
def q24_union(spark, sf_dir):
    c, s = _nation_sides(spark, sf_dir)
    return c.union(s).dropDuplicates().orderBy("nationkey")


@register(
    "q24_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    tags=("setop",),
)
def q24_union_all(spark, sf_dir):
    c, s = _nation_sides(spark, sf_dir)
    return c.union(s).orderBy("nationkey")


@register(
    "q24_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    tags=("setop",),
)
def q24_intersect(spark, sf_dir):
    c, s = _nation_sides(spark, sf_dir)
    return c.intersect(s).orderBy("nationkey")


@register(
    "q24_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    tags=("setop",),
)
def q24_except(spark, sf_dir):
    c, s = _nation_sides(spark, sf_dir)
    return c.subtract(s).orderBy("nationkey")


@register(
    "q25_scalar",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    tags=("subquery",),
)
def q25_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery — via spark.sql to exercise Catalyst's
    subquery planning (broadcast of the 1-row aggregate)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "q25_correlated",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price,
           COUNT(*) AS cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("subquery", "correlated"),
)
def q25_correlated(spark, sf_dir):
    """Correlated scalar subquery (TPC-H Q17 shape); Catalyst decorrelates
    it into an aggregate + join — no per-row re-execution."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price,
               COUNT(*) AS cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """
    )


@register(
    "q26",
    oracle="""
    WITH big AS (
      SELECT o_custkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, total
    FROM big JOIN customer ON o_custkey = c_custkey
    WHERE total > 1000000
    ORDER BY c_custkey
    """,
    tags=("cte",),
)
def q26(spark, sf_dir):
    """CTE / reusable subplan via temp view."""
    big = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(_dsum(_money("o_totalprice"), "total"))
        .filter(F.col("total") > 1000000)
    )
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(c, big.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "total")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Q27–Q37: scalar function surface
# ---------------------------------------------------------------------------


@register(
    "q27",
    oracle="""
    SELECT p_partkey,
      UPPER(p_name) AS up_name, LOWER(p_type) AS lo_type,
      SUBSTRING(p_name, 1, 5) AS sub5,
      TRIM(CONCAT(' ', p_brand, ' ')) AS trimmed,
      CAST(LENGTH(p_name) AS INT) AS name_len,
      CONCAT(p_brand, '-', p_type) AS brand_type,
      REPLACE(p_name, ' ', '_') AS und_name,
      LPAD(CAST(p_size AS VARCHAR), 4, '0') AS padded_size
    FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey
    """,
    tags=("string",),
)
def q27(spark, sf_dir):
    """String function surface + LIKE pushdown (StringContains filter)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%red%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.lower("p_type").alias("lo_type"),
            F.substring("p_name", 1, 5).alias("sub5"),
            F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
            F.length("p_name").cast("int").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("und_name"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q28",
    oracle=r"""
    SELECT regexp_extract(p_type, '^(\w+)', 1) AS type_head, COUNT(*) AS cnt
    FROM part GROUP BY 1 ORDER BY 1
    """,
    tags=("regex",),
)
def q28(spark, sf_dir):
    """Regex extraction grouped."""
    return (
        _t(spark, sf_dir, "part")
        .groupBy(F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("type_head")
    )


@register(
    "q29",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2
    """,
    tags=("datetime",),
)
def q29(spark, sf_dir):
    """Date/time extraction + truncation (dates emitted as strings for
    cross-engine hash stability)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("yr", "mo")
    )


@register(
    "q29_datediff",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           ROUND(AVG(date_diff('day', o_orderdate, l_shipdate)) * 100) / 100 AS avg_ship_delay
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("datetime",),
)
def q29_datediff(spark, sf_dir):
    """Day-difference between ship and order dates, averaged per year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            _round(F.avg(F.datediff("l_shipdate", "o_orderdate"))).alias(
                "avg_ship_delay"
            )
        )
        .orderBy("yr")
    )


@register(
    "q30",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(12,2)))
           * (1 + CAST(l_tax AS DECIMAL(12,2))), 2) AS DOUBLE) AS charge,
      ABS(l_quantity - 25.0) AS dist25,
      CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS q_ceil,
      CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS q_floor,
      MOD(l_orderkey, 7) AS key_mod,
      ROUND(POWER(1 + l_discount, 2) * 1000000) / 1000000 AS pow_disc
    FROM lineitem WHERE l_orderkey % 50 = 0 ORDER BY l_orderkey, l_linenumber
    """,
    tags=("math",),
)
def q30(spark, sf_dir):
    """Arithmetic/math expression surface (charge via exact decimals)."""
    li = _t(spark, sf_dir, "lineitem")
    charge = F.round(
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount"))
        * (F.lit(1) + _money("l_tax")),
        2,
    ).cast("double")
    return (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            charge.alias("charge"),
            F.abs(F.col("l_quantity") - 25.0).alias("dist25"),
            F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("q_ceil"),
            F.floor(F.col("l_quantity") / 7.0).cast("bigint").alias("q_floor"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            _round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("pow_disc"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q31",
    oracle="""
    SELECT
      CASE WHEN o_totalprice > 250000 THEN 'big'
           WHEN o_totalprice > 100000 THEN 'mid'
           ELSE 'small' END AS bucket,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
      COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("conditional",),
)
def q31(spark, sf_dir):
    """CASE WHEN / COALESCE / NULLIF."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 250000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
    )
    status_label = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
    )
    return (
        o.groupBy(bucket.alias("bucket"), status_label.alias("status_label"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket", "status_label")
    )


@register(
    "q32",
    oracle="""
    SELECT l_returnflag,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price,
      ROUND(AVG(l_extendedprice) * 100) / 100 AS avg_price
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    tags=("decimal",),
)
def q32(spark, sf_dir):
    """Decimal cast + exact decimal aggregation."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            _dsum(_money("l_extendedprice"), "total_price"),
            _round(F.avg("l_extendedprice")).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q33",
    oracle="""
    SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      ROUND(CAST(embedding[1] AS DOUBLE) * 10000) / 10000 + 0.0
        AS first_val,
      ROUND(CAST(embedding[64] AS DOUBLE) * 10000) / 10000 + 0.0
        AS last_val
    FROM embeddings ORDER BY vec_id
    """,
    tags=("array",),
)
def q33(spark, sf_dir):
    """Array size + element access on the embedding column."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        (_round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0.0))
        .alias("first_val"),
        (_round(F.element_at("embedding", 64).cast("double"), 4) + F.lit(0.0))
        .alias("last_val"),
    ).orderBy("vec_id")


@register(
    "q33_agg",
    oracle="""
    SELECT label, COUNT(*) AS cnt,
      array_to_string(list_sort(list(vec_id)), ',') AS vec_ids
    FROM embeddings GROUP BY label ORDER BY label
    """,
    tags=("array", "agg"),
)
def q33_agg(spark, sf_dir):
    """Sorted array_agg per group, emitted as a joined string.
    (collect_list per group — bounded by group cardinality; fine for label
    dims, not for unbounded keys at 100 TB.)"""
    return (
        _t(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(
            F.count("*").alias("cnt"),
            F.array_join(F.array_sort(F.collect_list("vec_id")), ",").alias("vec_ids"),
        )
        .orderBy("label")
    )


@register(
    "q34",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price,
           o_orderpriority AS priority
    FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey
    """,
    tags=("struct", "map"),
)
def q34(spark, sf_dir):
    """Build struct + map, then field/key access (oracle states the
    semantic result: round-tripping through the nested types is identity)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        ).alias("info"),
        F.create_map(F.lit("priority"), F.col("o_orderpriority")).alias("m"),
    )
    return nested.select(
        "o_orderkey",
        F.col("info.status").alias("status"),
        F.col("info.price").alias("price"),
        F.col("m")[F.lit("priority")].alias("priority"),
    ).orderBy("o_orderkey")


@register(
    "q35",
    oracle="""
    SELECT vec_id, CAST(pos AS INT) AS pos,
           ROUND(CAST(val AS DOUBLE) * 10000) / 10000 + 0.0 AS val
    FROM (
      SELECT vec_id, unnest(range(len(embedding))) AS pos, unnest(embedding) AS val
      FROM embeddings WHERE vec_id < 20
    ) t ORDER BY vec_id, pos
    """,
    tags=("explode",),
)
def q35(spark, sf_dir):
    """posexplode/unnest of the embedding array."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            (_round(F.col("val").cast("double"), 4) + F.lit(0.0)).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


@register(
    "q36_typed",
    oracle="""
    SELECT k, COUNT(*) AS cnt,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unparsed
    FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events)
    GROUP BY k ORDER BY k
    """,
    tags=("json", "typed"),
)
def q36_typed(spark, sf_dir):
    """Typed JSON parsing: `from_json` with an explicit struct schema (vs
    q36's per-path get_json_object string extraction) — the schema-on-read
    contract for semi-structured columns, with unparseable rows surfacing
    as NULL structs instead of job failures."""
    parsed = _t(spark, sf_dir, "events").select(
        F.from_json("props", "k INT").alias("p")
    )
    return (
        parsed.groupBy(F.col("p.k").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("p.k").isNull().cast("long")).alias("n_unparsed"),
        )
        .orderBy("k")
    )


@register(
    "q36",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           COUNT(*) AS cnt, ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("json",),
)
def q36(spark, sf_dir):
    """JSON extraction over the events.props blob."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .agg(
            F.count("*").alias("cnt"),
            _round(F.sum("value")).alias("sum_value"),
        )
        .orderBy("k")
    )


@register(
    "q37",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_orderkey % 100 = 0 ORDER BY l_orderkey, l_linenumber
    """,
    tags=("sample",),
)
def q37(spark, sf_dir):
    """Deterministic modulo 'sample' (true .sample is ≈, non-oracle)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Q38–Q40: pivot, UDF, grouped-map
# ---------------------------------------------------------------------------


@register(
    "q38",
    oracle="""
    SELECT o_orderpriority,
      CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O'
               THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS sum_o,
      CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
               THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS sum_f,
      CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P'
               THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS sum_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("pivot",),
)
def q38(spark, sf_dir):
    """Pivot on order status (explicit value list ⇒ single-pass, no extra
    distinct-values job)."""
    p = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(_money("o_totalprice")))
    )
    return p.select(
        "o_orderpriority",
        F.round(F.col("O"), 2).cast("double").alias("sum_o"),
        F.round(F.col("F"), 2).cast("double").alias("sum_f"),
        F.round(F.col("P"), 2).cast("double").alias("sum_p"),
    ).orderBy("o_orderpriority")


@register(
    "q39",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) / 100 AS charge
    FROM lineitem WHERE l_orderkey % 50 = 0 ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf",),
)
def q39(spark, sf_dir):
    """Arrow-batched pandas UDF recomputing the charge expression.
    (Demonstrates the sanctioned Python path; rounding stays JVM-side so
    semantics match the built-in ROUND.)"""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def charge_udf(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ep * (1 - disc) * (1 + tax)

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _round(charge_udf("l_extendedprice", "l_discount", "l_tax")).alias("charge"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q40",
    oracle="""
    SELECT o_custkey, o_orderkey,
      (ROUND(o_totalprice * 100) * COUNT(*) OVER w
        - SUM(ROUND(o_totalprice * 100)) OVER w) / (100.0 * COUNT(*) OVER w)
        AS norm_price
    FROM orders WINDOW w AS (PARTITION BY o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("udaf", "grouped_map"),
)
def q40(spark, sf_dir):
    """applyInPandas grouped-map: per-customer mean-centering of prices
    (UDAF-equivalent), checked against a window-expression oracle.

    The centering is computed in exact integer cents ((cents*n - total)/100n)
    so the emitted doubles are bit-identical across engines — a float mean
    would land mean-centered 2-dp prices exactly on rounding boundaries.

    SCALE NOTE: this one-group-per-Arrow-batch form is the mandated
    grouped-map demo, but per-group overhead makes it a trap when groups
    are tiny and numerous (~52 s for 15k customers at sf0.1). Production
    use should be `q40_batched` below (same oracle, hash-bucketed groups,
    vectorized within-bucket groupby) — or simply the window expression
    the oracle itself uses."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        cents = (pdf["o_totalprice"] * 100).round()
        n = len(pdf)
        pdf["norm_price"] = (cents * n - cents.sum()) / (100.0 * n)
        return pdf[["o_custkey", "o_orderkey", "norm_price"]]

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        o.groupBy("o_custkey")
        .applyInPandas(center, "o_custkey long, o_orderkey long, norm_price double")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q40_batched",
    oracle="""
    SELECT o_custkey, o_orderkey,
      (ROUND(o_totalprice * 100) * COUNT(*) OVER w
        - SUM(ROUND(o_totalprice * 100)) OVER w) / (100.0 * COUNT(*) OVER w)
        AS norm_price
    FROM orders WINDOW w AS (PARTITION BY o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("udaf", "grouped_map", "batched"),
)
def q40_batched(spark, sf_dir):
    """Scale-safe twin of q40: grouped-map over 128 hash BUCKETS of
    customers, with the per-customer centering a vectorized pandas groupby
    *inside* each bucket. Identical semantics and oracle; the per-group
    Arrow round-trip cost becomes per-bucket, so growing the customer
    count 100× grows bucket size (vectorized work) instead of batch count
    (fixed overhead). Exact integer-cent math as in q40."""

    def center_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["o_totalprice"] * 100).round()
        g = cents.groupby(pdf["o_custkey"])
        n = g.transform("size")
        tot = g.transform("sum")
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        out["norm_price"] = (cents * n - tot) / (100.0 * n)
        return out

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        o.withColumn("__bkt", F.pmod(F.hash("o_custkey"), F.lit(128)))
        .groupBy("__bkt")
        .applyInPandas(
            center_bucket, "o_custkey long, o_orderkey long, norm_price double"
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q40_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
      CAST(SUM(ROUND(o_totalprice * 100)) / 100.0 AS DOUBLE) AS total,
      COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("udaf", "grouped_agg"),
)
def q40_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas UDAF — the missing quadrant of the pandas-UDF
    surface (scalar=q39, grouped-map=q40, map-iter=q40_batched): a true
    custom aggregate (whole group in, scalar out), Arrow-batched, with
    map-side partial merge handled by Spark. Exact integer-cent math so
    the custom sum matches the oracle bit-for-bit."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cents_sum(v: pd.Series) -> int:
        return int((v * 100).round().sum())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            cents_sum("o_totalprice").alias("cents"),
            n_rows("o_totalprice").alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            (F.col("cents") / 100.0).cast("double").alias("total"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q40_cogroup",
    oracle="""
    WITH o AS (SELECT o_custkey AS k, COUNT(*) AS n_orders,
                      SUM(ROUND(o_totalprice * 100)) AS cents
               FROM orders GROUP BY 1),
    e AS (SELECT user_id AS k, COUNT(*) AS n_events,
                 FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value
          FROM events GROUP BY 1)
    SELECT COALESCE(o.k, e.k) AS k,
           COALESCE(n_orders, 0) AS n_orders,
           CAST(COALESCE(cents, 0) / 100.0 AS DOUBLE) AS spend,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(sum_value, 0.0) AS sum_value
    FROM o FULL OUTER JOIN e ON o.k = e.k
    ORDER BY k
    """,
    tags=("udaf", "cogroup"),
)
def q40_cogroup(spark, sf_dir):
    """COGROUPED_MAP pandas UDF: orders and events cogrouped on the
    customer key — both sides shuffle once, then each (key, left-group,
    right-group) pair lands in one Python function, the primitive for
    custom per-key merges (as-of logic, interleaving, reconciliation)
    that SQL joins can't express row-wise. Here it emits the per-key
    full-outer merge of both sides' aggregates, so a FULL OUTER JOIN of
    two GROUP BYs is the exact oracle. Integer-cent money math; the
    event sum uses the spelled-out half-up round."""
    import numpy as np

    def merge(key, orders_pdf: pd.DataFrame, events_pdf: pd.DataFrame):
        cents = int((orders_pdf["o_totalprice"] * 100).round().sum())
        sum_v = float(events_pdf["value"].sum())
        return pd.DataFrame(
            {
                "k": [key[0]],
                "n_orders": [len(orders_pdf)],
                "spend": [cents / 100.0],
                "n_events": [len(events_pdf)],
                "sum_value": [float(np.floor(sum_v * 100 + 0.5) / 100)],
            }
        )

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    return (
        o.groupBy("o_custkey")
        .cogroup(ev.groupBy("user_id"))
        .applyInPandas(
            merge,
            "k long, n_orders long, spend double, n_events long, sum_value double",
        )
        .orderBy("k")
    )


@register(
    "q_lateral_topk",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, ROUND(CAST(c_acctbal AS DECIMAL(12,2)), 2)::DOUBLE
               AS c_acctbal
      FROM customer WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
    tags=("join", "lateral"),
)
def q_lateral_topk(spark, sf_dir):
    """LATERAL (correlated table) subquery — top-2 customers by balance
    per nation, written as SQL LATERAL on BOTH engines. Catalyst rewrites
    the correlated limit into the same window top-k a DataFrame would
    plan, so the SQL surface parity costs nothing at scale."""
    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name,
                 CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE)
                   AS c_acctbal
          FROM customer WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """)


@register(
    "q38_unpivot",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
          AS price,
        CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'qty' AS measure, qty AS val FROM agg
    UNION ALL SELECT l_returnflag, 'price', price FROM agg
    UNION ALL SELECT l_returnflag, 'disc', disc FROM agg
    ORDER BY l_returnflag, measure
    """,
    tags=("pivot", "unpivot"),
)
def q38_unpivot(spark, sf_dir):
    """UNPIVOT (melt) — the inverse of q38's pivot: wide per-flag measure
    columns back to (flag, measure, value) rows via DataFrame.unpivot
    (one Expand node, no join/union re-scan; the oracle spells the same
    relation as a UNION ALL stack)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        _dsum(_money("l_quantity"), "qty"),
        _dsum(_money("l_extendedprice"), "price"),
        _dsum(_money("l_discount"), "disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["qty", "price", "disc"], "measure", "val"
    ).orderBy("l_returnflag", "measure")


@register(
    "q19_dist",
    oracle="""
    SELECT o_orderkey,
      ROUND(PERCENT_RANK() OVER w * 10000) / 10000 AS pr,
      ROUND(CUME_DIST() OVER w * 10000) / 10000 AS cd
    FROM orders WHERE o_orderkey % 100 = 0
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    tags=("window", "distribution"),
)
def q19_dist(spark, sf_dir):
    """Distribution window functions (percent_rank / cume_dist) —
    completes the ranking-window family. Both are exact integer ratios
    ((rank-1)/(n-1), rank/n) evaluated in double, so the 4-dp round is
    engine-stable. The unique (price, key) ordering makes ranks
    deterministic."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            _round(F.percent_rank().over(w), 4).alias("pr"),
            _round(F.cume_dist().over(w), 4).alias("cd"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q18_corr",
    oracle="""
    SELECT l_returnflag,
      ROUND(CORR(l_quantity, l_extendedprice) * 1000) / 1000 + 0.0
        AS corr_qty_price,
      ROUND(COVAR_SAMP(l_quantity, l_discount) * 1000) / 1000 + 0.0
        AS cov_qty_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q18_corr(spark, sf_dir):
    """Bivariate statistics (Pearson correlation, sample covariance) per
    group — extends q18's univariate moments. 3-dp rounding absorbs the
    co-moment summation-order difference between engines."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            (_round(F.corr("l_quantity", "l_extendedprice"), 3) + F.lit(0.0))
            .alias("corr_qty_price"),
            (_round(F.covar_samp("l_quantity", "l_discount"), 3) + F.lit(0.0))
            .alias("cov_qty_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q19_ntile",
    oracle="""
    SELECT c_custkey,
           NTILE(10) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey) AS decile
    FROM customer ORDER BY c_custkey
    """,
    tags=("window", "ranking"),
)
def q19_ntile(spark, sf_dir):
    """NTILE bucketing — the last ranking-window family member (q19 has
    row_number/rank/dense_rank, q19_dist the distribution ratios). Both
    engines implement SQL-standard NTILE (first ``n % k`` buckets take
    the extra row), so with a unique (acctbal, custkey) ordering the
    assignment is deterministic. Partitioned by segment so the window
    parallelizes; a GLOBAL ntile at 100 TB should instead bucket by
    exact percentile cut-points (see q_winsorize) — a windowless
    width_bucket projection."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", F.ntile(10).over(w).alias("decile"))
        .orderBy("c_custkey")
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "string"),
)
def q_string_agg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG / string_agg) — deterministic
    via DISTINCT + explicit ORDER BY inside the aggregate. Spark has no
    ordered string_agg, so the engine-stable spelling is
    array_join(array_sort(collect_set(...))): collect_set is
    order-insensitive and array_sort pins the concat order. SCALE NOTE:
    only for bounded-cardinality value domains (here: 5 priorities) —
    collect_set of an unbounded column is a driver-sized row."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
    FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                               ORDER BY cnt DESC, o_orderpriority) = 1
    ORDER BY o_orderstatus
    """,
    tags=("agg", "stats"),
)
def q_mode(spark, sf_dir):
    """Statistical mode per group with a deterministic tie-break (highest
    count, then lexicographically smallest value) — spelled as
    count-then-window-top-1 in BOTH engines rather than either engine's
    native mode() (whose tie behavior is implementation-defined). Two
    map-side-combined shuffles on low-cardinality keys; the window runs
    over group-count rows (tiny), never the fact table."""
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_nullsafe_join",
    oracle="""
    WITH a AS (SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS k
               FROM orders WHERE o_orderkey % 100 = 0),
    b AS (SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k, COUNT(*) AS n
          FROM orders GROUP BY 1)
    SELECT a.o_orderkey, COALESCE(a.k, 'NULL') AS k, b.n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY a.o_orderkey
    """,
    tags=("join", "null"),
)
def q_nullsafe_join(spark, sf_dir):
    """NULL-safe equality join (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM):
    NULL keys MATCH each other instead of vanishing — the semantics a
    plain equi-join silently drops, and the one late-arriving-dimension
    pipelines actually want ("group the not-yet-classified rows
    together, don't lose them"). Planner note: Spark compiles `<=>`
    into a hash-join key (EqualNullSafe is a valid equi-join
    expression), NOT a nested-loop — so the null-safe form keeps the
    scalable plan."""
    o = _t(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    a = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", key.alias("k")
    )
    b = o.select(key.alias("k")).groupBy("k").agg(F.count("*").alias("n"))
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.k").eqNullSafe(F.col("b.k")))
        .select(
            "o_orderkey",
            F.coalesce(F.col("a.k"), F.lit("NULL")).alias("k"),
            "n",
        )
        .orderBy("o_orderkey")
    )


@register(
    "q36_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("json", "variant"),
)
def q36_variant(spark, sf_dir):
    """Semi-structured access through Spark 4's VARIANT type
    (parse_json → variant_get) — the third JSON quadrant next to q36
    (string-path get_json_object) and q36_typed (from_json with a
    declared schema). VARIANT parses ONCE into a binary form that all
    downstream extractions share, the open-schema answer when documents
    carry heterogeneous payloads and a fixed struct schema can't be
    declared up front; at rest, Parquet VARIANT shredding keeps
    extraction columnar. Aggregates on the extracted int are exact."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )
