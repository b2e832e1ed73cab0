"""Round-4 analytics additions: heavy hitters (exact + sketch twin),
deterministic weighted sampling, classic TPC-H Q17/Q21 shapes, and a
snapshot-diff (data reconciliation) operator.

All follow the determinism rules in functions/determinism.py: exact
decimal for money, spelled-out ROUND(x*10^n)/10^n for float aggregates,
total ORDER BY, identical aliases both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.functions import money, money_sum, stable_round
from distribot_spark.operators.sampling import weighted_sample_per_group
from distribot_spark.queries.registry import register

# ---------------------------------------------------------------------------
# Heavy hitters


@register(
    "q_heavy_hitters",
    oracle="""
    WITH c AS (SELECT CAST(FLOOR(SQRT(l_partkey)) AS BIGINT) AS part_bucket,
                      COUNT(*) AS cnt
               FROM lineitem GROUP BY 1),
         t AS (SELECT COUNT(*) AS total FROM lineitem)
    SELECT part_bucket, cnt,
           ROUND((cnt / total) * 1000000) / 1000000 AS freq
    FROM c, t WHERE cnt > total * 0.004
    ORDER BY cnt DESC, part_bucket
    """,
    tags=("agg", "heavy-hitters"),
)
def q_heavy_hitters(spark, sf_dir):
    """EXACT heavy hitters: keys on > 0.4% of lineitems. Two-phase hash
    agg (map-side combine) + a broadcast 1-row total — the oracle
    baseline for the `q_freq_items` sketch twin. The testdata's raw keys
    are uniform, so no absolute heavy hitter survives scale-up (at
    sf0.01 every l_partkey is < 0.1%); the demo keys on the skewed
    derived key floor(sqrt(l_partkey)) — bucket b covers ~2b+1 raw keys,
    so high buckets are genuinely heavy at EVERY sf (exact in IEEE:
    sqrt is correctly rounded and perfect squares stay exact, so both
    engines bucket identically). At 100 TB the exact count-by-key is
    still the right plan when the key domain fits a shuffle; the sketch
    twin is for unbounded domains (URLs, n-grams)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.sqrt("l_partkey")).alias("part_bucket")
    counts = li.groupBy(bucket).agg(F.count("*").alias("cnt"))
    total = li.agg(F.count("*").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") > F.col("total") * 0.004)
        .select(
            "part_bucket",
            "cnt",
            stable_round(F.col("cnt") / F.col("total"), 6).alias("freq"),
        )
        .orderBy(F.desc("cnt"), "part_bucket")
    )


@register("q_freq_items", oracle=None, tags=("agg", "heavy-hitters", "approx"))
def q_freq_items(spark, sf_dir):
    """Approximate heavy hitters via `df.stat.freqItems` (Karp/
    Misra–Gries-style mergeable summary — per-partition candidate maps,
    merged associatively; one pass, O(1/support) state per partition, no
    exact count shuffle). Guarantee: every key with frequency > support
    IS in the candidate set (false positives possible, never false
    negatives) — asserted against `q_heavy_hitters` in
    tests/test_operators.py. Same derived skew key as the exact twin.
    ≈ operator, rows-only."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(F.floor(F.sqrt("l_partkey")).alias("part_bucket"))
    fi = keyed.stat.freqItems(["part_bucket"], support=0.004)
    return fi.select(
        F.explode("part_bucket_freqItems").alias("candidate")
    ).orderBy("candidate")


# ---------------------------------------------------------------------------
# Deterministic weighted sampling


@register(
    "q_weighted_sample",
    oracle="""
    WITH pri AS (
      SELECT lang, doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               * 1.0 / GREATEST(n_chars, 1) AS priority
      FROM documents),
    r AS (SELECT lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY priority, doc_id) AS rnk
          FROM pri)
    SELECT lang, doc_id, n_chars, rnk FROM r WHERE rnk <= 5
    ORDER BY lang, rnk
    """,
    tags=("llm", "sampling"),
)
def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sample: 5 documents per language, selection
    odds ~ n_chars (longer docs favored), via md5-priority top-k
    (operators/sampling.py). No RNG, no engine hash — the sample is
    bit-stable across engines, partitionings, and corpus growth."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.greatest("n_chars", F.lit(1)).alias("n_chars")
    )
    return (
        weighted_sample_per_group(docs, ["lang"], "doc_id", "n_chars", k=5)
        .select("lang", "doc_id", "n_chars", "rnk")
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# Classic TPC-H shapes adapted to the trimmed schema


@register(
    "q_tpch17_small_qty",
    oracle="""
    SELECT ROUND((ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2)::DOUBLE
                  / 7.0) * 100) / 100 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("relational", "tpch", "subquery"),
)
def q_tpch17_small_qty(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): correlated
    per-part AVG threshold, decorrelated into a pre-aggregated join —
    the Catalyst-friendly rewrite of `WHERE qty < (SELECT 0.2*AVG ...)`.
    The brand filter semi-prunes the threshold aggregate before the fact
    join; both the brand dim and the per-part thresholds broadcast at
    any scale (bounded by |part|). l_quantity is integer-valued so the
    AVG is exact in float64 regardless of summation order — the
    threshold comparison is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    thresholds = (
        li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold"))
    )
    return (
        li.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            stable_round(
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
                .cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q_tpch21_last_to_ship",
    oracle="""
    WITH ps AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
                FROM lineitem GROUP BY 1, 2)
    SELECT p1.l_suppkey AS s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM ps p1 JOIN supplier s ON s.s_suppkey = p1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM ps p2
                  WHERE p2.l_orderkey = p1.l_orderkey
                    AND p2.l_suppkey <> p1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM ps p3
                      WHERE p3.l_orderkey = p1.l_orderkey
                        AND p3.l_suppkey <> p1.l_suppkey
                        AND p3.supp_last >= p1.supp_last)
    GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 20
    """,
    tags=("relational", "tpch", "window"),
)
def q_tpch21_last_to_ship(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): in every
    multi-supplier order, blame the unique strictly-last supplier to
    ship. The oracle spells the classic EXISTS / NOT EXISTS pair; the
    Spark plan is the decorrelated window form — one shuffle on
    l_orderkey computes peer count, order-max shipdate, and
    at-the-max count in a single Window, then a broadcast supplier
    join. Same semantics, no correlated re-scans."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    w = Window.partitionBy("l_orderkey")
    x = (
        per_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn("order_last", F.max("supp_last").over(w))
        .withColumn(
            "n_at_last",
            F.sum(
                F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)
            ).over(w),
        )
    )
    blamed = x.filter(
        (F.col("n_supp") >= 2)
        & (F.col("supp_last") == F.col("order_last"))
        & (F.col("n_at_last") == 1)
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("l_suppkey").alias("s_suppkey"), "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Snapshot diff (data reconciliation)

_DIFF_PRE = "substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)"

_DIFF_ORACLE = f"""
    WITH a AS (SELECT o_orderkey, o_totalprice FROM orders),
    b AS (
      SELECT o_orderkey,
             CASE WHEN {_DIFF_PRE} = 'f' THEN o_totalprice * 2.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE {_DIFF_PRE} <> '0'
      UNION ALL
      SELECT o_orderkey + 1000000000, o_totalprice
      FROM orders WHERE {_DIFF_PRE} = 'e'),
    d AS (
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
             CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
    SELECT change_type, COUNT(*) AS cnt, MIN(k) AS min_key, MAX(k) AS max_key
    FROM d GROUP BY change_type ORDER BY change_type
"""


@register("q_table_diff", oracle=_DIFF_ORACLE, tags=("analytics", "reconcile"))
def q_table_diff(spark, sf_dir):
    """Snapshot reconciliation: classify every key across two table
    versions as added / removed / changed / unchanged via one full-outer
    join on the key — the audit primitive behind CDC validation and
    backfill verification. Snapshot B is derived deterministically from
    orders (md5-prefix delete / double-price update / key-shifted
    insert) so both engines construct identical inputs. At 100 TB both
    sides shuffle once on the key; with bucketed snapshots (see
    source_bucketed_join) the exchange disappears entirely."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    pre = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    b = (
        orders.filter(pre != "0")
        .withColumn(
            "o_totalprice",
            F.when(pre == "f", F.col("o_totalprice") * 2.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionAll(
            orders.filter(pre == "e").select(
                (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    a = orders.select(
        F.col("o_orderkey").alias("a_key"), F.col("o_totalprice").alias("a_price")
    )
    b = b.select(
        F.col("o_orderkey").alias("b_key"), F.col("o_totalprice").alias("b_price")
    )
    d = a.join(b, a.a_key == b.b_key, "full_outer").select(
        F.coalesce("a_key", "b_key").alias("k"),
        F.when(F.col("a_key").isNull(), "added")
        .when(F.col("b_key").isNull(), "removed")
        .when(F.col("a_price") != F.col("b_price"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return (
        d.groupBy("change_type")
        .agg(
            F.count("*").alias("cnt"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Interval-overlap join: user sessions x busy hours

_OVERLAP_ORACLE = """
    WITH o AS (
      SELECT user_id, ts,
        CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM o),
    sess AS (SELECT user_id, sid, MIN(epoch_us(ts)) AS s_start,
                    MAX(epoch_us(ts)) AS s_end
             FROM s GROUP BY 1, 2),
    hourly AS (SELECT epoch_us(date_trunc('hour', ts)) AS h_start,
                      COUNT(*) AS cnt
               FROM events GROUP BY 1),
    busy AS (SELECT h_start, h_start + 3600000000 AS h_end FROM hourly
             WHERE cnt >= (SELECT 1.5 * AVG(cnt) FROM hourly)),
    ov AS (SELECT user_id, sid FROM sess JOIN busy
           ON s_start <= h_end AND h_start <= s_end)
    SELECT user_id, COUNT(*) AS n_overlaps FROM ov
    GROUP BY user_id ORDER BY user_id
"""


@register("q_interval_overlap", oracle=_OVERLAP_ORACLE, tags=("temporal", "join"))
def q_interval_overlap(spark, sf_dir):
    """Interval×interval overlap join: per-user sessions (30-min-gap
    sessionization) overlapped with 'busy hours' (hourly event count ≥
    1.5× the hourly mean) — how much of each user's activity lands in
    peak windows. The oracle is the plain theta join; the Spark plan is
    the binned EQUI-join rewrite (operators/rangejoin.py
    interval_overlap_join, 1-hour bins, positional dedup) — no
    broadcast-nested-loop, no cartesian, scale-safe at any interval
    cardinality. All interval math in integer epoch-µs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    marked = ev.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("new_s"),
    )
    sess = (
        marked.withColumn(
            "sid",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_start"),
            F.max(F.unix_micros("ts")).alias("s_end"),
        )
    )
    hourly = ev.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("h_start")
    ).agg(F.count("*").alias("cnt"))
    thresh = hourly.agg((F.avg("cnt") * 1.5).alias("t"))
    busy = (
        hourly.join(F.broadcast(thresh))
        .filter(F.col("cnt") >= F.col("t"))
        .select("h_start", (F.col("h_start") + 3600000000).alias("h_end"))
    )
    from distribot_spark.operators.rangejoin import interval_overlap_join

    ov = interval_overlap_join(
        sess, busy, "s_start", "s_end", "h_start", "h_end", bin_width=3600000000
    )
    return (
        ov.groupBy("user_id")
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# PageRank


# One unrolled power-iteration step (i reads ranks r{j}): per-edge
# contribution is ONE IEEE double expression re-quantized to int64 so the
# per-node SUM is exact integer math in any order — what makes iterative
# PageRank hash-oracle-able at all (mirrors operators/graph.py:
# pagerank_quantized step for step).
_PR_ITER_SQL = """
    c{i} AS (SELECT e.dst AS id,
                    CAST(ROUND(0.85e0 * r.r / d.out_deg) AS BIGINT) AS c
             FROM e JOIN deg d ON e.src = d.src
             JOIN r{j} r ON r.id = e.src),
    s{i} AS (SELECT id, SUM(c) AS s FROM c{i} GROUP BY id),
    r{i} AS (SELECT nodes.id, CAST(t + COALESCE(s, 0) AS BIGINT) AS r
             FROM nodes CROSS JOIN tp
             LEFT JOIN s{i} ON nodes.id = s{i}.id)"""

_PR_ORACLE = (
    """
    WITH sp AS (SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
                FROM lineitem),
    e AS (SELECT src, dst FROM sp
          UNION ALL SELECT dst AS src, src AS dst FROM sp),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    tp AS (SELECT CAST(ROUND((1.0e0 - 0.85e0) * 1000000000000 / n) AS BIGINT)
                    AS t FROM nn),
    r0 AS (SELECT id, CAST(1000000000000 // n AS BIGINT) AS r
           FROM nodes, nn),"""
    + ",".join(_PR_ITER_SQL.format(i=i, j=i - 1) for i in range(1, 6))
    + """
    SELECT CASE WHEN id % 2 = 0 THEN 'supplier' ELSE 'part' END AS node_type,
           CAST(id // 2 AS BIGINT) AS key,
           r AS rank_micro,
           r / CAST(1000000000000 AS DOUBLE) AS rank
    FROM r5 ORDER BY r DESC, node_type, key LIMIT 20
    """
)


@register("graph_pagerank", oracle=_PR_ORACLE, tags=("graph", "iterative"))
def graph_pagerank(spark, sf_dir):
    """PageRank over the supplier↔part co-shipment graph (distinct
    lineitem (suppkey, partkey) pairs, symmetrized so no node dangles;
    ids namespaced 2k / 2k+1). 5 fixed power iterations, damping 0.85 —
    pure join+agg per round, lineage cut every 2nd round
    (operators/graph.py). HASH-ORACLE-CHECKED, unusually for an
    iterative float algorithm: ranks are int64 micro-units and each
    edge contribution re-quantizes after one identical IEEE expression
    (`pagerank_quantized`), so contribution sums are exact integer math
    in any accumulation order and DuckDB's 5 unrolled CTE iterations
    reproduce Spark's distributed result bit-for-bit; the classic float
    twin (`operators/graph.py:pagerank`) stays for reference, pinned to
    a numpy power iteration by test_pagerank_matches_numpy."""
    from distribot_spark.operators.graph import pagerank_quantized

    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = sp.union(sp.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank_quantized(edges, iterations=5)
    return pr.select(
        F.when(F.col("id") % 2 == 0, "supplier").otherwise("part").alias("node_type"),
        F.floor(F.col("id") / 2).cast("long").alias("key"),
        "rank_micro",
        "rank",
    ).orderBy(F.desc("rank_micro"), "node_type", "key").limit(20)


# ---------------------------------------------------------------------------
# Z-order layout

from distribot_spark.operators.layout import (  # noqa: E402
    interleave_expr,
    quantize_expr,
)

_Z_QA = quantize_expr("o_custkey", "amin", "amax", 16, "//")
_Z_QB = quantize_expr("day", "bmin", "bmax", 16, "//")

_ZORDER_ORACLE = f"""
    WITH d AS (SELECT o_custkey,
                      CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day
               FROM orders),
    b AS (SELECT MIN(o_custkey) AS amin, MAX(o_custkey) AS amax,
                 MIN(day) AS bmin, MAX(day) AS bmax FROM d),
    q AS (SELECT o_custkey, day,
                 {_Z_QA} AS qa, {_Z_QB} AS qb
          FROM d, b),
    z AS (SELECT o_custkey, day,
                 {interleave_expr("qa", "qb", 16, "//")} AS zval
          FROM q)
    SELECT zval // {4 ** 12} AS z_bucket, COUNT(*) AS cnt,
           MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
           MIN(day) AS min_day, MAX(day) AS max_day
    FROM z GROUP BY 1 ORDER BY 1
"""


@register("q_zorder_stats", oracle=_ZORDER_ORACLE, tags=("layout", "zorder"))
def q_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering audit: orders keyed by
    (o_custkey, order day) interleaved into a 32-bit z-value — exact
    integer quantize + interleave (operators/layout.py), identical
    formula in both engines — then per-z-bucket bounding boxes. Small
    per-bucket boxes ARE the file-skipping win: each bucket (≈ one
    output file under write_zordered) covers a tiny (cust × day)
    rectangle, so a 2-D box predicate prunes most buckets by footer
    stats alone. The locality evidence on real parquet files is
    measured in tests/test_operators.py::test_zorder_layout_file_skipping."""
    orders = load_table(spark, sf_dir, "orders")
    from distribot_spark.operators.layout import with_zvalue

    d = orders.select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day"),
    )
    z = with_zvalue(d, "o_custkey", "day", bits=16)
    return (
        z.groupBy(F.expr(f"zval DIV {4 ** 12}").alias("z_bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (HLL rollup)


def _cust_nation_region(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.select("o_custkey")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("o_custkey", "n_name", "r_name")
    )


@register("q_hll_rollup", oracle=None, tags=("agg", "sketch", "approx"))
def q_hll_rollup(spark, sf_dir):
    """Mergeable-sketch rollup: per-nation HLL sketches of ordering
    customers are UNIONED up to region and grand-total level — the
    nation aggregates are computed ONCE and the coarser levels come
    from sketch merges, never a re-scan. This is THE 100 TB pattern for
    distinct-count cubes: persist the finest-grain sketches (bytes per
    group), serve every coarser rollup by union, including across time
    partitions. ≈ operator (DataSketches HLL, rows-only); tolerance vs
    the exact twin `q_hll_rollup_exact` is asserted in
    tests/test_operators.py."""
    base = _cust_nation_region(spark, sf_dir)
    nat = base.groupBy("r_name", "n_name").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    nat_rows = nat.select(
        F.lit("nation").alias("level"),
        F.col("n_name").alias("name"),
        F.hll_sketch_estimate("sk").alias("n_est"),
    )
    reg = nat.groupBy("r_name").agg(F.hll_union_agg("sk").alias("sk"))
    reg_rows = reg.select(
        F.lit("region").alias("level"),
        F.col("r_name").alias("name"),
        F.hll_sketch_estimate("sk").alias("n_est"),
    )
    tot_rows = reg.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("total").alias("level"),
        F.lit("ALL").alias("name"),
        F.hll_sketch_estimate("sk").alias("n_est"),
    )
    return nat_rows.unionByName(reg_rows).unionByName(tot_rows).orderBy(
        "level", "name"
    )


@register(
    "q_hll_rollup_exact",
    oracle="""
    WITH base AS (
      SELECT o_custkey, n_name, r_name
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey)
    SELECT 'nation' AS level, n_name AS name,
           COUNT(DISTINCT o_custkey) AS n_exact
    FROM base GROUP BY n_name
    UNION ALL
    SELECT 'region', r_name, COUNT(DISTINCT o_custkey) FROM base GROUP BY r_name
    UNION ALL
    SELECT 'total', 'ALL', COUNT(DISTINCT o_custkey) FROM base
    ORDER BY level, name
    """,
    tags=("agg", "sketch"),
)
def q_hll_rollup_exact(spark, sf_dir):
    """Exact twin of q_hll_rollup: the same three rollup levels via
    COUNT(DISTINCT) — the oracle baseline the sketch tolerance test
    compares against. (At 100 TB the exact form re-shuffles the full key
    set per level; the sketch twin replaces that with byte-sized
    merges.)"""
    base = _cust_nation_region(spark, sf_dir)
    nat = base.groupBy("n_name").agg(
        F.count_distinct("o_custkey").alias("n_exact")
    ).select(F.lit("nation").alias("level"), F.col("n_name").alias("name"), "n_exact")
    reg = base.groupBy("r_name").agg(
        F.count_distinct("o_custkey").alias("n_exact")
    ).select(F.lit("region").alias("level"), F.col("r_name").alias("name"), "n_exact")
    tot = base.agg(F.count_distinct("o_custkey").alias("n_exact")).select(
        F.lit("total").alias("level"), F.lit("ALL").alias("name"), "n_exact"
    )
    return nat.unionByName(reg).unionByName(tot).orderBy("level", "name")


from distribot_spark.operators import hll as _hll  # noqa: E402

_HLL_PORTABLE_ORACLE = f"""
    WITH base AS (
      SELECT o_custkey AS k, n_name, r_name
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey),
    hashed AS (SELECT n_name, r_name, {_hll.hash_sql('k')} AS h FROM base),
    regs_n AS (SELECT n_name AS grp, {_hll.bucket_sql('h')} AS b,
                      MAX({_hll.rho_sql('h', '//')}) AS m_rho
               FROM hashed GROUP BY 1, 2),
    nmap AS (SELECT DISTINCT n_name, r_name FROM base),
    regs_r AS (SELECT r_name AS grp, b, MAX(m_rho) AS m_rho
               FROM regs_n JOIN nmap ON regs_n.grp = nmap.n_name
               GROUP BY 1, 2),
    regs_t AS (SELECT 'ALL' AS grp, b, MAX(m_rho) AS m_rho
               FROM regs_n GROUP BY 1, 2),
    est_n AS ({_hll.estimate_from_registers_sql('regs_n', 'grp')}),
    est_r AS ({_hll.estimate_from_registers_sql('regs_r', 'grp')}),
    est_t AS ({_hll.estimate_from_registers_sql('regs_t', 'grp')}),
    ex_n AS (SELECT n_name AS grp, COUNT(DISTINCT k) AS ex FROM base
             GROUP BY 1),
    ex_r AS (SELECT r_name AS grp, COUNT(DISTINCT k) AS ex FROM base
             GROUP BY 1),
    ex_t AS (SELECT 'ALL' AS grp, COUNT(DISTINCT k) AS ex FROM base),
    u AS (
      SELECT 'nation' AS level, est_n.grp AS name, est, ex
      FROM est_n JOIN ex_n ON est_n.grp = ex_n.grp
      UNION ALL
      SELECT 'region', est_r.grp, est, ex
      FROM est_r JOIN ex_r ON est_r.grp = ex_r.grp
      UNION ALL
      SELECT 'total', est_t.grp, est, ex
      FROM est_t JOIN ex_t ON est_t.grp = ex_t.grp)
    SELECT level, name,
           ROUND(est * 10000) / 10000 AS est_distinct,
           CAST(ex AS BIGINT) AS exact_distinct
    FROM u ORDER BY level, name
    """


@register("q_hll_portable", oracle=_HLL_PORTABLE_ORACLE,
          tags=("agg", "sketch"))
def q_hll_portable(spark, sf_dir):
    """The HLL rollup with a PORTABLE sketch (operators/hll.py): unlike
    q_hll_rollup's engine-private DataSketches registers, these
    registers come from the spelled-out bloom/CMS hash family and the
    estimate's harmonic sum runs over INTEGER sufficient statistics —
    so the whole thing (register content, nation→region→total merges,
    and the final estimate doubles) HASH-MATCHES DuckDB exactly, the
    first approx-distinct operator in the registry with a full oracle.
    Same 100 TB shape as q_hll_rollup: finest-grain registers persist
    (≤256 rows per group), every coarser level is a byte-sized MAX
    merge, the corpus is scanned once. Exact counts ride along per
    level for visible error."""
    base = _cust_nation_region(spark, sf_dir).select(
        F.col("o_custkey").alias("k"), "n_name", "r_name"
    )
    regs_n = _hll.build_hll(base, "k", ["n_name"])
    nmap = base.select("n_name", "r_name").distinct()
    regs_r = _hll.merge_hll(
        regs_n.join(F.broadcast(nmap), "n_name"), ["r_name"]
    )
    regs_t = _hll.merge_hll(
        regs_n.select(F.lit("ALL").alias("grp"), "b", "m_rho"), ["grp"]
    )

    est_n = _hll.estimate_hll(regs_n, ["n_name"])
    est_r = _hll.estimate_hll(regs_r, ["r_name"])
    est_t = _hll.estimate_hll(regs_t, ["grp"])

    ex_n = base.groupBy("n_name").agg(F.count_distinct("k").alias("ex"))
    ex_r = base.groupBy("r_name").agg(F.count_distinct("k").alias("ex"))
    ex_t = base.agg(F.count_distinct("k").alias("ex")).select(
        F.lit("ALL").alias("grp"), "ex"
    )

    def _lvl(est, ex, key, level):
        return est.join(ex, key).select(
            F.lit(level).alias("level"),
            F.col(key).alias("name"),
            (F.round(F.col("est") * 10000, 0) / 10000).alias("est_distinct"),
            F.col("ex").cast("long").alias("exact_distinct"),
        )

    return (
        _lvl(est_n, ex_n, "n_name", "nation")
        .unionByName(_lvl(est_r, ex_r, "r_name", "region"))
        .unionByName(_lvl(est_t, ex_t, "grp", "total"))
        .orderBy("level", "name")
    )


_Q15_HLL_ORACLE = f"""
    WITH hashed AS (SELECT {_hll.hash_sql('l_partkey')} AS h FROM lineitem),
    regs AS (SELECT 'ALL' AS grp, {_hll.bucket_sql('h')} AS b,
                    MAX({_hll.rho_sql('h', '//')}) AS m_rho
             FROM hashed GROUP BY 1, 2),
    est AS ({_hll.estimate_from_registers_sql('regs', 'grp')}),
    ex AS (SELECT COUNT(DISTINCT l_partkey) AS ex FROM lineitem)
    SELECT ROUND(est * 10000) / 10000 AS est_distinct,
           CAST(ex AS BIGINT) AS exact_distinct
    FROM est, ex
    """


@register("q15_hll", oracle=_Q15_HLL_ORACLE, tags=("agg", "sketch", "approx"))
def q15_hll(spark, sf_dir):
    """The CERTIFIED sibling of q15 (queries/relational.py): the same
    query shape — global distinct l_partkey over lineitem — but the
    approx-distinct estimate comes from the portable HLL
    (operators/hll.py) instead of Spark's engine-private
    approx_count_distinct, so unlike q15 (rows-only ≈ by design) this
    twin carries a FULL hash oracle: registers, integer harmonic sum,
    and the one terminal double all match DuckDB bit-for-bit. The exact
    count rides along for visible error (≤15 % guard in pytest; the
    1.04/√m envelope at m=256 is ~6.5 %). 100 TB shape: one corpus
    scan into a ≤256-row register table via map-side partial MAX —
    the same merge-by-MAX registers a rollup or a daily incremental
    build would reuse."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("ALL").alias("grp"), F.col("l_partkey").alias("k")
    )
    regs = _hll.build_hll(li, "k", ["grp"])
    est = _hll.estimate_hll(regs, ["grp"])
    ex = load_table(spark, sf_dir, "lineitem").agg(
        F.count_distinct("l_partkey").alias("ex")
    )
    return est.crossJoin(ex).select(
        (F.round(F.col("est") * 10000, 0) / 10000).alias("est_distinct"),
        F.col("ex").cast("long").alias("exact_distinct"),
    )


# ---------------------------------------------------------------------------
# Time-RANGE rolling window


@register(
    "q_rolling_range",
    oracle="""
    WITH d AS (SELECT o_custkey, o_orderkey,
                      CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
                      o_totalprice
               FROM orders)
    SELECT o_custkey, o_orderkey, day,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 2)::DOUBLE
             AS spend_7d
    FROM d
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "range-frame"),
)
def q_rolling_range(spark, sf_dir):
    """Time-based RANGE frame: per customer, the trailing-7-day order
    count and spend at every order — a VALUE-range frame (peers = rows
    within 6 days), not a row-count frame like q21's. Same-day orders
    share one frame, so the result is layout-independent. One shuffle on
    o_custkey; money through exact decimal. The gap-handling is what
    distinguishes RANGE from ROWS: a customer with orders on days 1 and
    30 gets singleton frames, where ROWS -6 would wrongly reach back."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("day"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return d.select(
        "o_custkey",
        "o_orderkey",
        "day",
        F.count("*").over(w).alias("n_7d"),
        F.round(F.sum("price").over(w), 2).cast("double").alias("spend_7d"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance


@register(
    "q_incremental_refresh",
    oracle="""
    WITH agg AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
             COUNT(value) AS v_cnt,
             SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS micro
      FROM events GROUP BY 1, 2)
    SELECT day, event_type, v_cnt,
           ROUND((micro / 1000000.0) * 100) / 100 + 0.0 AS v_sum,
           ROUND((micro / 1000000.0 / v_cnt) * 10000) / 10000 + 0.0 AS v_mean
    FROM agg ORDER BY day, event_type
    """,
    tags=("analytics", "incremental"),
)
def q_incremental_refresh(spark, sf_dir):
    """Incremental materialized-aggregate maintenance: the events table
    arrives as 8 chunks (same replay layout the streaming suite uses);
    each chunk is folded into a persisted PARTIAL-agg parquet table
    (count+sum per (day, event_type) — operators/incremental.py), with a
    write+reread between folds to prove restartability. The finalized
    view (mean computed only at read time) must equal the one-shot batch
    aggregate over all events — the oracle. Refresh cost per batch is
    O(batch + touched groups); history is never re-scanned.

    Determinism: the measure is quantized to integer micro-units BEFORE
    the fold, so partial sums are exact integers and the fold is exactly
    associative — chunking/merge order can never move a rounded result
    across a half boundary (a raw-double partial table drifts by fold
    order; at sf0.001 that flipped one 4-dp mean). Exact partials are
    the production design, not just an oracle trick."""
    import glob as _glob
    import os as _os
    import uuid as _uuid

    from distribot_spark.operators.incremental import finalize, fold_increment
    from distribot_spark.streaming import replay as _replay

    src = _replay.replay_dir(sf_dir)
    chunks = sorted(_glob.glob(_os.path.join(src, "chunk_*.parquet")))
    state_dir = _os.path.join(
        _replay.TMP_ROOT, "incremental", _uuid.uuid4().hex[:12]
    )
    keys, measures = ["day", "event_type"], {"value": "v"}
    stored = None
    for i, chunk in enumerate(chunks):
        batch = spark.read.parquet(chunk).select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
            # integer micro-units: ROUND(v*1e6) spelled identically in the
            # oracle; every partial sum from here on is exact
            F.round(F.col("value") * 1000000.0, 0).cast("long").alias("value"),
        )
        refreshed = fold_increment(stored, batch, keys, measures)
        path = _os.path.join(state_dir, f"v{i:03d}")
        refreshed.write.mode("overwrite").parquet(path)
        stored = spark.read.parquet(path)
    out = finalize(stored, keys, measures)
    # same fp-op order as the oracle: micro/1e6 first, then /cnt
    units = F.col("v_sum") / F.lit(1000000.0)
    return out.select(
        "day",
        "event_type",
        "v_cnt",
        (stable_round(units) + 0.0).alias("v_sum"),
        (stable_round(units / F.col("v_cnt"), 4) + 0.0).alias("v_mean"),
    ).orderBy("day", "event_type")


# ---------------------------------------------------------------------------
# SCD2 dimension build from a CDC log


@register(
    "q_scd2_build",
    oracle="""
    WITH log AS (
      SELECT o_orderkey, o_totalprice AS price,
             CAST(o_orderdate AS DATE) AS valid_from
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice * 2,
             CAST(o_orderdate AS DATE) + 30
      FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'f')
    SELECT o_orderkey, price,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           COALESCE(strftime(LEAD(valid_from) OVER w, '%Y-%m-%d'),
                    '9999-12-31') AS valid_to,
           (LEAD(valid_from) OVER w IS NULL) AS is_current
    FROM log WINDOW w AS (PARTITION BY o_orderkey ORDER BY valid_from)
    ORDER BY o_orderkey, valid_from
    """,
    tags=("temporal", "scd2", "cdc"),
)
def q_scd2_build(spark, sf_dir):
    """SCD2 (slowly-changing-dimension) build: fold the same
    deterministic v1/v2 order update log as s14 into validity-interval
    rows — valid_from = change date, valid_to = next change via LEAD,
    open intervals marked current. One shuffle on the business key; the
    output joins facts by point-in-interval (q_range_join's operator).
    This is the batch snapshot builder behind temporal `AS OF` joins."""
    orders = load_table(spark, sf_dir, "orders")
    pre = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    v1 = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.to_date("o_orderdate").alias("valid_from"),
    )
    v2 = orders.filter(pre == "f").select(
        "o_orderkey",
        (F.col("o_totalprice") * 2).alias("price"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("valid_from"),
    )
    log = v1.unionByName(v2)
    w = Window.partitionBy("o_orderkey").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w)
    return log.select(
        "o_orderkey",
        "price",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
    ).orderBy("o_orderkey", "valid_from")


# ---------------------------------------------------------------------------
# Winsorization (percentile clipping)


@register(
    "q_winsorize",
    oracle="""
    WITH p AS (
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY 1)
    SELECT o.o_orderstatus,
           CAST(SUM(CASE WHEN o_totalprice < p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN o_totalprice > p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           ROUND(SUM(GREATEST(p05, LEAST(p95, o_totalprice))) * 100) / 100
             AS winsorized_sum
    FROM orders o JOIN p ON o.o_orderstatus = p.o_orderstatus
    GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
    tags=("analytics", "cleaning"),
)
def q_winsorize(spark, sf_dir):
    """Winsorization (outlier clipping to [p05, p95] per group) — the
    data-cleaning primitive before ML feature aggregation. Exact
    interpolated percentiles (bit-identical across engines, see
    q_percentiles) computed per group then broadcast back onto the
    scan; clipping is a pure projection. Two passes over the fact at
    scale, both map-side-combined."""
    orders = load_table(spark, sf_dir, "orders")
    p = orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.05).alias("p05"),
        F.percentile("o_totalprice", 0.95).alias("p95"),
    )
    clipped = orders.join(F.broadcast(p), "o_orderstatus").select(
        "o_orderstatus",
        (F.col("o_totalprice") < F.col("p05")).cast("int").alias("lo"),
        (F.col("o_totalprice") > F.col("p95")).cast("int").alias("hi"),
        F.greatest("p05", F.least("p95", F.col("o_totalprice"))).alias("wv"),
    )
    return (
        clipped.groupBy("o_orderstatus")
        .agg(
            F.sum("lo").alias("n_clipped_low"),
            F.sum("hi").alias("n_clipped_high"),
            stable_round(F.sum("wv")).alias("winsorized_sum"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Python UDTF (table function)


@register(
    "q_udtf_sentences",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, '. '), 1) AS idx,
           CAST(length(unnest(string_split(text, '. '))) AS INT) AS n_chars
    FROM documents ORDER BY doc_id, idx
    """,
    tags=("llm", "udtf"),
)
def q_udtf_sentences(spark, sf_dir):
    """Python UDTF (Spark 4 table function): one row per '. '-separated
    sentence piece with its 1-based index and character count — the
    remaining Python-API quadrant after scalar pandas UDFs (q39),
    grouped/cogrouped maps (q40*), and mapInPandas (multimodal). UDTFs
    run row-at-a-time in Python, so the SCALE NOTE is the same as q40's:
    use them for genuinely per-row-expanding logic with complex Python
    state; this declarative piece-split would be `posexplode(split())`
    (codegen) in production — which is exactly what the oracle does."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, n_chars int")
    class SentencePieces:
        def eval(self, text):
            if text is None:
                return
            for i, piece in enumerate(text.split(". ")):
                yield i + 1, len(piece)

    spark.udtf.register("sentence_pieces", SentencePieces)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT doc_id, p.idx, p.n_chars
        FROM udtf_docs_v, LATERAL sentence_pieces(text) p
        ORDER BY doc_id, idx
        """
    )


# ---------------------------------------------------------------------------
# Fuzzy string join (banded levenshtein)


@register(
    "q_fuzzy_join",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
    tags=("join", "fuzzy"),
)
def q_fuzzy_join(spark, sf_dir):
    """Fuzzy string self-join (edit distance ≤ 3) over the distinct
    product-name vocabulary — the brand/entity-dedup primitive. The
    oracle is the plain theta join; the Spark plan blocks by length band
    first (each left name replicated to its ±1 length-bucket, the right
    side to its single bucket, so a candidate pair meets exactly once)
    and only candidates pay the O(len²) levenshtein — an equi-join at
    any vocabulary size, with the band guarantee |len(a)-len(b)| ≤ 3 <
    bucket width 4 making the blocking lossless."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    blk = (F.length("p_name") / 4).cast("int")
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.explode(F.array(blk - 1, blk, blk + 1)).alias("blk"),
    )
    b = names.select(F.col("p_name").alias("name_b"), blk.alias("blk"))
    return (
        a.join(b, "blk")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= 3)
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# Time-weighted average


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts,
                                      event_id) AS t_next
      FROM events),
    agg AS (
      SELECT user_id,
             SUM(value * (t_next - t)) AS num,
             SUM(t_next - t) AS den,
             COUNT(*) AS n_intervals
      FROM s WHERE t_next IS NOT NULL GROUP BY user_id)
    SELECT user_id, CAST(n_intervals AS BIGINT) AS n_intervals,
           ROUND((num / den) * 10000) / 10000 + 0.0 AS twa
    FROM agg WHERE den > 0 ORDER BY user_id
    """,
    tags=("temporal", "twa"),
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of `value` per user over irregular samples:
    each sample holds until the next one, so its weight is the gap to
    the successor (last sample carries no duration) — the correct mean
    for sensor/metric streams where plain AVG over-weights bursts. One
    window pass for LEAD, one aggregate; integer-µs weights, 4-dp
    stable rounding (+0.0 both engines: value can be negative)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    agg = s.groupBy("user_id").agg(
        F.sum(F.col("value") * (F.col("t_next") - F.col("t"))).alias("num"),
        F.sum(F.col("t_next") - F.col("t")).alias("den"),
        F.count("*").alias("n_intervals"),
    )
    return (
        agg.filter(F.col("den") > 0)
        .select(
            "user_id",
            "n_intervals",
            (stable_round(F.col("num") / F.col("den"), 4) + 0.0).alias("twa"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Semi-join reduction (the bloom-runtime-filter shape, made explicit)


@register(
    "q_semijoin_reduction",
    oracle="""
    SELECT strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "scale", "semijoin"),
)
def q_semijoin_reduction(spark, sf_dir):
    """Fact-to-fact join with an explicit semi-join reduction: the
    selective side's JOIN KEYS are broadcast as a LEFT SEMI prefilter on
    the big probe side BEFORE the shuffle join, so the probe side's
    shuffle carries only rows that can match. This is the hand-rolled
    form of Spark's own runtime bloom/semi filters (InjectRuntimeFilter)
    and the classic distributed-DB semi-join reduction: at 100 TB the
    filtered dimension may exceed the broadcast threshold as a ROW SET
    while its key set still fits comfortably, so the main join stays
    sort-merge (hinted here to model that regime) but ships a fraction
    of the data. Logically a no-op — the oracle is the plain join.
    Plan-gated: tests/test_plans.py asserts the broadcast LeftSemi feeds
    the SortMergeJoin probe side."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    keys = orders_f.select(F.col("o_orderkey").alias("l_orderkey"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    li_reduced = li.join(F.broadcast(keys), "l_orderkey", "left_semi")
    joined = li_reduced.hint("merge").join(
        orders_f.hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    revenue = money(F.col("l_extendedprice")) * (1 - money(F.col("l_discount")))
    return (
        joined.groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day")
        )
        .agg(
            F.count("*").alias("n_items"),
            money_sum(revenue, "revenue"),
        )
        .orderBy("order_day")
    )


# ---------------------------------------------------------------------------
# Hierarchy flattening (recursive-CTE twin)


@register(
    "q_hierarchy_closure",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey = 0 OR
                       CAST(('0x' || substr(md5('h' || CAST(c_custkey AS
                         VARCHAR)), 1, 8)) AS BIGINT) % 20 = 0
                  THEN NULL
                  ELSE CAST(('0x' || substr(md5('h' || CAST(c_custkey AS
                         VARCHAR)), 1, 8)) AS BIGINT) % c_custkey
             END AS parent
      FROM customer),
    walk AS (
      SELECT id, id AS root, 0 AS depth FROM base WHERE parent IS NULL
      UNION ALL
      SELECT b.id, w.root, w.depth + 1
      FROM base b JOIN walk w ON b.parent = w.id)
    SELECT id, root, CAST(depth AS BIGINT) AS depth
    FROM walk ORDER BY id
    """,
    tags=("graph", "iterative", "hierarchy"),
)
def q_hierarchy_closure(spark, sf_dir):
    """Hierarchy flattening (the recursive-CTE surface): every node's
    root ancestor and depth in a parent forest — org charts, category
    trees, thread ancestry. The forest is md5-derived from customer keys
    (~5% roots; parent(i) < i so it is acyclic by construction) so both
    engines build the identical structure. Spark has no RECURSIVE CTE;
    the operator is pointer doubling (operators/graph.tree_closure):
    O(log depth) self-joins, each contracting two ancestor hops into
    one — at 100 TB this beats the O(depth) per-level loop a literal
    CTE translation would run. The DuckDB oracle IS the recursive CTE."""
    cust = load_table(spark, sf_dir, "customer")
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("h"), F.col("c_custkey").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    nodes = cust.select(
        F.col("c_custkey").alias("id"),
        F.when(
            (F.col("c_custkey") == 0) | (u32 % 20 == 0), F.lit(None).cast("long")
        )
        .otherwise(u32 % F.col("c_custkey"))
        .alias("parent"),
    )
    from distribot_spark.operators.graph import tree_closure

    return tree_closure(nodes).orderBy("id")


# ---------------------------------------------------------------------------
# Triangle counting

_TRIANGLES_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey % 3 = 0),
e AS (SELECT DISTINCT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
deg AS (SELECT x, COUNT(*) AS d
        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x),
ew AS (SELECT e.u, e.v, du.d AS du, dv.d AS dv
       FROM e JOIN deg du ON e.u = du.x JOIN deg dv ON e.v = dv.x),
o AS (SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
             CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b
      FROM ew),
tri AS (SELECT COUNT(*) AS n_triangles
        FROM o o1 JOIN o o2 ON o1.b = o2.a
        WHERE EXISTS (SELECT 1 FROM o o3
                      WHERE o3.a = o1.a AND o3.b = o2.b)),
s AS (SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT SUM(d * (d - 1)) // 2 FROM deg) AS n_wedges)
SELECT n_nodes, n_edges, n_triangles,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CASE WHEN n_wedges > 0
            THEN ROUND(3.0 * n_triangles / n_wedges * 1000000) / 1000000
       END AS clustering
FROM s, tri
"""


@register("graph_triangles", oracle=_TRIANGLES_ORACLE, tags=("graph",))
def graph_triangles(spark, sf_dir):
    """Triangle census + global clustering coefficient of the part
    co-order graph (parts appearing in the same order, 1-in-3 part
    subsample to keep the graph sparse-interesting at every SF).

    Degree-ordered orientation (operators/graph.triangle_count) caps the
    wedge join's fan-out at O(sqrt(m)) per vertex — the property that
    keeps this runnable on power-law graphs at 100 TB, where the naive
    wedge join explodes on hub nodes. All outputs are exact integers
    (plus one integer-ratio double), so the oracle hash is exact."""
    from distribot_spark.operators.graph import triangle_count

    op = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 3 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = (
        op.alias("a")
        .join(op.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# Bloom-filter prefilter (runtime filter as data)

from distribot_spark.operators.bloom import (  # noqa: E402
    build_bloom,
    positions_sql,
    probe_bloom,
)

_BL_M, _BL_K = 8192, 3
_BP = positions_sql("key", _BL_M, _BL_K)
_PP = positions_sql("o_custkey", _BL_M, _BL_K)

_BLOOM_ORACLE = f"""
WITH keys AS (SELECT DISTINCT c_custkey AS key FROM customer
              WHERE c_nationkey = 3),
pos AS (SELECT {_BP[0]} AS pos FROM keys
        UNION ALL SELECT {_BP[1]} FROM keys
        UNION ALL SELECT {_BP[2]} FROM keys),
bloom AS (SELECT pos // 32 AS word,
                 bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
          FROM pos GROUP BY 1),
probe AS (SELECT o_custkey, o_totalprice,
                 {_PP[0]} AS p0, {_PP[1]} AS p1, {_PP[2]} AS p2
          FROM orders),
cand AS (
  SELECT pr.o_custkey, pr.o_totalprice,
         (COALESCE(b0.bits, 0) & (1::BIGINT << CAST(p0 % 32 AS INT))) != 0
     AND (COALESCE(b1.bits, 0) & (1::BIGINT << CAST(p1 % 32 AS INT))) != 0
     AND (COALESCE(b2.bits, 0) & (1::BIGINT << CAST(p2 % 32 AS INT))) != 0
           AS bloom_candidate
  FROM probe pr
  LEFT JOIN bloom b0 ON pr.p0 // 32 = b0.word
  LEFT JOIN bloom b1 ON pr.p1 // 32 = b1.word
  LEFT JOIN bloom b2 ON pr.p2 // 32 = b2.word),
ex AS (SELECT c.*, keys.key IS NOT NULL AS is_match
       FROM cand c LEFT JOIN keys ON c.o_custkey = keys.key)
SELECT COUNT(*) AS n_probed,
       COUNT(*) FILTER (bloom_candidate) AS n_candidates,
       COUNT(*) FILTER (is_match) AS n_matches,
       COUNT(*) FILTER (bloom_candidate AND NOT is_match)
         AS n_false_positives,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  FILTER (is_match), 2) AS DOUBLE) AS matched_revenue
FROM ex
"""


@register("q_bloom_prefilter", oracle=_BLOOM_ORACLE, tags=("join", "bloom"))
def q_bloom_prefilter(spark, sf_dir):
    """Runtime bloom filter, hand-rolled as data (operators/bloom.py):
    the nation-3 customer keys build a 1 KB bitmap relation (ONE tiny
    shuffle), which broadcast-prefilters the orders scan before the
    real join — the cross-stage, persistable, MERGEABLE form of
    Spark's runtime.bloomFilter join pruning. Census output proves the
    contract: zero false negatives (n_candidates ≥ n_matches, and
    every match is a candidate — asserted in
    tests/test_operators.py::test_bloom_no_false_negatives), false
    positives bounded by the (1-e^{-kn/m})^k curve. All counts exact
    integers; revenue via exact decimal."""
    cust = load_table(spark, sf_dir, "customer")
    keys = (
        cust.filter(F.col("c_nationkey") == 3)
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    bloom = build_bloom(keys, "key", m=_BL_M, k=_BL_K)
    probed = probe_bloom(
        load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        "o_custkey",
        bloom,
        m=_BL_M,
        k=_BL_K,
    )
    ex = probed.join(
        F.broadcast(keys), probed.o_custkey == keys.key, "left"
    ).withColumn("is_match", F.col("key").isNotNull())
    match_price = F.when(F.col("is_match"), money(F.col("o_totalprice")))
    return ex.agg(
        F.count("*").alias("n_probed"),
        F.sum(F.when(F.col("bloom_candidate"), 1).otherwise(0)).alias(
            "n_candidates"
        ),
        F.sum(F.when(F.col("is_match"), 1).otherwise(0)).alias("n_matches"),
        F.sum(
            F.when(F.col("bloom_candidate") & ~F.col("is_match"), 1).otherwise(0)
        ).alias("n_false_positives"),
        F.round(F.sum(match_price), 2).cast("double").alias("matched_revenue"),
    )


# ---------------------------------------------------------------------------
# Global sequence assignment without a single-partition window

@register(
    "q_global_rownum",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS seq
    FROM orders ORDER BY o_orderkey
    """,
    tags=("window", "scale"),
)
def q_global_rownum(spark, sf_dir):
    """Contiguous GLOBAL row numbers over a total order — without the
    naive single-partition window (which serializes 100 TB through one
    task). The two-phase range-partition form: repartitionByRange on
    the sort key (each partition owns a disjoint key range), local
    row_number per partition (parallel), per-partition counts (16
    tiny rows) cumulated into offsets and broadcast back; global seq =
    offset + local rank. Invariant to where the sampled range
    boundaries land, because ranges are disjoint and the sort key is
    unique — the oracle is the naive global window."""
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .repartitionByRange(16, "o_orderdate", "o_orderkey")
        .withColumn("pid", F.spark_partition_id())
    )
    wl = Window.partitionBy("pid").orderBy("o_orderdate", "o_orderkey")
    local = o.withColumn("rn", F.row_number().over(wl))
    wc = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .select("pid", F.coalesce(F.sum("cnt").over(wc), F.lit(0)).alias("off"))
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            (F.col("off") + F.col("rn")).alias("seq"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier)

@register(
    "q_skyline",
    oracle="""
    WITH pairs AS (SELECT DISTINCT p_retailprice AS price, p_size AS size
                   FROM part)
    SELECT price, size FROM pairs p1
    WHERE NOT EXISTS (
      SELECT 1 FROM pairs p2
      WHERE p2.price <= p1.price AND p2.size >= p1.size
        AND (p2.price < p1.price OR p2.size > p1.size))
    ORDER BY price, size
    """,
    tags=("analytics", "skyline"),
)
def q_skyline(spark, sf_dir):
    """Skyline / Pareto frontier (minimize price, maximize size) via the
    sort-scan formulation: over DISTINCT (price, size) ordered by
    (price asc, size desc), a point survives iff its size strictly
    exceeds the running max of everything before it — O(n log n), no
    O(n²) dominance join. The oracle is the INDEPENDENT NOT-EXISTS
    dominance test, so the window rewrite is verified against first
    principles. SCALE NOTE: the window runs on distinct value pairs
    (bounded by the value domain); for unbounded domains,
    range-partition by price and prefix-max the per-partition maxima —
    the q_global_rownum offset pattern."""
    pairs = (
        load_table(spark, sf_dir, "part")
        .select(
            F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
        )
        .distinct()
    )
    w = (
        Window.orderBy(F.col("price").asc(), F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pairs.withColumn("runmax", F.max("size").over(w))
        .filter(F.col("runmax").isNull() | (F.col("runmax") < F.col("size")))
        .select("price", "size")
        .orderBy("price", "size")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch

from distribot_spark.operators.cms import (  # noqa: E402
    build_cms,
    pos_sql,
    probe_cms,
)

_CMS_D, _CMS_W = 4, 2048

_CMS_STREAM = "\nUNION ALL\n".join(
    f"SELECT {i} AS i, {pos_sql('l_partkey', i, _CMS_W)} AS pos FROM lineitem"
    for i in range(_CMS_D)
)
_CMS_PROBE = "\nUNION ALL\n".join(
    f"SELECT key, {i} AS i, {pos_sql('key', i, _CMS_W)} AS pos FROM top"
    for i in range(_CMS_D)
)

_CMS_ORACLE = f"""
WITH cnt AS (SELECT l_partkey AS key, COUNT(*) AS exact_cnt
             FROM lineitem GROUP BY 1),
top AS (SELECT key, exact_cnt FROM cnt
        ORDER BY exact_cnt DESC, key LIMIT 10),
stream AS ({_CMS_STREAM}),
cms AS (SELECT i, pos, COUNT(*) AS c FROM stream GROUP BY 1, 2),
probes AS ({_CMS_PROBE}),
est AS (SELECT p.key, CAST(MIN(COALESCE(cms.c, 0)) AS BIGINT) AS cms_estimate
        FROM probes p LEFT JOIN cms ON cms.i = p.i AND cms.pos = p.pos
        GROUP BY p.key)
SELECT t.key AS l_partkey, t.exact_cnt, e.cms_estimate,
       e.cms_estimate - t.exact_cnt AS overestimate
FROM top t JOIN est e ON e.key = t.key
ORDER BY exact_cnt DESC, l_partkey
"""


@register("q_cms_frequency", oracle=_CMS_ORACLE, tags=("agg", "sketch"))
def q_cms_frequency(spark, sf_dir):
    """Count-Min sketch point-frequency estimation (operators/cms.py):
    a 4×2048 counter relation summarizes the l_partkey stream; the
    exact top-10 keys are probed back through the sketch and the
    overestimate is reported (NEVER negative — the CMS one-sided
    guarantee, asserted in tests). Because the hash family is
    spelled-out portable arithmetic, the SKETCH CONTENT itself is
    engine-deterministic and the whole path hash-oracles — the sketch
    serves frequency probes at 100 TB from d·w counters without
    re-scanning, and shards merge by cell-wise sum."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("exact_cnt")
    )
    top = cnt.orderBy(F.desc("exact_cnt"), "key").limit(10)
    cms = build_cms(li, "l_partkey", d=_CMS_D, w=_CMS_W)
    est = probe_cms(top.select("key"), "key", cms, d=_CMS_D, w=_CMS_W)
    return (
        top.join(est, "key")
        .select(
            F.col("key").alias("l_partkey"),
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Clamped running balance (non-linear recurrence)

@register(
    "q_clamped_balance",
    oracle="""
    WITH moves AS (
      SELECT l_suppkey,
             -- FLOOR spelled in BOTH engines: DuckDB CAST(double AS
             -- BIGINT) rounds-to-nearest while Spark's cast truncates
             CASE WHEN l_returnflag = 'R'
                  THEN CAST(FLOOR(l_quantity) AS BIGINT)
                  ELSE -CAST(FLOOR(l_quantity) AS BIGINT) END AS delta,
             l_shipdate, l_orderkey, l_linenumber
      FROM lineitem),
    folded AS (
      SELECT l_suppkey, COUNT(*) AS n_moves,
             list_reduce(
               list_prepend(0, list(delta ORDER BY l_shipdate, l_orderkey,
                                    l_linenumber)),
               (a, b) -> greatest(a + b, 0)) AS final_balance
      FROM moves GROUP BY l_suppkey)
    SELECT l_suppkey, n_moves, CAST(final_balance AS BIGINT) AS final_balance
    FROM folded ORDER BY l_suppkey
    """,
    tags=("analytics", "recurrence"),
)
def q_clamped_balance(spark, sf_dir):
    """Inventory-style CLAMPED running balance (stock never goes
    negative): per supplier, fold time-ordered ±quantity moves through
    x → max(x + δ, 0) — a NON-LINEAR recurrence no window frame can
    express (clamping isn't associative over deltas). Spelled as an
    ordered struct sort + JVM `aggregate` fold per key — Python never
    touches it. SCALE NOTE: the per-key list is bounded by per-key
    history; for unbounded histories the recurrence still parallelizes,
    because x → max(x+δ, m) forms are CLOSED under composition
    (max(max(x+a₁,b₁)+a₂, b₂) = max(x+a₁+a₂, max(b₁+a₂, b₂))) — fold
    each chunk to its (A, B) summary, then compose summaries
    associatively like any partial aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    moves = li.select(
        "l_suppkey",
        F.struct(
            # ordering-only field (dropped before output): raw NTZ
            # timestamp compares fine inside array_sort
            F.col("l_shipdate").alias("o1"),
            F.col("l_orderkey").alias("o2"),
            F.col("l_linenumber").alias("o3"),
            F.when(
                F.col("l_returnflag") == "R",
                F.floor("l_quantity").cast("long"),
            )
            .otherwise(-F.floor("l_quantity").cast("long"))
            .alias("delta"),
        ).alias("m"),
    )
    folded = (
        moves.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_moves"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(m)),"
                " x -> x.delta), CAST(0 AS BIGINT),"
                " (a, b) -> greatest(a + b, CAST(0 AS BIGINT)))"
            ).alias("final_balance"),
        )
    )
    return folded.select(
        "l_suppkey", "n_moves", F.col("final_balance").cast("long")
        .alias("final_balance")
    ).orderBy("l_suppkey")


# ---------------------------------------------------------------------------
# Exact mergeable distinct via bitmap aggregates

@register(
    "q_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT '*', COUNT(DISTINCT o_custkey) FROM orders
    ORDER BY o_orderstatus
    """,
    tags=("agg", "bitmap", "distinct"),
)
def q_bitmap_distinct(spark, sf_dir):
    """EXACT mergeable distinct counts via Spark's bitmap aggregates —
    the exact sibling of the HLL rollup (q_hll_rollup): keys bucket
    into 32k-bit bitmaps (bitmap_bucket_number / bit_position /
    construct_agg), per-status counts come from bitmap_count, and the
    ALL-statuses total is served by OR-MERGING the same materialized
    bitmaps (bitmap_or_agg) — no re-scan, no approximation. This is
    the dense-int-key regime where bitmaps beat both COUNT(DISTINCT)
    re-aggregation (shuffle of raw keys per grouping) and HLL (exact,
    similar size for dense domains). The oracle is plain
    COUNT(DISTINCT) at both grains."""
    o = load_table(spark, sf_dir, "orders")
    pos = o.selectExpr(
        "o_orderstatus",
        "bitmap_bucket_number(o_custkey) AS bkt",
        "bitmap_bit_position(o_custkey) AS pos",
    )
    by_status_bucket = pos.groupBy("o_orderstatus", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    per_status = by_status_bucket.groupBy("o_orderstatus").agg(
        F.expr("sum(bitmap_count(bm))").cast("long").alias("n_distinct")
    )
    total = (
        by_status_bucket.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.expr("sum(bitmap_count(bm))").cast("long").alias("n_distinct"))
        .select(F.lit("*").alias("o_orderstatus"), "n_distinct")
    )
    return per_status.unionAll(total).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# Association rules (basket analysis)

_ASSOC_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey % 5 = 0),
n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
item AS (SELECT p, COUNT(*) AS sup FROM op GROUP BY 1),
pair AS (SELECT a.p AS ante, b.p AS cons, COUNT(*) AS pair_sup
         FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
         GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT pair.ante, pair.cons, pair.pair_sup,
       ROUND(pair.pair_sup * 1.0 / ia.sup * 1000000) / 1000000
         AS confidence,
       ROUND((pair.pair_sup * 1.0 / ia.sup) / (ic.sup * 1.0 / n.n_orders)
             * 1000000) / 1000000 AS lift
FROM pair
JOIN item ia ON ia.p = pair.ante
JOIN item ic ON ic.p = pair.cons, n
ORDER BY lift DESC, ante, cons LIMIT 20
"""


@register("q_assoc_rules", oracle=_ASSOC_ORACLE, tags=("analytics", "mining"))
def q_assoc_rules(spark, sf_dir):
    """Association-rule mining (the Apriori 2-itemset core): from
    co-order part baskets, rules ante→cons ranked by LIFT =
    P(cons|ante) / P(cons), with a min-support prune (pair_sup ≥ 3)
    applied BEFORE the rule math — the prune is what keeps the pair
    lattice tractable at scale (support is anti-monotone: Agrawal &
    Srikant 1994). Directional pairs via the basket self-join on the
    1-in-5 part subsample; all supports are exact integers, ratios
    divide identical doubles. One distinct + one self-join + two
    broadcast item joins."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 5 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    n = op.agg(F.count_distinct("o").alias("n_orders"))
    item = op.groupBy(F.col("p")).agg(F.count("*").alias("sup"))
    pair = (
        op.alias("a")
        .join(op.alias("b"), "o")
        .filter(F.col("a.p") != F.col("b.p"))
        .groupBy(F.col("a.p").alias("ante"), F.col("b.p").alias("cons"))
        .agg(F.count("*").alias("pair_sup"))
        .filter(F.col("pair_sup") >= 3)
    )
    ia = item.select(F.col("p").alias("ante"), F.col("sup").alias("sup_a"))
    ic = item.select(F.col("p").alias("cons"), F.col("sup").alias("sup_c"))
    def r6(c_):  # stable_round at 6 dp — the shared determinism helper
        return stable_round(c_, 6)
    conf = F.col("pair_sup") * F.lit(1.0) / F.col("sup_a")
    return (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ante",
            "cons",
            "pair_sup",
            r6(conf).alias("confidence"),
            r6(conf / (F.col("sup_c") * F.lit(1.0) / F.col("n_orders"))).alias(
                "lift"
            ),
        )
        .orderBy(F.desc("lift"), "ante", "cons")
        .limit(20)
    )


@register(
    "q_tpch11_important_suppliers",
    oracle="""
    SELECT l_suppkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
                AS DOUBLE) AS value
    FROM lineitem
    GROUP BY l_suppkey
    HAVING 500 * SUM(CAST(l_extendedprice AS DECIMAL(12,2))) >
           (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FROM lineitem)
    ORDER BY value DESC, l_suppkey
    """,
    tags=("agg", "subquery", "tpch"),
)
def q_tpch11_important_suppliers(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-supplier value filtered
    against a GLOBAL-share threshold computed as a scalar aggregate. The
    threshold compare is exact: both sides stay DECIMAL and the share
    test is spelled multiplicatively (500·value > total) — no decimal
    division, no float drift — with ONE terminal rounding for display.
    At 100 TB: one map-side-combined groupBy for the per-supplier sums,
    one scalar aggregate broadcast back; the filter prunes before any
    downstream join would see the long tail."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        F.sum(_money("l_extendedprice")).alias("v")
    )
    total = li.agg(F.sum(_money("l_extendedprice")).alias("tot"))
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 500 > F.col("tot"))
        .select(
            "l_suppkey",
            F.round(F.col("v"), 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "l_suppkey")
    )


@register(
    "q_tpch15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(rev.r, 2) AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("agg", "subquery", "tpch"),
)
def q_tpch15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the one(s) EQUAL to the maximum — the view + scalar-max
    pattern. The equality compares unrounded DECIMAL revenue (exact in
    both engines; a double compare could split ties differently), and
    MAX over decimals is order-free. The scalar max broadcasts; the
    supplier dim joins after the filter, so only the winners join."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
        ).alias("r")
    )
    mx = rev.agg(F.max("r").alias("mr"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mr"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("r"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch22_idle_rich_customers",
    oracle="""
    WITH nat AS (
      SELECT c_nationkey,
             SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s,
             COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey),
    idle AS (
      SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      WHERE o.o_orderkey IS NULL)
    SELECT i.c_nationkey, COUNT(*) AS n_custs,
           CAST(ROUND(SUM(CAST(i.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_bal
    FROM idle i JOIN nat ON i.c_nationkey = nat.c_nationkey
    WHERE nat.cnt * CAST(i.c_acctbal AS DECIMAL(12,2)) > nat.s
    GROUP BY i.c_nationkey
    ORDER BY i.c_nationkey
    """,
    tags=("join", "anti", "subquery", "tpch"),
)
def q_tpch22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity), adapted to the schema
    (nation key standing in for the phone country code): customers with
    NO orders whose balance exceeds their nation's positive-balance
    AVERAGE — anti-join + correlated-threshold aggregate. The average
    test is spelled multiplicatively (cnt·bal > sum, both DECIMAL) so no
    engine ever divides: exact compare, identical tie behavior. Shapes:
    one anti-join (orders never aggregates), a per-nation aggregate
    broadcast back onto the survivors."""
    from distribot_spark.queries.relational import _money

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    nat = (
        c.filter(F.col("c_acctbal") > 0)
        .groupBy("c_nationkey")
        .agg(F.sum(_money("c_acctbal")).alias("s"), F.count("*").alias("cnt"))
    )
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(nat), "c_nationkey")
        .filter(F.col("cnt") * _money("c_acctbal") > F.col("s"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum(_money("c_acctbal")), 2).cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q_tpch18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120)
    SELECT c.c_custkey, o.o_orderkey,
           CAST(ROUND(big.q, 2) AS DOUBLE) AS sum_qty,
           o.o_totalprice
    FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_orderkey
    """,
    tags=("agg", "join", "tpch"),
)
def q_tpch18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose TOTAL
    lineitem quantity clears a threshold, decorated with customer info.
    The IN-subquery decorrelates to aggregate-then-join — the fact
    table aggregates FIRST (map-side combine on l_orderkey, its natural
    key), the HAVING prunes before either dimension join, and the
    threshold compares unrounded DECIMAL against an integer literal —
    exact in both engines."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money("l_quantity")).alias("q"))
        .filter(F.col("q") > 120)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "o_orderkey",
            F.round(F.col("q"), 2).cast("double").alias("sum_qty"),
            "o_totalprice",
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_tpch20_heavy_shippers",
    oracle="""
    WITH greens AS (SELECT p_partkey FROM part WHERE p_name LIKE '%a%'
                      AND p_size < 10),
    heavy AS (
      SELECT l_suppkey
      FROM lineitem JOIN greens ON l_partkey = p_partkey
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 60)
    SELECT s.s_suppkey, s.s_name, s.s_nationkey
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_suppkey
    """,
    tags=("join", "semi", "subquery", "tpch"),
)
def q_tpch20_heavy_shippers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): the nested semi-join
    chain — part filter → per-(supplier, part) quantity aggregate with a
    HAVING threshold → DISTINCT suppliers → semi-join the supplier dim.
    The part filter broadcasts into the fact scan, the aggregate's
    grouping key contains the join key (no extra shuffle), and the final
    semi-join sends only supplier IDs. DECIMAL-vs-integer threshold —
    exact, no tie drift."""
    from distribot_spark.queries.relational import _money

    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%a%") & (F.col("p_size") < 10)
    )
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_money("l_quantity")).alias("q"))
        .filter(F.col("q") > 60)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch19_disjunctive",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 15 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "filter", "tpch"),
)
def q_tpch19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR-of-conjunctions spanning BOTH join sides. The optimizer work this
    exercises: the per-side residues of the disjunction
    (p_brand ∈ {..}, p_size ≤ 40 / l_quantity ≤ 50) are derivable and
    pushable even though the full predicate must evaluate post-join —
    Catalyst's CNF conversion extracts them so each scan prunes before
    the join. Revenue via exact decimal, one terminal rounding."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    br = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#25")
        & F.col("p_size").between(15, 40)
        & F.col("l_quantity").between(20, 50)
    )
    rev = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    return j.filter(br).agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
    )


@register(
    "q_tpch14_promo_share",
    oracle="""
    WITH m AS (
      SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) * 10000 AS BIGINT)
               AS promo_e4,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000
                  AS BIGINT) AS total_e4
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-02-01')
    SELECT promo_e4, total_e4,
           (promo_e4 // 10000) * 1000000 // GREATEST(total_e4 // 10000, 1)
             AS promo_share_micro
    FROM m
    """,
    tags=("agg", "conditional", "tpch"),
)
def q_tpch14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): conditional aggregation share
    — CASE WHEN inside the SUM, one pass. The ratio is served as integer
    micros over exact decimal-derived CENTS (promo·10⁶ DIV total), so no
    engine ever divides floats or decimals — the same no-division
    discipline as the other share queries. Month-filtered fact side:
    the shipdate predicate reaches PushedFilters."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    m = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            # rev carries FOUR decimal places (price scale 2 x (1-disc)
            # scale 2): x10000 makes the decimal->long cast fraction-free,
            # where truncation (Spark) and rounding (DuckDB) agree
            (F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero))
             * 10000).cast("long").alias("promo_e4"),
            (F.sum(rev) * 10000).cast("long").alias("total_e4"),
        )
    )
    return m.select(
        "promo_e4", "total_e4",
        # Share computed from whole-dollar units: e4 sums at sf>=1 would
        # overflow int64 when multiplied by 1e6 (Spark wraps, DuckDB
        # raises). DIV 10000 first gives ~1e4x headroom (overflow needs
        # > $9.2e12 revenue per group, ~sf3000); both operands are
        # non-negative so Spark DIV (truncate) == DuckDB // (floor).
        # GREATEST(.., 1): a group under $1 floors the divisor to 0,
        # where Spark DIV yields NULL but DuckDB // raises — clamp
        # identically on both sides so degenerate data can't diverge.
        F.expr(
            "(promo_e4 DIV 10000) * 1000000 "
            "DIV GREATEST(total_e4 DIV 10000, 1)"
        ).alias("promo_share_micro"),
    )


@register(
    "q_tpch03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-06-15'
      AND l_shipdate  > TIMESTAMP '1996-06-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("join", "topk", "tpch"),
)
def q_tpch03_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): segment-filtered 3-way join,
    revenue per unshipped order, top 10 — the filter-join-agg-topk
    composition. Total order (revenue DESC, orderkey) makes the LIMIT
    deterministic under ties; the top-k plans as TakeOrderedAndProject,
    never a global sort."""
    from distribot_spark.queries.relational import _money

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-15").cast("timestamp")
    )
    rev = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch07_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("join", "multiway", "tpch"),
)
def q_tpch07_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): the nation-PAIR join — the same
    dimension joined twice under different roles, with a symmetric
    pair predicate, per-year rollup. Both nation copies broadcast; the
    pair filter evaluates post-join on two broadcast columns (tiny), and
    year extraction groups the fact side once."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("k1"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"),
                  F.col("n_name").alias("cust_nation"))
    rev = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_tpch08_market_share",
    oracle="""
    WITH v AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(SUM(CASE WHEN n1.n_name = 'NATION_5'
                   THEN CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))
                   ELSE CAST(0 AS DECIMAL(12,2)) END) * 10000 AS BIGINT)
               AS nation_e4,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000
                  AS BIGINT) AS total_e4
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
                    JOIN region    ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1)
    SELECT o_year, nation_e4, total_e4,
           (nation_e4 // 10000) * 1000000 // GREATEST(total_e4 // 10000, 1)
             AS share_micro
    FROM v ORDER BY o_year
    """,
    tags=("join", "conditional", "tpch"),
)
def q_tpch08_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): one supplier nation's
    share of a region's revenue per year — conditional aggregation over
    a 6-way join with the nation dim in two roles. Shares in integer
    micros over exact scale-4 units (the Q14 no-division discipline)."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("k1"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"),
                  F.col("n_regionkey").alias("rk2"))
    rev = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .join(F.broadcast(r), F.col("rk2") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.sum(F.when(F.col("supp_nation") == "NATION_5", rev)
                   .otherwise(zero)) * 10000).cast("long").alias("nation_e4"),
            (F.sum(rev) * 10000).cast("long").alias("total_e4"),
        )
    )
    return v.select(
        "o_year", "nation_e4", "total_e4",
        # Whole-dollar downscale before the 1e6 scale-up: keeps the int64
        # product in range to ~sf3000; GREATEST clamps a <$1 group's
        # divisor away from 0 (see q_tpch14_promo_share).
        F.expr(
            "(nation_e4 DIV 10000) * 1000000 "
            "DIV GREATEST(total_e4 DIV 10000, 1)"
        ).alias("share_micro"),
    ).orderBy("o_year")


@register(
    "q_tpch09_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))
                        - CAST(p_retailprice AS DECIMAL(12,2))
                          * CAST(l_quantity AS DECIMAL(12,2))
                          * CAST(0.08 AS DECIMAL(4,2))), 2) AS DOUBLE)
             AS profit
    FROM lineitem JOIN part     ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("join", "multiway", "tpch"),
)
def q_tpch09_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): profit per (supplier
    nation, order year) over name-filtered parts. The schema has no
    partsupp, so unit cost is 8% of retail price — spelled as exact
    DECIMAL arithmetic (scale-4 products, one terminal rounding), which
    keeps the cross-engine hash exact where a float cost model would
    drift. Part filter broadcast; the fact side aggregates once."""
    from distribot_spark.queries.relational import _money

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = _money("l_extendedprice") * (F.lit(1) - _money("l_discount")) - (
        _money("p_retailprice")
        * _money("l_quantity")
        * F.lit("0.08").cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q_tpch10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue
    FROM customer JOIN orders  ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
                  JOIN nation  ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "topk", "tpch"),
)
def q_tpch10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned items): revenue lost to returns per
    customer in a half-year window, top 20 — returnflag + date filters
    pushed to the scans, nation broadcast, deterministic top-k (total
    order under ties) via TakeOrderedAndProject."""
    from distribot_spark.queries.relational import _money

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    rev = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13' AND p_name NOT LIKE '%rod%'
      AND p_size IN (1, 4, 9, 16, 25)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("agg", "distinct", "tpch"),
)
def q_tpch16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape (part/supplier relationship): DISTINCT supplier
    counts per part attribute bucket with negated predicates (<>,
    NOT LIKE, IN-list). countDistinct expands to a two-level aggregate —
    partial distinct map-side, exact count after one shuffle — and every
    predicate reaches the part scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_name").like("%rod%")
        & F.col("p_size").isin(1, 4, 9, 16, 25)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q_tpch13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "agg", "tpch"),
)
def q_tpch13_custdist(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): count-of-counts over a
    LEFT OUTER join whose filter lives in the ON clause — the Q13 trick:
    a WHERE would silently drop zero-order customers, the ON keeps them
    as c_count = 0 (COUNT of a NULL column skips nulls). Two cascaded
    aggregations, the second over ≤ max-order-count rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_tpch04_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "subquery", "tpch"),
)
def q_tpch04_priority_check(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): correlated EXISTS with
    an INEQUALITY between the outer and inner rows (shipped > 60 days
    after ordering — the schema's stand-in for commit < receipt).
    Catalyst decorrelates to a LEFT SEMI join with the inequality as a
    join condition; the date window prunes orders at the scan first."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch02_min_cost_supplier",
    oracle="""
    WITH sp AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
      FROM lineitem GROUP BY 1, 2),
    mn AS (SELECT l_partkey, MIN(v) AS mv FROM sp GROUP BY 1)
    SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
           CAST(ROUND(sp.v, 2) AS DOUBLE) AS value
    FROM sp JOIN mn ON sp.l_partkey = mn.l_partkey AND sp.v = mn.mv
            JOIN part p ON sp.l_partkey = p.p_partkey
            JOIN supplier s ON sp.l_suppkey = s.s_suppkey
    WHERE p.p_size < 5
    ORDER BY p.p_partkey, s.s_suppkey
    """,
    tags=("join", "subquery", "tpch"),
)
def q_tpch02_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): for each filtered part,
    the supplier(s) achieving the MINIMUM shipped value — the correlated
    scalar-min decorrelated to aggregate + per-key min + equality join.
    The min equality compares unrounded DECIMALs (ties kept, all
    returned, total order), and the part filter pre-applies before the
    per-(part, supplier) aggregate — per-part minima are independent
    across parts, so filtering early is plan-visible and
    semantics-invisible."""
    from distribot_spark.queries.relational import _money

    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 5)
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    sp = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_money("l_extendedprice")).alias("v"))
    )
    mn = sp.groupBy(F.col("l_partkey").alias("mk")).agg(F.min("v").alias("mv"))
    return (
        sp.join(mn, (sp.l_partkey == mn.mk) & (sp.v == mn.mv))
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              sp.l_partkey == F.col("p_partkey"))
        .join(s, sp.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey", "p_brand", "s_suppkey", "s_name",
            F.round(F.col("v"), 2).cast("double").alias("value"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )
