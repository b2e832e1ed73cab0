"""Temporal operators beyond the core inventory: as-of join, binned
range join, and hypertable-style hierarchical time rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.functions import stable_round
from distribot_spark.operators.asof import asof_join
from distribot_spark.operators.rangejoin import point_in_interval_join
from distribot_spark.queries.registry import register


@register(
    "asof_click_view",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id AS click_id
                    FROM events WHERE event_type = 'click'),
    views AS (SELECT user_id, ts, event_id AS view_id
              FROM events WHERE event_type = 'view'),
    m AS (SELECT c.click_id, v.view_id,
                 ROW_NUMBER() OVER (PARTITION BY c.click_id
                                    ORDER BY v.ts DESC, v.view_id DESC) AS rn
          FROM clicks c LEFT JOIN views v
            ON c.user_id = v.user_id AND v.ts <= c.ts)
    SELECT click_id, view_id FROM m WHERE rn = 1 ORDER BY click_id
    """,
    tags=("temporal", "asof"),
)
def asof_click_view(spark, sf_dir):
    """As-of join: each click matched to the user's latest view at or
    before it — semantics of DuckDB's native ASOF JOIN plus an explicit
    max-view_id tie-break at equal ts (native ASOF leaves ties arbitrary,
    so the oracle spells out the same ROW_NUMBER tie-break). Spark-side
    it's the union-merge composition (one shuffle, no range explosion)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    joined = asof_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_id"], tie_breaker="view_id",
    )
    return joined.select("click_id", "view_id").orderBy("click_id")


@register(
    "asof_click_view_tolerance",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id AS click_id
                    FROM events WHERE event_type = 'click'),
    views AS (SELECT user_id, ts, event_id AS view_id
              FROM events WHERE event_type = 'view'),
    m AS (SELECT c.click_id, v.view_id, v.ts AS vts, c.ts AS cts,
                 ROW_NUMBER() OVER (PARTITION BY c.click_id
                                    ORDER BY v.ts DESC, v.view_id DESC) AS rn
          FROM clicks c LEFT JOIN views v
            ON c.user_id = v.user_id AND v.ts <= c.ts)
    SELECT click_id,
           CASE WHEN vts >= cts - INTERVAL 2 HOUR THEN view_id END AS view_id
    FROM m WHERE rn = 1 ORDER BY click_id
    """,
    tags=("temporal", "asof"),
)
def asof_click_view_tolerance(spark, sf_dir):
    """As-of join with a staleness tolerance: matches older than 2 hours
    become nulls."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    joined = asof_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_id"], tolerance="2 hours", tie_breaker="view_id",
    )
    return joined.select("click_id", "view_id").orderBy("click_id")


@register(
    "q_range_join",
    oracle="""
    WITH promo AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS st,
             CAST(o_orderdate AS DATE) - DATE '1992-01-01' + 7 AS en
      FROM orders WHERE o_orderkey % 199 = 0),
    pts AS (SELECT CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS ship_day,
                   l_quantity
            FROM lineitem)
    SELECT o_orderkey, COUNT(*) AS n_ship,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS sum_qty
    FROM promo JOIN pts ON ship_day >= st AND ship_day < en
    GROUP BY o_orderkey ORDER BY o_orderkey
    """,
    tags=("temporal", "rangejoin"),
)
def q_range_join(spark, sf_dir):
    """Point-in-interval range join, binned: 7-day windows anchored at a
    deterministic subset of order dates, matched against EVERY lineitem
    ship date (no key equality — a true range predicate). The binned
    rewrite (operators/rangejoin.py) makes it an equi-join on day bins,
    so the plan is shuffle-hash-joinable at any cardinality instead of a
    broadcast nested loop; a plan test asserts no BNLJ/cartesian."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    epoch = F.lit("1992-01-01")
    intervals = orders.filter(F.col("o_orderkey") % 199 == 0).select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), epoch).alias("st"),
        (F.datediff(F.col("o_orderdate"), epoch) + 7).alias("en"),
    )
    points = li.select(
        F.datediff(F.col("l_shipdate"), epoch).alias("ship_day"),
        "l_quantity",
    )
    joined = point_in_interval_join(
        points, intervals, "ship_day", "st", "en", bin_width=7
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_ship"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
        CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_id
    """,
    tags=("temporal", "session"),
)
def q_sessionize(spark, sf_dir):
    """BATCH sessionization (gaps-and-islands): per-user sessions split at
    30-minute silences via lag + running sum — the backfill twin of the
    streaming session window (s3), one window pass, no self-join. The
    user_id partition key is the scale unit: sessions never cross users,
    so 100 TB sessionizes with one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    marked = ev.select(
        "user_id", "ts", "value",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("new_s"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            F.count("*").alias("n_events"),
            stable_round(F.sum("value")).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "events_time_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour,
           CAST(GROUPING(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS INT) AS g_day,
           CAST(GROUPING(CAST(EXTRACT(HOUR FROM ts) AS INT)) AS INT) AS g_hour,
           COUNT(*) AS cnt, ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM events
    GROUP BY ROLLUP (strftime(date_trunc('day', ts), '%Y-%m-%d'),
                     CAST(EXTRACT(HOUR FROM ts) AS INT))
    ORDER BY g_day, g_hour, day, hour
    """,
    tags=("temporal", "rollup"),
)
def events_time_rollup(spark, sf_dir):
    """Hypertable-style hierarchical rollup: (day, hour) → (day) → total
    in one pass via ROLLUP — the multi-resolution aggregate a time-series
    store maintains as continuous aggregates."""
    ev = load_table(spark, sf_dir, "events")
    prepared = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
        "value",
    )
    return (
        prepared.rollup("day", "hour")
        .agg(
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("hour").cast("int").alias("g_hour"),
            F.count("*").alias("cnt"),
            stable_round(F.sum("value")).alias("sum_value"),
        )
        .orderBy("g_day", "g_hour", "day", "hour")
    )


@register(
    "q_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
           JOIN s0 ON e.user_id = s0.user_id AND e.ts >= s0.t0
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT u.user_id,
           strftime(t0, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
           strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(t2, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CAST(CASE WHEN t2 IS NOT NULL THEN 3
                     WHEN t1 IS NOT NULL THEN 2
                     WHEN t0 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS depth
    FROM u LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
           LEFT JOIN s2 USING (user_id)
    ORDER BY user_id
    """,
    tags=("temporal", "funnel"),
)
def q_funnel(spark, sf_dir):
    """Ordered conversion funnel view -> click -> purchase per user:
    earliest time each step is reached at/after the previous step, and
    the consecutive depth. One shuffle on user_id (chained conditional
    window minimums; see operators/funnel.py)."""
    ev = load_table(spark, sf_dir, "events")
    from distribot_spark.operators.funnel import funnel_stages

    out = funnel_stages(ev, ["view", "click", "purchase"])
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("view_ts", fmt).alias("view_ts"),
        F.date_format("click_ts", fmt).alias("click_ts"),
        F.date_format("purchase_ts", fmt).alias("purchase_ts"),
        "depth",
    ).orderBy("user_id")


@register(
    "q_cohort_retention",
    oracle="""
    WITH su AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
                FROM events WHERE event_type = 'signup' GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
            FROM events),
    j AS (SELECT s.user_id, s.cohort_week,
                 CAST(date_diff('day', s.cohort_week, a.act_week) / 7
                      AS BIGINT) AS week_offset
          FROM su s JOIN act a ON s.user_id = a.user_id
          WHERE a.act_week >= s.cohort_week)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
           COUNT(DISTINCT user_id) AS n_active
    FROM j GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    tags=("temporal", "cohort"),
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by signup week, counted as
    active in each subsequent week they produced any event. Both weeks
    are Monday-truncated in both engines, so offsets are exact multiples
    of 7 days. Shuffles: per-user signup agg, activity distinct, one
    co-keyed join, final cell agg — all on user/cohort keys."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    j = (
        su.join(act, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("bigint")
            .alias("week_offset"),
        )
    )
    return (
        j.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q_funnel_windowed",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
           JOIN s0 ON e.user_id = s0.user_id AND e.ts >= s0.t0
                  AND e.ts <= s0.t0 + INTERVAL 1 HOUR
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
                  AND e.ts <= s1.t1 + INTERVAL 1 HOUR
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT u.user_id,
           strftime(t0, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
           strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(t2, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CAST(CASE WHEN t2 IS NOT NULL THEN 3
                     WHEN t1 IS NOT NULL THEN 2
                     WHEN t0 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS depth
    FROM u LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
           LEFT JOIN s2 USING (user_id)
    ORDER BY user_id
    """,
    tags=("temporal", "funnel"),
)
def q_funnel_windowed(spark, sf_dir):
    """Conversion-window funnel: each step must land within 1 hour of
    the previous step (the `within` variant of operators/funnel.py) —
    same one-shuffle chained-window plan as q_funnel."""
    ev = load_table(spark, sf_dir, "events")
    from distribot_spark.operators.funnel import funnel_stages

    out = funnel_stages(ev, ["view", "click", "purchase"], within="1 hour")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("view_ts", fmt).alias("view_ts"),
        F.date_format("click_ts", fmt).alias("click_ts"),
        F.date_format("purchase_ts", fmt).alias("purchase_ts"),
        "depth",
    ).orderBy("user_id")


@register(
    "q_compact_latest",
    oracle="""
    WITH r AS (SELECT user_id, event_id, event_type, ts, value,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC)
                        AS rn
               FROM events)
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           ROUND(value * 100) / 100 AS value
    FROM r WHERE rn = 1 ORDER BY user_id
    """,
    tags=("temporal", "compaction"),
)
def q_compact_latest(spark, sf_dir):
    """CDC-style compaction: the latest record per key (ts DESC with
    event_id tie-break) — the keep-last-write pass that turns an
    append-only change log into a current-state snapshot. One shuffle on
    the key; the window is a per-partition top-1, and at scale this is
    the MERGE-free read-side compaction run before serving."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            stable_round(F.col("value")).alias("value"),
        )
        .orderBy("user_id")
    )


_EWMA_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS rev_cents
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY 1, 2),
w AS (
  SELECT event_type, day,
         list(rev_cents) OVER (PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
           AS xs
  FROM d)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
  ROUND(
    list_sum(list_transform(xs, (x, i) -> x * pow(0.5, len(xs) - i)))
    / (100.0 * (2.0 - pow(0.5, len(xs) - 1)))
    * 10000) / 10000 AS ewma
FROM w ORDER BY event_type, day
"""


@register("q_ewma", oracle=_EWMA_ORACLE, tags=("temporal", "smoothing"))
def q_ewma(spark, sf_dir):
    """Exponentially weighted moving average of daily revenue (α = ½,
    truncated at 16 observations, weights renormalized over the
    available prefix) — trend smoothing for metric streams.

    Exact by construction: daily revenue folds to int64 CENTS; the
    weights are DYADIC (2^-k), so every term is an exact binary
    fraction and the weighted sum is the same double under ANY
    summation order — no cross-engine fold-order hazard (contrast the
    emb_norm_audit note, where fold order had to be pinned). Both
    engines evaluate the same windowed ordered list + indexed-lambda
    expression; one shuffle to the daily grain, per-key parallel
    windows. The interpreted-lambda cost rides on DAILY rows (tiny),
    never the event scan."""
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
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
        .rowsBetween(-15, 0)
    )
    w = d.select(
        "event_type", "day", F.collect_list("rev_cents").over(f).alias("xs")
    )
    # Spark's transform lambda index is 0-based (DuckDB's is 1-based):
    # offset-from-current = size - 1 - i here, size - i there.
    ewma = F.expr(
        "aggregate(transform(xs, (x, i) -> x * pow(0.5, size(xs) - 1 - i)),"
        " 0D, (a, b) -> a + b)"
    ) / (F.lit(100.0) * (F.lit(2.0) - F.expr("pow(0.5, size(xs) - 1)")))
    return w.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.round(ewma * F.lit(10000.0), 0) / F.lit(10000.0)).alias("ewma"),
    ).orderBy("event_type", "day")


@register(
    "q_max_concurrency",
    oracle="""
    WITH sess AS (
      SELECT ts AS start_ts, ts + INTERVAL 5 MINUTE AS end_ts,
             CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'view'),
    pts AS (
      SELECT day, start_ts AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT day, end_ts AS t, -1 AS delta FROM sess),
    run AS (
      SELECT day, t,
             SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS concurrent
      FROM pts)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY day ORDER BY day
    """,
    tags=("temporal", "sweep"),
)
def q_max_concurrency(spark, sf_dir):
    """Peak concurrency via the sweep-line (+1/−1) trick: each view
    opens a 5-minute session; boundary events sorted within the day
    partition, running sum, per-day max. The O(n log n) answer to "how
    many sessions were open at once" — the capacity-planning query a
    naive interval self-join makes O(n²). Start-before-end tie order
    (delta DESC at equal t) counts back-to-back touching sessions as
    overlapping in BOTH engines. Day partitions keep every window
    parallel; sessions are attributed to their start day (documented
    boundary convention)."""
    from pyspark.sql import Window as W

    sess = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("end_ts"),
            F.col("ts").cast("date").alias("day"),
        )
    )
    pts = sess.select(
        "day", F.col("start_ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select("day", F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        W.partitionBy("day")
        .orderBy(F.col("t"), F.col("delta").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        pts.withColumn("concurrent", F.sum("delta").over(w))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.max("concurrent").cast("long").alias("peak_concurrent"))
        .orderBy("day")
    )


@register(
    "q_rolling_dau_exact",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    contrib AS (
      SELECT user_id, day + CAST(k AS INTEGER) AS tday
      FROM d, (SELECT unnest(range(7)) AS k)),
    r AS (SELECT tday, COUNT(DISTINCT user_id) AS wau
          FROM contrib GROUP BY tday)
    SELECT strftime(r.tday, '%Y-%m-%d') AS day, r.wau
    FROM r, bounds WHERE r.tday BETWEEN bounds.lo AND bounds.hi
    ORDER BY day
    """,
    tags=("temporal", "distinct"),
)
def q_rolling_dau_exact(spark, sf_dir):
    """EXACT trailing-7-day distinct users per day (rolling WAU) — the
    sliding-distinct problem, which has no algebraic window form
    (distinct doesn't subtract). The scalable shape: each (user, day)
    pair CONTRIBUTES itself to the 7 target days it covers (map-only
    ×7 explode), then one distinct-count per target day — O(7n) work,
    all equi-grouped, no day×day join and no per-day re-scan. The
    oracle twin of q_rolling_dau_hll, which replaces the exact distinct
    with mergeable sketches at 100 TB."""
    d = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = d.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "day",
    ).select("user_id", F.date_add("day", F.col("k")).alias("tday"))
    r = contrib.groupBy("tday").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return (
        r.crossJoin(F.broadcast(bounds))
        .filter(F.col("tday").between(F.col("lo"), F.col("hi")))
        .select(F.date_format("tday", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


@register("q_rolling_dau_hll", oracle=None, tags=("temporal", "distinct", "approx"))
def q_rolling_dau_hll(spark, sf_dir):
    """Sketch-based trailing-7-day distinct users: ONE DataSketches HLL
    per (user-day grain) day, each day's sketch contributed to its 7
    covering windows and UNIONED — the mergeable-summary answer to
    sliding distinct counts. At 100 TB the daily sketches are a few KB
    each and persist; a new day means 7 sketch unions, not a 7-day
    re-scan (same argument as q_hll_rollup, applied along time).
    ≈ operator, rows-only; tolerance vs the exact twin asserted in
    tests/test_operators.py::test_rolling_dau_hll_tolerance."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "day", "sk"
    ).select(F.date_add("day", F.col("k")).alias("tday"), "sk")
    r = contrib.groupBy("tday").agg(F.hll_union_agg("sk").alias("sk"))
    return (
        r.crossJoin(F.broadcast(bounds))
        .filter(F.col("tday").between(F.col("lo"), F.col("hi")))
        .select(
            F.date_format("tday", "yyyy-MM-dd").alias("day"),
            F.hll_sketch_estimate("sk").alias("wau_est"),
        )
        .orderBy("day")
    )


@register(
    "q_dedup_within_time",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END AS is_burst_start
      FROM s)
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(is_burst_start) AS BIGINT) AS n_kept
    FROM flagged GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("temporal", "dedup"),
)
def q_dedup_within_time(spark, sf_dir):
    """Time-bounded burst dedup (the BATCH twin of streaming
    dropDuplicatesWithinWatermark, with crisp batch semantics): within
    each (user, type), an event is KEPT iff it starts a burst — no
    same-key event in the preceding 10 minutes (gaps-and-islands on
    the LAG gap). Telemetry retry storms collapse to their first
    occurrence. One shuffle on the dedup key; emitted as per-key
    kept/total counts so the census itself is the contract."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
    )
    # exact microsecond gap — cast('long') would floor to seconds and
    # diverge from the oracle's INTERVAL comparison for gaps in
    # (600s, 601s); events timestamps carry sub-second precision
    flagged = s.withColumn(
        "is_burst_start",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros("ts") - F.unix_micros("prev_ts")
                > 600_000_000
            ),
            1,
        ).otherwise(0),
    )
    return (
        flagged.groupBy("user_id", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("is_burst_start").cast("long").alias("n_kept"),
        )
        .orderBy("user_id", "event_type")
    )


_INTERP_ORACLE = """
WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                       date_trunc('hour', MAX(ts)) AS hi
                FROM events WHERE event_type = 'purchase'),
grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
         FROM bounds),
agg AS (SELECT date_trunc('hour', ts) AS h,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase' AND hour(ts) NOT IN (3, 4, 5)
        GROUP BY 1),
g AS (SELECT grid.h, CAST(epoch(grid.h) // 3600 AS BIGINT) AS idx, agg.cents
      FROM grid LEFT JOIN agg ON grid.h = agg.h),
f AS (
  SELECT h, idx, cents,
    last_value(cents IGNORE NULLS) OVER wp AS pv,
    last_value(CASE WHEN cents IS NOT NULL THEN idx END IGNORE NULLS)
      OVER wp AS pi,
    first_value(cents IGNORE NULLS) OVER wf AS nv,
    first_value(CASE WHEN cents IS NOT NULL THEN idx END IGNORE NULLS)
      OVER wf AS ni
  FROM g
  WINDOW wp AS (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW),
         wf AS (ORDER BY idx ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING))
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       cents IS NOT NULL AS observed,
       CAST(ROUND(CASE
         WHEN cents IS NOT NULL THEN cents * 1.0
         WHEN pv IS NOT NULL AND nv IS NOT NULL
           THEN pv + (nv - pv) * 1.0 * (idx - pi) / (ni - pi)
         ELSE COALESCE(pv, nv) * 1.0
       END) AS BIGINT) AS filled_cents
FROM f ORDER BY hour
"""


@register("events_interpolate", oracle=_INTERP_ORACLE, tags=("temporal", "gapfill"))
def events_interpolate(spark, sf_dir):
    """LINEAR-interpolation gap fill (the sensor-data sibling of
    events_resample_gapfill's zero fill): hours 03-05 are deliberately
    blanked, then reconstructed from the straight line between the
    nearest observed neighbors — last/first IGNORE NULLS window pulls
    (prev, next) value+index in one pass each. Integer cents in, exact
    integer ratio interpolation out (identical doubles → identical
    rounding), edges fall back to nearest-observed. SCALE NOTE: the
    window runs over the HOURLY SPINE (bounded by the time range), not
    events; partition it by month at 100 TB and seam-check boundaries
    as in q_sequence_gaps."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    agg = (
        ev.filter(~F.hour("ts").isin(3, 4, 5))
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(F.sum("value") * F.lit(100.0), 0).cast("long").alias("cents")
        )
    )
    g = grid.join(agg, "h", "left").select(
        "h",
        F.floor(F.col("h").cast("long") / 3600).cast("long").alias("idx"),
        "cents",
    )
    wp = W.orderBy("idx").rowsBetween(W.unboundedPreceding, 0)
    wf = W.orderBy("idx").rowsBetween(0, W.unboundedFollowing)
    idx_if_obs = F.when(F.col("cents").isNotNull(), F.col("idx"))
    f = g.select(
        "h",
        "idx",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("pv"),
        F.last(idx_if_obs, ignorenulls=True).over(wp).alias("pi"),
        F.first("cents", ignorenulls=True).over(wf).alias("nv"),
        F.first(idx_if_obs, ignorenulls=True).over(wf).alias("ni"),
    )
    interp = (
        F.when(F.col("cents").isNotNull(), F.col("cents") * F.lit(1.0))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * F.lit(1.0)
            * (F.col("idx") - F.col("pi"))
            / (F.col("ni") - F.col("pi")),
        )
        .otherwise(F.coalesce("pv", "nv") * F.lit(1.0))
    )
    return f.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("cents").isNotNull().alias("observed"),
        F.round(interp, 0).cast("long").alias("filled_cents"),
    ).orderBy("hour")


@register(
    "q_sequence_pattern",
    oracle="""
    WITH coded AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
                  WHEN 'purchase' THEN 'P' ELSE 'X' END AS code
      FROM events),
    seqs AS (
      SELECT user_id,
             string_agg(code, '' ORDER BY ts, event_id) AS seq
      FROM coded GROUP BY user_id)
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'V[^P]*P')) AS BIGINT)
             AS n_conversions
    FROM seqs ORDER BY user_id
    """,
    tags=("temporal", "cep"),
)
def q_sequence_pattern(spark, sf_dir):
    """Sequence pattern matching (the MATCH_RECOGNIZE / CEP shape):
    each user's event history encodes to a letter string in exact
    (ts, event_id) order, and "a view that eventually converts"
    (V[^P]*P) is counted by leftmost non-overlapping regex semantics —
    identical in Spark's regexp_count and the oracle's
    regexp_extract_all (verified 'VVCPXVP' → 2 in both). ONE shuffle
    on user_id; the per-user string is bounded by per-user history
    (session-window the sequence first when histories are unbounded).
    Spark lacks ordered string_agg, so the order is pinned by
    array_sort over (ts, event_id, code) structs before the join —
    the q_string_agg move with a total struct order."""
    coded = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            "ts",
            "event_id",
            F.when(F.col("event_type") == "view", "V")
            .when(F.col("event_type") == "click", "C")
            .when(F.col("event_type") == "purchase", "P")
            .otherwise("X")
            .alias("code"),
        ).alias("m"),
    )
    seqs = coded.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("m")), lambda x: x["code"]),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("n_events"),
        F.regexp_count("seq", F.lit("V[^P]*P")).cast("long").alias(
            "n_conversions"
        ),
    ).orderBy("user_id")


@register(
    "q_cohort_ltv",
    oracle="""
    WITH su AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
                FROM events WHERE event_type = 'signup' GROUP BY user_id),
    rev AS (SELECT user_id, date_trunc('week', ts) AS rev_week,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2),
    j AS (SELECT s.cohort_week,
                 CAST(date_diff('day', s.cohort_week, r.rev_week) / 7
                      AS BIGINT) AS week_offset,
                 r.cents
          FROM su s JOIN rev r ON s.user_id = r.user_id
          WHERE r.rev_week >= s.cohort_week),
    cell AS (SELECT cohort_week, week_offset,
                    CAST(SUM(cents) AS BIGINT) AS cents
             FROM j GROUP BY 1, 2)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
           ROUND(CAST(SUM(cents) OVER (PARTITION BY cohort_week
                                       ORDER BY week_offset
                                       ROWS UNBOUNDED PRECEDING)
                 AS DOUBLE) / 100.0 * 100) / 100 AS cum_ltv
    FROM cell ORDER BY cohort_week, week_offset
    """,
    tags=("temporal", "cohort", "kpi"),
)
def q_cohort_ltv(spark, sf_dir):
    """Cohort LTV curve — cumulative purchase revenue per signup-week
    cohort by week-of-life (the retention matrix's revenue sibling).
    Revenue folds to exact int64 CENTS at the (user, week) grain, so
    the cumulative window adds exact integers — no float accumulation
    across the curve. Same key discipline as q_cohort_retention: all
    shuffles on user/cohort keys; the cumulative window runs per
    cohort over week offsets (spine-sized)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("week", F.col("ts")).alias("rev_week"))
        .agg(
            F.round(F.sum("value") * F.lit(100.0), 0).cast("long").alias("cents")
        )
    )
    j = (
        su.join(rev, "user_id")
        .filter(F.col("rev_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (F.datediff("rev_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
            "cents",
        )
    )
    cell = j.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").alias("cents")
    )
    wc = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        cell.withColumn("cum_cents", F.sum("cents").over(wc))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            (
                F.round(
                    F.col("cum_cents").cast("double") / F.lit(100.0)
                    * F.lit(100.0),
                    0,
                )
                / F.lit(100.0)
            ).alias("cum_ltv"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q_attribution_last_touch",
    oracle="""
    WITH pur AS (SELECT user_id, ts, event_id, value FROM events
                 WHERE event_type = 'purchase'),
    cl AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click'),
    m AS (SELECT p.event_id, p.value, c.ts AS c_ts, p.ts AS p_ts,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                                    ORDER BY c.ts DESC, c.event_id DESC) AS rn
          FROM pur p LEFT JOIN cl c
            ON p.user_id = c.user_id AND c.ts <= p.ts),
    att AS (SELECT event_id, value,
                   CASE WHEN c_ts IS NOT NULL
                             AND c_ts >= p_ts - INTERVAL 24 HOUR
                        THEN 'click' ELSE 'organic' END AS channel
            FROM m WHERE rn = 1)
    SELECT channel, COUNT(*) AS n_purchases,
           ROUND(SUM(value) * 100) / 100 AS revenue
    FROM att GROUP BY channel ORDER BY channel
    """,
    tags=("temporal", "attribution"),
)
def q_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent click within 24 hours, else 'organic' — the marketing-
    analytics report built on the as-of join with staleness tolerance
    (operators/asof.py, the asof_click_view machinery pointed at a
    business question). One merge-shaped shuffle on user_id; the
    channel rollup is map-side-combined into 2 rows."""
    ev = load_table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    cl = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        pur, cl, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_id"], tolerance="24 hours", tie_breaker="click_id",
    )
    return (
        joined.select(
            F.when(F.col("click_id").isNotNull(), "click")
            .otherwise("organic")
            .alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            stable_round(F.sum("value")).alias("revenue"),
        )
        .orderBy("channel")
    )


_ROLLCORR_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(value) FILTER (event_type = 'purchase') * 100)
              AS BIGINT) AS xc,
         CAST(ROUND(SUM(value) FILTER (event_type = 'click') * 100)
              AS BIGINT) AS yc
  FROM events GROUP BY 1),
f AS (SELECT day, COALESCE(xc, 0) AS x, COALESCE(yc, 0) AS y FROM d),
w AS (
  SELECT day,
    COUNT(*) OVER fr AS n,
    CAST(SUM(x) OVER fr AS BIGINT) AS sx,
    CAST(SUM(y) OVER fr AS BIGINT) AS sy,
    CAST(SUM(x * y) OVER fr AS BIGINT) AS sxy,
    CAST(SUM(x * x) OVER fr AS BIGINT) AS sxx,
    CAST(SUM(y * y) OVER fr AS BIGINT) AS syy
  FROM f
  WINDOW fr AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT strftime(day, '%Y-%m-%d') AS day,
       ROUND((n * sxy - sx * sy) * 1.0
             / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
             * 10000) / 10000 + 0.0 AS corr14
FROM w
WHERE n >= 14 AND n * sxx > sx * sx AND n * syy > sy * sy
ORDER BY day
"""


@register("q_rolling_corr", oracle=_ROLLCORR_ORACLE, tags=("temporal", "stats"))
def q_rolling_corr(spark, sf_dir):
    """Rolling 14-day Pearson correlation between the daily purchase
    and click revenue series — the co-movement monitor (did the two
    funnels decouple this week?). All six sufficient statistics (n, Σx,
    Σy, Σxy, Σx², Σy²) are integer window sums over exact cents, so
    the correlation divides identical integers — the bivariate
    extension of q_anomaly_zscore's trick; no cross-engine CORR-over-
    frame order hazard. One shuffle to the daily grain; signed value →
    the `+ 0.0` guard. INT64 BOUND: the binding term is n·Σx² (14
    squared terms summed, then ×14 again) — daily cents must stay
    under ~2.1e8 (≈ $2M/day per series) to keep n·Σx² < 2^63; above
    that, drop to whole dollars or decimal(38) for the squared sums."""
    from pyspark.sql import Window as W

    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.coalesce(
                F.round(
                    F.sum(F.when(F.col("event_type") == "purchase", F.col("value")))
                    * F.lit(100.0),
                    0,
                ).cast("long"),
                F.lit(0),
            ).alias("x"),
            F.coalesce(
                F.round(
                    F.sum(F.when(F.col("event_type") == "click", F.col("value")))
                    * F.lit(100.0),
                    0,
                ).cast("long"),
                F.lit(0),
            ).alias("y"),
        )
    )
    fr = W.orderBy("day").rowsBetween(-13, 0)
    w = d.select(
        "day",
        F.count("*").over(fr).alias("n"),
        F.sum("x").over(fr).alias("sx"),
        F.sum("y").over(fr).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(fr).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fr).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(fr).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.lit(1.0)
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        w.filter(
            (F.col("n") >= 14)
            & (F.col("n") * F.col("sxx") > F.col("sx") * F.col("sx"))
            & (F.col("n") * F.col("syy") > F.col("sy") * F.col("sy"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (
                F.round(num * F.lit(1.0) / den * F.lit(10000.0), 0)
                / F.lit(10000.0)
                + F.lit(0.0)
            ).alias("corr14"),
        )
        .orderBy("day")
    )


@register(
    "q_peak_detection",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    w AS (
      SELECT day, c,
             LAG(c) OVER (ORDER BY day) AS prv,
             LEAD(c) OVER (ORDER BY day) AS nxt,
             CAST(SUM(c) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING
                               AND 1 PRECEDING) AS BIGINT) AS s7,
             COUNT(*) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING
                            AND 1 PRECEDING) AS n7
      FROM d)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND(c / 100.0 * 100) / 100 AS revenue
    FROM w
    WHERE prv IS NOT NULL AND nxt IS NOT NULL AND n7 >= 4
      AND c > prv AND c > nxt
      AND c * n7 * 10 > s7 * 12
    ORDER BY day
    """,
    tags=("temporal", "peaks"),
)
def q_peak_detection(spark, sf_dir):
    """Peak detection on the daily revenue series: a day is a peak iff
    it beats both neighbors AND exceeds 1.2× its trailing-week mean —
    the spike-finder behind launch/incident review. The mean comparison
    is cross-multiplied into pure integers (c·n·10 > s·12), so not even
    a division happens before the hash; neighbors via LAG/LEAD on the
    bounded daily spine."""
    from pyspark.sql import Window as W

    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.round(F.sum("value") * F.lit(100.0), 0).cast("long").alias("c")
        )
    )
    wo = W.orderBy("day")
    fr = wo.rowsBetween(-7, -1)
    w = d.select(
        "day",
        "c",
        F.lag("c").over(wo).alias("prv"),
        F.lead("c").over(wo).alias("nxt"),
        F.sum("c").over(fr).alias("s7"),
        F.count("*").over(fr).alias("n7"),
    )
    return (
        w.filter(
            F.col("prv").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("n7") >= 4)
            & (F.col("c") > F.col("prv"))
            & (F.col("c") > F.col("nxt"))
            & (F.col("c") * F.col("n7") * 10 > F.col("s7") * 12)
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (
                F.round(F.col("c") / F.lit(100.0) * F.lit(100.0), 0)
                / F.lit(100.0)
            ).alias("revenue"),
        )
        .orderBy("day")
    )


@register(
    "q_time_to_convert",
    oracle="""
    WITH fv AS (SELECT user_id, MIN(ts) AS v FROM events
                WHERE event_type = 'view' GROUP BY 1),
    fp AS (SELECT e.user_id, MIN(e.ts) AS p
           FROM events e JOIN fv ON fv.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= fv.v
           GROUP BY e.user_id),
    d AS (SELECT CAST((epoch_us(fp.p) - epoch_us(fv.v)) // 60000000
                      AS BIGINT) AS mins
          FROM fv JOIN fp USING (user_id)),
    r AS (SELECT mins, cume_dist() OVER (ORDER BY mins) AS cd FROM d)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           MIN(CASE WHEN cd >= 0.5 THEN mins END) AS p50_minutes,
           MIN(CASE WHEN cd >= 0.9 THEN mins END) AS p90_minutes
    FROM r
    """,
    tags=("temporal", "funnel", "kpi"),
)
def q_time_to_convert(spark, sf_dir):
    """Conversion latency: first view → first subsequent purchase per
    user, summarized as PERCENTILE_DISC latencies over integer MINUTES
    (the q_percentiles_disc spelling: cume_dist + conditional min —
    always an actual duration, integer-exact in both engines; measured
    here first: interpolated quantile_cont diverged from Spark's
    percentile in the last place on this very data, so disc semantics
    are the robust choice for durations) — the 'how long does the
    funnel take' KPI pairing q_funnel's 'how many make it'. Two
    per-user aggregates + one co-keyed join."""
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    d = fv.join(fp, "user_id").select(
        (
            F.floor(
                (F.unix_micros("p") - F.unix_micros("v")) / F.lit(60_000_000)
            )
        )
        .cast("long")
        .alias("mins")
    )
    from pyspark.sql import Window as W

    r = d.withColumn("cd", F.cume_dist().over(W.orderBy("mins")))
    return r.agg(
        F.count("*").alias("n_converted"),
        F.min(F.when(F.col("cd") >= 0.5, F.col("mins"))).alias("p50_minutes"),
        F.min(F.when(F.col("cd") >= 0.9, F.col("mins"))).alias("p90_minutes"),
    )
