"""Streaming declared queries S1–S10 (SURVEY.md §2B).

Every entry replays the events table as a bounded file stream
(deterministic chunking, see streaming.replay) and returns the final sink
table, so the DuckDB oracle can check streaming semantics as batch SQL:
on bounded input, streaming result ≡ batch result — modulo watermark
effects, which the late-data variants (s4) encode *explicitly* in the
oracle's HAVING clause.

Output-mode choices per operator:
- complete: windowed aggs where the final table is the full aggregate
- append:   watermarked closure semantics (s4), dedup (s5), joins (s8)
- update:   stateful running aggregates (s6, s10) with a batch-side
            latest-row projection afterwards (counts are monotone)
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.session import local_rows_df
from distribot_spark.functions import stable_round
from distribot_spark.queries.registry import register
from distribot_spark.queries.cdf_shared import (
    CDF_VIEW_ORACLE,
    JOIN_MATVIEW_ORACLE_SUMS,
    MATVIEW_ORACLE_FULL,
    MATVIEW_ORACLE_SUMS,
    apply_matview_workload,
    build_cdf_demo_table,
    cdf_view_deltas,
    seed_matview_base,
)
from distribot_spark.streaming import replay

_FMT_S = "yyyy-MM-dd HH:mm:ss"
_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_S1_ORACLE = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS cnt, ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def _hourly_agg(stream):
    return (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("raw_sum"))
        .select(
            F.date_format("window.start", _FMT_S).alias("window_start"),
            "event_type",
            "cnt",
            stable_round(F.col("raw_sum")).alias("sum_value"),
        )
    )


@register("s1_tumbling_window", oracle=_S1_ORACLE, tags=("streaming",))
def s1_tumbling_window(spark, sf_dir):
    """Tumbling 1h windows × event_type (complete mode ≡ batch agg)."""
    src = replay.replay_dir(sf_dir)
    return replay.run_bounded(spark, _hourly_agg, src, "complete").orderBy(
        "window_start", "event_type"
    )


@register(
    "s2_sliding_window",
    oracle="""
    WITH w AS (
      SELECT event_type, value,
             unnest([time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15 * k)
                     FOR k IN [0, 1, 2, 3]]) AS ws
      FROM events)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           COUNT(*) AS cnt, ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM w GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("streaming",),
)
def s2_sliding_window(spark, sf_dir):
    """Sliding 1h windows, 15m slide: each event lands in 4 windows."""
    src = replay.replay_dir(sf_dir)

    def t(stream):
        return (
            stream.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("raw_sum"))
            .select(
                F.date_format("window.start", _FMT_S).alias("window_start"),
                "event_type",
                "cnt",
                stable_round(F.col("raw_sum")).alias("sum_value"),
            )
        )

    return replay.run_bounded(spark, t, src, "complete").orderBy(
        "window_start", "event_type"
    )


@register(
    "s3_session_window",
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
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
    """,
    tags=("streaming",),
)
def s3_session_window(spark, sf_dir):
    """Per-user session windows with a 30-minute gap (session end = last
    event + gap, matching the gaps-and-islands batch definition)."""
    src = replay.replay_dir(sf_dir)

    def t(stream):
        return (
            stream.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("raw_sum"))
            .select(
                "user_id",
                F.date_format("session_window.start", _FMT_US).alias("session_start"),
                F.date_format("session_window.end", _FMT_US).alias("session_end"),
                "n_events",
                stable_round(F.col("raw_sum")).alias("sum_value"),
            )
        )

    return replay.run_bounded(spark, t, src, "complete").orderBy(
        "user_id", "session_start"
    )


@register(
    "s4_watermark_late_data",
    oracle="""
    WITH agg AS (SELECT date_trunc('hour', ts) AS ws, event_type,
                        COUNT(*) AS cnt, ROUND(SUM(value) * 100) / 100 AS sum_value
                 FROM events GROUP BY 1, 2),
    wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           cnt, sum_value
    FROM agg, wm WHERE ws + INTERVAL 1 HOUR <= w
    ORDER BY 1, 2
    """,
    tags=("streaming", "watermark"),
)
def s4_watermark_late_data(spark, sf_dir):
    """Watermark + late data, deterministically replayed: file 1 holds all
    events ≥ 2024-01-02 (watermark advances to global max − 1h), file 2
    replays the day-1 events a full watermark behind.

    What Spark guarantees (and what the oracle encodes) is *closure*:
    append mode emits exactly the windows with window_end ≤ final
    watermark, once, with complete counts. Late-row *dropping* is
    best-effort: rows whose window state was already evicted are dropped,
    but rows for never-seen windows (our whole day-1 file) still create
    state and emit immediately — verified empirically on Spark 4.1.2, and
    why the oracle aggregates over all events rather than only file 1.
    The split sits on a window boundary so no window spans both files."""
    src = replay.replay_dir(sf_dir, late_split_ts="2024-01-02 00:00:00")

    def t(stream):
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("raw_sum"))
            .select(
                F.date_format("window.start", _FMT_S).alias("window_start"),
                "event_type",
                "cnt",
                stable_round(F.col("raw_sum")).alias("sum_value"),
            )
        )

    return replay.run_bounded(spark, t, src, "append").orderBy(
        "window_start", "event_type"
    )


@register(
    "s5_stream_dedup",
    oracle="""
    SELECT event_id, event_type, value FROM events ORDER BY event_id
    """,
    tags=("streaming", "dedup"),
)
def s5_stream_dedup(spark, sf_dir):
    """Streaming dedup under at-least-once delivery: the replay redelivers
    the last chunk; dropDuplicatesWithinWatermark on event_id restores
    exactly-once output. The 720h delay covers the replay's redelivery
    horizon — at scale this is sized to the source's redelivery window."""
    src = replay.replay_dir(sf_dir, duplicate_last_chunk=True)

    def t(stream):
        return (
            stream.withWatermark("ts", "720 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "event_type", "value")
        )

    return replay.run_bounded(spark, t, src, "append").orderBy("event_id")


@register(
    "s6_stateful_counter",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("streaming", "stateful"),
)
def s6_stateful_counter(spark, sf_dir):
    """Custom per-key state machine via applyInPandasWithState (the same
    primitive the flow engine's per-flow state uses): running per-user
    (count, sum), emitted every update; the batch projection keeps the
    final row per user (counts are monotone)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = replay.replay_dir(sf_dir)

    def update(key, pdfs, state):
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "raw_sum": [s]}
        )

    def t(stream):
        return stream.groupBy("user_id").applyInPandasWithState(
            update,
            "user_id long, n_events long, raw_sum double",
            "n long, s double",
            "update",
            GroupStateTimeout.NoTimeout,
        )

    updates = replay.run_bounded(spark, t, src, "update")
    return (
        updates.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            stable_round(F.max("raw_sum")).alias("sum_value"),
        )
        .orderBy("user_id")
    )


@register(
    "s7_stream_static_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS cnt,
           ROUND(SUM(value) * 100) / 100 AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("streaming", "join"),
)
def s7_stream_static_join(spark, sf_dir):
    """Stream ⋈ static dimension (broadcast — the dim never shuffles),
    aggregated by segment."""
    src = replay.replay_dir(sf_dir)
    customer = load_table(spark, sf_dir, "customer")

    def t(stream):
        joined = stream.join(
            F.broadcast(customer), stream.user_id == customer.c_custkey
        )
        return (
            joined.groupBy("c_mktsegment")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("raw_sum"))
            .select(
                "c_mktsegment", "cnt", stable_round(F.col("raw_sum")).alias("sum_value")
            )
        )

    return replay.run_bounded(spark, t, src, "complete").orderBy("c_mktsegment")


@register(
    "s8_stream_stream_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS view_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'view'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    ORDER BY 1, 2
    """,
    tags=("streaming", "join"),
)
def s8_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join: view within 1h after a
    click by the same user. In-order replay ⇒ no state-eviction misses ⇒
    output ≡ the batch interval join."""
    src = replay.replay_dir(sf_dir)

    def t(s_click, s_view):
        clicks = (
            s_click.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "1 hour")
        )
        views = (
            s_view.filter(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "1 hour")
        )
        return clicks.join(
            views,
            (F.col("c_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("c_ts"))
            & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        ).select("click_id", "view_id")

    return replay.run_bounded(spark, t, src, "append", n_sources=2).orderBy(
        "click_id", "view_id"
    )


@register("s9_foreachbatch_sink", oracle=_S1_ORACLE, tags=("streaming", "sink"))
def s9_foreachbatch_sink(spark, sf_dir):
    """foreachBatch idempotent sink: each micro-batch atomically replaces
    the result table (complete-mode agg ⇒ overwrite is a correct MERGE;
    re-running a batch converges to the same state)."""
    import tempfile

    src = replay.replay_dir(sf_dir)
    out_dir = tempfile.mkdtemp(prefix="s9_", dir=replay.TMP_ROOT)

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out_dir)

    replay.run_foreach_batch(spark, _hourly_agg, src, sink, "complete")
    return spark.read.parquet(out_dir).orderBy("window_start", "event_type")


@register("s10_output_modes", oracle=_S1_ORACLE, tags=("streaming",))
def s10_output_modes(spark, sf_dir):
    """Update output mode on the S1 aggregation: the sink accumulates one
    row per key per changed batch; the final answer is the latest (= max,
    counts and positive sums are monotone) row per key — and must equal
    the complete-mode/batch result."""
    src = replay.replay_dir(sf_dir)

    def t(stream):
        return (
            stream.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("raw_sum"))
            .select(
                F.date_format("window.start", _FMT_S).alias("window_start"),
                "event_type",
                "cnt",
                F.col("raw_sum"),
            )
        )

    updates = replay.run_bounded(spark, t, src, "update")
    return (
        updates.groupBy("window_start", "event_type")
        .agg(
            F.max("cnt").alias("cnt"),
            stable_round(F.max("raw_sum")).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "s11_stream_doc_quality",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
        len(string_split(text, ' ')) AS n_tok,
        len(list_filter(string_split(text, ' '),
            x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x)))
          AS sw_hits,
        len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents),
    q AS (
      SELECT doc_id,
        ROUND((CASE WHEN LENGTH(text) >= 50 AND LENGTH(text) <= 10000
                    THEN 0.4 ELSE 0.0 END
               + LEAST(sw_hits / n_tok * 2, 0.3)
               + LEAST(n_uniq / n_tok, 1.0) * 0.3) * 1000) / 1000 AS quality
      FROM s)
    SELECT doc_id, quality FROM q WHERE quality >= 0.5 ORDER BY doc_id
    """,
    tags=("streaming", "llm"),
)
def s11_stream_doc_quality(spark, sf_dir):
    """Incremental document ingest: the documents table replayed as a
    bounded file stream with the quality gate applied per micro-batch —
    stateless, so streaming result ≡ batch result exactly. The 100 TB
    story: docs land in the lake continuously and the scoring/filter
    pipeline runs as a standing query instead of nightly batch. The
    filter compares the ROUNDED (3-dp, engine-identical) score, so the
    cut is deterministic."""
    from distribot_spark.operators import text as text_ops

    src = replay.table_replay_dir(sf_dir, "documents", "doc_id")

    def gate(stream):
        scored = text_ops.quality_score(stream, "text")
        return scored.filter(F.col("quality") >= 0.5).select("doc_id", "quality")

    return replay.run_bounded(spark, gate, src, "append").orderBy("doc_id")


@register(
    "s12_stream_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS doc_id FROM documents
    GROUP BY md5(text) ORDER BY doc_id
    """,
    tags=("streaming", "llm", "dedup"),
)
def s12_stream_exact_dedup(spark, sf_dir):
    """Content-hash dedup as a STANDING query — the streaming twin of
    l1_exact_dedup, sharing its oracle: documents arrive incrementally,
    state keeps the running min doc_id per md5(text), update mode emits a
    key whenever its canonical changes, and the final answer is the min
    over each key's sink rows (a running min's last update). At scale the
    state is one row per distinct content hash — the dedup index a real
    ingest pipeline keeps anyway."""
    src = replay.table_replay_dir(sf_dir, "documents", "doc_id")

    def t(stream):
        return (
            stream.withColumn("h", F.md5("text"))
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
        )

    updates = replay.run_bounded(spark, t, src, "update")
    return (
        updates.groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "s13_stream_topk",
    oracle="""
    WITH c AS (SELECT event_type, user_id, COUNT(*) AS cnt
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, user_id, cnt,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cnt DESC, user_id) AS rnk
          FROM c)
    SELECT event_type, user_id, cnt, rnk FROM r WHERE rnk <= 3
    ORDER BY event_type, rnk
    """,
    tags=("streaming", "topk"),
)
def s13_stream_topk(spark, sf_dir):
    """Streaming 'trending' top-k: running per-(event_type, user) counts
    as a standing update-mode aggregate; the top-3 users per event type
    are read off the sink by taking each key's LATEST running count
    (counts are monotone, so latest = max) and ranking batch-side. This
    is the production shape for leaderboards: the stream maintains the
    counts (state = one row per live key), the cheap top-k is a view
    over the state snapshot, and the ranking never runs inside the
    stream (a global sort per micro-batch would be the anti-pattern)."""
    src = replay.replay_dir(sf_dir)

    def t(stream):
        return stream.groupBy("event_type", "user_id").agg(
            F.count("*").alias("cnt")
        )

    updates = replay.run_bounded(spark, t, src, "update")
    from pyspark.sql import Window

    latest = updates.groupBy("event_type", "user_id").agg(
        F.max("cnt").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), "user_id")
    return (
        latest.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "user_id", "cnt", "rnk")
        .orderBy("event_type", "rnk")
    )


@register(
    "s14_stream_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_orderkey, o_totalprice, 1 AS version FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice * 2, 2 FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'f'),
    cur AS (SELECT o_orderkey, arg_max(o_totalprice, version) AS price,
                   MAX(version) AS v
            FROM log GROUP BY o_orderkey)
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
           ROUND(SUM(CAST(price AS DECIMAL(14,2))), 2)::DOUBLE AS total_current
    FROM cur
    """,
    tags=("streaming", "cdc"),
)
def s14_stream_cdc_apply(spark, sf_dir):
    """Streaming CDC apply: an append-only update log (insert = v1,
    update = v2, updates strictly later in the stream) is folded into a
    current-state snapshot by a standing update-mode aggregate —
    max_by(price, version) per key is exactly the MERGE-latest the
    batch compaction (q_compact_latest) does offline. State = one row
    per live key; the sink's last emission per key IS the current row.
    The oracle folds the same log with arg_max in one batch pass."""
    src = replay.orders_cdc_replay_dir(sf_dir)

    def t(stream):
        return stream.groupBy("o_orderkey").agg(
            F.max("version").alias("v"),
            F.max_by("o_totalprice", "version").alias("price"),
        )

    updates = replay.run_bounded(spark, t, src, "update")
    latest = updates.groupBy("o_orderkey").agg(
        F.max_by("price", "v").alias("price"), F.max("v").alias("v")
    )
    return latest.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("v") == 2, 1).otherwise(0)).alias("n_updated"),
        F.round(F.sum(F.col("price").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("total_current"),
    )


@register(
    "s15_stream_stream_left_outer",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS view_id
    FROM events a LEFT JOIN events b
      ON a.user_id = b.user_id AND b.event_type = 'view'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'click'
    ORDER BY 1, 2
    """,
    tags=("streaming", "join", "outer"),
)
def s15_stream_stream_left_outer(spark, sf_dir):
    """Watermarked LEFT OUTER stream-stream join: every click pairs with
    views in the following hour, or emits a NULL row once the watermark
    proves no view can still arrive. Unlike the inner join (s8), the
    NULL side exists only because state EVICTION is observable — Spark
    emits the unmatched row when the click's join window closes under
    the watermark. The replay's `__flush__` sentinels (3 h / 4 h past
    max ts) close every window; they must FLOW THROUGH both join sides
    rather than be filtered out, because Catalyst pushes a deterministic
    event-type filter below the EventTimeWatermark node — a filtered
    sentinel would never reach the watermark tracker (measured: the last
    two outer rows never emit). Sentinel rows key on user_id = -1, match
    only each other, and are dropped from the BATCH result after the
    memory sink, where the filter cannot push into the stream. Two
    sentinel chunks because the watermark computed from batch k is
    applied in batch k+1. In production the sentinels' role is played by
    ordinary continuing traffic."""
    src = replay.replay_dir(sf_dir, flush_sentinel=True)

    def t(s_click, s_view):
        clicks = (
            s_click.withWatermark("ts", "1 hour")
            .filter(F.col("event_type").isin("click", "__flush__"))
            .select(
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"),
            )
        )
        views = (
            s_view.withWatermark("ts", "1 hour")
            .filter(F.col("event_type").isin("view", "__flush__"))
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
        )
        return clicks.join(
            views,
            (F.col("c_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("c_ts"))
            & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        ).select("click_id", "view_id")

    out = replay.run_bounded(spark, t, src, "append", n_sources=2)
    return out.filter(F.col("click_id") >= 0).orderBy("click_id", "view_id")


@register(
    "s16_stream_stream_full_outer",
    oracle="""
    SELECT c.event_id AS click_id, v.event_id AS view_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY 1, 2
    """,
    tags=("streaming", "join", "outer"),
)
def s16_stream_stream_full_outer(spark, sf_dir):
    """Watermarked FULL OUTER stream-stream join — the completion of the
    s8 (inner) / s15 (left) family: unmatched CLICKS null-fill on
    watermark eviction exactly as in s15, and unmatched VIEWS now also
    surface as (NULL, view_id) rows when their possible-match window
    closes. Same sentinel discipline as s15 (flush rows flow through
    BOTH sides pre-watermark, keyed user_id = -1 so they only match
    each other); the batch-side cleanup must keep NULL-keyed rows while
    dropping sentinel-keyed ones — `IS NULL OR >= 0` on each side, a
    filter that cannot be pushed into the stream."""
    src = replay.replay_dir(sf_dir, flush_sentinel=True)

    def t(s_click, s_view):
        clicks = (
            s_click.withWatermark("ts", "1 hour")
            .filter(F.col("event_type").isin("click", "__flush__"))
            .select(
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"),
            )
        )
        views = (
            s_view.withWatermark("ts", "1 hour")
            .filter(F.col("event_type").isin("view", "__flush__"))
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
        )
        return clicks.join(
            views,
            (F.col("c_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("c_ts"))
            & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
            "full_outer",
        ).select("click_id", "view_id")

    out = replay.run_bounded(spark, t, src, "append", n_sources=2)
    return out.filter(
        (F.col("click_id").isNull() | (F.col("click_id") >= 0))
        & (F.col("view_id").isNull() | (F.col("view_id") >= 0))
    ).orderBy("click_id", "view_id")


_S17_ORACLE = """
    WITH c AS (
      SELECT event_type,
             CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events),
    a AS (
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(cents) AS BIGINT) AS s1,
             CAST(SUM(cents * cents) AS BIGINT) AS s2
      FROM c GROUP BY 1)
    SELECT event_type, n_events,
           ROUND(s1 * 1.0 / n_events / 100.0 * 10000) / 10000 AS mean_value,
           ROUND(sqrt((n_events * s2 - s1 * s1) * 1.0
                      / (n_events * (n_events - 1))) / 100.0 * 10000) / 10000
             AS std_value
    FROM a ORDER BY event_type
"""


@register(
    "s17_stream_running_stats",
    oracle=_S17_ORACLE,
    tags=("streaming", "stateful", "stats"),
)
def s17_stream_running_stats(spark, sf_dir):
    """Streaming Welford-style running statistics per key
    (applyInPandasWithState): state = integer (n, Σcents, Σcents²), so
    the accumulation is EXACTLY order- and batching-independent — the
    final state equals the batch aggregate bit-for-bit, which is what
    makes a streaming metric monitor trustworthy (and this oracle
    possible; contrast s6, whose float sum relies on chunk-order
    determinism). Mean/std derive from the integer sums with the same
    spelled-out arithmetic as q_anomaly_zscore. The batch projection
    keeps each key's final update via max_by(n)."""
    return _running_stats(spark, sf_dir)


def _running_stats(spark, sf_dir, checkpoint_dir=None):
    import numpy as np
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = replay.replay_dir(sf_dir)

    def update(key, pdfs, state):
        if state.exists:
            n, s1, s2 = state.get
        else:
            n, s1, s2 = 0, 0, 0
        for pdf in pdfs:
            cents = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype(
                "int64"
            )
            n += len(cents)
            s1 += int(cents.sum())
            s2 += int((cents * cents).sum())
        state.update((n, s1, s2))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "s1": [s1], "s2": [s2]}
        )

    def t(stream):
        return stream.groupBy("event_type").applyInPandasWithState(
            update,
            "event_type string, n_events long, s1 long, s2 long",
            "n long, s1 long, s2 long",
            "update",
            GroupStateTimeout.NoTimeout,
        )

    updates = replay.run_bounded(spark, t, src, "update",
                                 checkpoint_dir=checkpoint_dir)
    final = updates.groupBy("event_type").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("s1", "n_events").alias("s1"),
        F.max_by("s2", "n_events").alias("s2"),
    )
    mean = F.col("s1") * F.lit(1.0) / F.col("n_events") / F.lit(100.0)
    var = (
        F.col("n_events") * F.col("s2") - F.col("s1") * F.col("s1")
    ) * F.lit(1.0) / (F.col("n_events") * (F.col("n_events") - 1))
    return final.select(
        "event_type",
        "n_events",
        (F.round(mean * F.lit(10000.0), 0) / F.lit(10000.0)).alias("mean_value"),
        (
            F.round(F.sqrt(var) / F.lit(100.0) * F.lit(10000.0), 0)
            / F.lit(10000.0)
        ).alias("std_value"),
    ).orderBy("event_type")


@register(
    "s22_rocksdb_running_stats",
    oracle=_S17_ORACLE,
    tags=("streaming", "stateful", "rocksdb"),
)
def s22_rocksdb_running_stats(spark, sf_dir):
    """s17's keyed running statistics executed under Spark's bundled
    ROCKSDB state store provider (replay.rocksdb_state_store) — the
    100 TB streaming-state lever: the default HDFS-backed provider holds
    every key's state on-heap per executor, RocksDB spills keyed state
    to local disk with an off-heap cache, so state size is bounded by
    SSD, not JVM heap. Identical transform, identical oracle — the
    provider must be semantics-invisible, which this oracle certifies.
    The query PROVES the provider ran by inspecting the kept checkpoint:
    RocksDB writes per-version `*.zip` snapshot artifacts where the
    HDFS provider writes `*.delta` files."""
    import glob
    import shutil
    import tempfile

    from distribot_spark.streaming.replay import TMP_ROOT

    ck = tempfile.mkdtemp(prefix="ckpt_rocksdb_", dir=TMP_ROOT)
    try:
        with replay.rocksdb_state_store(spark):
            out = _running_stats(spark, sf_dir, checkpoint_dir=ck)
        zips = glob.glob(os.path.join(ck, "state", "**", "*.zip"),
                         recursive=True)
        deltas = glob.glob(os.path.join(ck, "state", "**", "*.delta"),
                           recursive=True)
        assert zips and not deltas, (
            f"RocksDB provider did not run: {len(zips)} zip / "
            f"{len(deltas)} delta artifacts under {ck}"
        )
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return out


@register(
    "s18_stream_range_join",
    oracle="""
    WITH win AS (
      SELECT o_orderkey AS window_id,
             CAST(o_orderdate AS TIMESTAMP) AS st,
             CAST(o_orderdate AS TIMESTAMP) + INTERVAL 7 DAY AS en
      FROM orders WHERE o_orderkey % 499 = 0)
    SELECT w.window_id, COUNT(*) AS n_events,
           ROUND(SUM(e.value) * 100) / 100 AS sum_value
    FROM events e JOIN win w ON e.ts >= w.st AND e.ts < w.en
    GROUP BY w.window_id ORDER BY w.window_id
    """,
    tags=("streaming", "join", "range"),
)
def s18_stream_range_join(spark, sf_dir):
    """Streaming point-in-interval RANGE join: the live event stream
    matched against a STATIC interval table on a pure range predicate
    (no key equality) — the streaming twin of q_range_join. A
    stream-static inner join permits arbitrary conditions because the
    static side broadcasts and no join state is kept; each micro-batch
    is a map-side interval probe, so an unbounded stream joins bounded
    windows with zero state growth. Complete-mode per-window counts;
    the oracle replays the same join in batch."""
    src = replay.replay_dir(sf_dir)
    win = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 499 == 0)
        .select(
            F.col("o_orderkey").alias("window_id"),
            F.col("o_orderdate").alias("st"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("en"),
        )
    )

    def t(stream):
        joined = stream.join(
            F.broadcast(win),
            (stream.ts >= win.st) & (stream.ts < win.en),
        )
        return (
            joined.groupBy("window_id")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("raw"))
            .select(
                "window_id",
                "n_events",
                stable_round(F.col("raw")).alias("sum_value"),
            )
        )

    return replay.run_bounded(spark, t, src, "complete").orderBy("window_id")


@register(
    "s19_broker_effectively_once",
    oracle="""
    SELECT event_id, event_type, value FROM events ORDER BY event_id
    """,
    tags=("streaming", "dedup", "source"),
)
def s19_broker_effectively_once(spark, sf_dir):
    """R30–R31's at-least-once → effectively-once story at the SOURCE
    layer (s5's pattern moved down into the transport): a Kafka-shaped
    broker replay (streaming/broker.py) delivers the events log through
    a consumer that CRASHES between processing and offset commit — the
    restarted consumer resumes from the last committed offsets and the
    broker redelivers the uncommitted tail (reference connector.rb:56-73
    requeue semantics). Dedup on (partition, offset) — the record's
    physical identity, never its payload — restores exactly-once output;
    the oracle is the plain batch table, so the hash only matches if
    every redelivered record was dropped exactly once. At 100 TB the
    source swaps to readStream.format("kafka") with the identical record
    schema, and the watermark delay is sized to the broker's maximum
    redelivery window (a rebalance, not 720 demo hours)."""
    import os as _os

    from distribot_spark.streaming import broker as B

    root = _os.path.join(
        replay.TMP_ROOT, "broker", _os.path.basename(sf_dir.rstrip("/"))
    )
    log = B.events_broker_log(sf_dir, root)
    src = B.BrokerReplaySource(log, max_files_per_trigger=2)

    def t(stream):
        return (
            stream.withWatermark("ts", "720 hours")
            .dropDuplicatesWithinWatermark(["partition", "offset"])
            .select(F.from_json("value", B.EVENT_VALUE_DDL).alias("e"))
            .select("e.event_id", "e.event_type", "e.value")
        )

    return replay.run_bounded(spark, t, src, "append").orderBy("event_id")


@register(
    "s20_stream_quantile_histogram",
    oracle="""
    WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events),
    -- floor division spelled via the non-negative mod so BOTH engines
    -- agree for negative c too (DuckDB // floors, Spark DIV truncates
    -- toward zero — they differ on sign; the subtraction makes the
    -- numerator an exact multiple of 500, where the two coincide)
    hist AS (SELECT (c - ((c % 500) + 500) % 500) // 500 AS bin,
                    COUNT(*) AS n FROM c GROUP BY 1),
    h2 AS (SELECT bin, n, SUM(n) OVER (ORDER BY bin) AS cum,
                  SUM(n) OVER (ORDER BY bin) - n AS cum_prev FROM hist),
    tot AS (SELECT COUNT(*) AS total FROM c),
    q AS (SELECT unnest([2500, 5000, 7500, 9000, 9900]) AS qnum),
    spec AS (SELECT qnum, (total * qnum + 9999) // 10000 AS t FROM q, tot)
    SELECT s.qnum,
           CAST(h.bin * 500 + (500 * (s.t - h.cum_prev)) // h.n AS BIGINT)
             AS est_cents
    FROM spec s JOIN h2 h ON h.cum >= s.t AND h.cum_prev < s.t
    ORDER BY s.qnum
    """,
    tags=("streaming", "sketch", "percentile"),
)
def s20_stream_quantile_histogram(spark, sf_dir):
    """The quantile sketch as a STANDING QUERY (q_quantile_histogram's
    streaming twin): the fixed-width histogram is a complete-mode
    streaming aggregate — counts merge across micro-batches exactly like
    across shards, the mergeable-summary property doing double duty —
    and any percentile is served from the ~20-row final sink by the same
    integer interpolation. Quantization is FLOOR(value·100), immune to
    the cross-engine ROUND-tie trap by construction. This is the 100 TB
    monitoring shape: the stream maintains domain/width counters, p99
    queries never touch raw history."""
    src = replay.replay_dir(sf_dir)

    def t(stream):
        return (
            stream.select(
                F.floor(F.col("value") * 100).cast("long").alias("c")
            )
            # floor-div spelling safe for negative c (see oracle comment):
            # Spark DIV truncates toward zero, so feed it an exact
            # multiple of the width via the non-negative mod
            .groupBy(
                F.expr("(c - ((c % 500) + 500) % 500) DIV 500").alias("bin")
            )
            .agg(F.count("*").alias("n"))
        )

    hist = replay.run_bounded(spark, t, src, "complete")

    from pyspark.sql.window import Window

    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    h2 = hist.withColumn("cum", F.sum("n").over(wcum)).withColumn(
        "cum_prev", F.col("cum") - F.col("n")
    )
    tot = hist.agg(F.sum("n").alias("total"))
    q = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in (2500, 5000, 7500, 9000, 9900)]))
        .alias("qnum")
    )
    spec = q.crossJoin(F.broadcast(tot)).select(
        "qnum", F.expr("(total * qnum + 9999) DIV 10000").alias("t")
    )
    return (
        spec.join(h2, (F.col("cum") >= F.col("t")) & (F.col("cum_prev") < F.col("t")))
        .select(
            "qnum",
            F.expr("bin * 500 + (500 * (t - cum_prev)) DIV n")
            .cast("long")
            .alias("est_cents"),
        )
        .orderBy("qnum")
    )


@register(
    "s21_stream_dup_gram_census",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
          FROM w, LATERAL unnest(range(1, len(w) - 3)) AS t(i)),
    dup AS (SELECT g, COUNT(*) AS nd FROM g GROUP BY g HAVING COUNT(*) >= 2)
    SELECT g, CAST(nd AS BIGINT) AS nd FROM dup ORDER BY g
    """,
    tags=("streaming", "dedup", "text"),
)
def s21_stream_dup_gram_census(spark, sf_dir):
    """doc_dup_spans' SEED DETECTION as a STANDING QUERY: documents
    arrive incrementally (bounded replay of the lake), per-doc distinct
    5-grams explode statelessly, and a complete-mode aggregate maintains
    each gram's document count — the final sink filtered to counts ≥ 2
    is the live cross-document contamination census, updated as
    documents land instead of recomputed per batch job. State is one row
    per distinct gram (the same cardinality the batch census shuffles);
    at 100 TB the gram text is xxhash64'd (kept as text here for the
    oracle hash). The approx_count_distinct twin of this census is the
    sketch family's job; this one is exact."""
    src = replay.table_replay_dir(sf_dir, "documents", "doc_id")

    def t(stream):
        g = stream.select(
            "doc_id", F.split("text", " ").alias("w")
        ).filter(F.size("w") >= 5).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 4),"
                    " i -> concat_ws(' ', slice(w, i, 5)))"
                )
            ).alias("g"),
        ).distinct()  # stateful Deduplicate: (doc, gram) pairs once each
        # count(*) over the deduped pairs ≡ countDistinct(doc_id), which
        # streams forbid as a direct aggregate
        return g.groupBy("g").agg(F.count("*").alias("nd"))

    hist = replay.run_bounded(spark, t, src, "complete")
    return (
        hist.filter(F.col("nd") >= 2)
        .select("g", F.col("nd").cast("long").alias("nd"))
        .orderBy("g")
    )


@register(
    "s23_stream_cdc_acid_sink",
    oracle="""
    WITH log AS (
      SELECT o_orderkey, o_totalprice, 1 AS version FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice * 2, 2 FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'f'),
    cur AS (SELECT o_orderkey, arg_max(o_totalprice, version) AS price,
                   MAX(version) AS v
            FROM log GROUP BY o_orderkey)
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
           ROUND(SUM(CAST(price AS DECIMAL(14,2))), 2)::DOUBLE AS total_current
    FROM cur
    """,
    tags=("streaming", "cdc", "sink", "acid"),
)
def s23_stream_cdc_acid_sink(spark, sf_dir):
    """CDC stream → DURABLE ACID table: s14 folds the update log in
    streaming STATE; this lands every micro-batch in the multi-writer
    OCC commit log (sources/acid.py) through a foreachBatch
    VERSION-CONDITIONAL MERGE — Delta's ``WHEN MATCHED AND u.v > t.v``
    rebuilt on the repo's own log, the missing durability half of the
    CDC story (the table other engines/readers see, snapshot-isolated
    at every commit). Every batch is deliberately applied TWICE — the
    at-least-once worst case a foreachBatch restart produces — and the
    version condition makes the second application (and any stale
    out-of-order update, pinned by `test_versioned_merge_rejects_stale`)
    a no-op, so the hash oracle certifies effectively-once end to end.
    Scale shape: each merge rewrites only the touched key buckets via
    `merge_upsert_spark` (executor-side rewrite, one atomic driver-side
    link per commit); reapplied batches cost one bucket read, no lost
    updates possible at any interleaving."""
    import tempfile

    from distribot_spark.sources import acid

    src = replay.orders_cdc_replay_dir(sf_dir)
    root = tempfile.mkdtemp(prefix="s23_", dir=replay.TMP_ROOT)
    table = acid.TableLog(os.path.join(root, "table"))
    table.init()

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        up = batch_df.select("o_orderkey", "o_totalprice", "version")
        for _ in range(2):  # injected redelivery: worst-case reapply
            acid.merge_upsert_spark(
                spark, table, up, "o_orderkey", 8,
                writer=f"b{batch_id}", version="version",
            )

    replay.run_foreach_batch(spark, lambda s: s, src, sink, "append")

    cur = spark.read.parquet(*table.live_paths())
    return cur.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("total_current"),
    )


@register(
    "s24_stream_cdf_source",
    oracle=CDF_VIEW_ORACLE,  # shared with the batch IVM twin
    tags=("streaming", "cdc", "source", "acid", "ivm"),
)
def s24_stream_cdf_source(spark, sf_dir):
    """ACID table as a STREAMING SOURCE — Delta's ``readChangeFeed``
    streaming contract rebuilt on the repo's commit log, the read-side
    twin of s23 (which lands a stream INTO the log): each commit
    version's change feed (`table_changes_spark`, one version per
    micro-batch via maxFilesPerTrigger=1, commit order preserved)
    flows through readStream into an update-mode signed aggregation
    that maintains the same grouped view as the batch IVM
    (`source_cdf_incremental_view`) — and the SHARED oracle certifies
    the standing query's final state equals the direct aggregate of
    the final table. Folding through a 5-version history (seed,
    updates, inserts, tombstone delete, physical purge) proves the
    hard part: deltas arrive split across micro-batches, so only the
    integer-cents order/batching-independent fold (`cdf_view_deltas`)
    can match the batch hash. The per-g running row count is monotone,
    so the batch-side projection keeps each group's last update via
    max_by(n_rows). Scale shape: state is one row per view group (the
    aggregate's own grain, not the table's); each micro-batch costs
    O(that commit's changed rows) — the standing-query replacement for
    the nightly O(table) rescan."""
    import shutil
    import uuid as _uuid

    root = os.path.join(replay.TMP_ROOT, f"s24_{_uuid.uuid4().hex[:8]}")
    table = build_cdf_demo_table(
        spark, sf_dir, os.path.join(root, "table")
    )
    # materialize each version's CDF as one replay chunk: the bounded
    # deterministic stand-in for a streaming-source offset = log version
    chunks = replay.cdf_replay_dir(
        spark, table, "o_orderkey", os.path.join(root, "cdf_chunks"),
        versions_per_trigger=1,
    )

    def t(stream):
        return (
            cdf_view_deltas(stream)
            .groupBy("g")
            .agg(
                F.sum("dcnt").alias("cnt"),
                F.sum("dcents").alias("total_cents"),
                F.count("*").alias("n_rows"),
            )
        )

    updates = replay.run_bounded(spark, t, chunks, "update")
    out = (
        updates.groupBy("g")
        .agg(
            F.max_by("cnt", "n_rows").cast("long").alias("cnt"),
            F.max_by("total_cents", "n_rows").cast("long")
            .alias("total_cents"),
        )
        .orderBy("g")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


#: append-log ingest census — shared by s25 (manual OPTIMIZE) and
#: s32 (write-path auto-compaction, no OPTIMIZE call anywhere).
_S25_INGEST_ORACLE = """
    WITH log AS (
      SELECT o_orderkey, o_totalprice, 1 AS version FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice * 2, 2 FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'f')
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v2,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2)::DOUBLE
             AS total
    FROM log
"""


@register(
    "s25_stream_acid_ingest_rate",
    oracle=_S25_INGEST_ORACLE,
    tags=("streaming", "acid", "sink", "ingest", "scaling"),
)
def s25_stream_acid_ingest_rate(spark, sf_dir):
    """ACID log AT STREAMING INGEST RATES: ≥100 micro-batch commits
    (one blind append per batch — the adds-only fast path s23's MERGE
    sink is the keyed twin of) land in the OCC log, and the claim that
    the checkpointed manifest keeps metadata cost FLAT is measured
    in-flight: per-batch append time and per-batch snapshot() latency
    are both recorded, and the last decile must not grow past 4× the
    first (appends stage O(batch) files and never read base data;
    snapshot folds from the newest checkpoint, never the whole log —
    the IO shape behind both is pinned deterministically by
    test_snapshot_and_commit_cost_bounded_by_checkpoint_interval, and
    scaling.py --table-log records the 10/100/1000-commit wall-clock
    curve for BASELINE.md). After the stream, one OPTIMIZE compacts the
    ~800 append fragments (asserted shrinking) and the census is read
    from the compacted snapshot, so the hash oracle certifies the
    whole ingest→compact loop lost nothing. The fragmenting it cleans
    up is real: 100 appends × touched buckets files, exactly the
    small-file debt streaming tables accrue."""
    import statistics
    import tempfile
    import time as _time

    from distribot_spark.sources import acid

    src = replay.orders_cdc_replay_dir(sf_dir, n_chunks=100)
    root = tempfile.mkdtemp(prefix="s25_", dir=replay.TMP_ROOT)
    table = acid.TableLog(os.path.join(root, "table"))
    table.init()
    append_secs: list[float] = []
    snap_secs: list[float] = []

    def sink(batch_df, batch_id):
        pdf = batch_df.toPandas()
        if pdf.empty:
            return
        t0 = _time.monotonic()
        table.snapshot()
        snap_secs.append(_time.monotonic() - t0)
        t0 = _time.monotonic()
        acid.append_pandas(
            table, pdf[["o_orderkey", "o_totalprice", "version"]],
            "o_orderkey", 8, writer=f"b{batch_id}",
        )
        append_secs.append(_time.monotonic() - t0)

    replay.run_foreach_batch(spark, lambda s: s, src, sink, "append")
    assert table.version() >= 99, table.version()
    assert os.path.exists(table._checkpoint_path(90))  # checkpoints live

    # Order-of-magnitude guard ONLY: the tight flatness contract is
    # pinned deterministically (IO-shape test) and measured by
    # scaling.py --table-log; a wall-clock assert inside a registered
    # correctness query must not flake the gate under host contention,
    # so this catches only a gross O(V) regression (~20x growth).
    def flat(xs, floor):
        first = statistics.median(xs[:10])
        last = statistics.median(xs[-10:])
        assert last <= max(20 * first, floor), (first, last)

    flat(append_secs, 1.0)   # O(batch) staging, no base reads
    flat(snap_secs, 0.5)     # checkpointed-manifest fold, never O(V)

    st = acid.optimize_table_spark(
        spark, table, "o_orderkey", 8, "compactor", files_per_bucket=1,
    )
    assert st["files_after"] < st["files_before"] // 10, st

    cur = spark.read.parquet(*table.live_paths())
    return cur.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0))
        .cast("long").alias("n_v2"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double").alias("total"),
    )


@register(
    "s26_stream_cdf_watermark_late",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("streaming", "cdc", "source", "acid", "watermark", "late"),
)
def s26_stream_cdf_watermark_late(spark, sf_dir):
    """WATERMARKED late data through the CDF SOURCE — the S4 discipline
    applied to the new source: the ACID table ingests append commits in
    commit order (events up to max−2h; the last two hours, advancing
    the watermark to the stream max; then a LATE commit whose ten
    synthetic rows sit 5 hours BEFORE the stream start; finally two
    far-future flush-sentinel commits, the replay_dir flush
    discipline). The feed replays one commit per micro-batch and an
    hourly windowed aggregate layers `withWatermark` over it in append
    mode. The late commit exercises the half of the watermark contract
    s4 cannot: Spark filters late input against the PREVIOUS
    micro-batch's watermark, so rows arriving once the watermark has
    already passed them are DROPPED — deterministic here because the
    late commit lands two batches after the watermark advanced (in s4
    the late file is the stream's second batch, its filtering watermark
    is still the initial one, and never-seen windows emit — both modes
    verified on Spark 4.1.2, which is why the oracle aggregates events
    ONLY: the ten late rows must leave no trace). Sentinels flow
    THROUGH the aggregation (a pre-aggregation filter would be pushed
    below the EventTimeWatermark node and could never advance it) and
    their far-future windows are trimmed from the RESULT; the final
    watermark clears every real window, so closure = the full hourly
    aggregate over events, complete counts, each window exactly once,
    integer-cents exact under any batch split. Scale shape: state is
    one row per open window; each micro-batch costs O(that commit's
    changed rows)."""
    import datetime
    import shutil
    import uuid as _uuid

    from distribot_spark.sources import acid, table_changes_spark

    root = os.path.join(replay.TMP_ROOT, f"s26_{_uuid.uuid4().hex[:8]}")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    tmin, tmax = ev.agg(F.min("ts"), F.max("ts")).first()
    split = tmax - datetime.timedelta(hours=2)
    late_base = tmin.replace(minute=0, second=0, microsecond=0) \
        - datetime.timedelta(hours=5)
    late = local_rows_df(spark, 
        [(-1 - i, late_base + datetime.timedelta(minutes=i), float(i))
         for i in range(10)],
        "event_id long, ts timestamp, value double",
    )

    table = acid.TableLog(os.path.join(root, "table"))
    table.init()
    acid.append_spark(spark, table, ev.filter(F.col("ts") <= split),
                      "event_id", 8, "seed")
    acid.append_spark(spark, table, ev.filter(F.col("ts") > split),
                      "event_id", 8, "tail")
    acid.append_spark(spark, table, late, "event_id", 8, "late-cdc")
    for i, hours in enumerate((3, 4)):  # flush sentinels (see replay_dir)
        sent = local_rows_df(spark, 
            [(-100 - i, tmax + datetime.timedelta(hours=hours), 0.0)],
            "event_id long, ts timestamp, value double",
        )
        acid.append_spark(spark, table, sent, "event_id", 8, f"flush-{i}")

    chunks = os.path.join(root, "cdf_chunks")
    os.makedirs(chunks, exist_ok=True)
    for v in range(table.version() + 1):
        ch = table_changes_spark(
            spark, table, "event_id", from_version=v, to_version=v
        )
        tmp = os.path.join(root, f"_v{v}")
        ch.repartition(1).write.mode("overwrite").parquet(tmp)
        part = next(
            p for p in sorted(os.listdir(tmp)) if p.endswith(".parquet")
        )
        os.rename(os.path.join(tmp, part),
                  os.path.join(chunks, f"chunk_{v:04d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    def t(stream):
        return (
            stream.filter(F.col("_change_type") == "insert")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                .cast("long").alias("cents"),
            )
            .select(
                F.date_format("window.start", _FMT_S).alias("window_start"),
                "cnt", "cents",
            )
        )

    # drop the sentinels' own far-future windows from the RESULT (their
    # job was advancing the watermark); real window starts are <= tmax,
    # sentinel windows >= tmax+3h, and _FMT_S sorts chronologically
    tmax_str = tmax.strftime("%Y-%m-%d %H:%M:%S")
    out = (
        replay.run_bounded(spark, t, chunks, "append")
        .filter(F.col("window_start") <= tmax_str)
        .orderBy("window_start")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "s27_stream_cdc_dv_delete_sink",
    oracle="""
    WITH fin AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 1000 = 0
                  THEN CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 2, 2)
                       AS DOUBLE)
                  ELSE o_totalprice END AS p,
             CASE WHEN o_orderkey % 1000 = 0 THEN 2 ELSE 1 END AS v
      FROM orders WHERE o_orderkey % 1000 <> 8)
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated,
           CAST(ROUND(SUM(CAST(p AS DECIMAL(14,2))), 2) AS DOUBLE)
             AS total_current
    FROM fin
    """,
    tags=("streaming", "cdc", "sink", "acid", "dv", "delete"),
)
def s27_stream_cdc_dv_delete_sink(spark, sf_dir):
    """CDC stream with DELETES routed to DELETION VECTORS — the
    streaming face of `delete_keys_spark`, completing s23 (which sinks
    upserts): each micro-batch splits by op — upserts flow through the
    version-conditional MERGE, deletes land as DV sidecars with ZERO
    base-file rewrites (asserted per delete batch: the live data-file
    set is unchanged) — so a high-churn delete stream never pays bucket
    rewrite amplification; a later update wave rewrites its buckets and
    compacts their DVs in passing, with the deleted keys staying
    deleted (the merge folds DVs before rewriting). Contract note,
    stated honestly: DV deletes carry NO tombstone, so they suit
    in-order feeds (this replay); under at-least-once redelivery with
    stale upserts, use the tombstone path (`source_merge_cdc_delete`)
    whose persisted markers outrank stale versions. The hash oracle
    certifies the final census: every 1000th order doubled, keys ≡8 mod
    1000 gone. Scale shape: per batch, merge cost is O(touched
    buckets), delete cost is O(deleted rows) sidecar bytes; commit cost
    one atomic link each."""
    import tempfile
    import uuid as _uuid

    from distribot_spark.sources import acid

    root = tempfile.mkdtemp(prefix="s27_", dir=replay.TMP_ROOT)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    chunks = os.path.join(root, "chunks")
    os.makedirs(chunks, exist_ok=True)

    def write_chunk(i, df):
        tmp = os.path.join(root, f"_c{i}")
        df.repartition(1).write.mode("overwrite").parquet(tmp)
        part = next(
            p for p in sorted(os.listdir(tmp)) if p.endswith(".parquet")
        )
        os.rename(os.path.join(tmp, part),
                  os.path.join(chunks, f"chunk_{i:04d}.parquet"))
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)

    # 8 insert waves (op=u, v=1), one delete wave, one update wave
    for i in range(8):
        write_chunk(i, orders.filter(F.col("o_orderkey") % 8 == i).select(
            "o_orderkey", "o_totalprice",
            F.lit(1).alias("v"), F.lit("u").alias("op"),
        ))
    write_chunk(8, orders.filter(F.col("o_orderkey") % 1000 == 8).select(
        "o_orderkey", "o_totalprice",
        F.lit(2).alias("v"), F.lit("d").alias("op"),
    ))
    write_chunk(9, orders.filter(F.col("o_orderkey") % 1000 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("decimal(12,2)") * 2, 2)
        .cast("double").alias("o_totalprice"),
        F.lit(2).alias("v"), F.lit("u").alias("op"),
    ))

    table = acid.TableLog(os.path.join(root, "table"))
    table.init()
    stats = {"dv_files": 0, "delete_batches": 0}

    def sink(batch_df, batch_id):
        ups = batch_df.filter(F.col("op") == "u").select(
            "o_orderkey", "o_totalprice", "v"
        )
        dels = batch_df.filter(F.col("op") == "d").select("o_orderkey")
        if not ups.isEmpty():
            acid.merge_upsert_spark(
                spark, table, ups, "o_orderkey", 16,
                writer=f"up-{batch_id}", version="v",
            )
        if not dels.isEmpty():
            live_before = set(table.snapshot()[1])
            st = acid.delete_keys_spark(
                spark, table, dels, "o_orderkey", 16,
                writer=f"del-{batch_id}",
            )
            # THE DV point: a delete batch rewrites no base file
            assert set(table.snapshot()[1]) == live_before
            stats["dv_files"] += st["dv_files"]
            stats["delete_batches"] += 1

    replay.run_foreach_batch(spark, lambda s: s, chunks, sink, "append")
    assert stats["delete_batches"] == 1 and stats["dv_files"] > 0, stats

    cur = acid.read_snapshot_spark(spark, table, dv_key="o_orderkey")
    return cur.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("v") == 2, 1).otherwise(0))
        .cast("long").alias("n_updated"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double").alias("total_current"),
    )


#: the dirty-feed expectations census — shared by s28 (foreachBatch
#: quarantine ingest) and s31 (the DLQ tailed as a streaming source).
_S28_EXPECTATIONS_ORACLE = """
    WITH feed AS (
      SELECT o_orderkey AS k,
             CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                       IN ('0', '1')
                  THEN -o_totalprice ELSE o_totalprice END AS price
      FROM orders),
    clean AS (SELECT * FROM feed WHERE price >= 0),
    bad   AS (SELECT * FROM feed WHERE price < 0)
    SELECT (SELECT COUNT(*) FROM clean) AS n_clean,
           (SELECT ROUND(SUM(CAST(price AS DECIMAL(18,2))), 2)::DOUBLE
              FROM clean) AS total_clean,
           (SELECT COUNT(*) FROM bad) AS n_quarantined_keys,
           (SELECT ROUND(SUM(CAST(price AS DECIMAL(18,2))), 2)::DOUBLE
              FROM bad) AS total_quarantined
"""


@register(
    "s28_stream_expectations_quarantine",
    oracle=_S28_EXPECTATIONS_ORACLE,
    tags=("streaming", "quality", "constraints", "acid"),
)
def s28_stream_expectations_quarantine(spark, sf_dir):
    """Streaming EXPECTATIONS (dlt's expect_or_drop as a pipeline): a
    deliberately dirty feed — ~1/8 of rows carry an impossible negative
    price, keyed by a portable md5 predicate — streams through a
    foreachBatch MERGE into an ACID table whose quarantine-mode CHECK
    constraint diverts the bad rows to the dead-letter area batch by
    batch, so the pipeline keeps flowing and the bad rows stay
    auditable instead of failing the stream or silently vanishing.

    Every batch is applied TWICE (the at-least-once worst case): the
    MERGE half is effectively-once (idempotent rewrite), while the
    dead-letter area is honestly AT-LEAST-ONCE — each reapply diverts
    again (asserted: raw quarantine rows = 2x distinct), so consumers
    dedup by key, exactly like any redelivered DLQ. The hash oracle
    certifies the clean census AND the distinct-key quarantine census.

    The sink never states the table layout — it was persisted at
    create (`TableLog.init(key=, n_buckets=)`), the multi-writer
    coordination story at scale. Scale shape: constraint evaluation is
    executor-side in the merge stage; the quarantine write is one
    extra job over only the bad rows of the batch."""
    import tempfile

    from distribot_spark.sources import acid

    src = replay.table_replay_dir(sf_dir, "orders", "o_orderkey", 8)
    root = tempfile.mkdtemp(prefix="s28_", dir=replay.TMP_ROOT)
    table = acid.TableLog(os.path.join(root, "table"))
    table.init(
        key="k", n_buckets=8,
        constraints={"price_pos": {"col": "price", "min": 0,
                                   "on_violation": "quarantine"}},
    )
    stats = {"quarantined": 0}

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        up = batch_df.select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.md5(F.col("o_orderkey").cast("string"))
                .substr(1, 1).isin("0", "1"),
                -F.col("o_totalprice"),
            ).otherwise(F.col("o_totalprice")).alias("price"),
        )
        # ONE bucket-discovery pass for both applies (r9 optimization,
        # guide §1.2): the redelivered batch is the same frame, so its
        # touched-bucket set is identical — the all-rows set is a
        # superset of the post-quarantine clean rows' buckets, which
        # the touched_buckets contract allows (a clean-bucket rewrite
        # carries identical rows). Both applies still run the full
        # constraint split, rewrite and commit independently.
        bkts = {
            int(r["_pb"]) for r in up.select(
                acid._bucket_expr(
                    "k", 8, table.hash_buckets()).alias("_pb")
            ).distinct().collect()
        }
        for _ in range(2):  # injected redelivery: worst-case reapply
            st = acid.merge_upsert_spark(spark, table, up,
                                         writer=f"b{batch_id}",
                                         touched_buckets=bkts)
            stats["quarantined"] += st["quarantined"]

    replay.run_foreach_batch(spark, lambda s: s, src, sink, "append")

    q = acid.read_quarantine(spark, table).select("k", "price")
    n_raw = q.count()
    qd = q.distinct()
    n_distinct = qd.count()
    # the DLQ is at-least-once under redelivery: exactly 2 copies here,
    # and the writers' reported counts account for every raw row
    assert n_raw == 2 * n_distinct and n_distinct > 0, (n_raw, n_distinct)
    assert stats["quarantined"] == n_raw, (stats, n_raw)

    clean = acid.read_snapshot_spark(spark, table)
    return (
        clean.agg(
            F.count("*").alias("n_clean"),
            F.round(F.sum(F.col("price").cast("decimal(18,2)")), 2)
            .cast("double").alias("total_clean"),
        )
        .crossJoin(
            qd.agg(
                F.count("*").alias("n_quarantined_keys"),
                F.round(F.sum(F.col("price").cast("decimal(18,2)")), 2)
                .cast("double").alias("total_quarantined"),
            )
        )
    )


@register(
    "s29_stream_identity_ingest",
    oracle="""
    WITH r AS (
        SELECT o_orderkey AS k, o_totalprice AS price,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS pos,
               COUNT(*) OVER () AS n
        FROM orders
    ),
    c AS (
        SELECT r.*,
               (SELECT MAX(i) FROM range(0, 8) t(i)
                WHERE (i * r.n) // 8 <= r.pos) AS chunk
        FROM r
    ),
    ids AS (
        SELECT k, price,
               (chunk * n) // 8
               + ROW_NUMBER() OVER (PARTITION BY chunk
                                    ORDER BY k % 16, k) - 1 AS rid
        FROM c
    )
    SELECT COUNT(*) AS cnt,
           CAST(MAX(rid) AS BIGINT) AS max_rid,
           CAST(SUM(rid) AS BIGINT) AS sum_rid,
           CAST(SUM(rid * (k % 1009)) AS BIGINT) AS rid_binding
    FROM ids
    """,
    tags=("streaming", "identity", "acid", "sink"),
)
def s29_stream_identity_ingest(spark, sf_dir):
    """IDENTITY under streaming ingest: orders replayed as 8
    micro-batches through a foreachBatch APPEND into an identity
    table — every batch draws the next COMMIT-RESERVED id range, ids
    within a batch follow the (bucket, key) convention, so the DuckDB
    oracle reconstructs EVERY id from scratch: it re-derives each
    row's micro-batch from the replay's sorted-slice boundaries,
    offsets by the cumulative batch sizes (= the ranges the commits
    reserved), and ranks within the batch — the product-sum binding
    then pins the exact per-row assignment across ~8 separate OCC
    commits. What this certifies beyond source_acid_identity: range
    bookkeeping stays exact through the checkpointed micro-batch
    machinery, not just direct calls."""
    import tempfile

    from distribot_spark.sources import acid

    src = replay.table_replay_dir(sf_dir, "orders", "o_orderkey", 8)
    root = tempfile.mkdtemp(prefix="s29_", dir=replay.TMP_ROOT)
    table = acid.TableLog(os.path.join(root, "table"))
    table.init(key="k", n_buckets=16, identity={"col": "rid"})

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        acid.append_spark(
            spark, table,
            batch_df.select(F.col("o_orderkey").alias("k"),
                            F.col("o_totalprice").alias("price")),
            writer=f"b{batch_id}",
        )

    replay.run_foreach_batch(spark, lambda s: s, src, sink, "append")

    cur = acid.read_snapshot_spark(spark, table)
    return cur.agg(
        F.count("*").alias("cnt"),
        F.max("rid").cast("long").alias("max_rid"),
        F.sum("rid").cast("long").alias("sum_rid"),
        F.sum(F.col("rid") * (F.col("k") % 1009)).cast("long")
        .alias("rid_binding"),
    )


@register(
    "s30_stream_cdf_catchup",
    oracle=CDF_VIEW_ORACLE,  # shared verbatim with s24 and the batch IVM
    tags=("streaming", "cdc", "source", "acid", "ivm", "catchup"),
)
def s30_stream_cdf_catchup(spark, sf_dir):
    """CDF source CATCH-UP BATCHING — the restart-after-downtime knob
    s24 lacks: a consumer resuming far behind the head must not pay
    one micro-batch PER COMMIT (10k commits behind = 10k triggers),
    so the feed folds `versions_per_trigger` consecutive versions
    into each micro-batch (Delta's maxFilesPerTrigger/
    maxBytesPerTrigger batching over readChangeFeed, commit order
    preserved inside the batch by _commit_version and across batches
    by the replay mtime discipline; the per-version change
    computation, carried-DV rule included, is the SAME code at any
    factor). Asserted in-flight: the 5-commit history replays in
    ceil(5/3)=2 chunks (the batch-count contract — pinned harder at
    three factors by test_cdf_catchup_batching_drops_batch_count),
    and the standing aggregate's final state is IDENTICAL to s24's
    one-version-per-trigger run because the signed integer-cents fold
    is batching-independent — certified end-to-end by sharing s24's
    oracle verbatim. Scale shape: catch-up cost is O(changed rows)
    regardless of batching factor; the factor only amortizes the
    per-trigger scheduling constant, exactly the knob a resumed
    stream needs."""
    import math
    import shutil
    import uuid as _uuid

    root = os.path.join(replay.TMP_ROOT, f"s30_{_uuid.uuid4().hex[:8]}")
    table = build_cdf_demo_table(
        spark, sf_dir, os.path.join(root, "table")
    )
    head = table.version()
    chunks = replay.cdf_replay_dir(
        spark, table, "o_orderkey", os.path.join(root, "cdf_chunks"),
        versions_per_trigger=3,
    )
    n_chunks = len([f for f in os.listdir(chunks)
                    if f.endswith(".parquet")])
    # the catch-up contract: strictly fewer triggers than commits
    assert n_chunks == math.ceil((head + 1) / 3) < head + 1, n_chunks

    def t(stream):
        return (
            cdf_view_deltas(stream)
            .groupBy("g")
            .agg(
                F.sum("dcnt").alias("cnt"),
                F.sum("dcents").alias("total_cents"),
                F.count("*").alias("n_rows"),
            )
        )

    updates = replay.run_bounded(spark, t, chunks, "update")
    out = (
        updates.groupBy("g")
        .agg(
            F.max_by("cnt", "n_rows").cast("long").alias("cnt"),
            F.max_by("total_cents", "n_rows").cast("long")
            .alias("total_cents"),
        )
        .orderBy("g")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "s31_stream_dlq_source",
    oracle=_S28_EXPECTATIONS_ORACLE,  # shared verbatim with s28
    tags=("streaming", "quality", "constraints", "acid", "dlq",
          "source"),
)
def s31_stream_dlq_source(spark, sf_dir):
    """The DEAD-LETTER AREA as a STREAMING SOURCE — the read-side twin
    of s28's quarantine ingest (real expectations pipelines TAIL the
    DLQ for alerting and auto-reprocess; batch-polling
    `read_quarantine` is the s28-era stopgap): the same dirty feed
    (~1/8 impossible negative prices) streams through the quarantine-
    mode MERGE sink, then a FILE-STREAM over the quarantine tree
    (streaming/sources.py `DlqFileSource`, recursive over
    ``quarantine/<batch>/<part>``, arrival order stamped by
    `stamp_tree_replay_order` — the s29 mtime discipline) replays
    every diverted row as micro-batches into a streaming
    distinct-key census. The DLQ's at-least-once contract carries
    into the stream unchanged — the census dedups by key exactly
    like s28's batch read — so the final state shares s28's oracle
    VERBATIM: clean-table census + streamed distinct quarantine
    census, hash-certified. The live-tail + drop-rule + reprocess
    composition (divert → tail sees it → replay re-admits it) is
    pinned by test_dlq_live_tail_and_reprocess_composition. Scale
    shape: the tail reads only quarantine bytes (never the table),
    one micro-batch per diverted batch file; dedup state is one row
    per bad key — the DLQ grain, not the table's."""
    import tempfile

    from distribot_spark.sources import acid
    from distribot_spark.streaming.sources import DlqFileSource

    src = replay.table_replay_dir(sf_dir, "orders", "o_orderkey", 8)
    root = tempfile.mkdtemp(prefix="s31_", dir=replay.TMP_ROOT)
    table = acid.TableLog(os.path.join(root, "table"))
    table.init(
        key="k", n_buckets=8,
        constraints={"price_pos": {"col": "price", "min": 0,
                                   "on_violation": "quarantine"}},
    )

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        acid.merge_upsert_spark(
            spark, table,
            batch_df.select(
                F.col("o_orderkey").alias("k"),
                F.when(
                    F.md5(F.col("o_orderkey").cast("string"))
                    .substr(1, 1).isin("0", "1"),
                    -F.col("o_totalprice"),
                ).otherwise(F.col("o_totalprice")).alias("price"),
            ),
            writer=f"b{batch_id}",
        )

    replay.run_foreach_batch(spark, lambda s: s, src, sink, "append")

    qroot = acid.quarantine_dir(table)
    replay.stamp_tree_replay_order(qroot)

    def tail(stream):
        return (
            stream.select("k", "price")
            .dropDuplicates(["k"])  # the DLQ is at-least-once: dedup
            .agg(
                F.count("*").alias("n_quarantined_keys"),
                F.round(F.sum(F.col("price").cast("decimal(18,2)")), 2)
                .cast("double").alias("total_quarantined"),
            )
        )

    streamed = replay.run_bounded(
        spark, tail, DlqFileSource(qroot), "complete"
    )
    clean = acid.read_snapshot_spark(spark, table)
    return clean.agg(
        F.count("*").alias("n_clean"),
        F.round(F.sum(F.col("price").cast("decimal(18,2)")), 2)
        .cast("double").alias("total_clean"),
    ).crossJoin(streamed)


@register(
    "s32_stream_auto_compact_ingest",
    oracle=_S25_INGEST_ORACLE,  # shared verbatim with s25
    tags=("streaming", "acid", "sink", "ingest", "compaction"),
)
def s32_stream_auto_compact_ingest(spark, sf_dir):
    """WRITE-PATH AUTO-COMPACTION under streaming ingest — the policy
    that retires s25's manual-OPTIMIZE step (Delta's autoCompact): the
    table opts in at create (`auto_optimize=2` files per bucket) and
    the SAME 100-micro-batch append log lands with NO explicit
    OPTIMIZE call anywhere; append writers that push a bucket past 2x
    the target bin-pack it back down as a follow-up OCC commit
    (best-effort — a lost race leaves the debt for the next append's
    trigger). Asserted in-flight: the live file count stays BOUNDED
    (≤ 2n+1 per bucket at the end, vs ~800 fragments s25 accumulates
    before its manual pass) and auto-compaction commits actually
    fired; their CDF-invisibility (content-preserving rewrite, the
    OPTIMIZE argument) is pinned by
    test_auto_compaction_bounds_live_files_spark. The census reads the final
    snapshot and shares s25's oracle VERBATIM — compaction that loses,
    duplicates or resurrects a row hash-mismatches. Scale shape: the
    2x hysteresis amortizes one compaction per n appends per bucket;
    each compaction touches only the overfull buckets' files, so the
    ingest path stays O(batch) + amortized O(debt)."""
    import tempfile

    from distribot_spark.sources import acid

    src = replay.orders_cdc_replay_dir(sf_dir, n_chunks=100)
    root = tempfile.mkdtemp(prefix="s32_", dir=replay.TMP_ROOT)
    table = acid.TableLog(os.path.join(root, "table"))
    table.init(key="o_orderkey", n_buckets=8, auto_optimize=2)

    def sink(batch_df, batch_id):
        pdf = batch_df.toPandas()
        if pdf.empty:
            return
        acid.append_pandas(
            table, pdf[["o_orderkey", "o_totalprice", "version"]],
            writer=f"b{batch_id}",
        )

    replay.run_foreach_batch(spark, lambda s: s, src, sink, "append")
    assert table.version() >= 99, table.version()

    _, live = table.snapshot()
    per: dict[int, int] = {}
    for _f, b in live.items():
        per[b] = per.get(b, 0) + 1
    assert max(per.values()) <= 5, per   # 2n+1: debt repaid inline
    assert len(live) <= 8 * 5, len(live)  # vs ~800 on s25's raw path
    head = table.version()
    autos = sum(
        1 for v in range(head + 1)
        if table.read_commit(v)["writer"].endswith("#auto-optimize"))
    assert autos > 0, "auto-compaction never fired"

    cur = spark.read.parquet(*table.live_paths())
    return cur.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0))
        .cast("long").alias("n_v2"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double").alias("total"),
    )


@register(
    "s33_stream_replicate",
    oracle=CDF_VIEW_ORACLE,  # shared with s24 and the batch IVM twin
    tags=("streaming", "cdc", "replicate", "acid", "clone"),
)
def s33_stream_replicate(spark, sf_dir):
    """CONTINUOUS REPLICATION — the streaming face of
    `replicate_changes_spark`: a replica is BORN as a zero-copy shallow
    clone of the 5-version CDF demo table at its seed version, then
    TAILS the source's change feed as a stream (commit order by the
    replay mtime discipline, TWO versions folded per trigger — the s30
    catch-up knob) and applies each micro-batch through
    `apply_changes_spark`: net change per key inside the batch, one
    upsert MERGE + one key DELETE on the replica per trigger. The
    tombstone-then-purge tail proves the fold: keys tombstoned at v3
    and physically purged at v4 arrive in ONE batch and net to a plain
    delete — the replica never materializes the tombstone at all.
    Asserted: 2 micro-batches for the 4-commit history, at most 2
    replica commits per batch. The SHARED oracle certifies the
    replica's direct final aggregate equals the source's — the same
    hash s24's standing query and the batch IVM produce, closing the
    loop: one history, one oracle, three consumers (standing aggregate,
    batch view, physical replica).

    Scale shape: per trigger the replica pays O(that range's changed
    rows) in exactly the touched buckets, plus two commit links; a
    replica restarting far behind amortizes via the catch-up factor.
    """
    import shutil
    import uuid as _uuid

    from distribot_spark.sources import acid

    root = os.path.join(replay.TMP_ROOT, f"s33_{_uuid.uuid4().hex[:8]}")
    try:
        table = build_cdf_demo_table(
            spark, sf_dir, os.path.join(root, "table")
        )
        dst_path = os.path.join(root, "replica")
        acid.clone_table(table, dst_path, version=0)
        dst = acid.TableLog(dst_path)

        chunks = replay.cdf_replay_dir(
            spark, table, "o_orderkey", os.path.join(root, "cdf_chunks"),
            versions_per_trigger=2, from_version=1,
        )
        n_batches = {"n": 0}

        def sink(batch_df, batch_id):
            v0 = dst.version()
            acid.apply_changes_spark(
                spark, dst, batch_df, "o_orderkey",
                writer=f"repl-{batch_id}",
            )
            assert dst.version() - v0 <= 2, \
                "more than merge+delete per batch"
            n_batches["n"] += 1

        replay.run_foreach_batch(spark, lambda s: s, chunks, sink,
                                 "append")
        assert n_batches["n"] == 2, n_batches  # 4 commits / 2 per trig

        cur = acid.read_snapshot_spark(spark, dst, dv_key="o_orderkey")
        out = (
            cur.groupBy(
                F.pmod(F.col("o_orderkey"), F.lit(7)).cast("int")
                .alias("g"))
            .agg(
                F.count("*").cast("long").alias("cnt"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0)
                      .cast("long"))
                .cast("long").alias("total_cents"),
            )
            .orderBy("g")
        )
        rows = out.collect()  # materialize before the fixture vanishes
        return local_rows_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


#: stratified greedy dedup-on-ingest census: accept a streamed doc iff
#: it near-dups (exact Jaccard >= 0.5, the l2 spelling verbatim) no doc
#: accepted in an EARLIER stratum (seed = doc_id%4==0, then batches
#: 1,2,3). Unrolled per batch — the stream's batch order IS the
#: stratification, so no recursion is needed.
_S34_DEDUP_INGEST_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id AS doc,
                  unnest([array_to_string(w[i:i+2], ' ')
                          FOR i IN range(1, len(w) - 1)]) AS s
           FROM t),
    dd AS (SELECT DISTINCT doc, s FROM sh),
    sz AS (SELECT doc, COUNT(*) AS n FROM dd GROUP BY doc),
    pr AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS inter
           FROM dd a JOIN dd b ON a.s = b.s AND a.doc < b.doc
           GROUP BY 1, 2),
    jp AS (SELECT da, db FROM pr
           JOIN sz sa ON da = sa.doc JOIN sz sb ON db = sb.doc
           WHERE inter / (sa.n + sb.n - inter) >= 0.5),
    sym AS (SELECT da AS a, db AS b FROM jp
            UNION ALL SELECT db AS a, da AS b FROM jp),
    c1 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
    c2 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 2),
    c3 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 3),
    acc0 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 0),
    a1 AS (SELECT doc_id FROM c1 WHERE NOT EXISTS (
             SELECT 1 FROM sym JOIN acc0 ON sym.b = acc0.doc_id
             WHERE sym.a = c1.doc_id)),
    acc1 AS (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM a1),
    a2 AS (SELECT doc_id FROM c2 WHERE NOT EXISTS (
             SELECT 1 FROM sym JOIN acc1 ON sym.b = acc1.doc_id
             WHERE sym.a = c2.doc_id)),
    acc2 AS (SELECT doc_id FROM acc1 UNION ALL SELECT doc_id FROM a2),
    a3 AS (SELECT doc_id FROM c3 WHERE NOT EXISTS (
             SELECT 1 FROM sym JOIN acc2 ON sym.b = acc2.doc_id
             WHERE sym.a = c3.doc_id)),
    res AS (
      SELECT doc_id,
             CASE WHEN doc_id IN (SELECT doc_id FROM a1)
                  THEN 'accepted' ELSE 'diverted' END AS status FROM c1
      UNION ALL
      SELECT doc_id,
             CASE WHEN doc_id IN (SELECT doc_id FROM a2)
                  THEN 'accepted' ELSE 'diverted' END FROM c2
      UNION ALL
      SELECT doc_id,
             CASE WHEN doc_id IN (SELECT doc_id FROM a3)
                  THEN 'accepted' ELSE 'diverted' END FROM c3)
    SELECT doc_id, status FROM res ORDER BY doc_id
"""


@register(
    "s34_stream_dedup_ingest",
    oracle=_S34_DEDUP_INGEST_ORACLE,
    tags=("streaming", "llm", "dedup", "lsh", "index", "ingest"),
)
def s34_stream_dedup_ingest(spark, sf_dir):
    """DEDUP-ON-INGEST — the crawl loop run as a STREAM against the
    persisted MinHash/LSH index (operators/index.py): the standing
    corpus (docs ≡0 mod 4) is indexed once, then three micro-batches
    of new documents arrive; each batch is PROBED against the index
    (partition-pruned bucket scan + broadcast probe + the same exact-
    Jaccard verification l2_minhash_pairs' oracle certifies), docs
    that near-dup an ALREADY-ACCEPTED doc are diverted, and only the
    survivors are appended to the index (shard-local append — the
    standing artifacts are never rewritten). Probe-before-append makes
    the batch sequence a STRATIFICATION: a doc is judged against the
    seed plus every earlier batch's survivors, never its own batch —
    which is exactly what the unrolled per-batch oracle spells in SQL,
    so the per-doc accept/divert verdict is hash-certified end to end,
    not just counted. Scale shape per trigger: probe touches only the
    buckets the batch's shingles hash into; append writes only the
    batch's rows; the standing corpus is never re-read — the
    incremental cost a 100 TB crawl needs."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="s34_", dir=replay.TMP_ROOT)
    try:
        return _s34_body(spark, sf_dir, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _s34_body(spark, sf_dir, root):
    import shutil

    from distribot_spark.operators import index as idx

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = os.path.join(root, "lsh_index")
    idx.build_minhash_index(
        docs.filter(F.col("doc_id") % 4 == 0), index_dir,
        id_col="doc_id",
    )

    chunks = os.path.join(root, "chunks")
    os.makedirs(chunks, exist_ok=True)
    for i, m in enumerate((1, 2, 3)):
        tmp = os.path.join(root, f"_c{i}")
        (docs.filter(F.col("doc_id") % 4 == m).repartition(1)
         .write.mode("overwrite").parquet(tmp))
        part = next(p for p in sorted(os.listdir(tmp))
                    if p.endswith(".parquet"))
        os.rename(os.path.join(tmp, part),
                  os.path.join(chunks, f"chunk_{i:04d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
    replay._stamp_replay_order(chunks)  # batch order IS the strata

    verdicts: list[tuple[int, str]] = []

    def sink(batch_df, batch_id):
        pairs = idx.probe_minhash_index(
            spark, index_dir, batch_df, id_col="doc_id", threshold=0.5)
        hit = (
            pairs.select(F.col("da").alias("doc_id"))
            .unionByName(pairs.select(F.col("db").alias("doc_id")))
            .distinct()
        )
        ids = batch_df.select("doc_id")
        div = {r.doc_id for r in
               ids.join(hit, "doc_id", "left_semi").collect()}
        acc = {r.doc_id for r in
               ids.join(hit, "doc_id", "left_anti").collect()}
        survivors = batch_df.filter(F.col("doc_id").isin(list(acc)))
        if acc:
            idx.append_minhash_shard(
                spark, index_dir, survivors, id_col="doc_id")
        verdicts.extend((int(d), "diverted") for d in div)
        verdicts.extend((int(d), "accepted") for d in acc)

    replay.run_foreach_batch(spark, lambda s: s, chunks, sink, "append")
    return local_rows_df(spark, 
        sorted(verdicts), "doc_id long, status string"
    ).orderBy("doc_id")


@register(
    "s34_stream_policy_cdf",
    oracle="""
    WITH src AS (
      SELECT c_custkey,
             '555-' || CAST(c_custkey % 10000 AS VARCHAR) AS phone,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
             c_mktsegment
      FROM customer),
    gov AS (
      SELECT '****' || right(phone, 4) AS phone_mask,
             bal_cents - ((bal_cents % 100000) + 100000) % 100000
               AS bal_bucket,
             c_mktsegment
      FROM src
      WHERE c_mktsegment IS NOT NULL
        AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY'))
    SELECT c_mktsegment, COUNT(*) AS cnt,
           CAST(SUM(bal_bucket) AS BIGINT) AS total_bucket,
           MIN(phone_mask) AS first_phone
    FROM gov GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("streaming", "cdc", "acid", "governance", "policies"),
)
def s34_stream_policy_cdf(spark, sf_dir):
    """GOVERNED CHANGE FEED AS A STREAM — the policy-enforcement twin
    of s24: a consumer tails an ACID table's CDF, but through the
    POLICY layer (`table_changes_policy_spark` via `cdf_replay_dir`'s
    ``changes_fn`` hook), so each micro-batch carries only what the
    consumer's role may see — phones masked to last-4, balances
    bucketed to $1000 floors, and rows outside the role's three market
    segments never entering the stream at all. Without this, the
    change feed is the leak around masking (it replays exactly the
    sensitive columns' images to any subscriber). Customers arrive as
    three append commits (custkey % 3 slices → 3 micro-batches), the
    standing query maintains a per-segment census over the MASKED
    values (integer bucket sums — order/batch-independent), and the
    oracle recomputes the same census from the raw table with the mask
    DSL spelled in SQL: streaming-governed ≡ batch-governed, exactly.
    Scale shape: enforcement is ordinary Catalyst expressions inside
    the per-version feed job — no second scan, no per-role stream
    copies; state stays one row per (segment)."""
    import shutil
    import uuid as _uuid

    from distribot_spark.sources import (
        TableLog,
        alter_set_mask,
        alter_set_row_filter,
        append_spark,
        table_changes_policy_spark,
        write_initial_spark,
    )

    root = os.path.join(replay.TMP_ROOT, f"s34_{_uuid.uuid4().hex[:8]}")
    table = TableLog(os.path.join(root, "table"))
    table.init(key="c_custkey", n_buckets=8)
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.lit("555-"),
                 (F.col("c_custkey") % 10000).cast("string")).alias("phone"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
        "c_mktsegment",
    )
    write_initial_spark(
        spark, table, base.filter(F.col("c_custkey") % 3 == 0),
        "c_custkey", n_buckets=8)
    for rest in (1, 2):
        append_spark(
            spark, table, base.filter(F.col("c_custkey") % 3 == rest),
            "c_custkey", 8)
    alter_set_mask(table, "phone", {"fn": "partial", "keep_last": 4})
    alter_set_mask(table, "bal_cents", {"fn": "bucket", "width": 100000})
    alter_set_row_filter(table, "segments", {
        "col": "c_mktsegment", "not_null": True,
        "isin": ["BUILDING", "AUTOMOBILE", "MACHINERY"],
    })

    def governed(sp, t, k, lo, hi):
        return table_changes_policy_spark(
            sp, t, role=None, key=k, from_version=lo, to_version=hi)

    chunks = replay.cdf_replay_dir(
        spark, table, "c_custkey", os.path.join(root, "cdf_chunks"),
        versions_per_trigger=1, changes_fn=governed,
    )

    def t(stream):
        return (
            stream.filter(F.col("_change_type") == "insert")
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("cnt"),
                F.sum("bal_cents").alias("total_bucket"),
                F.min("phone").alias("first_phone"),
            )
        )

    updates = replay.run_bounded(spark, t, chunks, "update")
    out = (
        updates.groupBy("c_mktsegment")
        .agg(
            F.max("cnt").cast("long").alias("cnt"),
            F.max_by("total_bucket", "cnt").cast("long")
            .alias("total_bucket"),
            F.max_by("first_phone", "cnt").alias("first_phone"),
        )
        .orderBy("c_mktsegment")
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "s36_stream_matview_join",
    oracle=JOIN_MATVIEW_ORACLE_SUMS,
    tags=("streaming", "cdc", "matview", "acid", "ivm", "join"),
)
def s36_stream_matview_join(spark, sf_dir):
    """STREAMING JOIN-IVM — the continuous face of
    `refresh_join_matview`: a fact⋈dim view tails BOTH tables' change
    feeds (two CDF replay sources, one commit version per trigger) and
    folds each micro-batch through `apply_join_matview_changes` —
    each batch a sequenced delta-join step against the OTHER side
    pinned at its current cursor, exact under any interleaving. The
    interleaving is real: fact versions 1-2 stream first, then dim 1,
    then fact 3-4, then dim 2-3 — so fact batches run against dim
    cursors both before and after the dim's mass group move, and the
    final state must STILL equal the batch twin's oracle
    (JOIN_MATVIEW_ORACLE_SUMS — the same workload SQL,
    count/sum slice: min/max need the pinned joined-snapshot recompute
    the batch path runs). Redelivery is pinned in-stream on the fact
    feed (batch 0 applied twice → skipped; per-side high-water
    marks). Scale shape per trigger: a fact batch joins ΔF against
    the dim snapshot (broadcast-size by design); a dim batch pays the
    facts its delta's keys actually touch (broadcast semi-join
    prune), never the fact table."""
    import shutil
    import uuid as _uuid

    from distribot_spark.queries.cdf_shared import (
        apply_join_matview_workload,
        seed_join_matview_tables,
    )
    from distribot_spark.sources import TableLog
    from distribot_spark.sources.matview import (
        apply_join_matview_changes,
        create_join_matview,
        read_matview,
    )

    root = os.path.join(replay.TMP_ROOT, f"s36_{_uuid.uuid4().hex[:8]}")
    try:
        fact, dim = seed_join_matview_tables(
            spark, sf_dir, os.path.join(root, "t"))
        view = TableLog(os.path.join(root, "view"))
        create_join_matview(spark, fact, dim, view, {
            "join": {"fact_fk": "fk", "dim_key": "dk"},
            "group_by": ["seg"],
            "aggs": {"cnt": {"fn": "count"},
                     "total": {"fn": "sum", "col": "cents"}},
        }, n_buckets=4)
        apply_join_matview_workload(spark, sf_dir, fact, dim)
        seen = {"skipped": 0}

        def drive(table, key, side, frm, to, writer, redeliver=False):
            chunks = replay.cdf_replay_dir(
                spark, table, key,
                os.path.join(root, f"cdf_{writer}"),
                versions_per_trigger=1, from_version=frm,
                to_version=to)

            def sink(batch_df, batch_id):
                st = apply_join_matview_changes(
                    spark, view, batch_df, side, batch_id=batch_id,
                    writer=writer, fact=fact, dim=dim)
                assert not st["skipped"], (writer, batch_id, st)
                if redeliver and batch_id == 0:
                    st2 = apply_join_matview_changes(
                        spark, view, batch_df, side,
                        batch_id=batch_id, writer=writer,
                        fact=fact, dim=dim)
                    assert st2["skipped"], st2
                    seen["skipped"] += 1

            replay.run_foreach_batch(spark, lambda s: s, chunks, sink,
                                     "append")

        drive(fact, "o_orderkey", "fact", 1, 2, "s36f1",
              redeliver=True)
        drive(dim, "dk", "dim", 1, 1, "s36d1")
        drive(fact, "o_orderkey", "fact", 3, 4, "s36f2")
        drive(dim, "dk", "dim", 2, 3, "s36d2")
        assert seen["skipped"] == 1, seen

        v = read_matview(spark, view)
        out = v.select(
            "seg",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("total").cast("long").alias("sum_cents"),
        ).orderBy("seg")
        rows = out.collect()
        return local_rows_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "s35_stream_matview",
    oracle=MATVIEW_ORACLE_SUMS,  # the batch twin's CTE, sum/count slice
    tags=("streaming", "cdc", "matview", "acid", "ivm"),
)
def s35_stream_matview(spark, sf_dir):
    """STREAMING MATERIALIZED VIEW — the continuous face of
    `refresh_matview`: the view is created at the base's seed version,
    then TAILS the change feed (CDF replay source, one commit version
    per trigger) and folds each micro-batch through
    `apply_matview_changes` inside a foreachBatch sink. Exactly the
    shared batch workload (cdf_shared.apply_matview_workload: insert
    MERGE, update MERGE with a group move, DV DELETE), so the oracle is
    the batch twin's SQL restricted to the self-maintaining aggregates
    (count/sum/avg — min/max need the pinned-version recompute the
    batch path runs; the streaming apply refuses them by design when a
    group loses rows). Redelivery is pinned IN the stream: batch 0 is
    applied twice and the second apply must report skipped=True (the
    batch-id high-water mark + pending-token recovery = the s23
    effectively-once discipline; a double-fold here would double-count
    every seed group, which the hash oracle would catch). Scale shape:
    per trigger the view pays O(changed rows) in the delta fold plus
    one MERGE into exactly the touched view buckets; the stream never
    re-reads the base."""
    import shutil
    import uuid as _uuid

    from distribot_spark.sources import (
        TableLog,
        apply_matview_changes,
        create_matview,
        read_matview,
    )

    root = os.path.join(replay.TMP_ROOT, f"s35_{_uuid.uuid4().hex[:8]}")
    try:
        base = seed_matview_base(spark, sf_dir,
                                 os.path.join(root, "base"))
        view = TableLog(os.path.join(root, "view"))
        create_matview(spark, base, view, {
            "group_by": ["o_orderpriority"],
            "aggs": {
                "cnt": {"fn": "count"},
                "total": {"fn": "sum", "col": "cents"},
            },
        }, n_buckets=4)
        apply_matview_workload(spark, sf_dir, base)

        chunks = replay.cdf_replay_dir(
            spark, base, "o_orderkey", os.path.join(root, "cdf_chunks"),
            versions_per_trigger=1, from_version=1,
        )
        seen = {"n": 0, "skipped": 0}

        def sink(batch_df, batch_id):
            st = apply_matview_changes(spark, view, batch_df,
                                       batch_id=batch_id, writer="s35")
            assert not st["skipped"], (batch_id, st)
            if batch_id == 0:  # forced redelivery: must no-op
                st2 = apply_matview_changes(
                    spark, view, batch_df, batch_id=batch_id,
                    writer="s35")
                assert st2["skipped"], st2
                seen["skipped"] += 1
            seen["n"] += 1

        replay.run_foreach_batch(spark, lambda s: s, chunks, sink,
                                 "append")
        assert seen["n"] == 3 and seen["skipped"] == 1, seen

        v = read_matview(spark, view)
        out = v.select(
            F.col("o_orderpriority").alias("pri"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("total").cast("long").alias("sum_cents"),
            F.expr("CAST(CAST(total AS BIGINT) DIV cnt AS BIGINT)")
            .alias("avg_cents"),
        ).orderBy("pri")
        rows = out.collect()  # materialize before the fixture vanishes
        return local_rows_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "s37_stream_matview_minmax",
    oracle=MATVIEW_ORACLE_FULL,  # the batch twin's FULL oracle —
    # min/max included, which s35 had to omit
    tags=("streaming", "cdc", "matview", "acid", "ivm", "rider"),
)
def s37_stream_matview_minmax(spark, sf_dir):
    """STREAMING MIN/MAX MATVIEW WITHOUT A BASE HANDLE (VERDICT r7
    task 6): same shared workload and stream plumbing as s35, but the
    spec carries min/max of cents under a BOUNDED RIDER
    (``rider_k=64``: each group stores its 64 smallest and largest
    live values as exact sorted prefixes, sources/matview.py
    `_rider_fold_sql`) and `apply_matview_changes` runs with NO
    ``base=`` — the stream never holds a handle to, or re-reads, the
    base table. The workload's row-losing batches (the update MERGE's
    pre-images, the DV DELETE of every 7th key) evict tracked extremes
    well inside the rider depth, so every fold stays self-maintaining:
    the query asserts ``dirty_recomputed == 0`` on every batch, then
    certifies the FULL aggregate row — min and max included — against
    the batch oracle. This is the contract a fan-out deployment needs:
    view maintainers subscribe to the change feed alone (no base-table
    read permission, no pinned-version scans), and only a genuine
    K-deep eviction run would force a fallback to the base-pinned
    path. Riders cost O(K) per group in the view and O(batch) in the
    fold — nothing scales with the base."""
    import shutil
    import uuid as _uuid

    from distribot_spark.sources import (
        TableLog,
        apply_matview_changes,
        create_matview,
        read_matview,
    )

    root = os.path.join(replay.TMP_ROOT, f"s37_{_uuid.uuid4().hex[:8]}")
    try:
        base = seed_matview_base(spark, sf_dir,
                                 os.path.join(root, "base"))
        view = TableLog(os.path.join(root, "view"))
        create_matview(spark, base, view, {
            "group_by": ["o_orderpriority"],
            "aggs": {
                "cnt": {"fn": "count"},
                "total": {"fn": "sum", "col": "cents"},
                "lo": {"fn": "min", "col": "cents"},
                "hi": {"fn": "max", "col": "cents"},
            },
            "rider_k": 64,
        }, n_buckets=4)
        apply_matview_workload(spark, sf_dir, base)

        chunks = replay.cdf_replay_dir(
            spark, base, "o_orderkey", os.path.join(root, "cdf_chunks"),
            versions_per_trigger=1, from_version=1,
        )
        seen = {"n": 0}

        def sink(batch_df, batch_id):
            st = apply_matview_changes(spark, view, batch_df,
                                       batch_id=batch_id, writer="s37")
            # no base handle anywhere: the rider alone must absorb the
            # workload's evictions
            assert not st["skipped"], (batch_id, st)
            assert st["dirty_recomputed"] == 0, (batch_id, st)
            seen["n"] += 1

        replay.run_foreach_batch(spark, lambda s: s, chunks, sink,
                                 "append")
        assert seen["n"] == 3, seen

        v = read_matview(spark, view)
        out = v.select(
            F.col("o_orderpriority").alias("pri"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("total").cast("long").alias("sum_cents"),
            F.col("lo").cast("long").alias("lo_cents"),
            F.col("hi").cast("long").alias("hi_cents"),
            F.expr("CAST(CAST(total AS BIGINT) DIV cnt AS BIGINT)")
            .alias("avg_cents"),
        ).orderBy("pri")
        rows = out.collect()  # materialize before the fixture vanishes
        return local_rows_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "s38_stream_txn_sink",
    oracle="""
        SELECT c.c_mktsegment AS seg, COUNT(*) AS cnt,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY seg
    """,
    tags=("streaming", "sink", "acid", "txn", "multi-table"),
)
def s38_stream_txn_sink(spark, sf_dir):
    """STREAMING MULTI-TABLE ATOMIC SINK — the continuous face of
    `commit_together`: each micro-batch carries a FACT slice (orders)
    AND the DIM rows it references (customers of the same custkey
    wave), and the foreachBatch sink lands the pair as ONE cross-log
    transaction (sources/txn.py), so no reader at any trigger boundary
    ever observes a fact whose dimension hasn't arrived — the sink
    asserts the no-dangling invariant (fact anti-join dim == 0) after
    every batch, which a non-atomic two-append sink cannot guarantee
    even with the writes adjacent. EFFECTIVELY-ONCE under redelivery
    (every batch is deliberately applied twice, the s23 worst case):
    the txn commit's writer string embeds the batch id, so a
    redelivered batch probes the fact log for its own tag and skips
    before staging — the commit log itself is the high-water mark, no
    side state to desync from it. Scale shape: per trigger the sink
    pays two bucketed appends (adds-only staging) + two conditional
    PUTs + two version links; the probe scans only commits since the
    stream's floor."""
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from distribot_spark.sources import (
        TableLog,
        commit_together,
        read_snapshot_spark,
        stage_append_spark,
    )

    root = os.path.join(replay.TMP_ROOT, f"s38_{_uuid.uuid4().hex[:8]}")
    try:
        chunks = os.path.join(root, "chunks")
        os.makedirs(chunks, exist_ok=True)
        orders = load_table(spark, sf_dir, "orders").select(
            F.lit("f").alias("kind"), F.col("o_orderkey").alias("k1"),
            F.col("o_custkey").alias("k2"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("cents"), F.lit(None).cast("string").alias("seg"),
            (F.col("o_custkey") % 3).alias("wave"))
        cust = load_table(spark, sf_dir, "customer").select(
            F.lit("d").alias("kind"), F.col("c_custkey").alias("k1"),
            F.lit(None).cast("long").alias("k2"),
            F.lit(None).cast("long").alias("cents"),
            F.col("c_mktsegment").alias("seg"),
            (F.col("c_custkey") % 3).alias("wave"))
        both = orders.unionByName(cust)
        for w in range(3):
            pdf = (both.filter(F.col("wave") == w).drop("wave")
                   .orderBy("kind", "k1").toPandas())
            _pq.write_table(_pa.Table.from_pandas(pdf),
                            os.path.join(chunks, f"chunk_{w:04d}.parquet"))
        replay._stamp_replay_order(chunks)

        fact = TableLog(os.path.join(root, "fact"))
        dim = TableLog(os.path.join(root, "dim"))
        fact.init()
        dim.init()
        seen = {"applied": 0, "skipped": 0}
        floor = fact.version()  # probe only commits this stream landed

        def landed(batch_id):
            tag = f"s38b{batch_id}:"
            return any(
                fact.read_commit(v).get("writer", "").startswith(tag)
                for v in range(floor + 1, fact.version() + 1))

        def apply_once(batch_df, batch_id):
            if landed(batch_id):  # redelivery: the log IS the hwm
                seen["skipped"] += 1
                return
            # nullable longs came through the pandas chunk writer as
            # float64 (Arrow's int-with-nulls coercion): cast back so
            # the tables store exact int64 and the SUM stays integer
            f_rows = (batch_df.filter(F.col("kind") == "f")
                      .select(F.col("k1").alias("o_orderkey"),
                              F.col("k2").cast("long").alias("fk"),
                              F.col("cents").cast("long")
                              .alias("cents")))
            d_rows = (batch_df.filter(F.col("kind") == "d")
                      .select(F.col("k1").alias("dk"), "seg"))
            staged = [
                stage_append_spark(spark, fact, f_rows,
                                   key="o_orderkey", n_buckets=8,
                                   writer=f"s38b{batch_id}"),
                stage_append_spark(spark, dim, d_rows, key="dk",
                                   n_buckets=4,
                                   writer=f"s38b{batch_id}"),
            ]
            commit_together(staged)
            seen["applied"] += 1

        def sink(batch_df, batch_id):
            for _ in range(2):  # injected redelivery, the s23 worst case
                apply_once(batch_df, batch_id)
            # the atomic-pair invariant a two-append sink cannot give:
            # no fact without its dim at ANY trigger boundary
            f = read_snapshot_spark(spark, fact)
            d = read_snapshot_spark(spark, dim)
            n_dangling = f.join(d, f["fk"] == d["dk"], "left_anti").count()
            assert n_dangling == 0, (batch_id, n_dangling)

        replay.run_foreach_batch(spark, lambda s: s, chunks, sink,
                                 "append")
        assert seen["applied"] == 3 and seen["skipped"] == 3, seen

        f = read_snapshot_spark(spark, fact).alias("f")
        d = read_snapshot_spark(spark, dim).alias("d")
        out = (f.join(d, F.col("f.fk") == F.col("d.dk"), "inner")
               .groupBy("seg")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum("cents").cast("long").alias("sum_cents"))
               .orderBy("seg"))
        rows = out.collect()  # materialize before the fixture vanishes
        return local_rows_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "s39_stream_txn_merge_sink",
    oracle="""
        SELECT c.c_mktsegment AS seg, COUNT(*) AS cnt,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                        + CASE WHEN o.o_orderkey % 5 = 0
                               THEN 1111 ELSE 0 END) AS BIGINT)
                 AS sum_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY seg
    """,
    tags=("streaming", "sink", "acid", "txn", "multi-table", "merge"),
)
def s39_stream_txn_merge_sink(spark, sf_dir):
    """STREAMING ATOMIC UPSERT SINK — the continuous face of the MERGE
    participant (sources/txn.py `stage_merge_spark`, the s38 pattern
    upgraded from adds-only to corrections): each micro-batch carries
    a wave of fact CORRECTIONS (+1111 cents on the %5==0 keys) and the
    dim rows arriving with it, and the foreachBatch sink lands the
    pair as ONE cross-log transaction — an upsert is never visible
    without its wave's dimension arrivals. EFFECTIVELY-ONCE is the
    hard part a non-idempotent upsert adds over s38: a redelivered
    batch would apply +1111 TWICE, so the sink probes the fact log for
    its own batch tag before staging (the commit log is the high-water
    mark — no side state) and every batch is deliberately delivered
    twice to prove the skip. Per-trigger cost: one touched-bucket
    Spark rewrite + one bucketed dim append + two conditional PUTs +
    two links; the final fact⋈dim aggregate shares
    source_acid_txn_merge's oracle — wrong on any doubled, lost, or
    torn correction."""
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from distribot_spark.sources import (
        TableLog,
        commit_together,
        read_snapshot_spark,
        stage_append_spark,
        stage_merge_spark,
        write_initial_spark,
    )

    root = os.path.join(replay.TMP_ROOT, f"s39_{_uuid.uuid4().hex[:8]}")
    try:
        chunks = os.path.join(root, "chunks")
        os.makedirs(chunks, exist_ok=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", F.col("o_custkey").alias("fk"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("cents"))
        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("dk"),
            F.col("c_mktsegment").alias("seg"))
        # the correction stream: wave w carries the %5==0 fact keys of
        # residue w (already corrected) + the odd dim rows of residue w
        corr = (orders.filter(F.col("o_orderkey") % 5 == 0)
                .withColumn("cents", F.col("cents") + 1111)
                .select(F.lit("f").alias("kind"),
                        F.col("o_orderkey").alias("k1"),
                        F.col("fk").alias("k2"), "cents",
                        F.lit(None).cast("string").alias("seg"),
                        (F.col("o_orderkey") % 3).alias("wave")))
        dstream = (cust.filter(F.col("dk") % 2 == 1)
                   .select(F.lit("d").alias("kind"),
                           F.col("dk").alias("k1"),
                           F.lit(None).cast("long").alias("k2"),
                           F.lit(None).cast("long").alias("cents"),
                           "seg", (F.col("dk") % 3).alias("wave")))
        both = corr.unionByName(dstream)
        for w in range(3):
            pdf = (both.filter(F.col("wave") == w).drop("wave")
                   .orderBy("kind", "k1").toPandas())
            _pq.write_table(_pa.Table.from_pandas(pdf),
                            os.path.join(chunks, f"chunk_{w:04d}.parquet"))
        replay._stamp_replay_order(chunks)

        fact = TableLog(os.path.join(root, "fact"))
        dim = TableLog(os.path.join(root, "dim"))
        write_initial_spark(spark, fact, orders, "o_orderkey",
                            n_buckets=8)
        write_initial_spark(spark, dim,
                            cust.filter(F.col("dk") % 2 == 0),
                            "dk", n_buckets=4)
        seen = {"applied": 0, "skipped": 0}
        floor = fact.version()
        expect = {"fact": fact.version(), "dim": dim.version()}

        def landed(batch_id):
            tag = f"s39b{batch_id}:"
            return any(
                fact.read_commit(v).get("writer", "").startswith(tag)
                for v in range(floor + 1, fact.version() + 1))

        def apply_once(batch_df, batch_id):
            if landed(batch_id):  # redelivered upsert MUST skip: the
                seen["skipped"] += 1  # +1111 is not idempotent
                return
            f_rows = (batch_df.filter(F.col("kind") == "f")
                      .select(F.col("k1").alias("o_orderkey"),
                              F.col("k2").cast("long").alias("fk"),
                              F.col("cents").cast("long")
                              .alias("cents")))
            d_rows = (batch_df.filter(F.col("kind") == "d")
                      .select(F.col("k1").alias("dk"), "seg"))
            staged = [
                stage_merge_spark(spark, fact, f_rows,
                                  writer=f"s39b{batch_id}"),
                stage_append_spark(spark, dim, d_rows, writer=f"s39b{batch_id}"),
            ]
            commit_together(staged)
            seen["applied"] += 1
            expect["fact"] += 1
            expect["dim"] += 1

        def sink(batch_df, batch_id):
            for _ in range(2):  # injected redelivery, the s23 worst case
                apply_once(batch_df, batch_id)
            # atomic at every trigger boundary: the two logs moved in
            # LOCKSTEP — a torn pair would leave one behind
            assert (fact.version(), dim.version()) == (
                expect["fact"], expect["dim"]), (batch_id, expect)

        replay.run_foreach_batch(spark, lambda s: s, chunks, sink,
                                 "append")
        assert seen["applied"] == 3 and seen["skipped"] == 3, seen

        f = read_snapshot_spark(spark, fact).alias("f")
        d = read_snapshot_spark(spark, dim).alias("d")
        out = (f.join(d, F.col("f.fk") == F.col("d.dk"), "inner")
               .groupBy("seg")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum("cents").cast("long").alias("sum_cents"))
               .orderBy("seg"))
        rows = out.collect()  # materialize before the fixture vanishes
        return local_rows_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
