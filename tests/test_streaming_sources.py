"""Pluggable streaming sources: the same query code runs over bounded
file replay and an unbounded rate source (reference Connector seam,
lib/distribot/connector.rb:56-138 — consumers don't know the transport).
"""

import pyspark.sql.functions as F
import pytest

from distribot_spark.queries.streaming import _hourly_agg
from distribot_spark.streaming import FileReplaySource, RateEventsSource, replay

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_file_replay_source_adapter_matches_path_route(spark):
    """S1 via an explicit FileReplaySource ≡ S1 via the directory path."""
    src_dir = replay.replay_dir(SF)
    via_path = replay.run_bounded(spark, _hourly_agg, src_dir, "complete")
    via_source = replay.run_bounded(
        spark, _hourly_agg, FileReplaySource(src_dir), "complete"
    )
    assert _rows(via_path) == _rows(via_source)


def test_rate_source_live_hourly_agg(spark):
    """S1's aggregation over the UNBOUNDED rate source: drive live until
    ≥3 micro-batches of data are aggregated, stop, then verify the sink
    equals the batch recompute of exactly the first K synthetic rows —
    determinism-by-construction (row content is a pure function of the
    row counter, only K varies with timing)."""
    source = RateEventsSource(rows_per_batch=200, num_partitions=2)

    result = replay.run_live(
        spark,
        _hourly_agg,
        source,
        "complete",
        until=lambda df: (df.agg(F.sum("cnt")).collect()[0][0] or 0) >= 600,
        timeout_sec=120,
    )
    k = result.agg(F.sum("cnt")).collect()[0][0]
    assert k >= 600 and k % source.rows_per_batch == 0, (
        "complete-mode sink must reflect whole committed micro-batches"
    )
    expected = _hourly_agg(source.batch_expected(spark, int(k)))
    assert _rows(result) == _rows(expected)


def test_rate_source_unbounded_rejected_by_run_bounded(spark):
    with pytest.raises(ValueError, match="bounded"):
        replay.run_bounded(spark, _hourly_agg, RateEventsSource(), "complete")


def test_socket_source_live_agg(spark):
    """S1's aggregation over a real TCP transport: a local server feeds
    JSON lines, the query aggregates them live, and the stopped sink must
    equal the batch aggregate of exactly the lines sent."""
    import json
    import socket
    import threading

    from distribot_spark.streaming.sources import SocketJsonSource

    lines = [
        {"ts": f"2024-01-01 {h:02d}:{m:02d}:00", "event_type": et, "value": v}
        for h in (0, 1)
        for m, et, v in [(0, "click", 1.5), (15, "view", 2.0),
                         (30, "click", 0.25), (45, "view", 4.0)]
    ]

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = server.accept()
        with conn:
            payload = "".join(json.dumps(ln) + "\n" for ln in lines)
            conn.sendall(payload.encode())
            stop.wait(60)  # keep the connection open until the test ends

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        source = SocketJsonSource(
            "127.0.0.1", port,
            "ts timestamp, event_type string, value double",
        )
        result = replay.run_live(
            spark, _hourly_agg, source, "complete",
            until=lambda df: (df.agg(F.sum("cnt")).collect()[0][0] or 0)
            >= len(lines),
            timeout_sec=60,
        )
    finally:
        stop.set()
        server.close()

    rows = {(r.window_start, r.event_type): (r.cnt, r.sum_value)
            for r in result.collect()}
    assert rows[("2024-01-01 00:00:00", "click")] == (2, 1.75)
    assert rows[("2024-01-01 01:00:00", "view")] == (2, 6.0)
    assert len(rows) == 4


def test_streaming_restart_recovers_from_checkpoint(spark, tmp_path):
    """Kill a streaming query mid-replay, restart it on the SAME
    checkpoint: the source offsets resume (no chunk is re-read from
    scratch, no chunk is skipped) and the final complete-mode aggregate
    equals the batch answer — the crash-recovery contract that makes a
    standing query trustworthy. The foreachBatch sink writes each batch
    to batch=<id> with overwrite, the idempotent pattern that makes the
    one possibly-replayed post-crash batch harmless."""
    import glob
    import os
    import time

    src = replay.replay_dir("/root/testdata/sf0.001")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = spark.read.parquet(src).schema

    def agg(stream):
        return stream.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )

    def sink_fn(bdf, bid):
        bdf.write.mode("overwrite").parquet(f"{sink}/batch={bid}")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            agg(stream)
            .writeStream.foreachBatch(sink_fn)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )

    n_chunks = len(glob.glob(src + "/*.parquet"))
    q = start()
    deadline = time.time() + 60
    while len(glob.glob(sink + "/batch=*")) < 2 and time.time() < deadline:
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()
    seen_before = len(glob.glob(sink + "/batch=*"))
    assert seen_before >= 1, "first run made no progress"

    q2 = start()  # same checkpoint: resumes from committed offsets
    q2.awaitTermination()
    batch_dirs = sorted(
        glob.glob(sink + "/batch=*"),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    # batch ids continue monotonically across the restart (offsets
    # resumed, not reset) and every chunk was processed exactly once
    final = spark.read.parquet(batch_dirs[-1])
    expect = agg(spark.read.parquet(src))
    got = {(r.event_type): (r.n, r.cents) for r in final.collect()}
    want = {(r.event_type): (r.n, r.cents) for r in expect.collect()}
    assert got == want, "post-restart aggregate diverges from batch answer"
    assert sum(r.n for r in final.collect()) == spark.read.parquet(src).count()


def test_stateful_restart_recovers_state_store(spark, tmp_path):
    """The STATEFUL twin of the checkpoint-recovery test: an
    applyInPandasWithState aggregation killed mid-replay must restore
    its per-key (n, Σcents, Σcents²) from the state store on restart
    and finish with EXACTLY the batch answer — integer state makes the
    equality bit-for-bit, so silent state loss (restart-from-zero)
    or double-replay (state applied twice) are both detectable."""
    import glob
    import os
    import time

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = replay.replay_dir("/root/testdata/sf0.001")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = spark.read.parquet(src).schema

    def update(key, pdfs, state):
        n, s1, s2 = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            cents = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype(
                "int64"
            )
            n += len(cents)
            s1 += int(cents.sum())
            s2 += int((cents * cents).sum())
        state.update((n, s1, s2))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "s1": [s1], "s2": [s2]}
        )

    def sink_fn(bdf, bid):
        bdf.write.mode("overwrite").parquet(f"{sink}/batch={bid}")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stream.groupBy("event_type").applyInPandasWithState(
            update,
            "event_type string, n long, s1 long, s2 long",
            "n long, s1 long, s2 long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
        return (
            out.writeStream.foreachBatch(sink_fn)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while len(glob.glob(sink + "/batch=*")) < 2 and time.time() < deadline:
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()
    assert glob.glob(sink + "/batch=*"), "first run made no progress"

    q2 = start()
    q2.awaitTermination()

    # fold the update stream: last emitted row per key wins (n monotone)
    updates = spark.read.option("basePath", sink).parquet(sink + "/batch=*")
    final = updates.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max_by("s1", "n").alias("s1"),
        F.max_by("s2", "n").alias("s2"),
    )
    batch = (
        spark.read.parquet(src)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .alias("s1"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                * F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("s2"),
        )
    )
    got = {r.event_type: (r.n, r.s1, r.s2) for r in final.collect()}
    want = {r.event_type: (r.n, r.s1, r.s2) for r in batch.collect()}
    assert got == want, f"state diverged after restart: {got} != {want}"


# ---------------------------------------------------------------------------
# Broker-shaped source: offset commits, crash, redelivery (connector.rb:56-73)

import json as _json
import os as _os

from distribot_spark.streaming import broker as B


@pytest.fixture(scope="module")
def broker_src():
    root = _os.path.join(replay.TMP_ROOT, "broker", _os.path.basename(SF))
    log = B.events_broker_log(SF, root)
    return log, B.BrokerReplaySource(log, max_files_per_trigger=2)


def test_broker_log_offsets_dense_and_keyed(broker_src):
    """The broker side honors Kafka's contract: dense per-partition
    offsets from 0, keyed partitioning (partition = key mod N), and
    per-partition ts order (offsets assigned in delivery order)."""
    log, _ = broker_src
    recs = log.records()
    parts = recs["partition"].to_pylist()
    offsets = recs["offset"].to_pylist()
    keys = recs["key"].to_pylist()
    ts = recs["ts"].to_pylist()
    by_part = {}
    for p, o, k, t in zip(parts, offsets, keys, ts):
        assert int(k) % log.n_partitions == p, "keyed partitioning"
        by_part.setdefault(p, []).append((o, t))
    for p, rows in by_part.items():
        rows.sort()
        assert [o for o, _ in rows] == list(range(len(rows))), "dense offsets"
        assert [t for _, t in rows] == sorted(t for _, t in rows), (
            "per-partition offsets follow time order"
        )
    assert log.end_offsets() == {p: len(rows) for p, rows in by_part.items()}


def test_broker_commit_ledger_monotone_and_lagging(broker_src):
    """Offset commits are monotone per partition, and session 1's LAST
    commit strictly precedes its delivery frontier (the crash window is
    non-empty — there is something to redeliver)."""
    log, src = broker_src
    ledger = src.ledger()
    assert any(e["session"] == 1 for e in ledger)
    assert any(e["session"] == 2 for e in ledger)
    last: dict[str, int] = {}
    for e in ledger:
        for p, o in e["offsets"].items():
            assert o >= last.get(p, 0), "committed offsets never move backward"
            last[p] = o
    # final commit == the log's end offsets (everything acknowledged)
    assert {int(p): o for p, o in ledger[-1]["offsets"].items()} == log.end_offsets()


def test_broker_redelivery_window_is_exactly_the_uncommitted_tail(broker_src):
    """The redelivered records are PRECISELY session 1's
    processed-but-uncommitted tail: at-least-once, with the duplicate set
    fully characterized by the commit ledger."""
    log, src = broker_src
    session1_commits = [e for e in src.ledger() if e["session"] == 1]
    committed = {int(p): o for p, o in session1_commits[-1]["offsets"].items()}

    redelivered = src.redelivered()
    assert redelivered, "the injected crash must produce redelivery"
    for p, o in redelivered:
        assert o >= committed.get(p, 0), (
            "nothing at-or-before the last commit may redeliver"
        )

    n_log = log.records().num_rows
    delivered = src.delivered()
    # every record delivered at least once; duplicates == redelivered set
    pairs = list(zip(delivered["partition"].to_pylist(),
                     delivered["offset"].to_pylist()))
    assert len(set(pairs)) == n_log
    assert len(pairs) == n_log + len(redelivered)


def test_broker_consumer_dedup_restores_exactly_once(spark, broker_src):
    """End-to-end through the Spark file-stream replay: without dedup the
    sink shows the duplicates; with (partition, offset) dedup the sink is
    exactly the log — the s19 oracle semantics, asserted structurally."""
    log, src = broker_src
    raw = replay.run_bounded(
        spark, lambda s: s.select("partition", "offset"), src, "append"
    )
    n_log = log.records().num_rows
    assert raw.count() == n_log + len(src.redelivered())

    deduped = replay.run_bounded(
        spark,
        lambda s: s.withWatermark("ts", "720 hours")
        .dropDuplicatesWithinWatermark(["partition", "offset"])
        .select("partition", "offset"),
        src,
        "append",
    )
    assert deduped.count() == n_log
    assert deduped.distinct().count() == n_log


# ---------------------------------------------------------------------------
# transformWithStateInPandas canary (S6's Spark-4 primitive)

import importlib.util

_PROTOBUF_OK = importlib.util.find_spec("google") is not None and (
    importlib.util.find_spec("google.protobuf") is not None
)


@pytest.mark.skipif(
    not _PROTOBUF_OK,
    reason="transformWithStateInPandas needs google.protobuf, missing in "
    "this container (see queries/streaming.py s6 docstring) — this test "
    "AUTO-ACTIVATES when the install is fixed, upgrading S6's coverage "
    "to the Spark-4 primitive",
)
def test_transform_with_state_counter_matches_batch(spark):
    """S6's per-user running counter on transformWithStateInPandas (the
    newer stateful API applyInPandasWithState currently stands in for):
    integer cent-sums so the final state equals the batch aggregate
    exactly, batching order notwithstanding."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    src = replay.replay_dir(SF)

    class Counter(StatefulProcessor):
        def init(self, handle):
            self._agg = handle.getValueState("agg", "n BIGINT, cents BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._agg.get() if self._agg.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(round(float(pdf["value"].sum()) * 100))
            self._agg.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
            )

        def close(self):
            pass

    def t(stream):
        return stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=Counter(),
            outputStructType="user_id BIGINT, n_events BIGINT, cents BIGINT",
            outputMode="Update",
            timeMode="None",
        )

    result = replay.run_bounded(spark, t, src, "update")
    import pyspark.sql.functions as SF_

    final = (
        result.groupBy("user_id")
        .agg(SF_.max("n_events").alias("n_events"), SF_.max("cents").alias("cents"))
    )
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(
            SF_.count("*").alias("n_events"),
            SF_.sum("value").alias("sv"),
        )
    )
    got = {r.user_id: (r.n_events, r.cents) for r in final.collect()}
    for r in batch.collect():
        n, cents = got[r.user_id]
        assert n == r.n_events
        assert abs(cents - round(r.sv * 100)) <= len(got)  # per-batch cent rounding


def test_broker_crash_poll_never_commits(broker_src):
    """When (crash_after_poll+1) is a multiple of commit_every, the
    commit that would land on the crash poll must NOT happen — the crash
    interrupts between processing and commit, so the crash poll is always
    redelivered. (Regression: the aligned config used to commit the crash
    poll, silently emptying the redelivery window.)"""
    log, _ = broker_src
    src = B.BrokerReplaySource(log, group="gx", n_polls=8,
                               commit_every=2, crash_after_poll=3)
    red = src.redelivered()
    assert red, "aligned crash/commit config must still redeliver"
    # no session-1 ledger entry for the crash poll
    s1 = [e for e in src.ledger() if e["session"] == 1]
    assert all(e["poll"] != 3 for e in s1)
    # and the window is exactly the polls after the last commit: polls
    # 2..3 of session 1 (last commit at poll 1)
    polls = src._polls(log.records())
    expect = set()
    for tbl in polls[2:4]:
        expect |= set(zip(tbl["partition"].to_pylist(),
                          tbl["offset"].to_pylist()))
    assert red == expect


def test_broker_consumer_groups_are_independent(broker_src):
    """Two consumer GROUPS on one log get independent offset ledgers and
    crash windows — the broker-side half of R32's fanout (every group
    sees the whole stream, like bound fanout exchanges)."""
    log, src_g1 = broker_src
    src_g2 = B.BrokerReplaySource(log, group="g2", n_polls=8,
                                  commit_every=3, crash_after_poll=3)
    assert src_g2.delivery_root != src_g1.delivery_root
    n_log = log.records().num_rows
    for src in (src_g1, src_g2):
        d = src.delivered()
        pairs = set(zip(d["partition"].to_pylist(), d["offset"].to_pylist()))
        assert len(pairs) == n_log, "each group sees the whole stream"
    # different commit cadences → different redelivery windows
    assert src_g2.redelivered() != src_g1.redelivered()
    assert {int(p): o for p, o in src_g2.ledger()[-1]["offsets"].items()} \
        == log.end_offsets()


def test_cdf_catchup_batching_drops_batch_count(spark):
    """The CDF catch-up contract (cdf_replay_dir versions_per_trigger):
    at factor N the stream takes ceil(V/N) micro-batches instead of V
    — pinned by counting ACTUAL foreachBatch invocations at three
    factors — while the batching-independent signed fold lands on the
    IDENTICAL final state, and commit order inside each folded batch
    is reconstructible from _commit_version (contiguous, maximal-N
    version ranges per batch)."""
    import math
    import os
    import tempfile

    from pyspark.sql import functions as F

    from distribot_spark.queries.cdf_shared import (
        build_cdf_demo_table,
        cdf_view_deltas,
    )
    from distribot_spark.streaming import replay

    root = tempfile.mkdtemp(prefix="cdf_catchup_", dir=replay.TMP_ROOT)
    table = build_cdf_demo_table(spark, SF, os.path.join(root, "table"))
    head = table.version()
    assert head >= 4  # the 5-commit demo history

    states = {}
    batch_counts = {}
    for n in (1, 2, 3):
        chunks = replay.cdf_replay_dir(
            spark, table, "o_orderkey", os.path.join(root, f"c{n}"),
            versions_per_trigger=n,
        )
        seen = []

        def sink(batch_df, batch_id, seen=seen):
            rows = (
                cdf_view_deltas(batch_df)
                .groupBy("g")
                .agg(F.sum("dcnt").alias("dcnt"),
                     F.sum("dcents").alias("dcents"))
                .collect()
            )
            vs = sorted(
                r[0] for r in
                batch_df.select("_commit_version").distinct().collect()
            )
            seen.append((rows, vs))

        replay.run_foreach_batch(spark, lambda s: s, chunks, sink,
                                 "append")
        batch_counts[n] = len(seen)
        # versions inside each batch are contiguous and maximal-N,
        # across batches strictly increasing (commit order preserved)
        all_vs = []
        for _, vs in seen:
            assert vs == list(range(vs[0], vs[-1] + 1)) and len(vs) <= n
            all_vs += vs
        assert all_vs == sorted(set(all_vs))
        st = {}
        for rows, _ in seen:
            for r in rows:
                c, s = st.get(r["g"], (0, 0))
                st[r["g"]] = (c + r["dcnt"], s + r["dcents"])
        states[n] = st

    assert batch_counts[1] == head + 1
    for n in (2, 3):
        assert batch_counts[n] == math.ceil((head + 1) / n)
        assert batch_counts[n] < batch_counts[1]
        assert states[n] == states[1]


def test_dlq_live_tail_and_reprocess_composition(spark):
    """The DLQ-tail pipeline composed end to end, LIVE: an
    expectations table diverts bad rows; a live file-stream tail over
    the quarantine tree (DlqFileSource under a processing-time
    trigger) sees the pre-existing batches AND batches diverted WHILE
    it runs; then the rule is dropped and `reprocess_quarantine_spark`
    re-admits every diverted row — the alert-then-auto-reprocess loop
    the source exists for."""
    import os
    import tempfile

    from pyspark.sql import functions as F  # noqa: F401 (parity w/ peers)

    from distribot_spark.sources import acid
    from distribot_spark.streaming import replay
    from distribot_spark.streaming.sources import DlqFileSource

    root = tempfile.mkdtemp(prefix="dlqtail_", dir=replay.TMP_ROOT)
    t = acid.TableLog(os.path.join(root, "table"))
    t.init(key="k", n_buckets=4,
           constraints={"pos": {"col": "val", "min": 0,
                                "on_violation": "quarantine"}})
    # first wave: 3 bad rows diverted before the tail starts
    acid.merge_upsert_spark(
        spark, t,
        spark.createDataFrame(
            [(k, float(k) if k % 3 else -float(k)) for k in range(1, 10)],
            "k long, val double"),
        writer="w0")
    qroot = acid.quarantine_dir(t)
    replay.stamp_tree_replay_order(qroot)
    schema = acid.read_quarantine(spark, t).schema

    fired = []

    def until(df):
        rows = {r["k"] for r in df.collect()}
        if len(rows) >= 3 and not fired:
            # divert MORE while the tail is live: the stream must see it
            fired.append(1)
            acid.merge_upsert_spark(
                spark, t,
                spark.createDataFrame([(100, -100.0), (101, 101.0)],
                                      "k long, val double"),
                writer="w1")
        return rows >= {3, 6, 9, 100}

    tailed = replay.run_live(
        spark,
        lambda s: s.select("k", "val").dropDuplicates(["k"]),
        DlqFileSource(qroot, schema=schema),
        "append",
        until,
        timeout_sec=90.0,
    )
    seen = {r["k"] for r in tailed.collect()}
    assert seen == {3, 6, 9, 100}  # every diverted key, old and live

    # the composition: alert fired -> operator drops the rule ->
    # auto-reprocess re-admits everything
    acid.alter_drop_constraint(t, "pos")
    st = acid.reprocess_quarantine_spark(spark, t)
    assert st["n_replayed"] == 4 and st["n_rediverted"] == 0, st
    got = acid.read_snapshot_spark(spark, t)
    assert got.count() == 11  # 6 clean + 1 clean(101) + 4 re-admitted
    assert got.filter("val < 0").count() == 4
    import os as _os
    assert not _os.path.isdir(qroot) or not _os.listdir(qroot)


def test_cdf_replay_dir_keeps_empty_version_chunks(spark):
    """r9 optimization pin: cdf_replay_dir now materializes every
    non-empty chunk in ONE Spark write job (partitionBy on the chunk
    id) — but a version range whose change feed is EMPTY (an OPTIMIZE
    commit: carried rows suppressed) must STILL produce its chunk
    file, or micro-batch numbering shifts under the one-file-per-
    version-range contract. Build v1=insert, v2=OPTIMIZE (empty feed),
    v3=insert and demand three chunk files with the middle one empty."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from distribot_spark.sources import acid
    from distribot_spark.streaming import replay

    root = tempfile.mkdtemp(prefix="cdf_empty_", dir=replay.TMP_ROOT)
    t = acid.TableLog(os.path.join(root, "t"))
    acid.write_initial_spark(
        spark, t,
        spark.range(40).select(F.col("id").alias("k"),
                               (F.col("id") * 2).alias("v")),
        "k", n_buckets=2)
    acid.append_spark(
        spark, t,
        spark.range(100, 120).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("v")),
        "k")
    st = acid.optimize_table_spark(spark, t, "k", 2, files_per_bucket=1)
    assert st["rewritten_buckets"] > 0, st
    acid.append_spark(
        spark, t,
        spark.range(200, 210).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("v")),
        "k")
    assert t.version() == 3
    out = replay.cdf_replay_dir(
        spark, t, "k", os.path.join(root, "chunks"),
        versions_per_trigger=1, from_version=1)
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert files == ["chunk_0000.parquet", "chunk_0001.parquet",
                     "chunk_0002.parquet"], files
    import pyarrow.parquet as pq

    n = [pq.read_metadata(os.path.join(out, f)).num_rows for f in files]
    assert n[0] == 20 and n[1] == 0 and n[2] == 10, n
