"""RocksDB state store provider (streaming/replay.rocksdb_state_store):
the 100 TB streaming-state lever — keyed state spills to local disk
instead of living on the JVM heap — must be semantics-invisible: the
s22 twin's result equals s17's (default provider) exactly, and the
provider conf never leaks out of the context.
"""

from distribot_spark.queries import QUERIES
from distribot_spark.streaming.replay import ROCKSDB_PROVIDER, rocksdb_state_store
from tests.conftest import SF_ORACLE

_CONF = "spark.sql.streaming.stateStore.providerClass"


def _provider(spark):
    try:
        return spark.conf.get(_CONF)
    except Exception:
        return None


def test_context_sets_and_restores_conf(spark):
    before = _provider(spark)
    with rocksdb_state_store(spark):
        assert spark.conf.get(_CONF) == ROCKSDB_PROVIDER
    assert _provider(spark) == before
    # restore also happens when the body raises
    try:
        with rocksdb_state_store(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert _provider(spark) == before


def test_rocksdb_twin_matches_default_provider_exactly(spark):
    """Same transform, same replay, two providers → identical rows (the
    integer-sufficient-statistics state makes this exact, not just
    close). s22 itself asserts the RocksDB artifacts were written, so a
    silent fallback to the default provider cannot pass."""
    default = QUERIES["s17_stream_running_stats"].builder(spark, SF_ORACLE)
    rocks = QUERIES["s22_rocksdb_running_stats"].builder(spark, SF_ORACLE)
    assert _provider(spark) is None or _provider(spark) != ROCKSDB_PROVIDER
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, rocks.collect())
    )


def test_rocksdb_checkpoint_restart_recovers_state(spark):
    """Production state stores earn their keep across RESTARTS: a
    stateful query consumes half its input under the RocksDB provider,
    terminates, then RESTARTS from the same checkpoint once the rest of
    the input lands (foreachBatch sink — the memory sink is not
    fault-tolerant and refuses recovery). The restart must (a) resume
    from the recorded offsets — not offset 0 — and (b) RELOAD keyed
    state from the RocksDB snapshots — not recompute from empty: empty
    state would undercount, reprocessing would overcount, and either
    diverges from the DuckDB batch oracle the final counts are checked
    against."""
    import glob
    import os
    import shutil
    import tempfile

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from distribot_spark.streaming import replay
    from distribot_spark.streaming.replay import TMP_ROOT, _few_state_partitions

    full = replay.replay_dir(SF_ORACLE)  # 8 chunks, event-time order
    chunks = sorted(f for f in os.listdir(full) if f.endswith(".parquet"))
    assert len(chunks) == 8
    grow = tempfile.mkdtemp(prefix="grow_", dir=TMP_ROOT)
    ck = tempfile.mkdtemp(prefix="ckpt_restart_", dir=TMP_ROOT)
    sink1 = os.path.join(grow + "_sink1")
    sink2 = os.path.join(grow + "_sink2")

    def update(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"event_type": [key[0]], "n": [n]})

    def run_phase(sink_dir):
        schema = spark.read.parquet(grow).schema

        def fn(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink_dir)

        with rocksdb_state_store(spark), _few_state_partitions(spark):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(grow)
            )
            q = (
                stream.groupBy("event_type").applyInPandasWithState(
                    update, "event_type string, n long", "n long",
                    "update", GroupStateTimeout.NoTimeout,
                )
                .writeStream.foreachBatch(fn).outputMode("update")
                .trigger(availableNow=True)
                .option("checkpointLocation", ck).start()
            )
            q.awaitTermination()
        return {
            r.event_type: r.n
            for r in spark.read.parquet(sink_dir)
            .groupBy("event_type").agg(F.max("n").alias("n")).collect()
        }

    try:
        for c in chunks[:4]:
            shutil.copy(os.path.join(full, c), os.path.join(grow, c))
        phase1 = run_phase(sink1)
        zips = glob.glob(os.path.join(ck, "state", "**", "*.zip"),
                         recursive=True)
        assert zips, "no RocksDB snapshots to restart from"

        # the rest of the stream lands; RESTART from the same checkpoint
        for c in chunks[4:]:
            shutil.copy(os.path.join(full, c), os.path.join(grow, c))
        phase2 = run_phase(sink2)

        truth = {
            k: int(n)
            for k, n in duckdb.sql(
                "SELECT event_type, COUNT(*) FROM "
                f"read_parquet('{SF_ORACLE}/events.parquet') GROUP BY 1"
            ).fetchall()
        }
        # every key updated after restart carries its FULL history:
        # state reloaded (not empty) and offsets resumed (not replayed)
        for k, n in phase2.items():
            assert n == truth[k], (k, n, truth[k])
        # ...and the restart genuinely had prior state to fold in
        both = [k for k in phase2 if k in phase1 and phase1[k] < truth[k]]
        assert both, "second half added nothing - test is vacuous"
        # keys silent after the restart had finished in phase 1 already
        for k in set(truth) - set(phase2):
            assert phase1.get(k) == truth[k], (k, phase1.get(k), truth[k])
    finally:
        for d in (grow, ck, sink1, sink2):
            shutil.rmtree(d, ignore_errors=True)
