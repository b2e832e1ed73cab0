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
