"""Reader feature gate (VERDICT r8 task 5): tables persist a `features`
list naming every on-disk mechanism a reader must understand to fold a
snapshot correctly; a client whose supported set lacks one refuses
loudly instead of silently miscounting (Delta's readerFeatures
contract). The writer half was already `_gate_state`."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources.acid import (
    SUPPORTED_READER_FEATURES,
    TableLog,
    UnsupportedTableFeature,
)


def _tmp(prefix="feat_"):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _mk(spark, **init_kw):
    t = TableLog(_tmp())
    t.init(key="id", n_buckets=4, **init_kw)
    acid.write_initial_spark(
        spark, t, spark.range(0, 40).select(
            "id", (F.col("id") * 2).alias("v")), "id", n_buckets=4)
    return t


def test_features_accrete_as_write_paths_first_use_them(spark):
    t = _mk(spark)
    assert t.features() == []  # plain table: nothing to gate
    acid.delete_keys_spark(spark, t, spark.range(0, 3).select("id"), "id")
    assert t.features() == ["deletion-vectors"]
    acid.delete_where_spark(spark, t, "v > 70")
    assert "positional-deletion-vectors" in t.features()
    acid.alter_rename_column(t, "v", "val")
    assert "column-mapping" in t.features()
    acid.alter_set_mask(t, "val", {"fn": "null"})
    assert "access-policies" in t.features()
    # idempotent: re-running a path doesn't duplicate
    acid.delete_keys_spark(spark, t, spark.range(3, 4).select("id"), "id")
    assert sorted(t.features()) == t.features()
    assert len(t.features()) == len(set(t.features()))


def test_hash_buckets_recorded_at_init(spark):
    t = _mk(spark, hash_buckets=True)
    assert t.features() == ["hash-buckets"]


def test_feature_stripped_reader_refuses_loudly(spark, monkeypatch):
    """The version-bump contract: a reader whose supported set lacks a
    feature the table uses must refuse the fold — here a DV-stripped
    build against a table with deletion vectors."""
    t = _mk(spark)
    acid.delete_keys_spark(spark, t, spark.range(0, 5).select("id"), "id")
    assert acid.read_snapshot_spark(spark, t).count() == 35  # fine now
    stripped = frozenset(SUPPORTED_READER_FEATURES - {"deletion-vectors"})
    monkeypatch.setattr(acid, "SUPPORTED_READER_FEATURES", stripped)
    with pytest.raises(UnsupportedTableFeature, match="deletion-vectors"):
        acid.read_snapshot_spark(spark, t)
    with pytest.raises(UnsupportedTableFeature):
        acid.table_changes_spark(spark, t, from_version=1)
    with pytest.raises(UnsupportedTableFeature):
        acid.export_snapshot(t, _tmp("featx_"))


def test_unknown_future_feature_refuses(spark):
    """A table written by a NEWER client carrying a feature this build
    has never heard of: refuse, name it, point at the upgrade."""
    t = _mk(spark)
    with t._meta_lock():
        m = t._meta()
        m["features"] = ["v9-quantum-encoding"]
        t._persist_meta(m)
    with pytest.raises(UnsupportedTableFeature,
                       match="v9-quantum-encoding"):
        acid.read_snapshot_spark(spark, t)


def test_describe_detail_lists_features(spark):
    from distribot_spark.sources.table import Table

    t = _mk(spark)
    acid.delete_keys_spark(spark, t, spark.range(0, 2).select("id"), "id")
    tbl = Table.for_path(spark, t.path)
    assert tbl.detail()["features"] == ["deletion-vectors"]


def test_clone_preserves_features(spark):
    import shutil

    t = _mk(spark)
    acid.delete_keys_spark(spark, t, spark.range(0, 2).select("id"), "id")
    dst = _tmp("featc_")
    shutil.rmtree(dst)
    acid.clone_table(t, dst)
    assert TableLog(dst).features() == ["deletion-vectors"]


def test_txn_delete_participant_records_dv_feature(spark):
    from distribot_spark.sources import commit_together
    from distribot_spark.sources import txn as tx

    t = _mk(spark)
    t2 = _mk(spark)
    staged = [
        tx.stage_delete_spark(spark, t, spark.range(0, 3).select("id")),
        tx.stage_append_spark(
            spark, t2, spark.range(100, 102).select(
                "id", (F.col("id") * 2).alias("v"))),
    ]
    assert "deletion-vectors" in t.features()  # recorded pre-commit
    commit_together(staged)
    assert acid.read_snapshot_spark(spark, t).count() == 37
