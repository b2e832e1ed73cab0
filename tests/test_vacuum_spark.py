"""Distributed VACUUM planning (`manifest.referenced_files_df` /
`manifest.vacuum_spark`): the referenced set as a Spark DataFrame
(manifest scan at the floor + O(tail) names), anti-joined against the
listing — the driver never materializes a set O(live files). Pinned
set-for-set equal to the driver fold across the full mutation alphabet
and byte-identical in what it deletes."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources.acid import (
    SnapshotExpired,
    TableLog,
    delete_keys_spark,
    delete_where_spark,
    merge_upsert_spark,
    optimize_table_spark,
    restore_table,
    write_initial_spark,
)
from distribot_spark.sources.manifest import (
    referenced_files_df,
    vacuum_spark,
)


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _ref_df_set(spark, t):
    return {r["file"] for r in referenced_files_df(spark, t).collect()}


def _ref_driver_set(t):
    return t.referenced_files() | t._txn_shielded_files()


def _workload(spark, t):
    """One mutation per step, yielding after each so callers can
    compare both referenced folds at every intermediate state —
    rewrites, key DVs, positional DVs, OPTIMIZE (DV compaction),
    RESTORE (same-commit remove+re-add with DV re-attach), and enough
    commits to cross a parquet-checkpoint boundary."""
    yield "init"
    for lo in (0, 40, 80):
        merge_upsert_spark(
            spark, t,
            spark.range(lo, lo + 50).select(
                "id", (F.col("id") % 7).alias("g"),
                (F.col("id") * 11).alias("v")),
            "id")
        yield f"merge{lo}"
    delete_keys_spark(
        spark, t, spark.createDataFrame([(5,), (9,)], "id long"), "id")
    yield "dv_keys"
    delete_where_spark(spark, t, "g = 2")
    yield "dv_positional"
    v_pre_opt = t.version()
    optimize_table_spark(spark, t)
    yield "optimize"
    restore_table(t, v_pre_opt)
    yield "restore"
    for lo in (120, 160, 190):
        merge_upsert_spark(
            spark, t,
            spark.range(lo, lo + 30).select(
                "id", (F.col("id") % 7).alias("g"),
                F.lit(-1).alias("v")),
            "id")
        yield f"merge{lo}"
    t.expire_snapshots(keep_last=2)
    yield "expired"


def _mk(spark):
    t = TableLog(_tmp("vs_"))
    write_initial_spark(
        spark, t,
        spark.range(0, 200).select(
            "id", (F.col("id") % 7).alias("g"),
            (F.col("id") * 10).alias("v")),
        "id", n_buckets=4)
    return t


def test_referenced_df_equals_driver_fold_at_every_step(spark):
    t = _mk(spark)
    for step in _workload(spark, t):
        assert _ref_df_set(spark, t) == _ref_driver_set(t), step
    # the walk crossed a parquet-checkpoint boundary, so the equality
    # above covered the DISTRIBUTED manifest path, not just bootstrap
    from distribot_spark.sources.manifest import newest_checkpoint_parquet

    assert newest_checkpoint_parquet(t, t.version()) > 0


def test_vacuum_spark_deletes_byte_identically(spark):
    t = _mk(spark)
    for _ in _workload(spark, t):
        pass
    # debris: a writer that died pre-commit, and a crashed stage dir
    open(t.data_path("orphan-dead.parquet"), "w").write("x")
    os.makedirs(os.path.join(t.data_dir, "_stage-crashed"))
    open(os.path.join(t.data_dir, "_stage-crashed", "p.parquet"),
         "w").write("y")
    expected = sorted(
        n for n in os.listdir(t.data_dir) if n not in _ref_driver_set(t))
    assert expected, "workload must leave something reclaimable"
    got = vacuum_spark(spark, t, min_age_seconds=0.0, dry_run=True)
    assert got == expected
    assert sorted(os.listdir(t.data_dir)) == sorted(
        set(expected) | {n for n in os.listdir(t.data_dir)
                         if n not in expected})  # dry run deleted nothing
    removed = vacuum_spark(spark, t, min_age_seconds=0.0)
    assert removed == expected
    assert "orphan-dead.parquet" in removed
    assert "_stage-crashed" in removed
    # retention contract intact: reads inside the horizon survive,
    # below the floor raise SnapshotExpired (never a FileNotFound)
    floor = t.expired_before()
    assert acid.read_snapshot_spark(spark, t, version=floor).count() > 0
    assert acid.read_snapshot_spark(spark, t).count() > 0
    with pytest.raises(SnapshotExpired):
        acid.read_snapshot_spark(spark, t, version=floor - 1)


def test_min_age_rail_spares_young_files(spark):
    t = _mk(spark)
    open(t.data_path("young-orphan.parquet"), "w").write("x")
    assert vacuum_spark(spark, t, min_age_seconds=3600.0) == []
    assert os.path.exists(t.data_path("young-orphan.parquet"))
    assert vacuum_spark(spark, t, min_age_seconds=0.0) == [
        "young-orphan.parquet"]


def test_pending_txn_staged_files_shielded(spark):
    from distribot_spark.sources import txn as tx

    fact = _mk(spark)
    dim = TableLog(_tmp("vs_d_"))
    write_initial_spark(
        spark, dim,
        spark.range(0, 10).select(F.col("id").alias("dk"),
                                  F.lit("s").alias("seg")),
        "dk", n_buckets=2)
    staged = [
        tx.stage_append_spark(
            spark, fact,
            spark.range(500, 520).select(
                "id", (F.col("id") % 7).alias("g"),
                F.lit(0).alias("v")),
            writer="wf"),
        tx.stage_append_spark(
            spark, dim,
            spark.range(100, 101).select(F.col("id").alias("dk"),
                                         F.lit("t").alias("seg")),
            writer="wd"),
    ]
    files = [fact.data_path(a["file"]) for a in staged[0]["adds"]]

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "pinned":
            # marker pinned, nothing committed: the distributed
            # planner must shield the staged adds exactly like the
            # driver vacuum
            assert vacuum_spark(spark, fact, min_age_seconds=0.0,
                                dry_run=True) == []
            vacuum_spark(spark, fact, min_age_seconds=0.0)
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    assert all(os.path.exists(f) for f in files)
    tx.resolve_pending_txn(fact, lease_sec=0.0)  # clean up


def test_empty_and_headless_tables(spark):
    t = TableLog(_tmp("vs_e_"))
    t.init(key="id", n_buckets=2)
    assert vacuum_spark(spark, t, min_age_seconds=0.0) == []
    open(t.data_path("junk"), "w").write("z")
    assert vacuum_spark(spark, t, min_age_seconds=0.0) == ["junk"]


def test_facade_distributed_vacuum_and_dry_run(spark):
    from distribot_spark.sources.table import Table

    t = Table.create(
        spark, os.path.join(_tmp("vs_f_"), "t"),
        spark.range(0, 40).select("id", (F.col("id") % 3).alias("g")),
        "id", 2)
    open(t.log.data_path("stale-orphan"), "w").write("x")
    got = t.vacuum(min_age_seconds=0.0, dry_run=True)
    assert got == ["stale-orphan"]
    assert os.path.exists(t.log.data_path("stale-orphan"))
    assert t.vacuum(min_age_seconds=0.0, distributed=True) == [
        "stale-orphan"]
    assert not os.path.exists(t.log.data_path("stale-orphan"))
    assert t.read().count() == 40
