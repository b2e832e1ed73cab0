"""Positional (bitmap) deletion vectors + predicate DELETE
(`delete_where_spark`): DELETE WHERE <any predicate> with no key
addressing — per-file 32-bit-word bitmaps over row positions, folded by
both clients, composing with key-mode DVs, compacted by OPTIMIZE,
re-attached by RESTORE (mixed-kind sidecar lists in one commit), with
key-mode CDF parity and the OCC conflict discipline preserved."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources.acid import TableLog, delete_where_spark


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _mk(spark, n=200, n_buckets=4):
    t = TableLog(_tmp("dw_"))
    acid.write_initial_spark(
        spark, t,
        spark.range(0, n).select(
            "id", (F.col("id") % 7).alias("g"),
            (F.col("id") * 10).alias("v")),
        "id", n_buckets=n_buckets)
    return t


def _ids(spark, t, version=None):
    return {r["id"] for r in acid.read_snapshot_spark(
        spark, t, version=version).select("id").collect()}


def test_predicate_delete_non_key_no_rewrite(spark):
    t = _mk(spark)
    live0 = set(t.snapshot()[1])
    st = delete_where_spark(spark, t, "g = 3")
    want = {i for i in range(200) if i % 7 != 3}
    assert st["deleted_rows"] == 200 - len(want) and st["dv_files"] > 0
    assert set(t.snapshot()[1]) == live0  # zero base rewrites
    assert _ids(spark, t) == want
    # pandas client folds the same bitmaps
    assert set(acid.read_policy_pandas(t)["id"]) == want
    # sidecars are positional (dvp-) and tiny
    for ds in t.live_dvs().values():
        assert all(d.startswith("dvp-") for d in ds)


def test_mixed_kinds_fold_and_exactly_once(spark):
    t = _mk(spark)
    delete_where_spark(spark, t, "g = 3")                       # v1
    acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(5,), (6,)], "id long"),
        "id")                                                   # v2
    # overlapping second predicate delete records ONLY newly-dead rows
    st = delete_where_spark(spark, t, "g IN (3, 4)")            # v3
    n_new = len([i for i in range(200)
                 if i % 7 == 4 and i not in (5, 6)])
    assert st["deleted_rows"] == n_new
    want = {i for i in range(200) if i % 7 not in (3, 4)} - {5, 6}
    assert _ids(spark, t) == want
    assert set(acid.read_policy_pandas(t)["id"]) == want
    # CDF: every deleted row reported exactly once across the commits
    ch = acid.table_changes_spark(spark, t, from_version=1)
    dels = [r["id"] for r in
            ch.filter("_change_type = 'delete'").select("id").collect()]
    assert sorted(dels) == sorted(set(range(200)) - want)
    assert len(dels) == len(set(dels))


def test_cdf_parity_with_key_mode(spark):
    """The same logical delete via predicate (positional DVs) and via
    keys (key DVs) must produce identical change feeds and censuses."""
    ta, tb = _mk(spark), _mk(spark)
    delete_where_spark(spark, ta, "g = 2")
    keys = spark.range(0, 200).filter(F.col("id") % 7 == 2).select("id")
    acid.delete_keys_spark(spark, tb, keys, "id")

    def feed(t):
        return sorted(
            tuple(r) for r in acid.table_changes_spark(
                spark, t, from_version=1, to_version=1)
            .select("id", "g", "v", "_change_type").collect())

    assert feed(ta) == feed(tb)
    assert _ids(spark, ta) == _ids(spark, tb)


def test_optimize_compacts_positional_dvs(spark):
    t = _mk(spark)
    delete_where_spark(spark, t, "g = 1")
    acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(9,)], "id long"), "id")
    want = _ids(spark, t)
    v_opt = acid.optimize_table_spark(spark, t)["committed_version"]
    assert t.live_dvs() == {}
    assert _ids(spark, t) == want
    # compaction is CDF-invisible on DV-carrying files
    ch = acid.table_changes_spark(spark, t, from_version=v_opt,
                                  to_version=v_opt)
    assert ch.count() == 0


def test_restore_reattaches_mixed_sidecars(spark):
    t = _mk(spark)
    delete_where_spark(spark, t, "g = 3")                       # v1
    acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(5,), (6,)], "id long"),
        "id")                                                   # v2
    delete_where_spark(spark, t, "g IN (3, 4)")                 # v3
    acid.optimize_table_spark(spark, t)                         # v4
    acid.restore_table(t, 2)                                    # v5
    want2 = {i for i in range(200) if i % 7 != 3} - {5, 6}
    assert _ids(spark, t) == want2
    assert set(acid.read_policy_pandas(t)["id"]) == want2
    # the restore commit re-attached a LIST (key + positional merged
    # per kind) for at least one file
    dvs = t.read_commit(t.version())["dvs"]
    assert any(isinstance(d, list) and len(d) == 2
               for d in dvs.values())
    # time travel across the whole history still works
    assert _ids(spark, t, version=1) == {
        i for i in range(200) if i % 7 != 3}


def test_occ_conflict_dv_state_change_forces_recompute(spark):
    """Twin of test_dv_commit_conflicts_merge_must_recompute: a racing
    key-delete lands between compute and commit; the predicate delete
    recomputes against the new DV state instead of double-recording."""
    t = _mk(spark)
    fired = {"n": 0}

    def hook(v):
        if fired["n"] == 0:
            fired["n"] += 1
            acid.delete_keys_spark(
                spark, t,
                spark.range(0, 200).filter(
                    (F.col("id") % 7 == 5) & (F.col("id") < 50))
                .select("id"),
                "id", writer="racer")

    st = delete_where_spark(spark, t, "g = 5", pre_commit_hook=hook)
    racer_dead = {i for i in range(50) if i % 7 == 5}
    all_g5 = {i for i in range(200) if i % 7 == 5}
    # recompute: only rows still live at commit time were recorded
    assert st["deleted_rows"] == len(all_g5 - racer_dead)
    assert st["attempts"] >= 1 and fired["n"] == 1
    assert _ids(spark, t) == set(range(200)) - all_g5
    ch = acid.table_changes_spark(spark, t, from_version=1)
    dels = [r["id"] for r in
            ch.filter("_change_type = 'delete'").select("id").collect()]
    assert sorted(dels) == sorted(all_g5)
    assert len(dels) == len(set(dels))  # exactly once


def test_fk_restrict_applies_to_predicate_delete(spark):
    parent = TableLog(_tmp("dwp_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, 20).select(F.col("id").alias("c_id"),
                                  (F.col("id") % 2).alias("half")),
        "c_id", n_buckets=2)
    child = TableLog(_tmp("dwc_"))
    acid.write_initial_spark(
        spark, child,
        spark.createDataFrame([(100, 3)], "o_id long, c_id long"),
        "o_id", n_buckets=2)
    acid.alter_add_foreign_key(spark, child, "fk", "c_id", parent.path)
    with pytest.raises(ValueError, match="RESTRICT"):
        delete_where_spark(spark, parent, "half = 1")  # 3 referenced
    # unreferenced region deletes fine
    st = delete_where_spark(spark, parent, "half = 0 AND c_id > 0")
    assert st["deleted_rows"] == 9


def test_empty_match_is_noop_and_boundaries(spark):
    t = _mk(spark)
    v0 = t.version()
    st = delete_where_spark(spark, t, "g = 99")
    # key-by-key, never exact dict equality (writer stats grow keys —
    # the CLAUDE.md source_merge_concurrent lesson)
    assert st["committed_version"] == v0 and st["attempts"] == 0
    assert st["deleted_rows"] == 0 and st["dv_files"] == 0
    assert t.version() == v0
    # column-mapped tables refuse loudly (physical-name predicate trap)
    acid.alter_rename_column(t, "v", "val")
    with pytest.raises(ValueError, match="column-mapped"):
        delete_where_spark(spark, t, "g = 1")


def test_vacuum_keeps_referenced_positional_sidecars(spark):
    t = _mk(spark)
    delete_where_spark(spark, t, "g = 0")
    want = _ids(spark, t)
    t.expire_snapshots(keep_last=1)
    t.vacuum(min_age_seconds=0.0)
    assert _ids(spark, t) == want
    assert set(acid.read_policy_pandas(t)["id"]) == want
