"""FOREIGN KEY constraints (cross-table referential integrity on the
governance layer): membership enforced on every child write path in
both clients (fail and quarantine modes), RESTRICT enforced on every
parent key-removal path, the ALTER lifecycle (validate-existing →
back-reference → barrier), self-referencing FKs, and — the part that
makes it honest — the cross-log write-skew fence: forced-interleaving
tests for both race directions plus white-box tests of the commit-time
epoch verify under the meta lock."""

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources.acid import (
    TableLog,
    alter_add_foreign_key,
    alter_drop_foreign_key,
)


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _mk_pair(spark, n_parent=50, n_child=200, fk_name="fk_cust",
             on_violation="fail"):
    parent = TableLog(_tmp("fkp_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, n_parent).select(
            F.col("id").alias("c_id"), (F.col("id") % 3).alias("seg")),
        "c_id", n_buckets=4)
    child = TableLog(_tmp("fkc_"))
    acid.write_initial_spark(
        spark, child,
        spark.range(0, n_child).select(
            F.col("id").alias("o_id"),
            (F.col("id") % n_parent).alias("c_id"),
            (F.col("id") * 2).alias("amt")),
        "o_id", n_buckets=4)
    alter_add_foreign_key(spark, child, fk_name, "c_id", parent.path,
                          on_violation=on_violation)
    return parent, child


def _row(spark, o_id, c_id, amt=0):
    return spark.createDataFrame([(o_id, c_id, amt)],
                                 "o_id long, c_id long, amt long")


def test_fk_membership_spark_paths(spark):
    parent, child = _mk_pair(spark)
    acid.merge_upsert_spark(spark, child, _row(spark, 500, 10), "o_id")
    acid.append_spark(spark, child, _row(spark, 501, 11), "o_id")
    with pytest.raises(Exception, match="FOREIGN KEY .*fk_cust"):
        acid.merge_upsert_spark(spark, child, _row(spark, 502, 999),
                                "o_id")
    with pytest.raises(Exception, match="FOREIGN KEY .*fk_cust"):
        acid.append_spark(spark, child, _row(spark, 503, 999), "o_id")
    # NULL FK passes (SQL MATCH SIMPLE)
    acid.merge_upsert_spark(spark, child, _row(spark, 504, None), "o_id")


def test_fk_membership_pandas_paths(spark):
    parent, child = _mk_pair(spark)
    acid.merge_upsert_pandas(
        child, pd.DataFrame({"o_id": [600], "c_id": [5], "amt": [1]}),
        "o_id")
    with pytest.raises(ValueError, match="FOREIGN KEY .*fk_cust"):
        acid.append_pandas(
            child, pd.DataFrame({"o_id": [601], "c_id": [999],
                                 "amt": [1]}), "o_id")
    acid.append_pandas(
        child, pd.DataFrame({"o_id": [602], "c_id": [None],
                             "amt": [1]}), "o_id")


def test_fk_quarantine_mode_diverts_orphans(spark):
    parent, child = _mk_pair(spark, on_violation="quarantine")
    st = acid.merge_upsert_spark(
        spark, child,
        spark.createDataFrame(
            [(700, 1, 0), (701, 999, 0), (702, None, 0)],
            "o_id long, c_id long, amt long"), "o_id")
    assert st["quarantined"] == 1, st
    q = acid.read_quarantine(spark, child)
    bad = q.filter(F.col("_constraint") == "fk_cust").collect()
    assert len(bad) == 1 and bad[0]["o_id"] == 701
    live = acid.read_snapshot_spark(spark, child)
    assert live.filter(F.col("o_id").isin(700, 702)).count() == 2
    assert live.filter(F.col("o_id") == 701).count() == 0


def test_fk_restrict_on_parent_delete_and_purge(spark):
    parent, child = _mk_pair(spark)
    ref = spark.createDataFrame([(10,)], "c_id long")
    with pytest.raises(ValueError, match="RESTRICT"):
        acid.delete_keys_spark(spark, parent, ref, "c_id")
    with pytest.raises(ValueError, match="RESTRICT"):
        acid.purge_keys_spark(spark, parent, ref, "c_id")
    with pytest.raises(ValueError, match="RESTRICT"):
        acid.delete_keys_pandas(parent, [10], "c_id")
    with pytest.raises(ValueError, match="RESTRICT"):
        acid.purge_keys_pandas(parent, [10], "c_id")
    # deref the key, then all removals are legal again
    acid.delete_keys_spark(
        spark, child,
        spark.range(0, 200).filter(F.col("id") % 50 == 10)
        .select(F.col("id").alias("o_id")), "o_id")
    st = acid.delete_keys_spark(spark, parent, ref, "c_id")
    assert st["deleted_rows"] == 1
    # a DV-deleted child row no longer counts as a referrer (key 11)
    acid.delete_keys_spark(
        spark, child,
        spark.range(0, 200).filter(F.col("id") % 50 == 11)
        .select(F.col("id").alias("o_id")), "o_id")
    st = acid.delete_keys_spark(
        spark, parent, spark.createDataFrame([(11,)], "c_id long"),
        "c_id")
    assert st["deleted_rows"] == 1


def test_fk_alter_validates_existing_rows(spark):
    parent = TableLog(_tmp("fkp_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, 10).select(F.col("id").alias("c_id")),
        "c_id", n_buckets=2)
    child = TableLog(_tmp("fkc_"))
    acid.write_initial_spark(
        spark, child,
        spark.createDataFrame([(1, 5), (2, 99)],
                              "o_id long, c_id long"),
        "o_id", n_buckets=2)
    with pytest.raises(ValueError, match="violate"):
        alter_add_foreign_key(spark, child, "fk_bad", "c_id",
                              parent.path)
    # failed ALTER must deregister the conservative back-reference
    assert parent.fk_referenced_by() == []
    assert "fk_bad" not in child.constraints()


def test_fk_drop_reopens_both_sides(spark):
    parent, child = _mk_pair(spark)
    alter_drop_foreign_key(child, "fk_cust")
    assert parent.fk_referenced_by() == []
    acid.merge_upsert_spark(spark, child, _row(spark, 800, 999), "o_id")
    acid.delete_keys_spark(
        spark, parent, spark.createDataFrame([(7,)], "c_id long"),
        "c_id")  # referenced, but no FK anymore


def test_self_referencing_fk_subtree_delete(spark):
    t = TableLog(_tmp("fks_"))
    # employee hierarchy: id -> manager_id (root 0 manages itself... no:
    # root has NULL manager)
    rows = [(0, None), (1, 0), (2, 0), (3, 1), (4, 3)]
    acid.write_initial_spark(
        spark, t,
        spark.createDataFrame(rows, "id long, mgr long"),
        "id", n_buckets=2)
    alter_add_foreign_key(spark, t, "fk_mgr", "mgr", t.path)
    # inserting under a live manager works; orphan manager fails
    acid.merge_upsert_spark(
        spark, t, spark.createDataFrame([(5, 4)], "id long, mgr long"),
        "id")
    with pytest.raises(Exception, match="FOREIGN KEY"):
        acid.merge_upsert_spark(
            spark, t,
            spark.createDataFrame([(6, 77)], "id long, mgr long"), "id")
    # deleting a manager with live reports RESTRICTs…
    with pytest.raises(ValueError, match="RESTRICT"):
        acid.delete_keys_spark(
            spark, t, spark.createDataFrame([(1,)], "id long"), "id")
    # …but deleting the CLOSED SUBTREE {1,3,4,5} in one call succeeds
    st = acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(1,), (3,), (4,), (5,)],
                                        "id long"), "id")
    assert st["deleted_rows"] == 4


def test_fk_race_parent_delete_lands_mid_child_insert(spark):
    """Forced interleaving, direction 1: a parent DELETE commits
    between the child's FK validation and its commit. The child's gate
    sees the moved fk_del_epoch, restarts, revalidates — and the row is
    now an orphan, so the write FAILS instead of planting a dangling
    reference."""
    parent, child = _mk_pair(spark)
    # deref key 20 first so the racing delete itself passes RESTRICT
    acid.delete_keys_spark(
        spark, child,
        spark.range(0, 200).filter(F.col("id") % 50 == 20)
        .select(F.col("id").alias("o_id")), "o_id")
    fired = {"n": 0}

    def hook(v):
        if fired["n"] == 0:
            fired["n"] = 1
            acid.delete_keys_spark(
                spark, parent,
                spark.createDataFrame([(20,)], "c_id long"), "c_id")

    with pytest.raises(Exception, match="FOREIGN KEY|constraint set"):
        acid.merge_upsert_spark(spark, child, _row(spark, 900, 20),
                                "o_id", pre_commit_hook=hook)
    assert fired["n"] == 1
    live = acid.read_snapshot_spark(spark, child)
    assert live.filter(F.col("o_id") == 900).count() == 0


def test_fk_race_child_insert_lands_mid_parent_delete(spark):
    """Forced interleaving, direction 2: a child INSERT commits between
    the parent's RESTRICT scan and its delete commit. The parent's gate
    sees the moved fk_ref_epoch, restarts, re-scans — and now refuses
    the delete."""
    parent, child = _mk_pair(spark)
    acid.delete_keys_spark(
        spark, child,
        spark.range(0, 200).filter(F.col("id") % 50 == 21)
        .select(F.col("id").alias("o_id")), "o_id")
    fired = {"n": 0}

    def hook(v):
        if fired["n"] == 0:
            fired["n"] = 1
            acid.merge_upsert_spark(spark, child, _row(spark, 901, 21),
                                    "o_id")

    with pytest.raises(ValueError, match="RESTRICT"):
        acid.delete_keys_spark(
            spark, parent, spark.createDataFrame([(21,)], "c_id long"),
            "c_id", pre_commit_hook=hook)
    assert fired["n"] == 1
    # key 21 survived AND the reference is live — integrity held
    assert acid.read_snapshot_spark(spark, parent).filter(
        F.col("c_id") == 21).count() == 1


def test_fk_fence_white_box_epoch_verify(spark):
    """The check-to-link window itself: try_commit with a STALE
    captured epoch must refuse (False), in both directions — this is
    the piece the hook-based races can't reach (they exercise the gate,
    which runs before the window)."""
    parent, child = _mk_pair(spark)
    # child direction: capture, then move the parent's del epoch
    acid._gate_state(child)
    parent._fk_bump("fk_del_epoch")
    v = child.version()
    assert child.try_commit(v, [], [], "stale-child") is False
    # parent direction: capture ref epoch, then a child commit bumps it
    acid._gate_state(parent, removal=True)
    parent._fk_bump("fk_ref_epoch")
    v = parent.version()
    assert parent.try_commit(v, [], [], "stale-del",
                             fk_removal=True) is False
    # fresh captures commit fine (empty barrier commits)
    acid._gate_state(child)
    assert child.try_commit(child.version(), [], [], "fresh-child")
    acid._gate_state(parent, removal=True)
    assert parent.try_commit(parent.version(), [], [], "fresh-del",
                             fk_removal=True)


def test_fk_boundaries_refuse_loudly(spark):
    parent, child = _mk_pair(spark, n_parent=10, n_child=20)
    src = spark.range(0, 5).select(F.col("id").alias("c_id"),
                                   F.lit(0).alias("seg"))
    with pytest.raises(ValueError, match="RESTORE"):
        acid.restore_table(parent, 0)
    with pytest.raises(ValueError, match="SYNC"):
        acid.sync_snapshot_spark(spark, parent, src, "c_id")
    with pytest.raises(ValueError, match="SYNC"):
        acid.sync_snapshot_spark(
            spark, child,
            spark.range(0, 5).select(F.col("id").alias("o_id"),
                                     F.lit(1).alias("c_id"),
                                     F.lit(0).alias("amt")), "o_id")


def test_fk_multi_parent_child(spark):
    p1, child = _mk_pair(spark)
    p2 = TableLog(_tmp("fkp2_"))
    acid.write_initial_spark(
        spark, p2,
        spark.range(0, 3).select(F.col("id").alias("r_id")),
        "r_id", n_buckets=2)
    # add a second FK column via schema-evolving merge, all values valid
    acid.merge_upsert_spark(
        spark, child,
        spark.range(0, 200).select(
            F.col("id").alias("o_id"),
            (F.col("id") % 50).alias("c_id"),
            (F.col("id") * 2).alias("amt"),
            (F.col("id") % 3).alias("r_id")), "o_id")
    alter_add_foreign_key(spark, child, "fk_region", "r_id", p2.path)
    # a row violating only the SECOND fk fails
    with pytest.raises(Exception, match="fk_region"):
        acid.merge_upsert_spark(
            spark, child,
            spark.createDataFrame([(950, 1, 0, 9)],
                                  "o_id long, c_id long, amt long, "
                                  "r_id long"), "o_id")
    # both parents fence: each registered exactly once
    assert [r["name"] for r in p1.fk_referenced_by()] == ["fk_cust"]
    assert [r["name"] for r in p2.fk_referenced_by()] == ["fk_region"]
    # valid two-parent row lands
    acid.merge_upsert_spark(
        spark, child,
        spark.createDataFrame([(951, 1, 0, 2)],
                              "o_id long, c_id long, amt long, "
                              "r_id long"), "o_id")


def test_fk_quarantine_reprocess_after_parent_arrives(spark):
    """The FK expectations loop closes like CHECK's: orphans divert,
    the missing parents ARRIVE (instead of a rule change), reprocess
    replays the DLQ through MERGE — now-valid rows land, still-orphaned
    rows re-divert with the reprocess writer's provenance."""
    parent, child = _mk_pair(spark, on_violation="quarantine")
    st = acid.merge_upsert_spark(
        spark, child,
        spark.createDataFrame([(700, 200, 1), (701, 300, 2)],
                              "o_id long, c_id long, amt long"),
        "o_id")
    assert st["quarantined"] == 2
    # parent 200 arrives; 300 never does
    acid.merge_upsert_spark(
        spark, parent,
        spark.createDataFrame([(200, 0)], "c_id long, seg long"),
        "c_id")
    st = acid.reprocess_quarantine_spark(spark, child)
    assert st["n_replayed"] == 2 and st["n_rediverted"] == 1, st
    live = acid.read_snapshot_spark(spark, child)
    assert live.filter(F.col("o_id") == 700).count() == 1
    assert live.filter(F.col("o_id") == 701).count() == 0
    q = acid.read_quarantine(spark, child)
    still = q.filter(F.col("_constraint") == "fk_cust").collect()
    assert {r["o_id"] for r in still} == {701}


def test_fk_cannot_be_declared_at_create(spark):
    t = TableLog(_tmp("fkx_"))
    with pytest.raises(ValueError, match="alter_add_foreign_key"):
        t.init(key="id", n_buckets=2, constraints={
            "fk": {"col": "x",
                   "foreign_key": {"parent": "/nope",
                                   "parent_key": "id"}}})


def test_fk_birth_races_parent_delete(spark):
    """Direction 3 (review-found): a parent key-removal validated when
    NO foreign key existed must not link after an ALTER ADD FOREIGN KEY
    registers mid-flight — the registration bumps fk_ref_epoch, the
    delete's always-armed removal gate trips, and the re-scan sees the
    new child's references (RESTRICT)."""
    parent = TableLog(_tmp("fkp_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, 20).select(F.col("id").alias("c_id"),
                                  (F.col("id") % 3).alias("seg")),
        "c_id", n_buckets=2)
    child = TableLog(_tmp("fkc_"))
    acid.write_initial_spark(
        spark, child,
        spark.range(0, 40).select(F.col("id").alias("o_id"),
                                  (F.col("id") % 20).alias("c_id")),
        "o_id", n_buckets=2)
    fired = {"n": 0}

    def hook(v):
        if fired["n"] == 0:
            fired["n"] = 1
            alter_add_foreign_key(spark, child, "fk_born", "c_id",
                                  parent.path)

    with pytest.raises(ValueError, match="RESTRICT"):
        acid.delete_keys_spark(
            spark, parent, spark.createDataFrame([(5,)], "c_id long"),
            "c_id", pre_commit_hook=hook)
    assert fired["n"] == 1
    # the key survived and the FK is installed
    assert acid.read_snapshot_spark(spark, parent).filter(
        F.col("c_id") == 5).count() == 1
    assert "fk_born" in child.fk_specs()


def _attach_spanning_sidecar(table, rows, files, key):
    """White-box: write ONE merged DV sidecar carrying (_df, key) rows
    for several files and attach it to each — the RESTORE-merged shape
    `_arrow_minus_dvs` defends against (sidecar rows apply only to
    their own file)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    name = table.new_dv_file()
    pq.write_table(
        pa.table({"_df": [r[0] for r in rows],
                  key: [r[1] for r in rows]}),
        table.data_path(name))
    assert table.try_commit(table.version(), [], [], "test-dv",
                            dvs={f: name for f in files})


def test_fk_restrict_pandas_spanning_sidecar_filters_by_file(spark):
    """ADVICE r7: the pandas RESTRICT scan subtracted a sidecar's whole
    key column without filtering rows to _df == f, so a spanning
    sidecar killed live referrers in OTHER files — a parent delete
    then passed RESTRICT and orphaned child rows."""
    parent = TableLog(_tmp("fksp_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, 10).select(F.col("id").alias("c_id")),
        "c_id", n_buckets=2)
    child = TableLog(_tmp("fksc_"))
    acid.write_initial_spark(
        spark, child,
        spark.createDataFrame([(1, 1, 0), (2, 2, 0)],
                              "o_id long, c_id long, amt long"),
        "o_id", n_buckets=2)
    alter_add_foreign_key(spark, child, "fk", "c_id", parent.path)
    # two copies of o_id=11 (blind appends), each referencing c_id=7
    vA = acid.append_spark(spark, child, _row(spark, 11, 7),
                           "o_id")["committed_version"]
    gA = child.read_commit(vA)["adds"][0]["file"]
    vB = acid.append_spark(spark, child, _row(spark, 11, 7),
                           "o_id")["committed_version"]
    gF = child.read_commit(vB)["adds"][0]["file"]
    # merged sidecar: kills gA's copy; its gF row names a key that is
    # NOT in gF (999999) — gF's (11, 7) row stays LIVE
    _attach_spanning_sidecar(child, [(gA, 11), (gF, 999999)],
                             [gA, gF], "o_id")
    # c_id=7 is still referenced by gF's live row: RESTRICT must fire
    with pytest.raises(ValueError, match="RESTRICT"):
        acid.delete_keys_pandas(parent, [7], "c_id")


def test_fk_parent_keys_pandas_spanning_sidecar_filters_by_file(spark):
    """Sibling direction: the pandas membership probe undercounted the
    parent's LIVE key set under a spanning sidecar, spuriously
    rejecting a valid child insert."""
    parent = TableLog(_tmp("fksp2_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, 4).select(F.col("id").alias("c_id")),
        "c_id", n_buckets=2)
    child = TableLog(_tmp("fksc2_"))
    acid.write_initial_spark(
        spark, child,
        spark.createDataFrame([(1, 1, 0)],
                              "o_id long, c_id long, amt long"),
        "o_id", n_buckets=2)
    alter_add_foreign_key(spark, child, "fk", "c_id", parent.path)
    # two copies of parent key 6; the merged sidecar kills pA's copy
    # and names an absent key for pB — pB's key 6 stays LIVE
    vA = acid.append_spark(
        spark, parent,
        spark.createDataFrame([(6,)], "c_id long"),
        "c_id")["committed_version"]
    pA = parent.read_commit(vA)["adds"][0]["file"]
    vB = acid.append_spark(
        spark, parent,
        spark.createDataFrame([(6,)], "c_id long"),
        "c_id")["committed_version"]
    pB = parent.read_commit(vB)["adds"][0]["file"]
    _attach_spanning_sidecar(parent, [(pA, 6), (pB, 888888)],
                             [pA, pB], "c_id")
    # key 6 is live (pB): the pandas-client child insert must pass
    acid.append_pandas(
        child, pd.DataFrame({"o_id": [50], "c_id": [6], "amt": [1]}),
        "o_id")
    got = acid.read_policy_pandas(child)
    assert 50 in set(got["o_id"])
