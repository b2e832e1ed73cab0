"""Atomic REPLACE WHERE (acid.overwrite_where_spark): predicate delete
+ insert in ONE commit — region swap without the delete-then-append
window. Covers atomicity (single version, time travel to the
pre-image), DV non-resurrection, the everything-must-match-the-
predicate rail, untouched files staying byte-identical, UNIQUE against
retained rows only, FK both roles (restrict on removed keys, membership
on incoming), the OCC lost-race recompute, and the loud boundaries
(column-mapped / identity tables)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources.acid import TableLog, overwrite_where_spark


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _mk(spark, n=100, n_buckets=4, **init_kw):
    t = TableLog(_tmp("rw_"))
    df = spark.range(0, n).select(
        "id", (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"))
    acid.write_initial_spark(spark, t, df, "id", n_buckets=n_buckets,
                             **init_kw)
    return t


def _new(spark, lo, hi, part=0, v=777):
    return spark.range(lo, hi).select(
        "id", F.lit(part).cast("int").alias("part"),
        F.lit(v).cast("long").alias("v"))


def test_replace_is_one_commit_with_time_travel(spark):
    t = _mk(spark)
    v0 = t.version()
    st = overwrite_where_spark(spark, t, "part = 0",
                               _new(spark, 200, 210))
    assert t.version() == v0 + 1 and st["attempts"] == 1
    assert st["rows_deleted"] == 25 and st["rows_inserted"] == 10
    cur = acid.read_snapshot_spark(spark, t)
    assert cur.filter(F.col("part") == 0).count() == 10
    assert cur.filter((F.col("part") == 0) & (F.col("v") != 777)
                      ).count() == 0
    assert cur.filter(F.col("part") != 0).count() == 75
    # the pre-image is one version back, intact
    old = acid.read_snapshot_spark(spark, t, version=v0)
    assert old.filter(F.col("part") == 0).count() == 25


def test_replace_folds_dvs_and_never_resurrects(spark):
    t = _mk(spark)
    acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(8,), (9,)], "id long"), "id")
    st = overwrite_where_spark(spark, t, "part = 0",
                               _new(spark, 200, 205))
    # id 8 (part 0) was DV-hidden: not counted deleted, not resurrected
    assert st["rows_deleted"] == 24
    cur = acid.read_snapshot_spark(spark, t, dv_key="id")
    assert cur.filter(F.col("id").isin(8, 9)).count() == 0
    # id 9 (part 1, untouched file) still needs its DV folded
    assert cur.count() == 75 - 1 + 5


def test_incoming_rows_must_match_predicate(spark):
    t = _mk(spark)
    with pytest.raises(ValueError, match="do not satisfy"):
        overwrite_where_spark(
            spark, t, "part = 1",
            spark.createDataFrame([(900, 2, 1)],
                                  "id long, part int, v long"))
    # NULL predicate result counts as non-matching (SQL WHERE)
    with pytest.raises(ValueError, match="do not satisfy"):
        overwrite_where_spark(
            spark, t, "part = 1",
            spark.createDataFrame([(901, None, 1)],
                                  "id long, part int, v long"))


def test_untouched_files_not_rewritten(spark):
    t = _mk(spark)
    _, live0 = t.snapshot()
    st = overwrite_where_spark(spark, t, "part = 0",
                               _new(spark, 200, 204))
    _, live1 = t.snapshot()
    # every file without a predicate hit survives under the same name
    kept = set(live0) & set(live1)
    assert len(kept) == len(live0) - st["files_rewritten"]


def test_empty_region_is_plain_insert(spark):
    t = _mk(spark)
    st = overwrite_where_spark(spark, t, "part = 9",
                               spark.createDataFrame(
                                   [(300, 9, 1)],
                                   "id long, part int, v long"))
    assert st["rows_deleted"] == 0 and st["files_rewritten"] == 0
    assert st["rows_inserted"] == 1
    assert acid.read_snapshot_spark(spark, t).count() == 101


def test_unique_checks_against_retained_rows_only(spark):
    t = _mk(spark, constraints={"pk": {"col": "id", "unique": True}})
    # reusing a key from the REPLACED region is legal
    overwrite_where_spark(
        spark, t, "part = 0",
        spark.createDataFrame([(0, 0, 1)], "id long, part int, v long"))
    # colliding with a RETAINED key is not
    with pytest.raises(ValueError, match="surviving"):
        overwrite_where_spark(
            spark, t, "part = 0",
            spark.createDataFrame([(1, 0, 1)],
                                  "id long, part int, v long"))
    # batch-internal duplicates are caught too
    with pytest.raises(ValueError, match="within the batch"):
        overwrite_where_spark(
            spark, t, "part = 0",
            spark.createDataFrame([(400, 0, 1), (400, 0, 2)],
                                  "id long, part int, v long"))


def test_replace_respects_fk_both_roles(spark):
    parent = TableLog(_tmp("rwp_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, 20).select(F.col("id").alias("c_id")),
        "c_id", n_buckets=2)
    child = TableLog(_tmp("rwc_"))
    acid.write_initial_spark(
        spark, child,
        spark.range(0, 40).select(
            F.col("id").alias("o_id"),
            (F.col("id") % 20).alias("c_id"),
            (F.col("id") % 2).cast("int").alias("half")),
        "o_id", n_buckets=2)
    acid.alter_add_foreign_key(spark, child, "fk", "c_id", parent.path)
    # child role: incoming rows are membership-checked
    with pytest.raises(Exception, match="FOREIGN KEY"):
        overwrite_where_spark(
            spark, child, "half = 0",
            spark.createDataFrame([(100, 99, 0)],
                                  "o_id long, c_id long, half int"))
    # parent role: a replace that removes referenced keys RESTRICTs
    with pytest.raises(ValueError, match="RESTRICT"):
        overwrite_where_spark(
            spark, parent, "c_id < 5",
            spark.createDataFrame([], "c_id long"))


def test_lost_race_recomputes_against_new_head(spark):
    t = _mk(spark)
    fired = {"n": 0}

    def hook(v):
        if fired["n"] == 0:
            fired["n"] = 1
            # a merge lands a NEW part-0 row mid-replace
            acid.merge_upsert_spark(
                spark, t,
                spark.createDataFrame([(500, 0, 5)],
                                      "id long, part int, v long"),
                "id")

    st = overwrite_where_spark(spark, t, "part = 0",
                               _new(spark, 200, 203),
                               pre_commit_hook=hook)
    assert fired["n"] == 1 and st["attempts"] == 2
    # the retry's scan saw the merged row: it was replaced away too
    assert st["rows_deleted"] == 26
    cur = acid.read_snapshot_spark(spark, t)
    assert cur.filter(F.col("id") == 500).count() == 0
    assert cur.filter(F.col("part") == 0).count() == 3


def test_boundaries_refuse(spark):
    t = _mk(spark)
    acid.alter_rename_column(t, "v", "val")
    with pytest.raises(ValueError, match="column-mapped"):
        overwrite_where_spark(spark, t, "part = 0",
                              _new(spark, 200, 201))
    t2 = TableLog(_tmp("rw_"))
    acid.write_initial_spark(
        spark, t2,
        spark.range(0, 10).select("id", F.lit(1).alias("x")),
        "id", n_buckets=2, identity={"col": "rid"})
    with pytest.raises(ValueError, match="IDENTITY"):
        overwrite_where_spark(spark, t2, "x = 1",
                              spark.createDataFrame(
                                  [(90, 1)], "id long, x long"))


def test_unique_checks_kept_rows_of_rewritten_files(spark):
    """The review-found gap: a rewritten file can hold BOTH matching
    and kept rows (predicate not aligned with buckets). An incoming key
    colliding with a KEPT row of that very file must be refused — it
    survives the rewrite."""
    t = TableLog(_tmp("rw_"))
    # one bucket => one file holds part 0 AND part 1 rows
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"))
    acid.write_initial_spark(
        spark, t, df, "id", n_buckets=1,
        constraints={"pk": {"col": "id", "unique": True}})
    # id=1 has part=1 (kept); replacing part=0 with a row reusing id=1
    # must refuse — id=1 survives inside the rewritten file
    with pytest.raises(ValueError, match="surviving"):
        overwrite_where_spark(
            spark, t, "part = 0",
            spark.createDataFrame([(1, 0, 5)],
                                  "id long, part int, v long"))
    # reusing a REPLACED key (id=0, part=0) from the same file is legal
    st = overwrite_where_spark(
        spark, t, "part = 0",
        spark.createDataFrame([(0, 0, 5)],
                              "id long, part int, v long"))
    assert st["rows_deleted"] == 10 and st["rows_inserted"] == 1


def _fk_region_pair(spark):
    parent = TableLog(_tmp("rwfp_"))
    acid.write_initial_spark(
        spark, parent,
        spark.range(0, 20).select(F.col("id").alias("c_id"),
                                  (F.col("id") % 3).alias("seg")),
        "c_id", n_buckets=2)
    child = TableLog(_tmp("rwfc_"))
    acid.write_initial_spark(
        spark, child,
        spark.range(0, 40).select(
            F.col("id").alias("o_id"),
            (F.col("id") % 20).alias("c_id")),
        "o_id", n_buckets=2)
    acid.alter_add_foreign_key(spark, child, "fk", "c_id", parent.path)
    return parent, child


def test_replace_reinserting_referenced_keys_passes_restrict(spark):
    """ADVICE r7: rebuilding a referenced region IN PLACE (the
    primitive's primary backfill use) re-inserts every matched key in
    the same atomic commit — no missing-parent window exists, so
    RESTRICT must only fire for keys that actually LEAVE."""
    parent, child = _fk_region_pair(spark)
    st = overwrite_where_spark(
        spark, parent, "c_id < 5",
        spark.range(0, 5).select(F.col("id").alias("c_id"),
                                 F.lit(9).cast("long").alias("seg")))
    assert st["rows_deleted"] == 5 and st["rows_inserted"] == 5
    got = {(r["c_id"], r["seg"]) for r in
           acid.read_snapshot_spark(spark, parent)
           .filter(F.col("c_id") < 5).collect()}
    assert got == {(i, 9) for i in range(5)}
    # a referenced key actually LEAVING still restricts: drop key 0
    with pytest.raises(ValueError, match="RESTRICT"):
        overwrite_where_spark(
            spark, parent, "c_id < 5",
            spark.range(1, 5).select(F.col("id").alias("c_id"),
                                     F.lit(9).cast("long").alias("seg")))


def test_insert_only_replace_does_not_fence_child_writers(spark):
    """ADVICE r7: an empty-region REPLACE WHERE removes nothing, so it
    must not bump fk_del_epoch (a spurious bump restarts every
    concurrent child writer's validated batch)."""
    parent, child = _fk_region_pair(spark)
    e0 = parent.fk_del_epoch()
    st = overwrite_where_spark(
        spark, parent, "c_id >= 100",
        spark.range(100, 105).select(F.col("id").alias("c_id"),
                                     F.lit(0).cast("long").alias("seg")))
    assert st["files_rewritten"] == 0 and st["rows_inserted"] == 5
    assert parent.fk_del_epoch() == e0
    # a replace that DOES remove keys still bumps (the fence half)
    overwrite_where_spark(
        spark, parent, "c_id >= 100",
        spark.range(100, 103).select(F.col("id").alias("c_id"),
                                     F.lit(0).cast("long").alias("seg")))
    assert parent.fk_del_epoch() == e0 + 1
