"""IVM over joins (sources/matview.py join section): a fact⋈dim
aggregate view maintained from BOTH tables' change feeds via
delta-join algebra (ΔV = ΔF⋈D_new ∪ F_old⋈ΔD) — refresh ≡ recompute
under the full CDF alphabet on EACH side, paging ≡ one-shot, the
sequenced per-batch streaming apply under any interleaving, and the
single-table crash/lease machinery carried over."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources import matview as mv
from distribot_spark.sources.acid import TableLog


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


SPEC = {
    "join": {"fact_fk": "fk", "dim_key": "dk"},
    "group_by": ["seg"],
    "aggs": {
        "cnt": {"fn": "count"},
        "total": {"fn": "sum", "col": "cents"},
        "lo": {"fn": "min", "col": "cents"},
        "hi": {"fn": "max", "col": "cents"},
    },
}

SPEC_SUMS = {
    "join": {"fact_fk": "fk", "dim_key": "dk"},
    "group_by": ["seg"],
    "aggs": {"cnt": {"fn": "count"},
             "total": {"fn": "sum", "col": "cents"}},
}


def _fact_rows(spark, lo, hi, fk_shift=0, cents_mult=3):
    return spark.range(lo, hi).select(
        F.col("id").alias("oid"),
        ((F.col("id") + fk_shift) % 20).alias("fk"),
        (F.col("id") * cents_mult).alias("cents"))


def _mk(spark, spec=SPEC):
    fact, dim, view = (TableLog(_tmp("jmf_")), TableLog(_tmp("jmd_")),
                       TableLog(_tmp("jmv_")))
    acid.write_initial_spark(spark, fact, _fact_rows(spark, 0, 300),
                             "oid", n_buckets=4)
    acid.write_initial_spark(
        spark, dim,
        spark.range(0, 20).select(
            F.col("id").alias("dk"),
            F.concat(F.lit("seg"),
                     (F.col("id") % 4).cast("string")).alias("seg")),
        "dk", n_buckets=2)
    mv.create_join_matview(spark, fact, dim, view, spec, n_buckets=2)
    return fact, dim, view


def _assert_equals_recompute(spark, fact, dim, view, spec=SPEC):
    got = sorted(tuple(str(x) for x in r)
                 for r in mv.read_matview(spark, view).collect())
    want = sorted(tuple(str(x) for x in r)
                  for r in mv.join_matview_full_spark(
                      spark, fact, dim, spec).collect())
    assert got == want


def _full_alphabet(spark, fact, dim):
    """insert/update(+fk move)/delete on the FACT; attr update (mass
    group move)/insert(+referring facts)/delete on the DIM."""
    acid.merge_upsert_spark(spark, fact, _fact_rows(spark, 300, 340),
                            "oid")
    acid.merge_upsert_spark(
        spark, fact, _fact_rows(spark, 0, 30, fk_shift=7,
                                cents_mult=5), "oid")
    acid.delete_keys_spark(
        spark, fact,
        spark.range(0, 340).filter(F.col("id") % 11 == 0)
        .select(F.col("id").alias("oid")), "oid")
    acid.merge_upsert_spark(
        spark, dim,
        spark.range(0, 20).filter(F.col("id") % 5 == 0).select(
            F.col("id").alias("dk"), F.lit("MOVED").alias("seg")),
        "dk")
    acid.merge_upsert_spark(
        spark, dim,
        spark.range(100, 103).select(F.col("id").alias("dk"),
                                     F.lit("NEW").alias("seg")), "dk")
    acid.merge_upsert_spark(
        spark, fact,
        spark.range(500, 506).select(
            F.col("id").alias("oid"),
            (F.lit(100) + F.col("id") % 3).alias("fk"),
            F.lit(7).cast("long").alias("cents")), "oid")
    acid.delete_keys_spark(spark, dim,
                           spark.createDataFrame([(3,)], "dk long"),
                           "dk")


def test_create_matches_recompute(spark):
    fact, dim, view = _mk(spark)
    _assert_equals_recompute(spark, fact, dim, view)


def test_full_alphabet_both_sides(spark):
    fact, dim, view = _mk(spark)
    _full_alphabet(spark, fact, dim)
    st = mv.refresh_join_matview(spark, fact, dim, view)
    assert st["behind"] == 0 and st["groups_upserted"] > 0
    assert st["dirty_recomputed"] > 0  # deletes dirty min/max groups
    _assert_equals_recompute(spark, fact, dim, view)


def test_paged_refresh_equals_one_shot(spark):
    fact, dim, view = _mk(spark)
    _full_alphabet(spark, fact, dim)
    n = 0
    while True:
        st = mv.refresh_join_matview(spark, fact, dim, view,
                                     max_versions=1)
        n += 1
        if st["behind"] == 0:
            break
        assert n < 50
    assert n > 1  # actually paged
    _assert_equals_recompute(spark, fact, dim, view)


def test_dim_delete_drops_dangling_facts(spark):
    """INNER-join semantics: deleting a dim row removes its facts'
    contribution from the view (exactly — dirty recompute included)."""
    fact, dim, view = _mk(spark)
    acid.delete_keys_spark(spark, dim,
                           spark.createDataFrame([(0,), (1,)],
                                                 "dk long"), "dk")
    st = mv.refresh_join_matview(spark, fact, dim, view)
    assert st["behind"] == 0
    _assert_equals_recompute(spark, fact, dim, view)
    segs = {r["seg"] for r in mv.read_matview(spark, view).collect()}
    assert "seg0" in segs  # dk=4,8,... still feed seg0


def test_streaming_applies_interleaved(spark):
    """Per-batch sequenced folds from the two feeds, interleaved
    dim/fact/dim — exact at every step against the recompute pinned at
    the view's cursors."""
    fact, dim, view = _mk(spark, spec=SPEC_SUMS)
    # fact v1, dim v1, fact v2
    acid.merge_upsert_spark(spark, fact, _fact_rows(spark, 300, 330),
                            "oid")
    acid.merge_upsert_spark(
        spark, dim,
        spark.range(0, 20).filter(F.col("id") % 3 == 0).select(
            F.col("id").alias("dk"), F.lit("SHIFTED").alias("seg")),
        "dk")
    acid.delete_keys_spark(
        spark, fact,
        spark.range(0, 50).select(F.col("id").alias("oid")), "oid")

    def ch(t, v):
        return acid.table_changes_spark(spark, t, from_version=v,
                                        to_version=v)

    st = mv.apply_join_matview_changes(
        spark, view, ch(fact, 1), "fact", batch_id=0, writer="t",
        fact=fact, dim=dim)
    assert not st["skipped"]
    st = mv.apply_join_matview_changes(
        spark, view, ch(dim, 1), "dim", batch_id=0, writer="t",
        fact=fact, dim=dim)
    assert not st["skipped"]
    st = mv.apply_join_matview_changes(
        spark, view, ch(fact, 2), "fact", batch_id=1, writer="t",
        fact=fact, dim=dim)
    assert not st["skipped"]
    _assert_equals_recompute(spark, fact, dim, view, SPEC_SUMS)
    # redelivery of either side skips
    assert mv.apply_join_matview_changes(
        spark, view, ch(fact, 2), "fact", batch_id=1,
        writer="t", fact=fact, dim=dim)["skipped"]
    assert mv.apply_join_matview_changes(
        spark, view, ch(dim, 1), "dim", batch_id=0,
        writer="t", fact=fact, dim=dim)["skipped"]


def test_streaming_minmax_needs_both_handles(spark):
    fact, dim, view = _mk(spark)  # SPEC has min/max
    acid.delete_keys_spark(
        spark, fact,
        spark.range(0, 20).select(F.col("id").alias("oid")), "oid")
    ch = acid.table_changes_spark(spark, fact, from_version=1,
                                  to_version=1)
    with pytest.raises(ValueError, match="min/max"):
        mv.apply_join_matview_changes(spark, view, ch, "fact",
                                      batch_id=0, writer="t", dim=dim)
    st = mv.apply_join_matview_changes(
        spark, view, ch, "fact", batch_id=0, writer="t2",
        fact=fact, dim=dim)
    assert st["dirty_recomputed"] > 0
    _assert_equals_recompute(spark, fact, dim, view)


def test_crash_window_exactly_once(spark):
    """Pending-token recovery: a crash between the merge and the
    cursor write must not double-fold on recovery (cursors for BOTH
    sides ride on_landed)."""
    fact, dim, view = _mk(spark, spec=SPEC_SUMS)
    _full_alphabet(spark, fact, dim)
    # run the refresh, then simulate the crash by restoring the PENDING
    # state file as if the cursor write never happened
    pre_state = mv._load_state(view)
    v_before = view.version()
    st = mv.refresh_join_matview(spark, fact, dim, view)
    assert st["behind"] == 0
    post_state = mv._load_state(view)
    tok_state = dict(pre_state)
    tok_state["pending"] = {
        "token": _landed_token(view),
        "view_version_before": v_before,
        "on_landed": {"last_fact": post_state["last_fact"],
                      "last_dim": post_state["last_dim"]}}
    mv._write_state(view, tok_state)
    st2 = mv.refresh_join_matview(spark, fact, dim, view)
    assert st2["behind"] == 0 and st2["groups_upserted"] == 0
    _assert_equals_recompute(spark, fact, dim, view, SPEC_SUMS)


def _landed_token(view):
    """The writer token of the view's last merge commit."""
    return view.read_commit(view.version())["writer"]


def test_lease_guard_shared(spark):
    fact, dim, view = _mk(spark, spec=SPEC_SUMS)
    acid.merge_upsert_spark(spark, fact, _fact_rows(spark, 300, 310),
                            "oid")
    with open(mv._claim_path(view), "w") as fh:
        json.dump({"token": "other", "writer": "cron"}, fh)
    with pytest.raises(mv.MatviewRefreshBusy):
        mv.refresh_join_matview(spark, fact, dim, view)
    os.unlink(mv._claim_path(view))
    assert mv.refresh_join_matview(spark, fact, dim,
                                   view)["behind"] == 0
