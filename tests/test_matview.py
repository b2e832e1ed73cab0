"""Incremental materialized views (sources/matview.py): every refresh
must land the EXACT rows a from-scratch recompute produces — under
appends, updates, group-moving updates, deletes, filtered specs, NULL
group keys and all-NULL sum columns — with exactly-once apply across
the crash window (pending-token recovery) and the one-commit-per-refresh
contract (group death is a tombstone, reclaimed separately)."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources.acid import TableLog
from distribot_spark.sources import matview as mv


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


SPEC = {
    "group_by": ["cat"],
    "aggs": {
        "cnt": {"fn": "count"},
        "total": {"fn": "sum", "col": "val"},
        "avg_val": {"fn": "avg", "col": "val"},
        "lo": {"fn": "min", "col": "val"},
        "hi": {"fn": "max", "col": "val"},
    },
}


def _base_df(spark, lo=0, hi=200):
    # cat 4 carries ONLY NULL vals (the SUM-of-no-values → NULL group)
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 5).cast("int").alias("cat"),
        F.when(F.col("id") % 5 == 4, F.lit(None).cast("decimal(12,2)"))
        .otherwise(F.expr("CAST((id * 37 % 1000) / 100.0 "
                          "AS DECIMAL(12,2))")).alias("val"),
    )


def _mk(spark, spec=SPEC, n=200):
    base = TableLog(_tmp("mvb_"))
    acid.write_initial_spark(spark, base, _base_df(spark, 0, n), "id",
                             n_buckets=4)
    view = TableLog(_tmp("mvv_"))
    mv.create_matview(spark, base, view, spec, n_buckets=2)
    return base, view


def _rows(df):
    return sorted(
        tuple(str(x) for x in r) for r in df.collect())


def _assert_view_equals_recompute(spark, base, view, spec=SPEC):
    got = _rows(mv.read_matview(spark, view))
    want = _rows(mv.matview_full_spark(spark, base, spec))
    assert got == want


def test_create_matches_recompute(spark):
    base, view = _mk(spark)
    _assert_view_equals_recompute(spark, base, view)


def test_refresh_mixed_workload_equals_recompute(spark):
    base, view = _mk(spark)
    # appends (new keys), updates (new val), group moves (new cat),
    # deletes — the full CDF alphabet
    acid.merge_upsert_spark(spark, base, _base_df(spark, 200, 260), "id")
    upd = _base_df(spark, 0, 40).select(
        "id", "cat", (F.coalesce(F.col("val"), F.lit(0)) + 7)
        .cast("decimal(12,2)").alias("val"))
    acid.merge_upsert_spark(spark, base, upd, "id")
    mover = _base_df(spark, 40, 60).select(
        "id", ((F.col("cat") + 1) % 5).cast("int").alias("cat"), "val")
    acid.merge_upsert_spark(spark, base, mover, "id")
    acid.delete_keys_spark(
        spark, base, spark.range(0, 260).filter(F.col("id") % 7 == 0)
        .select("id"), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0 and st["groups_upserted"] > 0
    _assert_view_equals_recompute(spark, base, view)


def test_paged_refresh_equals_one_shot(spark):
    base, view = _mk(spark, n=100)
    base2 = base  # same base drives a second, one-shot view
    view2 = TableLog(_tmp("mvv_"))
    mv.create_matview(spark, base2, view2, SPEC, n_buckets=2)
    for lo in (100, 140, 180):
        acid.merge_upsert_spark(
            spark, base, _base_df(spark, lo, lo + 40), "id")
    acid.delete_keys_spark(
        spark, base, spark.range(0, 220).filter(F.col("id") % 11 == 0)
        .select("id"), "id")
    steps = 0
    while True:
        st = mv.refresh_matview(spark, base, view, max_versions=1)
        steps += 1
        if st["behind"] == 0:
            break
    assert steps == 4  # one per base commit: the pacing knob paces
    one = mv.refresh_matview(spark, base2, view2)
    assert one["behind"] == 0
    assert _rows(mv.read_matview(spark, view)) == _rows(
        mv.read_matview(spark, view2))
    _assert_view_equals_recompute(spark, base, view)


def test_minmax_recomputes_on_extreme_delete(spark):
    base, view = _mk(spark)
    top = (acid.read_snapshot_spark(spark, base)
           .filter(F.col("cat") == 1)
           .orderBy(F.col("val").desc()).limit(1).collect()[0])
    acid.delete_keys_spark(
        spark, base,
        spark.createDataFrame([(top["id"],)], "id long"), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] >= 1
    row = {r["cat"]: r for r in mv.read_matview(spark, view).collect()}
    assert str(row[1]["hi"]) != str(top["val"])
    _assert_view_equals_recompute(spark, base, view)


def test_all_null_sum_group_and_null_transition(spark):
    base, view = _mk(spark)
    got = {r["cat"]: r for r in mv.read_matview(spark, view).collect()}
    assert got[4]["total"] is None and got[4]["cnt"] > 0
    assert got[4]["avg_val"] is None
    # drive cat 0 all-NULL via updates: its sum must BECOME NULL
    nullify = (acid.read_snapshot_spark(spark, base)
               .filter(F.col("cat") == 0)
               .select("id", "cat",
                       F.lit(None).cast("decimal(12,2)").alias("val")))
    acid.merge_upsert_spark(spark, base, nullify, "id")
    mv.refresh_matview(spark, base, view)
    got = {r["cat"]: r for r in mv.read_matview(spark, view).collect()}
    assert got[0]["total"] is None and got[0]["cnt"] > 0
    _assert_view_equals_recompute(spark, base, view)


def test_group_death_tombstone_purge_and_rebirth(spark):
    base, view = _mk(spark)
    v_before = view.version()
    doomed = (acid.read_snapshot_spark(spark, base)
              .filter(F.col("cat") == 2).select("id"))
    acid.delete_keys_spark(spark, base, doomed, "id")
    mv.refresh_matview(spark, base, view)
    # ONE view commit per refresh, even with a dying group
    assert view.version() == v_before + 1
    cats = {r["cat"] for r in mv.read_matview(spark, view).collect()}
    assert 2 not in cats
    raw = acid.read_snapshot_spark(spark, view)
    assert raw.filter(F.col("_mv_cnt") == 0).count() == 1  # tombstone
    assert mv.purge_matview_tombstones(spark, view) == 1
    assert acid.read_snapshot_spark(spark, view).filter(
        F.col("_mv_cnt") == 0).count() == 0
    # rebirth folds from zero exactly like an absent group
    acid.merge_upsert_spark(
        spark, base,
        spark.createDataFrame([(9001, 2, "42.42"), (9002, 2, None)],
                              "id long, cat int, val string")
        .select("id", "cat", F.col("val").cast("decimal(12,2)")
                .alias("val")), "id")
    mv.refresh_matview(spark, base, view)
    _assert_view_equals_recompute(spark, base, view)


def test_crash_after_merge_before_cursor_is_exactly_once(spark):
    base, view = _mk(spark, n=100)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 100, 130), "id")
    before_apply = view.version()
    st = mv.refresh_matview(spark, base, view)
    hi = st["to_version"]
    tok = view.read_commit(view.version())["writer"]
    # rewind the cursor to simulate dying between MERGE and cursor write
    state = mv._load_state(view)
    state["last_applied"] = hi - 1
    state["pending"] = {"token": tok,
                        "view_version_before": before_apply,
                        "on_landed": {"last_applied": hi}}
    mv._write_state(view, state)
    st2 = mv.refresh_matview(spark, base, view)
    # recovery saw the landed token: no re-apply, no double count
    assert st2["behind"] == 0 and st2["groups_upserted"] == 0
    assert view.version() == before_apply + 1
    _assert_view_equals_recompute(spark, base, view)


def test_crash_before_merge_replays_range_once(spark):
    base, view = _mk(spark, n=100)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 100, 130), "id")
    state = mv._load_state(view)
    state["pending"] = {"token": "never-landed",
                        "view_version_before": view.version(),
                        "on_landed": {"last_applied": base.version()}}
    mv._write_state(view, state)
    st = mv.refresh_matview(spark, base, view)
    assert st["groups_upserted"] > 0 and st["behind"] == 0
    _assert_view_equals_recompute(spark, base, view)
    assert "pending" not in mv._load_state(view)


def test_filtered_spec_rows_crossing_the_filter(spark):
    spec = {
        "group_by": ["cat"],
        "aggs": {"cnt": {"fn": "count"},
                 "total": {"fn": "sum", "col": "val"}},
        "filter": "val >= 3.00",
    }
    base, view = _mk(spark, spec=spec)
    snap = acid.read_snapshot_spark(spark, base)
    # push some rows BELOW the filter, pull some above it
    down = (snap.filter(F.col("val") >= 5).limit(20)
            .select("id", "cat",
                    F.lit("1.00").cast("decimal(12,2)").alias("val")))
    up = (snap.filter(F.col("val") < 3).limit(20)
          .select("id", "cat",
                  F.lit("9.99").cast("decimal(12,2)").alias("val")))
    acid.merge_upsert_spark(spark, base, down.union(up), "id")
    mv.refresh_matview(spark, base, view)
    _assert_view_equals_recompute(spark, base, view, spec)


def test_null_group_key_is_its_own_group(spark):
    spec = {"group_by": ["tag"],
            "aggs": {"cnt": {"fn": "count"},
                     "total": {"fn": "sum", "col": "val"}}}
    base = TableLog(_tmp("mvb_"))
    df = spark.range(0, 60).select(
        "id",
        F.when(F.col("id") % 3 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 2).cast("string")))
        .alias("tag"),
        F.expr("CAST(id AS DECIMAL(10,2))").alias("val"))
    acid.write_initial_spark(spark, base, df, "id", n_buckets=2)
    view = TableLog(_tmp("mvv_"))
    mv.create_matview(spark, base, view, spec, n_buckets=2)
    acid.delete_keys_spark(
        spark, base, spark.range(0, 60).filter(F.col("id") % 6 == 0)
        .select("id"), "id")
    mv.refresh_matview(spark, base, view)
    got = mv.read_matview(spark, view)
    assert got.filter(F.col("tag").isNull()).count() == 1
    _assert_view_equals_recompute(spark, base, view, spec)


def test_float_sum_rejected(spark):
    base = TableLog(_tmp("mvb_"))
    df = spark.range(0, 10).select(
        "id", (F.col("id") % 2).cast("int").alias("cat"),
        (F.col("id") * 1.5).alias("val"))
    acid.write_initial_spark(spark, base, df, "id", n_buckets=2)
    view = TableLog(_tmp("mvv_"))
    with pytest.raises(ValueError, match="order-dependent"):
        mv.create_matview(
            spark, base, view,
            {"group_by": ["cat"],
             "aggs": {"s": {"fn": "sum", "col": "val"}}})


def test_non_contiguous_feed_fails_loudly(spark):
    base, view = _mk(spark, n=50)
    # a delete-only batch for a GROUP the view never saw drives its
    # count negative — the guard must refuse rather than corrupt the
    # view (a delete of an unseen row in an existing group, by
    # contrast, legally decrements: the guard is per group)
    bogus = spark.createDataFrame(
        [(999, 99, "5.00", "delete", 1)],
        "id long, cat int, val string, _change_type string, "
        "_commit_version long").select(
        "id", "cat", F.col("val").cast("decimal(12,2)").alias("val"),
        "_change_type", "_commit_version")
    state = mv._load_state(view)
    delta = mv.matview_delta(spark, state["spec"], state["scales"], bogus)
    with pytest.raises(ValueError, match="below zero"):
        mv._apply_delta(spark, view, state["spec"], state["scales"],
                        delta, "tok-test", base=base,
                        base_version=base.version())


def test_spec_validation(spark):
    with pytest.raises(ValueError, match="group_by"):
        mv._validate_spec({"group_by": [], "aggs": {"c": {"fn": "count"}}})
    with pytest.raises(ValueError, match="unsupported"):
        mv._validate_spec({"group_by": ["a"],
                           "aggs": {"c": {"fn": "median", "col": "x"}}})
    with pytest.raises(ValueError, match="needs a col"):
        mv._validate_spec({"group_by": ["a"], "aggs": {"c": {"fn": "sum"}}})
    with pytest.raises(ValueError, match="riders"):
        mv._validate_spec({"group_by": ["a"],
                           "aggs": {"_mv_x": {"fn": "count"}}})


def _changes(spark, base, frm, to=None):
    return acid.table_changes_spark(spark, base, "id", from_version=frm,
                                    to_version=to)


def test_streaming_apply_redelivery_skipped(spark):
    spec = {"group_by": ["cat"],
            "aggs": {"cnt": {"fn": "count"},
                     "total": {"fn": "sum", "col": "val"}}}
    base, view = _mk(spark, spec=spec, n=80)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 80, 120), "id")
    ch = _changes(spark, base, 1)
    st = mv.apply_matview_changes(spark, view, ch, batch_id=0, writer="t")
    assert not st["skipped"] and st["groups_upserted"] > 0
    st2 = mv.apply_matview_changes(spark, view, ch, batch_id=0, writer="t")
    assert st2["skipped"]
    _assert_view_equals_recompute(spark, base, view, spec)
    # a LOWER batch id (late replay of an old batch) also skips
    st3 = mv.apply_matview_changes(spark, view, ch, batch_id=-1,
                                   writer="t")
    assert st3["skipped"]


def test_streaming_apply_crash_window_exactly_once(spark):
    spec = {"group_by": ["cat"],
            "aggs": {"cnt": {"fn": "count"},
                     "total": {"fn": "sum", "col": "val"}}}
    base, view = _mk(spark, spec=spec, n=80)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 80, 120), "id")
    ch = _changes(spark, base, 1)
    before = view.version()
    st = mv.apply_matview_changes(spark, view, ch, batch_id=0, writer="t")
    assert not st["skipped"]
    tok = view.read_commit(view.version())["writer"]
    # simulate dying between the MERGE and the hwm write: hwm rolled
    # back, pending points at the landed token
    state = mv._load_state(view)
    state.pop("hwm_t", None)
    state["pending"] = {"token": tok, "view_version_before": before,
                        "on_landed": {"hwm_t": 0}}
    mv._write_state(view, state)
    st2 = mv.apply_matview_changes(spark, view, ch, batch_id=0,
                                   writer="t")
    assert st2["skipped"]  # recovery promoted the hwm: no double fold
    assert view.version() == before + 1
    _assert_view_equals_recompute(spark, base, view, spec)


def test_streaming_apply_minmax_loss_refused(spark):
    base, view = _mk(spark, n=80)  # SPEC includes min/max
    acid.delete_keys_spark(
        spark, base, spark.range(0, 80).filter(F.col("id") % 9 == 0)
        .select("id"), "id")
    ch = _changes(spark, base, 1)
    with pytest.raises(ValueError, match="min/max"):
        mv.apply_matview_changes(spark, view, ch, batch_id=0, writer="t")


def test_delta_plan_stays_jvm_side(spark):
    from distribot_spark.plans import uses_python_eval

    base, view = _mk(spark, n=80)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 80, 120), "id")
    state = mv._load_state(view)
    delta = mv.matview_delta(spark, state["spec"], state["scales"],
                             _changes(spark, base, 1))
    assert not uses_python_eval(delta)
    assert not uses_python_eval(mv.read_matview(spark, view))


def test_streaming_apply_minmax_with_base_pin(spark):
    """min/max streaming: with the base handle, a row-losing batch
    recomputes dirty groups AS OF the batch's own last commit version —
    even when the base has already moved PAST that version (the racing
    commit arrives as the next batch, not as leakage into this one)."""
    base, view = _mk(spark, n=100)  # SPEC includes min/max
    # batch 0 = v1: delete the current max of cat 1
    top = (acid.read_snapshot_spark(spark, base)
           .filter(F.col("cat") == 1)
           .orderBy(F.col("val").desc()).limit(1).collect()[0])
    acid.delete_keys_spark(
        spark, base,
        spark.createDataFrame([(top["id"],)], "id long"), "id")
    ch1 = _changes(spark, base, 1, 1)
    # the base moves on (v2) BEFORE batch 0 is folded
    acid.merge_upsert_spark(spark, base, _base_df(spark, 100, 140), "id")
    st = mv.apply_matview_changes(spark, view, ch1, batch_id=0,
                                  writer="t", base=base)
    assert st["dirty_recomputed"] >= 1
    # view state == recompute AS OF v1 (not head: v2 not folded yet)
    got = _rows(mv.read_matview(spark, view))
    want = _rows(mv.matview_full_spark(spark, base, SPEC, version=1))
    assert got == want
    # fold v2 as the next batch: now equal to head
    st = mv.apply_matview_changes(spark, view, _changes(spark, base, 2, 2),
                                  batch_id=1, writer="t", base=base)
    _assert_view_equals_recompute(spark, base, view)


def test_refresh_claim_blocks_concurrent_refresh(spark):
    """ADVICE r7: two overlapping refreshes would both pop the pending
    marker and double-fold the same change range (deltas are not
    idempotent) — a fresh claim must make the second caller refuse."""
    base, view = _mk(spark)
    cursor0 = int(mv._load_state(view)["last_applied"])
    acid.merge_upsert_spark(spark, base, _base_df(spark, 200, 220), "id")
    with open(mv._claim_path(view), "w") as fh:
        json.dump({"token": "other-holder", "writer": "cron-1"}, fh)
    with pytest.raises(mv.MatviewRefreshBusy, match="in flight"):
        mv.refresh_matview(spark, base, view)
    # cursor unmoved: the refused call folded nothing
    assert int(mv._load_state(view)["last_applied"]) == cursor0
    os.unlink(mv._claim_path(view))
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0
    # claim released on exit
    assert not os.path.exists(mv._claim_path(view))
    _assert_view_equals_recompute(spark, base, view)


def test_refresh_claim_steals_stale_holder(spark):
    """A claim older than the lease is a crashed holder: steal it,
    resolve its pending marker (inside the claim), and refresh."""
    import time as _time

    base, view = _mk(spark)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 200, 230), "id")
    p = mv._claim_path(view)
    with open(p, "w") as fh:
        json.dump({"token": "dead-holder", "writer": "crashed"}, fh)
    old = _time.time() - 10 * mv.DEFAULT_REFRESH_LEASE
    os.utime(p, (old, old))
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0
    assert not os.path.exists(p)
    _assert_view_equals_recompute(spark, base, view)


def test_streaming_apply_shares_the_refresh_claim(spark):
    """A streaming apply racing a batch refresh (or a second stream on
    the same view) must refuse, not double-fold."""
    spec = {"group_by": ["cat"],
            "aggs": {"cnt": {"fn": "count"},
                     "total": {"fn": "sum", "col": "val"}}}
    base, view = _mk(spark, spec=spec, n=80)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 80, 120), "id")
    ch = _changes(spark, base, 1)
    with open(mv._claim_path(view), "w") as fh:
        json.dump({"token": "batch-refresh", "writer": "cron"}, fh)
    with pytest.raises(mv.MatviewRefreshBusy):
        mv.apply_matview_changes(spark, view, ch, batch_id=0, writer="t")
    os.unlink(mv._claim_path(view))
    st = mv.apply_matview_changes(spark, view, ch, batch_id=0, writer="t")
    assert not st["skipped"]
    _assert_view_equals_recompute(spark, base, view, spec)


# ---- bounded min/max RIDER (spec rider_k) ----------------------------


RIDER_SPEC = {**SPEC, "rider_k": 8}


def _ids_of_extremes(spark, base, cat, n, desc=False):
    col = F.col("val").desc() if desc else F.col("val").asc()
    rows = (acid.read_snapshot_spark(spark, base)
            .filter((F.col("cat") == cat) & F.col("val").isNotNull())
            .orderBy(col, "id").limit(n).collect())
    return spark.createDataFrame([(r["id"],) for r in rows], "id long")


def test_rider_extreme_deletes_need_no_recompute(spark):
    """Deletes of both extremes WITHIN the rider depth fold with zero
    base scans — the self-maintaining min/max contract."""
    base, view = _mk(spark, spec=RIDER_SPEC)
    acid.delete_keys_spark(spark, base,
                           _ids_of_extremes(spark, base, 1, 3), "id")
    acid.delete_keys_spark(spark, base,
                           _ids_of_extremes(spark, base, 2, 3, desc=True),
                           "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0 and st["dirty_recomputed"] == 0
    _assert_view_equals_recompute(spark, base, view, RIDER_SPEC)


def test_rider_overflow_recomputes_and_refills(spark):
    """Evicting MORE extremes than the rider tracks empties it → the
    one dirty recompute, which also refills the rider so the NEXT
    in-depth eviction is again self-maintaining."""
    spec = {**SPEC, "rider_k": 3}
    base, view = _mk(spark, spec=spec)
    acid.delete_keys_spark(spark, base,
                           _ids_of_extremes(spark, base, 1, 5), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] >= 1
    _assert_view_equals_recompute(spark, base, view, spec)
    acid.delete_keys_spark(spark, base,
                           _ids_of_extremes(spark, base, 1, 2), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0  # refilled rider covers depth 2
    _assert_view_equals_recompute(spark, base, view, spec)


def test_rider_mixed_workload_equals_recompute(spark):
    """The full CDF alphabet under a rider spec — refresh ≡ recompute
    exactly, whatever mix of admissions/evictions/group-moves ran."""
    base, view = _mk(spark, spec=RIDER_SPEC)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 200, 260), "id")
    upd = _base_df(spark, 0, 40).select(
        "id", "cat", (F.coalesce(F.col("val"), F.lit(0)) + 7)
        .cast("decimal(12,2)").alias("val"))
    acid.merge_upsert_spark(spark, base, upd, "id")
    mover = _base_df(spark, 40, 60).select(
        "id", ((F.col("cat") + 1) % 5).cast("int").alias("cat"), "val")
    acid.merge_upsert_spark(spark, base, mover, "id")
    acid.delete_keys_spark(
        spark, base, spark.range(0, 260).filter(F.col("id") % 7 == 0)
        .select("id"), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0
    _assert_view_equals_recompute(spark, base, view, RIDER_SPEC)


def _mk_vals(spark, vals, rider_k, aggs=None):
    """One-group base with exactly ``vals`` and a rider'd min/max."""
    base = TableLog(_tmp("mvb_"))
    df = spark.createDataFrame(
        [(i, 0, v) for i, v in enumerate(vals)],
        "id long, cat int, val long")
    acid.write_initial_spark(spark, base, df, "id", n_buckets=2)
    spec = {"group_by": ["cat"],
            "aggs": aggs or {"cnt": {"fn": "count"},
                             "lo": {"fn": "min", "col": "val"},
                             "hi": {"fn": "max", "col": "val"}},
            "rider_k": rider_k}
    view = TableLog(_tmp("mvv_"))
    mv.create_matview(spark, base, view, spec, n_buckets=2)
    return base, view, spec


def _del_ids(spark, base, ids):
    acid.delete_keys_spark(
        spark, base,
        spark.createDataFrame([(i,) for i in ids], "id long"), "id")


def test_rider_deficient_must_not_admit_above_boundary(spark):
    """THE unsafe case the admission filter exists for: a deficient
    (shrunken) rider does not know the values between its boundary and
    the group's untracked tail, so an insert ABOVE the boundary must
    not enter — admitting it would later surface a wrong min."""
    base, view, spec = _mk_vals(spark, [3, 5, 9], rider_k=2)
    _del_ids(spark, base, [1])          # val 5: rider [3,5] -> [3]
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0  # nonempty rider: min exact
    _assert_view_equals_recompute(spark, base, view, spec)
    acid.merge_upsert_spark(                       # insert val 10
        spark, base,
        spark.createDataFrame([(100, 0, 10)],
                              "id long, cat int, val long"), "id")
    mv.refresh_matview(spark, base, view)
    _del_ids(spark, base, [0])          # val 3: rider must EMPTY
    st = mv.refresh_matview(spark, base, view)
    # had 10 been admitted, the rider would read [10] here (no dirty)
    # and report min=10 while the true min is the untracked 9
    assert st["dirty_recomputed"] == 1
    _assert_view_equals_recompute(spark, base, view, spec)
    row = mv.read_matview(spark, view).collect()[0]
    assert int(row["lo"]) == 9 and int(row["hi"]) == 10


def test_rider_admits_inside_boundary_and_ties(spark):
    """Inserts at-or-inside the tracked boundary refill a shrunken
    rider; duplicate values at the boundary evict one occurrence per
    delete (multiset semantics)."""
    base, view, spec = _mk_vals(spark, [1, 1, 1, 2, 30], rider_k=2)
    _del_ids(spark, base, [0, 1])       # two 1s: rider [1,1] -> []
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 1  # emptied -> refilled [1,2]
    _assert_view_equals_recompute(spark, base, view, spec)
    _del_ids(spark, base, [2])          # last 1: rider [2]
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0
    acid.merge_upsert_spark(                       # insert 2 (== bound)
        spark, base,
        spark.createDataFrame([(200, 0, 2)],
                              "id long, cat int, val long"), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0  # tie admitted: rider [2,2]
    _del_ids(spark, base, [3])          # one 2: rider [2] stays exact
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0
    _assert_view_equals_recompute(spark, base, view, spec)
    row = mv.read_matview(spark, view).collect()[0]
    assert int(row["lo"]) == 2 and int(row["hi"]) == 30


def test_rider_streaming_without_base_survives_row_loss(spark):
    """The verdict-6 contract: a STREAMING min/max view with NO base
    handle folds row-losing batches fine while evictions stay inside
    the rider depth."""
    base, view = _mk(spark, spec=RIDER_SPEC)
    acid.delete_keys_spark(spark, base,
                           _ids_of_extremes(spark, base, 1, 4), "id")
    st = mv.apply_matview_changes(spark, view, _changes(spark, base, 1),
                                  batch_id=0, writer="t")  # no base=
    assert not st["skipped"] and st["dirty_recomputed"] == 0
    _assert_view_equals_recompute(spark, base, view, RIDER_SPEC)


def test_rider_streaming_without_base_overflow_refuses(spark):
    """Past the rider depth with no base handle there is nothing exact
    left to serve — refuse loudly (the pre-rider behavior, now scoped
    to genuine exhaustion)."""
    spec = {**SPEC, "rider_k": 2}
    base, view = _mk(spark, spec=spec)
    acid.delete_keys_spark(spark, base,
                           _ids_of_extremes(spark, base, 1, 4), "id")
    with pytest.raises(ValueError, match="rider depth"):
        mv.apply_matview_changes(spark, view, _changes(spark, base, 1),
                                 batch_id=0, writer="t")


def test_rider_group_death_and_rebirth(spark):
    base, view, spec = _mk_vals(spark, [4, 7], rider_k=4)
    _del_ids(spark, base, [0, 1])
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0  # tombstone, not recompute
    assert mv.read_matview(spark, view).count() == 0
    acid.merge_upsert_spark(
        spark, base,
        spark.createDataFrame([(10, 0, 42)],
                              "id long, cat int, val long"), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0
    _assert_view_equals_recompute(spark, base, view, spec)
    row = mv.read_matview(spark, view).collect()[0]
    assert int(row["lo"]) == 42 and int(row["hi"]) == 42


def test_rider_spec_validation(spark):
    with pytest.raises(ValueError, match="rider_k"):
        mv._validate_spec({**SPEC, "rider_k": 0})
    with pytest.raises(ValueError, match="rider_k"):
        mv._validate_spec({**SPEC, "rider_k": "four"})


def test_rider_join_matview_streaming_skips_snapshot_recompute(spark):
    """JOIN matviews share the rider fold: the handles are still
    needed for the delta JOIN itself, but with a rider a row-losing
    fact batch folds with dirty_recomputed == 0 — the pinned
    two-snapshot join scan (the expensive recompute) never runs while
    evictions stay inside the rider depth."""
    from distribot_spark.sources.matview import (
        apply_join_matview_changes,
        create_join_matview,
        join_matview_full_spark,
    )

    fact = TableLog(_tmp("mvjf_"))
    dim = TableLog(_tmp("mvjd_"))
    acid.write_initial_spark(
        spark, fact,
        spark.range(0, 120).select(
            "id", (F.col("id") % 6).alias("fk"),
            (F.col("id") * 7 % 100).alias("v")),
        "id", n_buckets=4)
    acid.write_initial_spark(
        spark, dim,
        spark.range(0, 6).select(
            F.col("id").alias("dk"),
            (F.col("id") % 2).cast("int").alias("side")),
        "dk", n_buckets=2)
    spec = {"group_by": ["side"],
            "join": {"fact_fk": "fk", "dim_key": "dk"},
            "aggs": {"cnt": {"fn": "count"},
                     "lo": {"fn": "min", "col": "v"},
                     "hi": {"fn": "max", "col": "v"}},
            "rider_k": 8}
    view = TableLog(_tmp("mvjv_"))
    create_join_matview(spark, fact, dim, view, spec, n_buckets=2)
    # delete rows carrying each side's current min AND max (well
    # inside rider depth 8)
    doomed = []
    snap = (acid.read_snapshot_spark(spark, fact).alias("f")
            .join(acid.read_snapshot_spark(spark, dim).alias("d"),
                  F.col("f.fk") == F.col("d.dk")))
    for side in (0, 1):
        for asc in (True, False):
            col = F.col("v").asc() if asc else F.col("v").desc()
            doomed += [r["id"] for r in snap
                       .filter(F.col("side") == side)
                       .orderBy(col, "id").limit(2).select("f.id")
                       .collect()]
    acid.delete_keys_spark(
        spark, fact,
        spark.createDataFrame([(i,) for i in set(doomed)], "id long"),
        "id")
    ch = acid.table_changes_spark(spark, fact, "id", from_version=1)
    st = apply_join_matview_changes(spark, view, ch, side="fact",
                                    batch_id=0, writer="t",
                                    fact=fact, dim=dim)
    # the rider absorbed the extreme loss: zero dirty groups, so the
    # pinned joined-snapshot scan never executed
    assert st["dirty_recomputed"] == 0 and not st["skipped"]
    got = _rows(mv.read_matview(spark, view))
    want = _rows(join_matview_full_spark(spark, fact, dim, spec))
    assert got == want


def test_rider_delta_plan_stays_jvm_side(spark):
    """The rider fold is all higher-order SQL (collect_list, slice,
    sort_array, filter/aggregate lambdas) — no Python eval may appear
    in the delta or the view read under a rider spec."""
    from distribot_spark.plans import uses_python_eval

    base, view = _mk(spark, spec=RIDER_SPEC, n=80)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 80, 120), "id")
    state = mv._load_state(view)
    delta = mv.matview_delta(spark, state["spec"], state["scales"],
                             _changes(spark, base, 1))
    assert not uses_python_eval(delta)
    assert not uses_python_eval(mv.read_matview(spark, view))


# ---- incremental TOP-K aggregates (bottomk / topk) --------------------


TOPK_SPEC = {
    "group_by": ["cat"],
    "aggs": {
        "cnt": {"fn": "count"},
        "bot": {"fn": "bottomk", "col": "val", "k": 3},
        "top": {"fn": "topk", "col": "val", "k": 3},
    },
    "rider_k": 8,
}


def test_topk_create_and_mixed_workload_equals_recompute(spark):
    base, view = _mk(spark, spec=TOPK_SPEC)
    acid.merge_upsert_spark(spark, base, _base_df(spark, 200, 260), "id")
    mover = _base_df(spark, 40, 60).select(
        "id", ((F.col("cat") + 1) % 5).cast("int").alias("cat"), "val")
    acid.merge_upsert_spark(spark, base, mover, "id")
    acid.delete_keys_spark(
        spark, base, spark.range(0, 260).filter(F.col("id") % 7 == 0)
        .select("id"), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0
    _assert_view_equals_recompute(spark, base, view, TOPK_SPEC)
    row = {r["cat"]: r for r in mv.read_matview(spark, view).collect()}
    b = [str(x) for x in row[1]["bot"]]
    assert len(b) == 3 and b == sorted(b)  # k smallest, ascending
    t = [str(x) for x in row[1]["top"]]
    assert len(t) == 3 and t == sorted(t, reverse=True)


def test_topk_deficiency_is_stricter_than_minmax(spark):
    """min/max stay exact while the rider is merely NONEMPTY; an
    exposed bottomk(k) needs the prefix complete to depth k — losing
    enough tracked values to shrink below k (but not to zero) must
    recompute, where a min-only spec would not."""
    base, view, spec = _mk_vals(spark, [1, 2, 3, 4, 5], rider_k=3,
                                aggs={"cnt": {"fn": "count"},
                                      "bot": {"fn": "bottomk",
                                              "col": "val", "k": 2}})
    _del_ids(spark, base, [0, 1])  # rider [1,2,3] -> [3]: size 1 < k 2
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 1
    _assert_view_equals_recompute(spark, base, view, spec)
    row = mv.read_matview(spark, view).collect()[0]
    assert [int(x) for x in row["bot"]] == [3, 4]
    # within depth again: a single eviction folds with no recompute
    _del_ids(spark, base, [2])     # rider (refilled to 3) [3,4,5]->[4,5]
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0
    row = mv.read_matview(spark, view).collect()[0]
    assert [int(x) for x in row["bot"]] == [4, 5]


def test_topk_small_group_is_whole_group(spark):
    base, view, spec = _mk_vals(spark, [7, 9], rider_k=4,
                                aggs={"cnt": {"fn": "count"},
                                      "top": {"fn": "topk",
                                              "col": "val", "k": 3}})
    row = mv.read_matview(spark, view).collect()[0]
    assert [int(x) for x in row["top"]] == [9, 7]
    acid.merge_upsert_spark(
        spark, base,
        spark.createDataFrame([(50, 0, 20)],
                              "id long, cat int, val long"), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["dirty_recomputed"] == 0
    row = mv.read_matview(spark, view).collect()[0]
    assert [int(x) for x in row["top"]] == [20, 9, 7]


def test_topk_spec_validation(spark):
    with pytest.raises(ValueError, match="positive int k"):
        mv._validate_spec({"group_by": ["a"], "rider_k": 4,
                           "aggs": {"b": {"fn": "topk", "col": "v"}}})
    with pytest.raises(ValueError, match="rider_k >= k"):
        mv._validate_spec({"group_by": ["a"], "rider_k": 2,
                           "aggs": {"b": {"fn": "topk", "col": "v",
                                          "k": 5}}})
    with pytest.raises(ValueError, match="rider_k >= k"):
        mv._validate_spec({"group_by": ["a"],
                           "aggs": {"b": {"fn": "bottomk", "col": "v",
                                          "k": 2}}})


def test_update_where_commits_fold_into_refresh(spark):
    """The round-9 UPDATE verb composes with IVM for free: an
    update_where commit is a plain rewrite commit, so the CDF reports
    update_pre/post pairs and the refresh folds them like any MERGE
    update — value changes, a predicate-driven GROUP MOVE, and an
    update racing other alphabet letters all land recompute-exact."""
    base, view = _mk(spark)
    # value update inside a group
    acid.update_where_spark(spark, base, "cat = 1 AND id < 60",
                            {"val": "val + 5"})
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0
    _assert_view_equals_recompute(spark, base, view)
    # predicate-driven group move (cat is the view's group key)
    acid.update_where_spark(spark, base, "cat = 2 AND id < 30",
                            {"cat": "3"})
    # and an interleaved delete + append before the next refresh
    acid.delete_keys_spark(
        spark, base, spark.range(0, 200).filter(F.col("id") % 13 == 0)
        .select("id"), "id")
    acid.merge_upsert_spark(spark, base, _base_df(spark, 200, 230), "id")
    st = mv.refresh_matview(spark, base, view)
    assert st["behind"] == 0
    _assert_view_equals_recompute(spark, base, view)
