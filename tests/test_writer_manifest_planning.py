"""Writer-path manifest planning (`manifest.bucket_files_manifest` +
`acid._plan_bucket_state`): a MERGE's per-attempt planning state comes
from a bucket-filtered Spark job over the parquet-checkpoint manifest
instead of the O(live files) driver JSON fold once the checkpoint
outgrows the threshold (delete_keys_spark rides the same seam; the
threshold-0 workload routes its DV deletes through it too) — pinned
state-identical to the driver path across conflicts, DV-state changes
and checkpoint boundaries."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources import manifest as mf
from distribot_spark.sources.acid import TableLog


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _mk(spark):
    t = TableLog(_tmp("wmp_"))
    acid.write_initial_spark(
        spark, t,
        spark.range(0, 200).select(
            "id", (F.col("id") % 7).alias("g"),
            (F.col("id") * 10).alias("v")),
        "id", n_buckets=4)
    return t


def _cross_checkpoint(spark, t):
    """Drive the table past a parquet-checkpoint boundary with an
    eventful history: rewrites, key DVs, positional DVs."""
    for lo in (0, 30, 60, 90, 120, 150):
        acid.merge_upsert_spark(
            spark, t,
            spark.range(lo, lo + 40).select(
                "id", (F.col("id") % 7).alias("g"),
                (F.col("id") * 11).alias("v")),
            "id")
    acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(5,), (9,)], "id long"), "id")
    acid.delete_where_spark(spark, t, "g = 6")
    for lo in (160, 180):
        acid.merge_upsert_spark(
            spark, t,
            spark.range(lo, lo + 15).select(
                "id", (F.col("id") % 7).alias("g"),
                F.lit(-3).alias("v")),
            "id")
    assert mf.newest_checkpoint_parquet(t, t.version()) > 0


def test_bucket_files_manifest_equals_snapshot_filter(spark):
    t = _mk(spark)
    _cross_checkpoint(spark, t)
    for buckets in ({0}, {1, 3}, {0, 1, 2, 3}, set()):
        v_m, live_m, dvs_m = mf.bucket_files_manifest(spark, t, buckets)
        v_d, live = t.snapshot()
        want_live = {f: b for f, b in live.items() if b in buckets}
        want_dvs = {f: ds for f, ds in t.live_dvs().items()
                    if f in want_live}
        assert v_m == v_d
        assert live_m == want_live, buckets
        assert {f: sorted(d) for f, d in dvs_m.items()} == {
            f: sorted(d) for f, d in want_dvs.items()}, buckets


def test_merge_via_manifest_path_state_identical(spark, monkeypatch):
    """The same workload through BOTH planning paths lands the same
    table: merges after the checkpoint boundary, a DV commit between
    compute and commit (the dvstate conflict that forces a recompute),
    and a plain version race. Row sets must match exactly."""

    def workload(t, forced_races):
        _cross_checkpoint(spark, t)

        def race_dv(v):
            if not forced_races.get("dv"):
                forced_races["dv"] = True
                # a DV lands on a touched bucket between compute and
                # commit: content changed, file set didn't — the
                # planner must see the new DV state on the retry
                acid.delete_keys_spark(
                    spark, t,
                    spark.createDataFrame([(14,)], "id long"), "id")

        st = acid.merge_upsert_spark(
            spark, t,
            spark.range(10, 20).select(
                "id", (F.col("id") % 7).alias("g"),
                F.lit(999).alias("v")),
            "id", pre_commit_hook=race_dv)
        assert st["recomputes"] >= 1, st
        acid.merge_upsert_spark(
            spark, t,
            spark.range(300, 320).select(
                "id", (F.col("id") % 7).alias("g"),
                F.lit(7).alias("v")),
            "id")
        return sorted(map(tuple, acid.read_snapshot_spark(
            spark, t, dv_key="id").collect()))

    t_driver = _mk(spark)
    rows_driver = workload(t_driver, {})

    monkeypatch.setattr(acid, "PLAN_VIA_MANIFEST_MIN_BYTES", 0)
    calls = {"n": 0}
    real = mf.bucket_files_manifest

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(mf, "bucket_files_manifest", spy)
    t_manifest = _mk(spark)
    rows_manifest = workload(t_manifest, {})

    assert calls["n"] > 0, "manifest planning never engaged"
    assert rows_manifest == rows_driver
    assert t_manifest.version() == t_driver.version()


def test_default_threshold_keeps_small_tables_on_driver_path(
        spark, monkeypatch):
    calls = {"n": 0}
    real = mf.bucket_files_manifest

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(mf, "bucket_files_manifest", spy)
    t = _mk(spark)
    acid.merge_upsert_spark(
        spark, t,
        spark.range(0, 10).select(
            "id", (F.col("id") % 7).alias("g"), F.lit(1).alias("v")),
        "id")
    assert calls["n"] == 0  # tiny checkpoint: JSON fold wins


def test_auto_compact_trigger_agrees_across_paths(spark, monkeypatch):
    """The post-append trigger probe (the hottest planning call — it
    runs after EVERY append on an opted-in table) must decide
    identically from the manifest-job agg and the snapshot fold, and
    auto-compaction must land the same file layout either way."""
    def build(threshold):
        monkeypatch.setattr(acid, "PLAN_VIA_MANIFEST_MIN_BYTES",
                            threshold)
        t = TableLog(_tmp("wmpac_"))
        acid.write_initial_spark(
            spark, t,
            spark.range(0, 60).select(
                "id", (F.col("id") * 2).alias("v")),
            "id", n_buckets=2, auto_optimize=2)
        _cross_checkpoint_small(spark, t)
        for lo in (200, 210, 220, 230, 240, 250):
            acid.append_spark(spark, t, spark.range(lo, lo + 5).select(
                "id", (F.col("id") * 2).alias("v")))
        _, live = t.snapshot()
        per = {}
        for _f, b in live.items():
            per[b] = per.get(b, 0) + 1
        return per, sorted(map(tuple, acid.read_snapshot_spark(
            spark, t).collect()))

    def _cross_checkpoint_small(spark, t):
        for lo in (60, 80, 100, 120, 140, 160, 180):
            acid.merge_upsert_spark(
                spark, t, spark.range(lo, lo + 20).select(
                    "id", (F.col("id") * 2).alias("v")), "id")
        for i in (3, 7):
            acid.delete_keys_spark(
                spark, t,
                spark.createDataFrame([(i,)], "id long"), "id")

    per_driver, rows_driver = build(1 << 40)   # fold path only
    per_manifest, rows_manifest = build(0)     # manifest probe engaged
    assert rows_driver == rows_manifest
    # the debt bound holds identically: auto_optimize=2 keeps every
    # bucket at <= 2n+1 files between compactions on both paths
    assert max(per_driver.values()) <= 5
    assert max(per_manifest.values()) <= 5
