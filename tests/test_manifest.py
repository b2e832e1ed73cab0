"""Parquet checkpoint manifests (sources/manifest.py): the distributed
twin of the ACID log's driver-side fold.

Pins: (1) the commit winner writes a parquet checkpoint row-for-row
equal to the JSON fold, with id_hwm in the footer; (2) `manifest_df`
equals `_fold_entries` at the head AND at historical versions across
tails containing removes, same-name re-adds and DV appends; (3) the
Spark-job pruning paths return the SAME (kept, pruned) as the
driver-side `live_paths_pruned*`; (4) IO shape — manifest construction
reads ≤ CHECKPOINT_EVERY commit files and never a row per live file on
the driver; (5) retention and truncation treat parquet checkpoints
like JSON ones.
"""

import json
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distribot_spark.sources.acid import CHECKPOINT_EVERY, TableLog
from distribot_spark.sources import manifest as mf


def _tmp_table():
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix="manifest_", dir="/root/repo/.tmp")


def _write_file(t, name, ks):
    pq.write_table(pa.table({"k": ks, "val": [float(k) for k in ks]}),
                   t.data_path(name))


def _manifest_rows(spark, t, version=None):
    return {
        r["file"]: (r["pb"],
                    json.loads(r["stats_json"]) if r["stats_json"]
                    else {},
                    list(r["dvs"]))
        for r in mf.manifest_df(spark, t, version).collect()
    }


def _fold_rows(t, v):
    live, stats, dvs, _ = t._fold_entries(v)
    return {
        f: (b, stats.get(f) or {}, list(dvs.get(f) or []))
        for f, b in live.items()
    }


def _build_eventful_table():
    """A table whose tail past the last checkpoint exercises every
    fold rule: plain adds, removes, a same-name re-add (the ANALYZE
    pattern), DV appends to both checkpoint-era and tail-added files,
    and a DV naming a dead file (must be ignored)."""
    t = TableLog(_tmp_table())
    t.init()
    v = -1
    for i in range(CHECKPOINT_EVERY + 1):  # past the first checkpoint
        name = f"f{i:03d}.parquet"
        _write_file(t, name, [i])
        assert t.try_commit(
            v, [{"file": name, "pb": i % 3,
                 "stats": {"k": {"min": i, "max": i}}}], [], "w")
        v += 1
    # tail: remove f000; DV on checkpoint-era f001; add g0; DV on g0;
    # re-add f002 same name with fresh stats (its old DV must clear);
    # DV naming the dead f000 (ignored)
    assert t.try_commit(v, [], ["f000.parquet"], "w"); v += 1
    dv1 = t.new_dv_file()
    _write_file(t, dv1, [1])
    assert t.try_commit(v, [], [], "w", dvs={"f001.parquet": dv1}); v += 1
    _write_file(t, "g0.parquet", [100])
    assert t.try_commit(
        v, [{"file": "g0.parquet", "pb": 1,
             "stats": {"k": {"min": 100, "max": 100}}}], [], "w"); v += 1
    dv2 = t.new_dv_file()
    _write_file(t, dv2, [100])
    assert t.try_commit(v, [], [], "w", dvs={"g0.parquet": dv2}); v += 1
    dv3 = t.new_dv_file()
    _write_file(t, dv3, [2])
    assert t.try_commit(v, [], [], "w", dvs={"f002.parquet": dv3}); v += 1
    _write_file(t, "f002.parquet", [2, 20])
    assert t.try_commit(
        v, [{"file": "f002.parquet", "pb": 2,
             "stats": {"k": {"min": 2, "max": 20}}}],
        ["f002.parquet"], "w"); v += 1
    assert t.try_commit(
        v, [], [], "w", dvs={"f000.parquet": "dv-dead.parquet"}); v += 1
    return t, v


def test_parquet_checkpoint_matches_json_fold():
    t = TableLog(_tmp_table())
    t.init()
    v = -1
    for i in range(CHECKPOINT_EVERY):
        assert t.try_commit(
            v, [{"file": f"f{i}", "pb": i % 2,
                 "stats": {"k": {"min": i, "max": i}}}],
            [f"f{i-1}"] if i else [], "w",
            id_range=(i * 10, i * 10 + 5))
        v += 1
    p = mf.checkpoint_parquet_path(t, CHECKPOINT_EVERY)
    assert not os.path.exists(p)
    assert t.try_commit(v, [{"file": "last", "pb": 0}], [], "w")
    assert os.path.exists(p)

    live, stats, dvs, hwm = t._fold_entries(CHECKPOINT_EVERY)
    tbl = pq.read_table(p)
    rows = {
        r["file"]: (r["pb"],
                    json.loads(r["stats_json"]) if r["stats_json"]
                    else {},
                    r["dvs"])
        for r in tbl.to_pylist()
    }
    assert set(rows) == set(live)
    for f in live:
        assert rows[f][0] == live[f]
        assert rows[f][1] == (stats.get(f) or {})
    assert mf.checkpoint_id_hwm(t, CHECKPOINT_EVERY) == hwm == 95


def test_manifest_df_equals_driver_fold(spark):
    t, head = _build_eventful_table()
    assert head > CHECKPOINT_EVERY
    # at the head (tail covers removes/re-adds/DV appends) ...
    assert _manifest_rows(spark, t) == _fold_rows(t, head)
    # ... at the checkpoint itself (empty tail) ...
    assert _manifest_rows(spark, t, CHECKPOINT_EVERY) == _fold_rows(
        t, CHECKPOINT_EVERY)
    # ... at every tail version (each prefix of the eventful tail) ...
    for v in range(CHECKPOINT_EVERY, head + 1):
        assert _manifest_rows(spark, t, v) == _fold_rows(t, v), v
    # ... and BELOW the checkpoint (bootstrap fold path)
    assert _manifest_rows(spark, t, 3) == _fold_rows(t, 3)
    # path column points into the data dir
    r = mf.manifest_df(spark, t).limit(1).collect()[0]
    assert r["path"] == t.data_path(r["file"])


def test_manifest_df_io_shape_bounded():
    """Manifest construction reads ≤ CHECKPOINT_EVERY+1 commit files
    (the tail) — never the whole log, and never a driver dict of live
    files (the bootstrap fold is monkeypatch-fenced)."""
    t, head = _build_eventful_table()
    reads = []
    orig_read = t.read_commit
    t.read_commit = lambda v: (reads.append(v), orig_read(v))[1]

    def _no_fold(*a, **k):
        raise AssertionError("driver fold must not run past a ckpt")

    t._fold_entries = _no_fold
    dead, upserts, dv_appends = mf._tail_fold(t, CHECKPOINT_EVERY + 1,
                                              head)
    assert len(reads) <= CHECKPOINT_EVERY + 1
    # tail structures are O(tail), and they carry the right facts
    assert dead == {"f000.parquet"}
    assert set(upserts) == {"g0.parquet", "f002.parquet"}
    assert upserts["f002.parquet"][2] == []  # re-add cleared the DV
    assert list(dv_appends) == ["f001.parquet"]


def test_manifest_prune_matches_driver_prune(spark):
    """Range + bloom pruning as Spark jobs return byte-identical
    (kept, pruned) to the driver-side JSON fold, on a REAL table with
    footer stats and blooms."""
    from distribot_spark.sources.acid import (
        append_spark,
        delete_keys_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    base = spark.range(0, 600).selectExpr(
        "id AS k", "CAST(id % 7 AS DOUBLE) AS val")
    # initial files carry NO stats (conservative keep on both paths);
    # appended files carry k min/max AND a bloom on k
    write_initial_spark(spark, t, base, "k", n_buckets=4)
    for w in range(3):
        up = spark.range(600 + 200 * w, 800 + 200 * w).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS val")
        append_spark(spark, t, up, stats_cols=("k",), bloom_key=True)
    delete_keys_spark(
        spark, t,
        spark.createDataFrame([(5,), (700,)], "k long"),
        "k", 4, "deleter")

    for lo, hi in [(0, 50), (650, 750), (10_000, 20_000)]:
        kd, pd_ = t.live_paths_pruned("k", lo, hi)
        km, pm = mf.live_paths_pruned_manifest(spark, t, "k", lo, hi)
        assert (km, pm) == (sorted(kd), pd_), (lo, hi)
    for val in (5, 700, 999_999):
        kd, pd_ = t.live_paths_pruned_point("k", val)
        km, pm = mf.live_paths_pruned_point_manifest(spark, t, "k", val)
        assert (km, pm) == (sorted(kd), pd_), val
    # blooms actually prune in this layout (not a vacuous equality)
    assert t.live_paths_pruned_point("k", 5)[1] > 0
    # string-typed bounds follow the lexicographic JSON semantics
    t2 = TableLog(_tmp_table())
    dated = spark.createDataFrame(
        [(i, f"19{96 + i % 3}-01-0{1 + i % 9}") for i in range(40)],
        "k long, d string")
    write_initial_spark(spark, t2, dated, "k", n_buckets=2)
    append_spark(spark, t2, dated.filter("k % 2 = 0"),
                 stats_cols=("d",))
    kd, pd_ = t2.live_paths_pruned("d", "1996-01-01", "1996-12-31")
    km, pm = mf.live_paths_pruned_manifest(
        spark, t2, "d", "1996-01-01", "1996-12-31")
    assert (km, pm) == (sorted(kd), pd_)


def test_manifest_respects_retention_and_truncation(spark):
    t, head = _build_eventful_table()
    from distribot_spark.sources.acid import SnapshotExpired

    t.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpired):
        mf.manifest_df(spark, t, CHECKPOINT_EVERY)
    assert _manifest_rows(spark, t, head) == _fold_rows(t, head)

    # truncate_log reclaims parquet checkpoints below the floor too
    t2 = TableLog(_tmp_table())
    t2.init()
    v = -1
    for i in range(3 * CHECKPOINT_EVERY + 1):
        assert t2.try_commit(
            v, [{"file": f"f{i}", "pb": 0}],
            [f"f{i-1}"] if i else [], "w")
        v += 1
    assert os.path.exists(mf.checkpoint_parquet_path(t2, CHECKPOINT_EVERY))
    t2.expire_snapshots(keep_last=1)
    removed = t2.truncate_log()
    assert f"v{CHECKPOINT_EVERY:012d}.checkpoint.parquet" in removed
    assert not os.path.exists(
        mf.checkpoint_parquet_path(t2, CHECKPOINT_EVERY))
    # the floor checkpoint's parquet twin survives for manifest reads
    assert os.path.exists(
        mf.checkpoint_parquet_path(t2, 3 * CHECKPOINT_EVERY))
    assert _manifest_rows(spark, t2) == _fold_rows(t2, v)
