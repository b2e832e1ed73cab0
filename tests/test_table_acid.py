"""Concurrent-writer table MERGE (sources/acid.py): two OS processes
upserting interleaved key sets into ONE table serialize through the
optimistic commit log with no lost updates — the flow/state.py
O_CREAT|O_EXCL claim discipline extended to data-table versions
(the reference's shared-durable-state core, flow.rb:31-52).

Covers: log primitives (one winner per version, torn-manifest
impossibility, checkpointed snapshots), the pandas and Spark MERGE
clients, deterministic conflict-rebase, two-process interleaved
upserts vs the sequential oracle, forced same-bucket contention, and
crash-debris vacuum.
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from distribot_spark.sources.acid import (
    CHECKPOINT_EVERY,
    TableLog,
    merge_upsert_pandas,
)

N_KEYS = 200  # mirrored in tests/acid_worker_proc.py


def _tmp_table():
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix="acid_", dir="/root/repo/.tmp")


def _init_table(path, n_buckets=4):
    t = TableLog(path)
    t.init()
    base = pd.DataFrame({"k": range(N_KEYS), "val": [-1] * N_KEYS})
    st = merge_upsert_pandas(t, base, "k", n_buckets, "init")
    assert st["committed_version"] == 0
    return t


def _read_table(t: TableLog) -> pd.DataFrame:
    frames = [pq.read_table(p).to_pandas() for p in t.live_paths()]
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values("k").reset_index(drop=True)
    )


# -- log primitives --------------------------------------------------------


def test_commit_single_winner_per_version():
    t = TableLog(_tmp_table())
    t.init()
    wins = [t.try_commit(-1, [{"file": f"f{i}", "pb": 0}], [], f"w{i}")
            for i in range(5)]
    assert sum(wins) == 1 and wins[0] is True
    assert t.version() == 0
    # next version again has exactly one winner, racing threads included
    results = []
    def attempt(i):
        results.append(t.try_commit(0, [{"file": f"g{i}", "pb": 1}], [], f"w{i}"))
    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert sum(results) == 1
    assert t.version() == 1


def test_snapshot_folds_adds_and_removes():
    t = TableLog(_tmp_table())
    t.init()
    assert t.try_commit(-1, [{"file": "a", "pb": 0}, {"file": "b", "pb": 1}], [], "w")
    assert t.try_commit(0, [{"file": "c", "pb": 0}], ["a"], "w")
    v, live = t.snapshot()
    assert v == 1 and live == {"b": 1, "c": 0}


def test_checkpoint_bounds_replay_and_survives_missing_checkpoint():
    t = TableLog(_tmp_table())
    t.init()
    assert t.try_commit(-1, [{"file": "f0", "pb": 0}], [], "w")
    for i in range(1, 2 * CHECKPOINT_EVERY + 3):
        assert t.try_commit(
            i - 1, [{"file": f"f{i}", "pb": 0}], [f"f{i-1}"], "w"
        )
    head = 2 * CHECKPOINT_EVERY + 2
    assert os.path.exists(t._checkpoint_path(CHECKPOINT_EVERY))
    assert os.path.exists(t._checkpoint_path(2 * CHECKPOINT_EVERY))
    v, live = t.snapshot()
    assert (v, live) == (head, {f"f{head}": 0})
    # checkpoints are an optimization, not a correctness dependency
    os.unlink(t._checkpoint_path(2 * CHECKPOINT_EVERY))
    assert t.snapshot() == (head, {f"f{head}": 0})
    os.unlink(t._checkpoint_path(CHECKPOINT_EVERY))
    assert t.snapshot() == (head, {f"f{head}": 0})


# -- pandas MERGE client ---------------------------------------------------


def test_merge_upsert_sequential_matches_pandas_oracle():
    t = _init_table(_tmp_table())
    up1 = pd.DataFrame({"k": [1, 3, 5], "val": [10, 30, 50]})
    up2 = pd.DataFrame({"k": [3, 4], "val": [33, 44]})
    merge_upsert_pandas(t, up1, "k", 4, "w1")
    merge_upsert_pandas(t, up2, "k", 4, "w2")
    got = _read_table(t)
    expect = pd.DataFrame({"k": range(N_KEYS), "val": [-1] * N_KEYS})
    for up in (up1, up2):
        for _, r in up.iterrows():
            expect.loc[expect.k == r.k, "val"] = r.val
    pd.testing.assert_frame_equal(got, expect.astype(got.dtypes.to_dict()))


def test_versioned_merge_rejects_stale():
    """Conditional merge (version=) — the CDC contract s23 rides on:
    newest version per key wins regardless of ARRIVAL order, re-applying
    a delivered batch is a no-op, and a within-batch v1+v2 pair
    collapses to v2. Blind merge would lose the v2 row on every one of
    these."""
    t = TableLog(_tmp_table())
    t.init()
    seed = pd.DataFrame({"k": [1, 2, 3], "val": [10.0, 20.0, 30.0],
                         "v": [1, 1, 1]})
    merge_upsert_pandas(t, seed, "k", 4, "seed", version="v")

    # newer then STALE, out of order: v2 sticks, late v1 is a no-op
    up2 = pd.DataFrame({"k": [2], "val": [22.0], "v": [2]})
    merge_upsert_pandas(t, up2, "k", 4, "w", version="v")
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [2], "val": [20.0], "v": [1]}),
        "k", 4, "late", version="v",
    )
    # redelivery: the SAME batch applied again
    merge_upsert_pandas(t, up2, "k", 4, "redeliver", version="v")
    # one batch carrying both versions of a fresh key
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [9, 9], "val": [90.0, 99.0], "v": [1, 2]}),
        "k", 4, "mixed", version="v",
    )

    got = _read_table(t)
    expect = pd.DataFrame({"k": [1, 2, 3, 9],
                           "val": [10.0, 22.0, 30.0, 99.0],
                           "v": [1, 2, 1, 2]})
    pd.testing.assert_frame_equal(got, expect.astype(got.dtypes.to_dict()))


def test_conflict_forces_rebase_and_no_lost_update():
    """Deterministic interleave: B computes against v0, then A commits a
    version touching B's buckets; B's first commit must lose, rebase on
    A's state, and win the retry — both updates land."""
    t = _init_table(_tmp_table(), n_buckets=1)  # everything conflicts
    stats = {}

    def commit_a_first(parent):
        if "a" not in stats:
            stats["a"] = merge_upsert_pandas(
                t, pd.DataFrame({"k": [0], "val": [100]}), "k", 1, "a"
            )

    stats["b"] = merge_upsert_pandas(
        t, pd.DataFrame({"k": [1], "val": [200]}), "k", 1, "b",
        pre_commit_hook=commit_a_first,
    )
    assert stats["a"]["committed_version"] == 1
    assert stats["b"] == {"committed_version": 2, "attempts": 2,
                          "recomputes": 1, "quarantined": 0}
    got = _read_table(t)
    assert got.loc[got.k == 0, "val"].item() == 100
    assert got.loc[got.k == 1, "val"].item() == 200


def test_disjoint_buckets_recommit_without_recompute():
    """A winner that did NOT touch the loser's buckets lets the loser
    re-commit its staged files as-is (attempts=2, recomputes=0) — the
    cheap path that makes bucket-disjoint writers scale linearly."""
    t = _init_table(_tmp_table(), n_buckets=4)
    stats = {}

    def commit_a_first(parent):
        if "a" not in stats:
            stats["a"] = merge_upsert_pandas(  # k=0 -> bucket 0
                t, pd.DataFrame({"k": [0], "val": [100]}), "k", 4, "a"
            )

    stats["b"] = merge_upsert_pandas(  # k=1 -> bucket 1, disjoint
        t, pd.DataFrame({"k": [1], "val": [200]}), "k", 4, "b",
        pre_commit_hook=commit_a_first,
    )
    assert stats["b"] == {"committed_version": 2, "attempts": 2,
                          "recomputes": 0, "quarantined": 0}


def test_crash_debris_invisible_and_vacuumed():
    t = _init_table(_tmp_table())
    v0_files = set(t.snapshot()[1])
    # a writer that died between writing data and committing
    orphan = t.new_data_file(0)
    open(t.data_path(orphan), "wb").write(b"not yet committed")
    assert set(t.snapshot()[1]) == v0_files  # invisible to readers
    removed = t.vacuum(min_age_seconds=0.0)
    assert orphan in removed
    assert set(os.listdir(t.data_dir)) == v0_files  # live files untouched


def test_vacuum_min_age_protects_in_flight_staged_files():
    """Writers stage data files BEFORE try_commit, so a vacuum racing a
    writer must not reclaim young unreferenced files — the min-age rail
    (Delta's deletedFileRetentionDuration). Also: a crashed Spark
    writer's _stage-* DIRECTORY is skipped while young and rmtree'd once
    old, never a bare os.unlink that would raise IsADirectoryError."""
    t = _init_table(_tmp_table())
    staged = t.new_data_file(0)
    open(t.data_path(staged), "wb").write(b"in-flight writer's file")
    stage_dir = t.data_path("_stage-deadbeef")
    os.makedirs(stage_dir)
    open(os.path.join(stage_dir, "part-0.parquet"), "wb").write(b"x")

    assert t.vacuum() == []  # default min-age: both too young to touch
    assert os.path.exists(t.data_path(staged))
    assert os.path.isdir(stage_dir)

    removed = t.vacuum(min_age_seconds=0.0)  # caller asserts no writers
    assert set(removed) == {staged, "_stage-deadbeef"}
    assert not os.path.exists(t.data_path(staged))
    assert not os.path.exists(stage_dir)


def test_merge_giveup_unlinks_staged_files():
    """A merge that exhausts max_attempts must abandon its staged files
    on the CommitConflict exit path (mirrors append_spark) — otherwise
    only an unsafe vacuum could ever reclaim them."""
    from distribot_spark.sources.acid import CommitConflict

    t = _init_table(_tmp_table(), n_buckets=1)

    def always_conflict(parent):
        # between the loser's compute and commit, land a same-bucket win
        merge_upsert_pandas(
            t, pd.DataFrame({"k": [0], "val": [parent + 1000]}), "k", 1,
            "winner",
        )

    before = set(os.listdir(t.data_dir))
    with pytest.raises(CommitConflict):
        merge_upsert_pandas(
            t, pd.DataFrame({"k": [1], "val": [1]}), "k", 1, "loser",
            max_attempts=2, pre_commit_hook=always_conflict,
        )
    # every surviving file is referenced by some commit: no orphans
    assert set(os.listdir(t.data_dir)) <= t.referenced_files() | before


# -- snapshot expiry / retention-aware vacuum ------------------------------


def _three_version_table():
    t = _init_table(_tmp_table())
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [1, 5], "val": [11, 55]}), "k", 4, "w1"
    )
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [2, 6], "val": [22, 66]}), "k", 4, "w2"
    )
    return t


def test_expire_snapshots_floor_is_monotonic_and_guards_reads():
    from distribot_spark.sources.acid import SnapshotExpired

    t = _three_version_table()
    assert t.expired_before() == 0
    assert t.snapshot_at(0)[0] == 0  # everything readable pre-expiry

    assert t.expire_snapshots(keep_last=2) == 1
    with pytest.raises(SnapshotExpired):
        t.snapshot_at(0)
    with pytest.raises(SnapshotExpired):
        t.live_paths_at(0)
    assert t.snapshot_at(1)[0] == 1
    assert t.snapshot_at(2)[0] == 2
    # monotonic: a laxer expiry never re-opens expired versions
    assert t.expire_snapshots(keep_last=3) == 1
    with pytest.raises(SnapshotExpired):
        t.snapshot_at(0)


def test_vacuum_respects_retention_then_reclaims_expired():
    """Before expiry, vacuum touches NOTHING any snapshot references
    (time travel to v0 keeps working after a vacuum); after
    expire_snapshots(keep_last=2) it reclaims exactly the files only v0
    referenced, retained reads stay byte-exact, and expired reads fail
    with SnapshotExpired — the composed contract the round-5 verdict
    flagged as broken."""
    t = _three_version_table()
    live0 = set(t._replay_to(0)[1])
    live12 = set(t.snapshot_at(1)[1]) | set(t.snapshot_at(2)[1])
    only_v0 = live0 - live12
    assert only_v0  # the merges really did replace files

    assert t.vacuum(min_age_seconds=0.0) == []  # nothing expired yet
    rows_v1 = _rows_at(t, 1)

    t.expire_snapshots(keep_last=2)
    removed = set(t.vacuum(min_age_seconds=0.0))
    assert removed == only_v0
    assert _rows_at(t, 1) == rows_v1  # retained snapshot unharmed
    assert set(os.listdir(t.data_dir)) == live12


def test_truncate_log_reclaims_expired_metadata():
    """Log retention (Delta's logRetentionDuration): after
    expire_snapshots, truncate_log deletes commit/checkpoint files
    below the floor checkpoint. Retained reads stay byte-exact off the
    surviving checkpoints, expired reads still raise SnapshotExpired
    (never FileNotFound on a missing commit), and vacuum's
    referenced-set fold works on the truncated log."""
    from distribot_spark.sources.acid import SnapshotExpired

    t = TableLog(_tmp_table())
    t.init()
    assert t.try_commit(-1, [{"file": "f0", "pb": 0}], [], "w")
    for i in range(1, 25):
        open(t.data_path(f"f{i}"), "wb").write(b"x")
        assert t.try_commit(i - 1, [{"file": f"f{i}", "pb": 0}],
                            [f"f{i-1}"], "w")
    open(t.data_path("f0"), "wb").write(b"x")

    assert t.truncate_log() == []  # nothing expired: full no-op
    assert t.expire_snapshots(keep_last=5) == 20
    pre = {v: t.snapshot_at(v) for v in range(20, 25)}

    removed = t.truncate_log()
    assert f"v{0:012d}.json" in removed
    assert f"v{19:012d}.json" in removed
    assert f"v{10:012d}.checkpoint.json" in removed
    assert not any(int(n[1:13]) >= 20 for n in removed)
    assert t.version() == 24
    for v in range(20, 25):
        assert t.snapshot_at(v) == pre[v]  # retained reads unharmed
    with pytest.raises(SnapshotExpired):
        t.snapshot_at(19)

    assert t.referenced_files() == {f"f{v}" for v in range(20, 25)}
    reclaimed = set(t.vacuum(min_age_seconds=0.0))
    assert reclaimed == {f"f{v}" for v in range(0, 20)}
    assert t.snapshot_at(24) == pre[24]


def test_change_feed_refuses_expired_preimages(spark):
    """Commit v's pre-image is snapshot v-1, so once the floor is F the
    feed must start at F+1 — asking earlier raises SnapshotExpired
    up front instead of reading vacuumed parquet."""
    from distribot_spark.sources.acid import (
        SnapshotExpired,
        table_changes_spark,
    )

    t = _three_version_table()
    t.expire_snapshots(keep_last=2)
    t.vacuum(min_age_seconds=0.0)
    with pytest.raises(SnapshotExpired):
        table_changes_spark(spark, t, "k", from_version=1)
    ch = table_changes_spark(spark, t, "k", from_version=2)
    assert sorted((r.k, r.val, r._change_type) for r in ch.collect()) == [
        (2, -1, "update_pre"), (2, 22, "update_post"),
        (6, -1, "update_pre"), (6, 66, "update_post"),
    ]


def _rows_at(t, v):
    frames = [pq.read_table(p).to_pandas() for p in t.live_paths_at(v)]
    return sorted(
        pd.concat(frames, ignore_index=True).itertuples(index=False)
    )


# -- deletion vectors ------------------------------------------------------


def _seed_spark_table(spark, n_buckets=4, n_keys=20):
    from distribot_spark.sources.acid import write_initial_spark

    t = TableLog(_tmp_table())
    df = spark.createDataFrame(
        [(k, float(k)) for k in range(n_keys)], "k long, val double"
    )
    write_initial_spark(spark, t, df, "k", n_buckets=n_buckets)
    return t


def _logical_rows(spark, t):
    from distribot_spark.sources.acid import read_snapshot_spark

    return sorted(
        (r.k, r.val)
        for r in read_snapshot_spark(spark, t, dv_key="k").collect()
    )


def test_delete_vectors_no_rewrite_then_optimize_compacts(spark):
    """DV DELETE end to end: the delete commit rewrites NO data file
    (sidecars only), reads fold the DVs, a second wave never re-records
    an already-deleted key, a MERGE on a DV'd bucket folds-then-clears
    its DVs without resurrecting rows, and OPTIMIZE compacts every
    remaining DV into the base so physical == logical again."""
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        merge_upsert_spark,
        optimize_table_spark,
        read_snapshot_spark,
    )

    t = _seed_spark_table(spark)
    live0 = set(t.snapshot()[1])

    keys = spark.createDataFrame([(3,), (7,), (11,)], "k long")
    st = delete_keys_spark(spark, t, keys, "k", 4, "del-1")
    assert st["deleted_rows"] == 3 and st["dv_files"] >= 1
    assert set(t.snapshot()[1]) == live0  # NO base file rewritten
    assert _logical_rows(spark, t) == [
        (k, float(k)) for k in range(20) if k not in (3, 7, 11)
    ]

    # second wave: 7 is already DV-deleted, only 4 is new
    st2 = delete_keys_spark(
        spark, t, spark.createDataFrame([(7,), (4,)], "k long"),
        "k", 4, "del-2",
    )
    assert st2["deleted_rows"] == 1
    assert set(t.snapshot()[1]) == live0
    assert _logical_rows(spark, t) == [
        (k, float(k)) for k in range(20) if k not in (3, 4, 7, 11)
    ]

    # MERGE re-inserts k=3: its bucket rewrite folds + clears that
    # bucket's DVs; other buckets' DVs stay live
    merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(3, 333.0)], "k long, val double"),
        "k", 4, "reborn",
    )
    assert _logical_rows(spark, t) == sorted(
        [(3, 333.0)]
        + [(k, float(k)) for k in range(20) if k not in (3, 4, 7, 11)]
    )
    dvafter = t.live_dvs()
    assert dvafter  # buckets 0 (k=4) and... k=7,11 ≡ 3 mod 4 rewritten
    # k=7 and k=11 live in bucket 3 == rewritten bucket; their DVs died
    # with the rewrite and must NOT resurrect the rows (checked above)

    st3 = optimize_table_spark(spark, t, "k", 4, "opt", files_per_bucket=1)
    assert st3["rewritten_buckets"] >= 1
    assert t.live_dvs() == {}  # all DVs compacted into the base
    # DV compaction is layout-only to the CDF: the pre-image folds the
    # files' DVs (those deletes were reported when the DVs committed),
    # so the optimize version emits NOTHING
    from distribot_spark.sources.acid import table_changes_spark
    assert table_changes_spark(
        spark, t, "k", st3["committed_version"], st3["committed_version"]
    ).count() == 0
    assert _logical_rows(spark, t) == sorted(
        [(3, 333.0)]
        + [(k, float(k)) for k in range(20) if k not in (3, 4, 7, 11)]
    )
    # physical now equals logical: nothing left to fold
    raw = sorted(
        (r.k, r.val)
        for r in read_snapshot_spark(spark, t, apply_dvs=False).collect()
    )
    assert raw == _logical_rows(spark, t)


def test_dv_delete_equals_rewrite_delete_and_cdf_parity(spark):
    """The two DELETE modes are observationally identical on the same
    history: final reads match row-for-row AND the change feed reports
    the same delete rows at the same version — DVs change the COST of a
    delete, never its meaning."""
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        table_changes_spark,
    )

    rows = {}
    feeds = {}
    for mode in ("dv", "rewrite"):
        t = _seed_spark_table(spark)
        keys = spark.createDataFrame([(2,), (9,), (13,)], "k long")
        st = delete_keys_spark(spark, t, keys, "k", 4, "d", mode=mode)
        assert st["committed_version"] == 1
        rows[mode] = _logical_rows(spark, t)
        feeds[mode] = sorted(
            (r.k, r.val, r._change_type, r._commit_version)
            for r in table_changes_spark(spark, t, "k", 1, 1).collect()
        )
    assert rows["dv"] == rows["rewrite"]
    assert feeds["dv"] == feeds["rewrite"] == [
        (2, 2.0, "delete", 1), (9, 9.0, "delete", 1),
        (13, 13.0, "delete", 1),
    ]


def test_dv_commit_conflicts_merge_must_recompute(spark):
    """A deletion-vector commit changes bucket CONTENT without changing
    the file set; a concurrent MERGE that compared only file sets would
    re-commit its stale rewrite and resurrect the deleted row. DV state
    is part of conflict detection, so the merge recomputes."""
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        merge_upsert_spark,
    )

    t = _seed_spark_table(spark, n_buckets=2)
    fired = []

    def dv_interloper(v):
        if not fired:
            fired.append(v)
            delete_keys_spark(
                spark, t, spark.createDataFrame([(2,)], "k long"),
                "k", 2, "racer",
            )

    st = merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(4, 44.0)], "k long, val double"),
        "k", 2, "merger", pre_commit_hook=dv_interloper,
    )
    assert st["attempts"] == 2 and st["recomputes"] == 1
    got = _logical_rows(spark, t)
    assert (2, 2.0) not in got  # the racer's delete survived the merge
    assert (4, 44.0) in got


def test_vacuum_keeps_live_dv_sidecars():
    """DV sidecars are manifest-referenced files: vacuum must treat
    them as live, and they become reclaimable only when the retention
    floor passes the versions that referenced them."""
    import pyarrow as pa

    t = TableLog(_tmp_table())
    t.init()
    name = t.new_data_file(0)
    pq.write_table(pa.table({"k": [0, 1], "val": [0, 1]}),
                   t.data_path(name))
    assert t.try_commit(-1, [{"file": name, "pb": 0}], [], "w")
    dv = t.new_dv_file()
    pq.write_table(pa.table({"_df": [name], "k": [1]}), t.data_path(dv))
    assert t.try_commit(0, [], [], "w", dvs={name: dv})
    assert t.live_dvs() == {name: [dv]}

    assert t.vacuum(min_age_seconds=0.0) == []  # both files referenced
    # a rewrite clears the DV; after expiry both old file and dv go
    name2 = t.new_data_file(0)
    pq.write_table(pa.table({"k": [0], "val": [0]}), t.data_path(name2))
    assert t.try_commit(1, [{"file": name2, "pb": 0}], [name], "w")
    assert t.live_dvs() == {}
    t.expire_snapshots(keep_last=1)
    removed = set(t.vacuum(min_age_seconds=0.0))
    assert removed == {name, dv}


def test_vacuum_keeps_dv_sidecars_when_floor_is_checkpoint():
    """The cstar == floor corner: expire to a CHECKPOINT boundary
    (keep_last=1 with head on a CHECKPOINT_EVERY multiple) makes the
    floor checkpoint itself the only retained snapshot — the commit
    loop in referenced_files() is empty, so the checkpoint's DV
    sidecars must be referenced from the bootstrap branch or vacuum
    unlinks LIVE delete state and DV-folded reads crash on missing
    sidecar parquet."""
    import pyarrow as pa

    t = TableLog(_tmp_table())
    t.init()
    name = t.new_data_file(0)
    pq.write_table(pa.table({"k": [0, 1, 2], "val": [0, 1, 2]}),
                   t.data_path(name))
    assert t.try_commit(-1, [{"file": name, "pb": 0}], [], "w")
    dv = t.new_dv_file()
    pq.write_table(pa.table({"_df": [name], "k": [1]}), t.data_path(dv))
    assert t.try_commit(0, [], [], "w", dvs={name: dv})
    # pad with real files so head lands exactly on CHECKPOINT_EVERY
    for i in range(2, CHECKPOINT_EVERY + 1):
        f = t.new_data_file(1)
        pq.write_table(pa.table({"k": [100 + i], "val": [i]}),
                       t.data_path(f))
        assert t.try_commit(i - 1, [{"file": f, "pb": 1}], [], "w")
    head = t.version()
    assert head == CHECKPOINT_EVERY
    assert os.path.exists(t._checkpoint_path(CHECKPOINT_EVERY))

    t.expire_snapshots(keep_last=1)
    assert t.expired_before() == head
    assert t._floor_checkpoint() == head  # cstar == floor
    removed = t.vacuum(min_age_seconds=0.0)
    assert removed == [], removed  # especially: the DV sidecar survives
    assert os.path.exists(t.data_path(dv))
    assert t.live_dvs() == {name: [dv]}  # delete state still readable
    deleted = pq.read_table(t.data_path(dv)).to_pandas()
    assert list(deleted["k"]) == [1]


def test_expire_snapshots_racing_expirers_never_regress_floor():
    """expire_snapshots serializes its read-compute-write under the
    meta lock: concurrent expirers with DIFFERENT keep_last values
    must compose monotonically (the floor is the max of their
    computed floors), never regress to the laggard's lower value."""
    t = TableLog(_tmp_table())
    t.init()
    for i in range(12):
        assert t.try_commit(i - 1, [{"file": f"f{i}", "pb": 0}], [], "w")
    floors = []

    def expire(keep):
        floors.append(t.expire_snapshots(keep_last=keep))

    threads = [threading.Thread(target=expire, args=(k,))
               for k in (1, 3, 5, 7, 9, 11)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    # head=11, tightest keep_last=1 -> floor 11; whatever the
    # interleaving, the PERSISTED floor is the max ever computed
    assert t.expired_before() == max(floors) == 11


def test_snapshot_and_commit_cost_bounded_by_checkpoint_interval():
    """Streaming-ingest scaling contract, pinned by IO SHAPE (not
    timing): at 1000+ commits, snapshot() folds from the newest
    checkpoint — ≤ CHECKPOINT_EVERY commit reads — and the checkpoint
    WRITER folds from the previous checkpoint, so commit cost is flat
    too (an O(v)-per-checkpoint log would quadratically rot under
    micro-batch ingest; scaling.py --table-log measures the wall-clock
    side of the same claim)."""
    t = TableLog(_tmp_table())
    t.init()
    assert t.try_commit(-1, [{"file": "f0", "pb": 0}], [], "w")

    reads = []
    orig = t.read_commit
    t.read_commit = lambda v: (reads.append(v), orig(v))[1]

    for i in range(1, 1005):
        assert t.try_commit(i - 1, [{"file": f"f{i}", "pb": 0}],
                            [f"f{i-1}"], "w")
    # checkpoint writes during 1004 commits: ~100 checkpoints, each
    # folding at most CHECKPOINT_EVERY commits + its own version
    assert len(reads) <= (1004 // CHECKPOINT_EVERY + 1) * (
        CHECKPOINT_EVERY + 1
    ), len(reads)

    reads.clear()
    v, live = t.snapshot()
    assert (v, live) == (1004, {"f1004": 0})
    assert len(reads) <= CHECKPOINT_EVERY + 1, len(reads)  # flat replay

    # stats, DV resolution and TIME TRAVEL share the checkpointed fold:
    # every metadata consumer is flat, not just snapshot()
    for probe in (
        lambda: t.live_stats(),
        lambda: t.live_dvs(),
        lambda: t.snapshot_at(997),
    ):
        reads.clear()
        probe()
        assert len(reads) <= CHECKPOINT_EVERY + 1, len(reads)


# -- skew-resistant hash bucketing -----------------------------------------


def test_python_xxh64_long_matches_spark(spark):
    """The pure-python XXH64(long, seed 42) MUST be bit-identical to
    Spark's xxhash64 — it is what lets JVM-free clients agree with
    Spark writers on hash-bucket file boundaries."""
    from pyspark.sql import functions as F

    from distribot_spark.sources.acid import _xxh64_long

    ks = list(range(-17, 40)) + [2**40 + 7, -(2**52) - 3, 2**62, -1]
    df = spark.createDataFrame([(k,) for k in ks], "k long")
    got = {
        r.k: r.h
        for r in df.select(
            "k", F.xxhash64(F.col("k")).alias("h")
        ).collect()
    }
    for k in ks:
        assert _xxh64_long(k) == got[k], k


def test_hash_bucketed_table_serves_all_operations(spark):
    """hash_buckets=True end to end: the option persists in table
    metadata (a fresh TableLog handle picks it up), Spark MERGE, pandas
    MERGE, append, DV delete and OPTIMIZE all run green under it, and
    the final read equals the direct dict-fold of the same operations
    (serve-equals-direct — the certification route for a bucket
    function DuckDB cannot reproduce, the q15_hll precedent)."""
    from distribot_spark.sources.acid import (
        append_spark,
        delete_keys_pandas,
        merge_upsert_spark,
        optimize_table_spark,
        write_initial_spark,
    )

    path = _tmp_table()
    t = TableLog(path)
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(40)],
                              "k long, val double"),
        "k", n_buckets=4, hash_buckets=True,
    )
    assert TableLog(path).hash_buckets()  # persisted, not per-call

    merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(3, 33.0), (17, 177.0)],
                              "k long, val double"),
        "k", 4, "w-spark",
    )
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [5, 28], "val": [55.0, 288.0]}), "k", 4,
        "w-pandas",
    )
    append_spark(
        spark, t,
        spark.createDataFrame([(100, 100.0), (101, 101.0)],
                              "k long, val double"),
        "k", 4, "appender",
    )
    delete_keys_pandas(t, [17, 100], "k", 4, "deleter")
    optimize_table_spark(spark, t, "k", 4, "opt", files_per_bucket=1)
    assert t.live_dvs() == {}

    expect = {k: float(k) for k in range(40)}
    expect.update({3: 33.0, 17: 177.0, 5: 55.0, 28: 288.0,
                   100: 100.0, 101: 101.0})
    del expect[17], expect[100]
    assert _logical_rows(spark, t) == sorted(expect.items())

    # every live file really holds exactly its xxhash bucket
    from distribot_spark.sources.acid import _bucket_of_py
    _, live = t.snapshot()
    for f, b in live.items():
        ks = pq.read_table(t.data_path(f)).to_pandas()["k"]
        assert {(_bucket_of_py(k, 4, True)) for k in ks} <= {b}


def test_skewed_keys_conflict_under_modulo_not_under_hash():
    """The reason the option exists: sequential/hot key domains (all
    multiples of n_buckets) land in ONE modulo bucket, so disjoint-key
    writers always collide and pay a rebase; xxhash64 spreads them so
    the same schedule re-commits without recompute. Deterministic: keys
    chosen so their hash buckets provably differ."""
    from distribot_spark.sources.acid import _bucket_of_py

    n = 8
    # a skewed domain: every key ≡ 0 (mod 8) — one modulo bucket
    ka, kb = 8, 16
    assert _bucket_of_py(ka, n, False) == _bucket_of_py(kb, n, False) == 0
    assert _bucket_of_py(ka, n, True) != _bucket_of_py(kb, n, True)

    stats = {}
    for hashed in (False, True):
        t = TableLog(_tmp_table())
        t.init(hash_buckets=hashed)
        merge_upsert_pandas(
            t, pd.DataFrame({"k": [0], "val": [0]}), "k", n, "seed"
        )

        done = {}

        def commit_a_first(parent, _t=t):
            if "a" not in done:
                done["a"] = merge_upsert_pandas(
                    _t, pd.DataFrame({"k": [ka], "val": [1]}), "k", n, "a"
                )

        stats[hashed] = merge_upsert_pandas(
            t, pd.DataFrame({"k": [kb], "val": [2]}), "k", n, "b",
            pre_commit_hook=commit_a_first,
        )
        # both writers landed either way — correctness never depends on
        # the bucket function, only the conflict COST does
        got = _read_table(t)
        assert got.loc[got.k == ka, "val"].item() == 1
        assert got.loc[got.k == kb, "val"].item() == 2
    assert stats[False]["recomputes"] == 1  # modulo: same bucket, rebase
    assert stats[True]["recomputes"] == 0   # hash: disjoint, re-commit
    assert stats[True]["attempts"] == 2     # still raced the version


def test_timestamp_as_of_resolves_to_commit_versions():
    """TIMESTAMP AS OF: a timestamp between commits resolves to the
    last commit at or before it; before the first retained commit it
    raises SnapshotExpired (not a silent v0); clock jitter (an older
    version stamped later) cannot resurrect an older state because the
    LAST qualifying version wins."""
    from distribot_spark.sources.acid import SnapshotExpired

    t = _three_version_table()
    ts = [t.read_commit(v)["ts"] for v in range(3)]
    assert t.version_at_timestamp(ts[0]) == 0
    assert t.version_at_timestamp((ts[0] + ts[1]) / 2) == 0
    assert t.version_at_timestamp(ts[1]) == 1
    assert t.version_at_timestamp(ts[2] + 1000) == 2
    with pytest.raises(SnapshotExpired):
        t.version_at_timestamp(ts[0] - 1)
    # jittered clock: rewrite commit 1's ts to be LATER than commit 2's
    body = t.read_commit(1)
    body["ts"] = ts[2] + 5
    with open(t._commit_path(1) + ".tmp", "w") as fh:
        json.dump(body, fh)
    os.replace(t._commit_path(1) + ".tmp", t._commit_path(1))
    assert t.version_at_timestamp(ts[2] + 10) == 2  # log order wins
    # expiry narrows the resolvable range
    t.expire_snapshots(keep_last=2)
    with pytest.raises(SnapshotExpired):
        t.version_at_timestamp(ts[0])


def test_optimize_rebuckets_to_new_bucket_count(spark):
    """Changing the bucket count is one rewrite_all OPTIMIZE with the
    NEW n_buckets: every row lands in its new bucket (verified file by
    file), content is untouched, and later writers using the new count
    merge correctly. Coordination contract: n_buckets is a caller
    argument, so all writers must switch together — the rebucket is the
    commit they switch at."""
    from distribot_spark.sources.acid import (
        merge_upsert_pandas,
        optimize_table_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(32)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    before = _logical_rows(spark, t)
    st = optimize_table_spark(spark, t, "k", 8, "rebucket",
                              rewrite_all=True)
    assert st["rewritten_buckets"] == 2  # all OLD buckets rewritten
    _, live = t.snapshot()
    assert {b for b in live.values()} == set(range(8))
    for f, b in live.items():
        ks = pq.read_table(t.data_path(f)).to_pandas()["k"]
        assert all(int(k) % 8 == b for k in ks)
    assert _logical_rows(spark, t) == before

    # two-phase metadata: the persisted layout moved with the commit
    # and the pending marker is gone — a NO-ARG writer buckets correctly
    assert t.layout() == ("k", 8)
    assert "rebucket_pending" not in t._meta()
    merge_upsert_pandas(t, pd.DataFrame({"k": [5], "val": [55.0]}))
    assert (5, 55.0) in _logical_rows(spark, t)
    _, live2 = t.snapshot()
    for f, b in live2.items():
        ks = pq.read_table(t.data_path(f)).to_pandas()["k"]
        assert all(int(k) % 8 == b for k in ks)


# -- full-snapshot sync (three-clause MERGE) -------------------------------


def test_sync_snapshot_three_clause_merge(spark):
    """sync_snapshot_spark: after the sync the table EQUALS the source
    (update + insert + not-matched-by-source delete in ONE commit),
    unchanged buckets keep their files byte-for-byte, the change feed
    of the sync version reports exactly the logical diff, and a
    no-change re-sync commits nothing."""
    from distribot_spark.sources.acid import (
        sync_snapshot_spark,
        table_changes_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(16)], "k long, val double"
    )
    write_initial_spark(spark, t, base, "k", n_buckets=4)
    live0 = dict(t.snapshot()[1])

    # source: k=1 updated, k=2 and k=6 gone, k=100 new; rest identical.
    # changed buckets: {1 % 4, 2 % 4, 6 % 4, 100 % 4} = {1, 2, 0}
    src_rows = (
        [(k, float(k)) for k in range(16) if k not in (1, 2, 6)]
        + [(1, 111.0), (100, 100.0)]
    )
    src = spark.createDataFrame(src_rows, "k long, val double")
    st = sync_snapshot_spark(spark, t, src, "k", 4, "sync")
    assert st["rewritten_buckets"] == 3, st

    assert _logical_rows(spark, t) == sorted(
        (k, v) for k, v in src_rows
    )
    # bucket 3 was untouched: its file survives identically
    _, live1 = t.snapshot()
    for f, b in live0.items():
        if b == 3:
            assert live1.get(f) == 3
    # CDF of the sync version = exactly the logical diff
    ch = sorted(
        (r.k, r.val, r._change_type)
        for r in table_changes_spark(
            spark, t, "k", st["committed_version"], st["committed_version"]
        ).collect()
    )
    assert ch == [
        (1, 1.0, "update_pre"), (1, 111.0, "update_post"),
        (2, 2.0, "delete"), (6, 6.0, "delete"),
        (100, 100.0, "insert"),
    ]
    # idempotent: re-syncing the same source commits NOTHING
    st2 = sync_snapshot_spark(spark, t, src, "k", 4, "resync")
    assert st2["rewritten_buckets"] == 0
    assert st2["committed_version"] == st["committed_version"]


def test_sync_snapshot_folds_dvs_and_detects_conflicts(spark):
    """A DV delete landing between the sync's diff and its commit
    changes bucket content without changing the file set — the sync
    must recompute (DV state is in its conflict detection) and the
    final table still equals the source (the sync re-inserts the key
    the racer deleted, because the SOURCE says it exists)."""
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        sync_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    fired = []

    def dv_racer(v):
        if not fired:
            fired.append(v)
            delete_keys_spark(
                spark, t, spark.createDataFrame([(4,)], "k long"),
                "k", 2, "racer",
            )

    src = spark.createDataFrame(
        [(k, float(k)) for k in range(8) if k != 7] + [(9, 9.0)],
        "k long, val double",
    )
    st = sync_snapshot_spark(spark, t, src, "k", 2, "sync",
                             pre_commit_hook=dv_racer)
    assert st["attempts"] == 2 and st["recomputes"] == 1, st
    # source wins: k=4 exists in the source, so the sync restores it
    assert _logical_rows(spark, t) == sorted(
        [(k, float(k)) for k in range(8) if k != 7] + [(9, 9.0)]
    )


# -- OPTIMIZE × MERGE × DELETE concurrency matrix --------------------------


def test_matrix_merge_and_dv_delete_commit_during_optimize(spark):
    """Three writers, deterministic schedule, two of them REAL OS
    processes: OPTIMIZE computes its packed layout, then a MERGE and a
    DV DELETE (both raced against the same parent) commit under it.
    OPTIMIZE's first commit must lose and its rebase must fold BOTH —
    the merged rows survive (no pre-merge resurrection), the deleted
    rows stay deleted, and the racer's deletion vector is compacted by
    the rebased rewrite."""
    from distribot_spark.sources.acid import (
        append_spark,
        optimize_table_spark,
    )

    path = _tmp_table()
    t = TableLog(path)
    df1 = spark.createDataFrame(
        [(k, k) for k in range(20)], "k long, val long"
    )
    df2 = spark.createDataFrame(
        [(k, k) for k in range(20, 40)], "k long, val long"
    )
    from distribot_spark.sources.acid import write_initial_spark
    write_initial_spark(spark, t, df1, "k", n_buckets=4)
    append_spark(spark, t, df2, "k", 4, "fragmenter")
    v_base = t.version()

    rdv = path + ".rdv"
    os.makedirs(rdv, exist_ok=True)
    start = path + ".start"
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/acid_matrix_proc.py", path, role,
             "4", start, rdv],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo",
        )
        for role in ("merge", "delete_dv")
    ]
    open(start, "w").write("go")
    # both racers computed against v_base and are parked pre-commit
    deadline = time.time() + 60
    while not (os.path.exists(os.path.join(rdv, "merge.computed"))
               and os.path.exists(os.path.join(rdv, "delete_dv.computed"))):
        assert time.time() < deadline, "workers never computed"
        time.sleep(0.01)

    fired = []

    def release_racers(parent):
        if fired:
            return
        fired.append(parent)
        assert parent == v_base
        open(os.path.join(rdv, "commit_go"), "w").write("go")
        stop = time.time() + 60
        while t.version() < v_base + 2:  # both racers committed
            assert time.time() < stop, "racers never committed"
            time.sleep(0.01)

    st = optimize_table_spark(
        spark, t, "k", 4, "optimizer", pre_commit_hook=release_racers
    )
    assert st["attempts"] == 2, st  # lost once, rebased, won

    stats = []
    for p in procs:
        out, err = p.communicate(timeout=60)
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("STATS:")][0]
        stats.append(json.loads(line[6:]))
    by_role = {s["role"]: s for s in stats}
    assert by_role["merge"]["committed_version"] in (v_base + 1, v_base + 2)
    assert by_role["delete_dv"]["deleted_rows"] == 2

    expect = {k: k for k in range(40)}
    expect.update({1: 7001, 5: 7005, 9: 7009})
    del expect[2], expect[6]
    assert _logical_rows(spark, t) == sorted(
        (k, v) for k, v in expect.items()
    )
    assert t.live_dvs() == {}  # the rebase compacted the racer's DV


def test_matrix_optimize_commits_during_merge(spark):
    """The reverse race: OPTIMIZE lands between a MERGE's compute and
    commit. The merge's bucket files all changed, so it must recompute
    against the packed layout — and the packed bucket keeps exactly one
    file with the merged content."""
    from distribot_spark.sources.acid import (
        merge_upsert_spark,
        optimize_table_spark,
        write_initial_spark,
        append_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    append_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8, 16)],
                              "k long, val double"),
        "k", 2, "fragmenter",
    )
    fired = []

    def optimize_interloper(v):
        if not fired:
            fired.append(v)
            st = optimize_table_spark(spark, t, "k", 2, "racer")
            assert st["rewritten_buckets"] == 2

    st = merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(3, 333.0)], "k long, val double"),
        "k", 2, "merger", pre_commit_hook=optimize_interloper,
    )
    assert st["attempts"] == 2 and st["recomputes"] == 1, st
    got = _logical_rows(spark, t)
    assert (3, 333.0) in got and len(got) == 16


def test_matrix_optimize_commits_during_dv_delete(spark):
    """OPTIMIZE lands between a DV delete's compute and commit: the
    staged sidecars name files the rewrite just killed, so committing
    them would silently delete nothing. The delete must recompute
    against the packed files — and its keys stay deleted."""
    from distribot_spark.sources.acid import (
        append_spark,
        delete_keys_spark,
        optimize_table_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    append_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8, 16)],
                              "k long, val double"),
        "k", 2, "fragmenter",
    )
    fired = []

    def optimize_interloper(v):
        if not fired:
            fired.append(v)
            optimize_table_spark(spark, t, "k", 2, "racer")

    st = delete_keys_spark(
        spark, t, spark.createDataFrame([(4,), (9,)], "k long"),
        "k", 2, "deleter", pre_commit_hook=optimize_interloper,
    )
    assert st["attempts"] == 2 and st["deleted_rows"] == 2, st
    got = _logical_rows(spark, t)
    assert {k for k, _ in got} == set(range(16)) - {4, 9}
    # the committed DVs name files that are actually live
    _, live = t.snapshot()
    assert set(t.live_dvs()) <= set(live)


def test_matrix_tombstone_survives_optimize(spark):
    """CDC tombstones are ordinary versioned rows: an OPTIMIZE rewrite
    must CARRY them (they are the resurrection guard), so a stale
    out-of-order upsert arriving after the optimize still loses."""
    from distribot_spark.sources.acid import (
        merge_upsert_pandas,
        optimize_table_spark,
        read_snapshot_spark,
    )

    t = TableLog(_tmp_table())
    t.init()
    seed = pd.DataFrame({"k": [0, 1, 2, 3], "val": [0.0, 1.0, 2.0, 3.0],
                         "v": [1] * 4, "op": ["u"] * 4})
    merge_upsert_pandas(t, seed, "k", 2, "seed", version="v")
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [2], "val": [float("nan")], "v": [3],
                         "op": ["d"]}),
        "k", 2, "del", version="v",
    )
    st = optimize_table_spark(spark, t, "k", 2, "opt", rewrite_all=True)
    assert st["rewritten_buckets"] == 2
    raw = read_snapshot_spark(spark, t)
    assert {(r.k, r.op) for r in raw.collect()} == {
        (0, "u"), (1, "u"), (3, "u"), (2, "d")  # tombstone carried
    }
    # stale upsert AFTER the optimize: the carried tombstone outranks it
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [2], "val": [22.0], "v": [2], "op": ["u"]}),
        "k", 2, "stale", version="v",
    )
    live = read_snapshot_spark(spark, t, tombstone_col="op")
    assert sorted(r.k for r in live.collect()) == [0, 1, 3]


def test_change_feed_duplicate_keys_fail_loudly(spark):
    """append can legally duplicate a key (each copy is its own CDF
    insert); but a REWRITE commit whose pre-image carries duplicates
    would fan out the full-outer diff into fabricated update pairs —
    the feed must raise, not emit wrong change rows."""
    import pyarrow as pa

    from distribot_spark.sources.acid import table_changes_spark

    t = TableLog(_tmp_table())
    t.init()
    for val in (1, 2):  # two blind appends of the SAME key
        name = t.new_data_file(0)
        pq.write_table(pa.table({"k": [0], "val": [val]}),
                       t.data_path(name))
        assert t.try_commit(
            t.version(), [{"file": name, "pb": 0}], [], "app"
        )
    # duplicate inserts are fine — two insert rows, one per copy
    ins = table_changes_spark(spark, t, "k", 0, 1)
    assert sorted((r.k, r.val, r._change_type) for r in ins.collect()) == [
        (0, 1, "insert"), (0, 2, "insert"),
    ]
    # a merge rewrite of that bucket has a duplicate-key PRE-image
    merge_upsert_pandas(t, pd.DataFrame({"k": [0], "val": [9]}),
                        "k", 1, "m")
    with pytest.raises(Exception, match="duplicate key"):
        table_changes_spark(spark, t, "k", 2, 2).collect()


# -- two OS processes ------------------------------------------------------


def _run_workers(table_path, n_batches, n_buckets, rendezvous=False):
    start = table_path + ".start"
    rdv = None
    if rendezvous:
        rdv = table_path + ".rdv"
        os.makedirs(rdv, exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/acid_worker_proc.py", table_path,
             f"writer-{p}", str(p), str(n_batches), str(n_buckets), start]
            + ([rdv] if rdv else []),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo",
        )
        for p in (0, 1)
    ]
    open(start, "w").write("go")
    stats = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("STATS:")][0]
        stats.append(json.loads(line[6:]))
    return stats


def _assert_final_state(t, n_batches):
    got = _read_table(t)
    assert list(got.k) == list(range(N_KEYS))
    for _, r in got.iterrows():
        tag = 1_000_000 if r.k % 2 == 0 else 2_000_000
        assert r.val == tag + n_batches - 1, (r.k, r.val)


def test_two_processes_interleaved_upserts_serialize():
    path = _tmp_table()
    t = _init_table(path, n_buckets=4)
    stats = _run_workers(path, n_batches=5, n_buckets=4)
    # every batch committed exactly once: versions are dense 0..10
    assert t.version() == 10
    for v in range(11):
        assert os.path.exists(t._commit_path(v))
    _assert_final_state(t, n_batches=5)
    assert sum(s["commits"] for s in stats) == 10
    # OCC bookkeeping: attempts >= commits, never runaway
    for s in stats:
        assert s["commits"] <= s["attempts"] <= 50


def test_two_processes_same_bucket_contention_rebases():
    """n_buckets=1 + a compute-then-commit rendezvous: both first commits
    race the same parent, so exactly one rebase is guaranteed — the
    recompute path proven across real OS processes, not threads."""
    path = _tmp_table()
    t = _init_table(path, n_buckets=1)
    stats = _run_workers(path, n_batches=3, n_buckets=1, rendezvous=True)
    assert t.version() == 6
    _assert_final_state(t, n_batches=3)
    assert sum(s["recomputes"] for s in stats) >= 1
    assert sum(s["attempts"] for s in stats) >= 7


def test_schema_evolution_merge_and_read(spark):
    """MERGE with an EVOLVED schema (Delta mergeSchema semantics on the
    OCC log): updates carry a NEW column and drop a base column — the
    rewritten bucket materializes the union schema (NULL-backfilled both
    ways), untouched buckets keep their old file schema, and
    read_snapshot_spark's mergeSchema read surfaces the union."""
    import pyarrow.parquet as _pq

    from distribot_spark.sources.acid import (
        merge_upsert_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    base = spark.createDataFrame(
        [(k, float(k)) for k in range(8)], "k long, val double"
    )
    write_initial_spark(spark, t, base, "k", n_buckets=4)
    up = spark.createDataFrame(
        [(1, "u"), (5, "u"), (9, "u")], "k long, src string"
    )  # keys ≡ 1 mod 4: exactly one bucket rewritten
    merge_upsert_spark(spark, t, up, "k", 4, "evo")

    got = read_snapshot_spark(spark, t)
    assert set(got.columns) == {"k", "val", "src"}
    rows = {r.k: (r.val, r.src) for r in got.collect()}
    assert len(rows) == 9
    for k in (0, 2, 3, 4, 6, 7):  # untouched rows: old data, NULL src
        assert rows[k] == (float(k), None)
    for k in (1, 5, 9):  # upserted rows: new column set, dropped col NULL
        assert rows[k] == (None, "u")

    # untouched buckets physically keep the PRE-evolution schema: the
    # union only exists at read time (mergeSchema) or on next rewrite
    _, live = t.snapshot()
    untouched = [f for f, b in live.items() if b != 1]
    assert untouched
    for f in untouched:
        assert _pq.read_schema(t.data_path(f)).names == ["k", "val"]
    rewritten = [f for f, b in live.items() if b == 1]
    assert rewritten
    for f in rewritten:
        assert set(_pq.read_schema(t.data_path(f)).names) == {"k", "val", "src"}


def test_cdc_delete_tombstones_and_purge(spark):
    """CDC DELETE end to end: a tombstone (op='d') merges like any
    versioned row, so (a) the key disappears from tombstone-filtered
    reads, (b) a STALE out-of-order upsert cannot resurrect it — the
    persisted tombstone outranks it — and (c) purge_tombstones_pandas
    physically reclaims it in one OCC commit without touching clean
    buckets, after which the logical read is unchanged."""
    from distribot_spark.sources.acid import (
        merge_upsert_pandas,
        purge_tombstones_pandas,
        read_snapshot_spark,
    )

    t = TableLog(_tmp_table())
    t.init()
    seed = pd.DataFrame({"k": [0, 1, 2, 3], "val": [0.0, 1.0, 2.0, 3.0],
                         "v": [1] * 4, "op": ["u"] * 4})
    merge_upsert_pandas(t, seed, "k", 4, "seed", version="v")

    # delete k=2 at v3, then a LATE stale upsert of k=2 at v2 arrives
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [2], "val": [float("nan")], "v": [3],
                         "op": ["d"]}),
        "k", 4, "del", version="v",
    )
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [2], "val": [22.0], "v": [2], "op": ["u"]}),
        "k", 4, "stale", version="v",
    )

    live = read_snapshot_spark(spark, t, tombstone_col="op")
    assert sorted(r.k for r in live.collect()) == [0, 1, 3]
    # the tombstone itself is still physically present (resurrection guard)
    raw = read_snapshot_spark(spark, t)
    assert {(r.k, r.op) for r in raw.collect()} == {
        (0, "u"), (1, "u"), (3, "u"), (2, "d")
    }

    before = dict(t.snapshot()[1])
    st = purge_tombstones_pandas(t, "op")
    assert st["purged_files"] == 1  # only k=2's bucket rewritten
    after = dict(t.snapshot()[1])
    untouched = {f for f, b in before.items() if b != 2}
    assert untouched <= set(after)  # clean buckets keep their files
    raw2 = read_snapshot_spark(spark, t)
    assert sorted(r.k for r in raw2.collect()) == [0, 1, 3]


def test_change_feed_pages_by_version(spark):
    """CDF consumer contract: paging [v, v] per version concatenates to
    the full-range feed (a consumer folding one version at a time sees
    exactly the history), and a version whose rewrite only CARRIES rows
    (no payload change) contributes nothing."""
    from distribot_spark.sources.acid import (
        merge_upsert_pandas,
        table_changes_spark,
    )

    t = TableLog(_tmp_table())
    t.init()
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [0, 1, 2, 3], "val": [0, 1, 2, 3]}),
        "k", 2, "seed",
    )
    merge_upsert_pandas(t, pd.DataFrame({"k": [1], "val": [11]}), "k", 2, "w1")
    # re-apply the SAME value: bucket rewritten, every row carried equal
    merge_upsert_pandas(t, pd.DataFrame({"k": [1], "val": [11]}), "k", 2, "w2")
    merge_upsert_pandas(t, pd.DataFrame({"k": [9], "val": [9]}), "k", 2, "w3")

    def rows(lo, hi):
        return sorted(
            (r.k, r.val, r._change_type, r._commit_version)
            for r in table_changes_spark(spark, t, "k", lo, hi).collect()
        )

    full = rows(0, 3)
    paged = sorted(sum((rows(v, v) for v in range(4)), []))
    assert paged == full
    assert [x for x in full if x[3] == 2] == []  # carried-equal: silent
    assert [x for x in full if x[3] == 3] == [(9, 9, "insert", 3)]
    assert {x[2] for x in full if x[3] == 1} == {"update_pre", "update_post"}


# -- append / OPTIMIZE / manifest-stats file skipping -----------------------


def _spark_rows(spark, t: TableLog, version=None):
    paths = t.live_paths_at(version) if version is not None \
        else t.live_paths()
    return sorted(
        (r.k, r.val)
        for r in spark.read.parquet(*paths).select("k", "val").collect()
    )


def test_append_is_adds_only_and_rewinnable(spark):
    """Blind append stages NEW files only (no base file read or
    removed), and on losing a version race re-commits the SAME staged
    files at the next version — adds-only commutes, so attempts=2 with
    zero recompute and no lost rows on either side."""
    from distribot_spark.sources.acid import append_spark, merge_upsert_pandas

    t = TableLog(_tmp_table())
    t.init()
    merge_upsert_pandas(
        t, pd.DataFrame({"k": [0, 1, 2, 3], "val": [0, 1, 2, 3]}),
        "k", 4, "seed",
    )
    live_before = t.snapshot()[1]

    fired = []

    def interloper(v):
        if not fired:
            fired.append(v)
            merge_upsert_pandas(
                t, pd.DataFrame({"k": [2], "val": [22]}), "k", 4, "racer"
            )

    df = spark.createDataFrame(
        pd.DataFrame({"k": [10, 11, 12, 13], "val": [10, 11, 12, 13]})
    )
    st = append_spark(
        spark, t, df, "k", 4, "appender", pre_commit_hook=interloper
    )
    assert st["attempts"] == 2  # lost once, re-committed same files
    assert st["files_added"] == 4
    _, live_after = t.snapshot()
    # every pre-race base file the racer didn't rewrite is still live
    racer_bucket = 2 % 4
    kept = {f for f, b in live_before.items() if b != racer_bucket}
    assert kept <= set(live_after)
    assert _spark_rows(spark, t) == sorted(
        [(0, 0), (1, 1), (2, 22), (3, 3),
         (10, 10), (11, 11), (12, 12), (13, 13)]
    )


def test_optimize_bin_packs_is_layout_only_and_noop_when_compact(spark):
    """Six fragmented appends -> OPTIMIZE packs each bucket to one
    file; rows identical before/after; the optimize version's change
    feed is empty (pure layout); a second OPTIMIZE is a no-op commit-
    free return."""
    from distribot_spark.sources.acid import (
        append_spark,
        optimize_table_spark,
        table_changes_spark,
    )

    t = TableLog(_tmp_table())
    t.init()
    for w in range(3):
        df = spark.createDataFrame(
            pd.DataFrame({"k": range(w * 20, w * 20 + 20),
                          "val": range(w * 20, w * 20 + 20)})
        )
        append_spark(spark, t, df, "k", 4, f"a{w}")
    before = _spark_rows(spark, t)
    v_before, live = t.snapshot()
    assert max(
        sum(1 for b in live.values() if b == i) for i in range(4)
    ) == 3  # fragmented: 3 files per bucket

    st = optimize_table_spark(spark, t, "k", 4, "opt")
    assert st["rewritten_buckets"] == 4
    assert st["files_after"] == 4 < st["files_before"] == 12
    assert _spark_rows(spark, t) == before
    # time travel still serves the pre-optimize layout
    assert _spark_rows(spark, t, version=v_before) == before
    cdf = table_changes_spark(
        spark, t, "k",
        from_version=st["committed_version"],
        to_version=st["committed_version"],
    )
    assert cdf.count() == 0

    st2 = optimize_table_spark(spark, t, "k", 4, "opt2")
    assert st2["rewritten_buckets"] == 0
    assert st2["committed_version"] == st["committed_version"]  # no commit


def test_optimize_losing_race_folds_concurrent_append(spark):
    """OPTIMIZE serializes like any OCC commit: an append landing
    between its snapshot and commit forces a recompute against the new
    head, so the packed layout CONTAINS the appended rows — no lost
    update, no stale-layout commit."""
    from distribot_spark.sources.acid import append_spark, optimize_table_spark

    t = TableLog(_tmp_table())
    t.init()
    for w in range(2):
        df = spark.createDataFrame(
            pd.DataFrame({"k": range(w * 10, w * 10 + 10),
                          "val": range(w * 10, w * 10 + 10)})
        )
        append_spark(spark, t, df, "k", 2, f"a{w}")

    fired = []

    def interloper(v):
        if not fired:
            fired.append(v)
            append_spark(
                spark, t,
                spark.createDataFrame(pd.DataFrame({"k": [100], "val": [100]})),
                "k", 2, "racer",
            )

    st = optimize_table_spark(
        spark, t, "k", 2, "opt", pre_commit_hook=interloper
    )
    assert st["attempts"] == 2
    assert (100, 100) in _spark_rows(spark, t)
    _, live = t.snapshot()
    assert len(live) == 2  # racer's file folded into the packed layout


def test_manifest_stats_pruning_is_conservative():
    """live_paths_pruned: intersecting ranges kept, disjoint pruned,
    and a file with NO recorded stats for the column is always kept —
    omission can never drop data."""
    t = TableLog(_tmp_table())
    t.init()
    adds = [
        {"file": t.new_data_file(0), "pb": 0,
         "stats": {"d": {"min": "1995-01-01", "max": "1995-12-31"}}},
        {"file": t.new_data_file(1), "pb": 1,
         "stats": {"d": {"min": "1996-03-01", "max": "1996-04-30"}}},
        {"file": t.new_data_file(2), "pb": 2, "stats": {}},  # no stats
    ]
    for a in adds:
        with open(t.data_path(a["file"]), "wb"):
            pass
    assert t.try_commit(t.version(), adds, [], "w")
    kept, pruned = t.live_paths_pruned("d", "1996-01-01", "1996-06-30")
    assert pruned == 1
    assert {os.path.basename(p) for p in kept} == {
        adds[1]["file"], adds[2]["file"]
    }
    # fully-covering range prunes nothing
    kept2, pruned2 = t.live_paths_pruned("d", "1990-01-01", "2999-01-01")
    assert pruned2 == 0 and len(kept2) == 3


def test_parquet_footer_stats_round_trip(spark):
    """parquet_file_stats lifts footer min/max into JSON scalars whose
    ordering matches the column's (dates -> ISO strings); a column
    missing from the file is omitted, not fabricated."""
    import tempfile

    from distribot_spark.sources.acid import parquet_file_stats

    d = tempfile.mkdtemp(prefix="stats_", dir="/root/repo/.tmp")
    pdf = pd.DataFrame({
        "k": [3, 1, 2],
        "d": pd.to_datetime(["1996-05-01", "1995-01-15", "1997-12-31"]),
        "s": ["m", "a", "z"],
    })
    pdf["d"] = pdf["d"].dt.date
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(d, "f.parquet"))
    st = parquet_file_stats(os.path.join(d, "f.parquet"),
                            ["k", "d", "s", "absent"])
    assert st["k"] == {"min": 1, "max": 3}
    assert st["d"] == {"min": "1995-01-15", "max": "1997-12-31"}
    assert st["s"] == {"min": "a", "max": "z"}
    assert "absent" not in st


# -- user-facing facade ----------------------------------------------------


def test_table_facade_end_to_end(spark):
    """The DeltaTable-shaped handle (sources/table.Table) drives the
    whole layer — create / merge / append / DV delete / sync / optimize
    / time travel by version AND timestamp / change feed / history /
    expiry+vacuum — purely by delegation, so this is an API-surface
    test: every call must land on the already-pinned free function and
    the states must compose."""
    from distribot_spark.sources import Table
    from distribot_spark.sources.acid import SnapshotExpired

    path = _tmp_table() + "/t"
    t = Table.create(
        spark,
        path,
        spark.createDataFrame([(k, float(k)) for k in range(16)],
                              "k long, val double"),
        key="k", n_buckets=4,
    )
    t.merge(spark.createDataFrame([(3, 33.0)], "k long, val double"))
    t.append(spark.createDataFrame([(100, 100.0)], "k long, val double"))
    st = t.delete(spark.createDataFrame([(5,)], "k long"))
    assert st["dv_files"] > 0

    rows = sorted((r.k, r.val) for r in t.read().collect())
    expect = {k: float(k) for k in range(16)}
    expect.update({3: 33.0, 100: 100.0})
    del expect[5]
    assert rows == sorted(expect.items())

    # timestamp travel to just after v0 sees the original 16 rows
    ts0 = t.log.read_commit(0)["ts"]
    assert t.read(timestamp=ts0).count() == 16
    assert t.read(version=0).count() == 16

    t.sync(spark.createDataFrame(
        sorted(expect.items()) + [(200, 200.0)], "k long, val double"
    ))
    t.optimize()
    assert t.log.live_dvs() == {}

    hist = {r.version: r for r in t.history().collect()}
    assert set(hist) == set(range(t.version() + 1))
    assert hist[0].writer == "init" and hist[0].n_removes == 0
    assert any(r.n_dvs > 0 for r in hist.values())  # the DV commit

    ch = t.change_feed(from_version=t.version(), to_version=t.version())
    assert ch.count() == 0  # optimize: layout-only

    t.expire_snapshots(keep_last=2)
    assert t.vacuum(min_age_seconds=0.0)
    with pytest.raises(SnapshotExpired):
        t.read(version=0)
    final = sorted((r.k, r.val) for r in t.read().collect())
    assert final == sorted(list(expect.items()) + [(200, 200.0)])

    # a second handle (fresh process stand-in) sees the same table
    from distribot_spark.sources import Table as T2
    t2 = T2.for_path(spark, path, key="k", n_buckets=4)
    assert t2.version() == t.version()
    assert sorted((r.k, r.val) for r in t2.read().collect()) == final


# -- CHECK constraints -----------------------------------------------------


def test_check_constraints_enforced_on_every_write_path(spark):
    """CHECK constraints (Delta's ADD CONSTRAINT, fixed at create):
    persisted in table metadata, enforced by the SPARK writers
    executor-side inside the stage job and by the JVM-free pandas
    clients before staging — same DSL, same semantics (range checks
    pass NULL unless not_null). A violating write fails BEFORE anything
    lands in the log; valid writes are unaffected."""
    from distribot_spark.sources import Table
    from distribot_spark.sources.acid import (
        append_pandas,
        merge_upsert_pandas,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k), "a") for k in range(8)],
                              "k long, val double, tag string"),
        "k", n_buckets=2,
        constraints={
            "val_nonneg": {"col": "val", "min": 0},
            "tag_known": {"col": "tag", "isin": ["a", "b"]},
            "val_set": {"col": "val", "not_null": True},
        },
    )
    assert set(t.constraints()) == {"val_nonneg", "tag_known", "val_set"}
    v0 = t.version()

    from distribot_spark.sources.acid import append_spark, merge_upsert_spark

    # valid writes pass on every path
    merge_upsert_spark(
        spark, t, spark.createDataFrame([(1, 11.0, "b")],
                                        "k long, val double, tag string"),
        "k", 2, "ok-merge",
    )
    append_pandas(t, pd.DataFrame({"k": [100], "val": [1.5], "tag": ["a"]}),
                  "k", 2, "ok-append")

    # violations fail loudly, per path, per clause — and commit nothing
    v_ok = t.version()
    with pytest.raises(Exception, match="val_nonneg"):
        append_spark(
            spark, t,
            spark.createDataFrame([(200, -1.0, "a")],
                                  "k long, val double, tag string"),
            "k", 2, "bad-append",
        )
    with pytest.raises(Exception, match="tag_known"):
        merge_upsert_spark(
            spark, t,
            spark.createDataFrame([(2, 2.0, "z")],
                                  "k long, val double, tag string"),
            "k", 2, "bad-merge",
        )
    with pytest.raises(ValueError, match="val_set"):
        merge_upsert_pandas(
            t, pd.DataFrame({"k": [3], "val": [float("nan")],
                             "tag": ["a"]}),
            "k", 2, "bad-pandas",
        )
    with pytest.raises(ValueError, match="val_nonneg"):
        append_pandas(
            t, pd.DataFrame({"k": [300], "val": [-5.0], "tag": ["b"]}),
            "k", 2, "bad-pandas-append",
        )
    assert t.version() == v_ok  # failed writes committed nothing
    assert v0 == 0

    # the facade surfaces constraints at create too
    t2 = Table.create(
        spark, _tmp_table() + "/t",
        spark.createDataFrame([(1, 1.0)], "k long, val double"),
        key="k", n_buckets=2,
    )
    assert t2.log.constraints() == {}


def test_quarantine_mode_diverts_instead_of_failing(spark):
    """dlt-style expectations: a constraint with
    on_violation='quarantine' DIVERTS violating rows to the table's
    dead-letter area (tagged with the failed constraint + writer) and
    the write proceeds with the clean rows — per path, Spark and
    pandas; fail-mode constraints on the same table still abort. Bad
    rows never reach the log, never silently vanish."""
    import os as _os

    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        merge_upsert_spark,
        quarantine_dir,
        read_quarantine,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
        constraints={
            "val_nonneg": {"col": "val", "min": 0,
                           "on_violation": "quarantine"},
            "val_cap": {"col": "val", "max": 1e6},  # fail-mode
        },
    )

    st = append_spark(
        spark, t,
        spark.createDataFrame([(100, 100.0), (101, -1.0), (102, -2.0)],
                              "k long, val double"),
        "k", 2, "feed-a",
    )
    assert st["quarantined"] == 2, st
    st2 = merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(3, -33.0), (4, 44.0)],
                              "k long, val double"),
        "k", 2, "feed-b",
    )
    assert st2["quarantined"] == 1, st2
    st3 = append_pandas(
        t, pd.DataFrame({"k": [200, 201], "val": [-9.0, 9.0]}),
        "k", 2, "feed-c",
    )
    assert st3["quarantined"] == 1, st3

    got = dict(_logical_rows(spark, t))
    assert got[100] == 100.0 and got[4] == 44.0 and got[201] == 9.0
    assert 101 not in got and 102 not in got and 200 not in got
    assert got[3] == 3.0  # the bad update never landed

    q = read_quarantine(spark, t)
    qrows = sorted((r.k, r.val, r._constraint, r._writer)
                   for r in q.collect())
    assert qrows == [
        (3, -33.0, "val_nonneg", "feed-b"),
        (101, -1.0, "val_nonneg", "feed-a"),
        (102, -2.0, "val_nonneg", "feed-a"),
        (200, -9.0, "val_nonneg", "feed-c"),
    ]
    assert _os.path.isdir(quarantine_dir(t))

    # fail-mode still aborts the whole write
    with pytest.raises(Exception, match="val_cap"):
        append_spark(
            spark, t,
            spark.createDataFrame([(300, 2e6)], "k long, val double"),
            "k", 2, "feed-d",
        )


def test_alter_add_drop_constraint_lifecycle(spark):
    """ALTER on a live table: ADD validates existing rows (reject when
    violated, meta untouched), installs via the commit-log barrier
    (lands in history), is enforced by BOTH clients' next writes;
    DROP re-admits."""
    from distribot_spark.sources.acid import (
        alter_add_constraint_spark,
        alter_drop_constraint,
        append_pandas,
        append_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    v0 = t.version()
    st = alter_add_constraint_spark(
        spark, t, "val_cap", {"col": "val", "max": 100},
    )
    assert st == {"committed_version": v0 + 1, "attempts": 1}
    assert t.constraints() == {"val_cap": {"col": "val", "max": 100}}
    assert t.constraints_rev() == 1
    # the barrier commit is visible history with the alter writer
    with open(t._commit_path(v0 + 1)) as fh:
        body = json.load(fh)
    assert body["writer"] == "alter" and body["adds"] == []

    # both clients enforce it on their next write
    append_spark(
        spark, t, spark.createDataFrame([(100, 50.0)], "k long, val double"),
        "k", 2, "w",
    )
    with pytest.raises(Exception, match="val_cap"):
        append_spark(
            spark, t,
            spark.createDataFrame([(101, 500.0)], "k long, val double"),
            "k", 2, "w",
        )
    with pytest.raises(ValueError, match="val_cap"):
        append_pandas(t, pd.DataFrame({"k": [102], "val": [500.0]}),
                      "k", 2, "w")

    # ADD that existing rows violate: rejected, meta untouched
    with pytest.raises(ValueError, match="existing row"):
        alter_add_constraint_spark(
            spark, t, "val_floor", {"col": "val", "min": 5},
        )
    assert "val_floor" not in t.constraints()
    # duplicate name: rejected
    with pytest.raises(ValueError, match="already exists"):
        alter_add_constraint_spark(
            spark, t, "val_cap", {"col": "val", "max": 7},
        )

    alter_drop_constraint(t, "val_cap")
    assert t.constraints() == {} and t.constraints_rev() == 2
    append_pandas(t, pd.DataFrame({"k": [103], "val": [500.0]}), "k", 2, "w")
    with pytest.raises(KeyError):
        alter_drop_constraint(t, "nope")


def test_alter_barrier_loses_to_concurrent_commit_and_revalidates(spark):
    """The race ALTER must survive: a writer's commit lands between
    validation and the barrier link. The barrier loses, the constraint
    is retracted (fresh rev — no ABA), and revalidation against the new
    head sees the racer's violating row → the ALTER fails instead of
    certifying a constraint the table already breaks."""
    import pyarrow as pa

    from distribot_spark.sources.acid import (
        alter_add_constraint_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    state = {}

    def rogue_commit(v):
        # simulates a writer that applied the OLD (empty) constraint
        # set and links its commit just before the ALTER's barrier:
        # stage a violating row through the raw log primitives
        if "done" in state:
            return
        state["done"] = True
        name = t.new_data_file(0)
        pq.write_table(
            pa.table({"k": [500], "val": [-777.0]}),
            t.data_path(name),
        )
        assert t.try_commit(v, [{"file": name, "pb": 0}], [], "rogue")

    with pytest.raises(ValueError, match="existing row"):
        alter_add_constraint_spark(
            spark, t, "val_nonneg", {"col": "val", "min": 0},
            pre_commit_hook=rogue_commit,
        )
    # constraint retracted, rev advanced past both persists (no ABA),
    # the rogue row won
    assert t.constraints() == {}
    assert t.constraints_rev() == 2
    assert (500, -777.0) in _logical_rows(spark, t)


def test_alter_mid_write_forces_writer_to_reapply(spark):
    """A writer that applied constraints BEFORE a concurrent ALTER must
    not commit under the stale set: the ALTER's barrier commit bumps
    the version, the writer's rev check fires on its commit attempt,
    and the whole write restarts under the NEW set — fail-mode then
    rejects the violating row the stale set would have admitted."""
    from distribot_spark.sources.acid import (
        alter_add_constraint_spark,
        merge_upsert_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    state = {}

    def alter_midflight(v):
        if "done" in state:
            return
        state["done"] = True
        state["alter"] = alter_add_constraint_spark(
            spark, t, "val_nonneg", {"col": "val", "min": 0},
        )

    before = _logical_rows(spark, t)
    with pytest.raises(Exception, match="val_nonneg"):
        merge_upsert_spark(
            spark, t,
            spark.createDataFrame([(3, -33.0), (4, 44.0)],
                                  "k long, val double"),
            "k", 2, "late-writer",
            pre_commit_hook=alter_midflight,
        )
    # the ALTER validated a clean head (writer's rows unstaged), won its
    # barrier, and the restarted writer was rejected wholesale
    assert state["alter"]["committed_version"] == t.version()
    assert _logical_rows(spark, t) == before
    # no orphan staged data beyond the live set + quarantine-free
    live = set(t.snapshot()[1])
    on_disk = {f for f in os.listdir(t.data_dir)
               if f.endswith(".parquet")}
    assert on_disk == live


def test_alter_mid_write_quarantine_restart_no_double_divert(spark):
    """Restart hygiene: the aborted attempt's quarantine output is
    retracted before the retry, so a row diverted under the OLD set
    appears exactly once in the dead-letter area after the write lands
    under the NEW set (which diverts it again, plus the newly-added
    expectation's rows)."""
    from distribot_spark.sources.acid import (
        alter_add_constraint_spark,
        append_spark,
        read_quarantine,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
        constraints={"val_nonneg": {"col": "val", "min": 0,
                                    "on_violation": "quarantine"}},
    )
    state = {}

    def alter_midflight(v):
        if "done" in state:
            return
        state["done"] = True
        alter_add_constraint_spark(
            spark, t, "val_cap",
            {"col": "val", "max": 100, "on_violation": "quarantine"},
        )

    st = append_spark(
        spark, t,
        spark.createDataFrame(
            [(10, -1.0), (11, 500.0), (12, 50.0)], "k long, val double"),
        "k", 2, "feed",
        pre_commit_hook=alter_midflight,
    )
    # first attempt diverted only k=10 (val_nonneg); the restart under
    # the new set diverts 10 AND 11 — and retracted the stale output
    assert st["quarantined"] == 2, st
    got = dict(_logical_rows(spark, t))
    assert got[12] == 50.0 and 10 not in got and 11 not in got
    q = sorted((r.k, r._constraint)
               for r in read_quarantine(spark, t).collect())
    assert q == [(10, "val_nonneg"), (11, "val_cap")]


def test_persisted_layout_resolves_everywhere(spark):
    """The table layout (merge key + bucket count) is persisted at
    create, so every writer/reader — Spark, pandas, CDF, OPTIMIZE, the
    facade — runs WITHOUT the caller re-stating them: the pair a
    mismatch on silently corrupts merges is table metadata, not a
    per-call argument (hash_buckets precedent). Explicit args still
    win (the rebucket path), and a pre-layout table without args is a
    hard error, not a guess."""
    from distribot_spark.sources.acid import (
        append_pandas,
        delete_keys_spark,
        merge_upsert_pandas,
        merge_upsert_spark,
        optimize_table_spark,
        read_snapshot_spark,
        table_changes_spark,
        write_initial_spark,
    )
    from distribot_spark.sources.table import Table

    path = _tmp_table()
    t = TableLog(path)
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(16)],
                              "k long, val double"),
        "k", n_buckets=4,
    )
    assert t.layout() == ("k", 4)

    # every client, no layout args
    merge_upsert_pandas(t, pd.DataFrame({"k": [1], "val": [11.0]}))
    merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(2, 22.0)], "k long, val double"),
    )
    append_pandas(t, pd.DataFrame({"k": [100], "val": [1.0]}))
    delete_keys_spark(
        spark, t, spark.createDataFrame([(3,)], "k long"),
    )
    optimize_table_spark(spark, t, writer="opt")
    got = dict(_logical_rows(spark, t))
    assert got[1] == 11.0 and got[2] == 22.0 and got[100] == 1.0
    assert 3 not in got
    # CDF without key; DV-folded read without dv_key
    assert table_changes_spark(spark, t).count() > 0
    assert read_snapshot_spark(spark, t).count() == len(got)

    # facade attaches with just the path
    t2 = Table.for_path(spark, path)
    assert (t2.key, t2.n_buckets) == ("k", 4)
    assert t2.read().count() == len(got)

    # files respect the persisted count (all buckets < 4)
    assert {b for b in t.snapshot()[1].values()} <= set(range(4))

    # a pre-layout table without args is a hard error
    legacy = TableLog(_tmp_table())
    legacy.init()
    with pytest.raises(ValueError, match="no persisted layout"):
        merge_upsert_pandas(legacy, pd.DataFrame({"k": [0], "val": [0.0]}))
    merge_upsert_pandas(legacy, pd.DataFrame({"k": [0], "val": [0.0]}),
                        "k", 2, "w")  # explicit still works
    with pytest.raises(ValueError, match="no persisted layout"):
        Table.for_path(spark, legacy.path)


def test_rebucket_mid_write_forces_writer_restart(spark):
    """A writer prepared under the OLD bucket count must not commit
    against files a rebucketing OPTIMIZE just rewrote (it would select
    the wrong files and duplicate keys): the rebucket's rewrite commit
    makes the writer lose OCC, and the retry's gate sees the EFFECTIVE
    layout change and restarts the write under the new count."""
    from distribot_spark.sources.acid import (
        merge_upsert_spark,
        optimize_table_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(32)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    state = {}

    def rebucket_midflight(v):
        if "done" in state:
            return
        state["done"] = True
        state["opt"] = optimize_table_spark(
            spark, t, n_buckets=8, writer="opt", rewrite_all=True,
        )

    st = merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(7, 77.0), (100, 100.0)],
                              "k long, val double"),
        pre_commit_hook=rebucket_midflight,
    )
    assert state["opt"]["rewritten_buckets"] == 2
    assert st["committed_version"] == t.version()
    assert t.layout() == ("k", 8)
    got = dict(_logical_rows(spark, t))
    assert got[7] == 77.0 and got[100] == 100.0 and len(got) == 33
    # every live file respects the NEW layout — including the writer's
    _, live = t.snapshot()
    for f, b in live.items():
        ks = pq.read_table(t.data_path(f)).to_pandas()["k"]
        assert all(int(k) % 8 == b for k in ks), (f, b)


def test_rebucket_phase2_crash_heals_on_next_resolve(spark):
    """Crash between the rebucket's rewrite commit and its metadata
    persist: the pending marker + landed commit are enough for ANY
    later resolver to finish phase 2 — the stale persisted count is
    never served, and the next no-arg writer buckets under the new
    layout."""
    from distribot_spark.sources.acid import (
        merge_upsert_pandas,
        optimize_table_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(32)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    t._finish_rebucket = lambda pending: None  # simulate the crash
    optimize_table_spark(spark, t, n_buckets=8, writer="opt",
                         rewrite_all=True)
    assert t.layout() == ("k", 2)  # phase 2 never ran
    assert t._meta()["rebucket_pending"]["to"] == 8

    healer = TableLog(t.path)  # any fresh handle/process
    assert healer.effective_layout() == ("k", 8)
    assert healer.layout() == ("k", 8)  # healed: persisted + cleared
    assert "rebucket_pending" not in healer._meta()
    merge_upsert_pandas(healer, pd.DataFrame({"k": [5], "val": [55.0]}))
    _, live = healer.snapshot()
    for f, b in live.items():
        ks = pq.read_table(healer.data_path(f)).to_pandas()["k"]
        assert all(int(k) % 8 == b for k in ks)


def test_constraint_on_column_missing_from_write(spark):
    """Schema-evolution × constraints: a write omitting a constrained
    column is an all-NULL column for that write (the merge
    NULL-backfills it). SQL CHECK semantics apply — range/isin checks
    PASS (NULL passes), not_null fails WHOLESALE with a clear error
    (fail-mode) or diverts every row (quarantine-mode) — never an
    unresolved-column crash. Both clients."""
    from distribot_spark.sources.acid import (
        alter_add_constraint_spark,
        alter_drop_constraint,
        append_pandas,
        merge_upsert_spark,
        read_quarantine,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k), 1.0) for k in range(8)],
                              "k long, val double, extra double"),
        "k", n_buckets=2,
    )
    # range check on `extra`: a write without the column passes (NULL)
    alter_add_constraint_spark(spark, t, "extra_cap",
                               {"col": "extra", "max": 100})
    merge_upsert_spark(
        spark, t, spark.createDataFrame([(100, 1.0)], "k long, val double"),
    )
    append_pandas(t, pd.DataFrame({"k": [101], "val": [2.0]}))
    got = {r.k for r in
           spark.read.option("mergeSchema", "true")
           .parquet(*t.live_paths()).collect()}
    assert {100, 101} <= got

    # ALTER not_null is correctly REJECTED now: the evolved rows above
    # already carry NULL extra (validation sees them)
    with pytest.raises(ValueError, match="existing row"):
        alter_add_constraint_spark(spark, t, "extra_nn",
                                   {"col": "extra", "not_null": True})

    # not_null from creation: a write omitting the column fails
    # wholesale with a clear error — both clients
    t2 = TableLog(_tmp_table())
    write_initial_spark(
        spark, t2,
        spark.createDataFrame([(0, 1.0, 1.0)],
                              "k long, val double, extra double"),
        "k", n_buckets=2,
        constraints={"extra_nn": {"col": "extra", "not_null": True}},
    )
    with pytest.raises(ValueError, match="missing from this write"):
        merge_upsert_spark(
            spark, t2,
            spark.createDataFrame([(102, 1.0)], "k long, val double"),
        )
    with pytest.raises(ValueError, match="missing from this write"):
        append_pandas(t2, pd.DataFrame({"k": [103], "val": [2.0]}))

    # quarantine-mode not_null: every row of the write diverted
    t3 = TableLog(_tmp_table())
    write_initial_spark(
        spark, t3,
        spark.createDataFrame([(0, 1.0, 1.0)],
                              "k long, val double, extra double"),
        "k", n_buckets=2,
        constraints={"extra_nn_q": {"col": "extra", "not_null": True,
                                    "on_violation": "quarantine"}},
    )
    st = merge_upsert_spark(
        spark, t3,
        spark.createDataFrame([(104, 1.0), (105, 2.0)],
                              "k long, val double"),
    )
    assert st["quarantined"] == 2, st
    st2 = append_pandas(t3, pd.DataFrame({"k": [106], "val": [3.0]}))
    assert st2["quarantined"] == 1, st2
    q = {(r.k, r._constraint) for r in read_quarantine(spark, t3)
         .select("k", "_constraint").collect()}
    assert {(104, "extra_nn_q"), (105, "extra_nn_q"),
            (106, "extra_nn_q")} <= q


def test_reprocess_quarantine_closes_the_dlq_loop(spark):
    """divert → fix rules → replay: after the offending expectation is
    dropped, `reprocess_quarantine_spark` lands the dead-lettered rows
    through the normal MERGE and clears the replayed batches. While
    the expectation still stands, replay RE-diverts (count stable,
    exactly one copy, reprocess provenance). Per-constraint replay
    preserves the other expectations' rows. Same key diverted twice
    replays only its latest payload — no duplicate keys planted."""
    from distribot_spark.sources.acid import (
        alter_drop_constraint,
        append_spark,
        quarantine_dir,
        read_quarantine,
        reprocess_quarantine_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
        constraints={
            "val_nonneg": {"col": "val", "min": 0,
                           "on_violation": "quarantine"},
            "val_cap": {"col": "val", "max": 1000,
                        "on_violation": "quarantine"},
        },
    )
    # two corrections of the same key land in the DLQ; only the latest
    # (-2.0) must replay
    append_spark(spark, t,
                 spark.createDataFrame([(100, -1.0)], "k long, val double"))
    time.sleep(0.05)  # distinct _qts
    append_spark(spark, t,
                 spark.createDataFrame([(100, -2.0), (200, 2000.0)],
                                       "k long, val double"))

    # replay with rules unchanged: everything re-diverts, one copy each
    st = reprocess_quarantine_spark(spark, t)
    assert st["n_replayed"] == 2 and st["n_rediverted"] == 2, st
    q = sorted((r.k, r.val, r._writer)
               for r in read_quarantine(spark, t).collect())
    assert q == [(100, -2.0, "reprocess"), (200, 2000.0, "reprocess")], q

    # fix ONLY the cap: per-constraint replay lands 200, keeps 100
    alter_drop_constraint(t, "val_cap")
    st = reprocess_quarantine_spark(spark, t, constraint="val_cap")
    assert st["n_replayed"] == 1 and st["n_rediverted"] == 0, st
    got = dict(_logical_rows(spark, t))
    assert got[200] == 2000.0 and 100 not in got
    q = [(r.k, r.val) for r in read_quarantine(spark, t).collect()]
    assert q == [(100, -2.0)], q

    # fix the floor too: full replay drains the DLQ
    alter_drop_constraint(t, "val_nonneg")
    st = reprocess_quarantine_spark(spark, t)
    assert st["n_replayed"] == 1 and st["n_rediverted"] == 0, st
    got = dict(_logical_rows(spark, t))
    assert got[100] == -2.0
    qroot = quarantine_dir(t)
    assert not os.path.isdir(qroot) or not os.listdir(qroot)
    # idempotent on empty
    assert reprocess_quarantine_spark(spark, t) == {
        "n_replayed": 0, "n_rediverted": 0}


def test_unique_constraint_primary_key_contract(spark):
    """UNIQUE on the merge key — the primary-key contract: blind
    APPENDs are checked batch-internally AND against the live rows of
    their touched buckets (DV-folded), un-versioned MERGE batches must
    carry distinct keys, versioned merges are exempt (the argmax
    collapses dups), and a DV-deleted key may legally be re-appended.
    Both clients."""
    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        delete_keys_spark,
        merge_upsert_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2,
        constraints={"pk": {"col": "k", "unique": True}},
    )

    # fresh keys append fine
    append_spark(spark, t,
                 spark.createDataFrame([(100, 1.0)], "k long, val double"))
    append_pandas(t, pd.DataFrame({"k": [101], "val": [2.0]}))

    # batch-internal duplicate
    with pytest.raises(ValueError, match="duplicate key"):
        append_spark(
            spark, t,
            spark.createDataFrame([(200, 1.0), (200, 2.0)],
                                  "k long, val double"),
        )
    # key already live — both clients
    with pytest.raises(ValueError, match="already exist"):
        append_spark(
            spark, t,
            spark.createDataFrame([(3, 9.0)], "k long, val double"),
        )
    with pytest.raises(ValueError, match="already exist"):
        append_pandas(t, pd.DataFrame({"k": [100], "val": [9.0]}))

    # upsert of an existing key is legal (MERGE preserves uniqueness)
    merge_upsert_spark(
        spark, t, spark.createDataFrame([(3, 33.0)], "k long, val double"),
    )
    # un-versioned MERGE batch with internal dups is NOT
    with pytest.raises(ValueError, match="duplicate key"):
        merge_upsert_spark(
            spark, t,
            spark.createDataFrame([(4, 1.0), (4, 2.0)],
                                  "k long, val double"),
        )

    # DV-delete then re-append: legal (the fold sees the key as gone)
    delete_keys_spark(spark, t, spark.createDataFrame([(5,)], "k long"))
    append_spark(spark, t,
                 spark.createDataFrame([(5, 55.0)], "k long, val double"))

    got = dict(_logical_rows(spark, t))
    assert got[3] == 33.0 and got[5] == 55.0 and got[100] == 1.0
    assert len(got) == len(set(got))  # keys unique by construction


def test_unique_constraint_occ_recheck_on_lost_race(spark):
    """The race PK enforcement must survive: two appends of the SAME
    key interleave; the loser's re-commit path re-checks uniqueness
    against the changed bucket file set and FAILS instead of silently
    planting the duplicate (a blind adds-only re-commit would)."""
    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(4)],
                              "k long, val double"),
        "k", n_buckets=2,
        constraints={"pk": {"col": "k", "unique": True}},
    )
    state = {}

    def racer_commits_same_key(v):
        if "done" in state:
            return
        state["done"] = True
        state["racer"] = append_pandas(
            t, pd.DataFrame({"k": [50], "val": [1.0]}),
        )

    with pytest.raises(ValueError, match="already exist"):
        append_spark(
            spark, t,
            spark.createDataFrame([(50, 2.0)], "k long, val double"),
            pre_commit_hook=racer_commits_same_key,
        )
    assert state["racer"]["committed_version"] == t.version()
    got = dict(_logical_rows(spark, t))
    assert got[50] == 1.0  # the racer's row, exactly once


def test_unique_constraint_alter_add_validates_table(spark):
    """ALTER ADD unique: rejected while duplicate keys exist, installs
    after they are merged away; wrong column and quarantine mode are
    rejected up front."""
    from distribot_spark.sources.acid import (
        alter_add_constraint_spark,
        append_spark,
        merge_upsert_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(4)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    append_spark(spark, t,
                 spark.createDataFrame([(3, 9.0)], "k long, val double"))
    with pytest.raises(ValueError, match="violate it"):
        alter_add_constraint_spark(spark, t, "pk",
                                   {"col": "k", "unique": True})
    with pytest.raises(ValueError, match="merge key"):
        alter_add_constraint_spark(spark, t, "pk2",
                                   {"col": "val", "unique": True})
    with pytest.raises(ValueError, match="quarantine"):
        alter_add_constraint_spark(
            spark, t, "pk3",
            {"col": "k", "unique": True, "on_violation": "quarantine"},
        )
    # the upsert collapses the dup; ALTER then installs and enforces
    merge_upsert_spark(
        spark, t, spark.createDataFrame([(3, 3.0)], "k long, val double"),
    )
    alter_add_constraint_spark(spark, t, "pk", {"col": "k", "unique": True})
    with pytest.raises(ValueError, match="already exist"):
        append_spark(spark, t,
                     spark.createDataFrame([(3, 1.0)], "k long, val double"))


def test_generated_columns_computed_and_validated(spark):
    """GENERATED ALWAYS AS: derived columns (date parts, shards,
    prefixes) are table metadata — ABSENT on a write they are computed
    by the engine (both clients, identical portable DSL); PRESENT they
    are validated row-by-row and a drifted value fails the write, so
    the derived column downstream pruning relies on can never rot."""
    import datetime

    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        merge_upsert_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    d = datetime.date
    write_initial_spark(
        spark, t,
        spark.createDataFrame(
            [(1, d(1996, 3, 14), 10.0), (2, d(1997, 11, 2), 20.0)],
            "k long, dt date, val double"),
        "k", n_buckets=2,
        generated={"ym": {"fn": "yyyymm", "src": "dt"},
                   "shard": {"fn": "pmod", "src": "k", "n": 4}},
    )
    got = {r.k: (r.ym, r.shard)
           for r in read_snapshot_spark(spark, t).collect()}
    assert got == {1: (199603, 1), 2: (199711, 2)}, got

    # spark append without the columns: computed
    append_spark(spark, t, spark.createDataFrame(
        [(10, d(2001, 1, 5), 1.0)], "k long, dt date, val double"))
    # with CORRECT values: validated, passes
    append_spark(spark, t, spark.createDataFrame(
        [(11, d(2002, 6, 1), 1.0, 200206, 3)],
        "k long, dt date, val double, ym int, shard long"))
    # with a WRONG value: the write fails
    with pytest.raises(Exception, match="mismatch"):
        append_spark(spark, t, spark.createDataFrame(
            [(12, d(2002, 6, 1), 1.0, 209999, 0)],
            "k long, dt date, val double, ym int, shard long"))

    # pandas client: same DSL, computed
    append_pandas(t, pd.DataFrame(
        {"k": [20], "dt": [d(2003, 9, 30)], "val": [2.0]}))
    with pytest.raises(ValueError, match="mismatch"):
        append_pandas(t, pd.DataFrame(
            {"k": [21], "dt": [d(2003, 9, 30)], "val": [2.0],
             "ym": [123], "shard": [1]}))

    # merge computes too
    merge_upsert_spark(spark, t, spark.createDataFrame(
        [(1, d(1999, 12, 31), 99.0)], "k long, dt date, val double"))

    got = {r.k: (r.ym, r.shard)
           for r in read_snapshot_spark(spark, t).collect()}
    assert got[10] == (200101, 2) and got[11] == (200206, 3)
    assert got[20] == (200309, 0) and got[1] == (199912, 1)
    assert 12 not in got and 21 not in got

    # the other DSL fns: substr + div
    t2 = TableLog(_tmp_table())
    write_initial_spark(
        spark, t2,
        spark.createDataFrame([(1234, "ALPHA-7", 1.0)],
                              "k long, code string, val double"),
        "k", n_buckets=2,
        generated={"pre": {"fn": "substr", "src": "code",
                           "pos": 1, "len": 2},
                   "kdiv": {"fn": "div", "src": "k", "n": 1000}},
    )
    r = read_snapshot_spark(spark, t2).collect()[0]
    assert (r.pre, r.kdiv) == ("AL", 1)
    rp = append_pandas(t2, pd.DataFrame(
        {"k": [5678], "code": ["BETA-1"], "val": [2.0]}))
    assert rp["committed_version"] == t2.version()
    rows = {x.k: (x.pre, x.kdiv)
            for x in read_snapshot_spark(spark, t2).collect()}
    assert rows[5678] == ("BE", 5)

    # div is FLOOR division on a NEGATIVE source in BOTH clients (the
    # ADVICE divergence: Spark DIV truncates, pandas // floors — the
    # spelled-out non-negative-mod identity makes them agree), so a
    # value computed by one client always validates in the other
    merge_upsert_spark(spark, t2, spark.createDataFrame(
        [(-1234, "GAMMA-2", 3.0)], "k long, code string, val double"))
    append_pandas(t2, pd.DataFrame(
        {"k": [-5678], "code": ["DELTA-9"], "val": [4.0]}))
    rows = {x.k: x.kdiv
            for x in read_snapshot_spark(spark, t2).collect()}
    assert rows[-1234] == -2 and rows[-5678] == -6  # floor, not trunc
    # cross-client validation: pandas validates the Spark-computed
    # value and vice versa (PRESENT column path)
    append_pandas(t2, pd.DataFrame(
        {"k": [-9001], "code": ["EPS-1"], "val": [5.0],
         "pre": ["EP"], "kdiv": [-10]}))
    assert {x.k: x.kdiv for x in
            read_snapshot_spark(spark, t2).collect()}[-9001] == -10


def test_vacuum_quarantine_age_rail(spark):
    """DLQ retention: batches age out whole; young batches stay."""
    from distribot_spark.sources.acid import (
        append_spark,
        quarantine_dir,
        read_quarantine,
        vacuum_quarantine,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(0, 0.0)], "k long, val double"),
        "k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0,
                            "on_violation": "quarantine"}},
    )
    append_spark(spark, t,
                 spark.createDataFrame([(1, -1.0)], "k long, val double"))
    append_spark(spark, t,
                 spark.createDataFrame([(2, -2.0)], "k long, val double"))
    qroot = quarantine_dir(t)
    batches = sorted(os.listdir(qroot))
    assert len(batches) == 2
    # age the first batch beyond the rail
    old = os.path.join(qroot, batches[0])
    os.utime(old, (time.time() - 3600, time.time() - 3600))
    assert vacuum_quarantine(t, older_than=1800) == 1
    assert read_quarantine(spark, t).count() == 1
    assert vacuum_quarantine(t, older_than=1800) == 0


def test_identity_columns_engine_assigned(spark):
    """IDENTITY (GENERATED ALWAYS AS IDENTITY): engine-assigned,
    unique, monotonically increasing ids via commit-reserved ranges —
    appends draw the next range (both clients), MERGE updates INHERIT
    the existing row's id while true inserts draw fresh ones, and a
    batch supplying the column is rejected."""
    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        merge_upsert_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2, identity={"col": "id"},
    )
    rows = {r.k: r.id for r in read_snapshot_spark(spark, t).collect()}
    # ids 0..7, assigned in (bucket, key) order: bucket0 = evens sorted,
    # bucket1 = odds sorted
    assert rows == {0: 0, 2: 1, 4: 2, 6: 3, 1: 4, 3: 5, 5: 6, 7: 7}, rows
    assert t.id_hwm() == 8

    st = append_spark(
        spark, t,
        spark.createDataFrame([(100, 1.0), (101, 2.0)],
                              "k long, val double"),
    )
    assert st["id_range"] == [8, 10], st
    st2 = append_pandas(t, pd.DataFrame({"k": [200], "val": [3.0]}))
    assert st2["id_range"] == [10, 11], st2
    assert t.id_hwm() == 11

    # MERGE: update inherits, insert draws fresh
    merge_upsert_spark(
        spark, t,
        spark.createDataFrame([(2, 22.0), (300, 33.0)],
                              "k long, val double"),
    )
    rows = {r.k: (r.id, r.val)
            for r in read_snapshot_spark(spark, t).collect()}
    assert rows[2] == (1, 22.0)          # id inherited through the upsert
    assert rows[300] == (11, 33.0)       # fresh id from the next range
    ids = [i for i, _ in rows.values()]
    assert len(ids) == len(set(ids)) == 12  # unique, no gaps-by-loss

    # GENERATED ALWAYS: supplying the column is rejected, both clients
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        append_spark(spark, t, spark.createDataFrame(
            [(400, 1.0, 99)], "k long, val double, id long"))
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        append_pandas(t, pd.DataFrame(
            {"k": [401], "val": [1.0], "id": [77]}))


def test_identity_occ_ranges_disjoint_under_race(spark):
    """The property reserved ranges exist for: two writers interleave,
    the loser's commit attempt sees the winner's range in its parent
    fold, restages with shifted ids, and every id stays unique —
    serialized by the version link like every other table rule."""
    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(4)],
                              "k long, val double"),
        "k", n_buckets=2, identity={"col": "id"},
    )
    state = {}

    def racer(v):
        if "done" in state:
            return
        state["done"] = True
        state["b"] = append_pandas(
            t, pd.DataFrame({"k": [50, 51], "val": [1.0, 2.0]}))

    st = append_spark(
        spark, t,
        spark.createDataFrame([(60, 3.0), (61, 4.0)],
                              "k long, val double"),
        pre_commit_hook=racer,
    )
    a, b = st["id_range"], state["b"]["id_range"]
    assert b == [4, 6] and a == [6, 8], (a, b)  # disjoint, serialized
    ids = [r.id for r in read_snapshot_spark(spark, t).collect()]
    assert sorted(ids) == list(range(8))


def test_identity_hwm_flat_across_checkpoints(spark):
    """id_hwm folds from checkpoints (O(CHECKPOINT_EVERY)), stays exact
    across checkpoint boundaries and many commits."""
    from distribot_spark.sources.acid import (
        append_pandas,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(0, 0.0)], "k long, val double"),
        "k", n_buckets=2, identity={"col": "id"},
    )
    for i in range(1, 14):  # crosses the CHECKPOINT_EVERY=10 boundary
        append_pandas(t, pd.DataFrame({"k": [i * 10], "val": [float(i)]}))
    assert t.version() == 13 and t.id_hwm() == 14
    ids = sorted(r.id for r in read_snapshot_spark(spark, t).collect())
    assert ids == list(range(14))


def test_table_detail_metadata_only(spark):
    """DESCRIBE DETAIL: table-level facts from metadata alone —
    version, file census, layout, governance declarations, DV and
    dead-letter presence."""
    from distribot_spark.sources.table import Table

    path = _tmp_table()
    t = Table.create(
        spark, path,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        key="k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0,
                            "on_violation": "quarantine"}},
        identity={"col": "rid"},
    )
    t.append(spark.createDataFrame([(100, -1.0), (101, 5.0)],
                                   "k long, val double"))
    t.delete(spark.createDataFrame([(3,)], "k long"))
    d = t.detail()
    assert d["version"] == 2 and d["num_files"] == 3
    assert d["size_bytes"] > 0
    assert (d["key"], d["n_buckets"]) == ("k", 2)
    assert d["constraints"]["nn"]["on_violation"] == "quarantine"
    assert d["identity"] == {"col": "rid"} and d["id_hwm"] == 9
    assert d["num_dv_files"] == 1 and d["has_quarantine"] is True
    assert d["retention_floor"] == 0 and d["generated"] == {}


def test_restore_table_to_version(spark):
    """RESTORE TO VERSION AS OF: the post-image equals the old
    snapshot — rows, schema, AND deletion-vector state (a file whose
    DV list drifted is reset via same-commit remove+re-add with the
    old sidecars re-attached, merged when there were several); the
    rollback is an ordinary commit, so the change feed reports it and
    time travel across it still works; expired targets raise; identity
    ranges are NOT reused after a restore."""
    from distribot_spark.sources.acid import (
        SnapshotExpired,
        append_spark,
        delete_keys_spark,
        merge_upsert_spark,
        optimize_table_spark,
        read_snapshot_spark,
        restore_table,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(                                      # v0
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=2, identity={"col": "rid"},
    )
    rows_v0 = _restore_rows(spark, t)
    merge_upsert_spark(spark, t, spark.createDataFrame(      # v1
        [(3, 33.0), (100, 1.0)], "k long, val double"))
    delete_keys_spark(spark, t, spark.createDataFrame(       # v2 (DV)
        [(0,)], "k long"))
    delete_keys_spark(spark, t, spark.createDataFrame(       # v3 (DV,
        [(2,)], "k long"))                                   # same file)
    rows_v3 = _restore_rows(spark, t)
    append_spark(spark, t, spark.createDataFrame(            # v4
        [(200, 2.0)], "k long, val double"))

    # restore to v3: multi-DV file state must come back exactly
    st = restore_table(t, 3)
    assert st["committed_version"] == 5 and not st["noop"], st
    assert _restore_rows(spark, t) == rows_v3
    # DVs restored WITHOUT rewriting: deleted keys still gone
    got = {r.k for r in read_snapshot_spark(spark, t).collect()}
    assert 0 not in got and 2 not in got and 200 not in got

    # restore all the way to v0
    restore_table(t, 0)
    assert _restore_rows(spark, t) == rows_v0
    # noop restore: nothing to do, no commit
    st = restore_table(t, 0)
    assert st["noop"] and st["committed_version"] == t.version()

    # time travel ACROSS the restores still works
    assert len(t.snapshot_at(4)[1]) > 0

    # identity never reuses ids, even for rows restored away
    st = append_spark(spark, t, spark.createDataFrame(
        [(300, 3.0)], "k long, val double"))
    assert st["id_range"][0] >= 10, st  # v1's merge + v4's append ids gone

    # writers keep working after restore; optimize compacts as usual
    merge_upsert_spark(spark, t, spark.createDataFrame(
        [(4, 44.0)], "k long, val double"))
    optimize_table_spark(spark, t, writer="opt")
    got = dict((r.k, r.val) for r in
               read_snapshot_spark(spark, t).collect())
    assert got[4] == 44.0 and got[300] == 3.0 and got[0] == 0.0

    # expired target raises cleanly
    t.expire_snapshots(keep_last=2)
    with pytest.raises(SnapshotExpired):
        restore_table(t, 0)


def _restore_rows(spark, t):
    from distribot_spark.sources.acid import read_snapshot_spark

    return sorted((r.k, r.val) for r in
                  read_snapshot_spark(spark, t).collect())


def test_constraint_string_length_clauses(spark):
    """min_len/max_len CHECK clauses — the document-quality gate as a
    table rule, same NULL semantics, both clients, both modes."""
    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        read_quarantine,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(0, "hello world")], "k long, txt string"),
        "k", n_buckets=2,
        constraints={
            "len_floor": {"col": "txt", "min_len": 5,
                          "on_violation": "quarantine"},
            "len_cap": {"col": "txt", "max_len": 80},
        },
    )
    st = append_spark(spark, t, spark.createDataFrame(
        [(1, "ok length"), (2, "tiny"), (3, None)],
        "k long, txt string"))
    assert st["quarantined"] == 1  # 'tiny'; NULL passes (no not_null)
    with pytest.raises(Exception, match="len_cap"):
        append_spark(spark, t, spark.createDataFrame(
            [(4, "x" * 100)], "k long, txt string"))
    st2 = append_pandas(t, pd.DataFrame({"k": [5], "txt": ["nah"]}))
    assert st2["quarantined"] == 1
    with pytest.raises(ValueError, match="len_cap"):
        append_pandas(t, pd.DataFrame({"k": [6], "txt": ["y" * 100]}))
    q = sorted(r.k for r in read_quarantine(spark, t).collect())
    assert q == [2, 5]


def test_rebucket_blocks_stale_restore_and_restarts_delete(spark):
    """Rebucket × the other writers: (a) RESTORE refuses to cross a
    bucket-count change (old manifests' bucket ids would lie under the
    new count — the layout epoch guard); (b) a DELETE in flight when a
    rebucket lands restarts via the gate and still deletes the right
    rows under the new layout."""
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        optimize_table_spark,
        read_snapshot_spark,
        restore_table,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(                                       # v0
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(32)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    state = {}

    def rebucket_midflight(v):
        if "done" in state:
            return
        state["done"] = True
        optimize_table_spark(spark, t, n_buckets=8, writer="opt",
                             rewrite_all=True)                 # v1

    st = delete_keys_spark(
        spark, t, spark.createDataFrame([(5,), (6,)], "k long"),
        pre_commit_hook=rebucket_midflight,
    )
    assert st["deleted_rows"] == 2, st
    got = {r.k for r in read_snapshot_spark(spark, t, dv_key="k").collect()}
    assert 5 not in got and 6 not in got and len(got) == 30
    assert t.layout() == ("k", 8)

    # restore cannot cross the layout epoch...
    with pytest.raises(ValueError, match="layout changed"):
        restore_table(t, 0)
    # ...but within the current epoch it works
    st = restore_table(t, 1)  # the rebucket version, pre-delete
    assert not st["noop"]
    got = {r.k for r in read_snapshot_spark(spark, t, dv_key="k").collect()}
    assert 5 in got and 6 in got and len(got) == 32


def test_generated_columns_null_source_both_clients(spark):
    """A NULL source value yields a NULL generated value in BOTH
    clients (Spark's F.year(NULL) semantics) — no cast crash, no
    stringified 'nan' (the cross-client drift the validation contract
    exists to prevent)."""
    import datetime

    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame(
            [(0, datetime.date(2000, 1, 1), "alpha")],
            "k long, dt date, code string"),
        "k", n_buckets=2,
        generated={"ym": {"fn": "yyyymm", "src": "dt"},
                   "pre": {"fn": "substr", "src": "code",
                           "pos": 1, "len": 2}},
    )
    append_spark(spark, t, spark.createDataFrame(
        [(1, None, None)], "k long, dt date, code string"))
    # same bucket (both even) so the typed values anchor the part
    # file's schema; the null row rides along as date32/string nulls
    append_pandas(t, pd.DataFrame(
        {"k": [2, 4],
         "dt": pd.Series([None, datetime.date(2001, 2, 3)],
                         dtype=object),  # date32 + null, not NANOS
         "code": [None, "beta"]}))
    got = {r.k: (r.ym, r.pre)
           for r in read_snapshot_spark(spark, t).collect()}
    assert got[1] == (None, None) and got[2] == (None, None), got
    assert got[0] == (200001, "al") and got[4] == (200102, "be")


def test_bloom_point_lookup_file_skipping(spark):
    """Per-file bloom filters on the merge key (Delta's bloom index):
    appends/OPTIMIZE lift a portable-xxh64 bloom into the manifest,
    point lookups skip files WITHOUT opening them, never losing a row
    (membership is certified against the full read for present AND
    absent keys); files staged without a bloom are conservatively
    kept."""
    from distribot_spark.sources.acid import (
        append_spark,
        optimize_table_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(0, 0.0)], "k long, val double"),
        "k", n_buckets=4,
    )
    # 6 fragmented appends, disjoint key ranges, blooms on
    for w in range(6):
        append_spark(
            spark, t,
            spark.createDataFrame(
                [(w * 1000 + i, float(i)) for i in range(50)],
                "k long, val double"),
            writer=f"w{w}", bloom_key=True,
        )
    _, live = t.snapshot()
    n_files = len(live)

    hits = misses = 0
    for probe in [1, 1005, 3010, 5049, 99999, 123456]:
        kept, pruned = t.live_paths_pruned_point("k", probe)
        assert pruned > 0, f"probe {probe}: nothing skipped of {n_files}"
        got = spark.read.parquet(*kept).filter(F_col_eq(probe)).count()
        full = spark.read.parquet(*t.live_paths()).filter(
            F_col_eq(probe)).count()
        assert got == full, (probe, got, full)  # skipping drops no rows
        hits += got
        misses += (1 - full)
    assert hits == 4 and misses == 2  # 4 present, 2 absent probes

    # the bloom-less create files are conservatively kept on every
    # probe — the safety property that makes pruning semantics-free
    kept, _ = t.live_paths_pruned_point("k", 99999)
    v0_files = [t.data_path(f) for f in t.snapshot_at(0)[1]]
    assert v0_files and all(f in kept for f in v0_files)
    # OPTIMIZE with blooms: compaction keeps point skipping working
    optimize_table_spark(spark, t, writer="opt", bloom_key=True)
    kept, pruned = t.live_paths_pruned_point("k", 5049)
    assert pruned > 0
    assert spark.read.parquet(*kept).filter(F_col_eq(5049)).count() == 1


def F_col_eq(v):
    from pyspark.sql import functions as F

    return F.col("k") == v


def test_identity_ids_not_burned_by_quarantine(spark):
    """Ordering contract: constraints run BEFORE identity assignment,
    so rows a quarantine-mode expectation diverts never consume ids —
    the reserved range covers exactly the admitted rows and the id
    sequence stays gap-free."""
    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(0, 1.0)], "k long, val double"),
        "k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0,
                            "on_violation": "quarantine"}},
        identity={"col": "rid"},
    )
    st = append_spark(
        spark, t,
        spark.createDataFrame([(10, -1.0), (11, 2.0), (12, -3.0)],
                              "k long, val double"),
    )
    assert st["quarantined"] == 2 and st["id_range"] == [1, 2], st
    st2 = append_pandas(t, pd.DataFrame(
        {"k": [20, 21], "val": [-9.0, 9.0]}))
    assert st2["quarantined"] == 1 and st2["id_range"] == [2, 3], st2
    ids = sorted(r.rid for r in read_snapshot_spark(spark, t).collect())
    assert ids == [0, 1, 2] and t.id_hwm() == 3  # gap-free


def test_constraint_dsl_cross_client_differential(spark):
    """Differential pin: for a seeded random matrix of frames × every
    DSL clause combination, the pandas client and the Spark client
    must divert EXACTLY the same rows to the dead-letter area — the
    portable-DSL promise checked wholesale rather than clause by
    clause. (Seeded, deterministic; a DSL change that skews one client
    fails here before it can skew a table.)"""
    import random

    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        read_quarantine,
        write_initial_spark,
    )

    rng = random.Random(20260815)
    specs = [
        {"col": "val", "min": -5, "on_violation": "quarantine"},
        {"col": "val", "max": 5, "on_violation": "quarantine"},
        {"col": "val", "min": -2, "max": 2, "on_violation": "quarantine"},
        {"col": "val", "not_null": True, "on_violation": "quarantine"},
        {"col": "txt", "isin": ["a", "b", "c"],
         "on_violation": "quarantine"},
        {"col": "txt", "min_len": 2, "max_len": 4,
         "on_violation": "quarantine"},
        {"col": "txt", "not_null": True, "min_len": 3,
         "on_violation": "quarantine"},
    ]
    for trial, spec in enumerate(specs):
        rows = []
        for i in range(40):
            val = rng.choice([None, rng.randint(-10, 10),
                              float(rng.randint(-10, 10))])
            txt = rng.choice([None, "a", "b", "zz", "abcd", "toolongg",
                              "x" * rng.randint(0, 6)])
            rows.append((i, None if val is None else float(val), txt))

        def mktable(tag):
            t = TableLog(_tmp_table())
            write_initial_spark(
                spark, t,
                spark.createDataFrame([(1000, 0.0, "abc")],
                                      "k long, val double, txt string"),
                "k", n_buckets=2, constraints={f"c{trial}": spec},
            )
            return t

        ts_, tp = mktable("s"), mktable("p")
        st_s = append_spark(
            spark, ts_,
            spark.createDataFrame(rows, "k long, val double, txt string"),
        )
        st_p = append_pandas(
            tp, pd.DataFrame(rows, columns=["k", "val", "txt"]))
        assert st_s["quarantined"] == st_p["quarantined"], (trial, spec)
        div_s = ({r.k for r in read_quarantine(spark, ts_).collect()}
                 if st_s["quarantined"] else set())
        div_p = ({r.k for r in read_quarantine(spark, tp).collect()}
                 if st_p["quarantined"] else set())
        assert div_s == div_p, (trial, spec, div_s ^ div_p)


def test_generated_dsl_cross_client_differential(spark):
    """Differential pin for the GENERATED column DSL: a seeded random
    frame appended through the Spark client and the pandas client into
    twin tables must materialize byte-equal derived values for every
    fn — including NULL sources."""
    import datetime
    import random

    from distribot_spark.sources.acid import (
        append_pandas,
        append_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    rng = random.Random(20260816)
    gens = {
        "y": {"fn": "year", "src": "dt"},
        "mo": {"fn": "month", "src": "dt"},
        "ym": {"fn": "yyyymm", "src": "dt"},
        "pre": {"fn": "substr", "src": "code", "pos": 2, "len": 3},
        "sh": {"fn": "pmod", "src": "k", "n": 7},
        "kd": {"fn": "div", "src": "k", "n": 100},
    }
    rows = []
    for i in range(1, 41):
        dt = (None if rng.random() < 0.2 else
              datetime.date(rng.randint(1995, 2005),
                            rng.randint(1, 12), rng.randint(1, 28)))
        code = rng.choice([None, "alpha", "bx", "longercode",
                           "m" * rng.randint(1, 5)])
        rows.append((i, dt, code))

    def mktable():
        t = TableLog(_tmp_table())
        write_initial_spark(
            spark, t,
            spark.createDataFrame(
                [(0, datetime.date(2000, 1, 1), "seed")],
                "k long, dt date, code string"),
            "k", n_buckets=2, generated=gens,
        )
        return t

    ts_, tp = mktable(), mktable()
    append_spark(spark, ts_, spark.createDataFrame(
        rows, "k long, dt date, code string"))
    append_pandas(tp, pd.DataFrame(rows, columns=["k", "dt", "code"]))

    def snap(t):
        return {
            r.k: (r.y, r.mo, r.ym, r.pre, r.sh, r.kd)
            for r in read_snapshot_spark(spark, t).collect()
        }

    a, b = snap(ts_), snap(tp)
    assert a == b, {k: (a[k], b[k]) for k in a if a[k] != b[k]}


def test_bloom_no_false_negatives_property():
    """The bloom safety property, wholesale: for seeded random key
    sets at several sizes (incl. past the size cap, where the filter
    saturates), EVERY inserted key tests positive — false negatives
    are impossible by construction; the test pins it against any
    future change to sizing, probing, or packing."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from distribot_spark.sources.acid import (
        bloom_maybe_contains,
        parquet_key_bloom,
    )

    rng = random.Random(7)
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    for n in (1, 100, 5000, 20000):
        keys = rng.sample(range(10**12), n)
        path = os.path.join("/root/repo/.tmp", f"bloomprop_{n}.parquet")
        pq.write_table(pa.table({"k": pa.array(keys, pa.int64())}), path)
        bloom = parquet_key_bloom(path, "k")
        assert all(bloom_maybe_contains(bloom, k) for k in keys), n
        # and it still says no to MOST absent keys below saturation
        absent = [k + 10**13 for k in keys[:200]]
        neg = sum(not bloom_maybe_contains(bloom, k) for k in absent)
        if n <= 5000:
            assert neg >= int(0.75 * len(absent)), (n, neg, len(absent))
        os.unlink(path)


def test_analyze_backfills_stats_and_blooms_metadata_only(spark):
    """ANALYZE: files written before stats/bloom options existed get
    their manifest entries backfilled in ONE metadata-only commit —
    file names and bytes untouched, DV state preserved exactly, the
    change feed of the commit EMPTY — after which range AND point
    skipping work."""
    from distribot_spark.sources.acid import (
        analyze_table,
        append_spark,
        delete_keys_spark,
        read_snapshot_spark,
        table_changes_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(0, 0.0)], "k long, val double"),
        "k", n_buckets=4,
    )
    for w in range(4):  # stats-less, bloom-less appends (narrow ranges)
        append_spark(
            spark, t,
            spark.createDataFrame(
                [(w * 1000 + i, float(i)) for i in range(1, 40)],
                "k long, val double"),
            writer=f"w{w}",
        )
    delete_keys_spark(spark, t, spark.createDataFrame([(1001,)], "k long"))
    rows_before = sorted(
        (r.k, r.val)
        for r in read_snapshot_spark(spark, t, dv_key="k").collect())
    files_before = dict(t.snapshot()[1])
    bytes_before = {f: os.stat(t.data_path(f)).st_size
                    for f in files_before}

    _, pruned0 = t.live_paths_pruned("k", 3000, 3999)
    assert pruned0 == 0  # nothing skippable before
    st = analyze_table(t, stats_cols=("k",), bloom_key=True)
    assert st["files_analyzed"] == len(files_before), st

    # metadata-only: same file names, same bytes, same logical rows,
    # DV-deleted key still gone, EMPTY change feed for the commit
    assert dict(t.snapshot()[1]) == files_before
    assert {f: os.stat(t.data_path(f)).st_size
            for f in files_before} == bytes_before
    assert sorted(
        (r.k, r.val)
        for r in read_snapshot_spark(spark, t, dv_key="k").collect()
    ) == rows_before
    assert table_changes_spark(
        spark, t, from_version=st["committed_version"]).count() == 0

    # and now both skipping modes work off the backfilled manifest
    kept, pruned = t.live_paths_pruned("k", 3000, 3999)
    assert pruned > 0
    assert spark.read.parquet(*kept).filter(
        (F_col_eq(3005)) ).count() == 1
    kept, pruned = t.live_paths_pruned_point("k", 2007)
    assert pruned > 0
    assert spark.read.parquet(*kept).filter(F_col_eq(2007)).count() == 1
    # idempotent: nothing left to analyze
    assert analyze_table(t, stats_cols=("k",), bloom_key=True)[
        "files_analyzed"] == 0


def test_facade_governance_round_trip(spark):
    """The facade drives the whole round-6 governance surface through
    one handle: create with rules, dirty append diverts, analyze
    backfills, restore rolls back, detail reflects it all."""
    from distribot_spark.sources.table import Table

    path = _tmp_table()
    t = Table.create(
        spark, path,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        key="k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0,
                            "on_violation": "quarantine"}},
        identity={"col": "rid"},
    )
    t.append(spark.createDataFrame([(10, -1.0), (11, 5.0)],
                                   "k long, val double"))      # v1
    assert t.quarantine().count() == 1
    st = t.analyze(stats_cols=("k",), bloom_key=True)          # v2
    assert st["files_analyzed"] > 0
    assert t.change_feed(from_version=st["committed_version"]).count() == 0
    v_before = t.version()
    t.merge(spark.createDataFrame([(3, 33.0)], "k long, val double"))
    st = t.restore(v_before)                                   # rollback
    assert not st["noop"]
    got = dict((r.k, r.val) for r in t.read().collect())
    assert got[3] == 3.0 and got[11] == 5.0 and 10 not in got
    d = t.detail()
    assert d["identity"] == {"col": "rid"} and d["has_quarantine"]
    t.reprocess_quarantine()   # still diverts (rule unchanged)
    assert t.quarantine().count() == 1
    t.drop_constraint("nn")
    t.reprocess_quarantine()
    got = dict((r.k, r.val) for r in t.read().collect())
    assert got[10] == -1.0
    assert t.vacuum_quarantine(older_than=0) == 0  # already drained


# -- column mapping: RENAME/DROP COLUMN without rewrite ---------------------


def test_rename_column_is_metadata_only_and_spans_old_new_files(spark):
    """ALTER RENAME COLUMN: zero data bytes rewritten (file set and
    sizes identical across the ALTER), old and new files read under
    ONE logical schema, writes under the old name fail afterwards,
    and the CDF spanning the rename comes out under the current
    names."""
    from distribot_spark.sources.acid import (
        alter_rename_column,
        append_spark,
        read_snapshot_spark,
        table_changes_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(40)],
                              "k long, price double"),
        "k", n_buckets=4,
    )
    files0 = {
        f: os.path.getsize(t.data_path(f)) for f in t.snapshot()[1]
    }
    st = alter_rename_column(t, "price", "amount")
    assert st["committed_version"] == t.version()  # barrier commit
    assert {
        f: os.path.getsize(t.data_path(f)) for f in t.snapshot()[1]
    } == files0  # not a byte rewritten
    assert t.column_mapping() == {"amount": "price"}

    # new writes use the NEW logical name; files stay physical-compat
    append_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(100, 120)],
                              "k long, amount double"))
    got = read_snapshot_spark(spark, t)
    assert set(got.columns) == {"k", "amount"}
    assert got.count() == 60
    assert got.filter("k >= 100").agg({"amount": "sum"}).first()[0] == \
        float(sum(range(100, 120)))

    # the old name is now a reserved physical: stale-schema writes fail
    with pytest.raises(ValueError, match="reserved"):
        append_spark(
            spark, t,
            spark.createDataFrame([(999, 1.0)], "k long, price double"))

    # CDF across the rename: one coherent schema, current names
    cdf = table_changes_spark(spark, t, from_version=0)
    assert "amount" in cdf.columns and "price" not in cdf.columns
    assert cdf.filter("_change_type = 'insert'").count() == 60

    # pandas client agrees (same metadata, same translation)
    from distribot_spark.sources.acid import append_pandas
    append_pandas(t, pd.DataFrame({"k": [500], "amount": [5.0]}))
    assert read_snapshot_spark(spark, t).filter("k = 500").first(
    )["amount"] == 5.0
    with pytest.raises(ValueError, match="reserved"):
        append_pandas(t, pd.DataFrame({"k": [501], "price": [5.0]}))


def test_rename_updates_rules_and_handles_key_identity_generated(spark):
    """Table rules FOLLOW the rename atomically: layout key, CHECK
    constraint columns, GENERATED src/output and IDENTITY column all
    resolve under the new name, and writers keep working without
    re-passing anything."""
    from distribot_spark.sources.acid import (
        alter_rename_column,
        append_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k), "AB-1") for k in range(20)],
                              "k long, val double, code string"),
        "k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0.0}},
        generated={"pre": {"fn": "substr", "src": "code",
                           "pos": 1, "len": 2}},
        identity={"col": "rid"},
    )
    alter_rename_column(t, "k", "order_id")      # the merge key
    alter_rename_column(t, "val", "amount")      # constraint column
    alter_rename_column(t, "code", "sku")        # generated src
    alter_rename_column(t, "pre", "sku_prefix")  # generated OUTPUT
    alter_rename_column(t, "rid", "row_id")      # identity column
    assert t.layout()[0] == "order_id"
    assert t.constraints()["nn"]["col"] == "amount"
    assert t.generated() == {
        "sku_prefix": {"fn": "substr", "src": "sku", "pos": 1, "len": 2}}
    assert t.identity()["col"] == "row_id"

    # a write under the new names: constraint + generated + identity
    # all engage; the frame stages under the ORIGINAL physical names
    append_spark(
        spark, t,
        spark.createDataFrame([(100, 7.0, "XY-9")],
                              "order_id long, amount double, sku string"))
    got = read_snapshot_spark(spark, t)
    assert set(got.columns) == {
        "order_id", "amount", "sku", "sku_prefix", "row_id"}
    row = got.filter("order_id = 100").first()
    assert row["sku_prefix"] == "XY" and row["row_id"] > 0
    with pytest.raises(Exception, match="nn"):  # executor-side CHECK
        append_spark(
            spark, t,
            spark.createDataFrame(
                [(101, -1.0, "ZZ-1")],
                "order_id long, amount double, sku string"))
    # renaming BACK clears the mapping entry (identity again)
    alter_rename_column(t, "amount", "val")
    assert "val" not in t.column_mapping()


def test_drop_column_without_rewrite(spark):
    """DROP COLUMN: metadata-only — readers exclude the physical
    column at scan, the name is reserved forever, and rule-bearing
    columns refuse to drop."""
    from distribot_spark.sources.acid import (
        alter_drop_column,
        append_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame(
            [(k, float(k), "x" * 4) for k in range(20)],
            "k long, val double, junk string"),
        "k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0.0}},
    )
    files0 = set(t.snapshot()[1])
    alter_drop_column(t, "junk")
    assert set(t.snapshot()[1]) == files0  # no rewrite
    got = read_snapshot_spark(spark, t)
    assert set(got.columns) == {"k", "val"}
    # the dropped physical name is reserved — never reusable
    with pytest.raises(ValueError, match="reserved"):
        append_spark(
            spark, t,
            spark.createDataFrame([(100, 1.0, "new")],
                                  "k long, val double, junk string"))
    with pytest.raises(ValueError, match="already been|was already"):
        alter_drop_column(t, "junk")
    with pytest.raises(ValueError, match="merge key"):
        alter_drop_column(t, "k")
    with pytest.raises(ValueError, match="constraint"):
        alter_drop_column(t, "val")
    # dropping a RENAMED column reserves its PHYSICAL name
    from distribot_spark.sources.acid import alter_rename_column
    t2 = TableLog(_tmp_table())
    write_initial_spark(
        spark, t2,
        spark.createDataFrame([(1, 1.0)], "k long, v double"),
        "k", n_buckets=2)
    alter_rename_column(t2, "v", "w")
    alter_drop_column(t2, "w")
    assert t2.dropped_columns() == ["v"] and t2.column_mapping() == {}
    with pytest.raises(ValueError, match="reserved"):
        append_spark(spark, t2, spark.createDataFrame(
            [(2, 2.0)], "k long, v double"))


def test_rename_races_in_flight_writer_both_directions(spark):
    """The forced race, both directions (the _ConstraintsChanged
    discipline extended to mapping_rev):

    (a) RENAME lands between a merge's compute and its commit — the
        writer's gate restarts the write, and the restarted batch
        (still carrying the old logical name) fails the reserved-
        physical check instead of committing under a retired name;
        the table is left clean (no orphan staged files).
    (b) a data commit lands between the RENAME's meta persist and its
        barrier — the ALTER retracts the mapping under a fresh rev
        and retries; the final state carries the rename and every
        committed row."""
    from distribot_spark.sources.acid import (
        alter_rename_column,
        append_pandas,
        merge_upsert_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(20)],
                              "k long, price double"),
        "k", n_buckets=2,
    )
    rev0 = t.mapping_rev()
    fired = []

    def hook(v):
        if not fired:
            fired.append(v)
            alter_rename_column(t, "price", "amount")

    with pytest.raises(ValueError, match="reserved"):
        merge_upsert_spark(
            spark, t,
            spark.createDataFrame([(1, 100.0)], "k long, price double"),
            pre_commit_hook=hook,
        )
    assert t.mapping_rev() > rev0
    assert t.column_mapping() == {"amount": "price"}
    got = read_snapshot_spark(spark, t)
    assert got.filter("k = 1").first()["amount"] == 1.0  # merge ABORTED
    # no orphans: vacuum at age 0 finds nothing unreferenced
    assert t.vacuum(min_age_seconds=0.0) == []

    # (b) reverse: data commit beats the barrier
    t2 = TableLog(_tmp_table())
    write_initial_spark(
        spark, t2,
        spark.createDataFrame([(k, float(k)) for k in range(10)],
                              "k long, price double"),
        "k", n_buckets=2,
    )
    fired2 = []

    def hook2(v):
        if not fired2:
            fired2.append(v)
            # mid-ALTER the mapping is ALREADY persisted: a concurrent
            # writer must use the new name (and translate to the same
            # physical bytes), and its commit beats the barrier
            append_pandas(t2, pd.DataFrame({"k": [100],
                                            "amount": [9.0]}))

    st = alter_rename_column(t2, "price", "amount",
                             pre_commit_hook=hook2)
    assert st["attempts"] == 2  # lost once, revalidated, won
    assert t2.column_mapping() == {"amount": "price"}
    got2 = read_snapshot_spark(spark, t2)
    assert got2.filter("k = 100").first()["amount"] == 9.0
    assert got2.count() == 11


# -- armored races: rebucket supersede + meta-lock steal --------------------


def test_superseded_rebucket_cannot_slip_commit(spark):
    """The old check-to-link window, forced shut: rebucket B swaps the
    pending marker AFTER rebucket A staged its rewrite (A's
    pre-commit hook) — A's marker check + commit link are now atomic
    under the meta lock, so A fails its gate with CommitConflict,
    unlinks its staged files, and NEVER lands a rewrite under B's
    marker. While A holds the commit-gate lock, a concurrent marker
    swap attempt blocks (proved with a short-timeout acquire inside
    A's critical section)."""
    from distribot_spark.sources.acid import (
        CommitConflict,
        optimize_table_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(64)],
                              "k long, val double"),
        "k", n_buckets=4,
    )

    fired = []

    def supersede(v):
        if fired:
            return
        fired.append(v)
        # rebucket B swaps the marker (it takes the meta lock, like
        # the real path at optimize_table_spark's marker install)
        with t._meta_lock():
            m = t._meta()
            m["rebucket_pending"] = {"to": 16, "writer": "B#rebucket-x",
                                     "parent": t.version(),
                                     "ts": time.time()}
            t._persist_meta(m)

    v0, live0 = t.snapshot()
    with pytest.raises(CommitConflict, match="superseded"):
        optimize_table_spark(
            spark, t, "k", 8, "A", rewrite_all=True,
            pre_commit_hook=supersede,
        )
    # A landed NOTHING: same snapshot, no orphan staged files, and the
    # marker still belongs to B
    assert t.snapshot() == (v0, live0)
    assert t._meta()["rebucket_pending"]["writer"] == "B#rebucket-x"
    dbg = [n for n in os.listdir(t.data_dir) if n.startswith("_stage")]
    assert dbg == []
    # clear B's marker (B "crashed"); layout still the original 4
    with t._meta_lock():
        m = t._meta()
        del m["rebucket_pending"]
        t._persist_meta(m)
    assert t.effective_layout() == ("k", 4)
    assert read_snapshot_spark(spark, t).count() == 64

    # atomicity of the commit gate itself: while a rebucket holds the
    # gate lock, a marker swap cannot acquire it
    blocked = []
    orig_commit = t.try_commit

    def probing_commit(*a, **kw):
        try:
            with TableLog(t.path)._meta_lock(timeout=0.3):
                # fresh instance: same-instance nesting is
                # reentrant by contract (self-FK barrier)
                blocked.append(False)
        except TimeoutError:
            blocked.append(True)
        return orig_commit(*a, **kw)

    t.try_commit = probing_commit
    st = optimize_table_spark(spark, t, "k", 8, "A2", rewrite_all=True)
    t.try_commit = orig_commit
    assert st["rewritten_buckets"] > 0
    assert blocked == [True]  # the swap window is provably closed
    assert t.effective_layout() == ("k", 8)


def test_meta_lock_steal_is_generation_fenced():
    """The stat-then-unlink steal race, armored: steals CREATE the
    next lock generation (O_EXCL, one winner) and never unlink a
    foreign file, release is owner-pathed, and a steal whose
    predecessor was REPLACED mid-steal (released + freshly
    re-acquired — the exact old TOCTOU) abandons itself."""
    t = TableLog(_tmp_table())
    t.init()
    base = t._meta_lock_path()

    # 1. stale holder is superseded via generation 1, then GC'd
    with open(base, "w") as fh:
        fh.write("dead 0")
    os.utime(base, (time.time() - 120, time.time() - 120))
    with t._meta_lock(timeout=2.0) as _:
        assert os.path.exists(base + ".steal1")  # we hold gen 1
        assert not os.path.exists(base)          # stale gen 0 GC'd
    assert not os.path.exists(base + ".steal1")  # owner-pathed release

    # 2. a slow (stolen-from) holder's release cannot remove the
    # thief's lock. H and T are separate INSTANCES of the same path:
    # the lock is per-path across instances/processes but reentrant
    # within one instance (same logical owner — the self-FK ALTER
    # barrier nests it), so a same-instance probe would no-op.
    t2 = TableLog(t.path)
    ctx_h = t._meta_lock(timeout=2.0)
    ctx_h.__enter__()                       # H holds gen 0
    # H looks dead: age the BODY ts (liveness lives in the body, not
    # mtimes — object-store listing times can't be refreshed)
    info = json.load(open(base))
    info["ts"] = time.time() - 120
    with open(base, "w") as fh:
        json.dump(info, fh)
    ctx_t = t2._meta_lock(timeout=2.0)
    ctx_t.__enter__()                       # T steals gen 1
    assert os.path.exists(base + ".steal1")
    ctx_h.__exit__(None, None, None)        # H releases: only ITS file
    assert os.path.exists(base + ".steal1")  # thief's lock intact
    ctx_t.__exit__(None, None, None)
    assert not os.path.exists(base + ".steal1")

    # 3. the fence: predecessor replaced between the steal's O_EXCL
    # create and its verification -> the steal ABANDONS its own file
    with open(base, "w") as fh:
        fh.write("dead 0")
    os.utime(base, (time.time() - 120, time.time() - 120))

    def replace_predecessor(gen):
        # the old holder released and a NEW holder re-acquired gen 0
        os.unlink(base)
        with open(base, "w") as fh:
            fh.write("fresh live holder")

    with pytest.raises(TimeoutError):
        with t._meta_lock(timeout=0.7, _steal_hook=replace_predecessor):
            raise AssertionError("fenced steal must not acquire")
    assert not os.path.exists(base + ".steal1")  # abandoned its file
    os.unlink(base)

    # 4. mutual exclusion under stealer contention (stress): N threads
    # against a pre-staled lock — never two holders
    with open(base, "w") as fh:
        fh.write("dead 0")
    os.utime(base, (time.time() - 120, time.time() - 120))
    inside = []
    errors = []

    def worker():
        try:
            for _ in range(5):
                with t._meta_lock(timeout=10.0):
                    inside.append(1)
                    assert sum(inside) == len(inside)  # monotone probe
                    n0 = len(inside)
                    time.sleep(0.002)
                    assert len(inside) == n0, "second holder entered"
        except Exception as e:  # noqa: BLE001 - surface in main thread
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errors, errors
    assert len(inside) == 30


# -- auto-compaction ---------------------------------------------------------


def test_auto_compaction_bounds_live_files_spark(spark):
    """auto_optimize=n: streaming-style appends never accumulate more
    than 2n+1 files in a bucket — the write path repays its own
    small-file debt (no explicit OPTIMIZE anywhere) — and compaction
    commits are content-preserving (empty change feed)."""
    from distribot_spark.sources.acid import (
        append_spark,
        read_snapshot_spark,
        table_changes_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(8)],
                              "k long, val double"),
        "k", n_buckets=4, auto_optimize=2,
    )
    for w in range(1, 16):
        append_spark(
            spark, t,
            spark.createDataFrame(
                [(1000 * w + k, float(k)) for k in range(8)],
                "k long, val double"),
            writer=f"w{w}")
        _, live = t.snapshot()
        per = {}
        for _f, b in live.items():
            per[b] = per.get(b, 0) + 1
        assert max(per.values()) <= 5, (w, per)  # 2n+1 bound, inline
    got = read_snapshot_spark(spark, t)
    assert got.count() == 8 + 15 * 8  # compaction lost nothing
    # compaction commits are CDF-invisible (pure layout)
    head = t.version()
    auto_versions = [
        v for v in range(head + 1)
        if t.read_commit(v)["writer"].endswith("#auto-optimize")
    ]
    assert auto_versions, "auto-compaction never fired"
    for v in auto_versions:
        assert table_changes_spark(
            spark, t, "k", from_version=v, to_version=v
        ).count() == 0, v


def test_auto_compaction_pandas_folds_dvs_and_races_appends():
    """The JVM-free twin under CONTENTION: two threads blind-append
    interleaved key ranges into an auto_optimize table while a DV
    delete lands mid-stream — final content is exactly the appended
    minus the deleted keys (compaction folded the DVs, resurrecting
    nothing), every bucket bounded, no lost updates at any
    interleaving."""
    from distribot_spark.sources.acid import (
        append_pandas,
        delete_keys_pandas,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    t.init(key="k", n_buckets=4, auto_optimize=2)
    append_pandas(t, pd.DataFrame({"k": range(8),
                                   "val": [0.0] * 8}))
    delete_keys_pandas(t, [2, 5], "k", 4, "del")

    errors = []

    def ingest(base):
        try:
            for w in range(12):
                append_pandas(
                    t, pd.DataFrame({
                        "k": [base + 100 * w + i for i in range(6)],
                        "val": [float(w)] * 6}),
                    writer=f"t{base}-w{w}")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=ingest, args=(b,))
               for b in (10_000, 20_000)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errors, errors

    got = _read_table(t)
    want_keys = ({k for k in range(8)} - {2, 5}) | {
        b + 100 * w + i
        for b in (10_000, 20_000) for w in range(12) for i in range(6)
    }
    assert set(got["k"]) == want_keys          # DVs folded, no loss
    assert len(got) == len(want_keys)          # and no duplication
    _, live = t.snapshot()
    per = {}
    for _f, b in live.items():
        per[b] = per.get(b, 0) + 1
    # bounded even under two racing appenders (each may add a file to
    # a bucket between trigger checks): 2n+1 plus one racer's in-flight
    assert max(per.values()) <= 6, per
    assert t.live_dvs() == {}  # compaction consumed the sidecars


def test_facade_rename_and_drop_column(spark):
    """The DeltaTable-shaped facade carries the column-mapping ALTERs:
    rename mid-history, keep writing under new names with zero
    re-passed layout, read + change feed under one schema, drop
    reserves the physical name."""
    from distribot_spark.sources import Table

    path = _tmp_table()
    t = Table.create(
        spark, path,
        spark.createDataFrame([(k, float(k), "x") for k in range(12)],
                              "k long, price double, note string"),
        key="k", n_buckets=2,
    )
    st = t.rename_column("price", "amount")
    assert st["committed_version"] == t.version()
    assert t.column_mapping() == {"amount": "price"}
    t.append(spark.createDataFrame([(100, 1.5, "y")],
                                   "k long, amount double, note string"))
    assert t.read().filter("k = 100").first()["amount"] == 1.5
    assert "amount" in t.change_feed(from_version=0).columns
    t.drop_column("note")
    assert set(t.read().columns) == {"k", "amount"}
    with pytest.raises(ValueError, match="reserved"):
        t.append(spark.createDataFrame(
            [(101, 1.0, "z")], "k long, amount double, note string"))


# -- compliance purge / provable forget -------------------------------------


def _purge_fixture(spark, n_buckets=4):
    """Small bucketed table with stats+bloom appends: keys 0..59,
    val = k * 1.0; three files per bucket (initial + 2 appends)."""
    from distribot_spark.sources.acid import append_spark, write_initial_spark

    t = TableLog(_tmp_table())
    rows = [(k, float(k)) for k in range(60)]
    write_initial_spark(
        spark, t,
        spark.createDataFrame(rows[:20], "k long, val double"),
        "k", n_buckets=n_buckets,
    )
    for lo, hi in ((20, 40), (40, 60)):
        append_spark(
            spark, t,
            spark.createDataFrame(rows[lo:hi], "k long, val double"),
            stats_cols=("k",), bloom_key=True,
        )
    return t


def test_purge_erases_dv_hidden_bytes_cdf_silent(spark):
    """Purging a key that is ALREADY DV-deleted erases its physical
    bytes without changing the logical table — and the change feed
    stays SILENT for it (its delete was reported when the DV landed;
    re-reporting would double-count downstream)."""
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        purge_keys_spark,
        read_snapshot_spark,
        table_changes_spark,
    )

    t = _purge_fixture(spark)
    kdf = spark.createDataFrame([(42,)], "k long")
    delete_keys_spark(spark, t, kdf)
    logical0 = sorted(
        r.k for r in read_snapshot_spark(spark, t, dv_key="k").collect())
    assert 42 not in logical0
    # physical bytes still hold 42 (that's what DVs mean)
    raw = read_snapshot_spark(spark, t, apply_dvs=False)
    assert raw.filter("k = 42").count() == 1

    st = purge_keys_spark(spark, t, kdf)
    assert st["purged_rows"] == 1 and st["rewritten_files"] == 1, st
    raw2 = read_snapshot_spark(spark, t, apply_dvs=False)
    assert raw2.filter("k = 42").count() == 0
    logical1 = sorted(
        r.k for r in read_snapshot_spark(spark, t, dv_key="k").collect())
    assert logical1 == logical0  # logical table unchanged
    ch = table_changes_spark(
        spark, t, "k",
        from_version=st["committed_version"],
        to_version=st["committed_version"],
    )
    assert ch.filter("k = 42").count() == 0, "purge must be CDF-silent"


def test_purge_prunes_by_bloom_and_keeps_skipping_intact(spark):
    """Purging one key rewrites exactly the ONE file that physically
    holds it — the other files of its bucket are pruned via manifest
    bloom/min-max — and the replacement re-carries stats + bloom so
    file skipping works identically after the purge."""
    from distribot_spark.sources.acid import (
        purge_keys_spark,
        read_snapshot_spark,
    )

    t = _purge_fixture(spark)
    st = purge_keys_spark(spark, t, spark.createDataFrame([(45,)], "k long"))
    # 45 lives in the second append's file for its bucket; the first
    # append's file is bloom/min-max pruned; the stats-less initial
    # file stays a candidate (conservative) but has no physical hit
    assert st["rewritten_files"] == 1, st
    assert st["pruned_files"] >= 1, st
    assert read_snapshot_spark(spark, t).filter("k = 45").count() == 0
    # replacement carries stats AND a bloom (purge-proof skipping)
    stats = t.live_stats()
    rewritten = [f for f, s in stats.items()
                 if s and "_bloom:k" in s and s.get("k")]
    assert rewritten, "replacement lost its stats/bloom"
    # skipping still prunes with the replacement in place
    kept, pruned = t.live_paths_pruned_point("k", 44)
    assert pruned >= 1


def test_purge_catches_racing_append_of_same_key(spark):
    """OCC: an append landing the purge key AFTER the purge planned its
    rewrite forces a recompute — the racing row is purged too, other
    racing rows survive."""
    from distribot_spark.sources.acid import (
        append_spark,
        purge_keys_spark,
        read_snapshot_spark,
    )

    t = _purge_fixture(spark)
    fired = {"n": 0}

    def hook(v):
        if fired["n"] == 0:
            fired["n"] = 1
            append_spark(
                spark, t,
                spark.createDataFrame([(45, 999.0), (100, 1.0)],
                                      "k long, val double"),
            )

    st = purge_keys_spark(spark, t, spark.createDataFrame(
        [(45,)], "k long"), pre_commit_hook=hook)
    assert st["attempts"] >= 2, st  # lost the race, recomputed
    rows = {r.k for r in read_snapshot_spark(spark, t).collect()}
    assert 45 not in rows, "racing append resurrected a purged key"
    assert 100 in rows, "unrelated racing row lost"
    assert st["purged_rows"] == 2, st  # original + the racing copy


def test_forget_proof_zero_quarantine_scrubbed_history_gone(spark):
    """The full right-to-be-forgotten: quarantined rows with the key
    are scrubbed, the proof reports zero parquet AND zero json hits,
    time travel below the purge raises SnapshotExpired, and a key that
    sat in a manifest max-stat is gone from the retained log."""
    from distribot_spark.sources.acid import (
        SnapshotExpired,
        append_spark,
        forget_keys_spark,
        purge_proof_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(20)],
                              "k long, val double"),
        "k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0,
                            "on_violation": "quarantine"}},
    )
    # 59 = the batch's max -> lands in the append file's max-stat;
    # 31 violates the expectation -> lands in the DLQ
    append_spark(
        spark, t,
        spark.createDataFrame(
            [(31, -1.0)] + [(k, float(k)) for k in range(40, 60)],
            "k long, val double"),
        stats_cols=("k",), bloom_key=True,
    )
    kdf = spark.createDataFrame([(59,), (31,), (7,)], "k long")
    pre = purge_proof_spark(spark, t, kdf)
    assert pre["parquet_hits"] >= 3 and pre["json_hits"] >= 1, pre

    st = forget_keys_spark(spark, t, kdf)
    assert st["purged_rows"] == 2, st       # 31 never landed in data
    assert st["quarantine_rows_erased"] == 1, st
    post = purge_proof_spark(spark, t, kdf)
    assert post["parquet_hits"] == 0 and post["json_hits"] == 0, post
    rows = {r.k for r in read_snapshot_spark(spark, t).collect()}
    assert rows == (set(range(20)) | set(range(40, 60))) - {59, 7}
    with pytest.raises(SnapshotExpired):
        t.snapshot_at(0)
    assert t.version() % CHECKPOINT_EVERY == 0  # padded to the boundary


def test_purge_empty_and_missing_keys_are_noops(spark):
    from distribot_spark.sources.acid import purge_keys_spark

    t = _purge_fixture(spark)
    v0 = t.version()
    st = purge_keys_spark(spark, t, spark.createDataFrame([], "k long"))
    assert st["rewritten_files"] == 0 and t.version() == v0
    # keys absent from the table: pruning finds no physical hit, no commit
    st2 = purge_keys_spark(
        spark, t, spark.createDataFrame([(10_000,)], "k long"))
    assert st2["rewritten_files"] == 0 and t.version() == v0, st2


# -- shallow clone ----------------------------------------------------------


def test_clone_zero_copy_merged_dvs_and_rules_carry(spark):
    """Clone carries multi-sidecar DV state (merged to one), manifest
    stats/blooms, and the table rules: a clone-side write is gated by
    the cloned constraints, and every data byte is a hardlink."""
    from distribot_spark.sources.acid import (
        append_spark,
        clone_table,
        delete_keys_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    src = TableLog(_tmp_table())
    write_initial_spark(
        spark, src,
        spark.createDataFrame([(k, float(k)) for k in range(40)],
                              "k long, val double"),
        "k", n_buckets=2,
        constraints={"nn": {"col": "val", "min": 0}},
    )
    append_spark(
        spark, src,
        spark.createDataFrame([(k, float(k)) for k in range(40, 60)],
                              "k long, val double"),
        stats_cols=("k",), bloom_key=True,
    )
    # two DV commits against the SAME files -> multi-sidecar lists
    delete_keys_spark(spark, src, spark.createDataFrame([(4,)], "k long"))
    delete_keys_spark(spark, src, spark.createDataFrame([(6,)], "k long"))
    assert any(len(ds) > 1 for ds in src.live_dvs().values())

    dst_path = _tmp_table()
    os.rmdir(dst_path)
    st = clone_table(src, dst_path)
    assert st["copied"] == 0 and st["linked"] > 0, st
    dst = TableLog(dst_path)
    assert all(len(ds) == 1 for ds in dst.live_dvs().values())
    a = sorted(r.k for r in read_snapshot_spark(spark, src,
                                                dv_key="k").collect())
    b = sorted(r.k for r in read_snapshot_spark(spark, dst,
                                                dv_key="k").collect())
    assert a == b and 4 not in b and 6 not in b
    # hardlink: same inode
    f0 = sorted(src.snapshot()[1])[0]
    assert (os.stat(src.data_path(f0)).st_ino
            == os.stat(dst.data_path(f0)).st_ino)
    # blooms carried: point skipping works on the clone from birth
    _, pruned = dst.live_paths_pruned_point("k", 45)
    assert pruned >= 1
    # rules carried: violating append fails on the CLONE
    # (fail-mode CHECK raises executor-side via raise_error)
    with pytest.raises(Exception, match="nn"):
        append_spark(
            spark, dst,
            spark.createDataFrame([(99, -1.0)], "k long, val double"))


def test_clone_survives_source_destruction(spark):
    """The hardlink guarantee: expire+vacuum and even rm -rf of the
    source leave the clone byte-complete — the failure mode of
    path-referencing shallow clones."""
    import shutil as _sh

    from distribot_spark.sources.acid import (
        clone_table,
        delete_keys_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    src = TableLog(_tmp_table())
    write_initial_spark(
        spark, src,
        spark.createDataFrame([(k, float(k)) for k in range(30)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    delete_keys_spark(spark, src, spark.createDataFrame([(3,)], "k long"))
    dst_path = _tmp_table()
    os.rmdir(dst_path)
    clone_table(src, dst_path)
    dst = TableLog(dst_path)
    _sh.rmtree(src.path)
    rows = sorted(r.k for r in read_snapshot_spark(spark, dst,
                                                   dv_key="k").collect())
    assert rows == [k for k in range(30) if k != 3]


def test_clone_version_rails(spark):
    """Clone refuses: an existing destination log, a version below the
    retention floor, and a version below the layout epoch (pre-rebucket
    manifests lie under the new bucket count)."""
    from distribot_spark.sources.acid import (
        SnapshotExpired,
        append_spark,
        clone_table,
        optimize_table_spark,
        write_initial_spark,
    )

    src = TableLog(_tmp_table())
    write_initial_spark(
        spark, src,
        spark.createDataFrame([(k, float(k)) for k in range(20)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    append_spark(spark, src, spark.createDataFrame(
        [(100, 1.0)], "k long, val double"))
    # rebucket 2 -> 4 sets the layout epoch
    optimize_table_spark(spark, src, "k", 4, rewrite_all=True)
    epoch = int(src._meta()["layout_since_version"])
    with pytest.raises(ValueError, match="layout epoch"):
        clone_table(src, _tmp_table() + "_e", version=epoch - 1)
    dst_path = _tmp_table()
    os.rmdir(dst_path)
    st = clone_table(src, dst_path)  # at head: fine
    assert st["files"] > 0
    with pytest.raises(ValueError, match="already has a log"):
        clone_table(src, dst_path)
    # advance the head past the epoch, then expire: the epoch version
    # is retained-by-layout but dropped-by-retention
    append_spark(spark, src, spark.createDataFrame(
        [(200, 1.0)], "k long, val double"))
    src.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpired):
        clone_table(src, _tmp_table() + "_x", version=epoch)


# -- CDF replication --------------------------------------------------------


def _repl_pair(spark):
    from distribot_spark.sources.acid import clone_table, write_initial_spark

    src = TableLog(_tmp_table())
    write_initial_spark(
        spark, src,
        spark.createDataFrame([(k, float(k)) for k in range(30)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    dst_path = _tmp_table()
    os.rmdir(dst_path)
    clone_table(src, dst_path)
    return src, TableLog(dst_path), src.version()


def _rows(spark, t):
    from distribot_spark.sources.acid import read_snapshot_spark

    return sorted(
        (r.k, r.val)
        for r in read_snapshot_spark(spark, t, dv_key="k").collect()
    )


def test_replicate_range_idempotent(spark):
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        merge_upsert_spark,
        replicate_changes_spark,
    )

    src, dst, c = _repl_pair(spark)
    merge_upsert_spark(spark, src, spark.createDataFrame(
        [(3, 99.0), (100, 1.0)], "k long, val double"))
    delete_keys_spark(spark, src, spark.createDataFrame([(7,)], "k long"))
    st = replicate_changes_spark(spark, src, dst, from_version=c + 1)
    assert st["upserted_keys"] == 2 and st["deleted_keys"] == 1, st
    state = _rows(spark, dst)
    assert state == _rows(spark, src)
    replicate_changes_spark(spark, src, dst, from_version=c + 1)
    assert _rows(spark, dst) == state  # idempotent re-apply


def test_replicate_one_by_one_equals_one_range(spark):
    """Paging the cursor version-by-version lands the same state as one
    folded range — the contiguity contract."""
    from distribot_spark.sources.acid import (
        clone_table,
        delete_keys_spark,
        merge_upsert_spark,
        replicate_changes_spark,
    )

    src, dst_a, c = _repl_pair(spark)
    dst_b_path = _tmp_table()
    os.rmdir(dst_b_path)
    clone_table(src, dst_b_path)
    dst_b = TableLog(dst_b_path)

    merge_upsert_spark(spark, src, spark.createDataFrame(
        [(1, -1.0)], "k long, val double"))
    delete_keys_spark(spark, src, spark.createDataFrame([(1,)], "k long"))
    merge_upsert_spark(spark, src, spark.createDataFrame(
        [(1, 5.0), (40, 4.0)], "k long, val double"))

    replicate_changes_spark(spark, src, dst_a, from_version=c + 1)
    for v in range(c + 1, src.version() + 1):
        replicate_changes_spark(spark, src, dst_b,
                                from_version=v, to_version=v)
    assert _rows(spark, dst_a) == _rows(spark, dst_b) == _rows(spark, src)
    # net fold: k=1 was updated, deleted, re-inserted -> final 5.0
    assert (1, 5.0) in _rows(spark, dst_a)


def test_replicate_insert_then_delete_nets_to_nothing(spark):
    """A key born and killed INSIDE the range never touches the
    replica: the fold discards it before any write."""
    from distribot_spark.sources.acid import (
        delete_keys_spark,
        merge_upsert_spark,
        replicate_changes_spark,
    )

    src, dst, c = _repl_pair(spark)
    merge_upsert_spark(spark, src, spark.createDataFrame(
        [(500, 1.0)], "k long, val double"))
    delete_keys_spark(spark, src, spark.createDataFrame([(500,)], "k long"))
    v0 = dst.version()
    st = replicate_changes_spark(spark, src, dst, from_version=c + 1)
    assert st["upserted_keys"] == 0 and st["deleted_keys"] == 1, st
    assert all(k != 500 for k, _ in _rows(spark, dst))
    assert _rows(spark, dst) == _rows(spark, src)
    # the delete branch still ran (key 500 unknown to the replica: a
    # no-op delete, no rewrite) — at most one commit landed
    assert dst.version() - v0 <= 1


def test_facade_clone_replicate_purge_round_trip(spark):
    """The Table facade covers the round-7 trio end to end: clone ->
    diverge -> replicate_from catch-up -> purge + forget + purge_proof
    on the replica."""
    from distribot_spark.sources import Table

    src_path = _tmp_table()
    os.rmdir(src_path)
    t = Table.create(
        spark, src_path,
        spark.createDataFrame([(k, float(k)) for k in range(30)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    c = t.version()
    dst_path = _tmp_table()
    os.rmdir(dst_path)
    r = t.clone(dst_path)
    assert r.read().count() == 30
    # diverge the source, catch the replica up
    t.merge(spark.createDataFrame([(3, 99.0), (77, 7.0)],
                                  "k long, val double"))
    t.delete(spark.createDataFrame([(9,)], "k long"))
    st = r.replicate_from(t, from_version=c + 1)
    assert st["upserted_keys"] == 2 and st["deleted_keys"] == 1, st
    assert (sorted(x.k for x in r.read().collect())
            == sorted(x.k for x in t.read().collect()))
    # forget a key on the replica, prove it
    keys = spark.createDataFrame([(5,)], "k long")
    fg = r.forget(keys)
    assert fg["purged_rows"] == 1, fg
    proof = r.purge_proof(keys)
    assert proof["parquet_hits"] == 0 and proof["json_hits"] == 0, proof
    assert r.read().filter("k = 5").count() == 0


def test_purge_races_optimize_rewrite(spark):
    """Forced interleaving: an OPTIMIZE lands between purge's plan and
    its commit, replacing the very files purge staged against. The OCC
    recompute must re-plan against the compacted files — the purged key
    stays gone and no other row is lost."""
    from distribot_spark.sources.acid import (
        optimize_table_spark,
        purge_keys_spark,
        read_snapshot_spark,
    )

    t = _purge_fixture(spark)
    before = {r.k for r in read_snapshot_spark(spark, t).collect()}
    fired = {"n": 0}

    def hook(v):
        if fired["n"] == 0:
            fired["n"] = 1
            optimize_table_spark(spark, t, "k", 4, files_per_bucket=1)

    st = purge_keys_spark(spark, t, spark.createDataFrame(
        [(45,)], "k long"), pre_commit_hook=hook)
    assert st["attempts"] >= 2, st  # lost to OPTIMIZE, recomputed
    after = {r.k for r in read_snapshot_spark(spark, t).collect()}
    assert after == before - {45}, (before - after, after - before)


def test_purge_and_forget_on_hash_bucketed_table(spark):
    """The driver-side bucket pruning (`_bucket_of_py`) must agree with
    Spark's xxhash64 bucketing on a hash_buckets=True table — a
    mismatch would prune the bucket that actually holds the key and
    silently purge nothing."""
    from distribot_spark.sources.acid import (
        append_spark,
        forget_keys_spark,
        purge_proof_spark,
        read_snapshot_spark,
        write_initial_spark,
    )

    t = TableLog(_tmp_table())
    rows = [(k, float(k)) for k in range(60)]
    write_initial_spark(
        spark, t, spark.createDataFrame(rows[:30], "k long, val double"),
        "k", n_buckets=4, hash_buckets=True,
    )
    append_spark(
        spark, t, spark.createDataFrame(rows[30:], "k long, val double"),
        stats_cols=("k",), bloom_key=True,
    )
    keys = spark.createDataFrame([(17,), (53,)], "k long")
    st = forget_keys_spark(spark, t, keys)
    assert st["purged_rows"] == 2, st
    proof = purge_proof_spark(spark, t, keys)
    assert proof["parquet_hits"] == 0 and proof["json_hits"] == 0, proof
    got = {r.k for r in read_snapshot_spark(spark, t).collect()}
    assert got == {k for k in range(60) if k not in (17, 53)}


def test_replicate_resume_persisted_cursor(spark):
    """The persisted cursor: clone stamps the bootstrap marker, resume
    applies [marker+1, head] and advances the cursor, a second resume
    with nothing new is a no-op, max_versions paces the catch-up, and
    a deleted cursor re-applies idempotently from the marker."""
    from distribot_spark.sources.acid import (
        _replication_cursor_path,
        delete_keys_spark,
        merge_upsert_spark,
        replicate_resume_spark,
    )

    src, dst, c = _repl_pair(spark)
    merge_upsert_spark(spark, src, spark.createDataFrame(
        [(2, 22.0)], "k long, val double"))
    delete_keys_spark(spark, src, spark.createDataFrame([(4,)], "k long"))
    merge_upsert_spark(spark, src, spark.createDataFrame(
        [(50, 5.0)], "k long, val double"))

    # paced: one version per call until caught up
    total_up = total_del = calls = 0
    while True:
        st = replicate_resume_spark(spark, src, dst, max_versions=1)
        if st["to_version"] < st["from_version"] and st["behind"] == 0:
            break
        calls += 1
        total_up += st["upserted_keys"]
        total_del += st["deleted_keys"]
        if st["behind"] == 0:
            break
    assert calls == 3 and total_up == 2 and total_del == 1
    assert _rows(spark, dst) == _rows(spark, src)

    # caught up: no-op
    st = replicate_resume_spark(spark, src, dst)
    assert st["behind"] == 0 and st["upserted_keys"] == 0
    # pacing arithmetic gone wrong must fail loudly, not report
    # behind=0 while stale
    with pytest.raises(ValueError, match="max_versions"):
        replicate_resume_spark(spark, src, dst, max_versions=0)

    # crash-between-apply-and-cursor simulation: losing the cursor
    # re-applies from the clone marker — idempotent, state unchanged
    state = _rows(spark, dst)
    os.unlink(_replication_cursor_path(dst))
    st = replicate_resume_spark(spark, src, dst)
    assert st["upserted_keys"] == 2 and st["deleted_keys"] == 1, st
    assert _rows(spark, dst) == state


def test_clone_retry_after_partial_failure(spark):
    """A clone that died between linking files and committing v0 is
    RETRYABLE: the rerun treats already-linked same-inode entries as
    done and lands the commit; a foreign file under a cloned name is
    refused loudly."""
    from distribot_spark.sources.acid import (
        clone_table,
        read_snapshot_spark,
        write_initial_spark,
    )

    src = TableLog(_tmp_table())
    write_initial_spark(
        spark, src,
        spark.createDataFrame([(k, float(k)) for k in range(20)],
                              "k long, val double"),
        "k", n_buckets=2,
    )
    dst_path = _tmp_table()
    os.rmdir(dst_path)
    clone_table(src, dst_path)
    dst = TableLog(dst_path)
    # simulate the crash window: meta + hardlinks exist, commit doesn't
    os.unlink(dst._commit_path(0))
    os.unlink(dst._head_hint_path())
    st = clone_table(src, dst_path)  # retry must succeed
    assert st["files"] == 2 and st["linked"] == 2, st
    assert read_snapshot_spark(spark, dst).count() == 20
    # foreign file under a cloned name -> loud refusal
    dst2_path = _tmp_table()
    os.rmdir(dst2_path)
    clone_table(src, dst2_path)
    dst2 = TableLog(dst2_path)
    f0 = sorted(dst2.snapshot()[1])[0]
    os.unlink(dst2._commit_path(0))
    os.unlink(dst2._head_hint_path())
    os.unlink(dst2.data_path(f0))
    with open(dst2.data_path(f0), "w") as fh:
        fh.write("not the same inode")
    with pytest.raises(ValueError, match="foreign file"):
        clone_table(src, dst2_path)


def test_purge_candidates_manifest_equals_driver_fold(spark):
    """Past the first parquet checkpoint, purge planning runs as a
    Spark job over the manifest; its candidate set, per-candidate
    bucket/DV/stats payloads, and pruned count must equal the driver
    fold exactly — then an end-to-end purge over the checkpointed
    table stays correct."""
    from distribot_spark.sources.acid import (
        append_spark,
        bloom_maybe_contains,
        delete_keys_spark,
        purge_keys_spark,
        read_snapshot_spark,
        write_initial_spark,
    )
    from distribot_spark.sources.manifest import (
        newest_checkpoint_parquet,
        purge_candidates_manifest,
    )

    t = TableLog(_tmp_table())
    write_initial_spark(
        spark, t,
        spark.createDataFrame([(k, float(k)) for k in range(20)],
                              "k long, val double"),
        "k", n_buckets=4,
    )
    # drive past a checkpoint boundary with stats-carrying appends
    for i in range(1, 12):
        append_spark(
            spark, t,
            spark.createDataFrame(
                [(100 * i + j, 1.0) for j in range(8)],
                "k long, val double"),
            stats_cols=("k",), bloom_key=True,
        )
    delete_keys_spark(spark, t, spark.createDataFrame([(305,)], "k long"))
    v = t.version()
    assert newest_checkpoint_parquet(t, v) > 0

    key_vals = [305, 707, 19]
    touched = {k % 4 for k in key_vals}
    cand_m, pruned_m = purge_candidates_manifest(
        spark, t, "k", key_vals, touched, version=v)

    # driver-fold twin
    live, stats_all, dvall, _ = t._fold_entries(v)
    cand_d, pruned_d = [], 0
    for f, b in sorted(live.items()):
        if b not in touched:
            continue
        st = stats_all.get(f) or {}
        rng = st.get("k")
        bl = st.get("_bloom:k")
        maybe = False
        for kv in key_vals:
            if rng is not None and not (rng["min"] <= kv <= rng["max"]):
                continue
            if bl is not None and not bloom_maybe_contains(bl, kv):
                continue
            maybe = True
            break
        if maybe:
            cand_d.append({"file": f, "pb": int(b),
                           "dvs": list(dvall.get(f, ())), "stats": st})
        else:
            pruned_d += 1
    assert pruned_m == pruned_d and pruned_m > 0
    assert cand_m == cand_d, (cand_m, cand_d)

    # end-to-end purge over the checkpointed table (manifest path live)
    st = purge_keys_spark(
        spark, t, spark.createDataFrame([(k,) for k in key_vals],
                                        "k long"))
    assert st["purged_rows"] == 3 and st["pruned_files"] == pruned_m, st
    rows = {r.k for r in read_snapshot_spark(spark, t, dv_key="k")
            .collect()}
    assert not rows & set(key_vals)


def test_purge_cross_client_differential(spark):
    """The repo's cross-client discipline applied to compliance: two
    identical tables, one purged by the JVM-free pandas client, one by
    Spark — identical stats, identical surviving rows, identical
    physical absence of the keys, and both replacements re-carry
    stats+bloom."""
    from pyspark.sql import functions as F

    from distribot_spark.sources.acid import (
        purge_keys_pandas,
        purge_keys_spark,
        read_snapshot_spark,
    )

    t_pd = _purge_fixture(spark)
    t_sp = _purge_fixture(spark)
    # plant DV state so the fold path is exercised in both clients
    from distribot_spark.sources.acid import delete_keys_pandas
    delete_keys_pandas(t_pd, [42], "k", 4)
    delete_keys_pandas(t_sp, [42], "k", 4)

    keys = [42, 45, 7]
    st_pd = purge_keys_pandas(t_pd, keys)
    st_sp = purge_keys_spark(
        spark, t_sp, spark.createDataFrame([(k,) for k in keys],
                                           "k long"))
    for field in ("purged_rows", "rewritten_files", "pruned_files",
                  "scanned_files"):
        assert st_pd[field] == st_sp[field], (field, st_pd, st_sp)
    rows_pd = sorted((r.k, r.val) for r in
                     read_snapshot_spark(spark, t_pd, dv_key="k")
                     .collect())
    rows_sp = sorted((r.k, r.val) for r in
                     read_snapshot_spark(spark, t_sp, dv_key="k")
                     .collect())
    assert rows_pd == rows_sp
    assert not {k for k, _ in rows_pd} & set(keys)
    # physical absence in BOTH
    for t in (t_pd, t_sp):
        raw = read_snapshot_spark(spark, t, apply_dvs=False)
        assert raw.filter(F.col("k").isin(keys)).count() == 0
    # replacements carry stats+bloom in BOTH clients
    for t in (t_pd, t_sp):
        stats = t.live_stats()
        assert any(s and "_bloom:k" in s for s in stats.values())


def test_read_files_merged_equals_mergeschema(spark, tmp_path):
    """r9 optimization pin: `read_files_merged` (driver-side footer
    schema union + explicit-schema scan — no schema-merge Spark job)
    must be indistinguishable from the mergeSchema read it replaces:
    same union schema (first-file-wins column order), same rows, NULL
    backfill for columns a file lacks, and the distributed-mergeSchema
    fallback above the file-count threshold."""
    from distribot_spark.sources import acid

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    spark.createDataFrame(
        [(1, "x", 1.5)], "k long, s string, v double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d1"))
    spark.createDataFrame(
        [(2, 7, "y")], "k long, extra long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d2"))
    import glob
    import shutil as _sh

    _sh.move(glob.glob(str(tmp_path / "d1" / "*.parquet"))[0], p1)
    _sh.move(glob.glob(str(tmp_path / "d2" / "*.parquet"))[0], p2)

    ours = acid.read_files_merged(spark, [p1, p2])
    ref = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    assert ours.schema == ref.schema
    key = lambda r: tuple((x is None, x) for x in r)
    assert sorted(map(tuple, ours.collect()), key=key) == sorted(
        map(tuple, ref.collect()), key=key)

    # above the threshold the helper must route to mergeSchema (one
    # file repeated: the path count is what trips the gate)
    many = [p1] * (acid.SCHEMA_MERGE_DRIVER_MAX_FILES + 1)
    big = acid.read_files_merged(spark, many)
    assert big.count() >= 1  # routed through the mergeSchema fallback


def test_merge_touched_buckets_param_equals_default(spark, tmp_path):
    """r9 optimization pin: a MERGE handed its update set's distinct
    bucket ids (`touched_buckets=` — the matview guard fuses the
    discovery into its existing aggregate) commits the same logical
    table as the self-discovering MERGE."""
    from distribot_spark.sources import acid

    def seed(path):
        t = acid.TableLog(str(path))
        acid.write_initial_spark(
            spark, t,
            spark.range(100).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("val")),
            "k", n_buckets=8)
        return t

    t1, t2 = seed(tmp_path / "t1"), seed(tmp_path / "t2")
    up = spark.range(40, 60).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("val"))
    touched = {int(r["b"]) for r in up.select(
        acid._bucket_expr("k", 8, False).alias("b")).distinct().collect()}
    acid.merge_upsert_spark(spark, t1, up, "k")
    acid.merge_upsert_spark(spark, t2, up, "k", touched_buckets=touched)
    r1 = sorted(map(tuple, acid.read_snapshot_spark(spark, t1).collect()))
    r2 = sorted(map(tuple, acid.read_snapshot_spark(spark, t2).collect()))
    assert r1 == r2 and len(r1) == 100


def test_quarantine_merge_fused_discovery_superset(spark, tmp_path):
    """r9 optimization pin: a quarantine-mode MERGE discovers its
    touched buckets DURING the dead-letter write (`Dataset.observe`
    over the tagged rows) — a documented SUPERSET of the clean rows'
    buckets. A batch whose rows for one bucket are ALL diverted must
    still commit the clean rows, divert the bad ones, rewrite the
    bad-only bucket IDENTICALLY, and emit NO change-feed rows for the
    identical rewrite (carried rows are struct-compare suppressed)."""
    from distribot_spark.sources import acid

    t = acid.TableLog(str(tmp_path / "t"))
    acid.write_initial_spark(
        spark, t,
        spark.range(8).select(F.col("id").alias("k"),
                              (F.col("id") * 1.0).alias("val")),
        "k", n_buckets=2,
        constraints={"val_nonneg": {"col": "val", "min": 0,
                                    "on_violation": "quarantine"}},
    )
    # bucket 0 (even keys): clean updates; bucket 1 (odd keys): every
    # row violates -> the observed superset includes bucket 1, whose
    # rewrite must carry its base rows unchanged
    up = spark.createDataFrame(
        [(0, 100.0), (2, 200.0), (1, -1.0), (3, -3.0)],
        "k long, val double")
    st = acid.merge_upsert_spark(spark, t, up, "k")
    assert st["quarantined"] == 2, st

    got = dict((r.k, r.val) for r in
               acid.read_snapshot_spark(spark, t).collect())
    assert got == {0: 100.0, 2: 200.0, 1: 1.0, 3: 3.0,
                   4: 4.0, 5: 5.0, 6: 6.0, 7: 7.0}
    qrows = sorted((r.k, r.val) for r in
                   acid.read_quarantine(spark, t).collect())
    assert qrows == [(1, -1.0), (3, -3.0)]

    # change feed of the merge commit: exactly the two clean updates
    # as pre/post pairs — the identical bucket-1 rewrite contributes
    # nothing
    ch = acid.table_changes_spark(spark, t, "k", from_version=1)
    rows = sorted((r.k, r.val, r._change_type) for r in ch.collect())
    assert rows == [
        (0, 0.0, "update_pre"), (0, 100.0, "update_post"),
        (2, 2.0, "update_pre"), (2, 200.0, "update_post"),
    ], rows
