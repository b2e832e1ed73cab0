"""``UPDATE ... SET ... WHERE ...`` (`update_where_spark`): in-place
rewrite of exactly the matched rows — one commit, only files with a hit
rewritten 1:1, pre-image RHS semantics, DV fold, generated-column
recompute, CHECK/FK post-image rails (abort, never quarantine), OCC
recompute, and generic CDF update pairs."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources.acid import TableLog, update_where_spark


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _mk(spark, n=200, n_buckets=4, **kw):
    t = TableLog(_tmp("uw_"))
    acid.write_initial_spark(
        spark, t,
        spark.range(0, n).select(
            "id", (F.col("id") % 7).alias("g"),
            (F.col("id") * 10).alias("v")),
        "id", n_buckets=n_buckets, **kw)
    return t


def _rows(spark, t, version=None):
    return {r["id"]: (r["g"], r["v"])
            for r in acid.read_snapshot_spark(
                spark, t, version=version).collect()}


def test_basic_update_one_commit_only_hit_files_rewritten(spark):
    t = _mk(spark)
    v0, live0 = t.snapshot()
    st = update_where_spark(spark, t, "g = 3", {"v": "v + 1"})
    assert st["committed_version"] == v0 + 1 and st["attempts"] == 1
    assert st["rows_updated"] == sum(1 for i in range(200) if i % 7 == 3)
    got = _rows(spark, t)
    assert got == {i: (i % 7, i * 10 + (1 if i % 7 == 3 else 0))
                   for i in range(200)}
    # time travel: the pre-image is intact one version back
    assert _rows(spark, t, version=v0) == {
        i: (i % 7, i * 10) for i in range(200)}
    # a single-row predicate rewrites ONE file; the others keep their
    # exact staged names (untouched-file identity)
    _, live1 = t.snapshot()
    st2 = update_where_spark(spark, t, "id = 7", {"v": "0"})
    assert st2["files_rewritten"] == 1 and st2["rows_updated"] == 1
    _, live2 = t.snapshot()
    assert len(set(live1) & set(live2)) == len(live1) - 1


def test_preimage_rhs_semantics_swap_and_null_predicate(spark):
    t = TableLog(_tmp("uw_"))
    acid.write_initial_spark(
        spark, t,
        spark.createDataFrame(
            [(1, 10, 20, 5), (2, 30, 40, None), (3, 50, 60, 9)],
            "k long, a long, b long, w long"),
        "k", n_buckets=2)
    # SET a=b, b=a swaps (both RHS see the PRE-image); a NULL
    # predicate value means the row does NOT match (SQL semantics)
    st = update_where_spark(spark, t, "w > 4", {"a": "b", "b": "a"})
    assert st["rows_updated"] == 2  # k=2 has w NULL -> unmatched
    got = {r.k: (r.a, r.b) for r in
           acid.read_snapshot_spark(spark, t).collect()}
    assert got == {1: (20, 10), 2: (30, 40), 3: (60, 50)}, got


def test_rhs_cast_to_existing_type_no_schema_drift(spark):
    t = _mk(spark, n=40, n_buckets=2)
    # v is long; a double-typed RHS must land as long (truncating cast
    # is Spark's, but the point is the FILE schema does not drift)
    update_where_spark(spark, t, "g = 0", {"v": "v * 1.5"})
    df = acid.read_snapshot_spark(spark, t)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {r["v"] for r in df.filter("id = 0").collect()} == {0}
    assert {r["v"] for r in df.filter("id = 14").collect()} == {210}


def test_dv_hidden_rows_not_updated_not_resurrected(spark):
    t = _mk(spark)
    acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(3,), (10,)], "id long"), "id")
    st = update_where_spark(spark, t, "g = 3", {"v": "v + 1"})
    # id=3 and id=10 both have g=3 but are DV-hidden: not counted,
    # not updated, and the rewrite must not resurrect them
    assert st["rows_updated"] == sum(
        1 for i in range(200) if i % 7 == 3 and i not in (3, 10))
    got = _rows(spark, t)
    assert 3 not in got and 10 not in got
    assert got[17] == (3, 171) and got[24] == (3, 241)
    # rewritten files carry no stale DV references
    for f, _ in t.live_dvs().items():
        assert f in t.snapshot()[1]


def test_no_match_returns_without_commit(spark):
    t = _mk(spark, n=20, n_buckets=2)
    v0 = t.version()
    st = update_where_spark(spark, t, "g = 99", {"v": "0"})
    assert st == {"committed_version": None, "attempts": 0,
                  "rows_updated": 0, "files_rewritten": 0}
    assert t.version() == v0


def test_rails_key_identity_generated_unknown_mapped(spark):
    t = _mk(spark, n=20, n_buckets=2)
    with pytest.raises(ValueError, match="merge key"):
        update_where_spark(spark, t, "g = 1", {"id": "id + 1000"})
    with pytest.raises(ValueError, match="unknown column"):
        update_where_spark(spark, t, "g = 1", {"nope": "1"})
    ti = TableLog(_tmp("uw_"))
    acid.write_initial_spark(
        spark, ti, spark.range(5).select("id", (F.col("id")).alias("x")),
        "id", n_buckets=2, identity={"col": "rowid"})
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        update_where_spark(spark, ti, "x = 1", {"rowid": "7"})
    tg = TableLog(_tmp("uw_"))
    acid.write_initial_spark(
        spark, tg, spark.range(5).select("id", (F.col("id") * 3)
                                         .alias("n")),
        "id", n_buckets=2,
        generated={"shard": {"fn": "pmod", "src": "n", "n": 4}})
    with pytest.raises(ValueError, match="generated column"):
        update_where_spark(spark, tg, "id = 1", {"shard": "0"})
    tm = _mk(spark, n=20, n_buckets=2)
    acid.alter_rename_column(tm, "g", "grp")
    with pytest.raises(ValueError, match="column-mapped"):
        update_where_spark(spark, tm, "grp = 1", {"v": "0"})


def test_generated_column_recomputed_when_source_assigned(spark):
    t = TableLog(_tmp("uw_"))
    acid.write_initial_spark(
        spark, t,
        spark.range(0, 12).select("id", (F.col("id") * 3).alias("n")),
        "id", n_buckets=2,
        generated={"shard": {"fn": "pmod", "src": "n", "n": 4}})
    st = update_where_spark(spark, t, "id < 4", {"n": "n + 1"})
    assert st["rows_updated"] == 4
    got = {r.id: (r.n, r.shard) for r in
           acid.read_snapshot_spark(spark, t).collect()}
    for i in range(12):
        n = i * 3 + (1 if i < 4 else 0)
        assert got[i] == (n, n % 4), (i, got[i])
    # the recomputed value VALIDATES under the table's own generated
    # contract: a follow-up writer re-deriving it agrees
    acid.append_spark(spark, t, spark.createDataFrame(
        [(100, 7)], "id long, n long"))
    assert {r.shard for r in acid.read_snapshot_spark(
        spark, t).filter("id = 100").collect()} == {3}


def test_check_violation_aborts_whole_update_even_quarantine_mode(spark):
    t = TableLog(_tmp("uw_"))
    acid.write_initial_spark(
        spark, t,
        spark.range(0, 20).select("id", (F.col("id") % 5).alias("q")),
        "id", n_buckets=2,
        constraints={"q_cap": {"col": "q", "max": 10,
                               "on_violation": "quarantine"}})
    v0 = t.version()
    with pytest.raises(ValueError, match="CHECK"):
        update_where_spark(spark, t, "q = 4", {"q": "q + 100"})
    # whole update aborted: no commit, no quarantined rows (an UPDATE
    # never diverts — nothing under the dead-letter area), state intact
    assert t.version() == v0
    qd = acid.quarantine_dir(t)
    assert not os.path.isdir(qd) or not any(
        f.endswith(".parquet") for _, _, fs in os.walk(qd) for f in fs)
    assert {r.q for r in acid.read_snapshot_spark(
        spark, t).collect()} == {0, 1, 2, 3, 4}
    # a legal assignment under the same constraint lands
    st = update_where_spark(spark, t, "q = 4", {"q": "q + 6"})
    assert st["rows_updated"] == 4


def test_fk_assignment_reproves_membership(spark):
    parent = TableLog(_tmp("uw_p_"))
    acid.write_initial_spark(
        spark, parent,
        spark.createDataFrame([(1,), (2,), (3,)], "pk long"),
        "pk", n_buckets=2)
    child = TableLog(_tmp("uw_c_"))
    acid.write_initial_spark(
        spark, child,
        spark.createDataFrame([(10, 1), (11, 2), (12, 2)],
                              "ck long, ref long"),
        "ck", n_buckets=2)
    acid.alter_add_foreign_key(spark, child, "fk_ref", "ref",
                               parent.path)
    v0 = child.version()
    with pytest.raises(ValueError, match="FOREIGN KEY"):
        update_where_spark(spark, child, "ck = 10", {"ref": "99"})
    assert child.version() == v0
    st = update_where_spark(spark, child, "ck = 10", {"ref": "3"})
    assert st["rows_updated"] == 1
    got = {r.ck: r.ref for r in
           acid.read_snapshot_spark(spark, child).collect()}
    assert got == {10: 3, 11: 2, 12: 2}


def test_occ_race_recomputes_against_new_head(spark):
    t = _mk(spark, n=40, n_buckets=2)
    hooked = {"done": False}

    def hook(v):
        if not hooked["done"]:
            hooked["done"] = True
            # a concurrent merge lands first: rewrites a matched
            # bucket AND inserts a new matching row
            acid.merge_upsert_spark(
                spark, t,
                spark.createDataFrame([(1000, 3, 7), (14, 3, 999)],
                                      "id long, g long, v long"),
                "id")

    st = update_where_spark(spark, t, "g = 3", {"v": "v + 1"},
                            pre_commit_hook=hook)
    assert st["attempts"] == 2, st
    got = _rows(spark, t)
    # the racing merge's rows were re-read and updated too
    assert got[1000] == (3, 8) and got[14] == (3, 1000)
    assert got[17] == (3, 171)


def test_cdf_reports_update_pairs_carried_rows_suppressed(spark):
    t = _mk(spark, n=40, n_buckets=2)
    v0 = t.version()
    update_where_spark(spark, t, "g = 3", {"v": "v + 1"})
    feed = acid.table_changes_spark(
        spark, t, "id", from_version=v0 + 1, to_version=v0 + 1)
    rows = feed.collect()
    matched = {i for i in range(40) if i % 7 == 3}
    pre = {r["id"] for r in rows
           if r["_change_type"] == "update_pre"}
    post = {r["id"] for r in rows
            if r["_change_type"] == "update_post"}
    assert pre == post == matched
    assert all(r["_change_type"].startswith("update_") for r in rows)
    assert {r["v"] for r in rows
            if r["_change_type"] == "update_post"} == {
        i * 10 + 1 for i in matched}


def test_update_feeds_replication_replica_equals_source(spark):
    """The UPDATE verb drives the CDC-consumer loop with zero new
    code: clone-bootstrap a replica, update_where the source (value
    change AND a predicate beyond the replica's knowledge), replicate
    the range — the net-fold applies the update_post rows as one MERGE
    and the replica equals the source row-for-row."""
    from distribot_spark.sources.acid import (
        clone_table, replicate_changes_spark)

    t = _mk(spark, n=60, n_buckets=2)
    dst_path = os.path.join(_tmp("uw_r_"), "replica")
    c = t.version()
    clone_table(t, dst_path)
    dst = TableLog(dst_path)
    update_where_spark(spark, t, "g IN (1, 5) AND v < 400",
                       {"v": "v * 2", "g": "g + 10"})
    acid.delete_keys_spark(
        spark, t, spark.createDataFrame([(8,)], "id long"), "id")
    st = replicate_changes_spark(spark, t, dst, from_version=c + 1)
    assert st["upserted_keys"] > 0
    src_rows = sorted(map(tuple, acid.read_snapshot_spark(
        spark, t).collect()))
    dst_rows = sorted(map(tuple, acid.read_snapshot_spark(
        spark, dst).collect()))
    assert src_rows == dst_rows


def test_update_on_governed_table_writer_sees_raw_policies_survive(spark):
    """Policies are READ-side governance: UPDATE (like MERGE/DELETE)
    plans and rewrites over the RAW bytes — a predicate on a masked
    column matches true values, assignments write true values — while
    every governed read, before and after, keeps masking. The policy
    set itself (metadata) rides through the rewrite untouched."""
    t = TableLog(_tmp("uw_p_"))
    acid.write_initial_spark(
        spark, t,
        spark.createDataFrame(
            [(1, "alice", 120), (2, "bob", -40), (3, "carol", 310)],
            "id long, name string, balance long"),
        "id", n_buckets=2)
    acid.alter_set_mask(t, "name", {"fn": "hash"})
    acid.alter_set_row_filter(t, "pos", {"col": "balance", "min": 0})
    rev0 = t.policies_rev()

    # predicate on the RAW name (a masked reader could never express
    # this); assignment flips the raw balance sign
    st = update_where_spark(spark, t, "name = 'bob'",
                            {"balance": "-balance"})
    assert st["rows_updated"] == 1
    raw = {r.id: (r.name, r.balance) for r in
           acid.read_snapshot_spark(spark, t).collect()}
    assert raw[2] == ("bob", 40)
    gov = {r.id: r for r in
           acid.read_policy_spark(spark, t, dv_key="id").collect()}
    # bob now passes the row filter AND stays masked
    import hashlib
    assert set(gov) == {1, 2, 3}
    assert gov[2]["name"] == hashlib.md5(b"bob").hexdigest()
    assert t.policies_rev() == rev0  # rewrite never touched policies
