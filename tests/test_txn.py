"""Multi-table atomic commit (sources/txn.py): both version links land
or neither — across coordinator crashes at every protocol stage, with
readers pinned mid-commit, foreign writers racing the markers, and
rules drifting under the staged plan."""

import json
import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from distribot_spark.sources import acid
from distribot_spark.sources import txn as tx
from distribot_spark.sources.acid import TableLog


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _mk_pair(spark):
    fact, dim = TableLog(_tmp("txf_")), TableLog(_tmp("txd_"))
    acid.write_initial_spark(
        spark, fact,
        spark.range(0, 50).select(
            "id", (F.col("id") % 5).alias("fk"),
            (F.col("id") * 10).alias("cents")),
        "id", n_buckets=4)
    acid.write_initial_spark(
        spark, dim,
        spark.range(0, 5).select(
            F.col("id").alias("dk"),
            F.concat(F.lit("seg"), F.col("id")).alias("seg")),
        "dk", n_buckets=2)
    return fact, dim


def _stage_pair(spark, fact, dim, lo=1000, n=10):
    fdf = spark.range(lo, lo + n).select(
        "id", (F.col("id") % 5).alias("fk"),
        (F.col("id") * 10).alias("cents"))
    ddf = spark.range(100, 102).select(
        F.col("id").alias("dk"), F.lit("newseg").alias("seg"))
    return [tx.stage_append_spark(spark, fact, fdf, writer="wf"),
            tx.stage_append_spark(spark, dim, ddf, writer="wd")]


def _counts(spark, fact, dim):
    return (acid.read_snapshot_spark(spark, fact).count(),
            acid.read_snapshot_spark(spark, dim).count())


def test_commit_together_lands_both_and_cleans_up(spark):
    fact, dim = _mk_pair(spark)
    st = tx.commit_together(_stage_pair(spark, fact, dim))
    assert set(st["versions"]) == {fact.path, dim.path}
    assert _counts(spark, fact, dim) == (60, 7)
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))
        body = t.read_commit(st["versions"][t.path])
        assert body["txn"] == st["txn"] and not body["removes"]
    # the COMMIT outcome is DURABLE (like abort): vacating it would let
    # a stale resolver that read a marker pre-cleanup win a fresh
    # "abort" on the empty path and unstage files already linked
    out_path = os.path.join(
        sorted([fact, dim], key=lambda t: t.path)[0].log_dir,
        f"_txn.outcome.{st['txn']}.json")
    assert json.load(open(out_path))["decision"] == "commit"


def test_stale_resolver_after_cleanup_cannot_abort_committed_txn(spark):
    """The ADVICE-pinned race: a resolver captures the marker BEFORE
    commit-path cleanup removes it, stalls, and resumes AFTER cleanup
    with the plan ts past the lease. Its put_if_absent(outcome,
    'abort') must lose to the durable commit outcome — it must roll
    the (already-landed) txn forward, never unstage linked files."""
    fact, dim = _mk_pair(spark)
    staged = _stage_pair(spark, fact, dim)

    captured = {}

    def hook(stage):
        if stage == "pinned":
            captured["plan"] = json.load(open(tx._marker_path(fact)))

    st = tx.commit_together(staged, _hook=hook)
    fact_entry = next(e for e in captured["plan"]["tables"]
                      if e["path"] == fact.path)
    files = [fact.data_path(a["file"]) for a in fact_entry["adds"]]
    # simulate the stalled resolver: lease long expired, marker gone,
    # outcome path is whatever cleanup left behind
    plan = dict(captured["plan"], ts=time.time() - 9999)
    assert not fact.storage.put_if_absent(
        plan["outcome"], json.dumps({"decision": "abort"}).encode())
    out = json.load(open(plan["outcome"]))
    assert out["decision"] == "commit"
    # the committed rows and their data files survive
    assert _counts(spark, fact, dim) == (60, 7)
    for f in files:
        assert os.path.exists(f)
    assert fact.read_commit(st["versions"][fact.path])["txn"] == st["txn"]


def test_reader_pinned_mid_commit_sees_neither_or_both(spark):
    """THE verdict-5 contract. Before the outcome decides, a reader
    sees the transaction on NEITHER table (nothing is published);
    after it decides — even with zero links landed, or one of two —
    any reader completes the publish and sees it on BOTH."""
    fact, dim = _mk_pair(spark)

    seen = {}

    def hook(stage):
        if stage in ("pinned", "decided", "linked:0"):
            seen[stage] = _counts(spark, fact, dim)

    tx.commit_together(_stage_pair(spark, fact, dim), _hook=hook)
    assert seen["pinned"] == (50, 5)        # undecided: neither
    assert seen["decided"] == (60, 7)       # decided: reader completes
    assert seen["linked:0"] == (60, 7)      # mid-publish: both
    assert _counts(spark, fact, dim) == (60, 7)


def test_crash_before_decide_is_aborted_after_lease(spark):
    fact, dim = _mk_pair(spark)
    staged = _stage_pair(spark, fact, dim)
    files = [e["table"].data_path(a["file"])
             for e in staged for a in e["adds"]]

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "pinned":
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    assert os.path.exists(tx._marker_path(fact))
    # young + undecided: writers back off, readers proceed on the old
    # state — nothing is published
    assert fact._try_commit_linked(fact.version(), [], [], "w") is False
    assert _counts(spark, fact, dim) == (50, 5)
    # past the lease, ANY bump resolves it to a clean abort
    assert tx.resolve_pending_txn(fact, lease_sec=0.0) == "aborted"
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))
    assert not any(os.path.exists(f) for f in files)  # staged reclaimed
    assert _counts(spark, fact, dim) == (50, 5)
    acid.append_spark(spark, fact, spark.range(2000, 2001).select(
        "id", (F.col("id") % 5).alias("fk"),
        (F.col("id") * 10).alias("cents")), "id")
    assert _counts(spark, fact, dim) == (51, 5)


def test_crash_after_decide_rolls_forward_from_either_side(spark):
    """Coordinator dies with the outcome written and ZERO links: a
    foreign writer bumping into EITHER table's marker publishes the
    whole transaction before its own commit proceeds."""
    fact, dim = _mk_pair(spark)

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "decided":
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(_stage_pair(spark, fact, dim), _hook=hook)
    # the DIM-side writer trips the roll-forward (not just the sorted-
    # first table): its append lands on top of the txn commit
    acid.append_spark(spark, dim, spark.range(300, 301).select(
        F.col("id").alias("dk"), F.lit("x").alias("seg")), "dk")
    assert _counts(spark, fact, dim) == (60, 8)
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))


def test_crash_mid_publish_and_before_cleanup_heal_on_read(spark):
    fact, dim = _mk_pair(spark)

    class Crash(Exception):
        pass

    for crash_at, expect_after_read in (("linked:0", (60, 7)),
                                        ("linked:1", (60, 7))):
        def hook(stage, _c=crash_at):
            if stage == _c:
                raise Crash

        f2, d2 = _mk_pair(spark)
        with pytest.raises(Crash):
            tx.commit_together(_stage_pair(spark, f2, d2), _hook=hook)
        # a plain read of either table heals everything
        assert _counts(spark, f2, d2) == expect_after_read
        for t in (f2, d2):
            assert not os.path.exists(tx._marker_path(t))


def test_concurrent_txn_gets_busy_and_staged_survive(spark):
    fact, dim = _mk_pair(spark)
    staged = _stage_pair(spark, fact, dim)
    other = {"txn": "deadbeef", "ts": time.time(),
             "outcome": os.path.join(dim.log_dir,
                                     "_txn.outcome.deadbeef.json"),
             "tables": [{"path": dim.path, "floor": dim.version(),
                         "adds": [], "writer": "other"}]}
    with open(tx._marker_path(dim), "w") as fh:
        json.dump(other, fh)
    with pytest.raises(tx.TxnBusy):
        tx.commit_together(staged)
    # our markers released, staged files intact — retry works
    assert not os.path.exists(tx._marker_path(fact))
    files = [e["table"].data_path(a["file"])
             for e in staged for a in e["adds"]]
    assert all(os.path.exists(f) for f in files)
    os.unlink(tx._marker_path(dim))
    tx.commit_together(staged)
    assert _counts(spark, fact, dim) == (60, 7)


def test_rules_drift_under_staged_plan_aborts(spark):
    fact, dim = _mk_pair(spark)
    staged = _stage_pair(spark, fact, dim)
    acid.alter_add_constraint_spark(
        spark, fact, "cents_pos", {"col": "cents", "min": 0})
    with pytest.raises(tx.TxnAborted, match="rules changed"):
        tx.commit_together(staged)
    assert _counts(spark, fact, dim) == (50, 5)
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))
    # re-stage under the new rules: lands
    tx.commit_together(_stage_pair(spark, fact, dim))
    assert _counts(spark, fact, dim) == (60, 7)


def test_stage_refusals(spark):
    fact, dim = _mk_pair(spark)
    df = spark.range(5000, 5001).select(
        "id", (F.col("id") % 5).alias("fk"),
        (F.col("id") * 10).alias("cents"))
    with pytest.raises(ValueError, match=">= 2 tables"):
        tx.commit_together([tx.stage_append_spark(spark, fact, df,
                                                  writer="w")])
    acid.alter_add_constraint_spark(
        spark, fact, "uniq_id", {"col": "id", "unique": True})
    with pytest.raises(ValueError, match="UNIQUE"):
        tx.stage_append_spark(spark, fact, df)
    child = TableLog(_tmp("txc_"))
    acid.write_initial_spark(
        spark, child,
        spark.range(0, 5).select("id", (F.col("id") % 5).alias("fk")),
        "id", n_buckets=2)
    acid.alter_add_foreign_key(spark, child, "fk_dim", "fk", dim.path)
    with pytest.raises(ValueError, match="FK"):  # child role is out
        tx.stage_append_spark(spark, child, spark.range(9000, 9001)
                              .select("id", (F.col("id") % 5)
                                      .alias("fk")))
    with pytest.raises(ValueError, match="FK"):  # parent role too
        tx.stage_append_spark(spark, dim, spark.range(9000, 9001)
                              .select(F.col("id").alias("dk"),
                                      F.lit("s").alias("seg")))


def test_check_constraints_enforced_at_stage(spark):
    fact, dim = _mk_pair(spark)
    acid.alter_add_constraint_spark(
        spark, fact, "cents_pos", {"col": "cents", "min": 0})
    bad = spark.range(7000, 7005).select(
        "id", (F.col("id") % 5).alias("fk"),
        (F.col("id") * -10).alias("cents"))
    # fail-mode CHECK aborts the staging JOB itself — nothing to undo
    with pytest.raises(Exception, match="cents_pos"):
        tx.stage_append_spark(spark, fact, bad)
    assert _counts(spark, fact, dim) == (50, 5)


def test_txn_snapshot_is_transaction_consistent(spark):
    """The read-side cut: versions captured MID-PUBLISH must include
    the transaction on both tables or neither — `txn_snapshot`'s
    double-read fence resolves the marker (helping the publish) and
    retries until nothing moved between its two reads."""
    fact, dim = _mk_pair(spark)

    cuts = {}

    def hook(stage):
        if stage in ("pinned", "linked:0"):
            cuts[stage] = tx.txn_snapshot([fact, dim])

    st = tx.commit_together(_stage_pair(spark, fact, dim), _hook=hook)
    vf, vd = st["versions"][fact.path], st["versions"][dim.path]
    # undecided: the cut excludes the txn on BOTH sides
    assert cuts["pinned"] == {fact.path: vf - 1, dim.path: vd - 1}
    # mid-publish: the fence helps the roll-forward, includes BOTH
    assert cuts["linked:0"] == {fact.path: vf, dim.path: vd}
    # quiescent: trivially consistent
    assert tx.txn_snapshot([fact, dim]) == {fact.path: vf,
                                            dim.path: vd}


def test_txn_auto_compaction_policy_honored(spark):
    """Participants with auto_optimize honor it AFTER the atomic
    publish (compaction rides its own commits, like plain appends)."""
    fact = TableLog(_tmp("txf_"))
    acid.write_initial_spark(
        spark, fact,
        spark.range(0, 50).select(
            "id", (F.col("id") % 5).alias("fk"),
            (F.col("id") * 10).alias("cents")),
        "id", n_buckets=4, auto_optimize=2)
    dim = TableLog(_tmp("txd_"))
    acid.write_initial_spark(
        spark, dim,
        spark.range(0, 5).select(
            F.col("id").alias("dk"),
            F.concat(F.lit("seg"), F.col("id")).alias("seg")),
        "dk", n_buckets=2)
    for lo in (1000, 2000, 3000, 4000):
        tx.commit_together(_stage_pair(spark, fact, dim, lo=lo),
                           spark=spark)
    n_live = len(fact.live_paths())
    # 4 bucketed appends over 4 buckets uncompacted would reach 5
    # files/bucket (> 2n = 4): the policy bin-packs back to n=2
    assert n_live <= 2 * 4 + 4, n_live
    assert _counts(spark, fact, dim)[0] == 50 + 4 * 10


def test_vacuum_spares_pending_txn_staged_files(spark):
    """A pending marker's staged adds are referenced by the PLAN, not
    yet by any commit — an aggressive vacuum (min_age 0) must not
    reclaim them or the roll-forward would commit dangling adds."""
    fact, dim = _mk_pair(spark)
    staged = _stage_pair(spark, fact, dim)
    files = [e["table"].data_path(a["file"])
             for e in staged for a in e["adds"]]

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "pinned":
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    fact.vacuum(min_age_seconds=0.0)
    dim.vacuum(min_age_seconds=0.0)
    assert all(os.path.exists(f) for f in files)
    # the txn is still resolvable both ways; roll it forward via the
    # decided path by writing the outcome, then reading
    plan = tx._read_json(tx._marker_path(fact))
    fact.storage.put_if_absent(
        plan["outcome"], json.dumps({"decision": "commit"}).encode())
    assert _counts(spark, fact, dim) == (60, 7)


def test_stalled_coordinator_cannot_revive_an_aborted_txn(spark):
    """THE nastiest interleaving: the coordinator stalls after pinning
    markers, a lease-expired resolver ABORTS (staged reclaimed), then
    the coordinator WAKES and tries to decide. The abort outcome is
    durable, so the resumed decide must raise TxnAborted — were the
    outcome path vacated, the coordinator would win a fresh 'commit'
    and publish links naming deleted files."""
    fact, dim = _mk_pair(spark)

    def stall_then_aborted(stage):
        if stage == "pinned":
            # the world moves while we sleep: a foreign writer finds
            # our marker past its lease and aborts us
            assert tx.resolve_pending_txn(fact, lease_sec=0.0) == \
                "aborted"

    with pytest.raises(tx.TxnAborted, match="re-stage"):
        tx.commit_together(_stage_pair(spark, fact, dim),
                           _hook=stall_then_aborted)
    # nothing published, nothing dangling, markers gone
    assert _counts(spark, fact, dim) == (50, 5)
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))
    # the tables remain fully writable
    tx.commit_together(_stage_pair(spark, fact, dim))
    assert _counts(spark, fact, dim) == (60, 7)


def test_three_table_txn_lands_all_or_none(spark):
    """The protocol is N-way, not pairwise: three tables, one decide,
    three links — a mid-publish crash heals ALL of them on a read of
    any one."""
    fact, dim = _mk_pair(spark)
    third = TableLog(_tmp("txt_"))
    acid.write_initial_spark(
        spark, third,
        spark.range(0, 8).select(F.col("id").alias("k"),
                                 (F.col("id") * 5).alias("w")),
        "k", n_buckets=2)
    staged = _stage_pair(spark, fact, dim) + [
        tx.stage_append_spark(
            spark, third, spark.range(70, 75).select(
                F.col("id").alias("k"), (F.col("id") * 5).alias("w")),
            writer="wt")]

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "linked:1":  # one link landed, two to go
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    # reading the THIRD table (whose link never landed) heals all three
    assert acid.read_snapshot_spark(spark, third).count() == 13
    assert _counts(spark, fact, dim) == (60, 7)
    for t in (fact, dim, third):
        assert not os.path.exists(tx._marker_path(t))


# ---- MERGE participants (round-9 verdict task 3) -----------------------


def _fact_rows(spark, fact):
    return {(r["id"], r["cents"]) for r in
            acid.read_snapshot_spark(spark, fact)
            .select("id", "cents").collect()}


def _stage_merge_pair(spark, fact, dim):
    """Upsert 10 existing fact keys (cents -> -1) + insert 5 new, and
    append 2 dim rows — the atomic upsert-fact + append-dim shape."""
    upd = spark.range(0, 10).select(
        "id", (F.col("id") % 5).alias("fk"),
        F.lit(-1).cast("long").alias("cents")).unionByName(
        spark.range(500, 505).select(
            "id", (F.col("id") % 5).alias("fk"),
            (F.col("id") * 10).alias("cents")))
    ddf = spark.range(100, 102).select(
        F.col("id").alias("dk"), F.lit("newseg").alias("seg"))
    return [tx.stage_merge_spark(spark, fact, upd, writer="wm"),
            tx.stage_append_spark(spark, dim, ddf, writer="wd")]


def _merged_want():
    return ({(i, -1) for i in range(10)}
            | {(i, i * 10) for i in range(10, 50)}
            | {(i, i * 10) for i in range(500, 505)})


def test_merge_plus_append_commit_together(spark):
    """The verdict-3 contract: one MERGE + one append participant,
    both-or-neither, scaffolding reclaimed, outcome durable."""
    fact, dim = _mk_pair(spark)
    staged = _stage_merge_pair(spark, fact, dim)
    upd_files = [fact.data_path(u["file"])
                 for u in staged[0]["updates_files"]]
    st = tx.commit_together(staged)
    assert _fact_rows(spark, fact) == _merged_want()
    assert acid.read_snapshot_spark(spark, dim).count() == 7
    body = fact.read_commit(st["versions"][fact.path])
    assert body["txn"] == st["txn"] and body["removes"]  # a real rewrite
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))
    # merge scaffolding (raw update files) reclaimed in cleanup
    assert not any(os.path.exists(f) for f in upd_files)


def test_merge_reader_pinned_mid_commit_sees_neither_or_both(spark):
    fact, dim = _mk_pair(spark)
    seen = {}

    def hook(stage):
        if stage in ("pinned", "decided"):
            seen[stage] = (_fact_rows(spark, fact),
                           acid.read_snapshot_spark(spark, dim).count())

    tx.commit_together(_stage_merge_pair(spark, fact, dim), _hook=hook)
    want0 = {(i, i * 10) for i in range(50)}
    assert seen["pinned"] == (want0, 5)          # undecided: neither
    assert seen["decided"] == (_merged_want(), 7)  # decided: both


def test_merge_straggler_commit_forces_rebase(spark):
    """A foreign commit lands between staging and pinning (the same
    code path as a pre-pin in-flight straggler): the precomputed
    rewrite is stale, roll-forward rebases from the staged update
    files, and BOTH the foreign rows and the merge survive."""
    fact, dim = _mk_pair(spark)
    staged = _stage_merge_pair(spark, fact, dim)
    rewrite_files = [fact.data_path(a["file"]) for a in staged[0]["adds"]]
    # the straggler: an upsert touching one of OUR keys and adding one
    acid.merge_upsert_spark(
        spark, fact, spark.createDataFrame(
            [(0, 0, 777), (900, 0, 9000)],
            "id long, fk long, cents long"), "id", writer="straggler")
    st = tx.commit_together(staged)
    got = _fact_rows(spark, fact)
    # our merge overwrote key 0 AFTER the straggler; key 900 survives
    assert got == _merged_want() | {(900, 9000)}
    body = fact.read_commit(st["versions"][fact.path])
    landed = {a["file"] for a in body["adds"]}
    # the landed adds are the REBASE files, not the stale rewrite
    assert not any(os.path.basename(f) in landed for f in rewrite_files)
    # stale rewrite + update files reclaimed
    assert not any(os.path.exists(f) for f in rewrite_files)
    assert not os.path.exists(tx._marker_path(fact))


def test_merge_crash_after_decide_reader_rebases_engine_free(spark):
    """Coordinator dies post-decide with zero links, AND a straggler
    moved the head: a plain READ resolves the txn via the pandas
    rebase — no SparkSession involved in the roll-forward."""
    fact, dim = _mk_pair(spark)
    staged = _stage_merge_pair(spark, fact, dim)
    acid.merge_upsert_spark(
        spark, fact, spark.createDataFrame(
            [(900, 0, 9000)], "id long, fk long, cents long"),
        "id", writer="straggler")

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "decided":
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    # reader-driven: resolve happens inside read_snapshot_spark
    assert _fact_rows(spark, fact) == _merged_want() | {(900, 9000)}
    assert acid.read_snapshot_spark(spark, dim).count() == 7
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))


def test_merge_conditional_version_participant(spark):
    """The version-argmax merge inside a txn: stale updates lose, new
    win, redelivery is a no-op — on both the precomputed path and the
    rebase path."""
    fact = TableLog(_tmp("txv_"))
    acid.write_initial_spark(
        spark, fact,
        spark.range(0, 20).select(
            "id", (F.col("id") * 10).alias("cents"),
            F.lit(5).cast("long").alias("ver")),
        "id", n_buckets=2)
    dim = TableLog(_tmp("txvd_"))
    acid.write_initial_spark(
        spark, dim, spark.range(0, 3).select(F.col("id").alias("dk")),
        "dk", n_buckets=1)
    upd = spark.createDataFrame(
        [(0, 111, 9), (1, 222, 3), (30, 333, 1)],
        "id long, cents long, ver long")  # new / stale / insert
    staged = [tx.stage_merge_spark(spark, fact, upd, version="ver",
                                   writer="wv"),
              tx.stage_append_spark(
                  spark, dim,
                  spark.range(10, 12).select(F.col("id").alias("dk")),
                  writer="wd")]
    tx.commit_together(staged)
    got = {(r["id"], r["cents"], r["ver"]) for r in
           acid.read_snapshot_spark(spark, fact).collect()}
    want = ({(0, 111, 9), (1, 10, 5), (30, 333, 1)}
            | {(i, i * 10, 5) for i in range(2, 20)})
    assert got == want


def test_merge_abort_reclaims_all_scaffolding(spark):
    """A lease-expired abort reclaims the precomputed rewrite AND the
    raw update files; the base table is untouched."""
    fact, dim = _mk_pair(spark)
    staged = _stage_merge_pair(spark, fact, dim)
    files = [fact.data_path(a["file"]) for a in staged[0]["adds"]]
    files += [fact.data_path(u["file"])
              for u in staged[0]["updates_files"]]

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "pinned":
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    assert tx.resolve_pending_txn(fact, lease_sec=0.0) == "aborted"
    assert not any(os.path.exists(f) for f in files)
    assert _fact_rows(spark, fact) == {(i, i * 10) for i in range(50)}


def test_merge_vacuum_shield_covers_update_files(spark):
    """While the marker is pinned, vacuum(0) must keep BOTH staged
    sets — reclaiming the update files would strand a decided txn
    behind a straggler with no rebase source."""
    fact, dim = _mk_pair(spark)
    staged = _stage_merge_pair(spark, fact, dim)
    files = ([fact.data_path(a["file"]) for a in staged[0]["adds"]]
             + [fact.data_path(u["file"])
                for u in staged[0]["updates_files"]])

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "pinned":
            fact.vacuum(min_age_seconds=0.0)
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    assert all(os.path.exists(f) for f in files)
    tx.resolve_pending_txn(fact, lease_sec=0.0)  # clean up


def test_merge_rails_refuse_single_log_families(spark):
    fact = TableLog(_tmp("txr_"))
    acid.write_initial_spark(
        spark, fact, spark.range(0, 10).select(
            "id", (F.col("id") * 2).alias("v")), "id", n_buckets=2,
    )
    acid.alter_add_constraint_spark(
        spark, fact, "u", {"col": "id", "unique": True})
    with pytest.raises(ValueError, match="UNIQUE"):
        tx.stage_merge_spark(
            spark, fact, spark.range(0, 2).select(
                "id", (F.col("id") * 2).alias("v")))


# ---- DV-DELETE participants --------------------------------------------


def test_delete_plus_append_commit_together(spark):
    """Atomic key-erasure + dim-append: the delete lands as a pure DV
    attach in the same decide as the append — neither or both."""
    fact, dim = _mk_pair(spark)
    staged = [
        tx.stage_delete_spark(spark, fact,
                              spark.range(0, 7).select("id"),
                              writer="erase"),
        tx.stage_append_spark(
            spark, dim, spark.range(100, 102).select(
                F.col("id").alias("dk"), F.lit("s").alias("seg")),
            writer="wd"),
    ]
    assert staged[0]["deleted_rows"] == 7
    keys_file = fact.data_path(staged[0]["keys_file"])
    seen = {}

    def hook(stage):
        if stage in ("pinned", "decided"):
            seen[stage] = _counts(spark, fact, dim)

    st = tx.commit_together(staged, _hook=hook)
    assert seen["pinned"] == (50, 5)
    assert seen["decided"] == (43, 7)
    assert _counts(spark, fact, dim) == (43, 7)
    body = fact.read_commit(st["versions"][fact.path])
    assert body["txn"] == st["txn"] and body.get("dvs")
    assert not body["adds"] and not body["removes"]
    assert not os.path.exists(keys_file)  # scaffolding reclaimed
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))


def test_delete_straggler_rewrite_forces_sidecar_recompute(spark):
    """The hazard the rebase exists for: a foreign MERGE rewrites a
    touched bucket AFTER the sidecars were staged — the staged DV
    names a now-dead file; linking it would silently no-op the
    delete. Roll-forward must recompute against the head."""
    fact, dim = _mk_pair(spark)
    staged = [
        tx.stage_delete_spark(spark, fact,
                              spark.range(0, 5).select("id"),
                              writer="erase"),
        tx.stage_append_spark(
            spark, dim, spark.range(100, 101).select(
                F.col("id").alias("dk"), F.lit("s").alias("seg")),
            writer="wd"),
    ]
    old_dvs = set(staged[0]["dvs"].values())
    # the straggler rewrites bucket files containing our keys
    acid.merge_upsert_spark(
        spark, fact, spark.createDataFrame(
            [(0, 0, 777), (900, 0, 9000)],
            "id long, fk long, cents long"), "id", writer="straggler")
    tx.commit_together(staged)
    got = _fact_rows(spark, fact)
    # keys 0..4 gone (including the straggler's rewrite of key 0);
    # the straggler's new key survives
    assert got == ({(i, i * 10) for i in range(5, 50)} | {(900, 9000)})
    landed_dvs = set((fact.read_commit(fact.version()).get("dvs")
                      or {}).values())
    assert landed_dvs and not (landed_dvs & old_dvs)
    assert not any(os.path.exists(fact.data_path(d)) for d in old_dvs)


def test_delete_crash_after_decide_reader_heals(spark):
    fact, dim = _mk_pair(spark)
    staged = [
        tx.stage_delete_spark(spark, fact,
                              spark.range(0, 3).select("id"),
                              writer="erase"),
        tx.stage_append_spark(
            spark, dim, spark.range(100, 101).select(
                F.col("id").alias("dk"), F.lit("s").alias("seg")),
            writer="wd"),
    ]

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "decided":
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    assert _counts(spark, fact, dim) == (47, 6)  # plain read heals
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))


def test_delete_abort_reclaims_scaffolding_and_vacuum_shields(spark):
    fact, dim = _mk_pair(spark)
    staged = [
        tx.stage_delete_spark(spark, fact,
                              spark.range(0, 4).select("id"),
                              writer="erase"),
        tx.stage_append_spark(
            spark, dim, spark.range(100, 101).select(
                F.col("id").alias("dk"), F.lit("s").alias("seg")),
            writer="wd"),
    ]
    files = ([fact.data_path(d) for d in staged[0]["dvs"].values()]
             + [fact.data_path(staged[0]["keys_file"])])

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "pinned":
            fact.vacuum(min_age_seconds=0.0)  # shield holds while pinned
            assert all(os.path.exists(f) for f in files)
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)
    assert tx.resolve_pending_txn(fact, lease_sec=0.0) == "aborted"
    assert not any(os.path.exists(f) for f in files)
    assert _counts(spark, fact, dim) == (50, 5)


def test_delete_rails_refuse_fk_tables(spark):
    fact, dim = _mk_pair(spark)
    acid.alter_add_foreign_key(spark, fact, "fk_dim",
                               col="fk", parent_path=dim.path)
    with pytest.raises(ValueError, match="FK tables"):
        tx.stage_delete_spark(spark, fact,
                              spark.range(0, 2).select("id"))


def test_table_facade_stage_methods(spark):
    """The Table facade exposes the three participant kinds; one
    commit_together over a merge + an append + a delete across three
    facades lands all-or-none."""
    from distribot_spark.sources import commit_together
    from distribot_spark.sources.table import Table

    fact, dim = _mk_pair(spark)
    third = TableLog(_tmp("txf3_"))
    acid.write_initial_spark(
        spark, third, spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") * 5).alias("w")),
        "k", n_buckets=2)
    tf = Table.for_path(spark, fact.path)
    td = Table.for_path(spark, dim.path)
    tt = Table.for_path(spark, third.path)
    staged = [
        tf.stage_merge(spark.createDataFrame(
            [(0, 0, -1), (600, 0, 6000)],
            "id long, fk long, cents long"), writer="wm"),
        td.stage_append(spark.range(100, 103).select(
            F.col("id").alias("dk"), F.lit("s").alias("seg")),
            writer="wa"),
        tt.stage_delete(spark.range(0, 5).select(F.col("id").alias("k")),
                        writer="wd"),
    ]
    st = commit_together(staged)
    assert len(st["versions"]) == 3
    got = _fact_rows(spark, fact)
    assert (0, -1) in got and (600, 6000) in got
    assert acid.read_snapshot_spark(spark, dim).count() == 8
    assert acid.read_snapshot_spark(spark, third).count() == 15


def test_pre_decide_rebucket_aborts_staged_txn(spark):
    """A REBUCKET landing between staging and commit_together changes
    the gate state (effective layout): the txn must ABORT with the
    re-stage message, never link a rewrite computed under the stale
    modulus."""
    fact, dim = _mk_pair(spark)  # fact: 4 buckets
    staged = _stage_merge_pair(spark, fact, dim)
    acid.optimize_table_spark(spark, fact, "id", 8, "rebucketer",
                              rewrite_all=True)
    assert fact.effective_layout() == ("id", 8)
    with pytest.raises(tx.TxnAborted, match="re-stage"):
        tx.commit_together(staged)
    # nothing published; restage under the new rules lands cleanly
    assert _fact_rows(spark, fact) == {(i, i * 10) for i in range(50)}
    tx.commit_together(_stage_merge_pair(spark, fact, dim))
    assert _fact_rows(spark, fact) == _merged_want()


def test_post_decide_straggler_rebucket_rebases_under_new_layout(spark):
    """The microscopic window: a rebucket whose marker check passed
    BEFORE the pin lands AFTER the decide (forged here by a
    fence-bypassing link + meta flip). The reader-driven roll-forward
    must recompute the delete sidecars under the CURRENT 8-bucket
    layout — the staged 4-bucket pb values would miss files."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    fact, dim = _mk_pair(spark)  # fact: 4 buckets
    staged = [
        tx.stage_delete_spark(spark, fact,
                              spark.range(0, 6).select("id"),
                              writer="erase"),
        tx.stage_append_spark(
            spark, dim, spark.range(100, 101).select(
                F.col("id").alias("dk"), F.lit("s").alias("seg")),
            writer="wd"),
    ]

    class Crash(Exception):
        pass

    def hook(stage):
        if stage == "decided":
            raise Crash

    with pytest.raises(Crash):
        tx.commit_together(staged, _hook=hook)

    # forge the straggler rebucket: rewrite every live file under
    # modulus 8 and link past the marker fence (txn= bypass simulates
    # a writer already past its marker check), then flip the layout
    live, _st, _dv, _hwm = fact._fold_entries(fact.version())
    frames = [pq.read_table(fact.data_path(f)).to_pandas()
              for f in sorted(live)]
    rows = pd.concat(frames, ignore_index=True)
    adds = []
    for b in range(8):
        sub = rows[rows["id"].map(
            lambda k: acid._bucket_of_py(int(k), 8, False)) == b]
        name = fact.new_data_file(b)
        pq.write_table(pa.Table.from_pandas(sub.sort_values("id"),
                                            preserve_index=False),
                       fact.data_path(name))
        adds.append({"file": name, "pb": b})
    assert fact._try_commit_linked(
        fact.version(), adds, sorted(live), "straggler-rebucket",
        txn="fence-bypass")
    with fact._meta_lock():
        m = fact._meta()
        m["n_buckets"] = 8
        fact._persist_meta(m)

    # a plain read resolves the decided txn: the delete rebase must
    # find every key under the NEW modulus
    got = _fact_rows(spark, fact)
    assert got == {(i, i * 10) for i in range(6, 50)}
    assert acid.read_snapshot_spark(spark, dim).count() == 6
    for t in (fact, dim):
        assert not os.path.exists(tx._marker_path(t))
