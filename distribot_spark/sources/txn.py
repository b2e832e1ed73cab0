"""MULTI-TABLE ATOMIC COMMIT — both version links land or neither.

Per-table OCC (the version-link one-winner contract) serializes writers
of ONE log; loading a fact and its dimension atomically needs a commit
that spans TWO logs. The FK epoch fence (sources/acid.py `try_commit`)
already serializes one cross-log pattern (child insert vs parent
delete); this module is the GENERAL primitive the r7 verdict asked for
(task 5, extended in r9 to MERGE and DV-DELETE participants):
``commit_together([stage_append_spark(...), stage_merge_spark(...),
stage_delete_spark(...)])`` lands one staged participant per table
such that a reader — or a crash at ANY point — observes the
transaction on every table or on none.

Protocol (everything goes through the storage seam, so it holds on a
conditional-put-only object store exactly like single-table commits):

1. **Stage**: each participant's artifacts are written as immutable
   files — bucketed data files for appends, the precomputed bucket
   rewrite + raw update rows for merges, DV sidecars + the key list
   for deletes (constraints applied) — nothing is visible, no log is
   touched.
2. **Pin**: a ``_txn.pending.json`` MARKER is created in every
   participant's log dir via atomic ``put_if_absent`` (sorted path
   order, so overlapping transactions fail fast instead of
   deadlocking). The marker carries the FULL plan — every table's
   staged add-list, its log floor, and the outcome object's location —
   so ANY process that encounters it can finish or undo the
   transaction without the coordinator. While a marker is present,
   every other writer's commit attempt on that table returns False
   (`TableLog._try_commit_linked` checks it), which is what guarantees
   the transaction's version slots stay takeable; in-flight writers
   that passed the check before the marker landed can still win a
   slot, and the roll-forward simply retries at the new head — staged
   appends are adds-only, so they commute with any interleaved commit
   (the same argument `append_spark` relies on).
3. **Decide**: ONE ``put_if_absent`` of the OUTCOME object ("commit")
   is the transaction's linearization point. Until it exists, nothing
   has been published anywhere (links only happen after), so a crashed
   transaction older than the lease is safely ABORTED by whoever
   bumps into the marker — also via ``put_if_absent`` of the outcome
   ("abort"), so a slow coordinator racing its own aborter loses the
   race atomically instead of half-committing.
4. **Publish**: each table's commit links with the marker's plan and a
   ``txn`` id in the body. Roll-forward is idempotent under any number
   of concurrent helpers: scan the floor→head window for the txn id,
   link at head+1 only if absent, rescan on a lost race — the
   one-winner link makes duplicates impossible.
5. **Clean**: markers are removed only after every table's link is
   verified landed — a crash mid-cleanup leaves a marker whose next
   resolver re-verifies and finishes. The OUTCOME object is durable on
   both decisions (a vacated path would let a stale resolver win a
   fresh "abort" after a marker it read pre-cleanup — see `_cleanup`).

Readers: `TableLog.snapshot()`/`snapshot_at` resolve a present marker
first (roll the commit forward if decided, no-op if undecided — an
undecided transaction has published NOTHING, so the snapshot is
consistent either way). That is the "a reader pinned mid-commit sees
neither or both" contract, pinned by the oracle query
``source_acid_commit_together`` and the crash tests.

Participant kinds:

- **APPEND** (`stage_append_spark`): staged adds commute with any
  interleaved commit, so roll-forward simply retries at the new head.
- **MERGE** (`stage_merge_spark`, round 9): a keyed upsert is a
  read-modify-write of the touched buckets, so the staged rewrite
  pins the base version it was computed against (``parent``). The
  common path links that precomputed Spark rewrite unchanged — once
  the markers are pinned, no foreign writer can land (the
  `_try_commit_linked` marker fence). The only hazard is a PRE-PIN
  in-flight commit (a "straggler" whose marker check passed before
  the pin landed, or any commit between staging and pinning): it
  moves the head, invalidating the staged rewrite. Roll-forward then
  REBASES — recomputes the touched buckets from the staged RAW
  UPDATE files with pandas/pyarrow, engine-free, so ANY resolver (a
  plain reader, a foreign writer bumping into the marker) can finish
  the transaction without a SparkSession, exactly like the adds-only
  path. The updates files double as the marker plan's self-contained
  description of the merge.

Scope rails (each refused loudly at stage time): tables with FOREIGN
KEYs, IDENTITY columns or UNIQUE constraints don't participate (their
validation loops are single-log by construction), and quarantine-mode
constraints don't either (the dead-letter diversion is not part of
the atomic plan). Cross-log mutation beyond append+merge+delete
(e.g. FK-fenced writes) stays with the single-table paths.

Reference intent: distribot transitions multi-queue state through ONE
shared coordination write (lib/distribot/flow.rb:31-52 — flow state in
Redis, never per-node) rather than per-queue partial updates; this is
that design point applied to table logs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

TXN_MARKER = "_txn.pending.json"

#: age past which an UNDECIDED transaction's holder is presumed dead
#: and any writer bumping into its marker may abort it. Decided
#: transactions are never aborted — they roll forward at any age.
DEFAULT_TXN_LEASE = 60.0


class TxnBusy(RuntimeError):
    """Another multi-table transaction is pinned on a participant (its
    marker is younger than the lease, or decided and mid-publish).
    Staged files are left intact — resolve/retry later."""


class TxnAborted(RuntimeError):
    """This transaction lost the outcome race to an aborter (it
    overran the lease before deciding). Staged files were reclaimed by
    the aborter; re-stage to retry."""


def _marker_path(table) -> str:
    return os.path.join(table.log_dir, TXN_MARKER)


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _stage_prepare(spark, table, df, key, n_buckets):
    """Shared participant rails + row preparation: refuse the
    single-log validation families, apply generated columns and
    fail-mode CHECKs (violations raise — a multi-table load has no
    quarantine commit to ride), translate to physical names, and
    bucket. Returns (up_df_with_pb, physical_key, n_buckets, gate0)."""
    from distribot_spark.sources import acid as _a

    if table.fk_parent_paths() or table.fk_referenced_by():
        raise ValueError(
            "commit_together: FK tables don't participate (their "
            "epoch-fence validation is single-log; run FK writes "
            "through the normal write path)")
    if table.identity():
        raise ValueError(
            "commit_together: IDENTITY tables don't participate (id "
            "reservation re-stages on conflict; the txn link retries "
            "at-head without re-staging)")
    gate0 = _a._gate_state(table)
    _a._fk_take_captures(table)  # drop the (empty) capture: our link
    # path never consumes it, and a stale capture must not poison the
    # caller's next normal write
    key, n_buckets = _a._resolve_layout(table, key, n_buckets)
    if _a._unique_constraints(table, key):
        raise ValueError(
            "commit_together: UNIQUE tables don't participate (the "
            "touched-bucket recheck loop is single-log)")
    df = _a._apply_generated_spark(table, df)
    cons = table.constraints()
    if any(c.get("on_violation") == "quarantine" for c in cons.values()):
        raise ValueError(
            "commit_together: quarantine-mode constraints don't "
            "participate (the dead-letter diversion is not part of "
            "the atomic plan); use fail-mode or the normal write path")
    df = _a._constraint_guard_spark(df, cons)
    df = _a._to_physical_spark(table, df)
    key = table.physical_name(key)
    up = df.withColumn(
        "_pb", _a._bucket_expr(key, n_buckets, table.hash_buckets()))
    return up, key, n_buckets, gate0


def stage_append_spark(spark, table, df, key: str | None = None,
                       n_buckets: int | None = None,
                       writer: str = "txn",
                       stats_cols=()) -> dict:
    """Prepare an append WITHOUT committing: generated columns +
    CHECK constraints applied, rows bucketed and staged as immutable
    data files. Returns the staged entry `commit_together` consumes.
    Nothing is visible until the transaction decides.

    Vacuum interaction: until `commit_together` pins the plan in the
    markers, staged files are protected only by vacuum's min-age rail
    (the same stage-to-link window every writer has) — don't hold a
    staged entry across a vacuum horizon; once a marker exists, its
    plan shields the files explicitly (`TableLog.vacuum`)."""
    from distribot_spark.sources import acid as _a

    up, key, n_buckets, gate0 = _stage_prepare(
        spark, table, df, key, n_buckets)
    stats_cols = tuple(table.physical_name(c) for c in stats_cols)
    staged = _a._stage_bucketed(
        spark, table, up, n_buckets, sort_cols=["_pb", key],
        stats_cols=stats_cols)
    return {"table": table, "adds": staged, "writer": writer,
            "gate": gate0}


def stage_merge_spark(spark, table, df, key: str | None = None,
                      n_buckets: int | None = None,
                      writer: str = "txn",
                      version: str | None = None) -> dict:
    """Prepare a keyed MERGE (upsert) participant WITHOUT committing.

    Stages TWO artifact sets, both invisible until the decide:

    1. the PRECOMPUTED bucket rewrite against the table's current head
       — exactly the file set `merge_upsert_spark`'s first attempt
       stages (anti-join or ``version``-argmax per key, DVs folded,
       one file per touched bucket). This is the cluster-scale path
       and what links when nothing moved underneath (the common case:
       pinned markers block every foreign writer).
    2. the RAW bucketed update rows — the self-contained rebase
       source. If a pre-pin in-flight commit moved the head, roll-
       forward recomputes the touched buckets from these files with
       pandas/pyarrow (`_rebase_merge_pandas`) so ANY resolver can
       finish the transaction engine-free; the precomputed rewrite is
       then reclaimed as an orphan in cleanup.

    ``version`` enables the conditional merge (highest version per key
    wins — idempotent under redelivery), same semantics as
    `merge_upsert_spark`. Same rails as appends (no FK/IDENTITY/
    UNIQUE/quarantine participants); updates should carry the base
    schema (the pandas rebase does not promise schema evolution)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from distribot_spark.sources import acid as _a

    up, key, n_buckets, gate0 = _stage_prepare(
        spark, table, df, key, n_buckets)
    if version is not None:
        version = table.physical_name(version)
    upd_staged = _a._stage_bucketed(
        spark, table, up, n_buckets, sort_cols=["_pb", key])
    touched = sorted({int(e["pb"]) for e in upd_staged})
    # the raw update rows are now MATERIALIZED as staged parquet — the
    # precomputed rewrite below reads them back instead of re-running
    # the caller's update lineage a second time (r9, guide §1.2); _pb
    # is re-derived from the key (same expression, same values)
    if upd_staged:
        up = _a.read_files_merged(
            spark, [table.data_path(e["file"]) for e in upd_staged]
        ).withColumn(
            "_pb", _a._bucket_expr(key, n_buckets, table.hash_buckets()))
    v0, live = table.snapshot()
    bucket_files = {f: b for f, b in live.items() if b in set(touched)}
    dvmap = {f: ds for f, ds in table.live_dvs().items()
             if f in bucket_files}
    up_cols = [c for c in up.columns if c != "_pb"]
    up_types = dict((c, t) for c, t in up.dtypes if c != "_pb")
    paths = [table.data_path(f) for f in sorted(bucket_files)]
    if paths:
        base = _a.read_files_merged(spark, paths)
        base = _a._apply_dvs(spark, table, base, key, dvmap).withColumn(
            "_pb", _a._bucket_expr(key, n_buckets, table.hash_buckets()))
        base_cols = [c for c in base.columns if c != "_pb"]
        base_types = dict(base.dtypes)
        cols = list(dict.fromkeys(base_cols + up_cols))
        bx, ux = base, up
        for c in up_cols:
            if c not in base_cols:
                bx = bx.withColumn(c, F.lit(None).cast(up_types[c]))
        for c in base_cols:
            if c not in up_cols:
                ux = ux.withColumn(c, F.lit(None).cast(base_types[c]))
        if version is None:
            merged = (bx.join(up.select(key), key, "left_anti")
                      .select(*cols, "_pb")
                      .unionByName(ux.select(*cols, "_pb")))
        else:
            both = bx.select(*cols, "_pb").withColumn(
                "_og", F.lit(0)).unionByName(
                ux.select(*cols, "_pb").withColumn("_og", F.lit(1)))
            rn = F.row_number().over(
                W.partitionBy(key).orderBy(
                    F.col(version).desc(), F.col("_og").desc()))
            merged = (both.withColumn("_rn", rn)
                      .filter(F.col("_rn") == 1).select(*cols, "_pb"))
    else:
        merged = up
        if version is not None:
            rn = F.row_number().over(
                W.partitionBy(key).orderBy(F.col(version).desc()))
            merged = (merged.withColumn("_rn", rn)
                      .filter(F.col("_rn") == 1)
                      .select(*up_cols, "_pb"))
    staged = _a._stage_bucketed(
        spark, table, merged, max(len(touched), 1),
        sort_cols=["_pb", key])
    return {"table": table, "kind": "merge", "adds": staged,
            "removes": sorted(bucket_files),
            "updates_files": upd_staged, "parent": v0, "key": key,
            "version_col": version, "n_buckets": n_buckets,
            "writer": writer, "gate": gate0}


def _unlink_quiet(t, names) -> None:
    for n in names:
        try:
            os.unlink(t.data_path(n))
        except FileNotFoundError:
            pass


def _entry_staged_files(e: dict) -> list[str]:
    return ([a["file"] for a in e["adds"]]
            + [u["file"] for u in e.get("updates_files", ())]
            + list((e.get("dvs") or {}).values())
            + ([e["keys_file"]] if e.get("keys_file") else []))


def unstage(entry: dict) -> None:
    """Reclaim a staged entry the caller is abandoning."""
    _unlink_quiet(entry["table"], _entry_staged_files(entry))


def _unstage_plan(plan: dict) -> None:
    from distribot_spark.sources.acid import TableLog

    for e in plan["tables"]:
        _unlink_quiet(TableLog(e["path"]), _entry_staged_files(e))


def _txn_landed_at(table, plan_entry: dict, txn_id: str) -> int | None:
    """The version this table's txn commit landed at, scanning the
    bounded floor→head window (the floor is the table's version when
    the marker was created; nothing about the txn can precede it)."""
    head = table.version()
    for v in range(int(plan_entry["floor"]) + 1, head + 1):
        if table.read_commit(v).get("txn") == txn_id:
            return v
    return None


def stage_delete_spark(spark, table, keys_df, key: str | None = None,
                       n_buckets: int | None = None,
                       writer: str = "txn") -> dict:
    """Prepare a DV-DELETE participant: per-file deletion-vector
    sidecars for ``keys_df``'s keys (existing DVs folded first, so a
    key never lands in two sidecars of one file — the change-feed
    exactly-once rule), plus the raw key list staged as a parquet
    file — the self-contained rebase source. Like the MERGE
    participant, the precomputed sidecars pin their ``parent``
    version; a pre-pin in-flight commit moves the head and roll-
    forward recomputes the sidecars engine-free (the compute reads
    ONE column of the touched buckets' files via pyarrow — the
    `delete_keys_pandas` cost class, fine for sidecar-sized deletes;
    split giant deletes into multiple txns). Same rails as the other
    participants. The delete commits as a pure DV attach (no adds, no
    removes), so the atomic fact-correction + dim-append +
    key-erasure load is one decide."""
    from distribot_spark.sources import acid as _a

    # rails: only the FK refusal applies — a pure DV attach adds no
    # rows (UNIQUE/quarantine/identity can't be violated by it), but
    # RESTRICT validation + removal epochs are single-log, so FK
    # tables keep using delete_keys_spark
    if table.fk_parent_paths() or table.fk_referenced_by():
        raise ValueError(
            "commit_together: FK tables don't participate (RESTRICT "
            "validation and removal epochs are single-log; run FK "
            "deletes through delete_keys_spark)")
    table._add_feature("deletion-vectors")  # reader gate, pre-commit
    gate0 = _a._gate_state(table)
    _a._fk_take_captures(table)
    key, n_buckets = _a._resolve_layout(table, key, n_buckets)
    kdf = _a._to_physical_spark(table, keys_df)
    key = table.physical_name(key)
    keys = sorted({int(r[0]) for r in kdf.select(key).distinct()
                   .collect()})
    import pyarrow as pa
    import pyarrow.parquet as pq

    keys_file = table.new_data_file(0)
    pq.write_table(pa.table({key: keys}), table.data_path(keys_file))
    v0 = table.version()
    dvs, n_hit = _compute_delete_dvs(table, keys, key, n_buckets)
    return {"table": table, "kind": "delete", "adds": [],
            "dvs": dvs, "keys_file": keys_file, "parent": v0,
            "key": key, "n_buckets": n_buckets, "writer": writer,
            "gate": gate0, "deleted_rows": n_hit}


def _compute_delete_dvs(table, keys: list[int], key: str,
                        n_buckets: int) -> tuple[dict, int]:
    """Engine-free sidecar computation against the CURRENT head (the
    `delete_keys_pandas` inner loop): fold existing DVs, find each
    touched file's hit keys, write one sidecar per hit file. Reads the
    live set via `_fold_entries` directly — `snapshot()` would resolve
    our own pending marker and recurse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distribot_spark.sources import acid as _a

    kset = set(keys)
    touched = {_a._bucket_of_py(k, n_buckets, table.hash_buckets())
               for k in kset}
    live, _stats, dvall, _hwm = table._fold_entries(table.version())
    bucket_files = {f: b for f, b in live.items() if b in touched}
    dvs, n_hit = {}, 0
    for f in sorted(bucket_files):
        frame = _a._arrow_minus_dvs(
            table, f, dvall.get(f, ()), columns=[key]).to_pandas()
        hit = frame[frame[key].isin(kset)]
        if hit.empty:
            continue
        name = table.new_dv_file()
        pq.write_table(
            pa.table({"_df": [f] * len(hit), key: hit[key].tolist()}),
            table.data_path(name))
        dvs[f] = name
        n_hit += len(hit)
    return dvs, n_hit


def _current_n_buckets(table, plan_entry: dict) -> int:
    """The bucket count a REBASE must use: the table's CURRENT
    persisted layout — a pre-pin in-flight REBUCKET may have landed
    after staging, and computing buckets under the plan's stale count
    would misplace rows / miss files. Falls back to the plan's count
    for tables whose layout was passed explicitly at stage time (no
    persisted layout to drift). The physical KEY is stable either way
    (renames remap logical names only; files keep physical names)."""
    from distribot_spark.sources import acid as _a

    try:
        _, n = _a._resolve_layout(table, None, None)
        return int(n)
    except ValueError:
        return int(plan_entry["n_buckets"])


def _rebase_merge_pandas(table, e: dict) -> tuple[list[dict], list[str]]:
    """Engine-free recompute of a MERGE participant's touched buckets
    against the table's CURRENT head, from the staged raw update files
    — the `merge_upsert_pandas` fold without the identity machinery
    (identity tables are refused at stage time). Used only when a
    pre-pin in-flight commit moved the head past the staged rewrite's
    parent; any resolver (no SparkSession) can run it. Reads the live
    set via `_fold_entries` directly — `snapshot()` would resolve our
    own pending marker and recurse."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distribot_spark.sources.acid import _bucket_of_py as _bucket_of_py_

    key = e["key"]
    version = e.get("version_col")
    parts = []
    for uf in e["updates_files"]:
        parts.append(pq.read_table(table.data_path(uf["file"]))
                     .to_pandas())
    up = pd.concat(parts, ignore_index=True)
    # buckets are recomputed under the table's CURRENT layout, not the
    # staged pb values — a pre-pin in-flight REBUCKET may have landed
    n_buckets = _current_n_buckets(table, e)
    hashed = table.hash_buckets()
    up["_pb"] = up[key].astype("int64").map(
        lambda k: _bucket_of_py_(k, n_buckets, hashed))
    touched = sorted({int(b) for b in up["_pb"].unique()})
    live, _stats, dvall, _hwm = table._fold_entries(table.version())
    bucket_files = {f: b for f, b in live.items() if b in set(touched)}
    dvmap = {f: ds for f, ds in dvall.items() if f in bucket_files}

    def _read_minus_dv(f):
        fr = pq.read_table(table.data_path(f)).to_pandas()
        for d in dvmap.get(f, ()):
            dead = set(pq.read_table(table.data_path(d)).to_pandas()[key])
            fr = fr[~fr[key].isin(dead)]
        return fr

    staged, removes = [], sorted(bucket_files)
    for b in touched:
        names = [f for f, bb in sorted(bucket_files.items()) if bb == b]
        base = (pd.concat([_read_minus_dv(f) for f in names],
                          ignore_index=True)
                if names else up.iloc[0:0].drop(columns=["_pb"]))
        u = up[up["_pb"] == b].drop(columns=["_pb"])
        if version is None:
            keep = base[~base[key].isin(set(u[key]))]
            merged = pd.concat([keep, u], ignore_index=True)
        else:
            merged = (pd.concat([base, u], ignore_index=True)
                      .sort_values([key, version], kind="stable")
                      .drop_duplicates(key, keep="last"))
        merged = merged.sort_values(key).reset_index(drop=True)
        name = table.new_data_file(b)
        pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                       table.data_path(name))
        staged.append({"file": name, "pb": b})
    return staged, removes


def _txn_link(table, plan_entry: dict, txn_id: str) -> int:
    """Idempotently land one table's txn commit: already-landed wins,
    else link at head+1 and rescan on a lost race. Safe under any
    number of concurrent helpers — the version link is one-winner and
    every helper rescans before retrying, so the txn body lands
    EXACTLY once. Staged adds commute with interleaved commits
    (adds-only), so retry-at-head never invalidates the plan; a MERGE
    entry whose head moved past its staged parent is REBASED from the
    staged update files (pandas, engine-free) before linking, and a
    helper that loses a race reclaims its own rebase files before
    rescanning."""
    rebased: list[str] | None = None  # our own rebase files, if any
    while True:
        v = _txn_landed_at(table, plan_entry, txn_id)
        if v is not None:
            if rebased is not None:  # another helper won: reclaim ours
                _unlink_quiet(table, rebased)
            return v
        head = table.version()
        kind = plan_entry.get("kind")
        stale = head != int(plan_entry.get("parent", head))
        dvs = None
        if kind == "merge" and stale:
            if rebased is not None:
                _unlink_quiet(table, rebased)
            adds, removes = _rebase_merge_pandas(table, plan_entry)
            rebased = [a["file"] for a in adds]
        elif kind == "delete":
            if stale:
                if rebased is not None:
                    _unlink_quiet(table, rebased)
                import pyarrow.parquet as pq

                keys = pq.read_table(
                    table.data_path(plan_entry["keys_file"])
                ).to_pandas()[plan_entry["key"]].tolist()
                dvs, _n = _compute_delete_dvs(
                    table, keys, plan_entry["key"],
                    _current_n_buckets(table, plan_entry))
                rebased = list(dvs.values())
            else:
                dvs = dict(plan_entry["dvs"])
            adds, removes = [], []
        else:
            adds = plan_entry["adds"]
            removes = list(plan_entry.get("removes", ()))
        if table._try_commit_linked(head, adds, removes,
                                    plan_entry["writer"], dvs=dvs,
                                    txn=txn_id):
            return head + 1


def _remove_markers(plan: dict, txn_id: str) -> None:
    """Remove every participant's marker IF it still belongs to this
    txn (a successor txn may have re-pinned a table already)."""
    from distribot_spark.sources.acid import TableLog

    for e in plan["tables"]:
        mp = _marker_path(TableLog(e["path"]))
        m = _read_json(mp)
        if m and m.get("txn") == txn_id:
            try:
                os.unlink(mp)
            except FileNotFoundError:
                pass


def _cleanup(plan: dict, txn_id: str) -> None:
    """COMMIT-path cleanup: markers removed only after verifying every
    table's link landed. The OUTCOME object is DURABLE on BOTH
    decisions — never unlinked. Deleting a commit outcome would vacate
    the one-winner decision path: a stalled resolver that read a
    participant's marker BEFORE this cleanup removed it, then reads the
    outcome AFTER the unlink (plan ts past the lease — exactly the
    slow-resolver window the protocol supports), would win
    ``put_if_absent(outcome, "abort")`` on the vacated path and
    ``_unstage_plan`` data files already linked into commits. One tiny
    json per transaction in the first participant's log dir is the
    price of closing that window, symmetric with the durable ABORT
    outcome (`resolve_pending_txn`)."""
    from distribot_spark.sources.acid import TableLog

    for e in plan["tables"]:
        t = TableLog(e["path"])
        v = _txn_landed_at(t, e, txn_id)
        if v is None:
            # never strip markers without the verification (an assert
            # would vanish under python -O)
            raise RuntimeError(
                f"txn {txn_id}: link not landed on {e['path']} — "
                "refusing to remove markers")
        if e.get("kind") == "merge":
            # reclaim merge scaffolding: the raw update files (rebase
            # source, now folded into a landed commit) and — when the
            # landed commit carries a REBASE — the superseded
            # precomputed rewrite. Concurrent cleanups race these
            # unlinks harmlessly (FileNotFoundError suppressed).
            landed = {a["file"] for a in t.read_commit(v)["adds"]}
            _unlink_quiet(t, [a["file"] for a in e["adds"]
                              if a["file"] not in landed])
            _unlink_quiet(t, [u["file"] for u in e["updates_files"]])
        elif e.get("kind") == "delete":
            # reclaim the key list and any superseded precomputed
            # sidecars (a rebase landed different ones)
            landed_dvs = set(
                (t.read_commit(v).get("dvs") or {}).values())
            _unlink_quiet(t, [d for d in (e.get("dvs") or {}).values()
                              if d not in landed_dvs])
            _unlink_quiet(t, [e["keys_file"]])
    _remove_markers(plan, txn_id)


def resolve_pending_txn(table, lease_sec: float = DEFAULT_TXN_LEASE,
                        reader: bool = False) -> str:
    """Resolve this table's pending-transaction marker, if any.

    Returns one of:

    - ``"none"``      — no marker; nothing to do.
    - ``"inflight"``  — undecided and young (or ``reader=True``): an
      undecided txn has PUBLISHED NOTHING (links strictly follow the
      outcome), so readers proceed safely and writers back off.
    - ``"committed"`` — decided commit: this call rolled every
      participant forward and cleaned up. Idempotent, any number of
      concurrent helpers.
    - ``"aborted"``   — undecided past the lease (or already-aborted):
      this call won (or observed) the abort outcome, reclaimed the
      staged files and removed the markers. The ABORT outcome object
      itself is DURABLE — never deleted — because it is the only thing
      standing between a stalled-then-resuming coordinator and a
      catastrophic revival: with the path vacated, the coordinator's
      ``put_if_absent(outcome, "commit")`` would succeed and publish
      links whose staged files the aborter already reclaimed. One tiny
      json per aborted txn in the first participant's log dir is the
      price of that guarantee.
    """
    from distribot_spark.sources.acid import TableLog

    plan = _read_json(_marker_path(table))
    if plan is None:
        return "none"
    txn_id = plan["txn"]
    out = _read_json(plan["outcome"])
    if out is None:
        if reader or (time.time() - float(plan["ts"])) < lease_sec:
            return "inflight"
        # stale undecided holder: race for the abort — one winner,
        # and a slow coordinator deciding "commit" concurrently
        # atomically beats or loses to us
        table.storage.put_if_absent(
            plan["outcome"], json.dumps({"decision": "abort"}).encode())
        out = _read_json(plan["outcome"])
        if out is None:  # unreachable now that outcomes are durable on
            # both decisions; kept for logs written by older builds
            # whose commit-path cleanup unlinked the outcome
            return "committed"
    if out["decision"] == "commit":
        for e in plan["tables"]:
            _txn_link(TableLog(e["path"]), e, txn_id)
        _cleanup(plan, txn_id)
        return "committed"
    _unstage_plan(plan)
    _remove_markers(plan, txn_id)
    # the abort outcome stays — deliberately (see docstring)
    return "aborted"


def txn_snapshot(tables: list, max_attempts: int = 50) -> dict[str, int]:
    """A CONSISTENT CROSS-TABLE CUT: per-table versions {path: v} such
    that every multi-table transaction is included on ALL its
    participants or on NONE — the read-side completion of
    `commit_together` (two independent `version()` calls can split a
    transaction mid-publish, or bracket one that landed between them).

    Double-read fence: resolve any pending markers (rolling DECIDED
    ones forward), capture every version, then verify no marker is
    decided and no version moved. Why that suffices: a transaction can
    only SPLIT a cut while mid-publish — some links landed, some not —
    and through that whole window it holds markers whose outcome
    object exists; an UNDECIDED marker has published nothing anywhere
    (links strictly follow the outcome), so the cut excludes it wholly
    and it is harmless — which also means a long-running staging txn
    never blocks readers. A txn that decides inside the fence window
    either landed a link (a version moved → retry) or not (the cut
    still excludes it wholly). Lock-free and read-only in the common
    case — retries only while publishes are actively landing."""

    def _decided(t) -> bool:
        plan = _read_json(_marker_path(t))
        return (plan is not None
                and _read_json(plan["outcome"]) is not None)

    for _ in range(max_attempts):
        for t in tables:
            resolve_pending_txn(t, reader=True)  # helping moves
            # versions, which the fence below then re-reads
        cut = {t.path: t.version() for t in tables}
        if (not any(_decided(t) for t in tables)
                and all(t.version() == cut[t.path] for t in tables)):
            return cut
    raise TxnBusy(
        f"no quiescent window in {max_attempts} attempts — publishes "
        "are landing continuously; widen max_attempts")


def commit_together(staged: list[dict],
                    lease_sec: float = DEFAULT_TXN_LEASE,
                    spark=None, _hook=None) -> dict:
    """Atomically commit the staged appends — every table or none.

    ``spark`` (optional) lets participants honor their write-path
    auto-compaction policy (`TableLog.init(auto_optimize=n)`) after the
    transaction publishes — compaction rides its own commits, outside
    the atomic plan, exactly like the normal append path.

    ``_hook(stage_name)`` is the crash-test seam (raising inside it
    simulates a coordinator dying at that point; the protocol's
    recovery paths are tested through it). Raises `TxnBusy` (staged
    files kept; retry) or `TxnAborted` (staged files reclaimed by the
    aborter; re-stage)."""
    from distribot_spark.sources import acid as _a

    tables = [e["table"] for e in staged]
    paths = [t.path for t in tables]
    if len(set(paths)) != len(paths):
        raise ValueError("commit_together: duplicate table")
    if len(staged) < 2:
        raise ValueError("commit_together needs >= 2 tables (use the "
                         "normal write path for one)")
    order = sorted(range(len(staged)), key=lambda i: paths[i])
    txn_id = uuid.uuid4().hex
    first = tables[order[0]]
    outcome_path = os.path.join(first.log_dir,
                                f"_txn.outcome.{txn_id}.json")
    def _plan_entry(i: int) -> dict:
        e = {"path": tables[i].path,
             "floor": tables[i].version(),
             "adds": staged[i]["adds"],
             "writer": f"{staged[i]['writer']}:txn:{txn_id[:8]}"}
        if staged[i].get("kind") == "merge":
            # the full self-contained merge description: any resolver
            # can link the precomputed rewrite or rebase from the
            # staged update files without the coordinator
            for k in ("kind", "removes", "updates_files", "parent",
                      "key", "version_col", "n_buckets"):
                e[k] = staged[i][k]
        elif staged[i].get("kind") == "delete":
            for k in ("kind", "dvs", "keys_file", "parent", "key",
                      "n_buckets"):
                e[k] = staged[i][k]
        return e

    plan = {
        "txn": txn_id,
        "ts": time.time(),
        "outcome": outcome_path,
        "tables": [_plan_entry(i) for i in order],
    }
    body = json.dumps(plan).encode()

    pinned: list = []
    for i in order:
        t = tables[i]
        st = resolve_pending_txn(t, lease_sec=lease_sec)
        if st == "inflight" or not t.storage.put_if_absent(
                _marker_path(t), body):
            for p in pinned:  # release OUR markers only
                m = _read_json(_marker_path(p))
                if m and m.get("txn") == txn_id:
                    try:
                        os.unlink(_marker_path(p))
                    except FileNotFoundError:
                        pass
            raise TxnBusy(
                f"another multi-table txn is pinned on {t.path}")
        pinned.append(t)
    if _hook:
        _hook("pinned")

    # rules drift since staging? (the same gate every writer re-checks)
    for i in order:
        t = tables[i]
        if _a._gate_state(t) != staged[i]["gate"]:
            _a._fk_take_captures(t)
            resolve_pending_txn(t, lease_sec=0)  # abort ourselves
            raise TxnAborted(
                f"table rules changed under the staged txn ({t.path}) "
                "— re-stage under the new rules")
        _a._fk_take_captures(t)

    if not first.storage.put_if_absent(
            outcome_path, json.dumps({"decision": "commit"}).encode()):
        # a lost decide race means a lease-expired resolver beat us —
        # the ONLY other writer of this object writes "abort". Anything
        # but an explicit "commit" (including an unreadable object)
        # must abort: falling through would publish links whose staged
        # files the aborter already reclaimed.
        out = _read_json(outcome_path)
        if not out or out.get("decision") != "commit":
            resolve_pending_txn(first, lease_sec=lease_sec)
            raise TxnAborted(
                "txn was aborted by a lease-expired resolver before "
                "it decided — re-stage")
    if _hook:
        _hook("decided")

    versions = {}
    for n, e in enumerate(plan["tables"]):
        versions[e["path"]] = _txn_link(
            tables[order[n]], e, txn_id)
        if _hook:
            _hook(f"linked:{n}")
    _cleanup(plan, txn_id)
    if spark is not None:
        from distribot_spark.sources.acid import _maybe_auto_compact_spark

        for e in staged:
            _maybe_auto_compact_spark(spark, e["table"],
                                      e["writer"])
    return {"txn": txn_id, "versions": versions}
