"""Multi-writer ACID table commits on plain parquet.

The reference's durability story is shared mutable state that stays
correct under many concurrent writers (flow.rb:31-52 — every daemon
mutates one Redis hash; connector.rb:59 — durable queues absorb
competing producers). The repo's *flow* state already has that property
via the claim table's conditional-create one-winner discipline
(flow/state.py, through the storage seam). This module extends the same discipline to DATA TABLE
writes, so two engine processes can MERGE into one table concurrently
with serializable outcomes — the capability Delta/Iceberg would provide,
rebuilt from the one primitive the sandbox has (no `delta` package here;
see tests/test_format_canaries.py for the auto-activating Delta twin).

Design (a minimal Delta-style log):

- ``data/`` holds immutable parquet files, each covering exactly ONE
  key bucket, named by uuid — writers never modify a file in place, so
  uncommitted work is invisible and torn writes are impossible.
- ``_log/v{N:012d}.json`` is commit N: ``{parent, adds, removes,
  writer}``. It is created tmp-then-``os.link`` — link(2) is atomic and
  fails if the target exists, so exactly one writer wins each version
  (the flow/state.py:367 claim primitive; maps to a conditional PUT on
  an object store). The live file set at version V is the fold of
  adds∖removes over v0..vV.
- Every CHECKPOINT_EVERY commits the winner also writes
  ``v{N}.checkpoint.json`` with the full live set, so a snapshot reads
  O(CHECKPOINT_EVERY) log files, not O(V) — the Delta `_last_checkpoint`
  pattern, which is what keeps log replay flat at millions of commits.

MERGE protocol (optimistic concurrency):

1. read snapshot (version V, live files);
2. compute the merged content of the TOUCHED buckets only and write it
   as new data files (cost scales with the update set, not the table);
3. try to commit V+1 removing the replaced bucket files and adding the
   new ones;
4. on losing V+1: re-read the snapshot. If no committed-in-between
   version touched our buckets (all our `removes` still live), RE-COMMIT
   the same files at the next version — no recompute, the cheap
   disjoint-writer path. Otherwise recompute step 2 against the new
   snapshot (rebase) and retry.

No lost updates: every commit names its parent snapshot; a writer whose
parent moved either proves bucket-disjointness or rebases. Two writers
upserting interleaved key sets therefore serialize to the same state as
any sequential order (upserts on distinct keys commute), which
tests/test_table_acid.py proves with two OS processes.

Buckets use ``pmod(key, n_buckets)`` — portable across Spark / DuckDB /
pandas so every engine (and the hash oracle) agrees on file boundaries.
At 100 TB the bucket fn would be ``pmod(xxhash64(key), n)`` for skew
resistance; modulo keeps the demo engine-portable, the protocol is
identical.
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import shutil
import threading
import time
import uuid

from distribot_spark.sources import storage as storage_mod

CHECKPOINT_EVERY = 10

# Files younger than this are never vacuumed: the OCC protocol stages data
# files in data/ BEFORE try_commit, so an in-flight writer's staged files
# are indistinguishable from crash debris until its commit lands. The age
# guard is Delta's `deletedFileRetentionDuration` default (scaled to the
# demo); tests pass 0.0 explicitly when no concurrent writer can exist.
DEFAULT_VACUUM_MIN_AGE = 600.0


def _pmod(x: int, n: int) -> int:
    return ((x % n) + n) % n


# XXH64 of one 8-byte little-endian block, seed 42 — bit-identical to
# Spark's `xxhash64(CAST(k AS BIGINT))` (XxHash64Function.hashLong), so
# the JVM-free pandas clients and Spark writers agree on hash-bucket
# boundaries; pinned against F.xxhash64 in tests/test_table_acid.py.
_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_long(v: int, seed: int = 42) -> int:
    x = v & _M64  # two's-complement view of the long
    h = (seed + _XP5 + 8) & _M64
    h ^= (_rotl64((x * _XP2) & _M64, 31) * _XP1) & _M64
    h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h  # signed, like Spark


def _resolve_layout(table: "TableLog", key: str | None,
                    n_buckets: int | None) -> tuple[str, int]:
    """Fill in the merge key / bucket count from the table's persisted
    layout metadata when the caller didn't pass them. An explicit
    argument always wins (rebucket passes a NEW count on purpose);
    neither passed nor persisted is a hard error — guessing a bucket
    count would silently corrupt merges."""
    if key is None or n_buckets is None:
        pkey, pn = table.effective_layout()
        key = key if key is not None else pkey
        n_buckets = n_buckets if n_buckets is not None else pn
    if key is None or n_buckets is None:
        raise ValueError(
            f"table {table.path} has no persisted layout; pass "
            "key/n_buckets explicitly (or recreate via "
            "write_initial_spark, which persists them)"
        )
    return key, int(n_buckets)


def _fk_note_seen(table: "TableLog", parent_path: str,
                 epoch: int) -> None:
    """Record, for THIS thread, the parent epoch a validation ran
    against. Thread-local because a TableLog may be shared across
    threads (the meta lock's reentrancy contract) and one thread's
    capture must never vouch for another's validation; consumed
    one-shot by `try_commit` so a stale capture can poison at most one
    commit attempt (which then recaptures through the gate)."""
    tls = getattr(table, "_fk_tls", None)
    if tls is None:
        tls = table._fk_tls = {}
    ent = tls.setdefault(threading.get_ident(), {})
    ent.setdefault("seen", {})[parent_path] = int(epoch)


def _fk_note_ref(table: "TableLog", epoch: int) -> None:
    tls = getattr(table, "_fk_tls", None)
    if tls is None:
        tls = table._fk_tls = {}
    tls.setdefault(threading.get_ident(), {})["ref"] = int(epoch)


def _fk_take_captures(table: "TableLog") -> dict:
    """Pop this thread's FK captures (one-shot consume)."""
    tls = getattr(table, "_fk_tls", None)
    if not tls:
        return {}
    return tls.pop(threading.get_ident(), {}) or {}


def _gate_state(table: "TableLog", removal: bool = False) -> tuple:
    """What a writer must re-check before every commit attempt: the
    constraint revision, the COLUMN-MAPPING revision, the effective
    layout — and the FK fence epochs. Any changing mid-flight means the
    write was prepared under stale table rules — the gate aborts the
    attempt and the wrapper re-runs the whole write (a batch translated
    under a superseded mapping would commit columns under names a
    concurrent RENAME just retired). The effective-layout check is what
    makes a rebucketing OPTIMIZE safe against concurrent writers: its
    rewrite commit bumps the version (losing writers retry), and the
    retry's gate sees the landed rebucket and restarts under the new
    count instead of mis-selecting files laid out under the new one.

    FK fences: for a CHILD table the gate carries each parent's
    ``fk_del_epoch`` — a parent DELETE landing mid-flight restarts the
    write, which re-validates membership against the new parent state.
    For a key-REMOVING op on a PARENT (``removal=True``:
    delete/purge paths only — plain writes to a parent don't care
    about child refs) it carries the table's own ``fk_ref_epoch`` — a
    child commit landing mid-flight restarts the removal, which re-runs
    the restrict scan. The gate's LAST read of these epochs is cached
    on the instance; `try_commit` verifies them once more UNDER the
    meta locks, closing the check-to-link window (cross-log write skew
    needs a shared serialization point — the parent's meta lock)."""
    fk = tuple(
        (p, TableLog(p).fk_del_epoch()) for p in table.fk_parent_paths())
    for p, e in fk:
        _fk_note_seen(table, p, e)
    own: tuple = ()
    if removal:
        # ALWAYS capture on removals, even with no registered children:
        # a concurrent ALTER ADD FOREIGN KEY bumps fk_ref_epoch when it
        # registers the back-reference, so the fence catches an FK
        # being born mid-delete (no refs at scan time is not no refs
        # at link time)
        r = table.fk_ref_epoch()
        _fk_note_ref(table, r)
        own = ("_ref", r, len(table.fk_referenced_by()))
    return (table.constraints_rev(), table.mapping_rev(), fk, own) + tuple(
        table.effective_layout())


#: Writer planning flips from the driver JSON fold to a Spark job over
#: the parquet-checkpoint manifest once the checkpoint JSON outgrows
#: this (~80k live files): below it a JSON parse beats a job's ~0.2 s
#: scheduling constant; above it the fold is the planning bottleneck
#: (scaling.py --vacuum measures the same crossover for vacuum).
PLAN_VIA_MANIFEST_MIN_BYTES = 8 << 20


def _manifest_plan_eligible(table: "TableLog") -> bool:
    """True when writer planning should run as a manifest Spark job:
    a parquet checkpoint exists and its JSON twin has outgrown
    `PLAN_VIA_MANIFEST_MIN_BYTES` (below that a driver JSON parse
    beats a job's scheduling constant)."""
    v0 = table.version()
    if v0 < 0:
        return False
    from . import manifest as _mf

    ck = _mf.newest_checkpoint_parquet(table, v0)
    if ck <= 0:
        return False
    try:
        return (os.path.getsize(table._checkpoint_path(ck))
                >= PLAN_VIA_MANIFEST_MIN_BYTES)
    except OSError:
        return False


def _plan_bucket_state(spark, table: "TableLog", touched):
    """Planning state for a bucket-scoped writer: ``(head version,
    {file: bucket} of the touched buckets, {file: dv list})``. Driver
    JSON fold for small tables; a Spark job over the parquet-checkpoint
    manifest once the checkpoint outgrows `PLAN_VIA_MANIFEST_MIN_BYTES`
    (the purge-planner discipline applied to the WRITE path) — the
    driver then never materializes a row per live file, so a merge's
    planning cost is O(touched buckets), not O(table). Both paths are
    pinned state-identical by tests/test_writer_manifest_planning.py."""
    if spark is not None and _manifest_plan_eligible(table):
        from . import manifest as _mf

        return _mf.bucket_files_manifest(spark, table, touched)
    v, live = table.snapshot()
    bucket_files = {f: b for f, b in live.items() if b in touched}
    dvmap = {f: ds for f, ds in table.live_dvs().items()
             if f in bucket_files}
    return v, bucket_files, dvmap


def _bucket_of_py(k: int, n_buckets: int, hashed: bool) -> int:
    """Python-side bucket id — MUST agree with `_bucket_expr`."""
    return _pmod(_xxh64_long(int(k)) if hashed else int(k), n_buckets)


def _bucket_expr(key: str, n_buckets: int, hashed: bool):
    """Spark-side bucket id column. ``hashed`` is the skew-resistant
    mode: `pmod(xxhash64(key), n)` spreads a clustered/hot key domain
    (sequential ids, one dominant tenant) uniformly across buckets, so
    writers touching disjoint keys rarely collide on a bucket and OCC
    conflicts stay rare — the 100 TB default. Plain modulo stays the
    engine-portable demo default (DuckDB can reproduce it, so hash
    oracles can cross file boundaries)."""
    from pyspark.sql import functions as F

    col = F.col(key).cast("long")
    if hashed:
        col = F.xxhash64(col)
    return F.pmod(col, F.lit(n_buckets)).cast("int")


class CommitConflict(Exception):
    """Another writer committed this version first."""


class _ConstraintsChanged(Exception):
    """Internal: an ALTER landed between this writer's constraint
    application and its commit attempt — the staged files are already
    unlinked; the public wrapper removes the now-stale quarantine
    output (carried here) and re-runs the whole write so the NEW
    constraint set is what gets enforced."""

    def __init__(self, qdir: str | None) -> None:
        super().__init__("constraint set changed mid-write")
        self.qdir = qdir


def _reapply_on_constraint_change(fn):
    """Wrap a writer so an ALTER racing it restarts the write under the
    new constraint set (bounded — repeated ALTERs starve the writer the
    same way repeated commits do, so the same exception). The stale
    quarantine directory from the aborted attempt is removed first:
    rows it diverted may be legal under the new set (or will be
    re-diverted), and leaving it would double-report them."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        for _ in range(5):
            try:
                return fn(*args, **kwargs)
            except _ConstraintsChanged as e:
                if e.qdir:
                    shutil.rmtree(e.qdir, ignore_errors=True)
        raise CommitConflict("constraint set changed on every attempt")
    return wrapper


class SnapshotExpired(Exception):
    """The requested version is older than the retention horizon set by
    `expire_snapshots` — its data files may have been vacuumed, so the
    read fails HERE with the version and horizon in hand, not later with
    a bare parquet FileNotFound (Delta's versionAsOf-after-VACUUM
    contract)."""


#: every feature THIS build's readers know how to fold. A table whose
#: persisted `features` list exceeds this set was written by a newer
#: (or foreign) client; folding it anyway would silently miscount —
#: readers refuse loudly instead (Delta's readerFeatures contract).
SUPPORTED_READER_FEATURES = frozenset({
    "deletion-vectors",             # key-addressed DV sidecars
    "positional-deletion-vectors",  # dvp- bitmap sidecars
    "column-mapping",               # logical->physical rename/drop
    "access-policies",              # masks + row filters
    "hash-buckets",                 # xxhash64 bucket function
})


class UnsupportedTableFeature(RuntimeError):
    """The table uses an on-disk feature this reader does not
    understand (its meta `features` list exceeds the reader's
    supported set). Upgrade the client — folding anyway would
    silently produce wrong rows, not an error."""


def _check_reader_features(table: "TableLog",
                           supported=None) -> None:
    sup = (SUPPORTED_READER_FEATURES if supported is None
           else frozenset(supported))
    unknown = sorted(set(table.features()) - sup)
    if unknown:
        raise UnsupportedTableFeature(
            f"table {table.path} requires reader features {unknown} "
            f"this client does not support (supported: {sorted(sup)}) "
            "— upgrade the client; refusing to fold a snapshot that "
            "would silently miscount")


class TableLog:
    """Versioned parquet table with atomic multi-process commits.

    Commit-critical storage operations (the version-link create, the
    clone/export bring, replay-order stamping) go through the
    :mod:`distribot_spark.sources.storage` seam: ``storage_backend``
    pins this table to a named backend; None resolves the process
    default lazily per operation (so a test-wide override applies to
    already-constructed instances)."""

    def __init__(self, path: str, storage_backend: str | None = None) -> None:
        self._storage_name = storage_backend
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.data_dir = os.path.join(path, "data")

    @property
    def storage(self):
        from distribot_spark.sources import storage as _storage

        return _storage.get_backend(self._storage_name)

    # -- log primitives ---------------------------------------------------

    def init(self, hash_buckets: bool = False,
             constraints: dict | None = None,
             key: str | None = None,
             n_buckets: int | None = None,
             generated: dict | None = None,
             identity: dict | None = None,
             auto_optimize: int | None = None) -> None:
        """Create the table directories and persist immutable table
        options. ``hash_buckets=True`` switches the bucket function to
        `pmod(xxhash64(key), n)` for skew resistance — recorded in
        ``_log/_table.json`` so EVERY writer (Spark or pandas, any
        process) derives the same file boundaries; a bucket-function
        mismatch would silently corrupt merge semantics, so it is table
        metadata, not a per-call argument.

        ``constraints`` are CHECK constraints (Delta's ``ALTER TABLE
        ADD CONSTRAINT``, fixed at creation here): ``{name: {"col": c,
        "not_null": bool, "min": x, "max": x, "isin": [...]}}`` — a
        deliberately PORTABLE predicate DSL so the Spark writers
        (enforced executor-side inside the stage job, no extra pass)
        and the JVM-free pandas clients reject the same rows. A write
        carrying a violating row FAILS before staging lands in the
        log; range checks pass NULL unless not_null is also set
        (SQL CHECK semantics).

        ``key``/``n_buckets`` persist the TABLE LAYOUT: the merge key
        and bucket count every writer and reader must agree on. Once
        persisted, all free functions and the `Table` facade resolve
        them from metadata (`_resolve_layout`) so callers stop
        hand-coordinating the one number a mismatch on silently
        corrupts merges. Tables created before the fields existed keep
        working — their callers pass the layout explicitly, as before.
        """
        for n, c in (constraints or {}).items():
            if c.get("foreign_key"):
                raise ValueError(
                    f"constraint {n!r}: FOREIGN KEYs cannot be declared "
                    "at CREATE — the parent back-reference and the "
                    "existing-rows validation only happen through "
                    "alter_add_foreign_key (one-sided enforcement "
                    "would skip the RESTRICT scan)")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        meta = os.path.join(self.log_dir, "_table.json")
        if not os.path.exists(meta):
            body = {"hash_buckets": bool(hash_buckets),
                    "constraints": constraints or {}}
            if hash_buckets:
                # reader gate: a modulo-bucketed client point-pruning
                # this table would read the wrong files
                body["features"] = ["hash-buckets"]
            if key is not None:
                body["key"] = key
            if n_buckets is not None:
                body["n_buckets"] = int(n_buckets)
            if generated:
                body["generated"] = generated
            if identity:
                body["identity"] = identity
            if auto_optimize:
                body["auto_optimize_files_per_bucket"] = int(auto_optimize)
            tmp = meta + f".tmp{uuid.uuid4().hex[:6]}"
            with open(tmp, "w") as fh:
                json.dump(body, fh)
            os.replace(tmp, meta)

    def _meta(self) -> dict:
        try:
            with open(os.path.join(self.log_dir, "_table.json")) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    def auto_optimize(self) -> int | None:
        """The persisted AUTO-COMPACTION target (files per bucket), or
        None when the table relies on explicit OPTIMIZE. With it set,
        append writers that push a touched bucket past 2x the target
        run a scoped bin-pack back down to the target as a follow-up
        OCC commit — Delta's autoCompact: the small-file debt streaming
        appends accrue is repaid inline, amortized one compaction per
        `target` appends by the 2x hysteresis (a 1x trigger would
        compact on EVERY append past the threshold)."""
        n = self._meta().get("auto_optimize_files_per_bucket")
        return int(n) if n else None

    def hash_buckets(self) -> bool:
        """The persisted bucket-function mode (False for tables created
        before the option existed — plain modulo)."""
        return bool(self._meta().get("hash_buckets", False))

    def constraints(self) -> dict:
        """The persisted CHECK constraints ({} when none)."""
        return self._meta().get("constraints") or {}

    # -- foreign keys (cross-table referential integrity) ------------------

    def fk_specs(self) -> dict:
        """FOREIGN KEY constraints among the persisted set: specs with
        a ``foreign_key`` body ({"parent": path, "parent_key": col})."""
        return {n: c for n, c in self.constraints().items()
                if c.get("foreign_key")}

    def fk_parent_paths(self) -> list[str]:
        """Sorted unique parent table paths of this table's FKs — the
        lock-acquisition order for the commit-time fence (sorted =
        deadlock-free with multi-parent children)."""
        return sorted({c["foreign_key"]["parent"]
                       for c in self.fk_specs().values()})

    def fk_referenced_by(self) -> list[dict]:
        """Back-references registered by children's ALTER ADD FOREIGN
        KEY: [{"name", "child" (path), "col"}]. A non-empty list makes
        this table a PARENT: key-removing ops (DELETE/PURGE) must prove
        no live child row references the removed keys, and their
        commits are fenced by ``fk_ref_epoch``."""
        return list(self._meta().get("fk_referenced_by") or [])

    def fk_del_epoch(self) -> int:
        """Bumped (under the meta lock, atomically with the commit
        link) by every key-REMOVING commit on this table. Child writers
        capture it when validating FK membership and their commits
        verify it unchanged under the same lock — the parent half of
        the cross-log write-skew fence."""
        return int(self._meta().get("fk_del_epoch", 0))

    def fk_ref_epoch(self) -> int:
        """Bumped by every commit of a CHILD table referencing this
        one (under this table's meta lock). Key-removing writers here
        capture it before the restrict scan and verify it unchanged at
        commit — the child half of the fence.

        DOCUMENTED CONSERVATISM: the epoch is table-global, so under
        sustained child insert traffic a parent DELETE/PURGE restarts
        on every bump — even when no child write touches the deleted
        keys — and can die with CommitConflict after max_attempts
        (starvation, never corruption). Bounding it needs key-scoped
        fencing (e.g. 64 hash-slot epochs: children bump the slots of
        the FK values they insert, removals verify only their deleted
        keys' slots); holding the meta lock across the restrict scan
        is NOT an option — the lock is a 30 s-lease primitive for
        sub-second metadata writes and a scan-length hold would be
        stolen, voiding the fence."""
        return int(self._meta().get("fk_ref_epoch", 0))

    def _fk_bump(self, field: str) -> None:
        """Increment an FK epoch — caller MUST hold this table's meta
        lock (the bump must be atomic with the commit link it fences)."""
        meta = self._meta()
        meta[field] = int(meta.get(field, 0)) + 1
        self._persist_meta(meta)

    def identity(self) -> dict | None:
        """The persisted IDENTITY column spec ({"col": name}) or None —
        Delta's GENERATED ALWAYS AS IDENTITY: engine-assigned,
        monotonically increasing, unique int64 ids across all commits
        and writers, via commit-reserved ranges (see `id_hwm`)."""
        return self._meta().get("identity")

    def id_hwm(self, v: int | None = None) -> int:
        """Identity HIGH-WATER MARK as of version ``v`` (head by
        default): the end of the last id range any commit ≤ v
        reserved. Ranges are reserved IN the commit body, so the
        version chain serializes them — a commit's range is computed
        from the fold of its parent, and any two committed ranges are
        therefore disjoint (same linearization argument as the ALTER
        barrier). O(CHECKPOINT_EVERY): checkpoints carry ``id_hwm``."""
        head = self.version() if v is None else v
        hwm = 0
        start = 0
        ckpt = (head // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
        while ckpt > 0:
            pth = self._checkpoint_path(ckpt)
            if os.path.exists(pth):
                with open(pth) as fh:
                    body = json.load(fh)
                if "id_hwm" in body:
                    hwm = int(body["id_hwm"])
                    start = ckpt + 1
                    break
            ckpt -= CHECKPOINT_EVERY
        for i in range(start, head + 1):
            try:
                r = self.read_commit(i).get("id_range")
            except FileNotFoundError:
                continue  # truncated pre-identity log segment: no ranges
            if r:
                hwm = max(hwm, int(r[1]))
        return hwm

    def generated(self) -> dict:
        """The persisted GENERATED column specs ({} when none) —
        Delta's GENERATED ALWAYS AS, fixed at creation: {out_col:
        {"fn": ..., "src": ..., params}} in the portable mini-DSL both
        clients evaluate identically (see `_generated_expr_spark`)."""
        return self._meta().get("generated") or {}

    def layout(self) -> tuple[str | None, int | None]:
        """The persisted (merge key, bucket count), or (None, None) on
        a pre-layout-metadata table."""
        m = self._meta()
        n = m.get("n_buckets")
        return m.get("key"), (int(n) if n is not None else None)

    def effective_layout(self) -> tuple[str | None, int | None]:
        """`layout()`, but rebucket-aware: if a ``rebucket_pending``
        marker exists AND its rewrite commit has landed in the log, the
        pending bucket count is the real one — return it and
        opportunistically finish the two-phase change (persist the new
        count, clear the marker), so a rebucketing OPTIMIZE that
        crashed between its commit and its metadata persist is healed
        by the NEXT resolver instead of leaving a silently-stale count
        (which would make no-arg writers mis-select files). A pending
        marker whose commit has NOT landed is ignored — the files are
        still in the old layout."""
        m = self._meta()
        key, n = m.get("key"), m.get("n_buckets")
        p = m.get("rebucket_pending")
        if p and self._rebucket_landed(p):
            n = p["to"]
            self._finish_rebucket(p)
        return key, (int(n) if n is not None else None)

    def _rebucket_landed(self, pending: dict) -> bool:
        """True iff the pending rebucket's rewrite commit is in the log
        (scan bounded to commits after the marker's parent version)."""
        for v in range(int(pending["parent"]) + 1, self.version() + 1):
            try:
                with open(self._commit_path(v)) as fh:
                    if json.load(fh).get("writer") == pending["writer"]:
                        return True
            except FileNotFoundError:
                continue
        return False

    def _finish_rebucket(self, pending: dict) -> None:
        """Idempotent second phase: persist the new bucket count and
        clear the marker — safe from any process (crash recovery)."""
        with self._meta_lock():
            m = self._meta()
            if m.get("rebucket_pending") != pending:
                return  # superseded or already finished
            m["n_buckets"] = int(pending["to"])
            # layout EPOCH: snapshots at or above this version are in
            # the current bucket layout; RESTORE refuses to cross it
            # (an old manifest's pb values would lie under the new
            # count). head() here is ≥ the rewrite commit — a
            # conservative bound is safe, it only narrows restore.
            m["layout_since_version"] = self.version()
            del m["rebucket_pending"]
            self._persist_meta(m)

    def constraints_rev(self) -> int:
        """Monotonic revision of the constraint set — bumped by every
        ALTER (add, drop, and the rollback path, which re-persists the
        old set under a NEW rev rather than restoring the old number,
        so a writer's captured rev can never be reused for a different
        constraint set — no ABA). Writers capture this before applying
        constraints and re-check it on every commit attempt; a mismatch
        aborts the attempt and re-applies the new set from scratch."""
        return int(self._meta().get("constraints_rev", 0))

    # -- column mapping (rename/drop without rewrite) ----------------------

    def column_mapping(self) -> dict:
        """{logical name -> physical name}, sparse: only columns whose
        names diverged via ALTER RENAME appear (Delta/Iceberg column
        mapping). Data files ALWAYS store physical names — a rename is
        pure metadata, old and new files agree byte-for-byte."""
        return self._meta().get("column_mapping") or {}

    def dropped_columns(self) -> list[str]:
        """PHYSICAL names of dropped columns: readers exclude them at
        scan; the names stay reserved forever (a new logical column may
        not take a reserved physical name — the demo's honest stand-in
        for Delta's UUID physical names, which make reuse impossible by
        construction)."""
        return list(self._meta().get("dropped_columns") or [])

    def mapping_rev(self) -> int:
        """Monotonic revision of the column mapping — bumped by every
        RENAME/DROP (and the rename rollback path, fresh rev — no ABA).
        Rides in `_gate_state`, so an in-flight writer whose batch was
        translated under a stale mapping restarts instead of committing
        columns under superseded names."""
        return int(self._meta().get("mapping_rev", 0))

    def physical_name(self, logical: str) -> str:
        return (self.column_mapping() or {}).get(logical, logical)

    # -- access policies (row filters + column masks) -----------------------

    def policies(self) -> dict:
        """Reader-side ACCESS POLICIES (Databricks/Snowflake row
        filters and column masks, on the lakehouse metadata): ``masks``
        maps LOGICAL column -> mask spec, ``row_filters`` maps policy
        name -> keep-predicate spec. Both specs carry
        ``exempt_roles``: a read under one of those roles sees that
        policy's raw form. Policies are PURE READ-SIDE metadata — they
        never gate writers (a write commits raw bytes regardless), so
        they ride neither `_gate_state` nor commit barriers; one
        atomic `_persist_meta` flips every reader at once."""
        m = self._meta()
        return {"masks": dict(m.get("masks") or {}),
                "row_filters": dict(m.get("row_filters") or {})}

    def policies_rev(self) -> int:
        """Monotonic revision of the policy set — bumped by every
        SET/DROP MASK or ROW FILTER. Diagnostic (DESCRIBE/tests):
        readers resolve policies fresh per read, writers ignore them,
        so nothing gates on this number."""
        return int(self._meta().get("policies_rev", 0))

    # -- reader feature gate (table protocol compatibility) -----------------

    def features(self) -> list[str]:
        """The table's PERSISTED feature list — every on-disk mechanism
        a reader must understand to fold a snapshot correctly. A client
        that folds files while ignoring an unknown feature silently
        miscounts (e.g. resurrects DV-deleted rows, reads physical
        column names, leaks masked values), so readers refuse loudly on
        entries outside their supported set
        (`_check_reader_features`) — Delta's minReaderVersion/
        readerFeatures contract. The writer half is `_gate_state`."""
        return list(self._meta().get("features") or [])

    def _add_feature(self, name: str) -> None:
        """Idempotently record that this table now uses ``name``.
        Called by the WRITE PATH **before** the commit that first
        exercises the feature, so no reader can observe the commit
        without the gate — conservative if the write then fails (a
        listed-but-unused feature only costs a refusal)."""
        if name in (self._meta().get("features") or ()):
            return
        with self._meta_lock():
            m = self._meta()
            feats = list(m.get("features") or [])
            if name not in feats:
                feats.append(name)
                m["features"] = sorted(feats)
                self._persist_meta(m)

    def _meta_lock_path(self) -> str:
        return os.path.join(self.log_dir, "_table.lock")

    def _persist_meta(self, meta: dict) -> None:
        """Atomic replace of _table.json — call only under the meta
        lock (read-modify-write races would drop a concurrent ALTER)."""
        path = os.path.join(self.log_dir, "_table.json")
        tmp = path + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, path)

    _META_LOCK_MAX_GEN = storage_mod.GenerationLock.MAX_GEN

    def _meta_gen_path(self, g: int) -> str:
        base = self._meta_lock_path()
        return base if g == 0 else f"{base}.steal{g}"

    @contextlib.contextmanager
    def _meta_lock(self, timeout: float = 10.0, stale_after: float = 30.0,
                   _steal_hook=None):
        """Serialize metadata mutations (ALTER vs ALTER) via the
        storage seam's :class:`~distribot_spark.sources.storage.
        GenerationLock` — ``put_if_absent`` generations, body-``ts``
        leases, and a body-content steal fence, so the same protocol
        holds on a conditional-put-only object store (the old
        O_EXCL + inode+mtime fence existed only on POSIX). Data
        writers do NOT take this lock — they serialize against ALTER
        through the commit log barrier instead (see
        `alter_add_constraint_spark`). Ownership is the newest
        generation; steals only CREATE (never unlink foreign files),
        release is owner-pathed — see the GenerationLock docstring for
        the full argument. ``_steal_hook`` (tests only) runs between a
        steal's create and its predecessor re-verification.

        REENTRANT per (instance, thread): the same TableLog object may
        nest acquisitions within one call stack (a self-referencing
        FK's commit fence fires inside the ALTER barrier, which already
        holds this lock) — the inner enter is a no-op because it is the
        same logical owner. A DIFFERENT thread on the same instance,
        and any other instance of the path, still conflict, as they
        must (pinned by the stealer-contention stress test)."""
        me = threading.get_ident()
        if (getattr(self, "_meta_lock_owner", None) == me
                and getattr(self, "_meta_lock_depth", 0) > 0):
            self._meta_lock_depth += 1
            try:
                yield
            finally:
                self._meta_lock_depth -= 1
            return
        lock = storage_mod.GenerationLock(
            self.storage, self._meta_lock_path(), stale_after)
        held = lock.acquire(timeout=timeout, _steal_hook=_steal_hook,
                            desc="meta lock")
        try:
            self._meta_lock_owner = me
            self._meta_lock_depth = 1
            yield
        finally:
            self._meta_lock_depth = 0
            self._meta_lock_owner = None
            lock.release(held)

    def _commit_path(self, v: int) -> str:
        return os.path.join(self.log_dir, f"v{v:012d}.json")

    def _checkpoint_path(self, v: int) -> str:
        return os.path.join(self.log_dir, f"v{v:012d}.checkpoint.json")

    def _retention_path(self) -> str:
        return os.path.join(self.log_dir, "_retention.json")

    # -- snapshot retention ----------------------------------------------

    def expired_before(self) -> int:
        """The retention FLOOR: the oldest version still readable. 0 when
        nothing has been expired. Versions below the floor raise
        `SnapshotExpired` from every time-travel entry point, and
        `vacuum` is free to reclaim files only those versions
        reference."""
        try:
            with open(self._retention_path()) as fh:
                return int(json.load(fh)["min_version"])
        except FileNotFoundError:
            return 0

    def expire_snapshots(self, keep_last: int) -> int:
        """Advance the retention floor so only the newest ``keep_last``
        versions stay time-travelable (Delta's log/`VACUUM` retention
        expressed in versions — the demo clock is the commit counter).
        Monotonic: the floor never moves backward, so racing expirers
        compose. The read-compute-write runs under `_meta_lock` (the
        ALTER discipline) — without it two racing expirers could
        interleave (both read the old floor, the one computing the
        LOWER value writes last) and regress the floor, letting a read
        below the real floor pass `_check_not_expired` and then fail
        with a raw parquet FileNotFound after a vacuum. This is the
        METADATA half of reclamation; no file is touched until
        `vacuum()` runs. Returns the new floor."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        head = self.version()
        with self._meta_lock():
            floor = max(
                self.expired_before(), max(head - keep_last + 1, 0))
            tmp = self._retention_path() + f".tmp{uuid.uuid4().hex[:6]}"
            with open(tmp, "w") as fh:
                json.dump({"min_version": floor, "ts": time.time()}, fh)
            os.replace(tmp, self._retention_path())
        return floor

    def _check_not_expired(self, v: int) -> None:
        floor = self.expired_before()
        if v < floor:
            raise SnapshotExpired(
                f"version {v} expired: retention floor is {floor} "
                f"(expire_snapshots ran; files may be vacuumed)"
            )

    def _head_hint_path(self) -> str:
        return os.path.join(self.log_dir, "_head.json")

    def version(self) -> int:
        """Highest committed version, -1 for an empty table.

        O(1) amortized: reads the advisory ``_head.json`` hint (written
        by commit winners — Delta's ``_last_checkpoint`` discipline)
        and probes FORWARD for commits the hint hasn't caught up to, so
        a stale or missing hint (crash between link and hint write, an
        old table) costs only the gap; correctness never depends on the
        hint. The full directory listing is the hint-less fallback —
        without this, every snapshot pays an O(versions) listing, which
        is what rots a manifest under micro-batch ingest."""
        h = -1
        try:
            with open(self._head_hint_path()) as fh:
                h = int(json.load(fh)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            h = -1
        if h >= 0 and not os.path.exists(self._commit_path(h)):
            h = -1  # foreign/corrupt hint: trust only real commits
        if h < 0:
            try:
                names = os.listdir(self.log_dir)
            except FileNotFoundError:
                return -1
            vs = [
                int(n[1:13]) for n in names
                if n.endswith(".json") and not n.endswith(".checkpoint.json")
                and n.startswith("v") and n[1:13].isdigit()
            ]
            h = max(vs, default=-1)
        while os.path.exists(self._commit_path(h + 1)):
            h += 1
        return h

    def read_commit(self, v: int) -> dict:
        with open(self._commit_path(v)) as fh:
            return json.load(fh)

    def _resolve_txn_for_read(self) -> None:
        """Reader half of the multi-table txn contract (sources/txn.py):
        a DECIDED transaction whose links haven't all landed is rolled
        forward before this reader folds, so a reader pinned mid-commit
        sees the transaction on every table or (undecided: nothing is
        published yet) on none. One stat() when no txn ever ran."""
        if os.path.exists(os.path.join(self.log_dir,
                                       "_txn.pending.json")):
            from . import txn as _txnmod

            _txnmod.resolve_pending_txn(self, reader=True)

    def snapshot(self) -> tuple[int, dict[str, int]]:
        """(version, {data file name -> bucket}) of the latest committed
        state. Replays from the newest checkpoint at or below the head,
        so cost is bounded by CHECKPOINT_EVERY regardless of history."""
        self._resolve_txn_for_read()
        v = self.version()
        if v < 0:
            return v, {}
        return self._fold_from_checkpoint(v)

    def _fold_from_checkpoint(
        self, v: int, skip_ckpt_at_v: bool = False,
    ) -> tuple[int, dict[str, int]]:
        live, _, _, _ = self._fold_entries(v, skip_ckpt_at_v)
        return v, live

    def _fold_entries(
        self, v: int, skip_ckpt_at_v: bool = False,
    ) -> tuple[dict[str, int], dict[str, dict], dict[str, list[str]],
               int]:
        """Fold (live file→bucket, file→column stats, file→DV list) at
        ``v`` starting from the newest usable checkpoint ≤ v —
        O(CHECKPOINT_EVERY) log reads, never O(v), for EVERY metadata
        consumer: snapshots, time travel, manifest-stats pruning and
        deletion-vector resolution all share this fold (the Delta
        pattern of checkpoints carrying the full table state, not just
        the file list). ``skip_ckpt_at_v`` is for the checkpoint WRITER
        itself (its own checkpoint does not exist yet), which keeps
        COMMIT cost flat too: each checkpoint folds from the previous
        one plus its tail. A checkpoint from before stats/DVs were
        folded in (no such tables persist, but be safe) is skipped and
        the fold falls back to an earlier one or the full log."""
        live: dict[str, int] = {}
        stats: dict[str, dict] = {}
        dvs: dict[str, list[str]] = {}
        hwm = 0  # identity high-water mark rides the same fold
        start = 0
        ckpt = (v // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
        while ckpt > 0:
            if skip_ckpt_at_v and ckpt == v:
                ckpt -= CHECKPOINT_EVERY
                continue
            p = self._checkpoint_path(ckpt)
            if os.path.exists(p):
                with open(p) as fh:
                    body = json.load(fh)
                if "stats" not in body or "dvs" not in body:
                    ckpt -= CHECKPOINT_EVERY
                    continue  # legacy checkpoint: keep searching lower
                live = {f: int(b) for f, b in body["live"].items()}
                stats = {f: body["stats"].get(f) or {} for f in live}
                dvs = {f: list(d) for f, d in body["dvs"].items()}
                hwm = int(body.get("id_hwm", 0))
                start = ckpt + 1
                break
            ckpt -= CHECKPOINT_EVERY
        for i in range(start, v + 1):
            c = self.read_commit(i)
            for f in c["removes"]:
                live.pop(f, None)
                stats.pop(f, None)
                dvs.pop(f, None)
            for a in c["adds"]:
                live[a["file"]] = int(a["pb"])
                stats[a["file"]] = a.get("stats") or {}
            for f, d in (c.get("dvs") or {}).items():
                if f in live:
                    # value is one sidecar name or a LIST (mixed-kind
                    # re-attach: key + positional merged per kind)
                    dvs.setdefault(f, []).extend(
                        [d] if isinstance(d, str) else list(d))
            r = c.get("id_range")
            if r:
                hwm = max(hwm, int(r[1]))
        return live, stats, dvs, hwm

    def try_commit(
        self,
        parent: int,
        adds: list[dict],
        removes: list[str],
        writer: str,
        dvs: dict[str, str] | None = None,
        id_range: tuple[int, int] | None = None,
        fk_removal: bool = False,
    ) -> bool:
        """Atomically commit version ``parent+1``; True iff THIS caller
        created it. Body is full before the link lands (tmp-then-link),
        so a reader never sees a torn manifest — the flow/state.py claim
        discipline applied to table versions.

        ``dvs`` ({data file -> deletion-vector sidecar file}) attaches a
        DV to a LIVE data file: the sidecar's keys are logically deleted
        from that file without rewriting it (Delta/Iceberg deletion
        vectors). DVs accumulate per file until the file itself is
        removed (an OPTIMIZE/MERGE rewrite folds them in); `live_dvs`
        folds the mapping, readers anti-join it.

        FOREIGN-KEY fence (``fk_specs`` / ``fk_referenced_by``): the
        link happens while HOLDING the involved meta locks, with one
        last epoch verify against the values captured at validation —
        commit-log OCC alone cannot serialize across two tables' logs
        (a child insert of key K and a parent delete of K each win
        their own log: classic write skew), so the parent's meta lock
        is the shared serialization point. A failed verify returns
        False; the caller's OCC loop then trips its `_gate_state` check
        and the write restarts with fresh validation.
        ``fk_removal=True`` marks key-REMOVING commits (delete/purge):
        they verify and bump the fence on the REFERENCED side too."""
        cap = _fk_take_captures(self)  # one-shot, this thread's only
        seen = cap.get("seen", {})
        fk_parents = [p for p in self.fk_parent_paths() if p in seen]
        removal = bool(fk_removal and cap.get("ref") is not None)
        if fk_parents or removal:
            try:
                with contextlib.ExitStack() as stack:
                    plogs = {}
                    lockset = set(fk_parents) | ({self.path} if removal
                                                 else set())
                    for p in sorted(lockset):
                        t = self if p == self.path else TableLog(p)
                        plogs[p] = t
                        stack.enter_context(t._meta_lock())
                    for p in fk_parents:
                        if plogs[p].fk_del_epoch() != seen[p]:
                            return False  # parent removed keys since
                            # our validation; the caller's gate
                            # restarts us
                    if removal and self.fk_ref_epoch() != cap["ref"]:
                        return False  # a child gained references (or
                        # an FK was born) mid-scan
                    # bumps BEFORE the link: a failed link merely
                    # forces extra restarts elsewhere (conservative,
                    # never unsafe)
                    for p in fk_parents:
                        plogs[p]._fk_bump("fk_ref_epoch")
                    if removal:
                        self._fk_bump("fk_del_epoch")
                    return self._try_commit_linked(
                        parent, adds, removes, writer, dvs, id_range)
            except TimeoutError:
                # fence-lock contention (e.g. an ALTER barrier holding
                # this table's meta lock while ITS fence wants a lock
                # we hold in an FK chain): treat as a lost race — the
                # caller's loop releases everything, revalidates and
                # retries, which breaks the hold-and-wait cycle
                return False
        return self._try_commit_linked(
            parent, adds, removes, writer, dvs, id_range)

    def _try_commit_linked(
        self,
        parent: int,
        adds: list[dict],
        removes: list[str],
        writer: str,
        dvs: dict[str, str] | None = None,
        id_range: tuple[int, int] | None = None,
        txn: str | None = None,
    ) -> bool:
        # MULTI-TABLE TXN fence (sources/txn.py): a pending-txn marker
        # pins this log's next version slots for the transaction's
        # roll-forward. Cost to every normal commit: one stat(). An
        # undecided young txn → back off (False; the caller's OCC loop
        # retries); a decided or lease-expired one is resolved HERE —
        # rolled forward or aborted — and the commit proceeds against
        # the new head (this attempt then loses cleanly if it moved).
        if txn is None and os.path.exists(
                os.path.join(self.log_dir, "_txn.pending.json")):
            from . import txn as _txnmod

            if _txnmod.resolve_pending_txn(self) == "inflight":
                return False
        v = parent + 1
        path = self._commit_path(v)
        body = {
            "version": v,
            "parent": parent,
            "writer": writer,
            "ts": time.time(),
            "adds": adds,
            "removes": removes,
        }
        if txn:
            body["txn"] = txn
        if dvs:
            body["dvs"] = dvs
        if id_range:
            body["id_range"] = [int(id_range[0]), int(id_range[1])]
        # the linearization point: an atomic create-if-absent of the
        # full commit body (POSIX tmp-then-link / object-store
        # conditional PUT — the storage seam's one-winner contract)
        if not self.storage.put_if_absent(
                path, json.dumps(body).encode()):
            return False
        # advisory head hint (atomic whole-object PUT; losing a race
        # to a NEWER hint is harmless — version() probes forward from
        # any hint)
        self.storage.put(self._head_hint_path(),
                         json.dumps({"version": v}).encode())
        if v > 0 and v % CHECKPOINT_EVERY == 0:
            # winner-only, crash-tolerant: a missing checkpoint just means
            # snapshot() replays from the previous one. Folds from the
            # PREVIOUS checkpoint (O(CHECKPOINT_EVERY)), so commit cost
            # stays flat at any version count — the streaming-ingest
            # property scaling.py measures. Carries the FULL table
            # state (live set + column stats + DV lists) so every
            # metadata consumer stays flat, not just snapshot().
            live, stats, dvmap, hwm = self._fold_entries(
                v, skip_ckpt_at_v=True)
            self.storage.put(
                self._checkpoint_path(v),
                json.dumps({"version": v, "live": live,
                            "stats": stats, "dvs": dvmap,
                            "id_hwm": hwm}).encode())
            # PARQUET twin of the checkpoint (one row per live file,
            # id_hwm in the footer metadata): what lets metadata
            # consumers read the manifest as a DataFrame and prune
            # with a Spark job instead of a driver dict — see
            # sources/manifest.py. Same crash tolerance as the JSON
            # checkpoint: a missing one just means the manifest read
            # folds from an earlier checkpoint or bootstraps.
            from . import manifest as _manifest

            _manifest.write_checkpoint_parquet(
                self, v, live, stats, dvmap, hwm)
        return True

    def snapshot_at(self, v: int) -> tuple[int, dict[str, int]]:
        """Time travel: the live file set AS OF version ``v`` (Delta's
        ``VERSION AS OF``). Data files are immutable and commits only
        append, so any historical snapshot stays byte-exact readable
        until `vacuum()` reclaims its replaced files — time-travel
        readers and vacuum trade off through a retention window
        (`expire_snapshots` sets it, `vacuum` honors it, and reads below
        it raise `SnapshotExpired` here instead of failing downstream on
        missing parquet)."""
        self._resolve_txn_for_read()
        head = self.version()
        if not 0 <= v <= head:
            raise ValueError(f"version {v} outside [0, {head}]")
        self._check_not_expired(v)
        return self._fold_from_checkpoint(v)  # O(CHECKPOINT_EVERY)

    def live_paths_at(self, v: int) -> list[str]:
        _, live = self.snapshot_at(v)
        return [self.data_path(f) for f in sorted(live)]

    def version_at_timestamp(self, ts: float) -> int:
        """Delta's ``TIMESTAMP AS OF``: the latest RETAINED version
        whose commit timestamp is <= ``ts`` (epoch seconds). Commit
        timestamps are writer wall clocks — the log order is the truth
        and the scan takes the LAST qualifying version, so bounded
        clock jitter between racing writers cannot resurrect an older
        state. Scans only retained commits (floor..head), so it works
        on a truncated log and never replays unbounded history; compose
        with `snapshot_at` / `live_paths_at` for the actual read."""
        head = self.version()
        floor = self.expired_before()
        if head < 0:
            raise ValueError("empty table")
        best = -1
        for v in range(floor, head + 1):
            if self.read_commit(v)["ts"] <= ts:
                best = v
        if best < 0:
            raise SnapshotExpired(
                f"no retained version at or before timestamp {ts} "
                f"(retention floor {floor})"
            )
        return best

    def _replay_to(self, v: int) -> tuple[int, dict[str, int]]:
        live: dict[str, int] = {}
        for i in range(0, v + 1):
            c = self.read_commit(i)
            for f in c["removes"]:
                live.pop(f, None)
            for a in c["adds"]:
                live[a["file"]] = int(a["pb"])
        return v, live

    # -- deletion vectors -------------------------------------------------

    def new_dv_file(self) -> str:
        return f"dv-{uuid.uuid4().hex}.parquet"

    def new_pos_dv_file(self) -> str:
        """POSITIONAL deletion-vector sidecar (``dvp-`` prefix — the
        kind is carried in the NAME so folds split key vs positional
        sidecars with zero I/O). Schema: ``(_df, _w, _m)`` — for data
        file ``_df``, bitmap word ``_w`` masks rows at positions
        ``[_w*32, _w*32+32)`` (bit ``pos % 32`` of ``_m``). 32-bit
        words in int64 keep every value positive and every shift < 32
        (the CLAUDE.md cross-engine shift discipline), at 1/32nd the
        rows of a position list — O(rows) BITS, not O(keys × key
        width), which is what makes wide-key and predicate deletes
        cheap (Delta's roaring-bitmap DVs, flattened to a relation)."""
        return f"dvp-{uuid.uuid4().hex}.parquet"

    def live_dvs(
        self, version: int | None = None,
    ) -> dict[str, list[str]]:
        """{live data file -> its deletion-vector sidecars, commit
        order} as of ``version`` (head if None). A file's DV list dies
        with the file: a rewrite (MERGE/OPTIMIZE) removes the file, so
        the fold clears its DVs — folding them into the base is exactly
        what the rewrite did. A dv entry naming a file no longer live
        when its commit lands (the writer lost a race to a rewrite) is
        ignored: the rewrite already materialized a state the DV writer
        must re-derive against.

        O(CHECKPOINT_EVERY): DV lists ride in checkpoints alongside the
        live set (`_fold_entries`), so resolving them never replays the
        full log."""
        head = self.version()
        v = head if version is None else version
        if v < 0 <= head or v > head:
            raise ValueError(f"version {v} outside [0, {head}]")
        if head < 0:
            return {}  # empty table: nothing committed yet
        self._check_not_expired(v)
        _, _, dvs, _ = self._fold_entries(v)
        return dvs

    # -- data files -------------------------------------------------------

    def new_data_file(self, bucket: int) -> str:
        return f"pb{bucket:05d}-{uuid.uuid4().hex}.parquet"

    def data_path(self, name: str) -> str:
        return os.path.join(self.data_dir, name)

    def live_paths(self, buckets: set[int] | None = None) -> list[str]:
        _, live = self.snapshot()
        return [
            self.data_path(f)
            for f, b in sorted(live.items())
            if buckets is None or b in buckets
        ]

    def live_stats(self, version: int | None = None) -> dict[str, dict]:
        """{live data file -> per-column stats} as of ``version`` (head
        if None). Stats ride in each commit's ``adds`` manifest entries
        (``{"stats": {col: {"min", "max"}}}``, attached by writers that
        opt in via ``stats_cols``) — the Delta/Iceberg pattern of
        metadata-level min/max so planning never opens a data file.
        Files added without stats map to ``{}`` and are never pruned.

        O(CHECKPOINT_EVERY): stats ride in checkpoints alongside the
        live set (`_fold_entries`), so PLANNING cost is flat at any
        version count — the property that makes manifest pruning usable
        under micro-batch ingest."""
        head = self.version()
        v = head if version is None else version
        if not 0 <= v <= head:
            raise ValueError(f"version {v} outside [0, {head}]")
        self._check_not_expired(v)
        _, stats, _, _ = self._fold_entries(v)
        return stats

    def live_paths_pruned(
        self, col: str, lo, hi, version: int | None = None,
    ) -> tuple[list[str], int]:
        """FILE SKIPPING off manifest stats: live paths whose
        ``[min, max]`` range for ``col`` intersects ``[lo, hi]``, plus
        the count of files PRUNED without being opened. Conservative by
        construction — a file with no recorded stats for ``col`` is
        always kept — so a pruned read is always semantically equal to
        the full read plus the predicate (which is how the oracle checks
        it). Bounds must be the same JSON-scalar type the stats carry
        (dates/timestamps travel as ISO strings, which order
        lexicographically)."""
        stats = self.live_stats(version)
        kept: list[str] = []
        pruned = 0
        for f in sorted(stats):
            s = stats[f].get(col)
            if s is not None and (s["max"] < lo or s["min"] > hi):
                pruned += 1
                continue
            kept.append(self.data_path(f))
        return kept, pruned

    def live_paths_pruned_point(
        self, col: str, value, version: int | None = None,
    ) -> tuple[list[str], int]:
        """POINT-LOOKUP file skipping off per-file bloom filters in the
        manifest stats (Delta's bloom filter index): keep only files
        whose bloom might contain ``value``; files without a bloom are
        always kept (conservative, like min/max stats), so a pruned
        point read ≡ the full read + the equality predicate. The false
        positive rate costs wasted opens, never rows."""
        stats = self.live_stats(version)
        kept: list[str] = []
        pruned = 0
        for f in sorted(stats):
            bl = (stats[f] or {}).get(f"_bloom:{col}")
            if bl is not None and not bloom_maybe_contains(bl, value):
                pruned += 1
                continue
            kept.append(self.data_path(f))
        return kept, pruned

    def _floor_checkpoint(self) -> int:
        """Newest full-format checkpoint at or below the retention
        floor — the earliest log entry any retained fold can start
        from; 0 when none exists."""
        floor = self.expired_before()
        c = (floor // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
        while c > 0:
            p = self._checkpoint_path(c)
            if os.path.exists(p):
                with open(p) as fh:
                    body = json.load(fh)
                if "stats" in body and "dvs" in body:
                    return c
            c -= CHECKPOINT_EVERY
        return 0

    def truncate_log(self) -> list[str]:
        """Physically shrink the LOG itself: delete commit and
        checkpoint files strictly below the newest checkpoint at or
        below the retention floor (Delta's ``logRetentionDuration``
        half of expiry — `expire_snapshots` makes old versions
        unreadable, this reclaims their metadata). Safe because every
        retained fold (snapshot / time travel / stats / DVs / vacuum's
        referenced-set) starts at or above that checkpoint; reads below
        the floor already raise `SnapshotExpired` before touching the
        log. No-op until a checkpoint at/below the floor exists."""
        cstar = self._floor_checkpoint()
        if cstar <= 0:
            return []
        removed = []
        for name in sorted(os.listdir(self.log_dir)):
            if not (name.startswith("v")
                    and (name.endswith(".json")
                         or name.endswith(".checkpoint.parquet"))
                    and name[1:13].isdigit()):
                continue
            if int(name[1:13]) < cstar:
                p = os.path.join(self.log_dir, name)
                if os.path.isdir(p):  # multi-part parquet checkpoint
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    os.unlink(p)
                removed.append(name)
        return removed

    def referenced_files(self) -> set[str]:
        """Every data file some RETAINED snapshot (version >= the
        retention floor) references — the set `vacuum` must never touch.
        With no expiry this is every file any commit ever added minus
        those removed before the floor, so historical snapshots, CDF
        pre-images and time travel all stay readable until
        `expire_snapshots` explicitly gives them up. Folds from the
        floor checkpoint when one exists, so it works on a truncated
        log and never replays unbounded history."""
        head = self.version()
        floor = self.expired_before()
        referenced: set[str] = set()
        live: dict[str, int] = {}
        dvs: dict[str, list[str]] = {}
        start = 0
        cstar = self._floor_checkpoint()
        if cstar > 0:
            with open(self._checkpoint_path(cstar)) as fh:
                body = json.load(fh)
            live = {f: int(b) for f, b in body["live"].items()}
            dvs = {f: list(d) for f, d in body["dvs"].items()}
            start = cstar + 1
            if cstar >= floor:
                # cstar == floor DOES happen (expire to a checkpoint
                # boundary, e.g. keep_last=1 with head on a multiple of
                # CHECKPOINT_EVERY): the checkpoint IS a retained
                # snapshot, so its live files AND its DV sidecars are
                # referenced — without the sidecars, vacuum would unlink
                # live deletion state and DV-folded reads would crash on
                # missing sidecar parquet.
                referenced.update(live)
                for ds in dvs.values():
                    referenced.update(ds)
        for i in range(start, head + 1):
            c = self.read_commit(i)
            for f in c["removes"]:
                live.pop(f, None)
                dvs.pop(f, None)
            for a in c["adds"]:
                live[a["file"]] = int(a["pb"])
            for f, d in (c.get("dvs") or {}).items():
                if f in live:
                    dvs.setdefault(f, []).extend(
                        [d] if isinstance(d, str) else list(d))
            if i >= floor:
                referenced.update(live)
                for ds in dvs.values():
                    referenced.update(ds)
        return referenced

    def _txn_shielded_files(self) -> set[str]:
        """Data-dir names a PENDING multi-table txn's marker references
        — staged adds, MERGE/DELETE rebase sources (raw update files /
        the key list) and precomputed DV sidecars. They are referenced
        by the marker, not (yet) by any commit, so min-age alone must
        not be their only vacuum shield (a txn may legitimately stage
        long before it decides; reclaiming its files would break the
        roll-forward / strand a decided txn behind a straggler).
        Shared by the driver `vacuum` and the distributed
        `manifest.vacuum_spark` planner."""
        mp = os.path.join(self.log_dir, "_txn.pending.json")
        if not os.path.exists(mp):
            return set()
        from . import txn as _txnmod

        plan = _txnmod._read_json(mp)
        shielded: set[str] = set()
        for e in (plan or {}).get("tables", ()):
            if e.get("path") == self.path:
                shielded.update(a["file"] for a in e["adds"])
                shielded.update(
                    u["file"] for u in e.get("updates_files", ()))
                shielded.update((e.get("dvs") or {}).values())
                if e.get("keys_file"):
                    shielded.add(e["keys_file"])
        return shielded

    def vacuum(
        self, min_age_seconds: float = DEFAULT_VACUUM_MIN_AGE,
    ) -> list[str]:
        """Reclaim data-dir entries no RETAINED snapshot references:
        crash debris from writers that died before committing, staging
        directories of crashed Spark jobs, and files only EXPIRED
        versions (below the `expire_snapshots` floor) still name. Two
        safety rails, both demanded by the OCC protocol itself:

        - retention: a file referenced by ANY version >= the floor is
          kept, so time travel / CDF reads inside the horizon survive a
          vacuum and reads below it fail with `SnapshotExpired`, never
          a parquet FileNotFound (Delta's vacuum-vs-time-travel
          contract);
        - min-age: writers stage files BEFORE try_commit, so anything
          younger than ``min_age_seconds`` may belong to an in-flight
          commit and is skipped (Delta's deletedFileRetentionDuration).
          Pass 0.0 only when no concurrent writer can exist."""
        referenced = self.referenced_files()
        referenced.update(self._txn_shielded_files())
        return self._reclaim(
            [n for n in sorted(os.listdir(self.data_dir))
             if n not in referenced],
            min_age_seconds)

    def _reclaim(self, candidates, min_age_seconds: float,
                 dry_run: bool = False) -> list[str]:
        """The physical half of vacuum, shared with the distributed
        planner (`manifest.vacuum_spark`): apply the min-age rail to
        already-planned candidates and unlink the survivors. Kept
        driver-side by design — candidates are crash debris + expired
        files, O(reclaimable), never O(table)."""
        now = time.time()
        removed = []
        for name in sorted(candidates):
            p = self.data_path(name)
            try:
                age = now - os.path.getmtime(p)
            except FileNotFoundError:
                continue  # a concurrent vacuum / writer abandon beat us
            if age < min_age_seconds:
                continue
            if dry_run:
                removed.append(name)
                continue
            if os.path.isdir(p):
                # a crashed Spark writer's _stage-* scratch dir: old
                # enough that its writer is gone, reclaim recursively
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    continue
            removed.append(name)
        return removed


# -- engine-agnostic MERGE (pandas/pyarrow client) -------------------------


@_reapply_on_constraint_change
def merge_upsert_pandas(
    table: TableLog,
    updates,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "merge",
    max_attempts: int = 50,
    pre_commit_hook=None,
    version: str | None = None,
) -> dict:
    """Keyed MERGE (upsert) of a pandas frame through the OCC protocol.

    The protocol does not care which engine computes the bucket rewrite —
    this pandas path is what a lightweight client (or a test worker
    process, tests/acid_worker_proc.py) uses; `merge_upsert_spark` is the
    cluster path. Returns writer stats: {committed_version, attempts,
    recomputes}. ``pre_commit_hook`` (tests only) runs between compute
    and commit to force deterministic interleavings.

    ``version`` switches the rewrite from blind last-writer-wins to a
    CONDITIONAL merge (Delta's ``WHEN MATCHED AND u.v > t.v``): per key
    the row with the highest version survives, base or update — so
    applying a STALE update (or re-applying a delivered batch) is a
    no-op and the merge is idempotent under at-least-once delivery,
    even out of order. Ties keep the update row; callers must make
    (key, version) identify a payload (CDC logs do)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    _rev0 = _gate_state(table)  # BEFORE resolving: a rules change
    # landing between capture and resolve must trip the gate, not slip
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    uniq = _unique_constraints(table, key)
    idcol = _identity_guard(table, updates.columns)
    updates = _apply_generated_pandas(table, updates)
    updates, _nq, _qdir = _apply_constraints_pandas(table, updates, writer)
    if uniq and version is None:
        _check_batch_unique_pandas(updates, key, next(iter(uniq)))
    # LOGICAL -> PHYSICAL boundary (see merge_upsert_spark)
    updates = _to_physical_pandas(table, updates)
    key = table.physical_name(key)
    if version is not None:
        version = table.physical_name(version)
    if idcol:
        idcol = table.physical_name(idcol)
    up = updates.copy()
    hashed = table.hash_buckets()
    up["_pb"] = up[key].astype("int64").map(
        lambda k: _bucket_of_py(k, n_buckets, hashed)
    )
    touched = set(int(b) for b in up["_pb"].unique())
    attempts = 0
    recomputes = 0
    staged: list[dict] | None = None
    replaced: list[str] | None = None
    replaced_dvstate: dict | None = None
    hwm_staged = -1
    n_new_ids = 0
    parent = -2  # force first compute

    while attempts < max_attempts:
        v, live = table.snapshot()
        bucket_files = {
            f: b for f, b in live.items() if b in touched
        }
        dvmap = {
            f: ds for f, ds in table.live_dvs().items() if f in bucket_files
        }
        # DV state is part of conflict detection (see merge_upsert_spark)
        dvstate = {f: tuple(dvmap.get(f, ())) for f in bucket_files}
        hwm_v = table.id_hwm(v) if idcol else 0
        need_compute = (staged is None or dvstate != replaced_dvstate
                        or (idcol and hwm_v != hwm_staged))
        if need_compute:
            # (re)compute the merged content of each touched bucket
            if staged is not None:
                recomputes += 1
                for a in staged:  # abandon unreferenced files
                    try:
                        os.unlink(table.data_path(a["file"]))
                    except FileNotFoundError:
                        pass
            staged, replaced = [], sorted(bucket_files)
            replaced_dvstate = dvstate
            if idcol:
                hwm_staged = hwm_v
                next_id = hwm_v  # (_pb, key)-ordered across the loop

            def _read_minus_dv(f):
                fr = pq.read_table(table.data_path(f)).to_pandas()
                for d in dvmap.get(f, ()):
                    dead = set(
                        pq.read_table(table.data_path(d)).to_pandas()[key]
                    )
                    fr = fr[~fr[key].isin(dead)]
                return fr

            for b in sorted(touched):
                names = [
                    f for f, bb in sorted(bucket_files.items()) if bb == b
                ]
                base = (
                    pd.concat([_read_minus_dv(f) for f in names],
                              ignore_index=True)
                    if names else up.iloc[0:0].drop(columns=["_pb"])
                )
                u = up[up["_pb"] == b].drop(columns=["_pb"])
                if version is None:
                    keep = base[~base[key].isin(set(u[key]))]
                    merged = pd.concat([keep, u], ignore_index=True)
                else:
                    # conditional merge: highest version per key wins;
                    # concat order makes the update win version ties
                    merged = (
                        pd.concat([base, u], ignore_index=True)
                        .sort_values([key, version], kind="stable")
                        .drop_duplicates(key, keep="last")
                    )
                merged = merged.sort_values(key).reset_index(drop=True)
                if idcol:
                    # inherit base ids for surviving update rows, then
                    # draw fresh ids for true inserts in key order
                    if idcol not in merged.columns:
                        merged[idcol] = pd.array([None] * len(merged),
                                                 dtype="Int64")
                    base_map = ({} if base.empty or idcol not in base
                                else dict(zip(base[key], base[idcol])))
                    merged[idcol] = merged[idcol].astype("Int64")
                    inh = merged[key].map(base_map)
                    merged.loc[merged[idcol].isna(), idcol] = inh
                    need = merged[idcol].isna()
                    n = int(need.sum())
                    merged.loc[need, idcol] = range(next_id, next_id + n)
                    merged[idcol] = merged[idcol].astype("int64")
                    next_id += n
                    n_new_ids = next_id - hwm_v
                name = table.new_data_file(b)
                pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                               table.data_path(name))
                staged.append({"file": name, "pb": b, "rows": len(merged)})
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table) != _rev0:
            # an ALTER or rebucket landed since we prepared this write:
            # its commit means our try_commit would lose anyway —
            # restart under the new table rules (wrapper retries)
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(_qdir)
        attempts += 1
        if table.try_commit(
            v, staged, replaced, writer,
            id_range=((hwm_staged, hwm_staged + n_new_ids)
                      if idcol and n_new_ids else None),
        ):
            return {
                "committed_version": v + 1,
                "attempts": attempts,
                "recomputes": recomputes,
                "quarantined": _nq,
            }
        # lost the race: loop re-reads the snapshot. If the winner's
        # commit left our buckets untouched, replaced == new bucket_files
        # and we re-commit the SAME staged files (no recompute).
    _unlink_staged(table, staged)  # give-up path leaves no orphans
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


def _constraint_ok_expr(c: dict):
    """The DSL predicate as a Spark Column (True = row passes)."""
    from pyspark.sql import functions as F

    col = F.col(c["col"])
    ok = F.lit(True)
    if c.get("not_null"):
        ok = ok & col.isNotNull()
    if "min" in c:
        ok = ok & (col.isNull() | (col >= F.lit(c["min"])))
    if "max" in c:
        ok = ok & (col.isNull() | (col <= F.lit(c["max"])))
    if "isin" in c:
        ok = ok & (col.isNull() | col.isin(list(c["isin"])))
    if "min_len" in c:
        ok = ok & (col.isNull() | (F.length(col) >= int(c["min_len"])))
    if "max_len" in c:
        ok = ok & (col.isNull() | (F.length(col) <= int(c["max_len"])))
    return ok


def _generated_expr_spark(g: dict):
    """One generated-column spec as a Spark Column. The DSL is the
    same portability bet as the constraint DSL: a handful of
    deterministic derivations both clients (and the DuckDB oracles)
    spell identically — enough for the partition-style derived columns
    generated columns exist for (date parts, prefixes, shards).
    ``div`` is FLOOR division on every client — spelled via the
    non-negative-mod identity (the CLAUDE.md
    ``(c - ((c % W) + W) % W) DIV W`` rule) so Spark's truncating DIV
    and pandas' ``//`` agree on NEGATIVE sources too; a value computed
    by one client always validates in the other."""
    from pyspark.sql import functions as F

    src = F.col(g["src"])
    fn = g["fn"]
    if fn == "year":
        return F.year(src).cast("int")
    if fn == "month":
        return F.month(src).cast("int")
    if fn == "yyyymm":
        return (F.year(src) * 100 + F.month(src)).cast("int")
    if fn == "substr":
        return src.substr(int(g["pos"]), int(g["len"]))
    if fn == "pmod":
        return F.pmod(src.cast("long"), F.lit(int(g["n"]))).cast("long")
    if fn == "div":
        s, n = g["src"], int(g["n"])
        return F.expr(
            f"CAST(({s} - ((({s} % {n}) + {n}) % {n})) DIV {n} AS BIGINT)"
        )
    raise ValueError(f"unknown generated fn {fn!r}")


def _apply_generated_spark(table: TableLog, df):
    """Materialize generated columns on a write: ABSENT columns are
    computed (the normal path — writers never hand-maintain them);
    PRESENT columns are VALIDATED against the generation expression
    row by row (Delta's contract: you may supply the value, but it
    must be the generated one) with the filter-on-assert spelling, so
    a drifted value fails the write instead of corrupting the derived
    column downstream pruning relies on."""
    gens = table.generated()
    if not gens:
        return df
    from pyspark.sql import functions as F

    for col in sorted(gens):
        expr = _generated_expr_spark(gens[col])
        if col in df.columns:
            df = df.filter(
                F.assert_true(
                    F.col(col).eqNullSafe(expr),
                    F.concat(
                        F.lit(f"generated column '{col}' mismatch: "),
                        F.col(col).cast("string"),
                    ),
                ).isNull()
            )
        else:
            df = df.withColumn(col, expr)
    return df


def _apply_generated_pandas(table: TableLog, frame):
    """pandas-client twin of `_apply_generated_spark` — same DSL, same
    compute-or-validate semantics, evaluated with pandas ops."""
    import pandas as pd

    gens = table.generated()
    if not gens:
        return frame
    frame = frame.copy()
    for col in sorted(gens):
        g = gens[col]
        src = frame[g["src"]]
        fn = g["fn"]
        # nullable dtypes end to end: a NULL source yields a NULL
        # generated value (Spark's F.year(NULL) semantics), never a
        # cast crash or a stringified 'nan'
        if fn == "year":
            val = pd.to_datetime(src).dt.year.astype("Int32")
        elif fn == "month":
            val = pd.to_datetime(src).dt.month.astype("Int32")
        elif fn == "yyyymm":
            dt = pd.to_datetime(src)
            val = (dt.dt.year * 100 + dt.dt.month).astype("Int32")
        elif fn == "substr":
            val = src.astype("string").str.slice(
                int(g["pos"]) - 1, int(g["pos"]) - 1 + int(g["len"])
            )
        elif fn == "pmod":
            val = src.astype("Int64") % int(g["n"])
        elif fn == "div":
            # FLOOR division, matching the Spark evaluator's
            # non-negative-mod spelling — agrees on negative sources
            v = src.astype("Int64")
            val = (v - ((v % int(g["n"])) + int(g["n"])) % int(g["n"])
                   ) // int(g["n"])
        else:
            raise ValueError(f"unknown generated fn {fn!r}")
        if col in frame.columns:
            ok = ((frame[col] == val).fillna(False)
                  | (frame[col].isna() & val.isna()))
            if not ok.all():
                raise ValueError(
                    f"generated column '{col}' mismatch in "
                    f"{int((~ok).sum())} row(s)"
                )
        else:
            frame[col] = val
    return frame


def _identity_guard(table: TableLog, cols) -> str | None:
    """The identity column name, or None. GENERATED ALWAYS: a batch
    SUPPLYING the column is rejected — ids are engine-assigned only,
    in commit-reserved ranges (`TableLog.id_hwm`)."""
    ident = table.identity()
    if not ident:
        return None
    col = ident["col"]
    if col in cols:
        raise ValueError(
            f"identity column {col!r} is GENERATED ALWAYS — writers "
            "must not supply it"
        )
    return col


def _assign_identity_spark(up, key: str, col: str, start: int):
    """Stamp engine-assigned ids on a bucketed batch: ids are
    ``start + position`` in (_pb, key) order — computed as per-bucket
    row_number (parallel windows) plus driver-side cumulative bucket
    offsets (n_buckets scalars), so there is NO global sort or
    single-partition window at any batch size. Returns (stamped_df,
    n_ids). Costs one extra count job over the batch."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    counts = {int(r["_pb"]): r["n"] for r in
              up.groupBy("_pb").agg(F.count("*").alias("n")).collect()}
    off, acc = {}, 0
    for b in sorted(counts):
        off[b] = acc
        acc += counts[b]
    if not counts:
        return up.withColumn(col, F.lit(None).cast("long")), 0
    omap = F.create_map(*[x for b in sorted(off)
                          for x in (F.lit(b), F.lit(off[b]))])
    rn = F.row_number().over(W.partitionBy("_pb").orderBy(key))
    return up.withColumn(
        col,
        (F.lit(int(start)) + omap[F.col("_pb")] + rn - 1).cast("long"),
    ), acc


def _fill_identity_nulls_spark(df, key: str, col: str, start: int):
    """Assign fresh ids ONLY to rows whose identity is NULL (inserts in
    a MERGE); rows that inherited a base id keep it. Same (_pb, key)
    ordering discipline as `_assign_identity_spark`."""
    from pyspark.sql import functions as F

    have = df.filter(F.col(col).isNotNull())
    need = df.filter(F.col(col).isNull()).drop(col)
    filled, n = _assign_identity_spark(need, key, col, start)
    return have.unionByName(filled), n


def _unique_constraints(table: TableLog, key: str) -> dict:
    """UNIQUE specs ({"col": k, "unique": True}) — the primary-key
    contract Delta never shipped. Only the merge key is supported:
    MERGE/SYNC keep key-uniqueness by construction, so enforcement
    concentrates on the paths that can break it — blind APPENDs (batch
    vs batch-internal dups AND vs the live table) and dup-carrying
    un-versioned MERGE batches. Fail-mode only: there is no principled
    row to quarantine out of a duplicate pair."""
    out = {}
    for n, c in sorted(table.constraints().items()):
        if c.get("unique"):
            if c["col"] != key:
                raise ValueError(
                    f"UNIQUE constraint {n!r} targets {c['col']!r}; only "
                    f"the merge key {key!r} is supported"
                )
            if c.get("on_violation") == "quarantine":
                raise ValueError(
                    f"UNIQUE constraint {n!r}: quarantine mode is not "
                    "supported (no principled row to divert)"
                )
            out[n] = c
    return out


def _check_batch_unique_spark(df, key: str, name: str) -> None:
    from pyspark.sql import functions as F

    a = df.agg(F.count(key).alias("n"),
               F.countDistinct(key).alias("d")).collect()[0]
    if a.n != a.d:
        raise ValueError(
            f"UNIQUE constraint '{name}' violated: {a.n - a.d} duplicate "
            f"key(s) within the batch"
        )


def _check_batch_unique_pandas(frame, key: str, name: str) -> None:
    dups = int(frame[key].duplicated().sum())
    if dups:
        raise ValueError(
            f"UNIQUE constraint '{name}' violated: {dups} duplicate "
            f"key(s) within the batch"
        )


def _constraint_guard_spark(df, constraints: dict):
    """Wrap ``df`` so the NEXT job over it fails on any CHECK-violating
    row (assert_true inside a filter — evaluated executor-side in the
    same stage, no extra pass; the filter-on-assert spelling survives
    column pruning, see the CDF dup-key guard). Range checks pass NULL
    rows unless not_null is also declared — SQL CHECK semantics. Only
    fail-mode constraints belong here; quarantine-mode ones go through
    `_apply_constraints_spark`.

    A constrained column ABSENT from the write (schema evolution: the
    merge NULL-backfills it) is every-row-NULL: range/isin checks pass
    by the NULL rule, not_null fails wholesale — rejected here with a
    clear error instead of an unresolved-column crash."""
    if not constraints:
        return df
    from pyspark.sql import functions as F

    cols = set(df.columns)
    for name in sorted(constraints):
        c = constraints[name]
        if c.get("unique"):
            continue  # set-level; enforced by the write paths directly
        if c["col"] not in cols:
            if c.get("not_null"):
                raise ValueError(
                    f"CHECK constraint '{name}': NOT NULL column "
                    f"{c['col']!r} is missing from this write entirely"
                )
            continue  # all-NULL: passes range/isin checks
        df = df.filter(
            F.assert_true(
                _constraint_ok_expr(c),
                F.concat(
                    F.lit(f"CHECK constraint '{name}' violated: "
                          f"{c['col']}="),
                    F.col(c["col"]).cast("string"),
                ),
            ).isNull()
        )
    return df


def quarantine_dir(table: TableLog) -> str:
    return os.path.join(table.path, "quarantine")


def read_quarantine(spark, table: TableLog):
    """The dead-letter area: every row a quarantine-mode constraint
    diverted, with ``_constraint`` (which expectation failed),
    ``_writer`` and ``_qts`` provenance columns. Empty-schema-safe only
    when something was quarantined — callers check `os.path.isdir`.

    Contract: AT-LEAST-ONCE, a superset of the diverted rows of
    committed writes. A diverted row is never lost, but the area may
    also hold rows from a write that later ABORTED (diversion happens
    pre-stage; a fail-mode clause or a lost OCC race can still kill
    the write afterwards) and duplicates from redelivered batches
    (see s28). Consumers dedup by key/payload — `reprocess_quarantine_
    spark` does — exactly like any redelivered DLQ."""
    return spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(quarantine_dir(table))


def vacuum_quarantine(table: TableLog, older_than: float) -> int:
    """DLQ retention: remove quarantine batches whose NEWEST row is
    older than ``older_than`` seconds — the dead-letter analog of
    `vacuum`'s age rail (diverted rows are audit data, not forever
    data). Batch-granular (a batch is one write's diversions, its
    mtime is its divert time), so a batch stays until ALL of it ages
    out. Returns the number of batches removed."""
    qroot = quarantine_dir(table)
    if not os.path.isdir(qroot):
        return 0
    cutoff = time.time() - older_than
    removed = 0
    for b in sorted(os.listdir(qroot)):
        p = os.path.join(qroot, b)
        try:
            if os.stat(p).st_mtime < cutoff:
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        except FileNotFoundError:
            continue
    return removed


def reprocess_quarantine_spark(
    spark,
    table: TableLog,
    writer: str = "reprocess",
    constraint: str | None = None,
) -> dict:
    """Replay dead-lettered rows through the normal MERGE path — the
    loop that CLOSES the expectations story: divert → fix the rules
    (ALTER/drop the expectation, or fix upstream) → replay. Rows are
    deduped on content first (the DLQ is at-least-once by contract,
    see s28) and re-enter through `merge_upsert_spark`, so the CURRENT
    constraint set re-judges them: rows that now pass land in the
    table; rows still violating a quarantine-mode expectation are
    RE-diverted with this writer's provenance; a fail-mode violation
    aborts the whole replay with the dead-letter area untouched.

    Only the quarantine batches present at the start are cleared —
    rows concurrent writers divert DURING the replay stay. With
    ``constraint``, only that expectation's rows replay; the rest are
    rewritten into a fresh batch before the old ones are removed (a
    crash between the two re-duplicates rows, which the at-least-once
    contract already absorbs). Per merge key only the LATEST-diverted
    payload replays (max ``_qts``) — replaying both versions of a
    twice-corrected row would plant duplicate keys through the blind
    MERGE. Returns merge stats + n_replayed + n_rediverted."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    key, _ = _resolve_layout(table, None, None)
    qroot = quarantine_dir(table)
    batches = sorted(
        b for b in (os.listdir(qroot) if os.path.isdir(qroot) else [])
        if os.path.isdir(os.path.join(qroot, b))
    )
    if not batches:
        return {"n_replayed": 0, "n_rediverted": 0}
    paths = [os.path.join(qroot, b) for b in batches]
    all_rows = spark.read.option("mergeSchema", "true").parquet(*paths)
    take = all_rows if constraint is None else all_rows.filter(
        F.col("_constraint") == constraint
    )
    rn = F.row_number().over(
        W.partitionBy(key).orderBy(F.col("_qts").desc())
    )
    replay_df = (
        take.withColumn("_rn", rn).filter(F.col("_rn") == 1)
        .drop("_rn", "_constraint", "_writer", "_qts")
    )
    n = replay_df.count()
    if n == 0:
        return {"n_replayed": 0, "n_rediverted": 0}
    st = merge_upsert_spark(spark, table, replay_df, writer=writer)
    if constraint is not None:
        rest = all_rows.filter(F.col("_constraint") != constraint)
        out = os.path.join(qroot, uuid.uuid4().hex)
        rest.write.mode("overwrite").parquet(out)
        if not any(f.endswith(".parquet") and
                   pq_file_nonempty(os.path.join(out, f))
                   for f in os.listdir(out)):
            shutil.rmtree(out, ignore_errors=True)
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    # the arrival-order manifest (storage seam) describes batches that
    # no longer exist; drop it when the DLQ empties so "quarantine
    # clean" means an EMPTY directory
    if not any(os.path.isdir(os.path.join(qroot, b))
               for b in os.listdir(qroot)):
        with contextlib.suppress(OSError):
            os.unlink(os.path.join(qroot, "_arrival.json"))
    return dict(st, n_replayed=n, n_rediverted=st["quarantined"])


def pq_file_nonempty(path: str) -> bool:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows > 0


#: above this file count, schema unification goes back to Spark's
#: distributed mergeSchema job — serial driver-side footer reads would
#: become the bottleneck (the _plan_bucket_state threshold discipline
#: applied to schema resolution)
SCHEMA_MERGE_DRIVER_MAX_FILES = 64


def read_files_merged(spark, paths):
    """``spark.read.option("mergeSchema", "true").parquet(*paths)``
    with the schema union computed DRIVER-SIDE from the parquet
    footers when the file list is small (r9 optimization, guide §1.2):
    Spark's mergeSchema resolves the union schema with a distributed
    job over the footers, so every snapshot/base/CDF read paid one
    extra Spark job of pure scheduling constant. For the bounded file
    lists this table layer reads per operation (a MERGE's touched
    buckets, one commit's adds/removes), pyarrow reads the same
    footers in single-digit milliseconds and `unify_schemas` applies
    the same first-file-wins column order; the explicit schema then
    makes the actual scan job the ONLY job. Missing columns per file
    surface as NULL exactly as under mergeSchema. Any unification or
    conversion surprise (type promotion across files, exotic logical
    types) falls back to the distributed mergeSchema read, as does a
    file list past SCHEMA_MERGE_DRIVER_MAX_FILES — at 100 TB a
    thousand-file read WANTS the distributed resolution."""
    paths = list(paths)
    if 0 < len(paths) <= SCHEMA_MERGE_DRIVER_MAX_FILES:
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            merged = pa.unify_schemas(
                [pq.read_schema(p) for p in paths])
            schema = from_arrow_schema(merged)
            return spark.read.schema(schema).parquet(*paths)
        except Exception:
            pass
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def _fk_parent_keys_spark(spark, child: TableLog, c: dict, probe_df):
    """The referenced parent's live key set, pruned to the buckets the
    batch's FK values can land in (bucket ids are a bounded collect —
    at most n_buckets — so planning stays O(1) to the driver), DV
    folded, distinct. Captures the parent's ``fk_del_epoch`` on the
    CHILD instance first, so the membership check and the commit-time
    fence agree on what state was validated (a parent delete after the
    capture trips the gate/fence and restarts the write)."""
    from pyspark.sql import functions as F

    fk = c["foreign_key"]
    parent = TableLog(fk["parent"])
    _fk_note_seen(child, parent.path, parent.fk_del_epoch())
    pkey, n_b = parent.layout()
    if pkey is None:
        raise ValueError(
            f"FK parent {fk['parent']} has no persisted layout")
    pkey_p = parent.physical_name(pkey)
    col = c["col"]
    bks = {int(r["b"]) for r in probe_df
           .filter(F.col(col).isNotNull())
           .select(_bucket_expr(col, n_b, parent.hash_buckets())
                   .alias("b")).distinct().collect()}
    files = parent.live_paths(bks)
    if not files:
        from distribot_spark.session import local_rows_df

        return local_rows_df(spark, [], "_fk_pk long")
    base = read_files_merged(spark, files).select(pkey_p)
    names = {os.path.basename(p) for p in files}
    dvmap = {f: ds for f, ds in parent.live_dvs().items() if f in names}
    base = _apply_dvs(spark, parent, base, pkey_p, dvmap, files=names)
    return base.select(F.col(pkey_p).alias("_fk_pk")).distinct()


def _apply_fk_spark(spark, table: TableLog, df, fkcons: dict,
                    writer: str):
    """FOREIGN KEY enforcement for Spark writers: each batch row's FK
    value must exist in the parent's live key set (NULL passes — SQL
    MATCH SIMPLE). Fail-mode violations abort executor-side via the
    filter-on-assert spelling (no extra pass); quarantine-mode rows
    come back as a tag column for the shared DLQ write. The join's
    parent side is the bucket-pruned distinct key set — it scales with
    the batch's bucket span, never the parent."""
    from functools import reduce

    from pyspark.sql import functions as F

    tags = []
    for name in sorted(fkcons):
        c = fkcons[name]
        col = c["col"]
        if col not in df.columns:
            continue  # all-NULL column (schema evolution): FK passes
        pkeys = _fk_parent_keys_spark(spark, table, c, df)
        flag = f"_fk_bad_{name}"
        # no broadcast hint: the pruned parent key set is small for a
        # narrow batch but can approach the parent for a wide one —
        # AQE picks broadcast when the runtime size allows
        df = (df.join(pkeys.withColumnRenamed(
                  "_fk_pk", f"_fk_pk_{name}"),
                  F.col(col) == F.col(f"_fk_pk_{name}"), "left")
              .withColumn(flag, F.col(col).isNotNull()
                          & F.col(f"_fk_pk_{name}").isNull())
              .drop(f"_fk_pk_{name}"))
        if c.get("on_violation", "fail") == "fail":
            df = df.filter(
                F.assert_true(
                    ~F.col(flag),
                    F.concat(
                        F.lit(f"FOREIGN KEY constraint '{name}' "
                              f"violated: {col}="),
                        F.col(col).cast("string"),
                        F.lit(" has no parent row"),
                    ),
                ).isNull()
            ).drop(flag)
        else:
            tags.append((name, flag))
    return df, tags


def _apply_constraints_spark(spark, table: TableLog, df, writer: str,
                             observe_exprs=None):
    """Split CHECK enforcement by each constraint's ``on_violation``
    policy (dlt's expectations): ``fail`` (default) aborts the write
    inside the stage job; ``quarantine`` DIVERTS violating rows to the
    table's dead-letter area tagged with the failed constraint and
    keeps the write going with the clean rows — the production posture
    for dirty upstream feeds, where one bad row must not stall the
    pipeline but must also never silently vanish. Returns
    (clean_df, n_quarantined, quarantine_dir_or_None — so a write
    restarted by a racing ALTER can retract its stale diversions,
    observed_metrics_or_None).
    The quarantine write is one extra job and only runs when
    quarantine-mode constraints exist. FOREIGN KEY specs are enforced
    here too (`_apply_fk_spark`): fail-mode aborts in-stage, and
    quarantine-mode FK rows flow into the SAME dead-letter write and
    the same retraction contract as CHECK rows.

    Two r9 optimizations (guide §1.2 — don't recompute what one job
    already evaluated):

    - The tagged frame is pinned (row-format lazy localCheckpoint)
      before the dead-letter write, so the caller's later jobs over
      the CLEAN rows (bucket discovery, the staged rewrite) read the
      pinned result instead of re-running the whole update lineage —
      which for FK tables re-ran the parent key scan + membership
      join once per job. The quarantine write evaluates the full
      lineage exactly once either way; the pin just keeps it.
    - ``observe_exprs``: aggregate expressions the caller wants
      computed over the tagged rows (clean AND diverted) DURING the
      dead-letter write job (`Dataset.observe`) — e.g. the MERGE's
      touched-bucket set, saving its one-per-write planning action.
      Returned as the 4th element; None when no dead-letter job ran
      (then nothing was observed and the caller runs its own action).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    cons = table.constraints()
    if not cons:
        return df, 0, None, None
    fkcons = {n: c for n, c in cons.items() if c.get("foreign_key")}
    cons = {n: c for n, c in cons.items() if not c.get("foreign_key")}
    fk_tags: list = []
    if fkcons:
        df, fk_tags = _apply_fk_spark(spark, table, df, fkcons, writer)
    fail = {n: c for n, c in cons.items()
            if c.get("on_violation", "fail") == "fail"}
    quar = {n: c for n, c in cons.items()
            if c.get("on_violation") == "quarantine"}
    df = _constraint_guard_spark(df, fail)
    # missing-column semantics (schema evolution): all-NULL column —
    # not_null diverts EVERY row, range/isin checks pass (drop them)
    cols = set(df.columns)
    all_bad = sorted(n for n, c in quar.items()
                     if c["col"] not in cols and c.get("not_null"))
    quar = {n: c for n, c in quar.items() if c["col"] in cols}
    if all_bad:
        quar = dict(quar)  # tag everything with the first such name
        quar[all_bad[0]] = {"col": df.columns[0], "not_null": False,
                            "_always": True}
    if not quar and not fk_tags:
        return df, 0, None, None
    # first failing constraint name per row (NULL = clean)
    tag = reduce(
        lambda acc, name: acc.when(
            F.lit(True) if quar[name].get("_always")
            else ~_constraint_ok_expr(quar[name]), F.lit(name)
        ),
        sorted(quar),
        F.when(F.lit(False), F.lit(None)),
    )
    for name, flag in fk_tags:  # quarantine-mode FK joins the same DLQ
        tag = tag.when(F.col(flag), F.lit(name))
    tagged = df.withColumn("_constraint", tag).drop(
        *[flag for _, flag in fk_tags])
    # pin ONCE: the dead-letter write below evaluates the full update
    # lineage (FK parent scans included) — keep that result so the
    # caller's clean-row jobs re-read it instead of re-deriving it
    tagged = tagged.localCheckpoint(eager=False)
    obs = None
    src = tagged
    if observe_exprs:
        from pyspark.sql import Observation

        obs = Observation()
        src = tagged.observe(obs, *observe_exprs)
    out = os.path.join(quarantine_dir(table), uuid.uuid4().hex)
    bad = src.filter(F.col("_constraint").isNotNull()).withColumn(
        "_writer", F.lit(writer)
    ).withColumn("_qts", F.lit(time.time()))
    bad.write.mode("overwrite").parquet(out)
    import pyarrow.parquet as pq

    nq = sum(
        pq.read_metadata(os.path.join(out, p)).num_rows
        for p in os.listdir(out) if p.endswith(".parquet")
    )
    if nq == 0:
        shutil.rmtree(out, ignore_errors=True)
    clean = tagged.filter(F.col("_constraint").isNull()).drop("_constraint")
    return clean, nq, (out if nq else None), (obs.get if obs else None)


def _fk_parent_keys_pandas(child: TableLog, c: dict, vals) -> set:
    """pandas-client twin of `_fk_parent_keys_spark`: the parent's live
    key set for exactly the probe values' buckets, DV-subtracted, via
    pyarrow column reads — no JVM. Same epoch capture contract."""
    fk = c["foreign_key"]
    parent = TableLog(fk["parent"])
    _fk_note_seen(child, parent.path, parent.fk_del_epoch())
    pkey, n_b = parent.layout()
    if pkey is None:
        raise ValueError(
            f"FK parent {fk['parent']} has no persisted layout")
    pkey_p = parent.physical_name(pkey)
    hashed = parent.hash_buckets()
    bks = {_bucket_of_py(int(v), n_b, hashed) for v in vals}
    _, live = parent.snapshot()
    dvs = parent.live_dvs()
    keys: set = set()
    for f in sorted(live):
        if live[f] not in bks:
            continue
        # canonical fold (file-scoped sidecar rows, key AND positional
        # kinds), column-pruned to the parent key
        tbl = _arrow_minus_dvs(parent, f, dvs.get(f, ()),
                               columns=[pkey_p])
        keys |= set(tbl[pkey_p].to_pylist())
    return keys


def _apply_fk_pandas(table: TableLog, frame, fkcons: dict):
    """FK enforcement for the JVM-free client: fail-mode raises before
    staging; quarantine-mode returns {name: bad row mask} for the
    shared DLQ tagging. NULL FK values pass (SQL MATCH SIMPLE)."""
    import pandas as pd

    masks: dict = {}
    for name in sorted(fkcons):
        c = fkcons[name]
        col = c["col"]
        if col not in frame.columns:
            continue  # all-NULL column: FK passes
        s = frame[col]
        vals = set(s.dropna().unique().tolist())
        pkeys = _fk_parent_keys_pandas(table, c, vals) if vals else set()
        bad = s.notna() & ~s.isin(pkeys)
        if c.get("on_violation", "fail") == "fail":
            if bad.any():
                raise ValueError(
                    f"FOREIGN KEY constraint '{name}' violated by "
                    f"{int(bad.sum())} row(s): {col} has no parent row")
        elif bad.any():
            masks[name] = bad
    return masks


def _apply_constraints_pandas(table: TableLog, frame, writer: str):
    """pandas-client half of policy-split enforcement: fail-mode raises
    before staging, quarantine-mode writes the diverted rows and
    returns (clean_frame, n_quarantined). FOREIGN KEY specs enforce
    here too, mirroring `_apply_constraints_spark` exactly — including
    tag priority (CHECK names outrank FK names, smallest name wins
    within each family)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cons = table.constraints()
    if not cons:
        return frame, 0, None
    fkcons = {n: c for n, c in cons.items() if c.get("foreign_key")}
    cons = {n: c for n, c in cons.items() if not c.get("foreign_key")}
    fk_masks = _apply_fk_pandas(table, frame, fkcons) if fkcons else {}
    fail = {n: c for n, c in cons.items()
            if c.get("on_violation", "fail") == "fail"}
    quar = {n: c for n, c in cons.items()
            if c.get("on_violation") == "quarantine"}
    _constraint_guard_pandas(frame, fail)
    if not quar and not fk_masks:
        return frame, 0, None
    import pandas as pd

    tag = pd.Series([None] * len(frame), index=frame.index, dtype=object)
    for name in sorted(quar, reverse=True):  # first name wins, like Spark
        c = quar[name]
        if c["col"] not in frame.columns:
            if c.get("not_null"):  # all-NULL column: every row diverted
                tag[:] = name
            continue  # all-NULL passes range/isin checks
        s = frame[c["col"]]
        bad = pd.Series(False, index=frame.index)
        if c.get("not_null"):
            bad |= s.isna()
        if "min" in c:
            bad |= s.notna() & (s < c["min"])
        if "max" in c:
            bad |= s.notna() & (s > c["max"])
        if "isin" in c:
            bad |= s.notna() & ~s.isin(list(c["isin"]))
        if "min_len" in c:
            bad |= s.notna() & (s.astype(str).str.len() < int(c["min_len"]))
        if "max_len" in c:
            bad |= s.notna() & (s.astype(str).str.len() > int(c["max_len"]))
        tag[bad] = name
    fk_tag = pd.Series([None] * len(frame), index=frame.index,
                       dtype=object)
    for name in sorted(fk_masks, reverse=True):  # smallest name wins
        fk_tag[fk_masks[name]] = name
    tag[tag.isna() & fk_tag.notna()] = fk_tag  # CHECK outranks FK
    bad_mask = tag.notna()
    nq = int(bad_mask.sum())
    if nq:
        q = frame[bad_mask].copy()
        q["_constraint"] = tag[bad_mask]
        q["_writer"] = writer
        q["_qts"] = time.time()
        out = os.path.join(quarantine_dir(table), uuid.uuid4().hex)
        os.makedirs(out, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(q, preserve_index=False),
                       os.path.join(out, "part-0.parquet"))
        return frame[~bad_mask], nq, out
    return frame[~bad_mask], nq, None


def _constraint_guard_pandas(frame, constraints: dict) -> None:
    """pandas-client half of CHECK enforcement: same DSL, same
    semantics, raises ValueError before anything is staged. A
    constrained column absent from the frame is all-NULL (schema
    evolution): range/isin pass, not_null fails wholesale."""
    if not constraints:
        return
    import pandas as pd

    for name in sorted(constraints):
        c = constraints[name]
        if c.get("unique"):
            continue  # set-level; enforced by the write paths directly
        if c["col"] not in frame.columns:
            if c.get("not_null"):
                raise ValueError(
                    f"CHECK constraint '{name}' violated: NOT NULL "
                    f"column {c['col']!r} missing from this write"
                )
            continue
        s = frame[c["col"]]
        bad = pd.Series(False, index=frame.index)
        if c.get("not_null"):
            bad |= s.isna()
        if "min" in c:
            bad |= s.notna() & (s < c["min"])
        if "max" in c:
            bad |= s.notna() & (s > c["max"])
        if "isin" in c:
            bad |= s.notna() & ~s.isin(list(c["isin"]))
        if "min_len" in c:
            bad |= s.notna() & (s.astype(str).str.len() < int(c["min_len"]))
        if "max_len" in c:
            bad |= s.notna() & (s.astype(str).str.len() > int(c["max_len"]))
        if bad.any():
            raise ValueError(
                f"CHECK constraint '{name}' violated by "
                f"{int(bad.sum())} row(s) on column {c['col']!r}"
            )


def alter_add_constraint_spark(
    spark,
    table: TableLog,
    name: str,
    spec: dict,
    key: str | None = None,
    writer: str = "alter",
    max_attempts: int = 20,
    pre_commit_hook=None,
) -> dict:
    """ALTER TABLE ADD CONSTRAINT on a live multi-writer table (Delta's
    ``ADD CONSTRAINT``, which validates existing rows first). Fully
    serializable against concurrent data writers WITHOUT making them
    take a lock, by routing the ALTER through the commit log:

    1. validate the head snapshot v (fail-mode constraints only — a
       quarantine-mode expectation governs future writes, it does not
       retro-divert existing rows);
    2. under the meta lock (ALTER-vs-ALTER only), persist the new
       constraint set with a bumped ``constraints_rev``;
    3. commit an EMPTY version v+1 as a BARRIER. If the link wins,
       every in-flight writer that applied the OLD constraints must
       still be holding a parent ≤ v, so its own try_commit loses and
       its retry loop re-checks ``constraints_rev`` — forcing it to
       restage under the new set (`_reapply_on_constraint_change`). If
       OUR link loses, some commit landed after our validation: roll
       the meta back (re-persisted under a fresh rev — monotonic, no
       ABA) and re-validate against the new head.

    The one-winner version link is the linearization point for BOTH
    sides,
    so there is no window where a row that violates the constraint can
    land after validation — the failure mode of lock-free metadata
    changes on object stores. The barrier commit also lands in
    DESCRIBE HISTORY, like Delta's ALTER commits.

    ``key`` names the merge key so validation folds deletion vectors
    (a DV-deleted violating row must not block the ALTER); it defaults
    to the table's persisted layout. Returns
    {committed_version, attempts}. ``pre_commit_hook`` (tests) runs
    between the meta persist and the barrier commit."""
    if "col" not in spec:
        raise ValueError("constraint spec needs a 'col'")
    if spec.get("unique"):
        pkey = key if key is not None else table.layout()[0]
        if pkey is None or spec["col"] != pkey:
            raise ValueError(
                f"UNIQUE constraint must target the merge key {pkey!r}"
            )
        if spec.get("on_violation") == "quarantine":
            raise ValueError("UNIQUE does not support quarantine mode")
    is_fail = spec.get("on_violation", "fail") == "fail"
    attempts = 0
    while attempts < max_attempts:
        attempts += 1
        if name in table.constraints():  # pre-validation fast fail; the
            # authoritative check re-runs under the meta lock below
            raise ValueError(f"constraint {name!r} already exists")
        v = table.version()
        if is_fail and v >= 0:
            df = read_snapshot_spark(spark, table, version=v, dv_key=key)
            if spec.get("unique"):
                from pyspark.sql import functions as F
                nbad = df.groupBy(spec["col"]).count().filter(
                    F.col("count") > 1
                ).count()
            elif spec.get("foreign_key"):
                # every existing non-NULL FK value must have a parent
                # row; the capture inside _fk_parent_keys_spark also
                # arms the barrier commit's cross-table fence
                from pyspark.sql import functions as F
                if spec["col"] in df.columns:
                    pkeys = _fk_parent_keys_spark(spark, table, spec, df)
                    nbad = (df.filter(F.col(spec["col"]).isNotNull())
                            .join(pkeys,
                                  F.col(spec["col"]) == F.col("_fk_pk"),
                                  "left_anti").count())
                else:
                    nbad = 0  # all-NULL column: FK passes
            else:
                nbad = df.filter(~_constraint_ok_expr(spec)).count()
            if nbad:
                raise ValueError(
                    f"cannot add CHECK constraint {name!r}: {nbad} "
                    f"existing row(s)/key(s) violate it "
                    f"(column {spec['col']!r})"
                )
        with table._meta_lock():
            meta = table._meta()
            cons = dict(meta.get("constraints") or {})
            if name in cons:
                raise ValueError(f"constraint {name!r} already exists")
            old_cons = dict(cons)
            cons[name] = dict(spec)
            meta["constraints"] = cons
            meta["constraints_rev"] = int(meta.get("constraints_rev", 0)) + 1
            table._persist_meta(meta)
            if pre_commit_hook is not None:
                pre_commit_hook(v)
            if table.try_commit(v, [], [], writer):
                return {"committed_version": v + 1, "attempts": attempts}
            # a data commit beat the barrier: its rows were never
            # validated — retract the constraint (fresh rev) and retry
            # the validation against the new head
            meta = table._meta()
            meta["constraints"] = old_cons
            meta["constraints_rev"] = int(meta.get("constraints_rev", 0)) + 1
            table._persist_meta(meta)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


def alter_drop_constraint(table: TableLog, name: str) -> None:
    """ALTER TABLE DROP CONSTRAINT. No validation and no commit-log
    barrier: loosening the set mid-write only means an in-flight writer
    enforced a STRICTER rule than required (it still restarts via the
    rev check if it hasn't committed yet — rows it would have rejected
    or diverted under the dropped rule get re-admitted on the retry)."""
    with table._meta_lock():
        meta = table._meta()
        cons = dict(meta.get("constraints") or {})
        if name not in cons:
            raise KeyError(f"no such constraint: {name}")
        del cons[name]
        meta["constraints"] = cons
        meta["constraints_rev"] = int(meta.get("constraints_rev", 0)) + 1
        table._persist_meta(meta)


def _fk_refuse(table: TableLog, op: str) -> None:
    """SYNC and RESTORE rewrite table state wholesale — re-proving
    referential integrity would mean revalidating both sides entirely,
    so tables in ANY foreign-key relationship refuse them loudly (the
    documented boundary, like identity×sync)."""
    if table.fk_specs():
        raise ValueError(
            f"{op} on a table with FOREIGN KEY constraints is not "
            "supported: drop the foreign key(s) first")
    if table.fk_referenced_by():
        raise ValueError(
            f"{op} on an FK-referenced parent is not supported: "
            "children's integrity cannot be preserved — drop the "
            "foreign key(s) first")


def _fk_deregister(parent: TableLog, name: str, child_path: str) -> None:
    with parent._meta_lock():
        meta = parent._meta()
        refs = [r for r in (meta.get("fk_referenced_by") or [])
                if not (r["name"] == name and r["child"] == child_path)]
        meta["fk_referenced_by"] = refs
        parent._persist_meta(meta)


def alter_add_foreign_key(
    spark,
    child: TableLog,
    name: str,
    col: str,
    parent_path: str,
    on_violation: str = "fail",
    writer: str = "alter-fk",
) -> dict:
    """ALTER TABLE ADD FOREIGN KEY — cross-table referential integrity
    on the governance layer (the constraint Delta/Iceberg never
    shipped; completes CHECK/UNIQUE/GENERATED/IDENTITY). ``col`` must
    reference the parent's MERGE KEY (existence against the bucketed,
    DV-folded live key set is then a bucket-pruned single-column probe,
    and MERGE semantics keep it meaningful).

    Protocol: the back-reference registers in the PARENT's metadata
    FIRST (conservative — the parent starts restrict-checking and
    fencing before the child even enforces), then the child side runs
    the standard ALTER barrier (`alter_add_constraint_spark`):
    validate existing rows → persist under a bumped constraints_rev →
    empty barrier commit that restarts in-flight writers. A failed
    validation deregisters the back-reference. Enforcement from then
    on: every child write proves membership (fail or quarantine mode),
    every parent DELETE/PURGE proves no live child reference
    (RESTRICT), and the cross-log write-skew window is closed by the
    epoch fence in `try_commit`. Self-referencing FKs (hierarchies) are
    supported; the restrict scan then ignores child rows that are
    themselves being deleted (so deleting a closed subtree works).

    Boundaries (loud, documented): SYNC and RESTORE refuse tables in
    any FK relationship (both rewrite state wholesale — re-proving
    integrity would mean revalidating everything), and tombstone purge
    refuses referenced parents."""
    parent = TableLog(parent_path)
    pkey, _nb = parent.layout()
    if pkey is None:
        raise ValueError(
            f"FK parent {parent_path} has no persisted layout "
            "(the referenced column must be its merge key)")
    spec = {"col": col,
            "foreign_key": {"parent": parent_path, "parent_key": pkey}}
    if on_violation != "fail":
        spec["on_violation"] = on_violation
    with parent._meta_lock():
        meta = parent._meta()
        refs = list(meta.get("fk_referenced_by") or [])
        if any(r["name"] == name and r["child"] == child.path
               for r in refs):
            raise ValueError(f"foreign key {name!r} already registered")
        refs.append({"name": name, "child": child.path, "col": col})
        meta["fk_referenced_by"] = refs
        # the birth of an FK is itself a fence event: a key-removal
        # mid-flight on this parent (validated when no child existed)
        # must restart and re-scan, or it could link after our child
        # validation and orphan the freshly-constrained rows
        meta["fk_ref_epoch"] = int(meta.get("fk_ref_epoch", 0)) + 1
        parent._persist_meta(meta)
    try:
        return alter_add_constraint_spark(spark, child, name, spec,
                                          writer=writer)
    except BaseException:
        _fk_deregister(parent, name, child.path)
        raise


def alter_drop_foreign_key(child: TableLog, name: str) -> None:
    """ALTER TABLE DROP FOREIGN KEY: stop child enforcement first
    (constraints_rev bump restarts in-flight writers), then release the
    parent's back-reference — between the two the parent merely
    restrict-checks a dropped FK (conservative, never unsafe)."""
    spec = child.fk_specs().get(name)
    if spec is None:
        raise KeyError(f"no such foreign key: {name}")
    alter_drop_constraint(child, name)
    _fk_deregister(TableLog(spec["foreign_key"]["parent"]), name,
                   child.path)


def _fk_restrict_spark(spark, table: TableLog, keys_df, key: str) -> None:
    """RESTRICT half of FK enforcement: refuse a key-removal whose keys
    any live child row still references. One column-pruned scan of
    each registered child's FK column (DV-folded); the deleted-key set
    joins in as the probe. Captures ``fk_ref_epoch`` BEFORE scanning —
    `try_commit(fk_removal=True)` verifies it unchanged under the meta
    lock, so a child insert racing the scan restarts the removal."""
    _fk_note_ref(table, table.fk_ref_epoch())  # BEFORE reading refs:
    # the fence must stay armed even when no child is registered YET
    refs = table.fk_referenced_by()
    if not refs:
        return
    from pyspark.sql import functions as F

    probe = keys_df.select(F.col(key).alias("_del_k")).distinct()
    for r in refs:
        child = TableLog(r["child"])
        col = child.physical_name(r["col"])
        ckey_l, _ = child.layout()
        ckey = child.physical_name(ckey_l) if ckey_l else None
        files = child.live_paths()
        if not files:
            continue
        sel = [col] + ([ckey] if ckey and ckey != col else [])
        base = read_files_merged(spark, files).select(*sel)
        names = {os.path.basename(p) for p in files}
        dvmap = {f: ds for f, ds in child.live_dvs().items()
                 if f in names}
        if dvmap and ckey:
            base = _apply_dvs(spark, child, base, ckey, dvmap,
                              files=names)
        if child.path == table.path and ckey:
            # self-FK: rows being deleted don't count as referrers —
            # deleting a closed subtree must succeed
            base = base.join(
                probe.withColumnRenamed("_del_k", ckey).select(ckey),
                ckey, "left_anti")
        n = (base.select(F.col(col).alias("_del_k"))
             .join(F.broadcast(probe), "_del_k", "left_semi").count())
        if n:
            raise ValueError(
                f"FOREIGN KEY '{r['name']}' RESTRICT: {n} live row(s) "
                f"in child {r['child']} still reference deleted key(s)")


def _fk_restrict_pandas(table: TableLog, kset: set) -> None:
    """pandas twin of `_fk_restrict_spark` — same scan, pyarrow column
    reads, same epoch capture contract."""
    _fk_note_ref(table, table.fk_ref_epoch())
    refs = table.fk_referenced_by()
    if not refs:
        return
    for r in refs:
        child = TableLog(r["child"])
        col = child.physical_name(r["col"])
        ckey_l, _ = child.layout()
        ckey = child.physical_name(ckey_l) if ckey_l else None
        _, live = child.snapshot()
        dvs = child.live_dvs()
        n = 0
        for f in sorted(live):
            cols = [col] + ([ckey] if ckey and ckey != col else [])
            # canonical fold (file-scoped, key + positional sidecars);
            # a layout-less child can hold no DVs, so skip the fold
            frame = _arrow_minus_dvs(
                child, f, dvs.get(f, ()) if ckey else (),
                columns=cols).to_pandas()
            if ckey and child.path == table.path:
                # self-FK: rows being deleted don't count as referrers
                frame = frame[~frame[ckey].isin(kset)]
            n += int(frame[col].isin(kset).sum())
        if n:
            raise ValueError(
                f"FOREIGN KEY '{r['name']}' RESTRICT: {n} live row(s) "
                f"in child {r['child']} still reference deleted key(s)")


# -- column mapping: translation + ALTER ------------------------------------


def _reserved_physical(table: TableLog) -> set[str]:
    """Physical names a NEW logical column may not take: every mapped
    physical (another logical column owns those bytes) and every
    dropped physical (old files still carry them; reuse would
    resurrect dead data into the new column)."""
    return set(table.column_mapping().values()) | set(
        table.dropped_columns())


def _check_reserved_columns(table: TableLog, cols) -> None:
    mapping = table.column_mapping()
    reserved = _reserved_physical(table)
    bad = [c for c in cols if c not in mapping and c in reserved]
    if bad:
        raise ValueError(
            f"column name(s) {bad} are reserved PHYSICAL names (taken "
            "by a renamed or dropped column); write under the current "
            "logical names"
        )


def _to_physical_spark(table: TableLog, df):
    """Translate a writer's LOGICAL batch to the PHYSICAL column names
    files store — after this every downstream step (bucketing, base
    merge, staging, DV sidecars) runs in physical space, so old and
    new files stay byte-compatible across any number of renames.
    Rejects batch columns that collide with reserved physical names.
    Sparse-mapping select-with-alias (not withColumnsRenamed — its
    sequential map collides on swaps, the CLAUDE.md rule)."""
    mapping = table.column_mapping()
    if not mapping and not table.dropped_columns():
        return df
    _check_reserved_columns(table, df.columns)
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def _to_physical_pandas(table: TableLog, frame):
    mapping = table.column_mapping()
    if not mapping and not table.dropped_columns():
        return frame
    _check_reserved_columns(table, frame.columns)
    return frame.rename(
        columns={c: mapping[c] for c in frame.columns if c in mapping})


def _to_logical_spark(table: TableLog, df):
    """Reader-side translation AT SCAN: drop dropped physical columns,
    rename physical back to logical. Applies uniformly to every
    version (Delta's mapping semantics: the CURRENT names label all
    history — which is what lets a CDF spanning a rename come out
    under one schema)."""
    mapping = table.column_mapping()
    dropped = set(table.dropped_columns())
    if not mapping and not dropped:
        return df
    from pyspark.sql import functions as F

    rev = {p: l for l, p in mapping.items()}
    keep = [c for c in df.columns if c not in dropped]
    return df.select(*[F.col(c).alias(rev.get(c, c)) for c in keep])


def _live_file_columns(table: TableLog) -> set[str]:
    """Union of PHYSICAL column names across live data files — footer
    reads only (the ANALYZE discipline). Used by ALTER RENAME to
    validate the target name; at cluster scale the logical schema
    would live in table metadata instead (Delta), making this free."""
    import pyarrow.parquet as pq

    cols: set[str] = set()
    _, live = table.snapshot()
    for f in live:
        try:
            cols.update(pq.read_schema(table.data_path(f)).names)
        except FileNotFoundError:
            continue
    return cols


def alter_rename_column(
    table: TableLog,
    old: str,
    new: str,
    writer: str = "alter-rename",
    max_attempts: int = 20,
    pre_commit_hook=None,
) -> dict:
    """ALTER TABLE RENAME COLUMN without rewriting a byte of data
    (Delta/Iceberg column mapping): persist logical->physical name
    mapping in the table metadata; readers translate at scan, writers
    translate batches before staging. Serialized against concurrent
    data writers by the SAME barrier discipline as ADD CONSTRAINT:
    persist the mapping under the meta lock with a bumped
    ``mapping_rev``, then commit an EMPTY barrier version — an
    in-flight writer that translated its batch under the old mapping
    loses the version race and its gate check
    (`_gate_state` carries mapping_rev) restarts the whole write,
    where a batch still carrying the OLD logical name now fails the
    reserved-physical check (the Delta behavior: stale-schema writes
    fail after a rename). If OUR barrier loses, the mapping is rolled
    back under a fresh rev (no ABA) and the ALTER retries.

    Table rules follow the rename atomically in the same meta write:
    CHECK-constraint columns, GENERATED src/output names, the IDENTITY
    column and the layout key are rewritten to the new logical name,
    so every writer resolves a consistent rule set."""
    if old == new:
        raise ValueError("rename to the same name")
    attempts = 0
    while attempts < max_attempts:
        attempts += 1
        v = table.version()
        with table._meta_lock():
            meta = table._meta()
            mapping = dict(meta.get("column_mapping") or {})
            dropped = set(meta.get("dropped_columns") or [])
            phys = mapping.get(old, old)
            if phys in dropped:
                raise ValueError(f"column {old!r} was dropped")
            # the target logical name must be FREE: not another mapped
            # logical, not a reserved physical (unless it is this very
            # column's physical — renaming back), not a physical column
            # some live file stores for a different logical column
            if new in mapping:
                raise ValueError(f"column {new!r} already exists")
            if new in (set(mapping.values()) | dropped) - {phys}:
                raise ValueError(
                    f"{new!r} is a reserved physical name")
            live_cols = _live_file_columns(table)
            logical_live = {
                ({p: l for l, p in mapping.items()}).get(c, c)
                for c in live_cols if c not in dropped
            }
            if new in logical_live - {old}:
                raise ValueError(
                    f"column {new!r} already exists in the table")
            if live_cols and phys not in live_cols and old not in mapping:
                raise ValueError(f"no such column: {old!r}")
            rollback = json.loads(json.dumps(meta))  # deep copy
            mapping.pop(old, None)
            if new != phys:
                mapping[new] = phys
            meta["column_mapping"] = mapping
            if mapping:
                _meta_add_feature(meta, "column-mapping")
            meta["mapping_rev"] = int(meta.get("mapping_rev", 0)) + 1
            # table rules follow the rename, atomically with it
            cons = dict(meta.get("constraints") or {})
            for nm, spec in cons.items():
                if spec.get("col") == old:
                    spec = dict(spec)
                    spec["col"] = new
                    cons[nm] = spec
            meta["constraints"] = cons
            gens = dict(meta.get("generated") or {})
            gens2 = {}
            for out_col, g in gens.items():
                g = dict(g)
                if g.get("src") == old:
                    g["src"] = new
                gens2[new if out_col == old else out_col] = g
            if gens2:
                meta["generated"] = gens2
            ident = meta.get("identity")
            if ident and ident.get("col") == old:
                meta["identity"] = {**ident, "col": new}
            if meta.get("key") == old:
                meta["key"] = new
            # access policies are LOGICAL-space: masks and row filters
            # follow the rename in the same atomic meta write, so no
            # read between ALTER and policy-fix can see the column
            # unmasked under its new name
            masks = dict(meta.get("masks") or {})
            if old in masks:
                masks[new] = masks.pop(old)
                meta["masks"] = masks
                meta["policies_rev"] = int(
                    meta.get("policies_rev", 0)) + 1
            filts = dict(meta.get("row_filters") or {})
            changed = False
            for nm, spec in filts.items():
                if spec.get("col") == old:
                    filts[nm] = {**spec, "col": new}
                    changed = True
            if changed:
                meta["row_filters"] = filts
                meta["policies_rev"] = int(
                    meta.get("policies_rev", 0)) + 1
            table._persist_meta(meta)
            if pre_commit_hook is not None:
                pre_commit_hook(v)
            if table.try_commit(v, [], [], writer):
                return {"committed_version": v + 1, "attempts": attempts}
            # a data commit beat the barrier: its batch was translated
            # (and validated) under the OLD mapping — retract ours
            # under a FRESH rev and retry against the new head
            rollback["mapping_rev"] = int(
                table._meta().get("mapping_rev", 0)) + 1
            table._persist_meta(rollback)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


def alter_drop_column(table: TableLog, name: str) -> None:
    """ALTER TABLE DROP COLUMN without rewrite: the column's PHYSICAL
    name goes on the reserved dropped list — readers exclude it at
    scan, writers reject batches still carrying it (after their gate
    restart), and the name can never be reused (reuse would resurrect
    the old files' bytes into the new column). No barrier commit: an
    in-flight writer that stages the column commits bytes readers
    never see — harmless, the drop-constraint precedent — while the
    mapping_rev bump still restarts any writer that has not committed.
    Columns load-bearing for table rules must be released first
    (explicit errors), the DROP COLUMN referenced-by contract."""
    with table._meta_lock():
        meta = table._meta()
        mapping = dict(meta.get("column_mapping") or {})
        if meta.get("key") == name:
            raise ValueError("cannot drop the merge key")
        ident = meta.get("identity")
        if ident and ident.get("col") == name:
            raise ValueError("cannot drop the identity column")
        for nm, spec in (meta.get("constraints") or {}).items():
            if spec.get("col") == name:
                raise ValueError(
                    f"column {name!r} is referenced by constraint "
                    f"{nm!r}; drop the constraint first")
        for out_col, g in (meta.get("generated") or {}).items():
            if out_col == name or g.get("src") == name:
                raise ValueError(
                    f"column {name!r} is part of generated column "
                    f"{out_col!r}; remove that first")
        if name in (meta.get("masks") or {}):
            raise ValueError(
                f"column {name!r} has a mask policy; drop the mask "
                "first (explicit release, the constraints precedent)")
        for nm, spec in (meta.get("row_filters") or {}).items():
            if spec.get("col") == name:
                raise ValueError(
                    f"column {name!r} is referenced by row filter "
                    f"{nm!r}; drop the filter first")
        phys = mapping.pop(name, name)
        dropped = list(meta.get("dropped_columns") or [])
        if phys in dropped:
            raise ValueError(f"column {name!r} was already dropped")
        dropped.append(phys)
        meta["column_mapping"] = mapping
        meta["dropped_columns"] = dropped
        _meta_add_feature(meta, "column-mapping")
        meta["mapping_rev"] = int(meta.get("mapping_rev", 0)) + 1
        table._persist_meta(meta)


# -- access policies: row-level security + column masking -------------------
#
# The read-side governance rung after constraints/generated/identity/column
# mapping: POLICIES live in table metadata and shape what a governed read
# RETURNS, per reader role (Databricks row filters & column masks, Snowflake
# masking policies). Design contract, in order of importance:
#
#   1. CURRENT policy governs EVERY read — including time travel and the
#      change feed. Security metadata is not versioned data: reading
#      `VERSION AS OF 3` after a mask was added returns version-3 ROWS under
#      TODAY's masks, so old snapshots are not an escape hatch.
#   2. Policies are LOGICAL-space: masks key on logical column names and
#      follow ALTER RENAME atomically (same meta write), die with DROP
#      COLUMN only via explicit release (the constraints precedent).
#   3. Row filters PRUNE, not post-filter: a filter's range clauses run
#      against the manifest min/max stats (and isin against per-file blooms)
#      so a governed read plans over the files a role may see — at 100 TB
#      RLS costs file-skipping, not a full scan plus a residual filter. The
#      residual predicate still applies (pruning is conservative).
#   4. The mask DSL is the same portability bet as the constraint DSL: a
#      handful of deterministic forms both clients (and the DuckDB oracles)
#      spell identically — so a masked census hash-oracles exactly.
#   5. Enforcement boundary: `read_policy_spark` / `read_policy_pandas` /
#      `table_changes_policy_spark` and the `Table` facade are the GOVERNED
#      path; the raw storage functions (`read_snapshot_spark`, writers,
#      ALTER validation) are the privileged path the engine itself uses —
#      exactly where Delta draws the line (enforcement lives in the
#      catalog-governed read API, not in the parquet bytes).


_MASK_FNS = ("null", "const", "hash", "partial", "bucket")


def _role_applies(spec: dict, role: str | None) -> bool:
    """True when the policy applies to this role (i.e. the role is NOT
    exempt). ``role=None`` is the unprivileged default — no policy ever
    exempts it (default-deny)."""
    return role is None or role not in (spec.get("exempt_roles") or ())


def _applicable_policies(table: TableLog, role: str | None):
    pol = table.policies()
    masks = {c: s for c, s in pol["masks"].items()
             if _role_applies(s, role)}
    filters = {n: s for n, s in pol["row_filters"].items()
               if _role_applies(s, role)}
    return masks, filters


def _mask_expr_spark(df, col: str, spec: dict):
    """One mask spec as a Spark Column over ``df[col]`` (logical
    space). Every form NULL-propagates (mask(NULL) = NULL) so masked
    and raw reads agree on missingness — the property that keeps
    NULL-sensitive downstream logic (outer joins, COALESCE) stable
    under masking."""
    from pyspark.sql import functions as F

    c = F.col(col)
    fn = spec["fn"]
    if fn == "null":
        return F.lit(None).cast(df.schema[col].dataType)
    if fn == "const":
        return F.when(c.isNull(), F.lit(None)).otherwise(
            F.lit(spec["value"]))
    if fn == "hash":
        # md5 of the decimal/string form — deterministic and JOINABLE
        # (equal raws mask to equal tokens across tables and engines);
        # DuckDB spells it md5(CAST(c AS VARCHAR)). Float columns are
        # rejected at ALTER time: their string forms differ per engine.
        return F.md5(c.cast("string"))
    if fn == "partial":
        # fixed pad + last-n: never length-revealing beyond n, and
        # right() has identical short-string semantics in Spark,
        # DuckDB (right) and pandas (s.str[-n:]): the whole string.
        n = int(spec["keep_last"])
        return F.concat(F.lit("****"), F.right(c, F.lit(n)))
    if fn == "bucket":
        # k-anonymity-style coarsening to the bucket FLOOR, spelled via
        # the non-negative-mod identity (CLAUDE.md floor-div rule) so
        # Spark, DuckDB and pandas agree on negative values too.
        w = int(spec["width"])
        return (c.cast("long") - F.pmod(c.cast("long"), F.lit(w))).cast(
            "long")
    raise ValueError(f"unknown mask fn {fn!r}")


def _mask_series_pandas(s, spec: dict):
    """pandas twin of `_mask_expr_spark` — same forms, same
    NULL-propagation, value-identical output (the cross-client
    differential test pins it). Integer columns must arrive as
    nullable Int64 (read_policy_pandas's types_mapper) so the hash
    form stringifies '97', never '97.0'."""
    import hashlib

    import pandas as pd

    fn = spec["fn"]
    if fn == "null":
        return pd.Series(pd.NA, index=s.index, dtype="object")
    if fn == "const":
        return s.map(lambda v: spec["value"] if pd.notna(v) else None)
    if fn == "hash":
        return s.map(
            lambda v: hashlib.md5(str(v).encode()).hexdigest()
            if pd.notna(v) else None)
    if fn == "partial":
        n = int(spec["keep_last"])
        return s.map(
            lambda v: "****" + str(v)[-n:] if pd.notna(v) else None)
    if fn == "bucket":
        w = int(spec["width"])
        return pd.array(
            [int(v) - int(v) % w if pd.notna(v) else pd.NA for v in s],
            dtype="Int64")
    raise ValueError(f"unknown mask fn {fn!r}")


def _row_filter_mask_pandas(frame, spec: dict):
    """Keep-mask for one row filter over a pandas frame — the exact
    NULL semantics of `_constraint_ok_expr` (range/isin/len clauses
    PASS NULLs; not_null alone rejects them), so both clients keep
    identical row sets. A filtered column absent from the frame is
    all-NULL (schema evolution): range clauses pass, not_null drops
    everything."""
    import pandas as pd

    if spec["col"] not in frame.columns:
        keep = pd.Series(not spec.get("not_null", False),
                         index=frame.index)
        return keep
    s = frame[spec["col"]]
    ok = pd.Series(True, index=frame.index)
    if spec.get("not_null"):
        ok &= s.notna()
    if "min" in spec:
        ok &= s.isna() | (s >= spec["min"])
    if "max" in spec:
        ok &= s.isna() | (s <= spec["max"])
    if "isin" in spec:
        ok &= s.isna() | s.isin(list(spec["isin"]))
    if "min_len" in spec:
        ok &= s.isna() | (s.astype(str).str.len() >= int(spec["min_len"]))
    if "max_len" in spec:
        ok &= s.isna() | (s.astype(str).str.len() <= int(spec["max_len"]))
    return ok.fillna(False)


def _policy_pruned_paths(
    table: TableLog, filters: dict, version: int | None,
    stats: dict | None = None,
) -> tuple[list[str], int]:
    """FILE SKIPPING for row filters, off the manifest alone: drop live
    files whose recorded stats prove NO row can pass — range clauses
    against min/max, isin against min/max AND the per-file bloom when
    one exists. Conservative by construction (no stats for the column
    → keep), and ONLY filters that also demand ``not_null`` prune:
    min/max stats describe a file's non-NULL values, while a bare
    range clause PASSES NULL rows — pruning on it would drop a file's
    NULL rows that the predicate admits. The residual filter always
    still runs, so pruned ≡ unpruned + predicate (the oracle checks
    exactly that). ``stats`` short-circuits the log fold when the
    caller already folded this version (the one-fold-per-read
    discipline — a second `_fold_entries` pass doubles commit reads)."""
    if stats is None:
        stats = table.live_stats(version)
    specs = []
    for s in filters.values():
        if not s.get("not_null"):
            continue
        if "min" in s or "max" in s or "isin" in s:
            specs.append((table.physical_name(s["col"]), s))
    kept: list[str] = []
    pruned = 0
    for f in sorted(stats):
        fstats = stats[f] or {}
        drop = False
        for phys, s in specs:
            rng = fstats.get(phys)
            if rng is not None:
                if "min" in s and rng["max"] < s["min"]:
                    drop = True
                    break
                if "max" in s and rng["min"] > s["max"]:
                    drop = True
                    break
                if "isin" in s and all(
                    v < rng["min"] or v > rng["max"]
                    for v in s["isin"]
                ):
                    drop = True
                    break
            bl = fstats.get(f"_bloom:{phys}")
            if bl is not None and "isin" in s and not any(
                bloom_maybe_contains(bl, v) for v in s["isin"]
            ):
                drop = True
                break
        if drop:
            pruned += 1
        else:
            kept.append(table.data_path(f))
    return kept, pruned


def read_policy_spark(
    spark,
    table: TableLog,
    role: str | None = None,
    version: int | None = None,
    dv_key: str | None = None,
    tombstone_col: str | None = None,
):
    """The GOVERNED read: `read_snapshot_spark` (DV fold, column
    mapping, time travel) with the table's access policies applied for
    ``role`` — row filters first (manifest-pruned file list + residual
    predicate), then column masks. ``role=None`` is the unprivileged
    default; a role named in a policy's ``exempt_roles`` sees that
    policy's raw form. CURRENT policies govern every version read —
    time travel is not an escape hatch (see the section header).
    Returns the DataFrame; masks and filters are ordinary Catalyst
    expressions, so predicate pushdown and codegen apply untouched."""
    masks, filters = _applicable_policies(table, role)
    if version is None:
        # pin the head ONCE: pruning and the snapshot/DV fold must
        # resolve the same version, or a commit landing between the
        # two reads (an OPTIMIZE folding DVs into rewrites) would pair
        # v's file list with v+1's DV map — a torn governed read
        version = table.version()
    paths = None
    if filters:
        paths, _ = _policy_pruned_paths(table, filters, version)
        if not paths:
            # every file disproven: fall back to the full list so the
            # scan still has a schema — the residual predicate returns
            # the same zero rows, just without the skipping win
            paths = None
    df = read_snapshot_spark(
        spark, table, version=version, dv_key=dv_key,
        tombstone_col=tombstone_col, _paths=paths,
    )
    return _apply_policies_spark(df, masks, filters)


def _apply_policies_spark(df, masks: dict, filters: dict):
    from pyspark.sql import functions as F

    for name in sorted(filters):
        spec = filters[name]
        if spec["col"] not in df.columns:
            if spec.get("not_null"):
                df = df.filter(F.lit(False))
            continue
        df = df.filter(_constraint_ok_expr(spec))
    masked = [c for c in sorted(masks) if c in df.columns]
    if masked:
        df = df.withColumns(
            {c: _mask_expr_spark(df, c, masks[c]) for c in masked})
    return df


def _arrow_minus_dvs(table: TableLog, f: str, dv_files,
                     columns=None) -> "object":
    """One data file as a pyarrow Table with its deletion-vector
    sidecars anti-folded (the engine-free half of `_apply_dvs`):
    KEY sidecar rows are (_df, key) pairs, POSITIONAL sidecars
    (``dvp-``) are (_df, _w, _m) bitmap words masking row positions —
    only this file's entries apply either way (a RESTORE-merged
    sidecar can span several files). ``columns`` prunes the data read
    (positional folding is position-based, so pruning stays legal)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(table.data_path(f), columns=columns)

    def _rows_for(d):
        dv = pq.read_table(table.data_path(d))
        return (dv.filter(pc.equal(dv["_df"], f))
                if "_df" in dv.column_names else dv)

    # pass 1 — positional masks index the RAW file, so they fold first
    keep = None
    for d in dv_files:
        if not _is_pos_dv(d):
            continue
        dv_rows = _rows_for(d)
        if not dv_rows.num_rows:
            continue
        if keep is None:
            keep = np.ones(tbl.num_rows, dtype=bool)
        # vectorized word unpack (NOT a per-bit Python loop — a
        # million-row delete is tens of thousands of words): expand
        # every set bit of every 32-bit mask word to its row position
        ws = np.asarray(dv_rows["_w"].to_pylist(), dtype=np.int64)
        ms = np.asarray(dv_rows["_m"].to_pylist(), dtype=np.int64)
        bits = (ms[:, None] >> np.arange(32)) & 1  # (words, 32)
        pos = (ws[:, None] * 32 + np.arange(32))[bits.astype(bool)]
        pos = pos[pos < len(keep)]
        keep[pos] = False
    if keep is not None:
        import pyarrow as pa

        tbl = tbl.filter(pa.array(keep))
    # pass 2 — key sidecars filter by value (position-independent)
    for d in dv_files:
        if _is_pos_dv(d):
            continue
        dv_rows = _rows_for(d)
        if not dv_rows.num_rows:
            continue
        key_col = [c for c in dv_rows.column_names if c != "_df"][0]
        # Arrow is_in kernel, not a per-row Python pass — an
        # exported/materialized file folds at columnar speed;
        # NULL keys are never DV-listed, so they are kept
        tbl = tbl.filter(pc.fill_null(pc.invert(pc.is_in(
            tbl[key_col],
            value_set=dv_rows[key_col].combine_chunks())), True))
    return tbl


def read_policy_pandas(
    table: TableLog,
    role: str | None = None,
    version: int | None = None,
    tombstone_col: str | None = None,
):
    """Engine-free governed read — the pandas client's twin of
    `read_policy_spark`, and the first public JVM-free SNAPSHOT reader:
    folds the manifest, prunes files the role's filters disprove, reads
    survivors via pyarrow (DV sidecars anti-folded per file), unions
    schemas (missing columns NULL — mergeSchema semantics), translates
    physical→logical names, then applies the same filters and masks.
    Integer columns come back as nullable Int64 so mask forms
    stringify identically to Spark ('97', never '97.0');
    `test_policy_cross_client_differential` pins byte-equality."""
    import pandas as pd
    import pyarrow as pa

    masks, filters = _applicable_policies(table, role)
    v = table.version() if version is None else version
    table._check_not_expired(v)
    live, stats, dvall = table._fold_entries(v)[:3]
    keep_files = sorted(live)
    if filters:
        # prune against the SAME resolved version as the fold (no torn
        # read) and reuse its stats (no second fold)
        kept_paths = set(
            _policy_pruned_paths(table, filters, v, stats=stats)[0])
        pruned_files = [f for f in keep_files
                        if table.data_path(f) in kept_paths]
        # all-pruned: fall back to the full list (the residual filters
        # still drop every row) so the frame keeps its schema — the
        # Spark twin does the same
        keep_files = pruned_files or keep_files

    def _int_mapper(t):
        return pd.Int64Dtype() if pa.types.is_integer(t) else None

    dropped = set(table.dropped_columns())
    frames = []
    for f in keep_files:
        tbl = _arrow_minus_dvs(table, f, dvall.get(f, ()))
        frame = tbl.to_pandas(types_mapper=_int_mapper)
        frames.append(frame.drop(
            columns=[c for c in frame.columns if c in dropped]))
    if not frames:
        return pd.DataFrame()
    out = pd.concat(frames, ignore_index=True, sort=False)
    mapping = table.column_mapping()
    out = out.rename(columns={p: l for l, p in mapping.items()})
    if tombstone_col is not None and tombstone_col in out.columns:
        out = out[out[tombstone_col].isna()
                  | (out[tombstone_col] != "d")]
    for name in sorted(filters):
        out = out[_row_filter_mask_pandas(out, filters[name])]
    for c in sorted(masks):
        if c in out.columns:
            out[c] = _mask_series_pandas(out[c], masks[c])
    return out.reset_index(drop=True)


def table_changes_policy_spark(
    spark,
    table: TableLog,
    role: str | None = None,
    key: str | None = None,
    from_version: int = 0,
    to_version: int | None = None,
):
    """The governed CHANGE FEED: `table_changes_spark` with the
    CURRENT policies applied per change row — masks over the data
    columns (never the ``_change_type``/``_commit_version`` metadata),
    row filters over each row version independently (a pre- or
    post-image the role may not see simply does not appear in its
    feed). Without this, CDF would be the leak around masking: the
    feed carries full pre/post images of exactly the sensitive
    columns. Same exempt-role contract as `read_policy_spark`."""
    masks, filters = _applicable_policies(table, role)
    df = table_changes_spark(
        spark, table, key=key,
        from_version=from_version, to_version=to_version,
    )
    meta_cols = {"_change_type", "_commit_version"}
    masks = {c: s for c, s in masks.items() if c not in meta_cols}
    return _apply_policies_spark(df, masks, filters)


def _policy_col_check(table: TableLog, col: str, fn: str | None) -> None:
    """ALTER-time validation: the LOGICAL column must exist (declare-
    ahead allowed only while the table has no live files), and the mask
    fn must fit the stored type — ``hash`` rejects floats (their string
    forms differ per engine, breaking the portable-token contract),
    ``partial`` wants strings, ``bucket`` wants integers. Footer reads
    only, the ANALYZE discipline."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    phys = table.physical_name(col)
    if phys in set(table.dropped_columns()):
        raise ValueError(f"column {col!r} was dropped")
    _, live = table.snapshot()
    typ = None
    seen = False
    for f in sorted(live):
        try:
            schema = pq.read_schema(table.data_path(f))
        except FileNotFoundError:
            continue
        if phys in schema.names:
            seen = True
            typ = schema.field(phys).type
            break
    if live and not seen:
        raise ValueError(f"no such column: {col!r}")
    if typ is None or fn is None:
        return
    if fn == "hash" and (pa.types.is_floating(typ)
                         or pa.types.is_boolean(typ)):
        raise ValueError(
            f"hash mask on {typ} column {col!r}: float/bool string "
            "forms are engine-specific ('true' vs 'True'); hash an "
            "integer or string column")
    if fn == "partial" and not (pa.types.is_string(typ)
                                or pa.types.is_large_string(typ)):
        raise ValueError(f"partial mask needs a string column: {col!r}")
    if fn == "bucket" and not pa.types.is_integer(typ):
        raise ValueError(f"bucket mask needs an integer column: {col!r}")


def _meta_add_feature(meta: dict, name: str) -> None:
    """In-place feature-list add for callers already holding the meta
    lock mid read-modify-write (see `TableLog._add_feature` for the
    standalone form and `features()` for the contract)."""
    feats = set(meta.get("features") or [])
    feats.add(name)
    meta["features"] = sorted(feats)


def alter_set_mask(table: TableLog, col: str, spec: dict) -> None:
    """ALTER TABLE ALTER COLUMN SET MASK. Read-side metadata only — no
    commit barrier and no writer gate (writers commit raw bytes either
    way); one atomic meta write flips every subsequent governed read.
    Re-setting an existing mask replaces it (policy evolution)."""
    if spec.get("fn") not in _MASK_FNS:
        raise ValueError(
            f"mask fn must be one of {_MASK_FNS}, got {spec.get('fn')!r}")
    if spec["fn"] == "const" and "value" not in spec:
        raise ValueError("const mask needs a 'value'")
    if spec["fn"] == "partial" and int(spec.get("keep_last", 0)) < 1:
        raise ValueError("partial mask needs keep_last >= 1")
    if spec["fn"] == "bucket" and int(spec.get("width", 0)) < 1:
        raise ValueError("bucket mask needs width >= 1")
    with table._meta_lock():
        _policy_col_check(table, col, spec["fn"])
        meta = table._meta()
        masks = dict(meta.get("masks") or {})
        masks[col] = dict(spec)
        meta["masks"] = masks
        _meta_add_feature(meta, "access-policies")
        meta["policies_rev"] = int(meta.get("policies_rev", 0)) + 1
        table._persist_meta(meta)


def alter_drop_mask(table: TableLog, col: str) -> None:
    with table._meta_lock():
        meta = table._meta()
        masks = dict(meta.get("masks") or {})
        if col not in masks:
            raise KeyError(f"no mask on column: {col}")
        del masks[col]
        meta["masks"] = masks
        meta["policies_rev"] = int(meta.get("policies_rev", 0)) + 1
        table._persist_meta(meta)


def alter_set_row_filter(table: TableLog, name: str, spec: dict) -> None:
    """ALTER TABLE SET ROW FILTER ``name``: a KEEP predicate in the
    constraint clause DSL (col + not_null/min/max/isin/min_len/
    max_len) plus ``exempt_roles``. Multiple filters AND together.
    Clauses get the constraint DSL's NULL semantics; add ``not_null``
    to a range filter to (a) exclude NULL rows and (b) unlock manifest
    file-pruning for it (see `_policy_pruned_paths`)."""
    if "col" not in spec:
        raise ValueError("row filter spec needs a 'col'")
    clauses = {"not_null", "min", "max", "isin", "min_len", "max_len"}
    unknown = set(spec) - clauses - {"col", "exempt_roles"}
    if unknown:
        raise ValueError(f"unknown row filter keys: {sorted(unknown)}")
    if not clauses & set(spec):
        raise ValueError(f"row filter needs at least one of {clauses}")
    with table._meta_lock():
        _policy_col_check(table, spec["col"], None)
        meta = table._meta()
        filts = dict(meta.get("row_filters") or {})
        filts[name] = dict(spec)
        meta["row_filters"] = filts
        _meta_add_feature(meta, "access-policies")
        meta["policies_rev"] = int(meta.get("policies_rev", 0)) + 1
        table._persist_meta(meta)


def alter_drop_row_filter(table: TableLog, name: str) -> None:
    with table._meta_lock():
        meta = table._meta()
        filts = dict(meta.get("row_filters") or {})
        if name not in filts:
            raise KeyError(f"no such row filter: {name}")
        del filts[name]
        meta["row_filters"] = filts
        meta["policies_rev"] = int(meta.get("policies_rev", 0)) + 1
        table._persist_meta(meta)


def _policy_frame_pandas(tbl, masks: dict, filters: dict):
    """One pyarrow Table (already logical-space, DV-folded) through the
    policy layer as a pandas frame — the per-file unit the governed
    export shares with the read path's semantics. Exact per-file
    because every mask/filter is ROW-LOCAL. Integer columns ride
    nullable Int64 (the '97' not '97.0' rule for hash masks)."""
    import pandas as pd
    import pyarrow as pa

    frame = tbl.to_pandas(types_mapper=lambda t: (
        pd.Int64Dtype() if pa.types.is_integer(t) else None))
    for name in sorted(filters):
        frame = frame[_row_filter_mask_pandas(frame, filters[name])]
    for c in sorted(masks):
        if c in frame.columns:
            frame[c] = _mask_series_pandas(frame[c], masks[c])
    return frame.reset_index(drop=True)


# -- snapshot export for external readers ------------------------------------


def _export_translate_file(
    table: TableLog, f: str, dv_files, dropped: set, rev: dict,
    masks: dict, filters: dict, dst: str,
) -> bool:
    """Materialize ONE file into export form: DVs anti-folded, dropped
    physical columns removed, physical names rewritten to logical, and
    (governed) the policy layer applied. Module-level and
    driver-state-free so `export_snapshot(spark=...)` can run it
    executor-side (unpickled by module reference). Returns False when
    every row was filtered away (nothing written)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = _arrow_minus_dvs(table, f, dv_files)
    keep = [c for c in tbl.column_names if c not in dropped]
    tbl = tbl.select(keep).rename_columns([rev.get(c, c) for c in keep])
    if masks or filters:
        frame = _policy_frame_pandas(tbl, masks, filters)
        if not len(frame):
            return False  # every row filtered: nothing to share
        orig = {c: tbl.schema.field(c).type for c in tbl.column_names}
        tbl = pa.Table.from_pandas(frame, preserve_index=False)
        for i, fld in enumerate(tbl.schema):
            # an all-NULL masked column degrades to arrow `null`
            # through pandas — pin it back to the stored type so
            # union-by-name readers never see a null/string conflict
            # (the purge lesson)
            if pa.types.is_null(fld.type) and fld.name in orig:
                tbl = tbl.set_column(
                    i, fld.name, tbl[fld.name].cast(orig[fld.name]))
    pq.write_table(tbl, dst)
    return True


def export_snapshot(
    table: TableLog,
    dst_dir: str,
    version: int | None = None,
    governed: bool = False,
    role: str | None = None,
    spark=None,
) -> dict:
    """Export one snapshot as a PLAIN parquet directory any engine can
    read with a glob — no commit log, no sidecars, no column mapping
    required on the consumer side (Delta's ``GENERATE
    symlink_format_manifest`` / Iceberg's metadata-free table export,
    for handing a lakehouse table to Presto/DuckDB/pandas consumers
    that speak only parquet).

    Per-file fast path: a live file with no deletion vectors and no
    renamed/dropped columns is HARDLINKED (zero copy, the `clone_table`
    trick) — at 100 TB an export of a mostly-clean table moves
    metadata, not data. A file that needs translation is MATERIALIZED
    through pyarrow: DV rows anti-folded out, dropped physical columns
    removed, physical names rewritten to the CURRENT logical names —
    so the export directory IS the logical snapshot, byte-complete.

    Snapshot isolation: the fold pins version v; concurrent commits
    never tear the export (their files are invisible to the fold).
    Schema-evolved tables export per-file schemas — consumers union by
    name (DuckDB ``union_by_name=true``, Spark ``mergeSchema``), which
    the export manifest records. Returns {version, files, hardlinked,
    materialized, manifest_path}.

    A RAW export is a one-way COPY of the logical snapshot — a
    privileged operation (the caller is handing raw data somewhere).
    ``governed=True`` is SECURE DATA SHARING instead: the exported
    bytes are what `read_policy_pandas` would return for ``role`` —
    row-filtered (files the filters disprove are never exported at
    all, the manifest-pruning win), masked, DV-folded, logically
    named. This per-file application is exact because policies are
    ROW-LOCAL (each mask/filter reads only its own row), so
    file-by-file ≡ whole-table — pinned by
    test_governed_export_equals_governed_read. A role exempt from
    every policy degrades to the raw hardlink fast path. Later table
    commits never touch an export either way.

    Scale split: hardlinks are METADATA work and stay on the driver
    (the clone discipline); materialization is DATA work — pass
    ``spark`` and the per-file translations run as one Spark job (a
    task per file, independent by construction; only (name, written?)
    pairs return). Driver-loop and Spark-job materialization are
    pinned output-identical by test_export_distributed_equals_driver."""
    import pyarrow.parquet as pq

    _check_reader_features(table)  # the export IS a fold
    os.makedirs(dst_dir, exist_ok=True)
    if os.listdir(dst_dir):
        raise ValueError(f"export dir not empty: {dst_dir}")
    v = table.version() if version is None else version
    table._check_not_expired(v)
    live, stats, dvall = table._fold_entries(v)[:3]
    mapping = table.column_mapping()
    rev = {p: l for l, p in mapping.items()}
    dropped = set(table.dropped_columns())
    touched = set(rev) | dropped

    masks: dict = {}
    filters: dict = {}
    if governed:
        masks, filters = _applicable_policies(table, role)
    pruned_out = 0
    ordered = sorted(live)
    if filters:
        kept = set(_policy_pruned_paths(table, filters, v, stats=stats)[0])
        n0 = len(ordered)
        ordered = [f for f in ordered if table.data_path(f) in kept]
        pruned_out = n0 - len(ordered)

    rewrites: list[str] = []
    links: list[str] = []
    for f in ordered:
        needs_rewrite = bool(dvall.get(f)) or bool(masks) or bool(filters)
        if not needs_rewrite and touched:
            needs_rewrite = bool(
                touched & set(pq.read_schema(table.data_path(f)).names))
        (rewrites if needs_rewrite else links).append(f)

    for f in links:  # zero-copy where the store supports it (storage
        # seam: hardlink on POSIX, server-side copy on an object
        # store); stays on the driver either way
        table.storage.link_or_copy(table.data_path(f),
                                   os.path.join(dst_dir, f))

    if spark is not None and rewrites:
        # materialization is DATA work — one task per file (the
        # translations are independent), executor-side; only (name,
        # written?) pairs return to the driver
        dvl = {f: list(dvall.get(f, ())) for f in rewrites}
        written = (
            spark.sparkContext
            .parallelize(rewrites, min(len(rewrites), 64))
            .map(lambda f: (f, _export_translate_file(
                table, f, dvl.get(f, ()), dropped, rev, masks, filters,
                os.path.join(dst_dir, f))))
            .collect()
        )
        skipped = {f for f, ok in written if not ok}
    else:
        skipped = set()
        for f in rewrites:
            if not _export_translate_file(
                    table, f, dvall.get(f, ()), dropped, rev, masks,
                    filters, os.path.join(dst_dir, f)):
                skipped.add(f)

    files = [f for f in ordered if f not in skipped]
    hardlinked = len(links)
    materialized = len(rewrites) - len(skipped)

    manifest = os.path.join(dst_dir, "_export_manifest.json")
    with open(manifest + ".tmp", "w") as fh:
        json.dump({"version": v, "files": files,
                   "union_by_name": True,
                   "governed_role": role if governed else None,
                   "governed": bool(governed),
                   "source": table.path}, fh)
    os.replace(manifest + ".tmp", manifest)
    return {"version": v, "files": len(files),
            "hardlinked": hardlinked, "materialized": materialized,
            "pruned_out": pruned_out,
            "manifest_path": manifest}


def _unlink_staged(table: TableLog, staged: list[dict] | None) -> None:
    """Abandon staged-but-uncommitted data files so a writer that gives
    up (CommitConflict after max_attempts) leaves no orphans for vacuum
    to find — mirrors append_spark's exit cleanup."""
    for a in staged or ():
        try:
            os.unlink(table.data_path(a["file"]))
        except FileNotFoundError:
            pass


# -- Spark MERGE -----------------------------------------------------------


@_reapply_on_constraint_change
def merge_upsert_spark(
    spark,
    table: TableLog,
    updates_df,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "merge",
    max_attempts: int = 50,
    pre_commit_hook=None,
    version: str | None = None,
    touched_buckets: set[int] | None = None,
) -> dict:
    """Keyed MERGE of a DataFrame through the OCC protocol.

    Scale shape: the update set's buckets are the ONLY data read or
    written — `live_paths(touched)` prunes at the file level before any
    scan, the anti-join discards replaced keys, and the rewrite lands as
    one immutable file per touched bucket. Commit cost is one atomic
    link regardless of data size, so 1000 executors can prepare rewrites
    while the driver serializes only the metadata append. Updates are
    collected once to assign buckets driver-side ONLY for their distinct
    bucket ids; the data path stays in Spark.

    ``version`` = conditional merge (see `merge_upsert_pandas`): the
    highest-version row per key survives — idempotent under redelivery
    and immune to out-of-order stale updates. The rewrite becomes one
    per-key window argmax instead of the anti-join, still confined to
    the touched buckets.

    Schema EVOLUTION (Delta's mergeSchema): the rewritten buckets carry
    the UNION of base and update columns — a column new in the updates
    back-fills NULL for surviving base rows, a base column the updates
    don't carry back-fills NULL for inserted rows. Readers must read
    snapshots with mergeSchema (see `read_snapshot_spark`) since
    untouched buckets keep their old file schema. A NULL version (rows
    written before the version column existed) sorts OLDEST, so any
    versioned update supersedes pre-evolution rows."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table)  # BEFORE resolving: a rules change
    # landing between capture and resolve must trip the gate, not slip
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    uniq = _unique_constraints(table, key)
    idcol = _identity_guard(table, updates_df.columns)
    updates_df = _apply_generated_spark(table, updates_df)
    # fold the touched-bucket discovery into the dead-letter write job
    # when one will run (observe over the tagged rows — a SUPERSET of
    # the clean rows' buckets, which the touched contract allows); the
    # bucket ids are identical on logical or physical names (a rename
    # never changes values)
    _obs_exprs = None
    if touched_buckets is None:
        from pyspark.sql import functions as _F

        _obs_exprs = [_F.collect_set(
            _bucket_expr(key, n_buckets, table.hash_buckets())
        ).alias("_pbs")]
    updates_df, _nq, _qdir, _obsm = _apply_constraints_spark(
        spark, table, updates_df, writer, observe_exprs=_obs_exprs)
    if uniq and version is None:
        # a dup-carrying un-versioned batch would plant duplicate keys
        # (both copies survive the rewrite); versioned merges collapse
        # dups by the version argmax, so they are exempt
        _check_batch_unique_spark(updates_df, key, next(iter(uniq)))
    # LOGICAL -> PHYSICAL boundary: rules above ran on logical names;
    # everything below (bucketing, base merge, staging) is file space
    updates_df = _to_physical_spark(table, updates_df)
    key = table.physical_name(key)
    if version is not None:
        version = table.physical_name(version)
    if idcol:
        idcol = table.physical_name(idcol)
    up = updates_df.withColumn(
        "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())
    )
    # ``touched_buckets``: a caller that already ran an aggregate over
    # the update set (the matview guard job) can fold the distinct
    # bucket ids into it (collect_set of the bucket expr) and hand
    # them over, saving this one-per-MERGE planning action — callers
    # must guarantee the set covers every update row's bucket (a
    # superset is correct but rewrites clean buckets)
    if touched_buckets is not None:
        touched = set(int(b) for b in touched_buckets)
    elif _obsm is not None:
        touched = set(int(b) for b in _obsm["_pbs"])
    else:
        # pin the bucketed update set so ONE evaluation of the caller's
        # update lineage (at 100 TB: a full source scan) serves the
        # discovery action below AND both update-side subtrees of the
        # staged rewrite (anti-join probe + union) AND any OCC
        # recompute — delta-sized by the MERGE contract, so the pin is
        # bounded (r10; guide §1.2). Row-format lazy localCheckpoint,
        # not the columnar cache (the minhash persist trap).
        up = up.localCheckpoint(eager=False)
        touched = {int(r["_pb"])
                   for r in up.select("_pb").distinct().collect()}
    up_cols = updates_df.columns
    up_types = dict(updates_df.dtypes)
    attempts = 0
    recomputes = 0
    staged: list[dict] | None = None
    replaced: list[str] | None = None
    replaced_dvstate: dict | None = None
    hwm_staged = -1
    n_new_ids = 0

    while attempts < max_attempts:
        v, bucket_files, dvmap = _plan_bucket_state(spark, table, touched)
        # DV state participates in conflict detection: a deletion-vector
        # commit landing on our buckets changes content without changing
        # the file set, and our rewrite (which REMOVES those files,
        # killing their DVs) would resurrect the deleted rows
        dvstate = {f: tuple(dvmap.get(f, ())) for f in bucket_files}
        # identity ranges participate too: a commit that reserved ids
        # since our compute makes our stamped inserts collide
        hwm_v = table.id_hwm(v) if idcol else 0
        need_compute = (staged is None or dvstate != replaced_dvstate
                        or (idcol and hwm_v != hwm_staged))
        if need_compute:
            if staged is not None:
                recomputes += 1
                for a in staged:
                    try:
                        os.unlink(table.data_path(a["file"]))
                    except FileNotFoundError:
                        pass
            replaced = sorted(bucket_files)
            replaced_dvstate = dvstate
            paths = [table.data_path(f) for f in replaced]
            if paths:
                base = read_files_merged(spark, paths)
                base = _apply_dvs(
                    spark, table, base, key, dvmap
                ).withColumn(
                    "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())
                )
                # schema evolution: rewrite carries the column UNION,
                # NULL-backfilled on whichever side lacks a column
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
                if idcol and idcol in base_cols:
                    # MERGE × identity: an update row for an EXISTING
                    # key inherits the base row's id (the row identity
                    # survives the upsert); only true inserts draw new
                    # ids below
                    ux = ux.drop(idcol).join(
                        bx.select(key, idcol), key, "left"
                    )
                if version is None:
                    merged = (
                        bx.join(up.select(key), key, "left_anti")
                        .select(*cols, "_pb")
                        .unionByName(ux.select(*cols, "_pb"))
                    )
                else:
                    # conditional: argmax by (version, origin) per key —
                    # origin=1 makes the update win exact-version ties;
                    # desc puts NULL versions (pre-evolution rows) last
                    both = bx.select(*cols, "_pb").withColumn(
                        "_og", F.lit(0)
                    ).unionByName(
                        ux.select(*cols, "_pb").withColumn("_og", F.lit(1))
                    )
                    rn = F.row_number().over(
                        W.partitionBy(key).orderBy(
                            F.col(version).desc(), F.col("_og").desc()
                        )
                    )
                    merged = (
                        both.withColumn("_rn", rn)
                        .filter(F.col("_rn") == 1)
                        .select(*cols, "_pb")
                    )
            else:
                cols = up_cols
                merged = up.select(*cols, "_pb")
                if version is not None:
                    # a batch can carry several versions of one key even
                    # with no base files yet — collapse to the newest
                    rn = F.row_number().over(
                        W.partitionBy(key).orderBy(F.col(version).desc())
                    )
                    merged = (
                        merged.withColumn("_rn", rn)
                        .filter(F.col("_rn") == 1)
                        .select(*cols, "_pb")
                    )
            if idcol:
                hwm_staged = hwm_v
                if idcol not in merged.columns:
                    merged = merged.withColumn(
                        idcol, F.lit(None).cast("long"))
                merged, n_new_ids = _fill_identity_nulls_spark(
                    merged, key, idcol, hwm_staged)
            # one output file per touched bucket: repartition ON the bucket
            # column, then relocate Spark's part files under content names
            tmp_out = table.data_path(f"_stage-{uuid.uuid4().hex}")
            (
                merged.repartition(max(len(touched), 1), "_pb")
                .write.mode("overwrite").partitionBy("_pb").parquet(tmp_out)
            )
            staged = []
            for d in os.listdir(tmp_out):
                if not d.startswith("_pb="):
                    continue
                b = int(d.split("=")[1])
                for part in os.listdir(os.path.join(tmp_out, d)):
                    if not part.endswith(".parquet"):
                        continue
                    name = table.new_data_file(b)
                    shutil.move(os.path.join(tmp_out, d, part),
                                table.data_path(name))
                    staged.append({"file": name, "pb": b})
            shutil.rmtree(tmp_out, ignore_errors=True)
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table) != _rev0:
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(_qdir)
        attempts += 1
        if table.try_commit(
            v, staged, replaced, writer,
            id_range=((hwm_staged, hwm_staged + n_new_ids)
                      if idcol and n_new_ids else None),
        ):
            return {
                "committed_version": v + 1,
                "attempts": attempts,
                "recomputes": recomputes,
                "quarantined": _nq,
            }
    _unlink_staged(table, staged)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def sync_snapshot_spark(
    spark,
    table: TableLog,
    source_df,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "sync",
    max_attempts: int = 50,
    pre_commit_hook=None,
) -> dict:
    """Full-snapshot SYNC — Delta's three-clause MERGE in one commit:
    WHEN MATCHED (payload differs) UPDATE, WHEN NOT MATCHED INSERT,
    WHEN NOT MATCHED BY SOURCE DELETE. After it, the table's logical
    content EQUALS ``source_df`` — the nightly snapshot-ingest pattern
    (an upstream system hands you today's full extract; rows it no
    longer carries must vanish, which plain upsert cannot express).

    Write cost is O(changed buckets): a key-level full-outer diff
    (carried-equal rows suppressed by the null-safe struct compare, the
    CDF discipline) finds the buckets where ANYTHING changed, and only
    those are rewritten with the source's content — an unchanged bucket
    keeps its files byte-for-byte, so the change feed of the sync
    version reports exactly the logical diff. The COMPARE is O(table ∪
    source) — inherent to full sync; at 100 TB you scope the sync to a
    partition/tenant slice and run one sync per slice. Source schema
    defines the rewritten buckets (same-schema sync is the contract;
    evolution goes through merge_upsert_spark). DV state folds into the
    diff and participates in OCC conflict detection like MERGE.

    Returns {committed_version, attempts, recomputes,
    rewritten_buckets} (committed_version = current head when nothing
    changed — no empty commit)."""
    _fk_refuse(table, "SYNC")
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table)  # BEFORE resolving (see merge note)
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    uniq = _unique_constraints(table, key)
    if table.identity():
        raise ValueError(
            "sync_snapshot does not support identity tables: a full-"
            "snapshot replace cannot tell carried rows from re-inserts "
            "without reading every changed bucket's ids — use "
            "merge_upsert (which inherits ids) plus delete for removals"
        )
    hashed = table.hash_buckets()
    source_df = _apply_generated_spark(table, source_df)
    source_df, _nq, _qdir, _ = _apply_constraints_spark(spark, table, source_df,
                                                     writer)
    # LOGICAL -> PHYSICAL boundary (see merge_upsert_spark)
    source_df = _to_physical_spark(table, source_df)
    key = table.physical_name(key)
    if uniq:
        _check_batch_unique_spark(source_df, key, next(iter(uniq)))
    src = source_df.withColumn("_pb", _bucket_expr(key, n_buckets, hashed))
    data_cols = [c for c in source_df.columns if c != key]
    attempts = 0
    recomputes = 0
    staged: list[dict] | None = None
    replaced: list[str] | None = None
    replaced_dvstate: dict | None = None

    while attempts < max_attempts:
        v, live = table.snapshot()
        dvmap = {f: ds for f, ds in table.live_dvs().items() if f in live}
        dvstate = {f: tuple(dvmap.get(f, ())) for f in live}
        need_compute = staged is None or dvstate != replaced_dvstate
        if need_compute:
            if staged is not None:
                recomputes += 1
                _unlink_staged(table, staged)
            replaced_dvstate = dvstate
            if live:
                base = read_files_merged(
                    spark, [table.data_path(f) for f in sorted(live)])
                base = _apply_dvs(spark, table, base, key, dvmap)
                b2 = base.select(
                    key,
                    _bucket_expr(key, n_buckets, hashed).alias("_bpb"),
                    F.struct(*data_cols).alias("_b"),
                )
                s2 = src.select(
                    key, F.col("_pb").alias("_spb"),
                    F.struct(*data_cols).alias("_s"),
                )
                j = b2.join(s2, key, "full_outer")
                changed = j.filter(
                    F.col("_b").isNull() | F.col("_s").isNull()
                    | ~F.col("_b").eqNullSafe(F.col("_s"))
                ).select(
                    F.coalesce("_spb", "_bpb").alias("_cb")
                ).distinct()
                touched = {int(r["_cb"]) for r in changed.collect()}
            else:
                touched = {
                    int(r["_pb"])
                    for r in src.select("_pb").distinct().collect()
                }
            if not touched:
                return {"committed_version": v, "attempts": attempts,
                        "recomputes": recomputes, "rewritten_buckets": 0,
                        "quarantined": _nq}
            replaced = sorted(
                f for f, b in live.items() if b in touched
            )
            staged = _stage_bucketed(
                spark, table,
                src.filter(F.col("_pb").isin(sorted(touched))),
                max(len(touched), 1), sort_cols=["_pb", key],
            )
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table) != _rev0:
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(_qdir)
        attempts += 1
        if table.try_commit(v, staged, replaced, writer):
            return {"committed_version": v + 1, "attempts": attempts,
                    "recomputes": recomputes,
                    "rewritten_buckets": len({a["pb"] for a in staged}),
                    "quarantined": _nq}
    _unlink_staged(table, staged)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


def write_initial_spark(spark, table: TableLog, df, key: str,
                        n_buckets: int, writer: str = "init",
                        hash_buckets: bool = False,
                        constraints: dict | None = None,
                        generated: dict | None = None,
                        identity: dict | None = None,
                        auto_optimize: int | None = None) -> int:
    """Create version 0 from a DataFrame (one file per bucket).
    ``hash_buckets=True`` persists the skew-resistant bucket function
    and ``constraints`` the CHECK constraints (see `TableLog.init`);
    every later writer reads both from the table metadata, never from
    a call argument. The LAYOUT (key, n_buckets) is persisted the same
    way, so subsequent writers/readers may omit both."""
    table.init(hash_buckets=hash_buckets, constraints=constraints,
               key=key, n_buckets=n_buckets, generated=generated,
               identity=identity, auto_optimize=auto_optimize)
    uniq = _unique_constraints(table, key)
    df = _apply_generated_spark(table, df)
    df, _nq, _qdir, _ = _apply_constraints_spark(spark, table, df, writer)
    if uniq:
        _check_batch_unique_spark(df, key, next(iter(uniq)))
    idcol = _identity_guard(table, df.columns)
    up = df.withColumn(
        "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())
    )
    n_ids = 0
    if idcol:
        up, n_ids = _assign_identity_spark(up, key, idcol, 0)
    tmp_out = table.data_path(f"_stage-{uuid.uuid4().hex}")
    (up.repartition(n_buckets, "_pb")
       .write.mode("overwrite").partitionBy("_pb").parquet(tmp_out))
    adds = []
    for d in os.listdir(tmp_out):
        if not d.startswith("_pb="):
            continue
        b = int(d.split("=")[1])
        for part in os.listdir(os.path.join(tmp_out, d)):
            if part.endswith(".parquet"):
                name = table.new_data_file(b)
                shutil.move(os.path.join(tmp_out, d, part),
                            table.data_path(name))
                adds.append({"file": name, "pb": b})
    shutil.rmtree(tmp_out, ignore_errors=True)
    if not table.try_commit(
        -1, adds, [], writer,
        id_range=((0, n_ids) if idcol and n_ids else None),
    ):
        raise CommitConflict("table already initialized")
    return 0


def read_snapshot_spark(
    spark,
    table: TableLog,
    version: int | None = None,
    tombstone_col: str | None = None,
    apply_dvs: bool = True,
    dv_key: str | None = None,
    _paths: list[str] | None = None,
):
    """Read a snapshot (head, or AS OF ``version``) with mergeSchema —
    the reader half of schema evolution: buckets untouched since an
    evolving MERGE keep their old file schema, so the union schema only
    exists at read time. Missing columns surface as NULL, matching what
    the next rewrite of that bucket would materialize.

    ``tombstone_col`` is the reader half of CDC DELETE semantics: a
    delete arrives as a row whose op column is ``'d'`` and MERGES like
    any other versioned row — the tombstone must PERSIST in the data
    files so a stale out-of-order upsert (lower version, delivered
    late) cannot resurrect the key; readers filter it out here. Physical
    reclamation is `purge_tombstones_pandas` after the redelivery
    horizon.

    Deletion vectors (``delete_keys_spark``) fold automatically: rows a
    live DV names are anti-joined away (broadcast — the DV side scales
    with deletes, not the table). ``apply_dvs=False`` exposes the raw
    physical rows (debug/audit only). ``dv_key`` names the join key for
    the DV fold; required only when DVs exist. ``_paths`` (internal,
    `read_policy_spark`) overrides the path list with a
    manifest-pruned subset — semantics are unchanged because pruning
    is conservative and the DV fold anti-join simply finds no rows
    for files not in the base."""
    from pyspark.sql import functions as F

    _check_reader_features(table)
    paths = _paths if _paths is not None else (
        table.live_paths() if version is None
        else table.live_paths_at(version)
    )
    df = read_files_merged(spark, paths)
    if apply_dvs:
        dvmap = table.live_dvs(version)
        if dvmap:
            if dv_key is None:
                dv_key = table.layout()[0]  # persisted merge key
            if dv_key is None:
                raise ValueError("table has deletion vectors: pass dv_key")
            # sidecars store the PHYSICAL key column (writers translate
            # before staging), so the fold joins in file space
            df = _apply_dvs(spark, table, df,
                            table.physical_name(dv_key), dvmap)
    # column mapping: translate AT SCAN — physical file names become
    # the current logical names, dropped columns disappear (uniformly
    # across every version; a rename needs no file rewrite)
    df = _to_logical_spark(table, df)
    if tombstone_col is not None:
        df = df.filter(
            F.col(tombstone_col).isNull() | (F.col(tombstone_col) != "d")
        )
    return df


def purge_tombstones_pandas(
    table: TableLog, op_col: str, writer: str = "purge",
    max_attempts: int = 50,
) -> dict:
    """Physically drop delete tombstones — the DELETE half of vacuum,
    run once redelivery of older CDC versions is impossible (the
    retention horizon): rewrites every bucket holding a ``op_col='d'``
    row without them, as ONE ordinary OCC commit (concurrent merges
    conflict-and-rebase against it like any other writer). Buckets with
    no tombstones are untouched. After purge, a late stale upsert for a
    purged key would insert again — which is why the horizon gates
    this, exactly Delta's vacuum-vs-time-travel retention contract."""
    if table.fk_referenced_by():
        raise ValueError(
            "tombstone purge on an FK-referenced parent: physical row "
            "removal would bypass the RESTRICT scan — drop the foreign "
            "key(s) first")
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    op_col = table.physical_name(op_col)  # file-space rewrite
    attempts = 0
    while attempts < max_attempts:
        v, live = table.snapshot()
        staged, replaced = [], []
        for f, b in sorted(live.items()):
            tbl = pq.read_table(table.data_path(f))
            if op_col not in tbl.column_names:
                continue
            # keep NULL-op rows (pre-evolution data is not a tombstone);
            # pyarrow end to end so an emptied bucket keeps its exact
            # schema (a pandas round-trip degrades empty object columns
            # to arrow `null`, which mergeSchema then rejects)
            kept = tbl.filter(
                pc.fill_null(pc.not_equal(tbl[op_col], "d"), True)
            )
            if kept.num_rows == tbl.num_rows:
                continue
            replaced.append(f)
            name = table.new_data_file(b)
            pq.write_table(kept, table.data_path(name))
            staged.append({"file": name, "pb": b, "rows": kept.num_rows})
        attempts += 1
        if not replaced:
            return {"committed_version": v, "attempts": attempts,
                    "purged_files": 0}
        if table.try_commit(v, staged, replaced, writer):
            return {"committed_version": v + 1, "attempts": attempts,
                    "purged_files": len(replaced)}
        for a in staged:  # lost the race: recompute against the new head
            try:
                os.unlink(table.data_path(a["file"]))
            except FileNotFoundError:
                pass
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


# -- deletion vectors ------------------------------------------------------


def _file_col():
    from pyspark.sql import functions as F

    return F.element_at(F.split(F.input_file_name(), "/"), -1)


def _dv_paths(table: TableLog, dvmap: dict[str, list[str]],
              files=None) -> list[str]:
    return [
        table.data_path(d)
        for f, ds in sorted(dvmap.items())
        if files is None or f in files
        for d in ds
    ]


def _is_pos_dv(name: str) -> bool:
    return os.path.basename(name).startswith("dvp-")


def _merge_sidecar_list(src_path_of, dst: TableLog, ds: list,
                        staged: list | None = None):
    """Merge a file's DV sidecar LIST to at most one sidecar per KIND
    (key and positional schemas cannot concatenate), for the re-attach
    paths that must carry a file's whole delete state in one commit
    (ANALYZE / RESTORE / clone). Returns a single name (str) when one
    kind survives — the pre-positional commit shape — or a two-entry
    list (the commit log accepts both); newly written merged names are
    appended to ``staged`` for crash cleanup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out: list[str] = []
    for kind, names in (("key", [d for d in ds if not _is_pos_dv(d)]),
                        ("pos", [d for d in ds if _is_pos_dv(d)])):
        if not names:
            continue
        if len(names) == 1:
            out.append(names[0])
            continue
        merged = pa.concat_tables(
            [pq.read_table(src_path_of(d)) for d in names],
            promote_options="default")
        name = (dst.new_pos_dv_file() if kind == "pos"
                else dst.new_dv_file())
        pq.write_table(merged, dst.data_path(name))
        if staged is not None:
            staged.append(name)
        out.append(name)
    return out[0] if len(out) == 1 else out


def _apply_dvs(spark, table: TableLog, base, key: str,
               dvmap: dict[str, list[str]], files=None,
               keep_file_col: bool = False):
    """Fold deletion vectors at read. Two sidecar kinds, split by name
    with zero I/O: KEY sidecars (``dv-``, rows ``(_df, key)``) fold as
    a broadcast anti-join on (file, key); POSITIONAL sidecars
    (``dvp-``, bitmap words ``(_df, _w, _m)``) fold as a broadcast
    left join on (file, word) plus a bit test against the row's
    ``_metadata.row_index`` — a positional SKIP, no key addressing,
    which is what lets `delete_where_spark` delete by arbitrary
    predicate. Both DV sides are tiny by construction (they scale with
    deletes, not the table), so the plan stays a broadcast over the
    scan — per-file precision without per-file jobs.

    ``base`` must be a direct read of the live paths (or already carry
    ``_f``/``_pos``): `input_file_name` and the ``_metadata`` struct
    are only legal on a single-source scan, so the tags attach HERE,
    before any join; ``_f`` is kept when the caller asks
    (``keep_file_col``)."""
    from pyspark.sql import functions as F

    tagged = base if "_f" in base.columns else base.withColumn(
        "_f", _file_col()
    )
    paths = _dv_paths(table, dvmap, files)
    kpaths = [p for p in paths if not _is_pos_dv(p)]
    ppaths = sorted({p for p in paths if _is_pos_dv(p)})
    if ppaths:
        added_pos = "_pos" not in tagged.columns
        if added_pos:
            tagged = tagged.withColumn(
                "_pos", F.col("_metadata.row_index"))
        # accumulating deletes OR together; a sidecar attached to
        # several files contributes only its own file's words (the
        # spanning-sidecar discipline, via the _df join key)
        words = (spark.read.parquet(*ppaths)
                 .groupBy("_df", "_w")
                 .agg(F.expr("bit_or(_m)").alias("_m")))
        j = tagged.join(
            F.broadcast(words),
            (tagged["_f"] == words["_df"])
            & (F.floor(tagged["_pos"] / 32) == words["_w"]),
            "left",
        ).drop("_df", "_w")
        tagged = j.filter(
            F.coalesce(
                F.expr("shiftright(_m, CAST(_pos % 32 AS INT)) & 1"),
                F.lit(0)) == 0
        ).drop("_m", *(["_pos"] if added_pos else []))
    if kpaths:
        dv = spark.read.parquet(*kpaths).select(
            F.col("_df"), F.col(key).alias("_dk")
        )
        tagged = tagged.join(
            F.broadcast(dv),
            (tagged["_f"] == dv["_df"]) & (tagged[key] == dv["_dk"]),
            "left_anti",
        )
    return tagged if keep_file_col else tagged.drop("_f")


@_reapply_on_constraint_change
def delete_keys_pandas(
    table: TableLog,
    keys,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "delete",
    max_attempts: int = 50,
    pre_commit_hook=None,
) -> dict:
    """Lightweight-client twin of `delete_keys_spark(mode='dv')`: stages
    one deletion-vector sidecar per affected data file from a plain
    key iterable, no JVM required — what a test worker process or a
    small CDC consumer uses. Same OCC discipline: losing a race to a
    commit that changed the touched buckets' files or DV state forces a
    recompute; existing DVs are applied first so a key never lands in
    two sidecars of one file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _rev0 = _gate_state(table, removal=True)
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    key = table.physical_name(key)  # file-space key (column mapping)
    table._add_feature("deletion-vectors")  # reader gate, pre-commit

    kset = {int(k) for k in keys}
    _fk_restrict_pandas(table, kset)  # RESTRICT (no-op w/o back-refs)
    touched = {_bucket_of_py(k, n_buckets, table.hash_buckets())
               for k in kset}
    attempts = 0
    staged_dvs: dict[str, str] | None = None
    replaced_dvstate: dict | None = None
    deleted_rows = 0

    while attempts < max_attempts:
        v, live = table.snapshot()
        bucket_files = {f: b for f, b in live.items() if b in touched}
        dvmap = {
            f: ds for f, ds in table.live_dvs().items() if f in bucket_files
        }
        dvstate = {f: tuple(dvmap.get(f, ())) for f in bucket_files}
        if staged_dvs is None or dvstate != replaced_dvstate:
            if staged_dvs:
                _unlink_staged(
                    table, [{"file": d} for d in staged_dvs.values()]
                )
            staged_dvs, deleted_rows = {}, 0
            replaced_dvstate = dvstate
            for f in sorted(bucket_files):
                # existing DVs (key AND positional) fold first so a
                # key never lands in two sidecars of one file
                frame = _arrow_minus_dvs(
                    table, f, dvmap.get(f, ()),
                    columns=[key]).to_pandas()
                hit = frame[frame[key].isin(kset)]
                if hit.empty:
                    continue
                name = table.new_dv_file()
                pq.write_table(
                    pa.table({"_df": [f] * len(hit),
                              key: hit[key].tolist()}),
                    table.data_path(name),
                )
                staged_dvs[f] = name
                deleted_rows += len(hit)
            if not staged_dvs:
                if _gate_state(table, removal=True) != _rev0:
                    raise _ConstraintsChanged(None)  # stale layout: the
                    # miss may be an artifact of old bucket ids — restart
                return {"committed_version": v, "attempts": attempts,
                        "deleted_rows": 0, "dv_files": 0}
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table, removal=True) != _rev0:
            _unlink_staged(table,
                           [{"file": d} for d in staged_dvs.values()])
            raise _ConstraintsChanged(None)
        attempts += 1
        if table.try_commit(v, [], [], writer, dvs=staged_dvs,
                            fk_removal=True):
            return {"committed_version": v + 1, "attempts": attempts,
                    "deleted_rows": deleted_rows,
                    "dv_files": len(staged_dvs)}
    _unlink_staged(table, [{"file": d} for d in staged_dvs.values()])
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def delete_keys_spark(
    spark,
    table: TableLog,
    keys_df,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "delete",
    max_attempts: int = 50,
    pre_commit_hook=None,
    mode: str = "dv",
) -> dict:
    """Row-level DELETE. ``mode='dv'`` (default) writes DELETION VECTOR
    sidecars — per-data-file key sets recorded in one commit with NO
    base rewrite (Delta/Iceberg DVs): at 100 TB a sparse delete costs
    O(deleted rows) sidecar bytes instead of rewriting ~every touched
    file; readers fold DVs with a broadcast anti-join and OPTIMIZE later
    compacts them into the base. ``mode='rewrite'`` is the classical
    path (anti-join rewrite of every touched bucket) — same logical
    result and the comparison baseline tests pin DV reads against.

    The scan to FIND affected files touches only the keys' buckets and
    applies existing DVs first, so a key never lands in two sidecars of
    one file — which is what lets the change feed report each deleted
    row exactly once. OCC discipline matches MERGE: losing a race to a
    commit that changed the touched buckets' files OR their DV state
    forces a recompute; an unrelated winner allows a cheap re-commit.

    Returns {committed_version, attempts, deleted_rows, dv_files}
    (rewrite mode reports dv_files=0 and deleted_rows=-1 — its census
    is the table itself)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table, removal=True)  # layout/rules change
    # mid-delete → restart; removal=True folds the FK ref-epoch in
    key, n_buckets = _resolve_layout(table, key, n_buckets)

    if mode not in ("dv", "rewrite"):
        raise ValueError(f"mode {mode!r}")
    if mode == "dv":
        # reader feature gate: recorded BEFORE the commit that first
        # attaches a sidecar, so no feature-stripped reader can fold it
        table._add_feature("deletion-vectors")
    # LOGICAL -> PHYSICAL boundary: the sidecar/key column in file space
    keys_df = _to_physical_spark(table, keys_df)
    key = table.physical_name(key)
    _fk_restrict_spark(spark, table, keys_df, key)  # RESTRICT: no live
    # child row may reference a removed key (no-op without back-refs)
    up = keys_df.select(key).distinct().withColumn(
        "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())
    ).localCheckpoint(eager=False)  # one evaluation of the caller's
    # key lineage serves discovery + every anti-join/DV job below
    # (bounded: distinct keys of one delete batch; r10, guide §1.2)
    touched = {int(r["_pb"]) for r in up.select("_pb").distinct().collect()}
    attempts = 0
    recomputes = 0
    staged: list[dict] | None = None   # rewrite mode: replacement files
    staged_dvs: dict[str, str] | None = None
    replaced: list[str] | None = None
    replaced_dvstate: dict[str, tuple] | None = None
    deleted_rows = 0

    while attempts < max_attempts:
        v, bucket_files, dvmap = _plan_bucket_state(spark, table, touched)
        dvstate = {f: tuple(dvmap.get(f, ())) for f in bucket_files}
        need_compute = (
            (staged is None and staged_dvs is None)
            or dvstate != replaced_dvstate
        )
        if need_compute:
            if staged_dvs or staged:
                recomputes += 1
                _unlink_staged(
                    table,
                    (staged or [])
                    + [{"file": d} for d in (staged_dvs or {}).values()],
                )
            staged, staged_dvs = None, None
            replaced = sorted(bucket_files)
            replaced_dvstate = dvstate
            if not replaced:
                if _gate_state(table, removal=True) != _rev0:
                    raise _ConstraintsChanged(None)
                return {"committed_version": v, "attempts": attempts,
                        "deleted_rows": 0, "dv_files": 0}
            paths = [table.data_path(f) for f in replaced]
            base = read_files_merged(spark, paths)
            if mode == "dv":
                visible = _apply_dvs(
                    spark, table, base, key, dvmap, keep_file_col=True
                )
                hits = (
                    visible
                    .join(F.broadcast(up.select(key)), key, "left_semi")
                    .select("_f", key)
                )
                tmp_out = table.data_path(f"_stage-{uuid.uuid4().hex}")
                (
                    hits.withColumn("_df", F.col("_f"))
                    .repartition(max(len(replaced), 1), "_f")
                    .write.mode("overwrite").partitionBy("_f")
                    .parquet(tmp_out)
                )
                staged_dvs, deleted_rows = {}, 0
                for d in sorted(os.listdir(tmp_out)):
                    if not d.startswith("_f="):
                        continue
                    data_file = d.split("=", 1)[1]
                    for p in sorted(os.listdir(os.path.join(tmp_out, d))):
                        if not p.endswith(".parquet"):
                            continue
                        name = table.new_dv_file()
                        shutil.move(os.path.join(tmp_out, d, p),
                                    table.data_path(name))
                        staged_dvs[data_file] = name
                        deleted_rows += pq.read_metadata(
                            table.data_path(name)
                        ).num_rows
                shutil.rmtree(tmp_out, ignore_errors=True)
                if not staged_dvs:  # nothing matched: no commit needed
                    if _gate_state(table, removal=True) != _rev0:
                        raise _ConstraintsChanged(None)  # or a stale-
                        # layout artifact (see the pandas twin) — restart
                    return {"committed_version": v, "attempts": attempts,
                            "deleted_rows": 0, "dv_files": 0}
            else:
                visible = _apply_dvs(spark, table, base, key, dvmap)
                kept = visible.join(
                    F.broadcast(up.select(key)), key, "left_anti"
                ).withColumn(
                    "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())
                )
                deleted_rows = -1  # rewrite mode reports via census
                staged = _stage_bucketed(
                    spark, table, kept, max(len(touched), 1)
                )
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table, removal=True) != _rev0:
            _unlink_staged(
                table,
                (staged or []) + [{"file": d}
                                  for d in (staged_dvs or {}).values()],
            )
            raise _ConstraintsChanged(None)
        attempts += 1
        if mode == "dv":
            ok = table.try_commit(v, [], [], writer, dvs=staged_dvs,
                                  fk_removal=True)
        else:
            ok = table.try_commit(v, staged, replaced, writer,
                                  fk_removal=True)
        if ok:
            return {"committed_version": v + 1, "attempts": attempts,
                    "deleted_rows": deleted_rows,
                    "dv_files": len(staged_dvs or {})}
    _unlink_staged(
        table,
        (staged or []) + [{"file": d} for d in (staged_dvs or {}).values()],
    )
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def delete_where_spark(
    spark,
    table: TableLog,
    predicate: str,
    writer: str = "delete-where",
    max_attempts: int = 50,
    pre_commit_hook=None,
) -> dict:
    """``DELETE WHERE <any predicate>`` via POSITIONAL deletion
    vectors: one predicate scan finds the matching LIVE rows, their
    row positions pack into per-file bitmap sidecars (``dvp-``,
    32-bit words: O(rows) bits, no key addressing), and ONE commit
    attaches them — zero base files rewritten. This is the delete the
    key-addressed `delete_keys_spark` cannot express (wide keys,
    non-key predicates) and Delta serves with roaring-bitmap DVs.

    Scale shape: the scan is a predicate-pushdown read of the live
    files with `_metadata.row_index` (positions are per-file, so no
    shuffle is needed to assign them); the bitmap build is one
    partial-agg'd groupBy on (file, word); the sidecars are written by
    a SPARK job partitioned by file, so the driver moves file names,
    never row data. Existing DVs (both kinds) fold BEFORE the
    predicate runs, so a row is recorded at most once across its
    file's sidecars — what keeps the change feed exactly-once.

    OCC discipline matches `delete_keys_spark`: losing a race to a
    commit that changed the live-file or DV state forces a recompute;
    FK RESTRICT runs on the keys actually leaving; the removal fence
    (fk_del_epoch) bumps.

    Column-mapped tables refuse loudly (the predicate would run
    against renamed physical columns — the REPLACE WHERE boundary).

    Returns {committed_version, attempts, deleted_rows, dv_files}."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table, removal=True)
    key, _ = _resolve_layout(table, None, None)
    if table.column_mapping() or table.dropped_columns():
        raise ValueError(
            "DELETE WHERE on a column-mapped table is not supported: "
            "the predicate would run against renamed physical columns")
    key = table.physical_name(key)
    table._add_feature("positional-deletion-vectors")  # reader gate
    pred = F.expr(predicate)

    attempts = 0
    staged_dvs: dict[str, str] | None = None
    replaced_state = None
    deleted_rows = 0
    while attempts < max_attempts:
        v, live = table.snapshot()
        dvmap = table.live_dvs()
        state = (tuple(sorted(live.items())),
                 tuple(sorted((f, tuple(ds)) for f, ds in dvmap.items())))
        if staged_dvs is None or state != replaced_state:
            if staged_dvs:
                _unlink_staged(
                    table,
                    [{"file": d} for d in set(staged_dvs.values())])
            staged_dvs, deleted_rows = {}, 0
            replaced_state = state
            if live:
                paths = [table.data_path(f) for f in sorted(live)]
                base = (
                    read_files_merged(spark, paths)
                    .withColumn("_f", _file_col())
                    .withColumn("_pos", F.col("_metadata.row_index")))
                visible = _apply_dvs(spark, table, base, key, dvmap,
                                     files=set(live),
                                     keep_file_col=True)
                hits = visible.filter(F.coalesce(pred, F.lit(False)))
                # RESTRICT: the keys leaving (no-op without back-refs)
                _fk_restrict_spark(spark, table,
                                   hits.select(key).distinct(), key)
                words = (
                    hits.select("_f", "_pos")
                    .withColumn("_df", F.col("_f"))
                    .withColumn("_w",
                                F.floor(F.col("_pos") / 32)
                                .cast("long"))
                    .withColumn("_b", F.expr(
                        "shiftleft(CAST(1 AS BIGINT), "
                        "CAST(_pos % 32 AS INT))"))
                    .groupBy("_f", "_df", "_w")
                    .agg(F.expr("bit_or(_b)").alias("_m")))
                tmp_out = table.data_path(f"_stage-{uuid.uuid4().hex}")
                (words.repartition(
                    max(min(len(live), 64), 1), "_f")
                 .write.mode("overwrite").partitionBy("_f")
                 .parquet(tmp_out))
                for d in sorted(os.listdir(tmp_out)):
                    if not d.startswith("_f="):
                        continue
                    data_file = d.split("=", 1)[1]
                    for p in sorted(os.listdir(
                            os.path.join(tmp_out, d))):
                        if not p.endswith(".parquet"):
                            continue
                        name = table.new_pos_dv_file()
                        shutil.move(os.path.join(tmp_out, d, p),
                                    table.data_path(name))
                        staged_dvs[data_file] = name
                        deleted_rows += sum(
                            int(m).bit_count()
                            for m in pq.read_table(
                                table.data_path(name),
                                columns=["_m"])["_m"].to_pylist())
                shutil.rmtree(tmp_out, ignore_errors=True)
            if not staged_dvs:  # nothing matched: no commit needed
                if _gate_state(table, removal=True) != _rev0:
                    raise _ConstraintsChanged(None)
                return {"committed_version": v, "attempts": attempts,
                        "deleted_rows": 0, "dv_files": 0}
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table, removal=True) != _rev0:
            _unlink_staged(
                table, [{"file": d} for d in set(staged_dvs.values())])
            raise _ConstraintsChanged(None)
        attempts += 1
        if table.try_commit(v, [], [], writer, dvs=staged_dvs,
                            fk_removal=True):
            return {"committed_version": v + 1, "attempts": attempts,
                    "deleted_rows": deleted_rows,
                    "dv_files": len(staged_dvs)}
    _unlink_staged(table,
                   [{"file": d} for d in set(staged_dvs.values())])
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


BLOOM_MIN_BITS = 8192
BLOOM_MAX_BITS = 1 << 17  # manifest-size cap: ≤ ~4.2k sparse words
BLOOM_K = 4


def _bloom_positions(key_val: int, m: int) -> list[int]:
    """K probe positions from ONE portable xxh64 via double hashing —
    the same pure-python XXH64(long, 42) that is bit-identical to
    Spark's xxhash64 (pinned by test_python_xxh64_long_matches_spark),
    so any client, JVM or not, computes the same bloom."""
    h = _xxh64_long(int(key_val))
    h1 = h & 0xFFFFFFFF
    h2 = ((h >> 32) & 0xFFFFFFFF) | 1  # odd step: full-cycle probing
    return [(h1 + i * h2) % m for i in range(BLOOM_K)]


def parquet_key_bloom(path: str, key: str) -> dict:
    """Per-file BLOOM FILTER over the merge key, stored SPARSE as
    {"m": bits, "w": {word index -> 31-bit word}} (31 bits per word
    keeps every value a small JSON int, the bloom/CMS packing
    discipline) in the file's manifest stats. The size is
    SELF-DESCRIBING and scales with the file: ~16 bits/key rounded to
    a power of two (fp ≈ 0.2%), clamped to [8192, 2^17] so manifests
    stay small — past the cap (≈ 100k+ keys/file) false positives
    degrade pruning gracefully, never correctness. Built driver-side
    here (staged files are local); at cluster scale the same pass runs
    in the write task."""
    import pyarrow.parquet as pq

    ks = pq.read_table(path, columns=[key])[key].to_pylist()
    m = BLOOM_MIN_BITS
    while m < 16 * max(len(ks), 1) and m < BLOOM_MAX_BITS:
        m <<= 1
    words: dict[int, int] = {}
    for kv in ks:
        if kv is None:
            continue
        for pos in _bloom_positions(kv, m):
            w, b = divmod(pos, 31)
            words[w] = words.get(w, 0) | (1 << b)
    return {"m": m, "w": {str(w): v for w, v in sorted(words.items())}}


def bloom_maybe_contains(bloom: dict, key_val) -> bool:
    m = int(bloom.get("m", BLOOM_MIN_BITS))
    words = bloom.get("w", bloom)  # tolerate the flat legacy shape
    for pos in _bloom_positions(key_val, m):
        w, b = divmod(pos, 31)
        if not (int(words.get(str(w), 0)) >> b) & 1:
            return False
    return True


def _json_scalar(v):
    """Parquet-footer stat value -> JSON scalar with the SAME ordering:
    numbers stay numbers, strings stay strings, dates/timestamps become
    ISO strings (lexicographic == chronological), bytes decode utf-8."""
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def parquet_file_stats(path: str, cols) -> dict[str, dict]:
    """Per-column {min, max} lifted from a parquet FOOTER (no data
    read): the min/max over the file's row-group statistics. A column
    absent from the file or missing stats in any row group is omitted —
    `live_paths_pruned` then keeps the file, so omission is safe, never
    wrong. Driver-side here (files are staged locally); at cluster
    scale the same read happens executor-side during the write task and
    travels back with the add entry."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx: dict[str, int] = {}
    for j in range(md.num_columns):
        idx[md.schema.column(j).name] = j
    out: dict[str, dict] = {}
    for c in cols:
        j = idx.get(c)
        if j is None:
            continue
        mins, maxs = [], []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(j).statistics
            if st is None or not st.has_min_max:
                mins = []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out[c] = {
                "min": _json_scalar(min(mins)),
                "max": _json_scalar(max(maxs)),
            }
    return out


def _stage_bucketed(
    spark, table: TableLog, df_pb, n_partitions: int,
    sort_cols=None, range_cols=None, stats_cols=(), bloom_key=None,
) -> list[dict]:
    """Write ``df_pb`` (must carry ``_pb``) as immutable staged data
    files, one-bucket-per-file by construction (``partitionBy("_pb")``
    splits exactly on the bucket even when a shuffle partition straddles
    two buckets), and return their add-manifest entries. ``range_cols``
    range-partitions rows first — that is what CLUSTERS a bucket's rows
    into files covering narrow key ranges; ``sort_cols`` orders rows
    inside each file so row-group stats are tight too. ``stats_cols``
    min/max are lifted from each staged footer into the manifest."""
    part = (
        df_pb.repartitionByRange(n_partitions, *range_cols)
        if range_cols else df_pb.repartition(n_partitions, "_pb")
    )
    if sort_cols:
        part = part.sortWithinPartitions(*sort_cols)
    tmp_out = table.data_path(f"_stage-{uuid.uuid4().hex}")
    part.write.mode("overwrite").partitionBy("_pb").parquet(tmp_out)
    staged: list[dict] = []
    for d in sorted(os.listdir(tmp_out)):
        if not d.startswith("_pb="):
            continue
        b = int(d.split("=")[1])
        for p in sorted(os.listdir(os.path.join(tmp_out, d))):
            if not p.endswith(".parquet"):
                continue
            name = table.new_data_file(b)
            shutil.move(os.path.join(tmp_out, d, p), table.data_path(name))
            entry = {"file": name, "pb": b}
            if stats_cols:
                entry["stats"] = parquet_file_stats(
                    table.data_path(name), stats_cols
                )
            if bloom_key:
                entry.setdefault("stats", {})[f"_bloom:{bloom_key}"] = \
                    parquet_key_bloom(table.data_path(name), bloom_key)
            staged.append(entry)
    shutil.rmtree(tmp_out, ignore_errors=True)
    return staged


@_reapply_on_constraint_change
def overwrite_where_spark(
    spark,
    table: TableLog,
    predicate: str,
    df,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "replace",
    stats_cols=(),
    max_attempts: int = 50,
    pre_commit_hook=None,
) -> dict:
    """Atomic REPLACE WHERE (Delta's ``replaceWhere``): delete every
    live row matching ``predicate`` and insert ``df`` — ONE commit, so
    readers see either the old region or the new one, never a window
    with the region missing (the delete-then-append spelling's race).
    The canonical partition-overwrite / backfill primitive: rebuild
    yesterday's slice, swap it in atomically.

    Rails (Delta-matching): every incoming row must itself satisfy the
    predicate (a row outside the replaced region would silently survive
    the NEXT replace); CHECK/FK/generated constraints apply to the
    incoming rows like any write; UNIQUE checks the batch against
    itself and the RETAINED rows. Removed keys run the FK RESTRICT
    scan and the removal fence (a replace is a delete to the fence).

    Scale shape: matching files are found with ONE predicate scan over
    the live files (parquet pushdown prunes row groups; DVs folded so a
    DV-hidden match cannot force a rewrite by itself), and only files
    with an actual match are rewritten (1:1, same bucket, DVs of the
    rewritten files folded in — hidden rows never resurrect). The new
    rows stage into their own buckets. At 100 TB a region replace
    rewrites the region's files, never the table.

    Boundaries: column-mapped tables and IDENTITY tables refuse loudly
    (translation/id-reservation composition is not worth the silent-bug
    surface; use MERGE + DELETE there). ``stats_cols`` re-lifts
    manifest stats onto the staged files so file skipping survives.

    Returns {committed_version, attempts, rows_deleted, rows_inserted,
    files_rewritten, files_added, quarantined}."""
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table, removal=True)  # rows LEAVE: fence like
    # a delete (fk_ref_epoch rides the gate); also trips on ALTERs
    if table.column_mapping() or table.dropped_columns():
        raise ValueError(
            "REPLACE WHERE on a column-mapped table is not supported: "
            "the predicate would run against renamed physical columns")
    if table.identity():
        raise ValueError(
            "REPLACE WHERE on an IDENTITY table is not supported: use "
            "MERGE + DELETE (id reservation does not compose here)")
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    uniq = _unique_constraints(table, key)
    df = _apply_generated_spark(table, df)
    df, _nq, _qdir, _ = _apply_constraints_spark(spark, table, df, writer)
    pred = F.expr(predicate)
    n_ins, n_outside = [
        int(x or 0) for x in df.agg(
            F.count(F.lit(1)),
            F.sum((~F.coalesce(pred, F.lit(False))).cast("int"))
        ).collect()[0]]
    if n_outside:
        raise ValueError(
            f"REPLACE WHERE: {n_outside} incoming row(s) do not satisfy "
            f"the predicate {predicate!r} — they would silently escape "
            "the region being replaced")
    if uniq:
        _check_batch_unique_spark(df, key, next(iter(uniq)))
    up0 = df.withColumn(
        "_pb", _bucket_expr(key, n_buckets, table.hash_buckets()))

    attempts = 0
    while attempts < max_attempts:
        v, live = table.snapshot()
        paths = [table.data_path(f) for f in sorted(live)]
        staged: list[dict] = []
        matched_files: list[str] = []
        n_del = 0
        if paths:
            base = read_files_merged(spark, paths).withColumn(
                "_f", _file_col())
            base = _apply_dvs(spark, table, base, key, table.live_dvs(),
                              files=set(live), keep_file_col=True)
            hits = (base.filter(F.coalesce(pred, F.lit(False)))
                    .groupBy("_f").count())
            # _file_col() yields file NAMES (basename), matching the
            # manifest's file naming
            by_file = {r["_f"]: int(r["count"]) for r in hits.collect()}
            matched_files = sorted(by_file)
            n_del = sum(by_file.values())
            keep = None
            if matched_files:
                # scans below restrict to the MATCHED files (every hit
                # lives in one by definition) — a large region replace
                # pays O(matched), not O(table), per pass
                in_matched = base.filter(F.col("_f").isin(matched_files))
                # FK RESTRICT: the keys ACTUALLY leaving the table —
                # matched keys minus the incoming batch's keys. A key
                # the replace re-inserts never has a missing-parent
                # window (the commit is atomic), so rebuilding a
                # referenced region in place must pass RESTRICT.
                del_keys = (in_matched
                            .filter(F.coalesce(pred, F.lit(False)))
                            .select(key)
                            .join(up0.select(key).distinct(), key,
                                  "left_anti"))
                _fk_restrict_spark(spark, table, del_keys, key)
                keep = (in_matched
                    .filter(~F.coalesce(pred, F.lit(False)))
                    .drop("_f")
                    .withColumn("_pb", _bucket_expr(
                        key, n_buckets, table.hash_buckets())))
                staged += _stage_bucketed(
                    spark, table, keep, n_buckets,
                    sort_cols=["_pb", key], stats_cols=stats_cols)
        if uniq:
            # batch keys must not collide with ANY surviving key: the
            # untouched files' rows AND the kept (non-matching) rows of
            # rewritten files — only the keys actually LEAVING are
            # legally reusable
            retained_paths = [table.data_path(f) for f in sorted(live)
                              if f not in set(matched_files)]
            surv = None
            if retained_paths:
                ret = read_files_merged(spark, retained_paths).withColumn(
                    "_f", _file_col())
                ret = _apply_dvs(spark, table, ret, key,
                                 table.live_dvs(),
                                 files={f for f in live
                                        if f not in set(matched_files)})
                surv = ret.select(key)
            if keep is not None:
                kk = keep.select(key)
                surv = kk if surv is None else surv.unionByName(kk)
            nconf = 0
            if surv is not None:
                nconf = surv.join(
                    up0.select(key).distinct(), key, "inner").count()
            if nconf:
                _unlink_staged(table, staged)
                raise ValueError(
                    f"UNIQUE constraint '{next(iter(uniq))}' violated: "
                    f"{nconf} incoming key(s) collide with surviving "
                    "rows (retained files or kept rows of the "
                    "rewritten region)")
        staged_new = _stage_bucketed(
            spark, table, up0, n_buckets, sort_cols=["_pb", key],
            stats_cols=stats_cols)
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table, removal=True) != _rev0:
            _unlink_staged(table, staged + staged_new)
            raise _ConstraintsChanged(_qdir)
        attempts += 1
        # insert-only replace (no matched region): nothing leaves the
        # table, so don't bump fk_del_epoch — a spurious bump would
        # restart every concurrent child writer's validated batch
        if table.try_commit(v, staged + staged_new, matched_files,
                            writer, fk_removal=bool(matched_files)):
            return {"committed_version": v + 1, "attempts": attempts,
                    "rows_deleted": n_del, "rows_inserted": n_ins,
                    "files_rewritten": len(matched_files),
                    "files_added": len(staged_new),
                    "quarantined": _nq}
        # lost the race: state may have shifted arbitrarily (another
        # replace, a merge into a matched bucket) — recompute wholesale
        _unlink_staged(table, staged + staged_new)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def update_where_spark(
    spark,
    table: TableLog,
    predicate: str,
    assignments: dict,
    writer: str = "update",
    stats_cols=(),
    max_attempts: int = 50,
    pre_commit_hook=None,
) -> dict:
    """``UPDATE <table> SET col = expr, ... WHERE <predicate>`` — the
    DML verb between MERGE (keyed upsert) and REPLACE WHERE (region
    swap): rewrite IN PLACE every live row matching an arbitrary
    predicate, in ONE commit. Delta's ``UPDATE``.

    Semantics (SQL): every assignment's right-hand side evaluates
    against the PRE-image row — ``SET a = b, b = a`` swaps — and a
    NULL predicate means the row does not match (``coalesce(pred,
    false)``). Each RHS is cast to the column's EXISTING type, so an
    update can never drift a file's parquet schema out from under the
    mergeSchema readers.

    Scale shape (mirrors `overwrite_where_spark`): ONE predicate-
    pushdown scan over the live files (DVs of both kinds folded first,
    so a DV-hidden match neither forces a rewrite nor resurrects)
    finds the files with a hit; ONLY those files are rewritten 1:1
    into their same buckets — matched rows with the assignments
    applied, the rest carried verbatim, the rewritten files' DVs
    folded in so hidden rows die with the old file. At 100 TB an
    update pays O(matched files), never O(table), and the change feed
    reports exactly the matched rows as ``update_pre`` /
    ``update_post`` pairs (carried rows are suppressed by the
    CDF's null-safe struct compare — nothing update-specific needed).

    Rails:
    - the MERGE KEY cannot be assigned (rows would change bucket; use
      MERGE + DELETE to move a key), and with it the UNIQUE contract
      is untouched by construction (`_unique_constraints` supports the
      key only);
    - an IDENTITY column cannot be assigned (ids are engine-issued;
      they ride the rewrite verbatim — identity tables are otherwise
      fully supported, unlike REPLACE WHERE, because no new ids are
      ever minted here);
    - GENERATED columns cannot be assigned directly; when a generated
      column's SOURCE is assigned, the derived value is RECOMPUTED on
      the matched rows (Delta's generated-column contract), so
      partition-style pruning columns never go stale;
    - CHECK constraints (fail- AND quarantine-declared) are validated
      on the POST-image of the matched rows and any violation ABORTS
      the whole update before staging — quarantine diversion would
      silently DELETE a pre-existing row, which an UPDATE must never
      do;
    - FOREIGN KEY columns being assigned re-prove membership of the
      NEW values against the parent's live key set (bucket-pruned,
      DV-folded) and abort on an orphan, both declared modes; no key
      LEAVES the table, so the parent-side RESTRICT scan and the
      removal fence do not apply;
    - column-mapped tables refuse loudly (the predicate and the
      assignments would run against renamed physical columns — the
      REPLACE WHERE / DELETE WHERE boundary).

    A predicate matching nothing returns without committing
    (``rows_updated`` 0, ``committed_version`` None).

    OCC: losing the version race recomputes wholesale against the new
    head (a concurrent merge may have rewritten a matched bucket).

    Returns {committed_version, attempts, rows_updated,
    files_rewritten}."""
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table)  # no rows leave: append-grade gate
    if table.column_mapping() or table.dropped_columns():
        raise ValueError(
            "UPDATE on a column-mapped table is not supported: the "
            "predicate and assignments would run against renamed "
            "physical columns")
    key, n_buckets = _resolve_layout(table, None, None)
    if key in assignments:
        raise ValueError(
            f"UPDATE cannot assign the merge key {key!r} (rows would "
            "change bucket); use MERGE + DELETE to move a key")
    ident = table.identity()
    if ident and ident["col"] in assignments:
        raise ValueError(
            f"identity column {ident['col']!r} is GENERATED ALWAYS — "
            "UPDATE cannot assign it")
    gens = table.generated()
    for g in sorted(set(gens) & set(assignments)):
        raise ValueError(
            f"generated column {g!r} cannot be assigned directly; "
            f"assign its source {gens[g]['src']!r} and the value is "
            "recomputed")
    pred = F.expr(predicate)
    match = F.coalesce(pred, F.lit(False))
    cons = table.constraints()
    checks = {n: c for n, c in sorted(cons.items())
              if not c.get("foreign_key") and not c.get("unique")}
    fk_assigned = {n: c for n, c in sorted(cons.items())
                   if c.get("foreign_key") and c["col"] in assignments}

    attempts = 0
    while attempts < max_attempts:
        v, live = table.snapshot()
        if not live:
            return {"committed_version": None, "attempts": attempts,
                    "rows_updated": 0, "files_rewritten": 0}
        paths = [table.data_path(f) for f in sorted(live)]
        base = read_files_merged(spark, paths).withColumn(
            "_f", _file_col())
        base = _apply_dvs(spark, table, base, key, table.live_dvs(),
                          files=set(live), keep_file_col=True)
        hits = base.filter(match).groupBy("_f").count()
        by_file = {r["_f"]: int(r["count"]) for r in hits.collect()}
        matched_files = sorted(by_file)
        n_upd = sum(by_file.values())
        if not matched_files:
            return {"committed_version": None, "attempts": attempts,
                    "rows_updated": 0, "files_rewritten": 0}
        # the rewrite reads ONLY the matched files — every hit lives in
        # one by definition, so the pass is O(matched), not O(table)
        in_matched = base.filter(F.col("_f").isin(matched_files))
        dtypes = dict(in_matched.drop("_f").dtypes)
        unknown = sorted(set(assignments) - set(dtypes))
        if unknown:
            raise ValueError(
                f"UPDATE assigns unknown column(s) {unknown}; UPDATE "
                "never adds columns (use ALTER for schema changes)")
        # one projection: every RHS sees the PRE-image row (SQL
        # simultaneous-assignment semantics), cast to the column's
        # current type so the file schema never drifts
        # generated exprs reference their source BY NAME — stage each
        # post-image source under a scratch column first so the
        # derivation sees the NEW value inside the same projection
        regen = {c: f"__post_{gens[c]['src']}" for c in sorted(gens)
                 if gens[c]["src"] in assignments and c in dtypes}
        rewritten = in_matched
        for c, scratch in regen.items():
            rewritten = rewritten.withColumn(
                scratch,
                F.when(match, F.expr(assignments[gens[c]["src"]])
                       .cast(dtypes[gens[c]["src"]]))
                .otherwise(F.col(gens[c]["src"])))
        cols = []
        for c in in_matched.drop("_f").columns:
            if c in assignments:
                cols.append(
                    F.when(match, F.expr(assignments[c])
                           .cast(dtypes[c]))
                    .otherwise(F.col(c)).alias(c))
            elif c in regen:
                cols.append(
                    F.when(match, _generated_expr_spark(
                        {**gens[c], "src": regen[c]}))
                    .otherwise(F.col(c)).alias(c))
            else:
                cols.append(F.col(c))
        # the hit flag must be computed on the PRE-image (the predicate
        # may reference columns being assigned), then carried through
        # the projection so the post-image validations below see the
        # fully-applied rows — assignments AND regenerated columns
        rewritten = rewritten.select(*cols, match.alias("__hit"))
        post_matched = rewritten.filter(F.col("__hit")).drop("__hit")
        rewritten = rewritten.drop("__hit")
        if checks:
            # ONE agg job over the matched post-image: any violation
            # aborts (never quarantines — the row already exists)
            aggs = [F.sum((~_constraint_ok_expr(c)).cast("int"))
                    .alias(n) for n, c in checks.items()
                    if c["col"] in dtypes]
            if aggs:
                row = post_matched.agg(*aggs).collect()[0]
                bad = {n: int(row[n] or 0) for n in row.asDict()
                       if row[n]}
                if bad:
                    raise ValueError(
                        "UPDATE post-image violates CHECK constraint(s) "
                        f"{bad} — an update never quarantines an "
                        "existing row; fix the assignment")
        for n, c in fk_assigned.items():
            vals = post_matched.select(
                F.col(c["col"]).alias(c["col"])).distinct().filter(
                F.col(c["col"]).isNotNull())
            pkeys = _fk_parent_keys_spark(spark, table, c, vals)
            orphans = vals.join(
                pkeys, vals[c["col"]] == pkeys["_fk_pk"], "left_anti"
            ).count()
            if orphans:
                raise ValueError(
                    f"FOREIGN KEY constraint {n!r} violated: {orphans} "
                    f"assigned {c['col']!r} value(s) have no parent row")
        staged = _stage_bucketed(
            spark, table,
            rewritten.withColumn(
                "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())),
            n_buckets, sort_cols=["_pb", key], stats_cols=stats_cols)
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table) != _rev0:
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(None)
        attempts += 1
        if table.try_commit(v, staged, matched_files, writer):
            return {"committed_version": v + 1, "attempts": attempts,
                    "rows_updated": n_upd,
                    "files_rewritten": len(matched_files)}
        # lost the race: a winner may have rewritten a matched bucket,
        # attached a DV, or added files — recompute wholesale
        _unlink_staged(table, staged)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def append_spark(
    spark,
    table: TableLog,
    df,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "append",
    stats_cols=(),
    max_attempts: int = 50,
    pre_commit_hook=None,
    bloom_key: bool = False,
) -> dict:
    """Blind INSERT (Delta's ``append`` mode) through the OCC log: the
    batch is bucketed and staged as NEW files, committed adds-only. No
    base file is read or removed, so an append never needs a rebase —
    on losing a version race it re-commits the SAME staged files at the
    next version (adds-only commutes with every other commit; a
    concurrent MERGE whose bucket gained a file mid-flight detects the
    changed file set and recomputes, folding the appended rows in).
    This is the streaming-micro-batch fast path — and the reason real
    tables FRAGMENT: every append adds a file per touched bucket, which
    `optimize_table_spark` later bin-packs.

    Caller contract: rows are NEW keys (fact/event append). Appending a
    key that already exists duplicates it — by design, exactly like
    parquet/Delta append — UNLESS the table declares a UNIQUE
    constraint on the merge key: then the batch is checked against
    itself (one agg job) and against the live rows of exactly its
    TOUCHED buckets (column-pruned, DV-folded scan), re-checked on any
    commit attempt whose bucket file set changed (the OCC winner may
    have appended the same key) — the primary-key contract, priced at
    one key-column scan of the target buckets per append."""
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table)  # BEFORE resolving: a rules change
    # landing between capture and resolve must trip the gate, not slip
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    uniq = _unique_constraints(table, key)
    idcol = _identity_guard(table, df.columns)
    df = _apply_generated_spark(table, df)
    df, _nq, _qdir, _ = _apply_constraints_spark(spark, table, df, writer)
    if uniq:
        _check_batch_unique_spark(df, key, next(iter(uniq)))
    # LOGICAL -> PHYSICAL boundary (see merge_upsert_spark)
    df = _to_physical_spark(table, df)
    key = table.physical_name(key)
    if idcol:
        idcol = table.physical_name(idcol)
    stats_cols = tuple(table.physical_name(c) for c in stats_cols)
    up0 = df.withColumn(
        "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())
    )

    def _stage(id_start: int):
        u, n_ids = (_assign_identity_spark(up0, key, idcol, id_start)
                    if idcol else (up0, 0))
        return u, n_ids, _stage_bucketed(
            spark, table, u, n_buckets, sort_cols=["_pb", key],
            stats_cols=stats_cols, bloom_key=(key if bloom_key else None),
        )

    hwm0 = table.id_hwm() if idcol else 0
    up, n_ids, staged = _stage(hwm0)
    touched = {a["pb"] for a in staged}
    checked_fileset = None
    attempts = 0
    while attempts < max_attempts:
        if uniq:
            # only the touched buckets' files feed the UNIQUE probe —
            # the planning seam keeps this O(touched), never O(table),
            # once the checkpoint outgrows the threshold
            v, bucket_files_t, dvmap_t = _plan_bucket_state(
                spark, table, touched)
        else:
            v = table.version()
        if idcol:
            # ids were stamped against a fold of some parent; pin the
            # recheck to THIS attempt's parent v: if any commit ≤ v
            # reserved a range past our start, ours would collide —
            # restage from the new high-water mark. Committed ranges
            # are provably disjoint because each is folded from its
            # parent and serialized by the version link (see id_hwm).
            hwm = table.id_hwm(v)
            if hwm != hwm0:
                _unlink_staged(table, staged)
                hwm0 = hwm
                up, n_ids, staged = _stage(hwm0)
                checked_fileset = None
        if uniq:
            tb = tuple(sorted(bucket_files_t))
            if tb and tb != checked_fileset:
                base = read_files_merged(
                    spark, [table.data_path(f) for f in tb])
                base = _apply_dvs(spark, table, base, key, dvmap_t,
                                  files=set(tb))
                nconf = base.select(key).join(
                    up.select(key).distinct(), key, "inner"
                ).count()
                if nconf:
                    _unlink_staged(table, staged)
                    raise ValueError(
                        f"UNIQUE constraint '{next(iter(uniq))}' "
                        f"violated: {nconf} key(s) already exist"
                    )
            checked_fileset = tb
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table) != _rev0:
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(_qdir)
        attempts += 1
        if table.try_commit(
            v, staged, [], writer,
            id_range=((hwm0, hwm0 + n_ids) if idcol and n_ids else None),
        ):
            _maybe_auto_compact_spark(spark, table, writer)
            return {"committed_version": v + 1, "attempts": attempts,
                    "files_added": len(staged), "quarantined": _nq,
                    **({"id_range": [hwm0, hwm0 + n_ids]} if idcol
                       else {})}
    for a in staged:
        try:
            os.unlink(table.data_path(a["file"]))
        except FileNotFoundError:
            pass
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def append_pandas(
    table: TableLog,
    batch,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "append",
    max_attempts: int = 50,
) -> dict:
    """Blind INSERT of a pandas frame — the JVM-free micro-batch ingest
    client (the lightweight twin of `append_spark`, same contract: rows
    are NEW keys; duplicates duplicate). Stages one file per touched
    bucket and commits adds-only, so cost is O(batch) regardless of
    table size and a lost version race re-commits the same files —
    what keeps per-batch ingest time FLAT at any commit count
    (s25_stream_acid_ingest_rate measures exactly this)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _rev0 = _gate_state(table)  # BEFORE resolving: a rules change
    # landing between capture and resolve must trip the gate, not slip
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    uniq = _unique_constraints(table, key)
    idcol = _identity_guard(table, batch.columns)
    batch = _apply_generated_pandas(table, batch)
    batch, _nq, _qdir = _apply_constraints_pandas(table, batch, writer)
    if uniq:
        _check_batch_unique_pandas(batch, key, next(iter(uniq)))
    # LOGICAL -> PHYSICAL boundary (see merge_upsert_spark)
    batch = _to_physical_pandas(table, batch)
    key = table.physical_name(key)
    if idcol:
        idcol = table.physical_name(idcol)
    hashed = table.hash_buckets()
    pb = batch[key].astype("int64").map(
        lambda k: _bucket_of_py(k, n_buckets, hashed)
    )

    def _stage(id_start: int):
        out: list[dict] = []
        nxt = id_start
        for b in sorted(pb.unique()):
            part = batch[pb == b].sort_values(key)
            if idcol:  # ids in (_pb, key) order, same as the Spark path
                part = part.copy()
                part[idcol] = range(nxt, nxt + len(part))
                nxt += len(part)
            name = table.new_data_file(int(b))
            pq.write_table(
                pa.Table.from_pandas(part, preserve_index=False),
                table.data_path(name),
            )
            out.append({"file": name, "pb": int(b)})
        return out, nxt - id_start

    hwm0 = table.id_hwm() if idcol else 0
    staged, n_ids = _stage(hwm0)
    touched = {a["pb"] for a in staged}
    batch_keys = set(batch[key].astype("int64"))
    checked_fileset = None
    attempts = 0
    while attempts < max_attempts:
        if uniq:
            v, live = table.snapshot()
        else:
            v = table.version()  # blind-append hot path: no live fold
        if idcol:
            hwm = table.id_hwm(v)  # pinned to THIS attempt's parent
            if hwm != hwm0:
                _unlink_staged(table, staged)
                hwm0 = hwm
                staged, n_ids = _stage(hwm0)
                checked_fileset = None
        if uniq:
            tb = tuple(sorted(
                f for f, b in live.items()
                if b in touched and f not in {a["file"] for a in staged}
            ))
            if tb and tb != checked_fileset:
                dvmap = table.live_dvs()
                nconf = 0
                for f in tb:
                    ks = set(pq.read_table(
                        table.data_path(f), columns=[key]
                    ).to_pandas()[key].astype("int64"))
                    for d in dvmap.get(f, ()):
                        ks -= set(pq.read_table(
                            table.data_path(d)
                        ).to_pandas()[key].astype("int64"))
                    nconf += len(ks & batch_keys)
                if nconf:
                    _unlink_staged(table, staged)
                    raise ValueError(
                        f"UNIQUE constraint '{next(iter(uniq))}' "
                        f"violated: {nconf} key(s) already exist"
                    )
            checked_fileset = tb
        if _gate_state(table) != _rev0:
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(_qdir)
        attempts += 1
        if table.try_commit(
            v, staged, [], writer,
            id_range=((hwm0, hwm0 + n_ids) if idcol and n_ids else None),
        ):
            _maybe_auto_compact_pandas(table, writer)
            return {"committed_version": v + 1, "attempts": attempts,
                    "files_added": len(staged), "quarantined": _nq,
                    **({"id_range": [hwm0, hwm0 + n_ids]} if idcol
                       else {})}
    _unlink_staged(table, staged)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


# -- auto-compaction ---------------------------------------------------------


def _auto_compact_trigger(table: TableLog, n: int) -> bool:
    """Fire only past 2x the target (hysteresis): trigger-at-target
    would compact on EVERY append once a bucket reaches it; 2x
    amortizes to one compaction per `n` appends per bucket while still
    bounding live files at 2n+1 between compactions."""
    _, live = table.snapshot()
    per: dict[int, int] = {}
    for _f, b in live.items():
        per[b] = per.get(b, 0) + 1
    return any(c > 2 * n for c in per.values())


def _auto_compact_trigger_spark(spark, table: TableLog, n: int) -> bool:
    """The trigger probe for the Spark ingest path. This runs after
    EVERY append on an opted-in table, so it must not re-grow with the
    table: above the planning threshold the per-bucket file counts come
    from one manifest-job agg (two longs back to the driver) instead of
    the O(live files) snapshot fold — the `_plan_bucket_state`
    discipline applied to the hottest planning probe."""
    if spark is not None and _manifest_plan_eligible(table):
        from pyspark.sql import functions as F

        from . import manifest as _mf

        table._resolve_txn_for_read()
        row = (_mf.manifest_df(spark, table)
               .groupBy("pb").count()
               .agg(F.max("count").alias("mx")).collect()[0])
        return int(row["mx"] or 0) > 2 * n
    return _auto_compact_trigger(table, n)


def _maybe_auto_compact_spark(spark, table: TableLog, writer: str) -> None:
    """Post-append auto-compaction (Delta autoCompact): when the table
    opted in (`TableLog.init(auto_optimize=n)`) and some bucket's
    small-file debt passed 2n, bin-pack every overfull bucket back to
    n files via the ordinary OPTIMIZE commit — one more OCC writer,
    best-effort: losing every race just leaves the debt for the next
    append's attempt (the trigger re-fires), so appends never fail on
    account of compaction."""
    n = table.auto_optimize()
    if not n or not _auto_compact_trigger_spark(spark, table, n):
        return
    try:
        optimize_table_spark(
            table=table, spark=spark, files_per_bucket=n,
            writer=f"{writer}#auto-optimize", max_attempts=3,
        )
    except CommitConflict:
        pass  # debt remains; a later append re-triggers


def _maybe_auto_compact_pandas(
    table: TableLog, writer: str, max_attempts: int = 3,
) -> None:
    """JVM-free twin of `_maybe_auto_compact_spark` for the pandas
    ingest client: per overfull bucket, fold the bucket's files (and
    their deletion vectors — the rewrite kills the DV list, so the
    deleted keys must be dropped from the rewrite or they resurrect)
    into one table and stage `n` row-sliced files, committed as one
    removes+adds OPTIMIZE-shaped version. Content-preserving, so the
    change feed of the compaction version is empty (the carried-row
    suppression), like any OPTIMIZE."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n = table.auto_optimize()
    if not n:
        return
    key = table.layout()[0]
    pkey = table.physical_name(key) if key else None
    for _ in range(max_attempts):
        if not _auto_compact_trigger(table, n):
            return
        v, live = table.snapshot()
        dvs = table.live_dvs()
        per: dict[int, list[str]] = {}
        for f, b in live.items():
            per.setdefault(b, []).append(f)
        work = {b: fs for b, fs in per.items() if len(fs) > n}
        staged, removes = [], []
        for b, fs in sorted(work.items()):
            parts = []
            for f in sorted(fs):
                tb = pq.read_table(table.data_path(f))
                for d in dvs.get(f, ()):
                    dk = pq.read_table(table.data_path(d))
                    keys = dk.filter(
                        pc.equal(dk["_df"], f))[pkey or "k"]
                    tb = tb.filter(
                        pc.invert(pc.is_in(tb[pkey or "k"],
                                           value_set=keys)))
                parts.append(tb)
            merged = pa.concat_tables(parts, promote_options="default")
            step = max(1, -(-merged.num_rows // n))
            for i in range(0, max(merged.num_rows, 1), step):
                name = table.new_data_file(int(b))
                pq.write_table(merged.slice(i, step),
                               table.data_path(name))
                staged.append({"file": name, "pb": int(b)})
            removes.extend(sorted(fs))
        if not staged:
            return
        if table.try_commit(v, staged, removes,
                            f"{writer}#auto-optimize"):
            return
        _unlink_staged(table, staged)  # lost: re-snapshot and retry


@_reapply_on_constraint_change
def optimize_table_spark(
    spark,
    table: TableLog,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "optimize",
    sort_col: str | None = None,
    files_per_bucket: int = 1,
    stats_cols=(),
    rewrite_all: bool = False,
    max_attempts: int = 50,
    pre_commit_hook=None,
    bloom_key: bool = False,
) -> dict:
    """OPTIMIZE: bin-pack fragmented buckets (many small append files →
    ``files_per_bucket`` files), optionally CLUSTERING rows on
    ``sort_col`` so per-file ``stats_cols`` min/max ranges become
    narrow and `live_paths_pruned` can skip files for range predicates
    — Delta's ``OPTIMIZE ... ZORDER BY`` specialized to one dimension
    (compose `operators.layout.with_zvalue` upstream for true 2-D
    clustering of the sort key). Pure LAYOUT change: the logical table
    is untouched, which `table_changes_spark` makes checkable — the
    optimize version's change feed is EMPTY (every row is carried over
    and suppressed by the pre/post struct compare).

    Runs as ONE ordinary OCC commit (removes = replaced files, adds =
    packed files), so concurrent writers serialize against it like any
    MERGE: losing the race triggers a full recompute against the new
    head. Only buckets holding more than ``files_per_bucket`` files are
    rewritten (``rewrite_all`` forces every bucket, e.g. to apply a new
    ``sort_col`` clustering to an already-compact table).

    Scale shape: the rewrite is one Spark job over exactly the selected
    buckets' files — range-partitioned into ``buckets ×
    files_per_bucket`` tasks, each writing its slice sorted; commit
    cost stays one atomic link. Old files remain for time-travel
    readers until `vacuum()`, the standard retention trade.

    BUCKET-COUNT EVOLUTION: passing ``rewrite_all=True`` with an
    ``n_buckets`` different from the persisted layout rebuckets the
    table transactionally. Two-phase: (1) a ``rebucket_pending`` marker
    (target count + this writer's unique id + parent version) is
    persisted BEFORE the rewrite — ignored by everyone until the
    rewrite commit lands; (2) after the commit, the count is persisted
    and the marker cleared. Writers re-check the EFFECTIVE layout on
    every commit attempt (`_gate_state`), and any resolver can finish
    phase 2 (`effective_layout` heals a crash between commit and
    persist), so no-arg writers can never mis-select files against the
    new layout. Concurrent rebuckets are ARMORED, not best-effort: a
    newer rebucket's marker swap takes the meta lock, and the older
    in-flight rebucket's marker check and commit LINK are atomic under
    the same lock — a superseded rebucket FAILS its commit gate
    instead of racing into the old check-to-link window (where its
    rewrite could land while effective_layout still resolved the other
    marker). Forced-interleaving test:
    test_superseded_rebucket_cannot_slip_commit."""
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table)  # a rebucket landing mid-OPTIMIZE must
    # restart it, or it would rewrite the table back into a stale layout
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    # OPTIMIZE is pure file space: translate caller-facing names once
    key = table.physical_name(key)
    if sort_col is not None:
        sort_col = table.physical_name(sort_col)
    stats_cols = tuple(table.physical_name(c) for c in stats_cols)
    pending = None
    if rewrite_all:
        pn = table.effective_layout()[1]
        if pn is not None and int(n_buckets) != pn:
            wid = f"{writer}#rebucket-{uuid.uuid4().hex[:8]}"
            pending = {"to": int(n_buckets), "writer": wid,
                       "parent": table.version(), "ts": time.time()}
            with table._meta_lock():
                m = table._meta()
                m["rebucket_pending"] = pending
                table._persist_meta(m)
            writer = wid

    def _abandon_pending():
        if pending is None:
            return
        with table._meta_lock():
            m = table._meta()
            if m.get("rebucket_pending") == pending:
                del m["rebucket_pending"]
                table._persist_meta(m)

    attempts = 0
    while attempts < max_attempts:
        v, live = table.snapshot()
        dvmap = table.live_dvs()
        by_bucket: dict[int, list[str]] = {}
        for f, b in live.items():
            by_bucket.setdefault(b, []).append(f)
        work = {
            b: fs for b, fs in by_bucket.items()
            if len(fs) > files_per_bucket or rewrite_all
            # a file carrying deletion vectors is maintenance debt too:
            # OPTIMIZE is what compacts DVs back into the base
            or any(f in dvmap for f in fs)
        }
        files_before = sum(len(fs) for fs in by_bucket.values())
        if not work:
            _abandon_pending()  # empty table: nothing to rebucket
            return {"committed_version": v, "attempts": attempts,
                    "rewritten_buckets": 0, "files_before": files_before,
                    "files_after": files_before}
        replaced = sorted(f for fs in work.values() for f in fs)
        df = read_files_merged(
            spark, [table.data_path(f) for f in replaced])
        # fold the replaced files' DVs into the rewrite — the removal of
        # those files clears their DV lists in the same commit
        df = _apply_dvs(
            spark, table, df, key, dvmap, files=set(replaced)
        ).withColumn(
            "_pb", _bucket_expr(key, n_buckets, table.hash_buckets())
        )
        order = ["_pb", sort_col] if sort_col else ["_pb", key]
        staged = _stage_bucketed(
            spark, table, df, max(len(work), 1) * files_per_bucket,
            sort_cols=order, range_cols=order, stats_cols=stats_cols,
            bloom_key=(key if bloom_key else None),
        )
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        attempts += 1
        if pending is not None:
            # marker check and commit LINK are atomic under the meta
            # lock: a superseding rebucket must take the same lock to
            # swap the marker, so it can no longer slip into the old
            # check-to-link window (which would have landed OUR
            # rewrite's layout while the marker — and therefore
            # effective_layout — said otherwise). The lock guards only
            # this check+link pair; the rewrite job itself ran outside.
            with table._meta_lock():
                if table._meta().get("rebucket_pending") != pending:
                    superseded = True
                    committed = False
                else:
                    superseded = False
                    committed = table.try_commit(
                        v, staged, replaced, writer)
            if superseded:
                _unlink_staged(table, staged)
                raise CommitConflict(
                    f"{writer}: rebucket superseded by a newer rebucket")
        else:
            if _gate_state(table) != _rev0:
                _unlink_staged(table, staged)
                raise _ConstraintsChanged(None)
            committed = table.try_commit(v, staged, replaced, writer)
        if committed:
            if pending is not None:
                table._finish_rebucket(pending)
            _, live2 = table.snapshot()
            return {"committed_version": v + 1, "attempts": attempts,
                    "rewritten_buckets": len(work),
                    "files_before": files_before,
                    "files_after": len(live2)}
        for a in staged:  # lost the race: recompute against the new head
            try:
                os.unlink(table.data_path(a["file"]))
            except FileNotFoundError:
                pass
    _abandon_pending()
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def analyze_table(
    table: TableLog,
    stats_cols=(),
    bloom_key: bool = False,
    writer: str = "analyze",
    max_attempts: int = 50,
) -> dict:
    """ANALYZE: backfill manifest min/max stats and/or merge-key
    blooms for live files that LACK them — a METADATA-ONLY commit
    (each such file is removed and re-added under the same name with
    the stats attached; zero data bytes rewritten), the catch-up path
    for tables whose early writers predate ``stats_cols``/``bloom_key``
    or whose OPTIMIZE never ran. Because a remove kills a file's DV
    list, each re-added file's deletion vectors are re-attached
    exactly (merged to one sidecar when there were several — the
    RESTORE discipline), and because pre- and post-image are
    identical the change feed of an ANALYZE commit is EMPTY, like
    OPTIMIZE. Engine-free: stats come from parquet footers, blooms
    from one key-column read per file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _rev0 = _gate_state(table)
    key = _resolve_layout(table, None, None)[0] if bloom_key else None
    key = table.physical_name(key) if key is not None else None
    stats_cols = tuple(table.physical_name(c) for c in stats_cols)
    bslot = f"_bloom:{key}" if bloom_key else None
    attempts = 0
    staged_sidecars: list[str] = []
    while attempts < max_attempts:
        v, live = table.snapshot()
        stats = table.live_stats()
        dvmap = table.live_dvs()
        work = sorted(
            f for f in live
            if any(c not in (stats.get(f) or {}) for c in stats_cols)
            or (bslot and bslot not in (stats.get(f) or {}))
        )
        if not work:
            if _gate_state(table) != _rev0:
                raise _ConstraintsChanged(None)
            return {"committed_version": v, "attempts": attempts,
                    "files_analyzed": 0}
        adds, removes, dv_attach = [], [], {}
        for f in work:
            st = dict(stats.get(f) or {})
            if stats_cols:
                st.update(parquet_file_stats(table.data_path(f),
                                             stats_cols))
            if bslot:
                st[bslot] = parquet_key_bloom(table.data_path(f), key)
            adds.append({"file": f, "pb": int(live[f]), "stats": st})
            removes.append(f)
            dvs = list(dvmap.get(f, ()))
            if dvs:
                dv_attach[f] = _merge_sidecar_list(
                    table.data_path, table, dvs, staged_sidecars)
        if _gate_state(table) != _rev0:
            _unlink_staged(table, [{"file": n} for n in staged_sidecars])
            raise _ConstraintsChanged(None)
        attempts += 1
        if table.try_commit(v, adds, removes, writer,
                            dvs=dv_attach or None):
            return {"committed_version": v + 1, "attempts": attempts,
                    "files_analyzed": len(work)}
        _unlink_staged(table, [{"file": n} for n in staged_sidecars])
        staged_sidecars = []  # lost the race: recompute fresh
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def restore_table(
    table: TableLog,
    version: int,
    writer: str = "restore",
    max_attempts: int = 50,
) -> dict:
    """RESTORE TABLE TO VERSION AS OF (Delta's RESTORE): one ordinary
    OCC commit whose post-image EQUALS the old snapshot — files the
    old version had are re-added to the manifest (the bytes still
    exist: `vacuum` keeps every file a retained version references, and
    a target below the retention floor raises SnapshotExpired from
    `snapshot_at`), files added since are removed, and each restored
    file's DELETION-VECTOR state is reset to exactly the old version's
    (a file whose DV list drifted is removed-and-re-added in the same
    commit — the fold clears its DVs — then the old sidecars are
    re-attached, merged into one sidecar when there were several,
    since a commit attaches at most one per file).

    Because it is an ordinary commit: concurrent writers serialize
    against it (lost race → recompute against the new head), the
    change feed reports the rollback as real row changes, time travel
    ACROSS the restore still works (nothing is erased), and identity
    high-water marks are NOT rolled back — ids stay unique forever
    even when the rows that consumed them are restored away.
    Engine-free (pure metadata + pyarrow): any client can restore."""
    _fk_refuse(table, "RESTORE")
    import pyarrow as pa
    import pyarrow.parquet as pq

    _rev0 = _gate_state(table)  # FIRST: heals any landed-but-
    # unfinished rebucket, so the epoch floor below is never stale
    floor = int(table._meta().get("layout_since_version", 0))
    if version < floor:
        raise ValueError(
            f"cannot restore to v{version}: the bucket layout changed "
            f"at v{floor} and old manifests' bucket ids would lie "
            "under the current count — restore only reaches versions "
            "in the current layout epoch"
        )
    attempts = 0
    staged_sidecars: list[str] = []
    while attempts < max_attempts:
        v_head, cur = table.snapshot()
        _, old = table.snapshot_at(version)
        old_dvs = table.live_dvs(version)
        cur_dvs = table.live_dvs()
        old_stats = table.live_stats(version)
        cur_state = {f: tuple(cur_dvs.get(f, ())) for f in cur}
        old_state = {f: tuple(old_dvs.get(f, ())) for f in old}
        if cur == old and cur_state == old_state:
            return {"committed_version": v_head, "restored_to": version,
                    "attempts": attempts, "noop": True,
                    "files_readded": 0, "files_removed": 0}
        removes: list[str] = []
        adds: list[dict] = []
        dv_attach: dict[str, str] = {}
        for f in sorted(cur):
            if f not in old or cur_state[f] != old_state[f]:
                removes.append(f)
        for f in sorted(old):
            if f in cur and cur_state[f] == old_state[f]:
                continue  # already exactly as of the target version
            a = {"file": f, "pb": int(old[f])}
            st = old_stats.get(f)
            if st:
                a["stats"] = st
            adds.append(a)
            dvs = old_state[f]
            if dvs:
                dv_attach[f] = _merge_sidecar_list(
                    table.data_path, table, list(dvs), staged_sidecars)
        if _gate_state(table) != _rev0:
            _unlink_staged(table, [{"file": n} for n in staged_sidecars])
            raise _ConstraintsChanged(None)
        attempts += 1
        if table.try_commit(v_head, adds, removes, writer,
                            dvs=dv_attach or None):
            return {"committed_version": v_head + 1,
                    "restored_to": version, "attempts": attempts,
                    "noop": False, "files_readded": len(adds),
                    "files_removed": len(removes)}
        _unlink_staged(table, [{"file": n} for n in staged_sidecars])
        staged_sidecars = []  # lost the race: recompute fresh
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


def table_changes_spark(
    spark,
    table: TableLog,
    key: str | None = None,
    from_version: int = 0,
    to_version: int | None = None,
):
    """CHANGE DATA FEED from the commit log (Delta's
    ``table_changes``): row-level changes between two versions, derived
    purely from the log — each commit's ``removes`` hold the pre-image
    of the rewritten buckets and its ``adds`` the post-image, so a
    key-level full-outer diff classifies every row as ``insert``
    (post only), ``delete`` (pre only), or an ``update_pre`` /
    ``update_post`` pair (both sides, payload differs); rows a bucket
    rewrite carried over UNCHANGED are suppressed by a null-safe struct
    compare. Output = data columns + ``_change_type`` +
    ``_commit_version``.

    This is what turns the table into an incremental SOURCE: a consumer
    remembers its last version and folds only the delta — the
    batch-side mirror of the broker's offset commits, and the feed an
    incremental view maintenance or downstream MERGE would read.
    Scale shape: each version's diff touches exactly the files that
    commit rewrote (bounded by the update set, never the table), and
    consumers page one version at a time, so the plan never grows with
    history. Pre-images live in REPLACED data files — readable until
    `expire_snapshots` + `vacuum()` reclaim them, the same retention
    contract as time travel (commit v's pre-image is snapshot v-1, so
    the feed requires from_version > the retention floor once one is
    set; violations raise SnapshotExpired up front).

    PRECONDITION: the key is unique per commit-touched bucket (MERGE and
    `write_initial_spark` guarantee it). Tables populated through
    `append_spark` may legally hold DUPLICATE keys; the full-outer diff
    would then fan out and fabricate update pairs, so duplicate-key
    versions fail loudly here instead of producing wrong change rows.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    if key is None:
        key = table.layout()[0]
    if key is None:
        raise ValueError("no persisted layout; pass key explicitly")
    _check_reader_features(table)
    key = table.physical_name(key)  # the diff runs in file space
    head = table.version()
    hi = head if to_version is None else to_version
    if not 0 <= from_version <= hi <= head:
        raise ValueError(f"bad version range [{from_version}, {hi}]")
    floor = table.expired_before()
    if floor > 0 and from_version <= floor:
        raise SnapshotExpired(
            f"change feed from {from_version} needs pre-images of "
            f"expired snapshots (retention floor {floor}); "
            f"start at {floor + 1} or later"
        )

    def _aligned(paths):
        return read_files_merged(spark, paths)

    frames = []
    for v in range(from_version, hi + 1):
        c = table.read_commit(v)
        adds = [table.data_path(a["file"]) for a in c["adds"]]
        removes = [table.data_path(f) for f in c["removes"]]
        added_names = {a["file"] for a in c["adds"]}
        # a DV attached to a file RE-ADDED in the same commit is state
        # CARRY-OVER (ANALYZE/RESTORE resetting a file's delete state),
        # not a new deletion — its rows were reported when the original
        # DV committed; only attachments to files that stay live are
        # fresh deletes
        def _as_list(d):
            return [d] if isinstance(d, str) else list(d)

        dvl = {f: _as_list(d) for f, d in (c.get("dvs") or {}).items()
               if f not in added_names}
        dvl_carried = {f: _as_list(d)
                       for f, d in (c.get("dvs") or {}).items()
                       if f in added_names}
        key_sc = {f: [d for d in ds if not _is_pos_dv(d)]
                  for f, ds in dvl.items()}
        key_sc = {f: ds for f, ds in key_sc.items() if ds}
        pos_sc = {f: [d for d in ds if _is_pos_dv(d)]
                  for f, ds in dvl.items()}
        pos_sc = {f: ds for f, ds in pos_sc.items() if ds}
        if key_sc:
            # deletion-vector commit: the deleted rows are the named
            # data files' rows whose key the sidecar records — each
            # recorded exactly once (delete_keys_spark applies existing
            # DVs before staging new ones), so the feed equals what a
            # rewrite-mode delete of the same keys would report
            b_df = _aligned([table.data_path(f) for f in sorted(key_sc)])
            dv = spark.read.parquet(
                *[table.data_path(d)
                  for _, ds in sorted(key_sc.items()) for d in ds]
            ).select(F.col("_df"), F.col(key).alias("_dk"))
            tagged = b_df.withColumn("_f", _file_col())
            hit = tagged.join(
                F.broadcast(dv),
                (tagged["_f"] == dv["_df"]) & (tagged[key] == dv["_dk"]),
                "left_semi",
            ).drop("_f")
            dcols = [x for x in b_df.columns if x != key]
            frames.append(
                hit.select(
                    key, F.struct(*dcols).alias("_p"),
                    F.lit("delete").alias("_change_type"),
                ).select(key, "_p.*", "_change_type",
                         F.lit(v).alias("_commit_version"))
            )
        if pos_sc:
            # POSITIONAL deletion vectors (delete_where_spark): the
            # deleted rows are the files' rows at the bitmap
            # positions; reported identically to key-mode deletes
            b_df = _aligned([table.data_path(f) for f in sorted(pos_sc)])
            words = (
                spark.read.parquet(
                    *[table.data_path(d)
                      for _, ds in sorted(pos_sc.items()) for d in ds])
                .groupBy("_df", "_w")
                .agg(F.expr("bit_or(_m)").alias("_m")))
            tagged = (b_df.withColumn("_f", _file_col())
                      .withColumn("_pos", F.col("_metadata.row_index")))
            hit = (
                tagged.join(
                    F.broadcast(words),
                    (tagged["_f"] == words["_df"])
                    & (F.floor(tagged["_pos"] / 32) == words["_w"]),
                    "inner")
                .filter(F.expr(
                    "shiftright(_m, CAST(_pos % 32 AS INT)) & 1") == 1)
                .drop("_f", "_pos", "_df", "_w", "_m"))
            dcols = [x for x in b_df.columns if x != key]
            frames.append(
                hit.select(
                    key, F.struct(*dcols).alias("_p"),
                    F.lit("delete").alias("_change_type"),
                ).select(key, "_p.*", "_change_type",
                         F.lit(v).alias("_commit_version"))
            )
        if not adds and not removes:
            continue
        a_df = _aligned(adds) if adds else None
        if a_df is not None and dvl_carried:
            # the post-image of a re-added file folds its carried DVs,
            # so the diff sees the file's LOGICAL content on both sides
            a_df = _apply_dvs(spark, table, a_df, key, dvl_carried)
        r_df = _aligned(removes) if removes else None
        if r_df is not None and v > 0:
            # the pre-image is the removed files MINUS their deletion
            # vectors as of v-1: a DV'd row was already logically
            # deleted (and already reported) when its DV committed, so
            # a later rewrite/compaction of the file must not report it
            # again — this is what keeps OPTIMIZE CDF-invisible on
            # DV-carrying files
            removed_names = set(c["removes"])
            dv_pre = {
                f: ds for f, ds in table.live_dvs(v - 1).items()
                if f in removed_names
            }
            if dv_pre:
                r_df = _apply_dvs(spark, table, r_df, key, dv_pre)
        # schema evolution: align both sides on the column union
        cols = []
        for d in (r_df, a_df):
            if d is not None:
                cols += [x for x in d.columns if x not in cols]
        data_cols = [x for x in cols if x != key]
        def _fill(d):
            types = {}
            for dd in (a_df, r_df):
                if dd is not None:
                    types.update(dict(dd.dtypes))
            for x in cols:
                if x not in d.columns:
                    d = d.withColumn(x, F.lit(None).cast(types[x]))
            return d.select(key, F.struct(*data_cols).alias("_p"))
        if r_df is None:
            # adds-only (blind append): duplicates are legal and each
            # copy is its own insert row — no diff, no uniqueness needed
            ch = _fill(a_df).select(
                key, "_p", F.lit("insert").alias("_change_type")
            )
        else:
            # rewrite commit: the key-level diff REQUIRES key uniqueness
            # per side or the full-outer join fans out and fabricates
            # update pairs — fail loudly instead (precondition above)
            from pyspark.sql import Window as W

            def _unique(d, side):
                # materialize the per-key count, then filter on an
                # assert over it (always-true once it doesn't throw):
                # a dropped projection column would be pruned away by
                # the optimizer and never evaluated, and a window can't
                # live inside WHERE directly
                return d.withColumn(
                    "_n", F.count("*").over(W.partitionBy(key))
                ).filter(
                    F.assert_true(
                        F.col("_n") == 1,
                        F.concat(
                            F.lit(
                                f"duplicate key in {side}-image of "
                                f"commit {v} breaks the CDF diff: "
                            ),
                            F.col(key).cast("string"),
                        ),
                    ).isNull()
                ).drop("_n")

            j = (
                _unique(_fill(a_df), "post").withColumnRenamed("_p", "_a")
                .join(
                    _unique(_fill(r_df), "pre").withColumnRenamed("_p", "_r"),
                    key, "full_outer",
                )
            )
            ins = j.filter(F.col("_r").isNull()).select(
                key, F.col("_a").alias("_p"),
                F.lit("insert").alias("_change_type"),
            )
            dele = j.filter(F.col("_a").isNull()).select(
                key, F.col("_r").alias("_p"),
                F.lit("delete").alias("_change_type"),
            )
            upd = j.filter(
                F.col("_a").isNotNull() & F.col("_r").isNotNull()
                & ~F.col("_a").eqNullSafe(F.col("_r"))
            )
            ch = reduce(
                lambda x, y: x.unionByName(y),
                [
                    ins,
                    dele,
                    upd.select(key, F.col("_r").alias("_p"),
                               F.lit("update_pre").alias("_change_type")),
                    upd.select(key, F.col("_a").alias("_p"),
                               F.lit("update_post").alias("_change_type")),
                ],
            )
        frames.append(
            ch.select(key, "_p.*", "_change_type",
                      F.lit(v).alias("_commit_version"))
        )
    if not frames:
        raise ValueError("no commits in range")
    out = reduce(lambda x, y: x.unionByName(y, allowMissingColumns=True),
                 frames)
    # column mapping: the feed comes out under the CURRENT logical
    # names for every version it spans (dropped columns excluded) — a
    # consumer reading across a rename sees one coherent schema
    return _to_logical_spark(table, out)


# -- compliance purge: physical erasure with a provable forget --------------


def _purge_hit_scan(spark, table: TableLog, cand: list[str], key: str, up):
    """The ONE data read purge planning pays: a scan of the pruned
    candidate files COLUMN-PRUNED to the key alone, semi-joined to the
    BROADCAST key set, counted per file — deciding which files to
    rewrite costs one key column of the candidates, never a full-row
    read. Both properties are plan-gated
    (tests/test_plans.py::test_purge_hit_scan_is_key_pruned_broadcast)."""
    from pyspark.sql import functions as F

    paths = [table.data_path(f) for f in cand]
    base = read_files_merged(spark, paths)
    return (
        base.withColumn("_f", _file_col()).select("_f", key)
        .join(F.broadcast(up), key, "left_semi")
        .groupBy("_f").count()
    )


@_reapply_on_constraint_change
def purge_keys_spark(
    spark,
    table: TableLog,
    keys_df,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "purge",
    max_attempts: int = 50,
    pre_commit_hook=None,
) -> dict:
    """COMPLIANCE PURGE — the physical-erasure half of DELETE that
    deletion vectors deliberately skip: a DV hides a row from readers
    but its bytes stay in the base file (and the sidecar itself records
    the key). This rewrites exactly the files whose PHYSICAL bytes hold
    any of the keys and removes them in one OCC commit, folding every
    existing DV of the rewritten files (DV-deleted rows of OTHER keys
    are materialized, never resurrected; DV-deleted rows of the purged
    keys are erased even though they were already logically gone).

    Planning is manifest-only, three prunes deep before any data read —
    bucket (a key hashes to its bucket), min/max range, per-file bloom —
    run as a SPARK JOB over the parquet-checkpoint manifest once one
    exists (only O(candidates) rows reach the driver, never the live
    file count; driver fold as the bootstrap fallback, pinned equal by
    test_purge_candidates_manifest_equals_driver_fold) — then ONE
    key-column-pruned scan of the survivors finds the files with an
    actual physical hit, so a bloom false positive costs a column
    read, never a rewrite. Purging k keys rewrites only the
    files that really hold them: at 100 TB that is the difference
    between a compliance job and a table rewrite. Each replacement is
    1:1 with its source file's bucket, re-sorted on the key, and
    re-carries the SAME stat columns and bloom the old file had, so
    file skipping survives a purge unchanged.

    The logical result ≡ a delete (the change feed reports exactly the
    still-visible purged rows as deletes); the PHYSICAL claim — zero
    retained bytes naming the keys — is completed by
    `forget_keys_spark` and certified by `purge_proof_spark`. Keys are
    collected to the driver for bloom probing: compliance key sets are
    small by nature (a user id, a leaked batch); bulk deletion belongs
    to `delete_keys_spark`."""
    from pyspark.sql import functions as F

    _rev0 = _gate_state(table, removal=True)
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    keys_df = _to_physical_spark(table, keys_df)
    key = table.physical_name(key)
    _fk_restrict_spark(spark, table, keys_df, key)  # RESTRICT
    key_vals = sorted(
        r[0] for r in keys_df.select(key).distinct().collect()
        if r[0] is not None
    )
    v0, _ = table.snapshot()
    out0 = {"committed_version": v0, "attempts": 0, "purged_rows": 0,
            "rewritten_files": 0, "pruned_files": 0, "scanned_files": 0,
            "_key_vals": key_vals}
    if not key_vals:
        return out0
    touched = {
        _bucket_of_py(int(k), n_buckets, table.hash_buckets())
        for k in key_vals
    }
    up = keys_df.select(key).distinct()

    attempts = 0
    staged: list[dict] | None = None
    replaced: list[str] | None = None
    replaced_dvstate: dict[str, tuple] | None = None
    purged_rows = 0
    pruned = scanned = 0

    from . import manifest as _manifest

    while attempts < max_attempts:
        v = table.version()
        # candidate planning: bucket ∩ min/max ∩ bloom, conservative
        # exactly like live_paths_pruned* (no stats -> candidate). With
        # a parquet checkpoint this is a SPARK JOB over the manifest —
        # only O(candidates) rows reach the driver, never the live
        # file count (the live_paths_pruned*_manifest discipline
        # applied to the compliance write path); the driver fold is
        # the bootstrap/migration fallback, pinned row-for-row equal.
        if _manifest.newest_checkpoint_parquet(table, v) > 0:
            cand_rows, pruned = _manifest.purge_candidates_manifest(
                spark, table, key, key_vals, touched, version=v)
        else:
            live, stats_all, dvall, _ = table._fold_entries(v)
            cand_rows, pruned = [], 0
            for f, b in sorted(live.items()):
                if b not in touched:
                    continue
                st = stats_all.get(f) or {}
                rng = st.get(key)
                bl = st.get(f"_bloom:{key}")
                maybe = False
                for kv in key_vals:
                    if rng is not None and not (
                            rng["min"] <= kv <= rng["max"]):
                        continue
                    if bl is not None and not bloom_maybe_contains(bl, kv):
                        continue
                    maybe = True
                    break
                if maybe:
                    cand_rows.append({"file": f, "pb": int(b),
                                      "dvs": list(dvall.get(f, ())),
                                      "stats": st})
                else:
                    pruned += 1
        cand = sorted(r["file"] for r in cand_rows)
        pb_of = {r["file"]: r["pb"] for r in cand_rows}
        stats_of = {r["file"]: r["stats"] for r in cand_rows}
        dvs_of = {r["file"]: r["dvs"] for r in cand_rows}
        scanned = len(cand)
        dvstate = {f: tuple(dvs_of.get(f, ())) for f in cand}
        if staged is None or dvstate != replaced_dvstate:
            if staged:
                _unlink_staged(table, staged)
            staged, replaced = None, None
            replaced_dvstate = dvstate
            if not cand:
                if _gate_state(table, removal=True) != _rev0:
                    raise _ConstraintsChanged(None)
                return dict(out0, committed_version=v, attempts=attempts,
                            pruned_files=pruned)
            # ONE column-pruned scan of the candidates: which files hold
            # a PHYSICAL hit (visible or DV-hidden), and how many rows
            hit_rows = _purge_hit_scan(spark, table, cand, key, up) \
                .collect()
            hit_files = sorted(r["_f"] for r in hit_rows)
            purged_rows = int(sum(r["count"] for r in hit_rows))
            if not hit_files:
                if _gate_state(table, removal=True) != _rev0:
                    raise _ConstraintsChanged(None)
                return dict(out0, committed_version=v, attempts=attempts,
                            pruned_files=pruned, scanned_files=scanned)
            replaced = hit_files
            # rewrite ONLY the hit files: fold their DVs, drop key rows,
            # one replacement per source file in the source's bucket
            hpaths = [table.data_path(f) for f in hit_files]
            hbase = read_files_merged(spark, hpaths)
            visible = _apply_dvs(
                spark, table, hbase, key,
                {f: dvs_of.get(f, []) for f in hit_files},
                files=set(hit_files), keep_file_col=True,
            )
            kept = visible.join(F.broadcast(up), key, "left_anti")
            tmp_out = table.data_path(f"_stage-{uuid.uuid4().hex}")
            (
                kept.repartition(max(len(hit_files), 1), "_f")
                .sortWithinPartitions(key)
                .write.mode("overwrite").partitionBy("_f").parquet(tmp_out)
            )
            staged = []
            for d in sorted(os.listdir(tmp_out)):
                if not d.startswith("_f="):
                    continue
                old = d.split("=", 1)[1]
                b = int(pb_of[old])
                old_st = stats_of.get(old) or {}
                scols = [c for c in old_st if not c.startswith("_bloom:")]
                bcols = [c[len("_bloom:"):] for c in old_st
                         if c.startswith("_bloom:")]
                for p in sorted(os.listdir(os.path.join(tmp_out, d))):
                    if not p.endswith(".parquet"):
                        continue
                    name = table.new_data_file(b)
                    shutil.move(os.path.join(tmp_out, d, p),
                                table.data_path(name))
                    entry: dict = {"file": name, "pb": b}
                    st2 = (parquet_file_stats(table.data_path(name), scols)
                           if scols else {})
                    for bc in bcols:
                        st2[f"_bloom:{bc}"] = parquet_key_bloom(
                            table.data_path(name), bc)
                    if st2:
                        entry["stats"] = st2
                    staged.append(entry)
            shutil.rmtree(tmp_out, ignore_errors=True)
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table, removal=True) != _rev0:
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(None)
        attempts += 1
        if table.try_commit(v, staged, replaced, writer,
                            fk_removal=True):
            return {"committed_version": v + 1, "attempts": attempts,
                    "purged_rows": purged_rows,
                    "rewritten_files": len(replaced),
                    "pruned_files": pruned, "scanned_files": scanned,
                    "_key_vals": key_vals}
    _unlink_staged(table, staged)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


@_reapply_on_constraint_change
def purge_keys_pandas(
    table: TableLog,
    keys,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "purge",
    max_attempts: int = 50,
    pre_commit_hook=None,
) -> dict:
    """Engine-free twin of `purge_keys_spark`: physical erasure from a
    plain key iterable, no JVM — the portable client a compliance
    worker or test process uses. Same plan, same result shape: bucket
    ∩ min/max ∩ bloom candidate pruning (off the driver fold — the
    lightweight client IS the driver), a key-column read of the
    survivors to find physical hits, then a 1:1 pyarrow rewrite of
    exactly the hit files — existing DVs folded in (DV-hidden rows of
    other keys materialize, DV-hidden rows of the purged keys erase),
    rows re-sorted on the key, the old file's stat columns and bloom
    re-derived. Cross-client: purge-via-pandas ≡ purge-via-Spark
    state-for-state (test_purge_cross_client_differential)."""
    import pyarrow.parquet as pq

    _rev0 = _gate_state(table, removal=True)
    key, n_buckets = _resolve_layout(table, key, n_buckets)
    key = table.physical_name(key)
    key_vals = sorted({int(k) for k in keys})
    _fk_restrict_pandas(table, set(key_vals))  # RESTRICT
    v0 = table.version()
    out0 = {"committed_version": v0, "attempts": 0, "purged_rows": 0,
            "rewritten_files": 0, "pruned_files": 0, "scanned_files": 0,
            "_key_vals": key_vals}
    if not key_vals:
        return out0
    kset = set(key_vals)
    touched = {_bucket_of_py(k, n_buckets, table.hash_buckets())
               for k in key_vals}

    attempts = 0
    staged: list[dict] | None = None
    replaced: list[str] | None = None
    replaced_dvstate: dict[str, tuple] | None = None
    purged_rows = 0
    pruned = scanned = 0

    while attempts < max_attempts:
        v = table.version()
        live, stats_all, dvall, _ = table._fold_entries(v)
        cand_rows: list[dict] = []
        pruned = 0
        for f, b in sorted(live.items()):
            if b not in touched:
                continue
            st = stats_all.get(f) or {}
            rng = st.get(key)
            bl = st.get(f"_bloom:{key}")
            maybe = False
            for kv in key_vals:
                if rng is not None and not (rng["min"] <= kv <= rng["max"]):
                    continue
                if bl is not None and not bloom_maybe_contains(bl, kv):
                    continue
                maybe = True
                break
            if maybe:
                cand_rows.append({"file": f, "pb": int(b),
                                  "dvs": list(dvall.get(f, ())),
                                  "stats": st})
            else:
                pruned += 1
        cand = sorted(r["file"] for r in cand_rows)
        pb_of = {r["file"]: r["pb"] for r in cand_rows}
        stats_of = {r["file"]: r["stats"] for r in cand_rows}
        dvs_of = {r["file"]: r["dvs"] for r in cand_rows}
        scanned = len(cand)
        dvstate = {f: tuple(dvs_of.get(f, ())) for f in cand}
        if staged is None or dvstate != replaced_dvstate:
            if staged:
                _unlink_staged(table, staged)
            staged, replaced = None, None
            replaced_dvstate = dvstate
            if not cand:
                if _gate_state(table, removal=True) != _rev0:
                    raise _ConstraintsChanged(None)
                return dict(out0, committed_version=v, attempts=attempts,
                            pruned_files=pruned)
            # key-column read of the candidates: physical hits only
            hit_files = []
            purged_rows = 0
            for f in cand:
                col = pq.read_table(
                    table.data_path(f), columns=[key]
                ).to_pandas()[key]
                n_hit = int(col.isin(kset).sum())
                if n_hit:
                    hit_files.append(f)
                    purged_rows += n_hit
            if not hit_files:
                if _gate_state(table, removal=True) != _rev0:
                    raise _ConstraintsChanged(None)
                return dict(out0, committed_version=v, attempts=attempts,
                            pruned_files=pruned, scanned_files=scanned)
            replaced = hit_files
            staged = []
            for f in hit_files:
                frame = pq.read_table(table.data_path(f)).to_pandas()
                dead: set = set()
                for d in dvs_of.get(f, ()):
                    dead |= set(
                        pq.read_table(table.data_path(d)).to_pandas()[key]
                    )
                kept = frame[~frame[key].isin(kset)
                             & ~frame[key].isin(dead)]
                if kept.empty:
                    continue  # whole file erased: remove, no replacement
                kept = kept.sort_values(key).reset_index(drop=True)
                b = pb_of[f]
                old_st = stats_of.get(f) or {}
                scols = [c for c in old_st if not c.startswith("_bloom:")]
                bcols = [c[len("_bloom:"):] for c in old_st
                         if c.startswith("_bloom:")]
                name = table.new_data_file(b)
                import pyarrow as pa

                pq.write_table(pa.Table.from_pandas(kept,
                                                    preserve_index=False),
                               table.data_path(name))
                entry: dict = {"file": name, "pb": b}
                st2 = (parquet_file_stats(table.data_path(name), scols)
                       if scols else {})
                for bc in bcols:
                    st2[f"_bloom:{bc}"] = parquet_key_bloom(
                        table.data_path(name), bc)
                if st2:
                    entry["stats"] = st2
                staged.append(entry)
        if pre_commit_hook is not None:
            pre_commit_hook(v)
        if _gate_state(table, removal=True) != _rev0:
            _unlink_staged(table, staged)
            raise _ConstraintsChanged(None)
        attempts += 1
        if table.try_commit(v, staged, replaced, writer,
                            fk_removal=True):
            return {"committed_version": v + 1, "attempts": attempts,
                    "purged_rows": purged_rows,
                    "rewritten_files": len(replaced),
                    "pruned_files": pruned, "scanned_files": scanned,
                    "_key_vals": key_vals}
    _unlink_staged(table, staged)
    raise CommitConflict(f"{writer}: gave up after {max_attempts} attempts")


def _scrub_quarantine_keys(spark, table: TableLog, key: str,
                           key_vals) -> int:
    """Erase the purged keys from the dead-letter area too: a diverted
    row is still the entity's data. Batch-granular rewrite (read,
    anti-filter, write fresh, drop old) — a crash between write and
    drop duplicates survivors, which the DLQ's at-least-once contract
    already absorbs. Quarantine rows carry LOGICAL names (diversion
    happens before the physical boundary), so ``key`` here is logical.
    Returns the number of rows erased."""
    from pyspark.sql import functions as F

    qroot = quarantine_dir(table)
    if not os.path.isdir(qroot):
        return 0
    erased = 0
    for b in sorted(os.listdir(qroot)):
        src = os.path.join(qroot, b)
        if not os.path.isdir(src):
            continue
        df = spark.read.option("mergeSchema", "true").parquet(src)
        if key not in df.columns:
            continue
        hits = df.filter(F.col(key).isin(list(key_vals))).count()
        if not hits:
            continue
        erased += int(hits)
        keep = df.filter(~F.col(key).isin(list(key_vals)))
        if keep.isEmpty():
            shutil.rmtree(src, ignore_errors=True)
            continue
        out = os.path.join(qroot, uuid.uuid4().hex)
        keep.write.mode("overwrite").parquet(out)
        shutil.rmtree(src, ignore_errors=True)
    return erased


def forget_keys_spark(
    spark,
    table: TableLog,
    keys_df,
    key: str | None = None,
    n_buckets: int | None = None,
    writer: str = "forget",
    vacuum_min_age: float = 0.0,
    scrub_quarantine: bool = True,
    max_attempts: int = 50,
) -> dict:
    """RIGHT-TO-BE-FORGOTTEN: make a purge PROVABLE by erasing every
    retained byte that names the keys — data files, DV sidecars, the
    dead-letter area, and the LOG itself (old commit manifests can
    carry a purged key as a min/max stat; old checkpoints carry whole
    historical states). Five steps, each built from an existing
    primitive:

    1. `purge_keys_spark` — rewrite the hit files, one OCC commit;
    2. pad with empty commits to the next CHECKPOINT_EVERY boundary
       (≤ CHECKPOINT_EVERY-1 no-op commits; the boundary commit writes
       a full-state checkpoint of the POST-purge table);
    3. `expire_snapshots(keep_last=1)` — the retention floor lands ON
       that checkpoint, so every pre-purge version becomes unreadable
       (SnapshotExpired) before its bytes go;
    4. `truncate_log()` — every commit/checkpoint below the floor
       checkpoint (everything that could mention the keys) is deleted;
    5. `vacuum(vacuum_min_age)` — the replaced base files and the now
       file-less DV sidecars are unlinked.

    This deliberately SPENDS time travel below the purge — that is the
    point of a compliance forget. Default ``vacuum_min_age=0.0`` is the
    single-operator compliance stance; pass the normal rail when
    concurrent writers may be staging. `purge_proof_spark` certifies
    the result."""
    st = purge_keys_spark(
        spark, table, keys_df, key, n_buckets,
        writer=writer, max_attempts=max_attempts,
    )
    # 2. pad to the checkpoint boundary (OCC loop: a racing writer's
    # commit also advances the head, which only helps)
    pads = 0
    for _ in range(max_attempts):
        head = table.version()
        if head % CHECKPOINT_EVERY == 0:
            break
        if table.try_commit(head, [], [], f"{writer}-pad"):
            pads += 1
    else:
        raise CommitConflict(f"{writer}: could not reach a checkpoint "
                             f"boundary in {max_attempts} attempts")
    table.expire_snapshots(keep_last=1)
    truncated = table.truncate_log()
    vacuumed = table.vacuum(vacuum_min_age)
    q_erased = 0
    if scrub_quarantine:
        lkey, _ = _resolve_layout(table, key, n_buckets)
        kv = st.pop("_key_vals", [])  # collected once by the purge
        if kv:
            q_erased = _scrub_quarantine_keys(spark, table, lkey, kv)
    else:
        st.pop("_key_vals", None)
    return dict(st, pad_commits=pads, truncated_log_files=len(truncated),
                vacuumed_files=len(vacuumed), quarantine_rows_erased=q_erased)


def _walk_json_data_values(node):
    """Yield the scalars in a log JSON that carry ROW DATA: the
    ``min``/``max`` stat values (anywhere in the tree), skipping
    ``_bloom:*`` subtrees (bloom words are hashes — a word value
    equal to a key is a coincidence, not a leak) and every structural
    field (versions, buckets, timestamps, file names, id watermarks —
    none of them hold a row's key)."""
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(k, str) and k.startswith("_bloom:"):
                continue
            if k in ("min", "max") and not isinstance(v, (dict, list)):
                yield v
            else:
                yield from _walk_json_data_values(v)
    elif isinstance(node, list):
        for v in node:
            yield from _walk_json_data_values(v)


def purge_proof_spark(spark, table: TableLog, keys_df,
                      key: str | None = None) -> dict:
    """CERTIFY a forget: scan every retained byte under the table root
    for the purged keys and count hits — the auditor's half of
    `forget_keys_spark`, kept separate so the proof never trusts the
    eraser. Three surfaces:

    - every parquet file under the table root (data files, DV sidecars
      — they store the key under its PHYSICAL name — quarantine
      batches, parquet checkpoint manifests), read via ONE Spark job
      per schema-group: any column named like the key (physical or
      logical) is probed with an IN filter;
    - every retained JSON under the log/meta (commit manifests,
      checkpoints, table meta): structural walk over the positions
      that carry ROW DATA — the min/max stat values — counting any
      equal to a key value (catches a key surviving as a stat;
      versions/buckets/watermarks are structural and excluded, so a
      key of 0 never false-positives against bucket 0);
    - returns {"parquet_files_scanned", "parquet_hits", "json_files_
      scanned", "json_hits"} — both hit counts must be 0 after a
      forget, which is exactly what the oracle-certified query and the
      pytest pin assert."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    lkey, _ = _resolve_layout(table, key, None)
    pkey = table.physical_name(lkey)
    kdf = _to_physical_spark(table, keys_df)
    key_vals = [r[0] for r in kdf.select(pkey).distinct().collect()
                if r[0] is not None]
    probe_cols = {pkey, lkey}

    # parquet surface: group files by which probe columns they carry,
    # one distributed read per group (schema peek is footer-only)
    groups: dict[tuple, list[str]] = {}
    n_pq = 0
    for root, _dirs, files in os.walk(table.path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(root, fn)
            n_pq += 1
            try:
                names = set(pq.ParquetFile(p).schema_arrow.names)
            except Exception:
                names = set()
            cols = tuple(sorted(probe_cols & names))
            if cols:
                groups.setdefault(cols, []).append(p)
    pq_hits = 0
    for cols, paths in sorted(groups.items()):
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        cond = None
        for c in cols:
            this = F.col(c).isin(key_vals)
            cond = this if cond is None else (cond | this)
        pq_hits += df.filter(cond).count()

    # JSON surface: structural scalar equality (never substring — a
    # key must not false-positive against versions/timestamps)
    kv = set(key_vals)
    n_js = 0
    js_hits = 0
    for root, _dirs, files in os.walk(table.path):
        for fn in files:
            if not fn.endswith(".json"):
                continue
            n_js += 1
            try:
                with open(os.path.join(root, fn)) as fh:
                    body = json.load(fh)
            except Exception:
                continue
            js_hits += sum(
                1 for s in _walk_json_data_values(body)
                if not isinstance(s, bool) and s in kv
            )
    return {"parquet_files_scanned": n_pq, "parquet_hits": int(pq_hits),
            "json_files_scanned": n_js, "json_hits": int(js_hits)}


# -- shallow clone: zero-copy table branch ----------------------------------


def clone_table(
    src: TableLog,
    dst_path: str,
    version: int | None = None,
    writer: str = "clone",
) -> dict:
    """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE``,
    hardened): a new INDEPENDENT table whose version 0 is the source
    snapshot at ``version`` (head if None) — zero data bytes copied.
    Data files and DV sidecars enter the clone as HARDLINKS, which buys
    the guarantee Delta's path-reference clones cannot make: vacuuming
    — or outright dropping — the SOURCE can never break the clone,
    because every inode stays alive under the clone's own directory
    (and files are immutable by the OCC protocol, so sharing bytes is
    safe). Falls back to a byte copy when the filesystem refuses the
    link (cross-device), reported in the returned stats.

    Everything a writer needs rides across: manifest stats and blooms
    (file skipping works from birth), the table rules verbatim
    (layout, hash_buckets, constraints+rev, generated, identity,
    column mapping+rev, auto-optimize) — so a clone-side writer is
    gated exactly like a source writer — and the identity high-water
    mark rides commit 0's ``id_range``, so clone-side inserts can
    never collide with cloned ids. Multiple DV sidecars per file merge
    to one (the RESTORE/ANALYZE discipline: a commit attaches at most
    one per file).

    The clone's HISTORY starts at the clone (Delta semantics): time
    travel below it belongs to the source; the transient
    ``rebucket_pending`` intent and the source's layout epoch do not
    transfer. Like RESTORE, cloning at a version below the source's
    layout epoch is refused — that manifest's bucket ids would lie
    under the current bucket count.

    This is the write-audit-publish / experiment-branch primitive: at
    100 TB a clone is O(live files) metadata + hardlinks, runs in
    seconds, and diverging commits on either side never touch the
    other."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    head = src.version()
    v = head if version is None else int(version)
    if not 0 <= v <= head:
        raise ValueError(f"version {v} outside [0, {head}]")
    epoch = int(src._meta().get("layout_since_version", 0))
    if v < epoch:
        raise ValueError(
            f"clone at v{v} crosses the layout epoch (rebucket at "
            f"v{epoch}): that manifest's bucket ids are in the old "
            f"layout")
    src._check_not_expired(v)
    dst = TableLog(dst_path)
    if os.path.exists(dst._head_hint_path()) or (
        os.path.isdir(dst.log_dir)
        and any(n.startswith("v") for n in os.listdir(dst.log_dir))
    ):
        raise ValueError(f"clone destination {dst_path} already has a log")
    os.makedirs(dst.log_dir, exist_ok=True)
    os.makedirs(dst.data_dir, exist_ok=True)

    # table rules, verbatim minus transient/epoch state
    meta = {k: val for k, val in src._meta().items()
            if k not in ("rebucket_pending", "layout_since_version")}
    # the replication bootstrap marker: `replicate_resume_spark` starts
    # its cursor here when the clone has never caught up before
    meta["cloned_from_version"] = v
    dst._persist_meta(meta)

    live, stats, dvs, hwm = src._fold_entries(v)

    def _bring(name: str) -> bool:
        """Zero-copy reference or copy via the storage seam (hardlink
        on POSIX; an object store always copies). True = linked.
        RETRYABLE: a destination entry that is already the same object
        (a prior clone attempt died between bringing and the commit,
        or a concurrent clone of the same snapshot brought it first)
        is accepted; a foreign file under the same name is refused
        loudly rather than silently overwritten."""
        s, d = src.data_path(name), dst.data_path(name)
        try:
            return dst.storage.link_or_copy(s, d) == "linked"
        except FileExistsError:
            raise ValueError(
                f"clone destination holds a foreign file {name!r}")

    linked = copied = 0
    adds = []
    for f in sorted(live):
        if _bring(f):
            linked += 1
        else:
            copied += 1
        entry: dict = {"file": f, "pb": int(live[f])}
        if stats.get(f):
            entry["stats"] = stats[f]
        adds.append(entry)
    dv_attach: dict = {}
    for f in sorted(dvs):
        freshly_merged: list = []  # names _merge_sidecar_list WROTE at
        # dst (fresh uuids) — the only names legitimately pre-existing
        # there; everything else goes through _bring, whose foreign-file
        # check must stay loud (a leftover under a carried src name must
        # refuse, never be silently committed into the clone's DV state)
        att = _merge_sidecar_list(src.data_path, dst, list(dvs[f]),
                                  staged=freshly_merged)
        for nm in (att if isinstance(att, list) else [att]):
            if nm in freshly_merged:
                continue
            if _bring(nm):
                linked += 1
            else:
                copied += 1
        dv_attach[f] = att
    if not dst.try_commit(
        -1, adds, [], writer,
        dvs=dv_attach or None,
        id_range=((0, hwm) if hwm > 0 else None),
    ):
        raise CommitConflict(f"{writer}: destination raced")
    return {"cloned_from_version": v, "files": len(adds),
            "dv_sidecars": len(dv_attach), "linked": linked,
            "copied": copied, "id_hwm": hwm}


def replicate_changes_spark(
    spark,
    src: TableLog,
    dst: TableLog,
    key: str | None = None,
    from_version: int = 1,
    to_version: int | None = None,
    writer: str = "replicate",
) -> dict:
    """INCREMENTAL REPLICATION off the change feed: apply the source's
    changes in ``[from_version, to_version]`` to a replica table — the
    CDC-consumer loop made a one-call primitive. Pairs naturally with
    `clone_table` for the bootstrap: clone at version c, then replicate
    from c+1 forward, remembering the last applied version exactly like
    a streaming consumer remembers its offset (the caller owns that
    cursor; ranges must be contiguous and non-overlapping for the
    replica to track the source).

    The range FOLDS to the net change per key before touching the
    replica (last change wins; ``update_pre`` rows are discarded): one
    upsert MERGE plus one key DELETE on the target, regardless of how
    many versions the range spans — a replica 10k commits behind pays
    two write commits, not 10k. Deliberately NOT cached between the
    two branches: the CDF plan reads only commit-touched files, so
    recomputing it costs less than materializing it (the minhash
    .persist() lesson).

    What does NOT replicate, by design: compliance purges (CDF-silent;
    run `purge_keys_spark` per replica — erasure is a per-copy duty),
    OPTIMIZE/ANALYZE (physical layout is per-table), and table rules
    (ALTERs are metadata; clone carries them at bootstrap). The replica
    applies its OWN constraints to incoming rows, exactly like any
    writer."""
    if key is None:
        key = src.layout()[0]
    if key is None:
        raise ValueError("no persisted layout; pass key explicitly")
    hi = src.version() if to_version is None else int(to_version)
    out = {"from_version": from_version, "to_version": hi,
           "upserted_keys": 0, "deleted_keys": 0}
    if hi < from_version:
        return out
    ch = table_changes_spark(spark, src, key, from_version, hi)
    st = apply_changes_spark(spark, dst, ch, key, writer=writer)
    out.update(st)
    return out


def apply_changes_spark(
    spark, dst: TableLog, changes_df, key: str, writer: str = "replicate",
) -> dict:
    """Apply one batch of change-feed rows (the `table_changes_spark`
    shape: data columns + ``_change_type`` + ``_commit_version``) to a
    replica: fold to the net change per key (last ``_commit_version``
    wins, ``update_pre`` discarded), then one upsert MERGE + one key
    DELETE. This is the per-micro-batch half of replication — a
    foreachBatch sink calls it per trigger (s33), the batch
    `replicate_changes_spark` calls it once per range; both land the
    same state because the fold only assumes batches arrive in commit
    order, which both the replay mtime discipline and range contiguity
    guarantee."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    net = (
        changes_df.filter(F.col("_change_type") != "update_pre")
        .withColumn("_rn", F.row_number().over(
            W.partitionBy(key).orderBy(F.col("_commit_version").desc())))
        .filter(F.col("_rn") == 1)
    )
    # ONE counting pass decides both branches (the CDF fold is cheap
    # but not free; two separate count() actions would evaluate it
    # twice more than the merge/delete reads already do)
    counts = {
        bool(r["_is_del"]): int(r["count"])
        for r in net.groupBy(
            (F.col("_change_type") == "delete").alias("_is_del")
        ).count().collect()
    }
    out = {"upserted_keys": 0, "deleted_keys": 0}
    if counts.get(False, 0):
        upserts = net.filter(F.col("_change_type") != "delete") \
            .drop("_change_type", "_commit_version", "_rn")
        merge_upsert_spark(spark, dst, upserts, key, writer=writer)
        out["upserted_keys"] = counts[False]
    if counts.get(True, 0):
        deletes = net.filter(
            F.col("_change_type") == "delete").select(key)
        delete_keys_spark(spark, dst, deletes, key, writer=writer)
        out["deleted_keys"] = counts[True]
    return out


def _replication_cursor_path(dst: TableLog) -> str:
    return os.path.join(dst.log_dir, "_replication.json")


def replicate_resume_spark(
    spark,
    src: TableLog,
    dst: TableLog,
    key: str | None = None,
    writer: str = "replicate",
    max_versions: int | None = None,
) -> dict:
    """RESUMABLE replication: `replicate_changes_spark` with the
    version cursor PERSISTED in the replica's own log dir — the one
    call a scheduled catch-up job needs. The cursor bootstraps from the
    ``cloned_from_version`` marker `clone_table` stamps (so clone →
    resume needs no hand-carried version), advances atomically AFTER
    the range is applied, and a crash between apply and cursor write
    merely re-applies the same range next time — safe because the
    net-fold apply is idempotent per range (pinned by
    test_replicate_range_idempotent). ``max_versions`` bounds one
    call's range (the catch-up pacing knob); the return says how far it
    got, so a loop calls until ``behind == 0``.

    Single-replicator discipline: the cursor is an atomic replace, not
    a lock — two concurrent resumers can apply the same range twice
    (idempotent, wasteful) but can never skip one, because each reads
    the cursor before applying and writes only its own end version."""
    cur_path = _replication_cursor_path(dst)
    if os.path.exists(cur_path):
        with open(cur_path) as fh:
            last = int(json.load(fh)["last_applied"])
    else:
        marker = dst._meta().get("cloned_from_version")
        if marker is None:
            raise ValueError(
                "no replication cursor and no clone marker: bootstrap "
                "the replica with clone_table, or write the cursor "
                "explicitly")
        last = int(marker)
    if max_versions is not None and max_versions < 1:
        raise ValueError(f"max_versions must be >= 1, got {max_versions}")
    head = src.version()
    hi = head if max_versions is None else min(head, last + max_versions)
    if hi <= last:
        return {"from_version": last + 1, "to_version": last,
                "upserted_keys": 0, "deleted_keys": 0, "behind": 0}
    st = replicate_changes_spark(
        spark, src, dst, key, from_version=last + 1, to_version=hi,
        writer=writer,
    )
    tmp = cur_path + f".tmp{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as fh:
        json.dump({"last_applied": hi}, fh)
    os.replace(tmp, cur_path)
    return dict(st, behind=head - hi)
