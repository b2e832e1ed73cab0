"""User-facing table facade over the OCC commit log — the DeltaTable-
shaped API (`DeltaTable.forPath(...)`) so a caller drives the whole
layer through one handle instead of the free functions:

    t = Table.create(spark, path, df, key="k", n_buckets=16)
    t.merge(updates)                      # upsert (optionally versioned)
    t.delete(keys)                        # deletion vectors, no rewrites
    t.sync(snapshot)                      # three-clause MERGE
    t.optimize(sort_col="d")              # bin-pack / cluster / compact DVs
    t.read()                              # DV-folded current snapshot
    t.read(version=3); t.read(timestamp=ts)
    t.change_feed(from_version=2)
    t.history()                           # DESCRIBE HISTORY
    t.expire_snapshots(keep_last=10); t.vacuum(); t.truncate_log()
    t.add_constraint("pk", {"col": "k", "unique": True})   # live ALTER
    t.drop_constraint("pk")
    t.quarantine(); t.reprocess_quarantine()  # expectations dead-letter
    Table.for_path(spark, path)           # layout persisted at create

Every method delegates to the tested free functions (sources/acid.py) —
the facade adds ZERO protocol logic, so the OCC/retention/DV guarantees
are exactly the ones the acid test-suite pins. Reference parity: the
reference exposes its durable state through one handle per flow
(flow.rb:31); this is the data-table analog.
"""

from __future__ import annotations

from distribot_spark.sources import acid


class Table:
    """Handle for one logged table. Cheap to construct; all state lives
    in the log directory, so handles in different processes see the
    same table (the multi-writer story)."""

    def __init__(self, spark, path: str, key: str | None = None,
                 n_buckets: int | None = None) -> None:
        self.spark = spark
        self.log = acid.TableLog(path)
        # explicit args PIN the layout (legacy tables); otherwise the
        # handle resolves it LIVE from metadata on every use, so a
        # rebucket by another handle or process is picked up instead
        # of writing under a stale cached count forever
        self._pinned_key = key
        self._pinned_n = n_buckets

    @property
    def key(self) -> str | None:
        if self._pinned_key is not None:
            return self._pinned_key
        return self.log.effective_layout()[0]

    @property
    def n_buckets(self) -> int | None:
        if self._pinned_n is not None:
            return self._pinned_n
        return self.log.effective_layout()[1]

    # -- creation ---------------------------------------------------------

    @classmethod
    def create(cls, spark, path: str, df, key: str, n_buckets: int,
               hash_buckets: bool = False,
               constraints: dict | None = None,
               generated: dict | None = None,
               identity: dict | None = None) -> "Table":
        """Create version 0 from a DataFrame (fails if the table
        exists); ``hash_buckets`` persists the skew-resistant bucket
        function and ``constraints`` the CHECK constraints in table
        metadata — every writer on any client enforces them."""
        t = cls(spark, path, key, n_buckets)
        acid.write_initial_spark(spark, t.log, df, key, n_buckets,
                                 hash_buckets=hash_buckets,
                                 constraints=constraints,
                                 generated=generated,
                                 identity=identity)
        t._pinned_key = t._pinned_n = None  # layout persisted: go live
        return t

    @classmethod
    def for_path(cls, spark, path: str, key: str | None = None,
                 n_buckets: int | None = None) -> "Table":
        """Attach to an existing table. Tables created by this layer
        persist their layout, so ``Table.for_path(spark, path)`` is the
        whole incantation; pre-layout-metadata tables still need
        key/n_buckets passed (and an explicit argument always wins)."""
        t = cls(spark, path, key, n_buckets)
        if t.log.version() < 0:
            raise FileNotFoundError(f"no table at {path}")
        if t.key is None or t.n_buckets is None:
            raise ValueError(
                f"table at {path} has no persisted layout; pass "
                "key/n_buckets"
            )
        return t

    # -- reads ------------------------------------------------------------

    def read(self, version: int | None = None, timestamp: float | None = None,
             tombstone_col: str | None = None, apply_dvs: bool = True,
             role: str | None = None):
        """Current snapshot (or VERSION AS OF / TIMESTAMP AS OF), with
        deletion vectors folded and optional tombstone filtering.

        The facade read is the GOVERNED path: when the table carries
        access policies (row filters / column masks), they apply for
        ``role`` — including time-travel reads (current policy governs
        every version; old snapshots are not an escape hatch). A raw
        read of a governed table is the privileged storage API
        (`acid.read_snapshot_spark`), deliberately not reachable from
        here."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.log.version_at_timestamp(timestamp)
        pol = self.log.policies()
        if pol["masks"] or pol["row_filters"]:
            if not apply_dvs:
                raise ValueError(
                    "raw physical read of a governed table: use the "
                    "privileged acid.read_snapshot_spark explicitly")
            return acid.read_policy_spark(
                self.spark, self.log, role=role, version=version,
                dv_key=self.key, tombstone_col=tombstone_col,
            )
        return acid.read_snapshot_spark(
            self.spark, self.log, version=version,
            tombstone_col=tombstone_col, apply_dvs=apply_dvs,
            dv_key=self.key,
        )

    def read_pandas(self, version: int | None = None,
                    tombstone_col: str | None = None,
                    role: str | None = None):
        """Engine-free governed snapshot read (no JVM): DV fold, column
        mapping, and the same policy enforcement as `read`, in pure
        pyarrow/pandas (`acid.read_policy_pandas`)."""
        return acid.read_policy_pandas(
            self.log, role=role, version=version,
            tombstone_col=tombstone_col,
        )

    def to_view(self, name: str, role: str | None = None,
                version: int | None = None) -> None:
        """Register the (governed) read as a temp view so plain
        ``spark.sql`` queries hit the table under ``role``'s policies —
        the catalog hand-off: analysts write SQL, the view carries the
        enforcement. Re-registering replaces (policy changes need a
        re-register; views snapshot the plan, not the metadata)."""
        self.read(role=role, version=version).createOrReplaceTempView(name)

    def change_feed(self, from_version: int = 0,
                    to_version: int | None = None,
                    role: str | None = None):
        """Row-level change data feed (insert/delete/update_pre/post).
        On a governed table the feed is policy-enforced per change row
        — otherwise CDF would leak exactly the masked columns' pre/post
        images (`acid.table_changes_policy_spark`)."""
        pol = self.log.policies()
        if pol["masks"] or pol["row_filters"]:
            return acid.table_changes_policy_spark(
                self.spark, self.log, role=role, key=self.key,
                from_version=from_version, to_version=to_version,
            )
        return acid.table_changes_spark(
            self.spark, self.log, self.key, from_version, to_version
        )

    def history(self):
        """DESCRIBE HISTORY: one row per retained commit — version,
        writer, timestamp, files added/removed, DV attachments. Reads
        only commit manifests (floor..head), never data files."""
        rows = []
        head = self.log.version()
        for v in range(self.log.expired_before(), head + 1):
            c = self.log.read_commit(v)
            rows.append((
                v, c.get("writer", ""), float(c["ts"]),
                len(c["adds"]), len(c["removes"]),
                len(c.get("dvs") or {}),
            ))
        from distribot_spark.session import local_rows_df

        return local_rows_df(
            self.spark, rows,
            "version int, writer string, ts double, "
            "n_adds int, n_removes int, n_dvs int",
        )

    def version(self) -> int:
        return self.log.version()

    def detail(self) -> dict:
        """DESCRIBE DETAIL: one dict of table-level facts — version,
        file/byte counts, layout, bucket function, constraint /
        generated / identity declarations, retention floor, DV and
        quarantine presence. Metadata-only: manifests and `os.stat`,
        no data files opened."""
        import os as _os

        log = self.log
        head = log.version()
        _, live = log.snapshot()
        size = 0
        for f in live:
            try:
                size += _os.stat(log.data_path(f)).st_size
            except FileNotFoundError:
                pass
        qdir = acid.quarantine_dir(log)
        return {
            "version": head,
            "features": log.features(),
            "num_files": len(live),
            "size_bytes": size,
            "key": self.key,
            "n_buckets": self.n_buckets,
            "hash_buckets": log.hash_buckets(),
            "constraints": log.constraints(),
            "generated": log.generated(),
            "identity": log.identity(),
            "id_hwm": (log.id_hwm() if log.identity() else None),
            "retention_floor": log.expired_before(),
            "num_dv_files": sum(len(d) for d in log.live_dvs().values()),
            "has_quarantine": _os.path.isdir(qdir) and
            bool(_os.listdir(qdir)),
            "column_mapping": log.column_mapping(),
            "policies": log.policies(),
            "policies_rev": log.policies_rev(),
            "foreign_keys": log.fk_specs(),
            "referenced_by": log.fk_referenced_by(),
        }

    # -- writes -----------------------------------------------------------

    def merge(self, updates_df, version_col: str | None = None,
              writer: str = "merge") -> dict:
        """Keyed upsert; ``version_col`` switches to the conditional
        (idempotent, out-of-order-safe) CDC merge."""
        return acid.merge_upsert_spark(
            self.spark, self.log, updates_df, self._pinned_key,
            self._pinned_n, writer, version=version_col,
        )

    def append(self, df, writer: str = "append", stats_cols=()) -> dict:
        """Blind insert (new keys), the streaming micro-batch fast path."""
        return acid.append_spark(
            self.spark, self.log, df, self._pinned_key, self._pinned_n,
            writer, stats_cols=stats_cols,
        )

    def delete(self, keys_df, writer: str = "delete",
               mode: str = "dv") -> dict:
        """Row-level delete — deletion vectors by default (no base
        rewrites), ``mode='rewrite'`` for the classical path."""
        return acid.delete_keys_spark(
            self.spark, self.log, keys_df, self._pinned_key,
            self._pinned_n, writer, mode=mode,
        )

    def purge(self, keys_df, writer: str = "purge") -> dict:
        """Physical erasure of the keys' bytes (bloom/min-max pruned
        file rewrites) — the compliance half a DV delete skips."""
        return acid.purge_keys_spark(
            self.spark, self.log, keys_df, self._pinned_key,
            self._pinned_n, writer,
        )

    def forget(self, keys_df, writer: str = "forget",
               vacuum_min_age: float = 0.0,
               scrub_quarantine: bool = True) -> dict:
        """Right-to-be-forgotten: purge + expire + truncate + vacuum +
        DLQ scrub; `purge_proof` certifies zero retained bytes."""
        return acid.forget_keys_spark(
            self.spark, self.log, keys_df, self._pinned_key,
            self._pinned_n, writer, vacuum_min_age=vacuum_min_age,
            scrub_quarantine=scrub_quarantine,
        )

    def purge_proof(self, keys_df) -> dict:
        """Auditor's scan: hit counts for the keys over every retained
        parquet/JSON byte under the table root (0/0 after `forget`)."""
        return acid.purge_proof_spark(
            self.spark, self.log, keys_df, self._pinned_key,
        )

    def replace_where(self, predicate: str, df,
                      writer: str = "replace", stats_cols=()) -> dict:
        """Atomic REPLACE WHERE (Delta's replaceWhere): delete every
        row matching ``predicate`` and insert ``df`` in ONE commit —
        the partition-overwrite/backfill primitive
        (`acid.overwrite_where_spark`)."""
        return acid.overwrite_where_spark(
            self.spark, self.log, predicate, df, key=self.key,
            writer=writer, stats_cols=stats_cols)

    def update_where(self, predicate: str, assignments: dict,
                     writer: str = "update", stats_cols=()) -> dict:
        """``UPDATE ... SET ... WHERE ...`` — in-place rewrite of the
        matched rows, one commit, only files with a hit rewritten
        (`acid.update_where_spark`)."""
        return acid.update_where_spark(
            self.spark, self.log, predicate, assignments,
            writer=writer, stats_cols=stats_cols)

    def sync(self, source_df, writer: str = "sync") -> dict:
        """Three-clause MERGE: after it the table equals ``source_df``."""
        return acid.sync_snapshot_spark(
            self.spark, self.log, source_df, self._pinned_key,
            self._pinned_n, writer,
        )

    # -- multi-table transactions (sources/txn.py) -------------------------
    # stage_* prepare invisible participants; pass the staged entries
    # from SEVERAL tables to `distribot_spark.sources.commit_together`
    # to land every version link or none.

    def stage_append(self, df, writer: str = "txn") -> dict:
        """Stage an append participant for an atomic cross-table load."""
        from distribot_spark.sources import txn as _txn

        return _txn.stage_append_spark(
            self.spark, self.log, df, self._pinned_key,
            self._pinned_n, writer)

    def stage_merge(self, updates_df, version_col: str | None = None,
                    writer: str = "txn") -> dict:
        """Stage a keyed-upsert participant (rebase-safe; see
        `txn.stage_merge_spark`)."""
        from distribot_spark.sources import txn as _txn

        return _txn.stage_merge_spark(
            self.spark, self.log, updates_df, self._pinned_key,
            self._pinned_n, writer, version=version_col)

    def stage_delete(self, keys_df, writer: str = "txn") -> dict:
        """Stage a DV-delete participant (pure sidecar attach)."""
        from distribot_spark.sources import txn as _txn

        return _txn.stage_delete_spark(
            self.spark, self.log, keys_df, self._pinned_key,
            self._pinned_n, writer)

    # -- maintenance ------------------------------------------------------

    def optimize(self, sort_col: str | None = None,
                 files_per_bucket: int = 1, stats_cols=(),
                 rewrite_all: bool = False, writer: str = "optimize") -> dict:
        """Bin-pack fragments, cluster on ``sort_col``, compact DVs."""
        return acid.optimize_table_spark(
            self.spark, self.log, self._pinned_key, self._pinned_n,
            writer, sort_col=sort_col,
            files_per_bucket=files_per_bucket,
            stats_cols=stats_cols, rewrite_all=rewrite_all,
        )

    def analyze(self, stats_cols=(), bloom_key: bool = False,
                writer: str = "analyze") -> dict:
        """Backfill manifest stats / key blooms (metadata-only)."""
        return acid.analyze_table(self.log, stats_cols=stats_cols,
                                  bloom_key=bloom_key, writer=writer)

    def restore(self, version: int, writer: str = "restore") -> dict:
        """RESTORE TABLE TO VERSION AS OF: one commit whose post-image
        equals the old snapshot, deletion vectors included."""
        return acid.restore_table(self.log, version, writer=writer)

    def clone(self, dst_path: str, version: int | None = None,
              writer: str = "clone") -> "Table":
        """Shallow clone: zero-copy branch at ``version`` (hardlinked
        files, stats/blooms/rules/id-watermark carried — vacuuming or
        dropping the source can never break the clone)."""
        acid.clone_table(self.log, dst_path, version, writer=writer)
        return type(self).for_path(self.spark, dst_path)

    def replicate_from(self, src: "Table", from_version: int,
                       to_version: int | None = None,
                       writer: str = "replicate") -> dict:
        """Apply the source's CDF range to this replica (net change per
        key: one upsert MERGE + one delete, however many versions)."""
        return acid.replicate_changes_spark(
            self.spark, src.log, self.log, self._pinned_key,
            from_version, to_version, writer=writer,
        )

    def sync_from(self, src: "Table", writer: str = "replicate",
                  max_versions: int | None = None) -> dict:
        """Resumable catch-up: replicate from ``src`` using the cursor
        persisted in this replica's log (bootstrapped by clone)."""
        return acid.replicate_resume_spark(
            self.spark, src.log, self.log, self._pinned_key,
            writer=writer, max_versions=max_versions,
        )

    def export(self, dst_dir: str, version: int | None = None,
               governed: bool = False, role: str | None = None) -> dict:
        """Export a snapshot as a plain parquet directory any engine
        reads with a glob — clean files hardlinked (zero copy), DV'd
        or renamed files materialized (`acid.export_snapshot`). Raw
        export is privileged (policies do not travel);
        ``governed=True`` exports what ``role`` may see instead —
        filtered files never leave, masked values only (secure data
        sharing)."""
        return acid.export_snapshot(self.log, dst_dir, version=version,
                                    governed=governed, role=role,
                                    spark=self.spark)

    def expire_snapshots(self, keep_last: int) -> int:
        return self.log.expire_snapshots(keep_last)

    def vacuum(self, min_age_seconds: float = acid.DEFAULT_VACUUM_MIN_AGE,
               distributed: bool = False, dry_run: bool = False):
        """Reclaim unreferenced data-dir entries. ``distributed=True``
        plans the candidate set as a Spark anti-join over the
        parquet-checkpoint manifest (`manifest.vacuum_spark`) — the
        driver never materializes the referenced set; deletes are
        byte-identical to the driver planner."""
        if distributed or dry_run:
            from distribot_spark.sources.manifest import vacuum_spark

            return vacuum_spark(self.spark, self.log,
                                min_age_seconds=min_age_seconds,
                                dry_run=dry_run)
        return self.log.vacuum(min_age_seconds=min_age_seconds)

    def truncate_log(self):
        return self.log.truncate_log()

    # -- constraints ------------------------------------------------------

    def add_constraint(self, name: str, spec: dict,
                       writer: str = "alter") -> dict:
        """ALTER TABLE ADD CONSTRAINT: validates existing rows
        (fail-mode), then installs the constraint behind a commit-log
        barrier so no in-flight writer can slip an unvalidated row past
        it (`acid.alter_add_constraint_spark`)."""
        return acid.alter_add_constraint_spark(
            self.spark, self.log, name, spec, key=self.key, writer=writer,
        )

    def drop_constraint(self, name: str) -> None:
        """ALTER TABLE DROP CONSTRAINT."""
        acid.alter_drop_constraint(self.log, name)

    def constraints(self) -> dict:
        return self.log.constraints()

    def add_foreign_key(self, name: str, col: str, parent: "Table",
                        on_violation: str = "fail") -> dict:
        """ALTER TABLE ADD FOREIGN KEY (col) REFERENCES parent(merge
        key): validates existing rows, registers the parent
        back-reference, installs behind the ALTER barrier; child writes
        then prove membership, parent deletes prove no live reference
        (RESTRICT), and the cross-log race is fenced at commit
        (`acid.alter_add_foreign_key`)."""
        return acid.alter_add_foreign_key(
            self.spark, self.log, name, col, parent.log.path,
            on_violation=on_violation)

    def drop_foreign_key(self, name: str) -> None:
        """ALTER TABLE DROP FOREIGN KEY (both sides released)."""
        acid.alter_drop_foreign_key(self.log, name)

    def foreign_keys(self) -> dict:
        return self.log.fk_specs()

    def referenced_by(self) -> list:
        return self.log.fk_referenced_by()

    def quarantine(self):
        """Rows diverted by quarantine-mode constraints (dead-letter)."""
        return acid.read_quarantine(self.spark, self.log)

    def reprocess_quarantine(self, constraint: str | None = None,
                             writer: str = "reprocess") -> dict:
        """Replay dead-lettered rows through MERGE under the current
        constraint set (divert → fix rules → replay)."""
        return acid.reprocess_quarantine_spark(
            self.spark, self.log, writer=writer, constraint=constraint,
        )

    def vacuum_quarantine(self, older_than: float) -> int:
        """Age out dead-letter batches (DLQ retention)."""
        return acid.vacuum_quarantine(self.log, older_than)

    # -- column mapping ----------------------------------------------------

    def rename_column(self, old: str, new: str,
                      writer: str = "alter-rename") -> dict:
        """ALTER TABLE RENAME COLUMN — metadata-only (column mapping):
        no data rewritten, in-flight writers restart via the mapping
        rev in the commit gate, table rules follow the rename
        (`acid.alter_rename_column`)."""
        return acid.alter_rename_column(self.log, old, new,
                                        writer=writer)

    def drop_column(self, name: str) -> None:
        """ALTER TABLE DROP COLUMN — metadata-only; the physical name
        stays reserved so old bytes can never resurrect
        (`acid.alter_drop_column`)."""
        acid.alter_drop_column(self.log, name)

    def column_mapping(self) -> dict:
        return self.log.column_mapping()

    # -- access policies (row filters + column masks) -----------------------

    def set_mask(self, col: str, spec: dict) -> None:
        """ALTER COLUMN SET MASK: ``{"fn": "null"|"const"|"hash"|
        "partial"|"bucket", ..., "exempt_roles": [...]}`` — read-side
        metadata, applied by `read`/`read_pandas`/`change_feed` for
        non-exempt roles (`acid.alter_set_mask`)."""
        acid.alter_set_mask(self.log, col, spec)

    def drop_mask(self, col: str) -> None:
        acid.alter_drop_mask(self.log, col)

    def set_row_filter(self, name: str, spec: dict) -> None:
        """SET ROW FILTER: a keep-predicate in the constraint clause
        DSL plus ``exempt_roles``; filters AND together and prune files
        off manifest stats when not_null-qualified
        (`acid.alter_set_row_filter`)."""
        acid.alter_set_row_filter(self.log, name, spec)

    def drop_row_filter(self, name: str) -> None:
        acid.alter_drop_row_filter(self.log, name)

    def policies(self) -> dict:
        return self.log.policies()
