"""Sources & sinks: format readers/writers and layout-aware sinks."""

from distribot_spark.sources.acid import (
    CommitConflict,
    SnapshotExpired,
    TableLog,
    append_pandas,
    append_spark,
    apply_changes_spark,
    clone_table,
    delete_keys_spark,
    forget_keys_spark,
    merge_upsert_pandas,
    merge_upsert_spark,
    optimize_table_spark,
    purge_keys_pandas,
    purge_keys_spark,
    purge_proof_spark,
    purge_tombstones_pandas,
    read_snapshot_spark,
    replicate_changes_spark,
    replicate_resume_spark,
    sync_snapshot_spark,
    table_changes_spark,
    write_initial_spark,
)
from distribot_spark.sources.manifest import (
    live_paths_pruned_manifest,
    live_paths_pruned_point_manifest,
    manifest_df,
)
from distribot_spark.sources.table import Table
from distribot_spark.sources.io import (
    read_any,
    write_any,
    write_bucketed_table,
    write_partitioned,
)

__all__ = [
    "Table",
    "read_any", "write_any", "write_partitioned", "write_bucketed_table",
    "CommitConflict", "SnapshotExpired",
    "TableLog", "append_pandas", "append_spark",
    "apply_changes_spark", "clone_table",
    "delete_keys_spark",
    "forget_keys_spark", "purge_keys_pandas", "purge_keys_spark",
    "purge_proof_spark",
    "merge_upsert_pandas", "merge_upsert_spark",
    "live_paths_pruned_manifest", "live_paths_pruned_point_manifest",
    "manifest_df",
    "optimize_table_spark", "purge_tombstones_pandas", "read_snapshot_spark",
    "replicate_changes_spark", "replicate_resume_spark",
    "sync_snapshot_spark",
    "table_changes_spark", "write_initial_spark",
]
