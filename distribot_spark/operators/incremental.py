"""Incremental aggregate maintenance — partial-agg tables refreshed by
new data only.

The lakehouse pattern behind "continuous aggregates" / materialized-view
refresh: keep the aggregate table in MERGEABLE PARTIAL form (count, sum
— anything associative+commutative), fold each new batch of rows into it
with one small union+re-agg job, and FINALIZE (avg = sum/count, etc.)
only at read time. Refresh cost is O(new batch + touched groups), never
O(history); the corpus is re-scanned zero times.

This is the batch twin of an update-mode streaming aggregate (s9/s14):
same state, but checkpointed as a plain parquet table the caller owns —
restartable, inspectable, and mergeable across pipelines (two partial
tables for disjoint data union into one by the same fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_increment(
    partials: DataFrame | None,
    new_batch: DataFrame,
    keys: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """Fold one batch of raw rows into the partial-agg table.

    `measures` maps measure column -> partial prefix; for measure `m`
    the partial table carries `{p}_cnt` and `{p}_sum` (decimal-exact if
    the caller pre-casts `m`). Returns the refreshed partials: one row
    per group, suitable to overwrite the stored table. Both inputs
    shuffle once on `keys`; at scale, partition the stored table by a
    key prefix (e.g. day) so a refresh only rewrites touched partitions
    (dynamic partition overwrite, see source_merge_upsert)."""
    batch_partials = new_batch.groupBy(*keys).agg(
        *[
            agg
            for m, p in measures.items()
            for agg in (
                F.count(m).alias(f"{p}_cnt"),
                F.sum(m).alias(f"{p}_sum"),
            )
        ]
    )
    if partials is None:
        return batch_partials
    return (
        partials.unionByName(batch_partials)
        .groupBy(*keys)
        .agg(
            *[
                agg
                for _, p in measures.items()
                for agg in (
                    F.sum(f"{p}_cnt").alias(f"{p}_cnt"),
                    F.sum(f"{p}_sum").alias(f"{p}_sum"),
                )
            ]
        )
    )


def finalize(
    partials: DataFrame, keys: list[str], measures: dict[str, str]
) -> DataFrame:
    """Read-time view over the partial table: count, sum, and mean per
    measure (mean = sum/cnt — the division only ever happens here, so
    partials stay losslessly mergeable)."""
    cols = [F.col(k) for k in keys]
    for _, p in measures.items():
        cols += [
            F.col(f"{p}_cnt").alias(f"{p}_cnt"),
            F.col(f"{p}_sum").alias(f"{p}_sum"),
            (F.col(f"{p}_sum") / F.col(f"{p}_cnt")).alias(f"{p}_mean"),
        ]
    return partials.select(*cols)
