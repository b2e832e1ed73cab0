"""Parquet checkpoint manifests: DISTRIBUTED metadata reads for the
ACID log.

The JSON checkpoint (`acid.TableLog._fold_entries`) is the portable
pandas-client fold — but every consumer of it materializes a
driver-side dict of EVERY live file and prunes with a Python loop.
Correct, measured-flat vs COMMIT count, and exactly the wall Delta hit
at large FILE counts: at millions of live files a JSON parse per
snapshot on one machine is the planning bottleneck, which is why Delta
checkpoints are parquet readable as a DataFrame.

This module is that rung, re-expressed for this log:

- the commit winner writes ``v{N:012d}.checkpoint.parquet`` next to the
  JSON checkpoint — ONE ROW PER LIVE FILE (`file`, `pb`, `stats_json`,
  `dvs`) with the identity high-water mark riding in the parquet
  schema metadata, so the full table state is there too;
- `manifest_df` reconstructs the live manifest AT ANY RETAINED VERSION
  as a Spark DataFrame: the checkpoint is a distributed parquet scan,
  and the ≤ CHECKPOINT_EVERY tail commits fold into O(tail)-sized
  driver structures applied as a filter + broadcast join + union —
  the driver never holds a row per live file;
- `live_paths_pruned_manifest` / `live_paths_pruned_point_manifest`
  express FILE SKIPPING as a Spark job over that manifest with the
  same keep/prune semantics as the driver-side
  `TableLog.live_paths_pruned*` (conservative: a file without stats
  for the column is always kept), so the driver receives only the
  KEPT paths — O(result), not O(live files).

The JSON path stays: pandas clients and small tables keep the
driver fold (it is also the bootstrap when a table predates parquet
checkpoints). `tests/test_manifest.py` pins row-for-row equality
between the two paths across tails with removes, same-name re-adds
(the ANALYZE pattern) and DV appends; the IO-shape test pins that
manifest construction reads ≤ CHECKPOINT_EVERY commit files; and
`scaling.py --manifest` records the driver-cost curve vs file count
where the JSON fold grows linearly.

Reference parity: distribot externalizes ALL shared state so no single
process must hold it (flow.rb:31-52); a driver-side dict of every live
file is exactly such a process, and this module removes it from the
planning path.
"""

from __future__ import annotations

import json
import os

import pandas as pd  # module-level: pandas_udf type hints resolve here

from .acid import CHECKPOINT_EVERY, TableLog, bloom_maybe_contains
from distribot_spark.session import local_rows_df

# One manifest row per live file. The RANGE-prunable min/max travel as
# TYPED map columns (`mins`/`maxs`, canonical-string values) so the
# range planner is a map lookup + cast, never a per-row JSON parse;
# `blooms` carries each bloomed column's sparse filter as its own
# compact JSON (the point planner parses ONLY that, not the whole
# stats dict); `stats_json` keeps the full-fidelity dict (what the
# JSON checkpoint stores) for audit and forward-compat. This is the
# Delta evolution in miniature: stats-as-JSON first, then parsed
# checkpoint stats columns once JSON parse per row became the
# planning bottleneck.
_SPARK_SCHEMA = (
    "file string, pb long, stats_json string, dvs array<string>, "
    "mins map<string,string>, maxs map<string,string>, "
    "blooms map<string,string>"
)

# Rows per checkpoint part file: a MULTI-PART checkpoint directory is
# what gives the manifest scan task parallelism (one ~15 MB parquet
# file would be a single Spark split; Delta's multi-part checkpoints
# exist for exactly this).
CHECKPOINT_PART_ROWS = 131_072

_BLOOM_PREFIX = "_bloom:"


def checkpoint_parquet_path(table: TableLog, v: int) -> str:
    return os.path.join(table.log_dir, f"v{v:012d}.checkpoint.parquet")


def _split_stats(st: dict | None):
    """(stats_json, mins, maxs, blooms) for one file's stats dict —
    canonical string values; numbers via repr (round-trips, casts back
    exactly), strings as-is (ISO dates order lexicographically)."""
    if not st:
        return None, None, None, None
    mins: dict[str, str] = {}
    maxs: dict[str, str] = {}
    blooms: dict[str, str] = {}
    for c, s in st.items():
        if c.startswith(_BLOOM_PREFIX):
            blooms[c[len(_BLOOM_PREFIX):]] = json.dumps(
                s, sort_keys=True, separators=(",", ":"))
        elif isinstance(s, dict) and "min" in s and "max" in s:
            mins[c] = s["min"] if isinstance(s["min"], str) \
                else repr(s["min"])
            maxs[c] = s["max"] if isinstance(s["max"], str) \
                else repr(s["max"])
    return (
        json.dumps(st, sort_keys=True),
        mins or None,
        maxs or None,
        blooms or None,
    )


def write_checkpoint_parquet(
    table: TableLog,
    v: int,
    live: dict[str, int],
    stats: dict[str, dict],
    dvs: dict[str, list[str]],
    id_hwm: int,
) -> str:
    """Write the parquet twin of the JSON checkpoint at ``v`` (called
    by the commit winner with the dicts it already folded) as a
    MULTI-PART directory — `CHECKPOINT_PART_ROWS` rows per part so the
    manifest scan parallelizes. Atomic via tmp-dir-then-rename like
    every other log artifact. The id high-water mark rides in each
    part's parquet schema metadata so identity writers can read it
    without scanning rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(live)
    path = checkpoint_parquet_path(table, v)
    tmp = path + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    meta = {b"version": str(int(v)).encode(),
            b"id_hwm": str(int(id_hwm)).encode()}
    chunks = [files[i:i + CHECKPOINT_PART_ROWS]
              for i in range(0, len(files), CHECKPOINT_PART_ROWS)] or [[]]
    for part, chunk in enumerate(chunks):
        split = [_split_stats(stats.get(f)) for f in chunk]
        tbl = pa.table(
            {
                "file": pa.array(chunk, pa.string()),
                "pb": pa.array([int(live[f]) for f in chunk],
                               pa.int64()),
                "stats_json": pa.array([s[0] for s in split],
                                       pa.string()),
                "dvs": pa.array(
                    [list(dvs.get(f) or []) for f in chunk],
                    pa.list_(pa.string()),
                ),
                "mins": pa.array([s[1] for s in split],
                                 pa.map_(pa.string(), pa.string())),
                "maxs": pa.array([s[2] for s in split],
                                 pa.map_(pa.string(), pa.string())),
                "blooms": pa.array([s[3] for s in split],
                                   pa.map_(pa.string(), pa.string())),
            }
        ).replace_schema_metadata(meta)
        pq.write_table(
            tbl, os.path.join(tmp, f"part-{part:05d}.parquet"))
    if os.path.isdir(path):  # crash leftover from a racing winner
        import shutil as _sh

        _sh.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    return path


def checkpoint_id_hwm(table: TableLog, v: int) -> int:
    """Identity high-water mark from the parquet checkpoint FOOTER at
    ``v`` — a metadata read, no rows scanned."""
    import pyarrow.parquet as pq

    root = checkpoint_parquet_path(table, v)
    part = os.path.join(root, sorted(os.listdir(root))[0])
    meta = pq.read_schema(part).metadata
    return int((meta or {}).get(b"id_hwm", b"0"))


def newest_checkpoint_parquet(table: TableLog, v: int) -> int:
    """Newest parquet checkpoint version ≤ ``v``, or 0 when none
    exists (pre-feature table, or v below the first checkpoint)."""
    c = (v // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
    while c > 0:
        if os.path.exists(checkpoint_parquet_path(table, c)):
            return c
        c -= CHECKPOINT_EVERY
    return 0


def _tail_fold(table: TableLog, start: int, v: int):
    """Fold commits ``start..v`` into O(tail)-sized structures — the
    ONLY driver-side state manifest reconstruction needs:

    - ``dead``: checkpoint-era files removed in the tail (and not
      re-added after);
    - ``upserts``: {file -> (pb, stats, dv list)} for files ADDED in
      the tail (covers the remove+re-add-same-name ANALYZE pattern:
      the re-add's fresh stats win and its DV list restarts, exactly
      the `_fold_entries` order);
    - ``dv_appends``: {checkpoint-era file -> extra DV sidecars} in
      commit order. A DV naming a file that is neither live in the
      checkpoint nor added in the tail matches no manifest row and is
      thereby ignored — the same lost-race semantics as the JSON fold.
    """
    dead: set[str] = set()
    upserts: dict[str, tuple[int, dict | None, list[str]]] = {}
    dv_appends: dict[str, list[str]] = {}
    for i in range(start, v + 1):
        c = table.read_commit(i)
        for f in c["removes"]:
            if f in upserts:
                del upserts[f]
            else:
                dead.add(f)
                dv_appends.pop(f, None)
        for a in c["adds"]:
            f = a["file"]
            upserts[f] = (int(a["pb"]), a.get("stats") or None, [])
            dead.discard(f)
            dv_appends.pop(f, None)
        for f, d in (c.get("dvs") or {}).items():
            if f in upserts:
                upserts[f][2].append(d)
            elif f not in dead:
                dv_appends.setdefault(f, []).append(d)
    return dead, upserts, dv_appends


def manifest_df(spark, table: TableLog, version: int | None = None):
    """The live manifest at ``version`` (head if None) as a Spark
    DataFrame ``(file, pb, stats_json, dvs, path)`` — the distributed
    twin of `TableLog._fold_entries`, row-for-row equal (pinned by
    tests/test_manifest.py).

    Plan shape: parquet scan of the newest checkpoint ≤ v, minus the
    tail's removed/re-added files (an `isin` against an O(tail) list),
    plus tail DV appends (broadcast join on an O(tail) frame), plus
    tail adds (union of an O(tail) local frame). Nothing driver-side
    is proportional to the live file count.

    Bootstrap: a table with no parquet checkpoint at or below ``v``
    (fewer than CHECKPOINT_EVERY commits, or created before this
    format) falls back to the driver fold — small by construction in
    the first case, the documented migration cost in the second (the
    next checkpoint writes parquet)."""
    from pyspark.sql import functions as F

    head = table.version()
    v = head if version is None else version
    if not 0 <= v <= head:
        raise ValueError(f"version {v} outside [0, {head}]")
    table._check_not_expired(v)

    ckpt = newest_checkpoint_parquet(table, v)
    if ckpt <= 0:
        live, stats, dvs, _ = table._fold_entries(v)
        rows = []
        for f, b in sorted(live.items()):
            sj, mn, mx, bl = _split_stats(stats.get(f))
            rows.append((f, int(b), sj, list(dvs.get(f) or []),
                         mn, mx, bl))
        df = local_rows_df(spark, rows, _SPARK_SCHEMA)
        return df.withColumn(
            "path", F.concat(F.lit(table.data_dir + os.sep), F.col("file"))
        )

    df = spark.read.parquet(checkpoint_parquet_path(table, ckpt))
    dead, upserts, dv_appends = _tail_fold(table, ckpt + 1, v)

    gone = sorted(dead | set(upserts))
    if gone:
        df = df.filter(~F.col("file").isin(gone))
    if dv_appends:
        extra = local_rows_df(spark, 
            [(f, list(ds)) for f, ds in sorted(dv_appends.items())],
            "file string, _extra_dvs array<string>",
        )
        df = (
            df.join(F.broadcast(extra), "file", "left")
            .withColumn(
                "dvs",
                F.concat(
                    F.coalesce(F.col("dvs"),
                               F.array().cast("array<string>")),
                    F.coalesce(F.col("_extra_dvs"),
                               F.array().cast("array<string>")),
                ),
            )
            .drop("_extra_dvs")
        )
    if upserts:
        rows = []
        for f, (pb, st, dl) in sorted(upserts.items()):
            sj, mn, mx, bl = _split_stats(st)
            rows.append((f, pb, sj, list(dl), mn, mx, bl))
        added = local_rows_df(spark, rows, _SPARK_SCHEMA)
        df = df.select(
            "file", "pb", "stats_json", "dvs", "mins", "maxs", "blooms"
        ).unionByName(added)
    return df.withColumn(
        "path", F.concat(F.lit(table.data_dir + os.sep), F.col("file"))
    )


def live_paths_pruned_manifest(
    spark, table: TableLog, col: str, lo, hi,
    version: int | None = None,
) -> tuple[list[str], int]:
    """RANGE file skipping as a Spark job over the manifest — same
    results as the driver-side `TableLog.live_paths_pruned` (pinned):
    keep a file unless its recorded [min, max] for ``col`` misses
    [lo, hi]; a file without stats for the column is always kept.

    Comparison typing mirrors the JSON fold: string bounds compare
    lexicographically (dates/timestamps travel as ISO strings), numeric
    bounds compare as doubles (manifest stats are JSON scalars; int64
    keys beyond 2^53 would need a decimal cast — the demo's key domains
    are far below it). The lookup is `element_at` on the typed
    `mins`/`maxs` map columns — a columnar map probe, NOT a per-row
    JSON parse (stats_json also carries the blooms, so parsing it per
    row per query is exactly the linear cost this module removes; the
    scaling.py --manifest curve is measured on this path). Only the
    KEPT paths and a scalar count reach the driver."""
    from pyspark.sql import functions as F

    m = manifest_df(spark, table, version)
    smin = F.element_at(F.col("mins"), F.lit(col))
    smax = F.element_at(F.col("maxs"), F.lit(col))
    if isinstance(lo, str):
        lo_c, hi_c = F.lit(lo), F.lit(hi)
    else:
        smin, smax = smin.cast("double"), smax.cast("double")
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    keep = smin.isNull() | ~((smax < lo_c) | (smin > hi_c))
    agg = m.agg(
        F.sort_array(
            F.collect_list(F.when(keep, F.col("path")))
        ).alias("kept"),
        F.sum(F.when(~keep, 1).otherwise(0)).alias("pruned"),
    ).collect()[0]
    return list(agg["kept"]), int(agg["pruned"] or 0)


def live_paths_pruned_point_manifest(
    spark, table: TableLog, col: str, value,
    version: int | None = None,
) -> tuple[list[str], int]:
    """POINT-LOOKUP (bloom) file skipping as a Spark job over the
    manifest — same results as the driver-side
    `TableLog.live_paths_pruned_point` (pinned): keep a file unless
    its bloom for ``col`` excludes ``value``; files without a bloom
    are always kept. The bloom test runs executor-side in an
    Arrow-batched pandas UDF reusing the SAME `bloom_maybe_contains`
    the driver path uses, so the two can never disagree — and it
    parses ONLY the `blooms` map entry for ``col``, never the whole
    stats dict (which this column family exists to avoid)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    val = int(value)

    @pandas_udf("boolean")
    def _keep(bloom_json: pd.Series) -> pd.Series:
        out = []
        for s in bloom_json:
            out.append(True if s is None
                       else bloom_maybe_contains(json.loads(s), val))
        return pd.Series(out)

    m = manifest_df(spark, table, version).withColumn(
        "_keep", _keep(F.element_at(F.col("blooms"), F.lit(col)))
    )
    agg = m.agg(
        F.sort_array(
            F.collect_list(F.when(F.col("_keep"), F.col("path")))
        ).alias("kept"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias("pruned"),
    ).collect()[0]
    return list(agg["kept"]), int(agg["pruned"] or 0)


def purge_candidates_manifest(
    spark, table: TableLog, key: str, key_vals, buckets,
    version: int | None = None,
) -> tuple[list[dict], int]:
    """PURGE PLANNING as a Spark job over the manifest: among the
    keys' buckets, the files whose recorded [min, max] / bloom may
    hold ANY of the keys. Returns ``(candidate rows, pruned count)``
    where each candidate row is ``{"file", "pb", "dvs", "stats"}`` —
    only O(candidates) rows ever reach the driver, never the live
    file count (the same wall `live_paths_pruned*_manifest` removes
    for reads, removed here for the compliance write path; row-for-row
    equality with the driver fold is pinned by
    tests/test_manifest.py). Conservative exactly like the driver
    path: a file with no stats / no bloom for the key is a candidate.
    The per-file test runs executor-side in an Arrow-batched pandas
    UDF reusing the SAME `bloom_maybe_contains` as everywhere else."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    kv = [int(k) for k in key_vals]

    @pandas_udf("boolean")
    def _maybe(mn: pd.Series, mx: pd.Series, bl: pd.Series) -> pd.Series:
        out = []
        for a, b, s in zip(mn, mx, bl):
            lo = float(a) if a is not None else None
            hi = float(b) if b is not None else None
            bloom = json.loads(s) if s is not None else None
            keep = False
            for k in kv:
                if lo is not None and not (lo <= k <= hi):
                    continue
                if bloom is not None and not bloom_maybe_contains(
                        bloom, k):
                    continue
                keep = True
                break
            out.append(keep)
        return pd.Series(out)

    m = (
        manifest_df(spark, table, version)
        .filter(F.col("pb").isin(sorted(int(b) for b in buckets)))
        .withColumn("_keep", _maybe(
            F.element_at(F.col("mins"), F.lit(key)),
            F.element_at(F.col("maxs"), F.lit(key)),
            F.element_at(F.col("blooms"), F.lit(key)),
        ))
    )
    agg = m.agg(
        F.sort_array(F.collect_list(F.when(
            F.col("_keep"),
            F.struct("file", "pb", "dvs", "stats_json"),
        ))).alias("cand"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias("pruned"),
    ).collect()[0]
    cand = [
        {"file": r["file"], "pb": int(r["pb"]),
         "dvs": list(r["dvs"] or []),
         "stats": json.loads(r["stats_json"]) if r["stats_json"] else {}}
        for r in agg["cand"]
    ]
    return cand, int(agg["pruned"] or 0)


def referenced_files_df(spark, table: TableLog):
    """Every data-dir name some RETAINED snapshot (version >= the
    retention floor) references, as a one-column DataFrame ``(file)``
    — the distributed twin of `TableLog.referenced_files`, which
    materializes that set as a driver-side Python set (O(live files)
    on one machine: the same wall `manifest_df` removed from snapshot
    planning, now removed from VACUUM planning).

    Derivation (provably equal to the driver fold): a name is
    referenced iff it is live at the FLOOR version — the manifest at
    ``floor`` as a distributed parquet scan, data files plus their
    attached DV sidecars — or was ADDED by a commit after it (added at
    version i > floor means live at i, a retained version), or is a DV
    sidecar attached after it to a then-live file (attachment at i >
    floor references it at i, whatever happens later). The tail walk
    collects O(tail-commit entries) NAMES on the driver — proportional
    to the work done since the floor, never to the table. A pending
    multi-table txn's staged files (referenced by its marker, not yet
    by any commit) ride along exactly as in the driver fold.
    Row-for-row equality with `TableLog.referenced_files` is pinned by
    tests/test_vacuum_spark.py across expiry/OPTIMIZE/RESTORE/DV
    workloads."""
    from pyspark.sql import functions as F

    head = table.version()
    floor = table.expired_before()
    extra: set[str] = set(table._txn_shielded_files())
    if head < 0:
        return local_rows_df(spark, 
            [(x,) for x in sorted(extra)], "file string")
    m = manifest_df(spark, table, version=floor)
    base = m.select("file").unionByName(
        m.select(F.explode("dvs").alias("file")))
    removed_now: set[str] = set()
    for i in range(floor + 1, head + 1):
        c = table.read_commit(i)
        for f in c["removes"]:
            removed_now.add(f)
        for a in c["adds"]:
            extra.add(a["file"])
            removed_now.discard(a["file"])
        for f, d in (c.get("dvs") or {}).items():
            # the fold's `if f in live` guard: an attachment names a
            # file live at attach time — skip only one removed earlier
            # in the tail and not re-added (defensive; no writer
            # produces such a commit)
            if f not in removed_now:
                extra.update([d] if isinstance(d, str) else list(d))
    if extra:
        base = base.unionByName(local_rows_df(spark, 
            [(x,) for x in sorted(extra)], "file string"))
    return base.distinct()


def vacuum_spark(
    spark,
    table: TableLog,
    min_age_seconds: float | None = None,
    dry_run: bool = False,
) -> list[str]:
    """VACUUM with DISTRIBUTED planning: the candidate set (data-dir
    entries no retained snapshot references) is computed as a Spark
    anti-join of the directory listing against `referenced_files_df`,
    so the driver never materializes the referenced set — the planning
    bottleneck `TableLog.vacuum` hits at millions of live files, and
    the reason Delta's VACUUM lists and diffs with a Spark job. Only
    the CANDIDATES (crash debris + expired files — O(reclaimable),
    never O(table)) return to the driver, where the shared
    `TableLog._reclaim` applies the min-age rail and unlinks, so both
    vacuums delete byte-identically (pinned equal by
    tests/test_vacuum_spark.py).

    The listing itself is one driver ``os.listdir`` here (posix
    backend); an object-store backend would page its LIST results
    straight into the same one-column frame — the anti-join and
    everything after it are already shaped for that.

    ``dry_run=True`` returns the would-remove names (post min-age)
    without deleting. Same retention + min-age rails and the same
    pending-txn shield as `TableLog.vacuum`."""
    if min_age_seconds is None:
        from .acid import DEFAULT_VACUUM_MIN_AGE

        min_age_seconds = DEFAULT_VACUUM_MIN_AGE
    names = sorted(os.listdir(table.data_dir))
    if not names:
        return []
    listing = local_rows_df(spark, [(n,) for n in names], "file string")
    cand = [
        r["file"]
        for r in listing.join(
            referenced_files_df(spark, table), "file", "left_anti"
        ).collect()
    ]
    return table._reclaim(cand, min_age_seconds, dry_run=dry_run)


def bucket_files_manifest(spark, table: TableLog, buckets):
    """WRITER-planning state for a bucket-scoped write: ``(head
    version, {file: bucket} of exactly the given buckets, {file: [dv
    sidecars]})`` — the distributed twin of the ``snapshot()`` +
    filter-to-touched planning in `acid.merge_upsert_spark` and
    friends. The driver fold materializes a dict of EVERY live file
    per commit attempt; this runs the manifest scan as a Spark job
    with the bucket filter pushed down, so the driver receives
    O(touched-bucket files) — a merge's planning cost stops growing
    with the table. Same txn-marker resolution as ``snapshot()`` (a
    decided-but-unrolled multi-table txn is rolled forward before the
    version is read), so the state is never stale by a marker."""
    from pyspark.sql import functions as F

    table._resolve_txn_for_read()
    v = table.version()
    if v < 0:
        return v, {}, {}
    rows = (
        manifest_df(spark, table, version=v)
        .filter(F.col("pb").isin(sorted(int(b) for b in buckets)))
        .select("file", "pb", "dvs")
        .collect()
    )
    live = {r["file"]: int(r["pb"]) for r in rows}
    dvs = {r["file"]: list(r["dvs"]) for r in rows if r["dvs"]}
    return v, live, dvs
