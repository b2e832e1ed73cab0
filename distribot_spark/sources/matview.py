"""INCREMENTAL MATERIALIZED VIEWS over governed tables.

An aggregate view (``GROUP BY g1.. : count/sum/avg/min/max``, optional
row filter) materialized AS its own ACID table and maintained from the
base table's CHANGE DATA FEED — the classic incremental-view-maintenance
(IVM) contract: a refresh folds only the rows the missed commits
touched, never re-aggregating the base. At 100 TB this is the difference
between a refresh that costs O(delta) and one that costs O(table); the
view table itself stays O(groups).

Reference intent: distribot's announce/counter tables
(``lib/distribot/flow.rb`` transition counters) are tiny hand-maintained
materializations of event streams; this module is the analytics-engine
generalization — declare the aggregation once, the engine keeps it
consistent with the table under appends, MERGEs and deletes.

Design (all deltas exact, so refresh ≡ full recompute bit-for-bit):

- **Self-maintaining aggregates** fold pre/post change rows with a ±1
  sign: ``count(*)`` adds the signed row count; ``sum``/``avg`` carry
  two riders per agg — an exact DECIMAL(38, s) running sum and a
  non-null contribution count (so SQL's ``SUM of no rows → NULL`` and
  ``AVG = sum/nn`` semantics survive deletes). Float/double sum columns
  are REJECTED: an incremental float sum is order-dependent and would
  drift from a recompute; quantize upstream (the repo-wide int64/decimal
  discipline).
- **min/max under deletes** are not self-maintaining: a group that
  loses rows (any pre-image row) is marked DIRTY and its min/max
  recomputed from the base AS OF the refresh's end version — bounded by
  the dirty groups' rows, and deterministic because time travel pins
  the scan. Insert-only groups fold ``least``/``greatest`` with no
  recompute. A spec with no min/max never scans the base at all.
- **Bounded min/max RIDER** (``spec["rider_k"] = K``): each min/max
  agg additionally stores the K smallest (min) / largest (max) live
  values as a sorted array plus the live non-null count. The rider is
  always an exact PREFIX of the group's sorted live values, so the
  extremum stays exact under deletes as long as the rider is nonempty
  — deletes remove tracked occurrences, inserts are admitted only when
  provably inside the prefix (everything, when the rider covers the
  whole group; only values at or inside the tracked boundary once it
  has been truncated). A group goes DIRTY only when its rider EMPTIES
  while rows remain (K extremum evictions without a covering insert),
  which is what lets STREAMING min/max views run WITHOUT a base handle
  until the rider depth is genuinely exhausted — then the base-pinned
  dirty recompute (which also refills riders) or, with no base, a loud
  refusal. Rider equality is by SQL ``=`` on the stored value: use
  exact types (int/decimal/string/date/timestamp); raw doubles with
  NaNs would leave ghost entries (the repo-wide quantization rule
  already forbids float aggregation columns anyway).
- **Incremental TOP-K aggregates** (``{"fn": "bottomk"|"topk",
  "col": c, "k": n}``, requires ``rider_k >= n``): the rider prefix
  itself IS the aggregate — per group, the n smallest/largest values,
  sorted. Same fold; stricter deficiency (the exposed prefix must stay
  complete to depth n, where min/max only need it nonempty). The
  leaderboard contract at O(delta) maintenance and O(groups × K)
  storage.
- **Group death is a TOMBSTONE** (``_mv_cnt = 0``), not a delete, so a
  refresh is exactly ONE view commit (a keyed MERGE) — which is what
  makes the crash protocol below airtight. `read_matview` filters
  tombstones; `purge_matview_tombstones` reclaims them whenever.
- **Cursor + crash safety**: the last folded base version persists in
  ``_matview.json`` (the replication-cursor pattern,
  ``acid.replicate_resume_spark``). Deltas are NOT idempotent (folding
  a sum twice double-counts), so unlike replication the apply must be
  exactly-once: before merging, the refresh records a PENDING marker
  carrying a unique commit token; the merge commit stamps that token as
  its writer. Recovery scans the view log for the token — found means
  the apply landed (promote the cursor), absent means it didn't
  (re-apply). The view being a single-writer OCC table makes the scan
  range exact.

Scale notes: the CDF fold reads only commit-touched files (see
`table_changes_spark`); the delta groupBy is a partial-agg'd shuffle of
delta rows; the view join/merge touches only the delta's buckets. The
dirty-group min/max recompute is the one base scan — a broadcast
semi-join on the group key; cluster the base by the group column
(ZORDER / generated column + manifest stats) to turn it into a
file-skipping scan.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid

from distribot_spark.sources.acid import (
    TableLog,
    delete_keys_spark,
    merge_upsert_spark,
    read_snapshot_spark,
    table_changes_spark,
    write_initial_spark,
)

_SEP = "\x1f"
_NULL = "\x00N"
_FNS = ("count", "sum", "avg", "min", "max", "bottomk", "topk")
#: fns whose state is a bounded sorted-prefix rider. ``bottomk``/
#: ``topk`` EXPOSE the prefix itself as the aggregate value (the k
#: smallest / largest values per group, sorted — the incremental
#: top-k view a leaderboard/dashboard needs): same fold, stricter
#: deficiency (the exposed prefix must stay complete to depth k, not
#: merely nonempty).
_RIDER_FNS = ("min", "max", "bottomk", "topk")


def _rider_asc(fn: str) -> bool:
    """Rider sort direction: smallest-first for min/bottomk."""
    return fn in ("min", "bottomk")


def _validate_spec(spec: dict) -> None:
    if not spec.get("group_by"):
        raise ValueError("matview spec needs at least one group_by column")
    if not spec.get("aggs"):
        raise ValueError("matview spec needs at least one aggregate")
    rk = spec.get("rider_k")
    if rk is not None and (not isinstance(rk, int) or rk < 1):
        raise ValueError(f"rider_k must be a positive int, got {rk!r}")
    for alias, a in spec["aggs"].items():
        if a["fn"] not in _FNS:
            raise ValueError(f"unsupported agg fn {a['fn']!r} for {alias!r}")
        if a["fn"] != "count" and not a.get("col"):
            raise ValueError(f"agg {alias!r} ({a['fn']}) needs a col")
        if alias.startswith("_mv_"):
            raise ValueError(f"agg alias {alias!r} collides with riders")
        if a["fn"] in ("bottomk", "topk"):
            k = a.get("k")
            if not isinstance(k, int) or k < 1:
                raise ValueError(
                    f"agg {alias!r} ({a['fn']}) needs a positive int k")
            if not rk or rk < k:
                raise ValueError(
                    f"agg {alias!r} ({a['fn']}, k={k}) needs spec "
                    f"rider_k >= k (the rider IS its storage); got "
                    f"rider_k={rk!r}")


def _rider_k(spec: dict) -> int:
    """Rider depth (0 = riders off, the pre-rider behavior verbatim)."""
    return int(spec.get("rider_k") or 0)


def _rider_aggs(spec: dict) -> dict:
    """The aggs that carry a bounded rider under this spec (min/max
    when rider_k is set; bottomk/topk always — validation forces
    rider_k for them)."""
    if not _rider_k(spec):
        return {}
    return {alias: a for alias, a in spec["aggs"].items()
            if a["fn"] in _RIDER_FNS}


def _sum_scale(df, col: str) -> int:
    """Decimal scale for the exact running sum of ``col`` — integral
    types scale 0, decimals their own scale; float/double rejected
    (order-dependent sums can't match a recompute)."""
    from pyspark.sql import types as T

    f = df.schema[col].dataType
    if isinstance(f, T.DecimalType):
        return f.scale
    if isinstance(f, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return 0
    raise ValueError(
        f"sum/avg over {col} ({f.simpleString()}): incremental float "
        "sums are order-dependent; quantize to decimal/int upstream")


def _mv_key_col(group_by: list[str]):
    """The view's merge key: xxhash64 of the group tuple (NULLs and
    separators disambiguated). A LONG because the table layer's bucket
    function contracts integral merge keys (`_bucket_of_py`). A 64-bit
    collision would silently merge two groups, so every path that
    could surface one GUARDS loudly instead: `create_matview` and the
    delta fold reject duplicate keys across distinct group tuples
    (`_check_key_collisions`), and `_apply_delta` cross-checks the
    joined old row's group columns against the delta's."""
    from pyspark.sql import functions as F

    return F.xxhash64(F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
                for c in group_by])).alias("_mv_key")


def _check_key_collisions(df, what: str) -> None:
    """Fail loudly if two distinct group tuples hashed to one key —
    df must carry one row per group with its ``_mv_key``."""
    from pyspark.sql import functions as F

    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.countDistinct("_mv_key").alias("d")).collect()[0]
    if int(r["n"]) != int(r["d"]):
        raise RuntimeError(
            f"matview group-key hash collision in {what}: "
            f"{int(r['n']) - int(r['d'])} duplicate key(s) — "
            "re-shape the group_by (astronomically rare)")


def _filtered(df, spec):
    flt = spec.get("filter")
    from pyspark.sql import functions as F

    return df.filter(F.expr(flt)) if flt else df


def _full_state(df, spec, scales: dict[str, int]):
    """The stored view rows computed from scratch over ``df`` — the
    shape create_matview writes and every refresh must stay bit-equal
    to (pinned by tests against the incremental path)."""
    from pyspark.sql import functions as F

    g = spec["group_by"]
    rows = _filtered(df, spec)
    k = _rider_k(spec)
    riders = _rider_aggs(spec)
    if riders:
        # per-group top-K via row_number, NOT collect_list-then-slice:
        # a window sort spills, an unbounded per-group list OOMs on a
        # 100 TB group. One window pass per rider agg.
        from pyspark.sql.window import Window

        for alias, a in riders.items():
            order = (F.col(a["col"]).asc_nulls_last()
                     if _rider_asc(a["fn"])
                     else F.col(a["col"]).desc_nulls_last())
            rows = rows.withColumn(
                f"_rkn_{alias}",
                F.row_number().over(Window.partitionBy(*g).orderBy(order)))
    aggs = [F.count(F.lit(1)).alias("_mv_cnt")]
    for alias, a in spec["aggs"].items():
        fn, col = a["fn"], a.get("col")
        if fn in ("sum", "avg"):
            s = scales[alias]
            aggs.append(F.sum(F.col(col).cast(f"decimal(38,{s})"))
                        .cast(f"decimal(38,{s})").alias(f"_mv_s_{alias}"))
            aggs.append(F.count(F.col(col)).alias(f"_mv_n_{alias}"))
        elif fn == "min":
            aggs.append(F.min(col).alias(f"_mv_min_{alias}"))
        elif fn == "max":
            aggs.append(F.max(col).alias(f"_mv_max_{alias}"))
        if alias in riders:
            aggs.append(F.sort_array(
                F.collect_list(F.when((F.col(f"_rkn_{alias}") <= k)
                                      & F.col(col).isNotNull(),
                                      F.col(col))),
                asc=_rider_asc(fn)).alias(f"_mv_rk_{alias}"))
            aggs.append(F.count(F.col(col)).alias(f"_mv_nn_{alias}"))
    return rows.groupBy(*g).agg(*aggs).select(_mv_key_col(g), "*")


class MatviewRefreshBusy(RuntimeError):
    """Another refresh/apply on this view is in flight (its claim is
    younger than the lease window). Deltas are NOT idempotent, so two
    overlapping folds of the same change range would silently
    double-count every touched group — refuse loudly instead."""


#: How long a refresh claim vouches for a live holder. A holder that
#: overruns this is presumed crashed and its claim is stolen — size it
#: above the slowest expected refresh (cron overlap is the threat
#: model, not sub-second races).
DEFAULT_REFRESH_LEASE = 600.0


def _claim_path(view: TableLog) -> str:
    return os.path.join(view.log_dir, "_matview.refresh.lock")


@contextlib.contextmanager
def _refresh_claim(view: TableLog, writer: str,
                   lease_sec: float = DEFAULT_REFRESH_LEASE):
    """Single-writer guard for the view-maintenance fold, built on the
    storage seam's ``GenerationLock`` (``put_if_absent`` generations,
    body-``ts`` lease, body-content steal fence) so it holds on a
    conditional-put-only object store — the old O_EXCL +
    ``os.replace``-to-unique steal needed atomic rename, which object
    stores lack. A claim younger than ``lease_sec`` means a refresh is
    IN FLIGHT → `MatviewRefreshBusy` (deltas are not idempotent; two
    overlapping folds of one change range would double-count); older
    means the holder crashed — the stealer CREATES the next generation
    (one winner) and its half-done apply resolves through the
    pending-token recovery, which must therefore run INSIDE the
    claim."""
    from distribot_spark.sources.storage import GenerationLock, LockBusy

    lock = GenerationLock(view.storage, _claim_path(view), lease_sec)
    try:
        held = lock.acquire(block=False, body_extra={"writer": writer},
                            desc="matview refresh claim")
    except LockBusy as e:
        raise MatviewRefreshBusy(
            f"matview refresh already in flight on {view.path} "
            f"(claim age {e.age:.1f}s < lease {lease_sec:.0f}s); "
            "overlapping folds double-count — serialize refreshes or "
            "raise lease_sec if the holder is known dead") from None
    try:
        yield
    finally:
        # owner-pathed: if we overran the lease, a thief holds a NEWER
        # generation — releasing ours never touches it
        lock.release(held)


def _state_path(view: TableLog) -> str:
    return os.path.join(view.log_dir, "_matview.json")


def _load_state(view: TableLog) -> dict:
    with open(_state_path(view)) as fh:
        return json.load(fh)


def _write_state(view: TableLog, state: dict) -> None:
    tmp = _state_path(view) + f".tmp{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, _state_path(view))


def create_matview(spark, base: TableLog, view: TableLog, spec: dict,
                   n_buckets: int = 8, writer: str = "matview") -> dict:
    """Materialize ``spec`` over the base table's CURRENT snapshot and
    pin the cursor at that version; `refresh_matview` folds everything
    after it. The full compute is the only table-sized job the view
    ever runs."""
    _validate_spec(spec)
    v0 = base.version()
    # PIN the snapshot to v0: a base commit landing between version()
    # and the read would otherwise be baked into the view AND re-folded
    # by the first refresh (double count)
    df = read_snapshot_spark(spark, base, version=v0)
    scales = {a: _sum_scale(df, s["col"]) for a, s in spec["aggs"].items()
              if s["fn"] in ("sum", "avg")}
    full = _full_state(df, spec, scales)
    _check_key_collisions(full, "create_matview")
    write_initial_spark(spark, view, full, "_mv_key",
                        n_buckets=n_buckets, writer=writer)
    _write_state(view, {"spec": spec, "scales": scales,
                        "base_path": base.path, "last_applied": v0})
    return {"base_version": v0, "groups": None}


def _recover_pending(view: TableLog, state: dict) -> dict:
    """Resolve an interrupted apply: the pending marker's token is the
    would-be merge commit's writer string — present in the log means
    the apply LANDED (promote the marker's ``on_landed`` state patch:
    the version cursor for a refresh, the batch high-water mark for a
    streaming apply), absent means it didn't (the delta replays).
    Either way the marker clears, so an apply never runs with one
    outstanding."""
    p = state.pop("pending", None)
    if p is None:
        return state
    head = view.version()
    for v in range(int(p["view_version_before"]) + 1, head + 1):
        if view.read_commit(v).get("writer") == p["token"]:
            state.update(p["on_landed"])
            break
    _write_state(view, state)
    return state


def matview_delta(spark, spec: dict, scales: dict, changes_df):
    """Per-group signed fold of one change-feed batch: +1 for
    insert/update_post rows, -1 for delete/update_pre — the exact
    algebra that makes count/sum/avg self-maintaining. Also carries the
    insert-side min/max candidates and the ``_mv_dirty`` flag (any
    pre-image row) the min/max recompute keys off."""
    from pyspark.sql import functions as F

    g = spec["group_by"]
    ch = _filtered(changes_df, spec)
    k = _rider_k(spec)
    riders = _rider_aggs(spec)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    rows = ch.withColumn("_sg", sign)
    aggs = [F.sum("_sg").alias("_d_cnt"),
            F.max(F.when(F.col("_sg") < 0, 1).otherwise(0))
            .alias("_mv_dirty")]
    for alias, a in spec["aggs"].items():
        fn, col = a["fn"], a.get("col")
        if fn in ("sum", "avg"):
            s = scales[alias]
            aggs.append(
                F.sum(F.col("_sg") * F.col(col).cast(f"decimal(38,{s})"))
                .cast(f"decimal(38,{s})").alias(f"_d_s_{alias}"))
            aggs.append(
                F.sum(F.col("_sg")
                      * F.col(col).isNotNull().cast("long"))
                .alias(f"_d_n_{alias}"))
        elif fn == "min":
            aggs.append(F.min(F.when(F.col("_sg") > 0, F.col(col)))
                        .alias(f"_c_min_{alias}"))
        elif fn == "max":
            aggs.append(F.max(F.when(F.col("_sg") > 0, F.col(col)))
                        .alias(f"_c_max_{alias}"))
        if alias in riders:
            # insert candidates: only the K best can ever enter the
            # rider, so trim HERE (batch-bounded lists, K-bounded out).
            # Deleted values CANNOT be trimmed — any one of them may
            # evict a tracked occurrence (which of them do depends on
            # the stored rider, unknown at delta time) — so the delete
            # list is bounded by the batch, not by K: page giant
            # catch-ups with max_versions.
            aggs.append(F.slice(F.sort_array(
                F.collect_list(F.when(F.col("_sg") > 0, F.col(col))),
                asc=_rider_asc(fn)), 1, k).alias(f"_d_ins_{alias}"))
            aggs.append(F.collect_list(
                F.when(F.col("_sg") < 0, F.col(col)))
                .alias(f"_d_del_{alias}"))
            aggs.append(
                F.sum(F.col("_sg")
                      * F.col(col).isNotNull().cast("long"))
                .alias(f"_d_nn_{alias}"))
    return rows.groupBy(*g).agg(*aggs).select(_mv_key_col(g), "*")


def _rider_fold_sql(alias: str, fn: str, k: int,
                    k_expose: int | None = None) -> dict[str, str]:
    """SQL fragments folding one rider through a joined (d, o) row.

    Invariant maintained (the whole correctness argument): the stored
    rider is always the |rider| smallest (min) / largest (max) live
    non-null values of its group — an exact sorted PREFIX — so
    ``rider[1]`` IS the group extremum whenever the rider is nonempty.

    - inserts are ADMITTED only when provably inside the prefix: all of
      them while the rider covers the whole group (``size == nn``),
      only values at-or-inside the tracked boundary once truncated, and
      none at all if a deficient rider has emptied (the boundary is
      unknown). Admission happens BEFORE deletes and re-trims to K —
      trimming first is what keeps the prefix property (a value a
      same-batch delete would have evicted may be spuriously trimmed,
      which at worst empties the rider into the safe DIRTY path).
    - deletes remove ONE tracked occurrence if present, else no-op: a
      live value strictly inside the boundary is always tracked, so a
      miss means the deleted occurrence was outside the prefix.
    - a rider that empties while non-null rows remain is DEFICIENT →
      the group recomputes (with a base/snapshot) or refuses (without).
    """
    oldr = (f"coalesce(o.`_mv_rk_{alias}`, "
            f"slice(d.`_d_ins_{alias}`, 1, 0))")
    oldnn = f"coalesce(o.`_mv_nn_{alias}`, CAST(0 AS BIGINT))"
    asc = "true" if _rider_asc(fn) else "false"
    cmp = "<=" if _rider_asc(fn) else ">="
    adm = (f"CASE WHEN size({oldr}) = {oldnn} THEN d.`_d_ins_{alias}` "
           f"WHEN size({oldr}) = 0 THEN slice(d.`_d_ins_{alias}`, 1, 0) "
           f"ELSE filter(d.`_d_ins_{alias}`, "
           f"x -> x {cmp} element_at({oldr}, -1)) END")
    merged = f"slice(sort_array(concat({oldr}, {adm}), {asc}), 1, {k})"
    # PERFORMANCE SHAPE (higher-order folds are INTERPRETED, not
    # codegen'd): ``merged`` is the aggregate's INIT — evaluated once
    # per fold, never per element. An expression referenced inside a
    # lambda BODY re-evaluates per element: a boundary filter over the
    # delete list spelled as ``filter(dels, x -> x <= element_at(
    # merged, -1))`` rebuilt the whole merged array per delete and
    # DOUBLED the refresh — never reference a non-trivial expression
    # from a lambda. The lambda instead short-circuits each delete on
    # an O(1) boundary probe of the ACCUMULATOR (x outside acc's
    # tracked range can't be present — acc only shrinks from merged),
    # so the O(K) array_position runs only for genuine eviction
    # candidates: a 4k-delete group costs 4k comparisons + ~K real
    # removals, not 4k × K.
    folded = (f"aggregate(d.`_d_del_{alias}`, {merged}, (acc, x) -> "
              f"CASE WHEN size(acc) > 0 "
              f"AND x {cmp} element_at(acc, -1) "
              "AND array_position(acc, x) > 0 THEN "
              "concat(slice(acc, 1, "
              "CAST(array_position(acc, x) AS INT) - 1), "
              "slice(acc, CAST(array_position(acc, x) AS INT) + 1, "
              "size(acc))) ELSE acc END)")
    newnn = f"({oldnn} + coalesce(d.`_d_nn_{alias}`, CAST(0 AS BIGINT)))"
    # deficiency: min/max only need a NONEMPTY prefix (its head is the
    # extremum); an exposed bottomk/topk needs the prefix COMPLETE to
    # its own depth k_expose (least(k_expose, live-non-null count))
    need = (f"least(CAST({int(k_expose)} AS BIGINT), {newnn})"
            if k_expose else f"least(CAST(1 AS BIGINT), {newnn})")
    return {
        "rk": folded,
        "nn": newnn,
        "deficient": f"(size({folded}) < {need})",
        "val": (f"CASE WHEN size({folded}) > 0 "
                f"THEN element_at({folded}, 1) END"),
    }


def _apply_delta(spark, view: TableLog, spec: dict, scales: dict,
                 delta, tok: str, base: TableLog | None,
                 base_version: int | None,
                 snapshot_df=None) -> dict:
    """Join the signed delta with the view's current rows, fold the new
    riders, recompute dirty min/max groups from the base AS OF the
    refresh end version, and land everything as ONE keyed MERGE whose
    commit writer is ``tok`` (the crash-recovery breadcrumb)."""
    from pyspark.sql import functions as F

    from functools import reduce
    from operator import and_

    # the delta is O(touched groups) rows — the view's own grain — but
    # COMPUTING it re-reads the change feed and re-runs its collect_list
    # sorts, and this apply drives SEVERAL jobs over it (the guard agg,
    # the MERGE's bucket rewrites, the dirty recompute). Pin it once:
    # row-format localCheckpoint, NOT the columnar cache (the minhash
    # persist trap) — the sf0.1 topk oracle dropped 52 s → ~16 s warm,
    # and every matview family entry shares the win.
    delta = delta.localCheckpoint(eager=False)

    g = spec["group_by"]
    has_minmax = any(a["fn"] in _RIDER_FNS
                     for a in spec["aggs"].values())
    k = _rider_k(spec)
    riders = _rider_aggs(spec)
    rsql = {alias: _rider_fold_sql(alias, a["fn"], k,
                                   k_expose=a.get("k"))
            for alias, a in riders.items()}
    old = read_snapshot_spark(spark, view)
    d = delta.alias("d")
    # keep the old row's group columns (renamed) for the hash-collision
    # cross-check: a delta row joining an old row with DIFFERENT group
    # values means two group tuples share one 64-bit key
    o = old.select(
        "_mv_key",
        *[F.col(c).alias(f"_o_{c}") for c in g],
        *[c for c in old.columns if c not in g and c != "_mv_key"],
    ).alias("o")
    j = d.join(o, F.col("d._mv_key") == F.col("o._mv_key"), "left")

    cols = [F.col("d._mv_key").alias("_mv_key"),
            *[F.col(f"d.{c}").alias(c) for c in g]]
    new_cnt = (F.coalesce(F.col("o._mv_cnt"), F.lit(0))
               + F.col("d._d_cnt"))
    cols.append(new_cnt.alias("_mv_cnt"))
    for alias, a in spec["aggs"].items():
        fn = a["fn"]
        if fn in ("sum", "avg"):
            s = scales[alias]
            zero = F.lit(0).cast(f"decimal(38,{s})")
            cols.append(
                (F.coalesce(F.col(f"o._mv_s_{alias}"), zero)
                 + F.coalesce(F.col(f"d._d_s_{alias}"), zero))
                .cast(f"decimal(38,{s})").alias(f"_mv_s_{alias}"))
            cols.append(
                (F.coalesce(F.col(f"o._mv_n_{alias}"), F.lit(0))
                 + F.col(f"d._d_n_{alias}")).alias(f"_mv_n_{alias}"))
        elif fn == "min" and alias in rsql:
            # the rider IS the min: exact prefix head (NULL when empty)
            cols.append(F.expr(rsql[alias]["val"])
                        .alias(f"_mv_min_{alias}"))
        elif fn == "max" and alias in rsql:
            cols.append(F.expr(rsql[alias]["val"])
                        .alias(f"_mv_max_{alias}"))
        elif fn == "min":
            cols.append(F.least(F.col(f"o._mv_min_{alias}"),
                                F.col(f"d._c_min_{alias}"))
                        .alias(f"_mv_min_{alias}"))
        elif fn == "max":
            cols.append(F.greatest(F.col(f"o._mv_max_{alias}"),
                                   F.col(f"d._c_max_{alias}"))
                        .alias(f"_mv_max_{alias}"))
        if alias in rsql:
            cols.append(F.expr(rsql[alias]["rk"])
                        .alias(f"_mv_rk_{alias}"))
            cols.append(F.expr(rsql[alias]["nn"])
                        .alias(f"_mv_nn_{alias}"))
    # with riders, DIRTY means "some rider emptied with rows left"
    # (recompute only past the rider depth); without, any row loss
    dirty_expr = (reduce(
        lambda x, y: x | y,
        [F.expr(r["deficient"]) for r in rsql.values()])
        if rsql else (F.col("d._mv_dirty") == 1))
    up = j.select(*cols, dirty_expr.cast("int").alias("_mv_dirty"))

    # ONE guard action for the whole refresh: negative-count rows,
    # both hash-collision modes (delta-internal duplicate keys, and a
    # delta key joining a stored row with different group values), the
    # upsert count, the dirty-group count — and (r9 optimization) the
    # distinct view buckets the upsert touches, so the MERGE below
    # skips its own per-call distinct-collect planning action
    from distribot_spark.sources.acid import (
        _bucket_expr as _acid_bucket_expr,
        _resolve_layout as _acid_resolve_layout,
    )

    vkey, vbuckets = _acid_resolve_layout(view, "_mv_key", None)
    same_grp = reduce(and_, [
        F.col(f"d.{c}").eqNullSafe(F.col(f"o._o_{c}")) for c in g])
    new_cnt_e = (F.coalesce(F.col("o._mv_cnt"), F.lit(0))
                 + F.col("d._d_cnt"))
    chk = j.select(
        (new_cnt_e < 0).cast("int").alias("_neg"),
        (F.col("o._mv_cnt").isNotNull() & ~same_grp).cast("int")
        .alias("_coll"),
        F.col("d._mv_key").alias("_k"),
        (dirty_expr & (new_cnt_e > 0)).cast("int").alias("_dl"),
        F.col("d._mv_key").alias(vkey),
    ).withColumn(
        "_pb", _acid_bucket_expr(vkey, vbuckets, view.hash_buckets())
    ).agg(F.sum("_neg").alias("bad"), F.sum("_coll").alias("coll"),
          F.count(F.lit(1)).alias("n"),
          F.countDistinct("_k").alias("nd"),
          F.sum("_dl").alias("ndirty"),
          F.collect_set("_pb").alias("pbs")).collect()[0]
    bad, n_up = int(chk["bad"] or 0), int(chk["n"])
    touched_pbs = set(int(b) for b in (chk["pbs"] or []))
    if int(chk["coll"] or 0) or n_up != int(chk["nd"]):
        raise RuntimeError(
            "matview group-key hash collision: two group tuples share "
            "one 64-bit key (astronomically rare — re-shape group_by)")
    if bad:
        raise ValueError(
            f"matview delta drove {bad} group(s) below zero rows — "
            "the change batch is not a contiguous feed continuation")

    n_dirty = 0
    if has_minmax:
        # tombstoned groups need no recompute; their min/max is NULL
        dirty = up.filter((F.col("_mv_dirty") == 1)
                          & (F.col("_mv_cnt") > 0))
        n_dirty = int(chk["ndirty"] or 0)
        if n_dirty:
            if snapshot_df is None and (base is None
                                        or base_version is None):
                raise ValueError(
                    "min/max view lost rows in a group"
                    + (f" past the rider depth (rider_k={k})" if rsql
                       else "")
                    + "; recompute needs the base table and a pinned "
                    "version")
            snap = (snapshot_df if snapshot_df is not None
                    else _filtered(
                        read_snapshot_spark(spark, base,
                                            version=base_version),
                        spec))
            keys = dirty.select("_mv_key")
            snap2 = (snap.select(_mv_key_col(g), "*")
                     .join(F.broadcast(keys), "_mv_key", "left_semi"))
            if rsql:
                # the recompute also REFILLS the exhausted riders —
                # dirty-group-bounded window, same top-K spelling as
                # create
                from pyspark.sql.window import Window

                for alias, a in riders.items():
                    order = (F.col(a["col"]).asc_nulls_last()
                             if _rider_asc(a["fn"])
                             else F.col(a["col"]).desc_nulls_last())
                    snap2 = snap2.withColumn(
                        f"_rkn_{alias}",
                        F.row_number().over(
                            Window.partitionBy("_mv_key")
                            .orderBy(order)))
            raggs = []
            for alias, a in spec["aggs"].items():
                if a["fn"] == "min":
                    raggs.append(F.min(a["col"])
                                 .alias(f"_r_min_{alias}"))
                elif a["fn"] == "max":
                    raggs.append(F.max(a["col"])
                                 .alias(f"_r_max_{alias}"))
                if alias in riders:
                    raggs.append(F.sort_array(
                        F.collect_list(
                            F.when((F.col(f"_rkn_{alias}") <= k)
                                   & F.col(a["col"]).isNotNull(),
                                   F.col(a["col"]))),
                        asc=_rider_asc(a["fn"]))
                        .alias(f"_r_rk_{alias}"))
            rec = snap2.groupBy("_mv_key").agg(*raggs)
            up = up.alias("u").join(rec.alias("r"), "_mv_key", "left")
            fix = [F.col("_mv_key"),
                   *[F.col(f"u.{c}").alias(c) for c in g],
                   F.col("u._mv_cnt").alias("_mv_cnt")]
            for alias, a in spec["aggs"].items():
                fn = a["fn"]
                if fn in ("sum", "avg"):
                    fix.append(F.col(f"u._mv_s_{alias}")
                               .alias(f"_mv_s_{alias}"))
                    fix.append(F.col(f"u._mv_n_{alias}")
                               .alias(f"_mv_n_{alias}"))
                elif fn == "min":
                    fix.append(
                        F.when((F.col("u._mv_dirty") == 1)
                               & (F.col("u._mv_cnt") > 0),
                               F.col(f"r._r_min_{alias}"))
                        .otherwise(F.col(f"u._mv_min_{alias}"))
                        .alias(f"_mv_min_{alias}"))
                elif fn == "max":
                    fix.append(
                        F.when((F.col("u._mv_dirty") == 1)
                               & (F.col("u._mv_cnt") > 0),
                               F.col(f"r._r_max_{alias}"))
                        .otherwise(F.col(f"u._mv_max_{alias}"))
                        .alias(f"_mv_max_{alias}"))
                if alias in riders:
                    fix.append(
                        F.when((F.col("u._mv_dirty") == 1)
                               & (F.col("u._mv_cnt") > 0),
                               F.col(f"r._r_rk_{alias}"))
                        .otherwise(F.col(f"u._mv_rk_{alias}"))
                        .alias(f"_mv_rk_{alias}"))
                    # nn is the exact signed count — never recomputed
                    fix.append(F.col(f"u._mv_nn_{alias}")
                               .alias(f"_mv_nn_{alias}"))
            up = up.select(*fix, F.col("u._mv_dirty").alias("_mv_dirty"))

    # tombstone: a dead group keeps its key with zeroed riders so the
    # whole refresh stays one MERGE commit (no second delete commit to
    # make atomic with it)
    final = []
    dead = F.col("_mv_cnt") == 0
    for c in up.columns:
        if c in ("_mv_key", "_mv_cnt") or c in g:
            final.append(F.col(c))
        elif c == "_mv_dirty":
            continue
        elif c.startswith("_mv_s_"):
            s = scales[c[len("_mv_s_"):]]
            final.append(F.when(dead, F.lit(0).cast(f"decimal(38,{s})"))
                         .otherwise(F.col(c)).alias(c))
        elif c.startswith("_mv_n_"):
            final.append(F.when(dead, F.lit(0)).otherwise(F.col(c))
                         .cast("long").alias(c))
        else:  # _mv_min_/_mv_max_
            final.append(F.when(dead, F.lit(None)).otherwise(F.col(c))
                         .alias(c))
    rows = up.select(*final)
    merge_upsert_spark(spark, view, rows, "_mv_key", writer=tok,
                       touched_buckets=touched_pbs)
    return {"groups_upserted": n_up, "dirty_recomputed": int(n_dirty)}


def refresh_matview(spark, base: TableLog, view: TableLog,
                    max_versions: int | None = None,
                    writer: str = "matview",
                    lease_sec: float = DEFAULT_REFRESH_LEASE) -> dict:
    """Fold the base commits past the cursor into the view — exactly
    once, in one view commit. ``max_versions`` bounds one call's range
    (catch-up pacing, the replication knob); loop until
    ``behind == 0``. Refreshes are SERIALIZED by a lease claim: a
    second caller while one is in flight gets `MatviewRefreshBusy`
    (overlapping folds of the same range double-count; cron overlap is
    the classic trigger); pending-marker recovery runs inside the
    claim so only a genuinely dead holder's apply is ever resolved."""
    if max_versions is not None and max_versions < 1:
        raise ValueError(f"max_versions must be >= 1, got {max_versions}")
    with _refresh_claim(view, writer, lease_sec):
        state = _recover_pending(view, _load_state(view))
        spec, scales = state["spec"], state["scales"]
        last = int(state["last_applied"])
        head = base.version()
        hi = (head if max_versions is None
              else min(head, last + max_versions))
        out = {"from_version": last + 1, "to_version": hi,
               "groups_upserted": 0, "dirty_recomputed": 0}
        if hi <= last:
            return dict(out, to_version=last,
                        behind=max(0, head - last))
        ch = table_changes_spark(spark, base, from_version=last + 1,
                                 to_version=hi)
        delta = matview_delta(spark, spec, scales, ch)
        tok = f"{writer}:apply:{last + 1}-{hi}:{uuid.uuid4().hex[:8]}"
        _write_state(view, dict(
            state, pending={"token": tok,
                            "view_version_before": view.version(),
                            "on_landed": {"last_applied": hi}}))
        st = _apply_delta(spark, view, spec, scales, delta, tok,
                          base=base, base_version=hi)
        _write_state(view, dict(state, last_applied=hi))
        out.update(st)
        return dict(out, behind=head - hi)


def apply_matview_changes(spark, view: TableLog, changes_df,
                          batch_id: int | None = None,
                          writer: str = "matview-stream",
                          base: TableLog | None = None) -> dict:
    """The STREAMING face of the refresh: fold one change-feed
    micro-batch (the `table_changes_spark` row shape, e.g. from the CDF
    replay source) into the view inside a foreachBatch sink.
    ``batch_id`` makes redelivery safe — a batch at or below the
    writer's persisted high-water mark is skipped, and the crash window
    between the merge and the mark uses the same pending-token recovery
    as `refresh_matview`, so the fold lands EFFECTIVELY ONCE (the s23
    ACID-sink discipline; deltas are not idempotent, so this matters
    more here than for replication).

    min/max specs need the dirty-group recompute when a batch loses
    rows in a group: pass ``base`` and the recompute pins to the
    batch's OWN last commit version (``max(_commit_version)`` — exactly
    the state this batch's fold lands, so later base commits racing the
    stream cannot leak in; they arrive as later batches). Without
    ``base``: a ``rider_k`` spec stays SELF-MAINTAINING through row
    loss until a group's rider genuinely empties (K extremum evictions
    uncovered by admissible inserts) — only then, or on any row loss
    under a rider-less min/max spec, does `_apply_delta` refuse
    loudly. Streaming min/max views without a base handle should
    therefore declare a rider depth sized to the eviction run-length
    they need to absorb.

    Shares the refresh lease claim: a streaming apply racing a batch
    refresh (or a second stream on the same view) raises
    `MatviewRefreshBusy` instead of double-folding."""
    from pyspark.sql import functions as F

    with _refresh_claim(view, writer):
        state = _recover_pending(view, _load_state(view))
        spec, scales = state["spec"], state["scales"]
        hwm_key = f"hwm_{writer}"
        if (batch_id is not None
                and int(batch_id) <= state.get(hwm_key, -1)):
            return {"skipped": True, "groups_upserted": 0,
                    "dirty_recomputed": 0}
        base_version = None
        if base is not None and any(a["fn"] in _RIDER_FNS
                                    for a in spec["aggs"].values()):
            r = changes_df.agg(
                F.max("_commit_version").alias("v")).collect()[0]
            base_version = int(r["v"]) if r["v"] is not None else None
            if base_version is None:
                base = None  # empty batch: nothing can be dirty
        delta = matview_delta(spark, spec, scales, changes_df)
        tok = f"{writer}:batch:{batch_id}:{uuid.uuid4().hex[:8]}"
        on_landed = ({hwm_key: int(batch_id)}
                     if batch_id is not None else {})
        _write_state(view, dict(
            state, pending={"token": tok,
                            "view_version_before": view.version(),
                            "on_landed": on_landed}))
        st = _apply_delta(spark, view, spec, scales, delta, tok,
                          base=base, base_version=base_version)
        _write_state(view, dict(state, **on_landed))
        return dict(st, skipped=False)


def _user_cols(spec: dict):
    """The user-facing projection (group columns + agg aliases) from
    the stored-rider shape — SQL NULL semantics restored (SUM of an
    all-NULL group is NULL; AVG divides by the non-null count as
    DOUBLE, guarded because ANSI mode raises on /0 and a tombstoned or
    all-NULL group legitimately has nn == 0). Shared by `read_matview`
    and `matview_full_spark` so the live view and the reference
    recompute can never drift in shape."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in spec["group_by"]]
    for alias, a in spec["aggs"].items():
        fn = a["fn"]
        if fn == "count":
            cols.append(F.col("_mv_cnt").cast("long").alias(alias))
        elif fn == "sum":
            cols.append(F.when(F.col(f"_mv_n_{alias}") > 0,
                               F.col(f"_mv_s_{alias}")).alias(alias))
        elif fn == "avg":
            cols.append(F.when(F.col(f"_mv_n_{alias}") > 0,
                               F.col(f"_mv_s_{alias}").cast("double")
                               / F.col(f"_mv_n_{alias}")).alias(alias))
        elif fn == "min":
            cols.append(F.col(f"_mv_min_{alias}").alias(alias))
        elif fn in ("bottomk", "topk"):
            # the exposed prefix: first k of the rider (already sorted
            # in this agg's direction; the rider may be deeper)
            cols.append(F.slice(F.col(f"_mv_rk_{alias}"), 1,
                                int(a["k"])).alias(alias))
        else:
            cols.append(F.col(f"_mv_max_{alias}").alias(alias))
    return cols


def read_matview(spark, view: TableLog):
    """The view as the user declared it: group columns + agg aliases,
    tombstones filtered, NULL semantics restored (`_user_cols`)."""
    from pyspark.sql import functions as F

    state = _load_state(view)
    df = read_snapshot_spark(spark, view).filter(F.col("_mv_cnt") > 0)
    return df.select(*_user_cols(state["spec"]))


def matview_full_spark(spark, base: TableLog, spec: dict,
                       version: int | None = None):
    """Reference recompute: the view's user-facing rows derived from
    scratch at ``version`` — what every incremental refresh must equal
    (the tests' oracle, and the audit tool for a live view)."""
    _validate_spec(spec)
    df = read_snapshot_spark(spark, base, version=version)
    scales = {a: _sum_scale(df, s["col"]) for a, s in spec["aggs"].items()
              if s["fn"] in ("sum", "avg")}
    st = _full_state(df, spec, scales)
    return st.select(*_user_cols(spec))


def purge_matview_tombstones(spark, view: TableLog,
                             writer: str = "matview-purge") -> int:
    """Reclaim dead groups (``_mv_cnt = 0``) — safe any time, in its
    own commit, because refreshes treat an absent group and a tombstone
    identically (both fold from zero)."""
    from pyspark.sql import functions as F

    dead = (read_snapshot_spark(spark, view)
            .filter(F.col("_mv_cnt") == 0).select("_mv_key"))
    n = dead.count()
    if n:
        delete_keys_spark(spark, view, dead, "_mv_key", writer=writer)
    return int(n)


# ---- IVM over JOINS (fact ⋈ dim) ------------------------------------
#
# The classic next rung past single-table aggregates (VERDICT r7 task
# 3): maintain ``SELECT g, aggs FROM fact F JOIN dim D ON F.fk = D.k
# GROUP BY g`` from BOTH tables' change feeds with delta-join algebra.
# With signed multisets (insert/update_post = +1, delete/update_pre =
# −1) and F_new = F_old + ΔF, D_new = D_old + ΔD:
#
#     ΔV = F_new⋈D_new − F_old⋈D_old = ΔF⋈D_new  ∪  F_old⋈ΔD
#
# (the ΔF⋈ΔD double-count folds into the first term by pinning the
# dim side NEW and the fact side OLD — exact for any multiset, no
# uniqueness assumption needed). Each refresh therefore reads: the two
# change feeds (delta-bounded), the dim snapshot AS OF its new cursor
# (dims are small by design), and the OLD fact snapshot PRUNED to
# ΔD's join keys via a broadcast semi-join — the inherent "a dim
# update touches its referring facts" cost, file-skippable when the
# fact is clustered on the join key. Group-by columns may come from
# EITHER side, so a dim attribute update is a mass group move and
# folds exactly.  Joined-row semantics are INNER: a fact whose dim row
# is deleted drops out of the view (document FKs if dangling facts
# must be impossible).  Everything else — riders, tombstones, the
# pending-token exactly-once protocol, the refresh lease — is shared
# with the single-table path verbatim.


def _join_cols(spec: dict) -> tuple[str, str]:
    j = spec["join"]
    return j["fact_fk"], j["dim_key"]


def _join_frame(spark, spec, fact_df, dim_df):
    from pyspark.sql import functions as F

    fk, dk = _join_cols(spec)
    j = fact_df.alias("f").join(
        dim_df.alias("d"),
        F.col(f"f.{fk}") == F.col(f"d.{dk}"), "inner")
    return _filtered(j, spec)


def _needed_cols(spec: dict):
    """The columns the delta fold needs (group keys + agg inputs +
    sign) — both union branches project to exactly this set."""
    cols = list(spec["group_by"])
    for a in spec["aggs"].values():
        if a.get("col") and a["col"] not in cols:
            cols.append(a["col"])
    return cols


def create_join_matview(spark, fact: TableLog, dim: TableLog,
                        view: TableLog, spec: dict,
                        n_buckets: int = 8,
                        writer: str = "matview") -> dict:
    """Materialize the joined aggregate over BOTH tables' current
    snapshots and pin a cursor PER SIDE; `refresh_join_matview` folds
    everything after them."""
    _validate_spec(spec)
    if "join" not in spec:
        raise ValueError("join matview spec needs a 'join' clause")
    vf, vd = fact.version(), dim.version()
    j = _join_frame(spark,
                    spec,
                    read_snapshot_spark(spark, fact, version=vf),
                    read_snapshot_spark(spark, dim, version=vd))
    scales = {a: _sum_scale(j, s["col"]) for a, s in spec["aggs"].items()
              if s["fn"] in ("sum", "avg")}
    full = _full_state(j, spec, scales)
    _check_key_collisions(full, "create_join_matview")
    write_initial_spark(spark, view, full, "_mv_key",
                        n_buckets=n_buckets, writer=writer)
    _write_state(view, {"spec": spec, "scales": scales,
                        "fact_path": fact.path, "dim_path": dim.path,
                        "last_fact": vf, "last_dim": vd})
    return {"fact_version": vf, "dim_version": vd}


def _join_delta_frames(spark, spec, fact, dim, lf, hf, ld, hd):
    """The two delta-join terms as ONE signed change frame projected to
    the fold's columns + ``_change_type`` (matview_delta derives the
    ±1 sign from it)."""
    from pyspark.sql import functions as F

    fk, dk = _join_cols(spec)
    need = _needed_cols(spec)
    parts = []
    if hf > lf:
        dF = table_changes_spark(spark, fact, from_version=lf + 1,
                                 to_version=hf)
        d_new = read_snapshot_spark(spark, dim, version=hd)
        j = dF.alias("f").join(d_new.alias("d"),
                               F.col(f"f.{fk}") == F.col(f"d.{dk}"),
                               "inner")
        parts.append(_filtered(j, spec).select(
            *need, F.col("f._change_type").alias("_change_type")))
    if hd > ld:
        dD = table_changes_spark(spark, dim, from_version=ld + 1,
                                 to_version=hd)
        f_old = read_snapshot_spark(spark, fact, version=lf)
        # prune the fact scan to the dim delta's join keys: the only
        # facts whose view contribution can change
        keys = dD.select(F.col(dk).alias(fk)).distinct()
        f_old = f_old.join(F.broadcast(keys), fk, "left_semi")
        j = f_old.alias("f").join(dD.alias("d"),
                                  F.col(f"f.{fk}") == F.col(f"d.{dk}"),
                                  "inner")
        parts.append(_filtered(j, spec).select(
            *need, F.col("d._change_type").alias("_change_type")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def refresh_join_matview(spark, fact: TableLog, dim: TableLog,
                         view: TableLog,
                         max_versions: int | None = None,
                         writer: str = "matview",
                         lease_sec: float = DEFAULT_REFRESH_LEASE
                         ) -> dict:
    """Fold both feeds past the per-side cursors into the view —
    exactly once, one view commit. ``max_versions`` bounds EACH side's
    range (catch-up paging); loop until ``behind == 0``."""
    if max_versions is not None and max_versions < 1:
        raise ValueError(f"max_versions must be >= 1, got {max_versions}")
    with _refresh_claim(view, writer, lease_sec):
        state = _recover_pending(view, _load_state(view))
        spec, scales = state["spec"], state["scales"]
        lf, ld = int(state["last_fact"]), int(state["last_dim"])
        head_f, head_d = fact.version(), dim.version()
        hf = (head_f if max_versions is None
              else min(head_f, lf + max_versions))
        hd = (head_d if max_versions is None
              else min(head_d, ld + max_versions))
        out = {"fact_range": (lf + 1, hf), "dim_range": (ld + 1, hd),
               "groups_upserted": 0, "dirty_recomputed": 0}
        if hf <= lf and hd <= ld:
            return dict(out, behind=0)
        changes = _join_delta_frames(spark, spec, fact, dim,
                                     lf, hf, ld, hd)
        # the join terms are already _filtered and projected; a
        # filter-less spec keeps matview_delta from re-filtering
        # against columns the projection dropped
        spec_nf = {k: v for k, v in spec.items() if k != "filter"}
        delta = matview_delta(spark, spec_nf, scales, changes)
        tok = (f"{writer}:japply:f{lf + 1}-{hf}:d{ld + 1}-{hd}:"
               f"{uuid.uuid4().hex[:8]}")
        _write_state(view, dict(
            state, pending={"token": tok,
                            "view_version_before": view.version(),
                            "on_landed": {"last_fact": hf,
                                          "last_dim": hd}}))
        # the pinned joined snapshot exists only for the min/max dirty
        # recompute — a count/sum/avg spec must not pay the two
        # snapshot folds (the streaming twin guards identically)
        snap = None
        if any(a["fn"] in _RIDER_FNS for a in spec["aggs"].values()):
            snap = _join_frame(
                spark, spec,
                read_snapshot_spark(spark, fact, version=hf),
                read_snapshot_spark(spark, dim, version=hd))
        st = _apply_delta(spark, view, spec, scales, delta, tok,
                          base=None, base_version=None,
                          snapshot_df=snap)
        _write_state(view, dict(state, last_fact=hf, last_dim=hd))
        out.update(st)
        return dict(out,
                    behind=(head_f - hf) + (head_d - hd))


def apply_join_matview_changes(spark, view: TableLog, changes_df,
                               side: str,
                               batch_id: int | None = None,
                               writer: str = "matview-stream",
                               fact: TableLog | None = None,
                               dim: TableLog | None = None) -> dict:
    """STREAMING face of the join refresh: fold one change-feed
    micro-batch from ONE side (``side`` ∈ {'fact', 'dim'}) inside a
    foreachBatch sink. Each batch is a sequenced delta-join step
    against the OTHER side pinned at its current cursor (fact batch:
    ΔF ⋈ dim@last_dim; dim batch: fact@last_fact ⋈ ΔD) — exact under
    any interleaving of the two streams, by induction on the algebra.
    The batch must end on a whole version boundary of its own feed
    (the CDF replay source's versions_per_trigger contract); the
    landed cursor advances to ``max(_commit_version)``. Redelivery,
    crash recovery and the refresh lease are the single-table
    machinery verbatim; min/max specs need BOTH handles for the
    dirty-group recompute and refuse loudly on row-losing batches
    without them."""
    from pyspark.sql import functions as F

    if side not in ("fact", "dim"):
        raise ValueError(f"side must be 'fact' or 'dim', got {side!r}")
    with _refresh_claim(view, writer):
        state = _recover_pending(view, _load_state(view))
        spec, scales = state["spec"], state["scales"]
        fk, dk = _join_cols(spec)
        need = _needed_cols(spec)
        hwm_key = f"hwm_{writer}_{side}"
        if (batch_id is not None
                and int(batch_id) <= state.get(hwm_key, -1)):
            return {"skipped": True, "groups_upserted": 0,
                    "dirty_recomputed": 0}
        r = changes_df.agg(
            F.max("_commit_version").alias("v")).collect()[0]
        batch_hi = int(r["v"]) if r["v"] is not None else None
        cursor_key = "last_fact" if side == "fact" else "last_dim"
        if batch_hi is None:
            batch_hi = int(state[cursor_key])  # empty batch
        if side == "fact":
            if dim is None:
                raise ValueError("fact-side apply needs the dim handle")
            other = read_snapshot_spark(spark, dim,
                                        version=int(state["last_dim"]))
            j = changes_df.alias("f").join(
                other.alias("d"),
                F.col(f"f.{fk}") == F.col(f"d.{dk}"), "inner")
            changes = _filtered(j, spec).select(
                *need, F.col("f._change_type").alias("_change_type"))
        else:
            if fact is None:
                raise ValueError("dim-side apply needs the fact handle")
            f_old = read_snapshot_spark(spark, fact,
                                        version=int(state["last_fact"]))
            keys = changes_df.select(F.col(dk).alias(fk)).distinct()
            f_old = f_old.join(F.broadcast(keys), fk, "left_semi")
            j = f_old.alias("f").join(
                changes_df.alias("d"),
                F.col(f"f.{fk}") == F.col(f"d.{dk}"), "inner")
            changes = _filtered(j, spec).select(
                *need, F.col("d._change_type").alias("_change_type"))
        spec_nf = {k: v for k, v in spec.items() if k != "filter"}
        delta = matview_delta(spark, spec_nf, scales, changes)
        snap = None
        if any(a["fn"] in _RIDER_FNS
               for a in spec["aggs"].values()):
            if fact is not None and dim is not None:
                vf = batch_hi if side == "fact" else int(
                    state["last_fact"])
                vd = batch_hi if side == "dim" else int(
                    state["last_dim"])
                snap = _join_frame(
                    spark, spec,
                    read_snapshot_spark(spark, fact, version=vf),
                    read_snapshot_spark(spark, dim, version=vd))
        tok = (f"{writer}:jbatch:{side}:{batch_id}:"
               f"{uuid.uuid4().hex[:8]}")
        on_landed = {cursor_key: batch_hi}
        if batch_id is not None:
            on_landed[hwm_key] = int(batch_id)
        _write_state(view, dict(
            state, pending={"token": tok,
                            "view_version_before": view.version(),
                            "on_landed": on_landed}))
        st = _apply_delta(spark, view, spec, scales, delta, tok,
                          base=None, base_version=None,
                          snapshot_df=snap)
        _write_state(view, dict(state, **on_landed))
        return dict(st, skipped=False)


def join_matview_full_spark(spark, fact: TableLog, dim: TableLog,
                            spec: dict,
                            fact_version: int | None = None,
                            dim_version: int | None = None):
    """Reference recompute for the JOIN view — what every incremental
    refresh must equal (the tests' oracle and the audit tool)."""
    _validate_spec(spec)
    j = _join_frame(
        spark, spec,
        read_snapshot_spark(spark, fact, version=fact_version),
        read_snapshot_spark(spark, dim, version=dim_version))
    scales = {a: _sum_scale(j, s["col"]) for a, s in spec["aggs"].items()
              if s["fn"] in ("sum", "avg")}
    st = _full_state(j, spec, scales)
    return st.select(*_user_cols(spec))
