"""Access policies on the ACID table (sources/acid.py policy section):
row-level security + column masking as read-side table metadata.

Covers: per-role mask application (exempt sees raw), every mask form's
cross-engine spelling (Spark ≡ DuckDB ≡ pandas, including short strings
and negative ints — the oracle's foundation), row-filter NULL semantics
(the constraint DSL contract), manifest file-pruning for
not_null-qualified filters (pruned ≡ unpruned + predicate), the
no-escape-hatch rule (current policy governs time travel and the change
feed), rename/drop integration (masks follow renames atomically, drops
demand explicit release), ALTER-time validation (hash-on-float rejected),
the governed facade, and a seeded cross-client differential pinning
read_policy_spark ≡ read_policy_pandas row-for-row.
"""

import os
import tempfile

import pandas as pd
import pytest

from distribot_spark.sources import acid
from distribot_spark.sources.acid import TableLog
from distribot_spark.sources.table import Table


def _tmp_table():
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix="policy_", dir="/root/repo/.tmp")


def _people_df(spark):
    rows = [
        (1, "alice", "555-0101-7788", 1234, "north"),
        (2, "bob", "555-0102-6655", -250, "south"),
        (3, "carol", None, 9800, "north"),
        (4, "dan", "x7", None, "west"),
        (5, None, "555-0105-4433", 40, None),
    ]
    return spark.createDataFrame(
        rows, "id bigint, name string, phone string, balance bigint, "
              "region string")


def _seed(spark, n_buckets=4):
    t = TableLog(_tmp_table())
    t.init(key="id", n_buckets=n_buckets)
    acid.write_initial_spark(spark, t, _people_df(spark), "id",
                             n_buckets=n_buckets)
    return t


def _rows(df):
    return sorted(
        tuple(None if pd.isna(v) else v for v in r)
        for r in df.toPandas().itertuples(index=False)
    )


def test_masks_apply_per_role_and_raw_path_stays_raw(spark):
    t = _seed(spark)
    acid.alter_set_mask(t, "name", {"fn": "hash",
                                    "exempt_roles": ["auditor"]})
    acid.alter_set_mask(t, "phone", {"fn": "partial", "keep_last": 4,
                                     "exempt_roles": ["auditor"]})
    acid.alter_set_mask(t, "balance", {"fn": "bucket", "width": 1000})
    acid.alter_set_mask(t, "region", {"fn": "const", "value": "***"})
    assert t.policies_rev() == 4

    got = {r["id"]: r for r in
           acid.read_policy_spark(spark, t, dv_key="id").collect()}
    import hashlib
    assert got[1]["name"] == hashlib.md5(b"alice").hexdigest()
    assert got[5]["name"] is None                  # NULL propagates
    assert got[1]["phone"] == "****7788"
    assert got[4]["phone"] == "****x7"             # shorter than keep_last
    assert got[3]["phone"] is None
    assert got[1]["balance"] == 1000
    assert got[2]["balance"] == -1000              # floor, not truncate
    assert got[4]["balance"] is None
    assert got[1]["region"] == "***" and got[5]["region"] is None

    # exempt role sees raw for ITS policies only (balance/region masks
    # have no exemptions — they still apply)
    aud = {r["id"]: r for r in
           acid.read_policy_spark(spark, t, role="auditor",
                                  dv_key="id").collect()}
    assert aud[1]["name"] == "alice" and aud[1]["phone"] == "555-0101-7788"
    assert aud[1]["balance"] == 1000 and aud[1]["region"] == "***"

    # privileged storage read is ungoverned by design
    raw = {r["id"]: r for r in
           acid.read_snapshot_spark(spark, t, dv_key="id").collect()}
    assert raw[1]["name"] == "alice" and raw[1]["balance"] == 1234

    # null-mask form: typed NULL
    acid.alter_set_mask(t, "name", {"fn": "null"})
    got2 = acid.read_policy_spark(spark, t, dv_key="id")
    assert [f.dataType.simpleString()
            for f in got2.schema if f.name == "name"] == ["string"]
    assert {r["name"] for r in got2.collect()} == {None}


def test_mask_spelling_matches_duckdb(spark):
    """The portability bet itself: every mask form computed by Spark
    equals DuckDB's spelling of it — md5(CAST(c AS VARCHAR)),
    '****' || right(c, n) (short strings included), and the
    non-negative-mod floor bucket (negative values included)."""
    import duckdb

    t = _seed(spark)
    acid.alter_set_mask(t, "name", {"fn": "hash"})
    acid.alter_set_mask(t, "phone", {"fn": "partial", "keep_last": 4})
    acid.alter_set_mask(t, "balance", {"fn": "bucket", "width": 1000})
    got = acid.read_policy_spark(spark, t, dv_key="id").select(
        "id", "name", "phone", "balance").orderBy("id")

    people = _people_df(spark).toPandas()  # noqa: F841 (duckdb scans it)
    want = duckdb.sql("""
        SELECT id,
               md5(CAST(name AS VARCHAR)) AS name,
               '****' || right(phone, 4) AS phone,
               balance - ((balance % 1000) + 1000) % 1000 AS balance
        FROM people ORDER BY id
    """).fetchall()
    have = [tuple(r) for r in got.collect()]
    assert have == [tuple(r) for r in want]


def test_row_filter_null_semantics_and_conjunction(spark):
    t = _seed(spark)
    # range clause without not_null: NULL balances PASS (constraint DSL)
    acid.alter_set_row_filter(t, "pos", {"col": "balance", "min": 0})
    ids = {r["id"] for r in
           acid.read_policy_spark(spark, t, dv_key="id").collect()}
    assert ids == {1, 3, 4, 5}  # bob (-250) filtered; dan (NULL) passes

    # adding not_null drops the NULL row too
    acid.alter_set_row_filter(t, "pos", {"col": "balance", "min": 0,
                                         "not_null": True})
    ids = {r["id"] for r in
           acid.read_policy_spark(spark, t, dv_key="id").collect()}
    assert ids == {1, 3, 5}

    # second filter ANDs
    acid.alter_set_row_filter(t, "north", {"col": "region",
                                           "isin": ["north"]})
    ids = {r["id"] for r in
           acid.read_policy_spark(spark, t, dv_key="id").collect()}
    assert ids == {1, 3, 5}  # region NULL (id 5) passes isin w/o not_null

    # exempt role skips its filter (drop the other so the sets differ)
    acid.alter_drop_row_filter(t, "north")
    acid.alter_set_row_filter(t, "pos", {"col": "balance", "min": 0,
                                         "not_null": True,
                                         "exempt_roles": ["finance"]})
    ids = {r["id"] for r in
           acid.read_policy_spark(spark, t, role="finance",
                                  dv_key="id").collect()}
    assert ids == {1, 2, 3, 4, 5}
    ids = {r["id"] for r in
           acid.read_policy_spark(spark, t, dv_key="id").collect()}
    assert ids == {1, 3, 5}  # the default role still filters


def test_row_filter_prunes_files_off_manifest(spark):
    """A not_null range filter drops files from the PLAN via manifest
    min/max stats — RLS as file skipping. Pruned read ≡ full read +
    predicate (conservativeness), and at least one file is provably
    never opened."""
    from pyspark.sql import functions as F

    t = TableLog(_tmp_table())
    t.init(key="id", n_buckets=1)
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 10).alias("score"))
    acid.write_initial_spark(spark, t, df, "id", n_buckets=1)
    # appends create distinct files with disjoint score ranges + stats
    for lo in (1000, 2000, 3000):
        chunk = spark.range(lo, lo + 1000).select(
            F.col("id"), (F.col("id") * 10).alias("score"))
        acid.append_spark(spark, t, chunk, "id", 1,
                          stats_cols=("score",))
    acid.alter_set_row_filter(t, "hi", {"col": "score", "not_null": True,
                                        "min": 25000})
    _, filters = acid._applicable_policies(t, None)
    kept, pruned = acid._policy_pruned_paths(t, filters, None)
    # the append whose score range tops out below 25000 is provably
    # impossible; the stat-less initial file is conservatively kept
    assert pruned >= 1, (kept, pruned)

    got = acid.read_policy_spark(spark, t, dv_key="id")
    want = acid.read_snapshot_spark(spark, t, dv_key="id").filter(
        F.col("score") >= 25000)
    assert _rows(got) == _rows(want)
    assert got.count() == 1500


def test_current_policy_governs_time_travel_and_dvs(spark):
    t = _seed(spark)
    v0 = t.version()
    # DV-delete id 2, THEN add the mask
    keys = _people_df(spark).filter("id = 2").select("id")
    acid.delete_keys_spark(spark, t, keys, "id", 4, "deleter")
    acid.alter_set_mask(t, "phone", {"fn": "partial", "keep_last": 4})

    head = {r["id"]: r for r in
            acid.read_policy_spark(spark, t, dv_key="id").collect()}
    assert 2 not in head and head[1]["phone"] == "****7788"

    # time travel to BEFORE the delete: row 2 is back, but TODAY's mask
    # still applies — old versions are not an escape hatch
    old = {r["id"]: r for r in
           acid.read_policy_spark(spark, t, version=v0,
                                  dv_key="id").collect()}
    assert old[2]["phone"] == "****6655"
    assert all(r["phone"] is None or r["phone"].startswith("****")
               for r in old.values())


def test_change_feed_is_policy_enforced(spark):
    t = _seed(spark)
    acid.alter_set_mask(t, "phone", {"fn": "hash",
                                     "exempt_roles": ["auditor"]})
    acid.alter_set_row_filter(t, "north", {"col": "region",
                                           "isin": ["north"],
                                           "not_null": True,
                                           "exempt_roles": ["auditor"]})
    feed = acid.table_changes_policy_spark(spark, t, from_version=0)
    rows = feed.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r["region"] for r in rows} == {"north"}  # filter applied
    import hashlib
    want = hashlib.md5(b"555-0101-7788").hexdigest()
    assert {r["phone"] for r in rows if r["id"] == 1} == {want}

    aud = acid.table_changes_policy_spark(spark, t, role="auditor",
                                          from_version=0).collect()
    assert len(aud) == 5
    assert {r["phone"] for r in aud if r["id"] == 1} == {"555-0101-7788"}


def test_mask_follows_rename_drop_requires_release(spark):
    t = _seed(spark)
    acid.alter_set_mask(t, "phone", {"fn": "partial", "keep_last": 2})
    acid.alter_set_row_filter(t, "north", {"col": "region",
                                           "isin": ["north"]})
    acid.alter_rename_column(t, "phone", "contact")
    acid.alter_rename_column(t, "region", "zone")
    pol = t.policies()
    assert set(pol["masks"]) == {"contact"}
    assert pol["row_filters"]["north"]["col"] == "zone"
    got = {r["id"]: r for r in
           acid.read_policy_spark(spark, t, dv_key="id").collect()}
    assert got[1]["contact"] == "****88"  # mask survived the rename

    with pytest.raises(ValueError, match="mask"):
        acid.alter_drop_column(t, "contact")
    with pytest.raises(ValueError, match="row filter"):
        acid.alter_drop_column(t, "zone")
    acid.alter_drop_mask(t, "contact")
    acid.alter_drop_row_filter(t, "north")
    acid.alter_drop_column(t, "contact")  # released → allowed


def test_alter_validation(spark):
    from pyspark.sql import functions as F

    t = TableLog(_tmp_table())
    t.init(key="id", n_buckets=2)
    df = spark.range(0, 10).select(
        "id", F.col("id").cast("double").alias("ratio"),
        (F.col("id") % 2 == 0).alias("flag"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("user"))
    acid.write_initial_spark(spark, t, df, "id", n_buckets=2)

    with pytest.raises(ValueError, match="engine-specific"):
        acid.alter_set_mask(t, "ratio", {"fn": "hash"})
    with pytest.raises(ValueError, match="engine-specific"):
        # bool stringifies 'true' in Spark/DuckDB but 'True' in pandas
        acid.alter_set_mask(t, "flag", {"fn": "hash"})
    with pytest.raises(ValueError, match="string"):
        acid.alter_set_mask(t, "id", {"fn": "partial", "keep_last": 2})
    with pytest.raises(ValueError, match="integer"):
        acid.alter_set_mask(t, "user", {"fn": "bucket", "width": 10})
    with pytest.raises(ValueError, match="mask fn"):
        acid.alter_set_mask(t, "user", {"fn": "redact"})
    with pytest.raises(ValueError, match="no such column"):
        acid.alter_set_mask(t, "ghost", {"fn": "null"})
    with pytest.raises(ValueError, match="unknown row filter"):
        acid.alter_set_row_filter(t, "f", {"col": "id", "like": "x"})
    with pytest.raises(ValueError, match="at least one"):
        acid.alter_set_row_filter(t, "f", {"col": "id"})
    acid.alter_set_mask(t, "user", {"fn": "hash"})  # valid forms pass
    acid.alter_set_mask(t, "id", {"fn": "bucket", "width": 4})


def test_facade_governed_read(spark):
    path = _tmp_table()
    t = Table.create(spark, path, _people_df(spark), key="id",
                     n_buckets=4)
    t.set_mask("phone", {"fn": "partial", "keep_last": 4,
                         "exempt_roles": ["auditor"]})
    t.set_row_filter("north", {"col": "region", "isin": ["north"],
                               "not_null": True,
                               "exempt_roles": ["auditor"]})
    assert set(t.policies()["masks"]) == {"phone"}

    got = {r["id"]: r for r in t.read().collect()}
    assert set(got) == {1, 3} and got[1]["phone"] == "****7788"
    aud = {r["id"]: r for r in t.read(role="auditor").collect()}
    assert len(aud) == 5 and aud[1]["phone"] == "555-0101-7788"

    feed = t.change_feed(from_version=0)
    assert {r["region"] for r in feed.collect()} == {"north"}

    pdf = t.read_pandas()
    assert sorted(pdf["id"].tolist()) == [1, 3]
    assert set(pdf.loc[pdf["id"] == 1, "phone"]) == {"****7788"}

    with pytest.raises(ValueError, match="privileged"):
        t.read(apply_dvs=False)

    t.drop_mask("phone")
    t.drop_row_filter("north")
    assert t.read().count() == 5  # ungoverned again → raw fast path


def test_policy_cross_client_differential(spark):
    """Seeded random frames through every mask form + a row filter:
    the Spark governed read and the engine-free pandas governed read
    must return the SAME rows and values — the cross-client contract
    that makes policies trustworthy from either client (the
    constraint-DSL differential discipline)."""
    import random

    rng = random.Random(20260815)
    n = 300
    rows = []
    for i in range(n):
        rows.append((
            i,
            None if rng.random() < 0.1 else
            "".join(rng.choice("abcdefgh") for _ in range(
                rng.randint(1, 12))),
            None if rng.random() < 0.1 else
            rng.randint(-5000, 5000),
            None if rng.random() < 0.1 else
            rng.choice(["gold", "silver", "bronze"]),
        ))
    df = spark.createDataFrame(
        rows, "id bigint, tag string, amount bigint, tier string")
    t = TableLog(_tmp_table())
    t.init(key="id", n_buckets=4)
    acid.write_initial_spark(spark, t, df, "id", n_buckets=4)
    # DV-delete a slice so the pandas DV fold is exercised too
    acid.delete_keys_spark(
        spark, t, df.filter("id % 13 = 0").select("id"), "id", 4, "d")

    acid.alter_set_mask(t, "tag", {"fn": "partial", "keep_last": 3})
    acid.alter_set_mask(t, "amount", {"fn": "bucket", "width": 250})
    acid.alter_set_mask(t, "tier", {"fn": "hash"})
    acid.alter_set_row_filter(t, "amt", {"col": "amount", "min": -4000,
                                         "max": 4000})

    sdf = acid.read_policy_spark(spark, t, dv_key="id").toPandas()
    pdf = acid.read_policy_pandas(t)

    def norm(frame):
        out = []
        for r in frame[["id", "tag", "amount", "tier"]].itertuples(
                index=False):
            out.append(tuple(
                None if pd.isna(v) else
                (int(v) if isinstance(v, (int, float)) and not
                 isinstance(v, bool) else v)
                for v in r))
        return sorted(out)

    a, b = norm(sdf), norm(pdf)
    assert len(a) == len(b) and a == b
    assert len(a) > 200  # the filter kept a real population


def test_governed_plan_stays_jvm_side(spark):
    """Masks and filters are ordinary Catalyst expressions: the
    governed read's plan contains no Python evaluation, and the
    residual row-filter predicate reaches the parquet scan as a
    pushed filter."""
    from distribot_spark.plans.inspect import (
        pushed_filters,
        uses_python_eval,
    )

    t = _seed(spark)
    acid.alter_set_mask(t, "name", {"fn": "hash"})
    acid.alter_set_row_filter(t, "pos", {"col": "balance", "min": 0,
                                         "not_null": True})
    df = acid.read_policy_spark(spark, t, dv_key="id")
    assert not uses_python_eval(df)
    filters = " ".join(pushed_filters(df))
    assert "balance" in filters, filters


def test_clone_carries_policies_and_sql_view_is_governed(spark):
    """Security properties at the edges: a CLONE of a governed table is
    born governed (policies ride the wholesale meta copy — a zero-copy
    branch is not an unmasking path), and the SQL facade (to_view)
    serves the governed read to plain spark.sql consumers."""
    from distribot_spark.sources import clone_table
    from distribot_spark.sources.table import Table

    t = _seed(spark)
    acid.alter_set_mask(t, "phone", {"fn": "partial", "keep_last": 4,
                                     "exempt_roles": ["auditor"]})
    dst = _tmp_table()
    os.rmdir(dst)
    clone_table(t, dst)
    c = acid.TableLog(dst)
    assert c.policies()["masks"]["phone"]["fn"] == "partial"
    got = {r["id"]: r for r in
           acid.read_policy_spark(spark, c, dv_key="id").collect()}
    assert got[1]["phone"] == "****7788"

    tab = Table.for_path(spark, t.path, key="id")
    tab.to_view("gov_people")
    rows = spark.sql(
        "SELECT id, phone FROM gov_people ORDER BY id").collect()
    assert rows[0]["phone"] == "****7788"
    tab.to_view("gov_people", role="auditor")
    rows = spark.sql(
        "SELECT id, phone FROM gov_people ORDER BY id").collect()
    assert rows[0]["phone"] == "555-0101-7788"
    spark.catalog.dropTempView("gov_people")
