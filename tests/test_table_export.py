"""Snapshot export for external readers (acid.export_snapshot): one
snapshot as a plain parquet directory readable by ANY engine with a
glob. Covers: zero-copy hardlinks for clean files (inode-verified),
materialization of DV'd / renamed / dropped-column files into logical
form, an actual second engine (DuckDB) reading the export and agreeing
with the Spark read row-for-row, snapshot isolation (later commits,
OPTIMIZE, vacuum never disturb the export), time-travel exports, and
the refuse-nonempty / expired-version rails.
"""

import os
import tempfile

import duckdb
import pandas as pd
import pytest

from distribot_spark.sources import acid
from distribot_spark.sources.acid import TableLog


def _tmp(prefix):
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.tmp")


def _seed(spark, n=500, n_buckets=4):
    from pyspark.sql import functions as F

    t = TableLog(_tmp("exp_"))
    t.init(key="id", n_buckets=n_buckets)
    df = spark.range(0, n).select(
        "id", (F.col("id") * 7 % 1000).alias("score"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("user"))
    acid.write_initial_spark(spark, t, df, "id", n_buckets=n_buckets)
    return t


def _duck_rows(dst):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{dst}/*.parquet', "
        "union_by_name=true) ORDER BY id"
    ).fetchall()


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_export_clean_table_is_all_hardlinks(spark):
    t = _seed(spark)
    dst = _tmp("expdst_")
    os.rmdir(dst)
    st = acid.export_snapshot(t, dst)
    assert st["materialized"] == 0 and st["hardlinked"] == st["files"] > 0

    # zero-copy proof: same inode as the table's data file
    for f in os.listdir(dst):
        if f.endswith(".parquet"):
            assert (os.stat(os.path.join(dst, f)).st_ino
                    == os.stat(t.data_path(f)).st_ino)

    # the second-engine contract: DuckDB reads the plain directory and
    # agrees with the Spark snapshot read exactly
    want = _spark_rows(
        acid.read_snapshot_spark(spark, t, dv_key="id").select(
            "id", "score", "user"))
    have = sorted(_duck_rows(dst))
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{dst}/*.parquet') LIMIT 0"
    ).columns
    idx = [cols.index(c) for c in ("id", "score", "user")]
    assert sorted(tuple(r[i] for i in idx) for r in have) == want


def test_export_materializes_dvs_renames_and_drops(spark):
    from pyspark.sql import functions as F

    t = _seed(spark)
    # DV-delete a slice, rename a column, drop another — every file now
    # needs translation into logical form
    acid.delete_keys_spark(
        spark, t,
        spark.range(0, 500).filter("id % 11 = 0").select("id"),
        "id", 4, "d")
    acid.alter_rename_column(t, "score", "points")
    acid.alter_drop_column(t, "user")

    dst = _tmp("expdst_")
    os.rmdir(dst)
    st = acid.export_snapshot(t, dst)
    assert st["materialized"] == st["files"] > 0
    assert st["hardlinked"] == 0

    want = acid.read_snapshot_spark(spark, t, dv_key="id")
    assert set(want.columns) == {"id", "points"}
    have = duckdb.sql(
        f"SELECT id, points FROM read_parquet('{dst}/*.parquet', "
        "union_by_name=true) ORDER BY id").fetchall()
    assert sorted(tuple(r) for r in have) == _spark_rows(
        want.select("id", "points"))
    # deleted keys are physically absent from the export
    assert not [r for r in have if r[0] % 11 == 0]
    # dropped physical column is nowhere in the exported bytes
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{dst}/*.parquet', "
        "union_by_name=true) LIMIT 0").columns
    assert "user" not in cols and "score" not in cols


def test_export_snapshot_isolation_and_time_travel(spark):
    from pyspark.sql import functions as F

    t = _seed(spark, n=200)
    v0 = t.version()
    dst0 = _tmp("expdst_")
    os.rmdir(dst0)
    acid.export_snapshot(t, dst0, version=v0)
    before = sorted(_duck_rows(dst0))

    # mutate heavily: append, DV-delete, OPTIMIZE (rewrites files),
    # expire + vacuum (unlinks replaced table files)
    extra = spark.range(200, 400).select(
        "id", (F.col("id") * 7 % 1000).alias("score"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("user"))
    acid.append_spark(spark, t, extra, "id", 4)
    acid.delete_keys_spark(
        spark, t, spark.range(0, 100).select("id"), "id", 4, "d")
    acid.optimize_table_spark(spark, t, "id", 4, "opt",
                              files_per_bucket=1)
    t.expire_snapshots(keep_last=1)
    t.vacuum(0.0)

    # the export is untouched: hardlinked inodes survive the vacuum
    assert sorted(_duck_rows(dst0)) == before
    assert len(before) == 200

    # a fresh head export reflects the mutations
    dst1 = _tmp("expdst_")
    os.rmdir(dst1)
    acid.export_snapshot(t, dst1)
    head = _duck_rows(dst1)
    ids = sorted(r[0] for r in head)
    assert ids == list(range(100, 400))

    # time travel below the retention floor refuses
    with pytest.raises(acid.SnapshotExpired):
        dst2 = _tmp("expdst_")
        os.rmdir(dst2)
        acid.export_snapshot(t, dst2, version=v0)


def test_export_refuses_nonempty_dir(spark):
    t = _seed(spark, n=50)
    dst = _tmp("expdst_")
    with open(os.path.join(dst, "junk"), "w") as fh:
        fh.write("x")
    with pytest.raises(ValueError, match="not empty"):
        acid.export_snapshot(t, dst)


def test_export_manifest_records_version_and_files(spark):
    import json

    t = _seed(spark, n=50)
    dst = _tmp("expdst_")
    os.rmdir(dst)
    st = acid.export_snapshot(t, dst)
    with open(st["manifest_path"]) as fh:
        m = json.load(fh)
    assert m["version"] == t.version()
    assert sorted(m["files"]) == sorted(
        f for f in os.listdir(dst) if f.endswith(".parquet"))
    assert m["union_by_name"] is True


def _gov_seed(spark):
    from pyspark.sql import functions as F

    from distribot_spark.sources import acid as a

    t = _seed(spark, n=400)
    a.delete_keys_spark(
        spark, t, spark.range(0, 400).filter("id % 17 = 0").select("id"),
        "id", 4, "d")
    a.alter_set_mask(t, "user", {"fn": "hash",
                                 "exempt_roles": ["partner"]})
    a.alter_set_row_filter(t, "hi", {"col": "score", "not_null": True,
                                     "min": 500,
                                     "exempt_roles": ["partner"]})
    return t


def test_governed_export_equals_governed_read(spark):
    """Secure data sharing: the governed export's bytes are exactly
    what the governed READ returns for the role — per-file policy
    application ≡ whole-table because masks/filters are row-local."""
    t = _gov_seed(spark)
    dst = _tmp("expdst_")
    os.rmdir(dst)
    st = acid.export_snapshot(t, dst, governed=True)
    assert st["hardlinked"] == 0  # masks force materialization

    have = duckdb.sql(
        f"SELECT id, score, user FROM read_parquet('{dst}/*.parquet', "
        "union_by_name=true)").fetchall()
    want = acid.read_policy_spark(spark, t, dv_key="id").select(
        "id", "score", "user")
    assert sorted(tuple(r) for r in have) == _spark_rows(want)
    # masked tokens, never raw user strings, in the exported bytes
    assert all(len(r[2]) == 32 for r in have)
    assert all(r[1] >= 500 for r in have)


def test_governed_export_exempt_role_degrades_to_raw_hardlinks(spark):
    t = _gov_seed(spark)
    # partner is exempt from BOTH policies; only the DV'd files need
    # materialization, the rest hardlink — the raw fast path
    dst = _tmp("expdst_")
    os.rmdir(dst)
    st = acid.export_snapshot(t, dst, governed=True, role="partner")
    assert st["hardlinked"] + st["materialized"] == st["files"]
    have = duckdb.sql(
        f"SELECT id, user FROM read_parquet('{dst}/*.parquet', "
        "union_by_name=true)").fetchall()
    assert sorted(r[1] for r in have) == sorted(
        "u" + str(i) for i in range(400) if i % 17 != 0)


def test_governed_export_prunes_disproven_files(spark):
    from pyspark.sql import functions as F

    t = TableLog(_tmp("exp_"))
    t.init(key="id", n_buckets=1)
    df = spark.range(0, 100).select(
        "id", (F.col("id") * 10).alias("score"))
    acid.write_initial_spark(spark, t, df, "id", n_buckets=1)
    for lo in (100, 200):
        acid.append_spark(
            spark, t,
            spark.range(lo, lo + 100).select(
                "id", (F.col("id") * 10).alias("score")),
            "id", 1, stats_cols=("score",))
    acid.alter_set_row_filter(t, "hi", {"col": "score", "not_null": True,
                                        "min": 2500})
    dst = _tmp("expdst_")
    os.rmdir(dst)
    st = acid.export_snapshot(t, dst, governed=True)
    # the 1000-1990 append is disproven by manifest stats: NOT exported
    assert st["pruned_out"] >= 1, st
    ids = sorted(r[0] for r in duckdb.sql(
        f"SELECT id FROM read_parquet('{dst}/*.parquet', "
        "union_by_name=true)").fetchall())
    assert ids == list(range(250, 300))


def test_detail_surfaces_policies(spark):
    from distribot_spark.sources.table import Table

    path = _tmp("expfac_")
    os.rmdir(path)
    from pyspark.sql import functions as F

    df = spark.range(0, 50).select(
        "id", F.concat(F.lit("u"), F.col("id").cast("string"))
        .alias("user"))
    t = Table.create(spark, path, df, key="id", n_buckets=2)
    t.set_mask("user", {"fn": "hash"})
    d = t.detail()
    assert d["policies"]["masks"]["user"]["fn"] == "hash"
    assert d["policies_rev"] == 1 and d["column_mapping"] == {}


def test_export_distributed_equals_driver(spark):
    """Materialization as a Spark job (spark=...) produces exactly the
    driver loop's export — same file set, same rows — for both the raw
    and the governed form; hardlinks stay driver-side either way."""
    import json

    t = _gov_seed(spark)
    d_drv = _tmp("expdst_")
    d_job = _tmp("expdst_")
    os.rmdir(d_drv)
    os.rmdir(d_job)
    st_drv = acid.export_snapshot(t, d_drv, governed=True)
    st_job = acid.export_snapshot(t, d_job, governed=True, spark=spark)
    assert {k: st_drv[k] for k in
            ("version", "files", "hardlinked", "materialized")} == \
        {k: st_job[k] for k in
            ("version", "files", "hardlinked", "materialized")}
    with open(st_drv["manifest_path"]) as fh:
        m_drv = json.load(fh)
    with open(st_job["manifest_path"]) as fh:
        m_job = json.load(fh)
    assert m_drv["files"] == m_job["files"]
    assert sorted(_duck_rows(d_drv)) == sorted(_duck_rows(d_job))

    # raw export too: only bucket 0 carries DVs, so its file
    # materializes via the job while the clean buckets hardlink on the
    # driver (inode check proves no task wrote them)
    t2 = _seed(spark, n=200)
    acid.delete_keys_spark(
        spark, t2,
        spark.range(0, 200).filter("id % 20 = 0").select("id"),
        "id", 4, "d")  # 20 % 4 == 0: every deleted key lives in bucket 0
    d2 = _tmp("expdst_")
    os.rmdir(d2)
    st2 = acid.export_snapshot(t2, d2, spark=spark)
    assert st2["hardlinked"] > 0 and st2["materialized"] > 0, st2
    n_linked = sum(
        1 for f in os.listdir(d2) if f.endswith(".parquet")
        and os.path.exists(t2.data_path(f))
        and os.stat(os.path.join(d2, f)).st_ino
        == os.stat(t2.data_path(f)).st_ino)
    assert n_linked == st2["hardlinked"]
