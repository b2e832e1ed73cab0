"""Shared CDF-consumer pieces: the 5-version demo history, the signed
delta fold, and the final-state oracle — used by the batch incremental
view (`queries/sources.py: source_cdf_incremental_view`) and its
streaming twin (`queries/streaming.py: s24_stream_cdf_source`). Lives
in its own registration-free module so either query module can import
it without perturbing registry order (imports of query modules REGISTER
queries; this module must stay side-effect-free)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribot_spark.catalog import load_table


def build_cdf_demo_table(spark, sf_dir, out):
    """The shared 5-version ACID history the CDF consumers fold: v0
    seed = full orders, v1 doubled prices for keys ≡0 (mod 1000), v2
    ten synthetic inserts, v3 tombstone-deletes keys ≡8 (mod 1000), v4
    physical purge. Final logical state is what `CDF_VIEW_ORACLE`
    aggregates."""
    import shutil

    from distribot_spark.sources import (
        TableLog,
        merge_upsert_spark,
        purge_tombstones_pandas,
        write_initial_spark,
    )

    shutil.rmtree(out, ignore_errors=True)
    table = TableLog(out)
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_totalprice",
        F.lit(1).alias("v"), F.lit("u").alias("op"),
    )
    write_initial_spark(spark, table, base, "o_orderkey", n_buckets=16)

    def wave(mod_rem: int, mult, v: int, op: str):
        return (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 1000 == mod_rem)
            .select(
                "o_orderkey",
                F.round(F.col("o_totalprice").cast("decimal(12,2)") * mult, 2)
                .cast("double").alias("o_totalprice"),
                F.lit(v).alias("v"), F.lit(op).alias("op"),
            )
        )

    inserts = spark.range(10).select(
        (F.lit(1_000_000_000) + F.col("id")).alias("o_orderkey"),
        (F.lit(100.0) + F.col("id")).alias("o_totalprice"),
        F.lit(1).alias("v"), F.lit("u").alias("op"),
    )
    merge_upsert_spark(spark, table, wave(0, 2, 2, "u"),
                       "o_orderkey", 16, "upserts", version="v")
    merge_upsert_spark(spark, table, inserts,
                       "o_orderkey", 16, "inserts", version="v")
    merge_upsert_spark(spark, table, wave(8, 1, 2, "d"),
                       "o_orderkey", 16, "deletes", version="v")
    purge_tombstones_pandas(table, "op")
    return table


def cdf_view_deltas(ch):
    """Change-feed rows → signed view deltas (g, dcnt, dcents): insert
    ⇒ (+1, +cents), delete ⇒ (−1, −cents), update ⇒ ±cents across the
    pre/post pair. op='d' tombstone payloads carry ZERO weight — the
    logical delete lands at the tombstone UPDATE (its live pre-image
    subtracts), so the later physical purge's CDF deletes fold to
    nothing. Integer cents keep the fold exact in any order/batching
    (the repo's float-SUM quantization rule) — which is exactly what
    lets the streaming twin (s24) equal the batch fold bit-for-bit."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    live_row = F.col("op").isNull() | (F.col("op") != "d")
    pre = F.col("_change_type").isin("update_pre", "delete")
    return ch.select(
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("int").alias("g"),
        F.when(~live_row, F.lit(0))  # tombstone payloads carry no weight
        .when(pre, F.lit(-1)).otherwise(F.lit(1)).alias("dcnt"),
        F.when(~live_row, F.lit(0))
        .when(pre, -cents).otherwise(cents).alias("dcents"),
    )


#: final-state aggregate of the build_cdf_demo_table history — shared by
#: source_cdf_incremental_view and s24_stream_cdf_source.
CDF_VIEW_ORACLE = """
    WITH ua AS (SELECT o_orderkey,
                       CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 2, 2)
                            AS DOUBLE) AS p
                FROM orders WHERE o_orderkey % 1000 = 0),
    fin AS (
      SELECT o.o_orderkey, COALESCE(ua.p, o.o_totalprice) AS p
      FROM orders o LEFT JOIN ua ON o.o_orderkey = ua.o_orderkey
      WHERE o.o_orderkey % 1000 <> 8
      UNION ALL
      SELECT 1000000000 + i, CAST(100 + i AS DOUBLE) FROM range(10) t(i))
    SELECT CAST(o_orderkey % 7 AS INT) AS g, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(p * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM fin GROUP BY 1 ORDER BY g
"""


# ---- shared MATVIEW workload (sources/matview.py consumers) ----------
#
# One history, two consumers, one relational definition: the batch
# refresh (queries/sources.py: source_acid_matview) and the streaming
# fold (queries/streaming.py: s35_stream_matview) both run THIS
# workload, so their oracles are the same SQL modulo the exposed
# aggregate columns (the streaming view omits min/max — those need the
# pinned-version recompute only the batch path has).

def matview_demo_orders(spark, sf_dir):
    """Orders with prices quantized to cents BIGINT — the matview
    exactness discipline (it rejects float sums outright)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"))


def seed_matview_base(spark, sf_dir, out):
    """v0 of the shared workload: two thirds of orders (keys %3 != 2)."""
    import shutil

    from distribot_spark.sources import TableLog, write_initial_spark

    shutil.rmtree(out, ignore_errors=True)
    base = TableLog(out)
    orders = matview_demo_orders(spark, sf_dir)
    write_initial_spark(spark, base,
                        orders.filter(F.col("o_orderkey") % 3 != 2),
                        "o_orderkey", n_buckets=8)
    return base


def apply_matview_workload(spark, sf_dir, base):
    """v1 insert MERGE (the missing third), v2 update MERGE (price
    bump +1000.00 for keys %10, priority GROUP MOVE to '1-URGENT' for
    keys %100=1), v3 deletion-vector DELETE (keys %7)."""
    from distribot_spark.sources import delete_keys_spark, merge_upsert_spark

    orders = matview_demo_orders(spark, sf_dir)
    merge_upsert_spark(
        spark, base, orders.filter(F.col("o_orderkey") % 3 == 2),
        "o_orderkey")
    touched = orders.filter((F.col("o_orderkey") % 10 == 0)
                            | (F.col("o_orderkey") % 100 == 1))
    merge_upsert_spark(
        spark, base,
        touched.select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 100 == 1, F.lit("1-URGENT"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
            (F.col("cents")
             + F.when(F.col("o_orderkey") % 10 == 0, F.lit(100000))
             .otherwise(F.lit(0))).alias("cents")),
        "o_orderkey")
    delete_keys_spark(
        spark, base,
        orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey"),
        "o_orderkey")


#: the workload's final state, relationally (the CTE both oracles share)
MATVIEW_FINAL_CTE = """
    WITH final AS (
        SELECT CASE WHEN o_orderkey % 100 = 1 THEN '1-URGENT'
                    ELSE o_orderpriority END AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 + CASE WHEN o_orderkey % 10 = 0 THEN 100000
                        ELSE 0 END AS cents
        FROM orders WHERE o_orderkey % 7 <> 0
    )
"""

MATVIEW_ORACLE_FULL = MATVIEW_FINAL_CTE + """
    SELECT pri, COUNT(*) AS cnt,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents,
           CAST(CAST(SUM(cents) AS BIGINT) // COUNT(*) AS BIGINT)
             AS avg_cents
    FROM final GROUP BY pri ORDER BY pri
"""

MATVIEW_ORACLE_SUMS = MATVIEW_FINAL_CTE + """
    SELECT pri, COUNT(*) AS cnt,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(CAST(SUM(cents) AS BIGINT) // COUNT(*) AS BIGINT)
             AS avg_cents
    FROM final GROUP BY pri ORDER BY pri
"""


# ---- shared JOIN-MATVIEW workload (fact ⋈ dim IVM consumers) ---------
#
# One two-table history, two consumers, one relational definition: the
# batch join refresh (queries/sources.py: source_acid_matview_join)
# and the interleaved streaming fold (queries/streaming.py:
# s36_stream_matview_join) both run THIS workload — the full CDF
# alphabet on EACH side (fact insert / update+fk-move / DV delete;
# dim attr update (mass group move) / insert with referring facts /
# delete with dangling facts dropping out under INNER-join semantics).

def seed_join_matview_tables(spark, sf_dir, root):
    """v0 of both sides: fact = two thirds of orders as
    (o_orderkey, fk=o_custkey, cents); dim = all customers as
    (dk, seg)."""
    import os
    import shutil

    from distribot_spark.sources import TableLog, write_initial_spark

    shutil.rmtree(root, ignore_errors=True)
    fact = TableLog(os.path.join(root, "fact"))
    dim = TableLog(os.path.join(root, "dim"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("fk"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"))
    write_initial_spark(spark, fact,
                        orders.filter(F.col("o_orderkey") % 3 != 2),
                        "o_orderkey", n_buckets=8)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("dk"),
        F.col("c_mktsegment").alias("seg"))
    write_initial_spark(spark, dim, cust, "dk", n_buckets=4)
    return fact, dim


def apply_join_matview_workload(spark, sf_dir, fact, dim):
    """fact v1 insert (missing third), fact v2 update (cents bump for
    keys %10=0, FK MOVE to (fk+13) % max(dk) + 1 for keys %100=1),
    fact v3 DV delete (keys %7); dim v1 attr update (seg='MOVED' for
    dk %5=0 — a mass group move), dim v2 insert (5 'NEW' dims), fact
    v4 insert (5 synthetic facts referencing them), dim v3 delete
    (dk %1000=7 — their facts dangle and drop from the view)."""
    from distribot_spark.sources import delete_keys_spark, merge_upsert_spark

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("fk"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"))
    maxc = load_table(spark, sf_dir, "customer").agg(
        F.max("c_custkey")).collect()[0][0]
    merge_upsert_spark(spark, fact,
                       orders.filter(F.col("o_orderkey") % 3 == 2),
                       "o_orderkey")
    touched = orders.filter((F.col("o_orderkey") % 10 == 0)
                            | (F.col("o_orderkey") % 100 == 1))
    merge_upsert_spark(
        spark, fact,
        touched.select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 100 == 1,
                   (F.col("fk") + 13) % F.lit(maxc) + 1)
            .otherwise(F.col("fk")).alias("fk"),
            (F.col("cents")
             + F.when(F.col("o_orderkey") % 10 == 0, F.lit(100000))
             .otherwise(F.lit(0))).alias("cents")),
        "o_orderkey")
    delete_keys_spark(
        spark, fact,
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey"), "o_orderkey")
    cust = load_table(spark, sf_dir, "customer")
    merge_upsert_spark(
        spark, dim,
        cust.filter(F.col("c_custkey") % 5 == 0).select(
            F.col("c_custkey").alias("dk"),
            F.lit("MOVED").alias("seg")), "dk")
    merge_upsert_spark(
        spark, dim,
        spark.range(5).select(
            (F.lit(9000000) + F.col("id")).alias("dk"),
            F.lit("NEW").alias("seg")), "dk")
    merge_upsert_spark(
        spark, fact,
        spark.range(5).select(
            (F.lit(900000000) + F.col("id")).alias("o_orderkey"),
            (F.lit(9000000) + F.col("id") % 5).alias("fk"),
            (F.lit(1000) + F.col("id")).cast("long").alias("cents")),
        "o_orderkey")
    delete_keys_spark(
        spark, dim,
        cust.filter(F.col("c_custkey") % 1000 == 7)
        .select(F.col("c_custkey").alias("dk")), "dk")


#: the two-table workload's final joined state, relationally
JOIN_MATVIEW_FINAL_CTE = """
    WITH maxc AS (SELECT MAX(c_custkey) AS m FROM customer),
    fct AS (
      SELECT CASE WHEN o_orderkey % 100 = 1
                  THEN (o_custkey + 13) % (SELECT m FROM maxc) + 1
                  ELSE o_custkey END AS fk,
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 10 = 0 THEN 100000
                      ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT 9000000 + (i % 5), CAST(1000 + i AS BIGINT)
      FROM range(5) t(i)
    ),
    dm AS (
      SELECT c_custkey AS dk,
             CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 1000 <> 7
      UNION ALL
      SELECT 9000000 + i, 'NEW' FROM range(5) t(i)
    ),
    joined AS (SELECT seg, cents FROM fct JOIN dm ON fk = dk)
"""

JOIN_MATVIEW_ORACLE_FULL = JOIN_MATVIEW_FINAL_CTE + """
    SELECT seg, COUNT(*) AS cnt,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM joined GROUP BY seg ORDER BY seg
"""

JOIN_MATVIEW_ORACLE_SUMS = JOIN_MATVIEW_FINAL_CTE + """
    SELECT seg, COUNT(*) AS cnt,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM joined GROUP BY seg ORDER BY seg
"""
