"""Isolate the per-MERGE constant at sf0.1 (round-9 profiling tool)."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distribot_spark.session import get_spark  # noqa: E402
from distribot_spark.catalog import load_table  # noqa: E402
from distribot_spark.sources import acid  # noqa: E402
from distribot_spark.streaming.replay import TMP_ROOT  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"


def main():
    spark = get_spark(app_name="profile_merge")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(TMP_ROOT, "prof_merge")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"))
    table = acid.TableLog(os.path.join(root, "t"))
    table.init(key="k", n_buckets=8)
    acid.write_initial_spark(spark, table, orders, "k", 8)
    # a batch like one s28/s36 micro-batch: ~1/8 of the keys
    up = orders.filter(F.col("k") % 8 == 3).withColumn(
        "price", F.col("price") + 1).localCheckpoint()
    n = up.count()
    print("batch rows:", n)

    for rep in range(3):
        t0 = time.time()
        st = acid.merge_upsert_spark(spark, table, up, writer=f"a{rep}")
        t1 = time.time()
        st2 = acid.merge_upsert_spark(
            spark, table, up, writer=f"b{rep}",
            touched_buckets=set(range(8)))
        t2 = time.time()
        # cost of the distinct-collect alone
        b = {int(r["_pb"]) for r in up.withColumn(
            "_pb", F.expr("pmod(xxhash64(k), 8)")).select("_pb")
            .distinct().collect()}
        t3 = time.time()
        print(f"rep{rep}: merge={t1-t0:.3f} merge_touched={t2-t1:.3f} "
              f"distinct_collect={t3-t2:.3f} (buckets {len(b)})")
    spark.stop()


if __name__ == "__main__":
    main()
