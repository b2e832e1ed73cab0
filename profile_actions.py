"""Count Spark JOBS during one constrained MERGE and one txn
stage_merge (evidence for the r9 session-2 action-count claims)."""
import os, sys, shutil
sys.path.insert(0, "/root/repo")
from distribot_spark.session import get_spark
from distribot_spark.catalog import load_table
from distribot_spark.sources import acid, txn
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="count_jobs")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

def jobs():
    return sc._jsc.sc().dagScheduler().nextJobId()

root = "/root/repo/.tmp/count_jobs"
shutil.rmtree(root, ignore_errors=True); os.makedirs(root)
orders = load_table(spark, SF, "orders").select(
    F.col("o_orderkey").alias("k"),
    F.col("o_totalprice").alias("price")).localCheckpoint()

# --- constrained (quarantine) MERGE ---
t = acid.TableLog(os.path.join(root, "tq"))
t.init(key="k", n_buckets=8,
       constraints={"price_pos": {"col": "price", "min": 0,
                                  "on_violation": "quarantine"}})
up = orders.filter(F.col("k") % 8 == 3).withColumn(
    "price", F.when(F.col("k") % 16 == 3, -F.col("price"))
    .otherwise(F.col("price")))
j0 = jobs()
st = acid.merge_upsert_spark(spark, t, up, "k")
j1 = jobs()
print(f"constrained_merge_jobs={j1-j0} quarantined={st['quarantined']}")

# --- txn stage_merge participant ---
t2 = acid.TableLog(os.path.join(root, "tm"))
t2.init(key="k", n_buckets=8)
acid.write_initial_spark(spark, t2, orders, "k", 8)
up2 = orders.filter(F.col("k") % 8 == 5).withColumn(
    "price", F.col("price") + 1)
j0 = jobs()
e = txn.stage_merge_spark(spark, t2, up2, "k")
j1 = jobs()
print(f"txn_stage_merge_jobs={j1-j0} adds={len(e['adds'])} upd={len(e['updates_files'])}")
spark.stop()
