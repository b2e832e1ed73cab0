import os, shutil, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from distribot_spark.session import get_spark
from distribot_spark.catalog import load_table
from distribot_spark.operators import index as rindex
from distribot_spark.operators import dedup
from distribot_spark.streaming.replay import TMP_ROOT
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_rel")
docs = load_table(spark, SF, "documents")
shard = docs.filter(F.col("doc_id") % 3 == 0)
ix = os.path.join(TMP_ROOT, "prof_mh_w3")  # exists from previous run
for it in range(3):
    t0=time.time(); sh = dedup.shingle_hashes(shard, "text", "doc_id", 3); t1=time.time()
    shp = sh.localCheckpoint(eager=False); t2=time.time()
    bk = rindex._buckets_of_shingles(shp, 128, 32, 64); t3=time.time()
    bkp = bk.localCheckpoint(eager=False); t4=time.time()
    print(f"it{it}: shingle_plan={t1-t0:.3f} sh_ckpt={t2-t1:.3f} bucket_plan={t3-t2:.3f} bk_ckpt={t4-t3:.3f}")
spark.stop()
