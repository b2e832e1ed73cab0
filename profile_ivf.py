import os, shutil, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from distribot_spark.session import get_spark
from distribot_spark.catalog import load_table
from distribot_spark.operators import index as rindex
from distribot_spark.streaming.replay import TMP_ROOT
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_ivf")
def noop(df): df.write.format("noop").mode("overwrite").save()
def run(tag):
    t={}
    def clock(n,f):
        t0=time.time(); r=f(); t[n]=time.time()-t0; return r
    ix=os.path.join(TMP_ROOT,f"prof_ivf_{tag}")
    shutil.rmtree(ix,ignore_errors=True)
    emb=load_table(spark,SF,"embeddings")
    queries=emb.filter(F.col("vec_id")<10)
    base=emb.filter((F.col("vec_id")>=10)&(F.col("vec_id")%2==0))
    shard=emb.filter((F.col("vec_id")>=10)&(F.col("vec_id")%2==1)).withColumn(
        "embedding",F.expr("transform(embedding, x -> x * 0.3 + 0.8)"))
    clock("build",lambda:rindex.build_ivf_index(base,ix,n_clusters=16))
    clock("append",lambda:rindex.append_ivf_shard(spark,ix,shard))
    clock("retrain",lambda:rindex.retrain_ivf_index(spark,ix,iters=3))
    out=clock("serve_plan",lambda:rindex.serve_ivf_topk(spark,ix,queries,k=5,n_probe=4).orderBy("qid","rnk"))
    clock("final_noop",lambda:noop(out))
    print(f"[{tag}] total={sum(t.values()):.2f} "+" ".join(f"{k}={v:.2f}" for k,v in t.items()))
for i in range(3): run(f"w{i}")
spark.stop()
