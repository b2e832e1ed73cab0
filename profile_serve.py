"""Phase profiler for l2_minhash_serve at sf0.1 (round-9 profiling tool)."""
import os, shutil, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from distribot_spark.session import get_spark
from distribot_spark.catalog import load_table
from distribot_spark.operators import index as rindex
from distribot_spark.streaming.replay import TMP_ROOT
import pyspark.sql.functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile_serve")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def run(tag):
    t = {}
    def clock(name, fn):
        t0 = time.time()
        r = fn()
        t[name] = time.time() - t0
        return r
    ix_dir = os.path.join(TMP_ROOT, f"prof_mh_{tag}")
    shutil.rmtree(ix_dir, ignore_errors=True)
    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") % 3 > 0)
    shard = docs.filter(F.col("doc_id") % 3 == 0)
    clock("build", lambda: rindex.build_minhash_index(base, ix_dir))
    base_pairs = rindex.minhash_index_pairs(spark, ix_dir, threshold=0.5)
    clock("base_pairs_noop", lambda: noop(base_pairs))
    rel = clock("shard_rel", lambda: rindex.shard_minhash_relations(spark, ix_dir, shard))
    clock("append", lambda: rindex.append_minhash_shard(spark, ix_dir, shard, relations=rel))
    shard_pairs = clock("probe_plan", lambda: rindex.probe_minhash_index(spark, ix_dir, shard, threshold=0.5, relations=rel))
    out = base_pairs.unionByName(shard_pairs).dropDuplicates(["da", "db"]).orderBy("da", "db")
    clock("final_noop", lambda: noop(out))
    tot = sum(t.values())
    print(f"[{tag}] total={tot:.2f} " + " ".join(f"{k}={v:.2f}" for k, v in t.items()))

run("w1")
run("w2")
run("w3")
spark.stop()
