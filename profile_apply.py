"""Fine-grained phase profiler for ONE matview join apply (r10 tool):
times the max-collect, the guard action, the MERGE write and the commit
inside apply_join_matview_changes / _apply_delta by wrapping the names
matview.py actually calls, plus DataFrame.collect call-sites."""
import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distribot_spark.session import get_spark  # noqa: E402

CUM = defaultdict(float)
CNT = defaultdict(int)


def main():
    spark = get_spark(app_name="profile_apply")
    spark.sparkContext.setLogLevel("ERROR")
    from distribot_spark.queries import QUERIES
    from distribot_spark.sources import matview, acid

    # wrap the names in matview's namespace
    real_merge = matview.merge_upsert_spark

    def merge_w(*a, **k):
        t0 = time.time()
        try:
            return real_merge(*a, **k)
        finally:
            CUM["merge_upsert(view)"] += time.time() - t0
            CNT["merge_upsert(view)"] += 1
    matview.merge_upsert_spark = merge_w

    # time every DataFrame.collect by caller file:line (Spark 4: the
    # concrete class is pyspark.sql.classic.dataframe.DataFrame)
    from pyspark.sql.classic.dataframe import DataFrame
    real_collect = DataFrame.collect

    def collect_w(self):
        st = traceback.extract_stack(limit=4)
        caller = next((f"{os.path.basename(fr.filename)}:{fr.lineno}"
                       for fr in reversed(st[:-1])), "?")
        t0 = time.time()
        try:
            return real_collect(self)
        finally:
            CUM[f"collect@{caller}"] += time.time() - t0
            CNT[f"collect@{caller}"] += 1
    DataFrame.collect = collect_w

    # time try_commit + staged write via acid namespace
    real_tc = acid.TableLog.try_commit

    def tc_w(self, *a, **k):
        t0 = time.time()
        try:
            return real_tc(self, *a, **k)
        finally:
            CUM["try_commit"] += time.time() - t0
            CNT["try_commit"] += 1
    acid.TableLog.try_commit = tc_w

    from pyspark.sql.readwriter import DataFrameWriter
    real_parquet = DataFrameWriter.parquet

    def pq_w(self, *a, **k):
        t0 = time.time()
        try:
            return real_parquet(self, *a, **k)
        finally:
            CUM["writer.parquet"] += time.time() - t0
            CNT["writer.parquet"] += 1
    DataFrameWriter.parquet = pq_w

    real_save = DataFrameWriter.save

    def save_w(self, *a, **k):
        t0 = time.time()
        try:
            return real_save(self, *a, **k)
        finally:
            CUM["writer.save"] += time.time() - t0
            CNT["writer.save"] += 1
    DataFrameWriter.save = save_w

    name = sys.argv[1] if len(sys.argv) > 1 else "s36_stream_matview_join"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spec = QUERIES[name]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(spec.builder(spark, sf))  # cold
    CUM.clear(); CNT.clear()
    for rep in range(2):
        t0 = time.time()
        noop(spec.builder(spark, sf))
        total = time.time() - t0
        print(f"== rep{rep} total={total:.2f}")
        for k in sorted(CUM, key=lambda k: -CUM[k]):
            if CUM[k] >= 0.05:
                print(f"   {CUM[k]:7.2f}  n={CNT[k]:3d}  {k}")
        CUM.clear(); CNT.clear()
    spark.stop()


if __name__ == "__main__":
    main()
