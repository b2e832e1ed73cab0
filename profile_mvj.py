"""Phase profiler for s36_stream_matview_join / source_acid_matview_join
at sf0.1 (round-9 profiling tool). Monkey-patches cumulative timers
around the infrastructure calls so one builder run yields a phase
breakdown."""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distribot_spark.session import get_spark  # noqa: E402

CUM = defaultdict(float)
CNT = defaultdict(int)


def wrap(mod, name, label=None):
    fn = getattr(mod, name)
    lab = label or name

    def inner(*a, **k):
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            CUM[lab] += time.time() - t0
            CNT[lab] += 1
    inner.__name__ = fn.__name__
    setattr(mod, name, inner)
    return fn


def main():
    spark = get_spark(app_name="profile_mvj")
    spark.sparkContext.setLogLevel("ERROR")
    from distribot_spark.queries import QUERIES
    from distribot_spark.sources import matview, acid
    from distribot_spark.streaming import replay
    from distribot_spark.queries import cdf_shared

    import distribot_spark.queries.streaming as qs
    import distribot_spark.queries.sources as qsrc

    # top-level phases
    wrap(cdf_shared, "seed_join_matview_tables")
    wrap(cdf_shared, "apply_join_matview_workload")
    wrap(matview, "create_join_matview")
    wrap(matview, "apply_join_matview_changes")
    wrap(matview, "refresh_join_matview")
    wrap(matview, "_apply_delta")
    wrap(matview, "matview_delta")
    wrap(matview, "_join_delta_frames")
    wrap(replay, "cdf_replay_dir")
    wrap(replay, "run_foreach_batch")
    wrap(acid, "merge_upsert_spark")
    wrap(acid, "delete_keys_spark")
    wrap(acid, "write_initial_spark")
    wrap(acid, "read_snapshot_spark")
    wrap(acid, "table_changes_spark")
    wrap(acid, "_plan_bucket_state")
    # re-point the already-imported names in the query modules
    qs.replay.cdf_replay_dir = replay.cdf_replay_dir
    qs.replay.run_foreach_batch = replay.run_foreach_batch

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
            print(f"   {CUM[k]:7.2f}  n={CNT[k]:3d}  {k}")
        CUM.clear(); CNT.clear()
    spark.stop()


if __name__ == "__main__":
    main()
