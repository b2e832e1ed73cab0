"""Phase profiler for s28_stream_expectations_quarantine at sf0.1
(round-9 profiling tool)."""
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
    spark = get_spark(app_name="profile_s28")
    spark.sparkContext.setLogLevel("ERROR")
    from distribot_spark.queries import QUERIES
    from distribot_spark.sources import acid
    from distribot_spark.streaming import replay
    import distribot_spark.queries.streaming as qs

    wrap(acid, "merge_upsert_spark")
    wrap(acid, "_apply_constraints_spark")
    wrap(acid, "_plan_bucket_state")
    wrap(acid, "read_quarantine")
    wrap(acid, "read_snapshot_spark")
    wrap(replay, "table_replay_dir")
    wrap(replay, "run_foreach_batch")
    assert qs.replay is replay

    sf = "/root/testdata/sf0.1"
    for rep in range(2):
        CUM.clear()
        CNT.clear()
        t0 = time.time()
        df = QUERIES["s28_stream_expectations_quarantine"].builder(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        total = time.time() - t0
        print(f"== rep{rep} total={total:.2f}")
        for k in sorted(CUM, key=lambda x: -CUM[x]):
            print(f"  {CUM[k]:8.2f}  n={CNT[k]:3d}  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
