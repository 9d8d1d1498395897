"""Round-12 optimization probe: per-query timings + formatted plans.

Reproduces bench.py's exact session/conf/warm-up methodology, then for
each of the 12 headline queries records:
  - best-of-7 `.collect()` (the bench's timed action),
  - best-of-7 noop-sink write (guide §1.4 — isolates the computation
    from result serving),
  - the `.explain("formatted")` text, written to plans/r12/<q>_<tag>.txt.

Usage: python tools/probe_bench_r12.py <tag>     # tag = before | after
Prints one line per query: name, collect_s, noop_s, n_jobs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from un_datapipeline_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
os.makedirs(PLANS_DIR, exist_ok=True)


def main() -> None:
    import bench

    spark = get_spark(app_name="r12-bench-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    sf = bench.SF_DIR

    for _ in range(3):  # bench.py's triple warm pass
        for name, fn in bench.QUERIES.items():
            spark.conf.set("spark.sql.shuffle.partitions", str(bench.REDUCE_WIDTH[name]))
            fn(spark, sf).collect()

    st = spark.sparkContext.statusTracker()
    print(f"{'query':28s} {'collect':>8s} {'noop':>8s} {'jobs':>5s}")
    for name, fn in bench.QUERIES.items():
        spark.conf.set("spark.sql.shuffle.partitions", str(bench.REDUCE_WIDTH[name]))
        # plan capture (one build, not timed)
        df = fn(spark, sf)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as f:
            f.write(buf.getvalue())
        # best-of-7 collect (bench methodology)
        best_c = float("inf")
        for _ in range(7):
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            best_c = min(best_c, time.perf_counter() - t0)
        # best-of-7 noop sink (guide §1.4)
        spark.sparkContext.setJobDescription(f"noop:{name}")
        best_n = float("inf")
        j0 = len(st.getJobIdsForGroup() or [])
        for _ in range(7):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best_n = min(best_n, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        # job count for ONE collect rep
        ids_before = set(st.getJobIdsForGroup() or [])
        fn(spark, sf).collect()
        ids_after = set(st.getJobIdsForGroup() or [])
        njobs = len(ids_after - ids_before)
        print(f"{name:28s} {best_c:8.4f} {best_n:8.4f} {njobs:5d}")


if __name__ == "__main__":
    main()
