"""Round-13 scaling floor analysis (VERDICT r12 item 2).

Measures each headline bench query at local[1], local[8] and local[32]
— one fresh process per core count, bench.py's exact posture — and
records per-query task counts of the executed plan (via statusTracker),
to establish how much PARALLEL work each query actually contains at
sf0.1.

The structural fact this quantifies: every sf0.1 table is one parquet
file with ONE row group, so a scan stage cannot exceed one task; the
only multi-task stages are post-shuffle reduces over KB-scale data.
If t(1 core) ≈ t(32 cores) for a query, the query contains no
exploitable parallelism at this SF and an 8-vs-32 ratio of ≈1 is the
correct physical answer, not a harness bug.

Usage: python tools/scaling_floor_r13.py            # all three core counts
       SOLO_CPUS=8 python tools/scaling_floor_r13.py  # one (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_one(cpus: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    import bench
    from un_datapipeline_spark.session import get_spark

    spark = get_spark(app_name=f"floor-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    st = spark.sparkContext.statusTracker()
    # bench.py's triple warm pass
    for _ in range(3):
        for name, fn in bench.QUERIES.items():
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(bench.REDUCE_WIDTH[name])
            )
            fn(spark, SF_DIR).collect()
    out: dict[str, dict] = {}
    for name, fn in bench.QUERIES.items():
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(bench.REDUCE_WIDTH[name])
        )
        best = float("inf")
        for _ in range(7):
            before_jobs = set(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        # task census of the last execution's jobs
        new_jobs = [j for j in (st.getJobIdsForGroup(None) or [])
                    if j not in before_jobs]
        n_tasks = 0
        max_stage_tasks = 0
        for j in new_jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    n_tasks += si.numCompletedTasks
                    max_stage_tasks = max(max_stage_tasks, si.numCompletedTasks)
        out[name] = {
            "best_s": round(best, 4),
            "jobs": len(new_jobs),
            "tasks": n_tasks,
            "max_stage_tasks": max_stage_tasks,
        }
    print("FLOORJSON " + json.dumps({"cpus": int(cpus), "queries": out}),
          flush=True)
    spark.stop()


def main() -> None:
    solo = os.environ.get("SOLO_CPUS")
    if solo:
        run_one(solo)
        return
    results = []
    for cpus in ("32", "8", "1"):
        env = dict(os.environ, SOLO_CPUS=cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        for line in p.stdout.splitlines():
            if line.startswith("FLOORJSON "):
                results.append(json.loads(line.removeprefix("FLOORJSON ")))
                break
        else:
            print(f"cpus={cpus} FAILED rc={p.returncode}\n{p.stderr[-2000:]}")
            sys.exit(1)
    by_cpus = {r["cpus"]: r["queries"] for r in results}
    names = list(by_cpus[32].keys())
    print(f"{'query':26s} {'t32':>7s} {'t8':>7s} {'t1':>7s} "
          f"{'r8/32':>6s} {'r1/32':>6s} {'tasks':>6s} {'maxstg':>6s}")
    for n in names:
        q32, q8, q1 = by_cpus[32][n], by_cpus[8][n], by_cpus[1][n]
        print(f"{n:26s} {q32['best_s']:7.3f} {q8['best_s']:7.3f} "
              f"{q1['best_s']:7.3f} {q8['best_s']/q32['best_s']:6.2f} "
              f"{q1['best_s']/q32['best_s']:6.2f} {q32['tasks']:6d} "
              f"{q32['max_stage_tasks']:6d}")
    with open(os.path.join(REPO, "plans", "r13", "scaling_floor_raw.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
