"""Round-13 noop-isolated solo probe (guide §1.4): one op per fresh
process, driver-mirror session (plain local[8]), warm once, then
best-of-3 noop-sink writes — times the computation, not result serving.
Optionally dumps the formatted plan to plans/r13/<op>_<tag>.txt.

Usage: python tools/solo_noop_r13.py <sf_dir> <op> [<op> ...]
       PLAN_TAG=before python tools/solo_noop_r13.py <sf_dir> <op>
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(sf_dir: str, op: str) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("solo-noop")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    q = e.queries()
    tag = os.environ.get("PLAN_TAG")
    if tag:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q[op](spark, sf_dir).explain("formatted")
        pdir = os.path.join(REPO, "plans", "r13")
        os.makedirs(pdir, exist_ok=True)
        with open(os.path.join(pdir, f"{op}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
    t_cold0 = time.perf_counter()
    q[op](spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t_cold0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q[op](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT {op} cold={cold:.2f} warm_noop={best:.2f}", flush=True)
    spark.stop()


def main() -> None:
    if os.environ.get("SOLO_ONE"):
        run_one(sys.argv[1], os.environ["SOLO_ONE"])
        return
    sf_dir = sys.argv[1]
    for op in sys.argv[2:]:
        env = dict(os.environ, SOLO_ONE=op)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir],
            env=env, capture_output=True, text=True, timeout=1800, cwd=REPO,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line.removeprefix("RESULT "), flush=True)
                break
        else:
            print(f"{op} FAILED rc={p.returncode}\n{p.stderr[-1500:]}", flush=True)


if __name__ == "__main__":
    main()
