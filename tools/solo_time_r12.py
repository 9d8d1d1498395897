"""Solo per-operator timing (round 12): one op per fresh process, the
driver-mirror session, timed toPandas — confirms marathon stragglers
without long-JVM inflation.

Usage: python tools/solo_time_r12.py <sf_dir> <op> [<op> ...]
       (prints `<op> <seconds>` per op; run via the self-exec subprocess)
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
        .appName("solo-time")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    q = e.queries()
    t0 = time.perf_counter()
    q[op](spark, sf_dir).toPandas()
    print(f"RESULT {op} {time.perf_counter() - t0:.2f}", flush=True)
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
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=REPO,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line.removeprefix("RESULT "), flush=True)
                break
        else:
            print(f"{op} FAILED rc={p.returncode}", flush=True)


if __name__ == "__main__":
    main()
