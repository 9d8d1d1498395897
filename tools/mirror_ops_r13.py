"""Round-13 targeted strict mirror: run NAMED ops through the exact
driver-canonicalizer comparison (tests/strict_diff.strict_compare)
against the DuckDB oracle, in a plain local[8] session — the same
gate driver_sim applies, restricted to the ops an optimization touched.

Usage: python tools/mirror_ops_r13.py <sf_dir> <op> [<op> ...]
Rows-only ops (no oracle) are run through the driver canon only.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_diff import duck_connect  # noqa: E402
from tests.strict_diff import canon, strict_compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    ops = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("mirror-ops-r13")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    con = duck_connect(sf_dir)
    rc = 0
    for name in ops:
        t0 = time.perf_counter()
        spdf = q[name](spark, sf_dir).toPandas()
        el = time.perf_counter() - t0
        if name in o:
            ocdf = con.execute(o[name]).df()
            problems = strict_compare(spdf, ocdf)
            print(f"{name}: rows={len(spdf)}/{len(ocdf)} "
                  f"match={not problems} spark_s={el:.2f}", flush=True)
            for p in problems[:8]:
                print(f"    {p}", flush=True)
            rc |= bool(problems)
        else:
            canon(spdf)
            print(f"{name}: rows-only rows={len(spdf)} spark_s={el:.2f}",
                  flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
