"""Simulate the grading driver end-to-end (see .claude/skills/verify).

Builds a PLAIN SparkSession (no engine confs — mirrors the driver),
imports __spark_entry__, runs t1 smoke + t2 diff for every declared
query at sf0.01, and writes evidence to /tmp/verify_out.txt.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SF = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get("VERIFY_OUT", "/tmp/verify_out.txt")


def main() -> int:
    out = open(OUT, "w")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    out.write(f"SMOKE rows={len(rows)} schema={df.columns}\n")
    ok = len(rows) > 0

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    def _key(row):
        return tuple((v is None, str(v)) for v in row)

    n_match = n_rows_only = n_fail = 0
    for name in sorted(q):
        try:
            sdf = q[name](spark, SF)
            srows = sorted((tuple(r) for r in sdf.collect()), key=_key)
            if name in o:
                cur = con.execute(o[name])
                ocols = [d[0] for d in cur.description]
                orows = sorted(cur.fetchall(), key=_key)
                match = (srows == orows) and (
                    [c.lower() for c in sdf.columns] == [c.lower() for c in ocols]
                )
                out.write(f"t2 {name}: rows={len(srows)}/{len(orows)} match={match}\n")
                n_match += match
                n_fail += not match
            else:
                out.write(f"t2 {name}: rows-only rows={len(srows)}\n")
                n_rows_only += 1
        except Exception:
            out.write(f"t2 {name}: EXCEPTION\n{traceback.format_exc()}\n")
            n_fail += 1
    out.write(
        f"TOTAL declared={len(q)} match={n_match} rows_only={n_rows_only} fail={n_fail}\n"
    )
    out.close()
    spark.stop()
    return 0 if ok and n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
