"""ROUND-10 CANDIDATE PROBE — zero-row-table robustness (catalog
generator, NOT a gate; fails are the output).

Corpus: the three data-plane tables a real pipeline most often sees
EMPTY — ``events`` (a new day/partition with no events yet),
``documents`` and ``embeddings`` (a new tenant with no corpus yet) —
written as 0-row parquet files with the exact shipped schemas; every
relational table (region..lineitem) stays intact.  The --tiny sweep
covers FEW rows; nothing covers ZERO rows, and empty input is the
first thing a scheduled 100 TB pipeline meets on day one.

Hypothesized classes (from the --tiny/--nulls experience):
1. Scalar subqueries / aggregates of an empty scan: count()=0
   denominators (ANSI DIVIDE_BY_ZERO vs DuckDB NULL), min/max = NULL
   flowing into sequence()/generate_series (NULL bounds), percentile
   of nothing.
2. numpy kernels: np.vstack/np.stack of ZERO batch rows (empty-list
   crash), argpartition on an empty axis, matmul with a (0, d) probe
   matrix (the round-9 empty-probe AxisError class, now guarded in
   ivf/hnsw/hard_negatives/pq — this probe checks the OTHER kernels).
3. Writers/sinks over empty frames: a text/CSV/parquet writer that
   emits zero files vs an oracle that still returns a 0-row frame with
   the right schema (schema-only hash compare must agree).
4. Streaming: an availableNow query over an empty source — does the
   memory sink table exist with 0 rows, or does the query never emit?

Verdict semantics are run_registry's: CRASH on either engine = fail,
hash mismatch = fail, rows-only + Spark ran = pass.  A 0-row result
that BOTH engines produce with matching schema is a PASS — empty is a
legitimate answer to an empty input.

Usage:
    python tools/probe_empty_r10.py [op ...]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow.parquet as pq

BASE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

EMPTY_TABLES = ("events", "documents", "embeddings")


def build_empty(d: str) -> None:
    for t in "region nation customer supplier part orders lineitem".split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    for t in EMPTY_TABLES:
        schema = pq.read_schema(f"{BASE}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{d}/{t}.parquet")


def main() -> int:
    from sweep_degenerate import run_registry  # the ONE harness loop

    bad = [a for a in sys.argv[1:] if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}; args are op names only")
    d = tempfile.mkdtemp(prefix="probe_empty_")
    build_empty(d)
    run_registry(d, set(sys.argv[1:]), app_name="probe-empty")
    shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — fails are the output


if __name__ == "__main__":
    sys.exit(main())
