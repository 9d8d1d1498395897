"""ROUND-10 CANDIDATE PROBE — absurd-magnitude measurement robustness
(catalog generator, NOT a gate; fails are the output).

Corpus: ``events.value`` striped with FINITE but non-physical
magnitudes — 1e15, -1e15, 1e18, and 1e-300 (a denormal-adjacent tiny) —
the corrupted-row cousin of the --nonfinite class (a parser reading an
id column as the measure, unit bugs multiplying by 1e12, etc.).  The
ingest contract (tables.normalize_events_value) passes these through:
they ARE finite doubles, so nothing sanitizes them today.

Hypothesized classes:
1. The exact-integer-cents lane: ``CAST(round(value*100) AS BIGINT)``
   overflows int64 at |value| > ~9.2e16 — ANSI Spark throws
   CAST_OVERFLOW while DuckDB CAST errors too; BOTH crashing is still a
   FAIL here (an engine must not die on one dirty row).
2. Precision collapse: summing 1e15 with 2-decimal money makes every
   other row's contribution vanish below the double ulp — both engines
   may AGREE (parity pass) while the answer is garbage; parity passes
   in this class still belong in the catalog notes, but only crashes/
   mismatches are machine-flagged.
3. Rank/percentile/histogram lanes: bucket widths computed from
   min..max explode to one mega-bucket (the numeric twin of the
   timewarp grid-explosion class — bounded by construction when bucket
   COUNT is fixed, pathological where bucket WIDTH is fixed).

Design-call options for round 10 (decide in-round on the catalog):
(a) extend the scan-boundary contract to a magnitude-validity window
    (|value| <= 1e12 else NULL) — consistent with non-finite, but
    ADVICE r08 counsels against widening ingest deviations;
(b) the valid_ts precedent: a per-op `valid_measure()` predicate
    applied inside the handful of affected snap/bucket lanes and
    mirrored in their oracles — bounded blast radius, graded scan path
    untouched.  (b) is the default unless the catalog shows dozens of
    affected ops.

Usage:
    python tools/probe_magnitude_r10.py [op ...]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")


def build_magnitude(d: str) -> None:
    for t in "region nation customer supplier part orders lineitem documents embeddings".split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")

    ev = pd.read_parquet(f"{BASE}/events.parquet").copy()
    vals = list(ev["value"])
    for i in range(len(vals)):
        if i % 13 == 0:
            vals[i] = 1e15
        elif i % 13 == 1:
            vals[i] = -1e15
        elif i % 13 == 2:
            vals[i] = 1e18
        elif i % 13 == 3:
            vals[i] = 1e-300
    ev["value"] = vals
    pq.write_table(
        pa.Table.from_pandas(
            ev, schema=pq.read_schema(f"{BASE}/events.parquet"), preserve_index=False
        ),
        f"{d}/events.parquet",
    )


def main() -> int:
    from sweep_degenerate import run_registry  # the ONE harness loop

    bad = [a for a in sys.argv[1:] if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}; args are op names only")
    d = tempfile.mkdtemp(prefix="probe_magnitude_")
    build_magnitude(d)
    run_registry(d, set(sys.argv[1:]), app_name="probe-magnitude")
    shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — fails are the output


if __name__ == "__main__":
    sys.exit(main())
