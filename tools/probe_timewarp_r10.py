"""ROUND-10 CANDIDATE PROBE — out-of-range timestamp robustness (NOT in
the per-round battery; first run at round 8 crashed the JVM mid-sweep,
so the catalog is incomplete BY DESIGN — treat this as a lead, not a
worklist yet).

Corpus: events.ts striped with pre-1970 (negative epoch) and far-future
(2099) timestamps; orders.o_orderdate striped with 1968.  One corrupt
decades-out row per few hundred is exactly what a real 100 TB feed
contains.

Round-8 first-run findings (before a task-level Java heap OOM at ~op
130 killed the JVM and cascaded "Connection refused" over the rest):

1. **Grid explosion (the OOM, and the headline scale hazard) —
   CONFIRMED in isolation**: ops that GENERATE a time grid between
   min(ts) and max(ts) — resample/ffill, interpolation, multires
   rollup — materialize a 150-YEAR spine when one corrupt row lands
   decades out of range; a 4-op subset run hung past a 7-minute
   timeout on a 6k-row corpus (etl_date_spine passed — it spines
   order dates, which this corpus warps only mildly).  At cluster
   scale this OOMs real executors; the engine-level answer is a
   bounded-spine contract (clamp or reject out-of-range rows at
   ingest, like the non-finite contract) BEFORE the grid generator.
2. **Watermark poisoning — CONFIRMED in isolation**: `stream_dedup`
   reds 163 vs 210 — a single 2099 event advances the watermark past
   every honest row and silently drops 47 of them on the streaming
   side while the batch oracle keeps them.  Real production incident
   class; candidate fix = ingest-bound or documented contract.
3. **Negative-epoch division**: PARITY.md's `//`-floors vs `DIV`-
   truncates hazard goes LIVE on pre-1970 epochs for every
   epoch-bucketing lane that was only ever exercised on positive time.
4. Assorted date-window/session/asof divergences pre-crash (real list
   unknown — the crash truncated the sweep; re-run class-by-class).

Suggested r10 procedure: first run the GRID ops alone (expect OOM →
fix the spine bound), then the stream family (watermark contract),
then the full registry; promote to a sweep mode only once fail=0 is
reachable.

Usage:
    python tools/probe_timewarp_r10.py [op ...]
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


def build_timewarp(d: str) -> None:
    for t in "region nation customer supplier part lineitem documents embeddings".split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")

    ev = pd.read_parquet(f"{BASE}/events.parquet").copy()
    ts = list(ev["ts"])
    for i in range(len(ts)):
        if i % 9 == 0:
            ts[i] = pd.Timestamp("1969-12-31 23:45:17")  # negative epoch
        elif i % 9 == 1:
            ts[i] = pd.Timestamp("1950-03-02 04:05:06.789012")
        elif i % 9 == 2:
            ts[i] = pd.Timestamp("2099-11-30 23:59:59.999999")
    ev["ts"] = ts
    pq.write_table(
        pa.Table.from_pandas(
            ev, schema=pq.read_schema(f"{BASE}/events.parquet"), preserve_index=False
        ),
        f"{d}/events.parquet",
    )

    o = pd.read_parquet(f"{BASE}/orders.parquet").copy()
    od = list(o["o_orderdate"])
    for i in range(0, len(od), 11):
        od[i] = pd.Timestamp("1968-06-15")
    o["o_orderdate"] = od
    pq.write_table(
        pa.Table.from_pandas(
            o, schema=pq.read_schema(f"{BASE}/orders.parquet"), preserve_index=False
        ),
        f"{d}/orders.parquet",
    )


def main() -> int:
    from sweep_degenerate import run_registry  # the ONE harness loop

    bad = [a for a in sys.argv[1:] if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}; args are op names only")
    d = tempfile.mkdtemp(prefix="probe_timewarp_")
    build_timewarp(d)
    run_registry(d, set(sys.argv[1:]), app_name="probe-timewarp")
    shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — fails are the output


if __name__ == "__main__":
    sys.exit(main())
