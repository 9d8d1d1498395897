"""Out-of-range-timestamp robustness probe — HISTORICAL alias (round 9:
SHIPPED, a round early).

Round 8 generated the lead with this probe: events.ts striped with
pre-1970 negative epochs and 2099 futures, orders.o_orderdate striped
with 1968 (a deliberately dense stripe — 1/3 of events rows — though
even ONE such row reproduces both hazards).  The first full-registry
run OOM'd the JVM
mid-sweep; round 9 completed the catalog in isolated chunks and found
the TRUE worklist was exactly four ops in two classes (the round-8
"assorted date-window/session/asof divergences" were crash-cascade
noise — every other op, including the no-grid ts_multires_rollup and
the date-spining etl_date_spine, passes the warped corpus unmodified):

1. **Grid explosion** (CONFIRMED, fixed): ts_resample_ffill and
   ts_interpolate_linear spine sequence(min(ts), max(ts)) — one
   decades-out row materializes a 150-year hourly grid (>7-minute hang
   on a 6k-row corpus; task OOM at cluster scale).  Fix: the valid_ts
   bounded-spine contract (tables.py), a scan-pushable BETWEEN applied
   inside each op and mirrored verbatim in its paired oracle.
2. **Watermark poisoning** (CONFIRMED, fixed): stream_dedup and
   stream_stream_join — watermarks are MONOTONIC, so one 2099 event
   advances them past every honest row (stream_dedup silently dropped
   47/210; stream_stream_join kept 20/51 distinct clicks).  Fix: the
   same valid_ts guard before the watermark, both oracle sides.
3. Negative-epoch `//`-vs-DIV divergence: HYPOTHESIZED round 8, did NOT
   materialize — every epoch-bucketing lane divides date_trunc'ed
   (exact-multiple) epochs, where truncate == floor.

The corpus builder is PROMOTED to `python tools/sweep_degenerate.py
--timewarp`, the permanent per-round gate (full-registry fail=0).  This
file remains as a thin alias over the same builder + run_registry loop
and as the record of the original lead; a red run here is a REGRESSION.
Representatives pinned in tests/test_degenerate_robustness.py::
TIMEWARP_OPS.

Usage:
    python tools/probe_timewarp_r10.py [op ...]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_degenerate import build_timewarp_dataset

# kept under the original name so round-8/9 notes' references resolve
build_timewarp = build_timewarp_dataset


def main() -> int:
    from sweep_degenerate import run_registry  # the ONE harness loop

    bad = [a for a in sys.argv[1:] if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}; args are op names only")
    d = tempfile.mkdtemp(prefix="probe_timewarp_")
    build_timewarp_dataset(d)
    _, _, fails = run_registry(d, set(sys.argv[1:]), app_name="probe-timewarp")
    shutil.rmtree(d, ignore_errors=True)
    return 1 if fails else 0  # promoted: a red here is a regression


if __name__ == "__main__":
    sys.exit(main())
