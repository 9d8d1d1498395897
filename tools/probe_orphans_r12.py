"""ROUND-12 CANDIDATE PROBE — orphan foreign keys (LEAD: catalog only;
fixes belong to the round that adopts the wave).

Corpus: the shipped sf0.001 tables with REFERENTIAL VIOLATIONS striped
in — the single most common real-feed corruption after NULLs:

* 30% of ``events.user_id`` point at customers that do not exist (the
  deleted-account / GDPR-erasure / cross-system-id shape);
* 1/7 of ``lineitem.l_orderkey`` reference missing orders (partial
  ingestion, upstream compaction races);
* 1/9 of ``orders.o_custkey`` reference missing customers.

Every shipped corpus is fully referentially intact (verified round 11:
0 orphans at sf0.001/sf0.01), so no driver stamp covers this class.

What the catalog distinguishes:

* INNER-join ops silently dropping orphans on BOTH engines — correct
  and consistent, expect pass;
* LEFT/OUTER ops carrying NULL dim columns into downstream expressions
  (digest/concat/winner lanes — the round-9 NULL classes, but arriving
  through a join instead of the scan);
* DQ/quarantine ops whose JOB is flagging orphans — their counts must
  move identically on both sides;
* any op that ASSUMES the join key domain (broadcast spine built from
  the dim side, percent-of-dim denominators — division by a smaller
  denominator, not zero, so SILENT-WRONG risk rather than crash).

Usage:
    python tools/probe_orphans_r12.py [ops...]

Reuses sweep_degenerate.run_registry (one harness — round-8 review
rule) with a locally-built corpus; promote to a --orphans sweep mode in
the adopting round if the catalog is non-empty.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sweep_degenerate",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep_degenerate.py"),
    )
    sw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sw)

    only = set(sys.argv[1:])
    d = tempfile.mkdtemp(prefix="probe_orphans_")
    # one corpus definition (round-8 one-harness rule): the builder was
    # promoted into sweep_degenerate.py when --orphans became the 16th
    # permanent mode (round 12); this probe remains as the catalog
    # entry point for subset runs.
    sw.build_orphans_dataset(d)
    try:
        _, _, fails = sw.run_registry(d, only, app_name="probe-orphans-r12")
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
