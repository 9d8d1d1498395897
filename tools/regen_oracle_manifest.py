"""Regenerate tests/oracle_manifest.json — the oracle-text tripwire.

VERDICT r11 item 5: the src_csv_multiline raw-string incident (a
"zero-semantic" f-string prefix change silently turned a '\\1'
backreference into a literal and produced wrong answers that only a
sweep caught) proved that oracle-text edits need MECHANICAL protection,
not a remembered doctrine.  The manifest pins the sha256 of every
registered operator's DuckDB oracle text; tests/test_inventory_guard.py
fails the moment an op's current oracle hash differs from the manifest
while the op is NOT listed in tools/regen_priority.py::FORCE_REFRESH —
i.e. an oracle edit that would ship under a stale driver stamp.

Round procedure (same cadence as priority.py):

* EDITING an oracle mid-round: add the op to FORCE_REFRESH (you had to
  anyway — the stamp-void doctrine), regenerate this manifest, commit
  both.  The guard test enforces the pairing.
* ROUND BOUNDARY (stamps landed, FORCE_REFRESH cleared): regenerate the
  manifest so it records the text the fresh stamps verified:

    python tools/regen_oracle_manifest.py

Scope is deliberately the ORACLE text only: comment-level edits to the
Spark callables are routinely out-of-window (the judge's hunk audit
allows them), so hashing fn source would burn refresh slots on noise;
SEMANTIC Spark-side edits remain governed by the existing FORCE_REFRESH
procedure + the judge's per-round hunk audit.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from un_datapipeline_spark.registry import all_operators

MANIFEST = Path(__file__).resolve().parent.parent / "tests" / "oracle_manifest.json"


def oracle_hash(text: str | None) -> str:
    if text is None:
        return "no_oracle"
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def main() -> None:
    ops = all_operators()
    manifest = {name: oracle_hash(op.oracle) for name, op in sorted(ops.items())}
    MANIFEST.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"wrote {MANIFEST} ({len(manifest)} operators)")


if __name__ == "__main__":
    main()
