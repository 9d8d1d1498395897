"""ROUND-10 CANDIDATE PROBE — malformed-JSON payload robustness
(catalog generator, NOT a gate; fails are the output).

Corpus: ``events.props`` (JSON-in-string) striped with the corruption a
real event feed delivers — truncated objects (``{"k": 8``), bare
non-JSON text, the empty string, ``null`` literals, wrong-type payloads
(``[1,2,3]`` where an object is expected), and duplicate-key objects.

Hypothesized classes:
1. Extractor asymmetry: Spark's ``get_json_object``/``from_json``
   return NULL on malformed input, DuckDB's ``json_extract`` THROWS —
   a one-sided crash (oracle dies, op survives) is still a FAIL.
2. Schema-inference samplers choking on a corrupt sample row.
3. Downstream NULL propagation after a silent NULL parse — covered by
   the --nulls contracts if the parse lane NULLs cleanly on both sides.

Usage:
    python tools/probe_badjson_r10.py [op ...]
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

_BAD = ['{"k": 8', "not json at all", "", "null", "[1,2,3]", '{"k": 1, "k": 2}']


def build_badjson(d: str) -> None:
    for t in "region nation customer supplier part orders lineitem documents embeddings".split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    ev = pd.read_parquet(f"{BASE}/events.parquet").copy()
    props = list(ev["props"])
    for i in range(0, len(props), 7):
        props[i] = _BAD[(i // 7) % len(_BAD)]
    ev["props"] = props
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
    d = tempfile.mkdtemp(prefix="probe_badjson_")
    build_badjson(d)
    run_registry(d, set(sys.argv[1:]), app_name="probe-badjson")
    shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — fails are the output


if __name__ == "__main__":
    sys.exit(main())
