"""ROUND-11 PROBE — hot-key (skew) straggler catalog (VERDICT r10
item 2: skew is the last untested corpus class a 100 TB feed is
guaranteed to contain, and the first one that exercises per-key
wall-time rather than parity).

Corpus: tools/sweep_degenerate.build_skew_dataset — one user owns 50%
of events, one lang owns 90% of documents, 30% of documents are
near-duplicates of one boilerplate template, the same 30% of
embeddings are exact duplicates of one vector (one hot LSH / cosine
bucket).  The PARITY gate for this corpus is
``python tools/sweep_degenerate.py --skew``; THIS probe measures
per-op wall time in an isolated subprocess (fresh JVM, hard timeout)
so a hot-key hang cannot poison the next measurement — the same
split as the round-10 bigdoc pair.

What a finding means at 100 TB: a per-key kernel that is quadratic in
key cardinality (hot LSH bucket pairs), or a window/sessionize lane
whose single hot partition carries half the table, stalls ONE task for
hours while its siblings finish — the classic straggler, invisible in
aggregate timings.  The engine answers are (a) salting
(scale.salted_* — plan-level tested; this corpus gives them data), (b)
bucket-size caps for candidate generation, (c) AQE skew-join at
runtime.

Usage:
    python tools/probe_skew_r11.py [--timeout SECS] [op ...]

With no op list, probes the skew-sensitive families (per-user windows
/ sessions / funnels, dedup + LSH candidate generation, per-lang
rollups) — extend freely; this is a probe, not a gate.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# skew-sensitive families: per-key windows/state, candidate generation,
# per-lang rollups, anything quadratic within a bucket
DEFAULT_TARGET_KEYS = (
    "session", "funnel", "streak", "dedup", "minhash", "simhash",
    "neardup", "cluster", "lsh", "knn", "simsearch", "semdedup",
    "lang", "window", "win_", "stream_", "asof", "skew", "contamination",
    "boilerplate", "substr", "fingerprint", "leakage", "novelty",
)

_RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("skew-op")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from un_datapipeline_spark.registry import all_operators
t0 = time.perf_counter()
all_operators()[{name!r}].fn(spark, {d!r}).toPandas()
print(f"OK {{time.perf_counter() - t0:.1f}}s")
"""


def main() -> int:
    args = sys.argv[1:]
    timeout = 120
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = int(args[i + 1])
        del args[i : i + 2]
    bad = [a for a in args if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sweep_degenerate",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep_degenerate.py"),
    )
    sw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sw)

    from un_datapipeline_spark.registry import all_operators

    ops = list(all_operators())
    names = args or [n for n in ops if any(k in n for k in DEFAULT_TARGET_KEYS)]
    unknown = set(names) - set(ops)
    if unknown:
        raise SystemExit(f"unknown operator name(s): {sorted(unknown)}")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = tempfile.mkdtemp(prefix="probe_skew_")
    sw.build_skew_dataset(d)
    slow: list[tuple[str, str]] = []
    try:
        for name in names:
            code = _RUNNER.format(repo=repo, name=name, d=d)
            t0 = time.perf_counter()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", code],
                    capture_output=True,
                    text=True,
                    timeout=timeout,
                )
                tail = (r.stdout.strip().splitlines() or ["?"])[-1]
                status = tail if r.returncode == 0 else (
                    "CRASH rc=%d %s"
                    % (r.returncode, (r.stderr.strip().splitlines() or ["?"])[-1][:120])
                )
            except subprocess.TimeoutExpired:
                status = f"TIMEOUT >{timeout}s"
            wall = time.perf_counter() - t0
            print(f"{name}: {status} (wall {wall:.1f}s)", flush=True)
            if "TIMEOUT" in status or "CRASH" in status:
                slow.append((name, status))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(f"CATALOG: {len(slow)} problem ops: {[n for n, _ in slow]}")
    return 1 if slow else 0


if __name__ == "__main__":
    sys.exit(main())
