"""ROUND-10 CANDIDATE PROBE — oversized-document robustness (LEAD, the
catalog is INCOMPLETE — treat as a lead, not a worklist yet).

Corpus: the shipped sf0.001 tables with two oversized documents spliced
into an otherwise-normal 40-doc corpus: ~130 KB (20k words) and ~520 KB
(80k words).  Real crawls carry multi-MB outliers (concatenated logs,
minified JS, scanned-book OCR); a per-document kernel that is quadratic
— or linear with a 100k-row explode per doc — stalls one executor task
while its 999 siblings finish, the classic straggler shape at 100 TB.

Round-9 first-pass findings (shared-session run with 60 s/op timeouts;
the kill-and-continue cascade can poison later entries, so per-op
re-confirmation in a FRESH process is required before fixing):

- **HANG >60 s at sf0.001** (a single 520 KB doc!): llm_line_dedup_
  reconstruct, llm_dedup_near_minhash, llm_dedup_cluster,
  llm_doc_fingerprint, llm_type_token_ratio, llm_pii_redact,
  llm_doc_chunking, llm_boilerplate_ngrams (catalog truncated by the
  wall clock — ~10 targets after boilerplate_ngrams never ran).
- **SLOW but finished**: etl_table_fingerprint 11.6 s, llm_lang_id
  7.5 s, llm_semdedup 7.0 s.

Candidate engine answer (pre-made for round 10): a **document-size
contract** — shingle/gram/regex lanes operate on a bounded prefix
(cap at N chars, the standard production-dedup trick: near-dup
signatures from the first 64 KB are essentially as selective as from
the full text), mirrored in each paired oracle via the same
`substr(text, 1, N)`, so the contract is bitwise-neutral on corpora
whose documents are all under the cap (every shipped corpus) and
parity-exact above it.  Ops whose SEMANTICS are whole-document
(exact-dup md5, length stats, writers) stay uncapped — they are all
linear and none hung.

This probe runs each op in its OWN subprocess (fresh JVM) with a hard
timeout, so one hang cannot poison the next measurement.

Usage:
    python tools/probe_bigdoc_r10.py [--timeout SECS] [op ...]
"""

import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

# length-sensitive families; extend freely — this is a probe, not a gate
DEFAULT_TARGET_KEYS = (
    "dedup", "token", "regex", "chunk", "pii", "gram", "quality", "tfidf",
    "bm25", "minhash", "simhash", "fingerprint", "lang", "word_freq",
    "mask", "boilerplate", "text",
)

_RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("bigdoc-op")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from un_datapipeline_spark.registry import all_operators
t0 = time.perf_counter()
all_operators()[{name!r}].fn(spark, {d!r}).toPandas()
print(f"OK {{time.perf_counter() - t0:.1f}}s")
"""


def build_bigdoc(d: str) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    docs = pd.read_parquet(f"{BASE}/documents.parquet").head(40).copy()
    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "river", "stone", "cloud", "ember"]
    docs.loc[docs.index[0], "text"] = " ".join(rng.choice(words, 20_000))
    docs.loc[docs.index[1], "text"] = " ".join(rng.choice(words, 80_000))
    docs["n_chars"] = docs["text"].str.len()
    pq.write_table(
        pa.Table.from_pandas(
            docs,
            schema=pq.read_schema(f"{BASE}/documents.parquet"),
            preserve_index=False,
        ),
        f"{d}/documents.parquet",
    )


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

    from un_datapipeline_spark.registry import all_operators

    ops = list(all_operators())
    names = args or [n for n in ops if any(k in n for k in DEFAULT_TARGET_KEYS)]
    unknown = set(names) - set(ops)
    if unknown:
        raise SystemExit(f"unknown operator name(s): {sorted(unknown)}")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = tempfile.mkdtemp(prefix="probe_bigdoc_")
    build_bigdoc(d)
    try:
        for name in names:
            code = _RUNNER.format(repo=repo, name=name, d=d)
            t0 = time.perf_counter()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", code],
                    capture_output=True, text=True, timeout=timeout,
                )
                tail = (r.stdout.strip().splitlines() or ["?"])[-1]
                status = tail if r.returncode == 0 else f"CRASH rc={r.returncode}"
            except subprocess.TimeoutExpired:
                status = f"TIMEOUT>{timeout}s"
            print(f"{name}: {status} (wall {time.perf_counter() - t0:.0f}s)")
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — timings are the output


if __name__ == "__main__":
    sys.exit(main())
