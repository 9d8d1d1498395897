"""ROUND-10 CANDIDATE PROBE — duplicate-key robustness (catalog
generator, NOT a gate; fails are the output).

Corpus: surrogate keys that the shipped generator guarantees unique are
DUPLICATED with *differing payloads* — the at-least-once-delivery /
double-ingest shape every real 100 TB feed eventually produces:

- ``events``: ~1 in 10 event_ids appears twice (second copy = same id,
  shifted ts, different value/event_type) — retry/replay duplicates;
- ``documents``: ~1 in 7 doc_ids appears twice with different text —
  re-crawled pages under the same id;
- ``embeddings``: ~1 in 8 vec_ids appears twice with a different
  vector — re-embedded rows.

Hypothesized classes:
1. Arbitrary-winner dedup: ops that dropDuplicates/DISTINCT ON a key
   keep an ARBITRARY row in Spark but a deterministic one in the
   oracle's ORDER BY — parity holds only if the op pins a total order
   (the tie-stress lesson applied to whole ROWS, not just rank keys).
2. Key-join fanout: enrichment joins on a "unique" key silently
   duplicate the probe side (count inflation both engines — parity may
   HOLD while the semantics are wrong; catalog which ops would need a
   contracted pre-dedup for correctness-at-scale).
3. Keyed-state streaming: dropDuplicatesWithinWatermark now REALLY
   deduplicates — batch oracles that assumed unique ids must express
   the same winner.
4. Sketch/codebook training on duplicated vectors: same bucket twice,
   centroid drift — rows-only ops' pytest invariants may still hold.

Verdict semantics are run_registry's (CRASH / hash mismatch = fail).
A parity PASS here does not certify the op's dup-key SEMANTICS — read
the class-2 note above; the catalog is the product.

Usage:
    python tools/probe_dupkeys_r10.py [op ...]
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


def build_dupkeys(d: str) -> None:
    for t in "region nation customer supplier part orders lineitem".split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")

    def write(t: str, frame: pd.DataFrame) -> None:
        pq.write_table(
            pa.Table.from_pandas(
                frame,
                schema=pq.read_schema(f"{BASE}/{t}.parquet"),
                preserve_index=False,
            ),
            f"{d}/{t}.parquet",
        )

    ev = pd.read_parquet(f"{BASE}/events.parquet")
    dup = ev[ev["event_id"] % 10 == 0].copy()
    dup["ts"] = dup["ts"] + pd.Timedelta(minutes=3)  # replay arrives later
    dup["value"] = dup["value"].round(2) + 0.07
    dup["event_type"] = "replay"
    write("events", pd.concat([ev, dup], ignore_index=True))

    docs = pd.read_parquet(f"{BASE}/documents.parquet")
    ddup = docs[docs["doc_id"] % 7 == 0].copy()
    ddup["text"] = ddup["text"].fillna("") + " recrawled copy differs"
    ddup["n_chars"] = ddup["text"].str.len()
    write("documents", pd.concat([docs, ddup], ignore_index=True))

    em = pd.read_parquet(f"{BASE}/embeddings.parquet")
    edup = em[em["vec_id"] % 8 == 0].copy()
    edup["embedding"] = edup["embedding"].apply(
        lambda v: [float(x) * 0.5 + 0.25 for x in v]  # re-embedded: different vector
    )
    write("embeddings", pd.concat([em, edup], ignore_index=True))


def main() -> int:
    from sweep_degenerate import run_registry  # the ONE harness loop

    bad = [a for a in sys.argv[1:] if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}; args are op names only")
    d = tempfile.mkdtemp(prefix="probe_dupkeys_")
    build_dupkeys(d)
    run_registry(d, set(sys.argv[1:]), app_name="probe-dupkeys")
    shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — fails are the output


if __name__ == "__main__":
    sys.exit(main())
