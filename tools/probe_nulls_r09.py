"""ROUND-9 WORKLIST GENERATOR — NULL-bulk robustness probe (not part of
the per-round battery; its corpus is EXPECTED to red ~45 ops until the
round-9 fix wave lands).

Round 8 shipped the non-finite measurement class (ingest contract +
--nonfinite sweep, fail=0).  The sibling class — bulk NULLs in every
nullable column (NULL text/lang/source, NULL value/props/event_type,
NULL embedding/label, NULL o_totalprice/o_orderpriority,
NULL l_discount/l_tax/l_returnflag) — was probed the same round:
**45 of 351 ops diverge or crash** (catalog in R09_NULLS_PLAN.md).
The wave was DEFERRED: 45 stamp-void re-edits plus the 16 never-verified
ops exceed the 50-slot round-8 driver window, and the round-8 priority
(VERDICT r07 item 1) was the full-registry stamp-out.  Round 9's window
is pure refresh budget, which a 45-op wave fits.

Failure classes found by this probe (fix the CLASS, then promote the
builder below to a `--nulls` mode of sweep_degenerate.py and pin
representatives in tests/test_degenerate_robustness.py):

1. NULL embedding → every numpy kernel crashes on the ragged array
   (np.stack of list-with-None): cosine_topk / knn / dedup_embedding /
   hard_negatives / semdedup / ivf / hnsw / pq / kmeans / brp_lsh /
   mean_pool.  Contract candidate: a NULL embedding is not a vector —
   mask like the zero-norm class, `WHERE embedding IS NOT NULL` in the
   paired oracles.
2. NULL text → counting/digest/write divergences: lang_id counts,
   line-dedup reconstruct, text/wholetext/binary src writers crash on
   None, csv/multiline digests, table fingerprint (NB DuckDB `concat`
   SKIPS NULLs while Spark's returns NULL — any fingerprint/concat lane
   diverges).
3. NULL rank keys → NULLS FIRST (Spark) vs NULLS LAST (DuckDB) in
   window order: percent_rank/cume, quantile bands, moving median
   (also INVALID_INDEX_OF_ZERO on an empty frame), sliding topk.
4. Misc engine quirks: fn_map NULL map key (Spark NULL_MAP_KEY error),
   to_json drops null struct fields vs DuckDB keeps them,
   regexp_extract NULL vs '' on no-match-of-NULL, AES of NULL (dtype
   object), ANSI overflow in scripted loops fed NULL-derived defaults.

Usage:
    python tools/probe_nulls_r09.py            # full registry
    python tools/probe_nulls_r09.py op1 op2    # subset
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


def build_nulls(d: str) -> None:
    """Inject NULLs into every nullable non-key column on deterministic
    stripes; keys stay intact so joins keep their shape.  (Pandas-write
    is fine here: the injected sentinel IS the missing value, unlike the
    nonfinite builder where NaN must survive as a real float.)"""
    for t in "region nation customer supplier part".split():
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

    orders = pd.read_parquet(f"{BASE}/orders.parquet").copy()
    orders.loc[orders.index % 5 == 0, "o_totalprice"] = None
    orders.loc[orders.index % 7 == 0, "o_orderpriority"] = None
    write("orders", orders)

    li = pd.read_parquet(f"{BASE}/lineitem.parquet").copy()
    li.loc[li.index % 5 == 0, "l_discount"] = None
    li.loc[li.index % 7 == 0, "l_tax"] = None
    li.loc[li.index % 6 == 0, "l_returnflag"] = None
    write("lineitem", li)

    ev = pd.read_parquet(f"{BASE}/events.parquet").copy()
    ev.loc[ev.index % 4 == 0, "value"] = None
    ev.loc[ev.index % 5 == 0, "props"] = None
    ev.loc[ev.index % 6 == 0, "event_type"] = None
    write("events", ev)

    docs = pd.read_parquet(f"{BASE}/documents.parquet").copy()
    docs.loc[docs.index % 5 == 0, "text"] = None
    docs.loc[docs.index % 7 == 0, "lang"] = None
    docs.loc[docs.index % 9 == 0, "source"] = None
    write("documents", docs)

    em = pd.read_parquet(f"{BASE}/embeddings.parquet").copy()
    emb = list(em["embedding"])
    for i in range(0, len(emb), 6):
        emb[i] = None  # whole-vector NULL
    for i in range(3, len(emb), 9):
        if emb[i] is not None:  # element-level NULL: [x0, NULL, x2, ...]
            v = list(emb[i])
            v[1] = None
            emb[i] = v
    em["embedding"] = emb
    em.loc[em.index % 7 == 0, "label"] = None
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(
            em[["vec_id", "embedding", "label"]], schema=schema, preserve_index=False
        ),
        f"{d}/embeddings.parquet",
    )


def main() -> int:
    from sweep_degenerate import run_registry  # the ONE harness loop

    bad = [a for a in sys.argv[1:] if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}; args are op names only")
    d = tempfile.mkdtemp(prefix="probe_nulls_")
    build_nulls(d)
    # run_registry rejects unknown op names (zero-op runs must be loud)
    run_registry(d, set(sys.argv[1:]), app_name="probe-nulls")
    shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — fails are the output


if __name__ == "__main__":
    sys.exit(main())
