"""NULL-bulk robustness probe — HISTORICAL alias (round 9: SHIPPED).

Round 8 generated the worklist with this probe: **45 of 351 ops diverged
or crashed** on a corpus with NULLs striped into every nullable non-key
column (catalog in R09_NULLS_PLAN.md).  Round 9 fixed all 45
class-by-class and PROMOTED the corpus builder to
`python tools/sweep_degenerate.py --nulls`, which is now the permanent
per-round gate and runs fail=0.  This file remains as a thin alias
(same corpus via sweep_degenerate.build_nulls_dataset, same run_registry
loop) and as the record of the original worklist generator; a red run
here is a REGRESSION, not expected noise.

Failure classes the round-9 wave fixed (representatives pinned in
tests/test_degenerate_robustness.py::NULLS_OPS):

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

# ROUND-9 STATUS: the fix wave landed (45/45 green on this corpus) and
# the builder was promoted to `sweep_degenerate.py --nulls`, which is now
# the permanent per-round gate.  This probe remains as the historical
# worklist generator and a convenience alias (same corpus, same loop).

def build_nulls(d: str) -> None:
    """Thin alias — the corpus builder was PROMOTED to
    sweep_degenerate.build_nulls_dataset when --nulls became a permanent
    sweep mode (round 9); one definition, no drift (the round-8 review
    rule for the harness loop applies to corpus builders too)."""
    from sweep_degenerate import build_nulls_dataset

    build_nulls_dataset(d)


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
