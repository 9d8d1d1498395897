"""Generate OPERATORS.md — the registry rendered as a table so SURVEY.md
§2 coverage can be audited line-by-line against actual code locations.

    python -m un_datapipeline_spark.inventory
"""

from __future__ import annotations

from un_datapipeline_spark.registry import all_operators

HEADER = """# OPERATORS — generated inventory (do not edit; `python -m un_datapipeline_spark.inventory`)

One row per registered operator: the `queries()` key, implementing
function (module:function), tier (SURVEY.md §2), and oracle kind
(`SQL` = DuckDB hash-matched; `rows` = rows-only with pytest-asserted
invariants).

| operator id | implementation | tier | oracle |
|---|---|---|---|
"""


def render() -> str:
    rows = []
    for name, op in sorted(all_operators().items()):
        mod = op.fn.__module__.removeprefix("un_datapipeline_spark.operators.")
        kind = "SQL" if op.oracle else "rows"
        rows.append(f"| `{name}` | `{mod}:{op.fn.__name__}` | {op.tier} | {kind} |")
    counts: dict[str, int] = {}
    for op in all_operators().values():
        counts[op.tier] = counts.get(op.tier, 0) + 1
    total = sum(counts.values())
    n_sql = sum(1 for op in all_operators().values() if op.oracle)
    footer = (
        f"\n**{total} operators** — by tier: "
        + ", ".join(f"{t}: {counts[t]}" for t in sorted(counts))
        + f".  Oracle coverage: {n_sql} SQL-matched, {total - n_sql} rows-only.\n"
    )
    return HEADER + "\n".join(rows) + "\n" + footer


if __name__ == "__main__":
    out = render()
    with open("OPERATORS.md", "w") as f:
        f.write(out)
    print(out.splitlines()[-1])
