"""Guards that keep generated docs and driver-priority lists from going
stale as operators are added (VERDICT.md round 2, items 1-2: OPERATORS.md
listed 148 of 149 ops; priority.py was frozen to round-1 state)."""

from __future__ import annotations

import re
from pathlib import Path

from un_datapipeline_spark import priority
from un_datapipeline_spark.registry import all_operators

REPO = Path(__file__).resolve().parent.parent


def test_operators_md_matches_registry():
    """OPERATORS.md must list exactly the registered operators."""
    text = (REPO / "OPERATORS.md").read_text()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    registered = set(all_operators())
    assert listed == registered, (
        f"OPERATORS.md stale: missing {sorted(registered - listed)}, "
        f"extra {sorted(listed - registered)} — regenerate with "
        f"`python -m un_datapipeline_spark.inventory`"
    )


def test_priority_lists_cover_registry_exactly():
    """Every registered op must be in exactly one priority group; no
    priority entry may name a nonexistent op (typo guard)."""
    registered = set(all_operators())
    nv = set(priority.NEVER_VERIFIED)
    nvs = set(priority.NEVER_VERIFIED_STREAMING)
    green = set(priority.DRIVER_GREEN)
    assert not (nv & nvs) and not (nv & green) and not (nvs & green)
    known = nv | nvs | green
    assert not (known - registered), f"priority names not in registry: {sorted(known - registered)}"
    # New ops may legitimately be in no list (they sort as group 2), but
    # at regeneration time the lists should be complete:
    assert not (registered - known), (
        f"ops missing from priority lists (regenerate priority.py): "
        f"{sorted(registered - known)}"
    )


def test_unverified_ops_fill_driver_slots():
    """The driver checks the first 50 queries() entries; those slots must
    all go to operators without a driver verdict."""
    order = list(all_operators())
    nv = list(priority.NEVER_VERIFIED)
    assert order[: len(nv)] == nv
    assert order[len(nv) : len(nv) + 3] == list(priority.NEVER_VERIFIED_STREAMING)
    assert all(n in priority.DRIVER_GREEN for n in order[len(nv) + 3 :])
