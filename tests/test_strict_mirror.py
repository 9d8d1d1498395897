"""Regression fixtures for the strict_diff driver mirror itself.

Round-5 incident (CORRECTNESS_r05 `reshape_transpose`): the grading
driver's schema check is case-INsensitive but its value-hash
canonicalization sorts column names case-SENSITIVELY — so a Spark frame
with columns ['key','A','N','R'] vs an oracle with ['key','a','n','r']
hash-fails on misaligned columns even when every cell is bit-identical.
The local mirror lowercased names before comparing, which is exactly why
the bug shipped locally green and failed at the driver.  These fixtures
pin the mirror's case-sensitivity so that blind spot cannot reopen.

No Spark session needed — strict_compare is pure pandas.
"""

from __future__ import annotations

import pandas as pd

from tests.strict_diff import canon, strict_compare


def test_case_mismatched_alias_must_fail():
    """The r05 reshape_transpose shape: identical values, column names
    differing only by case — the driver hash-fails this, so the mirror
    must go red too."""
    sp = pd.DataFrame({"key": ["x", "y"], "A": [1.0, 2.0], "N": [3.0, 4.0]})
    oc = pd.DataFrame({"key": ["x", "y"], "a": [1.0, 2.0], "n": [3.0, 4.0]})
    problems = strict_compare(sp, oc)
    assert problems, "case-mismatched aliases must be a local FAIL"
    assert "case-sensitive" in problems[0]


def test_exact_case_match_passes():
    sp = pd.DataFrame({"key": ["x", "y"], "a": [1.0, 2.0], "n": [3.0, 4.0]})
    oc = pd.DataFrame({"key": ["y", "x"], "a": [2.0, 1.0], "n": [4.0, 3.0]})
    assert strict_compare(sp, oc) == []


def test_canon_sort_is_case_sensitive():
    """ASCII sort puts uppercase before lowercase: ['A','N','key'] — the
    driver's canonical column order.  If canon ever lowercases first,
    'key' would sort between 'a' and 'n' and the mirror would diverge
    from the driver again."""
    df = pd.DataFrame({"key": ["x"], "N": [1.0], "A": [2.0]})
    assert list(canon(df).columns) == ["A", "N", "key"]
