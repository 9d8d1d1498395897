"""Differential test: every registered operator vs its DuckDB oracle.

This mirrors the driver's t2 gate (sf0.01) so failures surface in the
inner loop, not at hand-off.
"""

from __future__ import annotations

import pytest

from un_datapipeline_spark.registry import all_operators
from tests.oracle_diff import run_diff

OPS = all_operators()


@pytest.mark.parametrize("name", sorted(OPS))
def test_operator_matches_oracle(spark, sf_t2, name):
    res = run_diff(spark, OPS[name], sf_t2)
    assert res.ok, str(res)


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_projection():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert q, "no operators registered"
