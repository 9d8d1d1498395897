"""Property-based tests (hypothesis) — oracle-free algebraic identities
(SURVEY.md §5.2): relational laws that must hold for ANY input, checked
over generated predicates/parameters against the real testdata.

Spark jobs are expensive per example, so examples are capped low and
deadline disabled; the value is the generated *parameter* coverage
(filter thresholds, limits, group keys), not example volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from un_datapipeline_spark.tables import load_table

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_spark = None
_sf = None


def _orders():
    return load_table(_spark, _sf, "orders")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bind(spark, sf_smoke):
    global _spark, _sf
    _spark, _sf = spark, sf_smoke
    yield


@SLOW
@given(thr=st.floats(min_value=1000, max_value=500000, allow_nan=False))
def test_filter_partition_law(thr):
    """count(p) + count(¬p) == count(*) for any threshold predicate."""
    o = _orders()
    p = F.col("o_totalprice") > thr
    assert o.filter(p).count() + o.filter(~p).count() == o.count()


@SLOW
@given(thr=st.floats(min_value=1000, max_value=500000, allow_nan=False))
def test_filter_idempotent_and_contradiction(thr):
    o = _orders()
    p = F.col("o_totalprice") > thr
    assert o.filter(p).filter(p).count() == o.filter(p).count()
    assert o.filter(p & ~p).count() == 0


@SLOW
@given(k=st.integers(min_value=1, max_value=50))
def test_topk_is_sorted_prefix(k):
    """orderBy().limit(k) must equal the first k of the full sort."""
    o = _orders()
    full = [
        r.o_orderkey
        for r in o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey")
        .collect()
    ]
    top = [
        r.o_orderkey
        for r in o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(k)
        .select("o_orderkey")
        .collect()
    ]
    assert top == full[:k]


@SLOW
@given(thr=st.floats(min_value=1000, max_value=500000, allow_nan=False))
def test_union_all_counts_add(thr):
    o = _orders()
    a = o.filter(F.col("o_totalprice") > thr)
    b = o.filter(F.col("o_orderstatus") == "O")
    assert a.unionAll(b).count() == a.count() + b.count()


@SLOW
@given(col=st.sampled_from(["o_orderstatus", "o_orderpriority", "o_custkey"]))
def test_group_counts_total(col):
    """Sum of per-group counts == table count, for any grouping key."""
    o = _orders()
    per = o.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    assert per.agg(F.sum("n")).first()[0] == o.count()
    assert per.count() == o.select(col).distinct().count()


@SLOW
@given(thr=st.floats(min_value=0, max_value=1, allow_nan=False))
def test_semi_plus_anti_partition(thr):
    """left_semi ∪ left_anti partitions the left table, for any
    join-side filter."""
    c = load_table(_spark, _sf, "customer")
    o = _orders().filter(F.col("o_totalprice") > thr * 400000)
    cond = c.c_custkey == o.o_custkey
    semi = c.join(o, cond, "left_semi").count()
    anti = c.join(o, cond, "left_anti").count()
    assert semi + anti == c.count()


def test_cents_np_is_true_half_away():
    """The shared pandas cents kernel (tables.cents_np, ADVICE r11) must
    round exactly like Spark's F.round (BigDecimal HALF_UP on the
    double's shortest repr) and DuckDB's round(): half-away-from-zero,
    WITHOUT the floor(abs+0.5) carry bug — for the double just below
    half a cent (value*100 = 0.49999999999999994) the +0.5 addition
    rounds up to exactly 1.0 and the folk kernel yields 1 cent where
    both engines yield 0.  Checked against DuckDB's round() live, and
    against hypothesis-style adversarial literals."""
    import duckdb
    import pandas as pd

    from un_datapipeline_spark.tables import cents_np

    values = [
        0.0049999999999999994,   # v*100 = the double just below 0.5 -> 0
        -0.0049999999999999994,  # -> 0 (not -1)
        0.125,                   # v*100 = 12.5 exactly -> 13 (half-away)
        -0.125,                  # -> -13 (pandas half-even would give -12)
        0.005,                   # v*100 = 0.5000000000000001 -> 1
        0.0,
        1e-300,                  # kept-tiny contract: 0 cents
        9e15,                    # surviving maximum -> 9e17 cents exactly
        -9e15,
        2.675,                   # classic float-repr trap (267.49999...)
        1.005,
        -1.015,
    ]
    got = [int(c) for c in cents_np(pd.Series(values))]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE) * 100) AS BIGINT)", [v]
        ).fetchone()[0]
        for v in values
    ]
    con.close()
    assert got == want, list(zip(values, got, want))
    # the named regression: folk kernel says 1, both engines say 0
    assert got[0] == 0 and got[1] == 0
    # exact .5 boundary goes AWAY from zero on both engines
    assert got[2] == 13 and got[3] == -13
