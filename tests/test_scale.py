"""Scale-machinery proofs: bucketed joins actually skip the shuffle
(plan-level), salted joins return identical results to plain joins."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from un_datapipeline_spark.scale import bucketed_join, salted_join, write_bucketed
from un_datapipeline_spark.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    warehouse = tempfile.mkdtemp(prefix="bkt_")
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, "li_b", "l_orderkey", 4, path=f"{warehouse}/li")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_b",
        "l_orderkey",
        4,
        path=f"{warehouse}/o",
    )
    # Disable broadcast so the planner takes the bucketed SMJ path (at
    # real scale both sides exceed the broadcast threshold anyway).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=4)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_left_join_preserves_unmatched(spark, sf_smoke):
    c = load_table(spark, sf_smoke, "customer").select("c_custkey")
    o = load_table(spark, sf_smoke, "orders").select("o_custkey")
    plain = c.join(o, c.c_custkey == o.o_custkey, "left").count()
    salted = salted_join(c, o, "c_custkey", "o_custkey", n_salts=4, how="left").count()
    assert plain == salted
