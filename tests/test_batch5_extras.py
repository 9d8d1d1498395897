"""Invariant tests for round-2 batch 5: null-safe join, gap detection,
TTR, bucketed write, URL parsing."""

from __future__ import annotations

from un_datapipeline_spark.operators.joins import join_null_safe_eq
from un_datapipeline_spark.operators.sources import sink_bucketed_write
from un_datapipeline_spark.operators.text_analysis import llm_type_token_ratio
from un_datapipeline_spark.operators.time_series import ts_gap_detect
from un_datapipeline_spark.tables import load_table


def test_null_safe_join_matches_null_bucket(spark, sf_smoke):
    rows = {r.pri: r for r in join_null_safe_eq(spark, sf_smoke).collect()}
    assert "<null>" in rows, "NULL keys must match under <=>"
    assert all(r.n > 0 for r in rows.values())


def test_gap_detect_covers_all_types(spark, sf_smoke):
    rows = ts_gap_detect(spark, sf_smoke).collect()
    e = load_table(spark, sf_smoke, "events")
    per_type = {r.event_type: r["count"] for r in e.groupBy("event_type").count().collect()}
    assert {r.event_type for r in rows} == set(per_type)
    for r in rows:
        assert r.n_gaps == per_type[r.event_type] - 1, "n-1 gaps for n events"
        assert r.max_gap_us >= 0


def test_ttr_bounds(spark, sf_smoke):
    for r in llm_type_token_ratio(spark, sf_smoke).collect():
        assert 0 < r.min_doc_ttr <= r.max_doc_ttr <= 1.0
        assert 0 < r.corpus_ttr <= 1.0


def test_bucketed_join_is_shuffle_free(spark, sf_smoke):
    # run the op (writes the bucketed tables and proves result parity via
    # its oracle elsewhere); at smoke scale Catalyst picks broadcast, so
    # force the merge path to exercise the bucketed-layout guarantee
    from un_datapipeline_spark.operators.sources import bucketed_table_names

    sink_bucketed_write(spark, sf_smoke).collect()
    bk_customer, bk_orders = bucketed_table_names()
    cb = spark.table(bk_customer).hint("merge")
    ob = spark.table(bk_orders)
    j = cb.join(ob, cb.c_custkey == ob.o_custkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # co-bucketed + sorted at write time ⇒ no Exchange (shuffle) at all
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join must not re-shuffle inputs:\n" + plan
    )
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_lateral_topn_group_bound(spark, sf_smoke):
    from un_datapipeline_spark.operators.joins import join_lateral_topn

    rows = join_lateral_topn(spark, sf_smoke).collect()
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r.c_custkey, []).append(r.o_totalprice)
    assert per
    for prices in per.values():
        assert len(prices) <= 3
    # decorrelated plan, not a per-row re-execution: no nested loop
    plan = (
        join_lateral_topn(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


# ---- wave-4 semantic invariants (beyond the shared oracle) ----------------


def test_triangle_count_matches_naive_triple_join(spark, sf_smoke):
    """graph_triangle_count vs a formulation-INDEPENDENT baseline: the
    Spark op and its DuckDB oracle share the degree-oriented algorithm,
    so a bug in the orientation logic could hash-match on both sides.
    This check recounts triangles with the naive id-ordered triple join
    (a<b<c, three edge lookups) in DuckDB at sf0.001 — different
    algorithm, same answer required."""
    from un_datapipeline_spark.registry import all_operators
    from tests.oracle_diff import duck_connect

    got = all_operators()["graph_triangle_count"].fn(spark, sf_smoke).collect()[0]
    con = duck_connect(sf_smoke)
    naive = con.execute(
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b
            ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2)
        SELECT count(*) FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """
    ).fetchone()[0]
    assert got["n_triangles"] == naive
    assert got["global_cc_ppm"] == 3 * naive * 1000000 // got["n_wedges"]


def test_leakage_safe_split_is_cluster_consistent(spark, sf_smoke):
    """llm_leakage_safe_split: every near-dup cluster must land in ONE
    split (the whole point), splits must partition the corpus, and the
    audit column must count only multi-member clusters."""
    import pyspark.sql.functions as F

    from un_datapipeline_spark.operators.training_prep import (
        llm_leakage_safe_split,
    )
    from un_datapipeline_spark.tables import load_table

    out = {r["split"]: r for r in llm_leakage_safe_split(spark, sf_smoke).collect()}
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(r["n_docs"] for r in out.values()) == n_docs
    for r in out.values():
        # leaks prevented only exist inside multi-member clusters
        assert r["n_leaks_prevented"] <= r["n_docs_in_multi"]
        assert r["n_clusters"] <= r["n_docs"]


def test_span_corruption_budget_bounds(spark, sf_smoke):
    """llm_span_corruption: distinct corrupted positions per source are
    bounded above by spans*3 (overlap only shrinks) and below by 3
    (every eligible doc corrupts at least one full span), and the rate
    stays under the theoretical 3/10 + boundary slack."""
    from un_datapipeline_spark.operators.training_prep import (
        llm_span_corruption,
    )

    for r in llm_span_corruption(spark, sf_smoke).collect():
        assert r["corrupt_total"] <= 3 * r["spans_total"]
        assert r["corrupt_total"] >= 3 * r["n_docs"]
        assert r["corrupt_ppm"] <= 320000  # 3/10 + span-boundary slack
