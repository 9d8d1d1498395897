"""Projection / filter operators (SURVEY.md §2.B).

These are pure narrow transformations: no shuffle at any scale.  All
predicates are Column expressions (never Python UDFs) so Catalyst pushes
them into the parquet scan — `.explain` shows them under PushedFilters.

Row-level float arithmetic is NOT rounded: identical IEEE expressions on
identical input doubles produce bit-identical results in Spark and
DuckDB (only aggregation order introduces noise — SURVEY.md §5.3.1),
verified by the differential harness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table

_PROJ_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
FROM lineitem
"""


@register("proj_select_expr", oracle=_PROJ_ORACLE, tier="T0")
def proj_select_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections with aliases; association order matches the
    oracle text exactly so the doubles are bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
    )


_FILTER_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'O' OR o_orderstatus = 'P')
  AND o_totalprice BETWEEN 1000 AND 300000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
  AND o_orderpriority NOT LIKE '%MEDIUM%'
"""


@register("filter_complex_pred", oracle=_FILTER_ORACLE, tier="T0")
def filter_complex_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction of OR / BETWEEN / IN / NOT LIKE — all pushdown-eligible."""
    o = load_table(spark, sf_dir, "orders")
    pred = (
        ((F.col("o_orderstatus") == "O") | (F.col("o_orderstatus") == "P"))
        & F.col("o_totalprice").between(1000, 300000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        & ~F.col("o_orderpriority").like("%MEDIUM%")
    )
    return o.filter(pred).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"
    )


_CASE_ORACLE = """
SELECT CASE WHEN l_discount < 0.02 THEN 'low'
            WHEN l_discount < 0.05 THEN 'mid'
            ELSE 'high' END AS band,
       count(*) AS n,
       ROUND(sum(l_quantity), 4) AS sum_qty
FROM lineitem
GROUP BY band
"""


@register("filter_case_when", oracle=_CASE_ORACLE, tier="T1")
def filter_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE bands over discount + per-band aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") < 0.02, "low")
        .when(F.col("l_discount") < 0.05, "mid")
        .otherwise("high")
        .alias("band")
    )
    return li.groupBy(band).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


_NULL_ORACLE = """
WITH t AS (
  SELECT nullif(o_orderstatus, 'P') AS st, o_totalprice FROM orders
)
SELECT count(*) AS n_all,
       count(st) AS n_nonnull,
       CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f_nullsafe,
       CAST(sum(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_nullsafe
FROM t
"""


@register("filter_null_handling", oracle=_NULL_ORACLE, tier="T1")
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull / isNotNull / null-safe equality (<=>) over a derived
    nullable column."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st"))
    return t.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count("st").alias("n_nonnull"),
        F.sum(F.col("st").isNull().cast("int")).cast("long").alias("n_null"),
        F.sum(F.col("st").eqNullSafe(F.lit("F")).cast("int")).cast("long").alias("n_f_nullsafe"),
        F.sum(F.col("st").eqNullSafe(F.lit(None).cast("string")).cast("int"))
        .cast("long")
        .alias("n_null_nullsafe"),
    )


_EXISTS_ORACLE = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(*) FILTER (EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 200000)) AS BIGINT) AS with_big_order,
       CAST(count(*) FILTER (NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
         AS never_ordered
FROM customer c
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("filter_exists_subquery", oracle=_EXISTS_ORACLE, tier="T1")
def filter_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subquery predicates, expressed in
    SQL and decorrelated by Catalyst into ExistenceJoin hash joins
    (plan-verified: two BroadcastHashJoin ... ExistenceJoin nodes, the
    existence-flag cousin of the semi/anti plans join_left_semi/anti
    build directly).  The point is the SUBQUERY surface reaching a hash
    join: a correlated subquery executed naively per-row would be a
    nested loop over the fact table at 100 TB.  The big-order predicate
    is pushed into the orders scan (DataFilters) before its join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count_if(EXISTS (
                    SELECT 1 FROM v_orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 200000)) AS BIGINT) AS with_big_order,
               CAST(count_if(NOT EXISTS (
                    SELECT 1 FROM v_orders o WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
                 AS never_ordered
        FROM v_customer c
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )
