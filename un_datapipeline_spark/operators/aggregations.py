"""Aggregation operators (SURVEY.md §2.D).

All aggregates run as Spark hash aggregations with automatic
partial (map-side) + final phases — the shuffle moves only the grouped
partial states, never raw rows, so these scale linearly with input and
the shuffle volume is bounded by |groups| × partitions.  Double-typed
aggregates are wrapped in ROUND on BOTH the Spark and oracle side
(hash-parity rule, SURVEY.md §5.3.1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table

_PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(sum(l_quantity), 4)                                    AS sum_qty,
       ROUND(sum(l_extendedprice), 4)                               AS sum_base_price,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 4)            AS sum_disc_price,
       ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(avg(l_quantity), 6)                                    AS avg_qty,
       ROUND(avg(l_extendedprice), 6)                               AS avg_price,
       ROUND(avg(l_discount), 6)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", oracle=_PRICING_SUMMARY_ORACLE, tier="T0")
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship query (`entry()` runs this).

    Scan→filter→hash-agg: the shipdate predicate and 7-column projection
    push down into the parquet scan; the groupBy keys have 6 distinct
    combinations so the exchange after partial agg carries ~6 rows per
    task regardless of scale factor.
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = net * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(net), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_COUNT_DISTINCT_ORACLE = """
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(DISTINCT c_acctbal)   AS n_balances,
       count(*)                    AS n_rows
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_count_distinct", oracle=_COUNT_DISTINCT_ORACLE, tier="T1")
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distinct counts in one aggregate (Spark expands
    to a single multi-distinct hash aggregate)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct("c_acctbal").alias("n_balances"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, ROUND(sum(l_quantity), 4) AS sq
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE, tier="T1")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus): per-pair, per-flag, grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sq")
    )


_HAVING_ORACLE = """
SELECT l_orderkey, ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
GROUP BY l_orderkey
HAVING sum(l_extendedprice * (1 - l_discount)) > 300000
"""


@register("agg_having", oracle=_HAVING_ORACLE, tier="T1")
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): high-revenue orders only.
    The filter applies to the unrounded aggregate, like the SQL text."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.round(rev, 4).alias("revenue"),
            rev.alias("_raw_rev"),
        )
        .filter(F.col("_raw_rev") > 300000)
        .select("l_orderkey", "revenue")
    )
