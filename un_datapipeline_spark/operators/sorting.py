"""Sort / limit / top-k operators (SURVEY.md §2.F).

Global top-k never performs a full sort: `orderBy().limit(k)` compiles to
TakeOrderedAndProject (per-partition heap of k rows + driver merge), so
the network moves O(k × partitions) rows no matter the input size.  Sort
keys always end in a unique column so LIMIT cuts deterministically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table

_SORT_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey
LIMIT 100
"""


@register("sort_multi_key", oracle=_SORT_ORACLE, tier="T1")
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS LAST and a unique tiebreaker + limit."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.asc("o_orderstatus"),
            F.desc_nulls_last("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(100)
    )


_TOPK_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net
FROM lineitem
ORDER BY net DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
LIMIT 20
"""


@register("topk_global", oracle=_TOPK_ORACLE, tier="T1")
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 by computed net price → TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .orderBy(
            F.desc("net"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
            F.asc("l_partkey"),
            F.asc("l_suppkey"),
        )
        .limit(20)
        .select("l_orderkey", "l_linenumber", "net")
    )


_OFFSET_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 100 OFFSET 100
"""


@register("limit_offset", oracle=_OFFSET_ORACLE, tier="T2")
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: rows 101–200 by orderkey."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(100)
    )
