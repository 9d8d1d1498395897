"""Scalar function families (SURVEY.md §2.H).

One operator per family; each exercises every listed function as Column
expressions (JVM-side, whole-stage-codegen'd — never Python).  Dialect
traps (dayofweek numbering, round modes, regex flavors) are normalized on
BOTH sides per SURVEY.md §5.3.4.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table

_COND_ORACLE = """
SELECT coalesce(CASE WHEN o_orderpriority LIKE '1%' THEN 'hi'
                     WHEN o_orderpriority LIKE '2%' THEN 'mid'
                     END, 'rest')                                  AS pri_band,
       coalesce(nullif(o_orderstatus, 'P'), 'X')                   AS st,
       CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS size_band,
       count(*) AS n
FROM orders
GROUP BY pri_band, st, size_band
"""


@register("fn_conditional", oracle=_COND_ORACLE, tier="T1")
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, nvl, if — grouped counts."""
    o = load_table(spark, sf_dir, "orders")
    pri_band = F.coalesce(
        F.when(F.col("o_orderpriority").like("1%"), "hi").when(
            F.col("o_orderpriority").like("2%"), "mid"
        ),
        F.lit("rest"),
    ).alias("pri_band")
    st = F.nvl(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("X")).alias("st")
    size_band = F.expr("if(o_totalprice > 150000, 'big', 'small')").alias("size_band")
    return o.groupBy(pri_band, st, size_band).agg(F.count(F.lit(1)).alias("n"))
