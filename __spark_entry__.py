"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Both dicts are projections of ``un_datapipeline_spark.registry`` — one
decorator per operator keeps them in sync by construction.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from un_datapipeline_spark.registry import all_operators  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (agg_pricing_summary, TPC-H Q1 shape) on sf0.001."""
    ops = all_operators()
    return ops["agg_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: op.fn for name, op in all_operators().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per operator; rows-only ops omit their key."""
    return {
        name: op.oracle
        for name, op in all_operators().items()
        if op.oracle is not None
    }
