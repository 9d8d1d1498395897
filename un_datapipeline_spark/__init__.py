"""un_datapipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
``luisimagiire/un-datapipeline`` (the reference tree shipped empty — see
SURVEY.md §0 — so the capability surface is defined constructively by
SURVEY.md §2), re-expressed Spark-first: DataFrame/SQL logical plans,
Catalyst/Tungsten/AQE physical execution, Structured Streaming for the
event stream, Arrow-batched pandas UDFs only where built-ins cannot
express the semantics.

Layout:
    session.py    — SparkSession factory + runtime confs (ns-timestamp fix)
    tables.py     — canonical loaders for the 10 testdata tables
    registry.py   — operator registry: name -> (query fn, oracle SQL, tier)
    operators/    — one module per operator family (SURVEY.md §2.A-K)
"""

from un_datapipeline_spark.registry import all_operators, register

__all__ = ["all_operators", "register"]
