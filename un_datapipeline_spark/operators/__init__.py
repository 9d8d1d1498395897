"""Operator families (SURVEY.md §2.A–K).

Importing this package populates the registry.  Each module is one
inventory section; each public function is one operator ID.
"""

from un_datapipeline_spark.operators import (  # noqa: F401
    advanced,
    aggregations,
    analytics_extras,
    corpus_quality,
    dedup_extras,
    etl,
    functions,
    joins,
    llm_text,
    llm_vectors,
    multimodal,
    relational,
    reshape,
    setops,
    sorting,
    sources,
    streaming,
    text_analysis,
    time_series,
    training_prep,
    udfs,
    windows,
)
