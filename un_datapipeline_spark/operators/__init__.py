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
    graph_stats,
    joins,
    llm_text,
    llm_vectors,
    mllib_lsh,
    multimodal,
    relational,
    reshape,
    retrieval_eval,
    robust_stats,
    setops,
    sorting,
    sources,
    spatial,
    streaming,
    text_analysis,
    time_series,
    training_extras,
    training_prep,
    udfs,
    warehouse_queries,
    windows,
)
