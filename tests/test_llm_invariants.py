"""Oracle-free invariants for the rows-only LLM operators (SURVEY.md §5.2b).

MinHash/LSH can't be hash-matched against DuckDB (engine-specific hash
functions), so its correctness gate is the recall property: every pair
of EXACTLY identical texts must appear among the candidate pairs —
identical shingle sets give identical signatures, hence identical band
buckets, so recall of exact duplicates is 1.0 by construction.  Any
regression in shingling/banding breaks this immediately.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from un_datapipeline_spark.operators.llm_text import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from un_datapipeline_spark.tables import load_table


def test_minhash_exact_dup_recall(spark, sf_t2):
    # Manufacture guaranteed exact duplicates: clone every doc under
    # doc_id+OFFSET, so (i, i+OFFSET) must all surface as candidates.
    OFFSET = 1_000_000
    base = load_table(spark, sf_t2, "documents").select("doc_id", "text")
    clones = base.select((F.col("doc_id") + OFFSET).alias("doc_id"), "text")
    d = base.unionByName(clones)
    n = base.count()
    cands = {
        (r.a, r.b)
        for r in lsh_candidate_pairs(minhash_signatures(d)).collect()
    }
    expected = {(i, i + OFFSET) for i in range(n)}
    missing = expected - cands
    assert not missing, f"exact duplicates missing from candidates: {sorted(missing)[:5]}"


def test_minhash_signature_shape(spark, sf_smoke):
    d = load_table(spark, sf_smoke, "documents")
    sigs = minhash_signatures(d)
    assert sigs.count() == d.count()
    assert len(sigs.columns) == 1 + 12  # doc_id + N_HASHES
