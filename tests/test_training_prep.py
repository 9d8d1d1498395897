"""Invariant tests for the training-prep operator batch (contamination,
fuzzy dedup, z-score anomalies, moment-based correlation, k-means,
sequence packing).  Oracle parity runs in driver_sim; these assert the
semantic invariants no hash can express."""

from __future__ import annotations

from un_datapipeline_spark.operators.training_prep import (
    agg_corr_pearson,
    etl_pack_sequences,
    llm_contamination_check,
    llm_dedup_fuzzy_edit,
    llm_kmeans_cluster,
    ts_anomaly_zscore,
)
from un_datapipeline_spark.tables import load_table


def test_contamination_eval_docs_fully_flagged(spark, sf_smoke):
    rows = llm_contamination_check(spark, sf_smoke).collect()
    assert rows, "eval docs exist in the corpus, overlap cannot be empty"
    for r in rows:
        assert 0 < r.n_shared <= r.n_grams
        if r.is_eval:
            # an eval doc shares every one of its grams with the eval set
            assert r.n_shared == r.n_grams and r.contaminated_frac == 1.0


def test_fuzzy_edit_pairs_are_similar_and_canonical(spark, sf_smoke):
    rows = llm_dedup_fuzzy_edit(spark, sf_smoke).collect()
    assert rows, "prefix-blocked near-dups exist at every SF"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0.8 <= r.sim <= 1.0
        assert r.edit_dist >= 0


def test_zscore_topk_ordered_and_anomalous(spark, sf_smoke):
    rows = ts_anomaly_zscore(spark, sf_smoke).collect()
    assert len(rows) == 50
    absz = [abs(r.z) for r in rows]
    assert absz == sorted(absz, reverse=True)
    assert absz[0] > 3.0, "heavy-tailed events must produce real anomalies"
    assert len({r.event_id for r in rows}) == 50


def test_corr_bounded_and_complete(spark, sf_smoke):
    rows = agg_corr_pearson(spark, sf_smoke).collect()
    flags = {r.l_returnflag for r in rows}
    assert flags == {"A", "N", "R"}
    for r in rows:
        assert -1.0 <= r.corr_qty_price <= 1.0
        assert r.n > 0


def test_kmeans_partitions_corpus_deterministically(spark, sf_smoke):
    a = sorted(map(tuple, llm_kmeans_cluster(spark, sf_smoke).collect()))
    b = sorted(map(tuple, llm_kmeans_cluster(spark, sf_smoke).collect()))
    assert a == b, "fixed init + fixed iterations must be deterministic"
    n_total = load_table(spark, sf_smoke, "embeddings").count()
    assert sum(r[1] for r in a) == n_total
    assert len(a) == 8
    assert all(r[2] >= 0 for r in a)


def test_pack_sequences_contiguous_token_stream(spark, sf_smoke):
    rows = sorted(
        etl_pack_sequences(spark, sf_smoke).collect(), key=lambda r: r.doc_id
    )
    n_total = load_table(spark, sf_smoke, "documents").count()
    assert len(rows) == n_total
    offset = 0
    for r in rows:
        assert r.tok_start == offset, "packing must be gap-free and ordered"
        assert r.seq_first == r.tok_start // 512
        assert r.seq_last == (r.tok_start + r.n_tokens - 1) // 512
        assert r.seq_first <= r.seq_last
        offset += r.n_tokens
