"""ROUND-10 CANDIDATE PROBE — mixed embedding dimensions (catalog
generator, NOT a gate; fails are the output).

Corpus: the 64-dim ``embeddings`` table with a model-version mix
spliced in — ~1/9 rows truncated to 32 dims, ~1/17 padded to 72 dims.
Production embedding tables ALWAYS accumulate this shape: a re-embed
job with a new model version lands rows of a different width into the
same table, and nothing in the parquet schema prevents it
(``list<float>`` is unbounded).

ROUND-9 RESULT (targeted run over the 16 vector ops): **10 CRASH** —
cosine_topk, knn_join, dedup_embedding, hard_negatives, ivf, hnsw, pq,
kmeans, semdedup (all: numpy "inhomogeneous shape" in the matrix
kernels — the round-9 ``_vec_matrix`` guard covers NULL cells and NULL
elements, NOT ragged lengths) and ann_brp_lsh (MLlib fit on mixed-size
vectors).  The 6 survivors are the per-row ops (vector_norms,
embed_join, mean_pool, fn_array — no cross-row matrix) and the two
hash-bucket LSH lanes.

Design call (pre-made): extend the round-9 NULL-vector contract to a
DIMENSION contract — a vector whose length differs from the table's
declared dimension is NOT a vector.  The corpus contract (FIXTURES.md)
fixes the embedding width at 64, so declare ``EMBED_DIM = 64`` next to
``valid_vec`` (llm_vectors.py) and extend the SAME three layers:
``valid_vec()`` gains ``F.size(embedding) == EMBED_DIM``,
``valid_vec_sql()`` gains ``len(embedding) = 64``, and ``_vec_matrix``
keeps its defensive shape check.  One predicate edit, mirrored
oracles — the 10 crashing ops re-enter FORCE_REFRESH (they already
share the predicate helper, so the edit is ONE definition + re-stamps).

Usage:
    python tools/probe_mixdim_r10.py [op ...]   # default: vector family
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

VECTOR_OPS = (
    "llm_simsearch_cosine_topk", "llm_knn_join", "llm_vector_norms",
    "llm_embed_join_docs", "llm_dedup_embedding", "llm_hard_negatives",
    "llm_simsearch_ivf", "llm_simsearch_hnsw", "llm_vector_pq",
    "llm_kmeans_cluster", "llm_semdedup", "llm_ann_brp_lsh",
    "llm_embedding_mean_pool", "fn_array", "llm_simsearch_lsh",
    "llm_simsearch_multiprobe",
)


def build_mixdim(d: str) -> None:
    for t in "region nation customer supplier part orders lineitem events documents".split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    em = pd.read_parquet(f"{BASE}/embeddings.parquet").copy()
    emb = list(em["embedding"])
    for i in range(0, len(emb), 9):
        emb[i] = list(emb[i])[:32]          # old-model rows: 32 dims
    for i in range(4, len(emb), 17):
        emb[i] = list(emb[i]) + [0.0] * 8   # padded rows: 72 dims
    em["embedding"] = emb
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(
            em[["vec_id", "embedding", "label"]], schema=schema, preserve_index=False
        ),
        f"{d}/embeddings.parquet",
    )


def main() -> int:
    from sweep_degenerate import run_registry  # the ONE harness loop

    bad = [a for a in sys.argv[1:] if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flag(s) {bad}; args are op names only")
    from un_datapipeline_spark.registry import all_operators

    only = set(sys.argv[1:]) or (set(VECTOR_OPS) & set(all_operators()))
    d = tempfile.mkdtemp(prefix="probe_mixdim_")
    build_mixdim(d)
    run_registry(d, only, app_name="probe-mixdim")
    shutil.rmtree(d, ignore_errors=True)
    return 0  # a worklist generator, not a gate — fails are the output


if __name__ == "__main__":
    sys.exit(main())
