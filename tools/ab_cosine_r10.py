"""Counterbalanced same-run A/B of the cosine bench path (VERDICT r09
item 4): did the round-9 NULL-vector guard cause the 38%
`embeddings_cosine_topk` regression (same-run ratio 1.70x -> 2.15x), or
was it box drift?

Three kernel variants, all running the SAME bench query shape
(bench.embeddings_cosine_topk: probes vec_id<100, k=1, require_gt) in
ONE Spark session, ABBA-counterbalanced so JVM warmup / box drift
cancels:

* r08  — the pre-guard kernel: no filter, single
         ``np.array(list(col))`` batch conversion (git 2caf21d).
* r09  — the as-shipped round-9 guard: interpreted ``F.exists``
         higher-order filter + per-cell python loop in _vec_matrix.
* vec  — the CURRENT module state (after the round-10 vectorization
         commit: size()+array_compact filter, single-np.array matrix
         build with matrix-wise isnan).

The query pipeline is rebuilt here with the filter/matrix fns passed as
CLOSURE captures, not by monkeypatching llm_vectors — module-level
functions pickle BY REFERENCE, so a driver-side monkeypatch would
silently never reach the Python workers and the A/B would measure
nothing.  Results are asserted identical across variants on the shipped
(clean) corpus first, so the A/B never trades correctness for speed
silently.

Usage:
    python tools/ab_cosine_r10.py [reps]   # default 6 reps per variant
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cosine_topk_with(em, probes, k, filter_fn, matrix_fn):
    """llm_vectors.cosine_topk's exact pipeline (require_gt=True bench
    shape) with the guard layers injected, so each variant's closures
    ship to the workers by VALUE."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from un_datapipeline_spark.operators.llm_vectors import _topk_idx

    if filter_fn is not None:
        em = em.filter(filter_fn("embedding"))
        probes = probes.filter(filter_fn("embedding"))
    rows = probes.select("vec_id", "embedding").collect()
    p_ids = np.array([r[0] for r in rows], dtype=np.int64)
    p_mat = (
        np.array([r[1] for r in rows], dtype=np.float64)
        if rows
        else np.zeros((0, 0))
    )
    p_keep = np.linalg.norm(p_mat, axis=1) > 0
    p_ids, p_mat = p_ids[p_keep], p_mat[p_keep]
    p_mat /= np.linalg.norm(p_mat, axis=1, keepdims=True)

    def partial_topk(batches):
        if p_mat.shape[0] == 0:
            return
        for pdf in batches:
            if pdf.empty:
                continue
            vkeep, b_mat = matrix_fn(pdf, "embedding")
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)[vkeep]
            if b_mat.shape[0] == 0:
                continue
            b_keep = np.linalg.norm(b_mat, axis=1) > 0
            if not b_keep.all():
                b_ids, b_mat = b_ids[b_keep], b_mat[b_keep]
            if b_mat.shape[0] == 0:
                continue
            b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = b_mat @ p_mat.T
            mask = b_ids[:, None] <= p_ids[None, :]
            sims = np.where(mask, -np.inf, sims)
            kk = min(k, sims.shape[0])
            idx = _topk_idx(sims, b_ids, kk)
            a = np.repeat(p_ids[None, :], kk, axis=0).ravel()
            nn = b_ids[idx].ravel()
            sv = np.take_along_axis(sims, idx, axis=0).ravel()
            keep = np.isfinite(sv)
            yield pd.DataFrame({"a_id": a[keep], "nn_id": nn[keep], "sim": sv[keep]})

    candidates = em.select("vec_id", "embedding").mapInPandas(
        partial_topk, "a_id long, nn_id long, sim double"
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("nn_id"))
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _variants():
    """name -> (filter_fn | None, matrix_fn); closures defined HERE so
    cloudpickle ships them by value."""
    import numpy as np
    import pyspark.sql.functions as F

    from un_datapipeline_spark.operators import llm_vectors as lv

    def r08_matrix(pdf, vec_col):
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        return np.ones(len(mat), dtype=bool), mat

    def r09_filter(col="embedding"):
        return F.col(col).isNotNull() & ~F.exists(col, lambda x: x.isNull())

    def r09_matrix(pdf, vec_col):
        cells = [
            None if c is None else np.asarray(c, dtype=np.float64)
            for c in pdf[vec_col]
        ]
        dim = next((len(c) for c in cells if c is not None), 0)
        keep = np.array(
            [
                c is not None and len(c) == dim and not np.isnan(c).any()
                for c in cells
            ],
            dtype=bool,
        )
        if keep.all():
            mat = np.array(cells, dtype=np.float64) if cells else np.zeros((0, dim))
        else:
            mat = (
                np.array([c for c, k in zip(cells, keep) if k], dtype=np.float64)
                if keep.any()
                else np.zeros((0, dim))
            )
        return keep, mat

    return {
        "r08": (None, r08_matrix),
        "r09": (r09_filter, r09_matrix),
        "vec": (lv.valid_vec, lv._vec_matrix),  # current on-disk state
    }


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from un_datapipeline_spark.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-cosine")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    variants = _variants()

    def run(name):
        filt, matx = variants[name]
        em = load_table(spark, SF_DIR, "embeddings")
        probes = em.filter(F.col("vec_id") < 100)
        df = (
            cosine_topk_with(em, probes, 1, filt, matx)
            .select(F.col("a_id").alias("vec_id"), "nn_id", "sim")
            .orderBy("vec_id")
            .limit(100)
        )
        t0 = time.perf_counter()
        rows = df.collect()
        return time.perf_counter() - t0, rows

    # Correctness gate: identical answers on the clean corpus
    answers = {}
    for name in variants:
        _, rows = run(name)
        answers[name] = [(r.vec_id, r.nn_id, round(r.sim, 6)) for r in rows]
    base = answers["r08"]
    for name, rows in answers.items():
        assert rows == base, f"variant {name} changed the answer on clean data"
    print(f"answers identical across variants ({len(base)} rows)")

    names = list(variants)
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        order = names if rep % 2 == 0 else names[::-1]
        for n in order:
            dt, _ = run(n)
            times[n].append(dt)

    for n in names:
        xs = sorted(times[n])
        med = xs[len(xs) // 2]
        print(
            f"{n}: median {med:.3f}s  min {xs[0]:.3f}  max {xs[-1]:.3f}  "
            f"all {[round(x, 3) for x in times[n]]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
