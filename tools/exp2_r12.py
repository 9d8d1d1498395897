"""Round-12 experiments, part 2: running_sum full-group prelimit
equivalence; cosine component breakdown; base-stability checks."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

import pyspark.sql.functions as F  # noqa: E402

from un_datapipeline_spark.session import get_spark  # noqa: E402
from un_datapipeline_spark.tables import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def best7(fn):
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import bench

    spark = get_spark(app_name="r12-exp2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    bench._ensure_views(spark, SF)

    def width(n):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))

    # ---- running_sum: full-orderkey-group prelimit ---------------------
    rs_v3_sql = """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      WHERE l_orderkey <= (
        SELECT max(l_orderkey)
        FROM (SELECT l_orderkey FROM lineitem ORDER BY l_orderkey LIMIT 100)
      )
    )
    SELECT l_orderkey, l_linenumber,
           sum(l_extendedprice) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_rev
    FROM t
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """
    width(8)
    base1 = [tuple(r) for r in bench.running_sum_window(spark, SF).collect()]
    base2 = [tuple(r) for r in bench.running_sum_window(spark, SF).collect()]
    width(1)
    base_w1 = [tuple(r) for r in bench.running_sum_window(spark, SF).collect()]
    v3_w1 = [tuple(r) for r in spark.sql(rs_v3_sql).collect()]
    width(8)
    v3_w8 = [tuple(r) for r in spark.sql(rs_v3_sql).collect()]
    print("rs base rerun stable:", base1 == base2)
    print("rs base w1 == w8:", base1 == base_w1)
    print("rs v3(w1) == base(w8):", v3_w1 == base1)
    print("rs v3(w8) == base(w8):", v3_w8 == base1)
    width(8)
    for _ in range(2):
        bench.running_sum_window(spark, SF).collect()
    tb = best7(lambda: bench.running_sum_window(spark, SF).collect())
    width(1)
    for _ in range(2):
        spark.sql(rs_v3_sql).collect()
    t1 = best7(lambda: spark.sql(rs_v3_sql).collect())
    width(8)
    t8 = best7(lambda: spark.sql(rs_v3_sql).collect())
    print(f"rs base(w8)={tb:.4f} v3(w1)={t1:.4f} v3(w8)={t8:.4f}")

    # ---- cosine breakdown ----------------------------------------------
    from un_datapipeline_spark.operators.llm_vectors import cosine_topk, valid_vec

    em = load_table(spark, SF, "embeddings")

    width(8)

    def probes_collect():
        em.filter(F.col("vec_id") < 100).filter(valid_vec("embedding")).select(
            "vec_id", "embedding"
        ).collect()

    t_probes = best7(probes_collect)

    def kernel_only():
        probes = em.filter(F.col("vec_id") < 100)
        cand = cosine_topk(em, probes, k=1, require_gt=True)
        # strip the window: time just scan+mapInPandas via noop on the
        # candidates child — rebuild through cosine_topk then drop window
        # by writing the full thing? instead: reuse internal path below.
        return cand

    # candidates-only timing: replicate the mapInPandas stage via the
    # public API (cosine_topk builds window on top; we noop the full and
    # the no-window variant separately)
    import numpy as np
    import pandas as pd

    from un_datapipeline_spark.operators.llm_vectors import _topk_idx, _vec_matrix

    def cand_df():
        corpus = em.filter(valid_vec("embedding"))
        probes = em.filter(F.col("vec_id") < 100).filter(valid_vec("embedding"))
        rows = probes.select("vec_id", "embedding").collect()
        p_ids = np.array([r[0] for r in rows], dtype=np.int64)
        p_mat = np.array([r[1] for r in rows], dtype=np.float64)
        p_keep = np.linalg.norm(p_mat, axis=1) > 0
        p_ids, p_mat = p_ids[p_keep], p_mat[p_keep]
        p_mat /= np.linalg.norm(p_mat, axis=1, keepdims=True)

        def partial_topk(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                vkeep, b_mat = _vec_matrix(pdf, "embedding")
                b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)[vkeep]
                if b_mat.shape[0] == 0:
                    continue
                b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
                sims = b_mat @ p_mat.T
                sims = np.where(b_ids[:, None] <= p_ids[None, :], -np.inf, sims)
                idx = _topk_idx(sims, b_ids, 1)
                a = p_ids
                nn = b_ids[idx].ravel()
                sv = np.take_along_axis(sims, idx, axis=0).ravel()
                keep = np.isfinite(sv)
                yield pd.DataFrame({"a_id": a[keep], "nn_id": nn[keep], "sim": sv[keep]})

        return corpus.select("vec_id", "embedding").mapInPandas(
            partial_topk, "a_id long, nn_id long, sim double"
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for _ in range(2):
        noop(cand_df())
    t_cand = best7(lambda: noop(cand_df()))  # includes probes collect

    def full():
        bench.embeddings_cosine_topk(spark, SF).collect()

    for _ in range(2):
        full()
    t_full = best7(full)

    # corpus scan alone (no python): count via noop on the select
    def scan_only():
        noop(em.filter(valid_vec("embedding")).select("vec_id", "embedding"))

    for _ in range(2):
        scan_only()
    t_scan = best7(scan_only)

    print(
        f"cosine: probes_collect={t_probes:.4f} cand(noop,incl probes)={t_cand:.4f} "
        f"scan_only(noop)={t_scan:.4f} full={t_full:.4f}"
    )


if __name__ == "__main__":
    main()
