"""Round-12 experiments, part 3: rollup two-level decomposition,
4m-split re-timings of winning rewrites, mapInArrow cosine prototype."""

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

    spark = get_spark(app_name="r12-exp3")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    bench._ensure_views(spark, SF)

    def width(n):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))

    # ---- rollup: two-level aggregation ----------------------------------
    ru_v2_sql = """
    SELECT l_returnflag, l_linestatus, sum(sq) AS sq
    FROM (SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq
          FROM lineitem GROUP BY l_returnflag, l_linestatus)
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """
    width(1)
    base = [tuple(r) for r in bench.rollup_agg(spark, SF).collect()]
    v2 = [tuple(r) for r in spark.sql(ru_v2_sql).collect()]
    print("rollup v2 equal:", base == v2)
    for _ in range(2):
        bench.rollup_agg(spark, SF).collect()
    tb = best7(lambda: bench.rollup_agg(spark, SF).collect())
    for _ in range(2):
        spark.sql(ru_v2_sql).collect()
    tv = best7(lambda: spark.sql(ru_v2_sql).collect())
    print(f"rollup base={tb:.4f} v2={tv:.4f}")

    # ---- winning set re-timed at 4m -------------------------------------
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
    ej_v2_sql = """
    SELECT event_type,
           avg(variant_get(parse_json(props), '$.k', 'int')) AS avg_k
    FROM (SELECT /*+ REPARTITION(8) */ event_type, props FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """
    tk_v2_sql = """
    WITH ck AS (SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey LIMIT 100)
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
      FROM orders
      WHERE o_custkey <= (SELECT max(o_custkey) FROM ck)
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    LIMIT 100
    """
    for name, base_fn, sql, wb, wv in (
        ("running_sum", lambda: bench.running_sum_window(spark, SF), rs_v3_sql, 8, 8),
        ("events_json", lambda: bench.events_json_extract(spark, SF), ej_v2_sql, 1, 1),
        ("topk", lambda: bench.topk_per_group_window(spark, SF), tk_v2_sql, 8, 8),
    ):
        width(wb)
        b_rows = [tuple(r) for r in base_fn().collect()]
        width(wv)
        v_rows = [tuple(r) for r in spark.sql(sql).collect()]
        eq = b_rows == v_rows
        width(wb)
        for _ in range(2):
            base_fn().collect()
        tb = best7(lambda: base_fn().collect())
        width(wv)
        for _ in range(2):
            spark.sql(sql).collect()
        tv = best7(lambda: spark.sql(sql).collect())
        print(f"{name} base={tb:.4f} v={tv:.4f} equal={eq}")

    # topk at width 1 too
    width(1)
    for _ in range(2):
        spark.sql(tk_v2_sql).collect()
    print("topk v2 w1:", round(best7(lambda: spark.sql(tk_v2_sql).collect()), 4))
    width(1)
    for _ in range(2):
        spark.sql(rs_v3_sql).collect()
    print("rs v3 w1:", round(best7(lambda: spark.sql(rs_v3_sql).collect()), 4))

    # ---- cosine mapInArrow prototype ------------------------------------
    import numpy as np
    import pyarrow as pa

    from un_datapipeline_spark.operators.llm_vectors import (
        _topk_idx,
        valid_vec,
    )

    em = load_table(spark, SF, "embeddings")

    def cos_arrow():
        corpus = em.filter(valid_vec("embedding"))
        probes = em.filter(F.col("vec_id") < 100).filter(valid_vec("embedding"))
        rows = probes.select("vec_id", "embedding").collect()
        p_ids = np.array([r[0] for r in rows], dtype=np.int64)
        p_mat = np.array([r[1] for r in rows], dtype=np.float64)
        keep = np.linalg.norm(p_mat, axis=1) > 0
        p_ids, p_mat = p_ids[keep], p_mat[keep]
        p_mat /= np.linalg.norm(p_mat, axis=1, keepdims=True)

        def partial_topk(batches):
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                ids_col = rb.column(0)
                emb = rb.column(1)
                if isinstance(emb, pa.ChunkedArray):
                    emb = emb.combine_chunks()
                flat = emb.flatten()
                b_mat = (
                    flat.to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(rb.num_rows, -1)
                )
                b_ids = ids_col.to_numpy(zero_copy_only=False).astype(np.int64)
                nrm = np.linalg.norm(b_mat, axis=1)
                k2 = nrm > 0
                if not k2.all():
                    b_ids, b_mat, nrm = b_ids[k2], b_mat[k2], nrm[k2]
                if b_mat.shape[0] == 0:
                    continue
                b_mat /= nrm[:, None]
                sims = b_mat @ p_mat.T
                sims = np.where(b_ids[:, None] <= p_ids[None, :], -np.inf, sims)
                idx = _topk_idx(sims, b_ids, 1)
                nn = b_ids[idx].ravel()
                sv = np.take_along_axis(sims, idx, axis=0).ravel()
                ok = np.isfinite(sv)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(p_ids[ok], type=pa.int64()),
                        pa.array(nn[ok], type=pa.int64()),
                        pa.array(sv[ok], type=pa.float64()),
                    ],
                    names=["a_id", "nn_id", "sim"],
                )

        cand = corpus.select("vec_id", "embedding").mapInArrow(
            partial_topk, "a_id long, nn_id long, sim double"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("nn_id"))
        return (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 1)
            .drop("rn")
            .select(F.col("a_id").alias("vec_id"), "nn_id", "sim")
            .orderBy("vec_id")
            .limit(100)
        )

    width(8)
    base_rows = [tuple(r) for r in bench.embeddings_cosine_topk(spark, SF).collect()]
    v_rows = [tuple(r) for r in cos_arrow().collect()]
    print("cosine arrow equal:", base_rows == v_rows)
    for _ in range(2):
        bench.embeddings_cosine_topk(spark, SF).collect()
    tb = best7(lambda: bench.embeddings_cosine_topk(spark, SF).collect())
    for _ in range(2):
        cos_arrow().collect()
    tv = best7(lambda: cos_arrow().collect())
    print(f"cosine base={tb:.4f} arrow={tv:.4f}")


if __name__ == "__main__":
    main()
