"""Round-12 optimization experiments: A/B candidate rewrites vs current
bench queries, with row-for-row equality checks.

Each experiment times best-of-7 collect() under bench.py's exact session
confs and prints `name  base_s  var_s  equal`.  Nothing here ships; the
winners get folded into bench.py / operators with plan captures.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

import pyspark.sql.functions as F  # noqa: E402

from un_datapipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def best7(fn):
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def rows_equal(a, b) -> bool:
    ka = sorted(tuple(r) for r in a)
    kb = sorted(tuple(r) for r in b)
    return ka == kb


def main() -> None:
    import bench

    spark = get_spark(app_name="r12-exp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    bench._ensure_views(spark, SF)

    def width(n):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))

    def run_ab(name, base_fn, var_fn, w_base, w_var, ordered=False):
        width(w_base)
        base_rows = base_fn().collect()
        width(w_var)
        var_rows = var_fn().collect()
        eq = (
            [tuple(r) for r in base_rows] == [tuple(r) for r in var_rows]
            if ordered
            else rows_equal(base_rows, var_rows)
        )
        width(w_base)
        for _ in range(2):
            base_fn().collect()
        tb = best7(lambda: base_fn().collect())
        width(w_var)
        for _ in range(2):
            var_fn().collect()
        tv = best7(lambda: var_fn().collect())
        print(f"{name:34s} base={tb:7.4f} var={tv:7.4f} equal={eq}")

    # ---- 1. running_sum: pre-limit before the window ------------------
    # (l_orderkey, l_linenumber) is the lineitem PK; the running-sum frame
    # of any top-100 row only references rows that sort strictly before it
    # (same partition, smaller linenumber), which are inside the top 100.
    rs_base = lambda: bench.running_sum_window(spark, SF)
    rs_v2_sql = """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
    )
    SELECT l_orderkey, l_linenumber,
           sum(l_extendedprice) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_rev
    FROM t
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """
    run_ab("running_sum prelimit", rs_base, lambda: spark.sql(rs_v2_sql), 8, 1, ordered=True)

    # ---- 2. topk_per_group: custkey-threshold pre-filter ---------------
    # Every custkey contributes >=1 row (rn=1), so rows beyond the 100th
    # smallest DISTINCT custkey cannot reach the top 100 of (custkey, rn).
    tk_base = lambda: bench.topk_per_group_window(spark, SF)
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
    run_ab("topk threshold prefilter", tk_base, lambda: spark.sql(tk_v2_sql), 8, 1)

    # ---- 3. events_json: parallelize the parse ------------------------
    ej_base = lambda: bench.events_json_extract(spark, SF)
    ej_v2_sql = """
    SELECT event_type,
           avg(variant_get(parse_json(props), '$.k', 'int')) AS avg_k
    FROM (SELECT /*+ REPARTITION(8) */ event_type, props FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """
    run_ab("events_json repartition8", ej_base, lambda: spark.sql(ej_v2_sql), 1, 1)

    # ---- 4. q5: shuffled-hash the fact joins at width 8 ----------------
    q5_base = lambda: bench.q5_regional_revenue(spark, SF)
    q5_v2_sql = """
    WITH dim AS (
      SELECT /*+ BROADCAST(s) */ s_suppkey, n_name
      FROM supplier s
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    SELECT /*+ BROADCAST(dim), SHUFFLE_HASH(orders, customer) */ n_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem
    JOIN dim       ON l_suppkey = dim.s_suppkey
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    GROUP BY n_name
    ORDER BY revenue DESC
    """
    run_ab("q5 shuffle-hash facts w8", q5_base, lambda: spark.sql(q5_v2_sql), 1, 8)

    # ---- 5. asof: semi-filter orders before the outer join -------------
    asof_base = lambda: bench.asof_style_join(spark, SF)
    asof_v2_sql = """
    WITH e AS (
      SELECT event_id, ts, user_id FROM events ORDER BY event_id LIMIT 100
    ),
    o AS (
      SELECT /*+ BROADCAST(e2) */ o_orderkey, o_orderdate, o_custkey
      FROM orders JOIN (SELECT DISTINCT user_id FROM e) e2
        ON o_custkey = e2.user_id
    )
    SELECT /*+ BROADCAST(o) */ e.event_id, e.ts,
           max_by(o_orderkey, struct(o_orderdate, o_orderkey)) AS o_orderkey
    FROM e LEFT JOIN o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    GROUP BY e.event_id, e.ts
    ORDER BY e.event_id
    LIMIT 100
    """
    run_ab("asof semi-filtered orders", asof_base, lambda: spark.sql(asof_v2_sql), 1, 1)

    # ---- 6. cosine: width-1 window vs k=1 max_by aggregate -------------
    cos_base = lambda: bench.embeddings_cosine_topk(spark, SF)
    run_ab("cosine width1 (same plan)", cos_base, cos_base, 8, 1)

    from un_datapipeline_spark.tables import load_table

    # k=1 max_by path: re-run kernel stage by hand
    import numpy as np
    import pandas as pd

    def cos_maxby():
        from un_datapipeline_spark.operators.llm_vectors import (
            _topk_idx,
            _vec_matrix,
            valid_vec,
        )

        em = load_table(spark, SF, "embeddings")
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
                b_keep = np.linalg.norm(b_mat, axis=1) > 0
                if not b_keep.all():
                    b_ids, b_mat = b_ids[b_keep], b_mat[b_keep]
                if b_mat.shape[0] == 0:
                    continue
                b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
                sims = b_mat @ p_mat.T
                mask = b_ids[:, None] <= p_ids[None, :]
                sims = np.where(mask, -np.inf, sims)
                kk = min(1, sims.shape[0])
                idx = _topk_idx(sims, b_ids, kk)
                a = np.repeat(p_ids[None, :], kk, axis=0).ravel()
                nn = b_ids[idx].ravel()
                sv = np.take_along_axis(sims, idx, axis=0).ravel()
                keep = np.isfinite(sv)
                yield pd.DataFrame({"a_id": a[keep], "nn_id": nn[keep], "sim": sv[keep]})

        cand = corpus.select("vec_id", "embedding").mapInPandas(
            partial_topk, "a_id long, nn_id long, sim double"
        )
        best = cand.groupBy("a_id").agg(
            F.expr("max_by(struct(nn_id, sim), struct(sim, -nn_id))").alias("b")
        )
        return (
            best.select(
                F.col("a_id").alias("vec_id"),
                F.col("b.nn_id").alias("nn_id"),
                F.col("b.sim").alias("sim"),
            )
            .orderBy("vec_id")
            .limit(100)
        )

    run_ab("cosine k1 max_by agg", cos_base, cos_maxby, 8, 1)

    # ---- 7. q1 / scans: split-size A/B (single row-group files) --------
    q1 = lambda: bench.q1_pricing_summary(spark, SF)
    width(1)
    for mb in ("1m", "4m", "128m"):
        spark.conf.set("spark.sql.files.maxPartitionBytes", mb)
        for _ in range(2):
            q1().collect()
        t = best7(lambda: q1().collect())
        print(f"q1 maxPartitionBytes={mb:5s} best={t:7.4f}")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")


if __name__ == "__main__":
    main()
