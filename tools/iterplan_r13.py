"""Round-13 plan evidence for the iterative graph ops.

The ops eager-checkpoint their (small) results, so `explain` on the
returned DataFrame shows only the checkpoint stub — the interesting
plan is the PER-ROUND join inside the loop.  This probe rebuilds the
first round of each loop exactly as the operator does (same helpers,
same pinned width, same persisted pre-partitioned relation) and dumps
its formatted plan to plans/r13/<name>_iterplan.txt.

Usage: python tools/iterplan_r13.py <sf_dir>
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

PLANS = os.path.join(REPO, "plans", "r13")


def dump(df, name: str) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(PLANS, f"{name}_iterplan.txt"), "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    n_ex = txt.count("Exchange")
    print(f"{name}: {n_ex} Exchange refs in the per-round plan", flush=True)


def main() -> None:
    sf_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("iterplan-r13")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from un_datapipeline_spark.operators import graph_stats as G
    from un_datapipeline_spark.session import pinned_shuffle_width

    # --- pagerank: one iteration over the persisted pre-partitioned static
    from pyspark.storagelevel import StorageLevel

    edges = G._bipartite_edges(spark, sf_dir).localCheckpoint(
        storageLevel=StorageLevel.DISK_ONLY
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    with pinned_shuffle_width(spark):
        static = edges.join(deg, "src").repartition("src").persist()
        ranks = deg.select("src", F.lit(1.0).alias("rank"))
        contribs = (
            static.join(ranks.hint("shuffle_hash"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("degree")).alias("mass"))
        )
        dump(contribs, "graph_pagerank")
        static.unpersist()

    # --- LPA: one round over the persisted v-partitioned bidir
    e, bidir, labels = G._lpa_state(spark, sf_dir)
    with pinned_shuffle_width(spark):
        cnt = (
            bidir.join(labels.select(F.col("node").alias("v"), "lbl"), "v")
            .groupBy(F.col("u").alias("node"), F.col("lbl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        dump(cnt, "graph_label_propagation")
    bidir.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
