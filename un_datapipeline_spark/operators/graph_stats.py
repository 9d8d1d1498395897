"""Graph analytics over the order network: the customer↔supplier
bipartite graph induced by lineitem ⋈ orders (an edge wherever a
customer's order contained a supplier's line).

Two tiers, deliberately paired: ``graph_degree_stats`` is exact SQL —
hash-verified — while ``graph_pagerank`` is the iterative fixed-point
(rank sums are float accumulations whose ulps depend on partition
merge order, so it ships rows-only with conservation/stability
invariants in pytest — the llm_kmeans_cluster contract).

Scale posture: edges are deduplicated pairs (bounded by customers ×
suppliers, far below line items); the static edge+degree relation is
cached once and every PageRank iteration is ONE shuffle of (dst,
contribution) pairs — rank state lives in a DataFrame partitioned by
node, never on the driver.  localCheckpoint truncates the 10-iteration
lineage so the plan stays flat (the iterative-algorithm pattern shared
with llm_kmeans_cluster / llm_dedup_cluster)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table


def _bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer↔supplier edges, one row per direction."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


_DEGREE_ORACLE = """
WITH e AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), bi AS (
  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
), deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS degree FROM bi GROUP BY src
)
SELECT substr(node, 1, 1) AS node_type, degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1, 2
"""


@register("graph_degree_stats", oracle=_DEGREE_ORACLE, tier="T2")
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer↔supplier graph, split by node
    side: for each degree value, how many customers / suppliers have
    exactly that many distinct counterparties.  The first question asked
    of any graph (skew tells you whether PageRank-style propagation will
    have hot keys), and a pure two-shuffle SQL plan: distinct edges,
    count by node, count by (side, degree)."""
    deg = (
        _bipartite_edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy(
        F.substring("src", 1, 1).alias("node_type"), "degree"
    ).agg(F.count(F.lit(1)).alias("n_nodes"))


@register("graph_pagerank", oracle=None, tier="T3")
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 10 fixed iterations) over the undirected
    customer↔supplier graph — the canonical iterative-fixpoint workload,
    here expressed as pure DataFrame ops: the static edge⋈out-degree
    relation is cached once, each iteration shuffles (dst, rank/degree)
    contributions and folds them with one groupBy, and ranks never
    leave the cluster (contrast a driver-side adjacency walk, which
    dies at the first graph that outgrows one machine).  Both directions
    are materialized so no node dangles and total rank mass stays at
    n_nodes (Σpr = 0.15·n + 0.85·Σpr ⇒ Σpr = n, the pytest-asserted
    conservation invariant).  Rows-only: per-node sums are float
    accumulations whose last ulp depends on partition merge order.
    Returns the 20 highest-ranked nodes with their degrees."""
    edges = _bipartite_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    static = edges.join(deg, "src").persist()
    try:
        ranks = deg.select("src", F.lit(1.0).alias("rank"))
        for _ in range(10):
            contribs = (
                static.join(ranks, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") / F.col("degree")).alias("mass"))
            )
            ranks = contribs.select(
                F.col("dst").alias("src"),
                (0.15 + 0.85 * F.col("mass")).alias("rank"),
            ).localCheckpoint(eager=False)
        out = (
            ranks.join(deg, "src")
            .select(
                F.col("src").alias("node"),
                F.round("rank", 6).alias("rank"),
                "degree",
            )
            .orderBy(F.desc("rank"), "node")
            .limit(20)
        )
        # Freeze the 20-row result before unpersisting `static`: a lazy
        # plan would recompute the whole 10-iteration lineage against the
        # now-uncached relation when the caller finally acts on it.
        # localCheckpoint materializes the partitions cluster-side (no
        # driver round-trip, unlike createDataFrame(collect())).
        out = out.localCheckpoint(eager=True)
    finally:
        static.unpersist()
    return out


_JACCARD_ORACLE = """
WITH e AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
deg AS (SELECT supp, count(*) AS d FROM e GROUP BY supp),
common AS (
  SELECT a.supp AS s1, b.supp AS s2, count(*) AS c
  FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp
  GROUP BY a.supp, b.supp
)
SELECT s1, s2, c AS n_common,
       ROUND(c * 1.0 / (d1.d + d2.d - c), 6) AS jaccard
FROM common
JOIN deg d1 ON d1.supp = s1
JOIN deg d2 ON d2.supp = s2
ORDER BY jaccard DESC, s1, s2
LIMIT 20
"""


@register("graph_jaccard_neighbors", oracle=_JACCARD_ORACLE, tier="T3")
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node similarity by neighborhood overlap: for every supplier pair,
    Jaccard of their customer sets (shared customers / union), top-20.

    Pair generation is the per-customer self-join — fan-out per customer
    is (suppliers-of-customer)², which is safe HERE because the supplier
    axis is a bounded dimension (every customer buys from at most
    |supplier| vendors), and that bound is what makes the exact oracle
    feasible.  On an unbounded graph (doc↔shingle, user↔item) the same
    statement must go through the capped/bucketed machinery instead:
    llm_dedup_ngram_jaccard's MAX_GRAM_DF hub cap, or MinHash
    (llm_dedup_near_minhash) when even capped exact counting is too
    wide — this operator is the exact-small-graph end of that ladder.
    One shuffle for distinct edges, one for the pair counts, broadcast
    degree join, deterministic (jaccard DESC, s1, s2) order; the
    division is a single float op on exact integers, so it hash-matches
    bit-for-bit."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    deg = e.groupBy("supp").agg(F.count(F.lit(1)).alias("d"))
    a = e.alias("a")
    b = e.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.supp") < F.col("b.supp")),
        )
        .groupBy(F.col("a.supp").alias("s1"), F.col("b.supp").alias("s2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    d1 = deg.select(F.col("supp").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("supp").alias("s2"), F.col("d").alias("d2"))
    return (
        common.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            "n_common",
            F.round(
                F.col("n_common") / (F.col("d1") + F.col("d2") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "s1", "s2")
        .limit(20)
    )
