"""Invariant tests for the sketch / source-evolution / quarantine batch
(round 2 batch 4).  SQL-matched ops also run in test_oracle_parity;
these cover sketch algebra and scan-level plan properties the hash
can't see."""

from __future__ import annotations

import pyspark.sql.functions as F

from un_datapipeline_spark.operators.aggregations import (
    agg_freq_sketch_cms,
    agg_sketch_mergeable,
)
from un_datapipeline_spark.operators.etl import etl_quarantine_bad_rows
from un_datapipeline_spark.operators.sources import src_schema_evolution
from un_datapipeline_spark.tables import load_table


def test_hll_merge_equals_global_and_near_truth(spark, sf_smoke):
    rows = {r.scope: r.est for r in agg_sketch_mergeable(spark, sf_smoke).collect()}
    assert set(rows) == {"merged", "global"}
    # mergeability: union of partial sketches IS the global sketch
    assert rows["merged"] == rows["global"]
    truth = (
        load_table(spark, sf_smoke, "customer")
        .select("c_custkey")
        .distinct()
        .count()
    )
    assert abs(rows["global"] - truth) / truth < 0.02


def test_cms_estimates_dominate_truth(spark, sf_smoke):
    est = {r.event_type: r.est_count for r in agg_freq_sketch_cms(spark, sf_smoke).collect()}
    truth = {
        r.event_type: r["count"]
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert set(est) == set(truth)
    for k, t in truth.items():
        # CMS guarantee: estimate never undercounts
        assert est[k] >= t


def test_schema_evolution_union_schema(spark, sf_smoke):
    r = src_schema_evolution(spark, sf_smoke).collect()[0]
    s = load_table(spark, sf_smoke, "supplier")
    n = s.count()
    assert r.n == n
    assert r.n_with_bal + r.n_with_nation == n, "each generation owns its column"


def test_quarantine_accounts_for_every_row(spark, sf_smoke):
    r = etl_quarantine_bad_rows(spark, sf_smoke).collect()[0]
    e = load_table(spark, sf_smoke, "events")
    assert r.n_total == e.count()
    assert r.n_good + r.n_quarantined == r.n_total
    assert r.n_quarantined == e.filter("event_id % 97 = 0").count()


def test_partitioned_sink_prunes_partitions(spark, sf_smoke, tmp_path):
    """Hive-partitioned layout must prune at planning time: a filter on
    the partition column reads only that directory (PartitionFilters in
    the scan, no pushed data filter needed)."""
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    out = str(tmp_path / "part_pq")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "A")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    # correctness of the pruned read
    want = li.filter("l_returnflag = 'A'").count()
    assert back.count() == want


def test_clustered_write_files_cover_disjoint_ranges(spark, sf_smoke):
    """sink_clustered_write's promise: each output file owns a disjoint
    l_shipdate slice (footer min/max don't interleave), so a date-window
    scan can skip whole files.  Audited straight from the parquet
    footers."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from un_datapipeline_spark.operators.sources import clustered_write

    out = clustered_write(spark, sf_smoke)
    ranges = []
    for f in sorted(Path(out).glob("*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # l_shipdate is first column
            assert col.path_in_schema == "l_shipdate"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2, "expected multiple clustered files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        # ranges may touch at a boundary value, never interleave past it
        assert hi1 <= lo2, f"file ranges interleave: {(lo1, hi1)} vs {(lo2, hi2)}"


def test_observe_metrics_single_pass_consistency(spark, sf_smoke):
    from un_datapipeline_spark.operators.sources import src_observe_metrics

    r = src_observe_metrics(spark, sf_smoke).collect()[0]
    assert 0 < r.rows_kept <= r.rows_scanned
    assert 0 < r.cents_kept <= r.cents_scanned


def test_python_datasource_partition_coverage(spark, sf_smoke):
    from un_datapipeline_spark.operators.sources import src_python_datasource

    rows = src_python_datasource(spark, sf_smoke).collect()
    assert {r.label for r in rows} == {"row%d" % i for i in range(7)}
    assert sum(r.n for r in rows) == 1000, "all 4 partitions read exactly once"


def test_transpose_roundtrip_shape(spark, sf_smoke):
    from un_datapipeline_spark.operators.reshape import reshape_transpose

    rows = reshape_transpose(spark, sf_smoke).collect()
    assert {r.key for r in rows} == {"sum_qty", "sum_price", "n_rows"}
    df = reshape_transpose(spark, sf_smoke)
    # lowercase by construction (r05 driver hash-fail: Spark transpose
    # promotes the flag values verbatim-uppercase; the op renames them so
    # both engine texts agree under a case-SENSITIVE canonicalizer)
    assert set(df.columns) == {"key", "a", "n", "r"}
