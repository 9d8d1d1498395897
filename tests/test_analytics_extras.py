"""Invariant tests for the analytics_extras batch: cohort retention,
linear interpolation, entropy/Gini, z-order sink, OHLC bars, XML and
VARIANT roundtrips, CUSUM changepoint.  Value parity vs DuckDB is
covered by strict_diff / the driver oracle; these assert the semantic
properties the hashes can't express."""

from __future__ import annotations

import glob
import math

import pyarrow.parquet as pq

from un_datapipeline_spark.operators.analytics_extras import (
    agg_cohort_retention,
    agg_entropy_gini,
    fn_variant_json,
    fn_xml_roundtrip,
    sink_zorder_write,
    ts_cusum_changepoint,
    ts_interpolate_linear,
    ts_ohlc_bars,
    zorder_write,
)
from un_datapipeline_spark.tables import load_table


def test_cohort_week_zero_is_full(spark, sf_smoke):
    rows = agg_cohort_retention(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 < r.retention_pct <= 1.0
        assert r.active_users <= r.cohort_size
        if r.week_offset == 0:
            # every user is active in their own first week by definition
            assert r.active_users == r.cohort_size
            assert r.retention_pct == 1.0


def test_interpolation_grid_dense_and_bounded(spark, sf_smoke):
    rows = ts_interpolate_linear(spark, sf_smoke).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.hour)
        # dense hourly spine, observed endpoints
        assert series[0].interpolated == 0 and series[-1].interpolated == 0
        hours = [r.hour for r in series]
        assert all(
            (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
        )
        # interpolated values lie within the neighboring observed values
        for i, r in enumerate(series):
            if r.interpolated:
                prev = next(
                    s for s in reversed(series[:i]) if not s.interpolated
                )
                nxt = next(s for s in series[i + 1 :] if not s.interpolated)
                lo, hi = sorted((prev.val, nxt.val))
                assert lo - 1e-6 <= r.val <= hi + 1e-6


def test_entropy_gini_bounds(spark, sf_smoke):
    for r in agg_entropy_gini(spark, sf_smoke).collect():
        assert -1e-9 <= r.entropy <= math.log(r.n_langs) + 1e-9, (
            "entropy bounded by ln(k)"
        )
        assert -1e-9 <= r.gini <= 1.0 - 1.0 / r.n_langs + 1e-9
        assert r.n_langs <= r.n_docs


def test_zorder_buckets_confine_both_dims(spark, sf_smoke):
    for r in sink_zorder_write(spark, sf_smoke).collect():
        # top-4 z-bits fix the top 2 bits of each dimension: every bucket
        # spans at most a quarter of either domain — the both-dims
        # pruning property a 1-D sort cannot give
        assert r.max_px - r.min_px <= 63
        assert r.max_sx - r.min_sx <= 63
        assert (r.min_z >> 12) == (r.max_z >> 12) == r.bucket


def test_zorder_files_disjoint_on_zcode(spark, sf_smoke):
    out = zorder_write(spark, sf_smoke)
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("zcode")
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    ranges.sort()
    assert len(ranges) >= 2
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, "files must own disjoint z-ranges for footer pruning"


def test_ohlc_bar_consistency(spark, sf_smoke):
    for r in ts_ohlc_bars(spark, sf_smoke).collect():
        assert r.low <= min(r.open, r.close)
        assert r.high >= max(r.open, r.close)
        assert r.n_events >= 1
        assert r.volume >= r.low * r.n_events - 1e-6


def test_xml_roundtrip_lossless(spark, sf_smoke):
    df = fn_xml_roundtrip(spark, sf_smoke)
    o = load_table(spark, sf_smoke, "orders")
    assert df.count() == o.count()
    bad = df.filter(
        (df.parsed_id != df.o_orderkey)
        | df.parsed_id.isNull()
        | (df.xpath_status != df.parsed_status)
    ).count()
    assert bad == 0


def test_variant_extraction_total(spark, sf_smoke):
    rows = fn_variant_json(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.k_missing == 0
        assert r.canon_json == '{"k":%d}' % r.k_val


def test_cusum_one_changepoint_per_type(spark, sf_smoke):
    rows = ts_cusum_changepoint(spark, sf_smoke).collect()
    e = load_table(spark, sf_smoke, "events")
    types = {r.event_type for r in e.select("event_type").distinct().collect()}
    assert {r.event_type for r in rows} == types
    for r in rows:
        assert r.cusum_score >= 0
        assert r.n_days >= 1


def test_collation_counts_nest(spark, sf_smoke):
    from un_datapipeline_spark.operators.analytics_extras import (
        fn_collation_compare,
    )

    r = fn_collation_compare(spark, sf_smoke).collect()[0]
    # case-insensitive distinct can never exceed binary distinct
    assert r.distinct_lcase <= r.distinct_binary <= r.n_rows
    # the mangling creates real case variants, so collation must matter
    assert r.distinct_lcase < r.distinct_binary


def test_rolling_regression_full_frames_only(spark, sf_smoke):
    from un_datapipeline_spark.operators.analytics_extras import (
        win_rolling_regression,
    )

    rows = win_rolling_regression(spark, sf_smoke).collect()
    assert rows
    by_type: dict[str, int] = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + 1
        assert r.beta_per_day is not None
    # n_days - 6 full frames per series
    assert len(set(by_type.values())) == 1


def test_quantile_bands_partition_orders(spark, sf_smoke):
    from un_datapipeline_spark.operators.analytics_extras import (
        agg_quantile_bands,
    )

    rows = sorted(agg_quantile_bands(spark, sf_smoke).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert max(r.n for r in rows) - min(r.n for r in rows) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.band_max <= b.band_min, "bands must not overlap"


def test_time_to_convert_ordered_percentiles(spark, sf_smoke):
    from un_datapipeline_spark.operators.analytics_extras import (
        agg_time_to_convert,
    )

    r = agg_time_to_convert(spark, sf_smoke).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.p25_hours <= r.p50_hours <= r.p90_hours


def test_k_anonymity_accounting(spark, sf_smoke):
    from un_datapipeline_spark.operators.analytics_extras import (
        etl_k_anonymity,
    )

    r = etl_k_anonymity(spark, sf_smoke).collect()[0]
    assert r.n_groups_below_k <= r.n_groups
    assert r.k == 10
    if r.n_groups_below_k > 0:
        assert r.n_rows_suppressed > 0
    assert r.n_rows_suppressed + r.n_rows_published > 0
