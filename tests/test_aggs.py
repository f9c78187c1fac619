"""Aggregations vs in-memory pandas/duckdb ground truth at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from opensearch_ray.aggs import (
    bucket_script, bucket_selector, bucket_sort, cardinality_exact,
    cardinality_hll, composite_agg, cumulative_sum, date_histogram_agg,
    derivative, extended_stats_agg, filters_agg, histogram_agg, missing_agg,
    moving_fn, multi_terms_agg, percentiles_tdigest, range_agg, rare_terms_agg,
    significant_terms_agg, stats_agg, stats_bucket, terms_agg, top_hits_agg,
    value_count_agg, weighted_avg_agg, matrix_stats_agg, scripted_metric_agg,
)


@pytest.fixture(scope="module")
def li(sf_dir):
    return rd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def li_pdf(sf_dir):
    return pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()


@pytest.fixture(scope="module")
def ev(sf_dir):
    return rd.read_parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def ev_pdf(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_terms_agg(li, li_pdf):
    out = terms_agg(li, "l_returnflag", size=10)
    want = (li_pdf.groupby("l_returnflag").size().reset_index(name="doc_count")
            .sort_values(["doc_count", "l_returnflag"], ascending=[False, True]))
    assert out["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert out["doc_count"].tolist() == want["doc_count"].tolist()


def test_multi_and_rare_terms(li, li_pdf):
    out = multi_terms_agg(li, ["l_returnflag", "l_linestatus"])
    want = li_pdf.groupby(["l_returnflag", "l_linestatus"]).size()
    for _, r in out.iterrows():
        assert want[(r["l_returnflag"], r["l_linestatus"])] == r["doc_count"]
    rare = rare_terms_agg(li, "l_returnflag", max_doc_count=10**9)
    assert set(rare["l_returnflag"]) == set(li_pdf["l_returnflag"].unique())


def test_stats_and_extended(li, li_pdf):
    out = stats_agg(li, "l_quantity").iloc[0]
    assert out["count"] == len(li_pdf)
    assert out["min"] == li_pdf["l_quantity"].min()
    assert out["max"] == li_pdf["l_quantity"].max()
    assert abs(out["sum"] - li_pdf["l_quantity"].sum()) < 1e-6
    ext = extended_stats_agg(li, "l_discount").iloc[0]
    assert abs(ext["variance"] - li_pdf["l_discount"].var(ddof=0)) < 1e-9
    assert abs(ext["std_deviation"] - li_pdf["l_discount"].std(ddof=0)) < 1e-9


def test_value_count_weighted_avg(li, li_pdf):
    assert value_count_agg(li, "l_partkey") == li_pdf["l_partkey"].notna().sum()
    wa = weighted_avg_agg(li, "l_extendedprice", "l_quantity")
    want = (li_pdf["l_extendedprice"] * li_pdf["l_quantity"]).sum() / li_pdf["l_quantity"].sum()
    assert abs(wa - want) < 1e-9


def test_cardinality_exact_and_hll(li, li_pdf, ev, ev_pdf):
    exact = cardinality_exact(li, "l_partkey")
    assert exact == li_pdf["l_partkey"].nunique()
    est = cardinality_hll(ev, "user_id")
    true = ev_pdf["user_id"].nunique()
    assert abs(est - true) <= max(2, 0.05 * true)  # HLL p=14 ~0.8% error


def test_percentiles_tdigest(li, li_pdf):
    out = percentiles_tdigest(li, "l_extendedprice", qs=(50, 95)).iloc[0]
    want50 = np.percentile(li_pdf["l_extendedprice"], 50)
    want95 = np.percentile(li_pdf["l_extendedprice"], 95)
    spread = li_pdf["l_extendedprice"].max() - li_pdf["l_extendedprice"].min()
    assert abs(out["p50"] - want50) < 0.02 * spread
    assert abs(out["p95"] - want95) < 0.02 * spread


def test_histograms(ev, ev_pdf):
    out = histogram_agg(ev, "value", 50.0)
    want = ev_pdf.groupby(np.floor(ev_pdf["value"] / 50.0) * 50.0).size()
    assert dict(zip(out["key"], out["doc_count"])) == want.to_dict()
    dh = date_histogram_agg(ev, "ts", "day")
    want_d = ev_pdf.groupby(ev_pdf["ts"].values.astype("datetime64[D]")).size()
    assert len(dh) == len(want_d)
    assert dh["doc_count"].sum() == len(ev_pdf)


def test_range_filters_missing(li, li_pdf, ev):
    out = range_agg(li, "l_quantity", [(None, 10.0), (10.0, 25.0), (25.0, None)])
    q = li_pdf["l_quantity"]
    assert out["doc_count"].tolist() == [
        int((q < 10).sum()), int(((q >= 10) & (q < 25)).sum()), int((q >= 25).sum())]
    f = filters_agg(ev, {
        "errors": lambda t: pc.equal(t.column("event_type"), "error"),
        "big": lambda t: pc.greater(t.column("value"), 100.0),
    })
    assert f.loc[f["name"] == "errors", "doc_count"].iloc[0] > 0
    assert missing_agg(ev, "event_type") == 0


def test_composite_paging(li, li_pdf):
    p1 = composite_agg(li, ["l_returnflag", "l_linestatus"], size=2)
    assert len(p1) == 2
    after = tuple(p1.iloc[-1][["l_returnflag", "l_linestatus"]])
    p2 = composite_agg(li, ["l_returnflag", "l_linestatus"], size=2, after=after)
    keys1 = [tuple(r) for r in p1[["l_returnflag", "l_linestatus"]].itertuples(index=False)]
    keys2 = [tuple(r) for r in p2[["l_returnflag", "l_linestatus"]].itertuples(index=False)]
    assert all(k2 > keys1[-1] for k2 in keys2)


def test_top_hits(ev, ev_pdf):
    out = top_hits_agg(ev, "user_id", "value", k=1).to_pandas()
    want = ev_pdf.loc[ev_pdf.groupby("user_id")["value"].idxmax()]
    got = out.sort_values("user_id").set_index("user_id")["value"]
    exp = want.sort_values("user_id").set_index("user_id")["value"]
    assert (got == exp).all()


def test_matrix_stats(li, li_pdf):
    out = matrix_stats_agg(li, ["l_quantity", "l_extendedprice"])
    row = out[(out.col_a == "l_quantity") & (out.col_b == "l_extendedprice")].iloc[0]
    want_cov = np.cov(li_pdf["l_quantity"], li_pdf["l_extendedprice"], ddof=0)[0, 1]
    want_corr = np.corrcoef(li_pdf["l_quantity"], li_pdf["l_extendedprice"])[0, 1]
    assert abs(row["covariance"] - want_cov) < abs(want_cov) * 1e-9 + 1e-9
    assert abs(row["correlation"] - want_corr) < 1e-9


def test_scripted_metric(li, li_pdf):
    total = scripted_metric_agg(
        li, lambda t: float(pc.sum(t.column("l_quantity")).as_py()),
        lambda states: sum(states))
    assert abs(total - li_pdf["l_quantity"].sum()) < 1e-6


def test_significant_terms(ev):
    out = significant_terms_agg(
        ev, "event_type",
        foreground=lambda t: pc.greater(t.column("value"), 150.0), size=5)
    assert set(out.columns) == {"event_type", "fg", "bg", "score"}


def test_pipeline_aggs():
    b = pd.DataFrame({"key": list("abcd"), "m": [1.0, 3.0, 2.0, 6.0]})
    assert cumulative_sum(b, "m")["cumulative_sum"].tolist() == [1, 4, 6, 12]
    d = derivative(b, "m")["derivative"].tolist()
    assert d[1:] == [2.0, -1.0, 4.0] and pd.isna(d[0])
    mv = moving_fn(b, "m", window=2)["moving_fn"].tolist()
    assert mv == [1.0, 2.0, 2.5, 4.0]
    assert bucket_script(b, lambda x: x["m"] * 2)["bucket_script"].tolist() == [2, 6, 4, 12]
    assert bucket_selector(b, lambda x: x["m"] > 2)["key"].tolist() == ["b", "d"]
    assert bucket_sort(b, ["m"], ascending=False, size=2)["key"].tolist() == ["d", "b"]
    sb = stats_bucket(b, "m")
    assert sb == {"count": 4, "min": 1.0, "max": 6.0, "sum": 12.0, "avg": 3.0}


def test_auto_date_histogram(ev, ev_pdf):
    from opensearch_ray.aggs import auto_date_histogram_agg
    out = auto_date_histogram_agg(ev, "ts", target_buckets=10)
    assert len(out) <= 10
    assert out["doc_count"].sum() == len(ev_pdf)
    assert out["interval"].iloc[0] in {"year", "month", "week", "day", "hour", "minute"}


def test_adjacency_matrix(ev, ev_pdf):
    from opensearch_ray.aggs import adjacency_matrix_agg
    out = adjacency_matrix_agg(ev, {
        "err": lambda t: pc.equal(t.column("event_type"), "error"),
        "big": lambda t: pc.greater(t.column("value"), 100.0),
    })
    d = dict(zip(out["key"], out["doc_count"]))
    assert d["err"] == (ev_pdf["event_type"] == "error").sum()
    assert d["big"] == (ev_pdf["value"] > 100).sum()
    assert d["big&err"] == ((ev_pdf["event_type"] == "error")
                            & (ev_pdf["value"] > 100)).sum()


def test_median_absolute_deviation(li, li_pdf):
    from opensearch_ray.aggs import median_absolute_deviation_agg
    mad = median_absolute_deviation_agg(li, "l_extendedprice")
    x = li_pdf["l_extendedprice"]
    true_mad = (x - x.median()).abs().median()
    spread = x.max() - x.min()
    assert abs(mad - true_mad) < 0.03 * spread


def test_date_range_agg(ev, ev_pdf):
    from opensearch_ray.aggs import date_range_agg
    out = date_range_agg(ev, "ts", [(None, "2024-01-10"),
                                    ("2024-01-10", "2024-01-20"),
                                    ("2024-01-20", None)])
    import pandas as pd
    ts = pd.to_datetime(ev_pdf["ts"])
    a = (ts < "2024-01-10").sum()
    b = ((ts >= "2024-01-10") & (ts < "2024-01-20")).sum()
    c = (ts >= "2024-01-20").sum()
    assert out["doc_count"].tolist() == [a, b, c]
    assert out["key"].tolist()[0] == "*-2024-01-10"


def test_sampler_aggs(ev, ev_pdf):
    from opensearch_ray.aggs import (diversified_sampler_agg, sampler_agg,
                                     terms_agg)
    sampled = sampler_agg(ev, by="value", shard_size=500, tie_col="event_id")
    want = ev_pdf.sort_values(["value", "event_id"],
                              ascending=[False, True]).head(500)
    got = sampled.to_pandas().sort_values("event_id")
    assert got["event_id"].tolist() == sorted(want["event_id"].tolist())
    # diversified: at most 1 doc per user, then top 100
    div = diversified_sampler_agg(ev, diversify_field="user_id", by="value",
                                  shard_size=100, max_docs_per_value=1,
                                  tie_col="event_id").to_pandas()
    per_user = (ev_pdf.sort_values(["value", "event_id"],
                                   ascending=[False, True])
                .drop_duplicates("user_id"))
    want_div = per_user.sort_values(["value", "event_id"],
                                    ascending=[False, True]).head(100)
    assert sorted(div["event_id"]) == sorted(want_div["event_id"])
    assert div["user_id"].is_unique
    # sub-agg runs on the sample
    t = terms_agg(sampled, "event_type")
    assert t["doc_count"].sum() == 500


def test_significant_text(sf_dir):
    from opensearch_ray.aggs import significant_text_agg
    import pyarrow.compute as pc
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    out = significant_text_agg(ds, "text", "doc_id",
                               foreground=lambda t: pc.equal(t.column("lang"), "de"),
                               analyzer="transcript", size=5)
    assert len(out) <= 5
    assert (out["score"] > 0).all()
    assert (out["fg"] <= out["bg"]).all()


def test_geo_aggs(ev, ev_pdf):
    import numpy as np
    from opensearch_ray.aggs.geo import (geo_centroid_agg, geo_distance_agg,
                                         haversine_m)
    import pyarrow as pa

    def derive(t):
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({"lat": pa.array((uid % 180).astype(float) - 89.5),
                         "lon": pa.array((eid % 360).astype(float) - 179.5)})

    pts = ev.map_batches(derive, batch_format="pyarrow")
    lat = (ev_pdf["user_id"] % 180).astype(float) - 89.5
    lon = (ev_pdf["event_id"] % 360).astype(float) - 179.5
    d = haversine_m(0.0, 0.0, lat.to_numpy(), lon.to_numpy())
    out = geo_distance_agg(pts, "lat", "lon", (0.0, 0.0),
                           [(None, 5e6), (5e6, 1e7), (1e7, None)])
    assert out["doc_count"].tolist() == [
        int((d < 5e6).sum()), int(((d >= 5e6) & (d < 1e7)).sum()),
        int((d >= 1e7).sum())]
    c = geo_centroid_agg(pts, "lat", "lon")
    assert c["count"] == len(ev_pdf)
    assert c["lat"] == lat.sum() / len(lat)
    assert c["lon"] == lon.sum() / len(lon)


def test_geo_grid_aggs(ev, ev_pdf):
    """geotile/geohash grid: encoders vs known values + pandas parity."""
    import numpy as np
    import pyarrow as pa
    from opensearch_ray.aggs.geo import (geohash_grid_agg, geohash_keys,
                                         geotile_grid_agg, geotile_keys)

    # known encodings (geohash.org / OSM slippy-map references)
    assert geohash_keys(np.array([57.64911]), np.array([10.40744]), 5)[0] \
        == "u4pru"
    assert geotile_keys(np.array([41.85]), np.array([-87.65]), 7)[0] \
        == "7/32/47"
    # mercator clamp: poles land in the edge rows
    assert list(geotile_keys(np.array([89.5, -89.5]),
                             np.array([0.5, 0.5]), 4)) == ["4/8/0", "4/8/15"]

    def derive(t):
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({"lat": pa.array((uid % 180).astype(float) - 89.5),
                         "lon": pa.array((eid % 360).astype(float) - 179.5)})

    pts = ev.map_batches(derive, batch_format="pyarrow")
    lat = ((ev_pdf["user_id"] % 180).astype(float) - 89.5).to_numpy()
    lon = ((ev_pdf["event_id"] % 360).astype(float) - 179.5).to_numpy()
    for agg, keyfn, prec in [(geotile_grid_agg, geotile_keys, 4),
                             (geohash_grid_agg, geohash_keys, 2)]:
        out = agg(pts, "lat", "lon", precision=prec, size=10)
        exp = (pd.Series(keyfn(lat, lon, prec)).value_counts()
               .rename_axis("key").reset_index(name="doc_count")
               .sort_values(["doc_count", "key"], ascending=[False, True],
                            kind="mergesort").head(10).reset_index(drop=True))
        pd.testing.assert_frame_equal(out, exp)


def test_variable_width_histogram(ev, ev_pdf):
    from opensearch_ray.aggs import variable_width_histogram_agg
    out = variable_width_histogram_agg(ev, "value", buckets=8)
    assert 1 <= len(out) <= 8
    assert out["doc_count"].sum() == len(ev_pdf)
    # buckets are ordered, non-overlapping, and cover the value range
    assert (out["min"].to_numpy()[1:] > out["max"].to_numpy()[:-1]).all()
    assert out["min"].iloc[0] == ev_pdf["value"].min()
    assert out["max"].iloc[-1] == ev_pdf["value"].max()
    # deterministic across runs
    out2 = variable_width_histogram_agg(ev, "value", buckets=8)
    assert out["doc_count"].tolist() == out2["doc_count"].tolist()


def test_hdr_percentiles_and_ranks(li, li_pdf):
    import numpy as np
    from opensearch_ray.aggs.metrics import (_hdr_quantize, hdr_percentiles,
                                             hdr_percentile_ranks,
                                             percentile_ranks_tdigest)
    # quantization contract: relative error <= 10^-digits, monotone
    rng = np.random.default_rng(7)
    v = rng.uniform(0.001, 1e9, 10_000)
    for digits in (1, 2, 3):
        q = _hdr_quantize(v, digits)
        assert (np.abs(q - v) <= 10.0 ** -digits * v + 1e-12).all()
        assert (q <= v).all()  # mantissa truncation rounds down
    order = np.argsort(v)
    assert (np.diff(_hdr_quantize(v[order], 2)) >= 0).all()
    # l_quantity is integer 1..50: digits=2 quantization is identity, so
    # HDR percentiles equal the exact cum-count percentiles
    out = hdr_percentiles(li, "l_quantity", qs=(25, 50, 95), digits=2)
    x = np.sort(li_pdf["l_quantity"].to_numpy())
    n = len(x)
    for qq in (25, 50, 95):
        need = max(1, int(np.ceil(qq / 100.0 * n)))
        assert out[f"p{qq}"].iloc[0] == x[need - 1]
    r = hdr_percentile_ranks(li, "l_quantity", values=[10, 40], digits=2)
    assert r["rank_10"].iloc[0] == 100.0 * (x <= 10).sum() / n
    assert r["rank_40"].iloc[0] == 100.0 * (x <= 40).sum() / n
    # t-digest ranks: monotone in v, ~consistent with exact CDF
    tr = percentile_ranks_tdigest(li, "l_quantity", values=[10, 25, 40])
    assert tr["rank_10"].iloc[0] <= tr["rank_25"].iloc[0] <= tr["rank_40"].iloc[0]
    exact = 100.0 * (x <= 25).sum() / n
    assert abs(tr["rank_25"].iloc[0] - exact) < 5.0


def test_bucket_family_pipeline_aggs():
    from opensearch_ray.aggs import (avg_bucket, sum_bucket, min_bucket,
                                     max_bucket, extended_stats_bucket,
                                     percentiles_bucket)
    b = pd.DataFrame({"key": ["a", "b", "c", "d"],
                      "doc_count": [4, 9, 2, 9]})
    assert avg_bucket(b, "doc_count") == 6.0
    assert sum_bucket(b, "doc_count") == 24.0
    mx = max_bucket(b, "doc_count", key_col="key")
    assert mx["value"] == 9.0 and mx["keys"] == ["b", "d"]  # ALL ties kept
    mn = min_bucket(b, "doc_count", key_col="key")
    assert mn["value"] == 2.0 and mn["keys"] == ["c"]
    st = extended_stats_bucket(b, "doc_count")
    assert st["count"] == 4 and st["sum_of_squares"] == 182.0
    assert abs(st["variance"] - (182.0 / 4 - 36.0)) < 1e-12
    # nearest-rank: round(p/100*(n-1)) over sorted [2,4,9,9]
    p = percentiles_bucket(b, "doc_count", percents=[0.0, 50.0, 100.0])
    assert list(p["value"]) == [2.0, 9.0, 9.0]  # round(0.5*3)=round(1.5)=2


def test_hdr_quantize_relative_error_continuous():
    import numpy as np
    from opensearch_ray.aggs.metrics import _hdr_quantize
    rng = np.random.default_rng(3)
    v = rng.uniform(0.001, 1e6, 20000)
    for digits in (1, 2, 3):
        q = _hdr_quantize(v, digits)
        rel = np.abs(v - q) / v
        assert rel.max() <= 10.0 ** (-digits)
        assert (q <= v).all()  # mask truncates toward zero


def test_terms_missing_and_min_doc_count():
    """terms agg `missing` bucket + coordinator-side min_doc_count prune
    (TermsAggregationBuilder options)."""
    import pyarrow as pa
    import ray.data as rd
    from opensearch_ray.aggs import terms_agg
    t = pa.table({"k": pa.array(["a", "a", "b", None, None, None, "c"]),
                  "v": pa.array([1.0] * 7)})
    ds = rd.from_arrow(t)
    out = terms_agg(ds, "k", size=10, missing="N/A")
    got = dict(zip(out["k"], out["doc_count"]))
    assert got == {"a": 2, "b": 1, "c": 1, "N/A": 3}
    out2 = terms_agg(ds, "k", size=10, missing="N/A", min_doc_count=2)
    got2 = dict(zip(out2["k"], out2["doc_count"]))
    assert got2 == {"a": 2, "N/A": 3}
    # without missing, nulls drop (the default)
    out3 = terms_agg(ds, "k", size=10)
    assert set(out3["k"]) == {"a", "b", "c"}


def test_composite_histogram_date_sources(ev, ev_pdf):
    """composite with histogram / date_histogram sources
    (CompositeValuesSourceBuilder): derived bucket keys page like terms
    sources, after-key cursor included."""
    from opensearch_ray.aggs import composite_agg
    out = composite_agg(
        ev, [{"field": "value", "type": "histogram", "interval": 50.0},
             "event_type"], size=8)
    want = (ev_pdf.assign(_b=(ev_pdf.value // 50 * 50.0))
            .groupby(["_b", "event_type"]).size().reset_index(name="n")
            .sort_values(["_b", "event_type"]).head(8))
    assert out["_src_0"].tolist() == want["_b"].tolist()
    assert out["event_type"].tolist() == want["event_type"].tolist()
    assert out["doc_count"].tolist() == want["n"].tolist()
    # page 2 via after-key
    after = (out["_src_0"].iloc[-1], out["event_type"].iloc[-1])
    p2 = composite_agg(
        ev, [{"field": "value", "type": "histogram", "interval": 50.0},
             "event_type"], size=8, after=after)
    want2 = (ev_pdf.assign(_b=(ev_pdf.value // 50 * 50.0))
             .groupby(["_b", "event_type"]).size().reset_index(name="n")
             .sort_values(["_b", "event_type"]))
    want2 = want2[(want2._b > after[0]) |
                  ((want2._b == after[0])
                   & (want2.event_type > after[1]))].head(8)
    assert p2["doc_count"].tolist() == want2["n"].tolist()
    # date_histogram source: month keys
    outd = composite_agg(
        ev, [{"field": "ts", "type": "date_histogram",
              "calendar_interval": "week"}], size=10)
    wantd = (ev_pdf.assign(_w=ev_pdf.ts.dt.to_period("W-SUN")
                           .dt.start_time)
             .groupby("_w").size())
    assert outd["doc_count"].sum() == wantd.sum()


def test_filters_other_bucket_histogram_options(ev, ev_pdf):
    """filters other_bucket catch-all + histogram offset/extended_bounds
    (FiltersAggregator.OTHER_BUCKET_KEY, HistogramAggregationBuilder)."""
    import pyarrow.compute as pc
    from opensearch_ray.aggs import filters_agg, histogram_agg
    out = filters_agg(ev, {
        "big": lambda t: pc.greater(t.column("value"), 150.0),
        "click": lambda t: pc.equal(t.column("event_type"), "click")},
        other_bucket=True)
    got = dict(zip(out.name, out.doc_count))
    big = ev_pdf.value > 150.0
    click = ev_pdf.event_type == "click"
    assert got["big"] == int(big.sum())
    assert got["click"] == int(click.sum())
    assert got["_other_"] == int((~(big | click)).sum())
    # histogram offset shifts boundaries
    h = histogram_agg(ev, "value", 50.0, offset=25.0)
    want = (ev_pdf.assign(_k=np.floor((ev_pdf.value - 25.0) / 50.0)
                          * 50.0 + 25.0).groupby("_k").size())
    assert dict(zip(h.key, h.doc_count)) == want.to_dict()
    # extended_bounds forces empty buckets beyond the data
    h2 = histogram_agg(ev, "value", 50.0,
                       extended_bounds=(-100.0, ev_pdf.value.max() + 200))
    assert h2.key.min() <= -100.0
    assert h2.key.max() >= ev_pdf.value.max() + 150
    assert (h2.doc_count >= 0).all()
    assert h2.doc_count.sum() == len(ev_pdf)


def test_terms_include_exclude_partition(ev, ev_pdf):
    """terms include/exclude regexes + md5 partition iteration
    (IncludeExclude.filter / partitioned mode)."""
    import hashlib
    from opensearch_ray.aggs import terms_agg
    out = terms_agg(ev, "event_type", size=20, include="c.*|view",
                    exclude="clock")
    want = {k for k in ev_pdf.event_type.unique()
            if (k.startswith("c") or k == "view") and k != "clock"}
    assert set(out.event_type) == want
    # partition slices are disjoint and cover the key space
    allkeys = set()
    for p in range(3):
        part = terms_agg(ev, "event_type", size=50,
                         include_partition=(p, 3))
        ks = set(part.event_type)
        assert not (ks & allkeys)
        for k in ks:
            assert int(hashlib.md5(k.encode()).hexdigest()[:8],
                       16) % 3 == p
        allkeys |= ks
    assert allkeys == set(ev_pdf.event_type.unique())


def test_significant_terms_background_filter(ev, ev_pdf):
    """background_filter narrows the background population
    (SignificantTermsAggregationBuilder.backgroundFilter): the fg/bg
    counts equal the brute-force over the filtered subset."""
    import pyarrow.compute as pc
    from opensearch_ray.aggs import significant_terms_agg
    out = significant_terms_agg(
        ev, "event_type",
        foreground=lambda t: pc.greater(t.column("value"), 150.0),
        size=10, heuristic="percentage",
        background_filter=lambda t: pc.greater(t.column("value"), 50.0))
    sub = ev_pdf[ev_pdf.value > 50.0]
    for _, row in out.iterrows():
        k = row["event_type"]
        assert row["bg"] == int((sub.event_type == k).sum())
        assert row["fg"] == int(((sub.event_type == k)
                                 & (sub.value > 150.0)).sum())
