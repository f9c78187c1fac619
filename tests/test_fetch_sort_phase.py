"""Fetch sub-phases (_source filtering, docvalue_fields, script_fields) and
sort phase (field sort missing/_modes, geo_distance sort, script sort)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opensearch_ray.search import Searcher
from opensearch_ray.search.fetch_phase import (
    docvalue_fields, fetch_source, script_fields, source_filter_columns,
    stored_field_names)
from opensearch_ray.search.sort_phase import (
    gather_doc_values, geo_distance_sort, sort_hits)


@pytest.fixture(scope="module")
def s(built_index):
    return Searcher(built_index.index_dir)


@pytest.fixture(scope="module")
def nullable_index(tmp_path_factory):
    """Tiny corpus with a nullable numeric column, a string column with
    nulls, lat/lon, and a list column (multi-valued sort modes)."""
    from opensearch_ray.index.build import build_index
    root = tmp_path_factory.mktemp("sortidx")
    n = 40
    rng = np.random.default_rng(7)
    num = rng.integers(0, 100, n).astype("float64")
    num[::5] = np.nan                       # nulls every 5th doc
    tag = [None if i % 7 == 0 else f"t{i % 4}" for i in range(n)]
    vals = [rng.integers(0, 50, rng.integers(1, 4)).tolist() if i % 6
            else [] for i in range(n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"alpha beta doc{i % 3}" for i in range(n)]),
        "num": pa.array(num),
        "tag": pa.array(tag, pa.string()),
        "lat": pa.array((np.arange(n) % 90).astype("float64")),
        "lon": pa.array((np.arange(n) % 180).astype("float64") - 90.0),
        "vals": pa.array(vals, pa.list_(pa.int64())),
    })
    corpus = root / "corpus"
    corpus.mkdir()
    pq.write_table(t, str(corpus / "part-0.parquet"))
    m = build_index(str(corpus), str(root / "idx"), analyzer="transcript",
                    sort_cols=("doc_id",), num_buckets=2)
    return Searcher(m.index_dir), t


def test_source_filter_columns():
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert source_filter_columns(cols, includes=["t*"]) == \
        ["turn_idx", "text", "tool", "ts"]
    assert source_filter_columns(cols, includes=["t*"], excludes=["te*", "ts"]) \
        == ["turn_idx", "tool"]
    assert source_filter_columns(cols) == cols
    assert source_filter_columns(cols, excludes=["*"]) == []


def test_fetch_source(s):
    docs = s.term_docs("ceba")[:12]
    t = fetch_source(s, docs, includes=["conv*", "role", "tool"],
                     excludes=["conv_id"])
    assert set(t.schema.names) == {"role", "tool", "_docid"}
    full = s.fetch(docs.tolist())
    assert t.column("role").to_pylist() == full.column("role").to_pylist()
    assert "docid" not in stored_field_names(s)


def test_docvalue_fields(s):
    docs = s.term_docs("ceba")[:20]
    df = docvalue_fields(s, docs, ["turn_idx", "ts"])
    full = s.fetch(docs.tolist(), columns=["turn_idx", "ts"]).to_pandas()
    assert np.array_equal(df["_docid"].values, full["_docid"].values)
    assert np.array_equal(np.asarray(df["turn_idx"], dtype=np.int64),
                          full["turn_idx"].values.astype(np.int64))
    assert np.array_equal(pd.to_datetime(df["ts"]).values,
                          full["ts"].values)


def test_script_fields(s):
    docs = s.term_docs("ceba")[:10]
    out = script_fields(
        s, docs,
        {"text_len": lambda t: np.array(
            [len(x) for x in t.column("text").to_pylist()]),
         "role_up": lambda t: np.array(
             [r.upper() for r in t.column("role").to_pylist()])},
        source_columns=["text", "role"])
    full = s.fetch(docs.tolist(), columns=["text", "role"]).to_pandas()
    assert list(out["text_len"]) == [len(x) for x in full["text"]]
    assert list(out["role_up"]) == [r.upper() for r in full["role"]]
    with pytest.raises(ValueError):
        script_fields(s, docs, {"bad": lambda t: np.array([1])})


def test_sort_missing_last_first(nullable_index):
    s2, t = nullable_index
    docs = np.arange(t.num_rows, dtype=np.int64)
    num = t.column("num").to_numpy(zero_copy_only=False)
    n_null = int(np.isnan(num).sum())

    out = sort_hits(s2, docs, [{"field": "num", "order": "asc",
                                "missing": "_last"}], size=len(docs))
    got = out["sort_0"].values
    assert np.all(np.isnan(got[-n_null:]))
    assert np.array_equal(got[:-n_null], np.sort(num[~np.isnan(num)]))
    # nulls tie-broken by docid asc
    assert np.array_equal(out["_docid"].values[-n_null:],
                          docs[np.isnan(num)])

    out_f = sort_hits(s2, docs, [{"field": "num", "order": "desc",
                                  "missing": "_first"}], size=len(docs))
    assert np.all(np.isnan(out_f["sort_0"].values[:n_null]))
    assert np.array_equal(out_f["sort_0"].values[n_null:],
                          np.sort(num[~np.isnan(num)])[::-1])

    # literal missing value substitutes before ordering
    out_l = sort_hits(s2, docs, [{"field": "num", "order": "asc",
                                  "missing": -1}], size=3)
    assert np.array_equal(out_l["_docid"].values, docs[np.isnan(num)][:3])


def test_sort_string_and_paging(nullable_index):
    s2, t = nullable_index
    docs = np.arange(t.num_rows, dtype=np.int64)
    tag = np.array([x if x is not None else None
                    for x in t.column("tag").to_pylist()], dtype=object)
    full = sort_hits(s2, docs, [{"field": "tag", "order": "desc",
                                 "missing": "_last"}], size=len(docs))
    nn = [x for x in full["sort_0"] if x is not None]
    assert nn == sorted([x for x in tag if x is not None], reverse=True)
    assert all(x is None for x in
               full["sort_0"][len(nn):])
    # from_/size paging slices the same total order
    page = sort_hits(s2, docs, [{"field": "tag", "order": "desc",
                                 "missing": "_last"}], size=5, from_=10)
    assert np.array_equal(page["_docid"].values,
                          full["_docid"].values[10:15])


def test_sort_mode_multivalue(nullable_index):
    s2, t = nullable_index
    docs = np.arange(t.num_rows, dtype=np.int64)
    vals = t.column("vals").to_pylist()
    for mode, fn in [("min", min), ("max", max),
                     ("avg", lambda v: sum(v) / len(v)),
                     ("sum", sum), ("median", np.median)]:
        out = sort_hits(s2, docs, [{"field": "vals", "mode": mode,
                                    "missing": "_last"}], size=len(docs))
        expect = np.array([float(fn(v)) if v else np.nan for v in vals])
        order = np.lexsort((docs, np.where(np.isnan(expect), np.inf, expect)))
        assert np.array_equal(out["_docid"].values, docs[order]), mode


def test_sort_geo_and_script(nullable_index):
    from opensearch_ray.aggs.geo import haversine_m
    s2, t = nullable_index
    docs = np.arange(t.num_rows, dtype=np.int64)
    lat = t.column("lat").to_numpy(zero_copy_only=False)
    lon = t.column("lon").to_numpy(zero_copy_only=False)
    d = haversine_m(10.0, 20.0, lat, lon)
    out = sort_hits(s2, docs, [
        {"geo_distance": {"fields": ("lat", "lon"), "origin": (10.0, 20.0)}},
    ], size=5)
    order = np.lexsort((docs, d))[:5]
    assert np.array_equal(out["_docid"].values, docs[order])
    np.testing.assert_allclose(out["sort_0"].values, d[order])

    # script sort: num mod 7 desc, docid tiebreak
    num_id = t.column("doc_id").to_numpy(zero_copy_only=False)
    out2 = sort_hits(s2, docs, [
        {"script": lambda tb: tb.column("doc_id").to_numpy(
            zero_copy_only=False) % 7, "order": "desc",
         "source_columns": ["doc_id"]}], size=8)
    key = num_id % 7
    order2 = np.lexsort((docs, -key))[:8]
    assert np.array_equal(out2["_docid"].values, docs[order2])


def test_sort_secondary_key(nullable_index):
    s2, t = nullable_index
    docs = np.arange(t.num_rows, dtype=np.int64)
    tag = t.column("tag").to_pylist()
    num = t.column("num").to_numpy(zero_copy_only=False)
    out = sort_hits(s2, docs, [
        {"field": "tag", "order": "asc", "missing": "_first"},
        {"field": "num", "order": "desc", "missing": "_last"},
    ], size=len(docs))
    tag_key = np.array([-1 if x is None else int(x[1:]) for x in tag])
    num_key = np.where(np.isnan(num), np.inf, -num)
    order = np.lexsort((docs, num_key, tag_key))
    assert np.array_equal(out["_docid"].values, docs[order])


def test_geo_distance_sort_dataset(ray_session):
    import ray.data
    from opensearch_ray.aggs.geo import haversine_m
    n = 200
    lat = (np.arange(n) % 120).astype("float64") - 60.0
    lon = (np.arange(n) * 7 % 360).astype("float64") - 180.0
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "lat": pa.array(lat), "lon": pa.array(lon)}))
    out = geo_distance_sort(ds, "lat", "lon", (0.0, 0.0), k=10)
    d = haversine_m(0.0, 0.0, lat, lon)
    order = np.lexsort((np.arange(n), d))[:10]
    assert np.array_equal(out["event_id"].values, order)
    np.testing.assert_allclose(out["_distance"].values, d[order])
