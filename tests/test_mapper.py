"""Field-type semantics (mapper.py): range fields, ip/CIDR, scaled_float,
token_count — unit parity against brute force."""

import numpy as np
import pandas as pd
import pytest
import ray

from opensearch_ray.mapper import (cidr_bounds, ip_term_filter,
                                   ipv4_to_uint32, range_field_filter,
                                   range_relation_mask, scaled_float_column,
                                   scaled_float_decode, scaled_float_encode,
                                   token_count_column)


def test_range_relation_mask():
    lo = np.array([0.0, 6.0, 4.0, 13.0, 5.0])
    hi = np.array([4.0, 11.0, 13.0, 20.0, 12.0])
    # query [5, 12]
    assert range_relation_mask(lo, hi, 5, 12, "intersects").tolist() == \
        [False, True, True, False, True]
    assert range_relation_mask(lo, hi, 5, 12, "within").tolist() == \
        [False, True, False, False, True]
    assert range_relation_mask(lo, hi, 5, 12, "contains").tolist() == \
        [False, False, True, False, True]
    with pytest.raises(ValueError):
        range_relation_mask(lo, hi, 5, 12, "bogus")


def test_range_field_filter_ds():
    df = pd.DataFrame({"i": range(6),
                       "lo": [0.0, 6.0, 4.0, 13.0, 5.0, 12.0],
                       "hi": [4.0, 11.0, 13.0, 20.0, 12.0, 12.0]})
    ds = ray.data.from_pandas(df)
    got = range_field_filter(ds, "lo", "hi", 5.0, 12.0,
                             "intersects").to_pandas()
    assert got["i"].tolist() == [1, 2, 4, 5]


def test_ipv4_and_cidr():
    import pyarrow as pa
    arr = pa.chunked_array([["0.0.0.1", "10.96.0.0", "255.255.255.255"]])
    keys = ipv4_to_uint32(arr)
    assert keys.tolist() == [1, (10 << 24) | (96 << 16), 0xFFFFFFFF]
    assert cidr_bounds("10.96.0.0/12") == (
        (10 << 24) | (96 << 16), (10 << 24) | (111 << 16) | 0xFFFF)
    assert cidr_bounds("1.2.3.4") == ((1 << 24) | (2 << 16) | (3 << 8) | 4,) * 2 \
        or cidr_bounds("1.2.3.4")[0] == cidr_bounds("1.2.3.4")[1]
    ds = ray.data.from_pandas(pd.DataFrame({
        "ip": ["10.95.255.255", "10.96.0.0", "10.111.255.255", "10.112.0.0"],
        "i": range(4)}))
    got = ip_term_filter(ds, "ip", "10.96.0.0/12").to_pandas()
    assert got["i"].tolist() == [1, 2]
    # exact-address term (no mask)
    got2 = ip_term_filter(ds, "ip", "10.112.0.0").to_pandas()
    assert got2["i"].tolist() == [3]


def test_scaled_float_java_round():
    v = np.array([0.05, 0.049999, -0.05, 2.55, 2.649999])
    enc = scaled_float_encode(v, 10.0)
    # Math.round = floor(x + 0.5): 0.5 -> 1, -0.5 -> 0 (toward +inf)
    assert enc.tolist() == [1, 0, 0, 26, 26]
    dec = scaled_float_decode(enc, 10.0)
    assert dec.tolist() == [0.1, 0.0, 0.0, 2.6, 2.6]
    ds = ray.data.from_pandas(pd.DataFrame({"x": v}))
    got = scaled_float_column(ds, "x", 10.0).to_pandas()["x"].tolist()
    assert got == dec.tolist()


def test_token_count_column(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]).limit(50)
    out = token_count_column(ds, "text", analyzer="transcript").to_pandas()
    from opensearch_ray.analysis.analyzer import get_analyzer
    an = get_analyzer("transcript")
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    exp = {r.doc_id: len(an.tokens(r.text)) for r in docs.itertuples()}
    for d, n in zip(out.doc_id, out.token_count):
        assert exp[d] == n


def test_wildcard_field_docs(built_index):
    from opensearch_ray.mapper import (wildcard_field_docs,
                                       wildcard_pattern_to_regex)
    from opensearch_ray.search import Searcher
    import re
    assert re.match(wildcard_pattern_to_regex("a*c?"), "abbcx")
    assert not re.match(wildcard_pattern_to_regex("a*c?"), "abbc")
    assert re.match(wildcard_pattern_to_regex("a.b"), "a.b")
    assert not re.match(wildcard_pattern_to_regex("a.b"), "axb")
    s = Searcher(built_index.index_dir)
    got = set(wildcard_field_docs(s, "role", "us*").tolist())
    vals = {}
    for seg in s.manifest.segments:
        dv = s.doc_values(seg.seg_id, "role")
        for i, v in enumerate(dv):
            vals[i + s.doc_base(seg.seg_id)] = v
    want = {d for d, v in vals.items() if str(v).startswith("us")}
    assert got == want


def test_range_relation_properties():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(lo=st.floats(-100, 100), w=st.floats(0, 50),
           qlo=st.floats(-100, 100), qw=st.floats(0, 50))
    def check(lo, w, qlo, qw):
        import numpy as np
        from opensearch_ray.mapper import range_relation_mask
        hi, qhi = lo + w, qlo + qw
        a = np.array([lo]); b = np.array([hi])
        inter = range_relation_mask(a, b, qlo, qhi, "intersects")[0]
        within = range_relation_mask(a, b, qlo, qhi, "within")[0]
        contains = range_relation_mask(a, b, qlo, qhi, "contains")[0]
        # within and contains each imply intersects
        assert not within or inter
        assert not contains or inter
        # brute-force ground truth
        assert inter == (lo <= qhi and hi >= qlo)
        assert within == (lo >= qlo and hi <= qhi)
        assert contains == (lo <= qlo and hi >= qhi)

    check()


def test_cidr_contains_its_network_and_broadcast():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=100, deadline=None)
    @given(a=st.integers(0, 255), b=st.integers(0, 255),
           c=st.integers(0, 255), d=st.integers(0, 255),
           bits=st.integers(0, 32))
    def check(a, b, c, d, bits):
        from opensearch_ray.mapper import cidr_bounds
        lo, hi = cidr_bounds(f"{a}.{b}.{c}.{d}/{bits}")
        addr = (a << 24) | (b << 16) | (c << 8) | d
        assert lo <= addr <= hi
        assert hi - lo == (2 ** (32 - bits)) - 1

    check()


def test_constant_keyword_rewrites():
    import pyarrow as pa
    import ray
    from opensearch_ray.mapper import constant_keyword_filter
    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3])}))
    assert constant_keyword_filter(ds, "env-prod", "env-prod").count() == 3
    assert constant_keyword_filter(ds, "env-prod", "env-dev").count() == 0
    assert constant_keyword_filter(ds, "env-prod", "env-*",
                                   query_kind="wildcard").count() == 3
    assert constant_keyword_filter(ds, "env-prod", "dev-*",
                                   query_kind="wildcard").count() == 0


def test_flat_object_paths_and_term():
    import pyarrow as pa
    import ray
    from opensearch_ray.mapper import flat_object_paths, flat_object_term_filter
    t = pa.table({"id": pa.array([1, 2, 3]),
                  "j": pa.array(['{"a": {"b": 1}, "c": ["x", "y"]}',
                                 '{"a": {"b": 2}}', None])})
    flat = flat_object_paths(t, "j")
    rows = sorted(zip(flat["_row"].to_pylist(), flat["path"].to_pylist(),
                      flat["value"].to_pylist()))
    assert rows == [(0, "a.b", "1"), (0, "c", "x"), (0, "c", "y"),
                    (1, "a.b", "2")]
    ds = ray.data.from_arrow(t)
    out = flat_object_term_filter(ds, "j", "a.b", "2").to_pandas()
    assert list(out["id"]) == [2]
    out2 = flat_object_term_filter(ds, "j", "c", "y").to_pandas()
    assert list(out2["id"]) == [1]


def test_match_only_text_score_is_sum_of_idf(built_index):
    import numpy as np
    from opensearch_ray.mapper import match_only_text_query
    from opensearch_ray.search import Searcher
    from opensearch_ray.search.bm25 import bm25_idf
    s = Searcher(built_index.index_dir)
    docs, scores = match_only_text_query(s, "bace cedi")
    assert docs.size > 0
    stats = s.term_stats(["bace", "cedi"])
    i1 = float(bm25_idf(stats["bace"][0], s.N, np.float64))
    i2 = float(bm25_idf(stats["cedi"][0], s.N, np.float64))
    both = np.intersect1d(s.term_docs("bace"), s.term_docs("cedi"))
    only1 = np.setdiff1d(s.term_docs("bace"), both)
    got = dict(zip(docs.tolist(), scores.tolist()))
    if both.size:
        assert abs(got[int(both[0])] - (i1 + i2)) < 1e-12
    if only1.size:
        assert abs(got[int(only1[0])] - i1) < 1e-12


def test_normalized_term_docs(built_index):
    """keyword normalizer: case-insensitive term equality over keyword
    doc values (lowercase chain), index+query symmetric."""
    import numpy as np
    from opensearch_ray.mapper import normalized_term_docs
    from opensearch_ray.search import Searcher
    s = Searcher(built_index.index_dir)
    roles = np.concatenate([
        s.doc_values(seg.seg_id, "role")
        for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id)])
    role = roles[0]
    want = np.flatnonzero(roles.astype(str) == str(role))
    got = np.sort(normalized_term_docs(s, "role", str(role).upper(),
                                       filters=("lowercase",)))
    assert got.tolist() == want.tolist()
    assert normalized_term_docs(s, "role", "no-such-role").size == 0


def test_termvectors_on_the_fly(built_index):
    """_termvectors: tf/positions re-derived from the stored source match
    a direct re-analysis; doc_freq matches term_stats."""
    from opensearch_ray.search.features import termvectors
    from opensearch_ray.search import Searcher
    s = Searcher(built_index.index_dir)
    tv = termvectors(s, 0, term_statistics=True)
    text = s.fetch([0], columns=[s.manifest.text_col]) \
        .column(s.manifest.text_col)[0].as_py()
    toks, pos = s.analyzer.analyze(text)
    assert sorted(tv["term"]) == sorted(set(toks))
    assert int(tv["term_freq"].sum()) == len(toks)
    by_term = dict(zip(tv["term"], tv["positions"]))
    for t, p in zip(toks, pos):
        assert str(p) in by_term[t].split(",")
    # doc_freq is the global df
    for t, df in zip(tv["term"], tv["doc_freq"]):
        assert df >= 1


def test_unsigned_long_shifted_encoding():
    """unsigned_long (NumberType.UNSIGNED_LONG): top-bit flip maps uint64
    monotonically onto int64 — sort order and range compare survive values
    above int64 max."""
    from opensearch_ray.mapper import (unsigned_long_decode,
                                       unsigned_long_encode,
                                       unsigned_long_range_mask)
    import numpy as np
    u = np.array([0, 1, 2**63 - 1, 2**63, 2**64 - 2, 2**64 - 1], np.uint64)
    enc = unsigned_long_encode(u)
    assert enc.dtype == np.int64
    assert (np.diff(enc) > 0).all()          # monotone across the 2^63 seam
    assert (unsigned_long_decode(enc) == u).all()
    m = unsigned_long_range_mask(u, gte=2**63, lt=2**64 - 1)
    assert m.tolist() == [False, False, False, True, True, False]


def test_half_float_quantization():
    """half_float: binary16 round-trip — 1/3 loses precision to the 11-bit
    mantissa, 65504 is the max finite, 1e5 overflows to inf."""
    import ray.data as rd
    from opensearch_ray.mapper import half_float_column
    import numpy as np
    import pandas as pd
    ds = rd.from_pandas(pd.DataFrame(
        {"v": [1.0 / 3.0, 65504.0, 1e5, 0.0, -2.5]}))
    out = half_float_column(ds, "v").to_pandas()["v"].tolist()
    assert out[0] == float(np.float16(1 / 3)) and out[0] != 1 / 3
    assert out[1] == 65504.0
    assert np.isinf(out[2])
    assert out[3] == 0.0 and out[4] == -2.5
