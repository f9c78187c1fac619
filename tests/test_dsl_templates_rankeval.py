"""JSON query-DSL executor (search/dsl.py), Mustache search templates
(search/templates.py) and the rank-eval module (rankeval.py) — parity against
native engine calls and hand-computed metric values."""

import base64
import json
import math

import numpy as np
import pytest

from opensearch_ray import rankeval
from opensearch_ray.search import Searcher, dsl
from opensearch_ray.search.templates import (render_search_template,
                                             render_template)


@pytest.fixture(scope="module")
def s(built_index):
    return Searcher(built_index.index_dir)


@pytest.fixture(scope="module")
def terms3(s):
    """Three frequent corpus terms (synthetic Zipfian vocabulary — derive
    from the data rather than assuming English words)."""
    from collections import Counter
    full = s.fetch(list(range(min(s.N, 200))),
                   columns=[s.manifest.text_col])
    cnt = Counter()
    for r in full.to_pylist():
        cnt.update(s.analyzer.tokens(r[s.manifest.text_col] or ""))
    return [t for t, _ in cnt.most_common(3)]


def test_query_docs_leaf_parity(s, terms3):
    vocab_term = terms3[0]
    assert (dsl.query_docs(s, {"term": {"text": vocab_term}})
            == np.sort(s.term_docs(vocab_term))).all()
    assert dsl.query_docs(s, {"match_none": {}}).size == 0
    assert dsl.query_docs(s, {"match_all": {}}).size == s.N
    # range on doc values
    got = dsl.query_docs(s, {"range": {"turn_idx": {"gte": 3, "lt": 6}}})
    assert (got == s.range_docs("turn_idx", {"gte": 3, "lt": 6})).all()
    # exists via the DSL
    from opensearch_ray.search.queries import exists_docs
    assert (dsl.query_docs(s, {"exists": {"field": "role"}})
            == np.sort(exists_docs(s, "role"))).all()


def test_bool_algebra_and_msm(s, terms3):
    a, b, c = terms3
    da = set(s.term_docs(a).tolist())
    db = set(s.term_docs(b).tolist())
    dc = set(s.term_docs(c).tolist())
    q = {"bool": {"must": [{"term": {"text": a}}],
                  "must_not": [{"term": {"text": c}}]}}
    assert dsl.query_docs(s, q).tolist() == sorted(da - dc)
    # should-only bool defaults to minimum_should_match=1
    q2 = {"bool": {"should": [{"term": {"text": a}}, {"term": {"text": b}}]}}
    assert dsl.query_docs(s, q2).tolist() == sorted(da | db)
    # explicit msm=2
    q3 = {"bool": {"should": [{"term": {"text": a}}, {"term": {"text": b}},
                              {"term": {"text": c}}],
                   "minimum_should_match": 2}}
    exp = sorted(d for d in da | db | dc
                 if (d in da) + (d in db) + (d in dc) >= 2)
    assert dsl.query_docs(s, q3).tolist() == exp
    # nested bool
    q4 = {"bool": {"must": [{"bool": {"should": [
        {"term": {"text": a}}, {"term": {"text": b}}]}}],
        "filter": [{"range": {"turn_idx": {"lte": 10}}}]}}
    flt = set(s.range_docs("turn_idx", {"lte": 10}).tolist())
    assert dsl.query_docs(s, q4).tolist() == sorted((da | db) & flt)


def test_wrapper_and_script(s, terms3):
    inner = {"term": {"text": terms3[0]}}
    enc = base64.b64encode(json.dumps(inner).encode()).decode()
    assert (dsl.query_docs(s, {"wrapper": {"query": enc}})
            == dsl.query_docs(s, inner)).all()
    got = dsl.query_docs(s, {"script": {"script": {
        "source": lambda df: df["turn_idx"].values % 2 == 0,
        "fields": ["turn_idx"]}}})
    all_ti = np.concatenate([
        s.doc_values(seg.seg_id, "turn_idx")
        for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id)])
    assert got.tolist() == np.flatnonzero(all_ti % 2 == 0).tolist()


def test_execute_search_scores_and_filter(s, terms3):
    qtext = f"{terms3[0]} {terms3[1]}"
    body = {"query": {"bool": {
        "must": [{"match": {"text": qtext}}],
        "filter": [{"range": {"turn_idx": {"gte": 2}}}]}},
        "size": 7}
    r = dsl.execute_search(s, body, id_col="docid")
    hits = s.search(qtext, k=10 ** 9)
    flt = set(s.range_docs("turn_idx", {"gte": 2}).tolist())
    exp = [(h.docid, h.score) for h in hits if h.docid in flt][:7]
    assert list(zip(r.docid.tolist(), r.score.tolist())) == exp


def test_execute_search_sort_and_source(s, terms3):
    body = {"query": {"match": {"text": terms3[0]}},
            "sort": [{"turn_idx": {"order": "desc"}}], "size": 5,
            "_source": ["turn_idx"]}
    r = dsl.execute_search(s, body, id_col="docid")
    assert (np.diff(r.turn_idx.values) <= 0).all()
    # _source values must align with the docids after the sort
    fetched = s.fetch(r.docid.tolist(), columns=["turn_idx"]).to_pydict()
    by_id = dict(zip(fetched["_docid"], fetched["turn_idx"]))
    assert [by_id[d] for d in r.docid.tolist()] == r.turn_idx.tolist()


def test_constant_score_boost(s, terms3):
    r = dsl.execute_search(s, {"query": {"constant_score": {
        "filter": {"term": {"text": terms3[0]}}, "boost": 3.0}}, "size": 4},
        id_col="docid")
    assert (r.score == 3.0).all()
    assert r.docid.is_monotonic_increasing


def test_render_template_forms():
    tpl = ('{"query": {"match": {"text": "{{q}}"}}'
           '{{#flt}}, "post_filter": {"term": {"lang": "{{flt}}"}}{{/flt}}'
           ', "size": {{size}}}')
    b = render_search_template(tpl, {"q": "x y", "flt": "en", "size": 3})
    assert b == {"query": {"match": {"text": "x y"}},
                 "post_filter": {"term": {"lang": "en"}}, "size": 3}
    b2 = render_search_template(tpl, {"q": "z", "flt": None, "size": 1})
    assert "post_filter" not in b2
    # inverted sections, triple-stash, toJson, list iteration
    assert render_template("{{^x}}no-x{{/x}}", {}) == "no-x"
    assert render_template("{{{v}}}", {"v": 7}) == "7"
    assert (render_search_template(
        '{"terms": {{#toJson}}ws{{/toJson}}}', {"ws": ["a", "b"]})
        == {"terms": ["a", "b"]})
    assert render_template("[{{#xs}}{{.}},{{/xs}}0]", {"xs": [1, 2]}) \
        == "[1,2,0]"


def test_rankeval_metrics_exact():
    ratings = {1: 2, 2: 0, 3: 1}
    assert rankeval.precision_at_k([1, 2, 3, 4], ratings) == 2 / 4
    assert rankeval.precision_at_k([1, 2, 3, 4], ratings,
                                   ignore_unlabeled=True) == 2 / 3
    assert rankeval.precision_at_k([1, 2, 3], ratings,
                                   relevant_rating_threshold=2) == 1 / 3
    assert rankeval.recall_at_k([1, 4], ratings) == 1 / 2
    assert rankeval.mean_reciprocal_rank([2, 4, 3], ratings) == 1 / 3
    assert rankeval.mean_reciprocal_rank([2, 4], ratings) == 0.0
    dcg = (3 / math.log2(2)) + (0 / math.log2(3)) + (1 / math.log2(4))
    assert rankeval.dcg_at_k([1, 2, 3], ratings, normalize=False) \
        == pytest.approx(dcg, abs=1e-12)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert rankeval.dcg_at_k([1, 2, 3], ratings) \
        == pytest.approx(dcg / idcg, abs=1e-12)
    # unlabeled keeps its rank slot but contributes nothing
    assert rankeval.dcg_at_k([9, 1], {1: 1}, normalize=False) \
        == pytest.approx(1 / math.log2(3), abs=1e-12)
    # ERR cascade
    err = rankeval.expected_reciprocal_rank([1, 3], ratings, max_rating=2)
    p1 = 3 / 4
    exp = p1 * 1 + (1 - p1) * (1 / 4) / 2
    assert err == pytest.approx(exp, abs=1e-12)


def test_rank_eval_end_to_end(s, terms3):
    t = terms3[0]
    rel = {int(d): 1 for d in s.term_docs(t)[:8]}
    reqs = [{"id": "q1", "query_text": t, "ratings": rel}]
    df = rankeval.rank_eval(s, reqs, metric="precision", k=10,
                            id_col="docid")
    assert list(df.query_id) == ["q1", "_mean"]
    ranked = [h.docid for h in s.search(t, k=10)]
    exp = sum(1 for d in ranked if d in rel) / len(ranked)
    assert df.metric_score.iloc[0] == pytest.approx(exp)
    assert df.metric_score.iloc[1] == df.metric_score.iloc[0]


def test_derived_fields_sort_and_source(s, terms3):
    body = {"query": {"match": {"text": terms3[0]}},
            "derived": {"ti2": {"script": {
                "source": lambda df: df["turn_idx"].values * 2,
                "fields": ["turn_idx"]}}},
            "sort": [{"ti2": {"order": "desc"}}],
            "_source": ["ti2", "turn_idx"], "size": 5}
    r = dsl.execute_search(s, body, id_col="docid")
    assert (r.ti2.values == r.turn_idx.values * 2).all()
    assert (np.diff(r.ti2.values) <= 0).all()


def test_msearch_template(s, terms3):
    from opensearch_ray.search.templates import msearch_template
    tpl = '{"query": {"match": {"text": "{{q}}"}}, "size": {{n}}}'
    out = msearch_template(s, [(tpl, {"q": terms3[0], "n": 3}),
                               (tpl, {"q": terms3[1], "n": 2})],
                           id_col="docid")
    assert len(out) == 2 and len(out[0]) == 3 and len(out[1]) == 2
    exp = [h.docid for h in s.search(terms3[0], k=3)]
    assert out[0].docid.tolist() == exp


def test_execute_request_aggs_and_post_filter(s, terms3):
    a = terms3[0]
    body = {"query": {"match": {"text": a}},
            "aggs": {"by_role": {"terms": {"field": "role", "size": 10}},
                     "ti": {"stats": {"field": "turn_idx"}},
                     "g": {"global": {},
                           "aggs": {"n": {"value_count":
                                          {"field": "turn_idx"}}}}},
            "post_filter": {"range": {"turn_idx": {"gte": 1}}},
            "size": 5}
    r = dsl.execute_request(s, body, id_col="docid")
    docs = np.sort(s.term_docs(a))
    assert r["total"] == docs.size
    # aggregations cover ALL matches (pre-post_filter)
    total_buckets = sum(b["doc_count"]
                        for b in r["aggregations"]["by_role"]["buckets"])
    assert total_buckets == docs.size
    assert r["aggregations"]["ti"]["count"] == docs.size
    # global escapes the query scope entirely
    assert r["aggregations"]["g"]["doc_count"] == s.N
    assert r["aggregations"]["g"]["n"]["value"] == s.N
    # hits ARE post-filtered
    flt = set(s.range_docs("turn_idx", {"gte": 1}).tolist())
    assert all(d in flt for d in r["hits"]["docid"])
    # filter agg with sub-agg
    r2 = dsl.execute_request(s, {
        "query": {"match_all": {}},
        "aggs": {"f": {"filter": {"range": {"turn_idx": {"lt": 2}}},
                       "aggs": {"mx": {"max": {"field": "turn_idx"}}}}},
        "size": 0}, id_col="docid")
    sub = s.range_docs("turn_idx", {"lt": 2})
    assert r2["aggregations"]["f"]["doc_count"] == sub.size
    assert r2["aggregations"]["f"]["mx"]["value"] <= 1


def test_execute_request_collapse_and_highlight(s, terms3):
    a = terms3[0]
    r = dsl.execute_request(s, {
        "query": {"match": {"text": a}},
        "collapse": {"field": "role"},
        "highlight": {"fragment_size": 60},
        "size": 10}, id_col="docid")
    h = r["hits"]
    # one hit per collapse-key value, best-ranked kept
    assert h["role"].is_unique
    native = [x.docid for x in s.search(a, k=10 ** 9)]
    # first collapsed hit is the global best hit
    assert h.docid.iloc[0] == native[0]
    # highlights tag the query term
    assert h.highlight.str.contains("<em>").all()


def test_execute_request_profile(s, terms3):
    r = dsl.execute_request(s, {"query": {"match": {"text": terms3[0]}},
                                "profile": True, "size": 1}, id_col="docid")
    assert set(r["profile"]) == {"query_ms", "aggregations_ms", "fetch_ms"}
    assert all(v >= 0 for v in r["profile"].values())
    r2 = dsl.execute_request(s, {"query": {"match_all": {}}, "size": 1},
                             id_col="docid")
    assert "profile" not in r2


def test_knn_query_exact(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from opensearch_ray.index.build import build_index
    from opensearch_ray.search import Searcher
    rng = np.random.default_rng(5)
    n, d = 40, 16
    V = rng.normal(size=(n, d)).astype(np.float32)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(pa.table({
        "conv_id": [f"c{i:03d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, pa.int32()),
        "text": ["some text here"] * n,
        "vec": pa.array([list(map(float, v)) for v in V],
                        pa.list_(pa.float32())),
    }), str(corpus / "p.parquet"))
    m = build_index(str(corpus), str(tmp_path / "idx"),
                    analyzer="whitespace", num_buckets=2)
    s = Searcher(m.index_dir)
    q = V[7]
    r = dsl.execute_search(
        s, {"query": {"knn": {"vec": {"vector": list(map(float, q)),
                                      "k": 5}}}}, id_col="docid")
    Vn = V.astype(np.float64)
    sims = (Vn @ q.astype(np.float64)) / (
        np.linalg.norm(Vn, axis=1) * np.linalg.norm(q.astype(np.float64)))
    order = np.lexsort((np.arange(n), -sims))[:5]
    assert r.docid.tolist() == order.tolist()
    assert r.score.values == pytest.approx(sims[order], abs=1e-9)


def test_execute_request_rescore(s, terms3):
    a, b = terms3[0], terms3[1]
    base = dsl.execute_request(
        s, {"query": {"match": {"text": f"{a} {b}"}}, "size": 10},
        id_col="docid")["hits"]
    r = dsl.execute_request(
        s, {"query": {"match": {"text": f"{a} {b}"}},
            "rescore": {"window_size": 10, "query": {
                "rescore_query": {"match_phrase": {"text": f"{a} {b}"}},
                "query_weight": 1.0, "rescore_query_weight": 5.0}},
            "size": 10}, id_col="docid")["hits"]
    assert set(r.docid) == set(base.docid)  # same window, reordered
    phrase = set(s.match_phrase(f"{a} {b}").tolist())
    if phrase & set(base.docid):
        # every true phrase match in the window outranks non-matches
        ranks = {d: i for i, d in enumerate(r.docid)}
        in_w = [d for d in base.docid if d in phrase]
        out_w = [d for d in base.docid if d not in phrase]
        if in_w and out_w:
            assert max(ranks[d] for d in in_w) < min(ranks[d] for d in out_w)


def test_execute_request_suggest(s, terms3):
    t = terms3[0]
    typo = t[:-1] + ("x" if t[-1] != "x" else "q")
    r = dsl.execute_request(s, {
        "query": {"match_none": {}},
        "suggest": {
            "fix": {"text": typo, "term": {"size": 3,
                                           "suggest_mode": "missing"}},
            "auto": {"prefix": t[:3], "completion": {"size": 4}},
        }, "size": 0}, id_col="docid")
    assert "fix" in r["suggest"] and "auto" in r["suggest"]
    fixes = [x["suggestion"] for x in r["suggest"]["fix"]]
    assert t in fixes  # the real term is suggested for its typo
    comp = r["suggest"]["auto"]
    assert comp == s.complete(t[:3], size=4).to_dict(orient="records")


def test_fast_path_equals_general_path(s, terms3):
    a, b = terms3[0], terms3[1]
    fast_body = {"query": {"bool": {
        "must": [{"match": {"text": f"{a} {b}"}}],
        "filter": [{"range": {"turn_idx": {"gte": 1}}}]}}, "size": 8}
    # an impossible must_not forces the general (set-algebra) path while
    # leaving the result set unchanged
    slow_body = {"query": {"bool": {
        "must": [{"match": {"text": f"{a} {b}"}}],
        "filter": [{"range": {"turn_idx": {"gte": 1}}}],
        "must_not": [{"term": {"text": "zzzznotaterm"}}]}}, "size": 8}
    from opensearch_ray.search.dsl import _fast_path
    assert _fast_path(s, fast_body["query"], "text") is not None
    assert _fast_path(s, slow_body["query"], "text") is None
    f = dsl.execute_search(s, fast_body, id_col="docid")
    g = dsl.execute_search(s, slow_body, id_col="docid")
    assert f.docid.tolist() == g.docid.tolist()
    assert f.score.tolist() == g.score.tolist()


def test_search_after_score_paging(s, terms3):
    """Request-body search_after, implicit (_score desc, _doc asc) order:
    page 2 via the collector after= floor must equal the contiguous slice
    of a single deep request (SearchAfterBuilder.java semantics)."""
    qtext = f"{terms3[0]} {terms3[1]}"
    body = {"query": {"match": {"text": qtext}}, "size": 5}
    full = dsl.execute_search(s, {**body, "size": 15}, id_col="docid")
    p1 = dsl.execute_search(s, body, id_col="docid")
    cur = [float(p1.score.iloc[-1]), int(p1.docid.iloc[-1])]
    p2 = dsl.execute_search(s, {**body, "search_after": cur}, id_col="docid")
    assert p2.docid.tolist() == full.docid.tolist()[5:10]
    assert p2.score.tolist() == full.score.tolist()[5:10]
    # score-only cursor: strictly below the cursor score (ties excluded)
    p2b = dsl.execute_search(s, {**body, "search_after": [cur[0]]},
                             id_col="docid")
    assert (p2b.score < cur[0]).all()


def test_search_after_sorted_paging(s, terms3):
    """search_after under an explicit field sort (general path): the
    sort-tuple strictly-after mask resumes exactly where page 1 ended."""
    body = {"query": {"match": {"text": terms3[0]}},
            "sort": [{"turn_idx": {"order": "desc"}}, {"_doc": "asc"}],
            "size": 5, "_source": ["turn_idx"]}
    full = dsl.execute_search(s, {**body, "size": 15}, id_col="docid")
    p1 = dsl.execute_search(s, body, id_col="docid")
    cur = [int(p1.turn_idx.iloc[-1]), int(p1.docid.iloc[-1])]
    p2 = dsl.execute_search(s, {**body, "search_after": cur}, id_col="docid")
    assert p2.docid.tolist() == full.docid.tolist()[5:10]
    assert p2.turn_idx.tolist() == full.turn_idx.tolist()[5:10]
    # cursor arity must match the sort arity
    with pytest.raises(ValueError):
        dsl.execute_search(s, {**body, "search_after": [1]}, id_col="docid")


def test_execute_request_histogram_range_cardinality(s, terms3):
    """Round-4b request-body aggs: histogram (empty buckets filled),
    date_histogram (fixed_interval over epoch-ns doc values), range
    ([from, to) semantics), cardinality (exact per-segment fold)."""
    r = dsl.execute_request(s, {
        "query": {"match_all": {}},
        "aggs": {
            "h": {"histogram": {"field": "turn_idx", "interval": 2}},
            "rg": {"range": {"field": "turn_idx",
                             "ranges": [{"to": 2}, {"from": 2, "to": 5},
                                        {"from": 5}]}},
            "card": {"cardinality": {"field": "role"}},
        }, "size": 0}, id_col="docid")
    all_ti = np.concatenate([
        s.doc_values(seg.seg_id, "turn_idx")
        for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id)])
    # histogram: floor(v/2)*2 counts, contiguous keys
    hb = r["aggregations"]["h"]["buckets"]
    assert sum(b["doc_count"] for b in hb) == all_ti.size
    keys = [b["key"] for b in hb]
    assert keys == sorted(keys)
    got = {b["key"]: b["doc_count"] for b in hb}
    import collections
    want = collections.Counter((v // 2) * 2 for v in all_ti.tolist())
    assert {k: v for k, v in got.items() if v} == dict(want)
    # range: [from, to)
    rb = r["aggregations"]["rg"]["buckets"]
    assert rb[0]["doc_count"] == int((all_ti < 2).sum())
    assert rb[1]["doc_count"] == int(((all_ti >= 2) & (all_ti < 5)).sum())
    assert rb[2]["doc_count"] == int((all_ti >= 5).sum())
    # cardinality: exact distinct
    roles = np.concatenate([
        s.doc_values(seg.seg_id, "role")
        for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id)])
    assert r["aggregations"]["card"]["value"] == len(set(roles.tolist()))
    # date_histogram over the ts column (fixed 1d)
    r2 = dsl.execute_request(s, {
        "query": {"match_all": {}},
        "aggs": {"dh": {"date_histogram": {"field": "ts",
                                           "fixed_interval": "1d"}}},
        "size": 0}, id_col="docid")
    db = r2["aggregations"]["dh"]["buckets"]
    assert sum(b["doc_count"] for b in db) == s.N
    assert all(b["key"] % 86400e9 == 0 for b in db)


def test_docvalue_fields_and_fields_options(s, terms3):
    """Request-body docvalue_fields / fields projection on both executor
    paths (FetchFieldsPhase / docValueField)."""
    fastb = {"query": {"match": {"text": terms3[0]}}, "size": 4,
             "docvalue_fields": ["turn_idx"],
             "fields": [{"field": "role"}]}
    r = dsl.execute_search(s, fastb, id_col="docid")
    assert "turn_idx" in r.columns and "role" in r.columns
    fetched = s.fetch(r.docid.tolist(), columns=["turn_idx"]).to_pydict()
    by_id = dict(zip(fetched["_docid"], fetched["turn_idx"]))
    assert [by_id[d] for d in r.docid.tolist()] == r.turn_idx.tolist()
    slowb = dict(fastb)
    slowb["sort"] = [{"turn_idx": "asc"}]
    r2 = dsl.execute_search(s, slowb, id_col="docid")
    assert "turn_idx" in r2.columns and "role" in r2.columns
    assert r2.turn_idx.is_monotonic_increasing


def test_explain_option(s, terms3):
    """Request-body explain: per-hit JSON scoring breakdown whose summed
    score equals the hit score (ExplainPhase)."""
    import json
    r = dsl.execute_search(s, {"query": {"match": {"text": terms3[0]}},
                               "size": 3, "explain": True}, id_col="docid")
    assert "_explanation" in r.columns
    for _, row in r.iterrows():
        e = json.loads(row["_explanation"])
        assert abs(e["score"] - row["score"]) < 1e-4
    # pure-filter query: constant-score marker
    r2 = dsl.execute_search(s, {"query": {"constant_score": {
        "filter": {"term": {"text": terms3[0]}}}},
        "size": 2, "explain": True}, id_col="docid")
    e2 = json.loads(r2["_explanation"].iloc[0])
    assert e2.get("constant_score") is True


def test_after_key_masks_null_cursor():
    """A cursor tuple ending on a missing value (which the engine itself
    emits when a page ends on a null sort key) must keep paging: nothing
    sorts strictly after a missing key, missing rows tie
    (SearchAfterBuilder missing-value semantics)."""
    vals = np.array([1.0, np.nan, 3.0, np.nan])
    for cur in (None, float("nan")):
        gt, eq = dsl._after_key_masks(vals, desc=False, cursor_val=cur)
        assert not gt.any()
        assert eq.tolist() == [False, True, False, True]
    dts = np.array(["2024-01-01", "NaT", "2024-01-03", "NaT"],
                   dtype="datetime64[ns]")
    gt, eq = dsl._after_key_masks(dts, desc=True, cursor_val=None)
    assert not gt.any()
    assert eq.tolist() == [False, True, False, True]
    # concrete cursor still works on both branches
    gt, eq = dsl._after_key_masks(vals, desc=False, cursor_val=1.0)
    assert gt.tolist() == [False, True, True, True]  # missing sorts last
    assert eq.tolist() == [True, False, False, False]


def test_histogram_too_many_buckets(s):
    """min_doc_count=0 gap-fill is bounded by the search.max_buckets
    analogue (65536) — a sparse field with a tiny interval errors instead
    of OOMing the driver (MultiBucketConsumerService)."""
    with pytest.raises(ValueError, match="too_many_buckets"):
        dsl.execute_request(s, {
            "query": {"match_all": {}},
            "aggs": {"h": {"histogram": {"field": "turn_idx",
                                         "interval": 0.00001}}},
            "size": 0})
    # min_doc_count=1 skips the fill entirely -> no error, sparse keys only
    r = dsl.execute_request(s, {
        "query": {"match_all": {}},
        "aggs": {"h": {"histogram": {"field": "turn_idx",
                                     "interval": 0.00001,
                                     "min_doc_count": 1}}},
        "size": 0})
    assert sum(b["doc_count"] for b in
               r["aggregations"]["h"]["buckets"]) == s.N


def test_request_aggs_sub_agg_trees(s, terms3):
    """Sub-agg trees under terms / histogram / range buckets
    (AggregatorFactories nesting): per-bucket doc subsets recurse into
    the child aggs; values verified against per-bucket brute force."""
    body = {"query": {"match": {"text": terms3[0]}},
            "aggs": {
                "roles": {"terms": {"field": "role", "size": 5},
                          "aggs": {"avg_turn": {"avg": {
                              "field": "turn_idx"}}}},
                "h": {"histogram": {"field": "turn_idx", "interval": 20},
                      "aggs": {"n_roles": {"cardinality": {
                          "field": "role"}}}},
                "rg": {"range": {"field": "turn_idx",
                                 "ranges": [{"to": 10}, {"from": 10}]},
                       "aggs": {"mx": {"max": {"field": "turn_idx"}}}}},
            "size": 0}
    r = dsl.execute_request(s, body)
    match = dsl.query_docs(s, {"match": {"text": terms3[0]}})
    roles = dsl._gather_values(s, match, "role")
    turns = dsl._gather_values(s, match, "turn_idx").astype(np.float64)
    # terms buckets + per-bucket avg
    for b in r["aggregations"]["roles"]["buckets"]:
        m = roles == b["key"]
        assert b["doc_count"] == int(m.sum())
        assert abs(b["avg_turn"]["value"] - turns[m].mean()) < 1e-9
    # histogram buckets + per-bucket cardinality
    for b in r["aggregations"]["h"]["buckets"]:
        m = np.floor(turns / 20) * 20 == b["key"]
        assert b["doc_count"] == int(m.sum())
        if b["doc_count"]:
            assert b["n_roles"]["value"] == len(set(roles[m].tolist()))
    # range buckets + per-bucket max
    rb = r["aggregations"]["rg"]["buckets"]
    assert abs(rb[0]["mx"]["value"] - turns[turns < 10].max()) < 1e-9
    assert abs(rb[1]["mx"]["value"] - turns[turns >= 10].max()) < 1e-9


def test_request_aggs_calendar_percentiles_extstats(s):
    """Round-5 request-body aggs: calendar date_histogram (Monday weeks),
    exact nearest-rank percentiles, extended_stats."""
    r = dsl.execute_request(s, {
        "query": {"match_all": {}},
        "aggs": {"w": {"date_histogram": {"field": "ts",
                                          "calendar_interval": "week"}},
                 "p": {"percentiles": {"field": "turn_idx",
                                       "percents": [50.0, 95.0]}},
                 "es": {"extended_stats": {"field": "turn_idx"}}},
        "size": 0})
    wb = r["aggregations"]["w"]["buckets"]
    assert sum(b["doc_count"] for b in wb) == s.N
    for b in wb:  # every key is a Monday
        assert (np.datetime64(b["key_as_string"], "D").astype(np.int64)
                + 3) % 7 == 0
    turns = np.sort(dsl._gather_values(
        s, dsl.query_docs(s, {"match_all": {}}), "turn_idx")
        .astype(np.float64))
    p = r["aggregations"]["p"]["values"]
    assert p["50"] == float(turns[int(np.ceil(0.5 * turns.size)) - 1])
    assert p["95"] == float(turns[int(np.ceil(0.95 * turns.size)) - 1])
    es = r["aggregations"]["es"]
    assert es["count"] == turns.size
    assert abs(es["avg"] - turns.mean()) < 1e-9
    assert abs(es["variance"] - turns.var()) < 1e-6
    assert abs(es["std_deviation"] - turns.std()) < 1e-9


def test_request_aggs_top_hits_sub(s, terms3):
    """top_hits inside a terms bucket (TopHitsAggregator): per-bucket top
    docs by an explicit sort, _source projection."""
    r = dsl.execute_request(s, {
        "query": {"match": {"text": terms3[0]}},
        "aggs": {"roles": {"terms": {"field": "role", "size": 3},
                           "aggs": {"top": {"top_hits": {
                               "size": 2,
                               "sort": [{"turn_idx": {"order": "desc"}}],
                               "_source": ["turn_idx", "role"]}}}}},
        "size": 0})
    match = dsl.query_docs(s, {"match": {"text": terms3[0]}})
    roles = dsl._gather_values(s, match, "role")
    turns = dsl._gather_values(s, match, "turn_idx").astype(np.int64)
    for b in r["aggregations"]["roles"]["buckets"]:
        m = roles == b["key"]
        th = b["top"]["hits"]
        assert th["total"] == int(m.sum())
        bd, bt = match[m], turns[m]
        want = bd[np.lexsort((bd, -bt.astype(np.float64)))][:2]
        assert [h["_id"] for h in th["hits"]] == want.tolist()
        for h in th["hits"]:
            assert h["_source"]["role"] == b["key"]


def test_matched_queries_named_clauses(s, terms3):
    """MatchedQueriesPhase (_name markers): per-hit list of the named
    clauses it satisfies, both clause-level and field-level placements;
    the main result set is unchanged by stripping names."""
    a, b = terms3[0], terms3[1]
    body = {"query": {"bool": {
        "should": [
            {"term": {"text": {"value": a, "_name": "is_a"}}},
            {"term": {"text": {"value": b, "_name": "is_b"}}},
        ],
        "filter": [{"range": {"turn_idx": {"gte": 0, "_name": "rng"}}}],
    }}, "size": 30}
    r = dsl.execute_request(s, body, id_col="docid")
    hits = r["hits"]
    assert "matched_queries" in hits.columns and len(hits)
    da = set(s.term_docs(a).tolist())
    db = set(s.term_docs(b).tolist())
    for _, row in hits.iterrows():
        names = set(row["matched_queries"])
        assert ("is_a" in names) == (row["docid"] in da)
        assert ("is_b" in names) == (row["docid"] in db)
        assert "rng" in names  # the filter matches every hit
    # unnamed request: identical hit set, no column
    plain = {"query": {"bool": {
        "should": [{"term": {"text": a}}, {"term": {"text": b}}],
        "filter": [{"range": {"turn_idx": {"gte": 0}}}]}}, "size": 30}
    r2 = dsl.execute_request(s, plain, id_col="docid")
    assert r2["hits"]["docid"].tolist() == hits["docid"].tolist()
    assert "matched_queries" not in r2["hits"].columns


def test_stored_script_store(tmp_path):
    """_scripts/{id} surface: put/get/delete for mustache (persisted) and
    python (in-memory) langs; execute = the painless-execute analogue;
    stored search template renders by id and survives a reload."""
    from opensearch_ray.scripts import ScriptStore
    p = str(tmp_path / "scripts.json")
    st = ScriptStore(p)
    st.put_script("tmpl", '{"query": {"term": {"text": "{{t}}"}}}')
    st.put_script("double", lambda params: params["x"] * 2, lang="python")
    assert st.get_script("tmpl")["lang"] == "mustache"
    assert st.execute("double", {"x": 21}) == 42
    body = st.render_search_template("tmpl", {"t": "hello"})
    assert body == {"query": {"term": {"text": "hello"}}}
    # mustache scripts persist; python callables are process-local
    st2 = ScriptStore(p)
    assert st2.render_search_template("tmpl", {"t": "x"})["query"][
        "term"]["text"] == "x"
    import pytest as _pt
    with _pt.raises(KeyError):
        st2.get_script("double")
    assert st.delete_script("tmpl") and not st.delete_script("tmpl")
