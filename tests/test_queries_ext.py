"""exists / regexp / terms_set / span family / intervals / match_bool_prefix
(opensearch_ray.search.queries) — brute-force parity over the stored text."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opensearch_ray.search import Searcher
from opensearch_ray.search.queries import (
    exists_docs, expand_regexp, intervals_docs, match_bool_prefix_docs,
    regexp_docs, span_first_docs, span_not_docs, span_or_docs,
    terms_set_docs)


@pytest.fixture(scope="module")
def s(built_index):
    return Searcher(built_index.index_dir)


@pytest.fixture(scope="module")
def pos_index(transcript_corpus, tmp_path_factory):
    """Positions-enabled index over the same corpus (indexed-positions path)."""
    from opensearch_ray.index.build import build_index
    corpus_dir, _ = transcript_corpus
    idx = tmp_path_factory.mktemp("qidx") / "idx"
    return build_index(corpus_dir, str(idx), analyzer="transcript",
                       index_positions=True, num_buckets=4,
                       hot_df_threshold=400)


@pytest.fixture(scope="module")
def analyzed(s):
    """docid -> (tokens, positions) for every doc (brute-force reference)."""
    full = s.fetch(list(range(s.N)), columns=[s.manifest.text_col])
    out = {}
    for r in full.to_pylist():
        out[r["_docid"]] = s.analyzer.analyze(r[s.manifest.text_col] or "")
    return out


def test_regexp(s, analyzed):
    pat = "ba.*a"
    import re
    rx = re.compile(f"^(?:{pat})$")
    want_terms = sorted({t for toks, _ in analyzed.values() for t in toks
                         if rx.match(t)})
    assert expand_regexp(s, pat) == want_terms
    want = sorted(d for d, (toks, _) in analyzed.items()
                  if any(rx.match(t) for t in toks))
    assert regexp_docs(s, pat).tolist() == want
    assert regexp_docs(s, "zzzz+").size == 0


def test_match_bool_prefix(s, analyzed):
    got = match_bool_prefix_docs(s, "bace flo")
    want = sorted(d for d, (toks, _) in analyzed.items()
                  if "bace" in toks or any(t.startswith("flo") for t in toks))
    assert sorted(got.tolist()) == want


def test_span_or(s, analyzed):
    got = span_or_docs(s, ["bace", "cedi"])
    want = sorted(d for d, (toks, _) in analyzed.items()
                  if "bace" in toks or "cedi" in toks)
    assert sorted(got.tolist()) == want


def _pos_of(analyzed, d, term):
    toks, poss = analyzed[d]
    return [p for t, p in zip(toks, poss) if t == term]


@pytest.mark.parametrize("use_positions", [False, True])
def test_span_first(s, pos_index, analyzed, use_positions):
    eng = Searcher(pos_index.index_dir) if use_positions else s
    got = span_first_docs(eng, "bace", end=6)
    want = sorted(d for d in analyzed
                  if _pos_of(analyzed, d, "bace")
                  and _pos_of(analyzed, d, "bace")[0] + 1 <= 6)
    assert sorted(got.tolist()) == want


@pytest.mark.parametrize("use_positions", [False, True])
def test_span_not(s, pos_index, analyzed, use_positions):
    eng = Searcher(pos_index.index_dir) if use_positions else s
    got = span_not_docs(eng, "bace", "cedi", pre=2, post=2)
    want = []
    for d in analyzed:
        ip = _pos_of(analyzed, d, "bace")
        ep = set(_pos_of(analyzed, d, "cedi"))
        if ip and any(not any(p - 2 <= e <= p + 2 for e in ep) for p in ip):
            want.append(d)
    assert sorted(got.tolist()) == sorted(want)


@pytest.mark.parametrize("use_positions", [False, True])
@pytest.mark.parametrize("ordered,gaps", [(True, 0), (True, 2), (False, 1)])
def test_intervals_match(s, pos_index, analyzed, use_positions, ordered, gaps):
    eng = Searcher(pos_index.index_dir) if use_positions else s
    got = intervals_docs(eng, {"match": {
        "query": "bace cedi", "ordered": ordered, "max_gaps": gaps}})
    want = []
    for d in analyzed:
        p1, p2 = _pos_of(analyzed, d, "bace"), _pos_of(analyzed, d, "cedi")
        if ordered:
            hit = any(b > a and b - a - 1 <= gaps for a in p1 for b in p2)
        else:
            hit = any(a != b and abs(b - a) - 1 <= gaps
                      for a in p1 for b in p2)
        if hit:
            want.append(d)
    assert sorted(got.tolist()) == sorted(want)


def test_intervals_combinators(s, analyzed):
    a = intervals_docs(s, {"match": {"query": "bace cedi", "ordered": True,
                                     "max_gaps": 1}})
    b = intervals_docs(s, {"match": {"query": "difo", "max_gaps": -1}})
    union = intervals_docs(s, {"any_of": {"intervals": [
        {"match": {"query": "bace cedi", "ordered": True, "max_gaps": 1}},
        {"match": {"query": "difo", "max_gaps": -1}}]}})
    inter = intervals_docs(s, {"all_of": {"intervals": [
        {"match": {"query": "bace cedi", "ordered": True, "max_gaps": 1}},
        {"match": {"query": "difo", "max_gaps": -1}}]}})
    assert set(union.tolist()) == set(a.tolist()) | set(b.tolist())
    assert set(inter.tolist()) == set(a.tolist()) & set(b.tolist())


def _mini_corpus_index(tmp_path_factory, texts, name):
    from opensearch_ray.index.build import build_index
    corpus = tmp_path_factory.mktemp(name) / "corpus"
    corpus.mkdir(parents=True)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, str(corpus / "part-0.parquet"))
    idx = corpus.parent / "idx"
    return Searcher(build_index(str(corpus), str(idx), analyzer="standard",
                                index_positions=True, num_buckets=2,
                                hot_df_threshold=100).index_dir)


def test_intervals_all_of_max_gaps(tmp_path_factory):
    """all_of with max_gaps/ordered — sub-interval span tracking
    (IntervalsSourceProvider.Combine): pinned tiny-doc semantics."""
    eng = _mini_corpus_index(tmp_path_factory, [
        "alpha beta delta",          # 0: [ab][d] adjacent
        "alpha beta zeta delta",     # 1: one gap between [ab] and [d]
        "delta alpha beta",          # 2: [d] precedes [ab]
        "alpha delta beta",          # 3: no contiguous [ab] at all
        "alpha beta zeta zeta zeta delta",  # 4: three gaps
    ], "ivgaps")
    sub_ab = {"match": {"query": "alpha beta", "ordered": True,
                        "max_gaps": 0}}
    sub_d = {"match": {"query": "delta"}}

    def run(ordered, gaps):
        return sorted(intervals_docs(eng, {"all_of": {
            "intervals": [sub_ab, sub_d], "ordered": ordered,
            "max_gaps": gaps}}).tolist())

    assert run(True, 0) == [0]
    assert run(True, 1) == [0, 1]
    assert run(True, 3) == [0, 1, 4]
    assert run(False, 0) == [0, 2]     # unordered admits [d] first
    assert run(False, -1) == [0, 1, 2, 4]  # doc-level conjunction
    # nested all_of inside any_of still resolves
    got = intervals_docs(eng, {"any_of": {"intervals": [
        {"all_of": {"intervals": [sub_ab, sub_d], "ordered": True,
                    "max_gaps": 0}},
        {"match": {"query": "zeta"}}]}})
    assert sorted(got.tolist()) == [0, 1, 4]


def test_span_near_span_gap(tmp_path_factory):
    """span_gap inside span_near (SpanGapQueryBuilder): consumes a fixed
    number of unmatched positions between neighbors."""
    from opensearch_ray.search.queries import span_near_clauses_docs
    eng = _mini_corpus_index(tmp_path_factory, [
        "alpha beta gamma",        # 0: exactly one position between
        "alpha gamma",             # 1: adjacent — gap slot unsatisfied
        "alpha beta zeta gamma",   # 2: two between
    ], "spangap")
    clauses = ["alpha", {"span_gap": {"text": 1}}, "gamma"]
    assert span_near_clauses_docs(eng, clauses, slop=0,
                                  in_order=True).tolist() == [0]
    assert span_near_clauses_docs(eng, clauses, slop=1,
                                  in_order=True).tolist() == [0, 2]
    with pytest.raises(ValueError):
        span_near_clauses_docs(eng, clauses, slop=0, in_order=False)


def test_exists_and_terms_set(tmp_path):
    """exists over a nullable column + terms_set per-doc msm, on a tiny
    purpose-built corpus (nulls in 'opt', per-doc 'req')."""
    from opensearch_ray.index.build import build_index
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    texts = ["hash join stream", "hash merge", "join stream", "sort sort",
             "hash join", "stream"]
    tbl = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts),
        "opt": pa.array(["a", None, "b", None, "c", None]),
        "req": pa.array([1, 2, 2, 1, 3, 1], pa.int64()),
    })
    pq.write_table(tbl, str(corpus / "part-0.parquet"))
    m = build_index(str(corpus), str(tmp_path / "idx"), analyzer="standard",
                    text_col="text", sort_cols=("doc_id",), num_buckets=2)
    s2 = Searcher(m.index_dir)
    assert exists_docs(s2, "opt").tolist() == [0, 2, 4]
    assert exists_docs(s2, "req").tolist() == [0, 1, 2, 3, 4, 5]
    # matched counts vs per-doc req: doc0 has 3>=1, doc1 has 1<2, doc2 has
    # 2>=2, doc3 has 0<1, doc4 has 2<3, doc5 has 1>=1
    got = terms_set_docs(s2, ["hash", "join", "stream"], "req")
    assert got.tolist() == [0, 2, 5]


def test_vocab_prefix_pruned_reads(tmp_path):
    """Prefix/wildcard/completion vocab reads prune by parquet row-group
    term min/max (the terms-dict-on-disk shape): on a 50k-term vocabulary a
    prefix slice touches a small fraction of the stats row groups, and the
    pruned read returns exactly the full-scan answer."""
    import os
    import pyarrow.parquet as pq
    from opensearch_ray.index.build import build_index

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    # 5000 docs x 10 unique terms -> 50k distinct terms across 4 shards
    texts = [" ".join(f"t{i:05d}w{j}" for j in range(10)) for i in range(5000)]
    tbl = pa.table({"doc_id": pa.array(range(5000), pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, str(corpus / "part-0.parquet"))
    m = build_index(str(corpus), str(tmp_path / "idx"), analyzer="standard",
                    text_col="text", sort_cols=("doc_id",), num_buckets=4)
    s = Searcher(m.index_dir)

    stats_dir = os.path.join(m.index_dir, "term_stats")
    lo, hi = s._prefix_bounds("t00123")
    total_rg, hit_rg, total_bytes, hit_bytes = 0, 0, 0, 0
    for f in sorted(os.listdir(stats_dir)):
        md = pq.read_metadata(os.path.join(stats_dir, f))
        ti = md.schema.to_arrow_schema().get_field_index("term")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = rg.column(ti).statistics
            total_rg += 1
            total_bytes += rg.total_byte_size
            if st.min <= hi and st.max >= lo:
                hit_rg += 1
                hit_bytes += rg.total_byte_size
    assert total_rg >= 8  # the vocabulary spans many row groups
    assert hit_rg <= max(1, total_rg // 4)  # the prefix slice prunes most
    assert hit_bytes < total_bytes / 2
    # pruned read == full-scan answer
    want = [f"t00123w{j}" for j in range(10)]
    assert s.expand_prefix("t00123") == sorted(want)
    assert sorted(s.expand_wildcard("t00123w?")) == sorted(want)
    comp = s.complete("t00123w", size=5)
    assert list(comp["term"][:1])[0].startswith("t00123w")
    # the full dict was never materialized on this Searcher
    assert not hasattr(s, "_vocab_tbl")


def test_ids_and_constant_score(s):
    from opensearch_ray.search.queries import constant_score_docs, ids_docs
    got = ids_docs(s, [0, 2, 5, 10**9], "conv_id")  # string col: no hits
    assert got.size == 0
    got = ids_docs(s, [1, 3, 10**9], "turn_idx")
    vals = np.concatenate([
        s.doc_values(seg.seg_id, "turn_idx")
        for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id)])
    assert got.tolist() == np.flatnonzero(np.isin(vals, [1, 3])).tolist()
    d, sc = constant_score_docs(s, s.term_docs("bace"), boost=2.5)
    assert d.tolist() == sorted(s.term_docs("bace").tolist())
    assert (sc == 2.5).all()


def test_simple_query_string(s, analyzed):
    from opensearch_ray.search.queries import simple_query_string_docs

    def docs_with(pred):
        return {d for d, (toks, _) in analyzed.items() if pred(toks)}

    got = simple_query_string_docs(s, "bace cedi")  # default OR
    assert set(got.tolist()) == docs_with(lambda t: "bace" in t or "cedi" in t)
    got = simple_query_string_docs(s, "bace + cedi")
    assert set(got.tolist()) == docs_with(lambda t: "bace" in t and "cedi" in t)
    got = simple_query_string_docs(s, "bace + -cedi")
    assert set(got.tolist()) == docs_with(
        lambda t: "bace" in t and "cedi" not in t)
    got = simple_query_string_docs(s, "bace + (cedi | difo)")
    assert set(got.tolist()) == docs_with(
        lambda t: "bace" in t and ("cedi" in t or "difo" in t))
    # phrase + prefix leaves
    got = simple_query_string_docs(s, '"bace cedi" | fl*')
    phrase = set(s.match_phrase("bace cedi").tolist())
    pre = docs_with(lambda t: any(x.startswith("fl") for x in t))
    assert set(got.tolist()) == phrase | pre
    # lenient: stray operators never raise
    assert simple_query_string_docs(s, ") | + (").size == 0


def test_script_score(s):
    from opensearch_ray.search.queries import script_score_topk
    cand = s.term_docs("bace")
    docs, scores = script_score_topk(
        s, cand, lambda dv: dv["turn_idx"].astype(np.float64), k=5)
    assert len(docs) == min(5, cand.size)
    assert (np.diff(scores) <= 0).all()
    # ties broken by docid asc
    eq = scores[:-1] == scores[1:]
    assert (np.diff(docs)[eq] > 0).all()


def test_distance_feature(tmp_path):
    from opensearch_ray.index.build import build_index
    from opensearch_ray.search.queries import distance_feature_topk
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    ts = pa.array(np.arange(10) * np.timedelta64(1, "D")
                  + np.datetime64("2024-01-01T00:00:00", "us"))
    tbl = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                    "text": pa.array(["click"] * 10), "ts": ts})
    pq.write_table(tbl, str(corpus / "part-0.parquet"))
    m = build_index(str(corpus), str(tmp_path / "idx"), analyzer="standard",
                    text_col="text", sort_cols=("doc_id",), num_buckets=2)
    s2 = Searcher(m.index_dir)
    pivot = 2 * 24 * 3600 * 1000.0  # 2 days in ms
    docs, scores = distance_feature_topk(
        s2, "ts", "2024-01-05T00:00:00", pivot, s2.term_docs("click"), k=3)
    # doc 4 is the origin (score = boost), docs 3/5 tie at 1 day; docid asc
    assert docs.tolist() == [4, 3, 5]
    assert scores[0] == 1.0 and scores[1] == scores[2] == pytest.approx(2 / 3)


@pytest.mark.parametrize("use_positions", [False, True])
def test_span_multi_in_near(s, pos_index, analyzed, use_positions):
    from opensearch_ray.search.queries import span_near_clauses_docs
    eng = Searcher(pos_index.index_dir) if use_positions else s
    got = span_near_clauses_docs(
        eng, ["bace", {"span_multi": {"prefix": "ce"}}], slop=2,
        in_order=True)
    want = []
    for d, (toks, poss) in analyzed.items():
        p1 = [p for t, p in zip(toks, poss) if t == "bace"]
        p2 = [p for t, p in zip(toks, poss) if t.startswith("ce")]
        if any(b > a and b - a - 1 <= 2 for a in p1 for b in p2):
            want.append(d)
    assert sorted(got.tolist()) == sorted(want)


def test_field_masking_span(tmp_path):
    from opensearch_ray.search import MultiFieldSearcher
    from opensearch_ray.search import build_multi_field_index
    from opensearch_ray.search.queries import field_masking_span_docs
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    # stem field = body with 'running'->'run' (the masked-subfield pattern)
    body = ["running fast hash", "hash running", "walk slow", "running hash"]
    stem = [b.replace("running", "run") for b in body]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "body": pa.array(body), "stem": pa.array(stem)})
    pq.write_table(tbl, str(corpus / "d.parquet"))
    build_multi_field_index(str(corpus / "d.parquet"), str(tmp_path / "mf"),
                            fields=["body", "stem"], analyzer="standard",
                            sort_cols=("doc_id",), num_buckets=2)
    mfs = MultiFieldSearcher(str(tmp_path / "mf"))
    # stem-field 'run' immediately before body-field 'hash': doc3 only
    # (doc0 has a 1-token gap, doc1 has them reversed)
    got = field_masking_span_docs(
        mfs, [("stem", "run"), ("body", "hash")], slop=0, in_order=True)
    assert got.tolist() == [3]
    got = field_masking_span_docs(
        mfs, [("stem", "run"), ("body", "hash")], slop=1, in_order=True)
    assert got.tolist() == [0, 3]
    # unordered with slop 1 admits the reversed doc1 too
    got = field_masking_span_docs(
        mfs, [("stem", "run"), ("body", "hash")], slop=1, in_order=False)
    assert got.tolist() == [0, 1, 3]


@pytest.mark.parametrize("use_positions", [False, True])
def test_span_containing_within(s, pos_index, analyzed, use_positions):
    from opensearch_ray.search.queries import (span_containing_docs,
                                               span_within_docs)
    eng = Searcher(pos_index.index_dir) if use_positions else s
    big = {"span_near": {"terms": ["bace", "cedi"], "slop": 4,
                         "in_order": True}}
    got = span_containing_docs(eng, big, "difo")
    want = []
    for d in analyzed:
        p1 = _pos_of(analyzed, d, "bace")
        p2 = _pos_of(analyzed, d, "cedi")
        pl = _pos_of(analyzed, d, "difo")
        hit = False
        for a in p1:
            nxt = [b for b in p2 if b > a]
            if not nxt:
                continue
            b = min(nxt)
            if (b - a + 1) - 2 <= 4 and any(a <= p <= b for p in pl):
                hit = True
                break
        if hit:
            want.append(d)
    assert sorted(got.tolist()) == sorted(want)
    assert (span_within_docs(eng, big, "difo").tolist() == got.tolist())


# ------------------------------------------------------- search_as_you_type

def test_search_as_you_type(tmp_path):
    """Layout + scoring parity vs a brute-force model of the reference's
    multi_match bool_prefix (SearchAsYouTypeFieldMapper defaults)."""
    import math
    from opensearch_ray.index.norms import NORM_LENGTH_TABLE
    from opensearch_ray.search.sayt import (SaytSearcher, build_sayt_index,
                                            query_shingles, sayt_analyzers)

    texts = ["the quick brown fox jumps", "quick brown foxtrot",
             "brown fog quick", "fox", "slow green turtle quick brown",
             "quick quick brown"]
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(pa.table({"doc_id": list(range(len(texts))),
                             "text": texts}), str(corpus / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_sayt_index(str(corpus), idx, field="text",
                     base_analyzer="standard", sort_cols=("doc_id",),
                     num_buckets=2)
    s = SaytSearcher(idx, dtype=np.float64)

    # prefix analyzer emits trailing-padded shingles ("fox  " for a final
    # token), so single-word prefixes resolve in the prefix sub-index
    ptoks = sayt_analyzers("standard")["prefix"]
    assert "fox  " in ptoks.tokens("fox")
    assert query_shingles(["a", "b", "c"], 2) == ["a b", "b c"]

    # brute-force clause-sum model
    def norm_len(dl):
        return int(NORM_LENGTH_TABLE[np.searchsorted(
            np.sort(NORM_LENGTH_TABLE), dl, side="right") - 1]) if dl else 0

    toks = [t.split() for t in texts]
    N, k1, b = len(texts), 1.2, 0.75

    def bm25_field(streams, terms):
        dls = [len(x) for x in streams]
        avgdl = sum(dls) / N
        qn = [NORM_LENGTH_TABLE[np.searchsorted(np.sort(NORM_LENGTH_TABLE),
              d, side="right") - 1] if d else 0 for d in dls]
        out = np.zeros(N)
        for t in terms:
            df = sum(1 for x in streams if t in x)
            if not df:
                continue
            idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
            for d, x in enumerate(streams):
                tf = x.count(t)
                if tf:
                    out[d] += idf * (k1 + 1) * tf / (
                        tf + k1 * (1 - b + b * qn[d] / avgdl))
        return out

    def padded_shingles(x, n=3):
        return [" ".join((x[i:i + n] + [""] * n)[:n])
                for i in range(len(x))]

    def prefix_clause(value):
        pf = [padded_shingles(x) for x in toks]
        tfs = np.array([sum(1 for sh in x if sh.startswith(value))
                        for x in pf], float)
        df = int((tfs > 0).sum())
        out = np.zeros(N)
        if df:
            idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
            nz = tfs > 0
            out[nz] = idf * (k1 + 1) * tfs[nz] / (tfs[nz] + k1)
        return out

    q = ["quick", "brown", "f"]
    expect = (bm25_field(toks, q[:-1]) + prefix_clause("f")
              + bm25_field([query_shingles(x, 2) for x in toks],
                           ["quick brown"]) + prefix_clause("brown f")
              + prefix_clause("quick brown f"))
    hits = s.query("quick brown f", k=6)
    got = {h.docid: h.score for h in hits}
    for d in range(N):
        if expect[d] > 0:
            assert abs(got[d] - expect[d]) < 1e-9, (d, got.get(d), expect[d])
    order = sorted(range(N), key=lambda d: (-expect[d], d))
    assert [h.docid for h in hits] == [d for d in order if expect[d] > 0]


def test_search_options_features(s):
    """post_filter / min_score / matched_queries / indices_boost semantics
    vs recomputation from the engine's own unrestricted search."""
    from opensearch_ray.search.features import (
        indices_boost_search, matched_queries_search, min_score_search,
        post_filter_search)

    q = "bace cedi"
    hits = s.search(q, k=10**9)

    ms = min_score_search(s, q, 3.0, k=10**9)
    want = [(h.docid, h.score) for h in hits if h.score >= 3.0]
    assert list(zip(ms["_docid"], ms["score"])) == want

    r = post_filter_search(s, q, {"role": "user"}, agg_field="role",
                           k=10**9)
    fetched = s.fetch([h.docid for h in hits]).to_pandas()
    counts = fetched.groupby("role").size()
    got = dict(zip(r["aggregations"]["key"], r["aggregations"]["doc_count"]))
    assert got == counts.to_dict()          # aggs over UNfiltered matches
    keep = set(fetched.loc[fetched["role"] == "user", "_docid"])
    assert r["hits"]["_docid"].tolist() == [h.docid for h in hits
                                            if h.docid in keep]

    mq = matched_queries_search(s, {"a": ["bace"], "b": ["cedi"]})
    da, db = set(s.term_docs("bace")), set(s.term_docs("cedi"))
    assert set(mq["_docid"]) == da | db
    for d, m in zip(mq["_docid"], mq["matched"]):
        assert m == ",".join(n for n, ds in [("a", da), ("b", db)] if d in ds)

    ib = indices_boost_search({"x": s, "y": s}, q, {"x": 2.0}, k=6)
    top = sorted([("x", h.docid, h.score * 2.0) for h in s.search(q, k=6)]
                 + [("y", h.docid, h.score) for h in s.search(q, k=6)],
                 key=lambda r: (-r[2], r[0], r[1]))[:6]
    assert list(map(tuple, ib.itertuples(index=False))) == top


def test_intervals_filter_and_multiterm(tmp_path_factory):
    """IntervalFilter (containing / not_containing / contained_by /
    overlapping / not_overlapping) + prefix / wildcard sources —
    pinned tiny-doc semantics."""
    eng = _mini_corpus_index(tmp_path_factory, [
        "alpha beta gamma",       # 0: [a..g] window contains beta
        "alpha zeta gamma",       # 1: window without beta
        "alpha gamma beta",       # 2: beta outside the [a..g] window
        "delta epsilon",          # 3: neither
    ], "ivfilter")
    base = {"match": {"query": "alpha gamma", "ordered": True,
                      "max_gaps": 1}}

    def with_filter(kind):
        m = dict(base["match"])
        m["filter"] = {kind: {"match": {"query": "beta"}}}
        return intervals_docs(eng, {"match": m})

    assert sorted(intervals_docs(eng, base).tolist()) == [0, 1, 2]
    assert sorted(with_filter("containing").tolist()) == [0]
    assert sorted(with_filter("not_containing").tolist()) == [1, 2]
    assert sorted(with_filter("overlapping").tolist()) == [0]
    assert sorted(with_filter("not_overlapping").tolist()) == [1, 2]
    # contained_by: alpha interval inside the [alpha..gamma] window of 0/1/2
    m2 = {"match": {"query": "alpha",
                    "filter": {"contained_by": {"match": {
                        "query": "alpha gamma", "max_gaps": 1,
                        "ordered": True}}}}}
    assert sorted(intervals_docs(eng, m2).tolist()) == [0, 1, 2]
    # prefix / wildcard interval sources
    assert sorted(intervals_docs(
        eng, {"prefix": {"prefix": "gam"}}).tolist()) == [0, 1, 2]
    assert sorted(intervals_docs(
        eng, {"wildcard": {"pattern": "*eta"}}).tolist()) == [0, 1, 2]
    # wildcard inside an ordered all_of with gaps (span path)
    got = intervals_docs(eng, {"all_of": {
        "intervals": [{"match": {"query": "alpha"}},
                      {"wildcard": {"pattern": "?eta"}}],
        "ordered": True, "max_gaps": 0}})
    assert sorted(got.tolist()) == [0, 1]


def test_intervals_fuzzy_regexp_sources(tmp_path_factory):
    """Intervals fuzzy / regexp sources (IntervalsSourceProvider.Fuzzy /
    Regexp): expansion against the terms dict, span path composes."""
    eng = _mini_corpus_index(tmp_path_factory, [
        "alpha beta gamma",
        "alphax beta gamma",  # 1 insertion from 'alpha'
        "zeta beta gamma",
    ], "ivfz")
    got = intervals_docs(eng, {"fuzzy": {"term": "alpha", "fuzziness": 1}})
    assert sorted(got.tolist()) == [0, 1]
    got = intervals_docs(eng, {"regexp": {"pattern": "al.*"}})
    assert sorted(got.tolist()) == [0, 1]
    # fuzzy inside an ordered combine with gaps
    got = intervals_docs(eng, {"all_of": {
        "intervals": [{"fuzzy": {"term": "alpha", "fuzziness": 1}},
                      {"match": {"query": "gamma"}}],
        "ordered": True, "max_gaps": 1}})
    assert sorted(got.tolist()) == [0, 1]


def test_fuzzy_prefix_length(s, analyzed):
    """FuzzyQuery.prefixLength: exact-prefix gate + prefix-pruned
    terms-dict range; results equal the full scan filtered by prefix."""
    full = set(s.expand_fuzzy("bace", max_edits=1))
    pref = set(s.expand_fuzzy("bace", max_edits=1, prefix_length=2))
    assert pref == {t for t in full if t.startswith("ba")}
    assert "bace" in pref
    # prefix_length larger than any match -> only exact-prefix terms
    assert set(s.expand_fuzzy("bace", max_edits=1, prefix_length=4)) \
        == {t for t in full if t.startswith("bace")}


def test_intervals_filter_before_after(tmp_path_factory):
    """IntervalFilter before/after: the base span must end before (or
    start after) some filter span."""
    eng = _mini_corpus_index(tmp_path_factory, [
        "alpha omega",        # 0: alpha BEFORE omega
        "omega alpha",        # 1: alpha AFTER omega
        "alpha beta",         # 2: no omega at all
    ], "ivbeforeafter")

    def f(kind):
        return intervals_docs(eng, {"match": {
            "query": "alpha",
            "filter": {kind: {"match": {"query": "omega"}}}}})

    assert sorted(f("before").tolist()) == [0]
    assert sorted(f("after").tolist()) == [1]


def test_case_insensitive_query_options(tmp_path_factory):
    """case_insensitive on term/prefix/wildcard/regexp
    (TermQueryBuilder CASE_INSENSITIVE_FIELD): a whitespace-analyzed
    (case-preserving) index matches across case only when the option
    is on."""
    from opensearch_ray.index.build import build_index
    from opensearch_ray.search import dsl
    corpus = tmp_path_factory.mktemp("ci") / "corpus"
    corpus.mkdir(parents=True)
    texts = ["Apple Banana", "APPLE cherry", "apple Date", "Banana egg"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, str(corpus / "part-0.parquet"))
    s = Searcher(build_index(str(corpus), str(corpus.parent / "idx"),
                             analyzer="whitespace", num_buckets=2,
                             hot_df_threshold=100).index_dir)
    def ids(q):
        return dsl.query_docs(s, q).tolist()
    # sensitive: exact-case only
    assert ids({"term": {"text": {"value": "apple"}}}) == [2]
    # insensitive: all three case variants
    assert ids({"term": {"text": {"value": "apple",
                                  "case_insensitive": True}}}) == [0, 1, 2]
    assert ids({"prefix": {"text": {"value": "app",
                                    "case_insensitive": True}}}) == [0, 1, 2]
    assert ids({"prefix": {"text": {"value": "APP"}}}) == [1]
    assert ids({"wildcard": {"text": {"value": "a*e",
                                      "case_insensitive": True}}}) == [0, 1, 2]
    assert ids({"wildcard": {"text": {"value": "a*e"}}}) == [2]
    assert ids({"regexp": {"text": {"value": "ba.*",
                                    "case_insensitive": True}}}) == [0, 3]
    assert ids({"regexp": {"text": {"value": "ba.*"}}}) == []


def test_fuzzy_transpositions_osa():
    """transpositions=True = OSA distance (FuzzyQuery default): adjacent
    swap costs 1; plain Levenshtein prices the same pair at 2."""
    from opensearch_ray.search.features import _levenshtein
    assert _levenshtein("ab", "ba", 2) == 2
    assert _levenshtein("ab", "ba", 2, transpositions=True) == 1
    assert _levenshtein("hash", "hsah", 2, transpositions=True) == 1
    assert _levenshtein("hash", "hsah", 2) == 2
    # OSA never edits a substring twice: "ca" -> "abc" stays 3
    assert _levenshtein("ca", "abc", 3, transpositions=True) == 3
    # identical strings unaffected
    assert _levenshtein("same", "same", 2, transpositions=True) == 0
