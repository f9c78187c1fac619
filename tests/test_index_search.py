"""End-to-end: build over the synthetic transcript corpus, verify rank-identity
vs the brute-force oracle, stable-ordering + fetch invariants, and resume."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opensearch_ray.index.build import build_index, load_manifest
from opensearch_ray.search import BruteForceOracle, Searcher
from opensearch_ray.sources import reference_queries, synthesize_transcripts


@pytest.fixture(scope="module")
def oracle(transcript_corpus):
    corpus_dir, files = transcript_corpus
    tables = [pq.read_table(f) for f in sorted(files)]
    full = pa.concat_tables(tables)
    return BruteForceOracle(full, text_col="text", analyzer="transcript"), full


def test_corpus_is_deterministic_and_stably_ordered(transcript_corpus):
    corpus_dir, files = transcript_corpus
    full = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
    again = synthesize_transcripts(2000, seed=42)
    assert full.equals(again)
    keys = list(zip(full.column("conv_id").to_pylist(),
                    full.column("turn_idx").to_pylist()))
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)  # unique (conv_id, turn_idx)


def test_manifest_counts(built_index, oracle):
    o, full = oracle
    assert built_index.total_docs == full.num_rows
    assert built_index.sum_dl == o.sum_dl
    assert len(built_index.segments) == 4
    bases = [s.doc_base for s in built_index.segments]
    assert bases == sorted(bases) and bases[0] == 0


def test_global_term_stats_match_oracle(built_index, oracle):
    o, _ = oracle
    s = Searcher(built_index.index_dir)
    some_terms = list(o.df.keys())[:50] + ["nosuchtermxyz"]
    stats = s.term_stats(some_terms)
    for t in some_terms:
        assert stats[t][0] == o.df.get(t, 0), t


def test_rank_identity_vs_oracle(built_index, oracle):
    """The north-rule gate: exact (docid, float32 score) sequences for the
    whole reference query set, OR and AND."""
    o, _ = oracle
    s = Searcher(built_index.index_dir)
    for q in reference_queries():
        for op in ("or", "and"):
            hits = s.search(q["query_text"], k=q["k"], operator=op)
            want = o.search(q["query_text"], k=q["k"], operator=op)
            got = [(h.docid, h.score) for h in hits]
            assert got == want, (q["query_id"], op, got[:3], want[:3])


def test_pruning_equals_exhaustive_large_k(built_index, oracle):
    """k large enough that pruning never engages -> same results as k=10
    prefix (pruning exactness check from the other side)."""
    o, _ = oracle
    s = Searcher(built_index.index_dir)
    for qt in ["bace cedi difo", "haki kilo lomu neba"]:
        big = [(h.docid, h.score) for h in s.search(qt, k=500)]
        want = o.search(qt, k=500)
        assert big == want


def test_fetch_text_equality(built_index, oracle):
    """North-rule invariant: per-turn text equality between input and fetch
    output under the stable (conv_id, turn_idx) -> docid mapping."""
    o, full = oracle
    s = Searcher(built_index.index_dir)
    hits = s.search("bace cedi", k=10)
    assert hits
    ids = [h.docid for h in hits]
    fetched = s.fetch(ids)
    by_id = {r["_docid"]: r for r in fetched.to_pylist()}
    for d in ids:
        assert by_id[d]["text"] == full.column("text")[d].as_py()
        assert by_id[d]["conv_id"] == full.column("conv_id")[d].as_py()
        assert by_id[d]["turn_idx"] == full.column("turn_idx")[d].as_py()


def test_bool_docs_algebra(built_index, oracle):
    o, full = oracle
    s = Searcher(built_index.index_dir)
    texts = full.column("text").to_pylist()
    an = s.analyzer

    def docs_with(term):
        return {i for i, t in enumerate(texts) if term in an.tokens(t or "")}

    a, b = "bace", "cedi"
    got_and = set(s.bool_docs(must=[a, b]).tolist())
    assert got_and == (docs_with(a) & docs_with(b))
    got_or = set(s.bool_docs(should=[a, b]).tolist())
    assert got_or == (docs_with(a) | docs_with(b))
    got_not = set(s.bool_docs(must=[a], must_not=[b]).tolist())
    assert got_not == (docs_with(a) - docs_with(b))


def test_unmerged_equals_merged(transcript_corpus, tmp_path, oracle):
    """Segment merge (groupby-term shuffle) must not change any result —
    the associativity property index(A∪B) == merge(index(A), index(B))."""
    o, _ = oracle
    corpus_dir, _ = transcript_corpus
    m = build_index(corpus_dir, str(tmp_path / "idx_unmerged"),
                    analyzer="transcript", merge=False)
    s = Searcher(m.index_dir)
    for q in reference_queries()[:8]:
        got = [(h.docid, h.score) for h in s.search(q["query_text"], k=q["k"])]
        want = o.search(q["query_text"], k=q["k"])
        assert got == want, q["query_id"]


def test_single_file_index_same_scores(transcript_corpus, tmp_path, oracle):
    """Partition-count invariance: 1 segment vs 4 segments -> identical
    (docid, score) lists (global DFS stats make scores partition-invariant)."""
    o, full = oracle
    d = tmp_path / "one"
    d.mkdir()
    pq.write_table(pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(
        os.path.join(transcript_corpus[0], "*.parquet")))]), str(d / "all.parquet"))
    m = build_index(str(d), str(tmp_path / "idx_one"), analyzer="transcript")
    s = Searcher(m.index_dir)
    for q in reference_queries()[:8]:
        got = [(h.docid, h.score) for h in s.search(q["query_text"], k=q["k"])]
        want = o.search(q["query_text"], k=q["k"])
        assert got == want, q["query_id"]


def test_resume_skips_completed_segments(transcript_corpus, tmp_path):
    """Kill-and-rerun: second build reuses finished segments (checkpoint
    manifest semantics) and produces an identical manifest."""
    corpus_dir, _ = transcript_corpus
    idx = str(tmp_path / "idx_resume")
    m1 = build_index(corpus_dir, idx, analyzer="transcript", merge=False)
    # simulate a crashed run: remove manifest + one segment, keep the rest
    os.remove(os.path.join(idx, "manifest.json"))
    import shutil
    shutil.rmtree(os.path.join(idx, "segments", "seg-00002"))
    m2 = build_index(corpus_dir, idx, analyzer="transcript", merge=False)
    assert [vars(s) for s in m1.segments] == [vars(s) for s in m2.segments]
    assert m1.total_docs == m2.total_docs


def test_hot_terms_are_salted(built_index):
    """With the low test threshold some Zipfian-head terms must be hot, and
    their chunks must be spread across >1 bucket file when df allows."""
    assert built_index.hot_terms  # threshold 400 over 2000 docs -> non-empty
    s = Searcher(built_index.index_dir)
    hot = built_index.hot_terms[0]
    post = s.postings([hot])[hot]
    assert post.num_rows >= 1
    # salted lookup still finds every segment's chunk rows
    segs = set(post.column("seg_id").to_pylist())
    assert len(segs) == 4


def test_positions_index_phrase(transcript_corpus, tmp_path, oracle):
    """index_positions=True: pos_enc round-trips and index-native phrase
    results equal the text-verify fallback exactly."""
    from opensearch_ray.index.build import build_index

    corpus_dir, _ = transcript_corpus
    m = build_index(corpus_dir, str(tmp_path / "idx_pos"), analyzer="transcript",
                    index_positions=True, num_buckets=4, hot_df_threshold=400)
    assert m.has_positions
    s_pos = Searcher(m.index_dir)
    o, full = oracle
    texts = full.column("text").to_pylist()
    an = s_pos.analyzer
    for phrase in ["bace cedi", "the bace", "cedi the difo", "nosuch phrase"]:
        got = s_pos.search  # silence lint
        got_docs = s_pos.match_phrase(phrase).tolist()
        # brute-force expectation from analyzed positions
        q_toks, q_pos = an.analyze(phrase)
        want = []
        for i, t in enumerate(texts):
            toks, poss = an.analyze(t or "")
            pos_of = {}
            for tk, p in zip(toks, poss):
                pos_of.setdefault(tk, set()).add(p)
            if not q_toks or any(tk not in pos_of for tk in q_toks):
                continue
            deltas = [p - q_pos[0] for p in q_pos]
            if any(all((s0 + d) in pos_of[tk] for d, tk in zip(deltas, q_toks))
                   for s0 in pos_of[q_toks[0]]):
                want.append(i)
        assert got_docs == want, phrase
    # positions round-trip on one common term
    from opensearch_ray.search.searcher import Searcher as S
    post = s_pos.postings(["bace"])["bace"]
    row = post.to_pylist()[0]
    assert len(row["pos_enc"]) > 0
    maps = S._decode_positions(row)
    some_local, some_pos = next(iter(maps.items()))
    assert (np.diff(some_pos) > 0).all() if len(some_pos) > 1 else True


def test_count_and_explain(built_index, oracle):
    o, full = oracle
    s = Searcher(built_index.index_dir)
    texts = full.column("text").to_pylist()
    an = s.analyzer
    with_bace = sum(1 for t in texts if "bace" in an.tokens(t or ""))
    assert s.count("bace") == with_bace
    both = sum(1 for t in texts
               if {"bace", "cedi"} <= set(an.tokens(t or "")))
    assert s.count("bace cedi", operator="and") == both
    # explain reproduces the search score exactly
    hits = s.search("bace cedi", k=3)
    for h in hits:
        ex = s.explain("bace cedi", h.docid)
        assert ex["matched"]
        assert ex["score"] == pytest.approx(h.score, rel=1e-6)
        assert {d["term"] for d in ex["terms"]} <= {"bace", "cedi"}
        for d in ex["terms"]:
            assert d["tf"] >= 1 and d["df"] > 0 and d["contribution"] > 0
    assert s.explain("nosuchterm", 0)["matched"] is False


def test_multiterm_queries(built_index, oracle):
    o, full = oracle
    s = Searcher(built_index.index_dir)
    texts = full.column("text").to_pylist()
    an = s.analyzer

    def docs_matching(pred):
        return {i for i, t in enumerate(texts)
                if any(pred(tok) for tok in an.tokens(t or ""))}

    got = set(s.prefix_docs("bace").tolist())
    assert got == docs_matching(lambda t: t.startswith("bace"))
    got_w = set(s.wildcard_docs("ba?e").tolist())
    assert got_w == docs_matching(lambda t: len(t) == 4 and t[0:2] == "ba" and t[3] == "e")
    from opensearch_ray.search.features import _levenshtein
    got_f = set(s.fuzzy_docs("bace", max_edits=1).tolist())
    assert got_f == docs_matching(lambda t: _levenshtein("bace", t, 1) <= 1)
    assert s.prefix_docs("zzzzzz").size == 0


def test_force_merge_preserves_results(transcript_corpus, tmp_path, oracle):
    """force_merge (TieredMergePolicy/_forcemerge analogue) must not change
    any (docid, score): global ids are preserved by construction."""
    from opensearch_ray.index.build import build_index
    from opensearch_ray.index.merge_policy import force_merge

    o, _ = oracle
    corpus_dir, _ = transcript_corpus
    idx = str(tmp_path / "idx_fm")
    m = build_index(corpus_dir, idx, analyzer="transcript", num_buckets=4,
                    hot_df_threshold=400)
    assert len(m.segments) == 4
    before = {}
    s0 = Searcher(idx)
    for q in reference_queries()[:6]:
        before[q["query_id"]] = [(h.docid, h.score)
                                 for h in s0.search(q["query_text"], k=q["k"])]
    m2 = force_merge(m, max_segments=2, hot_df_threshold=400)
    assert len(m2.segments) == 2
    assert m2.total_docs == m.total_docs
    s1 = Searcher(idx)
    for q in reference_queries()[:6]:
        got = [(h.docid, h.score) for h in s1.search(q["query_text"], k=q["k"])]
        assert got == before[q["query_id"]], q["query_id"]
        want = o.search(q["query_text"], k=q["k"])
        assert got == want, q["query_id"]
    # down to a single segment
    m3 = force_merge(m2, max_segments=1, hot_df_threshold=400)
    assert len(m3.segments) == 1
    s2 = Searcher(idx)
    for q in reference_queries()[:6]:
        got = [(h.docid, h.score) for h in s2.search(q["query_text"], k=q["k"])]
        assert got == before[q["query_id"]], q["query_id"]


def test_terms_agg_on_hits(built_index, oracle):
    o, full = oracle
    s = Searcher(built_index.index_dir)
    out = s.terms_agg_on_hits("bace cedi", "role", size=10)
    texts = full.column("text").to_pylist()
    roles = full.column("role").to_pylist()
    an = s.analyzer
    import collections
    want = collections.Counter(
        roles[i] for i, t in enumerate(texts)
        if {"bace", "cedi"} & set(an.tokens(t or "")))
    got = dict(zip(out["role"], out["doc_count"]))
    assert got == dict(want)


def test_search_pipeline_and_registry(built_index):
    from opensearch_ray.search.pipeline import (
        SearchPipeline, filter_query, oversample, truncate_hits, min_score)
    from opensearch_ray import registry

    s = Searcher(built_index.index_dir)
    pipe = SearchPipeline(
        request_processors=[filter_query({"role": "user"}), oversample(3.0)],
        response_processors=[min_score(0.0), truncate_hits(5)],
    )
    hits = pipe.search(s, "bace cedi", k=5)
    want = s.search("bace cedi", k=15, filters={"role": "user"})[:5]
    assert [(h.docid, h.score) for h in hits] == [(h.docid, h.score) for h in want]
    # registry round trips
    assert "match" in registry.QUERY_TYPES and "terms" in registry.AGGREGATIONS
    registry.register_query_type("noop", lambda s, **kw: [])
    assert registry.QUERY_TYPES["noop"](s) == []
    docs = registry.QUERY_TYPES["prefix"](s, prefix="bace")
    assert docs.size > 0


def test_completion_suggester(built_index):
    s = Searcher(built_index.index_dir)
    out = s.complete("ba", size=5)
    assert len(out) == 5
    assert all(t.startswith("ba") for t in out["term"])
    assert (out["df"].values[:-1] >= out["df"].values[1:]).all()
    assert s.complete("zzzzq").empty


def test_single_pass_equals_three_phase(transcript_corpus, tmp_path, oracle):
    """The fused single-pass build must produce results identical to the
    explicit three-phase build (and to the oracle)."""
    o, _ = oracle
    corpus_dir, _ = transcript_corpus
    m1 = build_index(corpus_dir, str(tmp_path / "sp"), analyzer="transcript",
                     num_buckets=4, hot_df_threshold=400, single_pass=True)
    m3 = build_index(corpus_dir, str(tmp_path / "tp"), analyzer="transcript",
                     num_buckets=4, hot_df_threshold=400, single_pass=False)
    s1, s3 = Searcher(m1.index_dir), Searcher(m3.index_dir)
    assert m1.total_docs == m3.total_docs
    for q in reference_queries():
        a = [(h.docid, h.score) for h in s1.search(q["query_text"], k=q["k"])]
        b = [(h.docid, h.score) for h in s3.search(q["query_text"], k=q["k"])]
        w = o.search(q["query_text"], k=q["k"])
        assert a == w and b == w, q["query_id"]
    # salted-term stats must aggregate to the same global df in both layouts
    hot = m1.hot_terms[0] if m1.hot_terms else "bace"
    assert s1.term_stats([hot])[hot] == s3.term_stats([hot])[hot]


def test_force_merge_preserves_positions(transcript_corpus, tmp_path, oracle):
    """Positions survive force_merge: index-native phrase results unchanged."""
    from opensearch_ray.index.build import build_index
    from opensearch_ray.index.merge_policy import force_merge

    corpus_dir, _ = transcript_corpus
    idx = str(tmp_path / "idx_fm_pos")
    m = build_index(corpus_dir, idx, analyzer="transcript",
                    index_positions=True, num_buckets=4, hot_df_threshold=400)
    s0 = Searcher(idx)
    phrases = ["bace cedi", "the bace", "cedi the difo"]
    before = {p: s0.match_phrase(p).tolist() for p in phrases}
    m2 = force_merge(m, max_segments=2, hot_df_threshold=400)
    assert m2.has_positions
    s1 = Searcher(idx)
    for p in phrases:
        assert s1.match_phrase(p).tolist() == before[p], p


def test_match_phrase_prefix_and_msm(built_index, oracle):
    o, full = oracle
    s = Searcher(built_index.index_dir)
    texts = full.column("text").to_pylist()
    an = s.analyzer
    got = set(s.match_phrase_prefix("bace ce").tolist())
    # brute force: completions of 'ce*' in TERM-DICT order capped at
    # max_expansions (reference MultiPhrasePrefix rewrite), adjacent after
    # 'bace'
    vocab = set()
    analyzed = []
    for t in texts:
        toks, poss = an.analyze(t or "")
        analyzed.append((toks, poss))
        vocab.update(toks)
    allowed = set(sorted(tk for tk in vocab if tk.startswith("ce"))[:50])
    want = set()
    for i, (toks, poss) in enumerate(analyzed):
        pos_of = {}
        for tk, p in zip(toks, poss):
            pos_of.setdefault(tk, set()).add(p)
        for tk, ps in pos_of.items():
            if tk in allowed and any((p - 1) in pos_of.get("bace", ())
                                     for p in ps):
                want.add(i)
                break
    assert got == want
    # minimum_should_match percentage
    terms = ["bace", "cedi", "difo", "fogu"]
    d_pct = set(s.bool_docs(should=terms, minimum_should_match="50%").tolist())
    d_int = set(s.bool_docs(should=terms, minimum_should_match=2).tolist())
    assert d_pct == d_int


def test_search_sorted(built_index, oracle):
    o, full = oracle
    s = Searcher(built_index.index_dir)
    out = s.search_sorted("bace", "turn_idx", k=10, ascending=False)
    texts = full.column("text").to_pylist()
    turns = full.column("turn_idx").to_pylist()
    an = s.analyzer
    match = [i for i, t in enumerate(texts) if "bace" in an.tokens(t or "")]
    want = sorted(match, key=lambda i: (-turns[i], i))[:10]
    assert out["_docid"].tolist() == want
    # with filter
    roles = full.column("role").to_pylist()
    out2 = s.search_sorted("bace", "turn_idx", k=5, ascending=True,
                           filters={"role": "user"})
    want2 = sorted([i for i in match if roles[i] == "user"],
                   key=lambda i: (turns[i], i))[:5]
    assert out2["_docid"].tolist() == want2


def _brute_sloppy(an, texts, phrase, slop):
    """Min adjusted-offset span over all distinct-position selections."""
    import itertools
    q_toks, q_pos = an.analyze(phrase)
    want = []
    for i, t in enumerate(texts):
        toks, poss = an.analyze(t or "")
        pos_of = {}
        for tk, p in zip(toks, poss):
            pos_of.setdefault(tk, []).append(p)
        lists = [pos_of.get(tk, []) for tk in q_toks]
        if any(not l for l in lists):
            continue
        hit = False
        for sel in itertools.product(*lists):
            # repeated terms must take distinct doc positions
            if len({(tk, p) for tk, p in zip(q_toks, sel)}) < len(q_toks):
                continue
            adj = [p - q for p, q in zip(sel, q_pos)]
            if max(adj) - min(adj) <= slop:
                hit = True
                break
        if hit:
            want.append(i)
    return want


def test_match_phrase_slop(built_index, oracle):
    """Sloppy phrase (both verify paths) vs brute-force min-span oracle."""
    o, full = oracle
    s = Searcher(built_index.index_dir)  # no positions -> text verify
    texts = full.column("text").to_pylist()
    an = s.analyzer
    for phrase, slop in [("bace cedi", 1), ("bace cedi", 2),
                         ("cedi bace", 2), ("bace bace", 3),
                         ("bace cedi difo", 2)]:
        got = s.match_phrase(phrase, slop=slop).tolist()
        want = _brute_sloppy(an, texts, phrase, slop)
        assert got == want, (phrase, slop)


def test_match_phrase_slop_indexed(transcript_corpus, tmp_path, oracle):
    """Same sloppy semantics from STORED positions."""
    corpus_dir, _ = transcript_corpus
    m = build_index(corpus_dir, str(tmp_path / "idx_slop"),
                    analyzer="transcript", index_positions=True,
                    num_buckets=4, hot_df_threshold=400)
    s = Searcher(m.index_dir)
    o, full = oracle
    texts = full.column("text").to_pylist()
    an = s.analyzer
    for phrase, slop in [("bace cedi", 2), ("cedi bace", 2), ("bace bace", 3)]:
        got = s.match_phrase(phrase, slop=slop).tolist()
        want = _brute_sloppy(an, texts, phrase, slop)
        assert got == want, (phrase, slop)


def test_range_filters(built_index, oracle):
    """range query + range filter context (RangeQueryBuilder [gte,lt) etc.)."""
    o, full = oracle
    s = Searcher(built_index.index_dir)
    turns = full.column("turn_idx").to_pylist()
    # standalone range query over int doc values
    got = sorted(s.range_docs("turn_idx", {"gte": 3, "lt": 7}).tolist())
    want = [i for i, t in enumerate(turns) if 3 <= t < 7]
    assert got == want
    # gt/lte variant
    got2 = sorted(s.range_docs("turn_idx", {"gt": 3, "lte": 7}).tolist())
    assert got2 == [i for i, t in enumerate(turns) if 3 < t <= 7]
    # timestamp range with ISO-string bounds
    ts = full.column("ts").to_pylist()
    lo = sorted(ts)[len(ts) // 2]
    got3 = set(s.range_docs("ts", {"gte": lo.isoformat()}).tolist())
    assert got3 == {i for i, v in enumerate(ts) if v >= lo}
    # range filter composes with BM25 search without changing scores
    unfiltered = s.search("bace", k=10**6)
    flt = {"turn_idx": {"gte": 3, "lt": 7}}
    hits = s.search("bace", k=10**6, filters=flt)
    keep = {i for i, t in enumerate(turns) if 3 <= t < 7}
    want_hits = [(h.docid, h.score) for h in unfiltered if h.docid in keep]
    assert [(h.docid, h.score) for h in hits] == want_hits


def test_multi_match(transcript_corpus, tmp_path, oracle):
    """best_fields == dis_max(max + tb*rest) and most_fields == sum, combined
    from independent per-field brute-force scores."""
    import pyarrow.compute as pc
    from opensearch_ray.search import (BruteForceOracle, MultiFieldSearcher,
                                       build_multi_field_index)

    corpus_dir, files = transcript_corpus
    full = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
    toks = pc.split_pattern(full.column("text"), " ")
    title = pc.binary_join(pc.list_slice(toks, 0, 3), " ")
    derived = pa.table({"conv_id": full.column("conv_id"),
                        "turn_idx": full.column("turn_idx"),
                        "title": title, "body": full.column("text")})
    src = tmp_path / "mf_src"
    src.mkdir()
    pq.write_table(derived, str(src / "part-0.parquet"))
    idx = str(tmp_path / "mf_idx")
    build_multi_field_index(str(src), idx, fields=["title", "body"],
                            analyzer="transcript", num_buckets=4)
    s = MultiFieldSearcher(idx)
    o_t = BruteForceOracle(derived, text_col="title", analyzer="transcript")
    o_b = BruteForceOracle(derived, text_col="body", analyzer="transcript")
    q = "bace cedi"
    big = 10**9
    st = dict((d, sc) for d, sc in o_t.search(q, k=big))
    sb = dict((d, sc) for d, sc in o_b.search(q, k=big))
    ids = sorted(set(st) | set(sb))

    def combine(tb):
        rows = []
        for d in ids:
            a, b = 2.0 * st.get(d, 0.0), sb.get(d, 0.0)
            mx, mn = max(a, b), min(a, b)
            rows.append((d, mx + tb * mn))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:10]

    # best_fields (dis_max, tie_breaker=0): docids and scores
    got = s.multi_match(q, {"title": 2.0, "body": 1.0}, k=10)
    want = combine(0.0)
    assert [h.docid for h in got] == [d for d, _ in want]
    for (d, wsc), h in zip(want, got):
        assert h.score == pytest.approx(wsc, rel=1e-6)
    # tie_breaker path
    got_tb = s.multi_match(q, {"title": 2.0, "body": 1.0}, k=10,
                           tie_breaker=0.5)
    assert [h.docid for h in got_tb] == [d for d, _ in combine(0.5)]
    # most_fields = sum of per-field scores
    got_mf = s.multi_match(q, {"title": 2.0, "body": 1.0}, k=10,
                           match_type="most_fields")
    want_mf = sorted(((d, 2.0 * st.get(d, 0.0) + sb.get(d, 0.0)) for d in ids),
                     key=lambda r: (-r[1], r[0]))[:10]
    assert [h.docid for h in got_mf] == [d for d, _ in want_mf]


def test_query_string_and_compounds(built_index, oracle):
    """query_string boolean algebra, dis_max, boosting vs brute-force sets."""
    from opensearch_ray.search.features import (boosting_query, dis_max,
                                                query_string)
    o, full = oracle
    s = Searcher(built_index.index_dir)
    texts = full.column("text").to_pylist()
    an = s.analyzer
    has = lambda i, t: t in an.tokens(texts[i] or "")
    N = len(texts)
    want = {i for i in range(N)
            if ((has(i, "bace") and has(i, "cedi")) or has(i, "difo"))
            and not has(i, "fogu")}
    out = query_string(s, '(bace AND cedi) OR difo NOT fogu')
    assert set(out["doc_id"].tolist()) == want
    # scores: BM25 sum over positive terms matched
    sc = {h.docid: h.score for h in s.search("bace cedi difo", k=10**9)}
    for d, v in zip(out["doc_id"], out["score"]):
        assert v == pytest.approx(sc[d], rel=1e-6)
    # phrase + prefix atoms
    out2 = query_string(s, '"bace cedi" OR fo*')
    want2 = set(s.match_phrase("bace cedi").tolist()) | set(
        s.prefix_docs("fo").tolist())
    assert set(out2["doc_id"].tolist()) == want2
    # dis_max == max + tb*rest of subquery scores
    s1 = {h.docid: h.score for h in s.search("bace cedi", k=10**9)}
    s2 = {h.docid: h.score for h in s.search("difo", k=10**9)}
    got = dis_max(s, [("bace cedi", "or"), ("difo", "or")],
                  tie_breaker=0.4, k=10)
    comb = sorted(
        ((d, max(s1.get(d, 0), s2.get(d, 0))
          + 0.4 * min(s1.get(d, 0), s2.get(d, 0)))
         for d in set(s1) | set(s2)), key=lambda r: (-r[1], r[0]))[:10]
    assert [(h.docid,) for h in got] == [(d,) for d, _ in comb]
    for h, (d, v) in zip(got, comb):
        assert h.score == pytest.approx(v, rel=1e-6)
    # boosting demotes but keeps
    hits = boosting_query(s, "bace cedi", "difo", negative_boost=0.1, k=10**9)
    neg = set(s.term_docs("difo").tolist())
    base = {h.docid: h.score for h in s.search("bace cedi", k=10**9)}
    assert {h.docid for h in hits} == set(base)
    for h in hits:
        factor = 0.1 if h.docid in neg else 1.0
        assert h.score == pytest.approx(base[h.docid] * factor, rel=1e-6)


def test_collection_controls(built_index, oracle):
    """terminate_after + track_total_hits (QueryPhase collection controls)."""
    o, full = oracle
    s = Searcher(built_index.index_dir)
    exact = s.count("bace")
    r = s.search_with_totals("bace", k=5, track_total_hits=True)
    assert r["total"] == exact and r["total_relation"] == "eq"
    assert not r["terminated_early"]
    r2 = s.search_with_totals("bace", k=5, track_total_hits=10)
    assert r2["total"] == 10 and r2["total_relation"] == "gte"
    r3 = s.search_with_totals("bace", k=5, track_total_hits=False)
    assert r3["total"] is None
    # terminate_after: early termination flagged, hits ONLY from the
    # collected segment prefix (the cumulative-count cutoff)
    r4 = s.search_with_totals("bace", k=5, terminate_after=5)
    assert r4["terminated_early"]
    seen, prefix_hi = 0, built_index.total_docs
    for seg in sorted(built_index.segments, key=lambda x: x.seg_id):
        seen += s._segment_match_count("bace", seg.seg_id, "or")
        if seen >= 5:
            prefix_hi = seg.doc_base + seg.doc_count
            break
    assert prefix_hi < built_index.total_docs  # budget terminates mid-index
    assert all(h.docid < prefix_hi for h in r4["hits"])
    # restricted-prefix hits must equal a search over just those segments
    # even when the postings cache was pre-warmed with full-index rows
    full_hits = [(h.docid, h.score) for h in s.search("bace", k=5)]
    assert [(h.docid, h.score) for h in r4["hits"]] != full_hits or \
        all(d < prefix_hi for d, _ in full_hits)
    r5 = s.search_with_totals("bace", k=5, terminate_after=10**9)
    assert not r5["terminated_early"]
    assert [(h.docid, h.score) for h in r5["hits"]] == [
        (h.docid, h.score) for h in s.search("bace", k=5)]


def test_point_reads(built_index, oracle):
    """get / mget / get_by — the single-doc read APIs."""
    o, full = oracle
    s = Searcher(built_index.index_dir)
    r = s.get(5)
    assert r["_docid"] == 5 and r["text"] == full.column("text")[5].as_py()
    assert s.get(-1) is None and s.get(10**9) is None
    t = s.mget([3, 7, 10**9])
    assert t.column("_docid").to_pylist() == [3, 7]
    conv = full.column("conv_id")[4].as_py()
    got = s.get_by("conv_id", conv)
    want = [i for i, c in enumerate(full.column("conv_id").to_pylist())
            if c == conv]
    assert sorted(got.column("_docid").to_pylist()) == want


def test_span_near(built_index, transcript_corpus, tmp_path, oracle):
    """span_near ordered/unordered vs brute force, text-verify AND stored
    positions paths."""
    import itertools
    o, full = oracle
    texts = full.column("text").to_pylist()

    def brute(an, t1, t2, slop, in_order):
        want = []
        for i, t in enumerate(texts):
            toks, poss = an.analyze(t or "")
            p1 = [p for tk, p in zip(toks, poss) if tk == t1]
            p2 = [p for tk, p in zip(toks, poss) if tk == t2]
            hit = False
            for a, b in itertools.product(p1, p2):
                if a == b:
                    continue
                if in_order and not (a < b):
                    continue
                if (max(a, b) - min(a, b) + 1) - 2 <= slop:
                    hit = True
                    break
            if hit:
                want.append(i)
        return want

    s = Searcher(built_index.index_dir)  # text-verify path
    corpus_dir, _ = transcript_corpus
    m = build_index(corpus_dir, str(tmp_path / "idx_span"),
                    analyzer="transcript", index_positions=True,
                    num_buckets=4, hot_df_threshold=400)
    s_pos = Searcher(m.index_dir)  # stored-positions path
    for t1, t2, slop, in_order in [("bace", "cedi", 2, True),
                                   ("bace", "cedi", 2, False),
                                   ("cedi", "bace", 0, True),
                                   ("bace", "difo", 5, False)]:
        want = brute(s.analyzer, t1, t2, slop, in_order)
        got = s.span_near([t1, t2], slop=slop, in_order=in_order).tolist()
        got_pos = s_pos.span_near([t1, t2], slop=slop,
                                  in_order=in_order).tolist()
        assert got == want, (t1, t2, slop, in_order, "textverify")
        assert got_pos == want, (t1, t2, slop, in_order, "indexed")


def test_similarity_modules_vs_brute_force(built_index, oracle):
    """boolean / lm_dirichlet / lm_jelinek_mercer / dfi top-k vs an
    independent dict-based rescoring of the whole corpus."""
    import math

    from opensearch_ray.search.similarity import similarity_search

    o, _ = oracle
    s = Searcher(built_index.index_dir)
    ttf = {}
    for tfs in o.doc_tfs:
        for t, c in tfs.items():
            ttf[t] = ttf.get(t, 0) + c
    tot = o.sum_dl

    def brute(terms, sim):
        scores = {}
        for t in terms:
            p = (ttf.get(t, 0) + 1.0) / (tot + 1.0)
            for i, tfs in enumerate(o.doc_tfs):
                tf = tfs.get(t, 0)
                if not tf:
                    continue
                dl = float(o.dl_q[i])
                if sim == "boolean":
                    c = 1.0
                elif sim == "lm_dirichlet":
                    c = max(0.0, math.log(1 + tf / (2000.0 * p))
                            + math.log(2000.0 / (dl + 2000.0)))
                elif sim == "lm_jelinek_mercer":
                    c = max(0.0, math.log(1 + (0.9 * tf / dl) / (0.1 * p)))
                else:  # dfi standardized
                    exp = (ttf[t] + 1.0) * dl / (tot + 1.0)
                    c = (math.log2((tf - exp) / math.sqrt(exp) + 1.0)
                         if tf > exp else 0.0)
                scores[i] = scores.get(i, 0.0) + c
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    for sim in ("boolean", "lm_dirichlet", "lm_jelinek_mercer", "dfi"):
        got = [(h.docid, h.score) for h in
               similarity_search(s, "bace cedi difo", k=10, similarity=sim)]
        want = brute(s.analyzer.tokens("bace cedi difo"), sim)
        assert [g[0] for g in got] == [w[0] for w in want], sim
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-12, (sim, g, w)


def test_search_docs_allowlist_parity(built_index, oracle):
    """The ``docs=`` sorted-allowlist gate on Searcher.search must agree
    with the DSL's query_docs + score_docs composition: same docids, same
    float32 scores, same (score desc, docid asc) order (the filter-context
    gate semantics — BoolQueryBuilder filter clause)."""
    from opensearch_ray.search import dsl

    o, _ = oracle
    s = Searcher(built_index.index_dir)
    for q in reference_queries()[:6]:
        match = dsl.query_docs(s, {"match": {"text": q}})
        if match.size == 0:
            continue
        # allowlist = every other matching doc plus some non-matching ids
        allow = np.unique(np.concatenate(
            [match[::2], np.arange(0, s.N, 7, dtype=np.int64)]))
        hits = s.search(q, k=15, docs=allow)
        # reference composition: intersect, score, sort, head
        cand = np.intersect1d(match, allow, assume_unique=True)
        sc = s.score_docs(cand, s.analyzer.tokens(q)).astype(np.float32)
        order = np.lexsort((cand, -sc.astype(np.float64)))
        want = [(int(cand[i]), float(sc[i])) for i in order[:15]]
        got = [(h.docid, h.score) for h in hits]
        assert got == want, q
        # empty allowlist -> no hits
        assert s.search(q, k=5, docs=np.empty(0, np.int64)) == []


def test_copy_to_combined_field(transcript_corpus, tmp_path):
    """copy_to (FieldMapper.CopyTo): the target field's postings union the
    source fields' tokens per doc; a term present only in `role` matches on
    `combined`, and phrase fetch-verify re-joins the sources."""
    from opensearch_ray.search import MultiFieldSearcher, build_multi_field_index

    corpus_dir, files = transcript_corpus
    idx = str(tmp_path / "ct_idx")
    build_multi_field_index(corpus_dir, idx, fields=["text"],
                            analyzer="transcript", num_buckets=4,
                            copy_to={"combined": ["role", "text"]})
    s = MultiFieldSearcher(idx)
    full = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
    roles = set(full.column("role").to_pylist())
    role = sorted(roles)[0]
    n_role = sum(1 for r in full.column("role").to_pylist() if r == role)
    # role tokens never occur in text for this synthetic corpus: the
    # combined-field term hit count equals the role row count, while the
    # text-only field finds nothing
    got = s.searchers["combined"].term_docs(role)
    assert len(got) == n_role
    assert len(s.searchers["text"].term_docs(role)) == 0
    # combined dl = role tokens + text tokens -> combined avgdl > text avgdl
    man_c = s.searchers["combined"].manifest
    man_t = s.searchers["text"].manifest
    assert man_c.total_docs == man_t.total_docs
    # phrase across the copy_to target uses the joined stored sources
    hits = s.searchers["combined"].search(f"{role}", k=5)
    assert hits and all(h.score > 0 for h in hits)


def test_multivalued_text_position_increment_gap(tmp_path):
    """list<string> text field (TextFieldMapper position_increment_gap=100,
    DocumentParser multi-value indexing): phrases never match across
    values; term/BM25 stats aggregate per doc; index-native positions and
    fetch-verify re-analysis agree."""
    import shutil
    from opensearch_ray.index.build import build_index
    from opensearch_ray.search import Searcher

    t = pa.table({
        "conv_id": ["c0", "c0", "c1"], "turn_idx": [0, 1, 0],
        "text": [["alpha beta", "gamma delta"],
                 ["alpha beta gamma"],
                 ["solo value here"]]})
    src = tmp_path / "mv_corpus"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    results = {}
    for positions in (True, False):
        idx = str(tmp_path / f"mv_idx_{positions}")
        build_index(str(src), idx, num_buckets=2,
                    index_positions=positions)
        s = Searcher(idx)
        # beta|gamma are adjacent only inside doc1's single value; in doc0
        # they straddle the value boundary (gap=100 keeps them apart)
        assert s.match_phrase("beta gamma").tolist() == [1]
        assert s.match_phrase("alpha beta").tolist() == [0, 1]
        assert s.term_docs("gamma").tolist() == [0, 1]
        results[positions] = [(h.docid, h.score) for h in
                              s.search("alpha", k=5)]
        # dl counts real tokens over ALL values (4+3+3), gaps are virtual
        assert s.fetch([0]).num_rows == 1
    assert results[True] == results[False]


def test_multi_match_cross_fields(transcript_corpus, tmp_path):
    """cross_fields: operator=and matches docs whose query terms are split
    ACROSS fields (the type's reason to exist), which best_fields' per-field
    AND cannot; scores blend df to the max across the group."""
    from opensearch_ray.search import (MultiFieldSearcher,
                                       build_multi_field_index)
    t = pa.table({
        "conv_id": ["c"] * 4, "turn_idx": [0, 1, 2, 3],
        "first": ["ada", "grace", "alan", "ada"],
        "last": ["lovelace", "hopper", "turing", "hopper"]})
    src = tmp_path / "cf_src"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    idx = str(tmp_path / "cf_idx")
    build_multi_field_index(str(src), idx, fields=["first", "last"],
                            analyzer="whitespace", num_buckets=2)
    s = MultiFieldSearcher(idx, dtype=np.float64)
    cross = s.multi_match("ada hopper", match_type="cross_fields",
                          operator="and", k=10)
    # only doc 3 has ada (first) AND hopper (last) — across two fields
    assert [h.docid for h in cross] == [3]
    # best_fields per-field AND finds nothing: no single field has both
    best = s.multi_match("ada hopper", match_type="best_fields",
                         operator="and", k=10)
    assert best == []
    # operator=or: every doc containing either term, ranked
    either = s.multi_match("ada hopper", match_type="cross_fields", k=10)
    assert {h.docid for h in either} == {0, 1, 3}


def test_multi_match_phrase_and_bool_prefix_types(transcript_corpus,
                                                  tmp_path):
    """Type.PHRASE: intact phrase in SOME field; Type.BOOL_PREFIX: last
    term is a prefix. Completes the 6-type MultiMatchQueryBuilder table."""
    from opensearch_ray.search import (MultiFieldSearcher,
                                       build_multi_field_index)
    t = pa.table({
        "conv_id": ["c"] * 3, "turn_idx": [0, 1, 2],
        "a": ["red green blue", "green red", "yellow"],
        "b": ["nothing here", "red green again", "red gre"]})
    src = tmp_path / "mmp_src"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    idx = str(tmp_path / "mmp_idx")
    build_multi_field_index(str(src), idx, fields=["a", "b"],
                            analyzer="whitespace", num_buckets=2)
    s = MultiFieldSearcher(idx, dtype=np.float64)
    ph = s.multi_match("red green", match_type="phrase", k=10)
    assert {h.docid for h in ph} == {0, 1}  # doc1 via field b
    bp = s.multi_match("red gre", match_type="bool_prefix", k=10)
    # 'red' term + 'gre' prefix (green/gre): docs 0,1 (field a) and 1,2 (b)
    assert {h.docid for h in bp} == {0, 1, 2}
