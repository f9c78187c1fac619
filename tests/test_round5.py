"""Round-5 additions: scripted similarity, _mtermvectors, rank_features,
murmur3 field, auto_date_histogram ladder — behavior goldens."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from opensearch_ray.search import Searcher


@pytest.fixture(scope="module")
def s(built_index):
    return Searcher(built_index.index_dir)


def test_scripted_similarity_matches_formula(s, built_index):
    """`scripted` similarity: user callable gets (tf, dl, df, n_docs,
    total_tokens, boost) and its output drives the ranking exactly."""
    from opensearch_ray.index.norms import NORM_LENGTH_TABLE
    from opensearch_ray.search.similarity import similarity_search

    def script(tf, dl, df, n_docs, boost, **_):
        return (boost * np.sqrt(tf)
                * (np.log((n_docs + 1.0) / (df + 1.0)) + 1.0)
                / np.sqrt(dl))

    q = "bace cedi"
    hits = similarity_search(s, q, k=10, similarity="scripted",
                             script=script)
    assert hits and all(hits[i].score >= hits[i + 1].score
                        for i in range(len(hits) - 1))
    # brute-force the same formula for the top hit
    toks = s.analyzer.tokens(q)
    stats = s.term_stats(toks)
    top = hits[0]
    txt = s.fetch([top.docid]).to_pylist()[0][s.manifest.text_col]
    dtoks = s.analyzer.tokens(txt or "")
    dl_raw = len(dtoks)
    dl_q = float(NORM_LENGTH_TABLE[
        np.searchsorted(NORM_LENGTH_TABLE, dl_raw, side="right") - 1])
    want = sum(
        np.sqrt(dtoks.count(t))
        * (np.log((s.N + 1.0) / (stats[t][0] + 1.0)) + 1.0) / np.sqrt(dl_q)
        for t in set(toks) if dtoks.count(t))
    assert abs(top.score - want) < 1e-9


def test_mtermvectors_matches_single(s):
    """_mtermvectors == per-doc termvectors, docid-major, shared df."""
    from opensearch_ray.search.features import mtermvectors, termvectors
    ids = [0, 5, 9]
    batched = mtermvectors(s, ids, term_statistics=True)
    for d in ids:
        one = termvectors(s, d, term_statistics=True)
        got = batched[batched.docid == d].drop(columns=["docid"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, one.astype({"doc_freq": got["doc_freq"].dtype}))


def test_murmur3_published_vectors():
    """MurmurHash3 x64_128 — the public reference test vectors."""
    from opensearch_ray.search.features import murmur3_x64_128
    assert murmur3_x64_128(b"") == (0, 0)
    assert murmur3_x64_128(b"hello") == (0xCBD8A7B341BD9B02,
                                         0x5B1E906A48AE1D19)
    assert murmur3_x64_128(
        b"The quick brown fox jumps over the lazy dog") == (
        0xE34BBC7BBC071B6C, 0x7A433CA9C49A9347)
    # seed changes the hash; >16-byte inputs exercise the block loop
    assert murmur3_x64_128(b"hello", seed=1) != murmur3_x64_128(b"hello")


def test_murmur3_column_injective_on_uniques():
    from opensearch_ray.search.features import murmur3_column
    vals = [f"val-{i % 37}" for i in range(500)]
    ds = rd.from_arrow(pa.table({"id": pa.array(range(500)),
                                 "v": pa.array(vals)}))
    out = murmur3_column(ds, "v").to_pandas()
    assert out.groupby("v")["_murmur3"].nunique().eq(1).all()
    assert out["_murmur3"].nunique() == 37


def test_rank_features_missing_key_no_match():
    """rank_features: docs lacking the queried key never match."""
    from opensearch_ray.search.features import rank_features_topk
    props = ['{"a": 10}', '{"a": 5, "b": 2}', '{"b": 7}', '{}',
             '{"a": 30}']
    ds = rd.from_arrow(pa.table({"id": pa.array(range(5), pa.int64()),
                                 "props": pa.array(props)}))
    out = rank_features_topk(ds, "props", "a", "id", k=10, pivot=10.0)
    assert out["id"].tolist() == [4, 0, 1]  # 30, 10, 5 by saturation
    assert abs(out["score"].iloc[0] - 30.0 / 40.0) < 1e-12
    out_b = rank_features_topk(ds, "props", "b", "id", k=10)
    assert out_b["id"].tolist() == [2, 1]


def test_ingest_arrow_fast_path_parity():
    """When every processor has an Arrow variant, the pipeline runs
    zero-copy on pyarrow batches — same output as the pandas path
    (measured ~2x end-to-end at 1M docs; per-row pandas kept where the
    object->Arrow conversion would cost more than the kernel saves)."""
    from opensearch_ray.ingest.processors import (IngestPipeline,
                                                  make_processor)
    msgs = ["Word1 word2  Word1 x  ", "a b  ", "  Mixed CASE\tz "]
    tbl = pa.table({"id": pa.array(range(3), pa.int64()),
                    "msg": pa.array(msgs)})
    procs = [make_processor("lowercase", field="msg"),
             make_processor("trim", field="msg"),
             make_processor("gsub", field="msg", pattern="word1",
                            replacement="W1"),
             make_processor("split", field="msg", separator=" ",
                            target_field="toks"),
             make_processor("join", field="toks", separator="|",
                            target_field="joined"),
             make_processor("copy", src="id", dst="id2"),
             make_processor("rename", src="id2", dst="id_copy"),
             make_processor("set", field="tag", value="x"),
             make_processor("convert", field="id", type_="string",
                            target_field="id_str")]
    assert all(hasattr(p, "arrow") for p in procs)
    ds = rd.from_arrow(tbl)
    arrow_out = IngestPipeline(procs).apply(ds).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # appending a pandas-only processor forces the pandas path
    pandas_out = IngestPipeline(
        procs + [make_processor("script", fn=lambda df: df)]) \
        .apply(ds).to_pandas().sort_values("id").reset_index(drop=True)
    for c in ("joined", "id_copy", "tag", "id_str"):
        assert arrow_out[c].astype(str).tolist() == \
            pandas_out[c].astype(str).tolist(), c


def test_duplicated_window_stats_semantics():
    """Lee-et-al-style duplicated k-token windows: cross-doc only,
    within-doc repeats count once, short docs contribute nothing."""
    from opensearch_ray.dedup import duplicated_window_stats
    texts = [
        "aa bb cc dd",        # 0: shares window 'aa bb cc' with 1 (k=3)
        "aa bb cc xx",        # 1
        "zz yy ww vv",        # 2: unique windows
        "aa bb",              # 3: too short for k=3
        "qq rr ss qq rr ss",  # 4: internal repeat only -> NOT duplicated
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts)}))
    out = duplicated_window_stats(ds, k=3, analyzer="whitespace") \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_windows"] == 2          # 'aa bb cc', 'bb cc dd'
    assert out.loc[0, "n_dup_windows"] == 1      # 'aa bb cc' also in 1
    assert out.loc[1, "n_dup_windows"] == 1
    assert out.loc[2, "n_dup_windows"] == 0
    assert 3 not in out.index                    # < k tokens: no windows
    # doc 4: 4 windows, distinct = {'qq rr ss','rr ss qq','ss qq rr'}
    # 'qq rr ss' occurs twice WITHIN the doc -> distinct count 3, no dup
    assert out.loc[4, "n_windows"] == 3
    assert out.loc[4, "n_dup_windows"] == 0


def test_decontaminate_kill_list():
    """Benchmark decontamination: broadcast window kill-set, map-only."""
    from opensearch_ray.dedup import decontaminate
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["aa bb cc dd", "xx yy zz ww",
                          "ee ff gg hh", "bb cc dd ee"])}))
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["bb cc dd qq"])}))
    out = decontaminate(corpus, bench, k=3, analyzer="whitespace") \
        .to_pandas().set_index("doc_id").sort_index()
    # docs 0 and 3 contain the benchmark window 'bb cc dd'
    assert out["contaminated"].tolist() == [True, False, False, True]


def test_alias_registry(built_index, tmp_path):
    """_aliases surface: add/remove actions, filtered alias search via
    the docs= collector gate, write-index resolution, persistence."""
    from opensearch_ray.aliases import AliasRegistry
    from opensearch_ray.search import dsl

    idx = built_index.index_dir
    reg = AliasRegistry(str(tmp_path / "aliases.json"))
    reg.update([{"add": {"index": idx, "alias": "logs",
                         "is_write_index": True}},
                {"add": {"index": idx, "alias": "logs-user",
                         "filter": {"term": {"role": "user"}}}}])
    assert reg.write_index("logs") == idx
    assert reg.indices_for("logs-user") == [idx]
    # unfiltered alias == direct search
    s = Searcher(idx)
    q = "bace cedi"
    direct = [(h.docid, h.score) for h in s.search(q, k=5)]
    via = reg.search("logs", q, k=5)
    assert list(zip(via.doc_id, via.score)) == direct
    # filtered alias == search constrained to the filter's doc set
    allow = dsl.query_docs(s, {"term": {"role": "user"}})
    want = [(h.docid, h.score) for h in s.search(q, k=5, docs=allow)]
    got = reg.search("logs-user", q, k=5)
    assert list(zip(got.doc_id, got.score)) == want
    roles = s.fetch(got.doc_id.tolist(), columns=["role"]).to_pydict()
    assert set(roles["role"]) <= {"user"}
    # persistence + remove
    reg2 = AliasRegistry(str(tmp_path / "aliases.json"))
    assert sorted(reg2.aliases) == ["logs", "logs-user"]
    reg2.update([{"remove": {"index": idx, "alias": "logs-user"}}])
    assert sorted(reg2.aliases) == ["logs"]
    # a concrete dir resolves through
    assert reg2.write_index(idx) == idx


def test_stratified_sample_deterministic():
    """Stratified sampling: exact per-stratum rate control, rerun-stable,
    seed-independent draws."""
    from opensearch_ray.pipelines.sampling import stratified_sample
    n = 40_000
    ids = np.arange(n, dtype=np.int64)
    strata = np.where(ids % 2 == 0, "a", "b")
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "stratum": pa.array(strata)}))
    out = stratified_sample(ds, "stratum", {"a": 0.5, "b": 0.1},
                            id_col="doc_id").to_pandas()
    fa = (out.stratum == "a").sum() / (n / 2)
    fb = (out.stratum == "b").sum() / (n / 2)
    assert abs(fa - 0.5) < 0.02 and abs(fb - 0.1) < 0.02
    # deterministic: identical keep set on rerun
    out2 = stratified_sample(ds, "stratum", {"a": 0.5, "b": 0.1},
                             id_col="doc_id").to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)
    # a different seed draws a different (but same-sized-ish) sample
    out3 = stratified_sample(ds, "stratum", {"a": 0.5, "b": 0.1},
                             id_col="doc_id", seed=99).to_pandas()
    assert sorted(out3.doc_id) != sorted(out.doc_id)
    # unlisted strata drop by default
    out4 = stratified_sample(ds, "stratum", {"a": 1.0}).to_pandas()
    assert set(out4.stratum) == {"a"} and len(out4) == n / 2


def test_pack_sequences_concat_chunk():
    """Concat-then-chunk packing: contiguous token stream per group,
    budget-aligned sequence cuts, straddling docs allowed."""
    from opensearch_ray.pipelines.sampling import pack_sequences
    texts = ["a b c", "d e", "", "f g h i", "j"]   # tokens: 3 2 0 4 1
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts)}))
    out = pack_sequences(ds, budget=4, group_size=100).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.n_tokens.tolist() == [3, 2, 0, 4, 1]
    # exclusive cumsum: 0,3,5,5,9 -> seq 0,0,1,1,2 / offset 0,3,1,1,1
    assert out.seq.tolist() == [0, 0, 1, 1, 2]
    assert out.offset.tolist() == [0, 3, 1, 1, 1]
    # two groups pack independently
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 1000, 1001], pa.int64()),
        "text": pa.array(["a b c", "d", "x y", "z"])}))
    out2 = pack_sequences(ds2, budget=4, group_size=1000).to_pandas() \
        .set_index("doc_id")
    assert out2.loc[1000, "seq"] == 0 and out2.loc[1000, "offset"] == 0


def test_hybrid_rrf_fusion(built_index, s):
    """RRF hybrid: fused ranking equals the hand-computed
    1/(k0+rank) sum over the two legs."""
    from opensearch_ray.similarity import hybrid_rrf_search
    rng = np.random.default_rng(5)
    # embeddings for the first 50 global docids
    vecs = rng.standard_normal((50, 8)).astype(np.float64)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array(vecs.tolist())}))
    q = "bace cedi"
    out = hybrid_rrf_search(s, emb, q, vecs[3], k=10, k0=60, depth=20)
    hits = s.search(q, k=20)
    bm = {h.docid: i + 1 for i, h in enumerate(hits)}
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (vecs[3] / np.linalg.norm(vecs[3]))
    order = np.lexsort((np.arange(50), -sims))[:20]
    kn = {int(d): i + 1 for i, d in enumerate(order)}
    want = sorted(
        ((d, (1 / (60 + bm[d]) if d in bm else 0)
          + (1 / (60 + kn[d]) if d in kn else 0))
         for d in set(bm) | set(kn)), key=lambda r: (-r[1], r[0]))[:10]
    assert out.doc_id.tolist() == [d for d, _ in want]
    for got, (_, w) in zip(out.rrf_score, want):
        assert abs(got - w) < 1e-12
    # vector-only docs and text-only docs both fuse in
    assert (out.bm25_rank == 0).any() or (out.knn_rank == 0).any()


def test_field_alias_resolution(s):
    """`alias` field type (FieldAliasMapper.java): a request written
    against alias names executes identically to the concrete-field
    request; _source filtering is untouched; self/chained aliases are
    rejected at validation."""
    from opensearch_ray.mapper import resolve_field_aliases
    from opensearch_ray.search import dsl

    aliases = {"speaker": "role", "idx": "turn_idx", "content": "text"}
    aliased = {"query": {"bool": {
                   "must": [{"match": {"content": "bace cedi"}}],
                   "filter": [{"term": {"speaker": "user"}}]}},
               "sort": [{"idx": "asc"}, "_doc"],
               "size": 12, "_source": ["role", "turn_idx"],
               "aggs": {"by_role": {"terms": {"field": "speaker"}}}}
    concrete = {"query": {"bool": {
                    "must": [{"match": {"text": "bace cedi"}}],
                    "filter": [{"term": {"role": "user"}}]}},
                "sort": [{"turn_idx": "asc"}, "_doc"],
                "size": 12, "_source": ["role", "turn_idx"],
                "aggs": {"by_role": {"terms": {"field": "role"}}}}
    assert resolve_field_aliases(aliased, aliases) == concrete

    ra = dsl.execute_request(s, aliased, field_aliases=aliases,
                             id_col="turn_id")
    rc = dsl.execute_request(s, concrete, id_col="turn_id")
    pd.testing.assert_frame_equal(ra["hits"], rc["hits"])
    assert ra["aggregations"] == rc["aggregations"]
    assert ra["total"] == rc["total"] > 0

    # multi_match ^boost suffixes and highlight field keys resolve too
    body = {"query": {"multi_match": {"query": "x",
                                      "fields": ["content^2", "tool"]}},
            "highlight": {"fields": {"content": {}}}}
    r = resolve_field_aliases(body, aliases)
    assert r["query"]["multi_match"]["fields"] == ["text^2", "tool"]
    assert list(r["highlight"]["fields"]) == ["text"]

    with pytest.raises(ValueError):
        resolve_field_aliases({}, {"a": "a"})
    with pytest.raises(ValueError):
        resolve_field_aliases({}, {"a": "b", "b": "c"})


def test_derived_field_first_class(s):
    """register_derived_field makes a computed column behave like real
    doc-values everywhere: range/term/exists queries, sort, terms agg —
    and ignore_malformed yields all-null instead of failing."""
    from opensearch_ray.search import dsl, queries as Q

    s.register_derived_field(
        "ti_bucket", lambda df: (df["turn_idx"].values // 5)
        .astype(np.int64), ["turn_idx"])
    want = np.flatnonzero(np.concatenate(
        [s.doc_values(seg.seg_id, "turn_idx")
         for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id)])
        // 5 == 2)
    got = s.range_docs("ti_bucket", 2)
    assert (np.sort(got) == want).all() and got.size > 0
    assert Q.exists_docs(s, "ti_bucket").size == s.N

    r = dsl.execute_request(s, {
        "query": {"range": {"ti_bucket": {"gte": 1, "lte": 2}}},
        "sort": [{"ti_bucket": "asc"}, "_doc"], "size": 8,
        "aggs": {"b": {"terms": {"field": "ti_bucket", "size": 2}}}},
        id_col="turn_id")
    assert len(r["hits"]) == 8 and r["total"] > 8
    assert all(b["key"] in (1, 2) or b["doc_count"] > 0
               for b in r["aggregations"]["b"]["buckets"])

    def boom(df):
        raise RuntimeError("malformed")
    s.register_derived_field("bad", boom, ["turn_idx"],
                             ignore_malformed=True)
    assert Q.exists_docs(s, "bad").size == 0
    s.register_derived_field("bad2", boom, ["turn_idx"])
    with pytest.raises(RuntimeError):
        s.doc_values(s.manifest.segments[0].seg_id, "bad2")
    with pytest.raises(ValueError):
        s.register_derived_field("x", lambda df: df, [])


def test_request_cache(s):
    """IndicesRequestCache analogue: identical requests hit the LRU with
    identical results; callable-bearing (un-cacheable) bodies bypass;
    the entry bound evicts oldest-first."""
    from opensearch_ray.search.request_cache import RequestCache

    rc = RequestCache(max_entries=2)
    body = {"query": {"match": {"text": "bace cedi"}}, "size": 5,
            "aggs": {"r": {"terms": {"field": "role"}}}}
    r1 = rc.execute(s, body, id_col="turn_id")
    r2 = rc.execute(s, body, id_col="turn_id")
    pd.testing.assert_frame_equal(r1["hits"], r2["hits"])
    assert r1["aggregations"] == r2["aggregations"]
    assert rc.stats() == {"hit_count": 1, "miss_count": 1, "entries": 1}
    # a cached frame handed out twice must not alias (mutation-safe)
    r2["hits"]["score"] = -1.0
    r3 = rc.execute(s, body, id_col="turn_id")
    assert (r3["hits"]["score"] >= 0).all()

    derived = {**body, "derived": {"x": {"script": {
        "source": lambda df: df["turn_idx"].values,
        "fields": ["turn_idx"]}}}}
    assert RequestCache.cache_key(derived, "text") is None
    r4 = rc.execute(s, derived, id_col="turn_id")  # bypass, still works
    pd.testing.assert_frame_equal(r4["hits"], r1["hits"])
    assert rc.stats()["entries"] == 1  # bypass stored nothing

    rc.execute(s, {**body, "size": 6}, id_col="turn_id")
    rc.execute(s, {**body, "size": 7}, id_col="turn_id")
    assert rc.stats()["entries"] == 2  # size bound evicted the oldest
    rc.clear()
    assert rc.stats()["entries"] == 0


def test_ltr_rescore_window_and_logging(s):
    """sltr rescorer: linear model over extracted features re-ranks only
    the window; feature logging returns the aligned matrix; callable and
    const features compose."""
    from opensearch_ray.search.ltr import extract_features, ltr_rescore

    out, feats = ltr_rescore(
        s, "bace cedi",
        feature_set={"bm25": {"bm25": "bace cedi"},
                     "ti": {"field": "turn_idx"},
                     "bias": {"const": 2.0}},
        weights={"bm25": 1.0, "ti": 0.01, "bias": 1.0},
        window_size=20, k=5, log_features=True)
    assert len(out) == 5 and len(feats) <= 20
    base = {h.docid: h.score for h in s.search("bace cedi", k=20)}
    assert set(feats._docid) <= set(base)
    # model score recomputed by hand
    f = feats.set_index("_docid")
    for d, sc in zip(out._docid, out.ltr_score):
        assert sc == pytest.approx(
            f.loc[d, "bm25"] + 0.01 * f.loc[d, "ti"] + 2.0)
    assert (np.diff(out.ltr_score.values) <= 1e-12).all()
    # callable feature
    m = extract_features(
        s, np.array(sorted(base)[:4], np.int64),
        {"twice": lambda srch, ids: ids * 2.0})
    assert (m["twice"].values == m["_docid"].values * 2).all()


def test_phrase_suggest_smoothing_models(s):
    """PhraseSuggester smoothing models: laplace and linear_interpolation
    score phrases by the reference formulas; all three models rank a
    real corpus phrase first for a one-edit typo."""
    import math

    from opensearch_ray.search.features import (bigram_model,
                                                phrase_suggest)

    # a real bigram from the corpus to misspell
    model = bigram_model(s)
    (a, b), cnt = max(model.items(), key=lambda kv: kv[1])
    typo = a[:-1] + ("x" if a[-1] != "x" else "y") + " " + b
    for sm in ("stupid_backoff", "laplace", "linear_interpolation"):
        out = phrase_suggest(s, typo, size=3, smoothing=sm)
        assert len(out) and out.phrase.iloc[0] == f"{a} {b}", (sm, out)

    # laplace hand-check on the top suggestion
    out = phrase_suggest(s, typo, size=1, smoothing="laplace", alpha=0.5)
    stats = s.term_stats([a, b])
    T = float(s.manifest.sum_dl)
    import glob, os
    import pyarrow.parquet as pq
    V = float(sum(pq.ParquetFile(f).metadata.num_rows for f in glob.glob(
        os.path.join(s.manifest.index_dir, "term_stats", "*.parquet"))))
    want = math.log((stats[a][1] / T)
                    * (0.5 + cnt) / (stats[a][1] + 0.5 * V))
    assert out.score.iloc[0] == pytest.approx(want)
    with pytest.raises(ValueError):
        phrase_suggest(s, typo, smoothing="kneser_ney")


def test_dsl_suggest_smoothing_passthrough(s):
    """Request-body phrase suggester accepts the reference's smoothing
    and direct_generator options."""
    from opensearch_ray.search import dsl
    from opensearch_ray.search.features import bigram_model, phrase_suggest

    (a, b), _ = max(bigram_model(s).items(), key=lambda kv: kv[1])
    typo = a[:-1] + ("x" if a[-1] != "x" else "y") + " " + b
    r = dsl.execute_request(s, {"size": 0, "suggest": {
        "fix": {"text": typo, "phrase": {
            "size": 3,
            "smoothing": {"laplace": {"alpha": 0.7}},
            "direct_generator": [{"max_edits": 1}]}}}},
        id_col="turn_id")
    got = r["suggest"]["fix"]
    want = phrase_suggest(s, typo, size=3, smoothing="laplace", alpha=0.7)
    assert [g["phrase"] for g in got] == want.phrase.tolist()
    assert got[0]["score"] == pytest.approx(want.score.iloc[0])


def test_phrase_suggest_collate(s):
    """collate: prune=true annotates every suggestion with collate_match,
    default mode drops suggestions matching no docs."""
    from opensearch_ray.search import dsl
    from opensearch_ray.search.features import bigram_model, phrase_suggest

    (a, b), _ = max(bigram_model(s).items(), key=lambda kv: kv[1])
    typo = a[:-1] + ("x" if a[-1] != "x" else "y") + " " + b
    pruned = phrase_suggest(s, typo, size=5, collate="prune")
    assert "collate_match" in pruned.columns
    assert bool(pruned.collate_match.iloc[0])  # the real phrase matches
    filtered = phrase_suggest(s, typo, size=5, collate="filter")
    assert set(filtered.phrase) <= set(pruned.phrase)
    assert (filtered["rank"].values
            == np.arange(1, len(filtered) + 1)).all()

    r = dsl.execute_request(s, {"size": 0, "suggest": {"fix": {
        "text": typo, "phrase": {"size": 5,
                                 "collate": {"prune": True}}}}},
        id_col="turn_id")
    assert all("collate_match" in g for g in r["suggest"]["fix"])


def test_max_result_window_guard(s):
    """index.max_result_window: from+size beyond 10000 is rejected with
    the reference's error shape; rescore/collapse internal widening and
    search_after paging are exempt."""
    from opensearch_ray.search import dsl

    with pytest.raises(ValueError, match="Result window is too large"):
        dsl.execute_search(s, {"query": {"match_all": {}},
                               "from": 9995, "size": 10},
                           id_col="turn_id")
    # boundary is inclusive
    r = dsl.execute_search(s, {"query": {"term": {"role": "user"}},
                               "from": 9990, "size": 10},
                           id_col="turn_id")
    assert len(r) <= 10
    # collapse still widens internally without tripping the guard
    r2 = dsl.execute_request(s, {"query": {"match": {"text": "bace"}},
                                 "collapse": {"field": "conv_id"},
                                 "size": 5}, id_col="turn_id")
    assert len(r2["hits"]) <= 5


def test_term_suggest_sort_by_frequency(s):
    """TermSuggestionBuilder.SortBy: frequency ordering puts the most
    frequent candidate first even at a worse edit distance."""
    from opensearch_ray.search.features import term_suggest

    # pick a real vocab term and misspell it
    txt = s.fetch([3], columns=["text"]).column("text")[0].as_py()
    tok = max(s.analyzer.tokens(txt), key=len)
    typo = tok[:-1] + ("x" if tok[-1] != "x" else "q")
    sc = term_suggest(s, typo, max_edits=2, size=8, sort="score")
    fr = term_suggest(s, typo, max_edits=2, size=8, sort="frequency")
    assert set(zip(sc.suggestion, sc.df)) >= set()  # both non-degenerate
    assert (np.diff(fr.df.values) <= 0).all()       # df desc
    d = sc.sort_values(["distance", "df"],
                       ascending=[True, False], kind="mergesort")
    assert sc.suggestion.tolist() == d.suggestion.tolist()
    with pytest.raises(ValueError):
        term_suggest(s, typo, sort="nope")


def test_hybrid_normalized_fusion(built_index, s):
    """Normalized hybrid (neural-search min_max + weighted arithmetic
    mean): fused scores equal the hand-computed combination; l2 and
    geometric/harmonic variants stay ordered and bounded."""
    from opensearch_ray.similarity import hybrid_normalized_search
    from opensearch_ray.similarity.hybrid import _combine, _normalize_leg
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((50, 8)).astype(np.float64)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array(vecs.tolist())}))
    q = "bace cedi"
    out = hybrid_normalized_search(s, emb, q, vecs[3], k=10, depth=20,
                                   weights=(0.6, 0.4))
    # hand-compute the min_max + arithmetic_mean fusion
    hits = s.search(q, k=20)
    bm_sc = np.array([h.score for h in hits])
    bm_n = dict(zip([h.docid for h in hits],
                    _normalize_leg(bm_sc, "min_max")))
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (vecs[3] / np.linalg.norm(vecs[3]))
    order = np.lexsort((np.arange(50), -sims))[:20]
    kn_n = dict(zip((int(d) for d in order),
                    _normalize_leg(sims[order], "min_max")))
    want = []
    for d in sorted(set(bm_n) | set(kn_n)):
        num = wsum = 0.0
        if d in bm_n:
            num += 0.6 * bm_n[d]
            wsum += 0.6
        if d in kn_n:
            num += 0.4 * kn_n[d]
            wsum += 0.4
        want.append((d, num / wsum))
    want.sort(key=lambda r: (-r[1], r[0]))
    assert out.doc_id.tolist() == [d for d, _ in want[:10]]
    for got, (_, w) in zip(out.score, want[:10]):
        assert abs(got - w) < 1e-12
    # l2 normalization: leg norms sum to 1 in quadrature
    l2 = _normalize_leg(bm_sc, "l2")
    assert abs((l2 ** 2).sum() - 1.0) < 1e-12
    # geometric/harmonic means sit within [min, max] of the leg scores
    mat = np.array([[0.8, 0.2]])
    pres = np.ones((1, 2))
    w = np.array([0.5, 0.5])
    am = _combine(mat, pres, w, "arithmetic_mean")[0]
    gm = _combine(mat, pres, w, "geometric_mean")[0]
    hm = _combine(mat, pres, w, "harmonic_mean")[0]
    assert 0.2 < hm < gm < am < 0.8
    # degenerate single-score leg -> 1.0
    assert _normalize_leg(np.array([2.5]), "min_max")[0] == 1.0


def test_ip_prefix_agg():
    """ip_prefix: /24 and /16 masks, min_doc_count, /len suffix."""
    from opensearch_ray.aggs import ip_prefix_agg
    ds = rd.from_arrow(pa.table({"ip": pa.array(
        ["10.0.0.1", "10.0.0.9", "10.0.1.5", "172.16.254.3"])}))
    r = ip_prefix_agg(ds, "ip", 24)
    assert r["key"].tolist() == ["10.0.0.0", "10.0.1.0", "172.16.254.0"]
    assert r["doc_count"].tolist() == [2, 1, 1]
    r = ip_prefix_agg(ds, "ip", 24, min_doc_count=2)
    assert r["key"].tolist() == ["10.0.0.0"]
    r = ip_prefix_agg(ds, "ip", 16, append_prefix_length=True)
    assert r["key"].tolist() == ["10.0.0.0/16", "172.16.0.0/16"]
    assert r["doc_count"].tolist() == [3, 1]
    # /0 puts everything in one bucket
    r = ip_prefix_agg(ds, "ip", 0)
    assert r["key"].tolist() == ["0.0.0.0"]
    assert r["doc_count"].tolist() == [4]


def test_dsl_hybrid_query(built_index, s):
    """`hybrid` DSL clause: two text legs fuse per the normalization +
    combination spec; defaults (equal weights, min_max, arithmetic)
    apply when specs are omitted; bad specs raise."""
    from opensearch_ray.search import dsl
    from opensearch_ray.similarity.hybrid import _normalize_leg
    legs = [{"match": {"text": "bace cedi"}}, {"match": {"text": "dafo"}}]
    body = {"query": {"hybrid": {
                "queries": legs, "pagination_depth": 20,
                "combination": {"parameters": {"weights": [0.6, 0.4]}}}},
            "size": 10}
    out = dsl.execute_search(s, body)
    assert len(out) <= 10 and (np.diff(out["score"].values) <= 1e-15).all()
    # hand-compute the fusion from the two single-leg runs
    h1 = s.search("bace cedi", k=20)
    h2 = s.search("dafo", k=20)
    n1 = dict(zip([h.docid for h in h1], _normalize_leg(
        np.array([h.score for h in h1], np.float64), "min_max")))
    n2 = dict(zip([h.docid for h in h2], _normalize_leg(
        np.array([h.score for h in h2], np.float64), "min_max")))
    want = []
    for d in sorted(set(n1) | set(n2)):
        num = (0.6 * n1[d] if d in n1 else 0) + (0.4 * n2[d] if d in n2 else 0)
        den = (0.6 if d in n1 else 0) + (0.4 if d in n2 else 0)
        want.append((d, num / den))
    want.sort(key=lambda r: (-r[1], r[0]))
    assert out["doc_id"].tolist() == [d for d, _ in want[:10]]
    # l2 + geometric_mean variant runs and stays within (0, 1]
    body2 = {"query": {"hybrid": {
                "queries": legs, "pagination_depth": 20,
                "normalization": {"technique": "l2"},
                "combination": {"technique": "geometric_mean"}}},
             "size": 5}
    out2 = dsl.execute_search(s, body2)
    assert (out2["score"] > 0).all() and (out2["score"] <= 1.0 + 1e-12).all()
    # weight-count mismatch raises
    with pytest.raises(ValueError):
        dsl.execute_search(s, {"query": {"hybrid": {
            "queries": legs,
            "combination": {"parameters": {"weights": [1.0]}}}}})
    with pytest.raises(ValueError):
        dsl.execute_search(s, {"query": {"hybrid": {"queries": []}}})


def test_neural_sparse_topk():
    """neural_sparse raw query_tokens: sparse dot product, docs sharing
    no token don't match, (score desc, id asc) ties."""
    from opensearch_ray.search.features import neural_sparse_topk
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "feats": pa.array(['{"a": 2.0, "b": 1.0}', '{"a": 1.5}',
                           '{"c": 9.0}', '{"b": 4.0}'])}))
    out = neural_sparse_topk(ds, "feats", {"a": 1.0, "b": 0.5},
                             "doc_id", k=10)
    # doc3 has no shared token -> absent
    assert out["doc_id"].tolist() == [1, 4, 2]
    assert np.allclose(out["score"].tolist(), [2.5, 2.0, 1.5])
    assert out["rank"].tolist() == [1, 2, 3]
