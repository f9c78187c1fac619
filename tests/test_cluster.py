"""SearchCluster (shard fan-out actors) must equal the local Searcher exactly."""

import pandas as pd
import pytest

from opensearch_ray.search import Searcher, SearchCluster
from opensearch_ray.search.features import search_after_page
from opensearch_ray.sources import reference_queries


@pytest.fixture(scope="module")
def cluster(built_index):
    c = SearchCluster(built_index.index_dir, num_executors=2)
    yield c
    c.shutdown()


def test_cluster_equals_local(built_index, cluster):
    local = Searcher(built_index.index_dir)
    for q in reference_queries():
        want = [(h.docid, h.score) for h in
                local.search(q["query_text"], k=q["k"])]
        got = [(h.docid, h.score) for h in
               cluster.search(q["query_text"], k=q["k"])]
        assert got == want, q["query_id"]


def test_cluster_filters_parity(built_index, cluster):
    local = Searcher(built_index.index_dir)
    flt = {"role": "user", "turn_idx": {"gte": 2, "lt": 8}}
    want = [(h.docid, h.score) for h in
            local.search("bace cedi", k=20, filters=flt)]
    got = [(h.docid, h.score) for h in
           cluster.search("bace cedi", k=20, filters=flt)]
    assert got == want


def test_cluster_search_after_and_scroll(built_index, cluster):
    local = Searcher(built_index.index_dir)
    p1 = cluster.search("bace", k=10)
    assert [(h.docid, h.score) for h in p1] == [
        (h.docid, h.score) for h in local.search("bace", k=10)]
    cur = (p1[-1].score, p1[-1].docid)
    got = cluster.search_after("bace", 10, cur)
    want = search_after_page(local, "bace", 10, after=cur)
    assert [(h.docid, h.score) for h in got] == [
        (h.docid, h.score) for h in want]
    # full scroll enumerates exactly the exhaustive hit list, in order
    all_hits = [(h.docid, h.score) for h in local.search("bace", k=10**9)]
    scrolled = [(h.docid, h.score)
                for page in cluster.scroll("bace", page_size=7)
                for h in page]
    assert scrolled == all_hits


def test_cluster_sort_aggs_count_parity(built_index, cluster):
    local = Searcher(built_index.index_dir)
    want = local.search_sorted("bace", "turn_idx", k=10, ascending=False)
    got = cluster.search_sorted("bace", "turn_idx", k=10, ascending=False)
    assert got["_docid"].tolist() == want["_docid"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    wa = local.terms_agg_on_hits("bace cedi", "role", size=5)
    ga = cluster.terms_agg_on_hits("bace cedi", "role", size=5)
    assert ga["role"].tolist() == wa["role"].tolist()
    assert ga["doc_count"].tolist() == wa["doc_count"].tolist()
    assert cluster.count("bace cedi", operator="and") == local.count(
        "bace cedi", operator="and")


def test_cluster_msearch(built_index, cluster):
    local = Searcher(built_index.index_dir)
    reqs = [("bace", 5, "or"), ("bace cedi", 10, "and"), ("difo", 3, "or")]
    got = cluster.msearch(reqs)
    for (q, k, op), hits in zip(reqs, got):
        want = local.search(q, k=k, operator=op)
        assert [(h.docid, h.score) for h in hits] == [
            (h.docid, h.score) for h in want], q


def test_cluster_dsl_parity(built_index, cluster):
    from opensearch_ray.search import dsl
    local = Searcher(built_index.index_dir)
    # derive two frequent terms from the corpus
    from collections import Counter
    cnt = Counter()
    full = local.fetch(list(range(min(local.N, 150))), columns=["text"])
    for r in full.to_pylist():
        cnt.update(local.analyzer.tokens(r["text"] or ""))
    a, b = [t for t, _ in cnt.most_common(2)]
    bodies = [
        {"query": {"match": {"text": f"{a} {b}"}}, "size": 12},
        {"query": {"bool": {"must": [{"match": {"text": a}}],
                            "filter": [{"range":
                                        {"turn_idx": {"gte": 1}}}]}},
         "from": 2, "size": 6},
        {"query": {"constant_score": {"filter": {"term": {"text": b}},
                                      "boost": 2.0}}, "size": 5},
    ]
    for body in bodies:
        want = dsl.execute_search(local, body, id_col="doc_id")
        got = cluster.execute_search(dict(body))
        assert got.doc_id.tolist() == want.doc_id.tolist(), body
        assert got.score.tolist() == pytest.approx(want.score.tolist())
    with pytest.raises(ValueError):
        cluster.execute_search({"query": {"match": {"text": a}},
                                "sort": [{"turn_idx": "asc"}]})
    # coordinator fetch phase (_source)
    r = cluster.execute_search({"query": {"match": {"text": a}},
                                "size": 4, "_source": ["turn_idx"]})
    want = dsl.execute_search(local, {"query": {"match": {"text": a}},
                                      "size": 4, "_source": ["turn_idx"]},
                              id_col="doc_id")
    assert r.turn_idx.tolist() == want.turn_idx.tolist()


def test_search_with_timeout_partial_results(built_index, cluster):
    """timeout + allow_partial_search_results: a shard missing the
    coordinator deadline is skipped, the response is marked timed_out
    with shard accounting; disallowing partials raises; a generous
    deadline returns the identical full result."""
    import ray
    from types import SimpleNamespace

    local = Searcher(built_index.index_dir)
    want = [(h.docid, h.score) for h in local.search("bace cedi", k=10)]

    r = cluster.search_with_timeout("bace cedi", k=10, timeout_ms=30000)
    assert not r["timed_out"]
    assert r["_shards"] == {"total": 2, "successful": 2, "skipped": 0,
                            "failed": 0}
    assert [(h.docid, h.score) for h in r["hits"]] == want

    @ray.remote
    def stalled(*_a, **_k):
        import time
        time.sleep(30)
        return []

    slow = SimpleNamespace(search=SimpleNamespace(
        remote=lambda *a, **k: stalled.remote()))
    fast_partials = ray.get(
        cluster.executors[1].search.remote("bace cedi", 10, "or", None))
    real = cluster.executors
    cluster.executors = [slow, real[1]]
    try:
        r = cluster.search_with_timeout("bace cedi", k=10, timeout_ms=500)
        assert r["timed_out"]
        assert r["_shards"]["successful"] == 1
        assert r["_shards"]["skipped"] == 1
        # partial hits == the answering shard's partial, coordinator-merged
        assert [(h.docid, h.score) for h in r["hits"]] == [
            (d, s) for d, s in sorted(fast_partials,
                                      key=lambda p: (-p[1], p[0]))][:10]
        with pytest.raises(TimeoutError):
            cluster.search_with_timeout(
                "bace cedi", k=10, timeout_ms=200,
                allow_partial_search_results=False)
    finally:
        cluster.executors = real


def test_routing_shrinks_shard_set(tmp_path):
    """?routing on a hash-routed layout (build_index_from_dataset):
    the search hits ONLY the owning partition's segment — equal to the
    local searcher restricted to that segment; on an unrouted index the
    parameter is ignored."""
    import numpy as np
    import pandas as pd
    import ray

    from opensearch_ray.index.build import build_index_from_dataset
    from opensearch_ray.sources import write_transcript_corpus

    corpus = str(tmp_path / "corpus")
    write_transcript_corpus(corpus, n_turns=1200, n_files=2, seed=21)
    ds = ray.data.read_parquet(corpus)
    idx = str(tmp_path / "idx")
    m = build_index_from_dataset(ds, idx, partition_key="conv_id",
                                 num_partitions=4, num_buckets=4)
    assert m.build_params["routing"]["num_partitions"] == 4

    key = ray.data.read_parquet(corpus).take(1)[0]["conv_id"]
    P = 4
    part = int(pd.util.hash_array(
        np.asarray([key], dtype=object))[0] % np.uint64(P))

    c = SearchCluster(idx, num_executors=2)
    try:
        local = Searcher(idx)
        want = [(h.docid, h.score) for h in
                local.search("bace", k=10, allowed_segs={part})]
        got = [(h.docid, h.score) for h in
               c.search("bace", k=10, routing=key)]
        assert got == want and got
        # routed results are the owner's slice of the unrouted result set
        full = {(h.docid, h.score) for h in c.search("bace", k=200)}
        assert set(got) <= full
    finally:
        c.shutdown()


def test_async_search_lifecycle(built_index, cluster):
    """async_search submit/status/get: a stalled shard keeps is_running
    true, get(partial=True) merges what landed, the final get equals the
    synchronous search."""
    import ray
    import time
    from types import SimpleNamespace

    want = [(h.docid, h.score) for h in cluster.search("bace cedi", k=10)]
    h = cluster.async_search("bace cedi", k=10)
    full = h.get()
    assert not full["is_partial"]
    assert [(x.docid, x.score) for x in full["hits"]] == want
    assert h.status() == {"is_running": False,
                          "_shards": {"total": 2, "successful": 2,
                                      "skipped": 0, "failed": 0}}

    @ray.remote
    def stalled(*_a, **_k):
        time.sleep(30)
        return []

    slow = SimpleNamespace(search=SimpleNamespace(
        remote=lambda *a, **k: stalled.remote()))
    real = cluster.executors
    cluster.executors = [slow, real[1]]
    try:
        h2 = cluster.async_search("bace cedi", k=10)
        deadline = time.time() + 20
        while h2.status()["_shards"]["successful"] < 1:
            assert time.time() < deadline
            time.sleep(0.05)
        st = h2.status()
        assert st["is_running"] and st["_shards"]["successful"] == 1
        part = h2.get(partial=True)
        assert part["is_partial"] and len(part["hits"]) > 0
    finally:
        cluster.executors = real


def test_msearch_dsl_parity(built_index, cluster):
    """Batched DSL msearch: one actor round-trip, each body's result
    equal to its individual execute_search."""
    bodies = [
        {"query": {"match": {"text": "bace cedi"}}, "size": 6},
        {"query": {"bool": {"must": [{"match": {"text": "bace"}}],
                            "filter": [{"term": {"role": "user"}}]}},
         "size": 4},
        {"query": {"term": {"role": "assistant"}}, "from": 3, "size": 5},
    ]
    got = cluster.msearch_dsl(bodies, id_col="turn_id")
    for body, g in zip(bodies, got):
        want = cluster.execute_search(body, id_col="turn_id")
        pd.testing.assert_frame_equal(g, want)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cluster.msearch_dsl([{"query": {"match_all": {}},
                              "sort": ["_doc"]}])


def test_sliced_scroll_partitions_exactly(built_index, cluster):
    """Sliced scroll (SliceBuilder): slices are disjoint, their union in
    rank order equals the unsliced scroll, and each slice's membership is
    hash(docid) % max."""
    import numpy as np

    full = [h for page in cluster.scroll("bace", page_size=17)
            for h in page]
    m = 3
    slices = [[h for page in cluster.scroll("bace", page_size=17,
                                            slice_spec=(i, m))
               for h in page] for i in range(m)]
    ids = [np.array([h.docid for h in s], np.int64) for s in slices]
    assert sum(len(x) for x in ids) == len(full)
    assert not (set(ids[0]) & set(ids[1]) | set(ids[0]) & set(ids[2])
                | set(ids[1]) & set(ids[2]))
    assert set(np.concatenate(ids).tolist()) == {h.docid for h in full}
    for i, arr in enumerate(ids):
        assert (pd.util.hash_array(arr) % np.uint64(m) == i).all()
    # per-slice ordering matches the full ranking restricted to the slice
    want = [h.docid for h in full
            if pd.util.hash_array(np.array([h.docid], np.int64))[0]
            % np.uint64(m) == 1]
    assert [h.docid for h in slices[1]] == want
    with pytest.raises(ValueError):
        next(iter(cluster.scroll("bace", slice_spec=(3, 3))))
