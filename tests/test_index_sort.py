"""Index sorting + early termination (IndexSortConfig /
QueryPhase.canEarlyTerminate): the builder sorts every segment by
sort_cols and records the contract in the manifest; sorted queries whose
sort matches the index sort's leading column ascending collect only k
docs per segment with a row-group-pruned prefix read."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opensearch_ray.search import Searcher


def test_manifest_records_index_sort(built_index):
    assert built_index.index_sort == ["conv_id", "turn_idx"]
    assert all(s.index_sorted for s in built_index.segments)


def test_early_termination_parity(built_index):
    """auto early termination must be invisible in results: asc (eligible)
    and desc (ineligible -> full path) both equal the full path; filters
    compose; early_terminate=True on an ineligible sort raises."""
    s = Searcher(built_index.index_dir)
    q = "bace cedi"
    for kw in ({}, {"filters": {"role": "user"}}):
        full = s.search_sorted(q, "conv_id", k=7, early_terminate=False, **kw)
        fast = s.search_sorted(q, "conv_id", k=7, **kw)
        pd.testing.assert_frame_equal(full, fast)
        assert len(fast) == 7
    d_full = s.search_sorted(q, "conv_id", k=7, ascending=False,
                             early_terminate=False)
    d_auto = s.search_sorted(q, "conv_id", k=7, ascending=False)
    pd.testing.assert_frame_equal(d_full, d_auto)
    with pytest.raises(ValueError):
        s.search_sorted(q, "conv_id", k=7, ascending=False,
                        early_terminate=True)
    with pytest.raises(ValueError):
        s.search_sorted(q, "turn_idx", k=7, early_terminate=True)


def test_early_termination_prefix_read(built_index):
    """The eligible path reads the sort column via doc_values_slice
    (bounded, uncached) — the full-column doc-values cache for the sort
    field must stay COLD, proving the collector touched only the prefix."""
    s = Searcher(built_index.index_dir)  # fresh caches
    out = s.search_sorted("bace cedi", "conv_id", k=5)
    assert len(out) == 5
    assert not any(col == "conv_id" for (_, col) in s._docvalues)
    # the full path warms it
    s.search_sorted("bace cedi", "conv_id", k=5, early_terminate=False)
    assert any(col == "conv_id" for (_, col) in s._docvalues)


def test_doc_values_slice_matches_column(built_index):
    s = Searcher(built_index.index_dir)
    seg0 = built_index.segments[0].seg_id
    sliced = s.doc_values_slice(seg0, "turn_idx", 5, 60)  # cache cold
    full = s.doc_values(seg0, "turn_idx")
    assert (sliced == full[5:60]).all()
    # served from cache once warm
    assert (s.doc_values_slice(seg0, "turn_idx", 0, 9) == full[:9]).all()


def test_merge_boundary_check_demotes_unsorted_layout(tmp_path):
    """force_merge keeps index_sorted only when sources are contiguous in
    sort order: two files with OVERLAPPING conv_id ranges merge into a
    segment that is NOT sorted — the flag drops, auto early termination
    falls back to the full path, and results stay correct."""
    from opensearch_ray.index.build import build_index, load_manifest
    from opensearch_ray.index.merge_policy import force_merge

    corpus = tmp_path / "corpus"
    os.makedirs(corpus)
    rng = np.random.default_rng(3)

    def mk(path, conv_lo, conv_hi, n=120):
        conv = np.sort(rng.integers(conv_lo, conv_hi, n))
        pq.write_table(pa.table({
            "conv_id": pa.array([f"c{c:04d}" for c in conv]),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "text": pa.array([f"alpha beta tok{i % 17}" for i in range(n)]),
        }), path)

    mk(str(corpus / "a.parquet"), 0, 60)
    mk(str(corpus / "b.parquet"), 40, 100)   # overlaps file a
    idx = str(tmp_path / "idx")
    m = build_index(str(corpus), idx, num_buckets=4)
    assert m.index_sort == ["conv_id", "turn_idx"]
    m2 = force_merge(load_manifest(idx), max_segments=1)
    assert [s.index_sorted for s in m2.segments] == [False]

    s = Searcher(idx)
    full = s.search_sorted("alpha", "conv_id", k=9, early_terminate=False)
    auto = s.search_sorted("alpha", "conv_id", k=9)
    pd.testing.assert_frame_equal(full, auto)


def test_split_index_identity(tmp_path):
    """_split (ResizeType.SPLIT): factor x more segments, global docids
    and query results unchanged — rank identity for BM25, positions
    survive re-encoding (phrase query identical), index-sort early
    termination still sound on the split segments."""
    import shutil

    from opensearch_ray.index.build import build_index, load_manifest
    from opensearch_ray.index.merge_policy import split_index
    from opensearch_ray.sources import write_transcript_corpus

    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    write_transcript_corpus(corpus, n_turns=1500, n_files=2, seed=13)
    m = build_index(corpus, idx, analyzer="transcript", num_buckets=4,
                    index_positions=True)
    s = Searcher(idx)
    # a phrase that actually occurs: first two tokens of some document
    txt = s.fetch([5], columns=["text"]).column("text")[0].as_py()
    toks = s.analyzer.tokens(txt)[:2]
    phrase = " ".join(toks)
    want = [(h.docid, h.score) for h in s.search("bace cedi", k=10)]
    want_ph = sorted(s.match_phrase(phrase).tolist())
    assert want_ph, "fixture phrase must match at least the source doc"

    m2 = split_index(load_manifest(idx), factor=3)
    assert len(m2.segments) == 3 * len(m.segments)
    assert m2.total_docs == m.total_docs
    assert [x.doc_base for x in m2.segments] == sorted(
        x.doc_base for x in m2.segments)
    assert all(x.index_sorted for x in m2.segments)

    s2 = Searcher(idx)
    assert [(h.docid, h.score) for h in s2.search("bace cedi", k=10)] == want
    assert sorted(s2.match_phrase(phrase).tolist()) == want_ph
    pd.testing.assert_frame_equal(
        s2.search_sorted("bace", "conv_id", k=6, early_terminate=False),
        s2.search_sorted("bace", "conv_id", k=6))


def test_dsl_index_sort_prune_parity(built_index):
    """The DSL sort path's early termination is result-invisible: an
    index-sort-aligned request equals the same request on a searcher
    whose manifest disables the contract (full path), across paging,
    scored and filter-context queries; a desc or secondary-keyed sort is
    ineligible and still correct."""
    from opensearch_ray.search import dsl

    s = Searcher(built_index.index_dir)
    s_off = Searcher(built_index.index_dir)
    s_off.manifest.index_sort = []  # force the full path

    bodies = [
        {"query": {"term": {"role": "user"}},
         "sort": [{"conv_id": "asc"}], "size": 9},
        {"query": {"term": {"role": "user"}},
         "sort": [{"conv_id": "asc"}, "_doc"], "from": 5, "size": 7},
        {"query": {"match": {"text": "bace cedi"}},
         "sort": [{"conv_id": "asc"}], "size": 6},
        {"query": {"term": {"role": "user"}},          # ineligible: desc
         "sort": [{"conv_id": "desc"}], "size": 6},
        {"query": {"term": {"role": "user"}},          # ineligible: 2nd key
         "sort": [{"conv_id": "asc"}, {"turn_idx": "desc"}], "size": 6},
    ]
    for body in bodies:
        a = dsl.execute_search(s, body, id_col="turn_id")
        b = dsl.execute_search(s_off, body, id_col="turn_id")
        pd.testing.assert_frame_equal(a, b)
