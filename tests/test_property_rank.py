"""Property-based rank identity + multi-chunk postings query coverage."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from opensearch_ray.index.build import build_index
from opensearch_ray.search import BruteForceOracle, Searcher

_WORDS = ["alpha", "beta", "gamma", "delta", "the", "and", "of", "Épsilon",
          "漢", "x" * 300, "can't", "3.14", "zeta", "eta", "theta", ""]


def _mk_corpus(tmpdir, texts, n_files=2):
    rows = len(texts)
    tbl = pa.table({
        "conv_id": [f"c{i // 4:05d}" for i in range(rows)],
        "turn_idx": pa.array([i % 4 for i in range(rows)], pa.int32()),
        "text": pa.array(texts, pa.string()),
    })
    import os
    os.makedirs(tmpdir, exist_ok=True)
    cut = max(1, rows // n_files)
    paths = []
    for fi, lo in enumerate(range(0, rows, cut)):
        p = f"{tmpdir}/part-{fi:03d}.parquet"
        pq.write_table(tbl.slice(lo, cut), p)
        paths.append(p)
    return paths


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
        min_size=4, max_size=40),
    qwords=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=4),
    data=st.data(),
)
def test_random_corpus_rank_identity(docs, qwords, data, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prop")
    _mk_corpus(str(tmp / "c"), docs)
    m = build_index(str(tmp / "c"), str(tmp / "i"), analyzer="transcript",
                    sort_cols=("conv_id", "turn_idx"), num_buckets=2,
                    hot_df_threshold=5)
    full = pa.concat_tables([pq.read_table(p) for p in sorted(
        __import__("glob").glob(str(tmp / "c" / "*.parquet")))])
    oracle = BruteForceOracle(full, analyzer="transcript")
    s = Searcher(str(tmp / "i"))
    q = " ".join(qwords)
    for op in ("or", "and"):
        got = [(h.docid, h.score) for h in s.search(q, k=7, operator=op)]
        want = oracle.search(q, k=7, operator=op)
        assert got == want, (q, op)


def test_multichunk_postings_query(tmp_path, monkeypatch):
    """Force MAX_DOCS_PER_CHUNK tiny so a term's postings span many chunks,
    exercising the split-chunk encode AND the pruned block-decode path;
    results must equal the oracle exactly."""
    from opensearch_ray.index import postings as pmod
    from opensearch_ray.index import segment as smod

    monkeypatch.setattr(pmod, "MAX_DOCS_PER_CHUNK", 40)
    monkeypatch.setattr(smod, "MAX_DOCS_PER_CHUNK", 40)

    n = 400
    rng = np.random.default_rng(5)
    texts = []
    for i in range(n):
        words = ["common"]  # in every doc -> one big multi-chunk posting
        words += [f"w{rng.integers(0, 30):02d}" for _ in range(int(rng.integers(2, 9)))]
        texts.append(" ".join(words))
    tbl = pa.table({
        "conv_id": [f"c{i:05d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, pa.int32()),
        "text": pa.array(texts, pa.string()),
    })
    # build the segment IN-PROCESS (monkeypatched constants don't reach Ray
    # worker processes), then run the shared finalize tail
    import os
    from opensearch_ray.index.build import IndexManifest, SegmentInfo, _finalize_index
    from opensearch_ray.index.segment import build_segment_table, write_segment

    idx = str(tmp_path / "idx")
    os.makedirs(os.path.join(idx, "segments"), exist_ok=True)
    postings_t, docstore, meta = build_segment_table(tbl, analyzer="transcript")
    write_segment(os.path.join(idx, "segments", "seg-00000"), postings_t,
                  docstore, meta)
    manifest = IndexManifest(
        index_dir=idx,
        segments=[SegmentInfo(seg_id=0, path="inproc", doc_count=meta["doc_count"],
                              sum_dl=meta["sum_dl"], doc_base=0,
                              vocab=meta["vocab"])],
        total_docs=meta["doc_count"], sum_dl=meta["sum_dl"],
        analyzer="transcript", num_buckets=2)
    _finalize_index(manifest, hot_df_threshold=50, merge=True,
                    materialize_postings=True)
    s = Searcher(idx)
    post = s.postings(["common"])["common"]
    assert post.num_rows >= 10  # really split into many chunks
    oracle = BruteForceOracle(tbl, analyzer="transcript")
    for q in ["common", "common w01", "w01 w02 common", "w00 w29"]:
        got = [(h.docid, h.score) for h in s.search(q, k=10)]
        want = oracle.search(q, k=10)
        assert got == want, q
        # large k too (pruning disabled region)
        got_all = [(h.docid, h.score) for h in s.search(q, k=1000)]
        assert got_all == oracle.search(q, k=1000), q
