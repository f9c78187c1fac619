"""Keyword doc-values filters + hash-partitioned dataset build mode."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from opensearch_ray.index.build import build_index_from_dataset
from opensearch_ray.search import BruteForceOracle, Searcher


def test_filtered_search_matches_postfilter(built_index, transcript_corpus):
    corpus_dir, files = transcript_corpus
    full = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
    roles = full.column("role").to_pylist()
    s = Searcher(built_index.index_dir)
    unfiltered = s.search("bace cedi", k=10**6)
    want = [(h.docid, h.score) for h in unfiltered if roles[h.docid] == "user"][:10]
    got = [(h.docid, h.score) for h in
           s.search("bace cedi", k=10, filters={"role": "user"})]
    assert got == want
    # list-valued filter
    want2 = [(h.docid, h.score) for h in unfiltered
             if roles[h.docid] in ("user", "system")][:10]
    got2 = [(h.docid, h.score) for h in
            s.search("bace cedi", k=10, filters={"role": ["user", "system"]})]
    assert got2 == want2
    # filter with no matches
    assert s.search("bace", k=10, filters={"role": "nosuchrole"}) == []


def test_build_from_dataset_rank_identity(transcript_corpus, tmp_path):
    """The hash-partition build mode must produce the same top-k RANKING as
    the oracle over the same corpus (doc ids differ — partition order — so we
    compare (conv_id, turn_idx, score) sequences)."""
    corpus_dir, files = transcript_corpus
    full = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
    ds = rd.read_parquet(sorted(files))
    m = build_index_from_dataset(ds, str(tmp_path / "idx_ds"),
                                 partition_key="conv_id", num_partitions=4,
                                 analyzer="transcript", hot_df_threshold=400)
    assert m.total_docs == full.num_rows
    s = Searcher(m.index_dir)
    oracle = BruteForceOracle(full, analyzer="transcript")
    conv = full.column("conv_id").to_pylist()
    turn = full.column("turn_idx").to_pylist()

    for q in ["bace cedi", "haki kilo", "quiquixo"]:
        hits = s.search(q, k=10)
        want = oracle.search(q, k=10)
        fetched = s.fetch([h.docid for h in hits]).to_pylist()
        by_id = {r["_docid"]: r for r in fetched}
        got_keys = {( by_id[h.docid]["conv_id"], by_id[h.docid]["turn_idx"],
                      round(h.score, 5)) for h in hits}
        want_keys = {(conv[d], turn[d], round(sc, 5)) for d, sc in want}
        assert got_keys == want_keys, q


def test_build_from_dataset_deterministic(transcript_corpus, tmp_path):
    corpus_dir, files = transcript_corpus
    ds1 = rd.read_parquet(sorted(files))
    ds2 = rd.read_parquet(sorted(files))
    m1 = build_index_from_dataset(ds1, str(tmp_path / "a"), num_partitions=4,
                                  analyzer="transcript")
    m2 = build_index_from_dataset(ds2, str(tmp_path / "b"), num_partitions=4,
                                  analyzer="transcript")
    assert [(s.seg_id, s.doc_count, s.sum_dl) for s in m1.segments] == \
           [(s.seg_id, s.doc_count, s.sum_dl) for s in m2.segments]
