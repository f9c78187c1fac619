"""Flagship pipeline: synthesize/ingest transcripts -> build inverted index ->
run the reference query set -> return hits (the driver's entry() pipeline)."""

from __future__ import annotations

import os
import pandas as pd

from ..index.build import build_index, load_manifest
from ..search import Searcher
from ..sources import reference_queries, write_transcript_corpus


def flagship_pipeline(work_dir: str = "/tmp/opensearch_ray_flagship",
                      n_turns: int = 2000, n_files: int = 4,
                      num_buckets: int = 8, hot_df_threshold: int = 1000,
                      force: bool = False) -> pd.DataFrame:
    """Build (resume-aware) and search; returns one row per (query, hit):
    (query_id, rank, docid, score, conv_id, turn_idx, text)."""
    corpus = os.path.join(work_dir, "corpus")
    idx = os.path.join(work_dir, "index")
    write_transcript_corpus(corpus, n_turns=n_turns, n_files=n_files, force=force)
    if force or not os.path.exists(os.path.join(idx, "manifest.json")):
        manifest = build_index(corpus, idx, analyzer="transcript",
                               num_buckets=num_buckets,
                               hot_df_threshold=hot_df_threshold)
    else:
        manifest = load_manifest(idx)
    searcher = Searcher(idx)
    rows = []
    for q in reference_queries():
        hits = searcher.search(q["query_text"], k=q["k"])
        if not hits:
            continue
        fetched = searcher.fetch([h.docid for h in hits])
        by_id = {r["_docid"]: r for r in fetched.to_pylist()}
        for rank, h in enumerate(hits, 1):
            r = by_id[h.docid]
            rows.append({
                "query_id": q["query_id"], "rank": rank, "docid": h.docid,
                "score": h.score, "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"], "text": r["text"],
            })
    return pd.DataFrame(rows)
