"""Property-based DSL bool-query algebra: random bool trees over a small
indexed corpus must equal brute-force set algebra over per-doc token sets."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from opensearch_ray.index.build import build_index
from opensearch_ray.search import Searcher
from opensearch_ray.search import dsl

_WORDS = ["alpha", "beta", "gamma", "delta", "zeta", "eta"]


@pytest.fixture(scope="module")
def small(tmp_path_factory):
    rng = np.random.default_rng(11)
    texts = [" ".join(rng.choice(_WORDS, size=rng.integers(1, 6)))
             for _ in range(48)]
    d = tmp_path_factory.mktemp("dslprop")
    tbl = pa.table({
        "conv_id": [f"c{i:04d}" for i in range(len(texts))],
        "turn_idx": pa.array([0] * len(texts), pa.int32()),
        "text": pa.array(texts, pa.string()),
    })
    corpus = d / "corpus"
    os.makedirs(corpus)
    pq.write_table(tbl, str(corpus / "part-0.parquet"))
    m = build_index(str(corpus), str(d / "idx"), analyzer="whitespace",
                    num_buckets=2)
    s = Searcher(m.index_dir)
    toksets = {}
    full = s.fetch(list(range(s.N)), columns=["text"])
    for r in full.to_pylist():
        toksets[r["_docid"]] = set((r["text"] or "").split())
    return s, toksets


_leaf = st.sampled_from(_WORDS).map(lambda w: {"term": {"text": w}})


def _bool_trees(children):
    return st.fixed_dictionaries({
        "must": st.lists(children, max_size=2),
        "should": st.lists(children, max_size=2),
        "must_not": st.lists(children, max_size=1),
    }).map(lambda b: {"bool": {k: v for k, v in b.items() if v}})


_query = st.recursive(_leaf, _bool_trees, max_leaves=8)


def _eval_brute(q, toksets, all_ids):
    (kind, body), = q.items()
    if kind == "term":
        w = body["text"]
        return {d for d, ts in toksets.items() if w in ts}
    must = [_eval_brute(c, toksets, all_ids) for c in body.get("must", [])]
    should = [_eval_brute(c, toksets, all_ids)
              for c in body.get("should", [])]
    nots = [_eval_brute(c, toksets, all_ids)
            for c in body.get("must_not", [])]
    if not (must or should or nots):
        return set(all_ids)  # clause-less bool == match_all
    if must:
        base = set.intersection(*must)
        # with must present, should is optional (msm defaults to 0)
    elif should:
        base = set.union(*should)  # msm defaults to 1
    else:
        base = set(all_ids)
    for n in nots:
        base -= n
    return base


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=_query)
def test_dsl_bool_matches_brute_force(small, q):
    s, toksets = small
    got = set(dsl.query_docs(s, q).tolist())
    want = _eval_brute(q, toksets, list(toksets))
    assert got == want, (q, sorted(got), sorted(want))
