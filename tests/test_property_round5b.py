"""Property tests for the second round-5 feature batch: field-alias
resolution, bulk op algebra, Java date-pattern rendering."""

import json

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from opensearch_ray.mapper import resolve_field_aliases
from opensearch_ray.sources.bulk import parse_bulk_lines


_leaf = st.sampled_from(["term", "match", "range", "prefix", "wildcard"])
_field = st.sampled_from(["alpha", "beta", "gamma", "delta"])


@st.composite
def _bodies(draw):
    def clause():
        return {draw(_leaf): {draw(_field): "v"}}
    body = {"query": {"bool": {
        "must": [clause() for _ in range(draw(st.integers(0, 3)))],
        "filter": [clause() for _ in range(draw(st.integers(0, 2)))]}},
        "sort": draw(st.lists(
            st.one_of(_field, st.just("_doc"),
                      st.builds(lambda f: {f: "asc"}, _field)),
            max_size=3)),
        "aggs": {"a": {"terms": {"field": draw(_field)}}},
        "_source": [draw(_field)]}
    return body


@given(_bodies())
@settings(max_examples=60, deadline=None)
def test_alias_resolution_properties(body):
    """Identity under {}, idempotency, and original-body immutability."""
    aliases = {"alpha": "real_a", "beta": "real_b"}
    snapshot = json.loads(json.dumps(body))
    assert resolve_field_aliases(body, {}) == body
    once = resolve_field_aliases(body, aliases)
    assert resolve_field_aliases(once, aliases) == once  # idempotent
    assert body == snapshot  # pure function
    # _source is never rewritten
    assert once["_source"] == body["_source"]
    # no alias name survives in leaf-query field positions
    blob = json.dumps(once["query"]) + json.dumps(once["sort"])
    assert '"alpha"' not in blob and '"beta"' not in blob


_ops = st.sampled_from(["index", "create", "update", "delete"])


@given(st.lists(st.tuples(st.integers(0, 3), _ops,
                          st.integers(0, 100)), max_size=25))
@settings(max_examples=80, deadline=None)
def test_bulk_algebra_matches_simulator(ops):
    """parse_bulk_lines + the resolve algebra == a dict simulator."""
    lines, sim = [], {}
    for did, op, val in ops:
        lines.append(json.dumps({op: {"_id": did}}))
        if op != "delete":
            doc = {"v": val} if op != "update" else {"doc": {"v": val}}
            lines.append(json.dumps(doc))
        if op == "index":
            sim[did] = {"v": val}
        elif op == "create":
            sim.setdefault(did, {"v": val})
        elif op == "update":
            if did in sim:
                sim[did] = {**sim[did], "v": val}
        else:
            sim.pop(did, None)
    df = parse_bulk_lines(lines)
    got = {}
    if len(df):
        for _id, g in df.groupby("_id", sort=False):
            doc, exists = None, False
            for op, d in zip(g["_op"], g["_doc"]):
                if op == "delete":
                    doc, exists = None, False
                elif op == "create":
                    if not exists:
                        doc, exists = d, True
                elif op == "index":
                    doc, exists = d, True
                elif op == "update" and exists:
                    doc = {**doc, **d}
            if doc is not None:
                got[int(_id)] = doc
    assert got == sim


@given(st.integers(0, 2_000_000_000))
@settings(max_examples=60, deadline=None)
def test_format_datetimes_epoch_and_pattern(epoch_s):
    from opensearch_ray.search.dsl import _format_datetimes
    ts = np.array([epoch_s], dtype="datetime64[s]").astype("datetime64[us]")
    assert _format_datetimes(ts, "epoch_second") == [epoch_s]
    assert _format_datetimes(ts, "epoch_millis") == [epoch_s * 1000]
    got = _format_datetimes(ts, "yyyy-MM-dd'T'HH:mm:ss")[0]
    assert got == pd.Timestamp(epoch_s, unit="s").strftime(
        "%Y-%m-%dT%H:%M:%S")


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
@settings(max_examples=80, deadline=None)
def test_unsigned_long_encode_order_isomorphism(vals):
    """Shifted-long encoding is an order isomorphism uint64 -> int64 and
    decode is its exact inverse."""
    from opensearch_ray.mapper import (unsigned_long_decode,
                                       unsigned_long_encode)
    u = np.array(vals, dtype=np.uint64)
    enc = unsigned_long_encode(u)
    assert (unsigned_long_decode(enc) == u).all()
    order_u = np.argsort(u, kind="stable")
    order_e = np.argsort(enc, kind="stable")
    assert (u[order_u] == u[order_e]).all()


@given(st.text(alphabet="ab", min_size=0, max_size=8),
       st.text(alphabet="ab", min_size=0, max_size=8))
@settings(max_examples=120, deadline=None)
def test_osa_distance_properties(a, b):
    """OSA <= plain Levenshtein; both are symmetric; zero iff equal."""
    from opensearch_ray.search.features import _levenshtein
    BIG = 99
    lv = _levenshtein(a, b, BIG)
    osa = _levenshtein(a, b, BIG, transpositions=True)
    assert osa <= lv
    assert osa == _levenshtein(b, a, BIG, transpositions=True)
    assert (osa == 0) == (a == b)


@given(st.lists(st.sampled_from(["aa", "ab", "ba", "abc", "a", "b"]),
                min_size=1, max_size=12))
@settings(max_examples=40, deadline=None)
def test_bpe_piece_roundtrip(words):
    """Concatenating a word's BPE pieces (end sentinel stripped) always
    reconstructs the word, whatever merges were learned."""
    from opensearch_ray.textstats.bpe import _EOW, _learn_merges, apply_bpe
    wf = {}
    for w in words:
        wf[w] = wf.get(w, 0) + 1
    merges = _learn_merges(wf, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in wf:
        joined = "".join(apply_bpe(w, ranks))
        assert joined == w + _EOW
