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
