"""parent-join (has_child / has_parent / parent_id) + inner_hits.

Reference semantics: modules/parent-join HasChildQueryBuilder /
HasParentQueryBuilder / ParentIdQueryBuilder; InnerHitsPhase for the
inner-hit expansion; conformance 20_parent_child.yml shapes.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray


@pytest.fixture(scope="module")
def pj_ds():
    # parents: conv 1..4; children: turns with (conv, idx, score)
    parents = pd.DataFrame({
        "join_key": [1, 2, 3, 4],
        "rel": "conv",
        "idx": [None] * 4,
        "val": [None] * 4,
    })
    children = pd.DataFrame({
        "join_key": [1, 1, 1, 2, 2, 3, 9],  # 9 = orphan child
        "rel": "turn",
        "idx": [1, 2, 3, 1, 2, 1, 1],
        "val": [5.0, 7.0, 1.0, 9.0, 2.0, 8.0, 99.0],
    })
    both = pd.concat([parents, children], ignore_index=True)
    both["idx"] = both["idx"].astype("float64")
    both["val"] = both["val"].astype("float64")
    return ray.data.from_pandas(both)


def test_has_child_counts_and_bounds(pj_ds):
    from opensearch_ray.parent_join import has_child_filter
    # children with val >= 5: conv1 x2 (5,7), conv2 x1 (9), conv3 x1 (8)
    out = has_child_filter(pj_ds, "rel", "conv", "turn", "join_key",
                           lambda c: pc.greater_equal(c.column("val"), 5.0),
                           min_children=2, B=4).to_pandas()
    assert sorted(out["join_key"]) == [1]
    out1 = has_child_filter(pj_ds, "rel", "conv", "turn", "join_key",
                            lambda c: pc.greater_equal(c.column("val"), 5.0),
                            min_children=1, max_children=1,
                            B=4).to_pandas()
    assert sorted(out1["join_key"]) == [2, 3]  # orphan child 9 never counts


def test_has_child_score_modes(pj_ds):
    from opensearch_ray.parent_join import has_child_filter

    def run(mode):
        out = has_child_filter(
            pj_ds, "rel", "conv", "turn", "join_key",
            lambda c: pc.greater_equal(c.column("val"), 5.0),
            score_mode=mode,
            child_score_fn=lambda c: c.column("val")
            .to_numpy(zero_copy_only=False), B=4).to_pandas()
        return dict(zip(out["join_key"], out["_score"]))

    assert run("sum") == {1: 12.0, 2: 9.0, 3: 8.0}
    assert run("max") == {1: 7.0, 2: 9.0, 3: 8.0}
    assert run("min") == {1: 5.0, 2: 9.0, 3: 8.0}
    assert run("avg") == {1: 6.0, 2: 9.0, 3: 8.0}


def test_has_parent_and_parent_id(pj_ds):
    from opensearch_ray.parent_join import has_parent_filter, parent_id_filter
    out = has_parent_filter(pj_ds, "rel", "conv", "turn", "join_key",
                            lambda p: pc.less_equal(p.column("join_key"), 2),
                            B=4).to_pandas()
    got = sorted(zip(out["join_key"], out["idx"]))
    assert got == [(1, 1.0), (1, 2.0), (1, 3.0), (2, 1.0), (2, 2.0)]
    pid = parent_id_filter(pj_ds, "rel", "turn", "join_key", 2).to_pandas()
    assert sorted(pid["idx"]) == [1.0, 2.0]
    assert set(pid["rel"]) == {"turn"}


def test_has_child_inner_hits(pj_ds):
    from opensearch_ray.parent_join import has_child_inner_hits
    out = has_child_inner_hits(
        pj_ds, "rel", "conv", "turn", "join_key",
        lambda c: pc.greater_equal(c.column("val"), 1.0),
        inner_sort_col="idx", size=2, min_children=2, B=4).to_pandas()
    got = sorted(zip(out["join_key"], out["idx"], out["_inner_rank"]))
    # conv1 has 3 matches -> first 2 by idx; conv2 has 2; conv3 only 1
    assert got == [(1, 1.0, 1), (1, 2.0, 2), (2, 1.0, 1), (2, 2.0, 2)]


def test_nested_inner_hits_sorted_and_list_order():
    from opensearch_ray.nested import nest_children, nested_inner_hits
    parents = ray.data.from_arrow(pa.table(
        {"pk": pa.array([10, 20], pa.int64()),
         "tag": pa.array(["a", "b"], pa.string())}))
    children = ray.data.from_arrow(pa.table({
        "ck": pa.array([10, 10, 10, 20], pa.int64()),
        "pos": pa.array([3, 1, 2, 7], pa.int64()),
        "v": pa.array([1.0, 5.0, 9.0, 2.0], pa.float64())}))
    nested = nest_children(parents, children, "pk", "ck", ["ck", "pos", "v"],
                           list_col="ch", B=2)
    out = nested_inner_hits(
        nested, "ch", lambda c: pc.greater(c.column("v"), 0.0),
        parent_cols=["pk"], size=2, sort_col="pos").to_pandas()
    got = sorted(zip(out["pk"], out["pos"], out["_inner_rank"]))
    assert got == [(10, 1, 1), (10, 2, 2), (20, 7, 1)]
    # without sort_col: list order, still one row per (parent, rank)
    out2 = nested_inner_hits(
        nested, "ch", lambda c: pc.greater(c.column("v"), 4.0),
        parent_cols=["pk"], size=3).to_pandas()
    assert sorted(zip(out2["pk"], out2["v"])) == [(10, 5.0), (10, 9.0)]
    assert sorted(out2["_inner_rank"]) == [1, 2]


def test_collapse_inner_hits(built_index):
    from opensearch_ray.search import Searcher
    from opensearch_ray.search.features import (collapse_inner_hits,
                                                collapse_search)
    s = Searcher(built_index.index_dir)
    out = collapse_inner_hits(s, "bace cedi", "role", k=3, inner_size=2)
    # rank-1 rows reproduce collapse_search exactly
    best = out[out["_inner_rank"] == 1]
    ref = collapse_search(s, "bace cedi", "role", k=3,
                          candidate_window=10 ** 6)
    assert list(best["role"]) == list(ref["role"])
    assert list(best["_docid"]) == list(ref["_docid"])
    # per-group: ranks contiguous from 1, scores non-increasing
    for _, g in out.groupby("role"):
        g = g.sort_values("_inner_rank")
        assert list(g["_inner_rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["score"].to_numpy()) <= 1e-12).all()


def test_completion_contexts_and_fuzzy():
    import pyarrow as pa
    import ray
    from opensearch_ray.search.completion import CompletionIndex
    t = pa.table({
        "text": pa.array(["stream stream window", "stream merge",
                          "window stress", "stripe stream"]),
        "cat": pa.array(["a", "a", "b", "b"])})
    ci = CompletionIndex.build(ray.data.from_arrow(t), "text", "cat",
                               analyzer="standard")
    # context filter: only cat=a docs count
    out = ci.complete("st", size=5, contexts=["a"])
    assert list(zip(out["suggestion"], out["df"])) == [("stream", 2)]
    # both contexts: stream df=3 (distinct docs), stress 1, stripe 1
    out2 = ci.complete("st", size=5, contexts=["a", "b"])
    assert list(zip(out2["suggestion"], out2["df"])) == [
        ("stream", 3), ("stress", 1), ("stripe", 1)]
    # fuzzy: 'strem' (typo) still finds stream; exact prefix finds nothing
    assert ci.complete("strem", size=5).empty
    fz = ci.complete("strem", size=5, fuzzy_edits=1)
    assert "stream" in list(fz["suggestion"])
    # short inputs stay exact (min_fuzzy_length)
    assert ci.complete("xy", size=5, fuzzy_edits=1).empty


def test_children_and_parent_aggs():
    """children agg: child doc_count + metric per parent-field bucket;
    parent agg: DISTINCT parents per bucket (each parent once no matter
    how many children matched); orphan children drop."""
    import pyarrow.compute as pc
    from opensearch_ray.parent_join import children_agg, parent_agg
    parents = pd.DataFrame({"join_key": [1, 2, 3, 4], "rel": "conv",
                            "grp": ["a", "a", "b", "b"],
                            "val": [None] * 4})
    children = pd.DataFrame({
        "join_key": [1, 1, 2, 3, 9],  # 9 = orphan
        "rel": "turn", "grp": [None] * 5,
        "val": [5.0, 7.0, 9.0, 8.0, 99.0]})
    ds = ray.data.from_pandas(
        pd.concat([parents, children], ignore_index=True))
    out = children_agg(ds, "rel", "conv", "turn", "join_key", "grp",
                       value_col="val").set_index("key")
    assert out.loc["a", "doc_count"] == 3 and out.loc["b", "doc_count"] == 1
    assert out.loc["a", "sum"] == 21.0 and out.loc["b", "sum"] == 8.0
    par = parent_agg(
        ds, "rel", "conv", "turn", "join_key", "grp",
        child_predicate=lambda c: pc.greater_equal(c.column("val"), 5.0)
    ).set_index("key")
    # conv 1 matched twice but counts ONCE; conv 4 has no children
    assert par.loc["a", "doc_count"] == 2
    assert par.loc["b", "doc_count"] == 1
