"""as-of/range/hash joins, windowed aggregates, search-phase features."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from opensearch_ray.joins import asof_join, hash_join, range_join
from opensearch_ray.streaming import session_window, sliding_window, tumbling_window
from opensearch_ray.search import Searcher
from opensearch_ray.search.features import (
    collapse_search, decay_exp, decay_gauss, decay_linear, function_score_topk,
    highlight, rescore, search_after_page, term_suggest, terms_lookup_filter,
    _levenshtein,
)


# ------------------------------------------------------------------- joins

def test_asof_join_matches_merge_asof(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    left = ev[ev["event_type"] == "purchase"][["user_id", "ts", "event_id"]]
    right = ev[ev["event_type"] == "signup"][["user_id", "ts", "value"]]
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key_col="user_id", ts_col="ts").to_pandas()
    want = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                         on="ts", by="user_id", direction="backward",
                         suffixes=("", "_asof"))
    got_s = got.sort_values("event_id").reset_index(drop=True)
    want_s = want.sort_values("event_id").reset_index(drop=True)
    assert len(got_s) == len(want_s)
    pd.testing.assert_series_equal(got_s["value"], want_s["value"],
                                   check_names=False)


def test_hash_join_matches_pandas(sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    cust = cust.rename(columns={"c_custkey": "o_custkey"})
    got = hash_join(rd.from_pandas(orders), rd.from_pandas(cust),
                    key_col="o_custkey").to_pandas()
    want = orders.merge(cust, on="o_custkey")
    assert len(got) == len(want)
    assert got["o_totalprice"].sum() == pytest.approx(want["o_totalprice"].sum())


def test_range_join():
    left = pd.DataFrame({"k": ["a", "a", "b"], "ts": [5, 15, 5], "lid": [1, 2, 3]})
    right = pd.DataFrame({"k": ["a", "a", "b"], "lo": [0, 10, 10],
                          "hi": [10, 20, 20], "rid": [10, 20, 30]})
    got = range_join(rd.from_pandas(left), rd.from_pandas(right), key_col="k",
                     left_ts="ts", right_lo="lo", right_hi="hi").to_pandas()
    pairs = set(zip(got["lid"], got["rid"]))
    assert pairs == {(1, 10), (2, 20)}


# --------------------------------------------------------------- streaming

def test_tumbling_window(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    got = tumbling_window(rd.from_pandas(ev), "event_type", "ts", "value", "1h")
    ev2 = ev.copy()
    ev2["w"] = ev2["ts"].dt.floor("1h")
    want = (ev2.groupby(["event_type", "w"])
            .agg(doc_count=("value", "size"), value_sum=("value", "sum")))
    assert len(got) == len(want)
    merged = got.merge(want.reset_index(), left_on=["event_type", "window_start"],
                       right_on=["event_type", "w"], suffixes=("", "_w"))
    assert (merged["doc_count"] == merged["doc_count_w"]).all()
    assert np.allclose(merged["value_sum"], merged["value_sum_w"])


def test_sliding_window_counts(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas().head(200)
    got = sliding_window(rd.from_pandas(ev), "event_type", "ts", "value",
                         size="2h", slide="1h")
    # every event must appear in exactly size/slide = 2 windows
    assert got["doc_count"].sum() == 2 * len(ev)


def test_session_window():
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                         "2024-01-01 01:30", "2024-01-01 01:40",
                         "2024-01-01 05:00"])
    df = pd.DataFrame({"u": [1] * 5, "ts": ts, "v": [1.0] * 5})
    got = session_window(rd.from_pandas(df), "u", "ts", "v", gap="30min")
    assert got["doc_count"].tolist() == [2, 2, 1]


# ----------------------------------------------------------- search extras

@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(built_index.index_dir)


def test_rescore(searcher):
    base = searcher.search("bace cedi", k=5)

    def by_turn(fetched: pa.Table) -> np.ndarray:
        return fetched.column("turn_idx").to_numpy(zero_copy_only=False).astype(float)

    out = rescore(searcher, "bace cedi", window_size=50, k=5, rescore_fn=by_turn,
                  query_weight=1.0, rescore_query_weight=0.001)
    assert len(out) == 5
    assert out[0].score >= out[-1].score
    # with zero rescore weight the base ranking is preserved
    same = rescore(searcher, "bace cedi", window_size=50, k=5, rescore_fn=by_turn,
                   rescore_query_weight=0.0)
    assert [h.docid for h in same] == [h.docid for h in base]


def test_collapse_search(searcher):
    out = collapse_search(searcher, "bace cedi", "conv_id", k=5)
    assert len(out) <= 5
    assert out["conv_id"].is_unique
    assert (out["score"].values[:-1] >= out["score"].values[1:]).all()


def test_highlight(searcher):
    out = highlight(searcher, "bace", k=5)
    assert len(out) == 5
    assert all("<em>" in s for s in out["snippet"])
    tagged = out["snippet"].iloc[0]
    inner = tagged.split("<em>")[1].split("</em>")[0].lower()
    assert "bace" == inner


def test_highlight_unified(searcher):
    from opensearch_ray.search.features import highlight_unified
    out = highlight_unified(searcher, "bace cedi", k=5,
                            number_of_fragments=2, fragment_char_size=60)
    assert len(out) == 5
    hits = {h.docid for h in searcher.search("bace cedi", k=5)}
    assert set(out["_docid"]) == hits
    for snip in out["snippet"]:
        # every tagged span is a query term; at least one term is tagged
        spans = [s.split("</em>")[0] for s in snip.split("<em>")[1:]]
        assert spans and all(t in ("bace", "cedi") for t in spans)
        # the best passage is chosen: fragments respect the size budget
        for frag in snip.split(" ... "):
            assert len(frag) <= 60 + len("<em></em>") * max(1, len(spans)) + 10


def test_term_suggest(searcher):
    out = term_suggest(searcher, "bacce", max_edits=2, size=5)
    assert "bace" in out["suggestion"].tolist()
    d = dict(zip(out["suggestion"], out["distance"]))
    assert d["bace"] == 1
    assert _levenshtein("kitten", "sitting", 3) == 3
    assert _levenshtein("abc", "abc", 2) == 0
    assert _levenshtein("abc", "xyzzy", 2) == 3  # clamped to maxd+1


def test_search_after_pages_are_disjoint_and_ordered(searcher):
    p1 = searcher.search("bace", k=5)
    p2 = search_after_page(searcher, "bace", page_size=5,
                           after=(p1[-1].score, p1[-1].docid))
    all10 = searcher.search("bace", k=10)
    assert [h.docid for h in p1] + [h.docid for h in p2] == [h.docid for h in all10]


def test_decay_functions():
    v = np.array([0.0, 5.0, 10.0, 20.0])
    g = decay_gauss(v, origin=0.0, scale=10.0)
    assert g[0] == 1.0 and abs(g[2] - 0.5) < 1e-9 and g[3] < g[2]
    e = decay_exp(v, origin=0.0, scale=10.0)
    assert e[0] == 1.0 and abs(e[2] - 0.5) < 1e-9
    l = decay_linear(v, origin=0.0, scale=10.0)
    assert l[0] == 1.0 and abs(l[2] - 0.5) < 1e-9 and l[3] == 0.0


def test_function_score_topk(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    out = function_score_topk(
        ds, lambda t: t.column("value").to_numpy(zero_copy_only=False),
        id_col="event_id", k=5)
    pdf = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    want = pdf.sort_values(["value", "event_id"], ascending=[False, True]).head(5)
    assert out["event_id"].tolist() == want["event_id"].tolist()


def test_terms_lookup_filter(sf_dir):
    import pyarrow.compute as pc
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    parts = rd.read_parquet(f"{sf_dir}/part.parquet")
    got = terms_lookup_filter(
        li, "l_partkey", parts, "p_partkey",
        lambda t: pc.greater(t.column("p_size"), 40)).count()
    li_pdf = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    p_pdf = pq.read_table(f"{sf_dir}/part.parquet").to_pandas()
    keys = set(p_pdf[p_pdf["p_size"] > 40]["p_partkey"])
    assert got == li_pdf["l_partkey"].isin(keys).sum()


def test_training_data_pipeline(tmp_path, sf_dir):
    from opensearch_ray.pipelines import prepare_training_data
    out = str(tmp_path / "prep")
    s1 = prepare_training_data(f"{sf_dir}/documents.parquet", out,
                               min_quality=0.0, near_dup_threshold=0.8,
                               n_shards=4)
    assert s1["input_rows"] == 500
    assert 0 < s1["kept_rows"] <= 500
    assert s1["shards_written"] >= 1 and not s1["resumed"]
    reread = rd.read_parquet(out).to_pandas()
    assert len(reread) == s1["kept_rows"]
    assert reread["doc_id"].is_unique
    assert {"quality", "predicted_lang", "whitespace_tokens"} <= set(reread.columns)
    # resume: second call short-circuits via the manifest
    s2 = prepare_training_data(f"{sf_dir}/documents.parquet", out)
    assert s2["resumed"] and s2["kept_rows"] == s1["kept_rows"]


def test_more_like_this(searcher):
    from opensearch_ray.search.features import more_like_this
    seed_hits = searcher.search("bace cedi", k=1)
    src = seed_hits[0].docid
    out = more_like_this(searcher, src, k=5)
    assert 1 <= len(out) <= 5
    assert src not in [h.docid for h in out]
    assert all(out[i].score >= out[i + 1].score for i in range(len(out) - 1))


def test_cli(tmp_path, transcript_corpus):
    import json as _json
    import subprocess, sys, os
    corpus_dir, _ = transcript_corpus
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx = str(tmp_path / "cli_idx")
    r = subprocess.run([sys.executable, "-m", "opensearch_ray", "build",
                        corpus_dir, idx, "--buckets", "4"],
                       capture_output=True, text=True, cwd=repo, env=env,
                       timeout=240)
    assert r.returncode == 0, r.stderr[-800:]
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    assert info["total_docs"] == 2000
    r = subprocess.run([sys.executable, "-m", "opensearch_ray", "search",
                        idx, "bace cedi", "-k", "3", "--fetch"],
                       capture_output=True, text=True, cwd=repo, env=env,
                       timeout=120)
    assert r.returncode == 0, r.stderr[-800:]
    hits = _json.loads(r.stdout)
    assert len(hits) == 3 and hits[0]["score"] >= hits[-1]["score"]
    r = subprocess.run([sys.executable, "-m", "opensearch_ray", "analyze",
                        "The Quick Fox", "--analyzer", "transcript"],
                       capture_output=True, text=True, cwd=repo, env=env,
                       timeout=60)
    assert _json.loads(r.stdout)["tokens"] == ["quick", "fox"]
    r = subprocess.run([sys.executable, "-m", "opensearch_ray", "stats", idx],
                       capture_output=True, text=True, cwd=repo, env=env,
                       timeout=60)
    st = _json.loads(r.stdout)
    assert st["total_docs"] == 2000 and st["bytes"]["segments"] > 0


def test_nested_block_join(sf_dir):
    import pyarrow.compute as pc
    from opensearch_ray.nested import (nest_children, nested_filter,
                                       nested_flat_agg)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])
    items = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])
    nested = nest_children(orders, items, "o_orderkey", "l_orderkey",
                           ["l_orderkey", "l_quantity"], list_col="items")
    got = nested.to_pandas()
    import pandas as pd
    o_pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li_pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    assert len(got) == len(o_pdf)
    # child counts per parent match a plain groupby
    want_counts = li_pdf.groupby("l_orderkey").size()
    got_counts = {k: len(v) for k, v in zip(got["o_orderkey"], got["items"])}
    for k, n in want_counts.items():
        assert got_counts[k] == n
    # nested_filter == EXISTS semantics
    flt = nested_filter(nested, "items",
                        lambda c: pc.greater(c.column("l_quantity"), 49.0))
    got_keys = sorted(flt.to_pandas()["o_orderkey"])
    want_keys = sorted(li_pdf[li_pdf["l_quantity"] > 49.0]["l_orderkey"]
                       .unique())
    assert got_keys == want_keys
    # flatten returns every child with parent fields attached
    flat = nested_flat_agg(nested, "items", parent_cols=["o_orderstatus"])
    assert flat.count() == len(li_pdf)


def test_percolator(sf_dir):
    from opensearch_ray.percolator import Percolator
    import pandas as pd
    p = Percolator(analyzer="transcript")
    p.register("a", must=["hash", "join"])
    p.register("b", should=["stream", "window"], minimum_should_match=2)
    p.register("c", phrase="hash join")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = p.percolate(ds).to_pandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from opensearch_ray.analysis import get_analyzer
    an = get_analyzer("transcript")
    q_toks, q_pos = an.analyze("hash join")
    q_deltas = [p - q_pos[0] for p in q_pos]
    want = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks, poss = an.analyze(text or "")
        ts = set(toks)
        if {"hash", "join"} <= ts:
            want.append((did, "a"))
        if len({"stream", "window"} & ts) >= 2:
            want.append((did, "b"))
        # phrase check is POSITION-aware (match_phrase parity): "hash the
        # join" must not match phrase "hash join" — a stopword leaves a gap
        pos_of = {}
        for t, p in zip(toks, poss):
            pos_of.setdefault(t, []).append(p)
        sets = [set(pos_of.get(t, ())) for t in q_toks]
        if all(sets) and any(
                all(s0 + dp in ps for dp, ps in zip(q_deltas, sets))
                for s0 in pos_of.get(q_toks[0], ())):
            want.append((did, "c"))
    got = sorted(zip(out["doc_id"], out["query_id"]))
    assert got == sorted(want)
    # stopword-gap regression: "hash the join" analyzes to positions [0, 2]
    # and must NOT percolate as phrase "hash join" (positions [0, 1])
    p2 = Percolator(analyzer="transcript")
    p2.register("ph", phrase="hash join")
    ds2 = rd.from_items([{"doc_id": 1, "text": "hash the join"},
                         {"doc_id": 2, "text": "hash join now"}])
    out2 = p2.percolate(ds2).to_pandas()
    assert sorted(zip(out2["doc_id"], out2["query_id"])) == [(2, "ph")]


def test_nested_field_sort(sf_dir):
    """nested context on field sort (FieldSortBuilder.nestedSort): parents
    ordered by min/max over the FILTERED child block, missing last."""
    import pandas as pd
    import pyarrow.compute as pc
    from opensearch_ray.nested import nest_children, nested_field_sort

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])
    items = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity",
                                     "l_discount"])
    nested = nest_children(orders, items, "o_orderkey", "l_orderkey",
                           ["l_orderkey", "l_quantity", "l_discount"],
                           list_col="items")
    got = nested_field_sort(
        nested, "items", "l_quantity",
        predicate=lambda c: pc.greater(c.column("l_discount"), 0.05),
        mode="min", order="asc").to_pandas()

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    key = (li[li.l_discount > 0.05].groupby("l_orderkey")["l_quantity"]
           .min())
    want = o[["o_orderkey"]].copy()
    want["k"] = want.o_orderkey.map(key)
    # asc, missing last; ray's sort has no secondary key here, so compare
    # the KEY sequence (ties are order-free) and the missing placement
    want_keys = np.sort(want.k.fillna(np.inf).to_numpy())
    got_keys = got["_nested_sort"].to_numpy()
    assert np.array_equal(got_keys, want_keys)
    n_missing = int(want.k.isna().sum())
    assert (got_keys[-n_missing:] == np.inf).all() if n_missing else True
    # per-parent key values are exact
    m = dict(zip(got.o_orderkey, got["_nested_sort"]))
    for ok, kv in want.set_index("o_orderkey").k.items():
        assert m[ok] == (kv if not pd.isna(kv) else np.inf)
    # modes: max/sum/avg/median per parent (no filter)
    from opensearch_ray.nested import nested_sort_key
    for mode, fn in [("max", "max"), ("sum", "sum"), ("avg", "mean"),
                     ("median", "median")]:
        ks = nested_sort_key(nested, "items", "l_quantity",
                             mode=mode).to_pandas()
        wk = li.groupby("l_orderkey")["l_quantity"].agg(fn)
        mm = dict(zip(ks.o_orderkey, ks["_nested_sort"]))
        for ok2, kv2 in wk.items():
            assert abs(mm[ok2] - kv2) < 1e-9, (mode, ok2)


def test_training_data_pipeline_full_options(tmp_path, sf_dir):
    """Capstone with the round-5 stages on: decontamination against a
    benchmark parquet, stratified sampling by source, packing sidecar."""
    import pyarrow.parquet as _pq
    import pyarrow.dataset as _pds
    from opensearch_ray.pipelines import prepare_training_data

    # benchmark = 5 docs pulled from the corpus itself (guaranteed hits)
    bench = tmp_path / "bench.parquet"
    t = _pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"])
    _pq.write_table(t.slice(0, 5), str(bench))
    out = str(tmp_path / "td")
    s = prepare_training_data(
        f"{sf_dir}/documents.parquet", out, min_quality=0.0,
        decontaminate_against=str(bench),
        sample_rates={"src5": 0.0, "src6": 0.0},
        sample_stratum_col="source",
        pack_budget=256)
    assert s["kept_rows"] > 0 and not s["resumed"]
    assert s["packed_sequences"] > 0
    import glob as _glob
    kept = _pds.dataset(sorted(_glob.glob(f"{out}/shard=*/*.parquet"))) \
        .to_table(columns=["doc_id", "source"])
    # benchmark docs were removed; only the sampled strata survive
    assert not set(t.column("doc_id").slice(0, 5).to_pylist()) \
        & set(kept.column("doc_id").to_pylist())
    # down-weighted strata are gone; unlisted strata keep (default 1.0)
    assert not {"src5", "src6"} & set(kept.column("source").to_pylist())
    assert "src0" in set(kept.column("source").to_pylist())
    pk = _pds.dataset(f"{out}/_packing").to_table()
    assert set(pk.column("doc_id").to_pylist()) == \
        set(kept.column("doc_id").to_pylist())


def test_cli_resize_and_snapshot(tmp_path, transcript_corpus):
    """forcemerge / split / snapshot subcommands: the ops surface a
    reference admin drives via _forcemerge, _split and _snapshot."""
    import json as _json
    import subprocess, sys, os
    corpus_dir, _ = transcript_corpus
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx = str(tmp_path / "ops_idx")

    def run(*argv, timeout=240):
        r = subprocess.run([sys.executable, "-m", "opensearch_ray", *argv],
                           capture_output=True, text=True, cwd=repo,
                           env=env, timeout=timeout)
        assert r.returncode == 0, r.stderr[-800:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    assert run("build", corpus_dir, idx, "--buckets", "4")[
        "total_docs"] == 2000
    assert run("split", idx, "--factor", "2")["segments"] == 8
    assert run("forcemerge", idx, "--max-segments", "2")["segments"] == 2
    repo_dir = str(tmp_path / "snaprepo")
    run("snapshot", "create", repo_dir, "--index", idx, "--name", "s1")
    assert run("snapshot", "list", repo_dir)["snapshots"] == ["s1"]
    restored = str(tmp_path / "restored")
    run("snapshot", "restore", repo_dir, "--index", restored, "--name", "s1")
    hits = _json.loads(subprocess.run(
        [sys.executable, "-m", "opensearch_ray", "search", restored,
         "bace cedi", "-k", "3"], capture_output=True, text=True,
        cwd=repo, env=env, timeout=120).stdout)
    assert len(hits) == 3


def test_training_data_pipeline_c4(tmp_path, sf_dir):
    """c4_heuristics stage composes with the capstone: schema unchanged,
    kept set is a subset of the non-C4 run."""
    from opensearch_ray.pipelines import prepare_training_data
    base = prepare_training_data(
        f"{sf_dir}/documents.parquet", str(tmp_path / "a"),
        min_quality=0.0, near_dup_threshold=0.8, n_shards=4)
    with_c4 = prepare_training_data(
        f"{sf_dir}/documents.parquet", str(tmp_path / "b"),
        min_quality=0.0, near_dup_threshold=0.8, n_shards=4,
        c4_heuristics=True)
    assert 0 < with_c4["kept_rows"] <= base["kept_rows"]
    a = rd.read_parquet(str(tmp_path / "a")).to_pandas()
    b = rd.read_parquet(str(tmp_path / "b")).to_pandas()
    assert set(b.columns) == set(a.columns)
    assert set(b.doc_id) <= set(a.doc_id)


def test_bulk_ndjson_source(tmp_path, ray_session):
    """_bulk NDJSON source: index/create/delete/update semantics resolve
    in line order per _id; the surviving docs index end-to-end."""
    from opensearch_ray.index.build import build_index_from_dataset
    from opensearch_ray.search import Searcher
    from opensearch_ray.sources import read_bulk_ndjson

    lines = [
        '{"index": {"_id": "a"}}',
        '{"text": "alpha bravo", "n": 1}',
        '{"create": {"_id": "b"}}',
        '{"text": "bravo charlie", "n": 2}',
        '{"create": {"_id": "a"}}',          # loses: a exists
        '{"text": "SHOULD NOT WIN", "n": 99}',
        '{"update": {"_id": "b"}}',
        '{"doc": {"n": 20}}',
        '{"delete": {"_id": "a"}}',
        '{"index": {"_id": "a"}}',           # re-created after delete
        '{"text": "alpha delta", "n": 3}',
        '{"delete": {"_id": "c"}}',          # delete of absent id: no-op
    ]
    f = tmp_path / "bulk.ndjson"
    f.write_text("\n".join(lines) + "\n")
    ds = read_bulk_ndjson(str(f))
    df = ds.to_pandas().sort_values("_id").reset_index(drop=True)
    assert df["_id"].tolist() == ["a", "b"]
    assert df.loc[0, "text"] == "alpha delta" and df.loc[0, "n"] == 3
    assert df.loc[1, "text"] == "bravo charlie" and df.loc[1, "n"] == 20

    idx = str(tmp_path / "idx")
    build_index_from_dataset(ds, idx, partition_key="_id",
                             sort_cols=("_id",), num_partitions=2,
                             num_buckets=2)
    s = Searcher(idx)
    # doc a's original "alpha bravo" was deleted and re-indexed as
    # "alpha delta" — bravo now matches only doc b
    assert {h.docid for h in s.search("bravo", k=5)} \
        == set(s.get_by("_id", "b").column("_docid").to_pylist())
    assert s.count("delta") == 1 and s.count("charlie") == 1
    assert s.count("alpha") == 1  # only the re-created doc a


def test_training_data_pipeline_lm_filter(tmp_path, sf_dir):
    """lm_quality_min stage: docs below the LM threshold drop, the
    lm_score column rides into the output."""
    from opensearch_ray.pipelines import prepare_training_data
    s = prepare_training_data(
        f"{sf_dir}/documents.parquet", str(tmp_path / "o"),
        min_quality=0.0, near_dup_threshold=0.8, n_shards=4,
        lm_quality_min=-4.5)
    out = rd.read_parquet(str(tmp_path / "o")).to_pandas()
    assert len(out) == s["kept_rows"] > 0
    assert "lm_score" in out.columns
    assert (out["lm_score"] >= -4.5).all()


def test_training_data_pipeline_dsir_stage(tmp_path, sf_dir):
    """Capstone with the DSIR stage on: target = the corpus' en docs;
    a high threshold must drop rows, logw column rides into output."""
    import glob as _glob
    import pyarrow.compute as pc
    import pyarrow.dataset as _pds
    import pyarrow.parquet as _pq
    from opensearch_ray.pipelines import prepare_training_data

    t = _pq.read_table(f"{sf_dir}/documents.parquet")
    tgt = tmp_path / "target.parquet"
    _pq.write_table(t.filter(pc.equal(t.column("lang"), "en")), str(tgt))
    out = str(tmp_path / "td_dsir")
    # NB: absolute logw is negative at tiny scale (Laplace smoothing over a
    # 193-doc target spreads mass thin), so threshold on a mid quantile —
    # the SIGNAL is relative: en docs sit ~5 nats above the other langs.
    s = prepare_training_data(
        f"{sf_dir}/documents.parquet", out, min_quality=0.0,
        dsir_target=str(tgt), dsir_logw_min=-8.0)
    assert 0 < s["kept_rows"] < s["input_rows"]
    kept = _pds.dataset(sorted(_glob.glob(f"{out}/shard=*/*.parquet"))) \
        .to_table(columns=["doc_id", "lang", "dsir_logw"])
    # docs that look like the en target are enriched vs the input mix
    langs = kept.column("lang").to_pylist()
    frac_en_kept = langs.count("en") / len(langs)
    frac_en_in = t.column("lang").to_pylist().count("en") / t.num_rows
    assert frac_en_kept > frac_en_in
    assert min(kept.column("dsir_logw").to_pylist()) >= -8.0


def test_training_data_pipeline_line_dedup_stage(tmp_path, sf_dir):
    """Capstone with the paragraph-dedup stage on (sep=' ' — the
    synthetic docs are single-line): texts are rewritten, passenger
    columns survive, lines_removed rides into the output."""
    import glob as _glob
    import pyarrow.dataset as _pds
    from opensearch_ray.pipelines import prepare_training_data

    out = str(tmp_path / "td_lines")
    s = prepare_training_data(
        f"{sf_dir}/documents.parquet", out, min_quality=0.0,
        dedup_lines_sep=" ")
    assert s["kept_rows"] > 0
    kept = _pds.dataset(sorted(_glob.glob(f"{out}/shard=*/*.parquet"))) \
        .to_table(columns=["doc_id", "text", "lang", "lines_removed"])
    assert kept.column("lines_removed").to_numpy().sum() > 0
    # at least one doc lost words to the corpus-wide keep-first
    assert kept.column("lang").null_count == 0


def test_rescore_score_modes(searcher):
    """QueryRescoreMode: weighted scores enter the combinator."""
    from opensearch_ray.search.features import rescore

    def by_turn(fetched):
        return fetched.column("turn_idx").to_numpy(
            zero_copy_only=False).astype(float)

    base = {h.docid: h.score for h in searcher.search("bace cedi", k=50)}
    f = searcher.fetch(list(base))
    sec = dict(zip(f.column("_docid").to_pylist(),
                   by_turn(f).astype(float)))
    for mode, comb in [("total", lambda p, s: p + s),
                       ("multiply", lambda p, s: p * s),
                       ("avg", lambda p, s: (p + s) / 2),
                       ("max", max), ("min", min)]:
        out = rescore(searcher, "bace cedi", window_size=50, k=5,
                      rescore_fn=by_turn, query_weight=0.8,
                      rescore_query_weight=0.1, score_mode=mode)
        want = sorted(((d, comb(0.8 * p, 0.1 * sec[d]))
                       for d, p in base.items()),
                      key=lambda t: (-t[1], t[0]))[:5]
        assert [(h.docid, h.score) for h in out] == [
            (d, pytest.approx(s)) for d, s in want], mode


def test_function_score_search_modes(searcher):
    """function_score boost_mode/score_mode + seeded random_score."""
    import numpy as np
    from opensearch_ray.search.features import (function_score_search,
                                                random_score_values)

    def rand7(fetched):
        ids = np.asarray(fetched.column("_docid").to_pylist(), np.int64)
        return random_score_values(ids, seed=7)

    def turn(fetched):
        return fetched.column("turn_idx").to_numpy(
            zero_copy_only=False).astype(float)

    out = function_score_search(searcher, "bace cedi", [rand7], k=5,
                                window=30, boost_mode="multiply")
    base = {h.docid: h.score for h in searcher.search("bace cedi", k=30)}
    ids = np.array(sorted(base), np.int64)
    rv = dict(zip(ids.tolist(), random_score_values(ids, seed=7)))
    want = sorted(((d, p * rv[d]) for d, p in base.items()),
                  key=lambda t: (-t[1], t[0]))[:5]
    assert out["doc_id"].tolist() == [d for d, _ in want]
    assert np.allclose(out["score"], [s for _, s in want])
    # determinism: same seed -> same ranking; different seed -> differs
    out2 = function_score_search(searcher, "bace cedi", [rand7], k=5,
                                 window=30, boost_mode="multiply")
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()
    # replace ignores the query score entirely
    rep = function_score_search(searcher, "bace cedi", [turn], k=5,
                                window=30, boost_mode="replace")
    f = searcher.fetch(list(base))
    tv = dict(zip(f.column("_docid").to_pylist(), turn(f)))
    wantr = sorted(((d, float(tv[d])) for d in base),
                   key=lambda t: (-t[1], t[0]))[:5]
    assert rep["doc_id"].tolist() == [d for d, _ in wantr]
    # two functions, sum score_mode with weights, boost sum
    two = function_score_search(searcher, "bace cedi", [rand7, turn],
                                k=5, window=30, boost_mode="sum",
                                score_mode="sum", weights=[2.0, 0.5])
    wants = sorted(((d, p + (2.0 * rv[d] + 0.5 * float(tv[d])))
                    for d, p in base.items()),
                   key=lambda t: (-t[1], t[0]))[:5]
    assert two["doc_id"].tolist() == [d for d, _ in wants]


def test_training_data_pipeline_nb_and_bpe(tmp_path, sf_dir):
    """Capstone with the model-based NB filter (keep English-predicted
    docs, trained on the corpus's own lang labels) and BPE token
    accounting on."""
    import glob as _glob
    import pyarrow.dataset as _pds
    from opensearch_ray.pipelines import prepare_training_data

    out = str(tmp_path / "td_nb")
    s = prepare_training_data(
        f"{sf_dir}/documents.parquet", out, min_quality=0.0,
        nb_keep={"path": f"{sf_dir}/documents.parquet",
                 "label_col": "lang", "keep": ["en"], "buckets": 1024},
        bpe_merges=64)
    assert s["kept_rows"] > 0
    kept = _pds.dataset(sorted(_glob.glob(f"{out}/shard=*/*.parquet"))) \
        .to_table(columns=["nb_pred", "bpe_tokens", "n_tokens"])
    assert set(kept.column("nb_pred").to_pylist()) == {"en"}
    bt = kept.column("bpe_tokens").to_numpy(zero_copy_only=False)
    nt = kept.column("n_tokens").to_numpy(zero_copy_only=False)
    assert (bt >= nt).all()  # BPE pieces >= whitespace words


def test_training_data_pipeline_remove_spans(tmp_path, sf_dir):
    """Capstone remove_spans_k: duplicated k-token spans cut before
    scoring; passenger columns survive via the partitioned hash join."""
    import glob as _glob
    import pyarrow.dataset as _pds
    from opensearch_ray.pipelines import prepare_training_data

    out = str(tmp_path / "td_spans")
    s = prepare_training_data(
        f"{sf_dir}/documents.parquet", out, min_quality=0.0,
        remove_spans_k=3)
    assert s["kept_rows"] > 0
    kept = _pds.dataset(sorted(_glob.glob(f"{out}/shard=*/*.parquet"))) \
        .to_table(columns=["doc_id", "text", "removed_tokens", "lang"])
    assert kept.num_rows > 0
    # the passenger column survived and some spans were actually cut
    assert kept.column("lang").null_count == 0
    assert sum(kept.column("removed_tokens").to_pylist()) >= 0


def test_data_stream_rollover_and_retention(tmp_path):
    """Data streams (MetadataCreateDataStreamService + rollover + ILM
    delete): appends group into the write generation until max_docs
    trips; search unions live backing indices; retention drops whole
    generations; state survives a reload."""
    import pyarrow.parquet as _pq
    from opensearch_ray.datastream import DataStream
    from opensearch_ray.sources import write_transcript_corpus

    corpora = []
    for i in range(3):
        d = tmp_path / f"c{i}"
        write_transcript_corpus(str(d), n_turns=400, n_files=1,
                                seed=100 + i)
        corpora.append(str(d))
    ds = DataStream(str(tmp_path / "stream"), "logs")
    r1 = ds.append(corpora[0], rollover_max_docs=700, num_buckets=2)
    assert r1["generation"] == 1 and not r1["rolled_over"]
    r2 = ds.append(corpora[1], rollover_max_docs=700, num_buckets=2)
    assert r2["generation"] == 1 and r2["rolled_over"]  # 800 >= 700
    r3 = ds.append(corpora[2], rollover_max_docs=700, num_buckets=2)
    assert r3["generation"] == 2
    assert ds.stats()["total_docs"] == 1200
    hits = ds.search("bace", k=10)
    assert len(hits) > 0 and set(hits.columns) == {"index", "doc_id",
                                                   "score"}
    # reload from disk, then drop generation 1 (both its parts)
    ds2 = DataStream(str(tmp_path / "stream"), "logs")
    dropped = ds2.retain(last_generations=1)
    assert dropped == [1]
    assert ds2.stats()["backing_indices"] == 1
    assert ds2.stats()["total_docs"] == 400
    assert len(ds2.search("bace", k=10)) >= 0  # still searchable


def test_training_data_pipeline_all_stages(tmp_path, sf_dir):
    """EVERY optional capstone stage at once — span removal, line dedup,
    c4, lm, dsir, nb filter, langid keep, decontamination, stratified
    sampling, bpe counting, packing — composes into one run with all
    signal columns present."""
    import glob as _glob
    import pyarrow.parquet as _pq
    import pyarrow.dataset as _pds
    from opensearch_ray.pipelines import prepare_training_data

    t = _pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"])
    bench = tmp_path / "bench.parquet"
    _pq.write_table(t.slice(0, 3), str(bench))
    out = str(tmp_path / "td_all")
    s = prepare_training_data(
        f"{sf_dir}/documents.parquet", out, min_quality=0.0,
        keep_langs=["en", "fr", "de", "es", "zh"],
        decontaminate_against=str(bench),
        sample_rates={"src5": 0.0}, sample_stratum_col="source",
        pack_budget=256, c4_heuristics=True, lm_quality_min=-5.0,
        dsir_target=f"{sf_dir}/documents.parquet", dsir_logw_min=-1e9,
        dedup_lines_sep=" ",
        nb_keep={"path": f"{sf_dir}/documents.parquet",
                 "label_col": "lang",
                 "keep": ["en", "fr", "de", "es", "zh"], "buckets": 512},
        bpe_merges=16, remove_spans_k=3)
    assert s["kept_rows"] > 0 and s["packed_sequences"] > 0
    kept = _pds.dataset(
        sorted(_glob.glob(f"{out}/shard=*/*.parquet"))).to_table()
    for col in ("quality", "lm_score", "dsir_logw", "nb_pred",
                "bpe_tokens", "removed_tokens", "lines_removed",
                "predicted_lang", "n_tokens"):
        assert col in kept.column_names, col
