"""Dedup (exact / minhash / simhash / ngram / embedding), text stats, ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from opensearch_ray.dedup import (
    dedup_exact, embedding_dedup_pairs, minhash_dedup_pairs, ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from opensearch_ray.similarity import brute_force_topk, lsh_topk
from opensearch_ray.textstats import (
    fingerprints, langid_heuristic, quality_scores, token_counts,
)


@pytest.fixture(scope="module")
def near_dup_ds():
    """Planted corpus: 0/1 identical, 2 near-dup of 0, 3-5 distinct."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),                                     # exact dup of 0
        (2, base.replace("today", "tomorrow")),        # near dup of 0/1
        (3, "completely different text about ray data pipelines and arrow"),
        (4, "another unrelated document mentioning parquet files and shuffles"),
        (5, "short one"),
    ]
    return rd.from_items([{"doc_id": i, "text": t} for i, t in rows])


def test_dedup_exact(near_dup_ds):
    kept = dedup_exact(near_dup_ds).to_pandas().sort_values("doc_id")
    assert kept["doc_id"].tolist() == [0, 2, 3, 4, 5]  # doc 1 dropped


def test_minhash_pairs(near_dup_ds):
    pairs = minhash_dedup_pairs(near_dup_ds, threshold=0.5)
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any({3, 4} <= {a, b} for a, b in got)
    exact = pairs[(pairs.a == 0) & (pairs.b == 1)]["est_jaccard"].iloc[0]
    assert exact == 1.0


def test_ngram_jaccard_verify(near_dup_ds):
    cand = pd.DataFrame({"a": [0, 0, 3], "b": [1, 2, 4]})
    out = ngram_jaccard_pairs(near_dup_ds, cand, n=3)
    j = dict(zip(map(tuple, out[["a", "b"]].values), out["jaccard"]))
    assert j[(0, 1)] == 1.0
    assert 0.3 < j[(0, 2)] < 1.0
    assert j[(3, 4)] == 0.0


def test_simhash_pairs(near_dup_ds):
    pairs = simhash_dedup_pairs(near_dup_ds, max_hamming=10)
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got  # identical docs -> distance 0
    d01 = pairs[(pairs.a == 0) & (pairs.b == 1)]["hamming"].iloc[0]
    assert d01 == 0


def test_embedding_dedup_pairs():
    rng = np.random.default_rng(3)
    base = rng.standard_normal(64).astype(np.float32)
    vecs = [base, base + rng.standard_normal(64).astype(np.float32) * 0.01,
            rng.standard_normal(64).astype(np.float32),
            rng.standard_normal(64).astype(np.float32)]
    ds = rd.from_items([
        {"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(vecs)])
    pairs = embedding_dedup_pairs(ds, threshold=0.95, dim=64)
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got
    assert all({a, b} <= {0, 1} for a, b in got)


def test_ann_brute_force_matches_numpy(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.asarray(t.column("vec_id").to_pylist())
    q = V[7]
    out = brute_force_topk(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                           q, k=5)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = Vn @ qn
    order = np.lexsort((ids, -sims))[:5]
    assert out["vec_id"].tolist() == ids[order].tolist()


def test_ann_lsh_recall(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(t.column("embedding")[3].as_py(), dtype=np.float32)
    exact = brute_force_topk(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10)
    approx = lsh_topk(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10,
                      multiprobe_bits=3)
    # self-match must be found; recall is approximate by design
    assert 3 in approx["vec_id"].tolist()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.3


def test_token_counts_and_quality(near_dup_ds):
    out = token_counts(near_dup_ds).to_pandas().set_index("doc_id")
    assert out.loc[5, "whitespace_tokens"] == 2
    q = quality_scores(near_dup_ds).to_pandas().set_index("doc_id")
    assert q.loc[0, "n_tokens"] == 13
    assert 0 <= q.loc[0, "quality"] <= 1
    assert q.loc[0, "stopword_ratio"] > 0


def test_langid(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    out = langid_heuristic(ds).to_pandas()
    assert set(out["predicted_lang"]) <= {"en", "de", "fr", "es", "zh", "und"}


def test_fingerprints(near_dup_ds):
    out = fingerprints(near_dup_ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "fingerprint"] == out.loc[1, "fingerprint"]
    assert out.loc[0, "fingerprint"] != out.loc[3, "fingerprint"]
    assert out.loc[5, "fingerprint"] == "one short"


def test_ivf_index(sf_dir, tmp_path):
    from opensearch_ray.similarity import IvfIndex, brute_force_topk
    d = str(tmp_path / "ivf")
    idx = IvfIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), d,
                         n_cells=8, seed=17)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(t.column("embedding")[3].as_py(), dtype=np.float32)
    exact = brute_force_topk(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10)
    # full probe == exact search
    full = idx.search(q, k=10, nprobe=8)
    assert full["vec_id"].tolist() == exact["vec_id"].tolist()
    # partial probe: self must be found; recall for ~unclustered gaussian
    # vectors is only ~nprobe/n_cells by construction, so bound loosely
    part = idx.search(q, k=10, nprobe=3)
    assert 3 in part["vec_id"].tolist()
    recall = len(set(part["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.2
    # deterministic rebuild
    d2 = str(tmp_path / "ivf2")
    idx2 = IvfIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), d2,
                          n_cells=8, seed=17)
    assert np.allclose(idx.centroids, idx2.centroids)


def test_ivf_sample_scales_with_cells(sf_dir, tmp_path):
    """sample_size auto-scales to ~40*n_cells: a small explicit sample no
    longer silently trains fewer centroids than requested (ivf.py r2 nit)."""
    from opensearch_ray.similarity import IvfIndex
    d = str(tmp_path / "ivf_scale")
    idx = IvfIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), d,
                         n_cells=60, sample_size=32, seed=17)
    assert len(idx.centroids) == 60


def test_connected_components_hash_to_min():
    """Path, pair, and 4-cycle-with-tail components resolve to the
    component-min label in O(log diameter) rounds; only edge endpoints
    appear (isolated nodes never shuffle)."""
    from opensearch_ray.dedup.cluster import connected_components
    edges = pa.table({"a": [2, 3, 10, 20, 21, 20, 22, 7],
                      "b": [1, 2, 11, 21, 22, 22, 23, 6]})
    comp = (connected_components(rd.from_arrow(edges)).to_pandas()
            .sort_values("node"))
    got = dict(zip(comp["node"], comp["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 6: 6, 7: 6,
                   10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_keep_best_representatives():
    """Per component: max quality wins, ties break to the LOWEST id."""
    from opensearch_ray.dedup.cluster import (connected_components,
                                              keep_best)
    edges = pa.table({"a": [2, 3, 10], "b": [1, 2, 11]})
    docs = pa.table({"doc_id": [1, 2, 3, 10, 11],
                     "n_chars": [5, 9, 7, 3, 3]})
    comp = connected_components(rd.from_arrow(edges))
    kb = (keep_best(rd.from_arrow(docs), comp).to_pandas()
          .sort_values("component").reset_index(drop=True))
    assert kb["component"].tolist() == [1, 10]
    assert kb["keep_id"].tolist() == [2, 10]   # 9 wins; 3==3 tie -> id 10
    assert kb["n_members"].tolist() == [3, 2]


def test_token_jaccard_edges_and_clusters(near_dup_ds):
    """Exact distinct-token Jaccard edges over the planted corpus: the
    exact-dup pair scores 1.0, the near-dup pair clears 0.5, and the
    cluster keeps the longest member (tie -> lowest id)."""
    from opensearch_ray.dedup.cluster import (connected_components,
                                              keep_best,
                                              token_jaccard_edges)
    e = (token_jaccard_edges(near_dup_ds, max_df=10, threshold=0.5)
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pairs = set(zip(e["a"], e["b"]))
    assert (0, 1) in pairs and e[(e.a == 0) & (e.b == 1)]["jaccard"].iloc[0] == 1.0
    assert (0, 2) in pairs and (1, 2) in pairs
    docs = near_dup_ds.map_batches(
        lambda t: t.append_column(
            "n_chars", pa.array([len(x) for x in t.column("text").to_pylist()],
                                pa.int64())), batch_format="pyarrow")
    kb = (keep_best(docs, connected_components(
        token_jaccard_edges(near_dup_ds, max_df=10, threshold=0.5)))
        .to_pandas().sort_values("component").reset_index(drop=True))
    assert kb["component"].tolist() == [0]
    assert kb["n_members"].tolist() == [3]
    assert kb["keep_id"].tolist() == [2]  # "tomorrow" variant is longest


def test_semantic_dedup_semdedup():
    """SemDeDup (Abbas et al. '23): k-means clusters + within-cluster
    cosine pruning, keep-farthest-from-centroid policy."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opensearch_ray.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    # two well-separated cluster directions, duplicates = tiny jitter
    base = rng.standard_normal((2, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = [], []
    for i in range(40):
        b = base[i % 2]
        jitter = 0.01 * rng.standard_normal(16).astype(np.float32) \
            if i < 20 else 0.8 * rng.standard_normal(16).astype(np.float32)
        v = b + jitter
        vecs.append((v / np.linalg.norm(v)).tolist())
        ids.append(i)
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()),
                                 "embedding": pa.array(vecs)}))
    out = semantic_dedup(ds, eps=0.95, n_clusters=4,
                         sample=40).to_pandas()
    assert len(out) == 40 and out.vec_id.nunique() == 40
    # the 20 jittered near-copies collapse to ~2 survivors; the 20
    # scattered points mostly survive
    tight = out[out.vec_id < 20]
    assert tight.keep.sum() <= 6
    assert out[out.vec_id >= 20].keep.sum() >= 14
    # deterministic across runs
    out2 = semantic_dedup(ds, eps=0.95, n_clusters=4,
                          sample=40).to_pandas()
    m1 = dict(zip(out.vec_id, out.keep))
    m2 = dict(zip(out2.vec_id, out2.keep))
    assert m1 == m2


# ----------------------------------------------------------------- DSIR

def test_dsir_enriches_target():
    """Target-looking docs must outscore off-target docs (Xie et al.'23:
    log w = sum llr over hashed n-grams; target vocab buckets carry
    positive llr)."""
    from opensearch_ray.textstats.dsir import dsir_log_weights
    rows = []
    for i in range(20):  # target-like: formal prose vocabulary
        rows.append({"doc_id": i, "lang": "en",
                     "text": "the model trains on curated formal prose "
                             "with careful grammar and structure"})
    for i in range(20, 40):  # off-target: distinct vocabulary
        rows.append({"doc_id": i, "lang": "xx",
                     "text": "lol spam click buy now free casino jackpot "
                             "winner prize xoxo"})
    ds = rd.from_items(rows)
    target = ds.filter(expr="lang == 'en'")
    out = dsir_log_weights(ds, target, buckets=512).to_pandas()
    en = out[out["lang"] == "en"]["dsir_logw"]
    xx = out[out["lang"] == "xx"]["dsir_logw"]
    assert en.min() > xx.max()


def test_dsir_select_topk_deterministic():
    from opensearch_ray.textstats.dsir import dsir_log_weights, dsir_select
    prose = "curated formal prose with careful grammar and structure"
    spam = "lol spam click buy now free casino jackpot winner prize"
    rows = [{"doc_id": i,
             "text": prose if i % 4 == 0 else spam}
            for i in range(50)]
    ds = rd.from_items(rows)
    target = ds.filter(lambda r: r["doc_id"] % 4 == 0)
    scored = dsir_log_weights(ds, target, buckets=256)
    top = dsir_select(scored, k=10)
    assert top.num_rows == 10
    w = top.column("dsir_logw").to_pylist()
    assert w == sorted(w, reverse=True)
    # target-looking docs dominate the selection
    ids = top.column("doc_id").to_pylist()
    assert all(i % 4 == 0 for i in ids)
    # repartitioning must not change the selection
    top2 = dsir_select(scored.repartition(7), k=10)
    assert top2.column("doc_id").to_pylist() == ids
    # Gumbel mode: deterministic per seed, valid ids
    g1 = dsir_select(scored, k=10, seed=7)
    g2 = dsir_select(scored.repartition(5), k=10, seed=7)
    assert g1.column("doc_id").to_pylist() == g2.column("doc_id").to_pylist()


def test_line_dedup_keep_first():
    """Corpus-wide keep-first line dedup: later occurrences drop, order
    within docs is preserved, empty survivors keep their row."""
    from opensearch_ray.dedup import line_dedup
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a\nb\nc", "b\nd\na", "a\nb", "e"])}))
    out = line_dedup(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out["text"].tolist() == ["a\nb\nc", "d", "", "e"]
    assert out["lines_removed"].tolist() == [0, 2, 2, 0]
    # repartitioning must not change the result (determinism invariant)
    out2 = line_dedup(ds.repartition(3)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2["text"].tolist() == out["text"].tolist()
    # duplicate lines WITHIN one doc dedup too (positional keep-first)
    one = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["x\nx\ny\nx"])}))
    o = line_dedup(one).to_pandas()
    assert o["text"].tolist() == ["x\ny"]
    assert o["lines_removed"].tolist() == [2]


def test_hnsw_index(sf_dir, tmp_path):
    """Per-segment HNSW (plugins/knn per-Lucene-segment graph model,
    Malkov & Yashunin arXiv:1603.09320): high recall at small scale, exact
    self-hit, deterministic rebuild regardless of block arrival order."""
    from opensearch_ray.similarity import HnswIndex, brute_force_topk
    d = str(tmp_path / "hnsw")
    idx = HnswIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), d,
                          n_segments=4, M=8, ef_construction=48)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    recs = []
    for qi in (0, 3, 7):
        q = np.asarray(t.column("embedding")[qi].as_py(), dtype=np.float32)
        exact = brute_force_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10)
        out = idx.search(q, k=10, ef_search=64)
        assert qi in out["vec_id"].tolist()  # self-hit
        recs.append(len(set(out["vec_id"]) & set(exact["vec_id"])) / 10)
    assert np.mean(recs) >= 0.8, recs
    # deterministic rebuild (hash-derived levels + id-sorted inserts)
    d2 = str(tmp_path / "hnsw2")
    idx2 = HnswIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                           d2, n_segments=4, M=8, ef_construction=48)
    q = np.asarray(t.column("embedding")[0].as_py(), dtype=np.float32)
    assert idx.search(q, k=10, ef_search=64).equals(
        idx2.search(q, k=10, ef_search=64))
    # every vector landed in exactly one segment
    assert sum(idx.meta["seg_rows"].values()) == t.num_rows


def test_nb_classifier_separable():
    """Multinomial NB (fastText-shape quality filter): recovers the label
    on a separable vocabulary; priors dominate for empty docs; argmax
    tie-break is deterministic (first label in sorted order)."""
    from opensearch_ray.textstats import nb_predict, nb_train
    df = pd.DataFrame({
        "doc_id": range(8),
        "text": ["apple banana apple", "banana apple fruit",
                 "apple fruit banana", "apple apple",
                 "stone metal rock", "rock metal stone",
                 "metal stone rock rock", ""],
        "lang": ["fruit", "fruit", "fruit", "fruit",
                 "rock", "rock", "rock", "rock"]})
    ds = rd.from_pandas(df)
    model = nb_train(ds, "text", "lang", buckets=512)
    out = nb_predict(ds, model, "text").to_pandas().sort_values("doc_id")
    # trained docs classify back to their own class
    assert out["nb_pred"].tolist()[:7] == df["lang"].tolist()[:7]
    # empty doc: prior-only score; priors equal -> first sorted label
    assert out["nb_pred"].iloc[7] == "fruit"
    # fresh model, same data -> identical predictions (determinism)
    out2 = nb_predict(ds, nb_train(ds, "text", "lang", buckets=512),
                      "text").to_pandas().sort_values("doc_id")
    assert out["nb_pred"].tolist() == out2["nb_pred"].tolist()


def test_bpe_train_and_count():
    """BPE (Sennrich ACL'16): classic merge order on the textbook corpus,
    greedy overlap resolution, rank-based encode, count >= word count."""
    from opensearch_ray.textstats import apply_bpe, bpe_token_counts, bpe_train
    from opensearch_ray.textstats.bpe import _learn_merges
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _learn_merges(wf, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # 'es' (9) is the first merge; trained words collapse to few pieces
    assert merges[0] == ("e", "s")
    assert apply_bpe("newest", ranks) == ["newest▁"]
    assert len(apply_bpe("lowest", ranks)) <= 3
    # overlap run parity: 'aaaa' with (a,a) merges greedily left-to-right
    m2 = _learn_merges({"aaaa": 4}, 1)
    assert m2 == [("a", "a")]
    assert apply_bpe("aaaa", {("a", "a"): 0}) == ["aa", "aa", "▁"]
    # distributed count: >= whitespace word count, deterministic
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["low lower newest", "widest low", ""]})
    ds = rd.from_pandas(df)
    ref = bpe_train(ds, "text", n_merges=16)
    out = bpe_token_counts(ds, ref, "text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    w = out["text"].str.split().str.len()
    assert (out["bpe_tokens"] >= w).all()
    assert out["bpe_tokens"].iloc[2] == 0


def test_hnsw_search_batch_parity(sf_dir, tmp_path):
    """search_batch (per-segment remote tasks, graphs load once) returns
    exactly the single-query results for every query."""
    from opensearch_ray.similarity import HnswIndex
    d = str(tmp_path / "hnsw_b")
    idx = HnswIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                          d, n_segments=3, M=8, ef_construction=48)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    Q = np.asarray(t.column("embedding").to_pylist()[:6], np.float32)
    batch = idx.search_batch(Q, k=5, ef_search=48)
    for qi in range(len(Q)):
        one = idx.search(Q[qi], k=5, ef_search=48)
        sub = batch[batch["query_idx"] == qi]
        assert one["vec_id"].tolist() == sub["vec_id"].tolist()
        assert one["rank"].tolist() == sub["rank"].tolist()


def test_remove_duplicated_spans():
    """ExactSubstr cut step (Lee et al. ACL'22): first occurrence kept,
    later occurrences cut, overlapping windows union, whole-doc dups
    empty out, unique docs untouched."""
    from opensearch_ray.dedup.substring import remove_duplicated_spans
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d e f",
                 "x b c d y z",
                 "unique words only here now",
                 "a b c d e f"]})
    out = remove_duplicated_spans(rd.from_pandas(df), k=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        "a b c d e f", "x y z", "unique words only here now", ""]
    assert out["removed_tokens"].tolist() == [0, 3, 0, 6]


def test_hnsw_append_new_segments(sf_dir, tmp_path):
    """HnswIndex.append: new vectors become NEW segment graphs (existing
    graphs untouched); search fans over old + new; a new vector is its
    own nearest neighbor afterwards."""
    from opensearch_ray.similarity import HnswIndex
    d = str(tmp_path / "hnsw_app")
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    base = rd.from_arrow(t.slice(0, 300))
    extra = rd.from_arrow(t.slice(300))
    idx = HnswIndex.build(base, d, n_segments=2, M=8, ef_construction=48)
    segs_before = list(idx.meta["segments"])
    q_new = np.asarray(t.column("embedding")[400].as_py(), np.float32)
    assert 400 not in idx.search(q_new, k=5, ef_search=64)["vec_id"].values
    idx.append(extra, n_segments=2)
    assert idx.meta["total"] == t.num_rows
    assert set(segs_before) < set(idx.meta["segments"])
    # reload from disk and find the appended vector
    idx2 = HnswIndex(d)
    out = idx2.search(q_new, k=5, ef_search=64)
    assert out["vec_id"].iloc[0] == 400


def test_hnsw_force_merge(sf_dir, tmp_path):
    """force_merge: smallest-first pairwise graph rebuilds down to one
    segment; results stay correct (self-hit + high agreement with the
    pre-merge top-k)."""
    from opensearch_ray.similarity import HnswIndex
    d = str(tmp_path / "hnsw_fm")
    idx = HnswIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                          d, n_segments=4, M=8, ef_construction=48)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(t.column("embedding")[7].as_py(), np.float32)
    before = idx.search(q, k=10, ef_search=64)["vec_id"].tolist()
    idx.force_merge(max_segments=1)
    assert len(idx.meta["segments"]) == 1
    assert sum(idx.meta["seg_rows"].values()) == t.num_rows
    after = HnswIndex(d).search(q, k=10, ef_search=64)["vec_id"].tolist()
    assert after[0] == 7  # self-hit survives the merge
    assert len(set(before) & set(after)) >= 8  # approx graphs, ~same set


def test_hnsw_filtered_search(sf_dir, tmp_path):
    """Filtered k-NN on HNSW: a selective allowlist returns ONLY allowed
    ids (exact fallback per segment when the filter is tight); a wide
    filter stays on the graph path and never leaks disallowed ids."""
    from opensearch_ray.similarity import HnswIndex
    d = str(tmp_path / "hnsw_filt")
    idx = HnswIndex.build(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                          d, n_segments=3, M=8, ef_construction=48)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    n = t.num_rows
    q = np.asarray(t.column("embedding")[0].as_py(), np.float32)
    tight = list(range(0, n, 17))          # ~6% of ids
    out = idx.search(q, k=10, ef_search=48, allow_ids=tight)
    assert len(out) == 10
    assert set(out["vec_id"]) <= set(tight)
    assert out["vec_id"].iloc[0] == 0      # allowed self-hit wins
    wide = list(range(0, n, 2))            # 50%
    out2 = idx.search(q, k=10, ef_search=48, allow_ids=wide)
    assert set(out2["vec_id"]) <= set(wide) and len(out2) == 10
    # empty filter -> empty result
    assert idx.search(q, k=5, allow_ids=[]).empty
