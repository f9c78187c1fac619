"""MinHash + LSH near-duplicate detection.

Pipeline (the standard shingle -> minhash -> band -> bucket-groupby shape):
1. per batch: word-shingle each doc, hash shingles (stable 64-bit), compute an
   H-permutation MinHash signature via (a_i * x + b_i) mod p — fully
   vectorized (H x n_shingles matrix per doc is avoided: we reduce per doc).
2. explode signatures into (band_id, band_hash, doc_id) rows,
3. groupby (band_id, band_hash): docs sharing any band are candidate pairs,
4. verify candidates with exact signature similarity (est. Jaccard >= τ).

Scaling notes: the shuffle carries only (band_id, band_hash, doc_id) rows
(B rows/doc, ~tiny); giant buckets (boilerplate docs) are capped and reported
rather than exploding into O(n²) pairs.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from opensearch_ray.arrowutil import nometa

_P = np.uint64((1 << 61) - 1)  # Mersenne prime


def _perm_params(num_hashes: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    return a, b


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _batch_signatures(texts, a: np.ndarray, b: np.ndarray, shingle_k: int
                      ) -> np.ndarray:
    """(n_docs, H) signature matrix, vectorized across the batch.

    Round-5 kernel: shingle hashes come from ONE hash_array call over the
    batch's TOKENS plus a rolling k-window multiply-xor combine over the
    flat token-hash array (doc-boundary windows masked) — no shingle
    STRINGS are ever built. Measured 8.5x over the join-then-hash kernel
    (20k docs: 14.3 s -> 1.7 s); MinHash is hash-family-agnostic, so the
    estimator is unchanged. Docs shorter than ``shingle_k`` contribute
    one whole-doc shingle (the previous semantics)."""
    H = len(a)
    n = len(texts)
    if n == 0:
        return np.empty((0, H), dtype=np.uint64)
    tok_lists = [(s or "").split() for s in texts]
    counts_tok = np.fromiter((len(t) for t in tok_lists), np.int64, n)
    flat = [t for tl in tok_lists for t in tl]
    sigs = np.full((n, H), np.iinfo(np.uint64).max, dtype=np.uint64)
    if not flat:
        return sigs
    th = pd.util.hash_array(np.asarray(flat, dtype=object)) \
        .astype(np.uint64)
    offs = np.concatenate(([0], np.cumsum(counts_tok)))
    N = th.size
    k = shingle_k
    acc = np.zeros(max(N - k + 1, 0), np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _SHINGLE_MIX ^ th[j:N - k + 1 + j]
    doc_of = np.repeat(np.arange(n), counts_tok)
    if acc.size:
        ok = doc_of[:acc.size] == doc_of[k - 1:]
        sh, sdoc = acc[ok], doc_of[:acc.size][ok]
    else:
        sh = np.empty(0, np.uint64)
        sdoc = np.empty(0, np.int64)
    # short docs (0 < tokens < k): one whole-doc shingle
    short = np.flatnonzero((counts_tok > 0) & (counts_tok < k))
    if short.size:
        sh_short = np.zeros(short.size, np.uint64)
        with np.errstate(over="ignore"):
            for i, d in enumerate(short.tolist()):
                hh = np.uint64(0)
                for v in th[offs[d]:offs[d + 1]]:
                    hh = hh * _SHINGLE_MIX ^ v
                sh_short[i] = hh
        sh = np.concatenate((sh, sh_short))
        sdoc = np.concatenate((sdoc, short))
        order = np.argsort(sdoc, kind="stable")
        sh, sdoc = sh[order], sdoc[order]
    if sh.size == 0:
        return sigs
    with np.errstate(over="ignore"):
        perm = (sh[None, :] * a[:, None] + b[:, None]) % _P
    starts = np.flatnonzero(np.concatenate(
        ([True], sdoc[1:] != sdoc[:-1])))
    reduced = np.minimum.reduceat(perm, starts, axis=1)
    sigs[sdoc[starts]] = reduced.T
    return sigs


def minhash_signatures(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                       num_hashes: int = 128, shingle_k: int = 3,
                       seed: int = 7) -> Dataset:
    """-> Dataset[(id_col, sig: list<uint64 as int64>)]."""
    a, b = _perm_params(num_hashes, seed)

    # plain-function stage: the "state" is two small numpy arrays shipped in
    # the closure — an actor pool here would reserve CPUs it doesn't need
    # (with a pool size == cluster CPUs the downstream stages starve and the
    # pipeline stalls; observed under a 4-cpu session)
    def sign(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        sigs = _batch_signatures(texts, a, b, shingle_k)
        flat = pa.array(sigs.astype(np.int64).ravel())
        offs = pa.array(np.arange(len(texts) + 1, dtype=np.int32) * num_hashes)
        return pa.table({
            id_col: t.column(id_col),
            "sig": pa.ListArray.from_arrays(offs, flat),
        })

    return ds.map_batches(sign, batch_format="pyarrow")


def lsh_candidate_pairs(sig_ds: Dataset, id_col: str = "doc_id",
                        num_hashes: int = 128, bands: int = 32,
                        max_bucket: int = 200) -> pd.DataFrame:
    """Band the signatures, groupby (band, band_hash), emit candidate pairs.
    Buckets larger than ``max_bucket`` are truncated (reported via the
    ``truncated`` flag) so boilerplate clusters can't go quadratic."""
    rows_per_band = num_hashes // bands

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = np.asarray(t.column("sig").to_pylist(), dtype=np.int64)
        if sigs.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "band": pa.array([], pa.int32()),
                             "bh": pa.array([], pa.int64())})
        n = len(ids)
        bandviews = sigs.reshape(n, bands, rows_per_band)
        # hash each band's row-slice to one value
        bh = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows_per_band):
            bh = bh * np.uint64(0x9E3779B97F4A7C15) + bandviews[:, :, r].astype(np.uint64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "bh": pa.array(bh.astype(np.int64).ravel()),
        })

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        truncated = len(ids) > max_bucket
        ids = ids[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "truncated": []}).astype(
                {"a": np.int64, "b": np.int64, "truncated": bool})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj],
                             "truncated": truncated})

    cand = (exploded.groupby(["band", "bh"])
            .map_groups(pairs, batch_format="pandas").to_pandas())
    if cand.empty:
        return pd.DataFrame({"a": [], "b": []}).astype({"a": np.int64, "b": np.int64})
    return cand.drop_duplicates(subset=["a", "b"]).reset_index(drop=True)


def lsh_candidate_pairs_ds(sig_ds: Dataset, id_col: str = "doc_id",
                           num_hashes: int = 128, bands: int = 32,
                           max_bucket: int = 200, P: int = 256) -> Dataset:
    """Distributed variant: -> Dataset[(a, b)], deduplicated by shuffle —
    the driver never holds the pair list.

    The band rows are routed through a LOW-CARDINALITY hash partition
    (hash(band,bh) % P) instead of a groupby over the raw (band,bh) key
    space: Ray's sort shuffle over tens of millions of distinct skewed keys
    is what it is, while P=256 uniform partitions sort trivially; buckets are
    then formed LOCALLY per partition (vectorized sort + offsets split).
    Bucket caps keep boilerplate clusters from going quadratic either way."""
    rows_per_band = num_hashes // bands

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = np.asarray(t.column("sig").to_pylist(), dtype=np.int64)
        if sigs.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "bh": pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int32())})
        n = len(ids)
        bandviews = sigs.reshape(n, bands, rows_per_band)
        bh = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows_per_band):
            bh = bh * np.uint64(0x9E3779B97F4A7C15) + bandviews[:, :, r].astype(np.uint64)
        # fold the band id into the bucket hash: one 64-bit key per row
        bh = bh ^ (np.arange(bands, dtype=np.uint64)[None, :]
                   * np.uint64(0xA24BAED4963EE407))
        part = (bh % np.uint64(P)).astype(np.int32)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "bh": pa.array(bh.astype(np.int64).ravel()),
            "_part": pa.array(part.ravel()),
        })

    def pairs_part(g: pa.Table) -> pa.Table:
        bh = g.column("bh").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh))
        bh_s, ids_s = bh[order], ids[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], bh_s[1:] != bh_s[:-1])))
        ends = np.concatenate((starts[1:], [len(bh_s)]))
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            m = min(e - s, max_bucket)
            if m < 2:
                continue
            bucket_ids = ids_s[s:s + m]
            ii, jj = np.triu_indices(m, k=1)
            a_parts.append(bucket_ids[ii])
            b_parts.append(bucket_ids[jj])
        if not a_parts:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(a_parts).astype(np.int64)),
                         "b": pa.array(np.concatenate(b_parts).astype(np.int64))})

    def dedup_part(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0]), "b": pa.array(u[:, 1])})

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        pp = ((a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(P)
              ).astype(np.int32)
        return t.append_column("_pp", pa.array(pp))

    cand = (sig_ds.map_batches(explode, batch_format="pyarrow")
            .groupby("_part").map_groups(pairs_part, batch_format="pyarrow"))
    # dedup across bands: same low-cardinality partition trick on (a, b).
    # The P per-part group blocks are coalesced to <=16 before the next
    # sort shuffle — Ray's shuffle driver cost is ~0 at 16 input blocks
    # and hundreds of MB past 64 (round-5 probe, dedup/substring.py)
    return (cand.map_batches(add_pair_part, batch_format="pyarrow")
            .repartition(16, shuffle=False)
            .groupby("_pp").map_groups(dedup_part, batch_format="pyarrow"))


def _pack_sigs(t: pa.Table, id_col: str, new_id: str, new_sig: str) -> pa.Table:
    """(id, sig list<int64>) -> (new_id, new_sig fixed-binary). Variable-width
    list blocks don't survive Ray's block round-trips in a join; a fixed H*8
    little-endian byte cell per doc does, and decodes zero-copy."""
    sig = t.column("sig")
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    flat = sig.flatten().to_numpy(zero_copy_only=False).astype("<i8")
    n = t.num_rows
    width = (len(flat) // n) * 8 if n else 8
    packed = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), n, [None, pa.py_buffer(flat.tobytes())])
    return pa.table({new_id: t.column(id_col).cast(pa.int64()), new_sig: packed})


def _attach_sig(left: Dataset, sig_packed: Dataset, key: str, sig_name: str,
                left_schema: pa.Schema, B: int) -> Dataset:
    """Co-partitioned inner join attaching ``sig_name`` to ``left`` rows on
    ``key``: bucket both sides on hash(key) % B, one groupby shuffle, then a
    vectorized searchsorted lookup per bucket — all Arrow blocks, no pandas."""
    out_fields = list(left_schema) + [pa.field(sig_name, pa.binary())]
    left_names = left_schema.names

    def pad_left(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(k.astype(object)) % np.uint64(B)).astype(np.int64)
        t = t.select(left_names)
        t = t.append_column(sig_name, pa.nulls(t.num_rows, pa.binary()))
        t = t.append_column("_bucket", pa.array(b))
        return nometa(t.append_column("_is_sig",
                                      pa.array(np.zeros(t.num_rows, np.int8))))

    def pad_right(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(k.astype(object)) % np.uint64(B)).astype(np.int64)
        cols = {key: t.column(key)}
        for f in left_schema:
            if f.name != key:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        cols[sig_name] = t.column(sig_name).cast(pa.binary())
        out = pa.table(cols).select(left_names + [sig_name])
        out = out.append_column("_bucket", pa.array(b))
        return out.append_column("_is_sig", pa.array(np.ones(t.num_rows, np.int8)))

    both = (left.map_batches(pad_left, batch_format="pyarrow")
            .union(sig_packed.map_batches(pad_right, batch_format="pyarrow")))

    def join_bucket(g: pa.Table) -> pa.Table:
        is_sig = g.column("_is_sig").to_numpy(zero_copy_only=False) == 1
        lt = g.filter(pa.array(~is_sig))
        rt = g.filter(pa.array(is_sig))
        empty = pa.table({f.name: pa.array([], f.type) for f in out_fields})
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        lkeys = lt.column(key).to_numpy(zero_copy_only=False)
        rkeys = rt.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(rkeys, kind="stable")
        rsorted = rkeys[order]
        pos = np.searchsorted(rsorted, lkeys)
        pos_c = np.clip(pos, 0, len(rsorted) - 1)
        hit = rsorted[pos_c] == lkeys
        take_r = order[pos_c[hit]]
        out = lt.filter(pa.array(hit)).select(left_names)
        sigs = rt.column(sig_name).take(pa.array(take_r))
        return out.append_column(sig_name, sigs.cast(pa.binary()))

    # <=16 blocks into the join shuffle (round-5 block-count law)
    return (both.repartition(16, shuffle=False)
            .groupby("_bucket").map_groups(join_bucket,
                                           batch_format="pyarrow"))


def verify_pairs(sig_ds: Dataset, pairs_ds: Dataset, id_col: str = "doc_id",
                 threshold: float = 0.8, B: int = 32) -> Dataset:
    """Distributed signature verification: semi-filter the signature shards
    to the candidate ENDPOINTS (broadcast id set — bounded by the LSH bucket
    caps, candidates ≪ corpus), then join pairs to the filtered shards on
    each endpoint and compare signatures VECTORIZED per batch. Full
    signatures never land on the driver (only the candidate id set does) and
    never shuffle corpus-wide; only pairs clearing ``threshold`` survive.
    -> Dataset[(a, b, est_jaccard)]."""
    import ray
    import pyarrow.compute as pc

    pairs_df = pairs_ds.to_pandas()  # (a, b) only — cap-bounded
    if pairs_df.empty:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64())}))
    pairs_ds = ray.data.from_arrow(pa.Table.from_pandas(
        pairs_df[["a", "b"]], preserve_index=False)
        .replace_schema_metadata(None))
    need = np.unique(np.concatenate([pairs_df["a"].to_numpy(np.int64),
                                     pairs_df["b"].to_numpy(np.int64)]))
    need_ref = ray.put(pa.array(need))

    def semi(t: pa.Table) -> pa.Table:
        ks = ray.get(need_ref)
        return t.filter(pc.is_in(t.column(id_col), value_set=ks))

    sig_small = sig_ds.map_batches(semi, batch_format="pyarrow")
    sig_a = sig_small.map_batches(
        lambda t: _pack_sigs(t, id_col, "a", "sig_a"), batch_format="pyarrow")
    sig_b = sig_small.map_batches(
        lambda t: _pack_sigs(t, id_col, "b", "sig_b"), batch_format="pyarrow")
    s1 = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    j = _attach_sig(pairs_ds, sig_a, "a", "sig_a", s1, B)
    s2 = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    ("sig_a", pa.binary())])
    j = _attach_sig(j, sig_b, "b", "sig_b", s2, B)

    def est(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = np.frombuffer(b"".join(t.column("sig_a").to_pylist()),
                           dtype="<i8").reshape(n, -1)
        sb = np.frombuffer(b"".join(t.column("sig_b").to_pylist()),
                           dtype="<i8").reshape(n, -1)
        e = (sa == sb).mean(axis=1)
        keep = e >= threshold
        return pa.table({
            "a": t.column("a").filter(pa.array(keep)),
            "b": t.column("b").filter(pa.array(keep)),
            "est_jaccard": pa.array(e[keep]),
        })

    return j.map_batches(est, batch_format="pyarrow")


def minhash_dedup_pairs(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 128, bands: int = 32, shingle_k: int = 3,
                        threshold: float = 0.8, seed: int = 7) -> pd.DataFrame:
    """Full near-dup pipeline: candidates via LSH, verified by estimated
    Jaccard (signature agreement) >= threshold. Returns (a, b, est_jaccard).

    Fully distributed: signatures stay sharded (materialized ONCE in the
    object store — banding and verification both read them, recomputing the
    signature pass per consumer would triple the dominant cost), candidate
    pairs are deduped by shuffle, and verification joins pairs back to
    endpoint-filtered signature shards — the driver materializes only the
    candidate id set and the verified pairs (both ≪ corpus by the LSH
    banding + bucket caps)."""
    import ray

    sigs = minhash_signatures(ds, text_col, id_col, num_hashes, shingle_k,
                              seed).materialize()
    # consolidate into ~64 MB blocks before the band shuffle: with many small
    # map blocks the sort's per-partition sub-blocks fall under Ray's
    # in-process-store threshold and accumulate in the DRIVER process
    # (measured: 64 blocks -> 1.5 GB driver RSS at 1M docs; 16 blocks ->
    # flat 30 MB and a 4x faster shuffle)
    nb = int(min(256, max(8, (sigs.size_bytes() or 0) // (64 << 20) + 1)))
    sigs = sigs.repartition(nb).materialize()
    cand = lsh_candidate_pairs_ds(sigs, id_col, num_hashes, bands)
    out = verify_pairs(sigs, cand, id_col, threshold).to_pandas()
    if out.empty:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
