"""Exact substring-level dedup signals + benchmark decontamination.

Two training-data operators beyond the reference's surface (the graft
brief's LLM-pipeline family; public method: Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL'22 — the k-token
duplicated-window statistic, computed here by hashed-window co-occurrence
rather than a suffix array, which is the Ray-natural formulation):

- :func:`duplicated_window_stats` — for every doc, how many of its
  k-token windows also appear in ANOTHER doc (cross-doc duplicated
  spans). One low-cardinality hash-partition shuffle of packed
  (window-hash, doc) rows; all per-partition reductions vectorized.
- :func:`decontaminate` — flag docs sharing any k-token window with a
  BENCHMARK set (eval-set leakage removal). The benchmark windows are
  hashed ONCE and broadcast via ``ray.put``; the corpus pass is map-only
  (the kill-list pattern — nothing shuffles).

Both use the same analyzer tokenization as the index, so "window" means
analyzer tokens, not raw bytes. 64-bit window-hash collisions are the
only approximation (~n^2/2^64, same contract as dedup/cluster.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _window_hashes(tokens_flat: np.ndarray, offsets: np.ndarray,
                   k: int):
    """Rolling k-token window hashes per doc from a flattened token-hash
    array. -> (win_hash uint64, doc_row int64, pos int64) arrays; docs
    shorter than k contribute nothing. Vectorized: k shifted multiplies
    over the flat array, windows crossing doc boundaries masked out."""
    n = tokens_flat.size
    counts = np.diff(offsets)
    if n == 0 or k <= 0:
        z = np.empty(0, np.int64)
        return np.empty(0, np.uint64), z, z
    # combine k consecutive token hashes with position-dependent mixing
    acc = np.zeros(max(n - k + 1, 0), np.uint64)
    if acc.size == 0:
        z = np.empty(0, np.int64)
        return np.empty(0, np.uint64), z, z
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = (acc * _MIX) ^ tokens_flat[j:n - k + 1 + j]
    doc_of = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    start_doc = doc_of[:acc.size]
    end_doc = doc_of[k - 1:]
    ok = start_doc == end_doc  # window fully inside one doc
    pos = (np.arange(acc.size, dtype=np.int64)
           - offsets[:-1][start_doc])[ok]
    return acc[ok], start_doc[ok], pos


def _doc_windows(t: pa.Table, text_col: str, id_col: str,
                 analyzer: str, k: int):
    """One batch -> (win_hash, doc_id, pos) arrays."""
    from ..analysis.analyzer import analyze_batch

    a = analyze_batch(t.select([id_col, text_col]), analyzer=analyzer)
    toks = a.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    ids = a.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    th = (pd.util.hash_array(flat.to_numpy(zero_copy_only=False))
          .astype(np.uint64) if len(flat) else np.empty(0, np.uint64))
    wh, drow, pos = _window_hashes(th, offsets, k)
    return wh, ids[drow] if drow.size else np.empty(0, np.int64), pos


def duplicated_window_stats(ds: Dataset, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 8,
                            analyzer: str = "transcript",
                            P: int = 256, B: int = 32) -> Dataset:
    """Per-doc duplicated-span statistics: for each doc, the number of
    DISTINCT k-token windows that also occur in at least one OTHER doc,
    plus its total distinct window count.
    -> Dataset[(doc_id, n_windows, n_dup_windows)], docs with >= 1
    window only.

    Distributed shape: window rows shuffle ONCE by hash(window) % P (low
    cardinality, skew-proof); cross-doc duplication is decided inside the
    owning partition (lexsort + segment reduction); per-doc totals come
    from a SECOND low-cardinality shuffle over hash(doc) % B — never a
    per-key Ray Aggregate (whose sort shuffle costs driver memory
    quadratic in block count at corpus-scale key counts)."""

    def explode(t: pa.Table) -> pa.Table:
        wh, ids, _pos = _doc_windows(t, text_col, id_col, analyzer, k)
        if wh.size:
            # distinct (window, doc): within-doc repeats count once —
            # the cross-doc statistic
            u = np.unique(np.stack((wh.astype(np.int64), ids), axis=1),
                          axis=0)
            wh, ids = u[:, 0].astype(np.uint64), u[:, 1]
        return pa.table({
            "wh": pa.array(wh.astype(np.int64)),
            "doc": pa.array(ids),
            "_part": pa.array((wh % np.uint64(P)).astype(np.int32))})

    # block-count hygiene BEFORE the shuffle: Ray's sort shuffle costs
    # driver memory superlinear in input BLOCK count and ~nothing at
    # <=16 blocks (measured here: 7.3M rows — 16 blocks 0 MB, 64 blocks
    # 295 MB driver peak); the merge is local, no data re-keying
    rows = (ds.map_batches(explode, batch_format="pyarrow")
            .repartition(16, shuffle=False))

    def mark_dup(g: pa.Table) -> pa.Table:
        """Inside one window-hash partition: a (window, doc) row is
        duplicated iff its window maps to >= 2 distinct docs; emit
        per-doc partials keyed by the DOC partition for the final
        reduce."""
        wh = g.column("wh").to_numpy(zero_copy_only=False)
        doc = g.column("doc").to_numpy(zero_copy_only=False)
        if wh.size == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64()),
                             "_dp": pa.array([], pa.int32())})
        order = np.lexsort((doc, wh))
        wh_s, doc_s = wh[order], doc[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], wh_s[1:] != wh_s[:-1])))
        sizes = np.diff(np.append(starts, wh_s.size))
        dup_per_row = np.repeat(sizes >= 2, sizes)
        # per-doc partials within this partition
        d_order = np.argsort(doc_s, kind="stable")
        d_s = doc_s[d_order]
        dup_s = dup_per_row[d_order].astype(np.int64)
        d_starts = np.flatnonzero(np.concatenate(
            ([True], d_s[1:] != d_s[:-1])))
        d_sizes = np.diff(np.append(d_starts, d_s.size))
        csum = np.concatenate(([0], np.cumsum(dup_s)))
        ends = np.append(d_starts[1:], d_s.size)
        nd = csum[ends] - csum[d_starts]
        docs_out = d_s[d_starts]
        dp = (pd.util.hash_array(docs_out.astype(np.int64))
              % np.uint64(B)).astype(np.int32)
        return pa.table({"doc": pa.array(docs_out),
                         "n": pa.array(d_sizes.astype(np.int64)),
                         "nd": pa.array(nd),
                         "_dp": pa.array(dp)})

    partials = rows.groupby("_part").map_groups(mark_dup,
                                                batch_format="pyarrow")

    def reduce_doc(g: pa.Table) -> pa.Table:
        """Sum per-doc partials inside one doc partition (docs keyed to
        partitions whole via hash(doc) % B)."""
        doc = g.column("doc").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        nd = g.column("nd").to_numpy(zero_copy_only=False)
        if doc.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_windows": pa.array([], pa.int64()),
                             "n_dup_windows": pa.array([], pa.int64())})
        order = np.argsort(doc, kind="stable")
        d_s = doc[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], d_s[1:] != d_s[:-1])))
        ends = np.append(starts[1:], d_s.size)
        cn = np.concatenate(([0], np.cumsum(n[order])))
        cd = np.concatenate(([0], np.cumsum(nd[order])))
        return pa.table({
            id_col: pa.array(d_s[starts]),
            "n_windows": pa.array(cn[ends] - cn[starts]),
            "n_dup_windows": pa.array(cd[ends] - cd[starts])})

    # same block-count hygiene for the P per-part partial blocks
    return (partials.repartition(16, shuffle=False)
            .groupby("_dp").map_groups(reduce_doc,
                                       batch_format="pyarrow"))


def decontaminate(ds: Dataset, benchmark: Dataset,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: Optional[str] = None, k: int = 8,
                  analyzer: str = "transcript") -> Dataset:
    """Eval-set decontamination: append ``contaminated`` (bool) — True
    when the doc shares ANY k-token window with the benchmark set.

    The benchmark side must be SMALL (an eval set); its window-hash set
    is built in one pass and broadcast via ``ray.put`` — the corpus scan
    is map-only, no shuffle (the kill-list pattern of
    pipelines/training_data.py)."""
    bench_text_col = bench_text_col or text_col

    hashes: list = []
    for t in benchmark.to_arrow_refs():
        tb = ray.get(t)
        if tb.num_rows == 0:
            continue
        if id_col not in tb.column_names:
            tb = tb.append_column(id_col, pa.array(
                np.arange(tb.num_rows, dtype=np.int64)))
        wh, _ids, _pos = _doc_windows(
            tb.select([id_col, bench_text_col])
            .rename_columns([id_col, text_col]),
            text_col, id_col, analyzer, k)
        if wh.size:
            hashes.append(np.unique(wh))
    bench_set = (np.unique(np.concatenate(hashes)) if hashes
                 else np.empty(0, np.uint64))
    bench_ref = ray.put(bench_set)

    def flag(t: pa.Table) -> pa.Table:
        bs = ray.get(bench_ref)
        wh, ids, _pos = _doc_windows(t, text_col, id_col, analyzer, k)
        bad: set = set()
        if wh.size and bs.size:
            pos = np.searchsorted(bs, wh)
            ok = pos < bs.size
            ok[ok] = bs[pos[ok]] == wh[ok]
            bad = set(ids[ok].tolist())
        tids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "contaminated",
            pa.array(np.isin(tids.astype(np.int64),
                             np.fromiter(bad, np.int64, len(bad)))))

    return ds.map_batches(flag, batch_format="pyarrow")


def remove_duplicated_spans(ds: Dataset, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 8,
                            P: int = 256) -> Dataset:
    """Exact-substring dedup with span REMOVAL (Lee et al. ACL'22
    "Deduplicating Training Data Makes Language Models Better" —
    ExactSubstr's cut step, not just the statistics): every k-token
    window occurring in >= 2 distinct docs keeps exactly ONE occurrence
    (the first by (doc id, position)); every other occurrence's tokens
    are cut from their docs. Overlapping duplicated windows union their
    covered positions before the cut.

    Tokens are RAW whitespace splits (``str.split(' ')``, empties kept)
    so the rewrite is loss-free outside removed spans and the whole
    operator round-trips through a SQL oracle.

    -> Dataset(id_col, text_col<rewritten>, removed_tokens). Distributed
    shape mirrors line_dedup: window rows co-locate via ONE
    hash(window) % P low-cardinality shuffle (winner decided in the
    owning partition), removal markers re-shuffle by hash(doc) % P to
    meet the per-doc text marker rows for the rewrite. Doc text crosses
    each exchange once — the rebuild floor. No driver materialization.
    """
    import pyarrow.compute as pc
    from opensearch_ray.arrowutil import nometa

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = t.column(text_col)
        toks = pc.split_pattern(texts, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = toks.flatten()
        th = (pd.util.hash_array(flat.to_numpy(zero_copy_only=False))
              .astype(np.uint64) if len(flat) else np.empty(0, np.uint64))
        wh, drow, pos = _window_hashes(th, offsets, k)
        docs = ids[drow] if drow.size else np.empty(0, np.int64)
        dh = (pd.util.hash_array(ids.astype(np.uint64))
              % np.uint64(P)).astype(np.int32)
        return nometa(pa.table({
            id_col: pa.array(np.concatenate((docs, ids))),
            "_pos": pa.array(np.concatenate(
                (pos, np.full(len(ids), -1, np.int64)))),
            "_wh": pa.array(np.concatenate(
                (wh.astype(np.int64), np.zeros(len(ids), np.int64)))),
            "_text": pa.concat_arrays([
                pa.nulls(int(wh.size), pa.string()),
                texts.combine_chunks() if isinstance(
                    texts, pa.ChunkedArray) else texts]),
            "_part": pa.array(np.concatenate((
                (wh % np.uint64(P)).astype(np.int32), dh))),
        }))

    def decide(g: pa.Table) -> pa.Table:
        """One window-hash partition: keep markers; of each duplicated
        window's occurrences emit all but the (doc, pos)-first as
        removal rows, re-keyed by hash(doc) % P."""
        posv = g.column("_pos").to_numpy(zero_copy_only=False)
        real = g.filter(pa.array(posv >= 0))
        marks = g.filter(pa.array(posv < 0))
        outs = [pa.table({
            id_col: marks.column(id_col),
            "_pos": marks.column("_pos"),
            "_text": marks.column("_text"),
            "_part": marks.column("_part")})]
        if real.num_rows:
            wh = real.column("_wh").to_numpy(zero_copy_only=False)
            doc = real.column(id_col).to_numpy(zero_copy_only=False)
            pos = real.column("_pos").to_numpy(zero_copy_only=False)
            order = np.lexsort((pos, doc, wh))
            wh_s, doc_s, pos_s = wh[order], doc[order], pos[order]
            grp_start = np.concatenate(([True], wh_s[1:] != wh_s[:-1]))
            starts = np.flatnonzero(grp_start)
            sizes = np.diff(np.append(starts, wh_s.size))
            doc_start = grp_start | np.concatenate(
                ([False], doc_s[1:] != doc_s[:-1]))
            distinct = np.add.reduceat(doc_start.astype(np.int64), starts)
            dup_row = np.repeat(distinct >= 2, sizes)
            first_row = np.zeros(wh_s.size, bool)
            first_row[starts] = True
            emit = dup_row & ~first_row
            docs_out = doc_s[emit]
            dh = (pd.util.hash_array(docs_out.astype(np.uint64))
                  % np.uint64(P)).astype(np.int32)
            outs.append(pa.table({
                id_col: pa.array(docs_out),
                "_pos": pa.array(pos_s[emit]),
                "_text": pa.nulls(int(emit.sum()), pa.string()),
                "_part": pa.array(dh)}))
        return nometa(pa.concat_tables(outs))

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        marks = g[g["_pos"] < 0]
        rem = g[g["_pos"] >= 0]
        rem_by_doc = {d: sub["_pos"].to_numpy()
                      for d, sub in rem.groupby(id_col)}
        out_id, out_text, out_n = [], [], []
        for _, row in marks.iterrows():
            d = row[id_col]
            text = row["_text"]
            positions = rem_by_doc.get(d)
            if positions is None or not len(positions):
                out_id.append(d)
                out_text.append(text)
                out_n.append(0)
                continue
            toks = text.split(" ")
            n = len(toks)
            delta = np.zeros(n + 1, np.int64)
            np.add.at(delta, np.minimum(positions, n), 1)
            np.add.at(delta, np.minimum(positions + k, n), -1)
            covered = np.cumsum(delta[:-1]) > 0
            kept = [tk for tk, c in zip(toks, covered) if not c]
            out_id.append(d)
            out_text.append(" ".join(kept))
            out_n.append(int(covered.sum()))
        return pd.DataFrame({id_col: out_id, text_col: out_text,
                             "removed_tokens": out_n})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .repartition(16, shuffle=False)
            .groupby("_part").map_groups(decide, batch_format="pyarrow")
            .repartition(16, shuffle=False)
            .groupby("_part").map_groups(rewrite, batch_format="pandas"))
