"""Segment consolidation (force-merge): N segments -> fewer, larger segments.

The reference background-merges segments per tier (TieredMergePolicyProvider
defaults: ≤10 merges at once, 10 segments/tier, 5 GB ceiling —
TieredMergePolicyProvider.java:138-144,207-228) and exposes `_forcemerge`.
Our batch analogue: group adjacent segments (doc-id ranges stay contiguous,
so global ids are UNCHANGED — a pure re-layout), re-base each group's local
doc ids, and merge posting lists by ordered concatenation (disjoint ascending
doc ranges ⇒ no interleave needed, the cheap-merge property SURVEY §7.2-5
relies on). Runs as one Ray task per output segment.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from .build import IndexManifest, SegmentInfo, _finalize_index
from .postings import (MAX_DOCS_PER_CHUNK, encode_postings, decode_postings,
                       decode_positions_flat, encode_positions_flat)
from .segment import SEGMENT_SCHEMA


def _merge_group(index_dir: str, seg_ids: List[int], bases: List[int],
                 new_seg_id: int, has_positions: bool,
                 index_sort=()) -> dict:
    """Merge one group of segments into seg-{new_seg_id} (temp dir + rename).
    Doc ids inside the new segment are offset by each source's base minus the
    group's first base, preserving global order.

    ``index_sort``: the manifest's index-sorting contract. Concatenation
    preserves per-segment sortedness only when the sources are contiguous
    runs of the global sort order, so the merged segment keeps the
    ``index_sorted`` flag iff every source boundary satisfies
    last(prev) <= first(next) on the sort columns — the check Lucene makes
    unnecessary by merge-sorting doc ids under an index sort
    (MergeState/Sorter); our docids are global and immutable, so we verify
    instead of re-sorting."""
    group_base = bases[0]
    seg_dirs = [os.path.join(index_dir, "segments", f"seg-{sid:05d}")
                for sid in seg_ids]

    # --- doc store: concat with re-based local docids
    doc_tables = []
    total_docs = 0
    sum_dl = 0
    firsts, lasts = [], []
    for sd, b in zip(seg_dirs, bases):
        t = pq.read_table(os.path.join(sd, "docs.parquet"))
        if index_sort and t.num_rows:
            cols = [c for c in index_sort if c in t.column_names]
            firsts.append(tuple(t.column(c)[0].as_py() for c in cols))
            lasts.append(tuple(t.column(c)[-1].as_py() for c in cols))
        off = b - group_base
        if off:
            t = t.set_column(t.schema.get_field_index("docid"), "docid",
                             pc.add(t.column("docid"), pa.scalar(off, pa.int64())))
        meta = json.load(open(os.path.join(sd, "meta.json")))
        total_docs += meta["doc_count"]
        sum_dl += meta["sum_dl"]
        doc_tables.append(t)
    docstore = pa.concat_tables(doc_tables)
    norms = docstore.column("norm").to_numpy(zero_copy_only=False).astype(np.uint8)

    # --- postings: per-term ordered concat of decoded lists, re-encode
    post_tables = []
    for sd, b in zip(seg_dirs, bases):
        t = pq.read_table(os.path.join(sd, "postings.parquet"))
        t = t.append_column("_off", pa.array(
            np.full(t.num_rows, b - group_base, dtype=np.int64)))
        post_tables.append(t)
    allp = pa.concat_tables(post_tables).sort_by(
        [("term", "ascending"), ("_off", "ascending"), ("chunk", "ascending")])

    rows = {name: [] for name in SEGMENT_SCHEMA.names}
    cur_term = None
    cur_docs: List[np.ndarray] = []
    cur_tfs: List[np.ndarray] = []
    cur_pos: List[np.ndarray] = []
    vocab = 0

    def flush():
        nonlocal vocab
        if cur_term is None:
            return
        docids = np.concatenate(cur_docs)
        tfs = np.concatenate(cur_tfs)
        pos_flat = (np.concatenate(cur_pos) if has_positions and cur_pos
                    else None)
        tok_prefix = np.concatenate(([0], np.cumsum(tfs)))
        vocab += 1
        for ci, cs in enumerate(range(0, len(docids), MAX_DOCS_PER_CHUNK)):
            ce = min(cs + MAX_DOCS_PER_CHUNK, len(docids))
            enc = encode_postings(docids[cs:ce], tfs[cs:ce], norms)
            rows["term"].append(cur_term)
            rows["chunk"].append(ci)
            rows["df"].append(int(enc["df"]))
            rows["ttf"].append(int(enc["ttf"]))
            rows["docs_enc"].append(enc["docs_enc"])
            rows["tfs_enc"].append(enc["tfs_enc"])
            rows["skip_docs"].append(enc["skip_docs"])
            rows["skip_off"].append(enc["skip_off"])
            rows["skip_tf_off"].append(enc["skip_tf_off"])
            rows["block_max_tf"].append(enc["block_max_tf"])
            rows["block_min_norm"].append(enc["block_min_norm"])
            if pos_flat is not None:
                rows["pos_enc"].append(encode_positions_flat(
                    pos_flat[tok_prefix[cs]:tok_prefix[ce]], tfs[cs:ce]))
            else:
                rows["pos_enc"].append(b"")

    for row in allp.to_pylist():
        if row["term"] != cur_term:
            flush()
            cur_term = row["term"]
            cur_docs, cur_tfs, cur_pos = [], [], []
        d, t = decode_postings(row["docs_enc"], row["tfs_enc"], row["df"])
        cur_docs.append(d + row["_off"])
        cur_tfs.append(t)
        if has_positions and row["pos_enc"]:
            cur_pos.append(decode_positions_flat(row["pos_enc"], t))
    flush()

    postings = pa.table({n: pa.array(rows[n], type=SEGMENT_SCHEMA.field(n).type)
                         for n in SEGMENT_SCHEMA.names}, schema=SEGMENT_SCHEMA)

    out_dir = os.path.join(index_dir, "segments", f"seg-{new_seg_id:05d}")
    tmp = out_dir + f".tmp-merge-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings, os.path.join(tmp, "postings.parquet"),
                   compression="zstd", row_group_size=4096)
    pq.write_table(docstore, os.path.join(tmp, "docs.parquet"),
                   compression="zstd", row_group_size=65536)
    meta = {"doc_count": total_docs, "sum_dl": sum_dl, "vocab": vocab,
            "postings_rows": postings.num_rows,
            "has_positions": bool(has_positions), "merged_from": seg_ids}
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    index_sorted = bool(index_sort) and all(
        lasts[i] <= firsts[i + 1] for i in range(len(firsts) - 1))
    return {"tmp": tmp, "out_dir": out_dir, "seg_id": new_seg_id,
            "doc_count": total_docs, "sum_dl": sum_dl, "vocab": vocab,
            "doc_base": group_base, "sources": seg_dirs,
            "index_sorted": index_sorted}


def force_merge(manifest: IndexManifest, max_segments: int = 1,
                hot_df_threshold: int = 1_000_000) -> IndexManifest:
    """`_forcemerge` analogue: consolidate to <= max_segments segments (one
    Ray task per output group), then rebuild stats + the bucket merge.
    Global doc ids are unchanged, so query results are identical."""
    segs = sorted(manifest.segments, key=lambda s: s.seg_id)
    if len(segs) <= max_segments:
        return manifest
    groups: List[List[SegmentInfo]] = [[] for _ in range(max_segments)]
    per = (len(segs) + max_segments - 1) // max_segments
    for i, s in enumerate(segs):
        groups[i // per].append(s)
    groups = [g for g in groups if g]

    merge_task = ray.remote(num_cpus=1)(_merge_group)
    futures = [
        merge_task.remote(manifest.index_dir, [s.seg_id for s in g],
                          [s.doc_base for s in g], gi,
                          manifest.has_positions, manifest.index_sort)
        for gi, g in enumerate(groups)
    ]
    results = ray.get(futures)

    # atomically swap: remove sources, rename temp dirs to their new ids
    for r in results:
        for sd in r["sources"]:
            shutil.rmtree(sd, ignore_errors=True)
    for r in sorted(results, key=lambda r: r["seg_id"]):
        if os.path.exists(r["out_dir"]):
            shutil.rmtree(r["out_dir"])
        os.rename(r["tmp"], r["out_dir"])

    new_segments = [
        SegmentInfo(seg_id=r["seg_id"], path=f"merge:{r['seg_id']}",
                    doc_count=r["doc_count"], sum_dl=r["sum_dl"],
                    doc_base=r["doc_base"], vocab=r["vocab"],
                    index_sorted=r["index_sorted"])
        for r in sorted(results, key=lambda r: r["seg_id"])
    ]
    # leftover old segment dirs with ids >= len(groups) must go
    seg_root = os.path.join(manifest.index_dir, "segments")
    keep = {f"seg-{r['seg_id']:05d}" for r in results}
    for d in os.listdir(seg_root):
        if d.startswith("seg-") and d not in keep:
            shutil.rmtree(os.path.join(seg_root, d), ignore_errors=True)
    shutil.rmtree(os.path.join(manifest.index_dir, "merged"), ignore_errors=True)

    new_manifest = IndexManifest(
        index_dir=manifest.index_dir, segments=new_segments,
        total_docs=manifest.total_docs, sum_dl=manifest.sum_dl,
        analyzer=manifest.analyzer, text_col=manifest.text_col,
        num_buckets=manifest.num_buckets,
        has_positions=manifest.has_positions,
        index_sort=manifest.index_sort)
    return _finalize_index(new_manifest, hot_df_threshold, merge=True,
                           materialize_postings=True)


# ------------------------------------------------------------------- split

def _split_one(index_dir: str, seg_id: int, parts: int,
               has_positions: bool, index_sorted: bool) -> List[dict]:
    """Split one source segment into ``parts`` temp segments along
    contiguous local-docid ranges (the inverse of _merge_group: a pure
    re-layout, global doc ids unchanged — the split side of the
    reference's resize API, TransportResizeAction.java:77, where a split
    target's shards each own a slice of the source's docs)."""
    sd = os.path.join(index_dir, "segments", f"seg-{seg_id:05d}")
    docstore = pq.read_table(os.path.join(sd, "docs.parquet"))
    postings = pq.read_table(os.path.join(sd, "postings.parquet"))
    n = docstore.num_rows
    bounds = [n * i // parts for i in range(parts + 1)]

    # decode each term once (concatenating its chunks), then cut per part
    terms, term_docs, term_tfs, term_pos = [], [], [], []
    cur, docs_c, tfs_c, pos_c = None, [], [], []

    def close_term():
        if cur is None:
            return
        d = np.concatenate(docs_c)
        t = np.concatenate(tfs_c)
        terms.append(cur)
        term_docs.append(d)
        term_tfs.append(t)
        term_pos.append(np.concatenate(pos_c) if pos_c else None)

    for row in postings.sort_by([("term", "ascending"),
                                 ("chunk", "ascending")]).to_pylist():
        if row["term"] != cur:
            close_term()
            cur, docs_c, tfs_c, pos_c = row["term"], [], [], []
        d, t = decode_postings(row["docs_enc"], row["tfs_enc"], row["df"])
        docs_c.append(d)
        tfs_c.append(t)
        if has_positions and row["pos_enc"]:
            pos_c.append(decode_positions_flat(row["pos_enc"], t))
    close_term()

    out = []
    for pi in range(parts):
        lo, hi = bounds[pi], bounds[pi + 1]
        ds_part = docstore.slice(lo, hi - lo)
        if lo:
            ds_part = ds_part.set_column(
                ds_part.schema.get_field_index("docid"), "docid",
                pc.subtract(ds_part.column("docid"),
                            pa.scalar(lo, pa.int64())))
        norms = ds_part.column("norm").to_numpy(
            zero_copy_only=False).astype(np.uint8)
        rows = {name: [] for name in SEGMENT_SCHEMA.names}
        vocab = 0
        for term, d, t, p in zip(terms, term_docs, term_tfs, term_pos):
            a = int(np.searchsorted(d, lo))
            b2 = int(np.searchsorted(d, hi))
            if a == b2:
                continue
            vocab += 1
            dd, tt = d[a:b2] - lo, t[a:b2]
            if p is not None:
                tok = np.concatenate(([0], np.cumsum(t)))
                pp = p[tok[a]:tok[b2]]
            for ci, cs in enumerate(range(0, len(dd), MAX_DOCS_PER_CHUNK)):
                ce = min(cs + MAX_DOCS_PER_CHUNK, len(dd))
                enc = encode_postings(dd[cs:ce], tt[cs:ce], norms)
                rows["term"].append(term)
                rows["chunk"].append(ci)
                rows["df"].append(int(enc["df"]))
                rows["ttf"].append(int(enc["ttf"]))
                rows["docs_enc"].append(enc["docs_enc"])
                rows["tfs_enc"].append(enc["tfs_enc"])
                rows["skip_docs"].append(enc["skip_docs"])
                rows["skip_off"].append(enc["skip_off"])
                rows["skip_tf_off"].append(enc["skip_tf_off"])
                rows["block_max_tf"].append(enc["block_max_tf"])
                rows["block_min_norm"].append(enc["block_min_norm"])
                if p is not None:
                    tokp = np.concatenate(([0], np.cumsum(tt)))
                    rows["pos_enc"].append(encode_positions_flat(
                        pp[tokp[cs]:tokp[ce]], tt[cs:ce]))
                else:
                    rows["pos_enc"].append(b"")
        ptab = pa.table({nm: pa.array(rows[nm],
                                      type=SEGMENT_SCHEMA.field(nm).type)
                         for nm in SEGMENT_SCHEMA.names},
                        schema=SEGMENT_SCHEMA)
        dl = ds_part.column("dl").to_numpy(zero_copy_only=False)
        tmp = sd + f".split-{pi}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(ptab, os.path.join(tmp, "postings.parquet"),
                       compression="zstd", row_group_size=4096)
        pq.write_table(ds_part, os.path.join(tmp, "docs.parquet"),
                       compression="zstd", row_group_size=65536)
        meta = {"doc_count": hi - lo, "sum_dl": int(dl.sum()),
                "vocab": vocab, "postings_rows": ptab.num_rows,
                "has_positions": bool(has_positions),
                "split_from": seg_id}
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        out.append({"tmp": tmp, "src_seg": seg_id, "part": pi,
                    "doc_count": hi - lo, "sum_dl": int(dl.sum()),
                    "vocab": vocab, "local_base": lo,
                    "index_sorted": index_sorted})
    return out


def split_index(manifest: IndexManifest, factor: int = 2,
                hot_df_threshold: int = 1_000_000) -> IndexManifest:
    """`_split` analogue (ResizeType.SPLIT, TransportResizeAction.java):
    each source segment -> ``factor`` segments along contiguous doc ranges.
    Global doc ids are UNCHANGED (each part's base = source base + its
    local offset), so query results are identical while per-segment
    parallelism grows ×factor. One Ray task per source segment; stats +
    bucket merge rebuilt by _finalize_index."""
    if factor < 2:
        return manifest
    segs = sorted(manifest.segments, key=lambda s: s.seg_id)
    task = ray.remote(num_cpus=1)(_split_one)
    results = ray.get([
        task.remote(manifest.index_dir, s.seg_id, factor,
                    manifest.has_positions,
                    getattr(s, "index_sorted", True))
        for s in segs])

    src_base = {s.seg_id: s.doc_base for s in segs}
    flat = [p for parts in results for p in parts]
    flat.sort(key=lambda p: (src_base[p["src_seg"]], p["part"]))
    seg_root = os.path.join(manifest.index_dir, "segments")
    for s in segs:  # sources out first: ids collide with the new layout
        shutil.rmtree(os.path.join(seg_root, f"seg-{s.seg_id:05d}"),
                      ignore_errors=True)
    new_segments = []
    for new_id, p in enumerate(flat):
        dst = os.path.join(seg_root, f"seg-{new_id:05d}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(p["tmp"], dst)
        new_segments.append(SegmentInfo(
            seg_id=new_id, path=f"split:{p['src_seg']}:{p['part']}",
            doc_count=p["doc_count"], sum_dl=p["sum_dl"],
            doc_base=src_base[p["src_seg"]] + p["local_base"],
            vocab=p["vocab"], index_sorted=p["index_sorted"]))
    shutil.rmtree(os.path.join(manifest.index_dir, "merged"),
                  ignore_errors=True)
    new_manifest = IndexManifest(
        index_dir=manifest.index_dir, segments=new_segments,
        total_docs=manifest.total_docs, sum_dl=manifest.sum_dl,
        analyzer=manifest.analyzer, text_col=manifest.text_col,
        num_buckets=manifest.num_buckets,
        has_positions=manifest.has_positions,
        index_sort=manifest.index_sort)
    return _finalize_index(new_manifest, hot_df_threshold, merge=True,
                           materialize_postings=True)
