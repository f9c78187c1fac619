"""Segment construction: one input partition -> one immutable mini-index.

Mirrors what Lucene's IndexWriter produces per flush (ref
/root/reference/server/src/main/java/org/opensearch/index/engine/InternalEngine.java:1107-1186
``indexIntoLucene -> addDocs``): an immutable segment holding

- ``postings.parquet``  — one row per (term, chunk): the codec columns from
  :mod:`opensearch_ray.index.postings`, terms sorted lexicographically (so
  parquet row-group stats prune term lookups).
- ``docs.parquet``      — the doc store (= ``_source`` + norms, ref
  SourceFieldMapper.java:72-92): original columns + ``docid`` (segment-local),
  ``dl`` (exact token count) + ``norm`` (lossy byte).
- ``meta.json``         — doc_count, sum_dl (exact), vocab size, input lineage.

Doc ids are SEGMENT-LOCAL (0..doc_count-1) in the stable (conv_id, turn_idx)
order of the partition; global ids = manifest base + local (computed after all
segments are built, so the build needs NO counting pre-pass).

The inverted index is built fully vectorized: Arrow dictionary-encode of the
flat token stream + one lexsort of (term_id, doc) pairs + run-length collapse
-> per-term ascending (docid, tf) arrays, then one varbyte pass for the whole
segment (see postings.encode_postings's single-pass layout).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis import get_analyzer
from .norms import encode_norms
from .postings import (
    BLOCK_SIZE,
    MAX_DOCS_PER_CHUNK,
    _vb_sizes,
    vb_encode,
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("chunk", pa.int32()),
        ("df", pa.int32()),
        ("ttf", pa.int64()),
        ("docs_enc", pa.binary()),
        ("tfs_enc", pa.binary()),
        ("skip_docs", pa.list_(pa.int32())),
        ("skip_off", pa.list_(pa.int32())),
        ("skip_tf_off", pa.list_(pa.int32())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_norm", pa.list_(pa.int32())),
        # delta-gapped varbyte token positions per posting (empty unless the
        # index stores positions — DOCS_AND_FREQS_AND_POSITIONS parity,
        # TextFieldMapper.java:128-136)
        ("pos_enc", pa.binary()),
    ]
)


def _terms_docs_tfs(
    tokens: pa.ListArray, n_docs: int
) -> Tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flat token list column -> (term_dictionary_sorted, term_ids, docids,
    tfs, dl) where (term_ids, docids) are sorted by (term, doc) and collapsed
    to unique pairs with tf counts."""
    tokens = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    dl = np.diff(offsets)
    flat = tokens.flatten()
    if len(flat) == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64), dl

    dict_arr = pc.dictionary_encode(flat)
    raw_terms = dict_arr.dictionary
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    # lexicographically sort the dictionary, remap codes
    sort_idx = pc.sort_indices(raw_terms).to_numpy(zero_copy_only=False).astype(np.int64)
    terms_sorted = raw_terms.take(pa.array(sort_idx))
    remap = np.empty(len(sort_idx), dtype=np.int64)
    remap[sort_idx] = np.arange(len(sort_idx))
    term_ids_tok = remap[codes]

    doc_of_token = np.repeat(np.arange(n_docs, dtype=np.int64), dl)
    # unique (term, doc) pairs with counts == tf; key sort order = (term, doc)
    key = term_ids_tok * np.int64(n_docs) + doc_of_token
    ukey, tfs = np.unique(key, return_counts=True)
    term_ids = ukey // n_docs
    docids = ukey % n_docs
    return terms_sorted, term_ids, docids, tfs.astype(np.int64), dl


_FAST_TEXT_RE = r"^[a-z0-9_ ]*$"  # rows where space-split == standard tokenizer


def _tokenize_to_ids(table: pa.Table, text_col: str, analyzer,
                     want_positions: bool = False):
    """Analyze + dictionary-encode fused, with an Arrow-C fast path.

    Rows whose lowercased text is plain ``[a-z0-9_ ]`` tokenize identically
    under space-split and the standard tokenizer, so they run entirely in
    Arrow kernels (utf8_lower -> split_pattern -> stopword is_in filter ->
    dictionary_encode). Only rows with punctuation / unicode / >255-char
    tokens take the per-row Python analyzer. The two paths never need their
    token STREAMS merged: downstream only consumes (term_id, doc) PAIRS,
    which are unioned before one np.unique. This keeps per-task allocation
    churn in C buffers, not PyObjects — the difference between ~12x slowdown
    and near-linear behavior with 32 concurrent builder tasks on fault-bound
    VMs. Returns (terms_sorted, term_ids, docids, tfs, dl, pos_flat) where
    pos_flat (None unless want_positions) holds each posting's ascending
    token positions (stop-gap-preserving), concatenated in posting order.
    """
    an = get_analyzer(analyzer)
    if isinstance(text_col, (list, tuple)):
        # copy_to target (FieldMapper.CopyTo / DocumentParser.parseCopyFields):
        # the synthetic field indexes every source field's tokens for this
        # doc — zero-copy space-join keeps doc order and length norms
        # (dl = Σ source dls) exactly as the reference's combined field
        srcs = [pc.cast(table.column(c), pa.string()) for c in text_col]
        col = pc.binary_join_element_wise(
            *srcs, pa.scalar(" "), null_handling="replace",
            null_replacement="")
    else:
        col = table.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        return _tokenize_multivalue(col, analyzer, want_positions)
    n_docs = table.num_rows
    nd = max(n_docs, 1)
    dl = np.zeros(n_docs, dtype=np.int64)
    sw = an._stop_fast

    pair_term_parts: List[np.ndarray] = []
    pair_doc_parts: List[np.ndarray] = []
    pair_pos_parts: List[np.ndarray] = []
    vocab: dict = {}
    terms_list: List[str] = []

    slow_rows: np.ndarray
    if an._lower_fast and n_docs:
        low = pc.utf8_lower(col)
        fast_mask = pc.match_substring_regex(low, _FAST_TEXT_RE)
        fm = pc.fill_null(fast_mask, False).to_numpy(zero_copy_only=False)
        fast_idx = np.flatnonzero(fm)
        if fast_idx.size:
            fast_texts = low.take(pa.array(fast_idx))
            tok_list = pc.split_pattern(fast_texts, " ")
            flat = tok_list.flatten()
            offs = tok_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            keep = pc.invert(pc.equal(flat, ""))
            if sw:
                keep = pc.and_(keep, pc.invert(
                    pc.is_in(flat, value_set=pa.array(sorted(sw)))))
            keep_np = keep.to_numpy(zero_copy_only=False)
            csum = np.concatenate(([0], np.cumsum(keep_np.astype(np.int64))))
            dl_fast = csum[offs[1:]] - csum[offs[:-1]]
            # >255-char tokens can only arise from 256+ char word runs; they
            # must go through the splitting slow path
            lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            too_long = (lens > 255) & keep_np
            if too_long.any():
                bad_local = np.unique(
                    np.searchsorted(offs[1:], np.flatnonzero(too_long), side="right"))
                bad_mask_local = np.zeros(fast_idx.size, dtype=bool)
                bad_mask_local[bad_local] = True
                # drop bad rows from the fast path
                tok_keep_row = ~bad_mask_local[
                    np.searchsorted(offs[1:], np.arange(len(flat)), side="right")]
                keep_np = keep_np & tok_keep_row
                keep = pa.array(keep_np)
                csum = np.concatenate(([0], np.cumsum(keep_np.astype(np.int64))))
                dl_fast = csum[offs[1:]] - csum[offs[:-1]]
                fm[fast_idx[bad_mask_local]] = False
            flat_kept = flat.filter(keep)
            if len(flat_kept):
                denc = pc.dictionary_encode(flat_kept)
                codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                terms_list = denc.dictionary.to_pylist()
                vocab = {t: i for i, t in enumerate(terms_list)}
                pair_term_parts.append(codes)
                pair_doc_parts.append(np.repeat(fast_idx, dl_fast))
                if want_positions:
                    # position = rank among NON-empty tokens in the row
                    # (pre-stop-filter -> stopword gaps preserved)
                    ne = pc.invert(pc.equal(flat, "")).to_numpy(zero_copy_only=False)
                    cne = np.cumsum(ne.astype(np.int64))
                    pre = np.concatenate(([0], cne))
                    row_of = np.searchsorted(offs[1:], np.arange(len(ne)),
                                             side="right")
                    pos_all = cne - 1 - pre[offs[row_of]]
                    pair_pos_parts.append(pos_all[keep_np])
            dl[fast_idx] = dl_fast
        slow_rows = np.flatnonzero(~fm)
    else:
        slow_rows = np.arange(n_docs, dtype=np.int64)

    if slow_rows.size:
        from array import array
        ids = array("i")
        doc_rep = array("q")
        poss = array("i")
        for ri in slow_rows:
            s = col[int(ri)].as_py()
            if not s:
                continue
            toks, tpos = an.analyze(s)
            dl[ri] = len(toks)
            for t in toks:
                ti = vocab.get(t)
                if ti is None:
                    ti = len(vocab)
                    vocab[t] = ti
                    terms_list.append(t)
                ids.append(ti)
            doc_rep.extend([int(ri)] * len(toks))
            if want_positions:
                poss.extend(tpos)
        if len(ids):
            pair_term_parts.append(np.frombuffer(ids, dtype=np.int32).astype(np.int64))
            pair_doc_parts.append(np.frombuffer(doc_rep, dtype=np.int64))
            if want_positions:
                pair_pos_parts.append(np.frombuffer(poss, dtype=np.int32).astype(np.int64))

    if not vocab:
        return (pa.array([], type=pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int64), np.empty(0, np.int64), dl,
                np.empty(0, np.int64) if want_positions else None)

    # sort the vocab lexicographically, remap ids
    order = sorted(range(len(terms_list)), key=terms_list.__getitem__)
    remap = np.empty(len(terms_list), dtype=np.int64)
    remap[np.asarray(order)] = np.arange(len(order))
    terms_sorted = [terms_list[i] for i in order]

    term_ids_tok = remap[np.concatenate(pair_term_parts)]
    doc_of_token = np.concatenate(pair_doc_parts)
    if not want_positions:
        key = term_ids_tok * np.int64(nd) + doc_of_token
        ukey, tfs = np.unique(key, return_counts=True)
        return (pa.array(terms_sorted, type=pa.string()), ukey // nd, ukey % nd,
                tfs.astype(np.int64), dl, None)
    pos_tok = np.concatenate(pair_pos_parts)
    order_tok = np.lexsort((pos_tok, doc_of_token, term_ids_tok))
    t_s = term_ids_tok[order_tok]
    d_s = doc_of_token[order_tok]
    p_s = pos_tok[order_tok]
    n_tok = t_s.size
    is_start = np.concatenate(([True], (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])))
    starts_tok = np.flatnonzero(is_start)
    tfs = np.diff(np.concatenate((starts_tok, [n_tok])))
    return (pa.array(terms_sorted, type=pa.string()), t_s[starts_tok],
            d_s[starts_tok], tfs.astype(np.int64), dl, p_s)


def _tokenize_multivalue(col: pa.Array, analyzer,
                         want_positions: bool = False,
                         position_increment_gap: int = 100):
    """Multi-valued text field (list<string> column). Lucene semantics
    (TextFieldMapper POSITION_INCREMENT_GAP_USE_ANALYZER default 100,
    DocumentParser indexes each value into the same field): every element
    analyzed independently; element k's token positions are offset by
    Σ_{j<k}(dl_j + gap) so phrase/span windows never straddle two values;
    dl counts REAL tokens only (the gap is virtual, norms unchanged).

    Implementation: flatten elements -> run the scalar tokenizer treating
    each ELEMENT as a doc (reusing the fused Arrow fast path verbatim) ->
    vectorized element→doc remap of pairs/positions."""
    n_docs = len(col)
    gap = int(position_increment_gap)
    counts = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = col.flatten()  # values of non-null slots only, in doc order
    doc_of_elem = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    n_elems = int(counts.sum())
    dl = np.zeros(n_docs, dtype=np.int64)
    if n_elems == 0:
        return (pa.array([], type=pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int64), np.empty(0, np.int64), dl,
                np.empty(0, np.int64) if want_positions else None)
    terms, t_ids, e_ids, tfs, dl_e, pos_e = _tokenize_to_ids(
        pa.table({"_t": flat}), "_t", analyzer,
        want_positions=want_positions)
    np.add.at(dl, doc_of_elem, dl_e)
    if len(t_ids) == 0:
        return (terms, t_ids, e_ids, tfs, dl,
                pos_e if want_positions else None)
    if not want_positions:
        docs_pair = doc_of_elem[e_ids]
        key = t_ids * np.int64(n_docs) + docs_pair
        order = np.argsort(key, kind="stable")
        ks, tf_s = key[order], tfs[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1])))
        tfs_out = np.add.reduceat(tf_s, starts)
        return (terms, ks[starts] // n_docs, ks[starts] % n_docs,
                tfs_out.astype(np.int64), dl, None)
    # element start offset inside its doc: exclusive prefix of (dl + gap)
    step = dl_e + gap
    gcs = np.concatenate(([0], np.cumsum(step)))[:-1]
    doc_first_elem = np.concatenate(([0], np.cumsum(counts)))[:-1]
    base_e = gcs - gcs[doc_first_elem[doc_of_elem]]
    # token-level expand (pos_e is already token-aligned to posting order)
    t_tok = np.repeat(t_ids, tfs)
    e_tok = np.repeat(e_ids, tfs)
    p_tok = pos_e + base_e[e_tok]
    d_tok = doc_of_elem[e_tok]
    order_tok = np.lexsort((p_tok, d_tok, t_tok))
    t_s, d_s, p_s = t_tok[order_tok], d_tok[order_tok], p_tok[order_tok]
    is_start = np.concatenate(
        ([True], (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])))
    starts_tok = np.flatnonzero(is_start)
    tfs_out = np.diff(np.concatenate((starts_tok, [t_s.size])))
    return (terms, t_s[starts_tok], d_s[starts_tok],
            tfs_out.astype(np.int64), dl, p_s)


def build_segment_table(
    table: pa.Table,
    tokens_col: str = "tokens",
    text_col: str = "text",
    analyzer="default",
    sort_cols: Optional[List[str]] = ("conv_id", "turn_idx"),
    index_positions: bool = False,
) -> Tuple[pa.Table, pa.Table, dict]:
    """Build one segment from a (partition's) Arrow table.

    If ``tokens_col`` is absent the table is analyzed here (``text_col`` +
    ``analyzer``, fused with dictionary encoding — see _tokenize_to_ids).
    Rows are sorted by ``sort_cols`` first (stable doc order — the north-rule
    invariant). Returns (postings, docstore, meta).
    """
    if sort_cols:
        present = [c for c in sort_cols if c in table.column_names]
        if present:
            table = table.sort_by([(c, "ascending") for c in present])

    n_docs = table.num_rows
    if tokens_col in table.column_names:
        if index_positions:
            raise ValueError("index_positions requires raw text input")
        tokens = table.column(tokens_col)
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        terms_sorted, term_ids, docids, tfs, dl = _terms_docs_tfs(tokens, max(n_docs, 1))
        pos_flat = None
        drop_tokens = True
    else:
        terms_sorted, term_ids, docids, tfs, dl, pos_flat = _tokenize_to_ids(
            table, text_col, analyzer, want_positions=index_positions)
        drop_tokens = False
    norms = encode_norms(dl)

    # --- per-term boundaries over the (term, doc)-sorted pair arrays
    n_pairs = term_ids.size
    if n_pairs:
        starts = np.flatnonzero(np.concatenate(([True], term_ids[1:] != term_ids[:-1])))
        ends = np.concatenate((starts[1:], [n_pairs]))
    else:
        starts = ends = np.empty(0, dtype=np.int64)

    # --- single-pass varbyte encode for the whole segment
    gaps = docids.copy()
    gaps[starts] = docids[starts]  # absolute at term start
    if n_pairs:
        mask = np.ones(n_pairs, dtype=bool)
        mask[starts] = False
        gaps[mask] = docids[mask] - docids[np.flatnonzero(mask) - 1]
    gaps_u = gaps.astype(np.uint64)
    tfs_u = tfs.astype(np.uint64)
    all_docs_enc = vb_encode(gaps_u)
    all_tfs_enc = vb_encode(tfs_u)
    doc_prefix = np.concatenate(([0], np.cumsum(_vb_sizes(gaps_u))))
    tf_prefix = np.concatenate(([0], np.cumsum(_vb_sizes(tfs_u))))
    pair_norms = norms[docids] if n_pairs else np.empty(0, np.uint8)

    if pos_flat is not None and n_pairs:
        # per-posting delta-gapped positions: first absolute, then diffs
        tok_prefix = np.concatenate(([0], np.cumsum(tfs)))
        pstarts = tok_prefix[:-1]
        pgaps = pos_flat.astype(np.int64).copy()
        pmask = np.ones(pgaps.size, dtype=bool)
        pmask[pstarts] = False
        pgaps[pmask] = pos_flat[pmask] - pos_flat[np.flatnonzero(pmask) - 1]
        pgaps_u = pgaps.astype(np.uint64)
        all_pos_enc = vb_encode(pgaps_u)
        pos_byte_prefix = np.concatenate(([0], np.cumsum(_vb_sizes(pgaps_u))))
    else:
        tok_prefix = None
        all_pos_enc = b""
        pos_byte_prefix = None

    rows_term, rows_chunk = [], []
    rows_df, rows_ttf = [], []
    rows_docs_enc, rows_tfs_enc, rows_pos_enc = [], [], []
    rows_skip_docs, rows_skip_off, rows_skip_tf_off = [], [], []
    rows_bmax_tf, rows_bmin_norm = [], []

    term_strs = terms_sorted.to_pylist()
    for ti in range(starts.size):
        s, e = int(starts[ti]), int(ends[ti])
        term = term_strs[int(term_ids[s])]
        for ci, cs in enumerate(range(s, e, MAX_DOCS_PER_CHUNK)):
            ce = min(cs + MAX_DOCS_PER_CHUNK, e)
            n = ce - cs
            block_lo = np.arange(cs, ce, BLOCK_SIZE, dtype=np.int64)
            block_hi = np.minimum(block_lo + BLOCK_SIZE, ce)
            rows_term.append(term)
            rows_chunk.append(ci)
            rows_df.append(n)
            rows_ttf.append(int(tfs[cs:ce].sum()))
            if cs == s:
                rows_docs_enc.append(all_docs_enc[doc_prefix[cs]:doc_prefix[ce]])
            else:
                # chunk boundary: first gap must be absolute for the chunk
                head = vb_encode(docids[cs:cs + 1].astype(np.uint64))
                rows_docs_enc.append(head + all_docs_enc[doc_prefix[cs + 1]:doc_prefix[ce]])
            rows_tfs_enc.append(all_tfs_enc[tf_prefix[cs]:tf_prefix[ce]])
            if tok_prefix is not None:
                rows_pos_enc.append(
                    all_pos_enc[pos_byte_prefix[tok_prefix[cs]]:
                                pos_byte_prefix[tok_prefix[ce]]])
            else:
                rows_pos_enc.append(b"")
            base_doc_off = doc_prefix[cs]
            base_tf_off = tf_prefix[cs]
            rows_skip_docs.append(docids[block_hi - 1].astype(np.int32))
            # NOTE: for non-first chunks the first block's offset arithmetic
            # still works because offsets are relative to chunk start and the
            # re-encoded absolute head has the same layout cost only if gap
            # widths match; to stay exact we recompute offsets for split
            # chunks below.
            if cs == s:
                rows_skip_off.append((doc_prefix[block_lo] - base_doc_off).astype(np.int32))
            else:
                cgaps = docids[cs:ce].copy()
                cgaps[1:] = docids[cs + 1:ce] - docids[cs:ce - 1]
                cpre = np.concatenate(([0], np.cumsum(_vb_sizes(cgaps.astype(np.uint64)))))
                rows_skip_off.append(cpre[block_lo - cs].astype(np.int32))
            rows_skip_tf_off.append((tf_prefix[block_lo] - base_tf_off).astype(np.int32))
            # reduceat over the CHUNK SLICE: the final reduceat segment runs to
            # the end of the array passed in, so it must end at ce, not n_pairs
            rows_bmax_tf.append(
                np.maximum.reduceat(tfs[cs:ce], block_lo - cs).astype(np.int32)
                if n else np.empty(0, np.int32))
            rows_bmin_norm.append(
                np.minimum.reduceat(pair_norms[cs:ce], block_lo - cs).astype(np.int32)
                if n else np.empty(0, np.int32))

    postings = pa.table(
        {
            "term": pa.array(rows_term, type=pa.string()),
            "chunk": pa.array(rows_chunk, type=pa.int32()),
            "df": pa.array(rows_df, type=pa.int32()),
            "ttf": pa.array(rows_ttf, type=pa.int64()),
            "docs_enc": pa.array(rows_docs_enc, type=pa.binary()),
            "tfs_enc": pa.array(rows_tfs_enc, type=pa.binary()),
            "skip_docs": pa.array(rows_skip_docs, type=pa.list_(pa.int32())),
            "skip_off": pa.array(rows_skip_off, type=pa.list_(pa.int32())),
            "skip_tf_off": pa.array(rows_skip_tf_off, type=pa.list_(pa.int32())),
            "block_max_tf": pa.array(rows_bmax_tf, type=pa.list_(pa.int32())),
            "block_min_norm": pa.array(rows_bmin_norm, type=pa.list_(pa.int32())),
            "pos_enc": pa.array(rows_pos_enc, type=pa.binary()),
        },
        schema=SEGMENT_SCHEMA,
    )

    docstore = table.drop_columns([tokens_col]) if drop_tokens else table
    docstore = docstore.append_column("docid", pa.array(np.arange(n_docs, dtype=np.int64)))
    docstore = docstore.append_column("dl", pa.array(dl.astype(np.int32)))
    docstore = docstore.append_column("norm", pa.array(norms, type=pa.uint8()))

    meta = {
        "doc_count": int(n_docs),
        "sum_dl": int(dl.sum()) if n_docs else 0,
        "vocab": int(starts.size),
        "postings_rows": postings.num_rows,
        "has_positions": bool(pos_flat is not None),
    }
    return postings, docstore, meta


def write_segment(
    seg_dir: str,
    postings: pa.Table,
    docstore: pa.Table,
    meta: dict,
) -> dict:
    """Atomic segment write: tmp dir -> rename (idempotent / resume-safe,
    the batch analogue of the reference's translog checkpoint durability —
    Translog.java:825-839 ensureSynced)."""
    tmp = seg_dir + ".tmp"
    if os.path.exists(seg_dir):
        return json.load(open(os.path.join(seg_dir, "meta.json")))
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings, os.path.join(tmp, "postings.parquet"),
                   compression="zstd", row_group_size=4096)
    pq.write_table(docstore, os.path.join(tmp, "docs.parquet"),
                   compression="zstd", row_group_size=65536)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    try:
        os.rename(tmp, seg_dir)
    except OSError:
        # another worker won the race; its segment is identical (deterministic)
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return meta


class SegmentBuilder:
    """Actor-pool stage: one input work item (parquet fragment) -> one segment.

    Used as ``ds.map_batches(SegmentBuilder, fn_constructor_kwargs=...,
    concurrency=N, batch_size=1)`` over a Dataset of fragment descriptors
    (path, seg_id, row ranges). The analyzer is constructed ONCE per actor.
    Skips fragments whose segment dir already exists (resume).
    """

    def __init__(self, index_dir: str, analyzer="default",
                 text_col: str = "text", sort_cols=("conv_id", "turn_idx"),
                 columns: Optional[List[str]] = None,
                 index_positions: bool = False):
        self.index_dir = index_dir
        self.analyzer = get_analyzer(analyzer)
        self.text_col = text_col
        self.sort_cols = tuple(sort_cols) if sort_cols else None
        self.columns = columns
        self.index_positions = index_positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        # One fragment == one CPU slot: cap Arrow's per-process thread pools
        # so 32 concurrent builder tasks don't each spawn 32 compute/IO
        # threads (1024-thread thrash kills strong scaling).
        if pa.cpu_count() > 2:
            pa.set_cpu_count(2)
            pa.set_io_thread_count(2)
        # Batch tasks allocate millions of short-lived objects; cyclic GC
        # passes over them are pure overhead and serialize badly across 32
        # concurrent workers. Collect once at the end instead.
        import gc
        gc_was_enabled = gc.isenabled()
        gc.disable()
        out = []
        for row in batch.to_pylist():
            seg_id = int(row["seg_id"])
            seg_dir = os.path.join(self.index_dir, "segments", f"seg-{seg_id:05d}")
            st = os.stat(row["path"])
            input_fp = [int(st.st_size), int(st.st_mtime_ns)]
            meta = None
            if os.path.exists(os.path.join(seg_dir, "meta.json")):
                meta = json.load(open(os.path.join(seg_dir, "meta.json")))
                meta["resumed"] = True
                if meta.get("input_fp") != input_fp:
                    # input file changed since this segment was built: the
                    # "finished" segment is stale — rebuild it (resume is
                    # content-aware, not path-only)
                    import shutil
                    shutil.rmtree(seg_dir, ignore_errors=True)
                    meta = None
            if meta is None:
                tbl = pq.read_table(row["path"], columns=self.columns)
                postings, docstore, meta = build_segment_table(
                    tbl, text_col=self.text_col, analyzer=self.analyzer,
                    sort_cols=self.sort_cols, index_positions=self.index_positions,
                )
                meta["resumed"] = False
                meta = {**meta, "seg_id": seg_id, "path": row["path"],
                        "input_fp": input_fp}
                write_segment(seg_dir, postings, docstore, meta)
            meta.setdefault("seg_id", seg_id)
            meta.setdefault("path", row["path"])
            out.append(meta)
        if gc_was_enabled:
            gc.enable()
            gc.collect()
        return pa.table(
            {
                "seg_id": pa.array([m["seg_id"] for m in out], type=pa.int32()),
                "path": pa.array([m["path"] for m in out], type=pa.string()),
                "doc_count": pa.array([m["doc_count"] for m in out], type=pa.int64()),
                "sum_dl": pa.array([m["sum_dl"] for m in out], type=pa.int64()),
                "vocab": pa.array([m["vocab"] for m in out], type=pa.int64()),
                "resumed": pa.array([m.get("resumed", False) for m in out], type=pa.bool_()),
            }
        )
