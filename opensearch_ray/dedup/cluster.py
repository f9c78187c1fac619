"""Near-duplicate CLUSTERS: connected components over candidate-pair
edges + keep-best representative selection.

The pair emitters (minhash/simhash/embed) produce verified edges;
production dedup needs the transitive closure — groups of mutually-near
documents — and ONE survivor per group. The reference engine has no
server-side dedup; this is the training-data-pipeline operator family
the graft brief requires. Algorithm: hash-to-min label propagation
(Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds", ICDE'13) — public literature, no code reuse.

Distributed shape: every round is ONE shuffle of (node, label)
messages through a LOW-CARDINALITY hash partition (hash(node) % P —
the same skew-proof trick as dedup/minhash.py's LSH banding), with all
per-node reductions vectorized inside the partition (lexsort +
reduceat), never a per-key Python groupby. Labels only decrease, so
components converge in O(log diameter) rounds; near-dup clusters have
tiny diameters (2-4 rounds in practice). The driver holds only a
per-round (count, checksum) pair — never edges, labels, or members.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .minhash import _attach_sig


def _msg_schema() -> pa.Schema:
    return pa.schema([("node", pa.int64()), ("label", pa.int64()),
                      ("_part", pa.int32())])


def _empty_msgs() -> pa.Table:
    return pa.table({"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64()),
                     "_part": pa.array([], pa.int32())})


def _part_of(nodes: np.ndarray, P: int) -> np.ndarray:
    return (pd.util.hash_array(nodes.astype(np.int64)) % np.uint64(P)
            ).astype(np.int32)


def connected_components(pairs: Dataset, src: str = "a", dst: str = "b",
                         P: int = 256, max_rounds: int = 12) -> Dataset:
    """Undirected connected components over an edge Dataset.

    -> Dataset[(node, component)] where ``component`` is the component's
    MINIMUM node id (deterministic — no execution-order dependence).
    Only edge ENDPOINTS appear; isolated docs are their own implicit
    singleton and never shuffle.
    """
    def seed(t: pa.Table) -> pa.Table:
        u = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate((u, v, u, v))
        lab = np.concatenate((v, u, u, v))  # both directions + self-loops
        return pa.table({"node": pa.array(node), "label": pa.array(lab),
                         "_part": pa.array(_part_of(node, P))})

    def step(g: pa.Table) -> pa.Table:
        """One hash-to-min round inside one partition: for each node,
        m = min(labels ∪ {node}); emit (m, v) and (v, m) for every label
        v in the node's set — all vectorized over the partition."""
        node = g.column("node").to_numpy(zero_copy_only=False)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        if node.size == 0:
            return _empty_msgs()
        order = np.lexsort((lab, node))
        node, lab = node[order], lab[order]
        # drop duplicate (node, label) rows (adjacent after the sort)
        keep = np.concatenate(([True], (node[1:] != node[:-1])
                               | (lab[1:] != lab[:-1])))
        node, lab = node[keep], lab[keep]
        starts = np.flatnonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))
        m = np.minimum.reduceat(lab, starts)  # self-loops seed min>=node
        seg = np.repeat(np.arange(starts.size),
                        np.diff(np.append(starts, node.size)))
        m_per_row = m[seg]
        out_node = np.concatenate((m_per_row, lab))
        out_lab = np.concatenate((lab, m_per_row))
        uniq = np.unique(np.stack((out_node, out_lab), axis=1), axis=0)
        return pa.table({"node": pa.array(uniq[:, 0]),
                         "label": pa.array(uniq[:, 1]),
                         "_part": pa.array(_part_of(uniq[:, 0], P))})

    def finish(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False)
        lab = g.column("label").to_numpy(zero_copy_only=False)
        if node.size == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "component": pa.array([], pa.int64())})
        order = np.lexsort((lab, node))
        node, lab = node[order], lab[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))
        return pa.table({
            "node": pa.array(node[starts]),
            "component": pa.array(np.minimum.reduceat(lab, starts))})

    msgs = pairs.map_batches(seed, batch_format="pyarrow").materialize()
    prev: Optional[Tuple[int, float]] = None
    for _ in range(max_rounds):
        # <=16 blocks into each round's shuffle (round-5 block-count
        # law: Ray's sort shuffle costs ~0 driver MB at 16 input
        # blocks, hundreds past 64 — each round otherwise feeds the
        # next one P group blocks)
        msgs = (msgs.repartition(16, shuffle=False)
                .groupby("_part")
                .map_groups(step, batch_format="pyarrow").materialize())
        # labels are monotone non-increasing and the emit is deterministic
        # + deduped, so an unchanged (count, float-sum) pair is a fixed
        # point (float64 checksum collision odds are negligible and the
        # max_rounds cap backstops them)
        chk = (msgs.count(),
               float(msgs.sum("label") or 0))
        if chk == prev:
            break
        prev = chk
    return (msgs.repartition(16, shuffle=False)
            .groupby("_part").map_groups(finish, batch_format="pyarrow"))


def keep_best(docs: Dataset, components: Dataset, id_col: str = "doc_id",
              quality_col: str = "n_chars", B: int = 32) -> Dataset:
    """One survivor per component: highest ``quality_col`` (ties -> lowest
    id — deterministic). -> Dataset[(component, keep_id, n_members)].

    Shape: the member-id set (bounded by 2x the verified pair count — the
    same contract as verify_pairs' candidate broadcast) is computed in
    the OBJECT STORE and semi-filters the corpus BEFORE anything
    shuffles, so the quality attach and the per-component reduce run
    over membership-sized rows only; documents never shuffle. Both
    coalesces (components, quality) run as single remote concat tasks —
    member bytes never route through the driver, which holds only
    ObjectRefs (O(block count), not O(membership)). (Measured: an
    unfiltered 1M-row Ray groupby costs ~320 MB of driver peak RSS in
    Ray's sort shuffle — the semi-filter keeps this stage flat.)
    """
    import pyarrow.compute as pc

    # coalesce to ONE block: Ray's sort shuffle carries a driver-side
    # cost quadratic in INPUT BLOCK count (measured: 256 blocks ~ 225 MB,
    # 512 ~ 660 MB driver peak), so a corpus-shaped block census must
    # never reach the groupby — and the concat itself happens in a
    # worker, not on the driver
    @ray.remote(num_returns=2)
    def _coalesce_components(*parts):
        parts = [p for p in parts if p.num_rows]
        tbl = (pa.concat_tables(parts).combine_chunks() if parts
               else pa.table({"node": pa.array([], pa.int64()),
                              "component": pa.array([], pa.int64())}))
        return tbl, pc.unique(tbl.column("node").combine_chunks())

    comp_ref, need_ref = _coalesce_components.remote(
        *components.to_arrow_refs())
    components = ray.data.from_arrow_refs([comp_ref])

    def pack_quality(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column(id_col).cast(pa.int64()),
                              value_set=ray.get(need_ref)))
        q = t.column(quality_col).to_numpy(zero_copy_only=False) \
            .astype("<f8")
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(8), t.num_rows, [None, pa.py_buffer(q.tobytes())])
        return pa.table({"node": t.column(id_col).cast(pa.int64()),
                         "_q": packed})

    @ray.remote
    def _coalesce_quality(*parts):
        parts = [p for p in parts if p.num_rows]
        return (pa.concat_tables(parts).combine_chunks() if parts
                else pa.table({"node": pa.array([], pa.int64()),
                               "_q": pa.array([], pa.binary())}))

    qual = docs.map_batches(pack_quality, batch_format="pyarrow")
    qual = ray.data.from_arrow_refs(
        [_coalesce_quality.remote(*qual.to_arrow_refs())])
    s = pa.schema([("node", pa.int64()), ("component", pa.int64())])
    j = _attach_sig(components, qual, "node", "_q", s, B)

    def add_cp(t: pa.Table) -> pa.Table:
        c = t.column("component").to_numpy(zero_copy_only=False)
        return t.append_column("_cp", pa.array(_part_of(c, B)))

    def best(g: pa.Table) -> pa.Table:
        """Per-component argmax inside one partition — components are
        keyed to partitions whole (hash(component) % B), so the segmented
        reduction over the lexsort is exact."""
        node = g.column("node").to_numpy(zero_copy_only=False)
        comp = g.column("component").to_numpy(zero_copy_only=False)
        if node.size == 0:
            return pa.table({"component": pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64()),
                             "n_members": pa.array([], pa.int64())})
        q = np.frombuffer(b"".join(g.column("_q").to_pylist()), dtype="<f8")
        order = np.lexsort((node, -q, comp))
        comp_s, node_s = comp[order], node[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], comp_s[1:] != comp_s[:-1])))
        sizes = np.diff(np.append(starts, comp_s.size))
        return pa.table({"component": pa.array(comp_s[starts]),
                         "keep_id": pa.array(node_s[starts]),
                         "n_members": pa.array(sizes.astype(np.int64))})

    return (j.map_batches(add_cp, batch_format="pyarrow")
            .groupby("_cp").map_groups(best, batch_format="pyarrow"))


def token_jaccard_edges(ds: Dataset, text_col: str = "text",
                        id_col: str = "doc_id",
                        analyzer: str = "transcript",
                        max_df: int = 100, threshold: float = 0.5,
                        P: int = 256, B: int = 32) -> Dataset:
    """EXACT distinct-token Jaccard edges with shared-token blocking:
    candidate pairs = docs sharing >=1 token with 2 <= df <= ``max_df``;
    an edge survives iff |A∩B| / |A∪B| >= ``threshold`` over the docs'
    full DISTINCT analyzer-token sets.

    This is the oracle-anchorable near-dup edge definition (DuckDB can
    compute it exactly); MinHash-LSH (dedup/minhash.py) is the sketched
    scale path for the same clusters. Blocking is df-capped, so no token
    group goes quadratic; token sets travel as packed uint64-hash cells
    through the same co-partitioned bucket join as signature verify
    (64-bit hash collisions are the only approximation, ~n^2/2^64).
    """
    from ..analysis.analyzer import analyze_batch

    def explode(t: pa.Table) -> pa.Table:
        """-> one row per DISTINCT (doc, token-hash), partition-keyed by
        the token hash (docs never span batches, so per-row dedup is
        exact)."""
        if t.num_rows == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "th": pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int32())})
        a = analyze_batch(t.select([id_col, text_col]), analyzer=analyzer)
        toks = a.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ids = a.column(id_col).to_numpy(zero_copy_only=False)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        th = pd.util.hash_array(
            flat.to_numpy(zero_copy_only=False)).astype(np.uint64) \
            if len(flat) else np.empty(0, np.uint64)
        doc_of = np.repeat(ids, np.diff(offs))
        if doc_of.size == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "th": pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int32())})
        # distinct within doc: sort (doc, hash), drop adjacent dups
        order = np.lexsort((th, doc_of))
        d, h = doc_of[order], th[order]
        keep = np.concatenate(([True], (d[1:] != d[:-1]) | (h[1:] != h[:-1])))
        d, h = d[keep], h[keep]
        return pa.table({
            "doc": pa.array(d.astype(np.int64)),
            "th": pa.array(h.astype(np.int64)),
            "_part": pa.array((h % np.uint64(P)).astype(np.int32))})

    tok = ds.map_batches(explode, batch_format="pyarrow").materialize()

    def pairs_part(g: pa.Table) -> pa.Table:
        th = g.column("th").to_numpy(zero_copy_only=False)
        doc = g.column("doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, th))
        th_s, doc_s = th[order], doc[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], th_s[1:] != th_s[:-1])))
        ends = np.append(starts[1:], th_s.size)
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            df = e - s
            if df < 2 or df > max_df:
                continue
            ids = doc_s[s:e]
            ii, jj = np.triu_indices(df, k=1)
            a_parts.append(ids[ii])
            b_parts.append(ids[jj])
        if not a_parts:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(a_parts)),
                         "b": pa.array(np.concatenate(b_parts))})

    def add_pp(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        pp = ((a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(P)
              ).astype(np.int32)
        return t.append_column("_pp", pa.array(pp))

    def dedup_pp(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack((a, b), axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0]), "b": pa.array(u[:, 1])})

    cand = (tok.repartition(16, shuffle=False).groupby("_part")
            .map_groups(pairs_part, batch_format="pyarrow")
            .map_batches(add_pp, batch_format="pyarrow")
            .repartition(16, shuffle=False)
            .groupby("_pp").map_groups(dedup_pp, batch_format="pyarrow"))

    def add_dp(t: pa.Table) -> pa.Table:
        d = t.column("doc").to_numpy(zero_copy_only=False)
        return t.append_column("_dp", pa.array(_part_of(d, B)))

    def pack_sets(g: pa.Table) -> pa.Table:
        """One partition's (doc, th) rows -> one sorted-uint64-bytes cell
        per doc (docs are keyed to partitions WHOLE via hash(doc) % B, so
        each doc's full set lands in one call; variable-width binary —
        _attach_sig carries generic binary)."""
        doc = g.column("doc").to_numpy(zero_copy_only=False)
        th = g.column("th").to_numpy(zero_copy_only=False)
        if doc.size == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "tokset": pa.array([], pa.binary())})
        order = np.lexsort((th, doc))
        doc, th = doc[order], th[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], doc[1:] != doc[:-1])))
        ends = np.append(starts[1:], doc.size)
        return pa.table({
            "node": pa.array(doc[starts]),
            "tokset": pa.array([th[s:e].astype("<i8").tobytes()
                                for s, e in zip(starts, ends)],
                               pa.binary())})

    # token sets per doc are scattered across P token partitions; regroup
    # by a LOW-CARDINALITY doc partition (skew-proof, B groups)
    packed = (tok.map_batches(add_dp, batch_format="pyarrow")
              .repartition(16, shuffle=False)
              .groupby("_dp").map_groups(pack_sets, batch_format="pyarrow")
              .materialize())
    sets_a = packed.map_batches(
        lambda t: t.rename_columns(["a", "set_a"]), batch_format="pyarrow")
    sets_b = packed.map_batches(
        lambda t: t.rename_columns(["b", "set_b"]), batch_format="pyarrow")
    s1 = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    j = _attach_sig(cand, sets_a, "a", "set_a", s1, B)
    s2 = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    ("set_a", pa.binary())])
    j = _attach_sig(j, sets_b, "b", "set_b", s2, B)

    def verify(t: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        aa = t.column("a").to_numpy(zero_copy_only=False)
        bb = t.column("b").to_numpy(zero_copy_only=False)
        for i in range(t.num_rows):
            sa = np.frombuffer(t.column("set_a")[i].as_py(), dtype="<i8")
            sb = np.frombuffer(t.column("set_b")[i].as_py(), dtype="<i8")
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                out_a.append(aa[i])
                out_b.append(bb[i])
                out_j.append(jac)
        return pa.table({"a": pa.array(np.asarray(out_a, np.int64)),
                         "b": pa.array(np.asarray(out_b, np.int64)),
                         "jaccard": pa.array(np.asarray(out_j, np.float64))})

    return j.map_batches(verify, batch_format="pyarrow")


def near_dup_clusters(ds: Dataset, text_col: str = "text",
                      id_col: str = "doc_id",
                      quality_col: str = "n_chars",
                      num_hashes: int = 128, bands: int = 32,
                      shingle_k: int = 3, threshold: float = 0.8) -> Dataset:
    """Full MinHash near-dup CLUSTER pipeline: LSH candidates -> signature
    verify -> connected components -> keep-best.
    -> Dataset[(component, keep_id, n_members)] (sketched scale path; see
    token_jaccard_edges for the exact oracle-anchored variant)."""
    from .minhash import (minhash_signatures, lsh_candidate_pairs_ds,
                          verify_pairs)
    sigs = minhash_signatures(ds, text_col=text_col, id_col=id_col,
                              num_hashes=num_hashes,
                              shingle_k=shingle_k).materialize()
    cand = lsh_candidate_pairs_ds(sigs, id_col=id_col,
                                  num_hashes=num_hashes, bands=bands)
    edges = verify_pairs(sigs, cand, id_col=id_col, threshold=threshold)
    comp = connected_components(edges)
    return keep_best(ds, comp, id_col=id_col, quality_col=quality_col)
