"""Top-k BM25 query execution over a built index.

Mirrors the reference query path (SURVEY.md §3.2): analyze query text with the
index analyzer -> global term stats (DFS-style, DfsPhase.java:55-107) -> per-
partition posting lookup + scoring with dynamic pruning -> k-way merge with
(score desc, docid asc) tie-break (TopDocs.merge semantics,
SearchPhaseController.java:175-241).

Pruning: a vectorized **MaxScore** (Turtle & Flood 1995) with **block-max**
refinements per (term, chunk): once the top-k heap holds k hits with threshold
θ, terms whose upper bound makes them non-essential are decoded only for the
blocks that overlap surviving candidate docs (skip_docs binary search), and a
doc is dropped only when partial_score + Σ non-essential ubs < θ — exact
strict-inequality pruning, so results are identical to exhaustive scoring
(ties included). This is the Lucene WAND/impacts counterpart
(TopDocsCollectorContext.java:350-371) in vectorized form.

Scores are float32 with the oracle's exact op order -> bit-identical ranking
(dtype=np.float64 switches to full-double mode for SQL-oracle comparison).
"""

from __future__ import annotations

import os
from collections import Counter
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis import get_analyzer
from ..index.build import IndexManifest, load_manifest, _stable_hash
from ..index.postings import BLOCK_SIZE, vb_decode
from .bm25 import BM25Params, bm25_idf, make_norm_cache, max_block_score, score_postings, term_weight


@dataclass
class SearchHit:
    docid: int
    score: float


class Searcher:
    """Single-process searcher over an index directory (driver-side or inside
    a query-executor actor). Caches norms + term stats per segment."""

    def __init__(self, index_dir: str, params: BM25Params = BM25Params(),
                 dtype=np.float32, analyzer=None):
        self.manifest: IndexManifest = load_manifest(index_dir)
        self.params = params
        self.dtype = dtype  # float32 = Lucene-identical; float64 = SQL-oracle
        # ``analyzer`` overrides the manifest name for indexes built with an
        # unregistered (derived) analyzer, e.g. search_as_you_type subfields
        self.analyzer = (get_analyzer(analyzer) if analyzer is not None
                         else get_analyzer(self.manifest.analyzer))
        self.N = self.manifest.total_docs
        self.avgdl = self.manifest.avgdl
        self.norm_cache = (make_norm_cache(self.avgdl, params, dtype)
                           if self.N else None)
        segs = sorted(self.manifest.segments, key=lambda s: s.seg_id)
        self._seg_ids = np.array([s.seg_id for s in segs], dtype=np.int64)
        self._bases = np.array([s.doc_base for s in segs], dtype=np.int64)
        self._counts = np.array([s.doc_count for s in segs], dtype=np.int64)
        self._norms: Dict[int, np.ndarray] = {}
        self._hot = set(self.manifest.hot_terms)
        self._hot_buckets = dict(self.manifest.hot_buckets or {})
        self._stats_dir = os.path.join(index_dir, "term_stats")
        self._stats_cache: Dict[str, Tuple[int, int]] = {}
        self._post_cache: Dict[str, pa.Table] = {}  # term -> postings rows
        self._post_cache_max = 512
        # decoded hot chunks (term, seg, chunk) -> (docids, tfs): the decoded
        # counterpart of Lucene's hot postings staying page-cache resident
        self._dec_cache: Dict[Tuple[str, int, int], Tuple[np.ndarray, np.ndarray]] = {}
        self._dec_cache_max = 4096
        self._docvalues: Dict[Tuple[int, str], np.ndarray] = {}
        #: derived (query-time computed) fields: name -> (script,
        #: source_columns, ignore_malformed); see register_derived_field
        self._derived: Dict[str, tuple] = {}

    # ------------------------------------------------------------- plumbing

    def _seg_dir(self, seg_id: int) -> str:
        return os.path.join(self.manifest.index_dir, "segments", f"seg-{seg_id:05d}")

    def norms(self, seg_id: int) -> np.ndarray:
        arr = self._norms.get(seg_id)
        if arr is None:
            t = pq.read_table(os.path.join(self._seg_dir(seg_id), "docs.parquet"),
                              columns=["norm"])
            arr = t.column("norm").to_numpy(zero_copy_only=False).astype(np.uint8)
            self._norms[seg_id] = arr
        return arr

    def doc_base(self, seg_id: int) -> int:
        return int(self._bases[np.searchsorted(self._seg_ids, seg_id)])

    def doc_values_slice(self, seg_id: int, col: str, lo: int,
                         hi: int) -> np.ndarray:
        """Doc-values rows [lo, hi) of one segment column, reading only the
        parquet row groups that overlap the range — the I/O shape of an
        early-terminated sorted collector (it touches only the index-sort
        prefix/suffix of the segment, never the whole column). Serves from
        the full-column cache when already loaded; partial reads are NOT
        cached (they would poison the whole-column cache)."""
        cached = self._docvalues.get((seg_id, col))
        if cached is not None:
            return cached[lo:hi]
        if col in self._derived:  # derived: compute whole segment, slice
            return self.doc_values(seg_id, col)[lo:hi]
        pf = pq.ParquetFile(os.path.join(self._seg_dir(seg_id),
                                         "docs.parquet"))
        parts, row0 = [], 0
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            if row0 < hi and row0 + n > lo:
                parts.append(pf.read_row_group(rg, columns=[col]))
            row0 += n
            if row0 >= hi:
                break
        first_row = 0
        row0 = 0
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            if row0 + n > lo:
                first_row = row0
                break
            row0 += n
        t = pa.concat_tables(parts) if parts else pf.schema_arrow.empty_table()
        col_pa = t.column(col)
        if (pa.types.is_integer(col_pa.type) or pa.types.is_floating(col_pa.type)
                or pa.types.is_timestamp(col_pa.type)):
            arr = col_pa.to_numpy(zero_copy_only=False)
        else:
            arr = np.asarray(col_pa.to_pylist(), dtype=object)
        return arr[lo - first_row:hi - first_row]

    def register_derived_field(self, name: str, script,
                               source_columns: Sequence[str],
                               ignore_malformed: bool = False) -> None:
        """Derived (query-time computed) field — DerivedFieldMapper /
        DerivedFieldType.java + query/DerivedFieldQuery.java. ``script``
        is a vectorized Python callable (Painless is excluded by design:
        Python callables are this engine's UDF surface) taking a
        ``pd.DataFrame`` of the source columns for one segment and
        returning the per-doc value array. Evaluated lazily the first
        time any query /
        sort / agg / collapse touches the field, then cached exactly like
        a real doc-values column — so term/terms/range/exists queries,
        field sorts and doc-value aggs all work on it unchanged. The
        reference evaluates the script per doc against _source inside a
        two-phase iterator (DerivedFieldQuery.java:91-105); one
        vectorized call per segment is the batch analogue.

        ``ignore_malformed``: a failing script yields an all-null column
        for that segment instead of failing the search
        (DerivedFieldMapper's ignore_malformed)."""
        if not name or not callable(script):
            raise ValueError("derived field needs a name and a callable")
        if not source_columns:
            raise ValueError("derived field needs >=1 source column")
        self._derived[name] = (script, list(source_columns),
                               bool(ignore_malformed))

    def _derived_values(self, seg_id: int, col: str) -> np.ndarray:
        import pandas as pd
        script, cols, ignore = self._derived[col]
        src = pd.DataFrame({c: self.doc_values(seg_id, c) for c in cols})
        n = len(src)
        try:
            arr = np.asarray(script(src))
            if len(arr) != n:
                raise ValueError(
                    f"derived field {col!r}: script returned {len(arr)} "
                    f"values for a {n}-doc segment")
        except Exception:
            if not ignore:
                raise
            arr = np.full(n, None, dtype=object)
        return arr

    def doc_values(self, seg_id: int, col: str) -> np.ndarray:
        """Per-segment column values aligned by local docid — the doc-values
        analogue (KeywordFieldMapper doc_values=true) used by filters,
        collapse and sorts; cached per (segment, column). Derived fields
        (register_derived_field) materialize here on first touch."""
        key = (seg_id, col)
        arr = self._docvalues.get(key)
        if arr is None and col in self._derived:
            arr = self._derived_values(seg_id, col)
            self._docvalues[key] = arr
        if arr is None:
            t = pq.read_table(os.path.join(self._seg_dir(seg_id), "docs.parquet"),
                              columns=[col])
            col_pa = t.column(col)
            if (pa.types.is_integer(col_pa.type) or pa.types.is_floating(col_pa.type)
                    or pa.types.is_timestamp(col_pa.type)):
                # typed values: numeric/date range filters compare vectorized
                arr = col_pa.to_numpy(zero_copy_only=False)
            else:
                arr = np.asarray(col_pa.to_pylist(), dtype=object)
            self._docvalues[key] = arr
        return arr

    @staticmethod
    def _spec_mask(vals: np.ndarray, spec) -> np.ndarray:
        """Filter spec -> boolean mask over doc values.

        - dict with gte/gt/lte/lt: range semantics (RangeQueryBuilder.java
          from/to + include_lower/include_upper); date strings are coerced
          against timestamp doc values (the date-math subset: absolute dates)
        - list/tuple/set: terms filter (is-in)
        - scalar: term equality
        """
        if isinstance(spec, dict):
            def coerce(x, round_up=False):
                if vals.dtype.kind == "M" and isinstance(x, str):
                    if "||" in x or x.startswith("now"):
                        # date math (JavaDateMathParser): gt/lte bounds
                        # round UP to the end of the unit, gte/lt round down
                        from ..datemath import parse_date_math
                        return np.datetime64(parse_date_math(
                            x, round_up=round_up))
                    return np.datetime64(x)
                return x
            m = np.ones(len(vals), dtype=bool)
            if "gte" in spec:
                m &= vals >= coerce(spec["gte"])
            if "gt" in spec:
                m &= vals > coerce(spec["gt"], round_up=True)
            if "lte" in spec:
                m &= vals <= coerce(spec["lte"], round_up=True)
            if "lt" in spec:
                m &= vals < coerce(spec["lt"])
            return m
        if isinstance(spec, (list, tuple, set)):
            return np.isin(vals, list(spec))
        return vals == spec

    def range_docs(self, col: str, spec: Dict[str, object]) -> np.ndarray:
        """Global docids whose ``col`` doc value falls in the range — the
        standalone `range` query (constant-score filter context)."""
        parts = []
        for s in sorted(self.manifest.segments, key=lambda s: s.seg_id):
            vals = self.doc_values(s.seg_id, col)
            m = self._spec_mask(vals, spec)
            if m.any():
                parts.append(np.flatnonzero(m).astype(np.int64)
                             + self.doc_base(s.seg_id))
        return (np.concatenate(parts) if parts else np.empty(0, np.int64))

    def term_stats(self, terms: Sequence[str]) -> Dict[str, Tuple[int, int]]:
        """term -> (global df, global ttf); absent terms -> (0, 0).
        Salted (Zipfian-head) terms carry PARTIAL sums across the per-bucket
        stats shards of a single-pass build — sum the returned rows."""
        missing = [t for t in set(terms) if t not in self._stats_cache]
        if missing:
            tbl = pq.read_table(
                self._stats_dir,
                filters=[("term", "in", missing)],
                columns=["term", "df", "ttf"],
            )
            found: Dict[str, Tuple[int, int]] = {}
            for t, df, ttf in zip(tbl.column("term").to_pylist(),
                                  tbl.column("df").to_pylist(),
                                  tbl.column("ttf").to_pylist()):
                a, b = found.get(t, (0, 0))
                found[t] = (a + df, b + ttf)
            for t in missing:
                self._stats_cache[t] = tuple(found.get(t, (0, 0)))
        return {t: self._stats_cache[t] for t in set(terms)}

    def postings(self, terms: Sequence[str]) -> Dict[str, pa.Table]:
        """term -> postings rows (columns of SEGMENT_SCHEMA + seg_id).
        Rows are cached per term (the page-cache analogue of Lucene's hot
        postings staying resident)."""
        requested = [t for t in dict.fromkeys(terms)]
        cached = {t: self._post_cache[t] for t in requested if t in self._post_cache}
        terms = [t for t in requested if t not in cached]
        out: Dict[str, List[pa.Table]] = {t: [] for t in terms}
        if not terms:
            return cached
        if self.manifest.merged:
            B = self.manifest.num_buckets
            per_bucket: Dict[int, List[str]] = {}
            for t in terms:
                if t in self._hot:
                    # salted chunks: bucket list from the manifest UNION the
                    # plain hash bucket (a segment below the local salting
                    # threshold keeps its chunk at hash(term) % B), falling
                    # back to probing every bucket
                    probe = set(self._hot_buckets.get(t, range(B)))
                    probe.add(int(_stable_hash([t])[0]) % B)
                    for b in sorted(probe):
                        per_bucket.setdefault(b, []).append(t)
                else:
                    # int() BEFORE %: np.uint64 % python-int promotes to
                    # float64 and corrupts the bucket id
                    b = int(_stable_hash([t])[0]) % B
                    per_bucket.setdefault(b, []).append(t)
            # cold lookups touch several bucket files (hot terms span many);
            # read them concurrently — parquet reads release the GIL
            from concurrent.futures import ThreadPoolExecutor

            def read_bucket(item):
                b, ts = item
                path = os.path.join(self.manifest.index_dir, "merged",
                                    f"bucket-{b:05d}.parquet")
                if not os.path.exists(path):
                    return None
                return pq.read_table(path, filters=[("term", "in", ts)]), ts

            items = list(per_bucket.items())
            if len(items) > 1:
                with ThreadPoolExecutor(max_workers=min(8, len(items))) as ex:
                    results = list(ex.map(read_bucket, items))
            else:
                results = [read_bucket(i) for i in items]
            for res in results:
                if res is None:
                    continue
                tbl, ts = res
                for t in set(ts):
                    sub = tbl.filter(pc.equal(tbl.column("term"), t))
                    if sub.num_rows:
                        out[t].append(sub)
        else:
            for s in self.manifest.segments:
                path = os.path.join(self._seg_dir(s.seg_id), "postings.parquet")
                tbl = pq.read_table(path, filters=[("term", "in", terms)])
                if tbl.num_rows:
                    tbl = tbl.append_column(
                        "seg_id", pa.array(np.full(tbl.num_rows, s.seg_id, dtype=np.int32)))
                    for t in terms:
                        sub = tbl.filter(pc.equal(tbl.column("term"), t))
                        if sub.num_rows:
                            out[t].append(sub)
        fresh = {
            t: (pa.concat_tables(v).sort_by([("seg_id", "ascending"), ("chunk", "ascending")])
                if v else pa.table({}))
            for t, v in out.items()
        }
        if len(self._post_cache) + len(fresh) > self._post_cache_max:
            self._post_cache.clear()
        self._post_cache.update(fresh)
        return {**cached, **fresh}

    # ------------------------------------------------------------- decoding

    @staticmethod
    def _decode_chunk_rows(row: dict) -> Tuple[np.ndarray, np.ndarray]:
        gaps = vb_decode(row["docs_enc"], count=row["df"])
        docids = np.cumsum(gaps.astype(np.int64))
        tfs = vb_decode(row["tfs_enc"], count=row["df"]).astype(np.int64)
        return docids, tfs

    @staticmethod
    def _decode_blocks(row: dict, block_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Decode only the given blocks of a chunk (block-max skipping)."""
        df = row["df"]
        skip_docs = row["skip_docs"]
        skip_off = row["skip_off"]
        skip_tf_off = row["skip_tf_off"]
        n_blocks = len(skip_docs)
        d_out, t_out = [], []
        for bi in block_ids:
            bi = int(bi)
            n = BLOCK_SIZE if bi < n_blocks - 1 else df - bi * BLOCK_SIZE
            base_prev = skip_docs[bi - 1] if bi > 0 else 0
            gaps = vb_decode(row["docs_enc"], offset=int(skip_off[bi]), count=n)
            d_out.append(base_prev + np.cumsum(gaps.astype(np.int64)))
            t_out.append(vb_decode(row["tfs_enc"], offset=int(skip_tf_off[bi]), count=n).astype(np.int64))
        if not d_out:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(d_out), np.concatenate(t_out)

    # -------------------------------------------------------------- search

    def search(self, query_text: str, k: int = 10, operator: str = "or",
               filters: Optional[Dict[str, object]] = None,
               allowed_segs: Optional[set] = None,
               terms: Optional[Sequence[str]] = None,
               docs: Optional[np.ndarray] = None,
               after: Optional[Tuple[float, int]] = None) -> List[SearchHit]:
        """Match-query semantics: analyze text, OR (default, ref
        MatchQueryBuilder.java:88) or AND over terms, BM25-scored top-k.

        ``filters``: {column: value-or-list} keyword filters applied as a
        non-scoring bool.filter clause over segment doc values (the
        keyword-field + filter-context semantics, BoolQueryBuilder filter);
        filtered docs are dropped BEFORE the top-k heap, scores unchanged.

        ``allowed_segs``: restrict collection to these segment ids
        (terminate_after's segment-prefix early termination). Applied AFTER
        postings retrieval, so neither merged bucket files spanning all
        segments nor a pre-warmed postings cache can leak extra segments.

        ``terms``: pre-analyzed terms bypassing the index analyzer (the
        TermQuery-list entry point; search_as_you_type scores explicit
        shingle terms this way).

        ``docs``: SORTED global-docid allowlist — the filter-context gate
        for arbitrary DSL filters (bool/ids/script/...); candidates outside
        it are dropped before the top-k heap, like ``filters``.

        ``after``: (score, docid) cursor — collect only hits STRICTLY after
        it in (score desc, docid asc) order (SearchAfterBuilder). The heap
        stays O(k) for deep pages instead of materializing every match."""
        if k <= 0:
            return []
        terms = (list(terms) if terms is not None
                 else self.analyzer.tokens(query_text))
        if not terms or not self.N:
            return []  # zero_terms_query=NONE default (MatchQuery.java:176)
        mult = Counter(terms)  # duplicate query terms => boosted clause
        uniq = list(mult.keys())
        stats = self.term_stats(uniq)
        live = [t for t in uniq if stats[t][0] > 0]
        if not live:
            return []
        if operator == "and" and len(live) < len(uniq):
            return []
        post = self.postings(live)
        weight = {t: term_weight(bm25_idf(stats[t][0], self.N, self.dtype),
                          mult[t], self.params, self.dtype)
                  for t in live}

        # group chunk rows per segment: seg_id -> list[(term, row_dict)]
        per_seg: Dict[int, List[Tuple[str, dict]]] = {}
        for t in live:
            tbl = post[t]
            if tbl.num_rows == 0:
                continue
            for row in tbl.to_pylist():
                sid = int(row["seg_id"])
                if allowed_segs is not None and sid not in allowed_segs:
                    continue
                per_seg.setdefault(sid, []).append((t, row))

        n_req = len(live)
        topk_scores = np.empty(0, np.float32)
        topk_docs = np.empty(0, np.int64)
        theta: Optional[float] = None  # current kth-best float32 score

        for seg_id in sorted(per_seg):
            base = self.doc_base(seg_id)
            norms = self.norms(seg_id)
            entries = per_seg[seg_id]
            n_ent = len(entries)
            seg_filter_mask: Optional[np.ndarray] = None
            if filters:
                for col, val in filters.items():
                    m = self._spec_mask(self.doc_values(seg_id, col), val)
                    seg_filter_mask = m if seg_filter_mask is None else (seg_filter_mask & m)

            # MaxScore split: ubs ascending; the maximal prefix whose ub sum
            # stays strictly below θ is non-essential (docs found ONLY there
            # can never reach θ).
            if theta is not None and n_ent > 1:
                ubs = np.array(
                    [
                        float(max_block_score(
                            np.asarray(row["block_max_tf"], dtype=np.int64),
                            np.asarray(row["block_min_norm"], dtype=np.int64),
                            weight[t], self.norm_cache).max())
                        if row["df"] else 0.0
                        for t, row in entries
                    ],
                    dtype=np.float64,
                )
                order_asc = np.argsort(ubs, kind="stable")
                cum = np.cumsum(ubs[order_asc])
                n_ness = int(np.searchsorted(cum, theta * (1.0 - 1e-6), side="left"))
                ness_set = set(order_asc[:n_ness].tolist())
                ness_ub_sum = float(cum[n_ness - 1]) if n_ness else 0.0
            else:
                ness_set, ness_ub_sum = set(), 0.0

            # --- essential entries: full decode, scatter-add (entry order is
            # live-term order, matching the oracle's accumulation order)
            all_docs: List[np.ndarray] = []
            all_scores: List[np.ndarray] = []
            for ei in range(n_ent):
                if ei in ness_set:
                    continue
                t, row = entries[ei]
                ck = (t, seg_id, int(row["chunk"]))
                hit = self._dec_cache.get(ck)
                if hit is None:
                    hit = self._decode_chunk_rows(row)
                    if len(self._dec_cache) >= self._dec_cache_max:
                        self._dec_cache.clear()
                    self._dec_cache[ck] = hit
                docids, tfs = hit
                sc = score_postings(tfs, norms[docids], weight[t], self.norm_cache)
                all_docs.append(docids)
                all_scores.append(sc)
            if not all_docs:
                continue  # whole segment non-essential => provably < θ
            docs_cat = np.concatenate(all_docs)
            udocs, inv = np.unique(docs_cat, return_inverse=True)
            # accumulate float32 contributions in float64 (Lucene's
            # DisjunctionSumScorer sums in double, casts to float)
            scores = np.zeros(len(udocs), np.float64)
            np.add.at(scores, inv, np.concatenate(all_scores).astype(np.float64))
            counts = np.zeros(len(udocs), np.int64)
            np.add.at(counts, inv, np.ones(len(docs_cat), np.int64))

            if docs is not None and udocs.size:
                # allowlist gate BEFORE the pruning/non-essential work —
                # disallowed candidates never cost block decodes
                lo = int(np.searchsorted(docs, base))
                hi = int(np.searchsorted(docs, base + int(norms.size)))
                allow_local = docs[lo:hi] - base
                pos_a = np.searchsorted(allow_local, udocs)
                ok = pos_a < allow_local.size
                ok[ok] = allow_local[pos_a[ok]] == udocs[ok]
                udocs, scores, counts = udocs[ok], scores[ok], counts[ok]
                if udocs.size == 0:
                    continue

            # --- candidate filter before touching non-essential entries
            if theta is not None and ness_set:
                # tiny relative epsilon guards float32-vs-float64 rounding at
                # the threshold (scores are non-negative)
                keep = scores + ness_ub_sum >= theta * (1.0 - 1e-6)
                udocs, scores, counts = udocs[keep], scores[keep], counts[keep]

            # --- non-essential entries: decode only blocks holding candidates
            for ei in sorted(ness_set):
                if udocs.size == 0:
                    break
                t, row = entries[ei]
                skip_docs = np.asarray(row["skip_docs"], dtype=np.int64)
                if skip_docs.size == 0:
                    continue
                cached = self._dec_cache.get((t, seg_id, int(row["chunk"])))
                if cached is not None:
                    # chunk already decoded by an earlier essential pass —
                    # membership probe beats re-decoding blocks
                    docids, tfs = cached
                else:
                    bids = np.unique(np.searchsorted(skip_docs, udocs))
                    bids = bids[bids < len(skip_docs)]
                    docids, tfs = self._decode_blocks(row, bids)
                if len(docids) == 0:
                    continue
                pos = np.clip(np.searchsorted(docids, udocs), 0, len(docids) - 1)
                match = docids[pos] == udocs
                if match.any():
                    sc = score_postings(tfs[pos[match]], norms[udocs[match]],
                                        weight[t], self.norm_cache)
                    scores[match] += sc.astype(np.float64)
                    counts[match] += 1

            if operator == "and":
                m = counts == n_req
                udocs, scores = udocs[m], scores[m]
            if seg_filter_mask is not None and udocs.size:
                fm_ = seg_filter_mask[udocs]
                udocs, scores = udocs[fm_], scores[fm_]
            if udocs.size == 0:
                continue

            gdocs = udocs + base
            seg_scores = scores.astype(self.dtype)
            if after is not None and gdocs.size:
                # keep only hits ranked strictly after the cursor; θ from
                # the heap stays a valid lower bound (pruning drops only
                # docs that can't reach the kth BELOW-cursor score)
                a_s, a_d = self.dtype(after[0]), int(after[1])
                keep_a = (seg_scores < a_s) | ((seg_scores == a_s)
                                               & (gdocs > a_d))
                gdocs, seg_scores = gdocs[keep_a], seg_scores[keep_a]
                if gdocs.size == 0:
                    continue
            topk_docs = np.concatenate((topk_docs, gdocs))
            topk_scores = np.concatenate((topk_scores, seg_scores))
            if topk_docs.size > k:
                ordm = np.lexsort((topk_docs, -topk_scores.astype(np.float64)))[:k]
                topk_docs, topk_scores = topk_docs[ordm], topk_scores[ordm]
            if topk_docs.size >= k:
                theta = float(topk_scores.min())

        ordm = np.lexsort((topk_docs, -topk_scores.astype(np.float64)))[:k]
        return [SearchHit(int(topk_docs[i]), float(topk_scores[i])) for i in ordm]

    def score_docs(self, docs: np.ndarray, terms: Sequence[str]
                   ) -> np.ndarray:
        """BM25 scores for the GIVEN global docids (any order) — the bounded
        "score exactly these docs" primitive behind the DSL general path,
        rescore windows and deep pages: memory O(len(docs)), never O(total
        matches). Docs matching no term score 0.0.

        Values are identical to :meth:`search` hit scores — same float32
        per-term contributions accumulated in float64 in live-term order,
        one final dtype cast (the k=10^9 exhaustive path this replaces).
        Postings I/O is block-pruned: only chunks' blocks overlapping the
        wanted docids are decoded (skip-pointer binary search)."""
        docs = np.asarray(docs, dtype=np.int64)
        out = np.zeros(docs.size, np.float64)
        if docs.size == 0 or not self.N:
            return out
        order = np.argsort(docs, kind="stable")
        sdocs = docs[order]
        mult = Counter(terms)
        uniq = list(mult.keys())
        stats = self.term_stats(uniq)
        live = [t for t in uniq if stats[t][0] > 0]
        if not live:
            return out
        post = self.postings(live)
        weight = {t: term_weight(bm25_idf(stats[t][0], self.N, self.dtype),
                                 mult[t], self.params, self.dtype)
                  for t in live}
        acc = np.zeros(sdocs.size, np.float64)
        seg_idx = np.searchsorted(self._bases, sdocs, side="right") - 1
        for si in np.unique(seg_idx):
            seg_id = int(self._seg_ids[si])
            base = int(self._bases[si])
            m = seg_idx == si
            local = sdocs[m] - base
            norms = self.norms(seg_id)
            seg_acc = np.zeros(local.size, np.float64)
            for t in live:
                tbl = post[t]
                if tbl.num_rows == 0:
                    continue
                for row in tbl.to_pylist():
                    if int(row["seg_id"]) != seg_id:
                        continue
                    hit = self._dec_cache.get((t, seg_id, int(row["chunk"])))
                    if hit is not None:
                        docids, tfs = hit
                    else:
                        skip_docs = np.asarray(row["skip_docs"], np.int64)
                        if skip_docs.size == 0:
                            continue
                        bids = np.unique(np.searchsorted(skip_docs, local))
                        bids = bids[bids < len(skip_docs)]
                        docids, tfs = self._decode_blocks(row, bids)
                    if len(docids) == 0:
                        continue
                    pos = np.clip(np.searchsorted(docids, local), 0,
                                  len(docids) - 1)
                    match = docids[pos] == local
                    if match.any():
                        sc = score_postings(tfs[pos[match]],
                                            norms[local[match]],
                                            weight[t], self.norm_cache)
                        seg_acc[match] += sc.astype(np.float64)
            acc[m] = seg_acc
        out[order] = acc.astype(self.dtype).astype(np.float64)
        return out

    def _vocab(self) -> "pa.Table":
        """The FULL global term dictionary (term, df) — only the queries with
        no literal prefix to prune on (pure-regex, fuzzy) fall back to this
        scan (Lucene's terms enum + automaton walks the whole dict too).
        Aggregates the per-bucket stats shards (salted terms have partial
        rows)."""
        if not hasattr(self, "_vocab_tbl"):
            raw = pq.read_table(self._stats_dir, columns=["term", "df"])
            self._vocab_tbl = (raw.group_by(["term"])
                               .aggregate([("df", "sum")])
                               .rename_columns(["term", "df"]).sort_by("term"))
        return self._vocab_tbl

    def _vocab_range(self, lo: str, hi: Optional[str] = None) -> "pa.Table":
        """Terms-dict slice [lo, hi): a FILTERED stats read. Shards are
        term-sorted with small row groups, so parquet min/max row-group
        statistics prune the scan to the matching key range — the
        terms-dict-on-disk discipline (Lucene's BlockTree term index) instead
        of loading the whole vocabulary per Searcher. Hot slices are cached."""
        if hasattr(self, "_vocab_tbl"):  # full dict already resident
            v = self._vocab_tbl
            m = pc.greater_equal(v.column("term"), lo)
            if hi is not None:
                m = pc.and_(m, pc.less(v.column("term"), hi))
            return v.filter(m)
        cache = getattr(self, "_vocab_range_cache", None)
        if cache is None:
            cache = self._vocab_range_cache = {}
        key = (lo, hi)
        if key not in cache:
            filters = [("term", ">=", lo)]
            if hi is not None:
                filters.append(("term", "<", hi))
            raw = pq.read_table(self._stats_dir, columns=["term", "df"],
                                filters=filters)
            tbl = (raw.group_by(["term"]).aggregate([("df", "sum")])
                   .rename_columns(["term", "df"]).sort_by("term"))
            if len(cache) >= 64:
                cache.clear()
            cache[key] = tbl
        return cache[key]

    def _vocab_scan(self, batch_fn, cache_key=None) -> "pa.Table":
        """Stream the stats shards through ``batch_fn`` (pa.Table ->
        filtered pa.Table of surviving (term, df) rows) WITHOUT
        materializing the term dictionary — the terms-enum + automaton
        walk (Lucene FilteredTermsEnum): peak memory is one 64k-term
        batch plus the survivors, at any vocabulary size. Salted terms
        have partial rows across shards; survivors are re-aggregated at
        the end (matching is term-local, so partial rows match
        consistently). Results are LRU-cached under ``cache_key`` —
        repeated expansions of the same pattern don't re-scan."""
        cache = getattr(self, "_vocab_scan_cache", None)
        if cache is None:
            cache = self._vocab_scan_cache = {}
        if cache_key is not None and cache_key in cache:
            return cache[cache_key]
        if hasattr(self, "_vocab_tbl"):  # full dict already resident
            parts = [batch_fn(self._vocab_tbl)]
        else:
            import pyarrow.dataset as pads
            dset = pads.dataset(self._stats_dir)
            parts = []
            for b in dset.to_batches(columns=["term", "df"],
                                     batch_size=1 << 16):
                t = batch_fn(pa.Table.from_batches([b]))
                if t.num_rows:
                    parts.append(t)
        parts = [p for p in parts if p.num_rows]
        if not parts:
            out = pa.table({"term": pa.array([], pa.string()),
                            "df": pa.array([], pa.int64())})
        else:
            out = (pa.concat_tables(parts).group_by(["term"])
                   .aggregate([("df", "sum")])
                   .rename_columns(["term", "df"]).sort_by("term"))
        if cache_key is not None:
            if len(cache) >= 64:
                cache.clear()
            cache[cache_key] = out
        return out

    def fuzzy_candidates(self, term: str, max_edits: int = 2,
                         prefix_length: int = 0,
                         transpositions: bool = False) -> "pa.Table":
        """(term, df, distance) for vocabulary terms within ``max_edits``
        — the FuzzyQuery / TermSuggester candidate enumeration as a
        streamed banded scan: per batch, a vectorized utf8_length band
        (|len(t)-len(q)| <= max_edits is necessary) prunes before the
        bounded Levenshtein DP runs on the survivors.

        ``prefix_length`` (FuzzyQuery.prefixLength): the first N chars
        must match exactly — the scan then reads ONLY the prefix's
        terms-dict range (row-group pruned), the dominant cost lever on
        a crawl-scale vocabulary."""
        from .features import _levenshtein

        def band_fn(t: "pa.Table") -> "pa.Table":
            lens = pc.utf8_length(t.column("term"))
            band = pc.and_(
                pc.greater_equal(lens, pa.scalar(len(term) - max_edits)),
                pc.less_equal(lens, pa.scalar(len(term) + max_edits)))
            t = t.filter(band)
            if t.num_rows == 0:
                return t
            keep = [_levenshtein(term, x, max_edits,
                                 transpositions) <= max_edits
                    for x in t.column("term").to_pylist()]
            return t.filter(pa.array(keep))

        if prefix_length > 0:
            pre = term[:prefix_length]
            v = self._vocab_range(*self._prefix_bounds(pre))
            v = band_fn(v.filter(pc.starts_with(v.column("term"), pre)))
        else:
            v = self._vocab_scan(band_fn, cache_key=("fz", term, max_edits,
                                                     transpositions))
        dist = [_levenshtein(term, x, max_edits, transpositions)
                for x in v.column("term").to_pylist()]
        return v.append_column("distance", pa.array(dist, pa.int64()))

    @staticmethod
    def _prefix_bounds(prefix: str) -> Tuple[str, str]:
        """[lo, hi) term range covering every string with ``prefix``."""
        return prefix, prefix + "\U0010FFFF"

    def expand_prefix(self, prefix: str) -> List[str]:
        v = self._vocab_range(*self._prefix_bounds(prefix))
        m = pc.starts_with(v.column("term"), prefix)
        return sorted(v.filter(m).column("term").to_pylist())

    def expand_case_insensitive(self, term: str) -> List[str]:
        """Vocabulary terms equal to ``term`` under case folding — the
        `case_insensitive` option of the term query
        (TermQueryBuilder.java:58, CASE_INSENSITIVE_FIELD). Streamed
        terms-dict scan (casefold defeats range pruning), LRU-cached."""
        low = term.lower()
        v = self._vocab_scan(
            lambda t: t.filter(pc.equal(pc.utf8_lower(t.column("term")),
                                        low)),
            cache_key=("ci", low))
        return v.column("term").to_pylist()

    def expand_prefix_ci(self, prefix: str) -> List[str]:
        """Case-insensitive prefix expansion (PrefixQueryBuilder's
        case_insensitive option): streamed casefolded starts_with."""
        low = prefix.lower()
        v = self._vocab_scan(
            lambda t: t.filter(pc.starts_with(
                pc.utf8_lower(t.column("term")), low)),
            cache_key=("cip", low))
        return v.column("term").to_pylist()

    def expand_wildcard(self, pattern: str,
                        case_insensitive: bool = False) -> List[str]:
        """``?`` = one char, ``*`` = any run (WildcardQuery). Matching runs as
        ONE vectorized Arrow regex kernel over the sorted terms dict (not a
        per-term Python loop); a literal prefix before the first wildcard
        additionally prunes with a binary-searchable starts_with.
        ``case_insensitive`` switches the kernel to (?i) and skips the
        prefix pruning (case variance defeats the range bound)."""
        import re as _re
        rx = ("^" + _re.escape(pattern)
              .replace(r"\*", ".*").replace(r"\?", ".") + "$")
        if case_insensitive:
            rx = "(?i)" + rx
            v = self._vocab_scan(
                lambda t: t.filter(pc.match_substring_regex(
                    t.column("term"), rx)),
                cache_key=("wci", rx))
            return v.column("term").to_pylist()
        lit = _re.split(r"[*?]", pattern, maxsplit=1)[0]
        if lit:
            v = self._vocab_range(*self._prefix_bounds(lit))
            m = pc.match_substring_regex(v.column("term"), rx)
            return v.filter(m).column("term").to_pylist()  # term-sorted
        # no literal prefix: stream the dict against the automaton instead
        # of materializing it (the carried full-vocab fallback, removed)
        v = self._vocab_scan(
            lambda t: t.filter(pc.match_substring_regex(t.column("term"),
                                                        rx)),
            cache_key=("wc", rx))
        return v.column("term").to_pylist()

    def expand_fuzzy(self, term: str, max_edits: int = 2,
                     prefix_length: int = 0,
                     transpositions: bool = False) -> List[str]:
        """Vocabulary terms within ``max_edits`` via the STREAMED banded
        scan (fuzzy_candidates) — the terms dict is never materialized
        (the terms-enum + automaton shape, FuzzyQuery).
        ``transpositions=True`` = Lucene's default OSA distance."""
        return self.fuzzy_candidates(term, max_edits, prefix_length,
                                     transpositions) \
            .column("term").to_pylist()  # _vocab_scan output is term-sorted

    def complete(self, prefix: str, size: int = 5):
        """Completion suggester: terms with the prefix ordered by document
        frequency (the popularity-weighted completion shape,
        search/suggest/completion — FST replaced by the terms-dict scan)."""
        import pandas as pd
        v = self._vocab_range(*self._prefix_bounds(prefix))
        m = pc.starts_with(v.column("term"), prefix)
        sub = v.filter(m).to_pandas()
        sub = sub.sort_values(["df", "term"], ascending=[False, True],
                              kind="mergesort").head(size)
        sub["rank"] = np.arange(1, len(sub) + 1, dtype=np.int64)
        return sub.reset_index(drop=True)

    def prefix_docs(self, prefix: str) -> np.ndarray:
        """Docs containing ANY term with the prefix (constant-score rewrite)."""
        terms = self.expand_prefix(prefix)
        return self.bool_docs(should=terms) if terms else np.empty(0, np.int64)

    def wildcard_docs(self, pattern: str) -> np.ndarray:
        terms = self.expand_wildcard(pattern)
        return self.bool_docs(should=terms) if terms else np.empty(0, np.int64)

    def fuzzy_docs(self, term: str, max_edits: int = 2,
                   transpositions: bool = False) -> np.ndarray:
        terms = self.expand_fuzzy(term, max_edits,
                                  transpositions=transpositions)
        return self.bool_docs(should=terms) if terms else np.empty(0, np.int64)

    def terms_agg_on_hits(self, query_text: str, field: str, size: int = 10,
                          operator: str = "or"):
        """The query+aggregations request shape (a terms agg computed over the
        docs matching the query, SearchSourceBuilder.aggregation): bucket the
        matching docs' keyword doc values, order (count desc, key asc)."""
        import pandas as pd

        terms = list(dict.fromkeys(self.analyzer.tokens(query_text)))
        if not terms:
            return pd.DataFrame({field: [], "doc_count": []})
        docs = (self.bool_docs(must=terms) if operator == "and"
                else self.bool_docs(should=terms))
        if docs.size == 0:
            return pd.DataFrame({field: [], "doc_count": []})
        seg_idx = np.searchsorted(self._bases, docs, side="right") - 1
        vals = []
        for si in np.unique(seg_idx):
            seg_id = int(self._seg_ids[si])
            local = docs[seg_idx == si] - int(self._bases[si])
            vals.append(self.doc_values(seg_id, field)[local])
        v = np.concatenate(vals)
        uniq, counts = np.unique(v, return_counts=True)
        out = pd.DataFrame({field: uniq, "doc_count": counts.astype(np.int64)})
        return (out.sort_values(["doc_count", field], ascending=[False, True],
                                kind="mergesort").head(size)
                .reset_index(drop=True))

    def search_sorted(self, query_text: str, sort_field: str, k: int = 10,
                      ascending: bool = True, operator: str = "or",
                      filters: Optional[Dict[str, object]] = None,
                      early_terminate="auto"):
        """Field sort (FieldSortBuilder): top-k matching docs ordered by a
        doc-values field instead of score; tie-break docid asc.

        Index-sort early termination (QueryPhase.canEarlyTerminate +
        IndexSortConfig): when the requested sort equals the index sort's
        leading column in the SAME direction (segments are built ascending),
        per-segment local docid order IS the sort order, so each segment
        contributes only its first k (post-filter) matches and the sort
        column is read with a row-group-pruned prefix scan instead of a
        whole-column gather. Descending requests never early-terminate —
        same restriction as the reference (ties at the k-th value would
        need the SMALLEST docids, which a tail cut cannot supply).
        ``early_terminate``: "auto" (use when sound), True (assert sound),
        False (always full path)."""
        import pandas as pd

        terms = list(dict.fromkeys(self.analyzer.tokens(query_text)))
        if not terms:
            return pd.DataFrame({"_docid": [], sort_field: []})
        docs = (self.bool_docs(must=terms) if operator == "and"
                else self.bool_docs(should=terms))
        if docs.size == 0:
            return pd.DataFrame({"_docid": [], sort_field: []})

        sort_ok = (bool(self.manifest.index_sort)
                   and sort_field == self.manifest.index_sort[0]
                   and ascending)
        if early_terminate is True and not sort_ok:
            raise ValueError(
                f"cannot early-terminate: sort ({sort_field},"
                f" {'asc' if ascending else 'desc'}) does not match index"
                f" sort {self.manifest.index_sort} ascending")
        et = sort_ok if early_terminate == "auto" else bool(early_terminate)
        seg_sorted = {s.seg_id: getattr(s, "index_sorted", True)
                      for s in self.manifest.segments}

        seg_idx = np.searchsorted(self._bases, docs, side="right") - 1
        vals_parts, doc_parts = [], []
        for si in np.unique(seg_idx):
            seg_id = int(self._seg_ids[si])
            base = int(self._bases[si])
            local = docs[seg_idx == si] - base
            if filters:
                keep = np.ones(len(local), dtype=bool)
                for col, val in filters.items():
                    keep &= self._spec_mask(
                        self.doc_values(seg_id, col)[local], val)
                local = local[keep]
            if local.size == 0:
                continue
            if et and seg_sorted.get(seg_id, True):
                local = local[:k]  # collector stops after k competitive hits
                hi = int(local[-1]) + 1
                dv = self.doc_values_slice(seg_id, sort_field, 0, hi)[local]
            else:
                dv = self.doc_values(seg_id, sort_field)[local]
            vals_parts.append(dv)
            doc_parts.append(local + base)
        if not doc_parts:
            return pd.DataFrame({"_docid": [], sort_field: []})
        vals = np.concatenate(vals_parts)
        gdocs = np.concatenate(doc_parts)
        df = pd.DataFrame({"_docid": gdocs, sort_field: vals})
        df = df.sort_values([sort_field, "_docid"],
                            ascending=[ascending, True], kind="mergesort")
        return df.head(k).reset_index(drop=True)

    def count(self, query_text: str, operator: str = "or") -> int:
        """Hit count without scoring (the `_count` API / track_total_hits).
        Segment-streamed: peak memory is one segment's doc-set, never a
        global doc-id array."""
        terms = list(dict.fromkeys(self.analyzer.tokens(query_text)))
        if not terms:
            return 0
        kw = {"must": terms} if operator == "and" else {"should": terms}
        return sum(local.size for _, _, local in self._iter_bool_docs(**kw))

    def search_with_totals(self, query_text: str, k: int = 10,
                           operator: str = "or",
                           track_total_hits=True,
                           terminate_after: Optional[int] = None) -> dict:
        """Collection controls (ref search/query/QueryPhase.java:367-369,
        SearchContext.java:100-102):

        - ``track_total_hits``: True = exact total; an int N = count
          accurately only up to N, report (N, "gte") beyond; False = skip.
        - ``terminate_after``: stop collecting once that many hits have been
          seen (segment granularity here — Lucene terminates mid-segment in
          doc order); results carry ``terminated_early``.

        Returns {hits, total, total_relation, terminated_early}."""
        terminated = False
        allowed: Optional[set] = None
        if terminate_after is not None:
            # collect segment prefixes until the hit budget is exhausted —
            # ONE streaming doc-set pass over segments in order, then a
            # search restricted to the collected segment set (restriction is
            # enforced inside search(), immune to postings-cache pre-warm
            # and to merged bucket files spanning all segments)
            terms = list(dict.fromkeys(self.analyzer.tokens(query_text)))
            kw = {"must": terms} if operator == "and" else {"should": terms}
            seen = 0
            allowed = set()
            for sid, _, local in self._iter_bool_docs(**kw):
                allowed.add(sid)
                seen += local.size
                if seen >= terminate_after:
                    terminated = True
                    break
        hits = self.search(query_text, k=k, operator=operator,
                           allowed_segs=allowed if terminated else None)
        total = None
        relation = None
        if track_total_hits is True:
            total, relation = self.count(query_text, operator), "eq"
        elif isinstance(track_total_hits, int) and not isinstance(
                track_total_hits, bool):
            exact = self.count(query_text, operator)
            if exact > track_total_hits:
                total, relation = track_total_hits, "gte"
            else:
                total, relation = exact, "eq"
        return {"hits": hits, "total": total, "total_relation": relation,
                "terminated_early": terminated}

    def _segment_match_count(self, query_text: str, seg_id: int,
                             operator: str) -> int:
        """Matched-doc count within ONE segment (no scoring)."""
        terms = list(dict.fromkeys(self.analyzer.tokens(query_text)))
        if not terms:
            return 0
        kw = {"must": terms} if operator == "and" else {"should": terms}
        for sid, _, local in self._iter_bool_docs(**kw):
            if sid == seg_id:
                return int(local.size)
        return 0

    def explain(self, query_text: str, docid: int) -> dict:
        """Scoring breakdown for one doc (the `_explain` API,
        search/fetch/subphase/ExplainPhase): per-term tf, df, idf, quantized
        dl and contribution, plus the summed score."""
        terms = self.analyzer.tokens(query_text)
        if not terms:
            return {"docid": docid, "matched": False, "score": 0.0, "terms": []}
        from collections import Counter as _C
        from ..index.norms import NORM_LENGTH_TABLE
        mult = _C(terms)
        stats = self.term_stats(list(mult))
        si = int(np.searchsorted(self._bases, docid, side="right") - 1)
        seg_id = int(self._seg_ids[si])
        local = docid - int(self._bases[si])
        norms = self.norms(seg_id)
        nb = int(norms[local])
        detail = []
        total = 0.0
        post = self.postings([t for t in mult if stats[t][0] > 0])
        for t, m in mult.items():
            df = stats[t][0]
            if df == 0:
                continue
            tf = 0
            tbl = post.get(t)
            if tbl is not None and tbl.num_rows:
                for row in tbl.to_pylist():
                    if int(row["seg_id"]) != seg_id:
                        continue
                    docids, tfs = self._decode_chunk_rows(row)
                    pos = np.searchsorted(docids, local)
                    if pos < len(docids) and docids[pos] == local:
                        tf = int(tfs[pos])
                        break
            if tf == 0:
                continue
            idf = bm25_idf(df, self.N, self.dtype)
            w = term_weight(idf, m, self.params, self.dtype)
            contrib = float(score_postings(np.array([tf]), np.array([nb]),
                                           w, self.norm_cache)[0])
            detail.append({
                "term": t, "boost": m, "tf": tf, "df": df,
                "idf": float(idf), "dl_quantized": int(NORM_LENGTH_TABLE[nb]),
                "contribution": contrib,
            })
            total += contrib
        return {"docid": int(docid), "matched": bool(detail),
                "score": float(self.dtype(total)), "avgdl": self.avgdl,
                "k1": self.params.k1, "b": self.params.b, "terms": detail}

    # ------------------------------------------------------------ doc sets

    def term_docs(self, term: str) -> np.ndarray:
        """All global docids containing `term` (ascending) — the primitive for
        bool filter algebra (BoolQueryBuilder semantics)."""
        parts = [local + self.doc_base(sid)
                 for sid, local in self._term_docs_by_seg([term])[term].items()]
        if not parts:
            return np.empty(0, np.int64)
        return np.sort(np.concatenate(parts))

    def term_postings(self, term: str) -> Tuple[np.ndarray, np.ndarray]:
        """(ascending global docids, term frequencies) for one term — the
        TermQuery scoring primitive (search_as_you_type's prefix-subfield
        term query reads tf through this)."""
        post = self.postings([term]).get(term)
        d_out, t_out = [], []
        if post is not None and post.num_rows:
            for row in post.to_pylist():
                docids, tfs = self._decode_chunk_rows(row)
                d_out.append(docids + self.doc_base(int(row["seg_id"])))
                t_out.append(tfs)
        if not d_out:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        d = np.concatenate(d_out)
        t = np.concatenate(t_out)
        order = np.argsort(d, kind="stable")
        return d[order], t[order]

    def _term_docs_by_seg(self, terms: Sequence[str]
                          ) -> Dict[str, Dict[int, np.ndarray]]:
        """term -> {seg_id: ascending LOCAL docids} for every requested term
        (terms absent from a segment simply have no entry)."""
        post = self.postings(list(dict.fromkeys(terms)))
        out: Dict[str, Dict[int, np.ndarray]] = {t: {} for t in terms}
        for t in set(terms):
            tbl = post.get(t)
            if tbl is None or tbl.num_rows == 0:
                continue
            per: Dict[int, List[np.ndarray]] = {}
            for row in tbl.to_pylist():
                docids, _ = self._decode_chunk_rows(row)
                per.setdefault(int(row["seg_id"]), []).append(docids)
            # chunks arrive (seg, chunk)-sorted with ascending docids, so the
            # concatenation is already sorted; np.sort guards reordered input
            out[t] = {sid: (v[0] if len(v) == 1
                            else np.sort(np.concatenate(v)))
                      for sid, v in per.items()}
        return out

    def _iter_bool_docs(self, must: Sequence[str] = (),
                        should: Sequence[str] = (),
                        must_not: Sequence[str] = (),
                        minimum_should_match=0):
        """Segment-streamed bool algebra: yields (seg_id, doc_base,
        ascending local docids) per segment in seg order. Peak memory is ONE
        segment's doc-set — match_all builds arange(seg.doc_count), never a
        global arange(N), and must_not subtracts per-segment (the
        LeafReaderContext-at-a-time shape of Lucene's BooleanWeight)."""
        if isinstance(minimum_should_match, str):
            pct = minimum_should_match.strip()
            if pct.endswith("%"):
                minimum_should_match = (len(should) * int(pct[:-1])) // 100
            else:
                minimum_should_match = int(pct)
        must, should, must_not = list(must), list(should), list(must_not)
        by_term = self._term_docs_by_seg(must + should + must_not)
        empty = np.empty(0, np.int64)
        for s in sorted(self.manifest.segments, key=lambda x: x.seg_id):
            sid, base = s.seg_id, self.doc_base(s.seg_id)
            cur: Optional[np.ndarray] = None
            for t in must:
                d = by_term[t].get(sid, empty)
                cur = d if cur is None else np.intersect1d(
                    cur, d, assume_unique=True)
                if cur.size == 0:
                    break
            if must and (cur is None or cur.size == 0):
                yield sid, base, empty
                continue
            if should:
                sh = [by_term[t].get(sid, empty) for t in should]
                cat = np.concatenate(sh) if sh else empty
                if minimum_should_match > 1:
                    ud, cnt = np.unique(cat, return_counts=True)
                    union = ud[cnt >= minimum_should_match]
                else:
                    union = np.unique(cat)
                if cur is None:
                    cur = union
                elif minimum_should_match >= 1:
                    cur = np.intersect1d(cur, union, assume_unique=True)
            if cur is None:
                cur = np.arange(s.doc_count, dtype=np.int64)  # match_all
            for t in must_not:
                if cur.size == 0:
                    break
                cur = np.setdiff1d(cur, by_term[t].get(sid, empty),
                                   assume_unique=True)
            yield sid, base, cur

    def bool_docs(self, must: Sequence[str] = (), should: Sequence[str] = (),
                  must_not: Sequence[str] = (), minimum_should_match=0,
                  ) -> np.ndarray:
        """Sorted-docid set algebra over posting lists (intersect / union /
        difference) — ref server/index/query/BoolQueryBuilder.java.
        ``minimum_should_match`` accepts an int or a percentage string like
        "75%" (of the should-clause count, floor — Queries.java
        calculateMinShouldMatch semantics for positive percentages).
        Internally segment-streamed (:meth:`_iter_bool_docs`); only the
        RESULT set is materialized here."""
        parts = [local + base
                 for _, base, local in self._iter_bool_docs(
                     must, should, must_not, minimum_should_match)
                 if local.size]
        if not parts:
            return np.empty(0, np.int64)
        return np.concatenate(parts)

    @staticmethod
    def _decode_positions(row: dict) -> Dict[int, np.ndarray]:
        """pos_enc chunk -> {local docid: ascending positions} (index-native
        phrase support; positions are delta-gapped per posting)."""
        docids, tfs = Searcher._decode_chunk_rows(row)
        gaps = vb_decode(row["pos_enc"]).astype(np.int64)
        cum = np.cumsum(gaps)
        tok_prefix = np.concatenate(([0], np.cumsum(tfs)))
        starts = tok_prefix[:-1]
        # reset the running sum at each posting start (first gap is absolute)
        base = np.repeat(cum[starts] - gaps[starts], tfs)
        pos = cum - base
        return {int(d): pos[tok_prefix[i]:tok_prefix[i + 1]]
                for i, d in enumerate(docids)}

    def match_phrase(self, phrase_text: str, slop: int = 0) -> np.ndarray:
        """match_phrase: candidate docs from the AND of the phrase terms, then
        position verification — from STORED positions when the index has them
        (manifest.has_positions; DOCS_AND_FREQS_AND_POSITIONS parity,
        TextFieldMapper.java:128-136), else by re-analyzing the candidates'
        stored text (fetch phase). Query-token positions keep stopword gaps,
        mirroring Lucene's PhraseQuery over a stop-filtered stream.

        ``slop > 0`` uses the Lucene sloppy measure (SloppyPhraseMatcher /
        MatchPhraseQueryBuilder.java:44-60): a doc matches when some choice of
        one position per query term — distinct positions for repeated terms —
        has adjusted-offset span  max_i(p_i - q_i) - min_i(p_i - q_i) <= slop
        (a transposition costs 2)."""
        q_toks, q_pos = self.analyzer.analyze(phrase_text)
        if not q_toks:
            return np.empty(0, np.int64)
        cand = self.bool_docs(must=list(dict.fromkeys(q_toks)))
        if cand.size == 0:
            return cand
        if self.manifest.has_positions:
            return self._match_phrase_indexed(q_toks, q_pos, cand, slop)
        return self._match_phrase_textverify(q_toks, q_pos, cand, slop)

    @staticmethod
    def _sloppy_ok(pos_lists: List[np.ndarray], q_pos: Sequence[int],
                   q_toks: Sequence[str], slop: int) -> bool:
        """Exists a selection with adjusted span <= slop? Min-span k-pointer
        sweep over the offset-adjusted position lists; at each candidate
        window repeated terms must claim DISTINCT document positions (greedy
        interval matching — feasible sets are contiguous, so earliest-
        position-first is exact)."""
        import heapq
        k = len(pos_lists)
        adj = [pl.astype(np.int64) - q for pl, q in zip(pos_lists, q_pos)]
        idx = [0] * k
        heap = [(int(a[0]), i) for i, a in enumerate(adj)]
        heapq.heapify(heap)
        cur_max = max(int(a[0]) for a in adj)
        dup = len(set(q_toks)) < k
        while True:
            cur_min, i = heap[0]
            if cur_max - cur_min <= slop:
                if not dup:
                    return True
                # distinctness for repeated terms: slots of term t may take any
                # doc position p with cur_min <= p - q_slot <= cur_min + slop
                ok = True
                by_term: Dict[str, List[int]] = {}
                for si, t in enumerate(q_toks):
                    by_term.setdefault(t, []).append(si)
                for t, slots in by_term.items():
                    if len(slots) == 1:
                        continue
                    pl = pos_lists[slots[0]]
                    taken: set = set()
                    # earliest-deadline-first over sorted slot offsets
                    for si in sorted(slots, key=lambda s: q_pos[s]):
                        lo, hi = cur_min + q_pos[si], cur_min + slop + q_pos[si]
                        got = None
                        for p in pl[np.searchsorted(pl, lo):]:
                            if p > hi:
                                break
                            if int(p) not in taken:
                                got = int(p)
                                break
                        if got is None:
                            ok = False
                            break
                        taken.add(got)
                    if not ok:
                        break
                if ok:
                    return True
            idx[i] += 1
            if idx[i] >= len(adj[i]):
                return False
            nxt = int(adj[i][idx[i]])
            heapq.heapreplace(heap, (nxt, i))
            if nxt > cur_max:
                cur_max = nxt

    def _fetch_text_rows(self, cand) -> list:
        """Stored-text rows for fetch-verify, with a ``_text`` key. A LIST
        text_col is a copy_to target (FieldMapper.CopyTo): the indexed text
        was the space-join of the source fields, so re-verify joins the
        same way."""
        tc = self.manifest.text_col
        if isinstance(tc, (list, tuple)):
            rows = self.fetch(list(cand), columns=list(tc)).to_pylist()
            for r in rows:
                r["_text"] = " ".join(str(r.get(c) or "") for c in tc)
            return rows
        rows = self.fetch(list(cand), columns=[tc]).to_pylist()
        for r in rows:
            v = r.get(tc)
            # a LIST value (multi-valued field) passes through; the
            # analyze step applies the position_increment_gap formula
            r["_text"] = v if isinstance(v, list) else (v or "")
        return rows

    def _analyze_stored(self, v):
        """(tokens, positions) of one stored text value. List values are
        multi-valued fields: element k's positions offset by
        Σ_{j<k}(kept_len_j + gap) — EXACTLY the arithmetic
        ``segment._tokenize_multivalue`` indexed, so phrase re-verify
        agrees bit-for-bit and never matches across values."""
        if isinstance(v, list):
            toks: list = []
            poss: list = []
            base = 0
            for s in v:
                t, p = self.analyzer.analyze(s or "")
                toks.extend(t)
                poss.extend(int(x) + base for x in p)
                base += len(t) + 100
            return toks, poss
        return self.analyzer.analyze(v or "")

    def _match_phrase_textverify(self, q_toks, q_pos, cand: np.ndarray,
                                 slop: int = 0) -> np.ndarray:
        out = []
        q_pos0 = [p - q_pos[0] for p in q_pos]
        for r in self._fetch_text_rows(cand.tolist()):
            toks, poss = self._analyze_stored(r["_text"])
            pos_of: Dict[str, list] = {}
            for t, p in zip(toks, poss):
                pos_of.setdefault(t, []).append(p)
            if slop > 0:
                lists = [np.asarray(pos_of.get(t, ()), dtype=np.int64)
                         for t in q_toks]
                if all(l.size for l in lists) and self._sloppy_ok(
                        lists, q_pos, q_toks, slop):
                    out.append(r["_docid"])
                continue
            starts = pos_of.get(q_toks[0], [])
            first_pos_sets = [set(pos_of.get(t, ())) for t in q_toks]
            for s0 in starts:
                if all((s0 + dp) in ps for dp, ps in zip(q_pos0, first_pos_sets)):
                    out.append(r["_docid"])
                    break
        return np.array(sorted(out), dtype=np.int64)

    def match_phrase_prefix(self, phrase_text: str, max_expansions: int = 50
                            ) -> np.ndarray:
        """match_phrase_prefix: the LAST analyzed token is treated as a
        prefix, expanded against the terms dict (df-ordered, capped at
        ``max_expansions`` — MatchPhrasePrefixQueryBuilder semantics), and
        the union of the completed phrases matches."""
        q_toks, q_pos = self.analyzer.analyze(phrase_text)
        if not q_toks:
            return np.empty(0, np.int64)
        # Lucene expands the trailing prefix in TERM-DICTIONARY order, capped
        # at max_expansions (MatchPhrasePrefixQueryBuilder -> MultiPhrasePrefix
        # rewrite) — the same cap applies in the single-token branch.
        if len(q_toks) == 1:
            terms = self.expand_prefix(q_toks[0])[:max_expansions]
            return (self.bool_docs(should=terms) if terms
                    else np.empty(0, np.int64))
        expansions = self.expand_prefix(q_toks[-1])[:max_expansions]
        out: List[np.ndarray] = []
        for exp in expansions:
            toks = q_toks[:-1] + [exp]
            cand = self.bool_docs(must=list(dict.fromkeys(toks)))
            if cand.size == 0:
                continue
            if self.manifest.has_positions:
                out.append(self._match_phrase_indexed(toks, q_pos, cand))
            else:
                out.append(self._match_phrase_textverify(toks, q_pos, cand))
        if not out:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(out))

    def _match_phrase_indexed(self, q_toks, q_pos, cand: np.ndarray,
                              slop: int = 0) -> np.ndarray:
        """Verify phrase alignment from stored positions (no doc fetch)."""
        uniq = list(dict.fromkeys(q_toks))
        post = self.postings(uniq)
        q_delta = [p - q_pos[0] for p in q_pos]
        # per (term, seg): lazily decoded position maps for candidate docs
        out: List[int] = []
        seg_idx = np.searchsorted(self._bases, cand, side="right") - 1
        for si in np.unique(seg_idx):
            seg_id = int(self._seg_ids[si])
            base = int(self._bases[si])
            locals_ = cand[seg_idx == si] - base
            pos_of_term: Dict[str, Dict[int, np.ndarray]] = {}
            for t in uniq:
                maps: Dict[int, np.ndarray] = {}
                tbl = post.get(t)
                if tbl is None or tbl.num_rows == 0:
                    continue
                for row in tbl.to_pylist():
                    if int(row["seg_id"]) != seg_id:
                        continue
                    maps.update(self._decode_positions(row))
                pos_of_term[t] = maps
            for ld in locals_:
                ld = int(ld)
                sets = [pos_of_term.get(t, {}).get(ld) for t in q_toks]
                if any(x is None for x in sets):
                    continue
                if slop > 0:
                    if self._sloppy_ok(sets, q_pos, q_toks, slop):
                        out.append(ld + base)
                    continue
                first = sets[0]
                ok = False
                set_lookups = [set(x.tolist()) for x in sets]
                for s0 in first:
                    if all((s0 + dp) in ps for dp, ps in zip(q_delta, set_lookups)):
                        ok = True
                        break
                if ok:
                    out.append(ld + base)
        return np.array(sorted(out), dtype=np.int64)

    def span_near(self, terms: Sequence[str], slop: int = 0,
                  in_order: bool = True) -> np.ndarray:
        """span_near (ref index/query/SpanNearQueryBuilder.java / Lucene
        SpanNearQuery): docs where all ``terms`` occur within a window —
        selection positions p_1..p_n (distinct) with
        (max(p)-min(p)+1) - n <= slop intervening positions; ``in_order``
        additionally requires p_1 < p_2 < ... < p_n. Terms are analyzed.
        Position source: stored positions when indexed, else re-analysis of
        the candidate docs (same fallback as match_phrase)."""
        q_toks = [t for term in terms for t in self.analyzer.tokens(term)]
        if not q_toks:
            return np.empty(0, np.int64)
        cand = self.bool_docs(must=list(dict.fromkeys(q_toks)))
        if cand.size == 0:
            return cand
        n = len(q_toks)

        def check(pos_lists: List[np.ndarray]) -> bool:
            if in_order:
                # greedy scan over first-term starts: earliest feasible
                # increasing chain minimizes the window
                for s0 in pos_lists[0]:
                    prev = int(s0)
                    ok = True
                    for pl in pos_lists[1:]:
                        nxt = pl[np.searchsorted(pl, prev + 1)] if \
                            np.searchsorted(pl, prev + 1) < len(pl) else None
                        if nxt is None:
                            ok = False
                            break
                        prev = int(nxt)
                    if ok and (prev - int(s0) + 1) - n <= slop:
                        return True
                return False
            # unordered: min window covering one position per term == the
            # sloppy sweep with all query offsets 0 and span <= slop+n-1
            return self._sloppy_ok(pos_lists, [0] * n, q_toks, slop + n - 1)

        out: List[int] = []
        if self.manifest.has_positions:
            uniq = list(dict.fromkeys(q_toks))
            post = self.postings(uniq)
            seg_idx = np.searchsorted(self._bases, cand, side="right") - 1
            for si in np.unique(seg_idx):
                seg_id = int(self._seg_ids[si])
                base = int(self._bases[si])
                pos_of_term: Dict[str, Dict[int, np.ndarray]] = {}
                for t in uniq:
                    maps: Dict[int, np.ndarray] = {}
                    tbl = post.get(t)
                    if tbl is not None and tbl.num_rows:
                        for row in tbl.to_pylist():
                            if int(row["seg_id"]) == seg_id:
                                maps.update(self._decode_positions(row))
                    pos_of_term[t] = maps
                for ld in (cand[seg_idx == si] - base):
                    lists = [pos_of_term[t].get(int(ld)) for t in q_toks]
                    if any(x is None for x in lists):
                        continue
                    if check(lists):
                        out.append(int(ld) + base)
        else:
            for r in self._fetch_text_rows(cand.tolist()):
                toks, poss = self._analyze_stored(r["_text"])
                pos_of: Dict[str, list] = {}
                for t, p in zip(toks, poss):
                    pos_of.setdefault(t, []).append(p)
                lists = [np.asarray(pos_of.get(t, ()), dtype=np.int64)
                         for t in q_toks]
                if all(l.size for l in lists) and check(lists):
                    out.append(r["_docid"])
        return np.array(sorted(out), dtype=np.int64)

    # --------------------------------------------------------------- fetch

    def get(self, docid: int) -> Optional[dict]:
        """Single-doc point read (the `GET /{index}/_doc/{id}` analogue —
        stored fields of one docid; returns None when out of range)."""
        if not (0 <= int(docid) < self.N):
            return None
        rows = self.fetch([int(docid)]).to_pylist()
        return rows[0] if rows else None

    def mget(self, docids: Sequence[int]) -> pa.Table:
        """Multi-doc point read (`_mget`): stored fields for many ids in one
        segment-grouped fetch."""
        return self.fetch([d for d in docids if 0 <= int(d) < self.N])

    def get_by(self, col: str, value) -> pa.Table:
        """Point lookup by a doc-values column (the custom-`_id` routing
        analogue: equality scan over per-segment doc values, then fetch)."""
        hits = []
        for s in sorted(self.manifest.segments, key=lambda x: x.seg_id):
            vals = self.doc_values(s.seg_id, col)
            m = self._spec_mask(vals, value)
            if m.any():
                hits.extend((np.flatnonzero(m) + self.doc_base(s.seg_id))
                            .tolist())
        return self.fetch(hits)

    def fetch(self, global_docids: Sequence[int], columns: Optional[List[str]] = None
              ) -> pa.Table:
        """Fetch-phase join: top-k global docids -> stored fields from the
        doc-store parquet of only the owning segments (FetchPhase.java)."""
        g = np.asarray(sorted(set(int(d) for d in global_docids)), dtype=np.int64)
        if g.size == 0:
            # empty but with schema (footer metadata only, no data read)
            seg0 = self._seg_dir(int(self._seg_ids[0]))
            schema = pq.read_schema(os.path.join(seg0, "docs.parquet"))
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            return schema.empty_table().append_column(
                "_docid", pa.array([], type=pa.int64()))
        seg_idx = np.searchsorted(self._bases, g, side="right") - 1
        out = []
        for si in np.unique(seg_idx):
            seg_id = int(self._seg_ids[si])
            base = int(self._bases[si])
            local = (g[seg_idx == si] - base).tolist()
            t = pq.read_table(
                os.path.join(self._seg_dir(seg_id), "docs.parquet"),
                filters=[("docid", "in", local)],
                columns=(sorted({*columns, "docid"}) if columns else None),
            )
            gd = pc.add(t.column("docid"), pa.scalar(base, type=pa.int64()))
            t = t.append_column("_docid", gd.cast(pa.int64()))
            if columns:
                t = t.select(columns + ["_docid"])
            out.append(t)
        return pa.concat_tables(out)
