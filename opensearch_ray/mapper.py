"""Field-type semantics beyond plain text/keyword/numeric columns.

Mirrors the reference's mapper layer for the field types whose behavior is
query-visible (the TYPE defines how values are encoded and which queries
they answer), re-expressed as vectorized Arrow/numpy transforms:

- **range fields** (``server/index/mapper/RangeFieldMapper.java``,
  ``RangeType.java``): a per-doc [lo, hi] interval; range queries carry a
  ``relation`` of intersects / within / contains
  (``RangeQueryBuilder.relation``).
- **ip fields** (``server/index/mapper/IpFieldMapper.java``): dotted-quad
  IPv4; a term query accepts a CIDR mask
  (``InetAddressPoint.newPrefixQuery``).
- **scaled_float** (``modules/mapper-extras/.../ScaledFloatFieldMapper.java``):
  ``long`` storage of ``Math.round(value * scaling_factor)``; queries and
  aggs see the decoded (quantized) double.
- **token_count** (``modules/mapper-extras/.../TokenCountFieldMapper.java``):
  index-time analyzed-token count stored as an integer doc value.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


# ------------------------------------------------------------ range fields

def range_relation_mask(lo: np.ndarray, hi: np.ndarray,
                        qlo: float, qhi: float,
                        relation: str = "intersects") -> np.ndarray:
    """Boolean mask for a range-field query (RangeType.relationQuery):

    - ``intersects`` (default): field range overlaps the query range
    - ``within``: field range lies entirely inside the query range
    - ``contains``: field range entirely covers the query range

    Bounds are inclusive on both sides (the reference's default
    include_lower/include_upper)."""
    if relation == "intersects":
        return (lo <= qhi) & (hi >= qlo)
    if relation == "within":
        return (lo >= qlo) & (hi <= qhi)
    if relation == "contains":
        return (lo <= qlo) & (hi >= qhi)
    raise ValueError(f"unknown relation: {relation}")


def range_field_filter(ds: Dataset, lo_col: str, hi_col: str,
                       qlo: float, qhi: float,
                       relation: str = "intersects") -> Dataset:
    """Filter rows by a range-field query over [lo_col, hi_col]."""

    def filt(t: pa.Table) -> pa.Table:
        lo = t.column(lo_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        hi = t.column(hi_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        return t.filter(pa.array(range_relation_mask(lo, hi, qlo, qhi,
                                                     relation)))

    return ds.map_batches(filt, batch_format="pyarrow")


def ip_range_field_filter(ds: Dataset, lo_col: str, hi_col: str,
                          q_cidr: str,
                          relation: str = "intersects") -> Dataset:
    """ip_range FIELD type (RangeType.IP): rows whose [lo_col, hi_col]
    IPv4 range relates to the query CIDR block — the ip twin of the
    numeric range-field relations, compared in uint32 space."""
    qlo, qhi = cidr_bounds(q_cidr)

    def filt(t: pa.Table) -> pa.Table:
        lo = ipv4_to_uint32(t.column(lo_col)).astype(np.float64)
        hi = ipv4_to_uint32(t.column(hi_col)).astype(np.float64)
        return t.filter(pa.array(range_relation_mask(
            lo, hi, float(qlo), float(qhi), relation)))

    return ds.map_batches(filt, batch_format="pyarrow")


# --------------------------------------------------------------- ip fields

def ipv4_to_uint32(col: pa.ChunkedArray) -> np.ndarray:
    """Dotted-quad strings -> uint32 keys, fully vectorized (Arrow split +
    one flatten; no per-string Python)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(col, ".")
    flat = pc.cast(parts.flatten(), pa.int64()).to_numpy(
        zero_copy_only=False).reshape(-1, 4)
    return ((flat[:, 0].astype(np.uint32) << 24)
            | (flat[:, 1].astype(np.uint32) << 16)
            | (flat[:, 2].astype(np.uint32) << 8)
            | flat[:, 3].astype(np.uint32))


def cidr_bounds(cidr: str) -> Tuple[int, int]:
    """'a.b.c.d/nn' -> inclusive [lo, hi] uint32 bounds
    (InetAddressPoint.newPrefixQuery's covered range)."""
    addr, _, bits = cidr.partition("/")
    bits = int(bits) if bits else 32
    a, b, c, d = (int(x) for x in addr.split("."))
    base = (a << 24) | (b << 16) | (c << 8) | d
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
    lo = base & mask
    return lo, lo | (0xFFFFFFFF >> bits if bits else 0xFFFFFFFF)


def ip_term_filter(ds: Dataset, field: str, value: str) -> Dataset:
    """Term query on an ip field: exact address, or every address under a
    CIDR mask when ``value`` contains '/' (IpFieldMapper.termQuery)."""
    lo, hi = cidr_bounds(value)

    def filt(t: pa.Table) -> pa.Table:
        keys = ipv4_to_uint32(t.column(field))
        return t.filter(pa.array((keys >= lo) & (keys <= hi)))

    return ds.map_batches(filt, batch_format="pyarrow")


# ------------------------------------------------------------ scaled_float

def scaled_float_encode(values: np.ndarray, scaling_factor: float
                        ) -> np.ndarray:
    """double -> stored long: Math.round(value * factor) (Java semantics:
    floor(x + 0.5), so .5 rounds toward +inf — NOT banker's rounding)."""
    return np.floor(np.asarray(values, np.float64) * scaling_factor
                    + 0.5).astype(np.int64)


def scaled_float_decode(stored: np.ndarray, scaling_factor: float
                        ) -> np.ndarray:
    return stored.astype(np.float64) / scaling_factor


def scaled_float_column(ds: Dataset, col: str, scaling_factor: float,
                        out_col: Optional[str] = None) -> Dataset:
    """Round-trip a double column through scaled_float storage — downstream
    queries/aggs see the quantized values the reference would."""
    out_col = out_col or col

    def quantize(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        q = scaled_float_decode(scaled_float_encode(v, scaling_factor),
                                scaling_factor)
        idx = t.column_names.index(out_col) if out_col in t.column_names \
            else None
        arr = pa.array(q, pa.float64())
        if idx is None:
            return t.append_column(out_col, arr)
        return t.set_column(idx, out_col, arr)

    return ds.map_batches(quantize, batch_format="pyarrow")


# -------------------------------------------------------------- _size

def size_column(ds: Dataset, source_cols: Sequence[str],
                out_col: str = "_size") -> Dataset:
    """mapper-size plugin (`_size` metadata field, SizeFieldMapper): the
    UTF-8 byte length of the doc's source, indexed as a queryable long.
    Source here = the JSON-ish concatenation of the listed columns'
    string renderings (the reference measures the raw _source bytes)."""

    def add(t: pa.Table) -> pa.Table:
        total = np.zeros(t.num_rows, np.int64)
        for c in source_cols:
            col = pc.cast(t.column(c), pa.string())
            total += pc.fill_null(pc.binary_length(
                pc.cast(col, pa.binary())), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
        return t.append_column(out_col, pa.array(total))

    return ds.map_batches(add, batch_format="pyarrow")


# ----------------------------------------------------------- half_float

def half_float_column(ds: Dataset, col: str,
                      out_col: Optional[str] = None) -> Dataset:
    """half_float (NumberType.HALF_FLOAT): doubles round-trip through
    IEEE-754 binary16 storage — queries and aggs see the quantized
    values the reference's HalfFloatPoint would (±65504 clamps to ±inf,
    subnormals flush per the format)."""
    out_col = out_col or col

    def quantize(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        q = np.asarray(v, np.float64).astype(np.float16).astype(np.float64)
        arr = pa.array(q, pa.float64())
        if out_col in t.column_names:
            return t.set_column(t.column_names.index(out_col), out_col, arr)
        return t.append_column(out_col, arr)

    return ds.map_batches(quantize, batch_format="pyarrow")


# --------------------------------------------------------- unsigned_long

_U64_FLIP = np.uint64(1 << 63)


def unsigned_long_encode(values: np.ndarray) -> np.ndarray:
    """uint64 -> sortable int64 doc value. The reference
    (NumberFieldMapper.NumberType.UNSIGNED_LONG, sandbox->core in 2.x)
    stores unsigned longs as a SHIFTED signed long so Lucene's int64 point
    tree and doc-value sort order still work: flipping the top bit maps
    [0, 2^64) monotonically onto [INT64_MIN, INT64_MAX]."""
    u = np.asarray(values).astype(np.uint64)
    return (u ^ _U64_FLIP).view(np.int64)


def unsigned_long_decode(stored: np.ndarray) -> np.ndarray:
    return np.asarray(stored, np.int64).view(np.uint64) ^ _U64_FLIP


def unsigned_long_range_mask(u: np.ndarray, gte=None, gt=None,
                             lte=None, lt=None) -> np.ndarray:
    """Range compare in unsigned space (bounds may exceed int64 max)."""
    u = np.asarray(u).astype(np.uint64)
    m = np.ones(u.size, bool)
    if gte is not None:
        m &= u >= np.uint64(gte)
    if gt is not None:
        m &= u > np.uint64(gt)
    if lte is not None:
        m &= u <= np.uint64(lte)
    if lt is not None:
        m &= u < np.uint64(lt)
    return m


def unsigned_long_range_filter(ds: Dataset, col: str, gte=None, gt=None,
                               lte=None, lt=None) -> Dataset:
    """RangeQueryBuilder over an unsigned_long column: the stored form is
    the shifted long, the compare happens in uint64 space — values above
    int64 max order and filter correctly."""

    def filt(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        # round-trip through storage so the filter sees exactly the doc
        # values a segment would hold
        u = unsigned_long_decode(unsigned_long_encode(v))
        return t.filter(pa.array(unsigned_long_range_mask(
            u, gte=gte, gt=gt, lte=lte, lt=lt)))

    return ds.map_batches(filt, batch_format="pyarrow")


# ---------------------------------------------------------- wildcard field

def wildcard_pattern_to_regex(pattern: str) -> str:
    """``*``/``?`` wildcard -> anchored regex (WildcardQuery semantics on a
    whole keyword value)."""
    import re as _re
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^(?:" + "".join(out) + ")$"


def wildcard_field_docs(s, field: str, pattern: str):
    """wildcard FIELD query (server/index/mapper/WildcardFieldMapper.java):
    match whole keyword values against a ``*``/``?`` pattern. The reference
    accelerates with an ngram sub-index; here each segment's doc values are
    scanned with ONE vectorized Arrow RE2 match per segment — same
    complexity class on a column scan, no per-row Python."""
    import numpy as np
    rx = wildcard_pattern_to_regex(pattern)
    parts = []
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        vals = s.doc_values(seg.seg_id, field)
        arr = pa.array(vals, pa.string())
        mask = pc.match_substring_regex(arr, rx).to_numpy(
            zero_copy_only=False)
        mask = np.asarray(mask, dtype=bool)
        if mask.any():
            parts.append(np.flatnonzero(mask).astype(np.int64)
                         + s.doc_base(seg.seg_id))
    import numpy as _np
    return _np.concatenate(parts) if parts else _np.empty(0, _np.int64)


# ------------------------------------------------------------- token_count

def token_count_column(ds: Dataset, text_col: str, analyzer: str = "default",
                       out_col: str = "token_count") -> Dataset:
    """Analyzed-token count per doc as an integer column
    (TokenCountFieldMapper with enable_position_increments=false: the plain
    token count). Tokenization is batched through analyze_batch."""
    from .analysis.analyzer import analyze_batch

    def count(t: pa.Table) -> pa.Table:
        at = analyze_batch(t, text_column=text_col, analyzer=analyzer)
        toks = at.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        return t.append_column(out_col, pa.array(n.astype(np.int64)))

    return ds.map_batches(count, batch_format="pyarrow")


# --------------------------------------------------------- match_only_text

def match_only_text_query(s, text: str):
    """match_only_text (server/index/mapper/MatchOnlyTextFieldMapper.java,
    IndicesModule.java:164-176 — the log-use-case text type): indexed with
    index_options=DOCS, no norms, no positions. Scoring consequences in
    BM25Similarity: tf is constant 1 and the omitted norm makes the length
    factor 1, so each matched term contributes

        boost * idf * (k1+1) * 1 / (1 + k1)  ==  boost * idf

    i.e. the doc score is Σ idf over the matched query terms. Phrase
    queries on this type re-analyze _source (the engine's existing
    text-verify fallback IS that path — Searcher._match_phrase_textverify).

    Runs over the regular index (a superset: freqs/norms present but
    IGNORED, matching the reference where the same query on both types
    differs only by these constants). Returns (sorted docids, scores) with
    the engine's (score desc, docid asc)-comparable float64 scores."""
    from .search.bm25 import bm25_idf

    terms = list(dict.fromkeys(s.analyzer.tokens(text)))
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    stats = s.term_stats(terms)
    live = [t for t in terms if stats[t][0] > 0]
    docs = np.sort(s.bool_docs(should=live)) if live else \
        np.empty(0, np.int64)
    scores = np.zeros(docs.size, np.float64)
    for t in live:
        d = s.term_docs(t)
        pos = np.searchsorted(docs, d)
        scores[pos] += float(bm25_idf(stats[t][0], s.N, np.float64))
    return docs, scores


# -------------------------------------------------------- constant_keyword

def constant_keyword_filter(ds: Dataset, mapping_value: str, query_value,
                            query_kind: str = "term") -> Dataset:
    """constant_keyword (ConstantKeywordFieldMapper): every doc of the
    index carries the SAME mapping-declared value, so queries resolve
    against the MAPPING without touching data: a matching term/wildcard
    rewrites to match_all, anything else to match_none. term + wildcard
    kinds (the query rewrites ConstantKeywordFieldType implements)."""
    if query_kind == "term":
        hit = query_value == mapping_value
    elif query_kind == "wildcard":
        import re as _re
        hit = _re.fullmatch(wildcard_pattern_to_regex(str(query_value))
                            .strip("^$"), mapping_value) is not None
    else:
        raise ValueError(f"unsupported query kind: {query_kind}")
    if hit:
        return ds  # match_all rewrite: zero data read
    return ds.filter(lambda _row: False)


# ------------------------------------------------------------- flat_object

def normalized_term_docs(s, field: str, value,
                         filters=("lowercase",)) -> np.ndarray:
    """keyword ``normalizer`` (server/index/analysis/AnalysisRegistry —
    normalizers run char/token filters WITHOUT tokenization over keyword
    values at index and query time): a term query under a normalizer
    compares normalize(doc value) == normalize(query value).

    ``filters``: names of non-parameterized token filters (or filter
    callables). Vectorized per segment: only the segment's UNIQUE values
    are normalized (cardinality-bounded), then mapped back through the
    inverse index."""
    from .analysis.token_filters import TOKEN_FILTERS

    chain = [f if callable(f) else TOKEN_FILTERS[f] for f in filters]

    def norm_one(x: str) -> str:
        ts, ps = [x], [0]
        for f in chain:
            ts, ps = f(ts, ps)
        return ts[0] if ts else ""

    q = norm_one(str(value))
    out = []
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        vals = s.doc_values(seg.seg_id, field)
        uniq, inv = np.unique(vals.astype(str), return_inverse=True)
        normed = np.asarray([norm_one(u) for u in uniq], dtype=object)
        m = (normed == q)[inv]
        if m.any():
            out.append(np.flatnonzero(m) + s.doc_base(seg.seg_id))
    return np.concatenate(out) if out else np.empty(0, np.int64)


def flat_object_paths(t: pa.Table, json_col: str) -> pa.Table:
    """Flatten a JSON-object column into (row index, path, leaf-value)
    rows — FlatObjectFieldMapper's index shape: every leaf under the field
    is searchable by its dotted path WITHOUT explicit mapping; all leaf
    values are indexed as KEYWORD strings (the reference's contract)."""
    import json as _json

    idx, paths, vals = [], [], []

    def walk(prefix: str, obj, i: int) -> None:
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(f"{prefix}.{k}" if prefix else k, v, i)
        elif isinstance(obj, list):
            for v in obj:  # arrays index each element under the same path
                walk(prefix, v, i)
        elif obj is not None:
            idx.append(i)
            paths.append(prefix)
            # keyword semantics: JSON scalars stringify (json.dumps-style
            # for bools to match the reference's lowercase true/false)
            vals.append(_json.dumps(obj) if isinstance(obj, bool)
                        else str(obj))

    for i, raw in enumerate(t.column(json_col).to_pylist()):
        if not raw:
            continue
        try:
            walk("", _json.loads(raw) if isinstance(raw, str) else raw, i)
        except (ValueError, TypeError):
            continue
    return pa.table({"_row": pa.array(idx, pa.int64()),
                     "path": pa.array(paths, pa.string()),
                     "value": pa.array(vals, pa.string())})


def flat_object_term_filter(ds: Dataset, json_col: str, path: str,
                            value: str) -> Dataset:
    """flat_object term query: rows whose JSON object has ``value`` at the
    dotted leaf ``path`` (FlatObjectFieldType.termQuery over the
    path=value keyword pairs). Map-only: each batch flattens and filters
    in place — at scale the flattened (path, value) table is written once
    at ingest and this becomes a plain keyword filter."""

    def filt(t: pa.Table) -> pa.Table:
        flat = flat_object_paths(t, json_col)
        m = pc.and_(pc.equal(flat.column("path"), pa.scalar(path)),
                    pc.equal(flat.column("value"), pa.scalar(str(value))))
        rows = np.unique(flat.filter(m).column("_row")
                         .to_numpy(zero_copy_only=False))
        return t.take(pa.array(rows))

    return ds.map_batches(filt, batch_format="pyarrow")


# ------------------------------------------------------------- alias fields

# Leaf query kinds whose body is {field_name: spec} — the positions where
# an alias key must be renamed to its concrete path.
_LEAF_FIELD_QUERIES = frozenset({
    "term", "terms", "match", "match_phrase", "match_phrase_prefix",
    "match_bool_prefix", "prefix", "wildcard", "regexp", "fuzzy", "range",
    "terms_set", "intervals", "span_term", "knn",
    "geo_distance", "geo_bounding_box", "geo_shape", "geo_polygon",
})


def validate_field_aliases(aliases: dict) -> None:
    """FieldAliasMapper.validate (server/index/mapper/
    FieldAliasMapper.java:108-125): an alias cannot refer to itself, and
    its path must be a CONCRETE field — alias chains are invalid."""
    for name, path in aliases.items():
        if path == name:
            raise ValueError(
                f"Invalid [path] value [{path}] for field alias [{name}]: "
                "an alias cannot refer to itself.")
        if path in aliases:
            raise ValueError(
                f"Invalid [path] value [{path}] for field alias [{name}]: "
                "an alias cannot refer to another alias.")


def resolve_field_aliases(body, aliases: dict):
    """Rewrite a search request body, replacing `alias` field names with
    their concrete ``path`` everywhere the reference resolves them at
    search time: leaf queries, sort, aggregations, collapse, suggest,
    highlight fields, docvalue_fields / fields — but NOT ``_source``
    filtering, which operates on the original document
    (reference: server/index/mapper/FieldAliasMapper.java:44-52; search-
    time resolution happens in MappedFieldType lookup via
    MapperService.fieldType, so the engine never sees the alias name).

    Pure function: returns a deep-rewritten copy; ``body`` is untouched.
    """
    validate_field_aliases(aliases)

    def sub(f):
        # field names may carry a ^boost suffix (multi_match fields)
        if not isinstance(f, str):
            return f
        base, sep, boost = f.partition("^")
        return aliases.get(base, base) + sep + boost

    def walk(node, parent_key=None):
        if isinstance(node, list):
            if parent_key in ("fields", "docvalue_fields", "_source"):
                if parent_key == "_source":   # source filtering: no aliases
                    return list(node)
                return [sub(x) if isinstance(x, str)
                        else walk(x, parent_key) for x in node]
            if parent_key == "sort":
                return [sub(x) if isinstance(x, str)
                        else walk(x, "sort_item") for x in node]
            return [walk(x, parent_key) for x in node]
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k in _LEAF_FIELD_QUERIES and isinstance(v, dict):
                # same kind name can be an agg ({"terms": {"field": ...}});
                # rename alias KEYS and resolve field-valued options
                out[k] = {
                    sub(fk) if fk in aliases else fk:
                    (sub(fv) if fk in ("field",
                                       "minimum_should_match_field")
                     and isinstance(fv, str) else walk(fv, k))
                    for fk, fv in v.items()}
            elif k == "field" and isinstance(v, str):
                out[k] = sub(v)
            elif k in ("fields", "docvalue_fields") and isinstance(v, dict):
                # highlight fields: {field_name: per-field options}
                out[k] = {sub(fk): walk(fv, k) for fk, fv in v.items()}
            elif k == "sort" and isinstance(v, (list, str)):
                out[k] = walk(v, "sort") if isinstance(v, list) else sub(v)
            elif parent_key == "sort_item" and k in aliases:
                out[sub(k)] = walk(v, parent_key)
            elif k == "_source":
                out[k] = v  # untouched (no alias resolution in source)
            else:
                out[k] = walk(v, k)
        return out

    return walk(body)
