"""End-to-end index build pipeline (the batch analogue of ``POST /_bulk``).

Reference trace re-derived (SURVEY.md §3.1): REST bulk -> route to shards ->
parse/analyze -> IndexWriter buffer -> segment flush -> background merge.
Our Ray-Data-first shape:

1. **Fragment plan** (driver): enumerate input parquet fragments; each becomes
   one segment work item. Doc-id bases are NOT pre-counted — segments use
   local ids and bases are assigned afterwards from per-segment counts in
   seg_id order, so the build is a single pass over the data.
2. **Segment build** (task pool): ``from_items(fragments) ->
   map_batches(build_fragment, batch_size=1)`` — stateless Ray tasks on warm
   workers (an actor pool would pay a fresh process + import per actor for a
   single wave of work). Atomic write + existence check = per-partition
   checkpoint/resume (the batch analogue of translog recovery,
   Translog.java:1168-1213 / Checkpoint.java:64-88).
3. **Global stats** (small shuffle): groupby(term).sum(df, ttf) over segment
   term dictionaries only (vocab-sized, NOT postings-sized) — the equivalent of
   the DFS phase (DfsPhase.java:55-107) making scores partition-count-invariant.
4. **Merge** (the groupby-term shuffle): co-locate each term's per-segment
   posting chunks into hash(term)-addressed bucket files. Postings keep
   segment-local doc ids + seg_id, so merge is pure data movement (no
   re-encode); **hot terms** (global df >= hot_df_threshold, the Zipfian head)
   are SALTED across buckets by (term, seg_id, chunk) so no single bucket
   inherits a multi-TB posting list (the analogue of routing_partition_size,
   OperationRouting.java:461).

At 100 TB the only all-to-all moves are (3) vocab-sized stats and (4) the
compressed postings (~¼ of input bytes); raw text is never shuffled.

The DEFAULT build (single_pass=True) fuses (2)-(4) into ONE streaming
pipeline: builder tasks emit their postings rows directly into the bucket
shuffle (no re-read), salting is decided per segment from local df, and the
bucket writers emit per-bucket term-stats shards (readers aggregate the
salted terms' partial sums). See _build_single_pass. The explicit
three-phase path remains for build_index_from_dataset and force_merge.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from opensearch_ray.arrowutil import nometa

from .segment import SegmentBuilder

DEFAULT_NUM_BUCKETS = 32
DEFAULT_HOT_DF = 1_000_000  # global df above which a term's chunks are salted


@dataclass
class SegmentInfo:
    seg_id: int
    path: str
    doc_count: int
    sum_dl: int
    doc_base: int
    vocab: int = 0
    #: local docid order == manifest.index_sort order inside this segment.
    #: Always true for builder-written segments (build_segment_table sorts);
    #: a force-merged segment keeps it only if the boundary check passed
    #: (sources were contiguous in sort order). Only consulted when
    #: manifest.index_sort is non-empty, so the True default is safe for
    #: manifests written before the field existed (they load index_sort=[]).
    index_sorted: bool = True


@dataclass
class IndexManifest:
    index_dir: str
    segments: List[SegmentInfo]
    total_docs: int
    sum_dl: int
    analyzer: str = "default"
    text_col: str = "text"
    num_buckets: int = DEFAULT_NUM_BUCKETS
    hot_terms: List[str] = field(default_factory=list)
    merged: bool = False
    #: hot term -> sorted bucket ids its salted chunks landed in (query-time
    #: lookup avoids probing every bucket for the Zipfian head)
    hot_buckets: dict = field(default_factory=dict)
    #: token positions stored (DOCS_AND_FREQS_AND_POSITIONS parity) — enables
    #: index-native phrase queries at ~+30-50% postings size
    has_positions: bool = False
    #: build inputs fingerprint: hot_df_threshold + {path: [size, mtime_ns]}
    #: — consulted by the completed-build short-circuit so a rerun with a
    #: different salting layout or modified input files rebuilds
    build_params: dict = field(default_factory=dict)
    #: index sorting (IndexSortConfig / index.sort.field): the sort_cols the
    #: builder applied inside every segment (restricted to columns present
    #: in the corpus). Enables sorted-query early termination
    #: (QueryPhase.canEarlyTerminate). Empty = no early-termination contract.
    index_sort: List[str] = field(default_factory=list)
    #: indexing-throughput metrics (north-rule lineage: wall seconds,
    #: turns/sec, built vs resumed segment counts) — informational, not
    #: part of the resume fingerprint
    metrics: dict = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return self.sum_dl / self.total_docs if self.total_docs else 0.0

    def doc_base(self, seg_id: int) -> int:
        return self._bases[seg_id]

    def __post_init__(self):
        self._bases = {s.seg_id: s.doc_base for s in self.segments}

    def save(self) -> None:
        p = os.path.join(self.index_dir, "manifest.json")
        with open(p + ".tmp", "w") as f:
            json.dump(
                {
                    "segments": [vars(s) for s in self.segments],
                    "total_docs": self.total_docs,
                    "sum_dl": self.sum_dl,
                    "analyzer": self.analyzer,
                    "text_col": self.text_col,
                    "num_buckets": self.num_buckets,
                    "hot_terms": self.hot_terms,
                    "merged": self.merged,
                    "hot_buckets": self.hot_buckets,
                    "has_positions": self.has_positions,
                    "build_params": self.build_params,
                    "index_sort": self.index_sort,
                    "metrics": self.metrics,
                },
                f,
            )
        os.replace(p + ".tmp", p)


def load_manifest(index_dir: str) -> IndexManifest:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        d = json.load(f)
    return IndexManifest(
        index_dir=index_dir,
        segments=[SegmentInfo(**s) for s in d["segments"]],
        total_docs=d["total_docs"],
        sum_dl=d["sum_dl"],
        analyzer=d["analyzer"],
        text_col=d["text_col"],
        num_buckets=d["num_buckets"],
        hot_terms=d["hot_terms"],
        merged=d["merged"],
        hot_buckets=d.get("hot_buckets", {}),
        has_positions=d.get("has_positions", False),
        build_params=d.get("build_params", {}),
        metrics=d.get("metrics", {}),
        index_sort=d.get("index_sort", []),
    )


def _stable_hash(terms: Sequence[str]) -> np.ndarray:
    """Process-stable uint64 hash of strings (pandas siphash, fixed key)."""
    return pd.util.hash_array(np.asarray(terms, dtype=object))


def list_input_files(input_path) -> List[str]:
    if isinstance(input_path, (list, tuple)):
        return sorted(str(p) for p in input_path)
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    return [input_path]


def build_index(
    input_path,
    index_dir: str,
    analyzer: str = "default",
    text_col: str = "text",
    sort_cols: Sequence[str] = ("conv_id", "turn_idx"),
    columns: Optional[List[str]] = None,
    concurrency: Optional[int] = None,
    num_buckets: Optional[int] = None,
    hot_df_threshold: int = DEFAULT_HOT_DF,
    merge: bool = True,
    materialize_postings: bool = True,
    index_positions: bool = False,
    single_pass: bool = True,
) -> IndexManifest:
    """Build (or resume) an index over parquet transcript fragments.

    One segment per input file; file order (sorted paths) defines global doc
    order, matching a corpus laid out sorted by (conv_id, turn_idx) across
    files — the stable-ordering invariant. Within a file, rows are sorted by
    ``sort_cols`` by the builder regardless.

    ``single_pass=True`` (default) fuses segment build + term stats + the
    bucket merge into one streaming pipeline (_build_single_pass);
    ``single_pass=False`` keeps the explicit three-phase layout (also used by
    build_index_from_dataset and force_merge via _finalize_index).
    """
    files = list_input_files(input_path)
    if not files:
        raise ValueError(f"no parquet files under {input_path!r}")
    if isinstance(text_col, tuple):
        text_col = list(text_col)  # match the manifest's JSON round-trip
    # index sorting contract (IndexSortConfig): the builder sorts each
    # segment by the sort_cols PRESENT in the corpus; record them so sorted
    # queries can early-terminate (QueryPhase.canEarlyTerminate)
    index_sort = [c for c in (sort_cols or [])
                  if c in pq.read_schema(files[0]).names]
    if num_buckets is None:
        # derive B from the corpus, not a constant: postings are ~¼ of input
        # bytes, target ≤ ~128 MB of postings per bucket file so merge
        # parallelism and per-task memory track corpus size (a fixed B=32
        # would pin both at 100×)
        total_bytes = sum(os.path.getsize(f) for f in files
                          if os.path.exists(f))
        num_buckets = int(min(65536, max(DEFAULT_NUM_BUCKETS,
                                         total_bytes // (512 << 20) + 1)))
    os.makedirs(os.path.join(index_dir, "segments"), exist_ok=True)

    manifest_args = dict(
        analyzer=analyzer if isinstance(analyzer, str)
        else getattr(analyzer, "name", "custom"),
        text_col=text_col,
    )
    if single_pass and merge:
        return _build_single_pass(manifest_args, files, index_dir, analyzer,
                                  text_col, sort_cols, columns, num_buckets,
                                  hot_df_threshold, index_positions,
                                  index_sort)

    items = [{"path": p, "seg_id": i} for i, p in enumerate(files)]
    # Fragment descriptors are a few BYTES each, but the real work behind one
    # is reading+indexing a whole file. Ray Data bundles blocks smaller than
    # target_min_block_size into one task, which would serialize the build —
    # drop the floor so every fragment is its own task.
    ctx = ray.data.DataContext.get_current()
    prev_min = ctx.target_min_block_size
    ctx.target_min_block_size = 1
    frag_ds = ray.data.from_items(items)
    # Plain-function stage => stateless Ray TASKS on the prestarted worker
    # pool. An actor pool here costs one fresh process + import per actor
    # (~seconds each), which dominates wall time when fragments are built in
    # a single wave; tasks reuse warm workers. The analyzer is module-level
    # state, already one-time per worker process.
    builder = SegmentBuilder(
        index_dir=index_dir, analyzer=analyzer, text_col=text_col,
        sort_cols=sort_cols, columns=columns, index_positions=index_positions,
    )

    def build_fragment(batch: pa.Table) -> pa.Table:
        return builder(batch)

    seg_rows = (
        frag_ds.map_batches(
            build_fragment,
            batch_size=1,
            batch_format="pyarrow",
            num_cpus=1,
        )
        .take_all()  # one row per segment — small
    )
    ctx.target_min_block_size = prev_min
    seg_rows.sort(key=lambda r: r["seg_id"])
    base = 0
    segments = []
    for r in seg_rows:
        segments.append(
            SegmentInfo(
                seg_id=int(r["seg_id"]),
                path=r["path"],
                doc_count=int(r["doc_count"]),
                sum_dl=int(r["sum_dl"]),
                doc_base=base,
                vocab=int(r["vocab"]),
            )
        )
        base += int(r["doc_count"])

    manifest = IndexManifest(
        index_dir=index_dir,
        segments=segments,
        total_docs=base,
        sum_dl=sum(s.sum_dl for s in segments),
        analyzer=analyzer if isinstance(analyzer, str) else getattr(analyzer, "name", "custom"),
        text_col=text_col,
        num_buckets=num_buckets,
        has_positions=index_positions,
        index_sort=index_sort,
    )

    return _finalize_index(manifest, hot_df_threshold, merge, materialize_postings)


def _finalize_index(manifest: IndexManifest, hot_df_threshold: int,
                    merge: bool, materialize_postings: bool) -> IndexManifest:
    """Shared tail of every build mode: term stats (+hot detection), the
    groupby-term merge shuffle, manifest persistence.

    One read of the (compressed, vocab+postings-sized) segment postings feeds
    BOTH the stats groupby and the merge shuffle. materialize() pins it in the
    object store (spills under pressure); at extreme scale pass
    materialize_postings=False to re-read from storage instead. When stats
    take the coordinator-side path (small vocab), merge is the postings' only
    consumer and pinning would be pure overhead."""
    postings_ds = _segment_postings_ds(manifest)
    if materialize_postings and sum(s.vocab for s in manifest.segments) > 2_000_000:
        postings_ds = postings_ds.materialize()
    manifest.hot_terms = _build_term_stats(manifest, hot_df_threshold, postings_ds)
    if merge:
        manifest.hot_buckets = _merge_segments(manifest, postings_ds)
        manifest.merged = True
    manifest.save()
    return manifest


def build_index_from_dataset(
    ds,
    index_dir: str,
    partition_key: str = "conv_id",
    num_partitions: Optional[int] = None,
    analyzer: str = "default",
    text_col: str = "text",
    sort_cols: Sequence[str] = ("conv_id", "turn_idx"),
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    hot_df_threshold: int = DEFAULT_HOT_DF,
    merge: bool = True,
) -> IndexManifest:
    """General build mode for inputs NOT laid out as sorted files: route rows
    to P hash partitions on ``partition_key`` (the shard-routing analogue,
    OperationRouting.generateShardId = murmur3(_id) mod shards,
    OperationRouting.java:449-476), then one segment per partition via
    groupby(partition).map_groups. Doc order = (partition, *sort_cols) —
    data-derived and deterministic, never execution-order-derived."""
    from .segment import build_segment_table, write_segment

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    P = num_partitions or max(8, n_cpus)
    os.makedirs(os.path.join(index_dir, "segments"), exist_ok=True)

    def route(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(partition_key).to_pylist(), dtype=object)
        part = (pd.util.hash_array(k) % np.uint64(P)).astype(np.int32)
        return nometa(t.append_column("_partition", pa.array(part)))

    def build_partition(g: pa.Table) -> pa.Table:
        seg_id = int(g.column("_partition")[0].as_py())
        g = g.drop_columns(["_partition"])
        seg_dir = os.path.join(index_dir, "segments", f"seg-{seg_id:05d}")
        if os.path.exists(os.path.join(seg_dir, "meta.json")):
            meta = json.load(open(os.path.join(seg_dir, "meta.json")))
        else:
            postings, docstore, meta = build_segment_table(
                g, text_col=text_col, analyzer=analyzer, sort_cols=sort_cols)
            write_segment(seg_dir, postings, docstore, meta)
        return pa.table({
            "seg_id": pa.array([seg_id], pa.int32()),
            "doc_count": pa.array([meta["doc_count"]], pa.int64()),
            "sum_dl": pa.array([meta["sum_dl"]], pa.int64()),
            "vocab": pa.array([meta["vocab"]], pa.int64()),
        })

    rows = (ds.map_batches(route, batch_format="pyarrow")
            .groupby("_partition")
            .map_groups(build_partition, batch_format="pyarrow")
            .take_all())
    rows.sort(key=lambda r: r["seg_id"])
    base = 0
    segments = []
    for r in rows:
        segments.append(SegmentInfo(
            seg_id=int(r["seg_id"]), path=f"partition:{r['seg_id']}",
            doc_count=int(r["doc_count"]), sum_dl=int(r["sum_dl"]),
            doc_base=base, vocab=int(r["vocab"])))
        base += int(r["doc_count"])
    manifest = IndexManifest(
        index_dir=index_dir, segments=segments, total_docs=base,
        sum_dl=sum(x.sum_dl for x in segments),
        analyzer=analyzer if isinstance(analyzer, str) else getattr(analyzer, "name", "custom"),
        text_col=text_col, num_buckets=num_buckets,
        index_sort=[c for c in (sort_cols or [])
                    if c in (ds.schema().names or [])],
        # routed layout: seg_id == hash(partition_key) % P — recorded so a
        # search with `routing=` can shrink the shard set to the owner
        # (OperationRouting.generateShardId + the ?routing search param)
        build_params={"routing": {"partition_key": partition_key,
                                  "num_partitions": int(P)}})
    return _finalize_index(manifest, hot_df_threshold, merge, True)




def _build_single_pass(manifest_args, files, index_dir, analyzer, text_col,
                       sort_cols, columns, num_buckets, hot_df_threshold,
                       index_positions, index_sort=()):
    import time as _time
    _t_start = _time.perf_counter()
    """ONE streaming pipeline: fragment -> segment build (emits its postings
    rows downstream instead of being re-read) -> bucket assignment with
    LOCALLY-decided salting -> groupby(bucket) -> bucket write + per-bucket
    term-stats shard. Removes the separate stats and merge jobs (their fixed
    cost dominated small-corpus scaling), and the postings bytes flow through
    the object store exactly once.

    Local salting: a segment salts a term's chunks when its OWN df for the
    term >= hot_df_threshold / n_segments (the Zipfian head is hot in every
    segment, so local detection finds it without a global pre-pass). A term
    may be salted by some segments and not others: queries probe
    hot_buckets[t] UNION {hash(t) % B}, which covers both layouts.
    Term stats become per-bucket shards; salted terms carry partial sums
    across shards and readers aggregate (Searcher.term_stats sums)."""
    # completed-build short-circuit: if a finished manifest matches this
    # build's inputs and every bucket file it references exists, the rerun is
    # a no-op (the whole-index resume level above per-segment resume)
    man_path = os.path.join(index_dir, "manifest.json")
    fingerprint = {
        "hot_df_threshold": int(hot_df_threshold),
        "inputs": {p: [int(st.st_size), int(st.st_mtime_ns)]
                   for p in files for st in (os.stat(p),)},
    }
    if os.path.exists(man_path):
        try:
            prev = load_manifest(index_dir)
            # the manifest is written LAST (atomic rename), so merged=True
            # proves every bucket/stats file it references landed. The
            # build_params fingerprint guards against a rerun with a changed
            # salting threshold or modified input file content at the same
            # paths silently "resuming" a stale index.
            same = (prev.merged
                    and prev.analyzer == manifest_args["analyzer"]
                    and prev.text_col == text_col
                    and prev.num_buckets == num_buckets
                    and prev.has_positions == index_positions
                    and [s.path for s in prev.segments] == list(files)
                    and prev.build_params == fingerprint)
            if same:
                return prev
        except Exception:
            pass  # unreadable manifest -> rebuild

    B = num_buckets
    n_seg = max(len(files), 1)
    local_thresh = max(1, hot_df_threshold // n_seg)
    builder = SegmentBuilder(
        index_dir=index_dir, analyzer=analyzer, text_col=text_col,
        sort_cols=sort_cols, columns=columns, index_positions=index_positions,
    )

    def build_and_emit(batch: pa.Table) -> pa.Table:
        row = batch.to_pylist()[0]
        seg_id = int(row["seg_id"])
        seg_dir = os.path.join(index_dir, "segments", f"seg-{seg_id:05d}")
        post_path = os.path.join(seg_dir, "postings.parquet")
        # the builder is resume-aware: it reuses a finished segment only when
        # the input-file fingerprint still matches, else rebuilds atomically
        builder(batch)
        t = pq.read_table(post_path)
        n = t.num_rows
        t = t.append_column("seg_id", pa.array(np.full(n, seg_id, dtype=np.int32)))
        terms = t.column("term").to_pylist()
        h = _stable_hash(terms)
        bucket = (h % np.uint64(B)).astype(np.int64)
        dfs = t.column("df").to_numpy(zero_copy_only=False)
        salted = dfs >= local_thresh
        if salted.any():
            chunk = t.column("chunk").to_numpy(zero_copy_only=False).astype(np.uint64)
            # python-int multiply + mask = the same 64-bit wraparound without
            # numpy's scalar-overflow RuntimeWarning
            seg_mix = np.uint64((seg_id * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            alt = ((h ^ seg_mix ^ (chunk * np.uint64(0xC2B2AE3D27D4EB4F)))
                   % np.uint64(B)).astype(np.int64)
            bucket = np.where(salted, alt, bucket)
        t = t.append_column("bucket", pa.array(bucket.astype(np.int32)))
        return nometa(t.append_column("salted", pa.array(salted)))

    merged_dir = os.path.join(index_dir, "merged")
    stats_dir = os.path.join(index_dir, "term_stats")
    os.makedirs(merged_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group.column("bucket")[0].as_py())
        salted_terms = sorted(set(
            group.filter(group.column("salted")).column("term").to_pylist()))
        body = group.drop_columns(["bucket", "salted"]).sort_by(
            [("term", "ascending"), ("seg_id", "ascending"), ("chunk", "ascending")])
        path = os.path.join(merged_dir, f"bucket-{b:05d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(body, tmp, compression="zstd", row_group_size=2048)
        os.replace(tmp, path)
        # per-bucket term-stats shard (partial sums for salted terms)
        st = (body.select(["term", "df", "ttf"]).group_by(["term"])
              .aggregate([("df", "sum"), ("ttf", "sum")])
              .rename_columns(["term", "df", "ttf"]).sort_by("term"))
        spath = os.path.join(stats_dir, f"stats-{b:05d}.parquet")
        stmp = spath + f".tmp-{os.getpid()}"
        # small row groups: per-row-group term min/max statistics let
        # prefix/range vocab reads prune to a handful of row groups
        pq.write_table(st, stmp, row_group_size=4096)
        os.replace(stmp, spath)
        return pa.table({
            "bucket": pa.array([b], pa.int32()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "hot_present": pa.array([salted_terms], pa.list_(pa.string())),
        })

    # clear stale stats layout from a previous non-single-pass build
    for f in os.listdir(stats_dir):
        os.remove(os.path.join(stats_dir, f))

    ctx = ray.data.DataContext.get_current()
    prev_min = ctx.target_min_block_size
    ctx.target_min_block_size = 1
    items = [{"path": p, "seg_id": i} for i, p in enumerate(files)]
    rows = (ray.data.from_items(items)
            .map_batches(build_and_emit, batch_size=1, batch_format="pyarrow",
                         num_cpus=1)
            .repartition(16, shuffle=False)
            .groupby("bucket")
            .map_groups(write_bucket, batch_format="pyarrow")
            .take_all())
    ctx.target_min_block_size = prev_min

    hot_buckets: dict = {}
    for r in rows:
        for t in r["hot_present"]:
            hot_buckets.setdefault(t, []).append(int(r["bucket"]))
    hot_buckets = {t: sorted(bs) for t, bs in hot_buckets.items()}

    if not os.listdir(stats_dir):
        # corpus with zero index terms (e.g. all-empty docs): write an empty
        # but SCHEMA'D stats file so readers' filtered scans still bind
        pq.write_table(
            pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "ttf": pa.array([], pa.int64())}),
            os.path.join(stats_dir, "stats-empty.parquet"))

    # segment metas (written by the builders; tiny local reads)
    segments = []
    base = 0
    n_resumed = 0
    for i, pth in enumerate(files):
        meta = json.load(open(os.path.join(index_dir, "segments",
                                           f"seg-{i:05d}", "meta.json")))
        n_resumed += int(bool(meta.get("resumed")))
        segments.append(SegmentInfo(
            seg_id=i, path=pth, doc_count=int(meta["doc_count"]),
            sum_dl=int(meta["sum_dl"]), doc_base=base,
            vocab=int(meta["vocab"])))
        base += int(meta["doc_count"])

    manifest = IndexManifest(
        index_dir=index_dir, segments=segments, total_docs=base,
        sum_dl=sum(x.sum_dl for x in segments),
        num_buckets=num_buckets,
        hot_terms=sorted(hot_buckets), merged=True,
        hot_buckets=hot_buckets, has_positions=index_positions,
        build_params=fingerprint, index_sort=list(index_sort),
        **manifest_args)
    wall = _time.perf_counter() - _t_start
    manifest.metrics = {
        "build_wall_s": round(wall, 3),
        "turns_per_sec": round(base / wall, 1) if wall > 0 else 0.0,
        "segments_built": len(files) - n_resumed,
        "segments_resumed": n_resumed,
    }
    manifest.save()
    return manifest


def _segment_postings_ds(manifest: IndexManifest, columns: Optional[List[str]] = None):
    """Dataset over all segments' postings rows, with a seg_id column."""
    seg_items = [
        {"seg_id": s.seg_id,
         "file": os.path.join(manifest.index_dir, "segments", f"seg-{s.seg_id:05d}", "postings.parquet")}
        for s in manifest.segments
    ]

    def read_one(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            t = pq.read_table(row["file"], columns=columns)
            t = t.append_column("seg_id", pa.array(np.full(t.num_rows, row["seg_id"], dtype=np.int32)))
            tables.append(t)
        return pa.concat_tables(tables)

    return ray.data.from_items(seg_items).map_batches(
        read_one, batch_size=1, batch_format="pyarrow"
    )


def _build_term_stats(manifest: IndexManifest, hot_df_threshold: int,
                      postings_ds=None) -> List[str]:
    """groupby(term).sum(df, ttf) over segment term dicts -> term_stats
    parquet (Ray's sort-based groupby emits key-sorted output, so rows are
    term-sorted for row-group pruning); returns the hot-term list."""
    from ray.data.aggregate import Sum

    out_dir = os.path.join(manifest.index_dir, "term_stats")
    os.makedirs(out_dir, exist_ok=True)
    total_rows = sum(s.vocab for s in manifest.segments)
    if total_rows <= 2_000_000:
        # coordinator-side reduce: the per-segment term dicts fit comfortably
        # in driver memory (the reference's batched coordinator reduce,
        # QueryPhaseResultConsumer.java:118-132); a distributed shuffle here
        # would be pure fixed overhead
        from concurrent.futures import ThreadPoolExecutor

        def read_one(s):
            return pq.read_table(
                os.path.join(manifest.index_dir, "segments",
                             f"seg-{s.seg_id:05d}", "postings.parquet"),
                columns=["term", "df", "ttf"])

        with ThreadPoolExecutor(max_workers=16) as ex:
            tables = list(ex.map(read_one, manifest.segments))
        merged = (pa.concat_tables(tables)
                  .group_by(["term"])
                  .aggregate([("df", "sum"), ("ttf", "sum")])
                  .rename_columns(["term", "df", "ttf"])
                  .sort_by("term"))
        for f in os.listdir(out_dir):
            os.remove(os.path.join(out_dir, f))
        pq.write_table(merged, os.path.join(out_dir, "term_stats.parquet"),
                       row_group_size=4096)
    else:
        ds = (postings_ds.select_columns(["term", "df", "ttf"])
              if postings_ds is not None
              else _segment_postings_ds(manifest, columns=["term", "df", "ttf"]))
        stats = ds.groupby("term").aggregate(
            Sum("df", alias_name="df"), Sum("ttf", alias_name="ttf"))
        stats.write_parquet(out_dir, mode="overwrite")

    # hot terms: small driver-side filter over the (vocab-sized) stats table
    dset = pq.ParquetDataset(out_dir)
    t = dset.read(columns=["term", "df"])
    mask = pc.greater_equal(t.column("df"), pa.scalar(hot_df_threshold, type=pa.int64()))
    return t.filter(mask).column("term").to_pylist()


def _make_bucket_writer(merged_dir: str, hot_terms: set):
    """map_groups writer: one term-hash bucket -> one sorted parquet file.
    Returns (bucket, rows, hot terms present) so the driver can record the
    hot-term -> bucket map without a second scan."""

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group.column("bucket")[0].as_py())
        group = group.drop_columns(["bucket"]).sort_by(
            [("term", "ascending"), ("seg_id", "ascending"), ("chunk", "ascending")]
        )
        path = os.path.join(merged_dir, f"bucket-{b:05d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(group, tmp, compression="zstd", row_group_size=2048)
        os.replace(tmp, path)
        present = sorted(hot_terms
                         & set(pc.unique(group.column("term")).to_pylist()))
        return pa.table({"bucket": pa.array([b], type=pa.int32()),
                         "rows": pa.array([group.num_rows], type=pa.int64()),
                         "hot_present": pa.array([present],
                                                 type=pa.list_(pa.string()))})

    return write_bucket


def _merge_segments(manifest: IndexManifest, postings_ds=None) -> dict:
    """The groupby(term) merge shuffle with hot-term salting (SURVEY §7.2-5).
    Returns the hot-term -> bucket-ids map."""
    os.makedirs(os.path.join(manifest.index_dir, "merged"), exist_ok=True)
    B = manifest.num_buckets
    hot = set(manifest.hot_terms)
    hot_ref = ray.put(hot)

    def assign_bucket(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        h = _stable_hash(terms)
        bucket = (h % np.uint64(B)).astype(np.int64)
        hotset = ray.get(hot_ref)
        if hotset:
            seg = batch.column("seg_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            chunk = batch.column("chunk").to_numpy(zero_copy_only=False).astype(np.uint64)
            salted = ((h ^ (seg * np.uint64(0x9E3779B97F4A7C15))
                       ^ (chunk * np.uint64(0xC2B2AE3D27D4EB4F))) % np.uint64(B)).astype(np.int64)
            is_hot = np.fromiter((t in hotset for t in terms), dtype=bool, count=len(terms))
            bucket = np.where(is_hot, salted, bucket)
        return nometa(batch.append_column("bucket",
                                          pa.array(bucket.astype(np.int32))))

    ds = postings_ds if postings_ds is not None else _segment_postings_ds(manifest)
    rows = (
        ds.map_batches(assign_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_make_bucket_writer(os.path.join(manifest.index_dir, "merged"),
                                        hot),
                    batch_format="pyarrow")
        .take_all()
    )
    hot_buckets: dict = {}
    for r in rows:
        for t in r["hot_present"]:
            hot_buckets.setdefault(t, []).append(int(r["bucket"]))
    return {t: sorted(bs) for t, bs in hot_buckets.items()}
