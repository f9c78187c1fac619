"""Command-line interface: ``python -m opensearch_ray <cmd>``.

Commands (the operational surface a reference user expects):
  build    — build an index over parquet transcripts
  search   — run a query against an index (top-k table, optional explain)
  count    — hit count for a query
  analyze  — tokenize text with a named analyzer (the `_analyze` API)
  stats    — index stats (docs, segments, vocab, sizes — the `_stats` API)
  forcemerge — consolidate segments (the `_forcemerge` API)
  split    — factor-x segment split (`_split`, ResizeType.SPLIT)
  snapshot — create/restore/delete/list on a blob repository
             (the `_snapshot` repository API)
  bench    — shorthand for bench.py's headline run

Owns its Ray session (init/shutdown here only), per the session rules.
"""

from __future__ import annotations

import argparse
import json
import os


def _ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args):
    ray = _ray()
    from .index.build import build_index
    m = build_index(args.input, args.index, analyzer=args.analyzer,
                    text_col=args.text_col, num_buckets=args.buckets,
                    hot_df_threshold=args.hot_df,
                    index_positions=args.positions)
    print(json.dumps({"total_docs": m.total_docs, "segments": len(m.segments),
                      "sum_dl": m.sum_dl, "hot_terms": len(m.hot_terms),
                      "merged": m.merged, "has_positions": m.has_positions}))
    ray.shutdown()


def cmd_search(args):
    from .search import Searcher
    s = Searcher(args.index)
    hits = s.search(args.query, k=args.k, operator=args.operator)
    rows = []
    if hits and args.fetch:
        fetched = {r["_docid"]: r for r in s.fetch([h.docid for h in hits]).to_pylist()}
        text_col = s.manifest.text_col
        for rank, h in enumerate(hits, 1):
            rows.append({"rank": rank, "docid": h.docid,
                         "score": round(h.score, 4),
                         "text": (fetched[h.docid][text_col] or "")[:80]})
    else:
        rows = [{"rank": i + 1, "docid": h.docid, "score": round(h.score, 4)}
                for i, h in enumerate(hits)]
    print(json.dumps(rows, ensure_ascii=False, indent=1))
    if args.explain and hits:
        print(json.dumps(s.explain(args.query, hits[0].docid),
                         ensure_ascii=False, indent=1))


def cmd_dsl(args):
    """Execute a JSON `_search` request body (stdin or --body) — the
    reference's request surface at the command line."""
    import sys
    from .search import Searcher
    from .search.dsl import execute_request
    body = json.loads(args.body if args.body else sys.stdin.read())
    s = Searcher(args.index)
    r = execute_request(s, body, text_field=s.manifest.text_col,
                        id_col="docid")
    out = {"total": r["total"],
           "hits": r["hits"].to_dict(orient="records"),
           "aggregations": r["aggregations"]}
    print(json.dumps(out, ensure_ascii=False, indent=1, default=str))


def cmd_count(args):
    from .search import Searcher
    print(Searcher(args.index).count(args.query, operator=args.operator))


def cmd_analyze(args):
    from .analysis import get_analyzer
    spec = json.loads(args.spec) if args.spec else args.analyzer
    toks, pos = get_analyzer(spec).analyze(args.text)
    print(json.dumps({"tokens": toks, "positions": pos}, ensure_ascii=False))


def cmd_stats(args):
    from .index.build import load_manifest
    m = load_manifest(args.index)

    def du(path):
        total = 0
        for root, _, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    print(json.dumps({
        "total_docs": m.total_docs,
        "sum_dl": m.sum_dl,
        "avgdl": round(m.avgdl, 3),
        "segments": len(m.segments),
        "analyzer": m.analyzer,
        "merged": m.merged,
        "has_positions": m.has_positions,
        "hot_terms": len(m.hot_terms),
        "vocab_per_segment": [s.vocab for s in m.segments[:8]],
        "bytes": {
            "segments": du(os.path.join(m.index_dir, "segments")),
            "merged": du(os.path.join(m.index_dir, "merged"))
            if os.path.exists(os.path.join(m.index_dir, "merged")) else 0,
            "term_stats": du(os.path.join(m.index_dir, "term_stats")),
        },
    }))


def cmd_forcemerge(args):
    ray = _ray()
    from .index.build import load_manifest
    from .index.merge_policy import force_merge
    m = force_merge(load_manifest(args.index),
                    max_segments=args.max_segments)
    print(json.dumps({"segments": len(m.segments),
                      "total_docs": m.total_docs}))
    ray.shutdown()


def cmd_split(args):
    ray = _ray()
    from .index.build import load_manifest
    from .index.merge_policy import split_index
    m = split_index(load_manifest(args.index), factor=args.factor)
    print(json.dumps({"segments": len(m.segments),
                      "total_docs": m.total_docs}))
    ray.shutdown()


def cmd_snapshot(args):
    from .index import snapshot as snap
    if args.action == "create":
        out = snap.create_snapshot(args.index, args.repo, args.name)
    elif args.action == "restore":
        m = snap.restore_snapshot(args.repo, args.name, args.index)
        out = {"restored": args.index, "total_docs": m.total_docs,
               "segments": len(m.segments)}
    elif args.action == "delete":
        out = snap.delete_snapshot(args.repo, args.name)
    else:  # list
        out = {"snapshots": snap.list_snapshots(args.repo)}
    print(json.dumps(out, default=str))


def main(argv=None):
    p = argparse.ArgumentParser(prog="opensearch_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("input")
    b.add_argument("index")
    b.add_argument("--analyzer", default="transcript")
    b.add_argument("--text-col", default="text")
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--hot-df", type=int, default=1_000_000)
    b.add_argument("--positions", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("index")
    s.add_argument("query")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--operator", default="or", choices=["or", "and"])
    s.add_argument("--fetch", action="store_true")
    s.add_argument("--explain", action="store_true")
    s.set_defaults(fn=cmd_search)

    d = sub.add_parser("dsl")
    d.add_argument("index")
    d.add_argument("--body", default=None,
                   help="JSON request body (default: read stdin)")
    d.set_defaults(fn=cmd_dsl)

    c = sub.add_parser("count")
    c.add_argument("index")
    c.add_argument("query")
    c.add_argument("--operator", default="or", choices=["or", "and"])
    c.set_defaults(fn=cmd_count)

    a = sub.add_parser("analyze")
    a.add_argument("text")
    a.add_argument("--analyzer", default="standard")
    a.add_argument("--spec", default=None,
                   help='inline chain JSON: {"tokenizer": ..., '
                        '"char_filter": [...], "filter": [...]}')
    a.set_defaults(fn=cmd_analyze)

    st = sub.add_parser("stats")
    st.add_argument("index")
    st.set_defaults(fn=cmd_stats)

    fm = sub.add_parser("forcemerge")  # the `_forcemerge` API
    fm.add_argument("index")
    fm.add_argument("--max-segments", type=int, default=1)
    fm.set_defaults(fn=cmd_forcemerge)

    sp = sub.add_parser("split")  # `_split` (ResizeType.SPLIT)
    sp.add_argument("index")
    sp.add_argument("--factor", type=int, default=2)
    sp.set_defaults(fn=cmd_split)

    sn = sub.add_parser("snapshot")  # `_snapshot` repository API
    sn.add_argument("action", choices=["create", "restore", "delete",
                                       "list"])
    sn.add_argument("repo")
    sn.add_argument("--index", default=None,
                    help="index dir (source for create, target for restore)")
    sn.add_argument("--name", default="snap-1")
    sn.set_defaults(fn=cmd_snapshot)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
