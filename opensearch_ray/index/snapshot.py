"""Snapshot / restore repository — the `_snapshot` API analogue.

Reference semantics (server/repositories/blobstore/BlobStoreRepository.java,
snapshots/SnapshotShardsService.java): snapshots are INCREMENTAL at the
file level — a snapshot records the index's file list with checksums and
uploads only blobs the repository doesn't already hold; restore copies the
recorded files back and verifies their checksums; deleting a snapshot
garbage-collects blobs no remaining snapshot references.

Repo layout (content-addressed, like the reference's blob store):

    repo/
      blobs/<sha[:2]>/<sha>     one blob per distinct file content
      snapshots/<name>.json     {"files": {relpath: {"sha", "size"}}, ...}

All repo mutations are atomic (tmp + rename), so a crashed snapshot never
corrupts the repo and a re-run is incremental over what landed. Checksums
and copies run in a thread pool (file I/O bound); on a real deployment the
blob store is object storage and each node uploads the segments it owns —
the per-file independence here is exactly that shape.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional


def _sha256(path: str, bufsize: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(bufsize)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _blob_path(repo_dir: str, sha: str) -> str:
    return os.path.join(repo_dir, "blobs", sha[:2], sha)


def _snap_path(repo_dir: str, name: str) -> str:
    if "/" in name or name.startswith("."):
        raise ValueError(f"bad snapshot name: {name!r}")
    return os.path.join(repo_dir, "snapshots", f"{name}.json")


def _index_files(index_dir: str) -> List[str]:
    out = []
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            if f.endswith(".tmp"):
                continue
            out.append(os.path.relpath(os.path.join(root, f), index_dir))
    return sorted(out)


def create_snapshot(index_dir: str, repo_dir: str, name: str,
                    max_workers: int = 8) -> Dict:
    """Snapshot ``index_dir`` into ``repo_dir`` under ``name``.

    Incremental: blobs already present (from ANY earlier snapshot) are not
    re-copied — the SnapshotShardsService file-reuse behavior. Returns
    {"snapshot", "files", "new_blobs", "bytes", "new_bytes"}."""
    if os.path.exists(_snap_path(repo_dir, name)):
        raise FileExistsError(f"snapshot {name!r} already exists")
    os.makedirs(os.path.join(repo_dir, "blobs"), exist_ok=True)
    os.makedirs(os.path.join(repo_dir, "snapshots"), exist_ok=True)
    rels = _index_files(index_dir)

    def digest(rel: str):
        src = os.path.join(index_dir, rel)
        return rel, _sha256(src), os.path.getsize(src)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        digests = list(ex.map(digest, rels))

    # Deduplicate by sha BEFORE dispatching copies: two index files with
    # identical content must not race on the same blob path (a shared tmp
    # name would let one thread's os.replace steal the other's in-flight
    # file). One copy per distinct sha; tmp names are per-thread unique.
    first_rel_for_sha: Dict[str, str] = {}
    for rel, sha, _size in digests:
        first_rel_for_sha.setdefault(sha, rel)

    def copy_blob(item):
        sha, rel = item
        src = os.path.join(index_dir, rel)
        dst = _blob_path(repo_dir, sha)
        if os.path.exists(dst):
            return sha, False
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + f".tmp.{os.getpid()}.{threading.get_ident()}"
        shutil.copyfile(src, tmp)
        try:
            os.replace(tmp, dst)
        except FileNotFoundError:
            # a concurrent snapshot of the same repo won the replace —
            # the blob is content-addressed, so already-present is success
            if not os.path.exists(dst):
                raise
            return sha, False
        return sha, True

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        copied = dict(ex.map(copy_blob, first_rel_for_sha.items()))
    results = [(rel, sha, size, copied.get(sha, False)
                and first_rel_for_sha[sha] == rel)
               for rel, sha, size in digests]
    files = {rel: {"sha": sha, "size": size}
             for rel, sha, size, _new in results}
    doc = {"name": name, "files": files,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "total_bytes": sum(v["size"] for v in files.values())}
    _atomic_write_json(_snap_path(repo_dir, name), doc)
    return {"snapshot": name, "files": len(files),
            "new_blobs": sum(1 for *_x, new in results if new),
            "bytes": doc["total_bytes"],
            "new_bytes": sum(size for _r, _s, size, new in results if new)}


def list_snapshots(repo_dir: str) -> List[str]:
    d = os.path.join(repo_dir, "snapshots")
    if not os.path.isdir(d):
        return []
    return sorted(f[:-5] for f in os.listdir(d) if f.endswith(".json"))


def _load_snapshot(repo_dir: str, name: str) -> Dict:
    with open(_snap_path(repo_dir, name)) as f:
        return json.load(f)


def restore_snapshot(repo_dir: str, name: str, target_dir: str,
                     max_workers: int = 8, verify: bool = True):
    """Restore ``name`` into ``target_dir`` (must not already be an index);
    every blob's checksum is re-verified on the way out (the reference's
    restore-time Lucene checksum verification). Returns the restored
    IndexManifest."""
    doc = _load_snapshot(repo_dir, name)
    if os.path.exists(os.path.join(target_dir, "manifest.json")):
        raise FileExistsError(f"{target_dir} already holds an index")

    def one(item):
        rel, meta = item
        src = _blob_path(repo_dir, meta["sha"])
        if verify and _sha256(src) != meta["sha"]:
            raise IOError(f"blob corrupt for {rel}: {meta['sha']}")
        dst = os.path.join(target_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)

    items = sorted(doc["files"].items())
    # manifest.json last: a partially-restored dir never looks complete
    rest = [it for it in items if it[0] != "manifest.json"]
    mani = [it for it in items if it[0] == "manifest.json"]
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        list(ex.map(one, rest))
    for it in mani:
        one(it)
    from .build import load_manifest
    return load_manifest(target_dir)


def delete_snapshot(repo_dir: str, name: str) -> Dict:
    """Delete a snapshot and garbage-collect blobs no remaining snapshot
    references (BlobStoreRepository cleanup)."""
    path = _snap_path(repo_dir, name)
    doc = _load_snapshot(repo_dir, name)
    os.remove(path)
    live: set = set()
    for other in list_snapshots(repo_dir):
        live.update(v["sha"]
                    for v in _load_snapshot(repo_dir, other)["files"].values())
    removed = 0
    for meta in doc["files"].values():
        if meta["sha"] not in live:
            bp = _blob_path(repo_dir, meta["sha"])
            if os.path.exists(bp):
                os.remove(bp)
                removed += 1
    return {"deleted": name, "blobs_removed": removed}
