"""Property tests for the norm quantization + varbyte/block postings codec."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from opensearch_ray.index.norms import (
    byte4_to_int, decode_norm_byte, encode_norms, int_to_byte4, NORM_LENGTH_TABLE,
)
from opensearch_ray.index.postings import (
    BLOCK_SIZE, decode_postings, encode_postings, vb_decode, vb_encode,
)


def test_norm_table_strictly_increasing():
    assert (np.diff(NORM_LENGTH_TABLE) > 0).all()


def test_norm_free_values_exact():
    for i in range(24):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_norm_roundtrip_properties():
    for i in list(range(0, 3000)) + [10**4, 10**6, 2**31 - 1]:
        b = int_to_byte4(i)
        assert 0 <= b <= 255
        back = byte4_to_int(b)
        assert back <= i
        # idempotent on decoded values
        assert int_to_byte4(back) == b


def test_vectorized_norm_encode_matches_scalar():
    xs = np.concatenate([np.arange(0, 70000), np.array([10**6, 10**8])])
    enc = encode_norms(xs)
    scal = np.array([int_to_byte4(int(x)) for x in xs], dtype=np.uint8)
    assert (enc == scal).all()
    assert (decode_norm_byte(enc) == np.array([byte4_to_int(int(b)) for b in enc])).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**34), max_size=300))
def test_varbyte_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(v)).tolist() == vals


def test_varbyte_offset_count():
    v = np.arange(1000, dtype=np.uint64) * 3
    buf = vb_encode(v)
    assert (vb_decode(buf, count=10) == v[:10]).all()


def test_encode_postings_blocks():
    rng = np.random.default_rng(7)
    docids = np.sort(rng.choice(100000, size=1000, replace=False))
    tfs = rng.integers(1, 50, size=1000)
    norms = rng.integers(0, 256, size=100000).astype(np.uint8)
    row = encode_postings(docids, tfs, norms)
    assert int(row["df"]) == 1000
    d, t = decode_postings(row["docs_enc"], row["tfs_enc"], 1000)
    assert (d == docids).all()
    assert (t == tfs).all()
    n_blocks = (1000 + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(row["skip_docs"]) == n_blocks
    assert row["skip_docs"][-1] == docids[-1]
    # block-max metadata correct
    for bi in range(n_blocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, 1000)
        assert row["block_max_tf"][bi] == tfs[lo:hi].max()
        assert row["block_min_norm"][bi] == norms[docids[lo:hi]].min()


def test_segment_chunk_split():
    """Terms with df > MAX_DOCS_PER_CHUNK split into multiple rows that decode
    back to the full posting list."""
    from opensearch_ray.index import segment as seg_mod
    from opensearch_ray.index.segment import build_segment_table

    old = seg_mod.MAX_DOCS_PER_CHUNK
    seg_mod.MAX_DOCS_PER_CHUNK = 64
    try:
        n = 200
        tbl = pa.table({
            "conv_id": [f"c{i:04d}" for i in range(n)],
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "text": ["common word here"] * n,
        })
        postings, docstore, meta = build_segment_table(tbl)
        rows = [r for r in postings.to_pylist() if r["term"] == "common"]
        assert len(rows) == (200 + 63) // 64
        alldocs = []
        for r in sorted(rows, key=lambda r: r["chunk"]):
            d, t = decode_postings(r["docs_enc"], r["tfs_enc"], r["df"])
            alldocs.extend(d.tolist())
            assert (t == 1).all()
        assert alldocs == list(range(n))
    finally:
        seg_mod.MAX_DOCS_PER_CHUNK = old


def test_snapshot_restore_roundtrip(built_index, tmp_path):
    """Snapshot -> restore -> identical search results; second snapshot is
    fully incremental (0 new blobs); delete GCs only unreferenced blobs.
    Ref: repositories/blobstore/BlobStoreRepository.java semantics."""
    from opensearch_ray.index.snapshot import (create_snapshot,
                                               delete_snapshot,
                                               list_snapshots,
                                               restore_snapshot)
    from opensearch_ray.search import Searcher
    repo = str(tmp_path / "repo")
    st = create_snapshot(built_index.index_dir, repo, "snap1")
    assert st["files"] > 0 and st["new_blobs"] == st["files"]
    # incremental: same index again -> nothing uploaded
    st2 = create_snapshot(built_index.index_dir, repo, "snap2")
    assert st2["new_blobs"] == 0
    assert list_snapshots(repo) == ["snap1", "snap2"]
    # restore and compare search output exactly
    target = str(tmp_path / "restored")
    m = restore_snapshot(repo, "snap1", target)
    assert m.total_docs > 0
    s0 = Searcher(built_index.index_dir)
    s1 = Searcher(target)
    import numpy as np
    q = " ".join(s0.analyzer.tokens(
        s0.fetch([0], columns=[s0.manifest.text_col])
        .column(s0.manifest.text_col)[0].as_py())[:2])
    h0 = [(h.docid, h.score) for h in s0.search(q, k=10)]
    h1 = [(h.docid, h.score) for h in s1.search(q, k=10)]
    assert h0 == h1
    # restore refuses to clobber an existing index
    import pytest as _pytest
    with _pytest.raises(FileExistsError):
        restore_snapshot(repo, "snap2", target)
    # delete: snap1's blobs survive via snap2; after both, repo is empty
    delete_snapshot(repo, "snap1")
    assert restore_snapshot(repo, "snap2",
                            str(tmp_path / "r2")).total_docs == m.total_docs
    r = delete_snapshot(repo, "snap2")
    assert r["blobs_removed"] > 0
    import os
    left = [f for _, _, fs in os.walk(os.path.join(repo, "blobs"))
            for f in fs]
    assert left == []


def test_snapshot_duplicate_content_files(tmp_path):
    """Identical-content index files must not race on the shared blob path:
    one copy per distinct sha, every rel recorded, restore intact."""
    from opensearch_ray.index.snapshot import (create_snapshot,
                                               restore_snapshot)
    idx = tmp_path / "idx"
    idx.mkdir()
    payload = b"x" * 4096
    for i in range(16):
        (idx / f"seg_{i:02d}.bin").write_bytes(payload)
    (idx / "meta.json").write_text("{}")
    repo = str(tmp_path / "repo")
    st = create_snapshot(str(idx), repo, "s1", max_workers=8)
    assert st["files"] == 17
    assert st["new_blobs"] == 2  # payload blob + meta blob
    target = tmp_path / "restored"
    try:
        restore_snapshot(repo, "s1", str(target))
    except (KeyError, FileNotFoundError):
        pass  # synthetic dir is not a real index; file copies are the point
    for i in range(16):
        assert (target / f"seg_{i:02d}.bin").read_bytes() == payload
