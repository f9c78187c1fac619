"""Inverted-index build: postings codec, norms, segments, manifest, merge."""

from .norms import int_to_byte4, byte4_to_int, encode_norms, decode_norm_byte, NORM_LENGTH_TABLE
from .postings import vb_encode, vb_decode, encode_postings, decode_postings, BLOCK_SIZE
from .segment import SegmentBuilder, build_segment_table, SEGMENT_SCHEMA
from .build import build_index, IndexManifest, load_manifest

__all__ = [
    "int_to_byte4", "byte4_to_int", "encode_norms", "decode_norm_byte", "NORM_LENGTH_TABLE",
    "vb_encode", "vb_decode", "encode_postings", "decode_postings", "BLOCK_SIZE",
    "SegmentBuilder", "build_segment_table", "SEGMENT_SCHEMA",
    "build_index", "IndexManifest", "load_manifest",
]
