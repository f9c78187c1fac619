"""Field-length norms with Lucene's lossy 1-byte quantization.

BM25 needs each doc's field length (token count after stop removal,
``discount_overlaps=true`` per
/root/reference/server/src/main/java/org/opensearch/index/similarity/SimilarityProviders.java:279).
Lucene stores it as ONE byte via ``SmallFloat#intToByte4`` (a 4-bit-mantissa
float-like code; public Lucene 9 knowledge — the reference delegates through
``LegacyBM25Similarity``, see server/index/similarity/SimilarityService.java:37,86-102).
Score-identical BM25 requires reproducing this quantization exactly:
``dl_used = byte4_to_int(int_to_byte4(dl))``.

Scheme (Lucene SmallFloat): values 0..23 are exact ("free" values); larger
values are encoded with a 3-bit mantissa + implicit leading bit + shift,
i.e. progressively coarser buckets. MAX_INT4 = longToInt4(2^31-1) = 231, so
NUM_FREE_VALUES = 255-231 = 24.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only non-negative")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit MSB
    encoded |= (shift + 1) << 3    # 0 reserved for subnormal
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """SmallFloat.intToByte4: lossy-encode a non-negative int to 0..255."""
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """SmallFloat.byte4ToInt."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


#: decoded length for every possible norm byte (Lucene's LENGTH_TABLE).
NORM_LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

# Vectorized encode: int_to_byte4 is monotone non-decreasing, and
# byte4_to_int(int_to_byte4(x)) <= x < byte4_to_int(int_to_byte4(x)+1),
# so encode = searchsorted over the decode table.
_ENCODE_BOUNDARIES = NORM_LENGTH_TABLE  # strictly increasing


def encode_norms(lengths: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array -> uint8 norm bytes."""
    lengths = np.asarray(lengths, dtype=np.int64)
    idx = np.searchsorted(_ENCODE_BOUNDARIES, lengths, side="right") - 1
    return idx.astype(np.uint8)


def decode_norm_byte(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt: norm byte -> quantized doc length."""
    return NORM_LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]
