"""Read-only decoder for Apache DataSketches compact theta sketches (.sk).

Format spec studied from the reference implementation:
  /root/reference/theta/decoder.go:123-416  (v1-v4 dispatch + layouts)
  /root/reference/theta/compact_sketch.go:38-62 (byte offsets, flags)
  /root/reference/theta/bit_packing.go      (v4 MSB-first bit stream)

We use this only to validate our numpy KMV pipeline against the reference's
own cross-language golden vectors (serialization_test_data/); the engine's
persistence is Parquet arrays, not this format.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from sparkdedup.functions.murmur3 import compute_seed_hash

MAX_THETA = (1 << 63) - 1  # reference theta/constants.go:40
THETA_FAMILY_ID = 3

# byte offsets — reference theta/compact_sketch.go:38-52
_PRE_LONGS = 0
_SER_VER = 1
_TYPE = 2
_FLAGS = 5
_SEED_HASH = 6  # u16 index 3 * 2 bytes
# flags — reference theta/compact_sketch.go:56-62
_FLAG_EMPTY = 1 << 2
_FLAG_ORDERED = 1 << 4


@dataclass
class ThetaCompact:
    theta: int
    entries: np.ndarray  # uint64, the retained hashes
    seed_hash: int
    is_empty: bool
    is_ordered: bool

    @property
    def num_retained(self) -> int:
        return len(self.entries)

    def estimate(self) -> float:
        # reference theta/compact_sketch.go:141-147: numRetained / theta
        if self.is_empty:
            return 0.0
        return self.num_retained / (self.theta / float(MAX_THETA))


def _u16(b, off):
    return struct.unpack_from("<H", b, off)[0]


def _u32(b, off):
    return struct.unpack_from("<I", b, off)[0]


def _u64(b, off):
    return struct.unpack_from("<Q", b, off)[0]


def _entries64(b: bytes, off: int, n: int) -> np.ndarray:
    return np.frombuffer(b, dtype="<u8", count=n, offset=off).astype(np.uint64)


def decode_theta(b: bytes, seed: int = 9001) -> ThetaCompact:
    """Decode a compact theta sketch (serial versions 1-4)."""
    if len(b) < 8:
        raise ValueError("sketch too small")
    if b[_TYPE] != THETA_FAMILY_ID:
        raise ValueError(f"not a theta sketch (family {b[_TYPE]})")
    ver = b[_SER_VER]
    if ver == 4:
        return _decode_v4(b, seed)
    if ver == 3:
        return _decode_v3(b, seed)
    if ver == 2:
        return _decode_v2(b, seed)
    if ver == 1:
        return _decode_v1(b, seed)
    raise ValueError(f"unsupported serial version {ver}")


def _check_seed(b: bytes, seed: int) -> int:
    sh = _u16(b, _SEED_HASH)
    expected = compute_seed_hash(seed)
    if sh != expected:
        raise ValueError(f"seed hash mismatch: {sh} != {expected}")
    return sh


def _decode_v3(b: bytes, seed: int) -> ThetaCompact:
    # reference theta/decoder.go:207-280
    sh = _u16(b, _SEED_HASH)
    if b[_FLAGS] & _FLAG_EMPTY:
        return ThetaCompact(MAX_THETA, np.empty(0, np.uint64), sh, True, True)
    _check_seed(b, seed)
    pre_longs = b[_PRE_LONGS]
    theta = MAX_THETA
    if pre_longs > 2:
        theta = _u64(b, 2 * 8)
    if pre_longs == 1:  # single entry
        return ThetaCompact(theta, _entries64(b, 8, 1), sh, False, True)
    n = _u32(b, 2 * 4)
    start = (3 if pre_longs > 2 else 2) * 8
    ordered = bool(b[_FLAGS] & _FLAG_ORDERED)
    return ThetaCompact(theta, _entries64(b, start, n), sh, False, ordered)


def _decode_v2(b: bytes, seed: int) -> ThetaCompact:
    # reference theta/decoder.go:282-369
    pre = b[_PRE_LONGS]
    sh = _check_seed(b, seed)
    if pre == 1:
        return ThetaCompact(MAX_THETA, np.empty(0, np.uint64), sh, True, True)
    if pre == 2:
        n = _u32(b, 8)
        if n == 0:
            return ThetaCompact(MAX_THETA, np.empty(0, np.uint64), sh, True, True)
        return ThetaCompact(MAX_THETA, _entries64(b, 16, n), sh, False, True)
    if pre == 3:
        n = _u32(b, 8)
        theta = _u64(b, 16)
        if n == 0 and theta == MAX_THETA:
            return ThetaCompact(theta, np.empty(0, np.uint64), sh, True, True)
        return ThetaCompact(theta, _entries64(b, 24, n), sh, False, True)
    raise ValueError(f"invalid v2 preamble size {pre}")


def _decode_v1(b: bytes, seed: int) -> ThetaCompact:
    # reference theta/decoder.go:371-408 (no stored seed hash; derive)
    sh = compute_seed_hash(seed)
    n = _u32(b, 8)
    theta = _u64(b, 16)
    if n == 0 and theta == MAX_THETA:
        return ThetaCompact(theta, np.empty(0, np.uint64), sh, True, True)
    return ThetaCompact(theta, _entries64(b, 24, n), sh, False, True)


def _decode_v4(b: bytes, seed: int) -> ThetaCompact:
    # reference theta/decoder.go:148-205; always ordered, non-empty
    sh = _check_seed(b, seed)
    pre_longs = b[_PRE_LONGS]
    has_theta = pre_longs > 1
    theta = _u64(b, 8) if has_theta else MAX_THETA
    n_bytes = b[4]  # compactSketchV4NumEntriesBytesByte
    off = 16 if has_theta else 8
    n = 0
    for i in range(n_bytes):
        n |= b[off + i] << (i * 8)
    off += n_bytes
    entry_bits = b[3]  # compactSketchV4EntryBitsByte
    deltas = _unpack_bits(b, off, entry_bits, n)
    entries = np.cumsum(deltas, dtype=np.uint64)
    return ThetaCompact(theta, entries, sh, False, True)


def _unpack_bits(b: bytes, off: int, bits: int, n: int) -> np.ndarray:
    """MSB-first fixed-width unpack (reference theta/bit_packing.go:64-90)."""
    if n == 0:
        return np.empty(0, np.uint64)
    total_bits = bits * n
    nbytes = (total_bits + 7) // 8
    raw = np.frombuffer(b, dtype=np.uint8, count=nbytes, offset=off)
    bit_arr = np.unpackbits(raw)[: total_bits].reshape(n, bits).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(bits - 1, -1, -1, dtype=np.uint64))
    return (bit_arr * weights).sum(axis=1, dtype=np.uint64)
