"""Decoder + query for serialized reference bloom filters.

Wire format studied from the reference (no code copied, Go -> numpy):
  /root/reference/filters/preamble_utils.go:22-52 —
    [preLongs u8, serVer=1 u8, family=21 u8, flags u8 (empty=0x04),
     numHashes u16, pad u16, seed u64 @8, bitArrayLength(longs) u64 @16,
     numBitsSet u64 @24 (all-ones when dirty), bit array @32].
  Long-item hashing (filters/bloom_filter.go:160-197, the Java-compatible
  org.apache.datasketches.hash.XxHash64.hash(long, seed) special case):
  single-block xxhash64 finalization; h0 = xx(value, seed),
  h1 = xx(value, h0); bit index g_i = ((h0 + i*h1) >> 1) mod capacityBits
  for i = 1..numHashes (filters/bloom_filter.go:199-203).

Purpose: byte-level golden-vector gate for the bloom family — querying
the reference-built filter from numpy must return TRUE for every
inserted item (no false negatives, cross-implementation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

U64 = np.uint64
_P1 = U64(0x9E3779B185EBCA87)
_P2 = U64(0xC2B2AE3D27D4EB4F)
_P3 = U64(0x165667B19E3779F9)
_P4 = U64(0x85EBCA77C2B2AE63)
_P5 = U64(0x27D4EB2F165667C5)

BLOOM_FAMILY = 21
_EMPTY_FLAG = 0x04


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << U64(r)) | (x >> U64(64 - r))


def xxhash64_long(values: np.ndarray, seed) -> np.ndarray:
    """Vectorized Java-compatible XxHash64.hash(long, seed) — the 8-byte
    single-block path (filters/bloom_filter.go:160-187 semantics)."""
    with np.errstate(over="ignore"):
        v = values.astype(U64, copy=False)
        h = (np.asarray(seed, U64) + _P5 + U64(8)) * np.ones_like(v)
        k1 = _rotl(v * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        h ^= h >> U64(33)
        h *= _P2
        h ^= h >> U64(29)
        h *= _P3
        h ^= h >> U64(32)
        return h


@dataclass
class BloomFilterImage:
    num_hashes: int
    seed: int
    capacity_bits: int
    num_bits_set: int  # -1 when serialized dirty
    bits: np.ndarray   # uint64 words
    is_empty: bool

    def query_longs(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership test for int64 items."""
        if self.is_empty or self.capacity_bits == 0:
            return np.zeros(len(values), dtype=bool)
        with np.errstate(over="ignore"):
            h0 = xxhash64_long(values, U64(self.seed))
            h1 = xxhash64_long(values, h0)
            out = np.ones(len(values), dtype=bool)
            cap = U64(self.capacity_bits)
            for i in range(1, self.num_hashes + 1):
                idx = ((h0 + U64(i) * h1) >> U64(1)) % cap
                word = (idx >> U64(6)).astype(np.int64)
                bit = idx & U64(63)
                out &= (self.bits[word] >> bit) & U64(1) != 0
            return out


def decode_bloom_filter(data: bytes) -> BloomFilterImage:
    if len(data) < 24:
        raise ValueError("bloom filter too short")
    pre_longs, ser_ver, family, flags = data[:4]
    if family != BLOOM_FAMILY:
        raise ValueError(f"not a bloom filter (family {family})")
    if ser_ver != 1:
        raise ValueError(f"unsupported serial version {ser_ver}")
    num_hashes = struct.unpack_from("<H", data, 4)[0]
    seed = struct.unpack_from("<Q", data, 8)[0]
    arr_longs = struct.unpack_from("<Q", data, 16)[0]
    if flags & _EMPTY_FLAG:
        return BloomFilterImage(num_hashes, seed, int(arr_longs) * 64, 0,
                                np.zeros(arr_longs, U64), True)
    bits_set = struct.unpack_from("<Q", data, 24)[0]
    bits = np.frombuffer(data, dtype="<u8", count=arr_longs, offset=32)
    dirty = bits_set == 0xFFFFFFFFFFFFFFFF
    return BloomFilterImage(num_hashes, int(seed), int(arr_longs) * 64,
                            -1 if dirty else int(bits_set),
                            bits.astype(U64), False)
