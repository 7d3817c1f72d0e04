"""Vectorized MurmurHash3 x64 128-bit in numpy, with datasketches semantics.

Behavioral parity target: the reference implementation at
/root/reference/internal/murmur3.go (blockMix128 at :194-204, finalMix128 at
:206-218, byte-array layout HashByteArrMurmur3 at :126-158, int64-slice
layout HashInt64SliceMurmur3 at :99-124, char-slice layout
HashCharSliceMurmur3 at :30-63). All functions here operate on whole numpy
batches (one python-level loop only over 16-byte *blocks*, never over items),
which is what makes them usable inside Arrow-batched pandas UDFs.

Golden vector (reference internal/murmur3_test.go:26-37):
    murmur3_128_bytes(b"The quick brown fox jumps over the lazy dog", seed=0)
      == (0xe34bbc7bbc071b6c, 0x7a433ca9c49a9347)
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_C1 = U64(0x87C37B91114253D5)  # reference internal/murmur3.go:21
_C2 = U64(0x4CF5AD432745937F)  # reference internal/murmur3.go:22
_F1 = U64(0xFF51AFD7ED558CCD)
_F2 = U64(0xC4CEB9FE1A85EC53)
_M5 = U64(5)
_A1 = U64(0x52DCE729)
_A2 = U64(0x38495AB5)

_OLD_ERR = np.seterr(over="ignore")  # uint64 wraparound is the semantics
np.seterr(**_OLD_ERR)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = U64(r)
    return (x << r_) | (x >> U64(64 - r))


def fmix64(h: np.ndarray) -> np.ndarray:
    """The murmur3 64-bit finalizer (reference internal/murmur3.go:184-192).

    A bijection on uint64; also used standalone as our per-permutation
    MinHash re-hash.
    """
    with np.errstate(over="ignore"):
        h = h ^ (h >> U64(33))
        h = h * _F1
        h = h ^ (h >> U64(33))
        h = h * _F2
        h = h ^ (h >> U64(33))
    return h


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    return _rotl(k1 * _C1, 31) * _C2


def _mix_k2(k2: np.ndarray) -> np.ndarray:
    return _rotl(k2 * _C2, 33) * _C1


def _block_mix(h1, h2, k1, k2):
    # reference internal/murmur3.go:194-204
    h1 = h1 ^ _mix_k1(k1)
    h1 = _rotl(h1, 27)
    h1 = h1 + h2
    h1 = h1 * _M5 + _A1
    h2 = h2 ^ _mix_k2(k2)
    h2 = _rotl(h2, 31)
    h2 = h2 + h1
    h2 = h2 * _M5 + _A2
    return h1, h2


def _final_mix(h1, h2, k1, k2, length_bytes):
    # reference internal/murmur3.go:206-218
    h1 = h1 ^ _mix_k1(k1)
    h2 = h2 ^ _mix_k2(k2)
    h1 = h1 ^ length_bytes
    h2 = h2 ^ length_bytes
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def murmur3_128_int64_single(values: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash each element as a one-long stream (HashInt64SliceMurmur3 with
    lengthLongs=1 — reference internal/murmur3.go:99-124). This is exactly
    what theta UpdateInt64 feeds (reference theta/hashtable.go:132-144).

    values: uint64 array (int64 values reinterpreted); returns (h1, h2).
    """
    with np.errstate(over="ignore"):
        v = values.astype(U64, copy=False)
        h1 = np.full(v.shape, U64(seed), dtype=U64)
        h2 = h1.copy()
        return _final_mix(h1, h2, v, np.zeros_like(v), U64(8))


# ---- fused in-place forms of the same mixes (identical math, zero
# temporaries: every op writes into preallocated scratch, which matters in
# the signature hot loop where these arrays are touched ~60 times) --------


def _mix_k_ip(k: np.ndarray, c_in: np.uint64, rot: int, c_out: np.uint64,
              t: np.ndarray, u: np.ndarray) -> np.ndarray:
    """t = rotl(k * c_in, rot) * c_out; k untouched."""
    np.multiply(k, c_in, out=t)
    np.left_shift(t, U64(rot), out=u)
    np.right_shift(t, U64(64 - rot), out=t)
    np.bitwise_or(t, u, out=t)
    np.multiply(t, c_out, out=t)
    return t


def _rotl_ip(h: np.ndarray, rot: int, t: np.ndarray) -> None:
    np.left_shift(h, U64(rot), out=t)
    np.right_shift(h, U64(64 - rot), out=h)
    np.bitwise_or(h, t, out=h)


def _fmix_ip(h: np.ndarray, t: np.ndarray) -> None:
    np.right_shift(h, U64(33), out=t)
    np.bitwise_xor(h, t, out=h)
    np.multiply(h, _F1, out=h)
    np.right_shift(h, U64(33), out=t)
    np.bitwise_xor(h, t, out=h)
    np.multiply(h, _F2, out=h)
    np.right_shift(h, U64(33), out=t)
    np.bitwise_xor(h, t, out=h)


def _block_mix_ip(h1, h2, k1, k2, t, u) -> None:
    np.bitwise_xor(h1, _mix_k_ip(k1, _C1, 31, _C2, t, u), out=h1)
    _rotl_ip(h1, 27, t)
    np.add(h1, h2, out=h1)
    np.multiply(h1, _M5, out=h1)
    np.add(h1, _A1, out=h1)
    np.bitwise_xor(h2, _mix_k_ip(k2, _C2, 33, _C1, t, u), out=h2)
    _rotl_ip(h2, 31, t)
    np.add(h2, h1, out=h2)
    np.multiply(h2, _M5, out=h2)
    np.add(h2, _A2, out=h2)


def murmur3_128_int64_rows(rows: np.ndarray,
                           seed: int | np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Hash each ROW of a (n, m) uint64 matrix as an m-long stream
    (HashInt64SliceMurmur3 — reference internal/murmur3.go:99-124).
    Used for fixed-width shingles (m=5 token hashes) and LSH band rows (m=8).

    seed may be an (n,) array for per-row seeds (the fused band-hash path:
    all 16 bands in one call, each band row salted by its own seed).
    """
    with np.errstate(over="ignore"):
        rows = rows.astype(U64, copy=False)
        n, m = rows.shape
        if isinstance(seed, np.ndarray):
            h1 = seed.astype(U64).copy()
        else:
            h1 = np.full(n, U64(seed), dtype=U64)
        h2 = h1.copy()
        t = np.empty(n, dtype=U64)
        u = np.empty(n, dtype=U64)
        for i in range(m >> 1):
            _block_mix_ip(h1, h2, rows[:, 2 * i], rows[:, 2 * i + 1], t, u)
        # final mix, in place (reference internal/murmur3.go:206-218)
        if m & 1:
            np.bitwise_xor(h1, _mix_k_ip(rows[:, m - 1], _C1, 31, _C2, t, u),
                           out=h1)
        length = U64(m << 3)
        np.bitwise_xor(h1, length, out=h1)
        np.bitwise_xor(h2, length, out=h2)
        np.add(h1, h2, out=h1)
        np.add(h2, h1, out=h2)
        _fmix_ip(h1, t)
        _fmix_ip(h2, t)
        np.add(h1, h2, out=h1)
        np.add(h2, h1, out=h2)
        return h1, h2


def _padded_matrix(data: list[bytes], lengths: np.ndarray, width: int) -> np.ndarray:
    """Zero-padded (n, width) uint8 matrix from a list of byte strings.

    Zero padding reproduces getUint64's partial-read semantics
    (reference internal/murmur3.go:160-167): reading 8 bytes from the padded
    buffer equals assembling `rem` little-endian bytes.
    """
    n = len(data)
    buf = np.zeros(n * width, dtype=np.uint8)
    if n:
        flat = np.frombuffer(b"".join(data), dtype=np.uint8)
        total = int(lengths.sum())
        if total:
            starts = np.cumsum(lengths) - lengths
            within = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
            rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
            buf[rows * width + within] = flat
    return buf.reshape(n, width)


def _hash_bytes_group(data: list[bytes], lengths: np.ndarray, nblocks: int, seed: int):
    """All inputs share the same number of full 16-byte blocks."""
    width = (nblocks + 1) * 16
    mat = _padded_matrix(data, lengths, width)
    u = mat.view("<u8")  # (n, 2*(nblocks+1)) little-endian words
    n = len(data)
    with np.errstate(over="ignore"):
        h1 = np.full(n, U64(seed), dtype=U64)
        h2 = h1.copy()
        for i in range(nblocks):
            h1, h2 = _block_mix(h1, h2, u[:, 2 * i], u[:, 2 * i + 1])
        # tail (zero-padded uniform read == reference partial getUint64)
        k1 = u[:, 2 * nblocks]
        k2 = u[:, 2 * nblocks + 1]
        return _final_mix(h1, h2, k1, k2, lengths.astype(U64))


def murmur3_128_bytes(data: list[bytes], seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch murmur3-128 over variable-length byte strings
    (HashByteArrMurmur3 layout — reference internal/murmur3.go:126-158).

    Inputs are bucketed by block count so each bucket vectorizes fully.
    Returns (h1, h2) uint64 arrays aligned with the input order.
    """
    n = len(data)
    h1_out = np.empty(n, dtype=U64)
    h2_out = np.empty(n, dtype=U64)
    if n == 0:
        return h1_out, h2_out
    lengths = np.fromiter((len(b) for b in data), dtype=np.int64, count=n)
    nblocks = lengths >> 4
    order = np.argsort(nblocks, kind="stable")
    sorted_nb = nblocks[order]
    boundaries = np.flatnonzero(np.diff(sorted_nb)) + 1
    for group in np.split(order, boundaries):
        nb = int(nblocks[group[0]])
        sub = [data[i] for i in group]
        g1, g2 = _hash_bytes_group(sub, lengths[group], nb, seed)
        h1_out[group] = g1
        h2_out[group] = g2
    return h1_out, h2_out


def murmur3_128_bytes_segmented(flat: np.ndarray, starts: np.ndarray,
                                lengths: np.ndarray,
                                seed: int) -> tuple[np.ndarray, np.ndarray]:
    """murmur3-128 of `len(starts)` byte slices of a flat uint8 buffer —
    identical results to murmur3_128_bytes on the materialized slices, but
    with zero Python string/bytes objects (the hot path for tokenizers).

    Buckets by block count like murmur3_128_bytes; each bucket builds its
    zero-padded word matrix by a single fancy-index gather from `flat`.
    """
    n = len(starts)
    h1_out = np.empty(n, dtype=U64)
    h2_out = np.empty(n, dtype=U64)
    if n == 0:
        return h1_out, h2_out
    starts = starts.astype(np.int64, copy=False)
    lengths = lengths.astype(np.int64, copy=False)
    nblocks = lengths >> 4
    order = np.argsort(nblocks, kind="stable")
    sorted_nb = nblocks[order]
    boundaries = np.flatnonzero(np.diff(sorted_nb)) + 1
    for group in np.split(order, boundaries):
        nb = int(nblocks[group[0]])
        g_starts, g_lens = starts[group], lengths[group]
        width = (nb + 1) * 16
        m = len(group)
        buf = np.zeros((m, width), dtype=np.uint8)
        total = int(g_lens.sum())
        if total:
            rows = np.repeat(np.arange(m, dtype=np.int64), g_lens)
            within = (np.arange(total, dtype=np.int64)
                      - np.repeat(np.cumsum(g_lens) - g_lens, g_lens))
            src = g_starts[rows] + within
            buf[rows, within] = flat[src]
        u = buf.view("<u8")
        with np.errstate(over="ignore"):
            h1 = np.full(m, U64(seed), dtype=U64)
            h2 = h1.copy()
            for i in range(nb):
                h1, h2 = _block_mix(h1, h2, u[:, 2 * i], u[:, 2 * i + 1])
            g1, g2 = _final_mix(h1, h2, u[:, 2 * nb], u[:, 2 * nb + 1],
                                g_lens.astype(U64))
        h1_out[group] = g1
        h2_out[group] = g2
    return h1_out, h2_out


def murmur3_128_scalar(data: bytes, seed: int) -> tuple[int, int]:
    """Pure-python scalar reference (independent of the numpy path) used by
    tests to cross-check the vectorized kernel. Same byte-array layout as
    reference internal/murmur3.go:126-158.
    """
    mask = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & mask

    def mixk1(k1):
        k1 = (k1 * 0x87C37B91114253D5) & mask
        k1 = rotl(k1, 31)
        return (k1 * 0x4CF5AD432745937F) & mask

    def mixk2(k2):
        k2 = (k2 * 0x4CF5AD432745937F) & mask
        k2 = rotl(k2, 33)
        return (k2 * 0x87C37B91114253D5) & mask

    def fmix(h):
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & mask
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & mask
        h ^= h >> 33
        return h

    h1 = h2 = seed & mask
    nblocks = len(data) >> 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        h1 = (h1 ^ mixk1(k1)) & mask
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & mask
        h1 = (h1 * 5 + 0x52DCE729) & mask
        h2 = (h2 ^ mixk2(k2)) & mask
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & mask
        h2 = (h2 * 5 + 0x38495AB5) & mask
    tail = data[nblocks * 16 :]
    k1 = int.from_bytes(tail[:8], "little")
    k2 = int.from_bytes(tail[8:16], "little")
    h1 ^= mixk1(k1)
    h2 ^= mixk2(k2)
    h1 = (h1 ^ len(data)) & mask
    h2 = (h2 ^ len(data)) & mask
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    return h1, h2


def murmur3_128_int64_scalar(values: list[int], seed: int) -> tuple[int, int]:
    """Pure-python HashInt64SliceMurmur3 (reference internal/murmur3.go:99-124)."""
    mask = (1 << 64) - 1
    data = b"".join((v & mask).to_bytes(8, "little") for v in values)
    # the int64-slice layout equals the byte layout when all longs are whole,
    # except the tail: a single trailing long goes entirely into k1 — which
    # matches the byte layout too (8 whole bytes -> k1, k2 = 0). Length is
    # bytes in both. So delegate:
    return murmur3_128_scalar(data, seed)


def compute_seed_hash(seed: int) -> int:
    """Reference internal/utils.go:116-126: murmur3 of [seed] with seed 0,
    low 16 bits; used as the cross-sketch compatibility stamp.
    """
    h1, _ = murmur3_128_int64_scalar([seed], 0)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} produces zero seed hash")
    return sh
