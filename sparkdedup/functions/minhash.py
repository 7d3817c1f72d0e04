"""128-permutation MinHash over shingle hashes, fully vectorized.

Permutation i is the bijection h -> fmix64(h ^ salt_i), reusing the murmur3
64-bit finalizer (reference internal/murmur3.go:184-192) — a standard
"one-permutation-per-rehash" MinHash. Salts are drawn from a deterministic
RNG seeded with the pipeline seed (9001), so the signature family is fixed
by config exactly like the reference's seed-hash contract
(reference internal/utils.go:116-126 / theta/union.go:120-130).
"""

from __future__ import annotations

import numpy as np

from sparkdedup.functions.murmur3 import fmix64

U64 = np.uint64
_EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)  # minhash value for empty input


def make_salts(num_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation salts (uint64)."""
    rng = np.random.default_rng(seed)
    return rng.integers(1, 1 << 63, size=num_perms, dtype=np.uint64) | U64(1)


def minhash_signature(shingle_hashes: np.ndarray, salts: np.ndarray) -> np.ndarray:
    """Signature for ONE document: min over shingles of fmix64(h ^ salt_i).

    shingle_hashes: (n_shingles,) uint64; returns (num_perms,) uint64.
    """
    if len(shingle_hashes) == 0:
        return np.full(len(salts), _EMPTY_SLOT, dtype=U64)
    h = shingle_hashes.astype(U64, copy=False)
    # (n_perms, n_shingles) broadcast; memory ~ 128 * n_shingles * 8 bytes
    return fmix64(h[None, :] ^ salts[:, None]).min(axis=1)


def minhash_signatures_segmented(
    shingle_hashes: np.ndarray, seg_ids: np.ndarray, n_docs: int, salts: np.ndarray
) -> np.ndarray:
    """Signatures for a BATCH of documents sharing one flat hash array.

    shingle_hashes: (total,) uint64 — all docs' shingle hashes concatenated.
    seg_ids: (total,) int64 — document index per hash (non-decreasing).
    Returns (n_docs, num_perms) uint64. One np.minimum.reduceat per perm:
    no per-document python.
    """
    out = np.full((n_docs, len(salts)), _EMPTY_SLOT, dtype=U64)
    if len(shingle_hashes) == 0:
        return out
    h = shingle_hashes.astype(U64, copy=False)
    # boundaries of each document's segment
    uniq, starts = np.unique(seg_ids, return_index=True)
    for p, salt in enumerate(salts):
        vals = fmix64(h ^ salt)
        out[uniq, p] = np.minimum.reduceat(vals, starts)
    return out
