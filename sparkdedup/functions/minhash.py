"""MinHash signatures via densified one-permutation hashing (OPH).

Instead of k independent permutations (k passes over the data), OPH splits
the 63-bit hash space into `num_perms` equal bins by the hash's top bits
and takes the minimum hash per bin — one pass, and since the signature
stage keeps each document's distinct shingle hashes SORTED, the per-bin
minimum is simply the first element of each (doc, bin) run: no reduction
at all. Empty bins are densified by circular borrowing from the nearest
non-empty bin (rotation densification), which keeps the standard collision
property Pr[sig_a[i] == sig_b[i]] ~= J(A, B).

This matches the reference's one-pass/mergeable design constraint (every
sketch is built in a single stream pass — SURVEY.md §3.1) and keeps the
theta screening semantics: bin minima ARE k-minimum-value order statistics
of the screened murmur3 stream (reference theta/hashtable.go:104-116).

References: Li/Owen/Zhang 2012 (one permutation hashing),
Shrivastava/Li 2014 (densification).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)  # signature value for empty bins


def _bin_shift(num_perms: int) -> int:
    b = int(num_perms).bit_length() - 1
    if (1 << b) != num_perms:
        raise ValueError("num_perms must be a power of two")
    # screened hashes are < 2^63, so the top usable bit is 62
    return 63 - b


def oph_signatures(
    sorted_hashes: np.ndarray, seg_ids: np.ndarray, n_docs: int, num_perms: int
) -> np.ndarray:
    """(n_docs, num_perms) uint64 signatures from a flat array of DISTINCT
    shingle hashes sorted by (seg_id, hash).

    sorted_hashes: uint64, each < 2^63 (theta-screened murmur3 >> 1).
    seg_ids: int64 document index per hash, non-decreasing.
    """
    sig = np.full((n_docs, num_perms), EMPTY_SLOT, dtype=U64)
    total = len(sorted_hashes)
    if total == 0:
        return sig
    h = sorted_hashes.astype(U64, copy=False)
    shift = U64(_bin_shift(num_perms))
    bins = (h >> shift).astype(np.int64)
    # run starts: new (seg, bin) pair; h ascending within seg => first of
    # each run is the bin minimum
    first = np.ones(total, dtype=bool)
    first[1:] = (seg_ids[1:] != seg_ids[:-1]) | (bins[1:] != bins[:-1])
    idx = np.flatnonzero(first)
    sig[seg_ids[idx], bins[idx]] = h[idx]
    return densify(sig)


def densify(sig: np.ndarray) -> np.ndarray:
    """Rotation densification: fill empty bins from the nearest non-empty
    bin to the right (circular), borrowing only ORIGINAL values so the
    scheme is order-independent. Documents with zero shingles stay EMPTY."""
    empty = sig == EMPTY_SLOT
    if not empty.any():
        return sig
    orig = sig.copy()
    num_perms = sig.shape[1]
    rows_any = orig.min(axis=1) != EMPTY_SLOT  # docs with >= 1 value
    for t in range(1, num_perms):
        need = empty & rows_any[:, None]
        if not need.any():
            break
        cand = np.roll(orig, -t, axis=1)
        take = need & (cand != EMPTY_SLOT)
        sig[take] = cand[take]
        empty = empty & ~take
    return sig


def minhash_signature(shingle_hashes: np.ndarray, num_perms: int = 128) -> np.ndarray:
    """Signature for ONE document (hashes need not be pre-sorted)."""
    h = np.unique(shingle_hashes.astype(U64, copy=False))  # sorted distinct
    return oph_signatures(h, np.zeros(len(h), np.int64), 1, num_perms)[0]


def minhash_signatures_segmented(
    shingle_hashes: np.ndarray, seg_ids: np.ndarray, n_docs: int, num_perms: int = 128
) -> np.ndarray:
    """Batch signatures from a flat (seg, hash)-sorted distinct-hash array."""
    return oph_signatures(shingle_hashes, seg_ids, n_docs, num_perms)
