"""Tokenization + n-gram shingling for source code, batch-oriented.

Tokens: identifiers / numbers / operator runs, via one compiled regex over
the whole document. Shingles: w consecutive token hashes hashed together as
an int64[w] murmur3 stream (reference layout internal/murmur3.go:99-124),
then screened like theta updates (h1 >> 1, drop zero —
reference theta/hashtable.go:104-116). Token -> uint64 via murmur3-128 of
its UTF-8 bytes (UpdateBytes semantics, theta/update_sketch.go:377-393);
empty strings are rejected exactly like the reference's UpdateString
(theta/update_sketch.go:353-356).

The whole path is batch-first: unique-token hashing via pandas factorize so
each distinct token is murmur3'd once per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from sparkdedup.functions.murmur3 import murmur3_128_bytes, murmur3_128_int64_rows

U64 = np.uint64

# identifiers, numbers, or single punctuation/operator chars
_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|\d+|[^\sA-Za-z_0-9]")


def tokenize(text: str) -> list[str]:
    """Regex token stream for one document (no empty tokens by construction)."""
    return _TOKEN_RE.findall(text)


def token_hashes_batch(
    texts: pd.Series, seed: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch and hash every token.

    Returns (flat_token_hashes uint64, doc_seg_ids int64, n_tokens_per_doc).
    Distinct tokens are hashed once (factorize), then gathered.
    """
    token_lists = [_TOKEN_RE.findall(t) if isinstance(t, str) else [] for t in texts]
    n_tokens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                           count=len(token_lists))
    total = int(n_tokens.sum())
    if total == 0:
        return (np.empty(0, U64), np.empty(0, np.int64), n_tokens)
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in token_lists:
        flat[pos : pos + len(toks)] = toks
        pos += len(toks)
    codes, uniques = pd.factorize(pd.Series(flat))
    uh1, _ = murmur3_128_bytes([u.encode("utf-8") for u in uniques], seed)
    hashes = uh1[codes]
    seg = np.repeat(np.arange(len(token_lists), dtype=np.int64), n_tokens)
    return hashes, seg, n_tokens


def shingle_hashes_batch(
    token_hashes: np.ndarray, seg_ids: np.ndarray, n_tokens: np.ndarray,
    shingle_size: int, seed: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """w-gram shingle hashes for a batch, theta-screened (h1>>1, nonzero).

    Documents shorter than w tokens contribute one shingle over all their
    tokens (so short files still dedup). Returns (screened shingle hashes,
    seg ids aligned to them, n_shingles per doc BEFORE screening+dedup).
    """
    n_docs = len(n_tokens)
    if len(token_hashes) == 0:
        return (np.empty(0, U64), np.empty(0, np.int64),
                np.zeros(n_docs, np.int64))
    w = shingle_size
    total = len(token_hashes)
    starts = np.cumsum(n_tokens) - n_tokens  # doc start offsets in flat array
    # number of shingles per doc: max(n - w + 1, 1 if n > 0 else 0)
    n_shingles = np.where(n_tokens > 0, np.maximum(n_tokens - w + 1, 1), 0)
    total_sh = int(n_shingles.sum())
    if total_sh == 0:
        return (np.empty(0, U64), np.empty(0, np.int64), n_shingles)

    long_docs = n_tokens >= w
    # Fast path: hash EVERY w-window of the flat token array through a
    # zero-copy strided view (includes doc-boundary-crossing windows, ~w
    # junk rows per boundary), then keep the windows that lie fully inside
    # a doc. Avoids materializing a (total_sh, w) gather.
    out_h: list[np.ndarray] = []
    out_seg: list[np.ndarray] = []
    if total >= w and long_docs.any():
        windows = np.lib.stride_tricks.sliding_window_view(token_hashes, w)
        # chunked hashing: keeps murmur3's elementwise temporaries at ~2MB
        # (cache-resident, allocator-reusable) instead of multi-GB streams
        n_win = len(windows)
        h1_all = np.empty(n_win, dtype=U64)
        CH = 1 << 18
        for s in range(0, n_win, CH):
            e = min(s + CH, n_win)
            h1_all[s:e], _ = murmur3_128_int64_rows(windows[s:e], seed)
        # valid window starts per long doc: starts[d] .. starts[d]+n-w
        n_valid = np.where(long_docs, n_tokens - w + 1, 0)
        vseg = np.repeat(np.arange(n_docs, dtype=np.int64), n_valid)
        vstarts = np.cumsum(n_valid) - n_valid
        offs = np.arange(int(n_valid.sum()), dtype=np.int64) - vstarts[vseg]
        widx = starts[vseg] + offs
        out_h.append(h1_all[widx])
        out_seg.append(vseg)
    # Short docs (< w tokens): one clamped shingle over all their tokens
    # (pad by repeating the last token) so tiny files still dedup.
    short = np.flatnonzero(~long_docs & (n_tokens > 0))
    if len(short):
        rows = np.empty((len(short), w), dtype=U64)
        for j, d in enumerate(short):
            toks = token_hashes[starts[d] : starts[d] + n_tokens[d]]
            rows[j, : len(toks)] = toks
            rows[j, len(toks):] = toks[-1]
        h1s, _ = murmur3_128_int64_rows(rows, seed)
        out_h.append(h1s)
        out_seg.append(short.astype(np.int64))
    h1 = np.concatenate(out_h) if out_h else np.empty(0, U64)
    sh_seg = np.concatenate(out_seg) if out_seg else np.empty(0, np.int64)
    sh = h1 >> U64(1)                            # theta screening shift
    keep = sh != U64(0)
    return sh[keep], sh_seg[keep], n_shingles
