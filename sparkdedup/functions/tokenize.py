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
    starts = np.cumsum(n_tokens) - n_tokens  # doc start offsets in flat array
    # number of shingles per doc: max(n - w + 1, 1 if n > 0 else 0)
    n_shingles = np.where(n_tokens > 0, np.maximum(n_tokens - w + 1, 1), 0)
    # Build index matrix for full-width shingles; short docs get a padded
    # window clamped to their own range (pad by repeating the last token).
    total_sh = int(n_shingles.sum())
    if total_sh == 0:
        return (np.empty(0, U64), np.empty(0, np.int64), n_shingles)
    sh_seg = np.repeat(np.arange(n_docs, dtype=np.int64), n_shingles)
    sh_starts = np.cumsum(n_shingles) - n_shingles
    within = np.arange(total_sh, dtype=np.int64) - sh_starts[sh_seg]
    base = starts[sh_seg] + within               # first token index of shingle
    offs = np.arange(w, dtype=np.int64)[None, :]
    idx = base[:, None] + offs                   # (total_sh, w)
    # clamp inside each doc (affects only docs with < w tokens)
    doc_end = (starts + n_tokens - 1)[sh_seg]
    idx = np.minimum(idx, doc_end[:, None])
    rows = token_hashes[idx]                     # (total_sh, w) uint64
    h1, _ = murmur3_128_int64_rows(rows, seed)
    sh = h1 >> U64(1)                            # theta screening shift
    keep = sh != U64(0)
    return sh[keep], sh_seg[keep], n_shingles
