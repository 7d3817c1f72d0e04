"""Signature stage: files -> per-file dedup signatures, one mapInPandas pass.

All math is vectorized numpy over Arrow batches (no per-row python except
C-speed hashlib/regex calls). The stage computes, per file:
  file_id   - murmur3-128(h1, seed 42) of repo\\0path\\0commit (int64)
  sha       - sha256 hex of content (per-row invariant vs source table)
  n_tokens / n_shingles
  kmv       - k=128 minimum values of 5-gram shingle hashes (sorted,
              theta semantics: reference theta/hashtable.go:104-116)
  kmv_theta / kmv_count
  minh      - 128-perm MinHash signature
  simhash   - 64-bit SimHash
  bands     - 16 LSH band hashes (murmur3 over each 8-row slice of minh)

Distribution model: this is the "update" half of the reference's
update/union split (theta/union.go design seam) — each Arrow batch is an
independent partial computation, embarrassingly parallel across executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.functions.minhash import minhash_signatures_segmented
from sparkdedup.functions.murmur3 import murmur3_128_bytes, murmur3_128_int64_rows
from sparkdedup.functions.simhash import simhash_segmented
from sparkdedup.functions.theta import MAX_THETA
from sparkdedup.functions.tokenize import shingle_hashes_batch, token_hashes_batch

U64 = np.uint64

SIGNATURE_SCHEMA = (
    "file_id long, repo string, path string, commit string, lang string, "
    "sha string, n_tokens int, n_shingles int, "
    "kmv array<long>, kmv_theta long, kmv_count int, "
    "minh array<long>, simhash long, bands array<long>, "
    "anchors array<long>, probes array<long>"
)

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _window_minima_flat(h: np.ndarray, w: int) -> np.ndarray:
    """Exact min of every length-w sliding window of h, O(len(h)) via the
    two-pass block prefix/suffix-minimum decomposition (van Herk/Gil-Werman
    — the standard erosion trick): window [i, i+w) spans at most two
    w-blocks, so its min = min(suffix_min within the left block from i,
    prefix_min within the right block up to i+w-1)."""
    T = len(h)
    if T < w:
        return np.empty(0, dtype=h.dtype)
    pad = (-T) % w
    hp = np.concatenate([h, np.full(pad, _U64_MAX, h.dtype)]) if pad else h
    blocks = hp.reshape(-1, w)
    pref = np.minimum.accumulate(blocks, axis=1).ravel()
    suff = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suff[: T - w + 1], pref[w - 1 : T])


def _anchors_and_probes(
    sh: np.ndarray, sh_seg: np.ndarray, n: int, w: int, n_probes: int
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Winnowed containment anchors + probes per doc from the POSITIONAL
    screened shingle stream (pre-dedup/sort).

    anchors(d) = distinct minima of every w-window of doc d's shingle
    sequence; probes(d) = minima of d's first <=n_probes non-overlapping
    w-blocks. MOSS-style guarantee (same argument as winnowed_gram_index
    but on token shingles, so it reuses the signature stage's hash
    stream): if doc A's token stream occurs contiguously inside doc B's,
    every probe of A equals the window minimum B keeps at the occurrence
    offset — perfect candidate recall for containees with >= w shingles.
    Each value in the stream contributes to <= w windows, so the expected
    anchor density is ~2/(w+1) distinct values per position.
    """
    _EMPTY = np.empty(0, dtype=np.int64)
    anchors: list[np.ndarray] = [_EMPTY] * n
    probes: list[np.ndarray] = [_EMPTY] * n
    T = len(sh)
    if T < w:
        return anchors, probes
    winmin = _window_minima_flat(sh, w)
    # contiguous per-doc runs (sh_seg is per-doc contiguous by construction
    # even though the short-doc block makes it non-monotonic globally)
    run_starts = np.r_[0, np.flatnonzero(sh_seg[1:] != sh_seg[:-1]) + 1]
    run_lens = np.diff(np.r_[run_starts, T])
    for rs, rl in zip(run_starts, run_lens):
        if rl < w:
            continue
        d = int(sh_seg[rs])
        wm = winmin[rs : rs + rl - w + 1]
        # adjacent-dedup first (each min value spans ~w consecutive
        # windows), then sort+unique the small remainder
        small = wm[np.r_[True, wm[1:] != wm[:-1]]]
        anchors[d] = np.unique(small).view(np.int64)
        jmax = min(n_probes, (rl - w) // w + 1)
        probes[d] = wm[np.arange(jmax, dtype=np.int64) * w].view(np.int64)
    return anchors, probes


def compute_signatures_pdf(pdf: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """Signature computation for one pandas batch (pure function, testable)."""
    n = len(pdf)
    repo, path, commit = pdf["repo"], pdf["path"], pdf["commit"]
    content = pdf["content"].fillna("")

    keys = [f"{r}\x00{p}\x00{c}".encode("utf-8")
            for r, p, c in zip(repo, path, commit)]
    fid_h1, _ = murmur3_128_bytes(keys, 42)
    file_id = fid_h1.astype(np.int64)

    sha = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in content]

    tok_h, tok_seg, n_tokens = token_hashes_batch(content, cfg.seed)
    sh, sh_seg, _n_sh_raw = shingle_hashes_batch(
        tok_h, tok_seg, n_tokens, cfg.shingle_size, cfg.seed)

    # containment anchors/probes from the POSITIONAL stream (before the
    # dedup sort below destroys position order)
    anchors_col, probes_col = _anchors_and_probes(
        sh, sh_seg, n, cfg.containment_anchor_window,
        cfg.containment_probe_blocks)

    # distinct shingle hashes per doc (KMV is over the distinct set).
    # Group by segment with a stable argsort (seg is nearly sorted), then
    # np.sort each contiguous slice in place — ~9x faster than a global
    # 2-key lexsort at identical output.
    order = np.argsort(sh_seg, kind="stable")
    sh_s, seg_s = sh[order].copy(), sh_seg[order]
    seg_counts = np.bincount(seg_s, minlength=n)
    seg_offs = np.cumsum(seg_counts) - seg_counts
    for d in np.flatnonzero(seg_counts):
        sh_s[seg_offs[d]: seg_offs[d] + seg_counts[d]].sort()
    keep = np.ones(len(sh_s), dtype=bool)
    if len(sh_s):
        keep[1:] = (sh_s[1:] != sh_s[:-1]) | (seg_s[1:] != seg_s[:-1])
    sh_u, seg_u = sh_s[keep], seg_s[keep]

    counts = np.bincount(seg_u, minlength=n)
    k = cfg.kmv_k
    _EMPTY = np.empty(0, dtype=np.int64)
    kmv_col: list[np.ndarray] = [_EMPTY] * n
    theta_col = np.full(n, MAX_THETA, dtype=np.int64)
    kmv_count = np.zeros(n, dtype=np.int64)
    if len(sh_u):
        sh_i64 = sh_u.view(np.int64)  # values < 2^63: same bits, no copy
        starts = np.cumsum(counts) - counts
        # per-doc k smallest: values are sorted within each segment
        # already; cells are numpy slices (Arrow converts ndarray cells
        # directly — no per-value python int boxing)
        for d in np.flatnonzero(counts):
            s, c = starts[d], counts[d]
            if c > k:
                theta_col[d] = sh_i64[s + k]
                kmv_count[d] = k
                kmv_col[d] = sh_i64[s : s + k]
            else:
                kmv_count[d] = c
                kmv_col[d] = sh_i64[s : s + c]

    minh = minhash_signatures_segmented(sh_u, seg_u, n, cfg.num_perms)
    # SimHash over each doc's KMV subset (deterministic sample of the
    # shingle set — near-dups share most of it), 60x less data than the
    # full shingle stream at equal discriminative power for bucket ordering
    if len(sh_u):
        starts_all = np.cumsum(counts) - counts
        within = np.arange(len(sh_u), dtype=np.int64) - starts_all[seg_u]
        kmask = within < k
        sim = simhash_segmented(sh_u[kmask], seg_u[kmask], n)
    else:
        sim = np.zeros(n, dtype=U64)

    # LSH band hashes: murmur3 over each 8-perm slice, salted by band
    # index — ONE fused call over all (doc, band) rows with per-row seeds
    # (16 tiny per-band calls were pure numpy dispatch overhead at the
    # cache-sized Arrow batches the stage actually sees)
    r = cfg.rows_per_band
    band_rows = np.ascontiguousarray(minh).reshape(n * cfg.num_bands, r)
    band_seeds = np.tile(
        np.arange(cfg.seed + 1, cfg.seed + 1 + cfg.num_bands, dtype=U64), n)
    bh1, _ = murmur3_128_int64_rows(band_rows, band_seeds)
    bands = bh1.astype(np.int64).reshape(n, cfg.num_bands)

    return pd.DataFrame({
        "file_id": file_id,
        "repo": repo.to_numpy(),
        "path": path.to_numpy(),
        "commit": commit.to_numpy(),
        "lang": pdf["lang"].to_numpy(),
        "sha": sha,
        "n_tokens": n_tokens.astype(np.int32),
        "n_shingles": counts.astype(np.int32),
        "kmv": kmv_col,
        "kmv_theta": theta_col,
        "kmv_count": kmv_count.astype(np.int32),
        "minh": list(minh.astype(np.int64)),
        "simhash": sim.astype(np.int64),
        "bands": list(bands),
        "anchors": anchors_col,
        "probes": probes_col,
    })


def signature_stage(files: DataFrame, cfg: DedupConfig,
                    num_partitions: int | None = None) -> DataFrame:
    """files(repo, path, commit, lang, content) -> signatures DataFrame.

    Repartitions by content key first so Arrow batches are uniform across
    executors (explicit partition sizing — content length skew would
    otherwise concentrate big files in few tasks).
    """
    df = files.select("repo", "path", "commit", "lang", "content")
    if num_partitions:
        df = df.repartition(num_partitions, F.xxhash64("repo", "path", "commit"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield compute_signatures_pdf(pdf, cfg)

    return df.mapInPandas(run, schema=SIGNATURE_SCHEMA)
