"""Decoder for serialized t-digest (double) sketches.

Wire format studied from the reference (no code copied, Go -> numpy):
  /root/reference/tdigest/double_decoder.go:46-170 —
    [preLongs u8, serVer=1 u8, type=20 u8, k u16, flags u8
     (empty=bit0, single=bit1, reverseMerge=bit2), unused u16];
    single: one f64; multiple: u32 numCentroids + u32 numBuffered,
    min f64, max f64, then numCentroids x (mean f64, weight u64),
    then numBuffered f64 values.

Gate semantics: centroid weights + buffered values reconstruct n
exactly; weighted-centroid quantiles track the known 1..n uniform
distribution within the digest's resolution.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

TDIGEST_TYPE = 20


@dataclass
class TDigestImage:
    k: int
    min_item: float
    max_item: float
    means: np.ndarray    # float64, ascending
    weights: np.ndarray  # uint64
    buffered: np.ndarray  # float64, weight-1 values not yet merged

    @property
    def total_weight(self) -> int:
        return int(self.weights.sum()) + len(self.buffered)

    def quantile(self, q: float) -> float:
        """Simple cumulative-weight quantile over centroids + buffer
        (midpoint convention — adequate for envelope tests)."""
        vals = np.concatenate([self.means, self.buffered])
        wts = np.concatenate([self.weights.astype(np.float64),
                              np.ones(len(self.buffered))])
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts) - wts / 2.0
        target = q * wts.sum()
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(idx, len(vals) - 1)])


def decode_tdigest_double(data: bytes) -> TDigestImage:
    if len(data) < 8:
        raise ValueError("tdigest too short")
    pre, ver, sk_type = data[0], data[1], data[2]
    if sk_type != TDIGEST_TYPE:
        raise ValueError(f"not a tdigest (type {sk_type})")
    if ver != 1:
        raise ValueError(f"unsupported serial version {ver}")
    k = struct.unpack_from("<H", data, 3)[0]
    flags = data[5]
    is_empty = bool(flags & 1)
    is_single = bool(flags & 2)
    if is_empty:
        return TDigestImage(k, np.nan, np.nan, np.empty(0),
                            np.empty(0, np.uint64), np.empty(0))
    if is_single:
        v = struct.unpack_from("<d", data, 8)[0]
        return TDigestImage(k, v, v, np.array([v]),
                            np.ones(1, np.uint64), np.empty(0))
    num_c, num_b = struct.unpack_from("<II", data, 8)
    mn, mx = struct.unpack_from("<dd", data, 16)
    rec = np.dtype([("mean", "<f8"), ("w", "<u8")])
    cents = np.frombuffer(data, dtype=rec, count=num_c, offset=32)
    buf = np.frombuffer(data, dtype="<f8", count=num_b,
                        offset=32 + 16 * num_c)
    return TDigestImage(k, mn, mx, cents["mean"].astype(np.float64),
                        cents["w"].astype(np.uint64),
                        buf.astype(np.float64))
