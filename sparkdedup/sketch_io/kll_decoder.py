"""Decoder for serialized KLL quantile sketches (float/double/long items).

Wire format studied from the reference (no code copied, Go -> numpy):
  /root/reference/kll/preamble_utils.go:22-53 — byte layout
    [preInts u8, serVer u8, family u8 (=15 KLL), flags u8, k u16, m u8,
     reserved u8]; single/empty data starts at 8; full preamble adds
    n u64 @8, minK u16 @16, numLevels u8 @18, data @20.
  /root/reference/kll/items_sketch_validate.go:110-160 — levels array:
    numLevels u32 entries at 20 (the final boundary is the item capacity,
    NOT serialized); then min item, max item, then the retained items
    (levels[0]-shifted). Item weight at level l is 2^l.
  Flags: empty=1, level0sorted=2, singleItem=4.

Purpose: byte-level golden-vector gate for the quantile family
(tests/test_kll_golden_vectors.py) — proving our KLL -> Spark percentile
mapping understands the reference's actual sketch content (weights
reconstruct n; weighted quantiles track the true distribution within
KLL's published rank error).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

KLL_FAMILY = 15

_EMPTY = 1
_SINGLE = 4

_DTYPES = {"float": ("<f4", 4), "double": ("<f8", 8), "long": ("<i8", 8)}


@dataclass
class KllSketchImage:
    """Decoded KLL sketch: retained items + per-item weights (2^level)."""

    k: int
    m: int
    n: int
    min_k: int
    num_levels: int
    min_item: float
    max_item: float
    items: np.ndarray    # retained items, level-major (level 0 first)
    weights: np.ndarray  # int64, 2^level per item

    @property
    def num_retained(self) -> int:
        return len(self.items)

    def rank_of(self, value: float) -> float:
        """Normalized rank of `value` (inclusive), from the weighted items."""
        if self.n == 0:
            return 0.0
        mask = self.items <= value
        return float(self.weights[mask].sum()) / self.n

    def quantile(self, q: float) -> float:
        """Weighted quantile over retained items (sorted-view semantics,
        reference kll/items_sketch_sorted_view.go)."""
        order = np.argsort(self.items, kind="stable")
        it, wt = self.items[order], self.weights[order]
        cum = np.cumsum(wt)
        target = q * self.n
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(idx, len(it) - 1)])


def decode_kll_sketch(data: bytes, item_type: str = "float") -> KllSketchImage:
    """Parse a KLL sketch of float/double/long items."""
    dt, width = _DTYPES[item_type]
    if len(data) < 8:
        raise ValueError("kll sketch too short")
    pre_ints, ser_ver, family, flags = data[0], data[1], data[2], data[3]
    k = struct.unpack_from("<H", data, 4)[0]
    m = data[6]
    if family != KLL_FAMILY:
        raise ValueError(f"not a KLL sketch (family {family})")
    if flags & _EMPTY:
        return KllSketchImage(k, m, 0, k, 1, np.nan, np.nan,
                              np.empty(0, np.dtype(dt)),
                              np.empty(0, np.int64))
    if flags & _SINGLE:
        item = np.frombuffer(data, dtype=dt, count=1, offset=8)[0]
        return KllSketchImage(
            k, m, 1, k, 1, float(item), float(item),
            np.array([item], dtype=np.dtype(dt)), np.ones(1, np.int64))
    # serVer 1 = full compact; serVer 2 is implied by the single-item flag
    # (handled above). serVer 3 is the UPDATABLE layout (preInts=5, a
    # levels array of numLevels+1 entries, full-capacity item buffer with
    # free space) — parsing it with the compact layout would silently
    # yield garbage min/max/items, so reject it explicitly.
    if ser_ver != 1:
        raise ValueError(f"unsupported serial version {ser_ver} "
                         "(only compact layouts are decoded)")
    n = struct.unpack_from("<Q", data, 8)[0]
    min_k = struct.unpack_from("<H", data, 16)[0]
    num_levels = data[18]
    pos = 20
    levels = np.frombuffer(data, dtype="<u4", count=num_levels, offset=pos)
    pos += 4 * num_levels
    min_item = np.frombuffer(data, dtype=dt, count=1, offset=pos)[0]
    pos += width
    max_item = np.frombuffer(data, dtype=dt, count=1, offset=pos)[0]
    pos += width
    n_ret = (len(data) - pos) // width
    items = np.frombuffer(data, dtype=dt, count=n_ret, offset=pos)
    # level boundaries within the serialized retained array: the file's
    # levels are offsets into the UPDATABLE items buffer starting at
    # levels[0]; the final boundary (capacity) is not serialized — the
    # top level ends at the last retained item.
    rel = (levels.astype(np.int64) - int(levels[0])).tolist() + [n_ret]
    weights = np.empty(n_ret, dtype=np.int64)
    for lvl in range(num_levels):
        weights[rel[lvl]: rel[lvl + 1]] = 1 << lvl
    return KllSketchImage(k, m, int(n), min_k, num_levels,
                          float(min_item), float(max_item), items, weights)
