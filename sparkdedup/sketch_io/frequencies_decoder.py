"""Decoder for serialized frequent-items (Misra-Gries reverse-purge)
sketches with long items.

Wire format studied from the reference (no code copied, Go -> numpy):
  /root/reference/frequencies/longs_sketch.go:101-175 and
  frequencies/preamble_utils.go:40-135 —
    pre0 long: [preLongs u8, serVer=1 u8, family=10 u8, lgMaxMapSize u8,
                lgCurMapSize u8, flags u8, ...]; empty iff flag bit 2
                (preLongs==1).
    full preamble (preLongs=4): pre1 = activeItems u32, pre2 =
    streamWeight i64, pre3 = offset i64; then activeItems counts (i64)
    then activeItems items (i64).
  Estimate semantics (frequencies/longs_sketch.go:345-361): est = count +
  offset upper bound, lb = count; apriori error eps = 3.5 / maxMapSize.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

FREQUENCY_FAMILY = 10
_EMPTY_FLAG = 1 << 2


@dataclass
class FreqSketchImage:
    lg_max_map_size: int
    lg_cur_map_size: int
    stream_weight: int
    offset: int
    items: np.ndarray    # int64
    counts: np.ndarray   # int64

    @property
    def max_map_size(self) -> int:
        return 1 << self.lg_max_map_size

    @property
    def epsilon(self) -> float:
        # reference frequencies/longs_sketch.go:279-291
        return 3.5 / self.max_map_size

    def upper_bound(self, item: int) -> int:
        m = self.items == item
        c = int(self.counts[m][0]) if m.any() else 0
        return c + self.offset

    def lower_bound(self, item: int) -> int:
        m = self.items == item
        return int(self.counts[m][0]) if m.any() else 0


def decode_freq_longs_sketch(data: bytes) -> FreqSketchImage:
    if len(data) < 8:
        raise ValueError("frequencies sketch too short")
    pre_longs, ser_ver, family, lg_max, lg_cur, flags = data[:6]
    pre_longs &= 0x3F
    if family != FREQUENCY_FAMILY:
        raise ValueError(f"not a frequencies sketch (family {family})")
    if ser_ver != 1:
        raise ValueError(f"unsupported serial version {ser_ver}")
    if flags & _EMPTY_FLAG:
        return FreqSketchImage(lg_max, lg_cur, 0, 0,
                               np.empty(0, np.int64), np.empty(0, np.int64))
    active = struct.unpack_from("<I", data, 8)[0]
    stream_weight = struct.unpack_from("<q", data, 16)[0]
    offset = struct.unpack_from("<q", data, 24)[0]
    pos = pre_longs * 8
    counts = np.frombuffer(data, dtype="<i8", count=active, offset=pos)
    items = np.frombuffer(data, dtype="<i8", count=active,
                          offset=pos + 8 * active)
    return FreqSketchImage(lg_max, lg_cur, int(stream_weight), int(offset),
                           items.astype(np.int64), counts.astype(np.int64))


@dataclass
class FreqStringSketchImage:
    """Frequent-items sketch with STRING items — same preamble as the
    longs layout (reference frequencies/items_sketch.go:112-186: preArr[1]
    low-u32 = activeItems, preArr[2] = streamWeight, preArr[3] = offset),
    then activeItems counts (i64), then activeItems variable-length items
    (u32-LE byte length + utf-8 bytes each — the generic string SerDe the
    long decoder never exercises)."""
    lg_max_map_size: int
    lg_cur_map_size: int
    stream_weight: int
    offset: int
    items: list
    counts: np.ndarray

    @property
    def max_map_size(self) -> int:
        return 1 << self.lg_max_map_size

    @property
    def maximum_error(self) -> int:
        # reference GetMaximumError == the purge offset
        return self.offset

    def estimate(self, item: str) -> int:
        for it, c in zip(self.items, self.counts):
            if it == item:
                return int(c) + self.offset
        return self.offset


def decode_freq_string_sketch(data: bytes) -> FreqStringSketchImage:
    if len(data) < 8:
        raise ValueError("frequencies sketch too short")
    pre_longs, ser_ver, family, lg_max, lg_cur, flags = data[:6]
    pre_longs &= 0x3F
    if family != FREQUENCY_FAMILY:
        raise ValueError(f"not a frequencies sketch (family {family})")
    if ser_ver != 1:
        raise ValueError(f"unsupported serial version {ser_ver}")
    if flags & _EMPTY_FLAG:
        return FreqStringSketchImage(lg_max, lg_cur, 0, 0, [],
                                     np.empty(0, np.int64))
    active = struct.unpack_from("<I", data, 8)[0]
    stream_weight = struct.unpack_from("<q", data, 16)[0]
    offset = struct.unpack_from("<q", data, 24)[0]
    pos = pre_longs * 8
    counts = np.frombuffer(data, dtype="<i8", count=active,
                           offset=pos).astype(np.int64)
    pos += 8 * active
    items = []
    for _ in range(active):
        ln = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        items.append(data[pos: pos + ln].decode("utf-8"))
        pos += ln
    return FreqStringSketchImage(lg_max, lg_cur, int(stream_weight),
                                 int(offset), items, counts)
