"""Decoder for serialized reservoir sampling sketches (long items).

Wire format studied from the reference (no code copied, Go -> numpy):
  /root/reference/sampling/reservoir_items_sketch.go:360-475 —
    byte0 = resize-factor bits (high 2) | preLongs (low 6); byte1 =
    serVer (2); byte2 = family (ReservoirItems); byte3 = flags
    (empty = bit 2). preLongs==1 -> empty (k u32 at offset 4).
    Full: k u32 @4, n u64 @8, then numSamples = min(n, k) items.
  Semantics (reservoir_items_sketch.go:72-131): a uniform-without-
  replacement k-sample of the first n stream items.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_EMPTY_FLAG = 1 << 2


@dataclass
class ReservoirSketchImage:
    k: int
    n: int
    samples: np.ndarray  # int64

    @property
    def num_samples(self) -> int:
        return len(self.samples)


def decode_reservoir_longs_sketch(data: bytes) -> ReservoirSketchImage:
    if len(data) < 8:
        raise ValueError("reservoir sketch too short")
    pre_longs = data[0] & 0x3F
    ser_ver, family, flags = data[1], data[2], data[3]
    if ser_ver != 2:
        raise ValueError(f"unsupported serial version {ser_ver}")
    k = struct.unpack_from("<I", data, 4)[0]
    if (flags & _EMPTY_FLAG) or pre_longs == 1:
        return ReservoirSketchImage(k, 0, np.empty(0, np.int64))
    n = struct.unpack_from("<Q", data, 8)[0]
    num = min(n, k)
    items = np.frombuffer(data, dtype="<i8", count=num,
                          offset=pre_longs * 8)
    return ReservoirSketchImage(int(k), int(n), items.astype(np.int64))
