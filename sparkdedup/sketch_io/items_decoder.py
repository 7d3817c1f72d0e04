"""Decoders for the reference's generic-items sampling wire formats:
VarOpt items sketch + union, and Reservoir items sketch + union, with the
long / double / string item SerDes.

Wire formats studied from the reference (no code copied, Go -> numpy/python
re-design):
  VarOpt sketch  — sampling/varopt_items_sketch_decoder.go:35-214 and
    varopt_items_sketch_encoder.go:31-36: byte0 = preambleLongs(low 6) |
    resizeFactor<<6; serVer=2; family=13; flags (empty=0x04, gadget=0x80);
    k u32 @4. Non-empty: n u64 @8, h u32 @16, r u32 @20; full mode
    (preLongs=4, n>k) adds totalWeightR f64 @24; then h weights (f64),
    gadget mark bytes (ceil(h/8)) if flagged, h items, r items via serde.
    Warmup mode (preLongs=3, n<=k) requires n==h, r==0.
  VarOpt union   — sampling/varopt_items_union_decoder.go:32-110: preLongs,
    serVer=2, family=14, flags(empty=0x04), maxK u32 @4; non-empty: n i64,
    outerTauNumer f64, outerTauDenom u64, then an embedded VarOpt sketch.
  Reservoir items — sampling/reservoir_items_sketch.go:310-480: byte0 =
    rfBits(0xC0) | preLongs (1 empty / 2 full); serVer=2 (v1 encodes k as
    u16 via decodeReservoirSize); family=11; flags empty=0x04; k u32 @4;
    n u64 @8; then min(n,k) items via serde from byte 16.
  Reservoir union — sampling/reservoir_items_union.go:288-390: preLongs=1,
    serVer=2, family=12, flags empty=0x04, maxK u32 @4, then an embedded
    reservoir sketch from byte 8.
  Item SerDes    — common/item_sketch_{long,double,string}.go: long/double
    are 8-byte LE; string is u32-LE byte length + utf-8 bytes per item.

Estimate semantics (VarOpt subset sum, sampling/varopt_items_sketch.go):
H-region items carry exact weights; each R-region item carries
tau = totalWeightR / r; EstimateSubsetSum(pred) = sum of matching H
weights + tau * |matching R items|; total weight = sum(H) + totalWeightR.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

VAROPT_FAMILY = 13
VAROPT_UNION_FAMILY = 14
RESERVOIR_ITEMS_FAMILY = 11
RESERVOIR_UNION_FAMILY = 12
_EMPTY_FLAG = 0x04
_GADGET_FLAG = 0x80


def _read_items(data: bytes, pos: int, count: int, item_type: str):
    """The reference item SerDes: long/double = 8B LE; string = u32 len +
    utf-8 bytes. Returns (items list, new position)."""
    if item_type == "long":
        out = np.frombuffer(data, dtype="<i8", count=count,
                            offset=pos).tolist()
        return out, pos + 8 * count
    if item_type == "double":
        out = np.frombuffer(data, dtype="<f8", count=count,
                            offset=pos).tolist()
        return out, pos + 8 * count
    if item_type == "string":
        out = []
        for _ in range(count):
            ln = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            out.append(data[pos: pos + ln].decode("utf-8"))
            pos += ln
        return out, pos
    raise ValueError(f"unknown item type {item_type}")


# --------------------------------------------------------------------------
# VarOpt
# --------------------------------------------------------------------------

@dataclass
class VarOptImage:
    k: int
    n: int
    h: int
    r: int
    weights_h: np.ndarray          # float64, the exact H-region weights
    total_weight_r: float
    items_h: list = field(default_factory=list)
    items_r: list = field(default_factory=list)
    marks_h: list = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def num_samples(self) -> int:
        return self.h + self.r

    @property
    def tau(self) -> float:
        return self.total_weight_r / self.r if self.r else 0.0

    @property
    def total_weight(self) -> float:
        # sequential accumulation — matches the reference's running-sum
        # semantics to its 1e-13 test epsilon (numpy pairwise summation
        # rounds differently on long weight lists)
        return sum(float(w) for w in self.weights_h) + self.total_weight_r

    def estimate_subset_sum(self, pred) -> float:
        est = sum(float(w) for w, it in zip(self.weights_h, self.items_h)
                  if pred(it))
        est += self.tau * sum(1 for it in self.items_r if pred(it))
        return est


def decode_varopt_sketch(data: bytes, item_type: str = "long") -> VarOptImage:
    if len(data) < 8:
        raise ValueError("varopt sketch too short")
    pre_longs = data[0] & 0x3F
    ser_ver, family, flags = data[1], data[2], data[3]
    if family != VAROPT_FAMILY:
        raise ValueError(f"not a varopt sketch (family {family})")
    if ser_ver != 2:
        raise ValueError(f"unsupported varopt serVer {ser_ver}")
    k = struct.unpack_from("<I", data, 4)[0]
    if flags & _EMPTY_FLAG:
        if pre_longs != 1:
            raise ValueError("empty varopt must have preLongs 1")
        return VarOptImage(k, 0, 0, 0, np.empty(0), 0.0)
    if pre_longs not in (3, 4):
        raise ValueError(f"invalid varopt preLongs {pre_longs}")
    n = struct.unpack_from("<Q", data, 8)[0]
    h = struct.unpack_from("<I", data, 16)[0]
    r = struct.unpack_from("<I", data, 20)[0]
    pos = 24
    total_weight_r = 0.0
    if pre_longs == 4:
        if h + r != k:
            raise ValueError("full-mode varopt requires h + r == k")
        total_weight_r = struct.unpack_from("<d", data, pos)[0]
        pos += 8
        if not (total_weight_r > 0) or r == 0:
            raise ValueError("corrupt full-mode varopt R weight")
    else:
        if n != h or r != 0:
            raise ValueError("warmup-mode varopt requires n == h, r == 0")
    weights = np.frombuffer(data, dtype="<f8", count=h, offset=pos).copy()
    pos += 8 * h
    if (weights <= 0).any():
        raise ValueError("non-positive varopt weight")
    marks = []
    if flags & _GADGET_FLAG:
        mark_bytes = data[pos: pos + ((h + 7) // 8)]
        pos += (h + 7) // 8
        marks = [bool((mark_bytes[i >> 3] >> (i & 7)) & 1)
                 for i in range(h)]
    items_h, pos = _read_items(data, pos, h, item_type)
    items_r, pos = _read_items(data, pos, r, item_type)
    return VarOptImage(int(k), int(n), int(h), int(r), weights,
                       float(total_weight_r), items_h, items_r, marks)


@dataclass
class VarOptUnionImage:
    max_k: int
    n: int
    outer_tau_numer: float
    outer_tau_denom: int
    gadget: VarOptImage | None


def decode_varopt_union(data: bytes,
                        item_type: str = "long") -> VarOptUnionImage:
    if len(data) < 8:
        raise ValueError("varopt union too short")
    ser_ver, family, flags = data[1], data[2], data[3]
    if family != VAROPT_UNION_FAMILY:
        raise ValueError(f"not a varopt union (family {family})")
    if ser_ver != 2:
        raise ValueError(f"unsupported varopt union serVer {ser_ver}")
    max_k = struct.unpack_from("<I", data, 4)[0]
    if flags & _EMPTY_FLAG:
        return VarOptUnionImage(max_k, 0, 0.0, 0, None)
    n = struct.unpack_from("<q", data, 8)[0]
    numer = struct.unpack_from("<d", data, 16)[0]
    denom = struct.unpack_from("<Q", data, 24)[0]
    gadget = decode_varopt_sketch(data[32:], item_type)
    return VarOptUnionImage(int(max_k), int(n), float(numer), int(denom),
                            gadget)


# --------------------------------------------------------------------------
# Reservoir items
# --------------------------------------------------------------------------

@dataclass
class ReservoirItemsImage:
    k: int
    n: int
    samples: list

    @property
    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def num_samples(self) -> int:
        return min(self.n, self.k)


def decode_reservoir_items(data: bytes,
                           item_type: str = "long") -> ReservoirItemsImage:
    if len(data) < 8:
        raise ValueError("reservoir items sketch too short")
    pre_longs = data[0] & 0x3F
    ser_ver, family, flags = data[1], data[2], data[3]
    if family != RESERVOIR_ITEMS_FAMILY:
        raise ValueError(f"not a reservoir items sketch (family {family})")
    if ser_ver != 2:
        # serVer 1 encodes k as a u16 via decodeReservoirSize — none of
        # the golden vectors use it; reject rather than mis-parse
        raise ValueError(f"unsupported reservoir items serVer {ser_ver}")
    k = struct.unpack_from("<I", data, 4)[0]
    if flags & _EMPTY_FLAG:
        if pre_longs != 1:
            raise ValueError("empty reservoir must have preLongs 1")
        return ReservoirItemsImage(int(k), 0, [])
    if pre_longs != 2:
        raise ValueError(f"invalid reservoir preLongs {pre_longs}")
    n = struct.unpack_from("<Q", data, 8)[0]
    count = min(int(n), int(k))
    samples, _ = _read_items(data, 16, count, item_type)
    return ReservoirItemsImage(int(k), int(n), samples)


@dataclass
class ReservoirUnionImage:
    max_k: int
    gadget: ReservoirItemsImage | None


def decode_reservoir_items_union(
        data: bytes, item_type: str = "long") -> ReservoirUnionImage:
    if len(data) < 8:
        raise ValueError("reservoir union too short")
    pre_longs = data[0] & 0x3F
    ser_ver, family, flags = data[1], data[2], data[3]
    if family != RESERVOIR_UNION_FAMILY:
        raise ValueError(f"not a reservoir union (family {family})")
    if ser_ver != 2:
        raise ValueError(f"unsupported reservoir union serVer {ser_ver}")
    if pre_longs != 1:
        raise ValueError(f"invalid reservoir union preLongs {pre_longs}")
    max_k = struct.unpack_from("<I", data, 4)[0]
    if flags & _EMPTY_FLAG:
        return ReservoirUnionImage(int(max_k), None)
    return ReservoirUnionImage(int(max_k),
                               decode_reservoir_items(data[8:], item_type))
