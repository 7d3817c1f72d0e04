"""Decoder for serialized compact TUPLE sketches (int summaries).

Wire format studied from the reference (no code copied, Go -> numpy):
  /root/reference/tuple/decoder.go:54-160 —
    [preLongs u8, serVer u8, family u8 (=9 Tuple), sketchType u8,
     unused u8, flags u8, seedHash u16]
    non-empty: preLongs==1 -> numEntries=1; preLongs>=2 -> u32 numEntries
    + u32 unused; preLongs>2 -> u64 theta. Then numEntries x
    (u64 hash + summary).
  Flag bits: /root/reference/tuple/compact_sketch.go:35-41
    (bigEndian, readOnly, empty, compact, ordered).
  Summary width differs by producer: Java/C++ int sketches write int32,
  Go writes int64 — inferred from the residual byte count.

This gives the tuple family the same byte-level golden-vector gate the
theta family has (tests/test_tuple_golden_vectors.py): retained-hash and
summary parity across the Java/C++/Go vectors, plus estimate semantics
(n_retained / theta_frac; payload_sum / theta_frac).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from sparkdedup.functions.murmur3 import compute_seed_hash
from sparkdedup.functions.theta import MAX_THETA

TUPLE_FAMILY = 9

_FLAG_EMPTY = 1 << 2
_FLAG_ORDERED = 1 << 4


@dataclass
class TupleSketchImage:
    """Decoded compact tuple sketch: aligned (entries, summaries) + theta."""

    entries: np.ndarray      # uint64, ordered if is_ordered
    summaries: np.ndarray    # int64
    theta: int
    seed_hash: int
    is_empty: bool
    is_ordered: bool

    @property
    def num_retained(self) -> int:
        return len(self.entries)

    @property
    def theta_frac(self) -> float:
        return self.theta / float(MAX_THETA)

    def estimate(self) -> float:
        return self.num_retained / self.theta_frac

    def payload_total_est(self) -> float:
        return float(self.summaries.sum()) / self.theta_frac


def decode_aod_sketch(data: bytes,
                      expected_seed: int | None = 9001) -> tuple[
                          TupleSketchImage, np.ndarray]:
    """Parse an ArrayOfDoubles (aod) tuple sketch — the reference's
    canonical concrete tuple sketch (tuple/arrayofnumbers_sketch_decoder.go:
    56-160): [pre u8, serVer=1, family=9, sketchType=3, flags u8,
    nValues u8, seedHash u16], theta u64 (always), then if hasEntries:
    u32 numEntries + u32 unused + ALL hashes (u64 x n) followed by ALL
    summaries (f8 x n x nValues). Flags: empty=bit2, hasEntries=bit3,
    ordered=bit4 (tuple/arrayofnumbers_compact_sketch.go:34-40).

    Returns (image with summaries = first value column, full (n, nValues)
    value matrix)."""
    if len(data) < 16:
        raise ValueError("aod sketch too short")
    pre, ver, family, stype, flags, n_values = data[:6]
    seed_hash = struct.unpack_from("<H", data, 6)[0]
    if family != TUPLE_FAMILY or ver != 1 or stype != 3:
        raise ValueError(
            f"not an aod sketch (family {family}, ver {ver}, type {stype})")
    is_empty = bool(flags & (1 << 2))
    has_entries = bool(flags & (1 << 3))
    is_ordered = bool(flags & (1 << 4))
    if has_entries and expected_seed is not None:
        want = compute_seed_hash(expected_seed)
        if seed_hash != want:
            raise ValueError(
                f"seed hash mismatch: {seed_hash:#x} != {want:#x}")
    theta = struct.unpack_from("<q", data, 8)[0]
    if not has_entries:
        img = TupleSketchImage(np.empty(0, np.uint64), np.empty(0, np.int64),
                               int(theta), seed_hash, is_empty, is_ordered)
        return img, np.empty((0, n_values), np.float64)
    num = struct.unpack_from("<I", data, 16)[0]
    pos = 24
    hashes = np.frombuffer(data, dtype="<u8", count=num, offset=pos)
    pos += 8 * num
    vals = np.frombuffer(data, dtype="<f8", count=num * n_values,
                         offset=pos).reshape(num, n_values)
    img = TupleSketchImage(hashes.astype(np.uint64),
                           vals[:, 0].astype(np.int64), int(theta),
                           seed_hash, is_empty, is_ordered)
    return img, vals


def decode_aos_sketch(data: bytes,
                      expected_seed: int | None = 9001) -> tuple[
                          TupleSketchImage, list[list[str]]]:
    """Parse an ArrayOfStrings (aos) tuple sketch: the GENERIC compact
    tuple layout (tuple/decoder.go:54-160) with a variable-length string
    summary per entry — [u32 totalBytes, u8 numNodes, numNodes x
    (u32 len + utf-8 bytes)] (tuple/arrayofstrings_sketch.go:78-160).

    Returns (image with zero summaries, list of string-lists aligned with
    entries)."""
    if len(data) < 8:
        raise ValueError("aos sketch too short")
    pre, ver, family, _stype, _unused, flags = data[:6]
    seed_hash = struct.unpack_from("<H", data, 6)[0]
    if family != TUPLE_FAMILY:
        raise ValueError(f"not a tuple sketch (family {family})")
    is_empty = bool(flags & _FLAG_EMPTY)
    is_ordered = bool(flags & _FLAG_ORDERED)
    if not is_empty and expected_seed is not None:
        want = compute_seed_hash(expected_seed)
        if seed_hash != want:
            raise ValueError(
                f"seed hash mismatch: {seed_hash:#x} != {want:#x}")
    pos = 8
    theta = MAX_THETA
    if is_empty or len(data) <= pos:
        num = 0
    elif pre == 1:
        num = 1
    else:
        num = struct.unpack_from("<I", data, pos)[0]
        pos += 8
        if pre > 2:
            theta = struct.unpack_from("<q", data, pos)[0]
            pos += 8
    hashes = np.empty(num, dtype=np.uint64)
    values: list[list[str]] = []
    for i in range(num):
        hashes[i] = struct.unpack_from("<Q", data, pos)[0]
        pos += 8
        _total = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        n_nodes = data[pos]
        pos += 1
        strs = []
        for _ in range(n_nodes):
            ln = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            strs.append(data[pos: pos + ln].decode("utf-8"))
            pos += ln
        values.append(strs)
    img = TupleSketchImage(hashes, np.zeros(num, np.int64), int(theta),
                           seed_hash, is_empty, is_ordered)
    return img, values


def decode_tuple_sketch(data: bytes, expected_seed: int | None = 9001,
                        summary_bytes: int | None = None) -> TupleSketchImage:
    """Parse a compact tuple sketch with integer summaries.

    summary_bytes: 4 (Java/C++ int) or 8 (Go int64); inferred from the
    residual length when None."""
    if len(data) < 8:
        raise ValueError("tuple sketch too short")
    pre, ver, family, _stype, _unused, flags = data[:6]
    seed_hash = struct.unpack_from("<H", data, 6)[0]
    if family != TUPLE_FAMILY:
        raise ValueError(f"not a tuple sketch (family {family})")
    if ver not in (1, 3):  # reference tuple/compact_sketch.go:31-32
        raise ValueError(f"unsupported serial version {ver}")
    is_empty = bool(flags & _FLAG_EMPTY)
    is_ordered = bool(flags & _FLAG_ORDERED)
    if not is_empty and expected_seed is not None:
        want = compute_seed_hash(expected_seed)
        if seed_hash != want:
            raise ValueError(
                f"seed hash mismatch: {seed_hash:#x} != {want:#x}")

    pos = 8
    theta = MAX_THETA
    if is_empty or len(data) <= pos:
        num = 0
    elif pre == 1:
        num = 1
    else:
        num = struct.unpack_from("<I", data, pos)[0]
        pos += 8  # numEntries u32 + unused u32
        if pre > 2:
            theta = struct.unpack_from("<q", data, pos)[0]
            pos += 8

    if summary_bytes is None:
        summary_bytes = (len(data) - pos) // num - 8 if num else 4
    if summary_bytes not in (4, 8):
        raise ValueError(f"cannot infer summary width ({summary_bytes})")
    rec = np.dtype([("hash", "<u8"),
                    ("val", "<i4" if summary_bytes == 4 else "<i8")])
    body = np.frombuffer(data, dtype=rec, count=num, offset=pos)
    return TupleSketchImage(
        entries=body["hash"].astype(np.uint64),
        summaries=body["val"].astype(np.int64),
        theta=int(theta), seed_hash=seed_hash,
        is_empty=is_empty, is_ordered=is_ordered)
