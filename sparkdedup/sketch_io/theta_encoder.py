"""Write-side of the compact theta format (serial version 3, uncompressed).

Layout spec studied from /root/reference/theta/encoder.go:140-206 and
compact_sketch.go:256-270 (preamble-longs rule). Completes the serde
round-trip so isomorphism tests (decode -> encode -> byte-identical, the
reference's hll_sketch_isomomorphism_test.go pattern) can run against the
cross-language golden vectors.
"""

from __future__ import annotations

import struct

import numpy as np

from sparkdedup.sketch_io.theta_decoder import MAX_THETA, THETA_FAMILY_ID, ThetaCompact

_SER_VER = 3
_FLAG_READONLY = 1 << 1
_FLAG_EMPTY = 1 << 2
_FLAG_COMPACT = 1 << 3
_FLAG_ORDERED = 1 << 4


def _preamble_longs(sk: ThetaCompact) -> int:
    # reference theta/compact_sketch.go:256-270 (uncompressed branch)
    if sk.theta < MAX_THETA:  # estimation mode
        return 3
    if sk.is_empty or sk.num_retained == 1:
        return 1
    return 2


def encode_theta(sk: ThetaCompact) -> bytes:
    pre = _preamble_longs(sk)
    out = bytearray(pre * 8 + sk.num_retained * 8)
    out[0] = pre
    out[1] = _SER_VER
    out[2] = THETA_FAMILY_ID
    # bytes 3-4 unused
    flags = _FLAG_COMPACT | _FLAG_READONLY
    if sk.is_empty:
        flags |= _FLAG_EMPTY
    if sk.is_ordered:
        flags |= _FLAG_ORDERED
    out[5] = flags
    struct.pack_into("<H", out, 6, sk.seed_hash)
    off = 8
    if pre > 1:
        struct.pack_into("<I", out, off, sk.num_retained)
        off += 8  # 4 bytes count + 4 unused
    if sk.theta < MAX_THETA:
        struct.pack_into("<Q", out, off, sk.theta)
        off += 8
    if sk.num_retained:
        out[off:off + 8 * sk.num_retained] = (
            sk.entries.astype("<u8").tobytes())
    return bytes(out)
