"""Write-side of the compact theta format: serial version 3 (uncompressed)
and serial version 4 (bit-packed compressed).

Layout spec studied from /root/reference/theta/encoder.go:46-206 (v4
compressed path: encodeVersion4, delta bit width = bit length of the OR of
all deltas; variable-length little-endian count; MSB-first fixed-width
delta stream) and compact_sketch.go:256-330 (preamble-longs rule,
isSuitableForCompression, sizing). Completes the serde round-trip so
isomorphism tests (decode -> encode -> byte-identical, the reference's
hll_sketch_isomomorphism_test.go pattern) can run against the
cross-language golden vectors in BOTH wire versions.
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


def _suitable_for_v4(sk: ThetaCompact) -> bool:
    # reference compact_sketch.go isSuitableForCompression: ordered,
    # non-empty, and not a single-entry exact sketch
    if not sk.is_ordered or sk.num_retained == 0:
        return False
    if sk.num_retained == 1 and sk.theta == MAX_THETA:
        return False
    return True


def encode_theta_v4(sk: ThetaCompact) -> bytes:
    """Bit-packed compressed compact theta (serial version 4).

    Deltas between consecutive ordered entries are packed MSB-first at a
    fixed width = bit length of the OR of all deltas (reference
    computeEntryBits); the entry count is a minimal little-endian
    variable-length integer. Raises ValueError when the sketch is not
    suitable for compression (use encode_theta_compressed for the
    reference's automatic v3 fallback)."""
    if not _suitable_for_v4(sk):
        raise ValueError("sketch not suitable for v4 compression")
    entries = sk.entries.astype(np.uint64)
    deltas = np.diff(entries, prepend=np.uint64(0))
    ored = int(np.bitwise_or.reduce(deltas))
    entry_bits = max(ored.bit_length(), 1)
    n = len(entries)
    n_bytes = max((n.bit_length() + 7) // 8, 1)
    est = sk.theta < MAX_THETA

    head = bytearray(16 if est else 8)
    head[0] = 2 if est else 1          # preamble longs
    head[1] = 4                        # serial version
    head[2] = THETA_FAMILY_ID
    head[3] = entry_bits
    head[4] = n_bytes
    head[5] = _FLAG_COMPACT | _FLAG_READONLY | _FLAG_ORDERED
    struct.pack_into("<H", head, 6, sk.seed_hash)
    if est:
        struct.pack_into("<Q", head, 8, sk.theta)
    count = bytes((n >> (i * 8)) & 0xFF for i in range(n_bytes))

    # MSB-first fixed-width pack: (n, entry_bits) bit matrix -> packbits
    shifts = np.arange(entry_bits - 1, -1, -1, dtype=np.uint64)
    bit_mat = ((deltas[:, None] >> shifts[None, :]) & np.uint64(1)) \
        .astype(np.uint8)
    packed = np.packbits(bit_mat.reshape(-1)).tobytes()
    return bytes(head) + count + packed


def encode_theta_compressed(sk: ThetaCompact) -> bytes:
    """The reference Encoder's compressed mode: v4 when suitable, else the
    uncompressed v3 layout (encoder.go:46-70 encodeWithCompression)."""
    if _suitable_for_v4(sk):
        return encode_theta_v4(sk)
    return encode_theta(sk)
