"""Serde isomorphism: decode golden -> re-encode -> byte-identical (v3),
and encode/decode round-trips for synthetic sketches."""

import glob
import re
from pathlib import Path

import numpy as np
import pytest

from sparkdedup.functions.murmur3 import compute_seed_hash, murmur3_128_int64_single
from sparkdedup.sketch_io.theta_decoder import ThetaCompact, decode_theta
from sparkdedup.sketch_io.theta_encoder import encode_theta

DATA = Path("/root/reference/serialization_test_data")
V3_FILES = [
    f for f in glob.glob(str(DATA / "*_generated_files" / "theta_n*_*.sk"))
    if "compressed" not in f and Path(f).read_bytes()[1] == 3
]


@pytest.mark.skipif(not V3_FILES, reason="no golden vectors")
@pytest.mark.parametrize("path", V3_FILES, ids=lambda p: Path(p).name)
def test_reencode_golden_byte_identical(path):
    raw = Path(path).read_bytes()
    sk = decode_theta(raw, 9001)
    enc = encode_theta(sk)
    if "java" in path and len(raw) > 5 and raw[5] & (1 << 5):
        # Java additionally sets a single-item flag (bit 5) that Go/C++ do
        # not emit and every decoder ignores; normalize it for comparison
        raw = raw[:5] + bytes([raw[5] & ~(1 << 5)]) + raw[6:]
    assert enc == raw


def test_round_trip_synthetic():
    vals = np.arange(50_000, dtype=np.uint64)
    h1, _ = murmur3_128_int64_single(vals, 9001)
    h = np.unique(h1 >> np.uint64(1))
    k = 4096
    sk = ThetaCompact(theta=int(h[k]), entries=h[:k].copy(),
                      seed_hash=compute_seed_hash(9001),
                      is_empty=False, is_ordered=True)
    back = decode_theta(encode_theta(sk), 9001)
    assert back.theta == sk.theta
    assert np.array_equal(back.entries, sk.entries)
    assert back.estimate() == pytest.approx(sk.estimate())


def test_round_trip_edge_cases():
    empty = ThetaCompact(theta=(1 << 63) - 1, entries=np.empty(0, np.uint64),
                         seed_hash=compute_seed_hash(9001),
                         is_empty=True, is_ordered=True)
    b = decode_theta(encode_theta(empty), 9001)
    assert b.is_empty and b.num_retained == 0

    single = ThetaCompact(theta=(1 << 63) - 1,
                          entries=np.array([12345], np.uint64),
                          seed_hash=compute_seed_hash(9001),
                          is_empty=False, is_ordered=True)
    b = decode_theta(encode_theta(single), 9001)
    assert b.num_retained == 1 and int(b.entries[0]) == 12345


# ----------------------------------------------------------- v4 compressed

V4_FILES = [
    f for f in glob.glob(str(DATA / "*_generated_files" / "theta_*.sk"))
    if Path(f).read_bytes()[1] == 4
]


@pytest.mark.skipif(not V4_FILES, reason="no v4 golden vectors")
@pytest.mark.parametrize("path", V4_FILES, ids=lambda p: Path(p).name)
def test_v4_reencode_golden_byte_identical(path):
    """decode v4 -> encode_theta_v4 -> byte-identical to the reference's
    own compressed output (Java, C++ AND Go emit the identical stream —
    the strongest possible check of the delta/bit-width/count rules)."""
    from sparkdedup.sketch_io.theta_encoder import encode_theta_v4

    raw = Path(path).read_bytes()
    sk = decode_theta(raw, 9001)
    assert encode_theta_v4(sk) == raw


def test_v4_round_trip_synthetic():
    from sparkdedup.sketch_io.theta_encoder import encode_theta_v4

    vals = np.arange(80_000, dtype=np.uint64)
    h1, _ = murmur3_128_int64_single(vals, 9001)
    h = np.unique(h1 >> np.uint64(1))
    for n in (2, 7, 8, 9, 4096):  # cross the block-of-8 packing boundary
        sk = ThetaCompact(theta=int(h[n]), entries=h[:n].copy(),
                          seed_hash=compute_seed_hash(9001),
                          is_empty=False, is_ordered=True)
        back = decode_theta(encode_theta_v4(sk), 9001)
        assert back.theta == sk.theta
        assert np.array_equal(back.entries, sk.entries)


def test_compressed_dispatch_falls_back_to_v3():
    from sparkdedup.sketch_io.theta_encoder import encode_theta_compressed

    empty = ThetaCompact(theta=(1 << 63) - 1, entries=np.empty(0, np.uint64),
                         seed_hash=compute_seed_hash(9001),
                         is_empty=True, is_ordered=True)
    assert encode_theta_compressed(empty)[1] == 3  # v3 fallback
    single = ThetaCompact(theta=(1 << 63) - 1,
                          entries=np.array([12345], np.uint64),
                          seed_hash=compute_seed_hash(9001),
                          is_empty=False, is_ordered=True)
    assert encode_theta_compressed(single)[1] == 3
    many = ThetaCompact(theta=(1 << 63) - 1,
                        entries=np.arange(1, 100, dtype=np.uint64),
                        seed_hash=compute_seed_hash(9001),
                        is_empty=False, is_ordered=True)
    assert encode_theta_compressed(many)[1] == 4
