"""Golden vectors for three more reference families: aod (ArrayOfDoubles
tuple), frequent-longs (Misra-Gries), reservoir-longs — extending the
byte-level serde gate beyond theta/tuple_int/KLL/HLL.

Vector semantics (evident from the files themselves): items 1..n (or
0..n-1 for aod keys) inserted once each."""

import glob
import os
import re

import numpy as np
import pytest

VEC_DIR = "/root/reference/serialization_test_data"


def _glob(pattern):
    out = []
    for gen in ("java", "cpp", "go"):
        out += [(f, gen) for f in sorted(glob.glob(
            f"{VEC_DIR}/{gen}_generated_files/{pattern.format(gen=gen)}"))]
    return out


AOD = [(f, g, int(re.search(r"aod_(\d)_n(\d+)_", os.path.basename(f)).group(1)),
        int(re.search(r"aod_(\d)_n(\d+)_", os.path.basename(f)).group(2)))
       for f, g in _glob("aod_*_n*_{gen}.sk")
       if re.search(r"aod_\d_n\d+_", os.path.basename(f))]

FREQ = [(f, g, int(re.search(r"_n(\d+)_", os.path.basename(f)).group(1)))
        for f, g in _glob("frequent_long_n*_{gen}.sk")]

RES = [(f, g) for f, g in _glob("reservoir_longs_*_{gen}.sk")
       + _glob("reservoir_items_long_*_{gen}.sk") if "union" not in f]

pytestmark = pytest.mark.skipif(not (AOD and FREQ and RES),
                                reason="reference vectors unavailable")


@pytest.mark.parametrize("path,gen,nv,n", AOD,
                         ids=[os.path.basename(p) for p, _, _, _ in AOD])
def test_aod_decode(path, gen, nv, n):
    from sparkdedup.sketch_io.tuple_decoder import decode_aod_sketch

    img, vals = decode_aod_sketch(open(path, "rb").read())
    assert vals.shape == (img.num_retained, nv)
    if n == 0:
        assert img.num_retained == 0
        return
    assert np.all(img.entries < np.uint64(img.theta))
    assert len(np.unique(img.entries)) == img.num_retained
    assert abs(img.estimate() - n) <= max(2, 0.05 * n)
    if img.theta_frac == 1.0 and gen in ("java", "cpp"):
        # exact mode: every column carries the update value {0..n-1}
        # (the Go generator fills columns with the value index instead)
        for c in range(nv):
            assert sorted(vals[:, c].tolist()) == [float(i) for i in range(n)]


def test_aod_retained_set_matches_tuple_int():
    """aod and tuple_int vectors for the same n hash the same keys — the
    retained sets must be identical across the two concrete sketches."""
    from sparkdedup.sketch_io.tuple_decoder import (decode_aod_sketch,
                                                    decode_tuple_sketch)

    for n in (100, 10000):
        a = f"{VEC_DIR}/java_generated_files/aod_1_n{n}_java.sk"
        t = f"{VEC_DIR}/java_generated_files/tuple_int_n{n}_java.sk"
        if not (os.path.exists(a) and os.path.exists(t)):
            pytest.skip("vectors missing")
        ai, _ = decode_aod_sketch(open(a, "rb").read())
        ti = decode_tuple_sketch(open(t, "rb").read())
        assert set(ai.entries.tolist()) == set(ti.entries.tolist())
        assert ai.theta == ti.theta


@pytest.mark.parametrize("path,gen,n", FREQ,
                         ids=[os.path.basename(p) for p, _, _ in FREQ])
def test_frequent_longs_decode(path, gen, n):
    from sparkdedup.sketch_io.frequencies_decoder import \
        decode_freq_longs_sketch

    img = decode_freq_longs_sketch(open(path, "rb").read())
    # stream weight reconstructs n EXACTLY (Misra-Gries invariant)
    assert img.stream_weight == n
    if n == 0:
        assert len(img.items) == 0
        return
    assert len(img.items) <= img.max_map_size
    assert len(np.unique(img.items)) == len(img.items)
    # every true count is 1 (each item inserted once): bounds must bracket
    for item in img.items[:4]:
        assert img.lower_bound(int(item)) <= 1 + img.offset
        assert img.upper_bound(int(item)) >= 1
    # apriori error bound: the purged offset never exceeds eps * n
    assert img.offset <= img.epsilon * n + 1


@pytest.mark.parametrize("path,gen", RES,
                         ids=[os.path.basename(p) for p, _ in RES])
def test_reservoir_longs_decode(path, gen):
    from sparkdedup.sketch_io.reservoir_decoder import \
        decode_reservoir_longs_sketch

    img = decode_reservoir_longs_sketch(open(path, "rb").read())
    m = re.search(r"_n(\d+)_k(\d+)_", os.path.basename(path))
    if m is None:  # empty vectors
        assert img.num_samples == 0
        return
    n, k = int(m.group(1)), int(m.group(2))
    assert img.n == n and img.k == k
    assert img.num_samples == min(n, k)
    assert len(np.unique(img.samples)) == img.num_samples  # w/o replacement
    # items are drawn from the inserted universe
    assert img.samples.min() >= 0 and img.samples.max() <= n
    if n <= k:
        # exact mode: the sample IS the stream
        got = sorted(img.samples.tolist())
        assert got == list(range(n)) or got == list(range(1, n + 1))


BF = [(f, g) for f, g in _glob("bf_n*_{gen}.sk")]


@pytest.mark.parametrize("path,gen", BF,
                         ids=[os.path.basename(p) for p, _ in BF])
def test_bloom_filter_decode_and_query(path, gen):
    """Query reference-built bloom filters from numpy: the Java-compatible
    xxhash64(long, seed) + double-hashing index math must reproduce the
    reference's bit positions EXACTLY — every inserted item (the vectors
    insert longs 0..999 and more) tests positive (no false negatives,
    cross-implementation), and a disjoint probe range stays within a
    loose fpp envelope."""
    from sparkdedup.sketch_io.bloom_decoder import decode_bloom_filter

    img = decode_bloom_filter(open(path, "rb").read())
    n = int(re.search(r"bf_n(\d+)_h(\d+)", os.path.basename(path)).group(1))
    h = int(re.search(r"bf_n(\d+)_h(\d+)", os.path.basename(path)).group(2))
    assert img.num_hashes == h
    if n == 0:
        assert img.is_empty
        assert not img.query_longs(np.arange(100, dtype=np.int64)).any()
        return
    members = np.arange(1000, dtype=np.int64)
    assert img.query_longs(members).all(), "false negative on inserted items"
    far = np.arange(10_000_000, 10_002_000, dtype=np.int64)
    assert img.query_longs(far).mean() < 0.05


AOS = [(f, g) for f, g in _glob("aos_*_{gen}.sk")]


@pytest.mark.parametrize("path,gen", AOS,
                         ids=[os.path.basename(p) for p, _ in AOS])
def test_aos_decode(path, gen):
    """ArrayOfStrings tuple sketches (generic tuple layout + variable
    string summaries, tuple/arrayofstrings_sketch.go:78-160): every vector
    decodes — incl. unicode and empty-string summaries — with distinct
    in-theta hashes, value count matching the summary width, and estimates
    within the k=4096 envelope for the n-parameterized vectors."""
    from sparkdedup.sketch_io.tuple_decoder import decode_aos_sketch

    img, vals = decode_aos_sketch(open(path, "rb").read())
    assert len(vals) == img.num_retained
    base = os.path.basename(path)
    m = re.search(r"aos_(\d)_n(\d+)_", base)
    if img.num_retained:
        assert np.all(img.entries < np.uint64(img.theta))
        assert len(np.unique(img.entries)) == img.num_retained
        assert all(isinstance(s, str) for v in vals for s in v)
    if m:
        nv, n = int(m.group(1)), int(m.group(2))
        assert all(len(v) == nv for v in vals)
        if n == 0:
            assert img.num_retained == 0
        else:
            est = img.estimate()
            assert abs(est - n) <= max(2, 0.05 * n)
            if img.theta_frac == 1.0:
                # exact regime: summaries are exactly the inserted keys
                firsts = sorted(v[0] for v in vals)
                pref = "value" if nv == 1 else "a"
                want = sorted(f"{pref}{i}" for i in range(n))
                assert firsts == want
    if "unicode" in base:
        flat = {s for v in vals for s in v}
        assert any(ord(ch) > 127 for s in flat for ch in s)


TD = [(f, g, int(re.search(r"_n(\d+)_", os.path.basename(f)).group(1)))
      for f, g in _glob("tdigest_double*_n*_{gen}.sk")]


@pytest.mark.parametrize("path,gen,n", TD,
                         ids=[os.path.basename(p) for p, _, _ in TD])
def test_tdigest_double_decode(path, gen, n):
    """t-digest (double) wire format (tdigest/double_decoder.go:46-170),
    incl. the with-buffer variants: centroid weights + buffered values
    reconstruct n EXACTLY, min/max are exact, and cumulative-weight
    quantiles track the 1..n uniform distribution within the k=100
    digest's mid-range resolution."""
    from sparkdedup.sketch_io.tdigest_decoder import decode_tdigest_double

    img = decode_tdigest_double(open(path, "rb").read())
    assert img.total_weight == n
    if n == 0:
        assert len(img.means) == 0 and len(img.buffered) == 0
        return
    assert img.min_item == 1.0 and img.max_item == float(n)
    assert np.all(np.diff(img.means) >= 0)  # centroids ascending
    for q in (0.25, 0.5, 0.75):
        got = img.quantile(q)
        assert abs(got - q * n) <= max(1.0, 0.10 * n), (q, got)
