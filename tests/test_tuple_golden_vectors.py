"""Tuple-sketch golden vectors: decode every reference-serialized
tuple_int sketch (Java/C++/Go) and check cross-implementation parity,
estimate semantics, and agreement with OUR tuple union kernel.

Vectors: /root/reference/serialization_test_data/*_generated_files/
tuple_int_n{N}_*.sk — N distinct keys 0..N-1, each updated once with
summary value = key (evident from the exact-mode files: summaries are
exactly the set {0..N-1}).
"""

import glob
import os
import re

import numpy as np
import pytest

VEC_DIR = "/root/reference/serialization_test_data"


def _vectors():
    out = []
    for gen in ("java", "cpp", "go"):
        for f in sorted(glob.glob(
                f"{VEC_DIR}/{gen}_generated_files/tuple_int_n*_{gen}.sk")):
            m = re.match(r"tuple_int_n(\d+)_", os.path.basename(f))
            out.append((f, gen, int(m.group(1))))
    return out


VECTORS = _vectors()
pytestmark = pytest.mark.skipif(not VECTORS,
                                reason="reference vectors unavailable")


@pytest.mark.parametrize("path,gen,n", VECTORS,
                         ids=[os.path.basename(p) for p, _, _ in VECTORS])
def test_decode_and_estimate(path, gen, n):
    from sparkdedup.sketch_io.tuple_decoder import decode_tuple_sketch

    img = decode_tuple_sketch(open(path, "rb").read())
    if n == 0:
        assert img.is_empty and img.num_retained == 0
        return
    assert not img.is_empty
    # retained hashes: distinct, < theta; strictly increasing only when
    # the ordered flag is set (these vectors store hash-table order)
    e = img.entries
    assert np.all(e < np.uint64(img.theta))
    assert len(np.unique(e)) == len(e)
    if img.is_ordered and len(e) > 1:
        assert np.all(np.diff(np.sort(e)) > np.uint64(0))
    # distinct estimate within the k=4096 envelope
    assert abs(img.estimate() - n) <= max(2, 0.05 * n)
    if img.theta_frac == 1.0:
        # exact mode: summaries are exactly the update values {0..n-1}
        assert sorted(img.summaries.tolist()) == list(range(n))
    else:
        # payload estimate: sum over retained / theta_frac ~ sum(0..n-1)
        want = n * (n - 1) / 2
        assert abs(img.payload_total_est() - want) <= 0.05 * want


def test_cross_implementation_parity():
    """Java, C++ and Go serialize the SAME logical sketch for the same n:
    identical retained hash sets, summaries, and theta."""
    from sparkdedup.sketch_io.tuple_decoder import decode_tuple_sketch

    by_n = {}
    for path, gen, n in VECTORS:
        by_n.setdefault(n, []).append(
            (gen, decode_tuple_sketch(open(path, "rb").read())))
    checked = 0
    for n, imgs in by_n.items():
        if len(imgs) < 2:
            continue
        def canon(img):
            order = np.argsort(img.entries)
            return img.entries[order], img.summaries[order]
        be, bs = canon(imgs[0][1])
        for gen, img in imgs[1:]:
            ge, gs = canon(img)
            assert np.array_equal(ge, be), (n, gen)
            assert np.array_equal(gs, bs), (n, gen)
            assert img.theta == imgs[0][1].theta, (n, gen)
            checked += 1
    assert checked >= 10


def test_our_union_kernel_matches_reference_merge():
    """Feed two decoded reference sketches through OUR tuple merge
    (_merge_tuple): theta' = min, summed collisions, k-trim — the merged
    estimate must track the union of the two key ranges."""
    from sparkdedup.operators.tuple_agg import _merge_tuple
    from sparkdedup.sketch_io.tuple_decoder import decode_tuple_sketch

    p10k = f"{VEC_DIR}/java_generated_files/tuple_int_n10000_java.sk"
    p1m = f"{VEC_DIR}/java_generated_files/tuple_int_n1000000_java.sk"
    if not (os.path.exists(p10k) and os.path.exists(p1m)):
        pytest.skip("vectors missing")
    a = decode_tuple_sketch(open(p10k, "rb").read())
    b = decode_tuple_sketch(open(p1m, "rb").read())
    uh, uv, theta = _merge_tuple(
        [(a.entries, a.summaries.astype(np.float64), a.theta),
         (b.entries, b.summaries.astype(np.float64), b.theta)],
        k=4096, policy="sum")
    from sparkdedup.functions.theta import MAX_THETA
    est = len(uh) / (theta / float(MAX_THETA))
    # keys 0..9999 are a subset of keys 0..999999 -> union distinct = 1e6
    assert abs(est - 1_000_000) <= 0.05 * 1_000_000
    assert theta <= min(a.theta, b.theta)
    assert len(uh) <= 4096 + 1
