"""KLL golden vectors: decode every reference-serialized kll_float/
double/long sketch (Java/C++/Go) and verify the sketch's own invariants
plus quantile/rank semantics against the known item distribution (items
are 1..n — evident from min/max of every non-empty vector).

This is the byte-level gate for the quantile family mapping (SURVEY §2.4
KLL -> Spark percentile/approx_percentile): the decoded weighted items
must reproduce n exactly and quantiles within KLL's published normalized
rank error (~1.65/sqrt(k) ~ 1.2% at k=200, asserted with 2x slack).
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
        for typ in ("float", "double", "long"):
            for f in sorted(glob.glob(
                    f"{VEC_DIR}/{gen}_generated_files/"
                    f"kll_{typ}_n*_{gen}.sk")):
                m = re.match(r"kll_\w+_n(\d+)_", os.path.basename(f))
                out.append((f, typ, int(m.group(1))))
    return out


VECTORS = _vectors()
pytestmark = pytest.mark.skipif(not VECTORS,
                                reason="reference vectors unavailable")


@pytest.mark.parametrize("path,typ,n", VECTORS,
                         ids=[os.path.basename(p) for p, _, _ in VECTORS])
def test_decode_weights_and_quantiles(path, typ, n):
    from sparkdedup.sketch_io.kll_decoder import decode_kll_sketch

    img = decode_kll_sketch(open(path, "rb").read(), typ)
    assert img.n == n
    # the level weights must reconstruct n EXACTLY (kll invariant)
    assert int(img.weights.sum()) == n
    if n == 0:
        assert img.num_retained == 0
        return
    assert img.min_item == 1.0 and img.max_item == float(n)
    # retained items all within [min, max]
    assert img.items.min() >= img.min_item
    assert img.items.max() <= img.max_item
    # quantiles track the uniform 1..n distribution within rank error
    eps = 2 * 1.65 / np.sqrt(img.k)  # 2x published envelope
    for q in (0.25, 0.5, 0.75):
        got = img.quantile(q)
        assert abs(got - q * n) <= max(1.0, eps * n), (q, got)
    # rank is the inverse of quantile within the same envelope
    r = img.rank_of(float(int(n * 0.5)))
    assert abs(r - 0.5) <= max(eps, 2.0 / n)


def test_exact_regime_matches_sorted_items():
    """n=100 < k=200: level 0 only, every item retained with weight 1 —
    the sketch IS the dataset (exact regime, like Spark percentile)."""
    from sparkdedup.sketch_io.kll_decoder import decode_kll_sketch

    path = f"{VEC_DIR}/java_generated_files/kll_double_n100_java.sk"
    if not os.path.exists(path):
        pytest.skip("vector missing")
    img = decode_kll_sketch(open(path, "rb").read(), "double")
    assert img.num_levels == 1
    assert np.all(img.weights == 1)
    assert sorted(img.items.tolist()) == [float(i) for i in range(1, 101)]
