"""Cross-language golden-vector tests against the reference's own
serialization_test_data (mirrors theta/sketch_serialization_test.go:110-170).

For every theta .sk file (Java, C++, Go; v3 uncompressed and v4 compressed):
decode it, then rebuild the identical retained-hash set from the documented
input stream 0..n-1 with OUR numpy murmur3/KMV kernel — proving end-to-end
hash + screening parity, which is what dup-pair recall inherits from.
"""

import glob
import re
from pathlib import Path

import numpy as np
import pytest

from sparkdedup.functions.murmur3 import murmur3_128_int64_single
from sparkdedup.sketch_io.theta_decoder import MAX_THETA, decode_theta

DATA = Path("/root/reference/serialization_test_data")

FILES = sorted(
    f for pat in ("java_generated_files/theta_*_java.sk",
                  "cpp_generated_files/theta_*_cpp.sk",
                  "go_generated_files/theta_*_go.sk")
    for f in glob.glob(str(DATA / pat))
    if re.search(r"theta_(compressed_)?n(\d+)_", f)
)

pytestmark = pytest.mark.skipif(not FILES, reason="reference vectors not present")


def _stream_hashes(n: int) -> np.ndarray:
    vals = np.arange(n, dtype=np.uint64)
    h1, _ = murmur3_128_int64_single(vals, 9001)
    h = h1 >> np.uint64(1)
    return np.unique(h[h != np.uint64(0)])


@pytest.mark.parametrize("path", FILES, ids=lambda p: Path(p).name)
def test_theta_golden_vectors(path):
    n = int(re.search(r"theta_(compressed_)?n(\d+)_", path).group(2))
    sk = decode_theta(Path(path).read_bytes(), seed=9001)
    if n == 0:
        assert sk.is_empty and sk.num_retained == 0
        return
    ours = _stream_hashes(n)
    expected = ours[ours < np.uint64(sk.theta)]
    got = np.sort(sk.entries)
    assert np.array_equal(expected, got), "retained-hash-set mismatch"
    # accuracy envelope the reference asserts (sketch_serialization_test.go:51)
    assert abs(sk.estimate() - n) <= max(n * 0.03, 0.5)


def test_wrong_seed_rejected():
    f = DATA / "java_generated_files" / "theta_n100_java.sk"
    with pytest.raises(ValueError, match="seed hash"):
        decode_theta(f.read_bytes(), seed=1234)
