"""Apache DataSketches HLL binary compatibility (SURVEY §2.3 mapping
claim): Spark's hll_* functions consume the reference's serialized
sketches directly.

Golden vectors: /root/reference/serialization_test_data/
{java,cpp,go}_generated_files/hll{4,6,8}_n*_*.sk — each built from n
distinct items by the reference implementations. If Spark's DataSketches
HLL decodes them and estimates within the published error envelope, the
"HLL -> Spark built-in" mapping is proven at the byte level, not assumed.
"""

import glob
import os
import re

import pytest
from pyspark.sql import functions as F

VEC_DIR = "/root/reference/serialization_test_data"


def _vectors():
    out = []
    for gen in ("java", "cpp", "go"):
        for f in sorted(glob.glob(
                f"{VEC_DIR}/{gen}_generated_files/hll*_n*_{gen}.sk")):
            m = re.match(r"hll(\d)_n(\d+)_", os.path.basename(f))
            if m:
                out.append((f, int(m.group(1)), int(m.group(2))))
    return out


VECTORS = _vectors()


@pytest.mark.skipif(not VECTORS, reason="reference vectors unavailable")
@pytest.mark.parametrize(
    "path,mode,n", VECTORS,
    ids=[os.path.basename(p) for p, _, _ in VECTORS])
def test_spark_decodes_reference_hll(spark, path, mode, n):
    data = open(path, "rb").read()
    df = spark.createDataFrame([(data,)], "sk binary")
    est = df.select(F.hll_sketch_estimate("sk").alias("e")).first()["e"]
    if n == 0:
        assert est == 0
    else:
        # lgK=21-ish default vectors: generous 3% envelope (HLL RSE at
        # the reference's default lgK=12 is ~0.8%; estimation kicks in
        # for large n)
        assert abs(est - n) <= max(3, 0.03 * n), (path, est, n)


@pytest.mark.skipif(not VECTORS, reason="reference vectors unavailable")
def test_union_reference_with_spark_built(spark):
    """hll/union.go:95-143 semantics across implementations: union a
    Java-serialized sketch (items 0..9999) with a Spark-built sketch over
    an overlapping range (5000..14999) -> ~15000 distinct."""
    path = f"{VEC_DIR}/java_generated_files/hll4_n10000_java.sk"
    if not os.path.exists(path):
        pytest.skip("vector missing")
    data = open(path, "rb").read()
    ours = (spark.range(5000, 15000)
            .agg(F.hll_sketch_agg(F.col("id").cast("int"), F.lit(21))
                 .alias("sk")))
    theirs = spark.createDataFrame([(data,)], "sk binary")
    both = ours.unionByName(theirs)
    est = both.agg(F.hll_sketch_estimate(
        F.hll_union_agg("sk", F.lit(True))).alias("e")).first()["e"]
    # the union is only as precise as the coarser operand; java vectors
    # use the reference default lgK -> keep a 5% envelope
    assert abs(est - 15000) <= 0.05 * 15000, est
