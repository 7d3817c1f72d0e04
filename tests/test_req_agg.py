"""REQ relative-error quantile sketch (operators/req_agg.py): exact
invariants (total weight, min/max, top-k retention), relative-tail
accuracy envelope, merge invariance, and the Spark two-phase operator."""

import numpy as np
import pytest

from sparkdedup.operators.req_agg import (_ReqChain, req_agg,
                                          req_agg_quantiles, req_quantile)

SF_DIR = "/root/testdata/sf0.001"


def _chain_over(values, k=64, chunk=1000):
    ch = _ReqChain(k)
    for i in range(0, len(values), chunk):
        ch.update(np.asarray(values[i:i + chunk], dtype=np.float64))
    return ch


def test_total_weight_exact():
    rng = np.random.default_rng(3)
    for n in (10, 1000, 57_123):
        ch = _chain_over(rng.standard_normal(n))
        assert ch.total_weight() == n


def test_top_k_retained_exactly():
    """HRA: the protected top of level 0 always contains the true global
    top-k items — the property that makes extreme-tail queries EXACT."""
    rng = np.random.default_rng(7)
    v = rng.exponential(1.0, 30_000)
    k = 64
    ch = _chain_over(v, k=k)
    level0 = np.sort(np.asarray(ch.levels[0]))
    want_top = np.sort(v)[-k:]
    assert len(level0) >= k
    assert np.array_equal(np.sort(level0)[-k:], want_top)


@pytest.mark.parametrize("q", [0.9, 0.99, 0.999, 0.9999])
def test_relative_tail_rank_error(q):
    rng = np.random.default_rng(11)
    n = 200_000
    v = rng.standard_normal(n)
    s = np.sort(v)
    ch = _chain_over(v)
    vals, wts = ch.items()
    est = req_quantile(vals, wts, np.array([q]))[0]
    est_rank = np.searchsorted(s, est, side="right")
    target = q * n
    tail = n - target + 1
    # relative-tail envelope: error proportional to tail mass, never to n
    assert abs(est_rank - target) <= 0.15 * tail + 2, (
        q, est_rank, target, tail)


def test_merge_invariance_and_weight():
    rng = np.random.default_rng(19)
    v = rng.standard_normal(100_000)
    whole = _chain_over(v)
    merged = _ReqChain(64)
    for c in np.array_split(v, 8):
        part = _chain_over(c)
        vals, wts = part.items()
        lv = np.log2(wts).astype(np.int64)
        for lvl in np.unique(lv):
            merged.add_weighted(vals[lv == lvl], int(lvl))
    assert merged.total_weight() == whole.total_weight() == 100_000
    s = np.sort(v)
    for q in (0.99, 0.999):
        for ch in (whole, merged):
            vals, wts = ch.items()
            est = req_quantile(vals, wts, np.array([q]))[0]
            r = np.searchsorted(s, est, side="right")
            tail = len(s) - q * len(s) + 1
            assert abs(r - q * len(s)) <= 0.2 * tail + 2


def test_spark_operator_exact_invariants(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sk = req_agg(li, "l_extendedprice", ["l_returnflag"], k=64)
    got = sk.toPandas()
    want = (li.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"),
                 F.min("l_extendedprice").alias("lo"),
                 F.max("l_extendedprice").alias("hi"))).toPandas()
    m = got.merge(want, on="l_returnflag")
    assert (m.n_x == m.n_y).all()
    assert (m.min_item == m.lo).all()
    assert (m.max_item == m.hi).all()
    # total weight of retained items == n, per group
    for _, r in got.iterrows():
        wsum = int((np.int64(1) << np.asarray(r["levels"])).sum())
        assert wsum == int(r["n"])
    # tail quantile through the full two-phase pipeline
    qs = req_agg_quantiles(sk, [0.999], ["l_returnflag"]).toPandas()
    exact = (li.groupBy("l_returnflag")
             .agg(F.percentile("l_extendedprice", F.lit(0.999)).alias("p"))
             ).toPandas()
    mm = qs.merge(exact, on="l_returnflag")
    spreadf = want.hi.max() - want.lo.min()
    assert (abs(mm.value - mm.p) <= 0.1 * spreadf).all()


def test_chain_property_weight_exact():
    """Property: total retained weight equals the exact input count for
    arbitrary float streams and chunkings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.floats(-1e9, 1e9, allow_nan=False),
                    min_size=1, max_size=3000),
           st.integers(min_value=1, max_value=997))
    def check(vals, chunk):
        ch = _ReqChain(8)
        a = np.asarray(vals, dtype=np.float64)
        for i in range(0, len(a), chunk):
            ch.update(a[i:i + chunk])
        assert ch.total_weight() == len(a)
        # max always retained (HRA protected top)
        vs, _ = ch.items()
        assert a.max() in vs

    check()
