"""Mega-bucket cap behavior: bounded pair generation + windowed pairing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.operators.lsh import candidate_pairs


def _fake_sigs(spark, n, shared_band_hash, cap_band=0):
    """n signatures all colliding in band 0 (a boilerplate mega bucket)."""
    rows = []
    rng = np.random.default_rng(7)
    for i in range(n):
        bands = rng.integers(-2**62, 2**62, 16).tolist()
        bands[cap_band] = shared_band_hash
        rows.append((i, int(rng.integers(-2**62, 2**62)), bands))
    return spark.createDataFrame(
        rows, "file_id long, simhash long, bands array<long>")


def test_mega_bucket_pairs_bounded(spark):
    cfg = DedupConfig(bucket_cap=16, neighbor_window=3)
    n = 200
    sigs = _fake_sigs(spark, n, shared_band_hash=42)
    pairs = candidate_pairs(sigs, cfg).toPandas()
    # quadratic would be n*(n-1)/2 = 19900 from the shared bucket; the
    # windowed path emits at most n*w
    assert len(pairs) <= n * cfg.neighbor_window + 50
    assert len(pairs) >= n - 1  # chain coverage: every member pairs up
    assert (pairs.src < pairs.dst).all()


def test_small_buckets_exhaustive(spark):
    cfg = DedupConfig(bucket_cap=64)
    sigs = _fake_sigs(spark, 10, shared_band_hash=7)
    pairs = candidate_pairs(sigs, cfg).toPandas()
    assert len(pairs) == 45  # all 10-choose-2 within the shared bucket


def test_neighbor_window_orders_by_simhash(spark):
    """Members with identical simhash must still pair (adjacent ranks)."""
    cfg = DedupConfig(bucket_cap=4, neighbor_window=1)
    rows = [(i, 99, [1] + [100 + i * 16 + b for b in range(15)])
            for i in range(12)]
    sigs = spark.createDataFrame(
        rows, "file_id long, simhash long, bands array<long>")
    pairs = candidate_pairs(sigs, cfg).toPandas()
    # rank chain over 12 members with w=1 -> exactly 11 adjacent pairs
    assert len(pairs) == 11
