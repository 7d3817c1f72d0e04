"""Sequence packing: deterministic next-fit document -> training-pack
assignment (the batch-construction step of an LLM pretraining pipeline).

Shape: packing is a prefix-dependent scan (each decision needs the
running fill), so it cannot be a window function — but it IS
embarrassingly parallel across independent buckets. The operator routes
docs to n_buckets hash buckets (ONE repartition — the only shuffle),
orders each bucket by doc_id, and runs the next-fit scan per bucket in
an applyInPandas kernel over numpy int64 arrays. Buckets never exchange
state, so parallelism == n_buckets and the kernel's memory is one
bucket's (doc_id, n_tokens) pairs: at 10^12 files you size n_buckets so
each bucket holds O(10^6) docs.

Determinism contract (what lets DuckDB's recursive CTE replay it): the
(bucket, doc_id) order is total, and the budget comparison is exact
int64 arithmetic — start with pack=0 / fill=n[0]; for each later doc,
if fill + n > budget then open a new pack with fill=n, else fill += n.
A doc with n > budget therefore always sits alone in its own pack.

Reference parity: the reference has no packing operator — this is one
of the beyond-reference training-pipeline ops (brief: 'operations a
large-scale training-data pipeline would need').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pack_id = bucket * 2^40 + local pack: 2^40 packs per bucket headroom,
# 2^23 buckets headroom, both far beyond any real corpus partitioning.
_PACK_STRIDE = 1 << 40


def pack_next_fit(toks: DataFrame, budget: int = 512,
                  n_buckets: int = 16) -> DataFrame:
    """toks: (doc_id long, bucket int, n_tokens long) -> adds pack_id.

    The caller computes bucket (so the bucket rule is part of the
    query's determinism contract); n_buckets only sizes the
    repartition and must be >= the number of distinct buckets.
    """
    import numpy as np
    import pandas as pd

    schema = ("doc_id bigint, bucket int, pack_id bigint, "
              "n_tokens bigint")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        n = pdf["n_tokens"].to_numpy(dtype=np.int64)
        pack = np.empty(len(n), dtype=np.int64)
        p, fill = 0, np.int64(0)
        first = True
        for i in range(len(n)):
            if first:
                fill = n[i]
                first = False
            elif fill + n[i] > budget:
                p += 1
                fill = n[i]
            else:
                fill += n[i]
            pack[i] = p
        bucket = np.int64(pdf["bucket"].iloc[0]) if len(n) else np.int64(0)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
            "bucket": pdf["bucket"].to_numpy(dtype=np.int32),
            "pack_id": bucket * _PACK_STRIDE + pack,
            "n_tokens": n,
        })

    return (toks.repartition(n_buckets, "bucket")
                .groupBy("bucket").applyInPandas(kernel, schema=schema))
