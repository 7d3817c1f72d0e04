"""Embedding similarity search: brute-force exact top-k and an LSH-bucketed
scale path (random-hyperplane signatures — the SimHash construction applied
to dense vectors).

Scale design: brute force is O(Q x N) — fine for reranking, wrong as the
primary path at 10^9+ vectors. The bucketed variant assigns each vector a
b-bit hyperplane signature per table, candidates = vectors sharing a bucket
in any table (shuffle equi-join on (table, bucket), same shape as the text
LSH pass), then exact cosine only on candidates. Recall is tunable via
(n_tables, n_bits).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float32)


def hyperplane_buckets(emb: DataFrame, dim: int, n_tables: int = 8,
                       n_bits: int = 12, seed: int = 9001,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket) — sign-bit signature per hash table, vectorized
    per Arrow batch."""
    planes = _hyperplanes(dim, n_tables, n_bits, seed)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            out = []
            for t in range(n_tables):
                proj = vecs @ planes[t].T            # (n, n_bits)
                bits = (proj > 0).astype(np.int64)
                bucket = bits @ weights
                out.append(pd.DataFrame({
                    "vid": pdf[id_col].to_numpy(),
                    "table": t, "bucket": bucket}))
            yield pd.concat(out, ignore_index=True)

    return emb.mapInPandas(run, schema="vid long, table int, bucket long")


def ann_lsh_topk(emb: DataFrame, k: int = 5, n_tables: int = 8,
                 n_bits: int = 10, seed: int = 9001,
                 round_to: int = 4) -> DataFrame:
    """Approximate top-k cosine neighbors for every vector via bucketed
    candidate generation + exact rerank. Returns (qid, nid, cosine, rank)."""
    dim = len(emb.select("embedding").first()[0])
    buckets = hyperplane_buckets(emb, dim, n_tables, n_bits, seed)
    a = buckets.select("table", "bucket", F.col("vid").alias("qid"))
    b = buckets.select("table", "bucket", F.col("vid").alias("nid"))
    cands = (a.join(b, ["table", "bucket"])
             .filter(F.col("qid") != F.col("nid"))
             .select("qid", "nid").distinct())

    e1 = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    e2 = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"))
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    scored = (cands.join(e1, "qid").join(e2, "nid")
              .withColumn("cosine", F.round(
                  dot / (norm(F.col("qv")) * norm(F.col("nv"))), round_to)))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "cosine",
                    F.col("rank").cast("long").alias("rank")))


def ann_brute_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                   round_to: int = 4) -> DataFrame:
    """Exact top-k for a (small, broadcastable) query set — the oracle and
    rerank path (same computation as queries.q_ann_cosine_topk)."""
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"))
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    pairs = (F.broadcast(q).crossJoin(c)
             .filter(F.col("qid") != F.col("nid"))
             .withColumn("cosine", F.round(
                 dot / (norm(F.col("qv")) * norm(F.col("nv"))), round_to)))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "cosine",
                    F.col("rank").cast("long").alias("rank")))
