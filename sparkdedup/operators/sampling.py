"""Sampling operators (reference sampling/reservoir_items_sketch.go).

Reservoir (exact-k uniform without replacement) per group: the classic
distributed formulation is "assign each row a uniform random key, keep the
k smallest per group" — a window rank, identical in distribution to
sequential reservoir sampling, deterministic under a seed.
`estimate_subset_sum` mirrors reservoir_items_sketch.go:202-249.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def reservoir_sample(df: DataFrame, k: int, group_cols: list[str] | None = None,
                     seed: int = 9001, key: Column | None = None) -> DataFrame:
    """Exact-k uniform sample (per group if group_cols given), deterministic.

    Uses xxhash64 of the full row + seed as the uniform key (rand() is not
    reproducible across retries; a hash of row content is). Pass `key` to
    override the rank key — e.g. md5 of a unique id for an oracle that must
    reproduce the sample in another engine."""
    if key is None:
        key = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(key)
    else:
        w = Window.partitionBy(F.lit(1)).orderBy(key)
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def estimate_subset_sum(sample: DataFrame, predicate: Column,
                        population_size: int, sample_size: int) -> DataFrame:
    """Estimate the population count satisfying `predicate` from a uniform
    sample (reference EstimateSubsetSum semantics: count * N/n)."""
    scale = population_size / max(sample_size, 1)
    return sample.agg(
        (F.sum(F.when(predicate, 1).otherwise(0)) * F.lit(scale))
        .alias("estimated_count"),
        F.sum(F.when(predicate, 1).otherwise(0)).alias("sample_count"))
