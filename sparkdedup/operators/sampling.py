"""Sampling operators (reference sampling/reservoir_items_sketch.go,
reservoir_items_union.go, varopt_items_sketch.go).

Reservoir (exact-k uniform without replacement) per group: the classic
distributed formulation is "assign each row a uniform random key, keep the
k smallest per group" — a window rank, identical in distribution to
sequential reservoir sampling, deterministic under a seed.
`estimate_subset_sum` mirrors reservoir_items_sketch.go:202-249.

VarOpt / reservoir-union share one Spark-first primitive,
`threshold_sample`: find the unique threshold tau with
sum_i min(w_i/tau, 1) = k (the VarOpt H/R split,
varopt_items_sketch.go:94-250), keep every heavy item (w >= tau) exactly,
and draw the light items by SYSTEMATIC sampling in a deterministic
hash order with inclusion probability exactly w_i/tau — a fixed-size
IPPS (inclusion-probability-proportional-to-size) design. This matches
the reference's first-order guarantees (VarOpt: subset-sum unbiasedness
with minimal variance across H+R; reservoir union: "each item from the
global input has a uniform probability of selection, but there are no
claims about higher order statistics", reservoir_items_union.go:36-44)
while being pure window algebra: no per-item RNG state, no sequential
insert loop, and — because it uses only IEEE +,-,*,/ and floor in a
deterministic order — byte-reproducible by any other engine for the
oracle gate. No reference code copied: the Go implementation is a
sequential gadget with rand.Float64 slot replacement; this is a
two-window-pass declarative redesign.
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


def threshold_sample(df: DataFrame, k: int, weight_col: str,
                     order_key: Column, offset: float,
                     group_cols: list[str] | None = None,
                     adj_weight_col: str = "adj_weight") -> DataFrame:
    """Fixed-size IPPS sample of k items per group: VarOpt's H/R split.

    tau solves sum_i min(w_i/tau, 1) = k. Items with w >= tau ("heavy",
    the reference's H region) are kept with their own weight; the rest
    are sampled systematically in `order_key` order with inclusion
    probability exactly w/tau and assigned weight tau (the R region,
    varopt_items_sketch.go:94-250). Groups with <= k items are returned
    whole. Output = input columns + `adj_weight_col`; the Horvitz-
    Thompson estimator sum(adj_weight) over any predicate is unbiased
    for the population subset sum.

    tau derivation (one weight-desc window pass): with weights sorted
    descending, scan positions rn = 1..k; the first rn where
    w_rn <= (S - prefix_{rn-1}) / (k - rn + 1) marks the H/R boundary —
    everything strictly before is heavy and tau is that candidate value.
    (The condition always holds by rn = k, so h <= k-1.)

    Systematic R-draw: lights in hash order, running sum of pi = w/tau;
    item included iff the interval (cum - pi, cum] contains a point
    m + offset for integer m. Sum of pi is exactly k - h, so exactly
    k - h lights are kept; each is included with probability exactly pi
    when offset ~ U(0,1). `offset` and `order_key` are caller-supplied
    so the draw is deterministic and replayable in another engine.
    """
    if not 0.0 <= offset < 1.0:
        raise ValueError(f"offset must be in [0,1), got {offset}")
    pcols = [F.col(c) for c in group_cols] if group_cols else [F.lit(1)]
    wd = Window.partitionBy(*pcols).orderBy(F.col("_w").desc(), order_key)
    wg = Window.partitionBy(*pcols)
    wl = Window.partitionBy(*pcols).orderBy(order_key)

    d = (df.withColumn("_w", F.col(weight_col).cast("double"))
           .withColumn("_rn", F.row_number().over(wd))
           .withColumn("_pre", F.coalesce(
               F.sum("_w").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
               F.lit(0.0)))
           .withColumn("_S", F.sum("_w").over(wg))
           .withColumn("_cnt", F.count("*").over(wg)))
    # divisor only meaningful for rn <= k (cond masks the rest); clamp to
    # keep ANSI mode from throwing DIVIDE_BY_ZERO at rn = k+1
    cand = ((F.col("_S") - F.col("_pre"))
            / F.greatest(F.lit(k) - F.col("_rn") + 1, F.lit(1)))
    cond = (F.col("_rn") <= k) & (F.col("_w") <= cand)
    d = (d.withColumn("_cand", cand)
          .withColumn("_hf", F.min(F.when(cond, F.col("_rn"))).over(wg))
          .withColumn("_tau", F.max(
              F.when(F.col("_rn") == F.col("_hf"), F.col("_cand"))).over(wg)))

    exact = F.col("_cnt") <= k
    heavy = F.col("_rn") < F.col("_hf")
    pi = F.when(exact | heavy, F.lit(0.0)).otherwise(F.col("_w") / F.col("_tau"))
    d = d.withColumn("_pi", pi).withColumn("_cum", F.sum("_pi").over(
        wl.rowsBetween(Window.unboundedPreceding, 0)))
    crossed = (F.floor(F.col("_cum") - offset)
               > F.floor(F.col("_cum") - F.col("_pi") - offset))
    keep = exact | heavy | crossed
    adj = F.when(exact | heavy, F.col("_w")).otherwise(F.col("_tau"))
    out = d.filter(keep).withColumn(adj_weight_col, adj)
    drop = ["_w", "_rn", "_pre", "_S", "_cnt", "_cand", "_hf", "_tau",
            "_pi", "_cum"]
    return out.drop(*drop)


def varopt_sample(df: DataFrame, k: int, weight_col: str,
                  group_cols: list[str] | None = None,
                  order_key: Column | None = None,
                  offset: float = 0.3819660112501051,
                  adj_weight_col: str = "adj_weight") -> DataFrame:
    """VarOpt_k weighted sample (reference sampling/varopt_items_sketch.go):
    heavy items exact, light items IPPS at threshold tau — the variance-
    optimal fixed-size design for subset-sum estimation. Deterministic:
    the R-region draw uses `order_key` (default md5 of the full row) and
    the fixed systematic `offset` instead of RNG state."""
    if order_key is None:
        order_key = F.md5(F.concat_ws("|", *[F.col(c).cast("string")
                                             for c in df.columns]))
    return threshold_sample(df, k, weight_col, order_key, offset,
                            group_cols, adj_weight_col)


def reservoir_union(samples: DataFrame, k: int, n_col: str, k_col: str,
                    group_cols: list[str] | None = None,
                    order_key: Column | None = None,
                    offset: float = 0.3819660112501051) -> DataFrame:
    """Union per-source reservoir samples into one k-sample (reference
    sampling/reservoir_items_union.go:122-253 semantics, Spark-first).

    Each input row is one sampled item tagged with its source reservoir's
    stream length n (`n_col`) and capacity k (`k_col`); its implicit
    weight is max(1, n/k) (exact-mode items weigh 1 — the reference's
    implicitSampleWeight and twoWayMergeInternalStandard/Weighted split).
    Drawing a fixed-size IPPS sample with those weights gives every
    ORIGINAL stream item the same first-order inclusion probability
    regardless of which source reservoir carried it — the exact guarantee
    the reference documents (uniform selection probability, no
    higher-order claims). Output keeps the input columns; the result
    reservoir's logical N is sum of the distinct sources' n."""
    if order_key is None:
        order_key = F.md5(F.concat_ws("|", *[F.col(c).cast("string")
                                             for c in samples.columns]))
    w = F.greatest(F.lit(1.0),
                   F.col(n_col).cast("double") / F.col(k_col).cast("double"))
    d = samples.withColumn("_iw", w)
    out = threshold_sample(d, k, "_iw", order_key, offset, group_cols,
                           adj_weight_col="_adj")
    return out.drop("_iw", "_adj")


def estimate_subset_sum(sample: DataFrame, predicate: Column,
                        population_size: int, sample_size: int) -> DataFrame:
    """Estimate the population count satisfying `predicate` from a uniform
    sample (reference EstimateSubsetSum semantics: count * N/n)."""
    scale = population_size / max(sample_size, 1)
    return sample.agg(
        (F.sum(F.when(predicate, 1).otherwise(0)) * F.lit(scale))
        .alias("estimated_count"),
        F.sum(F.when(predicate, 1).otherwise(0)).alias("sample_count"))
