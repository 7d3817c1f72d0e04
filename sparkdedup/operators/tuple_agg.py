"""Tuple-sketch aggregate: theta/KMV with per-hash payload summaries.

Reference semantics (tuple/update_sketch.go:36-49, tuple/sketch.go:26-40):
a theta sketch where every retained hash carries a user value, updated on
insert and combined by a Policy on union hash-match
(theta/set_operation.go:36-47). Spark re-expression: the sketch is a pair
of aligned arrays (entries, payloads); the update phase aggregates payloads
per retained hash inside each Arrow batch; the union phase merges partials
with theta'=min + k-trim and applies the policy to colliding hashes.

The canonical use (ArrayOfNumbers / aod sketches) is "distinct keys with a
numeric summary per key, at bounded memory": e.g. estimated distinct users
AND their estimated total spend per group from a k-sized sample.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.functions.murmur3 import murmur3_128_bytes
from sparkdedup.functions.theta import MAX_THETA

U64 = np.uint64

_POLICIES = {
    "sum": np.add,
    "min": np.minimum,
    "max": np.maximum,
}


def _update_batch(groups: pd.Series, keys: pd.Series, payload: np.ndarray,
                  k: int, seed: int, policy: str = "sum"):
    """Partial tuple sketches for EVERY group in one batch, fully
    vectorized: one factorize + one murmur pass over the whole batch, one
    lexsort by (group, hash), run-length payload reduction — per-group
    work is pure slicing (no per-group pandas/hashing; the round-1 version
    was O(groups x per-call overhead)).

    Yields (group_value, entries int64 list, payload list, theta)."""
    kcodes, kuniq = pd.factorize(keys.astype(str))
    h1, _ = murmur3_128_bytes([u.encode("utf-8") for u in kuniq], seed)
    hu_all = (h1 >> U64(1))[kcodes]
    gcodes, guniq = pd.factorize(groups.astype(str))
    keep = hu_all != U64(0)
    h, g, p = hu_all[keep], gcodes[keep], payload[keep]
    order = np.lexsort((h, g))
    hs, gs, ps = h[order], g[order], p[order]
    # combine payload per (group, hash) run — the in-batch update
    # aggregation uses the POLICY ufunc (in-batch key repeats under
    # 'min'/'max' must min/max-combine, not sum — only reachable with
    # pre_aggregate=False, where raw rows hit the kernel)
    new_run = np.r_[True, (gs[1:] != gs[:-1]) | (hs[1:] != hs[:-1])] \
        if len(gs) else np.empty(0, bool)
    run_starts = np.flatnonzero(new_run)
    sums = _POLICIES[policy].reduceat(ps, run_starts) if len(run_starts) \
        else np.empty(0, np.float64)
    uh, ug = hs[run_starts], gs[run_starts]
    g_starts = np.flatnonzero(np.r_[True, ug[1:] != ug[:-1]]) \
        if len(ug) else np.empty(0, np.int64)
    g_ends = np.r_[g_starts[1:], len(ug)] if len(g_starts) else g_starts
    seen = set()
    for s, e in zip(g_starts, g_ends):
        hh, vv = uh[s:e], sums[s:e]  # hash-sorted within the group
        if len(hh) > k:
            theta = int(hh[k])
            hh, vv = hh[:k], vv[:k]
        else:
            theta = MAX_THETA
        seen.add(ug[s])
        yield (guniq[ug[s]], hh.astype(np.int64).tolist(),
               vv.tolist(), theta)
    for gi in range(len(guniq)):  # all-hashes-screened groups (h==0 only)
        if gi not in seen:
            yield (guniq[gi], [], [], MAX_THETA)


def _merge_tuple(parts, k: int, policy: str):
    """Union partial tuple sketches: theta'=min, policy on hash collisions,
    trim to k smallest."""
    op = _POLICIES[policy]
    theta = min(p[2] for p in parts) if parts else MAX_THETA
    all_h = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, U64)
    all_v = np.concatenate([p[1] for p in parts]) if parts else np.empty(0)
    m = all_h < U64(theta)
    all_h, all_v = all_h[m], all_v[m]
    if len(all_h) == 0:
        return all_h, all_v, theta
    order = np.argsort(all_h, kind="stable")
    h, v = all_h[order], all_v[order]
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    uh = h[starts]
    if policy == "sum":
        uv = np.add.reduceat(v, starts)
    elif policy == "min":
        uv = np.minimum.reduceat(v, starts)
    else:
        uv = np.maximum.reduceat(v, starts)
    if len(uh) > k:
        theta = int(uh[k])
        uh, uv = uh[:k], uv[:k]
    return uh, uv, theta


def tuple_sketch_agg(df: DataFrame, group_col: str, key_col: str,
                     payload_col: str, k: int = 256, seed: int = 9001,
                     policy: str = "sum",
                     pre_aggregate: bool = True) -> DataFrame:
    """Per group: estimated distinct keys + estimated payload total over
    the distinct-key population (payload scaled by 1/theta like the count).

    pre_aggregate=True first reduces to one row per (group, key) with the
    policy-combined payload in a JVM hash aggregate (map-side combine) —
    the Python kernel then only hashes DISTINCT keys instead of raw rows,
    which is both faster and the right shape when keys repeat a lot
    (events-per-user etc). Set False for mostly-unique keys where the
    extra shuffle outweighs the combine.

    Output: (group, n_distinct_est double, payload_total_est double,
             n_retained int)."""
    if policy not in _POLICIES:
        raise ValueError(f"unknown policy {policy}")

    if pre_aggregate:
        agg_fn = {"sum": F.sum, "min": F.min, "max": F.max}[policy]
        df = (df.groupBy(group_col, key_col)
              .agg(agg_fn(payload_col).alias(payload_col)))

    partial_schema = (f"{group_col} string, entries array<long>, "
                      "payloads array<double>, theta long")

    def update(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payload = pdf[payload_col].astype(float).to_numpy()
            out = list(_update_batch(pdf[group_col], pdf[key_col],
                                     payload, k, seed, policy))
            yield pd.DataFrame(out, columns=[group_col, "entries",
                                             "payloads", "theta"])

    partials = df.select(group_col, key_col, payload_col).mapInPandas(
        update, schema=partial_schema)

    out_schema = (f"{group_col} string, n_distinct_est double, "
                  "payload_total_est double, n_retained int")

    def union(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [(np.asarray(e, np.int64).view(U64),
                  np.asarray(p, np.float64), int(t))
                 for e, p, t in zip(pdf["entries"], pdf["payloads"],
                                    pdf["theta"])]
        uh, uv, theta = _merge_tuple(parts, k, policy)
        f = theta / float(MAX_THETA)
        return pd.DataFrame({
            group_col: [key[0]],
            "n_distinct_est": [len(uh) / f],
            "payload_total_est": [float(uv.sum()) / f],
            "n_retained": [len(uh)],
        })

    return partials.groupBy(group_col).applyInPandas(union, schema=out_schema)
