"""Iterative hash-join connected components (min-label propagation).

Relational formulation of the reference's union-merge seam generalized to a
graph closure: each iteration is (a) a neighbor-min step — edges ⋈ labels,
groupBy node, min — and (b) a pointer-jump step — labels ⋈ labels on
label == file_id — which together converge in O(log diameter) rounds.
Every iteration localCheckpoints to truncate lineage (Catalyst never does
this for you — SURVEY.md §4), and the join keys are plain longs so AQE's
skew-join splitting handles mega-cluster label skew; for the final
assignment we additionally salt the hot-label aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig


def release_local_checkpoint(df: DataFrame) -> None:
    """Release a superseded localCheckpoint's storage blocks NOW.

    The JVM holds checkpointed RDDs strongly (they survive GC for the
    session's lifetime — r6 verdict nit #1 generalized), so iterative
    operators must drop their superseded rounds explicitly or a long
    session accumulates one block set per iteration per run. Only call
    once nothing will read the DataFrame again: a localCheckpoint has no
    lineage to recompute from."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        plan.rdd().unpersist(False)
    except Exception:
        pass  # not a bare LogicalRDD (not checkpoint-backed) — nothing to do


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    cfg: DedupConfig,
    checkpoint: bool = True,
) -> tuple[DataFrame, int]:
    """edges(src, dst) + nodes(file_id) -> clusters(file_id, cluster_id).

    cluster_id is the minimum file_id in the component. Returns
    (clusters_df, iterations).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        # r7: partition the static edge table by the per-round join key
        # ONCE, before the checkpoint pins it. The checkpointed RDD keeps
        # this partitioning, so every iteration's edges-side exchange
        # drops out of the round loop — at scale that is the largest
        # per-round shuffle (edges >> labels).
        .repartition("b")
    )
    if checkpoint:
        # eager=False everywhere in this operator: the next action that
        # touches the frame materializes the checkpoint as part of its own
        # job, so each round costs ONE blocking job (the convergence sum)
        # instead of two (checkpoint job + sum job) — pure driver-latency
        # removal, the per-round dataflow is unchanged
        sym = sym.localCheckpoint(eager=False)

    # Iterate ONLY over edge-touched nodes: a node with no edges keeps
    # label == file_id at every step (neighbor-min finds no neighbor,
    # pointer-jump follows the identity), so singletons — the vast
    # majority of a dedup corpus — pay zero iteration cost. They rejoin
    # via one left join at the end. At 64k files / 10.5k edges this
    # shrinks every per-iteration join, groupBy, checkpoint, and
    # convergence scan ~4x; at 10^12 files with a few-percent dup rate
    # it is the difference between iterating over 10^12 and 10^10 rows.
    touched = sym.select(F.col("a").alias("file_id")).distinct()
    labels = touched.select(F.col("file_id"), F.col("file_id").alias("label"))
    if checkpoint:
        labels = labels.localCheckpoint(eager=False)
    # computing the initial sum NOW also materializes the labels (and sym)
    # checkpoints in the same job
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).first()["s"]

    for it in range(1, cfg.max_cc_iters + 1):
        # neighbor-min: smallest label among self + neighbors, as ONE
        # union + aggregate — the join emits (a, neighbor label) rows,
        # the labels branch contributes every node's own label, and a
        # single groupBy(a) min covers both the no-neighbor case (old
        # left-join + coalesce) and the neighbor min (old two-phase agg).
        # r7: the former salted (a, salt) pre-aggregation is gone — min
        # is a partial-aggregating HashAggregate, so the reduce side of
        # the exchange receives at most one row per key PER MAP TASK
        # regardless of how many rows share the key; the salt bounded
        # exactly the same quantity a second time and cost one extra
        # exchange + aggregate every round. Join-side skew (a hot label
        # or a high-degree node) stays with AQE's skew-join splitting.
        updated = (
            sym.join(labels.withColumnRenamed("file_id", "b"), "b")
            .select("a", "label")
            .unionByName(labels.select(F.col("file_id").alias("a"), "label"))
            .groupBy("a").agg(F.min("label").alias("label"))
            .withColumnRenamed("a", "file_id")
        )
        # pointer jump: label <- label(label) (path halving)
        jump = (
            updated.alias("l")
            .join(updated.select(F.col("file_id").alias("label"),
                                 F.col("label").alias("parent")).alias("p"),
                  "label", "left")
            .select(F.col("file_id"),
                    F.least("label", F.coalesce("parent", "label")).alias("label"))
        )
        if checkpoint:
            jump = jump.localCheckpoint(eager=False)
        # convergence: per-node labels are monotonically non-increasing
        # (every step takes least(...)), so the label-sum strictly
        # decreases until the fixpoint — one narrow aggregate per round
        # instead of a self-join compare; this action also materializes
        # the round's lazy checkpoint
        new_sum = jump.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        # the .first() above materialized this round's checkpoint, so the
        # previous round's blocks (and the initial labels') are now
        # unreachable by any future plan — release them instead of letting
        # them pile up one block set per iteration for the session's life
        if checkpoint:
            release_local_checkpoint(labels)
        labels = jump
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        it = cfg.max_cc_iters
    out = _with_singletons(nodes, labels), it
    if checkpoint:
        release_local_checkpoint(sym)
    return out


def cluster_representatives(
    clusters: DataFrame,
    attrs: DataFrame,
    id_col: str = "file_id",
    cluster_col: str = "cluster_id",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Pick one representative per cluster from a MATERIALIZED clusters
    table: the member with max `size_col`, ties broken by min id.
    Returns (id_col, cluster_col, is_rep).

    This is the production shape of the `cluster_rep_docs` gate query
    (which must recompute its closure inline to stay self-contained): one
    hash join against the attribute table, then the argmax as TWO
    partial-aggregated aggregations and a join back — no cluster-wide
    window, so a 10^8-member boilerplate mega-cluster partial-aggregates
    map-side instead of gathering into a single task.
    """
    j = clusters.select(id_col, cluster_col).join(
        attrs.select(id_col, size_col), id_col)
    best = j.groupBy(cluster_col).agg(F.max(size_col).alias("_mx"))
    rep = (j.join(best, cluster_col)
             .filter(F.col(size_col) == F.col("_mx"))
             .groupBy(cluster_col).agg(F.min(id_col).alias("_rep")))
    return (j.join(rep, cluster_col)
             .select(id_col, cluster_col,
                     (F.col(id_col) == F.col("_rep")).alias("is_rep")))


def _with_singletons(nodes: DataFrame, labels: DataFrame) -> DataFrame:
    """Re-attach edge-less nodes (their own cluster) to the converged
    labels of the edge-touched subgraph."""
    return (
        nodes.select("file_id")
        .join(labels, "file_id", "left")
        .select("file_id",
                F.coalesce("label", "file_id").alias("cluster_id"))
    )
