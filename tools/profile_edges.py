"""Decompose the pipeline's `edges` stage into separately-forced substeps.

The 256k scale step (BENCH/scaling_r6_256k.json) localized ~113s of
effectively-serial work inside the edges bracket (174.2s at N=1 ->
128.4s at 4N, per-stage efficiency 0.34 while signatures reads 0.87).
This tool replays stage 2+3 of DedupPipeline.run from a CHECKPOINTED
signatures table — identical dataflow, but each substep forced by its
own action so per-substep walls at two parallelism levels localize the
serial term. Forcing substeps separately inserts localCheckpoint
materializations the fused stage doesn't have, so the SUM may differ
slightly from the in-pipeline bracket; the per-substep RATIO between
parallelism levels is the signal.

Usage:
    python tools/profile_edges.py <cpus> <signatures_dir> <files_parquet>
Prints one `PROF_JSON: {...}` line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cpus = int(sys.argv[1])
    sig_dir = sys.argv[2]
    files_path = sys.argv[3]

    from pyspark.sql import functions as F

    from sparkdedup.config import DedupConfig
    from sparkdedup.operators.containment import (
        anchor_containment_candidates, verify_containment)
    from sparkdedup.operators.lsh import candidate_pairs
    from sparkdedup.operators.verify import verify_candidates
    from sparkdedup.session import build_session

    spark = build_session(app_name=f"profile-edges-{cpus}",
                          master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    cfg = DedupConfig()
    sigs = spark.read.parquet(sig_dir)
    files = spark.read.parquet(files_path)

    T: dict[str, float] = {}

    def tick(name, fn):
        t0 = time.time()
        r = fn()
        T[name] = round(time.time() - t0, 2)
        print(f"{name}: {T[name]}s", flush=True)
        return r

    # stage 2 replica (paid in the containment bracket in-pipeline,
    # via the cont_cand localCheckpoint being the first rep_sigs touch)
    reps = sigs.groupBy("sha").agg(F.min("file_id").alias("rep"),
                                   F.count("*").alias("copies"))
    exact_edges = (
        sigs.join(reps, "sha")
        .filter(F.col("file_id") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("file_id").alias("dst")))
    rep_sigs = sigs.join(
        reps.select(F.col("rep").alias("file_id")), "file_id",
        "left_semi").cache()
    tick("rep_sigs_materialize", rep_sigs.count)

    cont_cand = tick(
        "containment_candidates",
        lambda: anchor_containment_candidates(rep_sigs, cfg)
        .localCheckpoint())

    cands = tick("lsh_candidate_pairs",
                 lambda: candidate_pairs(rep_sigs, cfg).localCheckpoint())
    near = tick(
        "verify_near",
        lambda: verify_candidates(cands, rep_sigs, cfg)
        .withColumn("source", F.lit("lsh")).localCheckpoint())

    cand_ids = (cont_cand.select(F.col("src").alias("file_id"))
                .unionByName(cont_cand.select(F.col("dst").alias("file_id")))
                .distinct())
    sig_keys = (sigs.join(cand_ids, "file_id", "left_semi")
                .select("file_id", "repo", "path", "commit"))
    fid_content = (files.join(F.broadcast(sig_keys),
                              ["repo", "path", "commit"])
                   .select("file_id", "content"))
    cont = tick(
        "verify_containment",
        lambda: verify_containment(cont_cand, fid_content, cfg)
        .localCheckpoint())

    exact_e = exact_edges.select(
        "src", "dst", F.lit(1.0).alias("jaccard"),
        F.lit(1.0).alias("jaccard_lb"), F.lit(1.0).alias("jaccard_ub"),
        F.lit(1.0).alias("minhash_jaccard"),
        F.lit(0).cast("int").alias("hamming"), F.lit("sha").alias("source"))
    cont_e = cont.select(
        "src", "dst", F.lit(None).cast("double").alias("jaccard"),
        F.lit(None).cast("double").alias("jaccard_lb"),
        F.lit(None).cast("double").alias("jaccard_ub"),
        F.lit(None).cast("double").alias("minhash_jaccard"),
        F.lit(None).cast("int").alias("hamming"),
        F.lit("containment").alias("source"))
    edges = near.unionByName(exact_e).unionByName(cont_e)
    out = tempfile.mkdtemp(prefix=f"profile_edges_{cpus}_")
    tick("edges_checkpoint_write",
         lambda: edges.write.mode("overwrite").parquet(f"{out}/edges"))

    T["_edge_rows"] = spark.read.parquet(f"{out}/edges").count()
    print("PROF_JSON: " + json.dumps({"cpus": cpus, **T}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
