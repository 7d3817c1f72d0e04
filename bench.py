"""Benchmark harness: headline queries + the full dedup pipeline.

Runs every catalog query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and the
end-to-end dedup pipeline on a deterministically generated source-file
corpus. Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {...}, "queries_warm": {...}, "probe": {...},
   "sf": ..., "pipeline": {...}}

SELF-NORMALIZING (r3 verdict ask): absolute wall times on this sandbox
swing 3-4x between load epochs (BENCH/BASELINE.md round-3 anchors), so the
JSON now carries everything needed to separate epoch from regression in
one file:
  - probe.cpu_seconds / probe.spark_seconds: two fixed-work probes
    (single-thread numpy+md5 loop; a fixed spark shuffle job), each the
    median of 3, run in the same process right before the suite;
  - probe.cpu_ref_seconds / spark_ref_seconds: the same probes measured
    in the round-4 build epoch — the epoch every recorded number in
    BENCH/BASELINE.md round-4 is quoted in;
  - probe.epoch_factor: cpu_seconds / cpu_ref_seconds — multiply a
    recorded total by this to get its expectation under current load;
  - queries_warm: per-query WARM-STEADY medians (n=SPARK_GRAFT_BENCH_REPEATS
    in-process repeats after the cold pass, default 3) — per-query numbers
    with one-time python-worker/JIT cost excluded.
"value" keeps its r1-r3 meaning exactly (one cold pass over all queries +
the pipeline window); warm repeats run AFTER and are excluded from it.

Scaling-efficiency evidence (north rule; see BENCH/BASELINE.md): run with
SPARK_GRAFT_CPUS=8 and =32 on the same input and compare
pipeline files/sec: efficiency = (throughput_32 / throughput_8) / 4.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# fixed-work probe timings measured in the round-4 build epoch (median of
# 3, idle local[32] sandbox, 2026-08-17) — the denominators of epoch_factor
CPU_PROBE_REF_SECONDS = 0.201
SPARK_PROBE_REF_SECONDS = 0.531
SPARK_PY_PROBE_REF_SECONDS = 0.9292  # local[32], r4 build epoch
# context for readers of the JSON: one probe task is ~0.48s single-core in
# the same epoch, so implied effective cores = 32 * 0.48 / spark_py_seconds
# — 16.4 at calibration time, i.e. this box delivers about HALF its 32
# vCPUs even when otherwise idle. The signature stage (pure parallel
# numpy) scales with effective cores, which is what makes this probe the
# right denominator for pipeline files/sec comparisons across rounds.
# NOTE: the ref (and therefore parallel_epoch_factor) is calibrated at
# the driver's local[32] setting; at other SPARK_GRAFT_CPUS the probe
# value is still recorded but the factor is not like-for-like.


def cpu_probe_once() -> float:
    """Fixed single-thread work: numpy elementwise loop + md5 chain.
    Deliberately avoids BLAS (thread-count-dependent) and I/O."""
    import hashlib

    import numpy as np

    t0 = time.perf_counter()
    x = np.arange(2_000_000, dtype=np.float64)
    for _ in range(20):
        x = np.sqrt(x * 1.0000001 + 1.0)
    h = b"probe"
    for _ in range(200_000):
        h = hashlib.md5(h).digest()
    return time.perf_counter() - t0


def spark_probe_once(spark) -> float:
    """Fixed small shuffle job: captures JVM scheduling + shuffle-lane
    contention that the pure-CPU probe can't see."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (spark.range(2_000_000)
     .groupBy(F.pmod("id", F.lit(1000)).alias("k"))
     .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
     .agg(F.sum("n"), F.sum("s")).collect())
    return time.perf_counter() - t0


def spark_py_probe_once(spark, cpus: int) -> float:
    """Fixed numpy work in EVERY python worker at full parallelism (one
    task per core, identical work each). On uncontended hardware this is
    ~one task's wall time regardless of cpus; when the hypervisor
    time-slices the vCPUs (this box beyond ~8-way — NOTES.md gotcha #1)
    it stretches by the slicing factor. This is the probe that explains
    a slow pipeline/signature stage when the single-thread CPU probe and
    the small shuffle probe both read normal."""
    import numpy as np
    import pandas as pd

    def work(batches):
        for pdf in batches:
            # ~0.35s single-core: large enough that worker/Arrow overhead
            # (~0.3s fixed) doesn't drown the signal
            x = np.arange(1_000_000, dtype=np.float64)
            for _ in range(100):
                x = np.sqrt(x * 1.0000001 + 1.0)
            yield pd.DataFrame({"s": [float(x.sum())]})

    t0 = time.perf_counter()
    (spark.range(cpus).repartition(cpus)
     .mapInPandas(work, schema="s double").count())
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # 4000 files: large enough that fixed per-stage latency (~5s) is a
    # small share of the measured window at local[32] on this time-sliced
    # box; files/s stays comparable across corpus sizes
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "4000"))

    from sparkdedup.config import DedupConfig
    from sparkdedup.fixtures import generate_corpus
    from sparkdedup.pipeline import DedupPipeline
    from sparkdedup.queries import QUERIES
    from sparkdedup.session import build_session

    spark = build_session(
        app_name="sparkdedup-bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus)

    # session warmup excluded from per-query timings: a scan (codegen JIT)
    # and a tiny mapInPandas (spawns the python worker pool — seconds of
    # one-time cost at local[32] that otherwise lands on the first query)
    warm = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(64)
    warm.selectExpr("md5(text) h").count()
    warm.mapInPandas(lambda it: it, schema=warm.schema).count()

    # fixed-work probes (medians of 3) — run warmed, before the suite
    spark_probe_once(spark)
    spark_py_probe_once(spark, cpus)
    cpu_probe = statistics.median(cpu_probe_once() for _ in range(3))
    spark_probe = statistics.median(spark_probe_once(spark) for _ in range(3))
    py_probe = statistics.median(spark_py_probe_once(spark, cpus)
                                 for _ in range(3))
    probe = {
        "cpu_seconds": round(cpu_probe, 4),
        "spark_seconds": round(spark_probe, 4),
        "spark_py_seconds": round(py_probe, 4),
        "cpu_ref_seconds": CPU_PROBE_REF_SECONDS,
        "spark_ref_seconds": SPARK_PROBE_REF_SECONDS,
        "spark_py_ref_seconds": SPARK_PY_PROBE_REF_SECONDS,
        "epoch_factor": (round(cpu_probe / CPU_PROBE_REF_SECONDS, 3)
                         if CPU_PROBE_REF_SECONDS else None),
        "parallel_epoch_factor": (
            round(py_probe / SPARK_PY_PROBE_REF_SECONDS, 3)
            if SPARK_PY_PROBE_REF_SECONDS else None),
    }

    t_all = time.time()
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # end-to-end dedup pipeline throughput on the synthetic file corpus.
    # Stage the corpus through parquet instead of createDataFrame: local
    # collections are embedded in every task binary ("task of very large
    # size" warning) and a single in-memory relation has no scan splits.
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    corpus = generate_corpus(n_files=n_files, seed=42)
    stage_dir = tempfile.mkdtemp(prefix="sparkdedup_bench_corpus_")
    pdf = pd.DataFrame(corpus.files)
    chunk = max(1, -(-len(pdf) // cpus))
    for i in range(0, len(pdf), chunk):
        pq.write_table(pa.Table.from_pandas(pdf.iloc[i:i + chunk]),
                       f"{stage_dir}/part-{i // chunk:05d}.parquet")
    files = spark.read.parquet(stage_dir).cache()
    files.count()
    # warmup: python-worker spawn + JIT on a tiny slice, excluded from the
    # measured window (same protocol as tools/scaling_bench.py) — at
    # local[32] cold worker spawn alone is seconds of fixed overhead
    from sparkdedup.operators.signatures import signature_stage
    signature_stage(files.limit(64), DedupConfig()).count()

    # r4 verdict ask #2: the pipeline leg starts ~90s after the suite-level
    # probes, so a mid-run load burst there was indistinguishable in-file
    # from a code regression. Bracket the pipeline window with its own
    # probes (cpu + full-width python, medians of 3) immediately before AND
    # after, inside the same JSON — a burst shows up as elevated bracket
    # probes; a regression shows normal probes around a slow window.
    def _bracket_probe() -> dict:
        return {
            "cpu_seconds": round(statistics.median(
                cpu_probe_once() for _ in range(3)), 4),
            "spark_py_seconds": round(statistics.median(
                spark_py_probe_once(spark, cpus) for _ in range(3)), 4),
        }

    probe_before = _bracket_probe()
    t0 = time.time()
    pipe = DedupPipeline(spark, DedupConfig(), workdir=None,
                         num_partitions=cpus)
    res = pipe.run(files)
    n_clusters = res.clusters.count()
    pipe_sec = time.time() - t0
    probe_after = _bracket_probe()
    pipeline = {
        "probe_before": probe_before,
        "probe_after": probe_after,
        "n_files": n_files,
        "seconds": round(pipe_sec, 3),
        "files_per_sec": round(n_files / pipe_sec, 2),
        "n_cluster_rows": n_clusters,
        "cpus": cpus,
        "stages": {k: v.get("seconds")
                   for k, v in res.metrics["stages"].items()},
        "cc_seconds": res.metrics.get("cc_seconds"),
    }

    # "value" = cold pass + pipeline, the r1-r3 definition — freeze it
    # BEFORE the warm repeats so the headline stays like-for-like
    total = round(time.time() - t_all, 3)

    warm_medians: dict[str, float] = {}
    if repeats > 0:
        samples: dict[str, list[float]] = {n: [] for n in QUERIES}
        for _ in range(repeats):
            for name, fn in QUERIES.items():
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples[name].append(time.time() - t0)
        warm_medians = {n: round(statistics.median(v), 3)
                        for n, v in samples.items()}

    shutil.rmtree(stage_dir, ignore_errors=True)

    # r5 verdict ask #3: epoch-normalize IN-FILE so cross-round per-query
    # comparisons need no manual acquittal. Normalized = warm /
    # parallel_epoch_factor (the full-width python probe is the right
    # denominator for these python-kernel-dominated queries; for pure-JVM
    # queries it over-corrects slightly — both raw and normalized are
    # kept, raw stays the ground truth).
    pef = probe.get("parallel_epoch_factor") or 1.0
    warm_normalized = {n: round(v / pef, 3) for n, v in warm_medians.items()}
    # pipeline ran inside its OWN probe bracket; normalize by the mean of
    # the before/after full-width probes against the same r4 reference
    bracket = statistics.mean([probe_before["spark_py_seconds"],
                               probe_after["spark_py_seconds"]])
    pipe_factor = round(bracket / SPARK_PY_PROBE_REF_SECONDS, 3)
    pipeline["bracket_epoch_factor"] = pipe_factor
    pipeline["files_per_sec_normalized"] = round(
        pipeline["files_per_sec"] * pipe_factor, 2)

    print(json.dumps({
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm_medians,
        "queries_warm_normalized": warm_normalized,
        "queries_cold_sum": round(sum(timings.values()), 3),
        "queries_warm_sum": round(sum(warm_medians.values()), 3),
        "queries_warm_normalized_sum": round(
            sum(warm_normalized.values()), 3),
        "probe": probe,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "pipeline": pipeline,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
