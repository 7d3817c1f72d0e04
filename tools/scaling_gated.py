"""Load-gated pre-declared scaling triple (the round-5 protocol, as a
committed, auditable runner).

Protocol (DECLARED BEFORE RUNNING, identical to BENCH/BASELINE.md's
fifth round-5 triple): three trials of the identical pipeline job on the
identical pre-generated corpus at local[N] then local[4N]; each trial
STARTS only once the 1-minute load average reads <= --gate (default
0.60), polled every 60s, with a --gate-timeout (default 30 min) after
which the trial runs anyway and is flagged load_gate_expired. The gate
controls ONLY the start time — nothing is re-run, discarded, or selected
after a trial starts; the MEDIAN of the three efficiencies is the quoted
number regardless of outcome.

Usage:
    python tools/scaling_gated.py --input /path/to/files.parquet \
        --files 64000 [--n 1] [--trials 3] [--out BENCH/scaling_gated.json]

Generate the corpus once with tools/scaling_bench.py (or pass --generate
here) so all trials share bytes-identical input.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# each leg runs in a FRESH subprocess (clean JVM): same-process
# SparkContext stop/start reused a degraded py4j JVM at the 256k scale
# (see run_at_subprocess docstring / BENCH/scaling_r6_256k trial 1)
from tools.scaling_bench import (  # noqa: E402
    calibrate_vcpu_throughput, run_at_subprocess)


def _steal_probe_once() -> float:
    """1-way run of the cache-resident probe: measures per-core speed
    including hypervisor steal, which loadavg cannot see (triple-6
    lesson: gate passed at load 0.39 while this probe read 0.41s vs the
    0.20s calibration — per-core throughput was HALVED by neighbors)."""
    t0 = time.time()
    _probe_cpu_work_local(0)
    return time.time() - t0


def _probe_cpu_work_local(_):
    import numpy as np

    x = np.arange(65536, dtype=np.uint64)
    for _ in range(2000):
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
    return int(x[0])


def wait_for_quiet(gate: float, timeout_min: float,
                   steal_gate: float | None = None
                   ) -> tuple[float, float, float, bool]:
    """Poll every 60s until 1-min loadavg <= gate AND (if steal_gate)
    the 1-way cpu probe <= steal_gate seconds, or timeout.

    Returns (wait_minutes, load_at_start, probe_at_start, expired)."""
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        probe = _steal_probe_once() if steal_gate is not None else -1.0
        waited = (time.time() - t0) / 60.0
        ok = load <= gate and (steal_gate is None or probe <= steal_gate)
        if ok:
            return round(waited, 1), round(load, 2), round(probe, 3), False
        if waited >= timeout_min:
            return round(waited, 1), round(load, 2), round(probe, 3), True
        print(f"gate: 1-min load {load:.2f} (<= {gate}?) probe {probe:.3f}s"
              f" (<= {steal_gate}?) — waited {waited:.0f} min", flush=True)
        time.sleep(60)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False, default=None)
    ap.add_argument("--files", type=int, default=64000)
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--gate", type=float, default=0.60)
    ap.add_argument("--gate-timeout", type=float, default=30.0)
    ap.add_argument("--steal-gate", type=float, default=None,
                    help="also require the 1-way cpu probe <= this many "
                         "seconds (steal-aware gate; calibration ~0.20s)")
    ap.add_argument("--per-leg", action="store_true",
                    help="apply the gate before EACH leg, not just the "
                         "trial start (a mid-trial burst still lands "
                         "inside a leg; this only narrows the window)")
    ap.add_argument("--generate", action="store_true",
                    help="generate the corpus here (seed 42) if no --input")
    ap.add_argument("--out", default="BENCH/scaling_gated.json")
    ap.add_argument("--shuffle-mult", type=int, default=1)
    ap.add_argument("--part-mult", type=int, default=2)
    args = ap.parse_args()

    input_path = args.input
    tmp = tempfile.mkdtemp(prefix="scaling_gated_")
    if input_path is None:
        if not args.generate:
            ap.error("--input or --generate required")
        from sparkdedup.fixtures import generate_corpus

        import pyarrow as pa
        import pyarrow.parquet as pq

        print(f"generating {args.files} files ...", flush=True)
        corpus = generate_corpus(n_files=args.files, seed=42,
                                 min_lines=20, max_lines=400)
        input_path = f"{tmp}/files"
        os.makedirs(input_path, exist_ok=True)
        chunk = max(1, -(-len(corpus.files) // 64))
        for i in range(0, len(corpus.files), chunk):
            pq.write_table(
                pa.Table.from_pandas(corpus.files.iloc[i:i + chunk]),
                f"{input_path}/part-{i // chunk:05d}.parquet")
        del corpus

    report = {}
    effs = []
    for t in range(1, args.trials + 1):
        wait_min, load0, probe0, expired = wait_for_quiet(
            args.gate, args.gate_timeout, args.steal_gate)
        probe = calibrate_vcpu_throughput()
        runs = []
        leg_gates = []
        for cpus in (args.n, 4 * args.n):
            if args.per_leg and runs:
                leg_gates.append(wait_for_quiet(
                    args.gate, args.gate_timeout, args.steal_gate))
            print(f"trial {t}: running at local[{cpus}] ...", flush=True)
            runs.append(run_at_subprocess(cpus, input_path, args.files,
                               f"{tmp}/t{t}", args.shuffle_mult,
                               args.part_mult))
            print(json.dumps(runs[-1]), flush=True)
        eff = round((runs[1]["files_per_sec"] / runs[0]["files_per_sec"])
                    / 4.0, 3)
        effs.append(eff)
        report[f"trial_{t}"] = {
            "n_files": args.files,
            "N": args.n,
            "vcpu_probe_sec_by_concurrency": probe,
            "runs": runs,
            "scaling_efficiency_N_to_4N": eff,
            "loadavg_at_start": load0,
            "steal_probe_at_start": probe0,
            "gate_wait_min": wait_min,
            "load_gate_expired": expired,
            "leg_gates": leg_gates,
        }
        Path(args.out).write_text(json.dumps(report, indent=1))
        print(f"trial {t}: efficiency {eff} (load {load0}, "
              f"waited {wait_min} min)", flush=True)

    report["median_efficiency"] = round(statistics.median(effs), 3)
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"MEDIAN of {len(effs)} trials: {report['median_efficiency']} "
          f"(all: {effs})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
