"""Per-query isolation bench (guide §1.4): times individual catalog
queries with the SAME session/config as bench.py, but isolated — one cold
pass + N warm repeats per named query — and optionally dumps
.explain("formatted") to a file.  bench.py itself is FROZEN for
measurement; this harness exists for optimization work only.

Usage:
    python bench_extra.py [--sf DIR] [--repeats N] [--plans DIR] q1 q2 ...

Prints one JSON line: {"sf": ..., "queries": {name: {"cold": s,
"warm": [s,...], "rows": n}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>.txt explain output")
    ap.add_argument("--plan-suffix", default="")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from sparkdedup.queries import QUERIES
    from sparkdedup.session import build_session
    spark = build_session(app_name="sparkdedup-bench-extra",
                          master=f"local[{cpus}]", shuffle_partitions=cpus)

    # same warmup protocol as bench.py: codegen JIT + python worker pool
    warm = spark.read.parquet(f"{args.sf}/documents.parquet").limit(64)
    warm.selectExpr("md5(text) h").count()
    warm.mapInPandas(lambda it: it, schema=warm.schema).count()

    out: dict[str, dict] = {}
    for name in args.names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}:cold")
        t0 = time.time()
        n = fn(spark, args.sf).count()
        cold = round(time.time() - t0, 3)
        warms = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(
                f"bench_extra:{name}:warm{i}")
            t0 = time.time()
            fn(spark, args.sf).count()
            warms.append(round(time.time() - t0, 3))
        out[name] = {"cold": cold, "warm": warms, "rows": n}
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(
                    args.plans, f"{name}{args.plan_suffix}.txt"), "w") as f:
                f.write(txt)
    print(json.dumps({"sf": args.sf, "cpus": cpus, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
