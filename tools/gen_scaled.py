"""Generate a LOCAL scaled replica of the driver's synthetic testdata for
optimization measurement ONLY (the driver generates its own data; this
mimics /root/testdata/sf*'s schemas, distributions and single-file-per-
table layout at a larger scale factor so at-scale plan behavior can be
measured in-sandbox).

Usage: python tools/gen_scaled.py OUT_DIR MULT
    MULT scales row counts relative to sf0.1 (MULT=10 ~ the driver's
    sf1.0: 50k docs / 20k embeddings / 1M events / 6M lineitem).

Deterministic (seed 42). NOT used by any gate, bench, or query.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "the", "query", "row", "stream", "sort", "value", "hash", "filter",
    "big", "dup", "column", "order", "a", "vector", "part", "scan",
    "slow", "agg", "key", "window", "table", "merge", "join", "spark",
    "fast", "customer", "batch", "data", "line", "small", "group"])
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
ETYPES = np.array(["click", "view", "purchase", "signup", "error"])
PRIOS = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                  "5-LOW"])
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"])


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(name, table.num_rows)


def gen_documents(rng, n):
    lens = rng.randint(40, 81, size=n)
    texts = [" ".join(rng.choice(VOCAB, size=ln)) for ln in lens]
    # planted structure ~ sf0.1 rates: 0.5% near-dup pairs (copy with a
    # few token mutations), 8-per-5000 exact-dup groups
    n_near = max(1, n // 200)
    srcs = rng.choice(n // 2, size=n_near, replace=False)
    for i, s in enumerate(srcs):
        dst = n // 2 + i
        toks = texts[s].split()
        for _ in range(max(1, len(toks) // 20)):
            toks[rng.randint(len(toks))] = rng.choice(VOCAB)
        texts[dst] = " ".join(toks)
    n_exact = max(1, n * 8 // 5000)
    ex = rng.choice(n // 3, size=n_exact, replace=False)
    for i, s in enumerate(ex):
        texts[n - 1 - i] = texts[s]
    return pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, size=n, p=LANG_P),
        "source": np.array([f"src{i}" for i in rng.randint(0, 20, n)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_embeddings(rng, n, dim=64, k=10):
    # spread sized so ~1% of all pairs clear cosine 0.4 (matches the
    # driver data's ~0.8% neardup-pair density; sigma 0.5 made every
    # same-label pair a near-duplicate and exploded pair counts 1000x)
    centers = rng.randn(k, dim).astype(np.float32) * 2.0
    labels = rng.randint(0, k, n)
    vecs = centers[labels] + rng.randn(n, dim).astype(np.float32) * 3.0
    return pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": labels.astype(np.int32),
    })


def main() -> int:
    out, mult = sys.argv[1], float(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)
    m = lambda base: int(base * mult)  # noqa: E731

    _write(out, "documents", gen_documents(rng, m(5000)))
    _write(out, "embeddings", gen_embeddings(rng, m(2000)))

    n = m(100000)
    ts0 = np.datetime64("2024-01-01T00:00:00")
    _write(out, "events", pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts0 + (rng.randint(0, 30 * 86400, n) * 1000000).astype(
            "timedelta64[us]"),
        "user_id": rng.randint(0, m(1500), n).astype(np.int64),
        "event_type": rng.choice(ETYPES, size=n),
        "value": np.round(rng.exponential(50.0, n), 2),
        "props": np.array([f'{{"k": {v}}}' for v in rng.randint(0, 100, n)]),
    }))

    n_cust = m(15000)
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": np.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": rng.randint(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, size=n_cust),
    }))

    n_ord = m(150000)
    d0 = np.datetime64("1995-01-01")
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.randint(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(np.array(["O", "F", "P"]), size=n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": (d0 + rng.randint(0, 2400, n_ord).astype(
            "timedelta64[D]")).astype("datetime64[us]"),
        "o_orderpriority": rng.choice(PRIOS, size=n_ord),
    }))

    n_part, n_supp = m(20000), m(1000)
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.array([f"part {i}" for i in range(n_part)]),
        "p_brand": np.array([f"Brand#{i % 25}" for i in range(n_part)]),
        "p_type": np.array([f"TYPE {i % 50}" for i in range(n_part)]),
        "p_size": rng.randint(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": np.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": rng.randint(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))

    n_li = m(600000)
    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.randint(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.randint(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.randint(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.randint(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1000, 100000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(np.array(["A", "N", "R"]), size=n_li),
        "l_linestatus": rng.choice(np.array(["O", "F"]), size=n_li),
        "l_shipdate": (d0 + rng.randint(1, 2500, n_li).astype(
            "timedelta64[D]")).astype("datetime64[us]"),
    }))

    _write(out, "nation", pa.table({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": np.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }))
    _write(out, "region", pa.table({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": np.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
