"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  - flagship: MinHash/LSH near-duplicate detection over the
                documents table at sf0.001 (the engine's core pipeline).
queries()     - one entry per implemented operator family (SURVEY.md §2);
                each callable takes (spark, sf_dir) -> DataFrame.
oracle_sql()  - matching DuckDB SQL where ANSI-expressible; murmur3/HLL
                based ops are rows-only by design (noted in queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sparkdedup.queries import QUERIES

    return QUERIES["minhash_lsh_docs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparkdedup.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sparkdedup.queries import ORACLES

    return dict(ORACLES)
