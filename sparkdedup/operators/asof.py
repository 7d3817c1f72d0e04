"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key — an operator Spark lacks natively.

Spark-first formulation (no applyInPandas needed): tag both sides, UNION
them into one stream, sort within each key by (ts, side-order), and carry
the last seen right-side payload forward with a window `last(..., ignore-
nulls)` — one shuffle on the key, no per-group pandas, scales to any key
cardinality and never materializes a group in memory. (The pd.merge_asof
route needs whole groups in one pandas frame; this does not.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              value_cols: list[str], suffix: str = "_right") -> DataFrame:
    """left columns + (value_cols from the latest right row with
    right.on <= left.on and right.by == left.by); nulls when none exists.

    `on`: ordering column (timestamp); `by`: equi-key column.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        by, on, *[F.col(c).alias(c + suffix) for c in value_cols]
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (by, on) and c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in r.columns:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    u = l.select(sorted(l.columns)).unionByName(r.select(sorted(r.columns)))

    # right rows order BEFORE left rows at equal ts (<= semantics)
    w = (Window.partitionBy(by)
         .orderBy(F.col(on).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = [F.last(F.col(c + suffix), ignorenulls=True).over(w)
               .alias(c + suffix) for c in value_cols]
    out = u.select(*lcols, F.col("_side"), *carried).filter(F.col("_side") == 1)
    return out.drop("_side")
