"""LSH banding -> candidate pairs, with mega-bucket skew handling.

Spark-first design: banding is a posexplode, bucketing is a groupBy, pair
generation is a self-equi-join on (band, band_hash) — all Catalyst-planned
shuffles. The skew device the optimizer CANNOT provide (SURVEY.md §4):
boilerplate mega-buckets blow up O(|bucket|^2) pairs, so buckets above
`bucket_cap` switch to windowed neighbor pairing over a simhash ordering
(row_number + bounded-offset self-join) which generates O(|bucket| * w)
pairs and never collects a bucket to one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig


def band_table(signatures: DataFrame) -> DataFrame:
    """signatures -> (file_id, band, band_hash, simhash)."""
    return signatures.select(
        "file_id", "simhash",
        F.posexplode("bands").alias("band", "band_hash"),
    )


def candidate_pairs(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """All LSH candidate pairs (src < dst), mega-buckets capped.

    Returns (src, dst) distinct.
    """
    bands = band_table(signatures)

    sizes = bands.groupBy("band", "band_hash").agg(F.count("*").alias("bsz"))
    bands = bands.join(sizes, ["band", "band_hash"])

    small = bands.filter((F.col("bsz") <= cfg.bucket_cap) & (F.col("bsz") > 1))
    a = small.select("band", "band_hash",
                     F.col("file_id").alias("src"))
    b = small.select("band", "band_hash",
                     F.col("file_id").alias("dst"))
    small_pairs = (
        a.join(b, ["band", "band_hash"])
         .filter(F.col("src") < F.col("dst"))
         .select("src", "dst")
    )

    # mega-buckets: order members by simhash (near-duplicates sort adjacently
    # because close simhashes share high bits), pair each member with its w
    # successors via an equi-join on (bucket, rank+delta) — no collect_list,
    # no quadratic blowup, scales to arbitrarily large buckets.
    big = bands.filter(F.col("bsz") > cfg.bucket_cap)
    w = Window.partitionBy("band", "band_hash").orderBy("simhash", "file_id")
    ranked = big.withColumn("rn", F.row_number().over(w))
    offsets = F.explode(F.sequence(F.lit(1), F.lit(cfg.neighbor_window)))
    probe = ranked.withColumn("delta", offsets).withColumn(
        "rn2", F.col("rn") + F.col("delta"))
    big_pairs = (
        probe.alias("l")
        .join(ranked.alias("r"),
              (F.col("l.band") == F.col("r.band"))
              & (F.col("l.band_hash") == F.col("r.band_hash"))
              & (F.col("l.rn2") == F.col("r.rn")))
        .select(F.least("l.file_id", "r.file_id").alias("src"),
                F.greatest("l.file_id", "r.file_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )

    return small_pairs.unionByName(big_pairs).distinct()
