"""SimHash near-duplicate index: exact Hamming-distance pair search.

Pigeonhole construction: split the 64-bit simhash into P pieces; any pair
with Hamming distance <= P-1 shares at least one piece verbatim, so an
equi-join per piece enumerates a candidate superset, and a cheap popcount
filter makes the result EXACT (no recall loss, unlike banding). P=4 pieces
of 16 bits covers d <= 3; P=8 covers d <= 7. Shuffle cost is P rows per
document joined on 16-bit-piece keys — hot pieces (e.g. all-zeros from
short docs) are capped like LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3,
                       id_col: str = "file_id", sim_col: str = "simhash",
                       piece_cap: int = 10_000) -> DataFrame:
    """(src, dst, hamming) for all pairs with hamming <= max_hamming.

    Exact for max_hamming <= n_pieces - 1 (pigeonhole). sigs needs
    (id_col, sim_col:long).
    """
    # exactly max_hamming+1 pieces, widths as even as 64 allows (they need
    # NOT be equal for the pigeonhole argument — only disjoint and
    # covering).  The old fallback to the next divisor of 64 made d=4 use
    # EIGHT 8-bit pieces: 256 bucket values per piece meant ~n^2/256
    # candidate pairs per piece.  Five 13/13/13/13/12-bit pieces give
    # 8192 values — ~32x fewer join collisions for the same exact result
    # (the popcount filter already guarantees exactness either way).
    n_pieces = max_hamming + 1
    base, extra = divmod(64, n_pieces)
    widths = [base + (1 if i < extra else 0) for i in range(n_pieces)]
    offs = [sum(widths[:i]) for i in range(n_pieces)]
    slices = ", ".join(
        f"(shiftrightunsigned({sim_col}, {offs[i]}) "
        f"& CAST({(1 << widths[i]) - 1} AS BIGINT))"
        for i in range(n_pieces))

    pieces = sigs.select(
        F.col(id_col).alias("id"), F.col(sim_col).alias("sh"),
        F.posexplode(F.expr(f"array({slices})")).alias("piece", "pval"))

    sizes = pieces.groupBy("piece", "pval").agg(F.count("*").alias("psz"))
    pieces = pieces.join(sizes, ["piece", "pval"]).filter(
        F.col("psz") <= piece_cap)

    a = pieces.select("piece", "pval", F.col("id").alias("src"),
                      F.col("sh").alias("sh_a"))
    b = pieces.select("piece", "pval", F.col("id").alias("dst"),
                      F.col("sh").alias("sh_b"))
    cand = (a.join(b, ["piece", "pval"])
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst", "sh_a", "sh_b").distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("src", "dst", "hamming"))
