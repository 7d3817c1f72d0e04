"""Substring-containment pass: KMV inverted-index candidates + exact verify.

A file A pasted verbatim inside a larger file B shares ALL of A's shingles,
so A's k-minimum shingle hashes appear in B's shingle set, and in
expectation k·|A|/|B| of them land inside B's own k-minimum signature.
Candidate generation is therefore an inverted-index self-join on individual
KMV hash values (explode -> join -> pair-count >= min_shared), with hot
hashes (boilerplate shingles, huge posting lists) dropped by a posting cap —
that is the skew guard, same reasoning as LSH bucket caps.

Verification is exact: join contents and check substring containment
JVM-side (F.instr) — zero false positives, which makes this pass's output
the ground truth for `contained` pairs at any scale. An optional deeper
LCS verifier (suffix-array based, sparkdedup/functions/suffix.py) runs in
applyInPandas per candidate when exact whole-file containment fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig


def containment_candidates(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(src, dst, shared) pairs sharing >= min_shared KMV hash values.

    src/dst ordered by n_shingles (src = smaller file = containee).
    """
    inv = signatures.select(
        "file_id", "n_shingles", F.explode("kmv").alias("h"))
    hot = inv.groupBy("h").agg(F.count("*").alias("plen"))
    inv = inv.join(hot, "h").filter(F.col("plen") <= cfg.containment_posting_cap)

    a = inv.select(F.col("h"), F.col("file_id").alias("fa"),
                   F.col("n_shingles").alias("na"))
    b = inv.select(F.col("h"), F.col("file_id").alias("fb"),
                   F.col("n_shingles").alias("nb"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("fa") < F.col("fb"))
        .groupBy("fa", "fb", "na", "nb")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= cfg.containment_min_shared)
    )
    # containee = the side with fewer shingles
    return pairs.select(
        F.when(F.col("na") <= F.col("nb"), F.col("fa")).otherwise(F.col("fb")).alias("src"),
        F.when(F.col("na") <= F.col("nb"), F.col("fb")).otherwise(F.col("fa")).alias("dst"),
        "shared",
    )


def verify_containment(candidates: DataFrame, files_with_id: DataFrame,
                       cfg: DedupConfig) -> DataFrame:
    """Exact substring check: content(src) inside content(dst).

    files_with_id: (file_id, content). Returns (src, dst, shared) edges
    where dst's content contains src's content verbatim.
    """
    ca = files_with_id.select(F.col("file_id").alias("src"),
                              F.col("content").alias("content_a"))
    cb = files_with_id.select(F.col("file_id").alias("dst"),
                              F.col("content").alias("content_b"))
    return (
        candidates.join(ca, "src").join(cb, "dst")
        .filter(F.instr(F.col("content_b"), F.col("content_a")) > 0)
        .select("src", "dst", "shared")
    )
