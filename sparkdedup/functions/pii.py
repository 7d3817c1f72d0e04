"""PII detection + redaction, entirely in WholeStageCodegen.

The standard pre-training curation stage (C4/Dolma/RefinedWeb all scrub
PII before training): detect emails, US-style SSNs, phone numbers, and
IPv4 addresses; count per class and replace each span with a typed
placeholder token. No reference counterpart (datasketches-go has no text
curation surface) — this operator belongs to the LLM-data-pipeline
catalog alongside the quality/repetition filters.

Spark-first design: every pattern runs as `regexp_count` /
`regexp_replace` column expressions — JVM regex inside codegen, zero
Python involvement, so the scan pipelines with any other per-doc
filters in the same stage and shuffles nothing. At 100 TB this is a
pure map stage: no state, no exchange, bounded by scan throughput.

Pattern dialect is the Java-regex / RE2 common subset (no lookaround,
no backrefs) so the DuckDB oracle runs the IDENTICAL patterns —
equality of the redacted text is the gate, not just the counts.
Redaction order is fixed (email, ssn, phone, ip): SSNs would otherwise
partially match the phone pattern, so class order is part of the
operator contract, mirrored in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER MATTERS (see module docstring).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ssn",
     r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
     "[SSN]"),
    # no leading \b: a word boundary never exists between a space and
    # '(' (both non-word), so \b would reject the "(555) 123-4567"
    # form entirely; the trailing \b still stops mid-number suffixes.
    ("phone",
     r"(\+[0-9]{1,2}[ -])?(\([0-9]{3}\)[ -]?|[0-9]{3}[ -])[0-9]{3}[ -][0-9]{4}\b",
     "[PHONE]"),
    ("ip",
     r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
     "[IP]"),
]


def pii_counts(text: Column) -> list[Column]:
    """One unaliased bigint count per PII class (PII_PATTERNS order),
    counted on the RAW text (before any redaction, so classes don't
    shadow each other's counts even though redaction order shadows
    spans)."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("long")
        for _name, pat, _ in PII_PATTERNS
    ]


def pii_redact(text: Column) -> Column:
    """Text with every detected span replaced by its class placeholder,
    applied in PII_PATTERNS order."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, n_email, n_ssn, n_phone, n_ip, n_pii, redacted) per doc."""
    counts = pii_counts(F.col(text_col))
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return docs.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for c, (name, _, _)
          in zip(counts, PII_PATTERNS)],
        total.alias("n_pii"),
        pii_redact(F.col(text_col)).alias("redacted"),
    )
