"""PII detection/redaction gates (functions/pii.py).

The driver-gate row (pii_scrub_docs) exercises the zero-hit path over
the synthetic documents table; THESE tests carry the detection burden
on fixtures containing every PII class, the redaction-order cases, and
Spark<->DuckDB pattern-dialect agreement (the whole point of writing
the patterns in the Java-regex/RE2 common subset).
"""

from __future__ import annotations

import duckdb
import pytest

from sparkdedup.functions.pii import PII_PATTERNS, pii_scrub

DOCS = [
    # (doc_id, text, expected {email, ssn, phone, ip}, expected_redacted)
    (1, "contact bob.smith+x@corp.example.com or sue@a.io today",
     dict(email=2, ssn=0, phone=0, ip=0),
     "contact [EMAIL] or [EMAIL] today"),
    (2, "ssn 123-45-6789 on file",
     dict(email=0, ssn=1, phone=0, ip=0),
     "ssn [SSN] on file"),
    (3, "call (555) 123-4567 or 555-123-4567 or +1 555 123 4567",
     dict(email=0, ssn=0, phone=3, ip=0),
     "call [PHONE] or [PHONE] or [PHONE]"),
    (4, "host 10.0.255.1 and 192.168.1.77 up",
     dict(email=0, ssn=0, phone=0, ip=2),
     "host [IP] and [IP] up"),
    (5, "mixed: a@b.co 111-22-3333 (800) 555-1212 8.8.8.8",
     dict(email=1, ssn=1, phone=1, ip=1),
     "mixed: [EMAIL] [SSN] [PHONE] [IP]"),
    (6, "clean text with no pii at all, id123 and 42 stay",
     dict(email=0, ssn=0, phone=0, ip=0),
     "clean text with no pii at all, id123 and 42 stay"),
    # order dependence: the SSN must be taken by the SSN class, not
    # left for the phone pattern (3-2-4 vs 3-3-4 grouping)
    (7, "999-88-7777 then 999-888-7777",
     dict(email=0, ssn=1, phone=1, ip=0),
     "[SSN] then [PHONE]"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in DOCS], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in pii_scrub(df, "doc_id", "text").collect()}
    return rows


def test_counts_per_class(scrubbed):
    for doc_id, _text, want, _red in DOCS:
        got = scrubbed[doc_id]
        for cls, n in want.items():
            assert got[f"n_{cls}"] == n, (doc_id, cls, got)
        assert got["n_pii"] == sum(want.values())


def test_redacted_text(scrubbed):
    for doc_id, _text, _want, red in DOCS:
        assert scrubbed[doc_id]["redacted"] == red, doc_id


def test_duckdb_dialect_agreement(scrubbed):
    """The identical pattern strings must produce the identical counts
    and redaction in DuckDB (RE2) — this is what licenses the SQL
    oracle for the gate row."""
    con = duckdb.connect()
    for doc_id, text, want, red in DOCS:
        for (name, pat, repl) in PII_PATTERNS:
            (n,) = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()
            assert n == want[name], (doc_id, name, n)
        expr = "?"
        args: list[str] = [text]
        for _name, pat, repl in PII_PATTERNS:
            expr = f"regexp_replace({expr}, ?, ?, 'g')"
            args += [pat, repl]
        (got_red,) = con.execute(f"SELECT {expr}", args).fetchone()
        assert got_red == red, doc_id


def test_plan_stays_in_codegen(spark):
    """No Python UDF, no exchange: the scrub is a single projected scan."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (pii_scrub(df, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
