"""PII redaction (functions/redact.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cerberus_spark.functions.redact import (
    PII_PATTERNS,
    redact,
    redact_documents,
    redaction_counts,
)

SAMPLES = [
    ("t1", "mail bob.smith+x@corp.example.org now", "mail <EMAIL> now"),
    ("t2", "card 4111 1111 1111 1111 ok", "card <CC> ok"),
    ("t3", "ssn 123-45-6789.", "ssn <SSN>."),
    ("t4", "call 555-867-5309 or 555.867.5309", "call <PHONE> or <PHONE>"),
    ("t5", "host 192.168.0.1:8080", "host <IPV4>:8080"),
    ("t6", "no pii here", "no pii here"),
    # email wins over the SSN-shaped digits inside it (order)
    ("t7", "x 123-45-6789@mail.com y", "x <EMAIL> y"),
]


def test_redact_each_type_and_order(spark):
    df = spark.createDataFrame(SAMPLES, "id string, text string, expected string")
    out = df.select("id", "expected", redact("text").alias("got")).collect()
    for r in out:
        assert r.got == r.expected, r.id


def test_counts_match_placeholders(spark):
    """Σ n_<type> == number of placeholders inserted, per row — the
    counts are taken on the progressively-redacted text."""
    df = spark.createDataFrame(SAMPLES, "id string, text string, expected string")
    out = redact_documents(df.drop("expected"), "text").collect()
    for r in out:
        n_placeholders = sum(
            r.text.count(f"<{name.upper()}>") for name, _ in PII_PATTERNS
        )
        total = sum(r[f"n_{name}"] for name, _ in PII_PATTERNS)
        assert total == n_placeholders, r.id
    byid = {r.id: r for r in out}
    assert byid["t4"].n_phone == 2
    assert byid["t7"].n_email == 1 and byid["t7"].n_ssn == 0


def test_redact_documents_keeps_columns_no_shuffle(spark):
    df = spark.createDataFrame(SAMPLES, "id string, text string, expected string")
    out = redact_documents(df, "text")
    assert set(out.columns) == {"id", "expected", "text"} | {
        f"n_{n}" for n, _ in PII_PATTERNS
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row expressions


def test_custom_patterns(spark):
    df = spark.createDataFrame([("k-123 k-9",)], "text string")
    pats = [("ticket", r"k-\d+")]
    row = df.select(
        redact("text", pats).alias("t"), *redaction_counts("text", pats)
    ).collect()[0]
    assert row.t == "<TICKET> <TICKET>" and row.n_ticket == 2
