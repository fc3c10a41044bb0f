"""PII redaction for training corpora — pure Catalyst, zero shuffles.

Standard pre-training scrub (emails, phone numbers, SSNs, credit-card
numbers, IPv4 addresses) as chained ``regexp_replace`` with typed
placeholders, plus per-type match counts for audit/filter decisions.
Reference analog: the reference rewrites/flags packets by field-match
rules (ebpf classifiers); this is the text-payload generalization.

Design constraints:
- every pattern is valid in BOTH Java regex and RE2 (no lookarounds),
  so the DuckDB oracle replays the exact semantics;
- patterns apply IN ORDER and each type's count is taken on the text
  as already redacted by the earlier types — counts always equal the
  number of placeholders actually inserted, even for overlapping
  grammars (an SSN inside an email is the email's, not the SSN's);
- everything is a scalar expression: per-row work, whole-stage
  codegen, no UDF, no shuffle, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (type, pattern) — ORDER MATTERS (earlier wins on overlap)
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact(col: Column | str, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Text with every PII match replaced by its ``<TYPE>`` placeholder
    (applied in pattern order)."""
    out = F.col(col) if isinstance(col, str) else col
    for name, pat in patterns or PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def redaction_counts(
    col: Column | str, patterns: list[tuple[str, str]] | None = None
) -> list[Column]:
    """One ``n_<type>`` count column per pattern — each counted on the
    text AFTER earlier patterns were redacted, so Σ counts == number of
    placeholders in :func:`redact`'s output."""
    cur = F.col(col) if isinstance(col, str) else col
    counts = []
    for name, pat in patterns or PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    return counts


def redact_documents(
    df: DataFrame,
    text_col: str,
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """All original columns, ``text_col`` redacted in place, plus the
    per-type ``n_<type>`` audit counts."""
    keep = [c for c in df.columns if c != text_col]
    return df.select(
        *keep,
        redact(text_col, patterns).alias(text_col),
        *redaction_counts(text_col, patterns),
    )
