"""Vectorized binary parsing — the flagship Arrow-UDF use case.

The reference parses DNS QNAMEs out of raw payload bytes: a sequence of
length-prefixed labels terminated by a zero byte, joined with dots
(internal/utils/converter.go:121-151).  No Catalyst built-in walks a
variable-length byte structure, so this is exactly the case where the
sanctioned Python path (`pandas_udf`, Arrow-batched) earns its keep —
one vectorized call per batch, never per-row Python through the
row serializer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _parse_labels_one(buf: bytes | None, max_len: int = 255) -> str | None:
    """Length-prefixed labels -> dotted name (None if malformed).

    Mirrors the reference's bounds discipline (converter.go:129-148):
    every length byte is validated against the remaining buffer before
    it is read; overrun or missing terminator -> None, never a crash.
    """
    if buf is None:
        return None
    labels = []
    i = 0
    n = len(buf)
    total = 0
    while i < n:
        ln = buf[i]
        if ln == 0:
            return ".".join(labels) if labels else None
        i += 1
        if i + ln > n:
            return None  # length byte overruns the buffer
        total += ln + 1
        if total > max_len:
            return None
        try:
            labels.append(buf[i : i + ln].decode("ascii"))
        except UnicodeDecodeError:
            return None
        i += ln
    return None  # no terminator


@F.pandas_udf(T.StringType())
def parse_label_sequence(payload: pd.Series) -> pd.Series:
    """binary -> dotted label string (DNS-QNAME-style), vectorized."""
    return payload.map(_parse_labels_one)


def encode_label_sequence(col: Column) -> Column:
    """Inverse for tests/fixtures: dotted string -> length-prefixed
    binary, pure Catalyst (concat of per-label length byte + bytes)."""
    labels = F.split(col, r"\.")
    body = F.aggregate(
        labels,
        F.lit(b""),
        lambda acc, lab: F.concat(
            acc, F.encode(F.char(F.length(lab)), "ISO-8859-1"), F.encode(lab, "UTF-8")
        ),
    )
    return F.concat(body, F.lit(b"\x00"))
