"""First-match-wins classification cascades.

The reference's protocol classifiers are ordered rule chains where the
FIRST matching rule decides the label (TCP: allowed-port set checked
before flag bits, internal/monitor/monitor.go:80-106; UDP port
equality :108-119; ARP value rules :121-134; ICMP enum dispatch
:136-151; HTTP prefix rules :165-173; TLS byte-range rules :175-188;
kernel pre-classifiers ebpf/cerberus_tc.c:90-122).  The columnar analog
is an ordered ``F.when(...).when(...).otherwise(...)`` chain — one
expression, whole-stage codegen, zero shuffles — evaluated for all
protocol families at once (the 7-way dispatcher monitor.go:212-259
disappears: a CASE chain routes per-row without branching code).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One arm of a cascade: predicate -> label."""

    predicate: Column
    label: Any


def when_chain(rules: list[Rule], default: Any) -> Column:
    """Ordered first-match-wins CASE expression."""
    expr: Column | None = None
    for r in rules:
        expr = F.when(r.predicate, F.lit(r.label)) if expr is None else expr.when(r.predicate, F.lit(r.label))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))


class Classifier:
    """Composable cascade builder mirroring the reference's classifier
    shapes: ``allowed`` sets, bitmask tests, equality, ranges, prefixes.
    """

    def __init__(self, default: Any):
        self._rules: list[Rule] = []
        self._default = default

    def when(self, predicate: Column, label: Any) -> "Classifier":
        self._rules.append(Rule(predicate, label))
        return self

    def when_in(self, col: Column, values: list[Any], label: Any) -> "Classifier":
        return self.when(col.isin(values), label)

    def when_bit(self, col: Column, mask: int, label: Any, unset_mask: int = 0) -> "Classifier":
        """Bitmask rule: (col & mask) != 0 and (col & unset_mask) == 0
        — the TCP SYN/ACK flag shape (monitor.go:93-103)."""
        pred = (col.bitwiseAND(F.lit(mask)) != 0)
        if unset_mask:
            pred = pred & (col.bitwiseAND(F.lit(unset_mask)) == 0)
        return self.when(pred, label)

    def when_prefix(self, col: Column, prefix: str, label: Any) -> "Classifier":
        return self.when(col.startswith(prefix), label)

    def when_between(self, col: Column, lo: Any, hi: Any, label: Any) -> "Classifier":
        return self.when(col.between(lo, hi), label)

    def column(self) -> Column:
        return when_chain(self._rules, self._default)

    def apply(self, df: DataFrame, out: str = "label") -> DataFrame:
        return df.withColumn(out, self.column())
