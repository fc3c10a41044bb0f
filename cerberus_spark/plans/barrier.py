"""Shuffle-free evaluate-once barrier for expensive expressions.

Catalyst's CollapseProject merges stacked projections, inlining a
projected expression into EVERY downstream consumer — so an expensive
non-codegen expression (``from_json`` is CodegenFallback, higher-order
array lambdas are interpreted) consumed by N rule predicates is
evaluated N times per row.  The repo's earlier fix was a
``repartition`` barrier (a real exchange — operators/dedup.py:214);
this is the cheaper tool: a ``Generate`` node (explode of a 1-element
array) is also a projection barrier, but moves NO data.  Downstream
operators reference the generated attribute instead of re-evaluating
the expression.

Measured on the nested-rule contract query (24 inlined ``from_json``
parses per row before): 24 -> 2 parses, ~3x wall.

Scope: Generate stops CollapseProject — N consumers in the SAME
downstream pipeline evaluate the attribute once.  It does NOT provide
cross-branch reuse: when the subtree feeds multiple join/aggregate
branches (e.g. the simhash band self-join, whose input is read by the
hot-bucket agg AND both join sides), keep a ``repartition`` — only an
Exchange node is deduplicated by ReuseExchange across branches
(operators/dedup.py:655 keeps its shuffle for exactly this reason).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def evaluate_once(df: DataFrame, name: str, col: Column) -> DataFrame:
    """``df`` plus ``col`` materialized as real attribute ``name``.

    ``explode(array(col))`` emits exactly one row per input row (the
    single element may be NULL — NULL values ride through, unlike a
    bare ``explode`` of a possibly-empty array), so row multiplicity
    and ordering semantics are unchanged; only the plan shape differs.
    """
    return df.select("*", F.explode(F.array(col)).alias(name))
