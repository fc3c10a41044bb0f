"""Explicit skew handling (north_rule: "skew in hot conv_ids handled by
salted repartitioning").

Hot keys (a conversation with 100x turns, a device generating most
traffic — the reference's single-mutex design simply serializes these,
monitor.go:198-199) would pin one reducer at scale.  Two moves:

1. ``salted_repartition`` — spread rows of the same key over
   ``n_salts`` partitions for key-local but order-free work
   (validation, per-row rules) so no task exceeds ~|rows|/n_salts.
2. ``two_stage_agg`` — aggregate (key, salt) partials first, then merge
   partials per key: the classic associative-agg skew cure.  Spark's
   map-side partial aggregation already does this implicitly for
   built-in aggregates; the explicit form is for agg chains where the
   intermediate (e.g. collect_list) would otherwise concentrate.

AQE skew-join splitting stays enabled as the backstop for joins.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, n_salts: int = 16, partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt) — salt varies per row within a key.

    crc32 of a deterministic per-row discriminator would require one;
    monotonically_increasing_id only affects placement (never results),
    so it is safe and cheap.
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    if partitions:
        out = salted.repartition(partitions, F.col(key), F.col("_salt"))
    else:
        out = salted.repartition(F.col(key), F.col("_salt"))
    return out.drop("_salt")


def two_stage_agg(
    df: DataFrame,
    key: str,
    partial_aggs: Callable[[], list[Column]],
    merge_aggs: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key, salt).agg(partial) -> groupBy(key).agg(merge).

    ``partial_aggs`` and ``merge_aggs`` must form an associative pair
    (e.g. partial count 'pn' -> merge sum('pn')).
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs())
    return partial.groupBy(key).agg(*merge_aggs())
