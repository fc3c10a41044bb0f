"""Exact uniqueness on a natural key at arbitrary scale.

The reference enforces key uniqueness implicitly via map upsert
(internal/monitor/monitor.go:398).  At 10^12 rows the only correct
shape is a shuffle hash-aggregation on the key — partial (map-side)
counts then a final merge; never a collect, never a window over the
whole table.  AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once: (*keys, n_dup).

    One shuffle on ``keys``; map-side partial count keeps shuffle
    volume at |distinct keys|, not |rows|.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def duplicate_rows(df: DataFrame, keys: list[str], order_by: list[str] | None = None) -> DataFrame:
    """Full rows that are duplicates beyond the first occurrence.

    Needs row identity, so it is a window over key-partitions; the
    partition-by keys reuse the same hash shuffle as the count.  With
    ``order_by`` the kept row is deterministic (first in that order).
    """
    from pyspark.sql import Window

    order = order_by or keys
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .drop("_rn")
    )
