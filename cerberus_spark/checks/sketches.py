"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 3.5+): the re-aggregatable answer to count-distinct rollups.

Exact ``count_distinct`` cannot be rolled up (distinct-of-day can't be
summed into distinct-of-month), so warehouse rollups either rescan raw
data or store sketches.  HLL register state merges by taking per-bucket
maxima — associative and order-insensitive — so per-partition partials,
per-day groups, and multi-table unions all combine without rescanning;
this is the reference's periodic-stats report (S12,
internal/monitor/monitor.go:514-584) done the way a 100 TB warehouse
has to.

No DuckDB oracle on purpose: the sketch binary is library-specific.
The proof is the pytest invariant instead — the union of group sketches
yields EXACTLY the same estimate as one direct global sketch (register
merge is deterministic), and the estimate lands within HLL's published
error envelope of the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_sketches(
    df: DataFrame, key_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One HLL sketch (binary) + its estimate per key group.
    ``lgk`` trades memory (2^lgk registers) for accuracy (~1.6%/sqrt(2^lgk/2048))."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
        ).cast("long").alias("estimate"),
    )


def hll_rollup(
    sketches: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """Merge group sketches up a level WITHOUT touching raw data:
    union the binary sketches, re-estimate.  Empty ``key_cols`` -> one
    global row."""
    keys = key_cols or []
    agg = [
        F.hll_union_agg(F.col("sketch")).alias("sketch"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch")))
        .cast("long")
        .alias("estimate"),
    ]
    if keys:
        return sketches.groupBy(*keys).agg(*agg)
    return sketches.agg(*agg)
