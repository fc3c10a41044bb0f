"""Per-column profiling: null rates, cardinality, extremes, quantiles.

Analog of the reference's per-device profiling aggregates
(internal/models/types.go:117-140, updates monitor.go:322-368), lifted
to whole-column scope.  Exact distincts use ``count_distinct`` (fine at
test scale); at 10^12 rows callers should pass ``approx=True`` to use
HLL sketches (``approx_count_distinct``) — one pass, mergeable,
bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Long-form profile: one row per column.

    Single aggregation job: all per-column measures are computed in ONE
    ``agg`` (partial aggregation map-side), then unpivoted driver-free
    via a stack of struct literals.
    """
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__rows").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_null"),
            (F.col(f"__nulls_{c}") / F.col("__rows")).alias("null_rate"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in columns
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def numeric_quantiles(df: DataFrame, column: str, probs: list[float]) -> DataFrame:
    """Exact interpolated percentiles (matches SQL ``quantile_cont``).

    Exact ``percentile`` sorts per-group state — fine for bench/oracle
    scale; at 10^12 rows use ``percentile_approx`` (t-digest-style
    mergeable sketch) via ``approx=True`` call sites.
    """
    arr = F.expr(
        f"percentile({column}, array({', '.join(str(p) for p in probs)}))"
    ).alias("qs")
    wide = df.agg(arr)
    pairs = [
        F.struct(F.lit(p).alias("p"), F.col("qs").getItem(i).alias("value"))
        for i, p in enumerate(probs)
    ]
    return wide.select(F.explode(F.array(*pairs)).alias("q")).select(
        F.lit(column).alias("column_name"), "q.p", "q.value"
    )
