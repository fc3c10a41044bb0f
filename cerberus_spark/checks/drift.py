"""Distribution drift (KL divergence + PSI) against a baseline snapshot.

Determinism rules (SURVEY.md §7 "what's hard"):
- numeric bin edges are FROZEN in the baseline snapshot and reused for
  the current histogram — never re-derived per run;
- smoothing epsilon is fixed so KL/PSI are defined when a bin is empty
  on one side;
- all heavy work (histogramming) is distributed aggregation; only the
  histogram itself (``n_bins`` rows) is joined/reduced — the drift math
  runs as DataFrame expressions, NOT driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-9


def categorical_histogram(df: DataFrame, column: str) -> DataFrame:
    """(bin, count) over category values; nulls binned as '__null__'."""
    return (
        df.select(F.coalesce(F.col(column).cast("string"), F.lit("__null__")).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def numeric_bin_expr(col, edges: list[float]):
    """FROZEN-edge bin index expression: Σ 1[x >= edge_i] over interior
    edges (clamps out-of-range into first/last bin).  NULL in -> NULL
    out.  Shared by numeric_histogram and the single-pass drift."""
    col = col.cast("double")
    steps = None
    for e in edges[1:-1]:
        ind = F.when(col >= F.lit(float(e)), 1).otherwise(0)
        steps = ind if steps is None else steps + ind
    bin_idx = steps if steps is not None else F.lit(0)
    return F.when(col.isNotNull(), bin_idx.cast("int"))


def numeric_histogram(df: DataFrame, column: str, edges: list[float]) -> DataFrame:
    """(bin, count) with FROZEN edges: bin i covers [edges[i], edges[i+1]).

    Values outside the edge range clamp into the first/last bin so
    baseline and current always share a support.  Binning is a single
    ``width_bucket``-style expression — codegen'd, no UDF.
    """
    col = F.col(column).cast("double")
    # bin = Σ 1[x >= edge_i] over interior edges — clamps out-of-range
    # values into the first/last bin by construction
    steps = None
    for e in edges[1:-1]:
        ind = F.when(col >= F.lit(float(e)), 1).otherwise(0)
        steps = ind if steps is None else steps + ind
    bin_idx = steps if steps is not None else F.lit(0)
    return (
        df.filter(col.isNotNull())
        .select(bin_idx.cast("int").alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(F.concat(F.lit("bin_"), F.col("bin_idx").cast("string")).alias("bin"), "count")
    )


def drift_report(
    baseline_hist: DataFrame,
    current_hist: DataFrame,
    column_name: str = "value",
) -> DataFrame:
    """KL(current ‖ baseline) and PSI from two (bin, count) histograms.

    Full outer join on bin (histograms are tiny — broadcast), epsilon
    smoothing, then a single agg:
        kl  = Σ p·ln(p/q)          (p = current, q = baseline)
        psi = Σ (p−q)·ln(p/q)
    """
    b = baseline_hist.groupBy("bin").agg(F.sum("count").alias("b_count"))
    c = current_hist.groupBy("bin").agg(F.sum("count").alias("c_count"))
    joined = b.join(c, on="bin", how="full_outer").fillna(0, subset=["b_count", "c_count"])
    totals = joined.agg(
        F.sum("b_count").alias("bt"), F.sum("c_count").alias("ct")
    )
    j = joined.crossJoin(F.broadcast(totals))
    p = F.col("c_count") / F.col("ct") + F.lit(EPS)
    q = F.col("b_count") / F.col("bt") + F.lit(EPS)
    terms = j.select(
        (p * F.log(p / q)).alias("kl_term"),
        ((p - q) * F.log(p / q)).alias("psi_term"),
    )
    return terms.agg(
        F.sum("kl_term").alias("kl"), F.sum("psi_term").alias("psi")
    ).select(F.lit(column_name).alias("column_name"), "kl", "psi")
