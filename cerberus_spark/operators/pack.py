"""Sequence packing: group documents into fixed-token-budget packs for
LLM training-batch assembly.

True greedy bin packing is inherently sequential (each decision depends
on the previous pack's fill), so it cannot distribute.  The standard
scale formulation is contiguous-fill packing inside hash buckets:

  1. bucket = md5(doc_id) % n_buckets   — embarrassingly parallel
  2. within a bucket, order docs deterministically (doc id)
  3. running exclusive token sum -> pack_id = floor(cum / budget)

One shuffle on bucket + one partition-local sort.  A document whose
tokens straddle a boundary goes WHOLLY to the pack where it starts, so
a pack can overflow the budget by at most max_doc_tokens − 1 (callers
that need a hard cap pre-split long documents).  Deterministic and
engine-portable — the DuckDB oracle reproduces pack ids exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cerberus_spark.operators.dedup import md5_i64


def pack_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign (bucket, pack_id) to every document.

    Output: input columns + ``bucket``, ``pack_id``, ``n_tokens``.
    ``tokens_col`` may be a column name or an expression (e.g. a token
    counter over the text column).

    ``n_buckets`` sizes the window partitions: each bucket is
    |corpus|/n_buckets rows sorted in ONE task.  The default scales
    with the cluster — ``max(64, defaultParallelism * 4)`` — so a job
    that moves from local[32] to 1,000 executors does not silently sort
    |corpus|/64 rows per task; pass it explicitly to pin pack layout
    across cluster sizes (the ids are deterministic for a GIVEN
    n_buckets, and change when it changes).
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    if n_buckets is None:
        n_buckets = max(64, df.sparkSession.sparkContext.defaultParallelism * 4)
    base = df.withColumn("n_tokens", tokens.cast("long")).withColumn(
        "bucket", F.pmod(md5_i64(F.col(id_col).cast("string")), F.lit(n_buckets))
    )
    # exclusive running sum expressed as inclusive-minus-current: the
    # inclusive ROWS UNBOUNDED PRECEDING frame is the only window-frame
    # construct the cross-engine gate exercises elsewhere (trim_budget),
    # so both engines run one proven code path — the equivalent
    # `UNBOUNDED PRECEDING AND 1 PRECEDING` frame + COALESCE is exactly
    # the kind of per-engine corner this pair once hash-mismatched on
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.withColumn(
        "pack_id", F.floor(cum_excl / F.lit(budget)).cast("long")
    )


def trim_to_budget(
    df: DataFrame,
    conv_col: str,
    order_cols: list[str],
    tokens_col: str | Column,
    budget: int,
    keep: str = "head",
) -> DataFrame:
    """Keep, per conversation, the longest whole-turn prefix
    (``keep="head"``) or suffix (``keep="tail"`` — the recent-context
    window an LLM pipeline actually feeds) whose cumulative token count
    fits ``budget``.  Turns are never split; a single over-budget turn
    is dropped.

    Output: input columns + ``n_tokens`` + ``cum_tokens`` (cumulative
    in the KEPT direction — for ``tail`` that counts from the last
    turn backwards).

    Scale shape: ONE shuffle keyed on ``conv_col`` (the window
    partition); per-task state is one conversation's turns, never the
    table.  ``order_cols`` must totally order turns within a
    conversation (repo ordering invariant) or the boundary turn is
    nondeterministic.
    """
    if keep not in ("head", "tail"):
        raise ValueError(f"keep must be 'head' or 'tail', got {keep!r}")
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    order = [
        F.col(c).asc() if keep == "head" else F.col(c).desc() for c in order_cols
    ]
    w = (
        Window.partitionBy(conv_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("n_tokens", tokens.cast("long")).withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    return out.filter(F.col("cum_tokens") <= F.lit(int(budget)))
