"""Streaming validation — the same compiled rule predicates applied to
``readStream`` micro-batches.

The reference IS a streaming system (ring-buffer event loop + tickers,
cmd/cerberus/main.go:124-211): its 30s persist tick maps to a
processing-time trigger + ``foreachBatch`` audit write, its
first-occurrence alerting to ``dropDuplicatesWithinWatermark``.  Batch
and stream share the rule compiler verbatim — predicates are plain
Column expressions, legal in both plan modes.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerberus_spark.validation import ValidationSession, VIOLATIONS_COL, PASSED_COL


def validate_stream(
    stream_df: DataFrame,
    schema: dict[str, dict[str, Any]],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Annotated streaming DataFrame (violations array + passed flag).

    ``ValidationSession.validate`` is plan-mode agnostic; this wrapper
    exists to keep a single entry point and to explode violations in
    append mode (safe: stateless projection).
    """
    res = ValidationSession(stream_df.sparkSession).validate(stream_df, schema, key_cols)
    return res.annotated


def streaming_dedup(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-occurrence semantics under bounded state: watermark +
    dropDuplicatesWithinWatermark (state TTL replaces the reference's
    LRU eviction, cmd/cerberus/main.go:32)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stateful_turn_counts(stream_df: DataFrame, key: str = "conv_id") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a running per-conversation turn counter that survives across
    micro-batches (the analog of the reference's per-key DeviceInfo
    state updated per event under the LRU cache,
    internal/monitor/monitor.go:261-297,322-368 — but with exact,
    checkpointable state instead of a lossy LRU).

    Emits (key, n_turns) in update mode after every batch that touches
    the key; the latest emission per key is the running total.  This is
    the template for arbitrary per-key streaming state (rate limits,
    session aggregates, schema-drift counters).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key_tuple, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key: [key_tuple[0]], "n_turns": [n]})

    return stream_df.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=f"{key} string, n_turns long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    src_schema: str,
    transform,
    query_name: str = "out",
) -> DataFrame:
    """Drive a parquet-directory stream to completion synchronously
    (memory sink) — the local smoke harness for streaming semantics."""
    stream = spark.readStream.schema(src_schema).parquet(src_dir)
    out = transform(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
