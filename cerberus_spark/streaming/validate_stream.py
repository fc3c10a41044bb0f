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


def stateful_sequence_check(
    stream_df: DataFrame,
    allowed: set[tuple[str, str]],
    allowed_first: set[str] | None = None,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    state_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``checks.sequence.sequence_violations``:
    per-conversation transition-grammar + first-state + ts-monotonicity
    checks with the (last_state, last_ts) carried across micro-batches
    in ``applyInPandasWithState`` — so a violation spanning a batch
    boundary (turn 7 arrives a batch after turn 6) is still caught,
    which a stateless per-batch window cannot do.

    Rows within a batch are sorted by (idx, ts) before the walk;
    across batches the stream is assumed append-ordered per
    conversation (the transcript-ingest shape).  State is three scalars
    per live conversation — bounded, checkpointable.  Emits
    (conv, turn_idx, state, prev_state, rule) in update mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    first = sorted(allowed_first) if allowed_first is not None else None
    allow = {a + "\x1f" + b for a, b in allowed}

    def update(key_tuple, pdfs, state: GroupState):
        if state.exists:
            prev_state, prev_ts, started = state.get
        else:
            prev_state, prev_ts, started = None, None, False
        rows = [pdf for pdf in pdfs if len(pdf)]
        out = {"conv": [], "turn_idx": [], "state": [], "prev_state": [], "rule": []}
        if rows:
            batch = pd.concat(rows).sort_values([idx_col, ts_col])
            for idx, st, ts in zip(
                batch[idx_col], batch[state_col], batch[ts_col].astype("int64")
            ):
                def emit(rule):
                    out["conv"].append(key_tuple[0])
                    out["turn_idx"].append(int(idx))
                    out["state"].append(st)
                    out["prev_state"].append(prev_state)
                    out["rule"].append(rule)

                # null-state semantics mirror the batch twin
                # (checks.sequence): NULL states are their own rule,
                # transitions are judged only between two non-NULL
                # states, and a successor of a NULL state is neither a
                # transition nor a first row
                if not started:
                    if first is not None and st is not None and st not in first:
                        emit("first_state")
                else:
                    if (
                        prev_state is not None
                        and st is not None
                        and prev_state + "\x1f" + st not in allow
                    ):
                        emit("transition")
                    if ts < prev_ts:
                        emit("ts_regression")
                if st is None:
                    emit("null_state")
                prev_state, prev_ts, started = st, int(ts), True
            state.update((prev_state, prev_ts, started))
        if out["conv"]:  # NEVER yield empty frames (Arrow cast breaks)
            yield pd.DataFrame(out)

    return stream_df.groupBy(conv_col).applyInPandasWithState(
        update,
        outputStructType=(
            "conv string, turn_idx int, state string, prev_state string, rule string"
        ),
        stateStructType="prev_state string, prev_ts long, started boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    src_schema: str,
    transform,
    query_name: str = "out",
    output_mode: str = "append",
) -> DataFrame:
    """Drive a parquet-directory stream to completion synchronously
    (memory sink) — the local smoke harness for streaming semantics.

    ``output_mode="complete"`` for windowed aggregations replayed to
    a final answer; ``"append"`` (default) emits only rows/windows
    sealed by the watermark — the bounded-state production shape."""
    stream = spark.readStream.schema(src_schema).parquet(src_dir)
    out = transform(stream)
    q = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def streaming_drift_monitor(
    stream_df: DataFrame,
    baseline_hist: DataFrame,
    column: str,
    sink_dir: str,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = False,
    report_fn=None,
):
    """Continuous drift monitor: per-event-time-window KL/PSI of
    ``column`` against a FROZEN baseline histogram, appended to a
    parquet sink as windows seal.  ``report_fn`` swaps the statistic:
    any ``(window_hists, baseline_hist, column) -> DataFrame`` with the
    windowed-report contract — e.g. ``drift.windowed_chi2_report`` for
    the sample-size-aware chi-square/G variant — defaulting to
    ``windowed_drift_report`` (KL/PSI).

    Why this shape is correct AND bounded: the windowed histogram runs
    in APPEND mode under a watermark, so each window is emitted exactly
    ONCE — complete — when the watermark passes its end; state never
    exceeds the open windows.  ``foreachBatch`` then applies the batch
    ``windowed_drift_report`` to exactly those sealed windows (the
    baseline side is a tiny batch DataFrame, which is why the drift
    math lives in foreachBatch rather than the streaming plan) and
    appends one row per sealed window.  The reference's periodic
    ticker stats (cmd/cerberus/main.go:124-150) generalize to exactly
    this: stats per closed interval, emitted once.

    Returns the StreamingQuery (caller awaits/stops it).
    """
    from cerberus_spark.checks.drift import (
        windowed_categorical_histograms,
        windowed_drift_report,
    )

    report = report_fn or windowed_drift_report
    hists = windowed_categorical_histograms(
        stream_df, column, ts_col, window_duration, watermark=watermark
    )

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report(batch_df, baseline_hist, column).write.mode(
            "append"
        ).parquet(sink_dir)

    writer = hists.writeStream.outputMode("append").foreachBatch(_emit)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
