"""Gap-based sessionization — classic lag + cumulative-sum windows.

The reference has processing-time tumbling windows only (tickers,
cmd/cerberus/main.go:124-150); event-time sessionization is the
batch-analytics generalization a transcript/event table needs.
One shuffle: both windows partition by the same key, so Spark reuses
a single hash partitioning + sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Adds ``session_id`` (0-based per key): a new session starts when
    the gap from the previous event exceeds ``gap_seconds``."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # cast through timestamp first: parquet TIMESTAMP_NTZ has no direct
    # long cast; session TZ is UTC so epoch seconds match the oracle
    secs = F.col(ts_col).cast("timestamp").cast("long")
    prev_secs = prev_ts.cast("timestamp").cast("long")
    new_sess = F.when(
        prev_ts.isNull() | (secs - prev_secs > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
