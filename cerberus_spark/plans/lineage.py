"""Per-partition lineage columns.

Partition ids are plan-dependent (SURVEY.md §7), so lineage pairs the
runtime partition id with the stable input split (source file path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_lineage(df: DataFrame) -> DataFrame:
    """Adds ``_file`` (stable input split id) and ``_pid`` (runtime
    partition — diagnostic only, never a resume key)."""
    return df.withColumn("_file", F.input_file_name()).withColumn(
        "_pid", F.spark_partition_id()
    )
