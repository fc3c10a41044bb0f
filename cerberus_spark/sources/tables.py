"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Parquet scans get Catalyst predicate pushdown and column pruning for
free; an Iceberg catalog slots in by swapping ``spark.read.parquet``
for ``spark.read.format("iceberg")`` (jars absent in this container —
see cerberus_spark.plans.checkpoint for the table-format abstraction).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Fan a narrow input across all cores before expression-heavy work.

    A single small parquet file scans as ONE partition, serializing any
    downstream per-row compute (regex/md5/shingling) onto one core.  On
    a real 100 TB table input splits >> cores so this is a no-op (we
    only repartition UP); the round-robin shuffle on a small table is
    microseconds against minutes of serialized compute.
    """
    parallelism = parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
