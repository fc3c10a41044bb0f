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


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
