"""Distributed-only checks: uniqueness, referential integrity, column
stats, distribution drift."""

from cerberus_spark.checks.uniqueness import uniqueness_violations, duplicate_rows
from cerberus_spark.checks.referential import referential_orphans, referential_violations
from cerberus_spark.checks.stats import column_profile, numeric_quantiles
from cerberus_spark.checks.drift import categorical_histogram, numeric_histogram, drift_report

__all__ = [
    "uniqueness_violations",
    "duplicate_rows",
    "referential_orphans",
    "referential_violations",
    "column_profile",
    "numeric_quantiles",
    "categorical_histogram",
    "numeric_histogram",
    "drift_report",
]
