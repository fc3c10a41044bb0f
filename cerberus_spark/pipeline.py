"""The headline job: full rule-set + distributed checks + drift over a
transcript table in one pass-per-check, all DataFrame-native.

This is the north-rule workload — the batch analog of the reference's
entire event loop (classify -> enrich -> aggregate -> dedup -> report,
cmd/cerberus/main.go:153-211 + internal/monitor/monitor.go:197-408),
re-expressed as five independent Catalyst plans over one scan-friendly
source:

  1. rule validation      (per-row predicates, violations + summary)
  2. partition summary    (mapInPandas lineage, monitor.go:514-584 analog)
  3. uniqueness           (hash groupBy on (conv_id, turn_idx))
  4. referential          (broadcast anti-join vs tool catalog)
  5. drift                (role + text-length KL/PSI vs frozen baseline)

Scale shape: steps 1-2 are shuffle-free (scan + codegen + Arrow batch);
step 3 shuffles |distinct keys| after map-side partial agg; step 4 is
map-side only (broadcast); step 5 shuffles histogram-sized data.  No
step collects more than histogram/summary rows to the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerberus_spark.checks.drift import categorical_histogram, drift_report, numeric_histogram
from cerberus_spark.checks.referential import referential_orphans
from cerberus_spark.checks.uniqueness import uniqueness_violations
from cerberus_spark.sources.catalog import tool_catalog
from cerberus_spark.validation import validate

#: north-rule transcript rule set (Cerberus-style rule dicts)
TRANSCRIPT_RULES: dict[str, dict[str, Any]] = {
    "conv_id": {"type": "string", "required": True, "regex": "conv-[0-9]{8}"},
    "turn_idx": {"type": "integer", "required": True, "min": 0, "max": 100000},
    "role": {
        "type": "string",
        "required": True,
        "allowed": ["system", "user", "assistant", "tool"],
    },
    "text": {"type": "string", "required": True, "empty": False, "maxlength": 20000},
    "tool": {"type": "string", "nullable": True, "dependencies": {"role": "tool"}},
    "ts": {"type": "timestamp", "required": True},
}

#: frozen text-length bin edges for drift (never re-derived per run)
TEXT_LEN_EDGES = [0.0, 20.0, 50.0, 100.0, 150.0, 200.0, 300.0, 1e9]


def materialize(df: DataFrame) -> None:
    """Force full evaluation without driver transfer.

    The noop sink materializes every column and row (unlike ``count()``,
    which lets Catalyst prune compute-heavy projections away).
    """
    df.write.format("noop").mode("overwrite").save()


def full_validation(
    spark: SparkSession,
    df: DataFrame,
    baseline: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Build (lazily) every check's result DataFrame for a transcript
    table.  ``baseline`` defaults to the older half of ``df`` by median
    timestamp — in production it is the frozen snapshot table.
    """
    res = validate(df, TRANSCRIPT_RULES, key_cols=["conv_id", "turn_idx"])
    out: dict[str, DataFrame] = {
        "violations": res.violations(),
        "rule_summary": res.summary(),
        "partition_summary": res.partition_summary(),
        "uniqueness": uniqueness_violations(df, ["conv_id", "turn_idx"]),
        "referential": referential_orphans(df, "tool", tool_catalog(spark), "tool"),
    }

    if baseline is None:
        split = df.agg(
            F.percentile_approx("ts", 0.5, 10000).alias("m")
        ).collect()[0]["m"]
        baseline = df.filter(F.col("ts") < F.lit(split))
        current = df.filter(F.col("ts") >= F.lit(split))
    else:
        current = df

    out["drift_role"] = drift_report(
        categorical_histogram(baseline, "role"),
        categorical_histogram(current, "role"),
        "role",
    )
    blen = baseline.select(F.length("text").alias("text_len"))
    clen = current.select(F.length("text").alias("text_len"))
    out["drift_text_len"] = drift_report(
        numeric_histogram(blen, "text_len", TEXT_LEN_EDGES),
        numeric_histogram(clen, "text_len", TEXT_LEN_EDGES),
        "text_len",
    )
    return out


def run_full_validation(
    spark: SparkSession, df: DataFrame, baseline: DataFrame | None = None
) -> None:
    """Materialize every check (the benched unit of work)."""
    for out in full_validation(spark, df, baseline).values():
        materialize(out)
