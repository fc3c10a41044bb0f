#!/usr/bin/env python
"""spark-submit entry point for the full validation pipeline.

Cluster launch (north_rule: spark-submit --py-files at N and 4N
executors; the same invocation works on YARN/K8s/standalone — only
--master and executor counts change):

    python scripts/make_pyfiles.py   # -> dist/cerberus_spark.zip
    spark-submit \
        --master <cluster> \
        --num-executors <N or 4N> \
        --py-files dist/cerberus_spark.zip \
        jobs/validate_job.py \
        --input  <path or iceberg table> \
        --sink   <audit/violations sink dir> \
        --rules  <rules.json, optional — defaults to TRANSCRIPT_RULES> \
        --baseline <frozen baseline snapshot path, optional> \
        --resume <audit log path, optional: skip completed input files>

Locally (this sandbox) the same file runs under plain python with
--master local[N] resolved by cerberus_spark.session.get_spark.

Design notes at scale:
- rule dicts compile ONCE on the driver to Column trees; nothing is
  shipped per-row (SURVEY.md §7);
- with --resume, completed input files are anti-joined out via the
  audit log (checkpoint-resume, cerberus_spark.plans.checkpoint);
- violations/summary/drift land in the sink; per-partition lineage
  rows include stable input file ids, not plan-dependent partition ids.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# plain-python launch from anywhere: the package lives next to jobs/.
# Under spark-submit the --py-files zip provides it instead.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet dir / Iceberg table of transcripts")
    p.add_argument("--sink", required=True, help="output dir for violations/summary/drift")
    p.add_argument("--rules", default=None, help="JSON file of Cerberus-style rule dicts")
    p.add_argument("--baseline", default=None, help="baseline snapshot path for drift")
    p.add_argument("--resume", default=None, help="audit log path; skip completed files")
    p.add_argument(
        "--sequence-checks",
        action="store_true",
        help="also run turn-contiguity + role-grammar + ts-monotonicity "
        "checks (checks.sequence); violations land in <sink>/sequence",
    )
    p.add_argument(
        "--expect-schema",
        default=None,
        help="schema contract (DDL string or path to a DDL file); the "
        "job fails fast with exit code 2 on declared-vs-actual drift "
        "BEFORE launching any data job (added columns tolerated, "
        "lossless widenings tolerated)",
    )
    p.add_argument(
        "--suggest-rules",
        default=None,
        metavar="OUT_JSON",
        help="bootstrap mode: profile the input (checks.suggest, two "
        "aggregate passes), write suggested rule dicts to OUT_JSON, "
        "and exit — feed the reviewed file back via --rules",
    )
    p.add_argument("--parallelism", type=int, default=None, help="local[..] only")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # under spark-submit a session already exists with the cluster
    # master; get_spark only builds local[...] when none is active
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from cerberus_spark.session import get_spark

        spark = get_spark(parallelism=args.parallelism, app_name="cerberus_validate")

    from cerberus_spark import pipeline
    from cerberus_spark.plans.checkpoint import AuditLog, input_units, normalize_unit
    from cerberus_spark.validation import validate

    rules = pipeline.TRANSCRIPT_RULES
    if args.rules:
        with open(args.rules) as fh:
            rules = json.load(fh)

    df = spark.read.parquet(args.input)

    if args.expect_schema:
        from cerberus_spark.checks.schema_diff import assert_schema
        from cerberus_spark.rules import SchemaError

        ddl = args.expect_schema
        if os.path.exists(ddl):
            with open(ddl) as fh:
                ddl = fh.read()
        try:
            # pure metadata check — runs before any Spark job launches
            assert_schema(df, ddl, allow_added=True)
        except SchemaError as exc:
            print(json.dumps({"status": "schema_drift", "error": str(exc)}))
            return 2

    if args.suggest_rules:
        from cerberus_spark.checks.suggest import suggest_ruleset_json

        suggested = suggest_ruleset_json(df)
        with open(args.suggest_rules, "w") as fh:
            json.dump(suggested, fh, indent=2, sort_keys=True)
        print(json.dumps({"status": "rules_suggested", "out": args.suggest_rules,
                          "n_fields": len(suggested)}))
        return 0

    audit = None
    resume_tagged = None
    if args.resume:
        audit = AuditLog(spark, args.resume)
        units = input_units(args.input, spark)
        todo = audit.pending(units)
        if todo.isEmpty():  # file-count-sized check, not data-sized
            print(json.dumps({"status": "nothing_to_do"}))
            return 0
        # Scale-safe resume: semi-join the scan against the pending
        # unit set instead of collect()-ing a driver-side path list
        # (10^6 files at 100 TB would be a multi-hundred-MB list and an
        # astronomical read.parquet(*paths) plan string).  Reads keep
        # the ORIGINAL scan; the scheme-stripped form is only the audit
        # join key.  input_file_name() is captured ONCE here, directly
        # above the parquet relation — Spark forbids it above a plan
        # with two file sources, and the audit step below needs it.
        tagged = df.withColumn("_file", F.input_file_name()).withColumn(
            "_unit", normalize_unit(F.col("_file"))
        )
        # pending side is one row per FILE -> broadcast
        resume_tagged = tagged.join(
            F.broadcast(todo.select(F.col("unit").alias("_unit"))),
            "_unit",
            "left_semi",
        ).drop("_unit")
        # keep _file: downstream lineage (partition_summary, audit)
        # reuses it instead of re-calling input_file_name()
        df = resume_tagged

    baseline = spark.read.parquet(args.baseline) if args.baseline else None

    t0 = time.perf_counter()
    outs = pipeline.full_validation(spark, df, baseline, rules=rules)
    outs["all_violations"].write.mode("overwrite").parquet(f"{args.sink}/violations")
    outs["partition_summary"].write.mode("overwrite").parquet(f"{args.sink}/partition_summary")
    outs["drift"].write.mode("overwrite").parquet(f"{args.sink}/drift")
    sunk = spark.read.parquet(f"{args.sink}/violations")
    (
        sunk.groupBy("field", "rule")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .write.mode("overwrite")
        .parquet(f"{args.sink}/rule_summary")
    )
    if args.sequence_checks:
        from cerberus_spark.checks.sequence import (
            contiguity_violations,
            sequence_violations,
        )

        # transcript grammar: conversations open with 'system'; every
        # turn may hand off to any in-domain role (the per-field
        # `allowed` rule already flags out-of-domain roles, so the
        # grammar here only pins the opening turn and ts order — teams
        # tighten `allowed_transitions` per corpus)
        roles = ["system", "user", "assistant", "tool"]
        seq = sequence_violations(
            df,
            "conv_id",
            "role",
            "ts",
            ["turn_idx", "ts"],
            allowed={(a, b) for a in roles for b in roles},
            allowed_first={"system"},
        ).select("conv_id", "turn_idx", "prev_state", "rule")
        seq.write.mode("overwrite").parquet(f"{args.sink}/sequence")
        contiguity_violations(df, "conv_id", "turn_idx").write.mode(
            "overwrite"
        ).parquet(f"{args.sink}/contiguity")
    wall = time.perf_counter() - t0

    if audit is not None:
        res = validate(resume_tagged, rules)
        per_file = (
            res.annotated.groupBy(normalize_unit(F.col("_file")).alias("unit"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(F.col("_passed"), 1).otherwise(0)).alias("n_pass"),
            )
            .withColumn("n_fail", F.col("rows") - F.col("n_pass"))
        )
        audit.record(per_file)

    n = spark.read.parquet(args.input).count()
    print(json.dumps({"status": "ok", "input_turns": n, "wall_sec": round(wall, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
