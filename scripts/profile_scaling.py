#!/usr/bin/env python
"""Per-stage N vs 4N profiling for the headline validation job.

Times each component of ``run_full_validation`` separately at a given
parallelism level (pinned via taskset by the caller) so the stage that
does NOT scale can be identified instead of guessed.  Dev tool behind
the scaling criterion — not part of the engine.

Usage:
  taskset -c 0-7  python scripts/profile_scaling.py 8  DATA [--shm-local]
  taskset -c 0-31 python scripts/profile_scaling.py 32 DATA [--shm-local]

``--shm-local`` points spark.local.dir at /dev/shm (executor-local-disk
stand-in: this sandbox has ONE virtio disk; a real cluster spreads
shuffle files across per-executor SSDs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parallelism = int(sys.argv[1])
    data_path = sys.argv[2]
    shm_local = "--shm-local" in sys.argv
    runs = 3

    from bench import read_cpu_ticks, steal_pct  # repo-wide methodology

    from pyspark.sql import functions as F

    from cerberus_spark.checks.referential import referential_violations
    from cerberus_spark.checks.uniqueness import uniqueness_violations
    from cerberus_spark.pipeline import (
        KEY_COLS,
        TRANSCRIPT_RULES,
        all_violations,
        conversation_health_from_violations,
        drift_reports,
        materialize,
        run_full_validation,
        sequence_violation_rows,
        transcript_stats,
    )
    from cerberus_spark.session import get_spark
    from cerberus_spark.sources.catalog import tool_catalog
    from cerberus_spark.validation import validate

    extra = {}
    if shm_local:
        extra["spark.local.dir"] = f"/dev/shm/cerberus_profile_local_{parallelism}"
    spark = get_spark(parallelism=parallelism, app_name=f"profile_{parallelism}",
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(data_path)
    n_turns = df.count()
    sink_dir = f"/dev/shm/cerberus_profile_sink_{parallelism}"

    stages: dict[str, object] = {}

    def stage(name, fn):
        # one warmup, then best-of-`runs`, steal%% recorded per run
        fn()
        ts, steals = [], []
        for _ in range(runs):
            tk0 = read_cpu_ticks()
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
            steals.append(steal_pct(tk0, read_cpu_ticks()))
        stages[name] = min(ts)
        print(json.dumps({"stage": name, "best": min(ts), "runs": ts,
                          "steal": steals}), flush=True)

    ann = validate(df, TRANSCRIPT_RULES, key_cols=KEY_COLS)
    stage("rules_only", lambda: materialize(ann.violations()))
    stage("uniqueness_only", lambda: materialize(
        uniqueness_violations(df, KEY_COLS)))
    stage("referential_only", lambda: materialize(referential_violations(
        df, "tool", tool_catalog(spark), "tool", KEY_COLS)))
    stage("sequence_only", lambda: materialize(sequence_violation_rows(df)))
    viol = all_violations(spark, df, None, sequence_checks=True)
    stage("violations_sink_write", lambda: viol.write.mode("overwrite")
          .parquet(f"{sink_dir}/violations"))
    stage("partition_summary", lambda: materialize(ann.partition_summary()))
    stage("column_stats", lambda: materialize(transcript_stats(df)))
    stage("drift", lambda: materialize(drift_reports(df)))
    sunk = spark.read.parquet(f"{sink_dir}/violations")
    stage("rollup_summary", lambda: materialize(
        sunk.groupBy("field", "rule").agg(F.count(F.lit(1)).alias("n"))))
    stage("rollup_health", lambda: materialize(
        conversation_health_from_violations(df, sunk)))
    stage("FULL_JOB", lambda: run_full_validation(
        spark, df, sink_dir=sink_dir, sequence_checks=True))

    shutil.rmtree(sink_dir, ignore_errors=True)
    print("PROFILE " + json.dumps({
        "parallelism": parallelism, "turns": n_turns,
        "shm_local": shm_local, "stages": stages,
    }), flush=True)
    spark.stop()
    if shm_local:
        shutil.rmtree(extra["spark.local.dir"], ignore_errors=True)


if __name__ == "__main__":
    main()
