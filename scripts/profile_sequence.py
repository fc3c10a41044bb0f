#!/usr/bin/env python
"""Bisect the sequence-window stage's non-scaling behavior.

Usage: taskset -c 0-31 python scripts/profile_sequence.py 32 DATA
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(name, parallelism, data_path, extra_conf, build):
    from cerberus_spark.pipeline import materialize
    from cerberus_spark.session import get_spark

    spark = get_spark(parallelism=parallelism, app_name=f"seqprof_{name}",
                      extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(data_path)
    out = build(df)
    materialize(out)  # warmup
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        materialize(out)
        ts.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"variant": name, "best": min(ts), "runs": ts}), flush=True)
    spark.stop()


def main() -> None:
    parallelism = int(sys.argv[1])
    data_path = sys.argv[2]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cerberus_spark.pipeline import sequence_violation_rows

    def full(df):
        return sequence_violation_rows(df)

    def window_only(df):
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        return (
            df.select("conv_id", "turn_idx", "role", "ts")
            .withColumn("prev_state", F.lag("role").over(w))
            .withColumn("_prev_ts", F.lag("ts").over(w))
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_prev_idx", F.lag("turn_idx").over(w))
        )

    def no_idx(df):
        from cerberus_spark.checks.sequence import sequence_violations
        from cerberus_spark.pipeline import (
            TRANSCRIPT_FIRST_ROLES,
            TRANSCRIPT_TRANSITIONS,
        )

        return sequence_violations(
            df, "conv_id", "role", "ts", ["turn_idx"],
            TRANSCRIPT_TRANSITIONS, TRANSCRIPT_FIRST_ROLES,
        ).select("conv_id", "turn_idx", "rule")

    variants = {
        "full": ({}, full),
        "window_only": ({}, window_only),
        "no_idx_rules": ({}, no_idx),
        "full_shm_local": (
            {"spark.local.dir": f"/dev/shm/seqprof_{parallelism}"}, full),
        "full_noaqe": ({"spark.sql.adaptive.enabled": "false"}, full),
        "full_parts128": ({"spark.sql.shuffle.partitions": "128"}, full),
    }
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else list(variants)
    for name in only:
        conf, build = variants[name]
        run(name, parallelism, data_path, conf, build)


if __name__ == "__main__":
    main()
