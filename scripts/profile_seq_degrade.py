#!/usr/bin/env python
"""Does the sequence window stage degrade run-over-run in one session?

Usage: taskset -c 0-31 python scripts/profile_seq_degrade.py 32 DATA [--shm-local] [--pre]
  --pre  first run the stages that precede sequence in the stage profile
         (rules/uniqueness/referential x3) to reproduce the shared-session state
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# one steal-sampling methodology repo-wide: bench.py owns it
from bench import read_cpu_ticks, steal_pct  # noqa: E402


def disk_snap():
    # sectors written on vda (field 10)
    for line in open("/proc/diskstats"):
        f = line.split()
        if f[2] == "vda":
            return int(f[9])
    return 0


def main() -> None:
    parallelism = int(sys.argv[1])
    data_path = sys.argv[2]
    shm_local = "--shm-local" in sys.argv
    pre = "--pre" in sys.argv

    from cerberus_spark.pipeline import (
        KEY_COLS,
        TRANSCRIPT_RULES,
        materialize,
        sequence_violation_rows,
    )
    from cerberus_spark.session import get_spark
    from cerberus_spark.validation import validate

    extra = {}
    if shm_local:
        extra["spark.local.dir"] = f"/dev/shm/seqdeg_local_{parallelism}"
    spark = get_spark(parallelism=parallelism, app_name="seqdeg", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(data_path)

    if pre:
        from cerberus_spark.checks.referential import referential_violations
        from cerberus_spark.checks.uniqueness import uniqueness_violations
        from cerberus_spark.sources.catalog import tool_catalog

        ann = validate(df, TRANSCRIPT_RULES, key_cols=KEY_COLS)
        for _ in range(3):
            materialize(ann.violations())
            materialize(uniqueness_violations(df, KEY_COLS))
            materialize(referential_violations(
                df, "tool", tool_catalog(spark), "tool", KEY_COLS))
        print("pre done", flush=True)

    seq = sequence_violation_rows(df)
    for i in range(8):
        tk0 = read_cpu_ticks()
        d0 = disk_snap()
        w0 = time.perf_counter()
        materialize(seq)
        wall = round(time.perf_counter() - w0, 3)
        d1 = disk_snap()
        print(json.dumps({
            "run": i, "wall": wall,
            "steal": steal_pct(tk0, read_cpu_ticks()),
            "disk_mb_written": round((d1 - d0) * 512 / 1e6, 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
