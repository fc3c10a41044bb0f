"""Physical-plan regression tests: the plan SHAPE is part of the
contract at 100 TB.  These assert what `.explain("formatted")` shows —
pushdown, pruning, broadcast strategies, shuffle count — so a future
refactor can't silently turn a map-side join into a 100 TB shuffle.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cerberus_spark.checks.referential import referential_orphans
from cerberus_spark.checks.uniqueness import uniqueness_violations
from cerberus_spark.pipeline import TRANSCRIPT_RULES
from cerberus_spark.sources.catalog import tool_catalog
from cerberus_spark.sources.transcripts import generate_transcripts
from cerberus_spark.validation import validate


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def n_exchanges(plan: str) -> int:
    """Count Exchange operators via their formatted-mode detail headers."""
    return len(re.findall(r"\(\d+\) Exchange", plan))


@pytest.fixture(scope="module")
def transcripts_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "t")
    generate_transcripts(spark, 500).write.parquet(p)
    return spark.read.parquet(p)


def test_validation_plan_is_shuffle_free(spark, transcripts_parquet):
    """Rule evaluation must stay a scan + project — zero exchanges."""
    res = validate(transcripts_parquet, TRANSCRIPT_RULES, key_cols=["conv_id", "turn_idx"])
    plan = plan_of(res.violations())
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_filter_pushdown_reaches_parquet(spark, transcripts_parquet):
    plan = plan_of(transcripts_parquet.filter(F.col("role") == "tool").select("conv_id"))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "role" in m.group(1), plan


def test_column_pruning_reaches_parquet(spark, transcripts_parquet):
    plan = plan_of(transcripts_parquet.select("conv_id", "turn_idx"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"conv_id", "turn_idx"}, plan


def test_uniqueness_direct_is_partial_final_hash_agg(spark, transcripts_parquet):
    """Direct variant: one shuffle keyed on the natural key, partial
    agg before it."""
    plan = plan_of(
        uniqueness_violations(transcripts_parquet, ["conv_id", "turn_idx"], hashed=False)
    )
    assert n_exchanges(plan) == 1, plan
    assert "hashpartitioning(conv_id" in plan, plan
    assert "HashAggregate" in plan
    # map-side combine keeps shuffle volume at |distinct keys|
    assert "partial_count" in plan, plan


def test_uniqueness_hashed_shuffles_hash_then_broadcasts_dups(spark, transcripts_parquet):
    """Two-phase variant: phase 1 shuffles only the 8-byte key hash
    (partial-agg'd), the dup-hash set reaches the fact side via a
    BROADCAST semi-join (never a shuffled join), and phase 2 regroups
    only the candidate rows on the real keys."""
    plan = plan_of(
        uniqueness_violations(transcripts_parquet, ["conv_id", "turn_idx"], hashed=True)
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "partial_count" in plan, plan
    # phase-1 exchange is keyed on the hash, not the wide key tuple
    assert "hashpartitioning(_h" in plan, plan
    # no sort-merge join anywhere — the dup set must broadcast
    assert "SortMergeJoin" not in plan, plan


def test_evaluate_once_barrier_defeats_collapse_project(spark):
    """The Generate barrier must cut N inlined evaluations of an
    expensive expression to one, with NO exchange and no row-count
    change (NULL results included)."""
    from cerberus_spark.plans.barrier import evaluate_once

    df = spark.range(10).withColumn(
        "js", F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}"))
    )
    expensive = F.from_json("js", "k int")
    naive = df.select(
        (expensive.getField("k") + 1).alias("a"),
        (expensive.getField("k") + 2).alias("b"),
        (expensive.getField("k") * 3).alias("c"),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert naive_plan.count("from_json") == 3, naive_plan  # the disease

    bar = evaluate_once(df, "_p", expensive)
    out = bar.select(
        (F.col("_p.k") + 1).alias("a"),
        (F.col("_p.k") + 2).alias("b"),
        (F.col("_p.k") * 3).alias("c"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("from_json") == 1, plan
    assert "Exchange" not in plan, plan
    assert out.count() == 10
    # a NULL expression result still yields its row
    nulls = spark.createDataFrame([(None,)], "js string")
    assert evaluate_once(nulls, "_p", F.from_json("js", "k int")).count() == 1


def test_referential_is_broadcast_anti_join(spark, transcripts_parquet):
    plan = plan_of(
        referential_orphans(transcripts_parquet, "tool", tool_catalog(spark), "tool")
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # dim side reaches the join via a BroadcastExchange; the only
    # hash-shuffle allowed is the dim's own tiny distinct (8 rows) —
    # the fact side streams map-side into the join
    assert "BroadcastExchange" in plan, plan
    assert n_exchanges(plan) <= 2, plan


def test_whole_stage_codegen_covers_rule_eval(spark, transcripts_parquet):
    res = validate(transcripts_parquet, TRANSCRIPT_RULES)
    plan = plan_of(res.annotated)
    # formatted mode marks codegen'd operators with [codegen id : N]
    assert "codegen id" in plan, plan


def test_broadcast_join_for_small_dim(spark, sf_dir="/root/testdata/sf0.001"):
    """TPC-H-ish q3 shape: the filtered customer dim broadcasts."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    plan = plan_of(j)
    assert "BroadcastHashJoin" in plan, plan


def test_first_occurrence_is_partial_aggregate(spark, transcripts_parquet):
    """first_occurrence must compile to an aggregate with a MAP-SIDE
    PARTIAL (only one group-winner row per key per input partition
    crosses the single exchange), not a window rank (which shuffles and
    sorts EVERY row only to discard all but one per key)."""
    from cerberus_spark.operators.dedup import first_occurrence

    plan = plan_of(first_occurrence(transcripts_parquet, ["conv_id"], ["turn_idx"]))
    assert "partial_min_by" in plan, plan
    assert n_exchanges(plan) == 1, plan
    assert "Window" not in plan, plan
    # no GLOBAL sort: any Sort present is the partition-local ordering
    # SortAggregate requires (min_by's struct buffer is not
    # hash-aggregable), marked global=false in the formatted plan
    for m in re.finditer(r"Arguments: \[[^\]]*\], (true|false), 0", plan):
        assert m.group(1) == "false", plan


def test_first_occurrence_agg_matches_window(spark, transcripts_parquet):
    from cerberus_spark.operators.dedup import first_occurrence, first_occurrence_window

    a = first_occurrence(transcripts_parquet, ["conv_id", "role"], ["turn_idx"])
    b = first_occurrence_window(transcripts_parquet, ["conv_id", "role"], ["turn_idx"])
    ka = sorted((r.conv_id, r.role, r.turn_idx) for r in a.collect())
    kb = sorted((r.conv_id, r.role, r.turn_idx) for r in b.collect())
    assert ka == kb and len(ka) > 0


def test_asof_join_is_union_window_not_range_join(spark):
    """asof_join must compile to union + ONE key shuffle + local sort +
    carry-forward window — a range join (theta join on ts <=) would
    blow up O(|L|·|R|) per key at 100 TB."""
    from cerberus_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 10)], "id long, k string, ts long")
    right = spark.createDataFrame([("k", 5, 1.0)], "k string, ts long, v double")
    plan = plan_of(asof_join(left, right, ["k"], "ts", "ts", ["v"]))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert n_exchanges(plan) == 1, plan


def test_interval_join_is_equi_join_not_nlj(spark):
    """interval_join must hash-join on the chunk key; the raw theta
    join it replaces plans as BroadcastNestedLoopJoin (points ×
    intervals — quadratic)."""
    from cerberus_spark.operators.rangejoin import interval_join

    pts = spark.createDataFrame([(1, 1000)], "pid long, ts long").select(
        "pid", F.timestamp_seconds(F.col("ts")).alias("ts")
    )
    ivs = spark.createDataFrame([(1, 0, 2000)], "iv long, s long, e long").select(
        "iv",
        F.timestamp_seconds(F.col("s")).alias("s"),
        F.timestamp_seconds(F.col("e")).alias("e"),
    )
    plan = plan_of(interval_join(pts, "ts", ivs, "s", "e"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_bucketed_join_is_colocated_no_shuffle(spark, transcripts_parquet, tmp_path_factory):
    """Bucketing both sides on the join key pre-partitions data at
    write time — the join then needs NO exchange (the 100 TB co-located
    join strategy; analog of the reference's keyed KV layout,
    internal/monitor/monitor.go:47-53)."""
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    transcripts_parquet.select("conv_id", "turn_idx", "role").write.bucketBy(
        8, "conv_id"
    ).sortBy("conv_id").mode("overwrite").saveAsTable("bkt_a")
    transcripts_parquet.groupBy("conv_id").count().write.bucketBy(
        8, "conv_id"
    ).sortBy("conv_id").mode("overwrite").saveAsTable("bkt_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "conv_id")
        plan = plan_of(j)
        assert "SortMergeJoin" in plan, plan
        assert n_exchanges(plan) == 0, plan
        # sanity: same result as the unbucketed join
        assert j.count() == transcripts_parquet.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bloom_probe_is_map_side_only(spark):
    """The Bloom probe must add ZERO exchanges: broadcast bits +
    ArrowEval over the scan — the whole point is dropping non-members
    before any shuffle."""
    from cerberus_spark.operators.bloom import bloom_filter_rows, build_bloom

    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    bloom = build_bloom(keys, "k", capacity=64)
    big = spark.createDataFrame([("a", 1), ("z", 2)], "k string, v long")
    plan = plan_of(bloom_filter_rows(big, "k", bloom))
    assert "Exchange" not in plan, plan


def test_trim_to_budget_single_shuffle(spark):
    """One hash-partitioning exchange on the conversation key; no
    global sort (the window sorts within partitions only)."""
    from cerberus_spark.operators.pack import trim_to_budget

    df = spark.createDataFrame([("c", 0, 5)], "conv string, turn int, toks int")
    plan = plan_of(trim_to_budget(df, "conv", ["turn"], "toks", 10))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "hashpartitioning(conv" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_mad_outliers_no_window_over_table(spark):
    """Group moments come from broadcast-joined aggregates, never a
    Window re-sort of the table."""
    from cerberus_spark.checks.stats import outliers_mad

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    plan = plan_of(outliers_mad(df, "v", ["g"]))
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_fuzzy_join_never_nested_loop(spark):
    """edit1_pairs must stay an equi-join on the deletion variant —
    the quadratic theta join it replaces plans as
    BroadcastNestedLoopJoin/CartesianProduct."""
    from cerberus_spark.operators.fuzzy import edit1_pairs

    df = spark.createDataFrame([(1, "abcd"), (2, "abce")], "id long, k string")
    plan = plan_of(edit1_pairs(df, "id", "k"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan, plan  # the exact verify stage is present


def test_merge_intervals_single_shuffle_no_join(spark):
    """Gaps-and-islands interval merge: ONE exchange keyed on the
    interval key (both window passes and the final group-by reuse the
    same partitioning), and never a join/NLJ."""
    from cerberus_spark.operators.winnow import merge_intervals

    df = spark.createDataFrame(
        [("k", 0, 5), ("k", 4, 9)], "key string, lo long, hi long"
    )
    plan = plan_of(merge_intervals(df, ["key"], "lo", "hi"))
    assert n_exchanges(plan) == 1, plan
    assert "Join" not in plan, plan


def test_gopher_gate_is_shuffle_free_projection(spark):
    """The composite quality gate must stay a per-row projection —
    zero exchanges regardless of how many signals it composes."""
    from cerberus_spark.functions.text import gopher_filter_report

    df = spark.range(10).select(
        F.concat(F.lit("doc text sample "), F.col("id").cast("string")).alias("text")
    )
    plan = plan_of(df.select(gopher_filter_report(F.col("text")).alias("rep")))
    assert "Exchange" not in plan, plan


def test_normalize_phase_is_shuffle_free_projection(spark):
    """The Cerberus normalization phase (rename/default/coerce/purge)
    must compile to a single projection over the scan — zero
    exchanges."""
    from cerberus_spark.normalize import normalize_documents

    df = spark.range(10).select(
        F.col("id"), F.lit(" X ").alias("role"), F.lit("j").alias("junk")
    )
    out = normalize_documents(
        df,
        {"role": {"rename": "speaker", "default": "u", "coerce": ["strip", "lower"]}},
        keys=("id",),
        purge_unknown=True,
    )
    plan = plan_of(out)
    assert "Exchange" not in plan, plan


def test_cluster_representatives_no_window(spark):
    """Representative selection is ONE partial-aggregable groupBy
    (max_by/max/count combine map-side) — never a Window re-sort of
    the clustered rows, and exactly one post-join exchange."""
    from cerberus_spark.operators.graph import cluster_representatives

    clusters = spark.createDataFrame([(1, 1)], "id long, cluster_id long")
    attrs = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
    plan = plan_of(cluster_representatives(clusters, attrs, "doc_id", "n_chars"))
    assert "Window" not in plan, plan
    assert plan.count("min_by") >= 2, plan  # partial + final agg phases


def test_sequence_fingerprints_single_shuffle_no_python(spark):
    """Conversation fingerprinting shuffles the corpus ONCE (keyed by
    conversation) and the ordered render + md5 stays JVM-side — no
    Python evaluation node anywhere in the plan."""
    from cerberus_spark.operators.dedup import sequence_fingerprints

    df = spark.createDataFrame([("A", 1, "x")], "key string, pos int, tok string")
    plan = plan_of(sequence_fingerprints(df, "key", ["pos"], "tok"))
    assert n_exchanges(plan) == 1, plan
    # no Python eval node of any flavor (the ExistingRDD scan name from
    # createDataFrame contains "PythonRDD" — that's the test input, not
    # an eval operator)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, plan


# ---------------------------------------------------------------------------
# relational planner shapes (TPC-H-style contract queries, r5 additions)
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def test_q7_dims_broadcast_single_fact_shuffle_join(spark):
    """Q7 shape: supplier/customer/nation(x2) must all be broadcast —
    the only non-broadcast join allowed is the fact-fact
    lineitem<->orders equi join (shuffle on the order key)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q7_volume_shipping(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q10_aggregates_before_customer_join(spark):
    """Q10 shape: per-customer revenue reduces lineitem rows BEFORE the
    customer join — the broadcast join's streamed side must be the
    aggregate, so the join input is |custkeys|, not |lineitems|."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q10_returned_items(spark, SF_DIR))
    # formatted-mode node ids: children are numbered before parents.
    # The required sandwich is orders-join -> revenue aggregate ->
    # customer-join: the aggregate sits ABOVE the orders join (id
    # greater than the innermost join) and BELOW the customer join (id
    # smaller than the outermost join), so the dim join's input is
    # |custkeys|, not |lineitems|.
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    bhj_ids = [int(m) for m in re.findall(r"\((\d+)\) BroadcastHashJoin", plan)]
    assert agg_ids and len(bhj_ids) == 2, plan
    assert min(bhj_ids) < min(agg_ids) < max(agg_ids) < max(bhj_ids), plan


def test_q11_global_scalar_is_broadcast_not_cartesian(spark):
    """Q11 shape: the HAVING-against-global-total threshold is a 1-row
    broadcast (BroadcastNestedLoopJoin over a single aggregate row),
    never a CartesianProduct or a second correlated scan."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q11_important_parts(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_q21_no_expand_two_phase_distincts(spark):
    """Q21 shape: each per-order distinct-supplier count is a single
    distinct aggregate (two-phase HashAggregate) — the Expand operator
    (multi-distinct rewrite, |rows| x |aggs| blowup) must not appear."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q21_waiting_suppliers(spark, SF_DIR))
    assert "Expand" not in plan, plan


def test_q17_avg_subquery_decorrelated_to_broadcast(spark):
    """Q17 shape: the per-part AVG 'subquery' runs ONCE as an aggregate
    joined back by broadcast — no correlated re-scan, no NLJ."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q17_small_quantity_revenue(spark, SF_DIR))
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", ""), plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q8_widest_dim_chain_single_fact_shuffle(spark):
    """Q8 shape: part/customer/supplier/nation(x2)/region all reach the
    fact by broadcast (hash or left-semi); the only shuffle join
    allowed is lineitem<->orders."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q8_market_share(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_q9_like_filter_pushed_to_part_scan(spark):
    """Q9 shape: the p_name LIKE lands on the part dim scan as a
    pushed StringContains — never a post-join filter over fact rows —
    and part joins the fact broadcast."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q9_product_profit(spark, SF_DIR))
    assert "StringContains(p_name,widget)" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_q15_scalar_max_is_one_row_broadcast(spark):
    """Q15 shape: the MAX-revenue 'subquery' reduces the per-supplier
    aggregate to one broadcast row — no CartesianProduct, no second
    correlated pass (exactly one aggregate pair over the fact scan)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q15_top_supplier(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_q19_implied_per_side_filters_reach_both_scans(spark):
    """Q19 shape: the cross-side disjunction itself cannot push through
    the join, but its per-side implications must — brand IN and size
    range on the part scan, the quantity envelope on the lineitem
    scan."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q19_disjunctive_revenue(spark, SF_DIR))
    assert re.search(r"PushedFilters:.*In\(p_brand", plan), plan
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(l_quantity,1\.0\)", plan), plan
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(l_quantity,30\.0\)", plan), plan
    assert "BroadcastHashJoin" in plan, plan


def test_q20_semi_join_chain_all_broadcast(spark):
    """Q20 shape: the nested IN/EXISTS chain decorrelates to broadcast
    (semi) joins only — zero shuffle joins; the sole exchanges are the
    (supplier, part) aggregate's."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q20_dominant_promo_suppliers(spark, SF_DIR))
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 0, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_sequence_minhash_single_shuffle_reuses_window_partitioning(spark):
    """Conversation MinHash shuffles the corpus ONCE: the signature
    groupBy(key) rides the lag-window's hash(key) exchange (no second
    Exchange), and shingling + the 16 minima are pure JVM expressions."""
    from cerberus_spark.operators.dedup import sequence_minhash

    df = spark.createDataFrame([("A", 1, "x")], "key string, pos int, tok string")
    plan = plan_of(sequence_minhash(df, "key", ["pos"], "tok"))
    assert n_exchanges(plan) == 1, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, plan


def test_sequence_neardup_pairs_shares_one_shingle_pass(spark):
    """The candidate->verify chain must derive its four shingle
    consumers (signatures, sizes, two verify probes) from ONE
    materialized distinct-shingle frame: with share_shingles (the
    default) the live plan contains ZERO Window nodes — the corpus
    scan + lag-window pass runs once, inside the checkpoint
    materialization — where the naive recompute mode plans the window
    once per consumer (5x corpus scans measured)."""
    from cerberus_spark.operators.dedup import sequence_neardup_pairs

    df = spark.createDataFrame(
        [("A", i, f"x{i % 3}") for i in range(4)],
        "key string, pos int, tok string",
    )
    shared = plan_of(sequence_neardup_pairs(df, "key", ["pos"], "tok"))
    assert len(re.findall(r"\(\d+\) Window", shared)) == 0, shared
    assert "CartesianProduct" not in shared, shared
    assert "BroadcastNestedLoopJoin" not in shared, shared
    naive = plan_of(
        sequence_neardup_pairs(df, "key", ["pos"], "tok", share_shingles=False)
    )
    assert len(re.findall(r"\(\d+\) Window", naive)) >= 2, naive


def test_clean_transcripts_report_plan_shape(spark):
    """The full transcript-cleaning composition (health gate ->
    conversation near-dedup -> report) must stay join-safe end to end:
    no cartesian/nested-loop join anywhere, ZERO Window passes in the
    lazy report plan (the health window runs ONCE inside the
    checkpointed health-drop frame and the near-dup shingle window
    once inside the shared-shingle checkpoint, so no consumer —
    dropped, report, kept — re-runs a corpus-sized sort), and all-JVM
    expressions (no Python eval nodes)."""
    import datetime as dt

    from cerberus_spark.corpus import clean_transcripts

    T0 = dt.datetime(2026, 1, 1)
    rows = [("A", i, "a" if i % 2 else "b", T0 + dt.timedelta(minutes=i))
            for i in range(6)]
    df = spark.createDataFrame(rows, "conv string, idx int, tok string, ts timestamp")
    out = clean_transcripts(
        df, "conv", ["idx"], "tok", "ts",
        {("a", "b"), ("b", "a")}, {"b"},
    )
    plan = plan_of(out["report"])
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas"):
        assert node not in plan, plan
