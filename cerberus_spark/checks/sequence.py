"""Sequence-structure checks over ordered per-conversation turns.

The north-rule input is a multi-turn transcript keyed by
(conv_id, turn_idx); beyond per-row rules, its *sequence* structure
carries invariants the reference validates implicitly through its
ordered per-flow state machine (kernel flow tracking walks packets of
one flow in order — internal/monitor/monitor.go:243-268 documents the
per-flow ordered update loop):

- **index contiguity** — turn_idx must be dense ``start..start+n-1``
  per conversation (a gap means a dropped turn, a duplicate means a
  replayed one);
- **timestamp monotonicity** — ts must be non-decreasing in turn
  order;
- **role-transition grammar** — the (prev_role -> role) transition
  must be in an allowed set (e.g. tool output only after an assistant
  call), with an optional allowed set for the FIRST turn.

Scale shape (the only thing that matters at 10^12 turns):

- :func:`contiguity_report` is ONE hash-partitioned groupBy with
  map-side partial aggregation — shuffle volume is |convs|, not
  |turns|; no window, no sort.
- The windowed checks (:func:`order_violations`,
  :func:`transition_violations`, :func:`sequence_violations`) share a
  single ``Window.partitionBy(conv).orderBy(order)`` — ONE shuffle +
  partition-local sort, then pure row-local predicates.
  :func:`sequence_violations` evaluates every rule in the SAME window
  pass (conditional rule-name array -> explode), so adding rules adds
  zero exchanges.

Everything is built-in Columns — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: separator for (prev, cur) transition encoding; \x1f never appears in
#: role vocabularies
_SEP = "\x1f"


def contiguity_report(
    df: DataFrame, conv_col: str, idx_col: str, start: int = 0
) -> DataFrame:
    """Per-conversation index-density report:
    (conv, n_rows, min_idx, max_idx, n_dup_idx, n_missing,
    n_below_start).

    ``n_missing`` counts indexes absent from ``start..max_idx`` (so a
    conversation starting late shows its leading gap) — the density
    term counts only indexes INSIDE ``[start, max_idx]``, so stray
    below-start indexes can neither mask a gap nor drive the count
    negative; they are surfaced separately as ``n_below_start``.
    ``n_dup_idx`` counts rows beyond the first per index.

    Shape: TWO-PHASE aggregation — groupBy (conv, idx) first, then
    groupBy conv over the deduped rows.  The three distinct counts
    expressed directly would plan as Expand (every input row duplicated
    once per distinct expression — ~4x the table through the shuffle);
    the two-phase form shuffles the table ONCE (map-side partial agg on
    the pair key) plus a per-(conv,idx) second pass.
    """
    idx = F.col(idx_col)
    per_idx = df.groupBy(
        F.col(conv_col).alias("conv"), idx.alias("__idx")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    i = F.col("__idx")
    return per_idx.groupBy("conv").agg(
        F.sum("__cnt").alias("n_rows"),
        F.min(i).cast("long").alias("min_idx"),
        F.max(i).cast("long").alias("max_idx"),
        (F.sum("__cnt") - F.count(F.lit(1))).alias("n_dup_idx"),
        F.greatest(
            F.lit(0).cast("long"),
            (
                F.max(i) - F.lit(start) + 1
                - F.count(F.when(i >= start, F.lit(1)))
            ).cast("long"),
        ).alias("n_missing"),
        F.count(F.when(i < start, F.lit(1))).cast("long").alias("n_below_start"),
    )


def contiguity_violations(
    df: DataFrame, conv_col: str, idx_col: str, start: int = 0
) -> DataFrame:
    """Conversations whose index set is not exactly dense from
    ``start``: any gap, duplicate, below-start index, or late start."""
    rep = contiguity_report(df, conv_col, idx_col, start)
    return rep.filter(
        (F.col("n_dup_idx") > 0)
        | (F.col("n_missing") > 0)
        | (F.col("n_below_start") > 0)
    )


def _w(conv_col: str, order_by: list[str]) -> Window:
    return Window.partitionBy(conv_col).orderBy(*order_by)


def order_violations(
    df: DataFrame, conv_col: str, ts_col: str, order_by: list[str]
) -> DataFrame:
    """Rows whose ``ts_col`` regresses below the previous row's in
    ``order_by`` order: input row + ``prev_ts``.  One shuffle."""
    w = _w(conv_col, order_by)
    return (
        df.withColumn("prev_ts", F.lag(ts_col).over(w))
        .filter(F.col(ts_col) < F.col("prev_ts"))
    )


def transition_violations(
    df: DataFrame,
    conv_col: str,
    state_col: str,
    order_by: list[str],
    allowed: set[tuple[str, str]],
    allowed_first: set[str] | None = None,
) -> DataFrame:
    """Rows whose (prev_state -> state) transition is not in
    ``allowed`` (plus, when ``allowed_first`` is given, first rows
    whose state is not in it): input row + ``prev_state`` + ``rule``
    ('transition', 'null_state' or 'first_state').  One shuffle.

    NULL handling is explicit so the semantics match the DuckDB oracle
    even on data with NULL states: a NULL state is its own
    ``null_state`` violation (Spark's concat_ws would silently skip the
    NULL operand and mis-flag it 'transition' while SQL's ``||`` yields
    NULL and silently drops the row — neither is right); transitions
    are only judged between two non-NULL states; and 'first row' means
    row_number()==1, not prev IS NULL (a mid-conversation NULL state
    must not make its successor look like a first row).
    """
    w = _w(conv_col, order_by)
    prev = F.lag(state_col).over(w)
    rn = F.row_number().over(w)
    state = F.col(state_col)
    trans_ok = F.concat_ws(_SEP, prev, state).isin(
        [a + _SEP + b for a, b in sorted(allowed)]
    )
    bad_trans = prev.isNotNull() & state.isNotNull() & ~trans_ok
    bad_null = state.isNull()
    if allowed_first is not None:
        bad_first = (rn == 1) & ~state.isin(sorted(allowed_first))
    else:
        bad_first = F.lit(False)
    return (
        df.withColumn("prev_state", prev)
        .withColumn(
            "rule",
            F.when(bad_trans, F.lit("transition"))
            .when(bad_null, F.lit("null_state"))
            .when(bad_first, F.lit("first_state")),
        )
        .filter(F.col("rule").isNotNull())
    )


def sequence_violations(
    df: DataFrame,
    conv_col: str,
    state_col: str,
    ts_col: str,
    order_by: list[str],
    allowed: set[tuple[str, str]],
    allowed_first: set[str] | None = None,
    idx_col: str | None = None,
    start: int = 0,
) -> DataFrame:
    """All sequence rules in ONE window pass: emits one row per
    (input row, violated rule) with ``rule`` in {'transition',
    'null_state', 'first_state', 'ts_regression'}.

    lag(state), lag(ts) and row_number come from the same window sort;
    the per-row rule names are collected into a conditional array and
    exploded, so a row violating two rules yields two output rows and
    clean rows yield none — still exactly one exchange.

    NULL-state semantics match :func:`transition_violations` (and the
    DuckDB oracle): NULL states report ``null_state``; transitions are
    judged only between two non-NULL states; 'first row' is
    row_number()==1, so a mid-conversation NULL state does not make its
    successor look like a conversation start.

    ``idx_col`` additionally derives the INDEX-DENSITY rules from the
    SAME window pass (at 10^12-turn scale this folds
    :func:`contiguity_report`'s separate corpus shuffle into the one
    sort already paid): ``dup_idx`` (index equals its predecessor's),
    ``below_start`` (index < ``start``), and ``idx_gap`` (indexes
    skipped before this row — the gap SIZE lands in ``gap_size``,
    NULL on non-gap rows, so Σ gap_size per conv equals
    contiguity_report's ``n_missing``, equality pytest-locked).
    REQUIREMENT: ``order_by`` must sort ``idx_col`` non-decreasing
    within a conversation (e.g. lead with it), or gaps mis-derive.
    """
    w = _w(conv_col, order_by)
    # materialize the window attributes in one Window pass FIRST:
    # generator expressions (explode) cannot embed window functions,
    # and as plain attributes the rules below stay a simple projection
    base = (
        df.withColumn("prev_state", F.lag(state_col).over(w))
        .withColumn("_prev_ts", F.lag(ts_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
    )
    if idx_col is not None:
        base = base.withColumn("_prev_idx", F.lag(idx_col).over(w))
    prev_state, prev_ts = F.col("prev_state"), F.col("_prev_ts")
    state = F.col(state_col)
    trans_ok = F.concat_ws(_SEP, prev_state, state).isin(
        [a + _SEP + b for a, b in sorted(allowed)]
    )
    checks = [
        F.when(
            prev_state.isNotNull() & state.isNotNull() & ~trans_ok,
            F.lit("transition"),
        ),
        F.when(state.isNull(), F.lit("null_state")),
        F.when(F.col(ts_col) < prev_ts, F.lit("ts_regression")),
    ]
    if allowed_first is not None:
        checks.append(
            F.when(
                (F.col("_rn") == 1) & ~state.isin(sorted(allowed_first)),
                F.lit("first_state"),
            )
        )
    gap = None
    if idx_col is not None:
        idx, prev_idx = F.col(idx_col).cast("long"), F.col("_prev_idx").cast("long")
        s = F.lit(start).cast("long")
        # indexes skipped immediately before this row: from the
        # predecessor when it was in range, else (first in-range row
        # of the conv) from `start` — matches contiguity_report's
        # "density inside [start, max_idx]" exactly
        gap = (
            F.when(
                (idx >= s) & (prev_idx.isNull() | (prev_idx < s)), idx - s
            )
            .when((idx >= s) & (prev_idx >= s), F.greatest(F.lit(0).cast("long"), idx - prev_idx - 1))
            .otherwise(F.lit(0).cast("long"))
        )
        checks += [
            # null-safe: contiguity_report's per-(conv, idx) grouping
            # treats NULL as one index value, so duplicate NULL indexes
            # ARE duplicates here too (idx == prev_idx alone is NULL
            # when idx is NULL and would silently pass them); _rn > 1
            # distinguishes "first row of the conv" from "predecessor
            # had a NULL index"
            F.when(
                (F.col("_rn") > 1) & idx.eqNullSafe(prev_idx), F.lit("dup_idx")
            ),
            # first row of its index only: contiguity_report counts
            # DISTINCT below-start indexes, not rows (its per-idx dedup)
            F.when(
                (idx < s) & (prev_idx.isNull() | (idx != prev_idx)),
                F.lit("below_start"),
            ),
            F.when(gap > 0, F.lit("idx_gap")),
        ]
    rules = F.filter(F.array(*checks), lambda x: x.isNotNull())
    out = base.withColumn("rule", F.explode(rules))
    if idx_col is not None:
        out = out.withColumn(
            "gap_size", F.when(F.col("rule") == "idx_gap", gap)
        ).drop("_prev_idx")
    return out.drop("_prev_ts", "_rn")


def reindex_turns(
    df: DataFrame,
    conv_col: str,
    order_by: list[str],
    new_col: str = "turn_idx_fixed",
) -> DataFrame:
    """Repair contiguity violations: dense re-index ``0..n-1`` per
    conversation in ``order_by`` order (``order_by`` must be a total
    order within a conversation or the result is nondeterministic).
    One shuffle + partition-local sort; pairs with
    :func:`contiguity_violations` as the fix for the convs it flags.
    """
    w = _w(conv_col, order_by)
    return df.withColumn(new_col, (F.row_number().over(w) - 1).cast("int"))


def conversation_report(
    df: DataFrame,
    conv_col: str,
    idx_col: str,
    state_col: str,
    ts_col: str,
    order_by: list[str],
    allowed: set[tuple[str, str]],
    allowed_first: set[str] | None = None,
    start: int = 0,
) -> DataFrame:
    """Per-conversation health gate — the transcript analog of the
    corpus Gopher gate: ONE row per conversation with every structural
    violation count and a composite ``keep`` flag.

    Output: (conv, n_turns, n_dup_idx, n_missing, n_below_start,
    n_transition, n_null_state, n_ts_regression, n_first_state, keep).

    Composition, not new math: the per-row rules are exactly
    :func:`sequence_violations` (one window pass) and the density terms
    exactly :func:`contiguity_report` (one partial-agg'd groupBy) — the
    counts here hash-match those operators' oracles by construction.
    Scale shape: one window shuffle + one |convs|-sized groupBy, then a
    |convs| ⋈ |convs| join of the two summaries (sort-merge on the conv
    key; both sides already reduced).  A downstream filter on ``keep``
    is the conversation-level quarantine a 10^12-turn ingest needs
    before per-turn rules even run.
    """
    rep = contiguity_report(df, conv_col, idx_col, start=start).withColumnRenamed(
        "n_rows", "n_turns"
    )
    seq = sequence_violations(
        df, conv_col, state_col, ts_col, order_by, allowed, allowed_first
    )
    counts = seq.groupBy(F.col(conv_col).alias("conv")).agg(
        *[
            F.sum(F.when(F.col("rule") == r, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{r}")
            for r in ("transition", "null_state", "ts_regression", "first_state")
        ]
    )
    return assemble_conversation_report(rep, counts)


#: the per-conversation violation counters of conversation_report, in
#: output order — the single source for finalize's fillna/keep/select
REPORT_COUNT_COLS = [
    "n_dup_idx",
    "n_missing",
    "n_below_start",
    "n_transition",
    "n_null_state",
    "n_ts_regression",
    "n_first_state",
]


def assemble_conversation_report(rep: DataFrame, counts: DataFrame) -> DataFrame:
    """Final assembly of :func:`conversation_report`: join the
    contiguity report (``n_rows`` already renamed ``n_turns``) with
    per-conv sequence-rule counts (columns ``n_transition`` /
    ``n_null_state`` / ``n_ts_regression`` / ``n_first_state``) and
    derive ``keep``.  Exposed so callers that already MATERIALIZED the
    per-row sequence violations (e.g. the pipeline's audit sink) can
    roll the health gate up from those rows instead of paying the
    window pass twice — same output by construction."""
    return finalize_conversation_report(rep.join(counts, "conv", "left"))


def finalize_conversation_report(joined: DataFrame) -> DataFrame:
    """Shared tail of the health gate: null-fill every violation
    counter (a conversation absent from a counts side has zero
    violations), derive the composite ``keep``, and fix the column
    order.  ``joined`` must carry ``conv``, ``n_turns`` and the
    :data:`REPORT_COUNT_COLS` (possibly NULL)."""
    joined = joined.fillna(0, subset=REPORT_COUNT_COLS)
    keep = F.lit(True)
    for c in REPORT_COUNT_COLS:
        keep = keep & (F.col(c) == 0)
    return joined.select("conv", "n_turns", *REPORT_COUNT_COLS, keep.alias("keep"))
