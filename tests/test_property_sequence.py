"""Property-based equivalence: the windowed sequence checks vs a
pure-Python walk over hypothesis-generated conversations.

The strategy generates conversations with duplicate turn indexes,
gaps, timestamp regressions, and arbitrary state transitions over a
small alphabet; (idx, ts) is kept a TOTAL order per conversation
(unique ts) so both engines walk rows in one well-defined order.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cerberus_spark.checks.sequence import (
    contiguity_report,
    sequence_violations,
)

STATES = ["system", "user", "assistant", "tool"]
ALLOWED = {
    ("system", "user"),
    ("user", "assistant"),
    ("assistant", "user"),
    ("assistant", "tool"),
    ("tool", "assistant"),
}
FIRST = {"system"}
BASE = 1_704_067_200


@st.composite
def conversations(draw):
    """List of (conv, idx, state, ts_second) rows; ts unique per conv.
    Indexes may dip below start (0) and states may be NULL, so the
    null-state and below-start-density branches are exercised."""
    rows = []
    for c in range(draw(st.integers(min_value=1, max_value=4))):
        n = draw(st.integers(min_value=1, max_value=8))
        idxs = draw(
            st.lists(st.integers(min_value=-3, max_value=9), min_size=n, max_size=n)
        )
        states = draw(
            st.lists(st.sampled_from(STATES + [None]), min_size=n, max_size=n)
        )
        secs = draw(
            st.lists(
                st.integers(min_value=0, max_value=999),
                min_size=n,
                max_size=n,
                unique=True,
            )
        )
        rows.extend((f"c{c}", i, s, t) for i, s, t in zip(idxs, states, secs))
    return rows


def py_sequence_violations(rows):
    by_conv: dict = {}
    for conv, idx, state, sec in rows:
        by_conv.setdefault(conv, []).append((idx, sec, state))
    out = []
    for conv, turns in by_conv.items():
        prev_state = prev_sec = None
        for pos, (idx, sec, state) in enumerate(
            sorted(turns, key=lambda t: (t[0], t[1]))
        ):
            if state is None:
                out.append((conv, idx, "null_state"))
            if pos == 0:
                if state is not None and state not in FIRST:
                    out.append((conv, idx, "first_state"))
            else:
                if (
                    prev_state is not None
                    and state is not None
                    and (prev_state, state) not in ALLOWED
                ):
                    out.append((conv, idx, "transition"))
                if sec < prev_sec:
                    out.append((conv, idx, "ts_regression"))
            prev_state, prev_sec = state, sec
    return sorted(out)


def py_contiguity(rows, start=0):
    by_conv: dict = {}
    for conv, idx, _, _ in rows:
        by_conv.setdefault(conv, []).append(idx)
    out = {}
    for conv, idxs in by_conv.items():
        in_range = {i for i in idxs if i >= start}
        out[conv] = (
            len(idxs),
            min(idxs),
            max(idxs),
            len(idxs) - len(set(idxs)),
            max(0, max(idxs) - start + 1 - len(in_range)),
            len({i for i in idxs if i < start}),
        )
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(conversations())
def test_sequence_violations_match_python_walk(spark, rows):
    df = spark.createDataFrame(
        [
            (c, i, s, datetime.fromtimestamp(BASE + t, tz=timezone.utc))
            for c, i, s, t in rows
        ],
        "conv_id string, turn_idx int, role string, ts timestamp",
    )
    got = sorted(
        (r.conv_id, r.turn_idx, r.rule)
        for r in sequence_violations(
            df, "conv_id", "role", "ts", ["turn_idx", "ts"], ALLOWED, FIRST
        ).collect()
    )
    assert got == py_sequence_violations(rows)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(conversations())
def test_contiguity_report_matches_python(spark, rows):
    df = spark.createDataFrame(
        [(c, i) for c, i, _, _ in rows], "conv_id string, turn_idx int"
    )
    rep = {
        r.conv: (
            r.n_rows,
            r.min_idx,
            r.max_idx,
            r.n_dup_idx,
            r.n_missing,
            r.n_below_start,
        )
        for r in contiguity_report(df, "conv_id", "turn_idx").collect()
    }
    assert rep == py_contiguity(rows)
