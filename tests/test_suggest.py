"""Constraint suggestion: exact profile rows, HLL gate, round-trip
(suggested rules validate the profiled table clean)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cerberus_spark.checks.suggest import (
    profile_columns,
    suggest_ruleset,
    suggestion_rows,
)
from cerberus_spark.validation import validate

ROWS = [
    (1, "click", 0.5, "short", dt.datetime(2024, 1, 1, 10, 0, 0)),
    (2, "view", -1.25, "a longer string", dt.datetime(2024, 1, 2, 11, 30, 0)),
    (3, "click", 2.0, None, dt.datetime(2024, 1, 3, 9, 15, 0)),
    (4, "purchase", 0.0, "mid", dt.datetime(2024, 1, 1, 10, 0, 0)),
]
DDL = "id long, etype string, val double, note string, ts timestamp"


@pytest.fixture(scope="module")
def fx(spark):
    return spark.createDataFrame(ROWS, DDL)


def test_suggestion_rows_exact(spark, fx):
    got = {(r.field, r.rule): r.value for r in suggestion_rows(spark, fx).collect()}
    assert got[("id", "nullable")] == "false"
    assert got[("id", "min")] == "1" and got[("id", "max")] == "4"
    assert got[("etype", "allowed")] == "click|purchase|view"
    assert got[("val", "min")] == "-1.250000" and got[("val", "max")] == "2.000000"
    assert got[("note", "nullable")] == "true"
    assert got[("note", "minlength")] == "3" and got[("note", "maxlength")] == "15"
    assert got[("ts", "min")] == "2024-01-01 10:00:00"
    assert got[("ts", "max")] == "2024-01-03 09:15:00"


def test_distinct_cap_gates_allowed(spark):
    df = spark.createDataFrame([(i, f"u{i:04d}") for i in range(200)], "id long, uid string")
    prof = profile_columns(df, distinct_cap=16)
    assert "values" not in prof["uid"]
    rs = suggest_ruleset(df, distinct_cap=16)
    assert "allowed" not in rs["uid"]
    # but present when the cap is raised above the cardinality
    assert len(suggest_ruleset(df, distinct_cap=200)["uid"]["allowed"]) == 200


def test_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, x string")
    got = {(r.field, r.rule): r.value for r in suggestion_rows(spark, df).collect()}
    assert got[("x", "nullable")] == "true"
    assert ("x", "minlength") not in got  # no non-null lengths observed
    assert ("x", "allowed") not in got


def test_empty_table(spark):
    df = spark.createDataFrame([], DDL)
    assert suggestion_rows(spark, df).count() == 0
    assert profile_columns(df)["id"]["n"] == 0


def test_round_trip_validates_clean(fx):
    rs = suggest_ruleset(fx)
    res = validate(fx, rs, key_cols=["id"])
    assert res.annotated.filter("NOT _passed").count() == 0


def test_round_trip_catches_out_of_envelope(spark, fx):
    rs = suggest_ruleset(fx)
    bad = spark.createDataFrame(
        [(9, "refund", 99.0, "x" * 40, dt.datetime(2025, 6, 1))], DDL
    )
    viol = validate(bad, rs, key_cols=["id"]).annotated.filter("NOT _passed")
    flat = {(f.field, f.rule) for r in viol.collect() for f in r._violations}
    assert ("etype", "allowed") in flat
    assert ("val", "max") in flat
    assert ("note", "maxlength") in flat
    assert ("ts", "max") in flat


def test_suggest_bin_edges_equidepth(spark):
    import numpy as np

    from cerberus_spark.checks.suggest import suggest_bin_edges

    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    edges = suggest_bin_edges(df, "v", n_bins=4)
    want = [round(float(q), 6) for q in np.percentile(vals, [0, 25, 50, 75, 100])]
    assert edges == want


def test_suggest_bin_edges_point_mass_collapses(spark):
    from cerberus_spark.checks.suggest import suggest_bin_edges

    df = spark.createDataFrame([(1.0,)] * 50 + [(9.0,)], "v double")
    edges = suggest_bin_edges(df, "v", n_bins=4)
    assert edges[0] == 1.0 and edges[-1] == 9.0
    assert edges == sorted(set(edges))  # strictly increasing after dedup


# ---------------------------------------------------------------------------
# property: the suggested envelope NEVER flags the data it came from
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cell = st.one_of(
    st.none(),
    st.text(alphabet="abcXYZ09 |,", min_size=0, max_size=12),
)
_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**40), max_value=2**40),
        _cell,
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-1e9, max_value=1e9)),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_rows)
def test_round_trip_property_never_flags_own_data(spark, rows):
    df = spark.createDataFrame(rows, "i long, s string, f double")
    rs = suggest_ruleset(df, distinct_cap=8)
    res = validate(df.withColumn("_k", F.monotonically_increasing_id()), rs, key_cols=["_k"])
    bad = res.annotated.filter("NOT _passed")
    assert bad.count() == 0, (rows, rs, bad.collect())


def test_suggest_ruleset_json_serializable(spark, fx):
    import json

    from cerberus_spark.checks.suggest import suggest_ruleset_json

    rs = suggest_ruleset_json(fx)
    # round-trips through json and timestamps render as strings
    loaded = json.loads(json.dumps(rs))
    assert loaded["ts"]["min"] == "2024-01-01 10:00:00"
    assert loaded["id"]["min"] == 1 and isinstance(loaded["val"]["max"], float)
