"""Unit tests per rule op: compiled Spark predicates vs the pure-Python
reference validator on the same rows (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from cerberus_spark.rules import SchemaError, compile_schema, python_validate
from cerberus_spark.validation import validate

ROWS = [
    # (conv_id, turn_idx, role, text, tool, score)
    ("c1", 0, "system", "hello world", None, 1.0),
    ("c1", 1, "user", "question?", None, 2.5),
    ("c1", 2, "assistant", "answer", None, 3.0),
    ("c1", 3, "tool", "result", "search", 0.5),
    ("c2", 0, "critic", "bad role", None, -1.0),       # allowed violation
    ("c2", 1, "user", None, None, 99.0),               # required violation (+max)
    ("c2", 2, "assistant", "", None, 5.0),             # empty violation
    ("c2", 3, "user", "x" * 50, "search", 1.0),        # deps violation (tool w/o role=tool)
    ("c2", 4, "tool", "ok", "ghost", 1.0),             # (referential is separate)
    ("c3", 0, "system", "UPPER lower 123", None, 50.0),
]
SCHEMA_DDL = "conv_id string, turn_idx int, role string, text string, tool string, score double"

RULES = {
    "role": {"type": "string", "required": True, "allowed": ["system", "user", "assistant", "tool"]},
    "turn_idx": {"type": "integer", "min": 0, "max": 1000},
    "text": {"type": "string", "required": True, "empty": False, "maxlength": 40},
    "tool": {"type": "string", "nullable": True, "dependencies": {"role": "tool"}},
    "score": {"type": "number", "min": 0.0, "max": 50.0},
}


def as_dicts():
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "score"]
    return [dict(zip(cols, r)) for r in ROWS]


def spark_violations(spark, rules):
    df = spark.createDataFrame(ROWS, schema=SCHEMA_DDL)
    res = validate(df, rules, key_cols=["conv_id", "turn_idx"])
    return sorted(
        (r.conv_id, r.turn_idx, r.field, r.rule)
        for r in res.violations().collect()
    )


def python_violations(rules):
    out = []
    for row in as_dicts():
        for f, rule, _ in python_validate(row, rules):
            out.append((row["conv_id"], row["turn_idx"], f, rule))
    return sorted(out)


def test_full_ruleset_parity(spark):
    assert spark_violations(spark, RULES) == python_violations(RULES)


def test_regex_alternation_is_fully_anchored(spark):
    """'cat|dog' must full-match like re.fullmatch: '^'+pat+'$' would
    parse as (^cat)|(dog$) and wrongly accept 'category'/'hotdog'."""
    rows = [(0, "cat"), (1, "dog"), (2, "category"), (3, "hotdog"), (4, "catalog"), (5, None)]
    df = spark.createDataFrame(rows, "id int, v string")
    rules = {"v": {"type": "string", "regex": "cat|dog"}}
    res = validate(df, rules, key_cols=["id"])
    bad = sorted(r.value for r in res.violations().collect())
    assert bad == ["catalog", "category", "hotdog"]
    # parity with the python twin (re.fullmatch)
    twin = sorted(
        row["v"]
        for row in [dict(id=i, v=x) for i, x in rows]
        for _f, _rule, _v in python_validate(row, rules)
    )
    assert twin == bad


def test_length_rules_on_list_fields(spark):
    """minlength/maxlength compile to F.size for array columns (F.length
    is string-only and raises at plan time)."""
    rows = [(0, []), (1, ["a"]), (2, ["a", "b", "c", "d"]), (3, None)]
    df = spark.createDataFrame(rows, "id int, tags array<string>")
    rules = {"tags": {"type": "list", "minlength": 1, "maxlength": 3}}
    res = validate(df, rules, key_cols=["id"])
    got = sorted((r.id, r.rule) for r in res.violations().collect())
    assert got == [(0, "minlength"), (2, "maxlength")]
    twin = sorted(
        (row["id"], rule)
        for row in [dict(id=i, tags=t) for i, t in rows]
        for f, rule, _ in python_validate(row, rules)
    )
    assert twin == got


@pytest.mark.parametrize(
    "rules",
    [
        {"role": {"allowed": ["system", "user"]}},
        {"role": {"forbidden": ["critic"]}},
        {"score": {"min": 1.0}},
        {"score": {"max": 2.5}},
        {"text": {"minlength": 8}},
        {"text": {"maxlength": 8}},
        {"text": {"regex": "[a-z ?]*"}},
        {"text": {"required": True}},
        {"tool": {"nullable": False}},
        {"text": {"empty": False}},
        {"tool": {"dependencies": {"role": "tool"}}},
        {"tool": {"dependencies": {"role": ["tool", "assistant"]}}},
        {"tool": {"dependencies": "text"}},
    ],
)
def test_single_rule_parity(spark, rules):
    assert spark_violations(spark, rules) == python_violations(rules)


def test_each_rule_fires(spark):
    got = spark_violations(spark, RULES)
    fired = {(f, r) for (_, _, f, r) in got}
    assert ("role", "allowed") in fired
    assert ("text", "required") in fired
    assert ("text", "empty") in fired
    assert ("text", "maxlength") in fired
    assert ("tool", "dependencies") in fired
    assert ("score", "min") in fired
    assert ("score", "max") in fired


def test_null_gating(spark):
    # null text must NOT fire value rules (maxlength/regex), only required
    got = spark_violations(spark, {"text": {"required": True, "maxlength": 5, "regex": "x+"}})
    null_row = [(c, t, f, r) for (c, t, f, r) in got if (c, t) == ("c2", 1)]
    assert null_row == [("c2", 1, "text", "required")]


def test_custom_rule(spark):
    from pyspark.sql import functions as F

    rules = {"text": {"custom": lambda c: F.length(c) % 2 == 0}}
    got = spark_violations(spark, rules)
    for row in as_dicts():
        expected_violated = row["text"] is not None and len(row["text"]) % 2 == 1
        present = (row["conv_id"], row["turn_idx"], "text", "custom") in got
        assert present == expected_violated


def test_vcheck_json(spark):
    rows = [("a", '{"k": 1}'), ("b", "not json"), ("c", "[1,2]"), ("d", None)]
    df = spark.createDataFrame(rows, "id string, payload string")
    res = validate(df, {"payload": {"vcheck": "json_object"}}, key_cols=["id"])
    bad = {r.id for r in res.violations().collect()}
    assert bad == {"b", "c"}


def test_type_mismatch_is_schema_error(spark):
    df = spark.createDataFrame([("x", 1)], "a string, b int")
    res = validate(df, {"a": {"type": "integer"}, "b": {"type": "integer", "min": 0}})
    assert len(res.schema_errors) == 1
    assert "a" in res.schema_errors[0]


def test_unknown_field_is_schema_error(spark):
    df = spark.createDataFrame([("x",)], "a string")
    res = validate(df, {"zzz": {"required": True}})
    assert res.schema_errors and "zzz" in res.schema_errors[0]


def test_unknown_rule_raises():
    with pytest.raises(SchemaError):
        compile_schema({"a": {"nope": 1}})


def test_unknown_type_raises():
    with pytest.raises(SchemaError):
        compile_schema({"a": {"type": "quux"}})
