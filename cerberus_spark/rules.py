"""Rule-dict -> Catalyst predicate compiler.

The reference classifies every event through hand-written per-row rule
cascades (reference: internal/monitor/monitor.go:80-188 — allowed port
sets, bitmask tests, value equality, enum dispatch, prefix matching,
byte-range predicates).  We generalize those shapes into a declarative,
Cerberus-style rule vocabulary and compile each rule ONCE on the driver
into a Spark ``Column`` predicate; a single ``select`` then evaluates
every rule for every row columnarly inside whole-stage codegen — no
per-row Python, no shuffle.

Rule vocabulary (per field):
    type:         logical type name; checked against the DataFrame
                  schema at COMPILE time (a mismatch is a schema error,
                  like the reference's record-length check,
                  cmd/cerberus/main.go:173-177)
    required:     True -> NULL is a violation ("required")
    nullable:     False -> NULL is a violation ("nullable");
                  True -> NULLs skip all other checks for this field
    allowed:      list of allowed values (reference: TCP port allowlist
                  monitor.go:83-90, ICMP type switch monitor.go:137-150)
    forbidden:    list of disallowed values
    min / max:    inclusive bounds (reference: TLS version byte range,
                  ebpf/cerberus_tc.c:108-122)
    minlength / maxlength: bounds on string/array length
    regex:        full-match-or-violation via rlike (reference: HTTP
                  method prefix rules monitor.go:165-173)
    empty:        False -> empty string is a violation
    dependencies: {"other_field": value-or-list} — this field may be
                  non-null only when every dependency holds (reference:
                  ARP src==dst cross-field rule monitor.go:121-134)
    custom:       callable(Column) -> Column returning True when VALID
                  (escape hatch; still a Catalyst expression)
    vcheck:       name of a registered Arrow-vectorized checker
                  (pandas_udf; the designated slow path for semantics
                  Catalyst can't express)

Violation output is normalized rows ``(…keys, field, rule, value)`` —
the engine's analog of the reference's CommunicationPattern finding rows
(internal/models/types.go:97-108).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# type name -> acceptable Spark types
# ---------------------------------------------------------------------------

_INTEGER_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)

TYPE_MAP: dict[str, tuple[type, ...]] = {
    "string": (T.StringType,),
    "integer": _INTEGER_TYPES,
    "float": _FLOAT_TYPES,
    "number": _INTEGER_TYPES + _FLOAT_TYPES,
    "boolean": (T.BooleanType,),
    "timestamp": (T.TimestampType, T.TimestampNTZType),
    "date": (T.DateType,),
    "binary": (T.BinaryType,),
    "list": (T.ArrayType,),
    "dict": (T.MapType, T.StructType),
}

KNOWN_RULES = {
    "type", "required", "nullable", "allowed", "forbidden", "min", "max",
    "minlength", "maxlength", "regex", "empty", "dependencies", "custom",
    "vcheck",
}


class SchemaError(ValueError):
    """Raised at compile time for malformed rule dicts / type mismatches."""


# ---------------------------------------------------------------------------
# Arrow-vectorized checker registry (the ONLY sanctioned Python-side path)
# ---------------------------------------------------------------------------

def _vcheck_json_object(s: pd.Series) -> pd.Series:
    """True when the string parses as a JSON object."""
    import json

    def ok(x: Any) -> bool:
        if x is None:
            return True  # null-ness handled by required/nullable rules
        try:
            return isinstance(json.loads(x), dict)
        except Exception:
            return False

    return s.map(ok).astype("boolean")


def _vcheck_printable(s: pd.Series) -> pd.Series:
    """True when the string contains no C0 control chars (except \\t\\n\\r)."""
    pat = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
    return s.map(lambda x: x is None or pat.search(x) is None).astype("boolean")


VCHECKS: dict[str, Callable[[pd.Series], pd.Series]] = {
    "json_object": _vcheck_json_object,
    "printable": _vcheck_printable,
}


def register_vcheck(name: str, fn: Callable[[pd.Series], pd.Series]) -> None:
    VCHECKS[name] = fn


# ---------------------------------------------------------------------------
# compiled form
# ---------------------------------------------------------------------------

@dataclass
class CompiledRule:
    field: str
    rule: str
    violated: Column  # boolean Column: True when the row VIOLATES the rule


@dataclass
class CompiledRuleSet:
    rules: list[CompiledRule]
    schema_errors: list[str] = dc_field(default_factory=list)

    def violation_structs(self) -> list[Column]:
        """One nullable struct<field,rule,value> per compiled rule."""
        out = []
        for r in self.rules:
            out.append(
                F.when(
                    r.violated,
                    F.struct(
                        F.lit(r.field).alias("field"),
                        F.lit(r.rule).alias("rule"),
                        F.col(r.field).cast("string").alias("value"),
                    ),
                )
            )
        return out


def _null_gate(col: Column, pred: Column) -> Column:
    """Value rules only fire on non-null values (null-ness has its own
    rules); mirrors the reference's bounds-check-before-read discipline
    (ebpf/cerberus_tc.c:129-139)."""
    return col.isNotNull() & pred


def compile_schema(
    schema: dict[str, dict[str, Any]],
    df_schema: T.StructType | None = None,
) -> CompiledRuleSet:
    """Compile a rule dict into violation predicates.

    ``df_schema`` enables compile-time checks: unknown fields and
    ``type`` mismatches become schema errors rather than per-row work.
    """
    rules: list[CompiledRule] = []
    schema_errors: list[str] = []
    fields_by_name = {f.name: f for f in df_schema.fields} if df_schema else {}

    for fname, fr in schema.items():
        if not isinstance(fr, dict):
            raise SchemaError(f"rules for field {fname!r} must be a dict")
        unknown = set(fr) - KNOWN_RULES
        if unknown:
            raise SchemaError(f"unknown rule(s) {sorted(unknown)} for field {fname!r}")
        if df_schema is not None and fname not in fields_by_name:
            schema_errors.append(f"field {fname!r} not present in input schema")
            continue
        col = F.col(fname)

        # --- compile-time type check ---------------------------------
        want = fr.get("type")
        if want is not None:
            accept = TYPE_MAP.get(want)
            if accept is None:
                raise SchemaError(f"unknown type {want!r} for field {fname!r}")
            if df_schema is not None:
                actual = fields_by_name[fname].dataType
                if not isinstance(actual, accept):
                    schema_errors.append(
                        f"field {fname!r}: declared type {want!r}, "
                        f"input has {actual.simpleString()}"
                    )
                    continue

        nullable_ok = fr.get("nullable", True)

        if fr.get("required", False):
            rules.append(CompiledRule(fname, "required", col.isNull()))
        elif nullable_ok is False:
            rules.append(CompiledRule(fname, "nullable", col.isNull()))

        if "allowed" in fr:
            rules.append(
                CompiledRule(fname, "allowed", _null_gate(col, ~col.isin(list(fr["allowed"]))))
            )
        if "forbidden" in fr:
            rules.append(
                CompiledRule(fname, "forbidden", _null_gate(col, col.isin(list(fr["forbidden"]))))
            )
        if "min" in fr:
            rules.append(CompiledRule(fname, "min", _null_gate(col, col < F.lit(fr["min"]))))
        if "max" in fr:
            rules.append(CompiledRule(fname, "max", _null_gate(col, col > F.lit(fr["max"]))))
        # length vs size: strings/binary use F.length; arrays/maps use
        # F.size (F.length on an ArrayType raises AnalysisException at
        # plan time).  Decide from the actual DataFrame type when we
        # have it, else from the declared logical type.
        if df_schema is not None:
            _is_collection = isinstance(
                fields_by_name[fname].dataType, (T.ArrayType, T.MapType)
            )
        else:
            _is_collection = want in ("list", "dict")
        length_fn = F.size if _is_collection else F.length
        if "minlength" in fr:
            rules.append(
                CompiledRule(fname, "minlength", _null_gate(col, length_fn(col) < int(fr["minlength"])))
            )
        if "maxlength" in fr:
            rules.append(
                CompiledRule(fname, "maxlength", _null_gate(col, length_fn(col) > int(fr["maxlength"])))
            )
        if "regex" in fr:
            # Cerberus semantics: the WHOLE value must match
            # (re.fullmatch in the python twin).  Anchor with a
            # non-capturing group: "^" + "cat|dog" + "$" would parse as
            # (^cat)|(dog$) because alternation binds looser than the
            # anchors, wrongly matching "category".
            anchored = f"^(?:{fr['regex']})$"
            rules.append(CompiledRule(fname, "regex", _null_gate(col, ~col.rlike(anchored))))
        if fr.get("empty", True) is False:
            rules.append(CompiledRule(fname, "empty", _null_gate(col, F.length(col) == 0)))
        if "dependencies" in fr:
            dep = fr["dependencies"]
            if isinstance(dep, str):
                dep = {dep: None}
            elif isinstance(dep, (list, tuple)):
                dep = {d: None for d in dep}
            conds = []
            for dfield, dval in dep.items():
                dcol = F.col(dfield)
                if dval is None:
                    conds.append(dcol.isNotNull())
                elif isinstance(dval, (list, tuple, set)):
                    # coalesce(False): a NULL dependency column must
                    # mean NOT-met (SQL three-valued logic would
                    # otherwise turn the whole predicate NULL and
                    # silently swallow the violation)
                    conds.append(F.coalesce(dcol.isin(list(dval)), F.lit(False)))
                else:
                    conds.append(F.coalesce(dcol == F.lit(dval), F.lit(False)))
            deps_met = conds[0]
            for c in conds[1:]:
                deps_met = deps_met & c
            # field may only be non-null when all dependencies hold
            rules.append(CompiledRule(fname, "dependencies", col.isNotNull() & ~deps_met))
        if "custom" in fr:
            valid = fr["custom"](col)
            rules.append(CompiledRule(fname, "custom", _null_gate(col, ~valid)))
        if "vcheck" in fr:
            name = fr["vcheck"]
            fn = VCHECKS.get(name)
            if fn is None:
                raise SchemaError(f"unknown vcheck {name!r} for field {fname!r}")
            checker = F.pandas_udf(fn, T.BooleanType())
            rules.append(CompiledRule(fname, f"vcheck:{name}", _null_gate(col, ~checker(col))))

    return CompiledRuleSet(rules=rules, schema_errors=schema_errors)


# ---------------------------------------------------------------------------
# Pure-Python reference validator — the pytest oracle.
# Implements the SAME semantics row-at-a-time; Spark results must agree
# per-turn under stable (conv_id, turn_idx) ordering.
# ---------------------------------------------------------------------------

def python_validate(row: dict[str, Any], schema: dict[str, dict[str, Any]]) -> list[tuple[str, str, Any]]:
    """Return [(field, rule, value), ...] violations for one row."""
    out: list[tuple[str, str, Any]] = []

    def length_of(v: Any) -> int:
        return len(v)

    for fname, fr in schema.items():
        v = row.get(fname)
        if fr.get("required", False):
            if v is None:
                out.append((fname, "required", v))
        elif fr.get("nullable", True) is False:
            if v is None:
                out.append((fname, "nullable", v))
        if v is not None:
            if "allowed" in fr and v not in fr["allowed"]:
                out.append((fname, "allowed", v))
            if "forbidden" in fr and v in fr["forbidden"]:
                out.append((fname, "forbidden", v))
            if "min" in fr and v < fr["min"]:
                out.append((fname, "min", v))
            if "max" in fr and v > fr["max"]:
                out.append((fname, "max", v))
            if "minlength" in fr and length_of(v) < fr["minlength"]:
                out.append((fname, "minlength", v))
            if "maxlength" in fr and length_of(v) > fr["maxlength"]:
                out.append((fname, "maxlength", v))
            if "regex" in fr and not re.fullmatch(fr["regex"], v):
                out.append((fname, "regex", v))
            if fr.get("empty", True) is False and isinstance(v, str) and len(v) == 0:
                out.append((fname, "empty", v))
            if "dependencies" in fr:
                dep = fr["dependencies"]
                if isinstance(dep, str):
                    dep = {dep: None}
                elif isinstance(dep, (list, tuple)):
                    dep = {d: None for d in dep}
                met = True
                for dfield, dval in dep.items():
                    dv = row.get(dfield)
                    if dval is None:
                        met = met and dv is not None
                    elif isinstance(dval, (list, tuple, set)):
                        met = met and dv in dval
                    else:
                        met = met and dv == dval
                if not met:
                    out.append((fname, "dependencies", v))
            if "vcheck" in fr:
                fn = VCHECKS[fr["vcheck"]]
                ok = bool(fn(pd.Series([v])).iloc[0])
                if not ok:
                    out.append((fname, f"vcheck:{fr['vcheck']}", v))
    return out


def python_validate_frame(
    rows: list[dict[str, Any]], schema: dict[str, dict[str, Any]]
) -> list[dict[str, Any]]:
    """Validate many rows; returns normalized violation dicts (without keys)."""
    out = []
    for row in rows:
        for fname, rule, value in python_validate(row, schema):
            rec = dict(row)
            rec["_field"], rec["_rule"], rec["_value"] = fname, rule, value
            out.append(rec)
    return out
