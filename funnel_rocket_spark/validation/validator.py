"""Query validation + expansion.

Mirrors the reference's validator pipeline (``/root/reference/frocket/common/
validation/query_validator.py:65-142`` and ``visitor_functions.py``): JSON-Schema
check, shorthand→verbose rewrite of filters and targets, default-target
injection, default-aggregation expansion, ``includeZero`` inference/validation,
relation parse, column/type/operator checks against the dataset schema, and
used-column collection. Output is the "expanded query" — the only form the
planner accepts.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Optional

import jsonschema

from funnel_rocket_spark.validation.query_schema import QUERY_SCHEMA

# Compiled once: jsonschema.validate(instance, schema) re-validates the
# SCHEMA ITSELF against its metaschema on every call (~0.14 s of pure
# driver CPU per query plan — measured under cProfile as 3,071
# jsonschema ``descend`` calls inside ``check_schema``). The schema is a
# module constant, so check it once and reuse the compiled validator;
# error semantics are identical (``best_match`` of ``iter_errors``, the
# exact raise path of ``jsonschema.validate``).
_QUERY_VALIDATOR_CLS = jsonschema.validators.validator_for(QUERY_SCHEMA)
_QUERY_VALIDATOR_CLS.check_schema(QUERY_SCHEMA)
_QUERY_VALIDATOR = _QUERY_VALIDATOR_CLS(QUERY_SCHEMA)
from funnel_rocket_spark.validation.relation import (
    RelationError,
    default_relation,
    parse_relation,
)

DEFAULT_TARGET = {"type": "count", "op": ">=", "value": 1}
DEFAULT_AGGREGATIONS = ["count", "countPerValue", "groupsPerValue"]
AGGR_TYPES_WITH_OTHER_COLUMN = {"sumPerValue", "meanPerValue"}
INCLUDE_ZERO_TARGET_TYPES = {"count"}
INCLUDE_ZERO_TARGET_OPS = {"<", "<=", "==", "!=", ">="}
NUMERIC_OPERATORS = {"==", "!=", ">", ">=", "<", "<="}
EQUALITY_OPERATORS = {"==", "!="}
STRING_OPERATORS = {"==", "!=", "contains", "not contains", "regex"}

# Operator families allowed per logical column type (reference consts.py:54-59;
# 'regex' there is declared but unreachable — here it is implemented).
OPERATORS_BY_KIND = {
    "numeric": NUMERIC_OPERATORS,
    "bool": EQUALITY_OPERATORS,
    "string": STRING_OPERATORS,
}


class QueryValidationError(ValueError):
    def __init__(self, message: str, kind: str = "schema"):
        super().__init__(message)
        self.kind = kind


@dataclass
class ExpandedQuery:
    """Validated + fully-expanded query, ready for the planner."""

    query: dict
    used_columns: list[str] = field(default_factory=list)
    relation_template: Optional[str] = None  # "{0} AND ({1} OR {2})"
    used_conditions: list[int] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def _err(message: str, kind: str = "schema") -> None:
    raise QueryValidationError(message, kind)


def _verbose_filter(f: Any) -> dict:
    if isinstance(f, list):
        if len(f) != 3:
            _err(f"Shorthand filter must have 3 elements: {f}")
        return {"column": f[0], "op": f[1], "value": f[2]}
    return f


def _verbose_target(t: Any) -> dict:
    if isinstance(t, list):
        if len(t) == 3:
            return {"type": t[0], "op": t[1], "value": t[2]}
        if len(t) == 4:
            return {"type": t[0], "column": t[1], "op": t[2], "value": t[3]}
        _err(f"Shorthand target must have 3 or 4 elements: {t}")
    return t


def _expand_condition(cond: dict) -> None:
    if "filter" in cond:
        cond["filter"] = _verbose_filter(cond["filter"])
    if "filters" in cond:
        cond["filters"] = [_verbose_filter(f) for f in cond["filters"]]
    if "sequence" in cond:
        for step in cond["sequence"]:
            _expand_step(step)
        return  # sequence conditions have no target / includeZero
    if "target" not in cond:
        cond["target"] = dict(DEFAULT_TARGET)
    else:
        cond["target"] = _verbose_target(cond["target"])
    _check_include_zero(cond)


def _expand_step(step: dict) -> None:
    if "filter" in step:
        step["filter"] = _verbose_filter(step["filter"])
    if "filters" in step:
        step["filters"] = [_verbose_filter(f) for f in step["filters"]]


def _check_include_zero(cond: dict) -> None:
    """Validate/infer ``includeZero`` exactly like the reference
    (``visitor_functions.py:91-143``)."""
    target = cond["target"]
    ttype, top, tvalue = target["type"], target["op"], target["value"]
    iz = cond.get("includeZero")
    tdesc = f"{ttype} {top} {tvalue}"

    if ttype not in INCLUDE_ZERO_TARGET_TYPES:
        if iz:
            _err(
                f"'includeZero' is not applicable for target type '{ttype}'",
                "type_mismatch",
            )
        return

    if iz:
        if top not in INCLUDE_ZERO_TARGET_OPS:
            _err(
                f"For target operator '{top}', 'includeZero' cannot be true",
                "type_mismatch",
            )
        if top == "<" and tvalue == 0:
            _err("Target implies a negative value", "type_mismatch")
        if (top == "!=" and tvalue == 0) or (top in ("==", ">=") and tvalue != 0):
            _err(
                f"Target {tdesc} explicitly precludes zero; 'includeZero' cannot be true",
                "type_mismatch",
            )
    else:
        if top == "==" and tvalue == 0:
            if iz is None:
                cond["includeZero"] = True
            else:  # explicitly False
                _err(
                    f"With target {tdesc}, 'includeZero' cannot be false",
                    "type_mismatch",
                )


def _expand_aggregations(aggs: list[dict]) -> list[dict]:
    """No-type aggregations expand into the default battery
    (reference ``visitor_functions.py:74-88``, defaults ``consts.py:36``)."""
    result = []
    for agg in aggs:
        if agg.get("type"):
            other_needed = agg["type"] in AGGR_TYPES_WITH_OTHER_COLUMN
            if other_needed != ("otherColumn" in agg):
                _err(
                    f"Aggregation type '{agg['type']}' "
                    + ("requires" if other_needed else "does not take")
                    + " 'otherColumn'"
                )
            result.append(agg)
        else:
            if "name" in agg:
                _err(
                    f"Aggregation {agg} expands into multiple defaults; "
                    f"'name' is not supported on it"
                )
            if "otherColumn" in agg:
                _err("Default aggregation expansion does not take 'otherColumn'")
            result.extend({**agg, "type": t} for t in DEFAULT_AGGREGATIONS)
    return result


def _column_kind(dtype: str) -> Optional[str]:
    d = dtype.lower()
    if d in ("tinyint", "smallint", "int", "integer", "bigint", "long", "float",
             "double", "decimal") or d.startswith("decimal"):
        return "numeric"
    if d in ("timestamp", "timestamp_ntz", "date"):
        return "numeric"  # timestamps compare like numerics for our purposes
    if d in ("string", "varchar", "char") or d.startswith(("varchar", "char")):
        return "string"
    if d == "boolean":
        return "bool"
    return None


def _check_filter(f: dict, schema: Optional[dict[str, str]], where: str) -> None:
    op, value = f["op"], f["value"]
    if schema is None:
        return
    col = f["column"]
    if col not in schema:
        _err(f"Unknown column '{col}' in {where}", "unknown_column")
    kind = _column_kind(schema[col])
    if kind is None:
        _err(f"Column '{col}' has unsupported type '{schema[col]}'", "type_mismatch")
    if op not in OPERATORS_BY_KIND[kind]:
        _err(f"Operator '{op}' not applicable to {kind} column '{col}'", "type_mismatch")
    ok = {
        "numeric": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
        "bool": lambda v: isinstance(v, bool),
        "string": lambda v: isinstance(v, str),
    }[kind]
    if not ok(value):
        _err(
            f"Value {value!r} not applicable to {kind} column '{col}' in {where}",
            "type_mismatch",
        )


def _check_numeric_column(col: str, schema: Optional[dict[str, str]], where: str) -> None:
    if schema is None:
        return
    if col not in schema:
        _err(f"Unknown column '{col}' in {where}", "unknown_column")
    if _column_kind(schema[col]) != "numeric":
        _err(f"Column '{col}' in {where} must be numeric", "type_mismatch")


def _collect_filters(cond_or_step: dict) -> list[dict]:
    out = []
    if "filter" in cond_or_step:
        out.append(cond_or_step["filter"])
    if "filters" in cond_or_step:
        out.extend(cond_or_step["filters"])
    return out


def check_timeframe_scale(query: dict, dataset_min_ts: Optional[float],
                          dataset_max_ts: Optional[float]) -> None:
    """Digit-count sanity check of timeframe values against the dataset's
    timestamp range (reference ``query_validator.py:268-299`` — the engine is
    deliberately unopinionated about resolution, so only the SCALE is
    checked: a seconds-scale 'from' against a nanos-scale dataset is almost
    certainly a unit mistake)."""
    tf = query.get("timeframe") or {}

    def digits(x: float) -> int:
        return len(str(abs(int(x)))) if x else 1

    for key, bound in (("from", dataset_min_ts), ("to", dataset_max_ts)):
        value = tf.get(key)
        if value is None or bound is None:
            continue
        if digits(value) != digits(bound):
            _err(
                f"Timeframe '{key}'={value} does not appear to be in the same "
                f"scale as the dataset's timestamps (~{int(bound)})",
                "type_mismatch",
            )


def expand_and_validate(
    query: dict,
    dataset_schema: Optional[dict[str, str]] = None,
    group_id_column: str = "group_id",
    timestamp_column: str = "timestamp",
) -> ExpandedQuery:
    """Validate ``query`` and return its expanded form.

    ``dataset_schema`` maps column name → Spark SQL type string; when given,
    column existence and operator/value applicability are checked
    (reference ``query_validator.py:176-229``).
    """
    schema_err = jsonschema.exceptions.best_match(
        _QUERY_VALIDATOR.iter_errors(query))
    if schema_err is not None:
        _err(f"Query does not match schema: {schema_err.message}")

    q = copy.deepcopy(query)
    conditions = q.get("query", {}).get("conditions", []) or []

    for cond in conditions:
        _expand_condition(cond)

    # Unique condition names + name→index map (reference consts.py:78-83)
    names: dict[str, int] = {}
    for i, cond in enumerate(conditions):
        if "name" in cond:
            key = cond["name"].strip().lower()
            if key in names:
                _err(f"Duplicate condition name '{cond['name']}'")
            if key in ("and", "or", "&&", "||"):
                _err(f"'{key}' is not a valid condition name")
            names[key] = i

    # Aggregation expansion in all three locations (reference consts.py:37-39)
    if "aggregations" in q.get("query", {}):
        q["query"]["aggregations"] = _expand_aggregations(q["query"]["aggregations"])
    funnel = q.get("funnel")
    if funnel:
        for step in funnel["sequence"]:
            _expand_step(step)
        for key in ("stepAggregations", "endAggregations"):
            if key in funnel:
                funnel[key] = _expand_aggregations(funnel[key])

    # Relation: default AND of all, or parse the user expression
    relation_template = None
    used_conditions: list[int] = []
    if conditions:
        rel = q.get("query", {}).get("relation")
        if rel is not None and not rel.strip():
            _err("Relation cannot be an empty string", "relation")
        # A bare operator ("and"/"or"/"&&"/"||") combines ALL conditions with
        # that op (reference query_validator.py:243-256).
        if rel and rel.strip().lower() in ("and", "or", "&&", "||"):
            op = rel.strip().lower()
            rel = f" {op} ".join(f"${i}" for i in range(len(conditions)))
        if rel:
            try:
                relation_template, used_conditions = parse_relation(
                    rel, len(conditions), names
                )
            except RelationError as re_:
                _err(str(re_), "relation")
        else:
            relation_template = default_relation(len(conditions))
            used_conditions = list(range(len(conditions)))

    # Column/type checks + used-column collection
    used: list[str] = []

    def use(col: str) -> None:
        if col not in used:
            used.append(col)

    use(group_id_column)
    use(timestamp_column)

    all_agg_lists = [q.get("query", {}).get("aggregations") or []]
    if funnel:
        all_agg_lists += [funnel.get("stepAggregations") or [],
                          funnel.get("endAggregations") or []]

    for ci, cond in enumerate(conditions):
        where = f"condition #{ci}"
        for f in _collect_filters(cond):
            _check_filter(f, dataset_schema, where)
            use(f["column"])
        for step in cond.get("sequence", []) or []:
            for f in _collect_filters(step):
                _check_filter(f, dataset_schema, where + " sequence")
                use(f["column"])
        target = cond.get("target")
        if target and target["type"] == "sum":
            _check_numeric_column(target["column"], dataset_schema, where + " target")
            use(target["column"])

    if funnel:
        for step in funnel["sequence"]:
            for f in _collect_filters(step):
                _check_filter(f, dataset_schema, "funnel sequence")
                use(f["column"])

    agg_names: dict[str, int] = {}
    for aggs in all_agg_lists:
        for ai, agg in enumerate(aggs):
            if dataset_schema is not None and agg["column"] not in dataset_schema:
                _err(f"Unknown aggregation column '{agg['column']}'", "unknown_column")
            use(agg["column"])
            if "otherColumn" in agg:
                _check_numeric_column(agg["otherColumn"], dataset_schema, "aggregation")
                use(agg["otherColumn"])
            if "name" in agg:
                if agg["name"] in agg_names:
                    _err(f"Duplicate aggregation name '{agg['name']}'")
                agg_names[agg["name"]] = ai

    # Timeframe sanity: from < to when both present
    tf = q.get("timeframe") or {}
    if "from" in tf and "to" in tf and tf["from"] >= tf["to"]:
        _err("timeframe 'from' must be strictly before 'to'", "type_mismatch")

    warnings: list[str] = []
    unused = sorted(set(range(len(conditions))) - set(used_conditions))
    if unused:  # a reference TODO (query_validator.py:264) — implemented here
        warnings.append(
            f"Conditions {unused} are not referenced by the relation "
            f"expression and will not affect matching")

    return ExpandedQuery(
        query=q,
        used_columns=used,
        relation_template=relation_template,
        used_conditions=used_conditions,
        warnings=warnings,
    )
