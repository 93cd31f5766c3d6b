"""JSON Schema for the query document, as a Python dict.

Captures the same grammar the reference engine accepts (see
``/root/reference/frocket/resources/query_schema.json``): a query is an optional
``timeframe``, an optional ``query`` block (conditions + relation + aggregations)
and an optional ``funnel`` block (sequence + step/end aggregations). Written
fresh for this engine; two schema-declared-but-unimplemented reference features
(``maxDuration``, ``rowFound: false`` — reference ``query_schema.json:40,168``)
are first-class here.
"""

_NUMERIC_OPS = ["==", "!=", ">", ">=", "<", "<="]
_STRING_OPS = ["==", "!=", "contains", "not contains", "regex"]

_FILTER_VERBOSE = {
    "type": "object",
    "required": ["column", "op", "value"],
    "additionalProperties": False,
    "properties": {
        "column": {"type": "string"},
        "op": {"enum": sorted(set(_NUMERIC_OPS) | set(_STRING_OPS))},
        "value": {"type": ["string", "number", "boolean"]},
    },
}

# Shorthand: ["column", "op", value]
_FILTER_SHORTHAND = {
    "type": "array",
    "minItems": 3,
    "maxItems": 3,
    "prefixItems": [
        {"type": "string"},
        {"enum": sorted(set(_NUMERIC_OPS) | set(_STRING_OPS))},
        {"type": ["string", "number", "boolean"]},
    ],
}

_FILTER = {"anyOf": [_FILTER_SHORTHAND, _FILTER_VERBOSE]}

# INTENTIONAL EXTENSION (not reference parity): the reference schema
# restricts filter-array items to verbose form (reference
# query_schema.json filterArray -> singleVerboseFilter; its
# visitor_functions.py:110 notes arrays are always verbose), so a
# shorthand-in-array query the reference 400s validates here. We accept
# BOTH forms because the expansion code converts shorthand inside
# 'filters' (validator._expand_condition / _expand_step) — strictly a
# superset: every reference-valid query validates identically.
_FILTER_ARRAY = {"type": "array", "minItems": 1, "items": _FILTER}

# Target: count/sum comparison, verbose or shorthand list form.
_TARGET = {
    "anyOf": [
        {  # ["count", op, N]
            "type": "array",
            "minItems": 3,
            "maxItems": 3,
            "prefixItems": [
                {"const": "count"},
                {"enum": _NUMERIC_OPS},
                {"type": "integer", "minimum": 0},
            ],
        },
        {  # ["sum", column, op, N]
            "type": "array",
            "minItems": 4,
            "maxItems": 4,
            "prefixItems": [
                {"const": "sum"},
                {"type": "string"},
                {"enum": _NUMERIC_OPS},
                {"type": "number"},
            ],
        },
        {
            "type": "object",
            "required": ["type", "op", "value"],
            "additionalProperties": False,
            "properties": {
                "type": {"const": "count"},
                "op": {"enum": _NUMERIC_OPS},
                "value": {"type": "integer", "minimum": 0},
            },
        },
        {
            "type": "object",
            "required": ["type", "column", "op", "value"],
            "additionalProperties": False,
            "properties": {
                "type": {"const": "sum"},
                "column": {"type": "string"},
                "op": {"enum": _NUMERIC_OPS},
                "value": {"type": "number"},
            },
        },
    ]
}

_SEQUENCE_STEP = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "rowFound": {"type": "boolean"},
        "filter": _FILTER,
        "filters": _FILTER_ARRAY,
    },
    "oneOf": [{"required": ["filter"]}, {"required": ["filters"]}],
}

_SEQUENCE = {"type": "array", "minItems": 1, "items": _SEQUENCE_STEP}

_CONDITION = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "name": {"type": "string"},
        "filter": _FILTER,
        "filters": _FILTER_ARRAY,
        "sequence": _SEQUENCE,
        "maxDuration": {"type": "number", "minimum": 0},
        "target": _TARGET,
        "includeZero": {"type": "boolean"},
    },
    "oneOf": [
        {"required": ["filter"]},
        {"required": ["filters"]},
        {"required": ["sequence"]},
    ],
}

_AGGREGATION = {
    "type": "object",
    "required": ["column"],
    "additionalProperties": False,
    "properties": {
        "name": {"type": "string"},
        "column": {"type": "string"},
        "type": {
            "enum": [
                "count",
                "countPerValue",
                "groupsPerValue",
                "sumPerValue",
                "meanPerValue",
            ]
        },
        "otherColumn": {"type": "string"},
        "top": {"type": "integer", "minimum": 1},
        "approx": {"type": "boolean"},
    },
}

_AGGREGATIONS = {"type": "array", "items": _AGGREGATION}

QUERY_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "timeframe": {
            "type": "object",
            "additionalProperties": False,
            "properties": {
                "from": {"type": "number", "minimum": 0},
                "to": {"type": "number", "minimum": 0},
            },
        },
        "query": {
            "type": "object",
            "additionalProperties": False,
            "properties": {
                "relation": {"type": "string"},
                "conditions": {"type": "array", "items": _CONDITION},
                "aggregations": _AGGREGATIONS,
            },
        },
        "funnel": {
            "type": "object",
            "required": ["sequence"],
            "additionalProperties": False,
            "properties": {
                "sequence": _SEQUENCE,
                "maxDuration": {"type": "number", "minimum": 0},
                "stepAggregations": _AGGREGATIONS,
                "endAggregations": _AGGREGATIONS,
            },
        },
    },
}
