"""Validator unit tests — key cases ported from the reference's
``tests/test_query_validator.py`` (shorthand expansion, default injection,
includeZero rules, relation parsing, aggregation expansion, schema checks).
"""

import pytest

from funnel_rocket_spark.validation import QueryValidationError, expand_and_validate

SCHEMA = {
    "user": "string",
    "ts": "bigint",
    "price": "double",
    "category": "string",
    "flag": "boolean",
}


def ev(query, schema=SCHEMA):
    return expand_and_validate(query, dataset_schema=schema,
                               group_id_column="user", timestamp_column="ts")


def test_shorthand_filter_and_target_expansion():
    q = {"query": {"conditions": [
        {"filter": ["price", ">", 5], "target": ["count", ">=", 2]}]}}
    out = ev(q)
    cond = out.query["query"]["conditions"][0]
    assert cond["filter"] == {"column": "price", "op": ">", "value": 5}
    assert cond["target"] == {"type": "count", "op": ">=", "value": 2}


def test_shorthand_filters_inside_filters_array():
    """'filters' items accept the same shorthand as 'filter' — the schema
    once allowed only verbose objects there, rejecting queries the
    expansion code (_expand_condition/_expand_step) explicitly supports."""
    q = {"query": {"conditions": [
        {"filters": [["price", ">", 5],
                     {"column": "category", "op": "==", "value": "x"}]}]}}
    cond = ev(q).query["query"]["conditions"][0]
    assert cond["filters"][0] == {"column": "price", "op": ">", "value": 5}
    assert cond["filters"][1] == {"column": "category", "op": "==",
                                  "value": "x"}
    # and inside a sequence step
    q2 = {"funnel": {"sequence": [
        {"filters": [["category", "==", "view"], ["price", ">", 0]]}]}}
    step = ev(q2).query["funnel"]["sequence"][0]
    assert step["filters"][0] == {"column": "category", "op": "==",
                                  "value": "view"}


def test_shorthand_sum_target():
    q = {"query": {"conditions": [
        {"filter": ["price", ">", 5], "target": ["sum", "price", "<", 9.5]}]}}
    cond = ev(q).query["query"]["conditions"][0]
    assert cond["target"] == {"type": "sum", "column": "price", "op": "<", "value": 9.5}


def test_default_target_injected():
    q = {"query": {"conditions": [{"filter": ["price", ">", 5]}]}}
    cond = ev(q).query["query"]["conditions"][0]
    assert cond["target"] == {"type": "count", "op": ">=", "value": 1}


def test_count_eq_zero_sets_include_zero():
    q = {"query": {"conditions": [
        {"filter": ["price", ">", 5], "target": ["count", "==", 0]}]}}
    assert ev(q).query["query"]["conditions"][0]["includeZero"] is True


@pytest.mark.parametrize("target,include_zero", [
    (["count", "==", 0], False),     # cannot be false with == 0
    (["count", ">", 1], True),       # op '>' never supports includeZero
    (["count", "==", 2], True),      # == nonzero precludes zero
    (["count", "!=", 0], True),      # != 0 precludes zero
    (["count", ">=", 3], True),      # >= nonzero precludes zero
    (["count", "<", 0], True),       # implies negative
    (["sum", "price", ">", 1], True),  # sum targets never take includeZero
])
def test_include_zero_contradictions(target, include_zero):
    q = {"query": {"conditions": [
        {"filter": ["price", ">", 5], "target": target, "includeZero": include_zero}]}}
    with pytest.raises(QueryValidationError):
        ev(q)


def test_default_aggregations_expansion():
    q = {"query": {"aggregations": [{"column": "category"}]}}
    aggs = ev(q).query["query"]["aggregations"]
    assert [a["type"] for a in aggs] == ["count", "countPerValue", "groupsPerValue"]


def test_aggregation_other_column_rules():
    with pytest.raises(QueryValidationError):
        ev({"query": {"aggregations": [{"column": "category", "type": "sumPerValue"}]}})
    with pytest.raises(QueryValidationError):
        ev({"query": {"aggregations": [
            {"column": "category", "type": "count", "otherColumn": "price"}]}})
    with pytest.raises(QueryValidationError):  # otherColumn must be numeric
        ev({"query": {"aggregations": [
            {"column": "category", "type": "sumPerValue", "otherColumn": "category"}]}})


def test_relation_parse_and_named_conditions():
    q = {"query": {"relation": "$0 && ($1 || $cheap)", "conditions": [
        {"filter": ["price", ">", 5]},
        {"filter": ["price", ">", 50]},
        {"name": "cheap", "filter": ["price", "<", 1]},
    ]}}
    out = ev(q)
    assert out.relation_template == "{0} AND ({1} OR {2})"
    assert sorted(out.used_conditions) == [0, 1, 2]


def test_relation_bare_operator():
    q = {"query": {"relation": "or", "conditions": [
        {"filter": ["price", ">", 5]}, {"filter": ["price", "<", 1]}]}}
    assert ev(q).relation_template == "{0} OR {1}"


def test_relation_errors():
    base = [{"filter": ["price", ">", 5]}]
    for rel in ["$1", "$nope", "$0 and", "($0", "$0 xor $0", ""]:
        with pytest.raises(QueryValidationError):
            ev({"query": {"relation": rel, "conditions": base}})


def test_condition_name_cannot_be_operator():
    q = {"query": {"conditions": [{"name": "and", "filter": ["price", ">", 5]}]}}
    with pytest.raises(QueryValidationError):
        ev(q)


def test_duplicate_condition_names_rejected():
    q = {"query": {"conditions": [
        {"name": "x", "filter": ["price", ">", 5]},
        {"name": "X ", "filter": ["price", "<", 1]},
    ]}}
    with pytest.raises(QueryValidationError):
        ev(q)


def test_schema_checks():
    with pytest.raises(QueryValidationError):  # unknown column
        ev({"query": {"conditions": [{"filter": ["nope", "==", 1]}]}})
    with pytest.raises(QueryValidationError):  # string op on numeric
        ev({"query": {"conditions": [{"filter": ["price", "contains", "x"]}]}})
    with pytest.raises(QueryValidationError):  # bool only equality
        ev({"query": {"conditions": [{"filter": ["flag", ">", True]}]}})
    with pytest.raises(QueryValidationError):  # value/type mismatch
        ev({"query": {"conditions": [{"filter": ["price", "==", "abc"]}]}})
    with pytest.raises(QueryValidationError):  # sum over non-numeric column
        ev({"query": {"conditions": [
            {"filter": ["price", ">", 1], "target": ["sum", "category", ">", 1]}]}})


def test_used_columns_collection():
    q = {
        "query": {
            "conditions": [
                {"filter": ["category", "==", "x"],
                 "target": ["sum", "price", ">", 1]}],
            "aggregations": [{"column": "category"}],
        },
        "funnel": {"sequence": [{"filter": ["flag", "==", True]}]},
    }
    out = ev(q)
    assert set(out.used_columns) == {"user", "ts", "category", "price", "flag"}


def test_timeframe_order_enforced():
    with pytest.raises(QueryValidationError):
        ev({"timeframe": {"from": 10, "to": 10}})


def test_malformed_documents_rejected():
    for bad in [
        {"unknown_top": {}},
        {"query": {"conditions": [{"filter": ["a", "bogus_op", 1]}]}},
        {"query": {"conditions": [{}]}},
        {"funnel": {}},
    ]:
        with pytest.raises(QueryValidationError):
            ev(bad, schema=None)


def test_timeframe_scale_check():
    from funnel_rocket_spark.validation.validator import check_timeframe_scale

    nanos = 1.7e18
    check_timeframe_scale({"timeframe": {"from": int(1.705e18)}}, nanos, nanos)
    with pytest.raises(QueryValidationError):  # seconds vs nanos dataset
        check_timeframe_scale({"timeframe": {"from": 1_700_000_000}}, nanos, nanos)
    check_timeframe_scale({}, nanos, nanos)        # no timeframe: fine
    check_timeframe_scale({"timeframe": {"to": 5}}, None, None)  # no stats: fine
