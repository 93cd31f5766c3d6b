"""Engine-semantics tests ported from the reference's tier-1 suite
(``/root/reference/tests/test_query_engine.py``) — same synthetic data shapes,
same expected numbers, engine swapped for the Spark one.

Data model: 4 users a/b/c/d with 2^(i+2) rows each (4/8/16/32), cycling
category/type/keyword values, sequential timestamps and prices.
"""

import pandas as pd
import pytest

from funnel_rocket_spark.engine import QueryEngine

CATEGORIES = ["fishing", "running", "climbing", "snorkeling"]
TYPES = ["view", "click", "purchase", "a2c"]
KEYWORDS = ["cat|dog", "mouse|cat|dog", "cat", "dog|mouse|cat"]
BEGIN_TS = 1610555782
BEGIN_PRICE = 100
ALL_USERS = ["a", "b", "c", "d"]


def make_data() -> pd.DataFrame:
    frames = []
    for index, user in enumerate(ALL_USERS):
        index += 2
        n = 2**index
        frames.append(
            pd.DataFrame(
                {
                    "id": [user] * n,
                    "timestamp": [BEGIN_TS + index + i for i in range(n)],
                    "category": CATEGORIES * (n // 4),
                    "type": TYPES * (n // 4),
                    "price": [BEGIN_PRICE + index + i for i in range(n)],
                    "keywords": [f"{w}_{user}" for w in KEYWORDS] * (n // 4),
                }
            )
        )
    return pd.concat(frames, axis=0)


@pytest.fixture(scope="module")
def sdf(spark):
    df = spark.createDataFrame(make_data())
    df.persist()
    yield df
    df.unpersist()


def run(spark_df, query_part=None, funnel_part=None, timeframe=None):
    full = {}
    if query_part:
        full["query"] = query_part
    if funnel_part:
        full["funnel"] = funnel_part
    if timeframe:
        full["timeframe"] = timeframe
    engine = QueryEngine("id", "timestamp")
    return engine.run(spark_df, full)


def test_empty_query_brings_all_users(sdf):
    res = run(sdf, {"conditions": []})
    assert res["query"]["matchingGroups"] == 4
    assert res["query"]["matchingGroupRows"] == 4 + 8 + 16 + 32


def test_simple_filter(sdf):
    q = {
        "relation": "and",
        "conditions": [
            {
                "filter": {"column": "price", "op": ">", "value": 133},
                "target": {"type": "count", "op": ">", "value": 2},
            }
        ],
    }
    res = run(sdf, q)
    # matches only user 'd' (2^5 rows)
    assert res["query"]["matchingGroups"] == 1
    assert res["query"]["matchingGroupRows"] == 32


def test_logical_or(sdf):
    q = {
        "relation": "or",
        "conditions": [
            {
                "filter": {"column": "price", "op": "<=", "value": 104},
                "target": {"type": "count", "op": ">", "value": 2},
            },
            {
                "filter": {"column": "price", "op": ">", "value": 133},
                "target": {"type": "count", "op": ">", "value": 2},
            },
        ],
    }
    res = run(sdf, q)
    assert res["query"]["matchingGroups"] == 2  # users a and d
    assert res["query"]["matchingGroupRows"] == 4 + 32


def test_sum_target(spark):
    rows = [{"f": i, "id": "a", "timestamp": i} for i in range(1, 1001)]
    rows.append({"f": 10, "id": "b", "timestamp": 2})
    df = spark.createDataFrame(pd.DataFrame(rows))
    q = {
        "conditions": [
            {
                "filter": {"column": "f", "op": ">", "value": 0},
                "target": {
                    "type": "sum",
                    "op": "==",
                    "column": "f",
                    "value": 1000 * 1001 // 2,
                },
            }
        ]
    }
    res = run(df, q)
    assert res["query"]["matchingGroupRows"] == 1000


def test_boolean_operators_with_nulls(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"bool_field": True, "id": "a", "timestamp": 1},
                {"bool_field": False, "id": "b", "timestamp": 2},
                {"bool_field": None, "id": "b", "timestamp": 3},
            ]
        ).astype({"bool_field": "boolean"})
    )
    # (op, value, expected matchingGroupRows, target_op) — NULL counts as a
    # match for '!=' (Pandas parity; reference test_query_engine.py:102-144)
    cases = [
        ("==", True, 1, "=="),
        ("!=", True, 2, ">"),
        ("==", False, 2, "=="),
        ("!=", False, 3, "=="),
    ]
    for op, value, expectation, target_op in cases:
        q = {
            "conditions": [
                {
                    "filter": {"column": "bool_field", "op": op, "value": value},
                    "target": {"type": "count", "op": target_op, "value": 1},
                }
            ]
        }
        res = run(df, q)
        assert res["query"]["matchingGroupRows"] == expectation, (op, value)


def test_numeric_operators(sdf):
    # timestamp <= BEGIN_TS+5 yields 4 rows for a, 3 for b, 2 for c, 1 for d
    cases = [("==", 2, 1), ("<", 3, 2), (">", 2, 2), ("<=", 1, 1), (">=", 4, 1), ("!=", 1, 3)]
    for op, val, expectation in cases:
        q = {
            "relation": "and",
            "conditions": [
                {
                    "filter": {"column": "timestamp", "op": "<=", "value": BEGIN_TS + 5},
                    "target": {"type": "count", "op": op, "value": val},
                }
            ],
        }
        res = run(sdf, q)
        assert res["query"]["matchingGroups"] == expectation, (op, val)


def test_string_operators(sdf):
    # all with target count > 3 (reference test_string_operators)
    cases = [
        ("contains", "dog_a", 0),
        ("contains", "dog_b", 8),
        ("contains", "dog_c", 16),
        ("==", "cat_a", 0),
        ("==", "cat_c", 16),
        ("!=", "cat_a", 56),
        ("not contains", "mouse", 56),
    ]
    for op, value, expectation in cases:
        q = {
            "relation": "or",
            "conditions": [
                {
                    "filter": {"column": "keywords", "op": op, "value": value},
                    "target": {"type": "count", "op": ">", "value": 3},
                }
            ],
        }
        res = run(sdf, q)
        assert res["query"]["matchingGroupRows"] == expectation, (op, value)


def test_multi_filter(sdf):
    q = {
        "relation": "or",
        "conditions": [
            {
                "filters": [
                    {"column": "price", "op": "<=", "value": 104},
                    {"column": "category", "op": "==", "value": "running"},
                ],
                "target": {"type": "count", "op": "==", "value": 1},
            }
        ],
    }
    res = run(sdf, q)
    assert res["query"]["matchingGroups"] == 2  # users a and b
    assert res["query"]["matchingGroupRows"] == 4 + 8


def test_column_aggregations(sdf):
    res = run(sdf, {"conditions": [], "aggregations": [{"column": "category"}]})
    aggs = {a["type"]: a for a in res["query"]["aggregations"]}
    assert len(aggs) == 3
    assert aggs["count"]["value"] == 60
    assert aggs["countPerValue"]["value"] == {c: 15 for c in CATEGORIES}
    assert aggs["groupsPerValue"]["value"] == {c: 4 for c in CATEGORIES}


def test_other_column_aggregations(spark):
    rows = [
        {"id": "a", "timestamp": 1, "category": "a" if i % 2 == 0 else "b", "price": i}
        for i in range(10)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    res = run(
        df,
        {
            "conditions": [],
            "aggregations": [
                {"column": "category", "type": "sumPerValue", "otherColumn": "price"}
            ],
        },
    )
    assert res["query"]["aggregations"][0]["value"] == {"a": 20, "b": 25}
    res = run(
        df,
        {
            "conditions": [],
            "aggregations": [
                {"column": "category", "type": "meanPerValue", "otherColumn": "price"}
            ],
        },
    )
    assert res["query"]["aggregations"][0]["value"] == {"a": 4.0, "b": 5.0}


@pytest.fixture(scope="module")
def seq_df(spark):
    rows = []
    for i in range(5):
        rows += [
            {"id": "a", "timestamp": i, "category": i, "price": 1},
            {"id": "b", "timestamp": i, "category": i if i < 2 else -1, "price": 2},
            {"id": "c", "timestamp": i, "category": 4 - i, "price": 3},
        ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_sequence_condition(seq_df):
    # categories over time: a: 0 1 2 3 4 | b: 0 1 -1 -1 -1 | c: 4 3 2 1 0
    q = {
        "conditions": [
            {
                "sequence": [
                    {"filter": ["category", "==", 0]},
                    {"filter": ["category", "<=", 2]},
                    {"filter": ["category", "<", 0]},
                ]
            }
        ],
        "aggregations": [{"column": "price"}],
    }
    res = run(seq_df, q)
    assert res["query"]["matchingGroups"] == 1  # only b
    agg = res["query"]["aggregations"][-1]
    assert "2" in agg["value"]

    q = {
        "conditions": [
            {
                "sequence": [
                    {"filter": ["category", ">=", 3]},
                    {"filter": ["category", "<=", 2]},
                    {"filter": ["category", "==", 0]},
                ]
            }
        ],
        "aggregations": [{"column": "price"}],
    }
    res = run(seq_df, q)
    assert res["query"]["matchingGroups"] == 1  # only c
    assert "3" in res["query"]["aggregations"][-1]["value"]


def test_sequence_strict_inequality(spark):
    """Same-timestamp events cannot chain (reference query_engine.py:233)."""
    rows = [
        {"id": "a", "timestamp": 1, "type": "view"},
        {"id": "a", "timestamp": 1, "type": "purchase"},  # same ts: no chain
        {"id": "b", "timestamp": 1, "type": "view"},
        {"id": "b", "timestamp": 2, "type": "purchase"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    q = {
        "conditions": [
            {
                "sequence": [
                    {"filter": ["type", "==", "view"]},
                    {"filter": ["type", "==", "purchase"]},
                ]
            }
        ]
    }
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 1  # only b


def test_funnel_step_counts(sdf):
    funnel = {
        "sequence": [
            {"filter": ["type", "==", "view"]},
            {"filter": ["type", "==", "click"]},
            {"filter": ["type", "==", "purchase"]},
        ],
        "endAggregations": [{"column": "price", "type": "count"}],
    }
    res = run(sdf, query_part={"conditions": []}, funnel_part=funnel)
    steps = res["funnel"]["sequence"]
    # every user has view->click->purchase in order (types cycle per 4 rows)
    assert [s["matchingGroups"] for s in steps] == [4, 4, 4]
    assert steps[-1]["matchingGroupRows"] == 60
    assert res["funnel"]["endAggregations"][0]["value"] == 60


def test_include_zero(spark):
    rows = [
        {"id": "a", "timestamp": 1, "type": "purchase"},
        {"id": "a", "timestamp": 2, "type": "view"},
        {"id": "b", "timestamp": 1, "type": "view"},
        {"id": "c", "timestamp": 1, "type": "view"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    # users with zero purchases: target count == 0 auto-sets includeZero
    q = {"conditions": [{"filter": ["type", "==", "purchase"], "target": ["count", "==", 0]}]}
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 2
    assert res["query"]["matchingGroupRows"] == 2
    # users with < 2 purchases including zero
    q = {
        "conditions": [
            {
                "filter": ["type", "==", "purchase"],
                "target": ["count", "<", 2],
                "includeZero": True,
            }
        ]
    }
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 3
    # without includeZero, zero-purchase users do NOT match count < 2
    q = {"conditions": [{"filter": ["type", "==", "purchase"], "target": ["count", "<", 2]}]}
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 1


def test_timeframe(sdf):
    res = run(
        sdf,
        {"conditions": []},
        timeframe={"from": BEGIN_TS, "to": BEGIN_TS + 6},
    )
    # rows with BEGIN_TS <= ts < BEGIN_TS+6: a:4 (ts 2..5... offsets), computed:
    # a: ts BEGIN+2..BEGIN+5 → 4 rows; b: BEGIN+3..BEGIN+5 → 3; c: BEGIN+4..+5 → 2; d: BEGIN+5 → 1
    assert res["query"]["matchingGroupRows"] == 10
    assert res["query"]["matchingGroups"] == 4


def test_empty_dataset_all_query_shapes(spark):
    """Zero-row input must yield 0/0 for every query shape — no crashes
    from empty aggregates, windows, or semi joins."""
    from funnel_rocket_spark import QueryEngine

    df = spark.createDataFrame([], "id string, ts long, type string, "
                                   "value double")
    eng = QueryEngine("id", "ts")
    shapes = [
        {},
        {"query": {"conditions": [{"filter": ["type", "==", "x"],
                                   "target": ["count", ">=", 1]}]}},
        {"query": {"conditions": [],
                   "aggregations": [{"column": "type",
                                     "type": "countPerValue", "top": 5}]}},
        {"query": {"conditions": [{"sequence": [
            {"filter": ["type", "==", "a"]},
            {"filter": ["type", "==", "b"]}]}]}},
        {"funnel": {"sequence": [{"filter": ["type", "==", "a"]}]}},
        {"query": {"conditions": [{"filter": ["type", "==", "x"],
                                   "target": ["count", "==", 0]}]}},
    ]
    for q in shapes:
        res = eng.run(df, q)
        assert res["query"]["matchingGroups"] == 0, q
        assert res["query"]["matchingGroupRows"] == 0, q


def test_timeframe_sub_granularity_literals(spark):
    """Nanos literals finer than the column's physical granularity must keep
    exact from-inclusive / to-exclusive semantics: the pushed-down literal is
    CEILED to the column granularity, never floored (flooring would drop the
    boundary row for `to` and leak sub-bound rows for `from`)."""
    from pyspark.sql import functions as F

    from funnel_rocket_spark import QueryEngine

    k_us = 1_700_000_000_000_000  # µs; row granularity = 1 µs
    df = spark.range(3).select(
        F.lit("u").alias("id"),
        F.timestamp_micros(F.col("id") + F.lit(k_us)).alias("ts"),
        F.lit("e").alias("type"),
    )
    eng = QueryEngine("id", "ts")
    k_ns = k_us * 1000

    # to = k·1000+1 ns: the row at exactly k µs satisfies ts < to → 1 row
    res = eng.run(df, {"timeframe": {"from": k_ns - 1000, "to": k_ns + 1},
                       "query": {"conditions": []}})
    assert res["query"]["matchingGroupRows"] == 1
    # from = k·1000+1 ns: the row at k µs is BELOW the bound → 2 rows remain
    res = eng.run(df, {"timeframe": {"from": k_ns + 1, "to": k_ns + 3000},
                       "query": {"conditions": []}})
    assert res["query"]["matchingGroupRows"] == 2
    # aligned literals unchanged: [k, k+2µs) → 2 rows
    res = eng.run(df, {"timeframe": {"from": k_ns, "to": k_ns + 2000},
                       "query": {"conditions": []}})
    assert res["query"]["matchingGroupRows"] == 2

    # DateType column, day granularity: to = midday of day D keeps day D
    day_ns = 86_400 * 10**9
    ddf = spark.range(3).select(
        F.lit("u").alias("id"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.col("id").cast("int")).alias("d"),
        F.lit("e").alias("type"),
    )
    deng = QueryEngine("id", "d")
    d0 = 19723 * day_ns  # 2024-01-01
    res = deng.run(ddf, {"timeframe": {"from": d0, "to": d0 + day_ns // 2},
                         "query": {"conditions": []}})
    assert res["query"]["matchingGroupRows"] == 1
    # from = midday of day D excludes day D itself
    res = deng.run(ddf, {"timeframe": {"from": d0 + day_ns // 2,
                                       "to": d0 + 3 * day_ns},
                         "query": {"conditions": []}})
    assert res["query"]["matchingGroupRows"] == 2


def test_timeframe_random_bounds_match_integer_semantics(spark):
    """Randomized differential check of the ceiling pushdown: for a
    µs-granularity timestamp column, engine counts under arbitrary nanos
    bounds must equal the pure-integer semantics
    |{ts : from <= ts_ns < to}| computed in Python."""
    import random

    from pyspark.sql import functions as F

    from funnel_rocket_spark import QueryEngine

    rng = random.Random(20240814)
    base_us = 1_700_000_000_000_000
    offsets = sorted(rng.sample(range(0, 5_000), 60))
    ts_us = [base_us + o for o in offsets]
    df = spark.createDataFrame(
        [("u", t, "e") for t in ts_us], "id string, ts_us long, type string",
    ).select("id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "type")
    eng = QueryEngine("id", "ts")

    lo_ns, hi_ns = base_us * 1000 - 5000, (base_us + 5_000) * 1000 + 5000
    cases = [(rng.randint(lo_ns, hi_ns), rng.randint(lo_ns, hi_ns))
             for _ in range(15)]
    # adversarial: bounds straddling exact row positions by ±1 ns
    for t in ts_us[:5]:
        cases.append((t * 1000, t * 1000 + 1))
        cases.append((t * 1000 - 1, t * 1000 + 2001))
    for a, b in cases:
        frm, to = min(a, b), max(a, b)
        want = sum(1 for t in ts_us if frm <= t * 1000 < to)
        res = eng.run(df, {"timeframe": {"from": frm, "to": to},
                           "query": {"conditions": []}})
        got = res["query"]["matchingGroupRows"]
        assert got == want, (frm, to, got, want)


def test_sequence_max_duration_extension(spark):
    rows = [
        {"id": "a", "timestamp": 1, "type": "view"},
        {"id": "a", "timestamp": 100, "type": "purchase"},
        {"id": "b", "timestamp": 1, "type": "view"},
        {"id": "b", "timestamp": 3, "type": "purchase"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    seq = [{"filter": ["type", "==", "view"]}, {"filter": ["type", "==", "purchase"]}]
    q = {"conditions": [{"sequence": seq, "maxDuration": 5}]}
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 1  # only b within 5
    q = {"conditions": [{"sequence": seq, "maxDuration": 200}]}
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 2


def test_sequence_row_found_false_extension(spark):
    rows = [
        {"id": "a", "timestamp": 1, "type": "view"},
        {"id": "a", "timestamp": 2, "type": "error"},
        {"id": "a", "timestamp": 3, "type": "purchase"},
        {"id": "b", "timestamp": 1, "type": "view"},
        {"id": "b", "timestamp": 2, "type": "purchase"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    # view then NO error then purchase → only b
    q = {
        "conditions": [
            {
                "sequence": [
                    {"filter": ["type", "==", "view"]},
                    {"filter": ["type", "==", "error"], "rowFound": False},
                    {"filter": ["type", "==", "purchase"]},
                ]
            }
        ]
    }
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 1


def test_max_duration_with_row_found_false_first_step(spark):
    """The duration window must anchor at the first FOUND step: an
    absence-first sequence passes the -inf sentinel through step 0, and
    anchoring maxDuration THERE made ts <= sentinel + d false for every
    row — zero groups could ever match."""
    rows = [
        # a: no error, view->purchase within 5 → must match
        {"id": "a", "timestamp": 10, "type": "view"},
        {"id": "a", "timestamp": 13, "type": "purchase"},
        # b: no error, purchase too late after the view anchor
        {"id": "b", "timestamp": 10, "type": "view"},
        {"id": "b", "timestamp": 100, "type": "purchase"},
        # c: has an early error → absence step fails
        {"id": "c", "timestamp": 1, "type": "error"},
        {"id": "c", "timestamp": 10, "type": "view"},
        {"id": "c", "timestamp": 13, "type": "purchase"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    q = {"conditions": [{"sequence": [
        {"filter": ["type", "==", "error"], "rowFound": False},
        {"filter": ["type", "==", "view"]},
        {"filter": ["type", "==", "purchase"]},
    ], "maxDuration": 5}]}
    res = run(df, q)
    assert res["query"]["matchingGroups"] == 1


def test_approx_groups_per_value(sdf):
    """approx=true (HLL) stays within tolerance of exact on small data."""
    res = run(sdf, {"conditions": [], "aggregations": [
        {"column": "category", "type": "groupsPerValue", "approx": True}]})
    approx = res["query"]["aggregations"][0]["value"]
    assert set(approx) == set(CATEGORIES)
    for v in approx.values():
        assert abs(v - 4) <= 1  # rsd default 5%; tiny data is near-exact


def test_matching_group_ids_export(spark, sdf, tmp_path):
    from funnel_rocket_spark.engine import QueryEngine

    plan = QueryEngine("id", "timestamp").plan(
        sdf, {"query": {"conditions": [
            {"filter": {"column": "price", "op": ">", "value": 133}}]}})
    out = str(tmp_path / "audience")
    plan.matching_group_ids().write.parquet(out)
    back = spark.read.parquet(out)
    assert [r["id"] for r in back.collect()] == ["d"]


def test_sequence_strategies_agree(spark, sdf, seq_df):
    """fold (default) and window strategies must produce identical results."""
    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    queries = [
        {"query": {"conditions": [{"sequence": [
            {"filter": ["category", "==", 0]},
            {"filter": ["category", "<=", 2]},
            {"filter": ["category", "<", 0]}]}]}},
        {"query": {"conditions": [{"sequence": [
            {"filter": ["category", ">=", 3]},
            {"filter": ["category", "==", 0]}], "maxDuration": 3}]}},
    ]
    for q in queries:
        expanded = eng.expand(q, seq_df)
        fold = QueryPlan(seq_df, expanded, "id", "timestamp",
                         sequence_strategy="fold").counts().collect()
        window = QueryPlan(seq_df, expanded, "id", "timestamp",
                           sequence_strategy="window").counts().collect()
        assert fold == window, q


def test_fold_rejects_row_found_false(seq_df):
    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan
    import pytest as _pytest

    eng = QueryEngine("id", "timestamp")
    q = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "==", 1], "rowFound": False}]}]}}
    expanded = eng.expand(q, seq_df)
    # auto silently falls back to window; explicit fold refuses
    QueryPlan(seq_df, expanded, "id", "timestamp").counts().collect()
    with _pytest.raises(ValueError):
        QueryPlan(seq_df, expanded, "id", "timestamp",
                  sequence_strategy="fold").counts()


def test_funnel_strategies_agree(spark, seq_df):
    """Funnel step counts via the fold fast-path (done > i) must equal the
    window-anchor path (anchor i non-null) step by step."""
    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    funnels = [
        {"sequence": [{"filter": ["category", ">=", 0]},
                      {"filter": ["category", "<=", 2]},
                      {"filter": ["category", "==", 1]}]},
        {"sequence": [{"filter": ["category", ">=", 3]},
                      {"filter": ["category", "==", 0]}],
         "maxDuration": 3},
    ]
    for fn in funnels:
        q = {"query": {}, "funnel": fn}
        expanded = eng.expand(q, seq_df)
        fold = QueryPlan(seq_df, expanded, "id", "timestamp",
                         sequence_strategy="fold"
                         ).funnel_step_counts().collect()
        window = QueryPlan(seq_df, expanded, "id", "timestamp",
                           sequence_strategy="window"
                           ).funnel_step_counts().collect()
        key = lambda rs: [(r["step"], r["matching_groups"],
                           r["matching_group_rows"]) for r in rs]
        assert key(fold) == key(window), fn


def test_kitchen_sink_query(spark):
    """Maximal query in the spirit of the reference's
    tests/utils/base_query_example.json: every feature at once — timeframe,
    named conditions, shorthand+verbose forms, includeZero, sum targets,
    multi-filters, sequence with maxDuration + rowFound:false, named
    relation with ||, default + named aggregations, funnel with
    maxDuration + stepAggregations + endAggregations."""
    from pyspark.sql import functions as F

    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.engine import QueryEngine

    ev = bq.load_table(spark, "/root/testdata/sf0.001", "events")
    # epoch-nanos bounds regardless of the physical ts type (int64 nanos or
    # timestamp[us]); query time values are always epoch-nanos
    lo, hi = (
        bq.ts_ns(ev)
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    ts_lo, ts_hi = int(lo), int(hi)
    q = {
        "timeframe": {"from": ts_lo, "to": ts_hi},
        "query": {
            "relation": "($1 and $2) || $seq || (($did_signup))",
            "conditions": [
                {"name": "did_signup",
                 "filter": ["event_type", "==", "signup"],
                 "target": ["count", ">=", 0], "includeZero": True},
                {"name": "clicked", "filter": ["event_type", "==", "click"],
                 "includeZero": False},
                {"filter": {"column": "event_type", "op": "==",
                            "value": "view"},
                 "target": {"type": "sum", "column": "value", "op": "<",
                            "value": 350}},
                {"filters": [
                    {"column": "event_type", "op": "==", "value": "purchase"},
                    {"column": "value", "op": ">=", "value": 3}],
                 "target": ["sum", "value", "<", 350]},
                {"name": "seq", "sequence": [
                    {"filter": ["event_type", "==", "view"]},
                    {"filters": [
                        {"column": "event_type", "op": "==",
                         "value": "purchase"},
                        {"column": "value", "op": ">=", "value": 3}]},
                    {"rowFound": False,
                     "filter": {"column": "event_type", "op": "==",
                                "value": "error"}}],
                 "maxDuration": (ts_hi - ts_lo) // 2},
            ],
            "aggregations": [
                {"column": "event_type"},
                {"column": "event_id", "type": "count",
                 "name": "purchase_count"},
                {"column": "event_type", "type": "sumPerValue",
                 "otherColumn": "value", "name": "hoola"},
            ],
        },
        "funnel": {
            "sequence": [
                {"filter": ["event_type", "==", "view"]},
                {"filter": {"column": "event_type", "op": "==",
                            "value": "purchase"}}],
            "maxDuration": ts_hi - ts_lo,
            "stepAggregations": [
                {"column": "event_id", "type": "count", "name": "mosh"},
                {"column": "event_type", "type": "groupsPerValue",
                 "name": "mosh2"}],
            "endAggregations": [{"column": "event_type"}],
        },
    }
    eng = QueryEngine("user_id", "ts")
    result = eng.run(ev, q)

    # includeZero + count>=0 makes $did_signup universally true → every
    # group matches the relation.
    all_groups = ev.select("user_id").distinct().count()
    assert result["query"]["matchingGroups"] == all_groups
    aggs = result["query"]["aggregations"]
    # default expansion on bare {"column": ...} → count/countPerValue/
    # groupsPerValue; named aggregations keep their names
    names = {a["name"] for a in aggs if a.get("name")}
    assert {"purchase_count", "hoola"} <= names
    assert len(result["funnel"]["sequence"]) == 2
    step1 = result["funnel"]["sequence"][1]
    assert 0 < step1["matchingGroups"] <= all_groups
    assert step1["aggregations"] is not None
    assert result["funnel"]["endAggregations"] is not None


def test_fold_segmented_equals_other_strategies(spark, seq_df):
    """The segmented fold (per-(group, ts-range-segment) partial folds +
    exit-table merge) must equal window AND fold exactly — on the tiny
    fixture, on a seeded random stream with HEAVY timestamp ties (ties
    stress the bucket-assignment invariant: tied ts must never split
    across segments, or strict-> entry anchors would be wrong), and
    across segment counts including the degenerate n_segments=1 (= the
    plain fold) and n_segments far above the distinct-ts count."""
    import random

    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    q = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "<=", 2]},
        {"filter": ["category", "<", 0]}]}]}}
    expanded = eng.expand(q, seq_df)
    window = QueryPlan(seq_df, expanded, "id", "timestamp",
                       sequence_strategy="window").counts().collect()
    for n_seg in (1, 3, 64):
        seg = QueryPlan(seq_df, expanded, "id", "timestamp",
                        sequence_strategy="fold_segmented",
                        fold_segments=n_seg).counts().collect()
        assert seg == window, n_seg

    rng = random.Random(42)
    rows = [{"id": g, "timestamp": float(rng.randrange(12)),  # many ties
             "category": rng.randrange(-1, 5), "price": 1}
            for g in range(200) for _ in range(rng.randrange(1, 30))]
    big = spark.createDataFrame(pd.DataFrame(rows))
    eng2 = QueryEngine("id", "timestamp")
    queries = [
        {"query": {"conditions": [{"sequence": [
            {"filter": ["category", "==", 0]},
            {"filter": ["category", ">=", 3]}]}]}},
        {"query": {"conditions": [
            {"sequence": [{"filter": ["category", "==", 1]},
                          {"filter": ["category", "==", 2]},
                          {"filter": ["category", "==", 3]}]},
            {"filter": ["price", ">", 0], "target": ["count", ">=", 5]}]}},
    ]
    for q in queries:
        expanded = eng2.expand(q, big)
        window = QueryPlan(big, expanded, "id", "timestamp",
                           sequence_strategy="window").counts().collect()
        fold = QueryPlan(big, expanded, "id", "timestamp",
                         sequence_strategy="fold").counts().collect()
        assert fold == window, q
        for n_seg in (1, 4, 64):
            seg = QueryPlan(big, expanded, "id", "timestamp",
                            sequence_strategy="fold_segmented",
                            fold_segments=n_seg).counts().collect()
            assert seg == window, (q, n_seg)

    # funnel step counts agree too (the per-group done vector feeds them)
    fq = {"query": {}, "funnel": {"sequence": [
        {"filter": ["category", ">=", 0]},
        {"filter": ["category", "<=", 2]},
        {"filter": ["category", "==", 1]}]}}
    expanded = eng2.expand(fq, big)
    key = lambda rs: [(r["step"], r["matching_groups"],  # noqa: E731
                       r["matching_group_rows"]) for r in rs]
    window = QueryPlan(big, expanded, "id", "timestamp",
                       sequence_strategy="window"
                       ).funnel_step_counts().collect()
    seg = QueryPlan(big, expanded, "id", "timestamp",
                    sequence_strategy="fold_segmented", fold_segments=7
                    ).funnel_step_counts().collect()
    assert key(seg) == key(window)


def test_fold_segmented_rejects_unsupported(seq_df):
    """Plain fold still refuses rowFound:false loudly (the shared-scan
    fold has no lookahead); fold_segmented takes the anchor-chain form
    since r11 and must MATCH the window path instead of raising; unknown
    strategy names refused at construction."""
    import pytest as _pytest

    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    qr = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "==", 1], "rowFound": False}]}]}}
    expanded = eng.expand(qr, seq_df)
    with _pytest.raises(ValueError, match="rowFound"):
        QueryPlan(seq_df, expanded, "id", "timestamp",
                  sequence_strategy="fold").counts()

    ref = QueryPlan(seq_df, expanded, "id", "timestamp",
                    sequence_strategy="window").counts().collect()
    got = QueryPlan(seq_df, expanded, "id", "timestamp",
                    sequence_strategy="fold_segmented").counts().collect()
    assert got == ref

    with _pytest.raises(ValueError, match="sequence_strategy"):
        QueryPlan(seq_df, eng.expand({"query": {}}, seq_df), "id",
                  "timestamp", sequence_strategy="nope")


def test_auto_strategy_whale_routing(spark, seq_df):
    """sequence_strategy="auto" + a max_group_rows_hint past the whale
    threshold routes to the segmented fold — same counts, no flag. No
    hint (or a small one) keeps window anchors; since r11 EVERY spec
    shape is segmentable (maxDuration via the first-anchor join,
    rowFound:false via the anchor chain) so whale hints route them all;
    the engine threads Dataset.max_group_rows through run()."""
    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    q = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "<=", 2]}]}]}}
    expanded = eng.expand(q, seq_df)

    baseline = QueryPlan(seq_df, expanded, "id", "timestamp",
                         sequence_strategy="window").counts().collect()

    routed = QueryPlan(seq_df, expanded, "id", "timestamp",
                       max_group_rows_hint=10_000, whale_row_threshold=100)
    assert routed.sequence_strategy == "fold_segmented"
    assert routed.auto_routed_segmented
    assert routed.counts().collect() == baseline

    for plan in (
        QueryPlan(seq_df, expanded, "id", "timestamp"),  # no hint
        QueryPlan(seq_df, expanded, "id", "timestamp",   # small groups
                  max_group_rows_hint=99, whale_row_threshold=100),
        QueryPlan(seq_df, expanded, "id", "timestamp",   # explicit window
                  sequence_strategy="window",
                  max_group_rows_hint=10_000, whale_row_threshold=100),
    ):
        assert plan.sequence_strategy in ("auto", "window")
        assert not plan.auto_routed_segmented

    # maxDuration IS segmentable now (first-anchor-join form): routes
    qd = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "==", 1]}], "maxDuration": 3}]}}
    plan = QueryPlan(seq_df, eng.expand(qd, seq_df), "id", "timestamp",
                     max_group_rows_hint=10_000, whale_row_threshold=100)
    assert plan.auto_routed_segmented
    ref = QueryPlan(seq_df, eng.expand(qd, seq_df), "id", "timestamp",
                    sequence_strategy="window").counts().collect()
    assert plan.counts().collect() == ref

    # rowFound:false is segmentable since r11 (anchor-chain form): a
    # whale hint routes it too, and values match the window path
    qr = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "==", 1], "rowFound": False}]}]}}
    plan = QueryPlan(seq_df, eng.expand(qr, seq_df), "id", "timestamp",
                     max_group_rows_hint=10_000, whale_row_threshold=100)
    assert plan.auto_routed_segmented
    ref = QueryPlan(seq_df, eng.expand(qr, seq_df), "id", "timestamp",
                    sequence_strategy="window").counts().collect()
    assert plan.counts().collect() == ref

    # a funnel with a whale hint routes too, and end-to-end run() accepts
    # the hint (engine → plan threading)
    fq = {"query": {}, "funnel": {"sequence": [
        {"filter": ["category", ">=", 0]},
        {"filter": ["category", "<=", 2]}]}}
    fplan = QueryPlan(seq_df, eng.expand(fq, seq_df), "id", "timestamp",
                      max_group_rows_hint=10_000, whale_row_threshold=100)
    assert fplan.auto_routed_segmented
    ref = eng.run(seq_df, fq)
    got = eng.run(seq_df, fq, max_group_rows=10**9)
    assert got == ref


def test_fold_segmented_max_duration_equals_window(spark, seq_df):
    """The first-anchor-join segmented form of maxDuration must equal
    the window path exactly: tiny fixture, seeded tie-heavy stream,
    duration values hitting the inclusive boundary, the single-step
    degenerate case, groups whose step-0 anchor exists but whose window
    holds no events, and funnel step counts."""
    import random

    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    for dur in (0, 1, 2, 3, 100):
        q = {"query": {"conditions": [{"sequence": [
            {"filter": ["category", "==", 0]},
            {"filter": ["category", "<=", 2]}], "maxDuration": dur}]}}
        expanded = eng.expand(q, seq_df)
        window = QueryPlan(seq_df, expanded, "id", "timestamp",
                           sequence_strategy="window").counts().collect()
        fold = QueryPlan(seq_df, expanded, "id", "timestamp",
                         sequence_strategy="fold").counts().collect()
        assert fold == window, dur
        for n_seg in (1, 3, 64):
            seg = QueryPlan(seq_df, expanded, "id", "timestamp",
                            sequence_strategy="fold_segmented",
                            fold_segments=n_seg).counts().collect()
            assert seg == window, (dur, n_seg)

    rng = random.Random(7)
    rows = [{"id": g, "timestamp": float(rng.randrange(12)),  # many ties
             "category": rng.randrange(-1, 5), "price": 1}
            for g in range(200) for _ in range(rng.randrange(1, 30))]
    big = spark.createDataFrame(pd.DataFrame(rows))
    queries = [
        # 3-step with a mid-range duration: some groups time out mid-way
        {"query": {"conditions": [{"sequence": [
            {"filter": ["category", "==", 1]},
            {"filter": ["category", "==", 2]},
            {"filter": ["category", "==", 3]}], "maxDuration": 4}]}},
        # duration 0: only same-ts follow-ups — strict > makes most fail
        {"query": {"conditions": [{"sequence": [
            {"filter": ["category", "==", 0]},
            {"filter": ["category", ">=", 3]}], "maxDuration": 0}]}},
        # single step: duration trivially satisfied at the anchor
        {"query": {"conditions": [{"sequence": [
            {"filter": ["category", "==", 4]}], "maxDuration": 1}]}},
        # mixed with a plain filter condition (shared groupBy pass)
        {"query": {"conditions": [
            {"sequence": [{"filter": ["category", "==", 0]},
                          {"filter": ["category", "==", 2]}],
             "maxDuration": 3},
            {"filter": ["price", ">", 0], "target": ["count", ">=", 5]}]}},
    ]
    for q in queries:
        expanded = eng.expand(q, big)
        window = QueryPlan(big, expanded, "id", "timestamp",
                           sequence_strategy="window").counts().collect()
        fold = QueryPlan(big, expanded, "id", "timestamp",
                         sequence_strategy="fold").counts().collect()
        assert fold == window, q
        for n_seg in (1, 4, 64):
            seg = QueryPlan(big, expanded, "id", "timestamp",
                            sequence_strategy="fold_segmented",
                            fold_segments=n_seg).counts().collect()
            assert seg == window, (q, n_seg)

    # funnel with maxDuration: per-step done vector must agree
    fq = {"query": {}, "funnel": {"sequence": [
        {"filter": ["category", ">=", 0]},
        {"filter": ["category", "<=", 2]},
        {"filter": ["category", "==", 1]}], "maxDuration": 5}}
    expanded = eng.expand(fq, big)
    key = lambda rs: [(r["step"], r["matching_groups"],  # noqa: E731
                       r["matching_group_rows"]) for r in rs]
    window = QueryPlan(big, expanded, "id", "timestamp",
                       sequence_strategy="window"
                       ).funnel_step_counts().collect()
    seg = QueryPlan(big, expanded, "id", "timestamp",
                    sequence_strategy="fold_segmented", fold_segments=7
                    ).funnel_step_counts().collect()
    assert key(seg) == key(window)


def test_anchor_chain_equals_window_for_absence_steps(spark):
    """rowFound:false under fold_segmented takes the r11 anchor-chain
    form (chained per-group min aggregates — no window, no per-group
    array): it must equal the window-anchor path exactly across absence
    position (first/mid/last/all/single), maxDuration interaction, a
    tie-heavy stream, and funnel step counts."""
    import random

    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    rng = random.Random(42)
    rows = [{"id": g, "timestamp": float(rng.randrange(12)),  # many ties
             "category": rng.randrange(-1, 5), "price": 1}
            for g in range(300) for _ in range(rng.randrange(1, 30))]
    df = spark.createDataFrame(pd.DataFrame(rows))
    eng = QueryEngine("id", "timestamp")
    seqs = [
        # absence mid-step
        [{"filter": ["category", "==", 0]},
         {"filter": ["category", "==", 1], "rowFound": False},
         {"filter": ["category", "==", 2]}],
        # absence-first (anchors the sentinel through)
        [{"filter": ["category", "==", 4], "rowFound": False},
         {"filter": ["category", "==", 1]},
         {"filter": ["category", "==", 2]}],
        # absence-last
        [{"filter": ["category", "==", 0]},
         {"filter": ["category", "==", 3], "rowFound": False}],
        # all-absence
        [{"filter": ["category", "==", 4], "rowFound": False},
         {"filter": ["category", "==", -1], "rowFound": False}],
        # single absence step
        [{"filter": ["category", "==", 4], "rowFound": False}],
    ]
    cases = [{"sequence": s} for s in seqs] + [
        # maxDuration × absence: mid-step and absence-first (the
        # duration window must anchor at the first FOUND step)
        {"sequence": seqs[0], "maxDuration": 4},
        {"sequence": seqs[1], "maxDuration": 3},
    ]
    for cond in cases:
        q = {"query": {"conditions": [cond]}}
        expanded = eng.expand(q, df)
        w = QueryPlan(df, expanded, "id", "timestamp",
                      sequence_strategy="window").counts().collect()
        for n_seg in (1, 4, 64):
            s = QueryPlan(df, expanded, "id", "timestamp",
                          sequence_strategy="fold_segmented",
                          fold_segments=n_seg).counts().collect()
            assert s == w, (cond, n_seg)

    # funnel with an absence step under fold_segmented
    fq = {"query": {}, "funnel": {"sequence": [
        {"filter": ["category", ">=", 0]},
        {"filter": ["category", "==", 4], "rowFound": False},
        {"filter": ["category", "<=", 2]}]}}
    expanded = eng.expand(fq, df)
    key = lambda rs: [(r["step"], r["matching_groups"],  # noqa: E731
                       r["matching_group_rows"]) for r in rs]
    w = QueryPlan(df, expanded, "id", "timestamp",
                  sequence_strategy="window").funnel_step_counts().collect()
    s = QueryPlan(df, expanded, "id", "timestamp",
                  sequence_strategy="fold_segmented"
                  ).funnel_step_counts().collect()
    assert key(s) == key(w)

    # plain fold still rejects absence steps (no lookahead)
    with pytest.raises(ValueError, match="rowFound"):
        QueryPlan(df, eng.expand({"query": {"conditions": [cases[0]]}}, df),
                  "id", "timestamp",
                  sequence_strategy="fold").counts().collect()


def test_whale_threshold_scales_with_dataset(spark, seq_df):
    """The routing threshold is relative when total rows are known: a
    'whale' that is small relative to a task's uniform share must NOT
    route (at 1T rows a 5M group is noise), while one several times the
    per-task share still does. effective = max(absolute floor,
    whale_task_multiple × total_rows / shuffle_partitions)."""
    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    q = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "<=", 2]}]}]}}
    expanded = eng.expand(q, seq_df)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # hint 10k > absolute floor 100, but the dataset is "huge": per-task
    # share = 10M/parts, ×4 multiple >> 10k -> stays window
    plan = QueryPlan(seq_df, expanded, "id", "timestamp",
                     max_group_rows_hint=10_000, whale_row_threshold=100,
                     total_rows_hint=10_000_000)
    assert not plan.auto_routed_segmented
    assert plan.effective_whale_threshold == max(100, 4 * 10_000_000 // parts)

    # same hint, tiny dataset: relative term is below the floor -> routes
    plan = QueryPlan(seq_df, expanded, "id", "timestamp",
                     max_group_rows_hint=10_000, whale_row_threshold=100,
                     total_rows_hint=parts)  # per-task share = 1 row
    assert plan.auto_routed_segmented

    # no total hint: absolute floor alone (back-compat)
    plan = QueryPlan(seq_df, expanded, "id", "timestamp",
                     max_group_rows_hint=10_000, whale_row_threshold=100)
    assert plan.auto_routed_segmented
    assert plan.effective_whale_threshold == 100

    # engine threads total_rows through run()
    ref = eng.run(seq_df, q)
    assert eng.run(seq_df, q, max_group_rows=10**9,
                   total_rows=10**12) == ref


def test_histogram_cost_model_routing(spark, seq_df):
    """With the r11 histogram hint (group_rows_topk + total rows) auto
    routing is a COST MODEL — estimated slowest window task (greedy
    whale packing over the uniform remainder) vs the segmented fold's
    bounded task × the measured per-row premium — not the binary
    max>threshold test that over-routed the r10 rung's 20M whale
    (window sort 23.2s vs segmented 73.5s)."""
    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    q = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "<=", 2]}]}]}}
    expanded = eng.expand(q, seq_df)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def plan(**kw):
        return QueryPlan(seq_df, expanded, "id", "timestamp", **kw)

    # the r10 rung shape: 20M whale in 100M rows. The old threshold
    # test routed it; the cost model must NOT (window task ≈ uniform
    # share + whale << premium × segmented task bound).
    p = plan(group_rows_topk_hint=[20_000_000], total_rows_hint=10**8,
             max_group_rows_hint=20_000_000)
    assert not p.auto_routed_segmented
    assert p.auto_route_reason == "cost_model_window"
    est = p.route_estimates
    assert est["window_task_rows"] == int(80_000_000 / parts) + 20_000_000
    assert est["segmented_task_rows"] == int(10**8 / parts + 20_000_000 / 64)

    # ...while the legacy max-only hint still routes once past its
    # threshold (pre-r11 catalog: no histogram to model cost from)
    legacy = plan(max_group_rows_hint=20_000_000)
    assert legacy.auto_routed_segmented
    assert legacy.auto_route_reason == "legacy_threshold"

    # a whale that dominates modeled wall-clock routes (premium pinned
    # low so the crossover is reachable at the test's partition count)
    p = plan(group_rows_topk_hint=[95_000_000], total_rows_hint=10**8,
             segmented_cost_premium=1.5)
    assert p.auto_routed_segmented and p.auto_route_reason == "cost_model"
    assert p.counts().collect() == plan(
        sequence_strategy="window").counts().collect()

    # many mid-size whales spread across partitions: no single task
    # dominates, so no routing (the max-only test can't see this).
    # Shape chosen so the window side wins for any partition count the
    # suite might run under (1M whales: LPT gives whale + uniform share
    # per task, under the 1.5x-premium segmented bound up to ~64 parts)
    p = plan(group_rows_topk_hint=[1_000_000] * 16, total_rows_hint=10**8,
             segmented_cost_premium=1.5)
    assert not p.auto_routed_segmented

    # the hard cap fires on stall-scale whales even when modeled
    # wall-clock still favors the window sort
    p = plan(group_rows_topk_hint=[3 * 10**9], total_rows_hint=6 * 10**9)
    assert p.auto_routed_segmented and p.auto_route_reason == "hard_cap"

    # histogram without total rows can't model cost -> legacy fallback
    p = plan(group_rows_topk_hint=[10**9])
    assert not p.auto_routed_segmented

    # engine threads the histogram + its knobs through run(); stats
    # expose the decision inputs; routing never changes answers
    tuned = QueryEngine("id", "timestamp", segmented_cost_premium=1.5)
    ref = tuned.run(seq_df, q, with_stats=True)
    got = tuned.run(seq_df, q, with_stats=True, max_group_rows=95_000_000,
                    total_rows=10**8, group_rows_topk=[95_000_000])
    assert got["query"] == ref["query"]
    st = got["stats"]["strategies"]
    assert st["sequence"] == "fold_segmented"
    assert st["autoRouteReason"] == "cost_model"
    assert st["groupRowsTopkHint"] == [95_000_000]
    assert st["routeEstimates"]["premium"] == 1.5


def test_sorted_layout_hint_keeps_window_anchors(spark, seq_df):
    """r12: a declared bucketBy(group)+sortBy(group, ts) layout removes
    the whale sort the segmented fold exists to dodge, so auto routing
    stays on window anchors even when the histogram cost model would
    route — EXCEPT past the hard cap, where WindowExec's per-group row
    buffer (spilled, not sorted) keeps the straggler risk."""
    from funnel_rocket_spark.engine import QueryEngine
    from funnel_rocket_spark.planner.compiler import QueryPlan

    eng = QueryEngine("id", "timestamp")
    q = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "<=", 2]}]}]}}
    expanded = eng.expand(q, seq_df)

    def plan(**kw):
        return QueryPlan(seq_df, expanded, "id", "timestamp", **kw)

    # the cost-model-routes shape from test_histogram_cost_model_routing
    # ... unless the layout is declared sorted
    routed = plan(group_rows_topk_hint=[95_000_000], total_rows_hint=10**8,
                  segmented_cost_premium=1.5)
    assert routed.auto_routed_segmented
    p = plan(group_rows_topk_hint=[95_000_000], total_rows_hint=10**8,
             segmented_cost_premium=1.5, sorted_layout_hint=True)
    assert not p.auto_routed_segmented
    assert p.auto_route_reason == "sorted_layout_window"

    # hard cap still wins over the layout
    p = plan(group_rows_topk_hint=[3 * 10**9], total_rows_hint=6 * 10**9,
             sorted_layout_hint=True)
    assert p.auto_routed_segmented and p.auto_route_reason == "hard_cap"

    # the legacy max-only hint is also overridden
    p = plan(max_group_rows_hint=20_000_000, sorted_layout_hint=True)
    assert not p.auto_routed_segmented

    # engine derives the hint from the catalog layout record; only the
    # (bucket=group, sort=(group, ts)) shape qualifies
    assert eng._sorted_layout({"buckets": 4, "bucket_columns": ["id"],
                               "sort_columns": ["id", "timestamp"]})
    assert not eng._sorted_layout(None)
    assert not eng._sorted_layout({"buckets": 4, "bucket_columns": ["id"],
                                   "sort_columns": ["timestamp"]})
    assert not eng._sorted_layout({"buckets": 4,
                                   "bucket_columns": ["category"],
                                   "sort_columns": ["category",
                                                    "timestamp"]})


def test_stats_expose_chosen_strategies(spark, seq_df):
    """with_stats reports WHICH physical plans ran — the routing
    decision must be auditable from the result JSON alone."""
    from funnel_rocket_spark.engine import QueryEngine

    eng = QueryEngine("id", "timestamp", whale_row_threshold=100)
    q = {"query": {"conditions": [{"sequence": [
        {"filter": ["category", "==", 0]},
        {"filter": ["category", "<=", 2]}]}],
        "aggregations": [{"column": "category", "type": "count"}]}}
    res = eng.run(seq_df, q, with_stats=True)
    st = res["stats"]["strategies"]
    assert st["sequence"] == "auto" and not st["autoRoutedSegmented"]
    assert st["rowUniverse"] == "join"
    assert st["effectiveWhaleThreshold"] == 100

    routed = eng.run(seq_df, q, with_stats=True, max_group_rows=10**9)
    st2 = routed["stats"]["strategies"]
    assert st2["sequence"] == "fold_segmented" and st2["autoRoutedSegmented"]
    assert st2["maxGroupRowsHint"] == 10**9
    # routing never changes answers
    assert routed["query"] == res["query"]
