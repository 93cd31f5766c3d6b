"""Audience set-algebra semantics (the catalog query audience_segments
covers the DuckDB differential on engine-produced audiences)."""

from funnel_rocket_spark.operators import audiences


def _ab(spark):
    a = spark.createDataFrame([(1,), (2,), (3,), (3,)], "g long")  # dup id
    b = spark.createDataFrame([(3,), (4,)], "g long")
    return a, b


def test_segments(spark):
    a, b = _ab(spark)
    got = {r["segment"]: r["n_groups"]
           for r in audiences.audience_segments(a, b, "g").collect()}
    assert got == {"a_only": 2, "both": 1, "b_only": 1}


def test_combinators(spark):
    a, b = _ab(spark)
    assert sorted(r["g"] for r in
                  audiences.audience_intersect(a, b, "g").collect()) == [3]
    assert sorted(r["g"] for r in
                  audiences.audience_except(a, b, "g").collect()) == [1, 2]
    assert sorted(r["g"] for r in
                  audiences.audience_union(a, b, "g").collect()) == [1, 2, 3, 4]
