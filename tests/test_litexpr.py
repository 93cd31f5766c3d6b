"""The single-expression literal builders must be plan-equivalent to the
per-entry ``F.create_map(*[F.lit(x) ...])`` / ``F.array(*[F.lit(s)])``
forms they replaced — same values bit-for-bit, same result types — for
every key/value shape the operators feed them (int and str keys, doubles
that stress the shortest-repr round-trip, strings needing escaping)."""

import math

import pytest
from pyspark.sql import functions as F

from funnel_rocket_spark.operators._litexpr import (lit_double_map,
                                                    lit_str_array)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_double_map_str_keys_bit_exact(spark):
    # values chosen to stress shortest-repr: subnormal-ish, repeating
    # binary fractions, negative zero, huge/tiny magnitudes
    vals = {
        "a": 0.1, "b": -0.0, "c": 1e-308, "d": 1.7976931348623157e308,
        "e": 2.0 / 3.0, "f": -123456.789012345678, "g": 5e-324,
    }
    got = _one(spark, lit_double_map(sorted(vals.items())))
    want = _one(spark, F.create_map(
        *[F.lit(x) for kv in sorted(vals.items()) for x in kv]))
    assert set(got) == set(vals)
    for k in vals:
        assert got[k] == want[k]
        assert math.copysign(1.0, got[k]) == math.copysign(1.0, want[k])


def test_double_map_int_keys(spark):
    vals = {0: 0.5, 7: -1.25, 10 ** 6: 3.141592653589793}
    got = _one(spark, lit_double_map(sorted(vals.items())))
    assert got == vals


def test_str_keys_escaping(spark):
    # quotes, backslashes, and backslash-before-quote must survive the
    # SQL string literal round-trip
    keys = ["plain", "it's", 'say "hi"', "back\\slash", "tricky\\'mix",
            "tab\there", "unié"]
    vals = {k: float(i) for i, k in enumerate(keys)}
    got = _one(spark, lit_double_map(sorted(vals.items())))
    assert got == vals


def test_str_array_matches_per_entry_form(spark):
    items = ["x", "it's", "a\\b", ""]
    got = _one(spark, lit_str_array(items))
    want = _one(spark, F.array(*[F.lit(s) for s in items]))
    assert got == want == items


def test_str_array_empty_is_typed(spark):
    df = spark.range(1).select(lit_str_array([]).alias("v"))
    assert df.schema["v"].dataType.simpleString() == "array<string>"
    assert df.collect()[0]["v"] == []


def test_double_map_result_type_is_double_not_decimal(spark):
    # a bare 0.5 in Spark SQL is DECIMAL — the D suffix keeps DoubleType
    df = spark.range(1).select(lit_double_map([("k", 0.5)]).alias("v"))
    assert df.schema["v"].dataType.simpleString() == "map<string,double>"


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        lit_double_map([])
    with pytest.raises(TypeError):
        lit_double_map([(True, 1.0)])
    with pytest.raises(ValueError):
        lit_double_map([("k", float("nan"))])


def test_shingle_sql_form_matches_column_form(spark):
    """shingle_frame's parsed-SQL projections must resolve to the SAME
    plan as the Column-API chain they replaced (r12: ~20 py4j round-trips
    per higher-order function saved per build)."""
    from funnel_rocket_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "The fast KEY  order"), (2, ""), (3, "a b"), (4, None)],
        "doc_id long, text string").where(F.col("text").isNotNull())
    par = spark.sparkContext.defaultParallelism
    for n in (1, 2, 3, 5):
        new = dedup.shingle_frame(df, "text", "doc_id", n, persist=False)
        old = (df.repartition(par, F.col("doc_id"))
               .select(F.col("doc_id").alias("id"),
                       dedup.tokens(F.col("text")).alias("toks"))
               .select("id",
                       dedup._ngrams_over(F.col("toks"), n).alias("grams")))
        assert new.sameSemantics(old), f"n={n} diverged from Column form"
    got = {r["id"]: r["grams"] for r in
           dedup.shingle_frame(df, "text", "doc_id", 2,
                               persist=False).collect()}
    assert got[1] == ["the fast", "fast key", "key order"]
    assert got[2] == []
    assert got[3] == ["a b"]


def test_band_rows_sql_form_matches_column_form(spark):
    from funnel_rocket_spark.operators import dedup

    sigs = spark.createDataFrame(
        [(1, list(range(32))), (2, list(range(100, 132)))],
        "id long, sig array<bigint>")
    new = dedup._band_rows(sigs, 8, 4)
    old = sigs.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda b: F.struct(
                b.alias("band"),
                F.md5(F.concat_ws("|", b, F.slice("sig", b * 4 + 1, 4))
                      .cast("binary")).alias("bucket")))).alias("bb")
    ).select("id", "bb.band", "bb.bucket")
    assert new.sameSemantics(old)
    assert sorted(map(tuple, new.collect())) == \
        sorted(map(tuple, old.collect()))


def test_similarity_sql_forms_match_column_forms(spark):
    """dot/norm/cosine's SQL-fragment form must resolve to the SAME plan
    as the Column-API lambda chain (r12: ~55 ms of py4j chatter per
    cosine saved per plan build), and _assign_expr's one-expression form
    must assign identical clusters (bit-exact center literals)."""
    from funnel_rocket_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, [1.0, 0.5, -0.25]), (2, [0.0, 0.0, 0.0]), (3, [0.1, 2.0 / 3.0, -0.0])],
        "vec_id long, embedding array<double>")
    pairs = [
        (sim.dot("embedding", "embedding"),
         sim.dot(F.col("embedding"), F.col("embedding"))),
        (sim.norm("embedding"), sim.norm(F.col("embedding"))),
        (sim.cosine("embedding", "embedding"),
         sim.cosine(F.col("embedding"), F.col("embedding"))),
    ]
    for new_c, old_c in pairs:
        new = df.select(new_c.alias("v"))
        old = df.select(old_c.alias("v"))
        assert new.sameSemantics(old)

    # _assign_expr: parsed form vs the original per-center Column loop
    centers = [[1.0, 0.0, 0.0], [0.1, 2.0 / 3.0, -5e-324], [0.0, -1.0, 1e150]]
    cnorms = [sum(x * x for x in c) ** 0.5 for c in centers]
    scored = []
    for i, (c, cn) in enumerate(zip(centers, cnorms)):
        center = F.array(*[F.lit(float(x)) for x in c])
        s = F.coalesce(
            sim.dot(F.col("embedding"), center)
            / F.nullif(sim.norm(F.col("embedding")) * F.lit(cn), F.lit(0.0)),
            F.lit(0.0))
        scored.append(F.struct((-s).alias("negsim"), F.lit(i).alias("i")))
    old_assign = F.array_sort(F.array(*scored))[0]["i"]
    got = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", sim._assign_expr("embedding", centers).alias("c")).collect()}
    want = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", old_assign.alias("c")).collect()}
    assert got == want


def test_simhash_votes_sql_form_matches_column_form(spark):
    """simhash16_table's parsed vote aggregates + bit reconstruction must
    resolve to the same plan as the Column-API when-chains they replaced
    (r12: ~0.5s of py4j chatter per plan build at n_bits=16)."""
    from funnel_rocket_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "the fast brown fox"), (2, ""), (3, None), (4, "a a a b")],
        "doc_id long, text string")
    n_bits = 16
    toks = df.select(F.col("doc_id"), F.explode_outer(
        dedup.tokens(F.col("text"))).alias("__w"))
    hashed = toks.select(
        F.col("doc_id"),
        F.col("__w").isNull().alias("__empty"),
        F.substring(F.md5(F.col("__w").cast("binary")), 1, n_bits).alias("__h"))
    votes = [
        F.sum(
            F.when(F.col("__empty"), F.lit(0))
            .when(F.substring(F.col("__h"), j + 1, 1).isin(
                "8", "9", "a", "b", "c", "d", "e", "f"), F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"__v{j}")
        for j in range(n_bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    sh = F.lit(0)
    for j in range(n_bits):
        sh = sh + F.when(F.col(f"__v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    old = agg.select(F.col("doc_id"), sh.cast("bigint").alias("simhash"))
    new = dedup.simhash16_table(df, "text", "doc_id", n_bits)
    assert new.sameSemantics(old)
    assert ({r["doc_id"]: r["simhash"] for r in new.collect()}
            == {r["doc_id"]: r["simhash"] for r in old.collect()})
