"""Deterministic hash-sampling semantics."""

import pytest
from pyspark.sql import functions as F

from funnel_rocket_spark.operators import sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10_000).withColumnRenamed("id", "doc_id")


def test_rate_honored_and_stable(spark, ids):
    kept = sampling.hash_sample(ids, 0.25)
    n = kept.count()
    assert abs(n - 2500) < 200  # binomial noise at n=10k
    # deterministic: the same call selects the same rows
    again = sampling.hash_sample(ids, 0.25)
    assert kept.exceptAll(again).count() == 0


def test_rates_are_nested(spark, ids):
    """A lower-rate sample is a subset of a higher-rate one (same salt) —
    the property that makes scaling a subsample up/down reproducible."""
    small = sampling.hash_sample(ids, 0.1)
    big = sampling.hash_sample(ids, 0.5)
    assert small.exceptAll(big).count() == 0


def test_salt_draws_independent_sample(spark, ids):
    a = set(r["doc_id"] for r in sampling.hash_sample(ids, 0.2).collect())
    b = set(r["doc_id"] for r in
            sampling.hash_sample(ids, 0.2, salt="holdout").collect())
    overlap = len(a & b)
    # independent draws overlap ~ rate^2 = 4% of 10k = ~400
    assert 200 < overlap < 700
    assert a != b


def test_keyed_sampling_keeps_groups_intact(spark):
    rows = spark.range(0, 3000).select(
        (F.col("id") % 300).alias("user_id"), F.col("id").alias("event_id"))
    kept = sampling.hash_sample(rows, 0.3, id_col="user_id")
    per_user = kept.groupBy("user_id").count().collect()
    assert all(r["count"] == 10 for r in per_user)  # all-or-nothing per user


def test_stratified_rates(spark):
    rows = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("stratum"))
    out = sampling.stratified_hash_sample(
        rows, {"a": 1.0, "b": 0.1}, "stratum").groupBy("stratum").count()
    got = {r["stratum"]: r["count"] for r in out.collect()}
    assert got["a"] == 2000
    assert abs(got["b"] - 200) < 80


def test_bad_rate_rejected():
    with pytest.raises(ValueError):
        sampling.sample_gate(F.lit("x"), 1.5)


def test_weighted_sample_bias_and_determinism(spark):
    # two weight classes, 500 ids each; heavy rows are 20x likelier
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 200).otherwise(10).alias("w"))
    got = sampling.weighted_hash_sample(df, 100, "w", id_col="doc_id")
    ids1 = sorted(r["doc_id"] for r in got.collect())
    heavy = sum(1 for i in ids1 if i < 500)
    assert heavy > 80  # expectation ~95 of 100; far from unweighted 50
    # deterministic across re-evaluation and layout changes
    ids2 = sorted(r["doc_id"] for r in
                  sampling.weighted_hash_sample(
                      df.repartition(7), 100, "w").collect())
    assert ids1 == ids2


def test_weighted_sample_skips_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
        "doc_id long, w double")
    got = sampling.weighted_hash_sample(df, 4, "w").collect()
    assert [r["doc_id"] for r in got] == [1]


def _mix_corpus(spark):
    # 'a': 10 docs x 10 tokens = 100 tokens; 'b': 4 docs x 5 = 20; 'c': 2 docs
    rows = ([(i, "a", "t " * 10) for i in range(10)]
            + [(100 + i, "b", "t " * 5) for i in range(4)]
            + [(200 + i, "c", "t t") for i in range(2)])
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_mixture_plan_hand_computed(spark):
    df = _mix_corpus(spark)
    # dyadic weights; budget 80 tokens → a: 40/100=0.4, b: 40/20 → capped 1.0
    plan = {r["lang"]: r for r in sampling.mixture_plan(
        df, {"a": 0.5, "b": 0.5}, "lang", 80).collect()}
    assert set(plan) == {"a", "b"}  # 'c' absent from targets → not planned
    assert plan["a"]["available_tokens"] == 100
    assert plan["a"]["target_tokens"] == 40.0 and plan["a"]["rate"] == 0.4
    # under-supplied stratum: rate capped at 1, shortfall visible
    assert plan["b"]["available_tokens"] == 20
    assert plan["b"]["target_tokens"] == 40.0 and plan["b"]["rate"] == 1.0


def test_mixture_sample_gate_properties(spark):
    df = _mix_corpus(spark)
    kept = sampling.mixture_sample(df, {"a": 0.5, "b": 0.5}, "lang", 80)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # subset of the corpus; 'c' dropped entirely; all of rate-1.0 'b' kept
    assert set(ids) <= {r["doc_id"] for r in df.collect()}
    assert not any(200 <= i < 300 for i in ids)
    assert [i for i in ids if i >= 100] == [100, 101, 102, 103]
    # layout-independent determinism
    ids2 = sorted(r["doc_id"] for r in sampling.mixture_sample(
        df.repartition(7), {"a": 0.5, "b": 0.5}, "lang", 80).collect())
    assert ids == ids2
    # agrees with stratified_hash_sample driven by the computed rates
    rates = {r["lang"]: r["rate"] for r in sampling.mixture_plan(
        df, {"a": 0.5, "b": 0.5}, "lang", 80).collect()}
    ids3 = sorted(r["doc_id"] for r in sampling.stratified_hash_sample(
        df, rates, "lang").collect())
    assert ids == ids3


def test_mixture_validation(spark):
    df = _mix_corpus(spark)
    with pytest.raises(ValueError):
        sampling.mixture_plan(df, {}, "lang", 100)
    with pytest.raises(ValueError):
        sampling.mixture_plan(df, {"a": 1.0}, "lang", 0)
    with pytest.raises(ValueError):
        sampling.mixture_plan(df, {"a": -0.5, "b": 1.5}, "lang", 100)


def test_repeat_sample_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, 1.0), (4, 3.5)],
        "doc_id long, r double")
    got = sampling.repeat_sample(df, F.col("r")).collect()
    by_id = {}
    for row in got:
        by_id.setdefault(row["doc_id"], []).append(row["copy"])
    # integer rates are exact duplication; rate 0 vanishes
    assert sorted(by_id[1]) == [1, 2]
    assert 2 not in by_id
    assert by_id[3] == [1]
    # fractional part: 3 or 4 copies, contiguous 1-based index
    assert sorted(by_id[4]) in ([1, 2, 3], [1, 2, 3, 4])
    # deterministic across layouts
    again = sampling.repeat_sample(df.repartition(5), F.col("r")).collect()
    assert sorted((r["doc_id"], r["copy"]) for r in again) == \
        sorted((r["doc_id"], r["copy"]) for r in got)


def test_mixture_upsample_delivers_undersupplied_targets(spark):
    df = _mix_corpus(spark)
    # budget 240 at 50/50: a needs 120/100 → rate 1.2 (repeat);
    # b needs 120/20 → rate 6.0 (hard repeat)
    kept = sampling.mixture_upsample(df, {"a": 0.5, "b": 0.5}, "lang", 240)
    rows = kept.collect()
    units = {}
    for r in rows:
        units[r["lang"]] = units.get(r["lang"], 0) + 1
    # b: rate exactly 6.0 → every doc exactly 6 copies = 24 units
    assert units["b"] == 24
    # a: 10 docs at 1.2 → between 10 and 20 units, ≥1 copy each
    assert 10 <= units["a"] <= 20
    # rate ≤ 1 strata of the capped sampler == upsample restricted to copy 1
    capped = sampling.mixture_sample(df, {"a": 0.5, "b": 0.5}, "lang", 80)
    up = sampling.mixture_upsample(df, {"a": 0.5, "b": 0.5}, "lang", 80)
    a_ids = sorted(r["doc_id"] for r in capped.collect() if r["lang"] == "a")
    a_up = sorted(r["doc_id"] for r in up.collect() if r["lang"] == "a")
    assert a_ids == a_up


def _py_dsir(raw_docs, target_docs, n_buckets=1024, s=1.0):
    """Pure-Python DSIR reference with the same md5 bucketing and dyadic
    quantization — exact-equality oracle for the operator."""
    import hashlib
    import math

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:11], 16) % n_buckets

    def counts(docs):
        c = {}
        for txt in docs:
            for t in (txt or "").lower().split():
                b = bucket(t)
                c[b] = c.get(b, 0) + 1
        return c, sum(c.values())

    tc, tt = counts(target_docs)
    rc, rt = counts(raw_docs)
    q = float(1 << 20)
    lr = {b: round(math.log(((tc.get(b, 0) + s) * (rt + s * n_buckets))
                            / ((rc.get(b, 0) + s) * (tt + s * n_buckets)))
                   * q) / q
          for b in range(n_buckets)}
    out = []
    for txt in raw_docs:
        toks = (txt or "").lower().split()
        sm = sum(lr[bucket(t)] for t in toks)
        out.append((len(toks), round(sm, 6),
                    round(sm / max(len(toks), 1), 6)))
    return out


def test_dsir_importance_matches_python_reference(spark):
    raw = ["alpha beta gamma", "delta epsilon", "alpha alpha beta",
           "zeta eta theta iota", "beta gamma delta"]
    target = ["alpha beta", "alpha gamma beta"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(target)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["logw_sum"], r["logw_mean"])
           for r in sampling.dsir_importance(df, tgt).collect()}
    want = _py_dsir(raw, target)
    for i, w in enumerate(want):
        assert got[i] == w, i  # dyadic quantization → exact equality
    # docs made of target tokens outscore docs of unseen tokens
    assert got[0][2] > got[3][2]


def test_dsir_resample_bias_and_determinism(spark):
    # raw = 40 target-like + 40 junk docs; junk tokens are FREQUENT in raw
    # and absent from the target, so their likelihood ratio is strongly
    # negative (unique-token junk would instead sit at the smoothing
    # floor — DSIR measures relative density, not novelty)
    rows = ([(i, "alpha beta gamma delta") for i in range(40)]
            + [(100 + i, "junk noise other spam") for i in range(40)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(500 + i, "alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string")
    sel = sampling.dsir_resample(df, tgt, 30)
    ids = sorted(r["doc_id"] for r in sel.collect())
    assert len(ids) == 30
    # overwhelming preference for target-like docs
    assert sum(1 for i in ids if i < 100) >= 25
    ids2 = sorted(r["doc_id"] for r in sampling.dsir_resample(
        df.repartition(7), tgt, 30).collect())
    assert ids == ids2


def test_dsir_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sampling.dsir_importance(df, df, n_buckets=1)
    with pytest.raises(ValueError):
        sampling.dsir_importance(df, df, smoothing=0.0)


def test_mixture_plan_token_col_uses_true_counts(spark):
    df = _mix_corpus(spark)
    # precomputed counts disagree with whitespace counts on purpose:
    # every 'a' doc claims 20 tokens (200 total), 'b' docs 5 (20 total)
    counted = df.withColumn(
        "n_bpe_tokens",
        F.when(F.col("lang") == "a", 20).otherwise(5))
    plan = {r["lang"]: r for r in sampling.mixture_plan(
        counted, {"a": 0.5, "b": 0.5}, "lang", 80,
        token_col="n_bpe_tokens").collect()}
    assert plan["a"]["available_tokens"] == 200
    assert plan["a"]["rate"] == 0.2  # 40/200, not 40/100
    assert plan["b"]["available_tokens"] == 20
    assert plan["b"]["rate"] == 1.0
    # the sampler threads the column through
    kept = sampling.mixture_sample(
        counted, {"a": 0.5, "b": 0.5}, "lang", 80,
        token_col="n_bpe_tokens")
    want = sampling.stratified_hash_sample(
        df, {"a": 0.2, "b": 1.0}, "lang")
    assert (sorted(r["doc_id"] for r in kept.collect())
            == sorted(r["doc_id"] for r in want.collect()))


def test_mixture_plan_empty_stratum_stays_visible(spark):
    df = _mix_corpus(spark)
    # 'z' has no corpus rows at all; 'e' exists only with empty text
    df = df.union(spark.createDataFrame(
        [(300, "e", "")], "doc_id long, lang string, text string"))
    plan = {r["lang"]: r for r in sampling.mixture_plan(
        df, {"a": 0.5, "z": 0.25, "e": 0.25}, "lang", 80).collect()}
    assert set(plan) == {"a", "z", "e"}  # shortfall visible, not dropped
    for s in ("z", "e"):
        assert plan[s]["available_tokens"] == 0
        assert plan[s]["target_tokens"] == 20.0
        assert plan[s]["rate"] == 0.0  # capped: nothing to keep
    un = {r["lang"]: r for r in sampling.mixture_plan(
        df, {"a": 0.5, "z": 0.5}, "lang", 80, cap_rate=False).collect()}
    assert un["z"]["rate"] is None  # uncapped: no finite repetition rate
    # and the upsampler over such a plan doesn't blow up (no rows to keep)
    up = sampling.mixture_upsample(df, {"a": 0.5, "z": 0.5}, "lang", 80)
    assert all(r["lang"] == "a" for r in up.collect())


def test_mixture_batch_union_equals_one_shot(spark):
    """Streaming/ingest parity (the incremental-LSH guarantee applied to
    mixing): plan rates ONCE on the full corpus, gate each arbitrary batch
    independently — the union of per-batch selections must equal the
    one-shot selection, for ANY batch assignment, because the md5 gate is
    a pure per-row function of (id, rate)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    df = _mix_corpus(spark).cache()
    weights = {"a": 0.5, "b": 0.5}
    rates = {r["lang"]: r["rate"] for r in sampling.mixture_plan(
        df, weights, "lang", 80).collect()}
    one_shot = sorted(r["doc_id"] for r in sampling.mixture_sample(
        df, weights, "lang", 80).collect())
    all_ids = sorted(r["doc_id"] for r in df.select("doc_id").collect())

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(assign=st.lists(st.integers(min_value=0, max_value=2),
                           min_size=len(all_ids), max_size=len(all_ids)))
    def prop(assign):
        batch_of = dict(zip(all_ids, assign))
        picked: list = []
        for b in range(3):
            batch_ids = [i for i, v in batch_of.items() if v == b]
            batch = df.where(F.col("doc_id").isin(batch_ids or [-1]))
            kept = sampling.stratified_hash_sample(batch, rates, "lang")
            picked.extend(r["doc_id"] for r in kept.collect())
        assert sorted(picked) == one_shot

    prop()
    df.unpersist()
