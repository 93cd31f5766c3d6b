"""Deterministic corpus sampling: hash-gated row selection.

``df.sample`` draws from a per-partition RNG — the selected set changes with
partitioning, task retries, and Spark version, which makes pipelines
unreproducible and results un-oracle-able. These operators gate each row on
an md5 hash of its id instead: the same rows are selected on any engine, any
layout, any day. That determinism is what a training-data pipeline needs —
held-out splits and ablation subsets must be stable artifacts, not draws.

Scale shape: pure row-local projection + filter (no shuffle); the hash is
uniform so the sample rate is honored within binomial noise per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funnel_rocket_spark.operators._litexpr import lit_double_map

# 2^44 buckets — every value of the 11-hex-char hash is a distinct bucket,
# so rate resolution is ~6e-14 and the gate is a single integer compare.
_BUCKETS = 1 << 44

def _salted_bucket(col, salt: str):
    """THE engine-wide deterministic id hash: first 11 md5 hex chars of
    (salt || value-as-string) as int64 in [0, 2^44) — one definition so
    every sampler (gates, splits, mixtures, Gumbel keys) stays in
    lockstep; DuckDB reproduces it as ('0x' || substr(md5(...), 1,
    11))::BIGINT."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))
                          .cast("binary")), 1, 11), 16, 10).cast("long")



def sample_gate(col, rate: float, salt: str = ""):
    """Boolean Column: deterministically keep ~``rate`` of distinct values.

    Gate = first 11 md5 hex chars of (salt || value) as int64 < rate · 2^44.
    Same id + same salt → same verdict everywhere; changing ``salt`` draws
    an independent sample (use per-split salts: "train", "holdout", ...).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    bucket = _salted_bucket(col, salt)
    return bucket < F.lit(int(rate * _BUCKETS))


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Deterministic ~``rate`` sample of rows, keyed on ``id_col``.

    All rows of an id share one verdict, so sampling a keyed table keeps
    groups intact (sample users, not user-rows).
    """
    return df.filter(sample_gate(F.col(id_col), rate, salt))


def stratified_hash_sample(df: DataFrame, rates: dict, strata_col: str,
                           id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum value →
    keep rate; strata absent from the map are dropped. The workhorse of
    corpus mixing (e.g. {"en": 1.0, "de": 0.3}) — one pass, no shuffle."""
    gate = F.lit(False)
    for value, rate in sorted(rates.items()):
        gate = F.when(F.col(strata_col) == value,
                      sample_gate(F.col(id_col), rate, salt)).otherwise(gate)
    return df.filter(gate)


def weighted_sample_key(id_col, weight_col, salt: str = ""):
    """Efraimidis–Spirakis key ``u^(1/w)`` with ``u`` drawn deterministically
    from the id hash: the n rows with the LARGEST keys are a weighted sample
    without replacement (heavier rows proportionally likelier). Rows with
    null or non-positive weight get a null key (never selected)."""
    bucket = _salted_bucket(id_col, salt)
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(float(_BUCKETS))
    return F.when(weight_col > 0, F.pow(u, F.lit(1.0) / weight_col))


def weighted_hash_sample(df: DataFrame, n: int, weight_col: str,
                         id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic weighted sample without replacement of ``n`` rows —
    e.g. "sample documents proportionally to length" for corpus mixing.

    Selection = global top-n by the Efraimidis–Spirakis key, which Spark
    executes as TakeOrderedAndProject: each task keeps its local n, the
    driver merges — no full sort, no shuffle of the table, O(n) driver
    memory. Same id + salt + weight → same verdict on any engine/layout.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    key = weighted_sample_key(F.col(id_col), F.col(weight_col), salt)
    return (df.withColumn("__esk", key)
            .filter(F.col("__esk").isNotNull())
            .orderBy(F.desc("__esk"), F.asc(id_col)).limit(n)
            .drop("__esk"))


def per_group_cap(df: DataFrame, group_cols: list[str], n: int,
                  id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by deterministic md5 rank —
    the per-domain/per-source cap every corpus-balancing recipe applies
    (no single site may contribute more than n documents).

    The "random" n are a pure function of (salt, id): stable across
    engines, partitionings, and retries, and re-runnable incrementally —
    unlike a window over ``rand()``. One rank window partitioned by the
    group columns (the same exchange an existing per-group phase already
    pays on a bucketed layout); md5-hex order is uniform so the kept set
    is an unbiased sample of each group.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        key.asc(), F.col(id_col).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n).drop("__rk"))


def temperature_resample(df: DataFrame, strata_col: str, alpha: float = 0.5,
                         id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """UniMax/XLM-R-style temperature downsampling: keep each stratum
    (language, source domain, ...) at rate ``(n_min / n_s)^(1-alpha)`` so
    the kept mix is ∝ n_s^alpha — the standard fix for head-language
    dominance in multilingual corpus construction (alpha=1 keeps the
    natural mix, alpha→0 flattens toward uniform). The rarest stratum is
    never downsampled.

    The rates are computed IN-PLAN: one tiny groupBy(strata) count, a
    1-row global min, and a broadcast join back — no driver collect, so the
    operator composes lazily and the corpus itself is touched by exactly
    one scan + one broadcast-hash-join + filter (no corpus shuffle). Row
    selection reuses the deterministic md5 gate of :func:`sample_gate`.

    ``alpha=0.5`` keeps the rate arithmetic to sqrt/divide/multiply/floor —
    all correctly-rounded IEEE ops — so the kept set is bit-reproducible on
    any engine (the differential oracle runs the same formula in SQL).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    rates = (counts.crossJoin(F.broadcast(nmin))
             .select(strata_col,
                     F.pow(F.col("__nmin").cast("double")
                           / F.col("__n").cast("double"),
                           F.lit(1.0 - alpha)).alias("__rate")))
    bucket = _salted_bucket(id_col, salt)
    return (df.join(F.broadcast(rates), strata_col)
            .where(bucket < F.floor(F.col("__rate") * F.lit(float(_BUCKETS)))
                   .cast("long"))
            .drop("__rate"))


def assign_split(df: DataFrame, weights: dict, id_col: str = "doc_id",
                 salt: str = "", out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment in ONE pass: each id's md5
    bucket falls into exactly one contiguous rate interval, so the splits
    are disjoint and exhaustive BY CONSTRUCTION — no three-sample
    intersection bugs, no resampling drift between pipeline runs. Keyed on
    ``id_col`` so grouped rows travel together (split users, not
    user-rows).

    ``weights`` maps split name → fraction; must sum to 1 (±1e-9). Interval
    layout is sorted by split name, so the same weights always produce the
    same assignment regardless of dict order. Downstream:
    ``df.write.partitionBy("split")`` materializes all splits in one job.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _salted_bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(int(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, out)


def _mixture_targets(target_weights: dict, total_tokens: int) -> dict:
    """Per-stratum token targets: weights normalized driver-side so both
    the plan and any SQL oracle can embed the SAME literal constants."""
    if not target_weights or total_tokens <= 0:
        raise ValueError("need non-empty target_weights and total_tokens > 0")
    if any(w < 0 for w in target_weights.values()):
        raise ValueError("mixture weights must be non-negative")
    wsum = sum(target_weights.values())
    if wsum <= 0:
        raise ValueError("mixture weights must sum to > 0")
    return {s: (w / wsum) * total_tokens
            for s, w in sorted(target_weights.items())}


def mixture_plan(df: DataFrame, target_weights: dict, strata_col: str,
                 total_tokens: int, text_col: str = "text",
                 cap_rate: bool = True,
                 token_col: str | None = None,
                 anchor: bool = True) -> DataFrame:
    """Domain-mixture planning — the "data mixing" step of training-corpus
    assembly (the DoReMi/Pile-style recipe: hit a token budget at given
    per-domain proportions). For each stratum in ``target_weights``:
    available whitespace tokens in the corpus, the target token count
    (weight normalized × ``total_tokens``), and the deterministic keep
    rate ``min(1, target/available)``. Strata at rate 1.0 UNDER-deliver
    (shortfall = target − available, visible in the output); there is no
    implicit oversampling — upweighting means duplication, which is the
    explicit :func:`mixture_upsample` path. ``cap_rate=False`` returns the
    uncapped ratio (what the upsampler repeats at).

    One tiny groupBy(strata) exchange over a (strata, n_tokens)
    projection; everything else is arithmetic on the ≤|domains|-row
    aggregate. Null text counts 0 tokens. A requested stratum with ZERO
    corpus rows (or zero tokens) still appears in the output — shortfall
    is always visible, per the contract above: available_tokens=0 and
    rate 0.0 when capped / NULL when uncapped (there is no finite
    repetition rate that manufactures tokens from nothing).

    ``token_col`` switches the budget currency from the default
    whitespace count to a PRECOMPUTED per-row token count — pass the
    ``n_bpe_tokens`` column produced by
    :func:`funnel_rocket_spark.operators.text.bpe_tokenize` (joined onto
    the corpus) to plan against TRUE tokenizer counts instead of the
    whitespace estimate. Null counts are 0.

    ``anchor=False`` drops the empty-strata anchor rows (and their extra
    join stage): correct ONLY when the consumer joins the rates back into
    the corpus — an anchor row's stratum has no corpus rows to match, so
    the joined result is identical. The samplers use this internally; the
    user-facing audit frame keeps the default.
    """
    targets = _mixture_targets(target_weights, total_tokens)
    if token_col is not None:
        toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    else:
        toks = F.size(F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda t: t != F.lit("")))
    counts = (df.where(F.col(strata_col).isin(*targets.keys()))
              .groupBy(strata_col)
              .agg(F.sum(toks).alias("available_tokens")))
    if anchor:
        # Anchor the plan on the REQUESTED strata (≤|domains| literal
        # rows), so empty strata can't silently vanish from the
        # aggregate. Built as a JVM-literal explode(array(...)) frame —
        # NOT createDataFrame, which would back the anchor with a Python
        # RDD and pay a per-call serialization + scheduling tax (the r7
        # sample_mixture regression).
        strata_df = df.sparkSession.range(1).select(
            F.explode(F.array(*[F.lit(s) for s in targets]))
            .alias(strata_col))
        counts = (strata_df.join(counts, strata_col, "left")
                  .withColumn("available_tokens",
                              F.coalesce(F.col("available_tokens"),
                                         F.lit(0))))
    tgt = F.lit(0.0)
    for s, t in targets.items():
        tgt = F.when(F.col(strata_col) == s, F.lit(float(t))).otherwise(tgt)
    avail = F.col("available_tokens").cast("double")
    raw = F.when(F.col("available_tokens") > 0, tgt / avail)  # NULL at 0
    rate = (F.when(F.col("available_tokens") > 0,
                   F.least(F.lit(1.0), raw)).otherwise(F.lit(0.0))
            if cap_rate else raw)
    return counts.select(
        F.col(strata_col),
        F.col("available_tokens").cast("long").alias("available_tokens"),
        F.round(tgt, 6).alias("target_tokens"),
        rate.alias("rate"))


def mixture_sample(df: DataFrame, target_weights: dict, strata_col: str,
                   total_tokens: int, text_col: str = "text",
                   id_col: str = "doc_id", salt: str = "",
                   token_col: str | None = None,
                   rates: DataFrame | None = None) -> DataFrame:
    """Apply :func:`mixture_plan`: keep each stratum at its computed rate
    via the deterministic md5 gate (document-level gating — a kept
    stratum's token mass tracks the target within doc-length noise).
    Strata absent from ``target_weights`` are dropped, mirroring
    :func:`stratified_hash_sample`.

    Plan shape: the ≤|domains|-row rates frame broadcast-joins back into
    the corpus scan — one tiny exchange for the counts, zero corpus
    shuffle, and the corpus itself is scanned twice (count pass + gate
    pass) unless the caller persists it. Bit-reproducible on any layout.

    ``rates``: a precomputed (persisted) :func:`mixture_plan` frame with
    ``cap_rate=True`` and the SAME weights/budget — callers that audit
    the plan and then sample avoid paying the corpus count pass twice.
    """
    if rates is None:
        rates = mixture_plan(df, target_weights, strata_col, total_tokens,
                             text_col, token_col=token_col, anchor=False)
    bucket = _salted_bucket(id_col, salt)
    return (df.join(F.broadcast(rates.select(strata_col, "rate")),
                    strata_col)
            .where(bucket < F.floor(F.col("rate") * F.lit(float(_BUCKETS)))
                   .cast("long"))
            .drop("rate"))


def repeat_sample(df: DataFrame, rate_col, id_col: str = "doc_id",
                  salt: str = "", copy_col: str = "copy") -> DataFrame:
    """Deterministic FRACTIONAL repetition: each row appears
    ``floor(rate)`` times, plus once more where the md5 gate admits the
    fractional remainder — so a stratum at rate 2.25 is duplicated to
    exactly ~2.25× its token mass, reproducibly. ``rate_col`` is a Column
    (join a rates frame in first); output gains ``copy_col`` (1-based
    copy index) so downstream shuffles/splits can keep copies distinct.

    Pure explode-over-sequence projection — no shuffle; at 100 TB the
    cost is the output volume itself, which is the point of upsampling.
    """
    bucket = _salted_bucket(id_col, salt)
    frac = rate_col - F.floor(rate_col)
    n_copies = (F.floor(rate_col)
                + F.when(bucket < F.floor(frac * F.lit(float(_BUCKETS)))
                         .cast("long"), 1).otherwise(0)).cast("int")
    # sequence(1, 0) would count DOWN — guard the zero-copy case
    copies = F.when(n_copies > 0, F.sequence(F.lit(1), n_copies)) \
        .otherwise(F.array().cast("array<int>"))
    return (df.withColumn("__copies", copies)
            .select("*", F.explode("__copies").alias(copy_col))
            .drop("__copies"))


def mixture_upsample(df: DataFrame, target_weights: dict, strata_col: str,
                     total_tokens: int, text_col: str = "text",
                     id_col: str = "doc_id", salt: str = "",
                     token_col: str | None = None,
                     rates: DataFrame | None = None) -> DataFrame:
    """:func:`mixture_sample` without the rate-1.0 cap: under-supplied
    domains are REPEATED (fractionally, via :func:`repeat_sample`) until
    every domain delivers its target token mass — the multi-epoch recipe
    for rare high-value sources (code, books) in LLM corpus mixing.
    Output = corpus columns + ``copy`` (1-based; rate ≤ 1 strata only
    ever emit copy=1, making the plain sampler a special case).

    ``rates``: a precomputed :func:`mixture_plan` frame — MUST be the
    ``cap_rate=False`` plan (capped rates would silently disable
    repetition); same double-scan-avoidance contract as
    :func:`mixture_sample`.
    """
    if rates is None:
        rates = mixture_plan(df, target_weights, strata_col, total_tokens,
                             text_col, cap_rate=False, token_col=token_col,
                             anchor=False)
    rates = rates.select(strata_col, F.col("rate").alias("__rate"))
    joined = df.join(F.broadcast(rates), strata_col)
    return repeat_sample(joined, F.col("__rate"), id_col=id_col,
                         salt=salt).drop("__rate")


def _md5_bucket(col, n_buckets: int):
    """Engine-portable feature hash: md5-derived 44-bit int mod n_buckets
    (same construction as :func:`sample_gate`, so DuckDB reproduces it)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 11), 16, 10)
        .cast("long"), F.lit(n_buckets))


def dsir_importance(df_raw: DataFrame, df_target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 1024,
                    smoothing: float = 1.0) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-unigram distribution is.
    Per hash bucket b, the log likelihood ratio
    ``lr[b] = ln(p_target(b) / p_raw(b))`` (Laplace-smoothed); per doc,
    the sum and mean of ``lr`` over its token occurrences. High
    ``logw_sum`` → reads like the target corpus.

    Plan shape: BOTH corpus-wide bucket-count aggregates reduce map-side
    to ≤ ``n_buckets`` rows and are collected (bounded, like the
    perceptron's gradient); the ratio table then folds into a broadcast
    literal map, so SCORING is a zero-shuffle codegen projection over the
    raw corpus — one scan, nothing else, at any corpus size.

    Cross-engine exactness (the module's dyadic discipline): each
    ``lr[b]`` is ONE ``ln`` call QUANTIZED to a multiple of 2^-20 — an
    exactly-representable double — so per-doc sums are exact and
    ORDER-INDEPENDENT (any engine, any aggregation order, same bits),
    and sub-ulp libm differences cannot survive the quantization away
    from measure-zero boundaries. The final round-6 display rounding is
    boundary-free on dyadic sums (no dyadic rational has a 5·10^-7
    fractional tail).
    """
    import math

    if n_buckets < 2 or n_buckets > _CLASSIFIER_BUCKET_CAP:
        raise ValueError(
            f"n_buckets must be in [2, {_CLASSIFIER_BUCKET_CAP}] "
            "(literal-map scoring)")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")

    def bucket_agg(df, tag: int):
        from funnel_rocket_spark.operators.dedup import tokens
        ex = df.select(F.explode(tokens(F.col(text_col))).alias("__tok"))
        return (ex.groupBy(_md5_bucket(F.col("__tok"), n_buckets)
                           .alias("b"))
                .agg(F.count(F.lit(1)).alias("c"))
                .select(F.lit(tag).alias("t"), "b", "c"))

    # ONE collect job for both corpora: the two bounded aggregates are
    # branches of a union, so their stages run concurrently instead of
    # as two sequential driver round-trips (≤ 2·n_buckets rows total —
    # same driver-traffic bound as the two separate collects).
    rows = (bucket_agg(df_target, 0).unionByName(bucket_agg(df_raw, 1))
            .collect())
    tc = {int(r["b"]): int(r["c"]) for r in rows if r["t"] == 0}
    rc = {int(r["b"]): int(r["c"]) for r in rows if r["t"] == 1}
    t_total, r_total = sum(tc.values()), sum(rc.values())
    s = float(smoothing)
    t_denom = t_total + s * n_buckets
    r_denom = r_total + s * n_buckets
    q = float(_LR_QUANT)
    lr = {b: round(math.log(((tc.get(b, 0) + s) * r_denom)
                            / ((rc.get(b, 0) + s) * t_denom)) * q) / q
          for b in range(n_buckets)}

    from funnel_rocket_spark.operators.dedup import tokens as _tokens
    tk = F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>"))
    mapping = lit_double_map((b, lr[b]) for b in sorted(lr))
    staged = df_raw.withColumn("__lrmap", mapping)
    logw = F.aggregate(
        tk, F.lit(0.0),
        lambda acc, t: acc + F.element_at(
            F.col("__lrmap"), _md5_bucket(t, n_buckets).cast("int")))
    n_tok = F.size(tk)
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(logw, 6).alias("logw_sum"),
        F.round(logw / F.greatest(n_tok, F.lit(1)), 6).alias("logw_mean"))


_CLASSIFIER_BUCKET_CAP = 2_000  # literal-map expression-tree bound
_LR_QUANT = 1 << 20  # log-ratio quantum: dyadic → exact, order-free sums


def dsir_resample(df_raw: DataFrame, df_target: DataFrame, n: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_buckets: int = 1024, smoothing: float = 1.0,
                  salt: str = "dsir") -> DataFrame:
    """DSIR selection: sample ``n`` raw documents WITHOUT replacement with
    probability ∝ exp(logw_sum) — via the Gumbel-top-k trick, with the
    Gumbel noise drawn deterministically from each id's md5 bucket
    (``g = -ln(-ln(u))``), so the selected set is reproducible on any
    layout. Returns the selected rows joined with their scores.

    Executes as TakeOrderedAndProject over one scored scan: each task
    keeps its local top-n, the driver merges — no global sort.

    The score columns (``n_tokens``/``logw_sum``/``logw_mean``) join back
    onto ``df_raw``, so a raw corpus already carrying one of those names
    is rejected up front rather than failing later with an ambiguous-
    column error mid-plan.
    """
    clash = [c for c in df_raw.columns
             if c in ("n_tokens", "logw_sum", "logw_mean")]
    if clash:
        raise ValueError(
            f"df_raw columns {clash} collide with DSIR score outputs; "
            "rename them before calling dsir_resample")
    scored = dsir_importance(df_raw, df_target, text_col, id_col,
                             n_buckets, smoothing)
    u = (_salted_bucket(id_col, salt).cast("double")
         + F.lit(0.5)) / F.lit(float(_BUCKETS))
    gumbel = -F.log(-F.log(u))
    keyed = df_raw.join(scored, id_col).withColumn(
        "__key", F.col("logw_sum") + gumbel)
    return (keyed.orderBy(F.col("__key").desc(), F.col(id_col).asc())
            .limit(n).drop("__key"))
